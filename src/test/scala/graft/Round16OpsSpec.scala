package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-16 pins.
  *
  * The read half of the DSv2 surface learned SMALLINT/TINYINT in round 15
  * (type-widening fuzz find); the advisor flagged the remaining asymmetry:
  * the WRITE half (GroupWrite.messageType + the row writer) still refused
  * ShortType/ByteType, so SQL UPDATE / MERGE / rewrite-DELETE on such a
  * table died with sys.error at executor task time — after retries, loud
  * but late. The writer now mirrors the reader (INT32 physical with an
  * intType(16/8) annotation), and these pins drive the full row-level SQL
  * surface over narrow-integral columns.
  */
class Round16OpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def registerCat(root: String, tag: String): String = {
    val cat = s"graftr16$tag"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.source.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    cat
  }

  test("widening matrix: full integral chain admitted, cross-family refused") {
    import graft.ops.TypeWidening.isWidening
    import org.apache.spark.sql.types._
    // admitted: every step and skip of the integral chain, float→double,
    // decimal precision growth (same scale)
    assert(isWidening(ByteType, ShortType) && isWidening(ByteType, LongType))
    assert(isWidening(ShortType, IntegerType) && isWidening(ShortType, LongType))
    assert(isWidening(IntegerType, LongType) && isWidening(FloatType, DoubleType))
    assert(isWidening(DecimalType(6, 2), DecimalType(14, 2)))
    // refused: narrowings, scale changes, and cross-family conversions
    // (Delta's wider matrix admits int→decimal / date→timestamp; ours
    // refuses them — the fuzz campaign asserts the refusal is loud)
    assert(!isWidening(LongType, IntegerType))
    assert(!isWidening(DecimalType(14, 2), DecimalType(10, 2)))
    assert(!isWidening(DecimalType(10, 2), DecimalType(14, 4))) // scale change
    assert(!isWidening(IntegerType, DecimalType(20, 0)))
    assert(!isWidening(IntegerType, DoubleType))
    assert(!isWidening(FloatType, DecimalType(10, 2)))
    assert(!isWidening(DateType, TimestampType))
    assert(!isWidening(StringType, BinaryType))
  }

  test("row-level SQL (UPDATE/DELETE/MERGE) on SMALLINT/TINYINT columns") {
    val root = TestSpark.tmpDir("r16short")
    val df = spark.range(0L, 40L).toDF("k")
      .selectExpr("k", "CAST(k AS SMALLINT) AS a", "CAST(k % 5 AS TINYINT) AS b")
    graft.ops.VersionedTable.write(df, s"$root/w")
    val cat = registerCat(root, "w")
    // UPDATE rewrites whole files through GroupWrite — every surviving row
    // of a touched file passes through the SHORT/BYTE writer branches
    spark.sql(s"UPDATE $cat.w SET a = CAST(a + 100 AS SMALLINT) WHERE k < 10")
    assert(spark.sql(s"SELECT sum(a) FROM $cat.w").head.getLong(0) ==
      (0L until 40L).sum + 10 * 100)
    // rewrite-DELETE
    spark.sql(s"DELETE FROM $cat.w WHERE b = CAST(3 AS TINYINT)")
    assert(spark.sql(s"SELECT count(*) FROM $cat.w").head.getLong(0) ==
      40L - (0L until 40L).count(_ % 5 == 3))
    // MERGE: matched update + not-matched insert, both through the writer
    spark.range(38L, 44L).toDF("k")
      .selectExpr("k", "CAST(1 AS SMALLINT) AS a", "CAST(1 AS TINYINT) AS b")
      .createOrReplaceTempView("r16src")
    spark.sql(
      s"""MERGE INTO $cat.w t USING r16src s ON t.k = s.k
         |WHEN MATCHED THEN UPDATE SET a = s.a, b = s.b
         |WHEN NOT MATCHED THEN INSERT (k, a, b) VALUES (s.k, s.a, s.b)
         |""".stripMargin)
    val got = spark.sql(
      s"SELECT k, CAST(a AS INT), CAST(b AS INT) FROM $cat.w WHERE k >= 38")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).sorted
    assert(got.toSeq == (38L to 43L).map(k => (k, 1, 1)).toSeq,
      s"merged narrow-integral rows diverged: ${got.toSeq}")
    // the values round-trip as their DECLARED types, not widened shadows
    val sch = spark.sql(s"SELECT a, b FROM $cat.w").schema
    assert(sch("a").dataType == org.apache.spark.sql.types.ShortType &&
      sch("b").dataType == org.apache.spark.sql.types.ByteType)
  }
}
