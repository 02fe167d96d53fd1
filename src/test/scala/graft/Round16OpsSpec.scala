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

  test("SQL over array columns: columnar scan, COW UPDATE, DV DELETE, MERGE") {
    import org.apache.spark.sql.functions._
    val root = TestSpark.tmpDir("r16arr")
    val df = spark.range(0L, 30L).toDF("k")
      .withColumn("emb",
        array((0 until 4).map(j => (col("k") * 10 + j).cast("double")): _*))
      .withColumn("tags", array(concat(lit("t"), col("k") % 3)))
    graft.ops.VersionedTable.write(df, s"$root/w")
    val cat = registerCat(root, "arr")
    def sumEmb(): Double = spark.sql(
      s"SELECT sum(aggregate(emb, 0d, (a, x) -> a + x)) FROM $cat.w")
      .head.getDouble(0)
    val base = (0L until 30L).map(k => (0 until 4).map(j => k * 10.0 + j).sum).sum
    // columnar scan path: arrays decode through the vectorized reader
    assert(math.abs(sumEmb() - base) < 1e-6)
    // COW UPDATE: the replacement snapshot streams arrays through GroupWrite
    spark.sql(s"UPDATE $cat.w SET emb = transform(emb, x -> x + 1000d) WHERE k < 5")
    assert(math.abs(sumEmb() - (base + 5 * 4 * 1000.0)) < 1e-6)
    // simple-predicate DELETE: the DV path — arrays then read through the
    // DV-aware (row-based) scan with the bitmap applied
    spark.sql(s"DELETE FROM $cat.w WHERE k = 7")
    val after7 = base + 5 * 4 * 1000.0 - (0 until 4).map(j => 70.0 + j).sum
    assert(math.abs(sumEmb() - after7) < 1e-6)
    assert(spark.sql(s"SELECT count(*) FROM $cat.w").head.getLong(0) == 29)
    // string arrays survive the same round-trip
    val tagRow = spark.sql(
      s"SELECT tags FROM $cat.w WHERE k = 4").head.getSeq[String](0)
    assert(tagRow == Seq("t1"))
    // MERGE: matched array update + not-matched array insert
    spark.range(29L, 32L).toDF("k")
      .withColumn("emb", array(lit(1d), lit(2d), lit(3d), lit(4d)))
      .withColumn("tags", array(lit("m")))
      .createOrReplaceTempView("r16arrsrc")
    spark.sql(
      s"""MERGE INTO $cat.w t USING r16arrsrc s ON t.k = s.k
         |WHEN MATCHED THEN UPDATE SET emb = s.emb, tags = s.tags
         |WHEN NOT MATCHED THEN INSERT (k, emb, tags) VALUES (s.k, s.emb, s.tags)
         |""".stripMargin)
    val merged = spark.sql(
      s"SELECT k, emb, tags FROM $cat.w WHERE k >= 29 ORDER BY k").collect()
    assert(merged.length == 3 && merged.forall(r =>
      r.getSeq[Double](1) == Seq(1d, 2d, 3d, 4d) &&
        r.getSeq[String](2) == Seq("m")))
    // null and empty arrays round-trip through the rewrite path
    spark.sql(s"UPDATE $cat.w SET emb = NULL, tags = array() WHERE k = 31")
    val r31 = spark.sql(s"SELECT emb, tags FROM $cat.w WHERE k = 31").head
    assert(r31.isNullAt(0) && r31.getSeq[String](1) == Seq.empty)
  }

  test("row-level SQL on the type-widening plane (mixed physical epochs)") {
    import org.apache.spark.sql.functions._
    import graft.ops.{TypeWidening => TW, VersionedTable => VT}
    val root = TestSpark.tmpDir("r16twdml")
    val dir = s"$root/w"
    // v1: SMALLINT epoch; v2: widen a -> INT (metadata-only); v3: INT epoch
    TW.init(spark.range(0L, 10L).toDF("k")
      .selectExpr("k", "CAST(k AS SMALLINT) AS a"), dir)
    val cat = registerCat(root, "twdml")
    spark.sql(s"ALTER TABLE $cat.w ALTER COLUMN a TYPE INT")
    spark.sql(s"INSERT INTO $cat.w " +
      "SELECT id AS k, CAST(id AS INT) AS a FROM range(10, 15)") // epoch append
    assert(VT.currentVersion(spark, dir).contains(3L))
    def sumA() = spark.sql(s"SELECT sum(a), count(*) FROM $cat.w").head
    assert(sumA().getLong(0) == (0L until 15L).sum && sumA().getLong(1) == 15)
    // UPDATE: the COW scan renders BOTH physical epochs (int16 + int32
    // files) at the live manifest and the replacement commits as a typed
    // rewrite — previously this plane refused row-level SQL outright
    spark.sql(s"UPDATE $cat.w SET a = a + 100 WHERE k < 10")
    assert(VT.currentVersion(spark, dir).contains(4L))
    assert(sumA().getLong(0) == (0L until 15L).sum + 10 * 100)
    // the rewrite ended the chain but kept the manifest: live schema INT,
    // and the pre-rewrite versions still read under their OWN manifests
    assert(spark.sql(s"SELECT a FROM $cat.w").schema("a").dataType ==
      org.apache.spark.sql.types.IntegerType)
    assert(TW.typesOf(spark, dir, 1L).toMap.apply("a") ==
      org.apache.spark.sql.types.ShortType)
    assert(TW.readVersion(spark, dir, 1L).agg(sum(col("a"))).head.getLong(0)
      == (0L until 10L).sum)
    // rewrite-form DELETE (no SupportsDelete on this plane)
    spark.sql(s"DELETE FROM $cat.w WHERE a % 2 = 1")
    val live = spark.sql(s"SELECT k, a FROM $cat.w").collect()
      .map(r => (r.getLong(0), r.getInt(1))).sorted
    assert(live.forall(_._2 % 2 == 0) && live.nonEmpty)
    // MERGE: matched update + unmatched insert through the typed rewrite
    spark.sql("SELECT id AS k, CAST(id AS INT) AS a FROM range(14, 18)")
      .createOrReplaceTempView("r16twsrc")
    spark.sql(s"""MERGE INTO $cat.w t USING r16twsrc s ON t.k = s.k
      |WHEN MATCHED THEN UPDATE SET a = s.a
      |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(spark.sql(s"SELECT count(*) FROM $cat.w WHERE k >= 14")
      .head.getLong(0) == 4)
    // the plane's own ops still compose AFTER row-level rewrites
    spark.sql(s"ALTER TABLE $cat.w ALTER COLUMN a TYPE BIGINT")
    spark.sql(s"INSERT INTO $cat.w SELECT 99L AS k, 99L AS a")
    assert(spark.sql(s"SELECT a FROM $cat.w WHERE k = 99").head.getLong(0) == 99L)
    // INSERT OVERWRITE = whole-snapshot typed rewrite at the manifest
    spark.sql(s"INSERT OVERWRITE $cat.w SELECT 1L AS k, 7L AS a")
    assert(spark.sql(s"SELECT k, a FROM $cat.w").collect().toSeq.map(r =>
      (r.getLong(0), r.getLong(1))) == Seq((1L, 7L)))
    // narrowing still refused after the whole lifecycle
    assert(scala.util.Try(
      spark.sql(s"ALTER TABLE $cat.w ALTER COLUMN a TYPE INT")).isFailure)
  }

  // found while wiring row-level SQL onto the widening plane: the catalog's
  // typed branch resolved EVERY read — including `VERSION AS OF n` — via
  // TypeWidening.read (the LIVE snapshot), so AS-OF on a typed table
  // silently rendered live content under the live manifest. Wrong data,
  // not an error; the typed API (TW.readVersion) was correct all along.
  test("VERSION AS OF on a type-widening table renders THAT version") {
    import org.apache.spark.sql.functions._
    import graft.ops.{TypeWidening => TW}
    val root = TestSpark.tmpDir("r16twasof")
    val dir = s"$root/w"
    TW.init(spark.range(0L, 8L).toDF("k")
      .selectExpr("k", "CAST(k AS SMALLINT) AS a"), dir)
    val cat = registerCat(root, "twasof")
    spark.sql(s"ALTER TABLE $cat.w ALTER COLUMN a TYPE BIGINT")
    spark.sql(s"INSERT INTO $cat.w SELECT 50L AS k, 50L AS a")
    // v1 must render ITS OWN rows under ITS OWN (SMALLINT) manifest
    val asOf1 = spark.sql(s"SELECT k, a FROM $cat.w VERSION AS OF 1")
    assert(asOf1.schema("a").dataType ==
      org.apache.spark.sql.types.ShortType,
      s"v1 must render under the SMALLINT manifest, got ${asOf1.schema}")
    assert(asOf1.count() == 8,
      "v1 must hold only the pre-widen rows (the live snapshot has 9)")
    assert(spark.sql(s"SELECT count(*) FROM $cat.w").head.getLong(0) == 9)
    // and a pinned AS-OF table is read-only
    assert(scala.util.Try(spark.sql(
      s"UPDATE $cat.w VERSION AS OF 1 SET a = 0")).isFailure)
  }

  test("log-layout SQL UPDATE rewrites array columns (GraftLogCowScan path)") {
    import org.apache.spark.sql.functions._
    val root = TestSpark.tmpDir("r16arrlog")
    val dir = s"$root/t"
    graft.ops.ActionLog.append(
      spark.range(0L, 20L).toDF("k")
        .withColumn("emb", array(col("k").cast("double"),
          (col("k") * 2).cast("double"))).coalesce(2),
      dir, Some("k"))
    val cat = registerCat(root, "arrlog")
    spark.sql(s"UPDATE $cat.t SET emb = transform(emb, x -> x + 100d) WHERE k < 5")
    val got = spark.sql(
      s"SELECT sum(aggregate(emb, 0d, (a, x) -> a + x)) FROM $cat.t")
      .head.getDouble(0)
    val want = (0L until 20L).map(k => k + 2.0 * k).sum + 5 * 2 * 100.0
    assert(math.abs(got - want) < 1e-9, s"got $got want $want")
    // the rewrite re-recorded stats (the r15 invariant, now over arrays)
    val live = graft.ops.ActionLog.liveFiles(spark, dir)
    assert(live.nonEmpty && live.forall(_._2.isDefined),
      s"log COW over arrays must keep per-file stats: $live")
  }

  test("column-mapping rename over an array column reads through the nameMap") {
    import org.apache.spark.sql.functions._
    import graft.ops.{ColumnMapping => CM}
    val root = TestSpark.tmpDir("r16arrmap")
    val dir = s"$root/t"
    CM.writeData(spark.range(0L, 10L).toDF("k")
      .withColumn("emb", array(col("k").cast("double"),
        lit(1.5))), dir)
    val cat = registerCat(root, "arrmap")
    spark.sql(s"ALTER TABLE $cat.t RENAME COLUMN emb TO vec")
    val got = spark.sql(
      s"SELECT sum(aggregate(vec, 0d, (a, x) -> a + x)) FROM $cat.t")
      .head.getDouble(0)
    assert(math.abs(got - ((0L until 10L).map(_.toDouble).sum + 10 * 1.5)) < 1e-9)
    // rename is metadata-only: the physical files still carry the old name
    assert(CM.read(spark, dir).columns.contains("vec"))
  }

  test("row-level SQL on a FEED-TRACKED table captures array pre/post images") {
    import org.apache.spark.sql.functions._
    import graft.ops.ChangeFeed
    val root = TestSpark.tmpDir("r16arrcdf")
    val dir = s"$root/t"
    def df(rows: Seq[(Long, Seq[Double])]) = rows.toDF("k", "emb")
    ChangeFeed.commit(df(Seq(1L -> Seq(1.0, 2.0), 2L -> Seq(3.0, 4.0))),
      dir, Seq("k")) // v1, feed-tracked with recorded keys
    val cat = registerCat(root, "arrcdf")
    // the COW rewrite's capture diffs base vs replacement INCLUDING the
    // array column — pre/post images must carry the vectors
    spark.sql(s"UPDATE $cat.t SET emb = transform(emb, x -> x * 10d) WHERE k = 1")
    val changes = ChangeFeed.tableChanges(spark, dir,
      fromVersion = 1L, toVersion = 2L, keyCols = Seq("k"))
      .select(col("k"), col("emb"), col(ChangeFeed.ChangeType)).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toList, r.getString(2)))
      .toSeq
    assert(changes.contains((1L, List(1.0, 2.0), "update_preimage")) &&
      changes.contains((1L, List(10.0, 20.0), "update_postimage")),
      s"array pre/post images must ride the capture: $changes")
    assert(!changes.exists(_._1 == 2L),
      s"the untouched row must not capture: $changes")
  }

  test("CDF stream carries array columns (the row materializer's list path)") {
    import org.apache.spark.sql.functions._
    import graft.ops.{ChangeFeed, VersionedTable}
    val root = TestSpark.tmpDir("r16arrstream") + "/t"
    def df(rows: Seq[(Long, Seq[Double])]) = rows.toDF("k", "emb")
    VersionedTable.write(df(Seq(1L -> Seq(1.0, 2.0), 2L -> Seq(3.0, 4.0))), root)
    ChangeFeed.commit(
      df(Seq(1L -> Seq(9.0, 9.0), 2L -> Seq(3.0, 4.0), 3L -> Seq(5.0, 6.0))),
      root, Seq("k")) // v2: update k=1's vector, insert k=3
    val got = collection.mutable.ArrayBuffer.empty[(Long, Seq[Double], String)]
    val q = graft.source.CdfStream.read(spark, root,
      startingVersion = Some(1L))
      .writeStream
      .option("checkpointLocation", TestSpark.tmpDir("r16arrstream-ckpt"))
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.select(col("k"), col("emb"), col(ChangeFeed.ChangeType)).collect()
          .foreach(r => got.synchronized {
            got += ((r.getLong(0), r.getSeq[Double](1), r.getString(2)))
          })
      }.start()
    try q.processAllAvailable() finally q.stop()
    val byKey = got.sortBy(r => (r._1, r._3)).toSeq
    assert(byKey.exists(r => r._1 == 1L && r._3 == "update_postimage" &&
      r._2 == Seq(9.0, 9.0)),
      s"the post-image must carry the updated vector: $byKey")
    assert(byKey.exists(r => r._1 == 3L && r._3 == "insert" &&
      r._2 == Seq(5.0, 6.0)), s"the insert must carry its vector: $byKey")
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
