package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{ChangeFeed, IncrementalView, VersionedTable}

/** The delta-rule fold: maintained view == full recompute at every version,
  * including groups that are born, die, and rows whose group attribute
  * moves them between groups; schema must stay fixed across cycles.
  */
class IncrementalViewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val spec = IncrementalView.Spec(Seq("g"),
    Seq("v_sum" -> col("v")))

  private def df(rows: Seq[(Long, String, Long)]): DataFrame =
    rows.toDF("k", "g", "v")

  private def canon(d: DataFrame): Seq[String] =
    d.select(col("g"), col(IncrementalView.NCol), col("v_sum"))
      .collect().map(_.mkString("|")).toSeq.sorted

  test("maintained view tracks full recompute through births, deaths, and group moves") {
    val dir = TestSpark.tmpDir("ivm")
    // v1: groups a(2 rows), b(1 row)
    ChangeFeed.commit(df(Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "b", 5L))),
      dir, Seq("k"))
    // v2: row 2 MOVES a->b, group c born, row 3 updated in place
    ChangeFeed.commit(df(Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "b", 7L),
      (4L, "c", 1L))), dir, Seq("k"))
    // v3: group a dies (row 1 deleted), c updated
    ChangeFeed.commit(df(Seq((2L, "b", 20L), (3L, "b", 7L), (4L, "c", 2L))),
      dir, Seq("k"))

    var view = IncrementalView.full(
      VersionedTable.readVersion(spark, dir, 1L), spec)
    for (v <- Seq(2L, 3L)) {
      val d = IncrementalView.delta(
        ChangeFeed.tableChanges(spark, dir, v - 1, v, Seq("k")), spec)
      view = IncrementalView.merge(view, d, spec)
      val direct = IncrementalView.full(
        VersionedTable.readVersion(spark, dir, v), spec)
      assert(canon(view) == canon(direct), s"divergence at v$v")
      // names+types fixed across cycles (nullability may differ: count is
      // non-nullable, a folded sum-of-counts is nullable)
      assert(view.schema.map(f => (f.name, f.dataType)) ==
        direct.schema.map(f => (f.name, f.dataType)), s"schema drift at v$v")
    }
    // group a is gone from the maintained view, not zero-counted
    assert(view.filter(col("g") === "a").isEmpty)
  }

  test("unknown change type fails loudly instead of silently dropping rows") {
    val bogus = Seq((1L, "a", 10L)).toDF("k", "g", "v")
      .withColumn(ChangeFeed.ChangeType, lit("upsert"))
    val ex = intercept[Exception] {
      IncrementalView.delta(bogus, spec).collect()
    }
    assert(ex.getMessage.contains("unknown change type"))
  }
}
