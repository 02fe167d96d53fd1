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

  // ---- Z-relation join-view maintenance (q254's algebra) ----------------

  private def countedView(a: DataFrame, b: DataFrame): Seq[String] =
    IncrementalView.counted(a.join(b, Seq("j")), Seq("j", "pa", "pb"))
      .collect().map(_.mkString("|")).toSeq.sorted

  test("join delta with updates on BOTH sides tracks the full recompute") {
    val dirA = TestSpark.tmpDir("jivmA"); val dirB = TestSpark.tmpDir("jivmB")
    val a1 = Seq((1L, 10L, 100L), (2L, 10L, 101L), (3L, 20L, 102L))
      .toDF("ka", "j", "pa")
    // delete ka=1, update ka=2's payload, insert ka=4 into an existing group
    val a2 = Seq((2L, 10L, 999L), (3L, 20L, 102L), (4L, 10L, 103L))
      .toDF("ka", "j", "pa")
    val b1 = Seq((10L, 7L), (20L, 8L), (30L, 9L)).toDF("j", "pb")
    // update j=20's payload, delete j=30 (no A partner — no view effect)
    val b2 = Seq((10L, 7L), (20L, 88L)).toDF("j", "pb")
    ChangeFeed.commit(a1, dirA, Seq("ka")); ChangeFeed.commit(a2, dirA, Seq("ka"))
    ChangeFeed.commit(b1, dirB, Seq("j")); ChangeFeed.commit(b2, dirB, Seq("j"))
    val a0 = VersionedTable.readVersion(spark, dirA, 1L).select(col("j"), col("pa"))
    val b0 = VersionedTable.readVersion(spark, dirB, 1L).select(col("j"), col("pb"))
    val view1 = IncrementalView.counted(a0.join(b0, Seq("j")), Seq("j", "pa", "pb"))
    val dA = IncrementalView.signed(
      ChangeFeed.tableChanges(spark, dirA, 1L, 2L, Seq("ka")), Seq("j", "pa"))
    val dB = IncrementalView.signed(
      ChangeFeed.tableChanges(spark, dirB, 1L, 2L, Seq("j")), Seq("j", "pb"))
    val view2 = IncrementalView.applyCounted(view1,
      IncrementalView.joinDelta(a0, dA, b0, dB, Seq("j")), Seq("j", "pa", "pb"))
    assert(view2.collect().map(_.mkString("|")).toSeq.sorted ==
      countedView(VersionedTable.readVersion(spark, dirA, 2L).select(col("j"), col("pa")),
        VersionedTable.readVersion(spark, dirB, 2L).select(col("j"), col("pb"))))
  }

  test("one-sided delta: the other side's two terms vanish") {
    val a0 = Seq((10L, 1L), (10L, 2L)).toDF("j", "pa")
    val b0 = Seq((10L, 7L)).toDF("j", "pb")
    val dA = Seq((10L, 3L, 1L), (10L, 1L, -1L)).toDF("j", "pa", IncrementalView.SignCol)
    val dB = b0.limit(0).withColumn(IncrementalView.SignCol, lit(1L))
    val view1 = IncrementalView.counted(a0.join(b0, Seq("j")), Seq("j", "pa", "pb"))
    val view2 = IncrementalView.applyCounted(view1,
      IncrementalView.joinDelta(a0, dA, b0, dB, Seq("j")), Seq("j", "pa", "pb"))
    val expect = Seq((10L, 2L, 7L), (10L, 3L, 7L))
      .toDF("j", "pa", "pb").withColumn(IncrementalView.SignCol, lit(1L))
    assert(view2.exceptAll(expect).isEmpty && expect.exceptAll(view2).isEmpty)
  }

  test("duplicate tuples carry multiplicity > 1 and retract one at a time") {
    val a0 = Seq((10L, 5L), (10L, 5L)).toDF("j", "pa") // two identical tuples
    val b0 = Seq((10L, 7L)).toDF("j", "pb")
    val view1 = IncrementalView.counted(a0.join(b0, Seq("j")), Seq("j", "pa", "pb"))
    assert(view1.select(col(IncrementalView.SignCol)).head.getLong(0) == 2L)
    val dA = Seq((10L, 5L, -1L)).toDF("j", "pa", IncrementalView.SignCol)
    val dB = b0.limit(0).withColumn(IncrementalView.SignCol, lit(1L))
    val view2 = IncrementalView.applyCounted(view1,
      IncrementalView.joinDelta(a0, dA, b0, dB, Seq("j")), Seq("j", "pa", "pb"))
    assert(view2.select(col(IncrementalView.SignCol)).head.getLong(0) == 1L)
    // retracting the last copy removes the tuple entirely (no zero rows)
    val view3 = IncrementalView.applyCounted(view2,
      IncrementalView.joinDelta(a0, dA, b0, dB, Seq("j")), Seq("j", "pa", "pb"))
    assert(view3.isEmpty)
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
