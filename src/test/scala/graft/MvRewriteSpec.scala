package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.plans.MvRewrite

/** Soundness envelope of the materialized-view auto-rewrite: a subsumed
  * SUM/COUNT rollup is answered from the MV scan; every shape outside the
  * proven envelope (extra grouping, non-distributive agg, distinct,
  * intervening filter, broken MV) keeps scanning the base.
  */
class MvRewriteSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // a little base table persisted to parquet (the rule matches file scans)
  private lazy val basePath = {
    val p = TestSpark.tmpDir("mv_base")
    Seq(("a", "x", 1L, 10L), ("a", "y", 2L, 20L), ("b", "x", 3L, 30L),
      ("b", "x", 4L, 40L)).toDF("g1", "g2", "k", "v")
      .write.mode("overwrite").parquet(p)
    p
  }

  private def base: DataFrame = spark.read.parquet(basePath)

  private def withMv(mvPath: String)(body: => Unit): Unit = {
    base.groupBy("g1", "g2")
      .agg(count(lit(1)).cast("long").as("cnt"), sum("v").as("sum_v"))
      .write.mode("overwrite").parquet(mvPath)
    MvRewrite.register(basePath, mvPath, Seq("g1", "g2"),
      Seq(MvRewrite.CountStar("cnt"), MvRewrite.SumOf("v", "sum_v")))
    try body finally MvRewrite.clear()
  }

  private def scans(df: DataFrame): Seq[String] = {
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try df.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.relation.location.rootPaths.map(_.toString)
    }.flatten
    finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("subsumed rollup scans only the MV and matches the base answer") {
    val mv = TestSpark.tmpDir("mv1")
    withMv(mv) {
      val q = base.groupBy("g1").agg(sum("v").as("sv"), count(lit(1)).as("n"))
      assert(scans(q).forall(_.contains(mv)), scans(q).mkString(","))
      assert(q.orderBy("g1").as[(String, Long, Long)].collect()
        === Array(("a", 30L, 2L), ("b", 70L, 2L)))
      // exprId preservation: downstream operators over the rewritten
      // aggregate resolve without re-analysis
      assert(q.filter(col("sv") > 30L).select(col("n")).head.getLong(0) == 2L)
    }
  }

  test("exact-grouping match rewrites too") {
    val mv = TestSpark.tmpDir("mv2")
    withMv(mv) {
      val q = base.groupBy("g1", "g2").agg(count(lit(1)).as("n"))
      assert(scans(q).forall(_.contains(mv)))
      assert(q.count() == 3L)
    }
  }

  test("non-distributive, distinct, and filtered shapes keep the base scan") {
    val mv = TestSpark.tmpDir("mv3")
    withMv(mv) {
      val mx = base.groupBy("g1").agg(max("v").as("m"))
      assert(scans(mx).exists(_.contains(basePath)))
      val dist = base.groupBy("g1").agg(countDistinct("v").as("d"))
      assert(scans(dist).exists(_.contains(basePath)))
      // a filter between aggregate and base is outside the envelope
      val filtered = base.filter(col("k") > 1L).groupBy("g1")
        .agg(sum("v").as("sv"))
      assert(scans(filtered).exists(_.contains(basePath)))
      assert(filtered.orderBy("g1").as[(String, Long)].collect()
        === Array(("a", 20L), ("b", 70L)))
    }
  }

  test("an MV missing a declared column never rewrites") {
    val mv = TestSpark.tmpDir("mv4")
    base.groupBy("g1", "g2").agg(count(lit(1)).cast("long").as("cnt"))
      .write.mode("overwrite").parquet(mv) // no sum_v despite registration
    MvRewrite.register(basePath, mv, Seq("g1", "g2"),
      Seq(MvRewrite.CountStar("cnt"), MvRewrite.SumOf("v", "sum_v")))
    try {
      val q = base.groupBy("g1").agg(sum("v").as("sv"))
      assert(scans(q).exists(_.contains(basePath)))
    } finally MvRewrite.clear()
  }

  test("a SUM over a non-registered column keeps the base scan") {
    val mv = TestSpark.tmpDir("mv5")
    withMv(mv) {
      val q = base.groupBy("g1").agg(sum("k").as("sk"))
      assert(scans(q).exists(_.contains(basePath)))
      assert(q.orderBy("g1").as[(String, Long)].collect()
        === Array(("a", 3L), ("b", 7L)))
    }
  }
}
