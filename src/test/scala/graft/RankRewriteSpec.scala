package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.plans.GraftRules

/** The RankFilterToTopK optimizer rule: the QUALIFY rn<=k pattern must plan
  * as the bounded-heap operator (no WindowExec sort), produce identical
  * results, and leave non-matching shapes untouched.
  */
class RankRewriteSpec extends AnyFunSuite {
  lazy val spark = {
    val s = TestSpark.spark
    GraftRules.register(s)
    s
  }
  import spark.implicits._

  private def sample: DataFrame =
    Seq(
      ("a", 1, 10.0), ("a", 2, 30.0), ("a", 3, 20.0), ("a", 4, 20.0),
      ("b", 5, 5.0), ("b", 6, 7.0),
      ("c", 7, 1.0)
    ).toDF("k", "id", "v")

  private def physical(df: DataFrame): String = df.queryExecution.executedPlan.toString

  test("rn = 1 filter plans as TopKPerGroupExec, not WindowExec") {
    val w = Window.partitionBy($"k").orderBy($"v".desc, $"id".asc)
    val df = sample.withColumn("rn", row_number().over(w)).filter($"rn" === 1)
    val plan = physical(df)
    assert(plan.contains("TopKPerGroup"), plan)
    assert(!plan.contains("Window ["), plan)
    val got = df.select($"k", $"id").as[(String, Int)].collect().toMap
    assert(got === Map("a" -> 2, "b" -> 6, "c" -> 7))
  }

  test("rn <= k matches the window result exactly (rank values included)") {
    val w = Window.partitionBy($"k").orderBy($"v".asc, $"id".asc)
    def query(s: org.apache.spark.sql.SparkSession) = {
      // fresh plan each time; the session decides whether the rule fires
      sample.withColumn("rn", row_number().over(w)).filter($"rn" <= 2)
    }
    val rewritten = query(spark)
    assert(physical(rewritten).contains("TopKPerGroup"))
    // reference result computed with the rule disabled
    val saved = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = Seq.empty
    val expected =
      try query(spark).orderBy($"k", $"rn").collect().toSeq
      finally spark.experimental.extraOptimizations = saved
    assert(rewritten.orderBy($"k", $"rn").collect().toSeq === expected)
  }

  test("other conjuncts survive the rewrite") {
    val w = Window.partitionBy($"k").orderBy($"v".desc, $"id".asc)
    val df = sample.withColumn("rn", row_number().over(w))
      .filter($"rn" <= 2 && $"v" > 6.0)
    assert(physical(df).contains("TopKPerGroup"))
    val got = df.select($"k", $"id").as[(String, Int)].collect().toSet
    assert(got === Set(("a", 2), ("a", 3), ("b", 6)))
  }

  test("guards: large k, extra window exprs, and unfiltered windows stay on WindowExec") {
    val w = Window.partitionBy($"k").orderBy($"v".asc)
    val largeK = sample.withColumn("rn", row_number().over(w))
      .filter($"rn" <= graft.plans.RankFilterToTopK.MaxK + 1)
    assert(!physical(largeK).contains("TopKPerGroup"))

    val twoExprs = sample
      .withColumn("rn", row_number().over(w))
      .withColumn("lg", lag($"v", 1).over(w))
      .filter($"rn" === 1)
    assert(physical(twoExprs).contains("Window ["))
    // correctness regardless of which operators planned it
    assert(twoExprs.count() === 3)

    val noFilter = sample.withColumn("rn", row_number().over(w))
    assert(!physical(noFilter).contains("TopKPerGroup"))
    assert(noFilter.count() === 7)
  }

  test("the dedup operator (W1) rides the rewrite end-to-end") {
    val ev = Tables.load(spark, "/root/testdata/sf0.001", "events")
    val deduped = graft.ops.Dedup.latestBy(ev,
      Seq($"user_id", upper(trim($"event_type"))), Seq($"ts", $"event_id"))
    assert(physical(deduped).contains("TopKPerGroup"), physical(deduped).take(800))
    // one row per key, and it is the max-(ts, event_id) row
    val viaWindow = {
      val saved = spark.experimental.extraOptimizations
      spark.experimental.extraOptimizations = Seq.empty
      try graft.ops.Dedup.latestBy(ev,
        Seq($"user_id", upper(trim($"event_type"))), Seq($"ts", $"event_id"))
        .select($"event_id").as[Long].collect().toSet
      finally spark.experimental.extraOptimizations = saved
    }
    assert(deduped.select($"event_id").as[Long].collect().toSet === viaWindow)
  }
}
