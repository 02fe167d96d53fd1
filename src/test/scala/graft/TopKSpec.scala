package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.plans.TopK

/** Custom TopKPerGroup operator vs the built-in window formulation. */
class TopKSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("matches QUALIFY row_number() <= k exactly on real data") {
    val o = Tables.load(spark, "/root/testdata/sf0.001", "orders")
      .select($"o_orderpriority", $"o_orderkey", $"o_totalprice")
    val custom = TopK.perGroup(o, Seq("o_orderpriority"),
      Seq("o_totalprice" -> true, "o_orderkey" -> false), k = 3)
    val builtin = o.withColumn("rank",
        row_number().over(Window.partitionBy($"o_orderpriority")
          .orderBy($"o_totalprice".desc, $"o_orderkey".asc)))
      .filter($"rank" <= 3)
    assert(custom.exceptAll(builtin).isEmpty && builtin.exceptAll(custom).isEmpty)
    assert(custom.count() === 15, "5 priorities x top 3")
  }

  test("groups smaller than k emit all rows, ranked") {
    val df = Seq(("a", 1), ("a", 2), ("b", 9)).toDF("g", "v")
    val out = TopK.perGroup(df, Seq("g"), Seq("v" -> true), k = 5)
      .orderBy("g", "rank").as[(String, Int, Int)].collect()
    assert(out === Array(("a", 2, 1), ("a", 1, 2), ("b", 9, 1)))
  }

  test("plan uses TopKPerGroupExec with a single clustering exchange") {
    val o = Tables.load(spark, "/root/testdata/sf0.001", "orders")
    val plan = TopK.perGroup(o, Seq("o_orderpriority"),
      Seq("o_totalprice" -> true, "o_orderkey" -> false), k = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerGroup"), plan.take(1000))
    assert(!plan.contains("Sort "), "no per-group sort materialization")
  }

  test("ascending order and k=1 (min per group)") {
    val df = Seq(("a", 5), ("a", 1), ("a", 3)).toDF("g", "v")
    val out = TopK.perGroup(df, Seq("g"), Seq("v" -> false), k = 1)
      .as[(String, Int, Int)].collect()
    assert(out === Array(("a", 1, 1)))
  }
}
