package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Layout

/** Bucketed layout: co-located joins run without a shuffle exchange. */
class LayoutSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("bucketed-by-key tables sort-merge join with zero exchanges") {
    val sf = "/root/testdata/sf0.001"
    Layout.writeBucketed(Tables.load(spark, sf, "lineitem"), "li_b", 4, Seq("l_orderkey"))
    Layout.writeBucketed(
      Tables.load(spark, sf, "orders").withColumnRenamed("o_orderkey", "l_orderkey"),
      "o_b", 4, Seq("l_orderkey"))
    val joined = spark.table("li_b").hint("merge")
      .join(spark.table("o_b").hint("merge"), Seq("l_orderkey"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"))
    assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"),
      s"bucketed join must not shuffle:\n${plan.take(2000)}")
    // and the result is the plain join
    val plain = Tables.load(spark, sf, "lineitem").join(
      Tables.load(spark, sf, "orders").withColumnRenamed("o_orderkey", "l_orderkey"),
      Seq("l_orderkey"))
    assert(joined.count() === plain.count())
  }
}
