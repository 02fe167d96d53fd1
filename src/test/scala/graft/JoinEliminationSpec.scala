package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Soundness envelope of the unique-key dead-join elimination: fires only
  * when the right side is provably unique on ALL its grouping exprs and no
  * right column is referenced; every non-provable shape keeps its join.
  */
class JoinEliminationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val fact = Seq((1L, "a", 10.0), (2L, "b", 20.0), (1L, "c", 30.0),
    (9L, "d", 40.0)).toDF("k", "tag", "v") // 9 has no dim match
  private lazy val dim = Seq((1L, 100L), (2L, 200L), (3L, 300L)).toDF("dk", "payload")

  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("left join on aggregate-unique keys with dead output is dropped") {
    val unique = dim.groupBy("dk").agg(max("payload").as("p"))
    val q = fact.join(unique, fact("k") === unique("dk"), "left_outer")
      .groupBy("tag").agg(sum("v").as("sv"))
    assert(!plan(q).contains("Join"), plan(q))
    assert(q.orderBy("tag").as[(String, Double)].collect()
      === Array(("a", 10.0), ("b", 20.0), ("c", 30.0), ("d", 40.0)))
  }

  test("distinct right side optimizes to an aggregate and is dropped") {
    val q = fact.join(dim.select("dk").distinct(),
        fact("k") === col("dk"), "left_outer")
      .select(col("tag"), col("v"))
    assert(!plan(q).contains("Join"), plan(q))
    assert(q.count() === 4L)
  }

  test("join on a SUBSET of the grouping keys keeps the join") {
    val wide = Seq((1L, 10L, "x"), (1L, 11L, "y")).toDF("dk", "dk2", "s")
      .groupBy("dk", "dk2").agg(max("s").as("ms")) // unique on (dk,dk2), not dk
    val q = fact.join(wide, fact("k") === wide("dk"), "left_outer")
      .select(col("tag"), col("v"))
    assert(plan(q).contains("Join"), plan(q))
    assert(q.count() === 6L, "both k=1 fact rows fan out over two dim rows — dropping would be wrong")
  }

  test("a referenced right column keeps the join") {
    val unique = dim.groupBy("dk").agg(max("payload").as("p"))
    val q = fact.join(unique, fact("k") === unique("dk"), "left_outer")
      .select(col("tag"), col("p"))
    assert(plan(q).contains("Join"), plan(q))
  }

  test("inner joins and raw right sides keep the join") {
    val inner = fact.join(dim.groupBy("dk").agg(max("payload").as("p")),
      fact("k") === col("dk")).select(col("tag"))
    assert(plan(inner).contains("Join"), "inner join filters rows — not dead")
    assert(inner.count() === 3L, "k=9 must drop under the inner join")
    val raw = fact.join(dim.select(col("dk"), col("payload")),
        fact("k") === col("dk"), "left_outer")
      .select(col("tag"))
    assert(plan(raw).contains("Join"), "raw (unproven) right side must stay")
  }
}
