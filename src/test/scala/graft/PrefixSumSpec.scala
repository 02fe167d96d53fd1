package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.PrefixSum

/** The distributed prefix sum: equal to the sequential running sum, and
  * actually distributed (work spread over multiple partitions — the whole
  * point versus an unpartitioned window).
  */
class PrefixSumSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("running sum equals the sequential scan, across many partitions") {
    val n = 10000
    val data = (1 to n).map(i => (i.toLong, ((i * 2654435761L) % 19) - 9))
    val df = data.toDF("t", "d").repartition(13) // scrambled input layout
    // pin the exchange width: AQE rightly coalesces 10k rows to one
    // partition, but the test must exercise the multi-partition offsets
    val out = PrefixSum.runningSum(df, Seq("t"), "d", "run", numPartitions = 8)
    assert(out.rdd.getNumPartitions === 8)
    val got = out.select($"t", $"run").as[(Long, Long)].collect().toMap
    var acc = 0L
    data.sortBy(_._1).foreach { case (t, d) =>
      acc += d
      assert(got(t) === acc, s"t=$t")
    }
  }

  test("negative deltas reconstruct a gauge that returns to zero") {
    val iv = Seq((0L, 10L), (5L, 15L), (12L, 20L), (30L, 31L))
    val deltas = iv.flatMap { case (s, e) => Seq((s, 1L), (e + 1, -1L)) }
      .groupBy(_._1).map { case (t, ds) => (t, ds.map(_._2).sum) }.toSeq
    val out = PrefixSum.runningSum(deltas.toDF("t", "d"), Seq("t"), "d", "conc")
      .orderBy($"t").select($"t", $"conc").as[(Long, Long)].collect()
    assert(out.last._2 === 0L, "all sessions closed -> concurrency 0")
    assert(out.map(_._2).max === 2L, "at most two intervals overlap ([5,10] and [12,15])")
    assert(out.forall(_._2 >= 0L))
  }
}
