package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.streaming.{EventStream, StreamingSketch}

/** The streaming KMV sketch must converge to EXACTLY the batch sketch's
  * estimate on the same data (same hash family, same k), including under
  * re-delivery — bounded state (k doubles per key) on an unbounded stream.
  */
class StreamingSketchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val K = 64

  private def batchKmv(df: org.apache.spark.sql.DataFrame): Map[String, (Int, Double)] = {
    val d = df.select(col("key"), col("frac")).distinct()
    val kept = graft.plans.TopK.perGroup(d, Seq("key"), Seq(("frac", false)), K)
    kept.groupBy(col("key"))
      .agg(count(lit(1)).as("n_kept"),
        when(count(lit(1)) < K, count(lit(1)).cast("double"))
          .otherwise(lit((K - 1).toDouble) / max(col("frac"))).as("est"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1).toInt, r.getDouble(2)))).toMap
  }

  test("streaming KMV equals batch KMV, including under re-delivery") {
    val dir = TestSpark.tmpDir("stream-kmv")
    val base = Tables.load(spark, "/root/testdata/sf0.001", "events")
      .select(col("event_type").as("key"),
        StreamingSketch.hashFrac(col("user_id")).as("frac"))
    // two arrivals, the second re-delivers a slice of the first
    base.write.parquet(s"$dir/f1")
    base.limit(500).write.parquet(s"$dir/f2")
    val stream = EventStream.fileSource(spark, s"$dir/*", base.schema)
    val got = StreamingSketch.runToFinal(
      StreamingSketch.kmvDistinct(stream, K), "kmv_stream_test")
      .collect().map(r => r.getString(0) -> ((r.getInt(1), r.getDouble(2)))).toMap
    val want = batchKmv(base)
    assert(got.keySet === want.keySet)
    got.foreach { case (k, (nKept, est)) =>
      assert(nKept === want(k)._1, s"$k: kept count")
      assert(math.abs(est - want(k)._2) < 1e-9, s"$k: estimate $est vs batch ${want(k)._2}")
    }
    // and the estimate is actually close to the exact distinct count
    val exact = Tables.load(spark, "/root/testdata/sf0.001", "events")
      .groupBy(col("event_type")).agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    got.foreach { case (k, (nKept, est)) =>
      val x = exact(k)
      if (nKept == K) assert(math.abs(est - x) / x < 0.3, s"$k: est $est vs exact $x")
      else assert(est === x.toDouble, s"$k: below capacity must be exact")
    }
  }
}
