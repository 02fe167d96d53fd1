package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Measures the per-stream ENGINE floor: a minimal one-file AvailableNow
  * stream through a memory sink — planning + offset/commit log + state
  * machinery and nothing else. Gated behind GRAFT_PERF=1; the figure
  * decomposes the streaming family's bench bucket (engine floor × number
  * of stream starts vs genuine per-row/contract work).
  */
class StreamFloorSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("per-stream engine floor: minimal AvailableNow start-to-stop") {
    assume(sys.env.get("GRAFT_PERF").contains("1"), "set GRAFT_PERF=1")
    val dir = TestSpark.tmpDir("floor")
    Seq((1L, "a")).toDF("k", "v").write.parquet(s"$dir/in/f1")
    val schema = spark.read.parquet(s"$dir/in/f1").schema
    def once(i: Int, stateful: Boolean): Double = {
      val t0 = System.nanoTime()
      var df = spark.readStream.schema(schema).parquet(s"$dir/in/*")
      val out =
        if (stateful) df.groupBy(col("v")).agg(count(lit(1)).as("n"))
        else df.select(col("k"), col("v"))
      val q = out.writeStream
        .format("memory").queryName(s"floor_$i")
        .outputMode(if (stateful) "complete" else "append")
        .option("checkpointLocation", s"$dir/cp$i")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      (System.nanoTime() - t0) / 1e9
    }
    val stateless = (1 to 6).map(i => once(i, stateful = false))
    val stateful = (7 to 12).map(i => once(i, stateful = true))
    info(f"stateless floor: min ${stateless.min}%.2f s " +
      s"(${stateless.map(t => f"$t%.2f").mkString(", ")})")
    info(f"stateful  floor: min ${stateful.min}%.2f s " +
      s"(${stateful.map(t => f"$t%.2f").mkString(", ")})")
    // state-partition width sweep: how much of the stateful floor is
    // per-partition state-store lifecycle
    Seq("1", "2", "8").foreach { w =>
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", w)
      try {
        val t = (0 to 3).map(j => once(100 + w.toInt * 10 + j, stateful = true))
        info(f"stateful floor @$w partitions: min ${t.min}%.2f s " +
          s"(${t.map(x => f"$x%.2f").mkString(", ")})")
      } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }
  }
}
