package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.Sessionize
import graft.streaming.Sessionize.{SessionEvent, SessionOut}

/** Stateful streaming sessionization vs the batch window formulation. */
class SessionizeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("batch: gaps split sessions exactly at the threshold") {
    val ev = Seq(
      (1L, "2024-01-01 10:00:00"), (1L, "2024-01-01 10:29:00"), // session 1
      (1L, "2024-01-01 10:59:00"),                              // still 1 (30m exactly)
      (1L, "2024-01-01 11:29:01"),                              // gap > 30m -> session 2
      (2L, "2024-01-01 09:00:00")
    ).toDF("user_id", "s").select($"user_id", to_timestamp($"s").as("ts"))
    val out = Sessionize.batch(ev, "user_id", "ts", 30)
      .select($"user_id", $"ts", $"session_id")
      .orderBy("user_id", "ts").collect()
    assert(out.map(_.getInt(2)).toSeq === Seq(1, 1, 1, 2, 1))
  }

  test("state carries across micro-batches: sessions spanning a batch boundary merge") {
    val dir = TestSpark.tmpDir("sess-multi")
    val t0 = 1700000000000000L // µs
    val min = 60L * 1000000L
    // batch 1: two events 10 min apart; batch 2: one event 10 min later
    // (same session!) then one 2 h later (closes it)
    Seq((7L, t0), (7L, t0 + 10 * min)).toDF("key", "tsUs")
      .coalesce(1).write.parquet(s"$dir/f1")
    Seq((7L, t0 + 20 * min), (7L, t0 + 140 * min)).toDF("key", "tsUs")
      .coalesce(1).write.parquet(s"$dir/f2")
    // force file order = batch order via modification times
    def touch(sub: String, t: Long): Unit =
      new java.io.File(s"$dir/$sub").listFiles().foreach(_.setLastModified(t))
    touch("f1", 1000000L); touch("f2", 2000000L)

    val typed = spark.readStream
      .schema("key LONG, tsUs LONG")
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$dir/*")
      .as[SessionEvent]
    val q = Sessionize.stateful(typed, gapMinutes = 30)
      .writeStream.format("memory").queryName("sess_multi")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val out = spark.table("sess_multi").as[SessionOut].collect()
    assert(out.length === 1, s"exactly one closed session, got ${out.toSeq}")
    assert(out.head.n_events === 3, "the boundary-spanning session merged 2+1 events")
    assert(out.head.start_us === t0 && out.head.end_us === t0 + 20 * min)
  }

  test("streaming flatMapGroupsWithState closed sessions == batch minus open tails") {
    val events = Tables.load(spark, "/root/testdata/sf0.001", "events")
    val dir = TestSpark.tmpDir("sess-in")
    events.select($"user_id", $"ts").write.parquet(s"$dir/f1")

    val typed = spark.readStream
      .schema(events.select($"user_id", $"ts").schema)
      .parquet(s"$dir/*")
      .select($"user_id".as("key"), unix_micros($"ts").as("tsUs"))
      .as[SessionEvent]
    val q = Sessionize.stateful(typed, gapMinutes = 30)
      .writeStream.format("memory").queryName("sess_out")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamed = spark.table("sess_out").as[SessionOut].collect()
      .map(s => (s.key, s.session_id, s.n_events, s.start_us, s.end_us)).toSet

    val batchAll = Sessionize.batchSummary(events, "user_id", "ts", 30)
    val lastPerKey = batchAll.groupBy($"user_id")
      .agg(max($"session_id").as("session_id"))
    val closed = batchAll.join(lastPerKey, Seq("user_id", "session_id"), "left_anti")
      .as[(Long, Int, Long, Long, Long)].collect().toSet
    assert(streamed === closed,
      s"streaming closed sessions must equal batch non-final sessions " +
        s"(streamed=${streamed.size}, batch-closed=${closed.size})")
  }
}
