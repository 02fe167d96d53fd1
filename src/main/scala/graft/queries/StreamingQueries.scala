package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.streaming.{EventStream, Sessionize, StreamingSketch}

/** Streaming operators ON the CORRECTNESS scoreboard (SURVEY §2.9).
  *
  * The batch-oracle contract can't drive a stream directly, so each entry
  * runs the REAL streaming operator in-query (file source over a scratch
  * landing dir → AvailableNow → memory sink), `require`s the streaming
  * result equal to its batch twin (the q85-style in-query contract
  * assertion), and returns the STREAMING output for DuckDB to verify — the
  * batch≡streaming equality the specs prove becomes a green CORRECTNESS
  * row, not only a spec.
  *
  * Every entry re-delivers part of the input in a second file: the
  * at-least-once arrival the bounded-state operators must absorb. Memory
  * sinks get a fresh name per invocation (bench reps rerun the fn in one
  * session).
  */
object StreamingQueries {

  private def hashFrac(c: org.apache.spark.sql.Column) = graft.functions.ContentHash.hashFrac(c)
  private def oracleFrac(sqlExpr: String): String = graft.functions.ContentHash.oracleFrac(sqlExpr)

  private def scratch(s: org.apache.spark.sql.SparkSession, sfDir: String, name: String): String =
    Q.scratch(s, sfDir, name) // shared wipe-before-use contract

  private def sinkName(base: String): String =
    base + "_" + java.util.UUID.randomUUID().toString.replace("-", "").take(8)

  /** Run `body` with a narrow shuffle width: streaming state stores are
    * created PER shuffle partition per operator, and these demo streams
    * carry kilobytes of state — 32 stores are pure fixed overhead (~40% of
    * each entry's wall time measured). A production stream sizes this to
    * its state volume, exactly like `spark.sql.shuffle.partitions` for
    * batch. The conf is restored afterwards (the session is shared).
    */
  private def withNarrowShuffle[A](s: org.apache.spark.sql.SparkSession)(body: => A): A =
    Q.withNarrowShuffle(s)(body) // one definition (Q) — q203/q221/q242 share it

  val all: Seq[Q] = Seq(

    // ---------------------------------------------------------------- q103
    // Streaming KMV distinct sketch (k = 64, bounded state: k doubles per
    // key forever) over the events stream WITH re-delivery, required
    // in-query to equal the batch KMV (identical hash family ⇒ exact
    // equality, not approximate). The oracle recomputes the estimate from
    // the distinct hash fractions — the same dedup the sketch state applies.
    Q("q103_streaming_kmv",
      s"""WITH d AS (SELECT DISTINCT event_type,
        |  ${oracleFrac("user_id")} AS frac FROM events),
        |k AS (SELECT * FROM d
        |  QUALIFY row_number() OVER (PARTITION BY event_type ORDER BY frac) <= 64)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_kept,
        |  round(CASE WHEN count(*) < 64 THEN CAST(count(*) AS DOUBLE)
        |        ELSE 63.0 / max(frac) END, 6) AS est_distinct
        |FROM k GROUP BY 1""".stripMargin) { (s, dir) =>
      val k = 64
      val base = Tables.load(s, dir, "events")
        .select(col("event_type").as("key"), hashFrac(col("user_id")).as("frac"))
      val in = scratch(s, dir, "q103")
      base.write.parquet(s"$in/f1")
      base.limit(500).write.parquet(s"$in/f2") // at-least-once re-delivery
      val stream = EventStream.fileSource(s, s"$in/*", base.schema)
      val sink = sinkName("q103_kmv")
      val got = withNarrowShuffle(s) { StreamingSketch.runToFinal(
        StreamingSketch.kmvDistinct(stream, k), sink) }
        .localCheckpoint() // pin OFF the memory sink so the view can drop
      s.catalog.dropTempView(sink)
      // batch twin: top-k smallest DISTINCT fractions per key
      val kept = graft.plans.TopK.perGroup(base.distinct(), Seq("key"), Seq(("frac", false)), k)
      val want = kept.groupBy(col("key"))
        .agg(count(lit(1)).as("n_kept"),
          when(count(lit(1)) < k, count(lit(1)).cast("double"))
            .otherwise(lit((k - 1).toDouble) / max(col("frac"))).as("est"))
        .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
      val gotRows = got.collect().map(r => r.getString(0) -> ((r.getInt(1).toLong, r.getDouble(2))))
      require(gotRows.length == want.size && gotRows.forall { case (key, (n, est)) =>
        want.get(key).exists { case (bn, best) => bn == n && math.abs(best - est) < 1e-9 }
      }, "streaming KMV must equal the batch sketch exactly")
      got.select(col("key").as("event_type"), col("n_kept").cast("bigint"),
        round(col("est_distinct"), 6).as("est_distinct"))
    },

    // ---------------------------------------------------------------- q104
    // Stateful streaming sessionization (flatMapGroupsWithState, one open
    // session per key in state): CLOSED sessions — everything the stream
    // emits — must equal the batch gaps-and-islands sessions minus each
    // key's final (still-open) session. The oracle computes exactly that
    // with the q42 window SQL plus a last-session filter.
    Q("q104_streaming_sessions",
      """WITH e AS (SELECT user_id, epoch_us(ts) AS us FROM events),
        |m AS (SELECT user_id, us,
        |  CASE WHEN lag(us) OVER w IS NULL OR us - lag(us) OVER w > 1800000000
        |       THEN 1 ELSE 0 END AS s
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us)),
        |sess AS (SELECT user_id, us,
        |  CAST(SUM(s) OVER (PARTITION BY user_id ORDER BY us
        |                    ROWS UNBOUNDED PRECEDING) AS INT) AS session_id
        |  FROM m),
        |summ AS (SELECT user_id, session_id, count(*) AS n_events,
        |  min(us) AS start_us, max(us) AS end_us
        |  FROM sess GROUP BY 1, 2)
        |SELECT user_id AS key, session_id, n_events, start_us, end_us FROM summ
        |QUALIFY session_id < max(session_id) OVER (PARTITION BY user_id)""".stripMargin) { (s, dir) =>
      import s.implicits._
      val events = Tables.load(s, dir, "events")
      val in = scratch(s, dir, "q104")
      // ONE file -> one deterministic micro-batch (in-batch order is sorted
      // by the operator; cross-batch order is a file-mtime concern)
      events.select(col("user_id").as("key"), unix_micros(col("ts")).as("tsUs"))
        .coalesce(1).write.parquet(s"$in/f1")
      val stream = s.readStream.schema("key LONG, tsUs LONG").parquet(s"$in/*")
        .as[Sessionize.SessionEvent]
      val sink = sinkName("q104_sess")
      // batch twin (all sessions minus each key's open tail) is
      // independent of the stream — materialize it concurrently
      import scala.concurrent.{Await, Future}
      import scala.concurrent.ExecutionContext.Implicits.global
      import scala.concurrent.duration.Duration
      // the future lives INSIDE the narrow-shuffle scope so its plan
      // width is deterministic (4), not a race between set and restore
      val (got, closed) = withNarrowShuffle(s) {
        val closedF = Future {
          val all = Sessionize.batchSummary(events, "user_id", "ts", 30)
            .withColumnRenamed("user_id", "key")
          all.withColumn("__mx",
              max(col("session_id")).over(org.apache.spark.sql.expressions.Window.partitionBy(col("key"))))
            .filter(col("session_id") < col("__mx")).drop("__mx")
            .localCheckpoint()
        }
        val g = EventStream.runAvailableNow(
          Sessionize.stateful(stream, gapMinutes = 30).toDF(), sink)
          .localCheckpoint()
        (g, Await.result(closedF, Duration.Inf))
      }
      s.catalog.dropTempView(sink)
      require(Q.sameMultiset(got, closed),
        "streaming closed sessions must equal batch sessions minus open tails")
      got
    },

    // ---------------------------------------------------------------- q105
    // Watermarked streaming dedup (dropDuplicatesWithinWatermark — BOUNDED
    // state, keys evicted as the watermark passes; a plain streaming
    // dropDuplicates would hold every key forever): re-delivered events
    // collapse to exactly one row per event_id, required in-query to match
    // the batch table, then aggregated integer-exactly for the oracle.
    Q("q105_streaming_dedup",
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
        |  CAST(min(event_id) AS BIGINT) AS min_id,
        |  CAST(max(event_id) AS BIGINT) AS max_id
        |FROM events GROUP BY 1""".stripMargin) { (s, dir) =>
      val events = Tables.load(s, dir, "events")
        .select(col("event_id"), col("ts"), col("user_id"), col("event_type"))
      val in = scratch(s, dir, "q105")
      events.write.parquet(s"$in/f1")
      events.filter(col("event_id") % 3 === 0).write.parquet(s"$in/f2") // re-delivery
      val stream = EventStream.fileSource(s, s"$in/*", events.schema)
      val sink = sinkName("q105_dedup")
      val got = withNarrowShuffle(s) { EventStream.runAvailableNow(
        EventStream.dedupWithinWatermark(stream, Seq("event_id"), delay = "30 days"),
        sink) }
        .localCheckpoint()
      s.catalog.dropTempView(sink)
      require(got.count() == events.count(),
        "every re-delivered event_id must be kept exactly once")
      require(got.groupBy("event_id").count().filter(col("count") > 1).isEmpty,
        "no key may survive twice")
      got.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"),
          min(col("event_id")).cast("bigint").as("min_id"),
          max(col("event_id")).cast("bigint").as("max_id"))
    },

    // ---------------------------------------------------------------- q116
    // Stream-stream INTERVAL join (watermark-bounded state: a buffered row
    // is evicted once the other side's watermark passes its last possible
    // match): error events joined to the user's clicks in the preceding
    // hour, required in-query to equal the batch range join, aggregated
    // integer-exactly for the oracle.
    Q("q116_streaming_interval_join",
      """WITH w AS (SELECT * FROM events WHERE ts < TIMESTAMP '2024-01-08 00:00:00'),
        |err AS (SELECT user_id, ts, event_id FROM w WHERE event_type = 'error'),
        |clk AS (SELECT user_id, ts AS click_ts FROM w WHERE event_type = 'click'),
        |j AS (SELECT e.user_id, e.event_id
        |      FROM err e JOIN clk c ON c.user_id = e.user_id
        |      AND epoch_us(c.click_ts) >= epoch_us(e.ts) - 3600000000
        |      AND epoch_us(c.click_ts) <= epoch_us(e.ts))
        |SELECT user_id, count(*) AS n_pairs,
        |  count(DISTINCT event_id) AS n_errors_matched
        |FROM j GROUP BY 1""".stripMargin) { (s, dir) =>
      // one week bounds the state the memory-sink demo carries; the
      // full-corpus equality is StreamingSpec's job
      val events = Tables.load(s, dir, "events")
        .filter(col("ts") < lit("2024-01-08 00:00:00").cast("timestamp"))
      val errors = events.filter(col("event_type") === "error")
        .select(col("user_id"), col("ts"), col("event_id"))
      val clicks = events.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts").as("click_ts"))
      val in = scratch(s, dir, "q116")
      errors.write.parquet(s"$in/errors")
      clicks.write.parquet(s"$in/clicks")
      val sink = sinkName("q116_ij")
      // the batch replay is independent of the stream — materialize it
      // CONCURRENTLY with the stream run (sameMultiset is column-order
      // insensitive, so the audit no longer needs the stream's column
      // order first); pure wall-clock pipelining, no semantic change
      import scala.concurrent.{Await, Future}
      import scala.concurrent.ExecutionContext.Implicits.global
      import scala.concurrent.duration.Duration
      val (got, want) = withNarrowShuffle(s) {
        val wantF = Future(
          graft.ops.RangeJoin.timeWindow(errors, clicks, Seq("user_id"),
            "ts", "click_ts", lowerUs = -3600000000L, upperUs = 0L)
            .localCheckpoint())
        val g = EventStream.runAvailableNow(
          EventStream.intervalJoin(
            EventStream.fileSource(s, s"$in/errors", errors.schema),
            EventStream.fileSource(s, s"$in/clicks", clicks.schema),
            Seq("user_id"), "ts", "click_ts",
            lowerUs = -3600000000L, upperUs = 0L, delay = "30 days"),
          sink).localCheckpoint()
        (g, Await.result(wantF, Duration.Inf))
      }
      s.catalog.dropTempView(sink)
      require(Q.sameMultiset(got, want),
        "streaming interval join must equal the batch range join")
      got.groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_pairs"),
          countDistinct(col("event_id")).as("n_errors_matched"))
    },

    // ---------------------------------------------------------------- q133
    // EXACTLY-ONCE streaming commit (the Delta `txn` pattern on
    // VersionedTable): the foreachBatch upsert stamps each micro-batch id
    // into the version it writes, so re-delivery is a no-op at the TABLE
    // level — not merely absorbed by the keyed merge. In-query proof: the
    // stream runs once (2 micro-batches: full file + re-delivered subset,
    // maxFilesPerTrigger=1), then the ENTIRE stream is replayed against a
    // fresh checkpoint (total checkpoint loss, the worst re-delivery case)
    // — required to add zero versions; the txn history must hold each batch
    // at most once. The oracle checks the final table contents.
    Q("q133_streaming_exactly_once",
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(SUM(event_id) AS BIGINT) AS id_sum
        |FROM events WHERE event_id % 2 = 0 GROUP BY 1""".stripMargin) { (s, dir) =>
      import graft.ops.VersionedTable
      val events = Tables.load(s, dir, "events")
        .filter(col("event_id") % 2 === 0)
        .select(col("event_id"), col("ts"), col("user_id"), col("event_type"))
      val root = scratch(s, dir, "q133")
      val (in, table) = (s"$root/in", s"$root/table")
      events.write.parquet(s"$in/f1")
      events.filter(col("event_id") % 6 === 0).write.parquet(s"$in/f2") // re-delivery
      def run(cp: String): Unit = withNarrowShuffle(s) {
        EventStream.committedUpsertSink(
          EventStream.fileSource(s, s"$in/*", events.schema, maxFilesPerTrigger = Some(1)),
          table, cp, Seq("event_id"), "ts", appId = "q133").awaitTermination()
      }
      run(s"$root/cp1")
      val v1 = VersionedTable.currentVersion(s, table).get
      run(s"$root/cp2") // checkpoint lost: full replay, same appId
      val v2 = VersionedTable.currentVersion(s, table).get
      require(v2 == v1, s"q133: replay after checkpoint loss must add no version: $v1 -> $v2")
      val hist = VersionedTable.txnHistory(s, table, "q133").flatMap(_._2)
      require(hist == hist.distinct, s"q133: duplicate batch in version history: $hist")
      val t = VersionedTable.read(s, table)
      require(t.count() == events.count(),
        "q133: exactly one surviving row per re-delivered key")
      t.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("event_id")).cast("bigint").as("id_sum"))
    },

    // ---------------------------------------------------------------- q147
    // Watermark late-data accounting: the rows a watermark DROPS are a
    // correctness budget every production stream must state, not a silent
    // approximation. Three CHECKPOINTED AvailableNow runs of one stream —
    // the daily-restart shape — with files landing between runs: two days
    // on time, then a late re-delivery of every fifth event (spanning both
    // days — its tail is within the 1 h lateness bound, its bulk beyond),
    // then the next day on time (advancing the watermark so the late-kept
    // windows finalize and EMIT). The watermark PERSISTS in the checkpoint
    // across restarts — that persistence is what makes run 2 drop at all.
    // Its drop rule (window end ≤ wm at processing time, wm = prior runs'
    // max event time − delay) and the append-mode emit rule (window end ≤
    // final wm) are replayed deterministically by the oracle from the same
    // date arithmetic — microsecond form, safe because window ends are
    // second-aligned while both watermarks carry sub-second offsets (no
    // tie is possible, so ms truncation and ≤-vs-< cannot flip a row).
    // In-query requires pin the interesting case: late rows both kept and
    // dropped. (Files landing between runs, not maxFilesPerTrigger: a
    // single listing may legally batch co-present files together, which
    // would process the late file against a still-zero watermark.)
    Q("q147_late_data_accounting",
      """WITH e AS (SELECT event_id, ts FROM events
        |           WHERE ts >= TIMESTAMP '2024-01-15' AND ts < TIMESTAMP '2024-01-18'),
        |f1 AS (SELECT * FROM e WHERE ts < TIMESTAMP '2024-01-17' AND event_id % 5 <> 0),
        |f2 AS (SELECT * FROM e WHERE ts < TIMESTAMP '2024-01-17' AND event_id % 5 = 0),
        |f3 AS (SELECT * FROM e WHERE ts >= TIMESTAMP '2024-01-17'),
        |wm1 AS (SELECT max(epoch_us(ts)) - 3600000000 AS us FROM f1),
        |wmf AS (SELECT max(epoch_us(ts)) - 3600000000 AS us FROM e),
        |kept AS (SELECT * FROM f1
        |  UNION ALL SELECT f2.* FROM f2, wm1
        |    WHERE epoch_us(date_trunc('hour', ts)) + 3600000000 > wm1.us
        |  UNION ALL SELECT * FROM f3),
        |agg AS (SELECT epoch_us(date_trunc('hour', ts)) AS win_start_us,
        |    count(*) AS n_events, CAST(sum(event_id) AS BIGINT) AS id_sum
        |  FROM kept GROUP BY 1)
        |SELECT win_start_us, n_events, id_sum FROM agg, wmf
        |WHERE win_start_us + 3600000000 <= wmf.us""".stripMargin) { (s, dir) =>
      val e = Tables.load(s, dir, "events")
        .filter(col("ts") >= lit("2024-01-15").cast("timestamp") &&
          col("ts") < lit("2024-01-18").cast("timestamp"))
        .select(col("event_id"), col("ts"))
      val onTime = e.filter(col("ts") < lit("2024-01-17").cast("timestamp"))
      val f1 = onTime.filter(col("event_id") % 5 =!= 0)
      val f2 = onTime.filter(col("event_id") % 5 === 0)
      val f3 = e.filter(col("ts") >= lit("2024-01-17").cast("timestamp"))
      val root = scratch(s, dir, "q147")
      val (in, out) = (s"$root/in", s"$root/out")
      // one restart per landed file; the shared checkpoint carries the
      // watermark (and which files are already ingested) across runs. The
      // sink is a real parquet file sink (append): a memory sink cannot
      // recover from a checkpoint, and this is the production shape anyway.
      def runOnce(): Unit = {
        val q = EventStream.hourlyCounts(
            EventStream.fileSource(s, s"$in/*", e.schema))
          .writeStream.format("parquet")
          .option("path", out)
          .option("checkpointLocation", s"$root/cp")
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      val got = withNarrowShuffle(s) {
        f1.coalesce(1).write.parquet(s"$in/f1")
        runOnce()
        f2.coalesce(1).write.parquet(s"$in/f2")
        runOnce()
        f3.coalesce(1).write.parquet(s"$in/f3")
        runOnce()
        s.read.parquet(out).localCheckpoint()
      }
      // the case must be non-trivial: late rows dropped everywhere, and at
      // any realistic density ALSO some kept (sf0.001's 61-event corpus can
      // leave the final on-time hour empty — the q132-style size-gated leg)
      val wm1 = f1.agg(max(unix_micros(col("ts")))).head().getLong(0) - 3600000000L
      val lateKept = f2.filter(
        unix_micros(date_trunc("hour", col("ts"))) + 3600000000L > wm1).count()
      val lateAll = f2.count()
      require(lateKept < lateAll,
        s"q147: the watermark must drop late rows: kept $lateKept of $lateAll")
      if (e.count() >= 500)
        require(lateKept > 0,
          s"q147: late rows within the lateness bound must survive: kept $lateKept of $lateAll")
      require(got.agg(sum(col("n_events"))).head().getLong(0) < e.count(),
        "q147: dropped late rows must be visible in the emitted totals")
      got.select(col("win_start_us"), col("n_events"), col("id_sum"))
    },

    // ---------------------------------------------------------------- q148
    // Stream-static join with dimension refresh: the static side of a
    // stream-static join is re-resolved when the streaming plan is built,
    // so a restart (the daily shape) picks up the dim's NEW VersionedTable
    // version while every batch within a run reads ONE immutable snapshot
    // — the consistency contract a streaming enrichment join needs (no
    // torn dim mid-batch, fresh dim per restart). Day 1 streams against
    // dim v1 (tier = user % 3), v2 lands (tier + 10), day 2's restart
    // streams against v2. The oracle replays both days with their
    // respective tier functions; in-query requires pin that BOTH versions
    // actually enriched rows and the table ended at version 2.
    Q("q148_stream_static_refresh",
      """WITH e AS (SELECT event_id, ts, user_id FROM events
        |           WHERE ts >= TIMESTAMP '2024-01-15' AND ts < TIMESTAMP '2024-01-17'),
        |d1 AS (SELECT event_id, user_id, user_id % 3 AS tier FROM e
        |       WHERE ts < TIMESTAMP '2024-01-16'),
        |d2 AS (SELECT event_id, user_id, user_id % 3 + 10 AS tier FROM e
        |       WHERE ts >= TIMESTAMP '2024-01-16')
        |SELECT tier, count(*) AS n_events,
        |  CAST(SUM(event_id) AS BIGINT) AS id_sum
        |FROM (SELECT * FROM d1 UNION ALL SELECT * FROM d2)
        |GROUP BY 1""".stripMargin) { (s, dir) =>
      import graft.ops.VersionedTable
      val e = Tables.load(s, dir, "events")
        .filter(col("ts") >= lit("2024-01-15").cast("timestamp") &&
          col("ts") < lit("2024-01-17").cast("timestamp"))
        .select(col("event_id"), col("ts"), col("user_id"))
      val day1 = e.filter(col("ts") < lit("2024-01-16").cast("timestamp"))
      val day2 = e.filter(col("ts") >= lit("2024-01-16").cast("timestamp"))
      val users = e.select(col("user_id")).distinct()
      val root = scratch(s, dir, "q148")
      val (in, out, dim) = (s"$root/in", s"$root/out", s"$root/dim")
      def runOnce(): Unit = {
        // the static side resolves the dim's LIVE version at plan time;
        // within the run every micro-batch joins that one immutable dir
        val enriched = EventStream.fileSource(s, s"$in/*", e.schema)
          .join(broadcast(VersionedTable.read(s, dim)), Seq("user_id"))
          .select(col("event_id"), col("user_id"), col("tier"))
        val q = enriched.writeStream.format("parquet")
          .option("path", out).option("checkpointLocation", s"$root/cp")
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      val got = withNarrowShuffle(s) {
        VersionedTable.write(users.withColumn("tier", col("user_id") % 3), dim)
        day1.coalesce(1).write.parquet(s"$in/f1")
        runOnce()
        VersionedTable.write(users.withColumn("tier", col("user_id") % 3 + 10), dim)
        day2.coalesce(1).write.parquet(s"$in/f2")
        runOnce()
        s.read.parquet(out).localCheckpoint()
      }
      require(VersionedTable.currentVersion(s, dim).contains(2L),
        "q148: the dim must have advanced to version 2")
      require(got.filter(col("tier") < 10).count() > 0 &&
        got.filter(col("tier") >= 10).count() > 0,
        "q148: both dim versions must have enriched rows")
      got.groupBy(col("tier"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("event_id")).cast("bigint").as("id_sum"))
    },

    // ---------------------------------------------------------------- q155
    // Streaming CEP (ordered pattern view -> click -> purchase, each step
    // within 6 h): flatMapGroupsWithState holds THREE LONGS per user — the
    // latest view and the latest view-anchored click — which is lossless
    // because "latest qualifying X" is monotone in event-time order (see
    // Cep.scala). The corpus splits at mid-month into two micro-batches so
    // chains SPAN the batch boundary through persisted state; the in-query
    // require pins equality with the batch twin (two keyed max-joins — also
    // the backfill plan at scale), and the oracle replays exactly that SQL.
    Q("q155_streaming_cep",
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
        |v AS (SELECT user_id, us FROM e WHERE event_type = 'view'),
        |c AS (SELECT user_id, us FROM e WHERE event_type = 'click'),
        |p AS (SELECT user_id, us FROM e WHERE event_type = 'purchase'),
        |anchored AS (
        |  SELECT c.user_id, c.us AS c_us, max(v.us) AS v_us
        |  FROM c JOIN v ON v.user_id = c.user_id
        |    AND v.us <= c.us AND v.us >= c.us - 21600000000
        |  GROUP BY 1, 2),
        |m AS (
        |  SELECT p.user_id, p.us AS p_us, max(a.c_us) AS c_us
        |  FROM p JOIN anchored a ON a.user_id = p.user_id
        |    AND a.c_us <= p.us AND a.c_us >= p.us - 21600000000
        |  GROUP BY 1, 2)
        |SELECT m.user_id, a.v_us, m.c_us, m.p_us
        |FROM m JOIN anchored a ON a.user_id = m.user_id AND a.c_us = m.c_us""".stripMargin) { (s, dir) =>
      import s.implicits._
      import graft.streaming.Cep
      val stepUs = 6L * 3600L * 1000000L
      val e = Tables.load(s, dir, "events")
        .filter(col("event_type").isin("view", "click", "purchase"))
        .select(col("user_id").as("key"), unix_micros(col("ts")).as("tsUs"),
          col("event_type").as("etype"))
      val in = scratch(s, dir, "q155")
      val cut = lit("2024-01-16").cast("timestamp")
      e.filter(col("tsUs") < unix_micros(cut)).coalesce(1).write.parquet(s"$in/f1")
      e.filter(col("tsUs") >= unix_micros(cut)).coalesce(1).write.parquet(s"$in/f2")
      val stream = EventStream.fileSource(s, s"$in/*", e.schema,
        maxFilesPerTrigger = Some(1)).as[Cep.CepEvent]
      val sink = sinkName("q155_cep")
      // batch twin (latest anchored click per purchase, latest view per
      // click) is independent of the stream — materialize it concurrently
      import scala.concurrent.{Await, Future}
      import scala.concurrent.ExecutionContext.Implicits.global
      import scala.concurrent.duration.Duration
      val (got, want) = withNarrowShuffle(s) {
        val wantF = Future {
          def typed(t: String) = e.filter(col("etype") === t).select(col("key"), col("tsUs"))
          val anchored = typed("click").as("c")
            .join(typed("view").as("v"), col("v.key") === col("c.key") &&
              col("v.tsUs") <= col("c.tsUs") && col("v.tsUs") >= col("c.tsUs") - stepUs)
            .groupBy(col("c.key").as("key"), col("c.tsUs").as("c_us"))
            .agg(max(col("v.tsUs")).as("v_us"))
          val m = typed("purchase").as("p")
            .join(anchored.as("a"), col("a.key") === col("p.key") &&
              col("a.c_us") <= col("p.tsUs") && col("a.c_us") >= col("p.tsUs") - stepUs)
            .groupBy(col("p.key").as("key"), col("p.tsUs").as("p_us"))
            .agg(max(col("c_us")).as("c_us"))
          m.as("m").join(anchored.as("a"), Seq("key", "c_us"))
            .select(col("key"), col("v_us"), col("c_us"), col("p_us"))
            .localCheckpoint()
        }
        val g = EventStream.runAvailableNow(
          Cep.matches(stream, stepUs).toDF(), sink).localCheckpoint()
        (g, Await.result(wantF, Duration.Inf))
      }
      s.catalog.dropTempView(sink)
      val gotAligned = got.select(col("key"), col("v_us"), col("c_us"), col("p_us"))
      require(Q.sameMultiset(gotAligned, want),
        "q155: streaming CEP matches must equal the batch twin")
      gotAligned.select(col("key").as("user_id"), col("v_us"), col("c_us"), col("p_us"))
    },

    // ---------------------------------------------------------------- q198
    // General quantified CEP — SQL:2016 MATCH_RECOGNIZE's PATTERN
    // (A B+ C): view, one-or-more contiguous clicks (inter-click gap ≤ 24h,
    // no view in between), purchase within 24h of the last click — 24h so
    // multi-click runs exist even at sf0.001 (6h leaves max n_b = 1 there
    // and the quantifier guard below would fail vacuously). q155
    // hard-codes the 3-step chain; the + quantifier is what a state
    // machine must COUNT without buffering (state stays O(1): the run is
    // contiguous, so first/last/count is the whole evidence). Runs the
    // real stream over two files (chains span the micro-batch boundary,
    // state carries the open run across), requires equality with the
    // gaps-and-islands batch twin (the windowed form a 100 TB backfill
    // uses — no state machine), and the oracle replays islands + the
    // last-B-before-each-C pickup in pure window SQL.
    Q("q198_streaming_cep_general",
      """WITH e AS (SELECT user_id AS key, epoch_us(ts) AS us,
        |    CASE event_type WHEN 'view' THEN 0 WHEN 'click' THEN 1 ELSE 2 END AS prio
        |  FROM events WHERE event_type IN ('view', 'click', 'purchase')),
        |wa AS (SELECT key, us, prio,
        |    max(CASE WHEN prio = 0 THEN us END) OVER
        |      (PARTITION BY key ORDER BY us, prio ROWS UNBOUNDED PRECEDING) AS lastA
        |  FROM e),
        |b AS (SELECT key, us, lastA,
        |    lag(us) OVER (PARTITION BY key ORDER BY us) AS prevB
        |  FROM wa WHERE prio = 1),
        |b2 AS (SELECT *, CASE WHEN prevB IS NULL OR us - prevB > 86400000000
        |       OR lastA > prevB THEN 1 ELSE 0 END AS newi FROM b),
        |b3 AS (SELECT *, sum(newi) OVER (PARTITION BY key ORDER BY us
        |       ROWS UNBOUNDED PRECEDING) AS island FROM b2),
        |b4 AS (SELECT key, us,
        |    first_value(us) OVER (PARTITION BY key, island ORDER BY us) AS bfirst,
        |    count(*) OVER (PARTITION BY key, island ORDER BY us
        |                   ROWS UNBOUNDED PRECEDING) AS nsofar,
        |    first_value(lastA) OVER (PARTITION BY key, island ORDER BY us) AS anchorA
        |  FROM b3),
        |u AS (SELECT key, us, 1 AS prio, anchorA, bfirst, us AS blast, nsofar,
        |      (anchorA IS NOT NULL AND bfirst - anchorA <= 86400000000) AS anchored
        |      FROM b4
        |      UNION ALL
        |      SELECT key, us, 2, NULL, NULL, NULL, NULL, NULL FROM wa WHERE prio = 2),
        |u2 AS (SELECT key, us, prio,
        |    last_value(CASE WHEN prio = 1 THEN struct_pack(a := anchorA,
        |        bf := bfirst, bl := blast, n := nsofar, anc := anchored) END
        |      IGNORE NULLS)
        |      OVER (PARTITION BY key ORDER BY us, prio, coalesce(nsofar, 0)
        |            ROWS UNBOUNDED PRECEDING) AS r
        |  FROM u)
        |SELECT key AS user_id, r.a AS a_us, r.bf AS b_first_us, r.bl AS b_last_us,
        |  CAST(r.n AS BIGINT) AS n_b, us AS c_us
        |FROM u2 WHERE prio = 2 AND r IS NOT NULL AND r.anc
        |  AND us - r.bl <= 86400000000""".stripMargin) { (s, dir) =>
      import s.implicits._
      import graft.streaming.Cep
      val stepUs = 24L * 3600L * 1000000L
      val e = Tables.load(s, dir, "events")
        .filter(col("event_type").isin("view", "click", "purchase"))
        .select(col("user_id").as("key"), unix_micros(col("ts")).as("tsUs"),
          col("event_type").as("etype"))
      val in = scratch(s, dir, "q198")
      val cut = lit("2024-01-16").cast("timestamp")
      e.filter(col("tsUs") < unix_micros(cut)).coalesce(1).write.parquet(s"$in/f1")
      e.filter(col("tsUs") >= unix_micros(cut)).coalesce(1).write.parquet(s"$in/f2")
      val stream = EventStream.fileSource(s, s"$in/*", e.schema,
        maxFilesPerTrigger = Some(1)).as[Cep.CepEvent]
      val sink = sinkName("q198_cep_gen")
      // the gaps-and-islands batch twin is independent of the stream —
      // materialize it concurrently
      import scala.concurrent.{Await, Future}
      import scala.concurrent.ExecutionContext.Implicits.global
      import scala.concurrent.duration.Duration
      val (got, want) = withNarrowShuffle(s) {
        val wantF = Future(
          Cep.quantifiedBatch(e, "view", "click", "purchase", stepUs)
            .localCheckpoint())
        val g = EventStream.runAvailableNow(
          Cep.quantified(stream, "view", "click", "purchase", stepUs).toDF(),
          sink).localCheckpoint()
        (g, Await.result(wantF, Duration.Inf))
      }
      s.catalog.dropTempView(sink)
      val gotAligned = got.select(col("key"), col("a_us"), col("b_first_us"),
        col("b_last_us"), col("n_b"), col("c_us"))
      val wantAligned = want.select(col("key"), col("a_us"), col("b_first_us"),
        col("b_last_us"), col("n_b"), col("c_us"))
      require(Q.sameMultiset(gotAligned, wantAligned),
        "q198: streaming quantified CEP must equal the gaps-and-islands twin")
      require(got.filter(col("n_b") > 1).head(1).nonEmpty,
        "q198: the + quantifier must be exercised (some run with n_b > 1)")
      gotAligned.withColumnRenamed("key", "user_id")
    },

    // ---------------------------------------------------------------- q174
    // Stream-stream LEFT OUTER interval join: the semantics q116 (inner)
    // cannot show — a never-matched error emits ONE null-extended row, and
    // only once the global watermark passes its last possible match
    // (error ts + upper bound). The un-emittable tail — errors whose join
    // window is still open at stream end — stays in state, exactly as a
    // 24/7 deployment would hold it; the oracle replays the closure rule
    // (e_us < min(max error ts, max click ts) − 1 h delay) from the same
    // date arithmetic, safe because both sides carry independent µs offsets
    // so a tie on the closure boundary cannot occur. Matched pairs are
    // watermark-independent and must equal the batch range join exactly.
    Q("q174_streaming_outer_join",
      """WITH w AS (SELECT * FROM events WHERE ts < TIMESTAMP '2024-01-08 00:00:00'),
        |err AS (SELECT user_id, ts, event_id, epoch_us(ts) AS e_us FROM w
        |        WHERE event_type = 'error'),
        |clk AS (SELECT user_id, epoch_us(ts) AS c_us FROM w
        |        WHERE event_type = 'click'),
        |wm AS (SELECT least((SELECT max(e_us) FROM err),
        |                    (SELECT max(c_us) FROM clk)) - 3600000000 AS us),
        |m AS (SELECT e.user_id, e.event_id, c.c_us
        |      FROM err e JOIN clk c ON c.user_id = e.user_id
        |      AND c.c_us >= e.e_us - 3600000000 AND c.c_us <= e.e_us),
        |unmatched AS (SELECT e.user_id, e.event_id FROM err e, wm
        |      WHERE e.e_us < wm.us AND NOT EXISTS (
        |        SELECT 1 FROM clk c WHERE c.user_id = e.user_id
        |        AND c.c_us >= e.e_us - 3600000000 AND c.c_us <= e.e_us))
        |SELECT user_id,
        |  CAST(count(c_us) AS BIGINT) AS n_pairs,
        |  CAST(count(*) FILTER (WHERE c_us IS NULL) AS BIGINT) AS n_unmatched
        |FROM (SELECT user_id, event_id, c_us FROM m
        |      UNION ALL SELECT user_id, event_id, NULL FROM unmatched)
        |GROUP BY 1""".stripMargin) { (s, dir) =>
      val events = Tables.load(s, dir, "events")
        .filter(col("ts") < lit("2024-01-08 00:00:00").cast("timestamp"))
      val errors = events.filter(col("event_type") === "error")
        .select(col("user_id"), col("ts"), col("event_id"))
      val clicks = events.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts").as("click_ts"))
      val in = scratch(s, dir, "q174")
      errors.coalesce(1).write.parquet(s"$in/errors")
      clicks.coalesce(1).write.parquet(s"$in/clicks")
      val sink = sinkName("q174_oj")
      // the batch replay (watermark bound, boundary guard, range join) is
      // independent of the stream — build it CONCURRENTLY with the stream
      // run; the audit joins both sides at the end
      import scala.concurrent.{Await, Future}
      import scala.concurrent.ExecutionContext.Implicits.global
      import scala.concurrent.duration.Duration
      val (got174, want174) = withNarrowShuffle(s) {
      val wantF = Future {
        // batch replay: matched pairs always; null rows only for
        // never-matched errors whose closure (ts + upper) fell below the
        // final watermark
        val wmUs = math.min(
          errors.agg(max(unix_micros(col("ts")))).head().getLong(0),
          clicks.agg(max(unix_micros(col("click_ts")))).head().getLong(0)) - 3600000000L
        // Boundary guard (round-4 ADVICE): the replay closes an error with
        // strict e_us < wmUs; whether Spark emits the null row when the
        // closure time EQUALS the final watermark depends on its internal
        // eviction inequality. Assert the boundary is unpopulated so the
        // equivalence below cannot silently depend on Spark's convention.
        require(errors.filter(unix_micros(col("ts")) === wmUs).isEmpty,
          "q174: an error sits exactly on the watermark closure boundary — " +
            "the strict-inequality replay is not comparable on this data")
        val matched = graft.ops.RangeJoin.timeWindow(errors, clicks,
          Seq("user_id"), "ts", "click_ts",
          lowerUs = -3600000000L, upperUs = 0L)
          .localCheckpoint() // feeds the anti-join AND the equality frame
        val unmatched = errors
          .join(matched.select(col("event_id")).distinct(), Seq("event_id"), "left_anti")
          .filter(unix_micros(col("ts")) < wmUs)
          .select(col("user_id"), col("ts"), col("event_id"),
            lit(null).cast("timestamp").as("click_ts"))
        matched.unionByName(unmatched).localCheckpoint()
      }
      val g174 = EventStream.runAvailableNow(
        EventStream.intervalJoin(
          EventStream.fileSource(s, s"$in/errors", errors.schema),
          EventStream.fileSource(s, s"$in/clicks", clicks.schema),
          Seq("user_id"), "ts", "click_ts",
          lowerUs = -3600000000L, upperUs = 0L, delay = "1 hour",
          joinType = "leftOuter"),
        sink).localCheckpoint()
      (g174, Await.result(wantF, Duration.Inf))
      }
      val got = got174
      s.catalog.dropTempView(sink)
      require(Q.sameMultiset(got, want174),
        "q174: streaming outer join must equal the batch replay of the closure rule")
      require(got.filter(col("click_ts").isNull).count() > 0,
        "q174: the outer side must actually emit null-extended rows")
      got.groupBy(col("user_id"))
        .agg(count(col("click_ts")).as("n_pairs"),
          sum(when(col("click_ts").isNull, 1L).otherwise(0L)).cast("bigint")
            .as("n_unmatched"))
    },

    // ---------------------------------------------------------------- q179
    // State-store metrics ON the scoreboard (round-4 VERDICT item): every
    // "bounded state" claim in this catalog was asserted from the operator's
    // construction; this entry MEASURES it. A watermarked daily-window
    // aggregation keyed by event_type runs as two checkpointed AvailableNow
    // restarts (day files landing between runs, the q147 shape), and each
    // run's StreamingQueryProgress.stateOperators is read back: the maximum
    // numRowsTotal the state store ever holds is require'd ≤ the watermark-
    // window domain (distinct (day, event_type) pairs in the input) — rows
    // in state can never exceed the key domain the watermark keeps open —
    // and memoryUsedBytes must be reported positive. The oracle replays the
    // append-mode emission rule (window end ≤ final watermark) from the
    // same date arithmetic; window ends are day-aligned while the watermark
    // carries an in-day offset, and a require pins the no-tie precondition.
    Q("q179_state_metrics",
      """WITH e AS (SELECT event_id, ts, event_type FROM events
        |           WHERE ts >= TIMESTAMP '2024-01-15' AND ts < TIMESTAMP '2024-01-18'),
        |wmf AS (SELECT max(epoch_us(ts)) - 3600000000 AS us FROM e),
        |agg AS (SELECT epoch_us(date_trunc('day', ts)) AS win_start_us, event_type,
        |    CAST(count(*) AS BIGINT) AS n_events,
        |    CAST(sum(event_id) AS BIGINT) AS id_sum
        |  FROM e GROUP BY 1, 2)
        |SELECT win_start_us, event_type, n_events, id_sum FROM agg, wmf
        |WHERE win_start_us + 86400000000 <= wmf.us""".stripMargin) { (s, dir) =>
      val e = Tables.load(s, dir, "events")
        .filter(col("ts") >= lit("2024-01-15").cast("timestamp") &&
          col("ts") < lit("2024-01-18").cast("timestamp"))
        .select(col("event_id"), col("ts"), col("event_type"))
      val f1 = e.filter(col("ts") < lit("2024-01-17").cast("timestamp"))
      val f2 = e.filter(col("ts") >= lit("2024-01-17").cast("timestamp"))
      val root = scratch(s, dir, "q179")
      val (in, out) = (s"$root/in", s"$root/out")
      // one restart per landed file; progress snapshots are harvested from
      // each run's handle before it stops (recentProgress dies with the run)
      val stateRows = scala.collection.mutable.ArrayBuffer.empty[Long]
      val stateBytes = scala.collection.mutable.ArrayBuffer.empty[Long]
      def runOnce(): Unit = {
        val q = EventStream.fileSource(s, s"$in/*", e.schema)
          .withWatermark("ts", "1 hour")
          .groupBy(window(col("ts"), "1 day"), col("event_type"))
          .agg(count(lit(1)).as("n_events"),
            sum(col("event_id")).cast("long").as("id_sum"))
          .select(unix_micros(col("window.start")).as("win_start_us"),
            col("event_type"), col("n_events"), col("id_sum"))
          .writeStream.format("parquet")
          .option("path", out)
          .option("checkpointLocation", s"$root/cp")
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        q.recentProgress.foreach { p =>
          p.stateOperators.foreach { so =>
            stateRows += so.numRowsTotal
            stateBytes += so.memoryUsedBytes
          }
        }
      }
      val got = withNarrowShuffle(s) {
        f1.coalesce(1).write.parquet(s"$in/f1")
        runOnce()
        f2.coalesce(1).write.parquet(s"$in/f2")
        runOnce()
        s.read.parquet(out).localCheckpoint()
      }
      // the bound: rows in state ≤ the open key domain — distinct
      // (day, event_type) pairs across the whole input (the watermark can
      // hold at most every unseen-final window simultaneously)
      val domain = e.select(date_trunc("day", col("ts")), col("event_type"))
        .distinct().count()
      if (e.head(1).nonEmpty) {
        require(stateRows.nonEmpty && stateRows.max > 0,
          "q179: the state operator must report rows in state")
        require(stateRows.max <= domain,
          s"q179: state rows ${stateRows.max} exceed the key domain $domain")
        require(stateBytes.max > 0,
          "q179: the state operator must report its memory footprint")
      }
      // no-tie precondition for the oracle's ≤ emission replay (q174 rule)
      val wmUs = e.agg(max(unix_micros(col("ts")))).head().getLong(0) - 3600000000L
      require(wmUs % 86400000000L != 0L,
        "q179: final watermark sits exactly on a day boundary — emission " +
          "replay is not comparable on this data")
      got
    },

    // ---------------------------------------------------------------- q186
    // RocksDB state store — the provider a 100 TB stream actually runs:
    // the default HDFS-backed store holds every key on the JVM heap, so
    // state is bounded by executor memory; RocksDB spills to local disk
    // and bounds only the working set (why Spark ships it for large-state
    // jobs, and what Databricks defaults to). The SAME watermarked daily
    // aggregation runs twice from scratch — default provider, then RocksDB
    // (own checkpoint: state formats are not interchangeable) — and the
    // entry requires bit-identical emitted rows (state semantics must not
    // depend on the provider) plus RocksDB's own progress metrics
    // reporting actual puts. The oracle replays the emission rule once.
    Q("q186_rocksdb_state_store",
      """WITH e AS (SELECT event_id, ts, event_type FROM events
        |           WHERE ts >= TIMESTAMP '2024-01-15' AND ts < TIMESTAMP '2024-01-18'),
        |wmf AS (SELECT max(epoch_us(ts)) - 3600000000 AS us FROM e),
        |agg AS (SELECT epoch_us(date_trunc('day', ts)) AS win_start_us, event_type,
        |    CAST(count(*) AS BIGINT) AS n_events,
        |    CAST(sum(event_id) AS BIGINT) AS id_sum
        |  FROM e GROUP BY 1, 2)
        |SELECT win_start_us, event_type, n_events, id_sum FROM agg, wmf
        |WHERE win_start_us + 86400000000 <= wmf.us""".stripMargin) { (s, dir) =>
      val e = Tables.load(s, dir, "events")
        .filter(col("ts") >= lit("2024-01-15").cast("timestamp") &&
          col("ts") < lit("2024-01-18").cast("timestamp"))
        .select(col("event_id"), col("ts"), col("event_type"))
      val f1 = e.filter(col("ts") < lit("2024-01-17").cast("timestamp"))
      val f2 = e.filter(col("ts") >= lit("2024-01-17").cast("timestamp"))
      val root = scratch(s, dir, "q186")
      val rocksdbPuts = scala.collection.mutable.ArrayBuffer.empty[Long]
      // The two provider pipelines are fully independent (own input dirs,
      // checkpoints, sinks) — each runs on a CLONED session so its
      // stateStore.providerClass conf is isolated, and the two run
      // CONCURRENTLY: the restart-order contract is per pipeline, never
      // across providers, so overlapping them halves the wall-clock the
      // four AvailableNow engine floors would otherwise serialize.
      def runPipeline(tag: String, provider: Option[String]): org.apache.spark.sql.DataFrame = {
        val ps = s.newSession()
        ps.conf.set("spark.sql.shuffle.partitions", "4")
        provider.foreach(p => ps.conf.set(
          "spark.sql.streaming.stateStore.providerClass", p))
        val (in, out, cp) = (s"$root/$tag/in", s"$root/$tag/out", s"$root/$tag/cp")
        def runOnce(): Unit = {
          val q = EventStream.fileSource(ps, s"$in/*", e.schema)
            .withWatermark("ts", "1 hour")
            .groupBy(window(col("ts"), "1 day"), col("event_type"))
            .agg(count(lit(1)).as("n_events"),
              sum(col("event_id")).cast("long").as("id_sum"))
            .select(unix_micros(col("window.start")).as("win_start_us"),
              col("event_type"), col("n_events"), col("id_sum"))
            .writeStream.format("parquet")
            .option("path", out).option("checkpointLocation", cp)
            .outputMode("append")
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start()
          q.awaitTermination()
          if (provider.nonEmpty) q.recentProgress.foreach(_.stateOperators.foreach { so =>
            // RocksDB reports its own engine counters; a provider that
            // silently fell back to the default would report none
            Option(so.customMetrics.get("rocksdbPutCount"))
              .foreach(v => rocksdbPuts.synchronized { rocksdbPuts += v.longValue() })
          })
        }
        f1.coalesce(1).write.parquet(s"$in/f1"); runOnce()
        f2.coalesce(1).write.parquet(s"$in/f2"); runOnce()
        s.read.parquet(out).localCheckpoint()
      }
      val got = {
        import scala.concurrent.{Await, Future}
        import scala.concurrent.ExecutionContext.Implicits.global
        import scala.concurrent.duration.Duration
        val fDefault = Future(runPipeline("hdfs", None))
        val fRocks = Future(runPipeline("rocks", Some(
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")))
        val viaDefault = Await.result(fDefault, Duration.Inf)
        val viaRocks = Await.result(fRocks, Duration.Inf)
        require(Q.sameMultiset(viaRocks, viaDefault),
          "q186: state semantics must not depend on the store provider")
        viaRocks
      }
      if (e.head(1).nonEmpty)
        require(rocksdbPuts.nonEmpty && rocksdbPuts.max > 0,
          "q186: the RocksDB provider must report actual put traffic")
      got
    },

    // ---------------------------------------------------------------- q188
    // transformWithState (Spark 4's arbitrary-stateful successor to
    // flatMapGroupsWithState, SPARK-46815): per-key running totals across
    // two checkpointed restarts, state declared as a typed ValueState
    // against the processor handle (its own RocksDB column family — the
    // required provider). Every emitted row is a cumulative snapshot after
    // a batch that touched the key, so the oracle replays the exact output
    // from the two input prefixes; the in-query require pins the stronger
    // invariant that each key's LAST snapshot equals the full-input batch
    // aggregate (cross-restart state survived and accumulated correctly).
    Q("q188_transform_with_state",
      """WITH e AS (SELECT event_id, ts, event_type FROM events
        |           WHERE ts >= TIMESTAMP '2024-01-15' AND ts < TIMESTAMP '2024-01-18'),
        |b1 AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_total,
        |         CAST(sum(event_id) AS BIGINT) AS id_sum
        |       FROM e WHERE ts < TIMESTAMP '2024-01-17' GROUP BY 1),
        |ball AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_total,
        |          CAST(sum(event_id) AS BIGINT) AS id_sum
        |        FROM e GROUP BY 1)
        |SELECT * FROM b1
        |UNION ALL
        |SELECT * FROM ball WHERE event_type IN (
        |  SELECT DISTINCT event_type FROM e WHERE ts >= TIMESTAMP '2024-01-17')"""
        .stripMargin) { (s, dir) =>
      import graft.streaming.RunningTotals
      import s.implicits._
      val e = Tables.load(s, dir, "events")
        .filter(col("ts") >= lit("2024-01-15").cast("timestamp") &&
          col("ts") < lit("2024-01-18").cast("timestamp"))
        .select(col("event_id"), col("ts"), col("event_type"))
      val f1 = e.filter(col("ts") < lit("2024-01-17").cast("timestamp"))
      val f2 = e.filter(col("ts") >= lit("2024-01-17").cast("timestamp"))
      val root = scratch(s, dir, "q188")
      val (in, out, cp) = (s"$root/in", s"$root/out", s"$root/cp")
      val provKey = "spark.sql.streaming.stateStore.providerClass"
      val prevProv = s.conf.get(provKey)
      s.conf.set(provKey,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      val got = try withNarrowShuffle(s) {
        def runOnce(): Unit = {
          val src = EventStream.fileSource(s, s"$in/*", e.schema)
            .select(col("event_type").as("etype"), col("event_id").as("eventId"))
            .as[RunningTotals.In]
          val q = RunningTotals.totals(src)
            .toDF("event_type", "n_total", "id_sum")
            .writeStream.format("parquet")
            .option("path", out).option("checkpointLocation", cp)
            .outputMode("append")
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start()
          q.awaitTermination()
        }
        f1.coalesce(1).write.parquet(s"$in/f1"); runOnce()
        f2.coalesce(1).write.parquet(s"$in/f2"); runOnce()
        s.read.parquet(out).localCheckpoint()
      } finally s.conf.set(provKey, prevProv)
      // last snapshot per key ≡ the full-input aggregate (state survived
      // the restart): the max-n row per key is the last one by construction
      val last = graft.ops.Dedup.latestBy(got, Seq(col("event_type")),
        Seq(col("n_total")))
      val want = e.groupBy(col("event_type"))
        .agg(count(lit(1)).cast("bigint").as("n_total"),
          sum(col("event_id")).cast("bigint").as("id_sum"))
      require(Q.sameMultiset(last, want),
        "q188: each key's last snapshot must equal the batch aggregate")
      got
    },

    // ---------------------------------------------------------------- q210
    // The FULL lakehouse loop, exactly-once end to end: streaming upsert
    // ingest (q133's txn-marker commit) WITH change capture per micro-batch
    // (q200's CDF) feeding an incrementally-maintained view (q201's delta
    // rule). ChangeFeed.commitCommitted makes one decision absorb both
    // sides: a re-delivered batch — including a FULL replay against a lost
    // checkpoint — produces no new version AND no duplicate feed entries,
    // so every downstream feed consumer inherits exactly-once without its
    // own dedup state. Requires pin: replay adds zero versions, the txn
    // history holds each batch at most once, the feed is pure inserts
    // summing to the table (re-merged duplicate keys diff to NOTHING —
    // value-identical upserts produce empty captures), and the view folded
    // from the feed equals a direct aggregate of the final table exactly.
    // The oracle checks that view against the base events.
    Q("q210_streaming_cdf_exactly_once",
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(SUM(event_id) AS BIGINT) AS id_sum
        |FROM events WHERE event_id % 2 = 1 GROUP BY 1""".stripMargin) { (s, dir) =>
      import graft.ops.{ChangeFeed, Dedup, IncrementalView, Upsert, VersionedTable}
      val events = Tables.load(s, dir, "events")
        .filter(col("event_id") % 2 === 1)
        .select(col("event_id"), col("ts"), col("user_id"), col("event_type"))
      val root = scratch(s, dir, "q210")
      val (in, table) = (s"$root/in", s"$root/table")
      events.write.parquet(s"$in/f1")
      events.filter(col("event_id") % 5 === 0).write.parquet(s"$in/f2") // re-delivery
      def run(cp: String): Unit = withNarrowShuffle(s) {
        EventStream.fileSource(s, s"$in/*", events.schema, maxFilesPerTrigger = Some(1))
          .writeStream
          .option("checkpointLocation", cp)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
            val spark = batch.sparkSession
            val deduped = Dedup.latestBy(batch, Seq(col("event_id")), Seq(col("ts")))
            val target = VersionedTable.readOrEmpty(spark, table, batch.schema)
            ChangeFeed.commitCommitted(Upsert.merge(target, deduped, Seq("event_id")),
              table, Seq("event_id"), appId = "q210", batchId = batchId)
            ()
          }.start().awaitTermination()
      }
      run(s"$root/cp1")
      val v1 = VersionedTable.currentVersion(s, table).get
      run(s"$root/cp2") // checkpoint lost: full replay, same appId
      require(VersionedTable.currentVersion(s, table).contains(v1),
        "q210: replay after checkpoint loss must add no version")
      val hist = VersionedTable.txnHistory(s, table, "q210").flatMap(_._2)
      require(hist == hist.distinct, s"q210: duplicate batch in history: $hist")
      // the feed carries each surviving row exactly once, as an insert —
      // value-identical re-merges captured NOTHING
      val feed = ChangeFeed.tableChanges(s, table, 0L, v1, Seq("event_id"))
        .localCheckpoint()
      val t = VersionedTable.read(s, table)
      require(feed.groupBy(col(ChangeFeed.ChangeType)).count()
        .collect().map(r => r.get(0).toString -> r.getLong(1)).toMap ==
        Map("insert" -> t.count()),
        "q210: the feed must be pure inserts, one per surviving key")
      // downstream view folded from the FEED equals the direct aggregate
      val spec = IncrementalView.Spec(Seq("event_type"),
        Seq("id_sum" -> col("event_id")))
      val view = IncrementalView.merge(
        IncrementalView.full(t.limit(0), spec),
        IncrementalView.delta(feed, spec), spec)
      val direct = IncrementalView.full(t, spec)
      require(Q.sameMultiset(view, direct),
        "q210: the feed-maintained view must equal the direct aggregate")
      view.select(col("event_type"),
        col(IncrementalView.NCol).cast("bigint").as("n_events"),
        col("id_sum").cast("bigint").as("id_sum"))
    },

    // ---------------------------------------------------------------- q257
    // EVENT-TIME TIMERS (`streaming/InactivityTimeout.scala`): the
    // transformWithState surface q188 leaves untouched — per-user timers
    // reset by every event, fired by WATERMARK passage, emitting a timeout
    // record for users provably quiet for a day. The negative (absence of
    // data) is observable only through the watermark, so this is the one
    // operator class no windowed aggregate can express. Two AvailableNow
    // runs over a phase-split month: run 1's watermark convicts users
    // quiet before mid-month (timers are CHECKPOINT-DURABLE — run 2 fires
    // run-1 timers for users who never reappear), a timed-out user who
    // returns starts a FRESH episode and can time out again. The oracle
    // replays the two-run watermark arithmetic in the same millisecond
    // truncation Spark's tracker uses. State is O(1) per live user and
    // zero per convicted one — at 100 TB the store holds the live-user
    // set, never the event history.
    Q("q257_inactivity_timers",
      """WITH e AS (SELECT user_id, epoch_us(ts) AS us FROM events),
        |c AS (SELECT epoch_us(TIMESTAMP '2024-01-16') AS cut),
        |p1 AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n1, max(us) AS m1
        |       FROM e, c WHERE us < cut GROUP BY 1),
        |p2 AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n2, max(us) AS m2
        |       FROM e, c WHERE us >= cut GROUP BY 1),
        |w1 AS (SELECT max(us) // 1000 - 3600000 AS w FROM e, c WHERE us < cut),
        |w2 AS (SELECT max(us) // 1000 - 3600000 AS w FROM e),
        |r1 AS (SELECT user_id, m1 AS last_us, n1 AS n_events FROM p1, w1
        |       WHERE m1 // 1000 + 86400000 <= w),
        |r2a AS (SELECT p2.user_id, m2 AS last_us, n2 AS n_events
        |        FROM p2 JOIN r1 USING (user_id), w2
        |        WHERE m2 // 1000 + 86400000 <= w),
        |rest AS (SELECT user_id,
        |    greatest(COALESCE(m1, -9223372036854775807), COALESCE(m2, -9223372036854775807)) AS last_us,
        |    COALESCE(n1, 0) + COALESCE(n2, 0) AS n_events
        |  FROM p1 FULL JOIN p2 USING (user_id)
        |  WHERE user_id NOT IN (SELECT user_id FROM r1)),
        |r2b AS (SELECT user_id, last_us, CAST(n_events AS BIGINT) AS n_events
        |        FROM rest, w2 WHERE last_us // 1000 + 86400000 <= w)
        |SELECT user_id, last_us, n_events FROM r1
        |UNION ALL SELECT user_id, last_us, n_events FROM r2a
        |UNION ALL SELECT user_id, last_us, n_events FROM r2b""".stripMargin) { (s, dir) =>
      import graft.streaming.InactivityTimeout
      val e = Tables.load(s, dir, "events").select(col("user_id"), col("ts"))
      val cut = lit("2024-01-16").cast("timestamp")
      val f1 = e.filter(col("ts") < cut)
      val f2 = e.filter(col("ts") >= cut)
      val root = scratch(s, dir, "q257")
      val (in, out, cp) = (s"$root/in", s"$root/out", s"$root/cp")
      val provKey = "spark.sql.streaming.stateStore.providerClass"
      val prevProv = s.conf.get(provKey)
      s.conf.set(provKey,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      val got = try withNarrowShuffle(s) {
        def runOnce(): Unit = {
          val q = InactivityTimeout.detect(
            EventStream.fileSource(s, s"$in/*", e.schema),
            gapMs = 24L * 3600 * 1000, delay = "1 hour")
            .toDF()
            .writeStream.format("parquet")
            .option("path", out).option("checkpointLocation", cp)
            .outputMode("append")
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start()
          q.awaitTermination()
        }
        f1.coalesce(1).write.parquet(s"$in/f1")
        runOnce()
        val afterRun1 = s.read.parquet(out).count()
        f2.coalesce(1).write.parquet(s"$in/f2")
        runOnce()
        val all = s.read.parquet(out).localCheckpoint()
        // run 1 already convicted someone (the episode semantics are live,
        // not an artifact of the final watermark alone)
        require(afterRun1 > 0 && all.count() > afterRun1,
          "q257: both runs must emit timeouts")
        all
      } finally s.conf.set(provKey, prevProv)
      // re-offense: at least one user times out in BOTH runs (cleared
      // state rebuilt from phase-2 events alone)
      require(got.groupBy(col("user_id")).count().filter(col("count") > 1)
        .count() > 0, "q257: a returning user must be able to re-offend")
      got.select(col("user_id"), col("last_us"),
        col("n_events").cast("bigint").as("n_events"))
    },

    // ---------------------------------------------------------------- q261
    // STREAMING JOIN-VIEW MAINTENANCE, EXACTLY-ONCE — the full lakehouse
    // composition: table A's NATIVE change-feed stream (q221's
    // version-offset DSv2 source, one version per trigger) drives q254's
    // Z-relation algebra against a static dim, and the counted join view
    // lives as its OWN VersionedTable committed per micro-batch through
    // the txn-marker protocol — so a checkpoint-loss replay of the whole
    // stream re-delivers every batch and commits NOTHING (idempotent
    // maintenance, q210's guarantee lifted from aggregates to join
    // views). Contract: the maintained table equals the full recompute of
    // live-A ⋈ B bit-exactly, and the replay adds no version. Scale
    // shape: each batch costs O(Δversion ⋈ B) with the delta broadcast;
    // the view table write is O(view); the O(A ⋈ B) join runs only as
    // the audit.
    Q("q261_streaming_join_ivm",
      """WITH a AS (SELECT o_orderkey AS okey, o_custkey AS custkey FROM orders),
        |live AS (
        |  SELECT okey, custkey,
        |    CASE WHEN okey % 11 = 1 THEN (okey + 2) % 7 ELSE okey % 7 END AS pb
        |  FROM a WHERE okey % 3 <> 2 AND okey % 11 <> 0 AND okey % 13 <> 0
        |  UNION ALL
        |  SELECT okey, custkey, okey % 7 FROM a
        |  WHERE okey % 3 = 2 AND okey % 2 = 0 AND okey % 13 <> 0
        |  UNION ALL
        |  SELECT okey, custkey, okey % 7 FROM a
        |  WHERE okey % 3 = 2 AND okey % 2 = 1),
        |b AS (SELECT c_custkey AS custkey, CAST(c_nationkey AS BIGINT) AS natkey
        |      FROM customer)
        |SELECT custkey, CAST(pb AS BIGINT) AS pb, natkey,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM live JOIN b USING (custkey) GROUP BY 1, 2, 3""".stripMargin) { (s, dir) =>
      import graft.ops.{ChangeFeed, IncrementalView => IV, VersionedTable => VT}
      import graft.source.CdfStream
      val root = scratch(s, dir, "q261")
      val (dirA, viewDir) = (s"$root/a", s"$root/view")
      val orders = Tables.load(s, dir, "orders")
        .select(col("o_orderkey").cast("long").as("okey"),
          col("o_custkey").cast("long").as("custkey"))
      val v1 = orders.filter(col("okey") % 3 =!= 2)
        .withColumn("pb", col("okey") % 7)
      val v2 = v1.filter(col("okey") % 11 =!= 0)
        .withColumn("pb", when(col("okey") % 11 === 1, (col("okey") + 2) % 7)
          .otherwise(col("pb")))
        .unionByName(orders.filter(col("okey") % 3 === 2 && col("okey") % 2 === 0)
          .withColumn("pb", col("okey") % 7))
      val v3 = v2.filter(col("okey") % 13 =!= 0)
        .unionByName(orders.filter(col("okey") % 3 === 2 && col("okey") % 2 === 1)
          .withColumn("pb", col("okey") % 7))
      ChangeFeed.commit(v1, dirA, Seq("okey"))
      val bDim = Tables.load(s, dir, "customer")
        .select(col("c_custkey").cast("long").as("custkey"),
          col("c_nationkey").cast("long").as("natkey"))
      val viewCols = Seq("custkey", "pb", "natkey")
      // bootstrap: counted v1 ⋈ B as view version 1
      VT.write(IV.counted(
        VT.readVersion(s, dirA, 1).select(col("custkey"), col("pb"))
          .join(bDim, Seq("custkey")), viewCols)
        .withColumnRenamed(IV.SignCol, "n"), viewDir)
      val emptyA = VT.readVersion(s, dirA, 1)
        .select(col("custkey"), col("pb")).limit(0)
      val emptyDb = bDim.limit(0).withColumn(IV.SignCol, lit(1L))
      def fold(batch: org.apache.spark.sql.DataFrame, id: Long): Unit =
        if (!batch.isEmpty) {
          val dA = IV.signed(batch.drop(ChangeFeed.CommitVersion),
            Seq("custkey", "pb"))
          val next = IV.applyCounted(
            VT.read(s, viewDir)
              .withColumnRenamed("n", IV.SignCol),
            IV.joinDelta(emptyA, dA, bDim, emptyDb, Seq("custkey")), viewCols)
            .withColumnRenamed(IV.SignCol, "n")
          // exactly-once via the txn mark alone (round 14): nothing
          // downstream consumes the VIEW's change feed, so the per-fold
          // old-vs-new capture diff ChangeFeed.commitCommitted computes
          // was a pure tax — VersionedTable.writeCommitted keeps the
          // same no-op-on-redelivery contract without the diff join
          VT.writeCommitted(next, viewDir, "q261", id)
          ()
        }
      def run(cp: String): Unit = withNarrowShuffle(s) {
        val q = CdfStream.read(s, dirA, startingVersion = Some(1L),
            maxVersionsPerTrigger = Some(1))
          .writeStream.option("checkpointLocation", cp)
          .foreachBatch(fold _)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      // one maintenance run per landed commit — the daily cadence
      ChangeFeed.commit(v2, dirA, Seq("okey"))
      run(s"$root/cp1")
      ChangeFeed.commit(v3, dirA, Seq("okey"))
      run(s"$root/cp1") // same checkpoint: resumes at the version offset
      val vAfter = VT.currentVersion(s, viewDir).get
      require(vAfter == 3L,
        s"q261: two feed versions must commit two view versions, at $vAfter")
      // the live-join recompute reads dirA's final state (committed) —
      // materialize it concurrently with the checkpoint-loss replay run
      import scala.concurrent.{Await, Future}
      import scala.concurrent.ExecutionContext.Implicits.global
      import scala.concurrent.duration.Duration
      // inside the narrow scope so the future's plan width is
      // deterministic (run() nests the same width — benign)
      val audit = withNarrowShuffle(s) {
        val auditF = Future(IV.counted(
          VT.read(s, dirA).select(col("custkey"), col("pb")).join(bDim, Seq("custkey")),
          viewCols).withColumnRenamed(IV.SignCol, "n").localCheckpoint())
        run(s"$root/cp2") // checkpoint lost: full replay, same appId
        Await.result(auditF, Duration.Inf)
      }
      require(VT.currentVersion(s, viewDir).contains(vAfter),
        "q261: a checkpoint-loss replay must commit nothing")
      val view = VT.read(s, viewDir)
      require(Q.sameMultiset(view, audit),
        "q261: maintained view must equal the live-join recompute checksum-exactly")
      view.select(col("custkey"), col("pb").cast("bigint").as("pb"),
        col("natkey"), col("n").cast("bigint").as("n"))
    },

    // ---------------------------------------------------------------- q263
    // NATIVE SESSION WINDOWS (`session_window`, Spark 3.2+'s built-in
    // gap-based session TVF) pinned EQUAL to the library's own
    // gaps-and-islands sessionization (q42/q104's Sessionize) — the
    // declare-vs-derive duality: the built-in merges windows inside the
    // aggregate (map-side combinable, no global window function), the
    // custom one derives islands from lag() + running sum. Both must
    // produce the identical session set — count, first and last event
    // times per (user, session) — require'd bit-exactly in-query, and the
    // NATIVE result is what ships. At 100 TB the built-in form is the one
    // to reach for first: it keys the shuffle by user and merges windows
    // in-memory per group, with streaming (watermark-evicted state)
    // support for free — exactly the "compose existing ops if semantics
    // allow" preference SURVEY §7.3 encodes.
    Q("q263_native_session_window",
      """WITH e AS (SELECT user_id, epoch_us(ts) AS us FROM events),
        |m AS (SELECT user_id, us,
        |  CASE WHEN lag(us) OVER w IS NULL OR us - lag(us) OVER w > 1800000000
        |       THEN 1 ELSE 0 END AS s
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us)),
        |sess AS (SELECT user_id, us,
        |  SUM(s) OVER (PARTITION BY user_id ORDER BY us
        |               ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM m)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        |  min(us) AS start_us, max(us) AS end_us
        |FROM sess GROUP BY user_id, sid""".stripMargin) { (s, dir) =>
      val events = Tables.load(s, dir, "events")
      val native = events
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).cast("bigint").as("n_events"),
          min(unix_micros(col("ts"))).as("start_us"),
          max(unix_micros(col("ts"))).as("end_us"))
        .select(col("user_id"), col("n_events"), col("start_us"), col("end_us"))
        .localCheckpoint()
      val custom = Sessionize.batchSummary(events, "user_id", "ts", 30)
        .select(col("user_id"), col("n_events").cast("bigint").as("n_events"),
          col("start_us"), col("end_us"))
      require(Q.sameMultiset(native, custom),
        "q263: built-in session_window must equal the gaps-and-islands sessions")
      native
    },

    // ---------------------------------------------------------------- q269
    // STREAMING THE ACTION-LOG TABLE (`source/LogStreamDsv2.scala` —
    // Delta's stream-a-table design): offsets are log versions, each
    // micro-batch delivers the files ADDED by the admitted versions
    // (rows tagged `_commit_version`), resumption comes from the sink
    // checkpoint's version offset — three commit→run cycles deliver each
    // append EXACTLY once. The append-only contract is enforced LOUDLY:
    // after a compaction (remove+add), resuming the old stream fails
    // with the Delta-style "not append-only" error instead of silently
    // replaying rewritten files; the documented recovery — a fresh
    // stream based at the post-rewrite snapshot — then runs clean and
    // delivers only what lands after it. Executor decode reuses the CDF
    // reader (an added file IS an insert-only capture). At 100 TB this
    // is how ingest tables feed downstream pipelines without a message
    // bus: the table's own log is the queue.
    Q("q269_log_table_stream",
      """SELECT CAST(l_orderkey % 4 + 1 AS BIGINT) AS commit_version,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(l_orderkey) AS BIGINT) AS key_sum
        |FROM lineitem WHERE l_orderkey % 4 < 3 GROUP BY 1""".stripMargin) { (s, dir) =>
      import graft.ops.{ActionLog, ChangeFeed}
      import graft.source.LogStream
      import scala.util.Try
      val root = scratch(s, dir, "q269")
      val table = s"$root/t"
      val li = Tables.load(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"))
      def quarter(i: Int) = li.filter(col("l_orderkey") % 4 === i)
      ActionLog.append(quarter(0).coalesce(1), table)
      val (out, cp) = (s"$root/out", s"$root/cp")
      def run(cpDir: String, outDir: String,
          startingVersion: Option[Long]): Unit = withNarrowShuffle(s) {
        val q = LogStream.read(s, table, startingVersion = startingVersion)
          .writeStream.format("parquet")
          .option("path", outDir).option("checkpointLocation", cpDir)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      run(cp, out, Some(0L))
      ActionLog.append(quarter(1).coalesce(1), table)
      run(cp, out, Some(0L)) // resumes at the checkpointed version offset
      ActionLog.append(quarter(2).coalesce(1), table)
      // the expected union is input-only AND shuffle-free (filtered
      // scans + union), so its plan is conf-width-independent —
      // materialize it concurrently with the third stream run
      import scala.concurrent.{Await, Future}
      import scala.concurrent.ExecutionContext.Implicits.global
      import scala.concurrent.duration.Duration
      val wantF = Future((0 until 3).map(i => quarter(i)
        .withColumn(ChangeFeed.CommitVersion, lit(i + 1L)))
        .reduce(_.unionByName(_)).localCheckpoint())
      run(cp, out, Some(0L))
      val got = s.read.parquet(out).localCheckpoint()
      // exactly-once with correct version tags
      require(Q.sameMultiset(got, Await.result(wantF, Duration.Inf)),
        "q269: three runs must deliver each append exactly once, tagged")
      // a rewrite breaks the append-only contract — resuming must be LOUD
      ActionLog.rewrite(ActionLog.read(s, table), table, numFiles = 2)
      val fail = Try(run(cp, out, Some(0L)))
      val msg = fail.failed.map(e => e.toString +
        Option(e.getCause).map(_.toString).getOrElse("")).getOrElse("")
      require(fail.isFailure && msg.contains("append-only"),
        s"q269: resuming over a rewrite must fail loudly, got $msg")
      // recovery: a fresh stream BASED at the post-rewrite snapshot (v4) —
      // the batch read covers ≤4, the stream owns >4
      ActionLog.append(quarter(3).coalesce(1), table) // v5
      run(s"$root/cp2", s"$root/out2", Some(4L))
      val fresh = s.read.parquet(s"$root/out2")
      val want2 = quarter(3).withColumn(ChangeFeed.CommitVersion, lit(5L))
      require(Q.sameMultiset(fresh, want2),
        "q269: the recovered stream must deliver only post-rewrite appends")
      got.groupBy(col(ChangeFeed.CommitVersion).as("commit_version"))
        .agg(count(lit(1)).cast("bigint").as("n"),
          sum(col("l_orderkey")).cast("bigint").as("key_sum"))
    },

    // ---------------------------------------------------------------- q289
    // EXACTLY-ONCE STREAMING INGESTION INTO THE ACTION LOG — Delta's
    // `txn` (SetTransaction) action completing the log protocol: each
    // micro-batch's add actions and its per-app batch high-water mark
    // land in ONE action file, atomic with the slot claim, so a
    // re-delivered batch appends NOTHING. Pinned through the two
    // failure modes that matter: (1) full sink-checkpoint loss — the
    // replayed stream re-delivers everything and commits zero versions;
    // (2) VACUUM — the horizon checkpoint PERSISTS the txn marks
    // (Delta's checkpoint rule: losing SetTransaction on log cleanup
    // would silently re-open the door to double-applies), so a replay
    // AFTER the log records are gone still no-ops. Content is
    // require'd bit-equal to the batch union throughout. At 100 TB this
    // is the ingest contract: at-least-once delivery upstream,
    // exactly-once tables downstream, no message bus in between.
    Q("q289_log_txn_exactly_once",
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(event_id) AS BIGINT) AS id_sum
        |FROM events GROUP BY 1""".stripMargin) { (s, dir) =>
      import graft.ops.ActionLog
      val root = scratch(s, dir, "q289")
      val (in, table) = (s"$root/in", s"$root/t")
      val e = Tables.load(s, dir, "events")
        .select(col("event_id"), col("ts"), col("event_type"))
      val cut = lit("2024-01-16").cast("timestamp")
      def run(cp: String): Unit = withNarrowShuffle(s) {
        val q = EventStream.fileSource(s, s"$in/*", e.schema)
          .writeStream.option("checkpointLocation", cp)
          .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
            ActionLog.appendCommitted(
              b.select(col("event_id"), col("event_type")), table, "q289", id)
            ()
          }
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      e.filter(col("ts") < cut).coalesce(1).write.parquet(s"$in/f1")
      run(s"$root/cp1")
      e.filter(col("ts") >= cut).coalesce(1).write.parquet(s"$in/f2")
      run(s"$root/cp1")
      val want = e.select(col("event_id"), col("event_type"))
      def contentOk(tag: String): Unit = {
        val got = ActionLog.read(s, table)
        require(Q.sameMultiset(got, want),
          s"q289: $tag content must equal the batch union")
      }
      val vAfter = ActionLog.versions(s, table).last
      require(vAfter == 2L, s"q289: two batches, two versions, got $vAfter")
      contentOk("post-ingest")
      // (1) checkpoint loss: full replay commits nothing
      run(s"$root/cp2")
      require(ActionLog.versions(s, table).last == vAfter,
        "q289: a checkpoint-loss replay must append nothing")
      // (2) vacuum: the horizon checkpoint carries the txn marks
      ActionLog.append(want.limit(0).coalesce(1), table) // v3: empty head
      ActionLog.vacuum(s, table, keepVersions = 1)
      require(ActionLog.lastBatchId(s, table, "q289").contains(1L),
        "q289: txn high-water marks must survive the vacuum")
      run(s"$root/cp3")
      require(ActionLog.versions(s, table).last == 3L,
        "q289: a post-vacuum replay must still append nothing")
      contentOk("post-vacuum")
      ActionLog.read(s, table).groupBy(col("event_type"))
        .agg(count(lit(1)).cast("bigint").as("n"),
          sum(col("event_id")).cast("bigint").as("id_sum"))
    },

    // ---------------------------------------------------------------- q299
    // STREAMING WRITE-AUDIT-PUBLISH ON BRANCHES — CI for data: an
    // ingest stream lands on a BRANCH (micro-batches become branch
    // commits — main never sees a partial experiment), an AUDIT gate
    // (bounds + key-uniqueness, one aggregate) runs on the finished
    // branch, and only a PASSING branch merges — a fast-forward, since
    // main never moved. The failing path is the one that matters: a
    // poisoned ingest fails its audit, the branch is DISCARDED (one
    // pointer delete — its commits are garbage for the sweep), and main
    // is pinned bit-identical and head-identical to before the
    // experiment existed. Plain WAP stages one snapshot; branch-WAP
    // gives a failed pipeline a full multi-commit history to debug AND
    // a one-pointer rollback. The bad rows are proven to have never
    // been reachable from main at any point.
    Q("q299_streaming_branch_wap",
      """WITH base AS (SELECT event_id, event_type, event_id % 100 AS val
        |  FROM events WHERE event_id % 3 = 0),
        |good AS (SELECT event_id, event_type, event_id % 100 AS val
        |  FROM events WHERE event_id % 3 = 1),
        |m AS (SELECT * FROM base UNION ALL SELECT * FROM good)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(val) AS BIGINT) AS val_sum
        |FROM m GROUP BY 1""".stripMargin) { (s, dir) =>
      import graft.ops.Branching
      import scala.util.Try
      val root = scratch(s, dir, "q299")
      val table = s"$root/t"
      val ev = Tables.load(s, dir, "events")
        .select(col("event_id"), col("ts"), col("event_type"))
      def shaped(df: org.apache.spark.sql.DataFrame, poison: Boolean) = {
        val v = if (poison)
          when(col("event_id") % 11 === 0, -5L).otherwise(col("event_id") % 100)
        else col("event_id") % 100
        df.select(col("event_id"), col("event_type"), v.as("val"))
      }
      Branching.init(shaped(ev.filter(col("event_id") % 3 === 0),
        poison = false), table)
      def ingest(branch: String, part: Int, poison: Boolean): Unit = {
        Branching.branch(s, table, "main", branch)
        val in = s"$root/in_$branch"
        ev.filter(col("event_id") % 3 === part).coalesce(1)
          .write.parquet(s"$in/f1")
        withNarrowShuffle(s) {
          val q = EventStream.fileSource(s, s"$in/*", ev.schema)
            .writeStream.option("checkpointLocation", s"$root/cp_$branch")
            .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
              Branching.commitOn(Branching.readBranch(s, table, branch)
                .unionByName(shaped(b, poison)), table, branch)
              ()
            }
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start()
          q.awaitTermination()
        }
      }
      def audit(branch: String): Boolean = {
        val r = Branching.readBranch(s, table, branch)
          .agg(min(col("val")).as("mn"), count(lit(1)).as("n"),
            countDistinct(col("event_id")).as("d")).head
        r.getLong(0) >= 0L && r.getLong(1) == r.getLong(2)
      }
      // the passing experiment publishes via fast-forward
      ingest("exp_a", part = 1, poison = false)
      require(audit("exp_a"), "q299: the clean ingest must pass its audit")
      require(Branching.merge(s, table, "exp_a", "main", Seq("event_id"))
        .isInstanceOf[Branching.FastForward],
        "q299: an unmoved main must fast-forward the audited branch")
      val publishedHead = Branching.head(s, table, "main")
      val published = Branching.readBranch(s, table, "main").localCheckpoint()
      // the poisoned experiment never reaches main
      ingest("exp_b", part = 2, poison = true)
      require(!audit("exp_b"), "q299: the poisoned ingest must fail its audit")
      Branching.drop(s, table, "exp_b")
      require(Branching.head(s, table, "main") == publishedHead,
        "q299: a discarded experiment must leave main's head untouched")
      val after = Branching.readBranch(s, table, "main")
      require(Q.sameMultiset(after, published),
        "q299: main must be bit-identical after the discard")
      require(after.filter(col("val") < 0).isEmpty,
        "q299: no poisoned row may ever be reachable from main")
      require(Try(Branching.readBranch(s, table, "exp_b")).isFailure,
        "q299: the discarded branch must be gone")
      after.groupBy(col("event_type"))
        .agg(count(lit(1)).cast("bigint").as("n"),
          sum(col("val")).cast("bigint").as("val_sum"))
    },

    // ---------------------------------------------------------------- q301
    // STREAMING A CATALOG TABLE BY NAME — `spark.readStream.table` over
    // the q280 catalog: the SAME identifier serves batch SQL and a
    // STREAM (the log table's MICRO_BATCH_READ capability hands Spark
    // the q269 version-offset stream; reader options pass through), so a
    // pipeline subscribes to a table with a NAME, not a path — the
    // difference between "wire this directory" and a governed surface.
    // Pinned: two commit→run cycles deliver each append exactly once
    // (sink-checkpoint offsets over log versions), batch SQL over the
    // same name agrees with the accumulated stream, and the append-only
    // guard still fails a resumed stream loudly after a rewrite —
    // the protocol survives the naming layer intact.
    Q("q301_sql_stream_table",
      """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(l_orderkey) AS BIGINT) AS key_sum
        |FROM lineitem WHERE l_orderkey % 4 < 2 GROUP BY 1""".stripMargin) { (s, dir) =>
      import graft.ops.ActionLog
      import scala.util.Try
      val root = scratch(s, dir, "q301")
      val tdir = s"$root/ns/t"
      val li = Tables.load(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"))
      def quarter(i: Int) = li.filter(col("l_orderkey") % 4 === i)
      ActionLog.append(quarter(0).coalesce(1), tdir)
      val cat = "graftt_" + java.security.MessageDigest.getInstance("MD5")
        .digest(dir.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(6)
      s.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.source.GraftCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cat.root", root)
      val (out, cp) = (s"$root/out", s"$root/cp")
      def run(): Unit = withNarrowShuffle(s) {
        val q = s.readStream.option("startingVersion", "0")
          .table(s"$cat.ns.t")
          .writeStream.format("parquet")
          .option("path", out).option("checkpointLocation", cp)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      run()
      ActionLog.append(quarter(1).coalesce(1), tdir)
      run()
      val streamed = s.read.parquet(out).localCheckpoint()
      val want = li.filter(col("l_orderkey") % 4 < 2)
      require(Q.sameMultiset(streamed, want),
        "q301: the named stream must deliver each append exactly once")
      // batch SQL over the SAME name agrees with the accumulated stream
      val batch = s.sql(s"SELECT * FROM $cat.ns.t")
      require(Q.sameMultiset(batch, streamed),
        "q301: batch and stream views of one name must agree")
      // the append-only guard survives the naming layer
      ActionLog.rewrite(ActionLog.read(s, tdir), tdir, 1)
      require(Try(run()).isFailure,
        "q301: a rewrite must still fail the resumed stream loudly")
      streamed.groupBy(col("l_returnflag"))
        .agg(count(lit(1)).cast("bigint").as("n"),
          sum(col("l_orderkey")).cast("bigint").as("key_sum"))
    },

    // ---------------------------------------------------------------- q311
    // BYTE-BASED STREAMING ADMISSION (`maxBytesPerTrigger` on the log
    // stream — Delta's other public rate knob): offsets become FILE
    // positions (version, index), so a FAT COMMIT splits across triggers
    // at a byte budget instead of arriving as one oversized batch — and
    // the split survives a mid-commit CRASH exactly-once. Pinned
    // deterministically: the budget is the smallest data file's size, so
    // every trigger admits exactly one file (the ≥1-file progress
    // guarantee) — five files, five batches; the sink THROWS at batch 2,
    // leaving the checkpoint mid-way through the 3-file commit; the
    // restarted stream resumes at the exact file boundary and delivers
    // the remaining files once each, with the fat commit's batches
    // spanning the crash. Idempotent per-batch dirs make the replayed
    // batch id harmless, the standard foreachBatch recipe. At 100 TB a
    // 10 TB backfill commit would otherwise have to fit in one trigger's
    // memory; byte admission turns it into bounded batches.
    Q("q311_bytes_per_trigger",
      """WITH o AS (SELECT CAST(o_orderkey AS BIGINT) AS okey,
        |    o_orderpriority AS opri FROM orders)
        |SELECT CAST(CASE WHEN okey % 5 = 0 THEN 1
        |    WHEN okey % 5 = 4 THEN 3 ELSE 2 END AS BIGINT) AS commit_version,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(okey) AS BIGINT) AS key_sum
        |FROM o GROUP BY 1""".stripMargin) { (s, dir) =>
      import graft.ops.{ActionLog, ChangeFeed}
      import graft.source.LogStream
      import scala.util.Try
      val root = scratch(s, dir, "q311")
      val table = s"$root/t"
      val o = Tables.load(s, dir, "orders")
        .select(col("o_orderkey").cast("long").as("okey"),
          col("o_orderpriority").as("opri"))
      ActionLog.append(o.filter(col("okey") % 5 === 0).coalesce(1), table)
      ActionLog.append( // the FAT commit: three files in ONE version
        o.filter(col("okey") % 5 >= 1 && col("okey") % 5 <= 3)
          .repartition(3), table)
      ActionLog.append(o.filter(col("okey") % 5 === 4).coalesce(1), table)
      require(ActionLog.actionsOf(s, table, 2L)._1.size == 3,
        "q311: the fat commit must carry three files")
      val fsys = new org.apache.hadoop.fs.Path(table)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      val budget = fsys.listStatus(
        new org.apache.hadoop.fs.Path(s"$table/data")).toSeq
        .filter(_.isFile).map(_.getLen).min
      val (out, cp) = (s"$root/out", s"$root/cp")
      def run(failAt: Option[Long]): Try[Unit] = withNarrowShuffle(s) {
        Try {
          val q = LogStream.read(s, table, startingVersion = Some(0L),
            maxBytesPerTrigger = Some(budget))
            .writeStream
            .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
              if (failAt.contains(id))
                sys.error(s"q311: injected crash at batch $id")
              // idempotent per-batch landing: a replayed id overwrites
              b.write.mode("overwrite").parquet(s"$out/b=$id")
              ()
            }
            .option("checkpointLocation", cp)
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start()
          q.awaitTermination()
        }
      }
      val crashed = run(failAt = Some(2L))
      def causeChain(t: Throwable): Seq[String] =
        Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
          .map(_.toString).take(10).toSeq
      require(crashed.isFailure &&
        causeChain(crashed.failed.get).exists(_.contains("injected")),
        s"q311: the injected crash must surface, got " +
          crashed.failed.map(causeChain).getOrElse(Seq.empty).mkString(" | "))
      val landed1 = fsys.listStatus(new org.apache.hadoop.fs.Path(out))
        .map(_.getPath.getName).filter(_.startsWith("b=")).sorted.toSeq
      require(landed1 == Seq("b=0", "b=1"),
        s"q311: the crash must land exactly batches 0 and 1, got $landed1")
      require(run(failAt = None).isSuccess,
        "q311: the restarted stream must drain clean")
      val landed2 = fsys.listStatus(new org.apache.hadoop.fs.Path(out))
        .map(_.getPath.getName).filter(_.startsWith("b=")).sorted.toSeq
      require(landed2 == Seq("b=0", "b=1", "b=2", "b=3", "b=4"),
        s"q311: one file per byte-budgeted trigger — five batches, got $landed2")
      val got = s.read.option("basePath", out).parquet(out).localCheckpoint()
      // every batch delivered exactly one file of one version, and the
      // fat commit's batches SPAN the crash (batch 1 before, 2-3 after)
      val perBatch = got.groupBy(col("b"))
        .agg(countDistinct(col(ChangeFeed.CommitVersion)).as("nv"))
        .collect().map(r => r.get(0).toString -> r.getLong(1)).toMap
      require(perBatch.values.forall(_ == 1L),
        s"q311: each byte-capped batch must hold one version, got $perBatch")
      val v2Batches = got.filter(col(ChangeFeed.CommitVersion) === 2L)
        .select("b").distinct().collect().map(_.get(0).toString).toSet
      require(v2Batches == Set("1", "2", "3"),
        s"q311: the fat commit must split across the crash, got $v2Batches")
      // exactly-once: the union is the table, tagged
      val want = ActionLog.read(s, table)
        .withColumn(ChangeFeed.CommitVersion,
          when(col("okey") % 5 === 0, 1L)
            .when(col("okey") % 5 === 4, 3L).otherwise(2L))
      val gotRows = got.drop("b")
      require(Q.sameMultiset(gotRows, want),
        "q311: crash + restart must deliver every file exactly once")
      gotRows.groupBy(col(ChangeFeed.CommitVersion).as("commit_version"))
        .agg(count(lit(1)).cast("bigint").as("n"),
          sum(col("okey")).cast("bigint").as("key_sum"))
    })
}
