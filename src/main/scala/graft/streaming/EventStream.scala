package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType
import graft.ops.{Dedup, Upsert, VersionedTable}

/** Structured-Streaming variant of the incremental pipeline (SURVEY §2.9).
  *
  * The reference is a scheduled incremental batch system; its streaming
  * concerns map to: file source over the bronze directory +
  * `Trigger.AvailableNow` (catch-up-then-stop, the cron analogue), watermarked
  * tumbling windows (the trading-date micro-batch), and an idempotent
  * `foreachBatch` keyed upsert (the MERGE re-runnability + checkpoint story).
  *
  * Scale: the file source lists incrementally (maxFilesPerTrigger bounds a
  * micro-batch); state for the windowed aggregate is bounded by the watermark;
  * the upsert in foreachBatch reuses the same partition-pruned merge the batch
  * pipeline uses, so state lives in the table, not the state store.
  */
object EventStream {

  /** Bronze-directory file source. Schema must be declared (streaming reads
    * never infer).
    */
  def fileSource(spark: SparkSession, dir: String, schema: StructType,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val r = spark.readStream.schema(schema)
    maxFilesPerTrigger.fold(r)(n => r.option("maxFilesPerTrigger", n)).parquet(dir)
  }

  /** Watermarked tumbling-window aggregation — the streaming form of
    * q18_tumbling_window (same plan per micro-batch).
    */
  def dailyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 day")
      .groupBy(window(col("ts"), "1 day"), upper(trim(col("event_type"))).as("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))
      .select(to_date(col("window.start")).as("window_day"),
        col("event_type"), col("n_events"), col("total_value"))

  /** Watermarked hourly tumbling counts with integer-exact payload sums —
    * the [[dailyCounts]] shape at the granularity q147's late-data
    * accounting needs. Append mode: a window row is emitted once, when the
    * watermark passes its end; rows arriving after that are DROPPED — the
    * bounded-state trade every streaming aggregation makes, and exactly
    * what q147 measures.
    */
  def hourlyCounts(events: DataFrame, delay: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", delay)
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n_events"), sum(col("event_id")).cast("long").as("id_sum"))
      .select(unix_micros(col("window.start")).as("win_start_us"),
        col("n_events"), col("id_sum"))

  /** Run a streaming frame to a named in-memory sink with AvailableNow,
    * synchronously (process everything present, then stop). Returns the
    * sink contents.
    */
  def runAvailableNow(df: DataFrame, name: String, outputMode: String = "append"): DataFrame = {
    val q = df.writeStream
      .format("memory")
      .queryName(name)
      .outputMode(outputMode)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    df.sparkSession.table(name)
  }

  /** Streaming exact dedup with BOUNDED state: at-least-once delivery →
    * at-most-one row per key, where a key's dedup state is dropped once the
    * watermark passes its event time. A plain streaming `dropDuplicates`
    * keeps every key forever — unbounded state on an unbounded stream; the
    * watermark variant is the only form that survives at corpus scale, and
    * re-deliveries beyond the lateness bound are the table-side MERGE's job
    * ([[upsertSink]]), not the state store's.
    */
  def dedupWithinWatermark(events: DataFrame, keys: Seq[String],
      tsCol: String = "ts", delay: String = "1 hour"): DataFrame =
    events.withWatermark(tsCol, delay).dropDuplicatesWithinWatermark(keys)

  /** Stream-stream interval join with watermark-bounded state — the
    * streaming twin of [[graft.ops.RangeJoin.timeWindow]]: left rows match
    * right rows of the same keys whose event time falls in
    * `[leftTs + lowerUs, leftTs + upperUs]`. Both sides carry watermarks and
    * the join condition bounds event-time distance, which is exactly what
    * lets Spark evict state: a buffered row is dropped once the other side's
    * watermark passes its last possible match. Without the time bound the
    * state store grows without limit — the unbounded-stream analogue of an
    * uncapped LSH bucket.
    *
    * `rightTs` must differ from `leftTs` by name (rename upstream) so the
    * output is unambiguous.
    */
  def intervalJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, lowerUs: Long, upperUs: Long,
      delay: String = "1 hour", joinType: String = "inner"): DataFrame = {
    require(leftTs != rightTs, "rename one time column: output keeps both")
    val l = left.withWatermark(leftTs, delay).alias("l")
    val r = right.withWatermark(rightTs, delay).alias("r")
    val keyCond = keys.map(k => col(s"l.$k") === col(s"r.$k")).reduce(_ && _)
    val range =
      col(s"r.$rightTs") >= col(s"l.$leftTs") + expr(s"INTERVAL $lowerUs MICROSECOND") &&
        col(s"r.$rightTs") <= col(s"l.$leftTs") + expr(s"INTERVAL $upperUs MICROSECOND")
    // leftOuter: a never-matched left row emits ONE null-extended row once
    // the watermark passes its last possible match (l.ts + upper) — the
    // outer-join state-closure semantics q174 puts on the scoreboard
    l.join(r, keyCond && range, joinType).select(col("l.*"), col(s"r.$rightTs"))
  }

  /** Idempotent keyed upsert sink: every micro-batch is deduped to one row
    * per key and MERGEd into the parquet snapshot — re-delivery of a batch
    * converges to the same table (exactly-once effect on top of at-least-once
    * delivery, the reference's FORCE=TRUE + W1 + keyed-MERGE combination).
    */
  def upsertSink(events: DataFrame, targetPath: String, checkpoint: String,
      keys: Seq[String], orderCol: String): StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val deduped = Dedup.latestBy(batch, keys.map(col), Seq(col(orderCol)))
        val p = new org.apache.hadoop.fs.Path(targetPath)
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val merged =
          if (fs.exists(p))
            Upsert.merge(spark.read.schema(batch.schema).parquet(targetPath), deduped, keys)
          else deduped
        Upsert.snapshotWrite(merged, targetPath)
      }
      .start()

  /** EXACTLY-ONCE keyed upsert sink: like [[upsertSink]], but the merge
    * writes through [[VersionedTable.writeCommitted]] with the micro-batch
    * id as the transaction (Delta's `txn` pattern). [[upsertSink]] is
    * idempotent at the DATA level (re-delivered rows collapse in the keyed
    * merge); this sink is idempotent at the COMMIT level too — a micro-batch
    * re-delivered after a crash, or an entire stream replayed against a lost
    * checkpoint, produces no new table version, so the version history holds
    * each batch at most once (q133 + StreamingSpec prove both).
    */
  def committedUpsertSink(events: DataFrame, tableDir: String, checkpoint: String,
      keys: Seq[String], orderCol: String, appId: String): StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        if (!VersionedTable.lastBatchId(spark, tableDir, appId).exists(_ >= batchId)) {
          val deduped = Dedup.latestBy(batch, keys.map(col), Seq(col(orderCol)))
          val target = VersionedTable.readOrEmpty(spark, tableDir, batch.schema)
          VersionedTable.writeCommitted(
            Upsert.merge(target, deduped, keys), tableDir, appId, batchId)
          ()
        }
      }
      .start()
}
