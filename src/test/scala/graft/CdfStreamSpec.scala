package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.{ChangeFeed, VersionedTable}
import graft.source.CdfStream

/** The native DSv2 change-feed stream: version-number offsets, per-trigger
  * admission, checkpointed resume, and the loud-gap contract.
  */
class CdfStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def mkTable(root: String): Unit = {
    VersionedTable.write(Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("k", "v"), root)
    ChangeFeed.commit(Seq((1L, 11L), (2L, 20L), (3L, 30L), (4L, 40L)).toDF("k", "v"),
      root, Seq("k")) // v2: update k=1, insert k=4
    ChangeFeed.commit(Seq((1L, 11L), (3L, 30L), (4L, 40L)).toDF("k", "v"),
      root, Seq("k")) // v3: delete k=2
  }

  test("version offsets: one version per trigger, startingVersion skips history") {
    val root = TestSpark.tmpDir("cdfstream1") + "/t"
    mkTable(root)
    val seen = collection.mutable.ArrayBuffer.empty[(Long, Long)] // (batch, version)
    val q = CdfStream.read(spark, root, startingVersion = Some(1L),
      maxVersionsPerTrigger = Some(1))
      .writeStream
      .option("checkpointLocation", TestSpark.tmpDir("cdfstream1-ckpt"))
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        batch.select(col(ChangeFeed.CommitVersion)).distinct().collect()
          .foreach(r => seen.synchronized { seen += id -> r.getLong(0) })
      }.start()
    try q.processAllAvailable() finally q.stop()
    // admission control: each micro-batch carries exactly one version
    assert(seen.groupBy(_._1).values.forall(_.map(_._2).distinct.size == 1),
      s"one version per trigger expected, got $seen")
    assert(seen.map(_._2).sorted == Seq(2L, 3L), s"versions 2 and 3 expected: $seen")

    // startingVersion: offset 2 = "changes of versions <= 2 consumed"
    val seen2 = collection.mutable.ArrayBuffer.empty[Long]
    val q2 = CdfStream.read(spark, root, startingVersion = Some(2L))
      .writeStream
      .option("checkpointLocation", TestSpark.tmpDir("cdfstream1-ckpt2"))
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.select(col(ChangeFeed.CommitVersion)).distinct().collect()
          .foreach(r => seen2.synchronized { seen2 += r.getLong(0) })
      }.start()
    try q2.processAllAvailable() finally q2.stop()
    assert(seen2.sorted == Seq(3L), s"only v3 after startingVersion=2: $seen2")
  }

  test("restart resumes from the checkpointed version offset — no replay") {
    val root = TestSpark.tmpDir("cdfstream2") + "/t"
    val ckpt = TestSpark.tmpDir("cdfstream2-ckpt")
    mkTable(root)
    val first = collection.mutable.ArrayBuffer.empty[Long]
    val q1 = CdfStream.read(spark, root, startingVersion = Some(1L))
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.select(col(ChangeFeed.CommitVersion)).distinct().collect()
          .foreach(r => first.synchronized { first += r.getLong(0) })
      }.start()
    try q1.processAllAvailable() finally q1.stop()
    assert(first.sorted == Seq(2L, 3L))
    // a commit lands while the stream is DOWN; restart picks up only it
    ChangeFeed.commit(
      VersionedTable.read(spark, root).withColumn("v", col("v") + 1),
      root, Seq("k")) // v4
    val second = collection.mutable.ArrayBuffer.empty[Long]
    val q2 = CdfStream.read(spark, root)
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.select(col(ChangeFeed.CommitVersion)).distinct().collect()
          .foreach(r => second.synchronized { second += r.getLong(0) })
      }.start()
    try q2.processAllAvailable() finally q2.stop()
    assert(second.sorted == Seq(4L),
      s"restart must resume at the checkpointed offset, got $second")
  }

  test("row fidelity: streamed changes equal the batch feed bit-exactly") {
    val root = TestSpark.tmpDir("cdfstream3") + "/t"
    mkTable(root)
    var got: org.apache.spark.sql.DataFrame = null
    val q = CdfStream.read(spark, root, startingVersion = Some(1L))
      .writeStream.option("checkpointLocation", TestSpark.tmpDir("cdfstream3-ckpt"))
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val b = batch.localCheckpoint()
        got = if (got == null) b else got.unionByName(b)
      }.start()
    try q.processAllAvailable() finally q.stop()
    val expected = ChangeFeed.tableChanges(spark, root, 1L, 3L, Seq("k"))
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty,
      "streamed feed must equal tableChanges")
  }

  test("a version without capture fails the stream loudly") {
    val root = TestSpark.tmpDir("cdfstream4") + "/t"
    mkTable(root)
    VersionedTable.write( // v4 bypasses ChangeFeed.commit — no _cdf
      VersionedTable.read(spark, root).withColumn("v", col("v") + 1), root)
    val q = CdfStream.read(spark, root, startingVersion = Some(1L))
      .writeStream.option("checkpointLocation", TestSpark.tmpDir("cdfstream4-ckpt"))
      .foreachBatch { (_: org.apache.spark.sql.DataFrame, _: Long) => () }.start()
    val failed =
      try { q.processAllAvailable(); false }
      catch { case _: Throwable => true }
      finally q.stop()
    assert(failed, "a capture-less version must fail the stream, not skip")
  }

  test("startingTimestamp resolves to the latest commit at or before the instant") {
    val root = TestSpark.tmpDir("cdfstream5") + "/t"
    mkTable(root)
    val t2 = VersionedTable.commitTimestamp(spark, root, 2L).get
    val seen = collection.mutable.ArrayBuffer.empty[Long]
    val q = CdfStream.read(spark, root, startingTimestamp = Some(t2))
      .writeStream.option("checkpointLocation", TestSpark.tmpDir("cdfstream5-ckpt"))
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.select(col(ChangeFeed.CommitVersion)).distinct().collect()
          .foreach(r => seen.synchronized { seen += r.getLong(0) })
      }.start()
    try q.processAllAvailable() finally q.stop()
    assert(seen.sorted == Seq(3L),
      s"as-of t(v2) the stream must start after v2: $seen")
    // before-the-beginning instant: loud failure at stream start
    val early = try {
      val q2 = CdfStream.read(spark, root,
        startingTimestamp = Some(VersionedTable.commitTimestamp(spark, root, 1L).get - 1))
        .writeStream.option("checkpointLocation", TestSpark.tmpDir("cdfstream5-ckpt2"))
        .foreachBatch { (_: org.apache.spark.sql.DataFrame, _: Long) => () }.start()
      try { q2.processAllAvailable(); false } finally q2.stop()
    } catch { case _: Throwable => true }
    assert(early, "a before-the-beginning startingTimestamp must fail loudly")
  }
}
