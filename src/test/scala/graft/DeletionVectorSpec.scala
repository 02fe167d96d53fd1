package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.{ChangeFeed, DeletionVectors, VersionedTable}

class DeletionVectorSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fs(dir: String) = new org.apache.hadoop.fs.Path(dir)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def dataFiles(dir: String, v: Long) =
    fs(dir).listStatus(VersionedTable.verDir(dir, v))
      .filter(st => st.isFile && !st.getPath.getName.startsWith("_") &&
        !st.getPath.getName.startsWith("."))
      .map(st => st.getPath.getName -> st.getLen).toMap

  test("DV delete mutates zero data bytes; reads apply the vectors; re-deletes union") {
    val dir = TestSpark.tmpDir("dv1") + "/t"
    val df = spark.range(0, 1000).select(col("id").as("k"), (col("id") % 7).as("v"))
      .repartition(4)
    VersionedTable.write(df, dir)
    val before = dataFiles(dir, 1L)
    val (v2, n) = DeletionVectors.delete(spark, dir, col("k") % 10 === 0)
    assert(v2 == 2L && n == 100L)
    // identical file inventory, byte for byte (names + sizes + checksums)
    val after = dataFiles(dir, 2L)
    assert(after == before, "data files must be carried as raw copies")
    before.keys.foreach { f =>
      val a = fs(dir).getFileChecksum(
        new org.apache.hadoop.fs.Path(VersionedTable.verDir(dir, 1L), f))
      val b = fs(dir).getFileChecksum(
        new org.apache.hadoop.fs.Path(VersionedTable.verDir(dir, 2L), f))
      assert(a == b, s"file $f must be byte-identical")
    }
    assert(DeletionVectors.read(spark, dir).count() == 900L)
    assert(DeletionVectors.read(spark, dir).filter(col("k") % 10 === 0).isEmpty)
    // raw read still sees the superset (single-protocol rule)
    assert(VersionedTable.read(spark, dir).count() == 1000L)
    // second delete unions; re-deleting dead rows is a no-op
    val (v3, n2) = DeletionVectors.delete(spark, dir, col("k") < 55)
    assert(v3 == 3L && n2 == 49L, s"50 minus the already-dead k=0,10,..,50: got $n2")
    assert(DeletionVectors.read(spark, dir).count() == 851L)
    // no-match delete: no new version
    val (v4, n3) = DeletionVectors.delete(spark, dir, col("k") < 0)
    assert(v4 == 3L && n3 == 0L)
  }

  test("DV composes with CDF, and compaction folds the vectors with an empty capture") {
    val dir = TestSpark.tmpDir("dv2") + "/t"
    val df = spark.range(0, 500).select(col("id").as("k"), (col("id") * 3).as("v"))
      .repartition(4)
    VersionedTable.write(df, dir)
    val (v2, n) = DeletionVectors.delete(spark, dir, col("k").between(100, 199),
      capture = true)
    assert(v2 == 2L && n == 100L)
    val feed = ChangeFeed.tableChanges(spark, dir, 1L, 2L, Seq("k"))
    assert(feed.count() == 100L &&
      feed.filter(col(ChangeFeed.ChangeType) =!= "delete").isEmpty,
      "the DV delete must capture exactly its deletes")
    val replayed = ChangeFeed.apply(Some(VersionedTable.readVersion(spark, dir, 1L)),
      feed, Seq("k"))
    val dvRead = DeletionVectors.read(spark, dir)
    assert(replayed.exceptAll(dvRead).isEmpty && dvRead.exceptAll(replayed).isEmpty,
      "replaying the feed must land on the DV-applied snapshot")
    // compaction: clean files, no sidecar, EMPTY capture, same content
    val v3 = DeletionVectors.compact(spark, dir, numFiles = 2, capture = true)
    assert(v3 == 3L)
    assert(!fs(dir).exists(new org.apache.hadoop.fs.Path(
      VersionedTable.verDir(dir, 3L), "_dv")), "compaction must drop the vectors")
    assert(ChangeFeed.tableChanges(spark, dir, 2L, 3L, Seq("k")).isEmpty,
      "compaction is dataChange=false: empty capture")
    val after = DeletionVectors.read(spark, dir)
    assert(after.exceptAll(dvRead).isEmpty && dvRead.exceptAll(after).isEmpty)
    assert(dataFiles(dir, 3L).size == 2)
    // post-compaction, raw and DV reads agree (no vectors left)
    assert(VersionedTable.read(spark, dir).count() == 400L)
  }

  test("the bitmap sidecar is smaller than the equivalent position-delete parquet") {
    val dir = TestSpark.tmpDir("dv3") + "/t"
    VersionedTable.write(spark.range(0, 100000)
      .select(col("id").as("k"), (col("id") % 13).as("v")).repartition(4), dir)
    DeletionVectors.delete(spark, dir, col("k") % 5 === 0) // 20k deletes, run-friendly
    val dvBytes = fs(dir).getContentSummary(new org.apache.hadoop.fs.Path(
      VersionedTable.verDir(dir, 2L), "_dv")).getLength
    // the same deletes as a position-delete parquet (file, row_index)
    val posDir = TestSpark.tmpDir("dv3-pos")
    VersionedTable.readVersion(spark, dir, 1L)
      .withColumn("file", col("_metadata.file_name"))
      .withColumn("pos", col("_metadata.row_index"))
      .filter(col("k") % 5 === 0).select("file", "pos")
      .coalesce(1).write.mode("overwrite").parquet(posDir)
    val posBytes = fs(posDir).getContentSummary(
      new org.apache.hadoop.fs.Path(posDir)).getLength
    assert(dvBytes < posBytes,
      s"bitmap sidecar ($dvBytes B) must undercut position-delete parquet ($posBytes B)")
  }
}
