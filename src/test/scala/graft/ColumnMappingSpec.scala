package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.{ChangeFeed, ColumnMapping, VersionedTable}

class ColumnMappingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fs(dir: String) = new org.apache.hadoop.fs.Path(dir)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def entries(dir: String, v: Long): Set[String] =
    fs(dir).listStatus(VersionedTable.verDir(dir, v))
      .map(_.getPath.getName).toSet

  test("rename and drop are metadata-only; time travel renders each version's own names") {
    val dir = TestSpark.tmpDir("cm1") + "/t"
    val df = Seq((1L, 10, "a"), (2L, 20, "b")).toDF("k", "n", "tag")
    assert(ColumnMapping.writeData(df, dir) == 1L)
    // physical layout: c_<id> columns in the files, logical names only in
    // the manifest
    val phys = spark.read.parquet(VersionedTable.verDir(dir, 1L).toString)
    assert(phys.columns.toSeq == Seq("c_1", "c_2", "c_3"))
    assert(ColumnMapping.rename(spark, dir, "n", "qty") == 2L)
    assert(ColumnMapping.drop(spark, dir, "tag") == 3L)
    // metadata-only versions: manifest + data pointer + markers, NO data
    for (v <- 2L to 3L)
      assert(entries(dir, v) == Set("_schema", "_data_from", "_SUCCESS", "_commit_ts"),
        s"version $v must hold zero data bytes: ${entries(dir, v)}")
    assert(ColumnMapping.dataVersion(spark, dir, 3L) == 1L)
    // live read under evolved names; old versions under their own names
    assert(ColumnMapping.read(spark, dir).columns.toSeq == Seq("k", "qty"))
    assert(ColumnMapping.readVersion(spark, dir, 1L).columns.toSeq ==
      Seq("k", "n", "tag"))
    assert(ColumnMapping.readVersion(spark, dir, 2L).columns.toSeq ==
      Seq("k", "qty", "tag"))
    assert(ColumnMapping.read(spark, dir).orderBy("k").as[(Long, Int)].collect()
      .toSeq == Seq((1L, 10), (2L, 20)))
    // guards
    intercept[IllegalArgumentException](ColumnMapping.rename(spark, dir, "qty", "k"))
    intercept[RuntimeException](ColumnMapping.rename(spark, dir, "gone", "x"))
  }

  test("a re-added name mints a fresh id — old data does not leak into it") {
    val dir = TestSpark.tmpDir("cm2") + "/t"
    ColumnMapping.writeData(Seq((1L, 7)).toDF("k", "n"), dir)
    ColumnMapping.drop(spark, dir, "n")
    // new data commit re-introduces the NAME; it must get a new id, so the
    // dropped column's bytes stay unreachable under it
    ColumnMapping.writeData(
      ColumnMapping.read(spark, dir).withColumn("n", lit(99)), dir)
    val m = ColumnMapping.manifest(spark, dir, 3L)
    assert(m.map(_.name) == Seq("k", "n") && m.map(_.id) == Seq(1, 3),
      s"re-added 'n' must mint a fresh id: $m")
    assert(ColumnMapping.read(spark, dir).as[(Long, Int)].collect()
      .toSeq == Seq((1L, 99)))
  }

  test("CDF replays across rename+drop: captures render under the end manifest") {
    val dir = TestSpark.tmpDir("cm3") + "/t"
    val keys = Some(Seq("k"))
    ColumnMapping.writeData(
      Seq((1L, 10, 100L), (2L, 20, 200L), (3L, 30, 300L)).toDF("k", "n", "b"),
      dir, keys) // v1: 3 inserts
    ColumnMapping.writeData(
      ColumnMapping.read(spark, dir)
        .withColumn("b", when(col("k") === 1, col("b") + 5).otherwise(col("b"))),
      dir, keys) // v2: update k=1 under the ORIGINAL name b
    ColumnMapping.rename(spark, dir, "b", "bal") // v3: metadata only
    ColumnMapping.drop(spark, dir, "n") // v4: metadata only
    ColumnMapping.writeData(
      ColumnMapping.read(spark, dir).filter(col("k") =!= 3), dir, keys) // v5: delete
    val changes = ColumnMapping.tableChanges(spark, dir, 0L, 5L)
    // end-manifest rendering: the update captured as 'b' reads back as 'bal',
    // the dropped 'n' is gone from every change row
    assert(changes.columns.toSet ==
      Set("k", "bal", ChangeFeed.ChangeType, ChangeFeed.CommitVersion))
    assert(changes.filter(col(ChangeFeed.CommitVersion) === 2 &&
      col(ChangeFeed.ChangeType) === "update_postimage")
      .select("bal").as[Long].collect().toSeq == Seq(105L))
    // metadata-only versions contribute zero rows
    assert(changes.filter(col(ChangeFeed.CommitVersion).isin(3, 4)).isEmpty)
    // replay from nothing lands on the evolved live snapshot bit-exactly
    val replayed = ChangeFeed.apply(None, changes, Seq("k"))
    val live = ColumnMapping.read(spark, dir)
    assert(replayed.exceptAll(live).isEmpty && live.exceptAll(replayed).isEmpty)
    // replay from a PRE-evolution base rendered under the end manifest
    val base = ColumnMapping.readVersionAs(spark, dir, 1L, 5L)
    val replay2 = ChangeFeed.apply(Some(base),
      ColumnMapping.tableChanges(spark, dir, 1L, 5L), Seq("k"))
    assert(replay2.exceptAll(live).isEmpty && live.exceptAll(replay2).isEmpty)
  }

  test("gc keeps the data version a live rename references; plain keep-window would not") {
    val dir = TestSpark.tmpDir("cm4") + "/t"
    ColumnMapping.writeData(Seq((1L, 10L)).toDF("k", "b"), dir) // v1 data
    ColumnMapping.writeData(Seq((1L, 10L), (2L, 20L)).toDF("k", "b"), dir) // v2 data
    ColumnMapping.rename(spark, dir, "b", "bal") // v3 -> data_from 2
    ColumnMapping.rename(spark, dir, "bal", "amount") // v4 -> data_from 2
    // keep=2 window is {3,4}: both reference v2, so v2 must survive, v1 dies
    assert(ColumnMapping.gc(spark, dir, keep = 2) == 1)
    val left = VersionedTable.listVersions(
      fs(dir), dir).toSet
    assert(left == Set(2L, 3L, 4L), s"v2 is pinned by the kept renames: $left")
    assert(ColumnMapping.read(spark, dir).columns.toSeq == Seq("k", "amount"))
    assert(ColumnMapping.readVersion(spark, dir, 3L).count() == 2)
    // keep=1: only v4 (+ its referenced v2) survive; v3 is gone and loud
    assert(ColumnMapping.gc(spark, dir, keep = 1) == 1)
    assert(VersionedTable.listVersions(fs(dir), dir).toSet == Set(2L, 4L))
    assert(ColumnMapping.read(spark, dir).count() == 2)
    intercept[RuntimeException](ColumnMapping.readVersion(spark, dir, 3L).count())
  }
}
