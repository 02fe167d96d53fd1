package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.{ChangeFeed, RowTracking, VersionedTable}

/** Row-identity contract: ids are minted once, survive merges and layout
  * rewrites, retire forever on delete, and make two arbitrary versions
  * diffable by one long-keyed join.
  */
class RowTrackingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("init mints dense ids and records the high-water mark") {
    val dir = TestSpark.tmpDir("rt1") + "/t"
    RowTracking.init(Seq((10L, "a"), (20L, "b"), (30L, "c")).toDF("k", "v"),
      dir, Seq("k"))
    val v1 = VersionedTable.readVersion(spark, dir, 1L)
    assert(v1.select(RowTracking.RowId).as[Long].collect().sorted
      === Array(1L, 2L, 3L))
    assert(RowTracking.highWaterMark(spark, dir, 1L) === 3L)
  }

  test("merge preserves matched ids, mints fresh above hwm, retires deleted") {
    val dir = TestSpark.tmpDir("rt2") + "/t"
    RowTracking.init(Seq((10L, "a"), (20L, "b"), (30L, "c")).toDF("k", "v"),
      dir, Seq("k"))
    // k=10 updated, k=20 deleted, k=40 inserted
    RowTracking.merge(Seq((10L, "a2"), (30L, "c"), (40L, "d")).toDF("k", "v"),
      dir, Seq("k"), Seq("k"))
    val v1 = VersionedTable.readVersion(spark, dir, 1L)
      .select(col("k"), col(RowTracking.RowId).as("id1"))
    val v2 = VersionedTable.readVersion(spark, dir, 2L)
      .select(col("k"), col(RowTracking.RowId).as("id2"), col("v"))
    val kept = v1.join(v2, Seq("k"))
    assert(kept.filter(col("id1") =!= col("id2")).isEmpty,
      "matched keys must keep their id even when data changed")
    val fresh = v2.filter(col("k") === 40L).select("id2").as[Long].head()
    assert(fresh === 4L, "fresh id = hwm + 1")
    assert(RowTracking.highWaterMark(spark, dir, 2L) === 4L)
    // a re-insert of the deleted k=20 gets a NEW id, not the retired 2
    RowTracking.merge(
      VersionedTable.readVersion(spark, dir, 2L).drop(RowTracking.RowId)
        .unionByName(Seq((20L, "b2")).toDF("k", "v")),
      dir, Seq("k"), Seq("k"))
    val re = VersionedTable.readVersion(spark, dir, 3L)
      .filter(col("k") === 20L).select(RowTracking.RowId).as[Long].head()
    assert(re === 5L, "retired ids never recycle")
  }

  test("layout rewrite keeps every id and the diff across it is empty") {
    val dir = TestSpark.tmpDir("rt3") + "/t"
    RowTracking.init(spark.range(0, 100).select(col("id").as("k"),
      (col("id") % 7).as("v")), dir, Seq("k"))
    RowTracking.rewrite(spark, dir, numFiles = 3)
    assert(VersionedTable.readVersion(spark, dir, 2L).inputFiles.length === 3)
    assert(RowTracking.diff(spark, dir, 1L, 2L).isEmpty,
      "a pure rewrite must be invisible to row lineage")
    assert(RowTracking.highWaterMark(spark, dir, 2L) === 100L)
  }

  test("row-id diff classifies insert/delete/update like the keyed diff") {
    val dir = TestSpark.tmpDir("rt4") + "/t"
    RowTracking.init(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v"),
      dir, Seq("k"))
    RowTracking.merge(Seq((1L, "a2"), (3L, "c"), (9L, "i")).toDF("k", "v"),
      dir, Seq("k"), Seq("k"))
    val d = RowTracking.diff(spark, dir, 1L, 2L)
      .select("k", "v", ChangeFeed.ChangeType)
      .as[(Long, String, String)].collect().toSet
    assert(d === Set((1L, "a", "update_preimage"), (1L, "a2", "update_postimage"),
      (2L, "b", "delete"), (9L, "i", "insert")))
  }

  test("a snapshot pre-carrying the id column is rejected") {
    val dir = TestSpark.tmpDir("rt5") + "/t"
    RowTracking.init(Seq((1L, "a")).toDF("k", "v"), dir, Seq("k"))
    val sneaky = Seq((1L, "a", 7L)).toDF("k", "v", RowTracking.RowId)
    val e = intercept[IllegalArgumentException] {
      RowTracking.merge(sneaky, dir, Seq("k"), Seq("k"))
    }
    assert(e.getMessage.contains(RowTracking.RowId))
  }

  test("an untracked table fails loudly instead of silently minting") {
    val dir = TestSpark.tmpDir("rt6") + "/t"
    VersionedTable.write(Seq((1L, "a")).toDF("k", "v"), dir)
    val e = intercept[RuntimeException] {
      RowTracking.highWaterMark(spark, dir, 1L)
    }
    assert(e.getMessage.contains("_row_hwm"))
  }
}
