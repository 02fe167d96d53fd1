package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.{ChangeFeed, VersionedTable}

/** Collapsed-CDC contract: netChanges(a, b) equals diff(snapshot_a,
  * snapshot_b) for every per-key composition, and the vanishing classes
  * (undone, insert-then-delete, identical reinsert) really vanish.
  */
class NetChangesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("every composition class collapses to its minimal effect") {
    val dir = TestSpark.tmpDir("nc1") + "/t"
    // v1
    VersionedTable.write(Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"),
      (7L, "g")).toDF("k", "v"), dir)
    // v2: update 1, delete 2, delete 7, insert 5; 3/4 untouched
    ChangeFeed.commit(Seq((1L, "a2"), (3L, "c"), (4L, "d"), (5L, "e"))
      .toDF("k", "v"), dir, Seq("k"))
    // v3: 1 back to original; 5 deleted; 2 re-inserted identically; 7
    // re-inserted DIFFERENT; 3 updated; 6 inserted
    ChangeFeed.commit(Seq((1L, "a"), (2L, "b"), (3L, "c9"), (4L, "d"),
      (6L, "f"), (7L, "g2")).toDF("k", "v"), dir, Seq("k"))
    val net = ChangeFeed.netChanges(spark, dir, 1L, 3L, Seq("k"))
    val got = net.select("k", "v", ChangeFeed.ChangeType)
      .as[(Long, String, String)].collect().toSet
    assert(got === Set(
      (3L, "c", "update_preimage"), (3L, "c9", "update_postimage"),
      (7L, "g", "update_preimage"), (7L, "g2", "update_postimage"),
      (6L, "f", "insert")))
    // and the general contract
    val want = ChangeFeed.diff(
      Some(VersionedTable.readVersion(spark, dir, 1L)),
      VersionedTable.readVersion(spark, dir, 3L), Seq("k"))
    assert(net.exceptAll(want).isEmpty && want.exceptAll(net).isEmpty)
  }

  test("a sub-range nets only its own window") {
    val dir = TestSpark.tmpDir("nc2") + "/t"
    VersionedTable.write(Seq((1L, "a")).toDF("k", "v"), dir)
    ChangeFeed.commit(Seq((1L, "a2"), (2L, "b")).toDF("k", "v"), dir, Seq("k"))
    ChangeFeed.commit(Seq((1L, "a3")).toDF("k", "v"), dir, Seq("k"))
    val net23 = ChangeFeed.netChanges(spark, dir, 2L, 3L, Seq("k"))
      .select("k", "v", ChangeFeed.ChangeType)
      .as[(Long, String, String)].collect().toSet
    assert(net23 === Set((1L, "a2", "update_preimage"),
      (1L, "a3", "update_postimage"), (2L, "b", "delete")))
  }

  test("single-version range degenerates to the plain feed") {
    val dir = TestSpark.tmpDir("nc3") + "/t"
    VersionedTable.write(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), dir)
    ChangeFeed.commit(Seq((1L, "a2"), (3L, "c")).toDF("k", "v"), dir, Seq("k"))
    val net = ChangeFeed.netChanges(spark, dir, 1L, 2L, Seq("k"))
      .select("k", "v", ChangeFeed.ChangeType)
      .as[(Long, String, String)].collect().toSet
    assert(net === Set((1L, "a", "update_preimage"),
      (1L, "a2", "update_postimage"), (2L, "b", "delete"), (3L, "c", "insert")))
  }
}
