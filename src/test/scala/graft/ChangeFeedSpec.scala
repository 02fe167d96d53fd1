package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{ChangeFeed, VersionedTable}

/** The change data feed over the versioned table: write-side capture must
  * equal the logical snapshot diff, survive pre-CDF versions via the
  * fallback, and the consumer-side fold (base + feed) must reproduce the
  * final snapshot exactly — including keys that are born and die inside
  * the feed window, null keys, and no-op rewrites that must NOT appear as
  * changes.
  */
class ChangeFeedSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def df(rows: Seq[(java.lang.Long, String, Double)]): DataFrame =
    rows.toDF("k", "tag", "v")

  private def sortedRows(d: DataFrame): Seq[String] =
    d.collect().map(_.mkString("|")).toSeq.sorted

  private def assertSame(a: DataFrame, b: DataFrame): Unit = {
    assert(a.columns.sorted.sameElements(b.columns.sorted))
    val cols = a.columns.sorted.toSeq
    assert(sortedRows(a.select(cols.map(col): _*)) ==
      sortedRows(b.select(cols.map(col): _*)))
  }

  test("diff classifies insert/delete/update and drops no-op rewrites") {
    val old = df(Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0),
      (null, "n", 9.0)))
    val neu = df(Seq((1L, "a", 1.0),       // identical -> no change row
      (2L, "b", 2.5),                       // update
      (4L, "d", 4.0),                       // insert; 3 deleted
      (null, "n2", 9.0)))                   // null key matches null key
    val d = ChangeFeed.diff(Some(old), neu, Seq("k"))
    val byType = d.groupBy(ChangeFeed.ChangeType).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType == Map("insert" -> 1L, "delete" -> 1L,
      "update_preimage" -> 2L, "update_postimage" -> 2L))
    // the null-key pair is an update (tag changed), not delete+insert
    val nullRows = d.filter(col("k").isNull)
      .select(ChangeFeed.ChangeType, "tag").as[(String, String)]
      .collect().toSet
    assert(nullRows == Set("update_preimage" -> "n", "update_postimage" -> "n2"))
    // preimage carries OLD values, postimage NEW
    val two = d.filter(col("k") === 2L)
      .select(ChangeFeed.ChangeType, "v").as[(String, Double)].collect().toMap
    assert(two == Map("update_preimage" -> 2.0, "update_postimage" -> 2.5))
  }

  test("commit persists capture equal to the snapshot diff; fallback covers pre-CDF versions") {
    val dir = TestSpark.tmpDir("cdf-commit")
    val v1 = df(Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0)))
    VersionedTable.write(v1, dir) // v1 WITHOUT capture (pre-CDF)
    val v2 = df(Seq((1L, "a", 1.5), (3L, "c", 3.0), (5L, "e", 5.0)))
    assert(ChangeFeed.commit(v2, dir, Seq("k")) == 2L)
    // persisted capture == recomputed logical diff (the audit twin)
    assertSame(
      ChangeFeed.tableChanges(spark, dir, 1L, 2L, Seq("k"))
        .drop(ChangeFeed.CommitVersion),
      ChangeFeed.snapshotDiff(spark, dir, 2L, Seq("k")))
    // the pre-CDF version is reconstructed: v1 reads as 3 inserts
    val first = ChangeFeed.tableChanges(spark, dir, 0L, 1L, Seq("k"))
    assert(first.filter(col(ChangeFeed.ChangeType) === "insert").count() == 3L)
    assert(first.select(ChangeFeed.CommitVersion).distinct()
      .as[Long].collect().toSeq == Seq(1L))
  }

  test("base + feed replay reproduces the final snapshot (birth-and-death keys included)") {
    val dir = TestSpark.tmpDir("cdf-apply")
    ChangeFeed.commit(df(Seq((1L, "a", 1.0), (2L, "b", 2.0))), dir, Seq("k"))
    // v2: key 9 is born
    ChangeFeed.commit(
      df(Seq((1L, "a", 1.0), (2L, "b2", 2.0), (9L, "i", 9.0))), dir, Seq("k"))
    // v3: key 9 dies, key 1 updated
    ChangeFeed.commit(
      df(Seq((1L, "a3", 1.0), (2L, "b2", 2.0))), dir, Seq("k"))
    val feed = ChangeFeed.tableChanges(spark, dir, 1L, 3L, Seq("k"))
    val replayed = ChangeFeed.apply(
      Some(VersionedTable.readVersion(spark, dir, 1L)), feed, Seq("k"))
    assertSame(replayed, VersionedTable.readVersion(spark, dir, 3L))
    // from-nothing replay over the whole feed also lands on the snapshot
    val full = ChangeFeed.apply(None,
      ChangeFeed.tableChanges(spark, dir, 0L, 3L, Seq("k")), Seq("k"))
    assertSame(full, VersionedTable.readVersion(spark, dir, 3L))
  }

  test("add-column evolution: preimages null-pad, feed replay lands on the evolved snapshot") {
    val dir = TestSpark.tmpDir("cdf-evolve")
    ChangeFeed.commit(Seq((1L, "a"), (2L, "b")).toDF("k", "t"), dir, Seq("k"))
    // v2 adds a column; only row 2 is backfilled, row 1 stays null (no-op)
    ChangeFeed.commit(
      Seq[(Long, String, String)]((1L, "a", null), (2L, "b", "x"))
        .toDF("k", "t", "extra"),
      dir, Seq("k"))
    val v2 = ChangeFeed.tableChanges(spark, dir, 1L, 2L, Seq("k"))
    val byType = v2.groupBy(ChangeFeed.ChangeType).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType == Map("update_preimage" -> 1L, "update_postimage" -> 1L))
    assert(v2.filter(col(ChangeFeed.ChangeType) === "update_preimage")
      .select("extra").head().isNullAt(0), "preimage must carry NULL in the new column")
    // the whole feed (v1 capture lacks `extra`) unions null-padded and
    // replays onto the evolved snapshot
    val replayed = ChangeFeed.apply(None,
      ChangeFeed.tableChanges(spark, dir, 0L, 2L, Seq("k")), Seq("k"))
    assertSame(replayed, VersionedTable.readVersion(spark, dir, 2L))
    // replay from a PRE-evolution base also lands there
    val fromBase = ChangeFeed.apply(
      Some(VersionedTable.readVersion(spark, dir, 1L)),
      ChangeFeed.tableChanges(spark, dir, 1L, 2L, Seq("k")), Seq("k"))
    assertSame(fromBase, VersionedTable.readVersion(spark, dir, 2L))
    // dropped columns stay unsupported, loudly
    intercept[IllegalArgumentException] {
      ChangeFeed.commit(Seq((1L, "a")).toDF("k", "t"), dir, Seq("k"))
    }
  }

  test("tableChanges rejects an empty or incomplete version range") {
    val dir = TestSpark.tmpDir("cdf-empty")
    ChangeFeed.commit(df(Seq((1L, "a", 1.0))), dir, Seq("k"))
    intercept[IllegalArgumentException] {
      ChangeFeed.tableChanges(spark, dir, 5L, 9L, Seq("k"))
    }
  }

  test("a gc'd version inside the range fails loudly — never a silently partial feed") {
    val dir = TestSpark.tmpDir("cdf-gc")
    ChangeFeed.commit(df(Seq((1L, "a", 1.0))), dir, Seq("k"))
    ChangeFeed.commit(df(Seq((1L, "a", 1.0), (2L, "b", 2.0))), dir, Seq("k"))
    ChangeFeed.commit(df(Seq((2L, "b", 2.5))), dir, Seq("k"))
    VersionedTable.gc(spark, dir, keep = 2) // v1 expires
    val ex = intercept[IllegalArgumentException] {
      ChangeFeed.tableChanges(spark, dir, 0L, 3L, Seq("k"))
    }
    assert(ex.getMessage.contains("expired"))
    // the retained sub-range still reads
    assert(ChangeFeed.tableChanges(spark, dir, 1L, 3L, Seq("k")).count() > 0L)
  }
}
