package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{ActionLog, ChangeFeed, TableChecksum, VersionedTable}

/** Round-9 regression pins — one per round-8 ADVICE defect: SQL DML on a
  * CDF-tracked table must keep the feed contiguous (never wedge a running
  * stream on a capture-less version), >=100-part checkpoints must
  * validate, a legacy-xor _crc must fail diagnosably, and concurrent
  * CREATE TABLE must lose with TableAlreadyExistsException.
  */
class Round9OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def registerCat(root: String, tag: String): String = {
    val cat = s"graftr9$tag"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.source.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    spark.conf.set(s"spark.sql.catalog.$cat.features", "deletion-vectors")
    cat
  }

  test("SQL DML on a CDF-tracked table maintains the feed end to end") {
    val root = TestSpark.tmpDir("r9cdf")
    val dir = s"$root/ns/t"
    val cat = registerCat(root, "a")
    // a feed-tracked table: typed keyed commit records the feed keys
    ChangeFeed.commit(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), dir,
      keyCols = Seq("k"))
    assert(ChangeFeed.recordedKeys(spark, dir).contains(Seq("k")))
    assert(ChangeFeed.tracked(spark, dir))
    // SQL INSERT captures its delta tagged insert — v2 must carry _cdf
    spark.sql(s"INSERT INTO $cat.ns.t VALUES (3, 'c')")
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(new org.apache.hadoop.fs.Path(
      VersionedTable.verDir(dir, 2L), "_cdf")),
      "a SQL INSERT on a tracked table must commit WITH capture")
    // SQL UPDATE (row-level copy-on-write) captures the keyed diff
    spark.sql(s"UPDATE $cat.ns.t SET v = 'B' WHERE k = 2")
    assert(fs.exists(new org.apache.hadoop.fs.Path(
      VersionedTable.verDir(dir, 3L), "_cdf")),
      "a SQL UPDATE on a tracked table must commit WITH capture")
    // INSERT OVERWRITE captures at the PROTOCOL level (round 12): a
    // MARKER, expanded lazily by readers — no diff join at write time.
    // The NET view is unchanged: vs {(1,a),(2,B),(3,c)} the unchanged
    // k=2 contributes NOTHING, 9 inserts, 1/3 delete.
    spark.sql(s"INSERT OVERWRITE $cat.ns.t VALUES (2, 'B'), (9, 'z')")
    assert(ChangeFeed.hasCapture(spark, dir, 4L))
    assert(fs.exists(new org.apache.hadoop.fs.Path(
      VersionedTable.verDir(dir, 4L), ChangeFeed.OverwriteMarkerName)),
      "a plain-base overwrite must capture as a marker, not a diff")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(
      VersionedTable.verDir(dir, 4L), "_cdf")),
      "the marker form writes zero capture bytes")
    val ch4 = ChangeFeed.netChanges(spark, dir, 3L, 4L, Seq("k"))
      .localCheckpoint()
    assert(ch4.filter(col(ChangeFeed.ChangeType) === "insert")
      .select("k").as[Long].collect().toSeq == Seq(9L),
      "the net view of the overwrite must be the keyed diff")
    assert(ch4.filter(col(ChangeFeed.ChangeType) === "delete")
      .select("k").as[Long].collect().sorted.toSeq == Seq(1L, 3L))
    assert(ch4.count() == 3L, "the unchanged key must contribute nothing")
    // SQL DELETE on the tracked table captures too (DV path)
    spark.sql(s"DELETE FROM $cat.ns.t WHERE k = 9")
    assert(fs.exists(new org.apache.hadoop.fs.Path(
      VersionedTable.verDir(dir, 5L), "_cdf")))
    // the feed REPLAYS to the live snapshot — the completeness contract a
    // wedged stream could never deliver. DV-AWARE read: v5 is a
    // deletion-vector version, the raw snapshot still holds masked rows.
    val replayed = ChangeFeed.apply(None,
      ChangeFeed.tableChanges(spark, dir, 0L, 5L, Seq("k")), Seq("k"))
    val live = graft.ops.DeletionVectors.read(spark, dir)
    assert(replayed.exceptAll(live).isEmpty && live.exceptAll(replayed).isEmpty,
      "base + captured changes must equal the live snapshot")
  }

  test("SQL DML on an UNTRACKED table must not silently start a feed") {
    val root = TestSpark.tmpDir("r9un")
    val dir = s"$root/ns/t"
    val cat = registerCat(root, "b")
    VersionedTable.write(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v"),
      dir)
    spark.sql(s"DELETE FROM $cat.ns.t WHERE k = 1") // v2: DV, no capture
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(
      VersionedTable.verDir(dir, 2L), "_cdf")),
      "SQL DELETE on an untracked table must not create tracking")
    // and the row-level UPDATE after it still works (no feed to answer for)
    spark.sql(s"UPDATE $cat.ns.t SET v = 'X' WHERE k = 2")
    assert(spark.sql(s"SELECT v FROM $cat.ns.t WHERE k = 2")
      .as[String].head() == "X")
    assert(!ChangeFeed.tracked(spark, dir))
  }

  test("a tracked table without recorded keys refuses row-level SQL loudly") {
    val root = TestSpark.tmpDir("r9nk")
    val dir = s"$root/ns/t"
    val cat = registerCat(root, "c")
    VersionedTable.write(Seq((1L, "a")).toDF("k", "v"), dir)
    // legacy shape: a capture exists but no keys were ever recorded
    Seq((1L, "a", "insert")).toDF("k", "v", ChangeFeed.ChangeType)
      .write.parquet(VersionedTable.verDir(dir, 1L).toString + "/_cdf")
    assert(ChangeFeed.tracked(spark, dir))
    val e = intercept[Exception] {
      spark.sql(s"UPDATE $cat.ns.t SET v = 'X' WHERE k = 1")
    }
    assert(e.getMessage != null && e.getMessage.contains("recorded keys"),
      s"the refusal must land on the WRITER with a diagnosable message, got $e")
  }

  test("feed keys are one-per-table: a second key set is refused") {
    val dir = TestSpark.tmpDir("r9keys") + "/t"
    ChangeFeed.commit(Seq((1L, "a")).toDF("k", "v"), dir, Seq("k"))
    val e = intercept[IllegalArgumentException] {
      ChangeFeed.commit(Seq((1L, "a")).toDF("k", "v"), dir, Seq("v"))
    }
    assert(e.getMessage.contains("one feed, one key set"))
  }

  test("a >=100-part checkpoint validates and bounds the replay") {
    val dir = TestSpark.tmpDir("r9ck") + "/t"
    ActionLog.append(Seq(1L, 2L).toDF("k").coalesce(1), dir)
    ActionLog.append(Seq(3L).toDF("k").coalesce(1), dir)
    ActionLog.checkpoint(spark, dir, parts = 100)
    ActionLog.append(Seq(4L).toDF("k").coalesce(1), dir)
    val (files, replayed, ckpt) = ActionLog.resolve(spark, dir, 3L)
    assert(ckpt.contains(2L),
      "the 100-part checkpoint must be COMPLETE and used as the replay base")
    assert(replayed == 1, "only the post-checkpoint tail replays")
    assert(files.size == 3)
    assert(ActionLog.read(spark, dir).as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L, 3L, 4L))
  }

  test("a legacy xor _crc fails with a restamp diagnosis, not a key error") {
    val dir = TestSpark.tmpDir("r9crc") + "/t"
    VersionedTable.write(Seq(1L).toDF("k"), dir)
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val out = fs.create(new org.apache.hadoop.fs.Path(
      VersionedTable.verDir(dir, 1L), "_crc"), true)
    out.write("rows=1\nxor=42".getBytes("UTF-8")); out.close()
    val e = intercept[RuntimeException] {
      TableChecksum.verify(spark, dir, 1L)
    }
    assert(e.getMessage.contains("restamp required"),
      s"wanted the digest-changed diagnosis, got: ${e.getMessage}")
  }

  test("concurrent CREATE TABLE: one winner, losers get AlreadyExists") {
    val root = TestSpark.tmpDir("r9ct")
    val cat = registerCat(root, "d")
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.ns")
    val wins = new java.util.concurrent.atomic.AtomicInteger(0)
    val bad = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (1 to 8).map(_ => new Thread(() =>
      try {
        spark.sql(s"CREATE TABLE $cat.ns.ct (k BIGINT, v STRING)")
        wins.incrementAndGet(); ()
      } catch {
        case _: org.apache.spark.sql.catalyst.analysis
          .TableAlreadyExistsException => ()
        case t: Throwable if t.getCause.isInstanceOf[
          org.apache.spark.sql.catalyst.analysis
            .TableAlreadyExistsException] => ()
        case t: Throwable => bad.add(t); ()
      }))
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(wins.get == 1, s"exactly one CREATE must win, got ${wins.get}")
    assert(bad.isEmpty,
      s"every loser must see TableAlreadyExists, got ${Option(bad.peek())}")
    // the created-but-empty table is live and insertable
    spark.sql(s"INSERT INTO $cat.ns.ct VALUES (1, 'x')")
    assert(spark.sql(s"SELECT count(*) FROM $cat.ns.ct").head.getLong(0) == 1L)
  }
}
