package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{ChangeFeed, DeletionVectors, VersionedTable}

/** Round-10 regression pins — one per round-9 ADVICE defect: Occ.commit's
  * capture (and mutate snapshot) must see the DV-applied view, a blind
  * INSERT of a live key on a keyed feed must fail loudly, and the first
  * `_cdfkeys` write must be a true put-if-absent.
  */
class Round10OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def registerCat(root: String, tag: String): String = {
    val cat = s"graftr10$tag"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.source.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    spark.conf.set(s"spark.sql.catalog.$cat.features", "deletion-vectors")
    cat
  }

  test("DELETE then OVERWRITE-reinsert captures the resurrected key") {
    val root = TestSpark.tmpDir("r10dvo")
    val dir = s"$root/ns/t"
    val cat = registerCat(root, "a")
    ChangeFeed.commit(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), dir, Seq("k"))
    spark.sql(s"DELETE FROM $cat.ns.t WHERE k = 1") // v2: DV-masked
    // re-insert the deleted key with IDENTICAL values: against the raw
    // base this diffs to nothing (k=1 is still in the files) — against
    // the DV-applied view it is an insert, which is what the feed needs
    spark.sql(s"INSERT OVERWRITE $cat.ns.t VALUES (1, 'a'), (2, 'b')")
    val ch3 = spark.read.parquet(
      VersionedTable.verDir(dir, 3L).toString + "/_cdf")
    assert(ch3.filter(col(ChangeFeed.ChangeType) === "insert")
      .select("k").as[Long].collect().toSeq == Seq(1L),
      "an overwrite re-inserting a DV-deleted key must capture it as insert")
    assert(ch3.filter(col(ChangeFeed.ChangeType) === "delete").isEmpty,
      "rows masked in the base and absent from the overwrite were already " +
        "deleted — capturing them again would be a duplicate delete")
    val replayed = ChangeFeed.apply(None,
      ChangeFeed.tableChanges(spark, dir, 0L, 3L, Seq("k")), Seq("k"))
    val live = spark.sql(s"SELECT * FROM $cat.ns.t")
    assert(replayed.exceptAll(live).isEmpty && live.exceptAll(replayed).isEmpty,
      "base + captured changes must equal the live snapshot")
  }

  test("a blind SQL INSERT after DELETE must not resurrect masked rows") {
    val root = TestSpark.tmpDir("r10dva")
    val dir = s"$root/ns/t"
    val cat = registerCat(root, "b")
    ChangeFeed.commit(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), dir, Seq("k"))
    spark.sql(s"DELETE FROM $cat.ns.t WHERE k = 1") // v2: DV-masked
    spark.sql(s"INSERT INTO $cat.ns.t VALUES (3, 'c')") // v3: append
    val live = spark.sql(s"SELECT k FROM $cat.ns.t").as[Long].collect().sorted
    assert(live.toSeq == Seq(2L, 3L),
      s"the append's base ∪ delta must start from the DV-applied view, got ${live.toSeq}")
    val replayed = ChangeFeed.apply(None,
      ChangeFeed.tableChanges(spark, dir, 0L, 3L, Seq("k")), Seq("k"))
    val liveAll = spark.sql(s"SELECT * FROM $cat.ns.t")
    assert(replayed.exceptAll(liveAll).isEmpty && liveAll.exceptAll(replayed).isEmpty)
  }

  test("blind INSERT of a live key on a keyed feed fails loudly") {
    val root = TestSpark.tmpDir("r10dup")
    val dir = s"$root/ns/t"
    val cat = registerCat(root, "c")
    ChangeFeed.commit(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), dir, Seq("k"))
    val e = intercept[Exception] {
      spark.sql(s"INSERT INTO $cat.ns.t VALUES (1, 'dup')")
    }
    val msg = Option(e.getMessage).getOrElse("") +
      Option(e.getCause).flatMap(c => Option(c.getMessage)).getOrElse("")
    assert(msg.contains("blind append") || msg.contains("duplicate-key"),
      s"expected the keyed-feed append guard, got $e")
    // the table is untouched: still exactly the two seeded rows
    assert(spark.sql(s"SELECT count(*) FROM $cat.ns.t").as[Long].head() == 2L)
    assert(VersionedTable.currentVersion(spark, dir).contains(1L))
  }

  test("concurrent first keyed commits: one key set wins, the loser is told") {
    val dir = TestSpark.tmpDir("r10race") + "/t"
    val results = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val gate = new java.util.concurrent.CountDownLatch(1)
    def attempt(keys: Seq[String]): Thread = new Thread(() => {
      gate.await()
      try { ChangeFeed.commit(Seq((1L, "a")).toDF("k", "v"), dir, keys); results.add("ok") }
      catch { case e: Throwable => results.add("err:" + Option(e.getMessage).getOrElse("")) }
    })
    val ts = Seq(attempt(Seq("k")), attempt(Seq("v")))
    ts.foreach(_.start()); gate.countDown(); ts.foreach(_.join())
    val rs = results.toArray(Array.empty[String]).toSeq
    assert(rs.count(_ == "ok") == 1, s"exactly one first commit must win, got $rs")
    assert(rs.exists(r => r.startsWith("err:") && r.contains("one feed, one key set")),
      s"the loser must be refused with the key-set doctrine, got $rs")
    // and the recorded keys are exactly the winner's — never a mix
    val rec = ChangeFeed.recordedKeys(spark, dir)
    assert(rec.contains(Seq("k")) || rec.contains(Seq("v")))
  }
}
