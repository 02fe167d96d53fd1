package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{ActionLog, Occ}

/** Round-12 regression pins — one per round-11/12 ADVICE defect on the
  * parquet-checkpoint plane, plus the auto-checkpoint entry point that
  * makes the plane reachable from the production OCC/exactly-once write
  * paths.
  *
  * The two HIGH pins guard the hidden-file rule: Spark's file index
  * silently drops `_`-prefixed paths even when passed explicitly, so the
  * distributed replay must never feed `_checkpoint-*.json` /
  * `_compact-*.json` to `spark.read.text` — it reads them driver-side
  * and parallelizes the lines.
  */
class Round12OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def df(ks: Long*) = ks.toSeq.toDF("k")

  private def fsOf(dir: String) = new org.apache.hadoop.fs.Path(dir)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def liveOf(dir: String, asOf: Long = Long.MaxValue): Set[String] = {
    val v = ActionLog.versions(spark, dir).last.min(asOf)
    ActionLog.resolve(spark, dir, v)._1.toSet
  }

  private def liveDfOf(dir: String): Set[String] =
    ActionLog.resolveDf(spark, dir).select("p").as[String].collect().toSet

  test("compacted-log fragments reach the distributed replay (resolveDf)") {
    val dir = TestSpark.tmpDir("r12frag")
    ActionLog.append(df(1L), dir)
    ActionLog.append(df(2L), dir)
    ActionLog.append(df(3L), dir)
    ActionLog.compactLog(spark, dir, 1L, 2L)
    // the fragment is a hidden file: a spark.read.text-based tail would
    // silently drop v1+v2's adds and return only v3's file
    assert(liveDfOf(dir) == liveOf(dir),
      "resolveDf must agree with the driver replay on a compacted log")
    assert(liveDfOf(dir).size == 3)
    // and a parquet checkpoint written over the compacted log is complete
    ActionLog.checkpointParquet(spark, dir)
    assert(ActionLog.read(spark, dir).as[Long].collect().sorted.toSeq
      == Seq(1L, 2L, 3L))
  }

  test("JSON-checkpoint base survives migration to the parquet plane") {
    val dir = TestSpark.tmpDir("r12mig")
    ActionLog.append(df(1L), dir)
    ActionLog.append(df(2L), dir)
    ActionLog.checkpoint(spark, dir) // JSON checkpoint at v2 (hidden file)
    ActionLog.append(df(10L), dir)
    // the distributed state must include the JSON base, or the parquet
    // checkpoint written from it silently loses the whole pre-checkpoint
    // table — durable data loss on every later read
    assert(liveDfOf(dir) == liveOf(dir),
      "stateDfAt must seed from the JSON checkpoint base")
    ActionLog.checkpointParquet(spark, dir)
    ActionLog.append(df(100L), dir)
    assert(ActionLog.read(spark, dir).as[Long].collect().sorted.toSeq
      == Seq(1L, 2L, 10L, 100L),
      "reads after JSON->parquet checkpoint migration must see every row")
    // replay seeds from the newest (parquet) checkpoint, not full replay
    val (_, replayed, ckpt) = ActionLog.resolve(spark, dir, 4L)
    assert(ckpt.contains(3L) && replayed == 1,
      s"expected parquet-seeded replay of 1 action, got ($ckpt, $replayed)")
  }

  test("multi-part JSON checkpoint base survives on the distributed plane") {
    val dir = TestSpark.tmpDir("r12mp")
    (1 to 4).foreach(i => ActionLog.append(df(i.toLong), dir))
    ActionLog.checkpoint(spark, dir, parts = 3)
    ActionLog.append(df(5L), dir)
    assert(liveDfOf(dir) == liveOf(dir),
      "stateDfAt must seed from all parts of a multi-part JSON checkpoint")
    assert(liveDfOf(dir).size == 5)
  }

  test("stateDfAt caps an explicit over-latest asOf at the head version") {
    val dir = TestSpark.tmpDir("r12cap")
    ActionLog.append(df(7L), dir)
    // was: contiguity require fired with a misleading 'window was
    // vacuumed' error; resolve/read cap this way for their callers
    val st = ActionLog.stateDfAt(spark, dir, 5L)
    assert(st.filter(col("a") === "add").count() == 1L)
  }

  test("expired reads fail loudly after vacuum (contiguity contract)") {
    val dir = TestSpark.tmpDir("r12vac")
    (1 to 5).foreach(i => ActionLog.append(df(i.toLong), dir))
    ActionLog.vacuum(spark, dir, keepVersions = 2, graceMs = 0L)
    val e = intercept[IllegalArgumentException] {
      ActionLog.stateDfAt(spark, dir, 2L).collect()
    }
    assert(e.getMessage.contains("vacuumed"),
      s"expired distributed read must name the vacuum, got: ${e.getMessage}")
    // retained versions still resolve (from the horizon checkpoint)
    assert(ActionLog.read(spark, dir, asOf = 4L).as[Long].collect().sorted
      .toSeq == (1 to 4).map(_.toLong))
  }

  test("vacuum sweeps parquet-checkpoint dirs below the horizon") {
    val dir = TestSpark.tmpDir("r12sweep")
    (1 to 3).foreach(i => ActionLog.append(df(i.toLong), dir))
    ActionLog.checkpointParquet(spark, dir) // v3 parquet ckpt => on-plane
    (4 to 6).foreach(i => ActionLog.append(df(i.toLong), dir))
    ActionLog.vacuum(spark, dir, keepVersions = 2, graceMs = 0L)
    val fs = fsOf(dir)
    val names = fs.listStatus(new org.apache.hadoop.fs.Path(s"$dir/_log"))
      .map(_.getPath.getName).toSet
    assert(!names.contains("00000003.checkpoint.parquet"),
      s"the below-horizon parquet checkpoint dir must be swept, have $names")
    assert(names.contains("00000005.checkpoint.parquet"),
      "vacuum on a plane table must write its horizon checkpoint as parquet")
    assert(ActionLog.read(spark, dir).as[Long].collect().sorted.toSeq
      == (1 to 6).map(_.toLong))
  }

  test("a torn _last_checkpoint pointer is tolerated as absent") {
    val dir = TestSpark.tmpDir("r12torn")
    ActionLog.append(df(1L), dir)
    ActionLog.checkpoint(spark, dir)
    val fs = fsOf(dir)
    val lc = new org.apache.hadoop.fs.Path(s"$dir/_log/_last_checkpoint")
    val out = fs.create(lc, true); out.close() // zero bytes = torn writer
    assert(ActionLog.read(spark, dir).as[Long].collect().toSeq == Seq(1L))
    ActionLog.append(df(2L), dir)
    ActionLog.checkpoint(spark, dir) // next checkpoint heals the pointer
    assert(ActionLog.read(spark, dir).as[Long].collect().sorted.toSeq
      == Seq(1L, 2L))
  }

  test("Occ blind-append dup-in-delta guard fires on a FIRST commit") {
    val dir = TestSpark.tmpDir("r12dup")
    val fs = fsOf(dir)
    fs.mkdirs(new org.apache.hadoop.fs.Path(dir))
    // the crashed-after-recordKeys shape: feed keys recorded, no version
    val out = fs.create(new org.apache.hadoop.fs.Path(s"$dir/_cdfkeys"), false)
    out.write("k".getBytes("UTF-8")); out.close()
    val dup = Seq((1L, "a"), (1L, "b")).toDF("k", "v")
    val e = intercept[IllegalArgumentException] {
      Occ.commit(spark, dir, Set("*"), captureAppend = Some(dup))(
        _ => dup)
    }
    assert(e.getMessage.contains("duplicate key"),
      s"the dup guard must not depend on a live snapshot: ${e.getMessage}")
  }

  test("appendOcc auto-checkpoints the table onto the parquet plane") {
    val dir = TestSpark.tmpDir("r12auto")
    spark.conf.set(ActionLog.AutoCheckpointConf, "5")
    try {
      (1 to 7).foreach(i =>
        ActionLog.appendOcc(df(i.toLong).coalesce(1), dir, Some("k")))
      val fs = fsOf(dir)
      assert(fs.exists(new org.apache.hadoop.fs.Path(
        s"$dir/_log/00000005.checkpoint.parquet/_SUCCESS")),
        "the 5th OCC commit must land a complete parquet checkpoint")
      // replay seeds from it; the plane's O(kept) pruning path engages
      val (_, replayed, ckpt) = ActionLog.resolve(spark, dir, 7L)
      assert(ckpt.contains(5L) && replayed == 2)
      val (pruned, kept, total) = ActionLog.readWhere(spark, dir, "k", 2L, 3L)
      assert(total == 7 && kept == 2,
        s"on-plane readWhere must prune from the log: kept=$kept total=$total")
      assert(pruned.as[Long].collect().sorted.toSeq == Seq(2L, 3L))
    } finally spark.conf.unset(ActionLog.AutoCheckpointConf)
  }

  test("auto-checkpoint interval 0 disables the policy") {
    val dir = TestSpark.tmpDir("r12auto0")
    spark.conf.set(ActionLog.AutoCheckpointConf, "0")
    try {
      (1 to 5).foreach(i =>
        ActionLog.appendOcc(df(i.toLong).coalesce(1), dir))
      val fs = fsOf(dir)
      val names = fs.listStatus(new org.apache.hadoop.fs.Path(s"$dir/_log"))
        .map(_.getPath.getName)
      assert(!names.exists(_.endsWith(".parquet")),
        s"interval 0 must not checkpoint, have ${names.toSeq}")
    } finally spark.conf.unset(ActionLog.AutoCheckpointConf)
  }

  // ---- group-granular copy-on-write for row-level SQL (log layout) ----

  private def logCat(root: String, tag: String): String = {
    val cat = s"r12cow$tag"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.source.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    cat
  }

  test("row-level SQL rewrites only the groups holding matching rows") {
    val root = TestSpark.tmpDir("r12cowu")
    val dir = s"$root/t"
    // four single-file commits over disjoint key ranges
    (0 to 3).foreach { b =>
      ActionLog.append(
        spark.range(b * 100L, b * 100L + 10L).toDF("k")
          .withColumn("v", lit("a")).coalesce(1), dir, Some("k"))
    }
    val before = liveOf(dir)
    assert(before.size == 4)
    val cat = logCat(root, "u")
    spark.sql(s"UPDATE $cat.t SET v = 'X' WHERE k = 205") // file of b=2
    assert(ActionLog.versions(spark, dir) == (1L to 5L).toSeq,
      "the UPDATE must be one log commit")
    val (added, removed) = ActionLog.actionsOf(spark, dir, 5L)
    assert(removed.size == 1,
      s"only the matched group's file may be removed, got $removed")
    assert(before.contains(removed.head))
    val untouched = before - removed.head
    assert(untouched.subsetOf(liveOf(dir)),
      "unmatched groups must stay live BY REFERENCE (no rewrite)")
    assert(added.nonEmpty && added.forall(!before.contains(_)))
    // content is exact
    val got = spark.sql(s"SELECT k, v FROM $cat.t WHERE v = 'X'")
      .as[(Long, String)].collect().toSeq
    assert(got == Seq((205L, "X")))
    assert(spark.sql(s"SELECT count(*) FROM $cat.t").as[Long].head == 40L)
  }

  test("expression DELETE removes fully-emptied groups without a rewrite") {
    val root = TestSpark.tmpDir("r12cowd")
    val dir = s"$root/t"
    (0 to 2).foreach { b =>
      ActionLog.append(
        spark.range(b * 100L, b * 100L + 10L).toDF("k")
          .withColumn("v", lit("a")).coalesce(1), dir, Some("k"))
    }
    val before = liveOf(dir)
    val cat = logCat(root, "d")
    // matches every row of exactly one group (k in [100,110))
    spark.sql(s"DELETE FROM $cat.t WHERE k >= 100 AND k < 200")
    val (_, removed) = ActionLog.actionsOf(spark, dir, 4L)
    assert(removed.size == 1, s"one group matched, got removed=$removed")
    assert((before - removed.head).subsetOf(liveOf(dir)))
    assert(spark.sql(s"SELECT count(*) FROM $cat.t").as[Long].head == 20L)
    assert(spark.sql(s"SELECT min(k), max(k) FROM $cat.t")
      .as[(Long, Long)].head == ((0L, 209L)))
  }

  test("8 concurrent SQL writers serialize through the OCC protocol") {
    import graft.ops.VersionedTable
    val root = TestSpark.tmpDir("r12occ8")
    val dir = s"$root/ns/t"
    val cat = logCat(root, "occ8")
    VersionedTable.write((0L until 10L).map(k => (k, "base")).toDF("k", "v"),
      dir)
    val nWriters = 8
    val pool = java.util.concurrent.Executors.newFixedThreadPool(nWriters)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    def keyCount(pred: String): Long =
      spark.sql(s"SELECT count(*) FROM $cat.ns.t WHERE $pred")
        .head.getLong(0)
    // every op retries until its EFFECT is visible: the protocol may
    // reject a stale attempt LOUDLY (that's the contract) and a winner
    // may still throw a transient post-commit error — so the client
    // probes `done` before re-issuing, exactly as a real retry loop must
    // on any system whose commit point precedes its acknowledgment
    def landed(label: String)(done: => Boolean)(op: => Unit): Unit = {
      var last: Throwable = null
      var ok = false
      var attempt = 0
      while (!ok && attempt < 20) {
        attempt += 1
        if (done) ok = true
        else {
          try { op; ok = true }
          catch { case scala.util.control.NonFatal(e) =>
            last = e; Thread.sleep(100) }
        }
      }
      if (!ok && !done)
        throw new RuntimeException(s"$label never landed: $last", last)
    }
    val inserted = java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()
    val futures =
      // six append writers, disjoint key ranges
      (0 until 6).map { w =>
        scala.concurrent.Future {
          (0 until 2).foreach { r =>
            val ks = (0 until 3).map(i => (w + 1) * 1000L + r * 10L + i)
            landed(s"insert w$w r$r")(
              keyCount(s"k IN (${ks.mkString(",")})") == ks.size) {
              spark.sql(s"INSERT INTO $cat.ns.t VALUES " +
                ks.map(k => s"($k, 'w$w')").mkString(", ")); ()
            }
            ks.foreach(k => { inserted.add(k); () })
          }
        }
      } :+
      // one delete writer: inserts its range, then DV-deletes half of it
      scala.concurrent.Future {
        val ks = (0 until 6).map(i => 7000L + i)
        landed("insert w7")(
          keyCount(s"k IN (${ks.mkString(",")})") == ks.size) {
          spark.sql(s"INSERT INTO $cat.ns.t VALUES " +
            ks.map(k => s"($k, 'w7')").mkString(", ")); ()
        }
        ks.take(3).foreach(k => { inserted.add(k); () })
        landed("delete w7")(keyCount("k >= 7003") == 0L) {
          spark.sql(s"DELETE FROM $cat.ns.t WHERE k >= 7003"); ()
        }
      } :+
      // one maintenance writer: content-preserving OPTIMIZE rewrites
      // (dataChange=false never hard-conflicts; double-landing after a
      // transient error is harmless by definition, so no done-probe)
      scala.concurrent.Future {
        (0 until 2).foreach { i =>
          landed(s"optimize $i")(false) {
            Occ.commit(spark, dir, Set("*"), dataChange = false)(
              snap => snap.get.coalesce(2)); ()
          }
        }
      }
    import scala.concurrent.duration._
    scala.concurrent.Await.result(
      scala.concurrent.Future.sequence(futures), 600.seconds)
    pool.shutdown()
    // SERIALIZABILITY: a contiguous, complete, readable history — no
    // gaps, no torn versions, no lost commits, losers self-cleaned
    val fs = fsOf(dir)
    val vs = VersionedTable.listVersions(fs, dir)
    assert(vs == (1L to vs.last) && vs.last >= 17L,
      s"contiguous history with every landed op a version: $vs")
    assert(vs.forall(v =>
      VersionedTable.complete(fs, VersionedTable.verDir(dir, v))))
    assert(Occ.sweepStages(spark, dir) == 0,
      "losers must clean their own stages")
    // FINAL CONTENT: base + all committed inserts − the delete's range,
    // exactly once each, regardless of interleaving
    import scala.jdk.CollectionConverters._
    val expected = (0L until 10L).toSet ++ inserted.asScala
    val got = spark.sql(s"SELECT k FROM $cat.ns.t").as[Long].collect().toSeq
    assert(got.size == got.distinct.size,
      s"no key may land twice: ${got.diff(got.distinct)}")
    assert(got.toSet == expected,
      s"content must be the serial fold: missing=${expected -- got.toSet} " +
        s"extra=${got.toSet -- expected}")
  }

  test("INSERT OVERWRITE captures as a lazy marker: no join, streamable") {
    import graft.ops.{ChangeFeed, VersionedTable}
    val root = TestSpark.tmpDir("r12ow")
    val dir = s"$root/ns/t"
    val cat = logCat(root, "ow")
    ChangeFeed.commit(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v"),
      dir, Seq("k"))
    spark.sql(s"INSERT OVERWRITE $cat.ns.t VALUES (2, 'b'), (9, 'z')") // v2
    val fs = fsOf(dir)
    assert(fs.exists(new org.apache.hadoop.fs.Path(
      VersionedTable.verDir(dir, 2L), ChangeFeed.OverwriteMarkerName)))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(
      VersionedTable.verDir(dir, 2L), "_cdf")),
      "the protocol-level capture writes zero bytes")
    // reading the capture plans NO JOIN against base data (the round-11
    // wrong-shape: the old form shuffled two whole tables per overwrite)
    val ch = ChangeFeed.tableChanges(spark, dir, 1L, 2L, Seq("k"))
    assert(ch.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }.isEmpty, "overwrite capture must expand without a join")
    // raw form = Delta's: every old row a delete, every new row an insert
    assert(ch.filter(col(ChangeFeed.ChangeType) === "delete")
      .select("k").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))
    assert(ch.filter(col(ChangeFeed.ChangeType) === "insert")
      .select("k").as[Long].collect().sorted.toSeq == Seq(2L, 9L))
    // net form = the round-9 contract: unchanged k=2 contributes nothing
    val net = ChangeFeed.netChanges(spark, dir, 1L, 2L, Seq("k"))
      .localCheckpoint()
    assert(net.count() == 3L)
    assert(net.filter(col(ChangeFeed.ChangeType) === "insert")
      .select("k").as[Long].collect().toSeq == Seq(9L))
    // replay folds the same-version delete+insert pair correctly
    val replayed = ChangeFeed.apply(None,
      ChangeFeed.tableChanges(spark, dir, 0L, 2L, Seq("k")), Seq("k"))
    val live = spark.sql(s"SELECT k, v FROM $cat.ns.t")
    assert(replayed.exceptAll(live).isEmpty && live.exceptAll(replayed).isEmpty)
    // and the NATIVE CDF stream expands the marker version
    val seen = collection.mutable.ArrayBuffer.empty[(String, Long)]
    val q = graft.source.CdfStream.read(spark, dir, startingVersion = Some(1L))
      .writeStream
      .option("checkpointLocation", TestSpark.tmpDir("r12ow-ckpt"))
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.select(col(ChangeFeed.ChangeType), col("k")).collect()
          .foreach(r => seen.synchronized {
            seen += r.getString(0) -> r.getLong(1)
          })
      }.start()
    try q.processAllAvailable() finally q.stop()
    assert(seen.sorted == Seq("delete" -> 1L, "delete" -> 2L, "delete" -> 3L,
      "insert" -> 2L, "insert" -> 9L).sorted,
      s"the stream must carry the expanded overwrite, got $seen")
  }

  test("bloom probes: driver and engine branches agree exactly") {
    import graft.ops.BloomIndex
    val root = TestSpark.tmpDir("r12bloomhy")
    val dataDir = s"$root/data"
    spark.range(0, 3000).toDF("k")
      .repartitionByRange(6, col("k")).sortWithinPartitions("k")
      .write.parquet(dataDir)
    BloomIndex.writeIndex(spark, dataDir, "k")
    val keys = Seq(7L, 1500L, 2999L).map(lit(_))
    val (small, totalS) = BloomIndex.selectFilesAll(spark, dataDir, keys)
    spark.conf.set(BloomIndex.DriverProbeMaxFilesConf, "1")
    val (large, totalL) =
      try BloomIndex.selectFilesAll(spark, dataDir, keys)
      finally spark.conf.unset(BloomIndex.DriverProbeMaxFilesConf)
    assert(totalS == totalL)
    // ORDER-INSENSITIVE equality per key: the engine branch's
    // collect_list carries no ordering guarantee, only membership
    assert(small.map(_.toSet) == large.map(_.toSet),
      s"the two probe branches must admit identical file sets:\n" +
        s"driver=$small\nengine=$large")
    // every key's holding file is admitted in both (zero false negatives)
    keys.indices.foreach { i =>
      assert(small(i).nonEmpty && large(i).nonEmpty)
    }
    // and the LOG-sidecar probe's two branches agree the same way
    val lt = s"$root/t"
    (0 to 2).foreach(b => ActionLog.append(
      spark.range(b * 1000L, b * 1000L + 1000L).toDF("k").coalesce(1),
      lt, Some("k")))
    BloomIndex.refresh(spark, lt, "k")
    val (pk1, idx1, live1) = BloomIndex.probeLog(spark, lt, "k", keys)
    spark.conf.set(BloomIndex.DriverProbeMaxFilesConf, "1")
    val (pk2, idx2, live2) =
      try BloomIndex.probeLog(spark, lt, "k", keys)
      finally spark.conf.unset(BloomIndex.DriverProbeMaxFilesConf)
    assert(idx1 == idx2 && live1 == live2)
    assert(pk1.map(_.toSet) == pk2.map(_.toSet),
      s"probeLog branches must agree:\ndriver=$pk1\nengine=$pk2")
  }

  test("the _file metadata column is queryable on log tables") {
    val root = TestSpark.tmpDir("r12file")
    val dir = s"$root/t"
    ActionLog.append(df(1L, 2L).coalesce(1), dir)
    ActionLog.append(df(3L).coalesce(1), dir)
    val cat = logCat(root, "f")
    val files = spark.sql(s"SELECT DISTINCT _file FROM $cat.t")
      .as[String].collect().toSet
    assert(files == liveOf(dir),
      s"_file must render each row's live source file: $files vs ${liveOf(dir)}")
  }
}
