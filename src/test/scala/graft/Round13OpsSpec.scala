package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{ActionLog, DeletionVectors, VersionedTable}

/** Round-13 pins: the advisor's correctness fixes (COW no-runtime-filter
  * fallback, DV blob-sidecar fallback, legacy parquet-checkpoint names,
  * non-fatal post-commit auto-checkpoint) and the hidden-path read lint.
  */
class Round13OpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fsOf(dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def logCat(root: String, tag: String): String = {
    val cat = s"r13$tag"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.source.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    spark.conf.set(s"spark.sql.catalog.$cat.features", "deletion-vectors")
    cat
  }

  // ---- ADVICE: COW scan must read the UNPRUNED live set when the
  // runtime group filter never fires (conf off) — the commit is then a
  // whole-table replacement, and seeding from the stats-pruned set would
  // silently drop every pruned file's rows.
  test("row-level SQL loses no rows when runtime group filtering is off") {
    val conf = "spark.sql.optimizer.runtime.rowLevelOperationGroupFilter.enabled"
    val root = TestSpark.tmpDir("r13cowoff")
    val dir = s"$root/t"
    (0 to 3).foreach { b =>
      ActionLog.append(
        spark.range(b * 100L, b * 100L + 10L).toDF("k")
          .withColumn("v", lit("a")).coalesce(1), dir, Some("k"))
    }
    val cat = logCat(root, "cowoff")
    val prev = spark.conf.getOption(conf)
    spark.conf.set(conf, "false")
    try {
      // selective predicate: stats pruning would keep only b=2's file
      spark.sql(s"DELETE FROM $cat.t WHERE k = 205")
      assert(spark.sql(s"SELECT count(*) FROM $cat.t").as[Long].head == 39L,
        "rows in stats-pruned files must survive the fallback")
      assert(spark.sql(s"SELECT min(k), max(k) FROM $cat.t")
        .as[(Long, Long)].head == ((0L, 309L)))
      assert(spark.sql(s"SELECT count(*) FROM $cat.t WHERE k < 100")
        .as[Long].head == 10L)
    } finally prev match {
      case Some(v) => spark.conf.set(conf, v)
      case None => spark.conf.unset(conf)
    }
    // and WITH the filter on (the default), the same shape stays
    // group-granular: one more delete touches one file only
    val before = ActionLog.liveFiles(spark, dir).map(_._1).toSet
    spark.sql(s"DELETE FROM $cat.t WHERE k = 305")
    val vNow = ActionLog.versions(spark, dir).last
    val (_, removed) = ActionLog.actionsOf(spark, dir, vNow)
    assert(removed.size == 1, s"expected one replaced group, got $removed")
    assert(before.contains(removed.head))
    assert(spark.sql(s"SELECT count(*) FROM $cat.t").as[Long].head == 38L)
  }

  // ---- ADVICE: a DV version whose `_dvbm/` blob sidecar is missing
  // (legacy table, or a writer that skipped it) must fall back to the
  // canonical parquet sidecar instead of silently resurrecting rows.
  test("SQL DV read falls back to the parquet sidecar when _dvbm is missing") {
    val root = TestSpark.tmpDir("r13dvfb")
    val dir = s"$root/t"
    VersionedTable.write(
      (0L until 10L).map(k => (k, s"r$k")).toDF("k", "v"), dir)
    val (v2, n) = DeletionVectors.delete(spark, dir, col("k") < 3)
    assert(n == 3L)
    val fs = fsOf(dir)
    val blobDir = new Path(VersionedTable.verDir(dir, v2),
      DeletionVectors.BlobDirName)
    assert(fs.exists(blobDir))
    assert(fs.delete(blobDir, true))
    val cat = logCat(root, "dvfb")
    val got = spark.sql(s"SELECT k FROM $cat.t ORDER BY k")
      .as[Long].collect().toSeq
    assert(got == (3L until 10L).toSeq,
      s"deleted rows resurrected without the blob sidecar: $got")
  }

  // ---- ADVICE: legacy `_checkpoint-N.parquet` checkpoint dirs must stay
  // readable (the visible-name rename left them invisible to the regex;
  // the dir name itself is hidden to Spark's file index, so the reader
  // lists its part files explicitly).
  test("legacy parquet checkpoint name seeds replay after vacuum") {
    val root = TestSpark.tmpDir("r13ckpt")
    val dir = s"$root/t"
    (1 to 5).foreach { i =>
      ActionLog.append(
        spark.range(i * 10L, i * 10L + 10L).toDF("k").coalesce(1),
        dir, Some("k"))
    }
    val v = ActionLog.checkpointParquet(spark, dir)
    assert(v == 5L)
    val fs = fsOf(dir)
    val newName = new Path(s"$dir/_log/${"%08d".format(v)}.checkpoint.parquet")
    val legacy = new Path(s"$dir/_log/_checkpoint-${"%08d".format(v)}.parquet")
    assert(fs.rename(newName, legacy))
    ActionLog.append(spark.range(60L, 70L).toDF("k").coalesce(1),
      dir, Some("k"))
    // drop the pre-checkpoint log records: replay now NEEDS the legacy
    // checkpoint (without it the table is unreadable, not silently wrong)
    (1L to 5L).foreach(i =>
      fs.delete(new Path(s"$dir/_log/${"%08d".format(i)}.json"), false))
    assert(ActionLog.read(spark, dir).count() == 60L)
    assert(ActionLog.resolveDf(spark, dir).count() == 6L)
    val (df, kept, total) = ActionLog.readWhere(spark, dir, "k", 30L, 39L)
    assert(total == 6 && kept == 1 && df.count() == 10L)
  }

  // ---- ADVICE: the post-commit auto-checkpoint must never fail a commit
  // that already landed — a malformed interval conf degrades to the
  // default with a warning instead of throwing out of appendOcc.
  test("malformed auto-checkpoint interval does not fail a durable commit") {
    val root = TestSpark.tmpDir("r13ac")
    val dir = s"$root/t"
    spark.conf.set(ActionLog.AutoCheckpointConf, "not-a-number")
    try {
      val v = ActionLog.appendOcc(
        spark.range(0L, 5L).toDF("k").coalesce(1), dir)
      assert(v == 1L)
      assert(ActionLog.read(spark, dir).count() == 5L)
    } finally spark.conf.unset(ActionLog.AutoCheckpointConf)
  }

  // ---- ADVICE: duplicate blob-sidecar writers (speculative/retried
  // tasks) rename identical temp blobs into place — repeated deletes
  // (dest present across commits is impossible, but overwrite within a
  // fresh stage must still converge) stay correct end to end.
  test("repeated DV deletes compose through the renamed blob plane") {
    val root = TestSpark.tmpDir("r13dv2")
    val dir = s"$root/t"
    VersionedTable.write(
      (0L until 20L).map(k => (k, s"r$k")).toDF("k", "v"), dir)
    DeletionVectors.delete(spark, dir, col("k") < 5)
    DeletionVectors.delete(spark, dir, col("k") >= 15)
    val cat = logCat(root, "dv2")
    assert(spark.sql(s"SELECT count(*) FROM $cat.t").as[Long].head == 10L)
    assert(spark.sql(s"SELECT min(k), max(k) FROM $cat.t")
      .as[(Long, Long)].head == ((5L, 14L)))
  }

  // ---- Parquet-plane concurrency burn-in (round-13): the 8-writer OCC
  // stress predated the plane being hot everywhere. Here OCC appends run
  // WITH auto-checkpoint every 2nd commit AND a vacuum interleaving on
  // the same table, ≥20 iterations — checkpoint/append/vacuum
  // interleavings must never violate the contiguity contract or lose a
  // row. Vacuum keeps the default grace window (an in-flight commit's
  // staged files are never victims — the documented multi-writer rule).
  test("OCC appends under auto-checkpoint and concurrent vacuum: 20-round burn-in") {
    import graft.ops.ActionLog
    val root = TestSpark.tmpDir("r13burn")
    val dir = s"$root/t"
    spark.conf.set(ActionLog.AutoCheckpointConf, "2")
    try {
      ActionLog.append(
        spark.range(0L, 4L).toDF("k").coalesce(1), dir, Some("k"))
      val pool = java.util.concurrent.Executors.newFixedThreadPool(3)
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutor(pool)
      var appended = 4L
      (1 to 20).foreach { it =>
        val base = it * 1000L
        val fs = Seq(
          scala.concurrent.Future(ActionLog.appendOcc(
            spark.range(base, base + 2L).toDF("k").coalesce(1), dir,
            Some("k"))),
          scala.concurrent.Future(ActionLog.appendOcc(
            spark.range(base + 500L, base + 502L).toDF("k").coalesce(1),
            dir, Some("k")))) ++
          (if (it % 3 == 0)
            Seq(scala.concurrent.Future {
              ActionLog.vacuum(spark, dir, keepVersions = 5); 0L
            })
          else Nil)
        fs.foreach(f =>
          scala.concurrent.Await.result(f, scala.concurrent.duration.Duration(120, "s")))
        appended += 4L
      }
      pool.shutdown()
      // every committed row is live exactly once, through every
      // checkpoint/vacuum interleaving
      assert(ActionLog.read(spark, dir).count() == appended)
      assert(ActionLog.read(spark, dir).distinct().count() == appended)
      // the metadata plane replays cleanly at the head and at every
      // retained version (the contiguity contract)
      val vs = ActionLog.versions(spark, dir)
      assert(vs.size >= 5)
      vs.takeRight(5).foreach { v =>
        val n = ActionLog.resolveDf(spark, dir, v).count()
        assert(n > 0, s"v$v resolved empty")
      }
      // row count from recorded stats agrees with the data
      assert(ActionLog.rowCountFromLog(spark, dir).contains(appended))
    } finally spark.conf.unset(ActionLog.AutoCheckpointConf)
  }

  // ---- Row-group pruning inside the catalog's vectorized reader: a
  // pushed range/equality predicate reaches parquet-mr as a
  // FilterPredicate, so row groups whose stats exclude it are never
  // decoded. Pinned at the reader: a sorted 1M-row file in ~64KB row
  // groups delivers a small fraction of its rows for a point predicate,
  // and exactly all of them without one.
  test("pushed filters prune row groups in the vectorized catalog reader") {
    import org.apache.spark.sql.{sources => f}
    val dir = TestSpark.tmpDir("r13rg")
    spark.range(0L, 1000000L).toDF("k")
      .withColumn("v", (col("k") * 2).cast("long"))
      .coalesce(1).sortWithinPartitions("k")
      .write.option("parquet.block.size", (64 * 1024).toString)
      .parquet(s"$dir/t")
    val file = new Path(s"$dir/t").getFileSystem(
      spark.sparkContext.hadoopConfiguration)
      .listStatus(new Path(s"$dir/t"))
      .map(_.getPath).find(_.getName.startsWith("part-")).get.toString
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.LongType)))
    def rows(pushed: Seq[f.Filter]): Long = {
      val m = classOf[graft.source.GraftCatalog].getClassLoader
      val fac = {
        // package-private: construct via the source package test helper
        graft.source.TestReaderHook.columnarRows(schema, pushed, file)
      }
      fac
    }
    val all = rows(Nil)
    assert(all == 1000000L)
    val point = rows(Seq(f.EqualTo("k", 500000L)))
    assert(point < 100000L,
      s"point predicate decoded $point of 1000000 rows — no row-group skip")
    assert(point > 0L)
    val range = rows(Seq(f.And(f.GreaterThanOrEqual("k", 10000L),
      f.LessThan("k", 20000L))))
    assert(range < 150000L && range >= 10000L,
      s"range predicate decoded $range rows")
  }

  // ---- Hidden-path read lint (round-12's silent-data-loss class,
  // generalized): no spark.read of a literal whose final static segment
  // is a hidden-looking FILE name or a known-hidden log artifact.
  test("src/main carries no hidden-path spark.read and the lint bites") {
    val srcRoot = java.nio.file.Paths.get("src/main/scala")
    assume(java.nio.file.Files.exists(srcRoot), "run from the repo root")
    import scala.jdk.CollectionConverters._
    val files = java.nio.file.Files.walk(srcRoot).iterator().asScala
      .filter(_.toString.endsWith(".scala")).toSeq
    val hits = files.flatMap { f =>
      val text = new String(java.nio.file.Files.readAllBytes(f), "UTF-8")
      HiddenPathLint.findViolations(text).map(v => s"$f: $v")
    }
    assert(hits.isEmpty, s"hidden-path reads in src/main:\n${hits.mkString("\n")}")
    // the lint itself must bite: a deliberately-introduced hidden read
    val bad =
      """val df = spark.read.text(s"$dir/_log/_checkpoint-00000003.json")"""
    assert(HiddenPathLint.findViolations(bad).nonEmpty,
      "lint failed to flag a hidden checkpoint read")
    val bad2 = """spark.read.parquet(s"$d/.stage-7/part-0.parquet")"""
    assert(HiddenPathLint.findViolations(bad2).nonEmpty)
    // visible names and hidden DIRECTORY globs (which Spark's index does
    // expand) stay unflagged
    val ok = """spark.read.parquet(s"$root/_v-*/_cdf").schema"""
    assert(HiddenPathLint.findViolations(ok).isEmpty)
  }
}

/** Lints Scala source for `spark.read...(<literal>)` calls whose literal
  * path would be silently dropped by Spark's hidden-file filter: the
  * final STATIC segment starts with `_`/`.` and either looks like a file
  * (has an extension) or names a known-hidden log artifact. Hidden
  * DIRECTORY roots (`_cdf`, `_dv`) are expanded by globbing and list
  * their visible children, so they are not flagged.
  */
object HiddenPathLint {
  private val ReadCall =
    """(?:read|readStream)\s*\.\s*(?:parquet|text|json|csv|format\([^)]*\)\s*\.\s*load)\(\s*s?"([^"]*)"""".r
  private val KnownHidden =
    Seq("_checkpoint", "_last_checkpoint", "_compact-", "_statscol", ".stage")

  def findViolations(text: String): Seq[String] =
    ReadCall.findAllMatchIn(text).flatMap { m =>
      val lit = m.group(1)
      // last path segment, with interpolation holes blanked (a segment
      // whose PREFIX is an interpolation is dynamic — not statically
      // hidden)
      val cleaned = lit.replaceAll("\\$\\{[^}]*\\}", " ")
        .replaceAll("\\$[A-Za-z_][A-Za-z0-9_]*", " ")
      val bad = cleaned.split('/').exists { seg =>
        val hiddenStart = seg.startsWith("_") || seg.startsWith(".")
        val fileLike = seg.matches("[._][^/]*\\.[A-Za-z0-9]+")
        val known = KnownHidden.exists(seg.startsWith)
        hiddenStart && (fileLike || known)
      }
      if (bad) Some(lit) else None
    }.toSeq
}
