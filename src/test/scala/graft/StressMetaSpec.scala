package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.ActionLog

/** SCALE-PROOF for the driver-resident metadata paths (round 16 #5).
  *
  * The IVF band layout, the log-carried pruning planner, and checkpoint
  * resolution all hold a FILE/CELL INDEX on the driver and claim
  * O(files)/O(cells) bounds in their doc comments. At the test SFs those
  * structures hold a few dozen entries, so a hidden O(files²) step or an
  * accidental per-file footer open would never show. This spec builds a
  * 100,000-file / 10,000-cell action log out of METADATA ONLY — the log
  * records are written directly in the `_log/NNNNNNNN.json` add-action
  * format with recorded (lo, hi, n) stats; only ONE real data file exists
  * (the catalog's single schema-probe footer) — and pins planning time
  * and driver-heap growth for:
  *
  *   - `ActionLog.liveFiles` (the replay that every planner starts from);
  *   - `stateDfAt` (checkpoint-bounded log resolution as a DataFrame);
  *   - a PRUNED catalog SQL scan plan (the band predicate must keep only
  *     the band's files, planned without opening any data footer — the
  *     99,990 pruned files do not exist, so any accidental open throws);
  *   - `IvfIndex.probeFiles` (the probe planning surface);
  *   - `IvfIndex.rebalance` with nothing hot (the hot-cell detection
  *     pass: per-cell counts from log stats alone, zero data reads).
  *
  * Time bounds are deliberately loose (VM noise) — the regression class
  * this guards is super-linear blowup (100k² steps, 100k footer opens),
  * which lands minutes-to-hours over the bound, not 20 %.
  */
class StressMetaSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val Cells = 10000
  private val FilesPerCell = 10 // 100,000 files
  private val RowsPerFile = 100L

  /** Write a synthetic single-commit log of Cells × FilesPerCell add
    * actions (one exact band per file, the IVF/appendByCell layout).
    */
  private def writeSyntheticLog(dir: String): Unit = {
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new Path(s"$dir/_log"))
    val sb = new StringBuilder(Cells * FilesPerCell * 64)
    (0 until Cells).foreach { c =>
      (0 until FilesPerCell).foreach { i =>
        sb.append(s"""{"a":"add","p":"part-c$c-$i.parquet","lo":$c,"hi":$c,"n":$RowsPerFile}""")
          .append('\n')
      }
    }
    val out = fs.create(new Path(s"$dir/_log/00000001.json"), true)
    try out.write(sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    val sc = fs.create(new Path(s"$dir/_log/_statscol"), true)
    try sc.write("k".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally sc.close()
  }

  private def timed[T](body: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = body
    (r, (System.nanoTime() - t0) / 1e9)
  }

  private def usedHeap(): Long = {
    System.gc(); System.gc()
    Runtime.getRuntime.totalMemory - Runtime.getRuntime.freeMemory
  }

  test("100k-file log: planning stays O(files) metadata, zero data reads") {
    val root = TestSpark.tmpDir("stressmeta")
    val dir = s"$root/big"
    writeSyntheticLog(dir)

    // --- liveFiles: the replay every planner starts from -------------
    val heap0 = usedHeap()
    val (live, tLive) = timed(ActionLog.liveFiles(spark, dir))
    val heap1 = usedHeap()
    info(f"liveFiles(100k): ${tLive}%.2f s, heap +${(heap1 - heap0) / 1e6}%.0f MB")
    assert(live.size == Cells * FilesPerCell)
    assert(live.forall(_._2.isDefined), "every synthetic file carries stats")
    assert(tLive < 30.0, f"liveFiles over 100k files took ${tLive}%.1f s " +
      "— the replay is no longer O(files) metadata")
    // each entry is a name + 3 longs; 100k of them is tens of MB. A
    // super-linear structure (pairs, per-file copies of the file list)
    // lands far above this.
    assert(heap1 - heap0 < 512L * 1024 * 1024,
      f"liveFiles retained ${(heap1 - heap0) / 1e6}%.0f MB for 100k entries")

    // --- rowCountFromLog: pure stats fold ----------------------------
    val (cnt, tCnt) = timed(ActionLog.rowCountFromLog(spark, dir))
    info(f"rowCountFromLog: ${tCnt}%.2f s")
    assert(cnt.contains(Cells * FilesPerCell * RowsPerFile))
    assert(tCnt < 30.0)

    // --- stateDfAt: log resolution as a DataFrame --------------------
    val (n, tState) = timed(
      ActionLog.stateDfAt(spark, dir, 1L).filter(col("a") === "add").count())
    info(f"stateDfAt(100k).count: ${tState}%.2f s")
    assert(n == Cells * FilesPerCell)
    assert(tState < 45.0, f"stateDfAt took ${tState}%.1f s")

    // --- pruned catalog SQL scan plan ---------------------------------
    // the ONE real data file: the catalog opens exactly one footer for
    // the table schema (liveFiles.head) — everything else never exists
    val probeName = ActionLog.liveFiles(spark, dir).head._1
    Seq((0L, 1L)).toDF("k", "v").coalesce(1)
      .write.mode("overwrite").parquet(s"$root/_probe")
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new Path(s"$dir/data"))
    val part = fs.listStatus(new Path(s"$root/_probe"))
      .map(_.getPath).find(_.getName.endsWith(".parquet")).get
    fs.rename(part, new Path(s"$dir/data/$probeName"))

    val cat = s"graftstress${StressMetaSpec.catN.incrementAndGet()}"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.source.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val (parts, tPlan) = timed {
        val df = spark.sql(s"SELECT k FROM $cat.big WHERE k = 4242")
        val scan = df.queryExecution.executedPlan.collect {
          case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
        }.head
        scan.inputPartitions
      }
      info(f"pruned scan plan: ${tPlan}%.2f s, ${parts.size} partitions kept")
      assert(parts.size == FilesPerCell,
        s"the k=4242 band holds $FilesPerCell files; the planner kept " +
          s"${parts.size} of 100k — pruning broke or opened the world")
      assert(tPlan < 30.0, f"scan planning took ${tPlan}%.1f s over 100k files")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)

    // --- IVF probe + rebalance planning over the same shape ----------
    // assign = a second synthetic 100k-file band log; centroids = a REAL
    // (small) table of 10k cells, as rebalance/search read it wholesale
    val ivfRoot = s"$root/ivf"
    writeSyntheticLog(s"$ivfRoot/assign")
    val cents = (0 until Cells).map { c =>
      (c.toLong, Array.tabulate(8)(j => (c % 97 + j).toDouble).toSeq, 1.0)
    }.toDF("cell", "centroid", "ctn")
    ActionLog.append(cents.coalesce(1), s"$ivfRoot/centroids")

    val (probed, tProbe) = timed(graft.similarity.IvfIndex.probeFiles(
      spark, ivfRoot, Seq(1234L, 5678L)))
    info(f"probeFiles(2 cells of 10k): ${tProbe}%.2f s, ${probed._1.size} files")
    assert(probed._1.size == 2 * FilesPerCell && probed._2 == Cells * FilesPerCell)
    assert(tProbe < 30.0, f"probe planning took ${tProbe}%.1f s")

    // nothing hot at this cap (each cell holds 1,000 rows): the hot-cell
    // detection must conclude from the log stats alone and touch ZERO
    // data files (none exist to touch — an accidental read throws)
    val (moves, tReb) = timed(graft.similarity.IvfIndex.rebalance(
      spark, ivfRoot, maxCellRows = 5000L))
    info(f"rebalance plan (nothing hot): ${tReb}%.2f s")
    assert(moves.isEmpty)
    assert(tReb < 45.0, f"rebalance planning took ${tReb}%.1f s")
  }
  /** TYPE-WIDENING CHAIN at depth (round-16 continuation of the same
    * scale question): the typed plane resolves a snapshot by walking the
    * `_prev` chain — O(epochs) driver fs reads per PLAN. Daily appends
    * between rewrites put real tables at hundreds of epochs, so this
    * builds a 300-epoch chain out of metadata (per-version `_types` /
    * `_prev` / `_SUCCESS` plus one byte-copied tiny data file each) and
    * pins: the chain walk + read plan stays seconds at depth 300, the
    * catalog resolves the same chain through SQL, and one
    * `TypeWidening.rewrite` COLLAPSES the chain to depth 1 — the
    * maintenance lever that bounds plan cost at 100 TB (chain depth =
    * appends since the last rewrite, never table age).
    */
  test("300-epoch type-widening chain: plan cost bounded, rewrite collapses it") {
    import graft.ops.{TypeWidening => TW, VersionedTable => VT}
    val root = TestSpark.tmpDir("stresstw")
    val dir = s"$root/w"
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // one real tiny file, byte-copied into every epoch
    Seq((0L, 1)).toDF("k", "a").coalesce(1)
      .write.mode("overwrite").parquet(s"$root/_seed")
    val seed = fs.listStatus(new Path(s"$root/_seed"))
      .map(_.getPath).find(_.getName.endsWith(".parquet")).get
    val Depth = 300
    (1 to Depth).foreach { v =>
      val vd = VT.verDir(dir, v.toLong)
      fs.mkdirs(new Path(vd, "data"))
      org.apache.hadoop.fs.FileUtil.copy(fs, seed, fs,
        new Path(s"$vd/data/part-0.parquet"), false,
        spark.sparkContext.hadoopConfiguration)
      def put(name: String, text: String): Unit = {
        val out = fs.create(new Path(vd, name), true)
        try out.write(text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        finally out.close()
      }
      put("_types", "k=bigint\na=int")
      if (v > 1) put("_prev", (v - 1).toString)
      fs.create(new Path(vd, "_SUCCESS"), true).close()
    }
    // pointer to the head (flipPointer is package-private to ops; the
    // highest complete version resolves identically without it)
    val (df, tWalk) = timed(TW.read(spark, dir))
    val (nFiles, tList) = timed(df.inputFiles.length)
    info(f"chain walk (depth $Depth): ${tWalk}%.2f s; file listing: " +
      f"${tList}%.2f s, $nFiles files")
    assert(nFiles == Depth, s"every epoch contributes its file: $nFiles")
    assert(tWalk + tList < 30.0,
      f"a $Depth-epoch chain cost ${tWalk + tList}%.1f s to plan — " +
        "the walk is no longer O(epochs) metadata")
    // the same chain through the catalog SQL surface
    val cat = s"graftstress${StressMetaSpec.catN.incrementAndGet()}"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.source.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    val (cnt, tSql) = timed(
      spark.sql(s"SELECT count(*) FROM $cat.w").head.getLong(0))
    info(f"catalog count over the chain: ${tSql}%.2f s")
    assert(cnt == Depth.toLong)
    assert(tSql < 60.0)
    // maintenance: ONE rewrite collapses the chain — the next plan walks
    // a single version (coalesced: the rewrite keeps the caller's
    // partitioning, and a 300-partition union would mint 300 tiny files)
    TW.rewrite(TW.read(spark, dir).coalesce(4), dir)
    val (df2, tAfter) = timed {
      val d = TW.read(spark, dir); (d, d.inputFiles.length)
    }
    info(f"post-rewrite plan: ${tAfter}%.2f s, ${df2._2} file(s)")
    assert(df2._2 < Depth / 2,
      "the rewrite must materialize the chain into few files")
    assert(tAfter < 10.0,
      f"post-rewrite plan cost ${tAfter}%.1f s — the chain did not collapse")
    // history intact: a mid-chain version still reads under its own chain
    assert(TW.readVersion(spark, dir, 150L).count() == 150L)
  }

  /** THE MILLION-FILE REGIME (round 17 #4): q320's scaladoc names the
    * scale killer — at a million files the DRIVER replay is unaffordable
    * per plan, and the parquet-checkpoint plane's distributed resolution
    * (`stateDfAt`/`resolveDf`) is the answer. This probe builds a
    * 1,000,000-file state as a DISTRIBUTED parquet checkpoint (a Spark
    * job writes it; the driver never holds the million rows) plus a tiny
    * JSON tail, and pins BOTH halves of the contract:
    *
    *   - `resolveDf` resolves and prunes the million-file inventory as a
    *     Spark job in bounded time with bounded driver-heap growth —
    *     callers collect only the pruned survivors (here: one cell's
    *     100 files of 1M);
    *   - the driver-resident path (`liveFiles`) REFUSES the table loudly
    *     at `ActionLog.DriverReplayMaxFiles`, naming the distributed
    *     twins — instead of silently materializing a quarter-GB of
    *     driver heap per plan (the documented handoff).
    */
  test("1M-file log: resolveDf plans through the parquet checkpoint; " +
      "driver replay hands off") {
    val root = TestSpark.tmpDir("stressmeta1m")
    val dir = s"$root/huge"
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new Path(s"$dir/_log"))
    def put(name: String, text: String): Unit = {
      val out = fs.create(new Path(s"$dir/_log/$name"), true)
      try out.write(text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
    }
    // v1 exists as a one-line action file; its content is superseded by
    // the same-version checkpoint that seeds every resolution
    put("00000001.json",
      """{"a":"add","p":"part-c0-0.parquet","lo":0,"hi":0,"n":100}""")
    put("_statscol", "k")
    val N = 1000000L
    val PerCell = 100L
    // the 1M-row checkpoint, written by a SPARK JOB (driver O(1)) in the
    // stateDfAt column contract: one exact [cell, cell] band per file
    spark.range(N).select(
      lit("add").as("a"),
      concat(lit("part-c"), (col("id") / PerCell).cast("long"), lit("-"),
        (col("id") % PerCell).cast("long"), lit(".parquet")).as("p"),
      (col("id") / PerCell).cast("long").as("lo"),
      (col("id") / PerCell).cast("long").as("hi"),
      lit(100L).as("n"),
      lit(null).cast("string").as("app"),
      lit(null).cast("long").as("batch"))
      .coalesce(8)
      .write.parquet(s"$dir/_log/00000001.checkpoint.parquet")
    // a json tail on top of the checkpoint: 2 removes + 1 add at v2
    put("00000002.json", Seq(
      """{"a":"remove","p":"part-c0-0.parquet"}""",
      """{"a":"remove","p":"part-c0-1.parquet"}""",
      """{"a":"add","p":"part-fresh.parquet","lo":4242,"hi":4242,"n":5}""")
      .mkString("\n"))

    def usedHeap(): Long = {
      System.gc(); System.gc()
      Runtime.getRuntime.totalMemory - Runtime.getRuntime.freeMemory
    }
    // distributed resolution: full count, then a band-pruned collect
    val heap0 = usedHeap()
    val (total, tCount) = timed(ActionLog.resolveDf(spark, dir).count())
    val (kept, tPrune) = timed(ActionLog.resolveDf(spark, dir)
      .filter(col("lo") <= 4242L && col("hi") >= 4242L)
      .collect())
    val heap1 = usedHeap()
    info(f"resolveDf(1M): count ${tCount}%.2f s, pruned collect " +
      f"${tPrune}%.2f s -> ${kept.length} files, heap " +
      f"+${(heap1 - heap0) / 1e6}%.0f MB")
    assert(total == N - 2 + 1, s"checkpoint + tail must merge: $total")
    assert(kept.length == PerCell + 1, // cell 4242's files + the tail add
      s"band pruning over 1M files kept ${kept.length}")
    assert(tCount + tPrune < 120.0,
      f"distributed resolution cost ${tCount + tPrune}%.1f s at 1M files")
    // the pruned collect is what the caller holds: ~100 rows, never 1M.
    // Heap bound guards the DRIVER-O(1) claim (collect-the-world lands
    // ~250 MB here); GC noise on a shared JVM keeps it deliberately loose.
    assert(heap1 - heap0 < 192L * 1024 * 1024,
      f"resolveDf retained ${(heap1 - heap0) / 1e6}%.0f MB on the driver")
    // the driver-resident path hands off LOUDLY at the documented bound
    val res = scala.util.Try(ActionLog.liveFiles(spark, dir))
    assert(res.isFailure, "liveFiles over 1M files must refuse")
    val msg = res.failed.get.getMessage
    assert(msg.contains("resolveDf") &&
      msg.contains(ActionLog.DriverReplayMaxFiles.toString),
      s"the refusal must name the distributed twin and the bound: $msg")

    // MAINTENANCE at the million-file regime (round 18 #3): the driver
    // vacuum rides the refused replay — its refusal must now name the
    // distributed twin — and vacuumDistributed must actually maintain
    // the table: the referenced set resolves as a Spark job, the listing
    // streams through it in batches, and only the victims return to the
    // driver.
    val vres = scala.util.Try(ActionLog.vacuum(spark, dir, 1, graceMs = 0L))
    assert(vres.isFailure, "driver vacuum over 1M files must refuse")
    assert(vres.failed.get.getMessage.contains("vacuumDistributed"),
      s"the vacuum refusal must name the distributed twin: " +
        vres.failed.get.getMessage)
    // physical files: 2 UNREFERENCED (removed at v2), 1 orphan (never
    // logged), 2 live — the sweep must delete exactly the first three
    fs.mkdirs(new Path(s"$dir/data"))
    Seq("part-c0-0.parquet", "part-c0-1.parquet", "part-orphan.parquet",
      "part-fresh.parquet", "part-c4242-0.parquet").foreach { n =>
      fs.create(new Path(s"$dir/data/$n"), true).close()
    }
    val heapV0 = usedHeap()
    val ((vExpired, vVictims), tVac) = timed(
      ActionLog.vacuumDistributed(spark, dir, 1, graceMs = 0L,
        listBatch = 2)) // force multiple batches through the anti-join
    val heapV1 = usedHeap()
    info(f"vacuumDistributed(1M): ${tVac}%.2f s, expired $vExpired " +
      f"version(s), $vVictims victim file(s), heap " +
      f"+${(heapV1 - heapV0) / 1e6}%.0f MB")
    assert(vVictims == 3L,
      s"exactly the 2 unreferenced + 1 orphan must go: $vVictims")
    assert(vExpired == 1, s"v1 must expire: $vExpired")
    assert(fs.exists(new Path(s"$dir/data/part-fresh.parquet")) &&
      fs.exists(new Path(s"$dir/data/part-c4242-0.parquet")),
      "live files must survive the sweep")
    assert(!fs.exists(new Path(s"$dir/data/part-orphan.parquet")),
      "the orphan must be swept")
    assert(tVac < 120.0, f"distributed vacuum cost ${tVac}%.1f s at 1M files")
    // loose GC-noise bound, same discipline as the resolveDf pin: the
    // referenced set is cached on the EXECUTOR plane and unpersisted
    assert(heapV1 - heapV0 < 192L * 1024 * 1024,
      f"vacuumDistributed retained ${(heapV1 - heapV0) / 1e6}%.0f MB")
    // the table still resolves distributedly after maintenance, seeded
    // from the horizon checkpoint the vacuum wrote on the parquet plane
    assert(ActionLog.resolveDf(spark, dir).count() == N - 2 + 1,
      "post-vacuum resolution must match the pre-vacuum live set")

    // RE-CLUSTERING planning at 1M files (round 18, the same handoff
    // class as vacuum): every cell's 100 files share one [c, c] band, so
    // ~every file overlaps — the engine-side window pass must cluster
    // the million rows and hand the driver ONLY the capped target list
    // (whole clusters, largest first), in bounded time and heap.
    val heapC0 = usedHeap()
    val ((targets, totalOverlap), tClu) = timed(
      ActionLog.clusterTargetsDf(spark, dir, maxFiles = 500))
    val heapC1 = usedHeap()
    info(f"clusterTargetsDf(1M): ${tClu}%.2f s -> ${targets.size} capped " +
      f"targets of $totalOverlap overlapping, heap " +
      f"+${(heapC1 - heapC0) / 1e6}%.0f MB")
    assert(totalOverlap > 900000L,
      s"nearly every file shares a cell band: $totalOverlap")
    // whole-cluster greedy under the 500 cap: cell 4242 holds 101 files
    // (the tail add joins its band), cell 0 holds 98 (two removed), every
    // other cell 100 — largest-first admits 101 + 100 + 100 + 100, skips
    // further 100s (budget 99), then admits the trailing 98 = 499
    assert(targets.size == 499,
      s"the cap must round to WHOLE clusters, largest first: ${targets.size}")
    assert(tClu < 120.0, f"1M-file cluster planning cost ${tClu}%.1f s")
    assert(heapC1 - heapC0 < 192L * 1024 * 1024,
      f"clusterTargetsDf retained ${(heapC1 - heapC0) / 1e6}%.0f MB")
  }
}

object StressMetaSpec {
  private val catN = new java.util.concurrent.atomic.AtomicInteger(0)
}
