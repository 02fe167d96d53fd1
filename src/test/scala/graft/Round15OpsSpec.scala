package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.VersionedTable

/** Round-15 pins.
  *
  * The adversarial-fixture sweep (round-14 verdict #5) demands proof that
  * the key-local multi-file fixtures actually DETECT the bug class they
  * guard: `graft.dev.unsafeRowLevelPruning=1` re-introduces the round-13
  * pruned-COW-scan defect behind a dev knob, and the fixture must go red
  * under it — rows lost, counts down — then green again the moment the
  * knob lifts. A fixture that stays green under the planted bug is
  * decoration, not a guard.
  */
class Round15OpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fsOf(dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def registerCat(root: String, tag: String): String = {
    val cat = s"graftr15$tag"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.source.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    spark.conf.set(s"spark.sql.catalog.$cat.features", "deletion-vectors")
    cat
  }

  test("key-local fixtures turn RED under the planted rowLevel-pruning bug") {
    def build(tag: String): (String, String) = {
      val root = TestSpark.tmpDir(s"r15knob$tag")
      val dir = s"$root/ns/t"
      VersionedTable.write(
        spark.range(0L, 30L).toDF("k").withColumn("v", lit("a"))
          .repartitionByRange(3, col("k")), dir) // 3 key-ranged files
      val files = fsOf(dir).listStatus(VersionedTable.verDir(dir, 1L)).toSeq
        .filter(st => st.isFile && !st.getPath.getName.startsWith("_") &&
          !st.getPath.getName.startsWith("."))
      assert(files.size >= 3, s"fixture must span >=3 files: $files")
      (root, dir)
    }
    // knob ON: the COW scan forwards the WHERE into row-group pruning and
    // the replacement snapshot silently loses the pruned files' rows —
    // the exact round-13 escape, now DETECTED by the key-local layout
    val (rootBad, _) = build("bad")
    val catBad = registerCat(rootBad, "bad")
    sys.props("graft.dev.unsafeRowLevelPruning") = "1"
    try {
      spark.sql(s"UPDATE $catBad.ns.t SET v = 'B' WHERE k = 25")
      val n = spark.sql(s"SELECT count(*) FROM $catBad.ns.t").as[Long].head
      assert(n < 30L,
        s"the planted pruning bug must LOSE rows on a key-local base " +
          s"(got $n of 30) — if this holds 30, the fixture cannot detect " +
          "the bug class and the guard is dead")
    } finally sys.props.remove("graft.dev.unsafeRowLevelPruning")
    // knob OFF on a fresh twin: full fidelity
    val (rootOk, _) = build("ok")
    val catOk = registerCat(rootOk, "ok")
    spark.sql(s"UPDATE $catOk.ns.t SET v = 'B' WHERE k = 25")
    assert(spark.sql(s"SELECT count(*) FROM $catOk.ns.t").as[Long].head == 30L)
    assert(spark.sql(s"SELECT k FROM $catOk.ns.t WHERE v = 'B'")
      .as[Long].collect().toSeq == Seq(25L))
  }

  // ---- ActionLog.replaceFiles: the partial-rewrite primitive behind
  // IvfIndex.rebalance — removes exactly its targets, carries everything
  // else by reference, re-records stats, and conflicts loudly when a
  // target left the live set.
  test("replaceFiles rewrites exactly its targets and re-records stats") {
    import graft.ops.ActionLog
    val dir = TestSpark.tmpDir("r15repl") + "/t"
    ActionLog.append(spark.range(0L, 10L).toDF("cell").coalesce(1), dir,
      statsCol = Some("cell")) // v1: one file, cells 0-9
    ActionLog.append(spark.range(10L, 20L).toDF("cell").coalesce(1), dir,
      statsCol = Some("cell")) // v2: one file, cells 10-19
    val live1 = ActionLog.liveFiles(spark, dir)
    assert(live1.size == 2 && live1.forall(_._2.isDefined))
    val target = live1.collect {
      case (f, Some((lo, _, _))) if lo == 0L => f
    }
    assert(target.size == 1)
    // replace the low band with re-keyed content (cells 100-109)
    val v3 = ActionLog.replaceFiles(spark, dir, target,
      spark.range(100L, 110L).toDF("cell").coalesce(1),
      statsCol = Some("cell"))
    assert(v3 == 3L)
    val (adds, rems) = ActionLog.actionsOf(spark, dir, 3L)
    assert(rems == target && adds.size == 1,
      s"remove exactly the targets: $rems / $adds")
    val live2 = ActionLog.liveFiles(spark, dir)
    // the untouched band's FILE survives by name (carried by reference)
    val carried = live1.map(_._1).filterNot(target.toSet)
    assert(carried.forall(live2.map(_._1).toSet),
      s"untouched files must stay live: $carried vs $live2")
    // stats re-recorded for the replacement file
    assert(live2.exists { case (_, st) => st.exists(s => s._1 == 100L &&
      s._2 == 109L && s._3 == 10L) }, s"replacement stats: $live2")
    assert(ActionLog.read(spark, dir).as[Long].collect().sorted.toSeq ==
      ((10L until 20L) ++ (100L until 110L)))
    // time travel still reads the removed file's content
    assert(ActionLog.read(spark, dir, asOf = 2L).as[Long]
      .collect().sorted.toSeq == (0L until 20L))
    // a target that left the live set conflicts LOUDLY
    val e = intercept[IllegalArgumentException] {
      ActionLog.replaceFiles(spark, dir, target,
        spark.range(0L, 1L).toDF("cell"), statsCol = Some("cell"))
    }
    assert(e.getMessage.contains("left the live set"))
  }

  // ---- the rebalance↔refresh race: a refresh that read the quantizer
  // before a rebalance retired one of its cells commits rows no probe
  // will ever route to. Search must REFUSE loudly (naming the repair),
  // and rebalance must ADOPT the orphans — re-keyed under the live
  // quantizer, searchable again — without minting a pointless centroid
  // version for an orphan-only repair.
  test("orphaned assignments fail loudly at search and adopt at rebalance") {
    import graft.ops.ActionLog
    import graft.similarity.IvfIndex
    val root = TestSpark.tmpDir("r15orphan") + "/ivf"
    val df = spark.range(0L, 100L).toDF("vec_id")
      .withColumn("label", (col("vec_id") < 48).cast("int"))
      .withColumn("embedding", array((0 until 8).map(j =>
        sin(col("vec_id") * (j + 1) + lit(0.5)) +
          col("label").cast("double") * 3.0): _*))
    IvfIndex.build(df, root, "vec_id", "embedding", seedCol = "label")
    // split BOTH cells (cap below either cell's count) -> cells 0,1 retire
    val res1 = IvfIndex.rebalance(spark, root, maxCellRows = 30)
    assert(res1.map(_._1) == Seq(0L, 1L) && res1.forall(_._2.size == 2))
    // the racing refresh: rows keyed to RETIRED cell 0 land in the log
    // (noisy copies of corpus rows, new ids)
    val orphan = df.filter(col("vec_id") < 10)
      .select((col("vec_id") + 1000L).as("vec_id"),
        lit(0).cast("int").as("cell"),
        transform(col("embedding"), x => x + lit(0.01)).as("embedding"))
    ActionLog.append(orphan.coalesce(1), s"$root/assign",
      statsCol = Some("cell"))
    // search refuses loudly and names the repair
    val q = orphan.filter(col("vec_id") === 1003L)
      .select((col("vec_id") + 4000L).as("vec_id"), col("embedding"))
    val e = intercept[IllegalArgumentException] {
      IvfIndex.search(q, df, root, "vec_id", "vec_id", "embedding",
        k = 1, nprobe = 2).collect()
    }
    assert(e.getMessage.contains("rebalance") &&
      e.getMessage.contains("retired"), e.getMessage)
    // orphan-only repair: one assign commit, NO new centroid version
    val cv = ActionLog.versions(spark, s"$root/centroids")
    val av = ActionLog.versions(spark, s"$root/assign")
    val res2 = IvfIndex.rebalance(spark, root, maxCellRows = 1000)
    assert(res2 == Seq(0L -> Seq.empty[Long]), s"adoption report: $res2")
    assert(ActionLog.versions(spark, s"$root/centroids") == cv,
      "an orphan-only repair must not mint a centroid version")
    assert(ActionLog.versions(spark, s"$root/assign").size == av.size + 1)
    // adopted rows are searchable: the exact orphan vector finds ITS row
    val got = IvfIndex.search(q, df, root, "vec_id", "vec_id", "embedding",
      k = 1, nprobe = 2).collect()
    assert(got.length == 1 &&
      got.head.getAs[Long]("neighbor_id") == 1003L,
      s"adopted orphan must be the top hit: ${got.toSeq}")
    // and the repair converges: nothing left to adopt or split
    assert(IvfIndex.rebalance(spark, root, maxCellRows = 1000).isEmpty)
  }

  // ---- the exact one-band-per-file layout: every IVF assign file must
  // carry exactly one cell (lo == hi stats), including the adjacent
  // near-balanced pair that repartitionByRange flip-flopped on (the
  // q321 flake class). Three fresh builds pin determinism.
  test("IVF layout writes one band per file, deterministically") {
    import graft.ops.ActionLog
    import graft.similarity.IvfIndex
    // two labels, near-balanced (48/52), vectors spread enough that the
    // voronoi assignment keeps both cells populated
    val df = spark.range(0L, 100L).toDF("vec_id")
      .withColumn("label", (col("vec_id") < 48).cast("int"))
      .withColumn("embedding", array((0 until 8).map(j =>
        sin(col("vec_id") * (j + 1) + lit(0.5)) +
          col("label").cast("double") * 3.0): _*))
    (1 to 3).foreach { i =>
      val root = TestSpark.tmpDir(s"r15band$i") + "/ivf"
      IvfIndex.build(df, root, "vec_id", "embedding", seedCol = "label")
      val live = ActionLog.liveFiles(spark, s"$root/assign")
      assert(live.nonEmpty && live.forall {
        case (_, Some((lo, hi, n))) => lo == hi && n > 0
        case _ => false
      }, s"every assign file must hold exactly one cell: $live")
      assert(live.map(_._2.get._1).distinct.size == live.size,
        s"one file per cell, no cell split across files: $live")
    }
  }

  // ---- found by LifecycleFuzzSpec's type-widening campaign: the shared
  // DSv2 read support refused ShortType/ByteType columns ("unsupported
  // change-column type") although the type-widening plane admits
  // SMALLINT/TINYINT epochs — a legitimate table the SQL surface could
  // not read. Parquet stores narrow integrals as annotated INT32; the
  // converters now exist.
  test("catalog SQL reads SMALLINT/TINYINT columns (narrow-integral epochs)") {
    import graft.ops.{TypeWidening => TW}
    val root = TestSpark.tmpDir("r15short")
    val df = spark.range(0L, 50L).toDF("k")
      .selectExpr("CAST(k AS SMALLINT) AS a", "CAST(k % 5 AS TINYINT) AS b",
        "k")
    TW.init(df, s"$root/w")
    val cat = registerCat(root, "short")
    val got = spark.sql(s"SELECT sum(a), sum(b), count(*) FROM $cat.w")
      .head
    assert(got.getLong(0) == (0L until 50L).sum &&
      got.getLong(1) == (0L until 50L).map(_ % 5).sum && got.getLong(2) == 50L)
    // and the widened read still renders the narrow epoch losslessly
    spark.sql(s"ALTER TABLE $cat.w ALTER COLUMN a TYPE INT")
    assert(spark.sql(s"SELECT sum(a) FROM $cat.w").head.getLong(0) ==
      (0L until 50L).sum)
  }

  // ---- found by LifecycleFuzzSpec (seed 1501, op#4): INSERT OVERWRITE
  // on the log layout shed the recorded stats column — the ONE statement
  // whose rewrite path skipped statsCol. Stale stats silently end
  // log-carried pruning, and stats-dependent maintenance
  // (optimizeClustered, IVF rebalance planning) refuses the table loudly.
  test("log-layout INSERT OVERWRITE re-records per-file stats") {
    import graft.ops.ActionLog
    val root = TestSpark.tmpDir("r15ow")
    val dir = s"$root/t"
    ActionLog.append(Seq((1L, 10L), (2L, 20L)).toDF("k", "v").coalesce(1),
      dir, Some("k"))
    val cat = registerCat(root, "ow")
    Seq((3L, 30L), (4L, 40L)).toDF("k", "v").createOrReplaceTempView("r15owv")
    spark.sql(s"INSERT OVERWRITE $cat.t SELECT k, v FROM r15owv")
    val live = ActionLog.liveFiles(spark, dir)
    assert(live.nonEmpty && live.forall(_._2.isDefined),
      s"overwrite must re-record stats on every replacement file: $live")
    // stats-dependent maintenance keeps working across the overwrite
    ActionLog.optimizeClustered(spark, dir)
    assert(spark.sql(s"SELECT sum(v) FROM $cat.t").head.getLong(0) == 70L)
  }
}
