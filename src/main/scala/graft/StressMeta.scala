package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.ActionLog

/** Metadata-plane stress rehearsal (diagnostic main, not part of the
  * driver contract) — the data plane has StressDedup; this is the same
  * discipline for the TABLE FORMAT layer: thousands of real commits on
  * one action-log table, proving the properties the 100 TB story rests
  * on with measured figures (recorded in SURVEY §8h):
  *
  *  - `resolve` stays O(checkpoint tail): latency and actions-replayed
  *    FLAT across 2 000+ commits when checkpoints land every K commits —
  *    never O(total history);
  *  - `compactLog` bounds the tail between checkpoints;
  *  - `history` (DESCRIBE HISTORY) is one incremental pass — O(total
  *    actions), not O(versions × replay);
  *  - catalog `loadTable` + a SQL count stay flat as the log grows;
  *  - `vacuum` at depth drops thousands of records in one bounded pass.
  *
  * Run: `sbt 'runMain graft.StressMeta'`; SPARK_GRAFT_STRESS_COMMITS
  * overrides the commit count (default 2000).
  */
object StressMeta {

  private def timed[A](label: String)(f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    val dt = (System.nanoTime() - t0) / 1e9
    println(f"[stress-meta] $label%-52s ${dt}%8.3f s")
    (a, dt)
  }

  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_STRESS_COMMITS", "2000").toInt
    val ckptEvery = 250
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 4) // 1-row commits
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val root = java.nio.file.Files.createTempDirectory("stress-meta").toString
    val table = s"$root/t"
    println(s"[stress-meta] $n commits, checkpoint every $ckptEvery, at $table")

    // ---- commit storm: 1-row appends with write-time stats ----
    val milestones = Seq(n / 4, n / 2, n).filter(_ > 0).distinct
    val (_, ingestS) = timed(s"$n appends (+${n / ckptEvery} 4-part checkpoints)") {
      (1 to n).foreach { i =>
        ActionLog.append(Seq((i.toLong, i.toLong * 2)).toDF("k", "v")
          .coalesce(1), table, statsCol = Some("k"))
        if (i % ckptEvery == 0) { ActionLog.checkpoint(spark, table, parts = 4); () }
        if (milestones.contains(i)) {
          val ((files, replayed, ckpt), dt) =
            timed(f"resolve at $i%5d commits") {
              ActionLog.resolve(spark, table, i.toLong)
            }
          println(f"[stress-meta]   -> files=${files.size}%5d replayed=$replayed%4d ckptBase=$ckpt dt=$dt%.3f")
          require(replayed <= ckptEvery,
            s"resolve must replay only the post-checkpoint tail, got $replayed")
        }
      }
    }
    println(f"[stress-meta] mean commit cost ${ingestS / n * 1000}%.1f ms")

    // ---- the tail between checkpoints folds to O(1) with compactLog ----
    val lastCkpt = (n / ckptEvery) * ckptEvery
    if (lastCkpt < n) {
      timed(s"compactLog(${lastCkpt + 1}, $n)") {
        ActionLog.compactLog(spark, table, lastCkpt + 1L, n.toLong)
      }
    }
    val ((_, replayedNet, _), resolveNetS) = timed("resolve after compaction") {
      ActionLog.resolve(spark, table, n.toLong)
    }
    println(s"[stress-meta]   -> replayed=$replayedNet (net tail)")

    // ---- DESCRIBE HISTORY: one pass over the whole log ----
    val (h, histS) = timed(s"history over $n versions") {
      ActionLog.history(spark, table)
    }
    require(h.size == n && h.last._5.contains(n.toLong),
      s"history must render every version with exact cumulative rows, " +
        s"got ${h.size} rows, cum ${h.last._5}")

    // ---- catalog latency: loadTable + SQL count, flat at depth ----
    spark.conf.set("spark.sql.catalog.stressmeta",
      classOf[graft.source.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.stressmeta.root", root)
    val (_, coldS) = timed("catalog SELECT count(*) (cold)") {
      spark.sql("SELECT count(*) FROM stressmeta.t").head.getLong(0)
    }
    val (cnt, warmS) = timed("catalog SELECT count(*) (warm)") {
      spark.sql("SELECT count(*) FROM stressmeta.t").head.getLong(0)
    }
    require(cnt == n.toLong, s"catalog count must see all $n commits, got $cnt")

    // ---- log-carried pruning at depth: point band over 2 000 files ----
    val (prune, pruneS) = timed("readWhere band [10, 19] over the log") {
      val (df, kept, total) = ActionLog.readWhere(spark, table, "k", 10L, 19L)
      (df.count(), kept, total)
    }
    println(s"[stress-meta]   -> rows=${prune._1} kept=${prune._2}/${prune._3}")
    require(prune._1 == 10L && prune._2 <= 12,
      s"log stats must prune ~${prune._3 - 10} of ${prune._3} files, " +
        s"kept ${prune._2}")

    // ---- vacuum at depth: drop 90% of the records in one bounded pass
    // (append-only history: every file is still live, so records drop
    // but no file can die yet)
    val keep = math.max(1, n / 10)
    val ((dropped, deleted), vacS) = timed(s"vacuum keep=$keep (grace 0)") {
      ActionLog.vacuum(spark, table, keepVersions = keep, graceMs = 0L)
    }
    println(s"[stress-meta]   -> droppedRecords=$dropped filesDeleted=$deleted")
    require(deleted == 0, "append-only history must lose no live file")
    // ---- OPTIMIZE the n tiny files into 8, then retire the originals:
    // the small-files lifecycle a drip-fed 100 TB table lives by
    val live = ActionLog.resolve(spark, table,
      ActionLog.versions(spark, table).last)._1
    val (_, optS) = timed(s"compactFiles ${live.size} -> 8") {
      ActionLog.compactFiles(spark, table, live, numFiles = 8,
        statsCol = Some("k"))
    }
    val ((dropped2, deleted2), vac2S) = timed("vacuum keep=1 (grace 0)") {
      ActionLog.vacuum(spark, table, keepVersions = 1, graceMs = 0L)
    }
    println(s"[stress-meta]   -> droppedRecords=$dropped2 filesDeleted=$deleted2")
    require(deleted2 == live.size,
      s"post-compaction vacuum must retire every folded file, " +
        s"got $deleted2 of ${live.size}")
    val ((_, replayedPost, _), resolvePostS) = timed("resolve after vacuum") {
      ActionLog.resolve(spark, table,
        ActionLog.versions(spark, table).last)
    }
    require(ActionLog.read(spark, table).count() == n.toLong,
      "maintenance must never change live content")

    println(f"""[stress-meta] SUMMARY commits=$n ingest=${ingestS}%.1fs """ +
      f"""resolveNet=${resolveNetS}%.3fs/$replayedNet hist=${histS}%.1fs """ +
      f"""cold=${coldS}%.2fs warm=${warmS}%.2fs prune=${pruneS}%.2fs """ +
      f"""vacuum=${vacS}%.1fs optimize=${optS}%.1fs vacuum2=${vac2S}%.1fs """ +
      f"""resolvePost=${resolvePostS}%.3fs/$replayedPost""")
    spark.stop()
  }
}
