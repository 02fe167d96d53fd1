package graft.similarity

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.ActionLog

/** PERSISTED IVF index, maintained under DML — the round-8 gap closed:
  * the coarse quantizer and the cell assignments are DURABLE ActionLog
  * tables, built once and refreshed in O(delta) as the corpus grows,
  * instead of re-derived per query (which at 100 TB re-clusters the
  * corpus on every search).
  *
  * Layout under an index root (both tables on the log plane, so vacuum /
  * checkpoint / time travel apply to the INDEX like any other table):
  *
  *   root/centroids   (cell INT-ish, centroid ARRAY<DOUBLE>, ctn DOUBLE)
  *   root/assign      (id, cell, vector) — one row per corpus vector
  *
  * `assign` is a COVERING inverted file (round-13; the round-12 form held
  * only (id, cell) and [[search]] joined the FULL corpus against it —
  * scan-the-world per query batch, exactly what a persisted index exists
  * to avoid). It carries the vector itself — the standard IVF shape: the
  * inverted lists ARE the storage — and is written RANGE-LAID-OUT BY
  * CELL with per-file cell stats in the log, so a search plans a read of
  * only the probed cells' files straight from the log's metadata: zero
  * footers opened for unprobed cells, the corpus table untouched. At
  * 100 TB an nprobe=8 search over 4096 cells reads ~0.2 % of the index
  * and none of the corpus. Legacy (id, cell) indexes keep the join path.
  *
  * The quantizer is [[Knn.voronoiAssign]]'s (seed-partition centroids,
  * max-cosine assignment, ties to the lowest cell): centroids are
  * decimal-exact positional means, so the index is DETERMINISTIC — an
  * oracle can replay build + refresh + search bit-for-bit (q319).
  *
  * Freshness contract: [[refresh]] assigns ONLY the delta against the
  * FROZEN quantizer — one broadcast join over the delta, one O(delta)
  * append (itself cell-laid-out, so probe pruning survives refreshes;
  * [[ActionLog.optimizeClustered]] re-compacts a refresh-fragmented cell
  * band incrementally). Assignments never move (the IVF invariant that
  * makes probe routing consistent: queries and corpus route through the
  * same centroids). Re-training (a new centroid version) is a rebuild —
  * deliberate, versioned, and visible in the log's history.
  */
object IvfIndex {

  private def centDir(root: String) = s"$root/centroids"
  private def assignDir(root: String) = s"$root/assign"

  /** EXACT one-band-per-file layout: each distinct cell value maps to
    * its own partition (and so its own file, with tight lo==hi stats)
    * through a driver-collected cell index — bounded by |cells|, the
    * quantity that is small by design — and an explicit RDD partitioner.
    * `repartitionByRange` is NOT this: its sampled bounds on adjacent
    * near-balanced keys are a coin flip between separating them and
    * dumping both in one file (measured on q321's sub-cell split, and
    * visible in q319's build logs as cells 1–2 sharing a file), and
    * every spanning file is a file [[probeFiles]] must admit for BOTH
    * cells' probes forever after. The rare justified RDD drop-down: the
    * DataFrame API exposes no exact partitioner. At 100 TB an append
    * batch's per-cell slice is bounded by the batch, not the table, so
    * one file per (batch × cell) holds.
    */
  private def exactCellLayout(df: DataFrame, cellUniverse: Seq[Long])
      : DataFrame = {
    val spark = df.sparkSession
    val cells = cellUniverse.distinct.sorted
    val idxB = spark.sparkContext.broadcast(cells.zipWithIndex.toMap)
    val schema = df.schema
    val at = schema.fieldIndex("cell")
    val prdd = df.rdd
      .map(r => (idxB.value(r.get(at).asInstanceOf[Number].longValue), r))
      .partitionBy(new org.apache.spark.Partitioner {
        override def numPartitions: Int = math.max(1, cells.length)
        override def getPartition(key: Any): Int = key.asInstanceOf[Int]
      })
      .map(_._2)
    spark.createDataFrame(prdd, schema)
  }

  /** Lay `assigned` out one file per cell and record per-file cell stats
    * when the cell type is integral — the layout [[search]]'s file
    * pruning reads. `cellUniverse` is the quantizer's cell set (already
    * driver-resident in every caller, so the layout costs no extra scan;
    * a superset is fine — empty cells write no file). A non-integral
    * cell column still works (range-ish layout, no stats, conservative
    * full-index probe scan).
    */
  private def appendByCell(assigned: DataFrame, dir: String,
      cellUniverse: Seq[Any]): Long = {
    val integralCell = assigned.schema("cell").dataType match {
      case org.apache.spark.sql.types.ByteType |
        org.apache.spark.sql.types.ShortType |
        org.apache.spark.sql.types.IntegerType |
        org.apache.spark.sql.types.LongType => true
      case _ => false
    }
    val laid =
      if (integralCell) exactCellLayout(assigned,
        cellUniverse.map(_.asInstanceOf[Number].longValue))
      else assigned
        .repartitionByRange(math.max(1, cellUniverse.size), col("cell"))
        .sortWithinPartitions(col("cell"))
    ActionLog.append(laid, dir,
      statsCol = if (integralCell) Some("cell") else None)
  }

  /** Build the index from the current corpus: seed cells from `seedCol`,
    * one Voronoi step, persist quantizer + covering assignments. Returns
    * (centroid version, assign version) — both 1 on a fresh root.
    */
  def build(corpus: DataFrame, root: String, idC: String, vecCol: String,
      seedCol: String): (Long, Long) = {
    val (assigned, cents) = Knn.voronoiAssign(corpus, seedCol, idC, vecCol)
    val cellVals = cents.select(col("cell"))
      .collect().map(_.get(0)).toSeq // |cells| rows — bounded by design
    val cv = ActionLog.append(
      cents.select(col("cell"), col("centroid"), col("__ctn").as("ctn"))
        .coalesce(1), // |cells| rows — one file, broadcast at probe time
      centDir(root))
    val av = appendByCell(
      assigned.select(col(idC), col("cell"), col(vecCol)),
      assignDir(root), cellVals)
    (cv, av)
  }

  /** O(delta) maintenance: assign `delta` under the frozen quantizer and
    * append, cell-laid-out. The corpus table itself is NOT read — the
    * index cost of an append is proportional to the append.
    */
  def refresh(delta: DataFrame, root: String, idC: String,
      vecCol: String): Long = {
    val spark = delta.sparkSession
    val cents = ActionLog.read(spark, centDir(root))
      .withColumnRenamed("ctn", "__ctn")
    val v = delta.select(col(idC), col(vecCol))
      .withColumn("__vn", Knn.norm(col(vecCol)))
    val scored = v.crossJoin(broadcast(cents))
      .select(col(idC), col("cell"),
        (Knn.dot(col(vecCol), col("centroid")) / (col("__vn") * col("__ctn")))
          .as("__csim"))
    // the same tie rule as the build assignment (csim desc, cell asc)
    val assigned = graft.plans.TopK.perGroup(scored, Seq(idC),
      Seq("__csim" -> true, "cell" -> false), 1)
      .select(col(idC), col("cell"))
    val covering = delta.select(col(idC), col(vecCol))
      .join(assigned, Seq(idC))
      .select(col(idC), col("cell"), col(vecCol))
    appendByCell(covering, assignDir(root),
      cents.select(col("cell")).collect().map(_.get(0)).toSeq)
  }

  /** QUANTIZER-DRIFT MAINTENANCE (round 15 — the last 100-TB design gap
    * in the ANN surface): [[refresh]] assigns deltas against a frozen
    * coarse quantizer forever, so under distribution drift a hot cell
    * grows without bound and probe selectivity decays toward a corpus
    * scan. `rebalance` splits every cell whose LIVE row count exceeds
    * `maxCellRows` into `branch` sub-cells via one local k-means step
    * (Lloyd, EUCLIDEAN assignment) over THAT CELL's rows only: seeds are
    * the cell's `branch` lowest-id member vectors (deterministic), each
    * row groups to its min-distance seed, sub-centroids are the groups'
    * decimal-exact positional means ([[Knn.centroids]] — [[build]]'s
    * discipline), and rows re-assign to their min-distance sub-centroid
    * (ties to the lowest sub-cell).
    *
    * Two measured-on-this-corpus design constraints (q321's fixture):
    * the SUB-ASSIGNMENT must be euclidean, because these vectors carry a
    * strong common direction, so a COSINE comparison against two local
    * anchors is dominated by the 1/‖m‖ scaling of that shared component
    * and a hair's-width norm difference reassigns essentially the whole
    * cell to one side (a 2208-row hot cell split 2207-vs-1) — while the
    * euclidean rule is the balanced hyperplane through the midpoint of
    * the anchors. And the COMMITTED sub-centroids must be the group
    * MEANS, not raw member vectors: queries route through the global
    * centroid table by cosine, where means sit close to the retired hot
    * centroid and win the hot blob's probes as a pair (nprobe≥2 probes
    * both sub-cells, so recall is independent of which sub-cell holds
    * the row) — a raw member vector's residual drags its cosine below
    * OTHER cells' centroids and the probe routes away entirely
    * (measured: recall@1 fell to 0.4).
    *
    * Never a corpus re-cluster: cost is O(hot cells' rows); cold cells'
    * files are carried BY REFERENCE (zero bytes moved —
    * [[ActionLog.replaceFiles]] removes exactly the hot bands' files).
    *
    * Hot-cell detection is log-metadata-first: per-file (lo, hi, n) cell
    * stats give exact counts for single-cell files, and only files whose
    * band SPANS cells (rare — [[appendByCell]] writes ~one file per
    * cell) are read to attribute their rows.
    *
    * Commits: one [[ActionLog.replaceFiles]] on `assign` (hot bands →
    * re-keyed, cell-laid-out replacements), then one versioned rewrite
    * of the |cells|-row `centroids` table. Like any two-table
    * maintenance, the pair is not atomic — a reader pinning one `asOf`
    * for both tables (the [[search]] contract) sees a consistent index;
    * the brief live window between the commits routes the split cells'
    * probes to an empty band. Returns (old cell → new cell ids), empty
    * (and commit-free) when nothing is hot, so scheduled rebalancing
    * converges like [[ActionLog.optimizeClustered]].
    *
    * ORPHAN ADOPTION (the rebalance↔refresh race): a [[refresh]] that
    * read the quantizer before a rebalance retired one of its cells
    * commits rows keyed to a centroid that no longer exists — rows no
    * probe will ever route to. `rebalance` repairs this as part of the
    * same commit: any assigned cell ABSENT from the centroid table is
    * re-keyed against the quantizer this call publishes (max-cosine,
    * ties to the lowest cell — [[refresh]]'s own rule) and its files
    * join the partial rewrite. Adopted cells report as
    * `(orphanCell, Nil)` in the result. Until the repair runs,
    * [[search]] fails LOUDLY on orphan-banded files rather than
    * silently losing recall.
    */
  def rebalance(spark: SparkSession, root: String, maxCellRows: Long,
      branch: Int = 2): Seq[(Long, Seq[Long])] = {
    import graft.plans.TopK
    require(branch >= 2, "rebalance: branch must be >= 2")
    require(maxCellRows >= branch, "rebalance: maxCellRows must be >= branch")
    val aDir = assignDir(root)
    val live = ActionLog.liveFiles(spark, aDir)
    require(live.forall(_._2.isDefined),
      s"IvfIndex.rebalance($root): every live assign file needs cell stats")
    // exact per-cell counts from the log alone for single-cell files;
    // only cell-spanning files (rare by layout) are read
    val singleCounts = live.collect {
      case (_, Some((lo, hi, n))) if lo == hi => lo -> n
    }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val spanning = live.collect { case (f, Some((lo, hi, _))) if lo != hi => f }
    val spanCounts: Map[Long, Long] =
      if (spanning.isEmpty) Map.empty
      else spark.read.parquet(spanning.map(f => s"$aDir/data/$f"): _*)
        .groupBy(col("cell")).agg(count(lit(1)).as("n"))
        .collect() // |cells touched by spanning files| rows — bounded
        .map(r => r.get(0).asInstanceOf[Number].longValue -> r.getLong(1))
        .toMap
    val counts = (singleCounts.keySet ++ spanCounts.keySet).map(c =>
      c -> (singleCounts.getOrElse(c, 0L) + spanCounts.getOrElse(c, 0L)))
    val centCellVals = ActionLog.read(spark, centDir(root))
      .select(col("cell"))
      .collect() // |cells| rows — bounded by design
      .map(_.get(0).asInstanceOf[Number].longValue).toSet
    // hot = oversized LIVE cells (split); orphan = assigned cells whose
    // centroid is gone (adopt) — a refresh that raced a prior rebalance
    val hot = counts.collect {
      case (c, n) if n > maxCellRows && centCellVals(c) => c
    }.toSeq.sorted
    val orphanCells = counts.map(_._1).filterNot(centCellVals).toSeq.sorted
    if (hot.isEmpty && orphanCells.isEmpty) return Seq.empty
    // the hot and orphan bands' files — the ONLY files this touches
    val touched = (hot ++ orphanCells).toSet
    val targets = live.collect {
      case (f, Some((lo, hi, _)))
        if touched.exists(c => c >= lo && c <= hi) => f
    }
    val content = spark.read.parquet(targets.map(f => s"$aDir/data/$f"): _*)
    val cols = content.columns
    require(cols.length == 3 && cols(1) == "cell",
      s"IvfIndex.rebalance($root): expected a covering (id, cell, vector) " +
        s"index, got ${cols.toSeq}")
    val (idC, vecCol) = (cols(0), cols(2))
    val cellType = content.schema("cell").dataType
    val hotRows = content.filter(col("cell").isin(hot: _*)).localCheckpoint()
    val orphanRows = content.filter(col("cell").isin(orphanCells: _*))
    val keepRows = content
      .filter(!col("cell").isin(hot: _*))
      .filter(!col("cell").isin(orphanCells: _*))
    // seeds: each hot cell's `branch` lowest-id member vectors, ranked
    // 1..branch — the deterministic k-means initialization
    val maxCell = centCellVals.max
    val seeds = TopK.perGroup(
      hotRows.select(col("cell"), col(idC), col(vecCol)),
      Seq("cell"), Seq(idC -> false), branch)
      .select(col("cell"), col("rank").as("__grp"),
        col(vecCol).as("__sv"))
    // squared euclidean distance — the balanced assignment rule (see doc)
    def d2(x: org.apache.spark.sql.Column, c: org.apache.spark.sql.Column) =
      Knn.dot(x, x) - lit(2) * Knn.dot(x, c) + Knn.dot(c, c)
    // group to the min-distance seed (ties → lowest group)
    val grouped = TopK.perGroup(
      hotRows.join(broadcast(seeds), Seq("cell"))
        .select(col(idC), col("cell"), col(vecCol), col("__grp"),
          d2(col(vecCol), col("__sv")).as("__d2")),
      Seq(idC), Seq("__d2" -> false, "__grp" -> false), 1)
      .select(col(idC), col("cell"), col(vecCol), col("__grp"))
      .localCheckpoint() // read by the mean, key, and reassign passes
    // sub-centroids: decimal-exact positional means per (cell, group)
    val subCents = Knn.centroids(
      grouped.withColumn("__skey",
        concat_ws("_", col("cell"), col("__grp"))),
      "__skey", vecCol)
    // new GLOBAL cell ids: maxCell + 1.. in (cell, group) order —
    // deterministic and collision-free against every existing cell
    val keyRows = grouped.select(col("cell"), col("__grp")).distinct()
      .collect() // ≤ |hot| × branch rows
      .map(r => (r.get(0).asInstanceOf[Number].longValue,
        r.get(1).asInstanceOf[Number].longValue))
      .sorted
    val newIds = keyRows.zipWithIndex.map { case ((c, g), i) =>
      (s"${c}_$g", c, maxCell + 1 + i)
    }
    val idMap = spark.createDataFrame(newIds.toSeq)
      .toDF("__skey", "__oldCell", "__newCell")
    val subKeyed = subCents.join(broadcast(idMap), Seq("__skey"))
      .localCheckpoint() // ≤ |hot| × branch rows; read by 2 consumers
    // re-assign every hot row to its min-distance sub-centroid (ties →
    // lowest sub-cell) — only among ITS OWN cell's sub-centroids (the
    // split is local; a row never migrates across old cell boundaries,
    // which keeps the maintenance O(hot) and the oracle replay tractable)
    val reassigned = TopK.perGroup(
      hotRows.join(broadcast(subKeyed
          .withColumnRenamed("__oldCell", "cell")
          .select(col("cell"), col("__newCell"), col("centroid"))),
        Seq("cell"))
        .select(col(idC), col("__newCell"), col(vecCol),
          d2(col(vecCol), col("centroid")).as("__d2")),
      Seq(idC), Seq("__d2" -> false, "__newCell" -> false), 1)
      .select(col(idC), col("__newCell").cast(cellType).as("cell"), col(vecCol))
    // the quantizer THIS COMMIT publishes: surviving cells + sub-cells —
    // adoption must route against it, or an orphan adopted into a cell
    // retired in this very call would orphan right back
    val cents = ActionLog.read(spark, centDir(root))
    val published = cents.filter(!col("cell").isin(hot: _*))
      .unionByName(subKeyed
        .select(col("__newCell").cast(cells0Type(cents)).as("cell"),
          col("centroid"), Knn.norm(col("centroid")).as("ctn")))
      .localCheckpoint() // |cells| rows; quantizer for adoption + commit
    // adopt orphans under refresh's own rule: max-cosine, ties low
    val adopted =
      if (orphanCells.isEmpty) keepRows.limit(0)
      else {
        val v = orphanRows.withColumn("__vn", Knn.norm(col(vecCol)))
        TopK.perGroup(
          v.drop("cell").crossJoin(broadcast(published
              .select(col("cell"), col("centroid"),
                col("ctn").as("__ctn"))))
            .select(col(idC), col("cell"),
              (Knn.dot(col(vecCol), col("centroid")) /
                (col("__vn") * col("__ctn"))).as("__csim"),
              col(vecCol)),
          Seq(idC), Seq("__csim" -> true, "cell" -> false), 1)
          .select(col(idC), col("cell").cast(cellType).as("cell"),
            col(vecCol))
      }
    val replacement = keepRows.select(col(idC), col("cell"), col(vecCol))
      .unionByName(reassigned.select(col(idC), col("cell"), col(vecCol)))
      .unionByName(adopted.select(col(idC), col("cell"), col(vecCol)))
    // probe selectivity IS the product here, so the band→file mapping
    // must be exact — see exactCellLayout's doc for why
    // repartitionByRange cannot be trusted with a split's adjacent
    // near-balanced sub-cells (measured: the same build flip-flopped
    // between {1051, 1157}-row files and one 2208-row file across runs).
    // The band universe: carried cells in the touched files (a distinct
    // over the O(touched) target files only) plus the published
    // quantizer's cells (a superset is fine — empty cells write no file).
    val keepCells = keepRows.select(col("cell")).distinct()
      .collect().map(_.get(0).asInstanceOf[Number].longValue).toSeq
    val publishedCells = published.select(col("cell"))
      .collect().map(_.get(0).asInstanceOf[Number].longValue).toSeq
    val laid = exactCellLayout(replacement, keepCells ++ publishedCells)
    // assign first, centroids second: the sub-centroids derive from rows
    // the first commit makes durable; a reader pinning one asOf for both
    // tables (the search contract) sees a consistent index
    ActionLog.replaceFiles(spark, aDir, targets, laid, statsCol = Some("cell"))
    // orphan-only repairs leave the quantizer untouched — no empty version
    if (hot.nonEmpty)
      ActionLog.rewrite(published.coalesce(1), centDir(root), 1)
    hot.map(c => c -> newIds.collect { case (_, oc, nid) if oc == c => nid }.toSeq) ++
      orphanCells.map(c => c -> Seq.empty[Long])
  }

  private def cells0Type(cents: DataFrame) = cents.schema("cell").dataType

  /** The distinct cells a query batch probes — |queries| × nprobe rows
    * upper-bounded by |cells|; the driver-side collect is the planning
    * step that turns probes into a FILE LIST.
    */
  private def probedCells(queries: DataFrame, cents: DataFrame, idQ: String,
      vecCol: String, nprobe: Int): Seq[Any] = {
    val q = queries.select(col(idQ).as("query_id"), col(vecCol).as("__qv"))
      .withColumn("__qn", Knn.norm(col("__qv")))
    val scored = q.crossJoin(broadcast(cents))
      .select(col("query_id"), col("cell"),
        (Knn.dot(col("__qv"), col("centroid")) / (col("__qn") * col("__ctn")))
          .as("__csim"))
    graft.plans.TopK.perGroup(scored, Seq("query_id"),
      Seq("__csim" -> true, "cell" -> false), nprobe)
      .select(col("cell")).distinct()
      .collect().map(_.get(0)).toSeq
  }

  /** The probed-cell file plan against the log's per-file stats:
    * (files to read, total live files). Stats-less files are admitted
    * conservatively; integral cells prune to the probed bands only.
    */
  private[graft] def probeFiles(spark: SparkSession, root: String,
      cells: Seq[Any], asOf: Long = Long.MaxValue): (Seq[String], Int) = {
    val live = ActionLog.liveFilesAt(spark, assignDir(root), asOf)
    if (!cells.forall(_.isInstanceOf[Number]))
      (live.map(_._1), live.size) // non-integral cells: no stats, no pruning
    else {
      val longs = cells.map(_.asInstanceOf[Number].longValue)
      val kept = live.collect {
        case (f, Some((lo, hi, _))) if longs.exists(c => c >= lo && c <= hi) => f
        case (f, None) => f
      }
      (kept, live.size)
    }
  }

  /** Probe the PERSISTED index: quantizer and assignments come from disk,
    * and with a covering index the scan touches ONLY the probed cells'
    * files — the corpus contributes nothing (it is accepted for the
    * legacy (id, cell) layout, which must still join it). Same output
    * shape as [[Knn.ivfTopK]]. `asOf` time-travels the whole index (both
    * tables) — searching yesterday's index over yesterday's corpus is one
    * argument, because the index is data.
    */
  def search(queries: DataFrame, corpus: DataFrame, root: String,
      idQ: String, idC: String, vecCol: String, k: Int, nprobe: Int,
      asOf: Long = Long.MaxValue): DataFrame = {
    val spark = queries.sparkSession
    val cents = ActionLog.read(spark, centDir(root), asOf)
      .withColumnRenamed("ctn", "__ctn")
    val assign = ActionLog.read(spark, assignDir(root), asOf)
    if (assign.columns.contains(vecCol)) {
      // ORPHAN GUARD: an assign file keyed to a cell the centroid table
      // (at this asOf) no longer carries is unreachable by ANY probe — a
      // refresh that raced a rebalance (see rebalance's doc). Refusing
      // loudly here is the q286-default pattern: name the repair rather
      // than silently lose recall. Integral lo==hi bands only (the exact
      // layout); stats-less or spanning legacy files stay conservative.
      val centCells: Set[Long] = cents.select(col("cell")).collect()
        .flatMap(_.get(0) match {
          case n: Number => Some(n.longValue); case _ => None
        }).toSet
      if (centCells.nonEmpty) {
        val orphaned = ActionLog.liveFilesAt(spark, assignDir(root), asOf)
          .collect {
            case (f, Some((lo, hi, _))) if lo == hi && !centCells(lo) => f
          }
        require(orphaned.isEmpty,
          s"IvfIndex.search($root): ${orphaned.size} assign file(s) are " +
            "keyed to retired cells — a refresh raced a rebalance; run " +
            "IvfIndex.rebalance to adopt them (skipping them would " +
            s"silently lose recall): ${orphaned.take(3).mkString(", ")}")
      }
      // covering index: plan the probed cells' files from the log stats,
      // read only those, and re-apply the exact cell predicate (pruning
      // is an optimization, never a correctness bet)
      val cells = probedCells(queries, cents, idQ, vecCol, nprobe)
      val (files, _) = probeFiles(spark, root, cells, asOf)
      val inverted =
        if (files.isEmpty) assign.filter(lit(false))
        else spark.read.parquet(
          files.map(f => s"${assignDir(root)}/data/$f"): _*)
      val probedOnly = inverted.filter(col("cell").isin(cells: _*))
      Knn.ivfSearch(queries, probedOnly, cents, idQ, idC, vecCol, "cell",
        k, nprobe)
    } else {
      // legacy (id, cell) index: the corpus supplies the vectors
      val a = assign.withColumnRenamed(idC, "__aid")
      val c = corpus.join(a, corpus(idC) === col("__aid")).drop("__aid")
      Knn.ivfSearch(queries, c, cents, idQ, idC, vecCol, "cell", k, nprobe)
    }
  }

  /** The index's coverage vs a corpus snapshot: (indexed ids, corpus
    * rows) — a cheap staleness probe callers can gate a search on.
    */
  def coverage(spark: SparkSession, root: String,
      corpus: DataFrame, idC: String): (Long, Long) =
    (ActionLog.read(spark, assignDir(root)).count(), corpus.count())
}
