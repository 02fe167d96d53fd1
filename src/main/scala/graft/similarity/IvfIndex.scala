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
  *   root/assign      (id, cell) — one row per corpus vector
  *
  * The quantizer is [[Knn.voronoiAssign]]'s (seed-partition centroids,
  * max-cosine assignment, ties to the lowest cell): centroids are
  * decimal-exact positional means, so the index is DETERMINISTIC — an
  * oracle can replay build + refresh + search bit-for-bit (q319).
  *
  * Freshness contract: [[refresh]] assigns ONLY the delta against the
  * FROZEN quantizer — one broadcast join over the delta, one O(delta)
  * append. Assignments never move (the IVF invariant that makes probe
  * routing consistent: queries and corpus route through the same
  * centroids). Re-training (a new centroid version) is a rebuild —
  * deliberate, versioned, and visible in the log's history.
  */
object IvfIndex {

  private def centDir(root: String) = s"$root/centroids"
  private def assignDir(root: String) = s"$root/assign"

  /** Build the index from the current corpus: seed cells from `seedCol`,
    * one Voronoi step, persist quantizer + assignments. Returns
    * (centroid version, assign version) — both 1 on a fresh root.
    */
  def build(corpus: DataFrame, root: String, idC: String, vecCol: String,
      seedCol: String): (Long, Long) = {
    val (assigned, cents) = Knn.voronoiAssign(corpus, seedCol, idC, vecCol)
    val cv = ActionLog.append(
      cents.select(col("cell"), col("centroid"), col("__ctn").as("ctn"))
        .coalesce(1), // |cells| rows — one file, broadcast at probe time
      centDir(root))
    val av = ActionLog.append(assigned.select(col(idC), col("cell")),
      assignDir(root))
    (cv, av)
  }

  /** O(delta) maintenance: assign `delta` under the frozen quantizer and
    * append. The corpus table itself is NOT read — the index cost of an
    * append is proportional to the append.
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
    ActionLog.append(assigned, assignDir(root))
  }

  /** Probe the PERSISTED index: quantizer and assignments come from disk,
    * the corpus contributes only the probed cells' vectors. Same output
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
      .withColumnRenamed(idC, "__aid")
    val c = corpus.join(assign, corpus(idC) === col("__aid")).drop("__aid")
    Knn.ivfSearch(queries, c, cents, idQ, idC, vecCol, "cell", k, nprobe)
  }

  /** The index's coverage vs a corpus snapshot: (indexed ids, corpus
    * rows) — a cheap staleness probe callers can gate a search on.
    */
  def coverage(spark: SparkSession, root: String,
      corpus: DataFrame, idC: String): (Long, Long) =
    (ActionLog.read(spark, assignDir(root)).count(), corpus.count())
}
