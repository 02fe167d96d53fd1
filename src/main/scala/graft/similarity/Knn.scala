package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.DotProduct

/** Approximate/exact nearest-neighbor search over an embedding column
  * (`ARRAY<FLOAT>`), plus embedding-based near-duplicate detection.
  *
  * Arithmetic contract: dot products run through the native
  * [[graft.functions.DotProduct]] expression — a codegen'd sequential fold in
  * index order with per-element widening to double, bit-identical to
  * `aggregate(zip_with(cast(a as array<double>), ...))` and to DuckDB's
  * `list_dot_product` on `DOUBLE[]`. Norms are precomputed once per vector
  * (not once per pair): `cos = dot(a,b) / (norm_a * norm_b)` evaluates the
  * exact same doubles as the naive per-pair form, ~3× fewer array traversals.
  *
  * Scale shapes:
  *  - [[bruteForceTopK]]: queries × corpus expansion — right answer for a
  *    broadcast-sized query set (the corpus never shuffles; the per-query
  *    top-k is a window over the query id). The exactness baseline every ANN
  *    variant is measured against.
  *  - [[ivfTopK]]: inverted-file search — corpus pre-bucketed into cells
  *    (the coarse quantizer is pluggable; the label column stands in exactly
  *    as a k-means cell id would), queries probe only `nprobe` nearest
  *    cells. At 100 TB the cell id becomes the partition key, so a probe
  *    touches only matching partitions (partition pruning).
  */
object Knn {

  /** In-order double dot product (native codegen'd expression). */
  def dot(a: Column, b: Column): Column = DotProduct(a, b)

  def norm(a: Column): Column = sqrt(DotProduct(a, a))

  /** Per-pair cosine; prefer the precomputed-norm form in joins. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k cosine neighbors for each query vector.
    * Output: (query_id, neighbor_id, cosine_sim, rank); ties broken by
    * neighbor id for determinism. Self-pairs excluded.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, idQ: String,
      idC: String, vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idQ).as("query_id"), col(vecCol).as("__qv"))
      .withColumn("__qn", norm(col("__qv")))
    val c = corpus.select(col(idC).as("neighbor_id"), col(vecCol).as("__cv"))
      .withColumn("__cn", norm(col("__cv")))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        (dot(col("__qv"), col("__cv")) / (col("__qn") * col("__cn"))).as("cosine_sim"))
    // bounded-heap top-k, O(corpus·log k) fixed memory — a window form would
    // fully sort every query's corpus-sized score list
    graft.plans.TopK.perGroup(scored, Seq("query_id"),
      Seq("cosine_sim" -> true, "neighbor_id" -> false), k)
  }

  /** Positional mean of a vector column per cell — the IVF "centroid" table.
    * Component sums are decimal-exact (order-independent under parallel
    * aggregation) and divided once in double, so centroids are deterministic.
    * Output: (cellCol, centroid ARRAY<DOUBLE>).
    */
  def centroids(corpus: DataFrame, cellCol: String, vecCol: String): DataFrame =
    corpus
      .select(col(cellCol), posexplode(col(vecCol).cast("array<double>")).as(Seq("__pos", "__v")))
      .groupBy(col(cellCol), col("__pos"))
      .agg((sum(col("__v").cast("decimal(27,10)")).cast("double") / count(lit(1))).as("__c"))
      .groupBy(col(cellCol))
      .agg(transform(
        array_sort(collect_list(struct(col("__pos"), col("__c")))),
        s => s.getField("__c")).as("centroid"))

  /** One Voronoi reassignment (a single Lloyd step): centroids seeded from
    * `seedCol`'s partition, then every vector reassigned to its max-cosine
    * centroid (ties → lowest cell id). This turns an arbitrary seed partition
    * into a real coarse quantizer: cells follow the cosine metric, so a
    * query's nearest cells actually contain its near neighbors — on data
    * whose labels carry no geometry (this corpus: within-label mean cosine ≈
    * cross-label ≈ 0), probing raw label cells is no better than probing at
    * random, while Voronoi cells put a planted near-duplicate in the same
    * probe set as its source (measured in q131).
    *
    * Scale: the centroid table is |cells| rows (broadcast); assignment is a
    * narrow broadcast join + per-vector top-1 — one corpus pass, no wide
    * shuffle. Returns (corpus + `cell` column, centroid table for probing).
    */
  def voronoiAssign(corpus: DataFrame, seedCol: String, idC: String,
      vecCol: String): (DataFrame, DataFrame) = {
    val cents = centroids(corpus, seedCol, vecCol)
      .withColumnRenamed(seedCol, "cell")
      .withColumn("__ctn", norm(col("centroid")))
    val v = corpus.select(col(idC), col(vecCol)).withColumn("__vn", norm(col(vecCol)))
    val scored = v.crossJoin(broadcast(cents))
      .select(col(idC), col("cell"),
        (dot(col(vecCol), col("centroid")) / (col("__vn") * col("__ctn"))).as("__csim"))
    val assigned = graft.plans.TopK.perGroup(scored, Seq(idC),
      Seq("__csim" -> true, "cell" -> false), 1)
      .select(col(idC), col("cell"))
    (corpus.join(assigned, Seq(idC)), cents)
  }

  /** IVF search: assign each query to its `nprobe` nearest cell centroids,
    * then brute-force only within those cells. Returns the same shape as
    * [[bruteForceTopK]] plus the probed cell. Recall < 1.0 by construction;
    * compare against the brute-force baseline to measure it (q131 guards it).
    */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, idQ: String, idC: String,
      vecCol: String, cellCol: String, k: Int, nprobe: Int): DataFrame = {
    val cents = centroids(corpus, cellCol, vecCol)
      .withColumn("__ctn", norm(col("centroid")))
    ivfSearch(queries, corpus, cents, idQ, idC, vecCol, cellCol, k, nprobe)
  }

  /** The probe+scan half of IVF against a PRE-BUILT quantizer: `cents` is
    * the centroid table (cellCol, centroid, __ctn) and `corpus` already
    * carries its cell assignment — so [[voronoiAssign]] output plugs in
    * directly, and the quantizer used to assign the corpus is the same one
    * that routes the queries (assignment/probe consistency is what recall
    * depends on).
    */
  def ivfSearch(queries: DataFrame, corpus: DataFrame, cents: DataFrame,
      idQ: String, idC: String, vecCol: String, cellCol: String, k: Int,
      nprobe: Int): DataFrame = {
    val q = queries.select(col(idQ).as("query_id"), col(vecCol).as("__qv"))
      .withColumn("__qn", norm(col("__qv")))
    // probe assignment: nprobe nearest centroids per query (centroid table is
    // tiny — broadcast both ways)
    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(col("__csim").desc, col(cellCol).asc)
    val probes = q.crossJoin(broadcast(cents))
      .select(col("query_id"), col("__qv"), col("__qn"), col(cellCol),
        (dot(col("__qv"), col("centroid")) / (col("__qn") * col("__ctn"))).as("__csim"))
      .withColumn("__pr", row_number().over(wProbe))
      .filter(col("__pr") <= nprobe)
      .select(col("query_id"), col("__qv"), col("__qn"), col(cellCol))
    val c = corpus.select(col(cellCol), col(idC).as("neighbor_id"), col(vecCol).as("__cv"))
      .withColumn("__cn", norm(col("__cv")))
    val scored = c.join(broadcast(probes), Seq(cellCol))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col(cellCol).as("probed_cell"), col("neighbor_id"),
        (dot(col("__qv"), col("__cv")) / (col("__qn") * col("__cn"))).as("cosine_sim"))
    graft.plans.TopK.perGroup(scored, Seq("query_id"),
      Seq("cosine_sim" -> true, "neighbor_id" -> false), k)
  }

  /** Embedding-cosine near-duplicate pairs within a blocking column:
    * (id_a, id_b, cosine_sim >= minSim), id_a < id_b. The block bounds the
    * pair expansion the same way LSH bands do for text.
    */
  def nearDupPairs(df: DataFrame, idCol: String, vecCol: String,
      blockCol: String, minSim: Double): DataFrame = {
    val v = df.select(col(blockCol), col(idCol), col(vecCol).as("__v"))
      .withColumn("__n", norm(col("__v")))
    val a = v.select(col(blockCol), col(idCol).as("id_a"),
      col("__v").as("__va"), col("__n").as("__na"))
    val b = v.select(col(blockCol), col(idCol).as("id_b"),
      col("__v").as("__vb"), col("__n").as("__nb"))
    a.join(b, Seq(blockCol))
      .filter(col("id_a") < col("id_b"))
      .select(col(blockCol), col("id_a"), col("id_b"),
        (dot(col("__va"), col("__vb")) / (col("__na") * col("__nb"))).as("cosine_sim"))
      .filter(col("cosine_sim") >= minSim)
  }

  /** SemDeDup (Abbas et al. '23, arXiv 2303.09540) in its one-pass,
    * oracle-replayable form: semantic near-duplicate removal over
    * embeddings. The paper clusters with k-means then drops all but one of
    * any intra-cluster pair above a cosine threshold; here the "centroids"
    * are `nSeeds` content-addressed seed VECTORS (smallest md5 fraction of
    * their id — deterministic, no Lloyd iterations, so a SQL oracle can
    * replay the whole pipeline), each vector assigns to its max-cosine seed,
    * and within a cluster the LOWEST id of a near-dup pair survives.
    *
    * Scale: the seed table broadcasts (nSeeds rows); assignment is one
    * narrow corpus pass; the intra-cluster pair expansion joins on the
    * cluster key (one shuffle) and is bounded the way q27's label blocking
    * bounds it — nSeeds grows with the corpus so E[cluster size] stays
    * fixed, which is exactly the paper's k ∝ N prescription.
    *
    * Output: (vec_id, cluster = winning seed id, is_dup).
    */
  def semDeDup(corpus: DataFrame, idC: String, vecCol: String, nSeeds: Int,
      tau: Double): DataFrame = {
    val v = corpus.select(col(idC).as("vec_id"), col(vecCol).as("__v"))
      .withColumn("__vn", norm(col("__v")))
    val seeds = v
      .withColumn("__f", graft.functions.ContentHash.hashFrac(col("vec_id")))
      .orderBy(col("__f").asc, col("vec_id").asc).limit(nSeeds)
      .select(col("vec_id").as("seed_id"), col("__v").as("__sv"), col("__vn").as("__sn"))
    val scored = v.crossJoin(broadcast(seeds))
      .select(col("vec_id"), col("seed_id"),
        (dot(col("__v"), col("__sv")) / (col("__vn") * col("__sn"))).as("__cs"))
    val asg = graft.plans.TopK.perGroup(scored, Seq("vec_id"),
      Seq("__cs" -> true, "seed_id" -> false), 1)
      .select(col("vec_id"), col("seed_id").as("cluster"))
    val m = v.join(asg, Seq("vec_id"))
    val a = m.select(col("cluster"), col("vec_id").as("id_a"),
      col("__v").as("__va"), col("__vn").as("__na"))
    val b = m.select(col("cluster"), col("vec_id").as("id_b"),
      col("__v").as("__vb"), col("__vn").as("__nb"))
    val dups = a.join(b, Seq("cluster"))
      .filter(col("id_a") < col("id_b"))
      .filter(dot(col("__va"), col("__vb")) / (col("__na") * col("__nb")) >= tau)
      .select(col("id_b").as("vec_id")).distinct()
    m.select(col("vec_id"), col("cluster"))
      .join(dups.withColumn("__d", lit(true)), Seq("vec_id"), "left")
      .select(col("vec_id"), col("cluster"),
        coalesce(col("__d"), lit(false)).as("is_dup"))
  }
}
