package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.DotProduct

/** Random-hyperplane (sign) LSH over embeddings — the LSH-bucketed ANN
  * variant (Charikar '02): `nBits` Rademacher hyperplanes hash each vector
  * to a bit signature; cosine-similar vectors collide with probability
  * `1 - θ/π` per bit. Candidates are restricted to bucket collisions, so
  * search cost scales with bucket occupancy, not corpus size.
  *
  * The hyperplanes are pseudo-random but engine-portable: plane p's
  * component d is ±1 by the parity of the first hex nibble of
  * `md5(p || "_" || d)` — any engine with md5 reproduces the exact planes,
  * keeping bucket assignments oracle-checkable (the same trick the MinHash
  * family uses).
  *
  * Scale: signatures are one narrow projection (nBits dot products per
  * row); the bucket join shuffles on the bucket key only. At 100 TB the
  * bucket key doubles as the storage partition key, so probes prune
  * partitions. Multi-probe (flipping low-confidence bits) or multiple
  * tables raise recall the standard way.
  */
object SignLSH {

  /** ±1.0 Rademacher component for plane `p`, dimension `d` (deterministic,
    * engine-portable).
    */
  private def planeComponent(p: Int, d: Int): Double = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"${p}_$d".getBytes("UTF-8"))
    val nibble = (hex(0) >> 4) & 0xf
    if (nibble % 2 == 0) 1.0 else -1.0
  }

  /** Plane `p` as a literal array — resolves at plan time, so the per-row
    * work is one codegen'd dot product against constants.
    */
  def plane(p: Int, dim: Int): Column =
    array((0 until dim).map(d => lit(planeComponent(p, d))): _*)

  /** The plane matrix as literal arrays. */
  def planes(nBits: Int, dim: Int): Seq[Column] =
    (0 until nBits).map(p => plane(p, dim))

  /** Append an integer `bucket` column: bit p set iff v · plane_p > 0. */
  def withBucket(df: DataFrame, vecCol: String, nBits: Int, dim: Int): DataFrame = {
    val bucket = planes(nBits, dim).zipWithIndex.map { case (plane, p) =>
      when(DotProduct(col(vecCol), plane) > 0d, lit(1 << p)).otherwise(lit(0))
    }.reduce(_ + _)
    df.withColumn("bucket", bucket)
  }

  /** LSH-bucketed top-k cosine search: queries only scan their own bucket.
    * Same output shape as [[Knn.bruteForceTopK]] plus the bucket; recall
    * measured against the brute-force baseline.
    */
  def bucketTopK(queries: DataFrame, corpus: DataFrame, idQ: String, idC: String,
      vecCol: String, nBits: Int, dim: Int, k: Int): DataFrame = {
    val q = withBucket(queries, vecCol, nBits, dim)
      .select(col(idQ).as("query_id"), col(vecCol).as("__qv"), col("bucket"))
      .withColumn("__qn", Knn.norm(col("__qv")))
    val c = withBucket(corpus, vecCol, nBits, dim)
      .select(col(idC).as("neighbor_id"), col(vecCol).as("__cv"), col("bucket"))
      .withColumn("__cn", Knn.norm(col("__cv")))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("bucket"), col("neighbor_id"),
        (Knn.dot(col("__qv"), col("__cv")) / (col("__qn") * col("__cn"))).as("cosine_sim"))
    graft.plans.TopK.perGroup(scored, Seq("query_id"),
      Seq("cosine_sim" -> true, "neighbor_id" -> false), k)
  }

  /** Multi-table sign-LSH top-k — the standard recall lever: `nTables`
    * independent tables (table t hashes with planes t·nBits … t·nBits+nBits−1),
    * candidates are the UNION of per-table bucket collisions, each table an
    * independent chance to collide. A near-duplicate at angle θ survives one
    * b-bit table with probability (1−θ/π)^b, and nTables tables with
    * 1−(1−(1−θ/π)^b)^T — 4×8 bits turns a 0.66 single-table chance into
    * ≈0.99 (q131 measures it ≥0.95 on planted near-dups).
    *
    * Scale: candidate ids are dedup'd BEFORE any vector is rejoined, and
    * both the query table and the candidate list broadcast — the corpus is
    * scanned once for signatures and once for candidate scoring, never
    * shuffled.
    */
  def multiTableTopK(queries: DataFrame, corpus: DataFrame, idQ: String,
      idC: String, vecCol: String, nBits: Int, nTables: Int, dim: Int,
      k: Int): DataFrame = {
    def withBuckets(df: DataFrame, id: String, as: String): DataFrame =
      (0 until nTables).foldLeft(
        df.select(col(id).as(as), col(vecCol).as("__v"))) { case (d, t) =>
        val bucket = (0 until nBits).map { p =>
          when(DotProduct(col("__v"), plane(t * nBits + p, dim)) > 0d,
            lit(1 << p)).otherwise(lit(0))
        }.reduce(_ + _)
        d.withColumn(s"__b$t", bucket)
      }
    val qb = withBuckets(queries, idQ, "query_id").drop("__v")
    val cb = withBuckets(corpus, idC, "neighbor_id").drop("__v")
    val cand = (0 until nTables).map { t =>
      cb.select(col("neighbor_id"), col(s"__b$t").as("__b"))
        .join(broadcast(qb.select(col("query_id"), col(s"__b$t").as("__b"))), Seq("__b"))
        .select(col("query_id"), col("neighbor_id"))
    }.reduce(_ unionByName _).distinct()
    val q = queries.select(col(idQ).as("query_id"), col(vecCol).as("__qv"))
      .withColumn("__qn", Knn.norm(col("__qv")))
    val c = corpus.select(col(idC).as("neighbor_id"), col(vecCol).as("__cv"))
      .withColumn("__cn", Knn.norm(col("__cv")))
    val scored = c.join(broadcast(cand), Seq("neighbor_id"))
      .join(broadcast(q), Seq("query_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        (Knn.dot(col("__qv"), col("__cv")) / (col("__qn") * col("__cn"))).as("cosine_sim"))
    graft.plans.TopK.perGroup(scored, Seq("query_id"),
      Seq("cosine_sim" -> true, "neighbor_id" -> false), k)
  }
}
