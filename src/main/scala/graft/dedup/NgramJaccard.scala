package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact n-gram Jaccard similarity over blocked candidate pairs — the
  * verification stage that follows MinHash/SimHash candidate generation, or a
  * standalone within-block near-dup scorer.
  *
  * J(A,B) = |A ∩ B| / |A ∪ B| over distinct word n-gram sets, computed
  * set-algebraically: explode shingles once, equi-join on (block, shingle) to
  * count intersections, then |A ∪ B| = |A| + |B| - |A ∩ B|. Never materializes
  * a cartesian product — pairs sharing zero shingles never meet.
  *
  * Scale: the shingle join shuffles on (block, shingle); hot shingles inside a
  * block behave like LSH mega-buckets — pre-filter stopword-grade shingles or
  * keep blocks bounded. Division is done once per pair in double
  * (int/int-derived, deterministic).
  */
object NgramJaccard {

  /** Exact Jaccard for a GIVEN candidate pair set — the verification stage
    * after LSH (consumes [[MinHashLSH.candidatePairs]] output instead of
    * regenerating pairs from shingle co-occurrence, which is quadratic in the
    * frequency of common shingles). Cost is linear in candidates: each pair
    * expands by |A| shingles (join on id_a), intersects on (id_b, shingle),
    * never an all-pairs product.
    *
    * @param cand (id_a, id_b) candidate pairs
    * @param sh   DISTINCT (idCol, shingle) sets
    * @return (id_a, id_b, inter, n_a, n_b, jaccard), pairs sharing >= 1 shingle
    */
  def verifyPairs(cand: DataFrame, sh: DataFrame, idCol: String): DataFrame = {
    val sizes = sh.groupBy(col(idCol)).agg(count(lit(1)).as("n_sh"))
    val inter = cand
      .join(sh.select(col(idCol).as("id_a"), col("shingle")), Seq("id_a"))
      .join(sh.select(col(idCol).as("id_b"), col("shingle")), Seq("id_b", "shingle"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col(idCol).as("id_a"), col("n_sh").as("n_a")), Seq("id_a"))
      .join(sizes.select(col(idCol).as("id_b"), col("n_sh").as("n_b")), Seq("id_b"))
      .withColumn("jaccard",
        col("inter").cast("double") / (col("n_a") + col("n_b") - col("inter")).cast("double"))
      .select(col("id_a"), col("id_b"), col("inter"), col("n_a"), col("n_b"), col("jaccard"))
  }

  /** Pairs (id_a, id_b, inter, n_a, n_b, jaccard) within the same
    * `blockCol`, having at least one shared shingle and jaccard >= minJ.
    * Prefer [[verifyPairs]] over LSH candidates at corpus scale: this form
    * expands EVERY shingle co-occurrence inside a block, which a hot shingle
    * makes quadratic.
    */
  def pairs(df: DataFrame, idCol: String, textCol: String, blockCol: String,
      n: Int, minJ: Double): DataFrame = {
    val sh = MinHashLSH.shingles(df.select(col(idCol), col(blockCol), col(textCol)),
        idCol, textCol, n)
      .join(df.select(col(idCol), col(blockCol)), Seq(idCol))
    val sizes = sh.groupBy(col(idCol)).agg(count(lit(1)).as("n_sh"))
    val a = sh.select(col(blockCol), col("shingle"), col(idCol).as("id_a"))
    val b = sh.select(col(blockCol), col("shingle"), col(idCol).as("id_b"))
    val inter = a.join(b, Seq(blockCol, "shingle"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col(idCol).as("id_a"), col("n_sh").as("n_a")), Seq("id_a"))
      .join(sizes.select(col(idCol).as("id_b"), col("n_sh").as("n_b")), Seq("id_b"))
      .withColumn("jaccard",
        col("inter").cast("double") / (col("n_a") + col("n_b") - col("inter")).cast("double"))
      .filter(col("jaccard") >= minJ)
      .select(col("id_a"), col("id_b"), col("inter"), col("n_a"), col("n_b"), col("jaccard"))
  }
}
