package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MinHash + LSH near-duplicate candidate generation
  * (shingle → minhash → band → bucket-join), the classic large-corpus
  * text-dedup pipeline (Broder '97; MMDS ch.3).
  *
  * Hash family: `md5(seed || "|" || shingle)` compared lexicographically —
  * md5 hex output is engine-portable (identical in any engine with md5),
  * which keeps the whole pipeline differential-testable against a SQL
  * oracle, and its distribution is uniform enough for a min-hash.
  *
  * Scale shape (100 TB corpus):
  *  - shingling is a narrow projection + explode (no shuffle);
  *  - signatures are one hash-aggregate on doc id (single shuffle over
  *    (id, shingle), combiner-reduced map-side because `min` is partial);
  *  - banding is a projection; the bucket self-join shuffles on
  *    (band, band_key) only — never an all-pairs product;
  *  - [[candidatePairs]] takes `maxBucketSize` to drop degenerate buckets
  *    (boilerplate-heavy corpora produce mega-buckets that would explode
  *    quadratically; dropping them is standard practice).
  */
object MinHashLSH {

  /** Whitespace word tokens. Kept identical to the oracle's
    * `string_split_regex(trim(text), '\s+')`.
    */
  def tokensCol(text: Column): Column = split(trim(text), "\\s+")

  /** Re-parallelize a small-file input before CPU-heavy per-row work: a
    * compact parquet file arrives as one split, which would serialize the
    * shingle/hash stage on a single core. At real scale inputs carry enough
    * splits and this is a no-op.
    */
  private[graft] def parallelize(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }

  /** Word n-gram shingles: (idCol, shingle). `distinct = false` skips the
    * dedup shuffle — correct whenever the consumer is insensitive to shingle
    * multiplicity (min/max aggregation is; set intersection is not).
    *
    * The token array is materialized in its own projection BEFORE the
    * transform: referencing `split(...)` directly inside the HOF lambda
    * re-evaluates the split once per shingle (O(words²) per document —
    * measured 5× slower on the LSH pipeline).
    */
  def shingles(df: DataFrame, idCol: String, textCol: String, n: Int,
      distinct: Boolean = true): DataFrame = {
    val pre = parallelize(df.select(col(idCol), tokensCol(col(textCol)).as("__w")))
    val exploded = pre.select(col(idCol),
      explode(transform(
        sequence(lit(1), greatest(size(col("__w")) - (n - 1), lit(1))),
        i => concat_ws(" ", slice(col("__w"), i, lit(n))))).as("shingle"))
    if (distinct) exploded.distinct() else exploded
  }

  /** k min-hashes per id: columns h0..h{k-1} (lexicographic min of the seeded
    * md5 over the shingle set).
    */
  def signatures(sh: DataFrame, idCol: String, k: Int): DataFrame = {
    val aggs = (0 until k).map(i =>
      min(md5(concat(lit(s"$i|"), col("shingle")))).as(s"h$i"))
    sh.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** LSH banding: r consecutive signature rows hashed into one band key.
    * Output: (idCol, band, band_key), `numBands * |ids|` rows.
    */
  def bands(sig: DataFrame, idCol: String, numBands: Int, r: Int): DataFrame =
    (0 until numBands).map { b =>
      val rows = (b * r until (b + 1) * r).map(i => col(s"h$i"))
      sig.select(col(idCol), lit(b).as("band"), md5(concat(rows: _*)).as("band_key"))
    }.reduce(_ unionByName _)

  /** Candidate near-duplicate pairs: ids sharing any band bucket, `id_a <
    * id_b`, distinct across bands. `maxBucketSize > 0` drops buckets larger
    * than the bound before the quadratic expansion.
    */
  def candidatePairs(bandDf: DataFrame, idCol: String, maxBucketSize: Int = 0): DataFrame = {
    val pruned =
      if (maxBucketSize <= 0) bandDf
      else {
        val sizes = bandDf.groupBy(col("band"), col("band_key"))
          .agg(count(lit(1)).as("__bs"))
          .filter(col("__bs") <= maxBucketSize)
          .drop("__bs")
        bandDf.join(sizes, Seq("band", "band_key"))
      }
    val a = pruned.select(col("band"), col("band_key"), col(idCol).as("id_a"))
    val b = pruned.select(col("band"), col("band_key"), col(idCol).as("id_b"))
    a.join(b, Seq("band", "band_key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
  }

  /** End-to-end convenience: documents → candidate pairs. */
  def candidates(df: DataFrame, idCol: String, textCol: String,
      shingleLen: Int = 3, k: Int = 8, numBands: Int = 4,
      maxBucketSize: Int = 0): DataFrame = {
    require(numBands > 0 && k % numBands == 0, s"k=$k must split into $numBands bands")
    // min() is multiplicity-insensitive: skip the distinct shuffle entirely
    // and let map-side partial aggregation collapse duplicates.
    val sig = signatures(shingles(df, idCol, textCol, shingleLen, distinct = false), idCol, k)
    candidatePairs(bands(sig, idCol, numBands, k / numBands), idCol, maxBucketSize)
  }
}
