package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MinHash + LSH near-duplicate candidate generation
  * (shingle → minhash → band → bucket-join), the classic large-corpus
  * text-dedup pipeline (Broder '97; MMDS ch.3).
  *
  * Hash family: ONE `md5(shingle)` per occurrence, then the k per-seed hashes
  * are derived algebraically from two 32-bit halves of the digest —
  * `h_i = (a + i·b) mod 2^32` (Kirsch–Mitzenmacher '06, the standard
  * double-hashing scheme for minhash/bloom families). This pays the digest
  * cost once instead of k times (the md5 bill dominates the pipeline), stays
  * engine-portable (any SQL engine has md5 + integer arithmetic, so the whole
  * pipeline remains differential-testable), and keeps minhash-grade
  * uniformity.
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

  /** Default mega-bucket cap for [[candidates]]: a band bucket larger than
    * this is dropped before the quadratic pair expansion. Boilerplate-heavy
    * corpora (license headers, templated pages) produce buckets of millions
    * of near-identical docs; expanding one is O(bucket²) pairs and such pairs
    * carry no ranking information — every member is a duplicate of the same
    * cluster, which exact-dedup (q20) already collapses more cheaply.
    */
  val DefaultBucketCap = 1000

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

  /** k min-hashes per id: columns h0..h{k-1} BIGINT — min over the shingle
    * set of `h_i(s) = (a(s) + i·b(s)) mod 2^32`, where a/b are the first two
    * 32-bit halves of md5(s). The digest and halves are materialized in their
    * own projection so the k aggregate expressions share them (one md5 per
    * row, not k).
    */
  def signatures(sh: DataFrame, idCol: String, k: Int): DataFrame = {
    val d = md5(col("shingle"))
    val halves = sh.select(col(idCol),
      conv(substring(d, 1, 8), 16, 10).cast("long").as("__a"),
      conv(substring(d, 9, 8), 16, 10).cast("long").as("__b"))
    val aggs = (0 until k).map(i =>
      min((col("__a") + lit(i.toLong) * col("__b")) % lit(1L << 32)).as(s"h$i"))
    halves.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** LSH banding: r consecutive signature rows hashed into one band key.
    * Output: (idCol, band, band_key), `numBands * |ids|` rows.
    */
  def bands(sig: DataFrame, idCol: String, numBands: Int, r: Int): DataFrame =
    (0 until numBands).map { b =>
      val rows = (b * r until (b + 1) * r).map(i => col(s"h$i").cast("string"))
      sig.select(col(idCol), lit(b).as("band"), md5(concat_ws("|", rows: _*)).as("band_key"))
    }.reduce(_ unionByName _)

  /** Candidate near-duplicate pairs: ids sharing any band bucket, `id_a <
    * id_b`, distinct across bands. `maxBucketSize > 0` drops buckets larger
    * than the bound before the quadratic expansion.
    */
  def candidatePairs(bandDf: DataFrame, idCol: String, maxBucketSize: Int = 0): DataFrame = {
    // The band frame feeds 2-3 subtrees (sizes, self-join sides) whose shapes
    // differ, so Spark re-runs the whole shingle→signature lineage for each;
    // materialize it ONCE (spillable executor storage). At warehouse scale
    // the band table is a written artifact instead — same principle.
    val bands = bandDf.localCheckpoint()
    val pruned =
      if (maxBucketSize <= 0) bands
      else {
        val sizes = bands.groupBy(col("band"), col("band_key"))
          .agg(count(lit(1)).as("__bs"))
          .filter(col("__bs") <= maxBucketSize)
          .drop("__bs")
        bands.join(sizes, Seq("band", "band_key"))
      }
    val a = pruned.select(col("band"), col("band_key"), col(idCol).as("id_a"))
    val b = pruned.select(col("band"), col("band_key"), col(idCol).as("id_b"))
    a.join(b, Seq("band", "band_key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
  }

  /** End-to-end convenience: documents → candidate pairs. The bucket cap
    * defaults ON ([[DefaultBucketCap]]); pass 0 only when the corpus is known
    * boilerplate-free.
    */
  def candidates(df: DataFrame, idCol: String, textCol: String,
      shingleLen: Int = 3, k: Int = 8, numBands: Int = 4,
      maxBucketSize: Int = DefaultBucketCap): DataFrame = {
    require(numBands > 0 && k % numBands == 0, s"k=$k must split into $numBands bands")
    // min() is multiplicity-insensitive: skip the distinct shuffle entirely
    // and let map-side partial aggregation collapse duplicates.
    val sig = signatures(shingles(df, idCol, textCol, shingleLen, distinct = false), idCol, k)
    candidatePairs(bands(sig, idCol, numBands, k / numBands), idCol, maxBucketSize)
  }
}
