package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Substring-level exact dedup — the span-granularity half of pretraining
  * dedup (Lee et al. '22, "Deduplicating Training Data Makes Language Models
  * Better"): the document-level family (exact / MinHash-LSH / SimHash)
  * removes whole near-duplicate documents, but production corpora also carry
  * duplicated SPANS inside otherwise-unique documents (licenses, boilerplate
  * headers, quoted passages). This module finds them distributedly:
  *
  *   1. each document becomes word k-grams keyed by position
  *      ([[grams]]: one narrow explode, grams hashed so only 32 hex chars
  *      shuffle — never the text),
  *   2. a gram occurring ≥ `minOccurrences` times anywhere in the corpus is
  *      duplicated (one combiner-friendly count aggregate — the distributed
  *      stand-in for the paper's suffix array),
  *   3. duplicated gram-start positions collapse to maximal runs per
  *      document (gaps-and-islands over positions — the q42 machinery), each
  *      run a removable span of ≥ k + runLen − 1 words.
  *
  * Scale: the gram count is partial-aggregated map-side; the membership join
  * back to positions shuffles on the gram hash (hot grams are exactly the
  * duplicated ones — bounded fan-out because each (doc, pos) row matches at
  * most once); the run detection is a per-document window. Nothing is
  * quadratic in corpus size.
  */
object SpanDedup {

  /** (idCol, pos, gram) — md5 of each k consecutive words of `toksCol`,
    * pos = 1-based starting word index. Documents shorter than k words
    * yield no grams.
    */
  def grams(docs: DataFrame, idCol: String, toksCol: Column, k: Int): DataFrame =
    docs.select(col(idCol), toksCol.as("__w"))
      .filter(size(col("__w")) >= k)
      .select(col(idCol), posexplode(transform(
        sequence(lit(1), size(col("__w")) - (k - 1)),
        i => md5(concat_ws(" ", slice(col("__w"), i, lit(k)))))).as(Seq("__p", "gram")))
      .select(col(idCol), (col("__p") + 1).as("pos"), col("gram"))

  /** Per-position duplicate flag: (idCol, pos, is_dup) where is_dup marks
    * grams occurring ≥ `minOccurrences` times corpus-wide (within-document
    * repeats count — a self-repeating span is as removable as a cross-doc
    * one).
    */
  def markDuplicated(grams: DataFrame, idCol: String,
      minOccurrences: Long = 2L): DataFrame = {
    val dup = grams.groupBy(col("gram")).agg(count(lit(1)).as("__n"))
      .filter(col("__n") >= minOccurrences)
      .select(col("gram"), lit(1).as("__d"))
    grams.join(dup, Seq("gram"), "left")
      .select(col(idCol), col("pos"), col("__d").isNotNull.as("is_dup"))
  }

  /** Maximal duplicated runs per document: (idCol, run_start, run_len) —
    * run_len counts consecutive duplicated gram starts, so the removable
    * span covers k + run_len − 1 words from run_start.
    */
  def duplicatedRuns(marked: DataFrame, idCol: String): DataFrame = {
    val w = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    marked.filter(col("is_dup"))
      .withColumn("__grp", col("pos") - row_number().over(w))
      .groupBy(col(idCol), col("__grp"))
      .agg(min(col("pos")).as("run_start"), count(lit(1)).as("run_len"))
      .drop("__grp")
  }
}
