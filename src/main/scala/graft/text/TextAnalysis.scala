package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.dedup.MinHashLSH

/** Text-analysis operators for a training-data pipeline: language ID, quality
  * scoring, token counting, document fingerprinting. All pure column
  * expressions (codegen'd, shuffle-free per row) with engine-portable
  * primitives so every output is oracle-checkable.
  */
object TextAnalysis {

  /** n-gram-free stopword profiles for the language-ID heuristic. Determinism
    * contract: scores tie-break by the priority order of `profiles` (first
    * wins), so prediction is a pure function of the token multiset.
    */
  val langProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "es" -> Seq("el", "la", "de", "que", "y", "los"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von"),
    "fr" -> Seq("le", "la", "les", "de", "et", "est"))

  /** English stopwords used by the quality score's stopword ratio. */
  val stopwordsEn: Seq[String] = langProfiles.head._2

  /** Count of tokens contained in `words` (multiset count, not distinct). */
  def stopwordCount(tokens: Column, words: Seq[String]): Column =
    size(filter(tokens, t => t.isInCollection(words)))

  /** Language-ID: argmax stopword-profile score with first-profile
    * tie-breaking (a deterministic n-gram/stopword heuristic in the
    * fastText-lite tradition; real systems swap in a trained model — the
    * pipeline shape is identical).
    */
  def langIdCol(tokens: Column): Column = {
    val scores = langProfiles.map { case (lang, words) =>
      lang -> stopwordCount(tokens, words)
    }
    // CASE WHEN s_en >= all others THEN 'en' WHEN s_es >= rest THEN 'es' ...
    val cases = scores.zipWithIndex.init.map { case ((lang, s), i) =>
      val rest = scores.drop(i + 1).map(_._2)
      (rest.map(s >= _).reduce(_ && _), lit(lang))
    }
    cases.foldRight(lit(scores.last._1): Column) { case ((cond, v), acc) =>
      when(cond, v).otherwise(acc)
    }
  }

  /** Quality-score feature frame: length, token count, punctuation count,
    * stopword ratio, average token length, and a clamped linear score in
    * [0,1]. Only +,*,/ and comparisons — no transcendentals, so the doubles
    * are bit-identical in any IEEE engine evaluating the same tree.
    */
  def qualityFeatures(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val tokens = MinHashLSH.tokensCol(t)
    df.select(
        col(idCol), t.as("__text"),
        length(t).as("n_chars"),
        size(tokens).as("n_tokens"),
        size(regexp_extract_all(t, lit("[^A-Za-z0-9\\s]"), lit(0))).as("n_punct"),
        stopwordCount(tokens, stopwordsEn).as("n_stop"))
      .select(
        col(idCol), col("n_chars"), col("n_tokens"), col("n_punct"), col("n_stop"),
        (col("n_stop").cast("double") / col("n_tokens")).as("stop_ratio"),
        (length(regexp_replace(col("__text"), "\\s", "")).cast("double") /
          col("n_tokens")).as("avg_token_len"),
        (col("n_punct").cast("double") / col("n_chars")).as("punct_ratio"))
      .withColumn("quality_score",
        greatest(lit(0d), least(lit(1d),
          lit(0.2) + lit(0.5) * col("stop_ratio")
            + lit(0.1) * (least(col("n_tokens"), lit(100)).cast("double") / lit(100d))
            - lit(2.0) * col("punct_ratio"))))
  }

  /** Token counting: whitespace tokens and a BPE-ish regex segmentation
    * (letter runs | single digits | single non-alnum marks — the GPT-2
    * pre-tokenizer family shape).
    */
  def tokenCounts(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    df.select(col(idCol),
      size(MinHashLSH.tokensCol(t)).as("n_ws_tokens"),
      size(regexp_extract_all(t, lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"), lit(0))).as("n_bpe_tokens"),
      ceil(length(t).cast("double") / lit(4.0)).cast("long").as("n_chars_div4"))
  }

  /** Document fingerprint (winnowing-lite): the lexicographic min/max of the
    * rolling word-3gram hash set plus the distinct-shingle count. Two
    * documents sharing `fp_min` almost surely share content; a rolling-hash
    * window selection (true winnowing) refines this with the same plumbing.
    */
  def fingerprints(df: DataFrame, idCol: String, textCol: String, n: Int = 3): DataFrame =
    MinHashLSH.shingles(df, idCol, textCol, n, distinct = false)
      .groupBy(col(idCol))
      .agg(
        min(md5(col("shingle"))).as("fp_min"),      // multiplicity-insensitive
        max(md5(col("shingle"))).as("fp_max"),
        countDistinct(col("shingle")).as("n_shingles"))
}
