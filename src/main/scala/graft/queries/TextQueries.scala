package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.multimodal.Media
import graft.text.TextAnalysis

/** Text-analysis + multimodal operators over `documents`. */
object TextQueries {

  private def profileSql(words: Seq[String]): String =
    words.map(w => s"'$w'").mkString("(", ", ", ")")

  val all: Seq[Q] = Seq(

    // ---------------------------------------------------------------- q28
    // Language-ID: stopword-profile argmax with fixed priority tie-breaking.
    Q("q28_lang_id", {
      val Seq(en, es, de, fr) = TextAnalysis.langProfiles.map(p => profileSql(p._2))
      s"""WITH t AS (SELECT doc_id, lang, string_split_regex(trim(text), '\\s+') AS toks
        |           FROM documents),
        |s AS (SELECT doc_id, lang,
        |  len(list_filter(toks, x -> x IN $en)) AS s_en,
        |  len(list_filter(toks, x -> x IN $es)) AS s_es,
        |  len(list_filter(toks, x -> x IN $de)) AS s_de,
        |  len(list_filter(toks, x -> x IN $fr)) AS s_fr
        |FROM t)
        |SELECT doc_id, lang,
        |  CASE WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr THEN 'en'
        |       WHEN s_es >= s_de AND s_es >= s_fr THEN 'es'
        |       WHEN s_de >= s_fr THEN 'de' ELSE 'fr' END AS predicted_lang,
        |  (CASE WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr THEN 'en'
        |        WHEN s_es >= s_de AND s_es >= s_fr THEN 'es'
        |        WHEN s_de >= s_fr THEN 'de' ELSE 'fr' END) = lang AS is_correct
        |FROM s""".stripMargin
    }) { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      val pred = TextAnalysis.langIdCol(graft.dedup.MinHashLSH.tokensCol(col("text")))
      docs.select(col("doc_id"), col("lang"), pred.as("predicted_lang"),
        (pred === col("lang")).as("is_correct"))
    },

    // ---------------------------------------------------------------- q29
    // Quality scoring: length / punctuation / stopword features + clamped
    // linear score (no transcendentals — bit-stable doubles).
    Q("q29_quality_score", {
      val en = profileSql(TextAnalysis.stopwordsEn)
      s"""WITH f AS (SELECT doc_id,
        |  length(text) AS n_chars,
        |  len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
        |  len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS n_punct,
        |  len(list_filter(string_split_regex(trim(text), '\\s+'), x -> x IN $en)) AS n_stop,
        |  length(regexp_replace(text, '\\s', '', 'g')) AS n_nonspace
        |FROM documents)
        |SELECT doc_id, n_chars, n_tokens, n_punct, n_stop,
        |  CAST(n_stop AS DOUBLE) / n_tokens AS stop_ratio,
        |  CAST(n_nonspace AS DOUBLE) / n_tokens AS avg_token_len,
        |  CAST(n_punct AS DOUBLE) / n_chars AS punct_ratio,
        |  greatest(CAST(0 AS DOUBLE), least(CAST(1 AS DOUBLE),
        |    0.2 + 0.5 * (CAST(n_stop AS DOUBLE) / n_tokens)
        |        + 0.1 * (CAST(least(n_tokens, 100) AS DOUBLE) / CAST(100 AS DOUBLE))
        |        - 2.0 * (CAST(n_punct AS DOUBLE) / n_chars))) AS quality_score
        |FROM f""".stripMargin
    }) { (s, dir) =>
      TextAnalysis.qualityFeatures(Tables.load(s, dir, "documents"), "doc_id", "text")
    },

    // ---------------------------------------------------------------- q30
    // Token counting: whitespace + BPE-ish regex segmentation + chars/4.
    Q("q30_token_counts",
      """SELECT doc_id,
        |  len(string_split_regex(trim(text), '\s+')) AS n_ws_tokens,
        |  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')) AS n_bpe_tokens,
        |  CAST(ceil(CAST(length(text) AS DOUBLE) / 4.0) AS BIGINT) AS n_chars_div4
        |FROM documents""".stripMargin) { (s, dir) =>
      TextAnalysis.tokenCounts(Tables.load(s, dir, "documents"), "doc_id", "text")
    },

    // ---------------------------------------------------------------- q31
    // Document fingerprinting (winnowing-lite): min/max rolling word-3gram
    // hash + distinct shingle count.
    Q("q31_fingerprint",
      """WITH w AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
        |sh AS (SELECT DISTINCT doc_id, s FROM (
        |  SELECT doc_id, unnest(list_transform(generate_series(1, greatest(len(w)-2, 1)),
        |                                       i -> array_to_string(w[i:i+2], ' '))) AS s
        |  FROM w))
        |SELECT doc_id, min(md5(s)) AS fp_min, max(md5(s)) AS fp_max,
        |  count(*) AS n_shingles
        |FROM sh GROUP BY doc_id""".stripMargin) { (s, dir) =>
      TextAnalysis.fingerprints(Tables.load(s, dir, "documents"), "doc_id", "text")
    },

    // ---------------------------------------------------------------- q38
    // PII-style redaction: digit runs in the JSON props replaced with a
    // token; counts prove the rewrite (regex kept in the RE2 ∩ Java subset).
    Q("q38_redact",
      """SELECT event_id,
        |  regexp_replace(props, '[0-9]+', '<NUM>', 'g') AS redacted,
        |  len(regexp_extract_all(props, '[0-9]+')) AS n_redactions
        |FROM events""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "events")
        .select(col("event_id"),
          regexp_replace(col("props"), "[0-9]+", "<NUM>").as("redacted"),
          size(regexp_extract_all(col("props"), lit("[0-9]+"), lit(0))).as("n_redactions"))
    },

    // ---------------------------------------------------------------- q39
    // Document chunking: 20-token sliding windows, stride 15 — the
    // training-data segmentation shape (narrow, shuffle-free).
    Q("q39_chunking",
      """WITH w AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents)
        |SELECT doc_id, i AS chunk_start,
        |  array_to_string(w[i:i+19], ' ') AS chunk_text,
        |  least(len(w) - i + 1, 20) AS n_tokens
        |FROM (SELECT doc_id, w, unnest(generate_series(1, greatest(len(w), 1), 15)) AS i FROM w)""".stripMargin) { (s, dir) =>
      graft.text.Chunker.chunkByTokens(Tables.load(s, dir, "documents"),
        "doc_id", "text", size = 20, stride = 15)
    },

    // ---------------------------------------------------------------- q63
    // Stratified subsampling: k docs per (lang, source) stratum, selected by
    // CONTENT-HASH order (deterministic, re-ingestion-stable — the q48
    // rationale applied to balanced-subset curation), ranked by the
    // bounded-heap TopKPerGroup instead of a per-stratum sort.
    Q("q63_stratified_sample",
      """SELECT lang, source, h, doc_id, rank FROM (
        |  SELECT lang, source, md5(text) AS h, doc_id,
        |    CAST(row_number() OVER (PARTITION BY lang, source
        |      ORDER BY md5(text), doc_id) AS INT) AS rank
        |  FROM documents)
        |WHERE rank <= 5""".stripMargin) { (s, dir) =>
      graft.plans.TopK.perGroup(
        Tables.load(s, dir, "documents")
          .select(col("lang"), col("source"), md5(col("text")).as("h"), col("doc_id")),
        groupCols = Seq("lang", "source"),
        orderCols = Seq("h" -> false, "doc_id" -> false),
        k = 5)
    },

    // ---------------------------------------------------------------- q64
    // Sequence packing: contiguous chunks of each document packed into
    // fixed-token-budget training sequences (seq_id = preceding-tokens DIV
    // budget over a running window sum) — the batch-shaping pass between
    // chunking and tokenized training data. One window over (doc, position),
    // no cross-doc state.
    Q("q64_sequence_packing",
      """WITH w AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
        |ch AS (SELECT doc_id, i AS chunk_start, least(len(w) - i + 1, 20) AS n_tokens
        |       FROM (SELECT doc_id, w, unnest(generate_series(1, greatest(len(w), 1), 15)) AS i FROM w)),
        |packed AS (SELECT doc_id, chunk_start, n_tokens,
        |  CAST((SUM(n_tokens) OVER (PARTITION BY doc_id ORDER BY chunk_start
        |        ROWS UNBOUNDED PRECEDING) - n_tokens) // 64 AS INT) AS seq_id
        |  FROM ch)
        |SELECT doc_id, seq_id, count(*) AS n_chunks,
        |  CAST(SUM(n_tokens) AS BIGINT) AS seq_tokens
        |FROM packed GROUP BY 1, 2""".stripMargin) { (s, dir) =>
      val chunks = graft.text.Chunker.chunkByTokens(Tables.load(s, dir, "documents"),
        "doc_id", "text", size = 20, stride = 15)
      graft.text.Chunker.packSequences(chunks, "doc_id", "chunk_start", "n_tokens",
          budget = 64)
        .groupBy(col("doc_id"), col("seq_id"))
        .agg(count(lit(1)).as("n_chunks"),
          sum(col("n_tokens")).as("seq_tokens"))
    },

    // ---------------------------------------------------------------- q48
    // Content-addressed train/val split: the split key is a hash of the
    // CONTENT (md5 first nibble), not a random draw — stable under
    // re-ingestion, dedup-safe, and reproducible across engines. 13/16 ≈
    // 81% train.
    Q("q48_train_val_split",
      """SELECT doc_id, lang,
        |  CASE WHEN strpos('0123456789abcdef', substr(md5(text), 1, 1)) - 1 < 13
        |       THEN 'train' ELSE 'val' END AS split
        |FROM documents""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          when(expr("instr('0123456789abcdef', substring(md5(text), 1, 1)) - 1") < 13,
            lit("train")).otherwise(lit("val")).as("split"))
    },

    // ---------------------------------------------------------------- q49
    // Corpus term statistics (the tf/df table under TF-IDF/BM25): document
    // frequency and total term frequency per token — one explode + one
    // aggregate; the idf transform is a scalar on top (left in rational
    // form: transcendentals don't cross engines bit-exactly).
    Q("q49_term_stats",
      """WITH tok AS (SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS term
        |            FROM documents)
        |SELECT term,
        |  count(DISTINCT doc_id) AS df,
        |  count(*) AS total_tf,
        |  CAST((SELECT count(*) FROM documents) AS DOUBLE) / count(DISTINCT doc_id) AS inv_df
        |FROM tok GROUP BY term""".stripMargin) { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      // corpus size as a broadcast 1-row frame (J9 treatment): no separate
      // driver-side count action, no second scan of the corpus
      val corpus = docs.agg(count(lit(1)).as("__n"))
      docs.select(col("doc_id"),
          explode(graft.dedup.MinHashLSH.tokensCol(col("text"))).as("term"))
        .groupBy(col("term"))
        .agg(countDistinct(col("doc_id")).as("df"), count(lit(1)).as("total_tf"))
        .crossJoin(broadcast(corpus))
        .select(col("term"), col("df"), col("total_tf"),
          (col("__n").cast("double") / col("df")).as("inv_df"))
    },

    // ---------------------------------------------------------------- q61
    // Top-3 characteristic terms per document by tf-idf weight, in RATIONAL
    // form (tf·N/df: one exact integer product, one IEEE division — log-free
    // so engines agree bit-for-bit), ranked by the custom bounded-heap
    // TopKPerGroup operator: O(n log k) per group, fixed memory, no
    // per-document sort — the "signature terms" pass of corpus curation.
    Q("q61_tfidf_topk",
      """WITH tok AS (SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS term
        |            FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
        |df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        |n AS (SELECT count(*) AS n FROM documents)
        |SELECT doc_id, term, tf, weight, rank FROM (
        |  SELECT t.doc_id, t.term, t.tf,
        |    round(CAST(t.tf * n.n AS DOUBLE) / d.df, 6) AS weight,
        |    CAST(row_number() OVER (PARTITION BY t.doc_id
        |      ORDER BY round(CAST(t.tf * n.n AS DOUBLE) / d.df, 6) DESC, t.term) AS INT) AS rank
        |  FROM tf t JOIN df d USING (term) CROSS JOIN n)
        |WHERE rank <= 3""".stripMargin) { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      val tok = docs.select(col("doc_id"),
        explode(graft.dedup.MinHashLSH.tokensCol(col("text"))).as("term"))
      val tf = tok.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
      val docFreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      val corpus = docs.agg(count(lit(1)).as("__n"))
      val scored = tf.join(docFreq, Seq("term")).crossJoin(broadcast(corpus))
        .select(col("doc_id"), col("term"), col("tf"),
          round((col("tf") * col("__n")).cast("double") / col("df"), 6).as("weight"))
      graft.plans.TopK.perGroup(scored,
        groupCols = Seq("doc_id"),
        orderCols = Seq("weight" -> true, "term" -> false),
        k = 3)
    },

    // ---------------------------------------------------------------- q50
    // Quantile outlier filter: drop events outside the per-type [p01, p99]
    // of `value` — the numeric-cleaning pass before training aggregation.
    Q("q50_outlier_filter",
      """WITH b AS (SELECT event_type,
        |    quantile_cont(value, 0.01) AS lo, quantile_cont(value, 0.99) AS hi
        |  FROM events GROUP BY event_type)
        |SELECT e.event_type,
        |  count(*) AS n_kept,
        |  round(CAST(SUM(CAST(e.value AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6) AS mean_kept
        |FROM events e JOIN b USING (event_type)
        |WHERE e.value >= b.lo AND e.value <= b.hi
        |GROUP BY e.event_type""".stripMargin) { (s, dir) =>
      val ev = Tables.load(s, dir, "events")
      val bounds = ev.groupBy(col("event_type")).agg(
        expr("percentile(value, 0.01)").as("lo"),
        expr("percentile(value, 0.99)").as("hi"))
      ev.join(broadcast(bounds), Seq("event_type"))
        .filter(col("value") >= col("lo") && col("value") <= col("hi"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_kept"),
          round(sum(col("value").cast("decimal(18,6)")).cast("double") / count(lit(1)), 6)
            .as("mean_kept"))
    },

    // ---------------------------------------------------------------- q65
    // Multimodal metadata rewrite + frame sampling: aspect-preserving resize
    // (pure metadata arithmetic — payload bytes untouched and never
    // shuffled) then every-4th-frame sampling. Int casts are floor on both
    // sides (values nonnegative; DuckDB CAST rounds, so the oracle floors
    // explicitly).
    Q("q65_media_resample",
      """WITH m AS (SELECT doc_id AS media_id,
        |    CAST(n_chars % 640 AS INT) AS width,
        |    CAST(doc_id % 480 AS INT) AS height
        |  FROM documents),
        |r AS (SELECT media_id,
        |    CASE WHEN width > 384 OR height > 384
        |         THEN CAST(floor(width * least(384.0 / greatest(width, 1),
        |                                       384.0 / greatest(height, 1))) AS INT)
        |         ELSE width END AS width,
        |    CASE WHEN width > 384 OR height > 384
        |         THEN CAST(floor(height * least(384.0 / greatest(width, 1),
        |                                        384.0 / greatest(height, 1))) AS INT)
        |         ELSE height END AS height
        |  FROM m)
        |SELECT media_id, width, height FROM r WHERE media_id % 4 = 0""".stripMargin) { (s, dir) =>
      val media = Media.fromDocuments(Tables.load(s, dir, "documents"))
      Media.sampleFrames(Media.resizeMeta(media, maxDim = 384), "media_id", stride = 4)
        .select(col("media_id"), col("width"), col("height"))
    },

    // ---------------------------------------------------------------- q32
    // Multimodal plumbing: binary payload column + batched mapPartitions
    // feature extraction (decode STUBbed — deterministic fake features; the
    // schema/batching/encoder path is the real contract being tested).
    Q("q32_media_features",
      """SELECT doc_id AS media_id, 'text/plain' AS media_type,
        |  CAST(octet_length(encode(text)) AS INT) AS n_bytes,
        |  md5(text) AS content_hash,
        |  CAST(n_chars % 640 AS INT) AS width,
        |  CAST(doc_id % 480 AS INT) AS height
        |FROM documents""".stripMargin) { (s, dir) =>
      Media.extractFeatures(Media.fromDocuments(Tables.load(s, dir, "documents")))
        .toDF()
        .select(col("media_id"), col("media_type"), col("n_bytes"),
          col("content_hash"), col("width"), col("height"))
    })
}
