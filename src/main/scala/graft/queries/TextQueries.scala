package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.multimodal.Media
import graft.text.TextAnalysis

/** Text-analysis + multimodal operators over `documents`. */
object TextQueries {

  private def profileSql(words: Seq[String]): String =
    words.map(w => s"'$w'").mkString("(", ", ", ")")

  /** BPE merge training over the COLLECTED top-V segmentation table
    * (round 18, guide §1.2): the state is O(vocab · word-length) BY
    * DESIGN — corpus size enters only through the (distributed) word
    * counts — so the merge loop over a 200-row table is driver-scale
    * micro-state, and running one shuffle job + one head() per step paid
    * ~0.15 s of fixed scheduler cost per merge for microseconds of work
    * (q196/q205 measured ~86 jobs, 2.7 s of inter-job driver gap). The
    * loop now iterates in memory, bit-identically: adjacent pairs
    * weighted by word count, winner total-ordered by (count desc, left,
    * right) — ASCII-only symbols, so Scala string order ≡ Spark's binary
    * UTF-8 order — and leftmost-greedy re-segmentation (if the
    * accumulated tail is the merge's left symbol and the next symbol its
    * right, splice; else append). This is how production tokenizer
    * trainers are shaped: distributed corpus counts, in-memory merge
    * loop. Returns (per-step merges with counts, final segmentation).
    */
  private def bpeTrainDriver(st0: Seq[(String, Long, Vector[String])],
      nMerges: Int)
      : (Seq[(Int, String, String, Long)], Seq[(String, Long, Vector[String])]) = {
    def resegment(syms: Vector[String], a: String, b: String): Vector[String] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      syms.foreach { x =>
        if (out.nonEmpty && out.last == a && x == b)
          out(out.length - 1) = a + b
        else out += x
      }
      out.toVector
    }
    var st = st0
    val merges = scala.collection.mutable
      .ArrayBuffer.empty[(Int, String, String, Long)]
    for (step <- 1 to nMerges) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      st.foreach { case (_, cnt, syms) =>
        var i = 0
        while (i + 1 < syms.length) {
          val k = (syms(i), syms(i + 1))
          counts(k) = counts.getOrElse(k, 0L) + cnt
          i += 1
        }
      }
      val ((ba, bb), bn) = counts.toSeq
        .minBy { case ((a, b), n) => (-n, a, b) }
      merges += ((step, ba, bb, bn))
      if (step < nMerges)
        st = st.map { case (w, c, syms) => (w, c, resegment(syms, ba, bb)) }
    }
    (merges.toSeq, st)
  }

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
    // feature extraction — the byte-level path for payload types without a
    // JDK codec (audio/video). Real image decode is q130.
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
    },

    // ---------------------------------------------------------------- q106
    // Repetition-based quality signals (the Gopher/MassiveText family of
    // filters): per-document distinct-word ratio, top-word fraction, and
    // duplicate-3-gram fraction — the features a pretraining curation pass
    // thresholds to drop boilerplate and degenerate repetition. All ratios
    // are one exact-integer division, engine-portable. Scale shape: two
    // narrow explode+agg passes keyed on doc_id, no joins wider than the
    // document count.
    Q("q106_repetition",
      """WITH w AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
        |tok AS (SELECT doc_id, unnest(w) AS term FROM w),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
        |agg AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_words,
        |  count(*) AS n_distinct, CAST(max(tf) AS BIGINT) AS max_tf FROM tf GROUP BY 1),
        |sh AS (SELECT doc_id,
        |  unnest(list_transform(generate_series(1, greatest(len(w)-2, 1)),
        |                        i -> array_to_string(w[i:i+2], ' '))) AS s FROM w),
        |sha AS (SELECT doc_id, count(*) AS n_sh, count(DISTINCT s) AS n_sh_d FROM sh GROUP BY 1)
        |SELECT a.doc_id, a.n_words, a.n_distinct,
        |  round(CAST(a.n_distinct AS DOUBLE) / a.n_words, 6) AS distinct_ratio,
        |  round(CAST(a.max_tf AS DOUBLE) / a.n_words, 6) AS top_word_frac,
        |  round(1.0 - CAST(sha.n_sh_d AS DOUBLE) / sha.n_sh, 6) AS dup_3gram_frac
        |FROM agg a JOIN sha ON sha.doc_id = a.doc_id""".stripMargin) { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      val tf = docs
        .select(col("doc_id"), explode(graft.dedup.MinHashLSH.tokensCol(col("text"))).as("term"))
        .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
      val agg = tf.groupBy(col("doc_id"))
        .agg(sum(col("tf")).cast("long").as("n_words"),
          count(lit(1)).as("n_distinct"), max(col("tf")).cast("long").as("max_tf"))
      val sha = graft.dedup.MinHashLSH.shingles(docs, "doc_id", "text", 3, distinct = false)
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_sh"), countDistinct(col("shingle")).as("n_sh_d"))
      agg.join(sha, Seq("doc_id"))
        .select(col("doc_id"), col("n_words"), col("n_distinct"),
          round(col("n_distinct").cast("double") / col("n_words"), 6).as("distinct_ratio"),
          round(col("max_tf").cast("double") / col("n_words"), 6).as("top_word_frac"),
          round(lit(1.0) - col("n_sh_d").cast("double") / col("n_sh"), 6).as("dup_3gram_frac"))
    },

    // ---------------------------------------------------------------- q107
    // Domain-mixture reweighting: per-source character share and the
    // sampling weight that equalizes each source's character budget — the
    // "upsample rare domains, downsample dominant ones" factor a training
    // mixture applies before sampling. One aggregate + a broadcast 1-row
    // totals join (J9 treatment); no second corpus scan.
    Q("q107_mixture_weights",
      """WITH s AS (SELECT source, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS chars FROM documents GROUP BY 1),
        |t AS (SELECT CAST(sum(chars) AS BIGINT) AS total_chars,
        |  count(*) AS n_sources FROM s)
        |SELECT source, n_docs, chars,
        |  round(CAST(chars AS DOUBLE) / total_chars, 6) AS char_share,
        |  round((CAST(total_chars AS DOUBLE) / n_sources) / chars, 6) AS sample_weight
        |FROM s CROSS JOIN t""".stripMargin) { (s, dir) =>
      val bySrc = Tables.load(s, dir, "documents")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).cast("long").as("chars"))
      val totals = bySrc.agg(sum(col("chars")).cast("long").as("total_chars"),
        count(lit(1)).as("n_sources"))
      bySrc.crossJoin(broadcast(totals))
        .select(col("source"), col("n_docs"), col("chars"),
          round(col("chars").cast("double") / col("total_chars"), 6).as("char_share"),
          round(col("total_chars").cast("double") / col("n_sources") / col("chars"), 6)
            .as("sample_weight"))
    },

    // ---------------------------------------------------------------- q112
    // Benchmark DECONTAMINATION: flag training docs sharing any word-5-gram
    // with a held-out eval set (stand-in: doc_id % 50 = 0) — the n-gram
    // overlap scan every serious pretraining pipeline runs before training.
    // Scale shape: shingle equi-join keyed on the shingle — contamination
    // cost is bounded by shared-shingle frequency, never train×eval; a hot
    // boilerplate shingle (shared by > 1000 docs) is DROPPED before the
    // join, the same binding cap discipline as the LSH mega-buckets — such
    // a shingle identifies boilerplate, not benchmark contamination.
    Q("q112_decontamination",
      """WITH w AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
        |sh0 AS (SELECT DISTINCT doc_id, s FROM (
        |  SELECT doc_id, unnest(list_transform(generate_series(1, greatest(len(w)-4, 1)),
        |                                       i -> array_to_string(w[i:i+4], ' '))) AS s
        |  FROM w)),
        |keep AS (SELECT s FROM sh0 GROUP BY s HAVING count(*) <= 1000),
        |sh AS (SELECT sh0.* FROM sh0 JOIN keep USING (s)),
        |ev AS (SELECT doc_id AS eval_id, s FROM sh WHERE doc_id % 50 = 0),
        |tr AS (SELECT doc_id, s FROM sh WHERE doc_id % 50 <> 0)
        |SELECT tr.doc_id,
        |  count(DISTINCT tr.s) AS n_shared_shingles,
        |  count(DISTINCT ev.eval_id) AS n_eval_docs_hit
        |FROM tr JOIN ev ON ev.s = tr.s
        |GROUP BY 1""".stripMargin) { (s, dir) =>
      val sh0 = graft.dedup.MinHashLSH.shingles(
        Tables.load(s, dir, "documents"), "doc_id", "text", 5)
      val keep = sh0.groupBy(col("shingle")).agg(count(lit(1)).as("__df"))
        .filter(col("__df") <= 1000).select(col("shingle"))
      val sh = sh0.join(keep, Seq("shingle"), "left_semi")
      val ev = sh.filter(col("doc_id") % 50 === 0)
        .select(col("doc_id").as("eval_id"), col("shingle"))
      val tr = sh.filter(col("doc_id") % 50 =!= 0)
      tr.join(ev, Seq("shingle"))
        .groupBy(col("doc_id"))
        .agg(countDistinct(col("shingle")).as("n_shared_shingles"),
          countDistinct(col("eval_id")).as("n_eval_docs_hit"))
    },

    // ---------------------------------------------------------------- q113
    // Token-rarity score — a perplexity PROXY in rational form: per document,
    // n_tokens · N / Σ df(token). Log-probability scoring would sum doubles
    // (merge-order dependent, libm-divergent across engines); the rational
    // form accumulates exact BIGINT document frequencies and divides ONCE,
    // so both engines agree bit-for-bit. High score = rare vocabulary.
    Q("q113_rarity_score",
      """WITH tok AS (SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS term
        |            FROM documents),
        |df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
        |n AS (SELECT count(*) AS n_docs FROM documents)
        |SELECT tok.doc_id, count(*) AS n_tokens,
        |  CAST(sum(df.df) AS BIGINT) AS sum_df,
        |  round(CAST(count(*) AS DOUBLE) * max(n.n_docs) / sum(df.df), 6) AS rarity
        |FROM tok JOIN df USING (term) CROSS JOIN n
        |GROUP BY 1""".stripMargin) { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      val tok = docs.select(col("doc_id"),
        explode(graft.dedup.MinHashLSH.tokensCol(col("text"))).as("term"))
      val dfreq = tok.distinct().groupBy(col("term")).agg(count(lit(1)).as("df"))
      val corpus = docs.agg(count(lit(1)).as("n_docs"))
      tok.join(dfreq, Seq("term"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tokens"), sum(col("df")).cast("long").as("sum_df"))
        .crossJoin(broadcast(corpus))
        .select(col("doc_id"), col("n_tokens"), col("sum_df"),
          round(col("n_tokens").cast("double") * col("n_docs") / col("sum_df"), 6)
            .as("rarity"))
    },

    // ---------------------------------------------------------------- q111
    // Regex token profiling: count + distinct-count of pattern matches per
    // document (the shape of PII scans, marker-token counting, template
    // detection). Pattern kept in the RE2 ∩ Java common subset so both
    // engines tokenize identically.
    Q("q111_regex_profile",
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '[a-z]*ar[a-z]*')) AS BIGINT) AS n_matches,
        |  CAST(len(list_distinct(regexp_extract_all(text, '[a-z]*ar[a-z]*'))) AS BIGINT)
        |    AS n_distinct_matches
        |FROM documents""".stripMargin) { (s, dir) =>
      val m = regexp_extract_all(col("text"), lit("[a-z]*ar[a-z]*"), lit(0))
      Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          size(m).cast("long").as("n_matches"),
          size(array_distinct(m)).cast("long").as("n_distinct_matches"))
    },

    // ---------------------------------------------------------------- q130
    // REAL image decode (javax.imageio — the PNG codec ships in the JDK):
    // one deterministic RGB PNG is rendered per document id on the
    // executors, then decoded back by an actual ImageReader; the emitted
    // features are the decoded raster's dimensions and exact integer channel
    // sums. The oracle replays the closed-form pixel function in SQL — no
    // decoder on the DuckDB side — so a hash match proves the bytes really
    // round-tripped through encode→PNG→decode (PNG is lossless). Upgrades
    // the one previously-simulated operation in the multimodal family.
    // In-query contract: every decoded payload must identify as PNG.
    // Scale shape: render and decode are narrow mapPartitions passes — no
    // shuffle, CPU-bound, embarrassingly parallel; the binary column dies at
    // the feature projection (column pruning) and never shuffles.
    Q("q130_image_decode",
      """WITH d AS (SELECT doc_id, 8 + (doc_id % 9) AS w, 8 + ((doc_id*3) % 9) AS h
        |           FROM documents),
        |px AS (SELECT d.doc_id, d.w, d.h, x.i AS x, y.i AS y
        |       FROM d, range(16) x(i), range(16) y(i)
        |       WHERE x.i < d.w AND y.i < d.h)
        |SELECT doc_id AS media_id,
        |  CAST(MAX(w) AS INT) AS width, CAST(MAX(h) AS INT) AS height,
        |  CAST(count(*) AS BIGINT) AS n_pixels,
        |  CAST(SUM((doc_id*7 + x) % 256) AS BIGINT) AS sum_r,
        |  CAST(SUM((x + y) % 256) AS BIGINT) AS sum_g,
        |  CAST(SUM((doc_id + 3*y) % 256) AS BIGINT) AS sum_b
        |FROM px GROUP BY doc_id""".stripMargin) { (s, dir) =>
      val ids = Tables.load(s, dir, "documents").select(col("doc_id"))
      val decoded = Media.decodeImages(Media.renderPngs(ids)).toDF()
      val nonPng = decoded.filter(col("format") =!= "png").count()
      require(nonPng == 0, s"q130: $nonPng payloads did not decode as PNG")
      decoded.select(col("media_id"), col("width"), col("height"),
        col("n_pixels"), col("sum_r"), col("sum_g"), col("sum_b"))
    },

    // ---------------------------------------------------------------- q136
    // REAL audio decode (javax.sound.sampled — the WAV reader ships in the
    // JDK and is pure header+PCM parsing, headless-safe): one deterministic
    // mono 16-bit/8 kHz clip is synthesized per document id, encoded to WAV
    // container bytes on the executors, then decoded back by the actual
    // AudioSystem reader — sample rate / channels / bit depth come from the
    // PARSED HEADER and the sample statistics from the decoded PCM frames.
    // The oracle replays the closed-form waveform in SQL (no decoder), so a
    // hash match proves the bytes round-tripped through a real codec.
    // Together with q130 this makes image AND audio decode real; only video
    // (no JDK codec) remains on the byte-level path (q32).
    Q("q136_audio_decode",
      """WITH n AS (SELECT doc_id, 64 + doc_id % 128 AS n FROM documents),
        |s AS (SELECT doc_id, ((doc_id*37 + t.t*t.t) % 65536) - 32768 AS v
        |      FROM n, LATERAL unnest(generate_series(0, CAST(n.n - 1 AS BIGINT))) t(t))
        |SELECT doc_id AS media_id, 8000 AS sample_rate, 1 AS channels, 16 AS bits,
        |  CAST(count(*) AS BIGINT) AS n_samples,
        |  CAST(SUM(v) AS BIGINT) AS sum_samples,
        |  CAST(min(v) AS INT) AS min_sample,
        |  CAST(max(v) AS INT) AS max_sample
        |FROM s GROUP BY doc_id""".stripMargin) { (s, dir) =>
      val ids = Tables.load(s, dir, "documents").select(col("doc_id"))
      Media.decodeWavs(Media.renderWavs(ids)).toDF()
        .select(col("media_id"), col("sample_rate"), col("channels"), col("bits"),
          col("n_samples"), col("sum_samples"), col("min_sample"), col("max_sample"))
    },

    // ---------------------------------------------------------------- q141
    // BM25 impact index (Robertson-Sparck Jones / Okapi, k1=1.2 b=0.75) in
    // RATIONAL form: the per-(term, doc) relevance weights an inverted-index
    // builder materializes, for the corpus's 3 highest-df terms, top-10 docs
    // per term on the bounded-heap TopKPerGroup operator. The textbook
    // formula's log-idf would sum libm doubles; instead both idf and the
    // length normalization are cleared of fractions — numerator
    // (2N-2df+1)·22·T·tf and denominator (2df+1)·(10·T·tf + 3·T + 9·N·dl)
    // are exact BIGINTs (scale by 2 for the ±0.5, by 10·T for k1=1.2,
    // b=0.75, avgdl=T/N) — so ranking needs ONE double division both
    // engines agree on bit-for-bit. High weight = rare term, short doc,
    // high tf: the ranking BM25's monotone log preserves.
    Q("q141_bm25_index",
      """WITH tok AS (SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS term
        |            FROM documents),
        |n AS (SELECT count(*) AS n_docs FROM documents),
        |t AS (SELECT count(*) AS n_tok FROM tok),
        |dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
        |df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
        |qt AS (SELECT term FROM df ORDER BY df DESC, term LIMIT 3),
        |sc AS (SELECT tf.term, tf.doc_id,
        |    (2*n.n_docs - 2*df.df + 1) * 22 * t.n_tok * tf.tf AS num,
        |    (2*df.df + 1) * (10 * t.n_tok * tf.tf + 3 * t.n_tok + 9 * n.n_docs * dl.dl) AS den
        |  FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN n CROSS JOIN t)
        |SELECT term, doc_id, bm25, rank FROM (
        |  SELECT sc.term, sc.doc_id,
        |    round(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 6) AS bm25,
        |    CAST(row_number() OVER (PARTITION BY sc.term
        |      ORDER BY round(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 6) DESC,
        |               sc.doc_id) AS INT) AS rank
        |  FROM sc JOIN qt USING (term))
        |WHERE rank <= 10""".stripMargin) { (s, dir) =>
      val tok = Tables.load(s, dir, "documents")
        .select(col("doc_id"), explode(graft.dedup.MinHashLSH.tokensCol(col("text"))).as("term"))
        .localCheckpoint() // five aggregations read it; don't re-tokenize
      val n = tok.select(col("doc_id")).distinct().count() // == corpus docs (every doc tokenizes)
      val nTok = tok.count()
      val dl = tok.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
      val tf = tok.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
      val dfreq = tok.distinct().groupBy(col("term")).agg(count(lit(1)).as("df"))
      val qt = dfreq.orderBy(col("df").desc, col("term").asc).limit(3).select(col("term"))
      val sc = tf.join(dfreq, Seq("term")).join(dl, Seq("doc_id"))
        .select(col("term"), col("doc_id"),
          ((lit(2) * n - lit(2) * col("df") + 1) * 22 * nTok * col("tf")).as("num"),
          ((lit(2) * col("df") + 1) *
            (lit(10) * nTok * col("tf") + lit(3) * nTok + lit(9) * n * col("dl"))).as("den"))
        .join(broadcast(qt), Seq("term"))
        .select(col("term"), col("doc_id"),
          round(col("num").cast("double") / col("den").cast("double"), 6).as("bm25"))
      graft.plans.TopK.perGroup(sc, Seq("term"),
        Seq(("bm25", true), ("doc_id", false)), 10)
    },

    // ---------------------------------------------------------------- q143
    // Full CDC apply (MERGE with deletes): a changefeed of I/U/D changes,
    // each stamped with a per-key sequence — including a superseded early
    // update and a duplicate re-delivery of the delete — applied to a
    // customer snapshot. Latest-per-key compaction collapses the feed, a
    // winning D removes the key, I/U upserts; the oracle recomputes the
    // final state from set algebra alone, proving the stale update lost,
    // the re-delivered delete applied once, and untouched rows survived.
    Q("q143_cdc_apply",
      """WITH base AS (SELECT c_custkey, c_name FROM customer WHERE c_custkey <= 300)
        |SELECT c_custkey, c_name FROM base WHERE c_custkey % 10 NOT IN (3, 4, 5)
        |UNION ALL
        |SELECT c_custkey, c_name || '#v2' FROM base WHERE c_custkey % 10 IN (4, 5)
        |UNION ALL
        |SELECT 20000 + i, 'INS' || CAST(i AS VARCHAR) FROM range(1, 31) t(i)""".stripMargin) { (s, dir) =>
      import graft.ops.Upsert
      val base = Tables.load(s, dir, "customer")
        .filter(col("c_custkey") <= 300)
        .select(col("c_custkey"), col("c_name"))
      def ch(rows: org.apache.spark.sql.DataFrame, op: String, seq: Int) =
        rows.select(col("c_custkey"), col("c_name"), lit(op).as("op"), lit(seq).as("seq"))
      val changes =
        // superseded early update: must lose to the seq-2 rewrite
        ch(base.filter(col("c_custkey") % 10 === 4)
          .withColumn("c_name", concat(col("c_name"), lit("#stale"))), "U", 1)
        .unionByName(ch(base.filter(col("c_custkey") % 10 === 4 || col("c_custkey") % 10 === 5)
          .withColumn("c_name", concat(col("c_name"), lit("#v2"))), "U", 2))
        // delete, delivered twice (same seq — at-least-once feed)
        .unionByName(ch(base.filter(col("c_custkey") % 10 === 3), "D", 2))
        .unionByName(ch(base.filter(col("c_custkey") % 10 === 3), "D", 2))
        .unionByName(ch(s.range(1, 31).toDF("i")
          .select((col("i") + 20000).as("c_custkey"),
            concat(lit("INS"), col("i").cast("string")).as("c_name")), "I", 1))
      Upsert.applyCdc(base, changes, Seq("c_custkey"))
    },

    // ---------------------------------------------------------------- q144
    // PMI collocations (Church & Hanks '90) — the phrase-mining signal a
    // tokenizer-vocabulary builder ranks merge candidates by — in RATIONAL
    // lift form: PMI's log is monotone, so ranking by
    // lift = c(ab)·N_uni² / (N_bi·c(a)·c(b)) orders identically while every
    // factor stays an exact BIGINT and the one double division agrees
    // bit-for-bit across engines (q113/q141's discipline). Adjacent-pair
    // counts come from one positional self-join per doc (pos+1), unigram
    // counts from the same tokenization; min support 5 kills the
    // singleton-pair noise PMI is notorious for. Top-20 by (lift, pair) is
    // a global bounded top-k (TakeOrdered — per-partition heaps, k-row
    // merge, no full sort).
    Q("q144_pmi_collocations",
      """WITH d AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS l FROM documents),
        |t AS (SELECT doc_id, unnest(l) AS term, generate_subscripts(l, 1) AS pos FROM d),
        |uni AS (SELECT term, count(*) AS c FROM t GROUP BY 1),
        |nu AS (SELECT count(*) AS n_uni FROM t),
        |bg AS (SELECT a.term AS term_a, b.term AS term_b, count(*) AS n_ab
        |       FROM t a JOIN t b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
        |       GROUP BY 1, 2),
        |nb AS (SELECT CAST(sum(n_ab) AS BIGINT) AS n_bi FROM bg)
        |SELECT term_a, term_b, n_ab,
        |  round(CAST(n_ab * n_uni * n_uni AS DOUBLE)
        |        / CAST(n_bi * ua.c * ub.c AS DOUBLE), 6) AS lift
        |FROM bg JOIN uni ua ON ua.term = bg.term_a
        |        JOIN uni ub ON ub.term = bg.term_b
        |        CROSS JOIN nu CROSS JOIN nb
        |WHERE n_ab >= 5
        |ORDER BY lift DESC, term_a, term_b LIMIT 20""".stripMargin) { (s, dir) =>
      val tok = Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          posexplode(graft.dedup.MinHashLSH.tokensCol(col("text"))).as(Seq("pos", "term")))
        .localCheckpoint() // unigrams + both bigram sides read it
      val nUni = tok.count()
      val uni = tok.groupBy(col("term")).agg(count(lit(1)).as("c"))
      val bg = tok.select(col("doc_id"), col("pos"), col("term").as("term_a"))
        .join(tok.select(col("doc_id"), (col("pos") - 1).as("pos"), col("term").as("term_b")),
          Seq("doc_id", "pos"))
        .groupBy(col("term_a"), col("term_b")).agg(count(lit(1)).as("n_ab"))
        .localCheckpoint() // n_bi total + the scored rows both read it
      val nBi = bg.agg(sum(col("n_ab")).cast("long")).head().getLong(0)
      bg.filter(col("n_ab") >= 5)
        .join(uni.select(col("term").as("term_a"), col("c").as("__ca")), Seq("term_a"))
        .join(uni.select(col("term").as("term_b"), col("c").as("__cb")), Seq("term_b"))
        .select(col("term_a"), col("term_b"), col("n_ab"),
          round((col("n_ab") * nUni * nUni).cast("double") /
            (lit(nBi) * col("__ca") * col("__cb")).cast("double"), 6).as("lift"))
        .orderBy(col("lift").desc, col("term_a").asc, col("term_b").asc)
        .limit(20)
    },

    // ---------------------------------------------------------------- q149
    // BPE vocabulary training (Sennrich et al. ACL'16), 3 unrolled merge
    // steps — the actual tokenizer-training loop, not a proxy: count
    // adjacent symbol pairs weighted by word frequency, merge the most
    // frequent pair corpus-wide, re-segment, repeat. Re-segmentation is a
    // LEFTMOST-GREEDY fold over each word's symbol list (the same
    // portable fold on both engines: if the accumulated tail equals the
    // merge's left symbol and the next symbol equals its right, splice;
    // else append) — a string `replace` cannot express it because a
    // replacement consumes the delimiter the next occurrence needs
    // ('a a a a' must become [aa, aa], not [aa, a, a]). Vocabulary is the
    // top-200 alphabetic words (deterministic tiebreak), pair choice is
    // total-ordered by (count, left, right); each step's winner is the
    // oracle-checked output. Scale shape: state is O(vocab · word length),
    // one pair-count aggregation per step, winner broadcast as a literal.
    Q("q149_bpe_merges",
      """WITH tok AS (SELECT unnest(string_split_regex(trim(text), '\s+')) AS term
        |            FROM documents),
        |w AS (SELECT lower(term) AS word, count(*) AS cnt FROM tok
        |      WHERE regexp_full_match(lower(term), '[a-z]+') GROUP BY 1),
        |top AS (SELECT word, cnt FROM w ORDER BY cnt DESC, word LIMIT 200),
        |st0 AS (SELECT word, cnt, string_split(word, '') AS syms FROM top),
        |px1 AS (SELECT word, cnt, unnest(syms) AS s, generate_subscripts(syms, 1) AS pos FROM st0),
        |pc1 AS (SELECT x.s AS a, y.s AS b, CAST(SUM(x.cnt) AS BIGINT) AS n
        |        FROM px1 x JOIN px1 y ON x.word = y.word AND y.pos = x.pos + 1 GROUP BY 1, 2),
        |b1 AS (SELECT a, b, n FROM pc1 ORDER BY n DESC, a, b LIMIT 1),
        |st1 AS (SELECT word, cnt, string_split(list_reduce(syms, (acc, x) ->
        |    CASE WHEN (string_split(acc, ' '))[-1] = b1.a AND x = b1.b
        |         THEN left(acc, length(acc) - length(b1.a)) || b1.a || b1.b
        |         ELSE acc || ' ' || x END), ' ') AS syms FROM st0, b1),
        |px2 AS (SELECT word, cnt, unnest(syms) AS s, generate_subscripts(syms, 1) AS pos FROM st1),
        |pc2 AS (SELECT x.s AS a, y.s AS b, CAST(SUM(x.cnt) AS BIGINT) AS n
        |        FROM px2 x JOIN px2 y ON x.word = y.word AND y.pos = x.pos + 1 GROUP BY 1, 2),
        |b2 AS (SELECT a, b, n FROM pc2 ORDER BY n DESC, a, b LIMIT 1),
        |st2 AS (SELECT word, cnt, string_split(list_reduce(syms, (acc, x) ->
        |    CASE WHEN (string_split(acc, ' '))[-1] = b2.a AND x = b2.b
        |         THEN left(acc, length(acc) - length(b2.a)) || b2.a || b2.b
        |         ELSE acc || ' ' || x END), ' ') AS syms FROM st1, b2),
        |px3 AS (SELECT word, cnt, unnest(syms) AS s, generate_subscripts(syms, 1) AS pos FROM st2),
        |pc3 AS (SELECT x.s AS a, y.s AS b, CAST(SUM(x.cnt) AS BIGINT) AS n
        |        FROM px3 x JOIN px3 y ON x.word = y.word AND y.pos = x.pos + 1 GROUP BY 1, 2),
        |b3 AS (SELECT a, b, n FROM pc3 ORDER BY n DESC, a, b LIMIT 1)
        |SELECT CAST(1 AS INT) AS step, a AS left_sym, b AS right_sym, n AS pair_count FROM b1
        |UNION ALL SELECT CAST(2 AS INT), a, b, n FROM b2
        |UNION ALL SELECT CAST(3 AS INT), a, b, n FROM b3""".stripMargin) { (s, dir) =>
      import s.implicits._
      // the distributed half: corpus-scale token counts -> top-200 words;
      // the merge loop itself runs driver-side over that O(vocab ·
      // word-length) state (bpeTrainDriver — round-18 note there)
      val st0 = Tables.load(s, dir, "documents")
        .select(explode(graft.dedup.MinHashLSH.tokensCol(col("text"))).as("term"))
        .select(lower(col("term")).as("word"))
        .filter(col("word").rlike("^[a-z]+$"))
        .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("word").asc).limit(200)
        .collect() // 200 rows — the trainer's whole state
        .map(r => (r.getString(0), r.getLong(1),
          r.getString(0).map(_.toString).toVector)).toSeq
      val (merges, _) = bpeTrainDriver(st0, 3)
      merges.toDF("step", "left_sym", "right_sym", "pair_count")
        .select(col("step").cast("int"), col("left_sym"), col("right_sym"),
          col("pair_count").cast("bigint"))
    },

    // ---------------------------------------------------------------- q196
    // BPE training to a PINNED TARGET VOCAB (q149 unrolled exactly 3
    // merges; a real tokenizer trains until |V|): base vocabulary = the
    // distinct characters of the top-200 words, extended by 20 learned
    // merge tokens — the fixed-point loop lives in Scala (q115's pattern:
    // driver steers, each step is ONE keyed pair-count shuffle, the winner
    // broadcasts as a literal into the next step's re-segmentation fold),
    // and the oracle replays all 20 merges as driver-UNROLLED SQL (the same
    // leftmost-greedy fold per step, total-ordered (count, left, right)
    // tie-breaks). Scale shape is unchanged from q149: state is the
    // O(vocab · word-length) segmentation table, per step one aggregation;
    // corpus size only enters through the word-frequency table, so 100 TB
    // of text trains through the identical loop once the top-V counts
    // exist. Output = the full ordered merge list plus each step's
    // resulting vocab size (base chars + merges so far — the quantity a
    // target-|V| trainer stops on).
    Q("q196_bpe_vocab", {
      val n = 20
      val head =
        """WITH tok AS (SELECT unnest(string_split_regex(trim(text), '\s+')) AS term
          |            FROM documents),
          |w AS (SELECT lower(term) AS word, count(*) AS cnt FROM tok
          |      WHERE regexp_full_match(lower(term), '[a-z]+') GROUP BY 1),
          |top AS (SELECT word, cnt FROM w ORDER BY cnt DESC, word LIMIT 200),
          |st0 AS MATERIALIZED (SELECT word, cnt, string_split(word, '') AS syms FROM top),
          |base AS (SELECT count(DISTINCT s) AS n_chars FROM
          |         (SELECT unnest(syms) AS s FROM st0))""".stripMargin
      val steps = (1 to n).map { i =>
        val pair =
          s"""px$i AS MATERIALIZED (SELECT word, cnt, unnest(syms) AS s, generate_subscripts(syms, 1) AS pos FROM st${i - 1}),
             |pc$i AS (SELECT x.s AS a, y.s AS b, CAST(SUM(x.cnt) AS BIGINT) AS n
             |        FROM px$i x JOIN px$i y ON x.word = y.word AND y.pos = x.pos + 1 GROUP BY 1, 2),
             |b$i AS (SELECT a, b, n FROM pc$i ORDER BY n DESC, a, b LIMIT 1)""".stripMargin
        val reseg = if (i == n) "" else
          s""",
             |st$i AS MATERIALIZED (SELECT word, cnt, string_split(list_reduce(syms, (acc, x) ->
             |    CASE WHEN (string_split(acc, ' '))[-1] = b$i.a AND x = b$i.b
             |         THEN left(acc, length(acc) - length(b$i.a)) || b$i.a || b$i.b
             |         ELSE acc || ' ' || x END), ' ') AS syms FROM st${i - 1}, b$i)""".stripMargin
        pair + reseg
      }.mkString(",\n", ",\n", "")
      val tail = (1 to n).map(i =>
        s"SELECT CAST($i AS INT) AS step, a AS left_sym, b AS right_sym, n AS pair_count, " +
          s"CAST(n_chars + $i AS BIGINT) AS vocab_size FROM b$i, base")
        .mkString("\n", "\nUNION ALL ", "")
      head + steps + tail
    }) { (s, dir) =>
      import s.implicits._
      val nMerges = 20
      // distributed corpus counts -> driver-side merge loop over the
      // 200-row segmentation state (bpeTrainDriver — round-18 note there)
      val st0 = Tables.load(s, dir, "documents")
        .select(explode(graft.dedup.MinHashLSH.tokensCol(col("text"))).as("term"))
        .select(lower(col("term")).as("word"))
        .filter(col("word").rlike("^[a-z]+$"))
        .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("word").asc).limit(200)
        .collect()
        .map(r => (r.getString(0), r.getLong(1),
          r.getString(0).map(_.toString).toVector)).toSeq
      val nChars = st0.flatMap(_._3).distinct.size.toLong
      val (m0, _) = bpeTrainDriver(st0, nMerges)
      val merges = m0.map { case (step, a, b, n) =>
        (step, a, b, n, nChars + step) }
      merges.toDF("step", "left_sym", "right_sym", "pair_count", "vocab_size")
        .select(col("step").cast("int"), col("left_sym"), col("right_sym"),
          col("pair_count").cast("bigint"), col("vocab_size").cast("bigint"))
    },

    // ---------------------------------------------------------------- q152
    // Cohen's kappa between the q28 language-ID classifier and the gold
    // `lang` column — the chance-corrected agreement score an annotation
    // pipeline reports for every auto-labeler. Confusion counts are ONE
    // distributed aggregation over a bounded label domain; expected
    // agreement is the row-total × column-total inner join on label (labels
    // absent from one side contribute a zero product, so the inner join is
    // exact). kappa = (N·diag − Σ r·c)/(N² − Σ r·c): all BIGINT, one
    // division at the end.
    Q("q152_cohens_kappa", {
      val Seq(en, es, de, fr) = TextAnalysis.langProfiles.map(p => profileSql(p._2))
      s"""WITH t AS (SELECT doc_id, lang, string_split_regex(trim(text), '\\s+') AS toks
        |           FROM documents),
        |s AS (SELECT lang AS gold,
        |  len(list_filter(toks, x -> x IN $en)) AS s_en,
        |  len(list_filter(toks, x -> x IN $es)) AS s_es,
        |  len(list_filter(toks, x -> x IN $de)) AS s_de,
        |  len(list_filter(toks, x -> x IN $fr)) AS s_fr
        |FROM t),
        |p AS (SELECT gold,
        |  CASE WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr THEN 'en'
        |       WHEN s_es >= s_de AND s_es >= s_fr THEN 'es'
        |       WHEN s_de >= s_fr THEN 'de' ELSE 'fr' END AS pred FROM s),
        |conf AS (SELECT gold, pred, count(*) AS n FROM p GROUP BY 1, 2),
        |tot AS (SELECT sum(n) AS nn,
        |        sum(CASE WHEN gold = pred THEN n ELSE 0 END) AS diag FROM conf),
        |r AS (SELECT gold AS lbl, sum(n) AS rn FROM conf GROUP BY 1),
        |c AS (SELECT pred AS lbl, sum(n) AS cn FROM conf GROUP BY 1),
        |e AS (SELECT COALESCE(sum(rn * cn), 0) AS e FROM r JOIN c USING (lbl))
        |SELECT CAST(nn AS BIGINT) AS n_docs,
        |  round(CAST(diag AS DOUBLE) / nn, 6) AS observed_agreement,
        |  round(CAST(nn * diag - e AS DOUBLE) / CAST(nn * nn - e AS DOUBLE), 6) AS kappa
        |FROM tot, e""".stripMargin
    }) { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      val pred = TextAnalysis.langIdCol(graft.dedup.MinHashLSH.tokensCol(col("text")))
      val conf = docs.select(col("lang").as("gold"), pred.as("pred"))
        .groupBy(col("gold"), col("pred")).agg(count(lit(1)).as("n"))
        .localCheckpoint() // three tiny reads below; don't re-run the scan
      val tot = conf.agg(sum(col("n")).as("nn"),
        sum(when(col("gold") === col("pred"), col("n")).otherwise(0L)).as("diag"))
      val rows = conf.groupBy(col("gold").as("lbl")).agg(sum(col("n")).as("rn"))
      val cols = conf.groupBy(col("pred").as("lbl")).agg(sum(col("n")).as("cn"))
      val e = rows.join(cols, "lbl")
        .agg(coalesce(sum(col("rn") * col("cn")), lit(0L)).as("e"))
      tot.crossJoin(broadcast(e)).select(
        col("nn").cast("long").as("n_docs"),
        round(col("diag").cast("double") / col("nn"), 6).as("observed_agreement"),
        round((col("nn") * col("diag") - col("e")).cast("double") /
          (col("nn") * col("nn") - col("e")).cast("double"), 6).as("kappa"))
    },

    // ---------------------------------------------------------------- q154
    // Vocabulary coverage curve: what fraction of all token occurrences the
    // top-k most frequent terms cover — the truncated-vocab sizing signal a
    // tokenizer builder reads before fixing its vocabulary. Collapses to
    // per-term totals (distributed), then takes BOTH the cumulative token
    // count and the rank position with two chained PrefixSum scans over the
    // (count desc, term) total order — the distinct-term domain is unbounded
    // at corpus scale, so no global window is allowed here either.
    Q("q154_coverage_curve",
      """WITH tok AS (SELECT unnest(string_split_regex(trim(text), '\s+')) AS term
        |            FROM documents),
        |tc AS (SELECT term, count(*) AS tf FROM tok GROUP BY 1),
        |o AS (SELECT tf,
        |  sum(tf) OVER (ORDER BY tf DESC, term
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tf,
        |  row_number() OVER (ORDER BY tf DESC, term) AS pos FROM tc),
        |t AS (SELECT sum(tf) AS total FROM tc)
        |SELECT CAST(pos AS BIGINT) AS k,
        |  CAST(cum_tf AS BIGINT) AS cum_tf, CAST(total AS BIGINT) AS total,
        |  round(CAST(cum_tf AS DOUBLE) / total, 6) AS coverage
        |FROM o, t WHERE pos IN (5, 10, 20)""".stripMargin) { (s, dir) =>
      val tc = Tables.load(s, dir, "documents")
        .select(explode(graft.dedup.MinHashLSH.tokensCol(col("text"))).as("term"))
        .groupBy(col("term")).agg(count(lit(1)).as("tf"))
        // descending-count order expressed as an ascending key for the scan
        .withColumn("neg_tf", -col("tf"))
        .withColumn("one", lit(1L))
      val ranked = graft.ops.PrefixSum.runningSums(tc, Seq("neg_tf", "term"),
        Seq("tf" -> "cum_tf", "one" -> "pos")) // one scan carries both sums
      val total = ranked.agg(sum(col("tf")).as("total"))
      ranked.filter(col("pos").isin(5L, 10L, 20L))
        .crossJoin(broadcast(total))
        .select(col("pos").as("k"), col("cum_tf"), col("total"),
          round(col("cum_tf").cast("double") / col("total"), 6).as("coverage"))
    },

    // ---------------------------------------------------------------- q157
    // Unicode NFC normalization — curation's first transform: the same
    // logical character must shingle/hash/dedup identically whether the
    // crawler delivered it precomposed (é) or decomposed (e + U+0301). The
    // native codegen'd NfcNormalize expression (JDK java.text.Normalizer —
    // no decode on already-normalized rows) is pinned byte-for-byte against
    // DuckDB's independent nfc_normalize: every 'e' is decomposed into
    // e+COMBINING ACUTE, normalized back, and required equal to the direct
    // precomposed substitution; character counts expose the composition.
    Q("q157_nfc_normalize",
      """WITH d AS (SELECT doc_id,
        |  regexp_replace(text, 'e', 'e' || chr(769), 'g') AS dec FROM documents),
        |n AS (SELECT doc_id, dec, nfc_normalize(dec) AS nfc FROM d)
        |SELECT n.doc_id,
        |  CAST(length(n.dec) AS BIGINT) AS len_decomposed,
        |  CAST(length(n.nfc) AS BIGINT) AS len_nfc,
        |  n.nfc = replace(s.text, 'e', chr(233)) AS roundtrip_ok
        |FROM n JOIN documents s ON s.doc_id = n.doc_id""".stripMargin) { (s, dir) =>
      import graft.functions.NfcNormalize
      val dec = regexp_replace(col("text"), "e", "é")
      Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("text"), dec.as("dec"))
        .select(col("doc_id"),
          length(col("dec")).cast("bigint").as("len_decomposed"),
          length(NfcNormalize(col("dec"))).cast("bigint").as("len_nfc"),
          (NfcNormalize(col("dec")) === translate(col("text"), "e", "é"))
            .as("roundtrip_ok"))
    },

    // ---------------------------------------------------------------- q159
    // Video frame sampling with REAL per-frame decode — the multimodal trio's
    // third member. A "clip" is an ordered set of encoded frames (the row
    // shape a container demuxer produces; no video-container codec ships in
    // the JDK, but the frames themselves are real PNGs). The load-bearing
    // order: SAMPLE (every 2nd frame) BEFORE decode — the dropped frames'
    // bytes are never decoded, which is the entire economics of frame
    // sampling at 100 TB. Decoded pixel statistics aggregate back to clip
    // grain; the oracle replays the closed-form pixel function over exactly
    // the sampled frame ids.
    Q("q159_video_frames",
      """WITH c AS (SELECT doc_id, 4 + doc_id % 5 AS nf FROM documents),
        |fr AS (SELECT c.doc_id, c.nf, c.doc_id*16 + f.i AS fid
        |       FROM c, range(8) f(i) WHERE f.i < c.nf AND f.i % 2 = 0),
        |d AS (SELECT doc_id, nf, fid, 8 + (fid % 9) AS w, 8 + ((fid*3) % 9) AS h
        |      FROM fr),
        |px AS (SELECT d.*, x.i AS x, y.i AS y
        |       FROM d, range(16) x(i), range(16) y(i)
        |       WHERE x.i < d.w AND y.i < d.h)
        |SELECT doc_id AS clip_id, CAST(MAX(nf) AS INT) AS n_frames,
        |  CAST(count(DISTINCT fid) AS BIGINT) AS n_sampled,
        |  CAST(count(*) AS BIGINT) AS n_pixels,
        |  CAST(SUM((fid*7 + x) % 256) AS BIGINT) AS sum_r,
        |  CAST(SUM((x + y) % 256) AS BIGINT) AS sum_g,
        |  CAST(SUM((fid + 3*y) % 256) AS BIGINT) AS sum_b
        |FROM px GROUP BY doc_id""".stripMargin) { (s, dir) =>
      val clips = Tables.load(s, dir, "documents")
        .select(col("doc_id"), (lit(4) + col("doc_id") % 5).cast("int").as("nf"))
      val frames = clips
        .select(col("doc_id"), col("nf"),
          explode(sequence(lit(0), col("nf") - 1)).as("f"))
        .withColumn("fid", col("doc_id") * 16 + col("f"))
      val sampled = Media.sampleFrames(frames, "f", 2)
      val decoded = Media.decodeImages(Media.renderPngs(sampled.select(col("fid"))))
        .toDF() // media_id = fid; clip and frame recover by construction
        .withColumn("clip_id", floor(col("media_id") / 16))
      decoded
        .join(broadcast(clips.withColumnRenamed("doc_id", "clip_id")), Seq("clip_id"))
        .groupBy(col("clip_id"))
        .agg(max(col("nf")).as("n_frames"),
          count(lit(1)).as("n_sampled"),
          sum(col("n_pixels")).cast("bigint").as("n_pixels"),
          sum(col("sum_r")).cast("bigint").as("sum_r"),
          sum(col("sum_g")).cast("bigint").as("sum_g"),
          sum(col("sum_b")).cast("bigint").as("sum_b"))
    },

    // ---------------------------------------------------------------- q167
    // End-to-end curation funnel — the composed pipeline a pretraining run
    // actually executes, with per-stage survivor accounting (the report
    // every curation run publishes): raw → exact dedup (md5 of text) →
    // near-dup removal (bag-of-words key: same vocabulary = same content
    // reordered) → language agreement (q28's classifier must confirm the
    // declared lang) → quality floor (≥ 20 tokens AND ≥ 5% function words
    // OF THE PREDICTED LANGUAGE — an English stopword ratio would silently
    // purge correct non-English text). Dedup runs FIRST (the Dolma order):
    // it's the cheapest stage per byte and every later stage then scores
    // each surviving document exactly once. One per-doc feature pass is
    // computed once (localCheckpoint) and all five stage aggregates read it.
    Q("q167_curation_funnel", {
      val Seq(en, es, de, fr) = TextAnalysis.langProfiles.map(p => profileSql(p._2))
      s"""WITH t AS (SELECT doc_id, lang, text,
        |            string_split_regex(trim(text), '\\s+') AS toks FROM documents),
        |f AS (SELECT doc_id, lang, toks, text, len(toks) AS n_tokens,
        |  len(list_filter(toks, x -> x IN $en)) AS s_en,
        |  len(list_filter(toks, x -> x IN $es)) AS s_es,
        |  len(list_filter(toks, x -> x IN $de)) AS s_de,
        |  len(list_filter(toks, x -> x IN $fr)) AS s_fr FROM t),
        |p AS (SELECT *,
        |  CASE WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr THEN s_en
        |       WHEN s_es >= s_de AND s_es >= s_fr THEN s_es
        |       WHEN s_de >= s_fr THEN s_de ELSE s_fr END AS s_pred,
        |  CASE WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr THEN 'en'
        |       WHEN s_es >= s_de AND s_es >= s_fr THEN 'es'
        |       WHEN s_de >= s_fr THEN 'de' ELSE 'fr' END AS pred FROM f),
        |d2 AS (SELECT * FROM p
        |  QUALIFY row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1),
        |d3 AS (SELECT * FROM d2 QUALIFY row_number() OVER (
        |  PARTITION BY md5(array_to_string(list_sort(list_distinct(toks)), ' '))
        |  ORDER BY doc_id) = 1),
        |d4 AS (SELECT * FROM d3 WHERE pred = lang),
        |d5 AS (SELECT * FROM d4 WHERE n_tokens >= 20 AND 20 * s_pred >= n_tokens)
        |SELECT 1 AS stage, 'raw' AS stage_name, count(*) AS n_docs,
        |  CAST(COALESCE(sum(n_tokens), 0) AS BIGINT) AS n_tokens FROM f
        |UNION ALL SELECT 2, 'exact_dedup', count(*), CAST(COALESCE(sum(n_tokens), 0) AS BIGINT) FROM d2
        |UNION ALL SELECT 3, 'neardup_bow', count(*), CAST(COALESCE(sum(n_tokens), 0) AS BIGINT) FROM d3
        |UNION ALL SELECT 4, 'lang_agree', count(*), CAST(COALESCE(sum(n_tokens), 0) AS BIGINT) FROM d4
        |UNION ALL SELECT 5, 'quality', count(*), CAST(COALESCE(sum(n_tokens), 0) AS BIGINT) FROM d5""".stripMargin
    }) { (s, dir) =>
      import org.apache.spark.sql.DataFrame
      import org.apache.spark.sql.expressions.Window
      val toks = graft.dedup.MinHashLSH.tokensCol(col("text"))
      val scored = Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("lang"), col("text"), toks.as("toks"))
        .withColumn("n_tokens", size(col("toks")))
        .withColumns(TextAnalysis.langProfiles.map { case (l, words) =>
          s"s_$l" -> TextAnalysis.stopwordCount(col("toks"), words)
        }.toMap)
        .withColumn("pred", TextAnalysis.langIdCol(col("toks")))
        // score of the PREDICTED language (argmax score, = the CASE replay)
        .withColumn("s_pred", greatest(
          TextAnalysis.langProfiles.map(p => col(s"s_${p._1}")): _*))
        .localCheckpoint() // five stage aggregates read this one feature pass
      def keepFirst(df: DataFrame, key: org.apache.spark.sql.Column) =
        df.withColumn("__rk",
            row_number().over(Window.partitionBy(key).orderBy(col("doc_id"))))
          .filter(col("__rk") === 1).drop("__rk")
      val d2 = keepFirst(scored, md5(col("text")))
      val d3 = keepFirst(d2,
        md5(concat_ws(" ", array_sort(array_distinct(col("toks"))))))
      val d4 = d3.filter(col("pred") === col("lang"))
      val d5 = d4.filter(col("n_tokens") >= 20 &&
        lit(20) * col("s_pred") >= col("n_tokens"))
      def stage(df: DataFrame, idx: Int, name: String) =
        df.agg(count(lit(1)).as("n_docs"),
            coalesce(sum(col("n_tokens")), lit(0L)).cast("bigint").as("n_tokens"))
          .select(lit(idx).as("stage"), lit(name).as("stage_name"),
            col("n_docs"), col("n_tokens"))
      stage(scored, 1, "raw").unionAll(stage(d2, 2, "exact_dedup"))
        .unionAll(stage(d3, 3, "neardup_bow"))
        .unionAll(stage(d4, 4, "lang_agree"))
        .unionAll(stage(d5, 5, "quality"))
    },

    // ---------------------------------------------------------------- q204
    // Mixture SAMPLING to a token budget (q107 computed the weights; this
    // applies them — the step that actually builds the training mix):
    // temperature-flattened source weights w_s = floor(sqrt(chars_s·10^6))
    // (α = 0.5 — the multilingual-pretraining upweighting of scarce
    // sources), a total budget B = total_chars div 2 apportioned to
    // sources by the integer LARGEST-REMAINDER method (base = B·w div W,
    // +1 char to the k largest remainders, ties by source name — so the
    // allocation sums to B exactly, by construction, in integer
    // arithmetic), then a DETERMINISTIC hash-order document draw per
    // source: docs sorted by md5(doc_id), the greedy prefix whose
    // cumulative chars fits the source budget. Every step is replayable:
    // sqrt is IEEE-correctly-rounded (identical bits in both engines),
    // everything after it is BIGINT. Scale shape: one aggregate for the
    // allocation table (broadcast), one window per source for the prefix —
    // no shuffle beyond the source key; at 100 TB the B·w product needs
    // 128-bit or a rescale, noted inline. The oracle replays the
    // apportionment and the draw verbatim.
    Q("q204_mixture_sampling",
      """WITH s AS (SELECT source, CAST(sum(n_chars) AS BIGINT) AS chars
        |           FROM documents GROUP BY 1),
        |w AS (SELECT source, chars,
        |  CAST(floor(sqrt(CAST(chars AS DOUBLE) * 1000000)) AS BIGINT) AS wt
        |  FROM s),
        |t AS (SELECT CAST(sum(wt) AS BIGINT) AS tw,
        |  CAST(sum(chars) AS BIGINT) // 2 AS b FROM w),
        |a0 AS (SELECT source, chars, wt, (b * wt) // tw AS base,
        |  (b * wt) % tw AS rem FROM w CROSS JOIN t),
        |k AS (SELECT b - sum(base) AS k FROM a0 CROSS JOIN t GROUP BY b),
        |alloc AS (SELECT source, chars,
        |  base + CASE WHEN row_number() OVER (ORDER BY rem DESC, source) <= k
        |              THEN 1 ELSE 0 END AS budget
        |  FROM a0 CROSS JOIN k),
        |d AS (SELECT doc_id, source, n_chars,
        |  md5(CAST(doc_id AS VARCHAR)) AS h FROM documents),
        |r AS (SELECT d.*, sum(n_chars) OVER (PARTITION BY source
        |  ORDER BY h, doc_id ROWS UNBOUNDED PRECEDING) AS cum FROM d),
        |sel AS (SELECT r.source, r.n_chars, a.budget FROM r
        |        JOIN alloc a USING (source) WHERE r.cum <= a.budget)
        |SELECT source, CAST(budget AS BIGINT) AS char_budget,
        |  CAST(count(*) AS BIGINT) AS n_docs_sel,
        |  CAST(sum(n_chars) AS BIGINT) AS chars_sel
        |FROM sel GROUP BY 1, 2""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("source"), col("n_chars"))
      val bySrc = docs.groupBy(col("source"))
        .agg(sum(col("n_chars")).cast("long").as("chars"))
        .withColumn("wt",
          floor(sqrt(col("chars").cast("double") * 1e6)).cast("long"))
      val totals = bySrc.agg(sum(col("wt")).cast("long").as("tw"),
        expr("CAST(sum(chars) AS BIGINT) div 2").as("b"))
      // integer apportionment; B·w ~ 10^14 at sf0.1 — rescale wt (drop the
      // 10^6 factor) before a 100 TB run or the product needs 128-bit
      val a0 = bySrc.crossJoin(broadcast(totals))
        .withColumn("base", expr("(b * wt) div tw"))
        .withColumn("rem", expr("(b * wt) % tw"))
      val k = a0.agg((max(col("b")) - sum(col("base"))).cast("long").as("k"))
      val alloc = a0.crossJoin(broadcast(k))
        .withColumn("budget", col("base") + when(
          row_number().over(Window.orderBy(col("rem").desc, col("source").asc))
            <= col("k"), 1L).otherwise(0L))
        .select(col("source"), col("budget"))
        .localCheckpoint() // tiny; read by a require and the final join
      // allocation sums to B exactly — the largest-remainder invariant
      val b = totals.head().getLong(1)
      require(alloc.agg(sum(col("budget"))).head().getLong(0) == b,
        "q204: apportioned budgets must sum to the total budget exactly")
      // deterministic hash-order greedy prefix per source
      val ordered = docs
        .withColumn("h", md5(col("doc_id").cast("string").cast("binary")))
        .withColumn("cum", sum(col("n_chars")).over(
          Window.partitionBy(col("source"))
            .orderBy(col("h").asc, col("doc_id").asc)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val sel = ordered.join(broadcast(alloc), Seq("source"))
        .filter(col("cum") <= col("budget"))
      val out = sel.groupBy(col("source"), col("budget").as("char_budget"))
        .agg(count(lit(1)).cast("bigint").as("n_docs_sel"),
          sum(col("n_chars")).cast("bigint").as("chars_sel"))
        .localCheckpoint()
      // every selected set fits its budget
      require(out.filter(col("chars_sel") > col("char_budget")).isEmpty,
        "q204: a selected prefix exceeded its source budget")
      out
    },

    // ---------------------------------------------------------------- q205
    // BPE ENCODING of the whole corpus with the q196-trained merges — the
    // tokenizer-application half a pretraining pipeline runs on every
    // document after training converges. Train (same loop as q196: one
    // keyed pair-count shuffle per merge over the top-200 word table),
    // then encode: the DISTINCT alpha word table is folded through the 20
    // merges in order (leftmost-greedy, the exact training fold), and the
    // corpus joins word → token-count by equi-join; non-alpha terms fall
    // back to one token. Scale shape: encoding cost is O(distinct words)
    // for the folds — corpus size enters only through the final broadcast
    // join, never a per-occurrence fold; at 100 TB the distinct-word table
    // is the tokenizer's vocab-induction working set, exactly as in
    // SentencePiece's distributed trainers. The oracle replays training
    // AND encoding as driver-unrolled SQL (materialized CTE per step).
    Q("q205_bpe_encode", {
      val n = 20
      val head =
        """WITH tok AS (SELECT lang, unnest(string_split_regex(trim(text), '\s+')) AS term
          |            FROM documents),
          |w AS (SELECT lower(term) AS word, count(*) AS cnt FROM tok
          |      WHERE regexp_full_match(lower(term), '[a-z]+') GROUP BY 1),
          |top AS (SELECT word, cnt FROM w ORDER BY cnt DESC, word LIMIT 200),
          |st0 AS MATERIALIZED (SELECT word, cnt, string_split(word, '') AS syms FROM top)""".stripMargin
      val train = (1 to n).map { i =>
        val pair =
          s"""px$i AS MATERIALIZED (SELECT word, cnt, unnest(syms) AS s, generate_subscripts(syms, 1) AS pos FROM st${i - 1}),
             |pc$i AS (SELECT x.s AS a, y.s AS b, CAST(SUM(x.cnt) AS BIGINT) AS n
             |        FROM px$i x JOIN px$i y ON x.word = y.word AND y.pos = x.pos + 1 GROUP BY 1, 2),
             |b$i AS (SELECT a, b FROM pc$i ORDER BY n DESC, a, b LIMIT 1)""".stripMargin
        val reseg = if (i == n) "" else
          s""",
             |st$i AS MATERIALIZED (SELECT word, cnt, string_split(list_reduce(syms, (acc, x) ->
             |    CASE WHEN (string_split(acc, ' '))[-1] = b$i.a AND x = b$i.b
             |         THEN left(acc, length(acc) - length(b$i.a)) || b$i.a || b$i.b
             |         ELSE acc || ' ' || x END), ' ') AS syms FROM st${i - 1}, b$i)""".stripMargin
        pair + reseg
      }.mkString(",\n", ",\n", "")
      val encHead =
        """,
          |e0 AS MATERIALIZED (SELECT DISTINCT lower(term) AS word FROM tok
          |     WHERE regexp_full_match(lower(term), '[a-z]+')),
          |f0 AS MATERIALIZED (SELECT word, string_split(word, '') AS syms FROM e0)""".stripMargin
      val encode = (1 to n).map { i =>
        s"""f$i AS MATERIALIZED (SELECT word, string_split(list_reduce(syms, (acc, x) ->
           |    CASE WHEN (string_split(acc, ' '))[-1] = b$i.a AND x = b$i.b
           |         THEN left(acc, length(acc) - length(b$i.a)) || b$i.a || b$i.b
           |         ELSE acc || ' ' || x END), ' ') AS syms FROM f${i - 1}, b$i)""".stripMargin
      }.mkString(",\n", ",\n", "")
      val tail =
        s""",
           |wt AS (SELECT word, len(syms) AS n_tok FROM f$n),
           |terms AS (SELECT lang, lower(term) AS w,
           |  regexp_full_match(lower(term), '[a-z]+') AS alpha FROM tok)
           |SELECT lang, CAST(count(*) AS BIGINT) AS n_terms,
           |  CAST(sum(CASE WHEN alpha THEN n_tok ELSE 1 END) AS BIGINT) AS n_tokens,
           |  round(CAST(sum(CASE WHEN alpha THEN n_tok ELSE 1 END) AS DOUBLE)
           |    / count(*), 6) AS tokens_per_term
           |FROM terms LEFT JOIN wt ON terms.w = wt.word
           |GROUP BY 1""".stripMargin
      head + train + encHead + encode + tail
    }) { (s, dir) =>
      val nMerges = 20
      val docs = Tables.load(s, dir, "documents")
      val terms = docs.select(col("lang"),
        explode(graft.dedup.MinHashLSH.tokensCol(col("text"))).as("term"))
        .select(col("lang"), lower(col("term")).as("w"))
        .withColumn("alpha", col("w").rlike("^[a-z]+$"))
      // ---- train: distributed corpus counts -> driver-side merge loop
      // over the 200-row segmentation state (bpeTrainDriver, round-18)
      val st0 = terms.filter(col("alpha")).groupBy(col("w").as("word"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("word").asc).limit(200)
        .collect()
        .map(r => (r.getString(0), r.getLong(1),
          r.getString(0).map(_.toString).toVector)).toSeq
      val merges = bpeTrainDriver(st0, nMerges)._1
        .map { case (_, a, b, _) => (a, b) }
      def foldCol(ba: String, bb: String): org.apache.spark.sql.Column =
        split(aggregate(col("syms"), lit(""), (acc, x) =>
          when(acc === "", x)
            .otherwise(when(element_at(split(acc, " "), -1) === ba && x === bb,
              concat(acc.substr(lit(1), length(acc) - lit(ba.length)), lit(ba + bb)))
            .otherwise(concat(acc, lit(" "), x)))), " ")
      // ---- encode: fold the DISTINCT word table through all merges ----
      var enc = terms.filter(col("alpha")).select(col("w").as("word")).distinct()
        .select(col("word"),
          filter(split(col("word"), ""), x => x =!= lit("")).as("syms"))
        .localCheckpoint()
      for (((ba, bb), i) <- merges.zipWithIndex) {
        enc = enc.select(col("word"), foldCol(ba, bb).as("syms"))
        if ((i + 1) % 5 == 0) enc = enc.localCheckpoint()
      }
      val wt = enc.select(col("word"), size(col("syms")).cast("long").as("n_tok"))
      terms.join(broadcast(wt), terms("w") === wt("word"), "left")
        .withColumn("toks", when(col("alpha"), col("n_tok")).otherwise(1L))
        .groupBy(col("lang"))
        .agg(count(lit(1)).cast("bigint").as("n_terms"),
          sum(col("toks")).cast("bigint").as("n_tokens"),
          round(sum(col("toks")).cast("double") / count(lit(1)), 6)
            .as("tokens_per_term"))
    },

    // ---------------------------------------------------------------- q235
    // LM QUALITY TERCILES (the CCNet design, Wenzek et al. '20: score every
    // document with a language model trained on a clean reference corpus,
    // split into head/middle/tail terciles; tail is discarded or
    // down-weighted). The LM is an add-one-smoothed bigram model trained on
    // the in-corpus 'en' slice; the per-token surprise is kept EXACT as a
    // scaled integer division (1e6·(c(prev)+V)) div (c(prev,tok)+1) — the
    // catalog's rational-arithmetic discipline: no libm log whose low bits
    // could differ across engines, one double division per doc at the end.
    // The tercile split avoids the classic scale-killer: no global
    // single-partition window — the global rank comes from the distributed
    // range-repartition + zipWithIndex pass (SurrogateKeys), and ntile's
    // exact bucket arithmetic is applied closed-form to the rank.
    Q("q235_lm_terciles",
      """WITH tokl AS (SELECT doc_id, lang,
        |    string_split_regex(trim(text), '\s+') AS ts FROM documents),
        |tok AS (SELECT doc_id, lang, unnest(ts) AS term,
        |    unnest(generate_series(1, len(ts))) AS pos FROM tokl),
        |big AS (SELECT doc_id, lang,
        |    lag(term) OVER (PARTITION BY doc_id ORDER BY pos) AS prev, term
        |  FROM tok),
        |bg AS (SELECT * FROM big WHERE prev IS NOT NULL),
        |refv AS (SELECT CAST(count(DISTINCT term) AS BIGINT) AS v
        |  FROM tok WHERE lang = 'en'),
        |cp AS (SELECT prev, term, CAST(count(*) AS BIGINT) AS cpair
        |  FROM bg WHERE lang = 'en' GROUP BY 1, 2),
        |cv AS (SELECT prev, CAST(count(*) AS BIGINT) AS cprev
        |  FROM bg WHERE lang = 'en' GROUP BY 1),
        |sc AS (SELECT b.doc_id,
        |    (1000000 * (COALESCE(cv.cprev, 0) + refv.v))
        |      // (COALESCE(cp.cpair, 0) + 1) AS surprise
        |  FROM bg b LEFT JOIN cp ON b.prev = cp.prev AND b.term = cp.term
        |    LEFT JOIN cv ON b.prev = cv.prev CROSS JOIN refv),
        |ds AS (SELECT doc_id, sum(surprise) AS sn, count(*) AS np
        |  FROM sc GROUP BY 1),
        |scored AS (SELECT doc_id, round(CAST(sn AS DOUBLE) / np, 6) AS score
        |  FROM ds),
        |terc AS (SELECT doc_id, score,
        |    CAST(ntile(3) OVER (ORDER BY score, doc_id) AS INT) AS tercile
        |  FROM scored)
        |SELECT tercile, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(doc_id) AS BIGINT) AS id_sum,
        |  min(score) AS min_score, max(score) AS max_score
        |FROM terc GROUP BY 1""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val tok = Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          posexplode(graft.dedup.MinHashLSH.tokensCol(col("text"))))
        .toDF("doc_id", "lang", "pos", "term")
      val w = Window.partitionBy("doc_id").orderBy("pos")
      val bg = tok.withColumn("prev", lag(col("term"), 1).over(w))
        .filter(col("prev").isNotNull)
        .localCheckpoint() // three aggregations + the scoring join read it
      val en = col("lang") === "en"
      val v = tok.filter(en).select("term").distinct().count()
      val cp = bg.filter(en).groupBy("prev", "term")
        .agg(count(lit(1)).as("cpair"))
      val cv = bg.filter(en).groupBy("prev").agg(count(lit(1)).as("cprev"))
      val sc = bg.join(cp, Seq("prev", "term"), "left")
        .join(cv, Seq("prev"), "left")
        .select(col("doc_id"), expr(
          s"(1000000 * (coalesce(cprev, 0L) + ${v}L)) div (coalesce(cpair, 0L) + 1L)")
          .as("surprise"))
      val scored = sc.groupBy("doc_id")
        .agg(sum("surprise").as("sn"), count(lit(1)).as("np"))
        .select(col("doc_id"),
          round(col("sn").cast("double") / col("np"), 6).as("score"))
      // exact global ntile WITHOUT a single-partition window: distributed
      // rank, then ntile's bucket arithmetic in closed form
      val n = scored.count()
      val ranked = graft.ops.SurrogateKeys.assign(scored, "rk", 0L,
        Seq("score", "doc_id"))
      val (q3, rem) = (n / 3, n % 3)
      val terc = ranked.withColumn("tercile", expr(
        s"CAST(IF(rk <= ${rem * (q3 + 1)}L, (rk - 1) div ${q3 + 1}L + 1, " +
          s"$rem + (rk - 1 - ${rem * (q3 + 1)}L) div ${q3}L + 1) AS INT)"))
      terc.groupBy(col("tercile"))
        .agg(count(lit(1)).cast("bigint").as("n_docs"),
          sum(col("doc_id")).cast("bigint").as("id_sum"),
          min(col("score")).as("min_score"), max(col("score")).as("max_score"))
    },

    // ---------------------------------------------------------------- q236
    // DSIR — data selection via importance resampling (Xie et al. '23):
    // represent target and raw distributions over HASHED n-gram buckets
    // (here: bigrams md5-hashed into 256 buckets, the paper's hashed
    // feature space), weight every raw document by its per-feature
    // target/raw likelihood ratio, and keep the top-K. The per-bucket
    // smoothed ratio is held exact as a scaled integer division (the
    // paper's log-weight sum is replaced by the mean scaled ratio — same
    // machinery, rational arithmetic for cross-engine bit-parity, and
    // deterministic top-K instead of Gumbel sampling). Scale shape: bucket
    // stats are two O(corpus) aggregations onto 256 rows, the scoring join
    // is a BROADCAST of those 256 rows, and selection is a bounded
    // TakeOrdered — no shuffle carries the corpus more than once.
    Q("q236_dsir_select",
      """WITH tokl AS (SELECT doc_id, lang,
        |    string_split_regex(trim(text), '\s+') AS ts FROM documents),
        |tok AS (SELECT doc_id, lang, unnest(ts) AS term,
        |    unnest(generate_series(1, len(ts))) AS pos FROM tokl),
        |big AS (SELECT doc_id, lang,
        |    lag(term) OVER (PARTITION BY doc_id ORDER BY pos) AS prev, term
        |  FROM tok),
        |bg AS (SELECT doc_id, lang,
        |    CAST('0x' || substring(md5(prev || '|' || term), 1, 6) AS BIGINT)
        |      % 256 AS bucket
        |  FROM big WHERE prev IS NOT NULL),
        |nt AS (SELECT CAST(count(*) AS BIGINT) AS n FROM bg WHERE lang = 'en'),
        |nr AS (SELECT CAST(count(*) AS BIGINT) AS n FROM bg),
        |ct AS (SELECT bucket, CAST(count(*) AS BIGINT) AS ct
        |  FROM bg WHERE lang = 'en' GROUP BY 1),
        |cr AS (SELECT bucket, CAST(count(*) AS BIGINT) AS cr FROM bg GROUP BY 1),
        |rat AS (SELECT cr.bucket,
        |    (1000000 * (COALESCE(ct.ct, 0) + 1) * (nr.n + 256))
        |      // ((cr.cr + 1) * (nt.n + 256)) AS ratio
        |  FROM cr LEFT JOIN ct USING (bucket) CROSS JOIN nt CROSS JOIN nr),
        |dw AS (SELECT b.doc_id, sum(r.ratio) AS wn, count(*) AS np
        |  FROM bg b JOIN rat r USING (bucket) GROUP BY 1),
        |scored AS (SELECT doc_id, round(CAST(wn AS DOUBLE) / np, 6) AS w
        |  FROM dw),
        |sel AS (SELECT doc_id, w FROM scored ORDER BY w DESC, doc_id LIMIT 40)
        |SELECT d.lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(d.doc_id) AS BIGINT) AS id_sum,
        |  min(sel.w) AS min_w, max(sel.w) AS max_w
        |FROM sel JOIN documents d USING (doc_id) GROUP BY 1""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.load(s, dir, "documents")
      val tok = docs.select(col("doc_id"), col("lang"),
          posexplode(graft.dedup.MinHashLSH.tokensCol(col("text"))))
        .toDF("doc_id", "lang", "pos", "term")
      val w = Window.partitionBy("doc_id").orderBy("pos")
      val bg = tok.withColumn("prev", lag(col("term"), 1).over(w))
        .filter(col("prev").isNotNull)
        .select(col("doc_id"), col("lang"), expr(
          "CAST(conv(substring(md5(concat(prev, '|', term)), 1, 6), 16, 10) " +
            "AS BIGINT) % 256").as("bucket"))
        .localCheckpoint() // four consumers; hash the corpus once
      val en = col("lang") === "en"
      val nt = bg.filter(en).count()
      val nr = bg.count()
      val ct = bg.filter(en).groupBy("bucket").agg(count(lit(1)).as("ct"))
      val cr = bg.groupBy("bucket").agg(count(lit(1)).as("cr"))
      val rat = cr.join(ct, Seq("bucket"), "left")
        .select(col("bucket"), expr(
          s"(1000000 * (coalesce(ct, 0L) + 1L) * ${nr + 256}L) " +
            s"div ((cr + 1L) * ${nt + 256}L)").as("ratio"))
      val scored = bg.join(broadcast(rat), Seq("bucket"))
        .groupBy("doc_id").agg(sum("ratio").as("wn"), count(lit(1)).as("np"))
        .select(col("doc_id"),
          round(col("wn").cast("double") / col("np"), 6).as("w"))
      val sel = scored.orderBy(col("w").desc, col("doc_id").asc).limit(40)
      sel.join(docs.select("doc_id", "lang"), Seq("doc_id"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).cast("bigint").as("n_docs"),
          sum(col("doc_id")).cast("bigint").as("id_sum"),
          min(col("w")).as("min_w"), max(col("w")).as("max_w"))
    },

    // ---------------------------------------------------------------- q241
    // TRAINING EXPORT: deterministic shuffle -> shard -> cross-doc
    // sequence packing — the last mile of a pretraining pipeline. The
    // permutation is content-addressed (md5 of an epoch salt + doc id:
    // stable across runs, engines, and re-ingestion — the q48 discipline,
    // never a random draw), shards are hash buckets of the same key, and
    // within a shard WHOLE DOCS pack greedily into fixed-token-budget
    // sequences via the q64 cumsum-div trick — one keyed window per
    // shard, so shards are the parallel unit (at 100 TB: thousands of
    // shards, zero cross-shard coordination, resumable per shard). The
    // manifest aggregates per shard: docs, sequences, tokens, and the
    // fill shape.
    Q("q241_training_export",
      """WITH t AS (SELECT doc_id,
        |    len(string_split_regex(trim(text), '\s+')) AS n_tok,
        |    md5('epoch1|' || CAST(doc_id AS VARCHAR)) AS sk
        |  FROM documents),
        |sh AS (SELECT doc_id, n_tok, sk,
        |    CAST('0x' || substring(sk, 1, 6) AS BIGINT) % 8 AS shard FROM t),
        |packed AS (SELECT shard, doc_id, n_tok, sk,
        |    (SUM(n_tok) OVER (PARTITION BY shard ORDER BY sk, doc_id
        |      ROWS UNBOUNDED PRECEDING) - n_tok) // 256 AS seq_id
        |  FROM sh),
        |seqs AS (SELECT shard, seq_id, count(*) AS n_docs,
        |    sum(n_tok) AS seq_tokens FROM packed GROUP BY 1, 2)
        |SELECT shard, CAST(sum(n_docs) AS BIGINT) AS n_docs,
        |  CAST(count(*) AS BIGINT) AS n_seqs,
        |  CAST(sum(seq_tokens) AS BIGINT) AS total_tokens,
        |  CAST(max(seq_tokens) AS BIGINT) AS max_seq_tokens
        |FROM seqs GROUP BY 1""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val t = Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          size(graft.dedup.MinHashLSH.tokensCol(col("text"))).as("n_tok"),
          md5(concat(lit("epoch1|"), col("doc_id").cast("string"))).as("sk"))
        .withColumn("shard", expr(
          "CAST(conv(substring(sk, 1, 6), 16, 10) AS BIGINT) % 8"))
      val w = Window.partitionBy("shard").orderBy(col("sk"), col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val packed = t
        .withColumn("__cum", sum(col("n_tok")).over(w))
        .withColumn("seq_id", expr("(__cum - n_tok) div 256L"))
      packed.groupBy(col("shard"), col("seq_id"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("seq_tokens"))
        .groupBy(col("shard"))
        .agg(sum(col("n_docs")).cast("bigint").as("n_docs"),
          count(lit(1)).cast("bigint").as("n_seqs"),
          sum(col("seq_tokens")).cast("bigint").as("total_tokens"),
          max(col("seq_tokens")).cast("bigint").as("max_seq_tokens"))
    },

    // ---------------------------------------------------------------- q250
    // WINSORIZED LENGTH STATS — outlier clipping at EXACT nearest-rank
    // percentiles (the pre-tokenization length-sanitization step of a
    // curation pipeline), with both scale traps closed: the percentile
    // is exact (no approx-quantile epsilon that drifts across engines)
    // yet computed WITHOUT a single-partition sort — the global rank
    // comes from the distributed range-repartition + zipWithIndex pass,
    // and the rank positions use pure integer arithmetic
    // ((5n+99) div 100, never ceil(0.05·n) whose float product can
    // straddle the integer boundary differently per engine). The p05/p95
    // bounds then broadcast as two scalars.
    Q("q250_winsorized_lengths",
      """WITH t AS (SELECT doc_id, lang, n_chars FROM documents),
        |r AS (SELECT doc_id, lang, n_chars,
        |    row_number() OVER (ORDER BY n_chars, doc_id) AS rn,
        |    count(*) OVER () AS n FROM t),
        |b AS (SELECT
        |    max(CASE WHEN rn = (5 * n + 99) // 100 THEN n_chars END) AS lo,
        |    max(CASE WHEN rn = (95 * n + 99) // 100 THEN n_chars END) AS hi
        |  FROM r),
        |c AS (SELECT lang,
        |    CASE WHEN n_chars < lo THEN lo
        |         WHEN n_chars > hi THEN hi ELSE n_chars END AS w,
        |    CASE WHEN n_chars < lo THEN 1 ELSE 0 END AS cl,
        |    CASE WHEN n_chars > hi THEN 1 ELSE 0 END AS ch
        |  FROM t CROSS JOIN b)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(w) AS BIGINT) AS clamped_chars,
        |  CAST(sum(cl) AS BIGINT) AS n_lo, CAST(sum(ch) AS BIGINT) AS n_hi
        |FROM c GROUP BY 1""".stripMargin) { (s, dir) =>
      val t = Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("lang"), col("n_chars"))
      val n = t.count()
      val ranked = graft.ops.SurrogateKeys.assign(t, "rn", 0L,
        Seq("n_chars", "doc_id"))
      val loRank = (5 * n + 99) / 100
      val hiRank = (95 * n + 99) / 100
      val lo = ranked.filter(col("rn") === loRank)
        .head.getAs[Long]("n_chars")
      val hi = ranked.filter(col("rn") === hiRank)
        .head.getAs[Long]("n_chars")
      t.select(col("lang"),
          when(col("n_chars") < lo, lo)
            .when(col("n_chars") > hi, hi)
            .otherwise(col("n_chars")).as("w"),
          when(col("n_chars") < lo, 1).otherwise(0).as("cl"),
          when(col("n_chars") > hi, 1).otherwise(0).as("ch"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).cast("bigint").as("n_docs"),
          sum(col("w")).cast("bigint").as("clamped_chars"),
          sum(col("cl")).cast("bigint").as("n_lo"),
          sum(col("ch")).cast("bigint").as("n_hi"))
    },

    // ---------------------------------------------------------------- q329
    // CHAT-TEMPLATE RENDERING + ALTERNATION GATING over the
    // conversation-turn column (round 18: turns became first-class, so
    // the ops a chat-training pipeline runs daily come with them):
    // render each `turns array<struct<role,content>>` into ONE training
    // string under a role-tag template, and gate on structural validity
    // — roles must alternate user/assistant from 'user'. Everything is
    // higher-order column functions (transform / zip_with / forall /
    // concat_ws), fully codegen'd, zero UDFs, zero shuffles beyond the
    // final projection — at 100 TB this renders per-partition at scan
    // speed. The oracle replays on an EXPLODED (conv, pos) twin with
    // string_agg ORDER BY pos, so array order is load-bearing on both
    // sides. Invalid conversations (a doubled 'user' turn planted on
    // conv%11) must gate FALSE, never silently render as training rows.
    Q("q329_chat_template",
      """WITH docs AS (SELECT doc_id AS conv_id, text FROM documents),
        |n AS (SELECT conv_id, 2 + conv_id % 3 AS nt, text FROM docs),
        |t AS (SELECT conv_id, nt, unnest(range(nt)) AS pos, text FROM n),
        |turn AS (SELECT conv_id, nt, pos,
        |    CASE WHEN conv_id % 11 = 0 AND pos = 1 THEN 'user'
        |         WHEN pos % 2 = 0 THEN 'user' ELSE 'assistant' END AS role,
        |    substr(text, CAST(1 + pos * 7 AS INT), 25) AS content
        |  FROM t),
        |agg AS (SELECT conv_id, CAST(max(nt) AS BIGINT) AS n_turns,
        |    bool_and(role = CASE WHEN pos % 2 = 0 THEN 'user'
        |      ELSE 'assistant' END) AS valid,
        |    string_agg('<|' || role || '|>' || content, ''
        |      ORDER BY pos) || '<|end|>' AS rendered
        |  FROM turn GROUP BY conv_id)
        |SELECT conv_id, n_turns, valid, rendered,
        |  CAST(length(rendered) - length(replace(rendered, ' ', ''))
        |    AS BIGINT) AS space_n
        |FROM agg""".stripMargin) { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
        .select(col("doc_id").as("conv_id"), col("text"))
        .withColumn("nt", (col("conv_id") % 3 + 2).cast("int"))
      val withTurns = docs.withColumn("turns",
        transform(sequence(lit(0), col("nt") - 1), i =>
          struct(
            when(col("conv_id") % 11 === 0 && i === 1, "user")
              .when(i % 2 === 0, "user").otherwise("assistant").as("role"),
            col("text").substr(i * 7 + 1, lit(25)).as("content"))))
      withTurns.select(
          col("conv_id"),
          size(col("turns")).cast("bigint").as("n_turns"),
          forall(zip_with(col("turns"),
              sequence(lit(0), size(col("turns")) - 1),
              (x, i) => x.getField("role") ===
                when(i % 2 === 0, "user").otherwise("assistant")),
            b => b).as("valid"),
          concat(concat_ws("", transform(col("turns"), x =>
              concat(lit("<|"), x.getField("role"), lit("|>"),
                x.getField("content")))), lit("<|end|>")).as("rendered"))
        .withColumn("space_n",
          (length(col("rendered")) -
            length(expr("replace(rendered, ' ', '')"))).cast("bigint"))
    })
}
