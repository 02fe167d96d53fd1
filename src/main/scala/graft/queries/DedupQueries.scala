package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.dedup.{Components, MinHashLSH, NgramJaccard, SimHash, SpanDedup}

/** Deduplication operator family over the `documents` corpus: exact,
  * MinHash+LSH, SimHash, exact n-gram Jaccard. All md5-keyed so every stage
  * is oracle-checkable.
  */
object DedupQueries {

  /** The Kirsch–Mitzenmacher minhash family, DuckDB dialect: h_i = (a + i·b)
    * mod 2^32 over two 32-bit halves of md5(shingle) — one digest per
    * occurrence, matching [[MinHashLSH.signatures]] exactly.
    */
  private def sigSelect(k: Int): String =
    (0 until k).map(i => s"  min((a + $i*b) % 4294967296) AS h$i").mkString(",\n")

  /** Shared DuckDB CTE chain for the LSH pipeline: word-3gram shingle sets →
    * one md5 per shingle → 8 derived minhashes → 4 bands × 2 rows →
    * bucket-size pruning (`cap`) → distinct candidate pairs. Kept in one
    * place so q19/q22/q24 stay in lockstep with the Spark pipeline.
    */
  private def lshCtes(cap: Int): String =
    s"""WITH w AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents),
       |sh AS (SELECT DISTINCT doc_id, s AS shingle FROM (
       |  SELECT doc_id, unnest(list_transform(generate_series(1, greatest(len(w)-2, 1)),
       |                                       i -> array_to_string(w[i:i+2], ' '))) AS s
       |  FROM w)),
       |ab AS (SELECT doc_id,
       |  CAST('0x' || substring(md5(shingle), 1, 8) AS BIGINT) AS a,
       |  CAST('0x' || substring(md5(shingle), 9, 8) AS BIGINT) AS b
       |FROM sh),
       |sig AS (SELECT doc_id,
       |${sigSelect(8)}
       |FROM ab GROUP BY doc_id),
       |bands AS (
       |  SELECT doc_id, 0 AS band, md5(h0::VARCHAR||'|'||h1::VARCHAR) AS band_key FROM sig
       |  UNION ALL SELECT doc_id, 1, md5(h2::VARCHAR||'|'||h3::VARCHAR) FROM sig
       |  UNION ALL SELECT doc_id, 2, md5(h4::VARCHAR||'|'||h5::VARCHAR) FROM sig
       |  UNION ALL SELECT doc_id, 3, md5(h6::VARCHAR||'|'||h7::VARCHAR) FROM sig),
       |bsz AS (SELECT band, band_key, count(*) AS bs FROM bands GROUP BY 1, 2),
       |pruned AS (SELECT b.doc_id, b.band, b.band_key
       |  FROM bands b JOIN bsz USING (band, band_key) WHERE bs <= $cap),
       |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM pruned a JOIN pruned b ON a.band = b.band AND a.band_key = b.band_key
       |  WHERE a.doc_id < b.doc_id)""".stripMargin

  val all: Seq[Q] = Seq(

    // ---------------------------------------------------------------- q20
    // Exact dedup: group on the content hash (fixed-width shuffle key — at
    // 100 TB you never shuffle raw text), keep the min id as survivor.
    Q("q20_dedup_exact",
      """SELECT md5(text) AS text_hash, min(doc_id) AS doc_id, count(*) AS n_copies
        |FROM documents GROUP BY md5(text)""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "documents")
        .groupBy(md5(col("text")).as("text_hash"))
        .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_copies"))
    },

    // ---------------------------------------------------------------- q21
    // MinHash signatures: k=8 derived minhashes (one md5 per shingle, K-M
    // linear family) — one explode + one combiner-friendly aggregate.
    Q("q21_minhash_signatures",
      s"""WITH w AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents),
        |sh AS (SELECT DISTINCT doc_id, s AS shingle FROM (
        |  SELECT doc_id, unnest(list_transform(generate_series(1, greatest(len(w)-2, 1)),
        |                                       i -> array_to_string(w[i:i+2], ' '))) AS s
        |  FROM w)),
        |ab AS (SELECT doc_id,
        |  CAST('0x' || substring(md5(shingle), 1, 8) AS BIGINT) AS a,
        |  CAST('0x' || substring(md5(shingle), 9, 8) AS BIGINT) AS b
        |FROM sh)
        |SELECT doc_id,
        |${sigSelect(8)}
        |FROM ab GROUP BY doc_id""".stripMargin) { (s, dir) =>
      MinHashLSH.signatures(
        MinHashLSH.shingles(Tables.load(s, dir, "documents"), "doc_id", "text", 3,
          distinct = false), // min() is multiplicity-insensitive
        "doc_id", 8)
    },

    // ---------------------------------------------------------------- q22
    // LSH banding + bucket join: candidate near-dup pairs, 4 bands x 2 rows.
    // The only join is equi on (band, band_key) — no all-pairs expansion —
    // and the default mega-bucket cap is ON (both sides carry the same
    // bucket-size pruning; see q19 for a cap that binds on this corpus).
    Q("q22_lsh_candidates",
      lshCtes(MinHashLSH.DefaultBucketCap) +
        "\nSELECT id_a, id_b FROM cand") { (s, dir) =>
      MinHashLSH.candidates(Tables.load(s, dir, "documents"), "doc_id", "text",
        shingleLen = 3, k = 8, numBands = 4)
    },

    // ---------------------------------------------------------------- q19
    // The mega-bucket cap path, exercised: cap = 2 provably drops buckets on
    // this corpus (sf0.01 has 3-member buckets), proving the pruning join
    // keeps the pair expansion bounded at boilerplate-heavy scale.
    Q("q19_lsh_bucket_cap",
      lshCtes(2) + "\nSELECT id_a, id_b FROM cand") { (s, dir) =>
      MinHashLSH.candidates(Tables.load(s, dir, "documents"), "doc_id", "text",
        shingleLen = 3, k = 8, numBands = 4, maxBucketSize = 2)
    },

    // ---------------------------------------------------------------- q23
    // SimHash 32-bit signatures (±1 bit votes over md5-nibble bits).
    Q("q23_simhash",
      SimHash.oracleSignatureSql("documents", "doc_id", "text")) { (s, dir) =>
      SimHash.signatures32(Tables.load(s, dir, "documents"), "doc_id", "text")
    },

    // ---------------------------------------------------------------- q44
    // Quality-aware dedup survivor selection: within each near-dup block
    // (here: equal fingerprint fp_min), keep the highest-quality document —
    // the dedup + quality-score composition a curation pipeline runs.
    Q("q44_dedup_keep_best", {
      val en = graft.text.TextAnalysis.stopwordsEn.map(w => s"'$w'").mkString("(", ", ", ")")
      s"""WITH w AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents),
        |sh AS (SELECT DISTINCT doc_id, s FROM (
        |  SELECT doc_id, unnest(list_transform(generate_series(1, greatest(len(w)-2, 1)),
        |                                       i -> array_to_string(w[i:i+2], ' '))) AS s
        |  FROM w)),
        |fp AS (SELECT doc_id, min(md5(s)) AS fp_min FROM sh GROUP BY doc_id),
        |q AS (SELECT doc_id,
        |  len(list_filter(string_split_regex(trim(text), '\\s+'), x -> x IN $en)) AS n_stop
        |  FROM documents)
        |SELECT fp_min, doc_id, n_members FROM (
        |  SELECT fp.fp_min, fp.doc_id,
        |    count(*) OVER (PARTITION BY fp.fp_min) AS n_members,
        |    row_number() OVER (PARTITION BY fp.fp_min
        |      ORDER BY q.n_stop DESC, fp.doc_id) AS rn
        |  FROM fp JOIN q USING (doc_id))
        |WHERE rn = 1""".stripMargin
    }) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.load(s, dir, "documents")
      val fp = graft.text.TextAnalysis.fingerprints(docs, "doc_id", "text")
        .select(col("doc_id"), col("fp_min"))
      val q = docs.select(col("doc_id"),
        graft.text.TextAnalysis.stopwordCount(
          MinHashLSH.tokensCol(col("text")), graft.text.TextAnalysis.stopwordsEn).as("n_stop"))
      val joined = fp.join(q, Seq("doc_id"))
        .withColumn("n_members", count(lit(1)).over(Window.partitionBy(col("fp_min"))))
      val w = Window.partitionBy(col("fp_min"))
        .orderBy(col("n_stop").desc, col("doc_id").asc)
      joined.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .select(col("fp_min"), col("doc_id"), col("n_members"))
    },

    // ---------------------------------------------------------------- q124
    // Prefix-filtered set-similarity join (the PPJoin/AllPairs family,
    // Bayardo WWW'07; Xiao WWW'08) — the deterministic alternative to
    // MinHash+LSH for HIGH thresholds: order the vocabulary rarest-first,
    // keep only each doc's first |d| - ceil(θ|d|) + 1 tokens (pigeonhole: a
    // pair with jaccard >= θ MUST share a prefix token), join on prefix
    // tokens only, verify exactly. θ = 4/5 keeps every bound in integer
    // arithmetic. Scale shape: the candidate join is keyed on the RAREST
    // tokens (bounded fanout by construction — the stop-word mega-buckets
    // LSH must cap are excluded from prefixes entirely); the global token
    // ranking is a vocabulary-sized distributed zipWithIndex, never a
    // single-partition window.
    Q("q124_prefix_filter_join",
      """WITH tok AS (SELECT DISTINCT doc_id,
        |  unnest(string_split_regex(trim(text), '\s+')) AS term FROM documents
        |  WHERE doc_id < 600),
        |dfq AS (SELECT term, count(*) AS df FROM tok GROUP BY 1),
        |rk AS (SELECT term, row_number() OVER (ORDER BY df, term) AS rk FROM dfq),
        |sz AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY 1),
        |ordered AS (SELECT t.doc_id, t.term, s.n,
        |  row_number() OVER (PARTITION BY t.doc_id ORDER BY r.rk) AS pos
        |  FROM tok t JOIN rk r USING (term) JOIN sz s USING (doc_id)),
        |pref AS (SELECT doc_id, term FROM ordered
        |         WHERE pos <= n - (4 * n + 4) // 5 + 1),
        |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        |         FROM pref a JOIN pref b ON b.term = a.term AND a.doc_id < b.doc_id),
        |inter AS (SELECT c.id_a, c.id_b, count(*) AS inter FROM cand c
        |          JOIN tok x ON x.doc_id = c.id_a
        |          JOIN tok y ON y.doc_id = c.id_b AND y.term = x.term
        |          GROUP BY 1, 2)
        |SELECT id_a, id_b, inter, sa.n AS n_a, sb.n AS n_b,
        |  round(CAST(inter AS DOUBLE) / (sa.n + sb.n - inter), 6) AS jaccard
        |FROM inter JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b
        |WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= 0.8""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      // constant id bound: the synthetic corpus shares a tiny vocabulary, so
      // word-SET similarity is dense — the slice keeps the demonstration
      // bounded at every sf (real corpora are sparse and need no slice)
      val tok = Tables.load(s, dir, "documents")
        .filter(col("doc_id") < 600)
        .select(col("doc_id"), explode(MinHashLSH.tokensCol(col("text"))).as("term"))
        .distinct().localCheckpoint() // feeds ranking, sizes, prefix, verify
      val dfq = tok.groupBy(col("term")).agg(count(lit(1)).as("df"))
      // global rarest-first rank WITHOUT a global window: distributed
      // range-partitioned zipWithIndex over the (vocabulary-sized) df table
      val rk = graft.ops.SurrogateKeys.assign(dfq, "rk", 0L, Seq("df", "term"))
      val sz = tok.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      val pref = tok
        .join(rk.select(col("term"), col("rk")), Seq("term"))
        .withColumn("pos", row_number().over(
          Window.partitionBy(col("doc_id")).orderBy(col("rk"))))
        .join(sz, Seq("doc_id"))
        .filter(col("pos") <= col("n") - expr("(4 * n + 4) div 5") + 1)
        .select(col("doc_id"), col("term"))
      val cand = pref.select(col("term"), col("doc_id").as("id_a"))
        .join(pref.select(col("term"), col("doc_id").as("id_b")), Seq("term"))
        .filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b")).distinct()
      NgramJaccard.verifyPairs(cand, tok.withColumnRenamed("term", "shingle"), "doc_id")
        .filter(col("jaccard") >= 0.8)
        .select(col("id_a"), col("id_b"), col("inter"), col("n_a"), col("n_b"),
          round(col("jaccard"), 6).as("jaccard"))
    },

    // ---------------------------------------------------------------- q24
    // Exact word-3gram Jaccard VERIFICATION of the LSH candidate set (q22's
    // output): cost is linear in candidates — never the shingle⊳⊲shingle
    // co-occurrence expansion, which a hot shingle ("of the and") makes
    // quadratic at corpus scale.
    Q("q24_ngram_jaccard",
      lshCtes(MinHashLSH.DefaultBucketCap) +
        """
          |, sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
          |inter AS (SELECT c.id_a, c.id_b, count(*) AS inter
          |  FROM cand c
          |  JOIN sh a ON a.doc_id = c.id_a
          |  JOIN sh b ON b.doc_id = c.id_b AND b.shingle = a.shingle
          |  GROUP BY 1, 2)
          |SELECT id_a, id_b, inter, sa.n_sh AS n_a, sb.n_sh AS n_b,
          |  CAST(inter AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - inter AS DOUBLE) AS jaccard
          |FROM inter
          |JOIN sizes sa ON sa.doc_id = id_a
          |JOIN sizes sb ON sb.doc_id = id_b""".stripMargin) { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      // the shingle SET feeds signatures + both intersection sides + sizes:
      // materialize once instead of 4 tokenize+hash passes
      val sh = MinHashLSH.shingles(docs, "doc_id", "text", 3).localCheckpoint()
      val cand = MinHashLSH.candidatePairs(
        MinHashLSH.bands(MinHashLSH.signatures(sh, "doc_id", 8), "doc_id", 4, 2),
        "doc_id", MinHashLSH.DefaultBucketCap)
      NgramJaccard.verifyPairs(cand, sh, "doc_id")
    },

    // ---------------------------------------------------------------- q60
    // Near-dup CLUSTERING: connected components over the verified
    // (jaccard >= 0.5) candidate pairs — transitively similar docs share a
    // cluster_id (= min doc id in the component), the input "keep best per
    // group" needs. Spark: iterative min-label propagation (diameter-bounded
    // rounds, one edge shuffle each); oracle: recursive reachability CTE.
    Q("q60_dup_clusters",
      "WITH RECURSIVE" + lshCtes(MinHashLSH.DefaultBucketCap).stripPrefix("WITH") +
        """
          |, sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
          |inter AS (SELECT c.id_a, c.id_b, count(*) AS inter
          |  FROM cand c
          |  JOIN sh a ON a.doc_id = c.id_a
          |  JOIN sh b ON b.doc_id = c.id_b AND b.shingle = a.shingle
          |  GROUP BY 1, 2),
          |edges AS (
          |  SELECT i.id_a, i.id_b FROM inter i
          |  JOIN sizes sa ON sa.doc_id = i.id_a
          |  JOIN sizes sb ON sb.doc_id = i.id_b
          |  WHERE CAST(i.inter AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - i.inter AS DOUBLE) >= 0.5),
          |sym AS (SELECT id_a AS src, id_b AS dst FROM edges
          |        UNION ALL SELECT id_b, id_a FROM edges),
          |reach(id, r) AS (
          |  SELECT doc_id, doc_id FROM documents
          |  UNION
          |  SELECT s.dst, re.r FROM reach re JOIN sym s ON s.src = re.id)
          |SELECT id AS doc_id, min(r) AS cluster_id FROM reach GROUP BY id""".stripMargin) { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      val sh = MinHashLSH.shingles(docs, "doc_id", "text", 3).localCheckpoint()
      val cand = MinHashLSH.candidatePairs(
        MinHashLSH.bands(MinHashLSH.signatures(sh, "doc_id", 8), "doc_id", 4, 2),
        "doc_id", MinHashLSH.DefaultBucketCap)
      val edges = NgramJaccard.verifyPairs(cand, sh, "doc_id")
        .filter(col("jaccard") >= 0.5)
        .select(col("id_a"), col("id_b"))
      Components.connectedComponents(docs.select(col("doc_id")), "doc_id", edges)
    },

    // ---------------------------------------------------------------- q134
    // SUBSTRING-level exact dedup (Lee et al. '22): duplicated word-10-gram
    // SPANS, not whole documents — the licenses/boilerplate/quoted-passage
    // duplication document-level dedup cannot see. Ten planted docs splice
    // two source documents together, so every gram inside either block is a
    // known cross-document duplicate; the in-query contract requires all 10
    // planted docs detected with ≥ half their grams duplicated (measured
    // ≥ 0.75 at every SF — only the 9 block-boundary grams are unique). The
    // output is the per-document span profile: gram counts, duplicated-gram
    // counts, and the maximal-run structure (runs = removable spans of
    // k + run_len − 1 words). Oracle replays grams → corpus-wide count →
    // gaps-and-islands runs in SQL.
    Q("q134_span_dedup",
      """WITH aug AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT s.doc_id + 100000, s.text || ' ' || t.text
        |  FROM documents s JOIN documents t ON t.doc_id = s.doc_id + 50
        |  WHERE s.doc_id < 10),
        |w AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM aug),
        |g AS (SELECT doc_id, i AS pos, md5(array_to_string(w[i:i+9], ' ')) AS gram
        |      FROM w, LATERAL unnest(generate_series(1, len(w) - 9)) t(i)
        |      WHERE len(w) >= 10),
        |dup AS (SELECT gram FROM g GROUP BY gram HAVING count(*) >= 2),
        |m AS (SELECT g.doc_id, g.pos, (d.gram IS NOT NULL) AS is_dup
        |      FROM g LEFT JOIN dup d USING (gram)),
        |runs AS (SELECT doc_id, grp, count(*) AS len FROM (
        |    SELECT doc_id, pos,
        |      pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
        |    FROM m WHERE is_dup) GROUP BY 1, 2),
        |agg AS (SELECT doc_id, count(*) AS n_grams,
        |        sum(CASE WHEN is_dup THEN 1 ELSE 0 END) AS n_dup FROM m GROUP BY 1),
        |r AS (SELECT doc_id, count(*) AS n_runs, max(len) AS max_run FROM runs GROUP BY 1)
        |SELECT a.doc_id, CAST(a.n_grams AS BIGINT) AS n_grams,
        |  CAST(a.n_dup AS BIGINT) AS n_dup_grams,
        |  CAST(coalesce(r.n_runs, 0) AS BIGINT) AS n_runs,
        |  CAST(coalesce(r.max_run, 0) AS BIGINT) AS max_run_len
        |FROM agg a LEFT JOIN r USING (doc_id)""".stripMargin) { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      val planted = docs.alias("s").filter(col("doc_id") < 10)
        .join(docs.alias("t"), col("t.doc_id") === col("s.doc_id") + 50)
        .select((col("s.doc_id") + 100000L).as("doc_id"),
          concat(col("s.text"), lit(" "), col("t.text")).as("text"))
      val aug = docs.select(col("doc_id"), col("text")).unionByName(planted)
      val g = SpanDedup.grams(aug, "doc_id", MinHashLSH.tokensCol(col("text")), k = 10)
      val m = SpanDedup.markDuplicated(g, "doc_id").localCheckpoint()
      val runs = SpanDedup.duplicatedRuns(m, "doc_id")
      val agg = m.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_grams"),
          sum(when(col("is_dup"), 1).otherwise(0)).cast("long").as("n_dup_grams"))
      val r = runs.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_runs"), max(col("run_len")).as("max_run_len"))
      val out = agg.join(r, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_grams"), col("n_dup_grams"),
          coalesce(col("n_runs"), lit(0L)).as("n_runs"),
          coalesce(col("max_run_len"), lit(0L)).as("max_run_len"))
        .localCheckpoint()
      val bad = out.filter(col("doc_id") >= 100000L)
        .filter(col("n_dup_grams") * 2 < col("n_grams")).count()
      val found = out.filter(col("doc_id") >= 100000L).count()
      require(found == 10 && bad == 0,
        s"q134: all 10 planted spliced docs must be majority-duplicated (found=$found bad=$bad)")
      out
    },

    // ---------------------------------------------------------------- q135
    // INCREMENTAL LSH index maintenance — the daily-pipeline form of dedup:
    // the band table is a persisted VersionedTable index; when a day of new
    // documents arrives, signatures and bands are computed over the DELTA
    // ONLY (O(delta) shingle/md5 work — the whole point; re-deriving a
    // 100 TB corpus daily is the anti-pattern) and MERGEd in through the
    // same keyed upsert every other table uses. Contract required in-query:
    // the delta-maintained index is row-identical to a full recompute
    // (q92's incremental-aggregate equivalence applied to the LSH index).
    // Works because minhash signatures are per-document — a new doc never
    // changes an existing doc's bands, so index maintenance is exactly a
    // keyed upsert, and dedup of the delta probes existing buckets instead
    // of rebuilding them. The oracle recomputes the full band table.
    Q("q135_incremental_lsh",
      lshCtes(MinHashLSH.DefaultBucketCap) +
        "\nSELECT doc_id, band, band_key FROM bands") { (s, dir) =>
      import graft.ops.{Upsert, VersionedTable}
      val docs = Tables.load(s, dir, "documents")
      def bandsOf(d: org.apache.spark.sql.DataFrame) = MinHashLSH.bands(
        MinHashLSH.signatures(MinHashLSH.shingles(d, "doc_id", "text", 3), "doc_id", 8),
        "doc_id", 4, 2)
      val table = Q.scratch(s, dir, "q135") + "/index"
      VersionedTable.write(bandsOf(docs.filter(col("doc_id") < 400)), table)
      val delta = bandsOf(docs.filter(col("doc_id") >= 400)) // today's docs only
      VersionedTable.write(
        Upsert.merge(VersionedTable.read(s, table), delta, Seq("doc_id", "band")), table)
      val got = VersionedTable.read(s, table).localCheckpoint()
      // materialize the recompute once — both exceptAll directions read it
      val full = bandsOf(docs).localCheckpoint()
      require(Q.sameMultiset(got, full),
        "q135: delta-maintained index must equal the full recompute")
      got
    },

    // ---------------------------------------------------------------- q202
    // Bloom-prefiltered incremental dedup: admit a daily batch against a
    // historical corpus WITHOUT joining the full history. The history is
    // indexed ONCE — a content-hash bloom filter persisted as a parquet
    // sidecar (the CCNet/Gopher-style "have we seen this document" gate) —
    // and each later batch reads only the sidecar: bloom-NEGATIVE rows are
    // definitively new (a bloom has no false negatives) and skip the join
    // entirely; only bloom-POSITIVE rows (true dups + the small FP band)
    // verify against history by exact text anti-join. At 100 TB the
    // history side of that residual join prunes to the candidate hash
    // range; the filter itself shards by hash prefix when one array
    // exceeds a broadcast (the BloomBuild aggregator is map-side
    // combinable either way). In-query requires pin EXACT equality with
    // the unfiltered anti-join and that both the negative short-circuit
    // and the join-input pruning actually happened. The oracle is the
    // plain NOT EXISTS dedup.
    Q("q202_bloom_incremental_dedup",
      """SELECT lang, CAST(count(*) AS BIGINT) AS n_new
        |FROM documents d
        |WHERE doc_id % 2 = 0 AND NOT EXISTS (
        |  SELECT 1 FROM documents h WHERE h.doc_id % 4 <> 0 AND h.text = d.text)
        |GROUP BY 1""".stripMargin) { (s, dir) =>
      import graft.functions.{Bloom, BloomBuild}
      import s.implicits._
      val root = Q.scratch(s, dir, "q202")
      val docs = Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("lang"), col("text"))
      val history = docs.filter(col("doc_id") % 4 =!= 0)
      val delta = docs.filter(col("doc_id") % 2 === 0)
      // index the history once: content-hash bloom → parquet sidecar
      val k = 7
      val bits = history.select(xxhash64(col("text")).as("h")).as[Long]
        .select(new BloomBuild(Bloom.sizeBits(history.count()), k).toColumn)
        .head()
      Seq(bits).toDF("bits").write.mode("overwrite").parquet(s"$root/bloom")
      // a later day's run: the sidecar is the only history artifact read
      // before the residual join
      val loaded = s.read.parquet(s"$root/bloom").head()
        .getAs[scala.collection.Seq[Long]](0).toArray
      val tagged = delta.withColumn("_hit",
        Bloom.mightContainCol(xxhash64(col("text")), loaded, k))
      val definiteNew = tagged.filter(!col("_hit")).drop("_hit")
      val candidates = tagged.filter(col("_hit")).drop("_hit")
      val histTexts = history.select(col("text")).distinct()
      val confirmedNew = candidates.join(histTexts, Seq("text"), "left_anti")
      val result = definiteNew.select(col("doc_id"), col("lang"))
        .unionByName(confirmedNew.select(col("doc_id"), col("lang")))
        .localCheckpoint() // both requires and the output read it
      // exactness: the prefiltered pipeline equals the plain anti-join
      val exact = delta.join(histTexts, Seq("text"), "left_anti")
        .select(col("doc_id"), col("lang")).localCheckpoint()
      require(Q.sameMultiset(result, exact),
        "q202: bloom prefilter must not change the dedup result")
      // the scale contract: the join input really shrank, and the negative
      // short-circuit really fired
      val (nDelta, nCand, nNew) = (delta.count(), candidates.count(), result.count())
      require(nCand < nDelta,
        s"q202: the residual join must read fewer rows than the batch ($nCand vs $nDelta)")
      // candidates = true dups + false positives; pin the FP band to the
      // sized filter's design rate (~1 % at 10 bits/key), with slack
      val falsePos = nCand - (nDelta - nNew)
      require(falsePos <= math.max(5L, nNew / 10L),
        s"q202: bloom FP band out of contract (fp=$falsePos of new=$nNew)")
      result.groupBy(col("lang"))
        .agg(count(lit(1)).cast("bigint").as("n_new"))
    },

    // ---------------------------------------------------------------- q258
    // CANONICAL-DOC SELECTION — the keep-policy stage every fuzzy-dedup
    // pipeline runs after clustering (SlimPajama keeps the longest,
    // BigScience/ROOTS the highest-quality member): q60's LSH→verify→
    // connected-components clusters, then ONE survivor per multi-member
    // cluster by (longest, then smallest id) — a deterministic total
    // order, so the survivor set is replayable across engines and runs.
    // The rank-1 window is exactly the shape `RankFilterToTopK` plans as
    // a bounded heap, so the selection never materializes a full sort per
    // cluster. Scale shape: everything after the (bucketed, capped) pair
    // generation is keyed by cluster — O(members) per cluster, no global
    // structure; at 100 TB the selection inherits the LSH layer's
    // bucket-bounded cost. The oracle replays clustering AND the
    // keep-policy with the same tie-break.
    Q("q258_canonical_selection",
      "WITH RECURSIVE" + lshCtes(MinHashLSH.DefaultBucketCap).stripPrefix("WITH") +
        """
          |, sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
          |inter AS (SELECT c.id_a, c.id_b, count(*) AS inter
          |  FROM cand c
          |  JOIN sh a ON a.doc_id = c.id_a
          |  JOIN sh b ON b.doc_id = c.id_b AND b.shingle = a.shingle
          |  GROUP BY 1, 2),
          |edges AS (
          |  SELECT i.id_a, i.id_b FROM inter i
          |  JOIN sizes sa ON sa.doc_id = i.id_a
          |  JOIN sizes sb ON sb.doc_id = i.id_b
          |  WHERE CAST(i.inter AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - i.inter AS DOUBLE) >= 0.5),
          |sym AS (SELECT id_a AS src, id_b AS dst FROM edges
          |        UNION ALL SELECT id_b, id_a FROM edges),
          |reach(id, r) AS (
          |  SELECT doc_id, doc_id FROM documents
          |  UNION
          |  SELECT s.dst, re.r FROM reach re JOIN sym s ON s.src = re.id),
          |mem AS (SELECT id AS doc_id, min(r) AS cluster_id FROM reach GROUP BY id),
          |m2 AS (SELECT m.cluster_id, m.doc_id, d.n_chars
          |       FROM mem m JOIN documents d USING (doc_id)),
          |big AS (SELECT cluster_id FROM m2 GROUP BY 1 HAVING count(*) > 1)
          |SELECT cluster_id, doc_id AS keep_doc_id,
          |  CAST(n_chars AS BIGINT) AS keep_chars,
          |  (SELECT CAST(count(*) AS BIGINT) FROM m2 i
          |   WHERE i.cluster_id = m2.cluster_id) AS n_members
          |FROM m2 WHERE cluster_id IN (SELECT cluster_id FROM big)
          |QUALIFY row_number() OVER (PARTITION BY cluster_id
          |  ORDER BY n_chars DESC, doc_id) = 1""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.load(s, dir, "documents")
      val sh = MinHashLSH.shingles(docs, "doc_id", "text", 3).localCheckpoint()
      val cand = MinHashLSH.candidatePairs(
        MinHashLSH.bands(MinHashLSH.signatures(sh, "doc_id", 8), "doc_id", 4, 2),
        "doc_id", MinHashLSH.DefaultBucketCap)
      val edges = NgramJaccard.verifyPairs(cand, sh, "doc_id")
        .filter(col("jaccard") >= 0.5)
        .select(col("id_a"), col("id_b"))
      val clusters = Components.connectedComponents(
        docs.select(col("doc_id")), "doc_id", edges)
      val members = clusters
        .join(docs.select(col("doc_id"), col("n_chars")), Seq("doc_id"))
      val withSize = members.withColumn("n_members",
        count(lit(1)).over(Window.partitionBy(col("cluster_id"))))
        .filter(col("n_members") > 1)
      withSize
        .withColumn("rn", row_number().over(Window.partitionBy(col("cluster_id"))
          .orderBy(col("n_chars").desc, col("doc_id").asc)))
        .filter(col("rn") === 1) // heap-planned by RankFilterToTopK
        .select(col("cluster_id"), col("doc_id").as("keep_doc_id"),
          col("n_chars").cast("bigint").as("keep_chars"),
          col("n_members").cast("bigint").as("n_members"))
    })
}
