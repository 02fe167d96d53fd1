package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.plans.TopK

/** Deterministic, engine-portable sketches — the cardinality/quantile
  * estimators a 100 TB pipeline uses when exact answers are not worth their
  * shuffle. Unlike HLL / t-digest (whose merge internals differ per engine
  * and defeat a differential oracle), these are *content-addressed*: every
  * estimate is a pure function of md5 values both engines compute
  * identically, so the sketch itself is hash-checkable against DuckDB while
  * keeping the scale properties (bounded state, one pass, mergeable).
  *
  * - KMV (k-minimum-values, Bar-Yossef et al. RANDOM'02): keep the k
  *   smallest hash fractions per group; estimate distinct = (k-1) / kth-min.
  *   Bottom-k per group runs on the bounded-heap TopKPerGroup operator —
  *   O(groups·k) state, no sort, mergeable across partitions.
  * - Hash-sampled quantiles: a deterministic ~10% Bernoulli sample keyed by
  *   md5(orderkey) (re-ingestion-stable, like q48's train/val split), exact
  *   interpolated quantiles over the sample. Sample size is tunable
  *   independent of data volume; the full-data exact variant is q43.
  */
object SketchQueries {

  // shared definition (graft.functions.ContentHash) — the streaming KMV twin
  // builds the identical column, which is what makes the batch≡streaming
  // equality proof exact rather than approximate
  private def hashFrac(c: org.apache.spark.sql.Column) = graft.functions.ContentHash.hashFrac(c)
  private def oracleFrac(sqlExpr: String): String = graft.functions.ContentHash.oracleFrac(sqlExpr)

  val all: Seq[Q] = Seq(

    // ---------------------------------------------------------------- q81
    // KMV distinct-count estimate of parts per return flag, k = 256. Groups
    // smaller than k fall back to their exact count (the sketch is exact
    // below capacity). Estimate arithmetic is one double division from
    // values both engines agree on bit-for-bit.
    Q("q81_kmv_distinct",
      s"""WITH d AS (SELECT DISTINCT l_returnflag, l_partkey FROM lineitem),
        |h AS (SELECT l_returnflag, l_partkey,
        |  ${oracleFrac("l_partkey")} AS frac FROM d),
        |k AS (SELECT * FROM h
        |  QUALIFY row_number() OVER (PARTITION BY l_returnflag
        |                             ORDER BY frac, l_partkey) <= 256)
        |SELECT l_returnflag, count(*) AS n_kept,
        |  round(CASE WHEN count(*) < 256 THEN CAST(count(*) AS DOUBLE)
        |        ELSE 255.0 / max(frac) END, 6) AS est_distinct
        |FROM k GROUP BY 1""".stripMargin) { (s, dir) =>
      val d = Tables.load(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_partkey")).distinct()
        .withColumn("frac", hashFrac(col("l_partkey")))
      val kept = TopK.perGroup(d, Seq("l_returnflag"),
        Seq(("frac", false), ("l_partkey", false)), 256)
      kept.groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_kept"),
          round(when(count(lit(1)) < 256, count(lit(1)).cast("double"))
            .otherwise(lit(255.0) / max(col("frac"))), 6).as("est_distinct"))
    },

    // ---------------------------------------------------------------- q82
    // Quantiles over a deterministic 10% hash sample: the sample is keyed on
    // content (md5 of the order key), so re-running — or re-ingesting — picks
    // the same rows on any engine; the quantile is then exact over the
    // sample. q43 is the full-data exact twin.
    Q("q82_sampled_quantiles",
      s"""WITH smp AS (SELECT * FROM orders
        |  WHERE ${oracleFrac("o_orderkey")} < 0.1)
        |SELECT o_orderpriority, count(*) AS n_sample,
        |  round(quantile_cont(o_totalprice, 0.5), 6) AS p50,
        |  round(quantile_cont(o_totalprice, 0.95), 6) AS p95
        |FROM smp GROUP BY 1""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "orders")
        .filter(hashFrac(col("o_orderkey")) < 0.1)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_sample"),
          round(expr("percentile(o_totalprice, 0.5)"), 6).as("p50"),
          round(expr("percentile(o_totalprice, 0.95)"), 6).as("p95"))
    },

    // ---------------------------------------------------------------- q97
    // Weighted sampling without replacement (Efraimidis–Spirakis A-Res):
    // each row's selection key is u^(1/w) with u the content-addressed hash
    // fraction and w the weight (document length here — "sample long
    // documents more often"); the global top-k by key IS the weighted
    // sample. Deterministic (u comes from md5, not a RNG), distributed (the
    // top-k plans as TakeOrderedAndProject — per-partition heaps, k-row
    // merge), and re-ingestion-stable like q48's split.
    // The selection key is quantized to 9 dp BEFORE ranking on both sides:
    // pow() is the one transcendental in the oracle-parity surface and the
    // engines' libm may differ by an ulp — quantization plus the doc_id
    // tiebreak makes membership insensitive to that (a flip now needs the
    // key within an ulp of a rounding boundary, not of a neighbor).
    Q("q97_weighted_sample",
      s"""WITH h AS (SELECT doc_id, lang, n_chars,
        |  round(pow(${oracleFrac("doc_id")}, 1.0 / n_chars), 9) AS k
        |  FROM documents)
        |SELECT doc_id, lang, n_chars FROM h
        |QUALIFY row_number() OVER (ORDER BY k DESC, doc_id) <= 20""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "documents")
        .withColumn("k", round(pow(hashFrac(col("doc_id")), lit(1.0) / col("n_chars")), 9))
        .orderBy(col("k").desc, col("doc_id").asc)
        .limit(20)
        .select(col("doc_id"), col("lang"), col("n_chars"))
    },

    // ---------------------------------------------------------------- q137
    // Misra-Gries heavy hitters (custom typed Aggregator, bounded state):
    // frequent corpus tokens from ONE pass holding at most k=64 counters
    // per partial buffer — the frequent-items summary that replaces a
    // full-cardinality term count at 100 TB. Sketch counter sets are
    // merge-path dependent, so (q119's pattern) the query REQUIRES the two
    // MG theorems in-query against exact counts — (1) every term with true
    // count > n/k is in the summary, (2) true − n/k ≤ estimate ≤ true —
    // and returns the exact top-10 for the oracle.
    Q("q137_heavy_hitters_guarded",
      """WITH tok AS (SELECT unnest(string_split_regex(trim(text), '\s+')) AS term
        |            FROM documents),
        |c AS (SELECT term, count(*) AS n_occurrences FROM tok GROUP BY 1)
        |SELECT term, CAST(n_occurrences AS BIGINT) AS n_occurrences FROM c
        |ORDER BY n_occurrences DESC, term LIMIT 10""".stripMargin) { (s, dir) =>
      import s.implicits._
      val k = 64
      val tok = Tables.load(s, dir, "documents")
        .select(explode(graft.dedup.MinHashLSH.tokensCol(col("text"))).as("term"))
      val summary: Map[String, Long] = tok.as[String]
        .select(new graft.analytics.MisraGries(k).toColumn)
        .head()
      val exact = tok.groupBy(col("term")).agg(count(lit(1)).as("n")).localCheckpoint()
      val n = tok.count()
      val bound = n / k
      val mustAppear = exact.filter(col("n") > bound).as[(String, Long)].collect()
      mustAppear.foreach { case (t, c) =>
        require(summary.contains(t), s"q137: heavy hitter '$t' ($c > n/k=$bound) missing")
      }
      val exactMap = exact.filter(col("term").isin(summary.keys.toSeq: _*))
        .as[(String, Long)].collect().toMap
      summary.foreach { case (t, est) =>
        val truth = exactMap.getOrElse(t, 0L)
        require(est <= truth && truth - est <= bound,
          s"q137: estimate for '$t' ($est) outside [${truth - bound}, $truth]")
      }
      exact.orderBy(col("n").desc, col("term").asc).limit(10)
        .select(col("term"), col("n").as("n_occurrences"))
    },

    // ---------------------------------------------------------------- q146
    // KMV set algebra (the mergeable-summaries property that makes sketches
    // a 100 TB tool at all, Agarwal et al. '13 / theta-sketch practice):
    // distinct-customer sketches for two order segments, their UNION
    // estimated from the two KEPT SETS ALONE — bottom-k of the merged
    // bottom-k's, NO rescan of the base data — and their intersection by
    // inclusion-exclusion. This is "count distinct over any segment
    // combination from per-segment summaries": per-partition sketches merge
    // to per-table, per-day merge to per-month, without touching rows
    // again. The merge theorem (bottom-k(A ∪kept B) = bottom-k(A ∪ B)) is
    // REQUIRED in-query against a from-scratch union sketch; estimates are
    // content-addressed md5 fractions (q81's family), so DuckDB replays
    // sketch construction, merge, and estimates bit-for-bit.
    Q("q146_kmv_set_algebra", {
      val frac = oracleFrac("o_custkey")
      s"""WITH a AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'),
        |b AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '2-HIGH'),
        |ka AS (SELECT o_custkey, $frac AS f FROM a
        |       QUALIFY row_number() OVER (ORDER BY f, o_custkey) <= 256),
        |kb AS (SELECT o_custkey, $frac AS f FROM b
        |       QUALIFY row_number() OVER (ORDER BY f, o_custkey) <= 256),
        |ku AS (SELECT o_custkey, f FROM (SELECT * FROM ka UNION SELECT * FROM kb)
        |       QUALIFY row_number() OVER (ORDER BY f, o_custkey) <= 256),
        |est AS (
        |  SELECT 'a' AS segment, count(*) AS n_kept,
        |    CASE WHEN count(*) < 256 THEN CAST(count(*) AS DOUBLE)
        |         ELSE 255.0 / max(f) END AS est FROM ka
        |  UNION ALL
        |  SELECT 'b', count(*),
        |    CASE WHEN count(*) < 256 THEN CAST(count(*) AS DOUBLE)
        |         ELSE 255.0 / max(f) END FROM kb
        |  UNION ALL
        |  SELECT 'union', count(*),
        |    CASE WHEN count(*) < 256 THEN CAST(count(*) AS DOUBLE)
        |         ELSE 255.0 / max(f) END FROM ku)
        |SELECT segment, n_kept, round(est, 6) AS est_distinct FROM est
        |UNION ALL
        |SELECT 'intersection', 0,
        |  round((SELECT est FROM est WHERE segment = 'a')
        |      + (SELECT est FROM est WHERE segment = 'b')
        |      - (SELECT est FROM est WHERE segment = 'union'), 6)""".stripMargin
    }) { (s, dir) =>
      import graft.plans.TopK
      val orders = Tables.load(s, dir, "orders")
      def sketch(priority: String) = TopK.perGroup(
        orders.filter(col("o_orderpriority") === priority)
          .select(col("o_custkey")).distinct()
          .withColumn("f", hashFrac(col("o_custkey")))
          .withColumn("__g", lit(1)),
        Seq("__g"), Seq(("f", false), ("o_custkey", false)), 256)
        .select(col("o_custkey"), col("f"))
      val ka = sketch("1-URGENT").localCheckpoint()
      val kb = sketch("2-HIGH").localCheckpoint()
      // merge from the kept sets ALONE (the mergeable-summaries step)
      val ku = TopK.perGroup(
        ka.unionByName(kb).distinct().withColumn("__g", lit(1)),
        Seq("__g"), Seq(("f", false), ("o_custkey", false)), 256)
        .select(col("o_custkey"), col("f"))
      // merge theorem: bottom-k over kept sets == bottom-k over A ∪ B rows
      val kuScratch = TopK.perGroup(
        orders.filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
          .select(col("o_custkey")).distinct()
          .withColumn("f", hashFrac(col("o_custkey")))
          .withColumn("__g", lit(1)),
        Seq("__g"), Seq(("f", false), ("o_custkey", false)), 256)
        .select(col("o_custkey"), col("f"))
      require(Q.sameMultiset(ku, kuScratch),
        "q146: merged kept sets must equal the from-scratch union sketch")
      def est(k: org.apache.spark.sql.DataFrame, name: String) =
        k.agg(count(lit(1)).as("n_kept"),
          when(count(lit(1)) < 256, count(lit(1)).cast("double"))
            .otherwise(lit(255.0) / max(col("f"))).as("est"))
          .select(lit(name).as("segment"), col("n_kept"), col("est"))
      val e = est(ka, "a").unionByName(est(kb, "b")).unionByName(est(ku, "union"))
        .localCheckpoint()
      val row = e.collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
      e.select(col("segment"), col("n_kept"), round(col("est"), 6).as("est_distinct"))
        .unionByName(s.range(1).select(lit("intersection").as("segment"),
          lit(0L).as("n_kept"),
          round(lit(row("a") + row("b") - row("union")), 6).as("est_distinct")))
    })
}
