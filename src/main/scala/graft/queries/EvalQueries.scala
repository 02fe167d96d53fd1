package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Evaluation / preference-style analytics (round-4 second wave): the
  * operators a curation pipeline uses to JUDGE its own outputs — Pareto
  * skylines over competing objectives, exact AUC for filter-model quality,
  * and a k-anonymity audit before a corpus leaves the pipeline.
  *
  * Shared scale discipline: no global single-partition window ever runs over
  * row-level data. Each query first collapses to a bounded domain (distinct
  * group keys, distinct scores per class) with a distributed aggregation;
  * cumulative passes over an unbounded domain use the two-phase
  * `PrefixSum.runningSum` scan instead of `ORDER BY` windows.
  */
object EvalQueries {

  val all: Seq[Q] = Seq(

    // ---------------------------------------------------------------- q150
    // 2-D skyline (Pareto frontier; Börzsönyi et al. ICDE'01) per brand:
    // the parts not dominated on (min price, max size) by any same-brand
    // part. The sort-based plan: only max(size) per distinct price can
    // survive, so collapse to that domain first (distributed groupBy), then
    // one brand-partitioned window pass keeps rows whose size strictly
    // exceeds the running max over all cheaper prices. Work per window
    // partition is O(distinct prices within one brand) — never the raw
    // table. The oracle is the independent NOT-EXISTS domination definition,
    // so the sort-based rewrite is itself under test.
    Q("q150_skyline",
      """WITH g AS (
        |  SELECT p_brand, p_retailprice AS price, max(p_size) AS best_size
        |  FROM part GROUP BY 1, 2)
        |SELECT p_brand, round(price, 6) AS price, best_size
        |FROM g p
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM g q
        |  WHERE q.p_brand = p.p_brand AND q.price <= p.price
        |    AND q.best_size >= p.best_size
        |    AND (q.price < p.price OR q.best_size > p.best_size))""".stripMargin) { (s, dir) =>
      val g = Tables.load(s, dir, "part")
        .groupBy(col("p_brand"), col("p_retailprice").as("price"))
        .agg(max(col("p_size")).as("best_size"))
      // strictly-preceding frame: a cheaper-or-equal price with >= size
      // dominates; equal (price,size) pairs were collapsed by the groupBy
      val w = Window.partitionBy(col("p_brand")).orderBy(col("price"))
        .rowsBetween(Window.unboundedPreceding, -1)
      g.withColumn("prev_max", max(col("best_size")).over(w))
        .filter(col("prev_max").isNull || col("best_size") > col("prev_max"))
        .select(col("p_brand"), round(col("price"), 6).as("price"), col("best_size"))
    },

    // ---------------------------------------------------------------- q151
    // Exact AUC of o_totalprice as a ranking score for "order is fulfilled"
    // — the Mann-Whitney U statistic in integer arithmetic. The cumulative
    // "negatives below this score" never runs as a global window (distinct
    // scores are unbounded at corpus scale) and never leaves codegen: a
    // two-level range-bucket scan — literal fixed-width buckets (q74's
    // histogram trick), per-bucket windows in parallel, one tiny
    // bucket-summary window — decomposes neg_below(s) into
    // negBelowBucket + negBelowInBucket, all in whole-stage codegen.
    // AUC = [Σ pos(s)·(2·neg_below(s) + neg(s))] / (2·P·N): concordant pairs
    // count 2, tied scores count 1, all BIGINT; ONE final division.
    Q("q151_auc_exact",
      """WITH g AS (
        |  SELECT o_totalprice AS score,
        |    sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS pos,
        |    sum(CASE WHEN o_orderstatus <> 'F' THEN 1 ELSE 0 END) AS neg
        |  FROM orders GROUP BY 1),
        |c AS (
        |  SELECT pos, neg,
        |    COALESCE(sum(neg) OVER (ORDER BY score
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS neg_below
        |  FROM g)
        |SELECT CAST(sum(pos) AS BIGINT) AS n_pos, CAST(sum(neg) AS BIGINT) AS n_neg,
        |  round(CAST(sum(pos * (2 * neg_below + neg)) AS DOUBLE)
        |        / CAST(2 * sum(pos) * sum(neg) AS DOUBLE), 6) AS auc
        |FROM c""".stripMargin) { (s, dir) =>
      // per-distinct-score (pos, neg) counts, bucketed by a LITERAL width —
      // no data-dependent min/max pass; sparse/empty buckets are harmless
      val g = Tables.load(s, dir, "orders")
        .groupBy(col("o_totalprice").as("score"))
        .agg(
          sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("pos"),
          sum(when(col("o_orderstatus") =!= "F", 1L).otherwise(0L)).as("neg"))
        .withColumn("bucket", floor(col("score") / 1000.0).cast("long"))
      // within-bucket exclusive prefix of neg, parallel across buckets
      val wIn = Window.partitionBy(col("bucket")).orderBy(col("score"))
        .rowsBetween(Window.unboundedPreceding, -1)
      // bucket summary: exclusive prefix of per-bucket neg totals — the only
      // non-partitioned window, over the BUCKET domain (bounded: one row per
      // occupied literal bucket, ~2^10 for any realistic price span)
      val wBuckets = Window.orderBy(col("bucket"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val bucketBelow = g.groupBy(col("bucket"))
        .agg(sum(col("neg")).as("neg_in_bucket"))
        .withColumn("neg_below_bucket",
          coalesce(sum(col("neg_in_bucket")).over(wBuckets), lit(0L)))
        .select(col("bucket"), col("neg_below_bucket"))
      g.withColumn("neg_below_in", coalesce(sum(col("neg")).over(wIn), lit(0L)))
        .join(broadcast(bucketBelow), Seq("bucket"))
        .agg(
          sum(col("pos")).cast("long").as("n_pos"),
          sum(col("neg")).cast("long").as("n_neg"),
          round(
            sum(col("pos") * (lit(2) * (col("neg_below_bucket") + col("neg_below_in"))
              + col("neg"))).cast("double") /
              (lit(2) * sum(col("pos")) * sum(col("neg"))).cast("double"), 6).as("auc"))
    },

    // ---------------------------------------------------------------- q153
    // k-anonymity audit (Sweeney '02): group sizes over the quasi-identifier
    // tuple (nation, market segment, account-in-arrears) with k = 10 — the
    // release gate a curation pipeline runs before data leaves. One
    // distributed aggregation over a bounded QI domain; the summary row a
    // release decision needs (groups below k, rows they cover) is the same
    // aggregate re-grouped, not a second scan.
    Q("q153_k_anonymity",
      """WITH g AS (
        |  SELECT c_nationkey, c_mktsegment, c_acctbal < 0 AS in_arrears,
        |    count(*) AS n
        |  FROM customer GROUP BY 1, 2, 3)
        |SELECT c_nationkey, c_mktsegment, in_arrears, n, n < 10 AS suppressed
        |FROM g""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "customer")
        .groupBy(col("c_nationkey"), col("c_mktsegment"),
          (col("c_acctbal") < 0).as("in_arrears"))
        .agg(count(lit(1)).as("n"))
        .select(col("c_nationkey"), col("c_mktsegment"), col("in_arrears"),
          col("n"), (col("n") < 10).as("suppressed"))
    },

    // ---------------------------------------------------------------- q156
    // Declarative data-quality suite (the Deequ pattern): six constraints —
    // size, completeness, uniqueness, set membership, numeric bound, date
    // range — verified in ONE aggregation pass over the table (uniqueness
    // adds the one unavoidable distinct pre-aggregation; everything else is
    // map-side partial). Pass/fail verdicts compare EXACT counts; the
    // reported metric is the single rounded division. One scan regardless
    // of how many constraints the suite carries — the property that makes a
    // quality gate affordable at 100 TB.
    Q("q156_quality_suite",
      """WITH a AS (SELECT count(*) AS n,
        |    count(o_custkey) AS n_cust,
        |    count(DISTINCT o_orderkey) AS n_key,
        |    sum(CASE WHEN o_orderstatus IN ('F', 'O', 'P') THEN 1 ELSE 0 END) AS n_status,
        |    min(o_totalprice) AS min_price,
        |    sum(CASE WHEN o_orderdate >= TIMESTAMP '1990-01-01'
        |             AND o_orderdate < TIMESTAMP '2026-01-01' THEN 1 ELSE 0 END) AS n_date
        |  FROM orders)
        |SELECT 'size_min_1' AS check_name, CAST(n AS DOUBLE) AS metric, n >= 1 AS passed FROM a
        |UNION ALL SELECT 'complete_custkey', round(CAST(n_cust AS DOUBLE) / n, 6), n_cust = n FROM a
        |UNION ALL SELECT 'unique_orderkey', round(CAST(n_key AS DOUBLE) / n, 6), n_key = n FROM a
        |UNION ALL SELECT 'status_in_set', round(CAST(n_status AS DOUBLE) / n, 6), n_status = n FROM a
        |UNION ALL SELECT 'totalprice_positive', round(min_price, 6), min_price > 0 FROM a
        |UNION ALL SELECT 'orderdate_in_range', round(CAST(n_date AS DOUBLE) / n, 6), n_date = n FROM a""".stripMargin) { (s, dir) =>
      val a = Tables.load(s, dir, "orders").agg(
        count(lit(1)).as("n"),
        count(col("o_custkey")).as("n_cust"),
        countDistinct(col("o_orderkey")).as("n_key"),
        sum(when(col("o_orderstatus").isin("F", "O", "P"), 1L).otherwise(0L)).as("n_status"),
        min(col("o_totalprice")).as("min_price"),
        sum(when(col("o_orderdate") >= lit("1990-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("2026-01-01").cast("timestamp"), 1L)
          .otherwise(0L)).as("n_date"))
      def row(name: String, metric: org.apache.spark.sql.Column,
          passed: org.apache.spark.sql.Column) =
        struct(lit(name).as("check_name"), metric.as("metric"), passed.as("passed"))
      a.select(explode(array(
        row("size_min_1", col("n").cast("double"), col("n") >= 1),
        row("complete_custkey",
          round(col("n_cust").cast("double") / col("n"), 6), col("n_cust") === col("n")),
        row("unique_orderkey",
          round(col("n_key").cast("double") / col("n"), 6), col("n_key") === col("n")),
        row("status_in_set",
          round(col("n_status").cast("double") / col("n"), 6), col("n_status") === col("n")),
        row("totalprice_positive", round(col("min_price"), 6), col("min_price") > 0),
        row("orderdate_in_range",
          round(col("n_date").cast("double") / col("n"), 6), col("n_date") === col("n"))
      )).as("c")).select(col("c.*"))
    },

    // ---------------------------------------------------------------- q158
    // Incremental view maintenance for an aggregated JOIN view — the
    // delta-join identity Δ(A⋈B) = ΔA⋈B ∪ A⋈ΔB ∪ ΔA⋈ΔB with BOTH sides
    // changing: three years of new orders land AND the odd-key half of the
    // customer dim arrives late. Each delta join aggregates to the view's
    // grain (map-side partial) before the merge re-aggregation — new-data
    // work is proportional to the DELTAS, never a rescan of the base fact.
    // The in-query require proves delta-maintenance ≡ full recompute in
    // exact decimal; the oracle recomputes the final view from scratch.
    Q("q158_incremental_join_view",
      """SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n_orders,
        |  round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE), 6) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1""".stripMargin) { (s, dir) =>
      val cut = lit("1998-01-01").cast("timestamp")
      val orders = Tables.load(s, dir, "orders")
      val cust = Tables.load(s, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey"))
      val (a, da) = (orders.filter(col("o_orderdate") < cut),
        orders.filter(col("o_orderdate") >= cut))
      val (b, db) = (cust.filter(col("c_custkey") % 2 === 0),
        cust.filter(col("c_custkey") % 2 =!= 0))
      def agg(fact: org.apache.spark.sql.DataFrame, dim: org.apache.spark.sql.DataFrame) =
        fact.join(broadcast(dim), col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_nationkey"))
          .agg(count(lit(1)).as("n_orders"),
            sum(col("o_totalprice").cast("decimal(18,6)")).cast("decimal(38,6)")
              .as("revenue"))
      // base view, then the three delta joins, merged by re-aggregating the
      // mergeable partials (count: sum, sum: sum) — the IVM merge step
      val incremental = agg(a, b)
        .unionAll(agg(da, b)).unionAll(agg(a, db)).unionAll(agg(da, db))
        .groupBy(col("c_nationkey"))
        .agg(sum(col("n_orders")).cast("bigint").as("n_orders"),
          sum(col("revenue")).cast("decimal(38,6)").as("revenue"))
        .localCheckpoint() // read by the require AND returned — run the 4 joins once
      val recompute = agg(orders, cust)
        .select(col("c_nationkey"), col("n_orders").cast("bigint").as("n_orders"),
          col("revenue"))
        .localCheckpoint() // read by both exceptAll directions
      require(Q.sameMultiset(incremental, recompute),
        "q158: delta-maintained view must equal the full recompute exactly")
      // Output canonicalization (round-2 discipline, SURVEY §8a): the
      // equivalence proof above runs in exact DECIMAL(38,6); the RESULT is
      // projected to double-6dp so neither engine ships a precision-38
      // decimal the driver's hasher can't canonicalize.
      incremental.select(col("c_nationkey"), col("n_orders"),
        round(col("revenue").cast("double"), 6).as("revenue"))
    },

    // ---------------------------------------------------------------- q160
    // Exact weighted median (quantity-weighted price per return flag): the
    // smallest value whose cumulative weight reaches half the total. The
    // row domain collapses to distinct (flag, value) pairs first — the same
    // distinct-domain reduction as q151 — then one bounded window pass per
    // flag; weights stay BIGINT so the half-total comparison (2·cum ≥ W) is
    // exact, no floating-point midpoint. For a GLOBAL weighted quantile at
    // corpus scale the cumulative pass moves to PrefixSum (q151's path).
    Q("q160_weighted_median",
      """WITH g AS (
        |  SELECT l_returnflag AS flag, l_extendedprice AS price,
        |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS w
        |  FROM lineitem GROUP BY 1, 2),
        |c AS (
        |  SELECT flag, price, w,
        |    sum(w) OVER (PARTITION BY flag ORDER BY price
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    sum(w) OVER (PARTITION BY flag) AS tot
        |  FROM g)
        |SELECT flag, CAST(MAX(tot) AS BIGINT) AS total_weight,
        |  round(min(CASE WHEN 2 * cum >= tot THEN price END), 6) AS wmedian
        |FROM c GROUP BY flag""".stripMargin) { (s, dir) =>
      val g = Tables.load(s, dir, "lineitem")
        .groupBy(col("l_returnflag").as("flag"), col("l_extendedprice").as("price"))
        .agg(sum(col("l_quantity").cast("long")).cast("long").as("w"))
      val wCum = Window.partitionBy(col("flag")).orderBy(col("price"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.partitionBy(col("flag"))
      g.withColumn("cum", sum(col("w")).over(wCum))
        .withColumn("tot", sum(col("w")).over(wAll))
        .groupBy(col("flag"))
        .agg(max(col("tot")).cast("bigint").as("total_weight"),
          round(min(when(lit(2) * col("cum") >= col("tot"), col("price"))), 6)
            .as("wmedian"))
    },

    // ---------------------------------------------------------------- q161
    // Per-brand OLS regression (price on size) from the five classical power
    // sums — the closed-form least squares every profiler/drift monitor
    // computes per segment. All sums are exact (BIGINT / DECIMAL, one
    // map-side-combinable aggregation); slope and intercept are formed by
    // the SAME IEEE expression in both engines from those exact sums, so
    // they agree bit-for-bit before the 6 dp rounding.
    Q("q161_ols_trend",
      """WITH a AS (
        |  SELECT p_brand, count(*) AS n,
        |    sum(CAST(p_size AS BIGINT)) AS sx,
        |    sum(CAST(p_retailprice AS DECIMAL(18,6))) AS sy,
        |    sum(CAST(p_size AS BIGINT) * CAST(p_retailprice AS DECIMAL(18,6))) AS sxy,
        |    sum(CAST(p_size AS BIGINT) * CAST(p_size AS BIGINT)) AS sxx
        |  FROM part GROUP BY 1)
        |SELECT p_brand, CAST(n AS BIGINT) AS n,
        |  round(CAST(n * sxy - sx * sy AS DOUBLE)
        |        / CAST(n * sxx - sx * sx AS DOUBLE), 6) AS slope,
        |  round((CAST(sy AS DOUBLE)
        |         - CAST(n * sxy - sx * sy AS DOUBLE)
        |           / CAST(n * sxx - sx * sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |        / CAST(n AS DOUBLE), 6) AS intercept
        |FROM a""".stripMargin) { (s, dir) =>
      val a = Tables.load(s, dir, "part")
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n"),
          sum(col("p_size").cast("long")).as("sx"),
          sum(col("p_retailprice").cast("decimal(18,6)")).as("sy"),
          sum(col("p_size").cast("long") * col("p_retailprice").cast("decimal(18,6)")).as("sxy"),
          sum(col("p_size").cast("long") * col("p_size").cast("long")).as("sxx"))
      val slopeNum = (col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
      val slopeDen = (col("n") * col("sxx") - col("sx") * col("sx")).cast("double")
      a.select(col("p_brand"), col("n").cast("bigint").as("n"),
        round(slopeNum / slopeDen, 6).as("slope"),
        round((col("sy").cast("double") -
          slopeNum / slopeDen * col("sx").cast("double")) / col("n").cast("double"), 6)
          .as("intercept"))
    },

    // ---------------------------------------------------------------- q162
    // Changepoint detection (binary segmentation's first split) on the daily
    // event-count series per type: the day maximizing |cumulative deviation
    // from the series mean|. The deviation is kept as an INTEGER by scaling
    // through n (n·cum − idx·total) — exact argmax, no floating-point mean;
    // the reported statistic is the single division at the end. Day domain
    // is bounded (one row per day per type), so the per-type window is safe
    // at any corpus size — the reduction happened in the count aggregation.
    Q("q162_changepoint",
      """WITH d AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS x
        |  FROM events GROUP BY 1, 2),
        |c AS (
        |  SELECT event_type, day, x,
        |    sum(x) OVER (PARTITION BY event_type ORDER BY day
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    row_number() OVER (PARTITION BY event_type ORDER BY day) AS idx,
        |    sum(x) OVER (PARTITION BY event_type) AS total,
        |    count(*) OVER (PARTITION BY event_type) AS n
        |  FROM d),
        |s AS (SELECT event_type, day, n * cum - idx * total AS dev_n, n FROM c)
        |SELECT event_type, day AS change_day,
        |  round(CAST(dev_n AS DOUBLE) / n, 6) AS cusum_dev
        |FROM s
        |QUALIFY row_number() OVER (PARTITION BY event_type
        |  ORDER BY abs(dev_n) DESC, day) = 1""".stripMargin) { (s, dir) =>
      val d = Tables.load(s, dir, "events")
        .groupBy(col("event_type"), col("ts").cast("date").as("day"))
        .agg(count(lit(1)).as("x"))
      val wOrd = Window.partitionBy(col("event_type")).orderBy(col("day"))
      val wAll = Window.partitionBy(col("event_type"))
      val c = d
        .withColumn("cum", sum(col("x")).over(
          wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("idx", row_number().over(wOrd))
        .withColumn("total", sum(col("x")).over(wAll))
        .withColumn("n", count(lit(1)).over(wAll))
        .withColumn("dev_n", col("n") * col("cum") - col("idx") * col("total"))
      c.withColumn("__rk", row_number().over(
          Window.partitionBy(col("event_type")).orderBy(abs(col("dev_n")).desc, col("day"))))
        .filter(col("__rk") === 1)
        .select(col("event_type"), col("day").as("change_day"),
          round(col("dev_n").cast("double") / col("n"), 6).as("cusum_dev"))
    },

    // ---------------------------------------------------------------- q163
    // Time-weighted average (TWAP form): each observation holds until the
    // next one, so its weight is that holding duration in µs — the standard
    // bar-construction average when observations are irregular (VWAP's
    // volume weight becomes a time weight). The last observation of a day
    // holds to day end. One (type, day)-partitioned window for the lead;
    // duration stays BIGINT, value goes through the established exact
    // decimal cast; ONE division per group at the end.
    Q("q163_twap",
      """WITH e AS (SELECT event_type, event_id, CAST(ts AS DATE) AS day,
        |    epoch_us(ts) AS us, CAST(value AS DECIMAL(18,6)) AS v
        |  FROM events),
        |d AS (SELECT event_type, day, v,
        |    COALESCE(lead(us) OVER (PARTITION BY event_type, day
        |                            ORDER BY us, event_id),
        |      epoch_us(CAST(day + INTERVAL 1 DAY AS TIMESTAMP))) - us AS dur
        |  FROM e)
        |SELECT event_type, day,
        |  CAST(sum(dur) AS BIGINT) AS total_dur_us,
        |  round(CAST(sum(v * dur) AS DOUBLE) / CAST(sum(dur) AS DOUBLE), 6) AS twap
        |FROM d GROUP BY 1, 2""".stripMargin) { (s, dir) =>
      val e = Tables.load(s, dir, "events")
        .select(col("event_type"), col("event_id"), col("ts").cast("date").as("day"),
          unix_micros(col("ts")).as("us"), col("value").cast("decimal(18,6)").as("v"))
      // event_id tie-breaker: two observations sharing (type, day, us) would
      // otherwise get their holding gaps assigned nondeterministically, and
      // Spark vs DuckDB may break the tie differently (round-4 ADVICE)
      val w = Window.partitionBy(col("event_type"), col("day"))
        .orderBy(col("us"), col("event_id"))
      e.withColumn("dur",
          coalesce(lead(col("us"), 1).over(w),
            unix_micros(date_add(col("day"), 1).cast("timestamp"))) - col("us"))
        .groupBy(col("event_type"), col("day"))
        .agg(sum(col("dur")).cast("bigint").as("total_dur_us"),
          round(sum(col("v") * col("dur")).cast("double") /
            sum(col("dur")).cast("double"), 6).as("twap"))
    },

    // ---------------------------------------------------------------- q164
    // Join-size forecast from key histograms: |A ⋈ B| = Σ_k cA(k)·cB(k) —
    // the exact cardinality a cost-based planner wants BEFORE committing to
    // a join strategy, computed from two grouped counts and a keyed merge
    // (work ∝ distinct keys, never the output size). The in-query require
    // proves the forecast against the materialized join; at 100 TB you run
    // only the forecast and skip the join it prices.
    Q("q164_join_size_forecast",
      """WITH c AS (SELECT user_id, count(*) AS n_clicks FROM events
        |           WHERE event_type = 'click' GROUP BY 1),
        |v AS (SELECT user_id, count(*) AS n_views FROM events
        |      WHERE event_type = 'view' GROUP BY 1)
        |SELECT CAST(count(*) AS BIGINT) AS n_joint_users,
        |  CAST(sum(n_clicks * n_views) AS BIGINT) AS join_size
        |FROM c JOIN v USING (user_id)""".stripMargin) { (s, dir) =>
      val ev = Tables.load(s, dir, "events")
      def hist(t: String, out: String) = ev.filter(col("event_type") === t)
        .groupBy(col("user_id")).agg(count(lit(1)).as(out))
      val merged = hist("click", "n_clicks").join(hist("view", "n_views"), "user_id")
        .localCheckpoint() // read by the forecast AND the proof join
      val forecast = merged.agg(count(lit(1)).as("n_joint_users"),
        sum(col("n_clicks") * col("n_views")).cast("bigint").as("join_size"))
        .localCheckpoint()
      // proof: the histogram product equals the materialized join's count
      val clicks = ev.filter(col("event_type") === "click").select(col("user_id"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id"))
      val actual = clicks.join(views, "user_id").count()
      require(forecast.head().getLong(1) == actual,
        s"q164: forecast must equal the materialized join size ($actual)")
      forecast.select(col("n_joint_users").cast("bigint"), col("join_size"))
    },

    // ---------------------------------------------------------------- q165
    // Local clustering coefficient over the q99 co-purchase graph: per node,
    // 2·triangles / (deg·(deg−1)). Triangle enumeration is the canonical
    // a<b<c three-way edge join (each join keyed on a vertex — no all-pairs
    // stage); each triangle credits its three corners via one explode, and
    // degrees come from one explode of the undirected edge list. Output is
    // one row per node of degree ≥ 2 — the transitivity profile a graph
    // curation pass ranks communities by.
    Q("q165_clustering_coeff",
      """WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |e AS (SELECT a.l_partkey AS pa, b.l_partkey AS pb
        |      FROM op a JOIN op b
        |        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |      GROUP BY 1, 2 HAVING count(*) >= 2),
        |tri AS (SELECT e1.pa AS a, e1.pb AS b, e2.pb AS c
        |        FROM e e1 JOIN e e2 ON e1.pb = e2.pa
        |        JOIN e e3 ON e3.pa = e1.pa AND e3.pb = e2.pb),
        |tn AS (SELECT node, count(*) AS n_tri FROM (
        |         SELECT a AS node FROM tri UNION ALL
        |         SELECT b FROM tri UNION ALL SELECT c FROM tri)
        |       GROUP BY 1),
        |deg AS (SELECT node, count(*) AS d FROM (
        |          SELECT pa AS node FROM e UNION ALL SELECT pb FROM e)
        |        GROUP BY 1)
        |SELECT deg.node, CAST(deg.d AS BIGINT) AS degree,
        |  CAST(COALESCE(tn.n_tri, 0) AS BIGINT) AS n_triangles,
        |  round(CAST(2 * COALESCE(tn.n_tri, 0) AS DOUBLE)
        |        / CAST(deg.d * (deg.d - 1) AS DOUBLE), 6) AS lcc
        |FROM deg LEFT JOIN tn ON tn.node = deg.node
        |WHERE deg.d >= 2""".stripMargin) { (s, dir) =>
      val op = Tables.load(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey")).distinct()
      val edges = op.select(col("l_orderkey"), col("l_partkey").as("pa"))
        .join(op.select(col("l_orderkey"), col("l_partkey").as("pb")), Seq("l_orderkey"))
        .filter(col("pa") < col("pb"))
        .groupBy(col("pa"), col("pb")).agg(count(lit(1)).as("w"))
        .filter(col("w") >= 2)
        .select(col("pa"), col("pb"))
        .localCheckpoint() // edge list feeds four consumers; compute once
      val e1 = edges.select(col("pa").as("a"), col("pb").as("b"))
      val e2 = edges.select(col("pa").as("b"), col("pb").as("c"))
      val e3 = edges.select(col("pa").as("a"), col("pb").as("c"))
      val tri = e1.join(e2, Seq("b")).join(e3, Seq("a", "c"))
      val tn = tri.select(explode(array(col("a"), col("b"), col("c"))).as("node"))
        .groupBy(col("node")).agg(count(lit(1)).as("n_tri"))
      val deg = edges.select(explode(array(col("pa"), col("pb"))).as("node"))
        .groupBy(col("node")).agg(count(lit(1)).as("d"))
      deg.filter(col("d") >= 2)
        .join(tn, Seq("node"), "left")
        .select(col("node"), col("d").cast("bigint").as("degree"),
          coalesce(col("n_tri"), lit(0L)).cast("bigint").as("n_triangles"),
          round((lit(2) * coalesce(col("n_tri"), lit(0L))).cast("double") /
            (col("d") * (col("d") - 1)).cast("double"), 6).as("lcc"))
    },

    // ---------------------------------------------------------------- q166
    // Range-split planning: the EXACT B-quantile boundaries a
    // repartitionByRange / range-bucketed layout should use — what Spark's
    // RangePartitioner estimates by sampling, computed exactly with the
    // distributed-rank machinery (range repartition + zipWithIndex, no
    // global window). Boundary i = value at rank ceil(i·N/8); a writer
    // persists these seven splits so every future write range-buckets
    // identically without re-sampling.
    Q("q166_range_splits",
      """WITH ranked AS (
        |  SELECT o_totalprice,
        |    row_number() OVER (ORDER BY o_totalprice, o_orderkey) AS rid,
        |    count(*) OVER () AS n
        |  FROM orders)
        |SELECT CAST(split_idx AS INT) AS split_idx,
        |  round(min(o_totalprice), 6) AS boundary
        |FROM ranked, range(1, 8) s(split_idx)
        |WHERE rid >= CAST(ceil(split_idx * n / 8.0) AS BIGINT)
        |GROUP BY 1""".stripMargin) { (s, dir) =>
      import graft.ops.SurrogateKeys
      val orders = Tables.load(s, dir, "orders")
        .select(col("o_totalprice"), col("o_orderkey"))
      val cnt = orders.agg(count(lit(1)).as("n"))
      val ranked = SurrogateKeys.assign(orders, "rid", 0L,
          Seq("o_totalprice", "o_orderkey"))
        .crossJoin(broadcast(cnt))
      // the 7 target ranks as a tiny exploded frame; each boundary is the
      // MIN value at-or-above its rank — one keyed aggregation, no collect
      ranked.crossJoin(broadcast(
          s.range(1, 8).select(col("id").cast("int").as("split_idx"))))
        .filter(col("rid") >= ceil(col("split_idx") * col("n") / 8.0).cast("long"))
        .groupBy(col("split_idx"))
        .agg(round(min(col("o_totalprice")), 6).as("boundary"))
    },

    // ---------------------------------------------------------------- q169
    // Linear interpolation over a sparse daily series (q67's gap-fill is
    // LOCF; this is the other standard resampler). Known points are every
    // third day's exact decimal total (planted sparsity, deterministic on
    // both engines); missing days interpolate between their last-known and
    // next-known neighbors. Neighbor lookup is two IGNORE-NULLS window
    // passes per type (bounded day domain); the interpolation weight is an
    // integer day ratio and the value delta stays DECIMAL until one
    // identical IEEE expression forms the result on both engines.
    Q("q169_linear_interpolation",
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS v
        |  FROM events GROUP BY 1, 2),
        |known AS (SELECT * FROM daily
        |          WHERE datediff('day', DATE '1970-01-01', day) % 3 = 0),
        |bounds AS (SELECT event_type, min(day) AS d0, max(day) AS d1
        |           FROM known GROUP BY 1),
        |spine AS (SELECT event_type, CAST(gs.d AS DATE) AS day
        |          FROM bounds, unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS gs(d)),
        |j AS (SELECT s.event_type, s.day, k.v,
        |  datediff('day', DATE '1970-01-01', s.day) AS dn FROM spine s
        |  LEFT JOIN known k USING (event_type, day)),
        |n AS (SELECT event_type, day, v,
        |  last_value(v IGNORE NULLS) OVER (PARTITION BY event_type ORDER BY day
        |    ROWS UNBOUNDED PRECEDING) AS pv,
        |  last_value(CASE WHEN v IS NOT NULL THEN dn END IGNORE NULLS)
        |    OVER (PARTITION BY event_type ORDER BY day ROWS UNBOUNDED PRECEDING) AS pd,
        |  first_value(v IGNORE NULLS) OVER (PARTITION BY event_type ORDER BY day
        |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
        |  first_value(CASE WHEN v IS NOT NULL THEN dn END IGNORE NULLS)
        |    OVER (PARTITION BY event_type ORDER BY day
        |          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd,
        |  dn FROM j)
        |SELECT event_type, day, v IS NULL AS interpolated,
        |  round(CASE WHEN v IS NOT NULL THEN CAST(v AS DOUBLE)
        |    ELSE CAST(pv AS DOUBLE)
        |      + CAST(nv - pv AS DOUBLE) * CAST(dn - pd AS DOUBLE) / CAST(nd - pd AS DOUBLE)
        |  END, 6) AS value_interp
        |FROM n""".stripMargin) { (s, dir) =>
      val epoch = to_date(lit("1970-01-01"))
      val daily = Tables.load(s, dir, "events")
        .groupBy(col("event_type"), col("ts").cast("date").as("day"))
        .agg(sum(col("value").cast("decimal(18,6)")).cast("decimal(18,6)").as("v"))
      val known = daily.filter(datediff(col("day"), epoch) % 3 === 0)
      val spine = known.groupBy(col("event_type"))
        .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
        .select(col("event_type"),
          explode(sequence(col("d0"), col("d1"), expr("interval 1 day"))).as("day"))
      val j = spine.join(known, Seq("event_type", "day"), "left")
        .withColumn("dn", datediff(col("day"), epoch))
      val wBack = Window.partitionBy(col("event_type")).orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wFwd = Window.partitionBy(col("event_type")).orderBy(col("day"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      val dnKnown = when(col("v").isNotNull, col("dn"))
      j.withColumn("pv", last(col("v"), ignoreNulls = true).over(wBack))
        .withColumn("pd", last(dnKnown, ignoreNulls = true).over(wBack))
        .withColumn("nv", first(col("v"), ignoreNulls = true).over(wFwd))
        .withColumn("nd", first(dnKnown, ignoreNulls = true).over(wFwd))
        .select(col("event_type"), col("day"), col("v").isNull.as("interpolated"),
          round(when(col("v").isNotNull, col("v").cast("double"))
            .otherwise(col("pv").cast("double") +
              (col("nv") - col("pv")).cast("double") *
                (col("dn") - col("pd")).cast("double") /
                (col("nd") - col("pd")).cast("double")), 6).as("value_interp"))
    },

    // ---------------------------------------------------------------- q170
    // Nearest as-of join (± tolerance): each error event pairs with the
    // user's click CLOSEST in time within one hour, either direction, ties
    // to the earlier click — the bidirectional variant completing the
    // backward as-of (q35) and interval (q116) family. Candidates come from
    // the bucketized range join (never a time-unbounded per-user cross
    // product); nearest-selection is a per-error bounded window.
    Q("q170_asof_nearest",
      """WITH w AS (SELECT * FROM events WHERE ts < TIMESTAMP '2024-01-08 00:00:00'),
        |err AS (SELECT user_id, event_id, epoch_us(ts) AS e_us FROM w
        |        WHERE event_type = 'error'),
        |clk AS (SELECT user_id, epoch_us(ts) AS c_us FROM w
        |        WHERE event_type = 'click'),
        |j AS (SELECT e.user_id, e.event_id, e.e_us, c.c_us
        |      FROM err e JOIN clk c ON c.user_id = e.user_id
        |      AND c.c_us >= e.e_us - 3600000000 AND c.c_us <= e.e_us + 3600000000)
        |SELECT user_id, event_id, c_us AS nearest_click_us,
        |  CAST(c_us - e_us AS BIGINT) AS delta_us
        |FROM j
        |QUALIFY row_number() OVER (PARTITION BY event_id
        |  ORDER BY abs(c_us - e_us), c_us) = 1""".stripMargin) { (s, dir) =>
      val w = Tables.load(s, dir, "events")
        .filter(col("ts") < lit("2024-01-08 00:00:00").cast("timestamp"))
      val errors = w.filter(col("event_type") === "error")
        .select(col("user_id"), col("event_id"), col("ts"))
      val clicks = w.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts").as("click_ts"))
      val pairs = graft.ops.RangeJoin.timeWindow(errors, clicks, Seq("user_id"),
          "ts", "click_ts", lowerUs = -3600000000L, upperUs = 3600000000L)
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("e_us"), unix_micros(col("click_ts")).as("c_us"))
      val nearest = Window.partitionBy(col("event_id"))
        .orderBy(abs(col("c_us") - col("e_us")), col("c_us"))
      pairs.withColumn("__rk", row_number().over(nearest))
        .filter(col("__rk") === 1)
        .select(col("user_id"), col("event_id"), col("c_us").as("nearest_click_us"),
          (col("c_us") - col("e_us")).cast("bigint").as("delta_us"))
    },

    // ---------------------------------------------------------------- q171
    // Keyset pagination (page 3 of the price-ranked order book): OFFSET at
    // scale sorts and discards 200 rows per page request forever deeper —
    // keyset instead seeks past the last-seen (price, key) boundary, so
    // every page costs one TakeOrderedAndProject top-k, never a global
    // sort. The boundary row is the bounded driver-side state a paginating
    // API hands back as its cursor; the in-query require pins the
    // top-k-planned (no range-sort-exchange) physical plan.
    Q("q171_keyset_pagination",
      """WITH ranked AS (
        |  SELECT o_orderkey, o_totalprice,
        |    row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders)
        |SELECT o_orderkey, round(o_totalprice, 6) AS o_totalprice
        |FROM ranked WHERE rn BETWEEN 201 AND 300""".stripMargin) { (s, dir) =>
      val orders = Tables.load(s, dir, "orders")
        .select(col("o_orderkey"), col("o_totalprice"))
      val ord = Seq(col("o_totalprice").desc, col("o_orderkey").asc)
      // the cursor: last row of page 2 — ONE row to the driver, the state a
      // paginating API returns to its caller. The projection pins the cursor
      // types explicitly (round-4 ADVICE): a schema drift (e.g. decimal
      // totalprice) must surface as an analysis-time cast, not a
      // ClassCastException inside the positional fetch.
      val cursor = orders
        .select(col("o_orderkey").cast("bigint").as("k"),
          col("o_totalprice").cast("double").as("p"))
        .orderBy(col("p").desc, col("k").asc).limit(200)
        .orderBy(col("p").asc, col("k").desc).limit(1).head()
      val (bp, bk) = (cursor.getDouble(1), cursor.getLong(0))
      val page3 = orders
        .filter(col("o_totalprice") < bp ||
          (col("o_totalprice") === bp && col("o_orderkey") > bk))
        .orderBy(ord: _*).limit(100)
      val plan = page3.queryExecution.executedPlan.toString
      require(plan.contains("TakeOrderedAndProject"),
        "q171: the page seek must plan a top-k, not a global sort")
      require(!plan.contains("Exchange rangepartitioning"),
        "q171: keyset pagination must never range-sort the table")
      page3.select(col("o_orderkey"), round(col("o_totalprice"), 6).as("o_totalprice"))
    },

    // ---------------------------------------------------------------- q172
    // Hopping (sliding) window aggregation via Spark's NATIVE window(ts,
    // duration, slide) — each event lands in duration/slide windows in one
    // Expand pass (no self-join): 3-day windows sliding daily over the
    // event stream, epoch-aligned starts identical in both engines. q18 is
    // the tumbling special case; q87 builds the same shape from explicit
    // joins — this is the operator form a streaming aggregation would use.
    Q("q172_hopping_window",
      """WITH e AS (SELECT event_id, event_type, CAST(ts AS DATE) AS day FROM events),
        |x AS (SELECT event_id, event_type, day - CAST(k.k AS INTEGER) AS win_start
        |      FROM e, range(3) k(k))
        |SELECT event_type, win_start, count(*) AS n_events,
        |  CAST(SUM(event_id) AS BIGINT) AS id_sum
        |FROM x GROUP BY 1, 2""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "events")
        .groupBy(col("event_type"), window(col("ts"), "3 days", "1 day"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("event_id")).cast("bigint").as("id_sum"))
        .select(col("event_type"), col("window.start").cast("date").as("win_start"),
          col("n_events"), col("id_sum"))
    },

    // ---------------------------------------------------------------- q173
    // Replica reconciliation by partition signature (the anti-entropy /
    // Merkle-level pattern): two 100 TB replicas are compared by ONE
    // (count, content-hash-sum) pair per partition — BIGINT row hashes from
    // the shared md5 family, summed order-independently — and only the
    // partitions whose signatures differ are flagged for re-sync. Planted
    // divergence: one partition with a mutated row, one with a deleted row.
    // The require pins that EXACTLY the planted partitions surface; the
    // oracle replays both replicas' signatures from the same hash algebra.
    Q("q173_replica_reconcile",
      """WITH a AS (SELECT l_orderkey % 64 AS p,
        |    CAST(CAST('0x' || substring(md5(concat_ws('|',
        |      CAST(l_orderkey AS VARCHAR), CAST(l_linenumber AS VARCHAR),
        |      CAST(CAST(l_quantity AS BIGINT) AS VARCHAR))), 1, 8) AS BIGINT) AS BIGINT) AS h
        |  FROM lineitem),
        |b AS (SELECT l_orderkey % 64 AS p,
        |    CAST(CAST('0x' || substring(md5(concat_ws('|',
        |      CAST(l_orderkey AS VARCHAR), CAST(l_linenumber AS VARCHAR),
        |      CAST(CAST(l_quantity AS BIGINT)
        |           + CASE WHEN l_orderkey % 64 = 7 AND l_linenumber = 1
        |                  THEN 1 ELSE 0 END AS VARCHAR))), 1, 8) AS BIGINT) AS BIGINT) AS h
        |  FROM lineitem
        |  WHERE NOT (l_orderkey % 64 = 21 AND l_linenumber = 3)),
        |sa AS (SELECT p, count(*) AS n_a, sum(h) AS s_a FROM a GROUP BY 1),
        |sb AS (SELECT p, count(*) AS n_b, sum(h) AS s_b FROM b GROUP BY 1)
        |SELECT p, n_a, n_b
        |FROM sa JOIN sb USING (p)
        |WHERE n_a <> n_b OR s_a <> s_b""".stripMargin) { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity").cast("long").as("qty"))
      def sig(df: org.apache.spark.sql.DataFrame, n: String, sSum: String) = df
        .withColumn("h", conv(substring(md5(concat_ws("|",
          col("l_orderkey").cast("string"), col("l_linenumber").cast("string"),
          col("qty").cast("string"))), 1, 8), 16, 10).cast("long"))
        .groupBy((col("l_orderkey") % 64).as("p"))
        .agg(count(lit(1)).as(n), sum(col("h")).as(sSum))
      val a = sig(li, "n_a", "s_a")
      // replica B: one mutated row in partition 7, one deleted in 21
      val b = sig(li
        .withColumn("qty", col("qty") +
          when(col("l_orderkey") % 64 === 7 && col("l_linenumber") === 1, 1L)
            .otherwise(0L))
        .filter(!(col("l_orderkey") % 64 === 21 && col("l_linenumber") === 3)),
        "n_b", "s_b")
      val diverged = a.join(b, "p")
        .filter(col("n_a") =!= col("n_b") || col("s_a") =!= col("s_b"))
        .select(col("p"), col("n_a"), col("n_b"))
        .localCheckpoint() // read by the require and returned
      val ps = diverged.select(col("p")).collect().map(_.getLong(0)).toSet
      require(ps == Set(7L, 21L),
        s"q173: exactly the planted partitions must diverge, got $ps")
      diverged
    },

    // ---------------------------------------------------------------- q175
    // The pure-SQL surface: the ENTIRE query is ANSI SQL text through
    // spark.sql(), using the library's natively-registered functions
    // (GraftRules.registerFunctions) — fuzzy supplier-name pairs within a
    // nation block, scored by the codegen'd jaro_winkler over NFC-normalized
    // names. This is the contract a SQL-first user of the library gets: the
    // same expressions, same codegen, no Column API required. The 0.87
    // threshold is safe on the boundary because the expression is pinned
    // byte-for-byte to DuckDB's independent implementation (q123).
    Q("q175_sql_function_surface",
      """SELECT a.s_suppkey AS id_a, b.s_suppkey AS id_b,
        |  round(jaro_winkler_similarity(nfc_normalize(lower(a.s_name)),
        |                                nfc_normalize(lower(b.s_name))), 6) AS sim
        |FROM supplier a JOIN supplier b
        |  ON a.s_nationkey = b.s_nationkey AND a.s_suppkey < b.s_suppkey
        |WHERE jaro_winkler_similarity(nfc_normalize(lower(a.s_name)),
        |                              nfc_normalize(lower(b.s_name))) >= 0.87""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "supplier").createOrReplaceTempView("q175_supplier")
      val out = s.sql(
        """SELECT a.s_suppkey AS id_a, b.s_suppkey AS id_b,
          |  round(jaro_winkler(nfc_normalize(lower(a.s_name)),
          |                     nfc_normalize(lower(b.s_name))), 6) AS sim
          |FROM q175_supplier a JOIN q175_supplier b
          |  ON a.s_nationkey = b.s_nationkey AND a.s_suppkey < b.s_suppkey
          |WHERE jaro_winkler(nfc_normalize(lower(a.s_name)),
          |                   nfc_normalize(lower(b.s_name))) >= 0.87""".stripMargin)
        .localCheckpoint() // materialize before the temp view is dropped
      s.catalog.dropTempView("q175_supplier")
      out
    },

    // ---------------------------------------------------------------- q176
    // Mergeable quantile summaries — the property that makes a quantile
    // affordable at 100 TB: each segment keeps a fixed-bin histogram
    // (literal 2 500-wide bins, q74's trick), and segment summaries MERGE
    // by addition — no rescan, no resort. Required in-query: (1) the merge
    // theorem — merged segment histograms equal the direct full-table
    // histogram EXACTLY; (2) the error contract — each bin-edge quantile
    // estimate brackets Spark's exact sort-based percentile within one bin
    // width (the q119/q121 guard pattern). The oracle replays histogram,
    // cumulative and estimate from the raw table.
    Q("q176_mergeable_quantiles",
      """WITH h AS (
        |  SELECT LEAST(CAST(floor(l_extendedprice / 2500) AS BIGINT), 60) AS bin,
        |    count(*) AS cnt
        |  FROM lineitem GROUP BY 1),
        |c AS (SELECT bin, cnt,
        |    sum(cnt) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS cum,
        |    sum(cnt) OVER () AS n FROM h)
        |SELECT q, round(CAST(2500 * min(bin) AS DOUBLE), 6) AS est_lo
        |FROM c, (SELECT CAST(0.5 AS DOUBLE) AS q
        |         UNION ALL SELECT CAST(0.9 AS DOUBLE)) t
        |WHERE cum >= CAST(ceil(q * n) AS BIGINT)
        |GROUP BY q""".stripMargin) { (s, dir) =>
      import s.implicits._
      val li = Tables.load(s, dir, "lineitem")
        .select(col("l_extendedprice").as("price"),
          (col("l_orderkey") % 4).as("seg"))
      val bin = least(floor(col("price") / 2500).cast("long"), lit(60L)).as("bin")
      // per-segment summaries, then the MERGE: add counts — never rescan
      val segHists = li.groupBy(col("seg"), bin).agg(count(lit(1)).as("cnt"))
        .localCheckpoint() // the artifact a 100 TB run stores per partition
      val merged = segHists.groupBy(col("bin"))
        .agg(sum(col("cnt")).cast("bigint").as("cnt"))
      val direct = li.groupBy(bin).agg(count(lit(1)).as("cnt"))
        .localCheckpoint() // both exceptAll directions read it
      require(Q.sameMultiset(merged, direct),
        "q176: merged segment histograms must equal the direct histogram exactly")
      // quantile estimates from the merged summary (bounded bin domain)
      val wCum = Window.orderBy(col("bin")).rowsBetween(Window.unboundedPreceding, 0)
      val cum = merged
        .withColumn("cum", sum(col("cnt")).over(wCum))
        .withColumn("n", sum(col("cnt")).over(Window.partitionBy()))
        .localCheckpoint() // 61 rows; two quantile probes + the guard read it
      def estLo(qf: Double): Double = cum
        .filter(col("cum") >= ceil(lit(qf) * col("n")).cast("long"))
        .agg(min(col("bin"))).head().getLong(0) * 2500.0
      // the guard: both estimates must bracket the EXACT sort-based
      // percentiles. Round-18 optimization (guide §1.2, measured 3.6 s of
      // a 5.2 s query): Spark's holistic `percentile()` builds a
      // value→count map per partition and merges + sorts it on ONE
      // reducer — the exact shape that cannot scale and that dominated
      // here. The same order statistics come from a TWO-LEVEL selection
      // over the summary the query already maintains: the merged
      // histogram's exact per-bin counts locate each rank's bin, and an
      // in-bin top-k (parallel TakeOrdered over O(bin) rows, never
      // O(table)) resolves the value; interpolation follows percentile()'s
      // own `(hi-pos)*lower + (pos-lo)*higher` convention. Exactness is
      // unchanged — these ARE the sort-based order statistics.
      val nTotal = cum.agg(max(col("n"))).head().getLong(0)
      val binsAsc = cum.select(col("bin"), (col("cum") - col("cnt")).as("before"),
          col("cum")).orderBy(col("bin")).collect() // ≤ 61 rows
      def valueAt(idx: Long): Double = {
        val r = binsAsc.find(r => r.getLong(2) > idx).getOrElse(
          sys.error(s"q176: rank $idx beyond histogram total"))
        val off = idx - r.getLong(1) // 0-based within the bin
        li.filter(bin === r.getLong(0)).select(col("price").cast("double").as("p"))
          .orderBy(col("p")).limit(off.toInt + 1)
          .agg(max(col("p"))).head().getDouble(0)
      }
      def exactPct(qf: Double): Double = {
        val pos = qf * (nTotal - 1) // percentile()'s 0-based rank
        val lo = math.floor(pos).toLong
        val hi = math.ceil(pos).toLong
        val vLo = valueAt(lo)
        if (hi == lo) vLo
        else (hi - pos) * vLo + (pos - lo) * valueAt(hi)
      }
      Seq(0.5 -> exactPct(0.5), 0.9 -> exactPct(0.9)).foreach { case (qf, ex) =>
        val est = estLo(qf)
        // two-bin bracket (round-4 ADVICE): Spark's percentile() linearly
        // interpolates between the two straddled order statistics; when
        // those fall in ADJACENT bins the interpolated value can exceed
        // est + one bin width even though the rank-ceil(q·N) statistic
        // itself is inside est's bin — the contract is on the summary, not
        // on the interpolation convention, so the guard allows both bins
        require(est <= ex && ex < est + 2 * 2500.0,
          s"q176: estimate $est must bracket exact $ex within two bins at q=$qf")
      }
      Seq((0.5, estLo(0.5)), (0.9, estLo(0.9))).toDF("q", "est_lo")
        .select(col("q"), round(col("est_lo"), 6).as("est_lo"))
    },

    // ---------------------------------------------------------------- q187
    // VARIANT semi-structured type (Spark 4, same encoding Delta adopted):
    // JSON ingested ONCE into the binary variant encoding, then fields
    // extracted with typed `variant_get` paths — no per-access re-parse, no
    // up-front schema, the open-format answer to "a string column full of
    // JSON". The document is built deterministically from order columns
    // (identical concat on both engines), round-tripped through
    // parse_json → variant_get, and the in-query require proves extraction
    // ≡ the original columns row-for-row — nested object and array paths
    // included. The oracle replays the same construction through DuckDB's
    // JSON extraction. Scale note: variant decode is columnar and
    // codegen'd; the 100 TB pattern is ingest-once-extract-many, exactly
    // what this measures against string re-parsing.
    Q("q187_variant_type",
      """WITH j AS (SELECT o_orderkey,
        |  '{"id":' || o_orderkey || ',"tags":["' || o_orderpriority ||
        |    '"],"cust":{"key":' || o_custkey || '}}' AS doc FROM orders),
        |x AS (SELECT o_orderkey,
        |  CAST(json_extract_string(doc, '$.tags[0]') AS VARCHAR) AS tag,
        |  CAST(json_extract(doc, '$.cust.key') AS BIGINT) AS cust_key FROM j)
        |SELECT tag, CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(sum(cust_key) AS BIGINT) AS cust_key_sum,
        |  CAST(count(DISTINCT cust_key) AS BIGINT) AS n_cust
        |FROM x GROUP BY 1""".stripMargin) { (s, dir) =>
      val orders = Tables.load(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"),
          col("o_custkey").cast("long").as("o_custkey"))
      val doc = concat(lit("{\"id\":"), col("o_orderkey"),
        lit(",\"tags\":[\""), col("o_orderpriority"),
        lit("\"],\"cust\":{\"key\":"), col("o_custkey"), lit("}}"))
      val v = orders.withColumn("v", parse_json(doc))
      val extracted = v.select(
        variant_get(col("v"), "$.id", "bigint").as("o_orderkey"),
        variant_get(col("v"), "$.tags[0]", "string").as("o_orderpriority"),
        variant_get(col("v"), "$.cust.key", "bigint").as("o_custkey"))
        .localCheckpoint() // the round-trip proof AND the output read it
      // round-trip proof: ingest-once extract-typed loses nothing
      require(Q.sameMultiset(extracted, orders),
        "q187: variant extraction must reproduce the source columns exactly")
      extracted.groupBy(col("o_orderpriority").as("tag"))
        .agg(count(lit(1)).cast("bigint").as("n_orders"),
          sum(col("o_custkey")).cast("bigint").as("cust_key_sum"),
          countDistinct(col("o_custkey")).cast("bigint").as("n_cust"))
    })
}
