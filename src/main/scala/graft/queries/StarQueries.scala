package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.analytics.Measures
import graft.ops.{DateDim, Dedup, Normalize, SurrogateKeys, Upsert}

/** SURVEY §2.3-§2.4, §2.6-§2.7, §2.9: star-schema construction (MERGE
  * decomposition, surrogate keys, date dimension), the DAX window measures,
  * top-k, and the tumbling-window shape of the streaming variant.
  */
object StarQueries {

  private val Dec18 = "decimal(18,6)"
  private val Dec38 = "decimal(38,6)"
  private val cutoff = "2024-01-15 00:00:00"
  private val cutoffEnd = "2024-01-16 00:00:00"

  private def eventsBefore(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables.load(s, dir, "events").filter(col("ts") < lit(cutoff).cast("timestamp"))

  private def eventsBatch(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables.load(s, dir, "events").filter(
      col("ts") >= lit(cutoff).cast("timestamp") && col("ts") < lit(cutoffEnd).cast("timestamp"))

  val all: Seq[Q] = Seq(

    // ---------------------------------------------------------------- q11
    // J5/J8: key-match MERGE decomposed into anti-join + union — source wins
    // on collision, target survives otherwise (merge_core.sql semantics on
    // the events stream: target = history before the cutoff date, source =
    // the day's deduped batch). Scale: the source side is one day — Spark
    // broadcasts it and the TB-sized target never shuffles.
    Q("q11_upsert_merge",
      s"""WITH tgt AS (
        |  SELECT user_id, upper(trim(event_type)) AS event_type, event_id, value
        |  FROM events WHERE ts < TIMESTAMP '$cutoff'
        |  QUALIFY row_number() OVER (PARTITION BY user_id, upper(trim(event_type))
        |                             ORDER BY ts DESC, event_id DESC) = 1),
        |src AS (
        |  SELECT user_id, upper(trim(event_type)) AS event_type, event_id, value
        |  FROM events WHERE ts >= TIMESTAMP '$cutoff' AND ts < TIMESTAMP '$cutoffEnd'
        |  QUALIFY row_number() OVER (PARTITION BY user_id, upper(trim(event_type))
        |                             ORDER BY ts DESC, event_id DESC) = 1)
        |SELECT t.* FROM tgt t
        |WHERE NOT EXISTS (SELECT 1 FROM src s
        |                  WHERE s.user_id = t.user_id AND s.event_type = t.event_type)
        |UNION ALL
        |SELECT * FROM src""".stripMargin) { (s, dir) =>
      def dedup(df: org.apache.spark.sql.DataFrame) =
        Dedup.latestBy(df, Seq(col("user_id"), Normalize.normKey(col("event_type"))),
            Seq(col("ts"), col("event_id")))
          .select(col("user_id"), Normalize.normKey(col("event_type")).as("event_type"),
            col("event_id"), col("value"))
      Upsert.merge(dedup(eventsBefore(s, dir)), dedup(eventsBatch(s, dir)),
        Seq("user_id", "event_type"))
    },

    // ---------------------------------------------------------------- q12
    // J6 + surrogate keys: insert-only dimension merge — existing members keep
    // their ids, new members get max(existing)+row_number (deterministic;
    // never monotonically_increasing_id).
    Q("q12_dim_upsert",
      s"""WITH existing AS (
        |  SELECT DISTINCT user_id FROM events WHERE ts < TIMESTAMP '$cutoff'),
        |ex_dim AS (
        |  SELECT row_number() OVER (ORDER BY user_id) AS security_id, user_id FROM existing),
        |fresh AS (
        |  SELECT DISTINCT user_id FROM events
        |  WHERE ts >= TIMESTAMP '$cutoff' AND ts < TIMESTAMP '$cutoffEnd'
        |    AND user_id NOT IN (SELECT user_id FROM existing))
        |SELECT security_id, user_id FROM ex_dim
        |UNION ALL
        |SELECT (SELECT count(*) FROM existing) + row_number() OVER (ORDER BY user_id)
        |  AS security_id, user_id FROM fresh""".stripMargin) { (s, dir) =>
      val existing = eventsBefore(s, dir).select(col("user_id")).distinct()
      // exDim serves the maxKey action AND the final union: one assignment
      // pass, not two
      val exDim = SurrogateKeys.assign(existing, "security_id", 0L, Seq("user_id"))
        .select(col("security_id"), col("user_id"))
        .localCheckpoint()
      val fresh = eventsBatch(s, dir).select(col("user_id")).distinct()
        .join(existing, Seq("user_id"), "left_anti")
      val maxId = SurrogateKeys.maxKey(exDim, "security_id")
      exDim.unionByName(
        SurrogateKeys.assign(fresh, "security_id", maxId, Seq("user_id"))
          .select(col("security_id"), col("user_id")))
    },

    // ---------------------------------------------------------------- q13
    // D1-D10: the full calendar dimension from observed order dates, with the
    // Snowflake semantic deltas handled (Sunday=0 weekday, 3-letter names,
    // ISO week). Pure projection after a 1-column distinct.
    Q("q13_date_dim",
      """SELECT CAST(strftime(d, '%Y%m%d') AS INT) AS date_sk,
        |  d AS cal_date,
        |  CAST(year(d) AS INT) AS year_num,
        |  CAST(quarter(d) AS INT) AS quarter_num,
        |  CAST(month(d) AS INT) AS month_num,
        |  strftime(d, '%b') AS month_name,
        |  CAST(day(d) AS INT) AS day_num,
        |  strftime(d, '%a') AS day_name,
        |  CAST(dayofweek(d) AS INT) AS day_of_week,
        |  CAST(weekofyear(d) AS INT) AS week_of_year,
        |  dayofweek(d) IN (0, 6) AS is_weekend
        |FROM (SELECT DISTINCT CAST(o_orderdate AS DATE) AS d FROM orders)""".stripMargin) { (s, dir) =>
      DateDim.fromDates(Tables.load(s, dir, "orders"), col("o_orderdate"))
    },

    // ---------------------------------------------------------------- q14
    // J1/J2 + D1: fact build — events batch joined to the user dimension and
    // the yyyymmdd date key, both through broadcast hash joins.
    Q("q14_fact_build",
      s"""WITH dim AS (
        |  SELECT row_number() OVER (ORDER BY user_id) AS security_id, user_id
        |  FROM (SELECT DISTINCT user_id FROM events))
        |SELECT d.security_id,
        |  CAST(strftime(CAST(e.ts AS DATE), '%Y%m%d') AS INT) AS date_sk,
        |  e.event_id, e.value
        |FROM events e JOIN dim d ON e.user_id = d.user_id
        |WHERE e.ts >= TIMESTAMP '$cutoff' AND e.ts < TIMESTAMP '$cutoffEnd'""".stripMargin) { (s, dir) =>
      val ev = Tables.load(s, dir, "events")
      val dim = SurrogateKeys.assign(ev.select(col("user_id")).distinct(),
        "security_id", 0L, Seq("user_id"))
      eventsBatch(s, dir)
        .join(broadcast(dim), Seq("user_id"))
        .select(col("security_id"),
          date_format(to_date(col("ts")), "yyyyMMdd").cast("int").as("date_sk"),
          col("event_id"), col("value"))
    },

    // ---------------------------------------------------------------- q15
    // W2: Daily Change % — lag over trading days, DIVIDE(c-p, p, 0) null/zero
    // semantics, on per-supplier daily revenue.
    Q("q15_daily_change",
      """WITH daily AS (
        |  SELECT l_suppkey, CAST(l_shipdate AS DATE) AS cal_day,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS revenue
        |  FROM lineitem GROUP BY 1, 2)
        |SELECT l_suppkey, cal_day,
        |  round(CAST(revenue AS DOUBLE), 6) AS revenue,
        |  round(CAST(lag(revenue) OVER w AS DOUBLE), 6) AS prev_revenue,
        |  CASE WHEN lag(revenue) OVER w IS NULL OR CAST(lag(revenue) OVER w AS DOUBLE) = 0
        |       THEN 0.0
        |       ELSE (CAST(revenue AS DOUBLE) - CAST(lag(revenue) OVER w AS DOUBLE))
        |            / CAST(lag(revenue) OVER w AS DOUBLE) END AS daily_change_pct
        |FROM daily
        |WINDOW w AS (PARTITION BY l_suppkey ORDER BY cal_day)""".stripMargin) { (s, dir) =>
      val daily = Tables.load(s, dir, "lineitem")
        .groupBy(col("l_suppkey"), to_date(col("l_shipdate")).as("cal_day"))
        .agg(sum(col("l_extendedprice").cast(Dec18)).cast(Dec38).as("revenue"))
      // pct is computed from the exact decimals; only the emitted revenue
      // columns are retyped (round-double, both sides) for the driver hash
      Measures.dailyChangePct(daily, Seq(col("l_suppkey")), col("cal_day"), col("revenue"))
        .select(col("l_suppkey"), col("cal_day"),
          round(col("revenue").cast("double"), 6).as("revenue"),
          round(col("prev_close").cast("double"), 6).as("prev_revenue"),
          col("daily_change_pct"))
    },

    // ---------------------------------------------------------------- q16
    // W3/D12: trailing 7-day average via an integer-day RANGE frame —
    // engine-neutral (6 PRECEDING on a day index), exact decimal window sum /
    // window count.
    Q("q16_trailing_window",
      """WITH daily AS (
        |  SELECT l_suppkey, CAST(l_shipdate AS DATE) AS cal_day,
        |    CAST(datediff('day', DATE '1995-01-01', CAST(l_shipdate AS DATE)) AS INT) AS day_idx,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS total_qty
        |  FROM lineitem GROUP BY 1, 2, 3)
        |SELECT l_suppkey, cal_day, day_idx,
        |  round(CAST(total_qty AS DOUBLE), 6) AS total_qty,
        |  CAST(SUM(total_qty) OVER w AS DOUBLE) / COUNT(total_qty) OVER w AS trailing_avg_qty
        |FROM daily
        |WINDOW w AS (PARTITION BY l_suppkey ORDER BY day_idx
        |             RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)""".stripMargin) { (s, dir) =>
      val daily = Tables.load(s, dir, "lineitem")
        .groupBy(col("l_suppkey"), to_date(col("l_shipdate")).as("cal_day"),
          datediff(to_date(col("l_shipdate")), lit("1995-01-01").cast("date")).as("day_idx"))
        .agg(sum(col("l_quantity").cast(Dec18)).cast(Dec38).as("total_qty"))
      Measures.trailingAvg(daily, Seq(col("l_suppkey")), col("day_idx"),
          col("total_qty"), 7, "trailing_avg_qty")
        .select(col("l_suppkey"), col("cal_day"), col("day_idx"),
          round(col("total_qty").cast("double"), 6).as("total_qty"),
          col("trailing_avg_qty"))
    },

    // ---------------------------------------------------------------- q17
    // §2.7: global sort + limit (top-k) with a deterministic tiebreaker.
    // Scale: Spark plans TakeOrderedAndProject — per-partition top-k then a
    // k-row merge on the driver, never a full sort.
    Q("q17_topk_orders",
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10)
    },

    // ---------------------------------------------------------------- q33
    // J3: expression equi-join — the join predicate itself computes
    // UPPER(TRIM()) on the probe side (premerge_metrics.sql:20-25 shape).
    Q("q33_expr_join",
      """WITH dim AS (SELECT DISTINCT upper(trim(event_type)) AS et FROM events)
        |SELECT d.et, count(*) AS n_events
        |FROM events e JOIN dim d ON upper(trim(e.event_type)) = d.et
        |GROUP BY d.et""".stripMargin) { (s, dir) =>
      val ev = Tables.load(s, dir, "events")
      val dim = ev.select(Normalize.normKey(col("event_type")).as("et")).distinct()
      ev.join(broadcast(dim), Normalize.normKey(col("event_type")) === col("et"))
        .groupBy(col("et"))
        .agg(count(lit(1)).as("n_events"))
    },

    // ---------------------------------------------------------------- q34
    // §2.10: typed Aggregator — VWAP (SUMX(px*qty)/SUM(qty)) as a reusable
    // named aggregate with exact decimal partial sums.
    Q("q34_vwap",
      """SELECT l_suppkey,
        |  round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(19,6)) * CAST(l_quantity AS DECIMAL(19,6))) AS DOUBLE)
        |    / CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE), 6) AS vwap
        |FROM lineitem GROUP BY l_suppkey""".stripMargin) { (s, dir) =>
      // round(_, 6) on both sides: DuckDB's decimal->double conversion is
      // double-rounded (int128 / 10^s) and can sit 1 ulp away from Spark's
      // correctly-rounded BigDecimal conversion; 6-dp rounding absorbs it.
      Tables.load(s, dir, "lineitem")
        .groupBy(col("l_suppkey"))
        .agg(round(
          graft.analytics.Vwap.column(col("l_extendedprice"), col("l_quantity")), 6).as("vwap"))
    },

    // ---------------------------------------------------------------- q45
    // Grouping sets: per-(lang,source), per-lang, per-source, and grand
    // totals in one pass (Expand + single aggregate) — the rollup a corpus
    // curation dashboard runs.
    Q("q45_grouping_sets",
      """SELECT lang, source, count(*) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS total_chars
        |FROM documents
        |GROUP BY GROUPING SETS ((lang, source), (lang), (source), ())""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "documents")
        .groupingSets(
          Seq(Seq(col("lang"), col("source")), Seq(col("lang")), Seq(col("source")), Seq()),
          col("lang"), col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))
    },

    // ---------------------------------------------------------------- q46
    // Pivot: event counts per user across the five event types as columns —
    // oracle spelled as conditional aggregation (engine-neutral).
    Q("q46_pivot",
      """SELECT user_id,
        |  CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
        |  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
        |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
        |  CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
        |  CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
        |FROM events GROUP BY user_id""".stripMargin) { (s, dir) =>
      val types = Seq("click", "error", "purchase", "signup", "view")
      val p = Tables.load(s, dir, "events")
        .groupBy(col("user_id"))
        .pivot("event_type", types)
        .agg(count(lit(1)))
      // absent (user, type) cells surface as null AFTER the pivot
      p.select(col("user_id") +: types.map(t => coalesce(col(t), lit(0L)).as(t)): _*)
    },

    // ---------------------------------------------------------------- q42
    // Gap sessionization (30-min inactivity), batch form: lag + conditional
    // running sum — one shuffle on the key. The streaming twin
    // (flatMapGroupsWithState) is checked against this in SessionizeSpec.
    Q("q42_sessionize",
      """WITH e AS (SELECT user_id, epoch_us(ts) AS us FROM events),
        |m AS (SELECT user_id, us,
        |  CASE WHEN lag(us) OVER w IS NULL OR us - lag(us) OVER w > 1800000000
        |       THEN 1 ELSE 0 END AS s
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us)),
        |sess AS (SELECT user_id, us,
        |  CAST(SUM(s) OVER (PARTITION BY user_id ORDER BY us
        |                    ROWS UNBOUNDED PRECEDING) AS INT) AS session_id
        |  FROM m)
        |SELECT user_id, session_id, count(*) AS n_events,
        |  min(us) AS start_us, max(us) AS end_us
        |FROM sess GROUP BY 1, 2""".stripMargin) { (s, dir) =>
      graft.streaming.Sessionize.batchSummary(
        Tables.load(s, dir, "events"), "user_id", "ts", gapMinutes = 30)
    },

    // ---------------------------------------------------------------- q43
    // Exact interpolated percentiles (median, p95) — Spark `percentile` and
    // DuckDB `quantile_cont` share the linear-interpolation definition;
    // 6-dp rounding absorbs conversion ulps.
    Q("q43_percentiles",
      """SELECT o_orderpriority,
        |  round(quantile_cont(o_totalprice, 0.5), 6) AS p50,
        |  round(quantile_cont(o_totalprice, 0.95), 6) AS p95,
        |  count(*) AS n
        |FROM orders GROUP BY o_orderpriority""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(
          round(expr("percentile(o_totalprice, 0.5)"), 6).as("p50"),
          round(expr("percentile(o_totalprice, 0.95)"), 6).as("p95"),
          count(lit(1)).as("n"))
    },

    // ---------------------------------------------------------------- q120
    // Exponentially weighted moving average with EXACT arithmetic: decay
    // 1/2 makes every weight a dyadic rational (exactly representable in
    // DECIMAL), so the 7-term convolution is exact integer-scaled math on
    // both engines — where a general EWMA recursion accumulates doubles in
    // arrival order. The unrolled-lag form is also the plan you want: one
    // partitioned window, no recursion, codegen-friendly.
    Q("q120_ewma",
      """WITH s AS (SELECT l_suppkey, CAST(l_shipdate AS DATE) AS d,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS qty
        |  FROM lineitem WHERE l_suppkey % 20 = 1 GROUP BY 1, 2),
        |w AS (SELECT l_suppkey, d, qty,
        |  lag(qty, 1) OVER win AS q1, lag(qty, 2) OVER win AS q2,
        |  lag(qty, 3) OVER win AS q3
        |  FROM s WINDOW win AS (PARTITION BY l_suppkey ORDER BY d))
        |SELECT l_suppkey, d,
        |  round(CAST(qty AS DOUBLE), 6) AS qty,
        |  round(CAST(
        |    (CAST(qty AS DECIMAL(24,12)) * 8 + coalesce(q1, 0) * 4
        |     + coalesce(q2, 0) * 2 + coalesce(q3, 0) * 1)
        |    / (8 + CASE WHEN q1 IS NULL THEN 0 ELSE 4 END
        |         + CASE WHEN q2 IS NULL THEN 0 ELSE 2 END
        |         + CASE WHEN q3 IS NULL THEN 0 ELSE 1 END) AS DOUBLE), 6) AS ewma
        |FROM w""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val daily = Tables.load(s, dir, "lineitem")
        .filter(col("l_suppkey") % 20 === 1)
        .groupBy(col("l_suppkey"), to_date(col("l_shipdate")).as("d"))
        .agg(sum(col("l_quantity").cast("decimal(18,6)")).cast("decimal(18,6)").as("qty"))
      val win = Window.partitionBy(col("l_suppkey")).orderBy(col("d"))
      val Seq(q1, q2, q3) = Seq(1, 2, 3).map(j => lag(col("qty"), j).over(win))
      // numerator/denominator in exact decimal; ONE division to double at the end
      val num = col("qty").cast("decimal(24,12)") * 8 +
        coalesce(q1, lit(0)) * 4 + coalesce(q2, lit(0)) * 2 + coalesce(q3, lit(0)) * 1
      val den = lit(8) + when(q1.isNull, 0).otherwise(4) +
        when(q2.isNull, 0).otherwise(2) + when(q3.isNull, 0).otherwise(1)
      daily.select(col("l_suppkey"), col("d"),
        round(col("qty").cast("double"), 6).as("qty"),
        round((num / den).cast("double"), 6).as("ewma"))
    },

    // ---------------------------------------------------------------- q121
    // Guarded approximate quantile (t-digest-family sketch): the
    // percentile_approx estimate must sit within 2% of the exact
    // interpolated median in-query; the oracle checks exact (sketches are
    // never cross-engine comparable — q119's contract pattern). The approx
    // pass is one constant-state aggregate where exact percentile sorts
    // every group.
    Q("q121_approx_quantile_guarded",
      """SELECT o_orderpriority,
        |  round(quantile_cont(CAST(o_totalprice AS DOUBLE), 0.5), 6) AS p50_exact,
        |  count(*) AS n
        |FROM orders GROUP BY 1""".stripMargin) { (s, dir) =>
      val both = Tables.load(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(expr("percentile(CAST(o_totalprice AS DOUBLE), 0.5)").as("p50_exact"),
          expr("percentile_approx(CAST(o_totalprice AS DOUBLE), 0.5, 2000)").as("p50_approx"),
          count(lit(1)).as("n"))
        .localCheckpoint()
      val worst = both.select(max(abs(col("p50_approx") - col("p50_exact")) /
        col("p50_exact")).as("e")).head().getDouble(0)
      require(worst <= 0.02, f"approx median must sit within 2%% of exact, worst $worst%.4f")
      both.select(col("o_orderpriority"),
        round(col("p50_exact"), 6).as("p50_exact"), col("n"))
    },

    // ---------------------------------------------------------------- q122
    // Key-skew profiling: the heavy-hitter keys per dimension whose share
    // exceeds 10x the uniform expectation — the diagnostic that decides
    // WHERE salting (q37) and AQE skew splitting are needed before a 100 TB
    // join. Bounded-heap top-5 per profiled column; shares are exact-count
    // divisions.
    Q("q122_skew_profile",
      """WITH c AS (
        |  SELECT 'l_suppkey' AS dim, CAST(l_suppkey AS VARCHAR) AS key_val,
        |    count(*) AS cnt FROM lineitem GROUP BY 2
        |  UNION ALL
        |  SELECT 'l_returnflag', l_returnflag, count(*) FROM lineitem GROUP BY 2),
        |t AS (SELECT dim, CAST(sum(cnt) AS BIGINT) AS total,
        |  count(*) AS n_keys FROM c GROUP BY 1),
        |r AS (SELECT c.dim, c.key_val, c.cnt, t.total, t.n_keys,
        |  row_number() OVER (PARTITION BY c.dim ORDER BY c.cnt DESC, c.key_val) AS rn
        |  FROM c JOIN t USING (dim))
        |SELECT dim, key_val, cnt,
        |  round(CAST(cnt AS DOUBLE) / total, 6) AS share,
        |  round(CAST(cnt AS DOUBLE) * n_keys / total, 6) AS x_uniform
        |FROM r WHERE rn <= 5""".stripMargin) { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
      val counts = li.groupBy(col("l_suppkey").cast("string").as("key_val"))
        .agg(count(lit(1)).as("cnt")).withColumn("dim", lit("l_suppkey"))
        .unionByName(li.groupBy(col("l_returnflag").as("key_val"))
          .agg(count(lit(1)).as("cnt")).withColumn("dim", lit("l_returnflag")))
      val totals = counts.groupBy(col("dim"))
        .agg(sum(col("cnt")).cast("long").as("total"), count(lit(1)).as("n_keys"))
      graft.plans.TopK.perGroup(counts, Seq("dim"),
          Seq(("cnt", true), ("key_val", false)), 5)
        .join(broadcast(totals), Seq("dim"))
        .select(col("dim"), col("key_val"), col("cnt"),
          round(col("cnt").cast("double") / col("total"), 6).as("share"),
          round(col("cnt").cast("double") * col("n_keys") / col("total"), 6).as("x_uniform"))
    },

    // ---------------------------------------------------------------- q118
    // Robust statistics: median absolute deviation per priority class — the
    // outlier-resistant spread measure (a z-score's stddev is dragged by the
    // outliers it is meant to find; MAD is not). Two exact interpolated
    // percentile passes with a broadcast median re-join between them; both
    // engines share the interpolation definition (proven by q43).
    Q("q118_mad",
      """WITH med AS (SELECT o_orderpriority,
        |  quantile_cont(CAST(o_totalprice AS DOUBLE), 0.5) AS med
        |  FROM orders GROUP BY 1),
        |d AS (SELECT o.o_orderpriority, med.med,
        |  abs(CAST(o.o_totalprice AS DOUBLE) - med.med) AS dev
        |  FROM orders o JOIN med USING (o_orderpriority))
        |SELECT o_orderpriority, count(*) AS n,
        |  round(max(med), 6) AS median_price,
        |  round(quantile_cont(dev, 0.5), 6) AS mad
        |FROM d GROUP BY 1""".stripMargin) { (s, dir) =>
      val orders = Tables.load(s, dir, "orders")
      val med = orders.groupBy(col("o_orderpriority"))
        .agg(expr("percentile(CAST(o_totalprice AS DOUBLE), 0.5)").as("med"))
      orders.join(broadcast(med), Seq("o_orderpriority"))
        .select(col("o_orderpriority"), col("med"),
          abs(col("o_totalprice").cast("double") - col("med")).as("dev"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          round(max(col("med")), 6).as("median_price"),
          round(expr("percentile(dev, 0.5)"), 6).as("mad"))
    },

    // ---------------------------------------------------------------- q129
    // Trimmed (10-90%) mean per priority class — q118's companion robust
    // location estimate: exact interpolated percentile BOUNDS broadcast
    // back, then a DECIMAL mean over the surviving rows (order-independent;
    // one double division at the end). The standard guard against
    // fat-tailed metrics polluting a per-group average at corpus scale.
    Q("q129_trimmed_mean",
      """WITH b AS (SELECT o_orderpriority,
        |  quantile_cont(CAST(o_totalprice AS DOUBLE), 0.1) AS lo,
        |  quantile_cont(CAST(o_totalprice AS DOUBLE), 0.9) AS hi
        |  FROM orders GROUP BY 1)
        |SELECT o.o_orderpriority,
        |  count(*) AS n_kept,
        |  round(CAST(CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE)
        |        / count(*), 6) AS trimmed_mean
        |FROM orders o JOIN b USING (o_orderpriority)
        |WHERE CAST(o.o_totalprice AS DOUBLE) >= b.lo
        |  AND CAST(o.o_totalprice AS DOUBLE) <= b.hi
        |GROUP BY 1""".stripMargin) { (s, dir) =>
      val orders = Tables.load(s, dir, "orders")
      val bounds = orders.groupBy(col("o_orderpriority"))
        .agg(expr("percentile(CAST(o_totalprice AS DOUBLE), 0.1)").as("lo"),
          expr("percentile(CAST(o_totalprice AS DOUBLE), 0.9)").as("hi"))
      orders.join(broadcast(bounds), Seq("o_orderpriority"))
        .filter(col("o_totalprice").cast("double") >= col("lo") &&
          col("o_totalprice").cast("double") <= col("hi"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_kept"),
          round(sum(col("o_totalprice").cast(Dec18)).cast(Dec38).cast("double") /
            count(lit(1)), 6).as("trimmed_mean"))
    },

    // ---------------------------------------------------------------- q119
    // Guarded approximate distinct: approx_count_distinct (HLL++) per
    // return flag, REQUIRED in-query to land within its 5% error contract
    // of the exact count; the oracle checks the exact counts. HLL sketches
    // differ between engines, so the sketch VALUE can never be
    // oracle-compared — the error-bound require is what puts the
    // approximate operator on the scoreboard honestly. At 100 TB the HLL
    // pass is one combiner-friendly aggregate with constant per-group
    // state, where exact distinct shuffles every key.
    Q("q119_approx_distinct_guarded",
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_exact
        |FROM lineitem GROUP BY 1""".stripMargin) { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
      val both = li.groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("n_exact"),
          approx_count_distinct(col("l_partkey"), 0.02).as("n_approx"))
        .localCheckpoint()
      val worst = both
        .select(max(abs(col("n_approx") - col("n_exact")).cast("double") /
          col("n_exact").cast("double")).as("err"))
        .head().getDouble(0)
      require(worst <= 0.05, f"HLL estimate must sit within 5%% of exact, worst $worst%.4f")
      both.select(col("l_returnflag"), col("n_exact"))
    },

    // ---------------------------------------------------------------- q18
    // §2.9: tumbling 1-day window aggregation — the batch shape of the
    // streaming variant (same plan Structured Streaming produces per
    // micro-batch; see graft.streaming.EventStream for the readStream form).
    Q("q18_tumbling_window",
      """SELECT CAST(date_trunc('day', ts) AS DATE) AS window_day,
        |  upper(trim(event_type)) AS event_type,
        |  count(*) AS n_events,
        |  count(DISTINCT user_id) AS n_users,
        |  round(CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE), 6) AS total_value
        |FROM events GROUP BY 1, 2""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "events")
        .groupBy(window(col("ts"), "1 day").as("w"),
          Normalize.normKey(col("event_type")).as("event_type"))
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"),
          round(sum(col("value").cast(Dec18)).cast(Dec38).cast("double"), 6).as("total_value"))
        .select(to_date(col("w.start")).as("window_day"), col("event_type"),
          col("n_events"), col("n_users"), col("total_value"))
    })
}
