package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.{Dedup, Normalize, SurrogateKeys}

/** Round-3 widening of the analytical surface: the operator families a
  * warehouse team reaches for next once the star schema (StarQueries) and the
  * training-data pipeline (Dedup/Vector/TextQueries) are in place — slowly
  * changing dimensions, time-series repair (gap fill / LOCF), long-format
  * reshaping, cohort semi/anti joins, rolling extrema and drawdown, moment
  * statistics (z-score anomalies, Pearson correlation) computed from exact
  * decimal power sums, ROLLUP subtotals, histograms, and equal-frequency
  * binning.
  *
  * Numeric discipline matches the rest of the catalog (see Q's scaladoc):
  * sums/moments accumulate in DECIMAL (bit-stable under Spark's partial
  * aggregation), ONE conversion to double at the end, `round(_, 6)` on both
  * engines. Derived statistics (mean, variance, correlation) are computed
  * from those exact sums in scalar double arithmetic — deterministic because
  * the inputs are identical on both sides, unlike a streaming `stddev`/`corr`
  * whose merge order varies with partitioning.
  */
object AnalyticsQueries {

  private val Dec18 = "decimal(18,6)"
  private val Dec26 = "decimal(26,6)"
  private val Dec38 = "decimal(38,6)"

  /** Per-supplier daily revenue in exact decimal, restricted to a stable
    * 1-in-20 supplier sample so the derived series queries stay bounded at
    * any scale factor (the modulus keys the sample, not row position).
    */
  private def dailyRevenue(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables.load(s, dir, "lineitem")
      .filter(col("l_suppkey") % 20 === 1)
      .groupBy(col("l_suppkey"), to_date(col("l_shipdate")).as("cal_day"))
      .agg(sum(col("l_extendedprice").cast(Dec18)).cast(Dec18).as("rev"))

  /** The TRUE-ARRAY form of q96 — per-order sorted line-number arrays.
    * This is the library API (nested output a training pipeline consumes);
    * the catalog entry canonicalizes it to a joined string only for the
    * oracle harness. Spec-covered by AnalyticsSpec.
    */
  def arrayAggCore(s: org.apache.spark.sql.SparkSession, dir: String): org.apache.spark.sql.DataFrame =
    Tables.load(s, dir, "lineitem")
      .filter(col("l_orderkey") < 200)
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_list(col("l_linenumber"))).as("line_numbers"),
        count(lit(1)).as("n_lines"))

  /** The q66 SCD2 pipeline (daily status → gaps-and-islands validity
    * ranges), shared with the temporal join q86.
    */
  private def scd2Ranges(s: org.apache.spark.sql.SparkSession, dir: String) = {
    // ONE exchange for the whole pipeline: hash(user_id) satisfies the
    // clustering of all three window/group stages — dedup on (user_id, day),
    // islands on (user_id) and (user_id, status) — because a partitioning on
    // a SUBSET of the clustering keys co-locates them. Without the explicit
    // repartition, each stage inserts its own exchange.
    val byUser = Tables.load(s, dir, "events")
      .withColumn("day", to_date(col("ts")))
      .repartition(col("user_id"))
    val daily = Dedup.latestBy(byUser,
        Seq(col("user_id"), col("day")), Seq(col("ts"), col("event_id")))
      .select(col("user_id"), col("day"), Normalize.normKey(col("event_type")).as("status"))
    val byDay = Window.partitionBy(col("user_id")).orderBy(col("day"))
    val byStatus = Window.partitionBy(col("user_id"), col("status")).orderBy(col("day"))
    daily
      .withColumn("grp", row_number().over(byDay) - row_number().over(byStatus))
      .groupBy(col("user_id"), col("status"), col("grp"))
      .agg(min(col("day")).as("valid_from"), max(col("day")).as("valid_to"),
        count(lit(1)).as("n_days"))
      .drop("grp")
  }

  val all: Seq[Q] = Seq(

    // ---------------------------------------------------------------- q66
    // SCD type-2 dimension history: per user, the last event_type of each
    // day is the day's "status"; consecutive equal-status days collapse into
    // validity ranges (gaps-and-islands via the difference of two
    // row_numbers — pure window algebra, one shuffle on user_id).
    // The reference's DIM_SECURITY is type-1 (merge_dim_security.sql:5-14);
    // type-2 is the standard extension a warehouse needs for history.
    Q("q66_scd2_dim",
      """WITH daily AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day, upper(trim(event_type)) AS status
        |  FROM events
        |  QUALIFY row_number() OVER (PARTITION BY user_id, CAST(ts AS DATE)
        |                             ORDER BY ts DESC, event_id DESC) = 1),
        |isl AS (
        |  SELECT user_id, day, status,
        |    row_number() OVER (PARTITION BY user_id ORDER BY day)
        |    - row_number() OVER (PARTITION BY user_id, status ORDER BY day) AS grp
        |  FROM daily)
        |SELECT user_id, status, min(day) AS valid_from, max(day) AS valid_to,
        |  count(*) AS n_days
        |FROM isl GROUP BY user_id, status, grp""".stripMargin) { (s, dir) =>
      scd2Ranges(s, dir)
    },

    // ---------------------------------------------------------------- q86
    // Temporal (SCD2) join: facts land on the dimension row whose validity
    // range covers the event date — the point-in-time lookup every
    // history-keeping warehouse runs. Equi-join on the entity key carries
    // the range predicate as a join filter; per-entity range counts are
    // small (bounded by status changes), so the fanout is bounded and no
    // interval index is needed.
    Q("q86_scd2_temporal_join",
      """WITH daily AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day, upper(trim(event_type)) AS status
        |  FROM events
        |  QUALIFY row_number() OVER (PARTITION BY user_id, CAST(ts AS DATE)
        |                             ORDER BY ts DESC, event_id DESC) = 1),
        |isl AS (
        |  SELECT user_id, day, status,
        |    row_number() OVER (PARTITION BY user_id ORDER BY day)
        |    - row_number() OVER (PARTITION BY user_id, status ORDER BY day) AS grp
        |  FROM daily),
        |scd AS (
        |  SELECT user_id, status, min(day) AS valid_from, max(day) AS valid_to
        |  FROM isl GROUP BY user_id, status, grp)
        |SELECT s.status, count(*) AS n_events,
        |  round(CAST(CAST(SUM(CAST(e.value AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE), 6) AS total_value
        |FROM events e JOIN scd s
        |  ON e.user_id = s.user_id
        | AND CAST(e.ts AS DATE) BETWEEN s.valid_from AND s.valid_to
        |GROUP BY 1""".stripMargin) { (s, dir) =>
      val scd = scd2Ranges(s, dir)
        .select(col("user_id"), col("status"), col("valid_from"), col("valid_to"))
      val ev = Tables.load(s, dir, "events")
        .select(col("user_id"), to_date(col("ts")).as("day"), col("value"))
      ev.join(scd,
          ev("user_id") === scd("user_id") &&
            col("day").between(col("valid_from"), col("valid_to")))
        .groupBy(col("status"))
        .agg(count(lit(1)).as("n_events"),
          round(sum(col("value").cast(Dec18)).cast(Dec38).cast("double"), 6)
            .as("total_value"))
    },

    // ---------------------------------------------------------------- q67
    // Time-series gap fill: expand each supplier's [min_day, max_day] into a
    // dense calendar spine (sequence + explode — distributed, no driver
    // loop), left-join the observed revenue, and carry the last observation
    // forward (LOCF) with an ignore-nulls running last. Scale: the spine is
    // generated per key from two scalars, so the explode is narrow; the LOCF
    // window shuffles once on the key.
    Q("q67_gap_fill",
      """WITH daily AS (
        |  SELECT l_suppkey, CAST(l_shipdate AS DATE) AS cal_day,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS rev
        |  FROM lineitem WHERE l_suppkey % 20 = 1 GROUP BY 1, 2),
        |bounds AS (SELECT l_suppkey, min(cal_day) AS d0, max(cal_day) AS d1
        |           FROM daily GROUP BY 1),
        |spine AS (SELECT l_suppkey, CAST(gs.d AS DATE) AS cal_day
        |          FROM bounds, unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS gs(d))
        |SELECT s.l_suppkey, s.cal_day, d.rev IS NULL AS filled,
        |  round(CAST(last_value(d.rev IGNORE NULLS) OVER (
        |    PARTITION BY s.l_suppkey ORDER BY s.cal_day
        |    ROWS UNBOUNDED PRECEDING) AS DOUBLE), 6) AS revenue_locf
        |FROM spine s LEFT JOIN daily d USING (l_suppkey, cal_day)""".stripMargin) { (s, dir) =>
      val daily = dailyRevenue(s, dir)
      val spine = daily.groupBy(col("l_suppkey"))
        .agg(min(col("cal_day")).as("d0"), max(col("cal_day")).as("d1"))
        .select(col("l_suppkey"),
          explode(sequence(col("d0"), col("d1"), expr("interval 1 day"))).as("cal_day"))
      val w = Window.partitionBy(col("l_suppkey")).orderBy(col("cal_day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      spine.join(daily, Seq("l_suppkey", "cal_day"), "left")
        .select(col("l_suppkey"), col("cal_day"), col("rev").isNull.as("filled"),
          round(last(col("rev"), ignoreNulls = true).over(w).cast("double"), 6)
            .as("revenue_locf"))
    },

    // ---------------------------------------------------------------- q68
    // Unpivot / melt (the inverse of q46's pivot): the three per-line money
    // measures as (measure, amount) long format — Dataset.unpivot plans a
    // single Expand (one pass, no join), the same operator grouping sets use.
    Q("q68_unpivot",
      """SELECT l_orderkey, l_linenumber, m.measure,
        |  round(CAST(m.amount AS DOUBLE), 6) AS amount
        |FROM lineitem,
        |  LATERAL (VALUES ('extendedprice', l_extendedprice),
        |                  ('discount', l_discount),
        |                  ('tax', l_tax)) AS m(measure, amount)
        |WHERE l_shipdate >= TIMESTAMP '1995-03-01 00:00:00'
        |  AND l_shipdate <  TIMESTAMP '1995-04-01 00:00:00'""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1995-03-01 00:00:00").cast("timestamp") &&
          col("l_shipdate") < lit("1995-04-01 00:00:00").cast("timestamp"))
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_extendedprice").cast("double").as("extendedprice"),
          col("l_discount").cast("double").as("discount"),
          col("l_tax").cast("double").as("tax"))
        .unpivot(Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("extendedprice"), col("discount"), col("tax")),
          "measure", "amount")
        .withColumn("amount", round(col("amount"), 6))
    },

    // ---------------------------------------------------------------- q69
    // Cohort semi/anti joins: BUILDING-segment customers with >= 1 order in
    // 1995 (LEFT SEMI) and no lineitem returned that year (LEFT ANTI against
    // the returns subquery). Scale: both probe sides reduce to distinct
    // custkeys before joining — customer is joined against keys, not facts.
    Q("q69_semi_anti",
      """SELECT c_custkey, c_name FROM customer c
        |WHERE c_mktsegment = 'BUILDING'
        |  AND EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey
        |                AND o.o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
        |                AND o.o_orderdate <  TIMESTAMP '1996-01-01 00:00:00')
        |  AND NOT EXISTS (SELECT 1 FROM orders o JOIN lineitem l
        |                    ON l.l_orderkey = o.o_orderkey
        |                  WHERE o.o_custkey = c.c_custkey
        |                    AND l.l_returnflag = 'R'
        |                    AND l.l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
        |                    AND l.l_shipdate <  TIMESTAMP '1996-01-01 00:00:00')""".stripMargin) { (s, dir) =>
      val cust = Tables.load(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val ord = Tables.load(s, dir, "orders")
      val li = Tables.load(s, dir, "lineitem")
      val ordered95 = ord
        .filter(col("o_orderdate") >= lit("1995-01-01 00:00:00").cast("timestamp") &&
          col("o_orderdate") < lit("1996-01-01 00:00:00").cast("timestamp"))
        .select(col("o_custkey"))
      val returned = li.filter(col("l_returnflag") === "R" &&
          col("l_shipdate") >= lit("1995-01-01 00:00:00").cast("timestamp") &&
          col("l_shipdate") < lit("1996-01-01 00:00:00").cast("timestamp"))
        .select(col("l_orderkey"))
        .join(ord.select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey"))
      cust
        .join(ordered95, cust("c_custkey") === ordered95("o_custkey"), "left_semi")
        .join(returned, cust("c_custkey") === returned("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
    },

    // ---------------------------------------------------------------- q70
    // Rolling 30-day extrema + drawdown: per-supplier daily revenue, the
    // 30-day rolling max over an integer-day RANGE frame (engine-neutral),
    // and drawdown% = (rev - rollmax) / rollmax. Max over decimals is exact;
    // the division is the single double conversion.
    Q("q70_rolling_extrema",
      """WITH daily AS (
        |  SELECT l_suppkey, CAST(l_shipdate AS DATE) AS cal_day,
        |    CAST(datediff('day', DATE '1995-01-01', CAST(l_shipdate AS DATE)) AS INT) AS day_idx,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS rev
        |  FROM lineitem WHERE l_suppkey % 20 = 1 GROUP BY 1, 2, 3)
        |SELECT l_suppkey, cal_day,
        |  round(CAST(rev AS DOUBLE), 6) AS revenue,
        |  round(CAST(max(rev) OVER w AS DOUBLE), 6) AS rolling_max,
        |  round(CAST(min(rev) OVER w AS DOUBLE), 6) AS rolling_min,
        |  round((CAST(rev AS DOUBLE) - CAST(max(rev) OVER w AS DOUBLE))
        |        / CAST(max(rev) OVER w AS DOUBLE), 6) AS drawdown_pct
        |FROM daily
        |WINDOW w AS (PARTITION BY l_suppkey ORDER BY day_idx
        |             RANGE BETWEEN 29 PRECEDING AND CURRENT ROW)""".stripMargin) { (s, dir) =>
      val daily = Tables.load(s, dir, "lineitem")
        .filter(col("l_suppkey") % 20 === 1)
        .groupBy(col("l_suppkey"), to_date(col("l_shipdate")).as("cal_day"),
          datediff(to_date(col("l_shipdate")), lit("1995-01-01").cast("date")).as("day_idx"))
        .agg(sum(col("l_extendedprice").cast(Dec18)).cast(Dec18).as("rev"))
      val w = Window.partitionBy(col("l_suppkey")).orderBy(col("day_idx"))
        .rangeBetween(-29L, 0L)
      val rollMax = max(col("rev")).over(w)
      daily.select(col("l_suppkey"), col("cal_day"),
        round(col("rev").cast("double"), 6).as("revenue"),
        round(rollMax.cast("double"), 6).as("rolling_max"),
        round(min(col("rev")).over(w).cast("double"), 6).as("rolling_min"),
        round((col("rev").cast("double") - rollMax.cast("double")) / rollMax.cast("double"), 6)
          .as("drawdown_pct"))
    },

    // ---------------------------------------------------------------- q71
    // Z-score anomaly detection from exact power sums: per event_type,
    // n / Σv / Σv² accumulate in DECIMAL (one grouped pass); mean and sample
    // stddev are derived in scalar double arithmetic from those sums; rows
    // with |z| > 3 are flagged. A streaming stddev's merge order would vary
    // with partitioning — power sums don't. Scale: the per-type moment table
    // is tiny, so the re-join is a broadcast.
    Q("q71_zscore_anomaly",
      """WITH m AS (
        |  SELECT event_type, count(*) AS n,
        |    CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS s1,
        |    CAST(SUM(CAST(value AS DECIMAL(26,6)) * CAST(value AS DECIMAL(26,6))) AS DECIMAL(38,12)) AS s2
        |  FROM events GROUP BY 1),
        |z AS (
        |  SELECT e.event_id, e.event_type, e.value,
        |    (CAST(e.value AS DOUBLE) - CAST(m.s1 AS DOUBLE)/m.n)
        |      / sqrt((CAST(m.s2 AS DOUBLE) - CAST(m.s1 AS DOUBLE)*CAST(m.s1 AS DOUBLE)/m.n)
        |             / (m.n - 1)) AS zs
        |  FROM events e JOIN m USING (event_type))
        |SELECT event_id, event_type, round(value, 6) AS value,
        |  round(zs, 6) AS z_score
        |FROM z WHERE abs(zs) > 3""".stripMargin) { (s, dir) =>
      val ev = Tables.load(s, dir, "events")
      val v = col("value")
      val moments = ev.groupBy(col("event_type")).agg(
        count(lit(1)).as("n"),
        sum(v.cast(Dec18)).cast(Dec38).as("s1"),
        sum(v.cast(Dec26) * v.cast(Dec26)).cast("decimal(38,12)").as("s2"))
      val mean = col("s1").cast("double") / col("n")
      val variance = (col("s2").cast("double") - col("s1").cast("double") * col("s1").cast("double") / col("n")) /
        (col("n") - 1)
      val z = (v.cast("double") - mean) / sqrt(variance)
      ev.join(broadcast(moments), Seq("event_type"))
        .filter(abs(z) > 3)
        .select(col("event_id"), col("event_type"),
          round(v, 6).as("value"), round(z, 6).as("z_score"))
    },

    // ---------------------------------------------------------------- q72
    // Pairwise Pearson correlation of daily revenue series, from exact
    // decimal co-moment sums (n, Σx, Σy, Σxy, Σx², Σy²) — same determinism
    // argument as q71; `corr()` would be merge-order dependent. The pair join
    // is keyed on the day and bounded by the supplier sample (k series →
    // k(k-1)/2 pairs, each pair one grouped row).
    Q("q72_corr_pairs",
      """WITH daily AS (
        |  SELECT l_suppkey, CAST(l_shipdate AS DATE) AS cal_day,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS rev
        |  FROM lineitem WHERE l_suppkey % 20 = 1 GROUP BY 1, 2),
        |pairs AS (
        |  SELECT a.l_suppkey AS sk_a, b.l_suppkey AS sk_b,
        |    count(*) AS n,
        |    CAST(SUM(a.rev) AS DECIMAL(38,6)) AS sx,
        |    CAST(SUM(b.rev) AS DECIMAL(38,6)) AS sy,
        |    CAST(SUM(CAST(a.rev AS DECIMAL(26,6)) * CAST(b.rev AS DECIMAL(26,6))) AS DECIMAL(38,12)) AS sxy,
        |    CAST(SUM(CAST(a.rev AS DECIMAL(26,6)) * CAST(a.rev AS DECIMAL(26,6))) AS DECIMAL(38,12)) AS sxx,
        |    CAST(SUM(CAST(b.rev AS DECIMAL(26,6)) * CAST(b.rev AS DECIMAL(26,6))) AS DECIMAL(38,12)) AS syy
        |  FROM daily a JOIN daily b ON a.cal_day = b.cal_day AND a.l_suppkey < b.l_suppkey
        |  GROUP BY 1, 2)
        |SELECT sk_a, sk_b, CAST(n AS BIGINT) AS n,
        |  round((n*CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE))
        |   / sqrt((n*CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE))
        |        * (n*CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE))), 6) AS pearson_r
        |FROM pairs""".stripMargin) { (s, dir) =>
      val daily = dailyRevenue(s, dir)
      val a = daily.select(col("l_suppkey").as("sk_a"), col("cal_day"), col("rev").as("ra"))
      val b = daily.select(col("l_suppkey").as("sk_b"), col("cal_day"), col("rev").as("rb"))
      val ra26 = col("ra").cast(Dec26)
      val rb26 = col("rb").cast(Dec26)
      val sums = a.join(b, Seq("cal_day")).filter(col("sk_a") < col("sk_b"))
        .groupBy(col("sk_a"), col("sk_b"))
        .agg(count(lit(1)).as("n"),
          sum(col("ra")).cast(Dec38).as("sx"),
          sum(col("rb")).cast(Dec38).as("sy"),
          sum(ra26 * rb26).cast("decimal(38,12)").as("sxy"),
          sum(ra26 * ra26).cast("decimal(38,12)").as("sxx"),
          sum(rb26 * rb26).cast("decimal(38,12)").as("syy"))
      val n = col("n")
      val (sx, sy) = (col("sx").cast("double"), col("sy").cast("double"))
      val (sxy, sxx, syy) =
        (col("sxy").cast("double"), col("sxx").cast("double"), col("syy").cast("double"))
      sums.select(col("sk_a"), col("sk_b"), n.as("n"),
        round((n * sxy - sx * sy) / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
          .as("pearson_r"))
    },

    // ---------------------------------------------------------------- q94
    // Correlated-subquery semantics, decorrelated by hand: orders more than
    // 1.5× their own customer's average. The correlated form re-evaluates
    // the subquery per row; the scale form is the same groupBy + equi-join
    // Catalyst's decorrelation rewrites to — expressed directly so the
    // shuffle shape is explicit (one aggregate, one keyed join).
    Q("q94_above_customer_avg",
      """WITH avgs AS (
        |  SELECT o_custkey,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS s,
        |    count(*) AS n
        |  FROM orders GROUP BY 1)
        |SELECT o.o_orderkey, o.o_custkey,
        |  round(CAST(o.o_totalprice AS DOUBLE), 6) AS totalprice,
        |  round(CAST(a.s AS DOUBLE) / a.n, 6) AS cust_avg
        |FROM orders o JOIN avgs a ON o.o_custkey = a.o_custkey
        |WHERE CAST(o.o_totalprice AS DOUBLE) > 1.5 * (CAST(a.s AS DOUBLE) / a.n)""".stripMargin) { (s, dir) =>
      val ord = Tables.load(s, dir, "orders")
      val avgs = ord.groupBy(col("o_custkey"))
        .agg(sum(col("o_totalprice").cast(Dec18)).cast(Dec38).as("s"),
          count(lit(1)).as("n"))
      val custAvg = col("s").cast("double") / col("n")
      ord.join(avgs, Seq("o_custkey"))
        .filter(col("o_totalprice").cast("double") > lit(1.5) * custAvg)
        .select(col("o_orderkey"), col("o_custkey"),
          round(col("o_totalprice").cast("double"), 6).as("totalprice"),
          round(custAvg, 6).as("cust_avg"))
    },

    // ---------------------------------------------------------------- q95
    // Blocked fuzzy join (record linkage): candidate pairs come from an
    // EQUI-join on a blocking key (the name minus its last character), and
    // only those pairs pay the edit-distance evaluation — the same
    // block-then-verify shape as LSH (q22→q24), applied to typo-distance
    // matching. Never all-pairs: the quadratic is confined to a block.
    Q("q95_fuzzy_blocked",
      """WITH c AS (SELECT c_custkey, c_name,
        |  substring(c_name, 1, length(c_name) - 1) AS blk FROM customer)
        |SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
        |  a.c_name AS name_a, b.c_name AS name_b,
        |  levenshtein(a.c_name, b.c_name) AS dist
        |FROM c a JOIN c b ON a.blk = b.blk AND a.c_custkey < b.c_custkey
        |WHERE levenshtein(a.c_name, b.c_name) <= 1""".stripMargin) { (s, dir) =>
      val c = Tables.load(s, dir, "customer")
        .select(col("c_custkey"), col("c_name"),
          expr("substring(c_name, 1, length(c_name) - 1)").as("blk"))
      val a = c.select(col("blk"), col("c_custkey").as("id_a"), col("c_name").as("name_a"))
      val b = c.select(col("blk"), col("c_custkey").as("id_b"), col("c_name").as("name_b"))
      a.join(b, Seq("blk")).filter(col("id_a") < col("id_b"))
        // cast to long: DuckDB's levenshtein returns BIGINT, Spark's INT —
        // align the emitted type like the count-style columns do
        .withColumn("dist", levenshtein(col("name_a"), col("name_b")).cast("long"))
        .filter(col("dist") <= 1)
        .select(col("id_a"), col("id_b"), col("name_a"), col("name_b"), col("dist"))
    },

    // ---------------------------------------------------------------- q128
    // Entity resolution END-TO-END — the composition the separate stages
    // (q95 blocking, q123 scoring, q60 clustering, q44 survivorship) exist
    // for: block by name prefix, score with the native Jaro-Winkler
    // expression, keep >= 0.95 edges, cluster transitively (min-label
    // components), elect the min-key survivor per cluster. The oracle
    // replays the same pipeline with DuckDB's independent jaro-winkler and
    // a recursive-CTE reachability — two engines, two similarity
    // implementations, one cluster assignment.
    Q("q128_entity_resolution",
      """WITH RECURSIVE c AS (SELECT c_custkey, c_name,
        |  substring(c_name, 1, length(c_name) - 1) AS blk
        |  FROM customer WHERE c_custkey <= 750),
        |edges AS (SELECT a.c_custkey AS id_a, b.c_custkey AS id_b
        |  FROM c a JOIN c b ON a.blk = b.blk AND a.c_custkey < b.c_custkey
        |  WHERE round(jaro_winkler_similarity(a.c_name, b.c_name), 6) >= 0.95),
        |sym AS (SELECT id_a AS src, id_b AS dst FROM edges
        |        UNION ALL SELECT id_b, id_a FROM edges),
        |reach(id, r) AS (
        |  SELECT c_custkey, c_custkey FROM c
        |  UNION
        |  SELECT s.dst, re.r FROM reach re JOIN sym s ON s.src = re.id),
        |lbl AS (SELECT id AS c_custkey, min(r) AS cluster_id FROM reach GROUP BY 1)
        |SELECT l.cluster_id, count(*) AS n_members,
        |  arg_min(c.c_name, c.c_custkey) AS survivor_name
        |FROM lbl l JOIN c USING (c_custkey)
        |GROUP BY 1""".stripMargin) { (s, dir) =>
      val c = Tables.load(s, dir, "customer")
        .filter(col("c_custkey") <= 750)
        .select(col("c_custkey"), col("c_name"),
          expr("substring(c_name, 1, length(c_name) - 1)").as("blk"))
      val a = c.select(col("blk"), col("c_custkey").as("id_a"), col("c_name").as("name_a"))
      val b = c.select(col("blk"), col("c_custkey").as("id_b"), col("c_name").as("name_b"))
      val edges = a.join(b, Seq("blk")).filter(col("id_a") < col("id_b"))
        // round BEFORE thresholding: the two engines' scores can differ in
        // the last ulp, and an unrounded >= would let a boundary pair flip
        // an edge and diverge the whole clustering (q123's rounding lesson)
        .filter(round(graft.functions.JaroWinkler(col("name_a"), col("name_b")), 6) >= 0.95)
        .select(col("id_a"), col("id_b"))
      graft.dedup.Components.connectedComponents(c.select(col("c_custkey")), "c_custkey", edges)
        .join(c.select(col("c_custkey"), col("c_name")), Seq("c_custkey"))
        .groupBy(col("cluster_id"))
        .agg(count(lit(1)).as("n_members"),
          min_by(col("c_name"), col("c_custkey")).as("survivor_name"))
    },

    // ---------------------------------------------------------------- q127
    // Array higher-order functions (transform / filter / exists / aggregate)
    // over per-order quantity lists — the nested-data surface a
    // feature-engineering pass uses. All lambda arithmetic is integer, the
    // emitted columns are scalars, and every HOF is codegen-adjacent (no
    // UDF): Spark's HOFs against DuckDB's list_* lambda family.
    Q("q127_array_hof",
      """WITH a AS (SELECT l_orderkey,
        |  list(CAST(l_quantity AS INT)) AS qs
        |  FROM lineitem WHERE l_orderkey < 500 GROUP BY 1)
        |SELECT l_orderkey,
        |  len(qs) AS n_items,
        |  len(list_filter(qs, x -> x % 2 = 0)) AS n_even,
        |  CAST(list_sum(list_transform(qs, x -> x * 2)) AS BIGINT) AS sum_doubled,
        |  len(list_filter(qs, x -> x > 40)) > 0 AS has_gt40
        |FROM a""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .filter(col("l_orderkey") < 500)
        .groupBy(col("l_orderkey"))
        .agg(collect_list(col("l_quantity").cast("int")).as("qs"))
        .select(col("l_orderkey"),
          size(col("qs")).as("n_items"),
          size(filter(col("qs"), x => x % 2 === 0)).as("n_even"),
          aggregate(transform(col("qs"), x => x * 2),
            lit(0L), (acc, x) => acc + x).as("sum_doubled"),
          exists(col("qs"), x => x > 40).as("has_gt40"))
    },

    // ---------------------------------------------------------------- q123
    // Fuzzy matching scored by the NATIVE Jaro-Winkler expression
    // (functions/JaroWinkler.scala — codegen'd, no UDF boxing) over the q95
    // prefix blocks: the record-linkage default similarity (prefix-weighted,
    // Winkler '90) cross-validated against DuckDB's INDEPENDENT
    // implementation of the same algorithm — two codebases, one score.
    // 6-dp rounding absorbs the final-ulp difference in the double
    // arithmetic order.
    Q("q123_jaro_winkler",
      """WITH c AS (SELECT c_custkey, c_name,
        |  substring(c_name, 1, length(c_name) - 1) AS blk
        |  FROM customer WHERE c_custkey <= 750)
        |SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
        |  round(jaro_winkler_similarity(a.c_name, b.c_name), 6) AS jw
        |FROM c a JOIN c b ON a.blk = b.blk AND a.c_custkey < b.c_custkey""".stripMargin) { (s, dir) =>
      val c = Tables.load(s, dir, "customer")
        .filter(col("c_custkey") <= 750)
        .select(col("c_custkey"), col("c_name"),
          expr("substring(c_name, 1, length(c_name) - 1)").as("blk"))
      val a = c.select(col("blk"), col("c_custkey").as("id_a"), col("c_name").as("name_a"))
      val b = c.select(col("blk"), col("c_custkey").as("id_b"), col("c_name").as("name_b"))
      a.join(b, Seq("blk")).filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"),
          round(graft.functions.JaroWinkler(col("name_a"), col("name_b")), 6).as("jw"))
    },

    // ---------------------------------------------------------------- q96
    // Ordered array aggregation (nested output): each order's line numbers
    // as a SORTED array — collect_list has no cross-partition order
    // guarantee, so the deterministic form is collect + sort_array (the
    // oracle's list(x ORDER BY x)). The array is the document/feature-list
    // shape a training pipeline emits per example. The ORACLE surface
    // final-projects the array to a canonical joined STRING on both sides:
    // the harness's pandas hasher cannot factorize an ndarray column
    // (same lesson as the decimal/HUGEINT retyping — emit only hashable
    // scalars). The true-array form stays the API and is spec-tested
    // (AnalyticsSpec "q96 array form").
    Q("q96_array_agg",
      """SELECT l_orderkey,
        |  array_to_string(list(l_linenumber ORDER BY l_linenumber), ',') AS line_numbers,
        |  CAST(count(*) AS BIGINT) AS n_lines
        |FROM lineitem WHERE l_orderkey < 200 GROUP BY 1""".stripMargin) { (s, dir) =>
      arrayAggCore(s, dir)
        .withColumn("line_numbers", array_join(col("line_numbers"), ","))
    },

    // ---------------------------------------------------------------- q73
    // ROLLUP subtotals: revenue by (year, quarter) with quarter subtotals,
    // year subtotals, and the grand total in ONE Expand pass (the hierarchy
    // counterpart of q45's grouping sets).
    Q("q73_rollup",
      """SELECT CAST(year(o_orderdate) AS INT) AS yr,
        |  CAST(quarter(o_orderdate) AS INT) AS qtr,
        |  count(*) AS n_orders,
        |  round(CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE), 6) AS revenue
        |FROM orders
        |GROUP BY ROLLUP (CAST(year(o_orderdate) AS INT), CAST(quarter(o_orderdate) AS INT))""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "orders")
        .select(year(col("o_orderdate")).as("yr"), quarter(col("o_orderdate")).as("qtr"),
          col("o_totalprice"))
        .rollup(col("yr"), col("qtr"))
        .agg(count(lit(1)).as("n_orders"),
          round(sum(col("o_totalprice").cast(Dec18)).cast(Dec38).cast("double"), 6)
            .as("revenue"))
    },

    // ---------------------------------------------------------------- q101
    // CUBE: all 2^k grouping combinations over (status, priority) in one
    // Expand pass — completes the subtotal trio with q45 (grouping sets)
    // and q73 (rollup).
    Q("q101_cube",
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
        |  round(CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE), 6) AS revenue
        |FROM orders
        |GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"),
          round(sum(col("o_totalprice").cast(Dec18)).cast(Dec38).cast("double"), 6)
            .as("revenue"))
    },

    // ---------------------------------------------------------------- q74
    // Fixed-width histogram: 20 × 25k-wide bins over o_totalprice with
    // explicit literal edges (no data-dependent min/max pass), count + exact
    // decimal sum per bin. One grouped pass; bins are orderable ints.
    Q("q74_histogram",
      """SELECT LEAST(CAST(floor(CAST(o_totalprice AS DOUBLE) / 25000) AS INT), 19) AS bin,
        |  count(*) AS n_orders,
        |  round(CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE), 6) AS total_price
        |FROM orders GROUP BY 1""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "orders")
        .groupBy(least(floor(col("o_totalprice").cast("double") / 25000).cast("int"), lit(19))
          .as("bin"))
        .agg(count(lit(1)).as("n_orders"),
          round(sum(col("o_totalprice").cast(Dec18)).cast(Dec38).cast("double"), 6)
            .as("total_price"))
    },

    // ---------------------------------------------------------------- q75
    // Equal-frequency deciles of documents by length. The global rank is
    // assigned DISTRIBUTED (range repartition + zipWithIndex — the
    // SurrogateKeys machinery), never a single-partition ntile window; the
    // oracle spells the same bin arithmetic with row_number. Bin formula
    // floor((rid-1)*10/N)+1 is pinned on both sides (ntile's remainder
    // distribution differs).
    Q("q75_decile_stats",
      """WITH ranked AS (
        |  SELECT doc_id, n_chars,
        |    row_number() OVER (ORDER BY n_chars, doc_id) AS rid,
        |    count(*) OVER () AS n
        |  FROM documents)
        |SELECT CAST(floor((rid - 1) * 10 / n) AS INT) + 1 AS decile,
        |  count(*) AS n_docs,
        |  CAST(min(n_chars) AS BIGINT) AS min_chars,
        |  CAST(max(n_chars) AS BIGINT) AS max_chars,
        |  round(CAST(SUM(n_chars) AS DOUBLE) / count(*), 6) AS avg_chars
        |FROM ranked GROUP BY 1""".stripMargin) { (s, dir) =>
      val docs = Tables.load(s, dir, "documents").select(col("doc_id"), col("n_chars"))
      // corpus size as a broadcast 1-row frame (no separate driver action)
      val cnt = docs.agg(count(lit(1)).as("n"))
      SurrogateKeys.assign(docs, "rid", 0L, Seq("n_chars", "doc_id"))
        .crossJoin(broadcast(cnt))
        .groupBy((floor((col("rid") - 1) * 10 / col("n")) + 1).cast("int").as("decile"))
        .agg(count(lit(1)).as("n_docs"),
          min(col("n_chars")).as("min_chars"),
          max(col("n_chars")).as("max_chars"),
          round(sum(col("n_chars")).cast("double") / count(lit(1)), 6).as("avg_chars"))
    })
}
