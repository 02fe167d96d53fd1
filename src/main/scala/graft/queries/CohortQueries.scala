package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Behavioral / contribution analytics (round-3 widening, continued): the
  * product-analytics query family over the events stream and the order
  * history — ordered-stage funnels, first-touch retention cohorts,
  * co-occurrence (market-basket) pairs, inter-event time gaps, and
  * percent-of-total contribution. All are single-shuffle shapes: windows are
  * key-partitioned (never global), the self-joins are keyed, and the funnel
  * reduces each stage to per-user minima before the next join.
  */
object CohortQueries {

  private val Dec18 = "decimal(18,6)"
  private val Dec38 = "decimal(38,6)"

  val all: Seq[Q] = Seq(

    // ---------------------------------------------------------------- q76
    // Percent-of-total contribution: each supplier's revenue share within
    // its nation — an aggregate plus a key-partitioned window sum (no global
    // window, no second scan). Dims broadcast into the revenue aggregation.
    Q("q76_share_of_total",
      """WITH rev AS (
        |  SELECT n_name, s_suppkey,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS revenue
        |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  GROUP BY 1, 2)
        |SELECT n_name, s_suppkey,
        |  round(CAST(revenue AS DOUBLE), 6) AS revenue,
        |  round(CAST(revenue AS DOUBLE)
        |        / CAST(SUM(revenue) OVER (PARTITION BY n_name) AS DOUBLE), 6) AS nation_share
        |FROM rev""".stripMargin) { (s, dir) =>
      val rev = Tables.load(s, dir, "lineitem")
        .join(broadcast(Tables.load(s, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables.load(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"), col("s_suppkey"))
        .agg(sum(col("l_extendedprice").cast(Dec18)).cast(Dec38).as("revenue"))
      val w = Window.partitionBy(col("n_name"))
      rev.select(col("n_name"), col("s_suppkey"),
        round(col("revenue").cast("double"), 6).as("revenue"),
        round(col("revenue").cast("double") / sum(col("revenue")).over(w).cast("double"), 6)
          .as("nation_share"))
    },

    // ---------------------------------------------------------------- q77
    // Ordered-stage funnel (view → click → purchase within one day): each
    // stage is the per-user MIN timestamp of the event type strictly after
    // the previous stage's timestamp. Stages shrink monotonically, so each
    // join is against an ever-smaller per-user frame — no event-level
    // self-join ever happens.
    Q("q77_funnel",
      """WITH d AS (SELECT * FROM events
        |  WHERE ts >= TIMESTAMP '2024-01-15 00:00:00' AND ts < TIMESTAMP '2024-01-16 00:00:00'),
        |v AS (SELECT user_id, min(ts) AS t FROM d WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, min(e.ts) AS t FROM d e JOIN v ON e.user_id = v.user_id
        |      WHERE e.event_type = 'click' AND e.ts > v.t GROUP BY 1),
        |p AS (SELECT e.user_id, min(e.ts) AS t FROM d e JOIN c ON e.user_id = c.user_id
        |      WHERE e.event_type = 'purchase' AND e.ts > c.t GROUP BY 1)
        |SELECT 1 AS stage, 'view' AS name, count(*) AS n_users FROM v
        |UNION ALL SELECT 2, 'view>click', count(*) FROM c
        |UNION ALL SELECT 3, 'view>click>purchase', count(*) FROM p""".stripMargin) { (s, dir) =>
      val d = Tables.load(s, dir, "events")
        .filter(col("ts") >= lit("2024-01-15 00:00:00").cast("timestamp") &&
          col("ts") < lit("2024-01-16 00:00:00").cast("timestamp"))
      def stageAfter(prev: org.apache.spark.sql.DataFrame, eventType: String) =
        d.filter(col("event_type") === eventType)
          .join(prev.select(col("user_id"), col("t").as("prev_t")), Seq("user_id"))
          .filter(col("ts") > col("prev_t"))
          .groupBy(col("user_id")).agg(min(col("ts")).as("t"))
      val v = d.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts")).as("t"))
      val c = stageAfter(v, "click")
      val p = stageAfter(c, "purchase")
      def cnt(df: org.apache.spark.sql.DataFrame, stage: Int, name: String) =
        df.agg(count(lit(1)).as("n_users"))
          .select(lit(stage).as("stage"), lit(name).as("name"), col("n_users"))
      cnt(v, 1, "view").unionByName(cnt(c, 2, "view>click"))
        .unionByName(cnt(p, 3, "view>click>purchase"))
    },

    // ---------------------------------------------------------------- q78
    // First-touch retention: cohort = each user's first active day; cells
    // count users active at each day offset from their cohort. Activity
    // reduces to distinct (user, day) before any join, and the cohort frame
    // is one row per user.
    Q("q78_retention",
      """WITH act AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |coh AS (SELECT user_id, min(day) AS cohort_day FROM act GROUP BY 1)
        |SELECT c.cohort_day, datediff('day', c.cohort_day, a.day) AS day_offset,
        |  count(*) AS n_users
        |FROM act a JOIN coh c ON a.user_id = c.user_id
        |GROUP BY 1, 2""".stripMargin) { (s, dir) =>
      val act = Tables.load(s, dir, "events")
        .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      val coh = act.groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
      act.join(coh, Seq("user_id"))
        .groupBy(col("cohort_day"), datediff(col("day"), col("cohort_day")).as("day_offset"))
        .agg(count(lit(1)).as("n_users"))
    },

    // ---------------------------------------------------------------- q79
    // Co-occurrence (market basket): part pairs ordered together in >= 2
    // orders. The self-join is keyed on the order — pair fanout is bounded
    // by per-order line count (quadratic in ~7, not in the table), and the
    // canonical a < b ordering halves it. The distinct-per-order projection
    // runs before the join so duplicate lines never multiply.
    Q("q79_cooccurrence",
      """SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, count(*) AS n_orders
        |FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) a
        |JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) b
        |  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |GROUP BY 1, 2 HAVING count(*) >= 2""".stripMargin) { (s, dir) =>
      val op = Tables.load(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey")).distinct()
      val a = op.select(col("l_orderkey"), col("l_partkey").as("part_a"))
      val b = op.select(col("l_orderkey"), col("l_partkey").as("part_b"))
      a.join(b, Seq("l_orderkey")).filter(col("part_a") < col("part_b"))
        .groupBy(col("part_a"), col("part_b"))
        .agg(count(lit(1)).as("n_orders"))
        .filter(col("n_orders") >= 2)
    },

    // ---------------------------------------------------------------- q80
    // Inter-order gaps: days between consecutive orders per customer (lag
    // over a key-partitioned window, deterministic orderkey tiebreaker),
    // summarized for repeat customers (>= 2 gaps). Exact integer day
    // arithmetic; the average is the single double division.
    Q("q80_interorder_gaps",
      """WITH g AS (
        |  SELECT o_custkey,
        |    datediff('day',
        |      lag(o_orderdate) OVER (PARTITION BY o_custkey
        |                             ORDER BY o_orderdate, o_orderkey),
        |      o_orderdate) AS gap
        |  FROM orders)
        |SELECT o_custkey, count(*) AS n_gaps,
        |  CAST(min(gap) AS BIGINT) AS min_gap, CAST(max(gap) AS BIGINT) AS max_gap,
        |  round(CAST(SUM(gap) AS DOUBLE) / count(*), 6) AS avg_gap
        |FROM g WHERE gap IS NOT NULL
        |GROUP BY 1 HAVING count(*) >= 2""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      Tables.load(s, dir, "orders")
        .withColumn("gap", datediff(col("o_orderdate"), lag(col("o_orderdate"), 1).over(w)))
        .filter(col("gap").isNotNull)
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_gaps"),
          min(col("gap")).cast("long").as("min_gap"),
          max(col("gap")).cast("long").as("max_gap"),
          round(sum(col("gap")).cast("double") / count(lit(1)), 6).as("avg_gap"))
        .filter(col("n_gaps") >= 2)
    },

    // ---------------------------------------------------------------- q87
    // Rolling 7-day active users (the WAU curve): an exact distinct count
    // over a sliding window is not window-mergeable, so the scale-correct
    // shape is a BOUNDED explode — each (user, active day) contributes to
    // exactly 7 observation days (fanout = window length, not data volume),
    // then one distinct count per day. State never exceeds
    // |distinct user-days| × 7.
    Q("q87_rolling_active",
      """WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |contrib AS (SELECT user_id, day + CAST(o.off AS INT) AS obs_day
        |            FROM ud, range(7) o(off)),
        |days AS (SELECT DISTINCT day FROM ud)
        |SELECT d.day, count(DISTINCT c.user_id) AS active_7d
        |FROM days d JOIN contrib c ON c.obs_day = d.day
        |GROUP BY 1""".stripMargin) { (s, dir) =>
      val ud = Tables.load(s, dir, "events")
        .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      val contrib = ud
        .select(col("user_id"), col("day"), explode(sequence(lit(0), lit(6))).as("off"))
        .select(col("user_id"), date_add(col("day"), col("off")).as("obs_day"))
      val days = ud.select(col("day")).distinct()
      days.join(contrib, col("obs_day") === col("day"))
        .groupBy(col("day"))
        .agg(countDistinct(col("user_id")).as("active_7d"))
    })
}
