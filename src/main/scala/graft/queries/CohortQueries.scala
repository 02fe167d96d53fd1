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
    },

    // ---------------------------------------------------------------- q98
    // Peak concurrency (sweep line): sessions become +1/-1 boundary deltas,
    // pre-aggregated per timestamp (total order), then a DISTRIBUTED prefix
    // sum reconstructs the concurrency curve — sum() OVER (ORDER BY t) with
    // no partition key would drag the whole curve through one task; the
    // two-phase scan (range partition + local sums + offset array) never
    // does. The oracle runs the sequential window form of the same algebra.
    Q("q98_peak_concurrency",
      """WITH e AS (SELECT user_id, epoch_us(ts) AS us FROM events),
        |m AS (SELECT user_id, us,
        |  CASE WHEN lag(us) OVER w IS NULL OR us - lag(us) OVER w > 1800000000
        |       THEN 1 ELSE 0 END AS s
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us)),
        |sess AS (SELECT user_id, us,
        |  CAST(SUM(s) OVER (PARTITION BY user_id ORDER BY us
        |                    ROWS UNBOUNDED PRECEDING) AS INT) AS sid
        |  FROM m),
        |iv AS (SELECT user_id, sid, min(us) AS s, max(us) AS e FROM sess GROUP BY 1, 2),
        |deltas AS (
        |  SELECT s AS t, CAST(1 AS BIGINT) AS d FROM iv
        |  UNION ALL SELECT e + 1, -1 FROM iv),
        |agg AS (SELECT t, CAST(SUM(d) AS BIGINT) AS delta FROM deltas GROUP BY t)
        |SELECT t, delta,
        |  CAST(SUM(delta) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS BIGINT)
        |    AS concurrency
        |FROM agg""".stripMargin) { (s, dir) =>
      val iv = graft.streaming.Sessionize.batchSummary(
          Tables.load(s, dir, "events"), "user_id", "ts", gapMinutes = 30)
        .select(col("start_us"), col("end_us"))
      val deltas = iv.select(col("start_us").as("t"), lit(1L).as("d"))
        .unionByName(iv.select((col("end_us") + 1).as("t"), lit(-1L).as("d")))
        .groupBy(col("t")).agg(sum(col("d")).as("delta"))
      graft.ops.PrefixSum.runningSum(deltas, Seq("t"), "delta", "concurrency")
    },

    // ---------------------------------------------------------------- q99
    // Triangle counting on the co-occurrence graph (the clustering-density
    // statistic of a similarity graph): canonical a<b edges, wedges from an
    // edge-edge join on the shared middle vertex, closed by a third edge
    // lookup. Every join is keyed on a vertex; no all-pairs stage — the
    // standard distributed triangle enumeration, with the canonical
    // ordering (a<b<c) counting each triangle exactly once.
    Q("q99_triangles",
      """WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |e AS (SELECT a.l_partkey AS pa, b.l_partkey AS pb
        |      FROM op a JOIN op b
        |        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |      GROUP BY 1, 2 HAVING count(*) >= 2)
        |SELECT count(*) AS n_triangles,
        |  (SELECT count(*) FROM e) AS n_edges
        |FROM e e1 JOIN e e2 ON e1.pb = e2.pa
        |JOIN e e3 ON e3.pa = e1.pa AND e3.pb = e2.pb""".stripMargin) { (s, dir) =>
      val op = Tables.load(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey")).distinct()
      val edges = op.select(col("l_orderkey"), col("l_partkey").as("pa"))
        .join(op.select(col("l_orderkey"), col("l_partkey").as("pb")), Seq("l_orderkey"))
        .filter(col("pa") < col("pb"))
        .groupBy(col("pa"), col("pb")).agg(count(lit(1)).as("w"))
        .filter(col("w") >= 2)
        .select(col("pa"), col("pb"))
        .localCheckpoint() // three join consumers; compute the edge list once
      val e1 = edges.select(col("pa").as("a"), col("pb").as("b"))
      val e2 = edges.select(col("pa").as("b"), col("pb").as("c"))
      val e3 = edges.select(col("pa").as("a"), col("pb").as("c"))
      val tri = e1.join(e2, Seq("b")).join(e3, Seq("a", "c"))
        .agg(count(lit(1)).as("n_triangles"))
      tri.crossJoin(edges.agg(count(lit(1)).as("n_edges")))
    },

    // ---------------------------------------------------------------- q100
    // Hierarchical percent-of-parent: supplier share within nation AND
    // nation share within region from ONE revenue aggregate — two
    // key-partitioned window sums over nested keys (never a global window),
    // the drill-down contribution view every BI hierarchy renders.
    Q("q100_percent_of_parent",
      """WITH rev AS (
        |  SELECT r_name, n_name, s_suppkey,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS revenue
        |  FROM lineitem
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  GROUP BY 1, 2, 3)
        |SELECT r_name, n_name, s_suppkey,
        |  round(CAST(revenue AS DOUBLE), 6) AS revenue,
        |  round(CAST(revenue AS DOUBLE)
        |        / CAST(SUM(revenue) OVER (PARTITION BY r_name, n_name) AS DOUBLE), 6)
        |    AS share_in_nation,
        |  round(CAST(SUM(revenue) OVER (PARTITION BY r_name, n_name) AS DOUBLE)
        |        / CAST(SUM(revenue) OVER (PARTITION BY r_name) AS DOUBLE), 6)
        |    AS nation_share_in_region
        |FROM rev""".stripMargin) { (s, dir) =>
      val rev = Tables.load(s, dir, "lineitem")
        .join(broadcast(Tables.load(s, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables.load(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.load(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"), col("s_suppkey"))
        .agg(sum(col("l_extendedprice").cast(Dec18)).cast(Dec38).as("revenue"))
      val byNation = Window.partitionBy(col("r_name"), col("n_name"))
      val byRegion = Window.partitionBy(col("r_name"))
      rev.select(col("r_name"), col("n_name"), col("s_suppkey"),
        round(col("revenue").cast("double"), 6).as("revenue"),
        round(col("revenue").cast("double") /
          sum(col("revenue")).over(byNation).cast("double"), 6).as("share_in_nation"),
        round(sum(col("revenue")).over(byNation).cast("double") /
          sum(col("revenue")).over(byRegion).cast("double"), 6).as("nation_share_in_region"))
    },

    // ---------------------------------------------------------------- q125
    // Event-transition bigrams (the Markov-chain substrate of behavioral
    // modeling): per user, consecutive event-type pairs in time order,
    // counted corpus-wide. One key-partitioned lag window + one aggregate;
    // ties broken by event_id so the sequence is total-ordered on both
    // engines.
    Q("q125_event_bigrams",
      """WITH s AS (SELECT user_id, upper(trim(event_type)) AS et,
        |  lag(upper(trim(event_type))) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id) AS prev_et
        |  FROM events)
        |SELECT prev_et, et, count(*) AS n_transitions
        |FROM s WHERE prev_et IS NOT NULL
        |GROUP BY 1, 2""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables.load(s, dir, "events")
        .select(col("user_id"), upper(trim(col("event_type"))).as("et"),
          col("ts"), col("event_id"))
        .withColumn("prev_et", lag(col("et"), 1).over(w))
        .filter(col("prev_et").isNotNull)
        .groupBy(col("prev_et"), col("et"))
        .agg(count(lit(1)).as("n_transitions"))
    },

    // ---------------------------------------------------------------- q126
    // Spark's NATIVE session_window operator (the engine's own gap-session
    // aggregation — one hash aggregate with session merging, usable
    // identically in batch and streaming): sessions per user at a 30-minute
    // gap, proven value-equal to the windowed gaps-and-islands formulation
    // (q42) — session end = last event + gap by definition, so end_us
    // subtracts the gap to align with the island's max timestamp.
    Q("q126_session_window",
      """WITH e AS (SELECT user_id, epoch_us(ts) AS us FROM events),
        |m AS (SELECT user_id, us,
        |  CASE WHEN lag(us) OVER w IS NULL OR us - lag(us) OVER w > 1800000000
        |       THEN 1 ELSE 0 END AS s
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us)),
        |sess AS (SELECT user_id, us,
        |  CAST(SUM(s) OVER (PARTITION BY user_id ORDER BY us
        |                    ROWS UNBOUNDED PRECEDING) AS INT) AS session_id
        |  FROM m)
        |SELECT user_id, count(*) AS n_events,
        |  min(us) AS start_us, max(us) AS last_event_us
        |FROM sess GROUP BY user_id, session_id""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "events")
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"), col("n_events"),
          unix_micros(col("session_window.start")).as("start_us"),
          (unix_micros(col("session_window.end")) - lit(1800000000L))
            .as("last_event_us"))
    },

    // ---------------------------------------------------------------- q115
    // PageRank (3 unrolled iterations, damping 0.85) over the symmetric
    // supplier↔part graph, in FIXED-POINT integer arithmetic: ranks are
    // BIGINT multiples of 10^-12 and every step is integer div/mul/sum —
    // exact, merge-order independent, identical on any engine (the
    // MapReduce-era fixed-point formulation). A floating-point PageRank sums
    // doubles per node, whose value depends on partitioning. Scale shape:
    // one dst-keyed shuffle per iteration over the (bounded) edge list —
    // exactly the Components loop's cost model; the degree table rides along
    // broadcast.
    Q("q115_pagerank",
      """WITH le AS (SELECT DISTINCT l_suppkey AS s, l_partkey AS p
        |            FROM lineitem WHERE l_orderkey < 2000),
        |edges AS (SELECT s AS src, 1000000 + p AS dst FROM le
        |          UNION ALL SELECT 1000000 + p, s FROM le),
        |nodes AS (SELECT DISTINCT src AS id FROM edges),
        |deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY 1),
        |nn AS (SELECT count(*) AS n FROM nodes),
        |r0 AS (SELECT id, 1000000000000 // n AS r FROM nodes CROSS JOIN nn),
        |c1 AS (SELECT e.dst AS id, CAST(sum(r0.r // d.outdeg) AS BIGINT) AS s
        |       FROM edges e JOIN r0 ON r0.id = e.src JOIN deg d ON d.src = e.src GROUP BY 1),
        |r1 AS (SELECT c1.id, (150000000000 // n) + (85 * c1.s) // 100 AS r
        |       FROM c1 CROSS JOIN nn),
        |c2 AS (SELECT e.dst AS id, CAST(sum(r1.r // d.outdeg) AS BIGINT) AS s
        |       FROM edges e JOIN r1 ON r1.id = e.src JOIN deg d ON d.src = e.src GROUP BY 1),
        |r2 AS (SELECT c2.id, (150000000000 // n) + (85 * c2.s) // 100 AS r
        |       FROM c2 CROSS JOIN nn),
        |c3 AS (SELECT e.dst AS id, CAST(sum(r2.r // d.outdeg) AS BIGINT) AS s
        |       FROM edges e JOIN r2 ON r2.id = e.src JOIN deg d ON d.src = e.src GROUP BY 1),
        |r3 AS (SELECT c3.id, (150000000000 // n) + (85 * c3.s) // 100 AS r
        |       FROM c3 CROSS JOIN nn)
        |SELECT id, CAST(r AS BIGINT) AS rank_fp,
        |  round(CAST(r AS DOUBLE) / 1000000000000.0, 6) AS rank
        |FROM r3""".stripMargin) { (s, dir) =>
      val le = Tables.load(s, dir, "lineitem")
        .filter(col("l_orderkey") < 2000)
        .select(col("l_suppkey").as("s"), col("l_partkey").as("p")).distinct()
      val edges = le.select(col("s").as("src"), (lit(1000000) + col("p")).as("dst"))
        .unionByName(le.select((lit(1000000) + col("p")).as("src"), col("s").as("dst")))
        .localCheckpoint() // 3 iterations + degree read it; don't re-derive
      val nodes = edges.select(col("src").as("id")).distinct()
      val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
      val nn = nodes.agg(count(lit(1)).as("n"))
      val scale = 1000000000000L
      var r = nodes.crossJoin(broadcast(nn))
        .select(col("id"), expr(s"$scale div n").as("r"))
      for (_ <- 1 to 3) {
        val c = edges
          .join(r.withColumnRenamed("id", "src"), Seq("src"))
          .join(broadcast(deg), Seq("src"))
          .groupBy(col("dst").as("id"))
          .agg(sum(expr("r div outdeg")).cast("long").as("s"))
        // symmetric edges: every node has in-edges, so c covers all nodes
        r = c.crossJoin(broadcast(nn))
          .select(col("id"), (expr(s"${150L * 1000000000L} div n") +
            expr("(85 * s) div 100")).as("r"))
      }
      r.select(col("id"), col("r").cast("long").as("rank_fp"),
        round(col("r").cast("double") / lit(1.0e12), 6).as("rank"))
    })
}
