package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.{AsOfJoin, Dedup, RangeJoin, Skew}

/** Join operators beyond Spark's built-ins: as-of, range, and salted-skew —
  * each expressed compose-first (one bounded shuffle, no nested loops).
  */
object JoinQueries {

  val all: Seq[Q] = Seq(

    // ---------------------------------------------------------------- q35
    // As-of join: for each purchase, the most recent prior (or simultaneous)
    // view by the same user. DuckDB's native ASOF JOIN is the oracle; the
    // Spark side is the union+window composition (one shuffle on user_id).
    Q("q35_asof_join",
      """WITH v AS (
        |  SELECT user_id, ts, event_id, value FROM events WHERE event_type = 'view'
        |  QUALIFY row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) = 1),
        |p AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase')
        |SELECT p.event_id, p.user_id,
        |  v.event_id AS view_event_id, v.value AS view_value
        |FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts >= v.ts""".stripMargin) { (s, dir) =>
      val ev = Tables.load(s, dir, "events")
      val views = Dedup.latestBy( // unique per (user, ts): determinism contract
        ev.filter(col("event_type") === "view")
          .select(col("user_id"), col("ts"), col("event_id"), col("value")),
        Seq(col("user_id"), col("ts")), Seq(col("event_id")))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id"))
      AsOfJoin.backward(purchases, views, Seq("user_id"), "ts", "ts",
          Seq("event_id" -> "view_event_id", "value" -> "view_value"))
        .select(col("event_id"), col("user_id"), col("view_event_id"), col("view_value"))
    },

    // ---------------------------------------------------------------- q36
    // Range join, bucketized: clicks within the 10 minutes preceding each
    // error, same user. Equi-join on (user, time-bucket) + exact predicate —
    // never a nested loop.
    Q("q36_range_join",
      """SELECT l.event_id, count(*) AS n_recent_clicks
        |FROM (SELECT user_id, ts, event_id FROM events WHERE event_type = 'error') l
        |JOIN (SELECT user_id, ts FROM events WHERE event_type = 'click') r
        |  ON l.user_id = r.user_id
        | AND epoch_us(r.ts) >= epoch_us(l.ts) - 600000000
        | AND epoch_us(r.ts) <= epoch_us(l.ts)
        |GROUP BY l.event_id""".stripMargin) { (s, dir) =>
      val ev = Tables.load(s, dir, "events")
      val errors = ev.filter(col("event_type") === "error")
        .select(col("user_id"), col("ts"), col("event_id"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts").as("click_ts"))
      RangeJoin.timeWindow(errors, clicks, Seq("user_id"), "ts", "click_ts",
          lowerUs = -600000000L, upperUs = 0L)
        .groupBy(col("event_id"))
        .agg(count(lit(1)).as("n_recent_clicks"))
    },

    // ---------------------------------------------------------------- q41
    // Custom whole-operator (LogicalPlan + SparkStrategy + SparkPlan):
    // bounded-heap top-k per group — O(n log k) / fixed memory vs the window
    // form's full per-group sort. Oracle = the QUALIFY row_number form.
    Q("q41_topk_per_group",
      """SELECT o_orderpriority, o_orderkey, o_custkey, o_totalprice, rank FROM (
        |  SELECT o_orderpriority, o_orderkey, o_custkey, o_totalprice,
        |    CAST(row_number() OVER (PARTITION BY o_orderpriority
        |      ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rank
        |  FROM orders)
        |WHERE rank <= 3""".stripMargin) { (s, dir) =>
      graft.plans.TopK.perGroup(
        Tables.load(s, dir, "orders")
          .select(col("o_orderpriority"), col("o_orderkey"), col("o_custkey"),
            col("o_totalprice")),
        groupCols = Seq("o_orderpriority"),
        orderCols = Seq("o_totalprice" -> true, "o_orderkey" -> false),
        k = 3)
    },

    // ---------------------------------------------------------------- q37
    // Salted skew join: lineitem ⋈ orders with the big side salted 8 ways —
    // result identical to the plain join (the oracle), hot keys spread over
    // 8 tasks.
    Q("q37_salted_join",
      """SELECT o_orderpriority,
        |  round(CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE), 6) AS revenue,
        |  count(*) AS n_rows
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority""".stripMargin) { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
      val o = Tables.load(s, dir, "orders")
        .withColumnRenamed("o_orderkey", "l_orderkey")
      Skew.saltedJoin(li, o, Seq("l_orderkey"), n = 8)
        .groupBy(col("o_orderpriority"))
        .agg(round(sum(col("l_extendedprice").cast("decimal(18,6)"))
            .cast("decimal(38,6)").cast("double"), 6).as("revenue"),
          count(lit(1)).as("n_rows"))
    },

    // ---------------------------------------------------------------- q59
    // Bucketed layout: both sides stored bucketed+sorted on the join key, so
    // the sort-merge join reads matching buckets directly — ZERO exchanges
    // below the join. This is the 100 TB co-located-join story (CORE/FACT
    // bucketed on their merge keys); the query fn ASSERTS the exchange-free
    // plan at runtime, so a layout regression turns this entry red.
    Q("q59_bucketed_join",
      """SELECT o_orderpriority,
        |  round(CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE), 6) AS revenue,
        |  count(*) AS n_rows
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority""".stripMargin) { (s, dir) =>
      val tag = java.security.MessageDigest.getInstance("MD5")
        .digest(dir.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8)
      val base = s"${sys.props("java.io.tmpdir")}/graft_q/q59_$tag"
      val liT = s"graft_li_bkt_$tag"
      val oT = s"graft_o_bkt_$tag"
      graft.ops.Layout.writeBucketed(
        Tables.load(s, dir, "lineitem").select(col("l_orderkey"), col("l_extendedprice")),
        liT, 8, Seq("l_orderkey"), Some(s"$base/li"))
      graft.ops.Layout.writeBucketed(
        Tables.load(s, dir, "orders")
          .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority")),
        oT, 8, Seq("l_orderkey"), Some(s"$base/o"))
      val joined = s.table(liT).hint("merge").join(s.table(oT).hint("merge"), Seq("l_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      require(plan.contains("SortMergeJoin") && !plan.contains("Exchange hashpartitioning"),
        s"bucketed join must be an exchange-free sort-merge join:\n${plan.take(1500)}")
      joined.groupBy(col("o_orderpriority"))
        .agg(round(sum(col("l_extendedprice").cast("decimal(18,6)"))
            .cast("decimal(38,6)").cast("double"), 6).as("revenue"),
          count(lit(1)).as("n_rows"))
    },

    // ---------------------------------------------------------------- q140
    // Bloom-filter runtime join pruning (Spark's InjectRuntimeFilter /
    // Trino dynamic-filter pattern, built from this engine's own pieces):
    // the BUILDING customer keys aggregate into a bit set (one
    // combiner-friendly pass, fixed state), and the codegen'd membership
    // probe drops non-joining orders INSIDE their scan stage — before the
    // join exchange, which is where the 100 TB win lives (the dropped rows
    // never shuffle). Bloom false positives are removed by the exact join
    // that follows, so the result is exact for any filter quality; a false
    // negative is impossible by construction, and WOULD turn the oracle row
    // red (the result would miss rows). The join is forced to shuffle
    // (merge hint) because that is the shape runtime filters exist for —
    // a broadcastable build side wouldn't need one. Contract required
    // in-query: the probe passes at most 35 % of orders (~1/5 segment
    // share + ~1 % false-positive rate).
    Q("q140_bloom_join_pruning",
      """SELECT o_orderpriority, count(*) AS n_orders,
        |  CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY 1""".stripMargin) { (s, dir) =>
      import graft.functions.{Bloom, BloomBuild}
      import s.implicits._
      val k = 5
      val cust = Tables.load(s, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey").cast("long").as("c_custkey"))
      val nBuild = cust.count()
      val bits: Array[Long] = cust
        .select(xxhash64(col("c_custkey")).as("h")).as[Long]
        .select(new graft.functions.BloomBuild(Bloom.sizeBits(nBuild), k).toColumn)
        .head()
      val orders = Tables.load(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"),
          col("o_custkey").cast("long").as("o_custkey"))
      val pass = orders.filter(
        Bloom.mightContainCol(xxhash64(col("o_custkey")), bits, k))
      val (nPass, nTotal) = (pass.count(), orders.count())
      require(nPass * 100 <= nTotal * 35,
        s"q140: bloom must prune the probe side: passed $nPass of $nTotal")
      pass.hint("merge").join(cust, pass("o_custkey") === cust("c_custkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_orderkey")).cast("bigint").as("key_sum"))
    },

    // ---------------------------------------------------------------- q180
    // Cost-based join planning from catalog statistics: the SAME filtered
    // dim join plans a shuffle (sort-merge) when the planner only has raw
    // file sizes, and a broadcast when ANALYZE TABLE column statistics let
    // the CBO see through the filter. Without column stats the filtered
    // dim's size estimate is its full on-disk footprint — above any
    // threshold sized between the two — so the planner must shuffle both
    // sides; with ndv/min/max stats, FilterEstimation shrinks the estimate
    // ~25x (one nation of 25) and the dim broadcasts. At 100 TB this is
    // the difference between shipping a full fact-table shuffle and
    // shipping kilobytes — the reason production tables carry ANALYZE
    // stats. Both plans are asserted in-query; the returned rows come from
    // the stats-driven broadcast plan and the oracle replays the join.
    Q("q180_cbo_stats_broadcast",
      """SELECT o_orderpriority, count(*) AS n_orders,
        |  CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE c_nationkey = 7
        |GROUP BY 1""".stripMargin) { (s, dir) =>
      val tag = java.util.UUID.randomUUID().toString.replace("-", "").take(8)
      val (tStats, tRaw) = (s"cust_stats_$tag", s"cust_raw_$tag")
      val cust = Tables.load(s, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey"))
      cust.write.format("parquet").saveAsTable(tStats)
      cust.write.format("parquet").saveAsTable(tRaw)
      // the planner's own pre-ANALYZE estimate (file bytes) — the number the
      // broadcast decision would use without statistics
      val fullBytes = s.table(tRaw).queryExecution.optimizedPlan.stats
        .sizeInBytes.toLong
      s.sql(s"ANALYZE TABLE $tStats COMPUTE STATISTICS FOR COLUMNS c_nationkey, c_custkey")
      val orders = Tables.load(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"), col("o_custkey"))
      val confs = Seq("spark.sql.cbo.enabled" -> "true",
        // threshold between the filtered CBO estimate (~1/25 of the dim)
        // and the raw full-size estimate: the stats are the ONLY thing
        // that can flip the strategy
        "spark.sql.autoBroadcastJoinThreshold" -> math.max(1L, fullBytes / 3).toString)
      val saved = confs.map { case (k, _) => k -> s.conf.get(k) }
      try {
        confs.foreach { case (k, v) => s.conf.set(k, v) }
        def planOf(t: String) = orders
          .join(s.table(t).filter(col("c_nationkey") === 7),
            col("o_custkey") === col("c_custkey"))
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n_orders"),
            sum(col("o_orderkey")).cast("bigint").as("key_sum"))
        val rawPlan = planOf(tRaw).queryExecution.executedPlan.toString
        require(rawPlan.contains("SortMergeJoin") && !rawPlan.contains("BroadcastHashJoin"),
          s"q180: without column stats the filtered dim must NOT broadcast")
        val statsDf = planOf(tStats)
        val statsPlan = statsDf.queryExecution.executedPlan.toString
        require(statsPlan.contains("BroadcastHashJoin"),
          s"q180: ANALYZE column stats must flip the join to broadcast")
        statsDf.localCheckpoint()
      } finally {
        saved.foreach { case (k, v) => s.conf.set(k, v) }
        s.sql(s"DROP TABLE IF EXISTS $tStats")
        s.sql(s"DROP TABLE IF EXISTS $tRaw")
      }
    },

    // ---------------------------------------------------------------- q191
    // AQE skew-join split ON the scoreboard (it was plan-audited in spec):
    // ~60 % of lineitem lands on one join key, the exact shape that makes
    // one sort-merge task run as long as the whole stage. With aggressive
    // skew thresholds, AQE measures the actual partition sizes at the
    // exchange and splits the hot partition into parallel sub-joins — the
    // executed plan must carry `skew=true`, and the result must equal the
    // un-split join bit-for-bit (the oracle recomputes it from the same key
    // arithmetic). This is the runtime answer to skew that q37's manual
    // salting provides statically; at 100 TB you want BOTH: salt what you
    // can predict, let AQE catch what you cannot.
    Q("q191_aqe_skew_split",
      """WITH ids AS (SELECT row_number() OVER () - 1 AS i FROM lineitem),
        |f AS (SELECT CASE WHEN i % 10 = 0 THEN i % 97 ELSE 0 END AS k,
        |             CAST(i AS BIGINT) AS v FROM ids),
        |d AS (SELECT CAST(i AS BIGINT) AS k, CAST(i * 7 AS BIGINT) AS weight
        |      FROM range(97) t(i))
        |SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(SUM(v) AS BIGINT) AS v_sum,
        |  CAST(SUM(weight) AS BIGINT) AS weight_sum
        |FROM f JOIN d USING (k)""".stripMargin) { (s, dir) =>
      // the fact is a dense id domain SIZED BY lineitem (the oracle
      // synthesizes the same ids with row_number — only the value SET
      // matters downstream), with ~90 % of rows on one hot key. A
      // parquet-backed fact was the first draft and taught two lessons the
      // hard way: (1) AQE can only split a skewed partition at MAPPER
      // boundaries, so a single-file scan (one map task) is unsplittable;
      // (2) AQE measures COMPRESSED partition bytes, and a hot partition of
      // constant-key + file-clustered values lz4-compresses under the skew
      // factor, silently disarming the rule. The range source sidesteps
      // both while measuring exactly the operator under test.
      val n = Tables.load(s, dir, "lineitem").count()
      val fact = s.range(0, n).select(
        when(col("id") % 10 === 0, col("id") % 97).otherwise(lit(0L)).as("k"),
        col("id").as("v"))
      val dim = s.range(0, 97).select(col("id").as("k"), (col("id") * 7).as("weight"))
      // thresholds sized FROM the data so the hot partition splits ~8 ways
      // at every SF; the production defaults (256 MB / 5x median) express
      // the same rule at warehouse scale
      val hotBytes = math.max(8192L, n * 9 / 10 * 16)
      val advisory = math.max(1024L, hotBytes / 8)
      val confs = Seq(
        "spark.sql.adaptive.skewJoin.enabled" -> "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> advisory.toString,
        "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> advisory.toString,
        "spark.sql.autoBroadcastJoinThreshold" -> "-1")
      // getOption, not get(k, ""): the typed getter validates the DEFAULT
      // against the entry type and throws on '' for boolean confs
      val saved = confs.map { case (k, _) => k -> s.conf.getOption(k) }
      try {
        confs.foreach { case (k, v) => s.conf.set(k, v) }
        val j = fact.join(dim, Seq("k"))
          .agg(count(lit(1)).cast("bigint").as("n_rows"),
            sum(col("v")).cast("bigint").as("v_sum"),
            sum(col("weight")).cast("bigint").as("weight_sum"))
        j.collect() // materialize: AQE finalizes the adaptive plan
        // the plan must be read from THIS frame — a localCheckpoint first
        // would swap the lineage for a LogicalRDD scan and hide the join
        require(j.queryExecution.executedPlan.toString.contains("skew=true"),
          "q191: AQE must split the hot partition (skew=true in the plan)")
        j.localCheckpoint()
      } finally saved.foreach { case (k, v) =>
        v.fold(s.conf.unset(k))(x => s.conf.set(k, x)) }
    },

    // ---------------------------------------------------------------- q192
    // AQE partition coalescing ON the scoreboard: a 5-group aggregate
    // shuffled across the session's 32 partitions would leave ~27 empty
    // tasks — pure scheduling overhead, and at 1000-executor scale pure
    // waste. AQE reads the map-output sizes and coalesces the post-shuffle
    // partitions to what the bytes justify; the entry requires the
    // materialized result to occupy at most a quarter of the static
    // partition count. The oracle replays the aggregate.
    Q("q192_aqe_coalesce",
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
        |FROM orders GROUP BY 1""".stripMargin) { (s, dir) =>
      val agg = Tables.load(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).cast("bigint").as("n_orders"),
          sum(col("o_orderkey")).cast("bigint").as("key_sum"))
      val static = s.conf.get("spark.sql.shuffle.partitions").toInt
      val materialized = agg.localCheckpoint() // AQE decides the layout here
      val actual = materialized.rdd.getNumPartitions
      require(actual * 4 <= static,
        s"q192: AQE must coalesce the post-shuffle layout: $actual of $static partitions")
      materialized
    },

    // ---------------------------------------------------------------- q193
    // Spark's NATIVE runtime bloom filter (the engine-injected counterpart
    // of q140's hand-built one): with runtime row-level filtering enabled
    // and thresholds sized for the demo, the optimizer plants a
    // bloom_filter agg on the filtered dim side and a might_contain probe
    // on the fact side of the SAME shuffle join — probe rows that cannot
    // match are dropped before the exchange, without any user code. The
    // plan is asserted for the injected probe; the oracle replays the join.
    // Together with q140 this shows both halves: what the engine gives for
    // free, and how to build the same thing when it does not.
    Q("q193_native_runtime_filter",
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY 1""".stripMargin) { (s, dir) =>
      val cust = Tables.load(s, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"))
      val orders = Tables.load(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"), col("o_custkey"))
      val confs = Seq(
        "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
        "spark.sql.autoBroadcastJoinThreshold" -> "-1")
      val saved = confs.map { case (k, _) => k -> s.conf.getOption(k) }
      try {
        confs.foreach { case (k, v) => s.conf.set(k, v) }
        val j = orders.hint("merge").join(cust, col("o_custkey") === col("c_custkey"))
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).cast("bigint").as("n_orders"),
            sum(col("o_orderkey")).cast("bigint").as("key_sum"))
        require(j.queryExecution.optimizedPlan.toString.contains("might_contain"),
          "q193: the optimizer must inject a bloom probe on the fact side")
        j.localCheckpoint()
      } finally saved.foreach { case (k, v) =>
        v.fold(s.conf.unset(k))(x => s.conf.set(k, x)) }
    })
}
