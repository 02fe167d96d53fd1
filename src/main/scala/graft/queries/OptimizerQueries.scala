package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.queries.Q.scratch

/** Round-7 continuation: optimizer/cost-model operators — connector
  * statistics driving join strategy, and plan-level rewrites. Plan probes
  * follow the q185/q199 rule: AQE off for the plan read, confs
  * saved/restored, shapes require'd in-query so a planner regression is a
  * red CORRECTNESS row, not a silent slowdown.
  */
object OptimizerQueries {

  val all: Seq[Q] = Seq(

    // ---------------------------------------------------------------- q253
    // STATS-DRIVEN JOIN PLANNING through the connector API
    // (`SupportsReportStatistics`): the same kilobyte dim layout joined to
    // the fact three ways — (a) through the stats-less source, where the v2
    // default (spark.sql.defaultSizeInBytes = Long.Max) forces a
    // conservative SORT-MERGE of the whole fact; (b) through the
    // stats-reporting source with its ACTUAL bytes, where JoinSelection
    // sees a sub-threshold build side and plans the BROADCAST; (c) with the
    // reported size inflated past the threshold, where the merge returns —
    // proving the decision tracks the REPORTED statistic, not the layout.
    // All three plans compute identical values (require'd bit-exact); the
    // returned result runs the broadcast plan. At 100 TB this statistic is
    // the difference between shuffling the fact across 1000 executors and
    // shipping one dim everywhere — and it arrives from table metadata
    // (manifest totals), never a data scan.
    Q("q253_stats_driven_join",
      """WITH f AS (SELECT l_suppkey % 25 AS k, l_orderkey FROM lineitem),
        |d AS (SELECT n_nationkey AS k, CAST(n_regionkey AS BIGINT) AS region
        |      FROM nation)
        |SELECT region, CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(l_orderkey) AS BIGINT) AS key_sum
        |FROM f JOIN d USING (k) GROUP BY 1""".stripMargin) { (s, dir) =>
      import graft.source.{KeyedDsv2, StatsDsv2}
      import org.apache.spark.sql.DataFrame
      import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, SortMergeJoinExec}
      val root = scratch(s, dir, "q253")
      val dim = Tables.load(s, dir, "nation")
        .select(col("n_nationkey").cast("int").as("k"),
          col("n_regionkey").cast("long").as("region"),
          col("n_nationkey").cast("long").as("natkey"))
      KeyedDsv2.writeBucketed(dim, s"$root/dim")
      val fact = Tables.load(s, dir, "lineitem")
        .select((col("l_suppkey") % 25).cast("int").as("k"),
          col("l_orderkey").cast("long").as("okey"))
      def agg(d: DataFrame): DataFrame =
        fact.join(d, Seq("k"))
          .groupBy(col("region"))
          .agg(count(lit(1)).cast("bigint").as("n_rows"),
            sum(col("okey")).cast("bigint").as("key_sum"))
      val aqeKey = "spark.sql.adaptive.enabled"
      val thrKey = "spark.sql.autoBroadcastJoinThreshold"
      val saved = Seq(aqeKey, thrKey).map(k => k -> s.conf.get(k))
      try {
        s.conf.set(aqeKey, "false") // q185 rule: clean plan read
        // 16 KiB: the dim's true bytes sit UNDER it, the fact parquet (117 KiB
        // at sf0.001 and up) sits OVER it at every SF — so the only candidate
        // build side is the dim, and only when its reported size is accurate
        s.conf.set(thrKey, (16 * 1024).toString)
        def shape(d: DataFrame): (Int, Int) = {
          val plan = agg(d).queryExecution.executedPlan
          (plan.collect { case j: BroadcastHashJoinExec => j }.length,
            plan.collect { case j: SortMergeJoinExec => j }.length)
        }
        // (a) no statistics: v2 default size is Long.Max — never broadcast
        require(shape(KeyedDsv2.read(s, s"$root/dim", "region", "natkey"))
          == ((0, 1)),
          "q253: the stats-less connector read must plan a sort-merge join")
        // (b) actual bytes reported: kilobytes < threshold — broadcast
        val withStats = StatsDsv2.read(s, s"$root/dim", "region", "natkey")
        require(shape(withStats) == ((1, 0)),
          "q253: accurate reported stats must flip the join to a broadcast")
        // (c) same layout, reported size inflated past the threshold
        require(shape(StatsDsv2.read(s, s"$root/dim", "region", "natkey",
          sizeInBytes = Some(1L << 34))) == ((0, 1)),
          "q253: an inflated reported size must push the join back to merge")
        // the decision tracked the statistic; values are plan-invariant
        val bc = agg(withStats).localCheckpoint()
        val smj = agg(KeyedDsv2.read(s, s"$root/dim", "region", "natkey"))
        require(bc.exceptAll(smj).isEmpty && smj.exceptAll(bc).isEmpty,
          "q253: broadcast and merge plans must agree bit-exactly")
        bc
      } finally saved.foreach { case (k, v) => s.conf.set(k, v) }
    })
}
