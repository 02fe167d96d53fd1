package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions.{col, count, lit, sum, when}

/** Physical-plan audits for the catalog's headline queries: the plans the
  * 100 TB design depends on (scan pushdown, broadcast stars, top-k without a
  * global sort, codegen coverage, no accidental cartesians) are ASSERTED, not
  * just inspected — a planner or query regression fails the suite.
  */
class PlanAuditSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def q(name: String): DataFrame = SparkEntry.queries(name)(spark, sf)
  private def formatted(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))
  private def executed(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  /** Plan AFTER execution: AQE finalizes stages and the `*(n)` markers show
    * which operators fused into WholeStageCodegen.
    */
  private def finalPlan(df: DataFrame): String = {
    df.collect() // executes THIS queryExecution (count() would plan a new one)
    df.queryExecution.executedPlan.toString
  }

  test("q01: shipdate filter reaches the parquet scan; columns pruned; codegen spans") {
    val df = q("q01_pricing_summary")
    val plan = formatted(df)
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate), LessThan(l_shipdate"),
      "filter must push into the scan")
    assert(!plan.contains("l_orderkey"), "unused columns must not be read")
    assert(finalPlan(df).contains("*("), "aggregation pipeline must codegen")
  }

  test("q04: ts slice is a shuffle-free codegen'd scan+filter+project") {
    // events.parquet stores TIMESTAMP(NANOS), readable only as raw longs
    // (nanosAsLong), so a timestamp predicate CANNOT reach the parquet scan
    // (it applies to the converted column). The audit pins the next-best
    // plan: one pass, filter fused in codegen, zero exchanges. A production
    // layout stores micros and gets row-group pruning back.
    val plan = finalPlan(q("q04_norm_parse"))
    assert(!plan.contains("Exchange"), "pure projection query must not shuffle")
    assert("\\*\\(\\d+\\) Filter".r.findFirstIn(plan).nonEmpty,
      "filter must fuse into the codegen stage")
  }

  test("q05: the star join broadcasts all three dims, fact never shuffles") {
    val plan = executed(q("q05_star_join"))
    assert("BroadcastHashJoin".r.findAllIn(plan).size === 3)
    assert(!plan.contains("SortMergeJoin"), "no shuffle join in the star")
  }

  test("q14: fact build joins the user dim by broadcast") {
    val plan = executed(q("q14_fact_build"))
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("SortMergeJoin"))
  }

  test("q17: global top-k plans TakeOrderedAndProject, not a full sort") {
    val plan = executed(q("q17_topk_orders"))
    assert(plan.contains("TakeOrderedAndProject"))
    assert(!plan.contains("Exchange rangepartitioning"), "no global sort exchange")
  }

  test("q41: the custom bounded-heap operator is actually planned") {
    assert(executed(q("q41_topk_per_group")).contains("TopKPerGroup"))
  }

  test("no cartesian products anywhere in the LSH/range/as-of family") {
    for (name <- Seq("q22_lsh_candidates", "q24_ngram_jaccard", "q35_asof_join",
        "q36_range_join", "q40_lsh_knn")) {
      val plan = executed(q(name))
      assert(!plan.contains("CartesianProduct"), s"$name plans a cartesian")
      assert(!plan.contains("BroadcastNestedLoopJoin Inner"), s"$name plans a nested loop")
    }
  }

  test("q50: quantile bounds join is broadcast (bounds are per-group scalars)") {
    val plan = executed(q("q50_outlier_filter"))
    assert(plan.contains("BroadcastHashJoin"))
  }

  test("q10: the QUALIFY dedup rides the heap rewrite — no window sort in the plan") {
    val plan = executed(q("q10_dedup_latest"))
    assert(plan.contains("TopKPerGroup"), plan.take(600))
    assert(!plan.contains("Window ["), "rewritten plan must not keep the sort-based window")
  }

  test("q75/q79: new analytics stay distributed — no global window, no cartesian") {
    assert(!executed(q("q75_decile_stats")).contains("Window ["),
      "deciles must use the distributed rank, not a global ntile window")
    val basket = executed(q("q79_cooccurrence"))
    assert(!basket.contains("CartesianProduct") &&
      !basket.contains("BroadcastNestedLoopJoin Inner"),
      "co-occurrence must join keyed on the order")
  }

  test("q71/q76: moment and share re-joins broadcast the tiny aggregate side") {
    assert(executed(q("q71_zscore_anomaly")).contains("BroadcastHashJoin"))
    assert(executed(q("q76_share_of_total")).contains("BroadcastHashJoin"))
  }

  test("q108/q109: rank and frame windows are PARTITIONED — no single-partition window") {
    // the WindowExec trap: a window without PARTITION BY funnels the table
    // through one task; both window entries must carry their partition keys
    Seq("q108_rank_variants", "q109_frame_windows").foreach { name =>
      val plan = executed(q(name))
      assert(plan.contains("Window ["), s"$name plans a window")
      assert(!plan.contains("SinglePartition"),
        s"$name must not exchange to a single partition")
    }
  }

  test("q110: per-group mode plans the bounded heap, not a window sort") {
    val plan = executed(q("q110_mode"))
    assert(plan.contains("TopKPerGroup"), "mode must ride the bounded-heap operator")
    assert(!plan.contains("Window ["), "no sort-based window for the top-1")
  }

  test("q114/q115: quantizer stats and pagerank degrees ride broadcast joins") {
    assert(executed(q("q114_quantization")).contains("BroadcastHashJoin"),
      "the 64-row per-dimension stats must broadcast")
    val pr = executed(q("q115_pagerank"))
    assert(pr.contains("BroadcastHashJoin"), "the degree table must broadcast")
    assert(!pr.contains("CartesianProduct"), "rank updates stay keyed")
  }

  test("q112/q113: curation joins stay keyed on shingle/term — no cartesian") {
    Seq("q112_decontamination", "q113_rarity_score").foreach { name =>
      val plan = executed(q(name))
      assert(!plan.contains("CartesianProduct") &&
        !plan.contains("BroadcastNestedLoopJoin Inner"),
        s"$name must join keyed, never all-pairs")
    }
  }

  test("runtime bloom-filter pruning injects into a selective shuffle join") {
    // Spark's row-level runtime filter: the selective build side plants a
    // bloom filter on the probe side's scan, cutting shuffled bytes — the
    // 100 TB join-pruning story with zero custom code. Assert it engages
    // for a selective dim filter joined to the big fact over the
    // sort-merge path.
    val spark = TestSpark.spark
    // save/restore EVERY touched conf — this session is shared by the suite
    val touched = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold")
    val saved = touched.map(k => k -> spark.conf.getOption(k)).toMap
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "50MB")
    // production default is 10GB of probe-side scan before the filter is
    // worth planting; the testdata is tiny, so drop the floor to observe it
    spark.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    try {
      val sf = "/root/testdata/sf0.01"
      val li = Tables.load(spark, sf, "lineitem")
      val ord = Tables.load(spark, sf, "orders")
        .filter(col("o_orderpriority") === "1-URGENT" && col("o_orderkey") % 7 === 0)
      val joined = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.optimizedPlan.toString
      assert(plan.contains("bloom_filter_agg") || plan.contains("BloomFilterMightContain") ||
        plan.toLowerCase.contains("bloomfilter"),
        s"runtime bloom filter must inject:\n${plan.take(1200)}")
      assert(joined.count() >= 0)
    } finally {
      saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
  }

  test("dynamic partition pruning: the dim filter reaches the fact's partition scan at runtime") {
    // The 100 TB star-join staple: a partitioned fact joined to a filtered
    // dim must scan only the partitions the dim's surviving keys name —
    // decided AT RUNTIME from the dim side (static pruning can't see
    // through the join). Spark plants a DynamicPruning subquery on the
    // fact scan; assert it engages and actually skips partitions.
    val spark = TestSpark.spark
    import org.apache.spark.sql.functions.{col, lit}
    val dir = TestSpark.tmpDir("dpp") + "/fact"
    val fact = spark.range(0, 20000)
      .select(col("id"), (col("id") % 20).as("part_key"))
    fact.write.partitionBy("part_key").parquet(dir)
    val dim = spark.range(0, 20).select(col("id").as("part_key"),
      (col("id") % 7).as("attr"))
    val joined = spark.read.parquet(dir)
      .join(dim.filter(col("attr") === 1), Seq("part_key"))
      .agg(org.apache.spark.sql.functions.count(lit(1)).as("n"))
    val formatted = joined.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(formatted.contains("dynamicpruning") || formatted.contains("DynamicPruning"),
      s"dynamic pruning must plant on the fact scan:\n${formatted.take(1500)}")
    joined.collect()
    // runtime proof, not just plan text: only the dim-surviving partitions
    // (20/7 -> 3 keys) are read, 1000 rows each. AQE nests the scan inside
    // query stages (leaves to `collect`) — traverse through them.
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case f: FileSourceScanExec => Seq(f)
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        scans(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => scans(q.plan)
      case other => other.children.flatMap(scans)
    }
    val parquetScans = scans(joined.queryExecution.executedPlan)
    assert(parquetScans.nonEmpty, "expected a parquet scan in the executed plan")
    val scanned = parquetScans.map(_.metrics("numOutputRows").value).max
    assert(scanned == 3000, s"DPP must scan 3 of 20 partitions, read $scanned rows")
  }

  test("q140: the engine-owned bloom probe filters BELOW the join exchange") {
    // complements the InjectRuntimeFilter rehearsal above: q140's filter is
    // built by the engine itself (driver-aggregated bit set + codegen'd
    // probe), for shapes Spark's optimizer can't see statically. The probe
    // must sit in the orders scan stage — under the exchange — and the join
    // must be the forced shuffle join runtime filters exist for.
    val df = q("q140_bloom_join_pruning")
    val plan = finalPlan(df)
    assert(plan.toLowerCase.contains("bloommightcontain"),
      s"bloom probe missing from the plan:\n${plan.take(1200)}")
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
      "q140 must exercise the shuffle-join shape")
  }

  test("AQE splits the skewed join partition at runtime (q37's rehearsal, automated)") {
    // The same hot-key shape q37 salts by hand: one key carrying ~90% of the
    // fact side of a sort-merge join. With skew-join handling on, AQE
    // detects the oversized shuffle partition at the stage boundary and
    // splits it into advisory-sized slices (replicating the matching dim
    // rows), marking the join `skew=true` — zero query rewrites.
    //
    // Where MANUAL salting (ops.Skew.saltedJoin, q37) still wins:
    //  1. no exchange to re-plan — bucketed exchange-free joins (q59) and
    //     streaming state-store joins have no stage boundary AQE can split;
    //  2. holistic aggregation skew — a collect_list/percentile buffer pins
    //     its whole key to one reducer; only a salted two-phase aggregate
    //     spreads it (partial agg handles the algebraic cases already);
    //  3. skew known AT WRITE time — pre-salting the stored layout avoids
    //     ever materializing the hot shuffle partition AQE would then split.
    val spark = TestSpark.spark
    val touched = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold")
    val saved = touched.map(k => k -> spark.conf.getOption(k)).toMap
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    // production floor is 256 MB of compressed partition bytes; the test
    // fact is ~MBs, so lower the floor to observe the split
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32KB")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    try {
      val fact = spark.range(0, 200000).select(
        when(col("id") % 10 === 0, col("id") % 97).otherwise(lit(0L)).as("k"),
        col("id").as("v"))
      val dim = spark.range(0, 97).select(col("id").as("k"), (col("id") * 2).as("w"))
      // NOTE: a groupBy(k) directly above the join would VETO the split —
      // splitting the join breaks the hash distribution the same-key
      // aggregate requires, and AQE won't add a shuffle to force it (that
      // veto is itself a documented salting case: skewed join feeding a
      // same-key aggregate → q37). A global aggregate has no distribution
      // requirement, so the split engages.
      val joined = fact.join(dim, Seq("k"))
        .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
      val row = joined.collect().head
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE must mark the skewed sort-merge join:\n${plan.take(1500)}")
      // correctness under the split: every fact row matches exactly one dim row
      assert(row.getLong(0) === 200000L)
      assert(row.getLong(1) === (0L until 200000L).sum)
    } finally {
      saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
  }

  test("q150/q160/q162: the new window analytics stay key-partitioned") {
    // skyline, weighted median, changepoint all collapsed to a bounded
    // domain first; their windows must carry partition keys (brand / flag /
    // event_type) — never a whole-table single-partition exchange
    Seq("q150_skyline", "q160_weighted_median", "q162_changepoint").foreach { name =>
      val plan = executed(q(name))
      assert(plan.contains("Window ["), s"$name plans a window")
      assert(!plan.contains("SinglePartition"),
        s"$name must not exchange the data to a single partition")
    }
  }

  test("q151: bucketed AUC scan is all-codegen — no RDD boundary, broadcast bucket summary") {
    val df = q("q151_auc_exact")
    val plan = executed(df)
    assert(!plan.contains("ExistingRDD"),
      "the two-level bucket scan must stay in the SQL engine (no RDD hop)")
    assert(plan.contains("BroadcastHashJoin"),
      "the bucket-summary side is tiny and must broadcast")
    // the per-score window must be PARTITIONED on the bucket (parallel across
    // buckets); the only unpartitioned window is the bounded bucket summary.
    // (The final one-row global aggregate's SinglePartition exchange is
    // inherent to any scalar result and not a window.)
    assert(plan.contains("Exchange hashpartitioning(bucket"),
      s"the in-bucket window must hash-partition on bucket:\n$plan")
    assert("Window \\[".r.findAllIn(plan).size === 2,
      "exactly two window passes: in-bucket and bucket summary")
  }

  test("q156: the six-constraint quality suite reads the table ONCE") {
    val plan = executed(q("q156_quality_suite"))
    assert("Scan parquet".r.findAllIn(plan).size === 1,
      "all constraints must verify in a single scan")
  }

  test("q157: the native NFC expression fuses into codegen") {
    val df = q("q157_nfc_normalize")
    assert(executed(df).toLowerCase.contains("nfcnormalize"),
      "plan must carry the native expression")
    val ran = finalPlan(df)
    assert(ran.contains("*("), "the normalize projection must be inside WholeStageCodegen")
  }

  test("q163/q169: TWAP and interpolation windows stay key-partitioned") {
    Seq("q163_twap", "q169_linear_interpolation").foreach { name =>
      val plan = executed(q(name))
      assert(plan.contains("Window ["), s"$name plans a window")
      assert(!plan.contains("SinglePartition"),
        s"$name must not exchange the series to a single partition")
    }
  }

  test("q165/q170: graph and nearest-asof joins stay keyed — no cartesian") {
    Seq("q165_clustering_coeff", "q170_asof_nearest").foreach { name =>
      val plan = executed(q(name))
      assert(!plan.contains("CartesianProduct"), s"$name plans a cartesian")
      assert(!plan.contains("BroadcastNestedLoopJoin Inner"), s"$name plans a nested loop")
    }
  }

  test("q172: the hopping window is ONE Expand pass, not a self-join") {
    val plan = executed(q("q172_hopping_window"))
    assert(plan.contains("Expand"), "native window(slide) must plan Expand")
    assert(!plan.contains("Join"), "hopping windows must not self-join")
  }

  test("q175: SQL-registered functions reach the same native expressions") {
    // q175's returned frame is checkpointed (its plan is an RDD scan), so
    // audit the registration path directly: SQL text must resolve to the
    // SAME native expression classes the Column API uses, and evaluate
    // to the pinned literature/composition values
    val df = spark.sql(
      "SELECT jaro_winkler('martha', 'marhta') AS jw, nfc_normalize('é') AS n")
    // literal args constant-fold in the optimized plan (itself proof the
    // native expressions evaluated); resolution is visible pre-optimization
    val plan = df.queryExecution.analyzed.toString.toLowerCase
    assert(plan.contains("jarowinkler"), "SQL text must resolve to the native expression")
    assert(plan.contains("nfcnormalize"), "SQL text must resolve to the native expression")
    val row = df.head()
    assert(math.abs(row.getDouble(0) - 0.9611111111111111) < 1e-15) // Winkler '90 case
    assert(row.getString(1) === "é")
  }

  test("q202/q204/q211: bloom-prefilter dedup, mixture sampling, and CDF SCD2 stay keyed — no cartesian") {
    for (name <- Seq("q202_bloom_incremental_dedup", "q204_mixture_sampling",
        "q211_cdf_scd2")) {
      val plan = executed(q(name))
      assert(!plan.contains("CartesianProduct"), s"$name plans a cartesian")
      assert(!plan.contains("BroadcastNestedLoopJoin Inner"),
        s"$name plans an inner nested loop")
    }
  }

  test("q201: the IVM fold aggregates the FEED, never rescans a snapshot mid-merge") {
    // the maintained view's plan reads _cdf parquet + the v1 snapshot only;
    // a snapshot-diff sneaking back in would show as a full-outer join
    val plan = executed(q("q201_incremental_view"))
    assert(!plan.contains("FullOuter"),
      "the maintenance path must not recompute a snapshot diff")
  }

  test("q235/q236: LM scoring and DSIR stay keyed — no global window, 256-row broadcast") {
    // the tercile split's global rank comes from the distributed
    // zipWithIndex pass; a planner regression reintroducing a
    // whole-corpus single-partition Window is the scale-killer this pins
    val lm = executed(q("q235_lm_terciles"))
    assert(!lm.contains("SinglePartition") && !lm.contains("ntile("),
      "q235 must not rank the corpus through a single-partition ntile window")
    val dsir = executed(q("q236_dsir_select"))
    assert(dsir.contains("BroadcastHashJoin"),
      "q236's 256-row ratio table must broadcast into the scoring join")
    assert(!dsir.contains("CartesianProduct"), "q236 must stay keyed")
  }

  test("q237/q238: both retrieval rankers end in the bounded heap, query sides broadcast") {
    for (name <- Seq("q237_hybrid_rrf", "q238_hard_negatives")) {
      val plan = executed(q(name))
      assert(plan.contains("TopKPerGroup"),
        s"$name must rank through the bounded-heap operator, not a global sort")
      assert(plan.contains("BroadcastExchange") || plan.contains("BroadcastHashJoin"),
        s"$name's small query side must broadcast")
      assert(!plan.contains("CartesianProduct"),
        s"$name must never plan an unbounded cartesian")
    }
  }
}
