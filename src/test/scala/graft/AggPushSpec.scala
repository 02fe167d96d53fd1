package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.source.{AggPushDsv2, KeyedDsv2}

/** The agg-pushdown source must refuse what it cannot fold (per-partition
  * partials cannot merge an average) and fall back to raw rows with
  * identical results — silent wrong-answer pushdown is the failure mode
  * this suite exists to catch.
  */
class AggPushSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def scanOf(df: org.apache.spark.sql.DataFrame) =
    df.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.head

  test("avg pushes as sum/count partials; unsupported group keys fall back raw") {
    val dir = TestSpark.tmpDir("aggpush")
    val data = (1 to 100).map(i => (i % 4, i.toLong, (i * 3).toLong))
      .toDF("k", "c1", "c2")
    KeyedDsv2.writeBucketed(data, dir)
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val pushable = AggPushDsv2.read(spark, dir, "c1", "c2")
        .groupBy(col("k")).agg(count(lit(1)).as("n"), sum(col("c1")).as("s"))
      pushable.collect()
      assert(scanOf(pushable).metrics("numOutputRows").value == 4L,
        "pushed: one partial row per bucket")
      // Spark rewrites AVG to sum/count for partial pushdown (SPARK-37839);
      // the source folds those and the final division stays in the engine
      val avged = AggPushDsv2.read(spark, dir, "c1", "c2")
        .groupBy(col("k")).agg(avg(col("c1")).as("a"))
      avged.collect()
      assert(scanOf(avged).metrics("numOutputRows").value == 4L,
        "avg pushes via the sum/count rewrite")
      val expected = data.groupBy(col("k")).agg(avg(col("c1")).as("a"))
      assert(avged.exceptAll(expected).isEmpty && expected.exceptAll(avged).isEmpty)
      // grouping by a non-partition column: the builder refuses, the scan
      // streams every raw row, and the engine aggregates as usual
      val byC1 = AggPushDsv2.read(spark, dir, "c1", "c2")
        .groupBy(col("c1")).agg(count(lit(1)).as("n"))
      byC1.collect()
      assert(scanOf(byC1).metrics("numOutputRows").value == 100L,
        "refused: every raw row streams")
      assert(byC1.count() == 100L)
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("an empty bucket emits NO spurious group row under grouped pushdown") {
    val dir = TestSpark.tmpDir("aggpush-empty")
    val data = (1 to 20).map(i => (i % 2, i.toLong, (i * 3).toLong))
      .toDF("k", "c1", "c2")
    KeyedDsv2.writeBucketed(data, dir)
    // a bucket directory that exists but holds zero rows — e.g. a partition
    // whose rows were all deleted; SQL says the group does not exist
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(dir, "k=7"))
    val pushed = AggPushDsv2.read(spark, dir, "c1", "c2")
      .groupBy(col("k")).agg(count(lit(1)).as("n"), min(col("c1")).as("lo"))
    val raw = AggPushDsv2.read(spark, dir, "c1", "c2", push = false)
      .groupBy(col("k")).agg(count(lit(1)).as("n"), min(col("c1")).as("lo"))
    assert(pushed.count() === 2L, "only the two non-empty groups exist")
    assert(pushed.exceptAll(raw).isEmpty && raw.exceptAll(pushed).isEmpty,
      "pushed and raw plans must agree with an empty bucket present")
  }
}
