package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.VersionedTable

/** Catalog-reader hot-path benchmark vs Spark's native vectorized scan.
  * GATED behind GRAFT_PERF=1 so `sbt test` reports only contract suites
  * (the round-12 scratch-suite lesson); run it with:
  *
  *   GRAFT_PERF=1 sbt 'testOnly graft.ReaderPerfSpec'
  *
  * Fixtures: a 2M-row narrow table (the round-11/12 figure: Group path
  * 0.55 → 0.30 s vs native 0.21 s) and a 2M-row 22-column wide table
  * (where per-row materialization cost multiplies).
  */
class ReaderPerfSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def timed(label: String, reps: Int = 5)(body: => Long): Double = {
    val times = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      val n = body
      val dt = (System.nanoTime() - t0) / 1e9
      assert(n > 0)
      dt
    }
    val best = times.min
    info(f"$label: min-of-$reps ${best}%.3f s (${times.map(t => f"$t%.2f").mkString(", ")})")
    best
  }

  test("narrow 2M-row filter scan: catalog reader vs native") {
    assume(sys.env.get("GRAFT_PERF").contains("1"), "set GRAFT_PERF=1")
    val dir = TestSpark.tmpDir("perfnarrow") + "/t"
    VersionedTable.write(
      spark.range(0L, 2000000L).toDF("k")
        .withColumn("v", (col("k") % 997).cast("long")), dir)
    val live = VersionedTable.liveDir(spark, dir)

    val root = dir.stripSuffix("/t")
    spark.conf.set("spark.sql.catalog.perfn", classOf[graft.source.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.perfn.root", root)

    val native = timed("native")(
      spark.read.parquet(live).filter(col("v") === 5L)
        .queryExecution.toRdd.count())
    val catalog = timed("catalog")(
      spark.sql("SELECT * FROM perfn.t WHERE v = 5")
        .queryExecution.toRdd.count())
    info(f"ratio catalog/native = ${catalog / native}%.2f")
  }

  test("wide 22-col 2M-row scan: catalog reader vs native") {
    assume(sys.env.get("GRAFT_PERF").contains("1"), "set GRAFT_PERF=1")
    val dir = TestSpark.tmpDir("perfwide") + "/t"
    val base = spark.range(0L, 2000000L).toDF("k")
    val wide = (1 to 10).foldLeft(base) { (df, i) =>
      df.withColumn(s"l$i", (col("k") * i % 1009).cast("long"))
        .withColumn(s"s$i", concat(lit(s"val$i-"), (col("k") % 100).cast("string")))
    }.withColumn("d1", (col("k") % 353).cast("double"))
    VersionedTable.write(wide, dir)
    val live = VersionedTable.liveDir(spark, dir)
    val root = dir.stripSuffix("/t")
    spark.conf.set("spark.sql.catalog.perfw", classOf[graft.source.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.perfw.root", root)

    val native = timed("native-wide")(
      spark.read.parquet(live).filter(col("l7") === 5L)
        .queryExecution.toRdd.count())
    val catalog = timed("catalog-wide")(
      spark.sql("SELECT * FROM perfw.t WHERE l7 = 5")
        .queryExecution.toRdd.count())
    info(f"ratio catalog/native = ${catalog / native}%.2f")

    // projection-pruned: two columns of twenty-two
    val native2 = timed("native-wide-2col")(
      spark.read.parquet(live).select("k", "s3").filter(col("k") % 7L === 0L)
        .queryExecution.toRdd.count())
    val catalog2 = timed("catalog-wide-2col")(
      spark.sql("SELECT k, s3 FROM perfw.t WHERE k % 7 = 0")
        .queryExecution.toRdd.count())
    info(f"ratio 2col catalog/native = ${catalog2 / native2}%.2f")
  }
}
