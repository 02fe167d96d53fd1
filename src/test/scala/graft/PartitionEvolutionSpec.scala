package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.{PartitionEvolution => PE, VersionedTable}
import org.apache.hadoop.fs.Path

/** Spec-evolution contract: files never move, evolve is metadata-only,
  * pruning is per-epoch and conservatively exact.
  */
class PartitionEvolutionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fs(dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def df(lo: Long, hi: Long) =
    spark.range(lo, hi).select(col("id").as("k"), (col("id") % 4).as("g"))

  test("identity epochs prune equality probes to one dir") {
    val dir = TestSpark.tmpDir("pe1") + "/t"
    PE.init(df(0, 100), dir, PE.Identity("g"))
    val (admitted, total) = PE.selectDirsEq(spark, dir, "g", 2L)
    assert(total === 4 && admitted.size === 1)
    val got = spark.read.parquet(admitted: _*).filter(col("g") === 2L)
    assert(got.count() === df(0, 100).filter(col("g") === 2L).count())
  }

  test("evolve is metadata-only and appends land under the new spec") {
    val dir = TestSpark.tmpDir("pe2") + "/t"
    PE.init(df(0, 100), dir, PE.Identity("g"))
    val e1Files = spark.read.parquet(
      new Path(VersionedTable.verDir(dir, 1L), "data").toString)
      .inputFiles.sorted.toSeq
    PE.evolve(spark, dir, PE.Bucket("k", 4))
    assert(fs(dir).listStatus(VersionedTable.verDir(dir, 2L))
      .map(_.getPath.getName).toSet ===
      Set("_partspec", "_prev", "_SUCCESS", "_commit_ts"))
    PE.append(df(100, 200), dir)
    assert(spark.read.parquet(
      new Path(VersionedTable.verDir(dir, 1L), "data").toString)
      .inputFiles.sorted.toSeq === e1Files, "old epoch files must not move")
    // full read reunifies both epochs
    assert(PE.read(spark, dir).count() === 200L)
    assert(PE.read(spark, dir).agg(sum("k")).head.getLong(0) ===
      (0L until 200L).sum)
    // spec list accumulated; active is the new one
    val (specs, active) = PE.specsOf(spark, dir, 3L)
    assert(specs.map(_.id) === Seq(1, 2) && active === 2)
  }

  test("cross-epoch pruning admits conservatively and stays exact") {
    val dir = TestSpark.tmpDir("pe3") + "/t"
    PE.init(df(0, 100), dir, PE.Identity("g"))
    PE.evolve(spark, dir, PE.Bucket("k", 4))
    PE.append(df(100, 200), dir)
    // probe g: epoch 1 prunes to 1, epoch 2 admits all its dirs
    val (gDirs, gTotal) = PE.selectDirsEq(spark, dir, "g", 1L)
    assert(gDirs.count(_.contains("_v-00000001")) === 1)
    assert(gDirs.size < gTotal)
    val direct = df(0, 200).filter(col("g") === 1L)
    val pruned = spark.read.parquet(gDirs: _*).filter(col("g") === 1L)
      .select("k", "g")
    assert(pruned.exceptAll(direct).isEmpty && direct.exceptAll(pruned).isEmpty)
    // probe k: epoch 2 prunes to one bucket, epoch 1 admits all
    val (kDirs, _) = PE.selectDirsEq(spark, dir, "k", 150L)
    assert(kDirs.count(_.contains("_v-00000003")) === 1)
    assert(kDirs.count(_.contains("_v-00000001")) === 4)
    val k1 = spark.read.parquet(kDirs: _*).filter(col("k") === 150L)
    assert(k1.count() === 1L)
  }

  test("time travel reads the pre-append chain; torn chain fails loudly") {
    val dir = TestSpark.tmpDir("pe4") + "/t"
    PE.init(df(0, 50), dir, PE.Identity("g"))
    PE.evolve(spark, dir, PE.Bucket("k", 2))
    PE.append(df(50, 80), dir)
    assert(PE.readVersion(spark, dir, 1L).count() === 50L)
    assert(PE.readVersion(spark, dir, 2L).count() === 50L) // metadata-only: same data
    assert(PE.readVersion(spark, dir, 3L).count() === 80L)
    // chained base expired: reads through the chain must fail, not fabricate
    fs(dir).delete(VersionedTable.verDir(dir, 1L), true)
    val e = intercept[Throwable] { PE.readVersion(spark, dir, 3L).count() }
    assert(e.getMessage != null)
  }
}
