package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.{Clone, Constraints, VersionedTable}

class CloneConstraintsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fs(dir: String) = new org.apache.hadoop.fs.Path(dir)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  test("shallow clone is zero-copy, reads the source version, diverges on write") {
    val root = TestSpark.tmpDir("clone1")
    val (src, dst) = (s"$root/src", s"$root/dst")
    VersionedTable.write((1 to 100).map(i => (i.toLong, s"v$i")).toDF("k", "v"), src)
    VersionedTable.write(
      VersionedTable.read(spark, src).filter(col("k") <= 50), src) // src v2
    Clone.shallow(spark, src, 2L, dst)
    // zero data bytes in the clone's v1
    val names = fs(dst).listStatus(VersionedTable.verDir(dst, 1L))
      .map(_.getPath.getName).toSet
    assert(names == Set("_clone_src", "_SUCCESS", "_commit_ts"),
      s"clone v1 must be metadata-only: $names")
    assert(Clone.read(spark, dst).count() == 50)
    // divergence: a write to the clone touches nothing in the source
    VersionedTable.write(
      Clone.read(spark, dst).withColumn("v", upper(col("v"))), dst)
    assert(Clone.read(spark, dst).filter(col("v") === "V7").count() == 1)
    assert(VersionedTable.read(spark, src).filter(col("v") === "V7").isEmpty,
      "the source must never see the clone's writes")
    assert(VersionedTable.currentVersion(spark, src).contains(2L))
    // clone time travel: v1 still resolves through the source
    assert(Clone.readVersion(spark, dst, 1L).count() == 50)
    // a source gc that expires the cloned version fails the clone loudly
    VersionedTable.write(
      VersionedTable.read(spark, src).filter(col("k") <= 10), src) // src v3
    VersionedTable.gc(spark, src, keep = 1)
    intercept[IllegalArgumentException](Clone.readVersion(spark, dst, 1L))
    // the diverged v2 is self-contained and unaffected
    assert(Clone.read(spark, dst).count() == 50)
  }

  test("CHECK constraints: carried registry, one-pass enforcement, UNKNOWN passes") {
    val dir = TestSpark.tmpDir("constraints1") + "/t"
    val ok = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("k", "v")
    assert(Constraints.writeChecked(ok, dir,
      Seq("v_pos" -> "v > 0", "k_pos" -> "k > 0")) == 1L)
    assert(Constraints.checksOf(spark, dir).map(_._1) == Seq("v_pos", "k_pos"))
    // the registry carries: this write declares nothing but is still checked
    val bad = Seq((4L, -5L)).toDF("k", "v")
    val e = intercept[Constraints.ConstraintViolationException] {
      Constraints.writeChecked(VersionedTable.read(spark, dir).unionAll(bad), dir)
    }
    assert(e.getMessage.contains("v_pos (1 rows)"), e.getMessage)
    assert(VersionedTable.currentVersion(spark, dir).contains(1L),
      "a rejected write must leave the table untouched")
    assert(VersionedTable.read(spark, dir).count() == 3)
    // ADD CONSTRAINT validates existing data in the same pass
    val e2 = intercept[Constraints.ConstraintViolationException] {
      Constraints.writeChecked(VersionedTable.read(spark, dir), dir,
        Seq("v_small" -> "v < 25"))
    }
    assert(e2.getMessage.contains("v_small (1 rows)"))
    // SQL CHECK semantics: NULL/UNKNOWN passes, only FALSE violates
    assert(Constraints.writeChecked(VersionedTable.read(spark, dir), dir,
      Seq("null_ok" -> "IF(k % 2 = 0, v > 0, NULL)")) == 2L)
    assert(Constraints.checksOf(spark, dir).map(_._1) ==
      Seq("v_pos", "k_pos", "null_ok"))
  }
}
