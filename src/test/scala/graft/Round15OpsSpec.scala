package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.VersionedTable

/** Round-15 pins.
  *
  * The adversarial-fixture sweep (round-14 verdict #5) demands proof that
  * the key-local multi-file fixtures actually DETECT the bug class they
  * guard: `graft.dev.unsafeRowLevelPruning=1` re-introduces the round-13
  * pruned-COW-scan defect behind a dev knob, and the fixture must go red
  * under it — rows lost, counts down — then green again the moment the
  * knob lifts. A fixture that stays green under the planted bug is
  * decoration, not a guard.
  */
class Round15OpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fsOf(dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def registerCat(root: String, tag: String): String = {
    val cat = s"graftr15$tag"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.source.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    spark.conf.set(s"spark.sql.catalog.$cat.features", "deletion-vectors")
    cat
  }

  test("key-local fixtures turn RED under the planted rowLevel-pruning bug") {
    def build(tag: String): (String, String) = {
      val root = TestSpark.tmpDir(s"r15knob$tag")
      val dir = s"$root/ns/t"
      VersionedTable.write(
        spark.range(0L, 30L).toDF("k").withColumn("v", lit("a"))
          .repartitionByRange(3, col("k")), dir) // 3 key-ranged files
      val files = fsOf(dir).listStatus(VersionedTable.verDir(dir, 1L)).toSeq
        .filter(st => st.isFile && !st.getPath.getName.startsWith("_") &&
          !st.getPath.getName.startsWith("."))
      assert(files.size >= 3, s"fixture must span >=3 files: $files")
      (root, dir)
    }
    // knob ON: the COW scan forwards the WHERE into row-group pruning and
    // the replacement snapshot silently loses the pruned files' rows —
    // the exact round-13 escape, now DETECTED by the key-local layout
    val (rootBad, _) = build("bad")
    val catBad = registerCat(rootBad, "bad")
    sys.props("graft.dev.unsafeRowLevelPruning") = "1"
    try {
      spark.sql(s"UPDATE $catBad.ns.t SET v = 'B' WHERE k = 25")
      val n = spark.sql(s"SELECT count(*) FROM $catBad.ns.t").as[Long].head
      assert(n < 30L,
        s"the planted pruning bug must LOSE rows on a key-local base " +
          s"(got $n of 30) — if this holds 30, the fixture cannot detect " +
          "the bug class and the guard is dead")
    } finally sys.props.remove("graft.dev.unsafeRowLevelPruning")
    // knob OFF on a fresh twin: full fidelity
    val (rootOk, _) = build("ok")
    val catOk = registerCat(rootOk, "ok")
    spark.sql(s"UPDATE $catOk.ns.t SET v = 'B' WHERE k = 25")
    assert(spark.sql(s"SELECT count(*) FROM $catOk.ns.t").as[Long].head == 30L)
    assert(spark.sql(s"SELECT k FROM $catOk.ns.t WHERE v = 'B'")
      .as[Long].collect().toSeq == Seq(25L))
  }
}
