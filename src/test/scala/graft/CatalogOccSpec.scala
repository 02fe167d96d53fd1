package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.{SnapshotCatalog, VersionedTable}

/** Catalog-level OCC, interleaved at every instant a cross-table
  * transaction can die or race: disjoint repins rebase and both land,
  * overlapping repins fail cleanly, a crash before the claim leaves the
  * catalog untouched, a crash after the claim (pointer unflipped) rolls
  * forward losing nothing, and a threaded race needs no orchestration.
  */
class CatalogOccSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def setup(root: String): (String, String, String) = {
    val (cat, ta, tb) = (s"$root/cat", s"$root/a", s"$root/b")
    VersionedTable.write(Seq((1L, "a1")).toDF("k", "v"), ta)
    VersionedTable.write(Seq((1L, "b1")).toDF("k", "v"), tb)
    SnapshotCatalog.commitOcc(spark, cat, Set("a", "b"))(_ =>
      Map("a" -> 1L, "b" -> 1L))
    (cat, ta, tb)
  }

  private def pins(cat: String): Map[String, Long] =
    SnapshotCatalog.current(spark, cat).get._2

  test("disjoint cross-table txns race: loser rebases, both repins land") {
    val root = TestSpark.tmpDir("catocc1")
    val (cat, ta, tb) = setup(root)
    var fired = false
    val a = SnapshotCatalog.commitOcc(spark, cat, Set("a"))(
      ps => {
        val v = VersionedTable.write(Seq((2L, "a2")).toDF("k", "v"), ta)
        ps + ("a" -> v)
      },
      hook = () => if (!fired) {
        fired = true
        SnapshotCatalog.commitOcc(spark, cat, Set("b"))(ps => {
          val v = VersionedTable.write(Seq((2L, "b2")).toDF("k", "v"), tb)
          ps + ("b" -> v)
        }); ()
      })
    assert(a.rebased == 1, s"A must rebase exactly once: $a")
    // both repins visible atomically; A's rebase re-staged its table write
    assert(pins(cat) == Map("a" -> 3L, "b" -> 2L), s"got ${pins(cat)}")
    assert(SnapshotCatalog.readPinned(spark, cat, "a", ta)
      .as[(Long, String)].collect().toSeq == Seq((2L, "a2")))
    assert(SnapshotCatalog.readPinned(spark, cat, "b", tb)
      .as[(Long, String)].collect().toSeq == Seq((2L, "b2")))
  }

  test("overlapping txns: loser fails cleanly, catalog untouched by it") {
    val root = TestSpark.tmpDir("catocc2")
    val (cat, ta, _) = setup(root)
    intercept[SnapshotCatalog.CatalogConflictException] {
      SnapshotCatalog.commitOcc(spark, cat, Set("a"))(
        ps => ps + ("a" -> VersionedTable.write(Seq((2L, "A")).toDF("k", "v"), ta)),
        hook = () => {
          SnapshotCatalog.commitOcc(spark, cat, Set("a"))(ps =>
            ps + ("a" -> VersionedTable.write(Seq((2L, "B")).toDF("k", "v"), ta))); ()
        })
    }
    // the loser's table write landed v2 before the winner staged v3, but
    // only the WINNER's repin is live — the catalog, not the table pointer,
    // is the read path, so the loser's orphan version is unreachable
    assert(pins(cat)("a") == 3L, "the winner's repin is live")
    assert(SnapshotCatalog.readPinned(spark, cat, "a", ta)
      .as[(Long, String)].collect().toSeq == Seq((2L, "B")))
  }

  test("undeclared repins are rejected before they can corrupt the manifest") {
    val root = TestSpark.tmpDir("catocc3")
    val (cat, _, _) = setup(root)
    intercept[IllegalArgumentException] {
      SnapshotCatalog.commitOcc(spark, cat, Set("a"))(ps => ps + ("b" -> 99L))
    }
    assert(pins(cat) == Map("a" -> 1L, "b" -> 1L))
  }

  test("crash before the claim leaves the catalog untouched") {
    val root = TestSpark.tmpDir("catocc4")
    val (cat, ta, _) = setup(root)
    intercept[RuntimeException] {
      SnapshotCatalog.commitOcc(spark, cat, Set("a"))(
        ps => ps + ("a" -> VersionedTable.write(Seq((2L, "x")).toDF("k", "v"), ta)),
        hook = () => throw new RuntimeException("die before claim"))
    }
    assert(pins(cat) == Map("a" -> 1L, "b" -> 1L))
    // the next txn is unaffected
    SnapshotCatalog.commitOcc(spark, cat, Set("a"))(ps => ps + ("a" -> 2L))
    assert(pins(cat)("a") == 2L)
  }

  test("crash after the claim, before the flip: roll-forward loses nothing") {
    val root = TestSpark.tmpDir("catocc5")
    val (cat, _, _) = setup(root)
    // hand-build the crashed-winner state: manifest 2 claimed, ptr still 1
    val fs = new org.apache.hadoop.fs.Path(cat)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(new org.apache.hadoop.fs.Path(cat, "_m-00000002"), false)
    out.write("#writes=a\na=5\nb=1".getBytes("UTF-8")); out.close()
    // visibility comes at the flip: readers still see manifest 1
    assert(pins(cat) == Map("a" -> 1L, "b" -> 1L))
    SnapshotCatalog.finalizePending(spark, cat)
    assert(pins(cat) == Map("a" -> 5L, "b" -> 1L),
      "finalization must surface the claimed manifest")
    // and a conflicting later txn still sees manifest 2's write set
    intercept[SnapshotCatalog.CatalogConflictException] {
      SnapshotCatalog.commitOcc(spark, cat, Set("a"))(ps => ps + ("a" -> 9L),
        hook = () => {
          SnapshotCatalog.commitOcc(spark, cat, Set("a"))(ps => ps + ("a" -> 7L)); ()
        })
    }
  }

  test("threaded disjoint txns: both land without orchestration") {
    val root = TestSpark.tmpDir("catocc6")
    val (cat, ta, tb) = setup(root)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val ts = Seq(
      new Thread(() => try {
        SnapshotCatalog.commitOcc(spark, cat, Set("a"))(ps =>
          ps + ("a" -> VersionedTable.write(Seq((9L, "A")).toDF("k", "v"), ta))); ()
      } catch { case t: Throwable => errs.add(t) }),
      new Thread(() => try {
        SnapshotCatalog.commitOcc(spark, cat, Set("b"))(ps =>
          ps + ("b" -> VersionedTable.write(Seq((9L, "B")).toDF("k", "v"), tb))); ()
      } catch { case t: Throwable => errs.add(t) }))
    ts.foreach(_.start()); ts.foreach(_.join())
    assert(errs.isEmpty, s"no txn may fail on a disjoint race: $errs")
    assert(SnapshotCatalog.current(spark, cat).get._1 == 3L)
    assert(SnapshotCatalog.readPinned(spark, cat, "a", ta)
      .as[(Long, String)].collect().toSeq == Seq((9L, "A")))
    assert(SnapshotCatalog.readPinned(spark, cat, "b", tb)
      .as[(Long, String)].collect().toSeq == Seq((9L, "B")))
  }
}
