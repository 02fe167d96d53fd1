package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{HiddenPartitioning, Maintenance, Protocol, TableChecksum, VersionedTable}

/** Edge pins for the round-7 ops whose happy paths the catalog queries
  * already cover: loud empties, canonicalization corners, discovery
  * boundaries, protocol invariants.
  */
class Round7OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("hidden partitioning: an empty projected range fails loudly") {
    val dir = TestSpark.tmpDir("hp1")
    val df = Seq((1L, java.sql.Timestamp.valueOf("2024-01-05 10:00:00")))
      .toDF("id", "ts")
    HiddenPartitioning.writeDaily(df, dir, "ts")
    val ex = intercept[IllegalArgumentException] {
      HiddenPartitioning.readDailyRange(spark, dir, "ts",
        "2030-01-01 00:00:00", "2030-01-02 00:00:00")
    }
    assert(ex.getMessage.contains("no partitions"))
  }

  test("checksum digest distinguishes null from empty string and from ' '") {
    def d(v: Option[String]) =
      TableChecksum.digest(Seq((1L, v)).toDF("k", "s"))._2
    val values = Seq(d(None), d(Some("")), d(Some(" ")))
    assert(values.distinct.size == 3,
      "null, empty, and blank must digest differently")
  }

  test("checksum digest is insensitive to column ORDER only via schema order") {
    val a = Seq((1L, 2L)).toDF("x", "y")
    val b = Seq((2L, 1L)).toDF("y", "x").select(col("x"), col("y"))
    assert(TableChecksum.digest(a) == TableChecksum.digest(b))
  }

  test("maintenance discovery walks namespaces but never table internals") {
    val root = TestSpark.tmpDir("mx1")
    VersionedTable.write(Seq(1L).toDF("k"), s"$root/a/b/t1")
    graft.ops.ActionLog.append(Seq(2L).toDF("k").coalesce(1), s"$root/t2")
    val found = Maintenance.discover(spark, root)
      .map { case (d, k) => d.split("/").last -> k }.sortBy(_._1)
    assert(found == Seq("t1" -> "versioned", "t2" -> "log"))
  }

  test("protocol: reader features must be a subset of writer features") {
    intercept[IllegalArgumentException] {
      Protocol.Proto(Set("a", "b"), Set("a"))
    }
  }

  test("protocol: monotone upgrades commit, repeated commits keep features") {
    val dir = TestSpark.tmpDir("pr1")
    val df = Seq(1L).toDF("k")
    Protocol.commit(df, dir, Protocol.Proto(Set("f1"), Set("f1")))
    // upgrade adds a feature — fine
    Protocol.commit(df, dir, Protocol.Proto(Set("f1"), Set("f1", "f2")))
    val p = Protocol.of(spark, dir,
      VersionedTable.currentVersion(spark, dir).get)
    assert(p.writerFeatures == Set("f1", "f2"))
  }
}
