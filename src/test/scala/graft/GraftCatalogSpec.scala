package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{ActionLog, Branching, ChangeFeed, ColumnMapping, DeletionVectors, Protocol, VersionedTable}

/** The SQL catalog's routing matrix: one registration resolves
  * pointer-protocol, column-mapped, deletion-vector, log-structured, and
  * branched tables, each to its ops-layer twin; gates and pins fail loud.
  */
class GraftCatalogSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def register(root: String): String = {
    val cat = "sp_" + java.util.UUID.randomUUID().toString
      .replace("-", "").take(8)
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.source.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    spark.conf.set(s"spark.sql.catalog.$cat.features", "deletion-vectors")
    cat
  }

  private def base = Seq((1L, 10L), (2L, 20L), (3L, 30L), (4L, 40L))
    .toDF("k", "v")

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.mkString("|")).toSeq.sorted

  test("every table flavor resolves to its ops-layer twin") {
    val root = TestSpark.tmpDir("cat_all")
    val cat = register(root)
    // plain versioned
    VersionedTable.write(base, s"$root/plain")
    assert(rows(spark.sql(s"SELECT * FROM $cat.plain"))
      == rows(VersionedTable.read(spark, s"$root/plain")))
    // column-mapped with a rename
    ColumnMapping.writeData(base, s"$root/mapped")
    ColumnMapping.rename(spark, s"$root/mapped", "v", "val")
    val m = spark.sql(s"SELECT * FROM $cat.mapped")
    assert(m.columns.toSeq == Seq("k", "val"))
    assert(rows(m) == rows(ColumnMapping.read(spark, s"$root/mapped")))
    // deletion vectors
    VersionedTable.write(base, s"$root/dv")
    DeletionVectors.delete(spark, s"$root/dv", col("k") === 2L)
    assert(rows(spark.sql(s"SELECT * FROM $cat.dv"))
      == rows(DeletionVectors.read(spark, s"$root/dv")))
    // log-structured
    ActionLog.append(base.coalesce(1), s"$root/logt")
    assert(rows(spark.sql(s"SELECT * FROM $cat.logt"))
      == rows(ActionLog.read(spark, s"$root/logt")))
    // branched
    Branching.init(base, s"$root/br")
    Branching.branch(spark, s"$root/br", "main", "x")
    Branching.commitOn(base.withColumn("v", col("v") + 1), s"$root/br", "x")
    assert(rows(spark.sql(s"SELECT * FROM $cat.`br@x`"))
      == rows(Branching.readBranch(spark, s"$root/br", "x")))
    assert(rows(spark.sql(s"SELECT * FROM $cat.br")) == rows(base))
  }

  test("time travel addresses versions on every flavor that has them") {
    val root = TestSpark.tmpDir("cat_tt")
    val cat = register(root)
    ChangeFeed.commit(base, s"$root/t", Seq("k"))
    ChangeFeed.commit(base.withColumn("v", col("v") * 2), s"$root/t", Seq("k"))
    assert(rows(spark.sql(s"SELECT * FROM $cat.t VERSION AS OF 1"))
      == rows(base))
    assert(rows(spark.sql(s"SELECT * FROM $cat.t"))
      == rows(base.withColumn("v", col("v") * 2)))
  }

  test("the protocol gate refuses before construction, names the feature") {
    val root = TestSpark.tmpDir("cat_gate")
    val cat = register(root) // supports deletion-vectors only
    Protocol.commit(base, s"$root/g", Protocol.Proto(
      Set("row-tracking"), Set("row-tracking")))
    val ex = intercept[Exception] {
      spark.sql(s"SELECT * FROM $cat.g").collect()
    }
    assert(ex.getMessage.contains("row-tracking"))
  }

  test("snapshot pinning refuses unpinned tables") {
    val root = TestSpark.tmpDir("cat_pin")
    VersionedTable.write(base, s"$root/a")
    graft.ops.SnapshotCatalog.commit(spark, s"$root/_c", Map("a" -> 1L))
    VersionedTable.write(base, s"$root/b")
    val cat = register(root)
    spark.conf.set(s"spark.sql.catalog.$cat.snapshotCatalog", s"$root/_c")
    assert(rows(spark.sql(s"SELECT * FROM $cat.a")) == rows(base))
    val ex = intercept[Exception] {
      spark.sql(s"SELECT * FROM $cat.b").collect()
    }
    assert(ex.getMessage.contains("not pinned"))
  }

  test("DDL: duplicate CREATE fails, DROP removes, non-empty ns refuses") {
    val root = TestSpark.tmpDir("cddl")
    val cat = register(root)
    spark.sql(s"CREATE NAMESPACE $cat.n1")
    spark.sql(s"CREATE TABLE $cat.n1.t AS SELECT 1L AS k, 2L AS v")
    val dup = intercept[Exception] {
      spark.sql(s"CREATE TABLE $cat.n1.t AS SELECT 3L AS k, 4L AS v")
    }
    assert(dup.getMessage.toLowerCase.contains("already exists"))
    val nonEmpty = intercept[Exception] {
      spark.sql(s"DROP NAMESPACE $cat.n1")
    }
    assert(nonEmpty.getMessage.contains("not empty"))
    spark.sql(s"DROP TABLE $cat.n1.t")
    val gone = intercept[Exception] {
      spark.sql(s"SELECT * FROM $cat.n1.t").collect()
    }
    assert(gone.getMessage.contains("TABLE_OR_VIEW_NOT_FOUND") ||
      gone.getMessage.toLowerCase.contains("cannot be found") ||
      gone.getMessage.toLowerCase.contains("not found"))
    spark.sql(s"DROP NAMESPACE $cat.n1") // now empty
  }

  test("DML: an AS-OF relation refuses writes; empty CREATE then INSERT") {
    val root = TestSpark.tmpDir("cdml")
    val cat = register(root)
    spark.sql(s"CREATE TABLE $cat.t2 (k BIGINT, v BIGINT)")
    // created-but-empty: readable as an empty relation of the DDL schema
    assert(spark.sql(s"SELECT * FROM $cat.t2").count() == 0)
    spark.sql(s"INSERT INTO $cat.t2 VALUES (CAST(1 AS BIGINT), CAST(2 AS BIGINT))")
    assert(VersionedTable.currentVersion(spark, s"$root/t2").contains(1L))
    assert(spark.sql(s"SELECT * FROM $cat.t2").count() == 1)
  }
}
