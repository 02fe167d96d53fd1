package graft.ops

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.SparkSession
import org.apache.hadoop.fs.{FileSystem, Path}

/** WAREHOUSE MAINTENANCE SWEEP — the janitor every lakehouse runs on a
  * schedule (Delta's VACUUM jobs, Iceberg's maintenance actions, table
  * services in every managed platform): each table declares its OWN
  * retention in a `_policy` file, and ONE sweep walks the warehouse
  * root, detects each table's layout (pointer-protocol snapshot table vs
  * action-log table), applies the matching retention primitive
  * ([[VersionedTable.gc]] / [[ActionLog.vacuum]] — each already
  * crash-safe on its own), and returns a ledger of what it dropped. The
  * sweep itself is O(warehouse metadata): listing, policy reads, and the
  * per-table primitives' own costs — no data reads beyond what vacuum's
  * reference-counting needs. Policy-less tables default to `keep=2`
  * (live + one undo step) — a janitor that silently skips unlabeled
  * tables lets them grow forever, the opposite failure.
  */
object Maintenance {

  final case class Swept(table: String, kind: String, dropped: Int,
      filesDeleted: Int)

  private val PolicyName = "_policy"

  private def fsOf(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Declare a table's retention: keep the newest `keep` versions. */
  def setPolicy(spark: SparkSession, tableDir: String, keep: Int): Unit = {
    require(keep >= 1, "policy must keep at least the live version")
    val fs = fsOf(spark, tableDir)
    val out = fs.create(new Path(tableDir, PolicyName), true)
    try out.write(s"keep=$keep".getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  def policyOf(spark: SparkSession, tableDir: String): Int = {
    val fs = fsOf(spark, tableDir)
    val p = new Path(tableDir, PolicyName)
    if (!fs.exists(p)) 2
    else {
      val in = fs.open(p)
      val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
        finally in.close()
      text.stripPrefix("keep=").toInt
    }
  }

  /** Recursively find table roots under `root`: a dir holding `_ptr` (or
    * `_v-*` children) is a snapshot table; one holding `_log` is an
    * action-log table. Children of a table are never descended into.
    */
  def discover(spark: SparkSession, root: String): Seq[(String, String)] = {
    val fs = fsOf(spark, root)
    def walk(p: Path): Seq[(String, String)] = {
      if (!fs.exists(p)) return Seq.empty
      val children = fs.listStatus(p).toSeq
      val names = children.map(_.getPath.getName).toSet
      if (names.contains("_ptr") || names.exists(_.startsWith("_v-")))
        Seq(p.toString -> "versioned")
      else if (names.contains("_log")) Seq(p.toString -> "log")
      else children.filter(_.isDirectory).flatMap(st => walk(st.getPath))
    }
    walk(new Path(root)).sortBy(_._1)
  }

  /** Sweep the warehouse: apply each table's policy, return the ledger. */
  def sweep(spark: SparkSession, root: String): Seq[Swept] =
    discover(spark, root).map { case (dir, kind) =>
      val keep = policyOf(spark, dir)
      kind match {
        case "versioned" =>
          Swept(dir, kind, VersionedTable.gc(spark, dir, keep), 0)
        case "log" =>
          val (dropped, deleted) = ActionLog.vacuum(spark, dir, keep)
          Swept(dir, kind, dropped, deleted)
      }
    }
}
