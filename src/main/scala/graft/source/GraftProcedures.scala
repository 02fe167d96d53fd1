package graft.source

import java.util.Collections

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The catalog's MAINTENANCE surface as SQL stored procedures (Spark 4's
  * `ProcedureCatalog` — the Iceberg `CALL catalog.system.proc(...)`
  * shape): vacuum, re-clustering and checkpointing reachable from plain
  * SQL, so an orchestrator needs no Scala entry point to keep a table
  * healthy. Each procedure routes to the ops layer and RETURNS its
  * accounting as rows (a `LocalScan` — the numbers a maintenance job
  * logs). The `distributed` flag picks the million-file twins
  * ([[graft.ops.ActionLog.vacuumDistributed]] /
  * `optimizeClusteredDistributed`); the driver forms keep their own
  * handoff refusals, so calling the wrong form at scale fails loudly
  * with the pointer, never silently.
  */
private[source] object GraftProcedures {

  val Namespace: Array[String] = Array("system")
  val Names: Seq[String] = Seq("vacuum", "optimize", "checkpoint",
    "create_branch", "merge_branch")

  def list(namespace: Array[String]): Array[Identifier] =
    if (namespace.sameElements(Namespace))
      Names.map(n => Identifier.of(Namespace, n)).toArray
    else Array.empty

  def load(cat: GraftCatalog, ident: Identifier): UnboundProcedure = {
    require(ident.namespace().sameElements(Namespace),
      s"GraftCatalog ${cat.name()}: procedures live in the 'system' " +
        s"namespace, not '${ident.namespace().mkString(".")}'")
    ident.name().toLowerCase match {
      case "vacuum" => VacuumProc(cat)
      case "optimize" => OptimizeProc(cat)
      case "checkpoint" => CheckpointProc(cat)
      case "create_branch" => CreateBranchProc(cat)
      case "merge_branch" => MergeBranchProc(cat)
      case other => sys.error(
        s"GraftCatalog ${cat.name()}: unknown procedure 'system.$other' " +
          s"(have: ${Names.mkString(", ")})")
    }
  }

  private def in(name: String, dt: DataType): ProcedureParameter =
    ProcedureParameter.in(name, dt).build()
  private def inDefault(name: String, dt: DataType,
      dflt: String): ProcedureParameter =
    ProcedureParameter.in(name, dt).defaultValue(dflt).build()

  private def result(schema: StructType, row: InternalRow)
      : java.util.Iterator[Scan] =
    Collections.singletonList[Scan](new LocalScan {
      override def readSchema(): StructType = schema
      override def rows(): Array[InternalRow] = Array(row)
    }).iterator()

  /** Every procedure acts on ONE table named relative to the catalog
    * (`table => 'ns.t'`); a snapshot-pinned catalog is a read surface
    * and refuses maintenance exactly like `alterTable`.
    */
  private def dirOf(cat: GraftCatalog, table: String): String = {
    require(!cat.isSnapshotPinned,
      s"GraftCatalog ${cat.name()}: a snapshot-pinned catalog is a read " +
        "surface — run maintenance through the live catalog")
    cat.dirOfParts(table.split("\\.").toSeq)
  }

  /** vacuum/optimize/checkpoint are LOG-layout operators; on a versioned
    * table `ActionLog.versions` is simply empty, so without this guard a
    * CALL would return a (0, 0) "success" having maintained NOTHING —
    * the silent-no-op shape every refusal on this engine exists to kill.
    */
  private def requireLog(spark: SparkSession, dir: String,
      proc: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/_log")
    require(p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p),
      s"system.$proc: $dir is not a log-structured table (no _log) — " +
        "this procedure maintains the action-log layout; versioned " +
        "snapshots carry whole-version dirs and need no file-level vacuum")
  }

  private def requireBranched(spark: SparkSession, dir: String,
      proc: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/_heads")
    require(p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p),
      s"system.$proc: $dir is not a branched table (no _heads) — enroll " +
        "it in the branch plane via Branching.init first")
  }

  private abstract class Base(cat: GraftCatalog, procName: String)
      extends UnboundProcedure with BoundProcedure {
    override def name(): String = procName
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false
  }

  private case class VacuumProc(cat: GraftCatalog)
      extends Base(cat, "vacuum") {
    override def description(): String =
      "drop expired versions and delete unreferenced data files; " +
        "distributed => true runs the million-file twin"
    override def parameters(): Array[ProcedureParameter] = Array(
      in("table", StringType),
      inDefault("keep", IntegerType, "2"),
      inDefault("grace_ms", LongType,
        graft.ops.ActionLog.DefaultVacuumGraceMs.toString),
      inDefault("distributed", BooleanType, "false"))
    private val out = StructType(Seq(
      StructField("expired", LongType, nullable = false),
      StructField("victims", LongType, nullable = false),
      StructField("mode", StringType, nullable = false)))
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val spark = SparkSession.active
      val dir = dirOf(cat, input.getUTF8String(0).toString)
      requireLog(spark, dir, "vacuum")
      val keep = input.getInt(1)
      val grace = input.getLong(2)
      val (expired, victims, mode) =
        if (input.getBoolean(3)) {
          val (e, v) = graft.ops.ActionLog.vacuumDistributed(spark, dir,
            keep, grace)
          (e.toLong, v, "distributed")
        } else {
          val (e, v) = graft.ops.ActionLog.vacuum(spark, dir, keep, grace)
          (e.toLong, v.toLong, "driver")
        }
      result(out, new GenericInternalRow(Array[Any](expired, victims,
        UTF8String.fromString(mode))))
    }
  }

  private case class OptimizeProc(cat: GraftCatalog)
      extends Base(cat, "optimize") {
    override def description(): String =
      "re-cluster overlapping stats bands into range-disjoint files; " +
        "repeated capped passes converge; distributed => false keeps " +
        "the driver-resident planner"
    override def parameters(): Array[ProcedureParameter] = Array(
      in("table", StringType),
      inDefault("max_files", IntegerType, "10000"),
      inDefault("distributed", BooleanType, "true"))
    private val out = StructType(Seq(
      StructField("version", LongType, nullable = false),
      StructField("rewritten", LongType, nullable = false),
      StructField("overlapping", LongType, nullable = false),
      StructField("mode", StringType, nullable = false)))
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val spark = SparkSession.active
      val dir = dirOf(cat, input.getUTF8String(0).toString)
      requireLog(spark, dir, "optimize")
      val (v, rw, total, mode) =
        if (input.getBoolean(2)) {
          val (v0, rw0, t0) = graft.ops.ActionLog
            .optimizeClusteredDistributed(spark, dir, input.getInt(1))
          (v0, rw0.size.toLong, t0, "distributed")
        } else {
          val (v0, rw0, _) = graft.ops.ActionLog.optimizeClustered(spark, dir)
          (v0, rw0.size.toLong, rw0.size.toLong, "driver")
        }
      result(out, new GenericInternalRow(Array[Any](v, rw, total,
        UTF8String.fromString(mode))))
    }
  }

  /** The WAP cycle's missing SQL halves (round 18): writes already reach
    * a branch through `INSERT INTO t@staging`; forking the branch and
    * PUBLISHING it (the keyed three-way merge — fast-forward when the
    * target never moved, loud refusal on a true conflict) needed Scala.
    */
  private case class CreateBranchProc(cat: GraftCatalog)
      extends Base(cat, "create_branch") {
    override def description(): String =
      "fork a new branch ref from an existing one (metadata-only)"
    override def parameters(): Array[ProcedureParameter] = Array(
      in("table", StringType),
      in("name", StringType),
      inDefault("from", StringType, "'main'"))
    private val out = StructType(Seq(
      StructField("head", LongType, nullable = false)))
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val spark = SparkSession.active
      val dir = dirOf(cat, input.getUTF8String(0).toString)
      requireBranched(spark, dir, "create_branch")
      result(out, new GenericInternalRow(Array[Any](
        graft.ops.Branching.branch(spark, dir,
          input.getUTF8String(2).toString,
          input.getUTF8String(1).toString))))
    }
  }

  private case class MergeBranchProc(cat: GraftCatalog)
      extends Base(cat, "merge_branch") {
    override def description(): String =
      "publish a branch: keyed three-way merge into the target " +
        "(fast-forward when the target never moved; a same-key conflict " +
        "refuses loudly with both heads untouched)"
    override def parameters(): Array[ProcedureParameter] = Array(
      // required args must precede defaulted ones (Spark's binding rule)
      in("table", StringType),
      in("from_branch", StringType),
      in("keys", StringType),
      inDefault("into", StringType, "'main'"))
    private val out = StructType(Seq(
      StructField("outcome", StringType, nullable = false),
      StructField("head", LongType, nullable = false)))
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val spark = SparkSession.active
      val dir = dirOf(cat, input.getUTF8String(0).toString)
      requireBranched(spark, dir, "merge_branch")
      val keys = input.getUTF8String(2).toString
        .split(",").map(_.trim).filter(_.nonEmpty).toSeq
      require(keys.nonEmpty, "merge_branch: 'keys' must name at least " +
        "one key column (comma-separated)")
      val (tag, head) = graft.ops.Branching.merge(spark, dir,
        input.getUTF8String(1).toString,
        input.getUTF8String(3).toString, keys) match {
        case graft.ops.Branching.FastForward(h) => ("fast-forward", h)
        case graft.ops.Branching.Merged(h) => ("merged", h)
      }
      result(out, new GenericInternalRow(Array[Any](
        UTF8String.fromString(tag), head)))
    }
  }

  private case class CheckpointProc(cat: GraftCatalog)
      extends Base(cat, "checkpoint") {
    override def description(): String =
      "materialize the live file set as a DISTRIBUTED parquet " +
        "checkpoint, bounding every later replay to the tail"
    override def parameters(): Array[ProcedureParameter] = Array(
      in("table", StringType))
    private val out = StructType(Seq(
      StructField("version", LongType, nullable = false)))
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val spark = SparkSession.active
      val dir = dirOf(cat, input.getUTF8String(0).toString)
      requireLog(spark, dir, "checkpoint")
      result(out, new GenericInternalRow(Array[Any](
        graft.ops.ActionLog.checkpointParquet(spark, dir))))
    }
  }
}
