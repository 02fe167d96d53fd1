package graft.source

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsTruncate, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.sources.InsertableRelation
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.ops.{ActionLog, Occ, Protocol, VersionedTable}

/** SQL DML for [[GraftCatalog]] tables — the WRITE half of the SQL
  * surface, Delta's public recipe: the DSv2 table exposes
  * `V1_BATCH_WRITE` and hands Spark a [[V1Write]] whose
  * `InsertableRelation` routes the fully-resolved frame through the
  * table's OWN commit protocol (Delta's `WriteIntoDeltaBuilder` does
  * exactly this) — never a blind file write:
  *
  *  - snapshot tables commit through [[Occ.commit]]: `INSERT INTO`
  *    declares a WRITER-UNIQUE append token, so two concurrent SQL
  *    inserts never hard-conflict — the loser REBASES (re-runs
  *    base ∪ data on the winner's snapshot), Delta's blind-append rule;
  *    `INSERT OVERWRITE` declares `*` and conflicts with everything
  *    concurrent, as a full-table replace must.
  *  - log tables append through [[ActionLog.appendOcc]] — O(delta), the
  *    100 TB path — carrying the table's recorded stats column so the
  *    log's skipping index stays maintained through SQL writes;
  *    `INSERT OVERWRITE` is a log rewrite (remove-all + add).
  *
  * The writer-feature protocol gate runs BEFORE staging: a catalog
  * registered without a feature the live version requires for WRITING
  * must not commit a byte.
  */
final case class DmlTarget(dir: String, layout: String, features: Set[String])

private[source] object GraftDml {

  def insert(target: DmlTarget, data: DataFrame, overwrite: Boolean): Unit = {
    val spark = data.sparkSession
    target.layout match {
      case b if b.startsWith("branch:") =>
        // SQL writes land ON THE NAMED REF (`INSERT INTO t@staging`) —
        // the write step of write-audit-publish: the branch advances,
        // every other ref is untouched, and the typed merge publishes.
        // Capture-tracked branches keep their typed commit path (a
        // blind SQL append carries no key capture and branchChanges
        // would fail loudly downstream — the existing contract).
        val branch = b.stripPrefix("branch:")
        val next =
          if (overwrite) data
          else graft.ops.Branching.readBranch(spark, target.dir, branch)
            .unionByName(data)
        graft.ops.Branching.commitOn(next, target.dir, branch)
        ()
      case "typed" =>
        // the TYPE-WIDENING plane: an append is a new epoch AT the live
        // manifest types (the plane's own admission check refuses wider
        // arrivals); an overwrite is the whole-snapshot typed rewrite
        // (manifest carried forward, chain ended)
        if (overwrite) graft.ops.TypeWidening.rewrite(data, target.dir)
        else graft.ops.TypeWidening.append(data, target.dir)
        ()
      case "log" =>
        if (overwrite) {
          val n = math.max(1, data.rdd.getNumPartitions)
          // stats ride the rewrite exactly as they ride the append: an
          // INSERT OVERWRITE that shed the recorded stats column would
          // leave the skipping index stale and make stats-dependent
          // maintenance (optimizeClustered) refuse the table outright
          ActionLog.rewrite(data, target.dir, numFiles = n,
            statsCol = ActionLog.statsColumn(spark, target.dir))
          ()
        } else {
          ActionLog.appendOcc(data, target.dir,
            statsCol = ActionLog.statsColumn(spark, target.dir))
          ()
        }
      case _ =>
        VersionedTable.currentVersion(spark, target.dir).foreach { v =>
          val missing = Protocol.of(spark, target.dir, v)
            .writerFeatures -- target.features
          require(missing.isEmpty,
            s"GraftCatalog: ${target.dir} requires writer feature(s) " +
              s"${missing.toSeq.sorted.mkString(", ")} this catalog was " +
              "not registered with — add them to the 'features' option")
        }
        // CDF-tracked tables: every commit must carry its capture, or a
        // running CDF stream wedges on the capture-less version FOREVER
        // (the stream's contiguity guard cannot step over it, and the
        // breakage would surface on the CONSUMER, not this writer). An
        // append captures its delta tagged `insert` — no keys needed; an
        // overwrite is a whole-table diff and needs the recorded feed keys.
        val tracked = graft.ops.ChangeFeed.tracked(spark, target.dir)
        val token =
          if (overwrite) "*"
          else "append-" + java.util.UUID.randomUUID().toString.take(12)
        val keys =
          if (tracked && overwrite)
            Some(graft.ops.ChangeFeed.recordedKeys(spark, target.dir)
              .getOrElse(sys.error(
                s"GraftCatalog: ${target.dir} carries a change feed with " +
                  "no recorded keys — INSERT OVERWRITE cannot capture its " +
                  "diff; commit through ChangeFeed.commit(keyCols) once " +
                  "to record them")))
          else None
        Occ.commit(spark, target.dir, writeSet = Set(token),
          captureOverwrite = keys,
          captureAppend = if (tracked && !overwrite) Some(data) else None) {
          base =>
            base match {
              case Some(b) if !overwrite => b.unionByName(data)
              case _ => data
            }
        }
        ()
    }
  }
}

private[source] object GraftDelete {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions.{col, lit, not}
  import org.apache.spark.sql.{sources => f}

  /** Source-filter → Column translation for the DELETE surface. None =
    * untranslatable, and `canDeleteWhere` refuses BEFORE any mutation —
    * a partial translation would delete the wrong rows.
    */
  def toColumn(flt: f.Filter): Option[Column] = flt match {
    case f.EqualTo(a, v) => Some(col(a) === lit(v))
    case f.EqualNullSafe(a, v) => Some(col(a) <=> lit(v))
    case f.GreaterThan(a, v) => Some(col(a) > lit(v))
    case f.GreaterThanOrEqual(a, v) => Some(col(a) >= lit(v))
    case f.LessThan(a, v) => Some(col(a) < lit(v))
    case f.LessThanOrEqual(a, v) => Some(col(a) <= lit(v))
    case f.In(a, vs) => Some(col(a).isin(vs.toIndexedSeq.map(lit(_)): _*))
    case f.IsNull(a) => Some(col(a).isNull)
    case f.IsNotNull(a) => Some(col(a).isNotNull)
    case f.StringStartsWith(a, v) => Some(col(a).startsWith(v))
    case f.StringEndsWith(a, v) => Some(col(a).endsWith(v))
    case f.StringContains(a, v) => Some(col(a).contains(v))
    case f.AlwaysTrue() => Some(lit(true))
    case f.AlwaysFalse() => Some(lit(false))
    case f.And(l, r) => for { lc <- toColumn(l); rc <- toColumn(r) } yield lc && rc
    case f.Or(l, r) => for { lc <- toColumn(l); rc <- toColumn(r) } yield lc || rc
    case f.Not(c) => toColumn(c).map(not)
    case _ => None
  }

  def predicate(filters: Array[f.Filter]): Option[Column] =
    if (filters.isEmpty) Some(lit(true)) // DELETE with no WHERE
    else filters.toIndexedSeq.foldLeft(Option(lit(true))) { (acc, flt) =>
      for { a <- acc; c <- toColumn(flt) } yield a && c
    }

  /** SQL DELETE → a deletion-vector commit: rows are masked by bitmap,
    * data files are byte-copied (never re-encoded), history stays
    * addressable. CDF capture rides the commit iff the table already
    * carries a feed — SQL DML MAINTAINS a feed, it never silently starts
    * one (an unconditional capture here would flip an untracked table to
    * tracked and make every later row-level write answer for a feed
    * nobody reads). TRUNCATE TABLE arrives here as the always-true
    * filter (SupportsDelete extends TruncatableTable).
    */
  def deleteWhere(target: DmlTarget, filters: Array[f.Filter]): Unit = {
    require(target.layout == "versioned",
      s"GraftCatalog: DELETE needs the snapshot layout, ${target.dir} is " +
        s"'${target.layout}' — delete through the typed ops layer")
    val pred = predicate(filters).getOrElse(sys.error(
      s"GraftCatalog: untranslatable DELETE predicate " +
        filters.mkString("[", ", ", "]")))
    val spark = SparkSession.active
    graft.ops.DeletionVectors.delete(spark, target.dir, pred,
      capture = graft.ops.ChangeFeed.tracked(spark, target.dir))
    ()
  }
}

/** The shared write-builder: `SupportsTruncate` records the
  * INSERT-OVERWRITE intent (Spark's OverwriteByExpression with a `true`
  * condition calls `truncate()` on the builder, then inserts).
  */
private[source] class GraftDmlWriteBuilder(target: DmlTarget)
    extends WriteBuilder with SupportsTruncate {
  private var overwrite = false
  override def truncate(): WriteBuilder = { overwrite = true; this }
  override def build(): Write = new V1Write {
    override def toInsertableRelation: InsertableRelation =
      new InsertableRelation {
        override def insert(data: DataFrame, v1Overwrite: Boolean): Unit =
          GraftDml.insert(target, data, overwrite || v1Overwrite)
      }
  }
}

/** ROW-LEVEL OPERATIONS (SQL UPDATE / MERGE INTO / the rewrite form of
  * DELETE) — Spark's group-based copy-on-write plan: the operation hands
  * Spark a scan of the current snapshot (the DV-AWARE scan on a DV
  * table, so masked rows never resurrect into the replacement), Spark
  * computes the full replacement content, and the write streams it from
  * the executors into OCC staging ([[GroupBatchWrite]]) — committed
  * against the scanned base version, failing loudly if anything landed
  * since. Simple-predicate DELETEs keep the cheaper O(deleted)
  * deletion-vector path ([[GraftDelete]]); this is the road for
  * everything that genuinely rewrites rows.
  */
/** The connector's row-level operation (UPDATE / MERGE / rewrite DELETE).
  *
  * On the LOG layout the operation is GROUP-GRANULAR copy-on-write
  * (Delta/Iceberg's shape): `requiredMetadataAttributes` asks the plan to
  * carry `_file`, Spark's `RowLevelOperationRuntimeGroupFiltering` runs a
  * subquery for the groups holding matching rows and pushes the result
  * into the operation's scan as an IN(`_file`) runtime filter, and the
  * commit removes ONLY those groups' files while every untouched file
  * stays live by reference — a one-row UPDATE on a million-file table
  * reads, rewrites and logs one group, never the table. When no runtime
  * filter fires (conf off, non-selective condition) `replacedFiles`
  * stays None and the commit falls back to whole-table replacement —
  * pruning is an optimization, never a correctness bet.
  */
private[source] class GraftRowLevelOperation(
    cmd: org.apache.spark.sql.connector.write.RowLevelOperation.Command,
    target: DmlTarget, baseVersion: Long,
    scanBuilderFn: CaseInsensitiveStringMap => ScanBuilder,
    groupFilterable: Boolean = false)
    extends org.apache.spark.sql.connector.write.RowLevelOperation {

  /** Set by the COW scan when the runtime group filter narrows the
    * operation; read by the write at commit. None = whole-table.
    */
  @volatile private[source] var replacedFiles: Option[Seq[String]] = None

  override def command()
      : org.apache.spark.sql.connector.write.RowLevelOperation.Command = cmd
  override def requiredMetadataAttributes()
      : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    if (groupFilterable)
      Array(org.apache.spark.sql.connector.expressions.Expressions
        .column(GraftMeta.FileCol))
    else Array.empty
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    scanBuilderFn(options)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    // PLAN-TIME admission (round 17 #7): newWriteBuilder runs while
    // Spark is still BUILDING the rewrite plan, so an unsupported column
    // (map, struct, nested array) refuses the whole UPDATE/MERGE/DELETE
    // here — with the column named — instead of dying in an executor
    // task retry loop mid-scan. GroupBatchWrite re-checks as defense.
    GroupWrite.validate(info.schema(),
      s"GraftCatalog: row-level SQL on ${target.dir}")
    new WriteBuilder {
      override def build(): org.apache.spark.sql.connector.write.Write =
        new org.apache.spark.sql.connector.write.Write {
          override def toBatch
              : org.apache.spark.sql.connector.write.BatchWrite =
            new GroupBatchWrite(target, baseVersion, info.schema(),
              () => replacedFiles)
        }
    }
  }
}

/** A created-but-never-committed table (CREATE TABLE / the window inside
  * CTAS): reads are an empty scan of the declared schema; the first
  * INSERT mints version 1 through the normal commit protocol.
  */
private[source] class GraftEmptyTable(tableName: String,
    tableSchema: StructType, target: DmlTarget)
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String = tableName
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.V1_BATCH_WRITE, TableCapability.TRUNCATE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan with Batch {
        override def readSchema(): StructType = tableSchema
        override def toBatch: Batch = this
        override def planInputPartitions(): Array[InputPartition] = Array.empty
        override def createReaderFactory(): PartitionReaderFactory =
          new CdfReaderFactory(tableSchema)
      }
    }
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new GraftDmlWriteBuilder(target)
}
