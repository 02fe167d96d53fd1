package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-17 pins.
  *
  *  - ARRAY ELEMENT WIDENING (verdict #2): `isWidening` recurses through
  *    ArrayType — `array<float> -> array<double>` is the embedding-
  *    precision migration every training corpus hits; containsNull may
  *    only widen false -> true; element narrowing refuses.
  *  - `TypeWidening.rewrite` admission (advisory): the public ops-API
  *    rewrite now mirrors append() — a frame WIDER than the manifest
  *    refuses loudly instead of being silently narrowed by the cast.
  *  - `readVersion` chain determinism (advisory): manifest groups key on
  *    names + types and union in strict chain order.
  *  - PLAN-TIME row-level gate (verdict #7): map/struct columns refuse
  *    UPDATE/MERGE/DELETE while the plan is being built, naming the
  *    column — not at executor task time mid-retry-loop.
  *  - Columnar array nullability (advisory): the relaxed containsNull
  *    check admits only the safe direction (file-required elements into
  *    a nullable table type); a file that may hold null elements refuses
  *    a containsNull=false table claim loudly.
  */
class Round17OpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def registerCat(root: String, tag: String): String = {
    val cat = s"graftr17$tag"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.source.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    cat
  }

  test("isWidening: array element widening matrix") {
    import graft.ops.TypeWidening.isWidening
    def arr(et: DataType, cn: Boolean) = ArrayType(et, cn)
    // the embedding-precision migration, both nullability flavors
    assert(isWidening(arr(FloatType, true), arr(DoubleType, true)))
    assert(isWidening(arr(FloatType, false), arr(DoubleType, true)))
    assert(isWidening(arr(FloatType, false), arr(DoubleType, false)))
    assert(isWidening(arr(IntegerType, true), arr(LongType, true)))
    assert(isWidening(arr(ShortType, true), arr(LongType, true)))
    // identity
    assert(isWidening(arr(DoubleType, true), arr(DoubleType, true)))
    // element narrowing refuses
    assert(!isWidening(arr(DoubleType, true), arr(FloatType, true)))
    assert(!isWidening(arr(LongType, true), arr(IntegerType, true)))
    // containsNull may not narrow true -> false: history may hold null
    // elements the new type would promise away
    assert(!isWidening(arr(FloatType, true), arr(DoubleType, false)))
    // cross-family / cross-shape refuse
    assert(!isWidening(arr(IntegerType, true), arr(DoubleType, true)))
    assert(!isWidening(IntegerType, arr(IntegerType, true)))
    assert(!isWidening(arr(IntegerType, true), LongType))
    // structs widen field-wise: identity-modulo-nullability (the
    // manifest round-trip renders all-nullable), per-field widening,
    // and refusals on narrowing / renames / arity changes
    def st(fs: (String, DataType, Boolean)*) = StructType(fs.map {
      case (n, t, nl) => StructField(n, t, nl) })
    assert(isWidening(st(("n", LongType, false), ("s", StringType, false)),
      st(("n", LongType, true), ("s", StringType, true))))
    assert(isWidening(st(("n", IntegerType, true)), st(("n", LongType, true))))
    assert(!isWidening(st(("n", LongType, true)), st(("n", IntegerType, true))))
    assert(!isWidening(st(("n", LongType, true)), st(("n", LongType, false))))
    assert(!isWidening(st(("n", LongType, true)), st(("m", LongType, true))))
    assert(!isWidening(st(("n", LongType, true)),
      st(("n", LongType, true), ("s", StringType, true))))
  }

  test("TypeWidening.rewrite refuses a frame wider than the manifest") {
    import graft.ops.{TypeWidening => TW}
    val dir = TestSpark.tmpDir("r17rw") + "/t"
    TW.init(Seq((1L, 10), (2L, 20)).toDF("k", "a")
      .select(col("k"), col("a").cast("int").as("a")), dir)
    // a LONG frame into an INT manifest: before the round-17 fix this
    // was silently narrowed by a non-ANSI cast — the plane's loudest
    // invariant violated on its public API path
    val wide = Seq((3L, 5000000000L)).toDF("k", "a")
    val res = scala.util.Try(TW.rewrite(wide, dir))
    assert(res.isFailure &&
      res.failed.get.getMessage.contains("widen the table first"))
    assert(graft.ops.VersionedTable.currentVersion(spark, dir).contains(1L),
      "the refused rewrite must not commit")
    // at-manifest rewrite still lands
    TW.rewrite(Seq((9L, 90)).toDF("k", "a")
      .select(col("k"), col("a").cast("int").as("a")), dir)
    assert(TW.read(spark, dir).collect().map(_.getLong(0)).toSeq == Seq(9L))
  }

  test("readVersion: one read per distinct manifest, unioned in chain order") {
    import graft.ops.{TypeWidening => TW}
    val dir = TestSpark.tmpDir("r17chain") + "/t"
    def df(ks: Seq[Long], t: String) = ks.map(k => (k, k * 10))
      .toDF("k", "a").select(col("k"), col("a").cast(t).as("a")).coalesce(1)
    TW.init(df(Seq(0L, 1L), "int"), dir) // v1: int epoch
    TW.widen(spark, dir, "a", LongType) // v2: metadata only
    TW.append(df(Seq(2L, 3L), "bigint"), dir) // v3: long epoch
    TW.append(df(Seq(4L, 5L), "bigint"), dir) // v4: long epoch
    val r1 = TW.read(spark, dir)
    // v3+v4 share a manifest -> ONE multi-path read; v1 is its own: the
    // plan carries exactly two scan nodes for three data epochs
    val scans = r1.queryExecution.executedPlan.collectLeaves().size
    assert(scans == 2, s"3 epochs / 2 distinct manifests must plan 2 " +
      s"reads, got $scans")
    // strict chain order: with one partition per epoch and no shuffle,
    // collect order follows the union order — oldest epoch first
    val ks = r1.select("k").collect().map(_.getLong(0)).toSeq
    assert(ks.take(2).sorted == Seq(0L, 1L) &&
      ks.drop(2).sorted == Seq(2L, 3L, 4L, 5L),
      s"chain must union oldest-manifest-group first, got $ks")
    // deterministic: a second plan renders the identical file order
    assert(TW.read(spark, dir).inputFiles.toSeq == r1.inputFiles.toSeq)
  }

  test("array widening end-to-end on the ops API: float epochs under a " +
      "double manifest") {
    import graft.ops.{TypeWidening => TW}
    val dir = TestSpark.tmpDir("r17arrw") + "/t"
    def df(ks: Seq[Long], t: String) = ks.map(k => (k, Seq(k * 1.0, k + 0.5)))
      .toDF("k", "e").select(col("k"), col("e").cast(t).as("e"))
    TW.init(df(Seq(0L, 1L), "array<float>"), dir) // v1: float elements
    TW.widen(spark, dir, "e", ArrayType(DoubleType)) // v2: metadata only
    TW.append(df(Seq(2L), "array<double>"), dir) // v3: double elements
    // mixed element widths render as double, float values exactly
    val got = TW.read(spark, dir).select("k", "e").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toList).toMap
    assert(got == Map(0L -> List(0.0, 0.5), 1L -> List(1.0, 1.5),
      2L -> List(2.0, 2.5)))
    assert(TW.epochSchema(spark, dir, 1L)("e").dataType ==
      ArrayType(FloatType, containsNull = true),
      "the pre-widen epoch must still store float32 elements")
    // narrowing back refuses with no commit
    val res = scala.util.Try(TW.widen(spark, dir, "e", ArrayType(FloatType)))
    assert(res.isFailure &&
      graft.ops.VersionedTable.currentVersion(spark, dir).contains(3L))
    // a double frame cannot append into a float manifest (pre-widen shape)
    val dir2 = TestSpark.tmpDir("r17arrw2") + "/t"
    TW.init(df(Seq(0L), "array<float>"), dir2)
    assert(scala.util.Try(TW.append(df(Seq(1L), "array<double>"), dir2))
      .isFailure, "array<double> into an array<float> manifest must refuse")
  }

  test("plan-time gate: map / nested-struct columns refuse row-level " +
      "SQL, naming the column") {
    val root = TestSpark.tmpDir("r17gate")
    val df = spark.range(0L, 10L).toDF("k")
      .withColumn("m", map(lit("a"), col("k")))
      // struct-of-struct: beyond the structs-of-scalars surface
      .withColumn("s", struct(struct(col("k").as("kk")).as("inner")))
      .withColumn("v", col("k") * 2)
    graft.ops.VersionedTable.write(df, s"$root/t")
    val cat = registerCat(root, "gate")
    val res = scala.util.Try(
      spark.sql(s"UPDATE $cat.t SET v = v + 1 WHERE k = 3"))
    assert(res.isFailure, "row-level SQL on a map/nested-struct table must refuse")
    val msg = res.failed.get.getMessage
    assert(msg.contains("row-level SQL") && msg.contains("m: map<") &&
      msg.contains("s: struct<"),
      s"the refusal must name the offending columns at plan time: $msg")
    // the table itself stays live and unversioned by the refused op
    assert(graft.ops.VersionedTable.currentVersion(spark, s"$root/t")
      .contains(1L))
  }

  test("struct-of-scalars columns run the full row-level SQL lifecycle") {
    val root = TestSpark.tmpDir("r17struct")
    val df = spark.range(0L, 30L).toDF("k")
      .withColumn("meta", struct(
        concat(lit("s"), col("k") % 3).as("src"),
        (col("k") * 10).as("n"),
        (col("k") % 2 === 0).as("ok")))
    graft.ops.VersionedTable.write(df, s"$root/t")
    val cat = registerCat(root, "sdml")
    def sumN(): Long = spark.sql(
      s"SELECT sum(meta.n) FROM $cat.t").head.getLong(0)
    val base = (0L until 30L).map(_ * 10).sum
    assert(sumN() == base) // row-path struct decode (plain SELECT)
    // COW UPDATE rebuilding the struct streams it through GroupWrite
    spark.sql(s"UPDATE $cat.t SET meta = named_struct('src', meta.src, " +
      "'n', meta.n + 1000L, 'ok', NOT meta.ok) WHERE k < 5")
    assert(sumN() == base + 5 * 1000)
    assert(spark.sql(s"SELECT meta.ok FROM $cat.t WHERE k = 2")
      .head.getBoolean(0) == false)
    // DV DELETE: structs read back through the DV-masked row scan
    spark.sql(s"DELETE FROM $cat.t WHERE k = 7")
    assert(sumN() == base + 5 * 1000 - 70)
    assert(graft.ops.DeletionVectors.vectors(spark, s"$root/t", 3L).count() > 0)
    // MERGE: matched whole-struct replace + a NULL struct + inserts
    spark.sql(s"""SELECT CAST(8 AS BIGINT) AS k,
      |  named_struct('src', 'm', 'n', 1L, 'ok', true) AS meta
      |UNION ALL SELECT CAST(9 AS BIGINT),
      |  CAST(NULL AS STRUCT<src: STRING, n: BIGINT, ok: BOOLEAN>)
      |UNION ALL SELECT CAST(40 AS BIGINT),
      |  named_struct('src', CAST(NULL AS STRING), 'n', 2L, 'ok', false)
      |""".stripMargin).createOrReplaceTempView("r17structsrc")
    spark.sql(s"""MERGE INTO $cat.t t USING r17structsrc s ON t.k = s.k
      |WHEN MATCHED THEN UPDATE SET meta = s.meta
      |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    // k=9's struct is NULL (not a struct of nulls); k=40's src child is
    // NULL inside a present struct — both distinctions must survive the
    // GroupWrite + row-materializer round-trip
    val rows = spark.sql(s"SELECT k, meta FROM $cat.t WHERE k IN (8, 9, 40)")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getStruct(1))).toMap
    assert(rows(8).getString(0) == "m" && rows(8).getLong(1) == 1L)
    assert(rows(9) == null, "a NULL struct must stay NULL, not struct-of-nulls")
    assert(rows(40).isNullAt(0) && rows(40).getLong(1) == 2L,
      "a NULL child inside a present struct must stay a present struct")
    assert(sumN() == base + 5 * 1000 - 70 - 80 + 1 - 90 + 2,
      "merge effects must land exactly (NULL struct's n reads NULL)")
  }

  test("log-layout SQL UPDATE rewrites struct columns (GraftLogCowScan path)") {
    val root = TestSpark.tmpDir("r17structlog")
    val dir = s"$root/t"
    graft.ops.ActionLog.append(
      spark.range(0L, 20L).toDF("k")
        .withColumn("meta", struct((col("k") * 10).as("n"),
          concat(lit("s"), col("k") % 3).as("src"))).coalesce(2),
      dir, Some("k"))
    val cat = registerCat(root, "slog")
    spark.sql(s"UPDATE $cat.t SET meta = named_struct('n', meta.n + 100L, " +
      "'src', meta.src) WHERE k < 5")
    val got = spark.sql(s"SELECT sum(meta.n) FROM $cat.t").head.getLong(0)
    assert(got == (0L until 20L).map(_ * 10).sum + 5 * 100)
    // the rewrite re-recorded stats (the r15 invariant, now over structs)
    val live = graft.ops.ActionLog.liveFiles(spark, dir)
    assert(live.nonEmpty && live.forall(_._2.isDefined),
      s"log COW over structs must keep per-file stats: $live")
  }

  test("column-mapping rename over a struct column reads through the nameMap") {
    import graft.ops.{ColumnMapping => CM}
    val root = TestSpark.tmpDir("r17structmap")
    val dir = s"$root/t"
    CM.writeData(spark.range(0L, 10L).toDF("k")
      .withColumn("meta", struct((col("k") * 2).as("n"))), dir)
    val cat = registerCat(root, "smap")
    spark.sql(s"ALTER TABLE $cat.t RENAME COLUMN meta TO info")
    assert(spark.sql(s"SELECT sum(info.n) FROM $cat.t").head.getLong(0) ==
      (0L until 10L).map(_ * 2).sum)
    assert(CM.read(spark, dir).columns.contains("info"))
  }

  test("row-level SQL on a FEED-TRACKED table captures struct pre/post " +
      "images") {
    import graft.ops.ChangeFeed
    val root = TestSpark.tmpDir("r17structcdf")
    val dir = s"$root/t"
    def df(rows: Seq[(Long, (Long, String))]) = rows
      .map { case (k, (n, s)) => (k, n, s) }.toDF("k", "n", "src")
      .select(col("k"), struct(col("n"), col("src")).as("meta"))
    ChangeFeed.commit(df(Seq(1L -> (10L, "a"), 2L -> (20L, "b"))),
      dir, Seq("k")) // v1, feed-tracked
    val cat = registerCat(root, "scdf")
    spark.sql(s"UPDATE $cat.t SET meta = named_struct('n', meta.n * 10L, " +
      "'src', 'u') WHERE k = 1")
    val changes = ChangeFeed.tableChanges(spark, dir, 1L, 2L, Seq("k"))
      .select(col("k"), col("meta.n"), col("meta.src"),
        col(ChangeFeed.ChangeType)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3)))
      .toSeq
    assert(changes.contains((1L, 10L, "a", "update_preimage")) &&
      changes.contains((1L, 100L, "u", "update_postimage")),
      s"struct pre/post images must ride the capture: $changes")
    assert(!changes.exists(_._1 == 2L),
      s"the untouched row must not capture: $changes")
  }

  test("CDF stream carries struct columns (the row materializer's " +
      "struct path)") {
    import graft.ops.{ChangeFeed, VersionedTable}
    val root = TestSpark.tmpDir("r17structstream") + "/t"
    def df(rows: Seq[(Long, Long, String)]) = rows.toDF("k", "n", "src")
      .select(col("k"), struct(col("n"), col("src")).as("meta"))
    VersionedTable.write(df(Seq((1L, 10L, "a"), (2L, 20L, "b"))), root)
    ChangeFeed.commit(df(Seq((1L, 99L, "z"), (2L, 20L, "b"), (3L, 30L, "c"))),
      root, Seq("k")) // v2: update k=1's struct, insert k=3
    val got = collection.mutable.ArrayBuffer.empty[(Long, Long, String, String)]
    val q = graft.source.CdfStream.read(spark, root, startingVersion = Some(1L))
      .writeStream
      .option("checkpointLocation", TestSpark.tmpDir("r17structstream-ckpt"))
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.select(col("k"), col("meta.n"), col("meta.src"),
          col(ChangeFeed.ChangeType)).collect()
          .foreach(r => got.synchronized {
            got += ((r.getLong(0), r.getLong(1), r.getString(2), r.getString(3)))
          })
      }.start()
    try q.processAllAvailable() finally q.stop()
    val rows = got.toSeq
    assert(rows.exists(r => r._1 == 1L && r._4 == "update_postimage" &&
      r._2 == 99L && r._3 == "z"),
      s"the post-image must carry the updated struct: $rows")
    assert(rows.exists(r => r._1 == 3L && r._4 == "insert" && r._2 == 30L),
      s"the insert must carry its struct: $rows")
  }

  test("struct passenger column rides the type-widening plane") {
    import graft.ops.{TypeWidening => TW}
    val root = TestSpark.tmpDir("r17structtw")
    val dir = s"$root/w"
    TW.init(spark.range(0L, 8L).toDF("k")
      .selectExpr("k", "CAST(k AS SMALLINT) AS a",
        "named_struct('n', k * 10, 'src', concat('s', k % 2)) AS meta"), dir)
    val cat = registerCat(root, "stw")
    spark.sql(s"ALTER TABLE $cat.w ALTER COLUMN a TYPE INT") // the sibling widens
    spark.sql(s"INSERT INTO $cat.w SELECT 50L AS k, CAST(50 AS INT) AS a, " +
      "named_struct('n', 500L, 'src', 'x') AS meta") // mixed epochs
    // the struct rides both epochs unchanged through the widened read
    assert(spark.sql(s"SELECT sum(meta.n) FROM $cat.w").head.getLong(0) ==
      (0L until 8L).map(_ * 10).sum + 500)
    // COW UPDATE across epochs rebuilds the struct through GroupWrite
    spark.sql(s"UPDATE $cat.w SET meta = named_struct('n', meta.n + 1L, " +
      "'src', meta.src) WHERE k < 3")
    assert(spark.sql(s"SELECT sum(meta.n) FROM $cat.w").head.getLong(0) ==
      (0L until 8L).map(_ * 10).sum + 500 + 3)
    // no struct entry in the widening matrix: ALTERing it refuses loudly
    assert(scala.util.Try(spark.sql(s"ALTER TABLE $cat.w ALTER COLUMN meta " +
      "TYPE STRUCT<n: BIGINT, src: STRING, extra: BIGINT>")).isFailure)
    // time travel: v1 renders the struct under the SMALLINT-era manifest
    assert(spark.sql(s"SELECT meta.n FROM $cat.w VERSION AS OF 1 WHERE k = 2")
      .head.getLong(0) == 20L)
  }

  test("columnar array read: containsNull relaxes only in the safe " +
      "direction") {
    val root = TestSpark.tmpDir("r17cn")
    // file A: REQUIRED elements (array() over non-null children)
    spark.range(0L, 8L).toDF("k")
      .select(col("k"), array(col("k").cast("double")).as("e"))
      .coalesce(1).write.parquet(s"$root/req")
    // file B: OPTIONAL elements, with actual nulls
    spark.range(0L, 8L).toDF("k")
      .select(col("k"),
        array(when(col("k") % 2 === 0, col("k").cast("double"))).as("e"))
      .coalesce(1).write.parquet(s"$root/opt")
    def one(d: String): String = new java.io.File(d).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).head.getAbsolutePath
    def schema(cn: Boolean) = StructType(Seq(
      StructField("k", LongType),
      StructField("e", ArrayType(DoubleType, containsNull = cn))))
    // safe: required file elements into a nullable table claim
    assert(graft.source.TestReaderHook.columnarRows(
      schema(cn = true), Nil, one(s"$root/req")) == 8L)
    // unsafe: a file whose elements MAY be null must not satisfy a
    // containsNull=false table claim — refuse loudly, pointing at the
    // honest schema derivation (catalog schemas are relaxArrayNulls-
    // normalized since round 18, so only hand-built schemas get here)
    val res = scala.util.Try(graft.source.TestReaderHook.columnarRows(
      schema(cn = false), Nil, one(s"$root/opt")))
    assert(res.isFailure &&
      res.failed.get.getMessage.contains("relaxArrayNulls"),
      s"nullable file elements under a non-null table claim must refuse")
  }
}
