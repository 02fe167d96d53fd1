package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-18 pins.
  *
  *  - ARRAY-OF-STRUCT through row-level SQL (verdict #1): the
  *    conversation-turn column — `turns array<struct<role,content>>` —
  *    is first-class on the GroupWrite surface; deeper nesting still
  *    refuses at PLAN time.
  *  - ARRAY ELEMENT SURFACE (verdict #4): date / timestamp /
  *    timestamp_ntz / decimal(<=18) elements round-trip the DML
  *    lifecycle; decimal(>18) and nested elements refuse.
  *  - STRUCT-FIELD WIDENING DDL (verdict #2): `ALTER COLUMN m.n TYPE t`
  *    lifts to a whole-column widen; narrowing / unknown fields /
  *    non-struct targets refuse with no commit.
  *  - MAP POLICY (verdict #5): maps refuse row-level SQL as PERMANENT
  *    POLICY, and the refusal message carries the restructuring guidance
  *    (explode into a key/value table).
  *  - DISTRIBUTED VACUUM (verdict #3): `vacuumDistributed` computes the
  *    same (expired, victims) and leaves the same disk state as the
  *    driver-resident `vacuum` on the same history.
  */
class Round18OpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def registerCat(root: String, tag: String): String = {
    val cat = s"graftr18$tag"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.source.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    cat
  }

  test("GroupWrite.supported: the round-18 element/field matrix") {
    import graft.source.GroupWrite.supported
    def arr(et: DataType) = ArrayType(et)
    val turn = StructType(Seq(StructField("role", StringType),
      StructField("content", StringType)))
    // round-18 admissions
    assert(supported(arr(DateType)) && supported(arr(TimestampType)) &&
      supported(arr(TimestampNTZType)) && supported(arr(DecimalType(12, 2))))
    assert(supported(arr(turn)), "array<struct<scalars>> is the turn shape")
    // refusals: over-wide decimals, nested elements, maps, deep structs
    assert(!supported(arr(DecimalType(20, 2))))
    assert(!supported(arr(arr(LongType))), "array<array> must refuse")
    assert(!supported(arr(StructType(Seq(StructField("x", arr(LongType)))))),
      "array<struct<..array..>> must refuse")
    assert(!supported(MapType(StringType, StringType)))
    assert(!supported(StructType(Seq(StructField("inner", turn)))),
      "struct-of-struct must refuse")
  }

  test("map columns refuse row-level SQL with the restructuring guidance " +
      "(permanent policy)") {
    val root = TestSpark.tmpDir("r18map")
    val df = spark.range(0L, 10L).toDF("k")
      .withColumn("m", map(lit("a"), col("k").cast("string")))
      .withColumn("v", col("k") * 2)
    graft.ops.VersionedTable.write(df, s"$root/t")
    val cat = registerCat(root, "map")
    val res = scala.util.Try(
      spark.sql(s"UPDATE $cat.t SET v = v + 1 WHERE k = 3"))
    assert(res.isFailure, "row-level SQL on a map table must refuse")
    val msg = res.failed.get.getMessage
    assert(msg.contains("m: map<") && msg.contains("key/value table"),
      s"the refusal must name the column AND the exploded-table guidance: $msg")
    assert(graft.ops.VersionedTable.currentVersion(spark, s"$root/t")
      .contains(1L), "the refused op must not commit")
  }

  test("deep nesting inside an array refuses at PLAN time, naming the column") {
    val root = TestSpark.tmpDir("r18deep")
    val df = spark.range(0L, 10L).toDF("k")
      .withColumn("t", array(struct(col("k").as("n"),
        array(col("k")).as("path")))) // struct child is itself an array
      .withColumn("v", col("k") * 2)
    graft.ops.VersionedTable.write(df, s"$root/t")
    val cat = registerCat(root, "deep")
    val res = scala.util.Try(
      spark.sql(s"UPDATE $cat.t SET v = v + 1 WHERE k = 3"))
    assert(res.isFailure)
    val msg = res.failed.get.getMessage
    assert(msg.contains("t: array<struct<") && msg.contains("row-level SQL"),
      s"the plan-time gate must name the too-deep column: $msg")
    assert(graft.ops.VersionedTable.currentVersion(spark, s"$root/t")
      .contains(1L))
  }

  test("date / timestamp / decimal array elements run the DML lifecycle") {
    val root = TestSpark.tmpDir("r18elems")
    val df = spark.range(0L, 20L).toDF("k").select(col("k"),
      array(date_add(lit(java.sql.Date.valueOf("2026-01-01")),
        col("k").cast("int"))).as("ds"),
      array(to_timestamp(lit("2026-01-01 00:00:00")) +
        expr("make_interval(0,0,0,0,0,0,k)")).as("ts"),
      array((col("k") * 100).cast("decimal(12,2)"),
        lit(null).cast("decimal(12,2)")).as("dec"),
      (col("k") * 2).as("v"))
    graft.ops.VersionedTable.write(df, s"$root/t")
    val cat = registerCat(root, "elems")
    // UPDATE transforms every element family through GroupWrite
    spark.sql(s"UPDATE $cat.t SET " +
      "ds = transform(ds, x -> date_add(x, 7)), " +
      "ts = transform(ts, x -> x + INTERVAL 1 MINUTE), " +
      "dec = transform(dec, x -> x + CAST(0.25 AS DECIMAL(12,2))) " +
      "WHERE k % 2 = 0")
    // DV DELETE, then MERGE inserting fresh rows of every family
    spark.sql(s"DELETE FROM $cat.t WHERE k >= 15 AND k <= 17")
    spark.sql(s"""SELECT 100L AS k,
      |  array(DATE'2030-06-01') AS ds,
      |  array(TIMESTAMP'2030-06-01 12:00:00') AS ts,
      |  array(CAST(9.75 AS DECIMAL(12,2))) AS dec, 0L AS v
      |""".stripMargin).createOrReplaceTempView("r18_elem_src")
    spark.sql(s"""MERGE INTO $cat.t t USING r18_elem_src s ON t.k = s.k
      |WHEN MATCHED THEN UPDATE SET v = s.v
      |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val got = spark.sql(s"SELECT k, ds[0] AS d0, ts[0] AS t0, " +
      s"dec[0] AS c0, get(dec, 1) AS c1 FROM $cat.t").collect()
      .map(r => (r.getLong(0), r.getDate(1).toString,
        r.getTimestamp(2).toString,
        Option(r.getDecimal(3)).map(_.toPlainString),
        Option(r.getDecimal(4)).map(_.toPlainString)))
      .sortBy(_._1).toSeq
    val want = ((0L until 20L).filterNot(k => k >= 15 && k <= 17).map { k =>
      val shift = if (k % 2 == 0) 7 else 0
      val d = java.time.LocalDate.of(2026, 1, 1).plusDays(k + shift)
      val t = java.time.LocalDateTime.of(2026, 1, 1, 0, 0, 0)
        .plusSeconds(k).plusMinutes(if (k % 2 == 0) 1 else 0)
      val c = BigDecimal(k * 100) + (if (k % 2 == 0) BigDecimal("0.25")
        else BigDecimal(0))
      (k, d.toString,
        java.sql.Timestamp.valueOf(t).toString,
        Some(c.setScale(2).bigDecimal.toPlainString),
        None: Option[String])
    } :+ ((100L, "2030-06-01", "2030-06-01 12:00:00.0",
      Some("9.75"), None: Option[String]))).sortBy(_._1)
    assert(got == want, s"element families diverged:\n got ${got.take(4)}\n" +
      s" want ${want.take(4)}")
  }

  test("struct-field widening DDL: narrowing / unknown field / non-struct " +
      "targets refuse with no commit") {
    import graft.ops.{TypeWidening => TW, VersionedTable => VT}
    val root = TestSpark.tmpDir("r18sw")
    val dir = s"$root/w"
    val base = spark.range(0L, 10L).toDF("k")
      .select(col("k"), struct(lit("x").as("t"),
        col("k").cast("int").as("n")).as("m"), col("k").cast("long").as("v"))
    TW.init(base, dir)
    val cat = registerCat(root, "sw")
    // the happy path: one metadata-only commit
    spark.sql(s"ALTER TABLE $cat.w ALTER COLUMN m.n TYPE BIGINT")
    assert(VT.currentVersion(spark, dir).contains(2L))
    assert(spark.sql(s"SELECT sum(m.n) FROM $cat.w").head.getLong(0) == 45L)
    def refused(sql: String, needle: String): Unit = {
      val before = VT.currentVersion(spark, dir)
      val res = scala.util.Try(spark.sql(sql))
      assert(res.isFailure, s"must refuse: $sql")
      assert(res.failed.get.getMessage.contains(needle),
        s"refusal for [$sql] must mention '$needle': " +
          res.failed.get.getMessage)
      assert(VT.currentVersion(spark, dir) == before,
        s"refused DDL must not commit: $sql")
    }
    // narrowing: Spark's OWN analyzer refuses BIGINT->INT on a resolved
    // field before the catalog sees it; the matrix backstops the ops API
    // (the rename probe below) and the unresolvable-field/odd-target
    // shapes fail at analysis — every path must refuse with NO commit
    refused(s"ALTER TABLE $cat.w ALTER COLUMN m.n TYPE INT", "m")
    refused(s"ALTER TABLE $cat.w ALTER COLUMN m.zz TYPE BIGINT", "zz")
    refused(s"ALTER TABLE $cat.w ALTER COLUMN v.n TYPE BIGINT", "v")
    // field rename-by-arity cannot be expressed through the field DDL;
    // the ops API refuses a renamed struct from the matrix
    val renamed = StructType(Seq(StructField("tt", StringType),
      StructField("n", LongType)))
    val res = scala.util.Try(TW.widen(spark, dir, "m", renamed))
    assert(res.isFailure &&
      res.failed.get.getMessage.contains("not a lossless widening"),
      "a field rename must refuse from the matrix")
  }

  // ---- array-of-struct across every layout the structs got in r17 ----

  private def turnsDf(rows: Seq[(Long, Seq[(String, Long)])]) = {
    val flat = rows.flatMap { case (k, ts) =>
      if (ts.isEmpty) Seq((k, null.asInstanceOf[String], 0L, true))
      else ts.map { case (ro, sc) => (k, ro, sc, false) }
    }
    flat.toDF("k", "role", "score", "empty")
      .groupBy(col("k"))
      .agg(when(max(col("empty")), array().cast(
        "array<struct<role:string,score:bigint>>"))
        .otherwise(collect_list(struct(col("role"), col("score"))))
        .as("turns"))
  }

  test("log-layout SQL UPDATE rewrites array-of-struct columns " +
      "(GraftLogCowScan path)") {
    val root = TestSpark.tmpDir("r18turnslog")
    val dir = s"$root/t"
    graft.ops.ActionLog.append(
      spark.range(0L, 20L).toDF("k")
        .withColumn("turns", array(
          struct(lit("u").as("role"), (col("k") * 10).as("score")),
          struct(lit("a").as("role"), (col("k") * 10 + 1).as("score"))))
        .coalesce(2),
      dir, Some("k"))
    val cat = registerCat(root, "tlog")
    spark.sql(s"UPDATE $cat.t SET turns = transform(turns, x -> " +
      "named_struct('role', x.role, 'score', x.score + 1000L)) WHERE k < 5")
    val got = spark.sql(
      s"SELECT sum(aggregate(turns, 0L, (a, x) -> a + x.score)) FROM $cat.t")
      .head.getLong(0)
    val base = (0L until 20L).map(k => k * 10 + k * 10 + 1).sum
    assert(got == base + 5 * 2 * 1000)
    val live = graft.ops.ActionLog.liveFiles(spark, dir)
    assert(live.nonEmpty && live.forall(_._2.isDefined),
      s"log COW over arrays-of-structs must keep per-file stats: $live")
  }

  test("CDF stream carries array-of-struct columns (the row " +
      "materializer's struct-element path)") {
    import graft.ops.{ChangeFeed, VersionedTable}
    val root = TestSpark.tmpDir("r18turnstream") + "/t"
    VersionedTable.write(turnsDf(Seq(
      1L -> Seq("u" -> 10L), 2L -> Seq("u" -> 20L, "a" -> 21L))), root)
    ChangeFeed.commit(turnsDf(Seq(
      1L -> Seq("u" -> 10L, "a" -> 99L), // k=1 gains a turn
      2L -> Seq("u" -> 20L, "a" -> 21L),
      3L -> Seq.empty)), // k=3 inserts an EMPTY array
      root, Seq("k"))
    val got = collection.mutable.ArrayBuffer.empty[(Long, Int, Long, String)]
    val q = graft.source.CdfStream.read(spark, root, startingVersion = Some(1L))
      .writeStream
      .option("checkpointLocation", TestSpark.tmpDir("r18turnstream-ckpt"))
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.select(col("k"), size(col("turns")),
          coalesce(expr("aggregate(turns, 0L, (a, x) -> a + x.score)"),
            lit(-1L)), col(ChangeFeed.ChangeType)).collect()
          .foreach(r => got.synchronized {
            got += ((r.getLong(0), r.getInt(1), r.getLong(2), r.getString(3)))
          })
      }.start()
    try q.processAllAvailable() finally q.stop()
    val rows = got.toSeq
    assert(rows.exists(r => r._1 == 1L && r._4 == "update_postimage" &&
      r._2 == 2 && r._3 == 109L),
      s"the post-image must carry the grown turn list: $rows")
    assert(rows.exists(r => r._1 == 3L && r._4 == "insert" && r._2 == 0),
      s"the insert must carry its EMPTY array distinctly: $rows")
  }

  test("array-of-struct passenger column rides the type-widening plane") {
    import graft.ops.{TypeWidening => TW}
    val root = TestSpark.tmpDir("r18turnstw")
    val dir = s"$root/w"
    val base = spark.range(0L, 10L).toDF("k")
      .select(col("k"), col("k").cast("int").as("a"),
        array(struct(lit("u").as("role"), col("k").as("score"))).as("turns"))
    TW.init(base, dir)
    val cat = registerCat(root, "ttw")
    spark.sql(s"ALTER TABLE $cat.w ALTER COLUMN a TYPE BIGINT") // v2
    // an epoch append AFTER the widen: the passenger crosses manifests
    spark.sql(s"INSERT INTO $cat.w SELECT k + 100, CAST(a AS BIGINT), " +
      s"turns FROM $cat.w")
    // cross-epoch COW UPDATE transforming the passenger
    spark.sql(s"UPDATE $cat.w SET turns = transform(turns, x -> " +
      "named_struct('role', 'z', 'score', x.score + 1L)) WHERE k % 2 = 0")
    val got = spark.sql(s"SELECT sum(aggregate(turns, 0L, " +
      s"(acc, x) -> acc + x.score)) FROM $cat.w").head.getLong(0)
    val want = (0L until 10L).flatMap(k => Seq(k, k))
      .sum + (0L until 10L).count(_ % 2 == 0) * 2 // +1 per even-k turn, both copies
    assert(got == want, s"passenger sum $got != $want")
    // AS-OF still renders v1 under its own manifest with the passenger
    assert(spark.sql(s"SELECT count(*) FROM $cat.w VERSION AS OF 1")
      .head.getLong(0) == 10L)
  }

  test("nested schema pruning clips the columnar read: struct children " +
      "and array-element children") {
    val root = TestSpark.tmpDir("r18clip")
    graft.ops.VersionedTable.write(
      spark.range(0L, 100L).toDF("k").select(col("k"),
        struct(lit("s").as("src"), (col("k") * 10).as("n"),
          (col("k") % 2 === 0).as("ok")).as("meta"),
        array(struct(lit("u").as("role"), col("k").as("score")),
          struct(lit("a").as("role"), (col("k") + 1).as("score")))
          .as("turns")),
      s"$root/t")
    val cat = registerCat(root, "clip")
    // struct child: Spark prunes meta -> struct<n>; the clipped parquet
    // group must produce a matching vector (round-18: unclipped groups
    // hard-failed the type check)
    assert(spark.sql(s"SELECT sum(meta.n) FROM $cat.t").head.getLong(0) ==
      (0L until 100L).map(_ * 10).sum)
    // array-element child: turns.role extracts one field through the list
    val roles = spark.sql(s"SELECT turns.role AS r FROM $cat.t WHERE k = 7")
      .head.getSeq[String](0)
    assert(roles == Seq("u", "a"), s"pruned element child read: $roles")
    // and a pruned read that also needs the partner field elsewhere in
    // the plan still resolves (prune-to-subset, not prune-to-one)
    assert(spark.sql(s"SELECT sum(aggregate(turns, 0L, (a, x) -> " +
      s"a + x.score)) FROM $cat.t").head.getLong(0) ==
      (0L until 100L).map(k => k + k + 1).sum)
  }

  test("column-mapping rename over an array-of-struct column reads " +
      "through the nameMap") {
    import graft.ops.{ColumnMapping => CM}
    val root = TestSpark.tmpDir("r18turnsmap")
    val dir = s"$root/t"
    CM.writeData(spark.range(0L, 10L).toDF("k")
      .withColumn("turns", array(struct(lit("u").as("role"),
        (col("k") * 2).as("score")))), dir)
    val cat = registerCat(root, "tmap")
    spark.sql(s"ALTER TABLE $cat.t RENAME COLUMN turns TO convo")
    assert(spark.sql(s"SELECT sum(aggregate(convo, 0L, " +
      s"(a, x) -> a + x.score)) FROM $cat.t").head.getLong(0) ==
      (0L until 10L).map(_ * 2).sum)
    assert(CM.read(spark, dir).columns.contains("convo"))
  }

  test("row-level SQL on a FEED-TRACKED table captures array-of-struct " +
      "pre/post images") {
    import graft.ops.ChangeFeed
    val root = TestSpark.tmpDir("r18turnscdf")
    val dir = s"$root/t"
    def df(rows: Seq[(Long, Long)]) = rows.toDF("k", "s")
      .select(col("k"), array(struct(lit("u").as("role"),
        col("s").as("score"))).as("turns"))
    ChangeFeed.commit(df(Seq(1L -> 10L, 2L -> 20L)), dir, Seq("k")) // v1
    val cat = registerCat(root, "tcdf")
    // the GroupBatchWrite _cdf capture path (not ChangeFeed.commit's):
    // a row-level SQL UPDATE transforming turns on a tracked table
    spark.sql(s"UPDATE $cat.t SET turns = transform(turns, x -> " +
      "named_struct('role', 'a', 'score', x.score * 10L)) WHERE k = 1")
    val changes = ChangeFeed.tableChanges(spark, dir, 1L, 2L, Seq("k"))
      .select(col("k"), expr("aggregate(turns, 0L, (a, x) -> a + x.score)"),
        col("turns")(0).getField("role"), col(ChangeFeed.ChangeType))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3)))
      .toSeq
    assert(changes.contains((1L, 10L, "u", "update_preimage")) &&
      changes.contains((1L, 100L, "a", "update_postimage")),
      s"turn pre/post images must ride the capture: $changes")
    assert(!changes.exists(_._1 == 2L),
      s"the untouched row must not capture: $changes")
  }

  test("branch merge reconciles disjoint turn edits; a turn conflict " +
      "fails loudly") {
    import graft.ops.Branching
    val root = TestSpark.tmpDir("r18turnsbr")
    val dir = s"$root/t"
    def df(vals: Map[Long, Long]) = vals.toSeq.toDF("k", "s")
      .select(col("k"), array(struct(lit("u").as("role"),
        col("s").as("score"))).as("turns"))
    val base = Map(1L -> 10L, 2L -> 20L, 3L -> 30L)
    Branching.init(df(base), dir)
    Branching.branch(spark, dir, "main", "dev")
    Branching.commitOn(df(base + (1L -> 11L)), dir, "dev")
    Branching.commitOn(df(base + (2L -> 22L)), dir, "main")
    val Branching.Merged(_) =
      Branching.merge(spark, dir, "dev", "main", Seq("k")): @unchecked
    val got = Branching.readBranch(spark, dir, "main")
      .select(col("k"), col("turns")(0).getField("score"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 11L, 2L -> 22L, 3L -> 30L),
      s"both sides' turn edits must land: $got")
    // true conflict: the SAME key's turns edited differently on both sides
    Branching.branch(spark, dir, "main", "exp")
    Branching.commitOn(df(base + (1L -> 11L) + (2L -> 22L) + (3L -> 77L)),
      dir, "exp")
    Branching.commitOn(df(base + (1L -> 11L) + (2L -> 22L) + (3L -> 88L)),
      dir, "main")
    val res = scala.util.Try(
      Branching.merge(spark, dir, "exp", "main", Seq("k")))
    assert(res.isFailure, "a same-key turn conflict must refuse the merge")
  }

  test("array<decimal> element widening via the DDL lift reads mixed " +
      "INT32/INT64 physical epochs") {
    import graft.ops.{TypeWidening => TW, VersionedTable => VT}
    val root = TestSpark.tmpDir("r18decarr")
    val dir = s"$root/w"
    val base = spark.range(0L, 12L).toDF("k")
      .select(col("k"), array((col("k") * 100).cast("decimal(6,2)"),
        lit(null).cast("decimal(6,2)")).as("d"))
    TW.init(base, dir) // v1: decimal(6,2) elements ride INT32 physically
    val cat = registerCat(root, "decarr")
    spark.sql(s"ALTER TABLE $cat.w ALTER COLUMN d.element TYPE DECIMAL(14,2)")
    require(VT.currentVersion(spark, dir).contains(2L),
      "the element widen must be one metadata-only commit")
    // v3: an INT64-physical epoch whose values exceed decimal(6,2)
    spark.sql(s"INSERT INTO $cat.w SELECT k + 100, " +
      s"array(CAST(123456789012.34 AS DECIMAL(14,2)), " +
      s"CAST(NULL AS DECIMAL(14,2))) FROM $cat.w")
    // v4: a COW UPDATE crossing both physical epochs through GroupWrite
    spark.sql(s"UPDATE $cat.w SET d = transform(d, x -> " +
      s"x + CAST(0.25 AS DECIMAL(14,2))) WHERE k % 2 = 0")
    val got = spark.sql(s"SELECT sum(aggregate(d, CAST(0 AS DECIMAL(20,2)), " +
      s"(a, x) -> CAST(a + coalesce(x, CAST(0 AS DECIMAL(20,2))) " +
      s"AS DECIMAL(20,2)))) FROM $cat.w").head.getDecimal(0)
    val small = (0L until 12L).map(k => BigDecimal(k * 100)).sum
    val big = BigDecimal("123456789012.34") * 12
    val bumps = BigDecimal("0.25") *
      ((0L until 12L).count(_ % 2 == 0) + (100L until 112L).count(_ % 2 == 0))
    assert(BigDecimal(got) == small + big + bumps,
      s"mixed-epoch decimal array sum: $got")
    // v1 still renders under its own (6,2) manifest
    assert(TW.typesOf(spark, dir, 1L).toMap.apply("d") ==
      ArrayType(DecimalType(6, 2)), "the pre-widen manifest must survive")
    assert(spark.sql(s"SELECT count(*) FROM $cat.w VERSION AS OF 1")
      .head.getLong(0) == 12L)
  }

  test("maintenance reaches SQL: CALL system.checkpoint / optimize / " +
      "vacuum return their accounting") {
    import graft.ops.ActionLog
    val root = TestSpark.tmpDir("r18proc")
    val dir = s"$root/t"
    // overlapping appends + a rewrite below the horizon = optimize and
    // vacuum both have real work
    (0 until 3).foreach { i =>
      ActionLog.append((0L until 30L by 3L).map(j => (j + i, j))
        .toDF("k", "v").coalesce(1), dir, Some("k"))
      ()
    }
    val cat = registerCat(root, "proc")
    val before = ActionLog.read(spark, dir).localCheckpoint()
    val ck = spark.sql(s"CALL $cat.system.checkpoint(table => 't')")
      .head.getLong(0)
    assert(ck == 3L, s"checkpoint must stamp the head version: $ck")
    val opt = spark.sql(s"CALL $cat.system.optimize(table => 't')").head
    assert(opt.getLong(0) == 4L && opt.getLong(1) == 3L &&
      opt.getString(3) == "distributed",
      s"optimize must rewrite the 3-file overlap cluster: $opt")
    // keep=1: the horizon is the optimize commit itself, so the three
    // replaced originals are unreferenced by every retained version
    val vac = spark.sql(s"CALL $cat.system.vacuum(table => 't', " +
      "keep => 1, grace_ms => CAST(0 AS BIGINT), distributed => true)").head
    assert(vac.getLong(0) == 3L && vac.getLong(1) == 3L &&
      vac.getString(2) == "distributed",
      s"vacuum must expire v1-v3 and sweep the three originals: $vac")
    assert(graft.queries.Q.sameMultiset(ActionLog.read(spark, dir), before),
      "SQL maintenance must never change live content")
    // discovery + refusal
    assert(spark.sql(s"SHOW PROCEDURES IN $cat.system")
      .select(col("procedure_name")).collect()
      .map(_.getString(0)).toSet == Set("vacuum", "optimize", "checkpoint",
        "create_branch", "merge_branch"))
    // Spark wraps the catalog's refusal as FAILED_TO_LOAD_ROUTINE with
    // the full routine path — refusal by name either way
    val bad = scala.util.Try(spark.sql(s"CALL $cat.system.nope(table => 't')"))
    assert(bad.isFailure && bad.failed.get.getMessage.contains("nope"),
      s"an unknown procedure must refuse by name: " +
        bad.failed.map(_.getMessage))
    // WRONG-LAYOUT calls refuse loudly, never silently no-op: vacuum on
    // a VERSIONED table used to read as a (0, 0) "success"
    val vroot = TestSpark.tmpDir("r18procv")
    graft.ops.VersionedTable.write(
      Seq((1L, 10L)).toDF("k", "v"), s"$vroot/t")
    val vcat = registerCat(vroot, "procv")
    val wrongV = scala.util.Try(
      spark.sql(s"CALL $vcat.system.vacuum(table => 't')"))
    assert(wrongV.isFailure &&
      wrongV.failed.get.getMessage.contains("not a log-structured"),
      s"vacuum on a versioned table must refuse by layout: " +
        wrongV.failed.map(_.getMessage))
    val wrongB = scala.util.Try(spark.sql(
      s"CALL $vcat.system.create_branch(table => 't', name => 'x')"))
    assert(wrongB.isFailure &&
      wrongB.failed.get.getMessage.contains("not a branched"),
      s"create_branch on an unbranched table must refuse by layout")
  }

  test("optimizeClusteredDistributed matches the driver form and " +
      "converges under the per-pass cap") {
    import graft.ops.ActionLog
    // four appends whose key ranges all interleave: one 4-file cluster
    def build(dir: String): Unit = (0 until 4).foreach { i =>
      ActionLog.append((0L until 40L by 4L).map(j => (j + i, (j + i) * 10))
        .toDF("k", "v").coalesce(1), dir, Some("k"))
      ()
    }
    val dirA = TestSpark.tmpDir("r18optA") + "/t"
    val dirB = TestSpark.tmpDir("r18optB") + "/t"
    build(dirA); build(dirB)
    val (vA, tgtA, carriedA) = ActionLog.optimizeClustered(spark, dirA)
    val (vB, tgtB, totalB) = ActionLog.optimizeClusteredDistributed(
      spark, dirB)
    assert(vA > 0 && vB > 0)
    assert(tgtA.size == 4 && tgtB.size == 4 && carriedA.isEmpty &&
      totalB == 4L,
      s"both forms must target the whole 4-file cluster: " +
        s"driver ${tgtA.size}, distributed ${tgtB.size}/$totalB")
    assert(graft.queries.Q.sameMultiset(ActionLog.read(spark, dirA),
      ActionLog.read(spark, dirB)), "rewritten content diverged")
    assert(ActionLog.clusterTargetsDf(spark, dirB, 100)._2 == 0L,
      "the distributed rewrite must leave zero overlapping files")
    // two DISJOINT 2-file clusters + a cap of 2: whole-cluster rounds,
    // repeated passes converge to zero overlap
    val dirC = TestSpark.tmpDir("r18optC") + "/t"
    (0 until 2).foreach { i =>
      ActionLog.append((0L until 20L by 2L).map(j => (j + i, j))
        .toDF("k", "v").coalesce(1), dirC, Some("k"))
      ActionLog.append((1000L until 1020L by 2L).map(j => (j + i, j))
        .toDF("k", "v").coalesce(1), dirC, Some("k"))
    }
    val before = ActionLog.read(spark, dirC).localCheckpoint()
    val (v1, t1, tot1) = ActionLog.optimizeClusteredDistributed(spark, dirC,
      maxFilesPerPass = 2)
    assert(v1 > 0 && t1.size == 2 && tot1 == 4L,
      s"pass 1 must take ONE whole cluster of the two: ${t1.size}/$tot1")
    val (v2, t2, tot2) = ActionLog.optimizeClusteredDistributed(spark, dirC,
      maxFilesPerPass = 2)
    assert(v2 > 0 && t2.size == 2 && tot2 == 2L,
      s"pass 2 must take the deferred cluster: ${t2.size}/$tot2")
    val (v3, t3, tot3) = ActionLog.optimizeClusteredDistributed(spark, dirC,
      maxFilesPerPass = 2)
    assert(v3 == -1L && t3.isEmpty && tot3 == 0L,
      s"pass 3 must be a commit-free no-op: ($v3, ${t3.size}, $tot3)")
    assert(graft.queries.Q.sameMultiset(ActionLog.read(spark, dirC), before),
      "convergence must preserve content")
  }

  test("the WAP cycle runs entirely in SQL: fork, write@branch, audit, " +
      "publish") {
    import graft.ops.Branching
    val root = TestSpark.tmpDir("r18wap")
    val dir = s"$root/t"
    Branching.init(Seq((1L, 10L), (2L, 20L)).toDF("k", "v"), dir)
    val cat = registerCat(root, "wap")
    // fork
    assert(spark.sql(s"CALL $cat.system.create_branch(table => 't', " +
      "name => 'staging')").head.getLong(0) >= 1L)
    // write to the branch ref (the existing t@branch SQL surface)
    spark.sql(s"INSERT INTO $cat.`t@staging` VALUES (3L, 30L)")
    // audit: the branch sees the staged row, main does not
    assert(spark.sql(s"SELECT count(*) FROM $cat.`t@staging`")
      .head.getLong(0) == 3L)
    assert(spark.sql(s"SELECT count(*) FROM $cat.t").head.getLong(0) == 2L)
    // publish: main never moved -> fast-forward
    val ff = spark.sql(s"CALL $cat.system.merge_branch(table => 't', " +
      "from_branch => 'staging', keys => 'k')").head
    assert(ff.getString(0) == "fast-forward", s"publish outcome: $ff")
    assert(spark.sql(s"SELECT sum(v) FROM $cat.t").head.getLong(0) == 60L)
    // diverged sides -> a real keyed merge
    spark.sql(s"CALL $cat.system.create_branch(table => 't', " +
      "name => 'exp')")
    spark.sql(s"INSERT INTO $cat.`t@exp` VALUES (4L, 40L)")
    spark.sql(s"INSERT INTO $cat.t VALUES (5L, 50L)")
    val m = spark.sql(s"CALL $cat.system.merge_branch(table => 't', " +
      "from_branch => 'exp', keys => 'k')").head
    assert(m.getString(0) == "merged", s"diverged publish outcome: $m")
    assert(spark.sql(s"SELECT sum(v) FROM $cat.t").head.getLong(0) == 150L)
  }

  test("distributed optimize commutes with a concurrent append " +
      "(the q309 rule on the distributed claim loop)") {
    import graft.ops.ActionLog
    val dir = TestSpark.tmpDir("r18optcc") + "/t"
    (0 until 3).foreach { i =>
      ActionLog.append((0L until 30L by 3L).map(j => (j + i, j))
        .toDF("k", "v").coalesce(1), dir, Some("k"))
      ()
    }
    val before = ActionLog.read(spark, dir).localCheckpoint()
    val extra = Seq((1000L, 1L), (1001L, 2L))
    // the hook fires between staging and the claim loop: the append
    // claims v4, the optimize must retry and land v5 with the appended
    // file carried live — never clobbered, never double-counted
    val (v, rw, _) = ActionLog.optimizeClusteredDistributed(spark, dir,
      hook = () => {
        ActionLog.append(extra.toDF("k", "v").coalesce(1), dir, Some("k"))
        ()
      })
    assert(v == 5L, s"the optimize must claim AFTER the concurrent append: $v")
    assert(rw.size == 3, s"only the pre-append cluster rewrites: ${rw.size}")
    val after = ActionLog.read(spark, dir)
    assert(graft.queries.Q.sameMultiset(after,
      before.unionByName(extra.toDF("k", "v"))),
      "the concurrent append must survive the optimize exactly once")
  }

  test("vacuumDistributed matches the driver vacuum on the same history") {
    import graft.ops.ActionLog
    def build(dir: String): Unit = {
      (1 to 3).foreach(i => ActionLog.append(
        Seq((i.toLong, i * 10L)).toDF("k", "v").coalesce(1), dir, Some("k")))
      // a rewrite BELOW the eventual horizon: v3's original file becomes
      // unreferenced by every retained version — the victim
      val target = ActionLog.resolve(spark, dir, 3L)._1
        .diff(ActionLog.resolve(spark, dir, 2L)._1)
      ActionLog.replaceFiles(spark, dir, // v4
        Seq(target.head), Seq((3L, 999L)).toDF("k", "v").coalesce(1),
        Some("k"))
      (4 to 5).foreach(i => ActionLog.append( // v5, v6
        Seq((i.toLong, i * 10L)).toDF("k", "v").coalesce(1), dir, Some("k")))
      ()
    }
    val dirA = TestSpark.tmpDir("r18vacA") + "/t"
    val dirB = TestSpark.tmpDir("r18vacB") + "/t"
    build(dirA); build(dirB)
    val (expA, vicA) = ActionLog.vacuum(spark, dirA, keepVersions = 2,
      graceMs = 0L)
    val (expB, vicB) = ActionLog.vacuumDistributed(spark, dirB,
      keepVersions = 2, graceMs = 0L, listBatch = 2)
    assert((expA.toLong, vicA.toLong) == (expB, vicB),
      s"vacuum forms diverged: driver ($expA, $vicA) vs " +
        s"distributed ($expB, $vicB)")
    assert(vicB >= 1L, "the rewrite must have produced at least one victim")
    def state(dir: String): (Seq[Long], Seq[(Long, Long)]) = (
      ActionLog.versions(spark, dir),
      ActionLog.read(spark, dir).as[(Long, Long)].collect().sorted.toSeq)
    assert(state(dirA)._1 == state(dirB)._1, "retained versions diverged")
    assert(state(dirA)._2 == state(dirB)._2, "live content diverged")
    assert(state(dirB)._2 == Seq((1L, 10L), (2L, 20L), (3L, 999L),
      (4L, 40L), (5L, 50L)))
    // both forms leave the same number of physical data files
    def nFiles(dir: String): Int = {
      val p = new org.apache.hadoop.fs.Path(s"$dir/data")
      p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .listStatus(p).count(_.isFile)
    }
    assert(nFiles(dirA) == nFiles(dirB), "on-disk file counts diverged")
  }
}
