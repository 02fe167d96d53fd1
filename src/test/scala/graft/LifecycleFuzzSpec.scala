package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.collection.mutable
import scala.util.Random

import graft.ops.{ActionLog, ChangeFeed, VersionedTable}

/** Seeded random DML-lifecycle fuzzer — the generalization of the
  * round-13 lesson. That escape (pruned-COW row loss) hid because every
  * fixture exercised ONE hand-picked statement against ONE hand-picked
  * layout; the bug class only surfaces under a sequence nobody wrote.
  * This spec drives an arbitrary (but seed-deterministic) interleaving
  * of INSERT / UPDATE / DELETE / MERGE (with and without a DELETE
  * clause) / INSERT OVERWRITE / maintenance through the SQL catalog on
  * BOTH table layouts (action-log and versioned-snapshot), checking
  * after every statement that:
  *
  *   - live content equals an in-memory model (full multiset, nulls
  *     included — the round-14 NULL-clobber class is in scope);
  *   - any model change minted a strictly newer version (a content
  *     change without a commit would silently corrupt time travel);
  *   - the log layout keeps a contiguous version history and never
  *     loses per-file stats through a rewrite (q317's invariant, held
  *     under arbitrary op order, not one scripted sequence);
  *
  * and at the end that `VERSION AS OF v` renders the EXACT model
  * snapshot recorded when v was committed, for every version the run
  * produced. The initial data is written key-local across ≥3 files on
  * both layouts — the adversarial shape that turns stats-pruned-scan
  * bugs into row loss rather than silence.
  */
class LifecycleFuzzSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** (k, v, s): one table row as the model sees it. */
  private type Row3 = (Long, Long, Option[String])

  /** Spark caches catalog plugin instances BY NAME for the session's
    * lifetime, so a reused name silently pins the FIRST registration's
    * root — every registration here gets a fresh name.
    */
  private val catN = new java.util.concurrent.atomic.AtomicInteger(0)
  private def registerCat(root: String, tag: String): String = {
    val cat = s"graftfz${tag}n${catN.incrementAndGet()}"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.source.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    spark.conf.set(s"spark.sql.catalog.$cat.features", "deletion-vectors")
    cat
  }

  private def genS(r: Random): Option[String] =
    if (r.nextInt(4) == 0) None else Some("s" + r.nextInt(5))

  /** A random predicate as (SQL text, model row test) — the pair MUST
    * agree; that agreement is what the engine is being tested against.
    */
  private def genPred(r: Random, keys: Seq[Long]): (String, Row3 => Boolean) =
    r.nextInt(6) match {
      case 0 =>
        val x = if (keys.nonEmpty && r.nextBoolean()) keys(r.nextInt(keys.size))
                else 777777L // a deliberate miss: empty-match DML is in scope
        (s"k = $x", t => t._1 == x)
      case 1 =>
        val a = r.nextInt(250) * 5L
        val b = a + r.nextInt(40) * 5L
        (s"k BETWEEN $a AND $b", t => t._1 >= a && t._1 <= b)
      case 2 =>
        val m = 2 + r.nextInt(5); val c = r.nextInt(m)
        (s"k % $m = $c", t => t._1 % m == c)
      case 3 =>
        val m = 2 + r.nextInt(5); val c = r.nextInt(m)
        (s"v % $m = $c", t => t._2 % m == c)
      case 4 =>
        ("s IS NULL", t => t._3.isEmpty)
      case _ =>
        val m = 2 + r.nextInt(4); val c = r.nextInt(m)
        (s"k % $m = $c AND s IS NOT NULL",
          t => t._1 % m == c && t._3.nonEmpty)
    }

  /** The shared random-DML driver: one `step` is one SQL statement
    * against `cat.t` (INSERT / UPDATE / DELETE / MERGE / OVERWRITE),
    * applied to the in-memory model in the same breath. The layout
    * campaigns and the streaming fuzz share it so every surface is
    * fuzzed by the same op distribution.
    */
  private final class DmlDriver(r: Random, cat: String, view: String,
      val model: mutable.SortedMap[Long, (Long, Option[String])]) {
    var nextKey = 1000L
    def freshRows(n: Int): Seq[Row3] = (0 until n).map { _ =>
      val k = nextKey; nextKey += 1 + r.nextInt(3)
      (k, r.nextInt(1000).toLong, genS(r))
    }

    def step(pick: Int, i: Int): String =
      if (pick < 20) { // ---- INSERT INTO (fresh keys only)
        val rows = freshRows(3 + r.nextInt(5))
        rows.toDF("k", "v", "s").createOrReplaceTempView(view)
        spark.sql(s"INSERT INTO $cat.t SELECT k, v, s FROM $view")
        rows.foreach { case (k, v, s) => model(k) = (v, s) }
        s"INSERT ${rows.size} rows"
      } else if (pick < 45) { // ---- UPDATE
        val (pred, hit) = genPred(r, model.keys.toSeq)
        val (set, fn) = genSet(r, i)
        spark.sql(s"UPDATE $cat.t SET $set WHERE $pred")
        model.toSeq.foreach { case (k, (v, s)) =>
          if (hit((k, v, s))) model(k) = fn((k, v, s))
        }
        s"UPDATE SET $set WHERE $pred"
      } else if (pick < 60) { // ---- DELETE (never emptying the table:
        // an empty live set is a separate contract, not this fuzz)
        val (pred, hit) = genPred(r, model.keys.toSeq)
        val doomed = model.toSeq.collect {
          case (k, (v, s)) if hit((k, v, s)) => k
        }
        if (doomed.size < model.size) {
          spark.sql(s"DELETE FROM $cat.t WHERE $pred")
          doomed.foreach(model.remove)
          s"DELETE WHERE $pred (${doomed.size} rows)"
        } else s"skipped DELETE WHERE $pred (would empty the table)"
      } else if (pick < 80) { // ---- MERGE (upsert, 40% with a DELETE
        // clause — clause ORDER is part of the contract under test)
        val matched = r.shuffle(model.keys.toSeq).take(math.min(4, model.size))
        val src = matched.map(k => (k, r.nextInt(1000).toLong, genS(r))) ++
          freshRows(1 + r.nextInt(3))
        val withDelete = r.nextInt(100) < 40
        src.toDF("k", "v", "s").createOrReplaceTempView(view)
        val delClause =
          if (withDelete) "WHEN MATCHED AND u.v % 3 = 0 THEN DELETE\n" else ""
        spark.sql(
          s"""MERGE INTO $cat.t t USING $view u ON t.k = u.k
             |$delClause
             |WHEN MATCHED THEN UPDATE SET v = u.v, s = u.s
             |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
        src.foreach { case (k, v, s) =>
          if (model.contains(k)) {
            if (withDelete && v % 3 == 0) model.remove(k)
            else model(k) = (v, s)
          } else model(k) = (v, s)
        }
        s"MERGE ${src.size} src rows${if (withDelete) " +DELETE clause" else ""}"
      } else { // ---- INSERT OVERWRITE (whole-table rewrite)
        val rows = model.toSeq.map { case (k, (v, s)) => (k, v + 1, s) }
        rows.toDF("k", "v", "s").createOrReplaceTempView(view)
        spark.sql(s"INSERT OVERWRITE $cat.t SELECT k, v, s FROM $view")
        rows.foreach { case (k, v, s) => model(k) = (v, s) }
        "OVERWRITE whole table (v+1)"
      }
  }

  /** A random SET list as (SQL text, model row transform). */
  private def genSet(r: Random, i: Int): (String, Row3 => (Long, Option[String])) =
    r.nextInt(5) match {
      case 0 => val c = 1 + r.nextInt(9)
        (s"v = v + $c", t => (t._2 + c, t._3))
      case 1 => ("v = k % 97", t => (t._1 % 97, t._3))
      case 2 => (s"s = 'u$i'", t => (t._2, Some(s"u$i")))
      case 3 => ("s = CAST(NULL AS STRING)", t => (t._2, None))
      case _ => (s"v = v * 2, s = 'w$i'", t => (t._2 * 2, Some(s"w$i")))
    }

  /** Returns the op-family coverage tally so each test can assert its
    * seed actually exercised the families it exists to fuzz — a fixed
    * seed that never rolls an op family is silent non-coverage.
    */
  private def campaign(flavor: String, seed: Int,
      ops: Int): Map[String, Int] = {
    val r = new Random(seed)
    val root = TestSpark.tmpDir(s"fuzz_${flavor}_$seed")
    val dir = s"$root/t"
    val cat = registerCat(root, s"${flavor}$seed")
    val view = s"fuzz_src_${flavor}_$seed"
    val model = mutable.SortedMap.empty[Long, (Long, Option[String])]
    def modelSeq: Seq[Row3] =
      model.toSeq.map { case (k, (v, s)) => (k, v, s) }

    // ---- initial content: 40 keys across 3 KEY-LOCAL files (tight
    // per-file stats — the adversarial layout for pruning bugs)
    val init = (0 until 40).map(i => (i * 5L, r.nextInt(1000).toLong, genS(r)))
    init.foreach { case (k, v, s) => model(k) = (v, s) }
    flavor match {
      case "log" =>
        (0 to 2).foreach { b =>
          val part = init.filter(_._1 / 70L == b)
          ActionLog.append(part.toDF("k", "v", "s").coalesce(1), dir, Some("k"))
        }
      case "cdf" => // versioned layout with a recorded change feed: every
        // commit must carry (or derive) a capture the feed can replay
        ChangeFeed.commit(
          init.toDF("k", "v", "s").repartitionByRange(3, col("k")),
          dir, Seq("k"))
      case _ =>
        VersionedTable.write(
          init.toDF("k", "v", "s").repartitionByRange(3, col("k")), dir)
    }

    def curVersion: Long = flavor match {
      case "log" => ActionLog.versions(spark, dir).last
      case _ => VersionedTable.currentVersion(spark, dir).getOrElse(
        fail(s"[$flavor/$seed] no current version"))
    }
    def readRows(sql: String): Seq[Row3] =
      spark.sql(sql).collect()
        .map(row => (row.getLong(0), row.getLong(1), Option(row.getString(2))))
        .sortBy(_._1).toSeq
    def checkContent(tag: String): Unit = {
      val actual = readRows(s"SELECT k, v, s FROM $cat.t")
      val expect = modelSeq
      assert(actual == expect,
        s"[$flavor/$seed] $tag: live/model diverged\n" +
          s"  only-live : ${actual.diff(expect).take(8)}\n" +
          s"  only-model: ${expect.diff(actual).take(8)}")
    }

    val dml = new DmlDriver(r, cat, view, model)
    var maintN = 0 // maintenance arm cycles its variants: every third
    // maintenance roll is a vacuum, so coverage never hinges on one seed

    val snapshots = mutable.LinkedHashMap.empty[Long, Seq[Row3]]
    val tally = mutable.Map.empty[String, Int].withDefaultValue(0)
    var floor = 1L // oldest retained version (vacuum raises it)
    checkContent("initial")
    snapshots(curVersion) = modelSeq

    for (i <- 1 to ops) {
      val before = modelSeq
      val vBefore = curVersion
      val pick = r.nextInt(100)
      val desc: String =
        if (pick < 88) dml.step(pick, i)
        else { // ---- maintenance: must be content-invariant
          maintN += 1
          flavor match {
            case "log" => maintN % 4 match {
              case 1 => ActionLog.checkpoint(spark, dir); "checkpoint"
              case 2 => ActionLog.optimizeClustered(spark, dir)
                "optimizeClustered"
              case 3 =>
                val vNow = ActionLog.versions(spark, dir).last
                ActionLog.compactLog(spark, dir, floor, vNow)
                s"compactLog($floor,$vNow)"
              case _ =>
                val keep = 4 + r.nextInt(4)
                val (expired, _) =
                  ActionLog.vacuum(spark, dir, keep, graceMs = 0L)
                floor = ActionLog.versions(spark, dir).head
                s"vacuum(keep=$keep) expired=$expired floor=$floor"
            }
            case _ => "maintenance no-op (snapshot layout)"
          }
        }

      tally(desc.split("[ (]").head) += 1
      val vAfter = curVersion
      if (modelSeq != before) assert(vAfter > vBefore,
        s"[$flavor/$seed] op#$i $desc changed content without minting a " +
          s"version (still v$vBefore) — time travel is now corrupt")
      checkContent(s"op#$i $desc")
      if (flavor == "log") {
        assert(ActionLog.versions(spark, dir) == (floor to vAfter),
          s"[$flavor/$seed] op#$i $desc: version history not contiguous")
        assert(ActionLog.liveFiles(spark, dir).forall(_._2.isDefined),
          s"[$flavor/$seed] op#$i $desc: a rewrite dropped per-file stats")
      }
      if (flavor == "cdf" && vAfter > vBefore) {
        // the commit's change feed, folded over the pre-state, must
        // reproduce the post-state EXACTLY — whatever mix of captured
        // deltas, overwrite markers, and snapshot diffs the statements
        // left behind
        val changes = ChangeFeed.tableChanges(spark, dir, vBefore, vAfter,
          Seq("k"))
        val folded = ChangeFeed.apply(
          Some(before.toDF("k", "v", "s")), changes, Seq("k"))
          .select(col("k"), col("v"), col("s")).collect()
          .map(row => (row.getLong(0), row.getLong(1),
            Option(row.getString(2)))).sortBy(_._1).toSeq
        assert(folded == modelSeq,
          s"[$flavor/$seed] op#$i $desc: change feed v$vBefore->v$vAfter " +
            s"folded over the pre-state diverges from the post-state\n" +
            s"  only-folded: ${folded.diff(modelSeq).take(8)}\n" +
            s"  only-model : ${modelSeq.diff(folded).take(8)}")
      }
      snapshots(vAfter) = modelSeq
    }

    // ---- the full retained history replays: every retained version
    // renders exactly the model snapshot recorded at its commit; an
    // EXPIRED version may fail loudly but must never render silently
    // wrong rows
    val (expired, retained) = snapshots.toSeq.partition(_._1 < floor)
    retained.foreach { case (v, snap) =>
      val got = readRows(s"SELECT k, v, s FROM $cat.t VERSION AS OF $v")
      assert(got == snap,
        s"[$flavor/$seed] VERSION AS OF $v diverged from the snapshot " +
          s"recorded at commit time\n  only-live : ${got.diff(snap).take(8)}" +
          s"\n  only-model: ${snap.diff(got).take(8)}")
    }
    expired.foreach { case (v, snap) =>
      scala.util.Try(readRows(s"SELECT k, v, s FROM $cat.t VERSION AS OF $v"))
        .foreach(got => assert(got == snap,
          s"[$flavor/$seed] expired version $v must fail loudly or render " +
            "exactly — silently wrong rows are the one forbidden outcome"))
    }
    tally.toMap
  }

  private def assertCovered(tally: Map[String, Int],
      families: Seq[String]): Unit = {
    val missing = families.filterNot(f => tally.getOrElse(f, 0) > 0)
    assert(missing.isEmpty,
      s"seed never exercised op families $missing — re-seed or raise ops " +
        s"(coverage was $tally)")
  }

  /** The fuzzer must be a GUARD, not decoration: under the planted
    * round-13 defect (`graft.dev.unsafeRowLevelPruning=1` forwards the
    * statement's WHERE into the row-level scan's file pruning, silently
    * losing the pruned files' rows from the replacement snapshot) a
    * campaign on the key-local multi-file base must go red.
    */
  test("the fuzzer detects the planted round-13 pruned-COW bug") {
    sys.props("graft.dev.unsafeRowLevelPruning") = "1"
    try {
      val ex = intercept[Throwable] {
        campaign("snapshot", seed = 2502, ops = 22)
        ()
      }
      assert(Option(ex.getMessage).exists(m =>
        m.contains("diverged") || m.contains("only-model")),
        s"campaign must fail on live/model divergence, failed with: $ex")
    } finally { sys.props.remove("graft.dev.unsafeRowLevelPruning"); () }
  }

  test("log layout survives a seeded random DML lifecycle (seed 1501)") {
    val tally = campaign("log", seed = 1501, ops = 30)
    info(s"coverage: $tally")
    assertCovered(tally,
      Seq("INSERT", "UPDATE", "DELETE", "MERGE", "OVERWRITE", "vacuum",
        "compactLog"))
  }

  test("snapshot layout survives a seeded random DML lifecycle (seed 2502)") {
    val tally = campaign("snapshot", seed = 2502, ops = 22)
    info(s"coverage: $tally")
    assertCovered(tally,
      Seq("INSERT", "UPDATE", "DELETE", "MERGE", "OVERWRITE"))
  }

  test("change-feed tracking survives a seeded random DML lifecycle (seed 3503)") {
    val tally = campaign("cdf", seed = 3503, ops = 24)
    info(s"coverage: $tally")
    assertCovered(tally,
      Seq("INSERT", "UPDATE", "DELETE", "MERGE", "OVERWRITE"))
  }

  /** Streaming exactly-once fuzz: a CDF-tracked table takes random SQL
    * DML bursts of random size; after each burst a FRESH streaming query
    * resumes from the same checkpoint (a restart per round — the classic
    * escape surface) and folds the change rows into a driver-side
    * mirror. The mirror must equal the model after every round: no
    * change lost across restarts, none double-applied, whatever mix of
    * append captures, row-level diffs, and overwrite expansions the
    * burst produced.
    */
  test("CDF stream with restarts mirrors random DML exactly-once (seed 6506)") {
    streamCampaign(6506)
  }

  private def streamCampaign(seed: Int): Unit = {
    import graft.source.CdfStream
    val r = new Random(seed)
    val root = TestSpark.tmpDir("fuzz_stream")
    val dir = s"$root/t"
    val cat = registerCat(root, s"st$seed")
    val model = mutable.SortedMap.empty[Long, (Long, Option[String])]
    val init = (0 until 30).map(i => (i * 3L, r.nextInt(1000).toLong, genS(r)))
    init.foreach { case (k, v, s) => model(k) = (v, s) }
    ChangeFeed.commit(init.toDF("k", "v", "s"), dir, Seq("k"))
    val dml = new DmlDriver(r, cat, s"fuzz_src_stream_$seed", model)
    val ckpt = TestSpark.tmpDir("fuzz_stream_ckpt")
    // the stream starts AFTER v1, so the mirror seeds from v1 content
    val mirror = mutable.Map.empty[Long, (Long, Option[String])]
    init.foreach { case (k, v, s) => mirror(k) = (v, s) }
    def drain(): Unit = {
      val q = CdfStream.read(spark, dir, startingVersion = Some(1L))
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          val rows = batch.select(col(ChangeFeed.CommitVersion),
            col(ChangeFeed.ChangeType), col("k"), col("v"), col("s"))
            .collect()
          mirror.synchronized {
            rows.groupBy(_.getLong(0)).toSeq.sortBy(_._1).foreach {
              case (_, vr) => // within a version: deletes, then upserts
                vr.filter(_.getString(1) == "delete")
                  .foreach(rw => mirror.remove(rw.getLong(2)))
                vr.filter(rw => rw.getString(1) == "insert" ||
                    rw.getString(1) == "update_postimage")
                  .foreach(rw => mirror(rw.getLong(2)) =
                    (rw.getLong(3), Option(rw.getString(4))))
            }
          }
        }.start()
      try q.processAllAvailable() finally q.stop()
    }
    for (round <- 1 to 5) {
      val burst = 1 + r.nextInt(3)
      val descs = (1 to burst).map(i => dml.step(r.nextInt(88), i))
      drain() // fresh query, same checkpoint: resume must be exact
      val got = mirror.toSeq.sortBy(_._1)
      val want = model.toSeq.map { case (k, (v, s)) => (k, (v, s)) }
      assert(got == want,
        s"[stream/$seed] round $round (${descs.mkString("; ")}): mirror " +
          s"diverged\n  only-mirror: ${got.diff(want).take(8)}\n" +
          s"  only-model : ${want.diff(got).take(8)}")
    }
  }

  /** Schema-evolution fuzz on the column-mapped plane: random
    * interleavings of metadata-only DDL (RENAME / ADD ... DEFAULT / ADD
    * nullable / DROP, through Spark's own ALTER TABLE grammar) with
    * full-snapshot data commits. The model tracks the logical schema AND
    * the per-row values, so the checks cover the two classes that have
    * actually bitten: an unmaterialized default must render for every
    * pre-existing row, and a stored NULL in a physically-present column
    * must stay NULL (never be clobbered by the column's default); and at
    * the end every version must time-travel under ITS OWN names with its
    * own rows.
    */
  test("column-mapped table survives a seeded random evolve/commit lifecycle") {
    mappedCampaign(5505)
  }

  private def mappedCampaign(seed: Int): Unit = {
    import graft.ops.{ColumnMapping => CM}
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val r = new Random(seed)
    val root = TestSpark.tmpDir("fuzz_map")
    val dir = s"$root/t"
    val cat = registerCat(root, s"map$seed")
    var schema = Vector("k", "a", "b") // logical order (manifest appends)
    val rows = mutable.SortedMap.empty[Long, mutable.Map[String, Option[String]]]
    def sparkDf() = {
      val st = StructType(StructField("k", LongType, nullable = false) +:
        schema.tail.map(n => StructField(n, StringType, nullable = true)))
      val data = rows.toSeq.map { case (k, m) =>
        Row.fromSeq(k +: schema.tail.map(n => m(n).orNull))
      }
      spark.createDataFrame(
        spark.sparkContext.parallelize(data, 2), st)
    }
    def modelRows: Seq[Seq[Option[String]]] = rows.toSeq.map { case (k, m) =>
      Option(k.toString) +: schema.tail.map(m(_))
    }
    def readAll(sql: String): (Vector[String], Seq[Seq[Option[String]]]) = {
      val df = spark.sql(sql)
      val cols = df.columns.toVector
      val rws = df.collect().toSeq.map(rw =>
        cols.indices.map(j => Option(rw.get(j)).map(_.toString)))
        .sortBy(_.head.get.toLong)
      (cols, rws)
    }
    def check(tag: String): Unit = {
      val (cols, rws) = readAll(s"SELECT * FROM $cat.t")
      assert(cols == schema, s"[map] $tag: schema is $cols, model $schema")
      assert(rws == modelRows, s"[map] $tag: rows diverged\n" +
        s"  only-live : ${rws.diff(modelRows).take(5)}\n" +
        s"  only-model: ${modelRows.diff(rws).take(5)}")
    }

    (0 until 20).foreach { i =>
      rows(i.toLong) = mutable.Map("a" -> genS(r), "b" -> genS(r))
    }
    CM.writeData(sparkDf().repartitionByRange(3, col("k")), dir)
    def curV = VersionedTable.currentVersion(spark, dir).getOrElse(fail("no v"))
    var nextCol = 0
    var nextKey = 1000L
    val snaps =
      mutable.LinkedHashMap.empty[Long, (Vector[String], Seq[Seq[Option[String]]])]
    check("initial")
    snaps(curV) = (schema, modelRows)

    for (i <- 1 to 16) {
      val pick = r.nextInt(100)
      val tag: String =
        if (pick < 40 || schema.tail.isEmpty) { // data commit (full snapshot)
          // mutate a random subset (including explicit NULLs into columns
          // that carry defaults — the stored-NULL-vs-default class)...
          rows.toSeq.foreach { case (k, m) =>
            if (r.nextInt(100) < 30)
              schema.tail.foreach { n =>
                if (r.nextInt(100) < 50) m(n) = genS(r)
              }
          }
          // ...and append fresh keys
          (0 until 3).foreach { _ =>
            val k = nextKey; nextKey += 1 + r.nextInt(3)
            rows(k) = mutable.Map(schema.tail.map(n => n -> genS(r)): _*)
          }
          CM.writeData(sparkDf().repartitionByRange(3, col("k")), dir)
          s"op#$i writeData (${rows.size} rows)"
        } else if (pick < 60) { // ADD COLUMN, half with a default
          nextCol += 1
          val n = s"c$nextCol"
          val dflt = if (r.nextBoolean()) Some(s"d$nextCol") else None
          spark.sql(s"ALTER TABLE $cat.t ADD COLUMN $n STRING" +
            dflt.map(d => s" DEFAULT '$d'").getOrElse(""))
          schema :+= n
          rows.values.foreach(m => m(n) = dflt)
          s"op#$i ADD COLUMN $n default=$dflt"
        } else if (pick < 80) { // RENAME a non-key column
          nextCol += 1
          val from = schema.tail(r.nextInt(schema.tail.size))
          val to = s"r$nextCol"
          spark.sql(s"ALTER TABLE $cat.t RENAME COLUMN $from TO $to")
          schema = schema.map(c => if (c == from) to else c)
          rows.values.foreach { m => m(to) = m(from); m.remove(from) }
          s"op#$i RENAME $from -> $to"
        } else if (schema.tail.size > 1) { // DROP a non-key column
          val victim = schema.tail(r.nextInt(schema.tail.size))
          spark.sql(s"ALTER TABLE $cat.t DROP COLUMN $victim")
          schema = schema.filterNot(_ == victim)
          rows.values.foreach(_.remove(victim))
          s"op#$i DROP COLUMN $victim"
        } else s"op#$i skipped DROP (one non-key column left)"
      check(tag)
      snaps(curV) = (schema, modelRows)
    }

    // every version renders under ITS OWN names with its own rows
    snaps.foreach { case (v, (sch, rws)) =>
      val (cols, got) = readAll(s"SELECT * FROM $cat.t VERSION AS OF $v")
      assert(cols == sch,
        s"[map] VERSION AS OF $v schema is $cols, recorded $sch")
      assert(got == rws, s"[map] VERSION AS OF $v rows diverged")
    }
  }

  /** IVF lifecycle fuzz: random interleavings of refresh (spread and
    * deliberately skewed deltas), rebalance at random caps driven to
    * convergence, and near-dup searches checked against an in-memory
    * brute force over the corpus model. The invariants hold after EVERY
    * op, not just the scripted q319/q321 sequences: the index covers the
    * corpus exactly, every assign file is one exact band, both log
    * histories stay contiguous, rebalance converges within a bounded
    * number of rounds, a probe of EVERY cell finds the exact brute-force
    * top-1 (any miss there is a scan bug, never approximation), and
    * accumulated nprobe=2 recall stays above the catastrophe bound.
    * This is the newest engine surface (rebalance + orphan
    * adoption landed last); it gets the same sequence-fuzz treatment the
    * DML planes get above.
    */
  test("IVF index survives a seeded random refresh/rebalance/search lifecycle") {
    ivfCampaign(4504)
  }

  private def ivfCampaign(seed: Int): Unit = {
    import graft.similarity.IvfIndex
    val r = new Random(seed)
    val root = TestSpark.tmpDir("fuzz_ivf") + "/ivf"
    val dim = 8
    val centers = Array(
      Array.tabulate(dim)(j => 1.0 + 0.05 * j),
      Array.tabulate(dim)(j => -1.0 + 0.03 * j))
    def vec(c: Int, i: Long): Array[Double] =
      Array.tabulate(dim)(j => centers(c)(j) + 0.15 * math.sin((i + 1) * (j + 2)))
    val corpus = mutable.SortedMap.empty[Long, Array[Double]]
    def toDf(rows: Seq[(Long, Int)]) = rows
      .map { case (id, c) => (id, c, vec(c, id).toSeq) }
      .toDF("vec_id", "label", "embedding")
    val initRows = (0L until 60L).map(i => (i, (i % 2).toInt))
    initRows.foreach { case (id, c) => corpus(id) = vec(c, id) }
    IvfIndex.build(toDf(initRows), root, "vec_id", "embedding",
      seedCol = "label")

    def cosine(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      var j = 0
      while (j < dim) { d += a(j) * b(j); na += a(j) * a(j); nb += b(j) * b(j); j += 1 }
      d / math.sqrt(na * nb)
    }
    def invariants(tag: String): Unit = {
      val live = ActionLog.liveFiles(spark, s"$root/assign")
      assert(live.nonEmpty && live.forall {
        case (_, Some((lo, hi, n))) => lo == hi && n > 0
        case _ => false
      }, s"[ivf] $tag: every assign file must be one exact band: $live")
      val vs = ActionLog.versions(spark, s"$root/assign")
      // one band per file holds per COMMIT: a cell may own at most as
      // many live files as there are assign commits, never more
      val worst = live.groupBy(_._2.get._1).map(_._2.size).max
      assert(worst <= vs.last,
        s"[ivf] $tag: a cell owns $worst files across ${vs.last} commits: " +
          s"$live")
      assert(vs == (1L to vs.last), s"[ivf] $tag: assign history torn: $vs")
      val ids = ActionLog.read(spark, s"$root/assign")
        .select(col("vec_id")).collect().map(_.getLong(0)).sorted.toSeq
      assert(ids == corpus.keys.toSeq,
        s"[ivf] $tag: index does not cover the corpus exactly " +
          s"(${ids.size} indexed vs ${corpus.size} corpus)")
    }

    var nextId = 10000L
    var hits = 0; var total = 0
    invariants("build")
    for (i <- 1 to 12) {
      val pick = r.nextInt(100)
      val tag: String =
        if (pick < 45) { // refresh: 50/50 spread vs skewed-to-cluster-0
          val skew = r.nextBoolean()
          val n = 5 + r.nextInt(11)
          val rows = (0 until n).map { _ =>
            val id = nextId; nextId += 1
            (id, if (skew) 0 else r.nextInt(2))
          }
          rows.foreach { case (id, c) => corpus(id) = vec(c, id) }
          IvfIndex.refresh(
            toDf(rows).select(col("vec_id"), col("embedding")),
            root, "vec_id", "embedding")
          s"op#$i refresh n=$n skew=$skew"
        } else if (pick < 70) { // rebalance at a random cap, to convergence
          val cap = math.max(8L, 10L + r.nextInt(30))
          var rounds = 0
          while (IvfIndex.rebalance(spark, root, cap, branch = 2).nonEmpty) {
            rounds += 1
            assert(rounds <= 6,
              s"[ivf] op#$i rebalance(cap=$cap) must converge, still " +
                s"splitting after $rounds rounds")
          }
          s"op#$i rebalance cap=$cap rounds=$rounds"
        } else { // search: near-dups of random corpus vectors vs brute force
          val keys = r.shuffle(corpus.keys.toSeq).take(3)
          val qs = keys.map { id =>
            val src = corpus(id)
            (50000000L + id, src.zipWithIndex.map { case (x, j) =>
              x + 0.01 * (if ((id * 17 + j) % 2 == 0) 1.0 else -1.0)
            }.toSeq)
          }.toDF("query_id", "embedding")
          def top1(nprobe: Int): Map[Long, Long] = IvfIndex.search(qs,
            toDf(Seq.empty[(Long, Int)]), root, "query_id", "vec_id",
            "embedding", k = 1, nprobe = nprobe)
            .select(col("query_id"), col("neighbor_id")).collect()
            .map(row => row.getLong(0) -> row.getLong(1)).toMap
          val nCells = ActionLog.read(spark, s"$root/centroids").count().toInt
          // EXACTNESS: probing every cell is brute force by another
          // route — any miss here is a scan bug, never approximation
          val gotAll = top1(nCells)
          // SELECTIVITY: nprobe=2 recall accumulates; catastrophic decay
          // (the quantizer-drift failure q321 guards) still trips it
          val got2 = top1(2)
          keys.foreach { id =>
            val q = corpus(id).zipWithIndex.map { case (x, j) =>
              x + 0.01 * (if ((id * 17 + j) % 2 == 0) 1.0 else -1.0)
            }
            val truth = corpus.toSeq
              .maxBy { case (cid, v) => (cosine(q, v), -cid) }._1
            assert(gotAll.get(50000000L + id).contains(truth),
              s"[ivf] op#$i: nprobe=ALL($nCells) missed the true top-1 " +
                s"for query of $id (got ${gotAll.get(50000000L + id)}, " +
                s"truth $truth) — an exact scan bug, not approximation")
            total += 1
            if (got2.get(50000000L + id).contains(truth)) hits += 1
          }
          s"op#$i search (nprobe=2 recall so far $hits/$total)"
        }
      invariants(tag)
    }
    // nprobe=2 over an arbitrarily-fragmented quantizer is honest
    // approximation — the bound here is the catastrophe guard (drift
    // decay reads ~0.4); the scripted q321 scenario keeps its >= 0.9 pin
    assert(total >= 6 && hits.toDouble / total >= 0.75,
      s"[ivf] accumulated near-dup recall@1 $hits/$total < 0.75")
  }

  /** Branch-plane fuzz: episodes of fork → divergent random commits on
    * both refs (typed whole-snapshot commits and SQL appends through the
    * `t@ref` grammar) → merge, where the TEST computes its own key-wise
    * three-way merge from the fork snapshot and requires the engine to
    * agree exactly — merged content on a clean merge, a LOUD refusal
    * with both refs untouched on a true conflict, and a pointer-flip
    * fast-forward when `into` never moved. Both failure directions are
    * in scope: a missed conflict corrupts data, a false conflict blocks
    * legal merges.
    */
  test("branch plane survives seeded random fork/commit/merge episodes (seed 7507)") {
    val outcomes = branchCampaign(7507)
    info(s"episode outcomes: $outcomes")
    assertCovered(outcomes, Seq("conflict", "merged", "fast-forward"))
  }

  private def branchCampaign(seed: Int): Map[String, Int] = {
    import graft.ops.Branching
    val r = new Random(seed)
    val root = TestSpark.tmpDir("fuzz_branch")
    val dir = s"$root/t"
    val cat = registerCat(root, s"br$seed")
    type Model = mutable.SortedMap[Long, (Long, Option[String])]
    def snap(m: Model): Seq[Row3] = m.toSeq.map { case (k, (v, s)) => (k, v, s) }
    def toDf(m: Model) = snap(m).toDF("k", "v", "s")
    val main: Model = mutable.SortedMap((0 until 25).map(i =>
      i * 4L -> ((r.nextInt(1000).toLong, genS(r)))): _*)
    Branching.init(toDf(main), dir)
    var nextKey = 5000L
    def readRef(ref: String): Seq[Row3] =
      spark.sql(s"SELECT k, v, s FROM $cat.`t@$ref`").collect()
        .map(row => (row.getLong(0), row.getLong(1), Option(row.getString(2))))
        .sortBy(_._1).toSeq

    val outcomes = mutable.Map.empty[String, Int].withDefaultValue(0)
    for (ep <- 1 to 8) {
      val b = s"b$ep"
      Branching.branch(spark, dir, "main", b)
      val base = main.clone()
      val models = Map("main" -> main, b -> mutable.SortedMap(base.toSeq: _*))
      // divergent random ops on each ref (main may get none: the FF case)
      var mainCommits = 0
      Seq("main", b).foreach { ref =>
        val m = models(ref)
        val nOps = (if (ref == "main") 0 else 1) + r.nextInt(3)
        if (ref == "main") mainCommits = nOps
        (1 to nOps).foreach { _ =>
          r.nextInt(3) match {
            case 0 => // typed whole-snapshot commit: upsert 2-4 keys
              (0 until 2 + r.nextInt(3)).foreach { _ =>
                val k = if (m.nonEmpty && r.nextBoolean())
                  m.keys.toSeq(r.nextInt(m.size))
                else { val f = nextKey; nextKey += 1 + r.nextInt(3); f }
                m(k) = (r.nextInt(1000).toLong, genS(r))
              }
              Branching.commitOn(toDf(m), dir, ref)
            case 1 => // typed commit: delete 1-2 keys (never emptying)
              (0 until 1 + r.nextInt(2)).foreach { _ =>
                if (m.size > 1) m.remove(m.keys.toSeq(r.nextInt(m.size)))
              }
              Branching.commitOn(toDf(m), dir, ref)
            case _ => // SQL append through the @ref grammar
              val rows = (0 until 2).map { _ =>
                val k = nextKey; nextKey += 1 + r.nextInt(3)
                (k, r.nextInt(1000).toLong, genS(r))
              }
              rows.toDF("k", "v", "s")
                .createOrReplaceTempView("fuzz_src_branch")
              spark.sql(s"INSERT INTO $cat.`t@$ref` " +
                "SELECT k, v, s FROM fuzz_src_branch")
              rows.foreach { case (k, v, s) => m(k) = (v, s) }
          }
          assert(readRef(ref) == snap(m), s"[branch/$ep] $ref diverged")
        }
      }
      // the model's own three-way merge from the fork snapshot
      def effects(m: Model): Map[Long, Option[(Long, Option[String])]] = {
        val ups = m.toSeq.collect {
          case (k, row) if !base.get(k).contains(row) => k -> Some(row)
        }
        val dels = base.keys.toSeq.filterNot(m.contains).map(_ -> None)
        (ups ++ dels).toMap
      }
      val (eM, eB) = (effects(main), effects(models(b)))
      val conflictKeys = eM.keySet.intersect(eB.keySet)
        .filter(k => eM(k) != eB(k))
      val outcome = scala.util.Try(
        Branching.merge(spark, dir, b, "main", Seq("k")))
      outcomes(
        if (conflictKeys.nonEmpty) "conflict"
        else if (mainCommits == 0) "fast-forward" else "merged") += 1
      if (conflictKeys.nonEmpty) {
        assert(outcome.isFailure,
          s"[branch/$ep] engine merged through a true conflict on " +
            s"$conflictKeys — silent data corruption")
        assert(readRef("main") == snap(main) &&
          readRef(b) == snap(models(b)),
          s"[branch/$ep] a refused merge must leave both refs untouched")
      } else {
        assert(outcome.isSuccess,
          s"[branch/$ep] engine refused a legal merge: $outcome")
        if (mainCommits == 0) // FF is HEAD-based: no commit on into, not
          // merely no net content effect
          assert(outcome.get.isInstanceOf[Branching.FastForward],
            s"[branch/$ep] into never moved — must fast-forward, " +
              s"got ${outcome.get}")
        val merged = base.clone()
        (eM ++ eB).foreach { // no conflicts: the union of effects is sound
          case (k, Some(row)) => merged(k) = row
          case (k, None) => merged.remove(k)
        }
        main.clear(); merged.foreach { case (k, row) => main(k) = row }
        assert(readRef("main") == snap(main),
          s"[branch/$ep] merged content diverged from the model merge")
      }
      Branching.drop(spark, dir, b)
    }
    outcomes.toMap
  }

  /** Row-tracking fuzz: random full-snapshot merges (updates, deletes,
    * fresh keys) interleaved with layout-only rewrites, with the MODEL
    * predicting the exact id ledger — matched keys keep their id even
    * when every data column changes, fresh keys mint hwm+1.. in key
    * order, retired ids never return — and the identity diff between
    * consecutive versions classifying exactly the model's
    * inserts/deletes/updates (empty across a rewrite, which is the whole
    * point of tracking).
    */
  test("row tracking keeps identity through seeded random merge/rewrite cycles") {
    rowTrackingCampaign(8508)
  }

  /** BRANCH × SCHEMA-EVOLUTION fuzz (round 16 #4a — the composition
    * lesson: bugs live where two planes nobody scripted together meet).
    * Episodes fork `main`, commit random DATA ops interleaved with random
    * SCHEMA evolution on EITHER side — widening `v` INT→BIGINT, adding a
    * nullable column `c1` with backfilled values — then merge. The model
    * computes its own three-way merge IN THE UNIFIED SCHEMA SPACE
    * (missing columns null, narrow epochs widened) and requires the
    * engine to agree exactly: merged rows AND merged schema on a clean
    * merge, a loud refusal with both refs' content and schema untouched
    * on a row conflict. Illegal evolutions — dropping a column,
    * narrowing a widened type, re-typing an established column — are
    * committed on a THROWAWAY branch pair and their merge must refuse
    * (the throwaway keeps main's model schema stable while still
    * proving the refusal).
    */
  test("branch merges reconcile widening/additive schema drift (seed 6606)") {
    val outcomes = branchEvoCampaign(6606)
    info(s"episode outcomes: $outcomes")
    assertCovered(outcomes, Seq("merged", "merged-evolved", "conflict",
      "fast-forward", "schema-refused"))
  }

  private def branchEvoCampaign(seed: Int): Map[String, Int] = {
    import graft.ops.Branching
    import org.apache.spark.sql.DataFrame
    val r = new Random(seed)
    val root = TestSpark.tmpDir("fuzz_brevo")
    val dir = s"$root/t"
    // model row in UNIFIED space: k -> (v, s, c1); refs that lack c1 hold None
    type ERow = (Long, Option[String], Option[Long])
    type Model = mutable.SortedMap[Long, ERow]
    // per-ref schema state: (vType "int"|"bigint", hasC1)
    case class SchemaState(vType: String, hasC1: Boolean)
    def toDf(m: Model, st: SchemaState): DataFrame = {
      val base = m.toSeq.map { case (k, (v, s, c1)) => (k, v, s, c1) }
        .toDF("k", "v", "s", "c1")
        .withColumn("v", col("v").cast(st.vType))
      if (st.hasC1) base else base.drop("c1")
    }
    def canonRef(ref: String): Seq[(Long, ERow)] = {
      val df0 = Branching.readBranch(spark, dir, ref)
      val df = if (df0.columns.contains("c1")) df0
        else df0.withColumn("c1", lit(null).cast("long"))
      df.select(col("k").cast("long"), col("v").cast("long"), col("s"),
        col("c1").cast("long")).collect()
        .map(row => (row.getLong(0), (row.getLong(1),
          Option(row.getString(2)),
          if (row.isNullAt(3)) None else Some(row.getLong(3)))))
        .sortBy(_._1).toSeq
    }
    def snap(m: Model): Seq[(Long, ERow)] = m.toSeq
    def schemaOf(ref: String): (String, Boolean) = {
      val sch = Branching.readBranch(spark, dir, ref).schema
      (sch("v").dataType.catalogString, sch.fieldNames.contains("c1"))
    }

    val main: Model = mutable.SortedMap((0 until 20).map(i =>
      i * 3L -> ((r.nextInt(1000).toLong, genS(r), None: Option[Long]))): _*)
    var mainSt = SchemaState("int", hasC1 = false)
    Branching.init(toDf(main, mainSt), dir)
    var nextKey = 7000L

    def randomDataOp(m: Model, st: SchemaState): Unit = r.nextInt(3) match {
      case 0 => // upsert 2-3 keys (sets c1 only when the ref carries it)
        (0 until 2 + r.nextInt(2)).foreach { _ =>
          val k = if (m.nonEmpty && r.nextBoolean())
            m.keys.toSeq(r.nextInt(m.size))
          else { val f = nextKey; nextKey += 1 + r.nextInt(3); f }
          val c1 = if (st.hasC1 && r.nextBoolean())
            Some(r.nextInt(100).toLong) else None
          m(k) = (r.nextInt(1000).toLong, genS(r), c1)
        }
      case 1 => // delete 1-2 keys, never emptying
        (0 until 1 + r.nextInt(2)).foreach { _ =>
          if (m.size > 1) m.remove(m.keys.toSeq(r.nextInt(m.size)))
        }
      case _ => // touch one existing row's value only
        if (m.nonEmpty) {
          val k = m.keys.toSeq(r.nextInt(m.size))
          val (_, s, c1) = m(k)
          m(k) = (r.nextInt(1000).toLong, s, c1)
        }
    }

    val outcomes = mutable.Map.empty[String, Int].withDefaultValue(0)
    for (ep <- 1 to 10) {
      if (r.nextInt(100) < 25) {
        // ---- ILLEGAL-EVOLUTION episode on a throwaway branch pair ----
        val (x, y) = (s"x$ep", s"y$ep")
        Branching.branch(spark, dir, "main", x)
        Branching.branch(spark, dir, "main", y)
        val mx = mutable.SortedMap(main.toSeq: _*)
        val my = mutable.SortedMap(main.toSeq: _*)
        randomDataOp(my, mainSt)
        Branching.commitOn(toDf(my, mainSt), dir, y) // y moves: no FF escape
        r.nextInt(3) match {
          case 0 => // drop column s
            Branching.commitOn(toDf(mx, mainSt).drop("s"), dir, x)
          case 1 => // narrow v: widen on-branch first, then the merge sees
            // main(int) vs branch(bigint) — legal; so instead commit v as
            // SMALLINT, NARROWER than the fork point's INT
            Branching.commitOn(toDf(mx, mainSt)
              .withColumn("v", col("v").cast("smallint")), dir, x)
          case _ => // re-type s STRING -> BIGINT (not a widening)
            Branching.commitOn(toDf(mx, mainSt)
              .withColumn("s", lit(1L)), dir, x)
        }
        val res = scala.util.Try(
          Branching.merge(spark, dir, x, y, Seq("k")))
        assert(res.isFailure,
          s"[brevo/$ep] merge through an illegal evolution must refuse")
        assert(canonRef(y) == snap(my),
          s"[brevo/$ep] refused merge must leave the target untouched")
        outcomes("schema-refused") += 1
        Branching.drop(spark, dir, x); Branching.drop(spark, dir, y)
      } else {
        // ---- LEGAL episode: data ops × widening/additive evolution ----
        val b = s"b$ep"
        Branching.branch(spark, dir, "main", b)
        val base = mutable.SortedMap(main.toSeq: _*)
        val models = Map("main" -> main, b -> mutable.SortedMap(base.toSeq: _*))
        val states = mutable.Map("main" -> mainSt, b -> mainSt)
        var mainCommits = 0
        var evolved = false
        Seq("main", b).foreach { ref =>
          val m = models(ref)
          val nOps = (if (ref == "main") 0 else 1) + r.nextInt(3)
          if (ref == "main") mainCommits = nOps
          (1 to nOps).foreach { _ =>
            val st = states(ref)
            r.nextInt(100) match {
              case p if p < 20 && st.vType == "int" => // widen v, values intact
                states(ref) = st.copy(vType = "bigint"); evolved = true
                Branching.commitOn(toDf(m, states(ref)), dir, ref)
              case p if p < 40 && !st.hasC1 => // add c1, backfill a few rows
                states(ref) = st.copy(hasC1 = true); evolved = true
                val ks = r.shuffle(m.keys.toSeq).take(1 + r.nextInt(3))
                ks.foreach { k =>
                  val (v, s, _) = m(k); m(k) = (v, s, Some(v * 2))
                }
                Branching.commitOn(toDf(m, states(ref)), dir, ref)
              case _ =>
                randomDataOp(m, st)
                Branching.commitOn(toDf(m, st), dir, ref)
            }
            assert(canonRef(ref) == snap(m), s"[brevo/$ep] $ref diverged")
          }
        }
        // the model's own three-way merge in unified space
        def effects(m: Model): Map[Long, Option[ERow]] = {
          val ups = m.toSeq.collect {
            case (k, row) if !base.get(k).contains(row) => k -> Some(row)
          }
          val dels = base.keys.toSeq.filterNot(m.contains).map(_ -> None)
          (ups ++ dels).toMap
        }
        val (eM, eB) = (effects(main), effects(models(b)))
        val conflictKeys = eM.keySet.intersect(eB.keySet)
          .filter(k => eM(k) != eB(k))
        val outcome = scala.util.Try(
          Branching.merge(spark, dir, b, "main", Seq("k")))
        if (conflictKeys.nonEmpty) {
          assert(outcome.isFailure,
            s"[brevo/$ep] engine merged through a true conflict on " +
              s"$conflictKeys — silent corruption")
          assert(canonRef("main") == snap(main) &&
            canonRef(b) == snap(models(b)),
            s"[brevo/$ep] a refused merge must leave both refs untouched")
          // main keeps ITS schema after the refusal
          assert(schemaOf("main") ==
            ((states("main").vType, states("main").hasC1)),
            s"[brevo/$ep] refusal must not evolve the target schema")
          outcomes("conflict") += 1
        } else {
          assert(outcome.isSuccess,
            s"[brevo/$ep] engine refused a legal merge: $outcome")
          if (mainCommits == 0)
            assert(outcome.get.isInstanceOf[Branching.FastForward],
              s"[brevo/$ep] into never moved — must fast-forward")
          val merged = mutable.SortedMap(base.toSeq: _*)
          (eM ++ eB).foreach {
            case (k, Some(row)) => merged(k) = row
            case (k, None) => merged.remove(k)
          }
          main.clear(); merged.foreach { case (k, row) => main(k) = row }
          // merged schema: the per-column unification of the two heads —
          // EXCEPT on a fast-forward, which adopts the branch snapshot
          // (schema included) verbatim
          mainSt =
            if (mainCommits == 0) states(b)
            else SchemaState(
              if (states("main").vType == "bigint" ||
                states(b).vType == "bigint") "bigint" else "int",
              states("main").hasC1 || states(b).hasC1)
          assert(canonRef("main") == snap(main),
            s"[brevo/$ep] merged content diverged from the model merge")
          assert(schemaOf("main") == ((mainSt.vType, mainSt.hasC1)),
            s"[brevo/$ep] merged schema ${schemaOf("main")} != model " +
              s"(${mainSt.vType}, ${mainSt.hasC1})")
          outcomes(
            if (mainCommits == 0) "fast-forward"
            else if (evolved) "merged-evolved" else "merged") += 1
        }
        Branching.drop(spark, dir, b)
      }
    }
    outcomes.toMap
  }

  private def rowTrackingCampaign(seed: Int): Unit = {
    import graft.ops.{RowTracking => RT}
    val r = new Random(seed)
    val dir = TestSpark.tmpDir("fuzz_rt") + "/t"
    val model = mutable.SortedMap.empty[Long, (Long, Option[String])]
    val ids = mutable.Map.empty[Long, Long]
    (0 until 25).foreach(i =>
      model(i * 2L) = (r.nextInt(1000).toLong, genS(r)))
    def toDf = model.toSeq.map { case (k, (v, s)) => (k, v, s) }
      .toDF("k", "v", "s")
    RT.init(toDf, dir, Seq("k"))
    var hwm = model.size.toLong
    model.keys.toSeq.zipWithIndex.foreach { case (k, i) => ids(k) = i + 1L }
    var nextKey = 9000L
    def check(tag: String, vPrev: Long, ins: Set[Long], del: Set[Long],
        upd: Set[Long]): Unit = {
      val vCur = VersionedTable.currentVersion(spark, dir).get
      val live = VersionedTable.readVersion(spark, dir, vCur)
        .select(col("k"), col("v"), col("s"), col(RT.RowId)).collect()
        .map(rw => (rw.getLong(0), (rw.getLong(1), Option(rw.getString(2)),
          rw.getLong(3)))).toMap
      val want = model.toMap.map { case (k, (v, s)) => k -> ((v, s, ids(k))) }
      assert(live == want, s"[rt] $tag: content+identity diverged\n" +
        s"  only-live : ${(live.toSet -- want.toSet).take(5)}\n" +
        s"  only-model: ${(want.toSet -- live.toSet).take(5)}")
      assert(RT.highWaterMark(spark, dir, vCur) == hwm,
        s"[rt] $tag: high-water mark drifted")
      val d = RT.diff(spark, dir, vPrev, vCur)
        .select(col(graft.ops.ChangeFeed.ChangeType), col(RT.RowId))
        .collect().map(rw => rw.getString(0) -> rw.getLong(1))
      def of(ct: String) = d.collect { case (`ct`, id) => id }.toSet
      assert(of("insert") == ins && of("delete") == del &&
        of("update_postimage") == upd,
        s"[rt] $tag: identity diff misclassified — got " +
          s"ins=${of("insert")} del=${of("delete")} " +
          s"upd=${of("update_postimage")}, want ins=$ins del=$del upd=$upd")
    }
    for (i <- 1 to 10) {
      val vPrev = VersionedTable.currentVersion(spark, dir).get
      if (r.nextInt(100) < 70) { // full-snapshot merge
        val before = model.toMap
        // update some, delete up to 2, add up to 3 fresh
        model.keys.toSeq.foreach { k =>
          if (r.nextInt(100) < 25) model(k) = (r.nextInt(1000).toLong, genS(r))
        }
        (0 until r.nextInt(3)).foreach { _ =>
          if (model.size > 3) {
            val k = model.keys.toSeq(r.nextInt(model.size))
            model.remove(k); ()
          }
        }
        val fresh = (0 until r.nextInt(4)).map { _ =>
          val k = nextKey; nextKey += 1 + r.nextInt(3)
          model(k) = (r.nextInt(1000).toLong, genS(r)); k
        }
        RT.merge(toDf, dir, Seq("k"), Seq("k"))
        // the model's id ledger: retirements, then mints in key order
        val removed = before.keySet -- model.keySet
        val delIds: Set[Long] = removed.map(ids).toSet
        removed.foreach(ids.remove)
        fresh.sorted.foreach { k => hwm += 1; ids(k) = hwm }
        val updIds: Set[Long] = model.keySet.intersect(before.keySet)
          .filter(k => before(k) != model(k)).map(ids).toSet
        check(s"op#$i merge", vPrev, ins = fresh.map(ids).toSet,
          del = delIds, upd = updIds)
      } else { // layout-only rewrite: identical rows, identical ids
        RT.rewrite(spark, dir, 1 + r.nextInt(4))
        check(s"op#$i rewrite", vPrev,
          ins = Set.empty, del = Set.empty, upd = Set.empty)
      }
    }
  }

  /** Type-widening fuzz: random interleavings of SQL ALTER COLUMN TYPE
    * along each column's widening chain (the FULL integral chain
    * TINYINT→SMALLINT→INT→BIGINT — round 16 extends the start down to
    * TINYINT so byte epochs ride every read; FLOAT→DOUBLE; DECIMAL
    * precision growth across the INT32/INT64 physical boundary), epoch
    * appends arriving at the current manifest types, attempted NARROWINGS
    * which must be refused loudly, and CROSS-FAMILY conversions the
    * matrix does not admit (INT→DECIMAL, INT→DOUBLE, DATE→TIMESTAMP
    * analogues) which must also be refused with no commit — Delta's
    * wider matrix admits some of these; ours refuses them, and the
    * refusal must be loud, never a silent cast. After every op the
    * catalog SQL read must render the
    * model's manifest types over all mixed physical epochs with every
    * value numerically intact, and at the end each version must read
    * under ITS OWN manifest with its own rows.
    */
  test("type widening survives a seeded random widen/append lifecycle (seed 9909)") {
    typedCampaign(9909)
  }

  private def typedCampaign(seed: Int): Unit = {
    import graft.ops.{TypeWidening => TW}
    import org.apache.spark.sql.types._
    val r = new Random(seed)
    val root = TestSpark.tmpDir("fuzz_tw")
    val dir = s"$root/w"
    val cat = registerCat(root, s"tw$seed")
    // widening chains per column (k is the sort key, never widened).
    // 'a' walks the FULL integral chain from TINYINT (values capped at
    // 0..99 so every stage can store them); 'c' crosses the decimal
    // INT32→INT64 physical boundary at precision 10; 'e' (round 17 #2)
    // is the embedding-precision migration — ARRAY<FLOAT>→ARRAY<DOUBLE>,
    // element-wise widening, float epochs decoded under a double
    // manifest (values kept whole so every stage stores them exactly);
    // 'm' (round 18 #2) is the STRUCT chain — the metadata counter
    // inside a record struct widened FIELD-WISE through the
    // `ALTER COLUMN m.n TYPE t` DDL lift.
    val chains = Map(
      "a" -> Vector("TINYINT", "SMALLINT", "INT", "BIGINT"),
      "b" -> Vector("FLOAT", "DOUBLE"),
      "c" -> Vector("DECIMAL(6,2)", "DECIMAL(10,2)", "DECIMAL(14,2)"),
      "e" -> Vector("ARRAY<FLOAT>", "ARRAY<DOUBLE>"),
      "m" -> Vector("SMALLINT", "INT", "BIGINT")) // the m.n FIELD chain
    // the DDL a stage renders as — struct stages wrap the field chain
    def ddlOf(c: String, stage: Int): String =
      if (c == "m") s"STRUCT<t: STRING, n: ${chains(c)(stage)}>"
      else chains(c)(stage)
    val cols = Seq("a", "b", "c", "e", "m")
    val pos = mutable.Map("a" -> 0, "b" -> 0, "c" -> 0, "e" -> 0, "m" -> 0)
    type TRow = (Long, Long, Double, BigDecimal, Seq[Double], (String, Long))
    val rows = mutable.ArrayBuffer.empty[TRow]
    var nextKey = 0L
    def freshRows(n: Int): Seq[TRow] = (0 until n).map { _ =>
      val k = nextKey; nextKey += 1
      (k, r.nextInt(100).toLong, r.nextInt(1000).toDouble,
        BigDecimal(r.nextInt(999999)) / 100,
        Seq.fill(2 + r.nextInt(3))(r.nextInt(1000).toDouble),
        (s"t${r.nextInt(5)}", r.nextInt(100).toLong))
    }
    def toDf(rs: Seq[TRow]) = {
      val st = StructType(Seq(
        StructField("k", LongType, nullable = false),
        StructField("a", LongType, nullable = false),
        StructField("b", DoubleType, nullable = false),
        StructField("c", DecimalType(20, 2), nullable = false),
        StructField("e", ArrayType(DoubleType), nullable = false),
        StructField("m", StructType(Seq(
          StructField("t", StringType), StructField("n", LongType))))))
      val base = spark.createDataFrame(
        spark.sparkContext.parallelize(rs.map(t => org.apache.spark.sql.Row(
          t._1, t._2, t._3, t._4.setScale(2).bigDecimal, t._5,
          org.apache.spark.sql.Row(t._6._1, t._6._2))), 1), st)
      base.select(col("k"),
        col("a").cast(chains("a")(pos("a")).toLowerCase),
        col("b").cast(chains("b")(pos("b")).toLowerCase),
        col("c").cast(chains("c")(pos("c")).toLowerCase),
        col("e").cast(chains("e")(pos("e")).toLowerCase),
        col("m").cast(ddlOf("m", pos("m")).toLowerCase))
    }
    def canon(df: org.apache.spark.sql.DataFrame): Seq[TRow] =
      df.select(col("k"), col("a").cast("long"), col("b").cast("double"),
        col("c").cast("decimal(20,2)"), col("e").cast("array<double>"),
        col("m").cast("struct<t:string,n:bigint>"))
        .collect()
        .map(rw => (rw.getLong(0), rw.getLong(1), rw.getDouble(2),
          BigDecimal(rw.getDecimal(3)).setScale(2),
          rw.getSeq[Double](4).toList: Seq[Double],
          (rw.getStruct(5).getString(0), rw.getStruct(5).getLong(1))))
        .sortBy(_._1).toSeq
    def modelRows: Seq[TRow] =
      rows.toSeq.map(t => (t._1, t._2, t._3, t._4.setScale(2),
        t._5.toList: Seq[Double], t._6)).sortBy(_._1)

    val first = freshRows(12); rows ++= first
    TW.init(toDf(first), dir)
    val snaps = mutable.LinkedHashMap.empty[Long, (Map[String, Int], Seq[TRow])]
    def curV = VersionedTable.currentVersion(spark, dir).getOrElse(fail("no v"))
    def check(tag: String): Unit = {
      val live = spark.sql(s"SELECT k, a, b, c, e, m FROM $cat.w")
      val wantTypes = cols.map(c =>
        org.apache.spark.sql.types.DataType.fromDDL(ddlOf(c, pos(c))))
      val gotTypes = cols.map(c => live.schema(c).dataType)
      assert(gotTypes == wantTypes,
        s"[tw/$seed] $tag: SQL schema $gotTypes, manifest wants $wantTypes")
      assert(canon(live) == modelRows,
        s"[tw/$seed] $tag: mixed-epoch read diverged from the model")
    }
    check("init")
    snaps(curV) = (pos.toMap, modelRows)

    for (i <- 1 to 12) {
      val pick = r.nextInt(100)
      // array columns take Spark's element grammar (ALTER COLUMN
      // e.element); the struct column's chain holds the FIELD type, so
      // its DDL targets m.n (round 18 #2)
      def alterSql(c: String, ddl: String): String =
        if (c == "m")
          s"ALTER TABLE $cat.w ALTER COLUMN $c.n TYPE $ddl"
        else if (ddl.toUpperCase.startsWith("ARRAY<"))
          s"ALTER TABLE $cat.w ALTER COLUMN $c.element TYPE " +
            ddl.stripPrefix("ARRAY<").stripSuffix(">")
        else s"ALTER TABLE $cat.w ALTER COLUMN $c TYPE $ddl"
      if (pick < 30) { // widen one step along a random column's chain
        val open = cols.filter(c => pos(c) < chains(c).size - 1)
        if (open.nonEmpty) {
          val c = open(r.nextInt(open.size))
          pos(c) += 1
          spark.sql(alterSql(c, chains(c)(pos(c))))
        }
      } else if (pick < 60) { // epoch append at the current manifest types
        val fresh = freshRows(2 + r.nextInt(4))
        rows ++= fresh
        TW.append(toDf(fresh), dir)
        ()
      } else if (pick < 72) { // row-level SQL UPDATE (round 16): the COW
        // scan renders every physical epoch at the live manifest and the
        // replacement commits as a typed rewrite (chain ended). The array
        // column updates element-wise in the same statement (r17 #2) —
        // +1 on whole values stays float-exact at every chain stage.
        val m = 3 + r.nextInt(4); val cc = r.nextInt(m)
        spark.sql(s"UPDATE $cat.w SET a = CAST(k % 90 AS " +
          s"${chains("a")(pos("a"))}), e = CAST(transform(e, " +
          s"x -> CAST(x AS DOUBLE) + 1.0d) AS ${chains("e")(pos("e"))}), " +
          s"m = named_struct('t', upper(m.t), 'n', " +
          s"CAST(CAST(m.n AS BIGINT) % 97 AS ${chains("m")(pos("m"))})) " +
          s"WHERE k % $m = $cc")
        rows.mapInPlace { case t @ (k, _, b2, c2, e2, (mt, mn)) =>
          if (k % m == cc)
            (k, k % 90, b2, c2, e2.map(_ + 1.0),
              (mt.toUpperCase, mn % 97))
          else t
        }
        ()
      } else if (pick < 80) { // row-level SQL DELETE (the rewrite form)
        if (rows.size > 4) {
          val m = 5 + r.nextInt(4); val cc = r.nextInt(m)
          spark.sql(s"DELETE FROM $cat.w WHERE k % $m = $cc")
          rows.filterInPlace { case (k, _, _, _, _, _) => k % m != cc }
          ()
        }
      } else if (pick < 90) { // a NARROWING must be refused loudly, nothing committed
        val c = cols(r.nextInt(cols.size))
        if (pos(c) > 0) {
          val vBefore = curV
          val res = scala.util.Try(spark.sql(alterSql(c, chains(c)(pos(c) - 1))))
          assert(res.isFailure && curV == vBefore,
            s"[tw/$seed] op#$i: narrowing $c must be refused with no commit")
        }
      } else { // a CROSS-FAMILY conversion the matrix does not admit must
        // be refused with no commit (Delta's wider matrix has int→decimal
        // and date→timestamp; ours refuses — loudly, never a silent cast)
        val offChain = Map(
          "a" -> Vector("DECIMAL(20,0)", "DOUBLE", "DATE",
            "ARRAY<BIGINT>"), // scalar -> array: refused
          "b" -> Vector("DECIMAL(10,2)", "BIGINT", "TIMESTAMP"),
          "c" -> Vector("DOUBLE", "BIGINT", "DECIMAL(14,4)"), // scale change: also refused
          "e" -> Vector("ARRAY<DECIMAL(10,2)>", "ARRAY<STRING>",
            "DOUBLE"), // cross-family elements / array -> scalar: refused
          "m" -> Vector("DOUBLE", "DATE", "STRING")) // field cross-family: refused
        val c = cols(r.nextInt(cols.size))
        val to = offChain(c)(r.nextInt(offChain(c).size))
        val vBefore = curV
        val res = scala.util.Try(spark.sql(alterSql(c, to)))
        assert(res.isFailure && curV == vBefore,
          s"[tw/$seed] op#$i: cross-family $c->$to must be refused with no commit")
      }
      check(s"op#$i")
      snaps(curV) = (pos.toMap, modelRows)
    }
    // every version reads under ITS OWN manifest with its own rows
    snaps.foreach { case (v, (p, want)) =>
      val manifest = TW.typesOf(spark, dir, v).toMap
      cols.foreach { c =>
        assert(manifest(c) ==
          org.apache.spark.sql.types.DataType.fromDDL(ddlOf(c, p(c))),
          s"[tw/$seed] v$v manifest for '$c' is ${manifest(c)}, " +
            s"recorded ${ddlOf(c, p(c))}")
      }
      assert(canon(TW.readVersion(spark, dir, v)) == want,
        s"[tw/$seed] version $v rows diverged under its own manifest")
    }
  }

  /** TYPED-PLANE COMPOSITION fuzz (round 17 #3): the type-widening chain
    * shares a catalog with the DV, CDF and branch planes — this campaign
    * pins how each composes. CDF COMPOSES: `tableChanges` on a typed
    * table renders every change row under the manifest of `toVersion`
    * (each bounding snapshot read under its own manifest, cast UP —
    * lossless by the widening-only invariant), model-checked after EVERY
    * commit, including metadata-only widen commits which must diff
    * EMPTY. DV and branching REFUSE loudly with no commit: a DV bitmap
    * would mask rows no typed read consults, and the branch plane is a
    * disjoint storage layout — both directions of the branch/typed
    * collision are probed.
    */
  test("typed-plane composition: CDF pinned to toVersion manifest, " +
      "DV/branch refused (seed 7707)") {
    twCompositionCampaign(7707, assertCovered = true)
  }

  private def twCompositionCampaign(seed: Int,
      assertCovered: Boolean = false): Unit = {
    import graft.ops.{TypeWidening => TW, ChangeFeed => CF,
      DeletionVectors => DV}
    import org.apache.spark.sql.types._
    val r = new Random(seed)
    val root = TestSpark.tmpDir("fuzz_twcomp")
    val dir = s"$root/t"
    val cat = registerCat(root, s"twc$seed")
    val aChain = Vector("SMALLINT", "INT", "BIGINT")
    val eChain = Vector("ARRAY<FLOAT>", "ARRAY<DOUBLE>")
    var aPos = 0; var ePos = 0
    // model: k -> (a, e); whole values keep every widening cast exact
    val live = mutable.SortedMap.empty[Long, (Long, Seq[Double])]
    var nextKey = 0L
    def fresh(n: Int): Seq[(Long, Long, Seq[Double])] = (0 until n).map { _ =>
      val k = nextKey; nextKey += 1
      (k, r.nextInt(90).toLong, Seq.fill(2)(r.nextInt(1000).toDouble))
    }
    def toDf(rs: Seq[(Long, Long, Seq[Double])]) =
      rs.toDF("k", "a", "e").select(col("k"),
        col("a").cast(aChain(aPos).toLowerCase).as("a"),
        col("e").cast(eChain(ePos).toLowerCase).as("e"))
    val first = fresh(8)
    first.foreach { case (k, a, e) => live(k) = (a, e) }
    TW.init(toDf(first), dir)
    val snaps = mutable.LinkedHashMap[Long, Map[Long, (Long, Seq[Double])]](
      1L -> live.toMap)
    def curV = VersionedTable.currentVersion(spark, dir).getOrElse(fail("no v"))
    val hits = mutable.Map.empty[String, Int].withDefaultValue(0)

    type CRow = (Long, Long, String, Long, Seq[Double]) // version, k, type, a, e
    def canonChanges(df: org.apache.spark.sql.DataFrame): Seq[CRow] =
      df.select(col(CF.CommitVersion), col("k"), col(CF.ChangeType),
        col("a").cast("long"), col("e").cast("array<double>")).collect()
        .map(rw => (rw.getLong(0), rw.getLong(1), rw.getString(2),
          rw.getLong(3), rw.getSeq[Double](4).toList: Seq[Double]))
        .sortBy(t => (t._1, t._2, t._3)).toSeq
    def expectedDelta(v: Long, old: Map[Long, (Long, Seq[Double])],
        nw: Map[Long, (Long, Seq[Double])]): Seq[CRow] = {
      val ins = (nw.keySet -- old.keySet).toSeq
        .map(k => (v, k, "insert", nw(k)._1, nw(k)._2))
      val del = (old.keySet -- nw.keySet).toSeq
        .map(k => (v, k, "delete", old(k)._1, old(k)._2))
      val upd = (old.keySet & nw.keySet).toSeq
        .filter(k => old(k) != nw(k)).flatMap(k => Seq(
          (v, k, "update_preimage", old(k)._1, old(k)._2),
          (v, k, "update_postimage", nw(k)._1, nw(k)._2)))
      (ins ++ del ++ upd).sortBy(t => (t._1, t._2, t._3))
    }
    def checkCommit(tag: String): Unit = {
      val v = curV
      val prev =
        if (v <= 1L) Map.empty[Long, (Long, Seq[Double])] else snaps(v - 1)
      snaps(v) = live.toMap
      // live SQL read renders the manifest types over the model content
      val got = spark.sql(s"SELECT k, a, e FROM $cat.t")
      assert(got.schema("a").dataType == DataType.fromDDL(aChain(aPos)) &&
        got.schema("e").dataType == DataType.fromDDL(eChain(ePos)),
        s"[twcomp/$seed] $tag: live schema diverged from the manifest")
      val gotRows = got.select(col("k"), col("a").cast("long"),
        col("e").cast("array<double>")).collect()
        .map(rw => rw.getLong(0) ->
          (rw.getLong(1), rw.getSeq[Double](2).toList: Seq[Double]))
        .sortBy(_._1).toSeq
      assert(gotRows == live.toSeq.map { case (k, (a, e)) =>
        k -> (a, e.toList: Seq[Double]) },
        s"[twcomp/$seed] $tag: live read diverged from the model")
      // per-commit CDF, pinned to toVersion's (= v's) manifest — a
      // metadata-only widen must diff EMPTY under its own wider schema
      val ch = CF.tableChanges(spark, dir, v - 1, v, Seq("k"))
      assert(ch.schema("a").dataType == DataType.fromDDL(aChain(aPos)) &&
        ch.schema("e").dataType == DataType.fromDDL(eChain(ePos)),
        s"[twcomp/$seed] $tag: tableChanges must render toVersion's manifest")
      assert(canonChanges(ch) == expectedDelta(v, prev, snaps(v)),
        s"[twcomp/$seed] $tag: v$v change rows diverged from the model diff")
    }
    checkCommit("init")

    for (i <- 1 to 12) {
      val pick = r.nextInt(100)
      if (pick < 22) { // metadata-only widen (SQL ALTER on the catalog)
        val open = Seq("a", "e").filter(c =>
          if (c == "a") aPos < aChain.size - 1 else ePos < eChain.size - 1)
        if (open.nonEmpty) {
          val c = open(r.nextInt(open.size))
          if (c == "a") { aPos += 1
            spark.sql(s"ALTER TABLE $cat.t ALTER COLUMN a TYPE ${aChain(aPos)}")
          } else { ePos += 1
            // Spark's grammar for array element updates: col.element
            spark.sql(s"ALTER TABLE $cat.t ALTER COLUMN e.element TYPE " +
              eChain(ePos).stripPrefix("ARRAY<").stripSuffix(">"))
          }
          hits("widen") += 1
          checkCommit(s"op#$i widen")
        }
      } else if (pick < 50) { // epoch append at the live manifest types
        val rs = fresh(2 + r.nextInt(3))
        rs.foreach { case (k, a, e) => live(k) = (a, e) }
        TW.append(toDf(rs), dir)
        hits("append") += 1
        checkCommit(s"op#$i append")
      } else if (pick < 68) { // SQL UPDATE — COW across mixed epochs
        val m = 3 + r.nextInt(3); val cc = r.nextInt(m)
        spark.sql(s"UPDATE $cat.t SET a = CAST(k % 77 AS ${aChain(aPos)}), " +
          s"e = CAST(transform(e, x -> CAST(x AS DOUBLE) + 1.0d) AS " +
          s"${eChain(ePos)}) WHERE k % $m = $cc")
        live.keys.toSeq.filter(_ % m == cc).foreach { k =>
          val (_, e) = live(k); live(k) = (k % 77, e.map(_ + 1.0))
        }
        hits("update") += 1
        checkCommit(s"op#$i update")
      } else if (pick < 80) { // SQL DELETE — rewrite form on this plane
        if (live.size > 4) {
          val m = 4 + r.nextInt(3); val cc = r.nextInt(m)
          spark.sql(s"DELETE FROM $cat.t WHERE k % $m = $cc")
          live.keys.toSeq.filter(_ % m == cc).foreach(live.remove)
          hits("delete") += 1
          checkCommit(s"op#$i delete")
        }
      } else if (pick < 90) { // DV on a typed dir must refuse, no commit
        val vBefore = curV
        val res = scala.util.Try(DV.delete(spark, dir, col("k") % 3 === 0))
        assert(res.isFailure && res.failed.get.getMessage
          .contains("type-widening") && curV == vBefore,
          s"[twcomp/$seed] op#$i: DV.delete must refuse a typed table loudly")
        hits("dvRefuse") += 1
      } else { // branch plane on a typed dir must refuse, nothing written
        val res = scala.util.Try(graft.ops.Branching.init(toDf(fresh(1)), dir))
        val res2 = scala.util.Try(
          graft.ops.Branching.initCaptured(toDf(fresh(1)), dir, Seq("k")))
        val fs = new org.apache.hadoop.fs.Path(dir)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        assert(res.isFailure && res2.isFailure &&
          !fs.exists(new org.apache.hadoop.fs.Path(dir, "_heads")),
          s"[twcomp/$seed] op#$i: Branching.init must refuse a typed dir")
        hits("branchRefuse") += 1
      }
    }
    // full-range feed: one deterministic schema (the live manifest) over
    // every commit, equal to the concatenated model diffs
    val allCh = CF.tableChanges(spark, dir, 1L, curV, Seq("k"))
    assert(allCh.schema("a").dataType == DataType.fromDDL(aChain(aPos)) &&
      allCh.schema("e").dataType == DataType.fromDDL(eChain(ePos)),
      s"[twcomp/$seed] full-range feed must render the live manifest")
    val versions = snaps.keys.toSeq.sorted
    val wantAll = versions.zip(versions.tail).flatMap { case (p, v) =>
      expectedDelta(v, snaps(p), snaps(v))
    }.sortBy(t => (t._1, t._2, t._3))
    assert(canonChanges(allCh) == wantAll,
      s"[twcomp/$seed] full-range feed diverged from the model diffs")
    // the refusal probes run once UNCONDITIONALLY (any seed covers them;
    // the in-loop draws add mid-lifecycle interleavings on top):
    locally { // DV on a typed dir
      val vBefore = curV
      val res = scala.util.Try(DV.delete(spark, dir, col("k") % 3 === 0))
      assert(res.isFailure && res.failed.get.getMessage
        .contains("type-widening") && curV == vBefore,
        s"[twcomp/$seed] DV.delete must refuse a typed table loudly")
      hits("dvRefuse") += 1
    }
    locally { // branch plane on a typed dir
      val res = scala.util.Try(graft.ops.Branching.init(toDf(fresh(1)), dir))
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      assert(res.isFailure &&
        !fs.exists(new org.apache.hadoop.fs.Path(dir, "_heads")),
        s"[twcomp/$seed] Branching.init must refuse a typed dir")
      hits("branchRefuse") += 1
    }
    locally { // column-mapping mutations on a typed dir refuse loudly
      // (readManifest demands the _schema manifest this layout lacks)
      val vBefore = curV
      val w = scala.util.Try(
        graft.ops.ColumnMapping.writeData(toDf(fresh(1)), dir))
      val rn = scala.util.Try(
        graft.ops.ColumnMapping.rename(spark, dir, "a", "z"))
      assert(w.isFailure && rn.isFailure && curV == vBefore,
        s"[twcomp/$seed] column-mapping ops must refuse a typed dir")
    }
    locally { // the version STREAM on a typed dir refuses at construction
      // (it plans top-level data files per version — a typed chain keeps
      // them under data/, so the feed would render silently EMPTY)
      val res = scala.util.Try(graft.source.TestReaderHook.cdfStreamCtor(
        dir, toDf(fresh(1)).schema))
      assert(res.isFailure &&
        res.failed.get.getMessage.contains("type-widening"),
        s"[twcomp/$seed] the CDF stream must refuse a typed dir loudly")
    }
    // the mirror collision: TW.init into a branch-plane dir must refuse
    val bdir = s"$root/b"
    graft.ops.Branching.init(fresh(2).toDF("k", "a", "e"), bdir)
    val mirror = scala.util.Try(TW.init(fresh(1).toDF("k", "a", "e"), bdir))
    assert(mirror.isFailure &&
      mirror.failed.get.getMessage.contains("branch-plane"),
      s"[twcomp/$seed] TW.init must refuse a branch-plane dir loudly")
    if (assertCovered) {
      val want = Seq("widen", "append", "update", "delete", "dvRefuse",
        "branchRefuse")
      val missing = want.filter(hits(_) == 0)
      assert(missing.isEmpty,
        s"[twcomp/$seed] campaign must cover $want; missing $missing " +
          s"(hits: $hits) — re-seed the pinned test")
    }
  }

  /** DELETION-VECTOR × IVF fuzz (round 16 #4b — the other untested
    * composition): the corpus is a DV-capable versioned table (the same
    * plane SQL DELETE routes to — `GraftDelete.deleteWhere` IS
    * `DeletionVectors.delete`), the covering IVF index rides beside it,
    * and the campaign interleaves DV row deletes (bitmap commits, zero
    * data bytes moved), DV compaction (fold to clean files), fold-commit
    * "updates" (delete old id + fresh id re-add, then an O(delta) index
    * refresh), and IVF rebalance under cluster-0 skew — so hot cells get
    * split WHILE holding vectors whose corpus rows are DV-masked, the
    * exact race the round-15 verdict flagged. Invariants after every op:
    * the DV read equals the live model; the assign index covers exactly
    * the INDEXED set (deletes don't reach the index — staleness is the
    * documented contract, `coverage` is the caller's probe); every
    * assign file stays one exact band; and a search at nprobe=ALL with
    * k > #(masked-but-indexed), filtered to live corpus ids, returns
    * EXACTLY the brute-force top-1 over the live corpus — a masked row
    * may rank (staleness), but it must never displace the live truth.
    */
  test("DV deletes × IVF rebalance keep search exact over the live corpus (seed 5505)") {
    dvIvfCampaign(5505)
  }

  private def dvIvfCampaign(seed: Int): Unit = {
    import graft.ops.{DeletionVectors => DV}
    import graft.similarity.IvfIndex
    val r = new Random(seed)
    val root = TestSpark.tmpDir("fuzz_dvivf")
    val corpusDir = s"$root/corpus"
    val ivfRoot = s"$root/ivf"
    val dim = 8
    val centers = Array(
      Array.tabulate(dim)(j => 1.0 + 0.05 * j),
      Array.tabulate(dim)(j => -1.0 + 0.03 * j))
    def vec(c: Int, i: Long): Array[Double] =
      Array.tabulate(dim)(j => centers(c)(j) + 0.15 * math.sin((i + 1) * (j + 2)))
    def cosine(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var j = 0
      while (j < dim) { d += a(j) * b(j); na += a(j) * a(j); nb += b(j) * b(j); j += 1 }
      d / math.sqrt(na * nb)
    }
    // model: id -> cluster label; vectors are deterministic in (label, id)
    val live = mutable.SortedMap.empty[Long, Int]
    val indexed = mutable.SortedMap.empty[Long, Int]
    def corpusDf(rows: Seq[(Long, Int)]) = rows
      .map { case (id, c) => (id, c, vec(c, id).toSeq) }
      .toDF("vec_id", "label", "embedding")
    (0L until 60L).foreach { i => live(i) = (i % 2).toInt; indexed(i) = (i % 2).toInt }
    VersionedTable.write(corpusDf(live.toSeq).coalesce(2), corpusDir)
    IvfIndex.build(corpusDf(live.toSeq), ivfRoot, "vec_id", "embedding",
      seedCol = "label")
    // the SQL route to the same plane: `DELETE ... WHERE vec_id IN (...)`
    // translates to a deletion-vector commit through the catalog (arrays
    // are first-class on the DSv2 surface since round 16)
    val cat = registerCat(root, s"dvivf$seed")

    def corpusCheck(tag: String): Unit = {
      val got = DV.read(spark, corpusDir).select(col("vec_id"), col("label"))
        .collect().map(row => (row.getLong(0), row.getInt(1))).sorted.toSeq
      assert(got == live.toSeq,
        s"[dvivf/$seed] $tag: DV-applied corpus diverged from the model")
    }
    def indexCheck(tag: String): Unit = {
      val liveFiles = ActionLog.liveFiles(spark, s"$ivfRoot/assign")
      assert(liveFiles.nonEmpty && liveFiles.forall {
        case (_, Some((lo, hi, n))) => lo == hi && n > 0
        case _ => false
      }, s"[dvivf/$seed] $tag: every assign file must be one exact band")
      val ids = ActionLog.read(spark, s"$ivfRoot/assign")
        .select(col("vec_id")).collect().map(_.getLong(0)).sorted.toSeq
      assert(ids == indexed.keys.toSeq,
        s"[dvivf/$seed] $tag: index must cover the INDEXED set exactly " +
          s"(${ids.size} vs ${indexed.size})")
    }

    var nextId = 20000L
    var splitWithMasked = false
    var searches = 0
    // EXACTNESS over the live corpus: nprobe=ALL, k deep enough that
    // masked-but-indexed rows cannot crowd out every live neighbor
    def doSearch(i: Int): String = {
      val masked = indexed.keySet -- live.keySet
      val keys = r.shuffle(live.keys.toSeq).take(3)
      val qs = keys.map { id =>
        val src = vec(live(id), id)
        (90000000L + id, src.zipWithIndex.map { case (x, j) =>
          x + 0.01 * (if ((id * 17 + j) % 2 == 0) 1.0 else -1.0)
        }.toSeq)
      }.toDF("query_id", "embedding")
      val nCells = ActionLog.read(spark, s"$ivfRoot/centroids").count().toInt
      val kAll = 1 + masked.size
      val ranked = IvfIndex.search(qs, corpusDf(Seq.empty), ivfRoot,
        "query_id", "vec_id", "embedding", k = kAll, nprobe = nCells)
        .select(col("query_id"), col("neighbor_id"), col("rank"))
        .collect().map(row => (row.getLong(0), row.getLong(1), row.getInt(2)))
      keys.foreach { id =>
        val q = vec(live(id), id).zipWithIndex.map { case (x, j) =>
          x + 0.01 * (if ((id * 17 + j) % 2 == 0) 1.0 else -1.0)
        }
        val truth = live.toSeq
          .maxBy { case (cid, c) => (cosine(q, vec(c, cid)), -cid) }._1
        val firstLive = ranked.filter(_._1 == 90000000L + id)
          .sortBy(_._3).map(_._2).find(live.contains)
        assert(firstLive.contains(truth),
          s"[dvivf/$seed] op#$i: first LIVE neighbor for query of $id " +
            s"is $firstLive, brute force over the live corpus says " +
            s"$truth (masked=${masked.size}, k=$kAll)")
        searches += 1
      }
      s"op#$i search k=$kAll masked=${masked.size}"
    }
    corpusCheck("init"); indexCheck("init")
    for (i <- 1 to 14) {
      val masked = indexed.keySet -- live.keySet
      val pick = r.nextInt(100)
      val tag: String = if (pick < 25 && live.size > 4) {
        // DV delete 1-3 live rows, biased toward the skew cluster so
        // masked rows land inside future hot cells
        val pool = {
          val zeros = live.collect { case (id, 0) => id }.toSeq
          if (zeros.size > 2 && r.nextBoolean()) zeros else live.keys.toSeq
        }
        val ks = r.shuffle(pool).take(1 + r.nextInt(3))
        val vBefore = VersionedTable.currentVersion(spark, corpusDir).get
        val viaSql = r.nextBoolean()
        if (viaSql) { // the catalog route: IN translates -> DV commit
          spark.sql(s"DELETE FROM $cat.corpus WHERE vec_id IN " +
            ks.mkString("(", ",", ")"))
          assert(VersionedTable.currentVersion(spark, corpusDir)
            .contains(vBefore + 1),
            s"[dvivf/$seed] op#$i: SQL DELETE must mint one DV version")
          assert(DV.vectors(spark, corpusDir, vBefore + 1).count() > 0,
            s"[dvivf/$seed] op#$i: SQL DELETE must land as deletion " +
              "vectors, not a rewrite")
        } else {
          val (_, n) = DV.delete(spark, corpusDir,
            col("vec_id").isin(ks: _*))
          assert(n == ks.size,
            s"[dvivf/$seed] op#$i: delete must mask exactly the ${ks.size} live rows, masked $n")
        }
        ks.foreach(live.remove)
        // re-deleting dead rows is a no-op with NO version minted
        val (v2, n2) = DV.delete(spark, corpusDir,
          col("vec_id").isin(ks.head))
        assert(n2 == 0 && v2 == vBefore + 1,
          s"[dvivf/$seed] op#$i: re-delete of a masked row must be commit-free")
        s"op#$i dv-delete ${ks.size} sql=$viaSql"
      } else if (pick < 45) {
        // fold-commit "update": retire 0-2 live rows, mint replacements at
        // fresh ids (skewed to cluster 0), fold DVs into a clean snapshot,
        // then O(delta) index refresh for the fresh rows only
        val retire = r.shuffle(live.keys.toSeq).take(r.nextInt(3))
          .filter(_ => live.size > 4)
        retire.foreach(live.remove)
        val freshRows = (0 until 1 + r.nextInt(4)).map { _ =>
          val id = nextId; nextId += 1
          (id, if (r.nextInt(4) > 0) 0 else 1)
        }
        freshRows.foreach { case (id, c) => live(id) = c; indexed(id) = c }
        VersionedTable.write(corpusDf(live.toSeq).coalesce(2), corpusDir)
        IvfIndex.refresh(corpusDf(freshRows).select(col("vec_id"),
          col("embedding")), ivfRoot, "vec_id", "embedding")
        s"op#$i fold-update -${retire.size}+${freshRows.size}"
      } else if (pick < 55) {
        // compaction folds the bitmaps into clean files — content fixed
        DV.compact(spark, corpusDir, 1 + r.nextInt(3))
        s"op#$i dv-compact"
      } else if (pick < 80) {
        val cap = math.max(8L, 10L + r.nextInt(25))
        var rounds = 0
        var splitAny = false
        while (IvfIndex.rebalance(spark, ivfRoot, cap, branch = 2).nonEmpty) {
          rounds += 1; splitAny = true
          assert(rounds <= 6,
            s"[dvivf/$seed] op#$i: rebalance(cap=$cap) must converge")
        }
        if (splitAny && masked.nonEmpty) splitWithMasked = true
        s"op#$i rebalance cap=$cap rounds=$rounds masked=${masked.size}"
      } else {
        doSearch(i)
      }
      corpusCheck(tag); indexCheck(tag)
    }
    // SCRIPTED FINALE — the composition the campaign exists for must
    // occur regardless of which random branches the seed drew: mask two
    // cluster-0 rows, pile skewed adds into cluster 0 until a cell is
    // hot, split it WITH the masked vectors inside, then search.
    val zeros = live.collect { case (id, 0) => id }.toSeq.take(2)
    if (zeros.nonEmpty) {
      DV.delete(spark, corpusDir, col("vec_id").isin(zeros: _*))
      zeros.foreach(live.remove)
    }
    val pile = (0 until 18).map { _ =>
      val id = nextId; nextId += 1; (id, 0)
    }
    pile.foreach { case (id, c) => live(id) = c; indexed(id) = c }
    VersionedTable.write(corpusDf(live.toSeq).coalesce(2), corpusDir)
    IvfIndex.refresh(corpusDf(pile).select(col("vec_id"), col("embedding")),
      ivfRoot, "vec_id", "embedding")
    corpusCheck("finale-setup"); indexCheck("finale-setup")
    val maskedAtFinale = indexed.keySet -- live.keySet
    assert(maskedAtFinale.nonEmpty,
      s"[dvivf/$seed] finale must run with masked rows in the index")
    var rounds = 0
    var splitAny = false
    while (IvfIndex.rebalance(spark, ivfRoot, 12L, branch = 2).nonEmpty) {
      rounds += 1; splitAny = true
      assert(rounds <= 8, s"[dvivf/$seed] finale rebalance must converge")
    }
    if (splitAny) splitWithMasked = true
    corpusCheck("finale-rebalance"); indexCheck("finale-rebalance")
    doSearch(99); doSearch(100)
    assert(searches >= 3, s"[dvivf/$seed] too few searches ran ($searches)")
    assert(splitWithMasked,
      s"[dvivf/$seed] no rebalance split ever ran with masked rows in the " +
        "index — the composition under test never occurred")
  }

  /** ARRAY-COLUMN DML fuzz (round 16: arrays became first-class on the
    * DSv2 surface mid-round — new surface goes under fuzz the round it
    * lands). Seeded random SQL UPDATE (element transforms, NULLing whole
    * arrays), DELETE (ranged → the deletion-vector plane; modulo → the
    * row-level rewrite form), MERGE (matched array updates + unmatched
    * inserts carrying empty arrays and NULL elements), and INSERT INTO
    * against a versioned (k, emb, tag) table, with the model holding
    * arrays as Seq[Option[Double]] so NULL elements, NULL arrays, and
    * empty arrays are all distinct states the engine must round-trip
    * bit-exactly through every write path (Spark-written files and
    * GroupWrite rewrites interleave).
    */
  test("array columns survive a seeded random SQL DML lifecycle (seed 4404)") {
    arrayCampaign(4404)
  }

  private def arrayCampaign(seed: Int): Unit = {
    val r = new Random(seed)
    val root = TestSpark.tmpDir("fuzz_arr")
    val dir = s"$root/t"
    val cat = registerCat(root, s"arr$seed")
    type Emb = Option[Seq[Option[Double]]]
    val model = mutable.SortedMap.empty[Long, (Emb, Option[String])]
    def genEmb(): Emb = r.nextInt(10) match {
      case 0 => None // NULL array
      case 1 => Some(Seq.empty) // empty array
      case _ => Some((0 until 1 + r.nextInt(4)).map(_ =>
        if (r.nextInt(8) == 0) None // NULL element
        else Some(r.nextInt(1000).toDouble)))
    }
    def embSql(e: Emb): String = e match {
      case None => "CAST(NULL AS ARRAY<DOUBLE>)"
      case Some(xs) if xs.isEmpty => "CAST(array() AS ARRAY<DOUBLE>)"
      case Some(xs) => xs.map {
        case Some(x) => s"${x}d"
        case None => "CAST(NULL AS DOUBLE)"
      }.mkString("array(", ",", ")")
    }
    var nextKey = 0L
    def freshRows(n: Int): Seq[(Long, Emb, Option[String])] =
      (0 until n).map { _ =>
        val k = nextKey; nextKey += 1
        (k, genEmb(), genS(r))
      }
    def valuesSql(rows: Seq[(Long, Emb, Option[String])]): String =
      rows.map { case (k, e, s0) =>
        val sv = s0.map(x => s"'$x'").getOrElse("CAST(NULL AS STRING)")
        s"(${k}L, ${embSql(e)}, $sv)"
      }.mkString(", ")
    def check(tag: String): Unit = {
      val got = spark.sql(s"SELECT k, emb, tag FROM $cat.t").collect()
        .map { row =>
          val e: Emb =
            if (row.isNullAt(1)) None
            else Some(row.getSeq[Any](1).map(v =>
              Option(v).map(_.asInstanceOf[Double])))
          (row.getLong(0), e, Option(row.getString(2)))
        }.sortBy(_._1).toSeq
      val want = model.toSeq.map { case (k, (e, s0)) => (k, e, s0) }
      assert(got == want, s"[arr/$seed] $tag: content diverged\n" +
        s"  only-live : ${got.diff(want).take(3)}\n" +
        s"  only-model: ${want.diff(got).take(3)}")
    }

    val init = freshRows(20)
    init.foreach { case (k, e, s0) => model(k) = (e, s0) }
    // build the initial snapshot THROUGH SQL so element nulls land exactly
    // as the engine writes them
    VersionedTable.write(
      spark.sql(s"SELECT * FROM VALUES ${valuesSql(init)} AS t(k, emb, tag)")
        .repartitionByRange(3, col("k")), dir)
    check("init")

    for (i <- 1 to 14) {
      val pick = r.nextInt(100)
      val tag: String = if (pick < 20) { // element transform UPDATE
        val m = 2 + r.nextInt(4); val c = r.nextInt(m)
        val d = 1 + r.nextInt(9)
        spark.sql(s"UPDATE $cat.t SET emb = transform(emb, x -> x + ${d}d) " +
          s"WHERE k % $m = $c")
        model.keys.toSeq.filter(k => k % m == c).foreach { k =>
          val (e, s0) = model(k)
          model(k) = (e.map(_.map(_.map(_ + d))), s0)
        }
        s"op#$i transform"
      } else if (pick < 30) { // NULL a row's array / empty it
        if (model.nonEmpty) {
          val k = model.keys.toSeq(r.nextInt(model.size))
          val toEmpty = r.nextBoolean()
          spark.sql(s"UPDATE $cat.t SET emb = " +
            (if (toEmpty) "array()" else "NULL") + s" WHERE k = $k")
          val (_, s0) = model(k)
          model(k) = (if (toEmpty) Some(Seq.empty) else None, s0)
        }
        s"op#$i null-out"
      } else if (pick < 45) { // ranged DELETE -> deletion vectors
        if (model.size > 4) {
          val ks = model.keys.toSeq
          val lo = ks(r.nextInt(ks.size))
          val hi = lo + r.nextInt(5)
          spark.sql(s"DELETE FROM $cat.t WHERE k >= $lo AND k <= $hi")
          model.keys.toSeq.filter(k => k >= lo && k <= hi)
            .foreach(model.remove)
        }
        s"op#$i dv-delete"
      } else if (pick < 55) { // modulo DELETE -> the rewrite form
        if (model.size > 6) {
          val m = 5 + r.nextInt(4); val c = r.nextInt(m)
          spark.sql(s"DELETE FROM $cat.t WHERE k % $m = $c AND size(emb) >= 0")
          model.keys.toSeq
            .filter(k => k % m == c && model(k)._1.isDefined)
            .foreach(model.remove)
        }
        s"op#$i rewrite-delete"
      } else if (pick < 80) { // MERGE: matched update + unmatched insert
        val touch = r.shuffle(model.keys.toSeq).take(r.nextInt(3))
        val fresh = freshRows(1 + r.nextInt(3))
        val srcRows = touch.map(k => (k, genEmb(), genS(r))) ++ fresh
        spark.sql(s"SELECT * FROM VALUES ${valuesSql(srcRows)} " +
          "AS t(k, emb, tag)").createOrReplaceTempView("fuzz_arr_src")
        spark.sql(s"""MERGE INTO $cat.t t USING fuzz_arr_src s ON t.k = s.k
          |WHEN MATCHED THEN UPDATE SET emb = s.emb, tag = s.tag
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
        srcRows.foreach { case (k, e, s0) => model(k) = (e, s0) }
        s"op#$i merge +${fresh.size}"
      } else { // INSERT INTO appends
        val fresh = freshRows(1 + r.nextInt(3))
        spark.sql(s"INSERT INTO $cat.t VALUES ${valuesSql(fresh)}")
        fresh.foreach { case (k, e, s0) => model(k) = (e, s0) }
        s"op#$i insert"
      }
      check(tag)
    }
  }

  /** ARRAY-OF-STRUCT DML fuzz (round 18 #1: the conversation-turn column
    * became first-class mid-round — new surface goes under fuzz the round
    * it lands). Same discipline as [[arrayCampaign]], with the model
    * holding turns as Seq[Option[(Option[String], Option[Long])]] so FIVE
    * distinct states — NULL array, empty array, NULL element,
    * struct-of-nulls element, and plain structs — must round-trip
    * bit-exactly through UPDATE (transform + named_struct with null
    * elements passed through), ranged DELETE (DV plane), modulo DELETE
    * (rewrite form), MERGE and INSERT, across interleaved Spark-written
    * and GroupWrite-rewritten files.
    */
  test("array-of-struct columns survive a seeded random SQL DML " +
      "lifecycle (seed 2602)") {
    turnsCampaign(2602)
  }

  private def turnsCampaign(seed: Int): Unit = {
    val r = new Random(seed)
    val root = TestSpark.tmpDir("fuzz_turns")
    val dir = s"$root/t"
    val cat = registerCat(root, s"turns$seed")
    val turnT = "STRUCT<role: STRING, score: BIGINT>"
    type Turn = Option[(Option[String], Option[Long])]
    type Turns = Option[Seq[Turn]]
    val model = mutable.SortedMap.empty[Long, (Turns, Option[String])]
    def genTurn(): Turn =
      if (r.nextInt(8) == 0) None // NULL element
      else if (r.nextInt(8) == 0) Some((None, None)) // struct of nulls
      else Some((
        if (r.nextInt(6) == 0) None else Some(s"r${r.nextInt(4)}"),
        if (r.nextInt(6) == 0) None else Some(r.nextInt(1000).toLong)))
    def genTurns(): Turns = r.nextInt(10) match {
      case 0 => None // NULL array
      case 1 => Some(Seq.empty) // empty array
      case _ => Some((0 until 1 + r.nextInt(4)).map(_ => genTurn()))
    }
    def turnSql(t: Turn): String = t match {
      case None => s"CAST(NULL AS $turnT)"
      case Some((ro, sc)) =>
        val rv = ro.map(x => s"'$x'").getOrElse("CAST(NULL AS STRING)")
        val sv = sc.map(x => s"${x}L").getOrElse("CAST(NULL AS BIGINT)")
        s"named_struct('role', $rv, 'score', $sv)"
    }
    def turnsSql(e: Turns): String = e match {
      case None => s"CAST(NULL AS ARRAY<$turnT>)"
      case Some(xs) if xs.isEmpty => s"CAST(array() AS ARRAY<$turnT>)"
      case Some(xs) => xs.map(turnSql).mkString("array(", ",", ")")
    }
    var nextKey = 0L
    def freshRows(n: Int): Seq[(Long, Turns, Option[String])] =
      (0 until n).map { _ =>
        val k = nextKey; nextKey += 1
        (k, genTurns(), genS(r))
      }
    def valuesSql(rows: Seq[(Long, Turns, Option[String])]): String =
      rows.map { case (k, e, s0) =>
        val sv = s0.map(x => s"'$x'").getOrElse("CAST(NULL AS STRING)")
        s"(${k}L, ${turnsSql(e)}, $sv)"
      }.mkString(", ")
    def check(tag: String): Unit = {
      val got = spark.sql(s"SELECT k, turns, tag FROM $cat.t").collect()
        .map { row =>
          val e: Turns =
            if (row.isNullAt(1)) None
            else Some(row.getSeq[org.apache.spark.sql.Row](1).map(t =>
              Option(t).map(tr => (
                Option(tr.getString(0)),
                if (tr.isNullAt(1)) None else Some(tr.getLong(1))))))
          (row.getLong(0), e, Option(row.getString(2)))
        }.sortBy(_._1).toSeq
      val want = model.toSeq.map { case (k, (e, s0)) => (k, e, s0) }
      assert(got == want, s"[turns/$seed] $tag: content diverged\n" +
        s"  only-live : ${got.diff(want).take(3)}\n" +
        s"  only-model: ${want.diff(got).take(3)}")
    }

    val init = freshRows(20)
    init.foreach { case (k, e, s0) => model(k) = (e, s0) }
    VersionedTable.write(
      spark.sql(s"SELECT * FROM VALUES ${valuesSql(init)} AS t(k, turns, tag)")
        .repartitionByRange(3, col("k")), dir)
    check("init")

    for (i <- 1 to 14) {
      val pick = r.nextInt(100)
      val tag: String = if (pick < 20) { // turn transform UPDATE — null
        // ELEMENTS pass through (named_struct over one would fabricate
        // struct(null,null)); null scores stay null (+ propagates)
        val m = 2 + r.nextInt(4); val c = r.nextInt(m)
        val d = 1 + r.nextInt(9)
        spark.sql(s"UPDATE $cat.t SET turns = transform(turns, x -> " +
          "CASE WHEN x IS NULL THEN x ELSE named_struct('role', x.role, " +
          s"'score', x.score + $d) END) WHERE k % $m = $c")
        model.keys.toSeq.filter(k => k % m == c).foreach { k =>
          val (e, s0) = model(k)
          model(k) = (e.map(_.map(_.map { case (ro, sc) =>
            (ro, sc.map(_ + d)) })), s0)
        }
        s"op#$i transform"
      } else if (pick < 30) { // NULL a row's array / empty it
        if (model.nonEmpty) {
          val k = model.keys.toSeq(r.nextInt(model.size))
          val toEmpty = r.nextBoolean()
          spark.sql(s"UPDATE $cat.t SET turns = " +
            (if (toEmpty) s"CAST(array() AS ARRAY<$turnT>)" else "NULL") +
            s" WHERE k = $k")
          val (_, s0) = model(k)
          model(k) = (if (toEmpty) Some(Seq.empty) else None, s0)
        }
        s"op#$i null-out"
      } else if (pick < 45) { // ranged DELETE -> deletion vectors
        if (model.size > 4) {
          val ks = model.keys.toSeq
          val lo = ks(r.nextInt(ks.size))
          val hi = lo + r.nextInt(5)
          spark.sql(s"DELETE FROM $cat.t WHERE k >= $lo AND k <= $hi")
          model.keys.toSeq.filter(k => k >= lo && k <= hi)
            .foreach(model.remove)
        }
        s"op#$i dv-delete"
      } else if (pick < 55) { // modulo DELETE -> the rewrite form
        if (model.size > 6) {
          val m = 5 + r.nextInt(4); val c = r.nextInt(m)
          spark.sql(s"DELETE FROM $cat.t WHERE k % $m = $c AND size(turns) >= 0")
          model.keys.toSeq
            .filter(k => k % m == c && model(k)._1.isDefined)
            .foreach(model.remove)
        }
        s"op#$i rewrite-delete"
      } else if (pick < 80) { // MERGE: matched whole-array replace + inserts
        val touch = r.shuffle(model.keys.toSeq).take(r.nextInt(3))
        val fresh = freshRows(1 + r.nextInt(3))
        val srcRows = touch.map(k => (k, genTurns(), genS(r))) ++ fresh
        spark.sql(s"SELECT * FROM VALUES ${valuesSql(srcRows)} " +
          "AS t(k, turns, tag)").createOrReplaceTempView("fuzz_turns_src")
        spark.sql(s"""MERGE INTO $cat.t t USING fuzz_turns_src s ON t.k = s.k
          |WHEN MATCHED THEN UPDATE SET turns = s.turns, tag = s.tag
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
        srcRows.foreach { case (k, e, s0) => model(k) = (e, s0) }
        s"op#$i merge +${fresh.size}"
      } else { // INSERT INTO appends
        val fresh = freshRows(1 + r.nextInt(3))
        spark.sql(s"INSERT INTO $cat.t VALUES ${valuesSql(fresh)}")
        fresh.foreach { case (k, e, s0) => model(k) = (e, s0) }
        s"op#$i insert"
      }
      check(tag)
    }
  }

  /** Exploratory multi-seed sweep, cancelled unless GRAFT_FUZZ_SWEEP=n
    * is set: the pinned seeds above are regression guards; this is the
    * bug-HUNTING mode (run n fresh seeds of the three DML campaigns).
    * Any failure here is a real finding — fix it and pin its seed.
    */
  test("exploratory multi-seed sweep (env-gated)") {
    val n = sys.env.get("GRAFT_FUZZ_SWEEP").flatMap(_.toIntOption).getOrElse(0)
    if (n <= 0) cancel("set GRAFT_FUZZ_SWEEP=<n> to hunt with n fresh seeds")
    (1 to n).foreach { s =>
      info(s"sweep $s/$n: seed block ${9000 + s}")
      campaign("log", 9000 + s, ops = 20)
      campaign("snapshot", 9100 + s, ops = 18)
      campaign("cdf", 9200 + s, ops = 16)
      streamCampaign(9300 + s)
      mappedCampaign(9400 + s)
      ivfCampaign(9500 + s)
      branchCampaign(9700 + s)
      rowTrackingCampaign(9800 + s)
      typedCampaign(9900 + s)
      // round-16 composition campaigns: no assertCovered here — outcome
      // coverage is seed-dependent; the pinned seeds assert it, the sweep
      // hunts for model divergence under fresh interleavings
      branchEvoCampaign(6600 + s)
      dvIvfCampaign(5500 + s)
      arrayCampaign(4400 + s)
      twCompositionCampaign(7700 + s)
      turnsCampaign(2600 + s)
    }
  }

  /** OCC under real contention: 4 unsynchronized writers race 5 commits
    * each while clustering maintenance runs mid-stream. Every batch must
    * land exactly once, the version history must stay contiguous (no
    * torn or skipped slots), and no rewrite may shed per-file stats.
    * OccSpec pins the two-writer disjoint race once; this is the
    * randomized-load generalization — batch data is generated up front
    * on one seed so the test stays deterministic while the interleaving
    * does not.
    */
  test("concurrent OCC appends linearize under maintenance (4 writers x 5)") {
    val r = new Random(77)
    val dir = TestSpark.tmpDir("fuzz_occ") + "/t"
    ActionLog.append(Seq((0L, 0L)).toDF("k", "v").coalesce(1), dir, Some("k"))
    val batches = for (t <- 0 until 4; j <- 0 until 5) yield
      (t, j, (0 until 8).map(i =>
        ((t * 5 + j) * 100L + i, r.nextInt(1000).toLong)))
    val byThread = batches.groupBy(_._1)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (0 until 4).map { t =>
      new Thread(() =>
        try byThread(t).sortBy(_._2).foreach { case (_, _, rows) =>
          ActionLog.appendOcc(rows.toDF("k", "v").coalesce(1), dir, Some("k"))
          ()
        } catch { case x: Throwable => errs.add(x) })
    }
    threads.foreach(_.start())
    // clustering maintenance racing the writers: compaction's conflict
    // rule (remove exactly what it read) must commute with appends
    ActionLog.optimizeClustered(spark, dir)
    threads.foreach(_.join())
    assert(errs.isEmpty, s"no OCC writer may fail under contention: $errs")
    val vs = ActionLog.versions(spark, dir)
    assert(vs == (1L to vs.last) && vs.last >= 21L,
      s"history must stay contiguous with every append landed: $vs")
    val got = ActionLog.read(spark, dir).collect()
      .map(row => (row.getLong(0), row.getLong(1))).sorted.toSeq
    val want = ((0L, 0L) +: batches.flatMap(_._3)).sorted
    assert(got == want, "every committed batch must be present exactly once")
    assert(ActionLog.liveFiles(spark, dir).forall(_._2.isDefined),
      "maintenance under contention must re-record stats on every file")
  }
}
