package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.apache.spark.sql.functions._
import graft.ops.{DateDim, Dedup, Quality, SurrogateKeys, Upsert}

/** SURVEY §5 property tests (ScalaCheck): the algebraic contracts the
  * pipeline's correctness rests on, checked over generated inputs rather
  * than fixtures — dedup idempotence, MERGE key algebra + V4 forecast
  * consistency, calendar totality across year boundaries, and surrogate-key
  * permutation stability.
  */
class PropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val params = SCTest.Parameters.default.withMinSuccessfulTests(8)
  private def check(p: Prop): Unit = {
    val r = SCTest.check(params, p)
    assert(r.passed, r.status.toString)
  }

  private val genEvents: Gen[List[(Long, String, Long, Long, Double)]] =
    Gen.listOfN(40, for {
      user <- Gen.choose(1L, 5L)
      et <- Gen.oneOf("click", "view", "buy")
      ts <- Gen.choose(0L, 50L)
      id <- Gen.choose(0L, 1000L)
      v <- Gen.choose(-100.0, 100.0)
    } yield (user, et, ts, id, v))

  test("W1 dedup: one row per key, max (ts,id) wins, idempotent") {
    check(Prop.forAll(genEvents) { evs =>
      val df = evs.toDF("user", "et", "ts", "id", "v")
      val out = Dedup.latestBy(df, Seq($"user", $"et"), Seq($"ts", $"id")).collect()
      val byKey = evs.groupBy(e => (e._1, e._2))
      val oneRowPerKey = out.length == byKey.size
      val latestWins = out.forall { r =>
        val winner = byKey((r.getLong(0), r.getString(1)))
          .maxBy(e => (e._3, e._4)) // ORDER BY ts DESC, id DESC -> max tuple
        r.getLong(2) == winner._3 && r.getLong(3) == winner._4
      }
      val once = Dedup.latestBy(df, Seq($"user", $"et"), Seq($"ts", $"id"))
      val idempotent = Dedup.latestBy(once, Seq($"user", $"et"), Seq($"ts", $"id"))
        .exceptAll(once).isEmpty
      oneRowPerKey && latestWins && idempotent
    })
  }

  private val genKeyed: Gen[List[(Long, Double)]] =
    Gen.listOfN(15, Gen.zip(Gen.choose(0L, 10L), Gen.choose(0.0, 9.0)))
      .map(_.groupBy(_._1).map { case (k, vs) => (k, vs.head._2) }.toList) // keyed-unique

  test("J5 MERGE: post-merge keys unique, source wins, V4 forecast consistent") {
    check(Prop.forAll(Gen.zip(genKeyed, genKeyed)) { case (t, s) =>
      val target = t.toDF("k", "v")
      val source = s.toDF("k", "v")
      val merged = Upsert.merge(target, source, Seq("k")).collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val tKeys = t.map(_._1).toSet
      val sKeys = s.map(_._1).toSet
      val keysUnion = merged.keySet == (tKeys ++ sKeys)
      val sourceWins = s.forall { case (k, v) => merged(k) == v }
      val targetSurvives = t.filterNot(e => sKeys(e._1))
        .forall { case (k, v) => merged(k) == v }
      val m = Quality.premergeMetrics(source, target, Seq("k")).head()
      val forecast = m.getAs[Long]("est_inserts") == (sKeys -- tKeys).size.toLong &&
        m.getAs[Long]("est_updates") == (sKeys & tKeys).size.toLong
      keysUnion && sourceWins && targetSurvives && forecast
    })
  }

  test("D1-D10 totality: every derived calendar field lawful on arbitrary dates") {
    val genDays = Gen.listOfN(12, Gen.choose(-20000, 20000)) // ~1915..2024
    check(Prop.forAll(genDays) { days =>
      val df = days.distinct.toDF("d")
        .select(date_add(lit("2000-01-01").cast("date"), col("d")).as("d"))
      val rows = DateDim.fromDates(df, col("d")).collect()
      rows.length == days.distinct.size && rows.forall { r =>
        val d = r.getDate(r.fieldIndex("cal_date")).toLocalDate
        val dow = r.getAs[Int]("day_of_week")
        r.getAs[Int]("date_sk") == d.getYear * 10000 + d.getMonthValue * 100 + d.getDayOfMonth &&
          r.getAs[Int]("year_num") == d.getYear &&
          r.getAs[Int]("month_num") == d.getMonthValue &&
          r.getAs[Int]("day_num") == d.getDayOfMonth &&
          r.getAs[Int]("quarter_num") == (d.getMonthValue + 2) / 3 &&
          dow == d.getDayOfWeek.getValue % 7 && // Sunday=0 encoding
          r.getAs[Boolean]("is_weekend") == (dow == 0 || dow == 6) &&
          r.getAs[String]("month_name").length == 3 &&
          r.getAs[String]("day_name").length == 3 &&
          (1 to 53).contains(r.getAs[Int]("week_of_year"))
      }
    })
  }

  test("surrogate keys: dense 1..n, permutation-invariant mapping") {
    val genSyms = Gen.listOfN(12, Gen.stringOfN(4, Gen.alphaUpperChar)).map(_.distinct)
    check(Prop.forAll(genSyms) { syms =>
      syms.isEmpty || {
        def mapping(xs: List[String]) =
          SurrogateKeys.assign(xs.toDF("symbol"), "id", 7L, Seq("symbol"))
            .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        val a = mapping(syms)
        val b = mapping(scala.util.Random.shuffle(syms)) // input order must not matter
        a == b &&
          a.values.toList.sorted == (8L to 7L + syms.size).toList &&
          syms.sorted.zipWithIndex.forall { case (s, i) => a(s) == 8L + i }
      }
    })
  }

  test("rank rewrite: heap-planned rn <= k equals the in-memory model for random k") {
    val gen = for {
      evs <- genEvents
      k <- Gen.choose(1, 5)
    } yield (evs, k)
    check(Prop.forAll(gen) { case (evs, k) =>
      import org.apache.spark.sql.expressions.Window
      // make (ts, id) total within each key: ties in the rank order would be
      // legitimately nondeterministic under either physical plan
      val uniq = evs.groupBy(e => (e._1, e._2, e._3, e._4)).map(_._2.head).toList
      val df = uniq.toDF("user", "et", "ts", "id", "v")
      val w = Window.partitionBy($"user", $"et").orderBy($"ts".desc, $"id".desc)
      val q = df.withColumn("rn", row_number().over(w)).filter($"rn" <= k)
      // the session has RankFilterToTopK registered: assert the plan rode it
      val planned = q.queryExecution.executedPlan.toString.contains("TopKPerGroup")
      val got = q.select($"user", $"et", $"ts", $"id", $"rn").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getInt(4)))
        .toSet
      val model = uniq.groupBy(e => (e._1, e._2)).toSeq.flatMap { case ((u, et), rows) =>
        rows.sortBy(e => (-e._3, -e._4)).take(k)
          .zipWithIndex.map { case (e, i) => (u, et, e._3, e._4, i + 1) }
      }.toSet
      planned && got == model
    })
  }

  test("jaro_winkler algebra: identity, symmetry (bit-exact), range, empty-side zero") {
    val genStr = Gen.listOfN(8, Gen.oneOf('a', 'b', 'c', 'd')).map(_.mkString)
      .flatMap(s => Gen.choose(0, 8).map(s.take))
    check(Prop.forAll(genStr, genStr) { (a, b) =>
      import org.apache.spark.unsafe.types.UTF8String
      def jw(x: String, y: String) = graft.functions.JaroWinklerAlgo.compute(
        UTF8String.fromString(x), UTF8String.fromString(y))
      val ab = jw(a, b)
      val identity = a.isEmpty || jw(a, a) == 1.0
      // IEEE addition is commutative, so the symmetric formula is BIT-equal
      val symmetric = ab == jw(b, a)
      val inRange = ab >= 0.0 && ab <= 1.0
      val emptyZero = jw(a, "") == 0.0 && jw("", b) == 0.0
      identity && symmetric && inRange && emptyZero
    })
  }
}
