package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Structural invariants of the q66-q75 analytics operators — the oracle
  * checks values; these pin the algebra (range validity, spine density,
  * bin balance) on the smoke testdata.
  */
class AnalyticsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("scd2: per user, validity ranges are ordered, non-overlapping, and alternate status") {
    val rows = q("q66_scd2_dim")
      .select($"user_id", $"status", $"valid_from", $"valid_to", $"n_days")
      .collect()
      .groupBy(_.getLong(0))
    rows.foreach { case (user, rs) =>
      val sorted = rs.sortBy(_.getDate(2).toLocalDate.toEpochDay)
      sorted.foreach { r =>
        assert(!r.getDate(2).after(r.getDate(3)), s"user $user: valid_from <= valid_to")
      }
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getDate(3).before(b.getDate(2)),
            s"user $user: ranges must not overlap or touch out of order")
          assert(a.getString(1) != b.getString(1),
            s"user $user: consecutive islands must differ in status (else not maximal)")
        case _ => ()
      }
    }
  }

  test("scd2: island day counts sum to the user's distinct active days") {
    val ev = Tables.load(spark, sf, "events")
      .select($"user_id", to_date($"ts").as("day")).distinct()
      .groupBy($"user_id").agg(count(lit(1)).as("n_active"))
    val scd = q("q66_scd2_dim").groupBy($"user_id").agg(sum($"n_days").as("n_scd"))
    val bad = ev.join(scd, Seq("user_id"))
      .filter($"n_active" =!= $"n_scd").count()
    assert(bad === 0, "every active day belongs to exactly one validity island")
  }

  test("gap fill: spine is dense per key and filled rows carry the prior observation") {
    val out = q("q67_gap_fill")
      .select($"l_suppkey", $"cal_day", $"filled", $"revenue_locf").collect()
      .groupBy(_.getLong(0))
    out.foreach { case (sk, rs) =>
      val sorted = rs.sortBy(_.getDate(1).toLocalDate.toEpochDay)
      // dense: consecutive rows are exactly one day apart
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getDate(1).toLocalDate.toEpochDay - a.getDate(1).toLocalDate.toEpochDay === 1,
            s"suppkey $sk: spine has a hole")
          if (b.getBoolean(2)) // filled -> value carried from predecessor
            assert(b.getDouble(3) === a.getDouble(3), s"suppkey $sk: LOCF must carry prior value")
        case _ => ()
      }
      assert(!sorted.head.getBoolean(2), s"suppkey $sk: first spine day is observed by construction")
    }
  }

  test("unpivot: 3 long rows per wide row, measures complete") {
    val long = q("q68_unpivot")
    val n = long.count()
    // (l_orderkey, l_linenumber) is NOT unique in the synthetic lineitem —
    // compare against the wide row count, not the distinct key count
    val wide = Tables.load(spark, sf, "lineitem")
      .filter($"l_shipdate" >= lit("1995-03-01 00:00:00").cast("timestamp") &&
        $"l_shipdate" < lit("1995-04-01 00:00:00").cast("timestamp")).count()
    assert(n === 3 * wide)
    val measures = long.select($"measure").distinct().as[String].collect().sorted
    assert(measures === Array("discount", "extendedprice", "tax"))
  }

  test("decile bins are equal-frequency within 1") {
    val sizes = q("q75_decile_stats").select($"n_docs").as[Long].collect()
    assert(sizes.max - sizes.min <= 1, s"bin sizes $sizes")
    // and bins are ordered by the value range they cover
    val byDecile = q("q75_decile_stats")
      .orderBy($"decile").select($"min_chars", $"max_chars").collect()
    byDecile.sliding(2).foreach {
      case Array(a, b) => assert(a.getLong(1) <= b.getLong(0), "decile ranges must be ordered")
      case _ => ()
    }
  }

  test("z-score: every flagged row is > 3 sample stddevs from its group mean (direct recompute)") {
    val ev = Tables.load(spark, sf, "events").select($"event_type", $"value").collect()
      .groupBy(_.getString(0)).map { case (t, rs) =>
        val vs = rs.map(_.getDouble(1))
        val n = vs.length
        val mean = vs.sum / n
        val sd = math.sqrt(vs.map(v => (v - mean) * (v - mean)).sum / (n - 1))
        t -> (mean, sd)
      }
    val flagged = q("q71_zscore_anomaly").collect()
    assert(flagged.nonEmpty, "smoke data contains anomalies")
    flagged.foreach { r =>
      val (mean, sd) = ev(r.getString(1))
      val z = (r.getDouble(2) - mean) / sd
      // value was rounded to 6dp in the output; allow that quantization
      assert(math.abs(z) > 2.99, s"event ${r.getLong(0)}: |z|=$z not anomalous")
    }
  }

  test("correlation is symmetric-bounded and agrees with a driver-side recompute") {
    val daily = Tables.load(spark, sf, "lineitem")
      .filter($"l_suppkey" % 20 === 1)
      .groupBy($"l_suppkey", to_date($"l_shipdate").as("d"))
      .agg(sum($"l_extendedprice".cast("decimal(18,6)")).cast("double").as("rev"))
      .collect().groupBy(_.getLong(0))
      .map { case (k, rs) => k -> rs.map(r => r.getDate(1).toString -> r.getDouble(2)).toMap }
    q("q72_corr_pairs").collect().foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      assert(a < b, "pairs are canonical (sk_a < sk_b)")
      val common = daily(a).keySet intersect daily(b).keySet
      val xs = common.toSeq.sorted.map(daily(a))
      val ys = common.toSeq.sorted.map(daily(b))
      val n = xs.length
      val (mx, my) = (xs.sum / n, ys.sum / n)
      val cov = xs.zip(ys).map { case (x, y) => (x - mx) * (y - my) }.sum
      val ref = cov / math.sqrt(xs.map(x => (x - mx) * (x - mx)).sum *
        ys.map(y => (y - my) * (y - my)).sum)
      val got = r.getDouble(3)
      assert(math.abs(got - ref) < 1e-4, s"pair ($a,$b): $got vs recomputed $ref")
      assert(got >= -1.0000001 && got <= 1.0000001)
    }
  }

  test("rollup emits the full subtotal hierarchy") {
    val out = q("q73_rollup").collect()
    val grand = out.filter(r => r.isNullAt(0) && r.isNullAt(1))
    val yearSub = out.filter(r => !r.isNullAt(0) && r.isNullAt(1))
    val leaves = out.filter(r => !r.isNullAt(0) && !r.isNullAt(1))
    assert(grand.length === 1)
    assert(yearSub.nonEmpty && leaves.nonEmpty)
    assert(grand.head.getLong(2) === leaves.map(_.getLong(2)).sum,
      "grand total equals the sum of the leaves")
  }

  test("histogram bins partition the orders") {
    val out = q("q74_histogram").collect()
    val total = Tables.load(spark, sf, "orders").count()
    assert(out.map(_.getLong(1)).sum === total)
    assert(out.forall(r => r.getInt(0) >= 0 && r.getInt(0) <= 19))
  }

  test("q96 array form: true nested output is sorted and the catalog string is its canonical join") {
    val core = queries.AnalyticsQueries.arrayAggCore(spark, sf).collect()
    assert(core.nonEmpty)
    core.foreach { r =>
      val arr = r.getSeq[Int](1)
      assert(arr == arr.sorted, s"order ${r.getLong(0)}: array must be sorted")
      assert(arr.length.toLong === r.getLong(2), "n_lines equals array length")
    }
    // The catalog (oracle-facing) entry is exactly the joined-string
    // projection of the true-array API — no information loss beyond type.
    val joined = q("q96_array_agg").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    core.foreach { r =>
      assert(joined(r.getLong(0)) === r.getSeq[Int](1).mkString(","))
    }
  }
}
