package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Accuracy contracts of the content-addressed sketches (q81/q82): the
  * oracle proves determinism; these prove the estimates are close to the
  * exact answers they stand in for.
  */
class SketchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // sf0.01: large enough that every group exceeds the k=256 sketch capacity
  private val sf = "/root/testdata/sf0.01"

  test("KMV estimate is within 15% of the exact distinct count when saturated") {
    val exact = Tables.load(spark, sf, "lineitem")
      .groupBy($"l_returnflag").agg(countDistinct($"l_partkey").as("exact"))
      .as[(String, Long)].collect().toMap
    val est = SparkEntry.queries("q81_kmv_distinct")(spark, sf)
      .select($"l_returnflag", $"n_kept", $"est_distinct")
      .collect()
    assert(est.nonEmpty)
    est.foreach { r =>
      val (flag, kept, e) = (r.getString(0), r.getLong(1), r.getDouble(2))
      val x = exact(flag)
      if (kept == 256) {
        // KMV relative error ~ 1/sqrt(k-2) ≈ 6.3%; allow 2.4 sigma
        assert(math.abs(e - x) / x < 0.15, s"$flag: est $e vs exact $x")
      } else assert(e === x.toDouble, s"$flag below capacity must be exact")
    }
  }

  test("hash-sampled quantiles track the exact quantiles") {
    val exact = Tables.load(spark, sf, "orders")
      .groupBy($"o_orderpriority")
      .agg(expr("percentile(o_totalprice, 0.5)").as("p50"))
      .as[(String, Double)].collect().toMap
    val sampled = SparkEntry.queries("q82_sampled_quantiles")(spark, sf)
      .select($"o_orderpriority", $"n_sample", $"p50").collect()
    assert(sampled.nonEmpty)
    sampled.foreach { r =>
      val (prio, n, p50) = (r.getString(0), r.getLong(1), r.getDouble(2))
      assert(n > 100, s"$prio: sample too small to be meaningful")
      // medians of heavy-tailed prices: sample median within 20% of exact
      assert(math.abs(p50 - exact(prio)) / exact(prio) < 0.2,
        s"$prio: sampled p50 $p50 vs exact ${exact(prio)}")
    }
  }

  test("the sample is a ~10% Bernoulli draw") {
    val total = Tables.load(spark, sf, "orders").count()
    val n = SparkEntry.queries("q82_sampled_quantiles")(spark, sf)
      .agg(sum($"n_sample")).as[Long].head()
    val rate = n.toDouble / total
    assert(rate > 0.07 && rate < 0.13, s"sample rate $rate")
  }

  test("Misra-Gries theorems hold under arbitrary merge trees") {
    val k = 4
    val mg = new graft.analytics.MisraGries(k)
    // deterministic skewed stream: 'hot' dominates, mid-weight terms, a
    // long tail of singletons — the shape the decrement step must survive
    val stream: Seq[String] =
      Seq.fill(120)("hot") ++ Seq.fill(40)("warm") ++ Seq.fill(25)("mild") ++
        (0 until 80).map(i => s"tail${i % 37}") ++ Seq.fill(15)("warm")
    val n = stream.length.toLong
    val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    def check(summary: Map[String, Long]): Unit = {
      exact.foreach { case (t, c) =>
        if (c > n / k) assert(summary.contains(t), s"heavy '$t' ($c > ${n / k}) missing")
      }
      summary.foreach { case (t, est) =>
        val truth = exact.getOrElse(t, 0L)
        assert(est <= truth && truth - est <= n / k, s"'$t': est=$est true=$truth")
      }
      assert(summary.size <= k, "bounded state")
    }
    // single sequential pass
    check(stream.foldLeft(mg.zero)(mg.reduce))
    // two different merge trees over 7 uneven chunks
    val chunks = Seq(stream.take(13), stream.slice(13, 50), stream.slice(50, 51),
      stream.slice(51, 120), stream.slice(120, 200), stream.slice(200, 230),
      stream.drop(230)).map(_.foldLeft(mg.zero)(mg.reduce))
    check(chunks.reduceLeft(mg.merge))
    check(chunks.reduceRight(mg.merge))
  }
}
