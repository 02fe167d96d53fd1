package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Structural invariants of the round-3 curation / window / graph operators —
  * the oracle checks values; these pin the algebra on the smoke testdata.
  */
class CurationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q106 repetition signals are well-formed ratios") {
    val rows = q("q106_repetition").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nWords, nDistinct) = (r.getLong(1), r.getLong(2))
      assert(nDistinct >= 1 && nDistinct <= nWords)
      assert(r.getDouble(3) > 0 && r.getDouble(3) <= 1, "distinct_ratio in (0,1]")
      assert(r.getDouble(4) > 0 && r.getDouble(4) <= 1, "top_word_frac in (0,1]")
      assert(r.getDouble(5) >= 0 && r.getDouble(5) < 1, "dup_3gram_frac in [0,1)")
    }
  }

  test("q112 decontamination flags only train docs, each with a real hit") {
    q("q112_decontamination").collect().foreach { r =>
      assert(r.getLong(0) % 50 != 0, "eval docs must never appear as contaminated train docs")
      assert(r.getLong(1) >= 1 && r.getLong(2) >= 1)
    }
  }

  test("q113 rarity is bounded by [1, N]") {
    val n = Tables.load(spark, sf, "documents").count()
    q("q113_rarity_score").collect().foreach { r =>
      val rarity = r.getDouble(3)
      assert(rarity >= 1.0 - 1e-9, s"df <= N forces rarity >= 1, got $rarity")
      assert(rarity <= n + 1e-9, s"df >= 1 forces rarity <= N, got $rarity")
    }
  }

  test("q114 quantization: codes saturate inside [0,255] and reconstruct within one step") {
    q("q114_quantization").collect().foreach { r =>
      assert(r.getLong(2) >= 0 && r.getLong(3) <= 255)
      assert(r.getLong(1) <= 255L * 64)
      assert(r.getLong(4) + r.getLong(5) <= 64)
    }
    // reconstruction: dequantized midpoint is within one quantization step
    val x = Tables.load(spark, sf, "embeddings")
      .select(col("vec_id"), explode(sequence(lit(0), lit(63))).as("pos"), col("embedding"))
      .select(col("vec_id"), col("pos"),
        element_at(col("embedding"), col("pos") + 1).cast("double").as("v"))
    val st = x.groupBy(col("pos")).agg(min(col("v")).as("lo"), max(col("v")).as("hi"))
    val step = (col("hi") - col("lo")) / lit(255.0)
    val code = least(floor((col("v") - col("lo")) / step).cast("long"), lit(255L))
    val bad = x.join(broadcast(st), Seq("pos")).filter(col("hi") > col("lo"))
      .select(col("v"), col("lo"), step.as("stp"), code.as("c"))
      .filter(abs(col("v") - (col("lo") + col("c") * col("stp"))) > col("stp") * 1.000001)
      .count()
    assert(bad === 0, "every value reconstructs within one quantization step")
  }

  test("q115 pagerank: fixed-point mass is conserved up to truncation, ranks are positive") {
    val rows = q("q115_pagerank").collect()
    val n = rows.length
    val total = rows.map(_.getLong(1)).sum
    val scale = 1000000000000L
    // each iteration floors once per edge (src-side) plus once per node
    // (damping + base) — sub-ppm of the total mass on any graph
    assert(total <= scale && total >= scale - scale / 1000000L,
      s"rank mass $total must be scale minus bounded truncation")
    val base = (15L * scale / 100) / n
    rows.foreach(r => assert(r.getLong(1) >= base, "teleport floor"))
  }

  test("q108/q110 window family: quartiles complete, one mode per month") {
    val ranks = q("q108_rank_variants").collect()
    assert(ranks.map(_.getInt(3)).toSet === Set(1, 2, 3, 4))
    ranks.foreach { r =>
      assert(r.getDouble(4) >= 0 && r.getDouble(4) <= 1)
      assert(r.getDouble(5) > 0 && r.getDouble(5) <= 1)
    }
    val modes = q("q110_mode").collect()
    assert(modes.map(_.getInt(0)).distinct.length === modes.length, "one modal row per month")
    assert(modes.length === 12)
  }
}
