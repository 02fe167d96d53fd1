package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.NfcNormalize

/** Hand-computed cases for the evaluation/statistics wave (q150-q162):
  * skyline domination, exact AUC, Cohen's kappa, weighted median, OLS,
  * changepoint, NFC normalization.
  */
class EvalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("2-D skyline: domination semantics on a hand case") {
    // minimize price, maximize size. (10,5) dominates (12,5) and (10,4);
    // (8,3) survives (cheapest), (10,5) survives, (15,9) survives (biggest)
    val parts = Seq(
      ("B", 10.0, 5), ("B", 12.0, 5), ("B", 10.0, 4),
      ("B", 8.0, 3), ("B", 15.0, 9), ("B", 16.0, 9)
    ).toDF("p_brand", "price", "best_size")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"p_brand").orderBy($"price")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val g = parts.groupBy($"p_brand", $"price").agg(max($"best_size").as("best_size"))
    val sky = g.withColumn("prev_max", max($"best_size").over(w))
      .filter($"prev_max".isNull || $"best_size" > $"prev_max")
      .select($"price", $"best_size").orderBy($"price")
      .collect().map(r => (r.getDouble(0), r.getInt(1))).toSeq
    assert(sky === Seq((8.0, 3), (10.0, 5), (15.0, 9)))
  }

  test("exact AUC: perfect, inverted, and tied rankings") {
    def auc(rows: Seq[(Double, Boolean)]): Double = {
      val df = rows.toDF("score", "is_pos")
      val g = df.groupBy($"score").agg(
        sum(when($"is_pos", 1L).otherwise(0L)).as("pos"),
        sum(when(!$"is_pos", 1L).otherwise(0L)).as("neg"))
      val cum = graft.ops.PrefixSum.runningSum(
        g.select($"score", coalesce($"pos", lit(0L)).as("pos"),
          coalesce($"neg", lit(0L)).as("neg")), Seq("score"), "neg", "neg_incl")
      cum.agg(
        (sum($"pos" * (lit(2) * ($"neg_incl" - $"neg") + $"neg")).cast("double") /
          (lit(2) * sum($"pos") * sum($"neg")).cast("double")).as("auc"))
        .head().getDouble(0)
    }
    // every positive above every negative -> 1.0
    assert(auc(Seq((1.0, false), (2.0, false), (3.0, true), (4.0, true))) === 1.0)
    // inverted -> 0.0
    assert(auc(Seq((1.0, true), (2.0, true), (3.0, false), (4.0, false))) === 0.0)
    // all tied -> 0.5
    assert(auc(Seq((1.0, true), (1.0, false), (1.0, true), (1.0, false))) === 0.5)
    // textbook mixed case: pos {2,4}, neg {1,3}: pairs (2>1),(4>1),(4>3) of 4 -> 0.75
    assert(auc(Seq((1.0, false), (2.0, true), (3.0, false), (4.0, true))) === 0.75)
  }

  test("Cohen's kappa: perfect agreement is 1, marginal-random is 0") {
    def kappa(pairs: Seq[(String, String)]): Double = {
      val conf = pairs.toDF("gold", "pred")
        .groupBy($"gold", $"pred").agg(count(lit(1)).as("n"))
      val tot = conf.agg(sum($"n").as("nn"),
        sum(when($"gold" === $"pred", $"n").otherwise(0L)).as("diag")).head()
      val (nn, diag) = (tot.getLong(0), tot.getLong(1))
      val e = conf.groupBy($"gold".as("lbl")).agg(sum($"n").as("rn"))
        .join(conf.groupBy($"pred".as("lbl")).agg(sum($"n").as("cn")), "lbl")
        .agg(coalesce(sum($"rn" * $"cn"), lit(0L))).head().getLong(0)
      (nn.toDouble * diag - e) / (nn.toDouble * nn - e)
    }
    assert(kappa(Seq(("a", "a"), ("b", "b"), ("a", "a"))) === 1.0)
    // pred is constant 'a': po = 0.5, pe = 0.5 -> kappa 0
    assert(kappa(Seq(("a", "a"), ("b", "a"))) === 0.0)
    // classic 2x2: 20 aa, 5 ab, 10 ba, 15 bb -> po=.7, pe=.5 -> kappa=.4
    val pairs = Seq.fill(20)(("a", "a")) ++ Seq.fill(5)(("a", "b")) ++
      Seq.fill(10)(("b", "a")) ++ Seq.fill(15)(("b", "b"))
    assert(math.abs(kappa(pairs) - 0.4) < 1e-12)
  }

  test("weighted median: cumulative half-total rule, exact at the boundary") {
    val g = Seq(("A", 1.0, 1L), ("A", 2.0, 1L), ("A", 3.0, 2L), ("B", 5.0, 3L))
      .toDF("flag", "price", "w")
    val wCum = org.apache.spark.sql.expressions.Window
      .partitionBy($"flag").orderBy($"price")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy($"flag")
    val med = g.withColumn("cum", sum($"w").over(wCum))
      .withColumn("tot", sum($"w").over(wAll))
      .groupBy($"flag")
      .agg(min(when(lit(2) * $"cum" >= $"tot", $"price")).as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // A: weights 1,1,2 of total 4 -> cum at 2.0 is 2, 2*2>=4 -> median 2.0
    assert(med === Map("A" -> 2.0, "B" -> 5.0))
  }

  test("OLS power sums recover an exact linear relation") {
    // y = 3x + 7 exactly -> slope 3, intercept 7
    val df = Seq((1, 10.0), (2, 13.0), (3, 16.0), (4, 19.0))
      .toDF("x", "y").withColumn("b", lit("Z"))
    val a = df.groupBy($"b").agg(count(lit(1)).as("n"),
      sum($"x".cast("long")).as("sx"),
      sum($"y".cast("decimal(18,6)")).as("sy"),
      sum($"x".cast("long") * $"y".cast("decimal(18,6)")).as("sxy"),
      sum($"x".cast("long") * $"x".cast("long")).as("sxx"))
    val num = ($"n" * $"sxy" - $"sx" * $"sy").cast("double")
    val den = ($"n" * $"sxx" - $"sx" * $"sx").cast("double")
    val r = a.select((num / den).as("slope"),
      (($"sy".cast("double") - num / den * $"sx".cast("double")) /
        $"n".cast("double")).as("intercept")).head()
    assert(r.getDouble(0) === 3.0 && r.getDouble(1) === 7.0)
  }

  test("changepoint: a planted level shift maximizes |cumulative deviation| at the step") {
    // series 0,0,0,0,6,6,6,6 over 8 days: mean 3; S_d*n peaks (in abs) at day 4
    val days = (1 to 8).map(d => (f"2024-01-$d%02d", if (d <= 4) 0L else 6L))
    val d = days.toDF("day", "x").select(to_date($"day").as("day"), $"x")
    val wOrd = org.apache.spark.sql.expressions.Window.orderBy($"day")
    val c = d
      .withColumn("cum", sum($"x").over(wOrd.rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)))
      .withColumn("idx", row_number().over(wOrd))
      .withColumn("total", sum($"x").over(
        org.apache.spark.sql.expressions.Window.partitionBy()))
      .withColumn("n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy()))
      .withColumn("dev_n", $"n" * $"cum" - $"idx" * $"total")
    val top = c.orderBy(abs($"dev_n").desc, $"day").select($"day", $"dev_n").head()
    assert(top.getDate(0).toString === "2024-01-04")
    assert(top.getLong(1) === -96L) // 8*0 - 4*24
  }

  test("NFC normalization: composes decomposed sequences, identity on NFC text") {
    val df = Seq(
      ("étude", "étude"),   // decomposed -> precomposed
      ("plain ascii", "plain ascii"),  // untouched
      ("café", "café")       // already NFC
    ).toDF("s", "want")
    val bad = df.filter(NfcNormalize($"s") =!= $"want").count()
    assert(bad === 0)
    // char count shrinks by exactly the composed pairs
    val lens = df.select(length($"s"), length(NfcNormalize($"s"))).collect()
      .map(r => (r.getInt(0), r.getInt(1))).toSeq
    assert(lens === Seq((6, 5), (11, 11), (4, 4)))
  }
}
