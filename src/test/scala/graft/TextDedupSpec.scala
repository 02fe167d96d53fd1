package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.dedup.{MinHashLSH, NgramJaccard, SimHash}
import graft.text.TextAnalysis

/** Dedup family semantics on constructed near/exact duplicates. */
class TextDedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog and runs far away home"
  private val docs = Seq(
    (1L, base),
    (2L, base),                                  // exact dup of 1
    (3L, base.replace("lazy", "sleepy")),        // near dup of 1
    (4L, "completely different words about spark catalyst optimizer plans here now")
  ).toDF("doc_id", "text")

  test("identical docs get identical minhash signatures; distinct docs differ") {
    val sig = MinHashLSH.signatures(
      MinHashLSH.shingles(docs, "doc_id", "text", 3), "doc_id", 8).collect()
    val byId = sig.map(r => r.getLong(0) -> (1 to 8).map(r.getLong)).toMap
    assert(byId(1L) === byId(2L), "exact dup -> equal signature")
    assert(byId(1L) !== byId(4L), "unrelated docs -> different signature")
  }

  test("LSH candidates find exact and near dup, not the unrelated doc") {
    val pairs = MinHashLSH.candidates(docs, "doc_id", "text").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)), "exact dup always collides in every band")
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L), "unrelated never a candidate")
  }

  test("maxBucketSize prunes degenerate buckets") {
    val many = (1L to 20L).map(i => (i, base)).toDF("doc_id", "text") // one mega-bucket
    val bands = MinHashLSH.bands(MinHashLSH.signatures(
      MinHashLSH.shingles(many, "doc_id", "text", 3), "doc_id", 8), "doc_id", 4, 2)
    assert(MinHashLSH.candidatePairs(bands, "doc_id", maxBucketSize = 5).count() === 0)
    assert(MinHashLSH.candidatePairs(bands, "doc_id").count() === 190) // 20 choose 2
  }

  test("simhash: exact dup distance 0, near dup small, unrelated large") {
    val sig = SimHash.signatures32(docs, "doc_id", "text")
    val d = sig.as("a").crossJoin(sig.as("b"))
      .select($"a.doc_id".as("ia"), $"b.doc_id".as("ib"),
        SimHash.hamming($"a.simhash", $"b.simhash").as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(d((1L, 2L)) === 0)
    assert(d((1L, 3L)) < d((1L, 4L)), "near dup closer than unrelated")
  }

  test("hammingNeighbors blocks correctly (pigeonhole over 4 bands)") {
    val sig = SimHash.signatures32(docs, "doc_id", "text")
    val n = SimHash.hammingNeighbors(sig, "doc_id", maxDist = 3)
      .as[(Long, Long, Int)].collect().toSet
    assert(n.exists(t => t._1 == 1L && t._2 == 2L && t._3 == 0))
  }

  test("ngram jaccard: exact dup = 1.0, known partial overlap exact") {
    val twoDocs = Seq((1L, "a b c d", "x"), (2L, "a b c e", "x")).toDF("doc_id", "text", "src")
    // 2-gram sets: {ab,bc,cd} vs {ab,bc,ce}: inter=2, union=4 -> 0.5
    val p = NgramJaccard.pairs(twoDocs, "doc_id", "text", "src", n = 2, minJ = 0.0).head()
    assert(p.getAs[Long]("inter") === 2 && p.getAs[Double]("jaccard") === 0.5)
    val dup = NgramJaccard.pairs(docs.withColumn("src", lit("s")),
      "doc_id", "text", "src", n = 3, minJ = 0.0)
      .filter($"id_a" === 1 && $"id_b" === 2).head()
    assert(dup.getAs[Double]("jaccard") === 1.0)
  }

  test("connected components: chain collapses, singleton survives, clique labels by min") {
    import graft.dedup.Components
    val nodes = (1L to 8L).toDF("doc_id")
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), // a 4-chain (diameter forces iterations)
      (6L, 7L), (7L, 8L), (6L, 8L)  // a triangle; 5 is a singleton
    ).toDF("id_a", "id_b")
    val cc = Components.connectedComponents(nodes, "doc_id", edges)
      .as[(Long, Long)].collect().toMap
    assert((1L to 4L).forall(cc(_) === 1L), "chain propagates the min id")
    assert(cc(5L) === 5L, "singleton keeps its own id")
    assert((6L to 8L).forall(cc(_) === 6L), "clique labels by min member")
  }

  test("verifyPairs scores exactly the given candidates, nothing else") {
    val sh = MinHashLSH.shingles(docs, "doc_id", "text", 3)
    val cand = Seq((1L, 2L), (1L, 3L)).toDF("id_a", "id_b") // 1-4 deliberately absent
    val out = NgramJaccard.verifyPairs(cand, sh, "doc_id").collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) -> r.getAs[Double]("jaccard"))
      .toMap
    assert(out.keySet === Set((1L, 2L), (1L, 3L)), "only candidate pairs scored")
    assert(out((1L, 2L)) === 1.0, "exact dup")
    assert(out((1L, 3L)) > 0 && out((1L, 3L)) < 1.0, "near dup partial overlap")
  }

  test("language-ID prefers the profile with most stopword hits") {
    val t = Seq(
      (1L, "the cat and the dog of the house"),
      (2L, "el la de que y los otros"),
      (3L, "der die das und ist von hier")).toDF("doc_id", "text")
    val out = t.select($"doc_id",
      TextAnalysis.langIdCol(MinHashLSH.tokensCol($"text")).as("lang"))
      .as[(Long, String)].collect().toMap
    assert(out(1L) === "en" && out(2L) === "es" && out(3L) === "de")
  }

  test("quality features: exact counts and clamped score") {
    val t = Seq((1L, "the cat!! sat?")).toDF("doc_id", "text")
    val f = TextAnalysis.qualityFeatures(t, "doc_id", "text").head()
    assert(f.getAs[Int]("n_chars") === 14)
    assert(f.getAs[Int]("n_tokens") === 3)
    assert(f.getAs[Int]("n_punct") === 3)
    assert(f.getAs[Int]("n_stop") === 1)
    val score = f.getAs[Double]("quality_score")
    assert(score >= 0.0 && score <= 1.0)
  }

  test("token counts: whitespace vs BPE-ish segmentation") {
    val t = Seq((1L, "ab 12 c!")).toDF("doc_id", "text")
    val c = TextAnalysis.tokenCounts(t, "doc_id", "text").head()
    assert(c.getAs[Int]("n_ws_tokens") === 3)
    assert(c.getAs[Int]("n_bpe_tokens") === 5, "ab|1|2|c|!")
    assert(c.getAs[Long]("n_chars_div4") === 2L)
  }

  test("fingerprints: equal for exact dups, shingle count correct") {
    val fp = TextAnalysis.fingerprints(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2), r.getLong(3))).toMap
    assert(fp(1L) === fp(2L))
    assert(fp(1L)._3 === 12, "14 tokens -> 12 distinct 3-grams")
  }
}
