package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.similarity.Knn

/** ANN correctness: known-geometry cosines, brute-force vs IVF recall. */
class KnnSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val vecs = Seq(
    (0L, Array(1.0f, 0.0f), 0),
    (1L, Array(0.9f, 0.1f), 0),   // closest to 0
    (2L, Array(0.0f, 1.0f), 1),
    (3L, Array(-1.0f, 0.0f), 1),
    (4L, Array(0.7f, 0.7f), 0)
  ).toDF("vec_id", "embedding", "label")

  test("brute-force top-k ranks by cosine with deterministic tiebreak") {
    val out = Knn.bruteForceTopK(vecs.filter($"vec_id" === 0), vecs,
      "vec_id", "vec_id", "embedding", k = 4)
      .orderBy("rank").select("neighbor_id").as[Long].collect()
    assert(out === Array(1L, 4L, 2L, 3L), "by decreasing cosine to (1,0)")
  }

  test("cosine values are exact for known geometry") {
    val out = Knn.bruteForceTopK(vecs.filter($"vec_id" === 0), vecs,
      "vec_id", "vec_id", "embedding", k = 4).collect()
      .map(r => r.getAs[Long]("neighbor_id") -> r.getAs[Double]("cosine_sim")).toMap
    assert(out(2L) === 0.0 && out(3L) === -1.0)
    assert(math.abs(out(4L) - math.sqrt(0.5)) < 1e-9)
  }

  test("IVF with nprobe = all cells matches brute force exactly") {
    val bf = Knn.bruteForceTopK(vecs.filter($"vec_id" < 2), vecs,
      "vec_id", "vec_id", "embedding", k = 3)
      .select("query_id", "neighbor_id", "rank")
    val ivf = Knn.ivfTopK(vecs.filter($"vec_id" < 2), vecs,
      "vec_id", "vec_id", "embedding", "label", k = 3, nprobe = 2)
      .select("query_id", "neighbor_id", "rank")
    assert(bf.exceptAll(ivf).isEmpty && ivf.exceptAll(bf).isEmpty,
      "probing every cell recovers exact search")
  }

  test("IVF with nprobe=1 searches only the nearest cell") {
    val out = Knn.ivfTopK(vecs.filter($"vec_id" === 0), vecs,
      "vec_id", "vec_id", "embedding", "label", k = 4, nprobe = 1)
    assert(out.select("probed_cell").distinct().as[Int].collect() === Array(0),
      "query (1,0) probes cell 0 only")
    assert(out.count() === 2, "only the 2 other members of cell 0 scanned")
  }

  test("near-dup pairs respect block and threshold") {
    val p = Knn.nearDupPairs(vecs, "vec_id", "embedding", "label", minSim = 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(p === Set((0L, 1L)), "only the 0.9-similar same-label pair")
  }

  test("IVF recall on real embeddings is measurable against brute force") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val q = emb.filter($"vec_id" < 10)
    val bf = Knn.bruteForceTopK(q, emb, "vec_id", "vec_id", "embedding", 5)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val ivf = Knn.ivfTopK(q, emb, "vec_id", "vec_id", "embedding", "label", 5, 3)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (bf intersect ivf).size.toDouble / bf.size
    assert(recall > 0.0 && recall <= 1.0)
    info(f"IVF nprobe=3/10 recall@5 = $recall%.2f")
  }
}
