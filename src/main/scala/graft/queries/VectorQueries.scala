package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.similarity.Knn

/** Similarity search over the `embeddings` corpus: brute-force cosine top-k
  * (the exactness baseline), IVF cell-probed ANN (the scale path), and
  * embedding-cosine near-dup pairs.
  */
object VectorQueries {

  private val cosineSql =
    "list_dot_product(%s, %s) / (sqrt(list_dot_product(%s, %s)) * sqrt(list_dot_product(%s, %s)))"

  private def cos(a: String, b: String) = cosineSql.format(a, b, a, a, b, b)

  val all: Seq[Q] = Seq(

    // ---------------------------------------------------------------- q25
    // Brute-force cosine top-5 for 20 query vectors: Q×N fused scan, per-
    // query window for the top-k, double arithmetic as an in-order fold.
    Q("q25_knn_cosine",
      s"""WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
        |           FROM embeddings WHERE vec_id < 20),
        |c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv FROM embeddings),
        |s AS (SELECT query_id, neighbor_id, ${cos("qv", "cv")} AS cosine_sim
        |      FROM q, c WHERE query_id <> neighbor_id)
        |SELECT query_id, neighbor_id, cosine_sim, rank FROM (
        |  SELECT *, row_number() OVER (PARTITION BY query_id
        |    ORDER BY cosine_sim DESC, neighbor_id) AS rank FROM s)
        |WHERE rank <= 5""".stripMargin) { (s, dir) =>
      val emb = Tables.load(s, dir, "embeddings")
      Knn.bruteForceTopK(emb.filter(col("vec_id") < 20), emb,
        "vec_id", "vec_id", "embedding", k = 5)
    },

    // ---------------------------------------------------------------- q26
    // IVF ANN: label column as the coarse-quantizer cell, decimal-exact
    // centroids, nprobe=2 — scans |probed cells| / |cells| of the corpus.
    Q("q26_ivf_knn",
      s"""WITH c AS (SELECT label, vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |pe AS (SELECT label, unnest(v) AS val, unnest(generate_series(1, len(v))) AS pos FROM c),
        |comp AS (SELECT label, pos,
        |    CAST(SUM(CAST(val AS DECIMAL(27,10))) AS DOUBLE) / COUNT(*) AS comp
        |  FROM pe GROUP BY 1, 2),
        |cents AS (SELECT label, list(comp ORDER BY pos) AS centroid FROM comp GROUP BY label),
        |q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
        |      FROM embeddings WHERE vec_id < 20),
        |probes AS (SELECT query_id, qv, label FROM (
        |  SELECT q.query_id, q.qv, ce.label,
        |    row_number() OVER (PARTITION BY q.query_id
        |      ORDER BY ${cos("q.qv", "ce.centroid")} DESC, ce.label) AS pr
        |  FROM q, cents ce) WHERE pr <= 2)
        |SELECT query_id, probed_cell, neighbor_id, cosine_sim, rank FROM (
        |  SELECT p.query_id, c.label AS probed_cell, c.vec_id AS neighbor_id,
        |    ${cos("p.qv", "c.v")} AS cosine_sim,
        |    row_number() OVER (PARTITION BY p.query_id
        |      ORDER BY ${cos("p.qv", "c.v")} DESC, c.vec_id) AS rank
        |  FROM c JOIN probes p USING (label) WHERE p.query_id <> c.vec_id)
        |WHERE rank <= 5""".stripMargin) { (s, dir) =>
      val emb = Tables.load(s, dir, "embeddings")
      Knn.ivfTopK(emb.filter(col("vec_id") < 20), emb,
        "vec_id", "vec_id", "embedding", cellCol = "label", k = 5, nprobe = 2)
    },

    // ---------------------------------------------------------------- q40
    // Sign-LSH bucketed ANN: 8 portable Rademacher hyperplanes (md5-parity,
    // emitted as literal arrays on both engines so the projections are the
    // same in-order double folds), bucket-collision candidates only.
    Q("q40_lsh_knn", {
      def planeSql(p: Int): String =
        (0 until 64).map { d =>
          val hex = java.security.MessageDigest.getInstance("MD5")
            .digest(s"${p}_$d".getBytes("UTF-8"))
          if (((hex(0) >> 4) & 0xf) % 2 == 0) "1.0" else "-1.0"
        }.mkString("[", ",", "]::DOUBLE[]")
      val bucketExpr = (0 until 8).map(p =>
        s"(CASE WHEN list_dot_product(v, ${planeSql(p)}) > 0 THEN ${1 << p} ELSE 0 END)")
        .mkString(" + ")
      s"""WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |b AS (SELECT vec_id, v, $bucketExpr AS bucket FROM c),
        |q AS (SELECT vec_id AS query_id, v AS qv, bucket FROM b WHERE vec_id < 20)
        |SELECT query_id, bucket, neighbor_id, cosine_sim, rank FROM (
        |  SELECT q.query_id, q.bucket, b.vec_id AS neighbor_id,
        |    ${cos("q.qv", "b.v")} AS cosine_sim,
        |    row_number() OVER (PARTITION BY q.query_id
        |      ORDER BY ${cos("q.qv", "b.v")} DESC, b.vec_id) AS rank
        |  FROM b JOIN q USING (bucket) WHERE q.query_id <> b.vec_id)
        |WHERE rank <= 5""".stripMargin
    }) { (s, dir) =>
      val emb = Tables.load(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
      graft.similarity.SignLSH.bucketTopK(emb.filter(col("vec_id") < 20), emb,
        "vec_id", "vec_id", "embedding", nBits = 8, dim = 64, k = 5)
    },

    // ---------------------------------------------------------------- q27
    // Embedding-cosine near-duplicate pairs, blocked by label (the block
    // bounds the quadratic expansion the way LSH bands do for text).
    Q("q27_embedding_neardup",
      s"""WITH c AS (SELECT label, vec_id, embedding::DOUBLE[] AS v FROM embeddings)
        |SELECT a.label, a.vec_id AS id_a, b.vec_id AS id_b,
        |  ${cos("a.v", "b.v")} AS cosine_sim
        |FROM c a JOIN c b ON a.label = b.label AND a.vec_id < b.vec_id
        |WHERE ${cos("a.v", "b.v")} >= 0.3""".stripMargin) { (s, dir) =>
      Knn.nearDupPairs(Tables.load(s, dir, "embeddings"),
        "vec_id", "embedding", "label", minSim = 0.3)
    },

    // ---------------------------------------------------------------- q84
    // Per-label embedding component moments (leading 8 dims): centroid and
    // variance from exact decimal power sums — the k-means/update step and
    // the feature-quality diagnostic in one distributed pass. The vector
    // column is decomposed positionally (explode of a literal index range —
    // narrow, no UDF), moments accumulate per (label, pos) exactly, and the
    // statistic derives in scalar double arithmetic (q71's determinism
    // argument, applied element-wise to vectors).
    Q("q114_quantization",
      """WITH x AS (SELECT vec_id, t.pos, CAST(embedding[t.pos + 1] AS DOUBLE) AS v
        |           FROM embeddings, range(64) t(pos)),
        |st AS (SELECT pos, min(v) AS lo, max(v) AS hi FROM x GROUP BY 1),
        |qn AS (SELECT vec_id,
        |  least(CAST(floor((v - lo) * 255.0 / (hi - lo)) AS BIGINT), 255) AS code
        |  FROM x JOIN st USING (pos) WHERE hi > lo)
        |SELECT vec_id, CAST(sum(code) AS BIGINT) AS code_sum,
        |  min(code) AS code_min, max(code) AS code_max,
        |  CAST(sum(CASE WHEN code = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_lo_sat,
        |  CAST(sum(CASE WHEN code = 255 THEN 1 ELSE 0 END) AS BIGINT) AS n_hi_sat
        |FROM qn GROUP BY 1""".stripMargin) { (s, dir) =>
      // Int8 scalar quantization — the storage half of an IVF-PQ ANN index:
      // per-dimension [min, max] from one corpus pass (a 64-row broadcast),
      // then code = floor((v-lo)·255/(hi-lo)) clamped. All quantizer math is
      // IEEE double (bit-identical on any engine); the emitted columns are
      // INTEGER ONLY (code sums, saturation counts) so the oracle comparison
      // never touches float accumulation order. 4x memory reduction per
      // vector at 100 TB is what makes the candidate-probe side of ANN fit
      // in executor memory.
      val x = Tables.load(s, dir, "embeddings")
        .select(col("vec_id"), explode(sequence(lit(0), lit(63))).as("pos"),
          col("embedding"))
        .select(col("vec_id"), col("pos"),
          element_at(col("embedding"), col("pos") + 1).cast("double").as("v"))
      val st = x.groupBy(col("pos")).agg(min(col("v")).as("lo"), max(col("v")).as("hi"))
      val code = least(
        floor((col("v") - col("lo")) * lit(255.0) / (col("hi") - col("lo"))).cast("long"),
        lit(255L))
      x.join(broadcast(st), Seq("pos")).filter(col("hi") > col("lo"))
        .select(col("vec_id"), code.as("code"))
        .groupBy(col("vec_id"))
        .agg(sum(col("code")).cast("long").as("code_sum"),
          min(col("code")).as("code_min"), max(col("code")).as("code_max"),
          sum(when(col("code") === 0, 1).otherwise(0)).cast("long").as("n_lo_sat"),
          sum(when(col("code") === 255, 1).otherwise(0)).cast("long").as("n_hi_sat"))
    },

    Q("q84_embedding_moments",
      """WITH x AS (
        |  SELECT label, t.pos,
        |    CAST(CAST(embedding[t.pos + 1] AS DOUBLE) AS DECIMAL(20,10)) AS v
        |  FROM embeddings, range(8) t(pos)),
        |m AS (
        |  SELECT label, pos, count(*) AS n,
        |    CAST(SUM(v) AS DECIMAL(38,10)) AS s1,
        |    CAST(SUM(CAST(v AS DECIMAL(18,10)) * CAST(v AS DECIMAL(18,10))) AS DECIMAL(38,20)) AS s2
        |  FROM x GROUP BY 1, 2)
        |SELECT label, CAST(pos AS INT) AS pos, n,
        |  round(CAST(s1 AS DOUBLE) / n, 6) AS centroid,
        |  round((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE)*CAST(s1 AS DOUBLE)/n) / n, 6) AS variance
        |FROM m""".stripMargin) { (s, dir) =>
      val x = Tables.load(s, dir, "embeddings")
        .select(col("label"), explode(sequence(lit(0), lit(7))).as("pos"),
          col("embedding"))
        .select(col("label"), col("pos"),
          element_at(col("embedding"), col("pos") + 1)
            .cast("double").cast("decimal(20,10)").as("v"))
      val v18 = col("v").cast("decimal(18,10)")
      x.groupBy(col("label"), col("pos"))
        .agg(count(lit(1)).as("n"),
          sum(col("v")).cast("decimal(38,10)").as("s1"),
          sum(v18 * v18).cast("decimal(38,20)").as("s2"))
        .select(col("label"), col("pos").cast("int").as("pos"), col("n"),
          round(col("s1").cast("double") / col("n"), 6).as("centroid"),
          round((col("s2").cast("double") -
            col("s1").cast("double") * col("s1").cast("double") / col("n")) / col("n"), 6)
            .as("variance"))
    })
}
