package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SimHash document fingerprinting (Charikar '02; Manku et al. WWW'07 — the
  * web-scale near-dup detector): per-token hash bits vote ±1 per occurrence,
  * the signature keeps the sign of each bit-sum. Near-duplicates are pairs
  * within a small Hamming distance.
  *
  * 32-bit variant over the first 8 hex nibbles of md5(token) — bit j comes
  * from nibble j/4, bit j%4. Nibble values are decoded with
  * `instr('0123456789abcdef', c) - 1`, which any SQL engine reproduces
  * exactly, keeping the signature oracle-checkable.
  *
  * Scale: one explode + one hash-aggregate on the doc id (32 `sum`s fuse into
  * a single partial+final aggregate); Hamming joins go through
  * [[hammingNeighbors]] which blocks on rotated bit-bands rather than
  * all-pairs.
  */
object SimHash {

  private def bitContribution(j: Int): Column = {
    val nibbleIdx = 1 + j / 4 // 1-based position in the 8-char hex prefix
    val bit = 1 << (j % 4)
    expr(s"CASE WHEN ((instr('0123456789abcdef', substring(__h8, $nibbleIdx, 1)) - 1) " +
      s"DIV $bit) % 2 = 1 THEN 1 ELSE -1 END")
  }

  /** (idCol, simhash LONG) — 32-bit signature in the low bits. */
  def signatures32(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = MinHashLSH.parallelize(df.select(col(idCol), col(textCol)))
      .select(col(idCol), explode(MinHashLSH.tokensCol(col(textCol))).as("__t"))
    val hashed = tok.withColumn("__h8", substring(md5(col("__t")), 1, 8))
    val bitSums = (0 until 32).map(j => sum(bitContribution(j)).as(s"__b$j"))
    val sig = (0 until 32).map(j =>
        when(col(s"__b$j") > 0, lit(1L << j)).otherwise(lit(0L)))
      .reduce(_ + _)
    hashed.groupBy(col(idCol))
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col(idCol), sig.as("simhash"))
  }

  /** Hamming distance between two signatures. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Near-dup pairs with Hamming distance <= maxDist, blocked on
    * `maxDist + 1` disjoint bit-bands (pigeonhole: a pair with at most
    * maxDist differing bits shares at least one exact band) so the join is
    * equi on (band, bits), never cartesian — and recall is guaranteed for
    * whatever distance the caller asks, not just a fixed band layout.
    */
  def hammingNeighbors(sig: DataFrame, idCol: String, maxDist: Int): DataFrame = {
    require(maxDist >= 0 && maxDist < 32,
      s"maxDist must be in [0, 32) for a 32-bit signature, got $maxDist")
    val nBands = maxDist + 1
    val bounds = (0 to nBands).map(b => b * 32 / nBands)
    val banded = (0 until nBands).map { b =>
      val start = bounds(b)
      val width = bounds(b + 1) - start
      sig.select(col(idCol), col("simhash"), lit(b).as("band"),
        shiftright(col("simhash"), start).bitwiseAND(lit((1L << width) - 1)).as("band_bits"))
    }.reduce(_ unionByName _)
    val l = banded.select(col("band"), col("band_bits"),
      col(idCol).as("id_a"), col("simhash").as("sim_a"))
    val r = banded.select(col("band"), col("band_bits"),
      col(idCol).as("id_b"), col("simhash").as("sim_b"))
    l.join(r, Seq("band", "band_bits"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), hamming(col("sim_a"), col("sim_b")).as("hamming_dist"))
      .distinct()
      .filter(col("hamming_dist") <= maxDist)
  }

  /** The DuckDB-dialect expression computing the same 32-bit signature —
    * kept adjacent to the Spark implementation so the two stay in lockstep.
    */
  def oracleSignatureSql(tableExpr: String, idCol: String, textCol: String): String = {
    val terms = (0 until 32).map { j =>
      val nibbleIdx = 1 + j / 4
      val bit = 1 << (j % 4)
      s"CASE WHEN sum(CASE WHEN ((strpos('0123456789abcdef', __h8[$nibbleIdx]) - 1) " +
        s"// $bit) % 2 = 1 THEN 1 ELSE -1 END) > 0 THEN ${1L << j} ELSE 0 END"
    }.mkString(" + ")
    s"""WITH __tok AS (SELECT $idCol, unnest(string_split_regex(trim($textCol), '\\s+')) AS __t FROM $tableExpr),
       |__h AS (SELECT $idCol, substring(md5(__t), 1, 8) AS __h8 FROM __tok)
       |SELECT $idCol, CAST($terms AS BIGINT) AS simhash FROM __h GROUP BY $idCol""".stripMargin
  }
}
