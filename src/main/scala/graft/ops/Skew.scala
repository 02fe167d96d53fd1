package graft.ops

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins: salting.
  *
  * When one join key carries a disproportionate share of rows (hot ticker,
  * boilerplate document), a shuffle hash join puts the whole key on one
  * task. Salting splits the hot side's key space by a deterministic salt and
  * replicates the other side across all salt values: the hot key spreads
  * over `n` tasks at the cost of an n× replication of the (smaller) side.
  *
  * AQE's skew-join handling (`spark.sql.adaptive.skewJoin.enabled`) covers
  * sort-merge joins automatically; explicit salting remains the tool for
  * aggregate-then-join patterns and for engines/paths AQE does not rewrite.
  * Result set is identical to the unsalted join (the salt is join-key
  * padding, derived deterministically, never emitted).
  */
object Skew {

  /** Equi-join `big ⋈ small` on `keys` with the big side salted `n` ways.
    * Output columns = big's then small's non-key columns (same as
    * `big.join(small, keys)`).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String], n: Int): DataFrame = {
    require(n > 0)
    // deterministic salt: hash of the full row spreads even a single hot key
    val salted = big.withColumn("__salt",
      pmod(hash(struct(big.columns.map(col).toIndexedSeq: _*)), lit(n)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(n - 1))))
    salted.join(replicated, keys :+ "__salt").drop("__salt")
  }
}
