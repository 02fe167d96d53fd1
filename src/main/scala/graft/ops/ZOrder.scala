package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering — the public Delta `OPTIMIZE ZORDER
  * BY` / Iceberg sort-order design: interleave the bits of two quantized
  * dimensions and range-partition on the interleaved key, so every data
  * file covers a small RECTANGLE of the (x, y) space instead of a thin
  * full-width stripe. A linear sort by x gives the min/max skipping index
  * perfect pruning on x and NONE on y (every file spans all of y);
  * z-ordering gives ~sqrt-fraction pruning on EACH dimension — at 100 TB
  * this is the difference between a second-dimension predicate scanning
  * the whole table and scanning ~sqrt(files) of it. Everything is Column
  * arithmetic (codegen'd, no UDF): quantize each dimension to 16 bits
  * against its [min, max], spread bits with the standard magic masks,
  * OR the interleave, `repartitionByRange` + sort within partitions on
  * the curve. The skipping index is the SAME per-file min/max sidecar
  * ([[DataSkipping]]) — z-order changes the layout, not the index.
  */
object ZOrder {

  /** Spread the low 16 bits of `c` to even positions (Morton magic). */
  private def spread16(c: Column): Column = {
    var x = c.bitwiseAND(lit(0xFFFFL))
    x = (x.bitwiseOR(shiftleft(x, 8))).bitwiseAND(lit(0x00FF00FFL))
    x = (x.bitwiseOR(shiftleft(x, 4))).bitwiseAND(lit(0x0F0F0F0FL))
    x = (x.bitwiseOR(shiftleft(x, 2))).bitwiseAND(lit(0x33333333L))
    (x.bitwiseOR(shiftleft(x, 1))).bitwiseAND(lit(0x55555555L))
  }

  /** Quantize `c` to [0, 65535] against the closed range [min, max] —
    * integer arithmetic, rank-preserving.
    */
  def quantize(c: Column, min: Long, max: Long): Column =
    least(lit(65535L),
      ((c.cast("long") - min) * 65536L) / (max - min + 1L)).cast("long")

  /** The Morton key of two 16-bit quantized dimensions. */
  def morton(xq: Column, yq: Column): Column =
    spread16(xq).bitwiseOR(shiftleft(spread16(yq), 1))

  /** Write `df` z-ordered on (cx, cy) into `nFiles` files with the
    * min/max skipping index on both columns. The bounds scan is one
    * aggregate; the layout is one range shuffle on the curve.
    */
  def cluster(df: DataFrame, dataDir: String, cx: String, cy: String,
      nFiles: Int): Unit = {
    val b = df.agg(min(col(cx)).cast("long"), max(col(cx)).cast("long"),
      min(col(cy)).cast("long"), max(col(cy)).cast("long")).head
    val z = morton(quantize(col(cx), b.getLong(0), b.getLong(1)),
      quantize(col(cy), b.getLong(2), b.getLong(3)))
    df.withColumn("__z", z)
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode(SaveMode.Overwrite).parquet(dataDir)
    DataSkipping.writeStats(df.sparkSession, dataDir, Seq(cx, cy))
  }

  /** Files whose stats admit BOTH bands — the 2-D box prune: intersect
    * the per-dimension admissions (each O(files) against the sidecar).
    * Returns (admitted paths, total files).
    */
  def selectBox(spark: SparkSession, dataDir: String,
      cx: String, xLo: Column, xHi: Column,
      cy: String, yLo: Column, yHi: Column): (Seq[String], Long) = {
    val (fx, total) = DataSkipping.selectFiles(spark, dataDir, cx, xLo, xHi)
    val (fy, _) = DataSkipping.selectFiles(spark, dataDir, cy, yLo, yHi)
    (fx.intersect(fy).toIndexedSeq, total)
  }
}
