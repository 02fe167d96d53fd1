package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Distributed prefix (running) sum — the global-scan primitive behind
  * sweep-line algorithms (peak concurrency, inventory levels, gauge
  * reconstruction from deltas).
  *
  * `sum(x) OVER (ORDER BY t)` with no partition key moves the whole table
  * through ONE task (the WindowExec single-partition trap the surrogate-key
  * assignment also avoids). The distributed form is the classic two-phase
  * scan: range-repartition by the order key, per-partition local running
  * sums, then add the exclusive prefix of per-partition totals (a
  * driver-side array of numPartitions longs — scale-free). Same result,
  * no single-task stage.
  */
object PrefixSum {

  /** Append `outName` = running sum of `valueCol` (LONG) in ascending
    * `orderCols` order. `orderCols` must be a total order for a
    * deterministic result (pre-aggregate equal keys first).
    * `numPartitions = 0` lets the session (incl. AQE coalescing) size the
    * range exchange; pass an explicit width to pin the scan's parallelism.
    */
  def runningSum(df: DataFrame, orderCols: Seq[String], valueCol: String,
      outName: String, numPartitions: Int = 0): DataFrame =
    runningSums(df, orderCols, Seq(valueCol -> outName), numPartitions)

  /** The n-column form: ONE range exchange + ONE two-phase scan carries any
    * number of running sums (a rank column is just the running sum of ones).
    * Chaining single-column calls would pay the sort/checkpoint/collect
    * cycle once per column for the same order.
    */
  def runningSums(df: DataFrame, orderCols: Seq[String],
      valueOuts: Seq[(String, String)], numPartitions: Int = 0): DataFrame = {
    require(valueOuts.nonEmpty, "PrefixSum.runningSums: no value columns")
    // fail fast at call time — a wrong type or a null value would otherwise
    // surface as an executor ClassCastException/NPE after the shuffle ran
    valueOuts.foreach { case (valueCol, _) =>
      require(df.schema(valueCol).dataType == LongType,
        s"$valueCol must be LONG (got ${df.schema(valueCol).dataType.simpleString}); " +
          "cast and coalesce nulls before the scan")
    }
    // A nullable schema can't be rejected statically (every aggregate/parquet
    // column is nullable) — instead replace each value column with a guarded
    // form that raises a CLEAR error on the scan side of the range shuffle,
    // not an anonymous NPE from Row.getLong deep in phase 1.
    val guarded = valueOuts.map(_._1).foldLeft(df) { (d, valueCol) =>
      if (!d.schema(valueCol).nullable) d
      else d.withColumn(valueCol,
        when(col(valueCol).isNotNull, col(valueCol)).otherwise(raise_error(
          lit(s"PrefixSum.runningSums: NULL in '$valueCol' — coalesce before the scan"))))
    }
    val spark = df.sparkSession
    val orderAsc = orderCols.map(col(_).asc)
    val ranged =
      if (numPartitions > 0) guarded.repartitionByRange(numPartitions, orderAsc: _*)
      else guarded.repartitionByRange(orderAsc: _*)
    val ordered = ranged
      .sortWithinPartitions(orderAsc: _*)
      .localCheckpoint() // both phases read it; don't recompute the sort
    val valueIdxs = valueOuts.map { case (v, _) => ordered.schema.fieldIndex(v) }.toArray
    val k = valueIdxs.length
    // phase 1: per-partition totals (numPartitions × k longs to the driver)
    val totals = ordered.rdd
      .mapPartitionsWithIndex { (i, it) =>
        val s = new Array[Long](k)
        it.foreach { r =>
          var j = 0
          while (j < k) { s(j) += r.getLong(valueIdxs(j)); j += 1 }
        }
        Iterator((i, s))
      }
      .collect().sortBy(_._1).map(_._2)
    // exclusive prefix per partition, per value column
    val offsets = totals.scanLeft(new Array[Long](k)) { (acc, t) =>
      Array.tabulate(k)(j => acc(j) + t(j))
    }
    // phase 2: local running sums + partition offsets
    val schema = valueOuts.foldLeft(ordered.schema) { case (sch, (_, outName)) =>
      sch.add(outName, LongType, nullable = false)
    }
    val rows = ordered.rdd.mapPartitionsWithIndex { (i, it) =>
      val acc = offsets(i).clone()
      it.map { r =>
        var j = 0
        while (j < k) { acc(j) += r.getLong(valueIdxs(j)); j += 1 }
        Row.fromSeq(r.toSeq ++ acc.toSeq)
      }
    }
    spark.createDataFrame(rows, schema)
  }
}
