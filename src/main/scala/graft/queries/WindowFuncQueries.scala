package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Window-function surface widening (SURVEY §2.6): the rank/distribution
  * family (dense_rank, ntile, percent_rank, cume_dist), explicit-frame value
  * extraction (first/last/nth over full frames, centered moving sums), and a
  * DETERMINISTIC per-group mode planned by the bounded-heap TopKPerGroup
  * operator instead of a window sort.
  *
  * Determinism discipline: every window order ends in a unique key
  * (o_orderkey) so rank ties cannot exist; distribution values
  * (percent_rank, cume_dist) are one exact small-integer division — both
  * engines agree bit-for-bit before the 6-dp rounding even applies.
  *
  * Scale note: these windows partition by bounded keys (priority, customer,
  * month). For a GLOBAL ranking at corpus scale, use the distributed-rank
  * machinery (q75's decile path / PrefixSum) — a single-partition window is
  * the known WindowExec trap this catalog avoids everywhere.
  */
object WindowFuncQueries {

  val all: Seq[Q] = Seq(

    // ---------------------------------------------------------------- q108
    // Rank/distribution variants in ONE window pass per priority class.
    Q("q108_rank_variants",
      """WITH src AS (SELECT * FROM orders WHERE o_orderkey % 50 = 0)
        |SELECT o_orderpriority, o_orderkey,
        |  CAST(dense_rank() OVER w AS BIGINT) AS drk,
        |  CAST(ntile(4) OVER w AS INT) AS quartile,
        |  round(percent_rank() OVER w, 6) AS pct_rank,
        |  round(cume_dist() OVER w, 6) AS cdist
        |FROM src
        |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      Tables.load(s, dir, "orders")
        .filter(col("o_orderkey") % 50 === 0)
        .select(col("o_orderpriority"), col("o_orderkey"),
          dense_rank().over(w).cast("long").as("drk"),
          ntile(4).over(w).as("quartile"),
          round(percent_rank().over(w), 6).as("pct_rank"),
          round(cume_dist().over(w), 6).as("cdist"))
    },

    // ---------------------------------------------------------------- q109
    // Explicit frames: first/last/nth order value per customer (full-frame —
    // the default RANGE frame would make last_value return the CURRENT row)
    // plus a centered 3-row moving sum in exact decimal.
    Q("q109_frame_windows",
      """WITH src AS (SELECT * FROM orders WHERE o_custkey < 300)
        |SELECT o_custkey, o_orderkey,
        |  round(CAST(first_value(o_totalprice) OVER wf AS DOUBLE), 6) AS first_price,
        |  round(CAST(last_value(o_totalprice) OVER wf AS DOUBLE), 6) AS last_price,
        |  round(CAST(nth_value(o_totalprice, 2) OVER wf AS DOUBLE), 6) AS second_price,
        |  round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) OVER wc AS DOUBLE), 6) AS centered_sum
        |FROM src
        |WINDOW wf AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING),
        |       wc AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |              ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING)""".stripMargin) { (s, dir) =>
      val base = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val wf = base.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val wc = base.rowsBetween(-1, 1)
      Tables.load(s, dir, "orders")
        .filter(col("o_custkey") < 300)
        .select(col("o_custkey"), col("o_orderkey"),
          round(first(col("o_totalprice")).over(wf).cast("double"), 6).as("first_price"),
          round(last(col("o_totalprice")).over(wf).cast("double"), 6).as("last_price"),
          round(nth_value(col("o_totalprice"), 2).over(wf).cast("double"), 6).as("second_price"),
          round(sum(col("o_totalprice").cast("decimal(18,6)")).over(wc).cast("double"), 6)
            .as("centered_sum"))
    },

    // ---------------------------------------------------------------- q110
    // Deterministic per-group MODE — most frequent priority per order-month,
    // ties broken by value — planned as count-aggregate + bounded-heap top-1
    // (TopKPerGroup), NOT a per-group window sort: O(n) + O(groups·1) memory,
    // the way a modal statistic survives a 100 TB group-by.
    Q("q110_mode",
      """WITH m AS (SELECT CAST(month(o_orderdate) AS INT) AS mon, o_orderpriority,
        |  count(*) AS cnt FROM orders GROUP BY 1, 2),
        |r AS (SELECT *, row_number() OVER (PARTITION BY mon
        |  ORDER BY cnt DESC, o_orderpriority) AS rn FROM m)
        |SELECT mon, o_orderpriority AS modal_priority, cnt AS n_orders
        |FROM r WHERE rn = 1""".stripMargin) { (s, dir) =>
      val counts = Tables.load(s, dir, "orders")
        .groupBy(month(col("o_orderdate")).as("mon"), col("o_orderpriority"))
        .agg(count(lit(1)).as("cnt"))
      graft.plans.TopK.perGroup(counts, Seq("mon"),
          Seq(("cnt", true), ("o_orderpriority", false)), 1)
        .select(col("mon"), col("o_orderpriority").as("modal_priority"),
          col("cnt").as("n_orders"))
    })
}
