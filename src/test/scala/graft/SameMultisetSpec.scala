package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Q

/** `Q.sameMultiset` now stands behind ~100 in-query equivalence audits
  * (round 14 replaced the double-exceptAll pairs), so the checker itself
  * gets pinned: it must be insensitive to row order, partitioning and
  * column order, and it must DETECT every mutation class the exceptAll
  * pair caught — a changed value, a dropped row, a duplicated row, a
  * swapped duplicate count, nulls flipping to values, and frames that
  * differ only in a double's sign bit must behave like Spark's own set
  * operators (-0.0 == 0.0, NaN == NaN).
  */
class SameMultisetSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val base = Seq((1L, "a", 1.5), (2L, "b", -0.5), (2L, "b", -0.5),
    (3L, null.asInstanceOf[String], 0.0))

  test("equal multisets pass regardless of order, partitioning, column order") {
    val a = base.toDF("k", "s", "d")
    val b = base.reverse.toDF("k", "s", "d").repartition(7)
      .select(col("d"), col("k"), col("s")) // different column ORDER
    assert(Q.sameMultiset(a, b))
    assert(Q.sameMultiset(a.limit(0), b.limit(0)), "two empty frames agree")
  }

  test("every mutation class is detected") {
    val a = base.toDF("k", "s", "d")
    def df(rows: Seq[(Long, String, Double)]) = rows.toDF("k", "s", "d")
    assert(!Q.sameMultiset(a, df(base.updated(0, (1L, "a", 1.6)))),
      "changed value")
    assert(!Q.sameMultiset(a, df(base.drop(1))), "dropped row")
    assert(!Q.sameMultiset(a, df(base :+ base.head)), "duplicated row")
    assert(!Q.sameMultiset(a,
      df(Seq((1L, "a", 1.5), (1L, "a", 1.5), (2L, "b", -0.5),
        (3L, null.asInstanceOf[String], 0.0)))),
      "swapped duplicate counts (same total rows)")
    assert(!Q.sameMultiset(a, df(base.updated(3, (3L, "x", 0.0)))),
      "null flipped to a value")
  }

  test("a value/null swap between same-typed columns is detected") {
    // Spark's hash expressions SKIP null children, so without per-column
    // null flags hash(v, null) == hash(null, v) for same-typed columns on
    // both hash families — the one multiset difference a naive row hash
    // is deterministically blind to
    val a = Seq((Some(5L), Option.empty[Long])).toDF("x", "y")
    val b = Seq((Option.empty[Long], Some(5L))).toDF("x", "y")
    assert(!Q.sameMultiset(a, b),
      "swapping a value and a NULL across same-typed columns must differ")
    assert(Q.sameMultiset(a, a.select(col("x"), col("y"))))
  }

  test("float canonicalization matches Spark's set-operator equality") {
    val a = Seq(Tuple1(0.0)).toDF("d")
    val b = Seq(Tuple1(-0.0)).toDF("d")
    assert(Q.sameMultiset(a, b) ==
      (a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty),
      "-0.0 vs 0.0 must agree with exceptAll")
    val n1 = Seq(Tuple1(Double.NaN)).toDF("d")
    val n2 = Seq(Tuple1(Double.NaN)).toDF("d")
    assert(Q.sameMultiset(n1, n2) ==
      (n1.exceptAll(n2).isEmpty && n2.exceptAll(n1).isEmpty),
      "NaN vs NaN must agree with exceptAll")
  }

  test("mismatched column sets fail loudly, not falsely-equal") {
    val a = Seq((1L, "a")).toDF("k", "s")
    val b = Seq((1L, "a")).toDF("k", "t")
    intercept[IllegalArgumentException] { Q.sameMultiset(a, b) }
  }
}
