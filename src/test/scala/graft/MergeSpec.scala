package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Merge
import graft.ops.Merge._

/** Full MERGE INTO semantics: clause ORDER decides overlapping conditions,
  * fall-through keeps/drops the right rows, and the cardinality and
  * insert-completeness contracts fail loudly.
  */
class MergeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val target = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0),
    (4L, "d", 40.0)).toDF("k", "tag", "v")
  private val source = Seq((1L, 5.0), (2L, 6.0), (9L, 9.0)).toDF("k", "sv")

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, String, Double)] =
    df.as[(Long, String, Double)].collect().toSet

  test("first matching clause wins; fall-through keeps unmatched-by-clause rows") {
    // delete listed FIRST: k=1 matches both delete (k<2) and update —
    // delete must win; k=2 updates; 9 inserts; 3 dies by-source; 4 keeps
    val out = Merge.merge(target, source, Seq("k"), Seq(
      MatchedDelete(col("s.k") < 2),
      MatchedUpdate(lit(true), Map("v" -> (col("t.v") + col("s.sv")))),
      NotMatchedInsert(lit(true),
        Map("k" -> col("s.k"), "tag" -> lit("new"), "v" -> col("s.sv"))),
      NotMatchedBySourceDelete(col("t.k") === 3)))
    assert(rows(out) == Set((2L, "b", 26.0), (4L, "d", 40.0), (9L, "new", 9.0)))
    // same clauses, update FIRST: k=1 now updates instead of dying
    val out2 = Merge.merge(target, source, Seq("k"), Seq(
      MatchedUpdate(lit(true), Map("v" -> (col("t.v") + col("s.sv")))),
      MatchedDelete(col("s.k") < 2),
      NotMatchedInsert(lit(true),
        Map("k" -> col("s.k"), "tag" -> lit("new"), "v" -> col("s.sv")))))
    assert(rows(out2) == Set((1L, "a", 15.0), (2L, "b", 26.0), (3L, "c", 30.0),
      (4L, "d", 40.0), (9L, "new", 9.0)))
  }

  test("unmatched source rows with no applicable insert clause vanish; conditions gate inserts") {
    val out = Merge.merge(target, source, Seq("k"), Seq(
      NotMatchedInsert(col("s.sv") > 100, // never true
        Map("k" -> col("s.k"), "tag" -> lit("new"), "v" -> col("s.sv")))))
    assert(rows(out) == rows(target), "no clause applies -> target unchanged")
  }

  test("schema evolution widens, updates preserve target-only columns") {
    val t = Seq((1L, 10L), (2L, 20L)).toDF("k", "v")
    val src = Seq((2L, "b"), (3L, "c")).toDF("k", "s")
    val out = Merge.upsertEvolve(t, src, Seq("k"))
    assert(out.columns.toSeq == Seq("k", "v", "s"))
    val got = out.collect().map(r => (r.getLong(0),
      if (r.isNullAt(1)) -1L else r.getLong(1),
      if (r.isNullAt(2)) "" else r.getString(2))).sortBy(_._1).toSeq
    // k=1 untouched (null s), k=2 keeps v AND gains s, k=3 inserted null v
    assert(got == Seq((1L, 10L, ""), (2L, 20L, "b"), (3L, -1L, "c")))
  }

  test("schema evolution rejects a same-named type conflict loudly") {
    val t = Seq((1L, 10L)).toDF("k", "v")
    val src = Seq((1L, "oops")).toDF("k", "v")
    intercept[IllegalArgumentException] {
      Merge.upsertEvolve(t, src, Seq("k"))
    }
  }

  test("cardinality guard and insert completeness fail loudly") {
    val dupSource = Seq((1L, 5.0), (1L, 6.0)).toDF("k", "sv")
    intercept[IllegalArgumentException] {
      Merge.requireUniqueKeys(dupSource, Seq("k"), "source")
    }
    intercept[IllegalArgumentException] {
      Merge.merge(target, source, Seq("k"), Seq(
        NotMatchedInsert(lit(true), Map("k" -> col("s.k"))))) // tag, v missing
    }
  }
}
