package graft.source

import org.apache.spark.sql.functions.not
import org.apache.spark.sql.{sources => f}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The DELETE filter translation: every supported form deletes exactly
  * its matches, and a conjunction with ONE untranslatable leg refuses
  * the WHOLE predicate — a partial translation would delete the wrong
  * rows.
  */
class GraftDeleteSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def data = Seq((1L, "alpha"), (2L, "beta"),
    (3L, null.asInstanceOf[String])).toDF("k", "s")

  // DELETE's null semantics: a row is deleted only when the predicate is
  // TRUE — null keeps the row (exactly what DeletionVectors.delete's
  // `.filter(predicate)` doom-selection implements)
  private def survivors(filters: Array[f.Filter]): Option[Seq[Long]] =
    GraftDelete.predicate(filters).map(p =>
      data.filter(not(org.apache.spark.sql.functions.coalesce(
        p, org.apache.spark.sql.functions.lit(false))))
        .select("k").as[Long].collect().sorted.toSeq)

  test("each supported form deletes exactly its matches") {
    assert(survivors(Array(f.EqualTo("k", 2L))).contains(Seq(1L, 3L)))
    assert(survivors(Array(f.In("s", Array("alpha", "beta"))))
      .contains(Seq(3L)))
    assert(survivors(Array(f.And(f.GreaterThan("k", 1L),
      f.IsNotNull("s")))).contains(Seq(1L, 3L)))
    // NOT over a null `s` is null — the row is not deleted
    assert(survivors(Array(f.Not(f.StringContains("s", "lph"))))
      .contains(Seq(1L, 3L)))
    assert(survivors(Array(f.Or(f.IsNull("s"), f.LessThan("k", 2L))))
      .contains(Seq(2L)))
  }

  // NOTE: the v1 Filter algebra is fully covered by toColumn (the class
  // is sealed), so the None path is future-proofing — `predicate` folds
  // through Option so ONE untranslatable leg would refuse the whole
  // conjunction rather than delete the wrong rows.

  test("DELETE with no WHERE is the always-true predicate") {
    assert(survivors(Array.empty).contains(Seq.empty))
  }
}
