package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.{DotProduct, GraftExtensions}

/** Native DotProduct expression: eval + codegen paths, type dispatch,
  * null/length semantics, SQL registration, parity with the HOF fold.
  */
class FunctionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("float, double, and mixed element types widen to double identically") {
    val df = Seq((Array(1.5f, 2.5f), Array(2.0, 3.0))).toDF("f", "d")
    val out = df.select(
      DotProduct($"f", $"f").as("ff"),
      DotProduct($"d", $"d").as("dd"),
      DotProduct($"f", $"d").as("fd")).head()
    assert(out.getDouble(0) === 1.5 * 1.5 + 2.5 * 2.5)
    assert(out.getDouble(1) === 2.0 * 2.0 + 3.0 * 3.0)
    assert(out.getDouble(2) === 1.5 * 2.0 + 2.5 * 3.0)
  }

  test("null input -> null; length mismatch folds over the shorter prefix") {
    val df = Seq((Some(Array(1.0, 2.0)), None: Option[Array[Double]]))
      .toDF("a", "b")
    assert(df.select(DotProduct($"a", $"b")).head().isNullAt(0))
    val m = Seq((Array(1.0, 2.0, 3.0), Array(10.0))).toDF("a", "b")
    assert(m.select(DotProduct($"a", $"b")).head().getDouble(0) === 10.0)
  }

  test("bit-exact vs the aggregate(zip_with) fold on real embeddings") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .limit(50).select($"vec_id", $"embedding")
    val both = emb.select($"vec_id",
      DotProduct($"embedding", $"embedding").as("native"),
      expr("aggregate(zip_with(cast(embedding as array<double>), cast(embedding as array<double>), (x, y) -> x * y), 0D, (acc, x) -> acc + x)").as("hof"))
    assert(both.filter($"native" =!= $"hof").isEmpty, "same doubles, bit for bit")
  }

  test("SQL registration exposes dot_product") {
    GraftExtensions.register(spark)
    val r = spark.sql("SELECT dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d").head()
    assert(r.getDouble(0) === 11.0)
  }

  test("type check rejects non-array inputs") {
    val e = intercept[Exception] {
      Seq((1, 2)).toDF("a", "b").select(DotProduct($"a", $"b")).head()
    }
    assert(e.getMessage.toLowerCase.contains("dot_product"))
  }
}
