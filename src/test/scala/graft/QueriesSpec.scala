package graft

import org.scalatest.funsuite.AnyFunSuite

/** Catalog-level invariants: every query runs on the smoke testdata, every
  * oracle key exists, the flagship entry returns rows (the driver's checks).
  */
class QueriesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("entry returns rows > 0 (driver smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("every query executes at sf0.001 and returns a stable non-empty schema") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        val df = fn(spark, sf)
        assert(df.schema.nonEmpty)
        df.count() // execute the whole plan
        None
      } catch { case e: Throwable => Some(s"$name: ${e.getMessage.take(120)}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("media feature extraction round-trips through the binary column") {
    import graft.multimodal.Media
    val docs = Tables.load(spark, sf, "documents")
    val feats = Media.extractFeatures(Media.fromDocuments(docs), batchSize = 64)
    val row = feats.filter(_.media_id == 0L).head()
    val expected = docs.filter("doc_id = 0").head()
    assert(row.n_bytes === expected.getAs[String]("text").getBytes("UTF-8").length)
    assert(row.content_hash.length === 32)
  }

  test("resizeMeta preserves aspect ratio when only one dimension exceeds maxDim") {
    import graft.multimodal.Media
    import spark.implicits._
    val media = Seq(
      (1L, 1000, 400), // width-only over: 640x256
      (2L, 400, 1000), // height-only over: 256x640
      (3L, 320, 240),  // under: untouched
      (4L, 1280, 960)  // both over: 640x480
    ).toDF("media_id", "width", "height")
    val out = Media.resizeMeta(media, maxDim = 640).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2)))).toMap
    assert(out(1L) === ((640, 256)))
    assert(out(2L) === ((256, 640)))
    assert(out(3L) === ((320, 240)))
    assert(out(4L) === ((640, 480)))
  }
}
