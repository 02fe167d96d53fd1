package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.ChangeFeed

/** The `_v-&#42;/_cdf` spool must be reachable by BOTH batch and streaming file
  * sources despite the underscore prefixes: the glob resolves the hidden
  * dirs explicitly (globStatus does not apply the hidden-file filter), and
  * only the part files under them are listed. q203's streaming-CDF
  * consumption stands on this behavior, so a Spark upgrade that changes it
  * must fail here, not in a 100-query sweep.
  */
class CdfGlobSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("batch and stream reads reach _cdf files through the _v-* glob") {
    val dir = TestSpark.tmpDir("cdf-glob")
    // commit on an EMPTY table: publish must not adopt the staged dir as live
    ChangeFeed.commit(Seq((1L, "a")).toDF("k", "t"), dir, Seq("k"))
    ChangeFeed.commit(Seq((1L, "a"), (2L, "b")).toDF("k", "t"), dir, Seq("k"))
    val batch = spark.read.parquet(s"$dir/_v-*/_cdf")
    assert(batch.count() == 2L) // v1 insert + v2 insert
    val q = spark.readStream.schema(batch.schema).parquet(s"$dir/_v-*/_cdf")
      .groupBy().count()
      .writeStream.format("memory").queryName("glob_probe")
      .outputMode("complete").start()
    try { q.processAllAvailable()
      assert(spark.table("glob_probe").head().getLong(0) == 2L)
    } finally q.stop()
  }
}
