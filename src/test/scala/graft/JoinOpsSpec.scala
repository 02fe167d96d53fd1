package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.{AsOfJoin, RangeJoin, Skew}
import graft.text.Chunker

/** As-of, range, and salted joins + chunking on constructed cases. */
class JoinOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("as-of backward: inclusive at equal time, null before first right row") {
    val trades = Seq(
      (1L, "A", ts("2024-01-01 10:00:00")),
      (2L, "A", ts("2024-01-01 10:05:00")),
      (3L, "A", ts("2024-01-01 09:00:00")), // before any quote
      (4L, "B", ts("2024-01-01 10:00:00"))
    ).toDF("trade_id", "sym", "ts")
    val quotes = Seq(
      ("A", ts("2024-01-01 10:00:00"), 100.0), // equal-time: visible
      ("A", ts("2024-01-01 10:03:00"), 101.0),
      ("B", ts("2024-01-01 09:30:00"), 50.0)
    ).toDF("sym", "ts", "px")
    val out = AsOfJoin.backward(trades, quotes, Seq("sym"), "ts", "ts",
        Seq("px" -> "quote_px"))
      .select($"trade_id", $"quote_px").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(out(1L) === Some(100.0), "inclusive >= at equal ts")
    assert(out(2L) === Some(101.0), "latest prior quote")
    assert(out(3L) === None, "no quote yet -> null")
    assert(out(4L) === Some(50.0), "keys partition the series")
  }

  test("as-of backward: NULL payload field of the prevailing row stays NULL") {
    // the latest quote has px = NULL; ASOF must return that row's NULL, not
    // fall back to the older row's 100.0 (column-mixing across right rows)
    val trades = Seq((1L, "A", ts("2024-01-01 10:10:00"))).toDF("trade_id", "sym", "ts")
    val quotes = Seq(
      ("A", ts("2024-01-01 10:00:00"), Some(100.0), 10L),
      ("A", ts("2024-01-01 10:05:00"), None, 20L)
    ).toDF("sym", "ts", "px", "qty")
    val r = AsOfJoin.backward(trades, quotes, Seq("sym"), "ts", "ts",
      Seq("px" -> "quote_px", "qty" -> "quote_qty")).head()
    assert(r.isNullAt(r.fieldIndex("quote_px")), "prevailing row's NULL survives")
    assert(r.getAs[Long]("quote_qty") === 20L, "payload comes from one row")
  }

  test("hamming neighbors recall holds for maxDist >= 4 (derived band count)") {
    import graft.dedup.SimHash
    // two signatures differing in exactly 5 bits — the old fixed 4x8 banding
    // could miss them; maxDist+1 = 6 bands guarantees a shared band
    val sig = Seq((1L, 0L), (2L, 0x1111100000000000L >>> 32)).toDF("doc_id", "simhash")
    val pairs5 = SimHash.hammingNeighbors(sig, "doc_id", maxDist = 5).collect()
    assert(pairs5.length === 1 && pairs5.head.getAs[Int]("hamming_dist") === 5)
    assertThrows[IllegalArgumentException](
      SimHash.hammingNeighbors(sig, "doc_id", maxDist = 32))
  }

  test("range join window edges are inclusive and keyed") {
    val l = Seq((1L, 10L, ts("2024-01-01 10:10:00"))).toDF("id", "u", "ts")
    val r = Seq(
      (10L, ts("2024-01-01 10:00:00")), // exactly -10min: in
      (10L, ts("2024-01-01 10:10:00")), // exactly 0: in
      (10L, ts("2024-01-01 09:59:59")), // 1s early: out
      (10L, ts("2024-01-01 10:10:01")), // after: out
      (11L, ts("2024-01-01 10:05:00"))  // other key: out
    ).toDF("u", "rts")
    val out = RangeJoin.timeWindow(l, r, Seq("u"), "ts", "rts",
      lowerUs = -600000000L, upperUs = 0L)
    assert(out.count() === 2)
  }

  test("salted join equals the plain join exactly") {
    val li = Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
    val o = Tables.load(spark, "/root/testdata/sf0.001", "orders")
      .withColumnRenamed("o_orderkey", "l_orderkey")
    val plain = li.join(o, Seq("l_orderkey"))
    val salted = Skew.saltedJoin(li, o, Seq("l_orderkey"), n = 8)
      .select(plain.columns.map(col).toIndexedSeq: _*)
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("sequence packing: budget boundaries, no doc interleaving") {
    val chunks = Seq(
      (1L, 1, 30), (1L, 2, 30), (1L, 3, 30), (1L, 4, 10), // cum 30,60,90,100
      (2L, 1, 64), (2L, 2, 1)                             // cum 64,65
    ).toDF("doc_id", "chunk_start", "n_tokens")
    val packed = Chunker.packSequences(chunks, "doc_id", "chunk_start", "n_tokens", budget = 64)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getAs[Int]("seq_id")).toMap
    // doc 1: preceding totals 0,30,60,90 -> seqs 0,0,0,1
    assert(packed((1L, 1)) === 0 && packed((1L, 2)) === 0)
    assert(packed((1L, 3)) === 0, "chunk STARTING under budget joins the open sequence")
    assert(packed((1L, 4)) === 1, "preceding 90 >= 64 -> next sequence")
    // doc 2 restarts at seq 0: no cross-doc state
    assert(packed((2L, 1)) === 0 && packed((2L, 2)) === 1)
  }

  test("chunking: coverage, overlap, and tail behaviour") {
    val doc = Seq((1L, (1 to 35).map(i => s"w$i").mkString(" "))).toDF("doc_id", "text")
    val chunks = Chunker.chunkByTokens(doc, "doc_id", "text", size = 20, stride = 15)
      .orderBy("chunk_start").collect()
    assert(chunks.length === 3, "starts at 1, 16, 31")
    assert(chunks(0).getAs[String]("chunk_text").startsWith("w1 ") &&
      chunks(0).getAs[Int]("n_tokens") === 20)
    assert(chunks(1).getAs[String]("chunk_text").startsWith("w16 "),
      "5-token overlap with chunk 1")
    assert(chunks(2).getAs[Int]("n_tokens") === 5, "tail chunk is short")
    val empty = Chunker.chunkByTokens(Seq((2L, "")).toDF("doc_id", "text"),
      "doc_id", "text", 20, 15)
    assert(empty.count() === 1, "empty doc still represented")
  }
}
