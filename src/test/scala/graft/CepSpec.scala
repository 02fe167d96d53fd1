package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.streaming.Cep
import graft.streaming.Cep.{CepEvent, CepMatch}

/** Ordered-pattern CEP (view -> click -> purchase) vs hand-computed matches,
  * including the edge cases the state machine must get right: step-bound
  * expiry, unanchored clicks, shared prefixes, and chains spanning
  * micro-batches through persisted state.
  */
class CepSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val step = 100L // µs step bound for readable cases

  private def run(events: Seq[CepEvent]): Seq[CepMatch] = {
    // batch Dataset through the same flatMapGroupsWithState path: Spark
    // executes mapGroupsWithState on a static Dataset as a single group pass
    Cep.matches(events.toDS(), step).collect().toSeq
      .sortBy(m => (m.key, m.p_us))
  }

  test("full chain within bounds emits one match") {
    assert(run(Seq(
      CepEvent(1, 0, "view"), CepEvent(1, 50, "click"), CepEvent(1, 120, "purchase")
    )) === Seq(CepMatch(1, 0, 50, 120)))
  }

  test("step bound is inclusive and per-edge, not end-to-end") {
    // view->click exactly at bound, click->purchase exactly at bound:
    // total span 2*step is fine because each EDGE is within step
    assert(run(Seq(
      CepEvent(1, 0, "view"), CepEvent(1, 100, "click"), CepEvent(1, 200, "purchase")
    )) === Seq(CepMatch(1, 0, 100, 200)))
    // one edge over the bound kills the chain
    assert(run(Seq(
      CepEvent(2, 0, "view"), CepEvent(2, 101, "click"), CepEvent(2, 150, "purchase")
    )) === Seq.empty)
    assert(run(Seq(
      CepEvent(3, 0, "view"), CepEvent(3, 80, "click"), CepEvent(3, 181, "purchase")
    )) === Seq.empty)
  }

  test("click without a qualifying view anchors nothing") {
    assert(run(Seq(
      CepEvent(1, 0, "click"), CepEvent(1, 50, "purchase")
    )) === Seq.empty)
  }

  test("latest anchored click wins; two purchases may share one click") {
    val got = run(Seq(
      CepEvent(1, 0, "view"), CepEvent(1, 40, "click"), CepEvent(1, 60, "click"),
      CepEvent(1, 90, "purchase"), CepEvent(1, 140, "purchase")))
    // both purchases chain to the later click (60), anchored to view 0
    assert(got === Seq(CepMatch(1, 0, 60, 90), CepMatch(1, 0, 60, 140)))
  }

  test("a too-old anchored click does not match, and a later view re-anchors") {
    val got = run(Seq(
      CepEvent(1, 0, "view"), CepEvent(1, 50, "click"),
      CepEvent(1, 400, "purchase"), // click is 350 old > step: no match
      CepEvent(1, 500, "view"), CepEvent(1, 550, "click"),
      CepEvent(1, 600, "purchase")))
    assert(got === Seq(CepMatch(1, 500, 550, 600)))
  }

  test("keys are independent") {
    val got = run(Seq(
      CepEvent(1, 0, "view"), CepEvent(2, 10, "click"), CepEvent(1, 20, "click"),
      CepEvent(2, 30, "purchase"), CepEvent(1, 40, "purchase")))
    assert(got === Seq(CepMatch(1, 0, 20, 40)))
  }

  test("late events across batches are dropped by the high-water mark") {
    // Round-5 ADVICE fix: a replayed/late event older than the key's
    // high-water mark must NOT regress state. Batch 1 establishes an
    // anchored (view=0, click=50) pair and hwm=50; batch 2 delivers an
    // OLDER view (ts=10) then a purchase — without the guard the stale
    // view could not hurt here, but an older CLICK (ts=20) would re-anchor
    // to a worse pair. Both must be dropped; the purchase chains to the
    // ORIGINAL anchored pair.
    val dir = TestSpark.tmpDir("cep-late")
    Seq(CepEvent(9, 0, "view"), CepEvent(9, 50, "click"))
      .toDS().coalesce(1).write.parquet(s"$dir/in/f1")
    Seq(CepEvent(9, 10, "view"), CepEvent(9, 20, "click"),
        CepEvent(9, 120, "purchase"))
      .toDS().coalesce(1).write.parquet(s"$dir/in/f2")
    val stream = spark.readStream.schema("key LONG, tsUs LONG, etype STRING")
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/in/*").as[CepEvent]
    val q = Cep.matches(stream, step).toDF().writeStream
      .format("memory").queryName("cep_late")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = spark.table("cep_late").as[CepMatch].collect().toSeq
    spark.catalog.dropTempView("cep_late")
    // the match anchors to (0, 50) — the late (10, 20) pair was dropped
    assert(got === Seq(CepMatch(9, 0, 50, 120)))
  }

  test("chain spans micro-batches through persisted state (real stream)") {
    val dir = TestSpark.tmpDir("cep-multi")
    val ev1 = Seq(CepEvent(7, 0, "view"), CepEvent(7, 50, "click"))
    val ev2 = Seq(CepEvent(7, 120, "purchase"), CepEvent(8, 130, "purchase"))
    ev1.toDS().coalesce(1).write.parquet(s"$dir/in/f1")
    ev2.toDS().coalesce(1).write.parquet(s"$dir/in/f2")
    val stream = spark.readStream.schema("key LONG, tsUs LONG, etype STRING")
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/in/*").as[CepEvent]
    val q = Cep.matches(stream, step).toDF().writeStream
      .format("memory").queryName("cep_spec")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = spark.table("cep_spec").as[CepMatch].collect().toSeq
    spark.catalog.dropTempView("cep_spec")
    // the anchored click from batch 1 completes in batch 2; key 8's
    // unanchored purchase emits nothing
    assert(got === Seq(CepMatch(7, 0, 50, 120)))
  }
}
