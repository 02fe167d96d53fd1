package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench regression gate's pure rules, pinned with synthetic numbers —
  * no Spark. The gate closed `FAIL N regression(s)` on phantom transients
  * two rounds running (r13: 11 flags, r14: 9 — every one adjudicated
  * ambient by hand); round 15 makes the adjudication mechanical, and these
  * pins are the contract that keeps it honest: a planted real regression
  * must still FAIL, a quiet re-measure must excuse, and the
  * contiguous-block transient signature must fire only on one run.
  */
class BenchGateSpec extends AnyFunSuite {
  import BenchGate._

  test("ambient: median of stable ratios, clamped to [1.0, 1.5]") {
    val expected = (1 to 9).map(i => s"q$i" -> 1.0).toMap
    // uniformly 1.3x slower pass -> ambient 1.3
    val slow = (1 to 9).map(i => s"q$i" -> 1.3)
    assert(math.abs(ambient(slow, expected)._1 - 1.3) < 1e-9)
    // uniformly FASTER pass never shrinks the tolerance below base
    val fast = (1 to 9).map(i => s"q$i" -> 0.7)
    assert(ambient(fast, expected)._1 == 1.0)
    // a catastrophic window clamps at 1.5 — beyond that, flags must fire
    val awful = (1 to 9).map(i => s"q$i" -> 4.0)
    assert(ambient(awful, expected)._1 == 1.5)
    // the median is immune to a single mover
    val oneBad = (1 to 8).map(i => s"q$i" -> 1.0) :+ ("q9" -> 50.0)
    assert(ambient(oneBad, expected)._1 == 1.0)
    // sub-0.3s-expected queries are excluded; <5 stable -> identity
    val tiny = (1 to 9).map(i => s"q$i" -> 2.0)
    val tinyExp = (1 to 9).map(i => s"q$i" -> 0.1).toMap
    assert(ambient(tiny, tinyExp) == ((1.0, 0)))
  }

  test("isMover: 1.5x over the 0.75s floor") {
    assert(!isMover(1.0, 1.0, Tolerance)) // 1.0x
    assert(isMover(1.6, 1.0, Tolerance)) // 1.6x over a 1s base
    assert(!isMover(1.0, 0.2, Tolerance)) // floored: 1.0 <= 0.75*1.5
    assert(isMover(1.2, 0.2, Tolerance)) // 1.2 > 0.75*1.5 = 1.125
    assert(!isMover(2.0, 1.0, Tolerance * 1.5)) // ambient-scaled bar 2.25
  }

  test("verdictOf: isolated re-measure decides, at BASE tolerance") {
    // r14's q128: 9.22s in-pass, 1.19s isolated vs 1.11 expected -> clean
    assert(verdictOf(1.19, 1.11) == "ambient-transient")
    // a planted real regression survives the quiet window
    assert(verdictOf(3.2, 1.11) == "regression")
    // small-base queries adjudicate through the same floor
    assert(verdictOf(0.9, 0.2) == "ambient-transient")
  }

  test("contiguousBlock: one execution-order run = one machine event") {
    val all = (1 to 20).map(i => f"q$i%02d")
    val canFlag: String => Boolean = _ => true
    // q05..q08 contiguous -> transient signature
    assert(contiguousBlock(Seq("q05", "q06", "q07", "q08"), all, canFlag))
    // scattered flags -> plan events, no signature
    assert(!contiguousBlock(Seq("q02", "q07", "q15"), all, canFlag))
    // fewer than 3 flags never claim the signature
    assert(!contiguousBlock(Seq("q05", "q06"), all, canFlag))
    // a gap is allowed only where the in-between query CANNOT flag
    // (sub-floor or no manifest entry) — r14's q122..q136 shape
    val cant = Set("q06")
    assert(contiguousBlock(Seq("q05", "q07", "q08"), all, n => !cant(n)))
    assert(!contiguousBlock(Seq("q05", "q07", "q08"), all, _ => true))
  }

  test("adjudicatedStreamingS: flagged streaming walls -> isolated values") {
    val isStreaming = Set("q242_s", "q148_s")
    // the r15 shape: 82.1 s in-pass; q242 19.54->4.10, q148 5.67->1.51
    val flags = Seq(
      Flag("q242_s", 19.54, 4.97, 4.10, "ambient-transient"),
      Flag("q148_s", 5.67, 2.26, 1.51, "ambient-transient"),
      Flag("q124_batch", 4.30, 2.11, 1.41, "ambient-transient")) // non-streaming: ignored
    val adj = adjudicatedStreamingS(82.1, flags, isStreaming)
    assert(math.abs(adj - (82.1 - 19.54 + 4.10 - 5.67 + 1.51)) < 1e-9)
    // -> 62.5: the r15 verdict's hand-adjudicated figure
    assert(math.abs(adj - 62.5) < 1e-9)
    // an UNADJUDICATED flag (isolated -1, beyond the 16-cap) never substitutes
    val capped = Seq(Flag("q242_s", 19.54, 4.97, -1.0, "unadjudicated"))
    assert(adjudicatedStreamingS(82.1, capped, isStreaming) == 82.1)
    // a confirmed regression NEVER substitutes (r17 advisory): the quiet
    // warm isolated re-run systematically under-reads contention cost, so
    // a confirmed-regression flag rides its full in-pass wall — a planted
    // sleep (verdicted regression) trips the bucket gate at full weight
    val planted = Seq(Flag("q242_s", 19.54, 4.97, 18.9, "regression"))
    assert(adjudicatedStreamingS(82.1, planted, isStreaming) == 82.1)
    // no streaming flags -> identity
    assert(adjudicatedStreamingS(82.1, Seq(flags(2)), isStreaming) == 82.1)
  }

  test("mixedFloor: stateful starts pay the stateful per-start floor") {
    assert(mixedFloor(47, 0, 0.28, 1.05) == 47 * 0.28) // all-stateless (the r15 shape)
    assert(math.abs(mixedFloor(47, 20, 0.4, 1.05) -
      (20 * 1.05 + 27 * 0.4)) < 1e-9)
    assert(mixedFloor(0, 0, 0.4, 1.05) == 0.0)
    // async listener skew: a delta Snap can report statefulStarts > starts
    // (a start's first stateful batch landing in the next window) — both
    // terms clamp instead of going negative (r17 advisory)
    assert(mixedFloor(10, 12, 0.3, 1.5) == 10 * 1.5)
    assert(mixedFloor(10, 12, 1.5, 0.3) == 10 * 0.3)
  }

  test("repOrder: reps traverse different orders; a time-local transient " +
      "cannot double-hit min-of-2 (r17 #1)") {
    val names = (0 until 40).map(i => f"q$i%02d")
    assert(BenchGate.repOrder(1, names) == names)
    assert(BenchGate.repOrder(2, names) == names.reverse)
    assert(BenchGate.repOrder(2, names).toSet == names.toSet) // nothing dropped
    assert(BenchGate.repOrder(3, names) == names)
    // each rep is one catalog pass; a transient inflates whatever queries
    // sit at execution positions [10, 20) of THAT rep's order
    def passTimes(rep: Int): Map[String, Double] =
      BenchGate.repOrder(rep, names).zipWithIndex.map { case (n, i) =>
        n -> (if (i >= 10 && i < 20) 3.0 else 1.0)
      }.toMap
    // different orders put the window on disjoint query sets (forward:
    // q10..q19; reversed: q20..q29) -> every query's min-of-2 recovers
    // the true 1.0 — the aggregate is order-transient-independent
    val mins = names.map(n => math.min(passTimes(1)(n), passTimes(2)(n)))
    assert(mins.forall(_ == 1.0))
    // the pre-r17 shape — rep 2 in the SAME order — baked the inflation
    // into min-of-2 for all ten window queries (the ~14-flag phantom tax)
    val baked = names.count(n => math.min(passTimes(1)(n), passTimes(1)(n)) == 3.0)
    assert(baked == 10)
  }

  test("Flag.json carries both measurements and the verdict") {
    val f = Flag("q128_entity_resolution", 9.22, 1.11, 1.19,
      "ambient-transient")
    assert(f.json ==
      """{"q":"q128_entity_resolution","pass_s":9.220,""" +
        """"expected_s":1.110,"isolated_s":1.190,""" +
        """"verdict":"ambient-transient"}""")
  }
}
