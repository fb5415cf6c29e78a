package graft

import org.scalatest.funsuite.AnyFunSuite

/** The floor/calibration bookkeeping of [[BenchFloors]] — including the
  * deliberately-slowed sanity check the round-11 verdict prescribed: the
  * ratchet signal must survive a host-speed change (normalize to ~1.0 on
  * a uniformly slower host) while a REAL regression on that same slower
  * host still reads as one.
  */
class BenchFloorsSpec extends AnyFunSuite {

  test("merge: lower samples ratchet the floor and stamp the run's calib; higher/failed samples change nothing") {
    val prior = Map("sf0.1|q_a" -> 1.0, "sf0.1|q_b" -> 2.0, "sf0.1|q_gone" -> 3.0,
      "legacy_unnamespaced" -> 9.0)
    val priorCalib = Map("sf0.1|q_a" -> 0.30, "sf0.1|q_b" -> 0.30,
      "_calib_ref_estimate" -> 0.30)
    val results = Seq(
      "q_a" -> 0.8, // faster: ratchets, calib re-stamped
      "q_b" -> 2.5, // slower: floor + calib kept
      "q_new" -> 1.5, // new key: seeded with this run's calib
      "q_fail" -> -1.0) // failed: never recorded
    val (floors, calib) = BenchFloors.merge(prior, priorCalib, results, "sf0.1", runCalib = 0.50)
    assert(floors == Map(
      "sf0.1|q_a" -> 0.8, "sf0.1|q_b" -> 2.0, "sf0.1|q_gone" -> 3.0,
      "sf0.1|q_new" -> 1.5))
    assert(calib == Map(
      "sf0.1|q_a" -> 0.50, // re-stamped by the ratcheting run
      "sf0.1|q_b" -> 0.30, // floor kept -> calib kept
      "sf0.1|q_new" -> 0.50, // seeded
      "_calib_ref_estimate" -> 0.30)) // meta key passes through
    // a run at another sf namespaces separately
    val (floors2, _) = BenchFloors.merge(floors, calib, Seq("q_a" -> 0.1), "sf0.001", 0.5)
    assert(floors2("sf0.1|q_a") == 0.8 && floors2("sf0.001|q_a") == 0.1)
  }

  test("deliberately-slowed sanity check: host drift normalizes out, a genuine regression does not") {
    // Floor recorded on the reference host: 1.0 s at calib 0.30.
    // The SAME binary on a 2x-slower host measures 2.0 s at calib 0.60:
    // the raw ratio (2.0x) would scream regression; normalized it is 1.0.
    val driftOnly = BenchFloors.normalizedRatio(2.0, 0.60, 1.0, 0.30)
    assert(math.abs(driftOnly - 1.0) < 1e-9, s"host drift must normalize out, got $driftOnly")
    // A genuinely 2x-regressed query on that same slower host measures
    // 4.0 s — and STILL reads as 2.0 after normalization: the ratchet is
    // alive on the slow host (this is exactly the signal the round-11
    // host left dead).
    val realRegression = BenchFloors.normalizedRatio(4.0, 0.60, 1.0, 0.30)
    assert(math.abs(realRegression - 2.0) < 1e-9, s"real regression must survive normalization, got $realRegression")
    // and a faster host doesn't hide a regression either
    val fastHostRegression = BenchFloors.normalizedRatio(1.5, 0.15, 1.0, 0.30)
    assert(math.abs(fastHostRegression - 3.0) < 1e-9)
  }

  test("parse/render round-trip preserves every entry; duplicates min-merge") {
    val m = Map("sf0.1|q_a" -> 0.5, "sf0.001|q_b" -> 1.25, "_calib_ref_estimate" -> 0.31)
    assert(BenchFloors.parseFlatJson(BenchFloors.renderFlatJson(m), "spec") == m)
    assert(BenchFloors.parseFlatJson("""{"k":2.0,"k":1.0}""", "spec") == Map("k" -> 1.0))
  }

  test("calibrate() returns a positive, repeatable per-core time") {
    val a = BenchFloors.calibrate(reps = 2)
    val b = BenchFloors.calibrate(reps = 2)
    assert(a > 0 && b > 0)
    // same JVM, back to back: within 3x of each other (JIT is warm after
    // the first call's reps; this is a smoke bound, not a precision claim)
    assert(math.max(a, b) / math.min(a, b) < 3.0, s"calib unstable: $a vs $b")
  }
}
