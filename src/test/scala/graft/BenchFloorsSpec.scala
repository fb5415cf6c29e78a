package graft

import org.scalatest.funsuite.AnyFunSuite

/** The floor/calibration bookkeeping of [[BenchFloors]] — including the
  * deliberately-slowed sanity check the round-11 verdict prescribed: the
  * ratchet signal must survive a host-speed change (normalize to ~1.0 on
  * a uniformly slower host) while a REAL regression on that same slower
  * host still reads as one.
  */
class BenchFloorsSpec extends AnyFunSuite {

  test("merge ratchets in CALIBRATION UNITS with two-pass confirmation: the first beating sample pends, the second re-stamps") {
    // Same-host case (runCalib == every floorCalib == 0.30): degenerates to
    // the raw-seconds ratchet.
    val prior = Map("sf0.1|q_a" -> 1.0, "sf0.1|q_b" -> 2.0, "sf0.1|q_gone" -> 3.0,
      "legacy_unnamespaced" -> 9.0)
    val priorCalib = Map("sf0.1|q_a" -> 0.30, "sf0.1|q_b" -> 0.30,
      "_calib_ref_estimate" -> 0.30)
    val pass1 = Seq(
      "q_a" -> 0.8, // faster: becomes a PENDING candidate, floor untouched
      "q_b" -> 2.5, // slower: floor + calib kept
      "q_new" -> 1.5, // new key: seeded with this run's calib
      "q_fail" -> -1.0) // failed: never recorded
    val (floors, calib, pending) =
      BenchFloors.merge(prior, priorCalib, Map.empty, pass1, "sf0.1", runCalib = 0.30)
    assert(floors == Map(
      "sf0.1|q_a" -> 1.0, // one sample is not evidence: held in pending
      "sf0.1|q_b" -> 2.0, "sf0.1|q_gone" -> 3.0,
      "sf0.1|q_new" -> 1.5))
    assert(pending == Map("sf0.1|q_a" -> 0.8 / 0.30, // normalized units
      "sf0.1|q_a#cal" -> 1.0)) // companion records the unit (1.0 = calibrated)
    assert(calib == Map(
      "sf0.1|q_a" -> 0.30, // floor kept -> calib kept
      "sf0.1|q_b" -> 0.30,
      "sf0.1|q_new" -> 0.30, // seeded
      "_calib_ref_estimate" -> 0.30)) // meta key passes through
    // pass 2 also beats the floor (0.85 < 0.98*1.0): CONFIRMS, and the
    // stamped value is the more conservative of the two samples
    val (floors2, calib2, pending2) = BenchFloors.merge(
      floors, calib, pending, Seq("q_a" -> 0.85), "sf0.1", runCalib = 0.30)
    assert(math.abs(floors2("sf0.1|q_a") - 0.85) < 1e-9)
    assert(calib2("sf0.1|q_a") == 0.30)
    assert(pending2.isEmpty) // candidate AND its unit companion both cleared
    // ... and symmetrically: if pass 2 is the FASTER one, the pending
    // (slower) candidate is what stamps — floors never record the
    // luckiest single window
    val (floors2b, _, _) = BenchFloors.merge(
      floors, calib, pending, Seq("q_a" -> 0.7), "sf0.1", runCalib = 0.30)
    assert(math.abs(floors2b("sf0.1|q_a") - 0.8) < 1e-9)
    // a run at another sf namespaces separately (and seeds immediately)
    val (floors3, _, _) =
      BenchFloors.merge(floors2, calib2, pending2, Seq("q_a" -> 0.1), "sf0.001", 0.3)
    assert(math.abs(floors3("sf0.1|q_a") - 0.85) < 1e-9 && floors3("sf0.001|q_a") == 0.1)
  }

  test("merge: the ratchet is alive on a 2x-slower host — normalized-equal samples confirm and re-stamp with the genuine calib") {
    // Floor 1.0 s at calib 0.30. On a 2x-slower host (calib 0.60) the same
    // binary measures ~2.0 s; anything under 2.0 raw (< 1.0 normalized)
    // must ratchet — this is exactly what a raw-seconds compare can never
    // do, and what retires the _calib_ref_estimate backfill.
    val prior = Map("sf0.1|q_a" -> 1.0, "sf0.1|q_pre" -> 1.0, "sf0.1|q_slow" -> 1.0)
    val priorCalib = Map("sf0.1|q_a" -> 0.30, "_calib_ref_estimate" -> 0.30)
    val results = Seq(
      "q_a" -> 1.9, // normalized 0.95: candidate, confirmed next pass
      "q_pre" -> 1.9, // pre-calib floor: compared via the ref estimate
      "q_slow" -> 2.4) // normalized 1.2: a real regression, floor kept
    val (f1, c1, p1) =
      BenchFloors.merge(prior, priorCalib, Map.empty, results, "sf0.1", runCalib = 0.60)
    assert(f1 == prior, "first sighting pends, floors untouched")
    assert(p1.keySet == Set("sf0.1|q_a", "sf0.1|q_a#cal",
      "sf0.1|q_pre", "sf0.1|q_pre#cal"))
    val (floors, calib, p2) =
      BenchFloors.merge(f1, c1, p1, results, "sf0.1", runCalib = 0.60)
    assert(math.abs(floors("sf0.1|q_a") - 1.9) < 1e-9 &&
      math.abs(floors("sf0.1|q_pre") - 1.9) < 1e-9 && floors("sf0.1|q_slow") == 1.0)
    assert(calib("sf0.1|q_a") == 0.60 && calib("sf0.1|q_pre") == 0.60)
    assert(!calib.contains("sf0.1|q_slow")) // kept floor keeps (no) stamp
    assert(p2.isEmpty)
    // the re-stamped floors normalize identically to the old ones:
    // 1.9/0.60 == 3.17 calib units ~ 1.0/0.30 == 3.33 (0.95x, the measured run)
    assert(math.abs(BenchFloors.normalizedRatio(1.9, 0.60, 1.0, 0.30) - 0.95) < 1e-9)
    // no calibration anywhere (pre-round-12 files): degrade to raw compare —
    // same pend-then-confirm discipline in raw seconds
    val (rf1, rc1, rp1) = BenchFloors.merge(Map("sf0.1|q_x" -> 1.0), Map.empty,
      Map.empty, Seq("q_x" -> 0.9), "sf0.1", runCalib = 0.60)
    assert(rf1("sf0.1|q_x") == 1.0 &&
      rp1 == Map("sf0.1|q_x" -> 0.9, "sf0.1|q_x#cal" -> 0.0)) // 0.0 = raw unit
    val (rf2, rc2, _) = BenchFloors.merge(rf1, rc1, rp1,
      Seq("q_x" -> 0.9), "sf0.1", runCalib = 0.60)
    assert(math.abs(rf2("sf0.1|q_x") - 0.9) < 1e-9)
    // ... and the raw confirm must NOT invent a calib stamp: the pending
    // sample may be another host's raw seconds, and pairing them with this
    // run's calib would permanently skew the key's normalized ratio
    assert(!rc2.contains("sf0.1|q_x"))
  }

  test("re-stamp guard: inside-margin samples neither stamp nor pend, and an unconfirmed candidate expires") {
    // Floor 1.0 s at calib 0.30. A same-binary pass whose calib drifts
    // 1% high reads normalized 0.99 — instrument noise, not a faster
    // plan; without the margin the ratchet would absorb it one-way and
    // every later pass would read inflated against the tightened floor.
    val prior = Map("sf0.1|q_a" -> 1.0)
    val priorCalib = Map("sf0.1|q_a" -> 0.30)
    val (noisy, noisyCalib, noisyPending) = BenchFloors.merge(prior, priorCalib,
      Map.empty, Seq("q_a" -> 0.99, "q_new" -> 0.99), "sf0.1", runCalib = 0.30)
    assert(noisy("sf0.1|q_a") == 1.0, "inside-margin sample must not re-stamp")
    assert(noisyCalib("sf0.1|q_a") == 0.30)
    assert(noisyPending.isEmpty, "inside-margin sample must not even pend")
    assert(noisy("sf0.1|q_new") == 0.99, "new keys seed unconditionally")
    // The q_histogram scenario (BASELINE.md "Known lucky-stamp key"): ONE
    // lucky window far under the floor, never reproduced — the candidate
    // pends, then expires on the next pass that fails the margin, and the
    // floor never absorbs the outlier.
    val (f1, c1, p1) = BenchFloors.merge(prior, priorCalib, Map.empty,
      Seq("q_a" -> 0.70), "sf0.1", runCalib = 0.30)
    assert(f1("sf0.1|q_a") == 1.0 && p1.contains("sf0.1|q_a"))
    val (f2, _, p2) = BenchFloors.merge(f1, c1, p1,
      Seq("q_a" -> 0.99), "sf0.1", runCalib = 0.30)
    assert(f2("sf0.1|q_a") == 1.0, "lucky sample must never become the floor")
    assert(p2.isEmpty, "unreproduced candidate must expire")
    // Pending survives a pass at ANOTHER sf untouched (an sf0.001 smoke run
    // between two sf0.1 passes must not expire an sf0.1 candidate).
    val (_, _, pOther) = BenchFloors.merge(f1, c1, p1,
      Seq("q_a" -> 0.99), "sf0.001", runCalib = 0.30)
    assert(pOther.contains("sf0.1|q_a"))
  }

  test("unit-mismatched pending never confirms: a raw-pended candidate re-records when calib appears, then confirms in the new unit") {
    // Pass 1: no calib anywhere → the sub-margin sample pends in RAW seconds.
    val prior = Map("sf0.1|q_a" -> 1.0)
    val (f1, c1, p1) = BenchFloors.merge(prior, Map.empty, Map.empty,
      Seq("q_a" -> 0.9), "sf0.1", runCalib = 0.30)
    assert(p1 == Map("sf0.1|q_a" -> 0.9, "sf0.1|q_a#cal" -> 0.0))
    // Between passes the calib file gains a ref estimate (e.g. the backfill
    // lands): pass 2's comparison runs in CALIBRATION units. Without the
    // unit companion, max(raw 0.9, normalized 0.5/0.30=1.67) would stamp
    // 1.67 * runCalib = 0.5 — a floor in neither unit. With it, the stale
    // raw candidate is discarded and the normalized sample re-records.
    val c1b = c1 + ("_calib_ref_estimate" -> 0.30)
    val (f2, _, p2) = BenchFloors.merge(f1, c1b, p1,
      Seq("q_a" -> 0.5), "sf0.1", runCalib = 0.30)
    assert(f2("sf0.1|q_a") == 1.0, "unit-mismatched candidate must not confirm a stamp")
    assert(p2 == Map("sf0.1|q_a" -> 0.5 / 0.30, "sf0.1|q_a#cal" -> 1.0))
    // Pass 3 confirms in the (matching) calibrated unit and stamps the
    // more conservative of the two normalized samples.
    val (f3, c3, p3) = BenchFloors.merge(f2, c1b, p2,
      Seq("q_a" -> 0.55), "sf0.1", runCalib = 0.30)
    assert(math.abs(f3("sf0.1|q_a") - 0.55) < 1e-9 && c3("sf0.1|q_a") == 0.30)
    assert(p3.isEmpty)
  }

  test("regime-suspect guard: two same-skew-regime passes can never pair into a restamp (the round-17 pass-32/33 scenario)") {
    // 12 floors stamped at the normal calib profile (0.22). A regime that
    // depresses SINGLE-THREAD speed while 4-way query throughput stays
    // normal reads calib 0.2568 (+17%) with unchanged raw query times, so
    // 10 of the 12 keys read sub-margin AT ONCE with no plan change —
    // the BASELINE.md round-17 pass-32/33 signature (48/44 sightings).
    val names = (1 to 12).map(i => f"q_$i%02d")
    val prior = names.map(n => s"sf0.1|$n" -> 1.0).toMap
    val priorCalib = names.map(n => s"sf0.1|$n" -> 0.22).toMap
    val skewed = names.take(10).map(_ -> 1.0) ++ names.drop(10).map(_ -> 1.3)
    val (f1, c1, p1) =
      BenchFloors.merge(prior, priorCalib, Map.empty, skewed, "sf0.1", runCalib = 0.2568)
    assert(f1 == prior, "a regime-suspect pass must not stamp anything")
    assert(names.take(10).forall(n => p1.contains(s"sf0.1|$n")), "it may still pend")
    // A SECOND pass in the same skew regime — exactly the pairing that
    // produced the 12 round-17 noise restamps — may refresh pendings but
    // must not confirm them.
    val (f2, c2, p2) =
      BenchFloors.merge(f1, c1, p1, skewed, "sf0.1", runCalib = 0.2568)
    assert(f2 == prior, "two same-regime passes must never pair into a restamp")
    assert(names.take(10).forall(n => p2.contains(s"sf0.1|$n")))
    // Back on the normal calib profile the same binary reads ~1.0
    // normalized: every skew candidate EXPIRES, floors hold — the
    // round-17 pass-34 outcome, now guaranteed by construction.
    val (f3, c3, p3) =
      BenchFloors.merge(f2, c2, p2, names.map(_ -> 1.0), "sf0.1", runCalib = 0.22)
    assert(f3 == prior && p3.isEmpty)
    // A genuine improvement pended during the skew period still lands:
    // one honest NORMAL-BREADTH pass confirms it, and the stamp (max of
    // the two samples) anchors at the more conservative one.
    val oneFast = Seq("q_01" -> 0.7) ++ names.drop(1).map(_ -> 1.0)
    val (f4, _, p4) = BenchFloors.merge(f2, c2, p2, oneFast, "sf0.1", runCalib = 0.22)
    // pended sample (skew pass): 1.0/0.2568 = 3.894 calib units; honest
    // sample: 0.7/0.22 = 3.18 — max picks the skew (higher) sample, so
    // the floor lands at 3.894 * 0.22 = 0.857 raw, NOT the lucky 0.7.
    assert(math.abs(f4("sf0.1|q_01") - (1.0 / 0.2568) * 0.22) < 1e-9)
    assert(p4.isEmpty, "the other nine skew candidates expire in the honest pass")
    // Uniform host drift (the round-11 2x-slower-host contract) is NOT
    // regime-suspect: normalized ratios stay ~1.0 on a uniformly slower
    // host, so sighting breadth stays normal and the ratchet stays alive
    // (pinned end-to-end by the 2x-slower-host test above).
  }

  test("regime-suspect breadth is judged against the keys actually MEASURED, not the whole floor set") {
    // 100 floors, but a failure-heavy skew pass measures only 12 of them
    // (the rest are -1.0 failure sentinels) and reads 10 sub-margin. An
    // all-floors denominator would set the limit at ceil(0.1*100) = 10
    // and classify the pass honest (10 > 10 is false); the measured
    // denominator sets it at max(8, ceil(0.1*12)) = 8 and correctly
    // flags it suspect — so two such passes can't pair into restamps.
    val names = (1 to 100).map(i => f"q_$i%03d")
    val prior = names.map(n => s"sf0.1|$n" -> 1.0).toMap
    val priorCalib = names.map(n => s"sf0.1|$n" -> 0.22).toMap
    val skewedPartial: Seq[(String, Double)] =
      names.take(10).map(_ -> 1.0) ++ names.slice(10, 12).map(_ -> 1.3) ++
        names.drop(12).map(_ -> -1.0)
    val (f1, c1, p1) = BenchFloors.merge(
      prior, priorCalib, Map.empty, skewedPartial, "sf0.1", runCalib = 0.2568)
    val (f2, _, _) = BenchFloors.merge(
      f1, c1, p1, skewedPartial, "sf0.1", runCalib = 0.2568)
    assert(f2 == prior, "a failure-heavy skew pass must not slip under the breadth limit")
  }

  test("regime-suspect limit is capped at measured-1: an 8-measured/8-sub-margin pass is suspect (the round-19 ADVICE hole)") {
    // 20 floors, but the pass measures only 8 of them — and ALL 8 read
    // sub-margin. Under a plain max(MassSightingMin, frac*measured) the
    // limit is 8 and 8 > 8 is false, so two such failure-heavy skew
    // passes could pair into up to 8 restamps — exactly the bug class
    // the measured-denominator fix targets. The measured-1 cap sets the
    // limit at 7 and flags the pass suspect.
    val names = (1 to 20).map(i => f"q_$i%02d")
    val prior = names.map(n => s"sf0.1|$n" -> 1.0).toMap
    val priorCalib = names.map(n => s"sf0.1|$n" -> 0.22).toMap
    val skewedPartial: Seq[(String, Double)] =
      names.take(8).map(_ -> 1.0) ++ names.drop(8).map(_ -> -1.0)
    val (f1, c1, p1) = BenchFloors.merge(
      prior, priorCalib, Map.empty, skewedPartial, "sf0.1", runCalib = 0.2568)
    val (f2, _, _) = BenchFloors.merge(
      f1, c1, p1, skewedPartial, "sf0.1", runCalib = 0.2568)
    assert(f2 == prior, "two 100%-sub-margin small passes must never pair into restamps")
    // ... while a single-sighting pass (the normal one-improvement case)
    // stays eligible: 1 measured, 1 sub-margin pends then confirms.
    val oneKey: Seq[(String, Double)] =
      Seq("q_01" -> 0.8) ++ names.drop(1).map(_ -> -1.0)
    val (g1, gc1, gp1) = BenchFloors.merge(
      prior, priorCalib, Map.empty, oneKey, "sf0.1", runCalib = 0.22)
    assert(gp1.contains("sf0.1|q_01"), "a single sighting must still pend")
    val (g2, _, gp2) = BenchFloors.merge(g1, gc1, gp1, oneKey, "sf0.1", runCalib = 0.22)
    assert(math.abs(g2("sf0.1|q_01") - 0.8) < 1e-9 && gp2.isEmpty,
      "a single-sighting pass must still be able to confirm")
  }

  test("regime-suspect pass must not SEED a first-time floor: the sample pends and a normal pass stamps the conservative max") {
    // The r18 verdict's latent hole: the guard gated confirmation but a
    // suspect pass could still stamp a skew-deflated sample as a NEW
    // key's first floor — permanent, since floors never loosen. 12
    // existing floors at the normal profile (0.22); the skew pass
    // (calib 0.2568) reads 10 of them sub-margin (suspect) and also
    // carries a first-time key q_new.
    val names = (1 to 12).map(i => f"q_$i%02d")
    val prior = names.map(n => s"sf0.1|$n" -> 1.0).toMap
    val priorCalib = names.map(n => s"sf0.1|$n" -> 0.22).toMap
    val skewed: Seq[(String, Double)] =
      names.take(10).map(_ -> 1.0) ++ names.drop(10).map(_ -> 1.3) ++
        Seq("q_new" -> 0.5)
    val (f1, c1, p1) =
      BenchFloors.merge(prior, priorCalib, Map.empty, skewed, "sf0.1", runCalib = 0.2568)
    assert(!f1.contains("sf0.1|q_new"), "a suspect pass must not seed a first-time floor")
    assert(!c1.contains("sf0.1|q_new"))
    assert(math.abs(p1("sf0.1|q_new") - 0.5 / 0.2568) < 1e-9, "it pends instead (normalized)")
    assert(p1("sf0.1|q_new#cal") == 1.0)
    // A second suspect pass refreshes the candidate at the MAX of the two
    // samples — a skew reading can only make the eventual seed more
    // conservative, never lower it.
    val skewed2 = skewed.init :+ ("q_new" -> 0.6)
    val (f2, c2, p2) = BenchFloors.merge(f1, c1, p1, skewed2, "sf0.1", runCalib = 0.2568)
    assert(!f2.contains("sf0.1|q_new"))
    assert(math.abs(p2("sf0.1|q_new") - 0.6 / 0.2568) < 1e-9)
    // The next NORMAL-breadth pass seeds — at the conservative max of the
    // pending (skew-era) sample and its own, with its genuine calib.
    val honest: Seq[(String, Double)] = names.map(_ -> 1.0) :+ ("q_new" -> 0.4)
    val (f3, c3, p3) = BenchFloors.merge(f2, c2, p2, honest, "sf0.1", runCalib = 0.22)
    val expected = math.max(0.6 / 0.2568, 0.4 / 0.22) * 0.22
    assert(math.abs(f3("sf0.1|q_new") - expected) < 1e-9,
      "the seed must anchor at the conservative max, not the lucky sample")
    assert(c3("sf0.1|q_new") == 0.22)
    assert(!p3.contains("sf0.1|q_new") && !p3.contains("sf0.1|q_new#cal"))
    // Unit pinning on a RAW-era file (no calib stamps anywhere): a
    // suspect pass still pends a first-time key in CALIBRATION units
    // (runCalib is always measured, and the eventual seed writes a calib
    // stamp — matching the pre-existing seed behavior, which stamps
    // calib even into raw-era files), so the pend → seed chain never
    // mixes units regardless of the file's era.
    val rawPrior = names.map(n => s"sf0.1|$n" -> 1.0).toMap
    val rawSkewed: Seq[(String, Double)] =
      names.map(_ -> 0.9) ++ Seq("q_new" -> 0.5) // raw compare: all 12 sub-margin
    val (rf1, rc1, rp1) =
      BenchFloors.merge(rawPrior, Map.empty, Map.empty, rawSkewed, "sf0.1", runCalib = 0.25)
    assert(!rf1.contains("sf0.1|q_new"))
    assert(math.abs(rp1("sf0.1|q_new") - 0.5 / 0.25) < 1e-9 && rp1("sf0.1|q_new#cal") == 1.0)
    val rawHonest: Seq[(String, Double)] = names.map(_ -> 1.0) :+ ("q_new" -> 0.4)
    val (rf2, rc2, rp2) = BenchFloors.merge(rf1, rc1, rp1, rawHonest, "sf0.1", runCalib = 0.25)
    assert(math.abs(rf2("sf0.1|q_new") - math.max(0.5 / 0.25, 0.4 / 0.25) * 0.25) < 1e-9)
    assert(rc2("sf0.1|q_new") == 0.25, "the seed must stamp its calib even in a raw-era file")
    assert(!rp2.contains("sf0.1|q_new"))
  }

  test("seed path treats an absent unit companion as MISMATCH: a hand-edit relic pending never unit-mixes into the seed") {
    // The only way a floorless key carries a companion-less pending is a
    // hand edit (the suspect branch always stamps #cal): a floor deleted
    // during a restatement while a legacy raw-seconds pending survived.
    // A matched-by-default relic would be maxed against a normalized
    // sample and multiplied by runCalib — a seed in no coherent unit
    // (here: max(raw 0.9 s, 0.1/0.22) * 0.22 = 0.198 s stamped for a
    // 0.1 s query). The relic must be ignored instead.
    val names = (1 to 12).map(i => f"q_$i%02d")
    val prior = names.map(n => s"sf0.1|$n" -> 1.0).toMap
    val priorCalib = names.map(n => s"sf0.1|$n" -> 0.22).toMap
    val relic = Map("sf0.1|q_gone" -> 0.9) // raw-era pending, no #cal companion
    // Normal-breadth pass: seeds from its own sample alone; relic cleared.
    val honest: Seq[(String, Double)] = names.map(_ -> 1.0) :+ ("q_gone" -> 0.1)
    val (f1, c1, p1) =
      BenchFloors.merge(prior, priorCalib, relic, honest, "sf0.1", runCalib = 0.22)
    assert(math.abs(f1("sf0.1|q_gone") - 0.1) < 1e-9,
      "the relic must not inflate or unit-mix into the seed")
    assert(c1("sf0.1|q_gone") == 0.22)
    assert(!p1.contains("sf0.1|q_gone") && !p1.contains("sf0.1|q_gone#cal"))
    // Regime-suspect pass: re-records the candidate fresh in the current
    // (normalized) unit instead of maxing against the raw relic.
    val skewed: Seq[(String, Double)] = names.map(_ -> 0.9) :+ ("q_gone" -> 0.1)
    val (f2, _, p2) =
      BenchFloors.merge(prior, priorCalib, relic, skewed, "sf0.1", runCalib = 0.2568)
    assert(!f2.contains("sf0.1|q_gone"), "suspect pass still must not seed")
    assert(math.abs(p2("sf0.1|q_gone") - 0.1 / 0.2568) < 1e-9,
      "suspect pass re-records fresh in normalized units, ignoring the relic")
    assert(p2("sf0.1|q_gone#cal") == 1.0)
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
    // Production reps (min-of-5, the Bench setting) on both sides: the
    // wider rep count plus the min make the comparison robust to one
    // scheduler stall. The bound is still deliberately loose (10x) — this
    // asserts "returns a time of the right order, twice", NOT instrument
    // precision (that claim lives in BASELINE.md's cross-run table); a
    // wall-clock assertion tighter than this flaked risk on a loaded or
    // frequency-scaling CI host without any code defect.
    val a = BenchFloors.calibrate()
    val b = BenchFloors.calibrate()
    assert(a > 0 && b > 0)
    assert(math.max(a, b) / math.min(a, b) < 10.0, s"calib unstable: $a vs $b")
  }
}
