package graft

/** Host-calibrated floor bookkeeping for [[Bench]].
  *
  * The per-query floors in `bench/floors.json` are minima accumulated
  * across every bench run — but across HOSTS of different per-core speed,
  * a raw run/floor comparison conflates host drift with code regressions:
  * round 11 ended on a VM ~1.7× slower per core than the one that seeded
  * most floors, which made the ratchet dead (no run could lower a floor)
  * and the regression signal mute (every ratio inflated uniformly).
  *
  * The fix is a CALIBRATION measurement: a deterministic, pure-JVM,
  * single-thread workload (xorshift64* stream + Arrays.sort rounds — the
  * integer-hash + sort mix the query engine itself is made of) timed as
  * min-of-reps once per bench run — AFTER the query rounds, where JIT/GC
  * are at steady state; the committed floor_calib stamps were recorded at
  * that placement, so moving the call would skew every normalized ratio.
  * Each floor is stored
  * alongside the calibration of the run that recorded it
  * (`bench/floor_calib.json`, same keys as floors.json); floors that
  * predate calibration fall back to the file's `_calib_ref_estimate`
  * entry (derived mechanically — see BASELINE.md "Floor calibration").
  * The judge/driver comparison is then host-normalized:
  *
  *   normalizedRatio = (run / runCalib) / (floor / floorCalib)
  *
  * i.e., both sides are expressed in calibration units before comparing,
  * so a uniformly slower host cancels out and a genuine per-query
  * regression still shows. BenchFloorsSpec holds the deliberately-slowed
  * sanity check: same code on a 2×-slower host normalizes to 1.0; a real
  * 2× regression on that host still reads 2.0.
  */
object BenchFloors {

  /** Min-of-`reps` seconds for the fixed calibration workload. Single
    * thread (the host drift observed was per-core speed), deterministic
    * (no RNG seed drift, no allocation-size dependence on input), sized
    * to run long enough that JIT + one GC cycle amortize inside the reps
    * and the min is a stable per-core speed measure (~0.2-0.5 s/rep).
    */
  def calibrate(reps: Int = 5): Double = {
    var best = Double.MaxValue
    var sink = 0L
    var rep = 0
    while (rep < reps) {
      val t0 = System.nanoTime()
      var x = 0x9e3779b97f4a7c15L
      val arr = new Array[Long](1 << 16)
      var round = 0
      while (round < 48) {
        var i = 0
        while (i < arr.length) {
          x ^= x >>> 12; x ^= x << 25; x ^= x >>> 27
          arr(i) = x * 0x2545f4914f6cdd1dL
          i += 1
        }
        java.util.Arrays.sort(arr)
        sink ^= arr(round)
        round += 1
      }
      best = math.min(best, (System.nanoTime() - t0) / 1e9)
      rep += 1
    }
    // keep `sink` observably live so the loop cannot be optimized away
    if (sink == 0x5ca1ab1eL) System.err.println("[bench] calib sink collision")
    best
  }

  /** Parse a flat one-level `{"k":1.23,...}` JSON object (the floors /
    * floor-calib file format). The file is consumed MECHANICALLY by the
    * judge; an entry silently dropped by this hand-rolled parser would
    * erase a floor without a trace, so any parse loss warns on stderr.
    * Duplicate keys (hand merge) MIN-merge with their own warning, never
    * silent last-wins.
    */
  def parseFlatJson(txt: String, warnTag: String): Map[String, Double] = {
    val body = txt.dropWhile(_ != '{').drop(1).takeWhile(_ != '}')
    val entries = body.split(",").iterator.filter(_.trim.nonEmpty).toSeq
    val parsedPairs = entries.flatMap { kv =>
      kv.split(":") match {
        case Array(k, v) =>
          val key = k.trim.stripPrefix("\"").stripSuffix("\"")
          scala.util.Try(v.trim.toDouble).toOption.map(key -> _)
        case _ => None
      }
    }
    if (parsedPairs.size != entries.size)
      System.err.println(s"[bench] WARN: $warnTag: ${entries.size - parsedPairs.size}/${entries.size} entries unparseable, dropped from the merge")
    parsedPairs.groupBy(_._1).map { case (key, vs) =>
      val values = vs.map(_._2)
      if (values.distinct.size > 1)
        System.err.println(s"[bench] WARN: $warnTag: duplicate key $key with conflicting values ${values.mkString(", ")}; keeping the minimum")
      key -> values.min
    }
  }

  def renderFlatJson(m: Map[String, Double]): String =
    m.toSeq.sortBy(_._1).map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")

  /** Floor + calibration merge for one bench run — the ratchet compares in
    * CALIBRATION UNITS, not raw seconds.
    *
    * A raw-seconds ratchet dies the moment the host class changes: on a
    * host 1.8× slower per core than the floor-era one (the measured
    * round-12 situation) no run can ever lower a floor, so every floor
    * keeps its stale stamp and the `_calib_ref_estimate` fallback never
    * retires. Comparing `t / runCalib` against `floor / floorCalib`
    * keeps the ratchet alive on ANY host: the same binary running at its
    * usual normalized speed re-stamps floors with the current host's
    * genuine calibration, and only a genuinely faster PLAN lowers the
    * floor in normalized units. Consequence (documented in BASELINE.md
    * "Floor calibration"): a floor's raw seconds may go UP across a merge
    * when a slower host records it — floors are only meaningful TOGETHER
    * with their calib stamp, which is exactly how normalizedRatio and
    * dev/normalized_ratios.py consume them.
    *
    * Floors: start FROM the prior map (a failed or renamed-away query
    * keeps its recorded floor); legacy un-namespaced keys (no "|") are
    * dropped. A pre-calibration floor (no per-key stamp) is compared via
    * the prior calib map's `_calib_ref_estimate`; if that meta key is
    * absent too, the comparison degrades to raw seconds (the pre-round-12
    * behavior). Calib: an entry follows its floor — (re)written with
    * `runCalib` exactly when this run seeds or lowers that floor, kept
    * otherwise; meta keys (leading "_") pass through untouched.
    *
    * RE-STAMP MARGIN + TWO-PASS CONFIRMATION: an EXISTING floor only
    * re-stamps after TWO passes independently beat it by more than
    * [[RestampMargin]] in normalized units, and the stamped value is the
    * MORE CONSERVATIVE (slower) of the two confirming samples. The margin
    * alone is not enough: the single-thread calib drifts ~9% between
    * same-binary passes (BASELINE.md round-13 pass 2 vs 3), so a pass
    * whose calib happens to read high makes t/runCalib read low past any
    * margin narrower than the drift itself — a 2% margin only blocks the
    * sub-2% tail of a ~9% effect, and the ratchet would still absorb
    * favorable (t, calib) noise pairings one-way (the round-14
    * `q_histogram` floor is the scar: one lucky window stamped 0.091 s
    * where eight sibling passes of the same binary read 0.115–0.142 s,
    * leaving a recurring spurious ~1.5–1.65× flag). Requiring a second
    * independent sub-margin pass — candidates tracked in
    * `bench/floor_pending.json`, in normalized units — makes a noise
    * stamp need the same favorable pairing twice in a row, and stamping
    * the max of the two samples bounds the floor at the REPRODUCIBLE
    * level rather than the luckiest window. A candidate that fails the
    * margin on the next pass at its sf expires (the improvement didn't
    * reproduce); a genuine plan improvement simply lands one pass later,
    * which an accumulating ratchet doesn't care about. New keys seed
    * unconditionally on a normal-breadth pass (there is no floor to
    * protect yet) — but NOT on a regime-suspect one, whose skew-deflated
    * sample would become a permanently tight first stamp (round-19
    * closure of the r18 verdict's latent seed-from-suspect hole): such a
    * pass records the key as a pending candidate instead, and the next
    * normal-breadth pass stamps the seed at the conservative MAX of the
    * pending sample and its own.
    */
  val RestampMargin = 0.98

  /** REGIME-SUSPECT GUARD (round-18, from the round-17 ADVICE): the
    * two-pass rule assumed two consecutive passes are independent
    * evidence, but BASELINE.md round-17 passes 32–33 showed a regime
    * that breaks that assumption — the host's single-thread speed sat
    * ~10% depressed while 4-way query throughput was normal, so the
    * calib read high (+9–17% over the stamp profile), every t/runCalib
    * read low, and 44–48 floors appeared sub-margin AT ONCE across two
    * consecutive passes, pairing into 12 noise restamps.
    *
    * The calib value alone cannot distinguish that regime from a
    * genuinely slower host (the round-11 case the calibration exists
    * for), but the SIGHTING BREADTH can: uniform host drift cancels in
    * normalized units (sightings stay rare), a real plan improvement
    * moves one or a few related keys, while the skew regime moves a
    * large fraction of the floor set together. A pass whose sub-margin
    * sightings exceed max([[MassSightingMin]], [[MassSightingFrac]] of
    * the existing floors at its sf, capped at the measured breadth
    * minus one so a small failure-heavy pass cannot sit at 100%
    * sub-margin breadth and still read honest — the round-19 ADVICE
    * hole: 8 measured / 8 sightings vs a MassSightingMin limit of 8 is
    * not suspect under a plain max) is therefore regime-suspect: it may
    * record/refresh pending candidates (conservatively, keeping the max
    * of the old and new sample — and since round 19 first-time keys are
    * recorded the same way rather than seeded), and
    * its at-or-above-margin reads still expire stale candidates — but
    * it can never CONFIRM a restamp or stamp a first-time floor.
    * Confirmation thus requires a pass of normal sighting breadth, and
    * since the stamp takes the MAX of
    * the two samples, every stamped floor is anchored at or above a
    * measurement from an honest-regime pass. A corollary closes the
    * lucky-window hole too: confirming a mass of pendings in one pass
    * is impossible by construction, because a pass fast enough to
    * confirm them all is itself mass-sub-margin and so suspect.
    *
    * Accepted limitation: a deliberate engine-wide improvement that
    * legitimately speeds up more than the limit's share of keys would
    * make every subsequent pass regime-suspect and freeze confirmation
    * for those keys. On this frozen, converged key set that event is a
    * deliberate plan change, and the escape path is the documented
    * hand-restatement process (BASELINE.md r15/r18 precedents): restate
    * the affected floors from the improving pass's measured samples,
    * with provenance. Floors failing to tighten never weakens the
    * regression contract — runs simply read sub-1.0 until restated.
    *
    * The measured−1 cap carries a second accepted freeze, for SUBSET
    * benches (round-20, from the round-19 ADVICE): a pass measuring
    * only 2–8 floored keys (a hypothetical targeted re-run of a few
    * queries) whose keys ALL genuinely improved sits at 100%
    * sub-margin breadth and is regime-suspect by the cap every time —
    * such a pass can pend and refresh its candidates but can never
    * confirm them. The escape is the same pair as above: confirm from
    * a pass of normal breadth (the full suite at that sf), or use the
    * documented hand-restatement process. [[Bench]] today always runs
    * the full suite, so the freeze is latent until a subset-run
    * mechanism exists; it is the intended trade — a 100%-sub-margin
    * read carries no internal evidence distinguishing a genuine
    * subset improvement from the calib-skew regime.
    */
  val MassSightingMin = 8
  val MassSightingFrac = 0.10

  /** Companion-key suffix in `floor_pending.json`: `<key>#cal` records the
    * UNIT of the pass that pended `<key>` — 1.0 when the sample was held in
    * calibration units, 0.0 when in raw seconds. Without it a candidate
    * recorded raw (no calib stamp for the key on pass 1) could be max'd
    * against a NORMALIZED pass-2 sample (or vice versa) if the key's calib
    * availability changes between the passes, and the stamp would multiply
    * a raw-seconds value by runCalib — a floor in neither unit. A unit
    * mismatch now re-records the candidate fresh in the current unit
    * instead of mixing. Legacy entries (no companion) are treated as
    * matching the current pass in the RESTAMP path — exactly the pre-fix
    * behavior, and correct for every existing file since a key's calib
    * presence only changes on a stamp, which clears its pending entry
    * anyway. The SEED path (floorless key) defaults the opposite way —
    * absent companion = mismatch — because its pendings are always
    * companion-stamped at write time, so a companion-less one there is a
    * hand-edit relic of unknown unit (rationale at the seed branch in
    * [[merge]], round-20 from the round-19 ADVICE).
    */
  val PendingUnitSuffix = "#cal"

  def merge(
      priorFloors: Map[String, Double],
      priorCalib: Map[String, Double],
      priorPending: Map[String, Double],
      results: Seq[(String, Double)],
      sfTag: String,
      runCalib: Double): (Map[String, Double], Map[String, Double], Map[String, Double]) = {
    val base = priorFloors.filter(_._1.contains("|"))
    val refEstimate = priorCalib.get("_calib_ref_estimate")
    var floors = base
    var calib = priorCalib
    var pending = priorPending.filter(_._1.contains("|"))
    def dropPending(key: String): Unit = {
      pending -= key; pending -= (key + PendingUnitSuffix)
    }
    // The key's floor calibration, resolved through the one fallback
    // chain (per-key stamp, then the legacy ref estimate). Defined ONCE:
    // both the normalized comparison and the pending-unit bookkeeping key
    // off this same Option — two divergent lookups would reopen the
    // unit-mixing bug class PendingUnitSuffix exists to prevent.
    def calibOf(key: String): Option[Double] =
      priorCalib.get(key).orElse(refEstimate)
    // Normalized (sample, floor) pair for an existing floor, in whichever
    // unit `floorCalib` dictates — the single comparison rule both the
    // sighting pre-scan and the merge loop use.
    def norms(floorCalib: Option[Double], floor: Double, t: Double): (Double, Double) =
      floorCalib match {
        case Some(fc) => (t / runCalib, floor / fc)
        case None     => (t, floor)
      }
    def isSighting(name: String, t: Double): Boolean =
      t >= 0 && base.get(sfTag + "|" + name).exists { floor =>
        val (curNorm, floorNorm) = norms(calibOf(sfTag + "|" + name), floor, t)
        curNorm < RestampMargin * floorNorm
      }
    // Pre-scan: sub-margin sighting breadth decides whether this pass may
    // confirm restamps (MassSightingMin scaladoc — the calib-skew regime
    // of BASELINE.md round-17 passes 32–33 reads dozens of floors
    // sub-margin at once; an honest pass reads a handful).
    val sightings = results.count { case (name, t) => isSighting(name, t) }
    // The breadth denominator is the floored keys this pass actually
    // MEASURED (t >= 0), not every floor at the sf: on a failure-heavy
    // pass (many -1.0 sentinels) an all-floors denominator would inflate
    // the limit and let a skew pass slip under it while mass-confirming
    // the few keys that did run.
    val measuredWithFloor = results.count { case (name, t) =>
      t >= 0 && base.contains(sfTag + "|" + name)
    }
    // The MassSightingMin lower bound exists for full-breadth passes (so
    // a handful of honest sightings never trips the guard), but on a
    // pass that measured few floored keys it would make suspicion
    // unreachable (8 measured, 8 sub-margin -> limit 8, 8 > 8 false) —
    // cap the limit at measured-1, so 100%-sub-margin small passes are
    // suspect while a single-sighting pass (the normal one-improvement
    // case) never is.
    val massLimit = math.min(
      math.max(MassSightingMin, math.ceil(MassSightingFrac * measuredWithFloor).toInt),
      math.max(1, measuredWithFloor - 1))
    val regimeSuspect = sightings > massLimit
    if (regimeSuspect)
      System.err.println(s"[bench] NOTE: $sightings sub-margin sightings at $sfTag (limit $massLimit) — regime-suspect pass (calib-skew signature, BASELINE.md round-17 passes 32-33); pendings recorded/refreshed, no floor restamps or first-time seeds this pass")
    results.foreach { case (name, t) =>
      if (t >= 0) {
        val key = sfTag + "|" + name
        base.get(key) match {
          case None =>
            // New key. A normal-breadth pass seeds it (no floor to
            // protect yet), folding in any pending sample a suspect pass
            // left behind at the conservative max; a regime-suspect pass
            // must NOT stamp its skew-deflated sample as a first-time
            // floor — it records the key as a pending candidate instead
            // (normalized units, since runCalib is always measured),
            // exactly like a restamp sighting (RestampMargin scaladoc).
            // Seed-path pendings have no expiry of their own (an
            // at-margin read expires RESTAMP candidates below, but a
            // floorless key has no margin to read against), so one
            // anomalously slow suspect sample inflates the eventual
            // seed and a never-reappearing key's entry lingers — both
            // accepted: an inflated seed self-corrects DOWN via the
            // two-pass restamp rule, and a lingering entry is inert.
            // Unit default: seed-path pendings are always written with
            // their #cal companion at 1.0 (the suspect branch below
            // stamps both keys), so a companion-LESS pending here can
            // only be a hand-edit relic — a floor deleted during a
            // restatement while a pre-companion raw-seconds pending
            // survived. Hence `exists`, not the restamp path's
            // `forall`: an absent companion defaults to MISMATCH and
            // the relic is dropped (normal pass) or re-recorded fresh
            // in the current unit (suspect pass) rather than maxed
            // against a normalized sample and multiplied by runCalib —
            // a value in no coherent unit. (The restamp path keeps the
            // forall default, correct there because a legacy pending
            // for a key WITH a floor was recorded in that floor's own
            // comparison unit.)
            val seedSameUnit =
              pending.get(key + PendingUnitSuffix).exists(_ > 0.5)
            if (regimeSuspect) {
              val refreshed = pending.get(key)
                .filter(_ => seedSameUnit)
                .fold(t / runCalib)(math.max(_, t / runCalib))
              pending += key -> refreshed
              pending += (key + PendingUnitSuffix) -> 1.0
            } else {
              val seed = pending.get(key)
                .filter(_ => seedSameUnit)
                .map(p => math.max(p, t / runCalib) * runCalib)
                .getOrElse(t)
              floors += key -> seed
              calib += key -> runCalib
              dropPending(key)
            }
          case Some(floor) =>
            // This sample and the floor in the same units: calibration
            // units when any calib stamp exists, raw seconds otherwise
            // (pre-round-12 files) — the pending bookkeeping inherits
            // whichever unit the comparison used.
            val hasCalib = calibOf(key)
            val (curNorm, floorNorm) = norms(hasCalib, floor, t)
            if (curNorm < RestampMargin * floorNorm) {
              // Only a same-UNIT candidate may confirm (PendingUnitSuffix
              // scaladoc): a candidate pended in the other unit is stale
              // bookkeeping, not a confirming sample — re-record fresh.
              // And only a NORMAL-BREADTH pass may confirm at all
              // (MassSightingMin scaladoc): a regime-suspect pass's
              // sightings are recorded, never treated as evidence.
              val sameUnit = pending.get(key + PendingUnitSuffix)
                .forall(u => (u > 0.5) == hasCalib.isDefined)
              pending.get(key).filter(_ => sameUnit && !regimeSuspect) match {
                case Some(pendNorm) =>
                  // second independent confirming pass: stamp the more
                  // conservative (higher) of the two sub-margin samples
                  val stampNorm = math.max(pendNorm, curNorm)
                  hasCalib match {
                    case Some(_) =>
                      floors += key -> (stampNorm * runCalib)
                      calib += key -> runCalib
                    case None =>
                      // raw fallback: stamp raw seconds and do NOT invent a
                      // calib stamp — the pending sample may come from a
                      // different-speed host's pass, and pairing its raw
                      // seconds with THIS run's calib would permanently skew
                      // the key's normalized ratio; the key stays raw until
                      // a calibrated file seeds it fresh.
                      floors += key -> stampNorm
                  }
                  dropPending(key)
                case None =>
                  // First sighting, a unit-mismatched stale candidate, or
                  // a regime-suspect pass (which may record/refresh but
                  // never confirm). A same-unit candidate refreshed by a
                  // suspect pass keeps the MAX of the two samples, so a
                  // skew-regime reading can only make the eventual stamp
                  // more conservative, never lower it.
                  val refreshed = pending.get(key)
                    .filter(_ => sameUnit)
                    .fold(curNorm)(math.max(_, curNorm))
                  pending += key -> refreshed
                  pending += (key + PendingUnitSuffix) ->
                    (if (hasCalib.isDefined) 1.0 else 0.0)
              }
            } else dropPending(key) // candidate didn't reproduce: expire it
        }
      }
    }
    (floors, calib, pending)
  }

  /** Host-normalized run/floor ratio: both sides in calibration units.
    * `floorCalib` is the per-key entry from floor_calib.json, or the
    * file's `_calib_ref_estimate` for pre-calibration floors.
    */
  def normalizedRatio(runSec: Double, runCalib: Double,
      floorSec: Double, floorCalib: Double): Double =
    (runSec / runCalib) / (floorSec / floorCalib)
}
