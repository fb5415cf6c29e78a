#!/usr/bin/env python3
"""Retire the pre-calibration floor backfill: for every floor key (at the
given bench runs' sf tag) that still lacks a genuine per-key calib stamp,
RESTATE the floor from this session's best observed run — value := the
minimum across the given bench JSONs, calib := the calib of the run that
produced that minimum. The restated floor is the same quantity in
calibration units (the implied normalized delta per key is printed and
should sit near 1.0); what changes is that the key now carries a MEASURED
host stamp instead of riding the self-anchored `_calib_ref_estimate`
(whose blind spot: a uniform real regression on the estimate-era binary
would read as normalized 1.0).

Keys that already have a genuine stamp are left alone (the in-Bench
calibration-unit ratchet owns those). Run AFTER a multi-pass ratchet
session, on its saved target/bench.json copies:

    python3 dev/restate_floors.py /tmp/bench_pass1.json /tmp/bench_pass2.json ...

When, after restating, EVERY floor key carries a stamp, the
`_calib_ref_estimate` meta key is deleted — the fallback path goes dead.
"""
import sys, json, statistics

runs = [json.load(open(p)) for p in sys.argv[1:]]
if not runs:
    sys.exit("usage: restate_floors.py bench1.json [bench2.json ...]")
floors = json.load(open("bench/floors.json"))
calib = json.load(open("bench/floor_calib.json"))
ref = calib.get("_calib_ref_estimate")

# best (time, run_calib) per namespaced key across the given runs
best = {}
for b in runs:
    sftag = b["sf"].rstrip("/").split("/")[-1]
    rc = b["calib"]
    for q, t in b["queries"].items():
        if t < 0:
            continue
        k = f"{sftag}|{q}"
        if k not in best or t < best[k][0]:
            best[k] = (t, rc)

restated, skipped_stamped, missing = 0, 0, []
deltas = []
for k in sorted(floors):
    if k in calib:
        skipped_stamped += 1
        continue
    if k not in best:
        missing.append(k)
        continue
    t, rc = best[k]
    old = floors[k]
    if ref:
        delta = (t / rc) / (old / ref)
        deltas.append((delta, k, old, t, rc))
    floors[k] = t
    calib[k] = rc
    restated += 1

unstamped_left = [k for k in floors if k not in calib]
dropped_ref = False
if not unstamped_left and "_calib_ref_estimate" in calib:
    del calib["_calib_ref_estimate"]
    dropped_ref = True

with open("bench/floors.json", "w") as f:
    json.dump(dict(sorted(floors.items())), f, separators=(",", ":")); f.write("\n")
with open("bench/floor_calib.json", "w") as f:
    json.dump(dict(sorted(calib.items())), f, separators=(",", ":")); f.write("\n")

print(f"restated={restated} already_stamped={skipped_stamped} "
      f"no_sample={len(missing)} ref_dropped={dropped_ref}")
if missing:
    print("keys with no sample in the given runs (floor kept, STILL unstamped):")
    for k in missing:
        print(f"  {k}")
if deltas:
    ds = sorted(d[0] for d in deltas)
    print(f"implied normalized delta vs estimate-era floors: "
          f"median={statistics.median(ds):.3f} min={ds[0]:.3f} max={ds[-1]:.3f}")
    deltas.sort(reverse=True)
    print("largest 5 (new_norm/old_norm, key, old_s, new_s, new_calib):")
    for d, k, old, t, rc in deltas[:5]:
        print(f"  {d:5.2f}  {k:40s} {old:7.3f} -> {t:7.3f} @ {rc:.4f}")
