#!/usr/bin/env python3
"""Min-merge recoverable per-query sf0.1 values from a driver BENCH_r*.json
tail into the floors file, for queries whose implementation is unchanged
since that round's binary (changed queries must keep floors that reflect
current code). Dev-only tool; idempotent. The comparison is in
CALIBRATION units (same rule as BenchFloors.merge since round 13):
(v/src_calib) < (old/old_calib) — so a tail recorded on a slower host can
still lower a floor it normalized-beats.

Since round 12 floors carry a host calibration (bench/floor_calib.json,
see BenchFloors.scala / BASELINE.md "Floor calibration"); since round 13
EVERY floor key must carry a measured stamp (_calib_ref_estimate is
retired). When this script lowers a floor it therefore stamps the source
bench's own "calib" field; a pre-calibration bench tail (no calib) can no
longer lower floors at all — those keys are skipped with a warning.

Usage: python3 dev/restore_floors.py BENCH_r07.json bench/floors.json \
          q_changed_a,q_changed_b,...
"""
import sys, json, re, os

bench_file, floors_file = sys.argv[1], sys.argv[2]
exclude = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else set()
# abspath first: a bare "floors.json" invocation from the repo root must
# still put the calib file NEXT TO the floors file, not in the cwd
floors_file = os.path.abspath(floors_file)
calib_file = os.path.join(os.path.dirname(floors_file), "floor_calib.json")

tail = json.load(open(bench_file))["tail"]
recovered = {k: float(v) for k, v in re.findall(r'"(q_[a-z0-9_]+)":([0-9.eE+-]+)', tail)}
m = re.search(r'"calib":([0-9.eE+-]+)', tail)
src_calib = float(m.group(1)) if m else None
floors = json.load(open(floors_file))
calib = json.load(open(calib_file)) if os.path.exists(calib_file) else {}

merged = lowered = skipped = 0
for q, v in recovered.items():
    if q in exclude:
        skipped += 1
        continue
    if v < 0:  # failed-query sentinel (-1.0): must never become a floor
        continue
    key = "sf0.1|" + q
    old = floors.get(key)
    old_calib = calib.get(key)
    beats = old is None or (
        (v / src_calib) < (old / old_calib) if src_calib and old_calib
        else v < old)  # raw fallback only if a side lacks calibration
    if beats:
        if src_calib is None:
            print(f"WARN: {key} would lower but source bench has no calib; skipped "
                  "(un-stamped floors are not allowed since round 13)")
            continue
        floors[key] = v
        calib[key] = src_calib
        lowered += 1
    merged += 1

if lowered:  # nothing lowered -> touch neither file (idempotent no-op)
    with open(floors_file, "w") as f:
        json.dump(dict(sorted(floors.items())), f, separators=(",", ":"))
        f.write("\n")
    with open(calib_file, "w") as f:
        json.dump(dict(sorted(calib.items())), f, separators=(",", ":"))
        f.write("\n")
print(f"recovered={len(recovered)} merged={merged} lowered={lowered} "
      f"skipped_changed={skipped} src_calib={src_calib}")
