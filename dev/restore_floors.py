#!/usr/bin/env python3
"""Min-merge recoverable per-query sf0.1 values from a driver BENCH_r*.json
tail into the floors file, for queries whose implementation is unchanged
since that round's binary (changed queries must keep floors that reflect
current code). Dev-only tool; idempotent (min-merge can only lower floors).

Usage: python3 dev/restore_floors.py BENCH_r07.json bench/floors.json \
          q_changed_a,q_changed_b,...
"""
import sys, json, re

bench_file, floors_file = sys.argv[1], sys.argv[2]
exclude = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else set()

tail = json.load(open(bench_file))["tail"]
recovered = {k: float(v) for k, v in re.findall(r'"(q_[a-z0-9_]+)":([0-9.eE+-]+)', tail)}
floors = json.load(open(floors_file))

merged = lowered = skipped = 0
for q, v in recovered.items():
    if q in exclude:
        skipped += 1
        continue
    key = "sf0.1|" + q
    old = floors.get(key)
    if old is None or v < old:
        floors[key] = v
        lowered += 1
    merged += 1

with open(floors_file, "w") as f:
    json.dump(dict(sorted(floors.items())), f, separators=(",", ":"))
    f.write("\n")
print(f"recovered={len(recovered)} merged={merged} lowered={lowered} skipped_changed={skipped}")
