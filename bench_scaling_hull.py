#!/usr/bin/env python
"""Two-parallelism scaling evidence for the bucket-amortized
Arrow-kernel family (operators/hull.py) — the one r5 operator class
whose work happens INSIDE Python workers rather than in codegen, so
its scaling hinges on Spark fanning buckets across Python worker
processes. Same methodology as bench_scaling*.py: taskset-pinned
process tree, fresh JVM per level, untimed warmup, best-of-N,
same-run hardware-envelope probe.

Job: two-level convex hulls (n_partials=4) over DENSE groups
(rows/4000 groups of ~4000 points on a 200x200 lattice per group —
the tile/cluster-footprint regime the operator targets; the native
y-extremes prefilter collapses each group to <= 400 candidate points
before any Arrow transfer). A sparse many-tiny-groups variant
(rows/40 groups over a 100k lattice) was measured at 0.52 raw
efficiency — there the cost IS the 4M-row shuffle+Arrow transfer,
which is bandwidth-bound like every other 4M-row exchange (see the
join-envelope discussion); the dense form measures the operator, not
the bus.

Usage: python bench_scaling_hull.py [--rows 8000000] [--repeats 2]
       [--n 4] [--rounds 1]
Prints one JSON line; merge into BENCH/BASELINE.md by hand.
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import os

REPO = os.path.dirname(os.path.abspath(__file__))

CHILD = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from osm_poi_cloud_spark.config import get_spark
from osm_poi_cloud_spark.operators.hull import convex_hulls

cpus = {cpus}
rows_n = {rows_n}
repeats = {repeats}
spark = get_spark("scale-hull", master=f"local[{{cpus}}]",
                  shuffle_partitions=2 * cpus)

pts = (
    spark.range(rows_n).selectExpr(
        "CAST(pmod(xxhash64(id), " + str(rows_n // 4000) + ") AS LONG) AS g",
        "CAST(pmod(xxhash64(id, 1), 200) AS DOUBLE) AS x",
        "CAST(pmod(xxhash64(id, 2), 200) AS DOUBLE) AS y")
    .repartition(2 * cpus).persist())
pts.count()

def job():
    (convex_hulls(pts, "g", n_partials=4, n_buckets=4 * cpus)
     .write.format("noop").mode("overwrite").save())

job()  # warmup
best = None
for _ in range(repeats):
    t0 = time.time(); job(); dt = time.time() - t0
    best = dt if best is None or dt < best else best
print(json.dumps({{"cpus": cpus, "rows_n": rows_n,
                  "hull_sec": round(best, 3),
                  "pts_per_sec": round(rows_n / best, 1)}}), flush=True)
"""

PROBE = r"""
import json, multiprocessing as mp, sys, time
def burn(_):
    s = 0
    for i in range(12_000_000):
        s += i * i
    return s
if __name__ == "__main__":
    procs = int(sys.argv[1])
    with mp.Pool(procs) as pool:
        pool.map(burn, range(procs))
        t0 = time.time()
        pool.map(burn, range(procs * 4))
        dt = time.time() - t0
    print(json.dumps({"procs": procs, "work_per_sec": procs * 4 / dt}))
"""


def run_probe(cpus: int) -> float:
    cmd = ["taskset", "-c", f"0-{cpus - 1}", sys.executable, "-c", PROBE,
           str(cpus)]
    out = subprocess.run(cmd, capture_output=True, text=True, check=True)
    return json.loads(out.stdout.strip().splitlines()[-1])["work_per_sec"]


def run_level(cpus: int, rows_n: int, repeats: int) -> dict:
    code = CHILD.format(repo=REPO, cpus=cpus, rows_n=rows_n, repeats=repeats)
    cmd = ["taskset", "-c", f"0-{cpus - 1}", sys.executable, "-c", code]
    out = subprocess.run(cmd, capture_output=True, text=True, check=True)
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=8_000_000)
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--n", type=int, default=4)
    ap.add_argument("--rounds", type=int, default=1)
    args = ap.parse_args()

    lo = hi = None
    probe_lo = probe_hi = 0.0
    for _ in range(args.rounds):
        probe_lo = max(probe_lo, run_probe(args.n))
        l = run_level(args.n, args.rows, args.repeats)
        probe_hi = max(probe_hi, run_probe(4 * args.n))
        h = run_level(4 * args.n, args.rows, args.repeats)
        if lo is None:
            lo, hi = l, h
        else:
            lo["hull_sec"] = min(lo["hull_sec"], l["hull_sec"])
            hi["hull_sec"] = min(hi["hull_sec"], h["hull_sec"])

    envelope = round((probe_hi / probe_lo) / 4.0, 3)
    for side in (lo, hi):   # keep throughput consistent with merged best
        side["pts_per_sec"] = round(side["rows_n"] / side["hull_sec"], 1)
    speedup = lo["hull_sec"] / hi["hull_sec"]
    print(json.dumps({
        "rows_n": lo["rows_n"], "low": lo, "high": hi,
        "envelope": envelope,
        "hull": {"speedup": round(speedup, 3),
                 "eff_raw": round(speedup / 4.0, 3),
                 "eff_norm": round(speedup / 4.0 / envelope, 3)},
    }), flush=True)


if __name__ == "__main__":
    main()
