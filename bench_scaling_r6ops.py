#!/usr/bin/env python
"""Two-parallelism scaling evidence for the round-6 operators
(supplement to bench_scaling{,_dedup,_spans,_r5ops,_hull,_e2e}.py —
identical methodology: taskset-pinned process tree, fresh JVM per
level, untimed warmup, best-of-N passes, interleaved rounds, same-run
hardware-envelope probe).

Jobs:

* incr_tiles  — incremental tile maintenance (operators/tiling.py):
                keyed full-outer snapshot diff -> ±1 delta rows ->
                bit-shift pyramid fan-out (z2-12) -> delta groupBy ->
                full-outer merge into a persisted base tile table
                (base build untimed — production holds it stored).
                ~20% churn planted (10% deleted, 10% moved, +10%
                inserted).
* containment — asymmetric quote-inclusion pairs (operators/dedup.py
                containment_pairs): window explode -> distinct -> fp
                self-join -> ppm DIV. Every 4th doc is a 12-token
                quote of its neighbor (containment exactly 1.0).
* phrase      — exact-phrase tagging scan (operators/retrieval.py
                phrase_occurrences): map-only tokenize + slide —
                the no-shuffle end of the spectrum.

Usage: python bench_scaling_r6ops.py [--rows 6000000] [--repeats 2]
       [--n 4] [--rounds 2]
Prints one JSON line; merge into BENCH/BASELINE.md by hand.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.abspath(__file__))

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from osm_poi_cloud_spark.config import get_spark
from osm_poi_cloud_spark.operators import tiling as tl
from osm_poi_cloud_spark.operators.dedup import containment_pairs
from osm_poi_cloud_spark.operators.retrieval import phrase_occurrences

cpus = {cpus}
rows_n = {rows_n}
repeats = {repeats}
spark = get_spark("scale-r6", master=f"local[{{cpus}}]", shuffle_partitions=2 * cpus)

def noop(df):
    df.write.format("noop").mode("overwrite").save()

# --- incremental tiles: rows_n points, ~20% churn ---------------------
old = (
    spark.range(rows_n).selectExpr(
        "id AS poi_id",
        "CAST((id * 7919) % 36000000 AS DOUBLE) / 100000.0 - 180.0 AS lon",
        "CAST((id * 104729) % 17000000 AS DOUBLE) / 100000.0 - 85.0 AS lat")
    .repartition(2 * cpus).persist())
h = F.pmod(F.xxhash64("poi_id"), F.lit(10))
new = (
    old.filter(h != 0)
    .withColumn("lon", F.when(
        h == 1, ((F.col("lon") + 200.0) % 360.0) - 180.0).otherwise(F.col("lon")))
    .unionByName(
        old.filter(h == 2).select(
            (F.col("poi_id") + rows_n).alias("poi_id"),
            (((F.col("lon") + 90.0) % 360.0) - 180.0).alias("lon"), "lat"))
    .repartition(2 * cpus).persist())
old.count(); new.count()
base = (tl.assign_tile_pyramid(old, 2, 12)
        .groupBy("z", "x", "y").agg(F.count(F.lit(1)).alias("n"))
        .persist())
base.count()  # untimed: the stored tile table

def job_incr_tiles():
    noop(tl.incremental_tile_counts(base, old, new, min_zoom=2, max_zoom=12))

# --- containment: every 4th doc is a 12-token quote of its neighbor ---
docs_n = rows_n // 8
docs = (
    spark.range(docs_n).selectExpr(
        "id AS doc_id",
        "id - CASE WHEN id % 4 = 0 AND id > 0 THEN 1 ELSE 0 END AS src",
        "CASE WHEN id % 4 = 0 AND id > 0 THEN 12 ELSE 30 END AS n_tok")
    .select("doc_id", F.concat_ws(" ", F.transform(
        F.sequence(F.lit(1), F.col("n_tok")),
        lambda j: F.concat(F.lit("w"), F.pmod(
            F.xxhash64(F.col("src"), j), F.lit(20000)).cast("string"))
    )).alias("text"))
    .repartition(2 * cpus).persist())
docs.count()

def job_containment():
    noop(containment_pairs(docs, k=8, min_containment_ppm=600_000))

def job_phrase():
    noop(phrase_occurrences(docs, "w1 w2 w3"))

out = {{"cpus": cpus, "rows_n": rows_n, "docs_n": docs_n}}
for name, job in (("incr_tiles", job_incr_tiles),
                  ("containment", job_containment),
                  ("phrase", job_phrase)):
    job()  # warmup
    best = None
    for _ in range(repeats):
        t0 = time.time(); job(); dt = time.time() - t0
        best = dt if best is None or dt < best else best
    out[name + "_sec"] = round(best, 3)
out["pts_per_sec_incr"] = round(rows_n / out["incr_tiles_sec"], 1)
print(json.dumps(out), flush=True)
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
    cmd = ["taskset", "-c", f"0-{cpus - 1}", sys.executable, "-c", PROBE, str(cpus)]
    out = subprocess.run(cmd, capture_output=True, text=True, check=True)
    return json.loads(out.stdout.strip().splitlines()[-1])["work_per_sec"]


def run_level(cpus: int, rows_n: int, repeats: int) -> dict:
    code = CHILD.format(repo=REPO, cpus=cpus, rows_n=rows_n, repeats=repeats)
    cmd = ["taskset", "-c", f"0-{cpus - 1}", sys.executable, "-c", code]
    out = subprocess.run(cmd, capture_output=True, text=True, check=True)
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=6_000_000)
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--n", type=int, default=4)
    ap.add_argument("--rounds", type=int, default=2)
    args = ap.parse_args()

    JOBS = ("incr_tiles_sec", "containment_sec", "phrase_sec")
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
            for k in JOBS:
                lo[k] = min(lo[k], l[k])
                hi[k] = min(hi[k], h[k])

    envelope = round((probe_hi / probe_lo) / 4.0, 3)

    def eff(metric: str):
        speedup = lo[metric] / hi[metric]
        return round(speedup, 3), round(speedup / 4.0, 3), round(speedup / 4.0 / envelope, 3)

    result = {"rows_n": lo["rows_n"], "low": lo, "high": hi,
              "envelope": envelope}
    for m in JOBS:
        sp, raw_eff, norm_eff = eff(m)
        result[m.replace("_sec", "")] = {
            "speedup": sp, "eff_raw": raw_eff, "eff_norm": norm_eff}
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
