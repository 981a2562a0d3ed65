#!/usr/bin/env python
"""Two-parallelism scaling evidence for the round-5 operators
(supplement to bench_scaling{,_dedup,_spans}.py — identical
methodology: taskset-pinned process tree, fresh JVM per level, untimed
warmup, best-of-N passes, interleaved rounds, same-run hardware-envelope
probe).

Jobs (all throughput-class — one or two shuffles, no per-round fixed
cost):

* snap    — point-to-segment snap join (operators/snap.py): x9-ish bbox
            cell explode + cell hash join + clamped-projection refine +
            min-struct regroup.
* hotspot — Getis-Ord Gi* (operators/hotspot.py): x9 explode + groupBy
            + own-value join + broadcast moments.
* bm25    — inverted-index build + 4-term BM25 scoring
            (operators/retrieval.py): tokenize explode + count shuffle +
            broadcast query join + regroup.

Usage: python bench_scaling_r5ops.py [--rows 1500000] [--repeats 2]
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
from osm_poi_cloud_spark.operators.snap import snap_nearest
from osm_poi_cloud_spark.operators.hotspot import getis_ord_gi_star
from osm_poi_cloud_spark.operators.retrieval import bm25_topk

cpus = {cpus}
rows_n = {rows_n}
repeats = {repeats}
spark = get_spark("scale-r5", master=f"local[{{cpus}}]", shuffle_partitions=2 * cpus)

def noop(df):
    df.write.format("noop").mode("overwrite").save()

# --- snap inputs: hash-scattered segments + probe points, radius 2 ---
segs = (
    spark.range(rows_n // 4).selectExpr(
        "id AS seg_id",
        "CAST(pmod(xxhash64(id), 400000) AS DOUBLE) / 100.0 AS ax",
        "CAST(pmod(xxhash64(id, 1), 400000) AS DOUBLE) / 100.0 AS ay")
    .selectExpr("seg_id", "ax", "ay",
                "ax + (CAST(seg_id % 9 AS DOUBLE) - 4.0) * 1.5 AS bx",
                "ay + (CAST(seg_id % 11 AS DOUBLE) - 5.0) * 1.2 AS by")
    .repartition(2 * cpus).persist())
pts = (
    spark.range(rows_n).selectExpr(
        "id AS pid",
        "CAST(pmod(xxhash64(id, 2), 400000) AS DOUBLE) / 100.0 AS x",
        "CAST(pmod(xxhash64(id, 3), 400000) AS DOUBLE) / 100.0 AS y")
    .repartition(2 * cpus).persist())
segs.count(); pts.count()

def job_snap():
    noop(snap_nearest(pts, segs, radius=2.0))

# --- hotspot input: occupied z12 cells from the point cloud ---
cells = (
    pts.select((F.floor(F.col("x")).cast("long")).alias("x"),
               (F.floor(F.col("y")).cast("long")).alias("y"))
    .groupBy("x", "y").agg(F.count(F.lit(1)).alias("v"))
    .persist())
cells.count()

def job_hotspot():
    noop(getis_ord_gi_star(cells, zoom=12))

# --- bm25 input: zipf-ish synthetic docs, 40 tokens each ---
docs = (
    spark.range(rows_n // 4).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", F.transform(
            F.sequence(F.lit(1), F.lit(40)),
            lambda j: F.concat(F.lit("w"), F.pmod(
                F.xxhash64(F.col("id"), j),
                # zipf-ish: half the positions draw from a tiny head
                F.when(j % 2 == 0, F.lit(50)).otherwise(F.lit(20000))
            ).cast("string")))).alias("text"))
    .repartition(2 * cpus).persist())
docs.count()

def job_bm25():
    noop(bm25_topk(docs, ["w1", "w2", "w3", "w4"], k=1000))

out = {{"cpus": cpus, "rows_n": rows_n}}
for name, job in (("snap", job_snap), ("hotspot", job_hotspot),
                  ("bm25", job_bm25)):
    job()  # warmup
    best = None
    for _ in range(repeats):
        t0 = time.time(); job(); dt = time.time() - t0
        best = dt if best is None or dt < best else best
    out[name + "_sec"] = round(best, 3)
out["pts_per_sec_snap"] = round(rows_n / out["snap_sec"], 1)
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
    ap.add_argument("--rows", type=int, default=1_500_000)
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--n", type=int, default=4)
    ap.add_argument("--rounds", type=int, default=2)
    args = ap.parse_args()

    JOBS = ("snap_sec", "hotspot_sec", "bm25_sec")
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
