#!/usr/bin/env python
"""Two-parallelism scaling evidence for the round-4 operators
(supplement to bench_scaling.py / bench_scaling_dedup.py — identical
methodology: taskset-pinned process tree, fresh JVM per level, untimed
warmup, best-of-N passes, interleaved rounds, same-run probe).

Jobs:
* span      — repeated-span dedup profile (k=8): the per-token window
              explode + fingerprint shuffle + per-doc regroup. The
              throughput-scaling member (linear work per token).
* pagerank  — 3 checkpointed power-iteration rounds over a 3-out-degree
              hash graph on the doc ids. The round-latency member: per-
              round fixed cost does NOT shrink with cores (same class
              as connected components — report it as such).

Input: the planted-near-dup corpus from bench_scaling_dedup.py (shared
60-word bases make real duplicated spans).

Usage: python bench_scaling_spans.py [--docs 80000] [--repeats 2]
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
from osm_poi_cloud_spark.operators import dedup as dd
from osm_poi_cloud_spark.operators.graph import pagerank

cpus = {cpus}
docs_n = {docs_n}
repeats = {repeats}
spark = get_spark("scale-spans", master=f"local[{{cpus}}]", shuffle_partitions=2 * cpus)

path = f"/tmp/osm_poi_scale_docs_{{docs_n}}"
if not os.path.exists(os.path.join(path, "_SUCCESS")):
    (
        spark.range(docs_n)
        .select(
            F.col("id").alias("doc_id"),
            F.concat_ws(
                " ",
                F.transform(
                    F.sequence(F.lit(1), F.lit(60)),
                    lambda j: F.substring(
                        F.md5(F.concat_ws("-", (F.col("id") / 3).cast("long").cast("string"),
                                          (j / 7).cast("long").cast("string"))), 1, 8),
                ),
            ).alias("base"),
        )
        .select("doc_id",
                F.concat_ws(" ", "base",
                            F.concat(F.lit("variant"), (F.col("doc_id") % 3).cast("string"))).alias("text"))
        .repartition(64)
        .write.mode("overwrite").parquet(path)
    )
docs = spark.read.parquet(path).repartition(2 * cpus).cache()
n = docs.count()

edges = (
    docs.select("doc_id", F.explode(F.sequence(F.lit(1), F.lit(3))).alias("j"))
    .select(F.col("doc_id").alias("src"),
            F.pmod(F.xxhash64("doc_id", "j"), F.lit(n)).alias("dst"))
    .filter("src != dst")
)

def noop(df):
    df.write.format("noop").mode("overwrite").save()

def job_span():
    noop(dd.span_dedup_stats(docs, k=8))

def job_pagerank():
    noop(pagerank(edges, iters=3))

# polygon x polygon: squares vs diamonds around hash-scattered centers
# derived from a doc-id slice (10% of the corpus per side) — the grid
# blocking + vectorized refine path
from osm_poi_cloud_spark.operators.spatial_join import polygon_intersection_join
_ids = docs.select("doc_id").filter(F.col("doc_id") % 10 == 0)
_pts = _ids.select(
    "doc_id",
    (F.pmod(F.xxhash64("doc_id"), F.lit(34000)).cast("double") / 100.0 - 170.0).alias("lon"),
    (F.pmod(F.xxhash64("doc_id", F.lit(1)), F.lit(16000)).cast("double") / 100.0 - 80.0).alias("lat"),
)
_sq = _pts.selectExpr(
    "doc_id AS polygon_id",
    "2.0 + CAST(doc_id % 5 AS DOUBLE) AS w", "lon", "lat").selectExpr(
    "polygon_id",
    "array(array(array(lon - w, lat - w), array(lon + w, lat - w), "
    "array(lon + w, lat + w), array(lon - w, lat + w), "
    "array(lon - w, lat - w))) AS rings")
_di = _pts.selectExpr(
    "doc_id + 1000000000 AS polygon_id",
    "2.5 + CAST(doc_id % 7 AS DOUBLE) * 0.8 AS r", "lon", "lat").selectExpr(
    "polygon_id",
    "array(array(array(lon + r, lat), array(lon, lat + r), "
    "array(lon - r, lat), array(lon, lat - r), array(lon + r, lat))) AS rings")
_sq = _sq.persist(); _di = _di.persist()
_sq.count(); _di.count()

def job_polyx():
    noop(polygon_intersection_join(_sq, _di, cover_zoom=6))

out = {{"cpus": cpus, "docs_n": n}}
for name, job in (("span", job_span), ("pagerank", job_pagerank),
                  ("polyx", job_polyx)):
    job()  # warmup
    best = None
    for _ in range(repeats):
        t0 = time.time(); job(); dt = time.time() - t0
        best = dt if best is None or dt < best else best
    out[name + "_sec"] = round(best, 3)
out["docs_per_sec_span"] = round(n / out["span_sec"], 1)
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


def run_level(cpus: int, docs_n: int, repeats: int) -> dict:
    code = CHILD.format(repo=REPO, cpus=cpus, docs_n=docs_n, repeats=repeats)
    cmd = ["taskset", "-c", f"0-{cpus - 1}", sys.executable, "-c", code]
    out = subprocess.run(cmd, capture_output=True, text=True, check=True)
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=80_000)
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--n", type=int, default=4)
    ap.add_argument("--rounds", type=int, default=2)
    args = ap.parse_args()

    JOBS = ("span_sec", "pagerank_sec", "polyx_sec")
    lo = hi = None
    probe_lo = probe_hi = 0.0
    for _ in range(args.rounds):
        probe_lo = max(probe_lo, run_probe(args.n))
        l = run_level(args.n, args.docs, args.repeats)
        probe_hi = max(probe_hi, run_probe(4 * args.n))
        h = run_level(4 * args.n, args.docs, args.repeats)
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

    result = {"docs_n": lo["docs_n"], "low": lo, "high": hi, "envelope": envelope}
    for j in ("span", "pagerank", "polyx"):
        s, e, n_ = eff(j + "_sec")
        result[j] = {"speedup": s, "efficiency": e, "normalized": n_}
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
