#!/usr/bin/env python
"""Pinned isolation re-measure of the r5 drift cluster (r5 verdict
"What's wrong" #3): knn / pip_distributed / robots_filter / radius_join
moved +17-27% r4->r5 with ZERO code diff on their paths. Two candidate
explanations: (a) contended host window during the r5 bench run (the
repo's documented noise signature — all four drifted together), or
(b) suite-context effects (r5 runs 57 entries vs r4's 33; more JVM/GC
pressure and cache eviction before the late entries run).

This script times ONLY the four entries, in a fresh JVM, same corpora
and same local[N] width as bench.py, untimed warmup, best-of-N repeats
— i.e. the r4 pipeline_extract exoneration pattern. Reading the
result: isolated times at-or-below the r4 values => the r5 drift was
environment (noise or suite context), not an operator regression;
isolated times matching the r5 values => real, bisect.

Usage: python tools/bench_pinned_drift.py [--repeats 3]
Prints one JSON line; record the verdict in BENCH/BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, time
import numpy as np
from pyspark.sql import functions as F
from osm_poi_cloud_spark.config import get_spark
from osm_poi_cloud_spark.operators import knn as knn_op
from osm_poi_cloud_spark.operators import spatial_join as sj
from osm_poi_cloud_spark.operators.knn import radius_join
from osm_poi_cloud_spark.functions.robots import filter_allowed_urls

cpus = {cpus}
repeats = {repeats}
spark = get_spark("drift-ab", master=f"local[{{cpus}}]",
                  shuffle_partitions={partitions})

pois = spark.read.parquet("/tmp/osm_poi_bench_pois_40000").cache()
n_pois = pois.count()
docs = spark.read.parquet("/tmp/osm_poi_bench_fatdocs_0.1_5") \
    .select("doc_id", "n_chars", "text").cache()
docs.count()

def force(df):
    df.write.format("noop").mode("overwrite").save()

# ---- the four entries, inputs identical to bench.py ----
q_frac = max(n_pois // 2000, 1)
queries = (pois.filter(F.pmod(F.xxhash64("poi_id"), F.lit(q_frac)) == 0)
           .select(F.col("poi_id").alias("query_id"), "lon", "lat"))

rng = np.random.RandomState(42)
polys = []
for i in range(20):
    cx, cy = rng.uniform(-150, 150), rng.uniform(-60, 60)
    ang = np.sort(rng.uniform(0, 2 * np.pi, 7))
    r = rng.uniform(2, 8, 7)
    ring = np.stack([cx + r * np.cos(ang), cy + r * np.sin(ang)], axis=1)
    polys.append(sj.Polygon(f"poly{{i}}", ring))
polys_tbl = sj.polygons_df(spark, polys)

rb_rules = spark.createDataFrame(
    [(f"h{{i}}.example", "/p/", i % 3 == 0, 3) for i in range(16)],
    "host string, prefix string, allow boolean, rule_len int")
rb_urls = docs.selectExpr(
    "doc_id",
    "concat('https://h', CAST(doc_id % 16 AS STRING), '.example/p/', "
    "CAST(doc_id AS STRING)) AS url")

rq = pois.select(F.col("poi_id").alias("query_id"), "lon", "lat")

ENTRIES = {{
    "knn": lambda: force(knn_op.knn_join(queries, pois, k=10, zoom=8)),
    "pip_distributed": lambda: force(
        sj.point_in_polygon_join_distributed(spark, pois, polys_tbl,
                                             cover_zoom=6)),
    "robots_filter": lambda: force(
        filter_allowed_urls(rb_urls, rb_rules, keep_decision=True)),
    "radius_join": lambda: force(radius_join(rq, pois, 0.25)),
}}

out = {{"cpus": cpus}}
for name, fn in ENTRIES.items():
    fn()  # untimed warmup per entry
    best = None
    for _ in range(repeats):
        t0 = time.time(); fn(); dt = time.time() - t0
        best = dt if best is None or dt < best else best
    out[name] = round(best, 3)
print(json.dumps(out), flush=True)
"""


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    # bench.py's width: max(4 * CPUS, 32) unless overridden
    partitions = int(os.environ.get("SPARK_GRAFT_PARTITIONS",
                                    str(max(4 * args.cpus, 32))))
    code = CHILD.format(cpus=args.cpus, repeats=args.repeats,
                        partitions=partitions)
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    cmd = ["taskset", "-c", f"0-{args.cpus - 1}", sys.executable, "-c", code]
    res = subprocess.run(cmd, capture_output=True, text=True, env=env,
                         cwd=REPO, check=True)
    got = json.loads(res.stdout.strip().splitlines()[-1])

    ref = {}
    for rnd in ("r04", "r05"):
        with open(os.path.join(REPO, f"BENCH_{rnd}.json")) as f:
            blob = json.load(f)
        # driver files nest the bench line under "parsed"
        blob = blob.get("parsed", blob)
        if isinstance(blob, str):
            blob = json.loads(blob)
        ref[rnd] = blob["queries"]
    report = {"isolated": got}
    for k in ("knn", "pip_distributed", "robots_filter", "radius_join"):
        report[k] = {"r4": ref["r04"].get(k), "r5": ref["r05"].get(k),
                     "isolated": got[k]}
    print(json.dumps(report), flush=True)


if __name__ == "__main__":
    main()
