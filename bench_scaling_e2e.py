#!/usr/bin/env python
"""Two-parallelism scaling evidence for the FULL COMPOSED pipeline
(r5 verdict #1): every earlier pair measures one operator family; this
one measures the end-to-end training-data product —

    raw docs -> host-boilerplate removal -> curation cascade
    (lang ID + quality + Gopher repetition + PII scrub + ExactSubstr
    span removal + exact dedup) -> MinHash-LSH near-dup removal
    (banded candidates -> star CC -> representative anti-join) ->
    BPE encode -> vocabulary ids -> packing -> training shards

using the pinned methodology (taskset-pinned process tree, fresh JVM
per level, untimed warmup, best-of-N passes, interleaved A/B rounds,
same-run hardware-envelope probe). Cross-operator bottlenecks — extra
Python stage boundaries, cache/lineage stalls, width mismatches
between stages — only show up in the composition, which is what this
pair exists to catch.

Stage-cumulative decomposition: the child times PREFIXES of the
composition (boilerplate; +curate; +near-dup; +shards), so adjacent
differences attribute wall time per stage like the join profile in
BENCH/BASELINE.md. Persists sit at the two production materialization
boundaries (curated, deduped) and are INSIDE the timed region — the
real pipeline pays them too. BPE merge training (a bounded driver
loop, trained once per corpus in production) runs untimed on a 2k-doc
sample and is injected via ``merges=``.

Input: deterministic synthetic corpus (native generation, cached in
/tmp by size) with the structures every stage needs to find: per-host
template header lines (500 hosts), 3-variant near-dup clusters
(~95% shingle overlap), a shared 12-word slogan on every 4th doc
(span_removal's target), English-like stopword-interleaved bodies
that pass the lang/quality gates.

Usage: python bench_scaling_e2e.py [--docs 48000] [--repeats 2]
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
from osm_poi_cloud_spark.plans.curation import curate_documents, curate_to_training_shards
from osm_poi_cloud_spark.functions.bpe import train_bpe_from_corpus

cpus = {cpus}
docs_n = {docs_n}
repeats = {repeats}
spark = get_spark("scale-e2e", master=f"local[{{cpus}}]", shuffle_partitions=2 * cpus)

# ---- corpus: cached by size, all-native generation -------------------
# pseudo-word pool: 512 letter-only 3-syllable words (large enough that
# dup_word_frac stays ~0.1); every 5th token an English stopword so
# lang_id says 'en' and the stopword quality component maxes out.
SYL = ["ba","ce","di","fo","gu","ka","le","mi","no","pu","ra","se","ti","vo","wu","ze"]
POOL = [SYL[(i // 256) % 16] + SYL[(i // 16) % 16] + SYL[i % 16] for i in range(512)]
STOPS = ["the","and","of","to","in","is","that","for","with","are"]
SLOGAN = "subscribe to our newsletter today for all the latest updates and offers"

path = f"/tmp/osm_poi_scale_e2e_{{docs_n}}"
if not os.path.exists(os.path.join(path, "_SUCCESS")):
    pool_lit = F.array(*[F.lit(w) for w in POOL])
    stop_lit = F.array(*[F.lit(w) for w in STOPS])
    body = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(1), F.lit(90)),
            # cluster = id//3: 3 near-dup variants share the body
            lambda j: F.when(
                j % 5 == 0,
                F.element_at(stop_lit, F.pmod(F.xxhash64((F.col("id") / 3).cast("long"), j), 10).cast("int") + 1),
            ).otherwise(
                F.element_at(pool_lit, F.pmod(F.xxhash64((F.col("id") / 3).cast("long"), j, F.lit(7)), 512).cast("int") + 1)
            ),
        ),
    )
    (
        spark.range(docs_n)
        .select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("h"), F.pmod(F.col("id"), 500).cast("string")).alias("host"),
            F.concat(
                # host template header line (boilerplate target)
                F.lit("follow h"), F.pmod(F.col("id"), 500).cast("string"),
                F.lit(" on social media for updates\n"),
                body,
                # shared slogan on every 4th doc (span_removal target)
                F.when(F.col("id") % 4 == 0, F.lit(" " + SLOGAN)).otherwise(F.lit("")),
                # variant word keeps near-dups from exact-collapsing
                F.lit(" variant"), (F.col("id") % 3).cast("string"),
            ).alias("text"),
        )
        .repartition(64)
        .write.mode("overwrite").parquet(path)
    )
docs = spark.read.parquet(path).repartition(2 * cpus).cache()
docs.count()

def noop(df):
    df.write.format("noop").mode("overwrite").save()

# BPE merges: trained once per corpus in production; untimed here
sample = curate_documents(docs.select("doc_id", "text").filter(F.col("doc_id") < 2000))
MERGES = train_bpe_from_corpus(sample, 60, text_col="text_clean")

def run(upto):
    bp = dd.remove_boilerplate_lines(docs, host_col="host").select("doc_id", "text")
    if upto == 1:
        noop(bp); return
    # span_min_docs=4: the 3-variant near-dup clusters share their
    # whole body; at the default min_docs=2 span removal would eat
    # it and starve the near-dup/shard stages. 4 leaves cluster
    # bodies to MinHash and cuts only the corpus-wide slogan.
    cur = curate_documents(bp, span_k=8, span_min_docs=4)
    if upto == 2:
        noop(cur); return
    cur = cur.persist(); cur.count()
    try:
        nd = dd.minhash_lsh_dedup(cur, text_col="text_clean")
        if upto == 3:
            noop(nd); return
        nd = nd.persist(); nd.count()
        try:
            shards, _vocab = curate_to_training_shards(
                docs, curated=nd, merges=MERGES, n_buckets=2 * cpus)
            noop(shards)
        finally:
            nd.unpersist()
    finally:
        cur.unpersist()

STAGES = {{1: "bp", 2: "curate", 3: "neardup", 4: "shards"}}
out = {{"cpus": cpus, "docs_n": docs_n}}
run(4)  # warmup end-to-end (covers every stage's codepaths)
for upto, name in STAGES.items():
    best = None
    for _ in range(repeats):
        t0 = time.time(); run(upto); dt = time.time() - t0
        best = dt if best is None or dt < best else best
    out[f"cum_{{name}}_sec"] = round(best, 3)
out["e2e_sec"] = out["cum_shards_sec"]
out["docs_per_sec"] = round(docs_n / out["e2e_sec"], 1)
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


KEYS = ("cum_bp_sec", "cum_curate_sec", "cum_neardup_sec", "cum_shards_sec")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=48_000)
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--n", type=int, default=4)
    ap.add_argument("--rounds", type=int, default=2)
    args = ap.parse_args()

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
            for k in KEYS:
                lo[k] = min(lo[k], l[k])
                hi[k] = min(hi[k], h[k])

    envelope = round((probe_hi / probe_lo) / 4.0, 3)
    speedup = lo["cum_shards_sec"] / hi["cum_shards_sec"]
    result = {
        "docs_n": lo["docs_n"], "low": lo, "high": hi, "envelope": envelope,
        "e2e": {"speedup": round(speedup, 3),
                "eff_raw": round(speedup / 4.0, 3),
                "eff_norm": round(speedup / 4.0 / envelope, 3)},
        # per-stage attribution at each level (adjacent cum differences)
        "stage_sec_low": {
            "bp": lo["cum_bp_sec"],
            "curate": round(lo["cum_curate_sec"] - lo["cum_bp_sec"], 3),
            "neardup": round(lo["cum_neardup_sec"] - lo["cum_curate_sec"], 3),
            "shards": round(lo["cum_shards_sec"] - lo["cum_neardup_sec"], 3),
        },
        "stage_sec_high": {
            "bp": hi["cum_bp_sec"],
            "curate": round(hi["cum_curate_sec"] - hi["cum_bp_sec"], 3),
            "neardup": round(hi["cum_neardup_sec"] - hi["cum_curate_sec"], 3),
            "shards": round(hi["cum_shards_sec"] - hi["cum_neardup_sec"], 3),
        },
    }
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
