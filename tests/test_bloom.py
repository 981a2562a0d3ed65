"""Distributed Bloom filter: no-false-negative guarantee, bounded
false-positive rate, partitioning independence, an independent
pure-Python recompute of Spark's chained xxhash64 positions, and the
end-to-end incremental-ingest helper vs an exact anti-join."""

import sys

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from osm_poi_cloud_spark.operators import bloom as B

sys.path.insert(0, "tools")


def _keys(spark, n, prefix="u"):
    return spark.createDataFrame(
        pd.DataFrame({"url": [f"https://x.org/{prefix}/{i}" for i in range(n)]}))


def test_optimal_params():
    m, k = B.optimal_params(1000, 0.01)
    assert m % 64 == 0
    assert 9000 <= m <= 10100  # ~9.6 bits/key at 1% fpp
    assert k in (6, 7)
    with pytest.raises(ValueError):
        B.optimal_params(0, 0.01)
    with pytest.raises(ValueError):
        B.optimal_params(10, 1.5)


def test_no_false_negatives_and_bounded_fpp(spark):
    history = _keys(spark, 2000, "seen")
    m, k = B.optimal_params(2000, 0.01)
    bloom = B.bloom_build(history, "url", m, k).cache()
    assert bloom.count() <= m // 64

    # every ingested key MUST probe seen (Bloom guarantee, exact)
    seen = B.bloom_probe(history, bloom, "url", m, k).toPandas()
    assert seen["probably_seen"].all()

    # fresh keys: false-positive fraction near the designed fpp
    fresh = _keys(spark, 2000, "fresh")
    out = B.bloom_probe(fresh, bloom, "url", m, k).toPandas()
    fp = out["probably_seen"].mean()
    assert fp <= 0.05, f"false-positive rate {fp} far above designed 0.01"


def test_build_is_partitioning_independent(spark):
    history = _keys(spark, 500)
    m, k = 4096, 5
    a = (B.bloom_build(history.repartition(7), "url", m, k)
         .toPandas().sort_values("word_idx").reset_index(drop=True))
    b = (B.bloom_build(history.coalesce(1), "url", m, k)
         .toPandas().sort_values("word_idx").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)


def test_positions_match_independent_xxh64(spark):
    """Spark's chained xxhash64(lit(i), key) == from-spec XXH64 of the
    key's UTF-8 bytes seeded by XXH64 of the 4-byte LE int — the same
    independent implementation that pins the fingerprint goldens. This
    is what makes a cross-engine oracle for the bloom query possible."""
    from make_goldens import xxh64

    m, k = 4096, 3
    keys = [f"https://x.org/p/{i}" for i in range(50)]
    df = spark.createDataFrame(pd.DataFrame({"url": keys}))
    got = df.select(
        "url", *[B._positions(F.col("url"), m, k)[i].alias(f"p{i}") for i in range(k)]
    ).toPandas().set_index("url")

    def signed(u):  # u64 -> i64 two's complement
        return u - (1 << 64) if u >= (1 << 63) else u

    for key in keys:
        for i in range(3):
            seed = xxh64(int(i).to_bytes(4, "little"), 42)
            h = signed(xxh64(key.encode(), seed))
            expect = ((h % m) + m) % m  # Spark pmod semantics
            assert got.loc[key, f"p{i}"] == expect, (key, i)


def test_filter_new_keys_end_to_end(spark):
    history = _keys(spark, 1500, "old")
    # candidates: 300 already-seen + 700 genuinely new, with payload
    cand = spark.createDataFrame(pd.DataFrame({
        "url": [f"https://x.org/old/{i}" for i in range(300)]
        + [f"https://x.org/new/{i}" for i in range(700)],
        "payload": [f"doc{i}" for i in range(1000)],
    }))
    out = B.bloom_filter_new_keys(cand, history, "url", fpp=0.001).toPandas()
    exact_new = {f"https://x.org/new/{i}" for i in range(700)}
    got = set(out["url"])
    # no already-seen key survives (no false negatives)
    assert not (got - exact_new)
    # at most ~fpp of the truly-new keys were dropped as false "seen"
    dropped = len(exact_new - got)
    assert dropped <= 5, f"{dropped} new keys dropped (fpp target 0.001)"
    # payload columns survive the semi-join
    assert set(out.columns) == {"url", "payload"}


def test_probe_plan_broadcasts_word_table(spark):
    history = _keys(spark, 200)
    m, k = 2048, 4
    bloom = B.bloom_build(history, "url", m, k)
    plan = B.bloom_probe(_keys(spark, 10, "q"), bloom, "url", m, k) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
