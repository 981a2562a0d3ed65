"""Deterministic sampling: partitioning independence, rate accuracy,
exact-count guarantee, and an independent from-spec XXH64 recompute of
the keep decision (same chain convention test_bloom pins)."""

import sys

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from osm_poi_cloud_spark.operators import sampling as S

sys.path.insert(0, "tools")

SF = "/root/testdata/sf0.01"


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_stratified_rates_and_determinism(spark):
    docs = _docs(spark)
    rates = {"en": 0.5, "fr": 1.0, "de": 0.25, "zh": 0.0}
    out = S.stratified_sample(docs, "lang", rates, "doc_id", default_rate=0.1)
    got = out.toPandas()
    by_lang = got.groupby("lang").size()
    totals = docs.toPandas().groupby("lang").size()
    assert by_lang.get("fr", 0) == totals["fr"]       # rate 1.0: all rows
    assert "zh" not in by_lang.index                  # rate 0.0: none
    frac_en = by_lang.get("en", 0) / totals["en"]
    assert 0.3 < frac_en < 0.7                        # ~0.5 on 218 rows
    frac_es = by_lang.get("es", 0) / totals["es"]     # default 0.1
    assert frac_es < 0.3

    # identical rows regardless of partitioning (content-keyed hash)
    a = (S.stratified_sample(docs.repartition(13), "lang", rates, "doc_id", 0.1)
         .select("doc_id").toPandas()["doc_id"].sort_values().tolist())
    assert a == sorted(got["doc_id"])
    # and a different seed gives a different (but still valid) subset
    b = S.stratified_sample(docs, "lang", rates, "doc_id", 0.1, seed=7) \
        .select("doc_id").toPandas()["doc_id"].sort_values().tolist()
    assert b != a


def test_keep_decision_matches_independent_xxh64(spark):
    """pmod(xxhash64(lit(seed) int, doc_id long), SCALE) recomputed
    with the from-spec XXH64: ints hash as 4-byte LE, longs as 8-byte
    LE, each chaining the previous hash as seed."""
    from make_goldens import xxh64

    docs = _docs(spark).limit(100)
    got = docs.select("doc_id", S._keep_hash("doc_id", 3).alias("h")).toPandas()

    def signed(u):
        return u - (1 << 64) if u >= (1 << 63) else u

    for _, r in got.iterrows():
        seed = xxh64(int(3).to_bytes(4, "little"), 42)
        h = signed(xxh64(int(r["doc_id"]).to_bytes(8, "little", signed=True), seed))
        assert ((h % S.SCALE) + S.SCALE) % S.SCALE == r["h"], r["doc_id"]


def test_exact_count_per_stratum(spark):
    docs = _docs(spark)
    out = S.exact_count_per_stratum(docs, "lang", 20, "doc_id").toPandas()
    sizes = out.groupby("lang").size()
    totals = docs.toPandas().groupby("lang").size()
    for lang, total in totals.items():
        assert sizes[lang] == min(20, total), lang
    # schema untouched (helper column dropped)
    assert "_rk" not in out.columns
    # partitioning independence
    again = (S.exact_count_per_stratum(docs.repartition(9), "lang", 20, "doc_id")
             .toPandas())
    assert sorted(again["doc_id"]) == sorted(out["doc_id"])


def test_validation(spark):
    docs = _docs(spark)
    with pytest.raises(ValueError):
        S.stratified_sample(docs, "lang", {"en": 1.5}, "doc_id")
    with pytest.raises(ValueError):
        S.exact_count_per_stratum(docs, "lang", 0, "doc_id")


def test_snapshot_diff_hand_cases(spark):
    from osm_poi_cloud_spark.operators.sampling import snapshot_diff

    old = spark.createDataFrame(pd.DataFrame({
        "url": ["a", "b", "c"], "fp": ["1", "2", "3"]}))
    new = spark.createDataFrame(pd.DataFrame({
        "url": ["b", "c", "d"], "fp": ["2", "9", "4"]}))
    out = (snapshot_diff(old, new, "url", "fp").toPandas()
           .set_index("url")["change"].to_dict())
    assert out == {"a": "removed", "b": "unchanged", "c": "changed", "d": "added"}


def test_snapshot_upsert_hand_computed(spark):
    import pandas as pd
    from osm_poi_cloud_spark.operators.sampling import snapshot_upsert

    base = spark.createDataFrame(pd.DataFrame({
        "k": [1, 2, 3], "v": ["a", "b", "c"], "n": [10, 20, 30]}))
    snap = spark.createDataFrame(pd.DataFrame({
        "k": [2, 3, 4], "v": ["B", "c", "d"], "n": [21, 30, 40]}))
    # delete semantics: base-only key 1 drops; 2 updates; 4 inserts
    got = snapshot_upsert(base, snap, "k").toPandas() \
        .sort_values("k").reset_index(drop=True)
    assert list(got["k"]) == [2, 3, 4]
    assert list(got["v"]) == ["B", "c", "d"]
    assert list(got["n"]) == [21, 30, 40]
    # append-only: key 1 survives with its base payload
    kept = snapshot_upsert(base, snap, "k", keep_deletes=True).toPandas() \
        .sort_values("k").reset_index(drop=True)
    assert list(kept["k"]) == [1, 2, 3, 4]
    assert list(kept["v"]) == ["a", "B", "c", "d"]
    # payload validation
    import pytest
    with pytest.raises(ValueError):
        snapshot_upsert(base.drop("n"), snap, "k")


# --- snapshot_history (SCD-2 gaps-and-islands) ---

def test_snapshot_history_hand_case(spark):
    rows = [(1, 1, "A"), (1, 2, "A"), (1, 3, "B"), (1, 5, "B"),
            (1, 8, "A"), (2, 4, "X")]
    df = spark.createDataFrame(rows, "e long, v long, s string")
    got = sorted(
        (r["e"], r["s"], r["valid_from"], r["valid_to"],
         r["n_snapshots"], r["is_current"])
        for r in S.snapshot_history(df, "e", "v", ["s"]).collect())
    assert got == [
        (1, "A", 1, 3, 2, False),
        (1, "A", 8, None, 1, True),
        (1, "B", 3, 8, 2, False),
        (2, "X", 4, None, 1, True),
    ]


def test_snapshot_history_null_safe_and_multi_attr(spark):
    # NULL -> NULL is "unchanged"; a change in EITHER attr closes a run
    rows = [(1, 1, None, 10), (1, 2, None, 10), (1, 3, None, 11),
            (1, 4, "x", 11)]
    df = spark.createDataFrame(rows, "e long, v long, a string, b long")
    got = sorted(((r["a"], r["b"], r["valid_from"], r["valid_to"])
                  for r in S.snapshot_history(
                      df, "e", "v", ["a", "b"]).collect()),
                 key=lambda t: t[2])
    assert got == [(None, 10, 1, 3), (None, 11, 3, 4), ("x", 11, 4, None)]


def test_snapshot_history_point_lookup_invariant(spark):
    # every original observation falls inside EXACTLY ONE interval of
    # its entity, with matching attrs; exactly one open interval per key
    docs = _docs(spark).limit(400)
    snaps = docs.selectExpr("doc_id % 37 AS e", "doc_id AS v",
                            "substring(lang, 1, 1) AS s")
    hist = S.snapshot_history(snaps, "e", "v", ["s"]).toPandas()
    obs = snaps.toPandas()
    by_e = {e: g for e, g in hist.groupby("e")}
    for _, r in obs.iterrows():
        g = by_e[r["e"]]
        hits = g[(g["valid_from"] <= r["v"])
                 & (g["valid_to"].isna() | (g["valid_to"] > r["v"]))]
        assert len(hits) == 1
        assert hits.iloc[0]["s"] == r["s"]
    cur = hist[hist["is_current"]]
    assert len(cur) == hist["e"].nunique()
    assert cur["valid_to"].isna().all()
    # observation count conservation
    assert int(hist["n_snapshots"].sum()) == len(obs)


# --- weighted sampling without replacement (Efraimidis-Spirakis) ---

def test_weighted_sample_exact_replay_and_bounds(spark):
    import math
    sys.path.insert(0, "tools")
    from make_goldens import xxh64

    docs = _docs(spark).withColumn(
        "w", (F.col("doc_id") % 10 + 1).cast("double"))
    out = S.weighted_sample_per_stratum(docs, "lang", "w", k=7).toPandas()
    # per-stratum cap + determinism across partitionings
    assert (out.groupby("lang").size() <= 7).all()
    out2 = S.weighted_sample_per_stratum(
        _docs(spark).repartition(13).withColumn(
            "w", (F.col("doc_id") % 10 + 1).cast("double")),
        "lang", "w", k=7).toPandas()
    assert sorted(out["doc_id"]) == sorted(out2["doc_id"])
    # independent from-spec replay: seeded XXH64 uniform + ln(u)/w
    seed_h = xxh64(int(29).to_bytes(4, "little"), 42)
    full = _docs(spark).toPandas()
    by_lang = {}
    for _, r in full.iterrows():
        d = int(r["doc_id"])
        w = d % 10 + 1
        h = xxh64(d.to_bytes(8, "little", signed=True), seed_h)
        s = h - (1 << 64) if h >= (1 << 63) else h
        u = s % 1_000_000 + 1
        by_lang.setdefault(r["lang"], []).append(
            (-math.log(u / 1e6) / w, d))
    exp = []
    for lang, rows in by_lang.items():
        exp += [d for _, d in sorted(rows)[:7]]
    assert sorted(out["doc_id"]) == sorted(exp)


def test_weighted_sample_weights_bias_and_validation(spark):
    # 500 strata, each with a heavy (w=50) and 9 light (w=1) items:
    # the heavy one must be picked far more often than 1/10 of the time
    rows = [(s * 10 + i, f"s{s}", 50.0 if i == 0 else 1.0)
            for s in range(500) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, strat string, w double")
    out = S.weighted_sample_per_stratum(df, "strat", "w", k=1,
                                        id_col="doc_id").toPandas()
    assert len(out) == 500
    heavy = (out["doc_id"] % 10 == 0).mean()
    assert heavy > 0.6          # expected ~50/59 ≈ 0.85; far above 0.1
    # zero/negative/null/NaN weights are excluded (NaN > 0 is true in
    # Spark and a NaN key would sort FIRST under desc — the trap)
    df2 = spark.createDataFrame(
        [(1, "a", 0.0), (2, "a", -3.0), (3, "a", None), (4, "a", 2.0),
         (5, "a", float("nan"))],
        "doc_id long, strat string, w double")
    got = S.weighted_sample_per_stratum(df2, "strat", "w", k=5,
                                        id_col="doc_id").toPandas()
    assert list(got["doc_id"]) == [4]
    import pytest as _pt
    with _pt.raises(ValueError):
        S.weighted_sample_per_stratum(df2, "strat", "w", k=0)
