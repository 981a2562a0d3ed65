"""DSIR importance resampling (operators/importance.py): hand-checked
bucket counts and weights vs an independent from-spec XXH64 recompute,
selection separation on a planted target distribution, partitioning
independence, zero-gram documents, and plan shape (broadcast weight
join, TakeOrderedAndProject selection, single count shuffle)."""

import os
import sys

import pytest
from pyspark.sql import functions as F

from osm_poi_cloud_spark.operators import importance as imp

sys.path.insert(0, "tools")

CATS = [
    "the cat sat on the mat",
    "a cat and another cat play with the cat toy",
    "cats love the warm mat by the door",
    "my cat naps on the sunny mat all day",
]
JUNK = [
    "buy cheap pills now discount offer click here buy cheap",
    "cheap pills discount click buy offer now here pills cheap",
    "discount offer buy now click cheap pills here offer now",
    "click here now buy discount cheap offer pills click buy",
]


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")


def test_hashed_ngram_buckets_independent_recompute(spark):
    """Engine buckets == pure-Python chained-XXH64 recompute of the
    unigram+bigram feature set (the test_bloom-pinned hash identity)."""
    import re

    from make_goldens import _signed, xxh64

    dim = 32
    df = _docs(spark, CATS)
    got = {(r["doc_id"], r["bucket"]): r["cnt"]
           for r in imp.hashed_ngram_buckets(df, dim=dim).collect()}

    seed_h = xxh64(int(42).to_bytes(4, "little"), 42)
    exp = {}
    for i, t in enumerate(CATS):
        toks = [w for w in re.split("[^a-z0-9]+", t.lower()) if w]
        grams = toks + [toks[j] + " " + toks[j + 1] for j in range(len(toks) - 1)]
        for gm in grams:
            b = _signed(xxh64(gm.encode(), seed_h)) % dim
            exp[(i, b)] = exp.get((i, b), 0) + 1
    assert got == exp


def test_importance_weights_hand_computed(spark):
    """dim=4, one-bucket corpora: every floor in the ppm ratio chain
    checked against hand arithmetic."""
    target = spark.createDataFrame([(0, 2)], "bucket int, cnt long")
    raw = spark.createDataFrame([(0, 2), (1, 6)], "bucket int, cnt long")
    w = {r["bucket"]: r["ratio_ppm"]
         for r in imp.importance_weights(target, raw, dim=4, scale=10**9).collect()}
    # T=2, R=8, B=4:
    # q_t(0)=1e9*3//6=500_000_000, q_r(0)=1e9*3//12=250_000_000
    # q_t(1)=1e9*1//6=166_666_666, q_r(1)=1e9*7//12=583_333_333
    # q_t(2..3)=166_666_666,      q_r(2..3)=1e9*1//12=83_333_333
    assert w[0] == (10**6 * 500_000_000) // 250_000_001
    assert w[1] == (10**6 * 166_666_666) // 583_333_334
    assert w[2] == w[3] == (10**6 * 166_666_666) // 83_333_334
    assert set(w) == {0, 1, 2, 3}


def test_resample_separates_target_like_docs(spark):
    """Raw = cat docs + junk docs; target = other cat docs. The top
    half selected by DSIR must be exactly the cat half."""
    raw = _docs(spark, CATS + JUNK)
    target = spark.createDataFrame(
        [(100, "the cat sat on the warm mat by the door and naps all day"),
         (101, "cats play with a cat toy and another cat loves the sunny mat")],
        "doc_id long, text string")
    sel = imp.importance_resample(raw, target, k=len(CATS), dim=256)
    kept = {r["doc_id"] for r in sel.collect()}
    assert kept == set(range(len(CATS)))


def test_scores_partitioning_independent(spark):
    raw = _docs(spark, CATS + JUNK)
    target = _docs(spark, CATS[:2])
    a = imp.importance_scores(raw, target, dim=64).orderBy("doc_id").collect()
    b = imp.importance_scores(raw.repartition(7), target.repartition(3),
                              dim=64).orderBy("doc_id").collect()
    assert a == b


def test_zero_gram_doc_scores_zero(spark):
    raw = spark.createDataFrame(
        [(0, "real words here"), (1, ""), (2, "   ??? !!!")],
        "doc_id long, text string")
    target = _docs(spark, ["real words"])
    got = {r["doc_id"]: (r["n_grams"], r["score_ppm"])
           for r in imp.importance_scores(raw, target, dim=64).collect()}
    assert got[1] == (0, 0) and got[2] == (0, 0)
    assert got[0][0] > 0 and got[0][1] > 0


def test_plan_shape(spark):
    raw = _docs(spark, CATS + JUNK)
    target = _docs(spark, CATS[:2])
    scores = imp.importance_scores(raw, target, dim=64)
    plan = scores._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # dim-bounded weight table
    sel_plan = imp.importance_select(scores, 3)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "TakeOrderedAndProject" in sel_plan
