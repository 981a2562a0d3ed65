"""Inverted index + BM25 retrieval (operators/retrieval.py) and PMI
collocations (functions/text_analysis.pmi_bigrams)."""

import math
import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from osm_poi_cloud_spark.functions import text_analysis as ta
from osm_poi_cloud_spark.operators import retrieval as rt

CORPUS = [
    (0, "spark merge join spark spark"),
    (1, "merge sort window window"),
    (2, "the quick brown fox"),
    (3, "spark window"),
    (4, ""),
    (5, "vector Vector VECTOR vector!"),
]


def _toks(text):
    return [t for t in re.split("[^a-z0-9]+", text.lower().strip()) if t]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(CORPUS, "doc_id long, text string")


def test_postings_match_counter(spark, docs):
    got = {(r["term"], r["doc_id"]): r["tf"]
           for r in rt.build_inverted_index(docs).collect()}
    exp = Counter((t, d) for d, x in CORPUS for t in _toks(x))
    assert got == dict(exp)
    dls = {r["doc_id"]: r["dl"] for r in rt.doc_lengths(docs).collect()}
    assert dls == {d: len(_toks(x)) for d, x in CORPUS}


def _bm25_expected(query, k1=1.0, b=0.75):
    """Independent scalar recompute with the same ppm-floor rule."""
    toks = {d: _toks(x) for d, x in CORPUS}
    n_docs = len(CORPUS)
    sum_dl = sum(len(t) for t in toks.values())
    avgdl = sum_dl / n_docs
    df = {q: sum(1 for t in toks.values() if q in t) for q in query}
    out = {}
    for d, t in toks.items():
        total, n_terms = 0, 0
        for q in query:
            tf = t.count(q)
            if tf == 0:
                continue
            idf = (n_docs - df[q] + 0.5) / (df[q] + 0.5)
            tfc = (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * (len(t) / avgdl)))
            total += math.floor(1e6 * idf * tfc)
            n_terms += 1
        if n_terms:
            out[d] = (n_terms, total)
    return out


def test_bm25_matches_scalar_recompute(spark, docs):
    query = ["spark", "window", "vector"]
    got = {r["doc_id"]: (r["n_terms"], r["score_ppm"])
           for r in rt.bm25_topk(docs, query, k=10, k1=1.0, b=0.75).collect()}
    assert got == _bm25_expected(query)


def test_bm25_partitioning_independent(spark, docs):
    query = ["spark", "merge"]
    a = sorted(map(tuple, rt.bm25_topk(docs, query, k=10).collect()))
    b = sorted(map(tuple, rt.bm25_topk(
        docs.repartition(7), query, k=10).collect()))
    assert a == b


def test_bm25_topk_order_and_cap(spark, docs):
    rows = rt.bm25_topk(docs, ["spark", "window", "vector"], k=2).collect()
    assert len(rows) == 2
    exp = _bm25_expected(["spark", "window", "vector"])
    best = sorted(exp.items(), key=lambda kv: (-kv[1][1], kv[0]))[:2]
    assert [r["doc_id"] for r in rows] == [d for d, _ in best]


def test_bm25_plan_shape(spark, docs):
    df = rt.bm25_topk(docs, ["spark"], k=5)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan


def test_bm25_validation(spark, docs):
    with pytest.raises(ValueError):
        rt.bm25_scores(None, None, [])
    with pytest.raises(ValueError):
        rt.bm25_scores(None, None, ["a", "a"])
    with pytest.raises(ValueError):
        rt.bm25_topk(docs, ["a"], k=0)


# ---------------------------------------------------------------------------
# PMI collocations
# ---------------------------------------------------------------------------

def _pmi_expected(texts, min_count):
    pairs = Counter()
    for x in texts:
        t = [w for w in x.lower().strip().split() if w]
        pairs.update(zip(t, t[1:]))
    c_a, c_b = Counter(), Counter()
    for (a, bb), c in pairs.items():
        c_a[a] += c
        c_b[bb] += c
    n_bi = sum(pairs.values())
    return {(a, bb): (c, c_a[a], c_b[bb], (1_000_000 * c * n_bi) // (c_a[a] * c_b[bb]))
            for (a, bb), c in pairs.items() if c >= min_count}


def test_pmi_matches_counter_recompute(spark):
    texts = ["new york new york city", "san francisco bay",
             "new york times", "york new haven", "bay area san francisco",
             "the the the the"]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = {(r["w1"], r["w2"]): (r["c_ab"], r["c_a"], r["c_b"], r["pmi_ppm"])
           for r in ta.pmi_bigrams(df, min_count=1).collect()}
    assert got == _pmi_expected(texts, 1)
    # collocation signal: 'san francisco' (always adjacent) outscores
    # 'the the' (self-product dominated)
    assert got[("san", "francisco")][3] > got[("the", "the")][3]


def test_pmi_min_count_and_topk(spark):
    texts = ["a b a b a b", "c d", "a b"]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = ta.pmi_bigrams(df, min_count=2).collect()
    assert {(r["w1"], r["w2"]) for r in got} == {("a", "b"), ("b", "a")}
    top = ta.pmi_topk(df, k=1, min_count=1).collect()
    exp = _pmi_expected(texts, 1)
    best = sorted(exp.items(), key=lambda kv: (-kv[1][3], kv[0]))[0][0]
    assert (top[0]["w1"], top[0]["w2"]) == best


def test_pmi_partitioning_independent(spark):
    texts = [f"tok{i % 7} tok{(i * 3) % 7} tok{i % 5}" for i in range(100)]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    a = sorted(map(tuple, ta.pmi_bigrams(df, min_count=1).collect()))
    b = sorted(map(tuple, ta.pmi_bigrams(
        df.repartition(13), min_count=1).collect()))
    assert a == b


def test_pmi_validation(spark):
    with pytest.raises(ValueError):
        ta.pmi_bigrams(None, min_count=0)


# ------------------------------------------------------------ phrase search


def test_phrase_occurrences_hand_case(spark):
    df = spark.createDataFrame(
        [(1, "alpha the quick brown fox jumps beta"),
         (2, "the quick brown fox jumps the quick brown fox jumps"),
         (3, "the quick brown fox sleeps"),
         (4, "a a a"),                       # overlap probe corpus below
         (5, "")],
        "doc_id long, text string")
    got = {r["doc_id"]: (r["n_occurrences"], r["first_pos"])
           for r in rt.phrase_occurrences(df, "The quick, brown FOX jumps!").collect()}
    assert got == {1: (1, 1), 2: (2, 0)}
    # overlapping occurrences all count
    ov = {r["doc_id"]: (r["n_occurrences"], r["first_pos"])
          for r in rt.phrase_occurrences(df, "a a").collect()}
    assert ov == {4: (2, 0)}
    with pytest.raises(ValueError):
        rt.phrase_occurrences(df, "!!!")


def test_phrase_indexed_parity(spark):
    # the serving-time postings-join plan returns exactly the map-only
    # scan's rows, including repeated-term phrases and overlaps
    import numpy as np
    rng = np.random.RandomState(11)
    pool = ["the", "quick", "brown", "fox", "dog", "a"]
    rows = [(i, " ".join(pool[j] for j in rng.randint(0, 6, 30)))
            for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    idx = rt.build_positional_index(df)
    for phrase in ("the quick", "a a", "quick brown fox"):
        scan = {(r["doc_id"], r["n_occurrences"], r["first_pos"])
                for r in rt.phrase_occurrences(df, phrase).collect()}
        served = {(r["doc_id"], r["n_occurrences"], r["first_pos"])
                  for r in rt.phrase_search_indexed(idx, phrase).collect()}
        assert scan == served, phrase
        assert scan  # non-trivial: the pool guarantees matches
        # independent python recompute
        exp = set()
        for did, text in rows:
            tk = text.split()
            p = phrase.split()
            hits = [j for j in range(len(tk) - len(p) + 1)
                    if tk[j:j + len(p)] == p]
            if hits:
                exp.add((did, len(hits), hits[0]))
        assert scan == exp, phrase
