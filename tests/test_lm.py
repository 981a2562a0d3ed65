"""Bigram LM scoring: hand-computed probabilities, junk-scores-lower,
short-doc guard, filter semantics, partition independence."""

import math

import pandas as pd
from pyspark.sql import functions as F

from osm_poi_cloud_spark.functions import lm as LM


def test_hand_computed_bigram_scores(spark):
    # corpus: "a b a b", "a b", "c" -> unigrams a:3 b:3 c:1 (V=3)
    # bigrams: (a,b):3, (b,a):1
    df = spark.createDataFrame(pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": ["a b a b", "a b", "c"],
    }))
    bc, uc, v = LM.train_bigram_lm(df)
    assert v == 3
    big = {(r["prev"], r["w"]): r["c2"] for r in bc.collect()}
    assert big == {("a", "b"): 3, ("b", "a"): 1}
    uni = {r["prev"]: r["c1"] for r in uc.collect()}
    assert uni == {"a": 3, "b": 3, "c": 1}

    out = LM.score_bigram_lm(df, bc, uc, v).toPandas().set_index("doc_id")
    # doc0: bigrams (a,b),(b,a),(a,b): p_ab = (3+1)/(3+3)=2/3; p_ba=(1+1)/(3+3)=1/3
    q_ab = math.floor(4 / 6 * 1e6)
    q_ba = math.floor(2 / 6 * 1e6)
    assert out.loc[0, "n_bigrams"] == 3
    assert out.loc[0, "sum_p_ppm"] == 2 * q_ab + q_ba
    assert out.loc[0, "mean_p_ppm"] == (2 * q_ab + q_ba) // 3
    assert out.loc[1, "sum_p_ppm"] == q_ab
    # single-token doc: no bigrams, all zeros
    assert (out.loc[2] == 0).all()


def test_junk_scores_lower_and_filter(spark):
    clean = spark.read.parquet("/root/testdata/sf0.001/documents.parquet") \
        .select("doc_id", "text")
    junk = spark.createDataFrame(pd.DataFrame({
        "doc_id": [900000 + i for i in range(20)],
        "text": [" ".join(f"zx{i}q{j}w" for j in range(30)) for i in range(20)],
    }))
    corpus = clean.unionByName(junk)
    bc, uc, v = LM.train_bigram_lm(corpus)
    scored = LM.score_bigram_lm(corpus, bc, uc, v).toPandas()
    is_junk = scored["doc_id"] >= 900000
    # hash-gibberish bigrams are all singletons: far lower mean prob
    assert scored[is_junk]["mean_p_ppm"].max() < scored[~is_junk]["mean_p_ppm"].min()
    thr = int(scored[is_junk]["mean_p_ppm"].max()) + 1
    kept = LM.lm_filter(corpus, LM.score_bigram_lm(corpus, bc, uc, v), thr)
    assert kept.filter(F.col("doc_id") >= 900000).count() == 0
    assert kept.count() == int((~is_junk).sum())


def test_partition_independence(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet") \
        .select("doc_id", "text")
    bc, uc, v = LM.train_bigram_lm(docs)
    a = LM.score_bigram_lm(docs, bc, uc, v).toPandas() \
        .sort_values("doc_id").reset_index(drop=True)
    bc2, uc2, v2 = LM.train_bigram_lm(docs.repartition(11))
    b = LM.score_bigram_lm(docs.repartition(7), bc2, uc2, v2).toPandas() \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
