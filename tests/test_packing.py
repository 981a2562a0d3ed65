"""Sequence packing: hand-computed seq assignment, budget respected up
to one-doc overflow, per-key independence, fill stats."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from osm_poi_cloud_spark.operators import packing as PK


def test_hand_computed_packing(spark):
    df = spark.createDataFrame(pd.DataFrame({
        "doc_id": [0, 1, 2, 3, 4, 5],
        "lang": ["en"] * 4 + ["de"] * 2,
        "n_tokens": [600, 500, 600, 100, 900, 300],
    }))
    out = (PK.pack_sequences(df, budget=1000).toPandas()
           .set_index("doc_id"))
    # en: offsets 0,600,1100,1700 -> seqs 0,0,1,1 ; de: 0,900 -> 0,0
    assert list(out.loc[[0, 1, 2, 3], "seq_id"]) == [0, 0, 1, 1]
    assert list(out.loc[[0, 1, 2, 3], "seq_offset"]) == [0, 600, 1100, 1700]
    assert list(out.loc[[4, 5], "seq_id"]) == [0, 0]

    stats = PK.packing_stats(PK.pack_sequences(df, 1000), 1000).toPandas() \
        .set_index("lang")
    assert stats.loc["en", "n_sequences"] == 2
    assert stats.loc["en", "mean_fill"] == pytest.approx(1800 / 2000)
    assert stats.loc["de", "mean_fill"] == pytest.approx(1200 / 1000)  # overflow doc


def test_budget_overflow_bounded_by_one_doc(spark):
    import numpy as np
    rng = np.random.RandomState(5)
    df = spark.createDataFrame(pd.DataFrame({
        "doc_id": range(500),
        "lang": ["en"] * 500,
        "n_tokens": rng.randint(1, 400, 500),
    }))
    out = PK.pack_sequences(df, budget=2048).toPandas()
    per_seq = out.groupby("seq_id")["n_tokens"].sum()
    assert (per_seq.iloc[:-1] >= 2048 - 400).all()  # fills near budget
    assert (per_seq <= 2048 + 400).all()            # overflow <= one doc


def test_validation(spark):
    df = spark.createDataFrame(pd.DataFrame({"doc_id": [1], "lang": ["en"], "n_tokens": [5]}))
    with pytest.raises(ValueError):
        PK.pack_sequences(df, budget=0)
