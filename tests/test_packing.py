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


def test_bucketed_pack_key_hand_computed(spark):
    """n_buckets salts the pack key: expected assignments recomputed
    independently (from-spec XXH64 bucket + pandas per-group cumsum);
    the Window's partition spec must carry pack_bucket so no single
    language is one task."""
    import sys
    from pathlib import Path
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    from make_goldens import xxh64

    import numpy as np
    rng = np.random.RandomState(11)
    pdf = pd.DataFrame({
        "doc_id": np.arange(300, dtype=np.int64),
        "lang": ["en"] * 250 + ["de"] * 50,
        "n_tokens": rng.randint(1, 500, 300),
    })
    n_buckets = 8
    # independent recompute: Spark xxhash64(long) == XXH64(8-byte LE, seed 42)
    def bucket(d):
        h = xxh64(int(d).to_bytes(8, "little", signed=True), 42)
        if h >= 1 << 63:
            h -= 1 << 64
        return h % n_buckets
    pdf["exp_bucket"] = pdf["doc_id"].map(bucket)
    exp = pdf.sort_values("doc_id").copy()
    grp = exp.groupby(["lang", "exp_bucket"])["n_tokens"]
    exp["exp_offset"] = grp.cumsum() - exp["n_tokens"]
    exp["exp_seq"] = exp["exp_offset"] // 1000

    df = spark.createDataFrame(pdf[["doc_id", "lang", "n_tokens"]])
    packed = PK.pack_sequences(df, budget=1000, n_buckets=n_buckets)
    out = packed.toPandas().set_index("doc_id").sort_index()
    exp = exp.set_index("doc_id").sort_index()
    assert (out["pack_bucket"] == exp["exp_bucket"]).all()
    assert (out["seq_offset"] == exp["exp_offset"]).all()
    assert (out["seq_id"] == exp["exp_seq"]).all()
    # window partition granularity >> |langs|
    n_parts = out.reset_index().groupby(["lang", "pack_bucket"]).ngroups
    assert n_parts > 2
    plan = packed._jdf.queryExecution().executedPlan().toString()
    assert "pack_bucket" in plan and "Window" in plan
    # stats group by full sequence identity (bucket included)
    stats = PK.packing_stats(packed, 1000).toPandas().set_index("lang")
    exp_en_seqs = exp[exp["lang"] == "en"].groupby(["exp_bucket", "exp_seq"]).ngroups
    assert stats.loc["en", "n_sequences"] == exp_en_seqs


def test_sequence_shards_hand_computed(spark):
    """Shard gather: token-id arrays spliced in doc order per sequence,
    out-of-order input partitions notwithstanding."""
    df = spark.createDataFrame(pd.DataFrame({
        "doc_id": [2, 0, 1, 3],          # deliberately unsorted
        "lang": ["en"] * 4,
        "n_tokens": [2, 3, 2, 1],
        "token_ids": [[40, 41], [10, 11, 12], [20, 21], [50]],
    })).repartition(3)
    packed = PK.pack_sequences(df, budget=5)
    # offsets: doc0=0, doc1=3, doc2=5, doc3=7 -> seqs 0,0,1,1
    shards = PK.sequence_shards(packed).toPandas().set_index("seq_id")
    assert list(shards.loc[0, "tokens"]) == [10, 11, 12, 20, 21]
    assert list(shards.loc[1, "tokens"]) == [40, 41, 50]
    assert shards.loc[0, "n_docs"] == 2 and shards.loc[0, "n_tokens"] == 5
    assert shards.loc[1, "n_docs"] == 2 and shards.loc[1, "n_tokens"] == 3


def test_validation(spark):
    df = spark.createDataFrame(pd.DataFrame({"doc_id": [1], "lang": ["en"], "n_tokens": [5]}))
    with pytest.raises(ValueError):
        PK.pack_sequences(df, budget=0)


def test_chunk_documents_hand_computed(spark):
    """10 tokens, max=4, overlap=2 -> stride 2, starts 1,3,5,7 (upper =
    max(10-2,1)=8): windows [1..4],[3..6],[5..8],[7..10]. Exact-boundary
    doc (4 tokens) is one chunk; empty/whitespace docs vanish."""
    df = spark.createDataFrame(pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": ["t0 t1 t2 t3 t4 t5 t6 t7 t8 t9",
                 "a  b\tc \n d",   # messy whitespace, 4 tokens
                 "", "   "],
    }))
    out = PK.chunk_documents(df, max_tokens=4, overlap=2).toPandas()
    d0 = out[out.doc_id == 0].sort_values("chunk_idx")
    assert list(d0["chunk_idx"]) == [0, 1, 2, 3]
    assert list(d0["chunk_text"]) == [
        "t0 t1 t2 t3", "t2 t3 t4 t5", "t4 t5 t6 t7", "t6 t7 t8 t9"]
    assert list(d0["n_tokens"]) == [4, 4, 4, 4]
    d1 = out[out.doc_id == 1]
    assert list(d1["chunk_text"]) == ["a b c d"]
    assert set(out.doc_id) == {0, 1}  # empty docs dropped


def test_chunk_documents_tail_and_coverage(spark):
    """Tail chunk is short but present; every token index is covered;
    consecutive chunks share exactly `overlap` tokens (except the tail,
    which may restart earlier only via the greatest() clamp)."""
    import numpy as np
    rng = np.random.RandomState(7)
    texts = [" ".join(f"w{i}_{j}" for j in range(n))
             for i, n in enumerate(rng.randint(1, 40, 60))]
    df = spark.createDataFrame(pd.DataFrame({
        "doc_id": range(60), "text": texts}))
    out = PK.chunk_documents(df, max_tokens=8, overlap=3).toPandas()
    for i, t in enumerate(texts):
        toks = t.split()
        got = out[out.doc_id == i].sort_values("chunk_idx")
        # reconstruct coverage: chunk j starts at j*stride (0-based)
        rebuilt = []
        for _, r in got.iterrows():
            start = int(r["chunk_idx"]) * 5
            expect = toks[start:start + 8]
            assert r["chunk_text"].split() == expect
            assert r["n_tokens"] == len(expect)
            rebuilt.extend(expect)
        assert set(rebuilt) == set(toks)  # full coverage
        # tail rule: last start <= max(n - overlap, 1) - 1 (0-based)
        n = len(toks)
        n_chunks = len(got)
        exp_chunks = len(range(0, max(n - 3, 1), 5))
        assert n_chunks == exp_chunks


def test_chunk_documents_validation(spark):
    df = spark.createDataFrame(pd.DataFrame({"doc_id": [1], "text": ["x"]}))
    with pytest.raises(ValueError):
        PK.chunk_documents(df, max_tokens=8, overlap=8)
    with pytest.raises(ValueError):
        PK.chunk_documents(df, max_tokens=8, overlap=-1)


def test_packing_invariants_property(spark):
    """Property sweep (single Spark job over many random corpora):
    offsets are exact prefix sums per pack key, seq ids are monotone
    non-decreasing, and every sequence except possibly the last per key
    ends because the next doc would overflow."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=15, deadline=None)
    @given(st.integers(0, 2**31 - 1), st.integers(1, 40), st.integers(8, 64))
    def check(seed, n_docs, budget):
        rng = np.random.RandomState(seed)
        pdf = pd.DataFrame({
            "doc_id": np.arange(n_docs),
            "lang": [("en", "de")[i % 2] for i in range(n_docs)],
            "n_tokens": rng.randint(1, budget + 5, n_docs),
        })
        out = (PK.pack_sequences(spark.createDataFrame(pdf), budget=budget)
               .toPandas().sort_values("doc_id").reset_index(drop=True))
        for lang, g in out.groupby("lang"):
            g = g.sort_values("doc_id")
            run = 0
            prev_seq = None
            for _, r in g.iterrows():
                assert r["seq_offset"] == run                # exact prefix sum
                assert r["seq_id"] == run // budget          # the floor rule
                if prev_seq is not None:
                    assert r["seq_id"] >= prev_seq           # monotone
                prev_seq = r["seq_id"]
                run += r["n_tokens"]

    check()
