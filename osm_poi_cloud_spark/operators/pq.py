"""Product quantization (PQ) + IVF-PQ: the standard billion-scale ANN
memory layout (Jégou et al., "Product Quantization for Nearest
Neighbor Search", TPAMI 2011 — the FAISS IVFPQ shape).

Why it matters at 100 TB: float32 embeddings at 10^9 x 768 dims are
~3 TB; PQ stores each vector as m one-byte codes (e.g. 64 B/vector,
48x smaller), and asymmetric distance computation (ADC) scores a query
against millions of codes with one m-entry table lookup per vector —
no float vector ever leaves storage at query time.

Spark mapping:
* training — per-subspace k-means over a bounded deterministic sample
  (the same seeded sample-Lloyd pattern as IVF centroids: a planning
  pass, amortized over every later query);
* encoding — one Arrow-batched UDF pass: argmin over each subspace's
  codebook, emitting ``array<int>`` codes (deterministic: numpy argmin
  takes the lowest index on ties);
* search — the per-query ADC lookup table is computed once in a
  vectorized UDF, then scoring is PURE native SQL: codes never touch
  Python (``aggregate`` over an indexed ``transform`` against the
  broadcast LUT), so the hot loop is whole-stage-codegen'd;
* IVF composition — reuse ``similarity.ivf_index`` buckets to prune
  candidates to ``nprobe`` cells before ADC scoring.

Determinism: seeded sampling + fixed-order float64 reductions, so
codebooks, codes and rankings are partitioning-independent (tested).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .similarity import _pairwise_d2

def train_pq_codebooks(corpus: DataFrame, m: int, k: int = 256,
                       seed: int = 29, max_sample: int = 4096,
                       iters: int = 10, vec_col: str = "embedding",
                       id_col: str = "vec_id",
                       sample: str = "id-prefix") -> np.ndarray:
    """(m, k, dim/m) float64 codebooks — per-subspace sample-Lloyd.

    Reuses the deterministic IVF training pass per subspace slice
    (bounded collect; ``sample='hash'`` for 100 TB corpora)."""
    if m <= 0 or k <= 1:
        raise ValueError(f"need m > 0 subspaces and k > 1 codes, got m={m}, k={k}")
    # one bounded sample collect, then slice per subspace locally
    # (same sampling rules as similarity.train_ivf_centroids)
    sel = corpus.select(F.col(id_col), F.col(vec_col).cast("array<double>"))
    if sample == "hash":
        n = corpus.count()
        mm = max(1, n // max_sample)
        rows = sel.filter(F.pmod(F.xxhash64(F.col(id_col)), F.lit(mm)) == 0).collect()
        rows.sort(key=lambda r: r[0])
        rows = rows[:max_sample]
    elif sample == "id-prefix":
        rows = sel.orderBy(id_col).limit(max_sample).collect()
    else:
        raise ValueError(f"sample must be 'id-prefix' or 'hash', got {sample!r}")
    x = np.array([r[1] for r in rows], dtype=np.float64)
    dim = x.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m} subspaces")
    sub = dim // m
    books = np.zeros((m, k, sub))
    for s in range(m):
        xs = x[:, s * sub:(s + 1) * sub]
        rng = np.random.RandomState(seed + s)
        kk = min(k, len(xs))
        cent = xs[np.sort(rng.choice(len(xs), size=kk, replace=False))].copy()
        for _ in range(iters):
            d2 = _pairwise_d2(xs, cent)
            assign = d2.argmin(axis=1)
            for c in range(len(cent)):
                msk = assign == c
                if msk.any():
                    cent[c] = xs[msk].mean(axis=0)
        books[s, :kk] = cent
        if kk < k:  # degenerate tiny corpus: pad with copies of last
            books[s, kk:] = cent[-1]
    return books


def pq_encode(corpus: DataFrame, codebooks: np.ndarray,
              vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """(id, codes array<int>) — one vectorized argmin pass per batch."""
    books = np.asarray(codebooks, dtype=np.float64)
    m, k, sub = books.shape

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def encode(vecs: pd.Series) -> pd.Series:
        if not len(vecs):
            return pd.Series([], dtype=object)
        x = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        codes = np.empty((len(x), m), dtype=np.int32)
        for s in range(m):
            xs = x[:, s * sub:(s + 1) * sub]
            d2 = _pairwise_d2(xs, books[s])
            codes[:, s] = d2.argmin(axis=1)
        return pd.Series(list(codes))

    return corpus.select(F.col(id_col), encode(F.col(vec_col)).alias("codes"))


def _adc_lut_udf(codebooks: np.ndarray):
    """Per-query ADC lookup table: flattened (m*k) array of squared
    sub-distances — computed once per query row, vectorized."""
    books = np.asarray(codebooks, dtype=np.float64)
    m, k, sub = books.shape

    @F.pandas_udf(T.ArrayType(T.DoubleType()))
    def lut(vecs: pd.Series) -> pd.Series:
        out = []
        for v in vecs:
            q = np.asarray(v, dtype=np.float64)
            tab = np.empty((m, k))
            for s in range(m):
                qs = q[s * sub:(s + 1) * sub]
                tab[s] = ((books[s] - qs[None, :]) ** 2).sum(axis=1)
            out.append(tab.ravel().tolist())
        return pd.Series(out)

    return lut


def pq_ann(encoded: DataFrame, codebooks: np.ndarray, queries: DataFrame,
           topk: int = 10, vec_col: str = "embedding",
           id_col: str = "vec_id", query_id: str = "query_id") -> DataFrame:
    """Brute-force ADC search over PQ codes: every (query, code) pair
    scored NATIVELY — ``aggregate`` over an indexed ``transform``
    against the query's broadcast LUT; Python touches only the
    per-query LUT build. Returns (query_id, vec_id, adc_dist, rn)."""
    m, k, _ = np.asarray(codebooks).shape
    lut = _adc_lut_udf(codebooks)
    q = queries.select(F.col(query_id), lut(F.col(vec_col)).alias("lut"))
    score = F.expr(
        f"aggregate(zip_with(codes, sequence(0, {m - 1}), "
        f"(c, i) -> element_at(lut, i * {k} + c + 1)), 0D, (a, x) -> a + x)"
    ).alias("adc_dist")
    w = Window.partitionBy(query_id).orderBy(F.col("adc_dist").asc(), F.col(id_col).asc())
    return (
        F.broadcast(q).crossJoin(encoded)
        .select(query_id, id_col, score)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= topk)
    )


def ivf_pq_ann(encoded_with_cell: DataFrame, centroids, codebooks: np.ndarray,
               queries: DataFrame, topk: int = 10, nprobe: int = 4,
               vec_col: str = "embedding", id_col: str = "vec_id",
               query_id: str = "query_id") -> DataFrame:
    """IVF-PQ: prune candidates to each query's ``nprobe`` nearest IVF
    cells (``centroid_id`` column from ``similarity.ivf_assign``), then
    ADC-score only those — the FAISS IVFPQ query path. At 10^9 vectors
    this touches nprobe/n_cells of the codes instead of all of them."""
    cent = np.asarray(centroids, dtype=np.float64)
    m, k, _ = np.asarray(codebooks).shape
    lut = _adc_lut_udf(codebooks)

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def probe_cells(vecs: pd.Series) -> pd.Series:
        out = []
        for v in vecs:
            qv = np.asarray(v, dtype=np.float64)
            d2 = ((cent - qv[None, :]) ** 2).sum(axis=1)
            out.append(np.argsort(d2, kind="stable")[:nprobe].astype(np.int32).tolist())
        return pd.Series(out)

    q = queries.select(
        F.col(query_id),
        lut(F.col(vec_col)).alias("lut"),
        F.explode(probe_cells(F.col(vec_col))).alias("centroid_id"),
    )
    score = F.expr(
        f"aggregate(zip_with(codes, sequence(0, {m - 1}), "
        f"(c, i) -> element_at(lut, i * {k} + c + 1)), 0D, (a, x) -> a + x)"
    ).alias("adc_dist")
    w = Window.partitionBy(query_id).orderBy(F.col("adc_dist").asc(), F.col(id_col).asc())
    return (
        F.broadcast(q).join(encoded_with_cell, on="centroid_id")
        .select(query_id, id_col, score)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= topk)
    )
