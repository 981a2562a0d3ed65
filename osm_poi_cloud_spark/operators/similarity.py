"""Similarity search over embedding columns (array<float>).

* ``cosine_topk``      — brute-force exact baseline: native
  ``zip_with``/``aggregate`` dot products (JVM-side, codegen'd) +
  TakeOrderedAndProject. O(n) per query but zero Python, full scan
  bandwidth — the correctness oracle for the ANN paths.
* ``lsh_bucket_ann``   — random-hyperplane sign-LSH: deterministic
  projection matrix (seeded), one vectorized pandas UDF computes the
  bucket key, queries probe their own bucket (+optional multiprobe by
  flipping low-margin bits); within-bucket brute force. The scale path:
  candidate count tracks bucket occupancy, not corpus size, and the
  corpus can be written bucketed/partitioned by the key so a query
  touches one partition.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _dot_sql(a: str, b: str) -> str:
    return f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0D, (acc, v) -> acc + v)"


def _norm_sql(a: str) -> str:
    return f"sqrt(aggregate({a}, 0D, (acc, v) -> acc + v * v))"


def cosine_topk(df: DataFrame, query_vec: list[float], k: int,
                vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Exact top-k by cosine similarity against one query vector."""
    q = "array(" + ", ".join(f"CAST({float(v)!r} AS DOUBLE)" for v in query_vec) + ")"
    dv = f"CAST({vec_col} AS ARRAY<DOUBLE>)"
    sim = F.expr(f"{_dot_sql(dv, q)} / ({_norm_sql(dv)} * {_norm_sql(q)})")
    return (
        df.select(F.col(id_col), sim.alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )


def _projection(dim: int, bits: int, seed: int) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.standard_normal((dim, bits)).astype(np.float64)


def make_lsh_bucket_udf(dim: int, bits: int = 16, seed: int = 13):
    planes = _projection(dim, bits, seed)
    powers = (1 << np.arange(bits, dtype=np.int64))

    @F.pandas_udf(T.LongType())
    def bucket(vecs: pd.Series) -> pd.Series:
        m = np.stack([np.asarray(v, dtype=np.float64) for v in vecs]) if len(vecs) else np.zeros((0, dim))
        signs = (m @ planes) > 0
        return pd.Series((signs * powers).sum(axis=1).astype(np.int64))

    return bucket


def lsh_bucket_ann(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    dim: int,
    bits: int = 12,
    seed: int = 13,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id: str = "query_id",
) -> DataFrame:
    """Approximate kNN: same-bucket candidates + exact cosine re-rank.

    Recall improves with fewer bits (bigger buckets) — the bits knob
    trades shuffle width vs recall; tests pin recall vs the brute-force
    oracle on clustered data."""
    b = make_lsh_bucket_udf(dim, bits, seed)
    c = corpus.select(F.col(id_col), F.col(vec_col).alias("c_vec")).withColumn("bucket", b(F.col("c_vec")))
    q = queries.select(F.col(query_id), F.col(vec_col).alias("q_vec")).withColumn("bucket", b(F.col("q_vec")))

    cq, cc = "CAST(q_vec AS ARRAY<DOUBLE>)", "CAST(c_vec AS ARRAY<DOUBLE>)"
    sim = F.expr(f"{_dot_sql(cq, cc)} / ({_norm_sql(cq)} * {_norm_sql(cc)})")
    cand = q.join(c, on="bucket").withColumn("cos_sim", sim)
    from pyspark.sql import Window

    w = Window.partitionBy(query_id).orderBy(F.desc("cos_sim"), F.asc(id_col))
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(query_id, id_col, "cos_sim", "rn")
    )


def ivf_index(corpus: DataFrame, n_centroids: int = 16, seed: int = 19,
              vec_col: str = "embedding", id_col: str = "vec_id"):
    """IVF (inverted-file) index: k-means centroids over the corpus +
    per-vector nearest-centroid bucket assignment.

    Returns (centroids ndarray [n, dim], indexed DataFrame with a
    ``centroid_id`` column). At scale the indexed corpus is written
    partitioned by centroid_id so a query reads only its probed
    partitions; training runs on a sample (MLlib KMeans is itself a
    distributed Spark job).
    """
    import numpy as np
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feat = corpus.select(
        F.col(id_col), F.col(vec_col),
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features"),
    )
    km = KMeans(k=n_centroids, seed=seed, featuresCol="features", predictionCol="centroid_id")
    model = km.fit(feat)
    centroids = np.stack([np.asarray(c) for c in model.clusterCenters()])
    indexed = model.transform(feat).select(id_col, vec_col, "centroid_id")
    return centroids, indexed


def ivf_ann(
    indexed: DataFrame,
    centroids,
    queries: DataFrame,
    k: int,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id: str = "query_id",
) -> DataFrame:
    """IVF probe: each query visits its ``nprobe`` nearest centroids'
    buckets only; exact cosine re-rank within them. Recall rises with
    nprobe (nprobe = n_centroids degenerates to brute force)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import Window
    from pyspark.sql import types as T

    cent = np.asarray(centroids, dtype=np.float64)

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def probe(vecs: pd.Series) -> pd.Series:
        if not len(vecs):
            return pd.Series([], dtype=object)
        m = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        d2 = ((m[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        order = np.argsort(d2, axis=1)[:, :nprobe]
        return pd.Series([row.astype(int).tolist() for row in order])

    q = (
        queries.select(F.col(query_id), F.col(vec_col).alias("q_vec"))
        .withColumn("centroid_id", F.explode(probe(F.col("q_vec"))))
    )
    c = indexed.select(F.col(id_col), F.col(vec_col).alias("c_vec"), "centroid_id")
    cq, cc = "CAST(q_vec AS ARRAY<DOUBLE>)", "CAST(c_vec AS ARRAY<DOUBLE>)"
    sim = F.expr(f"{_dot_sql(cq, cc)} / ({_norm_sql(cq)} * {_norm_sql(cc)})")
    cand = q.join(c, on="centroid_id").withColumn("cos_sim", sim)
    w = Window.partitionBy(query_id).orderBy(F.desc("cos_sim"), F.asc(id_col))
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(query_id, id_col, "cos_sim", "rn")
    )


def pairwise_topk_bruteforce(corpus: DataFrame, queries: DataFrame, k: int, *,
                             vec_col: str = "embedding", id_col: str = "vec_id",
                             query_id: str = "query_id") -> DataFrame:
    """Exact multi-query top-k (cross join) — the ANN recall oracle."""
    c = corpus.select(F.col(id_col), F.col(vec_col).alias("c_vec"))
    q = queries.select(F.col(query_id), F.col(vec_col).alias("q_vec"))
    cq, cc = "CAST(q_vec AS ARRAY<DOUBLE>)", "CAST(c_vec AS ARRAY<DOUBLE>)"
    sim = F.expr(f"{_dot_sql(cq, cc)} / ({_norm_sql(cq)} * {_norm_sql(cc)})")
    cand = q.crossJoin(c).withColumn("cos_sim", sim)
    from pyspark.sql import Window

    w = Window.partitionBy(query_id).orderBy(F.desc("cos_sim"), F.asc(id_col))
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(query_id, id_col, "cos_sim", "rn")
    )


def embedding_cosine_dedup_pairs(df: DataFrame, threshold: float = 0.98,
                                 bits: int = 10, seed: int = 13, dim: int | None = None,
                                 vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Embedding near-duplicate pairs: LSH bucket blocking + exact cosine
    filter (the embedding-space member of the dedup suite)."""
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    b = make_lsh_bucket_udf(dim, bits, seed)
    keyed = df.select(F.col(id_col), F.col(vec_col)).withColumn("bucket", b(F.col(vec_col)))
    l = keyed.selectExpr(f"{id_col} AS a", f"{vec_col} AS va", "bucket")
    r = keyed.selectExpr(f"{id_col} AS b", f"{vec_col} AS vb", "bucket")
    ca, cb = "CAST(va AS ARRAY<DOUBLE>)", "CAST(vb AS ARRAY<DOUBLE>)"
    sim = F.expr(f"{_dot_sql(ca, cb)} / ({_norm_sql(ca)} * {_norm_sql(cb)})")
    return (
        l.join(r, on="bucket")
        .filter(F.col("a") < F.col("b"))
        .withColumn("cos_sim", sim)
        .filter(F.col("cos_sim") >= threshold)
        .select("a", "b", "cos_sim")
    )
