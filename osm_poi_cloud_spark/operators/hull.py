"""Distributed convex hulls per group — the vector-geometry summary a
tile/cluster pipeline publishes for each region (DBSCAN cluster
footprints, per-tile coverage outlines; cf. the reference's
admin-boundary polygons consumed by the join stage, which it ingests
ready-made rather than derives).

Algorithm: Andrew's monotone chain per group (O(n log n), numpy inside
an Arrow-batched ``applyInPandas`` kernel — the engine's bounded
per-group pattern). STRICT hull: collinear boundary points are not
vertices. Output vertex order is canonical — counter-clockwise starting
at the lexicographically smallest point — so results are deterministic
and fingerprintable.

Scale design — the hull is a MONOID: ``hull(A ∪ B) == hull(hull(A) ∪
hull(B))`` (a point is extreme in the union only if it is extreme in
its part). ``n_partials`` exploits that identity for groups too large
for one task: stage 1 computes partial hulls per (group, salt) cell —
each task sees ~n/s points, emits only its hull's vertices (tiny) —
and stage 2 merges the concatenated partial vertices with the same
kernel. Exactness is unconditional (pinned two-level == single-level
in tests); the salt count only tunes memory per task.

Degenerate groups are well-defined: a single distinct point is a
1-vertex hull, a collinear set collapses to its 2 extreme points;
``area2`` (TWICE the shoelace area — exact on integer-lattice input)
is 0 for both.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _monotone_chain(pts: np.ndarray) -> np.ndarray:
    """CCW strict hull of unique lexicographically-sorted (n,2) points,
    starting at the smallest point."""
    n = len(pts)
    if n <= 2:
        return pts

    def half(p: np.ndarray) -> list:
        st: list = []
        for q in p:
            while len(st) >= 2:
                o, a = st[-2], st[-1]
                cross = ((a[0] - o[0]) * (q[1] - o[1])
                         - (a[1] - o[1]) * (q[0] - o[0]))
                if cross <= 0:          # clockwise or collinear: drop
                    st.pop()
                else:
                    break
            st.append(q)
        return st

    lower = half(pts)
    upper = half(pts[::-1])
    return np.array(lower[:-1] + upper[:-1])


def _iter_group_hulls(pdf: pd.DataFrame, key_cols: list[str]):
    """Yield (group value, hull array) per group in a bucket with ONE
    vectorized sort + boundary slicing — no pandas groupby machinery
    per group (a bucket holds thousands of tiny groups; per-group
    overhead is the whole cost there). Points are globally distinct
    (callers dedupe), so sorted slices feed the chain directly."""
    pdf = pdf.sort_values(key_cols + ["x", "y"], kind="mergesort")
    arr = np.column_stack([pdf["x"].to_numpy(np.float64),
                           pdf["y"].to_numpy(np.float64)])
    keys = [pdf[c].to_numpy() for c in key_cols]
    n = len(pdf)
    if n == 0:
        return
    change = np.zeros(n, dtype=bool)
    change[0] = True
    for k in keys:
        change[1:] |= k[1:] != k[:-1]
    starts = np.flatnonzero(change)
    bounds = np.append(starts, n)
    for i in range(len(starts)):
        s, e = bounds[i], bounds[i + 1]
        yield keys[0][s], _monotone_chain(arr[s:e])


def _area2(hull: np.ndarray) -> float:
    if len(hull) < 3:
        return 0.0
    x, y = hull[:, 0], hull[:, 1]
    return float(abs(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y)))


def convex_hulls(df: DataFrame, group_col: str = "group",
                 x_col: str = "x", y_col: str = "y",
                 n_partials: int | None = None,
                 n_buckets: int = 64) -> DataFrame:
    """Per-group strict convex hulls:
    ``(group, n_points, n_vertices, area2, hull array<struct<x,y>>)``
    with ``n_points`` the distinct-point count. With ``n_partials=s``
    the hull runs as two stages via the hull monoid identity (see
    module docstring) — use it when single groups are too large for
    one task's memory.

    Python-call amortization: a POI table grouped by fine tiles has
    MILLIONS of tiny groups, and one ``applyInPandas`` invocation per
    group would drown in per-call overhead (measured 52 s -> 2.6 s on
    38k points x ~29k z10 groups). So the kernel is invoked per HASH
    BUCKET of groups (``n_buckets`` calls per stage, whole cells per
    bucket) and loops the groups in pandas/numpy inside — identical
    results, per-task memory still bounded by bucket size."""
    if n_partials is not None and n_partials < 2:
        raise ValueError(f"need n_partials >= 2, got {n_partials}")
    if n_buckets < 1:
        raise ValueError(f"need n_buckets >= 1, got {n_buckets}")
    raw = df.select(
        F.col(group_col).alias("_g"),
        F.col(x_col).cast("double").alias("x"),
        F.col(y_col).cast("double").alias("y"),
    )
    gtype = raw.schema["_g"].dataType.simpleString()
    # NATIVE pre-filter: hull(S) == hull of the per-(group, x) y-extreme
    # points (anything strictly between its column's ymin and ymax is a
    # convex combination of them, so never a vertex). One codegen'd
    # aggregation dedupes, counts distinct points AND shrinks the
    # Python stage's input to <= 2 rows per distinct x per group —
    # dense tile/cluster groups collapse by orders of magnitude before
    # any Arrow transfer.
    cols = raw.groupBy("_g", "x").agg(
        F.min("y").alias("_ymin"), F.max("y").alias("_ymax"),
        F.countDistinct("y").alias("_nd"))
    counts = cols.groupBy("_g").agg(F.sum("_nd").alias("n_points"))
    pts = cols.select(
        "_g", "x",
        F.explode(F.array_distinct(F.array("_ymin", "_ymax"))).alias("y"))

    def partial_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        gs, xs, ys = [], [], []
        for g, hull in _iter_group_hulls(pdf, ["_g", "_s"]):
            gs.extend([g] * len(hull))
            xs.extend(hull[:, 0])
            ys.extend(hull[:, 1])
        return pd.DataFrame({"_g": gs, "x": xs, "y": ys})

    if n_partials is not None:
        # bucket whole (group, salt) cells: every cell's points land in
        # one call, many cells per call
        salted = pts.withColumn(
            "_s", F.pmod(F.xxhash64("x", "y"), F.lit(n_partials)))
        pts = (
            salted
            .withColumn("_b", F.pmod(F.xxhash64("_g", "_s"),
                                     F.lit(n_buckets)))
            .groupBy("_b")
            .applyInPandas(partial_bucket,
                           f"_g {gtype}, x double, y double")
        )

    def final_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for g, hull in _iter_group_hulls(pdf, ["_g"]):
            rows.append((g, len(hull), _area2(hull),
                         [(float(p[0]), float(p[1])) for p in hull]))
        return pd.DataFrame(rows,
                            columns=["_g", "n_vertices", "area2", "hull"])

    hulls = (
        pts.withColumn("_b", F.pmod(F.xxhash64("_g"), F.lit(n_buckets)))
        .groupBy("_b")
        .applyInPandas(
            final_bucket,
            f"_g {gtype}, n_vertices long, area2 double, "
            "hull array<struct<x:double,y:double>>")
    )
    return (
        hulls.join(counts, "_g")
        .select(F.col("_g").alias(group_col), "n_points", "n_vertices",
                "area2", "hull")
    )


def dbscan_cluster_hulls(points: DataFrame, eps: float,
                         min_pts: int = 4, x_col: str = "lon",
                         y_col: str = "lat", id_col: str = "point_id",
                         **hull_kwargs) -> DataFrame:
    """Composition: DBSCAN cluster the points, then publish each
    cluster's footprint hull (noise excluded — ``cluster == -1``) —
    the cluster-outline layer a density map renders."""
    from .clustering import dbscan

    labeled = dbscan(points, eps=eps, min_pts=min_pts, x_col=x_col,
                     y_col=y_col, id_col=id_col)
    clustered = (
        points.join(labeled.select(F.col(id_col), "cluster"), id_col)
        .filter(F.col("cluster") != -1)
    )
    return convex_hulls(clustered, group_col="cluster", x_col=x_col,
                        y_col=y_col, **hull_kwargs)
