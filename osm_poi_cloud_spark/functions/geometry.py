"""Polygon geometry kernels: shoelace area + area-weighted centroid.

Completes operator P4: the reference collapses polygon features to
centroids before indexing (``stack/batch/process.py:209`` —
``ST_Centroid(geometry)``). Two implementations with identical math:

* numpy (`ring_centroid` / `polygon_centroid`) — for driver-side
  planning, golden generation and as the test oracle;
* native Spark higher-order functions (`centroid_exprs` /
  `with_ring_centroid`) — zip_with/aggregate over an
  ``array<array<double>>`` ring column, fully JVM-side (no Python in
  the hot path), so collapsing 10^9 polygon rows to centroid points is
  a plain projection with zero shuffle.

Centroid of a simple ring (standard shoelace-weighted form):
    A2 = sum_i (x_i * y_{i+1} - x_{i+1} * y_i)            # 2 * signed area
    Cx = sum_i (x_i + x_{i+1}) * (x_i*y_{i+1} - x_{i+1}*y_i) / (3 * A2)
    Cy = sum_i (y_i + y_{i+1}) * (x_i*y_{i+1} - x_{i+1}*y_i) / (3 * A2)
The A2 sign cancels in the ratio, so winding order is irrelevant for
the centroid; ``area`` is emitted as |A2| / 2.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# numpy kernels
# ---------------------------------------------------------------------------

def ring_centroid(ring) -> tuple[float, float, float]:
    """(cx, cy, signed_area) of one ring, open or closed, any winding.
    Degenerate (zero-area) rings fall back to the vertex mean."""
    r = np.asarray(ring, dtype=np.float64)
    if np.array_equal(r[0], r[-1]):
        r = r[:-1]
    x, y = r[:, 0], r[:, 1]
    xn, yn = np.roll(x, -1), np.roll(y, -1)
    cross = x * yn - xn * y
    a2 = cross.sum()
    if a2 == 0.0:
        return float(x.mean()), float(y.mean()), 0.0
    cx = ((x + xn) * cross).sum() / (3.0 * a2)
    cy = ((y + yn) * cross).sum() / (3.0 * a2)
    return float(cx), float(cy), float(a2 / 2.0)


def polygon_centroid(shells, holes=()) -> tuple[float, float, float]:
    """Area-weighted centroid of a multipolygon with holes (the
    ST_Centroid surface semantics): shells contribute +|A|, holes -|A|,
    regardless of input winding order."""
    wsum = 0.0
    cx = 0.0
    cy = 0.0
    for ring, sign in [(s, 1.0) for s in shells] + [(h, -1.0) for h in holes]:
        rx, ry, a = ring_centroid(ring)
        w = sign * abs(a)
        cx += rx * w
        cy += ry * w
        wsum += w
    if wsum == 0.0:
        raise ValueError("zero-area polygon set")
    return cx / wsum, cy / wsum, wsum


# ---------------------------------------------------------------------------
# Spark-native (higher-order function) form
# ---------------------------------------------------------------------------

def centroid_exprs(ring: Column) -> tuple[Column, Column, Column]:
    """(centroid_x, centroid_y, area) columns for an
    ``array<array<double>>`` ring column ([[x, y], ...], open or
    closed). Pure Catalyst expressions — a closed ring's duplicated
    last vertex only adds an exactly-zero cross term.

    Degenerate (zero-area) rings fall back to the vertex mean, matching
    ``ring_centroid`` — without the guard ANSI mode would kill the whole
    job on one collinear ring (DIVIDE_BY_ZERO)."""
    shifted = F.concat(F.slice(ring, 2, F.size(ring) - 1), F.slice(ring, 1, 1))

    def cross(a, b):
        return a[0] * b[1] - b[0] * a[1]

    def _sum(arr):
        return F.aggregate(arr, F.lit(0.0), lambda acc, v: acc + v)

    a2 = _sum(F.zip_with(ring, shifted, cross))
    sx = _sum(F.zip_with(ring, shifted, lambda a, b: (a[0] + b[0]) * cross(a, b)))
    sy = _sum(F.zip_with(ring, shifted, lambda a, b: (a[1] + b[1]) * cross(a, b)))
    # vertex mean over the OPEN ring (drop a closed ring's duplicate last
    # vertex first, as the numpy kernel does)
    open_ring = F.when(
        F.element_at(ring, 1) == F.element_at(ring, -1),
        F.slice(ring, 1, F.size(ring) - 1),
    ).otherwise(ring)
    n = F.size(open_ring).cast("double")
    mean_x = _sum(F.transform(open_ring, lambda p: p[0])) / n
    mean_y = _sum(F.transform(open_ring, lambda p: p[1])) / n
    degen = a2 == F.lit(0.0)
    cx = F.when(degen, mean_x).otherwise(sx / (F.lit(3.0) * F.when(degen, F.lit(1.0)).otherwise(a2)))
    cy = F.when(degen, mean_y).otherwise(sy / (F.lit(3.0) * F.when(degen, F.lit(1.0)).otherwise(a2)))
    return cx, cy, F.abs(a2) / F.lit(2.0)


def with_ring_centroid(df: DataFrame, ring_col: str = "ring",
                       prefix: str = "centroid_") -> DataFrame:
    cx, cy, area = centroid_exprs(F.col(ring_col))
    return (
        df.withColumn(f"{prefix}lon", cx)
        .withColumn(f"{prefix}lat", cy)
        .withColumn("ring_area", area)
    )


def collapse_polygons_to_points(df: DataFrame, ring_col: str = "ring",
                                lon: str = "lon", lat: str = "lat") -> DataFrame:
    """The pipeline position of the reference's ST_Centroid collapse
    (process.py:209): polygon rows become point rows ready for cell
    encoding / tile assignment; the ring column is dropped."""
    cx, cy, _ = centroid_exprs(F.col(ring_col))
    return df.withColumn(lon, cx).withColumn(lat, cy).drop(ring_col)


# ---------------------------------------------------------------------------
# Douglas-Peucker polyline simplification (tippecanoe parity)
# ---------------------------------------------------------------------------
#
# The reference's tile stage shells out to tippecanoe, which simplifies
# geometry per zoom before MVT encoding; this is that capability as a
# first-class kernel. DP keeps a SUBSET of the original vertices
# (endpoints always), recursing on the vertex with the maximum
# perpendicular distance from the chord while that distance exceeds the
# tolerance. Decisions compare cross^2 > tol^2 * |chord|^2 — no
# division, no sqrt — so with integer-valued coordinates every
# comparison is exact float64 integer arithmetic and the kept-index set
# is reproducible bit-for-bit by any independent implementation (the
# golden oracle recomputes it with a recursive pure-Python DP).
# Ties (two vertices at the same max distance) keep the LOWEST index —
# np.argmax's first-hit rule, restated in the golden.

def dp_keep_indices(pts: np.ndarray, tol: float) -> np.ndarray:
    """Kept vertex indices (ascending) for one open polyline.
    ``pts``: (n, 2) float64; iterative explicit-stack DP (no Python
    recursion limit on pathological inputs)."""
    n = len(pts)
    if n <= 2:
        return np.arange(n)
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[-1] = True
    t2 = float(tol) * float(tol)
    stack = [(0, n - 1)]
    while stack:
        i, j = stack.pop()
        if j <= i + 1:
            continue
        ax, ay = pts[i]
        bx, by = pts[j]
        dx, dy = bx - ax, by - ay
        seg = pts[i + 1:j]
        l2 = dx * dx + dy * dy
        if l2 == 0.0:
            # degenerate chord: plain squared distance to the endpoint
            d2 = (seg[:, 0] - ax) ** 2 + (seg[:, 1] - ay) ** 2
            m = int(np.argmax(d2))
            if d2[m] > t2:
                k = i + 1 + m
                keep[k] = True
                stack.append((i, k))
                stack.append((k, j))
        else:
            cross = dx * (seg[:, 1] - ay) - dy * (seg[:, 0] - ax)
            num = cross * cross
            m = int(np.argmax(num))
            if num[m] > t2 * l2:
                k = i + 1 + m
                keep[k] = True
                stack.append((i, k))
                stack.append((k, j))
    return np.nonzero(keep)[0]


def make_simplify_udf(tol: float):
    """Arrow-batched pandas UDF: array<array<double>> polyline ->
    array<bigint> kept vertex indices. Per-line work is bounded by the
    line's own vertex count; lines never cross rows, so the operator
    distributes as a map-only projection."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<long>")
    def _simplify(lines: pd.Series) -> pd.Series:
        out = []
        for line in lines:
            if line is None or len(line) == 0:
                out.append([])
                continue
            pts = np.asarray([[p[0], p[1]] for p in line], dtype=np.float64)
            out.append([int(i) for i in dp_keep_indices(pts, tol)])
        return pd.Series(out)

    return _simplify


def simplify_polylines(df: DataFrame, tol: float,
                       line_col: str = "line",
                       out_col: str = "kept_idx") -> DataFrame:
    """Attach the DP kept-index array for each polyline row. Map-only;
    downstream tiling projects ``transform(kept_idx, i -> line[i])``
    natively to materialize the simplified geometry."""
    return df.withColumn(out_col, make_simplify_udf(tol)(F.col(line_col)))


# ---------------------------------------------------------------------------
# DP persistence: per-vertex elimination tolerance -> whole zoom pyramid
# from ONE Python pass
# ---------------------------------------------------------------------------
#
# The split vertex of a DP segment is tolerance-INDEPENDENT (always the
# max-distance vertex); tolerance only prunes the recursion earlier. So
# the kept sets are nested across tolerances, and each vertex has a
# single "elimination tolerance": the min over its split-ancestor chain
# of d^2 = cross^2 / |chord|^2 (its perpendicular distance squared at
# the node where it was the split vertex, capped by its parents').
# ``dp_keep_indices(pts, tol)`` == ``dp_tolerances(pts) > tol*tol``
# wherever the single IEEE division cannot flip a decision (always true
# on integer-lattice coordinates with moderate magnitudes: the exact
# integer comparison differs from the threshold by >= 1/|chord|^2,
# ~1e9 ulps). A zoom pyramid (tippecanoe simplifies per zoom before
# encoding) therefore needs ONE Arrow UDF pass per feature; selecting
# each zoom's vertex subset is a native array filter — at 10^9 features
# x 13 zooms that is 13x less Python than simplifying per (feature,
# zoom).

def dp_tolerances(pts: np.ndarray) -> np.ndarray:
    """Per-vertex squared elimination tolerance (endpoints +inf):
    vertex i survives simplification at ``tol`` iff out[i] > tol*tol.
    Full-descent DP (no pruning), iterative explicit stack, np.argmax
    first-max tie rule — same traversal as ``dp_keep_indices``."""
    n = len(pts)
    out = np.full(n, np.inf)
    if n <= 2:
        return out
    stack = [(0, n - 1, np.inf)]
    while stack:
        i, j, cap = stack.pop()
        if j <= i + 1:
            continue
        ax, ay = pts[i]
        bx, by = pts[j]
        dx, dy = bx - ax, by - ay
        seg = pts[i + 1:j]
        l2 = dx * dx + dy * dy
        if l2 == 0.0:
            d2 = (seg[:, 0] - ax) ** 2 + (seg[:, 1] - ay) ** 2
            m = int(np.argmax(d2))
            v = d2[m]
        else:
            cross = dx * (seg[:, 1] - ay) - dy * (seg[:, 0] - ax)
            num = cross * cross
            m = int(np.argmax(num))
            v = num[m] / l2
        k = i + 1 + m
        eff = v if v < cap else cap
        out[k] = eff
        stack.append((i, k, eff))
        stack.append((k, j, eff))
    return out


def make_tolerance_udf():
    """Arrow-batched pandas UDF: array<array<double>> polyline ->
    array<double> per-vertex squared elimination tolerances."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<double>")
    def _tols(lines: pd.Series) -> pd.Series:
        out = []
        for line in lines:
            if line is None or len(line) == 0:
                out.append([])
                continue
            pts = np.asarray([[p[0], p[1]] for p in line], dtype=np.float64)
            out.append([float(v) for v in dp_tolerances(pts)])
        return pd.Series(out)

    return _tols


def simplify_pyramid(df: DataFrame, base_tol: float,
                     min_zoom: int = 2, max_zoom: int = 14,
                     line_col: str = "line") -> DataFrame:
    """Per-zoom simplified geometry for every polyline: one row per
    (feature, z) with ``simp`` = the vertices DP keeps at tolerance
    ``base_tol * 2^(max_zoom - z)`` (coarser zoom -> coarser geometry,
    tippecanoe's per-zoom simplify rule in tile units).

    Plan shape: ONE Python stage (the tolerance UDF), then the zoom
    explode, threshold and vertex selection are native array ops —
    codegen filter over arrays_zip, no per-zoom UDF, no shuffle."""
    t2 = float(base_tol) * float(base_tol)
    with_tol = df.withColumn("_tol2", make_tolerance_udf()(F.col(line_col)))
    ztol2 = F.lit(t2) * F.pow(F.lit(4.0), F.lit(max_zoom) - F.col("z"))
    simp = F.expr(
        f"transform(filter(arrays_zip({line_col}, _tol2), "
        f"s -> s._tol2 > _ztol2), s -> s.{line_col})")
    return (
        with_tol
        .withColumn("z", F.explode(F.sequence(F.lit(min_zoom), F.lit(max_zoom))))
        .withColumn("_ztol2", ztol2)
        .withColumn("simp", simp)
        .drop("_tol2", "_ztol2")
    )
