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
