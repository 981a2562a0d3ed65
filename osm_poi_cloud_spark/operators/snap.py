"""Point-to-segment snap join: match points to nearby line segments.

The map-matching primitive (snap GPS points / POIs to the road
segments they belong to): for each point, find the segments within
``radius`` and the nearest one, with the exact perpendicular
point-to-segment distance.

Blocking follows the dissolve/radius-join family: each segment
explodes to the grid cells its bounding box covers at cell size
``radius``, DILATED by one ring; a point within ``radius`` of any
segment point q satisfies the Chebyshev bound |p - q|_inf <= radius,
so p's cell lies in the 3x3 dilation of q's cell — and q's cell is
inside the segment bbox cover. Zero false negatives at cell size
``radius`` for ANY segment geometry (bbox cover over-approximates
diagonal segments — an explode-factor cost, not a correctness one;
keep segments short, as road networks do).

The refine predicate is the exact clamped-projection distance:
``t = clamp(((p-a).d) / |d|^2, 0, 1)``, ``q = a + t d``,
``d2 = |p-q|^2`` — division, multiply, add, LEAST/GREATEST only, each
correctly rounded and engine-independent, so d2 is bit-exact against
the DuckDB brute-force oracle (the radius-pairs precedent).
Zero-length segments degrade to point distance via a guarded t=0.

One shuffle (the cell hash join); nearest-per-point is a min-struct
aggregation with deterministic (d2, seg_id) tie-break.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _seg_cells(segments: DataFrame, cell: float, seg_id: str) -> DataFrame:
    """Dilated bbox cell cover per segment."""
    return (
        segments.select(seg_id, "ax", "ay", "bx", "by")
        .withColumn("_cx", F.explode(F.sequence(
            F.floor(F.least("ax", "bx") / F.lit(cell)) - 1,
            F.floor(F.greatest("ax", "bx") / F.lit(cell)) + 1)))
        .withColumn("_cy", F.explode(F.sequence(
            F.floor(F.least("ay", "by") / F.lit(cell)) - 1,
            F.floor(F.greatest("ay", "by") / F.lit(cell)) + 1)))
    )


def snap_candidates(points: DataFrame, segments: DataFrame, radius: float,
                    point_id: str = "pid", seg_id: str = "seg_id"
                    ) -> DataFrame:
    """All (point, segment, d2) pairs with d2 <= radius^2. ``points``
    carries ``x, y``; ``segments`` carries ``ax, ay, bx, by``."""
    if not radius > 0:
        raise ValueError(f"need radius > 0, got {radius}")
    segs = _seg_cells(segments, radius, seg_id)
    pts = points.select(
        point_id, "x", "y",
        F.floor(F.col("x") / F.lit(radius)).alias("_cx"),
        F.floor(F.col("y") / F.lit(radius)).alias("_cy"))
    j = pts.join(segs, ["_cx", "_cy"])
    dx = F.col("bx") - F.col("ax")
    dy = F.col("by") - F.col("ay")
    len2 = dx * dx + dy * dy
    t_raw = ((F.col("x") - F.col("ax")) * dx
             + (F.col("y") - F.col("ay")) * dy) / len2
    t = F.when(len2 == 0.0, F.lit(0.0)).otherwise(
        F.least(F.greatest(t_raw, F.lit(0.0)), F.lit(1.0)))
    qx = F.col("ax") + t * dx
    qy = F.col("ay") + t * dy
    d2 = (F.col("x") - qx) * (F.col("x") - qx) \
        + (F.col("y") - qy) * (F.col("y") - qy)
    return (
        j.withColumn("d2", d2)
        .filter(F.col("d2") <= F.lit(float(radius) * float(radius)))
        .select(point_id, seg_id, "d2")
        .distinct()  # a pair can be discovered from several shared cells
    )


def snap_nearest(points: DataFrame, segments: DataFrame, radius: float,
                 point_id: str = "pid", seg_id: str = "seg_id"
                 ) -> DataFrame:
    """Nearest in-radius segment per point: ``(pid, seg_id, d2)``,
    ties broken by min seg_id (min-struct — deterministic)."""
    cand = snap_candidates(points, segments, radius, point_id, seg_id)
    return (
        cand.groupBy(point_id)
        .agg(F.min(F.struct(F.col("d2"), F.col(seg_id))).alias("_b"))
        .select(point_id, F.col(f"_b.{seg_id}").alias(seg_id),
                F.col("_b.d2").alias("d2"))
    )
