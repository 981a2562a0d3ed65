"""kNN POI lookup per cell (north-rule extension; the reference has no
ranking windows — SURVEY §2 'Windows' row).

Strategy: grid-neighborhood candidate generation + window top-k.
Query points and POIs are keyed by Web-Mercator tile at ``zoom``;
each query point expands to its 3x3 tile neighborhood (x wraps at the
antimeridian, y clamps at the poles), candidates resolve via one
shuffle hash join on the tile key, distance is a native haversine
expression, and ``row_number() <= k`` takes the top-k.

Exactness guarantee: results are exact iff the k-th neighbor lies
within one tile width of the query point — pick ``zoom`` so the tile
edge exceeds the expected k-NN radius (the caller's data-density
knob). ``knn_bruteforce`` is the small-data/exactness fallback.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import tile_math as tm

EARTH_RADIUS_M = 6_371_000.0


def haversine_m(lon1, lat1, lon2, lat2):
    """Great-circle distance in meters — native column expression."""
    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    a = (
        F.sin(dlat / 2) ** 2
        + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2)) * F.sin(dlon / 2) ** 2
    )
    return F.lit(2.0 * EARTH_RADIUS_M) * F.asin(F.sqrt(a))


def knn_join(
    queries: DataFrame,
    pois: DataFrame,
    k: int,
    zoom: int = 10,
    query_id: str = "query_id",
    poi_id: str = "poi_id",
) -> DataFrame:
    """For each query point: k nearest POIs within the 3x3 tile
    neighborhood at ``zoom``. Both inputs need lon/lat columns."""
    n = 1 << zoom
    qx, qy = tm.tile_cols("lon", "lat", zoom)
    px, py = tm.tile_cols("lon", "lat", zoom)

    q = queries.select(
        F.col(query_id), F.col("lon").alias("q_lon"), F.col("lat").alias("q_lat"),
        qx.alias("_qx"), qy.alias("_qy"),
    )
    # 3x3 neighborhood: x wraps (antimeridian), y clamps (mercator edge)
    q = q.withColumn("_dx", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))))
    q = q.withColumn("_dy", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))))
    q = (
        q.withColumn("tx", F.pmod(F.col("_qx") + F.col("_dx"), F.lit(n)).cast("long"))
        .withColumn("ty", (F.col("_qy") + F.col("_dy")).cast("long"))
        .filter((F.col("ty") >= 0) & (F.col("ty") < n))
        .drop("_qx", "_qy", "_dx", "_dy")
    )

    p = pois.select(
        F.col(poi_id), F.col("lon").alias("p_lon"), F.col("lat").alias("p_lat"),
        px.alias("tx"), py.alias("ty"),
    )

    cand = q.join(p, on=["tx", "ty"], how="inner").withColumn(
        "dist_m", haversine_m(F.col("q_lon"), F.col("q_lat"), F.col("p_lon"), F.col("p_lat"))
    )
    w = Window.partitionBy(query_id).orderBy(F.col("dist_m").asc(), F.col(poi_id).asc())
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(query_id, poi_id, "dist_m", "rn")
    )


def knn_bruteforce(queries: DataFrame, pois: DataFrame, k: int,
                   query_id: str = "query_id", poi_id: str = "poi_id") -> DataFrame:
    """Exact kNN via cross join — oracle/fallback for small inputs."""
    q = queries.select(query_id, F.col("lon").alias("q_lon"), F.col("lat").alias("q_lat"))
    p = pois.select(poi_id, F.col("lon").alias("p_lon"), F.col("lat").alias("p_lat"))
    cand = q.crossJoin(p).withColumn(
        "dist_m", haversine_m(F.col("q_lon"), F.col("q_lat"), F.col("p_lon"), F.col("p_lat"))
    )
    w = Window.partitionBy(query_id).orderBy(F.col("dist_m").asc(), F.col(poi_id).asc())
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(query_id, poi_id, "dist_m", "rn")
    )


def radius_join(left: DataFrame, right: DataFrame, radius_deg: float,
                left_id: str = "query_id", right_id: str = "poi_id") -> DataFrame:
    """All (left, right) pairs within ``radius_deg`` in DEGREE-SPACE
    Euclidean distance — the within-distance companion to ``knn_join``.

    Metric note: plain L2 on (lon, lat) degrees, NOT meters. The point
    is cross-engine exactness: the distance is two subtractions, two
    multiplies, an add and an IEEE-correctly-rounded sqrt, so an
    oracle engine reproduces every boundary decision bit-for-bit (the
    haversine form in ``knn_join`` is meter-true but transcendental).
    Degree space does not wrap at the antimeridian; pairs straddling
    +-180 deg are not candidates, consistently with the metric itself.

    Plan: both sides keyed by a ``radius_deg``-sized lon/lat grid cell
    (floor division — native), the LEFT side expands to its 3x3 cell
    neighborhood (if dist <= r, the cells differ by <= 1 in each axis,
    so coverage is EXACT, not approximate), one shuffle hash join on
    the cell key, then the exact distance filter. Output pair count —
    not n^2 — drives the cost, the same blocking argument as the LSH
    band join."""
    if radius_deg <= 0:
        raise ValueError(f"radius_deg must be positive, got {radius_deg}")
    r = float(radius_deg)
    lcx = F.floor(F.col("lon") / r).cast("long")
    lcy = F.floor(F.col("lat") / r).cast("long")

    lt = left.select(
        F.col(left_id), F.col("lon").alias("l_lon"), F.col("lat").alias("l_lat"),
        lcx.alias("_cx"), lcy.alias("_cy"),
    )
    lt = (
        lt.withColumn("_dx", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))))
        .withColumn("_dy", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))))
        .select(left_id, "l_lon", "l_lat",
                (F.col("_cx") + F.col("_dx")).alias("cx"),
                (F.col("_cy") + F.col("_dy")).alias("cy"))
    )
    rt = right.select(
        F.col(right_id), F.col("lon").alias("r_lon"), F.col("lat").alias("r_lat"),
        lcx.alias("cx"), lcy.alias("cy"),
    )
    dx = F.col("l_lon") - F.col("r_lon")
    dy = F.col("l_lat") - F.col("r_lat")
    dist = F.sqrt(dx * dx + dy * dy)
    return (
        lt.join(rt, ["cx", "cy"])
        .withColumn("dist_deg", dist)
        .filter(F.col("dist_deg") <= r)
        .select(left_id, right_id, "dist_deg")
    )
