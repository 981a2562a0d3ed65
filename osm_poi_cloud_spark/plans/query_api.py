"""Read-side query surface — the reference's API semantics over the POI
table (``_deprecated/athena/lambda_handler.py``).

Endpoints:
* ``pois_in_bbox``  = /pois  (lambda_handler.py:92-158): bucket pruning
  predicates + exact bbox range + optional class filter + limit cap.
* ``class_histogram`` = /classes (lambda_handler.py:74-79).
* ``to_geojson`` = the row -> GeoJSON Feature projection
  (lambda_handler.py:162-238) as a native ``to_json(struct(...))``.

Validation guardrails mirror lambda_handler.py:103-135: bbox sanity,
<=5 degree span, limit capped at 10_000 (default 1_000).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_BBOX_DEGREES = 5.0
DEFAULT_LIMIT = 1000
MAX_LIMIT = 10000


def validate_bbox(min_lon: float, min_lat: float, max_lon: float, max_lat: float) -> None:
    for v in (min_lon, min_lat, max_lon, max_lat):
        if not math.isfinite(v):
            raise ValueError("bbox values must be finite")
    if min_lon > max_lon or min_lat > max_lat:
        raise ValueError("Invalid bbox: min values must be less than max values")
    if (max_lon - min_lon) > MAX_BBOX_DEGREES or (max_lat - min_lat) > MAX_BBOX_DEGREES:
        raise ValueError(f"Bbox too large. Max {MAX_BBOX_DEGREES} degrees on each side.")


def pois_in_bbox(
    pois: DataFrame,
    min_lon: float,
    min_lat: float,
    max_lon: float,
    max_lat: float,
    poi_class: str | None = None,
    limit: int = DEFAULT_LIMIT,
) -> DataFrame:
    """Bbox query with the reference's two-tier pruning: integer bucket
    range first (drives partition pruning on the lon_bucket directory
    layout + parquet row-group stats), then the exact float range."""
    validate_bbox(min_lon, min_lat, max_lon, max_lat)
    limit = int(limit)
    if limit <= 0:  # 400-class input error, not a plan error (lambda_handler.py:103-135)
        raise ValueError("limit must be a positive integer")
    limit = min(limit, MAX_LIMIT)

    df = pois.filter(
        F.col("lon_bucket").between(math.floor(min_lon), math.floor(max_lon))
        & F.col("lat_bucket").between(math.floor(min_lat), math.floor(max_lat))
        & F.col("lon").between(min_lon, max_lon)
        & F.col("lat").between(min_lat, max_lat)
    )
    if poi_class:
        df = df.filter(F.col("class") == poi_class)
    return df.limit(limit)


def class_histogram(pois: DataFrame) -> DataFrame:
    """GROUP BY class ORDER BY count DESC (lambda_handler.py:74-79; the
    reference's SELECT DISTINCT is redundant with GROUP BY)."""
    return (
        pois.groupBy("class")
        .agg(F.count(F.lit(1)).alias("count"))
        .orderBy(F.desc("count"), F.asc("class"))
    )


def cell_range(cell_id: int, stored_level: int = 12) -> tuple[int, int]:
    """Child-id range of an S2 cell: every descendant id (at any finer
    level) lies in [id - lsb + 1, id + lsb - 1] where lsb is the cell's
    lowest set bit. Works directly on the signed-int64 reinterpretation
    because the offset stays within the cell's bit suffix."""
    lsb = cell_id & -cell_id
    return cell_id - lsb + 1, cell_id + lsb - 1


def pois_in_cell(pois: DataFrame, cell_id: int, stored_level: int = 12) -> DataFrame:
    """All POIs inside an S2 cell of ANY level <= stored_level, as a pure
    range predicate on the stored ``cell_l{stored_level}`` column.

    Because the POI table is repartitionByRange'd + sorted on the cell
    id (plans/pipeline.write_pois), this is a parquet min/max-pruned
    range scan touching only the files covering the cell — the S2 analog
    of the reference's bucket pruning, but hierarchical."""
    lo, hi = cell_range(cell_id)
    col = F.col(f"cell_l{stored_level}")
    return pois.filter(col.between(lo, hi))


def health() -> dict:
    """/health endpoint semantics (lambda_handler.py:44-48)."""
    return {"status": "ok"}


def viewport_tile_range(min_lon: float, min_lat: float, max_lon: float,
                        max_lat: float, zoom: int) -> tuple[int, int, int, int]:
    """Inclusive (x_lo, x_hi, y_lo, y_hi) tile range covering a lon/lat
    viewport at ``zoom`` — the slippy-map client's tile enumeration,
    computed with the engine's bit-exact P9 kernel (so the range agrees
    with every stored tile assignment). Web-Mercator y grows DOWN, so
    the y range comes from (max_lat, min_lat)."""
    validate_bbox(min_lon, min_lat, max_lon, max_lat)
    if not 0 <= zoom <= 22:
        raise ValueError(f"zoom must be in [0, 22], got {zoom}")
    from ..functions import tile_math as tm

    x_lo, y_lo = tm.lon_lat_to_tile(min_lon, max_lat, zoom)
    x_hi, y_hi = tm.lon_lat_to_tile(max_lon, min_lat, zoom)
    return int(x_lo), int(x_hi), int(y_lo), int(y_hi)


def tiles_in_viewport(tiles: DataFrame, min_lon: float, min_lat: float,
                      max_lon: float, max_lat: float, zoom: int,
                      max_tiles: int = 4096) -> DataFrame:
    """Viewport query against a stored tile table (build_tiles /
    stage_tiles output with z, x, y columns): one zoom equality + two
    integer BETWEENs — all three land in PushedFilters, and on the
    stage_tiles layout (partitioned by z, range-clustered on x, y) the
    scan touches only the z partition's covering row groups. The
    ``max_tiles`` guard rejects viewport/zoom combinations that would
    enumerate more tiles than a client could render (input validation,
    not a plan limit)."""
    x_lo, x_hi, y_lo, y_hi = viewport_tile_range(
        min_lon, min_lat, max_lon, max_lat, zoom)
    n = (x_hi - x_lo + 1) * (y_hi - y_lo + 1)
    if n > max_tiles:
        raise ValueError(
            f"viewport covers {n} tiles at z{zoom} > max_tiles={max_tiles}; "
            "lower the zoom or shrink the bbox")
    return tiles.filter(
        (F.col("z") == zoom)
        & F.col("x").between(x_lo, x_hi)
        & F.col("y").between(y_lo, y_hi))


def register_poi_table(spark, path: str, view: str = "pois"):
    """Ad-hoc SQL surface — the Athena-over-the-table path
    (create_table.sql:35-40, README.md:294-301): register the POI table
    and let users run arbitrary spark.sql over it."""
    df = spark.read.parquet(path)
    df.createOrReplaceTempView(view)
    return df


GEOJSON_PROPERTY_KEYS = (
    "name", "class", "shard_id", "poi_id", "amenity", "shop", "cuisine",
    "brand", "opening_hours", "website", "phone", "operator",
)


def to_geojson(pois: DataFrame) -> DataFrame:
    """Row -> GeoJSON Feature JSON string; null properties pruned (the
    reference drops empty/None properties, lambda_handler.py:196-226)."""
    props = F.struct(*[F.col(k) for k in GEOJSON_PROPERTY_KEYS if k in pois.columns])
    feature = F.struct(
        F.lit("Feature").alias("type"),
        F.struct(
            F.lit("Point").alias("type"),
            F.array(F.col("lon"), F.col("lat")).alias("coordinates"),
        ).alias("geometry"),
        props.alias("properties"),
    )
    return pois.select(F.to_json(feature).alias("feature"))
