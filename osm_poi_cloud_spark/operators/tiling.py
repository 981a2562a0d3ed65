"""Tile-pyramid build: per-feature z/x/y assignment for a zoom range +
deterministic per-tile density cap + tile feature aggregation.

Reference: tippecanoe renders z2-z14 with ``--drop-densest-as-needed``
(``stack/tiles/generate_pmtiles.py:139-152``). That heuristic is
opaque/non-deterministic; this engine replaces it with a pinned rule:
rank features inside each (z, x, y) tile by a stable hash and keep the
first ``cap`` (T3 in SURVEY §2). Assignment math is P9 exactly.

Plan shape: tile keys at max_zoom are computed ONCE natively; every
coarser zoom's key is a bit-shift of it (``main.rs:143-147``), so the
pyramid explode is |zooms| integer ops per row — no re-evaluation of
the trig, no UDF, one shuffle for the per-tile window/aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import tile_math as tm

MIN_ZOOM = 2
MAX_ZOOM = 14


def assign_tile_pyramid(
    pois: DataFrame,
    min_zoom: int = MIN_ZOOM,
    max_zoom: int = MAX_ZOOM,
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """One row per (feature, zoom) with its containing tile at each zoom
    in [min_zoom, max_zoom] (generate_pmtiles.py:146-147 zoom range)."""
    x, y = tm.tile_cols(lon, lat, max_zoom)
    df = pois.withColumn("_xm", x).withColumn("_ym", y)
    df = df.withColumn("z", F.explode(F.sequence(F.lit(min_zoom), F.lit(max_zoom))))
    return (
        df.withColumn("x", F.expr(f"shiftright(_xm, {max_zoom} - z)").cast("long"))
        .withColumn("y", F.expr(f"shiftright(_ym, {max_zoom} - z)").cast("long"))
        .drop("_xm", "_ym")
    )


def per_tile_cap(tiled: DataFrame, cap: int, id_col: str = "poi_id") -> DataFrame:
    """Deterministic density drop: keep ``cap`` features per tile, ranked
    by xxhash64(id) (stable, uniform — no spatial bias), tie-broken by id.
    The reproducible stand-in for --drop-densest-as-needed."""
    w = Window.partitionBy("z", "x", "y").orderBy(F.xxhash64(F.col(id_col)), F.col(id_col))
    return (
        tiled.withColumn("_rank", F.row_number().over(w))
        .filter(F.col("_rank") <= cap)
        .drop("_rank")
    )


def build_tiles(
    tiled: DataFrame,
    feature_cols: tuple[str, ...] = ("poi_id", "name", "class", "lon", "lat"),
) -> DataFrame:
    """Aggregate features into one row per tile: (z, x, y, n_features,
    features: array<struct>) — the relational form of a vector tile
    (T2). Feature order inside a tile is pinned for reproducibility."""
    present = [c for c in feature_cols if c in tiled.columns]
    return (
        tiled.groupBy("z", "x", "y")
        .agg(
            F.count(F.lit(1)).alias("n_features"),
            F.sort_array(F.collect_list(F.struct(*present))).alias("features"),
        )
    )


def tile_geojson_lines(tiled: DataFrame) -> DataFrame:
    """Per-feature GeoJSON line output keyed by tile — the NDJSON
    feature stream of generate_pmtiles.py:81-131 (S11/T1)."""
    feature = F.struct(
        F.lit("Feature").alias("type"),
        F.struct(
            F.lit("Point").alias("type"),
            F.array(F.col("lon"), F.col("lat")).alias("coordinates"),
        ).alias("geometry"),
        F.struct(F.col("name"), F.col("class")).alias("properties"),
    )
    return tiled.select("z", "x", "y", F.to_json(feature).alias("feature"))


def hll_tile_pyramid(pois: DataFrame, key_col: str,
                     min_zoom: int = MIN_ZOOM, max_zoom: int = MAX_ZOOM,
                     p: int = 10, seed: int = 7,
                     lon: str = "lon", lat: str = "lat") -> DataFrame:
    """Approximate-distinct ``key_col`` per tile at EVERY zoom from one
    pass: ``(z, x, y, register, rho)`` register tables for the whole
    pyramid.

    The zoom fan-out reuses the bit-shift pyramid key (one native
    max-zoom tile computation, parents by shiftright — no per-zoom
    recompute), and the register build is ONE groupBy shuffle for all
    zooms together. Output is bounded by ``n_tiles * 2^p`` — constant
    per tile regardless of how many rows land in it, which is the
    whole point at 100 TB: the pyramid of sketch tables is the small,
    mergeable artifact you store, and ``max(rho)`` per (coarser tile,
    register) re-aggregates it to any coarser zoom or region without
    touching raw data (the ``hll_merge`` algebra; the nesting identity
    is pinned in tests: parent registers == max over children).

    Estimates per tile come from ``sketch.hll_estimate_grouped`` over
    ``["z", "x", "y"]`` — kept separate so the exact-integer register
    table stays the contract/oracle surface (estimation involves
    pow/log, which cross-engine oracles can't hash)."""
    from .sketch import hll_build_grouped

    tiled = assign_tile_pyramid(pois, min_zoom, max_zoom, lon, lat)
    return hll_build_grouped(tiled, key_col, ["z", "x", "y"], p=p, seed=seed)
