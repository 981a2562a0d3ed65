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


def render_heatmap_tiles(cells: DataFrame, zoom: int, vmax_ppm: int,
                         tile_px: int = 256, x_col: str = "x",
                         y_col: str = "y", value_col: str = "kde_ppm",
                         n_buckets: int = 64) -> DataFrame:
    """Raster heat-map tiles from a fine-cell density field: the
    serving-side counterpart of the vector MVT path (operators/mvt.py)
    — what a slippy map overlays as semi-transparent density PNGs.
    Input is
    a sparse cell table (x, y, value) at fine zoom ``zoom +
    log2(tile_px)`` (e.g. ``kde_grid`` output); each ``tile_px^2``
    block becomes one grayscale PNG via the engine's from-spec encoder
    (functions/png.py).

    Intensity is a FIXED exact-integer quantization —

        px = least(255, value * 255 DIV vmax_ppm)

    — not per-tile normalization, so shades are comparable across
    tiles and every byte is deterministic (``vmax_ppm`` is the "full
    heat" calibration, e.g. a high percentile from ``hist_quantiles``).
    Zero-intensity pixels are dropped natively before the Python
    stage, so empty ocean tiles never materialize at all.

    Returns ``(x, y, n_px, pixel_crc, png)`` at ``zoom`` where
    ``n_px`` counts lit pixels and ``pixel_crc`` is the crc32 of the
    raw canvas (content-pinnable without a second encoder — the
    media_features precedent; the PNG wrapping itself is pinned by the
    codec round-trip suite). Kernel runs per hash BUCKET of whole
    tiles (the hull lesson: never one Python call per tiny group)."""
    import zlib

    shift = (tile_px - 1).bit_length()
    if tile_px != 1 << shift or not 6 <= shift <= 10:
        raise ValueError(f"tile_px must be a power of two in [64, 1024], "
                         f"got {tile_px}")
    if not 0 <= zoom <= 22:
        raise ValueError(f"zoom must be in [0, 22], got {zoom}")
    if vmax_ppm < 1:
        raise ValueError(f"need vmax_ppm >= 1, got {vmax_ppm}")
    # EXACT integer quantization (SQL DIV, never a double division —
    # the value*255 product can exceed 2^53 where float rounding
    # drifts)
    staged = cells.select(
        F.col(x_col).cast("long").alias("_cx"),
        F.col(y_col).cast("long").alias("_cy"),
        (F.col(value_col).cast("long") * F.lit(255)).alias("_v255"))
    lit = staged.select(
        F.shiftright("_cx", shift).alias("tx"),
        F.shiftright("_cy", shift).alias("ty"),
        (F.col("_cx") % F.lit(tile_px)).alias("px"),
        (F.col("_cy") % F.lit(tile_px)).alias("py"),
        F.least(F.lit(255).cast("long"),
                F.expr(f"_v255 DIV {int(vmax_ppm)}"))
        .cast("int").alias("val"),
    ).filter(F.col("val") > 0)

    import numpy as np
    import pandas as pd

    from ..functions.png import encode_png

    def bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        rows = []
        pdf = pdf.sort_values(["tx", "ty", "py", "px"], kind="mergesort")
        txs = pdf["tx"].to_numpy()
        tys = pdf["ty"].to_numpy()
        n = len(pdf)
        if n == 0:
            return pd.DataFrame(columns=["x", "y", "n_px", "pixel_crc",
                                         "png"])
        change = np.zeros(n, dtype=bool)
        change[0] = True
        change[1:] = (txs[1:] != txs[:-1]) | (tys[1:] != tys[:-1])
        starts = np.flatnonzero(change)
        bounds = np.append(starts, n)
        pxs = pdf["px"].to_numpy()
        pys = pdf["py"].to_numpy()
        vals = pdf["val"].to_numpy()
        for i in range(len(starts)):
            s, e = bounds[i], bounds[i + 1]
            canvas = np.zeros((tile_px, tile_px), dtype=np.uint8)
            canvas[pys[s:e], pxs[s:e]] = vals[s:e]
            rows.append((int(txs[s]), int(tys[s]), int(e - s),
                         zlib.crc32(canvas.tobytes()),
                         encode_png(canvas)))
        return pd.DataFrame(rows, columns=["x", "y", "n_px", "pixel_crc",
                                           "png"])

    return (
        lit.withColumn("_b", F.pmod(F.xxhash64("tx", "ty"),
                                    F.lit(n_buckets)))
        .groupBy("_b")
        .applyInPandas(bucket, "x long, y long, n_px long, "
                               "pixel_crc long, png binary")
    )


def tile_count_deltas(old: DataFrame, new: DataFrame,
                      key_col: str = "poi_id",
                      min_zoom: int = MIN_ZOOM, max_zoom: int = MAX_ZOOM,
                      lon: str = "lon", lat: str = "lat") -> DataFrame:
    """Per-tile count deltas between two POI snapshots, at every zoom:
    ``(z, x, y, delta)`` with ``delta != 0``.

    The production shape for a recurring crawl: a daily snapshot
    changes ~1% of a 10^12-row corpus, so re-running the full pyramid
    aggregation to refresh the tile table wastes 99% of the work.
    This operator touches only the CHURN:

    1. one keyed full-outer join old<->new (co-partitioned hash join;
       cost ∝ corpus but map-side — no explode, two slim columns),
    2. deleted / moved-away rows emit ``-1`` at their OLD position,
       inserted / moved-in rows emit ``+1`` at their NEW position
       (attribute-only changes emit nothing — position null-safe
       equality gates both branches),
    3. the +-1 rows fan out through the native bit-shift pyramid
       (|zooms| integer ops per row) and one groupBy sums them —
       output bounded by tiles TOUCHED by churn, not by the corpus.

    NOTE on re-rendering: a tile whose deltas cancel to 0 keeps its
    COUNT but may still have changed MEMBERSHIP (one feature moved
    out, another moved in) — use ``touched_tiles`` for the MVT/PNG
    republish worklist (distinct touched tiles, no cancellation); the
    ``delta != 0`` rows here are exactly what count maintenance needs
    and nothing more. Pinned in tests: an incremental re-render of
    ``touched_tiles`` merged over the old archive is byte-identical to
    a full re-render.

    ``merge_tile_counts`` folds the deltas into the stored tile table;
    the pinned identity (tests + the ``incremental_tiles`` contract
    query) is

        merge(counts(old), deltas(old, new)) == counts(new)  -- rebuilt

    which an independent engine verifies by rebuilding from ``new``.
    """
    tiled = _churn_tiles(old, new, key_col, min_zoom, max_zoom, lon, lat)
    return (
        tiled.groupBy("z", "x", "y")
        .agg(F.sum("delta").alias("delta"))
        .filter(F.col("delta") != 0)
    )


def _churn_tiles(old: DataFrame, new: DataFrame, key_col: str,
                 min_zoom: int, max_zoom: int,
                 lon: str, lat: str) -> DataFrame:
    """±1 churn rows fanned out to pyramid tiles (shared kernel of
    ``tile_count_deltas`` / ``touched_tiles``): one keyed full-outer
    join; deleted / moved-away rows emit -1 at their OLD position,
    inserted / moved-in rows +1 at their NEW one; attribute-only
    changes emit nothing (null-safe position equality)."""
    if not (0 <= min_zoom <= max_zoom <= 22):
        raise ValueError(f"need 0 <= min_zoom <= max_zoom <= 22, got "
                         f"({min_zoom}, {max_zoom})")
    o = old.select(F.col(key_col).alias("_k"),
                   F.col(lon).alias("_olon"), F.col(lat).alias("_olat"),
                   F.lit(True).alias("_oex"))
    n = new.select(F.col(key_col).alias("_k"),
                   F.col(lon).alias("_nlon"), F.col(lat).alias("_nlat"),
                   F.lit(True).alias("_nex"))
    j = o.join(n, "_k", "full_outer")
    same_pos = (F.col("_olon").eqNullSafe(F.col("_nlon"))
                & F.col("_olat").eqNullSafe(F.col("_nlat")))
    # one pass over the joined rows: each emits its -1 and/or +1 churn
    # struct through a single conditional explode — the former
    # two-branch union evaluated the full-outer join twice (once per
    # filter branch), doubling the join work for identical rows
    minus_c = F.when(
        F.col("_oex").isNotNull() & (F.col("_nex").isNull() | ~same_pos),
        F.array(F.struct(F.col("_olon").alias("_lo"),
                         F.col("_olat").alias("_la"),
                         F.lit(-1).cast("long").alias("_d"))),
    ).otherwise(F.array().cast("array<struct<_lo:double,_la:double,_d:bigint>>"))
    plus_c = F.when(
        F.col("_nex").isNotNull() & (F.col("_oex").isNull() | ~same_pos),
        F.array(F.struct(F.col("_nlon").alias("_lo"),
                         F.col("_nlat").alias("_la"),
                         F.lit(1).cast("long").alias("_d"))),
    ).otherwise(F.array().cast("array<struct<_lo:double,_la:double,_d:bigint>>"))
    churn = (
        j.select(F.explode(F.concat(minus_c, plus_c)).alias("_c"))
        .select(F.col("_c._lo").alias(lon), F.col("_c._la").alias(lat),
                F.col("_c._d").alias("delta"))
    )
    return assign_tile_pyramid(churn, min_zoom, max_zoom, lon, lat)


def touched_tiles(old: DataFrame, new: DataFrame,
                  key_col: str = "poi_id",
                  min_zoom: int = MIN_ZOOM, max_zoom: int = MAX_ZOOM,
                  lon: str = "lon", lat: str = "lat") -> DataFrame:
    """The RE-RENDER worklist: distinct ``(z, x, y)`` of every tile any
    churned feature left or entered — the superset of
    ``tile_count_deltas``'s nonzero rows that also covers count-neutral
    membership changes (a feature moved out while another moved in:
    delta 0, bytes stale). Re-rendering exactly these tiles from the
    new snapshot and keeping every other tile's bytes is byte-identical
    to a full re-render (test-pinned)."""
    return (_churn_tiles(old, new, key_col, min_zoom, max_zoom, lon, lat)
            .select("z", "x", "y").distinct())


def merge_tile_counts(base: DataFrame, deltas: DataFrame,
                      n_col: str = "n") -> DataFrame:
    """Fold ``tile_count_deltas`` output into a stored per-tile count
    table: ``n = coalesce(base.n, 0) + coalesce(delta, 0)``, tiles
    reaching 0 dropped (a tile whose last feature left disappears,
    exactly as a rebuild would never emit it).

    One full-outer join on (z, x, y). At warehouse scale store the
    tile table bucketed by (z, x, y) (config.py warehouse dir) so the
    base side arrives exchange-free and only the (small) delta side
    shuffles; the join is never wider than base + touched tiles."""
    d = deltas.select("z", "x", "y", F.col("delta").alias("_d"))
    j = base.join(d, ["z", "x", "y"], "full_outer")
    out = (F.coalesce(F.col(n_col), F.lit(0)).cast("long")
           + F.coalesce(F.col("_d"), F.lit(0))).alias(n_col)
    return (
        j.select("z", "x", "y", out)
        .filter(F.col(n_col) > 0)
    )


def incremental_tile_counts(base: DataFrame, old: DataFrame, new: DataFrame,
                            key_col: str = "poi_id",
                            min_zoom: int = MIN_ZOOM,
                            max_zoom: int = MAX_ZOOM,
                            lon: str = "lon", lat: str = "lat",
                            n_col: str = "n") -> DataFrame:
    """Refresh a stored tile-count table from a new POI snapshot by
    touching only the churn: ``merge_tile_counts(base,
    tile_count_deltas(old, new))``. See both for the scale contract;
    the result is row-identical to rebuilding from ``new``."""
    deltas = tile_count_deltas(old, new, key_col, min_zoom, max_zoom,
                               lon, lat)
    return merge_tile_counts(base, deltas, n_col)
