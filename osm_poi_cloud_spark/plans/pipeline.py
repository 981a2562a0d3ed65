"""End-to-end POI pipeline: pages -> classified, cell/tile-encoded POIs.

The Spark re-expression of the reference's five-stage Batch pipeline
(download -> shard -> process -> merge -> tiles,
``pulumi/statemachine.json:4-184``) as ONE declarative plan:

    read pages (columns pruned to url/html, lang filter pushed to scan)
      -> extract entities        (mapInPandas, Arrow batches)
      -> NULL-rejection filter   (reference process.py:214)
      -> ordered CASE classify   (reference process.py:220-275, codegen'd)
      -> class IS NOT NULL       (reference process.py:298)
      -> S2 cell + z/x/y tile + bucket keys (one pandas UDF + native exprs)
      -> repartition by cell     (explicit shuffle placement, skew-aware)
      -> write POI table partitioned for pruning

Stage boundaries the reference realizes as S3 round-trips + Batch jobs
are just Catalyst stages here; its Map-state fan-out (50 containers) is
task parallelism; its shard manifest is the quadtree planner's output
(operators/quadtree.py) used for repartitioning instead of job specs.

Scale notes (100 TB input):
* `pages.html` never crosses a shuffle — extraction happens map-side in
  the scan stage and only the ~100-byte entity rows shuffle.
* The POI table is written partitioned by `lon_bucket` (identity
  partition, reference process_region.py:265) so the bbox query API
  prunes partitions on both the derived bucket AND parquet min/max.
* Dense city cells are handled by the quadtree/salting planner + AQE
  skew split, not by hoping a hash is uniform.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import extract as fx
from ..functions import tile_math as tm
from ..functions.cell_udfs import (DEFAULT_CELL_LADDER, DEFAULT_CELL_LEVEL,
                                   make_s2_token_udf, with_s2_cells)
from ..functions.classify import PASSTHROUGH_KEYS, TAG_KEYS, class_col

ENTITY_SCHEMA = (
    "url string, entity_idx int, name string, address string, lat double, lon double, "
    + ", ".join(f"{k} string" for k in list(TAG_KEYS) + list(PASSTHROUGH_KEYS))
)

DEFAULT_TILE_ZOOM = 12


def extract_entities(pages: DataFrame, lang: str | None = "en",
                     cell_level: int | None = None,
                     carry_cols: tuple[str, ...] = ()) -> DataFrame:
    """pages -> one row per embedded POI entity.

    Column pruning + the lang filter happen BEFORE the UDF so the
    parquet scan reads only (url, html, lang) and drops foreign-language
    row groups via pushed filters.

    ``cell_level``: if set, the finest S2 cell id is computed INSIDE this
    same UDF (column ``cell_l{level}``). One fused Python stage matters:
    a chained second Python eval (mapInPandas -> pandas_udf) measurably
    ANTI-scales in Spark's local mode (trivial chained UDF: 6s @ 4 cores
    -> 25s @ 16 cores on this box) because every extra Python stage adds
    an Arrow pipe per task; fusing keeps the whole Python cost to one
    round-trip and the stage embarrassingly parallel.
    """
    src = pages
    if lang is not None:
        src = src.filter(F.col("lang") == lang)
    src = src.select("url", "html", *carry_cols)

    cols = ["name", "address", "lat", "lon", *TAG_KEYS, *PASSTHROUGH_KEYS]
    schema = ENTITY_SCHEMA
    if carry_cols:
        carry_schema = ", ".join(
            f"{f.name} {f.dataType.simpleString()}" for f in pages.schema if f.name in carry_cols
        )
        schema = schema + ", " + carry_schema
    if cell_level is not None:
        schema = schema + f", cell_l{cell_level} bigint"

    def batches(it):
        import numpy as np
        import pandas as pd

        from ..functions import s2_cell as s2

        for pdf in it:
            carry = pdf[list(carry_cols)] if carry_cols else None
            out = fx.extract_entities_frame(pdf["url"], pdf["html"], carry=carry)
            out = out[["url", "entity_idx", *cols, *carry_cols]]
            if cell_level is not None:
                lat = out["lat"].to_numpy(np.float64)
                lon = out["lon"].to_numpy(np.float64)
                ok = np.isfinite(lat) & np.isfinite(lon)
                cells = np.zeros(len(out), dtype=np.int64)
                if ok.any():
                    cells[ok] = s2.latlng_to_cell_id(lat[ok], lon[ok], cell_level).view(np.int64)
                col = pd.array(cells, dtype="Int64")
                col[~ok] = pd.NA
                out[f"cell_l{cell_level}"] = col
            yield out

    return src.mapInPandas(batches, schema=schema)


def classify_entities(entities: DataFrame) -> DataFrame:
    """NULL-rejection + ordered CASE classification (pure expressions)."""
    return (
        entities
        # reference process.py:214-215: name and geometry must be present
        .filter(F.col("name").isNotNull() & F.col("lat").isNotNull() & F.col("lon").isNotNull())
        .withColumn("class", class_col())
        # reference process.py:298
        .filter(F.col("class").isNotNull())
    )


def encode_pois(
    classified: DataFrame,
    tile_zoom: int = DEFAULT_TILE_ZOOM,
    cell_levels: tuple[int, ...] = DEFAULT_CELL_LADDER,
    with_token: bool = False,
) -> DataFrame:
    """Add S2 cell ids, z/x/y tile key, shard id, bucket pruning keys.

    If the finest cell column already exists (fused into the extraction
    UDF), only the native prefix-truncation levels are added — no second
    Python stage."""
    finest = max(cell_levels)
    if f"cell_l{finest}" in classified.columns:
        df = classified
        for lvl in sorted(set(cell_levels) - {finest}, reverse=True):
            lsb = 1 << (2 * (30 - lvl))
            df = df.withColumn(f"cell_l{lvl}", F.expr(f"(cell_l{finest} & -{lsb}L) | {lsb}L"))
    else:
        df = with_s2_cells(classified, "lat", "lon", cell_levels)
    x, y = tm.tile_cols("lon", "lat", tile_zoom)
    df = (
        df.withColumn("tile_z", F.lit(tile_zoom))
        .withColumn("tile_x", x)
        .withColumn("tile_y", y)
        .withColumn("shard_id", tm.shard_id_col(F.col("tile_z"), F.col("tile_x"), F.col("tile_y")))
        .withColumn("lon_bucket", F.expr(tm.sql_lon_bucket("lon")))
        .withColumn("lat_bucket", F.expr(tm.sql_lon_bucket("lat")))
    )
    if with_token:
        df = df.withColumn(
            f"cell_l{max(cell_levels)}_token", make_s2_token_udf()(F.col(f"cell_l{max(cell_levels)}"))
        )
    return df


def build_pois(
    pages: DataFrame,
    lang: str | None = "en",
    tile_zoom: int = DEFAULT_TILE_ZOOM,
    cell_levels: tuple[int, ...] = DEFAULT_CELL_LADDER,
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Full pages -> POIs plan. Output schema mirrors the reference POI
    row (process.py:278-297) with S2 cells in place of h3_r columns and
    (url, entity_idx)-derived ids in place of osm ids."""
    entities = extract_entities(pages, lang, cell_level=max(cell_levels), carry_cols=carry_cols)
    pois = encode_pois(classify_entities(entities), tile_zoom, cell_levels)
    return pois.withColumn("poi_id", F.concat_ws("#", F.col("url"), F.col("entity_idx").cast("string")))


def write_pois(pois: DataFrame, path: str, cell_level: int = DEFAULT_CELL_LEVEL) -> None:
    """POI sink: ``repartitionByRange`` on the cell id (north rule —
    explicit shuffle placement; range partitioning keeps spatially
    adjacent cells in the same files, so cell-range scans and later
    per-cell ops touch few partitions), cell-sorted within files for
    tight parquet min/max stats, directory-partitioned on lon_bucket for
    bbox pruning (reference create_table.sql:28-29,
    lambda_handler.py:144-153)."""
    (
        pois.repartitionByRange(F.col(f"cell_l{cell_level}"))
        .sortWithinPartitions(f"cell_l{cell_level}", "tile_x", "tile_y")
        .write.mode("overwrite")
        .partitionBy("lon_bucket")
        .parquet(path, compression="snappy")
    )
