"""End-to-end pages -> POIs plan + query API semantics."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from osm_poi_cloud_spark.functions import extract as fx
from osm_poi_cloud_spark.functions import s2_cell as s2
from osm_poi_cloud_spark.functions import tile_math as tm
from osm_poi_cloud_spark.functions.classify import classify_tags
from osm_poi_cloud_spark.plans import pipeline as pl
from osm_poi_cloud_spark.plans import query_api as qa
from osm_poi_cloud_spark.sources import pages as pg

N_PAGES = 600


@pytest.fixture(scope="module")
def pages(spark):
    return pg.pages_df(spark, N_PAGES, partitions=4).cache()


@pytest.fixture(scope="module")
def pois(spark, pages):
    return pl.build_pois(pages, lang="en", tile_zoom=12, cell_levels=(8, 12)).cache()


def _oracle_pois() -> pd.DataFrame:
    """Driver-side pure-pandas recomputation of the whole pipeline."""
    pdf = pg.synthesize_pages_pdf(0, N_PAGES)
    pdf = pdf[pdf["lang"] == "en"]
    ents = fx.extract_entities_frame(pdf["url"], pdf["html"])
    ents = ents[ents["name"].notna() & ents["lat"].notna() & ents["lon"].notna()].copy()
    tag_cols = [c for c in fx.ENTITY_COLUMNS if c not in ("name", "lat", "lon")]
    ents["class"] = [
        classify_tags({k: (v if isinstance(v, str) else None) for k, v in r.items()})
        for r in ents[tag_cols].to_dict("records")
    ]
    ents = ents[ents["class"].notna()].copy()
    x, y = tm.lon_lat_to_tile(ents["lon"].to_numpy(), ents["lat"].to_numpy(), 12)
    ents["tile_x"], ents["tile_y"] = x, y
    ents["cell_l12"] = s2.latlng_to_cell_id(ents["lat"].to_numpy(), ents["lon"].to_numpy(), 12).view(np.int64)
    ents["poi_id"] = ents["url"] + "#" + ents["entity_idx"].astype(str)
    return ents


def test_pipeline_matches_driver_oracle(pois):
    got = (
        pois.select("poi_id", "name", "class", "lat", "lon", "tile_x", "tile_y", "cell_l12")
        .toPandas()
        .sort_values("poi_id")
        .reset_index(drop=True)
    )
    exp = (
        _oracle_pois()[["poi_id", "name", "class", "lat", "lon", "tile_x", "tile_y", "cell_l12"]]
        .sort_values("poi_id")
        .reset_index(drop=True)
    )
    assert len(got) == len(exp) and len(got) > 100
    # exact: ids, classes, tile assignment, cell ids; floats bit-equal
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_multilevel_cells_consistent(pois):
    sample = pois.select("cell_l8", "cell_l12", "lat", "lon").limit(200).toPandas()
    expect8 = s2.cell_parent(sample["cell_l12"].to_numpy(np.int64).view(np.uint64), 8).view(np.int64)
    assert (sample["cell_l8"].to_numpy() == expect8).all()


def test_bbox_query_and_bucket_pruning(spark, pois, tmp_path):
    path = str(tmp_path / "pois")
    pl.write_pois(pois, path)
    stored = spark.read.parquet(path)

    # NYC window (city 0 = hot cell)
    res = qa.pois_in_bbox(stored, -74.1, 40.6, -73.9, 40.8, limit=10000).toPandas()
    assert len(res) > 0
    assert res["lon"].between(-74.1, -73.9).all()
    assert res["lat"].between(40.6, 40.8).all()

    plan = qa.pois_in_bbox(stored, -74.1, 40.6, -73.9, 40.8)._jdf.queryExecution().executedPlan().toString()
    assert "lon_bucket" in plan  # partition-pruning predicate reached the scan

    with pytest.raises(ValueError):
        qa.validate_bbox(-74.0, 40.0, -60.0, 41.0)  # >5 degree span
    with pytest.raises(ValueError):
        qa.validate_bbox(10.0, 40.0, 5.0, 41.0)


def test_pois_in_cell_range_scan(spark, pois):
    """Hierarchical cell lookup: the ancestor-cell range predicate returns
    exactly the rows whose stored l12 cell descends from it."""
    from osm_poi_cloud_spark.functions import s2_cell as s2

    pdf = pois.select("poi_id", "cell_l12").toPandas()
    ids = pdf["cell_l12"].to_numpy("int64").view(np.uint64)
    parent8 = s2.cell_parent(ids, 8).view(np.int64)
    # densest level-8 cell (a city center)
    target = pd.Series(parent8).mode()[0]
    exp = set(pdf.loc[parent8 == target, "poi_id"])
    got = set(
        r["poi_id"]
        for r in qa.pois_in_cell(pois, int(target)).select("poi_id").collect()
    )
    assert got == exp and len(got) > 5


def test_class_histogram(pois):
    hist = qa.class_histogram(pois).toPandas()
    assert (hist["count"] > 0).all()
    assert hist["count"].is_monotonic_decreasing
    assert hist["count"].sum() == pois.count()


def test_geojson_projection(pois):
    feats = qa.to_geojson(pois.limit(5)).toPandas()["feature"]
    import json

    f = json.loads(feats[0])
    assert f["type"] == "Feature"
    assert f["geometry"]["type"] == "Point"
    assert len(f["geometry"]["coordinates"]) == 2
    assert "name" in f["properties"] and "class" in f["properties"]
    assert all(v is not None for v in f["properties"].values())  # nulls pruned


def test_extraction_stage_prunes_columns(spark, pages, tmp_path):
    """Against a parquet-backed pages table, the scan under the extract
    UDF must read only url/html (+pushed lang filter) — never text or
    warc_ts (100 TB scan discipline)."""
    path = str(tmp_path / "pages_pq")
    pages.write.mode("overwrite").parquet(path)
    stored = spark.read.parquet(path)
    plan = pl.extract_entities(stored, lang="en")._jdf.queryExecution().executedPlan().toString()
    scan_line = [l for l in plan.splitlines() if "ReadSchema" in l or "FileScan" in l]
    scan = " ".join(scan_line)
    assert "url" in scan and "html" in scan
    assert "text" not in scan and "warc_ts" not in scan
    assert "PushedFilters" in scan and "lang" in scan.split("PushedFilters")[1][:200]


def test_viewport_tile_range_and_query(spark):
    # range agrees with the P9 kernel, y inverted, inclusive ends
    x_lo, x_hi, y_lo, y_hi = qa.viewport_tile_range(-2.0, -2.0, 1.0, 1.0, 10)
    ex_lo, ey_lo = tm.lon_lat_to_tile(-2.0, 1.0, 10)
    ex_hi, ey_hi = tm.lon_lat_to_tile(1.0, -2.0, 10)
    assert (x_lo, x_hi, y_lo, y_hi) == (int(ex_lo), int(ex_hi), int(ey_lo), int(ey_hi))
    assert x_lo <= x_hi and y_lo <= y_hi

    # query returns exactly the tiles whose coordinates fall in range,
    # and the predicates reach the scan (written tile table)
    pts = spark.range(2000).selectExpr(
        "CAST((id * 7919) % 500 AS DOUBLE) / 100.0 - 2.5 AS lon",
        "CAST((id * 104729) % 500 AS DOUBLE) / 100.0 - 2.5 AS lat")
    tx, ty = tm.tile_cols("lon", "lat", 10)
    tiles = (pts.select(tx.alias("x"), ty.alias("y"))
             .withColumn("z", F.lit(10)).groupBy("z", "x", "y").count())
    got = qa.tiles_in_viewport(tiles, -2.0, -2.0, 1.0, 1.0, zoom=10).toPandas()
    assert len(got) > 10
    assert got["x"].between(x_lo, x_hi).all()
    assert got["y"].between(y_lo, y_hi).all()
    # complement check: no in-range tile was dropped
    allt = tiles.toPandas()
    inrange = allt[(allt.x.between(x_lo, x_hi)) & (allt.y.between(y_lo, y_hi))]
    assert len(inrange) == len(got)

    with pytest.raises(ValueError):
        qa.tiles_in_viewport(tiles, -2.0, -2.0, 1.0, 1.0, zoom=22)  # > max_tiles
    with pytest.raises(ValueError):
        qa.viewport_tile_range(-2.0, -2.0, 1.0, 1.0, 23)
    with pytest.raises(ValueError):
        qa.viewport_tile_range(-60.0, -2.0, 1.0, 1.0, 10)  # bbox cap


def test_viewport_filter_reaches_scan(spark, tmp_path):
    pts = spark.range(500).selectExpr(
        "CAST((id * 7919) % 500 AS DOUBLE) / 100.0 - 2.5 AS lon",
        "CAST((id * 104729) % 500 AS DOUBLE) / 100.0 - 2.5 AS lat")
    tx, ty = tm.tile_cols("lon", "lat", 10)
    tiles = (pts.select(tx.alias("x"), ty.alias("y"))
             .withColumn("z", F.lit(10)).groupBy("z", "x", "y").count())
    path = str(tmp_path / "tiles")
    tiles.write.partitionBy("z").parquet(path)
    stored = spark.read.parquet(path)
    q = qa.tiles_in_viewport(stored, -2.0, -2.0, 1.0, 1.0, zoom=10)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "PartitionFilters" in plan
    assert q.count() > 0
