"""Structured-Streaming ingest: incremental equivalence with the batch
plan + exactly-once resume via the checkpoint."""

import os

import pandas as pd

from osm_poi_cloud_spark.plans import pipeline as pl
from osm_poi_cloud_spark.sources import pages as pg
from osm_poi_cloud_spark.streaming import ingest as ing


def _write_batch(spark, pages_dir, start, end, name):
    pdf = pg.synthesize_pages_pdf(start, end)
    spark.createDataFrame(pdf).coalesce(1).write.mode("append").parquet(pages_dir)


def test_incremental_stream_matches_batch(spark, tmp_path):
    pages_dir = str(tmp_path / "pages")
    out_dir = str(tmp_path / "pois")
    ckpt = str(tmp_path / "ckpt")

    # first segment arrives
    _write_batch(spark, pages_dir, 0, 150, "a")
    ing.run_available_now(spark, pages_dir, out_dir, ckpt)
    n1 = spark.read.parquet(out_dir).count()
    assert n1 > 0

    # second segment arrives; rerun processes ONLY the new files
    _write_batch(spark, pages_dir, 150, 300, "b")
    ing.run_available_now(spark, pages_dir, out_dir, ckpt)

    got = (
        spark.read.parquet(out_dir)
        .select("poi_id", "class", "lat", "lon", "cell_l12", "tile_x", "tile_y")
        .toPandas()
        .sort_values("poi_id")
        .reset_index(drop=True)
    )
    # batch plan over the full corpus
    exp = (
        pl.build_pois(spark.read.parquet(pages_dir), cell_levels=(12,))
        .select("poi_id", "class", "lat", "lon", "cell_l12", "tile_x", "tile_y")
        .toPandas()
        .sort_values("poi_id")
        .reset_index(drop=True)
    )
    assert len(got) == len(exp) > n1
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    # no duplicates: exactly-once sink
    assert got["poi_id"].is_unique


def test_stateful_stream_dedup(spark, tmp_path):
    """Cross-microbatch url dedup via streaming state."""
    pages_dir = str(tmp_path / "pages3")
    out = str(tmp_path / "out3")
    ckpt = str(tmp_path / "ckpt3")
    # same 100 pages land twice (re-crawl) in separate files
    _write_batch(spark, pages_dir, 0, 100, "a")
    _write_batch(spark, pages_dir, 0, 100, "b")

    stream = ing.deduped_pages_stream(ing.read_pages_stream(spark, pages_dir, max_files_per_trigger=1))
    q = (
        stream.select("url").writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(180)
    got = spark.read.parquet(out).toPandas()
    assert len(got) == 100
    assert got["url"].is_unique


def test_windowed_class_stats_stream(spark, tmp_path):
    pages_dir = str(tmp_path / "pages2")
    _write_batch(spark, pages_dir, 0, 200, "a")
    stats = ing.class_stats_stream(ing.read_pages_stream(spark, pages_dir), watermark="2 hours", window="6 hours")
    q = (
        stats.writeStream.format("memory")
        .queryName("class_stats")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # append mode emits only watermark-closed windows; with availableNow a
    # single batch may close nothing — use complete-mode snapshot instead
    q2 = (
        stats.writeStream.format("memory")
        .queryName("class_stats_c")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    out = spark.sql("SELECT * FROM class_stats_c").toPandas()
    assert len(out) > 0
    assert (out["n"] > 0).all()
    assert out["window_start"].notna().all()
