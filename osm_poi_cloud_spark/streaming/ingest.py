"""Structured-Streaming ingest: incremental pages -> POIs.

The reference is pure batch (SURVEY §2 "Streaming" row) — re-runs are
manual re-executions keyed by run_id. A web-scale crawl, though, is an
arriving stream of WARC segments; this module runs the SAME pipeline
plan incrementally:

    readStream(pages dir, imposed schema) -> extract/classify/encode
    (identical code to the batch plan — one fused Python stage, then
    native exprs) -> writeStream partitioned parquet with exactly-once
    file-sink semantics via the checkpoint dir.

Spark's file-sink commit log gives resume-without-recompute for free
here; the batch path's lineage table (plans/lineage.py) remains the
cross-run audit trail. A per-microbatch stats stream (counts by class)
demonstrates stateful streaming aggregation with watermarks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..plans import pipeline as pl

PAGES_STRUCT = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("warc_ts", T.TimestampType()),
    T.StructField("html", T.BinaryType()),
    T.StructField("text", T.StringType()),
    T.StructField("lang", T.StringType()),
])


def read_pages_stream(spark: SparkSession, pages_dir: str,
                      max_files_per_trigger: int = 8) -> DataFrame:
    """File-source stream over a growing directory of pages parquet."""
    return (
        spark.readStream.schema(PAGES_STRUCT)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(pages_dir)
    )


def pois_stream(pages_stream: DataFrame, lang: str | None = "en",
                tile_zoom: int = pl.DEFAULT_TILE_ZOOM,
                cell_levels: tuple[int, ...] = (12,)) -> DataFrame:
    """The batch plan applied to a streaming DataFrame — mapInPandas and
    all native stages are streaming-compatible as stateless transforms."""
    return pl.build_pois(pages_stream, lang=lang, tile_zoom=tile_zoom, cell_levels=cell_levels)


def start_pois_sink(pois: DataFrame, out_dir: str, checkpoint_dir: str,
                    trigger_available_now: bool = True):
    """Exactly-once parquet sink (file-sink commit log in checkpoint)."""
    w = (
        pois.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def class_stats_stream(pages_stream: DataFrame, watermark: str = "1 hour",
                       window: str = "1 hour") -> DataFrame:
    """Windowed per-class POI counts over crawl time with late-data
    handling — watermarked event-time aggregation (the streaming analog
    of the /classes histogram)."""
    pois = pl.build_pois(pages_stream, cell_levels=(12,), carry_cols=("warc_ts",))
    return (
        pois.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("w"), F.col("class"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "class", "n")
    )


def session_stats_stream(events_stream: DataFrame, gap: str = "6 hours",
                         watermark: str = "1 day", ts_col: str = "ts",
                         key_col: str = "user_id") -> DataFrame:
    """Stateful streaming sessionization: Spark's native session_window
    with a gap timeout; a session closes (and is emitted in append mode)
    once the watermark passes last_event + gap. The batch form of this
    exact plan is oracle-checked against an independent gaps-and-islands
    SQL in the driver contract (``sessionization``)."""
    return (
        events_stream.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("w"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            key_col,
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def tile_counts_stream(pois_stream: DataFrame, min_zoom: int = 2, max_zoom: int = 8) -> DataFrame:
    """Continuously maintained tile-count pyramid: the streaming form of
    the batch pyramid aggregation (tiling.assign_tile_pyramid is pure
    native expressions, so it applies to a stream unchanged). Run in
    update/complete mode — tile counts are keyed state, not event-time
    windows, so freshness is per-microbatch."""
    from ..operators.tiling import assign_tile_pyramid

    tiled = assign_tile_pyramid(pois_stream, min_zoom, max_zoom)
    return tiled.groupBy("z", "x", "y").agg(F.count(F.lit(1)).alias("n"))


def deduped_pages_stream(pages_stream: DataFrame, watermark: str = "24 hours") -> DataFrame:
    """Stateful streaming dedup: drop re-crawls of a url already seen
    within the watermark horizon. Uses ``dropDuplicatesWithinWatermark``
    — plain ``dropDuplicates(["url"])`` would ignore the watermark
    (unbounded state, and re-crawls dropped forever); the WithinWatermark
    form both bounds the state store and scopes the dedup horizon."""
    return pages_stream.withWatermark("warc_ts", watermark).dropDuplicatesWithinWatermark(["url"])


def run_available_now(spark: SparkSession, pages_dir: str, out_dir: str,
                      checkpoint_dir: str, timeout_sec: int = 300) -> None:
    """Drain everything currently in pages_dir and stop (incremental:
    a second call after new files land processes only the new files)."""
    stream = pois_stream(read_pages_stream(spark, pages_dir))
    q = start_pois_sink(stream, out_dir, checkpoint_dir, trigger_available_now=True)
    q.awaitTermination(timeout_sec)
    if q.isActive:
        q.stop()

DOCS_STRUCT = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("text", T.StringType()),
    T.StructField("lang", T.StringType()),
    T.StructField("source", T.StringType()),
    T.StructField("n_chars", T.LongType()),
])


def read_documents_stream(spark: SparkSession, docs_dir: str,
                          max_files_per_trigger: int = 8) -> DataFrame:
    """File-source stream over a growing documents directory."""
    return (
        spark.readStream.schema(DOCS_STRUCT)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(docs_dir)
    )


def curated_documents_stream(docs_stream: DataFrame,
                             keep_langs: tuple[str, ...] = ("en",),
                             min_quality: float = 0.4,
                             max_dup_word_frac: float = 0.4,
                             max_dup_line_frac: float = 0.5,
                             min_tokens: int = 5) -> DataFrame:
    """The curation cascade (plans/curation.py) on a stream: every
    filter is a stateless native expression, so the batch plan IS the
    streaming plan. Exact dedup becomes stateful
    ``dropDuplicates(clean_fp)`` — which keeps the FIRST-seen member of
    each duplicate set (arrival order) where the batch pipeline keeps
    min doc_id; the surviving clean-text SET is identical (tested).
    State note: the fingerprint store grows with distinct texts — at a
    continuous 100 TB ingest, bound it with a watermark on an event
    time (as ``deduped_pages_stream`` does) or run availableNow
    backfills between batch compactions."""
    from ..functions.text_analysis import (
        lang_id_col, quality_features, repetition_features, scrub_pii_col)

    out = docs_stream.filter(F.length("text") > 0)
    out = quality_features(out)
    out = repetition_features(out)
    out = out.withColumn("lang_detected", lang_id_col(F.col("text")))
    out = out.filter(
        F.col("lang_detected").isin(*keep_langs)
        & (F.col("n_tokens") >= min_tokens)
        & (F.col("quality_score") >= min_quality)
        & (F.col("dup_word_frac") <= max_dup_word_frac)
        & (F.col("dup_line_frac") <= max_dup_line_frac)
    )
    out = out.withColumn("text_clean", scrub_pii_col(F.col("text")))
    out = out.withColumn("clean_fp", F.md5("text_clean"))
    return out.dropDuplicates(["clean_fp"])

