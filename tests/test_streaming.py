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


def test_session_window_stream_matches_batch(spark, tmp_path):
    """Streaming sessionization == the batch session_window plan (which
    the contract oracle-checks against an independent islands SQL)."""
    import datetime as dt

    base = dt.datetime(2026, 1, 1)
    rows = []
    for u in range(5):
        t0 = base + dt.timedelta(hours=u)
        # burst of 3 events 10 min apart, a 8-hour gap, burst of 2
        rows += [(u, t0 + dt.timedelta(minutes=10 * k), 1.0) for k in range(3)]
        rows += [(u, t0 + dt.timedelta(hours=8, minutes=5 * k), 1.0) for k in range(2)]
    schema = "user_id long, ts timestamp, value double"
    events_dir = str(tmp_path / "events")
    df = spark.createDataFrame(rows, schema)
    df.write.parquet(events_dir)

    import pyspark.sql.functions as F

    stream = spark.readStream.schema(schema).parquet(events_dir)
    q = (
        ing.session_stats_stream(stream, gap="6 hours")
        .writeStream.format("memory").queryName("sess_c")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM sess_c").toPandas().sort_values(
        ["user_id", "session_start"]).reset_index(drop=True)

    batch = (
        df.groupBy(F.session_window("ts", "6 hours").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select("user_id", F.col("w.start").alias("session_start"),
                F.col("w.end").alias("session_end"), "n_events")
        .toPandas().sort_values(["user_id", "session_start"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, batch)
    assert len(got) == 10  # two sessions per user
    assert sorted(got["n_events"].tolist()) == [2] * 5 + [3] * 5


def test_tile_counts_stream_matches_batch(spark, tmp_path):
    """Streaming tile-count pyramid == the batch pyramid aggregation."""
    import numpy as np

    import pyspark.sql.functions as F

    rng = np.random.RandomState(41)
    pdf = pd.DataFrame({
        "poi_id": [f"p{i}" for i in range(500)],
        "lon": rng.uniform(-170, 170, 500),
        "lat": rng.uniform(-80, 80, 500),
    })
    pois_dir = str(tmp_path / "pois_stream")
    df = spark.createDataFrame(pdf)
    df.write.parquet(pois_dir)

    stream = spark.readStream.schema("poi_id string, lon double, lat double").parquet(pois_dir)
    q = (
        ing.tile_counts_stream(stream, 2, 6)
        .writeStream.format("memory").queryName("tiles_c")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM tiles_c").toPandas().sort_values(["z", "x", "y"]).reset_index(drop=True)

    from osm_poi_cloud_spark.operators.tiling import assign_tile_pyramid

    batch = (
        assign_tile_pyramid(df, 2, 6).groupBy("z", "x", "y").agg(F.count(F.lit(1)).alias("n"))
        .toPandas().sort_values(["z", "x", "y"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, batch)
    assert got[got["z"] == 2]["n"].sum() == 500


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


def test_curation_stream_matches_batch(spark, tmp_path):
    """Streaming curation cascade == batch curation on the same input:
    identical surviving clean-text set (stream dedup keeps first-seen,
    batch keeps min-id — same duplicate classes either way)."""
    from pyspark.sql import functions as F

    from osm_poi_cloud_spark.plans.curation import curate_documents

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    src = str(tmp_path / "docs_in")
    docs.repartition(4).write.parquet(src)

    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    stream = ing.curated_documents_stream(ing.read_documents_stream(spark, src, 1))
    q = (stream.select("doc_id", "lang_detected", "clean_fp")
         .writeStream.format("parquet").option("path", out_dir)
         .option("checkpointLocation", ckpt)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)

    got = spark.read.parquet(out_dir).toPandas()
    exp = (curate_documents(docs.select("doc_id", "text"))
           .select("doc_id", F.md5("text_clean").alias("clean_fp")).toPandas())
    assert len(got) == len(exp) > 0
    assert sorted(got["clean_fp"]) == sorted(exp["clean_fp"])
    assert (got["lang_detected"] == "en").all()


def test_applyinpandaswithstate_first_seen(spark, tmp_path):
    """Custom-state first-occurrence filter: duplicate keys across
    SEPARATE micro-batches (maxFilesPerTrigger=1) must be suppressed by
    the persisted hash-group state, and the emitted key set must equal
    the batch distinct."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T
    from osm_poi_cloud_spark.streaming import stateful as st

    src = str(tmp_path / "keys")
    out = str(tmp_path / "fs_out")
    ckpt = str(tmp_path / "fs_ckpt")
    # three files with heavy cross-file overlap
    for lo, hi in ((0, 60), (30, 90), (0, 120)):
        pdf = pd.DataFrame({"url": [f"https://h{i%7}.org/p/{i}" for i in range(lo, hi)]})
        spark.createDataFrame(pdf).coalesce(1).write.mode("append").parquet(src)

    stream = (spark.readStream.schema(T.StructType([T.StructField("url", T.StringType())]))
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = (st.first_seen_keys_stream(stream, "url", n_groups=8)
         .writeStream.format("parquet").option("path", out)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.read.parquet(out).toPandas()["url"]
    assert got.is_unique  # cross-batch dedup actually happened
    exp = {f"https://h{i%7}.org/p/{i}" for i in range(0, 120)}
    assert set(got) == exp


def test_applyinpandaswithstate_host_stats_parity(spark, tmp_path):
    """Running per-host stats: the LAST emission per host equals the
    batch groupBy over the full input (stream==batch oracle)."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T
    from osm_poi_cloud_spark.streaming import stateful as st

    src = str(tmp_path / "hs_src")
    out = str(tmp_path / "hs_out")
    ckpt = str(tmp_path / "hs_ckpt")
    for lo, hi in ((0, 80), (80, 200)):
        pdf = pd.DataFrame({
            "url": [f"https://host{i%5}.example/p/{i}" for i in range(lo, hi)],
            "n_chars": [100 + i for i in range(lo, hi)],
        })
        spark.createDataFrame(pdf).coalesce(1).write.mode("append").parquet(src)

    schema = T.StructType([T.StructField("url", T.StringType()),
                           T.StructField("n_chars", T.LongType())])
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    rows = []

    def sink(batch_df, batch_id):
        rows.append(batch_df.toPandas())

    q = (st.host_stats_stream(stream, "url", size_col="n_chars")
         .writeStream.outputMode("update").foreachBatch(sink)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    emitted = pd.concat(rows, ignore_index=True)
    final = emitted.groupby("host").last()  # last emission per host
    batch = (spark.read.parquet(src)
             .select(F.parse_url("url", F.lit("HOST")).alias("host"),
                     F.col("n_chars"))
             .groupBy("host")
             .agg(F.count(F.lit(1)).alias("n_pages"), F.sum("n_chars").alias("n_bytes"))
             .toPandas().set_index("host"))
    assert sorted(final.index) == sorted(batch.index)
    for h in batch.index:
        assert final.loc[h, "n_pages"] == batch.loc[h, "n_pages"], h
        assert final.loc[h, "n_bytes"] == batch.loc[h, "n_bytes"], h


def test_trajectory_stream_matches_batch(spark, tmp_path):
    """Online trajectory stepping across micro-batches: feeding
    time-ordered files one per trigger must reproduce the batch
    operator's steps bit-for-bit (state carries the last point over
    the batch boundary)."""
    import datetime as dt

    from pyspark.sql import functions as F
    from pyspark.sql import types as T
    from osm_poi_cloud_spark.operators import trajectory as tj
    from osm_poi_cloud_spark.streaming import stateful as st

    t0 = dt.datetime(2024, 1, 1)
    rows = [(i % 5, i, t0 + dt.timedelta(seconds=i),
             float((i * 37) % 101) / 3.0, float((i * 57) % 83) / 7.0)
            for i in range(120)]
    schema = ("user_id long, event_id long, ts timestamp, "
              "x double, y double")
    batch_df = spark.createDataFrame(rows, schema)

    src = str(tmp_path / "traj_src")
    out = str(tmp_path / "traj_out")
    ckpt = str(tmp_path / "traj_ckpt")
    # three time-ordered files -> three micro-batches
    for lo, hi in ((0, 40), (40, 80), (80, 120)):
        (spark.createDataFrame(rows[lo:hi], schema)
         .coalesce(1).write.mode("append").parquet(src))

    sschema = T.StructType([
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("x", T.DoubleType()),
        T.StructField("y", T.DoubleType()),
    ])
    stream = (spark.readStream.schema(sschema)
              .option("maxFilesPerTrigger", 1).parquet(src)
              .select("user_id", "event_id",
                      F.unix_micros(F.col("ts")).alias("ts_us"), "x", "y"))
    q = (st.trajectory_stream(stream, max_speed_mm_s=100)
         .writeStream.format("parquet").option("path", out)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    got = (spark.read.parquet(out).toPandas()
           .sort_values("event_id").reset_index(drop=True))
    exp = (tj.trajectory_steps(batch_df, order_cols=("event_id",),
                               max_speed_mm_s=100)
           .select("event_id", "ts_us", "dt_us", "step_mm", "teleport")
           .toPandas().sort_values("event_id").reset_index(drop=True))
    assert len(got) == 120
    for col in ("ts_us", "dt_us", "step_mm", "teleport"):
        ga = got[col].astype(object).where(got[col].notna(), None).tolist()
        ea = exp[col].astype(object).where(exp[col].notna(), None).tolist()
        assert ga == ea, col


def test_histogram_stream_matches_batch(spark, tmp_path):
    """Streaming histogram maintenance == batch hist_build: the bin
    rule is a map-only expression, so the streaming form is just the
    same groupBy in complete mode — per-micro-batch increments merge
    by the sketch's own addition algebra."""
    import pyspark.sql.functions as F

    from osm_poi_cloud_spark.operators.sketch import hist_build

    pdf = pd.DataFrame({"v": [float((i * i) % 997) for i in range(4000)]})
    src = str(tmp_path / "hist_stream")
    df = spark.createDataFrame(pdf)
    df.repartition(4).write.parquet(src)

    stream = spark.readStream.schema("v double").parquet(src)
    q = (
        hist_build(stream, "v", 0.0, 1000.0, 64)
        .writeStream.format("memory").queryName("hist_c")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = (spark.sql("SELECT * FROM hist_c").toPandas()
           .sort_values("bin").reset_index(drop=True))
    batch = (hist_build(df, "v", 0.0, 1000.0, 64).toPandas()
             .sort_values("bin").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, batch)
    assert int(got["cnt"].sum()) == 4000


def test_tile_delta_stream_matches_batch_merge(spark, tmp_path):
    """Streaming tile maintenance: snapshot-diff delta rows arrive as an
    append stream; the running per-tile sum in complete mode equals the
    batch merge_tile_counts fold (the delta algebra is associative and
    commutative, so micro-batch boundaries can't change the result)."""
    import pyspark.sql.functions as F

    from osm_poi_cloud_spark.operators import tiling as tl

    old = spark.range(300).selectExpr(
        "id AS poi_id",
        "CAST((id * 7919) % 36000 AS DOUBLE) / 100.0 - 180.0 AS lon",
        "CAST((id * 104729) % 17000 AS DOUBLE) / 100.0 - 85.0 AS lat")
    new = spark.range(300).filter("id % 5 <> 0").selectExpr(
        "id AS poi_id",
        "CASE WHEN id % 3 = 0 THEN CAST((id * 31337) % 36000 AS DOUBLE) / 100.0 - 180.0 "
        "ELSE CAST((id * 7919) % 36000 AS DOUBLE) / 100.0 - 180.0 END AS lon",
        "CAST((id * 104729) % 17000 AS DOUBLE) / 100.0 - 85.0 AS lat")
    base = (tl.assign_tile_pyramid(old, 2, 7).groupBy("z", "x", "y")
            .agg(F.count(F.lit(1)).alias("n")))

    deltas = tl.tile_count_deltas(old, new, min_zoom=2, max_zoom=7)
    src = str(tmp_path / "tile_deltas")
    deltas.repartition(4).write.parquet(src)

    stream = spark.readStream.schema("z int, x long, y long, delta long").parquet(src)
    q = (
        stream.groupBy("z", "x", "y").agg(F.sum("delta").alias("delta"))
        .writeStream.format("memory").queryName("tile_deltas_c")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    streamed = spark.sql(
        "SELECT * FROM tile_deltas_c WHERE delta <> 0")
    got = (tl.merge_tile_counts(base, streamed).toPandas()
           .sort_values(["z", "x", "y"]).reset_index(drop=True))
    exp = (tl.merge_tile_counts(base, deltas).toPandas()
           .sort_values(["z", "x", "y"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, exp)
    # and both equal the from-scratch rebuild
    rebuilt = (tl.assign_tile_pyramid(new, 2, 7).groupBy("z", "x", "y")
               .agg(F.count(F.lit(1)).alias("n")).toPandas()
               .sort_values(["z", "x", "y"]).reset_index(drop=True))
    got["n"] = got["n"].astype("int64")
    rebuilt["n"] = rebuilt["n"].astype("int64")
    pd.testing.assert_frame_equal(got, rebuilt)
