"""Trajectory reconstruction and cleaning over timestamped point
streams (GPS traces, check-in logs — the events-with-coordinates shape).

Per-entity step sequencing is a single hash-partitioned window (the
crawl-scheduler shape: inherently serial per entity, embarrassingly
parallel across entities); the per-entity summary reuses the window's
partitioning, so the whole operator costs ONE shuffle (asserted in
tests).

Exactness contract (the radius-join precedent): step lengths use only
sub/mul/add/sqrt — each correctly rounded, engine-independent — then
quantize to floor-millimeter BIGINTs *before* any sum, so totals are
reduction-order-free and hash-exact against a SQL oracle. Time deltas
are exact epoch-microsecond integers (``unix_micros`` == DuckDB
``epoch_us`` under the UTC session tz). The teleport test is the
division-free integer cross-multiplication
``step_mm * 1_000_000 > max_speed_mm_s * dt_us`` — no float speed is
ever materialized, and a zero time delta with positive displacement is
correctly flagged.

Coordinates are planar (a projected CRS or locally-flat extent);
geodesic inputs should be projected upstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def trajectory_steps(df: DataFrame, entity_col: str = "user_id",
                     ts_col: str = "ts", x_col: str = "x", y_col: str = "y",
                     order_cols: tuple[str, ...] = (),
                     max_speed_mm_s: int | None = None) -> DataFrame:
    """Attach per-step columns: ``ts_us`` (epoch micros), ``dt_us``,
    ``step_mm`` (floor-millimeter Euclidean step; NULL on each
    entity's first point) and, when ``max_speed_mm_s`` is given,
    ``teleport`` (step faster than the speed bound — GPS glitch /
    impossible hop). ``order_cols`` breaks timestamp ties
    deterministically (pass the event id)."""
    w = Window.partitionBy(entity_col).orderBy(ts_col, *order_cols)
    ts_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    dx = F.col(x_col) - F.lag(x_col).over(w)
    dy = F.col(y_col) - F.lag(y_col).over(w)
    step_mm = F.floor(F.lit(1000.0) * F.sqrt(dx * dx + dy * dy)).cast("long")
    out = (
        df.withColumn("ts_us", ts_us)
        .withColumn("dt_us", (ts_us - F.lag(ts_us).over(w)).cast("long"))
        .withColumn("step_mm", step_mm)
    )
    if max_speed_mm_s is not None:
        if max_speed_mm_s < 1:
            raise ValueError(f"need max_speed_mm_s >= 1, got {max_speed_mm_s}")
        out = out.withColumn(
            "teleport",
            F.when(F.col("step_mm").isNull(), F.lit(None).cast("boolean"))
            .otherwise(F.col("step_mm") * F.lit(1_000_000)
                       > F.lit(int(max_speed_mm_s)) * F.col("dt_us")))
    return out


def trajectory_stats(df: DataFrame, entity_col: str = "user_id",
                     ts_col: str = "ts", x_col: str = "x", y_col: str = "y",
                     order_cols: tuple[str, ...] = (),
                     max_speed_mm_s: int | None = None) -> DataFrame:
    """Per-entity trajectory summary: ``n_points``, ``path_mm`` (sum
    of floor-mm steps — order-free exact), ``max_step_mm``,
    ``duration_us`` and (with a speed bound) ``n_teleports``. The
    aggregation groups on the window's partition key, so Catalyst
    reuses the exchange: one shuffle end to end."""
    steps = trajectory_steps(df, entity_col, ts_col, x_col, y_col,
                             order_cols, max_speed_mm_s)
    aggs = [
        F.count(F.lit(1)).alias("n_points"),
        F.coalesce(F.sum("step_mm"), F.lit(0)).cast("long").alias("path_mm"),
        F.coalesce(F.max("step_mm"), F.lit(0)).cast("long").alias("max_step_mm"),
        (F.max("ts_us") - F.min("ts_us")).cast("long").alias("duration_us"),
    ]
    if max_speed_mm_s is not None:
        aggs.append(F.coalesce(F.sum(F.col("teleport").cast("long")),
                               F.lit(0)).cast("long").alias("n_teleports"))
    return steps.groupBy(entity_col).agg(*aggs)
