"""Polite crawl scheduling: host-bucketed fetch planning.

Large-scale fetch pipelines (the stage upstream of the WARC source in
``sources/warc.py``) must respect per-host politeness: at most one
in-flight request per host and a fixed delay between hits (the
Crawl-delay convention the RFC 9309 parser in ``functions/robots.py``
extracts). Per-host sequencing is *inherently serial*, so the scalable
plan is exactly one hash shuffle on the host key and a linear
``row_number`` scan per host — no global coordination, no driver
state. Cross-host parallelism comes for free from the partitioning;
within-host order is the schedule.

Skew at planet scale (a single host with 10^9 queued URLs) cannot be
salted away — politeness forbids parallelising a host — so the correct
scale tool is the **cycle cap** (``max_per_host``): rows past the cap
are marked ``deferred`` for the next crawl cycle instead of producing
an unboundedly long per-host tail. The window stays size-bounded and
the schedule horizon stays finite.

Worker assignment hashes the host (all of a host's fetches land on one
worker, preserving politeness under distribution); the expression is
injectable so SQL-oracle harnesses can use integer arithmetic instead
of xxhash64 (which DuckDB lacks).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def schedule_fetches(df: DataFrame, host_col: str = "host",
                     order_col: str = "url",
                     delay_ms_col: str | None = None,
                     default_delay_ms: int = 1000,
                     worker_expr: Column | None = None,
                     n_workers: int = 64,
                     max_per_host: int | None = None) -> DataFrame:
    """Attach a politeness schedule to a URL frontier.

    Adds:

    * ``slot`` — 0-based per-host fetch sequence number (ordered by
      ``order_col``; ties impossible when ``order_col`` is unique per
      host, which callers should ensure for determinism).
    * ``fetch_at_ms`` — ``slot * delay`` relative start time, where the
      delay is ``delay_ms_col`` (a per-host-constant column, e.g. a
      parsed Crawl-delay) or ``default_delay_ms``.
    * ``worker`` — stable host->worker assignment; every fetch of a
      host maps to the same worker so per-host serialism survives
      distribution. Default ``pmod(xxhash64(host), n_workers)``;
      override with ``worker_expr`` for hash-free derivations.
    * ``deferred`` (only when ``max_per_host`` is set) — true for rows
      past the cycle cap; they keep slot/fetch_at for diagnostics but
      belong to the next cycle.

    One shuffle (hash on ``host_col``), everything else map-side.
    """
    if default_delay_ms < 0:
        raise ValueError(f"need default_delay_ms >= 0, got {default_delay_ms}")
    if n_workers < 1:
        raise ValueError(f"need n_workers >= 1, got {n_workers}")
    if max_per_host is not None and max_per_host < 1:
        raise ValueError(f"need max_per_host >= 1, got {max_per_host}")
    delay = (F.col(delay_ms_col) if delay_ms_col is not None
             else F.lit(default_delay_ms)).cast("long")
    w = Window.partitionBy(host_col).orderBy(order_col)
    slot = (F.row_number().over(w) - F.lit(1)).cast("long")
    if worker_expr is None:
        worker_expr = F.pmod(F.xxhash64(F.lit(17), F.col(host_col)),
                             F.lit(n_workers))
    out = (
        df.withColumn("slot", slot)
        .withColumn("fetch_at_ms", (F.col("slot") * delay).cast("long"))
        .withColumn("worker", worker_expr.cast("long"))
    )
    if max_per_host is not None:
        out = out.withColumn("deferred", F.col("slot") >= F.lit(max_per_host))
    return out


def cycle_stats(scheduled: DataFrame, host_col: str = "host") -> DataFrame:
    """Per-host cycle summary over a ``schedule_fetches`` result:
    queue depth, horizon (last fetch_at_ms) and deferred count (0 when
    the schedule was uncapped). One map-side-combined aggregation."""
    deferred = (F.col("deferred").cast("long") if "deferred" in scheduled.columns
                else F.lit(0))
    return (
        scheduled.groupBy(host_col)
        .agg(F.count(F.lit(1)).alias("n_queued"),
             F.max("fetch_at_ms").alias("horizon_ms"),
             F.sum(deferred).alias("n_deferred"))
    )
