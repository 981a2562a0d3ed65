"""Temporal joins Spark lacks as built-ins, expressed natively.

``asof_join`` — match each left row to the LATEST right row at or
before its timestamp per key (kdb's aj, pandas ``merge_asof``, DuckDB
``ASOF JOIN``): the snapshot/quote attachment every event pipeline
needs (prices to trades, crawl snapshots to queries, config versions
to log lines).

Implementation is the classic UNION + running-last-value trick, fully
native: tag both sides, sort each key's timeline once, and carry the
most recent right-side payload forward with ``last(..., ignorenulls)``
over a running window — ONE shuffle on the join key, no range
explosion, no per-row Python. Window state per key is the key's
timeline (bounded by time-partitioning the input at planet scale —
the same contract as sessionization).

Cross-engine: DuckDB ships a native ``ASOF JOIN`` with identical
backward semantics (match on ``l.t >= r.t``), which makes the contract
oracle a DIFFERENT algorithm for the same definition — stronger than a
restatement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, on: str,
              left_time: str = "ts", right_time: str = "ts",
              direction: str = "backward",
              tolerance_seconds: float | None = None,
              right_prefix: str = "r_") -> DataFrame:
    """Left rows enriched with the nearest right row per ``on`` key.

    * ``direction="backward"`` (default): latest right row with
      ``right_time <= left_time`` (DuckDB/kdb/pandas default);
    * ``direction="forward"``: earliest right row with
      ``right_time >= left_time``.

    Right-side payload columns come back prefixed with ``right_prefix``
    (plus ``{prefix}{right_time}`` for the matched timestamp); left
    rows with no match keep NULLs. ``tolerance_seconds`` bounds the
    match distance (a stale quote is no quote).

    Equal timestamps match (<= / >=); if several right rows share one
    (key, time), the one whose payload struct is LARGEST (backward) /
    SMALLEST (forward) wins — deterministic, partitioning-independent.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be 'backward' or 'forward', got {direction!r}")
    if on in (left_time, right_time):
        raise ValueError("key column and time column must differ")
    r_payload = [c for c in right.columns if c not in (on, right_time)]
    l_cols = [c for c in left.columns]

    r_tagged = right.select(
        F.col(on).alias("_k"), F.col(right_time).alias("_t"),
        F.lit(0).alias("_side"),
        F.struct(F.col(right_time).alias("_rt"),
                 *[F.col(c) for c in r_payload]).alias("_rv"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"_l_{c}") for c in l_cols],
    )
    l_tagged = left.select(
        F.col(on).alias("_k"), F.col(left_time).alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r_tagged.schema["_rv"].dataType).alias("_rv"),
        *[F.col(c).alias(f"_l_{c}") for c in l_cols],
    )
    unioned = r_tagged.unionByName(l_tagged)

    if direction == "backward":
        # right rows sort BEFORE left at equal times (so <= matches);
        # among equal-time right rows max(_rv) wins via last-non-null
        # over the max-ordered tie -> order by _rv descending? last()
        # keeps the LATEST in window order, so ascending _rv makes the
        # largest struct win deterministically.
        w = (Window.partitionBy("_k")
             .orderBy(F.col("_t").asc(), F.col("_side").asc(), F.col("_rv").asc())
             .rowsBetween(Window.unboundedPreceding, 0))
    else:
        w = (Window.partitionBy("_k")
             .orderBy(F.col("_t").desc(), F.col("_side").asc(), F.col("_rv").desc())
             .rowsBetween(Window.unboundedPreceding, 0))
    carried = unioned.withColumn("_match", F.last("_rv", ignorenulls=True).over(w))

    out = carried.filter(F.col("_side") == 1)
    if tolerance_seconds is not None:
        dt = (F.col("_t").cast("double")
              - F.col("_match._rt").cast("double"))
        dist = dt if direction == "backward" else -dt
        out = out.withColumn(
            "_match",
            F.when(dist <= F.lit(float(tolerance_seconds)), F.col("_match")))
    return out.select(
        *[F.col(f"_l_{c}").alias(c) for c in l_cols],
        F.col("_match._rt").alias(f"{right_prefix}{right_time}"),
        *[F.col(f"_match.{c}").alias(f"{right_prefix}{c}") for c in r_payload],
    )
