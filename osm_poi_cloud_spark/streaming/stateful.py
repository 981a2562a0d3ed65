"""Custom stateful streaming operators (``applyInPandasWithState``).

The built-in streaming surface (watermarked windows, session_window,
dropDuplicatesWithinWatermark — streaming/ingest.py) covers the
declarative cases; these two operators cover the cases that need an
explicit per-group state machine, the facility a custom streaming
engine exposes as "stateful process functions":

* ``first_seen_keys_stream`` — cross-micro-batch first-occurrence
  filter with the dedup state SHARDED BY HASH GROUP: instead of one
  state row per key (what ``dropDuplicates`` keeps internally), keys
  are hashed into ``n_groups`` shards whose state is the compact set
  of seen 64-bit key hashes. At crawl scale this is the streaming
  Bloom/seen-set pattern: state size is one long per distinct key,
  grouped so the shuffle key space is bounded and stable.

* ``host_stats_stream`` — per-host running crawl statistics (pages,
  bytes) emitted every update; the final emission per host equals the
  batch groupBy (stream==batch parity is the test oracle).

Both are Arrow-batched (pandas in/out); state round-trips through
Spark's state store, so a restarted query resumes from its checkpoint
with the seen-sets/counters intact.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupStateTimeout


def first_seen_keys_stream(df: DataFrame, key_col: str = "url",
                           n_groups: int = 64) -> DataFrame:
    """Emit each key the FIRST time it is ever seen across the whole
    stream (later micro-batches included). State per hash group: the
    sorted array of seen xxhash64(key) values. Collisions: two distinct
    keys sharing a 64-bit hash would dedupe together — the standard
    fingerprint-dedup trade, astronomically unlikely below ~2^32 keys
    per group."""
    tagged = df.select(
        F.col(key_col).cast("string").alias("key"),
        F.xxhash64(F.col(key_col).cast("string")).alias("kh"),
    ).withColumn("grp", F.pmod(F.col("kh"), F.lit(n_groups)).cast("int"))

    def fn(group_key, pdfs, state):
        seen = set(state.get[0]) if state.exists else set()
        fresh_keys = []
        for pdf in pdfs:
            for k, h in zip(pdf["key"], pdf["kh"]):
                h = int(h)
                if h not in seen:
                    seen.add(h)
                    fresh_keys.append(k)
        state.update((sorted(seen),))
        yield pd.DataFrame({"key": fresh_keys})

    return tagged.groupBy("grp").applyInPandasWithState(
        fn,
        outputStructType="key string",
        stateStructType="seen array<long>",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    ).withColumnRenamed("key", key_col)


def host_stats_stream(pages: DataFrame, url_col: str = "url",
                      size_col: str | None = None) -> DataFrame:
    """Running per-host crawl statistics: (host, n_pages, n_bytes),
    re-emitted whenever a host receives pages in a micro-batch. The
    LAST emission per host equals the batch
    ``groupBy(host).agg(count, sum)`` — asserted by the stream==batch
    parity test. State per host: two counters."""
    size_expr = (F.length(F.col(url_col)) if size_col is None
                 else F.coalesce(F.col(size_col), F.lit(0)))
    tagged = pages.select(
        F.coalesce(F.parse_url(F.col(url_col), F.lit("HOST")),
                   F.lit("")).alias("host"),
        size_expr.cast("long").alias("sz"),
    )

    def fn(group_key, pdfs, state):
        n, total = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            total += int(pdf["sz"].sum())
        state.update((n, total))
        yield pd.DataFrame({"host": [group_key[0]],
                            "n_pages": [n], "n_bytes": [total]})

    return tagged.groupBy("host").applyInPandasWithState(
        fn,
        outputStructType="host string, n_pages long, n_bytes long",
        stateStructType="n long, total long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def trajectory_stream(events: DataFrame, max_speed_mm_s: int | None = None
                      ) -> DataFrame:
    """Online trajectory stepper: the streaming form of
    ``operators/trajectory.trajectory_steps``. Input columns
    ``(user_id long, event_id long, ts_us long, x double, y double)``;
    emits one row per event with ``dt_us`` / ``step_mm`` /
    ``teleport`` chained from the entity's previous point.

    State per entity is O(1) — just the last point (ts_us, x, y) — so
    state size is bounded by live entities, not stream length. Within
    a micro-batch events sort by (ts_us, event_id); across batches
    steps chain in ARRIVAL order (a late point chains from the last
    seen point — the standard online semantics; the stream==batch
    parity test feeds batches in timestamp order, where the two
    definitions coincide).

    The step arithmetic is the batch kernel's exact chain —
    ``floor(1000.0 * sqrt(dx*dx + dy*dy))`` with correctly-rounded
    sqrt and the division-free integer teleport test — so emitted
    values are bit-identical to the batch operator on ordered input.
    """
    import math

    def fn(group_key, pdfs, state):
        if state.exists:
            have, lts, lx, ly = True, *state.get
        else:
            have, lts, lx, ly = False, 0, 0.0, 0.0
        frames = [pdf for pdf in pdfs if len(pdf)]
        out_cols = {"user_id": [], "event_id": [], "ts_us": [],
                    "dt_us": [], "step_mm": [], "teleport": []}
        if frames:
            pdf = pd.concat(frames).sort_values(["ts_us", "event_id"])
            for uid, eid, ts, x, y in zip(pdf["user_id"], pdf["event_id"],
                                          pdf["ts_us"], pdf["x"], pdf["y"]):
                ts, x, y = int(ts), float(x), float(y)
                if have:
                    dx, dy = x - lx, y - ly
                    step = math.floor(1000.0 * math.sqrt(dx * dx + dy * dy))
                    dt = ts - lts
                    tele = (step * 1_000_000 > max_speed_mm_s * dt
                            if max_speed_mm_s is not None else None)
                else:
                    step, dt, tele = None, None, None
                out_cols["user_id"].append(int(uid))
                out_cols["event_id"].append(int(eid))
                out_cols["ts_us"].append(ts)
                out_cols["dt_us"].append(dt)
                out_cols["step_mm"].append(step)
                out_cols["teleport"].append(tele)
                have, lts, lx, ly = True, ts, x, y
            state.update((lts, lx, ly))
        yield pd.DataFrame(out_cols)

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=("user_id long, event_id long, ts_us long, "
                          "dt_us long, step_mm long, teleport boolean"),
        stateStructType="lts long, lx double, ly double",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
