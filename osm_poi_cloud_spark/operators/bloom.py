"""Distributed Bloom filter as a DataFrame — incremental-crawl URL
membership at 100 TB scale.

The training-data use case: each crawl snapshot must drop URLs already
ingested by earlier snapshots without joining against the full
multi-billion-row history table. A Bloom filter over the historical
key set answers "definitely new" / "probably seen" with a fixed memory
budget and NO shuffle of the history at probe time.

Spark-shaped design — the filter IS a tiny DataFrame, not a driver
object (contrast ``df.stat.bloomFilter``, which materializes a JVM
object on the driver and needs a UDF to probe):

* build: k bit positions per key via seeded ``xxhash64`` (JVM-side,
  whole-stage codegen), exploded, reduced to 64-bit words with
  ``bit_or(shiftleft(1, bit))`` — ONE shuffle of (word_idx, bits)
  pairs, output ≤ m/64 rows regardless of input size.
* probe: recompute the k positions per candidate, join against the
  (broadcast) word table, a key is "probably seen" iff all k bits hit.
  The word table for a 1-in-1000-fpp filter over 10^9 keys is ~1.8 GB
  spread over ≤ m/64 rows — broadcastable in words for planet-scale
  key sets, or a plain shuffle join when larger.

Determinism: positions depend only on (key, seed, m, k), so the same
inputs give bit-identical filters on any partitioning/cluster — which
also makes the golden-fixture oracle possible (make_goldens recomputes
positions with its from-spec pure-Python XXH64).

Spark's ``xxhash64(a, b)`` chains fields: the hash of ``a`` (seed 42)
becomes the seed for ``b`` — replicated in the oracle.

False-positive math (standard): for n keys, m bits, k hashes,
fpp ≈ (1 - e^(-kn/m))^k; optimal k = (m/n) ln 2.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def optimal_params(n_keys: int, fpp: float) -> tuple[int, int]:
    """(m_bits, k) for a target false-positive rate (standard formula;
    m rounded up to a multiple of 64 so the word table is exact)."""
    if not 0 < fpp < 1:
        raise ValueError(f"fpp must be in (0, 1), got {fpp}")
    if n_keys <= 0:
        raise ValueError(f"n_keys must be positive, got {n_keys}")
    m = math.ceil(-n_keys * math.log(fpp) / (math.log(2) ** 2))
    m = ((m + 63) // 64) * 64
    k = max(1, round(m / n_keys * math.log(2)))
    return m, k


def _positions(col, m_bits: int, k: int):
    """k bit-position Columns for a key: pmod(xxhash64(i, key), m).
    The literal hash index chains into the key hash (Spark's multi-arg
    xxhash64), giving k independent hash functions from one kernel."""
    return [F.pmod(F.xxhash64(F.lit(i), col), F.lit(m_bits)) for i in range(k)]


def bloom_build(df: DataFrame, key_col: str, m_bits: int, k: int) -> DataFrame:
    """Key set -> Bloom word table ``(word_idx long, bits long)``.

    One explode (k rows per key, map-side) + one groupBy shuffle whose
    output is at most m/64 rows. ``bit_or`` never overflows (bitwise,
    ANSI-safe); absent words mean all-zero bits."""
    if m_bits <= 0 or m_bits % 64:
        raise ValueError(f"m_bits must be a positive multiple of 64, got {m_bits}")
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    pos = F.explode(F.array(*_positions(F.col(key_col), m_bits, k))).alias("pos")
    return (
        df.select(pos)
        .select((F.col("pos") / 64).cast("long").alias("word_idx"),
                F.expr("shiftleft(1L, cast(pos % 64 AS int))").alias("mask"))
        .groupBy("word_idx")
        .agg(F.bit_or("mask").alias("bits"))
    )


def bloom_probe(candidates: DataFrame, bloom: DataFrame, key_col: str,
                m_bits: int, k: int, broadcast: bool = True) -> DataFrame:
    """Candidates + word table -> candidates plus ``probably_seen``.

    Each candidate key expands to its k (word_idx, mask) probes, joins
    the word table (broadcast by default — it is ≤ m/64 rows), and is
    "probably seen" iff every probe finds its bit set. Keys absent from
    the build are "definitely new" (Bloom guarantee: no false
    negatives), which the all-k-hits rule preserves exactly.

    The candidate table streams through map-side except for the final
    per-key conjunction (one groupBy on the key — or none at all if the
    caller keeps the exploded form)."""
    probes = candidates.select(
        F.col(key_col),
        F.explode(F.array(*_positions(F.col(key_col), m_bits, k))).alias("pos"),
    ).select(
        key_col,
        (F.col("pos") / 64).cast("long").alias("word_idx"),
        F.expr("shiftleft(1L, cast(pos % 64 AS int))").alias("mask"),
    )
    wt = F.broadcast(bloom) if broadcast else bloom
    hit = (F.col("bits").isNotNull()
           & (F.col("bits").bitwiseAND(F.col("mask")) != 0)).cast("int")
    return (
        probes.join(wt, on="word_idx", how="left")
        .select(key_col, hit.alias("hit"))
        .groupBy(key_col)
        .agg((F.min("hit") == 1).alias("probably_seen"))
    )


def bloom_filter_new_keys(candidates: DataFrame, history: DataFrame,
                          key_col: str, fpp: float = 0.001,
                          expected_keys: int | None = None) -> DataFrame:
    """End-to-end incremental-ingest helper: rows of ``candidates``
    whose key is DEFINITELY absent from ``history`` (Bloom-filtered;
    the ~fpp fraction of false "seen" drops is the documented trade —
    acceptable for crawl dedup, where dropping a stray URL is cheap
    and re-joining 10^12 history rows is not)."""
    n = expected_keys if expected_keys is not None else history.count()
    m, k = optimal_params(max(n, 1), fpp)
    bloom = bloom_build(history, key_col, m, k)
    seen = bloom_probe(candidates.select(key_col).distinct(), bloom, key_col, m, k)
    keep = seen.filter(~F.col("probably_seen")).select(key_col)
    return candidates.join(keep, on=key_col, how="left_semi")
