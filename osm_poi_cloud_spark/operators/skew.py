"""Skew-aware equi-join: heavy-key detection + targeted salting.

At 100 TB a handful of hot keys (the empty tag, the mega-city cell,
the aggregator host) can put 1% of the keys behind 90% of one join
side, and the task holding the hottest key runs for hours while the
rest of the cluster idles. Spark's AQE skew handling
(``spark.sql.adaptive.skewJoin``) splits oversized partitions for
sort-merge joins at runtime and is the first line of defense — but it
cannot help when the skewed join feeds a same-key aggregation (the
split partitions are immediately re-coalesced by the next exchange),
when the join is a broadcast-infeasible hash join, or when the skew
lives in a single KEY rather than a partition (a partition split
cannot separate rows that hash identically).

The classic remedy is targeted salting, and it composes from native
operators only:

* ``detect_heavy_keys`` — one aggregate pass over the fact side,
  keeping keys whose row count exceeds a per-task threshold. The
  result is by construction tiny (at most ``rows / threshold`` keys)
  and safe to collect/broadcast.
* ``salted_join`` — rows with heavy keys get a deterministic salt
  from ``xxhash64(row_key)`` (never ``rand()``: task retries must
  re-derive identical salts or a lost executor corrupts the join);
  the OTHER side replicates its heavy rows exactly ``n_salts`` times
  via a native ``explode(sequence(...))`` — only the heavy slice is
  replicated, so the blow-up is |heavy dim rows| x n_salts, not
  |dim| x n_salts. Light keys take the ordinary join untouched, and
  the two branches union. The result set is IDENTICAL to the plain
  join — salting is a physical rewrite, not a semantic one — which is
  exactly what the contract oracle checks (plain-join SQL).

The reference engine has no skew remedy at all (its Rust sharder
caps shard sizes up front, main.rs:202-216); this module is the
general-join counterpart of the quadtree salt plan
(``operators/quadtree.py:115``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def detect_heavy_keys(df: DataFrame, key: str,
                      threshold: int = 1_000_000) -> list:
    """Keys of ``df`` carrying more than ``threshold`` rows — the set
    worth salting. One count shuffle (map-side combined); the returned
    list has at most ``count(df) / threshold`` entries, so the collect
    is bounded by construction (the IVF/BPE bounded-driver-pass
    pattern)."""
    if threshold < 1:
        raise ValueError(f"need threshold >= 1, got {threshold}")
    # NULL keys are excluded up front: a NULL can never match in an
    # equi-join, so salting it is useless — and None is unorderable
    # against real keys in the sorted() below.
    rows = (df.filter(F.col(key).isNotNull())
            .groupBy(key).agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") > threshold).select(key).collect())
    return sorted(r[0] for r in rows)


def salted_join(left: DataFrame, right: DataFrame, key: str,
                heavy_keys: list, row_key: str,
                n_salts: int = 16, how: str = "inner") -> DataFrame:
    """Equi-join ``left`` x ``right`` on ``key`` with the listed heavy
    keys spread over ``n_salts`` sub-keys. ``row_key`` is a unique
    column on ``left`` used to derive the deterministic salt.

    Output columns = key, then left columns, then right columns (no
    salt artifacts). ``how`` supports ``inner`` and ``left`` (outer
    semantics are well-defined per-row on the salted side only).
    Falls back to the plain join when ``heavy_keys`` is empty."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    if not heavy_keys:
        return left.join(right, on=key, how=how)
    if n_salts < 2:
        raise ValueError(f"need n_salts >= 2, got {n_salts}")

    heavy_lit = F.array(*[F.lit(k) for k in heavy_keys])
    # array_contains is NULL (not false) for a NULL key, and a NULL
    # predicate fails BOTH filter branches — a left join would then
    # silently drop NULL-key left rows that a plain left join keeps.
    # coalesce to false so NULL keys ride the light branch (where the
    # ordinary join gives them the correct how= semantics).
    is_heavy = F.coalesce(
        F.array_contains(heavy_lit, F.col(key)), F.lit(False))

    # Light branch: the ordinary join (AQE/broadcast free to pick the
    # physical strategy).
    l_light = left.filter(~is_heavy)
    r_light = right.filter(~is_heavy)
    light = l_light.join(r_light, on=key, how=how)

    # Heavy branch: salt the fact side deterministically, replicate
    # the dim side's heavy slice n_salts ways, join on (key, salt).
    salt = F.pmod(F.xxhash64(F.col(row_key)), F.lit(n_salts)).cast("int")
    l_heavy = left.filter(is_heavy).withColumn("_salt", salt)
    r_heavy = (right.filter(is_heavy)
               .withColumn("_salt", F.explode(
                   F.sequence(F.lit(0), F.lit(n_salts - 1)))))
    heavy = (l_heavy.join(r_heavy, on=[key, "_salt"], how=how)
             .drop("_salt"))

    return light.unionByName(heavy)
