"""Zone maps: per-partition min/max statistics for data skipping.

The lakehouse data-skipping artifact (parquet row-group stats, Delta
file stats, ClickHouse skip indexes) as a first-class relational
table: one row per zone (partition / file / bucket) carrying row
count, per-column min/max and null counts. A scan with a range
predicate consults the zone map first and reads only zones whose
[min, max] interval intersects the predicate — the mechanism behind
the engine's plan-asserted partition pruning (test_server), made
explicit and queryable.

Build cost: ONE map-side-combined aggregation (the shuffle carries one
row per zone per partition). Pruning is a filter over the zone-map
table — typically thousands of rows for petabytes of data, so the
skip decision is effectively free; `pruning_report` quantifies the
skip rate for observability.

Soundness invariant (pinned in tests): a zone can be skipped ONLY if
it cannot contain a matching row — scanning just the kept zones
returns exactly the rows the full-scan predicate returns. Min/max over
doubles are comparisons only (no arithmetic), so the stats are exact
input values and the decision is engine-independent.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def build_zone_map(df: DataFrame, zone_cols: list[str],
                   stat_cols: list[str]) -> DataFrame:
    """One row per zone: ``n_rows`` plus ``{c}_min / {c}_max /
    {c}_nulls`` for each stat column. Min/max ignore NULLs (SQL
    semantics); all-NULL zones carry NULL bounds and are never
    skippable for that column."""
    if not zone_cols:
        raise ValueError("need at least one zone column")
    if not stat_cols:
        raise ValueError("need at least one stat column")
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in stat_cols:
        aggs += [
            F.min(c).alias(f"{c}_min"),
            F.max(c).alias(f"{c}_max"),
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}_nulls"),
        ]
    return df.groupBy(*zone_cols).agg(*aggs)


def range_keep_flag(col: str, lo, hi) -> Column:
    """Keep decision for ``col BETWEEN lo AND hi``: the zone survives
    iff its interval intersects [lo, hi] OR it holds NULL-masked rows
    the stats can't bound (all-NULL zone). Comparisons only."""
    has_bounds = F.col(f"{col}_min").isNotNull()
    intersects = (F.col(f"{col}_min") <= F.lit(hi)) & (F.col(f"{col}_max") >= F.lit(lo))
    return (has_bounds & intersects) | ~has_bounds


def zones_for_range(zone_map: DataFrame, col: str, lo, hi) -> DataFrame:
    """Zones a ``col BETWEEN lo AND hi`` scan must read."""
    return zone_map.filter(range_keep_flag(col, lo, hi))


def pruning_report(zone_map: DataFrame, col: str, lo, hi) -> DataFrame:
    """One-row skip-rate summary: zones/rows total vs read."""
    keep = range_keep_flag(col, lo, hi).cast("long")
    return zone_map.agg(
        F.count(F.lit(1)).alias("zones_total"),
        F.sum(keep).alias("zones_read"),
        F.sum("n_rows").alias("rows_total"),
        F.sum(F.col("n_rows") * keep).alias("rows_read"),
    )


def merge_zone_maps(a: DataFrame, b: DataFrame,
                    zone_cols: list[str]) -> DataFrame:
    """Combine two zone maps over the same schema (incremental
    maintenance: merge yesterday's map with the new files' map instead
    of rebuilding). The stats form a commutative monoid — min/min,
    max/max, sums — so ``merge(build(X), build(Y)) == build(X ∪ Y)``
    exactly (pinned in tests). One union + one aggregation."""
    if not zone_cols:
        raise ValueError("need at least one zone column")
    if set(a.columns) != set(b.columns):
        raise ValueError("zone maps must share a schema")
    u = a.unionByName(b)
    aggs = [F.sum("n_rows").alias("n_rows")]
    for c in u.columns:
        if c in zone_cols or c == "n_rows":
            continue
        if c.endswith("_min"):
            aggs.append(F.min(c).alias(c))
        elif c.endswith("_max"):
            aggs.append(F.max(c).alias(c))
        elif c.endswith("_nulls"):
            aggs.append(F.sum(c).alias(c))
        else:
            raise ValueError(f"unrecognized zone-map column: {c}")
    return u.groupBy(*zone_cols).agg(*aggs)
