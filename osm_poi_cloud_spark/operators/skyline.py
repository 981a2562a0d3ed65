"""Distributed 2-D skyline (Pareto frontier) — "best POIs" queries.

The classic geo-analytics ask: of the candidate venues, keep those not
DOMINATED in (cost_a, cost_b) — e.g. (distance to me, price): a row is
dominated if another row is <= in both dimensions and strictly < in at
least one. Naive evaluation is the n^2 dominance test; the sorted
formulation is linear: with rows ordered by x, a row can only survive
if its y EQUALS the running minimum over x' <= x, and among equal-y
survivors only the smallest-x one is undominated (an earlier equal-y
point strictly dominates in x; exact duplicates dominate neither way
and are all kept).

Distributed without a global window (the curriculum /
repartitionByRange discipline — a plain ``Window.orderBy(x)`` funnels
the corpus through ONE task):

    1. ``repartitionByRange`` on (group, x): Spark's RangePartitioner
       keeps equal keys in one partition, so across partitions x is
       strictly increasing within a group — cross-partition state
       reduces to per-(partition, group) y-minima,
    2. inside each partition ONE range-frame window over the sort
       (min y over x' <= x) — the exchange's sort satisfies it,
    3. the per-(partition, group) minima table (one row per task per
       group) gets an EXCLUSIVE running min per group ordered by
       partition id — tens/hundreds of rows, broadcast back; the
       global running min is least(local, prefix),
    4. candidates are rows with ``y == global running min``; a final
       (group, y) partial-agg min(x) join keeps, per equal-y chain,
       exactly the smallest-x points.

Cost: one range exchange + one bounded broadcast + one candidate-set
groupBy/join — skyline at 10^12 rows without any all-pairs step.
Exactness is engine-checked against a DuckDB NOT EXISTS brute force
(a genuinely different algorithm).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def skyline_2d(df: DataFrame, x_col: str, y_col: str,
               group_cols: tuple[str, ...] = (),
               num_partitions: int | None = None) -> DataFrame:
    """Rows of ``df`` on the (minimize ``x_col``, minimize ``y_col``)
    Pareto frontier, independently per ``group_cols`` combination.
    Exact duplicate (x, y) points are all kept (neither strictly
    dominates the other); NULL coordinates are excluded (dominance is
    undefined for them)."""
    if x_col == y_col:
        raise ValueError("x_col and y_col must differ")
    gcols = list(group_cols)
    d = df.filter(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
    keys = [F.col(c) for c in gcols] + [F.col(x_col)]
    d = (d.repartitionByRange(*([num_partitions] if num_partitions else []),
                              *keys)
         .withColumn("_pid", F.spark_partition_id()))

    le_min = F.min(y_col).over(
        Window.partitionBy("_pid", *gcols).orderBy(F.col(x_col))
        .rangeBetween(Window.unboundedPreceding, Window.currentRow))
    d = d.withColumn("_le", le_min)

    # per-(partition, group) y-minimum -> EXCLUSIVE running min per
    # group over partition ids (bounded: one row per task per group;
    # earlier partitions hold strictly smaller x within the group)
    pmins = d.groupBy("_pid", *gcols).agg(F.min(y_col).alias("_pm"))
    prefix = F.min("_pm").over(
        Window.partitionBy(*gcols).orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1))
    pmins = pmins.withColumn("_prefix", prefix).drop("_pm")

    cand = (
        d.join(F.broadcast(pmins), ["_pid", *gcols], "left")
        .filter(F.col(y_col) == F.least("_le", F.col("_prefix")))
        .drop("_pid", "_le", "_prefix")
    )
    # equal-y chains: only the smallest-x point per (group, y) is
    # undominated. A KEYED window (non-empty partition spec, candidate
    # set only — never the corpus) computes the per-(group, y) min(x)
    # in ONE consumer of `cand`; the former groupBy + self-join shape
    # evaluated the whole candidate subtree (including the corpus-wide
    # range window sort) twice.
    minx = F.min(x_col).over(Window.partitionBy(*gcols, y_col))
    return (cand.withColumn("_minx", minx)
            .filter(F.col(x_col) == F.col("_minx"))
            .drop("_minx"))
