"""Bucketed-table layout: pre-shuffled storage for shuffle-free joins.

At 100 TB the dominant cost of a repeated big-big join (POIs x visit
logs, documents x annotations, ...) is re-shuffling both sides on the
join key EVERY run. Hive-style bucketing moves that shuffle to WRITE
time, once: both tables are hash-partitioned into the same number of
buckets on the join key, so Spark's planner proves co-partitioning and
emits a SortMergeJoin with NO Exchange on either side (asserted in
tests/test_bucketing.py by plan shape). Rule of thumb: bucket the
tables you join more often than you rewrite.

Buckets also serve groupBy on the bucket column (no exchange before
partial aggregation... Spark still needs the final agg exchange unless
the grouping exactly matches bucketing — which it does here) and give
bounded task input sizes regardless of upstream partitioning.

Bucketed tables are MANAGED tables (metastore-backed — the bucket
metadata lives in the catalog, not the parquet footer); the warehouse
location comes from ``spark.sql.warehouse.dir``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, bucket_col: str,
                   n_buckets: int, sort_cols: tuple[str, ...] = ()) -> None:
    """Save as a parquet table bucketed (and optionally sorted) on
    ``bucket_col``. Sorting within buckets additionally removes the
    SortMergeJoin's per-task sort when joining bucketed-sorted pairs."""
    if n_buckets <= 0:
        raise ValueError(f"n_buckets must be positive, got {n_buckets}")
    w = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, bucket_col)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str,
                  on: str, how: str = "inner") -> DataFrame:
    """Join two same-bucketed tables on their bucket column. With equal
    bucket counts the planner proves both sides are co-partitioned and
    plans ZERO shuffle exchanges — the physical plan contains no
    Exchange below the join (see test_bucketing plan assertion)."""
    return spark.table(left_table).join(spark.table(right_table), on=on, how=how)


def is_shuffle_free_join(df: DataFrame) -> bool:
    """True iff the physical plan's join consumes its children without
    any shuffle Exchange (broadcast exchanges don't count — they are
    replication, not repartitioning)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return ("ShuffleExchange" not in plan
            and "Exchange hashpartitioning" not in plan
            and "Exchange rangepartitioning" not in plan)
