"""Z-order (Morton) data layout — multi-dimensional clustering for
scan pruning, the OPTIMIZE ZORDER BY of Delta/Iceberg expressed as
plain Spark.

A parquet lake can only range-cluster on ONE sort key; a query that
filters on both lon and lat (every bbox query) gets pruning on the
leading column only. Interleaving the bits of both dimensions into a
single Morton key makes rows that are close in 2-D space close in the
1-D sort order, so EVERY output file covers a small bbox and parquet
row-group/file min-max statistics prune on BOTH columns at once. At
100 TB this is the difference between a bbox probe touching a few
files and touching every file in the table; it composes with (not
replaces) directory partitioning — partition by coarse tile or date,
Z-order within.

The key is pure integer bit arithmetic (the classic spread-with-
shifts-and-masks), which keeps it exactly replayable in any engine —
the contract oracle replays the identical shifts in DuckDB SQL. The
reference's layout story is a fixed z/x/y directory tree
(main.rs:222-277 quadtree leaves); Z-order is the generalization that
needs no up-front tree planning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# spread masks for 16 -> 32-bit bit interleave
_MASKS = ((8, 0x00FF00FF), (4, 0x0F0F0F0F), (2, 0x33333333), (1, 0x55555555))


def _spread_bits16(c: Column) -> Column:
    """Spread a 16-bit int's bits to the even positions of a 32-bit
    int: b15..b0 -> 0b15 0b14 ... 0b0. Literal shift amounts only
    (F.shiftleft's amount arg is Python-int-only)."""
    c = c.bitwiseAND(F.lit(0xFFFF))
    for sh, mask in _MASKS:
        c = (c.bitwiseOR(F.shiftleft(c, sh))).bitwiseAND(F.lit(mask))
    return c


def zorder_key(x: Column, y: Column) -> Column:
    """Morton interleave of two 16-bit integer grid coordinates (x in
    the even bits, y odd) — a 32-bit BIGINT sort key. Inputs beyond 16
    bits are masked (grid coordinates at zoom <= 16 fit by
    construction)."""
    return _spread_bits16(x).bitwiseOR(
        F.shiftleft(_spread_bits16(y), 1)).cast("long")


def write_zordered(df: DataFrame, path: str, x_col: str, y_col: str,
                   num_files: int = 32) -> None:
    """Write ``df`` as Z-order-clustered parquet: key every row,
    range-partition on the key (contiguous Morton ranges per file, the
    clustering that makes file min-max stats tight), sort within each
    partition, drop the helper column. ``num_files`` bounds output
    file count; at real scale size it from bytes/file targets."""
    keyed = df.withColumn("_zkey", zorder_key(F.col(x_col), F.col(y_col)))
    (keyed.repartitionByRange(num_files, "_zkey")
     .sortWithinPartitions("_zkey")
     .drop("_zkey")
     .write.mode("overwrite").parquet(path))
