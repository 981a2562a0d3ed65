"""Sequence packing: assign documents to fixed-token-budget training
sequences — the step between curation and tokenized-shard writing.

Training consumes fixed-length sequences; feeding one short document
per sequence wastes most of the context window, so pipelines PACK
documents until the budget fills. The deterministic greedy-contiguous
scheme here (documents in a stable order, running token total, new
sequence when the budget would overflow) is what packing loaders do,
expressed as ONE window aggregation:

    seq = floor(cumulative_tokens_before_me / budget)

A document that straddles a boundary starts the overflow into the next
sequence (bounded by one doc's tokens — the standard trade; exact
bin-packing is NP-hard and order-unstable).

Scale: the window partitions by a pack key (shard/language/source), so
each partition's window is independent — no global sort. A single
global packing order would serialize through one task; the pack-key
form is the one that survives 10^12 documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(df: DataFrame, budget: int, token_col: str = "n_tokens",
                   pack_col: str = "lang", order_col: str = "doc_id") -> DataFrame:
    """Add ``seq_id`` (per pack key) and ``seq_offset`` (token offset
    within the running order). Deterministic: ordering on ``order_col``
    is total within each pack key."""
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    w = (
        Window.partitionBy(pack_col).orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    before = F.coalesce(F.sum(token_col).over(w), F.lit(0))
    return (
        df.withColumn("seq_offset", before)
        .withColumn("seq_id", F.floor(F.col("seq_offset") / budget).cast("long"))
    )


def packing_stats(packed: DataFrame, budget: int, token_col: str = "n_tokens",
                  pack_col: str = "lang") -> DataFrame:
    """Per-pack-key fill metrics: sequences used, mean fill fraction —
    the utilization number a packing run logs."""
    per_seq = packed.groupBy(pack_col, "seq_id").agg(F.sum(token_col).alias("seq_tokens"))
    return per_seq.groupBy(pack_col).agg(
        F.count(F.lit(1)).alias("n_sequences"),
        (F.sum("seq_tokens") / (F.count(F.lit(1)) * F.lit(float(budget)))).alias("mean_fill"),
    )
