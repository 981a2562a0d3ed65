"""Bigram language-model scoring: the LM-based quality filter
(perplexity-style) that sits next to the heuristic cascade and the
learned classifier in every curation stack (CCNet's KenLM filter is
the canonical instance).

The model is an add-one-smoothed bigram LM trained on the corpus
itself (junk text has rare bigrams under its own corpus statistics —
the standard self-scoring setup for filtering):

    P(w | prev) = (c(prev, w) + 1) / (c(prev) + V)

**Exactness design** — the reason this is hash-oracle-able where a
log-perplexity would not be: probabilities are QUANTIZED to exact
integers before any cross-row aggregation. ``q = floor(P * 1e6)`` is
a deterministic IEEE chain (one divide, one multiply, one floor —
bit-identical across engines), and per-document totals are INTEGER
sums, immune to float reduction order. Transcendental-free: the score
is the quantized mean probability (monotone in perplexity for
comparison/thresholding purposes), not a log — the repo's
rational-surrogate rule (CLAUDE.md r3).

Scale shape: training is two partial-aggregated groupBys (bigram and
unigram count tables — vocabulary-bounded outputs); scoring is two
hash joins of exploded bigram positions against those tables plus one
per-document regroup. Nothing collects; the count tables stay
distributed (broadcast them when small).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

PPM = 1_000_000


def _bigrams_df(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, pos, prev, w) — consecutive lowercased whitespace-token
    pairs. Documents with < 2 tokens produce no rows."""
    toks = F.filter(F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
                    lambda t: t != "")
    pairs = F.when(
        F.size("toks") >= 2,
        F.zip_with(F.slice(F.col("toks"), 1, F.size("toks") - 1),
                   F.slice(F.col("toks"), 2, F.size("toks") - 1),
                   lambda a, b: F.struct(a.alias("prev"), b.alias("w"))),
    ).otherwise(F.array().cast("array<struct<prev:string,w:string>>"))
    return (
        df.select(F.col(id_col), toks.alias("toks"))
        .select(F.col(id_col), F.posexplode(pairs).alias("pos", "pw"))
        .select(id_col, "pos", F.col("pw.prev").alias("prev"), F.col("pw.w").alias("w"))
    )


def train_bigram_lm(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id"):
    """-> (bigram_counts, unigram_counts, vocab_size): the two count
    tables and V for add-one smoothing. Two shuffles, vocabulary-
    bounded outputs; V is one bounded scalar."""
    bg = _bigrams_df(df, text_col, id_col)
    bigram_counts = bg.groupBy("prev", "w").agg(F.count(F.lit(1)).alias("c2"))
    toks = (
        df.select(F.explode(F.filter(
            F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
            lambda t: t != "")).alias("tok"))
    )
    unigram_counts = toks.groupBy(F.col("tok").alias("prev")) \
        .agg(F.count(F.lit(1)).alias("c1"))
    vocab_size = unigram_counts.count()
    return bigram_counts, unigram_counts, int(vocab_size)


def score_bigram_lm(df: DataFrame, bigram_counts: DataFrame,
                    unigram_counts: DataFrame, vocab_size: int,
                    text_col: str = "text", id_col: str = "doc_id",
                    broadcast_counts: bool = False) -> DataFrame:
    """(id, n_bigrams, sum_p_ppm, mean_p_ppm) — per-document quantized
    add-one bigram probabilities. ``mean_p_ppm`` is the integer-divide
    mean (exact); documents with < 2 tokens report 0/0/0. Set
    ``broadcast_counts`` when the count tables fit in memory."""
    if vocab_size <= 0:
        raise ValueError(f"vocab_size must be positive, got {vocab_size}")
    bg = _bigrams_df(df, text_col, id_col)
    bc = F.broadcast(bigram_counts) if broadcast_counts else bigram_counts
    uc = F.broadcast(unigram_counts) if broadcast_counts else unigram_counts
    joined = (
        bg.join(bc, ["prev", "w"], "left")
        .join(uc, ["prev"], "left")
        .select(
            id_col,
            F.floor(
                (F.coalesce(F.col("c2"), F.lit(0)) + F.lit(1)).cast("double")
                / (F.coalesce(F.col("c1"), F.lit(0)) + F.lit(vocab_size)).cast("double")
                * F.lit(float(PPM))
            ).cast("long").alias("q"),
        )
    )
    per_doc = joined.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.sum("q").alias("sum_p_ppm"),
    )
    ids = df.select(id_col).distinct()
    return (
        ids.join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
            F.coalesce("sum_p_ppm", F.lit(0)).cast("long").alias("sum_p_ppm"),
            # floor(double divide): both engines produce the identical
            # correctly-rounded quotient, so the floor matches bit-wise
            # (a bare CAST would diverge — Spark truncates, DuckDB rounds)
            F.when(F.coalesce(F.col("n_bigrams"), F.lit(0)) > 0,
                   F.floor(F.col("sum_p_ppm") / F.col("n_bigrams")).cast("long"))
            .otherwise(F.lit(0)).alias("mean_p_ppm"),
        )
    )


def lm_filter(df: DataFrame, scored: DataFrame, min_mean_p_ppm: int,
              id_col: str = "doc_id") -> DataFrame:
    """Keep documents whose quantized mean bigram probability clears
    the threshold — the LM leg of the curation cascade."""
    keep = scored.filter(F.col("mean_p_ppm") >= min_mean_p_ppm).select(id_col)
    return df.join(keep, id_col, "leftsemi")
