"""Inverted-index construction and BM25 ranked retrieval.

The search-side counterpart of the corpus-statistics passes in
``functions/text_analysis.py``: build term->document posting lists
(the word-count shuffle shape — Catalyst's partial aggregation
map-side-combines, so the shuffle carries at most |distinct (term,
doc) per partition| rows), then score a literal query with BM25
(Robertson & Spärck Jones / Okapi; the k1/b saturation form).

Determinism / oracle design: the per-(term, doc) BM25 contribution is
an IEEE expression chain of exact-integer inputs (tf, dl, df, N,
sum_dl) combined with literal constants — division and multiplication
are correctly-rounded and engine-independent, so each contribution is
bit-identical in Spark and DuckDB. Contributions are quantized to ppm
integers BEFORE the per-document sum (the bigram-LM pattern:
float-reduction-order-free), so scores hash-match regardless of
partial-aggregation order. IDF uses the division-only Robertson
surrogate ``(N - df + 0.5) / (df + 0.5)`` — no logarithm, monotone in
the same direction, cross-engine exact (ln would not be).

Scale shape: postings build is one explode + one count shuffle; corpus
stats (N, avgdl) ride a broadcast 1-row cross-join (zero driver
actions); the query side is a broadcast join against |query| terms;
top-k is TakeOrderedAndProject. Nothing grows with corpus size except
the postings shuffle, which is the canonical word-count shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _tokens(text_col: str):
    """Lowercased alnum tokens (the DSIR/importance convention)."""
    return F.filter(F.split(F.lower(F.trim(F.col(text_col))), "[^a-z0-9]+"),
                    lambda t: t != "")


def build_inverted_index(docs: DataFrame, id_col: str = "doc_id",
                         text_col: str = "text") -> DataFrame:
    """Posting rows ``(term, doc_id, tf)`` — one explode + one count
    shuffle (map-side combined). Sort/bucket by term downstream to
    co-locate each term's posting list for index serving."""
    return (
        docs.select(F.col(id_col).alias("doc_id"),
                    F.explode(_tokens(text_col)).alias("term"))
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def doc_lengths(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """``(doc_id, dl)`` token counts — map-only (size of the token
    array, no explode)."""
    return docs.select(F.col(id_col).alias("doc_id"),
                       F.size(_tokens(text_col)).cast("long").alias("dl"))


def bm25_scores(postings: DataFrame, doclens: DataFrame,
                query_terms: list[str], k1: float = 1.2,
                b: float = 0.75) -> DataFrame:
    """Per-document BM25 scores for ``query_terms``:
    ``(doc_id, n_terms, score_ppm)`` where score_ppm is the sum of
    per-term contributions each floored to ppm integers (order-free).

    Plan: df per query term from a broadcast semi-filtered aggregate,
    corpus stats as a broadcast 1-row cross-join, one hash join of the
    query postings against doc lengths, integer sum per doc.
    """
    if not query_terms:
        raise ValueError("need at least one query term")
    if len(set(query_terms)) != len(query_terms):
        raise ValueError("query terms must be distinct")
    spark = postings.sparkSession
    qdf = spark.createDataFrame([(t,) for t in query_terms], "term string")

    stats = doclens.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("sum_dl"))

    qpost = postings.join(F.broadcast(qdf), "term")
    dfreq = qpost.groupBy("term").agg(F.count(F.lit(1)).alias("df"))

    scored = (
        qpost
        .join(F.broadcast(dfreq), "term")
        .join(doclens, "doc_id")
        .crossJoin(F.broadcast(stats))
    )
    # exact-integer inputs -> literal-constant IEEE chain; keep this
    # association order in sync with the contract oracle text
    n_d = F.col("n_docs").cast("double")
    dfd = F.col("df").cast("double")
    tfd = F.col("tf").cast("double")
    dld = F.col("dl").cast("double")
    avgdl = F.col("sum_dl").cast("double") / n_d
    idf = (n_d - dfd + F.lit(0.5)) / (dfd + F.lit(0.5))
    tfc = (tfd * F.lit(k1 + 1.0)) / (
        tfd + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * (dld / avgdl)))
    contrib = F.floor(F.lit(1e6) * idf * tfc).cast("long")
    return (
        scored.withColumn("_ppm", contrib)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_terms"),
             F.sum("_ppm").alias("score_ppm"))
    )


def bm25_topk(docs: DataFrame, query_terms: list[str], k: int = 100,
              id_col: str = "doc_id", text_col: str = "text",
              k1: float = 1.2, b: float = 0.75) -> DataFrame:
    """Convenience end-to-end: index + score + deterministic top-k
    (score desc, doc_id asc tie-break; TakeOrderedAndProject)."""
    if k < 1:
        raise ValueError(f"need k >= 1, got {k}")
    postings = build_inverted_index(docs, id_col, text_col)
    dls = doc_lengths(docs, id_col, text_col)
    return (bm25_scores(postings, dls, query_terms, k1, b)
            .orderBy(F.desc("score_ppm"), F.asc("doc_id")).limit(k))
