"""End-to-end pretraining-corpus curation: raw documents in, clean
deduplicated corpus out — ONE call composing the pipeline every
training-data stack runs before tokenization:

    language ID -> quality thresholds -> repetition (Gopher) filters
    -> PII scrub -> exact dedup

Everything upstream of the final dedup is native Column expressions
(codegen'd, map-only — no shuffle, no Python): at 100 TB the whole
filter cascade streams through the scan, and the single shuffle is the
dedup groupBy on the content hash. Filters are ordered cheapest-first
so Catalyst can collapse them into one WholeStageCodegen pass over
each batch.

The composite is fully cross-engine-oracled (contract query
``corpus_curation``): every arithmetic step is the same IEEE
expression DuckDB evaluates, so scores — and therefore threshold
decisions at the boundary — are bit-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text_analysis import (
    lang_id_col,
    quality_features,
    repetition_features,
    scrub_pii_col,
)
from ..operators.dedup import exact_dedup


def curate_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_langs: tuple[str, ...] = ("en",),
    min_quality: float = 0.4,
    max_dup_word_frac: float = 0.4,
    max_dup_line_frac: float = 0.5,
    min_tokens: int = 5,
    scrub: bool = True,
    span_k: int | None = None,
    span_min_docs: int = 2,
    classifier_weights=None,
    classifier_bias: float | None = None,
    blocklist_terms: tuple[str, ...] | list[str] | None = None,
    max_blocked_frac: float = 0.0,
    line_rules: bool = False,
    max_bullet_ppm: int = 900_000,
    max_ellipsis_ppm: int = 300_000,
) -> DataFrame:
    """Curate a raw document table for pretraining.

    Returns the surviving rows with the audit columns the pipeline
    computed (``lang_detected``, ``quality_score``, ``dup_*_frac``,
    ``n_tokens``) plus ``text_clean`` (PII-scrubbed when ``scrub``).
    Exact dedup keeps the min-``id_col`` representative per identical
    CLEAN text, so two pages differing only in scrubbed emails
    deduplicate together — the order (scrub THEN dedup) is load-bearing.

    ``span_k``: when set, ExactSubstr span removal
    (``operators.dedup.remove_duplicated_spans``) runs over the clean
    text BEFORE the exact dedup — ``span_k``-word windows shared by >=
    ``span_min_docs`` documents are cut out, and two documents that
    were identical *except* for shared boilerplate now also collapse in
    the dedup. Adds ``tokens_removed``/``chars_removed`` audit columns.
    Cost: two extra shuffles (span groupBy + per-doc regroup); default
    off, and the default path's plan is unchanged.

    ``blocklist_terms``/``max_blocked_frac``: when set, the bad-words
    gate (``functions.text_analysis.blocklist_filter``) runs after
    the heuristic thresholds — exact whole-token matching, drop when
    the hit fraction exceeds ``max_blocked_frac`` (default 0.0, the
    C4 any-hit rule). Map-only; audit columns (``n_blocked``,
    ``blocked_frac``, ``blocked_terms_fp``) kept on survivors.

    ``line_rules``: when True, the Gopher LINE-shape gates
    (``functions.text_analysis.line_shape_filter`` semantics — drop
    pages over ``max_bullet_ppm`` bullet lines or ``max_ellipsis_ppm``
    ellipsis lines, defaults the published 90%/30%) join the heuristic
    thresholds. Map-only HOFs, same codegen pass; default off and the
    default path's plan is unchanged.

    ``classifier_weights``/``classifier_bias``: when set, the learned
    quality filter (``operators.classifier``, e.g.
    ``DEFAULT_QUALITY_WEIGHTS``/``DEFAULT_QUALITY_BIAS``) runs NEXT TO
    the heuristic thresholds — rows must clear both. Scoring is the
    pure-Catalyst left-to-right logit chain over features this cascade
    already computes, so the addition folds into the same
    WholeStageCodegen pass (zero extra shuffles, zero Python); the
    ``logit`` audit column is kept on survivors.
    """
    out = df.filter(F.length(text_col) > 0)
    out = quality_features(out, text_col)
    out = repetition_features(out, text_col)
    out = out.withColumn("lang_detected", lang_id_col(F.col(text_col)))
    out = out.filter(
        F.col("lang_detected").isin(*keep_langs)
        & (F.col("n_tokens") >= min_tokens)
        & (F.col("quality_score") >= min_quality)
        & (F.col("dup_word_frac") <= max_dup_word_frac)
        & (F.col("dup_line_frac") <= max_dup_line_frac)
    )
    if classifier_weights is not None:
        from ..operators.classifier import lr_logit_col

        if classifier_bias is None:
            raise ValueError("classifier_weights requires classifier_bias")
        out = out.withColumn(
            "logit", lr_logit_col(classifier_weights, classifier_bias))
        out = out.filter(F.col("logit") > 0)
    if line_rules:
        from ..functions.text_analysis import line_shape_features

        out = line_shape_features(out, text_col).filter(
            (F.col("bullet_ppm") <= max_bullet_ppm)
            & (F.col("ellipsis_ppm") <= max_ellipsis_ppm))
    if blocklist_terms:
        from ..functions.text_analysis import blocklist_filter

        # map-only like every other gate; folds into the same
        # WholeStageCodegen pass (audit columns kept on survivors)
        out = blocklist_filter(out, blocklist_terms, text_col=text_col,
                               max_frac=max_blocked_frac)
    clean = scrub_pii_col(F.col(text_col)) if scrub else F.col(text_col)
    out = out.withColumn("text_clean", clean)
    if span_k is not None:
        from ..operators.dedup import remove_duplicated_spans

        out = remove_duplicated_spans(out, k=span_k, text_col="text_clean",
                                      id_col=id_col, min_docs=span_min_docs)
    # lazy localCheckpoint before the dedup: exact_dedup consumes its
    # input twice (representatives + probe side), and on the default
    # path everything above is ONE map-only codegen pass — without the
    # materialization the whole cascade (quality/repetition HOFs,
    # lang-id, scrub) executed twice. Survivors only, far smaller than
    # the raw corpus.
    return exact_dedup(out.localCheckpoint(eager=False), "text_clean", id_col)


def curate_tokenize_pack(
    df: DataFrame,
    budget: int = 2048,
    num_merges: int = 150,
    merges: list[tuple[str, str]] | None = None,
    min_count: int = 1,
    n_buckets: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    **curation_kwargs,
) -> tuple[DataFrame, list[tuple[str, str]]]:
    """The pipeline's last mile in one call: curate -> learn/apply a
    BPE vocabulary -> pack documents into fixed-token-budget training
    sequences.

    Composition: ``curate_documents`` (map-only cascade + one dedup
    shuffle) -> ``train_bpe_from_corpus`` over the CLEAN text (bounded
    driver collect, see functions/bpe.py) unless ``merges`` is given ->
    ``bpe_token_counts`` (one Arrow-batched stage) -> ``pack_sequences``
    keyed on ``(lang_detected, pack_bucket)`` when ``n_buckets`` is set
    (size-bounded window partitions — the 100 TB path).

    Returns ``(packed, merges)``: packed rows carry the curation audit
    columns plus ``bpe_tokens``, ``seq_offset`` and ``seq_id``. The
    curated lineage is consumed twice (trainer collect + encode);
    persist it upstream if recompute is expensive.
    """
    from ..functions.bpe import bpe_token_counts, train_bpe_from_corpus
    from ..operators.packing import pack_sequences

    curated = curate_documents(df, text_col=text_col, id_col=id_col,
                               **curation_kwargs)
    if merges is None:
        merges = train_bpe_from_corpus(curated, num_merges,
                                       text_col="text_clean",
                                       min_count=min_count, id_col=id_col)
    counts = bpe_token_counts(curated, merges, text_col="text_clean",
                              id_col=id_col)
    base = curated.join(counts, id_col)
    packed = pack_sequences(base, budget, token_col="bpe_tokens",
                            pack_col="lang_detected", order_col=id_col,
                            n_buckets=n_buckets)
    return packed, merges


def curate_to_training_shards(
    df: DataFrame,
    budget: int = 2048,
    num_merges: int = 150,
    merges: list[tuple[str, str]] | None = None,
    min_count: int = 1,
    n_buckets: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    curated: DataFrame | None = None,
    **curation_kwargs,
) -> tuple[DataFrame, DataFrame]:
    """The COMPLETE pretraining last mile: curate -> BPE tokenize ->
    vocabulary ids -> pack -> materialized training shards.

    Returns ``(shards, vocab)``: one shard row per packed sequence with
    the concatenated token-id array in document order (what a training
    loader consumes), plus the (token, token_id) vocabulary table.
    Stage shapes: curation is the map-only cascade + one dedup shuffle;
    tokenization is one Arrow stage; the vocab is a bounded broadcast;
    packing is one window; the shard gather is one aggregation on the
    packing key — five exchanges end to end, each on a different
    bounded key, nothing corpus-sized ever sits on one task when
    ``n_buckets`` is set.

    ``curated``: pass an already-curated table (must carry
    ``text_clean`` and ``lang_detected``, e.g. the parquet a previous
    ``curate_documents`` run wrote) to skip re-running the curation
    cascade — the CLI uses this so ``--shards-out`` consumes the
    curated output it just materialized instead of recomputing
    curation once per downstream consumer."""
    from ..functions.bpe import (build_vocab, bpe_tokenize, encode_token_ids,
                                 train_bpe_from_corpus)
    from ..operators.packing import pack_sequences, sequence_shards

    if curated is None:
        curated = curate_documents(df, text_col=text_col, id_col=id_col,
                                   **curation_kwargs)
    if merges is None:
        merges = train_bpe_from_corpus(curated, num_merges,
                                       text_col="text_clean",
                                       min_count=min_count, id_col=id_col)
    toks = bpe_tokenize(curated, merges, text_col="text_clean", id_col=id_col)
    vocab = build_vocab(toks)
    ids = encode_token_ids(toks, vocab, id_col=id_col)
    base = (curated.select(id_col, "lang_detected")
            .join(ids, id_col)
            .withColumn("bpe_tokens", F.size("token_ids")))
    packed = pack_sequences(base, budget, token_col="bpe_tokens",
                            pack_col="lang_detected", order_col=id_col,
                            n_buckets=n_buckets)
    return sequence_shards(packed, pack_col="lang_detected",
                           order_col=id_col), vocab


def curation_report(raw: DataFrame, curated: DataFrame,
                    id_col: str = "doc_id") -> DataFrame:
    """One-row funnel summary (rows in, rows out, survival rate) — the
    audit number a curation run logs."""
    n_in = raw.select(F.count(F.lit(1)).alias("rows_in"))
    n_out = curated.select(F.count(F.lit(1)).alias("rows_out"))
    return n_in.crossJoin(n_out).select(
        "rows_in", "rows_out",
        (F.col("rows_out") / F.greatest(F.col("rows_in"), F.lit(1))).alias("survival_rate"),
    )


def main(argv: list[str] | None = None) -> None:
    """spark-submit entry: raw documents parquet in, curated corpus +
    funnel report out.

        python -m osm_poi_cloud_spark.plans.curation \\
            --input /data/documents --output /data/clean \\
            --langs en,de --min-quality 0.4
    """
    import argparse

    from ..config import get_spark

    ap = argparse.ArgumentParser(description=main.__doc__)
    ap.add_argument("--input", required=True, help="documents parquet path")
    ap.add_argument("--output", required=True, help="curated corpus output path")
    ap.add_argument("--langs", default="en", help="comma-separated languages to keep")
    ap.add_argument("--min-quality", type=float, default=0.4)
    ap.add_argument("--max-dup-word-frac", type=float, default=0.4)
    ap.add_argument("--max-dup-line-frac", type=float, default=0.5)
    ap.add_argument("--min-tokens", type=int, default=5)
    ap.add_argument("--no-scrub", action="store_true", help="skip PII scrubbing")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--shards-out", default=None,
                    help="ALSO produce training shards (token-id sequences) "
                         "here; writes <path>/shards and <path>/vocab")
    ap.add_argument("--budget", type=int, default=2048,
                    help="tokens per training sequence (with --shards-out)")
    ap.add_argument("--num-merges", type=int, default=4096,
                    help="BPE merges to learn (with --shards-out)")
    ap.add_argument("--min-count", type=int, default=2,
                    help="BPE vocabulary frequency floor (with --shards-out)")
    ap.add_argument("--pack-buckets", type=int, default=256,
                    help="hash buckets for the pack key (with --shards-out)")
    args = ap.parse_args(argv)

    spark = get_spark("corpus-curation")
    raw = spark.read.parquet(args.input)
    cur_kwargs = dict(
        text_col=args.text_col,
        id_col=args.id_col,
        keep_langs=tuple(args.langs.split(",")),
        min_quality=args.min_quality,
        max_dup_word_frac=args.max_dup_word_frac,
        max_dup_line_frac=args.max_dup_line_frac,
        min_tokens=args.min_tokens,
        scrub=not args.no_scrub,
    )
    curated = curate_documents(raw, **cur_kwargs)
    curated.write.mode("overwrite").parquet(args.output)
    rep = curation_report(raw, spark.read.parquet(args.output), args.id_col).first()
    print(f"curation: {rep['rows_in']:,} in -> {rep['rows_out']:,} out "
          f"({rep['survival_rate']:.1%} survive)")
    if args.shards_out:
        # reuse the curated parquet written above: the trainer collect,
        # the encoder and the packer all read the materialized output
        # instead of re-running the curation cascade + dedup shuffle
        shards, vocab = curate_to_training_shards(
            raw, budget=args.budget, num_merges=args.num_merges,
            min_count=args.min_count, n_buckets=args.pack_buckets,
            id_col=args.id_col,
            curated=spark.read.parquet(args.output))
        shards.write.mode("overwrite").parquet(f"{args.shards_out}/shards")
        vocab.write.mode("overwrite").parquet(f"{args.shards_out}/vocab")
        n_seq = spark.read.parquet(f"{args.shards_out}/shards").count()
        n_vocab = spark.read.parquet(f"{args.shards_out}/vocab").count()
        print(f"shards: {n_seq:,} sequences (budget {args.budget}), "
              f"vocab {n_vocab:,} tokens")


if __name__ == "__main__":
    main()
