"""Learned quality classifier: logistic regression over the native
text-quality features — the fastText-style model-based filter every
production curation stack runs next to its heuristics (CCNet/GPT-3
style), bootstrapped by self-distillation from the heuristic score.

Division of labor, matching the engine's other trainers (IVF, PQ, BPE):

* **Training** is a bounded driver pass: a deterministic hash-sample of
  featurized rows, full-batch gradient descent in float64 numpy,
  BLAS-free (explicit ``np.sum`` reductions, fixed order) so weights
  are bit-identical across runs, partitionings and thread counts.
* **Scoring** is 100% native Catalyst: the logit is a LEFT-TO-RIGHT
  chain of ``+ w_i * feature_i`` column arithmetic (no UDF, no vector
  type), codegen'd into the same whole-stage pass as the feature
  expressions. Exact IEEE chain — an oracle engine reproduces every
  logit bit-for-bit, so the keep/drop boundary is cross-checkable.

The decision rule exported to the contract is ``logit > 0`` (the
probability is monotone in the logit; ``sigmoid`` is provided for
reporting but kept out of exactness-sensitive paths — ``exp`` is
transcendental and engine-specific).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text_analysis import quality_features, repetition_features

#: the feature basis shared with the DuckDB curation mirror — every one
#: an exact-IEEE native expression on both engines
FEATURES = ("alpha_ratio", "punct_ratio", "stopword_ratio",
            "mean_word_len", "dup_word_frac", "dup_line_frac")

#: default weights: trained by ``train_quality_lr`` on sf0.01 clean
#: documents (label 1) vs deterministic junk families — hash word
#: salad, repeated boilerplate, punctuation spam — (label 0); seedless
#: deterministic GD, lr=0.5, 300 iters, train accuracy 1.0. Regenerate
#: with tools/train_default_quality_lr.py if the feature basis changes.
DEFAULT_QUALITY_WEIGHTS: tuple[float, ...] = (
    4.262511176829419,     # alpha_ratio      (clean prose is alphabetic)
    -0.5341496186177445,   # punct_ratio      (symbol spam)
    -0.3883713144906683,   # stopword_ratio
    -0.6803474065031809,   # mean_word_len    (hash salad has long "words")
    0.09534131854374936,   # dup_word_frac
    -5.744719901097218,    # dup_line_frac    (boilerplate repetition)
)
DEFAULT_QUALITY_BIAS: float = 3.0274403083178667


def featurize(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach the FEATURES columns (native expressions only)."""
    return repetition_features(quality_features(df, text_col), text_col)


#: extended basis (r4 verdict #7): text-surface features + the engine's
#: corpus-level signals — bigram-LM fluency, cross-document span
#: duplication, link in-degree. Every derivation is exact-IEEE-safe
#: (integer counts -> one divide; no transcendentals), so the logit
#: chain stays bit-reproducible in an oracle engine.
EXT_FEATURES = FEATURES + ("lm_ppm_norm", "dup_span_frac", "indeg_sat")

#: extended-model defaults: distilled by tools/train_default_quality_lr.py
#: --extended on sf0.01 clean documents vs junk families that the
#: text-surface basis alone cannot fully separate (cross-doc boilerplate
#: with no within-doc repetition, fluent-looking low-LM salad), with a
#: link graph where junk is never cited. Regenerate alongside
#: DEFAULT_QUALITY_WEIGHTS when either basis changes.
#: (train accuracy 1.0 on the combined corpus; the 6-feature basis
#: caps at 0.947 there — the salad_x family is only LM-separable and
#: boiler_x only span/link-separable)
DEFAULT_QUALITY_WEIGHTS_EXT: tuple[float, ...] = (
    2.5851397137114196,    # alpha_ratio
    -0.9298601669080626,   # punct_ratio
    -7.934768262676515,    # stopword_ratio
    -0.07255161079616151,  # mean_word_len
    4.839170308806051,     # dup_word_frac
    -5.334391445674364,    # dup_line_frac
    -2.094078136525362,    # lm_ppm_norm   (self-trained LM rates mass-
                           #  duplicated boilerplate as hyper-fluent)
    -0.20124233677876177,  # dup_span_frac
    16.304615374856855,    # indeg_sat     (junk is never cited)
)
DEFAULT_QUALITY_BIAS_EXT: float = -4.389176703821991


def ext_signal_features(df: DataFrame) -> DataFrame:
    """Derive the three extended feature columns from attached signal
    columns (``mean_p_ppm`` from ``functions.lm.score_bigram_lm``,
    ``n_windows``/``n_dup_windows`` from ``operators.dedup
    .span_dedup_stats``, ``indegree`` — each zero when absent for a
    document):

    * ``lm_ppm_norm``  = mean_p_ppm / 1e6 (the quantized mean bigram
      probability back on [0, 1] — integer over power-of-ten literal,
      one exact divide);
    * ``dup_span_frac`` = n_dup_windows / max(n_windows, 1);
    * ``indeg_sat``     = indegree / (indegree + 10) — a saturating
      rational in [0, 1) (log would be transcendental and engine-
      specific; the hyperbola keeps single-link noise small and
      saturates for heavily-cited pages the same way)."""
    return (
        df.withColumn("lm_ppm_norm",
                      F.col("mean_p_ppm").cast("double") / F.lit(1000000.0))
        .withColumn("dup_span_frac",
                    F.col("n_dup_windows").cast("double")
                    / F.greatest(F.col("n_windows"), F.lit(1)).cast("double"))
        .withColumn("indeg_sat",
                    F.col("indegree").cast("double")
                    / (F.col("indegree").cast("double") + F.lit(10.0)))
    )


def featurize_extended(docs: DataFrame, edges: DataFrame | None = None,
                       span_k: int = 8, span_fingerprint: str = "xxhash64",
                       text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """One-call EXT_FEATURES composition: base text features + a
    self-trained bigram LM score + cross-doc span-duplication stats +
    link in-degree (``edges`` as (src, dst) document ids; ``None`` -> 0
    in-degree everywhere, the no-graph degenerate).

    Scale shape: three count shuffles (LM bigrams/unigrams, span
    fingerprints, in-degree) + three left joins back on the doc id —
    each independently the shape its standalone operator ships; nothing
    new materializes on the driver beyond the LM's vocab scalar."""
    from ..functions.lm import score_bigram_lm, train_bigram_lm
    from .dedup import span_dedup_stats

    base = featurize(docs, text_col)
    bc, uc, v = train_bigram_lm(docs, text_col, id_col)
    lm = score_bigram_lm(docs, bc, uc, v, text_col, id_col,
                         broadcast_counts=True) \
        .select(id_col, "mean_p_ppm")
    spans = span_dedup_stats(docs, k=span_k, text_col=text_col,
                             id_col=id_col, fingerprint=span_fingerprint) \
        .select(id_col, "n_windows", "n_dup_windows")
    out = (
        base.join(lm, id_col, "left")
        .join(spans, id_col, "left")
        .withColumn("mean_p_ppm", F.coalesce("mean_p_ppm", F.lit(0)))
        .withColumn("n_windows", F.coalesce("n_windows", F.lit(0)))
        .withColumn("n_dup_windows", F.coalesce("n_dup_windows", F.lit(0)))
    )
    if edges is not None:
        indeg = edges.groupBy(F.col("dst").alias(id_col)) \
            .agg(F.count(F.lit(1)).alias("indegree"))
        out = out.join(indeg, id_col, "left")
        out = out.withColumn("indegree", F.coalesce("indegree", F.lit(0)))
    else:
        out = out.withColumn("indegree", F.lit(0))
    return ext_signal_features(out)


def train_quality_lr(df: DataFrame, label_col: str,
                     feature_cols: tuple[str, ...] = FEATURES,
                     lr: float = 0.5, iters: int = 300, l2: float = 0.0,
                     sample_mod: int | None = None, id_col: str = "doc_id",
                     max_rows: int = 200_000) -> tuple[np.ndarray, float]:
    """Full-batch logistic GD over a bounded sample -> (weights, bias).

    ``sample_mod=m`` trains on the deterministic ``xxhash64(id) % m == 0``
    subset (the IVF/BPE route); the row count is checked BEFORE collect
    and errors past ``max_rows``. Reductions are explicit ``np.sum``
    calls in fixed order — bit-reproducible, no BLAS."""
    sel = df
    if sample_mod is not None and sample_mod > 1:
        sel = sel.filter(F.pmod(F.xxhash64(F.col(id_col)), F.lit(sample_mod)) == 0)
    sel = sel.select(F.col(id_col),
                     F.col(label_col).cast("double").alias("_y"),
                     *[F.col(c).cast("double") for c in feature_cols])
    n_rows = sel.count()
    if n_rows > max_rows:
        raise ValueError(
            f"training sample has {n_rows} rows > max_rows={max_rows}; "
            f"raise sample_mod before collecting to the driver")
    if n_rows == 0:
        raise ValueError("empty training input")
    pdf = sel.toPandas().sort_values(id_col).reset_index(drop=True)
    x = pdf[list(feature_cols)].to_numpy(dtype=np.float64)
    y = pdf["_y"].to_numpy(dtype=np.float64)
    w = np.zeros(x.shape[1], dtype=np.float64)
    b = 0.0
    n = float(len(x))
    for _ in range(iters):
        z = (x * w).sum(axis=1) + b
        p = 1.0 / (1.0 + np.exp(-z))
        err = p - y
        gw = (err[:, None] * x).sum(axis=0) / n + l2 * w
        gb = err.sum() / n
        w = w - lr * gw
        b = b - lr * gb
    return w, float(b)


def lr_logit_col(weights, bias: float,
                 feature_cols: tuple[str, ...] = FEATURES) -> Column:
    """The scoring expression: ``bias + w0*f0 + w1*f1 + ...`` chained
    strictly left to right — restate the same chain in any oracle SQL
    and the doubles match bit-for-bit."""
    ws = [float(v) for v in weights]
    if len(ws) != len(feature_cols):
        raise ValueError(f"{len(ws)} weights for {len(feature_cols)} features")
    z = F.lit(float(bias))
    for w, c in zip(ws, feature_cols):
        z = z + F.lit(w) * F.col(c)
    return z


def score_quality_lr(df: DataFrame, weights, bias: float,
                     feature_cols: tuple[str, ...] = FEATURES,
                     with_prob: bool = False) -> DataFrame:
    """Adds ``logit`` and ``keep`` (logit > 0); ``with_prob`` adds the
    sigmoid for reporting (transcendental — not oracle-exact)."""
    out = df.withColumn("logit", lr_logit_col(weights, bias, feature_cols)) \
        .withColumn("keep", F.col("logit") > 0)
    if with_prob:
        out = out.withColumn("prob", F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("logit"))))
    return out
