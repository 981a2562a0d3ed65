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
