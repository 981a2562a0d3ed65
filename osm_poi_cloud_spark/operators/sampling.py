"""Deterministic sampling operators (training-data pipeline).

Dataset curation needs samples that are (a) stratified — different
keep rates per language/source/quality bucket, (b) REPRODUCIBLE — the
same rows come back on any cluster, partitioning or rerun, and (c)
cheap — no global shuffle for rate-based sampling. ``df.sample()``
fails (b): its Bernoulli draw depends on partition layout.

Both operators key the decision on ``xxhash64(seed, key)`` — a pure
function of row CONTENT — so the sample is a deterministic subset of
the data, stable across runs and resumable mid-pipeline. That also
makes an exact cross-engine oracle possible (the golden fixture's
independent from-spec XXH64 recompute).

* ``stratified_sample`` — per-stratum keep RATES. Map-only (the rate
  lookup is a literal map or a broadcast join): zero shuffles, scales
  to any input size. Keep decision: ``pmod(hash, scale) < rate*scale``.
* ``exact_count_per_stratum`` — exactly n rows per stratum, chosen as
  the n smallest hashes (deterministic, uniform). One window shuffle
  on the stratum key; skewed strata are bounded by the window's
  partial top-k (rank <= n prunes early under AQE).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: rate resolution: 1e-6 (rates are quantized to integer thresholds so
#: the keep predicate is exact integer math, never float comparison)
SCALE = 1_000_000


def _keep_hash(key_col: str, seed: int):
    """Content hash in [0, SCALE): pmod(xxhash64(seed, key), SCALE).
    The 4-byte literal seed chains into the key hash (Spark multi-arg
    xxhash64 semantics — same convention as operators/bloom.py)."""
    return F.pmod(F.xxhash64(F.lit(seed), F.col(key_col)), F.lit(SCALE))


def stratified_sample(df: DataFrame, strata_col: str, rates: dict[str, float],
                      key_col: str, default_rate: float = 0.0,
                      seed: int = 0) -> DataFrame:
    """Keep each row with its stratum's rate, deterministically.

    ``rates`` maps stratum value -> keep rate in [0, 1]; strata absent
    from the map use ``default_rate``. The plan is map-only: a literal
    threshold lookup + one hash comparison per row, no shuffle, no
    driver state — identical output on 1 or 10,000 executors."""
    for k, v in rates.items():
        if not 0.0 <= v <= 1.0:
            raise ValueError(f"rate for {k!r} must be in [0, 1], got {v}")
    if not 0.0 <= default_rate <= 1.0:
        raise ValueError(f"default_rate must be in [0, 1], got {default_rate}")
    thresh = F.lit(int(round(default_rate * SCALE)))
    for k, v in sorted(rates.items()):
        thresh = F.when(F.col(strata_col) == k, int(round(v * SCALE))).otherwise(thresh)
    return df.filter(_keep_hash(key_col, seed) < thresh)


def exact_count_per_stratum(df: DataFrame, strata_col: str, n: int,
                            key_col: str, seed: int = 0) -> DataFrame:
    """Exactly min(n, |stratum|) rows per stratum: the n smallest
    content hashes (a deterministic uniform draw — hashes are i.i.d.
    uniform over keys). Tie-break on the key itself so the result is a
    total function of the data."""
    if n <= 0:
        raise ValueError(f"n must be positive, got {n}")
    w = Window.partitionBy(strata_col).orderBy(
        _keep_hash(key_col, seed).asc(), F.col(key_col).asc())
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= n)
        .drop("_rk")
    )


def snapshot_diff(old: DataFrame, new: DataFrame, key_col: str,
                  fingerprint_col: str) -> DataFrame:
    """Change detection between two snapshot tables (the incremental-
    crawl delta): full outer join on the key, compare content
    fingerprints. Returns (key, change) with change in
    {'added', 'removed', 'changed', 'unchanged'} — feed 'added' +
    'changed' downstream, skip the rest. One co-partitioned shuffle;
    bucket both snapshots on the key (plans/bucketing.py) and even that
    exchange disappears."""
    o = old.select(F.col(key_col), F.col(fingerprint_col).alias("_fp_old"))
    n = new.select(F.col(key_col), F.col(fingerprint_col).alias("_fp_new"))
    change = (
        F.when(F.col("_fp_old").isNull(), "added")
        .when(F.col("_fp_new").isNull(), "removed")
        .when(F.col("_fp_old") != F.col("_fp_new"), "changed")
        .otherwise("unchanged")
    )
    return (
        o.join(n, on=key_col, how="full_outer")
        .select(key_col, change.alias("change"))
    )


def snapshot_upsert(base: DataFrame, snapshot: DataFrame, key_col: str,
                    payload_cols: list[str] | None = None,
                    keep_deletes: bool = False) -> DataFrame:
    """Incremental-crawl table maintenance: merge a new snapshot into
    the base table — new keys insert, changed keys replace, keys absent
    from the snapshot drop (or survive with ``keep_deletes=True``, the
    append-only-lake variant).

    Pure relational MERGE semantics as one full-outer join: the
    snapshot side wins wherever it has the key. Same scale shape as
    ``snapshot_diff`` — one co-partitioned shuffle, exchange-free when
    both sides are bucketed on the key (plans/bucketing.py). Unlike a
    rewrite-everything batch job, only the join output is written; pair
    with partition-overwrite on the key's bucket/partition column for
    the at-scale in-place upsert."""
    cols = payload_cols
    if cols is None:
        cols = [c for c in snapshot.columns if c != key_col]
    missing = set(cols) - set(base.columns)
    if missing:
        raise ValueError(f"payload columns absent from base: {sorted(missing)}")
    b = base.select(F.col(key_col), *[F.col(c).alias(f"_b_{c}") for c in cols])
    s = snapshot.select(F.col(key_col), F.lit(1).alias("_in_snap"),
                        *[F.col(c).alias(f"_s_{c}") for c in cols])
    joined = b.join(s, on=key_col, how="full_outer")
    if not keep_deletes:
        # a base row with no snapshot row is a delete
        joined = joined.filter(F.col("_in_snap").isNotNull())
    out_cols = [F.col(key_col)] + [
        F.when(F.col("_in_snap").isNotNull(), F.col(f"_s_{c}"))
        .otherwise(F.col(f"_b_{c}")).alias(c)
        for c in cols
    ]
    return joined.select(*out_cols)


def snapshot_history(snaps: DataFrame, key_col: str, version_col: str,
                     attr_cols: list[str]) -> DataFrame:
    """SCD-2 history build: collapse a versioned snapshot log into
    validity intervals — the table a crawl lake keeps so "what did
    this page look like at crawl N?" is one range lookup instead of a
    scan over every snapshot (cf. the reference's replace-the-world
    dataset refresh, which keeps no history at all).

    Input: one row per (entity, version) observation with the tracked
    attributes. Output: one row per UNBROKEN RUN of equal attribute
    values per entity —

        (key, attrs..., valid_from, valid_to, n_snapshots, is_current)

    where ``valid_from`` is the run's first version, ``valid_to`` the
    next run's first version (NULL while current — the half-open
    [from, to) convention), and ``is_current`` flags the open run.
    Re-observing unchanged attrs extends the run (n_snapshots counts
    observations); any attr change closes it. NULL attrs compare
    null-safely, so NULL -> NULL is "unchanged".

    Scale shape: two windows and one aggregation, ALL partitioned by
    the entity key (never global) — the lag/run-id/lead pattern
    (gaps-and-islands) every warehouse uses; one hash shuffle on the
    key which the groupBy and second window then reuse."""
    if not attr_cols:
        raise ValueError("need at least one tracked attribute column")
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(version_col)
    changed = F.lit(False)
    for c in attr_cols:
        changed = changed | ~F.col(c).eqNullSafe(F.lag(c).over(w))
    is_first = F.lag(version_col).over(w).isNull()
    run = (
        snaps.select(key_col, version_col, *attr_cols)
        .withColumn("_chg", (is_first | changed).cast("int"))
        .withColumn("_run", F.sum("_chg").over(w))
    )
    epochs = (
        run.groupBy(key_col, "_run", *attr_cols)
        .agg(F.min(version_col).alias("valid_from"),
             F.count(F.lit(1)).alias("n_snapshots"))
    )
    w2 = Window.partitionBy(key_col).orderBy("valid_from")
    return (
        epochs
        .withColumn("valid_to", F.lead("valid_from").over(w2))
        .withColumn("is_current", F.col("valid_to").isNull())
        .drop("_run")
        .select(key_col, *attr_cols, "valid_from", "valid_to",
                "n_snapshots", "is_current")
    )


def weighted_sample_per_stratum(df: DataFrame, strata_col: str,
                                weight_col: str, k: int,
                                id_col: str = "doc_id", seed: int = 29,
                                u_expr=None) -> DataFrame:
    """Weighted sampling WITHOUT replacement, exactly ``min(k, n)``
    rows per stratum — Efraimidis & Spirakis (2006) A-ES: each row
    draws a deterministic uniform u and ranks by the key ``u^(1/w)``
    (equivalently ``ln(u)/w`` — same order, better conditioned);
    the top-k keys per stratum are the weighted sample. The classic
    one-pass trick a curation pipeline uses to keep "k docs per
    source, quality-weighted" without ever materializing per-stratum
    sorts of the raw corpus beyond one window.

    Deterministic: u comes from the seeded content hash (map-only,
    partitioning-independent — the stratified_sample convention), so
    reruns and retries pick identical rows; ties broken by id. Rows
    with NULL, NaN or non-positive weight are excluded (a zero weight
    cannot be sampled; a negative one is a caller bug surfaced by the
    exclusion, not a crash). ``u_expr`` injects a custom uniform-ppm
    column (integer arithmetic both engines can run) for SQL oracles —
    the crawl-scheduler precedent.

    Scale shape: one hash shuffle on the stratum for the top-k window;
    everything else is codegen. Skewed strata cost their row count,
    never more state than the window's heap."""
    if k < 1:
        raise ValueError(f"need k >= 1, got {k}")
    from pyspark.sql import Window

    if u_expr is None:
        u_ppm = F.pmod(F.xxhash64(F.lit(seed), F.col(id_col)),
                       F.lit(1_000_000)) + 1
    else:
        u_ppm = u_expr
    w = F.col(weight_col).cast("double")
    # u in (0, 1]: ln(u) <= 0, so larger ln(u)/w  <=>  larger u^(1/w)
    key = F.log(u_ppm.cast("double") / F.lit(1e6)) / w
    win = (Window.partitionBy(strata_col)
           .orderBy(F.desc("_es_key"), F.col(id_col)))
    return (
        # NaN > 0 is TRUE in Spark's ordering and NaN keys sort first
        # under desc() — a NaN weight would crowd out every valid row
        df.filter(w.isNotNull() & ~F.isnan(w) & (w > 0))
        .withColumn("_es_key", key)
        .withColumn("_rn", F.row_number().over(win))
        .filter(F.col("_rn") <= k)
        .drop("_es_key", "_rn")
    )
