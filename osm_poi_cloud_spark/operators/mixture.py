"""Training-mixture planning: deterministic per-source sampling to hit
a token budget at target mixture weights.

Pretraining recipes specify a MIXTURE ("30% web, 40% code, ...") and a
total token budget; the pipeline must turn that into per-source keep
rates and apply them reproducibly. Two standard subtleties are handled
exactly:

* **Water-filling** — a source whose target exceeds its available
  tokens is capped at rate 1 and its unfilled budget is redistributed
  over the remaining sources by weight, iteratively (the fixpoint every
  mixture planner converges to; at most |sources| rounds).
* **Exact-integer rates** — rates are parts-per-million integers and
  the keep decision is ``pmod(xxhash64(seed, id), 1e6) < rate_ppm``:
  a pure function of document identity, so the sample is independent
  of partitioning, replayable, and golden-oracle-able (the same rule
  the stratified sampler uses, operators/sampling.py).

Planning reads one bounded aggregate (|sources| rows) to the driver;
application is a map-only hash filter — zero shuffles beyond the
per-source totals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PPM = 1_000_000


def plan_mixture(df: DataFrame, weights: dict[str, float], token_budget: int,
                 token_col: str = "n_tokens",
                 source_col: str = "source") -> dict[str, int]:
    """Compute per-source keep rates (parts per million) hitting
    ``token_budget`` at the target ``weights``, water-filling capped
    sources. Sources absent from ``weights`` get rate 0; a weighted
    source missing from the data is ignored (its budget share
    redistributes). Returns {source: rate_ppm}."""
    if token_budget <= 0:
        raise ValueError(f"token_budget must be positive, got {token_budget}")
    bad = {s: w for s, w in weights.items() if w < 0}
    if bad:
        raise ValueError(f"negative weights: {bad}")
    totals = {
        r["src"]: int(r["avail"])
        for r in df.groupBy(F.col(source_col).alias("src"))
        .agg(F.sum(token_col).alias("avail")).collect()
        if r["src"] in weights and r["avail"] is not None
    }
    rates: dict[str, int] = {}
    remaining = dict(totals)
    budget = int(token_budget)
    # iterative water-filling: capped sources leave the pool, their
    # unfilled share re-splits over the rest by weight
    while remaining and budget > 0:
        wsum = sum(weights[s] for s in remaining)
        if wsum <= 0:
            break
        capped = {s for s in remaining
                  if (budget * weights[s]) / wsum >= remaining[s]}
        if capped:
            for s in capped:
                rates[s] = PPM
                budget -= remaining.pop(s)
            continue
        for s, avail in remaining.items():
            target = int(budget * weights[s] / wsum)
            rates[s] = min(PPM, (target * PPM) // max(avail, 1))
        break
    for s in totals:
        rates.setdefault(s, 0)
    return rates


def apply_mixture(df: DataFrame, rates: dict[str, int],
                  id_col: str = "doc_id", source_col: str = "source",
                  seed: int = 23) -> DataFrame:
    """Filter to the planned sample: keep a row iff
    ``pmod(xxhash64(seed, id), 1e6) < rate_ppm(source)``. Map-only,
    partitioning-independent, no shuffle."""
    if not rates:
        return df.filter(F.lit(False))
    rate = F.create_map(*[
        x for s, r in sorted(rates.items()) for x in (F.lit(s), F.lit(int(r)))
    ])[F.col(source_col)]
    keep = F.pmod(F.xxhash64(F.lit(seed), F.col(id_col)), F.lit(PPM)) \
        < F.coalesce(rate, F.lit(0))
    return df.filter(keep)


def mixture_report(sampled: DataFrame, token_col: str = "n_tokens",
                   source_col: str = "source") -> DataFrame:
    """Achieved per-source sample: (source, n_docs, tokens_kept) — the
    audit table a mixture run logs next to its targets."""
    return (
        sampled.groupBy(source_col)
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.sum(token_col).cast("long").alias("tokens_kept"))
        .orderBy(source_col)
    )
