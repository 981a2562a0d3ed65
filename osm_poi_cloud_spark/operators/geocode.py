"""Gazetteer matching: fuzzy venue-name geocoding at join scale.

The reference's pipeline extracts venue names/addresses from web pages
(process.py's POI rows); the natural downstream step every geo stack
runs next is matching those free-text names against a canonical
gazetteer (OSM names, Who's-on-First, GeoNames) to attach stable ids
and coordinates. Exact equality fails on real extractions ("Joe's
Pizza NYC" vs "Joes Pizza"), so the standard shape is a *blocked
fuzzy join*:

    normalize -> token-set blocking (candidates share >= 1 token)
    -> exact token-set Jaccard on the candidates -> best match per
    name above a threshold

Everything is native DataFrame ops: one explode per side, one
equi-join on the blocking token (never a cross join), one
groupBy(pair) whose COUNT **is** the intersection size (the blocking
join emits exactly one row per shared distinct token), and a
per-left-id window argmax. Jaccard is kept in EXACT integer ppm
(``1000000 * inter DIV union``) so thresholds and oracles are
bit-stable across engines.

Scale notes (the part that matters at 10^9 names):
* Blocking tokens are DISTINCT per name, so candidate fan-out is
  bounded by sum of per-pair shared tokens, not token multiplicity.
* Stopword-like tokens ("the", "cafe") create quadratic blow-up on
  one key — ``max_block_df`` drops tokens whose *gazetteer* document
  frequency exceeds the cap from the blocking join. Dropped tokens
  therefore don't count toward the INTERSECTION (the join count is
  the intersection) but still sit in the union denominator — a
  deliberate conservative underestimate: a pair whose similarity
  rides on corpus-wide stopwords shouldn't clear the threshold. The
  exact rule is mirrored token-for-token in the contract oracle.
* Optional ``cell`` columns add a spatial equality to the blocking
  join (S2 cell / tile id from functions/s2_cell.py): candidates must
  share a token AND a cell — the token x cell co-blocking that keeps
  city-scale gazetteers from fanning out nationally.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def normalize_name_col(name: Column) -> Column:
    """Canonical venue-name token set: lowercase, strip everything but
    letters/digits to spaces, split, drop empties, distinct, sorted.
    Deterministic and cheap — one regexp + one split in codegen."""
    toks = F.split(F.regexp_replace(F.lower(name), "[^a-z0-9]+", " "), " ")
    return F.array_sort(F.array_distinct(
        F.filter(toks, lambda t: t != "")))


def gazetteer_match(names: DataFrame, gazetteer: DataFrame,
                    id_col: str = "poi_id", name_col: str = "name",
                    gaz_id_col: str = "gaz_id", gaz_name_col: str = "gaz_name",
                    min_jaccard_ppm: int = 500_000,
                    max_block_df: int | None = None,
                    cell_col: str | None = None,
                    gaz_cell_col: str | None = None) -> DataFrame:
    """Best gazetteer match per input name.

    Returns one row per matched left id: ``(id_col, gaz_id_col,
    n_tokens, n_gaz_tokens, inter, jaccard_ppm)`` with
    ``jaccard_ppm >= min_jaccard_ppm`` and the deterministic argmax
    (max jaccard, then MIN gazetteer id) per left id. Unmatched names
    simply don't appear (left-join semantics belong to the caller —
    an outer variant is one extra join away and keeps this plan lean).

    ``max_block_df``: drop tokens appearing in more than this many
    gazetteer entries from the blocking join (and hence from the
    intersection count — see the module docstring for the exact
    semantics). ``cell_col``/``gaz_cell_col``: equality co-blocking
    key.
    """
    if min_jaccard_ppm < 0 or min_jaccard_ppm > 1_000_000:
        raise ValueError(
            f"min_jaccard_ppm must be in [0, 1e6], got {min_jaccard_ppm}")
    if (cell_col is None) != (gaz_cell_col is None):
        raise ValueError("cell_col and gaz_cell_col must be set together")

    l_cell = [F.col(cell_col).alias("_cell")] if cell_col else []
    r_cell = [F.col(gaz_cell_col).alias("_cell")] if gaz_cell_col else []
    lt = (names.select(F.col(id_col).alias("_lid"),
                       normalize_name_col(F.col(name_col)).alias("_toks"),
                       *l_cell)
          .withColumn("_n_l", F.size("_toks"))
          .filter(F.col("_n_l") > 0))
    rt = (gazetteer.select(F.col(gaz_id_col).alias("_rid"),
                           normalize_name_col(F.col(gaz_name_col))
                           .alias("_toks"), *r_cell)
          .withColumn("_n_r", F.size("_toks"))
          .filter(F.col("_n_r") > 0))

    le = lt.select("_lid", "_n_l", *(["_cell"] if cell_col else []),
                   F.explode("_toks").alias("_tok"))
    re_ = rt.select("_rid", "_n_r", *(["_cell"] if cell_col else []),
                    F.explode("_toks").alias("_tok"))
    if max_block_df is not None:
        if max_block_df < 1:
            raise ValueError(f"max_block_df must be >= 1, got {max_block_df}")
        heavy = (re_.groupBy("_tok")
                 .agg(F.count(F.lit(1)).alias("_df"))
                 .filter(F.col("_df") > max_block_df)
                 .select("_tok"))
        le = le.join(F.broadcast(heavy), "_tok", "left_anti")
        re_ = re_.join(F.broadcast(heavy), "_tok", "left_anti")

    join_keys = ["_tok"] + (["_cell"] if cell_col else [])
    pairs = (
        le.join(re_, join_keys)
        .groupBy("_lid", "_rid")
        .agg(F.count(F.lit(1)).alias("inter"),
             # constant within the (_lid, _rid) group; min == the value
             # (and, unlike first(), passes the driver-action AST scan)
             F.min("_n_l").alias("n_tokens"),
             F.min("_n_r").alias("n_gaz_tokens"))
    )
    # integer DIV, not float divide-then-cast (DuckDB CAST rounds,
    # Spark truncates — the repo's floor-then-cast rule)
    pairs = pairs.withColumn(
        "jaccard_ppm",
        F.expr("CAST((1000000 * inter) DIV "
               "(n_tokens + n_gaz_tokens - inter) AS BIGINT)"))
    w = Window.partitionBy("_lid").orderBy(
        F.col("jaccard_ppm").desc(), F.col("_rid").asc())
    return (
        pairs.filter(F.col("jaccard_ppm") >= min_jaccard_ppm)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(F.col("_lid").alias(id_col), F.col("_rid").alias(gaz_id_col),
                "n_tokens", "n_gaz_tokens", "inter", "jaccard_ppm")
    )


def conflate_pois(pois: DataFrame, id_col: str = "poi_id",
                  name_col: str = "name", cell_col: str | None = None,
                  min_jaccard_ppm: int = 500_000,
                  max_block_df: int | None = None,
                  max_iter: int = 20,
                  checkpoint_dir: str | None = None) -> DataFrame:
    """POI conflation: collapse the per-page venue mentions the
    extraction pipeline emits (the same cafe scraped from its own
    site, a directory page, and a review page) into canonical
    entities — the classic geospatial entity-resolution step
    downstream of the reference's POI table (its merge step dedups
    per tile by exact key; conflation is the fuzzy-name analog every
    production POI stack runs next).

    Pipeline (all native until the component step):

        normalize (``normalize_name_col``) -> token[-x-cell] blocking
        SELF-join (a < b; the join COUNT is the intersection) ->
        exact integer-ppm Jaccard -> threshold -> edges ->
        ``connected_components`` (large-star/small-star, O(log n)
        rounds) -> canonical id = MIN id per component.

    Returns one row per input id — including records whose normalized
    name is empty and records that matched nothing (singleton
    clusters): ``(id_col, canonical_id, cluster_size)``. The
    transitive closure is the point: A~B and B~C conflate A with C
    even when Jaccard(A, C) is below the threshold (chains of
    listing-style abbreviations), which is why the component step is
    a real CC and not a pairwise argmax.

    Scale shape: one explode per record, the blocking self-equi-join
    (bounded by shared distinct tokens; ``cell_col`` adds the spatial
    equality that keeps dense name tokens from fanning out across a
    whole country — a venue only conflates with candidates in the
    SAME cell), one groupBy(pair), then CC at its edge-count-derived
    width with per-round eager checkpoints (``checkpoint_dir`` for
    reliable cluster resume). ``max_block_df`` drops tokens whose
    document frequency exceeds the cap from blocking — same
    conservative-underestimate semantics as ``gazetteer_match``
    (dropped tokens still count in the union denominator).
    """
    if min_jaccard_ppm < 1 or min_jaccard_ppm > 1_000_000:
        raise ValueError(
            f"min_jaccard_ppm must be in [1, 1e6], got {min_jaccard_ppm}")
    from .dedup import connected_components

    cell = [F.col(cell_col).alias("_cell")] if cell_col else []
    base = (pois.select(F.col(id_col).alias("_id"),
                        normalize_name_col(F.col(name_col)).alias("_toks"),
                        *cell)
            .withColumn("_n", F.size("_toks")))
    # lazy localCheckpoint: both self-join sides (and the optional
    # heavy-token count) consume the exploded token rows — materialize
    # the normalize+explode once instead of once per consumer (the
    # containment/minhash precedent; rows are (id, n, cell, token)).
    ex = base.filter(F.col("_n") > 0).select(
        "_id", "_n", *(["_cell"] if cell_col else []),
        F.explode("_toks").alias("_tok")).localCheckpoint(eager=False)
    if max_block_df is not None:
        if max_block_df < 1:
            raise ValueError(f"max_block_df must be >= 1, got {max_block_df}")
        heavy = (ex.groupBy("_tok")
                 .agg(F.count(F.lit(1)).alias("_df"))
                 .filter(F.col("_df") > max_block_df)
                 .select("_tok"))
        ex = ex.join(F.broadcast(heavy), "_tok", "left_anti")

    # self-join needs fresh alias projections (ambiguous-self-join)
    lhs = ex.select(F.col("_id").alias("_a"), F.col("_n").alias("_na"),
                    *(["_cell"] if cell_col else []), "_tok")
    rhs = ex.select(F.col("_id").alias("_b"), F.col("_n").alias("_nb"),
                    *(["_cell"] if cell_col else []), "_tok")
    join_keys = ["_tok"] + (["_cell"] if cell_col else [])
    edges = (
        lhs.join(rhs, join_keys)
        .filter(F.col("_a") < F.col("_b"))
        .groupBy("_a", "_b")
        .agg(F.count(F.lit(1)).alias("_inter"),
             F.min("_na").alias("_na"), F.min("_nb").alias("_nb"))
        .withColumn("_j", F.expr("CAST((1000000 * _inter) DIV "
                                 "(_na + _nb - _inter) AS BIGINT)"))
        .filter(F.col("_j") >= min_jaccard_ppm)
        .select("_a", "_b")
    )
    comp = connected_components(edges, id_a="_a", id_b="_b",
                                max_iter=max_iter,
                                checkpoint_dir=checkpoint_dir)
    ids = pois.select(F.col(id_col).alias("_id"))
    labeled = (ids.join(comp.withColumnRenamed("node", "_id"), "_id", "left")
               .select("_id",
                       F.coalesce("component", F.col("_id"))
                       .alias("canonical_id")))
    sizes = labeled.groupBy("canonical_id").agg(
        F.count(F.lit(1)).alias("cluster_size"))
    return (labeled.join(sizes, "canonical_id")
            .select(F.col("_id").alias(id_col), "canonical_id",
                    "cluster_size"))
