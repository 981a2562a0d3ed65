"""Gazetteer fuzzy matching: hand-computed Jaccard/argmax cases, an
independent pure-Python recompute over a deterministic corpus,
blocking-cap and cell co-blocking semantics, validation."""

import pandas as pd
import pytest

from osm_poi_cloud_spark.operators.geocode import (
    gazetteer_match,
    normalize_name_col,
)


def _match(spark, names, gaz, **kw):
    ndf = spark.createDataFrame(
        pd.DataFrame(names, columns=["poi_id", "name"]))
    gdf = spark.createDataFrame(
        pd.DataFrame(gaz, columns=["gaz_id", "gaz_name"]))
    return (gazetteer_match(ndf, gdf, **kw)
            .toPandas().sort_values("poi_id").reset_index(drop=True))


def _python_match(names, gaz, min_ppm=500_000, max_df=None):
    """From-definition recompute: normalize, token blocking with the
    gazetteer-df cap, join-count intersection, integer-ppm jaccard,
    (max jaccard, min gaz_id) argmax."""
    import re

    def norm(s):
        return sorted({t for t in re.sub("[^a-z0-9]+", " ", s.lower()).split()
                       if t})

    ntoks = {i: norm(s) for i, s in names if norm(s)}
    gtoks = {i: norm(s) for i, s in gaz if norm(s)}
    df = {}
    for ts in gtoks.values():
        for t in ts:
            df[t] = df.get(t, 0) + 1
    heavy = {t for t, c in df.items() if max_df is not None and c > max_df}
    best = {}
    for li, lt in ntoks.items():
        for ri, rt in gtoks.items():
            inter = len((set(lt) - heavy) & (set(rt) - heavy))
            if inter == 0:
                continue
            ppm = 1_000_000 * inter // (len(lt) + len(rt) - inter)
            if ppm < min_ppm:
                continue
            key = (-ppm, ri)
            if li not in best or key < best[li][0]:
                best[li] = (key, ri, ppm)
    return {li: (v[1], v[2]) for li, v in best.items()}


def test_hand_case_best_match_and_threshold(spark):
    names = [(1, "Joe's Pizza NYC"), (2, "blue bottle coffee"),
             (3, "zzz unmatched qqq")]
    # "Joe's" normalizes to "joe s", so gaz 10 ("joes pizza") shares
    # only {pizza}: 1/5 = 200000, below threshold; gaz 11 shares
    # {joe, s, pizza}: 3/(4+5-3) = exactly 500000 (boundary INCLUDED)
    gaz = [(10, "joes pizza"),
           (11, "joe s pizza new york"),
           (20, "Blue Bottle Coffee Co"), # jac(2,20) = 3/4
           (30, "red rock cafe")]
    got = _match(spark, names, gaz)
    assert got["poi_id"].tolist() == [1, 2]      # 3 has no candidate >= 0.5
    r1 = got.set_index("poi_id").loc[1]
    assert r1["gaz_id"] == 11 and r1["jaccard_ppm"] == 500_000
    r2 = got.set_index("poi_id").loc[2]
    assert r2["gaz_id"] == 20 and r2["jaccard_ppm"] == 750_000
    assert r2["inter"] == 3 and r2["n_tokens"] == 3 and r2["n_gaz_tokens"] == 4


def test_duplicate_tokens_count_once(spark):
    got = _match(spark, [(1, "pizza pizza pizza")], [(9, "pizza")],
                 min_jaccard_ppm=0)
    assert got.loc[0, "jaccard_ppm"] == 1_000_000
    assert got.loc[0, "n_tokens"] == 1


def test_block_df_cap_drops_stopword_bridges(spark):
    # 'the' appears in every gazetteer entry; pair (1, 30) shares ONLY
    # 'the', so the cap removes it entirely; (1, 10)'s jaccard loses
    # the 'the' intersection but keeps 'tavern'
    names = [(1, "the tavern")]
    gaz = [(10, "the old tavern"), (30, "the fish market"),
           (31, "the corner shop")]
    uncapped = _match(spark, names, gaz, min_jaccard_ppm=0)
    assert set(uncapped.columns) >= {"gaz_id", "jaccard_ppm"}
    capped = _match(spark, names, gaz, min_jaccard_ppm=0, max_block_df=2)
    assert capped.loc[0, "gaz_id"] == 10
    # inter = 1 ('tavern'), union = 2 + 3 - 1 = 4
    assert capped.loc[0, "inter"] == 1
    assert capped.loc[0, "jaccard_ppm"] == 250_000


def test_cell_coblocking_restricts_candidates(spark):
    ndf = spark.createDataFrame(pd.DataFrame(
        [(1, "central cafe", "cellA")],
        columns=["poi_id", "name", "cell"]))
    gdf = spark.createDataFrame(pd.DataFrame(
        [(10, "central cafe", "cellB"), (11, "central cafe bar", "cellA")],
        columns=["gaz_id", "gaz_name", "cell"]))
    got = gazetteer_match(ndf, gdf, cell_col="cell", gaz_cell_col="cell",
                          min_jaccard_ppm=0).toPandas()
    # the exact-name match sits in the wrong cell; only 11 qualifies
    assert got["gaz_id"].tolist() == [11]


def test_matches_python_recompute(spark):
    # deterministic pseudo-corpus: names from a 12-word vocabulary
    vocab = ["alpha", "bravo", "cafe", "delta", "echo", "fox", "golf",
             "hotel", "india", "julia", "kilo", "lima"]
    names = [(i, " ".join(vocab[(i * 7 + j) % 12] for j in range(4)))
             for i in range(40)]
    gaz = [(100 + i, " ".join(vocab[(i * 5 + j) % 12] for j in range(3)))
           for i in range(25)]
    got = _match(spark, names, gaz, min_jaccard_ppm=400_000, max_block_df=10)
    exp = _python_match(names, gaz, min_ppm=400_000, max_df=10)
    got_d = {int(r.poi_id): (int(r.gaz_id), int(r.jaccard_ppm))
             for r in got.itertuples()}
    assert got_d == exp


def test_normalization_and_validation(spark):
    df = spark.createDataFrame(pd.DataFrame(
        [("A&B  Café-Bar!!", )], columns=["name"]))
    from pyspark.sql import functions as F

    toks = df.select(normalize_name_col(F.col("name")).alias("t")) \
        .first()["t"]
    assert toks == ["a", "b", "bar", "caf"]  # 'é' is non-[a-z0-9] -> split
    names = [(1, "x y")]
    gaz = [(2, "x")]
    with pytest.raises(ValueError):
        _match(spark, names, gaz, min_jaccard_ppm=2_000_000)
    with pytest.raises(ValueError):
        _match(spark, names, gaz, max_block_df=0)
    ndf = spark.createDataFrame(pd.DataFrame(names, columns=["poi_id", "name"]))
    gdf = spark.createDataFrame(pd.DataFrame(gaz, columns=["gaz_id", "gaz_name"]))
    with pytest.raises(ValueError):
        gazetteer_match(ndf, gdf, cell_col="cell")


def test_plan_shape_no_cartesian(spark):
    """The blocking join must be an equi-join on the token key — a
    cartesian/broadcast-nested-loop anywhere means blocking broke."""
    import pandas as pd

    ndf = spark.createDataFrame(
        pd.DataFrame([(1, "alpha beta")], columns=["poi_id", "name"]))
    gdf = spark.createDataFrame(
        pd.DataFrame([(2, "beta gamma")], columns=["gaz_id", "gaz_name"]))
    out = gazetteer_match(ndf, gdf, max_block_df=5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan

# ---------------------------------------------------------------------------
# conflate_pois
# ---------------------------------------------------------------------------

def _conflate(spark, rows, cols=("poi_id", "name"), **kw):
    df = spark.createDataFrame(pd.DataFrame(rows, columns=list(cols)))
    from osm_poi_cloud_spark.operators.geocode import conflate_pois

    return (conflate_pois(df, **kw)
            .toPandas().sort_values("poi_id").reset_index(drop=True))


def test_conflate_transitive_chain(spark):
    # J(1,2) = 3/4, J(2,3) = 2/4 = exactly the inclusive threshold,
    # J(1,3) = 2/5 BELOW it: 3 joins the cluster only via transitivity
    rows = [(1, "g7 alpha beta gamma"),
            (2, "g7 alpha beta"),
            (3, "g7 alpha delta"),
            (9, "totally unrelated venue")]
    got = _conflate(spark, rows, min_jaccard_ppm=500_000)
    by = got.set_index("poi_id")
    assert by.loc[1, "canonical_id"] == 1
    assert by.loc[2, "canonical_id"] == 1
    assert by.loc[3, "canonical_id"] == 1       # transitive closure
    assert by.loc[9, "canonical_id"] == 9       # singleton kept
    assert by.loc[1, "cluster_size"] == 3 and by.loc[9, "cluster_size"] == 1


def test_conflate_cell_gate_blocks_cross_cell(spark):
    rows = [(1, "blue bottle coffee", "cA"),
            (2, "blue bottle coffee", "cA"),
            (3, "blue bottle coffee", "cB")]   # identical name, other cell
    got = _conflate(spark, rows, cols=("poi_id", "name", "cell"),
                    cell_col="cell")
    by = got.set_index("poi_id")
    assert by.loc[1, "canonical_id"] == 1 and by.loc[2, "canonical_id"] == 1
    assert by.loc[3, "canonical_id"] == 3 and by.loc[3, "cluster_size"] == 1


def test_conflate_empty_names_and_threshold_validation(spark):
    rows = [(1, "cafe roma"), (2, "!!!"), (3, "cafe roma")]
    got = _conflate(spark, rows)
    by = got.set_index("poi_id")
    assert by.loc[2, "canonical_id"] == 2 and by.loc[2, "cluster_size"] == 1
    assert by.loc[3, "canonical_id"] == 1
    with pytest.raises(ValueError):
        _conflate(spark, rows, min_jaccard_ppm=0)
    with pytest.raises(ValueError):
        _conflate(spark, rows, max_block_df=0)


def test_conflate_matches_python_union_find(spark):
    """Independent recompute: brute-force all-pairs jaccard over a
    deterministic pseudo-corpus + union-find closure."""
    # Planted mix (a congruence over a 12-word vocab degenerates: any
    # linear one is a period-4 lattice of identical names, and 4 draws
    # from 12 words overlap so much that even scrambled variants leave
    # no singletons — verified in Python before wiring, per the
    # CLAUDE.md planted-fixture rule). Blocks of 3 chained variants
    # (m1-m2 below threshold, joined only transitively through m0) +
    # unique-token singletons.
    rows = []
    for i in range(36):
        c, m = i // 3, i % 3
        words = {0: (f"c{c}a", f"c{c}b", f"c{c}c"),
                 1: (f"c{c}a", f"c{c}b"),
                 2: (f"c{c}b", f"c{c}c", f"c{c}x")}[m]
        rows.append((i, " ".join(words)))
    rows += [(i, f"solo{i} only{i}") for i in range(36, 60)]
    got = _conflate(spark, rows, min_jaccard_ppm=400_000)

    import re

    def norm(s):
        return {t for t in re.sub("[^a-z0-9]+", " ", s.lower()).split() if t}

    toks = {i: norm(s) for i, s in rows}
    parent = {i: i for i, _ in rows}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i, ti in toks.items():
        for j, tj in toks.items():
            if i < j and ti and tj:
                inter = len(ti & tj)
                if inter and 1_000_000 * inter // (len(ti) + len(tj) - inter) >= 400_000:
                    ra, rb = find(i), find(j)
                    if ra != rb:
                        parent[max(ra, rb)] = min(ra, rb)
    exp_can = {i: find(i) for i, _ in rows}
    sizes = {}
    for c in exp_can.values():
        sizes[c] = sizes.get(c, 0) + 1
    got_d = {int(r.poi_id): (int(r.canonical_id), int(r.cluster_size))
             for r in got.itertuples()}
    assert got_d == {i: (c, sizes[c]) for i, c in exp_can.items()}
    # the fixture must actually exercise non-trivial clusters
    assert max(sizes.values()) >= 3 and min(sizes.values()) == 1
