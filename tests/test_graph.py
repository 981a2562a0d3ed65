"""PageRank: independent numpy power-iteration oracle, dangling-mass
conservation, damping validation, checkpoint-dir restore."""

import numpy as np
import pandas as pd
import pytest

from osm_poi_cloud_spark.operators.graph import pagerank


def _numpy_pagerank(edges, n, iters=20, d=0.85):
    """Dense power iteration written from the same definition,
    independently: column-stochastic with uniform dangling fix."""
    out_deg = np.zeros(n)
    for s, _ in edges:
        out_deg[s] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        dangling = r[out_deg == 0].sum()
        inflow = np.zeros(n)
        for s, t in edges:
            inflow[t] += r[s] / out_deg[s]
        r = (1 - d) / n + d * (inflow + dangling / n)
    return r


def _run(spark, edges, n_unused=None, iters=20, **kw):
    df = spark.createDataFrame(pd.DataFrame(edges, columns=["src", "dst"]))
    got = pagerank(df, iters=iters, **kw).toPandas().set_index("node")["rank"]
    # numpy oracle over the PRESENT node set (dense renumbering)
    present = sorted({v for e in edges for v in e})
    idx = {v: i for i, v in enumerate(present)}
    dense = [(idx[s], idx[t]) for s, t in edges]
    exp = _numpy_pagerank(dense, len(present), iters=iters)
    np.testing.assert_allclose(got.loc[present].to_numpy(), exp,
                               rtol=1e-9, atol=1e-12)
    return got


def test_classic_small_graph(spark):
    # 0 -> 1, 0 -> 2, 1 -> 2, 2 -> 0 : the textbook example
    edges = [(0, 1), (0, 2), (1, 2), (2, 0)]
    got = _run(spark, edges, 3)
    assert got.sum() == pytest.approx(1.0, abs=1e-9)
    assert got.loc[2] > got.loc[1] > 0  # 2 receives from both 0 and 1


def test_dangling_mass_conserved(spark):
    # node 2 is a sink (no out-links): total mass must stay 1.0
    edges = [(0, 1), (1, 2), (0, 2)]
    got = _run(spark, edges, 3, iters=15)
    assert got.sum() == pytest.approx(1.0, abs=1e-9)
    assert got.loc[2] > got.loc[1]


def test_parallel_edges_collapse(spark):
    # duplicated (0,1) edges must not double 0's vote to 1
    e_dup = [(0, 1), (0, 1), (0, 2), (1, 0), (2, 0)]
    e_simple = [(0, 1), (0, 2), (1, 0), (2, 0)]
    df = pd.DataFrame(e_dup, columns=["src", "dst"])
    got = pagerank(spark.createDataFrame(df), iters=10).toPandas() \
        .set_index("node")["rank"]
    exp = _numpy_pagerank(e_simple, 3, iters=10)
    np.testing.assert_allclose(got.loc[[0, 1, 2]].to_numpy(), exp, rtol=1e-9)


def test_star_graph_authority(spark):
    # many pages linking one hub (which links only node 0): the hub and
    # its sole target far outrank the leaf pages
    edges = [(i, 99) for i in range(20)] + [(99, 0)]
    got = _run(spark, edges, 100, iters=10)
    leaves = got.drop([99, 0])
    assert got.loc[99] > leaves.max() * 10
    assert got.loc[0] > leaves.max() * 10


def test_validation_and_checkpoint_restore(spark, tmp_path):
    df = spark.createDataFrame(pd.DataFrame([(0, 1)], columns=["src", "dst"]))
    with pytest.raises(ValueError):
        pagerank(df, iters=0)
    with pytest.raises(ValueError):
        pagerank(df, damping=1.0)
    # reliable-checkpoint route runs and restores the (unset) dir
    sc = spark.sparkContext
    before = sc._jsc.sc().getCheckpointDir()
    out = pagerank(df, iters=3, checkpoint_dir=str(tmp_path)).toPandas()
    after = sc._jsc.sc().getCheckpointDir()
    assert len(out) == 2
    assert before.isDefined() == after.isDefined()


# --- HITS hubs & authorities ---

def _numpy_hits(edges, n, iters=20):
    """Dense HITS from the definition: auth from hubs, L2 normalize,
    hubs from the NEW auths, L2 normalize."""
    hub = np.full(n, 1.0 / np.sqrt(n))
    auth = np.full(n, 1.0 / np.sqrt(n))
    for _ in range(iters):
        auth = np.zeros(n)
        for s, t in edges:
            auth[t] += hub[s]
        nrm = np.sqrt((auth * auth).sum())
        auth = auth / nrm if nrm > 0 else auth
        hub = np.zeros(n)
        for s, t in edges:
            hub[s] += auth[t]
        nrm = np.sqrt((hub * hub).sum())
        hub = hub / nrm if nrm > 0 else hub
    return hub, auth


def _run_hits(spark, edges, iters=20, **kw):
    from osm_poi_cloud_spark.operators.graph import hits

    df = spark.createDataFrame(pd.DataFrame(edges, columns=["src", "dst"]))
    got = hits(df, iters=iters, **kw).toPandas().set_index("node")
    present = sorted({v for e in edges for v in e})
    idx = {v: i for i, v in enumerate(present)}
    hub, auth = _numpy_hits([(idx[s], idx[t]) for s, t in edges],
                            len(present), iters=iters)
    np.testing.assert_allclose(got.loc[present]["hub"].to_numpy(), hub,
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(got.loc[present]["authority"].to_numpy(),
                               auth, rtol=1e-9, atol=1e-12)
    return got


def test_hits_matches_numpy_oracle(spark):
    rng = np.random.RandomState(5)
    edges = list({(int(a), int(b)) for a, b in rng.randint(0, 40, (200, 2))
                  if a != b})
    _run_hits(spark, edges, iters=15)


def test_hits_hub_vs_authority_separation(spark):
    # 0 links to 1..6 INCLUDING the top authority (pure directory);
    # 1..5 link only to 6 (6 = pure authority target)
    edges = [(0, i) for i in range(1, 7)] + [(i, 6) for i in range(1, 6)]
    got = _run_hits(spark, edges, iters=20)
    assert got.loc[0]["hub"] == got["hub"].max()      # the directory page
    assert got.loc[0]["hub"] > got.loc[1]["hub"]      # strictly
    assert got.loc[0]["authority"] == 0.0             # nothing links to 0
    assert got.loc[6]["authority"] == got["authority"].max()
    assert got.loc[6]["hub"] == 0.0                   # 6 links nowhere
    # L2 norms are 1
    assert abs((got["hub"] ** 2).sum() - 1.0) < 1e-9
    assert abs((got["authority"] ** 2).sum() - 1.0) < 1e-9


def test_hits_parallel_edges_and_validation(spark):
    from osm_poi_cloud_spark.operators.graph import hits

    once = _run_hits(spark, [(0, 1), (1, 2), (2, 0)], iters=8)
    dup = spark.createDataFrame(
        pd.DataFrame([(0, 1), (0, 1), (1, 2), (2, 0)],
                     columns=["src", "dst"]))
    got = hits(dup, iters=8).toPandas().set_index("node")
    np.testing.assert_allclose(got["hub"].to_numpy(),
                               once["hub"].to_numpy(), rtol=1e-12)
    with pytest.raises(ValueError):
        hits(dup, iters=0)


# ---------------------------------------------------------------------------
# label propagation communities
# ---------------------------------------------------------------------------

def _python_lpa(edges, iters, weights=None):
    """Independent pure-Python synchronous LPA, written from the
    definition: symmetrize, drop self-loops, merge parallel edges
    (unweighted: one vote per distinct undirected pair; weighted: sum
    across both orientations), per round every node adopts the
    max-total-weight neighbor label, ties to the MIN label."""
    adj = {}
    for i, (a, b) in enumerate(edges):
        if a == b:
            continue
        w = 1.0 if weights is None else float(weights[i])
        for x, y in ((a, b), (b, a)):
            adj.setdefault(x, {})
            if weights is None:
                adj[x][y] = 1.0
            else:
                adj[x][y] = adj[x].get(y, 0.0) + w
    labels = {v: v for v in adj}
    for _ in range(iters):
        new = {}
        for v, nbrs in adj.items():
            tally = {}
            for u, w in nbrs.items():
                tally[labels[u]] = tally.get(labels[u], 0.0) + w
            new[v] = min(tally, key=lambda l: (-tally[l], l))
        labels = new
    return labels


def _run_lpa(spark, edges, iters=10, weights=None, **kw):
    from osm_poi_cloud_spark.operators.graph import label_communities

    if weights is None:
        df = spark.createDataFrame(
            pd.DataFrame(edges, columns=["src", "dst"]))
        got = label_communities(df, iters=iters, **kw)
    else:
        df = spark.createDataFrame(
            pd.DataFrame([(a, b, w) for (a, b), w in zip(edges, weights)],
                         columns=["src", "dst", "w"]))
        got = label_communities(df, iters=iters, weight_col="w", **kw)
    got = got.toPandas().set_index("node")["community"].to_dict()
    exp = _python_lpa(edges, iters, weights=weights)
    assert got == exp
    return got


def test_lpa_two_cliques_bridge(spark):
    """Two planted 5-cliques + one bridge edge: LPA must keep them in
    two distinct communities, each converging to its min node id."""
    import itertools

    c1 = list(itertools.combinations(range(5), 2))
    c2 = list(itertools.combinations(range(10, 15), 2))
    edges = c1 + c2 + [(4, 10)]
    got = _run_lpa(spark, edges, iters=8)
    assert len({got[v] for v in range(5)}) == 1
    assert len({got[v] for v in range(10, 15)}) == 1
    assert got[0] != got[10]


def test_lpa_parallel_and_reverse_edges_collapse(spark):
    base = [(0, 1), (1, 2), (2, 0), (3, 4)]
    noisy = base + [(1, 0), (0, 1), (2, 1), (4, 3)]
    assert _run_lpa(spark, base, iters=6) == _run_lpa(spark, noisy, iters=6)


def test_lpa_weighted_pull(spark):
    """Node 6 bridges cliques {0,1,2} and {3,4,5} with a BALANCED pair
    of edges: unweighted, its vote ties and the min label (community
    0) wins; raising the 6-3 edge to weight 2 pulls it into community
    3. (Heavily asymmetric shapes — star/appendage — oscillate under
    synchronous LPA, which the operator documents; this fixture was
    verified convergent by the pure-Python dynamics.)"""
    import itertools

    c1 = list(itertools.combinations(range(3), 2))
    c2 = list(itertools.combinations(range(3, 6), 2))
    edges = c1 + c2 + [(6, 2), (6, 3)]
    unw = _run_lpa(spark, edges, iters=8)
    assert unw[6] == unw[0] == 0            # tie -> min label
    wtd = _run_lpa(spark, edges, iters=8,
                   weights=[1.0] * (len(c1) + len(c2)) + [1.0, 2.0])
    assert wtd[6] == wtd[3] == 3            # weight flips the vote
    assert wtd[0] == wtd[1] == wtd[2] == 0  # cliques unaffected


def test_lpa_string_nodes_and_validation(spark):
    edges = [("a", "b"), ("b", "c"), ("a", "c"), ("x", "y")]
    got = _run_lpa(spark, edges, iters=5)
    assert got["a"] == got["b"] == got["c"] == "a"
    # an isolated PAIR is the canonical synchronous-LPA 2-cycle: the
    # two nodes swap labels every round (odd iters -> swapped). The
    # engine==oracle equality above is the contract; here just pin the
    # documented oscillation so nobody "fixes" it into silent merging
    assert got["x"] == "y" and got["y"] == "x"
    even = _run_lpa(spark, edges, iters=4)
    assert even["x"] == "x" and even["y"] == "y"
    from osm_poi_cloud_spark.operators.graph import label_communities

    df = spark.createDataFrame(pd.DataFrame(edges, columns=["src", "dst"]))
    with pytest.raises(ValueError):
        label_communities(df, iters=0)


def test_lpa_self_loops_and_nulls_dropped(spark):
    edges = [(0, 1), (1, 0), (2, 2)]
    df = spark.createDataFrame(
        pd.DataFrame(edges + [(None, 5), (5, None)], columns=["src", "dst"]),
        "src long, dst long")
    from osm_poi_cloud_spark.operators.graph import label_communities

    got = label_communities(df, iters=4).toPandas().set_index("node")["community"].to_dict()
    # node 2 has only a self-loop -> not in the graph at all; 5 only
    # null-partnered edges -> dropped too. (0, 1) is an isolated pair
    # -> the sync-LPA 2-cycle: even iters land on own labels.
    assert got == {0: 0, 1: 1}
    odd = label_communities(df, iters=3).toPandas() \
        .set_index("node")["community"].to_dict()
    assert odd == {0: 1, 1: 0}


def test_lpa_checkpoint_dir_restore(spark, tmp_path):
    from osm_poi_cloud_spark.operators.graph import label_communities

    sc = spark.sparkContext
    prev = sc._jsc.sc().getCheckpointDir()
    prev = prev.get() if prev.isDefined() else None
    df = spark.createDataFrame(
        pd.DataFrame([(0, 1), (1, 2)], columns=["src", "dst"]))
    out = label_communities(df, iters=4,
                            checkpoint_dir=str(tmp_path)).toPandas()
    # the point here is the checkpoint-dir restore contract, not the
    # dynamics; just require a full, valid labelling
    assert len(out) == 3 and set(out["community"]) <= {0, 1, 2}
    now = sc._jsc.sc().getCheckpointDir()
    now = now.get() if now.isDefined() else None
    assert now == prev
