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
