"""HyperLogLog sketch: register exactness vs an independent XXH64
recompute, merge idempotence/commutativity, estimate accuracy within
the theoretical error bound, and partitioning independence."""

import sys

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from osm_poi_cloud_spark.operators import sketch as SK

sys.path.insert(0, "tools")


def _keys(spark, n, prefix="k"):
    return spark.createDataFrame(
        pd.DataFrame({"key": [f"{prefix}-{i}" for i in range(n)]}))


def test_registers_match_independent_xxh64(spark):
    """Register/rho recomputed with the from-spec XXH64 chain: low p
    bits (as unsigned) select the register, leading zeros of the high
    bits + 1 give rho — bit-exact vs the Spark build."""
    from make_goldens import xxh64

    p, seed = 8, 7
    df = _keys(spark, 300)
    got = (SK.hll_build(df, "key", p=p, seed=seed).toPandas()
           .set_index("register")["rho"].to_dict())

    expect: dict[int, int] = {}
    for i in range(300):
        seed_h = xxh64(int(seed).to_bytes(4, "little"), 42)
        u = xxh64(f"k-{i}".encode(), seed_h)  # unsigned 64-bit
        reg = u & ((1 << p) - 1)
        rest = u >> p
        width = 64 - p
        rho = width + 1 if rest == 0 else width - rest.bit_length() + 1
        expect[reg] = max(expect.get(reg, 0), rho)
    assert got == expect


def test_merge_idempotent_commutative_and_partition_independent(spark):
    a = SK.hll_build(_keys(spark, 500, "a"), "key", p=10)
    b = SK.hll_build(_keys(spark, 400, "b"), "key", p=10)

    def canon(df):
        return df.toPandas().sort_values("register").reset_index(drop=True)

    ab = canon(SK.hll_merge(a, b))
    ba = canon(SK.hll_merge(b, a))
    pd.testing.assert_frame_equal(ab, ba)
    # self-merge is a no-op (safe re-aggregation in a lake)
    aa = canon(SK.hll_merge(a, a))
    pd.testing.assert_frame_equal(aa, canon(a))
    # sketch of the union == merge of the sketches
    both = _keys(spark, 500, "a").union(_keys(spark, 400, "b"))
    pd.testing.assert_frame_equal(canon(SK.hll_build(both, "key", p=10)), ab)
    # partitioning independence
    pd.testing.assert_frame_equal(
        canon(SK.hll_build(both.repartition(13), "key", p=10)), ab)


@pytest.mark.parametrize("n", [50, 1000, 20000])
def test_estimate_within_error_bound(spark, n):
    """~1.04/sqrt(m) relative error at p=12 (~1.6%); allow 4 sigma."""
    est = SK.approx_distinct(_keys(spark, n), "key", p=12)
    rel = abs(est - n) / n
    assert rel < 4 * 1.04 / np.sqrt(1 << 12), (n, est, rel)


def test_duplicates_do_not_inflate(spark):
    base = _keys(spark, 800)
    dup3 = base.union(base).union(base)
    e1 = SK.approx_distinct(base, "key", p=12)
    e3 = SK.approx_distinct(dup3, "key", p=12)
    assert e1 == e3  # identical sketch, identical estimate


def test_empty_input_estimates_zero(spark):
    empty = _keys(spark, 100).filter("1 = 0")
    assert SK.approx_distinct(empty, "key", p=10) == 0.0


def test_register_table_is_bounded(spark):
    sk = SK.hll_build(_keys(spark, 50000), "key", p=8)
    assert sk.count() <= 256


def test_validation(spark):
    with pytest.raises(ValueError):
        SK.hll_build(_keys(spark, 5), "key", p=2)


# ---------------------------------------------------------------------------
# count-min
# ---------------------------------------------------------------------------

def _zipf(spark, n_rows=6000):
    """Zipf-ish key stream: key i appears ~ 1200/i times."""
    rows = []
    for i in range(1, 60):
        rows.extend([f"key-{i}"] * max(1200 // i, 1))
    rows = rows[:n_rows]
    return spark.createDataFrame(pd.DataFrame({"key": rows})), pd.Series(rows).value_counts()


def test_cm_upper_bound_and_heavy_hitter_accuracy(spark):
    df, truth = _zipf(spark)
    sk = SK.cm_build(df, "key", width=1024, depth=4).cache()
    assert sk.count() <= 1024 * 4
    cand = spark.createDataFrame(pd.DataFrame({"key": list(truth.index)}))
    est = (SK.cm_query(cand, sk, "key", width=1024, depth=4)
           .toPandas().set_index("key")["est_count"])
    for k, true_n in truth.items():
        assert est[k] >= true_n, k                  # one-sided guarantee
        assert est[k] <= true_n + len(df.toPandas()) * (2.72 / 1024) * 3, k
    # heavy hitters are near-exact at this width
    for k in ("key-1", "key-2", "key-3"):
        assert est[k] == truth[k], k
    # absent key estimates are small (possibly >0 from collisions)
    ghost = spark.createDataFrame(pd.DataFrame({"key": ["never-seen"]}))
    g = SK.cm_query(ghost, sk, "key", width=1024, depth=4).first()["est_count"]
    assert g < 60


def test_cm_merge_is_additive_and_partition_independent(spark):
    df, truth = _zipf(spark)
    half1 = df.limit(3000)
    # second "day": same stream again
    sk_all2 = SK.cm_build(df.union(df), "key", width=512, depth=3)
    merged = SK.cm_merge(SK.cm_build(df, "key", width=512, depth=3),
                         SK.cm_build(df.repartition(9), "key", width=512, depth=3))

    def canon(s):
        return s.toPandas().sort_values(["row", "bucket"]).reset_index(drop=True)

    pd.testing.assert_frame_equal(canon(merged), canon(sk_all2))


def test_cm_weighted_counts(spark):
    df = spark.createDataFrame(pd.DataFrame({
        "key": ["a", "a", "b"], "w": [5, 7, 100]}))
    sk = SK.cm_build(df, "key", width=256, depth=3, weight_col="w")
    est = (SK.cm_query(spark.createDataFrame(pd.DataFrame({"key": ["a", "b"]})),
                       sk, "key", width=256, depth=3)
           .toPandas().set_index("key")["est_count"])
    assert est["a"] == 12 and est["b"] == 100


def test_cm_validation(spark):
    df = _keys(spark, 5)
    with pytest.raises(ValueError):
        SK.cm_build(df, "key", width=0)


# ---------------------------------------------------------------------------
# KMV / bottom-k
# ---------------------------------------------------------------------------

def test_kmv_merge_is_exact_identity(spark):
    """Bottom-k of a union EQUALS bottom-k over concatenated sketches —
    the lossless-rollup property, asserted bitwise."""
    a = _keys(spark, 3000)
    b = (_keys(spark, 5000).withColumn(
        "key", F.concat(F.lit("other-"), F.col("key"))))
    k = 128
    direct = SK.kmv_build(a.union(b), "key", k=k).toPandas()
    merged = SK.kmv_merge(SK.kmv_build(a, "key", k=k),
                          SK.kmv_build(b, "key", k=k), k=k).toPandas()
    assert sorted(direct["h"]) == sorted(merged["h"])
    assert sorted(direct["id"]) == sorted(merged["id"])


def test_kmv_distinct_exact_below_capacity(spark):
    sk = SK.kmv_build(_keys(spark, 100), "key", k=256)
    row = SK.kmv_distinct_estimate(sk, 256).first()
    assert row["n_kept"] == 100 and row["estimate"] == 100.0


def test_kmv_distinct_estimator_at_capacity(spark):
    n = 20000
    sk = SK.kmv_build(_keys(spark, n), "key", k=512)
    est = SK.kmv_distinct_estimate(sk, 512).first()["estimate"]
    # KMV relative error ~ 1/sqrt(k-1) ~ 4.4%; allow 4 sigma
    assert abs(est - n) / n < 0.18


def test_kmv_quantiles_match_independent_selection(spark):
    """Quantiles == the stated rule (sorted sample, index ceil(p*n)-1)
    recomputed independently in numpy over the same sample."""
    import numpy as np
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    sk = SK.kmv_build(docs, "doc_id", value_col="n_chars", k=64)
    probs = [0.1, 0.25, 0.5, 0.75, 0.9, 1.0]
    got = SK.kmv_quantiles(sk, probs).toPandas().set_index("prob")["q"]
    pdf = sk.toPandas().sort_values(["val", "h"]).reset_index(drop=True)
    n = len(pdf)
    for p in probs:
        idx = max(int(np.ceil(p * n)), 1) - 1
        assert got[p] == pdf.loc[idx, "val"], p


def test_kmv_deterministic_and_takeordered_plan(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = SK.kmv_build(docs, "doc_id", k=32).toPandas()
    b = SK.kmv_build(docs.repartition(13), "doc_id", k=32).toPandas()
    assert list(a["h"]) == list(b["h"])  # partitioning-independent
    plan = SK.kmv_build(docs, "doc_id", k=32) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan  # per-partition heaps, no full sort


def test_kmv_merge_value_conflict_deterministic(spark):
    """Merging sketches where the same id carries DIFFERENT values
    (table versions) must pick a deterministic winner (min struct),
    independent of partitioning / input order."""
    import pandas as pd
    a = spark.createDataFrame(pd.DataFrame(
        {"doc_id": range(100), "v": [10] * 100}))
    b = spark.createDataFrame(pd.DataFrame(
        {"doc_id": range(100), "v": [20] * 100}))
    sa = SK.kmv_build(a, "doc_id", value_col="v", k=64)
    sb = SK.kmv_build(b, "doc_id", value_col="v", k=64)
    m1 = SK.kmv_merge(sa, sb, k=64).toPandas().sort_values("h").reset_index(drop=True)
    m2 = SK.kmv_merge(sb.repartition(7), sa.repartition(3), k=64) \
        .toPandas().sort_values("h").reset_index(drop=True)
    assert m1.equals(m2)
    # min-struct rule: same id on both sides -> the smaller (id, val)
    # struct wins, i.e. val 10 everywhere
    assert (m1["val"] == 10).all()


def test_kmv_set_estimates(spark):
    """Bottom-k set operations: exact below capacity, bounded error at
    capacity, partitioning-independent."""
    a = spark.range(0, 1000).selectExpr("id AS doc_id")
    b = spark.range(500, 1500).selectExpr("id AS doc_id")
    # below capacity: EXACT (sketches hold every id)
    sa = SK.kmv_build(a, "doc_id", k=4096)
    sb = SK.kmv_build(b, "doc_id", k=4096)
    row = SK.kmv_set_estimates(sa, sb, k=4096).first()
    assert row["k_used"] == 1500 and row["n_shared"] == 500
    assert row["jaccard_est"] == 500 / 1500
    assert row["union_est"] == 1500.0
    assert row["intersection_est"] == 500.0
    # at capacity: estimates within the k^-1/2 error regime
    sa2 = SK.kmv_build(a, "doc_id", k=256)
    sb2 = SK.kmv_build(b, "doc_id", k=256)
    est = SK.kmv_set_estimates(sa2, sb2, k=256).first()
    assert est["k_used"] == 256
    assert abs(est["jaccard_est"] - 1 / 3) < 0.12
    assert abs(est["union_est"] - 1500) / 1500 < 0.25
    assert abs(est["intersection_est"] - 500) / 500 < 0.45
    # deterministic under any partitioning
    est2 = SK.kmv_set_estimates(
        SK.kmv_build(a.repartition(7), "doc_id", k=256),
        SK.kmv_build(b.repartition(3), "doc_id", k=256), k=256).first()
    assert est2 == est


# ---------------------------------------------------------------------------
# grouped HLL + tile pyramid rollup
# ---------------------------------------------------------------------------

def test_grouped_build_equals_per_group_build(spark):
    rows = [(f"g{i % 3}", f"k{i % 40}") for i in range(500)]
    df = spark.createDataFrame(rows, "grp string, key string")
    grouped = SK.hll_build_grouped(df, "key", ["grp"], p=8)
    got = {(r["grp"], r["register"]): r["rho"] for r in grouped.collect()}
    for g in ("g0", "g1", "g2"):
        solo = SK.hll_build(df.filter(F.col("grp") == g), "key", p=8)
        exp = {(g, r["register"]): r["rho"] for r in solo.collect()}
        assert {k: v for k, v in got.items() if k[0] == g} == exp


def test_grouped_estimate_accuracy_and_bound(spark):
    rows = [(f"g{i % 4}", f"k{i}") for i in range(8000)]  # 2000 distinct/grp
    df = spark.createDataFrame(rows, "grp string, key string")
    sk = SK.hll_build_grouped(df, "key", ["grp"], p=10)
    assert sk.count() <= 4 * (1 << 10)
    for r in SK.hll_estimate_grouped(sk, ["grp"], p=10).collect():
        assert abs(r["estimate"] - 2000) / 2000 < 0.15, r


def test_tile_pyramid_nesting_identity(spark):
    """Parent registers must equal the max-merge of their 4 children —
    the sketch algebra that lets a stored pyramid re-aggregate to any
    coarser zoom without raw data."""
    from osm_poi_cloud_spark.operators.tiling import hll_tile_pyramid

    pts = spark.sql(
        "SELECT id AS poi_id, "
        "CAST((id * 7919) % 36000 AS DOUBLE) / 100.0 - 180.0 AS lon, "
        "CAST((id * 104729) % 17000 AS DOUBLE) / 100.0 - 85.0 AS lat, "
        "concat('v', CAST(id % 97 AS STRING)) AS visitor "
        "FROM range(400)")
    regs = hll_tile_pyramid(pts, "visitor", min_zoom=3, max_zoom=5, p=8)
    by_tile = {}
    for r in regs.collect():
        by_tile.setdefault((r["z"], r["x"], r["y"]), {})[r["register"]] = r["rho"]
    for (z, x, y), d in by_tile.items():
        if z == 5:
            continue
        merged = {}
        for (cz, cx, cy), cd in by_tile.items():
            if cz == z + 1 and cx >> 1 == x and cy >> 1 == y:
                for reg, rho in cd.items():
                    merged[reg] = max(merged.get(reg, 0), rho)
        assert merged == d, (z, x, y)


def test_tile_pyramid_single_shuffle(spark):
    from osm_poi_cloud_spark.operators.tiling import hll_tile_pyramid

    pts = spark.sql(
        "SELECT id, CAST(id AS DOUBLE) / 10.0 - 20.0 AS lon, "
        "CAST(id AS DOUBLE) / 20.0 AS lat, "
        "CAST(id % 7 AS STRING) AS visitor FROM range(100)")
    plan = (hll_tile_pyramid(pts, "visitor", min_zoom=2, max_zoom=6, p=8)
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("Exchange") == 1


def test_grouped_validation(spark):
    df = spark.createDataFrame([("a", "b")], "grp string, key string")
    with pytest.raises(ValueError):
        SK.hll_build_grouped(df, "key", [], p=8)
    with pytest.raises(ValueError):
        SK.hll_build_grouped(df, "key", ["grp"], p=3)


def test_hll_set_estimates(spark):
    a = spark.range(0, 1000).selectExpr("concat('k', id) AS key")
    b = spark.range(500, 1500).selectExpr("concat('k', id) AS key")
    sa = SK.hll_build(a, "key", p=12)
    sb = SK.hll_build(b, "key", p=12)
    r = SK.hll_set_estimates(sa, sb, p=12).first()
    assert abs(r["est_a"] - 1000) / 1000 < 0.1
    assert abs(r["union_est"] - 1500) / 1500 < 0.1
    assert abs(r["intersection_est"] - 500) / 500 < 0.35
    assert 0.0 <= r["jaccard_est"] <= 1.0
    assert abs(r["jaccard_est"] - 1 / 3) < 0.12
    # disjoint sets: intersection clamps at >= 0
    c = spark.range(5000, 6000).selectExpr("concat('k', id) AS key")
    r2 = SK.hll_set_estimates(sa, SK.hll_build(c, "key", p=12), p=12).first()
    assert r2["intersection_est"] < 120
    assert r2["jaccard_est"] < 0.08


# --- fixed-bin mergeable histogram ---

def test_hist_bin_rule_and_clamp(spark):
    import math
    vals = [-5.0, 0.0, 0.001, 31.25, 62.5, 99.99, 100.0, 250.0, None,
            float("nan")]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    got = dict((r["bin"], r["cnt"])
               for r in SK.hist_build(df, "v", 0.0, 100.0, 32).collect())
    exp = {}
    for v in vals:
        if v is None or v != v:
            continue
        b = min(max(math.floor((v - 0.0) * 32.0 / 100.0), 0), 31)
        exp[b] = exp.get(b, 0) + 1
    assert got == exp
    assert sum(got.values()) == 8          # NULL and NaN dropped


def test_hist_merge_equals_rebuild(spark):
    df = spark.range(10000).selectExpr("CAST(id % 997 AS DOUBLE) AS v")
    a = df.filter("id % 2 = 0")
    b = df.filter("id % 2 = 1")
    merged = sorted(map(tuple, SK.hist_merge(
        SK.hist_build(a, "v", 0.0, 1000.0, 64),
        SK.hist_build(b, "v", 0.0, 1000.0, 64)).collect()))
    rebuilt = sorted(map(tuple, SK.hist_build(
        df, "v", 0.0, 1000.0, 64).collect()))
    assert merged == rebuilt


def test_hist_quantiles_definition(spark):
    import math
    n, bins = 5000, 50
    df = spark.range(n).selectExpr("CAST(id AS DOUBLE) AS v")
    h = SK.hist_build(df, "v", 0.0, 5000.0, bins)
    got = {r["prob"]: (r["bin"], r["q_lo"])
           for r in SK.hist_quantiles(h, [0.1, 0.5, 0.9, 1.0],
                                      0.0, 5000.0, bins).collect()}
    # independent: bins are uniform 100 rows each; definition = first
    # bin whose cumulative reaches ceil(p * total)
    counts = [100] * bins
    for p in (0.1, 0.5, 0.9, 1.0):
        target = math.ceil(p * n)
        cum = 0
        for b, c in enumerate(counts):
            cum += c
            if cum >= target:
                assert got[p] == (b, b * 100.0), p
                break


def test_hist_validation(spark):
    df = spark.range(5).selectExpr("CAST(id AS DOUBLE) AS v")
    with pytest.raises(ValueError):
        SK.hist_build(df, "v", 0.0, 1.0, 0)
    with pytest.raises(ValueError):
        SK.hist_build(df, "v", 2.0, 1.0)
    h = SK.hist_build(df, "v", 0.0, 1.0, 4)
    with pytest.raises(ValueError):
        SK.hist_quantiles(h, [], 0.0, 1.0, 4)
    with pytest.raises(ValueError):
        SK.hist_quantiles(h, [0.0], 0.0, 1.0, 4)


def test_hist_build_grouped(spark):
    df = spark.range(6000).selectExpr(
        "CAST(id % 3 AS STRING) AS grp", "CAST(id % 977 AS DOUBLE) AS v")
    grouped = SK.hist_build_grouped(df, "v", ["grp"], 0.0, 1000.0, 32) \
        .toPandas()
    # grouped == per-group build, group by group
    for g in ("0", "1", "2"):
        solo = sorted(map(tuple, SK.hist_build(
            df.filter(F.col("grp") == g), "v", 0.0, 1000.0, 32).collect()))
        sub = grouped[grouped["grp"] == g]
        assert sorted(zip(sub["bin"], sub["cnt"])) == solo
    # coarser rollup by SUM == ungrouped build
    total = sorted(map(tuple, SK.hist_build(
        df, "v", 0.0, 1000.0, 32).collect()))
    roll = sorted(map(tuple, grouped.groupby("bin")["cnt"].sum()
                      .reset_index().itertuples(index=False)))
    assert roll == total
    with pytest.raises(ValueError):
        SK.hist_build_grouped(df, "v", [], 0.0, 1.0)
