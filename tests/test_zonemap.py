"""Zone maps / data skipping (operators/zonemap.py)."""

import pytest
from pyspark.sql import functions as F

from osm_poi_cloud_spark.operators import zonemap as zm


@pytest.fixture(scope="module")
def table(spark):
    # zone = id // 100: val clustered with the zone, noise uncorrelated,
    # zone 7 carries NULLs only
    rows = []
    for i in range(1000):
        z = i // 100
        val = None if z == 7 else float(z * 1000 + (i * 37) % 100)
        rows.append((i, z, val, float((i * 7919) % 500)))
    return spark.createDataFrame(rows, "id long, zone long, val double, noise double")


def test_stats_match_pandas(spark, table):
    got = zm.build_zone_map(table, ["zone"], ["val", "noise"]).toPandas()
    pdf = table.toPandas()
    for _, r in got.iterrows():
        grp = pdf[pdf.zone == r["zone"]]
        assert r["n_rows"] == len(grp)
        if r["zone"] == 7:
            import pandas as pd
            assert pd.isna(r["val_min"]) and pd.isna(r["val_max"])
            assert r["val_nulls"] == 100
        else:
            assert r["val_min"] == grp.val.min()
            assert r["val_max"] == grp.val.max()
            assert r["val_nulls"] == 0
        assert r["noise_min"] == grp.noise.min()


def test_skip_soundness(spark, table):
    """Scanning only kept zones must return exactly the full-scan
    predicate rows — the invariant that makes skipping safe."""
    zmap = zm.build_zone_map(table, ["zone"], ["val"])
    lo, hi = 2000.0, 3099.0
    kept = zm.zones_for_range(zmap, "val", lo, hi).select("zone")
    pruned_scan = (table.join(kept, "zone")
                   .filter(F.col("val").between(lo, hi)))
    full_scan = table.filter(F.col("val").between(lo, hi))
    a = sorted(r["id"] for r in pruned_scan.collect())
    b = sorted(r["id"] for r in full_scan.collect())
    assert a == b and len(a) == 200
    # and it actually skips: clustered zones 2..3 plus the all-NULL zone
    kept_zones = {r["zone"] for r in kept.collect()}
    assert kept_zones == {2, 3, 7}


def test_all_null_zone_never_skipped(spark, table):
    zmap = zm.build_zone_map(table, ["zone"], ["val"])
    kept = {r["zone"] for r in
            zm.zones_for_range(zmap, "val", -1e9, 1e9).collect()}
    assert 7 in kept


def test_pruning_report(spark, table):
    zmap = zm.build_zone_map(table, ["zone"], ["val"])
    r = zm.pruning_report(zmap, "val", 2000.0, 3099.0).first()
    assert r["zones_total"] == 10 and r["zones_read"] == 3
    assert r["rows_total"] == 1000 and r["rows_read"] == 300


def test_single_aggregation_plan(spark, table):
    plan = (zm.build_zone_map(table, ["zone"], ["val", "noise"])
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("Exchange") == 1  # one partial+final agg


def test_validation(spark, table):
    with pytest.raises(ValueError):
        zm.build_zone_map(table, [], ["val"])
    with pytest.raises(ValueError):
        zm.build_zone_map(table, ["zone"], [])


def test_merge_equals_rebuild(spark, table):
    half_a = table.filter(F.col("id") < 500)
    half_b = table.filter(F.col("id") >= 500)
    merged = zm.merge_zone_maps(
        zm.build_zone_map(half_a, ["zone"], ["val", "noise"]),
        zm.build_zone_map(half_b, ["zone"], ["val", "noise"]),
        ["zone"])
    rebuilt = zm.build_zone_map(table, ["zone"], ["val", "noise"])
    a = sorted(map(tuple, merged.collect()))
    b = sorted(map(tuple, rebuilt.collect()))
    assert [tuple(x if x == x else None for x in r) for r in a] \
        == [tuple(x if x == x else None for x in r) for r in b]


def test_merge_validation(spark, table):
    m = zm.build_zone_map(table, ["zone"], ["val"])
    with pytest.raises(ValueError):
        zm.merge_zone_maps(m, m, [])
    with pytest.raises(ValueError):
        zm.merge_zone_maps(m, m.drop("val_min"), ["zone"])
