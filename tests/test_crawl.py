"""Polite crawl scheduling (operators/crawl.py)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from osm_poi_cloud_spark.operators import crawl as cw


@pytest.fixture(scope="module")
def frontier(spark):
    rows = [(i, f"h{i % 5}.example.com", f"https://h{i % 5}.example.com/p/{i}",
             100 * (1 + i % 5)) for i in range(200)]
    return spark.createDataFrame(
        rows, "doc_id long, host string, url string, delay_ms long")


def test_schedule_matches_pandas_recompute(spark, frontier):
    out = cw.schedule_fetches(
        frontier, host_col="host", order_col="doc_id",
        delay_ms_col="delay_ms").toPandas()
    pdf = frontier.toPandas().sort_values(["host", "doc_id"])
    pdf["slot"] = pdf.groupby("host").cumcount()
    pdf["fetch_at_ms"] = pdf["slot"] * pdf["delay_ms"]
    merged = out.set_index("doc_id").join(
        pdf.set_index("doc_id"), rsuffix="_exp")
    assert (merged["slot"] == merged["slot_exp"]).all()
    assert (merged["fetch_at_ms"] == merged["fetch_at_ms_exp"]).all()


def test_per_host_politeness_invariants(spark, frontier):
    out = cw.schedule_fetches(
        frontier, host_col="host", order_col="doc_id",
        delay_ms_col="delay_ms").toPandas()
    for host, grp in out.sort_values("slot").groupby("host"):
        # slots dense from 0, fetch times strictly spaced by the delay
        assert grp["slot"].tolist() == list(range(len(grp)))
        gaps = grp["fetch_at_ms"].diff().dropna().unique().tolist()
        assert gaps == [grp["delay_ms"].iloc[0]]
        # one worker per host (politeness survives distribution)
        assert grp["worker"].nunique() == 1


def test_cycle_cap_defers_tail(spark, frontier):
    out = cw.schedule_fetches(
        frontier, host_col="host", order_col="doc_id",
        max_per_host=7).toPandas()
    assert (out["deferred"] == (out["slot"] >= 7)).all()
    # every host keeps exactly 7 live rows (40 queued per host here)
    live = out[~out["deferred"]].groupby("host").size()
    assert (live == 7).all()
    stats = cw.cycle_stats(
        cw.schedule_fetches(frontier, host_col="host", order_col="doc_id",
                            max_per_host=7)).toPandas().set_index("host")
    assert (stats["n_queued"] == 40).all()
    assert (stats["n_deferred"] == 33).all()


def test_default_worker_is_stable_hash(spark, frontier):
    a = cw.schedule_fetches(frontier, host_col="host", order_col="doc_id",
                            n_workers=16).toPandas()
    b = cw.schedule_fetches(frontier.repartition(7), host_col="host",
                            order_col="doc_id", n_workers=16).toPandas()
    wa = a.groupby("host")["worker"].first().sort_index()
    wb = b.groupby("host")["worker"].first().sort_index()
    assert wa.equals(wb)
    assert wa.between(0, 15).all()


def test_single_shuffle_plan(spark, frontier):
    out = cw.schedule_fetches(frontier, host_col="host", order_col="doc_id")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1


def test_validation():
    with pytest.raises(ValueError):
        cw.schedule_fetches(None, default_delay_ms=-1)
    with pytest.raises(ValueError):
        cw.schedule_fetches(None, n_workers=0)
    with pytest.raises(ValueError):
        cw.schedule_fetches(None, max_per_host=0)
