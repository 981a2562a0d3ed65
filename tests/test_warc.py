"""WARC source: record round trips (plain + gzip members), multi-file
parallel read, and the WARC -> extraction pipeline end-to-end."""

import datetime as dt
import os

import pytest

from osm_poi_cloud_spark.sources import warc as W
from osm_poi_cloud_spark.sources import pages as pg


def _records(n, tag):
    base = dt.datetime(2026, 2, 1)
    out = []
    for i in range(n):
        html = (
            f"<html><head><title>{tag} page {i}</title></head>"
            f"<body><p>hello {tag} {i}</p></body></html>"
        ).encode()
        out.append((f"https://{tag}.example.org/p/{i}", base + dt.timedelta(seconds=i), html))
    return out


def test_warc_round_trip_plain_and_gzipped(tmp_path):
    recs = _records(25, "plain")
    p1 = str(tmp_path / "a.warc")
    p2 = str(tmp_path / "b.warc.gz")
    W.write_warc(p1, recs)
    W.write_warc(p2, recs, gzip_members=True)
    for p in (p1, p2):
        got = W.parse_warc_bytes(open(p, "rb").read())
        # parsed timestamps are UTC-aware ('Z' means Zulu, not session tz)
        assert all(t.tzinfo is not None for _, t, _ in got)
        assert [(u, t.replace(tzinfo=None)) for u, t, _ in got] == [(u, t) for u, t, _ in recs]
        assert [h for _, _, h in got] == [h for _, _, h in recs]


def test_read_warc_pages_multifile(spark, tmp_path):
    a = _records(30, "aa")
    b = _records(20, "bb")
    W.write_warc(str(tmp_path / "a.warc"), a)
    W.write_warc(str(tmp_path / "b.warc.gz"), b, gzip_members=True)
    df = W.read_warc_pages(spark, str(tmp_path) + "/*")
    got = df.toPandas().sort_values("url").reset_index(drop=True)
    assert len(got) == 50
    assert got["url"].str.startswith("https://").all()
    assert got["warc_ts"].notna().all()
    # bodies survived byte-exact
    by_url = dict(zip(got["url"], got["html"]))
    for u, _, h in a + b:
        assert bytes(by_url[u]) == h


def test_warc_to_extraction_pipeline(spark, tmp_path):
    """Real-corpus shape: WARC of the synthetic crawl pages -> read ->
    extract entities; per-url text is byte-identical to direct pages."""
    from pyspark.sql import functions as F

    from osm_poi_cloud_spark.plans import pipeline as pl

    pages = pg.pages_df(spark, 60, partitions=2).toPandas()
    # microseconds survive the WARC round trip (fractional WARC-Date)
    recs = [
        (r["url"], r["warc_ts"].to_pydatetime(), bytes(r["html"]))
        for _, r in pages.iterrows()
    ]
    W.write_warc(str(tmp_path / "crawl.warc.gz"), recs, gzip_members=True)
    warc_pages = W.read_warc_pages(spark, str(tmp_path / "crawl.warc.gz"))
    pois = pl.build_pois(warc_pages, lang=None, cell_levels=(12,)).toPandas()
    direct = pl.build_pois(spark.createDataFrame(pages), lang=None, cell_levels=(12,)).toPandas()
    key = ["url", "entity_idx"]
    got = pois.sort_values(key).reset_index(drop=True)
    exp = direct.sort_values(key).reset_index(drop=True)
    assert len(got) == len(exp) > 0
    for col in ("url", "name", "lat", "lon", "class"):
        assert (got[col].fillna("?") == exp[col].fillna("?")).all(), col
