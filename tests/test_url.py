"""URL canonicalization: every rule pinned with hand-written expected
strings, plus the snapshot-dedup (latest capture per canonical URL)."""

import datetime

import pandas as pd
import pytest
from pyspark.sql import functions as F

from osm_poi_cloud_spark.functions.url import canonical_url_col, dedup_by_canonical_url

CASES = [
    # (raw, canonical)
    ("HTTPS://Example.COM:443/a/b/?utm_source=x&b=2&a=1#frag", "https://example.com/a/b?a=1&b=2"),
    ("https://example.com/a/b?a=1&b=2", "https://example.com/a/b?a=1&b=2"),
    ("http://Site.ORG:80/path/", "http://site.org/path"),
    ("http://site.org/path?gclid=123", "http://site.org/path"),
    ("https://example.com", "https://example.com/"),          # empty path -> /
    ("https://example.com/", "https://example.com/"),          # root kept
    ("http://h.net:8080/x?fbclid=1&z=1", "http://h.net:8080/x?z=1"),  # non-default port kept
    ("https://example.com/p?", "https://example.com/p"),       # empty query dropped
    ("http://h.net/x/y//", "http://h.net/x/y"),                # redundant trailing slashes
    ("http://h.net/x?msclkid=9&utm_campaign=a&utm_medium=b", "http://h.net/x"),
]


def test_canonical_rules(spark):
    df = spark.createDataFrame([(raw,) for raw, _ in CASES], ["url"])
    got = df.select("url", canonical_url_col(F.col("url")).alias("c")).toPandas()
    by_raw = dict(zip(got["url"], got["c"]))
    for raw, want in CASES:
        assert by_raw[raw] == want, f"{raw}: {by_raw[raw]} != {want}"


def test_canonicalization_idempotent(spark):
    """canonical(canonical(u)) == canonical(u) over a URL fuzz set —
    the property that makes re-canonicalizing merged crawls safe."""
    import itertools
    import random

    rng = random.Random(7)
    hosts = ["Example.COM", "example.com", "A.b.C.net:8080", "x.org:80", "y.io:443"]
    schemes = ["http", "HTTPS", "https"]
    paths = ["", "/", "/a", "/a/", "/a//b///", "/p.q/r"]
    queries = ["", "?", "?b=2&a=1", "?utm_source=x", "?a=1&a=1&z", "?gclid=1&k=v"]
    frags = ["", "#f", "#a/b?c=1"]
    urls = ["://".join([s, h]) + p + q + f
            for s, h, p, q, f in itertools.islice(
                ((rng.choice(schemes), rng.choice(hosts), rng.choice(paths),
                  rng.choice(queries), rng.choice(frags)) for _ in range(200)), 200)]
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    once = df.select(canonical_url_col(F.col("url")).alias("c1"))
    twice = once.select("c1", canonical_url_col(F.col("c1")).alias("c2")).toPandas()
    mismatch = twice[twice["c1"] != twice["c2"]]
    assert mismatch.empty, mismatch.head()


def test_dedup_latest_capture(spark):
    t = datetime.datetime(2026, 1, 1)
    rows = [
        ("http://A.com/p/", t, "old"),
        ("http://a.com/p?utm_source=x", t + datetime.timedelta(days=1), "new"),
        ("http://a.com/other", t, "other"),
    ]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["url", "warc_ts", "body"]))
    out = dedup_by_canonical_url(df, order_col="warc_ts").toPandas().sort_values("canonical_url")
    assert len(out) == 2
    kept = out.set_index("canonical_url")["body"].to_dict()
    assert kept == {"http://a.com/other": "other", "http://a.com/p": "new"}

    # without order_col: deterministic tie-break on raw url
    out2 = dedup_by_canonical_url(df).toPandas()
    assert len(out2) == 2
    assert set(out2["body"]) == {"old", "other"}  # 'http://A.com/p/' < 'http://a.com/p?...'


# ----------------------------------------------------------- URL shape/spam


def test_url_features_hand_cases(spark):
    df = spark.createDataFrame(
        [(1, "https://shop123x.example.com/a/b/c?x=1&y=2&z=3#frag"),
         (2, "http://cheap-deals-4u-now-wow.biz/buy"),
         (3, "https://example.org/"),
         (4, "https://example.org/page")],
        "id long, url string")
    got = {r["id"]: r for r in
           __import__("osm_poi_cloud_spark.functions.url",
                      fromlist=["url_features"]).url_features(df).collect()}
    r = got[1]
    assert r["url_host"] == "shop123x.example.com"
    assert r["url_path"] == "/a/b/c"
    assert r["path_depth"] == 3
    assert r["n_params"] == 3
    assert r["host_digit_ppm"] == 1_000_000 * 3 // len("shop123x.example.com")
    assert r["host_hyphens"] == 0
    r2 = got[2]
    assert r2["host_hyphens"] == 4
    assert r2["n_params"] == 0
    assert got[3]["path_depth"] == 1 and got[3]["n_params"] == 0


def test_url_spam_filter_rules(spark):
    from osm_poi_cloud_spark.functions.url import url_spam_filter

    rows = [
        (1, "https://example.org/articles/2024/spark"),         # clean
        (2, "http://cheap-deals-4u-now-wow.biz/buy"),           # 4 hyphens
        (3, "https://12345abc.example/x"),  # digits 5/16 = 312500 ppm > 300000
        (4, "https://example.org/" + "/".join("abcdefghij")),   # depth 10
        (5, "https://example.org/p?" + "&".join(f"k{i}=v" for i in range(12))),
        (6, "https://example.org/" + "q" * 600),                # len > 512
    ]
    df = spark.createDataFrame(rows, "id long, url string")
    kept = {r["id"] for r in url_spam_filter(df).collect()}
    assert kept == {1}
    assert url_spam_filter(df).columns == ["id", "url"]
