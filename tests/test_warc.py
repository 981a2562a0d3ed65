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


def _raw_record(warc_type, url, http_payload, extra_headers=""):
    head = (
        "WARC/1.0\r\n"
        f"WARC-Type: {warc_type}\r\n"
        f"WARC-Target-URI: {url}\r\n"
        "WARC-Date: 2026-02-01T00:00:00Z\r\n"
        f"{extra_headers}"
        f"Content-Length: {len(http_payload)}\r\n\r\n"
    ).encode()
    return head + http_payload + b"\r\n\r\n"


def _http(body, ctype="text/html", status="200 OK", extra=""):
    return (
        f"HTTP/1.1 {status}\r\nContent-Type: {ctype}\r\n{extra}"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode() + body


def test_warc_chunked_transfer_encoding():
    """Real CC segments carry chunked HTTP payloads: the body must be
    de-chunked; a plain record in the same archive stays byte-exact."""
    plain = b"<html><body>plain page</body></html>"
    parts = [b"<html><", b"body>chunked page</body></h", b"tml>"]
    chunked_body = b"".join(
        f"{len(p):x}".encode() + b"\r\n" + p + b"\r\n" for p in parts
    ) + b"0\r\n\r\n"
    payload = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
        b"Transfer-Encoding: chunked\r\n\r\n" + chunked_body
    )
    data = (
        _raw_record("response", "https://x.org/chunked", payload)
        + _raw_record("response", "https://x.org/plain", _http(plain))
    )
    got = {u: h for u, _, h in W.parse_warc_bytes(data)}
    assert got["https://x.org/chunked"] == b"<html><body>chunked page</body></html>"
    assert got["https://x.org/plain"] == plain
    # malformed chunk size -> raw body, never an exception
    bad = _raw_record("response", "https://x.org/bad", (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
        b"Transfer-Encoding: chunked\r\n\r\nZZZ\r\nwhatever"))
    (u, _, h), = W.parse_warc_bytes(bad)
    assert h == b"ZZZ\r\nwhatever"


def test_warc_revisit_and_junk_records_filtered():
    """revisit / request records, image payloads, and 404s are skipped
    WITHOUT losing framing; following records still parse byte-exact."""
    keep = b"<html><body>keep me</body></html>"
    png = b"\x89PNG\r\n\x1a\n" + bytes(range(64))
    data = (
        _raw_record("revisit", "https://x.org/seen-before",
                    _http(b"", ctype="message/http"),
                    extra_headers="WARC-Refers-To: <urn:uuid:123>\r\n")
        + _raw_record("request", "https://x.org/req",
                      b"GET / HTTP/1.1\r\nHost: x.org\r\n\r\n")
        + _raw_record("response", "https://x.org/logo.png", _http(png, ctype="image/png"))
        + _raw_record("response", "https://x.org/missing",
                      _http(b"<html>404</html>", status="404 Not Found"))
        + _raw_record("response", "https://x.org/good", _http(keep))
    )
    got = W.parse_warc_bytes(data)
    assert [(u, h) for u, _, h in got] == [("https://x.org/good", keep)]
    # content_types=None + sanitize off keeps the binary payload too
    got_all = W.parse_warc_bytes(data, content_types=None, sanitize_utf8=False)
    assert ("https://x.org/logo.png", png) in [(u, h) for u, _, h in got_all]


def test_warc_non_utf8_body_sanitized():
    """A latin-1 page must not be able to kill the strict-UTF-8
    extractor downstream: bytes are replace-decoded to clean UTF-8."""
    latin = "<html><body>caf\xe9</body></html>".encode("latin-1")
    data = _raw_record("response", "https://x.org/latin", _http(latin))
    (u, _, h), = W.parse_warc_bytes(data)
    h.decode("utf-8")  # strict decode succeeds now
    assert "caf\ufffd" in h.decode("utf-8")
    # valid UTF-8 round-trips byte-identically
    utf8 = "<html><body>caf\u00e9 \u2615</body></html>".encode()
    (u2, _, h2), = W.parse_warc_bytes(_raw_record("response", "https://x.org/u", _http(utf8)))
    assert h2 == utf8


def test_scheme_errors_fail_fast(spark):
    # globbing over anonymous HTTPS has no LIST service
    with pytest.raises(ValueError, match="glob"):
        W.read_warc_pages(spark, "s3://bucket/segment/*.warc.gz")
    # schemes with no streaming opener point at the JVM-bytes route
    with pytest.raises(ValueError, match="jvm"):
        W.open_archive_stream("hdfs://nn/crawl/a.warc.gz")
    # s3a takes the SAME anonymous-HTTPS route as s3 (tasks stream the
    # public endpoint, so listing via the credentialed Hadoop client
    # would defeat fail-fast): globs rejected with the JVM pointer
    with pytest.raises(ValueError, match="read_warc_pages_jvm_bytes"):
        W.read_warc_pages(spark, "s3a://bucket/segment/*.warc.gz")


def test_s3_https_mapping():
    assert (W._s3_https_url("s3://commoncrawl/crawl-data/seg/x.warc.gz")
            == "https://commoncrawl.s3.amazonaws.com/crawl-data/seg/x.warc.gz")
    assert (W._s3_https_url("s3a://bkt/k.warc")
            == "https://bkt.s3.amazonaws.com/k.warc")


def test_hadoop_glob_file_scheme(spark, tmp_path):
    """The driver-side listing goes through the Hadoop FileSystem API —
    proven on the file:// scheme (the same code path hdfs://
    and configured s3a:// take on a real cluster)."""
    for name in ("x1.warc", "x2.warc", "notes.txt"):
        (tmp_path / name).write_bytes(b"stub")
    got = W.hadoop_glob(spark, f"file://{tmp_path}/*.warc")
    assert len(got) == 2
    assert all(p.startswith("file:") and p.endswith(".warc") for p in got)
    assert got == sorted(got)
    assert W.hadoop_glob(spark, f"file://{tmp_path}/*.nope") == []


def test_read_warc_pages_via_file_uri_glob(spark, tmp_path):
    """End-to-end through the Hadoop-FS listing + opener dispatch with
    an explicit file:// glob: byte parity with the plain-path read."""
    recs = _records(15, "uri")
    W.write_warc(str(tmp_path / "u.warc.gz"), recs, gzip_members=True)
    got = (W.read_warc_pages(spark, f"file://{tmp_path}/*.warc.gz")
           .toPandas().sort_values("url").reset_index(drop=True))
    assert len(got) == 15
    by_url = dict(zip(got["url"], got["html"]))
    for u, _, h in recs:
        assert bytes(by_url[u]) == h


def test_jvm_bytes_route_parity(spark, tmp_path):
    """read_warc_pages_jvm_bytes (whole-archive binaryFile read — the
    route for credentialed object stores) matches the streaming read
    byte-for-byte: both share iter_warc_records."""
    recs = _records(12, "jvmb")
    W.write_warc(str(tmp_path / "j.warc.gz"), recs, gzip_members=True)
    a = (W.read_warc_pages(spark, str(tmp_path / "j.warc.gz"))
         .toPandas().sort_values("url").reset_index(drop=True))
    b = (W.read_warc_pages_jvm_bytes(spark, str(tmp_path / "j.warc.gz"))
         .toPandas().sort_values("url").reset_index(drop=True))
    assert len(a) == len(b) == 12
    assert (a["url"] == b["url"]).all()
    assert all(bytes(x) == bytes(y) for x, y in zip(a["html"], b["html"]))


class _ArchiveHTTPHandler:
    """Factory for a handler serving one in-memory archive, optionally
    dropping the first full-file response mid-body (to exercise the
    Range-resume path deterministically)."""

    @staticmethod
    def make(blob: bytes, drop_after: int | None = None):
        import http.server

        state = {"dropped": False}

        class H(http.server.BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def do_GET(self):
                rng = self.headers.get("Range")
                if rng:
                    start = int(rng.split("=")[1].rstrip("-").split("-")[0])
                    body = blob[start:]
                    self.send_response(206)
                    self.send_header("Content-Range",
                                     f"bytes {start}-{len(blob)-1}/{len(blob)}")
                else:
                    start, body = 0, blob
                    self.send_response(200)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                if (drop_after is not None and not state["dropped"]
                        and start == 0):
                    state["dropped"] = True
                    self.wfile.write(body[:drop_after])
                    self.wfile.flush()
                    # abort the socket so the client sees a short read
                    self.connection.close()
                    return
                self.wfile.write(body)

        return H


def _serve(blob, drop_after=None):
    import http.server
    import threading

    srv = http.server.ThreadingHTTPServer(
        ("127.0.0.1", 0), _ArchiveHTTPHandler.make(blob, drop_after))
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    return srv, f"http://127.0.0.1:{srv.server_address[1]}/a.warc.gz"


def test_http_streaming_read(spark, tmp_path):
    recs = _records(20, "http")
    W.write_warc(str(tmp_path / "h.warc.gz"), recs, gzip_members=True)
    blob = (tmp_path / "h.warc.gz").read_bytes()
    srv, url = _serve(blob)
    try:
        got = (W.read_warc_pages(spark, url)
               .toPandas().sort_values("url").reset_index(drop=True))
        assert len(got) == 20
        by_url = dict(zip(got["url"], got["html"]))
        for u, _, h in recs:
            assert bytes(by_url[u]) == h
    finally:
        srv.shutdown()


def test_http_range_resume_after_drop(tmp_path):
    """The server kills the first response halfway through the archive;
    _HttpStream must resume with a Range request and deliver the full
    byte stream — record parity with the local parse proves it."""
    recs = _records(40, "drop")
    W.write_warc(str(tmp_path / "d.warc.gz"), recs, gzip_members=True)
    blob = (tmp_path / "d.warc.gz").read_bytes()
    srv, url = _serve(blob, drop_after=len(blob) // 2)
    try:
        with W.open_archive_stream(url) as f:
            got = list(W.iter_warc_records(f))
        assert [(u, h) for u, _, h in got] == [(u, h) for u, _, h in recs]
    finally:
        srv.shutdown()


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


def test_wet_conversion_records(spark, tmp_path):
    """Common Crawl WET files: conversion records, text/plain at the
    WARC header level, NO HTTP envelope — read via read_wet_pages while
    plain-WARC reads keep ignoring them."""
    text = "Extracted page text.\nSecond line of content."
    wet_rec = (
        "WARC/1.0\r\n"
        "WARC-Type: conversion\r\n"
        "WARC-Target-URI: https://x.org/page\r\n"
        "WARC-Date: 2026-02-01T00:00:00Z\r\n"
        "Content-Type: text/plain\r\n"
        f"Content-Length: {len(text.encode())}\r\n\r\n"
    ).encode() + text.encode() + b"\r\n\r\n"
    warcinfo = _raw_record("warcinfo", "https://x.org/", b"software: test")
    path = tmp_path / "seg.warc.wet"
    path.write_bytes(warcinfo + wet_rec)

    got = W.parse_warc_bytes(path.read_bytes(), record_types=("conversion",),
                             content_types=("text/plain",))
    assert [(u, h.decode()) for u, _, h in got] == [("https://x.org/page", text)]
    # default (response) parsing ignores conversion records entirely
    assert W.parse_warc_bytes(path.read_bytes()) == []

    df = W.read_wet_pages(spark, str(path)).toPandas()
    assert len(df) == 1 and bytes(df.loc[0, "html"]).decode() == text

    # gzip-member WET round-trips too
    import gzip as gz
    gz_path = tmp_path / "seg.warc.wet.gz"
    gz_path.write_bytes(gz.compress(warcinfo) + gz.compress(wet_rec))
    df2 = W.read_wet_pages(spark, str(gz_path)).toPandas()
    assert len(df2) == 1 and bytes(df2.loc[0, "html"]).decode() == text


def test_index_selective_fetch_parity(spark, tmp_path):
    """CC-index selective fetch (r4 verdict #4): build a cc-index-style
    table over local per-record-gzip archives, filter it NATIVELY, and
    fetch only the selected records — exact (url, ts, html) parity with
    a full scan filtered to the same urls."""
    from pyspark.sql import functions as F

    all_recs = []
    for tag, n in (("ia", 30), ("ib", 25), ("ic", 20)):
        recs = _records(n, tag)
        W.write_warc(str(tmp_path / f"{tag}.warc.gz"), recs, gzip_members=True)
        all_recs += recs
    glob = str(tmp_path / "i?.warc.gz")

    idx = W.build_warc_index(spark, glob)
    ipd = idx.toPandas()
    assert len(ipd) == 75 and set(ipd.columns) == {
        "url", "warc_filename", "warc_record_offset", "warc_record_length"}
    # offsets are exact member boundaries: ascending, non-overlapping,
    # summing to the file size per archive
    for f, grp in ipd.groupby("warc_filename"):
        grp = grp.sort_values("warc_record_offset")
        assert (grp["warc_record_offset"].to_numpy()[1:] ==
                (grp["warc_record_offset"] + grp["warc_record_length"])
                .to_numpy()[:-1]).all()
        from urllib.parse import urlparse, unquote
        assert (grp["warc_record_offset"].iloc[-1]
                + grp["warc_record_length"].iloc[-1]
                == os.path.getsize(unquote(urlparse(f).path)))

    # native filter on the index (this is the point: predicate pushdown
    # selects records; only those are fetched)
    sel = idx.filter(F.col("url").rlike("/p/1?[02468]$"))
    got = (W.read_warc_records_by_index(spark, sel)
           .toPandas().sort_values("url").reset_index(drop=True))
    want_urls = sorted(u for u, _, _ in all_recs
                       if __import__("re").search(r"/p/1?[02468]$", u))
    assert list(got["url"]) == want_urls and len(got) > 20
    by_url = {u: h for u, _, h in all_recs}
    for _, r in got.iterrows():
        assert bytes(r["html"]) == by_url[r["url"]]

    # single mid-file record fetch: offset/length alone suffice
    one = ipd[ipd["url"] == "https://ib.example.org/p/13"].iloc[0]
    data = W.fetch_archive_range(
        one["warc_filename"], int(one["warc_record_offset"]),
        int(one["warc_record_length"]))
    rows = W.parse_warc_bytes(data)
    assert len(rows) == 1 and rows[0][0] == "https://ib.example.org/p/13"

    # non-member-gzip archives are rejected up front
    W.write_warc(str(tmp_path / "plain.warc"), _records(3, "pl"))
    with pytest.raises(ValueError, match="gzip member"):
        W.index_warc_members(str(tmp_path / "plain.warc"))


def test_index_fetch_http_range(spark, tmp_path):
    """Remote selective fetch: bounded Range requests against the test
    HTTP server retrieve exactly the indexed records."""
    recs = _records(24, "hr")
    W.write_warc(str(tmp_path / "hr.warc.gz"), recs, gzip_members=True)
    blob = (tmp_path / "hr.warc.gz").read_bytes()
    srv, url = _serve(blob)
    try:
        local_rows = W.index_warc_members(str(tmp_path / "hr.warc.gz"))
        import pandas as pd
        idx = spark.createDataFrame(pd.DataFrame(
            {"url": [r[0] for r in local_rows],
             "warc_filename": [url] * len(local_rows),
             "warc_record_offset": [r[2] for r in local_rows],
             "warc_record_length": [r[3] for r in local_rows]}))
        from pyspark.sql import functions as F
        sel = idx.filter(F.col("url").endswith("3"))
        got = (W.read_warc_records_by_index(spark, sel)
               .toPandas().sort_values("url").reset_index(drop=True))
        want = sorted(u for u, _, _ in recs if u.endswith("3"))
        assert list(got["url"]) == want
        by_url = {u: h for u, _, h in recs}
        for _, r in got.iterrows():
            assert bytes(r["html"]) == by_url[r["url"]]
    finally:
        srv.shutdown()


def test_index_fetch_to_extraction_pipeline(spark, tmp_path):
    """The real CC workflow end to end: index the crawl, select records
    NATIVELY, fetch only those, run the frozen extraction pipeline —
    byte parity with extracting the same selection from a full scan."""
    from pyspark.sql import functions as F

    from osm_poi_cloud_spark.plans import pipeline as pl

    pages = pg.pages_df(spark, 80, partitions=2).toPandas()
    recs = [(r["url"], r["warc_ts"].to_pydatetime(), bytes(r["html"]))
            for _, r in pages.iterrows()]
    W.write_warc(str(tmp_path / "seg.warc.gz"), recs, gzip_members=True)
    glob = str(tmp_path / "seg.warc.gz")

    idx = W.build_warc_index(spark, glob)
    sel = idx.filter(F.col("url").rlike("/[0-9]*[02468]$"))  # even page ids
    fetched = W.read_warc_records_by_index(spark, sel)
    pois = pl.build_pois(fetched, lang=None, cell_levels=(12,)).toPandas()

    want_urls = set(sel.select("url").toPandas()["url"])
    assert len(want_urls) > 10
    full = pl.build_pois(W.read_warc_pages(spark, glob),
                         lang=None, cell_levels=(12,)).toPandas()
    exp = full[full["url"].isin(want_urls)]
    key = ["url", "entity_idx"]
    got = pois.sort_values(key).reset_index(drop=True)
    exp = exp.sort_values(key).reset_index(drop=True)
    assert len(got) == len(exp) > 0
    for col in ("url", "name", "lat", "lon", "class"):
        assert (got[col].fillna("?") == exp[col].fillna("?")).all(), col
