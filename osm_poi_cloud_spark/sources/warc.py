"""WARC source — read Common-Crawl-style WARC archives into the pages
table shape (``url, warc_ts, html``).

Common Crawl ships its corpus as ~1 GB WARC files (ISO 28500), usually
with per-record gzip members concatenated. The standard Spark pattern
(see the public ``commoncrawl/cc-pyspark`` examples) is FILE-level
parallelism: one task per WARC file, parsing records inside the task.
That is what this source does — ``binaryFile`` scan -> one Arrow batch
of records per archive via ``mapInPandas``. With thousands of archives
per crawl, file-level parallelism saturates any cluster.

Scope: WARC/1.0 ``response`` records; payloads are HTTP responses and
the HTML body is extracted past the HTTP header block. Whole-file gzip
and concatenated gzip members both decode via stdlib ``gzip``
(multi-member aware). A matching ``write_warc`` fixture writer keeps
tests self-contained.
"""

from __future__ import annotations

import datetime as dt
import gzip
import io

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

PAGES_FROM_WARC_SCHEMA = "url string, warc_ts timestamp, html binary"

_CRLF2 = b"\r\n\r\n"


def write_warc(path: str, records: list[tuple[str, dt.datetime, bytes]],
               gzip_members: bool = False) -> None:
    """Write (url, ts, html_bytes) as WARC/1.0 response records whose
    payloads are minimal HTTP responses. ``gzip_members`` mimics the
    Common-Crawl layout (each record an independent gzip member)."""
    out = io.BytesIO()
    for url, ts, html in records:
        http = (
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
            + f"Content-Length: {len(html)}\r\n\r\n".encode()
            + html
        )
        head = (
            "WARC/1.0\r\n"
            "WARC-Type: response\r\n"
            f"WARC-Target-URI: {url}\r\n"
            f"WARC-Date: {ts.strftime('%Y-%m-%dT%H:%M:%SZ')}\r\n"
            f"Content-Length: {len(http)}\r\n\r\n"
        ).encode()
        rec = head + http + _CRLF2
        out.write(gzip.compress(rec) if gzip_members else rec)
    with open(path, "wb") as f:
        f.write(out.getvalue())


def parse_warc_bytes(data: bytes) -> list[tuple[str, dt.datetime, bytes]]:
    """Parse WARC bytes (plain, whole-file gzip, or concatenated gzip
    members) into (url, ts, html) tuples for response records."""
    if data[:2] == b"\x1f\x8b":
        data = gzip.decompress(data)  # multi-member aware
    out = []
    pos = 0
    n = len(data)
    while pos < n:
        if data[pos:pos + 5] != b"WARC/":
            nxt = data.find(b"WARC/", pos + 1)
            if nxt < 0:
                break
            pos = nxt
        head_end = data.find(_CRLF2, pos)
        if head_end < 0:
            break
        headers: dict[str, str] = {}
        for line in data[pos:head_end].decode("utf-8", "replace").split("\r\n")[1:]:
            if ":" in line:
                k, v = line.split(":", 1)
                headers[k.strip().lower()] = v.strip()
        length = int(headers.get("content-length", 0))
        payload = data[head_end + 4:head_end + 4 + length]
        pos = head_end + 4 + length + 4  # skip trailing CRLFCRLF
        if headers.get("warc-type") != "response":
            continue
        url = headers.get("warc-target-uri", "")
        ts = dt.datetime.strptime(headers.get("warc-date", "1970-01-01T00:00:00Z"),
                                  "%Y-%m-%dT%H:%M:%SZ")
        http_split = payload.find(_CRLF2)
        body = payload[http_split + 4:] if http_split >= 0 else payload
        out.append((url, ts, body))
    return out


def read_warc_pages(spark: SparkSession, path_glob: str) -> DataFrame:
    """WARC archives -> (url, warc_ts, html) DataFrame, one parse task
    per archive file. Feed into ``plans.pipeline.build_pois(lang=None)``
    (or attach a lang column via ``text_analysis.lang_id_col``)."""
    files = spark.read.format("binaryFile").load(path_glob).select("path", "content")

    def batches(it):
        for pdf in it:
            urls, tss, htmls = [], [], []
            for content in pdf["content"]:
                for url, ts, body in parse_warc_bytes(bytes(content)):
                    urls.append(url)
                    tss.append(ts)
                    htmls.append(body)
            yield pd.DataFrame({"url": urls, "warc_ts": tss, "html": htmls})

    return files.mapInPandas(batches, schema=PAGES_FROM_WARC_SCHEMA)
