"""WARC source — read Common-Crawl-style WARC archives into the pages
table shape (``url, warc_ts, html``).

Common Crawl ships its corpus as ~1 GB WARC files (ISO 28500), usually
with per-record gzip members concatenated. The standard Spark pattern
(see the public ``commoncrawl/cc-pyspark`` examples) is FILE-level
parallelism: one task per WARC file, STREAMING records off disk. This
source reads only the file *paths* through Spark (``binaryFile`` with
the content column pruned), opens each archive inside the task with a
buffered (multi-member-aware) gzip stream, and yields records in
bounded chunks — peak memory per task is one chunk, not three copies
of the archive.

Robustness rules (a crawl archive always contains some garbage):
* malformed records (bad dates, non-numeric Content-Length) are
  SKIPPED, never fatal — one junk record must not kill a 1 GB archive;
* a record without Content-Length forfeits payload framing; the parser
  rescans for the next ``\\r\\n\\r\\nWARC/`` boundary instead of locking
  onto a literal "WARC/" inside page text;
* WARC/1.0 and /1.1 dates parse (with or without fractional seconds)
  and are UTC-aware — ``Z`` means Zulu, not session timezone;
* ``Transfer-Encoding: chunked`` HTTP payloads are de-chunked (real
  Common Crawl segments contain them); a malformed chunk size falls
  back to the raw body rather than raising;
* ``revisit`` records (and every other non-``response`` type) are
  skipped WITHOUT losing framing — their Content-Length is honored;
* only payloads whose HTTP Content-Type matches ``content_types``
  (default ``text/html``) and whose status is 2xx are yielded —
  image/PDF/error responses are ubiquitous in real crawls and the
  downstream extractor is frozen on strict-UTF-8 HTML;
* bodies are re-encoded as clean UTF-8 (``errors="replace"``), so one
  latin-1 page cannot kill the extraction UDF; valid-UTF-8 bodies
  round-trip byte-identically.
"""

from __future__ import annotations

import datetime as dt
import gzip
import io

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

PAGES_FROM_WARC_SCHEMA = "url string, warc_ts timestamp, html binary"

_CRLF2 = b"\r\n\r\n"
_UTC = dt.timezone.utc


def write_warc(path: str, records: list[tuple[str, dt.datetime, bytes]],
               gzip_members: bool = False) -> None:
    """Write (url, ts, html_bytes) as WARC response records whose
    payloads are minimal HTTP responses. Microseconds are preserved
    (WARC/1.1 fractional dates) when present; naive datetimes are
    stamped as UTC. ``gzip_members`` mimics the Common-Crawl layout."""
    out = io.BytesIO()
    for url, ts, html in records:
        if ts.tzinfo is not None:
            ts = ts.astimezone(_UTC).replace(tzinfo=None)
        stamp = ts.strftime("%Y-%m-%dT%H:%M:%S")
        if ts.microsecond:
            stamp += f".{ts.microsecond:06d}"
        http = (
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
            + f"Content-Length: {len(html)}\r\n\r\n".encode()
            + html
        )
        head = (
            "WARC/1.0\r\n"
            "WARC-Type: response\r\n"
            f"WARC-Target-URI: {url}\r\n"
            f"WARC-Date: {stamp}Z\r\n"
            f"Content-Length: {len(http)}\r\n\r\n"
        ).encode()
        rec = head + http + _CRLF2
        out.write(gzip.compress(rec) if gzip_members else rec)
    with open(path, "wb") as f:
        f.write(out.getvalue())


def _parse_date(s: str) -> dt.datetime:
    s = s.strip()
    for fmt in ("%Y-%m-%dT%H:%M:%SZ", "%Y-%m-%dT%H:%M:%S.%fZ"):
        try:
            return dt.datetime.strptime(s, fmt).replace(tzinfo=_UTC)
        except ValueError:
            continue
    raise ValueError(f"unparseable WARC-Date {s!r}")


class _Pushback:
    """Tiny buffered reader with pushback over a binary stream."""

    def __init__(self, fp):
        self._fp = fp
        self._buf = b""

    def push(self, data: bytes) -> None:
        self._buf = data + self._buf

    def read(self, n: int) -> bytes:
        out = bytearray()
        while len(out) < n:
            if self._buf:
                take = self._buf[: n - len(out)]
                self._buf = self._buf[len(take):]
                out.extend(take)
                continue
            chunk = self._fp.read(n - len(out))
            if not chunk:
                break
            out.extend(chunk)
        return bytes(out)

    def readline(self) -> bytes:
        out = bytearray()
        while True:
            if self._buf:
                nl = self._buf.find(b"\n")
                if nl >= 0:
                    out.extend(self._buf[: nl + 1])
                    self._buf = self._buf[nl + 1:]
                    return bytes(out)
                out.extend(self._buf)
                self._buf = b""
            chunk = self._fp.read(65536)
            if not chunk:
                return bytes(out)
            self._buf = chunk


def _parse_http(payload: bytes):
    """Split an HTTP response payload into (status, headers, body).
    Returns (None, {}, payload) when the payload is not an HTTP
    response (e.g. a ``resource`` record's raw bytes)."""
    if not payload.startswith(b"HTTP/"):
        return None, {}, payload
    idx = payload.find(_CRLF2)
    if idx < 0:
        return None, {}, payload
    head, body = payload[:idx], payload[idx + 4:]
    lines = head.split(b"\r\n")
    try:
        status = int(lines[0].split()[1])
    except (IndexError, ValueError):
        status = None
    headers: dict[str, str] = {}
    for ln in lines[1:]:
        if b":" in ln:
            k, v = ln.split(b":", 1)
            headers[k.decode("ascii", "replace").strip().lower()] = \
                v.decode("latin-1", "replace").strip()
    return status, headers, body


def _dechunk(body: bytes) -> bytes:
    """Decode a Transfer-Encoding: chunked HTTP body. A malformed chunk
    size line falls back to the raw body (skip-grade robustness: junk
    in one record must not raise)."""
    out = bytearray()
    pos = 0
    while True:
        nl = body.find(b"\r\n", pos)
        if nl < 0:
            return bytes(body)  # truncated framing: keep raw
        token = body[pos:nl].split(b";")[0].strip()
        try:
            size = int(token, 16)
        except ValueError:
            return bytes(body)
        pos = nl + 2
        if size == 0:
            return bytes(out)
        out.extend(body[pos:pos + size])
        pos += size + 2  # chunk payload + its trailing CRLF


def iter_warc_records(raw_fp, content_types: tuple[str, ...] | None = ("text/html",),
                      sanitize_utf8: bool = True,
                      record_types: tuple[str, ...] = ("response",)):
    """Stream (url, ts_utc, html_body) response records from a WARC
    file object (plain or gzip — multi-member handled by GzipFile).
    Malformed records are skipped; framing failures rescan forward.

    ``content_types``: HTTP Content-Type prefixes to keep (the media
    type is compared with parameters stripped); ``None`` keeps
    everything. Non-2xx statuses are dropped whenever the payload has a
    parseable HTTP status line. ``revisit`` / ``request`` / metadata
    records are skipped with framing intact. ``sanitize_utf8``
    re-encodes bodies via ``decode("utf-8", "replace")`` so the frozen
    strict-UTF-8 extractor downstream can never throw; valid UTF-8 is
    byte-identical after the round trip.

    ``record_types``: WARC record types to yield. ``("response",)``
    (default) reads crawl WARCs; ``("conversion",)`` reads Common
    Crawl's WET extracted-text files, whose payloads have NO HTTP
    envelope — the WARC-level ``Content-Type`` header (text/plain for
    WET) is matched instead, and the raw payload is the body."""
    head2 = raw_fp.read(2)
    raw_fp.seek(0)
    fp = _Pushback(gzip.GzipFile(fileobj=raw_fp) if head2 == b"\x1f\x8b" else raw_fp)
    while True:
        line = fp.readline()
        if not line:
            return
        if not line.startswith(b"WARC/"):
            continue  # inter-record padding / resync leftovers
        headers: dict[str, str] = {}
        while True:
            h = fp.readline()
            if not h or h in (b"\r\n", b"\n"):
                break
            if b":" in h:
                k, v = h.split(b":", 1)
                headers[k.decode("ascii", "replace").strip().lower()] = v.decode("utf-8", "replace").strip()
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError):
            # framing lost — jump to the next explicit record boundary
            marker = _CRLF2 + b"WARC/"
            window = b""
            while True:
                chunk = fp.read(65536)
                if not chunk:
                    return
                window += chunk
                idx = window.find(marker)
                if idx >= 0:
                    fp.push(window[idx + 4:])
                    break
                window = window[-len(marker):]
            continue
        payload = fp.read(length)
        fp.read(4)  # trailing CRLFCRLF
        if headers.get("warc-type") not in record_types:
            continue
        try:
            ts = _parse_date(headers["warc-date"])
            url = headers["warc-target-uri"]
        except (KeyError, ValueError):
            continue  # malformed record: skip, don't kill the archive
        status, http_headers, body = _parse_http(payload)
        if status is not None and not (200 <= status < 300):
            continue  # error/redirect page: not crawl content
        if "chunked" in http_headers.get("transfer-encoding", "").lower():
            body = _dechunk(body)
        if content_types is not None:
            # HTTP envelope wins; envelope-less records (WET conversion)
            # are typed by the WARC-level Content-Type header
            media = (http_headers.get("content-type") or headers.get("content-type", ""))
            media = media.split(";")[0].strip().lower()
            if not any(media.startswith(ct) for ct in content_types):
                continue
        if sanitize_utf8:
            body = body.decode("utf-8", "replace").encode("utf-8")
        yield url, ts, body


def parse_warc_bytes(data: bytes, **kw) -> list[tuple[str, dt.datetime, bytes]]:
    """Convenience: parse in-memory WARC bytes (tests / small files).
    Keyword args pass through to ``iter_warc_records``."""
    return list(iter_warc_records(io.BytesIO(data), **kw))


def read_wet_pages(spark: SparkSession, path_glob: str,
                   chunk_rows: int = 2000) -> DataFrame:
    """Common Crawl WET archives (pre-extracted plain text) ->
    (url, warc_ts, html) DataFrame — ``html`` holds the UTF-8 text
    bytes. WET is the input most text-pipeline users actually consume;
    it is the same container with ``conversion`` records and
    ``Content-Type: text/plain`` at the WARC header level."""
    return read_warc_pages(spark, path_glob, chunk_rows,
                           content_types=("text/plain",),
                           record_types=("conversion",))


def read_warc_pages(spark: SparkSession, path_glob: str,
                    chunk_rows: int = 2000,
                    content_types: tuple[str, ...] | None = ("text/html",),
                    sanitize_utf8: bool = True,
                    record_types: tuple[str, ...] = ("response",)) -> DataFrame:
    """WARC archives -> (url, warc_ts, html) DataFrame. Spark lists the
    files; each task opens its archive locally and STREAMS records in
    ``chunk_rows`` batches (bounded memory even for 1 GB archives).
    Feed into ``plans.pipeline.build_pois(lang=None)`` — and repartition
    first (as ``app.read_pages`` does) so the parse stage and the
    extraction UDF aren't a chained narrow Python pipeline.

    LOCAL/SHARED FILESYSTEMS ONLY: tasks ``open()`` the archive path
    directly (``file:`` URIs are unwrapped), which covers local disk and
    any POSIX mount (NFS, fuse, EBS). Object-store schemes (``s3a://``,
    ``hdfs://``) are rejected up front with a clear error instead of
    failing inside a task — stage such archives onto a mount first (the
    reference's download step does exactly this, download/Dockerfile).
    ``content_types`` / ``sanitize_utf8`` as in ``iter_warc_records``."""
    if "://" in path_glob and not path_glob.startswith("file://"):
        raise ValueError(
            f"read_warc_pages streams archives via local open(); got remote path "
            f"{path_glob!r} — stage it to a local/POSIX mount first")
    files = spark.read.format("binaryFile").load(path_glob).select("path")

    def batches(it):
        for pdf in it:
            for path in pdf["path"]:
                from urllib.parse import unquote, urlparse

                local = unquote(urlparse(path).path) if path.startswith("file:") else path
                with open(local, "rb") as f:
                    urls, tss, htmls = [], [], []
                    for url, ts, body in iter_warc_records(
                            f, content_types=content_types,
                            sanitize_utf8=sanitize_utf8, record_types=record_types):
                        urls.append(url)
                        tss.append(ts)
                        htmls.append(body)
                        if len(urls) >= chunk_rows:
                            yield pd.DataFrame({"url": urls, "warc_ts": tss, "html": htmls})
                            urls, tss, htmls = [], [], []
                    if urls:
                        yield pd.DataFrame({"url": urls, "warc_ts": tss, "html": htmls})

    return files.mapInPandas(batches, schema=PAGES_FROM_WARC_SCHEMA)
