"""URL canonicalization — the crawl-pipeline primitive for URL-keyed
dedup (keep one row per canonical URL across captures). The reference
keys everything by raw ``url`` (pages.url is its primary key); at
crawl scale the same resource appears under trivially-different URLs,
so canonical-URL dedup belongs next to content dedup
(``operators/dedup.py``).

Pure native expressions (regexp/split/filter/array_sort — JVM-side,
codegen-friendly, no Python), applying the standard safe
normalizations (RFC 3986 §6 + the usual tracking-param strip):

* lowercase scheme and host, strip default ports (:80 http, :443 https)
* strip the fragment
* drop tracking query params (utm_*, fbclid, gclid, msclkid)
* byte-sort the remaining query params
* empty path -> "/", strip redundant trailing slashes ("/a/b/" == "/a/b",
  but the root "/" is kept)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TRACKING_PARAM_RE = "^(utm_[^=]*|fbclid|gclid|msclkid)="


def canonical_url_col(url: Column) -> Column:
    no_frag = F.regexp_replace(url, "#.*", "")
    head = F.regexp_extract(no_frag, "^([^:/?]+://[^/?]*)", 1)  # scheme://host[:port]
    rest = no_frag.substr(F.length(head) + 1, F.lit(1 << 30))

    head = F.lower(head)
    head = F.regexp_replace(head, "^(http://[^/?:]*):80$", "$1")
    head = F.regexp_replace(head, "^(https://[^/?:]*):443$", "$1")

    parts = F.split(rest, "\\?", 2)
    path = parts[0]
    query = F.when(F.size(parts) > 1, parts[1]).otherwise(F.lit(""))

    path = F.when(path == "", F.lit("/")).otherwise(F.regexp_replace(path, "^(.+?)/+$", "$1"))
    kept = F.array_sort(F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
    ))
    qtail = F.when(F.size(kept) > 0, F.concat(F.lit("?"), F.array_join(kept, "&"))).otherwise(F.lit(""))
    return F.concat(head, path, qtail)


def with_canonical_url(df, url_col: str = "url", out_col: str = "canonical_url"):
    return df.withColumn(out_col, canonical_url_col(F.col(url_col)))


def dedup_by_canonical_url(df, url_col: str = "url", order_col: str | None = None):
    """One row per canonical URL. With ``order_col`` (e.g. warc_ts) the
    LATEST capture wins (the Common-Crawl snapshot-dedup rule);
    otherwise ties break on the raw url for determinism. One shuffle on
    the canonical key."""
    from pyspark.sql import Window

    keyed = with_canonical_url(df, url_col)
    order = [F.col(order_col).desc()] if order_col else []
    w = Window.partitionBy("canonical_url").orderBy(*order, F.col(url_col))
    return (
        keyed.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def url_features(df, url_col: str = "url"):
    """URL-shape spam heuristics (the RefinedWeb-style URL scoring
    stage: soft signals BEFORE fetching the body — a 10^12-URL frontier
    can't afford body-based filtering for everything). All native
    regexp/length arithmetic, map-only, exact integers (ppm where a
    fraction is needed — the blocklist convention). Adds:

    * ``url_host`` / ``url_path`` — parsed pieces (query/fragment cut),
    * ``url_len`` / ``host_len`` — character lengths,
    * ``path_depth`` — '/' count inside the path,
    * ``n_params`` — query parameters ('?' present: 1 + '&' count),
    * ``host_digit_ppm`` — digit fraction of the host in ppm,
    * ``host_hyphens`` — '-' count in the host (chained-keyword
      spam-domain signal).
    """
    url = F.col(url_col)
    host = F.regexp_extract(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)", 1)
    path = F.regexp_extract(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    query = F.regexp_extract(url, r"\?([^#]*)", 1)
    count_in = lambda col, ch: (  # noqa: E731 — exact char count
        F.length(col) - F.length(F.regexp_replace(col, ch, "")))
    digits = count_in(host, "[0-9]")
    return (
        df.withColumn("url_host", host)
        .withColumn("url_path", path)
        .withColumn("url_len", F.length(url).cast("long"))
        .withColumn("host_len", F.length(host).cast("long"))
        .withColumn("path_depth", count_in(F.col("url_path"), "/").cast("long"))
        .withColumn("n_params",
                    F.when(F.length(query) == 0, F.lit(0).cast("long"))
                    .otherwise((count_in(query, "&") + 1).cast("long")))
        .withColumn("host_digit_ppm",
                    F.expr("CAST(1000000 AS BIGINT) * "
                           f"(length(url_host) - length(regexp_replace(url_host, '[0-9]', ''))) "
                           "DIV greatest(length(url_host), 1)"))
        .withColumn("host_hyphens", count_in(F.col("url_host"), "-").cast("long"))
    )


def url_spam_filter(df, url_col: str = "url",
                    max_url_len: int = 512, max_path_depth: int = 8,
                    max_n_params: int = 8, max_host_digit_ppm: int = 300_000,
                    max_host_hyphens: int = 3):
    """Frontier-side URL gate: keep URLs whose shape stays under every
    threshold (exact integer comparisons; feature columns dropped on
    the way out, cascade-composable like line_shape_filter)."""
    feats = url_features(df, url_col)
    kept = feats.filter(
        (F.col("url_len") <= max_url_len)
        & (F.col("path_depth") <= max_path_depth)
        & (F.col("n_params") <= max_n_params)
        & (F.col("host_digit_ppm") <= max_host_digit_ppm)
        & (F.col("host_hyphens") <= max_host_hyphens))
    return kept.drop("url_host", "url_path", "url_len", "host_len",
                     "path_depth", "n_params", "host_digit_ppm",
                     "host_hyphens")
