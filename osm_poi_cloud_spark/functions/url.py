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
