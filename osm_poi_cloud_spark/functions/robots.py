"""robots.txt crawl hygiene: parse per-host rule files and filter URL
tables by the longest-match allow/disallow rule — the politeness gate
every crawler applies before fetching (and that curation re-applies
when re-processing old crawls against current exclusions).

Semantics follow the REP spec (RFC 9309): rules are (path-prefix,
allow|disallow) under the most specific matching user-agent group;
the MOST SPECIFIC (longest) matching prefix wins; on a length tie the
allow rule wins; a URL matching no rule — or a host with no robots
file — is allowed.

Division of labor:

* **Parsing** (``parse_robots`` / ``robots_rules_df``) is per-file
  Python inside an Arrow batch — robots files are tiny and per-host
  (bounded rows out: one per rule).
* **Matching** (``filter_allowed_urls``) is 100% native: host/path
  extraction by regexp (kept in the Java∩RE2 subset so the oracle
  runs the same strings), a hash join on host, a prefix filter, and
  one window taking the longest rule. No Python in the per-URL path —
  the table being filtered is the 10^12-row side.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: host and path extraction — same regex text on both engines
HOST_RE = r"^[a-z][a-z0-9+.-]*://([^/?#]+).*$"
PATH_RE = r"^[a-z][a-z0-9+.-]*://[^/?#]+([^?#]*).*$"


def parse_robots(content: str, agent: str = "spark-graft") -> list[tuple[str, bool]]:
    """robots.txt text -> [(path_prefix, allowed)] for ``agent``.

    Group selection per RFC 9309 §2.2.1: case-insensitive EXACT match
    of the crawler's product token (``agent`` with any ``/version``
    suffix stripped) against the group's user-agent token; groups
    sharing the token are merged; ``*`` is the fallback group. A group
    token that is merely a prefix of the agent does NOT match (the
    spec rejects partial product-token matches). Empty-path rules are
    ignored (an
    empty Disallow traditionally means allow-all). Wildcards beyond
    the trailing-prefix semantics are out of scope (documented)."""
    groups: dict[str, list[tuple[str, bool]]] = {}
    current: list[str] = []
    agent_l = agent.lower()
    last_was_agent = False
    for raw in (content or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            token = val.lower()
            if last_was_agent:
                current.append(token)
            else:
                current = [token]
            for t in current:
                groups.setdefault(t, [])
            last_was_agent = True
            continue
        last_was_agent = False
        if key in ("allow", "disallow") and current:
            if not val:
                continue
            for t in current:
                groups.setdefault(t, []).append((val, key == "allow"))
    product_token = agent_l.split("/", 1)[0].strip()
    exact = groups.get(product_token)
    if exact is not None:
        return exact
    return groups.get("*", [])


def robots_rules_df(robots: DataFrame, agent: str = "spark-graft",
                    host_col: str = "host",
                    content_col: str = "content") -> DataFrame:
    """(host, content) robots files -> (host, prefix, allow, rule_len)
    rule rows, Arrow-batched."""

    def batches(it):
        for pdf in it:
            hosts, prefixes, allows, lens = [], [], [], []
            for host, content in zip(pdf[host_col], pdf[content_col]):
                for prefix, allow in parse_robots(content or "", agent):
                    hosts.append(host)
                    prefixes.append(prefix)
                    allows.append(allow)
                    lens.append(len(prefix))
            yield pd.DataFrame({"host": hosts, "prefix": prefixes,
                                "allow": allows, "rule_len": lens})

    return robots.select(F.col(host_col), F.col(content_col)).mapInPandas(
        batches, schema="host string, prefix string, allow boolean, rule_len int")


def filter_allowed_urls(urls: DataFrame, rules: DataFrame,
                        url_col: str = "url",
                        broadcast_rules: bool = True,
                        keep_decision: bool = False) -> DataFrame:
    """Filter a URL table by the robots rules (longest match wins,
    allow wins ties, no-match allows). ``keep_decision`` returns all
    rows with an ``allowed`` column instead of filtering."""
    host = F.regexp_replace(F.col(url_col), HOST_RE, "$1")
    path = F.regexp_replace(F.col(url_col), PATH_RE, "$1")
    tagged = urls.withColumn("_host", F.lower(host)) \
        .withColumn("_path", F.when(path == F.col(url_col), F.lit("/"))
                    .otherwise(F.when(path == "", "/").otherwise(path)))
    r = rules.select(F.lower(F.col("host")).alias("_host"),
                     "prefix", "allow", "rule_len")
    if broadcast_rules:
        r = F.broadcast(r)
    # inner join + prefix filter: only URLs with a MATCHING rule appear;
    # everything else (unknown host, no matching prefix) defaults allow
    matches = (
        tagged.select(url_col, "_host", "_path").join(r, "_host")
        .filter(F.col("_path").startswith(F.col("prefix")))
    )
    # longest-match-wins as a partial-aggregated groupBy instead of a
    # row_number window: max(struct(rule_len, allow)) picks the same
    # (rule_len desc, allow-wins-ties) winner — struct comparison is
    # lexicographic and true > false — but combines map-side before the
    # exchange, where the window sorted every matching rule row through
    # it. Result-identical: only the winner's ``allow`` is kept.
    best = (
        matches.groupBy(url_col)
        .agg(F.max(F.struct("rule_len", "allow"))["allow"]
             .alias("_rule_allow"))
    )
    # join the ORIGINAL urls frame: the decided branch only needs the
    # input columns, so re-deriving _host/_path (three regexes per URL)
    # on this side was wasted work
    decided = (
        urls.join(best, url_col, "left")
        .withColumn("allowed", F.coalesce(F.col("_rule_allow"), F.lit(True)))
        .drop("_rule_allow")
    )
    if keep_decision:
        return decided
    return decided.filter(F.col("allowed")).drop("allowed")


#: Sitemap: directives — shared verbatim with the SQL oracle
SITEMAP_DIRECTIVE_RE = r"(?im)^[ \t]*sitemap:[ \t]*(\S+)"


def sitemap_directives(robots: DataFrame, host_col: str = "host",
                       content_col: str = "content") -> DataFrame:
    """robots.txt -> ``(host, sitemap_url)`` Sitemap directives.
    Unlike Allow/Disallow these are NOT group-scoped (RFC 9309 §2.3 /
    sitemaps.org: valid anywhere in the file, any case), so this is
    one 100% native multiline-regexp pass — no Python, no parser."""
    return robots.select(
        F.col(host_col).alias("host"),
        F.explode(F.regexp_extract_all(
            F.col(content_col).cast("string"),
            F.lit(SITEMAP_DIRECTIVE_RE), F.lit(1))).alias("sitemap_url"))
