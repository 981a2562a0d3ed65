"""robots.txt: RFC 9309 parsing (groups, exact product-token agent
match, empty disallow), longest-prefix-match filtering with allow-wins
ties, unknown-host default allow."""

import pandas as pd
from pyspark.sql import functions as F

from osm_poi_cloud_spark.functions import robots as R

ROBOTS = """
# politeness file
User-agent: *
Disallow: /private/
Allow: /private/ok/
Disallow: /tmp

User-agent: spark-graft
User-agent: otherbot
Disallow: /graft-only/
Allow:

User-agent: megacrawler
Disallow: /
"""


def test_parse_groups_and_agent_selection():
    # specific group wins over *
    rules = R.parse_robots(ROBOTS, agent="spark-graft")
    assert rules == [("/graft-only/", False)]
    # stacked user-agent lines share the group
    assert R.parse_robots(ROBOTS, agent="otherbot") == [("/graft-only/", False)]
    # fallback group
    star = R.parse_robots(ROBOTS, agent="somebody-else")
    assert ("/private/", False) in star and ("/private/ok/", True) in star
    assert ("/tmp", False) in star
    # RFC 9309 exact product-token match: version suffix stripped,
    # case-insensitive
    assert R.parse_robots(ROBOTS, agent="MegaCrawler/2.1") == [("/", False)]
    # ...but a group token that is only a PREFIX of the agent's product
    # token does NOT match (the spec rejects partial matches) -> *
    v2 = R.parse_robots(ROBOTS, agent="megacrawler-v2")
    assert ("/private/", False) in v2 and ("/", False) not in v2
    # empty Allow line is ignored (no empty-prefix rules)
    assert all(p for p, _ in R.parse_robots(ROBOTS, agent="spark-graft"))
    # no robots -> no rules
    assert R.parse_robots("", agent="x") == []


def test_longest_match_filter(spark):
    robots = spark.createDataFrame(pd.DataFrame({
        "host": ["a.example", "b.example"],
        "content": [ROBOTS, "User-agent: *\nDisallow: /\nAllow: /pub/"],
    }))
    rules = R.robots_rules_df(robots, agent="anybody")
    urls = spark.createDataFrame(pd.DataFrame({"url": [
        "https://a.example/private/secret.html",   # blocked (/private/)
        "https://a.example/private/ok/fine.html",  # allowed (longer allow)
        "https://a.example/tmpfile",               # blocked (/tmp prefix)
        "https://a.example/public/x",              # no rule match -> allow
        "https://b.example/pub/doc",               # allow beats / (longer)
        "https://b.example/else",                  # blocked (/)
        "https://UNKNOWN.example/x",               # no robots -> allow
    ]}))
    got = R.filter_allowed_urls(urls, rules, keep_decision=True).toPandas() \
        .set_index("url")["allowed"]
    assert got["https://a.example/private/secret.html"] == False  # noqa: E712
    assert got["https://a.example/private/ok/fine.html"] == True  # noqa: E712
    assert got["https://a.example/tmpfile"] == False  # noqa: E712
    assert got["https://a.example/public/x"] == True  # noqa: E712
    assert got["https://b.example/pub/doc"] == True  # noqa: E712
    assert got["https://b.example/else"] == False  # noqa: E712
    assert got["https://UNKNOWN.example/x"] == True  # noqa: E712
    kept = R.filter_allowed_urls(urls, rules).toPandas()["url"]
    assert len(kept) == 4 and "allowed" not in kept


def test_tie_allow_wins(spark):
    robots = spark.createDataFrame(pd.DataFrame({
        "host": ["t.example"],
        "content": ["User-agent: *\nDisallow: /dir/\nAllow: /dir/\n"],
    }))
    rules = R.robots_rules_df(robots)
    urls = spark.createDataFrame(pd.DataFrame({"url": ["https://t.example/dir/x"]}))
    got = R.filter_allowed_urls(urls, rules, keep_decision=True).first()
    assert got["allowed"] is True


def test_no_python_in_url_path(spark):
    """The per-URL matching plan is UDF-free (parsing is the only
    Python, and it runs on the tiny robots side)."""
    robots = spark.createDataFrame(pd.DataFrame({
        "host": ["a.example"], "content": ["User-agent: *\nDisallow: /x/"]}))
    rules = R.robots_rules_df(robots, agent="a").cache()
    rules.count()  # materialize: the Python parse happens here, once
    urls = spark.createDataFrame(pd.DataFrame({"url": ["https://a.example/x/1"]}))
    plan = R.filter_allowed_urls(urls, rules)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "EvalPython" not in plan


def test_sitemap_directives(spark):
    from osm_poi_cloud_spark.functions.robots import sitemap_directives

    content = ("User-agent: *\nDisallow: /x\n"
               "Sitemap: https://h.example/a.xml\n"
               "  SITEMAP: https://h.example/b.xml\n"
               "sitemap:https://h.example/c.xml\n"
               "not-a-sitemap: https://h.example/d.xml\n")
    df = spark.createDataFrame([("h.example", content)],
                               "host string, content string")
    got = sorted(r["sitemap_url"]
                 for r in sitemap_directives(df).collect())
    # directives are global + case-insensitive; indentation tolerated;
    # 'not-a-sitemap' must not match (anchored key)
    assert got == [f"https://h.example/{k}.xml" for k in "abc"]
