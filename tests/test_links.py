"""Link extraction: href scan, resolution rules, host graph, and the
pages -> links -> pagerank composition."""

import pandas as pd
from pyspark.sql import functions as F

from osm_poi_cloud_spark.functions import links as L


def _page(src, body):
    return (src, f"<html><body>{body}</body></html>".encode())


def test_extract_and_resolve(spark):
    rows = [
        _page("https://a.example/p/1",
              '<a href="https://b.example/x">abs</a>'
              '<a class="n" href="/local/2">rel</a>'
              '<a href="//cdn.example/j">proto-rel</a>'
              '<a href="mailto:x@y.z">mail</a>'
              '<a href="sub/page">dotted</a>'
              "<a href='single'>unquoted</a>"),
        _page("https://c.example/q", "no links here"),
    ]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["url", "html"]))
    got = L.extract_links(df).toPandas().sort_values("dst").reset_index(drop=True)
    assert list(got["dst"]) == ["https://a.example/local/2", "https://b.example/x"]
    assert (got["src"] == "https://a.example/p/1").all()
    # native plan: no Python in the extraction path
    plan = L.extract_links(df)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


def test_host_graph_and_pagerank_composition(spark):
    from osm_poi_cloud_spark.operators.graph import pagerank

    rows = []
    # hub.example is linked by every site; sites interlink in a ring
    for i in range(6):
        body = ('<a href="https://hub.example/">hub</a>'
                f'<a href="https://s{(i + 1) % 6}.example/home">next</a>'
                f'<a href="/self/loop">self</a>')
        rows.append(_page(f"https://s{i}.example/index", body))
    rows.append(_page("https://hub.example/", '<a href="https://s0.example/">back</a>'))
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["url", "html"]))
    edges = L.host_link_graph(L.extract_links(df))
    got = edges.toPandas()
    assert ("s0.example", "s0.example") not in set(zip(got["src"], got["dst"]))
    pr = pagerank(edges, iters=10).toPandas().set_index("node")["rank"]
    assert pr.idxmax() == "hub.example"  # every site votes for the hub
    assert abs(pr.sum() - 1.0) < 1e-9


def test_anchor_text_extraction_and_corpus(spark):
    rows = [
        _page("https://a.example/1",
              '<a href="https://t.example/page">Great Resource</a>'
              '<a href="/rel">  local link  </a>'
              '<a href="https://t.example/page"></a>'),
        _page("https://b.example/2",
              '<a class="x" href="https://t.example/page">great resource</a>'),
    ]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["url", "html"]))
    links = L.extract_links_with_anchors(df)
    got = links.toPandas()
    assert len(got) == 4
    rel = got[got["dst"] == "https://a.example/rel"]
    assert list(rel["anchor"]) == ["local link"]  # trimmed
    corpus = L.anchor_text_corpus(links).toPandas().set_index("dst")
    t = corpus.loc["https://t.example/page"]
    assert t["n_links"] == 3 and t["n_sources"] == 2
    # distinct, sorted, empty-anchor dropped
    assert list(t["anchors"]) == ["Great Resource", "great resource"]
    plan = links._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
