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


def test_image_refs_extraction(spark):
    rows = [
        _page("https://a.example/p/1",
              '<img src="https://cdn.example/logo.png" alt="The Logo">'
              '<img class="b" src="/pics/cat.jpg" alt="  a cat  ">'
              '<img src="//cdn.example/x.png" alt="proto-rel">'
              '<img src="rel.gif" alt="dotted">'
              '<img src="https://cdn.example/noalt.png">'),
        _page("https://b.example/q", "no images"),
    ]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["url", "html"]))
    got = L.extract_image_refs(df).toPandas().sort_values("img_url").reset_index(drop=True)
    assert list(got["img_url"]) == [
        "https://a.example/pics/cat.jpg",       # root-relative resolved
        "https://cdn.example/logo.png",
        "https://cdn.example/noalt.png",
    ]
    assert list(got["alt"]) == ["a cat", "The Logo", ""]  # trimmed; missing alt -> ""
    plan = L.extract_image_refs(df)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


def test_image_text_pairs_with_real_features(spark):
    """CLIP-pair composition: <img> refs joined to the synthetic media
    catalog and to REAL decoded pixel features (codec path, not the
    byte fallback)."""
    from osm_poi_cloud_spark.operators.multimodal import (
        extract_image_features, image_text_pairs, make_synthetic_media)

    media = make_synthetic_media(spark, 16)
    # catalog: every media item hosted at a deterministic URL
    index = media.select(
        F.concat(F.lit("https://cdn.example/"), "media_id").alias("url"), "media_id")
    rows = [
        _page("https://a.example/1",
              '<img src="https://cdn.example/m0" alt="a png image">'
              '<img src="https://cdn.example/m1" alt="a jpeg">'
              '<img src="https://cdn.example/m2" alt="video thumb">'),
        _page("https://b.example/2",
              '<img src="https://cdn.example/m0" alt="same png, other page">'
              '<img src="https://cdn.example/m4" alt="">'),  # empty alt only
    ]
    pages = spark.createDataFrame(pd.DataFrame(rows, columns=["url", "html"]))
    feats = extract_image_features(media.filter(F.col("kind") == "image"))
    pairs = image_text_pairs(
        L.extract_image_refs(pages), index, features=feats).toPandas()
    by_id = pairs.set_index("media_id")
    assert "m4" not in by_id.index          # require_text drops no-alt images
    m0 = by_id.loc["m0"]
    assert m0["n_refs"] == 2 and m0["n_pages"] == 2
    assert list(m0["texts"]) == ["a png image", "same png, other page"]
    # m0 is a real PNG: feature head[2] = channels/4 > 0 proves the
    # codec decode ran (byte-fallback features have no such structure)
    assert m0["feature"] is not None and m0["feature"][2] > 0
    # m2 is video-kind: joined (it's in the catalog) but feature is
    # NULL (left join against image features only)
    assert by_id.loc["m2"]["feature"] is None


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


def test_figure_caption_extraction(spark):
    rows = [
        _page("https://a.example/p",
              '<figure class="f"><img src="https://cdn.example/fig.png">'
              '<figcaption>  A Nice Figure  </figcaption></figure>'
              '<figure><img src="/rel.png"><figcaption>rel fig</figcaption></figure>'
              '<img src="https://cdn.example/plain.png" alt="plain alt">'
              '<figure><img src="https://cdn.example/nocap.png"></figure>'),
    ]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["url", "html"]))
    caps = L.extract_figure_captions(df).toPandas().sort_values("img_url").reset_index(drop=True)
    assert list(caps["img_url"]) == ["https://a.example/rel.png",
                                     "https://cdn.example/fig.png"]
    assert list(caps["alt"]) == ["rel fig", "A Nice Figure"]  # trimmed
    # union view: captions + alt refs together; captionless figure img
    # still surfaces once via the alt scan (alt "")
    allrefs = L.extract_image_texts(df).toPandas()
    assert len(allrefs) == 6  # 4 img-tag rows + 2 caption rows
    assert "plain alt" in set(allrefs["alt"])
    plan = L.extract_figure_captions(df)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


# --- sitemap extraction ---

def test_sitemap_entries_hand_case(spark):
    urlset = ("<?xml version=\"1.0\"?>\n<urlset>\n"
              "  <url>\n    <loc> https://a.example/p/1 </loc>\n"
              "    <lastmod>2024-03-01</lastmod>\n  </url>\n"
              "  <url><loc>https://a.example/p/2</loc></url>\n"
              "  <url><lastmod>2024-01-01</lastmod></url>\n"      # no loc
              "</urlset>")
    index = ("<sitemapindex><sitemap><loc>https://a.example/s1.xml</loc>"
             "<lastmod>2024-02-02</lastmod></sitemap>"
             "<sitemap></sitemap></sitemapindex>")
    df = spark.createDataFrame(
        [("https://a.example/sitemap.xml", urlset),
         ("https://a.example/index.xml", index)],
        "sitemap_url string, xml string")
    got = sorted(
        (r["sitemap_url"], r["loc"], r["lastmod"], r["is_index"])
        for r in L.extract_sitemap_entries(df).collect())
    assert got == [
        ("https://a.example/index.xml", "https://a.example/s1.xml",
         "2024-02-02", True),
        ("https://a.example/sitemap.xml", "https://a.example/p/1",
         "2024-03-01", False),
        ("https://a.example/sitemap.xml", "https://a.example/p/2",
         None, False),
    ]
