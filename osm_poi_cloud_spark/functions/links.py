"""Hyperlink extraction: HTML pages -> (src, dst) link edges — the
input the link graph (operators/graph.py pagerank) actually consumes,
and the discovery step of a crawl frontier.

100% native: the href scan is one ``regexp_extract_all`` over the
UTF-8-cast html column (JVM regexp inside codegen — the 10^12-row side
never touches Python), resolution is a CASE chain. The regexp stays in
the Java∩RE2 subset so an oracle engine runs the identical pattern.

Scope (documented): double-quoted ``href`` attributes in ``<a>`` tags;
absolute http(s) URLs pass through, root-relative (``/path``) resolve
against the source page's scheme+host, anything else (protocol-
relative, dotted-relative, javascript:, mailto:, fragments) is
dropped. That covers the crawl-graph signal; a full URL resolver is a
parser, not a filter, and lives out of the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: href scan — identical pattern text on both engines
LINK_RE = r'<a\s[^>]*href="([^"]*)"'
#: scheme+host of a URL (for root-relative resolution)
ORIGIN_RE = r"^([a-z][a-z0-9+.-]*://[^/?#]+).*$"
HOST_ONLY_RE = r"^[a-z][a-z0-9+.-]*://([^/?#]+).*$"


def extract_links(pages: DataFrame, html_col: str = "html",
                  url_col: str = "url") -> DataFrame:
    """(src, dst) absolute link edges from the html column. One native
    regexp pass + explode; no Python."""
    html_str = F.col(html_col).cast("string")
    hrefs = F.regexp_extract_all(html_str, F.lit(LINK_RE), 1)
    origin = F.regexp_replace(F.col(url_col), ORIGIN_RE, "$1")
    exploded = (
        pages.select(F.col(url_col).alias("src"), origin.alias("_origin"),
                     F.explode(hrefs).alias("href"))
    )
    dst = (
        F.when(F.col("href").rlike("^https?://"), F.col("href"))
        .when(F.col("href").startswith("//"), F.lit(None))  # protocol-relative: dropped
        .when(F.col("href").startswith("/"), F.concat(F.col("_origin"), F.col("href")))
        .otherwise(F.lit(None))
    )
    return (
        exploded.withColumn("dst", dst)
        .filter(F.col("dst").isNotNull())
        .select("src", "dst")
    )


def host_link_graph(links: DataFrame) -> DataFrame:
    """(src, dst) URL edges -> distinct host-level edges with self-host
    loops dropped — the graph host-level PageRank runs on (Common
    Crawl's published ranks are exactly host-level)."""
    h = lambda c: F.lower(F.regexp_replace(F.col(c), HOST_ONLY_RE, "$1"))
    return (
        links.select(h("src").alias("src"), h("dst").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


#: whole-tag scan for anchor-text extraction (group 0 = full <a>…</a>)
ANCHOR_RE = r'<a\s[^>]*href="[^"]*"[^>]*>[^<]*</a>'


def extract_links_with_anchors(pages: DataFrame, html_col: str = "html",
                               url_col: str = "url") -> DataFrame:
    """(src, dst, anchor) — link edges with their anchor text. Same
    native shape as ``extract_links`` (one regexp scan + per-element
    sub-extracts inside a ``transform``); anchor text is the flat inner
    text of the <a> element (nested markup is out of the documented
    regexp scope)."""
    html_str = F.col(html_col).cast("string")
    tags = F.regexp_extract_all(html_str, F.lit(ANCHOR_RE), 0)
    origin = F.regexp_replace(F.col(url_col), ORIGIN_RE, "$1")
    exploded = (
        pages.select(F.col(url_col).alias("src"), origin.alias("_origin"),
                     F.explode(tags).alias("tag"))
        .select(
            "src", "_origin",
            F.regexp_extract(F.col("tag"), LINK_RE, 1).alias("href"),
            F.regexp_extract(F.col("tag"), r">([^<]*)</a>$", 1).alias("anchor"),
        )
    )
    dst = (
        F.when(F.col("href").rlike("^https?://"), F.col("href"))
        .when(F.col("href").startswith("//"), F.lit(None))
        .when(F.col("href").startswith("/"), F.concat(F.col("_origin"), F.col("href")))
        .otherwise(F.lit(None))
    )
    return (
        exploded.withColumn("dst", dst)
        .filter(F.col("dst").isNotNull())
        .select("src", "dst", F.trim(F.col("anchor")).alias("anchor"))
    )


#: whole-tag scan for image references (group 0 = full <img ...> tag)
IMG_RE = r'<img\s[^>]*src="[^"]*"[^>]*>'
#: sub-extracts applied per <img> tag
IMG_SRC_RE = r'src="([^"]*)"'
IMG_ALT_RE = r'alt="([^"]*)"'


def extract_image_refs(pages: DataFrame, html_col: str = "html",
                       url_col: str = "url") -> DataFrame:
    """(src, img_url, alt) — image references from the html column, the
    text half of CLIP-style (image, alt/caption) pair construction.
    Same native shape as ``extract_links_with_anchors``: ONE
    ``regexp_extract_all`` whole-tag scan + per-tag sub-extracts, URL
    resolution by the identical absolute/root-relative CASE. Tags
    without a usable src resolve to NULL and are dropped; a missing
    ``alt`` attribute yields an empty string (kept — the downstream
    pair builder decides whether an image with no alt text anywhere is
    usable)."""
    html_str = F.col(html_col).cast("string")
    tags = F.regexp_extract_all(html_str, F.lit(IMG_RE), 0)
    origin = F.regexp_replace(F.col(url_col), ORIGIN_RE, "$1")
    exploded = (
        pages.select(F.col(url_col).alias("src"), origin.alias("_origin"),
                     F.explode(tags).alias("tag"))
        .select(
            "src", "_origin",
            F.regexp_extract(F.col("tag"), IMG_SRC_RE, 1).alias("href"),
            F.regexp_extract(F.col("tag"), IMG_ALT_RE, 1).alias("alt"),
        )
    )
    img_url = (
        F.when(F.col("href").rlike("^https?://"), F.col("href"))
        .when(F.col("href").startswith("//"), F.lit(None))
        .when(F.col("href").startswith("/"), F.concat(F.col("_origin"), F.col("href")))
        .otherwise(F.lit(None))
    )
    return (
        exploded.withColumn("img_url", img_url)
        .filter(F.col("img_url").isNotNull())
        .select("src", "img_url", F.trim(F.col("alt")).alias("alt"))
    )


#: figure-with-caption scan: an <img> inside <figure> followed by its
#: <figcaption> (flat inner text; nested markup out of regexp scope)
FIGCAP_RE = (r'<figure[^>]*>\s*<img\s[^>]*src="[^"]*"[^>]*>\s*'
             r'<figcaption>([^<]*)</figcaption>')


def extract_figure_captions(pages: DataFrame, html_col: str = "html",
                            url_col: str = "url") -> DataFrame:
    """(src, img_url, alt) — ``<figure><img ...><figcaption>`` caption
    text attached to the figure's image (the strongest caption signal
    after alt text for CLIP-style pairs). Same native one-pass shape
    and URL-resolution CASE as ``extract_image_refs``; the caption is
    emitted in the ``alt`` column so the two extractors union directly
    (``extract_image_texts``)."""
    html_str = F.col(html_col).cast("string")
    tags = F.regexp_extract_all(html_str, F.lit(FIGCAP_RE), 0)
    origin = F.regexp_replace(F.col(url_col), ORIGIN_RE, "$1")
    exploded = (
        pages.select(F.col(url_col).alias("src"), origin.alias("_origin"),
                     F.explode(tags).alias("tag"))
        .select(
            "src", "_origin",
            F.regexp_extract(F.col("tag"), IMG_SRC_RE, 1).alias("href"),
            F.regexp_extract(F.col("tag"), FIGCAP_RE, 1).alias("caption"),
        )
    )
    img_url = (
        F.when(F.col("href").rlike("^https?://"), F.col("href"))
        .when(F.col("href").startswith("//"), F.lit(None))
        .when(F.col("href").startswith("/"), F.concat(F.col("_origin"), F.col("href")))
        .otherwise(F.lit(None))
    )
    return (
        exploded.withColumn("img_url", img_url)
        .filter(F.col("img_url").isNotNull())
        .select("src", "img_url", F.trim(F.col("caption")).alias("alt"))
    )


def extract_image_texts(pages: DataFrame, html_col: str = "html",
                        url_col: str = "url") -> DataFrame:
    """(src, img_url, alt) — union of alt-text references and
    figcaption references: the full text side for
    ``operators.multimodal.image_text_pairs``. An image inside a
    captioned figure contributes BOTH rows (its alt, possibly empty,
    and its caption) — the pair builder's distinct-text aggregation
    collapses duplicates."""
    return (extract_image_refs(pages, html_col, url_col)
            .unionByName(extract_figure_captions(pages, html_col, url_col)))


def anchor_text_corpus(links_with_anchors: DataFrame,
                       max_anchors: int = 64) -> DataFrame:
    """Per-TARGET anchor aggregation: (dst, n_links, n_sources,
    anchors) — the classic "what the web calls this page" signal
    (anchor-text corpora train retrieval/quality models; search engines
    have used it since DocId days). ``anchors`` keeps up to
    ``max_anchors`` DISTINCT non-empty texts in sorted order
    (deterministic, bounded per row — no unbounded collect_list on a
    popular target)."""
    return (
        links_with_anchors
        .groupBy("dst")
        .agg(
            F.count(F.lit(1)).alias("n_links"),
            F.countDistinct("src").alias("n_sources"),
            F.slice(F.sort_array(F.collect_set(
                F.when(F.col("anchor") != "", F.col("anchor")))),
                1, max_anchors).alias("anchors"),
        )
    )


#: sitemap XML blocks — identical pattern text on both engines; (?s)
#: lazy blocks stay in the Java∩RE2 subset
SITEMAP_URL_BLOCK_RE = r"(?s)<url>.*?</url>"
SITEMAP_INDEX_BLOCK_RE = r"(?s)<sitemap>.*?</sitemap>"
SITEMAP_LOC_RE = r"<loc>\s*([^<]*?)\s*</loc>"
SITEMAP_LASTMOD_RE = r"<lastmod>\s*([^<]*?)\s*</lastmod>"


def extract_sitemap_entries(sitemaps: DataFrame, xml_col: str = "xml",
                            url_col: str = "sitemap_url") -> DataFrame:
    """Sitemap XML -> ``(sitemap_url, loc, lastmod, is_index)`` — the
    crawl-seeding step between robots.txt discovery
    (functions/robots.py sitemap_directives) and the frontier
    (sitemaps.org protocol; the reference crawls nothing — it ingests
    Overture/OSM dumps — but a web POI pipeline seeds from sitemaps).

    Handles BOTH document kinds: ``<urlset>`` page entries
    (``is_index = false``) and ``<sitemapindex>`` child-sitemap
    entries (``is_index = true`` — feed those back through a fetch +
    this extractor). ``lastmod`` is NULL when the block has none.
    100% native: two regexp block scans + explode, per-block loc /
    lastmod pulls — patterns shared verbatim with the SQL oracle."""
    xml = F.col(xml_col).cast("string")

    def blocks(pat: str, is_index: bool) -> DataFrame:
        d = sitemaps.select(
            F.col(url_col).alias("sitemap_url"),
            F.explode(F.regexp_extract_all(xml, F.lit(pat), F.lit(0)))
            .alias("_blk"))
        loc = F.regexp_extract("_blk", SITEMAP_LOC_RE, 1)
        lastmod = F.regexp_extract("_blk", SITEMAP_LASTMOD_RE, 1)
        return d.select(
            "sitemap_url",
            F.when(loc == "", None).otherwise(loc).alias("loc"),
            F.when(lastmod == "", None).otherwise(lastmod).alias("lastmod"),
            F.lit(is_index).alias("is_index"))

    return (
        blocks(SITEMAP_URL_BLOCK_RE, False)
        .unionByName(blocks(SITEMAP_INDEX_BLOCK_RE, True))
        .filter(F.col("loc").isNotNull())
    )
