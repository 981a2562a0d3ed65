"""Deterministic HTML -> text + POI-entity extraction.

The graft analog of the reference's osmium extraction stage
(``stack/batch/process.py:47-117``): where the reference turns a PBF
into named, tagged point features, this engine turns Common-Crawl-style
HTML pages into named, tagged, geo-located POI entities.

Contract (BASELINE.json input_hint): for every row of the `pages`
table, ``extract_text(html) == text`` **byte-identically**. The
synthetic pages generator (`osm_poi_cloud_spark.sources.pages`) uses
this same module to produce the golden `text` column, and the module is
frozen by EXTRACTOR_VERSION — any change must bump the version and
regenerate fixtures.

Implementation: regex/pandas-vectorized transforms only (compiled C
regex over Arrow-batched pandas Series inside a pandas UDF — no per-row
Python in the hot path). The entity format is schema.org-flavoured
microdata with ``data-*`` attributes, constrained enough that regex
extraction is exact.
"""

from __future__ import annotations

import html as _html
import re

import numpy as np
import pandas as pd

EXTRACTOR_VERSION = "1.1.0"  # 1.1.0: + address entity field

_RE_SCRIPT = re.compile(r"(?is)<script\b.*?</script>")
_RE_STYLE = re.compile(r"(?is)<style\b.*?</style>")
_RE_COMMENT = re.compile(r"(?s)<!--.*?-->")
_BLOCK_TAGS = (
    "p|div|br|h1|h2|h3|h4|h5|h6|li|ul|ol|tr|table|section|article|header|"
    "footer|nav|aside|title|blockquote|pre|hr|address|figure|figcaption|main"
)
_RE_BLOCK = re.compile(rf"(?i)</?(?:{_BLOCK_TAGS})\b[^>]*>")
_RE_TAG = re.compile(r"<[^>]+>")
_RE_SPACES = re.compile(r"[ \t\r\f\v]+")
_RE_BLANK_LINES = re.compile(r"\n{2,}")

# POI entity markup the synthetic corpus embeds (schema.org-ish):
# <div class="poi" data-name="..." data-lat="..." data-lon="..."
#      data-amenity="..." data-shop="..." ... >
_RE_POI = re.compile(r'(?is)<(?:div|span)\s+class="poi"([^>]*)>')
_RE_ATTR = re.compile(r'data-([a-z_]+)="([^"]*)"')


def extract_text_series(html_bytes: pd.Series) -> pd.Series:
    """Vectorized HTML -> visible text. Byte-identical oracle for `text`.

    Pipeline: utf-8 decode -> strip script/style/comments -> block tags
    to '\\n' -> strip remaining tags -> unescape entities -> per-line
    strip -> collapse blank lines -> trim.
    """
    s = html_bytes.map(lambda b: b.decode("utf-8") if isinstance(b, (bytes, bytearray)) else b)
    s = s.astype("string")
    s = s.str.replace(_RE_SCRIPT, "", regex=True)
    s = s.str.replace(_RE_STYLE, "", regex=True)
    s = s.str.replace(_RE_COMMENT, "", regex=True)
    s = s.str.replace(_RE_BLOCK, "\n", regex=True)
    s = s.str.replace(_RE_TAG, "", regex=True)
    # na_action: a null html row must yield "" (fillna below), not a
    # TypeError from unescape(pd.NA) killing the whole Arrow batch
    s = s.map(_html.unescape, na_action="ignore")
    s = s.astype("string")
    s = s.str.replace(_RE_SPACES, " ", regex=True)
    # strip spaces around newlines, collapse blank lines, trim ends
    s = s.str.replace(r" ?\n ?", "\n", regex=True)
    s = s.str.replace(_RE_BLANK_LINES, "\n", regex=True)
    s = s.str.strip()
    return s.astype(object).fillna("")


ENTITY_COLUMNS = [
    "name", "address", "lat", "lon",
    "amenity", "shop", "leisure", "tourism", "office", "healthcare",
    "railway", "aeroway", "historic", "man_made", "natural", "public_transport",
    "cuisine", "opening_hours", "phone", "website", "brand", "operator",
]


def extract_entities_frame(url: pd.Series, html_bytes: pd.Series,
                           carry: pd.DataFrame | None = None) -> pd.DataFrame:
    """Extract POI entities from a batch of pages.

    Returns one row per entity: url, entity_idx, plus ENTITY_COLUMNS
    (lat/lon as float64, everything else nullable string). Pages with
    no entities produce no rows. ``carry``: positionally-aligned source
    columns (e.g. warc_ts) replicated onto each entity row.
    """
    url = url.reset_index(drop=True)
    html_bytes = html_bytes.reset_index(drop=True)
    if carry is not None:
        carry = carry.reset_index(drop=True)
    text = html_bytes.map(lambda b: b.decode("utf-8") if isinstance(b, (bytes, bytearray)) else b)
    text = text.astype("string")
    # commented-out / scripted markup is not content (same rule as the
    # text path) — strip before matching entities
    text = text.str.replace(_RE_SCRIPT, "", regex=True)
    text = text.str.replace(_RE_STYLE, "", regex=True)
    text = text.str.replace(_RE_COMMENT, "", regex=True)
    matches = text.str.extractall(_RE_POI)  # MultiIndex (row, match) -> attrs blob
    if matches.empty:
        return pd.DataFrame(
            {"url": pd.Series([], dtype=object),
             "entity_idx": pd.Series([], dtype=np.int32),
             **{c: pd.Series([], dtype=np.float64 if c in ("lat", "lon") else object)
                for c in ENTITY_COLUMNS},
             **({c: carry[c].iloc[:0] for c in carry.columns} if carry is not None else {})}
        )
    rows = matches.index.get_level_values(0)
    out = pd.DataFrame({
        "url": url.iloc[rows].to_numpy(),
        "entity_idx": matches.index.get_level_values(1).to_numpy().astype(np.int32),
    })
    if carry is not None:
        for c in carry.columns:
            out[c] = carry[c].iloc[rows].to_numpy()
    attrs = matches[0].map(lambda blob: dict(_RE_ATTR.findall(blob)))
    for c in ENTITY_COLUMNS:
        vals = attrs.map(lambda d, _c=c: d.get(_c))
        if c in ("lat", "lon"):
            out[c] = pd.to_numeric(vals, errors="coerce").astype(np.float64).to_numpy()
        else:
            out[c] = vals.map(lambda v: _html.unescape(v) if isinstance(v, str) else None).to_numpy()
    return out
