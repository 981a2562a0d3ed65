"""Deterministic synthetic `pages` table (Common-Crawl-style web pages).

Shape per BASELINE.json input_hint:
    url: string, warc_ts: timestamp, html: binary, text: string, lang: string

Every field of row ``i`` is a pure function of ``i`` (counter-based
splitmix64 hashing) — the table is identical for any partitioning, any
parallelism, any generation order. ``text`` is produced by running the
frozen extractor (`functions/extract.py`) over ``html`` at generation
time, which *defines* the byte-identity oracle.

Distribution (FIXTURES.md §1):
* POI locations are drawn from a zipf-weighted city list -> a few H3/S2
  cells are heavily skewed ("city centers", exercises salting/AQE),
  the rest uniform;
* ~1% of points have |lat| beyond the Web-Mercator clamp (85.05112878);
* a slice of points sits exactly on z12 tile boundaries;
* ~20% of pages are non-English (lang filter coverage);
* 0-3 entities per page; tag tuples cover all 27 classes including
  precedence-conflict cases and the shop->retail / amenity->misc
  fallbacks.
"""

from __future__ import annotations

import datetime as dt
import html as _html

import numpy as np
import pandas as pd

from ..functions import extract as fx
from ..functions.classify import CLASS_RULES

PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"

from ..functions.hashing import splitmix64, u01  # noqa: E402  (shared kernels)


# (name, lat, lon) — zipf-weighted: city 0 absorbs ~29% of city-drawn POIs.
CITIES = [
    ("new_york", 40.7128, -74.0060), ("tokyo", 35.6762, 139.6503),
    ("london", 51.5074, -0.1278), ("paris", 48.8566, 2.3522),
    ("sao_paulo", -23.5505, -46.6333), ("lagos", 6.5244, 3.3792),
    ("sydney", -33.8688, 151.2093), ("moscow", 55.7558, 37.6173),
    ("mexico_city", 19.4326, -99.1332), ("cairo", 30.0444, 31.2357),
    ("mumbai", 19.0760, 72.8777), ("beijing", 39.9042, 116.4074),
    ("jakarta", -6.2088, 106.8456), ("istanbul", 41.0082, 28.9784),
    ("seoul", 37.5665, 126.9780), ("buenos_aires", -34.6037, -58.3816),
]
_city_w = 1.0 / (np.arange(len(CITIES)) + 1.0)
CITY_CDF = np.cumsum(_city_w / _city_w.sum())

LANGS = ["en", "de", "fr", "es", "ja", "zh"]

# Pre-flatten classification rule triggers: (key, one trigger value).
_RULE_TRIGGERS: list[tuple[str, str]] = []
for _key, _values, _cls in CLASS_RULES:
    if _values is None:
        _RULE_TRIGGERS.append((_key, "speech_therapist"))  # healthcare IS NOT NULL arm
    elif isinstance(_values, str):
        _RULE_TRIGGERS.append((_key, _values))
    else:
        for _v in _values:
            _RULE_TRIGGERS.append((_key, _v))
# Fallback + conflict cases appended explicitly.
_EXTRA_TAGSETS: list[dict[str, str]] = [
    {"shop": "unclassified_widgets"},                      # shop fallback -> retail
    {"amenity": "mystery_box"},                            # -> misc
    {"leisure": "hammock_area"},                           # -> misc
    {"tourism": "obscure_site"},                           # -> misc
    {"amenity": "ice_cream", "shop": "ice_cream"},         # precedence: fast_food
    {"amenity": "marketplace", "shop": "pet"},             # precedence: grocery? shop grocery arm first
    {"shop": "hairdresser", "amenity": "spa"},             # personal_services via amenity arm
    {"office": "government", "amenity": "townhall"},       # government (amenity arm first)
    {"healthcare": "laboratory", "shop": "tea"},           # specialty_food wins (earlier arm)
]

_CUISINES = ["pizza", "sushi", "thai", "burger", "coffee_shop", "indian"]


def _entity_tags(h: int) -> dict[str, str]:
    """Deterministic tag set for one entity from a hash value."""
    n_triggers = len(_RULE_TRIGGERS)
    total = n_triggers + len(_EXTRA_TAGSETS)
    pick = h % total
    if pick < n_triggers:
        key, val = _RULE_TRIGGERS[pick]
        tags = {key: val}
    else:
        tags = dict(_EXTRA_TAGSETS[pick - n_triggers])
    h2 = (h >> 17) & 0xFFFF
    if h2 % 3 == 0:
        tags["cuisine"] = _CUISINES[h2 % len(_CUISINES)]
    if h2 % 5 == 0:
        tags["opening_hours"] = "Mo-Fr 09:00-17:00"
    if h2 % 7 == 0:
        tags["phone"] = f"+1-555-{h2 % 10000:04d}"
    if h2 % 11 == 0:
        tags["website"] = f"https://venue{h2}.example.com"
    if h2 % 13 == 0:
        tags["brand"] = f"Brand {h2 % 97} & Co"
    if h2 % 17 == 0:
        tags["operator"] = f"Operator {h2 % 53}"
    return tags


def _entity_latlon(h: np.uint64, idx: np.ndarray):
    """Vectorized location draw with skew + clamp + boundary slices."""
    mode = u01(idx, 101 + int(h))
    u_lat = u01(idx, 211 + int(h))
    u_lon = u01(idx, 223 + int(h))
    city_u = u01(idx, 227 + int(h))
    city_i = np.searchsorted(CITY_CDF, city_u)
    city_i = np.clip(city_i, 0, len(CITIES) - 1)
    clat = np.array([c[1] for c in CITIES])[city_i]
    clon = np.array([c[2] for c in CITIES])[city_i]

    lat = np.where(mode < 0.70, clat + (u_lat - 0.5) * 0.08, (u_lat - 0.5) * 169.0)
    lon = np.where(mode < 0.70, clon + (u_lon - 0.5) * 0.08, (u_lon - 0.5) * 360.0)
    # ~1.5%: beyond the Web-Mercator clamp (reference clamp path)
    polar = mode >= 0.985
    lat = np.where(polar, np.where(u_lat < 0.5, 85.06 + u_lat * 4.9, -85.06 - (u_lat - 0.5) * 4.9), lat)
    lat = np.round(lat, 6)
    lon = np.round(lon, 6)
    # ~1.5%: exactly on z12 tile lon boundaries (360/4096 grid) — snapped
    # AFTER rounding so the boundary value survives bit-exactly.
    edge = (mode >= 0.97) & ~polar
    lon = np.where(edge, np.round((lon + 180.0) / (360.0 / 4096.0)) * (360.0 / 4096.0) - 180.0, lon)
    lon = np.clip(lon, -180.0, 180.0)
    return lat, lon


# Deterministic paragraph pool for realistic page bodies (real crawl HTML
# runs 30-100 KB; the `body_paragraphs` knob scales synthetic pages toward
# that regime for benchmarks while tests keep small fast pages).
_WORDPOOL = [
    "market", "street", "harbor", "museum", "garden", "station", "bakery",
    "festival", "river", "bridge", "quarter", "plaza", "gallery", "workshop",
    "heritage", "district", "terrace", "courtyard", "monument", "boulevard",
    "local", "historic", "famous", "quiet", "bustling", "renovated", "seasonal",
    "visitors", "residents", "travelers", "artisans", "vendors", "guides",
]


def _paragraph(seed: int) -> str:
    h = splitmix64(np.arange(40, dtype=np.uint64), 7000 + seed)
    words = [_WORDPOOL[int(v) % len(_WORDPOOL)] for v in h]
    return " ".join(words).capitalize() + "."


_PARAGRAPHS = [_paragraph(i) for i in range(48)]

_NOISE_SNIPPETS = [
    '<script type="text/javascript">var x = 1 < 2 && "tags";</script>',
    "<style>.poi { color: red; }</style>",
    "<!-- crawler noise: <div class=\"poi\" data-name=\"FAKE\"> inside comment -->",
    "<p>Lorem ipsum dolor sit amet, consectetur &amp; adipiscing elit.</p>",
    "<ul><li>breadcrumb &gt; home</li><li>breadcrumb &gt; places</li></ul>",
]


def synthesize_pages_pdf(start: int, end: int, body_paragraphs: int = 2) -> pd.DataFrame:
    """Generate rows [start, end) as a pandas DataFrame.

    ``body_paragraphs`` scales page size toward realistic crawl HTML
    (~300 bytes per paragraph; default 2 keeps unit tests fast, bench
    uses ~30 for ~10 KB pages)."""
    ids = np.arange(start, end, dtype=np.uint64)
    n = len(ids)
    lang_u = u01(ids, 1)
    lang = np.where(
        lang_u < 0.80, "en", np.array(LANGS)[1:][ (splitmix64(ids, 2) % np.uint64(5)).astype(np.int64) ]
    )
    n_ent_u = u01(ids, 3)
    n_entities = np.select(
        [n_ent_u < 0.25, n_ent_u < 0.60, n_ent_u < 0.85], [0, 1, 2], default=3
    )
    ts_off = (splitmix64(ids, 4) % np.uint64(365 * 24 * 3600)).astype(np.int64)
    base_ts = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
    tag_h = splitmix64(ids, 5)

    # per-entity locations (3 slots, masked by n_entities)
    lats, lons = [], []
    for slot in range(3):
        la, lo = _entity_latlon(np.uint64(slot), ids)
        lats.append(la)
        lons.append(lo)

    urls = [f"https://site-{int(splitmix64(np.array([i]), 6)[0]) % 5000:04d}.example.org/page/{int(i)}" for i in ids]

    htmls: list[bytes] = []
    for r in range(n):
        i = int(ids[r])
        parts = [
            "<html><head>",
            f"<title>Page {i} &mdash; city guide</title>",
            _NOISE_SNIPPETS[i % len(_NOISE_SNIPPETS)],
            "</head><body>",
            f"<h1>Guide entry {i}</h1>",
            _NOISE_SNIPPETS[(i // 7 + 1) % len(_NOISE_SNIPPETS)],
        ]
        for p in range(body_paragraphs):
            parts.append(f"<p>{_PARAGRAPHS[(i * 7 + p * 13) % len(_PARAGRAPHS)]}</p>")
        for j in range(int(n_entities[r])):
            h = int(splitmix64(np.array([i * 4 + j]), 7)[0])
            tags = _entity_tags(h)
            name = f"Venue {i}-{j} & Friends" if h % 9 == 0 else f"Venue {i}-{j}"
            streets = ["Harbor Rd", "Market St", "Museum Ave", "Bridge Ln", "Plaza Blvd"]
            address = (
                f"{h % 999 + 1} {streets[h % len(streets)]}, Unit {h % 40 + 1}"
                if h % 3 != 0 else None
            )
            # repr(float(...)): identical bytes to numpy-1.x scalar repr,
            # but immune to numpy>=2's 'np.float64(...)' repr change
            lat_s, lon_s = repr(float(lats[j][r])), repr(float(lons[j][r]))
            attrs = [f'data-name="{_html.escape(name, quote=True)}"',
                     f'data-lat="{lat_s}"', f'data-lon="{lon_s}"']
            if address is not None:
                attrs.append(f'data-address="{_html.escape(address, quote=True)}"')
            attrs += [f'data-{k}="{_html.escape(v, quote=True)}"' for k, v in sorted(tags.items())]
            # ~10% of entities are nameless -> must be filtered by the
            # engine's NULL-rejection (reference process.py:214)
            if h % 10 == 3:
                attrs = attrs[1:]
            parts.append(f'<div class="poi" {" ".join(attrs)}>')
            parts.append(f"<h2>{_html.escape(name)}</h2>")
            if address is not None:
                parts.append(f"<p>Address: {_html.escape(address)}</p>")
            parts.append(f"<p>Located at {lat_s}, {lon_s}.</p>")
            parts.append("</div>")
        parts.append("<footer>generated corpus &copy; example</footer>")
        parts.append("</body></html>")
        htmls.append("\n".join(parts).encode("utf-8"))

    pdf = pd.DataFrame(
        {
            "url": urls,
            "warc_ts": [base_ts + dt.timedelta(seconds=int(o)) for o in ts_off],
            "html": htmls,
            "lang": lang,
        }
    )
    pdf["text"] = fx.extract_text_series(pdf["html"])
    return pdf[["url", "warc_ts", "html", "text", "lang"]]


def pages_df(spark, n_rows: int, partitions: int | None = None, body_paragraphs: int = 2):
    """Distributed generation: spark.range -> mapInPandas batches.

    Deterministic for any ``partitions`` because every row derives
    purely from its id.
    """
    parts = partitions or max(spark.sparkContext.defaultParallelism, 8)

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            if len(ids):
                yield synthesize_pages_pdf(int(ids.min()), int(ids.max()) + 1, body_paragraphs)

    return (
        spark.range(0, n_rows, 1, parts)
        .mapInPandas(gen, schema=PAGES_SCHEMA)
    )


def write_pages(spark, path: str, n_rows: int, partitions: int | None = None,
                body_paragraphs: int = 2) -> None:
    pages_df(spark, n_rows, partitions, body_paragraphs).write.mode("overwrite").parquet(path)
