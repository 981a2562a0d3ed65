"""Extractor byte-identity + entity extraction coverage."""

import numpy as np
import pandas as pd

from osm_poi_cloud_spark.functions import extract as fx
from osm_poi_cloud_spark.functions.classify import classify_tags
from osm_poi_cloud_spark.sources import pages as pg


def test_byte_identity_invariant():
    """extract_text(html) == text byte-for-byte on the synthetic corpus
    (BASELINE.json input_hint per-row invariant)."""
    pdf = pg.synthesize_pages_pdf(0, 500)
    got = fx.extract_text_series(pdf["html"])
    exp = pdf["text"]
    mismatches = [
        (i, g, e)
        for i, (g, e) in enumerate(zip(got.tolist(), exp.tolist()))
        if g.encode() != e.encode()
    ]
    assert not mismatches, mismatches[:2]


def test_generator_determinism_and_partition_independence():
    a = pg.synthesize_pages_pdf(0, 120)
    b = pd.concat([pg.synthesize_pages_pdf(0, 37), pg.synthesize_pages_pdf(37, 120)], ignore_index=True)
    pd.testing.assert_frame_equal(a, b)


def test_noise_markup_is_stripped():
    html = (
        b"<html><head><script>document.write('<div class=\"x\">HIDE</div>')</script>"
        b"<style>p{}</style><!-- HIDE2 --></head>"
        b"<body><h1>Keep &amp; Hold</h1><p>  spaced   out </p></body></html>"
    )
    out = fx.extract_text_series(pd.Series([html]))[0]
    assert "HIDE" not in out
    assert out == "Keep & Hold\nspaced out"


def test_entities_extracted_with_types():
    pdf = pg.synthesize_pages_pdf(0, 400)
    ents = fx.extract_entities_frame(pdf["url"], pdf["html"])
    assert len(ents) > 200
    assert ents["lat"].dtype == np.float64
    # every extracted entity belongs to its source page
    assert ents["url"].isin(pdf["url"]).all()
    # nameless slice exists (NULL-rejection coverage)
    assert ents["name"].isna().any()
    # fake POI inside an HTML comment is never extracted
    assert not ents["name"].fillna("").eq("FAKE").any()
    # entity names with escapes round-trip ('&' preserved)
    assert ents["name"].fillna("").str.contains("&").any()
    # addresses extracted for the ~2/3 slice that has them, absent elsewhere
    assert 0.4 < ents["address"].notna().mean() < 0.9
    assert ents["address"].dropna().str.contains(r"\d+ .+, Unit \d+", regex=True).all()


def test_tag_coverage_spans_all_classes():
    pdf = pg.synthesize_pages_pdf(0, 3000)
    ents = fx.extract_entities_frame(pdf["url"], pdf["html"])
    tag_cols = [c for c in fx.ENTITY_COLUMNS if c not in ("name", "lat", "lon")]
    classes = {
        classify_tags({k: (v if isinstance(v, str) else None) for k, v in row.items()})
        for row in ents[tag_cols].to_dict("records")
    }
    from osm_poi_cloud_spark.functions.classify import ALL_CLASSES

    missing = set(ALL_CLASSES) - classes
    assert not missing, f"classes never generated: {missing}"


def test_polar_and_boundary_slices_present():
    pdf = pg.synthesize_pages_pdf(0, 4000)
    ents = fx.extract_entities_frame(pdf["url"], pdf["html"])
    lat = ents["lat"].dropna()
    lon = ents["lon"].dropna()
    assert (lat.abs() > 85.05112878).any(), "no polar clamp-path points"
    step = 360.0 / 4096.0
    on_edge = ((lon + 180.0) / step % 1.0 == 0.0) & (lon > -180.0) & (lon < 180.0)
    assert on_edge.any(), "no exact z12 tile-boundary points"


def test_null_html_yields_empty_text():
    """A null html row must not kill the batch (review finding r1-1)."""
    out = fx.extract_text_series(pd.Series([b"<p>hi</p>", None]))
    assert list(out) == ["hi", ""]
