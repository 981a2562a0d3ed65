"""Bounding-box dissolve (operators/dissolve.py)."""

import pytest
from pyspark.sql import functions as F

from osm_poi_cloud_spark.operators import dissolve as dv

# chain 1-2-3 (1 and 3 only meet through 2), touching pair 10-11,
# isolated 20
BOXES = [
    (1, 0.0, 0.0, 2.0, 2.0),
    (2, 1.5, 0.0, 4.0, 2.0),
    (3, 3.5, 0.5, 6.0, 1.5),
    (10, 10.0, 10.0, 11.0, 11.0),
    (11, 11.0, 10.5, 12.0, 11.5),   # touches at x=11 -> merges
    (20, 50.0, 50.0, 51.0, 51.0),
]


def _pairs_expected():
    out = set()
    for i, (a, axm, aym, axx, ayx) in enumerate(BOXES):
        for b, bxm, bym, bxx, byx in BOXES[i + 1:]:
            if axm <= bxx and bxm <= axx and aym <= byx and bym <= ayx:
                out.add((min(a, b), max(a, b)))
    return out


@pytest.fixture(scope="module")
def boxes(spark):
    return spark.createDataFrame(
        BOXES, "box_id long, minx double, miny double, maxx double, maxy double")


@pytest.mark.parametrize("cell", [0.5, 1.0, 3.0, 25.0])
def test_pairs_exact_at_any_cell_size(spark, boxes, cell):
    got = {(r["a"], r["b"])
           for r in dv.bbox_overlap_pairs(boxes, cell).collect()}
    assert got == _pairs_expected()


def test_dissolve_regions(spark, boxes):
    out = {r["box_id"]: r for r in dv.dissolve_bboxes(boxes, 2.0).collect()}
    assert out[1]["region"] == out[2]["region"] == out[3]["region"] == 1
    assert out[1]["region_n"] == 3
    # merged envelope spans the chain
    assert (out[3]["rminx"], out[3]["rmaxx"]) == (0.0, 6.0)
    assert out[10]["region"] == out[11]["region"] == 10
    # isolated box is its own singleton region
    assert out[20]["region"] == 20 and out[20]["region_n"] == 1
    assert (out[20]["rminx"], out[20]["rmaxy"]) == (50.0, 51.0)


def test_partitioning_independent(spark, boxes):
    a = sorted(map(tuple, dv.dissolve_bboxes(boxes, 2.0).collect()))
    b = sorted(map(tuple, dv.dissolve_bboxes(
        boxes.repartition(5), 2.0).collect()))
    assert a == b


def test_validation(spark, boxes):
    with pytest.raises(ValueError):
        dv.bbox_overlap_pairs(boxes, 0.0)
