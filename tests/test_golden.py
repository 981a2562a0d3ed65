"""Golden-fixture regression: the full pipeline output over a pinned
slice of the deterministic corpus must match the committed parquet
byte-for-byte in values (SURVEY §5 fixture strategy; BASELINE.json
"same join output rows, same tile IDs per feature").

If this fails after an *intentional* extractor/classifier/cell change,
bump EXTRACTOR_VERSION and regenerate the fixture — never weaken the
comparison.
"""

import os

import pandas as pd

from osm_poi_cloud_spark.plans import pipeline as pl
from osm_poi_cloud_spark.sources import pages as pg

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "pois_300pages.parquet")


def test_pipeline_matches_golden_fixture(spark):
    got = (
        pl.build_pois(pg.pages_df(spark, 300, partitions=5), cell_levels=(8, 12))
        .toPandas()
        .sort_values("poi_id")
        .reset_index(drop=True)
    )
    exp = pd.read_parquet(GOLDEN)
    assert list(got.columns) == list(exp.columns)
    assert len(got) == len(exp) == 292
    # exact on every column: ids, names, tags, classes, coordinates,
    # cell ids (l8+l12), tile keys, shard ids, buckets
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
