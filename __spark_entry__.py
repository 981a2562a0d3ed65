"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship plan on /root/testdata/sf0.001: derive POI
points + tags from the testdata tables, run the engine's classify ->
tile/cell encode -> per-class/per-tile aggregation.

``queries()`` / ``oracle_sql()`` — operator inventory from SURVEY.md §2
(see osm_poi_cloud_spark/plans/contract.py). Every query carries an
oracle: shared-SQL queries execute the *same text* in Spark and DuckDB,
dialect-split queries pair independent formulations, and engine-native
ops (S2, minhash/simhash/LSH, IVF, MVT bytes, components, fingerprints)
read golden fixtures that tools/make_goldens.py verifies against
second, independent pure-Python implementations before writing.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from osm_poi_cloud_spark.plans import contract as C  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    sf_dir = "/root/testdata/sf0.001"
    C._register(spark, sf_dir)
    from osm_poi_cloud_spark.functions import tile_math as tm
    from osm_poi_cloud_spark.functions.cell_udfs import with_s2_cells

    pts = spark.sql(
        f"WITH pts AS ({C.PTS_SQL}), tagged AS ({C.TAGGED_SQL}) "
        f"SELECT poi_id, lon, lat, {C._CLASS_CASE} AS class "
        "FROM pts JOIN tagged ON poi_id = p_partkey "
        "WHERE lon IS NOT NULL"
    ).filter(F.col("class").isNotNull())
    x, y = tm.tile_cols("lon", "lat", 12)
    pois = with_s2_cells(pts.withColumn("tile_x", x).withColumn("tile_y", y), "lat", "lon", (12,))
    return (
        pois.groupBy("class")
        .agg(
            F.count(F.lit(1)).alias("n_pois"),
            F.countDistinct("cell_l12").alias("n_cells"),
            F.countDistinct("tile_x", "tile_y").alias("n_tiles"),
        )
        .orderBy(F.desc("n_pois"), F.asc("class"))
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return C.build_queries()


def oracle_sql() -> dict[str, str]:
    return C.build_oracles()
