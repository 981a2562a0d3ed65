"""osm_poi_cloud_spark — a PySpark-native spatial-join + tiling engine.

A from-scratch engine with the query and data-processing capabilities of
the reference pipeline ``mvexel/osm-poi-cloud`` (batch geospatial ETL:
entity extraction -> classification -> cell/tile encoding -> spatial join
-> merge -> tile pyramid -> bbox/class query API), re-expressed in
idiomatic Spark: DataFrame/SQL plans optimized by Catalyst, vectorized
Arrow/pandas UDFs only where built-ins cannot express the semantics,
explicit partitioning/skew handling for 100 TB-scale inputs.

Layout:
    functions/  pure column-expression kernels (tile math, S2 cells,
                classification, text analysis, vector math) + the
                deterministic HTML extractor
    operators/  composite relational/spatial operators (spatial join,
                quadtree planner, tiling, kNN, dedup, similarity)
    sources/    readers/writers + deterministic synthetic `pages` source
    plans/      end-to-end pipeline assembly + lineage/checkpointing
    streaming/  structured-streaming ingest variants
"""

__version__ = "0.1.0"
