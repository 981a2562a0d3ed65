"""Bounding-box dissolve: merge overlapping boxes into regions.

The tiling/cartography "dissolve" step (merging touching building
footprints, coverage extents, label boxes) expressed as connected
components over an overlap graph:

1. **Candidate pairs by grid blocking** — each box explodes to the
   grid cells it covers; two boxes can only overlap if they share a
   covered cell (the intersection region lies inside some common
   cell), so a hash join on the cell key finds every candidate with
   zero false negatives AT ANY CELL SIZE. Cell size only tunes the
   explode factor vs join selectivity: pick it near the typical box
   extent (~4 cells per box). The exact closed-box intersection test
   (`a.minx <= b.maxx AND b.minx <= a.maxx`, same in y — touching
   edges merge) runs inside the join; duplicate discoveries from
   shared cells collapse with one distinct.
2. **Components** — ``dedup.connected_components`` (large-star/
   small-star, O(log n) rounds, checkpointed) labels each box with the
   min box id of its overlap component. Isolated boxes never enter the
   edge list; a left join restores them as singleton regions.
3. **Region extents** — one groupBy over the labels: box count and
   the merged envelope (min/max of exact input floats — comparisons
   only, engine-independent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import connected_components


def bbox_overlap_pairs(boxes: DataFrame, cell: float,
                       id_col: str = "box_id") -> DataFrame:
    """Distinct overlapping pairs ``(a, b)`` with ``a < b`` via grid
    blocking. Expects columns ``minx miny maxx maxy``."""
    if not cell > 0:
        raise ValueError(f"need cell > 0, got {cell}")
    cells = (
        boxes.select(
            F.col(id_col).alias("_id"), "minx", "miny", "maxx", "maxy")
        .withColumn("_cx", F.explode(F.sequence(
            F.floor(F.col("minx") / F.lit(cell)),
            F.floor(F.col("maxx") / F.lit(cell)))))
        .withColumn("_cy", F.explode(F.sequence(
            F.floor(F.col("miny") / F.lit(cell)),
            F.floor(F.col("maxy") / F.lit(cell)))))
    )
    a, b = cells.alias("L"), cells.alias("R")
    return (
        a.join(b, ["_cx", "_cy"])
        .filter(F.col("L._id") < F.col("R._id"))
        .filter((F.col("L.minx") <= F.col("R.maxx"))
                & (F.col("R.minx") <= F.col("L.maxx"))
                & (F.col("L.miny") <= F.col("R.maxy"))
                & (F.col("R.miny") <= F.col("L.maxy")))
        .select(F.col("L._id").alias("a"), F.col("R._id").alias("b"))
        .distinct()
    )


def dissolve_bboxes(boxes: DataFrame, cell: float,
                    id_col: str = "box_id", **cc_kwargs) -> DataFrame:
    """Label every box with its overlap-component region (min box id)
    and attach the merged region stats: ``(box_id, region, region_n,
    rminx, rminy, rmaxx, rmaxy)``."""
    edges = bbox_overlap_pairs(boxes, cell, id_col)
    comp = connected_components(edges, "a", "b", **cc_kwargs)
    labeled = (
        boxes.join(comp.withColumnRenamed("node", id_col), id_col, "left")
        .withColumn("region", F.coalesce(F.col("component"), F.col(id_col)))
        .drop("component")
    )
    regions = labeled.groupBy("region").agg(
        F.count(F.lit(1)).alias("region_n"),
        F.min("minx").alias("rminx"), F.min("miny").alias("rminy"),
        F.max("maxx").alias("rmaxx"), F.max("maxy").alias("rmaxy"))
    return labeled.select(id_col, "region").join(regions, "region")
