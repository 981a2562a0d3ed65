#!/usr/bin/env python
"""Per-entry optimization probes (r7). NOT the driver bench — bench.py
is frozen for measurement. This harness reproduces individual bench.py
entries with the same inputs (reusing bench's cached /tmp fixtures),
forces them through the noop sink (guide §1.4), times N repetitions,
and can dump .explain("formatted") for the plan ledger in plans/r07/.

Usage:
    python bench_extra.py <entry> [<entry> ...] [--reps 3] [--explain DIR]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SF = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in SF_DIR else 0.1
PAGES_N = int(os.environ.get("SPARK_GRAFT_PAGES_N", str(int(400_000 * SF))))
PARTITIONS = int(os.environ.get("SPARK_GRAFT_PARTITIONS", str(max(4 * CPUS, 32))))


def build_probes():
    import numpy as np
    from pyspark.sql import functions as F

    from osm_poi_cloud_spark.config import get_spark
    from osm_poi_cloud_spark.operators import dedup as dd
    from osm_poi_cloud_spark.operators import knn as knn_op
    from osm_poi_cloud_spark.operators import quadtree as qt
    from osm_poi_cloud_spark.operators import similarity as sim
    from osm_poi_cloud_spark.operators import spatial_join as sj
    from osm_poi_cloud_spark.operators import tiling as tl
    from osm_poi_cloud_spark.plans import contract as C
    from osm_poi_cloud_spark.plans import pipeline as pl
    from osm_poi_cloud_spark.sources import pages as pg

    spark = get_spark("bench_extra", master=f"local[{CPUS}]",
                      shuffle_partitions=PARTITIONS)

    pages_path = f"/tmp/osm_poi_bench_pages_{PAGES_N}"
    if not os.path.exists(os.path.join(pages_path, "_SUCCESS")):
        pg.write_pages(spark, pages_path, PAGES_N, partitions=PARTITIONS)
    pages = spark.read.parquet(pages_path)

    pois_path = f"/tmp/osm_poi_bench_pois_{PAGES_N}"
    if not os.path.exists(os.path.join(pois_path, "_SUCCESS")):
        pl.build_pois(pages, lang="en", tile_zoom=12, cell_levels=(8, 12)) \
            .write.mode("overwrite").parquet(pois_path)
    pois = spark.read.parquet(pois_path).cache()
    n_pois = pois.count()

    reps = int(os.environ.get("SPARK_GRAFT_DOC_REPS", "5"))
    fat_docs_path = f"/tmp/osm_poi_bench_fatdocs_{SF}_{reps}"
    docs = spark.read.parquet(fat_docs_path).cache()
    n_docs_fat = docs.count()

    n_emb_fat = int(os.environ.get("SPARK_GRAFT_EMB_N",
                                   str(max(int(500_000 * SF), 5000))))
    fat_emb_path = f"/tmp/osm_poi_bench_fatemb_{n_emb_fat}"
    emb = spark.read.parquet(fat_emb_path).cache()
    emb.count()

    probes = {}

    def df_probe(name):
        def deco(fn):
            probes[name] = fn
            return fn
        return deco

    # ---- dedup family ----
    df_probe("containment")(lambda: dd.containment_pairs(
        docs, k=8, min_containment_ppm=600_000, max_fp_df=64))
    df_probe("span_dedup")(lambda: dd.span_dedup_stats(docs, k=8))
    df_probe("span_removal")(lambda: dd.remove_duplicated_spans(docs, k=8))
    df_probe("dedup_exact")(lambda: dd.exact_dedup(docs))
    df_probe("dedup_minhash")(lambda: dd.minhash_lsh_pairs(
        docs, num_perm=64, bands=16, jaccard_threshold=0.5))
    df_probe("paragraph_dedup")(lambda: dd.remove_duplicated_paragraphs(
        docs.select("doc_id", "text")))

    # ---- conflation ----
    from osm_poi_cloud_spark.operators.geocode import conflate_pois
    _w = lambda i: F.element_at(  # noqa: E731
        F.array(*[F.lit(f"w{k}") for k in range(512)]),
        F.pmod(F.xxhash64(F.col("doc_id"), F.lit(i)), F.lit(512)).cast("int") + 1)
    conf_names = (
        docs.select("doc_id", F.explode(F.sequence(F.lit(0), F.lit(2))).alias("m"))
        .select(
            (F.col("doc_id") * 3 + F.col("m")).alias("poi_id"),
            F.concat_ws(
                " ", F.concat(F.lit("v"), F.col("doc_id").cast("string")),
                _w(1),
                F.when(F.col("m") == 2, _w(4)).otherwise(_w(2)),
                F.when(F.col("m") == 0, _w(3)).otherwise(F.lit("")),
            ).alias("name"),
            F.pmod(F.col("doc_id"), F.lit(8192)).alias("cell"))
    )
    df_probe("poi_conflation")(lambda: conflate_pois(
        conf_names, cell_col="cell", min_jaccard_ppm=500_000))

    # ---- graph ----
    from osm_poi_cloud_spark.operators.graph import (hits as hits_op,
                                                     label_communities,
                                                     pagerank)
    pr_edges = (
        docs.select("doc_id", F.explode(F.sequence(F.lit(1), F.lit(3))).alias("j"))
        .select(F.col("doc_id").alias("src"),
                F.pmod(F.xxhash64(F.col("doc_id"), F.col("j")),
                       F.lit(n_docs_fat)).alias("dst"))
        .filter(F.col("src") != F.col("dst"))
    )
    df_probe("pagerank")(lambda: pagerank(pr_edges, iters=3))
    df_probe("link_hits")(lambda: hits_op(pr_edges, iters=3))
    df_probe("link_communities")(lambda: label_communities(pr_edges, iters=3))

    # ---- LM family ----
    from osm_poi_cloud_spark.functions import lm as lm_fn

    def run_bigram_lm():
        bc_t, uc_t, v_t = lm_fn.train_bigram_lm(docs)
        return lm_fn.score_bigram_lm(docs, bc_t, uc_t, v_t)
    probes["bigram_lm"] = run_bigram_lm

    def run_trigram_lm():
        tc_t, bc_t, uc_t, n_t = lm_fn.train_trigram_lm(docs)
        return lm_fn.score_trigram_backoff(docs, tc_t, bc_t, uc_t, n_t)
    probes["trigram_lm"] = run_trigram_lm

    # ---- DSIR ----
    from osm_poi_cloud_spark.operators import importance as imp_op
    df_probe("dsir_scores")(lambda: imp_op.importance_scores(
        docs.select("doc_id", "text"),
        docs.where("doc_id % 50 = 0").select("doc_id", "text"), dim=4096))

    # ---- embeddings / ANN ----
    qv_row = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    dim = len(qv_row)
    ann_q = emb.filter(F.col("vec_id") < 64).select(
        F.col("vec_id").alias("query_id"), "embedding")
    df_probe("ann_lsh")(lambda: sim.lsh_bucket_ann(emb, ann_q, k=10, dim=dim,
                                                   bits=8))

    def run_ivf():
        centroids, indexed = sim.ivf_index(emb, n_centroids=64, sample="hash")
        return sim.ivf_ann(indexed, centroids, ann_q, k=10, nprobe=8)
    probes["ann_ivf"] = run_ivf

    from osm_poi_cloud_spark.operators import pq as pq_op

    def run_pq():
        books = pq_op.train_pq_codebooks(emb, m=16, k=32, max_sample=400)
        return pq_op.pq_ann(pq_op.pq_encode(emb, books), books, ann_q, topk=10)
    probes["ann_pq"] = run_pq

    df_probe("semantic_dedup")(lambda: sim.semantic_dedup(
        emb, tau=0.95, n_centroids=64, sample="hash"))

    from osm_poi_cloud_spark.functions.embed import hashed_tfidf_embed
    df_probe("hashed_embedding")(lambda: hashed_tfidf_embed(
        docs.select("doc_id", "text"), dim=256))

    # ---- tiles / spatial ----
    def run_pyramid():
        tiled = tl.assign_tile_pyramid(pois, 2, 14)
        capped = tl.per_tile_cap(tiled, cap=256)
        return tl.build_tiles(capped)
    probes["tile_pyramid"] = run_pyramid

    def _tile_churn():
        h = F.pmod(F.xxhash64("poi_id"), F.lit(17))
        old = pois.select("poi_id", "lon", "lat")
        kept = old.filter(h != 0)
        moved = kept.withColumn(
            "lon", F.when(h == 1, ((F.col("lon") + 200.0) % 360.0) - 180.0)
                    .otherwise(F.col("lon")))
        inserts = old.filter(h == 2).select(
            F.concat("poi_id", F.lit("#new")).alias("poi_id"),
            (((F.col("lon") + 90.0) % 360.0) - 180.0).alias("lon"), "lat")
        return old, moved.unionByName(inserts)

    def run_incremental_tiles():
        tile_old, tile_new = _tile_churn()
        tile_base = (tl.assign_tile_pyramid(tile_old, 2, 14)
                     .groupBy("z", "x", "y").agg(F.count(F.lit(1)).alias("n"))
                     .persist())
        tile_base.count()
        out = tl.incremental_tile_counts(tile_base, tile_old, tile_new,
                                         min_zoom=2, max_zoom=14)
        return out, tile_base
    probes["incremental_tiles"] = ("setup_df", run_incremental_tiles)

    from osm_poi_cloud_spark.operators import mvt as mvt_op

    def run_mvt():
        tiled = tl.assign_tile_pyramid(pois, 2, 10)
        capped = tl.per_tile_cap(tiled, cap=256)
        return mvt_op.encode_tiles_mvt(tl.build_tiles(capped)).select(
            "z", "x", "y", "mvt")
    probes["mvt_encode"] = run_mvt

    shards, _ = qt.plan_quadtree(pois, max_zoom=8,
                                 max_nodes=max(n_pois // 64, 500))
    manifest = qt.shards_df(spark, shards)
    df_probe("spatial_join")(lambda: sj.assign_to_shards_grid(
        spark, pois, manifest, grid_zoom=8))

    q_frac = max(n_pois // 2000, 1)
    knn_queries = (
        pois.filter(F.pmod(F.xxhash64("poi_id"), F.lit(q_frac)) == 0)
        .select(F.col("poi_id").alias("query_id"), "lon", "lat")
    )
    df_probe("knn")(lambda: knn_op.knn_join(knn_queries, pois, k=10, zoom=8))

    from osm_poi_cloud_spark.operators.skyline import skyline_2d
    df_probe("skyline")(lambda: skyline_2d(pois, "lon", "lat",
                                           group_cols=("class",)))

    df_probe("polygon_intersection")(
        lambda: C._q_polygon_intersection_spark(spark, SF_DIR))
    df_probe("exif_geo")(lambda: C._q_exif_geo_tiles_spark(spark, SF_DIR))

    from osm_poi_cloud_spark.functions import tile_math as tm_mod
    from osm_poi_cloud_spark.operators.hotspot import (getis_ord_gi_star,
                                                       kde_grid,
                                                       mann_kendall_trends)
    _hx, _hy = tm_mod.tile_cols("lon", "lat", 10)
    hot_cells = (pois.select(_hx.alias("x"), _hy.alias("y"))
                 .groupBy("x", "y").agg(F.count(F.lit(1)).alias("v")))
    df_probe("hotspot_gi")(lambda: getis_ord_gi_star(hot_cells, zoom=10))
    mk_cube = spark.range(2_400_000).selectExpr(
        "id % 100000 AS cell", "id DIV 100000 AS period",
        "pmod(xxhash64(id), 7) + (id % 100000 % 5 - 2) * (id DIV 100000) AS v")
    df_probe("emerging_hotspots")(lambda: mann_kendall_trends(
        mk_cube, cell_cols=("cell",)))
    df_probe("kde_heatmap")(lambda: kde_grid(hot_cells, zoom=10, radius=3))

    from osm_poi_cloud_spark.operators.hull import convex_hulls
    _hpts = pois.select(
        ((_hx.cast("long") * F.lit(1024)) + _hy.cast("long")).alias("g"),
        F.col("lon").alias("x"), F.col("lat").alias("y"))
    df_probe("convex_hulls")(lambda: convex_hulls(_hpts, group_col="g",
                                                  n_partials=4))

    from osm_poi_cloud_spark.functions import geometry as geo
    n_lines = max(n_pois, 10_000)
    lines_b = spark.range(n_lines).repartition(PARTITIONS).selectExpr(
        "id AS line_id",
        "transform(sequence(0, 63), i -> array(CAST(i * 4 AS DOUBLE), "
        "CAST((id * 7 + i * i * 13) % 97 - 48 AS DOUBLE))) AS line")
    df_probe("simplify_pyramid")(lambda: geo.simplify_pyramid(
        lines_b, base_tol=2.0, min_zoom=2, max_zoom=14)
        .select("line_id", "z", F.size("simp").alias("n_kept")))

    # ---- retrieval / text ----
    from osm_poi_cloud_spark.functions.text_analysis import (ngram_counts,
                                                             pmi_topk)
    from osm_poi_cloud_spark.operators.retrieval import (bm25_topk,
                                                         phrase_occurrences)
    df_probe("bm25_topk")(lambda: bm25_topk(
        docs, ["spark", "merge", "window", "vector"], k=1000))
    df_probe("pmi_topk")(lambda: pmi_topk(docs, k=1000, min_count=5))
    df_probe("phrase_scan")(lambda: phrase_occurrences(
        docs, "the quick brown fox"))
    df_probe("ngram_counts")(lambda: ngram_counts(docs, n=3))

    from osm_poi_cloud_spark.plans.curation import curate_documents
    df_probe("corpus_curation")(lambda: curate_documents(
        docs.select("doc_id", "text")))

    from osm_poi_cloud_spark.functions.robots import filter_allowed_urls
    rb_rules = spark.createDataFrame(
        [(f"h{i}.example", "/p/", i % 3 == 0, 3) for i in range(16)],
        "host string, prefix string, allow boolean, rule_len int")
    rb_urls = docs.selectExpr(
        "doc_id",
        "concat('https://h', CAST(doc_id % 16 AS STRING), '.example/p/', "
        "CAST(doc_id AS STRING)) AS url")
    df_probe("robots_filter")(lambda: filter_allowed_urls(
        rb_urls, rb_rules, keep_decision=True))

    from osm_poi_cloud_spark.operators.knn import radius_join
    rq = pois.select(F.col("poi_id").alias("query_id"), "lon", "lat")
    df_probe("radius_join")(lambda: radius_join(rq, pois, 0.25))

    df_probe("pipeline_extract_noop")(lambda: pl.build_pois(
        pages, lang="en", tile_zoom=12, cell_levels=(8, 12)))

    return spark, probes


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("entries", nargs="+")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--explain", default=None,
                    help="directory to write <entry>.txt explain dumps")
    ap.add_argument("--suffix", default="",
                    help="suffix for explain filenames, e.g. _before")
    args = ap.parse_args()

    spark, probes = build_probes()
    results = {}
    for name in args.entries:
        fn = probes[name]
        setup_style = isinstance(fn, tuple)

        def build():
            if setup_style:
                return fn[1]()
            return fn(), None

        if args.explain:
            df, extra = build()
            os.makedirs(args.explain, exist_ok=True)
            p = os.path.join(args.explain, f"{name}{args.suffix}.txt")
            with open(p, "w") as fh:
                fh.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
            print(f"wrote {p}")
            if extra is not None:
                extra.unpersist()

        times = []
        for i in range(args.reps):
            spark.sparkContext.setJobDescription(f"{name} rep{i}")
            # time build + force together: iterative operators run jobs
            # (checkpoints, sizing counts) inside the build call, same
            # timing contract as bench.py's timed(force(fn()))
            t0 = time.time()
            df, extra = build()
            df.write.format("noop").mode("overwrite").save()
            times.append(round(time.time() - t0, 3))
            if extra is not None:
                extra.unpersist()
            spark.sparkContext.setJobDescription(None)
        results[name] = times
        print(f"{name}: {times}  min={min(times)}")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
