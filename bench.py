#!/usr/bin/env python
"""Benchmark harness (driver contract).

Runs the engine's headline workloads at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": <total sec>, "unit": "sec",
"queries": {name: sec}, "sf": ..., plus throughput extras}.

Headline sections (BASELINE.json metric):
* pipeline_extract  — pages -> extract -> classify -> S2/tile encode
                      (docs/sec), forced with a noop sink
* spatial_join      — POIs x quadtree-shard broadcast join (rows/sec)
* pip_refine        — irregular-polygon join with ray-cast refine
* tile_pyramid      — z2-14 assignment + per-tile cap + tile agg
* knn               — 2k query points, k=10, tile-neighborhood kNN
* dedup_exact / dedup_minhash — documents table
* cosine_topk / ann_lsh       — embeddings table
* sql_*            — representative shared-SQL contract queries

Setup (untimed): synthetic pages parquet generated deterministically
into /tmp (cached across runs by row count).
"""

from __future__ import annotations

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


def main() -> None:
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

    spark = get_spark("bench", master=f"local[{CPUS}]", shuffle_partitions=PARTITIONS)

    # ---- setup (untimed) ----
    pages_path = f"/tmp/osm_poi_bench_pages_{PAGES_N}"
    if not os.path.exists(os.path.join(pages_path, "_SUCCESS")):
        pg.write_pages(spark, pages_path, PAGES_N, partitions=PARTITIONS)
    pages = spark.read.parquet(pages_path)

    # warmup (untimed): one full pipeline pass — spins up python UDF
    # workers on every partition, compiles codegen'd stages, initializes
    # Arrow, and warms the OS page cache. Timed sections then measure
    # steady-state throughput, the regime that matters at 100 TB.
    pl.build_pois(pages).write.format("noop").mode("overwrite").save()
    spark.sql("SELECT count(DISTINCT id % 7) FROM range(1000000)").collect()

    timings: dict[str, float] = {}
    extras: dict[str, float] = {}

    def timed(name: str, fn):
        t0 = time.time()
        out = fn()
        timings[name] = round(time.time() - t0, 3)
        return out

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    # ---- 1. extraction pipeline (docs/sec) ----
    pois_path = f"/tmp/osm_poi_bench_pois_{PAGES_N}"
    def run_pipeline():
        pois = pl.build_pois(pages, lang="en", tile_zoom=12, cell_levels=(8, 12))
        pois.write.mode("overwrite").parquet(pois_path)
    timed("pipeline_extract", run_pipeline)
    extras["docs_per_sec"] = round(PAGES_N / timings["pipeline_extract"], 1)

    pois = spark.read.parquet(pois_path).cache()
    n_pois = pois.count()
    extras["n_pois"] = n_pois

    # ---- 2a. quadtree count pass + subdivision (the sharder stage) ----
    shards_holder = {}
    def run_quadtree_plan():
        shards, oversized = qt.plan_quadtree(pois, max_zoom=8, max_nodes=max(n_pois // 64, 500))
        shards_holder["shards"] = shards
        return len(shards)
    n_shards = timed("quadtree_plan", run_quadtree_plan)
    extras["n_shards"] = n_shards

    # ---- 2b. shard assignment join (joined rows/sec): cover-grid broadcast ----
    manifest = qt.shards_df(spark, shards_holder["shards"])
    timed("spatial_join", lambda: force(sj.assign_to_shards_grid(spark, pois, manifest, grid_zoom=8)))
    extras["joined_rows_per_sec"] = round(n_pois / timings["spatial_join"], 1)

    # ---- 3. irregular-polygon PIP refine ----
    rng = np.random.RandomState(42)
    polys = []
    for i in range(20):
        cx, cy = rng.uniform(-150, 150), rng.uniform(-60, 60)
        ang = np.sort(rng.uniform(0, 2 * np.pi, 7))
        r = rng.uniform(2, 8, 7)
        ring = np.stack([cx + r * np.cos(ang), cy + r * np.sin(ang)], axis=1)
        polys.append(sj.Polygon(f"poly{i}", ring))
    timed("pip_refine", lambda: force(sj.point_in_polygon_join(spark, pois, polys, cover_zoom=6)))
    polys_tbl = sj.polygons_df(spark, polys)
    timed("pip_distributed", lambda: force(
        sj.point_in_polygon_join_distributed(spark, pois, polys_tbl, cover_zoom=6)))

    # ---- 4. tile pyramid z2-14 with density cap ----
    def run_pyramid():
        tiled = tl.assign_tile_pyramid(pois, 2, 14)
        capped = tl.per_tile_cap(tiled, cap=256)
        force(tl.build_tiles(capped))
    timed("tile_pyramid", run_pyramid)

    # ---- 4a2. incremental tile refresh: base counts held materialized
    # (production keeps the tile table), timed region = diff -> deltas ->
    # merge for ~12% churn (deletes/moves/inserts via id-hash congruences)
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
    tile_old, tile_new = _tile_churn()
    tile_base = (tl.assign_tile_pyramid(tile_old, 2, 14)
                 .groupBy("z", "x", "y").agg(F.count(F.lit(1)).alias("n"))
                 .persist())
    tile_base.count()  # untimed: the stored tile table
    timed("incremental_tiles", lambda: force(tl.incremental_tile_counts(
        tile_base, tile_old, tile_new, min_zoom=2, max_zoom=14)))
    tile_base.unpersist()

    # ---- 4b. binary MVT tile encode (z2-10) ----
    from osm_poi_cloud_spark.operators import mvt as mvt_op
    def run_mvt():
        tiled = tl.assign_tile_pyramid(pois, 2, 10)
        capped = tl.per_tile_cap(tiled, cap=256)
        force(mvt_op.encode_tiles_mvt(tl.build_tiles(capped)).select("z", "x", "y", "mvt"))
    timed("mvt_encode", run_mvt)

    # ---- 5. kNN ---- (hash-sampled queries: limit() would funnel through
    # one partition; sampling keeps query generation distributed)
    q_frac = max(n_pois // 2000, 1)
    queries = (
        pois.filter(F.pmod(F.xxhash64("poi_id"), F.lit(q_frac)) == 0)
        .select(F.col("poi_id").alias("query_id"), "lon", "lat")
    )
    timed("knn", lambda: force(knn_op.knn_join(queries, pois, k=10, zoom=8)))
    # per-class Pareto frontier over the POI cloud (range exchange +
    # broadcast prefix minima; no n^2 anywhere)
    from osm_poi_cloud_spark.operators.skyline import skyline_2d
    timed("skyline", lambda: force(skyline_2d(
        pois, "lon", "lat", group_cols=("class",))))

    # ---- 6. dedup over documents ----
    # The testdata docs/embeddings tables are tiny (5000 / 2000 rows at
    # sf0.1) — at 32-way parallelism those timings were Python-worker
    # fixed cost, not operator signal (r3 bench note). The dedup/ANN
    # sections therefore run over FAT bench corpora generated
    # deterministically into /tmp (untimed, cached): documents are the
    # sf docs replicated DOC_REPS x with per-replica junk tails (unique
    # ids, high-but-not-identical shingle overlap — a real near-dup
    # workload), embeddings are seeded gaussian vectors at testdata's
    # dim. Row counts land in the JSON extras.
    reps = int(os.environ.get("SPARK_GRAFT_DOC_REPS", "5"))
    fat_docs_path = f"/tmp/osm_poi_bench_fatdocs_{SF}_{reps}"
    if not os.path.exists(os.path.join(fat_docs_path, "_SUCCESS")):
        base_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        fat = (
            base_docs.crossJoin(spark.range(reps).select(F.col("id").alias("rep")))
            .select(
                (F.col("doc_id") * reps + F.col("rep")).alias("doc_id"),
                F.when(F.col("rep") == 0, F.col("text")).otherwise(
                    F.concat_ws(" ", F.col("text"),
                                F.concat_ws(" ", F.transform(
                                    F.sequence(F.lit(1), F.lit(12)),
                                    lambda i: F.substring(F.md5(F.concat_ws(
                                        "-", F.col("doc_id"), F.col("rep"),
                                        i.cast("string"))), 1, 8))))
                ).alias("text"),
                "lang", "source",
            )
            .withColumn("n_chars", F.length("text"))
        )
        fat.repartition(PARTITIONS).write.mode("overwrite").parquet(fat_docs_path)
    docs = spark.read.parquet(fat_docs_path).cache()
    extras["fat_docs_n"] = docs.count()  # materialize cache untimed
    timed("dedup_exact", lambda: force(dd.exact_dedup(docs)))
    timed("dedup_minhash", lambda: force(
        dd.minhash_lsh_pairs(docs, num_perm=64, bands=16, jaccard_threshold=0.5)))
    timed("span_dedup", lambda: force(dd.span_dedup_stats(docs, k=8)))
    timed("span_removal", lambda: force(dd.remove_duplicated_spans(docs, k=8)))
    # asymmetric quote-inclusion pairs (fat corpus: every replica group
    # shares its whole window set -> real pair volume); hot-shingle cap on
    timed("containment", lambda: force(dd.containment_pairs(
        docs, k=8, min_containment_ppm=600_000, max_fp_df=64)))
    # paragraph-granularity keep-first dedup (fat docs are single-paragraph,
    # so the 5x replica groups are the duplicated-paragraph population)
    timed("paragraph_dedup", lambda: force(
        dd.remove_duplicated_paragraphs(docs.select("doc_id", "text"))))
    # Gopher line-shape rules (map-only HOF pass)
    from osm_poi_cloud_spark.functions.text_analysis import line_shape_features
    timed("line_shape", lambda: force(line_shape_features(docs)))
    # sliding-window chunking (map-only: split + slice windows, no shuffle)
    from osm_poi_cloud_spark.operators.packing import chunk_documents
    timed("doc_chunks", lambda: force(chunk_documents(docs, max_tokens=64, overlap=16)))
    # corpus trigram counts (explode + one count shuffle, map-side combine)
    from osm_poi_cloud_spark.functions.text_analysis import ngram_counts
    timed("ngram_counts", lambda: force(ngram_counts(docs, n=3)))

    # skew-salted join: 70% of POIs behind one hot key, 32-way salted
    from osm_poi_cloud_spark.operators import skew as sk_skew
    # poi_id is the extractor's string key (url#idx) — derive the hot
    # key by hash, 70% of rows behind key 0
    sk_facts = pois.select(
        "poi_id",
        F.when(F.pmod(F.xxhash64("poi_id"), F.lit(10)) < 7, F.lit(0))
        .otherwise(F.pmod(F.xxhash64(F.lit(1), F.col("poi_id")), F.lit(1000)))
        .cast("long").alias("hot_k"))
    sk_dims = spark.range(1000).selectExpr(
        "id AS hot_k", "concat('d', CAST(id AS STRING)) AS label")
    timed("salted_join", lambda: force(sk_skew.salted_join(
        sk_facts, sk_dims, "hot_k", [0], "poi_id", n_salts=32)))

    # ---- 6b. link-graph pagerank (3 checkpointed power iterations over a
    # deterministic 3-out-degree graph on the fat doc ids). Like
    # connected components, per-round checkpoint latency dominates at
    # this corpus size (75k edges spread over 128 shuffle partitions is
    # scheduling overhead, not compute) — the entry tracks round cost,
    # which is what amortizes at 100 TB. ----
    from osm_poi_cloud_spark.operators.graph import pagerank
    n_docs_fat = extras["fat_docs_n"]
    pr_edges = (
        docs.select("doc_id", F.explode(F.sequence(F.lit(1), F.lit(3))).alias("j"))
        .select(F.col("doc_id").alias("src"),
                F.pmod(F.xxhash64(F.col("doc_id"), F.col("j")), F.lit(n_docs_fat)).alias("dst"))
        .filter(F.col("src") != F.col("dst"))
    )
    timed("pagerank", lambda: force(pagerank(pr_edges, iters=3)))
    from osm_poi_cloud_spark.operators.graph import hits as hits_op
    timed("link_hits", lambda: force(hits_op(pr_edges, iters=3)))
    from osm_poi_cloud_spark.operators.graph import label_communities
    timed("link_communities", lambda: force(
        label_communities(pr_edges, iters=3)))

    # ---- 6c. POI conflation: 3 name-variant mentions per entity over
    # the fat doc ids (75k mentions / 25k entities at sf0.1), cell
    # co-blocked token self-join -> jaccard edges -> star CC closure ----
    from osm_poi_cloud_spark.operators.geocode import conflate_pois
    _w = lambda i: F.element_at(  # noqa: E731 — pool word by arithmetic
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
    timed("poi_conflation", lambda: force(conflate_pois(
        conf_names, cell_col="cell", min_jaccard_ppm=500_000)))

    # incremental dedup: odd-id batch probes the even-id signature index
    # (index build untimed — it amortizes across batches in production)
    inc_index = dd.minhash_banded_signatures(
        docs.filter(F.col("doc_id") % 2 == 0), num_perm=64, bands=16).cache()
    inc_index.count()
    timed("incremental_dedup", lambda: force(dd.incremental_minhash_matches(
        docs.filter(F.col("doc_id") % 2 == 1), inc_index,
        num_perm=64, bands=16, jaccard_threshold=0.5)))
    inc_index.unpersist()

    # ---- 7. similarity over embeddings ----
    n_emb_fat = int(os.environ.get("SPARK_GRAFT_EMB_N", str(max(int(500_000 * SF), 5000))))
    fat_emb_path = f"/tmp/osm_poi_bench_fatemb_{n_emb_fat}"
    if not os.path.exists(os.path.join(fat_emb_path, "_SUCCESS")):
        dim0 = len(spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
                   .select("embedding").first()[0])
        import pandas as _pd
        rng_e = np.random.RandomState(7)
        vecs = rng_e.randn(n_emb_fat, dim0).astype(np.float32)
        pdf = _pd.DataFrame({
            "vec_id": np.arange(n_emb_fat, dtype=np.int64),
            "embedding": list(vecs),
            "label": (np.arange(n_emb_fat) % 10).astype(np.int32),
        })
        spark.createDataFrame(pdf).repartition(PARTITIONS) \
            .write.mode("overwrite").parquet(fat_emb_path)
    emb = spark.read.parquet(fat_emb_path).cache()
    extras["fat_emb_n"] = emb.count()  # materialize the cache untimed
    qv = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    dim = len(qv)
    timed("cosine_topk", lambda: sim.cosine_topk(emb, list(qv), 50).collect())
    ann_q = emb.filter(F.col("vec_id") < 64).select(F.col("vec_id").alias("query_id"), "embedding")
    timed("ann_lsh", lambda: force(sim.lsh_bucket_ann(emb, ann_q, k=10, dim=dim, bits=8)))
    def run_ivf():
        centroids, indexed = sim.ivf_index(emb, n_centroids=64, sample="hash")
        force(sim.ivf_ann(indexed, centroids, ann_q, k=10, nprobe=8))
    timed("ann_ivf", run_ivf)

    from osm_poi_cloud_spark.operators import pq as pq_op
    def run_pq():
        books = pq_op.train_pq_codebooks(emb, m=16, k=32, max_sample=400)
        force(pq_op.pq_ann(pq_op.pq_encode(emb, books), books, ann_q, topk=10))
    timed("ann_pq", run_pq)
    # SemDeDup over the fat gaussians: measures the cluster shuffle +
    # per-cluster greedy (no dups exist — the cost profile is the point)
    timed("semantic_dedup", lambda: force(
        sim.semantic_dedup(emb, tau=0.95, n_centroids=64, sample="hash")))
    # hashing-trick embeddings over the fat doc corpus (explode + one
    # count shuffle + native dense assembly)
    from osm_poi_cloud_spark.functions.embed import hashed_tfidf_embed
    timed("hashed_embedding", lambda: force(
        hashed_tfidf_embed(docs.select("doc_id", "text"), dim=256)))

    # ---- 7b. text/URL/geometry ops over the testdata tables ----
    from osm_poi_cloud_spark.functions.url import dedup_by_canonical_url
    from osm_poi_cloud_spark.functions import geometry as geo

    urls = docs.selectExpr("doc_id", f"{C._URL_CASE_SPARK} AS url", "text")
    timed("url_dedup", lambda: force(dedup_by_canonical_url(urls)))

    from osm_poi_cloud_spark.plans.curation import curate_documents
    timed("corpus_curation", lambda: force(curate_documents(docs.select("doc_id", "text"))))

    from osm_poi_cloud_spark.operators import bloom as bl
    n_docs = docs.count()  # untimed sizing probe
    timed("bloom_filter", lambda: force(bl.bloom_filter_new_keys(
        urls.select("doc_id", "url"), urls.filter(F.col("doc_id") % 2 == 0).select("url"),
        "url", fpp=0.001, expected_keys=max(n_docs // 2, 1))))

    # ---- 7c. learned quality filter (native scoring) + mixture plan ----
    from osm_poi_cloud_spark.operators import classifier as qc
    from osm_poi_cloud_spark.operators import mixture as mx
    timed("quality_classifier", lambda: force(
        qc.score_quality_lr(qc.featurize(docs.select("doc_id", "text")),
                            qc.DEFAULT_QUALITY_WEIGHTS, qc.DEFAULT_QUALITY_BIAS)))
    toks = docs.selectExpr(
        "doc_id", "source",
        "greatest(length(text) - length(replace(text, ' ', '')) + 1, 1) AS n_tokens")
    def run_mixture():
        weights = {f"src{i}": float(1 + i % 4) for i in range(20)}
        rates = mx.plan_mixture(toks, weights, 10**6)
        force(mx.mixture_report(mx.apply_mixture(toks, rates)))
    timed("mixture_sample", run_mixture)

    # ---- 7c2. bigram LM + robots + KMV over the fat corpus ----
    from osm_poi_cloud_spark.functions import lm as lm_fn
    from osm_poi_cloud_spark.functions.robots import filter_allowed_urls
    from osm_poi_cloud_spark.operators import sketch as sk_op
    def run_bigram_lm():
        bc_t, uc_t, v_t = lm_fn.train_bigram_lm(docs)
        force(lm_fn.score_bigram_lm(docs, bc_t, uc_t, v_t))
    timed("bigram_lm", run_bigram_lm)
    def run_trigram_lm():
        tc_t, bc_t, uc_t, n_t = lm_fn.train_trigram_lm(docs)
        force(lm_fn.score_trigram_backoff(docs, tc_t, bc_t, uc_t, n_t))
    timed("trigram_lm", run_trigram_lm)
    rb_rules = spark.createDataFrame(
        [(f"h{i}.example", "/p/", i % 3 == 0, 3) for i in range(16)],
        "host string, prefix string, allow boolean, rule_len int")
    rb_urls = docs.selectExpr(
        "doc_id",
        "concat('https://h', CAST(doc_id % 16 AS STRING), '.example/p/', "
        "CAST(doc_id AS STRING)) AS url")
    timed("robots_filter", lambda: force(
        filter_allowed_urls(rb_urls, rb_rules, keep_decision=True)))
    timed("kmv_sketch", lambda: force(sk_op.kmv_build(
        docs.selectExpr("doc_id", "n_chars"), "doc_id",
        value_col="n_chars", k=4096)))

    # ---- 7c3. image-text pair construction (img-tag extract + catalog
    # join + bounded text agg; the refs side is the fat corpus) ----
    from osm_poi_cloud_spark.functions import links as links_fn
    from osm_poi_cloud_spark.operators.multimodal import image_text_pairs
    it_pages = docs.selectExpr(
        "concat('https://s', CAST(doc_id % 100 AS STRING), '.example/p/', "
        "CAST(doc_id AS STRING)) AS url",
        "concat('<html><body><img src=\"https://img.example/m', "
        "CAST(doc_id % 4096 AS STRING), '.png\" alt=\"cap-', "
        "CAST(doc_id % 97 AS STRING), '\">', "
        "'<img class=\"b\" src=\"/l/', CAST(doc_id % 7 AS STRING), "
        "'.png\" alt=\"local\">', text, '</body></html>') AS html")
    it_index = spark.range(4096).selectExpr(
        "concat('https://img.example/m', CAST(id AS STRING), '.png') AS url",
        "concat('m', CAST(id AS STRING)) AS media_id")
    # EXIF GPS: build 20k tagged JPEGs (writer kernel) + parse + tile
    timed("exif_geo", lambda: force(C._q_exif_geo_tiles_spark(spark, SF_DIR)))
    timed("image_text_pairs", lambda: force(
        image_text_pairs(links_fn.extract_image_refs(it_pages), it_index)))

    # ---- 7d. radius join over the POI table ----
    from osm_poi_cloud_spark.operators.knn import radius_join
    rq = pois.select(F.col("poi_id").alias("query_id"), "lon", "lat")
    timed("radius_join", lambda: force(radius_join(rq, pois, 0.25)))

    rings = pois.select(
        "poi_id",
        F.array(
            F.array(F.col("lon"), F.col("lat")),
            F.array(F.col("lon") + 0.1, F.col("lat")),
            F.array(F.col("lon") + 0.1, F.col("lat") + 0.1),
            F.array(F.col("lon"), F.col("lat") + 0.1),
        ).alias("ring"),
    )
    timed("centroid_collapse", lambda: force(geo.collapse_polygons_to_points(rings)))

    # ---- 7d2. per-zoom DP simplification pyramid (one UDF pass for
    # z2-14; selection native). 64-vertex lattice polylines, one per
    # POI-scale feature ----
    n_lines = max(n_pois, 10_000)
    lines_b = spark.range(n_lines).repartition(PARTITIONS).selectExpr(
        "id AS line_id",
        "transform(sequence(0, 63), i -> array(CAST(i * 4 AS DOUBLE), "
        "CAST((id * 7 + i * i * 13) % 97 - 48 AS DOUBLE))) AS line")
    timed("simplify_pyramid", lambda: force(
        geo.simplify_pyramid(lines_b, base_tol=2.0, min_zoom=2, max_zoom=14)
        .select("line_id", "z", F.size("simp").alias("n_kept"))))

    # ---- 7d3. DSIR importance scoring over the fat corpus (target =
    # deterministic 2% slice) ----
    from osm_poi_cloud_spark.operators import importance as imp_op
    timed("dsir_scores", lambda: force(imp_op.importance_scores(
        docs.select("doc_id", "text"),
        docs.where("doc_id % 50 = 0").select("doc_id", "text"), dim=4096)))

    # ---- 7d4. retrieval + collocations over the fat corpus; HLL tile
    # pyramid over the POI table ----
    from osm_poi_cloud_spark.functions.text_analysis import pmi_topk
    from osm_poi_cloud_spark.operators.retrieval import bm25_topk
    from osm_poi_cloud_spark.operators.tiling import hll_tile_pyramid
    timed("bm25_topk", lambda: force(bm25_topk(
        docs, ["spark", "merge", "window", "vector"], k=1000)))
    timed("pmi_topk", lambda: force(pmi_topk(docs, k=1000, min_count=5)))
    # exact-phrase tagging scan (map-only; cost is tokenize+slide, not hits)
    from osm_poi_cloud_spark.operators.retrieval import phrase_occurrences
    timed("phrase_scan", lambda: force(phrase_occurrences(
        docs, "the quick brown fox")))
    timed("hll_pyramid", lambda: force(hll_tile_pyramid(
        pois.withColumn("visitor", F.pmod(F.xxhash64("poi_id"), F.lit(5000))
            .cast("string")),
        "visitor", min_zoom=2, max_zoom=10, p=10)))
    from osm_poi_cloud_spark.functions import tile_math as tm_mod
    from osm_poi_cloud_spark.operators.hotspot import getis_ord_gi_star
    _hx, _hy = tm_mod.tile_cols("lon", "lat", 10)
    hot_cells = (pois.select(_hx.alias("x"), _hy.alias("y"))
                 .groupBy("x", "y").agg(F.count(F.lit(1)).alias("v")))
    timed("hotspot_gi", lambda: force(getis_ord_gi_star(hot_cells, zoom=10)))
    # space-time cube trends: 100k cells x 24 periods, planted slopes
    from osm_poi_cloud_spark.operators.hotspot import mann_kendall_trends
    mk_cube = spark.range(2_400_000).selectExpr(
        "id % 100000 AS cell", "id DIV 100000 AS period",
        "pmod(xxhash64(id), 7) + (id % 100000 % 5 - 2) * (id DIV 100000) AS v")
    timed("emerging_hotspots", lambda: force(
        mann_kendall_trends(mk_cube, cell_cols=("cell",))))
    from osm_poi_cloud_spark.operators.hotspot import kde_grid
    timed("kde_heatmap", lambda: force(kde_grid(hot_cells, zoom=10, radius=3)))
    from osm_poi_cloud_spark.operators.tiling import render_heatmap_tiles
    timed("heatmap_tiles", lambda: force(render_heatmap_tiles(
        kde_grid(hot_cells, zoom=10, radius=3), zoom=2,
        vmax_ppm=5_000_000)))
    from osm_poi_cloud_spark.operators.hull import convex_hulls
    _hpts = pois.select(
        ((_hx.cast("long") * F.lit(1024)) + _hy.cast("long")).alias("g"),
        F.col("lon").alias("x"), F.col("lat").alias("y"))
    timed("convex_hulls", lambda: force(
        convex_hulls(_hpts, group_col="g", n_partials=4)))

    # ---- 7e. temporal + polygon joins (contract-shaped inputs) ----
    timed("asof_join", lambda: force(C._q_asof_join_spark(spark, SF_DIR)))
    from osm_poi_cloud_spark.operators.sampling import snapshot_history
    _snaps = spark.read.parquet(f"{SF_DIR}/orders.parquet").selectExpr(
        "o_orderkey % 30000 AS e", "o_orderkey AS v", "o_orderstatus AS s")
    timed("snapshot_history", lambda: force(
        snapshot_history(_snaps, "e", "v", ["s"])))
    timed("boilerplate_removal", lambda: force(
        C._q_boilerplate_removal_spark(spark, SF_DIR)))
    timed("interval_join", lambda: force(C._q_interval_join_spark(spark, SF_DIR)))
    timed("polygon_intersection", lambda: force(
        C._q_polygon_intersection_spark(spark, SF_DIR)))
    from osm_poi_cloud_spark.operators.temporal import time_rollup
    timed("time_rollup", lambda: force(
        time_rollup(spark.read.parquet(f"{SF_DIR}/events.parquet"))))

    # ---- 8. representative SQL contract queries ----
    C._register(spark, SF_DIR)
    shared = C._shared_sql_queries()
    for qname in ("bbox_filter", "classify_histogram", "tile_rollup", "knn_per_cell",
                  "pip_bbox_join", "percentiles_by_type"):
        timed(f"sql_{qname}", lambda q=shared[qname]: spark.sql(q).collect())
    timed("sessionization", lambda: force(C._q_sessionization_spark(spark, SF_DIR)))

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "poi_engine_headline_suite_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": SF,
        **{k: v for k, v in extras.items()},
        "pages_n": PAGES_N,
        "cpus": CPUS,
    }))


if __name__ == "__main__":
    main()
