"""Replicates the driver's correctness gate: every queries() entry runs
on Spark, its oracle_sql() runs on DuckDB over the same parquet, and
row counts + column names + (order-insensitive) values must match."""

import math

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings".split()
    ):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(9)
        elif pd.api.types.is_integer_dtype(df[c]) or str(df[c].dtype).startswith("UInt") or str(df[c].dtype).startswith("uint"):
            df[c] = df[c].astype("int64")
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"class", "n_pois", "n_cells", "n_tiles"} <= set(df.columns)


ALL_QUERIES = sorted(entry_mod.queries().keys())

# Empty==empty silently passes the oracle compare, so every query also
# pins a minimum row count at sf0.001 (r1 advice #1).
MIN_ROWS = {
    "stats_counts": 1, "pip_refine_triangle": 1, "lang_id_counts": 2, "cm_frequencies": 3,
    "percentiles_by_type": 5, "sessionization": 300, "repetition_scores": 400, "pii_scrub": 400,
    "pip_donut_multipoly": 2, "polygon_centroid": 25, "url_canonical_dedup": 9,
    "mvt_tile_stats": 4, "media_features": 64, "curated_packing": 30,
    "training_shards": 4, "span_dedup": 400, "span_removal": 400,
    "span_removal_chars": 400, "cell_ladder_rollup": 7,
    "link_pagerank": 400, "link_hits": 400, "host_communities": 400,
    "poi_conflation": 400,
    "kmv_quantiles": 8, "mixture_sample": 4, "radius_pairs": 100,
    "quality_classifier": 400, "quality_classifier_ext": 400,
    "snapshot_upsert": 400, "bigram_lm_scores": 400,
    "trigram_lm_scores": 400,
    "containment_pairs": 20, "phrase_search": 10, "viewport_tiles": 20,
    "paragraph_dedup": 40, "emerging_hotspots": 30, "line_shape_stats": 40,
    "url_shape_stats": 40, "skyline_pois": 25,
    "robots_filter": 400, "page_links": 800, "anchor_texts": 25,
    "boilerplate_removal": 400, "blocklist_filter": 400,
    "gazetteer_match": 80, "quadkey_tiles": 100,
    "image_text_pairs": 60, "image_near_dup": 60, "semantic_dedup": 400,
    "hashed_embedding": 800, "asof_join": 150, "interval_join": 120,
    "polygon_intersection": 60, "kmv_setops": 1, "hll_setops": 1,
    "trajectory_stats": 10, "convex_hulls": 6,
    "hist_bins": 50, "hist_quantiles": 5, "sitemap_frontier": 400,
    "weighted_sample": 150, "snapshot_history": 900, "heatmap_tiles": 80,
    "zone_map_merge": 200, "kde_heatmap": 3000,
    "snap_nearest": 40,
    "doc_chunks": 1000, "ngram_topk": 200, "salted_join": 1000,
    "time_rollup": 1000, "incremental_dedup": 8, "zorder_keys": 140,
    "nearest_poi": 140, "dbscan_clusters": 140,
    "union_merge": 3, "topk_event_types": 5, "pip_bbox_join": 10,
    "dedup_minhash_pairs": 10, "dedup_simhash_pairs": 10,
    "dedup_components": 30, "dedup_jaccard_verify": 10, "bloom_url_probe": 40, "tfidf_top_terms": 90, "stratified_sample": 10, "corpus_curation": 30, "bpe_token_count": 40, "script_fractions": 40, "hll_registers": 30, "pack_sequences": 40, "snapshot_diff": 40, "contamination_pairs": 5,
    "classify_histogram": 15, "bbox_filter": 20, "knn_per_cell": 25,
    "window_rank_lag": 30, "ann_lsh_topk": 50, "ann_ivf_topk": 50,
    "cosine_topk": 50, "pq_adc_topk": 50,
}
DEFAULT_MIN_ROWS = 90  # full-table / tile queries at sf0.001


@pytest.mark.parametrize("name", ALL_QUERIES)
def test_query_matches_oracle(spark, duck, name):
    qfn = entry_mod.queries()[name]
    sdf = qfn(spark, SF_DIR)
    got = sdf.toPandas()
    assert len(got) >= MIN_ROWS.get(name, DEFAULT_MIN_ROWS), f"{name}: suspiciously few rows ({len(got)})"

    oracle = entry_mod.oracle_sql().get(name)
    if oracle is None:
        return  # rows-only check (driver's weak path) — min-rows enforced above
    exp = duck.execute(oracle).df()
    assert len(got) == len(exp), f"{name}: rows {len(got)} vs oracle {len(exp)}"
    assert sorted(got.columns) == sorted(exp.columns), f"{name}: column names differ"
    g, e = _normalize(got), _normalize(exp)
    pd.testing.assert_frame_equal(g, e, check_dtype=False, check_exact=False, rtol=1e-9, atol=1e-9)


def test_every_query_has_oracle():
    qs = entry_mod.queries()
    os_ = entry_mod.oracle_sql()
    assert set(os_.keys()) <= set(qs.keys())
    # r2: every contract query carries a strong oracle (shared SQL,
    # dialect-split SQL, or independently-verified golden fixture)
    missing = set(qs.keys()) - set(os_.keys())
    assert not missing, f"queries without oracle: {missing}"
