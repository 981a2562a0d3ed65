"""Similarity search + text analysis + multimodal plumbing."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from osm_poi_cloud_spark.functions import text_analysis as ta
from osm_poi_cloud_spark.operators import multimodal as mm
from osm_poi_cloud_spark.operators import similarity as sim

SF = "/root/testdata/sf0.001"


def test_cosine_topk_matches_numpy(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    pdf = emb.toPandas()
    q = np.asarray(pdf.loc[pdf["vec_id"] == 0, "embedding"].iloc[0], dtype=np.float64)
    got = sim.cosine_topk(emb, list(q), k=10).toPandas()

    m = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
    sims = (m @ q) / (np.linalg.norm(m, axis=1) * np.linalg.norm(q))
    order = sorted(zip(pdf["vec_id"], sims), key=lambda t: (-t[1], t[0]))[:10]
    assert list(got["vec_id"]) == [int(v) for v, _ in order]
    np.testing.assert_allclose(got["cos_sim"].to_numpy(), [s for _, s in order], rtol=1e-9)


def test_lsh_ann_recall(spark):
    rng = np.random.RandomState(17)
    dim = 32
    # clustered corpus: ANN-friendly
    centers = rng.standard_normal((8, dim)) * 5
    vecs = np.vstack([c + rng.standard_normal((120, dim)) * 0.3 for c in centers])
    corpus = spark.createDataFrame(
        pd.DataFrame({"vec_id": np.arange(len(vecs)), "embedding": [v.astype(float).tolist() for v in vecs]})
    )
    qvecs = centers + rng.standard_normal(centers.shape) * 0.1
    queries = spark.createDataFrame(
        pd.DataFrame({"query_id": np.arange(8), "embedding": [v.astype(float).tolist() for v in qvecs]})
    )
    ann = sim.lsh_bucket_ann(corpus, queries, k=10, dim=dim, bits=8).toPandas()
    exact = sim.pairwise_topk_bruteforce(corpus, queries, k=10).toPandas()
    recall = []
    for qid in range(8):
        a = set(ann[ann["query_id"] == qid]["vec_id"])
        e = set(exact[exact["query_id"] == qid]["vec_id"])
        recall.append(len(a & e) / len(e))
    assert np.mean(recall) >= 0.8, f"ANN recall too low: {recall}"


def test_ivf_ann_recall(spark):
    rng = np.random.RandomState(31)
    dim = 24
    centers = rng.standard_normal((6, dim)) * 5
    vecs = np.vstack([c + rng.standard_normal((150, dim)) * 0.3 for c in centers])
    corpus = spark.createDataFrame(
        pd.DataFrame({"vec_id": np.arange(len(vecs)), "embedding": [v.astype(float).tolist() for v in vecs]})
    )
    queries = spark.createDataFrame(
        pd.DataFrame({"query_id": np.arange(6),
                      "embedding": [(c + rng.standard_normal(dim) * 0.1).tolist() for c in centers]})
    )
    centroids, indexed = sim.ivf_index(corpus, n_centroids=8)
    ann = sim.ivf_ann(indexed, centroids, queries, k=10, nprobe=3).toPandas()
    exact = sim.pairwise_topk_bruteforce(corpus, queries, k=10).toPandas()
    recall = []
    for qid in range(6):
        a = set(ann[ann["query_id"] == qid]["vec_id"])
        e = set(exact[exact["query_id"] == qid]["vec_id"])
        recall.append(len(a & e) / len(e))
    assert np.mean(recall) >= 0.9, recall
    # probing everything == brute force
    full = sim.ivf_ann(indexed, centroids, queries, k=10, nprobe=8).toPandas()
    pd.testing.assert_frame_equal(
        full.sort_values(["query_id", "rn"]).reset_index(drop=True),
        exact.sort_values(["query_id", "rn"]).reset_index(drop=True),
        check_dtype=False,
    )


def test_ivf_hash_sample_partitioning_independent(spark):
    """The at-scale training sample (xxhash64(id) % m == 0, no total
    sort) must depend only on table CONTENT: identical centroids no
    matter how the corpus is partitioned, and the index still answers."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    c1 = sim.train_ivf_centroids(emb.repartition(3), 8, sample="hash", max_sample=200)
    c2 = sim.train_ivf_centroids(emb.repartition(11, "vec_id"), 8, sample="hash", max_sample=200)
    c3 = sim.train_ivf_centroids(emb.coalesce(1), 8, sample="hash", max_sample=200)
    np.testing.assert_array_equal(c1, c2)
    np.testing.assert_array_equal(c1, c3)

    centroids, indexed = sim.ivf_index(emb, n_centroids=8, sample="hash")
    queries = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), "embedding")
    ann = sim.ivf_ann(indexed, centroids, queries, k=5, nprobe=8).toPandas()
    exact = sim.pairwise_topk_bruteforce(emb, queries, k=5).toPandas()
    # nprobe == n_centroids degenerates to brute force regardless of sample mode
    pd.testing.assert_frame_equal(
        ann.sort_values(["query_id", "rn"]).reset_index(drop=True),
        exact.sort_values(["query_id", "rn"]).reset_index(drop=True),
        check_dtype=False,
    )


def test_embedding_dedup_pairs(spark):
    rng = np.random.RandomState(23)
    base = rng.standard_normal(16)
    rows = [(0, base.tolist()), (1, (base * 1.0001).tolist()), (2, (base + 0.001).tolist()),
            (3, rng.standard_normal(16).tolist()), (4, rng.standard_normal(16).tolist())]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["vec_id", "embedding"]))
    pairs = sim.embedding_cosine_dedup_pairs(df, threshold=0.999, bits=4, dim=16).toPandas()
    got = set(map(tuple, pairs[["a", "b"]].to_numpy()))
    assert (0, 1) in got and (0, 2) in got
    assert not any(3 in p or 4 in p for p in got)


def test_lang_id(spark):
    rows = [
        ("en", "the cat and the dog are in the house that is for sale"),
        ("de", "der hund und die katze sind nicht in das haus für ein jahr"),
        ("fr", "le chat et la souris est dans une maison pour les vacances avec"),
        ("es", "el perro y la casa es para una fiesta con los amigos por favor no"),
        ("und", "zzz qqq www eee rrr"),
    ]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["expected", "text"]))
    got = df.withColumn("lang", ta.lang_id_col(F.col("text"))).toPandas()
    assert list(got["lang"]) == list(got["expected"])


def test_quality_and_tokens(spark):
    df = spark.read.parquet(f"{SF}/documents.parquet").limit(200)
    out = ta.quality_features(df).toPandas()
    assert out["quality_score"].between(0, 1).all()
    assert (out["alpha_ratio"] <= 1).all() and (out["punct_ratio"] <= 1).all()

    toks = df.select(
        ta.token_count_col(F.col("text")).alias("ws"),
        ta.bpe_ish_token_count_col(F.col("text")).alias("bpe"),
    ).toPandas()
    assert (toks["bpe"] >= toks["ws"]).all()  # finer granularity

    fp = df.select(ta.fingerprint_col(F.col("text")).alias("fp"), F.col("text")).toPandas()
    # normalization-insensitive: same text with extra spaces -> same fp
    one = spark.createDataFrame(pd.DataFrame({"text": ["Hello   World", "hello world"]}))
    fps = one.select(ta.fingerprint_col(F.col("text")).alias("fp")).toPandas()["fp"]
    assert fps[0] == fps[1]
    assert fp["fp"].nunique() > 150


def test_repetition_features_hand_computed(spark):
    cases = pd.DataFrame({
        "text": [
            "a b c d",                    # all unique: word 0, bigram 0
            "a a a a",                    # word 3/4; bigrams 'a a' x3 -> 2/3
            "x y x y",                    # word 2/4; bigrams: 'x y','y x','x y' -> 1/3
            "line\nline\nother",          # dup line 1/3
        ]
    })
    out = ta.repetition_features(spark.createDataFrame(cases)).toPandas()
    # note: \s+ tokenization treats newlines as separators, so case 4's
    # words are [line, line, other] -> dup 1/3
    assert out["dup_word_frac"].tolist() == pytest.approx([0.0, 0.75, 0.5, 1 / 3])
    assert out["dup_bigram_frac"].tolist() == pytest.approx([0.0, 2 / 3, 1 / 3, 0.0])
    assert out["dup_line_frac"].tolist() == pytest.approx([0.0, 0.0, 0.0, 1 / 3])


def test_pii_scrubbing_hand_cases(spark):
    cases = pd.DataFrame({
        "text": [
            "mail me at jo.doe+x@sub.example.co.uk today",
            "server 192.168.001.1 and 10.0.0.255 up",
            "call +1-555-123-4567 or 44 20 7946 0958 now",
            "no pii here, just 42 and v1.2 notes",
        ],
        "want": [
            "mail me at <EMAIL> today",
            "server <IP> and <IP> up",
            "call <PHONE> or <PHONE> now",
            "no pii here, just 42 and v1.2 notes",
        ],
    })
    out = (
        spark.createDataFrame(cases)
        .withColumn("got", ta.scrub_pii_col(F.col("text")))
        .toPandas()
    )
    assert out["got"].tolist() == out["want"].tolist()
    counts = ta.pii_counts(spark.createDataFrame(cases)).toPandas()
    assert counts["email_hits"].tolist() == [1, 0, 0, 0]
    assert counts["ip_hits"].tolist() == [0, 2, 0, 0]
    # counts are per-pattern on the RAW text: dotted IPs also look like
    # phone shapes (the scrub itself replaces emails/IPs first, so the
    # redaction never double-fires — asserted above)
    assert counts["phone_hits"].tolist() == [0, 1, 2, 0]


def test_multimodal_plumbing(spark):
    media = mm.make_synthetic_media(spark, 64)
    meta = mm.decode_image_meta(media).toPandas()
    imgs = meta[meta["ok"]]
    assert len(imgs) == 32  # png + gif rows decode
    src = media.toPandas().set_index("media_id")
    for _, r in imgs.iterrows():
        assert (r["width"], r["height"]) == (src.loc[r["media_id"], "width"], src.loc[r["media_id"], "height"])

    feats = mm.extract_image_features(media, dim=16).toPandas()
    assert len(feats) == 64
    assert all(len(f) == 16 for f in feats["feature"])

    frames = mm.sample_frames(media, every_n=10).toPandas()
    assert (frames["frame_idx"] % 10 == 0).all()
    vids = src[src["kind"] == "video"]
    assert set(frames["media_id"]) == set(vids.index)

    import pytest

    # pixel decode is REAL for PNG now (tests/test_png.py covers it);
    # non-PNG payloads report ok=false instead of crashing
    pix = mm.decode_image_pixels(media).toPandas()
    assert pix["ok"].any() and not pix["ok"].all()


def test_tfidf_top_terms_hand_computed(spark):
    """3-doc corpus with known tf/df: scores and ranks verified by
    hand. 'rare' appears only in doc 0 (df=1), 'shared' in all three
    (df=3): tf * (N+1)/(df+1) must rank rare above shared at equal tf."""
    from osm_poi_cloud_spark.functions.text_analysis import tfidf_top_terms

    docs = spark.createDataFrame(pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": [
            "rare shared shared",      # tf(rare)=1 df=1; tf(shared)=2 df=3
            "shared common common",    # common df=2
            "shared common zzz",
        ],
    }))
    out = tfidf_top_terms(docs, k=3).toPandas().sort_values(["doc_id", "rn"])
    d0 = out[out["doc_id"] == 0].set_index("term")
    # N=3: score(rare) = 1 * 4/2 = 2.0 ; score(shared) = 2 * 4/4 = 2.0
    # tie on score -> higher tf wins -> shared is rn 1
    assert d0.loc["rare", "score"] == 2.0 and d0.loc["rare", "df"] == 1
    assert d0.loc["shared", "score"] == 2.0 and d0.loc["shared", "tf"] == 2
    assert d0.loc["shared", "rn"] == 1 and d0.loc["rare", "rn"] == 2
    # doc 2: zzz df=1 -> 1*4/2=2.0 ; common df=2 -> 1*4/3 ; shared 1*4/4
    d2 = out[out["doc_id"] == 2].set_index("term")
    assert list(d2.sort_values("rn").index) == ["zzz", "common", "shared"]
    assert d2.loc["common", "score"] == 4.0 / 3.0  # exact IEEE division


def test_script_fractions_hand_cases(spark):
    """Hand-built per-script strings: each must classify to its script;
    ASCII digits/punctuation-only -> 'other'; a mixed string routes to
    the majority script."""
    from osm_poi_cloud_spark.functions.text_analysis import script_fractions

    rows = [
        (0, "hello latin text"),
        (1, "привет русский текст"),
        (2, "γειά σου ελληνικά"),
        (3, "مرحبا بالعالم"),
        (4, "שלום עולם"),
        (5, "नमस्ते दुनिया"),
        (6, "你好世界 こんにちは 안녕하세요"),
        (7, "1234 !!! ??? 000"),
        (8, "mostly latin но чуть-чуть кириллицы here and more latin"),
    ]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    out = script_fractions(df).toPandas().set_index("doc_id")
    expect = {0: "latin", 1: "cyrillic", 2: "greek", 3: "arabic",
              4: "hebrew", 5: "devanagari", 6: "cjk", 7: "other", 8: "latin"}
    for did, script in expect.items():
        assert out.loc[did, "dominant_script"] == script, (did, out.loc[did, "dominant_script"])
    # fractions are exact ratios in [0, 1] and scripts don't overlap
    fr_cols = [c for c in out.columns if c.endswith("_frac")]
    assert ((out[fr_cols] >= 0) & (out[fr_cols] <= 1)).all().all()
    assert out.loc[6, "cjk_frac"] > 0.5 and out.loc[1, "cyrillic_frac"] > 0.5


def test_ivf_index_save_load_and_partition_pruning(spark, tmp_path):
    """Index lifecycle: persisted centroids reload bitwise, probe
    results match the in-memory index exactly, and the vectors table is
    partitioned by centroid_id so a probe's filter is a PRUNED read
    (PartitionFilters in the scan, same contract as tile serving)."""
    import numpy as np
    from pyspark.sql import functions as F
    from osm_poi_cloud_spark.operators import similarity as sim

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    centroids, indexed = sim.ivf_index(emb, n_centroids=8)
    path = str(tmp_path / "ivf")
    sim.save_ivf_index(path, centroids, indexed)
    cent2, indexed2 = sim.load_ivf_index(spark, path)
    assert (np.asarray(centroids) == cent2).all()  # bitwise round trip
    q = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), "embedding")
    a = sim.ivf_ann(indexed, centroids, q, k=5, nprobe=3).toPandas() \
        .sort_values(["query_id", "rn"]).reset_index(drop=True)
    b = sim.ivf_ann(indexed2, cent2, q, k=5, nprobe=3).toPandas() \
        .sort_values(["query_id", "rn"]).reset_index(drop=True)
    assert (a[["query_id", "vec_id", "rn"]].to_numpy()
            == b[["query_id", "vec_id", "rn"]].to_numpy()).all()
    # pruning: a centroid filter must appear as PartitionFilters
    plan = indexed2.filter(F.col("centroid_id").isin(1, 2, 3)) \
        ._jdf.queryExecution().executedPlan().toString()
    import re
    m = re.search(r"PartitionFilters: \[[^\]]*centroid_id", plan)
    assert m, plan[:1500]


def test_media_near_dup_composition(spark):
    """Image near-dup: decoded-pixel feature vectors -> LSH-blocked
    cosine pairs. A pixel-identical PNG re-encode of the same image
    must pair with cosine ~1.0; unrelated images must not."""
    import numpy as np
    from pyspark.sql import functions as F
    from osm_poi_cloud_spark.functions import png as png_codec
    from osm_poi_cloud_spark.operators import multimodal as mm
    from osm_poi_cloud_spark.operators import similarity as sim

    rows = []
    for i in range(12):
        # structured, mutually-distinct images (different brightness and
        # gradient direction): statistics-based features must separate
        # them, unlike pure noise which is statistically identical
        yy, xx = np.mgrid[0:24, 0:24]
        base = (xx if i % 2 == 0 else yy) * 8 + i * 18
        arr = np.stack([(base + k * 40) % 256 for k in range(3)],
                       axis=2).astype(np.uint8)
        rows.append((f"img{i}", "image", png_codec.encode_png(arr),
                     "image/png", 24, 24, 0, 0))
        if i < 3:  # near-dup partner: identical pixels, fresh encode
            rows.append((f"img{i}_copy", "image", png_codec.encode_png(arr.copy()),
                         "image/png", 24, 24, 0, 0))
    media = spark.createDataFrame(rows, schema=mm.MEDIA_SCHEMA)
    feats = mm.extract_image_features(media).withColumnRenamed("media_id", "vec_id") \
        .withColumnRenamed("feature", "embedding")
    pairs = sim.embedding_cosine_dedup_pairs(
        feats, threshold=0.999, bits=4, id_col="vec_id").toPandas()
    got = {tuple(sorted(p)) for p in zip(pairs["a"], pairs["b"])}
    for i in range(3):
        assert (f"img{i}", f"img{i}_copy") in got, i
    # no spurious pairs between unrelated random images
    assert all("copy" in a or "copy" in b for a, b in got)


def test_image_dhash_near_dup(spark):
    """Perceptual-hash near-dup: banded pairs == brute force (no
    pigeonhole misses), every planted base/copy pair found, guards."""
    import itertools

    import pytest as _pytest
    from osm_poi_cloud_spark.operators import multimodal as mm

    media = mm.make_near_dup_media(spark, 32)
    hp = mm.image_dhash(media).toPandas()
    assert hp["ok"].all()
    pairs = mm.dhash_near_dup_pairs(
        mm.image_dhash(media), max_hamming=6).toPandas()
    hv = dict(zip(hp["media_id"], hp["dhash"]))
    bf = set()
    for a, b in itertools.combinations(sorted(hv), 2):
        d = bin((hv[a] ^ hv[b]) & ((1 << 64) - 1)).count("1")
        if d <= 6:
            bf.add((a, b, d))
    assert set(map(tuple, pairs[["a", "b", "hamming"]]
                   .itertuples(index=False))) == bf
    got_ab = {(a, b) for a, b, _ in bf}
    for i in range(0, 32, 2):  # planted copies all surface
        assert (f"b{i}", f"b{i}c0") in got_ab and (f"b{i}", f"b{i}c1") in got_ab
    # restated-hash parity: dhash_from_array on the formula array
    import numpy as np
    yy, xx = np.mgrid[0:24, 0:32]
    arr5 = np.stack([(xx * (3 + 5 % 5) + yy * (5 + 2 * (5 % 7))
                      + 5 * 17 + k * 31) % 256 for k in range(3)],
                    axis=2).astype(np.uint8)
    assert mm.dhash_from_array(arr5) == hv["b5"]
    # sub-grid images come back ok=false
    tiny = mm.dhash_from_array(np.zeros((4, 4, 3), np.uint8))
    assert tiny is None
    with _pytest.raises(ValueError, match="pigeonhole"):
        mm.dhash_near_dup_pairs(mm.image_dhash(media), max_hamming=8, bands=8)
    with _pytest.raises(ValueError, match="divide"):
        mm.dhash_near_dup_pairs(mm.image_dhash(media), max_hamming=3, bands=7)


def test_semantic_dedup_planted_copies(spark):
    """SemDeDup: planted perturbed copies are dropped with dup_of
    pointing at their source; unrelated gaussians survive; result is
    partitioning-independent; oversized clusters raise."""
    import numpy as np
    import pytest as _pytest
    from osm_poi_cloud_spark.operators.similarity import semantic_dedup

    rng = np.random.RandomState(3)
    base = rng.randn(300, 32).astype(np.float64)
    rows = [(i, [float(v) for v in base[i]]) for i in range(300)]
    # every 5th vector gets a near-copy (tiny deterministic nudge)
    for i in range(0, 300, 5):
        rows.append((1000 + i, [float(v) for v in base[i] + 0.01 * np.arange(32) / 32]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = semantic_dedup(emb, tau=0.95, n_centroids=4).toPandas() \
        .sort_values("vec_id").reset_index(drop=True)
    assert len(out) == 360
    by_id = out.set_index("vec_id")
    # copies dropped, linked to their source (same cluster: the nudge
    # is far smaller than the inter-cluster spacing)
    dropped = out[~out["keep"]]
    assert len(dropped) >= 55  # 60 planted, allow a couple straddling clusters
    for vid in dropped["vec_id"]:
        assert by_id.loc[vid, "dup_of"] == vid - 1000 or vid < 1000
    # base vectors (random gaussians, cos ~ N(0, 1/32)) all kept
    assert out[out["vec_id"] < 1000]["keep"].all()
    # partitioning independence
    out2 = semantic_dedup(emb.repartition(13), tau=0.95, n_centroids=4) \
        .toPandas().sort_values("vec_id").reset_index(drop=True)
    assert out[["vec_id", "keep"]].equals(out2[["vec_id", "keep"]])
    assert (out["dup_of"].fillna(-1) == out2["dup_of"].fillna(-1)).all()
    # guards
    with _pytest.raises(ValueError, match="tau"):
        semantic_dedup(emb, tau=1.5)
    with _pytest.raises(Exception, match="max_cluster_rows"):
        semantic_dedup(emb, n_centroids=2, max_cluster_rows=50).collect()


def test_hashed_embedding_to_semantic_dedup_composition(spark):
    """Text -> hashed-TF-IDF vectors -> SemDeDup, end to end with no
    external model: planted duplicate documents collapse; the dense
    assembly is native (no Python besides the clustering UDFs)."""
    import pandas as pd
    from osm_poi_cloud_spark.functions.embed import (hashed_tfidf_embed,
                                                     hashed_tfidf_entries)
    from osm_poi_cloud_spark.operators.similarity import semantic_dedup

    base_docs = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
                 .select("doc_id", "text").filter(F.col("doc_id") < 200))
    copies = base_docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 10_000).alias("doc_id"), "text")  # exact text dups
    corpus = base_docs.unionByName(copies)
    emb = hashed_tfidf_embed(corpus, dim=128)
    ep = emb.toPandas()
    assert len(ep) == 220 and all(len(v) == 128 for v in ep["embedding"])
    # the dense assembly stays JVM-side
    plan = hashed_tfidf_embed(corpus, dim=128)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "EvalPython" not in plan
    out = semantic_dedup(emb.withColumnRenamed("doc_id", "vec_id"),
                         tau=0.999, n_centroids=4).toPandas()
    dropped = out[~out["keep"]].set_index("vec_id")
    # every planted copy collapses (identical text -> identical vector
    # -> cosine exactly 1); the corpus itself also contains genuine
    # near-dups (synthetic template texts), so dropped is a superset
    for i in range(0, 200, 10):
        assert 10_000 + i in dropped.index
        src = dropped.loc[10_000 + i, "dup_of"]
        # dup_of is the greedy representative: the source doc itself,
        # or an earlier doc the source had already collapsed onto
        assert src == i or src in dropped.index or src < 200
    # entries table: weight is the exact rational tf*(N+1)/(df+1)
    ent = hashed_tfidf_entries(corpus, dim=128).limit(50).toPandas()
    n = 220
    for _, r in ent.iterrows():
        assert r["weight"] == (float(r["tf"]) * float(n + 1)) / float(r["df_bucket"] + 1)


def test_ngram_counts_hand_computed(spark):
    """Trigram counts over a 3-doc corpus recomputed by hand; short
    docs (< n tokens) contribute nothing; case preserved; top-k
    tie-break is (count desc, gram asc) and the plan is
    TakeOrderedAndProject (no global sort)."""
    import pandas as pd
    from collections import Counter
    from osm_poi_cloud_spark.functions.text_analysis import (
        ngram_counts, ngram_topk)

    texts = ["a b c a b c", "b c a b", "x y", "A b c"]
    df = spark.createDataFrame(pd.DataFrame({"doc_id": range(4), "text": texts}))
    exp = Counter()
    for t in texts:
        tk = t.split()
        for i in range(len(tk) - 2):
            exp[" ".join(tk[i:i + 3])] += 1
    got = ngram_counts(df, n=3).toPandas().set_index("gram")["cnt"].to_dict()
    assert got == dict(exp)

    top = ngram_topk(df, n=3, k=3)
    rows = top.toPandas()
    ranked = sorted(exp.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    assert list(map(tuple, rows[["gram", "cnt"]].values)) == ranked
    plan = top._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan

    import pytest
    with pytest.raises(ValueError):
        ngram_counts(df, n=0)


def test_blocklist_features_hand_computed(spark):
    df = spark.createDataFrame(pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": ["the SPAM king eats spam daily",   # 2 hits, case-insensitive
                 "a perfectly clean document",       # 0 hits
                 "class assignment",                 # whole-token: no 'ass' trip
                 "junk junk junk"],                  # all tokens blocked
    }))
    out = ta.blocklist_features(df, ("spam", "junk", "ass")) \
        .toPandas().set_index("doc_id")
    assert out.loc[0, "n_blocked"] == 2
    assert out.loc[0, "n_tokens_bl"] == 6
    assert out.loc[0, "blocked_frac"] == 2 / 6
    assert out.loc[1, "n_blocked"] == 0
    assert out.loc[2, "n_blocked"] == 0            # substring never matches
    assert out.loc[3, "n_blocked"] == 3
    assert out.loc[3, "blocked_frac"] == 1.0
    # fingerprint = md5 of sorted distinct matched terms joined with |
    import hashlib
    assert out.loc[0, "blocked_terms_fp"] == hashlib.md5(b"spam").hexdigest()
    assert out.loc[1, "blocked_terms_fp"] == hashlib.md5(b"").hexdigest()
    assert out.loc[3, "blocked_terms_fp"] == hashlib.md5(b"junk").hexdigest()

    kept = ta.blocklist_filter(df, ("spam", "junk"), max_frac=0.0) \
        .toPandas()["doc_id"].tolist()
    assert sorted(kept) == [1, 2]

    with pytest.raises(ValueError):
        ta.blocklist_features(df, ())


# -------------------------------------------------------- line shape (Gopher)


def test_line_shape_features_hand_case(spark):
    text = "\n".join([
        "- first bullet item",
        "* second bullet",
        "• third bullet",
        "a normal line of prose here",
        "trailing off...",
        "ok",
        "",
    ])
    df = spark.createDataFrame([(1, text), (2, "single solid line of text")],
                               "doc_id long, text string")
    got = {r["doc_id"]: r for r in ta.line_shape_features(df).collect()}
    r = got[1]
    assert r["n_lines"] == 7
    assert r["bullet_lines"] == 3
    assert r["ellipsis_lines"] == 1
    # <=3-word lines: "* second bullet"(3), "• third bullet"(3),
    # "trailing off..."(2), "ok"(1), ""(0)
    assert r["short_lines"] == 5
    assert r["total_line_words"] == 4 + 3 + 3 + 6 + 2 + 1 + 0
    assert r["bullet_ppm"] == 1_000_000 * 3 // 7
    assert r["ellipsis_ppm"] == 1_000_000 * 1 // 7
    assert r["words_per_line_ppm"] == 1_000_000 * 19 // 7
    r2 = got[2]
    assert r2["n_lines"] == 1 and r2["bullet_ppm"] == 0


def test_line_shape_filter_gopher_rules(spark):
    bullets = "\n".join(f"- item {i}" for i in range(10))          # 100% bullets
    dots = "\n".join(["fine line"] * 6 + ["hmm..."] * 4)           # 40% ellipsis
    clean = "\n".join(["a perfectly reasonable paragraph here"] * 5)
    df = spark.createDataFrame(
        [(1, bullets), (2, dots), (3, clean), (4, "")],
        "doc_id long, text string")
    kept = {r["doc_id"] for r in ta.line_shape_filter(df).collect()}
    # empty text: 1 line, 0 bullets/ellipsis -> kept
    assert kept == {3, 4}
    # thresholds are inclusive 'at or under'
    edge = spark.createDataFrame(
        [(9, "\n".join(["- b"] * 9 + ["x"]))], "doc_id long, text string")
    assert ta.line_shape_filter(edge).count() == 1  # exactly 90% kept
    # filter drops the feature columns
    cols = ta.line_shape_filter(df).columns
    assert cols == ["doc_id", "text"]
