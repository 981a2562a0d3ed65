#!/usr/bin/env python
"""Regenerate DEFAULT_QUALITY_WEIGHTS in operators/classifier.py.

The standard quality-filter training setup (CCNet/GPT-3 style):
positives = a curated reference corpus (the clean synthetic documents),
negatives = junk with the failure modes the filter must catch —
hash-gibberish word salad, repeated-boilerplate spam, punctuation
noise — generated deterministically from doc ids.
"""
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from osm_poi_cloud_spark.config import get_spark  # noqa: E402
from osm_poi_cloud_spark.operators import classifier as C  # noqa: E402


def junk_corpus(spark, n: int):
    """Deterministic negatives: three junk families, n/3 docs each."""
    base = spark.range(n).select(F.col("id").alias("doc_id"))
    salad = base.filter(F.col("doc_id") % 3 == 0).select(
        "doc_id",
        F.concat_ws(" ", F.transform(
            F.sequence(F.lit(1), F.lit(60)),
            lambda i: F.substring(F.md5(F.concat_ws("-", F.col("doc_id"),
                                                    i.cast("string"))), 1, 10),
        )).alias("text"))
    boiler = base.filter(F.col("doc_id") % 3 == 1).select(
        "doc_id",
        F.concat_ws("\n", F.transform(
            F.sequence(F.lit(1), F.lit(40)),
            lambda i: F.lit("click here to buy now best price deal"),
        )).alias("text"))
    punct = base.filter(F.col("doc_id") % 3 == 2).select(
        "doc_id",
        F.concat_ws(" ", F.transform(
            F.sequence(F.lit(1), F.lit(50)),
            lambda i: F.concat(F.lit("!!!###$$$"), i.cast("string"), F.lit("%%%&&&***")),
        )).alias("text"))
    return salad.unionByName(boiler).unionByName(punct)


def main(extended: bool = False) -> None:
    spark = get_spark("train-lr", master="local[8]", shuffle_partitions=8)
    clean = spark.read.parquet("/root/testdata/sf0.01/documents.parquet") \
        .select("doc_id", "text").withColumn("label", F.lit(1))
    junk = junk_corpus(spark, 500).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text") \
        .withColumn("label", F.lit(0))
    corpus = clean.unionByName(junk)
    if not extended:
        feat = C.featurize(corpus)
        w, b = C.train_quality_lr(feat, "label", lr=0.5, iters=300)
        acc = (C.score_quality_lr(feat, w, b)
               .selectExpr("avg(CAST((keep = (label = 1)) AS DOUBLE)) a").first()["a"])
        print("weights_repr =", ", ".join(repr(float(v)) for v in w))
        print("bias_repr =", repr(b))
        print("train accuracy:", acc)
        return

    # --- extended basis: add LM-visible / span-visible junk + a link
    # graph in which junk is never cited ---
    vocab = ("the of and to in that it was for on are with as his they at be "
             "this have from or had by hot word but what some we can out other "
             "were all there when up use your how said an each she which do "
             "their time if will way about many then them write would like so "
             "these her long make thing see him two has look more day").split()
    varr = "array(" + ", ".join(f"'{w}'" for w in vocab) + ")"
    base2 = spark.range(400).select((F.col("id") + 2_000_000).alias("doc_id"))
    boiler_x = base2.filter(F.col("doc_id") % 2 == 0).select(
        "doc_id",
        F.lit("the committee agreed to publish the quarterly report and "
              "invited all members to review the findings before the next "
              "meeting of the board in the spring session").alias("text"))
    salad_x = base2.filter(F.col("doc_id") % 2 == 1).select(
        "doc_id",
        F.expr(f"concat_ws(' ', transform(sequence(1, 60), "
               f"i -> element_at({varr}, 1 + CAST(pmod(xxhash64(doc_id, i), "
               f"{len(vocab)}) AS INT))))").alias("text"))
    junk_x = boiler_x.unionByName(salad_x).withColumn("label", F.lit(0))
    corpus = corpus.unionByName(junk_x)
    # link graph: clean docs cite each other; junk gets no in-links
    n_clean = clean.count()
    edges = (clean.select("doc_id",
                          F.explode(F.sequence(F.lit(1), F.lit(3))).alias("j"))
             .select(F.col("doc_id").alias("src"),
                     F.pmod(F.col("doc_id") * 31 + F.col("j") * 977,
                            F.lit(n_clean)).alias("dst"))
             .filter(F.col("src") != F.col("dst")))
    feat = C.featurize_extended(corpus, edges=edges).persist()
    # the LM/salad margin is small in raw feature space: the longer
    # GD budget (lr=1.0, 1500 iters) reaches full separation (1.0)
    # where the 6-feature basis cannot (salad_x / boiler_x families)
    w, b = C.train_quality_lr(feat, "label", feature_cols=C.EXT_FEATURES,
                              lr=1.0, iters=1500)
    acc = (C.score_quality_lr(feat, w, b, feature_cols=C.EXT_FEATURES)
           .selectExpr("avg(CAST((keep = (label = 1)) AS DOUBLE)) a").first()["a"])
    # comparison: the 6-feature model on the SAME corpus
    w6, b6 = C.train_quality_lr(feat, "label", lr=1.0, iters=1500)
    acc6 = (C.score_quality_lr(feat, w6, b6)
            .selectExpr("avg(CAST((keep = (label = 1)) AS DOUBLE)) a").first()["a"])
    print("ext weights_repr =", ", ".join(repr(float(v)) for v in w))
    print("ext bias_repr =", repr(b))
    print("ext train accuracy:", acc, " (6-feature on same corpus:", acc6, ")")


if __name__ == "__main__":
    import sys as _sys

    main(extended="--extended" in _sys.argv)
