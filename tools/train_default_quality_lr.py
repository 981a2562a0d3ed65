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


def main() -> None:
    spark = get_spark("train-lr", master="local[8]", shuffle_partitions=8)
    clean = spark.read.parquet("/root/testdata/sf0.01/documents.parquet") \
        .select("doc_id", "text").withColumn("label", F.lit(1))
    junk = junk_corpus(spark, 500).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text") \
        .withColumn("label", F.lit(0))
    corpus = clean.unionByName(junk)
    feat = C.featurize(corpus)
    w, b = C.train_quality_lr(feat, "label", lr=0.5, iters=300)
    acc = (C.score_quality_lr(feat, w, b)
           .selectExpr("avg(CAST((keep = (label = 1)) AS DOUBLE)) a").first()["a"])
    print("DEFAULT_QUALITY_WEIGHTS =", tuple(float(repr(float(v)) if True else v) for v in w))
    print("weights_repr =", ", ".join(repr(float(v)) for v in w))
    print("bias_repr =", repr(b))
    print("train accuracy:", acc)


if __name__ == "__main__":
    main()
