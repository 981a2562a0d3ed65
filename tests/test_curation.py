"""Curation pipeline: funnel semantics, the scrub-then-dedup ordering
guarantee, audit columns, and the survival report."""

import pandas as pd
from pyspark.sql import functions as F

from osm_poi_cloud_spark.plans.curation import curate_documents, curation_report

GOOD = (
    "the quick brown fox jumps over the lazy dog and runs into the field "
    "with a friendly pack of hounds that are happy to see the morning sun"
)


def _corpus(spark):
    rows = [
        (0, GOOD),                                  # keeps
        (1, GOOD),                                  # exact dup of 0 -> dropped
        (2, GOOD + " contact me at bob@x.org ok"),  # keeps, scrubbed
        (3, GOOD + " contact me at eve@y.net ok"),  # same after scrub -> dedup with 2
        (4, "der hund und die katze sind nicht in der stadt und das ist gut für die ruhe"),  # German
        (5, "zzz " * 40),                           # repetition bomb
        (6, "!!! ??? ### $$$ %%% ^^^ &&& *** ((( )))"),  # punct garbage
        (7, "short text"),                          # < min_tokens
        (8, ""),                                    # empty
    ]
    return spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))


def test_curation_funnel(spark):
    docs = _corpus(spark)
    out = curate_documents(docs).toPandas().sort_values("doc_id")
    assert list(out["doc_id"]) == [0, 2]
    assert (out["lang_detected"] == "en").all()
    # doc 2 kept but its email scrubbed; doc 3 deduped AGAINST it because
    # their texts are identical post-scrub (scrub-then-dedup order)
    t2 = out.set_index("doc_id").loc[2, "text_clean"]
    assert "<EMAIL>" in t2 and "bob@" not in t2
    # audit columns present
    assert {"quality_score", "dup_word_frac", "dup_line_frac", "n_tokens"} <= set(out.columns)

    rep = curation_report(docs, curate_documents(docs)).toPandas()
    assert rep.loc[0, "rows_in"] == 9 and rep.loc[0, "rows_out"] == 2
    assert abs(rep.loc[0, "survival_rate"] - 2 / 9) < 1e-12


def test_curation_keep_langs_and_thresholds(spark):
    docs = _corpus(spark)
    # German admitted when requested
    out = curate_documents(docs, keep_langs=("en", "de")).toPandas()
    assert 4 in set(out["doc_id"])
    # no scrub: docs 2 and 3 differ again, both survive
    out2 = curate_documents(docs, scrub=False).toPandas()
    assert {2, 3} <= set(out2["doc_id"])


def test_curation_cli(tmp_path):
    """The spark-submit CLI end-to-end on real testdata files."""
    import subprocess
    import sys

    out = str(tmp_path / "clean")
    r = subprocess.run(
        [sys.executable, "-m", "osm_poi_cloud_spark.plans.curation",
         "--input", "/root/testdata/sf0.001/documents.parquet",
         "--output", out, "--langs", "en,de"],
        capture_output=True, text=True, timeout=300,
        env={**__import__("os").environ, "SPARK_GRAFT_CPUS": "4"},
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "survive" in r.stdout
    import pandas as pd_  # noqa
    got = pd.read_parquet(out)
    assert len(got) > 0 and set(got["lang_detected"]) <= {"en", "de"}


def test_curation_cli_with_shards(tmp_path):
    """--shards-out produces the training-shard + vocab tables; shard
    token streams decode back through the vocab."""
    import subprocess
    import sys

    out = str(tmp_path / "clean2")
    shards_out = str(tmp_path / "shards")
    r = subprocess.run(
        [sys.executable, "-m", "osm_poi_cloud_spark.plans.curation",
         "--input", "/root/testdata/sf0.001/documents.parquet",
         "--output", out, "--shards-out", shards_out,
         "--num-merges", "80", "--pack-buckets", "4", "--min-count", "1"],
        capture_output=True, text=True, timeout=300,
        env={**__import__("os").environ, "SPARK_GRAFT_CPUS": "4"},
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "sequences" in r.stdout and "vocab" in r.stdout
    shards = pd.read_parquet(f"{shards_out}/shards")
    vocab = pd.read_parquet(f"{shards_out}/vocab")
    assert len(shards) > 0 and len(vocab) > 0
    ids = set(vocab["token_id"])
    assert all(t in ids for row in shards["tokens"] for t in row)
    assert (shards["n_tokens"] == shards["tokens"].map(len)).all()


def test_curation_with_span_removal(spark):
    """span_k wires ExactSubstr removal into the cascade BEFORE exact
    dedup: shared boilerplate is cut from every survivor (the unique
    bodies stay intact), and two docs whose texts become identical
    after removal collapse in the downstream exact dedup."""
    import pandas as pd

    boiler = ("click here to subscribe to our free newsletter "
              "and never miss the latest local updates again")
    body_a = ("the old library on main street reopened this weekend after "
              "a two year renovation with new reading rooms for everyone")
    body_b = ("city officials announced a new bike lane network spanning "
              "twelve miles of downtown streets starting next spring")
    rows = [
        (0, f"{body_a} {boiler}"),
        (1, f"{body_b} {boiler}"),
        # 2 shares body_a with 0 -> after removal BOTH body_a and boiler
        # are flagged spans, so 0 and 2 rewrite to the same (empty)
        # residue and exact dedup collapses them to doc 0
        (2, f"{body_a} {boiler}"),
    ]
    docs = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    out = curate_documents(docs, span_k=8, min_quality=0.0).toPandas() \
        .sort_values("doc_id").set_index("doc_id")
    assert "subscribe" not in " ".join(out["text_clean"])
    assert set(out.index) == {0, 1}
    # doc 1's unique body survives the cut, only the boiler went
    assert out.loc[1, "text_clean"] == body_b
    assert (out["tokens_removed"] > 0).all()
    # audit columns flow through
    assert {"tokens_removed", "chars_removed"} <= set(out.columns)


def test_learned_classifier_leg(spark):
    """classifier_weights folds the learned filter into the cascade:
    survivors of the default path that the model rejects are dropped,
    the plan stays UDF-free, and default behavior is unchanged."""
    from osm_poi_cloud_spark.operators.classifier import (
        DEFAULT_QUALITY_BIAS, DEFAULT_QUALITY_WEIGHTS)
    from osm_poi_cloud_spark.plans.curation import curate_documents

    docs = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .select("doc_id", "text"))
    base = curate_documents(docs)
    withc = curate_documents(docs, classifier_weights=DEFAULT_QUALITY_WEIGHTS,
                             classifier_bias=DEFAULT_QUALITY_BIAS)
    b_ids = set(base.select("doc_id").toPandas()["doc_id"])
    c = withc.select("doc_id", "logit").toPandas()
    assert set(c["doc_id"]) <= b_ids          # strictly a further filter
    assert (c["logit"] > 0).all()             # audit column kept + gated
    plan = withc._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan  # whole cascade incl. logit is native
    # misuse guard
    import pytest as _pytest
    with _pytest.raises(ValueError, match="classifier_bias"):
        curate_documents(docs, classifier_weights=DEFAULT_QUALITY_WEIGHTS)


def test_curation_blocklist_gate(spark):
    docs = spark.createDataFrame(pd.DataFrame([
        (0, GOOD),
        (1, GOOD + " casino casino"),       # 2 hits of 30 tokens -> 6.7%
        (2, GOOD + " casino jackpot"),      # 2 distinct hits
        (3, GOOD.replace("fox", "casino")), # 1 hit of 28 -> 3.6%
    ], columns=["doc_id", "text"]))
    terms = ("casino", "jackpot")
    # default any-hit rule: only the clean doc survives
    strict = curate_documents(docs, blocklist_terms=terms).toPandas()
    assert strict["doc_id"].tolist() == [0]
    assert strict.loc[0, "n_blocked"] == 0
    # 5% tolerance re-admits the single-hit doc only
    loose = curate_documents(docs, blocklist_terms=terms,
                             max_blocked_frac=0.05).toPandas()
    assert sorted(loose["doc_id"]) == [0, 3]
    # no terms -> no blocklist columns, plan unchanged
    off = curate_documents(docs).toPandas()
    assert "n_blocked" not in off.columns


def test_curation_line_rules_gate(spark):
    """line_rules=True drops bullet-farm / ellipsis-heavy pages while
    the default path is unchanged (audit columns only on the gated
    run; planted clean doc survives both)."""
    bullets = "\n".join(f"- item {i} for sale today" for i in range(10))
    dots = "\n".join(["the quick brown fox jumps over the dog"] * 6
                     + ["to be continued..."] * 4)
    clean = "the quick brown fox jumps over the lazy dog " * 4
    df = spark.createDataFrame(
        [(1, bullets), (2, dots), (3, clean)], "doc_id long, text string")
    relax = dict(min_quality=0.0, min_tokens=1, max_dup_word_frac=1.0,
                 max_dup_line_frac=1.0)
    base = {r["doc_id"] for r in curate_documents(df, **relax).collect()}
    gated = {r["doc_id"] for r in curate_documents(
        df, line_rules=True, **relax).collect()}
    assert 3 in base and 3 in gated
    assert 1 in base and 1 not in gated       # 100% bullet lines
    assert 2 in base and 2 not in gated       # 40% ellipsis lines
    # audit columns present only when the gate ran
    gcols = curate_documents(df, line_rules=True).columns
    assert "bullet_ppm" in gcols and "ellipsis_ppm" in gcols
    assert "bullet_ppm" not in curate_documents(df).columns
