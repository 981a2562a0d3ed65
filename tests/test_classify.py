"""Classification rule-order parity: Spark when-chain == shared SQL CASE
== pure-Python oracle, including precedence conflicts."""

import duckdb
import pandas as pd
import pytest

from osm_poi_cloud_spark.functions import classify as cl

CONFLICTS = [
    # (tags, expected) — order-sensitivity anchors from process.py:220-275
    ({"amenity": "ice_cream", "shop": "ice_cream"}, "fast_food"),
    ({"shop": "ice_cream"}, "ice_cream"),
    ({"amenity": "marketplace", "shop": "pet"}, "grocery"),  # shop IN grocery-arm hits first
    ({"amenity": "marketplace"}, "grocery"),
    ({"shop": "pet"}, "animal_services"),
    ({"shop": "tea"}, "specialty_food"),
    ({"amenity": "cafe", "shop": "tea"}, "cafe_bakery"),
    ({"healthcare": "anything_at_all"}, "healthcare"),
    ({"amenity": "hospital", "healthcare": "x"}, "healthcare"),
    ({"office": "government"}, "government"),
    ({"office": "company"}, "professional_services"),
    ({"shop": "never_heard_of_it"}, "retail"),
    ({"amenity": "unknown_thing"}, "misc"),
    ({"leisure": "unknown_thing"}, "misc"),
    ({"tourism": "unknown_thing"}, "misc"),
    ({"man_made": "pier"}, None),
    ({}, None),
    ({"natural": "beach"}, "parks_outdoors"),
    ({"leisure": "bowling_alley", "amenity": "cinema"}, "entertainment"),
    ({"railway": "station", "amenity": "fuel"}, "transport"),  # railway arm earlier? amenity fuel later
]


def _tag_frame():
    rows = []
    for tags, expected in CONFLICTS:
        row = {k: None for k in cl.TAG_KEYS}
        row.update(tags)
        row["expected"] = expected
        rows.append(row)
    # plus one row per rule trigger
    for key, values, expected_cls in cl.CLASS_RULES:
        vals = [values] if isinstance(values, str) else (["anything"] if values is None else list(values))
        for v in vals:
            row = {k: None for k in cl.TAG_KEYS}
            row[key] = v
            row["expected"] = cl.classify_tags({key: v})
            rows.append(row)
    return pd.DataFrame(rows)


def test_python_oracle_on_conflicts():
    for tags, expected in CONFLICTS:
        assert cl.classify_tags(tags) == expected, tags


def test_spark_chain_matches_oracle(spark):
    pdf = _tag_frame()
    sdf = spark.createDataFrame(pdf)
    got = sdf.withColumn("class", cl.class_col()).select("expected", "class").toPandas()
    bad = got[got["expected"].fillna("∅") != got["class"].fillna("∅")]
    assert bad.empty, bad


def test_sql_case_matches_in_duckdb_and_spark(spark):
    pdf = _tag_frame().rename(columns={"natural": "natural_tag", "operator": "operator_tag"})
    col_of = {"natural": "natural_tag", "operator": "operator_tag"}
    sql = cl.class_sql(col_of)

    got_duck = duckdb.connect().execute(f"SELECT expected, {sql} AS class FROM pdf").df()
    bad = got_duck[got_duck["expected"].fillna("∅") != got_duck["class"].fillna("∅")]
    assert bad.empty, bad

    sdf = spark.createDataFrame(pdf)
    got_spark = sdf.selectExpr("expected", f"{sql} AS class").toPandas()
    bad = got_spark[got_spark["expected"].fillna("∅") != got_spark["class"].fillna("∅")]
    assert bad.empty, bad


from hypothesis import given, settings
from hypothesis import strategies as st

_VOCAB = sorted(
    {v for _, vals, _ in cl.CLASS_RULES for v in ([vals] if isinstance(vals, str) else (vals or ()))}
) + ["unknown_thing", "x", ""]


@settings(max_examples=200, deadline=None)
@given(st.fixed_dictionaries({}, optional={
    k: st.sampled_from(_VOCAB) for k in cl.TAG_KEYS
}))
def test_duckdb_case_matches_python_oracle_property(tags):
    """Random tag dicts: the shared SQL CASE (DuckDB) must agree with the
    pure-Python rule evaluation, including fallbacks and NULL rows."""
    import duckdb
    import pandas as pd

    row = {k: tags.get(k) for k in cl.TAG_KEYS}
    pdf = pd.DataFrame([row]).rename(columns={"natural": "natural_tag", "operator": "operator_tag"})
    for c in pdf.columns:
        pdf[c] = pdf[c].astype(object)
    sql = cl.class_sql({"natural": "natural_tag"})
    got = duckdb.connect().execute(f"SELECT {sql} AS class FROM pdf").fetchone()[0]
    assert got == cl.classify_tags(tags)


def test_rule_count_and_classes():
    # 27 distinct classes incl. fallback 'misc' (reference has 27 labels)
    assert len(cl.ALL_CLASSES) == 27
    with pytest.raises(Exception):
        cl.ALL_CLASSES.remove("definitely_not_a_class")
