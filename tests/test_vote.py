"""Vote semantics pinned to the reference's literal expectations
(reference: tests/voters/test_weighted_voter.py:35-79,
tests/voters/test_majority_voter.py:11-46 — via FIXTURES.md §3)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from openllm_ocr_annotator_spark.operators.vote import (
    explode_annotation_fields,
    falsy_field_filter,
    majority_vote,
    weight_key,
    weighted_vote,
)

ANN_SCHEMA = (
    "doc_id string, annotator_id string, field_name string, "
    "value string, confidence double"
)


def _vote(spark, rows, weights=None, num_samples=1):
    ann = spark.createDataFrame(rows, ANN_SCHEMA)
    wdf = (
        spark.createDataFrame(list(weights.items()), "annotator_id string, weight double")
        if weights
        else None
    )
    out = weighted_vote(ann, wdf, num_samples=num_samples)
    return {
        (r.doc_id, r.field_name): (r.value, r.confidence) for r in out.collect()
    }


def test_single_annotator_confidence_one(spark):
    got = _vote(spark, [("d1", "a/m", "invoice_number", "INV-001", 1.0)])
    assert got[("d1", "invoice_number")] == ("INV-001", 1.0)


def test_two_agreeing_equal_weight(spark):
    rows = [
        ("d1", "a/m1", "total", "100", 1.0),
        ("d1", "b/m2", "total", "100", 1.0),
    ]
    assert _vote(spark, rows)[("d1", "total")] == ("100", 1.0)


def test_higher_weight_wins(spark):
    rows = [
        ("d1", "high/m", "total", "100", 1.0),
        ("d1", "low/m", "total", "200", 1.0),
    ]
    w = {"high/m": 2.0, "low/m": 0.5}
    value, conf = _vote(spark, rows, w)[("d1", "total")]
    assert value == "100"
    assert conf == pytest.approx(2.0 / 2.5)


def test_normalized_confidence_three_quarters(spark):
    rows = [
        ("d1", "a/m", "total", "100", 1.0),
        ("d1", "b/m", "total", "200", 1.0),
    ]
    w = {"a/m": 3.0, "b/m": 1.0}
    value, conf = _vote(spark, rows, w)[("d1", "total")]
    assert value == "100"
    assert conf == 3.0 / 4.0  # exact float64, reference expectation


def test_confidence_scales_votes(spark):
    # confidence weights the vote multiplicatively (weighted.py:109)
    rows = [
        ("d1", "a/m", "total", "100", 0.5),
        ("d1", "b/m", "total", "200", 1.0),
    ]
    value, conf = _vote(spark, rows)[("d1", "total")]
    assert value == "200"
    assert conf == pytest.approx(1.0 / 1.5)


def test_missing_confidence_defaults_to_one(spark):
    rows = [("d1", "a/m", "total", "100", None)]
    assert _vote(spark, rows)[("d1", "total")] == ("100", 1.0)


def test_falsy_fields_never_vote(spark):
    rows = [
        ("d1", "a/m", "total", "", 1.0),
        ("d1", "a/m", "", "100", 1.0),
        ("d1", "a/m", None, "100", 1.0),
        ("d1", "a/m", "total", None, 1.0),
        ("d1", "b/m", "total", "42", 1.0),
    ]
    got = _vote(spark, rows)
    assert got == {("d1", "total"): ("42", 1.0)}


def test_sample_suffix_weight_stripping(spark):
    rows = [
        ("d1", "a/m/sample_0", "total", "100", 1.0),
        ("d1", "a/m/sample_1", "total", "100", 1.0),
        ("d1", "b/m/sample_0", "total", "200", 1.0),
    ]
    w = {"a/m": 2.0, "b/m": 1.0}
    value, conf = _vote(spark, rows, w, num_samples=2)[("d1", "total")]
    assert value == "100"
    assert conf == pytest.approx(4.0 / 5.0)


def test_weight_key_quirk():
    # the reference strips only '/sample_<last-underscore-token>'
    # (weighted.py:31-36): a trailing token containing '_' is NOT stripped.
    import pandas as pd
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    df = spark.createDataFrame(
        [("a/m/sample_3",), ("a/m/sample_3_4",), ("a/m",)], "annotator_id string"
    )
    got = [r.k for r in df.select(weight_key(F.col("annotator_id"), 2).alias("k")).collect()]
    assert got == ["a/m", "a/m/sample_3_4", "a/m"]
    del pd


def test_unknown_annotator_default_weight(spark):
    rows = [
        ("d1", "known/m", "total", "100", 1.0),
        ("d1", "unknown/m", "total", "200", 1.0),
        ("d1", "unknown2/m", "total", "200", 1.0),
    ]
    w = {"known/m": 1.0}
    value, conf = _vote(spark, rows, w)[("d1", "total")]
    assert value == "200"
    assert conf == pytest.approx(2.0 / 3.0)


def test_tie_break_pinned_lexicographic(spark):
    rows = [
        ("d1", "a/m", "total", "b_val", 1.0),
        ("d1", "b/m", "total", "a_val", 1.0),
    ]
    value, conf = _vote(spark, rows)[("d1", "total")]
    assert value == "a_val"  # equal score → lexicographically smallest
    assert conf == 0.5


def test_majority_vote_mode_and_tie(spark):
    rows = [
        ("d1", "status", "paid"),
        ("d1", "status", "paid"),
        ("d1", "status", "open"),
        ("d2", "status", "b"),
        ("d2", "status", "a"),  # tie → 'a' (pinned value ASC)
    ]
    df = spark.createDataFrame(rows, "doc_id string, field_name string, value string")
    got = {(r.doc_id, r.field_name): (r.value, r.n_votes) for r in majority_vote(df).collect()}
    assert got[("d1", "status")] == ("paid", 2)
    assert got[("d2", "status")] == ("a", 1)


def test_explode_annotation_fields_roundtrip(spark):
    nested = spark.createDataFrame(
        [
            (
                "d1",
                "a/m",
                0,
                {
                    "fields": [
                        {"field_name": "x", "value": "1", "confidence": 0.9},
                        {"field_name": "y", "value": "2", "confidence": None},
                    ]
                },
            )
        ],
        "doc_id string, annotator_id string, sample_id int, "
        "result struct<fields: array<struct<field_name string, value string, confidence double>>>",
    )
    rows = explode_annotation_fields(nested).collect()
    assert [(r.field_name, r.value, r.confidence) for r in rows] == [
        ("x", "1", 0.9),
        ("y", "2", None),
    ]


def test_empty_result_rejected_like_p3(spark):
    # P3 (annotator_processor.py:113-118): empty fields arrays produce no votes
    nested = spark.createDataFrame(
        [("d1", "a/m", 0, {"fields": []})],
        "doc_id string, annotator_id string, sample_id int, "
        "result struct<fields: array<struct<field_name string, value string, confidence double>>>",
    )
    exploded = explode_annotation_fields(nested)
    assert falsy_field_filter(exploded).count() == 0


def test_highest_confidence_vote_semantics(spark):
    from openllm_ocr_annotator_spark.operators.vote import highest_confidence_vote

    rows = [
        # plain winner by confidence
        ("d1", "a/m", "total", "100", 0.6),
        ("d1", "b/m", "total", "200", 0.9),
        # tie on confidence → value ASC wins
        ("d2", "a/m", "total", "300", 0.7),
        ("d2", "b/m", "total", "250", 0.7),
        # falsy value never wins, even at confidence 1.0
        ("d3", "a/m", "total", "", 1.0),
        ("d3", "b/m", "total", "50", 0.1),
        # null confidence defaults to 1.0 (reference weighted.py:102 contract)
        ("d4", "a/m", "total", "77", None),
        ("d4", "b/m", "total", "88", 0.95),
    ]
    ann = spark.createDataFrame(
        rows,
        "doc_id string, annotator_id string, field_name string, "
        "value string, confidence double",
    )
    got = {
        (r.doc_id, r.field_name): (r.value, r.confidence)
        for r in highest_confidence_vote(ann).collect()
    }
    assert got[("d1", "total")] == ("200", 0.9)
    assert got[("d2", "total")] == ("250", 0.7)
    assert got[("d3", "total")] == ("50", 0.1)
    assert got[("d4", "total")] == ("77", 1.0)
