"""operators/stats.py: skew report + cardinality audit probes."""

from __future__ import annotations

from openllm_ocr_annotator_spark.operators.stats import (
    cardinality_audit,
    skew_report,
)


def test_skew_report_ranks_and_fractions(spark):
    rows = [("a",)] * 6 + [("b",)] * 3 + [("c",)] * 1
    df = spark.createDataFrame(rows, "k string")
    got = [(r.key, r.n, r.frac, r.rank) for r in
           skew_report(df, "k").orderBy("rank").collect()]
    assert got == [("a", 6, 0.6, 1), ("b", 3, 0.3, 2), ("c", 1, 0.1, 3)]


def test_skew_report_tie_break_and_top_k(spark):
    rows = [("x",)] * 2 + [("y",)] * 2 + [("z",)] * 5
    df = spark.createDataFrame(rows, "k string")
    got = [(r.key, r.rank) for r in
           skew_report(df, "k", top_k=2).orderBy("rank").collect()]
    # ties rank by key ASC; top_k truncates
    assert got == [("z", 1), ("x", 2)]


def test_cardinality_audit_exact_and_contract(spark):
    rows = [("s1", f"v{i % 7}") for i in range(50)] + [
        ("s2", f"v{i}") for i in range(30)
    ]
    df = spark.createDataFrame(rows, "g string, v string")
    got = {r.grp: (r.exact_distinct, r.within_tol)
           for r in cardinality_audit(df, "g", "v").collect()}
    assert got == {"s1": (7, True), "s2": (30, True)}
