"""Matcher semantics pinned to the reference's literal test expectations
(reference: tests/utils/test_field_matcher.py, via FIXTURES.md §4), evaluated
through Spark AND through the shared SQL template in DuckDB (parity check).
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from openllm_ocr_annotator_spark.functions import matchers as M

DATE_CASES = [
    ("2024-01-15", "2024-01-15", True),
    ("2024-01-15", "2024-01-16", False),
    ("2024/01/15", "2024/01/15", True),
    ("15-01-2024", "15-01-2024", True),
    ("2024-01-15", "2024/01/15", False),  # different formats never match
    ("not-a-date", "not-a-date", False),  # no format parses → False
]

NUMERIC_CASES = [  # tolerance 0.0 unless noted
    ("1,000", "1000", 0.0, True),
    ("10.0", "10.05", 0.1, True),
    ("10.0", "10.2", 0.1, False),
    ("N/A", "N/A", 0.0, True),  # parse fail → exact fallback
    ("N/A", "0", 0.0, False),
    ("12", "twelve", 0.0, False),
]

CURRENCY_CASES = [  # tolerance 0.01
    ("1,234.56 USD", "1234.56 USD", True),
    ("1.234,56 EUR", "1234.56 EUR", True),
    ("USD 1234.56", "1,234.56 USD", True),
    ("100 USD", "100 EUR", False),  # both codes present, mismatch
    ("N/A", "0 USD", True),  # N/A → amount 0.0, no code
    ("1234,56", "1234.56", True),  # single decimal comma
    ("1,234", "1234", True),  # single thousands comma
    ("85,600.00 USD", "85600.0", True),  # code on one side only
    ("1234.56USD", "1234.56 USD", True),
]


@pytest.fixture(scope="module")
def matcher_eval(spark):
    def run(expr_builder, cases3):
        df = spark.createDataFrame(
            [(g, p) for g, p, *_ in cases3], "gt string, pred string"
        )
        col = expr_builder(F.col("gt"), F.col("pred"))
        return [r.m for r in df.select(col.alias("m")).collect()]

    return run


def test_exact_and_ci(matcher_eval):
    assert matcher_eval(M.exact_match, [("a", "a", 1), ("a", "A", 0)]) == [True, False]
    assert matcher_eval(M.ci_match, [("a", "A", 1), ("a", "b", 0)]) == [True, False]


def test_date_matcher_spark(matcher_eval):
    got = matcher_eval(M.date_match, DATE_CASES)
    assert got == [want for _, _, want in DATE_CASES]


def test_date_matcher_duckdb_parity():
    con = duckdb.connect()
    for g, p, want in DATE_CASES:
        sql = M.date_match_duckdb_sql(f"'{g}'", f"'{p}'")
        assert con.execute(f"select {sql}").fetchone()[0] == want, (g, p)


@pytest.mark.parametrize("g,p,tol,want", NUMERIC_CASES)
def test_numeric_matcher_both_engines(spark, g, p, tol, want):
    df = spark.createDataFrame([(g, p)], "gt string, pred string")
    got = df.select(M.numeric_match(F.col("gt"), F.col("pred"), tol).alias("m")).first().m
    assert got == want, f"spark: {g} vs {p}"
    sql = M.render(M.NUMERIC_SQL, f"'{g}'", f"'{p}'", tol)
    assert duckdb.sql(f"select {sql}").fetchone()[0] == want, f"duckdb: {g} vs {p}"


@pytest.mark.parametrize("g,p,want", CURRENCY_CASES)
def test_currency_matcher_both_engines(spark, g, p, want):
    df = spark.createDataFrame([(g, p)], "gt string, pred string")
    got = df.select(M.currency_match(F.col("gt"), F.col("pred")).alias("m")).first().m
    assert got == want, f"spark: {g} vs {p}"
    sql = M.render(M.CURRENCY_SQL, f"'{g}'", f"'{p}'", 0.01)
    assert duckdb.sql(f"select {sql}").fetchone()[0] == want, f"duckdb: {g} vs {p}"


def test_dispatch_registry(spark):
    rows = [
        ("contract_date", "2024-01-15", "2024-01-15", True),
        ("contract_date", "2024-01-15", "2024/01/15", False),
        ("transaction_amount", "1.234,56 EUR", "1234.56 EUR", True),
        ("buyer_name", "ACME", "acme", False),  # default exact
        ("buyer_name", "ACME", "ACME", True),
    ]
    df = spark.createDataFrame(
        [(f, g, p) for f, g, p, _ in rows], "field_name string, gt string, pred string"
    )
    col = M.dispatch_match(F.col("field_name"), F.col("gt"), F.col("pred"))
    got = [r.m for r in df.select(col.alias("m")).collect()]
    assert got == [w for *_, w in rows]
