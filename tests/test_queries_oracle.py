"""Local replica of the driver's correctness gate.

For every ``queries()`` entry with an ``oracle_sql()`` twin: run the Spark
query and the DuckDB SQL on the same parquet tables at sf0.001 and compare
(row count, column names, order-insensitive values). Non-oracle queries get
a rows-run smoke check.
"""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

from .conftest import SF_DIR

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def _norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    if isinstance(v, bool):
        return bool(v)
    return v


def _canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in order) for r in rows)


ORACLE_NAMES = sorted(entry_mod.oracle_sql().keys())
ALL_NAMES = sorted(entry_mod.queries().keys())


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_query_matches_duckdb_oracle(spark, duck, name):
    from openllm_ocr_annotator_spark.queries_catalog import (
        GOLDEN_ORACLE_QUERIES,
        GOLDEN_ORACLE_SF,
    )

    if name in GOLDEN_ORACLE_QUERIES and SF_DIR.rstrip("/") != GOLDEN_ORACLE_SF:
        # golden parquet pins the driver's sf0.01 gate; at this module's
        # fast-smoke scale the value compare is meaningless — rows-only,
        # the full compare runs in scripts/verify_contract.py at sf0.01
        assert entry_mod.queries()[name](spark, SF_DIR).count() > 0
        return
    q = entry_mod.queries()[name]
    sdf = q(spark, SF_DIR)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]

    res = duck.execute(entry_mod.oracle_sql()[name])
    d_cols = [c[0] for c in res.description]
    d_rows = res.fetchall()

    assert sorted(s_cols) == sorted(d_cols), f"{name}: column mismatch"
    assert len(s_rows) == len(d_rows), f"{name}: row count {len(s_rows)} != {len(d_rows)}"
    assert _canon(s_rows, s_cols) == _canon(d_rows, d_cols), f"{name}: value mismatch"


@pytest.mark.parametrize(
    "name", [n for n in ALL_NAMES if n not in set(ORACLE_NAMES)]
)
def test_non_oracle_query_runs(spark, name):
    q = entry_mod.queries()[name]
    df = q(spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.columns) > 0


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
