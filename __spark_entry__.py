"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship extraction pipeline on sf0.001.
``queries()`` — one entry per implemented operator (SURVEY.md §2).
``oracle_sql()`` — DuckDB-equivalent SQL for every SQL-expressible query.

Non-SQL-expressible entries (the extraction kernel itself, LSH/minhash
signatures) intentionally have no oracle — the driver records a rows-only
check and pytest covers them against pure-Python oracles
(tests/test_extract_e2e.py, tests/test_dedup.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from openllm_ocr_annotator_spark import queries_catalog


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: synthesize the north-rule span table from sf0.001
    documents, run the vectorized extraction kernel, return ordered spans."""
    return queries_catalog.q_extract_spans(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return queries_catalog.QUERIES


def oracle_sql() -> dict[str, str]:
    return queries_catalog.ORACLES
