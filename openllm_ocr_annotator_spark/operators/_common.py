"""Shared physical-plan helpers for operator modules."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_partitions(df: DataFrame, *keys: str) -> DataFrame:
    """Ensure a CPU-heavy stage has at least shuffle.partitions partitions.

    Small-byte inputs (one parquet file, a narrow projection) arrive as a
    single scan split, which would serialize any Python kernel downstream on
    one core — AQE coalesces by bytes, not CPU cost. One cheap row shuffle
    up front parallelizes the whole map side. No-op when the scan already
    has enough splits (the 100 TB case: thousands of file splits).
    """
    n_part = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    if df.rdd.getNumPartitions() < n_part:
        df = df.repartition(n_part, *keys) if keys else df.repartition(n_part)
    return df


def schema_ddl(df: DataFrame, *, drop: tuple[str, ...] = (), add: str = "") -> str:
    """DDL output-schema string for a Pandas-UDF stage: the input fields
    minus ``drop``, plus the ``add`` suffix (``"name type, ..."``). The one
    shared builder for every mapInPandas/applyInPandas site — names are
    backtick-quoted so columns with spaces/dots survive, and an escaping
    fix lands everywhere at once instead of in five hand-rolled copies."""
    cols = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in df.schema.fields
        if f.name not in drop
    )
    return f"{cols}, {add}" if add else cols
