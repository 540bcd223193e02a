"""Query catalog: the driver-facing inventory of implemented operators.

Each ``QUERIES[name]`` is a callable ``(spark, sf_dir) -> DataFrame``;
``ORACLES[name]`` is equivalent DuckDB SQL over the same parquet tables
(views: region nation customer supplier part orders lineitem events
documents embeddings). Names map to SURVEY.md §2 operator ids in each
docstring. Every computed column is aliased identically on both sides
(driver hash-compares by sorted column name).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import synth
from .operators import extract

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def _q(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# ---------------------------------------------------------------------------
# Extraction (U1 replacement) — non-SQL kernel → rows-only driver check;
# span-sequence equality is pinned by tests/test_extract_e2e.py.
# ---------------------------------------------------------------------------


@_q("extract_spans")
def q_extract_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1/S1/K3: synthesize north-rule span docs → vectorized extraction →
    ordered (doc_id, kind, text, media_ref, offset) spans."""
    docs = synth.synthesize_documents(spark, sf_dir)
    return extract.extract_spans(docs)


@_q("extract_lineage")
def q_extract_lineage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§4.2 lineage: per-partition (doc_count, span_count, checksum) rows."""
    docs = synth.synthesize_documents(spark, sf_dir)
    out = extract.extract_pipeline(docs, num_partitions=8, with_lineage=True)
    return extract.lineage_metrics(out)


# ---------------------------------------------------------------------------
# Scans / limits / filters (S1, S2, P1, O1, W4)
# ---------------------------------------------------------------------------


@_q(
    "scan_limit",
    """
    SELECT doc_id, lang, source, n_chars
    FROM documents ORDER BY doc_id LIMIT 50
    """,
)
def q_scan_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1+S2/W4: deterministic ordered scan + head-N (reference:
    utils/file_utils.py:66, pipeline/run_annotation.py:36-44)."""
    return (
        _docs(spark, sf_dir)
        .select("doc_id", "lang", "source", "n_chars")
        .orderBy("doc_id")
        .limit(50)
    )


@_q(
    "source_filter",
    """
    SELECT source, count(*) AS n_docs, sum(n_chars) AS total_chars
    FROM documents
    WHERE lower(source) IN ('src0', 'src1', 'src2')
    GROUP BY source
    """,
)
def q_source_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1: extension-set predicate analog (reference: utils/file_utils.py:42-53)."""
    return (
        _docs(spark, sf_dir)
        .filter(F.lower("source").isin("src0", "src1", "src2"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n_chars").alias("total_chars"))
    )


@_q(
    "sample_explode",
    """
    SELECT d.doc_id, s.sample_id
    FROM documents d, (SELECT unnest(generate_series(0, 2)) AS sample_id) s
    WHERE d.doc_id < 100
    """,
)
def q_sample_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3/J5: docs × sample_id lateral expansion (reference:
    pipeline/image_dataset.py:40-42)."""
    return (
        _docs(spark, sf_dir)
        .filter(F.col("doc_id") < 100)
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(0).cast("long"), F.lit(2).cast("long"))).alias("sample_id"),
        )
    )


@_q(
    "resume_anti_join",
    """
    SELECT d.doc_id, d.n_chars
    FROM documents d
    WHERE d.doc_id NOT IN (SELECT doc_id FROM documents WHERE doc_id % 3 = 0)
    """,
)
def q_resume_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4/J3: skip-cached resume as a left anti-join vs the committed set
    (reference: pipeline/image_dataset.py:43-47)."""
    docs = _docs(spark, sf_dir)
    committed = docs.filter(F.col("doc_id") % 3 == 0).select("doc_id")
    return docs.join(committed, "doc_id", "left_anti").select("doc_id", "n_chars")


@_q(
    "sample_gate",
    """
    WITH samples AS (
      SELECT d.doc_id, s.sample_id
      FROM documents d, (SELECT unnest(generate_series(0, 2)) AS sample_id) s
      WHERE (d.doc_id + s.sample_id) % 5 <> 0
    )
    SELECT doc_id, count(*) AS n_samples
    FROM samples GROUP BY doc_id HAVING count(*) = 3
    """,
)
def q_sample_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4: all-samples-present gate — reuse cache only when every expected
    sample exists (reference: pipeline/annotator_processor.py:204-218)."""
    samples = (
        _docs(spark, sf_dir)
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(0).cast("long"), F.lit(2).cast("long"))).alias("sample_id"),
        )
        .filter((F.col("doc_id") + F.col("sample_id")) % 5 != 0)
    )
    return (
        samples.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_samples"))
        .filter(F.col("n_samples") == 3)
    )
