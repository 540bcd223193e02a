"""The flagship operator: vectorized span extraction (U1 replacement).

Replaces the reference's per-image LLM ``annotate`` loop
(reference: src/openllm_ocr_annotator/pipeline/curator_processor.py:138-168,
annotators/base.py:73-75) with one ``mapInPandas`` kernel: per Arrow batch,
loop documents, run the pure-Python DOM/layout kernel, emit ordered
``(doc_id, kind, text, media_ref, offset)`` rows.

Scale design (the part that matters at 100 TB):
- the kernel is embarrassingly parallel per document → NO shuffle is needed
  for extraction itself; partitioning comes straight from the parquet/Iceberg
  scan splits;
- heavy-tail mega-docs are the skew hazard: ``salted_repartition`` spreads
  documents uniformly across partitions (round-robin hash on doc_id + salt)
  BEFORE the CPU-heavy kernel, so one scan split full of mega-docs can't
  straggle; ``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds batch
  memory (one doc is the floor unit — documented limit);
- lineage: every output row carries the executing partition id;
  ``lineage_metrics`` aggregates (doc_count, span_count, checksum) per
  partition JVM-side (xxhash64 + bit_xor — order-insensitive), giving the
  per-partition audit trail the reference lacks (its acknowledged gap:
  /root/reference/docs/architecture.md:259).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..kernel.merge import extract_document

EXTRACTED_SCHEMA = "doc_id string, kind string, text string, media_ref string, offset int"


def salted_repartition(docs: DataFrame, num_partitions: int, salt_buckets: int = 8) -> DataFrame:
    """Spread documents across partitions, breaking up clustered mega-docs.

    Hash-repartition on (doc_id, salt) where salt = crc32(doc_id) % buckets:
    deterministic, uniform, and independent of the scan's file layout. At
    cluster scale replace ``num_partitions`` with ~2-3× total cores.
    """
    salted = docs.withColumn(
        "_salt", F.crc32(F.col("doc_id").cast("string")) % F.lit(salt_buckets)
    )
    return salted.repartition(num_partitions, "doc_id", "_salt").drop("_salt")


def extract_spans(docs: DataFrame) -> DataFrame:
    """documents(doc_id, spans) → ordered extracted spans (exploded rows).

    Narrow (no shuffle): one mapInPandas stage over the scan partitioning.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_doc: list[str] = []
            out_kind: list[str] = []
            out_text: list[str] = []
            out_ref: list[str] = []
            out_off: list[int] = []
            for doc_id, spans in zip(pdf["doc_id"], pdf["spans"]):
                span_list = list(spans) if spans is not None else []
                for item in extract_document(span_list):
                    out_doc.append(doc_id)
                    out_kind.append(item["kind"])
                    out_text.append(item["text"])
                    out_ref.append(item["media_ref"])
                    out_off.append(item["offset"])
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out_doc, dtype="object"),
                    "kind": pd.Series(out_kind, dtype="object"),
                    "text": pd.Series(out_text, dtype="object"),
                    "media_ref": pd.Series(out_ref, dtype="object"),
                    "offset": pd.Series(out_off, dtype="int32"),
                }
            )

    return docs.select("doc_id", "spans").mapInPandas(kernel, schema=EXTRACTED_SCHEMA)


def extract_pipeline(
    docs: DataFrame,
    num_partitions: int | None = None,
    with_lineage: bool = True,
) -> DataFrame:
    """Salted-repartition → extract → (optionally) tag partition lineage."""
    if num_partitions:
        docs = salted_repartition(docs, num_partitions)
    out = extract_spans(docs)
    if with_lineage:
        out = out.withColumn("part_id", F.spark_partition_id())
    return out


def lineage_metrics(extracted: DataFrame) -> DataFrame:
    """Per-partition lineage rows: (partition_id, doc_count, span_count, checksum).

    Checksum = bit_xor of xxhash64 over the full output row — order- and
    partition-layout-insensitive, so two runs with different parallelism
    produce identical per-doc checksums when re-aggregated globally.
    """
    src = extracted
    if "part_id" not in src.columns:
        src = src.withColumn("part_id", F.spark_partition_id())
    row_hash = F.xxhash64("doc_id", "kind", "text", "media_ref", "offset")
    return src.groupBy(F.col("part_id").alias("partition_id")).agg(
        F.countDistinct("doc_id").alias("doc_count"),
        F.count(F.lit(1)).alias("span_count"),
        F.bit_xor(row_hash).alias("checksum"),
    )


def renest_spans(extracted: DataFrame) -> DataFrame:
    """Exploded rows → documents(doc_id, spans) with order restored.

    ``sort_array`` on (offset, …) rebuilds the sequence without a
    per-document sort shuffle beyond the groupBy itself.
    """
    span = F.struct("offset", "kind", "text", "media_ref")
    return (
        extracted.groupBy("doc_id")
        .agg(F.sort_array(F.collect_list(span)).alias("_s"))
        .select(
            "doc_id",
            F.transform(
                "_s",
                lambda s: F.struct(
                    s["kind"].alias("kind"),
                    s["text"].alias("text"),
                    s["media_ref"].alias("media_ref"),
                    s["offset"].alias("offset"),
                ),
            ).alias("spans"),
        )
    )
