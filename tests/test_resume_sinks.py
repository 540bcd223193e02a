"""Snapshot table commit/resume semantics + export sinks."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from openllm_ocr_annotator_spark.operators.extract import extract_pipeline, lineage_metrics
from openllm_ocr_annotator_spark.sinks.export import (
    doc_json_payload,
    split_column,
    tsv_span_lines,
    write_jsonl,
    write_split_parquet,
    write_tsv_spans,
)
from openllm_ocr_annotator_spark.sources.tables import SnapshotTable
from openllm_ocr_annotator_spark.synth import synthesize_documents

from .conftest import SF_DIR


def test_snapshot_commit_and_resume(spark, tmp_path):
    table = SnapshotTable(spark, str(tmp_path / "tbl"))
    docs = synthesize_documents(spark, SF_DIR).filter(F.col("doc_id") < "doc_0000000050")

    # first run: commit half the docs
    first = docs.filter(F.col("doc_id") < "doc_0000000025")
    out1 = extract_pipeline(first, with_lineage=True)
    # keys = processed inputs: doc_0000000007 yields ZERO spans (empty doc)
    # and must still count as done
    snap1 = table.commit(out1, lineage=lineage_metrics(out1), keys=first.select("doc_id"))
    assert table.latest()["snapshot_id"] == snap1
    assert table.latest()["lineage"], "lineage rows recorded in manifest"

    # resume: only the complement is processed (S4/J3 semantics)
    todo = table.resume_filter(docs, "doc_id")
    todo_ids = {r.doc_id for r in todo.select("doc_id").distinct().collect()}
    done_ids = {r.doc_id for r in first.select("doc_id").collect()}
    all_ids = {r.doc_id for r in docs.select("doc_id").collect()}
    assert todo_ids == all_ids - done_ids

    out2 = extract_pipeline(todo, with_lineage=True)
    snap2 = table.commit(out2, lineage=lineage_metrics(out2), keys=todo.select("doc_id"))
    assert table.latest()["parent"] == snap1 and table.latest()["snapshot_id"] == snap2

    # committed view = union of both snapshots; nothing left to resume
    committed = table.read_committed()
    nonempty = {r.doc_id for r in committed.select("doc_id").distinct().collect()}
    assert table.resume_filter(docs, "doc_id").isEmpty()
    assert nonempty <= all_ids


def test_aborted_write_invisible(spark, tmp_path):
    table = SnapshotTable(spark, str(tmp_path / "tbl"))
    df = spark.range(5).select(F.col("id").cast("string").alias("doc_id"))
    # simulate a crash: data dir written, no manifest
    df.write.parquet(str(tmp_path / "tbl" / "data" / "99999999999999_dead"))
    assert table.read_committed() is None
    table.commit(df)
    assert table.read_committed().count() == 5  # orphan dir still invisible


def test_tsv_spans_ordered(spark, tmp_path):
    docs = synthesize_documents(spark, SF_DIR).limit(20)
    ext = extract_pipeline(docs)
    out = str(tmp_path / "tsv")
    write_tsv_spans(ext, out)
    lines = []
    for f in sorted(os.listdir(out)):
        if f.startswith("part-"):
            lines.extend(open(os.path.join(out, f)).read().splitlines())
    # within each doc, offsets appear in order (K3 span-order invariant)
    seen: dict[str, int] = {}
    for ln in lines:
        doc_id, offset = ln.split("\t")[0], int(ln.split("\t")[1])
        assert seen.get(doc_id, -1) < offset
        seen[doc_id] = offset
    assert len(lines) == ext.count()
    assert tsv_span_lines(ext).columns == ["value"]


def test_jsonl_and_payload_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [("d1", "text", "hello", 0)], "doc_id string, kind string, text string, offset int"
    )
    payload = doc_json_payload(df, ["kind", "text", "offset"])
    row = payload.first()
    assert json.loads(row.payload) == {"kind": "text", "text": "hello", "offset": 0}
    out = str(tmp_path / "jsonl")
    write_jsonl(df, out)
    back = spark.read.json(out)
    assert back.count() == 1 and back.first().doc_id == "d1"


def test_split_deterministic_and_partitioned(spark, tmp_path):
    docs = spark.range(1000).select(F.col("id").alias("doc_id"))
    s1 = docs.select("doc_id", split_column(F.col("doc_id")).alias("split"))
    s2 = docs.select("doc_id", split_column(F.col("doc_id")).alias("split"))
    assert s1.exceptAll(s2).isEmpty()  # pure function of key
    frac = {r.split: r.n for r in s1.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert 0.7 < frac["train"] / 1000 < 0.9
    assert 0.05 < frac["test"] / 1000 < 0.15
    out = str(tmp_path / "ds")
    write_split_parquet(docs, out, key_col="doc_id")
    assert sorted(d for d in os.listdir(out) if d.startswith("split=")) == [
        "split=test", "split=train", "split=validation",
    ]
    # partition pruning works: reading one split returns only that split
    train = spark.read.parquet(out).filter(F.col("split") == "train")
    assert train.count() == frac["train"]


def test_snapshot_table_accepts_uri_scheme_root(spark, tmp_path):
    """The table layer goes through the Hadoop FileSystem API — an explicit
    file:// scheme root must behave identically to a bare path (and hdfs://
    or s3a:// roots resolve through the same code path in production)."""
    from openllm_ocr_annotator_spark.sources.tables import SnapshotTable

    table = SnapshotTable(spark, f"file://{tmp_path}/table")
    df = spark.range(5).selectExpr("CAST(id AS STRING) AS doc_id", "id AS v")
    snap = table.commit(df, keys=df.select("doc_id"))
    assert snap is not None
    assert table.read_committed().count() == 5
    remaining = table.resume_filter(
        spark.range(8).selectExpr("CAST(id AS STRING) AS doc_id"), "doc_id"
    )
    assert remaining.count() == 3
    assert table.latest()["n_rows"] == 5
