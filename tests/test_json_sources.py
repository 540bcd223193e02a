"""S5/S6/S7 JSON loading: stem attach, corrupt tolerance, leg fan-in.

Pins the reference's loader semantics (voters/manager.py:35-97 missing-file
skip, dataset_converter.py:21-46 corrupt-file skip + filename attach,
formatter.py:84-108 jsonl) on the Spark reader.
"""

from __future__ import annotations

import json

from pyspark.sql import types as T

from openllm_ocr_annotator_spark.sources.json_load import (
    ANNOTATION_SCHEMA,
    corrupt_count,
    load_annotation_legs,
    read_json_docs,
    read_jsonl,
)


def _write_annotation(path, stem: str, fields: list[tuple[str, str, float]]):
    payload = {
        "result": {
            "fields": [
                {"field_name": n, "value": v, "confidence": c} for n, v, c in fields
            ]
        },
        "model": "m0",
        "task": "t0",
    }
    (path / f"{stem}.json").write_text(json.dumps(payload, indent=2))


def test_read_json_docs_attaches_stem_and_skips_corrupt(spark, tmp_path):
    d = tmp_path / "voted"
    d.mkdir()
    _write_annotation(d, "doc_a", [("invoice_number", "INV-1", 0.9)])
    _write_annotation(d, "doc_b", [("invoice_number", "INV-2", 0.8)])
    (d / "broken.json").write_text("{not valid json at all")

    df = read_json_docs(spark, str(d), ANNOTATION_SCHEMA)
    rows = {r.doc_id: r for r in df.collect()}
    assert set(rows) == {"doc_a", "doc_b"}
    assert rows["doc_a"].result.fields[0].value == "INV-1"
    assert rows["doc_a"].filename.endswith("doc_a.json")
    assert corrupt_count(spark, str(d), ANNOTATION_SCHEMA) == 1


def test_load_annotation_legs_skips_missing_dir(spark, tmp_path):
    a0 = tmp_path / "ann0"
    a0.mkdir()
    _write_annotation(a0, "doc_a", [("f", "x", 1.0)])
    _write_annotation(a0, "doc_b", [("f", "y", 1.0)])
    a1 = tmp_path / "ann1"
    a1.mkdir()
    _write_annotation(a1, "doc_a", [("f", "x", 0.5)])

    legs = {
        "ann0": str(a0),
        "ann1": str(a1),
        "ann_missing": str(tmp_path / "nope"),
    }
    df = load_annotation_legs(spark, legs)
    got = {(r.annotator_id, r.doc_id) for r in df.collect()}
    assert got == {("ann0", "doc_a"), ("ann0", "doc_b"), ("ann1", "doc_a")}

    # all legs missing → empty frame with the full column set
    empty = load_annotation_legs(spark, {"a": str(tmp_path / "gone")})
    assert empty.count() == 0
    assert {"result", "doc_id", "annotator_id", "filename"} <= set(empty.columns)


def test_read_jsonl_skips_bad_lines(spark, tmp_path):
    p = tmp_path / "data.jsonl"
    p.write_text('{"k": "a"}\n\nnot-json\n{"k": "b"}\n')
    schema = T.StructType([T.StructField("k", T.StringType())])
    got = sorted(r.k for r in read_jsonl(spark, str(p), schema).collect())
    assert got == ["a", "b"]


def test_read_json_docs_stem_decodes_uri_encoding(spark, tmp_path):
    """input_file_name() returns a URI-encoded path: 'invoice 001.json'
    surfaces as .../invoice%20001.json. The stem must decode back to the
    reference's Path.stem ('invoice 001') or every stem-keyed join of
    annotator legs / ground truth silently drops such docs. Literal '+'
    must survive (URI encoding leaves it bare; form decoding would turn
    it into a space)."""
    d = tmp_path / "voted"
    d.mkdir()
    _write_annotation(d, "invoice 001", [("invoice_number", "INV-1", 0.9)])
    _write_annotation(d, "a+b", [("invoice_number", "INV-2", 0.8)])
    _write_annotation(d, "naïve-doc", [("invoice_number", "INV-3", 0.7)])
    out = read_json_docs(spark, str(d / "*.json"), ANNOTATION_SCHEMA)
    # project a data column too: a corrupt-filter-only scan that reads no
    # declared field trips Spark's QUERY_ONLY_CORRUPT_RECORD_COLUMN rule
    stems = {r.doc_id for r in out.select("doc_id", "model").collect()}
    assert stems == {"invoice 001", "a+b", "naïve-doc"}
