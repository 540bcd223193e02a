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
