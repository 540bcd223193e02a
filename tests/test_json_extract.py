"""JSON extraction chain pinned to the reference's formatter expectations
(reference: tests/utils/test_formatter.py:34-62,118-121)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from openllm_ocr_annotator_spark.functions.json_extract import (
    extract_json_str,
    parse_result,
    remove_comments,
)

RESULT_SCHEMA = (
    "struct<fields: array<struct<field_name string, value string, confidence double>>>"
)


def _extract(spark, texts):
    df = spark.createDataFrame([(t,) for t in texts], "raw string")
    return [r.j for r in df.select(extract_json_str(F.col("raw")).alias("j")).collect()]


def test_markdown_json_block(spark):
    text = 'prefix\n```json\n{"fields": []}\n```\nsuffix'
    (got,) = _extract(spark, [text])
    assert json.loads(got) == {"fields": []}


def test_bare_fence_block(spark):
    text = '```\n{"a": 1}\n```'
    (got,) = _extract(spark, [text])
    assert json.loads(got) == {"a": 1}


def test_comments_stripped(spark):
    text = '```json\n{// line comment\n "a": 1 /* block */ }\n```'
    (got,) = _extract(spark, [text])
    assert json.loads(got) == {"a": 1}


def test_whole_text_fallback(spark):
    (got,) = _extract(spark, ['{"b": 2}'])
    assert json.loads(got) == {"b": 2}


def test_think_prefix_brace_scan(spark):
    text = '<think>reasoning {not json} more</think> answer: {"c": 3}'
    (got,) = _extract(spark, [text])
    assert json.loads(got) == {"c": 3}


def test_invalid_gives_null(spark):
    (got,) = _extract(spark, ["no json here at all"])
    assert got is None


def test_parse_result_typed(spark):
    text = '```json\n{"fields": [{"field_name": "x", "value": "1", "confidence": 0.5}]}\n```'
    df = spark.createDataFrame([(text,)], "raw string")
    row = df.select(parse_result(F.col("raw"), RESULT_SCHEMA).alias("r")).first().r
    assert row.fields[0].field_name == "x"
    assert row.fields[0].confidence == 0.5


def test_remove_comments_expression(spark):
    df = spark.createDataFrame([('{"a": 1} // tail\n/* block */ rest',)], "s string")
    got = df.select(remove_comments(F.col("s")).alias("c")).first().c
    assert "//" not in got and "/*" not in got
    assert '{"a": 1}' in got


def test_url_values_null_like_the_reference(spark):
    """Faithful quirk (formatter.py:22 + :57): remove_comments' '//.*$'
    regex is string-blind, so a JSON value containing '//' (URLs, file
    paths) is truncated to invalid JSON at EVERY step — fenced, whole-text,
    and the brace scan (the reference re-strips before scanning). The
    reference replay below proves parity: both engines null the row rather
    than one 'fixing' it divergently."""
    import re

    def ref_parse(text):  # formatter.py:28-68, replayed
        def rm(s):
            s = re.sub(r"//.*$", "", s, flags=re.MULTILINE)
            return re.sub(r"/\*.*?\*/", "", s, flags=re.DOTALL)

        m = re.search(r"```(?:json)?\n(.*?)\n```", text, re.DOTALL)
        if m:
            try:
                return json.loads(rm(m.group(1)))
            except json.JSONDecodeError:
                pass
        try:
            return json.loads(rm(text))
        except json.JSONDecodeError:
            pass
        dec = json.JSONDecoder()
        clean = rm(text)
        for i, ch in enumerate(clean):
            if ch != "{":
                continue
            try:
                parsed, _ = dec.raw_decode(clean[i:])
                if isinstance(parsed, dict):
                    return parsed
            except json.JSONDecodeError:
                continue
        return {}

    url_payload = '{"url": "http://x.com/a", "v": 1}'
    assert ref_parse(url_payload) == {}, "reference nulls URL-bearing JSON"
    got = _extract(spark, [url_payload, '<think>…</think> ' + url_payload])
    assert got == [None, None], "engine must replicate the reference quirk"
    # sanity: the same payload WITHOUT '//' parses fine in both
    ok = '{"path": "x.com/a", "v": 1}'
    assert ref_parse(ok) == {"path": "x.com/a", "v": 1}
    assert json.loads(_extract(spark, [ok])[0]) == {"path": "x.com/a", "v": 1}
