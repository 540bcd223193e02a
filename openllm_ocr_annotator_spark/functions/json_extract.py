"""LLM-output JSON extraction chain (SURVEY §2.4 U2/U3/U5).

Reference semantics (src/openllm_ocr_annotator/utils/formatter.py:28-68):
1. prefer a fenced markdown block ```json ... ``` (or bare ```), comments
   stripped, parsed as JSON;
2. else parse the whole text (comments stripped);
3. else scan the COMMENT-STRIPPED text for the first decodable '{...}'
   object (formatter.py:57 strips again before the scan — reasoning
   models prepend '<think>…' prose);
4. else empty object.

Faithful quirk, every step: ``remove_comments``'s ``//.*$`` regex does not
know about strings, so a JSON value containing '//' (URLs, file paths) is
truncated to invalid JSON and the row nulls — the reference mangles such
payloads identically at all three steps, and this engine replicates it
rather than "fixing" divergently (same class as the P4 falsy filter).

Spark mapping: steps 1-2 are pure expressions (`regexp_extract` +
`from_json` + `coalesce`); step 3 is inherently iterative → an
Arrow-batched pandas UDF that returns the first decodable JSON *substring*
(so the typed parse still happens JVM-side via `from_json` with the caller's
schema — Python only slices strings, never builds rows).
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

# Fenced block: ```json\n...\n``` or ```\n...\n```  (formatter.py:40)
FENCE_RE = r"(?s)```(?:json)?\n(.*?)\n```"
LINE_COMMENT_RE = r"(?m)//.*$"
BLOCK_COMMENT_RE = r"(?s)/\*.*?\*/"


def remove_comments(col: Column) -> Column:
    """U3: strip C-style // and /* */ comments (formatter.py:12-25)."""
    return F.regexp_replace(F.regexp_replace(col, BLOCK_COMMENT_RE, ""), LINE_COMMENT_RE, "")


def _scan_first_json(text: str | None) -> str | None:
    decoder = json.JSONDecoder()
    if not text:
        return None
    for i, ch in enumerate(text):
        if ch != "{":
            continue
        try:
            parsed, end = decoder.raw_decode(text[i:])
        except json.JSONDecodeError:
            continue
        if isinstance(parsed, dict):
            return text[i : i + end]
    return None


def first_decodable_json(col: Column) -> Column:
    """Step-3 fallback: first decodable '{...}' substring, else NULL.

    pandas UDF created lazily (DDL type parsing needs an active session).
    """

    @F.pandas_udf("string")
    def scan_udf(texts: pd.Series) -> pd.Series:
        return texts.map(_scan_first_json)

    return scan_udf(col)


def extract_json_str(col: Column) -> Column:
    """Raw text → best-effort JSON string (comment-stripped), NULL if none.

    The caller applies ``from_json(result, schema)`` — keeping the typed
    parse in the JVM. `get_json_object(x, '$')` is the cheap JVM-side
    validity probe standing in for Python's json.loads success check.
    """
    fenced = remove_comments(F.regexp_extract(col, FENCE_RE, 1))
    whole = remove_comments(col)
    valid = lambda c: F.when(  # noqa: E731
        (c != "") & F.get_json_object(c, "$").isNotNull(), c
    )
    # the pandas-UDF node evaluates for every row no matter where it sits in
    # the coalesce — so feed it NULL on rows steps 1-2 already satisfied;
    # the Python scan then costs O(1) except on genuine fallback rows
    fallback_input = F.when(
        valid(fenced).isNull() & valid(whole).isNull(), whole
    )
    scanned = first_decodable_json(fallback_input)
    return F.coalesce(valid(fenced), valid(whole), valid(scanned))


def parse_result(col: Column, schema: str) -> Column:
    """U2+U4: full chain → typed struct; NULL when nothing decodable."""
    return F.from_json(extract_json_str(col), schema)
