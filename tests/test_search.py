"""BM25 lexical retrieval vs hand-computed scores."""

from __future__ import annotations

import math

import pytest

from openllm_ocr_annotator_spark.operators.search import bm25_search


def _bm25_term(tf, df, n, dl, avgdl, k1=1.2, b=0.75):
    # EXACT operation order of the operator's column expression
    idf = math.log(1.0 + ((n - df) + 0.5) / (df + 0.5))
    return (idf * (tf * (k1 + 1.0))) / (tf + k1 * ((1.0 - b) + (b * dl) / avgdl))


def test_bm25_hand_computed(spark):
    docs = spark.createDataFrame(
        [
            (1, "apple banana apple"),
            (2, "apple cherry"),
            (3, "cherry cherry cherry cherry"),
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r
        for r in bm25_search(docs, ["apple", "banana"], max_df_frac=1.0).collect()
    }
    n, avgdl = 3, 3.0
    want1 = _bm25_term(2, 2, n, 3, avgdl) + _bm25_term(1, 1, n, 3, avgdl)
    want2 = _bm25_term(1, 2, n, 2, avgdl)
    assert 3 not in got  # no query term → excluded
    assert got[1].n_hit_terms == 2 and got[2].n_hit_terms == 1
    assert got[1].score == pytest.approx(want1, rel=1e-12)
    assert got[2].score == pytest.approx(want2, rel=1e-12)
    # higher-tf, rarer-term doc must outrank the single-common-term doc
    assert got[1].score > got[2].score


def test_bm25_df_cap_drops_stopword_posting(spark):
    docs = spark.createDataFrame(
        [(i, "common " + ("rare" if i == 0 else "filler")) for i in range(10)],
        "doc_id long, text string",
    )
    # 'common' in 10/10 docs → df 1.0 > 0.5 cap → only 'rare' scores
    got = bm25_search(docs, ["common", "rare"], max_df_frac=0.5).collect()
    assert [r.doc_id for r in got] == [0]
    assert got[0].n_hit_terms == 1


def test_bm25_top_k_and_ties(spark):
    docs = spark.createDataFrame(
        [(i, "needle haystack") for i in range(5)] + [(99, "haystack only")],
        "doc_id long, text string",
    )
    got = bm25_search(docs, ["needle"], top_k=3, max_df_frac=1.0).collect()
    # identical scores → id ASC tie-break, deterministic top-k
    assert [r.doc_id for r in got] == [0, 1, 2]
    with pytest.raises(ValueError, match="query_terms"):
        bm25_search(docs, [])


def test_bm25_duplicate_query_terms_collapse(spark):
    docs = spark.createDataFrame([(1, "x y")], "doc_id long, text string")
    a = bm25_search(docs, ["x", "x", "X"], max_df_frac=1.0).collect()
    b = bm25_search(docs, ["x"], max_df_frac=1.0).collect()
    assert a[0].score == b[0].score and a[0].n_hit_terms == 1
