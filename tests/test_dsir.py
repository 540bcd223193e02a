"""DSIR importance resampling: kernel semantics + Spark parity + enrichment."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from openllm_ocr_annotator_spark.kernel import dsir as D
from openllm_ocr_annotator_spark.operators.dsir import (
    dsir_select,
    importance_weights,
    train_importance_model,
)


def test_ngram_dist_is_a_distribution():
    logp = D.train_ngram_dist(["a b c", "b c d"], n_buckets=256)
    assert abs(float(np.exp(logp).sum()) - 1.0) < 1e-9
    # empty training still yields the uniform (Laplace floor) distribution
    logu = D.train_ngram_dist([], n_buckets=256)
    assert np.allclose(logu, math.log(1.0 / 256))


def test_log_importance_sparse_fold_matches_dense():
    texts = ["spark shuffles partitions", "ducks quack loudly", ""]
    logp = D.train_ngram_dist([texts[0]], n_buckets=512)
    logq = D.train_ngram_dist(texts, n_buckets=512)
    diff = logp - logq
    for t in texts:
        idx, counts = D.ngram_bucket_counts(t, 512)
        dense = float(sum(diff[i] * c for i, c in zip(idx, counts)))
        assert D.log_importance(t, diff) == pytest.approx(dense, abs=1e-12)
    assert D.log_importance("", diff) == 0.0


def test_gumbel_key_pure_and_distinct():
    a = D.gumbel_key("doc_1", seed=42)
    assert a == D.gumbel_key("doc_1", seed=42)  # pure function
    assert a != D.gumbel_key("doc_2", seed=42)
    assert a != D.gumbel_key("doc_1", seed=43)
    keys = [D.gumbel_key(str(i)) for i in range(2000)]
    assert all(math.isfinite(k) for k in keys)
    # Gumbel(0,1): mean ≈ Euler–Mascheroni γ, sd ≈ π/√6
    assert abs(np.mean(keys) - 0.5772) < 0.1
    assert abs(np.std(keys) - math.pi / math.sqrt(6)) < 0.1


def test_spark_weights_match_kernel_replay(spark):
    rows = [
        (i, f"src{i % 4}", "alpha beta gamma " * (i % 5 + 1) + f"tok{i}")
        for i in range(40)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    diff = train_importance_model(
        docs, F.col("source") == "src0", sample_docs=40, n_buckets=1 << 10
    )
    got = {
        r.doc_id: (r.log_w, r.sel_key)
        for r in importance_weights(docs.repartition(7), diff, seed=7).collect()
    }
    for i, _, text in rows:
        lw = D.log_importance(text, diff)
        assert got[i] == (lw, lw + D.gumbel_key(str(i), 7))  # exact, not approx


def test_dsir_select_enriches_planted_target_domain(spark):
    """With a distinctive target vocabulary the likelihood ratio must
    dominate the Gumbel noise: ≥90% of selections come from the 25%
    target-style slice (the synthetic sf corpus shares one vocabulary
    across sources, so the driver query can't show this — this test
    plants real domain signal)."""
    target_text = "theorem lemma proof corollary axiom induction "
    noise_text = "click buy now offer deal discount shop cart "
    rows = []
    for i in range(200):
        style = target_text if i % 4 == 0 else noise_text
        rows.append((i, "curated" if i % 8 == 0 else "crawl", style * 4 + f"doc{i}"))
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    sel = dsir_select(
        docs, F.col("source") == "curated", k=40, sample_docs=200, n_buckets=1 << 12
    ).collect()
    assert len(sel) == 40
    target_style = {i for i in range(200) if i % 4 == 0}
    hits = sum(1 for r in sel if r.doc_id in target_style)
    assert hits >= 36, f"only {hits}/40 selections from the planted target style"


def test_importance_weights_rejects_column_collisions(spark):
    docs = spark.createDataFrame(
        [(1, "x", 0.0)], "doc_id long, text string, log_w double"
    )
    with pytest.raises(ValueError, match="log_w"):
        importance_weights(docs, np.zeros(16))
