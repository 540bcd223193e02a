"""operators/drift.py: per-term KL / TV distribution-drift contributions."""

from __future__ import annotations

import math

from openllm_ocr_annotator_spark.operators.drift import (
    distribution_drift,
    token_counts,
)


def _docs(spark, texts):
    return spark.createDataFrame([(t,) for t in texts], "text string")


def test_token_counts_basis(spark):
    got = {r.term: r.n for r in token_counts(_docs(spark, ["A  a b", "b C"])).collect()}
    assert got == {"a": 2, "b": 2, "c": 1}


def test_distribution_drift_hand_computed(spark):
    """cand = ['a a b'], ref = ['a c']: Laplace-smoothed p/q over the
    3-term union vocabulary, micro-nat scaling."""
    out = {
        r.term: r
        for r in distribution_drift(
            _docs(spark, ["a a b"]), _docs(spark, ["a c"])
        ).collect()
    }
    # Tc=3, Tr=2, V=3
    exp = {
        "a": (2, 1, 3 / 6, 2 / 5),
        "b": (1, 0, 2 / 6, 1 / 5),
        "c": (0, 1, 1 / 6, 2 / 5),
    }
    for term, (nc, nr, p, q) in exp.items():
        r = out[term]
        assert (r.n_cand, r.n_ref) == (nc, nr)
        assert math.isclose(r.kl_contrib, 1e6 * p * math.log(p / q), rel_tol=1e-12)
        assert math.isclose(r.tv_contrib, 1e6 * abs(p - q) / 2, rel_tol=1e-12)
    # KL(p||q) over the full vocabulary is non-negative
    assert sum(r.kl_contrib for r in out.values()) >= 0


def test_distribution_drift_identical_corpora_is_zero(spark):
    texts = ["x y z", "x x w"]
    out = distribution_drift(_docs(spark, texts), _docs(spark, texts)).collect()
    assert out and all(r.kl_contrib == 0.0 and r.tv_contrib == 0.0 for r in out)
