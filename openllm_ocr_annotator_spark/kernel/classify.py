"""Hashed-n-gram linear quality classifier (pure numpy, deterministic).

The model-based filtering stage modern pretraining pipelines run after
heuristic gates (fastText-style classifiers in C4/CCNet lineage,
linear-probe quality scorers in the FineWeb-Edu / DCLM lineage): hash word
uni+bi-grams into a fixed feature space, score with a logistic linear
model. Everything here is deterministic pure numpy, shared verbatim by the
Spark operator (broadcast weights + mapInPandas) and the golden generator:

- ``hashed_features``: word n-grams → (indices, counts) via the engine's
  splitmix-based token hash (kernel/dedup.hash_token) mod ``n_features``,
  L2-normalized — no external tokenizer, no floating hash.
- ``score_text``: sigmoid(w·x + b), computed per document with a
  SEQUENTIAL fold over the doc's own sparse features — batch-size
  independent, so the distributed scores equal a sequential replay.
- ``train_logreg``: full-batch gradient descent, fixed step count, zero
  init — bit-deterministic for a given (texts, labels) sample. Training
  is a bounded DRIVER-side step by design (same rule as the BPE trainer
  and the IVF quantizer: fit on a sample, broadcast to the fleet).
"""

from __future__ import annotations

import math

import numpy as np

from .dedup import hash_tokens


def hashed_features(
    text: str, n_features: int = 1 << 18, use_bigrams: bool = True
) -> tuple[np.ndarray, np.ndarray]:
    """(sorted unique indices, L2-normalized counts) for one document."""
    words = [w for w in (text or "").lower().split() if w]
    grams = list(words)
    if use_bigrams:
        grams += [f"{a} {b}" for a, b in zip(words, words[1:])]
    if not grams:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
    # batch hash — value-identical to hash_token per gram (same splitmix
    # finalizer) without the per-call numpy-scalar/errstate overhead
    idx = (hash_tokens(grams) % np.uint64(n_features)).astype(np.int64)
    uniq, counts = np.unique(idx, return_counts=True)
    vals = counts.astype(np.float64)
    vals /= math.sqrt(float((vals * vals).sum()))
    return uniq, vals


def score_text(
    text: str, weights: np.ndarray, bias: float,
    n_features: int | None = None, use_bigrams: bool = True,
) -> float:
    """sigmoid(w·x + b) with a sequential sparse fold (batch-independent)."""
    nf = n_features if n_features is not None else len(weights)
    idx, vals = hashed_features(text, nf, use_bigrams)
    z = bias
    for i, v in zip(idx, vals):
        z += float(weights[i]) * float(v)
    return 1.0 / (1.0 + math.exp(-z))


def train_logreg(
    texts: list[str], labels: list[int],
    n_features: int = 1 << 18, use_bigrams: bool = True,
    lr: float = 0.5, steps: int = 200, l2: float = 1e-4,
) -> tuple[np.ndarray, float]:
    """Full-batch GD logistic regression; zero init → deterministic."""
    feats = [hashed_features(t, n_features, use_bigrams) for t in texts]
    y = np.array(labels, dtype=np.float64)
    w = np.zeros(n_features, dtype=np.float64)
    b = 0.0
    n = max(len(texts), 1)
    for _ in range(steps):
        zs = np.array(
            [b + float((w[idx] * vals).sum()) for idx, vals in feats],
            dtype=np.float64,
        )
        p = 1.0 / (1.0 + np.exp(-zs))
        g = (p - y) / n
        gw = np.zeros_like(w)
        for gi, (idx, vals) in zip(g, feats):
            gw[idx] += gi * vals
        w -= lr * (gw + l2 * w)
        b -= lr * float(g.sum())
    return w, b
