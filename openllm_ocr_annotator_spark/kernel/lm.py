"""Bigram language model + perplexity scoring (pure Python, deterministic).

The CCNet-lineage perplexity filter: score each document against a small
LM trained on an in-domain sample and drop the high-perplexity tail (the
classic crawl-cleaning stage between heuristic gates and model
classifiers; KenLM 5-gram in production — here a bigram stupid-backoff LM,
the same shape with a driver-holdable model).

- ``train_bigram_lm``: unigram + bigram counts over whitespace tokens,
  with a per-document sentence-start context tracked separately (so a
  literal "<s>" token in text cannot collide with the start state).
- ``doc_logprob``: Σ log P(w_i | w_{i-1}) with stupid backoff
  (Brants et al. 2007): bigram MLE when the bigram is seen, else
  α · unigram MLE, else α · (1/total) OOV floor. SEQUENTIAL float fold —
  batch-size independent, so distributed scoring equals a sequential
  replay (golden-checkable).
- ``perplexity``: exp(−logprob / n_tokens); lower = more in-domain.

Shared verbatim by the Spark operator (broadcast counts + mapInPandas)
and the golden generator, like every other kernel in this package.
"""

from __future__ import annotations

import math
from collections import Counter

ALPHA = 0.4  # stupid-backoff discount (the published constant)
_BOS = object()  # start-of-document context; never collides with a token


class BigramLM:
    """Plain-data model (picklable for Spark broadcast)."""

    __slots__ = ("uni", "bi", "bos_bi", "total", "n_starts")

    def __init__(
        self, uni: dict, bi: dict, bos_bi: dict, total: int, n_starts: int
    ) -> None:
        self.uni = uni          # word → count
        self.bi = bi            # (w1, w2) → count
        self.bos_bi = bos_bi    # first-word → count (start-context bigrams)
        self.total = total      # token count
        self.n_starts = n_starts  # number of non-empty training docs


def train_bigram_lm(texts: list[str]) -> BigramLM:
    uni: Counter = Counter()
    bi: Counter = Counter()
    bos_bi: Counter = Counter()
    total = 0
    n_starts = 0
    for t in texts:
        words = [w for w in (t or "").lower().split() if w]
        if not words:
            continue
        n_starts += 1
        bos_bi[words[0]] += 1
        prev = None
        for w in words:
            uni[w] += 1
            if prev is not None:
                bi[(prev, w)] += 1
            total += 1
            prev = w
    return BigramLM(dict(uni), dict(bi), dict(bos_bi), total, n_starts)


def doc_logprob(text: str, lm: BigramLM, alpha: float = ALPHA) -> tuple[float, int]:
    """(Σ log P(w|prev), token count) under stupid backoff."""
    words = [w for w in (text or "").lower().split() if w]
    if not words or lm.total <= 0:
        return 0.0, 0
    floor = 1.0 / lm.total  # OOV mass: one pseudo-count over training tokens
    lp = 0.0
    prev: object = _BOS
    for w in words:
        if prev is _BOS:
            c_bi = lm.bos_bi.get(w, 0)
            c_prev = lm.n_starts
        else:
            c_bi = lm.bi.get((prev, w), 0)
            c_prev = lm.uni.get(prev, 0)
        if c_bi and c_prev:
            p = c_bi / c_prev
        else:
            c_uni = lm.uni.get(w, 0)
            p = alpha * (c_uni / lm.total if c_uni else floor)
        lp += math.log(p)
        prev = w
    return lp, len(words)


def perplexity(text: str, lm: BigramLM, alpha: float = ALPHA) -> float:
    lp, n = doc_logprob(text, lm, alpha)
    if n == 0:
        return float("inf")
    return math.exp(-lp / n)
