"""CCNet-style perplexity filtering over a corpus (broadcast LM).

Train a stupid-backoff LM (kernel/lm.py: bigram floor or KenLM-style
5-gram via ``order``) on a bounded in-domain
sample (driver-side — same rule as the BPE trainer / IVF quantizer /
quality classifier: fit on a sample, broadcast the model), then score
every document's perplexity in one narrow ``mapInPandas`` pass and gate on
a threshold. In the CCNet recipe the in-domain sample is a curated corpus
(Wikipedia) and documents land in head/middle/tail perplexity buckets;
the same bucketing is expressed here as a plain ``ntile``/threshold over
the scored column.

Scale shape: the model is sample-sized (counts dicts, driver-holdable by
construction), scoring is shuffle-free, and the per-doc log-prob is a
sequential fold — distributed scores are bit-equal to a sequential
replay, which is what the golden oracle checks.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..kernel import lm as L
from ._common import schema_ddl, spread_partitions


def train_lm_from_sources(
    docs: DataFrame,
    reference_sources: list[str],
    sample_docs: int = 200,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    order: int = 2,
) -> L.BigramLM | L.NgramLM:
    """Bounded driver-side LM training on the reference (in-domain) slice
    of the first ``sample_docs`` docs by id — the CCNet setup with the
    curated corpus expressed as a source subset. ``order=2`` gives the
    bigram floor; ``order>=3`` the KenLM-style raw-count stupid-backoff
    model (kernel/lm.train_ngram_lm) — same bounded-training + broadcast +
    narrow-pass shape, production uses order 5."""
    rows = (
        docs.filter(F.col(source_col).isin(*reference_sources))
        .select(F.col(text_col).alias("t"), F.col(id_col).alias("k"))
        .orderBy("k")
        .limit(sample_docs)
        .collect()
    )
    texts = [str(r.t) for r in rows]
    if order <= 2:
        return L.train_bigram_lm(texts)
    return L.train_ngram_lm(texts, order=order)


def score_perplexity(
    docs: DataFrame,
    lm: L.BigramLM | L.NgramLM,
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "perplexity",
) -> DataFrame:
    """input columns (minus text) + per-document perplexity."""
    if out_col in docs.columns:
        raise ValueError(f"score_perplexity: input already has {out_col!r}")
    bc = docs.sparkSession.sparkContext.broadcast(lm)
    scorer = L.ngram_perplexity if isinstance(lm, L.NgramLM) else L.perplexity
    other_cols = [c for c in docs.columns if c != text_col]
    schema = schema_ddl(docs, drop=(text_col,), add=f"{out_col} double")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        model = bc.value
        for pdf in batches:
            out = pdf[other_cols].copy()
            out[out_col] = [
                scorer(str(t) if t is not None else "", model)
                for t in pdf[text_col]
            ]
            yield out

    return spread_partitions(docs, id_col).mapInPandas(kernel, schema=schema)


def perplexity_filter(
    docs: DataFrame,
    lm: L.BigramLM | L.NgramLM,
    max_perplexity: float,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Documents at or below the perplexity budget (the tail drops)."""
    scored = score_perplexity(docs, lm, id_col, text_col)
    return scored.filter(F.col("perplexity") <= max_perplexity)
