"""Real-BPE token counting over a corpus (broadcast vocab + Arrow batches).

Upgrades the regex token-count proxy (functions/text.token_count_bpe) to an
actual trained tokenizer so training-shard budgets (operators/pack.py) are
denominated in real tokens:

1. ``train_bpe_from_corpus``: train merges on a BOUNDED deterministic
   sample (first ``sample_docs`` by doc_id) — tokenizer training is a
   driver-side step by design, the standard pattern (train on a sample,
   broadcast to the fleet); the sample size bounds driver memory regardless
   of corpus scale.
2. ``bpe_token_counts``: broadcast the merge ranks, count per doc in a
   ``mapInPandas`` kernel (kernel/bpe.py). A per-task word-length memo
   exploits Zipf: the unique-word set per task is tiny relative to the
   token stream, so the Python cost is ~O(unique words), not O(tokens).

Scale shape: training reads ``sample_docs`` rows once; counting is one
narrow pass, no shuffle; the broadcast is merges only (KBs for typical
merge counts), never the corpus vocabulary.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..kernel import bpe as B
from ._common import schema_ddl, spread_partitions


def train_bpe_from_corpus(
    docs: DataFrame,
    num_merges: int = 200,
    sample_docs: int = 200,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> list[tuple[str, str]]:
    """Deterministic merges from the first ``sample_docs`` docs by id."""
    sample = [
        r[0]
        for r in docs.select(text_col, id_col)
        .orderBy(id_col)
        .limit(sample_docs)
        .collect()
    ]
    return B.train_bpe(B.word_vocab(sample), num_merges)


def bpe_token_counts(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "n_tokens",
) -> DataFrame:
    """(id, text, …) → (id, …, n_tokens) with REAL BPE token counts."""
    if out_col in docs.columns:
        raise ValueError(
            f"bpe_token_counts: input already has a {out_col!r} column — "
            "pass out_col to avoid a silent duplicate"
        )
    ranks_bc = docs.sparkSession.sparkContext.broadcast(B.merge_ranks(merges))
    other_cols = [c for c in docs.columns if c != text_col]
    schema = schema_ddl(docs, drop=(text_col,), add=f"{out_col} long")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ranks = ranks_bc.value
        cache: dict[str, int] = {}  # per-task memo — Zipf makes this tiny
        for pdf in batches:
            out = pdf[other_cols].copy()
            out[out_col] = [
                B.count_tokens(str(t) if t is not None else "", ranks, cache)
                for t in pdf[text_col]
            ]
            yield out

    return spread_partitions(docs, id_col).mapInPandas(kernel, schema=schema)
