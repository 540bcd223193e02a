"""Model-based document quality scoring over a corpus (broadcast model).

Wires kernel/classify.py into the engine: train the linear scorer on a
bounded deterministic sample (driver-side, same rule as the BPE trainer /
IVF quantizer), broadcast the weight vector (2^18 doubles = 2 MB — model,
never corpus), score every document in one narrow ``mapInPandas`` pass.

Self-supervised bootstrap: ``train_from_heuristic`` derives labels from
the heuristic gate (`functions/text.quality_score` ≥ threshold) on the
sample — the standard pattern for bootstrapping a model-based filter from
rule-based labels (a production run swaps in human/LLM labels through the
same ``train``/``score_documents`` surface).

Scale shape: training reads ``sample_docs`` rows once; scoring is
shuffle-free; the per-doc score is a sequential sparse fold, so the
distributed result is bit-equal to a sequential replay (golden-checked by
the ``quality_classifier`` driver query).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..kernel import classify as C
from ._common import schema_ddl, spread_partitions

N_FEATURES = 1 << 18


def train_classifier(
    docs: DataFrame,
    label_col,
    sample_docs: int = 200,
    id_col: str = "doc_id",
    text_col: str = "text",
    steps: int = 200,
) -> tuple[np.ndarray, float]:
    """Bounded driver-side training on the first ``sample_docs`` docs by id.

    ``label_col``: any integer Column expression. The classic weak labels:
    - CCNet-style: membership in a reference source set
      (``F.col("source").isin(...)``) — positives from a curated corpus,
      negatives from the crawl;
    - heuristic bootstrap: ``quality_score(col) >= t`` (rule-based labels
      refined into a smooth model score).
    """
    rows = (
        docs.select(
            F.col(text_col).alias("t"),
            label_col.cast("int").alias("y"),
            F.col(id_col).alias("k"),
        )
        .orderBy("k")
        .limit(sample_docs)
        .collect()
    )
    return C.train_logreg(
        [str(r.t) for r in rows], [int(r.y) for r in rows],
        n_features=N_FEATURES, steps=steps,
    )


def train_from_heuristic(
    docs: DataFrame,
    quality_threshold: float = 0.75,
    sample_docs: int = 200,
    id_col: str = "doc_id",
    text_col: str = "text",
    steps: int = 200,
) -> tuple[np.ndarray, float]:
    """Heuristic-bootstrap convenience over ``train_classifier``."""
    from ..functions.text import quality_score

    return train_classifier(
        docs,
        quality_score(F.col(text_col)) >= quality_threshold,
        sample_docs, id_col, text_col, steps,
    )


def score_documents(
    docs: DataFrame,
    weights: np.ndarray,
    bias: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "model_quality",
) -> DataFrame:
    """input columns (minus text) + ``out_col`` ∈ (0,1) per document."""
    if out_col in docs.columns:
        raise ValueError(f"score_documents: input already has {out_col!r}")
    bc = docs.sparkSession.sparkContext.broadcast((weights, float(bias)))
    other_cols = [c for c in docs.columns if c != text_col]
    schema = schema_ddl(docs, drop=(text_col,), add=f"{out_col} double")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        w, b = bc.value
        for pdf in batches:
            out = pdf[other_cols].copy()
            out[out_col] = [
                C.score_text(str(t) if t is not None else "", w, b)
                for t in pdf[text_col]
            ]
            yield out

    return spread_partitions(docs, id_col).mapInPandas(kernel, schema=schema)
