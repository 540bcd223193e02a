"""Real-BPE tokenizer: kernel semantics + Spark operator parity."""

from __future__ import annotations

from collections import Counter

from openllm_ocr_annotator_spark.kernel import bpe as B


def test_train_bpe_classic_example():
    """The canonical BPE walk-through: 'low lower lowest' family — the most
    frequent pair merges first, deterministically."""
    vocab = Counter({"low": 5, "lower": 2, "lowest": 1})
    merges = B.train_bpe(vocab, 4)
    # 'l','o' co-occur in every word (count 8) — must be the first merge
    assert merges[0] == ("l", "o")
    assert merges[1] == ("lo", "w")  # then 'lo','w' (count 8)
    ranks = B.merge_ranks(merges)
    # after ('low','</w>') merges, 'low' is a single token
    full = B.train_bpe(vocab, 10)
    assert B.encode_word("low", B.merge_ranks(full)) == ("low</w>",)


def test_encode_word_merge_order_follows_ranks():
    ranks = B.merge_ranks([("a", "b"), ("ab", "c")])
    assert B.encode_word("abc", ranks) == ("abc", B.END)
    # unknown symbols stay character-split
    assert B.encode_word("xyz", ranks) == ("x", "y", "z", B.END)


def test_count_tokens_and_cache_consistency():
    vocab = Counter({"spark": 10, "sparks": 3})
    ranks = B.merge_ranks(B.train_bpe(vocab, 20))
    cache: dict[str, int] = {}
    n1 = B.count_tokens("spark sparks spark", ranks, cache)
    n2 = B.count_tokens("spark sparks spark", ranks, cache)  # all cache hits
    n3 = B.count_tokens("spark sparks spark", ranks, None)   # no cache
    assert n1 == n2 == n3
    assert B.count_tokens("", ranks) == 0
    assert B.count_tokens("   ", ranks) == 0
    # fully-merged words count 1 token each
    assert B.count_tokens("spark spark", ranks, {}) == 2


def test_training_determinism():
    vocab = Counter({"aa ab": 1, "ba": 2, "ab": 2})
    assert B.train_bpe(vocab, 8) == B.train_bpe(vocab, 8)


def test_merges_reduce_token_counts():
    """More merges can never increase a word's token count."""
    vocab = Counter({"tokenizer": 4, "tokens": 6, "token": 9})
    m_few = B.merge_ranks(B.train_bpe(vocab, 3))
    m_many = B.merge_ranks(B.train_bpe(vocab, 30))
    for w in vocab:
        assert len(B.encode_word(w, m_many)) <= len(B.encode_word(w, m_few))


def test_spark_operator_matches_pure_kernel(spark):
    from openllm_ocr_annotator_spark.operators.tokenize import (
        bpe_token_counts,
        train_bpe_from_corpus,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    merges = train_bpe_from_corpus(docs, num_merges=50, sample_docs=50)
    got = {r.doc_id: r.n_tokens for r in bpe_token_counts(docs, merges).collect()}

    pdf = docs.orderBy("doc_id").toPandas()
    sample = [str(t) for t in pdf.head(50)["text"]]
    ranks = B.merge_ranks(B.train_bpe(B.word_vocab(sample), 50))
    assert merges == B.train_bpe(B.word_vocab(sample), 50)
    cache: dict[str, int] = {}
    for d, t in zip(pdf["doc_id"], pdf["text"]):
        assert got[d] == B.count_tokens(str(t), ranks, cache), f"doc {d}"


def test_bpe_counts_at_most_regex_proxy(spark):
    """Sanity vs the old proxy: real BPE merges subword units, so counts
    land in a sane band (≥ whitespace words, since every word is ≥1 token)."""
    from pyspark.sql import functions as F

    from openllm_ocr_annotator_spark.functions.text import token_count_ws
    from openllm_ocr_annotator_spark.operators.tokenize import (
        bpe_token_counts,
        train_bpe_from_corpus,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    merges = train_bpe_from_corpus(docs, num_merges=100, sample_docs=100)
    joined = (
        bpe_token_counts(docs, merges)
        .join(
            docs.select("doc_id", token_count_ws(F.col("text")).alias("n_ws")),
            "doc_id",
        )
        .select("n_tokens", "n_ws")
        .collect()
    )
    assert all(r.n_tokens >= r.n_ws for r in joined)
