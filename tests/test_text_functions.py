"""Text-analysis functions vs hand-computed expectations."""

from __future__ import annotations

from pyspark.sql import functions as F

from openllm_ocr_annotator_spark.functions import text as TX


def _one(spark, text, col):
    df = spark.createDataFrame([(text,)], "text string")
    return df.select(col.alias("v")).first().v


def test_lang_id_markers(spark):
    assert _one(spark, "the cat and the dog of a house", TX.lang_id(F.col("text"))) == "en"
    assert _one(spark, "spark batch stream query spark", TX.lang_id(F.col("text"))) == "code"
    assert _one(spark, "join merge sort table join", TX.lang_id(F.col("text"))) == "data"
    assert _one(spark, "xyzzy plugh quux", TX.lang_id(F.col("text"))) == "unknown"
    # tie → alphabetically smallest label
    assert _one(spark, "the spark", TX.lang_id(F.col("text"))) == "code"


def test_token_counts(spark):
    assert _one(spark, "a b  c", TX.token_count_ws(F.col("text"))) == 3
    # 'hello,' → 'hello' + ',' ; 'world42' → 'world' + '42'
    assert _one(spark, "hello, world42", TX.token_count_bpe(F.col("text"))) == 4
    assert _one(spark, "", TX.token_count_ws(F.col("text"))) == 0


def test_stopword_ratio_and_mean_len(spark):
    assert _one(spark, "the cat", TX.stopword_ratio(F.col("text"))) == 0.5
    assert _one(spark, "ab abcd", TX.mean_word_len(F.col("text"))) == 3.0
    assert _one(spark, "", TX.stopword_ratio(F.col("text"))) == 0.0


def test_quality_score_components(spark):
    good = "the " + " ".join(f"word{i}" for i in range(20))  # 21 tokens, has stopword
    assert _one(spark, good, TX.quality_score(F.col("text"))) == 1.0
    assert _one(spark, "1 2 3", TX.quality_score(F.col("text"))) == 0.0  # no alpha, short
    assert _one(spark, "xx yy", TX.quality_score(F.col("text"))) == 0.25  # alpha only


def test_vocab_fingerprint_order_insensitive(spark):
    df = spark.createDataFrame([("b a c",), ("c b a",), ("a b d",)], "text string")
    fps = [r.fp for r in df.select(TX.vocab_fingerprint(F.col("text")).alias("fp")).collect()]
    assert fps[0] == fps[1]
    assert fps[0] != fps[2]
