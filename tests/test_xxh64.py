"""Pure-Python Spark-compatible XXH64: every path pinned against F.xxhash64."""

from __future__ import annotations

from pyspark.sql import functions as F

from openllm_ocr_annotator_spark.kernel import xxh64 as X


def test_strings_all_lengths_match_spark(spark):
    strs = ["x" * i for i in range(0, 101)] + [
        "héllo wörld ünïcode ⚡", "tab\tnew\nline", "日本語テキスト"]
    df = spark.createDataFrame([(s,) for s in strs], "s string").select(
        "s", F.xxhash64("s").alias("h"))
    got = {r.s: r.h for r in df.collect()}
    for s in strs:
        assert X.xxhash64_row([s]) == got[s], f"len={len(s.encode())}"


def test_int_long_and_multicol_chaining(spark):
    ints = [0, 1, -1, 42, 2**31 - 1, -(2**31)]
    got = {r.i: r.h for r in spark.createDataFrame(
        [(i,) for i in ints], "i int").select("i", F.xxhash64("i").alias("h")).collect()}
    assert all(X.xxhash64_row([("int", i)]) == got[i] for i in ints)

    longs = [0, 1, -1, 2**63 - 1, -(2**63), 123456789012345]
    got = {r.i: r.h for r in spark.createDataFrame(
        [(i,) for i in longs], "i long").select("i", F.xxhash64("i").alias("h")).collect()}
    assert all(X.xxhash64_row([("long", i)]) == got[i] for i in longs)

    rows = [("doc_1", "text", "hello world", "", 0),
            ("d", "image", "", "s3://x/y.png", 7),
            ("a" * 9, "b" * 33, "c" * 5, "d" * 17, -123)]
    df = spark.createDataFrame(
        rows, "a string, b string, c string, d string, e int"
    ).select(F.xxhash64("a", "b", "c", "d", "e").alias("h"))
    assert [r.h for r in df.collect()] == [
        X.xxhash64_row([a, b, c, d, ("int", e)]) for a, b, c, d, e in rows]


def test_null_columns_skipped(spark):
    df = spark.createDataFrame([("a", None, 3)], "a string, b string, c int").select(
        F.xxhash64("a", "b", "c").alias("h"))
    assert df.first().h == X.xxhash64_row(["a", None, ("int", 3)])


def test_lineage_global_checksum_matches_pure_fold(spark):
    """The engine's bit_xor(xxhash64(...)) checksum over real extraction
    output equals a sequential pure-Python fold — partition-independent."""
    from openllm_ocr_annotator_spark.operators.extract import (
        extract_spans,
        lineage_global,
    )
    from openllm_ocr_annotator_spark.synth import synthesize_documents

    docs = synthesize_documents(spark, "/root/testdata/sf0.001")
    out = extract_spans(docs)
    rows = out.collect()
    mask = (1 << 64) - 1
    acc = 0
    for r in rows:
        acc ^= X.xxhash64_row(
            [r.doc_id, r.kind, r.text, r.media_ref, ("int", r.offset)]) & mask
    want = acc - (1 << 64) if acc >= (1 << 63) else acc
    got = lineage_global(out).first()
    assert got.checksum == want
    assert got.span_count == len(rows)
    # and the same rollup from a different partitioning is identical
    got2 = lineage_global(extract_spans(docs.repartition(13))).first()
    assert (got2.doc_count, got2.span_count, got2.checksum) == (
        got.doc_count, got.span_count, got.checksum)
