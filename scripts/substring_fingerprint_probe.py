#!/usr/bin/env python
"""A/B probe for substring_dedup's gram fingerprint (round-5 scale finding).

The ×480 scale smoke showed per-token cost growing 1.48× over a 4× data
step; the prime suspect is CPU, not shuffle — the current fingerprint
materializes every position's k-token gram as a STRING (concat_ws over a
slice, ~k×avg-token bytes of allocation per position) before xxhash64-ing
it. Variant B hashes each token ONCE into a long array and fingerprints a
position as xxhash64 over the k-long slice (Spark's hash functions accept
arrays — element seed-chaining), skipping string materialization.

Both variants are semantically identical for dedup purposes (deterministic
collision-resistant fingerprint; the DuckDB oracle compares literal gram
strings, so it is fingerprint-agnostic). This probe times the expensive
subchain — gram construction → first-occurrence groupBy → dup count — on
the amplified scale-smoke corpus, best-of-N per variant, interleaved so a
noisy window hits both.

Usage: python scripts/substring_fingerprint_probe.py [replicate=120] [k=20] [trials=3]
"""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

from pyspark.sql import functions as F  # noqa: E402


def occ_string(docs, k):
    """Current production shape: gram string then hash."""
    w = F.filter(F.split(F.col("text"), " "), lambda x: x != "")
    toks = docs.select(F.col("doc_id"), w.alias("w")).withColumn("n", F.size("w"))
    return toks.where(F.col("n") >= k).select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.col("n") - k),
                lambda i: F.xxhash64(F.concat_ws(" ", F.slice("w", i + 1, F.lit(k)))),
            )
        ).alias("pos", "_h"),
    )


def occ_tokenhash(docs, k):
    """Variant B: hash tokens once, fingerprint = hash of the k-long slice."""
    w = F.filter(F.split(F.col("text"), " "), lambda x: x != "")
    toks = docs.select(F.col("doc_id"), w.alias("w")).withColumn("n", F.size("w"))
    hw = F.transform("w", lambda t: F.xxhash64(t))
    return (
        toks.where(F.col("n") >= k)
        .withColumn("hw", hw)
        .select(
            "doc_id",
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(0), F.col("n") - k),
                    lambda i: F.xxhash64(F.slice("hw", i + 1, F.lit(k))),
                )
            ).alias("pos", "_h"),
        )
    )


def run_chain(occ) -> int:
    first = occ.groupBy("_h").agg(F.min(F.struct("doc_id", "pos")).alias("first"))
    dups = occ.join(first, "_h").where(
        (F.col("doc_id") != F.col("first.doc_id"))
        | (F.col("pos") != F.col("first.pos"))
    )
    return dups.count()


def main():
    replicate = int(sys.argv[1]) if len(sys.argv) > 1 else 120
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    trials = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    import scale_smoke
    from openllm_ocr_annotator_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        app_name="substr_probe", master=f"local[{cpus}]",
        shuffle_partitions=cpus * 2,
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(scale_smoke.amplified_path(spark, replicate))
    out = {"replicate": replicate, "k": k, "n_docs": docs.count(), "variants": {}}
    counts = {}
    for t in range(trials + 1):  # trial 0 = warmup, discarded
        for name, builder in (("string", occ_string), ("tokenhash", occ_tokenhash)):
            t0 = time.perf_counter()
            n = run_chain(builder(docs, k))
            dt = time.perf_counter() - t0
            counts.setdefault(name, set()).add(n)
            if t:
                out["variants"].setdefault(name, []).append(round(dt, 2))
    for name, secs in out["variants"].items():
        out["variants"][name] = {
            "trial_seconds": secs,
            "best_seconds": min(secs),
            "dup_count": sorted(counts[name]),
        }
    a, b = (out["variants"][v]["best_seconds"] for v in ("string", "tokenhash"))
    out["speedup_tokenhash_vs_string"] = round(a / b, 3)
    # both fingerprints must find the same dup set size (collision-free here)
    out["dup_counts_equal"] = (
        counts["string"] == counts["tokenhash"] and len(counts["string"]) == 1
    )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
