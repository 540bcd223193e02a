#!/usr/bin/env python
"""Cross-session PQ index lifecycle at scale (VERDICT r4 #7).

The round-4 200k-vector smoke trained, encoded and searched inside ONE
Spark session; the production claim ("train once, append-encode forever,
search the committed union") additionally requires the quantizer to
survive process death. This script runs the lifecycle across two separate
OS processes:

  phase1: synthesize vectors [0, N/2), train the quantizer on the bounded
          sample, pq_save it next to the index table, encode + commit
          increment 1 to a SnapshotTable. Exit.
  phase2: NEW process — pq_load the quantizer, encode + commit increment 2
          ([N/2, N)) WITHOUT retraining, read the committed union, answer
          Q queries (k=10) against it, and verify (a) every result set is
          exactly k with no duplicate neighbors, (b) the committed union
          is row-for-row identical to a one-shot batch encode of the full
          corpus with the loaded quantizer — the incremental≡batch
          invariant, now across sessions.

Vectors are deterministic clustered Gaussians (hash-seeded per vec_id,
generated distributed in mapInPandas — no driver-side materialization),
so phase2 regenerates increment 2 bit-identically without phase1 state.

Usage:
  python scripts/pq_lifecycle_smoke.py phase1 <root> [n_vectors]
  python scripts/pq_lifecycle_smoke.py phase2 <root> [n_vectors]
(n_vectors default 120000; tests/test_similarity.py drives both phases
via subprocess at a small N — the cross-process contract, pytest-pinned.)
Each phase prints one JSON line; phase2 writes PQ_LIFECYCLE.json at the
repo root when n_vectors >= 100000 (the BASELINE-grade record).
"""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402

DIM = 64
N_CLUSTERS = 256


def synth_vectors(spark, lo: int, hi: int):
    """(vec_id, embedding) for ids [lo, hi): cluster center (id-hash keyed)
    + deterministic noise. Pure function of vec_id — any session, any
    partitioning, same vectors."""
    centers = np.random.RandomState(7).normal(size=(N_CLUSTERS, DIM)) * 3.0

    def gen(batches):
        for pdf in batches:
            rows = []
            for v in pdf["id"]:
                rng = np.random.RandomState(int(v) % (2**31))
                c = centers[int(v) % N_CLUSTERS]
                rows.append((int(v), (c + rng.normal(size=DIM) * 0.3).tolist()))
            yield pd.DataFrame(rows, columns=["vec_id", "embedding"])

    return (
        spark.range(lo, hi)
        .repartition(64)
        .mapInPandas(gen, schema="vec_id long, embedding array<double>")
    )


def main():
    phase, root = sys.argv[1], sys.argv[2]
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 120_000
    from openllm_ocr_annotator_spark.operators.similarity import (
        bounded_sample,
        ivf_pq_search,
        pq_index,
        pq_load,
        pq_save,
        pq_train,
    )
    from openllm_ocr_annotator_spark.session import get_spark
    from openllm_ocr_annotator_spark.sources.tables import SnapshotTable

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name=f"pq_lifecycle_{phase}", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    out = {"phase": phase, "n_vectors": n, "pid": os.getpid()}
    qpath = f"{root}/quantizer.parquet"
    table = SnapshotTable(spark, f"{root}/pq_table")
    try:
        if phase == "phase1":
            inc1 = synth_vectors(spark, 0, n // 2)
            t0 = time.perf_counter()
            centroids, codebooks = pq_train(
                bounded_sample(inc1), n_cells=64, iters=2, m_sub=8, ksub=16
            )
            out["train_sec"] = round(time.perf_counter() - t0, 2)
            pq_save(spark, qpath, centroids, codebooks)
            t0 = time.perf_counter()
            snap = table.commit(pq_index(inc1, centroids, codebooks))
            out["encode_commit_sec"] = round(time.perf_counter() - t0, 2)
            out["snapshot"] = snap
            out["encode_vectors_per_sec"] = round(
                (n // 2) / out["encode_commit_sec"], 1
            )
        elif phase == "phase2":
            t0 = time.perf_counter()
            centroids, codebooks = pq_load(spark, qpath)
            out["load_sec"] = round(time.perf_counter() - t0, 2)
            inc2 = synth_vectors(spark, n // 2, n)
            t0 = time.perf_counter()
            table.commit(pq_index(inc2, centroids, codebooks))
            out["encode_commit_sec"] = round(time.perf_counter() - t0, 2)
            out["encode_vectors_per_sec"] = round(
                (n - n // 2) / out["encode_commit_sec"], 1
            )
            committed = table.read_committed()
            out["committed_rows"] = committed.count()
            assert out["committed_rows"] == n, "union incomplete"
            # incremental (2 sessions) == one-shot batch encode, row for row
            full = synth_vectors(spark, 0, n)
            batch = pq_index(full, centroids, codebooks)
            mism = (
                committed.exceptAll(batch).count()
                + batch.exceptAll(committed).count()
            )
            out["incremental_vs_batch_mismatches"] = mism
            assert mism == 0, "cross-session incremental != batch encode"
            # search the committed union
            queries = synth_vectors(spark, 0, 100)
            t0 = time.perf_counter()
            res = ivf_pq_search(
                queries, committed, full, centroids, codebooks,
                k=10, nprobe=4, rerank=50,
            ).collect()
            out["search_sec"] = round(time.perf_counter() - t0, 2)
            per_q = {}
            for r in res:
                per_q.setdefault(r.query_id, []).append(r.neighbor_id)
            assert len(per_q) == 100 and all(
                len(v) == 10 and len(set(v)) == 10 for v in per_q.values()
            ), "result sets must be exactly k, duplicate-free"
            out["result_sets_ok"] = True
            if n >= 100_000:
                with open(os.path.join(REPO, "PQ_LIFECYCLE.json"), "w") as f:
                    json.dump(out, f, indent=1)
        else:
            raise SystemExit(f"unknown phase {phase!r}")
        print(json.dumps(out))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
