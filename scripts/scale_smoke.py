#!/usr/bin/env python
"""Round-5 scale smoke for the dedup/selection families (VERDICT r4 #1).

The extraction path has 2.4M-doc smokes; the dedup/selection operators'
risky constants (bucket-cap behavior, posting df-cap, cluster convergence
rounds) had only ever run at catalog scale. This harness runs
``minhash_lsh_pairs → dedup_clusters → dedup_corpus`` end-to-end,
``substring_dedup``, ``line_dedup``, ``bm25_search`` and
``media_phash_dedup`` on an amplified corpus at MULTIPLE scale points and
records, per family: wall seconds, docs/sec, the shuffle bytes written
(total + biggest single stage, from the Spark status REST API),
viral-bucket accounting (n oversized buckets / star edges / skipped
pairs), and connected-components convergence rounds — measured numbers
for what BASELINE.md previously asserted.

Corpus design — duplication DENSITY stays constant as scale grows (the
per-doc cost comparison across scale points is only meaningful if a
bigger corpus means more *content*, not more copies of the same docs):
each base document spawns ``replicate`` rows in dup-GROUPS of 8 (3 exact
copies + 5 near-dup variants per group); every 5th word is rewritten with
a group-specific token so distinct groups of the same base doc fall well
below the 0.7 LSH threshold (~0.4 est-jaccard) while in-group members
stay above it (~0.9). Docs are re-chunked into 10-word lines so
line-level dedup has real line structure. Base docs with
``doc_id % 101 == 0`` are overridden with ONE shared viral boilerplate
text across every replica — a planted viral cluster (≈ replicate × 50
members at sf0.1) far wider than ``max_bucket_size``, exercising the
star escape hatch and its drop accounting at scale.

Usage:
  python scripts/scale_smoke.py [replicates ...]   # default: 120 480
  SMOKE_FAMILIES=substring_dedup,line_dedup python scripts/scale_smoke.py 480
Writes BENCH_SCALE_SMOKE.json at the repo root (merging scale points; a
family-filtered run re-measures just those rows inside existing points).
"""
from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
WORK = os.environ.get("SMOKE_WORK_DIR", "/tmp/spark_scale_smoke")
VIRAL_TEXT = (
    "subscribe to our newsletter accept all cookies this site uses cookies "
    "to improve your experience terms of service privacy policy all rights "
    "reserved copyright contact us about careers press sitemap help center "
) * 2


def chunk_lines(text: str, width: int = 10) -> str:
    """Pure-Python twin of the 10-word re-chunking below (for assertions)."""
    w = text.split(" ")
    return chr(10).join(
        " ".join(w[i : i + width]) for i in range(0, len(w), width)
    )


def amplified_path(spark, replicate: int) -> str:
    """Materialize the amplified corpus once per (sf, replicate).

    Every projection stage introduces ONLY fresh column names (base_id →
    body → text): an earlier version re-aliased ``doc_id``/``text`` in the
    same select that consumed them, and Spark's lateral column alias
    resolution silently bound ``F.col("doc_id")`` inside the body
    expression to the NEW (replicated) id — scattering the planted viral
    cluster into per-replica truncation variants. Distinct names per stage
    make that capture impossible, and ``run_point`` now asserts the
    planting before timing anything.
    """
    tag = f"{os.path.basename(SF_DIR.rstrip('/'))}_x{replicate}"
    out = os.path.join(WORK, f"docs_{tag}")
    if os.path.exists(os.path.join(out, "_SUCCESS")):
        return out
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        F.col("doc_id").alias("base_id"), F.col("text").alias("base_text")
    )
    k = F.col("k")
    g = (k / F.lit(8)).cast("int")
    words = F.split(F.col("base_text"), " ")
    # group-variant body: every 5th word (group-dependent phase) replaced
    # by a group-specific token -> inter-group est-jaccard ~0.4 (< 0.7)
    mutated = F.transform(
        words,
        lambda w, i: F.when(
            (i + g) % 5 == 0,
            F.concat(F.lit("v"), g.cast("string"), F.lit("w"), i.cast("string")),
        ).otherwise(w),
    )
    # members 0..2 of each group: exact copies; 3..7: near-dups (suffix)
    member_words = F.when(
        k % 8 < 3, mutated
    ).otherwise(F.concat(mutated, F.array(F.concat(F.lit("tail"), k.cast("string")))))
    body = F.when(F.col("base_id") % 101 == 0, F.lit(VIRAL_TEXT.strip())).otherwise(
        F.concat_ws(" ", member_words)
    )
    # re-chunk into 10-word lines so line-level dedup sees line structure
    bw = F.split(F.col("body"), " ")
    lines = F.transform(
        F.sequence(F.lit(0), ((F.size(bw) - 1) / F.lit(10)).cast("int")),
        lambda i: F.concat_ws(" ", F.slice(bw, i * 10 + 1, 10)),
    )
    (
        docs.select(
            "base_id",
            "base_text",
            F.explode(F.sequence(F.lit(0), F.lit(replicate - 1))).alias("k"),
        )
        .select(
            (F.col("base_id") * replicate + k).alias("new_id"),
            body.alias("body"),
        )
        .select(
            F.col("new_id").alias("doc_id"),
            F.concat_ws(chr(10), lines).alias("text"),
        )
        .repartition(max(CPUS * 2, 64))
        .write.mode("overwrite")
        .parquet(out)
    )
    return out


class ShuffleMeter:
    """Delta-reads of completed-stage shuffle counters from the Spark
    status REST API (the same numbers the UI shows) — total bytes written
    across a family's stages plus the single biggest stage, the two
    figures that say whether an exchange would melt at 100×."""

    def __init__(self, spark):
        host = spark.conf.get("spark.driver.host", "localhost")
        port = spark.conf.get("spark.ui.port", "4040")
        self.base = f"http://{host}:{port}/api/v1/applications"
        with urllib.request.urlopen(self.base) as r:
            self.app = json.load(r)[0]["id"]
        self.seen: set[tuple[int, int]] = set()
        self._drain()

    def _stages(self):
        url = f"{self.base}/{self.app}/stages?status=complete"
        with urllib.request.urlopen(url) as r:
            return json.load(r)

    def _drain(self):
        for s in self._stages():
            self.seen.add((s["stageId"], s["attemptId"]))

    def delta(self) -> dict:
        new = [
            s for s in self._stages()
            if (s["stageId"], s["attemptId"]) not in self.seen
        ]
        for s in new:
            self.seen.add((s["stageId"], s["attemptId"]))
        wr = [s.get("shuffleWriteBytes", 0) for s in new]
        return {
            "stages": len(new),
            "shuffle_write_mb": round(sum(wr) / 2**20, 1),
            "max_stage_shuffle_mb": round(max(wr, default=0) / 2**20, 1),
        }


def run_point(spark, replicate: int) -> dict:
    from openllm_ocr_annotator_spark.operators.dedup import (
        dedup_clusters,
        line_dedup,
        minhash_lsh_pairs,
        substring_dedup,
        survivors,
    )
    from openllm_ocr_annotator_spark.operators.media import (
        perceptual_hash,
        phash_dedup,
    )
    from openllm_ocr_annotator_spark.operators.search import bm25_search
    from openllm_ocr_annotator_spark.synth import synthesize_media_variants

    path = amplified_path(spark, replicate)
    docs = spark.read.parquet(path)
    n_docs = docs.count()
    # fail fast if the planted viral cluster is not EXACTLY replicate copies
    # of the chunked viral literal per viral base doc (the alias-capture bug
    # this guards against produced scattered truncation variants instead)
    viral_doc_text = chunk_lines(VIRAL_TEXT.strip())
    n_viral_base = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .filter("doc_id % 101 = 0")
        .count()
    )
    planted = docs.filter(F.col("text") == viral_doc_text).count()
    expect = replicate * n_viral_base
    if planted != expect:
        raise AssertionError(
            f"viral planting broken: {planted} exact viral docs, expected "
            f"{expect} (= {replicate} x {n_viral_base} base docs)"
        )
    meter = ShuffleMeter(spark)
    out: dict = {"replicate": replicate, "n_docs": n_docs, "families": {}}

    only = {
        f for f in os.environ.get("SMOKE_FAMILIES", "").split(",") if f
    }

    def fam(name, fn, n_items=n_docs, unit="docs"):
        if only and name not in only:
            return
        spark.catalog.clearCache()
        meter.delta()
        t0 = time.perf_counter()
        extra = fn()
        dt = time.perf_counter() - t0
        row = {
            "sec": round(dt, 2),
            f"{unit}_per_sec": round(n_items / dt, 1),
            **meter.delta(),
            **(extra or {}),
        }
        out["families"][name] = row
        print(f"  {name}: {json.dumps(row)}", file=sys.stderr, flush=True)

    # -- minhash -> clusters -> corpus, end to end ------------------------
    def lsh_e2e():
        caches: list = []
        stats: list = []
        metrics: dict = {}
        pairs = minhash_lsh_pairs(
            docs, threshold=0.7, max_bucket_size=1000, caches=caches, stats=stats
        ).persist()
        n_pairs = pairs.count()
        st = stats[0].agg(
            F.count(F.lit(1)).alias("buckets"),
            F.max("n_members").alias("widest"),
            F.sum("pairs_materialized").alias("star_edges"),
            F.sum("pairs_skipped").alias("skipped"),
        ).first()
        clusters = dedup_clusters(pairs, docs=docs, metrics=metrics).persist()
        keep = survivors(clusters, docs)
        kept = docs.join(keep, "doc_id").count()
        # the planted viral cluster must resolve to ONE component
        viral_members = planted
        viral_clusters = (
            clusters.join(
                docs.filter(F.col("text") == viral_doc_text),
                "doc_id",
            )
            .select("cluster_id")
            .distinct()
            .count()
        )
        extra = {
            "n_pairs": n_pairs,
            "kept_docs": kept,
            "cc_rounds": metrics.get("rounds"),
            "viral_members": viral_members,
            "viral_clusters_resolved": viral_clusters,
            "cap_buckets": st.buckets,
            "cap_widest_bucket": st.widest,
            "cap_star_edges": int(st.star_edges or 0),
            "cap_pairs_skipped": int(st.skipped or 0),
        }
        pairs.unpersist()
        clusters.unpersist()
        for c in caches:
            c.unpersist()
        return extra

    fam("minhash_clusters_corpus", lsh_e2e)

    def substr():
        res = substring_dedup(docs, k=20)
        agg = res.agg(
            F.sum("n_tokens").alias("toks"), F.sum("n_removed").alias("cut")
        ).first()
        return {"tokens": int(agg.toks), "tokens_removed": int(agg.cut)}

    fam("substring_dedup", substr)

    def lines():
        res = line_dedup(docs)
        agg = res.agg(
            F.count(F.lit(1)).alias("n"), F.sum("n_kept").alias("kept")
        ).first()
        return {"docs_out": int(agg.n), "lines_kept": int(agg.kept)}

    fam("line_dedup", lines)

    def bm25():
        res = bm25_search(docs, ["cookies", "vector", "dup"], max_df_frac=0.76)
        return {"hits": res.count()}

    fam("bm25_search", bm25)

    # -- media: replicate the variant corpus with fresh refs --------------
    if only and "media_phash_dedup" not in only:
        return out
    media = (
        synthesize_media_variants(spark, SF_DIR)
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(0), F.lit(7))).alias("m"),
            "media_ref",
            "kind",
            "payload",
        )
        .select(
            "doc_id",
            F.concat_ws("_", "media_ref", "m").alias("media_ref"),
            "kind",
            "payload",
        )
        .persist()
    )
    n_media = media.count()

    def phash():
        caches: list = []
        stats: list = []
        res = phash_dedup(perceptual_hash(media), caches=caches, stats=stats)
        agg = res.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("n_exact")).alias("ex"),
            F.sum((F.col("n_near") > 0).cast("int")).alias("nr"),
        ).first()
        st = stats[0].agg(
            F.count(F.lit(1)).alias("b"), F.max("n_members").alias("w")
        ).first()
        for c in caches:
            c.unpersist()
        return {
            "images": n_media,
            "exact_dup_links": int(agg.ex),
            "near_dup_images": int(agg.nr),
            "cap_buckets": st.b,
            "cap_widest_bucket": st.w,
        }

    fam("media_phash_dedup", phash, n_items=n_media, unit="images")
    media.unpersist()
    return out


def main():
    reps = [int(a) for a in sys.argv[1:]] or [120, 480]
    from openllm_ocr_annotator_spark.session import get_spark

    os.makedirs(WORK, exist_ok=True)
    spark = get_spark(
        app_name="scale_smoke",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS * 2,
        extra_conf={"spark.ui.enabled": "true"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    art_path = os.path.join(REPO, "BENCH_SCALE_SMOKE.json")

    def merge_write(point: dict) -> dict:
        # write after EVERY point — a crashed/killed run keeps what finished
        old = []
        if os.path.exists(art_path):
            with open(art_path) as f:
                old = json.load(f).get("points", [])
        prev = next(
            (p for p in old if p["replicate"] == point["replicate"]), None
        )
        if prev is not None:  # family-filtered run: refresh only its rows
            point["families"] = {**prev["families"], **point["families"]}
        pts = [p for p in old if p["replicate"] != point["replicate"]] + [point]
        pts.sort(key=lambda p: p["n_docs"])
        merged = {"sf_dir": SF_DIR, "cpus": CPUS, "points": pts}
        with open(art_path, "w") as f:
            json.dump(merged, f, indent=1)
        return merged

    try:
        merged = None
        for r in reps:
            print(f"scale point x{r}:", file=sys.stderr, flush=True)
            merged = merge_write(run_point(spark, r))
        print(json.dumps(merged))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
