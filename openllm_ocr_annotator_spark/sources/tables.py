"""Snapshot table layer: Iceberg-style commit/resume semantics on parquet.

The reference's persistence is "one JSON file per (annotator, model, sample,
doc); file existence = cache" (reference: docs/architecture.md:158-176,258;
pipeline/image_dataset.py:43-47). At 10^12 docs that is untenable — the
engine's equivalent is a committed-snapshot table:

- every ``commit`` writes a new parquet directory ``data/<snapshot_id>/``
  plus an atomically-renamed manifest entry (JSON) recording snapshot id,
  parent, row count, and the per-partition lineage rows;
- ``read_committed`` unions all data dirs reachable from the latest
  manifest — uncommitted/aborted directories are invisible (crash safety);
- resume = left anti-join of the input table against committed keys, which
  replaces the per-file ``result_path.exists()`` check with one distributed
  join (SURVEY §4.2.3).

In production this is exactly the Iceberg snapshot + append pattern; the
sandbox has no Iceberg jars, so the manifest is a JSON file with the same
semantics behind the same four methods (documented fallback, SURVEY §7.3).
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession


class SnapshotTable:
    def __init__(self, spark: SparkSession, root: str) -> None:
        self.spark = spark
        self.root = root
        os.makedirs(os.path.join(root, "data"), exist_ok=True)
        os.makedirs(os.path.join(root, "manifests"), exist_ok=True)

    # -- manifest chain -------------------------------------------------------

    def _manifest_paths(self) -> list[str]:
        d = os.path.join(self.root, "manifests")
        return sorted(
            os.path.join(d, f) for f in os.listdir(d) if f.endswith(".json")
        )

    def snapshots(self) -> list[dict]:
        return [json.load(open(p)) for p in self._manifest_paths()]

    def latest(self) -> dict | None:
        paths = self._manifest_paths()
        return json.load(open(paths[-1])) if paths else None

    # -- write path -----------------------------------------------------------

    def commit(
        self,
        df: DataFrame,
        lineage: DataFrame | None = None,
        keys: DataFrame | None = None,
    ) -> str:
        """Append ``df`` as a new snapshot; returns the snapshot id.

        Write-then-rename: data lands under a temp-invisible id; the manifest
        write is the commit point (a crash before it leaves an orphan dir
        that no read will ever see).

        ``keys``: the processed input keys. Pass it when an input can
        legitimately produce ZERO output rows (empty-span documents) —
        deriving done-ness from output rows alone would re-process such
        inputs on every resume.
        """
        snap_id = f"{int(time.time() * 1000):014d}_{uuid.uuid4().hex[:8]}"
        data_dir = os.path.join(self.root, "data", snap_id)
        df.write.mode("errorifexists").parquet(data_dir)
        n_rows = self.spark.read.parquet(data_dir).count()
        keys_dir = None
        if keys is not None:
            keys_dir = os.path.join(self.root, "keys", snap_id)
            keys.distinct().write.mode("errorifexists").parquet(keys_dir)
        parent = self.latest()
        manifest = {
            "snapshot_id": snap_id,
            "parent": parent["snapshot_id"] if parent else None,
            "data_dir": data_dir,
            "keys_dir": keys_dir,
            "n_rows": n_rows,
            "lineage": (
                [r.asDict() for r in lineage.collect()] if lineage is not None else []
            ),
        }
        tmp = os.path.join(self.root, "manifests", f".{snap_id}.tmp")
        final = os.path.join(self.root, "manifests", f"{snap_id}.json")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.rename(tmp, final)  # atomic commit point
        return snap_id

    # -- read path -------------------------------------------------------------

    def read_committed(self) -> DataFrame | None:
        """Union of all committed snapshot data (None when table is empty)."""
        snaps = self.snapshots()
        if not snaps:
            return None
        dirs = [s["data_dir"] for s in snaps]
        return self.spark.read.parquet(*dirs)

    def committed_keys(self, *cols: str) -> DataFrame | None:
        """Processed-key set: explicit key snapshots where present, plus
        distinct keys of data-only snapshots (mixed histories supported)."""
        snaps = self.snapshots()
        if not snaps:
            return None
        key_dirs = [s["keys_dir"] for s in snaps if s.get("keys_dir")]
        data_dirs = [s["data_dir"] for s in snaps if not s.get("keys_dir")]
        parts = []
        if key_dirs:
            parts.append(self.spark.read.parquet(*key_dirs).select(*cols))
        if data_dirs:
            parts.append(self.spark.read.parquet(*data_dirs).select(*cols))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out.distinct()

    def resume_filter(self, inputs: DataFrame, *key_cols: str) -> DataFrame:
        """S4/J3: inputs minus already-committed keys (left anti-join)."""
        done = self.committed_keys(*key_cols)
        if done is None:
            return inputs
        return inputs.join(done, list(key_cols), "left_anti")
