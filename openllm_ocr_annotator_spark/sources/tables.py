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

All filesystem access goes through the Hadoop FileSystem API, so the table
root may be ``file:``, ``hdfs:``, or any configured object-store scheme.
The manifest rename is the commit point — atomic on local FS and HDFS; on
S3-like stores (non-atomic rename) production should swap this layer for a
real Iceberg catalog, which exposes the exact same four-method surface
(documented fallback, SURVEY §7.3).
"""

from __future__ import annotations

import json
import time
import uuid

from pyspark.sql import DataFrame, SparkSession


class _HadoopFS:
    """Thin py4j wrapper over org.apache.hadoop.fs.FileSystem."""

    def __init__(self, spark: SparkSession, root: str) -> None:
        sc = spark.sparkContext
        self._jvm = sc._jvm
        self._Path = self._jvm.org.apache.hadoop.fs.Path
        self.fs = self._Path(root).getFileSystem(sc._jsc.hadoopConfiguration())

    def mkdirs(self, path: str) -> None:
        # Hadoop FS returns booleans instead of raising — a silently failed
        # mkdirs/rename would lose the commit while commit() still returns.
        if not self.fs.mkdirs(self._Path(path)):
            raise IOError(f"mkdirs failed: {path}")

    def list_json(self, dirpath: str) -> list[str]:
        """Full paths of *.json children, sorted by file name."""
        p = self._Path(dirpath)
        if not self.fs.exists(p):
            return []
        entries = [
            (str(s.getPath().getName()), str(s.getPath()))
            for s in self.fs.listStatus(p)
        ]
        return [full for name, full in sorted(entries) if name.endswith(".json")]

    def read_json(self, path: str) -> dict:
        stream = self.fs.open(self._Path(path))
        try:
            text = self._jvm.org.apache.commons.io.IOUtils.toString(stream, "UTF-8")
        finally:
            stream.close()
        return json.loads(text)

    def delete(self, path: str) -> None:
        p = self._Path(path)
        if self.fs.exists(p) and not self.fs.delete(p, True):
            raise IOError(f"delete failed: {path}")

    def write_json_atomic(self, tmp: str, final: str, obj: dict) -> None:
        out = self.fs.create(self._Path(tmp), True)
        try:
            out.write(bytearray(json.dumps(obj), "utf-8"))
        finally:
            out.close()
        # THE commit point of the snapshot contract: rename returns False on
        # failure (it does not raise) — must surface as an error, or a lost
        # manifest would be reported as a successful commit.
        if not self.fs.rename(self._Path(tmp), self._Path(final)):
            raise IOError(f"commit rename failed: {tmp} -> {final}")


class SnapshotTable:
    def __init__(self, spark: SparkSession, root: str) -> None:
        self.spark = spark
        self.root = root.rstrip("/")
        self._fs = _HadoopFS(spark, self.root)
        self._fs.mkdirs(f"{self.root}/data")
        self._fs.mkdirs(f"{self.root}/manifests")

    # -- manifest chain -------------------------------------------------------

    def _manifest_paths(self) -> list[str]:
        return self._fs.list_json(f"{self.root}/manifests")

    def snapshots(self) -> list[dict]:
        return [self._fs.read_json(p) for p in self._manifest_paths()]

    def latest(self) -> dict | None:
        paths = self._manifest_paths()
        return self._fs.read_json(paths[-1]) if paths else None

    # -- write path -----------------------------------------------------------

    def commit(
        self,
        df: DataFrame,
        lineage: DataFrame | None = None,
        keys: DataFrame | None = None,
        extra: dict | None = None,
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
        data_dir = f"{self.root}/data/{snap_id}"
        df.write.mode("errorifexists").parquet(data_dir)
        n_rows = self.spark.read.parquet(data_dir).count()
        keys_dir = None
        if keys is not None:
            keys_dir = f"{self.root}/keys/{snap_id}"
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
            **(extra or {}),
        }
        self._fs.write_json_atomic(
            f"{self.root}/manifests/.{snap_id}.tmp",
            f"{self.root}/manifests/{snap_id}.json",
            manifest,
        )
        return snap_id

    # -- read path -------------------------------------------------------------

    def _live_snaps(self, snaps: list[dict]) -> list[dict]:
        """Drop snapshots replaced by a LATER compaction within ``snaps``
        (a compaction manifest lists the ids it rewrote in ``replaces``)."""
        replaced: set[str] = set()
        for s in snaps:
            replaced.update(s.get("replaces") or [])
        return [s for s in snaps if s["snapshot_id"] not in replaced]

    def read_committed(self, as_of: str | None = None) -> DataFrame | None:
        """Union of committed snapshot data (None when table is empty).

        ``as_of``: time travel — read the table as it was at snapshot
        ``as_of`` (inclusive): only data dirs committed up to that manifest
        are visible, exactly the Iceberg ``VERSION AS OF`` contract.
        Snapshot ids are ms-timestamp-prefixed, so manifest name order IS
        commit order. Raises on an unknown snapshot id rather than
        silently returning the full table. Snapshots rewritten by a later
        ``compact()`` are skipped (their data dirs stay on disk for time
        travel until ``expire_replaced()``).
        """
        snaps = self.snapshots()
        if not snaps:
            return None
        if as_of is not None:
            ids = [s["snapshot_id"] for s in snaps]
            if as_of not in ids:
                raise ValueError(
                    f"unknown snapshot {as_of!r}; committed: {ids}"
                )
            snaps = snaps[: ids.index(as_of) + 1]
        dirs = [s["data_dir"] for s in self._live_snaps(snaps)]
        return self.spark.read.parquet(*dirs)

    def committed_keys(self, *cols: str) -> DataFrame | None:
        """Processed-key set: explicit key snapshots where present, plus
        distinct keys of data-only snapshots (mixed histories supported).
        Compaction-replaced snapshots are skipped — ``compact()`` carries
        the unioned key set forward, so resume semantics survive it."""
        snaps = self._live_snaps(self.snapshots())
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

    # -- maintenance -----------------------------------------------------------

    def compact(self, key_cols: tuple[str, ...] = ()) -> str | None:
        """Rewrite all live committed data as ONE snapshot (Iceberg-style
        rewrite): the manifest chain and small-snapshot data dirs otherwise
        grow one entry per incremental commit — at 10^12-doc scale the read
        path would union thousands of directories. The compaction manifest
        records the ids it ``replaces``; replaced data stays on disk (time
        travel to old snapshots keeps working) until ``expire_replaced()``.

        ``key_cols``: REQUIRED when any live snapshot carries an explicit
        key set (inputs with zero output rows) — the unioned keys are
        carried into the compacted snapshot, so resume semantics survive.
        Returns the new snapshot id (None on an empty table).
        """
        live = self._live_snaps(self.snapshots())
        if not live:
            return None
        if any(s.get("keys_dir") for s in live) and not key_cols:
            raise ValueError(
                "compact() needs key_cols: live snapshots carry explicit key "
                "sets (zero-output inputs) that must survive compaction"
            )
        data = self.spark.read.parquet(*[s["data_dir"] for s in live])
        keys = self.committed_keys(*key_cols) if key_cols else None
        return self.commit(
            data, keys=keys, extra={"replaces": [s["snapshot_id"] for s in live]}
        )

    def expire_replaced(self) -> list[str]:
        """Physically delete compaction-replaced snapshots (data, keys,
        manifest) — the retention step that reclaims storage at the cost of
        time travel to those ids. Returns the expired snapshot ids."""
        snaps = self.snapshots()
        replaced: set[str] = set()
        for s in snaps:
            replaced.update(s.get("replaces") or [])
        expired = []
        for s in snaps:
            sid = s["snapshot_id"]
            if sid not in replaced:
                continue
            self._fs.delete(s["data_dir"])
            if s.get("keys_dir"):
                self._fs.delete(s["keys_dir"])
            self._fs.delete(f"{self.root}/manifests/{sid}.json")
            expired.append(sid)
        if expired:
            # the survivors' replaces lists now point at deleted manifests —
            # harmless (they are only used to SKIP ids), left as history
            pass
        return expired

    def resume_filter(self, inputs: DataFrame, *key_cols: str) -> DataFrame:
        """S4/J3: inputs minus already-committed keys (left anti-join)."""
        done = self.committed_keys(*key_cols)
        if done is None:
            return inputs
        return inputs.join(done, list(key_cols), "left_anti")
