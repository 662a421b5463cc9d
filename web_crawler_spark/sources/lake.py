"""SnapshotTable — Iceberg-style snapshot semantics over plain parquet.

The reference persists job state by rewriting one JSON file on every update
(reference: backend/api/models.py:208-217) and reloads it on restart
(:191-206). That is exactly table-format snapshot semantics done naively.
This module provides the real thing, sized for this sandbox (the Iceberg
runtime jars are not in the image — on a cluster you'd swap this for an
Iceberg catalog table; the API is deliberately snapshot-id-compatible):

    table/
      snapshots/s00000001.json   # {"id", "parent", "op", "files": [...]}
      data/c00000001/part-*.parquet
      _current                   # latest snapshot id, atomically replaced

Guarantees:
- **Atomic commit**: data files land first, then the manifest, then
  ``_current`` via os.replace (POSIX-atomic). A crash mid-commit leaves the
  previous snapshot current; orphan data dirs are harmless.
- **Snapshot isolation / time travel**: ``read(spark, snapshot_id=k)``.
- **Append and overwrite** ops; append reuses parent file lists (no rewrite
  of existing data — unlike the reference's full-file rewrite).
- **Resume**: the crawl loop checkpoints (round, snapshot ids) and restarts
  from them — see plans/round.py.

Scale note: manifests store file *directory* lists, one entry per commit, so
manifest size is O(commits), not O(files); Spark's parquet reader receives
the directory list and parallelizes the scan. At 1000-executor scale the
same layout holds — the commit path is driver-only metadata.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


class SnapshotTable:
    def __init__(self, path: str):
        self.path = path
        self._snap_dir = os.path.join(path, "snapshots")
        self._data_dir = os.path.join(path, "data")
        os.makedirs(self._snap_dir, exist_ok=True)
        os.makedirs(self._data_dir, exist_ok=True)

    # -- metadata ----------------------------------------------------------

    def current_snapshot_id(self) -> int | None:
        cur = os.path.join(self.path, "_current")
        try:
            with open(cur) as f:
                return int(f.read().strip())
        except (FileNotFoundError, ValueError):
            return None

    def _manifest(self, snapshot_id: int) -> dict:
        with open(os.path.join(self._snap_dir, f"s{snapshot_id:08d}.json")) as f:
            return json.load(f)

    def snapshots(self) -> list[dict]:
        out = []
        for name in sorted(os.listdir(self._snap_dir)):
            if name.endswith(".json"):
                with open(os.path.join(self._snap_dir, name)) as f:
                    out.append(json.load(f))
        return out

    # -- commit ------------------------------------------------------------

    def _max_snapshot_id(self) -> int:
        best = 0
        for name in os.listdir(self._snap_dir):
            if name.startswith("s") and name.endswith(".json"):
                try:
                    best = max(best, int(name[1:-5]))
                except ValueError:
                    pass
        return best

    def _commit(self, df: DataFrame, op: str) -> int:
        parent = self.current_snapshot_id()
        # ids are allocated past the highest EXISTING snapshot, not parent+1:
        # after a rollback the next commit must not overwrite the abandoned
        # snapshot's manifest (snapshot ids are immutable; old readers keep
        # seeing the data their id referred to)
        new_id = self._max_snapshot_id() + 1
        commit_dir = f"c{new_id:08d}_{uuid.uuid4().hex[:8]}"
        abs_dir = os.path.join(self._data_dir, commit_dir)
        df.write.mode("overwrite").parquet(abs_dir)
        files = [] if (op == "overwrite" or parent is None) else list(
            self._manifest(parent)["files"]
        )
        files.append(commit_dir)
        manifest = {
            "id": new_id,
            "parent": parent,
            "op": op,
            "files": files,
            "committed_at": time.time(),
        }
        tmp = os.path.join(self._snap_dir, f".tmp-{uuid.uuid4().hex}")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, os.path.join(self._snap_dir, f"s{new_id:08d}.json"))
        tmp2 = os.path.join(self.path, f".cur-{uuid.uuid4().hex}")
        with open(tmp2, "w") as f:
            f.write(str(new_id))
        os.replace(tmp2, os.path.join(self.path, "_current"))
        return new_id

    def append(self, df: DataFrame) -> int:
        return self._commit(df, "append")

    def overwrite(self, df: DataFrame) -> int:
        return self._commit(df, "overwrite")

    def rollback(self, snapshot_id: int) -> None:
        """Point _current back at an earlier snapshot (crash-resume path)."""
        self._manifest(snapshot_id)  # validates existence
        tmp = os.path.join(self.path, f".cur-{uuid.uuid4().hex}")
        with open(tmp, "w") as f:
            f.write(str(snapshot_id))
        os.replace(tmp, os.path.join(self.path, "_current"))

    # -- read --------------------------------------------------------------

    def read(
        self,
        spark: SparkSession,
        snapshot_id: int | None = None,
        schema: StructType | None = None,
    ) -> DataFrame:
        sid = snapshot_id if snapshot_id is not None else self.current_snapshot_id()
        if sid is None:
            if schema is None:
                raise ValueError(f"empty table {self.path} needs an explicit schema")
            return spark.createDataFrame([], schema)
        files = self._manifest(sid)["files"]
        if not files:
            return spark.createDataFrame([], schema)
        paths = [os.path.join(self._data_dir, d) for d in files]
        return spark.read.parquet(*paths)
