"""Catalog — a named-table registry over SnapshotTable.

The reference addresses its persistent state by hard-coded file paths
(reference: backend/api/models.py:191-217 — one JSON file per concern);
an engine whose tables are created in one process and consumed in another
needs names, not paths. This is the in-sandbox stand-in for an Iceberg
catalog: ``create_table`` / ``load_table`` / ``table_names`` / ``drop_table``
over a single JSON registry, atomically rewritten under the same flock
discipline as the table commits themselves.

The registry persists each table's CONFIGURATION, not just its path —
today that is ``stats_cols``. That closes a real operational hazard:
constructing ``SnapshotTable(path)`` directly without the stats columns
silently stops recording min/max stats on future commits, and pruned scans
quietly degrade to full scans. Loading through the catalog always yields a
handle configured the way the table was created.

On a cluster with the Iceberg runtime jars this maps 1:1 onto the catalog
API (create/load/list/drop against Hive/Glue/REST); the flock-guarded JSON
becomes the catalog service's conditional-put.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import uuid

from .lake import SnapshotTable, file_lock

_NAME_RE = re.compile(r"^[A-Za-z0-9][A-Za-z0-9_.-]*$")


class Catalog:
    """A directory of named SnapshotTables.

    Layout::

        root/
          _catalog.json   # {"tables": {name: {"dir": ..., "stats_cols": [...]}}}
          _catalog.lock   # flock target serializing registry updates
          <dir>/          # one SnapshotTable per registered name
    """

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)
        self._registry_path = os.path.join(root, "_catalog.json")
        self._lock_path = os.path.join(root, "_catalog.lock")

    # ------------------------------------------------------------- registry

    def _locked(self):
        # same deadline discipline as the table commit lock: a wedged
        # holder surfaces as a loud TimeoutError, never an indefinite hang
        return file_lock(
            self._lock_path, what=f"the catalog lock of {self.root}"
        )

    def _read_registry(self) -> dict:
        try:
            with open(self._registry_path) as f:
                return json.load(f)
        except FileNotFoundError:
            return {"tables": {}}

    def _write_registry(self, reg: dict) -> None:
        tmp = os.path.join(self.root, f".catalog-{uuid.uuid4().hex}")
        with open(tmp, "w") as f:
            json.dump(reg, f)
        os.replace(tmp, self._registry_path)

    # --------------------------------------------------------------- tables

    @staticmethod
    def _validate(name: str) -> None:
        if not _NAME_RE.fullmatch(name):
            raise ValueError(
                f"invalid table name {name!r}: letters/digits/._- only, "
                f"must not start with a separator"
            )

    def _handle(self, entry: dict) -> SnapshotTable:
        return SnapshotTable(
            os.path.join(self.root, entry["dir"]),
            stats_cols=entry.get("stats_cols") or None,
        )

    def create_table(
        self,
        name: str,
        stats_cols: list[str] | None = None,
        if_not_exists: bool = False,
    ) -> SnapshotTable:
        """Register ``name`` and return its (empty) table handle. A second
        create of the same name raises unless ``if_not_exists``, in which
        case the EXISTING table is returned as-configured (the requested
        ``stats_cols`` are ignored — the registry, not the caller, owns the
        table's configuration)."""
        self._validate(name)
        with self._locked():
            reg = self._read_registry()
            entry = reg["tables"].get(name)
            if entry is not None:
                if if_not_exists:
                    return self._handle(entry)
                raise FileExistsError(f"table {name!r} already exists in {self.root}")
            entry = {
                "dir": f"t_{name}_{uuid.uuid4().hex[:8]}",
                "stats_cols": list(stats_cols) if stats_cols else [],
            }
            reg["tables"][name] = entry
            self._write_registry(reg)
        return self._handle(entry)

    def load_table(self, name: str) -> SnapshotTable:
        entry = self._read_registry()["tables"].get(name)
        if entry is None:
            raise KeyError(f"no table {name!r} in catalog {self.root}")
        return self._handle(entry)

    def table_names(self) -> list[str]:
        return sorted(self._read_registry()["tables"])

    def drop_table(self, name: str, purge: bool = False) -> bool:
        """Unregister ``name``; with ``purge`` also delete its data. Returns
        False when the name was not registered (idempotent drops)."""
        with self._locked():
            reg = self._read_registry()
            entry = reg["tables"].pop(name, None)
            if entry is None:
                return False
            self._write_registry(reg)
        if purge:
            shutil.rmtree(os.path.join(self.root, entry["dir"]), ignore_errors=True)
        return True
