"""Iceberg-style table catalog over plain Parquet.

The sandbox ships no Iceberg runtime jars, so this maintains the parts
of the Iceberg *model* the engine relies on — an atomic snapshot log per
table with schema + row-count metrics — as JSON under
``<root>/metadata/``, with the same commit discipline (write data files
first, then atomically swap the metadata pointer).  The Job runner
(lineage.py) only talks to this class, so a real Iceberg catalog can be
slotted in by reimplementing these four methods.

Layout:
  <root>/metadata/<table>.json       -- current metadata (atomic rename)
  <root>/metadata/<table>.snapshots.json  -- append-only snapshot log
"""

from __future__ import annotations

import json
import os
import time
import uuid


class Catalog:
    def __init__(self, root: str):
        self.root = root
        self.meta_dir = os.path.join(root, "metadata")
        os.makedirs(self.meta_dir, exist_ok=True)

    def _meta_path(self, table: str) -> str:
        return os.path.join(self.meta_dir, f"{table}.json")

    def _log_path(self, table: str) -> str:
        return os.path.join(self.meta_dir, f"{table}.snapshots.json")

    def commit_snapshot(self, table: str, data_path: str, schema_json: str, row_count: int):
        """Atomic commit: stage the new metadata then rename over the
        current pointer (POSIX rename atomicity — the Iceberg swap)."""
        n_files = len(
            [f for f in os.listdir(data_path) if f.endswith(".parquet")]
        ) if os.path.isdir(data_path) else 0
        snap = {
            "snapshot_id": str(uuid.uuid4()),
            "table": table,
            "data_path": data_path,
            "schema": json.loads(schema_json),
            "row_count": int(row_count),
            "n_files": n_files,
            "committed_at": time.time(),
        }
        log = self.snapshots(table)
        log.append(snap)
        tmp = self._log_path(table) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(log, f)
        os.replace(tmp, self._log_path(table))
        tmp = self._meta_path(table) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(snap, f)
        os.replace(tmp, self._meta_path(table))
        return snap

    def current_snapshot(self, table: str) -> dict | None:
        p = self._meta_path(table)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    def snapshots(self, table: str) -> list[dict]:
        p = self._log_path(table)
        if not os.path.exists(p):
            return []
        with open(p) as f:
            return json.load(f)

    def drop(self, table: str):
        for p in (self._meta_path(table), self._log_path(table)):
            if os.path.exists(p):
                os.remove(p)
