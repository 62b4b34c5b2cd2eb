"""Checkpoint-resumable job runner with per-partition lineage + metrics
tables (BASELINE.json north_rule).

An engine ``Job`` is a DAG of named stages, each a function
``(spark, inputs: dict[str, DataFrame]) -> DataFrame``.  Every stage's
output is written to ``<root>/snapshots/<job_id>/<stage>/snap-*`` via an
Iceberg-style catalog (catalog.py: snapshot log + schema + row counts —
plain Parquet underneath since the sandbox has no Iceberg jars, behind
an abstraction where a real catalog slots in).

Resume semantics: a stage whose snapshot is committed (atomic catalog
update AFTER a successful write) is skipped on re-run and its output
read back — so a killed job re-runs only uncommitted stages.  Spark's
own task retry handles partition-level recovery inside a stage; the
lineage table records per-partition row counts and bytes for audit, and
the metrics table records per-stage wall time.

Lineage rows:  (job_id, stage, partition_id, rows, approx_bytes, ts)
Metrics rows:  (job_id, stage, wall_sec, rows, n_partitions, ts,
                status)
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import Catalog


@dataclass
class Stage:
    name: str
    fn: Callable[[SparkSession, dict], DataFrame]
    inputs: list[str] = field(default_factory=list)


class Job:
    def __init__(self, spark: SparkSession, root: str, job_id: str):
        self.spark = spark
        self.root = root
        self.job_id = job_id
        self.catalog = Catalog(root)
        self.stages: list[Stage] = []

    def _table(self, stage: str) -> str:
        """Catalog key for a stage — namespaced by job_id so two
        different jobs sharing one root can NEVER cross-read each
        other's committed snapshots (two pipelines both naming a stage
        'filtered' would otherwise resume from each other's data).

        Upgrade note (round 2): keys were previously the bare stage
        name; snapshots committed under the old layout are not found,
        so a pre-existing job re-runs each stage ONCE and recommits
        under the namespaced key (no corruption — old snapshot dirs
        stay readable on disk).  A bare-key read fallback is
        deliberately NOT provided: it would reintroduce exactly the
        cross-job collision this namespacing fixes, silently resuming
        from another pipeline's committed data."""
        return f"{self.job_id}.{stage}"

    def stage(self, name: str, inputs: list[str] | None = None):
        def deco(fn):
            self.stages.append(Stage(name, fn, inputs or []))
            return fn

        return deco

    # -- lineage/metrics sinks (append-only parquet tables) ----------------

    def _append(self, table: str, df: DataFrame):
        df.write.mode("append").parquet(os.path.join(self.root, table))

    def _write_stats(self, out_path: str) -> list[tuple[int, int, int]]:
        """(partition_id, rows, bytes) per written part-file, from the
        parquet FOOTERS — O(files) metadata reads, never a data scan.
        This is the Iceberg manifest-statistics design: the write
        already produced exact per-file counts; re-scanning 100 TB of
        output to recount it (the r2 implementation) triples the I/O of
        every pipeline stage."""
        import pyarrow.parquet as pq

        stats = []
        files = sorted(
            f for f in os.listdir(out_path)
            if f.endswith(".parquet") and not f.startswith((".", "_"))
        )
        for i, fn in enumerate(files):
            p = os.path.join(out_path, fn)
            stats.append((i, pq.ParquetFile(p).metadata.num_rows, os.path.getsize(p)))
        return stats

    def _record_lineage(self, stage: str, stats: list[tuple[int, int, int]]):
        lin = self.spark.createDataFrame(
            [(self.job_id, stage, pid, rows, nbytes) for pid, rows, nbytes in stats],
            "job_id string, stage string, partition_id int, rows long, approx_bytes long",
        ).withColumn("ts", F.current_timestamp())
        self._append("lineage", lin)

    def _record_metrics(self, stage: str, wall: float, rows: int, nparts: int, status: str):
        m = self.spark.createDataFrame(
            [(self.job_id, stage, float(wall), int(rows), int(nparts), status)],
            "job_id string, stage string, wall_sec double, rows long, n_partitions int, status string",
        ).withColumn("ts", F.current_timestamp())
        self._append("metrics", m)

    # -- execution ------------------------------------------------------------

    def run(self, resume: bool = True) -> dict[str, DataFrame]:
        import uuid

        outputs: dict[str, DataFrame] = {}
        for st in self.stages:
            snap = self.catalog.current_snapshot(self._table(st.name))
            if resume and snap is not None:
                outputs[st.name] = self.spark.read.parquet(snap["data_path"])
                self._record_metrics(st.name, 0.0, snap["row_count"], snap["n_files"], "skipped")
                continue
            t0 = time.perf_counter()
            # Iceberg write discipline: every run lands in a FRESH
            # immutable snapshot directory; the catalog pointer swaps
            # only after a fully successful write.  A crash mid-write
            # can therefore never damage the last committed snapshot,
            # and older snapshots stay readable (time travel).
            # snapshots live in their own subtree (NOT inside a stage's
            # flat parquet dir: a non key=value subdir inside a dataset
            # breaks partition discovery on legacy data_path reads)
            out_path = os.path.join(
                self.root, "snapshots", self.job_id, st.name,
                f"snap-{uuid.uuid4().hex[:12]}"
            )
            try:
                df = st.fn(self.spark, {k: outputs[k] for k in st.inputs})
                df.write.mode("errorifexists").parquet(out_path)
            except Exception:
                # record the failure in the audit table before
                # propagating — otherwise 'crashed in stage X' is
                # indistinguishable from 'never reached stage X', and
                # the orphaned uncommitted snap-* dir goes unrecorded
                self._record_metrics(
                    st.name, time.perf_counter() - t0, 0, 0, "failed"
                )
                raise
            # rows / partitions / bytes come from the parquet footers the
            # write just produced (one metadata read per file) — the
            # write is the ONLY job that touches the stage's data
            stats = self._write_stats(out_path)
            rows = sum(s[1] for s in stats)
            nparts = len(stats)
            # commit AFTER a fully successful write → resume-safe
            self.catalog.commit_snapshot(self._table(st.name), out_path, df.schema.json(), rows)
            self._record_lineage(st.name, stats)
            self._record_metrics(st.name, time.perf_counter() - t0, rows, nparts, "ok")
            # operators persist self-join bases (LSH sets, simhash
            # signatures — cacheutil.attach_bases); the snapshot is
            # committed, so those caches are dead weight from here on
            from .cacheutil import unpersist_bases

            unpersist_bases(df)
            outputs[st.name] = self.spark.read.parquet(out_path)
        return outputs

    def read_snapshot(self, stage: str, snapshot_id: str | None = None) -> DataFrame:
        """Time travel: read a stage's output at a given snapshot
        (default: the current one)."""
        if snapshot_id is None:
            snap = self.catalog.current_snapshot(self._table(stage))
            if snap is None:
                raise KeyError(f"no committed snapshot for stage {stage!r}")
        else:
            matches = [
                s for s in self.catalog.snapshots(self._table(stage)) if s["snapshot_id"] == snapshot_id
            ]
            if not matches:
                raise KeyError(f"snapshot {snapshot_id!r} not found for {stage!r}")
            snap = matches[0]
        return self.spark.read.parquet(snap["data_path"])
