"""Snapshot checkpoint manager (north_rule: resumable jobs with
per-partition lineage + row/byte metrics).

Iceberg-style semantics emulated over parquet (the Iceberg runtime jar is
absent in this sandbox — see SURVEY.md §7): every stage materialization is
a versioned parquet directory plus a JSON manifest entry recording
snapshot id, parent snapshot, row count, file count/bytes and per-file
stats. ``run_stage`` is idempotent: a stage whose snapshot exists is
*not* recomputed — a killed pipeline resumes from its last completed
stage. With an Iceberg catalog present, ``format("iceberg")`` drops in at
the two marked call sites.

Reference analog: the joblib stage caches (pipelines.py:49-65,485-514;
utils.py:238-247) — but content-addressed by stage name + params hash and
carrying metrics instead of opaque pickles.
"""

from __future__ import annotations

import hashlib
import json
import os
import time

from pyspark.sql import DataFrame, SparkSession


class CheckpointManager:
    def __init__(self, spark: SparkSession, root: str, run_id: str = "default"):
        self.spark = spark
        self.root = root
        self.run_id = run_id
        self._dir = os.path.join(root, run_id)
        os.makedirs(self._dir, exist_ok=True)
        self._log_path = os.path.join(self._dir, "snapshot_log.json")

    # -- snapshot log -----------------------------------------------------

    def _read_log(self) -> list[dict]:
        if not os.path.exists(self._log_path):
            return []
        with open(self._log_path) as f:
            return json.load(f)

    def _append_log(self, entry: dict) -> None:
        log = self._read_log()
        log.append(entry)
        tmp = self._log_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(log, f, indent=1)
        os.replace(tmp, self._log_path)  # atomic commit of the snapshot

    def _stage_key(self, stage: str, params: dict | None) -> str:
        blob = json.dumps({"stage": stage, "params": params or {}}, sort_keys=True)
        return f"{stage}-{hashlib.md5(blob.encode()).hexdigest()[:10]}"

    def _stage_path(self, key: str) -> str:
        return os.path.join(self._dir, key)

    def completed(self, stage: str, params: dict | None = None) -> bool:
        key = self._stage_key(stage, params)
        return any(e["key"] == key and e["status"] == "committed" for e in self._read_log())

    # -- stage execution --------------------------------------------------

    def run_stage(
        self,
        stage: str,
        compute,
        params: dict | None = None,
        partition_by: list[str] | None = None,
    ) -> DataFrame:
        """Materialize ``compute()`` once; later runs read the snapshot."""
        key = self._stage_key(stage, params)
        path = self._stage_path(key)
        if self.completed(stage, params):
            return self.spark.read.parquet(path)  # iceberg: read snapshot

        t0 = time.time()
        df = compute()
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(path)  # iceberg: writeTo(...).createOrReplace()

        back = self.spark.read.parquet(path)
        row_count = back.count()
        files = []
        total_bytes = 0
        for dirpath, _, names in os.walk(path):
            for n in names:
                if n.endswith(".parquet"):
                    size = os.path.getsize(os.path.join(dirpath, n))
                    total_bytes += size
                    files.append(
                        {
                            "file": os.path.relpath(os.path.join(dirpath, n), path),
                            "bytes": size,
                        }
                    )
        log = self._read_log()
        self._append_log(
            {
                "key": key,
                "stage": stage,
                "params": params or {},
                "snapshot_id": len(log) + 1,
                "parent_snapshot_id": log[-1]["snapshot_id"] if log else None,
                "status": "committed",
                "wall_sec": round(time.time() - t0, 3),
                "row_count": row_count,
                "num_files": len(files),
                "total_bytes": total_bytes,
                "files": files,
            }
        )
        return back

    def metrics(self) -> list[dict]:
        """Per-stage lineage + metrics (row counts, bytes, timings)."""
        return [
            {k: v for k, v in e.items() if k != "files"} for e in self._read_log()
        ]
