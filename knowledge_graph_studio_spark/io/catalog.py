"""Table layer: parquet-backed, Iceberg-shaped, with a run manifest for
checkpointed resume.

The north rule requires per-partition lineage + metrics and restart from the
last committed partition. The reference gets atomic progress from Mongo
transactions in batches of 1000 triples plus a TTL'd task collection
(graph_service.py:509-746, cli/collection_index_config.json:156-168). Here the
atomic unit is a url-hash bucket: each bucket's output directory is written in
full, then its manifest record appears — a bucket with no manifest record is
treated as never-run and is overwritten idempotently on retry (rename-free
last-writer-wins, safe because content is deterministic per bucket).

In an Iceberg deployment the same interface maps onto `MERGE INTO` + snapshot
ids; the manifest schema is deliberately a plain table so it ports: partition
commits become Iceberg snapshot commits, and resume reads the snapshot log
instead of the JSON files. (SURVEY.md §7 "No Iceberg in sandbox" risk note.)
"""

from __future__ import annotations

import json
import os
import time
from typing import Any

from pyspark.sql import DataFrame, SparkSession

MANIFEST_DIR = "_manifest"


class RunManifest:
    """run_manifest(run_id, partition_id, stage, status, rows_out,
    triples_emitted, started_at, committed_at) — FIXTURES.md §6."""

    def __init__(self, workdir: str, run_id: str = "run0"):
        self.workdir = workdir
        self.run_id = run_id
        self.dir = os.path.join(workdir, MANIFEST_DIR)
        os.makedirs(self.dir, exist_ok=True)

    def _path(self, stage: str, partition_id: int) -> str:
        return os.path.join(self.dir, f"{stage}_p{partition_id:05d}.json")

    def committed(self, stage: str) -> set[int]:
        out = set()
        for f in os.listdir(self.dir):
            if f.startswith(f"{stage}_p") and f.endswith(".json"):
                with open(os.path.join(self.dir, f)) as fh:
                    rec = json.load(fh)
                if rec.get("status") == "committed":
                    out.add(rec["partition_id"])
        return out

    def commit(self, stage: str, partition_id: int, started_at: float,
               **metrics: Any) -> None:
        rec = {
            "run_id": self.run_id,
            "partition_id": partition_id,
            "stage": stage,
            "status": "committed",
            "started_at": started_at,
            "committed_at": time.time(),
            **metrics,
        }
        tmp = self._path(stage, partition_id) + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(rec, fh)
        os.replace(tmp, self._path(stage, partition_id))  # atomic publish

    def records(self) -> list[dict]:
        out = []
        for f in sorted(os.listdir(self.dir)):
            if f.endswith(".json"):
                with open(os.path.join(self.dir, f)) as fh:
                    out.append(json.load(fh))
        return out


def write_table(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).parquet(path)


def read_table(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)
