"""Checkpoint / resume / lineage layer (SURVEY.md §7.1, north_rule:
"resumable from checkpoint with per-partition lineage and row-count
metrics").

Iceberg-shaped semantics over a plain Parquet directory layout (no
iceberg-spark-runtime jar is bundled in this environment; the API here is
what an Iceberg catalog would provide, so swapping the backend is a local
change):

  <root>/<stage>/<snapshot_key>/   parquet data (+ _SUCCESS)
  <root>/<stage>/<snapshot_key>/_manifest.json
       {stage, snapshot_key, config_hash, input_snapshot, rows,
        partitions: {pid: rows}, wall_sec, written_at}
  <root>/_lineage.jsonl            append-only per-stage metrics log

snapshot_key = hash(input_snapshot, config_hash, stage): a rerun with the
same inputs and config skips recompute; ANY config change produces a new
key and never reuses stale data (SURVEY.md §7.4.4).
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def snapshot_key(input_snapshot: str, config_hash: str, stage: str) -> str:
    payload = json.dumps([input_snapshot, config_hash, stage])
    return hashlib.sha256(payload.encode()).hexdigest()[:20]


@dataclass
class CheckpointStore:
    root: str
    input_snapshot: str
    config_hash: str

    def _dir(self, stage: str) -> str:
        return os.path.join(
            self.root, stage,
            snapshot_key(self.input_snapshot, self.config_hash, stage),
        )

    def _manifest_path(self, stage: str) -> str:
        return os.path.join(self._dir(stage), "_manifest.json")

    def exists(self, stage: str) -> bool:
        d = self._dir(stage)
        return os.path.exists(os.path.join(d, "_SUCCESS")) and os.path.exists(
            self._manifest_path(stage)
        )

    def read(self, spark: SparkSession, stage: str) -> DataFrame:
        return spark.read.parquet(self._dir(stage))

    def manifest(self, stage: str) -> dict:
        with open(self._manifest_path(stage)) as f:
            return json.load(f)

    def write(self, df: DataFrame, stage: str, wall_sec: float) -> DataFrame:
        d = self._dir(stage)
        df.write.mode("overwrite").parquet(d)
        spark = df.sparkSession
        back = spark.read.parquet(d)
        per_part = {
            str(r["pid"]): r["n"]
            for r in back.groupBy(F.spark_partition_id().alias("pid"))
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        man = {
            "stage": stage,
            "snapshot_key": snapshot_key(
                self.input_snapshot, self.config_hash, stage
            ),
            "config_hash": self.config_hash,
            "input_snapshot": self.input_snapshot,
            "rows": int(sum(per_part.values())),
            "partitions": per_part,
            "wall_sec": round(wall_sec, 3),
            "written_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        }
        with open(self._manifest_path(stage), "w") as f:
            json.dump(man, f, indent=1)
        with open(os.path.join(self.root, "_lineage.jsonl"), "a") as f:
            f.write(json.dumps(man) + "\n")
        return back

    def get_or_compute(
        self, spark: SparkSession, stage: str, compute
    ) -> tuple[DataFrame, bool]:
        """Returns (df, was_cached).  `compute` is a zero-arg callable
        returning the stage DataFrame; it is only invoked on a miss."""
        if self.exists(stage):
            return self.read(spark, stage), True
        t0 = time.perf_counter()
        df = compute()
        out = self.write(df, stage, time.perf_counter() - t0)
        return out, False


def input_snapshot_of(paths: list[str]) -> str:
    """Poor-man's snapshot id for plain files: path + mtime + size digest
    (an Iceberg catalog would give us a real snapshot id)."""
    h = hashlib.sha256()
    for p in sorted(paths):
        st = os.stat(p)
        h.update(f"{p}:{st.st_mtime_ns}:{st.st_size}".encode())
    return h.hexdigest()[:20]
