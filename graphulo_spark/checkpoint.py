"""Per-superstep checkpoint / resume with lineage metadata and per-partition metrics.

Graphulo's recovery machinery (RemoteWriteIterator numEntriesCheckpoint
monitoring entries + tear-down re-seek recovery, skvi/RemoteWriteIterator.java:
153,441-453,560-568) recovers *within* one scan. Spark's task retry subsumes
that; what the engine adds (SURVEY.md §4 checkpoint row) is *superstep* resume:
every iteration's state lands in parquet with a manifest carrying

- superstep number, algorithm params hash (so a resume with different params
  refuses to continue a mismatched run),
- partitioner spec (how the state was laid out — survives repartitioning),
- per-partition metrics (rows per Spark partition),
- lineage (parent superstep, wall time).

A superstep directory is valid only when its ``_MANIFEST.json`` exists — the
manifest is written *after* the parquet commit, so a killed run leaves at most
one incomplete directory which resume ignores.

The iterative algorithms deliberately *read state back from the checkpoint*
each superstep instead of chaining DataFrame lineage: that truncates lineage
(Graphulo's temp-table ping-pong, Graphulo.java:2131-2208) and makes an
interrupted-then-resumed run byte-identical to an uninterrupted one — both
execute every superstep from the same on-disk input.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time
from typing import Any

from pyspark.sql import DataFrame, SparkSession

MANIFEST = "_MANIFEST.json"


def _params_hash(params: dict[str, Any]) -> str:
    return hashlib.sha256(json.dumps(params, sort_keys=True, default=str).encode()).hexdigest()[:16]


class SuperstepCheckpointer:
    """Manages ``run_dir/step=K/`` parquet state + manifests."""

    def __init__(self, spark: SparkSession, run_dir: str, params: dict[str, Any] | None = None):
        self.spark = spark
        self.run_dir = run_dir
        self.params = params or {}
        self.params_hash = _params_hash(self.params)
        os.makedirs(run_dir, exist_ok=True)

    # -- write ---------------------------------------------------------------
    def save(self, step: int, state: DataFrame, extra: dict[str, Any] | None = None) -> DataFrame:
        """Write state parquet + manifest; return the re-read DataFrame
        (lineage-truncated — use the return value for the next superstep)."""
        path = self._step_dir(step)
        data_path = os.path.join(path, "state")
        if os.path.exists(path):
            shutil.rmtree(path)  # incomplete leftover from a killed run
        t0 = time.time()
        state.write.mode("overwrite").parquet(data_path)
        reread = self.spark.read.parquet(data_path)
        # per-partition metrics from parquet footers (driver-side, no extra
        # Spark job per superstep): one entry per written partition file
        import pyarrow.parquet as pq

        part_metrics = {}
        for fn in sorted(os.listdir(data_path)):
            if fn.startswith("part-") and fn.endswith(".parquet"):
                fpath = os.path.join(data_path, fn)
                md = pq.ParquetFile(fpath).metadata
                part_metrics[fn] = {"rows": md.num_rows, "bytes": os.path.getsize(fpath)}
        manifest = {
            "step": step,
            "params_hash": self.params_hash,
            "params": {k: str(v) for k, v in self.params.items()},
            "schema": reread.schema.json(),
            "partitioner": {
                "num_partitions": len(part_metrics),
                "layout": "parquet-files",
            },
            "partition_metrics": part_metrics,
            "lineage": {
                "parent_step": step - 1 if step > 0 else None,
                "wall_time_s": round(time.time() - t0, 4),
                "written_at": time.time(),
            },
        }
        if extra:
            manifest["extra"] = extra
        tmp = os.path.join(path, MANIFEST + ".tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1)
        os.replace(tmp, os.path.join(path, MANIFEST))
        return reread

    # -- read ----------------------------------------------------------------
    def latest_step(self) -> int | None:
        """Highest superstep with a complete manifest and matching params."""
        best = None
        if not os.path.isdir(self.run_dir):
            return None
        for d in os.listdir(self.run_dir):
            if not d.startswith("step="):
                continue
            mpath = os.path.join(self.run_dir, d, MANIFEST)
            if not os.path.exists(mpath):
                continue
            with open(mpath) as f:
                m = json.load(f)
            if m.get("params_hash") != self.params_hash:
                continue
            step = int(d.split("=", 1)[1])
            best = step if best is None else max(best, step)
        return best

    def load(self, step: int) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self._step_dir(step), "state"))

    def manifest(self, step: int) -> dict[str, Any]:
        with open(os.path.join(self._step_dir(step), MANIFEST)) as f:
            return json.load(f)

    def _step_dir(self, step: int) -> str:
        return os.path.join(self.run_dir, f"step={step}")
