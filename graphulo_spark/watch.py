"""Per-span performance counters — Graphulo Watch parity.

Reference: skvi/Watch.java (spans + counters on top of Accumulo's StopWatch,
thread-local, gated by ``enableTrace``; spans like ATnext/Multiply/WriteFlush
time the server-side iterator stack). In Spark the iterator stack is gone, so
the engine-level equivalents are *named driver spans* around plan sections
plus the executor-side truth Spark already aggregates: per-span wall time,
invocation count, and a snapshot of cluster-wide executor/task activity taken
from the SparkStatusTracker at span close.

Same usage discipline as the reference: cheap no-op unless enabled
(``Watch.enable_trace``), per-instance (the reference is per-thread),
``report()`` at the end (the reference's print75/logAll).

The per-superstep *state* metrics (rows/bytes per partition, lineage, wall
time) live in the checkpoint manifests (checkpoint.py) — these spans cover
the in-between: how long each named phase of a job took and how often it ran.
"""

from __future__ import annotations

import time
from contextlib import contextmanager
from typing import Any

from pyspark.sql import SparkSession


class Watch:
    """Named spans + counters. ``with watch.span("Multiply"): ...``"""

    enable_trace: bool = True  # reference default is off; engine default on —
    # a Watch object only exists when the caller wants it

    def __init__(self, spark: SparkSession | None = None):
        self.spark = spark
        self.spans: dict[str, dict[str, float]] = {}
        self.counters: dict[str, int] = {}

    # -- spans ---------------------------------------------------------------
    @contextmanager
    def span(self, name: str):
        """Time a named section (Watch.java start/stop). Nestable; distinct
        names accumulate independently (the reference's EnumMap of spans)."""
        if not Watch.enable_trace:
            yield self
            return
        t0 = time.time()
        try:
            yield self
        finally:
            dt = time.time() - t0
            s = self.spans.setdefault(
                name, {"total_s": 0.0, "count": 0, "min_s": float("inf"), "max_s": 0.0}
            )
            s["total_s"] += dt
            s["count"] += 1
            s["min_s"] = min(s["min_s"], dt)
            s["max_s"] = max(s["max_s"], dt)
            if self.spark is not None:
                # executor-side activity snapshot at span close (the Spark
                # stand-in for the reference's server-side iterator counters)
                try:
                    tr = self.spark.sparkContext.statusTracker()
                    s["active_jobs_at_close"] = float(len(tr.getActiveJobsIds()))
                except Exception:
                    pass

    # -- counters (Watch.java increment) --------------------------------------
    def increment(self, name: str, delta: int = 1) -> None:
        if Watch.enable_trace:
            self.counters[name] = self.counters.get(name, 0) + delta

    # -- reporting (Watch.java print75/logAll) ---------------------------------
    def report(self) -> dict[str, Any]:
        out: dict[str, Any] = {"spans": {}, "counters": dict(self.counters)}
        for name, s in self.spans.items():
            mean = s["total_s"] / s["count"] if s["count"] else 0.0
            out["spans"][name] = {**{k: round(v, 6) for k, v in s.items()}, "mean_s": round(mean, 6)}
        return out
