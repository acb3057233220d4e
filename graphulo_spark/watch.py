"""Per-span performance counters — Graphulo Watch parity.

Reference: skvi/Watch.java (spans + counters on top of Accumulo's StopWatch,
thread-local, gated by ``enableTrace``; spans like ATnext/Multiply/WriteFlush
time the server-side iterator stack). In Spark the iterator stack is gone, so
the engine-level equivalents are *named driver spans* around plan sections
plus the executor-side truth Spark already aggregates: per-span wall time,
invocation count, and — when a SparkSession is attached — the stages/tasks
completed and shuffle read/write bytes moved while the span was open, diffed
from the JVM AppStatusStore (so spans explain where the bytes went, not just
where the time went). Span attribution assumes the driver-span discipline
this engine uses (one job graph at a time per Watch); concurrent foreign jobs
on the same session would be counted into whichever span is open.

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

_EXEC_KEYS = ("stages", "tasks", "shuffle_read_bytes", "shuffle_write_bytes")


def _cluster_totals(spark: SparkSession) -> dict[str, int] | None:
    """Cumulative stage/task/shuffle totals from the JVM AppStatusStore —
    the same numbers the Spark UI's stage table shows, available even with
    ``spark.ui.enabled=false``. Spans diff two snapshots, so only deltas
    matter; the listener bus is asynchronous, so a close-time snapshot can
    trail the last task events by a beat (deltas are attributed to the next
    span rather than lost)."""
    try:
        sc = spark.sparkContext
        store = sc._jsc.sc().statusStore()
        gw = sc._gateway
        seq = store.stageList(
            None, False, False, gw.new_array(gw.jvm.double, 0), gw.jvm.java.util.ArrayList()
        )
        stages = seq.size()
        tasks = rd = wr = 0
        for i in range(stages):
            sd = seq.apply(i)
            tasks += sd.numCompleteTasks()
            rd += sd.shuffleReadBytes()
            wr += sd.shuffleWriteBytes()
        return {
            "stages": stages,
            "tasks": tasks,
            "shuffle_read_bytes": rd,
            "shuffle_write_bytes": wr,
        }
    except Exception:
        return None


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
        pre = _cluster_totals(self.spark) if self.spark is not None else None
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
            if pre is not None:
                # executor-side truth for the span: stages/tasks run and
                # shuffle bytes moved while it was open (the Spark stand-in
                # for the reference's server-side iterator counters — this is
                # where the bytes went). Deltas are clamped at 0: the status
                # store retains a bounded stage window, so a long run can
                # evict old stages and shrink the cumulative sums.
                post = _cluster_totals(self.spark)
                if post is not None:
                    for k in _EXEC_KEYS:
                        s[k] = s.get(k, 0) + max(0, post[k] - pre[k])

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
