"""Superstep state truncation that keeps Catalyst planning O(1) per round.

Every iterative algorithm here materializes its loop state each round so the
next round plans against a flat input (Graphulo's temp-table ping-pong,
Graphulo.java:2131-2208). The obvious Spark tool is
``DataFrame.localCheckpoint()`` — but in Spark 4.x the Dataset checkpoint
carries the ORIGIN PLAN'S ESTIMATED STATISTICS into the LogicalRDD it
returns. For a loop that is catastrophic: each round's joins multiply the
carried ``sizeInBytes`` estimates, the BigInt's bit length grows ~3-5× per
checkpoint GENERATION (not per plan node), and after ~20 cumulative rounds
the driver spends minutes per job inside ``BigInteger.multiply`` while
"planning" a 33-row join. Measured on this engine's SCC loop: round times
1 s → 25 s → 120 s on identical 33-row inputs; reliable ``checkpoint()``
exhibits the same blowup (it also preserves origin stats).

``materialize()`` therefore localCheckpoints (truncating lineage and pinning
the data in executor storage) and then REBUILDS the DataFrame over the
checkpointed RDD with fresh, unknown statistics. Unknown is also the honest
estimate — loop state sizes aren't knowable from the origin plan — and AQE
re-plans join strategies from true runtime sizes anyway, so nothing is lost.

The rebuild uses ``SparkSession.internalCreateDataFrame`` (JVM-side only, no
data movement; ``private[sql]`` in Scala but accessible — Scala access
modifiers don't survive into the JVM calling convention py4j uses). If the
API is unavailable (Spark Connect, future versions), we fall back to the
plain localCheckpoint: still correct, just exposed to the stats blowup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def materialize(df: DataFrame) -> DataFrame:
    """Eagerly materialize ``df`` (localCheckpoint) and return a DataFrame
    over the checkpointed data whose plan carries NO inherited statistics.

    Order matters: we wrap the plan's execution RDD in a stats-free
    LogicalRDD FIRST and localCheckpoint the wrapper. localCheckpoint then
    performs the row-copying materialization itself (``toRdd`` iterators
    reuse UnsafeRow buffers — caching them without the checkpoint's internal
    ``.map(_.copy())`` silently corrupts any downstream operator that
    buffers rows), and the origin stats it preserves are the wrapper's flat
    defaults, not the compounding join estimates."""
    # The try covers ONLY the JVM reflection (absent on Spark Connect or
    # after API drift) — the eager localCheckpoint runs outside it, so a
    # real execution failure (executor OOM, corrupt input) surfaces once
    # instead of being silently retried through the fallback.
    try:
        jdf = df._jdf
        jspark = df.sparkSession._jsparkSession
        fresh = DataFrame(
            jspark.internalCreateDataFrame(
                jdf.queryExecution().toRdd(), jdf.schema(), False
            ),
            df.sparkSession,
        )
    except Exception:  # Spark Connect / API drift: correctness over speed
        fresh = df
    return fresh.localCheckpoint()
