"""SparkSession construction tuned for this engine.

Local-mode knobs mirror what a 1000-executor cluster submit would set via
spark-submit conf: AQE on (runtime re-plan + skew-join splitting), Arrow on
(all our Python-side paths are pandas/Arrow vectorized, never per-row),
shuffle partitions sized to parallelism instead of the 200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def get_spark(
    app: str = "graphulo-spark",
    cores: int | str | None = None,
    shuffle_partitions: int | None = None,
    driver_memory: str | None = None,
    extra: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    ``cores`` is the local[] parallelism; defaults to $SPARK_GRAFT_CPUS or '*'.
    On a real cluster this function is bypassed — the engine only ever takes a
    SparkSession argument, so ``spark-submit --py-files graphulo_spark.zip``
    with cluster conf works unchanged.
    """
    cores = cores or os.environ.get("SPARK_GRAFT_CPUS", "*")
    if shuffle_partitions is None:
        try:
            shuffle_partitions = max(8, int(cores))
        except (TypeError, ValueError):
            shuffle_partitions = DEFAULT_SHUFFLE_PARTITIONS
    # shuffle through tmpfs when available: local-mode shuffles are disk I/O
    # on the driver host, and /dev/shm removes that bottleneck (measured ~30%
    # on SpMV supersteps). On a real cluster spark.local.dir comes from the
    # cluster conf (typically NVMe) — this default only matters for local[].
    local_dir = os.environ.get("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/graphulo-spark")
    try:
        os.makedirs(local_dir, exist_ok=True)
    except OSError:
        local_dir = "/tmp"
    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app)
        .config("spark.local.dir", local_dir)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", driver_memory or os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.extraJavaOptions", "-Djava.io.tmpdir=/tmp")
    )
    for k, v in (extra or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
