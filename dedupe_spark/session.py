"""SparkSession builders tuned for the engine.

Defaults target the sandbox (local[N], single JVM) but every knob is the one
you would set on a real multi-executor cluster: AQE on (runtime re-planning +
skew-join splitting), Arrow on (vectorized pandas UDF transfer), shuffle
partition count sized to the parallelism level, broadcast threshold for small
dimension/model tables.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Arrow batch size for the distance/scoring pandas UDFs: large enough to
# amortize the Python call round-trip (measured: 30k beats 10k by ~15% on
# the scoring stage at width 8 AND 32), small enough that a batch of
# (left, right) string pairs plus the DP scratch stays ~100-200 MB per
# worker — comfortable headroom on standard 4-8 GB/core executors.
ARROW_BATCH = 30_000


def get_spark(
    app_name: str = "dedupe_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    master defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32) in the
    sandbox; on a real cluster pass ``None`` and let spark-submit decide.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if master is None:
        master = f"local[{cpus}]"
    # Parse parallelism out of local[N] for shuffle sizing; on a cluster you
    # would size this to executors*cores (or rely on AQE coalescing).
    if shuffle_partitions is None:
        if master.startswith("local["):
            inner = master[len("local[") : -1]
            shuffle_partitions = cpus if inner == "*" else int(inner)
        else:
            shuffle_partitions = 200

    builder = SparkSession.builder.appName(app_name)
    # master == "cluster": leave the master to spark-submit / cluster
    # manager (the packaged entrypoint scripts/run_pipeline.py uses this)
    if master != "cluster":
        builder = builder.master(master)
    builder = (
        builder
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch", str(ARROW_BATCH)
        )
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # fresh Python worker per task: reused workers accumulate allocator
        # state across Arrow-UDF stages and measurably degrade (2-4x) over a
        # long session; startup (~100ms) amortizes over our batch sizes.
        # SPARK_GRAFT_WORKER_REUSE=true overrides for single-pipeline runs
        # (bench A/B, scaling children) where aging can't accumulate
        .config(
            "spark.python.worker.reuse",
            os.environ.get("SPARK_GRAFT_WORKER_REUSE", "false"),
        )
        # local[N] runs all executor threads inside the driver JVM — size the
        # heap for N concurrent tasks' shuffle + cache blocks or GC dominates
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "24g"))
        # batch engine, no latency SLO: the throughput collector beats G1's
        # pause-bounded collection at width 32 (~5% on the scoring stage,
        # measured via A/B on the scaling workload)
        .config("spark.driver.extraJavaOptions", "-XX:+UseParallelGC")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
