"""SparkSession factory with scale-oriented defaults.

Every knob here is chosen for the 100 TB / 1000-executor target and merely
scaled down for local[N] testing:
  * AQE on (runtime coalesce + skew-join splitting) — the corpus has a
    deliberate hot entity (~20% of pages), so skewed shuffle handling is load-
    bearing, not decorative.
  * Arrow enabled with a bounded batch size (reference embeds in batches
    <=2048, utilities/common.py:28-33 — same order of magnitude).
  * shuffle.partitions defaults to 2x cores locally; on a real cluster this is
    overridden via spark-submit --conf (bench.py exercises 8 vs 32 cores).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "kg-studio-spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra: dict[str, str] | None = None,
) -> SparkSession:
    cores = cores or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle_partitions = shuffle_partitions or max(2 * cores, 8)
    b = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cores}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # keep AQE active for plans that are persist()ed: without this a
        # cached plan is compiled with AQE's runtime re-planning disabled
        # (fixed shuffle partitioning, no broadcast demotion/promotion) —
        # measured 2.5x slower on the node-materialization stage when the
        # tiny result frame is cached for reuse.
        .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
                "true")
        # collect_set/collect_list aggregations (the salted node/edge merge)
        # run as ObjectHashAggregate, which silently degrades to SORT-based
        # aggregation after 128 distinct keys per task (the conservative
        # default) — i.e. a full sort of the 2x-triples endpoint stream.
        # The salted merge bounds per-task hash-map entries to (entities
        # present in the task) x salt with set buffers totalling at most the
        # task's input size, so a much higher key threshold is safe and keeps
        # the agg hash-based.
        .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
                "65536")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
