"""SparkSession factory.

Session timezone is fixed to UTC: the reference parses tz-offset timestamps
and stores/compares them in UTC (reference validate_snapshots.py:59,130;
tests/test_process_snapshot.py:97).

Scale notes (targets a multi-executor cluster even though tests run
local[32]):
- AQE on: runtime coalescing of post-shuffle partitions, skew-join splitting,
  and dynamic broadcast selection replace hand-tuned partition counts.
- ``partitionOverwriteMode=dynamic``: idempotent per-partition fact reloads
  (the reference's delete-by-snapshot, process_snapshot.py:278).
- shuffle.partitions default 32 for local tests; on a real cluster leave AQE
  to coalesce from a deliberately high initial number (set via --conf).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "spark-siri-etl",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or get) a SparkSession configured for this engine."""
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # size-based coalescing (not parallelism-first): post-shuffle
        # partitions target the advisory byte size at EVERY scale instead of
        # the local core count — the scale-adaptive behaviour; the advisory
        # size is env-tunable for cluster deployments (default 64 MiB)
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
        .config(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            os.environ.get("SPARK_GRAFT_ADVISORY_PARTITION_BYTES", "64m"),
        )
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
