"""SparkSession factory.

Local testing runs on ``local[N]`` but every conf below is chosen for the
1000-executor / 100 TB target:

- AQE on (runtime re-plan, skew-join splitting, partition coalescing);
- broadcast threshold raised so dimension tables (region/nation/supplier,
  signal/config tables in the trading surface) never shuffle;
- Arrow enabled for every pandas-UDF exchange;
- shuffle partitions sized for the local core count — on a real cluster this
  is overridden (AQE coalescing makes over-partitioning cheap, so scale this
  with cluster cores, not data size).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "portofolio_maximizer_spark",
    cpus: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the process-wide SparkSession."""
    cpus = cpus or DEFAULT_CPUS
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        # --- shuffle / parallelism ---
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.default.parallelism", str(cpus))
        # --- adaptive execution: runtime coalescing + skew handling ---
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # --- broadcast dims aggressively (region/nation/supplier/part) ---
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # --- Arrow for every pandas-UDF / toPandas exchange ---
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # --- timestamps: UTC everywhere (reference normalizes to UTC) ---
        .config("spark.sql.session.timeZone", "UTC")
        # Read un-adjusted parquet timestamps as TIMESTAMP_LTZ, not NTZ:
        # the session TZ is pinned to UTC so the instant is identical, and
        # LTZ supports the epoch arithmetic (cast to double / unix_micros)
        # the windowing + validation operators rely on.
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        # --- parquet: pushdown on (default, stated for clarity) ---
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
