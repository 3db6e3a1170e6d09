"""SparkSession factory with scale-appropriate defaults.

Local testing runs on ``local[N]``; the same config block is what we
would ship to a 1000-executor cluster (AQE, skew-join handling, zstd,
Arrow for the pandas-UDF kernels). Nothing here is local-mode-specific
except the master URL.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Tuned for the target workload, not for toy data:
# - AQE re-plans shuffles at runtime (partition coalescing + skew splits);
#   crossover candidate joins on spatial bins are skew-prone (polar bins
#   hold many tracks), so skewJoin stays on.
# - shuffle.partitions is a starting point only; AQE coalesces.
# - maxPartitionBytes 128m keeps scan tasks memory-safe at 100 TB.
# - Arrow enabled: every custom kernel is a pandas UDF.
_DEFAULTS = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.parquet.compression.codec": "zstd",
    "spark.sql.files.maxPartitionBytes": "134217728",
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.parquet.aggregatePushdown": "true",
    "spark.sql.autoBroadcastJoinThreshold": "64m",
    # Engine semantics: we rely on standard SQL null/overflow behaviour,
    # not ANSI runtime errors, for oracle parity with DuckDB.
    "spark.sql.ansi.enabled": "false",
    "spark.sql.session.timeZone": "UTC",
    # the driver's events table carries TIMESTAMP(NANOS) parquet
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # The UI's in-memory job history measurably degrades repeated local
    # runs (observed 0.7s → 7s on identical plans); the engine is
    # headless — re-enable via extra_conf when debugging.
    "spark.ui.enabled": "false",
    "spark.ui.showConsoleProgress": "false",
}


def get_spark(app_name: str = "pointdatabase-spark", master: str | None = None,
              extra_conf: dict[str, str] | None = None) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults applied."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = SparkSession.builder.appName(app_name)
    builder = builder.master(master or f"local[{cpus}]")
    conf = dict(_DEFAULTS)
    conf["spark.sql.shuffle.partitions"] = cpus
    # 16g is ample for local sf0.1 work; an oversized heap (48g) showed
    # multi-second first-touch/GC stalls on identical repeated plans.
    conf["spark.driver.memory"] = os.environ.get("SPARK_DRIVER_MEM", "16g")
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
