"""Partition-width control for CPU-bound kernels.

Problem shape: several operators run expensive per-row compute —
interpreted higher-order array folds (dot products, rolling hashes),
md5-per-shingle transforms, nested-loop candidate joins — whose input
at test scale is a single small parquet file. Spark sizes scan
partitions by bytes (``spark.sql.files.maxPartitionBytes``), so a
600 KB corpus reads as ONE partition and a 25-second kernel runs on
one core of 32. On a production cluster the corpus is thousands of
files/row-groups and the scan is already wide, so a bytes-based
heuristic is right for I/O — but a kernel whose cost is per-row CPU,
not bytes, must never be narrower than the available slots.

``spread`` widens a DataFrame to at least the session's default
parallelism with a round-robin repartition. It is a narrow, cheap
shuffle of the kernel *input* (the small side of the work); it never
shrinks an already-wide plan, so at cluster scale — where the scan
provides the width — it is a no-op and costs one driver-side plan
compile to inspect the partition count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Ensure `df` has at least `min_partitions` (default: the
    session's ``sparkContext.defaultParallelism``) partitions before a
    CPU-bound kernel. No-op when the plan is already at least that
    wide — never coalesces."""
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
