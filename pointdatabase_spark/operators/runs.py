"""Offset-run coalescing (O3) — the reference's I/O-minimization
rewrite: sort per-file row-ranges by start offset and merge runs that
touch or overlap (``i0[k] <= i1[prev] + 1``, geo_index.py:410-429).

In the Spark engine the *read path* gets this for free (the Parquet
reader coalesces row-group ranges), but the operator itself remains
useful for catalog maintenance: compacting bin-entry run lists after
incremental appends. Expressed with windows: a cumulative-max of run
ends marks where a new run starts; a running sum of those marks is the
run id; a groupBy collapses each run. Two window passes + one
aggregation — all shuffle on the file key only once (the windows and
the groupBy share the partitioning, so Catalyst reuses the exchange).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def coalesce_runs(df: DataFrame, group_cols: list[str],
                  start: str = "run_start",
                  end: str = "run_end") -> DataFrame:
    """Merge touching/overlapping [start, end] runs per group.
    Input rows must be unique on (group, start, end) for a
    deterministic order — dedup upstream if needed."""
    w = Window.partitionBy(*group_cols).orderBy(start, end)
    prev_max = F.max(end).over(
        w.rowsBetween(Window.unboundedPreceding, -1))
    flagged = df.withColumn(
        "_new_run",
        F.when(prev_max.isNull() | (F.col(start) > prev_max + 1), 1)
        .otherwise(0))
    run_id = F.sum("_new_run").over(
        w.rowsBetween(Window.unboundedPreceding, 0))
    return (flagged.withColumn("_run_id", run_id)
            .groupBy(*group_cols, "_run_id")
            .agg(F.min(start).alias(start),
                 F.max(end).alias(end),
                 F.count(F.lit(1)).alias("n_merged"))
            .drop("_run_id"))
