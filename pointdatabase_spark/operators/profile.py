"""Column profiler — the ANALYZE-style statistics pass (null count,
distinct count, min/max per column) a pipeline runs before trusting or
optimizing over a new dataset.

Scale notes: all metrics fold into ONE aggregation over one scan.
With ``exact=True`` the multi-column COUNT(DISTINCT) plans through
Spark's Expand operator (each input row fans out once per profiled
column before the partial aggregate — row volume ×|cols|, still one
shuffle); that is the oracle-checkable mode. At 100 TB profile with
``exact=False``: HyperLogLog++ `approx_count_distinct` keeps the plan
a plain one-pass partial aggregate with constant-size sketches and no
Expand. The wide single-row result is unpivoted to (column, metrics)
rows via `stack` — a zero-shuffle projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(df: DataFrame, cols: list[str],
                    exact: bool = True) -> DataFrame:
    """One row per profiled column: (col_name, n_null, n_distinct,
    vmin, vmax). Columns must be numeric (min/max are reported as
    DOUBLE). ``exact=False`` swaps COUNT(DISTINCT) for
    approx_count_distinct — the 100 TB mode."""
    nd = F.countDistinct if exact else F.approx_count_distinct
    aggs = []
    for c in cols:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nn"),
            nd(c).alias(f"{c}__nd"),
            F.min(c).cast("double").alias(f"{c}__mn"),
            F.max(c).cast("double").alias(f"{c}__mx"),
        ]
    row = df.agg(*aggs)
    stack = ", ".join(
        f"'{c}', {c}__nn, CAST({c}__nd AS BIGINT), {c}__mn, {c}__mx"
        for c in cols)
    return row.select(F.expr(
        f"stack({len(cols)}, {stack}) "
        "AS (col_name, n_null, n_distinct, vmin, vmax)"))
