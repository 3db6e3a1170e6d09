"""Core OLAP aggregation surfaces (§7.8 extension): top-k per group,
exact percentile ladders, and ROLLUP/CUBE grouping sets.  Thin,
deliberately declarative wrappers — the value is pinning the exact
semantics (tie rules, interpolation, grouping-id encoding) with
oracle coverage, while Catalyst keeps the physical plan free to use
partial aggregation and AQE.

Scale notes:
- ``top_k_per_group`` is rank-filter over a window; Spark plans the
  rank filter as a running TopK per partition when the window has a
  limit-like predicate pushed (Spark 3.5+ WindowGroupLimit), so each
  group materializes k rows, not the full group, before the filter.
- ``percentile_by_group`` uses the EXACT ``percentile`` aggregate
  (sort-based within group).  At 100 TB switch ``exact=False`` for
  ``approx_percentile`` (t-digest-style sketch, map-combinable,
  bounded memory) — same call shape, documented accuracy trade.
- ``rollup_agg`` emits grouping sets in ONE pass (Catalyst expands
  to a single Expand + hash aggregate, partials map-side), versus
  the naive N unioned scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pointdatabase_spark.functions import rounding


def top_k_per_group(df: DataFrame, group_cols: list[str],
                    order_col: str, k: int, ascending: bool = False,
                    tiebreak: str | None = None) -> DataFrame:
    """Top-k rows per group by ``order_col`` (desc by default), with a
    deterministic ``tiebreak`` column (required for a stable result —
    row_number over a non-unique order is engine-dependent).  Adds
    ``rank_in_group``."""
    oc = F.col(order_col).asc() if ascending else F.col(order_col).desc()
    order = [oc] + ([F.col(tiebreak).asc()] if tiebreak else [])
    w = Window.partitionBy(*group_cols).orderBy(*order)
    return (df.withColumn("rank_in_group",
                          F.row_number().over(w).cast("long"))
            .where(F.col("rank_in_group") <= k))


def percentile_by_group(df: DataFrame, group_cols: list[str],
                        value_col: str, ps: list[float],
                        exact: bool = True) -> DataFrame:
    """Percentile ladder per group: one output column ``p<NN>`` per
    requested fraction.  ``exact=True`` → built-in ``percentile``
    (linear interpolation, matches DuckDB ``quantile_cont``);
    ``exact=False`` → ``approx_percentile`` for the 100 TB mode
    (map-combinable sketch; accuracy 1/10000)."""
    aggs, seen = [], set()
    for p in ps:
        pct = p * 100
        # p99.5 -> "p99_5": integral percents keep the short form,
        # fractional ones encode the decimals — naive int(round())
        # would collapse 0.995 and 0.999 into duplicate columns
        name = (f"p{int(pct):02d}" if float(pct).is_integer()
                else "p" + f"{pct:g}".replace(".", "_"))
        if name in seen:
            raise ValueError(f"duplicate percentile column {name!r}")
        seen.add(name)
        col = (F.percentile(value_col, F.lit(p)) if exact
               else F.approx_percentile(value_col, F.lit(p), F.lit(10000)))
        aggs.append(rounding.qround(col, 6).alias(name))
    return df.groupBy(*group_cols).agg(*aggs)


def rollup_agg(df: DataFrame, group_cols: list[str],
               aggs: list, cube: bool = False) -> DataFrame:
    """ROLLUP (or CUBE) aggregation over ``group_cols`` with a
    ``gid`` grouping-id column (bit i set ⇔ group_cols[i] is rolled
    up — Spark and ANSI GROUPING() share this encoding, most
    significant bit first).  One Expand pass, partial aggregation
    map-side."""
    g = df.cube(*group_cols) if cube else df.rollup(*group_cols)
    return g.agg(F.grouping_id().cast("long").alias("gid"), *aggs)
