"""Range-sliced replacements for global ordered windows.

``Window.orderBy(...)`` with no ``partitionBy`` plans as Exchange
SinglePartition + a ONE-task sort — the row-table global window this
repo bans (tests/test_plans.py pins the doctrine registry-wide). The
r11 budget_select/chi2_drift rewrites established the distributed
form, and this module factors it so every ordered-sweep operator
(vocabulary ranks, prefix maxima) shares one audited implementation:

1. ``repartitionByRange`` on the (group, order) key splits the total
   order into ``slices`` balanced range slices; ``spark_partition_id``
   names each slice, and the frame is persisted so BOTH consumers
   (the per-slice summary and the per-row pass) read one
   materialization — the ``_pid``-consistency argument is a storage
   fact, not a determinism assumption about the range sampler.
2. A per-slice summary (count / max) collapses to O(slices · groups)
   rows; ONE tiny window ordered by ``_pid`` (excluded by name from
   the plan detector — it is O(slices) by construction) turns the
   summaries into per-slice offsets.
3. Each row combines its slice offset with a SLICE-LOCAL window —
   fully parallel, no stage ever holds more than one slice.

Because a running rank / prefix max over a total order is a pure
function of the data (slice boundaries cancel out), the output is
bit-identical to the single-partition form on any layout — pinned by
adversarial-repartition tests (tests/test_extensions.py). Callers
must release the returned cache handle after their last action (the
snm_candidate_audit eager-first() pattern) or document the
``clearCache()`` contract. No reference counterpart (extension
surface; the scale remedy named by VERDICT r11 item #2).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _cols(cs) -> list[Column]:
    return [F.col(c) if isinstance(c, str) else c for c in cs]


def _n_slices(df: DataFrame, slices: int | None) -> int:
    """``slices=None`` follows the session's shuffle parallelism, so
    the slice width scales with the cluster the way every other
    exchange does (32 on the local test sessions; thousands on a
    real cluster where the swept table is itself corpus-scale).
    Non-numeric conf values (e.g. ``auto`` under some resource
    managers) fall back to the scheduler's default parallelism
    (ADVICE r12)."""
    if slices is not None:
        return int(slices)
    raw = df.sparkSession.conf.get("spark.sql.shuffle.partitions",
                                   "200")
    try:
        return int(raw)
    except (TypeError, ValueError):
        return int(df.sparkSession.sparkContext.defaultParallelism)


def range_row_number(df: DataFrame, order_cols: list,
                     group_cols: list[str] | None = None,
                     out_col: str = "r",
                     slices: int | None = None
                     ) -> tuple[DataFrame, DataFrame]:
    """``row_number() OVER ([PARTITION BY group] ORDER BY order_cols)``
    without the single-task global sort: global rank = slice offset
    (prefix count of earlier slices) + slice-local row_number.

    ``order_cols`` must be a total order WITHIN each group (unique
    composite key) — exactly the precondition under which the global
    window itself is deterministic. Returns ``(ranked, cache)``:
    ``ranked`` carries ``out_col`` (BIGINT, 1-based) plus the input
    columns; ``cache`` is the persisted slice frame the caller MUST
    ``unpersist()`` after its last action over ``ranked``."""
    gc = list(group_cols or [])
    oc = _cols(order_cols)
    part = (df.repartitionByRange(_n_slices(df, slices), *_cols(gc), *oc)
            .withColumn("_pid", F.spark_partition_id())
            .persist())
    cnt = part.groupBy("_pid", *gc).agg(
        F.count(F.lit(1)).cast("long").alias("_n"))
    owin = ((Window.partitionBy(*gc) if gc else Window)
            .orderBy("_pid")
            .rowsBetween(Window.unboundedPreceding, -1))
    offs = (cnt.withColumn(
        "_off", F.coalesce(F.sum("_n").over(owin), F.lit(0).cast("long")))
        .select("_pid", *gc, "_off"))
    lwin = Window.partitionBy("_pid", *gc).orderBy(*oc)
    ranked = (part.withColumn("_lr", F.row_number().over(lwin))
              .join(F.broadcast(offs), ["_pid", *gc])
              .withColumn(out_col,
                          (F.col("_off") + F.col("_lr")).cast("long"))
              .drop("_pid", "_lr", "_off"))
    return ranked, part


def range_prefix_max(df: DataFrame, order_cols: list, value_col: str,
                     out_col: str = "_pm",
                     slices: int | None = None
                     ) -> tuple[DataFrame, DataFrame]:
    """``max(value) OVER (ORDER BY order_cols ROWS UNBOUNDED PRECEDING
    TO 1 PRECEDING)`` — the strict-prefix running max (NULL for the
    first row, the skyline-sweep shape) — without the single-task
    sort: prefix max = greatest(max of all earlier slices, slice-local
    strict-prefix max), where ``greatest`` skips NULL operands exactly
    like the window's empty-frame NULL.

    Same contract as :func:`range_row_number`: ``order_cols`` must be
    a total order; returns ``(swept, cache)`` and the caller releases
    ``cache`` after its last action."""
    oc = _cols(order_cols)
    part = (df.repartitionByRange(_n_slices(df, slices), *oc)
            .withColumn("_pid", F.spark_partition_id())
            .persist())
    tot = part.groupBy("_pid").agg(F.max(value_col).alias("_sm"))
    owin = (Window.orderBy("_pid")
            .rowsBetween(Window.unboundedPreceding, -1))
    offs = (tot.withColumn("_off", F.max("_sm").over(owin))
            .select("_pid", "_off"))
    lwin = (Window.partitionBy("_pid").orderBy(*oc)
            .rowsBetween(Window.unboundedPreceding, -1))
    swept = (part.withColumn("_lm", F.max(value_col).over(lwin))
             .join(F.broadcast(offs), "_pid")
             .withColumn(out_col, F.greatest("_off", "_lm"))
             .drop("_pid", "_lm", "_off"))
    return swept, part


def range_prefix_sum(df: DataFrame, order_cols: list, value_col: str,
                     group_cols: list[str] | None = None,
                     out_col: str = "_run",
                     slices: int | None = None
                     ) -> tuple[DataFrame, DataFrame]:
    """``sum(value) OVER ([PARTITION BY group] ORDER BY order_cols
    ROWS UNBOUNDED PRECEDING TO CURRENT ROW)`` — the INCLUSIVE running
    sum (budget cuts, token ledgers) — without the single-task sort:
    running sum = sum of all earlier slices (within the group) +
    slice-local inclusive running sum. ``value_col`` is summed as
    BIGINT (exact; cast upstream for other types).

    Same contract as :func:`range_row_number`: ``order_cols`` must be
    a total order within each group; returns ``(swept, cache)`` and
    the caller releases ``cache`` after its last action."""
    gc = list(group_cols or [])
    oc = _cols(order_cols)
    part = (df.repartitionByRange(_n_slices(df, slices), *_cols(gc), *oc)
            .withColumn("_pid", F.spark_partition_id())
            .persist())
    tot = part.groupBy("_pid", *gc).agg(
        F.sum(F.col(value_col).cast("long")).alias("_st"))
    owin = ((Window.partitionBy(*gc) if gc else Window)
            .orderBy("_pid")
            .rowsBetween(Window.unboundedPreceding, -1))
    offs = (tot.withColumn(
        "_off", F.coalesce(F.sum("_st").over(owin),
                           F.lit(0).cast("long")))
        .select("_pid", *gc, "_off"))
    lwin = (Window.partitionBy("_pid", *gc).orderBy(*oc)
            .rowsBetween(Window.unboundedPreceding, 0))
    swept = (part.withColumn(
        "_ls", F.sum(F.col(value_col).cast("long")).over(lwin))
        .join(F.broadcast(offs), ["_pid", *gc])
        .withColumn(out_col, (F.col("_off") + F.col("_ls")).cast("long"))
        .drop("_pid", "_ls", "_off"))
    return swept, part
