"""Ordered-funnel analysis over the events stream (§7.8 extension —
the product-analytics staple for an events pipeline; no reference
analog, the reference has no event semantics).

First-touch funnel semantics: a user reaches step k at the EARLIEST
event of ``steps[k]`` strictly after their step-(k-1) time; step 0 is
the user's earliest ``steps[0]`` event. ``within_us`` optionally
requires every later step to land within that horizon of the user's
step-0 time (the classic "converted within 7 days" constraint).

Scale shape: one map-combined MIN aggregation per step, all keyed by
user — the per-step join's build side is the previous step's
one-row-per-user frame, so each stage shuffles at most |users| rows
(not |events|), and the user-key partitioning established by step 0
is reused by every later stage's join and aggregation. No windows, no
per-user state, len(steps) passes total.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pointdatabase_spark.functions import rounding


def funnel_counts(events: DataFrame, steps: list[str],
                  user_col: str = "user_id",
                  type_col: str = "event_type",
                  ts_col: str = "tus",
                  within_us: int | None = None) -> DataFrame:
    """One row per funnel step: (step_idx, step, n_users) with
    n_users = users whose first-touch chain reaches the step."""
    if not steps:
        raise ValueError("steps must be non-empty")
    ev = events.select(F.col(user_col).alias("u"),
                       F.col(type_col).alias("et"),
                       F.col(ts_col).alias("t"))
    reach = (ev.where(F.col("et") == steps[0])
             .groupBy("u")
             .agg(F.min("t").alias("t"))
             .withColumn("t0", F.col("t")))
    out = [reach.agg(F.count(F.lit(1)).alias("n_users"))
           .select(F.lit(0).cast("long").alias("step_idx"),
                   F.lit(steps[0]).alias("step"), "n_users")]
    for k, st in enumerate(steps[1:], start=1):
        cond = ((F.col("e.u") == F.col("r.u"))
                & (F.col("e.t") > F.col("r.t")))
        if within_us is not None:
            cond = cond & (F.col("e.t")
                           <= F.col("r.t0") + F.lit(int(within_us)))
        reach = (ev.where(F.col("et") == st).alias("e")
                 .join(reach.alias("r"), cond)
                 .groupBy(F.col("e.u").alias("u"))
                 .agg(F.min(F.col("e.t")).alias("t"),
                      F.min(F.col("r.t0")).alias("t0")))
        out.append(reach.agg(F.count(F.lit(1)).alias("n_users"))
                   .select(F.lit(k).cast("long").alias("step_idx"),
                           F.lit(st).alias("step"), "n_users"))
    res = out[0]
    for f in out[1:]:
        res = res.unionByName(f)
    return res


def cohort_retention(events: DataFrame, user_col: str = "user_id",
                     ts_col: str = "tus",
                     bucket_us: int = 7 * 86_400_000_000) -> DataFrame:
    """Cohort retention: users are cohorted by the bucket of their
    FIRST event; for every (cohort, offset) cell, the number of
    cohort members active ``offset`` buckets after their cohort
    bucket, plus the cohort size and the retention rate (offset 0 is
    the cohort itself, rate 1 by construction).

    Scale shape: one map-combined MIN per user (first touch), one
    distinct over (user, bucket) — both shuffle user-sized keys, not
    events — then a skinny (cohort, offset) count; the per-user join
    is user-keyed and reuses the first-touch partitioning.  The
    product-analytics staple at 100 TB without a single window.
    """
    from pointdatabase_spark.operators.temporal import _floor_div
    b = _floor_div(F.col(ts_col), bucket_us)
    ev = events.select(F.col(user_col).alias("u"), b.alias("w"))
    first = ev.groupBy("u").agg(F.min("w").alias("w0"))
    active = ev.distinct()
    cells = (active.join(first, "u")
             .groupBy(F.col("w0").alias("cohort_bucket"),
                      (F.col("w") - F.col("w0")).alias("offset"))
             .agg(F.count(F.lit(1)).alias("n_active")))
    sizes = first.groupBy(F.col("w0").alias("cohort_bucket")) \
        .agg(F.count(F.lit(1)).alias("cohort_size"))
    return (cells.join(sizes, "cohort_bucket")
            .select("cohort_bucket", "offset", "n_active", "cohort_size",
                    rounding.qround(F.col("n_active") / F.col("cohort_size"), 6)
                    .alias("retention")))
