"""Incremental maintenance of the multi-resolution rollup — the
time-domain twin of the tile store's per-cycle recompute
(plans/tile_build.py append_cycle/recompute_tiles): a continuous
aggregate that stays correct under out-of-order arrivals.

Design (mirrors the reference's queue-driven "re-make affected tiles"
flow, run_tile_updates:6-24, transplanted to time buckets):

- the FINEST resolution level is materialized as partitioned parquet
  (partition column = UTC day of the bucket), maintained by a
  foreachBatch availableNow stream over the landing directory;
- each micro-batch recomputes the finest buckets it TOUCHES from the
  accumulated raw landing data and rewrites exactly those bucket-day
  partitions via dynamic partition overwrite.  Recompute-from-raw
  (not merge-into-stored) makes the sink IDEMPOTENT: a batch retried
  after a partial write just re-makes the same partitions, so
  exactly-once falls out of at-least-once delivery — the same
  argument as tile recompute;
- coarser levels are DERIVED on read by re-aggregating the stored
  finest level (count/sum/min/max merge), never maintained
  separately — one source of truth, no cross-level drift.

At 100 TB the per-batch cost is O(raw rows in affected days), not
O(history): late data touches old days rarely; the raw re-read
filters with plain ts RANGE predicates (pushed to Parquet row-group
min/max stats — time-ordered ingest makes them tight), and the
overwrite touches only the affected day partitions.  Partition the
landing directory by ingest date to turn the row-group skip into
directory-level pruning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pointdatabase_spark.operators.temporal import _floor_div, \
    rollup_leaf_aggs

_DAY_US = 86_400_000_000


def _fine_agg(df: DataFrame, keys: list[str], ts: str, value: str,
              res_s: int) -> DataFrame:
    res_us = res_s * 1_000_000
    bucket = (_floor_div(F.col(ts), res_us) * F.lit(res_us)).cast("long")
    return (df.groupBy(*keys, bucket.alias("bucket_us"))
            .agg(*rollup_leaf_aggs(value))
            .withColumn("day_us", (_floor_div(F.col("bucket_us"), _DAY_US)
                                   * F.lit(_DAY_US)).cast("long")))


def run_rollup_maintenance(spark: SparkSession, landing: str, glob: str,
                           schema, rollup_path: str, checkpoint: str,
                           keys: list[str], ts: str, value: str,
                           res_s: int = 60) -> None:
    """Drain the landing directory (availableNow) and bring the stored
    finest-level rollup up to date.  Restart-safe: file offsets are
    checkpointed, and the per-day recompute is idempotent.

    ``res_s`` must divide a day: buckets then never straddle the
    partition boundary, so "days whose rows this batch touches" and
    "days whose buckets this batch touches" coincide — without this a
    bucket starting at 23:57 of the previous day would be written into
    a day partition the recompute did not rebuild, corrupting it."""
    if 86_400 % int(res_s):
        raise ValueError(f"res_s={res_s} must divide 86400 s "
                         "(buckets may not straddle day partitions)")
    src = (spark.readStream.schema(schema)
           .option("pathGlobFilter", glob)
           .parquet(landing))

    def sink(batch_df, batch_id: int) -> None:
        sess = batch_df.sparkSession
        days = [r["day_us"] for r in
                batch_df.select((_floor_div(F.col(ts), _DAY_US)
                                 * F.lit(_DAY_US)).cast("long")
                                .alias("day_us")).distinct().collect()]
        if not days:
            return
        # recompute the touched days from ALL raw data (idempotent).
        # The filter is a disjunction of RANGE predicates on the raw
        # ts column — pushable to Parquet row-group min/max stats —
        # NOT a pmod-derived bucket expression (which would defeat
        # pushdown and rescan the full history every batch).
        raw = (sess.read.schema(schema)
               .option("pathGlobFilter", glob).parquet(landing))
        in_days = None
        for d in days:
            rng = (F.col(ts) >= F.lit(int(d))) & \
                  (F.col(ts) < F.lit(int(d) + _DAY_US))
            in_days = rng if in_days is None else (in_days | rng)
        fine = _fine_agg(raw.where(in_days), keys, ts, value, res_s)
        # dynamic overwrite scoped to THIS write (not session conf —
        # mutating the shared session would silently change unrelated
        # static-overwrite writes elsewhere)
        (fine.repartition("day_us")
         .write.mode("overwrite")
         .option("partitionOverwriteMode", "dynamic")
         .partitionBy("day_us")
         .parquet(rollup_path))

    (src.writeStream.foreachBatch(sink)
     .option("checkpointLocation", checkpoint)
     .trigger(availableNow=True)
     .start().awaitTermination())


def read_rollup(spark: SparkSession, rollup_path: str, keys: list[str],
                res_s: int, fine_res_s: int = 60) -> DataFrame:
    """A coarser continuous-aggregate view derived from the stored
    finest level (res_s must be a multiple of fine_res_s); res_s ==
    fine_res_s returns the stored level itself."""
    if res_s % fine_res_s:
        raise ValueError(f"{res_s} not a multiple of {fine_res_s}")
    fine = spark.read.parquet(rollup_path)
    if res_s == fine_res_s:
        return fine.select(*keys, "bucket_us", "n", "sum_v",
                           "min_v", "max_v")
    res_us = res_s * 1_000_000
    bucket = (_floor_div(F.col("bucket_us"), res_us)
              * F.lit(res_us)).cast("long")
    return (fine.groupBy(*keys, bucket.alias("bucket_us"))
            .agg(F.sum("n").alias("n"), F.sum("sum_v").alias("sum_v"),
                 F.min("min_v").alias("min_v"),
                 F.max("max_v").alias("max_v")))


def run_events_rollup_availablenow(spark: SparkSession, sf_dir: str,
                                   res_s: int = 60) -> str:
    """End-to-end runner over the shared events table: stage the
    events as an integer-μs landing dir (two files, so availableNow
    exercises multi-file draining), run the maintenance stream, and
    return the stored rollup's PATH (callers read/derive from it —
    one source of truth for the location).  Deterministic: the
    recompute is idempotent and availableNow drains everything.

    Paths are keyed by (pid, sf_dir): the oracle sweep and pytest may
    run this query concurrently from different processes/scale
    factors, and a shared fixed path would let one run rmtree the
    landing dir out from under the other's in-flight stream (or merge
    two scale factors into one store).  Still wiped per run, so
    repeated invocations in one process cannot accrete copies or
    resume from a stale checkpoint; one set of dirs per process is
    the bounded leftover."""
    import hashlib
    import os
    import shutil
    from pointdatabase_spark.functions import timeconv

    tag = (f"{os.getpid()}_"
           f"{hashlib.md5(sf_dir.encode()).hexdigest()[:8]}_{res_s}")
    landing = f"/tmp/pdb_rollup_{tag}_landing"
    dst = f"/tmp/pdb_rollup_{tag}_out"
    ckpt = f"/tmp/pdb_rollup_{tag}_ckpt"
    for p in (landing, dst, ckpt):
        shutil.rmtree(p, ignore_errors=True)
    from pointdatabase_spark import testkit
    # Via load_table, not a raw parquet read: the events fixture's
    # physical timestamp type has varied between rounds (ns vs us) and
    # load_table sets the nanosAsLong conf the ns variant requires.
    ev = testkit.load_table(spark, sf_dir, "events")
    ev = ev.select("event_type", timeconv.events_tus(ev).alias("tus"),
                   "value")
    ev.repartition(2).write.parquet(landing)
    schema = spark.read.parquet(landing).schema
    run_rollup_maintenance(spark, landing, "*.parquet", schema,
                           dst, ckpt, keys=["event_type"], ts="tus",
                           value="value", res_s=res_s)
    return dst
