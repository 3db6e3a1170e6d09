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
O(history): late data touches old days rarely, and partition pruning
limits both the raw re-read and the overwrite to those days.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pointdatabase_spark.operators.temporal import _floor_div

_DAY_US = 86_400_000_000


def _fine_agg(df: DataFrame, keys: list[str], ts: str, value: str,
              res_s: int) -> DataFrame:
    res_us = res_s * 1_000_000
    bucket = (_floor_div(F.col(ts), res_us) * F.lit(res_us)).cast("long")
    return (df.groupBy(*keys, bucket.alias("bucket_us"))
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(value).alias("sum_v"),
                 F.min(value).alias("min_v"),
                 F.max(value).alias("max_v"))
            .withColumn("day_us", (_floor_div(F.col("bucket_us"), _DAY_US)
                                   * F.lit(_DAY_US)).cast("long")))


def run_rollup_maintenance(spark: SparkSession, landing: str, glob: str,
                           schema, rollup_path: str, checkpoint: str,
                           keys: list[str], ts: str, value: str,
                           res_s: int = 60) -> None:
    """Drain the landing directory (availableNow) and bring the stored
    finest-level rollup up to date.  Restart-safe: file offsets are
    checkpointed, and the per-day recompute is idempotent."""
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
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
        # recompute the touched days from ALL raw data (idempotent);
        # the day filter prunes the raw scan to the affected partitions
        raw = (sess.read.schema(schema)
               .option("pathGlobFilter", glob).parquet(landing))
        day_col = (_floor_div(F.col(ts), _DAY_US)
                   * F.lit(_DAY_US)).cast("long")
        fine = _fine_agg(raw.where(day_col.isin(days)),
                         keys, ts, value, res_s)
        (fine.repartition("day_us")
         .write.mode("overwrite").partitionBy("day_us")
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
