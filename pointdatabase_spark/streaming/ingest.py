"""Structured Streaming ingest — the Spark upgrade of the reference's
batch re-index queue (run_tile_updates:6-24, SURVEY §2.9: the reference
has no streaming; this is the §7.8 extension for continuous pipelines).

Two surfaces:

- **File-source ingest** (`ingest_availablenow`): new files appearing
  in a landing directory stream into the bin-partitioned store with
  exactly-once file tracking (checkpointed source offsets). The
  `availableNow` trigger drains everything present then stops — the
  same incremental semantics as the reference's per-cycle queue, minus
  the hand-rolled bookkeeping. At scale this runs continuously
  (`processingTime` trigger) with the same code.

- **Watermarked windowed aggregation** (`windowed_counts`): tumbling
  event-time windows with late-data tolerance. Append mode emits a
  window only once the watermark passes its end — deterministic,
  replayable output. Note the inherent semantics: windows newer than
  `max(event_time) − delay` at stream end are withheld (they would
  still be mutable if the stream resumed); the correctness oracle
  applies the same cutoff.

State scale: windowed counts keep one row of state per (window, key) —
bounded by watermark expiry, so a 1000-executor deployment holds state
proportional to the *active* window span only.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def ingest_availablenow(spark: SparkSession, src_glob_dir: str,
                        glob: str, schema, dst: str, checkpoint: str,
                        transform=None, partition_by: list[str] | None = None
                        ) -> None:
    """Drain all files matching `glob` under `src_glob_dir` into a
    parquet dataset at `dst`, applying `transform(df)` if given."""
    src = (spark.readStream.schema(schema)
           .option("pathGlobFilter", glob)
           .parquet(src_glob_dir))
    if transform is not None:
        src = transform(src)
    writer = (src.writeStream.format("parquet")
              .option("path", dst)
              .option("checkpointLocation", checkpoint)
              .trigger(availableNow=True))
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.start().awaitTermination()


def stream_into_tiles(spark: SparkSession, src_glob_dir: str, glob: str,
                      schema, tile_path: str, checkpoint: str,
                      transform=None,
                      order_cols: list[str] | None = None) -> None:
    """Continuous tile-store maintenance: files landing in a directory
    stream straight into the bin-partitioned tile store. Each
    micro-batch runs the SAME batch writer (`tile_build.append_cycle`,
    i.e. dynamic-partition append) under `foreachBatch` — exactly-once
    per file via checkpointed source offsets, and the batch/stream
    code paths cannot diverge because they are one code path. The
    availableNow trigger drains what is present then stops (the
    reference's queue semantics, run_tile_updates:6-24); swap in a
    processingTime trigger and the same call runs forever at scale."""
    from pointdatabase_spark.plans import tile_build
    src = (spark.readStream.schema(schema)
           .option("pathGlobFilter", glob)
           .parquet(src_glob_dir))
    if transform is not None:
        src = transform(src)

    def sink(batch_df, batch_id: int) -> None:
        tile_build.append_cycle(batch_df, tile_path,
                                order_cols=order_cols)

    (src.writeStream.foreachBatch(sink)
     .option("checkpointLocation", checkpoint)
     .trigger(availableNow=True)
     .start().awaitTermination())


def stream_exact_dedup(src: DataFrame, time_col: str, delay: str,
                       key_cols: list[str]) -> DataFrame:
    """Streaming exact dedup: drop rows whose `key_cols` were already
    seen within the watermark horizon (`dropDuplicatesWithinWatermark`)
    — the live-ingest twin of the batch content-hash dedup
    (operators/dedup.exact_dedup). State holds one entry per distinct
    key inside the horizon and is expired by the watermark, so a
    deployment's state is bounded by (dedup window × arrival rate),
    not by corpus history — the property that makes streaming dedup
    viable at 100 TB/day ingest."""
    return (src.withWatermark(time_col, delay)
            .dropDuplicatesWithinWatermark(key_cols))


def run_stream_dedup_availablenow(spark: SparkSession, landing: str,
                                  glob: str, schema, dst: str,
                                  checkpoint: str, time_col: str,
                                  delay: str,
                                  key_cols: list[str]) -> DataFrame:
    """Drain landing files through the streaming dedup into parquet;
    returns the materialized surviving rows."""
    from pointdatabase_spark.functions import timeconv
    src = (spark.readStream.schema(schema)
           .option("pathGlobFilter", glob)
           .parquet(landing))
    if dict(src.dtypes).get(time_col) != "timestamp":
        # watermarks require TIMESTAMP; parquet often reads
        # TIMESTAMP_NTZ (or legacy long-ns) — same dispatch as events
        src = src.withColumn(
            time_col, F.timestamp_micros(timeconv.events_tus(src, time_col)))
    out = stream_exact_dedup(src, time_col, delay, key_cols)
    (out.writeStream.format("parquet")
     .option("path", dst)
     .option("checkpointLocation", checkpoint)
     .outputMode("append")
     .trigger(availableNow=True)
     .start().awaitTermination())
    return spark.read.parquet(dst)


def windowed_counts(events: DataFrame, time_col: str, window: str,
                    delay: str, keys: list[str]) -> DataFrame:
    """Watermarked tumbling-window count/sum aggregation (streaming
    DataFrame in, streaming DataFrame out)."""
    return (events
            .withWatermark(time_col, delay)
            .groupBy(F.window(F.col(time_col), window).alias("w"), *keys)
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.sum("value").alias("sum_value"))
            .select(F.col("w.start").alias("window_start"), *keys,
                    "n_events", "sum_value"))


def run_windowed_counts_availablenow(spark: SparkSession, sf_dir: str,
                                     window: str = "1 day",
                                     delay: str = "1 hour") -> DataFrame:
    """End-to-end: stream `events` parquet through a watermarked
    tumbling-window aggregation into a parquet sink (append mode),
    then return the materialized result."""
    run_id = uuid.uuid4().hex[:8]
    dst = f"/tmp/pdb_stream_out_{run_id}"
    ckpt = f"/tmp/pdb_stream_ckpt_{run_id}"
    from pointdatabase_spark.functions import timeconv
    # nanosAsLong only matters when the parquet is timestamp[ns]; with
    # timestamp[us] it no-ops and events_tus branches on the real dtype.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    src = (spark.readStream.schema(schema)
           .option("pathGlobFilter", "events.parquet")
           .parquet(sf_dir))
    src = src.withColumn(
        "event_time", F.timestamp_micros(timeconv.events_tus(src)))
    agg = windowed_counts(src, "event_time", window, delay, ["event_type"])
    (agg.writeStream.format("parquet")
     .option("path", dst)
     .option("checkpointLocation", ckpt)
     .outputMode("append")
     .trigger(availableNow=True)
     .start().awaitTermination())
    return spark.read.parquet(dst)


def run_stream_stream_join_availablenow(
        spark: SparkSession, sf_dir: str,
        left_type: str = "click", right_type: str = "purchase",
        band_hours: int = 24, delay: str = "1 hour") -> DataFrame:
    """Stream-STREAM inner join (the stateful two-sided join Spark
    keeps per-side state stores for, not the stateless broadcast
    dim join of streaming_dim_join): two event streams, matched per
    user when the right event lands within ``band_hours`` AFTER the
    left one. Both sides carry watermarks AND the join carries an
    event-time range condition — exactly what lets Spark bound and
    evict per-side state at scale (without the range bound, state
    grows forever). Under availableNow every pair is emitted exactly
    once, so the inner-join result equals the batch band join —
    the oracle property."""
    import uuid as _uuid
    from pointdatabase_spark.functions import timeconv
    run_id = _uuid.uuid4().hex[:8]
    dst = f"/tmp/pdb_ssj_out_{run_id}"
    ckpt = f"/tmp/pdb_ssj_ckpt_{run_id}"
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema

    def _side(ev_type: str, prefix: str):
        src = (spark.readStream.schema(schema)
               .option("pathGlobFilter", "events.parquet")
               .parquet(sf_dir))
        t = F.timestamp_micros(timeconv.events_tus(src))
        return (src.where(F.col("event_type") == ev_type)
                .select(F.col("user_id").alias(f"{prefix}_user"),
                        F.col("event_id").alias(f"{prefix}_id"),
                        t.alias(f"{prefix}_time"))
                .withWatermark(f"{prefix}_time", delay))

    lft = _side(left_type, "l")
    rgt = _side(right_type, "r")
    cond = ((F.col("l_user") == F.col("r_user"))
            & (F.col("r_time") >= F.col("l_time"))
            & (F.col("r_time") <= F.col("l_time")
               + F.expr(f"INTERVAL {int(band_hours)} HOURS")))
    joined = (lft.join(rgt, cond, "inner")
              .select(F.col("l_user").alias("user_id"),
                      F.col("l_id").alias("event_id_l"),
                      F.col("r_id").alias("event_id_r"),
                      (F.unix_micros(F.col("r_time"))
                       - F.unix_micros(F.col("l_time")))
                      .alias("lag_us")))
    # The two-sided join keeps a state store PER shuffle partition
    # per side; a fixture-sized stream under local[32] would pay 64
    # store initializations per micro-batch for kilobytes of state.
    # Pin a small stateful parallelism for THIS stream (the partition
    # count is baked into its fresh checkpoint) and restore the
    # session default after the drain. At production scale the right
    # value is executor-count-proportional — set by the caller's
    # session, exactly what the restored default expresses.
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        (joined.writeStream.format("parquet")
         .option("path", dst)
         .option("checkpointLocation", ckpt)
         .outputMode("append")
         .trigger(availableNow=True)
         .start().awaitTermination())
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.read.parquet(dst)


def run_stream_exact_dedup_availablenow(
        spark: SparkSession, sf_dir: str,
        delay: str = "30 days") -> DataFrame:
    """Streaming EXACT dedup via ``dropDuplicatesWithinWatermark``:
    the planted corpus (documents + an exact copy of every 7th doc,
    arriving at the SAME event time as its original) streams through
    a fingerprint-keyed dedup whose state is bounded by the
    watermark — the engine-native streaming twin of the batch
    ``exact_dedup`` operator. WHICH copy survives is arrival-order
    dependent (both copies are equally valid), so the deterministic
    contract — and the oracle surface — is the SURVIVOR COUNT: one
    row per distinct fingerprint."""
    import uuid as _uuid
    run_id = _uuid.uuid4().hex[:8]
    dst = f"/tmp/pdb_sded_out_{run_id}"
    ckpt = f"/tmp/pdb_sded_ckpt_{run_id}"
    schema = spark.read.parquet(f"{sf_dir}/documents.parquet").schema
    src = (spark.readStream.schema(schema)
           .option("pathGlobFilter", "documents.parquet")
           .parquet(sf_dir)
           .select("doc_id", "text"))
    corpus = (src.unionByName(
        src.where(F.col("doc_id") % 7 == 0)
        .select((F.col("doc_id") + 100000).alias("doc_id"), "text")))
    corpus = (corpus
              .withColumn("tus", (F.lit(1) + (F.col("doc_id") % 100000)
                                  % 720).cast("long")
                          * F.lit(3_600_000_000))
              .withColumn("event_time", F.timestamp_micros("tus"))
              .withColumn("fp", F.md5("text")))
    deduped = stream_exact_dedup(corpus, "event_time", delay, ["fp"])
    (deduped.select("fp", "event_time")
     .writeStream.format("parquet")
     .option("path", dst)
     .option("checkpointLocation", ckpt)
     .outputMode("append")
     .trigger(availableNow=True)
     .start().awaitTermination())
    return spark.read.parquet(dst)
