"""Gap-based sessionization over the events stream — the canonical
custom stateful operator (SURVEY §7.8 training-pipeline extension; the
reference has no streaming, SURVEY §2.9).

Two implementations with identical session semantics (a session breaks
when the gap to the previous event exceeds `gap_us`):

- **Batch** (`sessionize`): lag → new-session flag → running-sum
  session id → groupBy. Pure JVM window expressions under whole-stage
  codegen; ONE shuffle on the session key (the window's partitioning
  satisfies the groupBy's clustering, so the aggregation reuses the
  exchange). This is the backfill/reprocessing path at 100 TB.

- **Streaming** (`sessionize_stateful`): `applyInPandasWithState` with
  event-time timeout — state is one open session per key (start, last,
  n, sum); a session is emitted when its gap closes in-batch or when
  the watermark passes last+gap (timeout). State size is O(active
  keys), bounded by watermark expiry; the same code runs continuously
  with a processingTime trigger. This is the live-ingest path.

Timestamps are integer microseconds (`tus`), produced by the
load-boundary dispatch `functions.timeconv.events_tus` (the events
parquet's physical type has varied between timestamp[ns] → BIGINT and
timestamp[us] → TIMESTAMP_NTZ reads; the helper branches on the dtype
Spark actually sees) — exactly DuckDB's `epoch_us(ts)`, so the batch
oracle matches bit-for-bit.
"""

from __future__ import annotations

import uuid
from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pointdatabase_spark.functions import rounding
from pyspark.sql.window import Window

SESSION_SCHEMA = ("user_id bigint, session_id bigint, "
                  "session_start bigint, session_end bigint, "
                  "n_events bigint, sum_value double")


def sessionize(events: DataFrame, gap_us: int, key: str = "user_id",
               ts: str = "tus", value: str = "value") -> DataFrame:
    """Batch gap sessionization: one row per (key, session)."""
    w = Window.partitionBy(key).orderBy(ts)
    prev = F.lag(ts).over(w)
    flagged = events.withColumn(
        "_nf", F.when(prev.isNull() | ((F.col(ts) - prev) > gap_us),
                      1).otherwise(0))
    sid = F.sum("_nf").over(
        Window.partitionBy(key).orderBy(ts)
        .rowsBetween(Window.unboundedPreceding, 0))
    return (flagged.withColumn("session_id", sid.cast("long"))
            .groupBy(key, "session_id")
            .agg(F.min(ts).alias("session_start"),
                 F.max(ts).alias("session_end"),
                 F.count(F.lit(1)).alias("n_events"),
                 rounding.qround(F.sum(value), 6).alias("sum_value")))


def _stateful_fn(gap_us: int):
    gap_ms = gap_us // 1000

    def fn(key: Tuple, pdfs: Iterator[pd.DataFrame], state
           ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        cols = ["user_id", "session_start", "session_end",
                "n_events", "sum_value"]
        closed: list[tuple] = []
        if state.hasTimedOut:
            start, last, n, ssum = state.get
            closed.append((user_id, start, last, n, round(ssum, 6)))
            state.remove()
        else:
            rows = pd.concat(list(pdfs)).sort_values("tus")
            if state.exists:
                start, last, n, ssum = state.get
            else:
                start = last = None
                n, ssum = 0, 0.0
            for t, v in zip(rows["tus"].astype("int64"),
                            rows["value"].astype("float64")):
                t, v = int(t), float(v)
                if last is not None and t - last > gap_us:
                    closed.append((user_id, start, last, n,
                                   round(ssum, 6)))
                    start, n, ssum = None, 0, 0.0
                if start is None:
                    start = t
                last = t
                n += 1
                ssum += v
            state.update((int(start), int(last), int(n), float(ssum)))
            # event-time timeout is in ms: fire once the watermark
            # passes the open session's gap horizon
            state.setTimeoutTimestamp(last // 1000 + gap_ms)
        yield pd.DataFrame(closed, columns=cols)

    return fn


def run_sessionize_stateful_availablenow(
        spark: SparkSession, sf_dir: str, gap_us: int,
        delay: str = "1 hour") -> DataFrame:
    """Drain the events table through the stateful sessionizer and
    return the materialized closed sessions. Sessions still open at
    the final watermark stay in state (they would be mutable if the
    stream resumed) — same withholding semantics as append-mode
    windows."""
    from pyspark.sql.streaming.state import GroupStateTimeout
    run_id = uuid.uuid4().hex[:8]
    dst = f"/tmp/pdb_sess_out_{run_id}"
    ckpt = f"/tmp/pdb_sess_ckpt_{run_id}"
    from pointdatabase_spark.functions import timeconv
    # nanosAsLong only matters when the parquet is timestamp[ns]; with
    # timestamp[us] it no-ops and events_tus branches on the real dtype.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    src = (spark.readStream.schema(schema)
           .option("pathGlobFilter", "events.parquet")
           .parquet(sf_dir))
    src = (src
           .withColumn("tus", timeconv.events_tus(src))
           .withColumn("event_time",
                       F.expr("timestamp_micros(tus)"))
           .withWatermark("event_time", delay)
           .select("user_id", "tus", "value", "event_time"))
    out = src.groupBy("user_id").applyInPandasWithState(
        _stateful_fn(gap_us),
        outputStructType=("user_id bigint, session_start bigint, "
                          "session_end bigint, n_events bigint, "
                          "sum_value double"),
        stateStructType=("start bigint, last bigint, n bigint, "
                         "s double"),
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout)
    (out.writeStream.format("parquet")
     .option("path", dst)
     .option("checkpointLocation", ckpt)
     .outputMode("append")
     .trigger(availableNow=True)
     .start().awaitTermination())
    return spark.read.parquet(dst)
