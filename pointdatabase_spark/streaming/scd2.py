"""Streaming SCD Type-2 — the live-ingest twin of
``operators/temporal.scd2_history`` (SURVEY §7.8 training-pipeline
extension; the reference has no streaming, SURVEY §2.9).

State per key is ONE open validity interval (current state value,
valid_from, collapsed row count, version ordinal). Each incoming row
either extends the open interval (same state, null-safe comparison)
or CLOSES it — the closed row (valid_to = the new row's timestamp,
half-open [from, to) like the batch operator) is emitted and a new
interval opens. Open intervals never emit (they are mutable while the
stream lives — the same append-mode withholding semantics as the
stateful sessionizer), so the drained output equals EXACTLY the batch
operator's ``valid_to IS NOT NULL`` rows, which is what the oracle
pins. State size is O(active keys) — one tuple per key, unbounded in
TIME by design (an SCD2 current row stays open forever; there is no
timeout to fire).

Ordering: rows are sorted by (tus, event_id) WITHIN each micro-batch
group call; cross-batch reordering is the caller's watermark problem
(same contract as every streaming fixture here — the availableNow
drain of one parquet source is single-batch and exact).
"""

from __future__ import annotations

import uuid
from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SCD2_SCHEMA = ("user_id bigint, state string, valid_from bigint, "
               "valid_to bigint, version bigint, n_rows bigint")


def _stateful_fn():
    def fn(key: Tuple, pdfs: Iterator[pd.DataFrame], state
           ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        cols = ["user_id", "state", "valid_from", "valid_to",
                "version", "n_rows"]
        closed: list[tuple] = []
        rows = pd.concat(list(pdfs)).sort_values(["tus", "event_id"])
        if state.exists:
            cur, vf, n, ver = state.get
        else:
            cur, vf, n, ver = None, None, 0, 0
        started = state.exists  # None state value vs no-state-yet
        for t, s in zip(rows["tus"].astype("int64"),
                        rows["event_type"]):
            t = int(t)
            s = None if pd.isna(s) else str(s)
            if started and s == cur:
                n += 1
                continue
            if started:
                closed.append((user_id, cur, vf, t, ver, n))
            cur, vf, n = s, t, 1
            ver += 1
            started = True
        state.update((cur, int(vf), int(n), int(ver)))
        yield pd.DataFrame(closed, columns=cols)

    return fn


def run_scd2_stateful_availablenow(spark: SparkSession,
                                   sf_dir: str,
                                   delay: str = "1 hour") -> DataFrame:
    """Drain the events table through the stateful SCD2 builder and
    return the materialized CLOSED intervals (open/current rows stay
    in state — they would be mutable if the stream resumed)."""
    from pyspark.sql.streaming.state import GroupStateTimeout
    from pointdatabase_spark.functions import timeconv
    run_id = uuid.uuid4().hex[:8]
    dst = f"/tmp/pdb_scd2_out_{run_id}"
    ckpt = f"/tmp/pdb_scd2_ckpt_{run_id}"
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    src = (spark.readStream.schema(schema)
           .option("pathGlobFilter", "events.parquet")
           .parquet(sf_dir))
    src = (src
           .withColumn("tus", timeconv.events_tus(src))
           .withColumn("event_time", F.expr("timestamp_micros(tus)"))
           .withWatermark("event_time", delay)
           .select("user_id", "tus", "event_id", "event_type",
                   "event_time"))
    out = src.groupBy("user_id").applyInPandasWithState(
        _stateful_fn(),
        outputStructType=SCD2_SCHEMA,
        stateStructType=("cur string, vf bigint, n bigint, "
                         "ver bigint"),
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout)
    (out.writeStream.format("parquet")
     .option("path", dst)
     .option("checkpointLocation", ckpt)
     .outputMode("append")
     .trigger(availableNow=True)
     .start().awaitTermination())
    return spark.read.parquet(dst)
