"""Streaming near-duplicate flagging — MinHash-LSH band collisions
within a watermark horizon (§7.8 training-pipeline extension; the
live-ingest twin of the batch ``operators/dedup.minhash_neardup``).

Semantics: each document explodes to its LSH band keys; per band key
an ANCHOR CHAIN runs — the first arrival (or the first after a gap
longer than ``horizon_us``) becomes the anchor, and every later
arrival within the horizon of the PREVIOUS arrival is flagged
``(dup_id, match_id=anchor)``. That is exactly the gap-session rule of
``streaming/sessions.py`` applied per bucket, so the batch twin is
pure window SQL (lag → gap flag → running-sum session id →
first_value anchor) and the DuckDB oracle reproduces the streaming
output bit-for-bit on an availableNow drain.

Streaming-legal signature shape: Structured Streaming forbids an
aggregation upstream of a stateful operator, so the batch
explode→groupBy MinHash (dedup.minhash_signatures — ~10× faster under
codegen, the right backfill path) is replaced by PER-ROW array-lambda
MINs over the shingle set. Same md5/universal-hash family, identical
signatures; the lambdas run interpreted, which is the price of
admission to the stateful pipeline.

Scale: state is (anchor, last) per band key with at least one arrival
inside the horizon — O(active buckets), expired by event-time timeout
when the watermark passes last + horizon. Flags emit immediately
(append mode) — nothing is withheld, unlike aggregates, because a
flag's value never changes after emission.
"""

from __future__ import annotations

import uuid
from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pointdatabase_spark.operators.dedup import (P31, _H32, seed_params,
                                                 shingle_expr)


def inline_band_keys(df: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text", n: int = 3,
                     n_hashes: int = 8, bands: int = 4,
                     carry: tuple[str, ...] = ()) -> DataFrame:
    """One row per (doc, band key), computed without any aggregation:
    mh_k = array_min(transform(shingles, x -> (a_k·h32(x) + b_k) mod
    P31)) — value-identical to the batch explode→groupBy signatures.
    Works on batch AND streaming DataFrames."""
    rows = n_hashes // bands
    tok = df.select(F.col(id_col).alias("id"), *carry,
                    F.split(F.col(text_col), r"\s+").alias("t"))
    sh = (tok.withColumn("s", F.expr(shingle_expr("t", n)))
          .where(F.size("s") > 0))
    # md5 each shingle ONCE (r12, guide §4.2 "do the heavy lifting
    # once"): the previous form inlined the md5 inside every mh_k's
    # transform, so each shingle was hashed n_hashes times per row
    # (HOFs run interpreted — no common-subexpression elimination).
    # One hs projection + n_hashes cheap affine array_mins is
    # value-identical (same md5 → same universal-hash arithmetic).
    hs = (sh.withColumn(
        "hs", F.expr(f"transform(s, x -> {_H32.format(s='x')} % {P31})")))
    sig = hs.select(
        "id", *carry,
        *[F.expr(f"array_min(transform(hs, h -> ({a} * h + {b})"
                 f" % {P31}))").alias(f"mh{k}")
          for k, (a, b) in enumerate(seed_params(n_hashes))])
    keys = [F.concat_ws("|", F.lit(str(j)),
                        *[F.col(f"mh{j * rows + r}").cast("string")
                          for r in range(rows)])
            for j in range(bands)]
    return sig.select("id", *carry,
                      F.explode(F.array(*keys)).alias("bkey"))


def _flag_fn(horizon_us: int):
    horizon_ms = horizon_us // 1000

    def fn(key: Tuple, pdfs: Iterator[pd.DataFrame], state
           ) -> Iterator[pd.DataFrame]:
        (bkey,) = key
        cols = ["bkey", "dup_id", "match_id", "tus"]
        out: list[tuple] = []
        if state.hasTimedOut:
            state.remove()
        else:
            rows = pd.concat(list(pdfs)).sort_values(["tus", "id"])
            if state.exists:
                anchor, last = state.get
            else:
                anchor = last = None
            for i, t in zip(rows["id"].astype("int64"),
                            rows["tus"].astype("int64")):
                i, t = int(i), int(t)
                if last is None or t - last > horizon_us:
                    anchor = i  # gap → this doc starts a new chain
                else:
                    out.append((bkey, i, anchor, t))
                last = t
            state.update((int(anchor), int(last)))
            state.setTimeoutTimestamp(last // 1000 + horizon_ms)
        yield pd.DataFrame(out, columns=cols)

    return fn


def stream_neardup_flags(docs: DataFrame, horizon_us: int,
                         time_col: str = "event_time",
                         delay: str = "30 days",
                         id_col: str = "doc_id", text_col: str = "text",
                         tus_col: str = "tus", n: int = 3,
                         n_hashes: int = 8, bands: int = 4) -> DataFrame:
    """Streaming DataFrame in → streaming flags out (append mode).
    `docs` must carry an event-time TIMESTAMP column (`time_col`) and
    its integer-microsecond twin (`tus_col`)."""
    from pyspark.sql.streaming.state import GroupStateTimeout
    band = inline_band_keys(docs, id_col, text_col, n, n_hashes, bands,
                            carry=(tus_col, time_col))
    return (band.withWatermark(time_col, delay)
            .groupBy("bkey")
            .applyInPandasWithState(
                _flag_fn(horizon_us),
                outputStructType=("bkey string, dup_id bigint, "
                                  "match_id bigint, tus bigint"),
                stateStructType="anchor bigint, last bigint",
                outputMode="append",
                timeoutConf=GroupStateTimeout.EventTimeTimeout))


def run_stream_neardup_availablenow(spark: SparkSession, sf_dir: str,
                                    horizon_us: int,
                                    delay: str = "30 days",
                                    base_mod: int | None = None
                                    ) -> DataFrame:
    """Drain the planted dedup corpus (testkit.SYN_CORPUS_SQL shape,
    built stream-side from the documents parquet with deterministic
    arrival times tus = (1 + (doc_id % 100000) % 720) hours — BOTH
    plant families (+100000 exact copies, +200000 truncated near-dups)
    arrive at the same instant as their original, so each flags
    against it) through the streaming flagger and return the
    materialized flags."""
    run_id = uuid.uuid4().hex[:8]
    dst = f"/tmp/pdb_neardup_out_{run_id}"
    ckpt = f"/tmp/pdb_neardup_ckpt_{run_id}"
    schema = spark.read.parquet(f"{sf_dir}/documents.parquet").schema
    src = (spark.readStream.schema(schema)
           .option("pathGlobFilter", "documents.parquet")
           .parquet(sf_dir)
           .select("doc_id", "text"))
    if base_mod is not None:
        # Deterministic BASE-corpus subset (bench-cost knob, r11):
        # applied before planting so every planted dup keeps its
        # original; the oracle takes the same subset via
        # testkit.syn_corpus_cte(base_mod=...). All state
        # transitions (same-instant flags, horizon evictions over
        # the 720 h arrival spread) survive any modulus.
        src = src.where(F.col("doc_id") % base_mod == 0)
    # the planted corpus (exact dups every 7th id, near-dups every
    # 11th), as streaming-legal unions of the one file source
    corpus = (src
              .unionByName(src.where(F.col("doc_id") % 7 == 0)
                           .select((F.col("doc_id") + 100000)
                                   .alias("doc_id"), "text"))
              .unionByName(src.where(F.col("doc_id") % 11 == 0)
                           .select((F.col("doc_id") + 200000)
                                   .alias("doc_id"),
                                   F.expr("substr(text, 1, length(text)"
                                          " - 15)").alias("text"))))
    # base offset of 1 h: a row at event_time == epoch 0 equals the
    # stream's INITIAL watermark and the stateful operator's late-row
    # filter (event_time <= watermark) silently drops it
    corpus = (corpus
              .withColumn("tus", (F.lit(1) + (F.col("doc_id") % 100000)
                                  % 720).cast("long")
                          * F.lit(3_600_000_000))
              .withColumn("event_time", F.timestamp_micros("tus")))
    out = stream_neardup_flags(corpus, horizon_us, delay=delay)
    # Parallelism note: unlike the stream-stream join fixture
    # (ingest.py, state-store-bound — pinned to 8 partitions), this
    # stateful fn does real per-key minhash work in pandas; cutting
    # partitions below the core count was MEASURED 2x slower at
    # sf0.1 (24 s vs 12 s) — keep the session default.
    (out.writeStream.format("parquet")
     .option("path", dst)
     .option("checkpointLocation", ckpt)
     .outputMode("append")
     .trigger(availableNow=True)
     .start().awaitTermination())
    return spark.read.parquet(dst)
