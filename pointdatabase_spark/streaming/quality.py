"""Streaming quality gate: the batch text-quality and PII operators
applied inside a Structured Streaming pass — documents landing in a
directory are scored (repetition features), gated, and PII-scrubbed
on the way into the corpus store.

The gate is STATELESS (pure per-row expressions from functions/text.py
and functions/pii.py used verbatim — the same Columns work on batch
and streaming frames), so there is no watermark, no state store, and
at 100 TB/day the pass scales exactly like the batch scrub: narrow
scan-speed maps, zero shuffles before the sink. This is the
architectural point: quality rules are written ONCE and run in both
modes, so backfill (batch) and live ingest (stream) cannot drift.
"""

from __future__ import annotations

import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pointdatabase_spark.functions import pii as _pii
from pointdatabase_spark.functions import text as _text


def quality_gate(docs: DataFrame, text_col: str = "text",
                 dup_max: float = 0.62, cov_max: float = 0.12,
                 run_max: int = 3) -> DataFrame:
    """Append repetition features, a keep flag, and the PII-scrubbed
    text. Works identically on batch and streaming DataFrames."""
    d = _text.with_rep_arrays(docs, text_col)
    dup = _text.spark_expr("dup_token_ratio", text_col, "_toks")
    cov = _text.spark_expr("top_bigram_cover", text_col, "_toks",
                           bg="_bg", st="_st")
    run = _text.spark_expr("max_token_run", text_col, "_toks",
                           bg="_bg", st="_st")
    return (d.withColumn("dup_ratio", dup)
            .withColumn("bigram_cover", cov)
            .withColumn("max_run", run)
            .withColumn("keep",
                        (F.col("dup_ratio") <= dup_max)
                        & (F.col("bigram_cover") <= cov_max)
                        & (F.col("max_run") <= run_max))
            .withColumn("scrubbed", _pii.scrub(text_col))
            .drop("_toks", "_bg", "_st"))


def run_quality_gate_availablenow(spark: SparkSession, sf_dir: str,
                                  sample_mod: int | None = None,
                                  **thresholds) -> DataFrame:
    """End-to-end: stream the documents parquet through the gate into
    a parquet sink (append, availableNow), then return the
    materialized sink — deterministic because the gate is stateless.

    Fixed sink/checkpoint paths, wiped before each run: uuid-suffixed
    paths would leave a gated copy of the corpus in /tmp per
    invocation (bench runs the query every round) until the disk
    fills; wiping the checkpoint too keeps availableNow reprocessing
    the full input instead of resuming empty."""
    dst = "/tmp/pdb_qgate_out"
    ckpt = "/tmp/pdb_qgate_ckpt"
    for p in (dst, ckpt):
        shutil.rmtree(p, ignore_errors=True)
    schema = spark.read.parquet(f"{sf_dir}/documents.parquet").schema
    src = (spark.readStream.schema(schema)
           .option("pathGlobFilter", "documents.parquet")
           .parquet(sf_dir))
    if sample_mod is not None:
        # Deterministic corpus subset (bench-cost knob, r11): the
        # gate is STATELESS, so the batch/stream no-drift contract
        # holds on any subset — the oracle applies the identical
        # doc_id % sample_mod = 0 predicate.
        src = src.where(F.col("doc_id") % sample_mod == 0)
    gated = quality_gate(src, **thresholds)
    (gated.writeStream.format("parquet")
     .option("path", dst)
     .option("checkpointLocation", ckpt)
     .trigger(availableNow=True)
     .start().awaitTermination())
    return spark.read.parquet(dst)
