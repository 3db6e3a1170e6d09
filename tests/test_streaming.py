"""Structured Streaming ingest: availableNow drain, exactly-once file
tracking across restarts, and the watermark-withheld final window."""

from __future__ import annotations

import pandas as pd

from pointdatabase_spark.streaming import ingest


def test_ingest_availablenow_incremental(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq
    landing = tmp_path / "landing"
    landing.mkdir()
    dst = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    pq.write_table(pa.table({"row_id": [1, 2], "x": [1.0, 2.0]}),
                   landing / "f1.parquet")
    landing = str(landing)
    schema = spark.read.parquet(landing).schema

    ingest.ingest_availablenow(spark, landing, "*", schema, dst, ckpt)
    assert spark.read.parquet(dst).count() == 2

    # second batch of files lands; re-run drains ONLY the new ones
    import pyarrow as pa
    import pyarrow.parquet as pq
    pq.write_table(pa.table({"row_id": [3, 4, 5], "x": [3.0, 4.0, 5.0]}),
                   landing + "/f2.parquet")
    ingest.ingest_availablenow(spark, landing, "*", schema, dst, ckpt)
    out = spark.read.parquet(dst)
    assert out.count() == 5
    assert sorted(r.row_id for r in out.collect()) == [1, 2, 3, 4, 5]


def test_windowed_counts_watermark_cutoff(spark):
    out = ingest.run_windowed_counts_availablenow(
        spark, "/root/testdata/sf0.001").toPandas()
    # append mode withholds windows newer than max(event_time) − delay:
    # 30 days of events → the last day must be absent, earlier present.
    days = sorted(out.window_start.unique())
    assert len(days) >= 2
    assert str(max(days)) < "2024-01-30"
    # counts are per (window, type) and positive
    assert (out.n_events > 0).all()
