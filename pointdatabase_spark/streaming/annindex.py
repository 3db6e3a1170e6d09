"""Continuous maintenance of the stored ANN index — the
embedding-space twin of the rollup maintenance stream
(streaming/rollup.py): new vectors land as files, a foreachBatch
availableNow stream appends them to the cell-partitioned index
(operators/similarity.append_ann_index), and the serving query's
dynamic partition pruning sees them immediately — no rebuild, no
corpus rescan.

Exactly-once note: file-source offsets are checkpointed, so each
landing file is appended once per completed batch. A batch retried
after a crash MID-WRITE could leave duplicate (vec_id, cell) rows —
unlike the rollup's idempotent day-recompute, a blind append is not
naturally idempotent — so the batch dedups against the STORED ids
for the cells it touches before appending (an anti-join against a
partition-pruned read, O(touched cells), not O(index)). That makes
the append idempotent at vec_id granularity, and exactly-once again
falls out of at-least-once delivery.

At 100 TB: per-batch cost is O(delta + touched-cell ids). Serving
reads are unaffected during appends (parquet files are immutable;
a query sees whole files or nothing)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def run_ann_index_maintenance(spark: SparkSession, landing: str,
                              glob: str, schema, index_path: str,
                              checkpoint: str,
                              id_col: str = "vec_id",
                              vec_col: str = "embedding") -> None:
    """Drain the landing directory (availableNow) and append every
    new embedding to the stored index. Restart-safe (checkpointed
    offsets) and idempotent (per-batch anti-join against stored ids
    in the touched cells)."""
    from pointdatabase_spark.operators.similarity import (
        cell_expr, norm_expr)

    meta = sorted(spark.read.parquet(f"{index_path}/meta").collect(),
                  key=lambda r: r.cell)
    cents = [list(r.centroid) for r in meta]

    def _process(batch: DataFrame, _bid: int) -> None:
        if batch.isEmpty():
            return
        c = (batch.select(F.col(id_col).alias("vec_id"),
                          F.col(vec_col).alias("embedding"))
             .withColumn("cell", F.expr(cell_expr("embedding", cents)))
             .withColumn("norm", F.expr(norm_expr("embedding"))))
        cells = [r.cell for r in c.select("cell").distinct().collect()]
        # Idempotency guard: dedup against stored ids in the touched
        # cells.  The only legitimate skip is "cells/ does not exist
        # yet" (first batch of a fresh index) — probe for that case
        # EXPLICITLY via the Hadoop FS API rather than a broad
        # except, so a real read failure (corrupt footer, transient
        # IO, permissions) fails the batch and gets retried instead
        # of silently appending duplicates.
        sess = batch.sparkSession
        jvm = sess._jvm
        hconf = sess._jsc.hadoopConfiguration()
        cells_dir = f"{index_path}/cells"
        jpath = jvm.org.apache.hadoop.fs.Path(cells_dir)
        if jpath.getFileSystem(hconf).exists(jpath):
            stored = (sess.read.parquet(cells_dir)
                      .where(F.col("cell").isin(cells))
                      .select("vec_id"))
            c = c.join(stored, "vec_id", "left_anti")
        (c.write.partitionBy("cell").mode("append")
         .parquet(f"{index_path}/cells"))

    (spark.readStream.schema(schema)
     .option("pathGlobFilter", glob)
     .parquet(landing)
     .writeStream.foreachBatch(_process)
     .option("checkpointLocation", checkpoint)
     .trigger(availableNow=True)
     .start().awaitTermination())
