"""Continuous SCD-1 table maintenance — the streaming twin of
``operators/sampling.upsert_latest_wins``: update batches land as
files, an availableNow foreachBatch stream merges each batch into a
versioned parquet state (updates overwrite matching keys, new keys
insert, untouched rows carry forward), and readers always see a
complete consistent snapshot — the lakehouse MERGE loop without a
table format, built from immutable parquet + a version cursor.

State layout: ``{state}/versions/{n}`` directories, each a full
snapshot; batch ``b`` reads the latest version and writes ``n+1``.
Readers pick the highest COMPLETE version (a ``_SUCCESS``-guarded
directory), so an in-flight write is never visible — the same
immutable-files argument as the ANN index appends
(streaming/annindex.py).

Exactly-once: file-source offsets are checkpointed (each landing file
contributes to one batch), and a batch retried after a crash
mid-write finds its output version already present and SKIPS — the
explicit Hadoop-FS probe, not a broad except, same policy as
annindex.py:55-70. Merge-by-value is also idempotent (re-applying an
identical batch rewrites identical bytes), so the guard is an
optimization AND a correctness backstop.

At 100 TB: each batch costs O(state + delta) — the full-snapshot
rewrite is the simplest consistent design and what Delta/Iceberg
replace with file-level logs; the per-key merge itself is the same
single partial-agg shuffle as the batch operator. For a state too
large to rewrite per batch, partition ``versions/{n}`` by key bucket
and rewrite only buckets the batch touches (the plan generalizes;
the fixture exercises the full-rewrite form).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(spark._jsc.hadoopConfiguration()), jpath


def latest_version(spark: SparkSession, state_path: str) -> int:
    """Highest complete snapshot number under ``versions/`` (-1 if
    none)."""
    fs, jp = _fs(spark, f"{state_path}/versions")
    if not fs.exists(jp):
        return -1
    best = -1
    for st in fs.listStatus(jp):
        name = st.getPath().getName()
        if not name.isdigit():
            continue
        ok = fs.exists(spark._jvm.org.apache.hadoop.fs.Path(
            f"{state_path}/versions/{name}/_SUCCESS"))
        if ok:
            best = max(best, int(name))
    return best


def read_state(spark: SparkSession, state_path: str) -> DataFrame:
    v = latest_version(spark, state_path)
    if v < 0:
        raise FileNotFoundError(f"no complete snapshot under "
                                f"{state_path}/versions")
    return spark.read.parquet(f"{state_path}/versions/{v}")


def init_state(base: DataFrame, state_path: str) -> None:
    base.write.mode("overwrite").parquet(f"{state_path}/versions/0")


def run_upsert_stream(spark: SparkSession, landing: str, glob: str,
                      schema, state_path: str, checkpoint: str,
                      key_cols: list[str],
                      files_per_batch: int = 1) -> None:
    """Drain the landing directory (availableNow), merging each batch
    into the versioned state. ``files_per_batch=1`` keeps landing
    files in separate sequential batches, so later files win over
    earlier ones on overlapping keys (arrival-order semantics)."""
    from pointdatabase_spark.operators.sampling import upsert_latest_wins

    def _process(batch: DataFrame, bid: int) -> None:
        if batch.isEmpty():
            return
        sess = batch.sparkSession
        # Replay guard keyed on the BATCH id (latest_version alone
        # can't tell a replay from a new batch): the marker is
        # written only after the snapshot completed, so a crash
        # anywhere before that point retries the merge — which is
        # value-idempotent — and a crash after it skips cleanly.
        fs, jmark = _fs(sess, f"{state_path}/_batches/{bid}")
        if fs.exists(jmark):
            return
        cur = latest_version(sess, state_path)
        state = sess.read.parquet(f"{state_path}/versions/{cur}")
        merged = upsert_latest_wins(state, batch, key_cols).drop("_v")
        merged.write.mode("overwrite").parquet(
            f"{state_path}/versions/{cur + 1}")
        fs.create(jmark, True).close()

    (spark.readStream.schema(schema)
     .option("pathGlobFilter", glob)
     .option("maxFilesPerTrigger", int(files_per_batch))
     .parquet(landing)
     .writeStream.foreachBatch(_process)
     .option("checkpointLocation", checkpoint)
     .trigger(availableNow=True)
     .start().awaitTermination())
