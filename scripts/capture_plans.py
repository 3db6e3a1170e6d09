"""Capture .explain("formatted") evidence for a declared query,
INCLUDING the internal writes/actions a builder query runs at
construction time (guide §1: the returned frame of an index-build
query shows only the serve plan; the build's own jobs are where the
optimization lives).

Hooks: DataFrameWriter.parquet / DataFrame.first / DataFrame.count are
wrapped to append each captured plan (with the target path or action
name) to the output file, then delegate to the original.

Usage:
    python scripts/capture_plans.py OUTDIR SUFFIX NAME [NAME...]

writes OUTDIR/<name>_<SUFFIX>.txt
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _explain_str(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    outdir, suffix, *names = sys.argv[1:]
    os.makedirs(outdir, exist_ok=True)

    try:  # Spark 4: the concrete class lives in pyspark.sql.classic
        from pyspark.sql.classic.dataframe import DataFrame
    except ImportError:
        from pyspark.sql import DataFrame
    from pyspark.sql.readwriter import DataFrameWriter

    from pointdatabase_spark import queries as registry
    from pointdatabase_spark.session import get_spark

    spark = get_spark("plan-capture", master="local[8]",
                      extra_conf={"spark.driver.memory": "8g"})
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.all_queries()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

    sink: list[str] = []
    capturing = [False]

    orig_parquet = DataFrameWriter.parquet
    orig_first = DataFrame.first
    orig_count = DataFrame.count
    orig_lckpt = DataFrame.localCheckpoint

    def lckpt(self, *a, **kw):
        if capturing[0]:
            sink.append("== internal .localCheckpoint() ==\n"
                        + _explain_str(self))
        return orig_lckpt(self, *a, **kw)

    DataFrame.localCheckpoint = lckpt

    def parquet(self, path, **kw):
        if capturing[0]:
            sink.append(f"== internal write.parquet -> {path} ==\n"
                        + _explain_str(self._df))
        return orig_parquet(self, path, **kw)

    def first(self):
        if capturing[0]:
            sink.append("== internal .first() action ==\n"
                        + _explain_str(self))
        return orig_first(self)

    def count(self):
        if capturing[0]:
            sink.append("== internal .count() action ==\n"
                        + _explain_str(self))
        return orig_count(self)

    DataFrameWriter.parquet = parquet
    DataFrame.first = first
    DataFrame.count = count

    for name in names:
        sink.clear()
        if name == "streaming_neardup":
            # the stateful streaming plan has no explain surface from
            # the materialized sink; the optimization target is the
            # inline_band_keys projection, which works identically on
            # a batch frame — dump that (md5-per-shingle count is the
            # evidence).
            from pointdatabase_spark import testkit
            from pointdatabase_spark.streaming import neardup as _nd
            corpus = testkit.syn_corpus(spark, sf_dir)
            df = _nd.inline_band_keys(corpus)
            out = os.path.join(outdir, f"{name}_{suffix}.txt")
            with open(out, "w") as f:
                f.write(f"# {name} — inline_band_keys projection plan "
                        f"({suffix}) on the batch corpus (same "
                        "expression tree as the streaming source)\n\n"
                        + _explain_str(df))
            print(f"{name}: band-key plan -> {out}")
            continue
        capturing[0] = True
        try:
            df = qs[name](spark, sf_dir)
        finally:
            capturing[0] = False
        sink.append("== returned frame ==\n" + _explain_str(df))
        out = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(out, "w") as f:
            f.write(f"# {name} — plan capture ({suffix}), sf_dir={sf_dir}\n"
                    "# every internal write.parquet/first/count during "
                    "query construction, then the returned frame\n\n")
            f.write("\n\n".join(sink))
        print(f"{name}: {len(sink)} plan(s) -> {out}")
    spark.stop()


if __name__ == "__main__":
    main()
