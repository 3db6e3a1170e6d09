"""Per-query profiling harness (guide §1): isolate one or more declared
queries with the noop sink, report cold/warm wall seconds, Spark job
count, and optionally dump .explain("formatted") to a file.

Usage:
    python scripts/profile_query.py NAME [NAME...] [--plans DIR] [--runs N]

Timing methodology matches bench.py (builder-aware: construction timed
for the builder set, warm-best otherwise) so numbers are comparable.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--plans", default=None,
                    help="directory to write <name>.txt explain output")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    import bench as _bench
    from pointdatabase_spark import queries as registry
    from pointdatabase_spark.session import get_spark

    spark = get_spark("pointdatabase-profile")
    spark.sparkContext.setLogLevel("WARN")
    qs = registry.all_queries()
    builders = _bench.BUILDERS if hasattr(_bench, "BUILDERS") else set()
    # fall back to parsing the builders set out of bench.main closure:
    if not builders:
        import ast
        import inspect
        tree = ast.parse(inspect.getsource(_bench))
        for node in ast.walk(tree):
            if isinstance(node, ast.Assign) and any(
                    getattr(t, "id", "") == "builders" for t in node.targets):
                builders = set(ast.literal_eval(node.value))

    # warm-up (same as bench.py)
    li = spark.read.parquet(f"{args.sf_dir}/lineitem.parquet")
    li.groupBy("l_returnflag").count().collect()

    sc = spark.sparkContext
    tracker = sc.statusTracker()

    for name in args.names:
        if name not in qs:
            print(f"unknown query: {name}", file=sys.stderr)
            continue
        # setJobGroup (not just a description) scopes the job ids the
        # status tracker reports, so per-run job counts are exact
        # (ADVICE r12: setJobDescription sets no group, leaving the
        # j-counts version-dependent)
        group = f"profile-{name}"
        sc.setJobGroup(group, f"profile: {name}")
        is_builder = name in builders

        def _noop(df):
            df.write.format("noop").mode("overwrite").save()

        def _jobs() -> int:
            return len(tracker.getJobIdsForGroup(group) or [])

        t0 = time.perf_counter()
        df = qs[name](spark, args.sf_dir)
        t_construct = time.perf_counter() - t0

        times = []
        for i in range(args.runs + 1):
            jb = _jobs()
            t0 = time.perf_counter()
            if is_builder and i > 0:
                df = qs[name](spark, args.sf_dir)
                _noop(df)
            else:
                _noop(df)
            dt = time.perf_counter() - t0
            times.append((dt, _jobs() - jb))
        warm = min(t for t, _ in times[1:]) if len(times) > 1 else times[0][0]
        runs_s = " ".join(f"{t:.3f}(j{n})" for t, n in times)
        print(f"{name:36s} construct {t_construct:6.3f}  runs: {runs_s}  "
              f"warm-best {warm:.3f}  builder={is_builder}")
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            p = os.path.join(args.plans, f"{name}.txt")
            import contextlib
            import io
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            with open(p, "w") as f:
                f.write(buf.getvalue())
            print(f"  plan -> {p}")
        sc._jsc.clearJobGroup()
    spark.stop()


if __name__ == "__main__":
    main()
