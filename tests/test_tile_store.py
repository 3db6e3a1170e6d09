"""Tile store: roundtrip correctness + partition pruning evidence."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from pointdatabase_spark import testkit
from pointdatabase_spark.sources import tile_store
from tests.conftest import SF_SMOKE

PATH = "/tmp/pdb_test_tiles"


@pytest.fixture(scope="module")
def store(spark):
    pts = testkit.syn_points(spark, SF_SMOKE)
    tile_store.write_tiles(pts, PATH, order_cols=["t"])
    yield PATH
    shutil.rmtree(PATH, ignore_errors=True)


def test_roundtrip_complete(spark, store):
    pts = testkit.syn_points(spark, SF_SMOKE)
    back = tile_store.read_tiles(spark, store)
    assert back.count() == pts.count()
    # every original row survives with its values (row_id multiset)
    a = sorted(r[0] for r in pts.select("row_id").collect())
    b = sorted(r[0] for r in back.select("row_id").collect())
    assert a == b


def test_box_query_equals_brute_force(spark, store):
    pts = testkit.syn_points(spark, SF_SMOKE)
    xr, yr = (-35000.0, 42000.0), (-90000.0, -10000.0)
    got = tile_store.query_box(spark, store, xr, yr, fields=["row_id"])
    exp = pts.where(F.col("x").between(*xr) & F.col("y").between(*yr))
    assert sorted(r[0] for r in got.collect()) == \
           sorted(r[0] for r in exp.select("row_id").collect())


def test_partition_pruning_in_plan(spark, store):
    got = tile_store.query_box(spark, store, (-35000.0, 42000.0),
                               (-90000.0, -10000.0))
    plan = got._jdf.queryExecution().executedPlan().toString()
    # tile predicate must reach the scan as a partition filter, and the
    # x/bin predicates must be pushed to parquet
    assert "PartitionFilters" in plan
    assert "tile_x" in plan.split("PartitionFilters")[1][:400]
    assert "PushedFilters: [" in plan


def test_query_bins_with_pad(spark, store):
    got = tile_store.query_bins(spark, store, [(0.0, 0.0)], pad=1)
    back = tile_store.read_tiles(spark, store)
    exp = back.where(F.col("bin_x").between(-10000, 10000)
                     & F.col("bin_y").between(-10000, 10000))
    assert got.count() == exp.count()


def test_incremental_append_rewrites_only_touched_tiles(spark, store):
    import os
    before = set(os.listdir(PATH))
    # append a tiny patch that lands in exactly one tile
    patch = spark.range(1).select(
        F.lit(99999999).alias("row_id"),
        F.lit(5.0).alias("x"), F.lit(5.0).alias("y"),
        F.lit(1.0).alias("h"), F.lit(1.0).alias("sigma"),
        F.lit(0.0).alias("t"), F.lit(1).alias("rgt"), F.lit(1).alias("cycle"),
        F.lit(1).alias("beam_pair"), F.lit(0).alias("lr"),
        F.lit(0).alias("quality"), F.lit(0.0).alias("slope"))
    tile_store.write_tiles(patch, PATH, order_cols=["t"])
    after = set(os.listdir(PATH))
    assert before == after  # same tile dirs (tile_x=0 existed already)
    got = tile_store.read_tiles(spark, PATH).where(F.col("row_id") == 99999999)
    assert got.count() == 1


def test_append_cycle_incremental_and_union_hierarchy(spark, tmp_path):
    """§3.2 incremental ingest + the 'index of cycles' hierarchy as a
    union view (SURVEY §1.4.3): per-cycle appends only rewrite touched
    tiles; a union over per-cycle stores still partition-prunes."""
    import pandas as pd
    from pointdatabase_spark.plans import tile_build

    def mk(cycle, xs):
        return spark.createDataFrame(pd.DataFrame({
            "x": [float(v) for v in xs],
            "y": [float(v) for v in xs],
            "t": [float(cycle * 100 + i) for i in range(len(xs))],
            "cycle": [cycle] * len(xs)}))

    store = str(tmp_path / "store")
    # cycle 1 covers two tiles; cycle 2 lands in ONE of them
    tile_store.write_tiles(mk(1, [5000, 15000, 105000]), store,
                           order_cols=["t"])
    before = {str(p) for p in (tmp_path / "store").glob("tile_x=*/tile_y=*/*.parquet")}
    tile_build.append_cycle(mk(2, [6000]), store, order_cols=["t"])
    after = {str(p) for p in (tmp_path / "store").glob("tile_x=*/tile_y=*/*.parquet")}
    # dynamic overwrite: untouched tile keeps its original files
    untouched = [p for p in before if "tile_x=100000" in p]
    assert untouched and all(p in after for p in untouched)
    out = tile_store.read_tiles(spark, store)
    assert out.count() == 4
    assert out.where("cycle = 2").count() == 1

    # recompute: dynamic overwrite replaces ONLY the covered tile
    tile_build.recompute_tiles(mk(3, [4000]), store, order_cols=["t"])
    out = tile_store.read_tiles(spark, store)
    assert out.where("tile_x = 0").count() == 1      # tile (0,0) replaced
    assert out.where("tile_x = 100000").count() == 1  # other tile intact

    # hierarchy: separate per-cycle roots + union view, box query prunes
    c1 = str(tmp_path / "c1")
    c2 = str(tmp_path / "c2")
    tile_store.write_tiles(mk(1, [5000, 105000]), c1, order_cols=["t"])
    tile_store.write_tiles(mk(2, [7000, 115000]), c2, order_cols=["t"])
    union = tile_store.read_tiles(spark, c1).unionByName(
        tile_store.read_tiles(spark, c2))
    hit = union.where((F.col("tile_x") == 0) & (F.col("tile_y") == 0))
    assert hit.count() == 2  # one per cycle, pruned to tile (0,0)
    import contextlib, io
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        hit.explain("formatted")
    plan = buf.getvalue()
    # both sides of the union carry partition filters
    assert plan.count("PartitionFilters: [isnotnull(tile_x") == 2


def test_catalog_change_root_anchored(spark):
    from pointdatabase_spark.sources import tile_store
    df = spark.createDataFrame(
        [("/old/root/a.h5",), ("/old/rootless/b.h5",),
         ("/elsewhere/old/root/c.h5",)], "source_file string")
    out = tile_store.catalog_change_root(df, "/old/root/", "/new/base")
    got = sorted(r.source_file for r in out.collect())
    # only the anchored prefix is rewritten; mid-path matches are not
    assert got == ["/elsewhere/old/root/c.h5", "/new/base/a.h5",
                   "/old/rootless/b.h5"]


def test_compact_tiles_merges_small_files(spark, tmp_path):
    """Three appends fragment every partition into 3 files; compaction
    rewrites each as one file with identical rows and restored
    (bin, time) sort, and reports exactly the fragmented keys."""
    from pointdatabase_spark.sources import tile_store
    from pyspark.sql import functions as F
    path = str(tmp_path / "store")
    rows = [(float(x), float(y), float(t))
            for x in (5_000, 105_000) for y in (5_000,)
            for t in range(10)]
    df = spark.createDataFrame(rows, "x double, y double, delta_time double")
    for i in range(3):
        tile_store.write_tiles(df.withColumn("delta_time",
                                             F.col("delta_time") + i * 100),
                               path, mode="append")
    before = tile_store.partition_file_counts(spark, path)
    assert before and all(n == 3 for n in before.values())
    n_rows = spark.read.parquet(path).count()

    done = tile_store.compact_tiles(spark, path, min_files=2)
    assert sorted(done) == sorted(before)
    after = tile_store.partition_file_counts(spark, path)
    assert set(after) == set(before)
    assert all(n == 1 for n in after.values())
    out = spark.read.parquet(path)
    assert out.count() == n_rows
    # second call: nothing left to compact
    assert tile_store.compact_tiles(spark, path, min_files=2) == []
    # max_tiles bounds a batch
    for i in (3, 4):
        tile_store.write_tiles(df.withColumn("delta_time",
                                             F.col("delta_time") + i * 100),
                               path, mode="append")
    part = tile_store.compact_tiles(spark, path, min_files=2, max_tiles=1)
    assert len(part) == 1
    counts = tile_store.partition_file_counts(spark, path)
    assert counts[part[0]] == 1 and max(counts.values()) > 1
