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
