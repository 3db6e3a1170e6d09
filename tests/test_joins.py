"""Unit + plan tests for the manual skew/shuffle valves
(operators/joins.py): salted join equivalence, bloom semi-join
exactness (incl. the bit-63 sign corner), and the map-side-prefilter
plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from pointdatabase_spark.operators import joins


def _sorted_rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(r[c] for c in cols)
                  for r in df.select(*cols).collect())


@pytest.fixture(scope="module")
def skewed(spark):
    # 300 rows on a hot key 0, a handful elsewhere, incl. an unmatched key
    left = spark.createDataFrame(
        [Row(k=0 if i % 2 == 0 else (i % 5), rid=i, v=float(i))
         for i in range(600)])
    right = spark.createDataFrame(
        [Row(k=k, w=k * 10.0) for k in range(4)])
    return left, right


def test_salted_join_matches_plain_inner(spark, skewed):
    left, right = skewed
    plain = left.join(right, "k")
    salted = joins.salted_join(left, right, ["k"], buckets=7,
                               distributor="rid")
    assert _sorted_rows(salted) == _sorted_rows(plain)


def test_salted_join_matches_plain_left(spark, skewed):
    left, right = skewed
    plain = left.join(right, "k", "left")
    salted = joins.salted_join(left, right, ["k"], buckets=5,
                               distributor="rid", how="left")
    assert _sorted_rows(salted) == _sorted_rows(plain)


def test_salted_join_spreads_hot_key(spark, skewed):
    left, _ = skewed
    # the salt the operator derives must place the hot key's rows in
    # >1 bucket — otherwise the rewrite buys nothing
    salted = left.withColumn(
        "_salt", F.pmod(F.xxhash64("rid"), F.lit(7)).cast("int"))
    n = (salted.where(F.col("k") == 0)
         .select("_salt").distinct().count())
    assert n > 1


def test_salted_join_rejects_outer(spark, skewed):
    left, right = skewed
    with pytest.raises(ValueError):
        joins.salted_join(left, right, ["k"], buckets=4, how="full")


def test_bloom_semi_join_exact(spark, skewed):
    left, right = skewed
    keys = right.where(F.col("k") % 2 == 0)  # keys {0, 2}
    exact = left.join(keys.select("k"), "k", "left_semi")
    # tiny bitmap (128 bits) forces false positives through the
    # prefilter — the exact semi join must still remove them all
    got = joins.bloom_semi_join(left, keys, "k", "k", bits=128, k=2)
    assert _sorted_rows(got) == _sorted_rows(exact)


def test_bloom_prefilter_never_drops_members(spark):
    # keys engineered across the full word range, incl. values whose
    # probe position lands on bit 63 somewhere (sign corner)
    left = spark.createDataFrame(
        [Row(k=i * 7919 + 13, v=i) for i in range(500)])
    keys = left.where(F.col("v") % 3 == 0).select("k")
    bloom = joins.bloom_build(keys, "k", bits=1 << 10, k=3)
    pre = joins.bloom_prefilter(left, bloom, "k", bits=1 << 10, k=3)
    member_ids = {r.k for r in keys.collect()}
    surviving = {r.k for r in pre.collect()}
    assert member_ids <= surviving  # no false negatives, ever


def test_bloom_prefilter_is_map_side(spark, skewed):
    left, right = skewed
    bloom = joins.bloom_build(right.select("k"), "k", bits=1 << 10, k=3)
    pre = joins.bloom_prefilter(left, bloom, "k", bits=1 << 10, k=3)
    plan = pre._jdf.queryExecution().executedPlan().toString()
    # every bitmap probe is a broadcast join — the fact side joins
    # only by broadcast, never via a shuffle join (the bitmap BUILD
    # side's own bit_or groupBy shuffles <= bits/64 rows, which is
    # the point of the technique and allowed)
    assert plan.count("BroadcastHashJoin") >= 3
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
