"""Declared query registry — the correctness surface of the engine.

Every implemented operator from SURVEY.md §2 registers here:
  - a Spark callable ``(spark, sf_dir) -> DataFrame`` exercising the
    engine's operator API on the shared synthetic tables, and
  - (where SQL-expressible) a DuckDB oracle SQL string computing the
    same result on the same parquet.

Column names/types are aligned on both sides (the driver hashes values
after sorting columns by name). Float aggregates that accumulate over
many rows are rounded identically on both sides to absorb
summation-order differences; single-row or integer-derived values are
compared exactly.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pointdatabase_spark import testkit
from pointdatabase_spark.operators import spatial

QueryFn = Callable[[SparkSession, str], DataFrame]
_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn
    return deco


def all_queries() -> dict[str, QueryFn]:
    return dict(_QUERIES)


def all_oracles() -> dict[str, str]:
    return dict(_ORACLES)


# --------------------------------------------------------------------------
# Flagship: TPC-H-Q1-shaped pricing summary (scan → filter → groupBy agg).
# Exercises S1 scan, P-filters, A-aggregations, and map-side partial agg.
# --------------------------------------------------------------------------

_Q1_ORACLE = """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2)                                   AS sum_qty,
       ROUND(SUM(l_extendedprice), 2)                              AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)           AS sum_disc_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       ROUND(AVG(l_quantity), 6)                                   AS avg_qty,
       ROUND(AVG(l_extendedprice), 6)                              AS avg_price,
       ROUND(AVG(l_discount), 6)                                   AS avg_disc,
       COUNT(*)                                                    AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


@query("q1_pricing_summary", oracle=_Q1_ORACLE)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = testkit.load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (li.where(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
                 F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
                 F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
                 F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
                 F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
                 F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
                 F.round(F.avg("l_discount"), 6).alias("avg_disc"),
                 F.count(F.lit(1)).alias("count_order")))


# --------------------------------------------------------------------------
# P4 box query — the canonical spatial read path (geo_index.query_xy_box).
# --------------------------------------------------------------------------

_BOX = ((-50000.0, 25000.0), (-10000.0, 80000.0))

_BOX_ORACLE = testkit.syn_points_cte() + f"""
SELECT row_id, x, y, h
FROM pts
WHERE x BETWEEN {_BOX[0][0]} AND {_BOX[0][1]}
  AND y BETWEEN {_BOX[1][0]} AND {_BOX[1][1]}
"""


@query("box_query", oracle=_BOX_ORACLE)
def box_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = testkit.syn_points(spark, sf_dir)
    return spatial.box_query(pts, _BOX[0], _BOX[1], fields=["row_id", "x", "y", "h"])


# --------------------------------------------------------------------------
# A1 blockmedian — exact tie rule (pt_blockmedian.py:37-57).
# --------------------------------------------------------------------------

_BM_ORACLE = testkit.syn_points_cte() + """
, d AS (
  SELECT CAST(floor(x / 10000) AS BIGINT) AS cell_x,
         CAST(floor(y / 10000) AS BIGINT) AS cell_y,
         x, y, h,
         row_number() OVER (PARTITION BY floor(x / 10000), floor(y / 10000)
                            ORDER BY h, row_id) AS rn,
         count(*)    OVER (PARTITION BY floor(x / 10000), floor(y / 10000)) AS n
  FROM pts)
SELECT cell_x, cell_y,
       AVG(x) AS x, AVG(y) AS y, AVG(h) AS h,
       CAST(MAX(n) AS BIGINT) AS n_in_cell
FROM d
WHERE rn >= floor((n + 1) / 2) AND rn <= floor(n / 2) + 1
GROUP BY cell_x, cell_y
"""


@query("blockmedian_10km", oracle=_BM_ORACLE)
def blockmedian_10km(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = testkit.syn_points(spark, sf_dir)
    return spatial.blockmedian(pts, delta=10000.0, x="x", y="y", z="h",
                               order_col="row_id")


# --------------------------------------------------------------------------
# A2 blockmax — argmax row per cell (blockmax.py:10-31). The z used is
# made unique (h + row_id·1e-6, exact in IEEE double) so the argmax is
# well-defined in both engines.
# --------------------------------------------------------------------------

_BMAX_ORACLE = testkit.syn_points_cte() + """
, d AS (SELECT x, y, h + row_id / 1000000.0 AS zz FROM pts)
SELECT CAST(floor(x / 10000) AS BIGINT) AS cell_x,
       CAST(floor(y / 10000) AS BIGINT) AS cell_y,
       arg_max(x, zz) AS x, arg_max(y, zz) AS y, MAX(zz) AS zz,
       COUNT(*) AS n_in_cell
FROM d
GROUP BY cell_x, cell_y
"""


@query("blockmax_10km", oracle=_BMAX_ORACLE)
def blockmax_10km(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = testkit.syn_points(spark, sf_dir).withColumn(
        "zz", F.col("h") + F.col("row_id") / F.lit(1000000.0))
    return spatial.blockmax(pts, delta=10000.0, x="x", y="y", z="zz")


# --------------------------------------------------------------------------
# A8 extent — min/max bounds (geo_index.py:516-523).
# --------------------------------------------------------------------------

_EXTENT_ORACLE = testkit.syn_points_cte() + """
SELECT MIN(x) AS x_min, MAX(x) AS x_max, MIN(y) AS y_min, MAX(y) AS y_max
FROM pts
"""


@query("extent_bounds", oracle=_EXTENT_ORACLE)
def extent_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spatial.extent(testkit.syn_points(spark, sf_dir))
