"""Per-group least-squares surface fitting (A7 at scale).

The reference fits a plane per crossover from 4 points with a 4×4
solve (calc_slope, cross_ATL06_tile.py:101-127); the crossover kernel
covers that case. This module is the *distributed* generalization: an
OLS plane z = a + b·x + c·y per spatial bin over arbitrarily many
points, expressed as ONE aggregation — no UDF, no per-group Python.

Numeric strategy for oracle-exact results: accumulate the normal
equations as **exact integer sums** (inputs are integer-valued, so
SUM(BIGINT) is exact and order-independent — float summation order
across partitions can never perturb it), then evaluate the closed-form
Cramer solution in double precision from those 9 exact sums. The same
formula text is rendered into the DuckDB oracle, so both engines run
the identical IEEE expression DAG. This is also the right 100-TB shape:
partial aggregation is map-side, one shuffle of 9 longs per bin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# 3×3 Cramer solution of [n sx sy; sx sxx sxy; sy sxy syy]·[a b c]ᵀ =
# [sz sxz syz]ᵀ. Placeholders are the (double-cast) exact sums.
DET = ("({n} * ({sxx} * {syy} - {sxy} * {sxy})"
       " - {sx} * ({sx} * {syy} - {sxy} * {sy})"
       " + {sy} * ({sx} * {sxy} - {sxx} * {sy}))")
DET_B = ("({n} * ({sxz} * {syy} - {sxy} * {syz})"
         " - {sz} * ({sx} * {syy} - {sxy} * {sy})"
         " + {sy} * ({sx} * {syz} - {sxz} * {sy}))")
DET_C = ("({n} * ({sxx} * {syz} - {sxz} * {sxy})"
         " - {sx} * ({sx} * {syz} - {sxz} * {sy})"
         " + {sz} * ({sx} * {sxy} - {sxx} * {sy}))")

_SUMS = ("n", "sx", "sy", "sz", "sxx", "sxy", "syy", "sxz", "syz")


def _doubles() -> dict[str, str]:
    return {k: f"CAST({k} AS DOUBLE)" for k in _SUMS}


def slope_exprs() -> tuple[str, str]:
    """(slope_x, slope_y) formula strings over columns named like
    _SUMS — identical text is used by the engine and the oracle.

    The determinant is wrapped in NULLIF(det, 0): a degenerate cell
    (all x or all y identical, or collinear points) has a singular
    normal matrix, and both Spark (ANSI mode) and DuckDB must yield
    NULL slopes there rather than raise DIVIDE_BY_ZERO. NULLIF parses
    identically in both dialects, so the expression DAGs stay equal."""
    d = _doubles()
    return (f"{DET_B.format(**d)} / NULLIF({DET.format(**d)}, 0)",
            f"{DET_C.format(**d)} / NULLIF({DET.format(**d)}, 0)")


def plane_fit_by_bin(df: DataFrame, delta: float, x: str = "x",
                     y: str = "y", z: str = "z") -> DataFrame:
    """Exact OLS plane per floor-bin. Input x, y, z must be
    integer-valued (cast to BIGINT internally); output slopes are
    double. Returns (cell_x, cell_y, n_pts, slope_x, slope_y)."""
    xb = F.col(x).cast("long")
    yb = F.col(y).cast("long")
    zb = F.col(z).cast("long")
    sums = (df.groupBy(
        F.floor(F.col(x) / F.lit(delta)).cast("long").alias("cell_x"),
        F.floor(F.col(y) / F.lit(delta)).cast("long").alias("cell_y"))
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum(xb).alias("sx"), F.sum(yb).alias("sy"),
             F.sum(zb).alias("sz"),
             F.sum(xb * xb).alias("sxx"), F.sum(xb * yb).alias("sxy"),
             F.sum(yb * yb).alias("syy"),
             F.sum(xb * zb).alias("sxz"), F.sum(yb * zb).alias("syz")))
    bx, cy = slope_exprs()
    return sums.select(
        "cell_x", "cell_y", F.col("n").alias("n_pts"),
        F.expr(bx).alias("slope_x"), F.expr(cy).alias("slope_y"))


def oracle_sql(points_cte: str, delta: float, x: str = "x", y: str = "y",
               z_expr: str = "z") -> str:
    """DuckDB SQL computing the identical plane fit on the same CTE."""
    bx, cy = slope_exprs()
    return points_cte + f"""
, s AS (
  SELECT CAST(floor({x} / {delta}) AS BIGINT) AS cell_x,
         CAST(floor({y} / {delta}) AS BIGINT) AS cell_y,
         COUNT(*) AS n,
         CAST(SUM(CAST({x} AS BIGINT)) AS BIGINT) AS sx,
         CAST(SUM(CAST({y} AS BIGINT)) AS BIGINT) AS sy,
         CAST(SUM(CAST({z_expr} AS BIGINT)) AS BIGINT) AS sz,
         CAST(SUM(CAST({x} AS BIGINT) * CAST({x} AS BIGINT)) AS BIGINT) AS sxx,
         CAST(SUM(CAST({x} AS BIGINT) * CAST({y} AS BIGINT)) AS BIGINT) AS sxy,
         CAST(SUM(CAST({y} AS BIGINT) * CAST({y} AS BIGINT)) AS BIGINT) AS syy,
         CAST(SUM(CAST({x} AS BIGINT) * CAST({z_expr} AS BIGINT)) AS BIGINT) AS sxz,
         CAST(SUM(CAST({y} AS BIGINT) * CAST({z_expr} AS BIGINT)) AS BIGINT) AS syz
  FROM pts GROUP BY 1, 2)
SELECT cell_x, cell_y, n AS n_pts,
       {bx} AS slope_x,
       {cy} AS slope_y
FROM s
"""
