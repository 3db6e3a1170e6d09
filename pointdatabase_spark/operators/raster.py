"""Raster-lookup join (J5) and raster mask test (P12): evaluate a
gridded field at point locations — the Spark re-expression of
``mapData.interp`` (reference mapData.py:227-269) and the grounded-mask
test (cross_ATL06_tile.py:112-115, ATL06_tiles.py:180-201).

Design: rasters are small ancillary grids (SURVEY §1.1) → **broadcast**
the grid array once per executor and evaluate it inside an
Arrow-batched pandas UDF (vectorized NumPy bilinear interpolation).
This is the canonical "broadcast small side of an interval join"
pattern: no shuffle at all — the point table streams through map tasks
while every executor holds the (tiny) grid.

At 100 TB of points the plan is unchanged: the UDF is a narrow map, so
the join parallelizes with the point partitioning; only grids too big
to broadcast (continental DEMs at metre resolution) would need the
alternative explode-raster-to-points + bin equi-join path (S4
``asPoints``, read_DEM.py:52-64).

GeoTIFF/HDF5 loading (S4/S5) needs rasterio/GDAL, which this container
does not ship — the loaders are stubbed behind import guards; `Grid`
construction from arrays/DataFrames is fully functional and tested.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Grid:
    """Uniform raster grid: node (i, j) sits at
    (x0 + i*dx, y0 + j*dy); `z[j, i]` is row-major with y as rows."""
    x0: float
    y0: float
    dx: float
    dy: float
    z: np.ndarray  # shape (ny, nx)

    @property
    def nx(self) -> int:
        return self.z.shape[1]

    @property
    def ny(self) -> int:
        return self.z.shape[0]


def grid_from_formula(x0: float, y0: float, dx: float, dy: float,
                      nx: int, ny: int, fn) -> Grid:
    """Deterministic synthetic grid: z[j, i] = fn(i, j) (vectorized)."""
    jj, ii = np.meshgrid(np.arange(ny), np.arange(nx), indexing="ij")
    return Grid(x0, y0, dx, dy, fn(ii, jj).astype(np.float64))


def load_geotiff(path: str, band: int = 1) -> Grid:
    """S4/S5 GeoTIFF scan (read_DEM.py:14-69, mapData.py:39-94).
    Requires rasterio, which is not available in this environment."""
    try:
        import rasterio  # noqa: F401
    except ImportError as exc:  # pragma: no cover
        raise NotImplementedError(
            "GeoTIFF loading requires rasterio; not shipped in this "
            "container. Construct a Grid directly instead.") from exc
    raise NotImplementedError  # pragma: no cover


def _bilinear(grid_z: np.ndarray, x0: float, y0: float, dx: float,
              dy: float, xs: np.ndarray, ys: np.ndarray) -> np.ndarray:
    """Vectorized bilinear interpolation, edge-clamped.

    Operation order is fixed and mirrored by the SQL oracle
    (queries.py): gx = (x-x0)/dx; i0 = clamp(floor(gx)); fx = gx-i0;
    z = z00*(1-fx)*(1-fy) + z10*fx*(1-fy) + z01*(1-fx)*fy + z11*fx*fy.
    """
    ny, nx = grid_z.shape
    gx = (xs - x0) / dx
    gy = (ys - y0) / dy
    i0 = np.clip(np.floor(gx), 0, nx - 2)
    j0 = np.clip(np.floor(gy), 0, ny - 2)
    fx = gx - i0
    fy = gy - j0
    i0 = i0.astype(np.int64)
    j0 = j0.astype(np.int64)
    z00 = grid_z[j0, i0]
    z10 = grid_z[j0, i0 + 1]
    z01 = grid_z[j0 + 1, i0]
    z11 = grid_z[j0 + 1, i0 + 1]
    return (z00 * (1 - fx) * (1 - fy) + z10 * fx * (1 - fy)
            + z01 * (1 - fx) * fy + z11 * fx * fy)


def interp_column(spark: SparkSession, grid: Grid,
                  x: str = "x", y: str = "y") -> Column:
    """Column evaluating `grid` at (x, y) via a broadcast + pandas UDF."""
    bc = spark.sparkContext.broadcast(
        (grid.z, grid.x0, grid.y0, grid.dx, grid.dy))

    @F.pandas_udf("double")
    def _interp(xs: pd.Series, ys: pd.Series) -> pd.Series:
        z, x0, y0, dx, dy = bc.value
        return pd.Series(_bilinear(z, x0, y0, dx, dy,
                                   xs.to_numpy(np.float64),
                                   ys.to_numpy(np.float64)))

    return _interp(F.col(x), F.col(y))


def interp_join(df: DataFrame, grid: Grid, out: str = "z_interp",
                x: str = "x", y: str = "y") -> DataFrame:
    """J5: append the interpolated raster value to every point row."""
    return df.withColumn(out, interp_column(df.sparkSession, grid, x, y))


def mask_test(df: DataFrame, mask_grid: Grid, out: str = "grounded",
              x: str = "x", y: str = "y", tol: float = 0.01) -> DataFrame:
    """P12: grounded flag — |interp(mask) − 1| < tol
    (cross_ATL06_tile.py:112-115)."""
    interp = interp_column(df.sparkSession, mask_grid, x, y)
    return df.withColumn(out, F.abs(interp - F.lit(1.0)) < F.lit(tol))
