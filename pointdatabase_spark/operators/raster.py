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

GeoTIFF loading (S4/S5): GDAL's common outputs — strips or tiles,
uncompressed/LZW/deflate, predictor 1/2/3, float or integer samples —
read through the stdlib codec in ``sources.geotiff``; exotic layouts
(JPEG, palette, planar) fall back to rasterio behind an import gate.
`Grid` construction from arrays/DataFrames is fully functional and
tested.
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

    GDAL's common raster layouts — strip- or tile-organized,
    uncompressed / LZW / deflate, TIFF predictor 1/2/3, IEEE-float or
    integer samples — read via the stdlib codec, with finite
    GDAL_NODATA masked to NaN exactly like read_DEM.py:45-47. Exotic
    files (JPEG compression, palette, planar interleave) fall back to
    rasterio when it is importable; otherwise the NotImplementedError
    gate documents the missing dependency."""
    from pointdatabase_spark.sources import geotiff as _gt
    try:
        return _gt.read_geotiff(path, band=band)
    except NotImplementedError as gate:
        try:
            import rasterio
        except ImportError:  # pragma: no cover - container has no rasterio
            raise NotImplementedError(
                f"{gate}; rasterio fallback is not shipped in this "
                "container") from gate
        with rasterio.open(path) as src:  # pragma: no cover
            z = src.read(band).astype(np.float64)
            if src.nodata is not None and np.isfinite(src.nodata):
                z[z == src.nodata] = np.nan
            t = src.transform
            return Grid(x0=float(t.c + t.a / 2.0),
                        y0=float(t.f + t.e * (src.height - 0.5)),
                        dx=float(t.a), dy=float(-t.e),
                        z=np.ascontiguousarray(z[::-1, :]))


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


def _cubic_weights(f):
    """Catmull-Rom / Keys (a = -0.5) cubic-convolution weights for the
    4-tap stencil at offsets (-1, 0, +1, +2), fraction f in [0, 1).
    Horner forms are written EXACTLY as the SQL oracle writes them so
    both engines execute the same IEEE op sequence."""
    w_m1 = ((-0.5 * f + 1.0) * f - 0.5) * f
    w_0 = (1.5 * f - 2.5) * f * f + 1.0
    w_p1 = ((-1.5 * f + 2.0) * f + 0.5) * f
    w_p2 = (0.5 * f - 0.5) * f * f
    return w_m1, w_0, w_p1, w_p2


def _cubic(grid_z: np.ndarray, x0: float, y0: float, dx: float,
           dy: float, xs: np.ndarray, ys: np.ndarray) -> np.ndarray:
    """Vectorized bicubic (cubic-convolution) interpolation over the
    4×4 neighborhood, edge-clamped to keep the stencil in-grid.

    This is the engine's "spline" interpolation variant — the Spark
    re-expression of reference ``mapData.interp``'s spline path
    (mapData.py:245-260, scipy RectBivariateSpline). The reference
    fits a *global* tensor-product B-spline; a global spline solve
    neither distributes nor SQL-mirrors, so the engine uses the
    standard local cubic-convolution kernel (Keys a=-0.5 — GDAL's
    "cubicspline"-family resampler): C¹-continuous, reproduces
    degree-1 fields exactly, and each output value depends on a fixed
    4×4 stencil, so the operator stays a narrow broadcast map at any
    scale. Separable row-then-column evaluation in a fixed order,
    mirrored term-for-term by the SQL oracle."""
    ny, nx = grid_z.shape
    gx = (xs - x0) / dx
    gy = (ys - y0) / dy
    i0 = np.clip(np.floor(gx), 1, nx - 3)
    j0 = np.clip(np.floor(gy), 1, ny - 3)
    fx = gx - i0
    fy = gy - j0
    i0 = i0.astype(np.int64)
    j0 = j0.astype(np.int64)
    wx = _cubic_weights(fx)
    wy = _cubic_weights(fy)
    rows = []
    for m in (-1, 0, 1, 2):
        row = (grid_z[j0 + m, i0 - 1] * wx[0]
               + grid_z[j0 + m, i0] * wx[1]
               + grid_z[j0 + m, i0 + 1] * wx[2]
               + grid_z[j0 + m, i0 + 2] * wx[3])
        rows.append(row)
    return (rows[0] * wy[0] + rows[1] * wy[1]
            + rows[2] * wy[2] + rows[3] * wy[3])


def grid_to_points(spark: SparkSession, grid: Grid,
                   bounds: tuple[tuple[float, float],
                                 tuple[float, float]] | None = None,
                   skip: int = 1,
                   nodata: float | None = None) -> DataFrame:
    """S4 raster→points explode (read_DEM.py:52-64, ``asPoints=True``):
    meshgrid the axes, ravel z, keep every ``skip``-th cell in each
    axis, window to ``bounds`` = ((x_min, x_max), (y_min, y_max)), and
    map ``nodata`` to NULL (the engine's missing-value convention,
    SURVEY §1.2; read_DEM.py:40-41 maps it to NaN).

    Distributed shape: one Spark task per band of raster rows —
    ``spark.range(ny)`` drives a ``mapInPandas`` that emits that row's
    points from the broadcast grid. The explode is a narrow map (no
    shuffle); bounds/skip are applied inside the generator so the
    output never materializes dropped cells. A continent-scale DEM
    would swap the broadcast for per-chunk file reads in the same
    generator; the plan shape (range → narrow map) is unchanged."""
    bc = spark.sparkContext.broadcast(
        (grid.z, grid.x0, grid.y0, grid.dx, grid.dy))
    step = int(skip)
    bnds = bounds

    def gen(batches):
        z, x0, y0, dx, dy = bc.value
        _, nx = z.shape
        ii = np.arange(0, nx, step, dtype=np.int64)
        xs = x0 + ii * dx
        keep = np.ones(len(ii), dtype=bool)
        if bnds is not None:
            keep = (xs >= bnds[0][0]) & (xs <= bnds[0][1])
        for pdf in batches:
            for j in pdf["id"].to_numpy(np.int64):
                if j % step:
                    continue
                y = y0 + j * dy
                if bnds is not None and not (bnds[1][0] <= y <= bnds[1][1]):
                    continue
                yield pd.DataFrame({
                    "i": ii[keep], "j": j, "x": xs[keep], "y": y,
                    "z": z[j, ii[keep]].astype(np.float64)})

    n_tasks = max(1, min(grid.ny, spark.sparkContext.defaultParallelism))
    pts = (spark.range(0, grid.ny, numPartitions=n_tasks)
           .mapInPandas(gen, "i bigint, j bigint, x double, y double,"
                        " z double"))
    if nodata is not None:
        pts = pts.withColumn(
            "z", F.when(F.col("z") == F.lit(float(nodata)),
                        F.lit(None)).otherwise(F.col("z")))
    return pts


_KERNELS = {"bilinear": _bilinear, "spline": _cubic, "cubic": _cubic}


def interp_column(spark: SparkSession, grid: Grid,
                  x: str = "x", y: str = "y",
                  kind: str = "bilinear") -> Column:
    """Column evaluating `grid` at (x, y) via a broadcast + pandas UDF.
    ``kind``: "bilinear" (mapData.interp kx=ky=1 path) or
    "spline"/"cubic" (the spline path, mapData.py:245-260, as local
    cubic convolution — see :func:`_cubic`)."""
    if kind not in _KERNELS:
        raise ValueError(f"unknown interp kind: {kind!r}")
    kernel = _KERNELS[kind]
    bc = spark.sparkContext.broadcast(
        (grid.z, grid.x0, grid.y0, grid.dx, grid.dy))

    @F.pandas_udf("double")
    def _interp(xs: pd.Series, ys: pd.Series) -> pd.Series:
        z, x0, y0, dx, dy = bc.value
        return pd.Series(kernel(z, x0, y0, dx, dy,
                                xs.to_numpy(np.float64),
                                ys.to_numpy(np.float64)))

    return _interp(F.col(x), F.col(y))


def interp_join(df: DataFrame, grid: Grid, out: str = "z_interp",
                x: str = "x", y: str = "y",
                kind: str = "bilinear") -> DataFrame:
    """J5: append the interpolated raster value to every point row."""
    return df.withColumn(out, interp_column(df.sparkSession, grid, x, y,
                                            kind=kind))


def mask_test(df: DataFrame, mask_grid: Grid, out: str = "grounded",
              x: str = "x", y: str = "y", tol: float = 0.01) -> DataFrame:
    """P12: grounded flag — |interp(mask) − 1| < tol
    (cross_ATL06_tile.py:112-115)."""
    interp = interp_column(df.sparkSession, mask_grid, x, y)
    return df.withColumn(out, F.abs(interp - F.lit(1.0)) < F.lit(tol))


# --------------------------------------------------------------------------
# F7: normalize / colormap (reference mapData.py:179-195). The reference
# rescales the raster z band affinely from range z0 to range z1 with
# optional clamping (`normalize`) and maps the [0,1] result through a
# matplotlib colormap (`toRGB`, caxis defaulting to the band min/max).
# Re-expression: both are pure arithmetic, so they are rendered as SQL
# text valid in BOTH Spark SQL and DuckDB (the oracle runs the same
# string) — codegen'd, no UDF, no shuffle; the caxis default needs one
# global min/max aggregate broadcast back over the rows.
# --------------------------------------------------------------------------

# 8 anchor stops of matplotlib's viridis (public domain values); the
# LUT is nearest-stop (ListedColormap semantics: idx = floor(x*N),
# clamped), rendered as a CASE chain so the identical text runs in
# both engines.
VIRIDIS8 = [
    (0.267004, 0.004874, 0.329415),
    (0.275191, 0.194905, 0.496005),
    (0.212395, 0.359683, 0.551710),
    (0.153364, 0.497000, 0.557724),
    (0.122312, 0.633153, 0.530398),
    (0.288921, 0.758394, 0.428426),
    (0.626579, 0.854645, 0.223353),
    (0.993248, 0.906157, 0.143936),
]


def normalize_sql(col: str, z0: tuple[float, float] = (0.0, 255.0),
                  z1: tuple[float, float] = (0.0, 1.0),
                  truncate: bool = True) -> str:
    """Affine rescale of `col` from range z0 to range z1, clamped to
    z1 when `truncate` (mapData.py:179-185). NULL stays NULL (both
    engines' least/greatest would otherwise swallow it)."""
    a0, a1 = float(z0[0]), float(z0[1])
    b0, b1 = float(z1[0]), float(z1[1])
    body = f"(({col}) - {a0!r}) / ({a1!r} - {a0!r}) * ({b1!r} - {b0!r}) + {b0!r}"
    if truncate:
        lo, hi = min(b0, b1), max(b0, b1)
        body = f"least(greatest({body}, {lo!r}), {hi!r})"
    return f"CASE WHEN ({col}) IS NULL THEN NULL ELSE {body} END"


def lut_channel_sql(xn: str, lut: list[tuple[float, float, float]],
                    channel: int) -> str:
    """Nearest-stop LUT pick for one RGB channel over a normalized
    [0,1] column: idx = floor(xn*N) clamped to N-1 — matplotlib
    ListedColormap indexing (mapData.py:187-195). CASE-chain text is
    dialect-free, so the oracle runs the same string."""
    n = len(lut)
    idx = f"least({n - 1}, CAST(floor(({xn}) * {n}) AS INT))"
    # CAST(... AS DOUBLE): a bare decimal literal is DECIMAL in Spark
    # but DOUBLE in DuckDB — the cast (valid in both) pins the type
    arms = " ".join(
        f"WHEN {i} THEN CAST({lut[i][channel]!r} AS DOUBLE)"
        for i in range(n))
    return f"CASE {idx} {arms} END"


def normalize_column(col: str, z0: tuple[float, float] = (0.0, 255.0),
                     z1: tuple[float, float] = (0.0, 1.0),
                     truncate: bool = True) -> Column:
    return F.expr(normalize_sql(col, z0, z1, truncate))


def to_rgb(df: DataFrame, col: str,
           lut: list[tuple[float, float, float]] | None = None,
           caxis: tuple[float, float] | None = None,
           out_prefix: str = "") -> DataFrame:
    """F7 toRGB: normalize `col` to [0,1] over `caxis` (default: the
    global min/max, via a 1-row aggregate broadcast back over the
    rows — the Spark shape of the reference's z.min()/z.max()) and
    append nearest-stop LUT channels r/g/b plus an alpha flag that
    zeroes non-finite input (mapData.py:163-177 add_alpha_band)."""
    lut = lut or VIRIDIS8
    if caxis is None:
        bounds = df.agg(F.min(col).alias("_cmin"), F.max(col).alias("_cmax"))
        df = df.crossJoin(F.broadcast(bounds))
        # caxis bounds are columns, not floats — render the affine
        # rescale manually (normalize_sql repr()s literal bounds)
        xn = (f"CASE WHEN ({col}) IS NULL THEN NULL ELSE "
              f"least(greatest((({col}) - _cmin) / (_cmax - _cmin)"
              f" * (1.0 - 0.0) + 0.0, 0.0), 1.0) END")
    else:
        xn = normalize_sql(col, caxis)
    p = out_prefix
    out = (df.withColumn(f"{p}zn", F.expr(xn))
           .withColumn(f"{p}r", F.expr(lut_channel_sql(f"{p}zn", lut, 0)))
           .withColumn(f"{p}g", F.expr(lut_channel_sql(f"{p}zn", lut, 1)))
           .withColumn(f"{p}b", F.expr(lut_channel_sql(f"{p}zn", lut, 2)))
           .withColumn(f"{p}alpha", F.expr(
               f"CASE WHEN ({col}) IS NULL THEN 0.0D "
               f"WHEN isnan(CAST(({col}) AS DOUBLE)) THEN 0.0D "
               f"ELSE 1.0D END")))
    return out.drop("_cmin", "_cmax") if caxis is None else out
