"""CRS transform (F1) — THE custom scalar op of the reference
(point_data.py:135-160 `get_xy`, geo_index.py:102-112 `from_latlon`):
geographic lat/lon → projected polar-stereographic x/y.

The reference delegates to GDAL/osr with proj4 strings
(EPSG:3413 north / EPSG:3031 south). Neither GDAL nor pyproj ships in
this container, so the transform is implemented directly from the
published ellipsoidal polar-stereographic equations (Snyder 1987,
"Map Projections — A Working Manual", eqs. 21-33..21-34 / EPSG method
9810 variant B) on WGS84 — pure NumPy inside an Arrow-batched pandas
UDF, the canonical Spark shape for a vectorized scalar kernel.

Scale: the UDF is a narrow per-batch map — no shuffle, no state —
so it rides whatever partitioning the point table already has.

Projection constants (scale at true latitude) are precomputed once in
driver Python and inlined into both the kernel and the SQL oracle as
exact double literals, so the only per-row math is elementary trig.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

WGS84_A = 6378137.0
WGS84_E2 = 0.00669437999014
_E = math.sqrt(WGS84_E2)
_D2R = math.pi / 180.0

# (lat_ts, lon_0, sign) per hemisphere: EPSG:3413 / EPSG:3031.
HEMIS = {1: (70.0, -45.0, 1.0), -1: (-71.0, 0.0, -1.0)}


def _t_scalar(phi: float) -> float:
    return (math.tan(math.pi / 4 - phi / 2)
            / ((1 - _E * math.sin(phi)) / (1 + _E * math.sin(phi)))
            ** (_E / 2))


def _m_scalar(phi: float) -> float:
    return math.cos(phi) / math.sqrt(1 - WGS84_E2 * math.sin(phi) ** 2)


def stereo_constants(hemisphere: int) -> tuple[float, float]:
    """(rho_factor, lon0_rad): rho = rho_factor · t(|phi|)."""
    lat_ts, lon_0, _ = HEMIS[hemisphere]
    phi_ts = abs(lat_ts) * _D2R
    return (WGS84_A * _m_scalar(phi_ts) / _t_scalar(phi_ts),
            lon_0 * _D2R)


def polar_stereo_forward(lat: np.ndarray, lon: np.ndarray,
                         hemisphere: int = 1
                         ) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized forward transform. Operation order is mirrored by the
    SQL oracle (queries.py) term for term."""
    rho_f, lon0 = stereo_constants(hemisphere)
    sign = HEMIS[hemisphere][2]
    phi = (lat * sign) * _D2R
    lam = (lon * sign) * _D2R
    sphi = np.sin(phi)
    t = (np.tan(np.pi / 4 - phi / 2)
         / ((1 - _E * sphi) / (1 + _E * sphi)) ** (_E / 2))
    rho = rho_f * t
    theta = lam - lon0
    x = rho * np.sin(theta) * sign
    y = -rho * np.cos(theta) * sign
    return x, y


def stereo_xy_columns(lat: str = "latitude", lon: str = "longitude",
                      hemisphere: int = 1) -> tuple[Column, Column]:
    """(x, y) Columns via a single pandas UDF returning a struct."""

    @F.pandas_udf("x double, y double")
    def _fwd(la: pd.Series, lo: pd.Series) -> pd.DataFrame:
        x, y = polar_stereo_forward(la.to_numpy(np.float64),
                                    lo.to_numpy(np.float64), hemisphere)
        return pd.DataFrame({"x": x, "y": y})

    s = _fwd(F.col(lat), F.col(lon))
    return s.getField("x"), s.getField("y")


# The two production proj4 strings of the reference (ATL06_tiles.py:
# 221,223); normalized token sets so whitespace/order variations match.
_PROJ4_POLAR = {
    1: "+proj=stere +lat_0=90 +lat_ts=70 +lon_0=-45 +k=1 +x_0=0 +y_0=0"
       " +datum=WGS84 +units=m +no_defs",
    -1: "+proj=stere +lat_0=-90 +lat_ts=-71 +lon_0=0 +k=1 +x_0=0 +y_0=0"
        " +datum=WGS84 +units=m +no_defs",
}
_EPSG_POLAR = {3413: 1, 3031: -1}


def _polar_hemisphere(proj4_string: str | None,
                      epsg: int | None) -> int | None:
    """Hemisphere (1/-1) when the CRS is one of the two production
    polar-stereographic systems; None for anything else."""
    if epsg is not None and int(epsg) in _EPSG_POLAR:
        return _EPSG_POLAR[int(epsg)]
    if proj4_string is not None:
        toks = set(proj4_string.split())
        for hemi, canon in _PROJ4_POLAR.items():
            if set(canon.split()) <= toks:
                return hemi
    return None


def transform_xy_columns(lat: str = "latitude", lon: str = "longitude",
                         proj4_string: str | None = None,
                         epsg: int | None = None
                         ) -> tuple[Column, Column]:
    """Arbitrary-CRS forward transform — the full reference surface
    (ATL06_data.py:209-232 ``get_xy(proj4_string, EPSG)``,
    geo_index.py:102-112 ``from_latlon`` with any ``SRS_proj4``).

    The two production polar-stereographic systems (EPSG:3413/3031 and
    their proj4 spellings) take the dependency-free NumPy fast path —
    identical output to :func:`stereo_xy_columns`. Any other CRS
    dispatches to pyproj inside the same Arrow-batched pandas UDF
    shape; when pyproj is not importable (this container does not ship
    it) the gate raises NotImplementedError at plan-build time rather
    than inside executor tasks."""
    if proj4_string is None and epsg is None:
        raise ValueError("provide proj4_string or epsg")
    hemi = _polar_hemisphere(proj4_string, epsg)
    if hemi is not None:
        return stereo_xy_columns(lat, lon, hemisphere=hemi)
    try:
        import pyproj  # noqa: F401
    except ImportError as exc:
        crs_desc = proj4_string if proj4_string is not None else f"EPSG:{epsg}"
        raise NotImplementedError(
            f"CRS {crs_desc!r} needs pyproj (not shipped in this "
            "container); only the polar-stereographic fast path "
            "(EPSG:3413/3031) is dependency-free") from exc

    crs_arg = proj4_string if proj4_string is not None else int(epsg)

    @F.pandas_udf("x double, y double")
    def _fwd(la: pd.Series, lo: pd.Series) -> pd.DataFrame:  # pragma: no cover
        from pyproj import Transformer
        tr = Transformer.from_crs("EPSG:4326", crs_arg, always_xy=True)
        x, y = tr.transform(lo.to_numpy(np.float64),
                            la.to_numpy(np.float64))
        return pd.DataFrame({"x": x, "y": y})

    s = _fwd(F.col(lat), F.col(lon))
    return s.getField("x"), s.getField("y")


def oracle_sql_exprs(hemisphere: int = 1, lat: str = "lat",
                     lon: str = "lon") -> tuple[str, str]:
    """DuckDB SQL (x, y) expressions mirroring the kernel, with the
    same inlined double constants."""
    rho_f, lon0 = stereo_constants(hemisphere)
    sign = HEMIS[hemisphere][2]
    phi = f"(({lat} * {sign!r}) * {_D2R!r})"
    lam = f"(({lon} * {sign!r}) * {_D2R!r})"
    t = (f"(tan({math.pi / 4!r} - {phi} / 2) / "
         f"((1 - {_E!r} * sin({phi})) / (1 + {_E!r} * sin({phi})))"
         f" ** {_E / 2!r})")
    rho = f"({rho_f!r} * {t})"
    theta = f"({lam} - {lon0!r})"
    return (f"{rho} * sin({theta}) * {sign!r}",
            f"-{rho} * cos({theta}) * {sign!r}")
