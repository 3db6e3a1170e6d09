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


def polar_stereo_inverse(x: np.ndarray, y: np.ndarray,
                         hemisphere: int = 1
                         ) -> tuple[np.ndarray, np.ndarray]:
    """Inverse polar-stereographic transform (Snyder 1987 eq. 7-9 /
    3-5 fixed point: φ from the conformal parameter t by iterating
    φ = π/2 − 2·atan(t·((1−e·sinφ)/(1+e·sinφ))^(e/2)); converges
    geometrically in e², 12 rounds give sub-nm residual). Completes
    the CRS module's forward/inverse pairs (tmerc has
    :func:`tmerc_inverse`)."""
    rho_f, lon0 = stereo_constants(hemisphere)
    sign = HEMIS[hemisphere][2]
    xs = np.asarray(x, np.float64) * sign
    ys = -np.asarray(y, np.float64) * sign
    rho = np.hypot(xs, ys)
    t = rho / rho_f
    theta = np.arctan2(xs, ys)
    lam = theta + lon0
    phi = np.pi / 2 - 2 * np.arctan(t)
    for _ in range(12):
        es = _E * np.sin(phi)
        phi = (np.pi / 2
               - 2 * np.arctan(t * ((1 - es) / (1 + es)) ** (_E / 2)))
    # the pole (rho == 0) has indeterminate longitude; return lon0
    lam = np.where(rho == 0, lon0, lam)
    lon = (lam / _D2R) * sign
    return (phi / _D2R * sign,
            (lon + 180.0) % 360.0 - 180.0)  # wrap to (-180, 180]


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

    Dependency-free paths (no pyproj needed):

    - the two production polar-stereographic systems (EPSG:3413/3031
      and their proj4 spellings) — NumPy pandas-UDF kernel, identical
      output to :func:`stereo_xy_columns`;
    - WGS84 UTM zones (EPSG:326xx/327xx) and generic ``+proj=utm`` /
      ``+proj=tmerc`` strings — Krüger-series built-in Columns, fully
      JVM-side;
    - WGS84 ``+proj=lcc`` / ``+proj=aea`` conics (Lambert conformal,
      Albers equal-area) — Snyder closed forms as built-in Columns;
    - geographic passthrough (EPSG:4326, ``+proj=longlat``) —
      (x, y) = (lon, lat) degrees, the reference's no-op SRS case.

    Anything else dispatches to pyproj inside the same Arrow-batched
    pandas UDF shape; when pyproj is not importable (this container
    does not ship it) the gate raises NotImplementedError at
    plan-build time rather than inside executor tasks."""
    if proj4_string is None and epsg is None:
        raise ValueError("provide proj4_string or epsg")
    hemi = _polar_hemisphere(proj4_string, epsg)
    if hemi is not None:
        return stereo_xy_columns(lat, lon, hemisphere=hemi)
    if epsg is not None:
        if int(epsg) == 4326:
            return F.col(lon).cast("double"), F.col(lat).cast("double")
        utm = utm_params(int(epsg))
        if utm is not None:
            return tmerc_xy_columns(lat, lon, *utm)
    if proj4_string is not None:
        toks = proj4_string.split()
        if "+proj=longlat" in toks or "+proj=latlong" in toks:
            return F.col(lon).cast("double"), F.col(lat).cast("double")
        tm = _parse_tmerc_proj4(proj4_string)
        if tm is not None:
            return tmerc_xy_columns(lat, lon, *tm)
        conic = _parse_conic_proj4(proj4_string)
        if conic is not None:
            kind, p = conic
            return conic_xy_columns(kind, p["lat1"], p["lat2"],
                                    p["lat0"], p["lon0"], p["x0"],
                                    p["y0"], lat=lat, lon=lon)
    try:
        import pyproj  # noqa: F401
    except ImportError as exc:
        crs_desc = proj4_string if proj4_string is not None else f"EPSG:{epsg}"
        raise NotImplementedError(
            f"CRS {crs_desc!r} needs pyproj (not shipped in this "
            "container); dependency-free families are polar "
            "stereographic (EPSG:3413/3031), WGS84 UTM/tmerc, "
            "lcc/aea conics, and longlat passthrough") from exc

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


# ===========================================================================
# Transverse Mercator (UTM) — Krüger series to order n^6 (Karney 2011,
# "Transverse Mercator with an accuracy of a few nanometers"; same
# series GeographicLib/proj use). Closes the in-container gap for the
# reference's arbitrary-SRS surface (geo_index.py:102-112 accepts any
# srs via GDAL): EPSG:326xx/327xx UTM zones and generic +proj=tmerc /
# +proj=utm strings now execute without pyproj, alongside the polar-
# stereographic pair. Pure elementary ops (tan/sin/cos/exp/ln/sqrt/
# atan2) so the Spark plan stays inside whole-stage codegen — no
# Python in the hot path — and the DuckDB oracle mirrors term for term.
# ===========================================================================

WGS84_F = 1 / 298.257223563
_N3 = WGS84_F / (2 - WGS84_F)  # third flattening n
# rectifying radius A1 = a/(1+n) (1 + n²/4 + n⁴/64 + n⁶/256 + ...)
A1 = WGS84_A / (1 + _N3) * (1 + _N3**2 / 4 + _N3**4 / 64 + _N3**6 / 256)
# forward series α_j (Karney 2011 eq. 35 / GeographicLib TMSeries O(n⁶))
ALPHA = (
    _N3 / 2 - 2 * _N3**2 / 3 + 5 * _N3**3 / 16 + 41 * _N3**4 / 180
    - 127 * _N3**5 / 288 + 7891 * _N3**6 / 37800,
    13 * _N3**2 / 48 - 3 * _N3**3 / 5 + 557 * _N3**4 / 1440
    + 281 * _N3**5 / 630 - 1983433 * _N3**6 / 1935360,
    61 * _N3**3 / 240 - 103 * _N3**4 / 140 + 15061 * _N3**5 / 26880
    + 167603 * _N3**6 / 181440,
    49561 * _N3**4 / 161280 - 179 * _N3**5 / 168
    + 6601661 * _N3**6 / 7257600,
    34729 * _N3**5 / 80640 - 3418889 * _N3**6 / 1995840,
    212378941 * _N3**6 / 319334400,
)
# inverse series β_j (Karney 2011 eq. 36)
BETA = (
    _N3 / 2 - 2 * _N3**2 / 3 + 37 * _N3**3 / 96 - _N3**4 / 360
    - 81 * _N3**5 / 512 + 96199 * _N3**6 / 604800,
    _N3**2 / 48 + _N3**3 / 15 - 437 * _N3**4 / 1440 + 46 * _N3**5 / 105
    - 1118711 * _N3**6 / 3870720,
    17 * _N3**3 / 480 - 37 * _N3**4 / 840 - 209 * _N3**5 / 4480
    + 5569 * _N3**6 / 90720,
    4397 * _N3**4 / 161280 - 11 * _N3**5 / 504
    - 830251 * _N3**6 / 7257600,
    4583 * _N3**5 / 161280 - 108847 * _N3**6 / 3991680,
    20648693 * _N3**6 / 638668800,
)
UTM_K0 = 0.9996


def tmerc_forward(lat: np.ndarray, lon: np.ndarray, lon0_deg: float,
                  k0: float = UTM_K0, x0: float = 500000.0,
                  y0: float = 0.0) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized ellipsoidal transverse-Mercator forward transform.
    Operation order (exp/ln compositions instead of library sinh/
    atanh) is mirrored by the SQL oracle and the Column kernel term
    for term."""
    phi = np.asarray(lat, np.float64) * _D2R
    lam = (np.asarray(lon, np.float64) - lon0_deg) * _D2R
    tau = np.tan(phi)
    s = np.sin(phi)
    u = _E * 0.5 * np.log((1 + _E * s) / (1 - _E * s))
    w = np.exp(u)
    sigma = (w - 1 / w) / 2
    taup = (tau * np.sqrt(1 + sigma * sigma)
            - sigma * np.sqrt(1 + tau * tau))
    coslam, sinlam = np.cos(lam), np.sin(lam)
    xip = np.arctan2(taup, coslam)
    q = sinlam / np.sqrt(taup * taup + coslam * coslam)
    etap = np.log(q + np.sqrt(q * q + 1))
    xi, eta = xip.copy(), etap.copy()
    for j, a in enumerate(ALPHA, start=1):
        ep = np.exp(2.0 * j * etap)
        em = np.exp(-2.0 * j * etap)
        xi = xi + a * np.sin(2.0 * j * xip) * (ep + em) / 2
        eta = eta + a * np.cos(2.0 * j * xip) * (ep - em) / 2
    return x0 + k0 * A1 * eta, y0 + k0 * A1 * xi


def tmerc_inverse(x: np.ndarray, y: np.ndarray, lon0_deg: float,
                  k0: float = UTM_K0, x0: float = 500000.0,
                  y0: float = 0.0) -> tuple[np.ndarray, np.ndarray]:
    """Inverse transform via the β series + fixed-point recovery of
    tan(φ) from the conformal tangent (converges in a few rounds;
    15 are run for sub-nm residual)."""
    eta = (np.asarray(x, np.float64) - x0) / (k0 * A1)
    xi = (np.asarray(y, np.float64) - y0) / (k0 * A1)
    xip, etap = xi.copy(), eta.copy()
    for j, b in enumerate(BETA, start=1):
        xip = xip - b * np.sin(2.0 * j * xi) * np.cosh(2.0 * j * eta)
        etap = etap - b * np.cos(2.0 * j * xi) * np.sinh(2.0 * j * eta)
    sh = np.sinh(etap)
    taup = np.sin(xip) / np.sqrt(sh * sh + np.cos(xip) ** 2)
    lam = np.arctan2(sh, np.cos(xip))
    tau = taup.copy()
    for _ in range(15):
        sphi = tau / np.sqrt(1 + tau * tau)
        sigma = np.sinh(_E * np.arctanh(_E * sphi))
        tau = (taup + sigma * np.sqrt(1 + tau * tau)) / np.sqrt(
            1 + sigma * sigma)
    return (np.arctan(tau) / _D2R,
            lam / _D2R + lon0_deg)


def utm_params(epsg: int) -> tuple[float, float, float, float] | None:
    """(lon0_deg, k0, x0, y0) for a WGS84 UTM EPSG code, else None."""
    epsg = int(epsg)
    if 32601 <= epsg <= 32660:
        return (epsg - 32600) * 6.0 - 183.0, UTM_K0, 500000.0, 0.0
    if 32701 <= epsg <= 32760:
        return (epsg - 32700) * 6.0 - 183.0, UTM_K0, 500000.0, 1e7
    return None


def _parse_tmerc_proj4(s: str) -> tuple[float, float, float, float] | None:
    """(lon0, k0, x0, y0) from a +proj=utm / +proj=tmerc proj4 string
    on WGS84; None when the projection is something else or the datum
    is not WGS84 (the series constants are WGS84-specific — other
    ellipsoids stay behind the pyproj gate). A nonzero +lat_0 folds
    into y0 via the series meridian arc."""
    kv: dict[str, str] = {}
    flags: set[str] = set()
    for tok in s.split():
        tok = tok.lstrip("+")
        if "=" in tok:
            k, v = tok.split("=", 1)
            kv[k] = v
        else:
            flags.add(tok)
    if kv.get("datum", "WGS84") != "WGS84":
        return None
    if kv.get("ellps", "WGS84") != "WGS84":
        return None
    proj = kv.get("proj")
    if proj == "utm":
        try:
            zone = int(kv["zone"])
        except (KeyError, ValueError):
            return None  # malformed → fall through to the pyproj gate
        if not 1 <= zone <= 60:
            return None
        y0 = 1e7 if ("south" in flags or "south" in kv) else 0.0
        return zone * 6.0 - 183.0, UTM_K0, 500000.0, y0
    if proj == "tmerc":
        try:
            lon0 = float(kv.get("lon_0", 0.0))
            k0 = float(kv.get("k", kv.get("k_0", 1.0)))
            x0 = float(kv.get("x_0", 0.0))
            y0 = float(kv.get("y_0", 0.0))
            lat0 = float(kv.get("lat_0", 0.0))
        except ValueError:
            return None  # malformed → fall through to the pyproj gate
        if lat0:
            m0 = tmerc_forward(np.array([lat0]), np.array([lon0]),
                               lon0, k0=k0, x0=0.0, y0=0.0)[1][0]
            y0 -= m0
        return lon0, k0, x0, y0
    return None


def with_tmerc_xy(df, lon0_deg: float, k0: float = UTM_K0,
                  x0: float = 500000.0, y0: float = 0.0,
                  lat: str = "latitude", lon: str = "longitude",
                  x_as: str = "x", y_as: str = "y"):
    """Append projected (x, y) columns via CHAINED PROJECTIONS — one
    narrow select per intermediate (tau, sigma, taup, ξ', η', series),
    so the logical plan stays linear. The single-Column form
    (:func:`tmerc_xy_columns`) duplicates the τ'/ξ'/η' subtrees into
    all 12 series terms, which costs seconds of analysis+codegen on a
    ~10× bigger tree; this is the production path (measured ~6×
    faster end-to-end at sf0.1). Catalyst collapses the adjacent
    projects; runtime codegen still sees one fused stage with
    subexpression elimination, and no Python worker is involved."""
    cols = [F.col(c) for c in df.columns]
    phi = F.col(lat) * F.lit(_D2R)
    lam = (F.col(lon) - F.lit(float(lon0_deg))) * F.lit(_D2R)
    d = df.select(*cols, F.tan(phi).alias("_tau"), F.sin(phi).alias("_s"),
                  F.cos(lam).alias("_coslam"), F.sin(lam).alias("_sinlam"))
    u = F.lit(_E * 0.5) * F.log(
        (F.lit(1.0) + F.lit(_E) * F.col("_s"))
        / (F.lit(1.0) - F.lit(_E) * F.col("_s")))
    d = d.select(*cols, "_tau", "_coslam", "_sinlam", F.exp(u).alias("_w"))
    sigma = (F.col("_w") - F.lit(1.0) / F.col("_w")) / F.lit(2.0)
    d = d.select(*cols, "_tau", "_coslam", "_sinlam", sigma.alias("_sigma"))
    taup = (F.col("_tau") * F.sqrt(F.lit(1.0) + F.col("_sigma") ** 2)
            - F.col("_sigma") * F.sqrt(F.lit(1.0) + F.col("_tau") ** 2))
    d = d.select(*cols, "_coslam", "_sinlam", taup.alias("_taup"))
    q = F.col("_sinlam") / F.sqrt(F.col("_taup") * F.col("_taup")
                                  + F.col("_coslam") * F.col("_coslam"))
    d = d.select(*cols, F.atan2(F.col("_taup"), F.col("_coslam"))
                 .alias("_xip"), q.alias("_q"))
    etap = F.log(F.col("_q") + F.sqrt(F.col("_q") * F.col("_q")
                                      + F.lit(1.0)))
    d = d.select(*cols, "_xip", etap.alias("_etap"))
    xi: Column = F.col("_xip")
    eta: Column = F.col("_etap")
    for j, a in enumerate(ALPHA, start=1):
        ep = F.exp(F.lit(2.0 * j) * F.col("_etap"))
        em = F.exp(F.lit(-2.0 * j) * F.col("_etap"))
        xi = xi + F.lit(a) * F.sin(F.lit(2.0 * j) * F.col("_xip")) \
            * (ep + em) / F.lit(2.0)
        eta = eta + F.lit(a) * F.cos(F.lit(2.0 * j) * F.col("_xip")) \
            * (ep - em) / F.lit(2.0)
    d = d.select(*cols, xi.alias("_xi"), eta.alias("_eta"))
    return d.select(
        *cols,
        (F.lit(float(x0)) + F.lit(float(k0) * A1) * F.col("_eta"))
        .alias(x_as),
        (F.lit(float(y0)) + F.lit(float(k0) * A1) * F.col("_xi"))
        .alias(y_as))


def tmerc_xy_columns(lat: str, lon: str, lon0_deg: float,
                     k0: float = UTM_K0, x0: float = 500000.0,
                     y0: float = 0.0) -> tuple[Column, Column]:
    """(x, y) Columns from pure built-in expressions — the whole
    transform stays JVM-side inside whole-stage codegen (no Python
    worker), mirroring :func:`tmerc_forward` term for term.

    Column-shaped for API parity with the reference's ``get_xy``; the
    series terms replicate the τ'/ξ'/η' subtrees, so for hot paths
    prefer :func:`with_tmerc_xy`, whose chained projections keep the
    plan linear (same math, same results, ~6× cheaper to plan+run)."""
    phi = F.col(lat) * F.lit(_D2R)
    lam = (F.col(lon) - F.lit(float(lon0_deg))) * F.lit(_D2R)
    tau = F.tan(phi)
    s = F.sin(phi)
    u = F.lit(_E * 0.5) * F.log((F.lit(1.0) + F.lit(_E) * s)
                                / (F.lit(1.0) - F.lit(_E) * s))
    w = F.exp(u)
    sigma = (w - F.lit(1.0) / w) / F.lit(2.0)
    taup = (tau * F.sqrt(F.lit(1.0) + sigma * sigma)
            - sigma * F.sqrt(F.lit(1.0) + tau * tau))
    coslam, sinlam = F.cos(lam), F.sin(lam)
    xip = F.atan2(taup, coslam)
    q = sinlam / F.sqrt(taup * taup + coslam * coslam)
    etap = F.log(q + F.sqrt(q * q + F.lit(1.0)))
    xi, eta = xip, etap
    for j, a in enumerate(ALPHA, start=1):
        ep = F.exp(F.lit(2.0 * j) * etap)
        em = F.exp(F.lit(-2.0 * j) * etap)
        xi = xi + F.lit(a) * F.sin(F.lit(2.0 * j) * xip) \
            * (ep + em) / F.lit(2.0)
        eta = eta + F.lit(a) * F.cos(F.lit(2.0 * j) * xip) \
            * (ep - em) / F.lit(2.0)
    return (F.lit(float(x0)) + F.lit(float(k0) * A1) * eta,
            F.lit(float(y0)) + F.lit(float(k0) * A1) * xi)


def tmerc_oracle_sql(inner_sql: str, lon0_deg: float,
                     k0: float = UTM_K0, x0: float = 500000.0,
                     y0: float = 0.0, lat: str = "lat", lon: str = "lon",
                     carry: tuple[str, ...] = ("row_id", "lat", "lon"),
                     x_as: str = "x", y_as: str = "y") -> str:
    """Layered-subquery SQL computing the same transform — valid in
    BOTH DuckDB (oracle) and Spark SQL, with constants inlined as
    exact double literals, so the two engines run textually identical
    math. Layering (one named step per intermediate) keeps the text
    linear instead of exponentially substituted."""
    c = ", ".join(carry)
    e = repr(_E)
    layers = [
        f"SELECT {c}, {lat} * {_D2R!r} AS phi,"
        f" ({lon} - {float(lon0_deg)!r}) * {_D2R!r} AS lam"
        f" FROM ({inner_sql}) t0",
        f"SELECT {c}, tan(phi) AS tau, sin(phi) AS s,"
        f" cos(lam) AS coslam, sin(lam) AS sinlam FROM (__PREV__) t1",
        f"SELECT {c}, tau, coslam, sinlam,"
        f" exp({_E * 0.5!r} * ln((1 + {e} * s) / (1 - {e} * s))) AS w"
        f" FROM (__PREV__) t2",
        f"SELECT {c}, tau, coslam, sinlam, (w - 1 / w) / 2 AS sigma"
        f" FROM (__PREV__) t3",
        f"SELECT {c}, coslam, sinlam,"
        f" tau * sqrt(1 + sigma * sigma) - sigma * sqrt(1 + tau * tau)"
        f" AS taup FROM (__PREV__) t4",
        f"SELECT {c}, atan2(taup, coslam) AS xip,"
        f" sinlam / sqrt(taup * taup + coslam * coslam) AS q"
        f" FROM (__PREV__) t5",
        f"SELECT {c}, xip, ln(q + sqrt(q * q + 1)) AS etap"
        f" FROM (__PREV__) t6",
    ]
    xi = "xip"
    eta = "etap"
    for j, a in enumerate(ALPHA, start=1):
        xi += (f" + {a!r} * sin({2.0 * j!r} * xip)"
               f" * (exp({2.0 * j!r} * etap) + exp({-2.0 * j!r} * etap))"
               " / 2")
        eta += (f" + {a!r} * cos({2.0 * j!r} * xip)"
                f" * (exp({2.0 * j!r} * etap) - exp({-2.0 * j!r} * etap))"
                " / 2")
    layers.append(f"SELECT {c}, {xi} AS xi, {eta} AS eta"
                  f" FROM (__PREV__) t7")
    layers.append(
        f"SELECT {c}, {float(x0)!r} + {float(k0) * A1!r} * eta AS {x_as},"
        f" {float(y0)!r} + {float(k0) * A1!r} * xi AS {y_as}"
        f" FROM (__PREV__) t8")
    sql = layers[0]
    for lay in layers[1:]:
        sql = lay.replace("__PREV__", sql)
    return sql


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


# ===========================================================================
# Conic projections — Lambert conformal conic (2SP) and Albers equal-
# area (Snyder, "Map Projections: A Working Manual", USGS PP 1395,
# §15 eq. 15-1..15-10 and §14 eq. 14-1..14-11). Extends the
# in-container arbitrary-SRS surface (reference geo_index.py:102-112)
# past polar stereo + UTM to the continental mapping staples
# (+proj=lcc / +proj=aea) without pyproj. The per-row math is emitted
# ONCE as SQL text valid in BOTH Spark SQL and DuckDB (constants
# inlined as exact double literals), so the engine Column (F.expr)
# and the oracle run textually identical arithmetic; cone constants
# are Python-scalar precomputation. Parametrized by (a, e2) so
# non-WGS84 ellipsoids (the published Snyder test vectors are
# Clarke 1866) work too.
# ===========================================================================


def _conic_m(phi: float, e2: float) -> float:
    return math.cos(phi) / math.sqrt(1 - e2 * math.sin(phi) ** 2)


def _conic_t(phi: float, e: float) -> float:
    return (math.tan(math.pi / 4 - phi / 2)
            / ((1 - e * math.sin(phi)) / (1 + e * math.sin(phi)))
            ** (e / 2))


def _conic_q(phi: float, e: float, e2: float) -> float:
    s = math.sin(phi)
    return (1 - e2) * (s / (1 - e2 * s * s)
                       - (1 / (2 * e)) * math.log((1 - e * s)
                                                  / (1 + e * s)))


def lcc_constants(lat1: float, lat2: float, lat0: float,
                  a: float = WGS84_A, e2: float = WGS84_E2
                  ) -> tuple[float, float, float]:
    """(n, a·F, ρ0) for the 2SP Lambert conformal conic (Snyder
    15-3/15-2/15-7a); lat1 == lat2 degenerates to the tangent cone
    n = sin(lat1)."""
    e = math.sqrt(e2)
    p1, p2, p0 = (math.radians(v) for v in (lat1, lat2, lat0))
    m1, t1 = _conic_m(p1, e2), _conic_t(p1, e)
    if lat1 == lat2:
        n = math.sin(p1)
    else:
        n = ((math.log(m1) - math.log(_conic_m(p2, e2)))
             / (math.log(t1) - math.log(_conic_t(p2, e))))
    aF = a * m1 / (n * t1 ** n)
    rho0 = aF * _conic_t(p0, e) ** n
    return n, aF, rho0


def aea_constants(lat1: float, lat2: float, lat0: float,
                  a: float = WGS84_A, e2: float = WGS84_E2
                  ) -> tuple[float, float, float]:
    """(n, C, ρ0) for the 2SP Albers equal-area conic (Snyder
    14-14/14-13/14-12a)."""
    e = math.sqrt(e2)
    p1, p2, p0 = (math.radians(v) for v in (lat1, lat2, lat0))
    m1, q1 = _conic_m(p1, e2), _conic_q(p1, e, e2)
    if lat1 == lat2:
        n = math.sin(p1)
    else:
        n = ((m1 ** 2 - _conic_m(p2, e2) ** 2)
             / (_conic_q(p2, e, e2) - q1))
    C = m1 ** 2 + n * q1
    rho0 = a * math.sqrt(C - n * _conic_q(p0, e, e2)) / n
    return n, C, rho0


def conic_sql_exprs(kind: str, lat1: float, lat2: float, lat0: float,
                    lon0: float, x0: float = 0.0, y0: float = 0.0,
                    a: float = WGS84_A, e2: float = WGS84_E2,
                    lat: str = "lat", lon: str = "lon"
                    ) -> tuple[str, str]:
    """(x, y) SQL expression text for ``kind`` in {"lcc", "aea"} —
    valid verbatim in Spark SQL AND DuckDB (tan/sin/cos/power/ln/sqrt
    only, constants inlined), so `F.expr(x)` and the oracle share one
    arithmetic DAG."""
    e = math.sqrt(e2)
    phi = f"({lat} * {_D2R!r})"
    if kind == "lcc":
        n, aF, rho0 = lcc_constants(lat1, lat2, lat0, a, e2)
        t = (f"(tan({math.pi / 4!r} - {phi} / 2)"
             f" / power((1 - {e!r} * sin({phi}))"
             f" / (1 + {e!r} * sin({phi})), {e / 2!r}))")
        rho = f"({aF!r} * power({t}, {n!r}))"
    elif kind == "aea":
        n, C, rho0 = aea_constants(lat1, lat2, lat0, a, e2)
        q = (f"({1 - e2!r} * (sin({phi}) / (1 - {e2!r} * sin({phi})"
             f" * sin({phi})) - {1 / (2 * e)!r}"
             f" * ln((1 - {e!r} * sin({phi}))"
             f" / (1 + {e!r} * sin({phi})))))")
        rho = f"({a!r} * sqrt({C!r} - {n!r} * {q}) / {n!r})"
    else:
        raise ValueError(f"unknown conic kind {kind!r}")
    th = f"({n!r} * (({lon} - {float(lon0)!r}) * {_D2R!r}))"
    return (f"({float(x0)!r} + {rho} * sin({th}))",
            f"({float(y0)!r} + {rho0!r} - {rho} * cos({th}))")


def conic_xy_columns(kind: str, lat1: float, lat2: float, lat0: float,
                     lon0: float, x0: float = 0.0, y0: float = 0.0,
                     a: float = WGS84_A, e2: float = WGS84_E2,
                     lat: str = "lat", lon: str = "lon"
                     ) -> tuple[Column, Column]:
    """Pure built-in (x, y) Columns — whole-stage codegen, no Python
    worker — from the shared SQL text."""
    xs, ys = conic_sql_exprs(kind, lat1, lat2, lat0, lon0, x0, y0,
                             a, e2, lat=lat, lon=lon)
    return F.expr(xs), F.expr(ys)


def lcc_forward(lat: np.ndarray, lon: np.ndarray, lat1: float,
                lat2: float, lat0: float, lon0: float,
                x0: float = 0.0, y0: float = 0.0,
                a: float = WGS84_A, e2: float = WGS84_E2
                ) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized NumPy LCC forward (same formula chain as the SQL)."""
    e = math.sqrt(e2)
    n, aF, rho0 = lcc_constants(lat1, lat2, lat0, a, e2)
    phi = np.asarray(lat, np.float64) * _D2R
    s = np.sin(phi)
    t = (np.tan(math.pi / 4 - phi / 2)
         / ((1 - e * s) / (1 + e * s)) ** (e / 2))
    rho = aF * t ** n
    th = n * ((np.asarray(lon, np.float64) - lon0) * _D2R)
    return x0 + rho * np.sin(th), y0 + rho0 - rho * np.cos(th)


def lcc_inverse(x: np.ndarray, y: np.ndarray, lat1: float,
                lat2: float, lat0: float, lon0: float,
                x0: float = 0.0, y0: float = 0.0,
                a: float = WGS84_A, e2: float = WGS84_E2,
                iters: int = 12) -> tuple[np.ndarray, np.ndarray]:
    """NumPy LCC inverse (Snyder 15-11/7-9 fixed point)."""
    e = math.sqrt(e2)
    n, aF, rho0 = lcc_constants(lat1, lat2, lat0, a, e2)
    dx = np.asarray(x, np.float64) - x0
    dy = rho0 - (np.asarray(y, np.float64) - y0)
    rho = np.copysign(np.hypot(dx, dy), n)
    th = np.arctan2(np.sign(n) * dx, np.sign(n) * dy)
    t = (rho / aF) ** (1.0 / n)
    phi = math.pi / 2 - 2 * np.arctan(t)
    for _ in range(iters):
        es = e * np.sin(phi)
        phi = (math.pi / 2
               - 2 * np.arctan(t * ((1 - es) / (1 + es)) ** (e / 2)))
    return phi / _D2R, (th / n) / _D2R + lon0


def aea_forward(lat: np.ndarray, lon: np.ndarray, lat1: float,
                lat2: float, lat0: float, lon0: float,
                x0: float = 0.0, y0: float = 0.0,
                a: float = WGS84_A, e2: float = WGS84_E2
                ) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized NumPy Albers equal-area forward."""
    e = math.sqrt(e2)
    n, C, rho0 = aea_constants(lat1, lat2, lat0, a, e2)
    phi = np.asarray(lat, np.float64) * _D2R
    s = np.sin(phi)
    q = (1 - e2) * (s / (1 - e2 * s * s)
                    - (1 / (2 * e)) * np.log((1 - e * s) / (1 + e * s)))
    rho = a * np.sqrt(C - n * q) / n
    th = n * ((np.asarray(lon, np.float64) - lon0) * _D2R)
    return x0 + rho * np.sin(th), y0 + rho0 - rho * np.cos(th)


def aea_inverse(x: np.ndarray, y: np.ndarray, lat1: float,
                lat2: float, lat0: float, lon0: float,
                x0: float = 0.0, y0: float = 0.0,
                a: float = WGS84_A, e2: float = WGS84_E2,
                iters: int = 15) -> tuple[np.ndarray, np.ndarray]:
    """NumPy Albers inverse (Snyder 14-19 then 3-16 iteration)."""
    e = math.sqrt(e2)
    n, C, rho0 = aea_constants(lat1, lat2, lat0, a, e2)
    dx = np.asarray(x, np.float64) - x0
    dy = rho0 - (np.asarray(y, np.float64) - y0)
    rho = np.hypot(dx, dy)
    th = np.arctan2(np.sign(n) * dx, np.sign(n) * dy)
    q = (C - (rho * n / a) ** 2) / n
    phi = np.arcsin(np.clip(q / 2, -1.0, 1.0))
    for _ in range(iters):
        s = np.sin(phi)
        es2 = 1 - e2 * s * s
        phi = phi + (es2 ** 2 / (2 * np.cos(phi))) * (
            q / (1 - e2) - s / es2
            + (1 / (2 * e)) * np.log((1 - e * s) / (1 + e * s)))
    return phi / _D2R, (th / n) / _D2R + lon0


def _parse_conic_proj4(s: str) -> tuple[str, dict] | None:
    """(kind, params) from a +proj=lcc / +proj=aea WGS84 proj4 string,
    else None (other datums stay behind the pyproj gate)."""
    kv: dict[str, str] = {}
    for tok in s.split():
        tok = tok.lstrip("+")
        if "=" in tok:
            k, v = tok.split("=", 1)
            kv[k] = v
    if kv.get("datum", "WGS84") != "WGS84":
        return None
    if kv.get("ellps", "WGS84") != "WGS84":
        return None
    proj = kv.get("proj")
    if proj not in ("lcc", "aea"):
        return None
    # result-changing keys this closed form does not honor (scale
    # factor, sphere radius, explicit ellipsoid axes, datum shifts,
    # non-meter units) defer to the pyproj gate rather than silently
    # projecting wrong coordinates — the _parse_tmerc_proj4 lesson
    try:
        if float(kv.get("k", kv.get("k_0", 1.0))) != 1.0:
            return None
    except ValueError:
        return None
    if any(k in kv for k in ("R", "a", "b", "rf", "towgs84", "nadgrids")):
        return None
    if kv.get("units", "m") != "m":
        return None
    try:
        lat1 = float(kv["lat_1"])
        lat2 = float(kv.get("lat_2", kv["lat_1"]))
        params = dict(lat1=lat1, lat2=lat2,
                      lat0=float(kv.get("lat_0", 0.0)),
                      lon0=float(kv.get("lon_0", 0.0)),
                      x0=float(kv.get("x_0", 0.0)),
                      y0=float(kv.get("y_0", 0.0)))
    except (KeyError, ValueError):
        return None  # malformed → fall through to the pyproj gate
    return proj, params
