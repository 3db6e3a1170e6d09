"""S6 surface-mask scan: read the global surf_type tile mosaic,
extract the land bit, subsample, hemisphere-subset, and reproject to
polar stereographic — the full `landmask.read_surftype_h5` semantics
(reference read_surfmask.py:146-242), through the stdlib HDF5 codec.

Output shapes:

- `load_surfmask` → (x, y, mask) NumPy arrays, the reference's
  landmask object fields (driver-side: the mosaic is ancillary data —
  the reference holds it in memory too — destined for a broadcast
  grid, SURVEY §1.1 #4);
- `surfmask_points` → a Spark DataFrame of (x, y, land) rows for
  engine-side joins/mask tests.

Faithful reference semantics, in order (read_surfmask.py:165-238):
tile assembly from the TILE_INDEX attrs (LON0/LON1/LAT0/LAT1 +
scales + per-tile names, row-major lat×lon), ×3 subsampling
("no need for 5 m resolution"), land bit = ibits(surf_type, 0, 1),
hemisphere subset at |lat| ≥ 60, then forward polar stereo
(EPSG:3413 north / 3031 south) via the engine's own CRS kernel.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession

from pointdatabase_spark.functions.crs import polar_stereo_forward
from pointdatabase_spark.sources import hdf5

SUBSET_SIZE = 3       # read_surfmask.py:198
LAT_LIMIT = 60.0      # read_surfmask.py:221 (latlimit=-60.0, |lat|)


def load_surfmask(path: str, hemisphere: int = -1
                  ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(x, y, mask) polar-stereographic arrays for one hemisphere."""
    root = hdf5.read_h5(path)
    gi = root["TILE_INDEX"]
    a = gi.attrs
    lon0, lon1 = np.asarray(a["LON0"], float), np.asarray(a["LON1"], float)
    lat0, lat1 = np.asarray(a["LAT0"], float), np.asarray(a["LAT1"], float)
    lon_scale = np.asarray(a["LON_SCALE"], float)
    lat_scale = np.asarray(a["LAT_SCALE"], float)
    names = [n if isinstance(n, str) else str(n) for n in a["NAME"]]
    nlon = np.asarray(a["N_LON"], int)
    nlat = np.asarray(a["N_LAT"], int)

    n_tiles = len(names)
    # tile grid inferred from global extent (reference hardcodes 18×9)
    lon_tiles = int(round((lon1.max() - lon0.min())
                          / (nlon[0] * lon_scale[0])))
    lat_tiles = n_tiles // lon_tiles
    xsz = int(np.ceil((lon1.max() - lon0.min()) / lon_scale[0]))
    ysz = int(np.ceil((lat1.max() - lat0.min()) / lat_scale[0]))

    # NaN init: grid cells not covered by any tile (n_tiles <
    # lat_tiles*lon_tiles) must fail BOTH hemisphere thresholds below —
    # +inf would satisfy `lats >= LAT_LIMIT` and feed phantom rows with
    # non-finite coordinates into polar_stereo_forward.
    surf = np.zeros((ysz, xsz), dtype=np.int64)
    lons = np.full((ysz, xsz), np.nan)
    lats = np.full((ysz, xsz), np.nan)
    k = 0
    for lat_tile in range(lat_tiles):
        for lon_tile in range(lon_tiles):
            if k >= n_tiles:
                break
            r0, c0 = lat_tile * nlat[0], lon_tile * nlon[0]
            rows, cols = slice(r0, r0 + nlat[k]), slice(c0, c0 + nlon[k])
            lons[rows, cols] = np.linspace(
                lon0[k], lon1[k] - lon_scale[k], nlon[k])[None, :]
            lats[rows, cols] = np.linspace(
                lat0[k], lat1[k] - lat_scale[k], nlat[k])[:, None]
            surf[rows, cols] = np.asarray(root[names[k]][...], np.int64)
            k += 1

    s = SUBSET_SIZE
    lons, lats, surf = lons[::s, ::s], lats[::s, ::s], surf[::s, ::s]
    land = (surf & 1) == 1  # ibits(surf_type, 0, 1), functions/bits.py
    xw = lons.shape[1]
    if hemisphere == -1:
        keep = lats <= -LAT_LIMIT
    else:
        keep = lats >= LAT_LIMIT
    lons = lons[keep].reshape(-1, xw)
    lats = lats[keep].reshape(-1, xw)
    land = land[keep].reshape(-1, xw)
    x, y = polar_stereo_forward(lats.ravel(), lons.ravel(), hemisphere)
    return (x.reshape(lats.shape), y.reshape(lats.shape), land)


def surfmask_points(spark: SparkSession, path: str,
                    hemisphere: int = -1) -> DataFrame:
    """The mask as an engine point table (x, y, land)."""
    import pandas as pd
    x, y, z = load_surfmask(path, hemisphere)
    return spark.createDataFrame(pd.DataFrame(
        {"x": x.ravel(), "y": y.ravel(), "land": z.ravel()}))


def write_synthetic_mosaic(path: str, lon_tiles: int = 6,
                           lat_tiles: int = 3, nlon: int = 12,
                           nlat: int = 10, seed: int = 11,
                           max_tiles: int | None = None) -> None:
    """Deterministic mosaic fixture in the reference's file shape
    (TILE_INDEX attrs + one dataset per tile) for tests.
    ``max_tiles`` truncates the tile list (incomplete mosaic: grid
    cells with no covering tile)."""
    rng = np.random.default_rng(seed)
    dlon = 360.0 / (lon_tiles * nlon)
    dlat = 180.0 / (lat_tiles * nlat)
    names, lon0, lon1, lat0, lat1 = [], [], [], [], []
    tree: dict = {}
    for lt in range(lat_tiles):
        for ln in range(lon_tiles):
            k = lt * lon_tiles + ln
            if max_tiles is not None and k >= max_tiles:
                break
            name = f"TILE_{k:03d}"
            names.append(name)
            lon0.append(-180.0 + ln * nlon * dlon)
            lon1.append(-180.0 + (ln + 1) * nlon * dlon)
            lat0.append(-90.0 + lt * nlat * dlat)
            lat1.append(-90.0 + (lt + 1) * nlat * dlat)
            tree[name] = rng.integers(0, 8, (nlat, nlon)).astype(np.int64)
    n = len(names)
    tree["TILE_INDEX"] = {"__attrs__": {
        "LON0": np.array(lon0), "LON1": np.array(lon1),
        "LAT0": np.array(lat0), "LAT1": np.array(lat1),
        "LON_SCALE": np.full(n, dlon), "LAT_SCALE": np.full(n, dlat),
        "NAME": np.array(names), "N_LON": np.full(n, nlon, np.int64),
        "N_LAT": np.full(n, nlat, np.int64)}}
    hdf5.write_h5(path, tree)
