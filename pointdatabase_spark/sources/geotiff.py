"""S14 GeoTIFF sink (+ matching minimal scan): the Spark re-expression
of reference ``mapData.to_geotif`` (mapData.py:125-158).

The reference hands a gridded ``mapData`` object to GDAL's GTiff
driver.  This container ships neither GDAL nor rasterio, and a raster
*file* is inherently a single driver-side artifact anyway — so the
engine splits the operator the Spark-first way:

- **grid assembly is distributed**: ``grid_from_points`` reduces an
  arbitrarily large point table to one value per raster cell with a
  single map-side-combined groupBy; only the finished (ny, nx) cell
  grid — bounded by the output image size, never by the input row
  count — is collected to the driver.
- **encoding is pure stdlib**: ``write_geotiff`` emits a
  little-endian, single-strip, uncompressed float32/float64 GeoTIFF
  (SampleFormat=IEEE-float) with the standard georeferencing tags
  (ModelPixelScale 33550, ModelTiepoint 33922, GeoKeyDirectory 34735,
  GDAL_NODATA 42113).  The geotransform matches the reference exactly:
  origin (x_min - dx/2, y_max + dy/2), row stride -dy, band rows
  written top-first (mapData.py:139,153 — ``z[::-1, :]``).
- ``read_geotiff`` parses the same baseline-TIFF subset back into a
  :class:`~pointdatabase_spark.operators.raster.Grid`, which also
  un-stubs the S4/S5 GeoTIFF scan (read_DEM.py:14-69) for any
  uncompressed float GeoTIFF; compressed/tiled files still raise with
  a pointer at rasterio.

LZW compression (the reference's ``compress=LZW``) is intentionally
dropped: compression is a storage-size knob, not a semantic one, and
baseline TIFF keeps both ends stdlib-pure and seekable.
"""

from __future__ import annotations

import struct

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pointdatabase_spark.operators.raster import Grid

# TIFF tag ids
_IMAGE_WIDTH = 256
_IMAGE_LENGTH = 257
_BITS_PER_SAMPLE = 258
_COMPRESSION = 259
_PHOTOMETRIC = 262
_STRIP_OFFSETS = 273
_SAMPLES_PER_PIXEL = 277
_ROWS_PER_STRIP = 278
_STRIP_BYTE_COUNTS = 279
_PLANAR_CONFIG = 284
_SAMPLE_FORMAT = 339
_MODEL_PIXEL_SCALE = 33550
_MODEL_TIEPOINT = 33922
_GEO_KEY_DIRECTORY = 34735
_GDAL_NODATA = 42113

_T_ASCII, _T_SHORT, _T_LONG, _T_DOUBLE = 2, 3, 4, 12
_TYPE_SIZE = {_T_ASCII: 1, _T_SHORT: 2, _T_LONG: 4, _T_DOUBLE: 8}
_TYPE_FMT = {_T_SHORT: "H", _T_LONG: "I", _T_DOUBLE: "d"}


def grid_from_points(df: DataFrame, dx: float, dy: float,
                     x: str = "x", y: str = "y", z: str = "z",
                     agg: str = "avg",
                     nodata: float = float("nan")) -> Grid:
    """Distributed point→grid reduction feeding the sink.

    Cells are dx×dy squares centered on grid nodes (the engine's
    round-binning convention, functions/binning.py); ``agg`` is any
    SQL aggregate over the cell's z values (avg/min/max/count).  One
    shuffle (map-side combined groupBy on the cell index); the collect
    is ny*nx cells — the size of the image being written, which is the
    irreducible driver payload of producing a single raster file.
    Empty cells inside the bounding box are filled with ``nodata``.
    """
    cells = (df
             .where(F.col(x).isNotNull() & F.col(y).isNotNull()
                    & F.col(z).isNotNull())
             .groupBy(
                 F.round(F.col(x) / F.lit(float(dx))).cast("long").alias("_i"),
                 F.round(F.col(y) / F.lit(float(dy))).cast("long").alias("_j"))
             .agg(F.expr(f"{agg}({z})").cast("double").alias("_z"))
             .collect())
    if not cells:
        raise ValueError("grid_from_points: no finite input points")
    ii = np.array([r["_i"] for r in cells], dtype=np.int64)
    jj = np.array([r["_j"] for r in cells], dtype=np.int64)
    zz = np.array([r["_z"] for r in cells], dtype=np.float64)
    i0, j0 = ii.min(), jj.min()
    nx = int(ii.max() - i0 + 1)
    ny = int(jj.max() - j0 + 1)
    grid_z = np.full((ny, nx), nodata, dtype=np.float64)
    grid_z[jj - j0, ii - i0] = zz
    return Grid(x0=float(i0 * dx), y0=float(j0 * dy),
                dx=float(dx), dy=float(dy), z=grid_z)


def _pack_entries(grid: Grid, epsg: int, dtype: np.dtype,
                  nodata: float | None):
    """Build (tag, type, values) IFD entries + the pixel payload."""
    z = np.asarray(grid.z)
    if z.ndim == 2:
        z = z[:, :, None]
    ny, nx, n_bands = z.shape
    bits = dtype.itemsize * 8
    # reference writes rows top-first: flip the y-ascending array
    payload = np.ascontiguousarray(
        z[::-1, :, :].astype(dtype)).tobytes()
    entries = [
        (_IMAGE_WIDTH, _T_LONG, [nx]),
        (_IMAGE_LENGTH, _T_LONG, [ny]),
        (_BITS_PER_SAMPLE, _T_SHORT, [bits] * n_bands),
        (_COMPRESSION, _T_SHORT, [1]),           # uncompressed
        (_PHOTOMETRIC, _T_SHORT, [1]),           # min-is-black
        (_STRIP_OFFSETS, _T_LONG, [0]),          # patched later
        (_SAMPLES_PER_PIXEL, _T_SHORT, [n_bands]),
        (_ROWS_PER_STRIP, _T_LONG, [ny]),        # single strip
        (_STRIP_BYTE_COUNTS, _T_LONG, [len(payload)]),
        (_PLANAR_CONFIG, _T_SHORT, [1]),         # chunky (interleaved)
        (_SAMPLE_FORMAT, _T_SHORT, [3] * n_bands),  # IEEE float
        (_MODEL_PIXEL_SCALE, _T_DOUBLE,
         [abs(grid.dx), abs(grid.dy), 0.0]),
        # raster (0,0) = top-left outer corner = reference geotransform
        # origin (x_min - dx/2, y_max + dy/2), mapData.py:139
        (_MODEL_TIEPOINT, _T_DOUBLE,
         [0.0, 0.0, 0.0,
          grid.x0 - abs(grid.dx) / 2.0,
          grid.y0 + (ny - 1) * abs(grid.dy) + abs(grid.dy) / 2.0,
          0.0]),
        # GeoKey directory: v1.1.0; RasterType=1 (PixelIsArea).
        # Geographic CRS codes (EPSG 4000-4999, e.g. 4326) get
        # ModelType=2 + GeographicTypeGeoKey (2048); anything else is
        # tagged projected via ProjectedCSTypeGeoKey (3072) — writing
        # 4326 under 3072 would be a mistagged file.
        (_GEO_KEY_DIRECTORY, _T_SHORT,
         [1, 1, 0, 3,
          1024, 0, 1, 2 if 4000 <= int(epsg) < 5000 else 1,
          1025, 0, 1, 1,
          2048 if 4000 <= int(epsg) < 5000 else 3072, 0, 1, int(epsg)]),
    ]
    if nodata is not None:
        text = f"{nodata!r}".encode("ascii") + b"\x00"
        entries.append((_GDAL_NODATA, _T_ASCII, [text]))
    return entries, payload


def write_geotiff(grid: Grid, path: str, epsg: int = 3413,
                  dtype: str = "float32",
                  nodata: float | None = None) -> None:
    """S14 sink: encode ``grid`` as an uncompressed baseline GeoTIFF
    (mapData.py:125-158; float32 to match GDT_Float32, float64
    available for lossless round-trips).  A (ny, nx, n_bands) z array
    writes a multiband file, matching mapData.py:152-156."""
    dt = np.dtype(dtype).newbyteorder("<")
    if dt.kind != "f":
        raise ValueError("write_geotiff supports float dtypes only")
    entries, payload = _pack_entries(grid, epsg, dt, nodata)

    # layout: header(8) | IFD | out-of-line values | pixel data
    ifd_size = 2 + 12 * len(entries) + 4
    extra_off = 8 + ifd_size
    extra = bytearray()
    fields = []  # (tag, type, count, inline-or-offset 4 bytes)
    for tag, typ, vals in entries:
        if typ == _T_ASCII:
            raw = vals[0]
            count = len(raw)
        else:
            raw = b"".join(struct.pack("<" + _TYPE_FMT[typ], v)
                           for v in vals)
            count = len(vals)
        if tag == _STRIP_OFFSETS:
            fields.append((tag, typ, count, None))  # patched below
            continue
        if len(raw) <= 4:
            fields.append((tag, typ, count, raw.ljust(4, b"\x00")))
        else:
            fields.append((tag, typ, count,
                           struct.pack("<I", extra_off + len(extra))))
            extra.extend(raw)
    data_off = extra_off + len(extra)
    out = bytearray()
    out += struct.pack("<2sHI", b"II", 42, 8)
    out += struct.pack("<H", len(fields))
    for tag, typ, count, val4 in sorted(fields):
        if val4 is None:  # strip offset → start of pixel data
            val4 = struct.pack("<I", data_off)
        out += struct.pack("<HHI", tag, typ, count) + val4
    out += struct.pack("<I", 0)  # no next IFD
    out += extra
    out += payload
    with open(path, "wb") as fh:
        fh.write(bytes(out))


def _read_ifd(buf: bytes, order: str):
    off = struct.unpack(order + "I", buf[4:8])[0]
    n = struct.unpack(order + "H", buf[off:off + 2])[0]
    tags = {}
    for k in range(n):
        e = off + 2 + 12 * k
        tag, typ, count = struct.unpack(order + "HHI", buf[e:e + 8])
        if typ not in _TYPE_SIZE:
            # BYTE/RATIONAL/UNDEFINED etc. appear in real GDAL files
            # (e.g. XML metadata); none carry layout we need — skip.
            continue
        size = _TYPE_SIZE[typ] * count
        if size <= 4:
            raw = buf[e + 8:e + 8 + size]
        else:
            voff = struct.unpack(order + "I", buf[e + 8:e + 12])[0]
            raw = buf[voff:voff + size]
        if typ == _T_ASCII:
            tags[tag] = raw.rstrip(b"\x00").decode("ascii")
        else:
            tags[tag] = list(struct.unpack(
                order + _TYPE_FMT[typ] * count, raw))
    return tags


def read_geotiff(path: str, band: int = 1) -> Grid:
    """Minimal S4/S5 GeoTIFF scan for the subset ``write_geotiff``
    emits (uncompressed, single-strip, chunky float samples) — any
    GDAL-produced uncompressed float GeoTIFF with that layout also
    reads.  Compressed or tiled files raise NotImplementedError with
    a pointer at rasterio (the container does not ship it)."""
    with open(path, "rb") as fh:
        buf = fh.read()
    if buf[:2] == b"II":
        order = "<"
    elif buf[:2] == b"MM":
        order = ">"
    else:
        raise ValueError("not a TIFF file")
    tags = _read_ifd(buf, order)
    if tags.get(_COMPRESSION, [1])[0] != 1:
        raise NotImplementedError(
            "compressed GeoTIFF needs rasterio (not shipped in this "
            "container); write_geotiff emits uncompressed files")
    if 322 in tags:  # TileWidth
        raise NotImplementedError("tiled GeoTIFF needs rasterio")
    if tags.get(_SAMPLE_FORMAT, [1])[0] != 3:
        raise NotImplementedError("only IEEE-float GeoTIFF supported")
    nx = tags[_IMAGE_WIDTH][0]
    ny = tags[_IMAGE_LENGTH][0]
    n_bands = tags.get(_SAMPLES_PER_PIXEL, [1])[0]
    bits = tags[_BITS_PER_SAMPLE][0]
    if bits not in (32, 64):
        raise NotImplementedError(
            f"only 32/64-bit IEEE-float samples supported, got {bits}-bit")
    dt = np.dtype(order + ("f4" if bits == 32 else "f8"))
    offs = tags[_STRIP_OFFSETS]
    counts = tags[_STRIP_BYTE_COUNTS]
    raw = b"".join(buf[o:o + c] for o, c in zip(offs, counts))
    z = np.frombuffer(raw, dtype=dt).reshape(ny, nx, n_bands)
    if not 1 <= band <= n_bands:
        raise ValueError(f"band {band} out of range 1..{n_bands}")
    z = z[:, :, band - 1].astype(np.float64)
    # GDAL_NODATA (tag 42113): mask finite nodata to NaN, matching the
    # reference read_DEM.py:45-47 — otherwise e.g. -9999 fill poisons
    # downstream stats/interpolation as real data.  Compare at the
    # file's sample precision so a float32-rounded fill still matches.
    if _GDAL_NODATA in tags:
        try:
            nodata = float(tags[_GDAL_NODATA].strip())
        except ValueError:
            nodata = float("nan")
        if np.isfinite(nodata):
            z[z == np.float64(np.array(nodata, dtype=dt))] = np.nan
    sx, sy = tags[_MODEL_PIXEL_SCALE][0], tags[_MODEL_PIXEL_SCALE][1]
    tp = tags[_MODEL_TIEPOINT]
    x_edge, y_edge = tp[3], tp[4]  # top-left outer corner
    # back to y-ascending node-centered Grid coordinates
    return Grid(x0=float(x_edge + sx / 2.0),
                y0=float(y_edge - (ny - 1) * sy - sy / 2.0),
                dx=float(sx), dy=float(sy),
                z=np.ascontiguousarray(z[::-1, :]))
