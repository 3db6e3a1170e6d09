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
  little-endian GeoTIFF — float or integer samples, single-strip or
  tiled, uncompressed / LZW (the reference's ``compress=LZW``,
  mapData.py:135) / deflate, optional TIFF predictor 2/3 — with the
  standard georeferencing tags (ModelPixelScale 33550, ModelTiepoint
  33922, GeoKeyDirectory 34735, GDAL_NODATA 42113).  The geotransform
  matches the reference exactly: origin (x_min - dx/2, y_max + dy/2),
  row stride -dy, band rows written top-first (mapData.py:139,153 —
  ``z[::-1, :]``).
- ``read_geotiff`` parses the same family back into a
  :class:`~pointdatabase_spark.operators.raster.Grid`, which also
  un-stubs the S4/S5 GeoTIFF scan (read_DEM.py:14-69) for GDAL's
  common outputs: strips or tiles × none/LZW/deflate/JPEG ×
  predictor 1/2/3 × float/int samples × chunky or planar
  (band-separate) interleave, plus palette-color files (index band
  + ``read_palette`` colormap, GDAL's band-1 semantics).  JPEG uses
  the package's own baseline codec (sources/jpeg.py) and understands
  the shared-JPEGTables abbreviated-stream layout GDAL writes, plus
  old-style JPEG (compression 6) files carrying the whole-image
  JPEGInterchangeFormat stream (tag 513) — only the fragmented
  per-strip old-style variant (broken by design, TechNote 2) raises.

The LZW codec is a from-scratch TIFF 6.0 §13 implementation
(MSB-first variable-width codes, early change) — both directions, so
fixtures for the read path are self-generated and the sink matches
the reference's GDAL ``compress=LZW`` default.
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
_PREDICTOR = 317
_TILE_WIDTH = 322
_TILE_LENGTH = 323
_TILE_OFFSETS = 324
_TILE_BYTE_COUNTS = 325
_SAMPLE_FORMAT = 339
_MODEL_PIXEL_SCALE = 33550
_MODEL_TIEPOINT = 33922
_GEO_KEY_DIRECTORY = 34735
_GDAL_NODATA = 42113

_T_ASCII, _T_SHORT, _T_LONG, _T_UNDEF, _T_DOUBLE = 2, 3, 4, 7, 12
_TYPE_SIZE = {_T_ASCII: 1, _T_SHORT: 2, _T_LONG: 4, _T_UNDEF: 1,
              _T_DOUBLE: 8}
_TYPE_FMT = {_T_SHORT: "H", _T_LONG: "I", _T_DOUBLE: "d"}

_COLORMAP = 320
_JPEG_TABLES = 347
# old-style JPEG-in-TIFF (TIFF 6.0 §22): one complete interchange
# stream embedded at tag 513, length tag 514 — the only layout of the
# deprecated scheme that survived in the wild (early libtiff, EXIF).
_JPEG_IF = 513
_JPEG_IF_LEN = 514

# compression codes: 1 none, 5 LZW, 7 new-style JPEG, 8 Adobe deflate,
# 32946 old deflate, 6 old-style JPEG (broken by design, never written)
_COMP_NONE, _COMP_LZW, _COMP_DEFLATE, _COMP_DEFLATE_OLD = 1, 5, 8, 32946
_COMP_JPEG, _COMP_JPEG_OLD = 7, 6


# ---------------------------------------------------------------------------
# TIFF LZW codec (TIFF 6.0 §13): MSB-first variable-width codes starting
# at 9 bits, ClearCode 256 / EOI 257, and the TIFF "early change" — the
# code width bumps when the NEXT code to assign reaches 2^width - 1
# (510/1022/2046), one position earlier than GIF LZW.
# ---------------------------------------------------------------------------

def _lzw_decode(data: bytes) -> bytes:
    out = bytearray()
    table: list[bytes] = []
    width = 9
    prev: bytes | None = None
    acc = nacc = 0
    for byte in data:
        acc = (acc << 8) | byte
        nacc += 8
        while nacc >= width:
            code = (acc >> (nacc - width)) & ((1 << width) - 1)
            nacc -= width
            if code == 256:  # CLEAR
                table = [bytes([i]) for i in range(256)] + [b"", b""]
                width = 9
                prev = None
                continue
            if code == 257:  # EOI
                return bytes(out)
            if prev is None:
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):  # the KwKwK case
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise ValueError("corrupt LZW stream: code out of range")
            out += entry
            prev = entry
            # the decoder's table trails the encoder's by one entry, so
            # it must widen one entry sooner than the table-size rule
            if len(table) + 1 == (1 << width) - 1 and width < 12:
                width += 1
    return bytes(out)


def _lzw_encode(data: bytes) -> bytes:
    out = bytearray()
    acc = nacc = 0
    width = 9

    def emit(code: int) -> None:
        nonlocal acc, nacc
        acc = (acc << width) | code
        nacc += width
        while nacc >= 8:
            out.append((acc >> (nacc - 8)) & 0xFF)
            nacc -= 8

    def fresh() -> dict[bytes, int]:
        return {bytes([i]): i for i in range(256)}

    table = fresh()
    next_code = 258
    emit(256)  # leading CLEAR, as libtiff emits
    w = b""
    for i in range(len(data)):
        c = data[i:i + 1]
        wc = w + c
        if wc in table:
            w = wc
            continue
        emit(table[w])
        table[wc] = next_code
        next_code += 1
        if next_code == (1 << width) - 1 and width < 12:
            width += 1
        if next_code == 4094:  # table nearly full: reset
            emit(256)
            table = fresh()
            next_code = 258
            width = 9
        w = c
    if w:
        emit(table[w])
    emit(257)  # EOI
    if nacc:
        out.append((acc << (8 - nacc)) & 0xFF)
    return bytes(out)


# ---------------------------------------------------------------------------
# TIFF predictors (tag 317), applied per scanline within a strip/tile:
# 2 = horizontal differencing on sample values (integer data),
# 3 = floating-point: split each row's values into big-endian byte
#     planes, then bytewise horizontal differencing.
# ---------------------------------------------------------------------------

def _predictor_encode(seg: np.ndarray, predictor: int) -> np.ndarray:
    """seg: (rows, cols, bands) in its output dtype -> same-shape/bytes
    array ready for tobytes()+compression."""
    if predictor == 1:
        return seg
    rows, cols, bands = seg.shape
    if predictor == 2:
        if seg.dtype.kind == "f":
            raise ValueError("predictor 2 is for integer samples; "
                             "use predictor 3 for floats")
        u = np.dtype(f"u{seg.dtype.itemsize}").newbyteorder(
            seg.dtype.byteorder or "=")
        d = seg.view(u).copy()
        d[:, 1:, :] = d[:, 1:, :] - seg.view(u)[:, :-1, :]  # wraps mod 2^bits
        return d.view(seg.dtype)
    if predictor == 3:
        if seg.dtype.kind != "f":
            raise ValueError("predictor 3 is for float samples")
        size = seg.dtype.itemsize
        be = seg.astype(seg.dtype.newbyteorder(">"))
        b = np.frombuffer(be.tobytes(), np.uint8).reshape(
            rows, cols * bands, size)
        planes = np.ascontiguousarray(b.transpose(0, 2, 1)).reshape(rows, -1)
        # libtiff fpDiff differences the plane-major row buffer with
        # stride = samples-per-pixel; grouping each `bands` consecutive
        # bytes and differencing along the group axis is exactly that
        # (reduces to stride 1 for single-band)
        d3 = planes.reshape(rows, -1, bands)
        out = d3.copy()
        out[:, 1:, :] = d3[:, 1:, :] - d3[:, :-1, :]  # uint8 wraps
        return out.reshape(rows, -1)
    raise ValueError(f"unsupported predictor {predictor}")


def _predictor_decode(raw: bytes, predictor: int, rows: int, cols: int,
                      bands: int, dt: np.dtype) -> np.ndarray:
    """Inverse of :func:`_predictor_encode`; returns (rows, cols, bands)
    float64-convertible array in native order."""
    n = rows * cols * bands
    size = dt.itemsize
    if predictor == 1:
        return np.frombuffer(raw, dt, n).reshape(rows, cols, bands)
    if predictor == 2:
        # horizontal differencing on sample values, in the FILE's byte
        # order; cumsum undoes it with wraparound at the sample width
        file_u = np.dtype(f"u{size}").newbyteorder(dt.byteorder or "=")
        arr = np.frombuffer(raw, file_u, n).reshape(rows, cols, bands)
        acc = np.cumsum(arr.astype(np.uint64), axis=1, dtype=np.uint64)
        acc &= np.uint64((1 << (8 * size)) - 1)
        native_u = np.dtype(f"u{size}")
        return acc.astype(native_u).view(np.dtype(f"{dt.kind}{size}"))
    if predictor == 3:
        # bytewise cumsum along each scanline at stride = samples-per-
        # pixel (libtiff fpAcc), then reassemble values from big-endian
        # byte planes (plane k holds byte k of every sample in the row)
        d = np.frombuffer(raw, np.uint8, n * size).reshape(rows, -1, bands)
        planes = (np.cumsum(d.astype(np.uint64), axis=1,
                            dtype=np.uint64) & 0xFF).astype(np.uint8)
        b = planes.reshape(rows, size, cols * bands).transpose(0, 2, 1)
        be_dt = np.dtype(f"{dt.kind}{size}").newbyteorder(">")
        return np.frombuffer(np.ascontiguousarray(b).tobytes(),
                             be_dt, n).reshape(rows, cols, bands)
    raise ValueError(f"unsupported predictor {predictor}")


def _decompress_segment(raw: bytes, compression: int, expected: int) -> bytes:
    if compression == _COMP_NONE:
        return raw
    if compression == _COMP_LZW:
        out = _lzw_decode(raw)
    elif compression in (_COMP_DEFLATE, _COMP_DEFLATE_OLD):
        import zlib as _z
        out = _z.decompress(raw)
    else:
        raise NotImplementedError(
            f"TIFF compression {compression} not supported (stdlib codec "
            "reads none/LZW/deflate); install rasterio for other schemes")
    # writers may omit padding on the final strip; callers slice anyway
    return out[:expected] if expected and len(out) > expected else out


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


def _compress_segment(raw: bytes, compression: int) -> bytes:
    if compression == _COMP_NONE:
        return raw
    if compression == _COMP_LZW:
        return _lzw_encode(raw)
    if compression == _COMP_DEFLATE:
        import zlib as _z
        return _z.compress(raw, 6)
    raise ValueError(f"unsupported write compression {compression}")


def _split_jpeg_stream(full: bytes) -> tuple[bytes, bytes]:
    """Full JFIF stream -> (JPEGTables stream, abbreviated segment
    stream), the TIFF-TechNote-2 layout GDAL writes: the quantization
    and Huffman tables move to the shared tag (they are identical for
    every strip/tile of an image), each segment keeps SOI + frame +
    scan markers only."""
    tables = bytearray(b"\xff\xd8")
    rest = bytearray(b"\xff\xd8")
    pos = 2
    while pos + 1 < len(full):
        if full[pos] != 0xFF:
            raise ValueError("marker expected in JPEG stream")
        mk = full[pos + 1]
        if mk == 0xD9:                                   # EOI
            rest += full[pos:pos + 2]
            break
        ln = struct.unpack_from(">H", full, pos + 2)[0]
        if mk == 0xDA:                                   # SOS: rest is
            rest += full[pos:]                           # entropy + EOI
            break
        seg = full[pos:pos + 2 + ln]
        (tables if mk in (0xDB, 0xC4) else rest).extend(seg)
        pos += 2 + ln
    tables += b"\xff\xd9"
    return bytes(tables), bytes(rest)


def _merge_jpeg_tables(tables: bytes, seg: bytes) -> bytes:
    """Abbreviated segment stream + JPEGTables -> decodable full
    stream (tables markers spliced after the segment's SOI).  Full
    per-segment streams (writers that skip tag 347) pass through."""
    if not tables or len(tables) <= 4:
        return seg
    has_tables = False
    pos = 2
    while pos + 3 < len(seg) and seg[pos] == 0xFF:
        mk = seg[pos + 1]
        if mk in (0xDB, 0xC4):
            has_tables = True
            break
        if mk in (0xDA, 0xD9):
            break
        pos += 2 + struct.unpack_from(">H", seg, pos + 2)[0]
    if has_tables:
        return seg
    return seg[:2] + tables[2:-2] + seg[2:]


def _entry_raw(typ: int, vals) -> tuple[bytes, int]:
    if typ in (_T_ASCII, _T_UNDEF):
        return vals[0], len(vals[0])
    return (b"".join(struct.pack("<" + _TYPE_FMT[typ], v) for v in vals),
            len(vals))


def write_geotiff(grid: Grid, path: str, epsg: int = 3413,
                  dtype: str = "float32",
                  nodata: float | None = None,
                  compress: str | None = None,
                  predictor: int = 1,
                  tile: tuple[int, int] | None = None,
                  planar: bool = False,
                  palette: np.ndarray | None = None,
                  jpeg_quality: int = 95) -> None:
    """S14 sink: encode ``grid`` as a GeoTIFF (mapData.py:125-158;
    float32 matches GDT_Float32; float64 for lossless round-trips;
    integer dtypes write SampleFormat int/uint). A (ny, nx, n_bands)
    z array writes a multiband file, matching mapData.py:152-156.

    ``compress``: None | "lzw" | "deflate" | "jpeg" — "lzw" matches
    the reference's ``compress=LZW`` GDAL option (mapData.py:135),
    all pure stdlib; "jpeg" (uint8 samples, 1 or 3 bands) writes
    new-style JPEG-in-TIFF with a shared JPEGTables tag (347) and
    abbreviated per-segment streams, the TIFF-TechNote-2 layout GDAL
    emits — lossy, quality via ``jpeg_quality``. ``predictor``: 1
    none, 2 horizontal differencing (integer dtypes), 3
    floating-point (float dtypes) — what GDAL writes with
    ``-co PREDICTOR=2/3``. ``tile=(tw, th)`` writes a tiled layout
    (dims must be multiples of 16 per TIFF 6.0) instead of a single
    strip. ``planar=True`` writes band-separate planes
    (PlanarConfiguration 2, GDAL ``-co INTERLEAVE=BAND``).
    ``palette`` ((256, 3) uint16 colormap) writes a
    palette-color file (Photometric 3) from uint8 index samples."""
    dt = np.dtype(dtype).newbyteorder("<")
    if dt.kind not in "fiu":
        raise ValueError("write_geotiff supports float/int/uint dtypes")
    key = compress.lower() if isinstance(compress, str) else compress
    comp_table = {None: _COMP_NONE, "none": _COMP_NONE,
                  "lzw": _COMP_LZW, "deflate": _COMP_DEFLATE,
                  "jpeg": _COMP_JPEG}
    if key not in comp_table:  # accepts the reference's 'LZW' spelling
        raise ValueError(
            f"compress={compress!r}: use None, 'none', 'lzw' "
            "(GDAL's COMPRESS=LZW), 'deflate', or 'jpeg'")
    comp = comp_table[key]
    z = np.asarray(grid.z)
    if z.ndim == 2:
        z = z[:, :, None]
    ny, nx, n_bands = z.shape
    if palette is not None:
        palette = np.asarray(palette)
        if palette.shape != (256, 3):
            raise ValueError("palette must be a (256, 3) uint16 colormap")
        if n_bands != 1 or dt != np.dtype("<u1"):
            raise ValueError("palette GeoTIFF needs uint8 single-band "
                             "index samples (dtype='uint8')")
        if planar or comp == _COMP_JPEG:
            raise ValueError("palette combines with chunky "
                             "none/lzw/deflate layouts only")
    if comp == _COMP_JPEG:
        if dt != np.dtype("<u1"):
            raise ValueError("JPEG compression requires uint8 samples")
        if n_bands not in (1, 3):
            raise ValueError("JPEG compression supports 1 or 3 bands")
        if planar:
            raise ValueError("JPEG-in-TIFF is chunky-interleave only")
        if predictor != 1:
            raise ValueError("TIFF predictors do not apply to JPEG")
    # reference writes rows top-first: flip the y-ascending array
    img = np.ascontiguousarray(z[::-1, :, :]).astype(dt)

    if tile is not None:
        tw, th = int(tile[0]), int(tile[1])
        if tw % 16 or th % 16:
            raise ValueError("TIFF tile dims must be multiples of 16")
        segs = []
        for ty in range(0, ny, th):
            for tx in range(0, nx, tw):
                block = np.zeros((th, tw, n_bands), dt)
                sub = img[ty:ty + th, tx:tx + tw, :]
                block[:sub.shape[0], :sub.shape[1], :] = sub
                segs.append(block)
    else:
        segs = [img]
    if planar:
        # TIFF 6.0: for PlanarConfiguration 2 the offsets array holds
        # all of band 0's segments, then band 1's, ... — each segment
        # a single-sample plane
        segs = [np.ascontiguousarray(s[:, :, b:b + 1])
                for b in range(n_bands) for s in segs]
    jpeg_tables = b""
    if comp == _COMP_JPEG:
        from pointdatabase_spark.sources.jpeg import encode_jpeg
        split = [_split_jpeg_stream(encode_jpeg(
            s[:, :, 0] if n_bands == 1 else s,
            quality=jpeg_quality, subsample="444")) for s in segs]
        jpeg_tables = split[0][0]   # identical tables for every segment
        payloads = [ab for _, ab in split]
    else:
        payloads = [_compress_segment(
            np.ascontiguousarray(
                _predictor_encode(s, predictor)).tobytes(),
            comp) for s in segs]

    fmt = {"f": 3, "i": 2, "u": 1}[dt.kind]
    entries = [
        (_IMAGE_WIDTH, _T_LONG, [nx]),
        (_IMAGE_LENGTH, _T_LONG, [ny]),
        (_BITS_PER_SAMPLE, _T_SHORT, [dt.itemsize * 8] * n_bands),
        (_COMPRESSION, _T_SHORT, [comp]),
        # min-is-black / palette-color / YCbCr (3-band JPEG)
        (_PHOTOMETRIC, _T_SHORT,
         [3 if palette is not None
          else 6 if comp == _COMP_JPEG and n_bands == 3 else 1]),
        (_SAMPLES_PER_PIXEL, _T_SHORT, [n_bands]),
        (_PLANAR_CONFIG, _T_SHORT, [2 if planar else 1]),
        (_SAMPLE_FORMAT, _T_SHORT, [fmt] * n_bands),
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
    if predictor != 1:
        entries.append((_PREDICTOR, _T_SHORT, [predictor]))
    if palette is not None:
        # R[256] then G[256] then B[256], 16-bit per channel
        entries.append((_COLORMAP, _T_SHORT,
                        list(palette.T.astype(np.uint16).ravel())))
    if jpeg_tables:
        entries.append((_JPEG_TABLES, _T_UNDEF, [jpeg_tables]))
    if tile is not None:
        entries.append((_TILE_WIDTH, _T_LONG, [tw]))
        entries.append((_TILE_LENGTH, _T_LONG, [th]))
        off_tag, cnt_tag = _TILE_OFFSETS, _TILE_BYTE_COUNTS
    else:
        entries.append((_ROWS_PER_STRIP, _T_LONG, [ny]))
        off_tag, cnt_tag = _STRIP_OFFSETS, _STRIP_BYTE_COUNTS
    entries.append((cnt_tag, _T_LONG, [len(p) for p in payloads]))
    entries.append((off_tag, _T_LONG, [0] * len(payloads)))  # filled below
    if nodata is not None:
        text = f"{nodata!r}".encode("ascii") + b"\x00"
        entries.append((_GDAL_NODATA, _T_ASCII, [text]))

    # layout: header(8) | IFD | out-of-line values | segment data.
    # Sizes are count-determined, so segment offsets are computable
    # before serialization.
    ifd_size = 2 + 12 * len(entries) + 4
    extra_off = 8 + ifd_size
    extra_len = sum(len(_entry_raw(t, v)[0]) for _, t, v in entries
                    if len(_entry_raw(t, v)[0]) > 4)
    data_off = extra_off + extra_len
    seg_offs, pos = [], data_off
    for p in payloads:
        seg_offs.append(pos)
        pos += len(p)
    entries = [(tag, typ, seg_offs if tag == off_tag else vals)
               for tag, typ, vals in entries]

    extra = bytearray()
    fields = []  # (tag, type, count, inline-or-offset 4 bytes)
    for tag, typ, vals in entries:
        raw, count = _entry_raw(typ, vals)
        if len(raw) <= 4:
            fields.append((tag, typ, count, raw.ljust(4, b"\x00")))
        else:
            fields.append((tag, typ, count,
                           struct.pack("<I", extra_off + len(extra))))
            extra.extend(raw)
    assert len(extra) == extra_len
    out = bytearray()
    out += struct.pack("<2sHI", b"II", 42, 8)
    out += struct.pack("<H", len(fields))
    for tag, typ, count, val4 in sorted(fields):
        out += struct.pack("<HHI", tag, typ, count) + val4
    out += struct.pack("<I", 0)  # no next IFD
    out += extra
    for p in payloads:
        out += p
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
        elif typ == _T_UNDEF:
            tags[tag] = raw                      # opaque (JPEGTables)
        else:
            tags[tag] = list(struct.unpack(
                order + _TYPE_FMT[typ] * count, raw))
    return tags


def read_geotiff(path: str, band: int = 1) -> Grid:
    """S4/S5 GeoTIFF scan (read_DEM.py:14-69 parity for GDAL's common
    outputs): strip- or tile-organized, uncompressed / LZW / deflate /
    new-style JPEG (7, incl. shared JPEGTables), predictor 1/2/3,
    IEEE-float or integer samples, chunky OR planar (band-separate)
    interleave.  Palette-color files return the raw INDEX values as
    band 1 — exactly GDAL's palette band semantics; resolve colors
    with :func:`read_palette`.  Old-style JPEG (6) decodes both
    surviving layouts of the deprecated scheme: the whole-image
    JPEGInterchangeFormat stream (tag 513) and the fragmented
    per-strip variant whose strips are complete SOI-led streams
    (r11); only per-strip bare scan data (tables exclusively in tags
    517-521 — the TechNote-2 "broken by design" case) and exotic
    sample formats still raise with a pointer at rasterio."""
    with open(path, "rb") as fh:
        buf = fh.read()
    if buf[:2] == b"II":
        order = "<"
    elif buf[:2] == b"MM":
        order = ">"
    else:
        raise ValueError("not a TIFF file")
    tags = _read_ifd(buf, order)
    comp = tags.get(_COMPRESSION, [1])[0]
    predictor = tags.get(_PREDICTOR, [1])[0]
    fmt = tags.get(_SAMPLE_FORMAT, [1])[0]
    if comp == _COMP_JPEG_OLD and _JPEG_IF not in tags:
        # Fragmented old-style JPEG (no tag 513). The per-strip tag
        # soup (512/515-521) of the deprecated scheme was broken by
        # design (TIFF TechNote 2), but one sub-variant IS readable
        # and occurs in legacy corpora (early Wang/Imaging-era
        # writers): every strip offset points at a COMPLETE SOI-led
        # JPEG stream. Those decode strip-wise below with the same
        # T.81 codec. Strips that point mid-stream (bare scan data
        # whose tables live only in tags 517-521) remain the
        # genuinely underspecified case and keep the gate.
        _offs = tags.get(_STRIP_OFFSETS, [])
        if not (_offs and all(0 < o <= len(buf) - 2
                              and buf[o:o + 2] == b"\xff\xd8"
                              for o in _offs)):
            raise NotImplementedError(
                "old-style JPEG-in-TIFF (compression 6) without a "
                "JPEGInterchangeFormat stream (tag 513) and with "
                "strips that are not self-contained SOI-led JPEG "
                "streams (bare scan data + table tags 517-521) is "
                "unreadably underspecified; re-export with "
                "new-style JPEG (7)")
    planar = tags.get(_PLANAR_CONFIG, [1])[0]
    if planar not in (1, 2):
        raise ValueError(f"bad PlanarConfiguration {planar}")
    kind = {1: "u", 2: "i", 3: "f"}.get(fmt)
    if kind is None:
        raise NotImplementedError(
            f"TIFF sample format {fmt} not supported (uint/int/float "
            "only); install rasterio for other formats")
    nx = tags[_IMAGE_WIDTH][0]
    ny = tags[_IMAGE_LENGTH][0]
    n_bands = tags.get(_SAMPLES_PER_PIXEL, [1])[0]
    bits = tags[_BITS_PER_SAMPLE][0]
    if (kind == "f" and bits not in (32, 64)) or \
            (kind != "f" and bits not in (8, 16, 32)):
        raise NotImplementedError(
            f"{bits}-bit {kind!r} samples not supported")
    dt = np.dtype(order + kind + str(bits // 8))
    item = dt.itemsize
    jtables = tags.get(_JPEG_TABLES, b"")

    def _seg_pixels(raw: bytes, rows: int, cols: int,
                    bands: int) -> np.ndarray:
        """One strip/tile -> (rows, cols, bands) float64."""
        if comp == _COMP_JPEG:
            if bits != 8 or kind != "u":
                raise NotImplementedError(
                    "JPEG-in-TIFF is 8-bit unsigned only")
            from pointdatabase_spark.sources.jpeg import decode_jpeg
            px = decode_jpeg(_merge_jpeg_tables(jtables, raw))
            if px.ndim == 2:
                px = px[:, :, None]
            if px.shape[2] != bands:
                raise ValueError(
                    f"JPEG segment has {px.shape[2]} channels, "
                    f"IFD declares {bands}")
            out = np.zeros((rows, cols, bands), np.float64)
            out[:min(rows, px.shape[0]), :min(cols, px.shape[1]), :] = (
                px[:rows, :cols, :])
            return out
        dec = _decompress_segment(raw, comp, rows * cols * bands * item)
        return np.asarray(_predictor_decode(
            dec, predictor, rows, cols, bands, dt), dtype=np.float64)

    # planar config 2: the offsets array is band-major — all of band
    # 0's segments, then band 1's, ...; each segment holds one sample
    n_planes = n_bands if planar == 2 else 1
    seg_bands = 1 if planar == 2 else n_bands
    if comp == _COMP_JPEG_OLD:
        if bits != 8 or kind != "u" or planar != 1:
            raise NotImplementedError(
                "old-style JPEG-in-TIFF is 8-bit unsigned chunky only")
        from pointdatabase_spark.sources.jpeg import decode_jpeg
        z = np.zeros((ny, nx, n_bands), np.float64)
        if _JPEG_IF in tags:
            # One complete JFIF stream covers the whole image; strip
            # layout tags, if present, are ignored (they routinely
            # lie in old-style files — the reason TechNote 2
            # deprecated them).
            o = tags[_JPEG_IF][0]
            c = tags.get(_JPEG_IF_LEN, [len(buf) - o])[0]
            px = decode_jpeg(buf[o:o + c])
            if px.ndim == 2:
                px = px[:, :, None]
            if px.shape[2] != n_bands:
                raise ValueError(
                    f"embedded JPEG has {px.shape[2]} channels, "
                    f"IFD declares {n_bands}")
            z[:min(ny, px.shape[0]), :min(nx, px.shape[1]), :] = (
                px[:ny, :nx, :])
        else:
            # Fragmented per-strip variant, SOI-led strips verified
            # above: each strip is an independent complete stream
            # stacked by RowsPerStrip. Byte counts routinely lie (or
            # are absent) in these files; a zero/missing count runs
            # to the next strip's offset (or EOF) — the decoder
            # stops at EOI anyway.
            rps = tags.get(_ROWS_PER_STRIP, [ny])[0] or ny
            offs = tags[_STRIP_OFFSETS]
            cnts = tags.get(_STRIP_BYTE_COUNTS, [])
            for i, o in enumerate(offs):
                # Out-of-order strip offsets make next-offset - o
                # negative (empty slice -> opaque decoder failure);
                # fall back to the rest of the buffer — the decoder
                # stops at this strip's EOI regardless.
                c = cnts[i] if i < len(cnts) and cnts[i] else (
                    (offs[i + 1] - o) if i + 1 < len(offs)
                    and offs[i + 1] > o
                    else len(buf) - o)
                px = decode_jpeg(buf[o:o + c])
                if px.ndim == 2:
                    px = px[:, :, None]
                if px.shape[2] != n_bands:
                    raise ValueError(
                        f"strip JPEG has {px.shape[2]} channels, "
                        f"IFD declares {n_bands}")
                r0 = i * rps
                rows = min(rps, ny - r0, px.shape[0])
                if rows <= 0:
                    continue
                z[r0:r0 + rows, :min(nx, px.shape[1]), :] = (
                    px[:rows, :nx, :])
    elif _TILE_WIDTH in tags:
        tw, th = tags[_TILE_WIDTH][0], tags[_TILE_LENGTH][0]
        offs = tags[_TILE_OFFSETS]
        counts = tags[_TILE_BYTE_COUNTS]
        across = (nx + tw - 1) // tw
        down = (ny + th - 1) // th
        per_plane = across * down
        full = np.zeros((down * th, across * tw, n_bands), np.float64)
        for idx, (o, c) in enumerate(zip(offs, counts)):
            plane, pidx = divmod(idx, per_plane)
            seg = _seg_pixels(buf[o:o + c], th, tw, seg_bands)
            r, cpos = divmod(pidx, across)
            full[r * th:(r + 1) * th, cpos * tw:(cpos + 1) * tw,
                 plane * seg_bands:plane * seg_bands + seg_bands] = seg
        z = full[:ny, :nx, :]
    else:
        rps = tags.get(_ROWS_PER_STRIP, [ny])[0]
        offs = tags[_STRIP_OFFSETS]
        counts = tags[_STRIP_BYTE_COUNTS]
        per_plane = len(offs) // n_planes
        z = np.zeros((ny, nx, n_bands), np.float64)
        for idx, (o, c) in enumerate(zip(offs, counts)):
            plane, pidx = divmod(idx, per_plane)
            rows = min(rps, ny - pidx * rps)
            seg = _seg_pixels(buf[o:o + c], rows, nx, seg_bands)
            z[pidx * rps:pidx * rps + rows, :,
              plane * seg_bands:plane * seg_bands + seg_bands] = seg
    if not 1 <= band <= n_bands:
        raise ValueError(f"band {band} out of range 1..{n_bands}")
    z = np.ascontiguousarray(z[:, :, band - 1], dtype=np.float64)
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


def read_palette(path: str) -> np.ndarray:
    """ColorMap (tag 320) of a palette-color GeoTIFF as a (256, 3)
    uint16 array — pair with the index band :func:`read_geotiff`
    returns to resolve RGB, the same two-step GDAL exposes as band 1
    + GetColorTable()."""
    with open(path, "rb") as fh:
        buf = fh.read()
    if buf[:2] == b"II":
        order = "<"
    elif buf[:2] == b"MM":
        order = ">"
    else:
        raise ValueError("not a TIFF file")
    tags = _read_ifd(buf, order)
    if tags.get(_PHOTOMETRIC, [1])[0] != 3 or _COLORMAP not in tags:
        raise ValueError("not a palette-color TIFF (Photometric 3 "
                         "with a ColorMap)")
    cm = np.asarray(tags[_COLORMAP], np.uint16)
    return cm.reshape(3, -1).T
