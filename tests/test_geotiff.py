"""S14 GeoTIFF sink + S4/S5 stdlib scan: write→read roundtrips against
``grid_from_points`` output with reference georeferencing
(mapData.py:139,153 row order; origin at (x_min−dx/2, y_max+dy/2))."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from pointdatabase_spark.operators.raster import Grid, load_geotiff
from pointdatabase_spark.sources.geotiff import (
    grid_from_points,
    read_geotiff,
    write_geotiff,
)


def _demo_grid() -> Grid:
    z = np.arange(35, dtype=np.float64).reshape(5, 7) * 1.5 - 10.0
    return Grid(x0=-3000.0, y0=2000.0, dx=1000.0, dy=500.0, z=z)


def test_roundtrip_float64_exact(tmp_path):
    g = _demo_grid()
    path = str(tmp_path / "g64.tif")
    write_geotiff(g, path, dtype="float64")
    r = read_geotiff(path)
    assert (r.x0, r.y0, r.dx, r.dy) == (g.x0, g.y0, g.dx, g.dy)
    np.testing.assert_array_equal(r.z, g.z)


def test_roundtrip_float32(tmp_path):
    g = _demo_grid()
    path = str(tmp_path / "g32.tif")
    write_geotiff(g, path, dtype="float32")
    r = read_geotiff(path)
    np.testing.assert_array_equal(r.z, g.z.astype(np.float32).astype(np.float64))


def test_grid_from_points_roundtrip(spark, tmp_path):
    # exact-integer heights on a 10x8 node lattice -> bit-exact roundtrip
    xs, ys = np.meshgrid(np.arange(10) * 100.0, np.arange(8) * 50.0)
    zz = (xs / 100.0 + ys).ravel()
    df = spark.createDataFrame(
        [(float(x), float(y), float(z))
         for x, y, z in zip(xs.ravel(), ys.ravel(), zz)], "x double, y double, z double")
    g = grid_from_points(df, dx=100.0, dy=50.0)
    assert (g.ny, g.nx) == (8, 10)
    path = str(tmp_path / "pts.tif")
    write_geotiff(g, path, dtype="float64")
    r = read_geotiff(path)
    np.testing.assert_array_equal(r.z, g.z)
    assert (r.x0, r.y0) == (0.0, 0.0)


def test_load_geotiff_delegates_to_stdlib_codec(tmp_path):
    g = _demo_grid()
    path = str(tmp_path / "via_loader.tif")
    write_geotiff(g, path, dtype="float64")
    r = load_geotiff(path)
    np.testing.assert_array_equal(r.z, g.z)


def test_finite_nodata_masked_to_nan(tmp_path):
    # read_DEM.py:45-47 semantics: finite GDAL_NODATA values become NaN
    g = _demo_grid()
    g.z[2, 3] = -9999.0
    g.z[0, 0] = -9999.0
    path = str(tmp_path / "nodata.tif")
    write_geotiff(g, path, dtype="float32", nodata=-9999.0)
    r = read_geotiff(path)
    assert np.isnan(r.z[2, 3]) and np.isnan(r.z[0, 0])
    assert np.isfinite(r.z).sum() == g.z.size - 2


def test_unknown_ifd_entry_types_are_skipped(tmp_path):
    # splice a RATIONAL-typed entry (type 5) into the IFD: real GDAL
    # files carry BYTE/RATIONAL/UNDEFINED tags the codec doesn't model
    g = _demo_grid()
    path = str(tmp_path / "odd.tif")
    write_geotiff(g, path, dtype="float64")
    buf = bytearray(open(path, "rb").read())
    ifd_off = struct.unpack("<I", buf[4:8])[0]
    n = struct.unpack("<H", buf[ifd_off:ifd_off + 2])[0]
    # overwrite the LAST entry (sorted by tag: GDAL-range tag, not
    # needed for layout) with a fake RATIONAL tag 50000
    e = ifd_off + 2 + 12 * (n - 1)
    buf[e:e + 12] = struct.pack("<HHI4s", 50000, 5, 1, b"\0\0\0\0")
    odd = str(tmp_path / "odd2.tif")
    open(odd, "wb").write(bytes(buf))
    r = read_geotiff(odd)
    np.testing.assert_array_equal(r.z, g.z)


def test_unsupported_bit_width_raises_cleanly(tmp_path):
    g = _demo_grid()
    path = str(tmp_path / "w.tif")
    write_geotiff(g, path, dtype="float64")
    buf = bytearray(open(path, "rb").read())
    ifd_off = struct.unpack("<I", buf[4:8])[0]
    n = struct.unpack("<H", buf[ifd_off:ifd_off + 2])[0]
    for k in range(n):
        e = ifd_off + 2 + 12 * k
        tag, typ, count = struct.unpack("<HHI", buf[e:e + 8])
        if tag == 258:  # BitsPerSample -> claim 16-bit float
            buf[e + 8:e + 12] = struct.pack("<HH", 16, 0)
    bad = str(tmp_path / "w16.tif")
    open(bad, "wb").write(bytes(buf))
    with pytest.raises(NotImplementedError, match="16-bit"):
        read_geotiff(bad)


def test_geokey_directory_models_geographic_vs_projected(tmp_path):
    g = _demo_grid()

    def geokeys(path):
        buf = open(path, "rb").read()
        ifd_off = struct.unpack("<I", buf[4:8])[0]
        n = struct.unpack("<H", buf[ifd_off:ifd_off + 2])[0]
        for k in range(n):
            e = ifd_off + 2 + 12 * k
            tag, typ, count = struct.unpack("<HHI", buf[e:e + 8])
            if tag == 34735:
                off = struct.unpack("<I", buf[e + 8:e + 12])[0]
                vals = struct.unpack(f"<{count}H", buf[off:off + 2 * count])
                return {vals[i]: vals[i + 3]
                        for i in range(4, len(vals), 4)}
        raise AssertionError("no GeoKeyDirectory")

    proj = str(tmp_path / "proj.tif")
    write_geotiff(g, proj, epsg=3413)
    keys = geokeys(proj)
    assert keys[1024] == 1 and keys[3072] == 3413 and 2048 not in keys

    geo = str(tmp_path / "geo.tif")
    write_geotiff(g, geo, epsg=4326)
    keys = geokeys(geo)
    assert keys[1024] == 2 and keys[2048] == 4326 and 3072 not in keys


def test_lzw_codec_pinned_bitstream():
    """TIFF 6.0 §13 LZW: MSB-first 9-bit start, CLEAR=256/EOI=257.
    b"abab" encodes to codes [256,97,98,258,257] — hand-packed bytes
    pin the bit layout independent of the encoder/decoder pair (a
    shared complementary bug would still roundtrip)."""
    from pointdatabase_spark.sources.geotiff import _lzw_decode, _lzw_encode
    enc = _lzw_encode(b"abab")
    assert enc == bytes([0x80, 0x18, 0x4C, 0x50, 0x28, 0x08])
    assert _lzw_decode(enc) == b"abab"
    # width-boundary (9->10 bit early change) + table-clear coverage
    rng = np.random.default_rng(5)
    for n in (0, 1, 300, 5000, 150_000):
        data = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
        assert _lzw_decode(_lzw_encode(data)) == data


@pytest.mark.parametrize("dtype,compress,predictor,tile", [
    ("float32", "lzw", 1, None),
    ("float32", "lzw", 3, (16, 16)),
    ("float64", "deflate", 3, None),
    ("float64", "lzw", 1, (32, 16)),
    ("int16", "lzw", 2, None),
    ("int32", "deflate", 2, (16, 32)),
    ("uint8", "lzw", 1, (16, 16)),
])
def test_roundtrip_compressed_tiled_predicted(tmp_path, dtype, compress,
                                              predictor, tile):
    """GDAL's common outputs: LZW/deflate × strip/tile × predictor
    1/2/3 × float/int samples all read through the stdlib codec —
    no rasterio gate (r4 verdict item 6)."""
    rng = np.random.default_rng(3)
    z = rng.normal(0, 100, (37, 53))
    if np.dtype(dtype).kind != "f":
        z = z.astype(np.dtype(dtype)).astype(np.float64)
    g = Grid(x0=100.0, y0=-200.0, dx=25.0, dy=25.0, z=z)
    p = str(tmp_path / "c.tif")
    write_geotiff(g, p, dtype=dtype, compress=compress,
                  predictor=predictor, tile=tile)
    r = read_geotiff(p)
    want = z.astype(np.dtype(dtype)).astype(np.float64)
    np.testing.assert_array_equal(r.z, want)
    assert (r.x0, r.y0, r.dx, r.dy) == (g.x0, g.y0, g.dx, g.dy)
    # via the public loader too (gate removed for these layouts)
    np.testing.assert_array_equal(load_geotiff(p).z, want)


def test_integer_nodata_masked_to_nan(tmp_path):
    """A -9999-filled int16 DEM (the classic GDAL fill) masks to NaN
    through the compressed+predicted path."""
    z = np.arange(48, dtype=np.float64).reshape(6, 8)
    z[0, :3] = -9999.0
    g = Grid(x0=0.0, y0=0.0, dx=10.0, dy=10.0, z=z)
    p = str(tmp_path / "nod16.tif")
    write_geotiff(g, p, dtype="int16", compress="lzw", predictor=2,
                  nodata=-9999)
    r = read_geotiff(p)
    assert np.isnan(r.z[0, :3]).all()
    np.testing.assert_array_equal(r.z[1:], z[1:])


def test_tile_dims_must_be_multiple_of_16(tmp_path):
    with pytest.raises(ValueError, match="multiples of 16"):
        write_geotiff(_demo_grid(), str(tmp_path / "t.tif"), tile=(20, 16))


def test_geotiff_roundtrip_property(tmp_path):
    """Property: any float grid (values incl. inf; any geometry)
    survives write->read, float64 bit-exactly, float32 at cast
    precision; finite nodata masks to NaN."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=20, deadline=None)
    @given(
        ny=st.integers(1, 12), nx=st.integers(1, 12),
        x0=st.floats(-1e6, 1e6), y0=st.floats(-1e6, 1e6),
        dx=st.floats(0.5, 5000), dy=st.floats(0.5, 5000),
        seed=st.integers(0, 2**31), f64=st.booleans())
    def check(ny, nx, x0, y0, dx, dy, seed, f64):
        rng = np.random.default_rng(seed)
        z = rng.normal(0, 1e4, (ny, nx))
        g = Grid(x0=x0, y0=y0, dx=dx, dy=dy, z=z)
        p = str(tmp_path / "prop.tif")
        write_geotiff(g, p, dtype="float64" if f64 else "float32")
        r = read_geotiff(p)
        want = z if f64 else z.astype(np.float32).astype(np.float64)
        np.testing.assert_array_equal(r.z, want)
        assert (r.dx, r.dy) == (dx, dy)
        np.testing.assert_allclose((r.x0, r.y0), (x0, y0), rtol=0,
                                   atol=1e-9 * max(abs(x0), abs(y0), 1))

    check()


def test_predictor3_multiband_stride_matches_libtiff_semantics():
    """fpDiff/fpAcc difference the plane-major row buffer with stride
    = samples-per-pixel. Pin the vectorized encode against a scalar
    transliteration of libtiff's loop, multiband and single-band."""
    import numpy as np
    from pointdatabase_spark.sources import geotiff as gt
    rng = np.random.default_rng(9)
    for bands in (1, 3):
        seg = rng.normal(size=(4, 5, bands)).astype("<f4")
        enc = gt._predictor_encode(seg, 3)
        # scalar reference: byte-plane shuffle then stride differencing
        rows, cols, _ = seg.shape
        size = seg.dtype.itemsize
        for r in range(rows):
            row = np.frombuffer(
                seg[r].astype(">f4").tobytes(), np.uint8)
            cc = row.size
            planes = np.empty(cc, np.uint8)
            wc = cols * bands
            for count in range(wc):          # libtiff fpDiff shuffle
                for b in range(size):
                    planes[b * wc + count] = row[count * size + b]
            out = planes.copy()
            for p in range(cc - 1, bands - 1, -1):   # stride differencing
                out[p] = (int(out[p]) - int(planes[p - bands])) & 0xFF
            np.testing.assert_array_equal(enc[r], out)
        # and the decoder inverts it
        dec = gt._predictor_decode(enc.tobytes(), 3, rows, cols,
                                   bands, np.dtype("<f4"))
        np.testing.assert_array_equal(dec, seg)


def test_multiband_predictor_roundtrips(tmp_path):
    """Full-file multiband roundtrips across predictors/compressors,
    incl. the reference's uppercase 'LZW' spelling."""
    import numpy as np
    import pytest as _pytest
    from pointdatabase_spark.operators import raster
    from pointdatabase_spark.sources import geotiff as gt
    rng = np.random.default_rng(3)
    z = rng.normal(size=(32, 48, 3))
    g = raster.Grid(x0=0.0, y0=0.0, dx=10.0, dy=10.0, z=z)
    for compress, predictor, dtype in (
            ("LZW", 3, "f8"), ("deflate", 3, "f4"), ("lzw", 1, "f8")):
        p = str(tmp_path / f"mb_{compress}_{predictor}.tif")
        gt.write_geotiff(g, p, compress=compress, predictor=predictor,
                         dtype=dtype)
        want = z if dtype == "f8" else z.astype("f4").astype("f8")
        for b in (1, 2, 3):  # read_geotiff reads one band, like read_DEM
            r = gt.read_geotiff(p, band=b)
            np.testing.assert_allclose(r.z, want[:, :, b - 1], rtol=1e-6)
    with _pytest.raises(ValueError, match="compress"):
        gt.write_geotiff(g, str(tmp_path / "bad.tif"), compress="jpeg")


def test_planar_interleave_roundtrips(tmp_path):
    """r8: PlanarConfiguration 2 (GDAL -co INTERLEAVE=BAND) — strips
    and tiles, compressed and predicted, multiband: band-major
    segment order reassembles bit-exactly."""
    rng = np.random.default_rng(5)
    z = rng.integers(0, 4000, (21, 17, 3)).astype(np.float64)
    g = Grid(x0=0.0, y0=0.0, dx=100.0, dy=100.0, z=z)
    for kw in (dict(), dict(compress="lzw", predictor=2),
               dict(compress="deflate"),
               dict(tile=(16, 16), compress="lzw")):
        path = str(tmp_path / "planar.tif")
        write_geotiff(g, path, dtype="int32", planar=True, **kw)
        for band in (1, 2, 3):
            np.testing.assert_array_equal(
                read_geotiff(path, band=band).z, z[:, :, band - 1])


def test_palette_color_roundtrips(tmp_path):
    """r8: Photometric 3 + ColorMap — the index band reads back
    exactly (GDAL band-1 semantics) and read_palette returns the
    16-bit colormap verbatim."""
    from pointdatabase_spark.sources.geotiff import read_palette
    rng = np.random.default_rng(6)
    idx = rng.integers(0, 256, (9, 13)).astype(np.float64)
    pal = rng.integers(0, 65536, (256, 3)).astype(np.uint16)
    g = Grid(x0=0.0, y0=0.0, dx=10.0, dy=10.0, z=idx)
    path = str(tmp_path / "pal.tif")
    write_geotiff(g, path, dtype="uint8", palette=pal, compress="lzw")
    np.testing.assert_array_equal(read_geotiff(path).z, idx)
    np.testing.assert_array_equal(read_palette(path), pal)
    with pytest.raises(ValueError, match="uint8 single-band"):
        write_geotiff(g, path, dtype="int32", palette=pal)


def test_jpeg_in_tiff_reads_back_within_codec_error(tmp_path):
    """r8: new-style JPEG-in-TIFF (compression 7) with shared
    JPEGTables + abbreviated per-segment streams — gray strips, gray
    tiles, and 3-band YCbCr: smooth data reads back within the JPEG
    q95 error bound of the same codec standalone."""
    yy, xx = np.mgrid[0:24, 0:33]
    smooth = (yy * 3 + xx * 2) % 200 + 20.0
    g1 = Grid(x0=0.0, y0=0.0, dx=1.0, dy=1.0, z=smooth)
    for kw in (dict(), dict(tile=(16, 16))):
        path = str(tmp_path / "jpg.tif")
        write_geotiff(g1, path, dtype="uint8", compress="jpeg", **kw)
        r = read_geotiff(path)
        assert np.abs(r.z - smooth).max() <= 4
    rgb = np.stack([smooth, smooth[::-1], smooth.T[:24, :24].repeat(
        2, 1)[:, :33]], axis=-1)
    g3 = Grid(x0=0.0, y0=0.0, dx=1.0, dy=1.0, z=rgb)
    path3 = str(tmp_path / "jpg3.tif")
    write_geotiff(g3, path3, dtype="uint8", compress="jpeg")
    for b in (1, 2, 3):
        assert np.abs(read_geotiff(path3, band=b).z
                      - rgb[:, :, b - 1]).max() <= 6
    # the shared-tables layout is actually on disk
    from pointdatabase_spark.sources.geotiff import _read_ifd
    buf = open(path3, "rb").read()
    tags = _read_ifd(buf, "<")
    assert isinstance(tags[347], bytes) and b"\xff\xc4" in tags[347]
    with pytest.raises(ValueError, match="uint8"):
        write_geotiff(g1, path, dtype="float32", compress="jpeg")


def _write_old_style_jpeg_tiff(path, jfif, ny, nx, n_bands,
                               with_len=True):
    """Hand-assemble the deprecated old-style JPEG-in-TIFF layout
    (compression 6 + whole-image JPEGInterchangeFormat stream at tag
    513) that no modern writer emits but legacy corpora still carry
    — early libtiff and EXIF-era scanners (TIFF 6.0 §22)."""
    import struct
    T_SHORT, T_LONG, T_DOUBLE = 3, 4, 12
    entries = [
        (256, T_LONG, [nx]), (257, T_LONG, [ny]),
        (258, T_SHORT, [8] * n_bands),
        (259, T_SHORT, [6]),                       # old-style JPEG
        (262, T_SHORT, [6 if n_bands == 3 else 1]),
        (277, T_SHORT, [n_bands]),
        # lying strip tags, routinely present in real old-style files
        (273, T_LONG, [0]), (279, T_LONG, [0]), (278, T_LONG, [ny]),
        (33550, T_DOUBLE, [1.0, 1.0, 0.0]),
        (33922, T_DOUBLE, [0.0, 0.0, 0.0, 0.0, float(ny), 0.0]),
    ]
    fmt = {T_SHORT: "H", T_LONG: "I", T_DOUBLE: "d"}
    size = {T_SHORT: 2, T_LONG: 4, T_DOUBLE: 8}
    n = len(entries) + 1 + (1 if with_len else 0)
    ifd_size = 2 + 12 * n + 4
    extra_off = 8 + ifd_size
    extra = bytearray()
    fields = []
    jfif_tags = [(513, T_LONG, None)]
    if with_len:
        jfif_tags.append((514, T_LONG, [len(jfif)]))
    for tag, typ, vals in sorted(entries + jfif_tags):
        if tag == 513:
            # patched after extra is final: stream lands after extras
            fields.append((tag, typ, 1, None))
            continue
        raw = b"".join(struct.pack("<" + fmt[typ], v) for v in vals)
        if len(raw) <= 4:
            fields.append((tag, typ, len(vals), raw.ljust(4, b"\x00")))
        else:
            fields.append((tag, typ, len(vals),
                           struct.pack("<I", extra_off + len(extra))))
            extra.extend(raw)
    jfif_off = extra_off + len(extra)
    fields = [(t, ty, c, struct.pack("<I", jfif_off) if v is None
               else v) for t, ty, c, v in fields]
    out = bytearray(struct.pack("<2sHI", b"II", 42, 8))
    out += struct.pack("<H", n)
    for tag, typ, count, val4 in fields:
        out += struct.pack("<HHI", tag, typ, count) + val4
    out += struct.pack("<I", 0)
    out += extra
    out += jfif
    with open(path, "wb") as fh:
        fh.write(bytes(out))


def test_read_old_style_jpeg_in_tiff(tmp_path):
    """Compression-6 files with a whole-image interchange stream (tag
    513) decode identically to the bare JFIF stream; gray and RGB,
    with and without the length tag (514); the fragmented variant
    without tag 513 still raises."""
    import pytest
    from pointdatabase_spark.sources.geotiff import read_geotiff
    from pointdatabase_spark.sources.jpeg import decode_jpeg, encode_jpeg
    rng = np.arange(33 * 48, dtype=np.uint8).reshape(33, 48)
    smooth = ((rng.astype(np.int32) * 3) % 200).astype(np.uint8)
    jf = encode_jpeg(smooth, quality=95)
    exp = decode_jpeg(jf).astype(np.float64)
    p = str(tmp_path / "old.tif")
    _write_old_style_jpeg_tiff(p, jf, 33, 48, 1)
    g = read_geotiff(p)
    assert g.z.shape == exp.shape
    assert np.array_equal(g.z[::-1, :], exp)  # Grid flips to y-asc
    # missing length tag: stream runs to EOF, decoder stops at EOI
    p2 = str(tmp_path / "old_nolen.tif")
    _write_old_style_jpeg_tiff(p2, jf, 33, 48, 1, with_len=False)
    assert np.array_equal(read_geotiff(p2).z, g.z)
    # RGB via band selection
    rgb = np.stack([smooth, smooth[::-1], smooth.T[:33, :33].repeat(
        2, 1)[:, :48]], axis=-1).astype(np.uint8)
    jf3 = encode_jpeg(rgb, quality=95)
    exp3 = decode_jpeg(jf3).astype(np.float64)
    p3 = str(tmp_path / "old3.tif")
    _write_old_style_jpeg_tiff(p3, jf3, 33, 48, 3)
    for b in (1, 2, 3):
        assert np.array_equal(read_geotiff(p3, band=b).z[::-1, :],
                              exp3[:, :, b - 1])
    # fragmented old-style (no tag 513) keeps its precise gate
    blank = bytearray(open(p, "rb").read())
    import struct as _s
    nent = _s.unpack("<H", blank[8:10])[0]
    for k in range(nent):
        e = 10 + 12 * k
        if _s.unpack("<H", blank[e:e + 2])[0] == 513:
            blank[e:e + 2] = _s.pack("<H", 515)  # retag -> gone
    p4 = str(tmp_path / "frag.tif")
    open(p4, "wb").write(bytes(blank))
    with pytest.raises(NotImplementedError, match="tag 513"):
        read_geotiff(p4)


def test_read_fragmented_old_style_jpeg_strips(tmp_path):
    """The readable fragmented sub-variant (r11): compression 6, no
    tag 513, every strip a COMPLETE SOI-led JPEG stream — decodes
    strip-wise and stacks by RowsPerStrip, byte-exact vs per-strip
    decode_jpeg; with lying zero byte counts the reader spans to the
    next offset (decoder stops at EOI). Strips that are NOT SOI-led
    keep the precise gate."""
    import struct
    import pytest
    from pointdatabase_spark.sources.geotiff import read_geotiff
    from pointdatabase_spark.sources.jpeg import decode_jpeg, encode_jpeg

    ny, nx, rps = 40, 48, 16
    img = ((np.arange(ny * nx, dtype=np.int32) * 7) % 211).astype(
        np.uint8).reshape(ny, nx)
    strips = [encode_jpeg(img[r0:r0 + rps], quality=95)
              for r0 in range(0, ny, rps)]
    exp = np.concatenate([decode_jpeg(s).astype(np.float64)
                          for s in strips], axis=0)

    def build(counts):
        T_SHORT, T_LONG, T_DOUBLE = 3, 4, 12
        entries = [
            (256, T_LONG, [nx]), (257, T_LONG, [ny]),
            (258, T_SHORT, [8]), (259, T_SHORT, [6]),
            (262, T_SHORT, [1]), (277, T_SHORT, [1]),
            (278, T_LONG, [rps]),
            (273, T_LONG, None),          # patched below
            (279, T_LONG, counts),
            (33550, T_DOUBLE, [1.0, 1.0, 0.0]),
            (33922, T_DOUBLE, [0.0, 0.0, 0.0, 0.0, float(ny), 0.0]),
        ]
        fmt = {T_SHORT: "H", T_LONG: "I", T_DOUBLE: "d"}
        n = len(entries)
        ifd_size = 2 + 12 * n + 4
        extra_off = 8 + ifd_size
        # first pass: lay out extras, reserving strip-offset array
        extra = bytearray()
        fields = []
        strip_arr_pos = None
        for tag, typ, vals in sorted(entries):
            if vals is None:
                vals = [0] * len(strips)   # placeholder offsets
                strip_arr_pos = len(extra) if len(vals) > 1 else None
            raw = b"".join(struct.pack("<" + fmt[typ], v)
                           for v in vals)
            if len(raw) <= 4 and tag != 273:
                fields.append((tag, typ, len(vals),
                               raw.ljust(4, b"\x00")))
            else:
                if tag == 273:
                    strip_arr_pos = len(extra)
                fields.append((tag, typ, len(vals), struct.pack(
                    "<I", extra_off + len(extra))))
                extra.extend(raw)
        data_off = extra_off + len(extra)
        offs, cur = [], data_off
        for s in strips:
            offs.append(cur)
            cur += len(s)
        extra[strip_arr_pos:strip_arr_pos + 4 * len(strips)] = \
            b"".join(struct.pack("<I", o) for o in offs)
        out = bytearray(struct.pack("<2sHI", b"II", 42, 8))
        out += struct.pack("<H", n)
        for tag, typ, count, val4 in fields:
            out += struct.pack("<HHI", tag, typ, count) + val4
        out += struct.pack("<I", 0)
        out += extra
        for s in strips:
            out += s
        return bytes(out)

    p = str(tmp_path / "frag_ok.tif")
    open(p, "wb").write(build([len(s) for s in strips]))
    g = read_geotiff(p)
    assert g.z.shape == (ny, nx)
    assert np.array_equal(g.z[::-1, :], exp[:ny, :nx])
    # lying zero byte counts: reader spans offset-to-offset
    p2 = str(tmp_path / "frag_zero.tif")
    open(p2, "wb").write(build([0] * len(strips)))
    assert np.array_equal(read_geotiff(p2).z, g.z)
    # non-SOI-led strips (bare scan data) still gate
    raw = bytearray(build([len(s) for s in strips]))
    soi_at = raw.find(b"\xff\xd8\xff")
    raw[soi_at:soi_at + 2] = b"\x00\x00"
    p3 = str(tmp_path / "frag_bad.tif")
    open(p3, "wb").write(bytes(raw))
    with pytest.raises(NotImplementedError, match="SOI-led"):
        read_geotiff(p3)
