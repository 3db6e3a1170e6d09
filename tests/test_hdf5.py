"""Stdlib HDF5 codec roundtrips + un-gated S2/S3 converter jobs.

The writer emits the spec subset the reader parses; roundtrips pin
both. Reader robustness cases (unknown messages, deep trees, edge
chunks) model what official ICESat-2/ATM granules contain."""

from __future__ import annotations

import numpy as np
import pytest

from pointdatabase_spark.sources import converters, hdf5


def test_roundtrip_contiguous_1d(tmp_path):
    p = str(tmp_path / "a.h5")
    x = np.linspace(-5, 5, 1001)
    hdf5.write_h5(p, {"x": x})
    r = hdf5.read_h5(p)
    np.testing.assert_array_equal(r["x"][...], x)
    assert r["x"].shape == (1001,) and r["x"].dtype == np.float64


def test_roundtrip_2d_and_int(tmp_path):
    p = str(tmp_path / "b.h5")
    z = np.arange(60, dtype=np.float64).reshape(6, 10) * 0.5
    k = np.arange(7, dtype=np.int64) * 3 - 5
    u = np.arange(5, dtype=np.int32)
    hdf5.write_h5(p, {"z": z, "k": k, "u": u})
    r = hdf5.read_h5(p)
    np.testing.assert_array_equal(r["z"][...], z)
    np.testing.assert_array_equal(r["k"][...], k)
    np.testing.assert_array_equal(r["u"][...], u)
    assert r["k"][...].dtype == np.int64


def test_roundtrip_nested_groups_and_attrs(tmp_path):
    p = str(tmp_path / "c.h5")
    hdf5.write_h5(p, {
        "gt1l": {"land_ice_segments": {
            "h_li": np.array([1.0, 2.0, -9999.0]),
            "ground_track": {"x_atc": np.array([10.0, 20.0, 30.0])},
        }},
        "meta": hdf5.dataset(np.array([1.0]),
                             attrs={"units": "m", "fill": -9999.0,
                                    "n": 3}),
    }, attrs={"title": "synthetic granule"})
    r = hdf5.read_h5(p)
    np.testing.assert_array_equal(
        r["gt1l/land_ice_segments/h_li"][...], [1.0, 2.0, -9999.0])
    np.testing.assert_array_equal(
        r["gt1l/land_ice_segments/ground_track/x_atc"][...],
        [10.0, 20.0, 30.0])
    assert r.attrs["title"] == "synthetic granule"
    assert r["meta"].attrs["units"] == "m"
    assert r["meta"].attrs["fill"] == -9999.0
    assert r["meta"].attrs["n"] == 3


@pytest.mark.parametrize("shuffle", [False, True])
def test_roundtrip_chunked_gzip(tmp_path, shuffle):
    p = str(tmp_path / f"d{int(shuffle)}.h5")
    rng = np.random.default_rng(42)
    x = rng.normal(size=10_000)
    hdf5.write_h5(p, {"x": hdf5.dataset(x, compress=6, shuffle=shuffle,
                                        chunks=(1024,))})
    r = hdf5.read_h5(p)
    np.testing.assert_array_equal(r["x"][...], x)
    # compression actually happened (file smaller than raw+overhead)
    import os
    assert os.path.getsize(p) < x.nbytes


def test_roundtrip_chunked_empty_dataset(tmp_path):
    """A zero-size chunked dataset writes an UNDEF B-tree address
    (never-allocated storage) and reads back as an empty array —
    write_h5_points of an empty DataFrame must not crash."""
    p = str(tmp_path / "empty.h5")
    hdf5.write_h5(p, {"x": hdf5.dataset(np.empty(0, np.float64),
                                        compress=6, chunks=(1024,)),
                      "y": np.empty(0, np.int64)})
    r = hdf5.read_h5(p)
    assert r["x"][...].size == 0
    assert r["y"][...].size == 0


def test_roundtrip_chunked_2d_edge_chunks(tmp_path):
    p = str(tmp_path / "e.h5")
    z = np.arange(35.0).reshape(5, 7)
    hdf5.write_h5(p, {"z": hdf5.dataset(z, compress=1, chunks=(2, 3))})
    r = hdf5.read_h5(p)
    np.testing.assert_array_equal(r["z"][...], z)


def test_reader_tolerates_unknown_attr_and_missing_path(tmp_path):
    p = str(tmp_path / "f.h5")
    hdf5.write_h5(p, {"x": np.array([1.0])})
    r = hdf5.read_h5(p)
    with pytest.raises(KeyError):
        r["nope/deeper"]
    assert "x" in r and "nope" not in r
    got = hdf5.load_fields(p, ["x", "nope"])
    assert set(got) == {"x"}


def test_non_hdf5_file_rejected(tmp_path):
    p = tmp_path / "g.h5"
    p.write_bytes(b"definitely not hdf5")
    with pytest.raises(ValueError, match="signature"):
        hdf5.read_h5(str(p))


def test_latest_roundtrip_groups_attrs(tmp_path):
    """libver='latest': superblock v3, OHDR headers, compact link
    messages, v3 attributes — the structures HDF5 1.10+ emits."""
    p = str(tmp_path / "l1.h5")
    hdf5.write_h5(p, {
        "a": np.arange(10, dtype=np.float64),
        "g": {"nested": {"x": np.array([1, 2, 3], dtype=np.int32)},
              "__attrs__": {"units": "m", "count": 3, "scale": 1.5}},
    }, attrs={"title": "latest"}, libver="latest")
    with open(p, "rb") as fh:
        assert fh.read(9)[8] == 3  # superblock v3 actually written
    r = hdf5.read_h5(p)
    np.testing.assert_array_equal(r["a"][...], np.arange(10.0))
    np.testing.assert_array_equal(r["g/nested/x"][...], [1, 2, 3])
    assert r.attrs["title"] == "latest"
    assert r["g"].attrs["units"] == "m"
    assert r["g"].attrs["count"] == 3
    assert r["g"].attrs["scale"] == 1.5


def test_latest_single_chunk_and_fixed_array(tmp_path):
    """Layout v4 chunk indexes: single-chunk (1 chunk), fixed array
    (many chunks), both filtered and unfiltered."""
    rng = np.random.default_rng(11)
    x = rng.normal(size=5000)
    z = np.arange(35.0).reshape(5, 7)
    p = str(tmp_path / "l2.h5")
    hdf5.write_h5(p, {
        "single": hdf5.dataset(x, compress=6, chunks=(5000,)),
        "single_plain": hdf5.dataset(z, chunks=(5, 7)),
        "farr": hdf5.dataset(x, compress=4, shuffle=True, chunks=(256,)),
        "farr_plain": hdf5.dataset(z, chunks=(2, 3)),
        "empty": hdf5.dataset(np.empty(0, np.float64), compress=2,
                              chunks=(64,)),
    }, libver="latest")
    r = hdf5.read_h5(p)
    np.testing.assert_array_equal(r["single"][...], x)
    np.testing.assert_array_equal(r["single_plain"][...], z)
    np.testing.assert_array_equal(r["farr"][...], x)
    np.testing.assert_array_equal(r["farr_plain"][...], z)
    assert r["empty"][...].size == 0
    import os
    assert os.path.getsize(p) < 2 * x.nbytes + z.nbytes * 2 + 4096


def test_latest_fixed_array_paged(tmp_path, monkeypatch):
    """Paged fixed-array data block (chunk count > 2^page_bits)."""
    monkeypatch.setattr(hdf5, "_FA_PAGE_BITS", 2)  # 4 elements/page
    x = np.arange(1000, dtype=np.float32)
    p = str(tmp_path / "l3.h5")
    hdf5.write_h5(p, {"x": hdf5.dataset(x, compress=1, chunks=(37,)),
                      "y": hdf5.dataset(x, chunks=(37,))},
                  libver="latest")
    r = hdf5.read_h5(p)
    np.testing.assert_array_equal(r["x"][...], x)
    np.testing.assert_array_equal(r["y"][...], x)


def test_latest_dense_links(tmp_path):
    """A group over the compact-link threshold stores its links in a
    fractal heap + v2 B-tree name index (dense storage)."""
    tree = {f"ds_{i:03d}": np.full(3, float(i)) for i in range(50)}
    p = str(tmp_path / "l4.h5")
    hdf5.write_h5(p, {"big": tree}, libver="latest")
    buf = open(p, "rb").read()
    assert b"FRHP" in buf and b"BTHD" in buf  # dense path actually taken
    r = hdf5.read_h5(p)
    assert set(r["big"].keys()) == set(tree)
    for i in (0, 17, 49):
        np.testing.assert_array_equal(r[f"big/ds_{i:03d}"][...],
                                      np.full(3, float(i)))


def test_latest_dense_links_btree_depth1(tmp_path, monkeypatch):
    """Tiny B-tree nodes force a depth-1 name index (internal root +
    leaf splits) — the deepest shape the reader supports."""
    monkeypatch.setattr(hdf5, "_BT2_NODE_SIZE", 64)  # ~4 records/leaf
    tree = {f"d{i:02d}": np.array([float(i)]) for i in range(30)}
    p = str(tmp_path / "l5.h5")
    hdf5.write_h5(p, {"g": tree}, libver="latest")
    assert b"BTIN" in open(p, "rb").read()  # depth-1 tree written
    r = hdf5.read_h5(p)
    assert set(r["g"].keys()) == set(tree)
    for i in range(30):
        np.testing.assert_array_equal(r[f"g/d{i:02d}"][...], [float(i)])


def test_latest_dense_links_root_indirect(tmp_path, monkeypatch):
    """A link heap past one direct block grows into a root INDIRECT
    block over several direct blocks (doubling table, all-direct
    rows)."""
    orig = hdf5._write_dense_links
    monkeypatch.setattr(
        hdf5, "_write_dense_links",
        lambda out, names, bodies: orig(out, names, bodies,
                                        width=4, start_size=512,
                                        max_direct=1024))
    tree = {f"ds_{i:03d}": np.array([float(i)]) for i in range(60)}
    p = str(tmp_path / "l6.h5")
    hdf5.write_h5(p, {"g": tree}, libver="latest")
    buf = open(p, "rb").read()
    assert buf.count(b"FHIB") == 1      # root indirect, no nesting
    assert buf.count(b"FHDB") > 1       # several direct blocks
    r = hdf5.read_h5(p)
    assert set(r["g"].keys()) == set(tree)
    for i in (0, 31, 59):
        np.testing.assert_array_equal(r[f"g/ds_{i:03d}"][...],
                                      [float(i)])


def test_latest_dense_links_nested_indirect(tmp_path, monkeypatch):
    """Heap growth past the root's direct rows allocates NESTED
    indirect blocks (doubling-table rows >= max_direct_rows) — the
    recursive _map_indirect read path, previously a named
    NotImplementedError gap. Long names push the link heap past the
    8 KiB the tiny parameters' direct rows cover."""
    orig = hdf5._write_dense_links
    monkeypatch.setattr(
        hdf5, "_write_dense_links",
        lambda out, names, bodies: orig(out, names, bodies,
                                        width=4, start_size=512,
                                        max_direct=1024))
    tree = {f"n{i:03d}_" + "x" * 180: np.array([float(i)])
            for i in range(40)}
    p = str(tmp_path / "l7.h5")
    hdf5.write_h5(p, {"g": tree}, libver="latest")
    buf = open(p, "rb").read()
    assert buf.count(b"FHIB") >= 2      # root + nested indirect blocks
    r = hdf5.read_h5(p)
    assert set(r["g"].keys()) == set(tree)
    for name, v in tree.items():
        np.testing.assert_array_equal(r[f"g/{name}"][...], v)


def test_latest_granule_matches_earliest(tmp_path):
    """The same granule tree written in both format generations reads
    back identically — latest-format ICESat-2 reprocessings parse."""
    tree, _ = _atl06_tree(n=20)
    p0 = str(tmp_path / "v0.h5")
    p3 = str(tmp_path / "v3.h5")
    hdf5.write_h5(p0, tree)
    hdf5.write_h5(p3, tree, libver="latest")
    fields = ["gt1l/land_ice_segments/h_li",
              "gt2r/land_ice_segments/ground_track/x_atc",
              "gt3l/land_ice_segments/fit_statistics/dh_fit_dx"]
    a = hdf5.load_fields(p0, fields)
    b = hdf5.load_fields(p3, fields)
    assert set(a) == set(b) == set(fields)
    for f in fields:
        np.testing.assert_array_equal(a[f], b[f])
    r = hdf5.read_h5(p3)
    assert r["gt1l"].attrs["atlas_beam_type"] == "weak"
    assert r["gt1l"].attrs["atlas_spot_number"] == 1


def test_layout_v4_unsupported_indexes_raise_precisely():
    """Extensible-array / v2-B-tree chunk indexes (unlimited-maxshape
    datasets) name themselves and the h5py escape hatch."""
    base = bytes([4, 2, 0, 1, 8]) + (64).to_bytes(8, "little")
    with pytest.raises(NotImplementedError, match="extensible-array"):
        hdf5._parse_layout_v4(base + bytes([4]))
    with pytest.raises(NotImplementedError, match="v2 B-tree chunk"):
        hdf5._parse_layout_v4(base + bytes([5]))


def _atl06_tree(n=50):
    """Official-layout granule tree: gtXY/land_ice_segments[/group]/
    field, chunked+gzip like real products, with planted fill values."""
    rng = np.random.default_rng(7)
    tree: dict = {}
    for pair in (1, 2, 3):
        for side in "lr":
            h_li = rng.normal(1000, 50, n)
            h_li[::7] = -9999.0  # fill
            seg = {
                "latitude": rng.uniform(-80, -70, n),
                "longitude": rng.uniform(-180, 180, n),
                "h_li": hdf5.dataset(h_li, compress=4, shuffle=True,
                                     chunks=(16,)),
                "h_li_sigma": rng.uniform(0, 1, n),
                "atl06_quality_summary": rng.integers(0, 2, n).astype(float),
                "segment_id": np.arange(n, dtype=float),
                "delta_time": np.sort(rng.uniform(0, 1e6, n)),
                "ground_track": {"x_atc": np.sort(rng.uniform(0, 2e4, n)),
                                 "y_atc": rng.uniform(-100, 100, n),
                                 "seg_azimuth": rng.uniform(0, 360, n)},
                "fit_statistics": {
                    "dh_fit_dx": rng.normal(0, 0.1, n),
                    "dh_fit_dy": rng.normal(0, 0.1, n),
                    "h_robust_sprd": rng.uniform(0, 2, n),
                    "snr_significance": rng.uniform(0, 0.05, n),
                    "n_fit_photons": rng.integers(5, 400, n).astype(float),
                    "w_surface_window_final": rng.uniform(1, 10, n),
                },
            }
            spot = (pair - 1) * 2 + (1 if side == "l" else 2)
            tree[f"gt{pair}{side}"] = {
                "land_ice_segments": seg,
                "__attrs__": {
                    "atlas_spot_number": spot,
                    "atlas_beam_type": "weak" if side == "l" else "strong"}}
    return tree, n


def _synthetic_atl06(tmp_path, n=50, libver=None):
    tree, n = _atl06_tree(n)
    path = str(tmp_path / "ATL06_20190101_synthetic.h5")
    hdf5.write_h5(path, tree, libver=libver)
    return path, n


def test_convert_atl06_latest_format_granule(spark, tmp_path):
    """The S2 converter ingests a latest-format (superblock v3 / OHDR)
    granule through the same distributed scan path — the codec runs
    inside executor tasks, so the new-format reader must work there,
    not just driver-side."""
    path, n = _synthetic_atl06(tmp_path, n=25, libver="latest")
    out = str(tmp_path / "atl06_latest_parquet")
    converters.convert_atl06(spark, path, out, rgt=7, cycle_number=2)
    df = spark.read.parquet(out)
    assert df.count() == 6 * n
    assert df.groupBy("BP", "LR").count().count() == 6
    from pyspark.sql import functions as F
    assert df.where(F.col("h_li").isNull()).count() == 6 * ((n + 6) // 7)
    npx = {(r.beam_type, r.n_pixels)
           for r in df.select("beam_type", "n_pixels").distinct().collect()}
    assert npx == {("weak", 4.0), ("strong", 16.0)}


def test_convert_atl06_end_to_end(spark, tmp_path):
    path, n = _synthetic_atl06(tmp_path)
    out = str(tmp_path / "atl06_parquet")
    converters.convert_atl06(spark, path, out, rgt=123, cycle_number=4)
    df = spark.read.parquet(out)
    assert df.count() == 6 * n  # 3 pairs x 2 beams
    assert set(df.columns) >= {"h_li", "x_atc", "dh_fit_dx", "BP", "LR",
                               "rgt", "cycle_number", "source_file"}
    from pyspark.sql import functions as F
    # fill -> NULL (every 7th h_li row per beam)
    assert df.where(F.col("h_li").isNull()).count() == 6 * ((n + 6) // 7)
    assert df.select("rgt").distinct().collect()[0].rgt == 123
    assert df.groupBy("BP", "LR").count().count() == 6
    # derived per-beam columns from group attrs (ATL06_data.py:145-154)
    assert df.select("spot").distinct().count() == 6
    npx = {(r.beam_type, r.n_pixels)
           for r in df.select("beam_type", "n_pixels").distinct().collect()}
    assert npx == {("weak", 4.0), ("strong", 16.0)}


def test_convert_qfit_end_to_end(spark, tmp_path):
    n = 40
    rng = np.random.default_rng(3)
    plain = str(tmp_path / "ATM1B_x_20140523_123456.h5")
    hdf5.write_h5(plain, {
        "latitude": rng.uniform(60, 80, n),
        "longitude": rng.uniform(-60, -30, n),
        "elevation": hdf5.dataset(rng.normal(500, 10, n), compress=2,
                                  chunks=(13,)),
        "instrument_parameters": {
            "azimuth": rng.uniform(0, 360, n),
            "rel_time": np.sort(rng.uniform(0, 3600, n))},
    })
    out = str(tmp_path / "qfit_parquet")
    converters.convert_qfit(spark, plain, out)
    df = spark.read.parquet(out)
    assert df.count() == n
    row = df.orderBy("days_J2K").first()
    # t0 from full filename timestamp: 2014-05-23 12:34:56
    from datetime import datetime
    t0 = datetime(2014, 5, 23, 12, 34, 56) - datetime(2000, 1, 1)
    assert row.days_J2K >= t0.days + t0.seconds / 86400.0


def test_distributed_point_scan_many_granules(spark, tmp_path):
    import pandas as pd
    paths = []
    for i in range(3):
        p = str(tmp_path / f"g{i}.h5")
        hdf5.write_h5(p, {"latitude": np.full(5, float(i)),
                          "h": np.arange(5, dtype=float)})
        paths.append(p)

    def loader(path: str) -> pd.DataFrame:
        d = hdf5.load_fields(path, ["latitude", "h"])
        return pd.DataFrame({"latitude": d["latitude"], "h": d["h"]})

    df = converters.distributed_point_scan(
        spark, paths, loader, "latitude double, h double")
    assert df.count() == 15
    assert df.select("source_file").distinct().count() == 3
    # the scan itself is a narrow Arrow-batched map over the paths
    # frame (one granule per task); the only exchange is the explicit
    # path-distribution repartition upstream of it
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan


def test_write_h5_points_sink_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, float(i) * 2.5, float(i % 3)) for i in range(100)],
        "row_id long, h double, q double")
    p = str(tmp_path / "points.h5")
    hdf5.write_h5_points(df, p, group="data", attrs={"source": "test"})
    r = hdf5.read_h5(p)
    np.testing.assert_array_equal(r["data/row_id"][...], np.arange(100))
    np.testing.assert_array_equal(r["data/h"][...], np.arange(100) * 2.5)
    assert r.attrs["source"] == "test"


def test_write_h5_tile_sink_groups_and_sort(spark, tmp_path):
    rows = [(bx * 10000, by * 10000, float(t), float(bx + by + t))
            for bx in (1, 2) for by in (3, 4) for t in (5.0, 1.0, 3.0)]
    df = spark.createDataFrame(
        rows, "bin_x long, bin_y long, delta_time double, h double")
    p = str(tmp_path / "tile.h5")
    hdf5.write_h5_tile(df, p)
    r = hdf5.read_h5(p)
    assert set(r.keys()) == {"10000E_30000N", "10000E_40000N",
                             "20000E_30000N", "20000E_40000N"}
    # in-group time sort (ATL06_tiles.py:81-98)
    t = r["10000E_30000N/delta_time"][...]
    np.testing.assert_array_equal(t, np.sort(t))


def test_write_h5_tile_guard_rejects_non_tile_sized_frame(spark, tmp_path):
    """The single-file tile sink collects to the driver by contract;
    a frame above max_rows must fail loudly BEFORE collecting."""
    big = (spark.range(0, 1000)
           .selectExpr("id % 3 * 10000 AS bin_x", "0L AS bin_y",
                       "CAST(id AS DOUBLE) AS delta_time",
                       "1.0 AS h"))
    p = str(tmp_path / "guard.h5")
    with pytest.raises(ValueError, match="not tile-sized"):
        hdf5.write_h5_tile(big, p, max_rows=999)
    import os
    assert not os.path.exists(p)
    # at or below the cap (and with the guard off) it writes normally
    hdf5.write_h5_tile(big, p, max_rows=1000)
    assert "0E_0N" in hdf5.read_h5(p)


def test_hdf5_roundtrip_property(tmp_path):
    """Property: any tree of fixed/float arrays survives write->read
    bit-exactly, across dtypes, ranks, chunkings, and filters."""
    from hypothesis import given, settings, strategies as st

    dtypes = st.sampled_from(["f8", "f4", "i8", "i4", "i2", "u1"])

    @st.composite
    def arrays(draw):
        dt = np.dtype(draw(dtypes))
        rank = draw(st.integers(1, 3))
        shape = tuple(draw(st.integers(1, 9)) for _ in range(rank))
        n = int(np.prod(shape))
        if dt.kind == "f":
            vals = draw(st.lists(
                st.floats(allow_nan=False, allow_infinity=True,
                          width=32 if dt.itemsize == 4 else 64),
                min_size=n, max_size=n))
        else:
            info = np.iinfo(dt)
            vals = draw(st.lists(st.integers(info.min, info.max),
                                 min_size=n, max_size=n))
        arr = np.array(vals, dtype=dt).reshape(shape)
        if draw(st.booleans()):
            chunks = tuple(draw(st.integers(1, s + 2)) for s in shape)
            return hdf5.dataset(arr, compress=draw(st.integers(0, 9)),
                                shuffle=draw(st.booleans()),
                                chunks=chunks)
        return arr

    @settings(max_examples=25, deadline=None)
    @given(st.dictionaries(
        st.text(alphabet="abcdefgh_123", min_size=1, max_size=12),
        arrays(), min_size=1, max_size=5),
        st.sampled_from([None, "latest"]))
    def check(tree, libver):
        p = str(tmp_path / "prop.h5")
        hdf5.write_h5(p, tree, libver=libver)
        r = hdf5.read_h5(p)
        for name, spec in tree.items():
            want = spec.data if isinstance(spec, hdf5._Dataset) else np.asarray(spec)
            got = r[name][...]
            np.testing.assert_array_equal(got, want)
            assert got.dtype == want.dtype.newbyteorder("=") or \
                got.dtype == want.dtype

    check()


def test_reader_rejects_corrupt_structures(tmp_path):
    """Truncated or bit-flipped files fail with exceptions, never wrong
    data or hangs (granule fetches are retried at the task level)."""
    import struct
    base = str(tmp_path / "ok.h5")
    x = np.arange(500, dtype=np.float64)
    hdf5.write_h5(base, {"x": hdf5.dataset(x, compress=5, chunks=(100,))})
    buf = bytearray(open(base, "rb").read())

    # truncation at every 25%% boundary
    for frac in (0.2, 0.5, 0.8):
        t = str(tmp_path / f"t{int(frac*10)}.h5")
        open(t, "wb").write(bytes(buf[:int(len(buf) * frac)]))
        with pytest.raises(Exception):
            g = hdf5.read_h5(t)
            g["x"][...]

    # corrupt the group B-tree signature
    c = bytearray(buf)
    i = bytes(c).index(b"TREE")
    c[i:i + 4] = b"XXXX"
    bad = str(tmp_path / "badsig.h5")
    open(bad, "wb").write(bytes(c))
    with pytest.raises(Exception):
        hdf5.read_h5(bad)["x"][...]

    # corrupt compressed chunk payload -> zlib error, not silent junk
    c = bytearray(buf)
    tail = len(c) - 40
    c[tail:tail + 8] = b"\xde\xad\xbe\xef\xde\xad\xbe\xef"
    badz = str(tmp_path / "badz.h5")
    open(badz, "wb").write(bytes(c))
    with pytest.raises(Exception):
        hdf5.read_h5(badz)["x"][...]

    # superblock version from the future (v2/3 are now supported)
    c = bytearray(buf)
    c[8] = 7
    v7 = str(tmp_path / "v7.h5")
    open(v7, "wb").write(bytes(c))
    with pytest.raises(NotImplementedError, match="superblock"):
        hdf5.read_h5(v7)
    # a v0 body mislabeled v3 must fail, never silently misparse
    c[8] = 3
    v3 = str(tmp_path / "v3bad.h5")
    open(v3, "wb").write(bytes(c))
    with pytest.raises(Exception):
        hdf5.read_h5(v3)["x"][...]


def test_latest_reader_rejects_corrupt_structures(tmp_path):
    """Latest-format files: truncation and signature corruption fail
    with exceptions, never wrong data or hangs."""
    import struct
    base = str(tmp_path / "lok.h5")
    x = np.arange(500, dtype=np.float64)
    hdf5.write_h5(base, {"g": {"x": hdf5.dataset(x, compress=5,
                                                 chunks=(100,))}},
                  libver="latest")
    buf = bytearray(open(base, "rb").read())
    for frac in (0.2, 0.5, 0.8):
        t = str(tmp_path / f"lt{int(frac * 10)}.h5")
        open(t, "wb").write(bytes(buf[:int(len(buf) * frac)]))
        with pytest.raises(Exception):
            hdf5.read_h5(t)["g/x"][...]
    for sig in (b"OHDR", b"FAHD", b"FADB"):
        c = bytearray(buf)
        i = bytes(c).index(sig)
        c[i:i + 4] = b"XXXX"
        bad = str(tmp_path / f"bad{sig.decode()}.h5")
        open(bad, "wb").write(bytes(c))
        with pytest.raises(Exception):
            hdf5.read_h5(bad)["g/x"][...]
    # corrupt a dense group's heap/btree signatures
    dense = str(tmp_path / "dense.h5")
    hdf5.write_h5(dense, {"g": {f"d{i}": np.array([1.0])
                                for i in range(20)}}, libver="latest")
    dbuf = bytearray(open(dense, "rb").read())
    for sig in (b"FRHP", b"BTHD", b"BTLF"):
        c = bytearray(dbuf)
        i = bytes(c).index(sig)
        c[i:i + 4] = b"YYYY"
        bad = str(tmp_path / f"dbad{sig.decode()}.h5")
        open(bad, "wb").write(bytes(c))
        with pytest.raises(Exception):
            g = hdf5.read_h5(bad)
            g["g/d0"][...]


def test_surfmask_scan_semantics(spark, tmp_path):
    """S6 mosaic scan: tile assembly, x3 subsample, land bit,
    hemisphere subset, stereo reproject (read_surfmask.py:146-242)."""
    from pointdatabase_spark.sources import surfmask
    p = str(tmp_path / "mosaic.h5")
    surfmask.write_synthetic_mosaic(p)
    for hemi in (-1, 1):
        x, y, z = surfmask.load_surfmask(p, hemisphere=hemi)
        assert x.shape == y.shape == z.shape and z.dtype == bool
        assert z.size > 0
        # every kept point is inside the hemisphere cap: radius from
        # the pole is bounded by the |lat|=60 stereo circle
        r = np.hypot(x, y)
        from pointdatabase_spark.functions import crs
        rmax = np.hypot(*crs.polar_stereo_forward(
            np.array([60.0 * hemi]), np.array([0.0]), hemi))
        assert (r <= rmax[0] + 1.0).all()
    xs, _, _ = surfmask.load_surfmask(p, hemisphere=-1)
    df = surfmask.surfmask_points(spark, p, hemisphere=-1)
    assert df.count() == xs.size
    assert set(df.columns) == {"x", "y", "land"}
    # land fraction matches the planted bit distribution (bit0 of 0..7
    # uniform -> about half)
    frac = df.where("land").count() / df.count()
    assert 0.3 < frac < 0.7


def test_surfmask_incomplete_mosaic_no_phantom_rows(tmp_path):
    """Grid cells not covered by any tile must be dropped, not kept as
    +inf-latitude phantom rows feeding inf into the stereo projection
    (cells init to NaN, which fails both hemisphere thresholds)."""
    from pointdatabase_spark.sources import surfmask
    p = str(tmp_path / "partial.h5")
    # 16 of 18 tiles: the whole top lat row (covering lat 30..90) ends
    # up unplaced, so hemisphere=+1 (lat >= 60) has zero real coverage
    surfmask.write_synthetic_mosaic(p, max_tiles=16)
    x, y, z = surfmask.load_surfmask(p, hemisphere=1)
    assert np.isfinite(x).all() and np.isfinite(y).all()
    assert x.size == 0
    # the southern hemisphere is fully covered and unaffected
    xs, ys, _ = surfmask.load_surfmask(p, hemisphere=-1)
    assert xs.size > 0 and np.isfinite(xs).all() and np.isfinite(ys).all()


def test_array_attributes_roundtrip(tmp_path):
    p = str(tmp_path / "attrs.h5")
    hdf5.write_h5(p, {"d": np.array([1.0]),
                      "g": {"__attrs__": {
                          "f": np.array([1.5, 2.5, -3.5]),
                          "i": np.array([3, 1, 2]),
                          "s": np.array(["alpha", "b", "gamma77"])}}})
    r = hdf5.read_h5(p)
    assert list(r["g"].attrs["f"]) == [1.5, 2.5, -3.5]
    assert list(r["g"].attrs["i"]) == [3, 1, 2]
    assert list(r["g"].attrs["s"]) == ["alpha", "b", "gamma77"]


def test_convert_atl11_end_to_end(spark, tmp_path):
    """ATL11 roundtrip (sources/atl11.py; reference geo_index.py:
    245-259 dispatch): per-pair ptX groups with N-vector reference
    points and N x C per-cycle corrected-height matrices, written by
    the stdlib codec, read back and exploded to tidy
    (ref_pt, cycle_number) rows with fill -> NULL."""
    from pointdatabase_spark.sources import atl11
    n, n_cyc = 25, 4
    rng = np.random.default_rng(11)
    tree = {}
    for p in (1, 2, 3):
        h = rng.normal(500, 20, (n, n_cyc))
        h[::5, 1] = -9999.0                      # invalid cycle fills
        tree[f"pt{p}"] = {
            "cycle_number": np.arange(3, 3 + n_cyc, dtype=np.float64),
            "corrected_h": {
                "ref_pt": np.arange(n, dtype=np.float64) * 20 + p,
                "latitude": rng.uniform(-80, -70, n),
                "longitude": rng.uniform(-60, -30, n),
                "delta_time": rng.uniform(0, 1e8, (n, n_cyc)),
                "h_corr": h,
                "h_corr_sigma": rng.uniform(0.01, 0.2, (n, n_cyc)),
                "quality_summary": np.zeros((n, n_cyc)),
            },
            "cycle_stats": {
                "ATL06_summary_zero_count":
                    rng.integers(0, 5, (n, n_cyc)).astype(np.float64)},
            "ref_surf": {"x_atc": rng.uniform(0, 1e5, n),
                         "y_atc": rng.uniform(-100, 100, n)},
        }
    path = str(tmp_path / "ATL11_synth.h5")
    hdf5.write_h5(path, tree)
    out = str(tmp_path / "atl11_parquet")
    atl11.convert_atl11(spark, path, out)
    df = spark.read.parquet(out)
    assert df.count() == 3 * n * n_cyc
    assert set(df.columns) >= {"ref_pt", "cycle_number", "h_corr",
                               "h_corr_sigma", "latitude", "longitude",
                               "x_atc", "y_atc", "pair", "source_file"}
    from pyspark.sql import functions as F
    # real cycle ids from the granule's cycle_number vector
    cyc = sorted(r.cycle_number for r in
                 df.select("cycle_number").distinct().collect())
    assert cyc == [3.0, 4.0, 5.0, 6.0]
    # fill -> NULL: every 5th point's second cycle, per pair
    assert df.where(F.col("h_corr").isNull()).count() == 3 * ((n + 4) // 5)
    # per-point vectors broadcast across cycles
    assert df.groupBy("pair", "ref_pt").count().where(
        F.col("count") != n_cyc).count() == 0
    # cycle_collapse over the converted tidy rows: n_cycles drops the
    # planted invalid cycle, dh = h(last valid) - h(first valid)
    stats = atl11.cycle_collapse(df)
    got = {(r.pair, r.ref_pt): r.n_cycles for r in stats.collect()}
    assert got[(1, 1.0)] == n_cyc - 1          # ref_pt row 0: one fill
    assert got[(1, 21.0)] == n_cyc             # row 1: no fill


def test_atl11_crossing_track_roundtrip(spark, tmp_path):
    """crossing_track_data reads as its own tidy point list and the
    crossover difference joins it against the along-track series on
    (pair, ref_pt, cycle_number) — reference get_xovers/ATL11_plot
    semantics (IndexPicker.py:137-151)."""
    from pointdatabase_spark.sources import atl11
    n, n_cyc, nx = 10, 3, 7
    rng = np.random.default_rng(7)
    h = rng.normal(100, 5, (n, n_cyc))
    tree = {"pt2": {
        "cycle_number": np.arange(1, 1 + n_cyc, dtype=np.float64),
        "corrected_h": {
            "ref_pt": np.arange(n, dtype=np.float64),
            "latitude": rng.uniform(-80, -70, n),
            "longitude": rng.uniform(-60, -30, n),
            "delta_time": rng.uniform(0, 1e8, (n, n_cyc)),
            "h_corr": h,
            "h_corr_sigma": rng.uniform(0.01, 0.2, (n, n_cyc)),
            "quality_summary": np.zeros((n, n_cyc))},
        "crossing_track_data": {
            "ref_pt": np.arange(nx, dtype=np.float64),
            "delta_time": rng.uniform(0, 1e8, nx),
            "h_corr": h[:nx, 1] + 2.5,       # crossing at cycle 2
            "h_corr_sigma": rng.uniform(0.01, 0.2, nx),
            "rgt": np.full(nx, 777.0),
            "cycle_number": np.full(nx, 2.0),
            "spot_crossing": rng.integers(1, 7, nx).astype(np.float64),
            "along_track_rss": rng.uniform(0, 1, nx),
            "atl06_quality_summary": np.zeros(nx)},
    }}
    path = str(tmp_path / "ATL11_xing.h5")
    hdf5.write_h5(path, tree)
    data = atl11.load_atl11_h5(path)
    tidy = atl11.atl11_frame(data, 2)
    xing = atl11.atl11_xing_frame(data, 2)
    assert len(xing) == nx and set(xing.pair) == {2}
    from pointdatabase_spark.sources.converters import ingest_frame
    d = atl11.xover_difference(ingest_frame(spark, tidy, path),
                               ingest_frame(spark, xing, path))
    rows = {r.ref_pt: r.dh_xo for r in d.collect()}
    assert len(rows) == nx
    assert all(abs(v - 2.5) < 1e-9 for v in rows.values())
    assert {r.xing_rgt for r in d.collect()} == {777.0}


def test_write_h5_tiles_distributed_bitwise_matches_driver(
        spark, tmp_path):
    """The applyInPandas per-tile fan-out must produce BYTE-identical
    H5 files to the driver-side single-file writer run tile-by-tile
    (VERDICT r9 #2 done-criterion), plus a correct summary."""
    rows = []
    t = 0
    for tx in (0, 1):
        for ty in (5, 6):
            for bx in (tx * 100000, tx * 100000 + 10000):
                for by in (ty * 100000, ty * 100000 + 10000):
                    for _ in range(7):
                        t += 1
                        rows.append((tx, ty, bx, by, float(t),
                                     float(t) * 0.5))
    df = spark.createDataFrame(
        rows, "tile_x long, tile_y long, bin_x long, bin_y long, "
              "delta_time double, h double").repartition(8)
    dist_dir = tmp_path / "dist"
    summary = hdf5.write_h5_tiles(df, str(dist_dir))
    assert {(r.tile_x, r.tile_y, r.n_rows) for r in summary} == {
        (0, 5, 28), (0, 6, 28), (1, 5, 28), (1, 6, 28)}
    for tx in (0, 1):
        for ty in (5, 6):
            one = (df.where(f"tile_x = {tx} AND tile_y = {ty}")
                   .drop("tile_x", "tile_y"))
            ref = tmp_path / f"ref_E{tx}_N{ty}.h5"
            hdf5.write_h5_tile(one, str(ref), max_rows=None)
            got = (dist_dir / f"E{tx}_N{ty}.h5").read_bytes()
            assert got == ref.read_bytes(), (tx, ty)
    # the files are real HDF5: spot-read one group back
    r = hdf5.read_h5(str(dist_dir / "E1_N6.h5"))
    g = r["100000E_600000N"]
    dt = g["delta_time"][...]
    np.testing.assert_array_equal(dt, np.sort(dt))
    assert g["h"][...].tolist() == (dt * 0.5).tolist()


def test_write_h5_tiles_null_order_column_parity(spark, tmp_path):
    """A NULL in the order column must land FIRST on both paths
    (review regression: pandas default na_position='last' vs Spark
    asc-nulls-first broke byte-identity)."""
    rows = [(0, 0, 0, 0, 2.0, 1.0), (0, 0, 0, 0, None, 2.0),
            (0, 0, 0, 0, 1.0, 3.0)]
    df = spark.createDataFrame(
        rows, "tile_x long, tile_y long, bin_x long, bin_y long, "
              "delta_time double, h double").repartition(3)
    dist = tmp_path / "dist"
    hdf5.write_h5_tiles(df, str(dist))
    ref = tmp_path / "ref.h5"
    hdf5.write_h5_tile(df.drop("tile_x", "tile_y"), str(ref),
                       max_rows=None)
    assert (dist / "E0_N0.h5").read_bytes() == ref.read_bytes()
    r = hdf5.read_h5(str(dist / "E0_N0.h5"))
    h = r["0E_0N/h"][...]
    assert h.tolist() == [2.0, 3.0, 1.0]  # null-time row first
