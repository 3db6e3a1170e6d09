"""Property-based tests (hypothesis): engine operators vs pure-Python
implementations of the reference-cited semantics, on adversarial
random inputs (ties, overlaps, duplicates) that fixed fixtures miss.

Each example runs a real local Spark job, so example counts are kept
small — the point is the semantic edge cases, not volume.
"""

from __future__ import annotations

import math
from collections import defaultdict

import numpy as np

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pointdatabase_spark.operators import runs as runs_op
from pointdatabase_spark.operators import spatial
from pointdatabase_spark.streaming import sessions as sessions_op

_SETTINGS = dict(max_examples=6, deadline=None,
                 suppress_health_check=list(HealthCheck))


# -------------------------------------------------------------------
# O3 run coalescing vs the reference merge rule (geo_index.py:410-429):
# sort runs by start, merge when start <= prev_end + 1 (cumulative max).
# -------------------------------------------------------------------

runs_lists = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 60), st.integers(0, 15)),
    min_size=1, max_size=25)


def _ref_merge(triples):
    byf = defaultdict(set)
    for f, s, ln in triples:
        byf[f].add((s, s + ln))
    out = []
    for f, rs in byf.items():
        rs = sorted(rs)
        cs, ce, n = rs[0][0], rs[0][1], 1
        for s, e in rs[1:]:
            if s <= ce + 1:
                ce = max(ce, e)
                n += 1
            else:
                out.append((f, cs, ce, n))
                cs, ce, n = s, e, 1
        out.append((f, cs, ce, n))
    return sorted(out)


@settings(**_SETTINGS)
@given(runs_lists)
def test_coalesce_runs_matches_reference_merge(spark, triples):
    rows = sorted({(f, s, s + ln) for f, s, ln in triples})
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["file_id", "run_start", "run_end"]))
    got = sorted((r.file_id, r.run_start, r.run_end, r.n_merged)
                 for r in runs_op.coalesce_runs(df, ["file_id"]).collect())
    assert got == _ref_merge(triples)


# -------------------------------------------------------------------
# A1 blockmedian vs the reference tie rule (pt_blockmedian.py:37-57):
# per floor-cell, z-sorted (stable by input order); odd → middle row,
# even → mean of the two middle rows (x and y averaged too).
# Small-integer z values force heavy ties.
# -------------------------------------------------------------------

points = st.lists(
    st.tuples(st.integers(-9, 9), st.integers(-9, 9), st.integers(0, 3)),
    min_size=1, max_size=40)


def _ref_blockmedian(rows, delta, tie_rule="reference"):
    cells = defaultdict(list)
    for rid, (x, y, z) in enumerate(rows):
        cells[(math.floor(x / delta), math.floor(y / delta))].append(
            (z, rid, x, y))
    out = []
    for (cx, cy), rs in cells.items():
        rs.sort()  # by z, then input row id — the stable argsort
        n = len(rs)
        if n % 2:
            if tie_rule == "reference":
                # reference odd rule (pt_blockmedian.py:39,51): int(n/2-1),
                # clamped at 0 — one BELOW the true middle for n >= 3
                z, _, x, y = rs[max(n // 2 - 1, 0)]
            else:
                # true middle: 0-based index (n-1)/2
                z, _, x, y = rs[(n - 1) // 2]
            out.append((cx, cy, float(x), float(y), float(z)))
        else:
            a, b = rs[n // 2 - 1], rs[n // 2]
            out.append((cx, cy, (a[2] + b[2]) / 2.0,
                        (a[3] + b[3]) / 2.0, (a[0] + b[0]) / 2.0))
    return sorted(out)


def _check_blockmedian(spark, rows, tie_rule):
    pdf = pd.DataFrame(
        [(float(x), float(y), float(z), i)
         for i, (x, y, z) in enumerate(rows)],
        columns=["x", "y", "z", "row_id"])
    df = spark.createDataFrame(pdf)
    got = sorted(
        (r.cell_x, r.cell_y, r.x, r.y, r.z)
        for r in spatial.blockmedian(df, 5.0, order_col="row_id",
                                     tie_rule=tie_rule).collect())
    exp = _ref_blockmedian(rows, 5.0, tie_rule)
    assert len(got) == len(exp)
    for g, e in zip(got, exp):
        assert g[:2] == e[:2]
        assert all(math.isclose(a, b, abs_tol=1e-12)
                   for a, b in zip(g[2:], e[2:]))


@settings(**_SETTINGS)
@given(points)
def test_blockmedian_matches_reference_tie_rule(spark, rows):
    _check_blockmedian(spark, rows, "reference")


@settings(**_SETTINGS)
@given(points)
def test_blockmedian_true_median_tie_rule(spark, rows):
    _check_blockmedian(spark, rows, "true_median")


def test_blockmedian_rules_diverge_on_odd_cells(spark):
    """n=3 cell: reference rule returns the MINIMUM-z row (the upstream
    quirk), true_median the actual middle row."""
    df = spark.createDataFrame(
        pd.DataFrame({"x": [1.0, 1.0, 1.0], "y": [1.0, 1.0, 1.0],
                      "z": [10.0, 20.0, 30.0], "row_id": [0, 1, 2]}))
    ref = spatial.blockmedian(df, 5.0, order_col="row_id").collect()[0]
    tru = spatial.blockmedian(df, 5.0, order_col="row_id",
                              tie_rule="true_median").collect()[0]
    assert ref.z == 10.0 and tru.z == 20.0


# -------------------------------------------------------------------
# Sessionization vs a direct single-pass implementation.
# -------------------------------------------------------------------

events = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 1000)),
    min_size=1, max_size=40)


def _ref_sessions(evts, gap):
    byu = defaultdict(list)
    for u, t in evts:
        byu[u].append(t)
    out = []
    for u, ts in byu.items():
        ts.sort()
        sid, start, last, n = 1, ts[0], ts[0], 1
        for t in ts[1:]:
            if t - last > gap:
                out.append((u, sid, start, last, n))
                sid += 1
                start, n = t, 0
            last = t
            n += 1
        out.append((u, sid, start, last, n))
    return sorted(out)


@settings(**_SETTINGS)
@given(events)
def test_sessionize_matches_reference(spark, evts):
    df = spark.createDataFrame(
        pd.DataFrame([(u, t, 1.0) for u, t in evts],
                     columns=["user_id", "tus", "value"]))
    got = sorted((r.user_id, r.session_id, r.session_start,
                  r.session_end, r.n_events)
                 for r in sessions_op.sessionize(df, 50).collect())
    assert got == _ref_sessions(evts, 50)


# -------------------------------------------------------------------
# F1 CRS transform: cross-engine agreement and round-straddle margin.
# The declared crs_polar_stereo query hash-compares integer-meter
# output; these assertions justify that quantization (queries.py
# comment) — values stay far from meter rounding boundaries relative
# to the NumPy-vs-DuckDB libm ulp spread, and raw agreement is sub-mm.
# -------------------------------------------------------------------


def test_crs_round_straddle_margin():
    import duckdb
    import numpy as np
    from pointdatabase_spark.functions import crs

    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01",
                   "/root/testdata/sf0.1"):
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW lineitem AS SELECT * FROM "
            f"read_parquet('{sf_dir}/lineitem.parquet')")
        ll = con.execute("""
            SELECT CAST(60 AS DOUBLE) + CAST(l_partkey % 3000 AS DOUBLE) / 100 AS lat,
                   CAST(-180 AS DOUBLE) + CAST(l_orderkey % 36000 AS DOUBLE) / 100 AS lon
            FROM lineitem""").fetchnumpy()
        xs, ys = crs.polar_stereo_forward(ll["lat"], ll["lon"], 1)
        xe, ye = crs.oracle_sql_exprs(1)
        d = con.execute(f"""
            WITH ll AS (
              SELECT CAST(60 AS DOUBLE) + CAST(l_partkey % 3000 AS DOUBLE) / 100 AS lat,
                     CAST(-180 AS DOUBLE) + CAST(l_orderkey % 36000 AS DOUBLE) / 100 AS lon
              FROM lineitem)
            SELECT {xe} AS x, {ye} AS y FROM ll""").fetchnumpy()
        spread = max(np.abs(xs - d["x"]).max(), np.abs(ys - d["y"]).max())
        # sub-mm cross-engine agreement on the raw doubles
        assert spread < 1e-6, spread
        # integer-meter margin: no value within 100x the ulp spread of
        # a 0.5 m rounding boundary (so round-then-hash cannot straddle)
        for v in (xs, ys):
            margin = np.abs(v - np.floor(v) - 0.5).min()
            assert margin > 100 * max(spread, 1e-9), (sf_dir, margin)


# -------------------------------------------------------------------
# Transverse Mercator (UTM) — the Krüger series is pinned four ways:
# published WGS84 constants, the closed-form spherical limit, a
# forward∘inverse identity, and cross-engine straddle margins for the
# integer-meter quantization of the declared crs_utm query.
# -------------------------------------------------------------------


def test_tmerc_published_constants():
    import numpy as np
    from pointdatabase_spark.functions import crs
    # rectifying radius and quarter meridian (WGS84, published values)
    assert abs(crs.A1 - 6367449.145823) < 1e-5
    assert abs(crs.A1 * np.pi / 2 - 10001965.7293) < 1e-3
    # central meridian: easting exactly false-easting, northing =
    # k0 x meridian arc; arc to 45N is the published 4984944.378 m
    x, y = crs.tmerc_forward(np.array([45.0]), np.array([9.0]), 9.0)
    assert x[0] == 500000.0
    assert abs(y[0] - 0.9996 * 4984944.378) < 1e-3


def test_tmerc_spherical_limit(monkeypatch):
    """With n=0/e=0 the series must collapse to the exact closed-form
    spherical transverse Mercator — pins the plumbing around the
    series independently of the coefficients."""
    import numpy as np
    import pointdatabase_spark.functions.crs as m
    monkeypatch.setattr(m, "_E", 0.0)
    monkeypatch.setattr(m, "ALPHA", (0.0,) * 6)
    monkeypatch.setattr(m, "A1", m.WGS84_A)
    lat = np.array([-61.2, -5.0, 0.0, 37.3, 71.8])
    lon = np.array([-4.9, 2.0, 4.2, -3.3, 0.7])
    x, y = m.tmerc_forward(lat, lon, 0.0, k0=1.0, x0=0.0, y0=0.0)
    R, phi, lam = m.WGS84_A, np.radians(lat), np.radians(lon)
    np.testing.assert_allclose(
        x, R * np.arctanh(np.sin(lam) * np.cos(phi)), atol=1e-9)
    np.testing.assert_allclose(
        y, R * np.arctan2(np.tan(phi), np.cos(lam)), atol=1e-9)


def test_tmerc_roundtrip_property():
    import numpy as np
    from pointdatabase_spark.functions import crs
    rng = np.random.default_rng(2)
    lat = rng.uniform(-80, 84, 50_000)
    lon0 = -75.0
    lon = lon0 + rng.uniform(-3, 3, 50_000)  # in-zone longitudes
    x, y = crs.tmerc_forward(lat, lon, lon0)
    la2, lo2 = crs.tmerc_inverse(x, y, lon0)
    assert np.abs(la2 - lat).max() < 1e-12
    assert np.abs(lo2 - lon).max() < 1e-12
    # south-zone false northing
    xs, ys = crs.tmerc_forward(lat, lon, lon0, y0=1e7)
    np.testing.assert_allclose(ys - y, 1e7)


def test_utm_round_straddle_margin():
    """crs_utm hash-compares integer-meter output; assert raw
    cross-engine agreement and distance from rounding boundaries at
    every test SF (same justification as the polar-stereo query)."""
    import duckdb
    import numpy as np
    from pointdatabase_spark.functions import crs
    inner = """
        SELECT l_orderkey * 10 + l_linenumber AS row_id,
               CAST(10 AS DOUBLE) + CAST(l_partkey % 6000 AS DOUBLE) / 100 AS lat,
               CAST(-78 AS DOUBLE) + CAST(l_orderkey % 600 AS DOUBLE) / 100 AS lon
        FROM lineitem"""
    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01",
                   "/root/testdata/sf0.1"):
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW lineitem AS SELECT * FROM "
            f"read_parquet('{sf_dir}/lineitem.parquet')")
        d = con.execute(crs.tmerc_oracle_sql(inner, -75.0)).fetchnumpy()
        xs, ys = crs.tmerc_forward(d["lat"], d["lon"], -75.0)
        spread = max(np.abs(xs - d["x"]).max(), np.abs(ys - d["y"]).max())
        assert spread < 1e-6, spread
        # the query quantizes to 10 m (round(x, -1)): no value may sit
        # within 100x the ulp spread of a 5 m rounding boundary
        for v in (xs, ys):
            margin = np.abs(np.mod(v, 10.0) - 5.0).min()
            assert margin > 100 * max(spread, 1e-9), (sf_dir, margin)


def test_transform_xy_dispatch_utm_and_passthrough(spark):
    """transform_xy_columns executes UTM EPSG codes, +proj=utm/tmerc
    strings, and geographic passthrough without pyproj — and the UTM
    path stays JVM-side (no Python worker in the plan)."""
    import numpy as np
    from pointdatabase_spark.functions import crs
    df = spark.createDataFrame(
        [(40.5, -73.5), (10.0, -76.2), (-33.9, -70.8)],
        "latitude double, longitude double")
    pdf = df.toPandas()
    # EPSG UTM north
    x, y = crs.transform_xy_columns(epsg=32618)
    got = df.select(x.alias("x"), y.alias("y")).toPandas()
    ex, ey = crs.tmerc_forward(pdf.latitude.to_numpy(),
                               pdf.longitude.to_numpy(), -75.0)
    np.testing.assert_allclose(got.x, ex, rtol=1e-12)
    np.testing.assert_allclose(got.y, ey, rtol=1e-12)
    # proj4 UTM south (false northing)
    x, y = crs.transform_xy_columns(
        proj4_string="+proj=utm +zone=19 +south +datum=WGS84 +units=m")
    got = df.select(x.alias("x"), y.alias("y")).toPandas()
    ex, ey = crs.tmerc_forward(pdf.latitude.to_numpy(),
                               pdf.longitude.to_numpy(), -69.0, y0=1e7)
    np.testing.assert_allclose(got.y, ey, rtol=1e-12)
    # generic tmerc with nonzero lat_0 folds the meridian arc into y0
    x, y = crs.transform_xy_columns(
        proj4_string="+proj=tmerc +lat_0=10 +lon_0=-75 +k=1 +x_0=0 +y_0=0")
    got = df.select(y.alias("y")).toPandas()
    y_at_origin = got.y[1]  # row at (10, -76.2): small northing
    assert abs(y_at_origin) < 20_000
    # geographic passthrough
    x, y = crs.transform_xy_columns(epsg=4326)
    got = df.select(x.alias("x"), y.alias("y")).toPandas()
    np.testing.assert_array_equal(got.x, pdf.longitude)
    np.testing.assert_array_equal(got.y, pdf.latitude)
    # plan: pure built-in expressions, no Python evaluation stage
    x, y = crs.transform_xy_columns(epsg=32618)
    plan = df.select(x.alias("x"), y.alias("y")) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    # chained-projection production path: identical values, linear
    # plan (Catalyst collapses the projects into ONE Project node),
    # still no Python worker
    out = crs.with_tmerc_xy(df, -75.0).toPandas()
    ex, ey = crs.tmerc_forward(pdf.latitude.to_numpy(),
                               pdf.longitude.to_numpy(), -75.0)
    np.testing.assert_allclose(out.x, ex, rtol=1e-12)
    np.testing.assert_allclose(out.y, ey, rtol=1e-12)
    # Catalyst deliberately does NOT collapse the projections (that
    # would re-duplicate the non-cheap series subtrees); instead all
    # of them fuse into ONE WholeStageCodegen stage — a single pass
    # over the data with named intermediates
    lplan = crs.with_tmerc_xy(df, -75.0) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in lplan
    import re as _re
    stages = set(_re.findall(r"\*\((\d+)\)", lplan))
    assert stages == {"1"}, stages
    # unknown CRS still gates on pyproj with a precise error
    import pytest as _pytest
    with _pytest.raises(NotImplementedError, match="pyproj"):
        crs.transform_xy_columns(epsg=2193)  # non-WGS84 TM → pyproj


def test_polar_stereo_inverse_roundtrip():
    import numpy as np
    from pointdatabase_spark.functions import crs
    rng = np.random.default_rng(4)
    for hemi in (1, -1):
        lat = rng.uniform(55, 89.9, 30_000) * hemi
        lon = rng.uniform(-180, 180, 30_000)
        x, y = crs.polar_stereo_forward(lat, lon, hemi)
        la2, lo2 = crs.polar_stereo_inverse(x, y, hemi)
        assert np.abs(la2 - lat).max() < 1e-11
        dlon = np.abs(lo2 - lon)
        assert np.minimum(dlon, 360 - dlon).max() < 1e-11
    # pole maps to origin and back to +-90
    la, lo = crs.polar_stereo_inverse(np.array([0.0]), np.array([0.0]), 1)
    assert abs(la[0] - 90.0) < 1e-12


# -------------------------------------------------------------------
# Document chunking: window/overlap coverage properties on random
# token counts and chunk geometries, vs a pure-Python reference.
# -------------------------------------------------------------------

chunk_cases = st.lists(
    st.tuples(st.integers(1, 200),   # n_tokens
              st.integers(2, 32),    # chunk_tokens
              st.integers(0, 31)),   # overlap (clamped < chunk)
    min_size=1, max_size=6)


def _ref_chunks(n, c, s):
    toks = [f"w{i}" for i in range(n)]
    if n <= c:
        return [toks]
    out = []
    k = 0
    while True:
        start = k * s
        out.append(toks[start:start + c])
        if start + c >= n:
            break
        k += 1
    return out


@settings(**_SETTINGS)
@given(chunk_cases)
def test_chunk_documents_matches_reference(spark, cases):
    from pointdatabase_spark.operators import sampling
    rows = []
    geoms = {}
    for i, (n, c, ov) in enumerate(cases):
        ov = min(ov, c - 1)
        geoms[i] = (n, c, ov)
        rows.append((i, " ".join(f"w{j}" for j in range(n))))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # one geometry per call (operator takes scalar params): group cases
    for i, (n, c, ov) in geoms.items():
        got = (sampling.chunk_documents(
            df.where(f"doc_id = {i}"), chunk_tokens=c, overlap=ov)
            .orderBy("chunk_idx").collect())
        exp = _ref_chunks(n, c, c - ov)
        assert len(got) == len(exp), (n, c, ov)
        for r, etoks in zip(got, exp):
            assert r.chunk_text.split() == etoks
            assert r.n_chunk_tokens == len(etoks)


# ---------------------------------------------------------------------------
# Conic projections (functions/crs.py lcc_/aea_): published vectors +
# roundtrips
# ---------------------------------------------------------------------------

_CLARKE_A, _CLARKE_E2 = 6378206.4, 0.00676866  # Snyder PP1395 examples


def test_conic_snyder_published_vectors():
    """Snyder, 'Map Projections: A Working Manual' (USGS PP 1395),
    worked ellipsoidal examples on Clarke 1866 — LCC p.296 (sp 33/45,
    origin 23N 96W, point 35N 75W) and Albers p.292 (sp 29.5/45.5,
    same origin/point). External ground truth, independent of this
    implementation."""
    from pointdatabase_spark.functions import crs
    x, y = crs.lcc_forward(np.array([35.0]), np.array([-75.0]),
                           33.0, 45.0, 23.0, -96.0,
                           a=_CLARKE_A, e2=_CLARKE_E2)
    assert abs(x[0] - 1894410.9) < 0.5 and abs(y[0] - 1564649.5) < 0.5
    x, y = crs.aea_forward(np.array([35.0]), np.array([-75.0]),
                           29.5, 45.5, 23.0, -96.0,
                           a=_CLARKE_A, e2=_CLARKE_E2)
    assert abs(x[0] - 1885472.7) < 0.5 and abs(y[0] - 1535925.0) < 0.5


def test_conic_roundtrip_and_scale():
    from pointdatabase_spark.functions import crs
    rng = np.random.RandomState(19)
    lat = rng.uniform(25, 50, 300)
    lon = rng.uniform(-120, -70, 300)
    args = dict(lat1=33.0, lat2=45.0, lat0=39.0, lon0=-96.0,
                x0=1000.0, y0=2000.0)
    for fwd, inv in [(crs.lcc_forward, crs.lcc_inverse),
                     (crs.aea_forward, crs.aea_inverse)]:
        x, y = fwd(lat, lon, **args)
        la, lo = inv(x, y, **args)
        assert np.allclose(la, lat, atol=1e-9)
        assert np.allclose(lo, lon, atol=1e-9)
    # conformal scale is exactly 1 on the standard parallels:
    # k = rho*n / (a*m) (Snyder 15-4)
    import math
    n, aF, _ = crs.lcc_constants(33.0, 45.0, 39.0)
    for sp in (33.0, 45.0):
        p = math.radians(sp)
        m = math.cos(p) / math.sqrt(1 - crs.WGS84_E2 * math.sin(p) ** 2)
        t = (math.tan(math.pi / 4 - p / 2)
             / ((1 - crs._E * math.sin(p))
                / (1 + crs._E * math.sin(p))) ** (crs._E / 2))
        k = (aF * t ** n) * n / (crs.WGS84_A * m)
        assert abs(k - 1.0) < 1e-12


def test_conic_columns_match_numpy(spark):
    """The shared-text SQL Columns (valid in Spark AND DuckDB) must
    reproduce the NumPy kernel bit-for-bit-ish (<1e-6 m) and dispatch
    from proj4 via transform_xy_columns."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pointdatabase_spark.functions import crs
    rng = np.random.RandomState(23)
    lat = rng.uniform(25, 50, 200)
    lon = rng.uniform(-120, -70, 200)
    df = spark.createDataFrame(pd.DataFrame({"lat": lat, "lon": lon}))
    for kind, fwd in [("lcc", crs.lcc_forward), ("aea", crs.aea_forward)]:
        p4 = (f"+proj={kind} +lat_1=33 +lat_2=45 +lat_0=39 +lon_0=-96"
              " +x_0=500000 +y_0=100000 +datum=WGS84")
        xc, yc = crs.transform_xy_columns("lat", "lon", proj4_string=p4)
        out = df.select(xc.alias("x"), yc.alias("y")).toPandas()
        xe, ye = fwd(lat, lon, 33.0, 45.0, 39.0, -96.0,
                     x0=500000.0, y0=100000.0)
        assert np.allclose(out.x.to_numpy(), xe, atol=1e-6)
        assert np.allclose(out.y.to_numpy(), ye, atol=1e-6)
        plan = df.select(xc.alias("x"))._jdf.queryExecution() \
            .executedPlan().toString()
        assert "pythonUDF" not in plan and "Exchange" not in plan


# ---------------------------------------------------------------------------
# Temporal joins (operators/temporal.py) vs brute-force references
# ---------------------------------------------------------------------------

temporal_rows = st.lists(
    st.tuples(st.integers(0, 2),                 # key
              st.integers(-1000, 1000),          # ts (negatives too)
              st.integers(0, 50)),               # payload
    min_size=0, max_size=25)


@settings(**_SETTINGS)
@given(temporal_rows, temporal_rows,
       st.sampled_from(["backward", "forward", "nearest"]),
       st.sampled_from([None, 75]))
def test_asof_join_matches_merge_asof(spark, lrows, rrows, direction, tol):
    from pointdatabase_spark.operators import temporal
    # dedup right per (k, ts): equal-ts duplicates make "the" match
    # ill-defined (documented contract); keep max payload like the query
    rdd = {}
    for k, t, v in rrows:
        rdd[(k, t)] = max(rdd.get((k, t), -1), v)
    left = spark.createDataFrame(
        [(i, k, t) for i, (k, t, _) in enumerate(lrows)] or [(0, 99, 0)],
        "i long, k long, tus long")
    right = spark.createDataFrame(
        [(k, t, float(v)) for (k, t), v in rdd.items()] or [(98, 0, 0.0)],
        "k long, tus long, v double")
    got = {r["i"]: (r["tus_m"], r["v_m"]) for r in temporal.asof_join(
        left, right, on="k", right_cols=["v"], tolerance=tol,
        direction=direction).collect()}

    def brute(k, t):
        cands = [(rt, rv) for (rk, rt), rv in rdd.items() if rk == k]
        bwd = [(rt, rv) for rt, rv in cands if rt <= t
               and (tol is None or t - rt <= tol)]
        fwd = [(rt, rv) for rt, rv in cands if rt >= t
               and (tol is None or rt - t <= tol)]
        b = max(bwd, default=None)
        f = min(fwd, default=None)
        if direction == "backward":
            pick = b
        elif direction == "forward":
            pick = f
        else:
            if b is None or (f is not None and f[0] - t < t - b[0]):
                pick = f
            else:
                pick = b
        return (None, None) if pick is None else (pick[0], float(pick[1]))

    rows = lrows or [(99, 0, 0)]
    for i, (k, t, _) in enumerate(rows):
        assert got[i] == brute(k, t), (i, k, t, direction, tol)


@settings(**_SETTINGS)
@given(temporal_rows, temporal_rows, st.integers(-60, 0),
       st.integers(0, 60))
def test_band_join_matches_brute_force(spark, lrows, rrows, lo, hi):
    from pointdatabase_spark.operators import temporal
    left = spark.createDataFrame(
        [(i, k, t) for i, (k, t, _) in enumerate(lrows)] or [(0, 9, 0)],
        "i long, k long, tus long")
    right = spark.createDataFrame(
        [(j, k, t) for j, (k, t, _) in enumerate(rrows)] or [(0, 8, 0)],
        "j long, k long, tus long")
    out = temporal.band_join(left, right, on="k", lo=lo, hi=hi)
    got = sorted((r["i_l"], r["j_r"]) for r in out.collect())
    lref = list(enumerate(lrows)) if lrows else [(0, (9, 0, 0))]
    rref = list(enumerate(rrows)) if rrows else [(0, (8, 0, 0))]
    exp = sorted((i, j) for i, (lk, lt, _) in lref
                 for j, (rk, rt, _) in rref
                 if lk == rk and lt + lo <= rt <= lt + hi)
    assert got == exp


@settings(**_SETTINGS)
@given(st.lists(st.tuples(st.integers(0, 1), st.integers(-500, 500),
                          st.integers(0, 400)),
                min_size=0, max_size=18),
       st.lists(st.tuples(st.integers(0, 1), st.integers(-500, 500),
                          st.integers(0, 400)),
                min_size=0, max_size=18),
       st.sampled_from([37, 100, 1000]))
def test_interval_join_matches_brute_force(spark, livs, rivs, bucket):
    from pointdatabase_spark.operators import temporal
    left = spark.createDataFrame(
        [(i, k, s, s + d) for i, (k, s, d) in enumerate(livs)]
        or [(0, 9, 0, 1)], "i long, k long, s long, e long")
    right = spark.createDataFrame(
        [(j, k, s, s + d) for j, (k, s, d) in enumerate(rivs)]
        or [(0, 8, 0, 1)], "j long, k long, s long, e long")
    out = temporal.interval_join(left, right, on="k",
                                 left_start="s", left_end="e",
                                 right_start="s", right_end="e",
                                 bucket_us=bucket)
    got = sorted((r["i_l"], r["j_r"]) for r in out.collect())
    lref = list(enumerate(livs)) if livs else [(0, (9, 0, 1))]
    rref = list(enumerate(rivs)) if rivs else [(0, (8, 0, 1))]
    exp = sorted((i, j) for i, (lk, ls, ld) in lref
                 for j, (rk, rs, rd) in rref
                 if lk == rk and ls <= rs + rd and rs <= ls + ld)
    assert got == exp


def _morton_ref(x: int, y: int, bits: int = 20) -> int:
    bx, by = x + (1 << (bits - 1)), y + (1 << (bits - 1))
    z = 0
    for i in range(bits):
        z |= ((bx >> i) & 1) << (2 * i)
        z |= ((by >> i) & 1) << (2 * i + 1)
    return z


def test_zorder_key_matches_bit_interleave_and_quadrants(spark):
    from pointdatabase_spark.functions import binning
    import itertools
    pts = [(x, y) for x, y in itertools.product(
        [-5, -1, 0, 1, 3, 7, 100, -100], repeat=2)]
    df = spark.createDataFrame(pts, "bx long, by long")
    got = {(r["bx"], r["by"]): r["z"] for r in df.select(
        "bx", "by", binning.zorder_key("bx", "by").alias("z")).collect()}
    for x, y in pts:
        assert got[(x, y)] == _morton_ref(x, y), (x, y)
    # locality: sorting a 2^k x 2^k aligned square by z visits each
    # quadrant CONTIGUOUSLY (the row-group-bound-tightening property)
    grid = [(x, y) for x in range(8) for y in range(8)]
    order = sorted(grid, key=lambda p: _morton_ref(*p))
    quadrant = [(x >= 4) * 2 + (y >= 4) for x, y in order]
    # each quadrant id appears in one contiguous run of 16
    runs = [q for i, q in enumerate(quadrant) if i == 0
            or q != quadrant[i - 1]]
    assert len(runs) == 4 and sorted(runs) == [0, 1, 2, 3]
    # out-of-range index raises (assertion not pruned)
    import pytest as _pytest
    bad = spark.createDataFrame([(1 << 20, 0)], "bx long, by long")
    with _pytest.raises(Exception):
        bad.select(binning.zorder_key("bx", "by").alias("z")).collect()


bm25_docs = st.lists(
    st.lists(st.sampled_from(["a", "b", "c", "d"]), min_size=1,
             max_size=8),
    min_size=1, max_size=10)


@settings(**_SETTINGS)
@given(bm25_docs, st.lists(st.sampled_from(["a", "b", "c"]),
                           min_size=1, max_size=2, unique=True))
def test_bm25_matches_reference(spark, docs, terms):
    import math as m
    from pointdatabase_spark.operators import retrieval
    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs)],
        "doc_id long, text string")
    got = {r["doc_id"]: r["bm25"] for r in
           retrieval.bm25_scores(df, terms).collect()}
    n = len(docs)
    avgdl = sum(len(t) for t in docs) / n
    k1, b = 1.2, 0.75
    exp = {}
    for i, toks in enumerate(docs):
        score = 0.0
        for t in set(terms):
            tf = toks.count(t)
            if not tf:
                continue
            dfreq = sum(1 for d in docs if t in d)
            idf = m.log(1 + (n - dfreq + 0.5) / (dfreq + 0.5))
            score += (idf * tf * (k1 + 1)
                      / (tf + k1 * (1 - b + b * len(toks) / avgdl)))
        if score:
            exp[i] = round(score, 6)
    assert set(got) == set(exp)
    for i in exp:
        assert abs(got[i] - exp[i]) < 2e-6, (i, got[i], exp[i])


# -------------------------------------------------------------------
# Substring dup spans vs a pure-Python reference: k-gram positions,
# cross-doc document frequency, touch-or-overlap span merging.
# -------------------------------------------------------------------

_span_corpora = st.lists(
    st.lists(st.sampled_from(["a", "b", "c", "d"]), min_size=0,
             max_size=12).map(" ".join),
    min_size=2, max_size=6)


def _ref_spans(texts, k):
    grams = []
    for did, text in enumerate(texts):
        toks = text.split(" ") if text else [""]
        gs = [tuple(toks[i:i + k]) for i in range(len(toks) - k + 1)]
        grams.append(gs)
    df = defaultdict(set)
    for did, gs in enumerate(grams):
        for g in set(gs):
            df[g].add(did)
    out = []
    for did, gs in enumerate(grams):
        pos = sorted({i + 1 for i, g in enumerate(gs)
                      if len(df[g]) >= 2})
        if not pos:
            continue
        cs, ce, n = pos[0], pos[0] + k - 1, 1
        for p in pos[1:]:
            if p <= ce + 1:
                ce = p + k - 1
                n += 1
            else:
                out.append((did, cs, ce, n))
                cs, ce, n = p, p + k - 1, 1
        out.append((did, cs, ce, n))
    return sorted(out)


@settings(**_SETTINGS)
@given(_span_corpora)
def test_substring_dup_spans_matches_reference(spark, texts):
    from pointdatabase_spark.operators import dedup
    df = spark.createDataFrame(list(enumerate(texts)),
                               "doc_id long, text string")
    got = sorted((r.doc_id, r.span_start, r.span_end, r.n_grams)
                 for r in dedup.substring_dup_spans(df, k=3).collect())
    assert got == _ref_spans(texts, 3)
    spark.catalog.clearCache()


# -------------------------------------------------------------------
# rollup_trailing vs brute force over the bucket aggregates: every
# (key, bucket) row's trailing count/sum covers buckets whose start
# lies within span of the current bucket start, inclusive.
# -------------------------------------------------------------------

_rt_events = st.lists(
    st.tuples(st.sampled_from(["x", "y"]),
              st.integers(0, 50),            # ts in "seconds"
              st.integers(-5, 5)),
    min_size=1, max_size=30)


@settings(**_SETTINGS)
@given(_rt_events)
def test_rollup_trailing_matches_brute_force(spark, evts):
    from pointdatabase_spark.operators import temporal
    res_s, span_us = 4, 10 * 1_000_000   # 4-second buckets, 10 s span
    rows = [(k, t * 1_000_000, float(v)) for k, t, v in evts]
    df = spark.createDataFrame(rows, "k string, tus long, v double")
    got = {(r.k, r.bucket_us): (r.n_trail, r.sum_trail)
           for r in temporal.rollup_trailing(
               df, ts="tus", keys=["k"], value="v", res_s=res_s,
               span_us=span_us).collect()}
    # brute force: bucket aggregates, then trailing over buckets
    buckets = defaultdict(lambda: [0, 0.0])
    for k, tus, v in rows:
        b = (tus // (res_s * 1_000_000)) * res_s * 1_000_000
        buckets[(k, b)][0] += 1
        buckets[(k, b)][1] += v
    expect = {}
    for (k, b) in buckets:
        n = sum(c for (k2, b2), (c, _s) in buckets.items()
                if k2 == k and b - span_us <= b2 <= b)
        sv = sum(s for (k2, b2), (_c, s) in buckets.items()
                 if k2 == k and b - span_us <= b2 <= b)
        expect[(k, b)] = (n, sv)
    assert set(got) == set(expect)
    for key in got:
        assert got[key][0] == expect[key][0]
        assert math.isclose(got[key][1], expect[key][1],
                            rel_tol=1e-12, abs_tol=1e-12)


# -------------------------------------------------------------------
# BPE training vs a pure-Python reference (Sennrich et al. 2016,
# algorithm 1): greedy left-to-right pair replacement, argmax by
# (count, then lexicographic (left, right)) per round.
# -------------------------------------------------------------------

bpe_corpora = st.lists(
    st.text(alphabet="abc", min_size=1, max_size=8),
    min_size=1, max_size=12)


def _ref_bpe(words, n_merges):
    from collections import Counter
    wc = Counter(words)
    seqs = {w: list(w) for w in wc}
    merges = []
    for step in range(1, n_merges + 1):
        pc = Counter()
        for w, syms in seqs.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += wc[w]
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        (l, r), n = best
        merges.append((step, l, r, n))
        for w, syms in seqs.items():
            out, i = [], 0
            while i < len(syms):
                if (i + 1 < len(syms) and syms[i] == l
                        and syms[i + 1] == r):
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            seqs[w] = out
    return merges, {w: len(s) for w, s in seqs.items()}


@given(words=bpe_corpora)
@settings(**_SETTINGS)
def test_bpe_matches_reference(spark, words):
    from pyspark.sql import Row
    from pointdatabase_spark.operators import tokenizer
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=w) for i, w in enumerate(words)])
    want_merges, want_lens = _ref_bpe(words, 3)
    got = [(r.step, r.left, r.right, r.pair_count)
           for r in tokenizer.bpe_train(spark, docs, 3).collect()]
    assert got == want_merges
    enc = {r.doc_id: r.n_tokens for r in
           tokenizer.bpe_encode_doc_stats(spark, docs, 3).collect()}
    assert enc == {i: want_lens[w] for i, w in enumerate(words)}


# -------------------------------------------------------------------
# knn_join vs brute force: random points + queries, cell-straddling
# coordinates, radius-boundary inclusion, (dist2, id) tie rule.
# -------------------------------------------------------------------

knn_pts = st.lists(
    st.tuples(st.integers(-30, 30), st.integers(-30, 30)),
    min_size=1, max_size=40)
knn_qs = st.lists(
    st.tuples(st.integers(-30, 30), st.integers(-30, 30)),
    min_size=1, max_size=5)


@given(pts=knn_pts, qs=knn_qs, k=st.integers(1, 4),
       radius=st.sampled_from([5.0, 10.0, 17.0]))
@settings(**_SETTINGS)
def test_knn_join_matches_brute_force(spark, pts, qs, k, radius):
    from pyspark.sql import Row
    pdf = spark.createDataFrame(
        [Row(row_id=i, x=float(x), y=float(y))
         for i, (x, y) in enumerate(pts)])
    qdf = spark.createDataFrame(
        [Row(q_id=j, x=float(x), y=float(y))
         for j, (x, y) in enumerate(qs)])
    want = set()
    for j, (qx, qy) in enumerate(qs):
        cand = sorted(
            ((float((px - qx) ** 2 + (py - qy) ** 2), i)
             for i, (px, py) in enumerate(pts)
             if (px - qx) ** 2 + (py - qy) ** 2 <= radius * radius))
        for rank, (d2, i) in enumerate(cand[:k], 1):
            want.add((j, i, rank, d2))
    got = {(r.q_id, r.nbr_id, r.nn_rank, r.dist2) for r in
           spatial.knn_join(pdf, qdf, k=k, radius=radius).collect()}
    assert got == want


def test_canonical_url_idempotent(spark):
    """canon(canon(u)) == canon(u) over a structured URL grid
    covering every normalization rule and their combinations —
    a canonical form that isn't a fixed point re-dedups differently
    on a second pass, which would corrupt incremental crawls."""
    import itertools
    from pyspark.sql import functions as F
    from pointdatabase_spark.operators import web
    urls = []
    for scheme, www, port, slash, qs, frag in itertools.product(
            ["http://", "HTTP://", "https://"],
            ["", "www.", "WWW."],
            ["", ":80"],
            ["", "/"],
            ["", "?b=2&a=1", "?utm_source=x", "?utm_a=1&z=9&y=8"],
            ["", "#frag"]):
        urls.append(f"{scheme}{www}Ex-1.COM{port}/P/q{slash}{qs}{frag}")
    urls += ["http://a.com/p//", "http://a.com/p///?b=2&a=1#f",
             "no-scheme/path", "mailto:x@y", ""]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    once = df.select(web.canonical_url("url").alias("c1"))
    twice = once.select(F.col("c1"),
                        web.canonical_url("c1").alias("c2"))
    bad = twice.where(F.col("c1") != F.col("c2")).collect()
    assert not bad, bad[:5]


@settings(**_SETTINGS)
@given(bm25_docs, st.integers(min_value=2, max_value=3))
def test_phrase_count_matches_reference(spark, docs, plen):
    """phrase_count == the naive sliding-window scan, including
    overlapping occurrences, on random small corpora."""
    from pointdatabase_spark.operators import retrieval
    phrase = ["a", "b", "a"][:plen]
    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs)],
        "doc_id long, text string")
    got = {r["doc_id"]: r["n_occ"] for r in
           retrieval.phrase_count(df, phrase).collect()}
    exp = {}
    for i, toks in enumerate(docs):
        n = sum(1 for j in range(len(toks) - plen + 1)
                if toks[j:j + plen] == phrase)
        if n:
            exp[i] = n
    assert got == exp


@settings(**_SETTINGS)
@given(bm25_docs)
def test_inverted_index_matches_reference(spark, docs):
    """build_inverted_index df/cf/champion == the dict-of-counters
    reference (ties -> smallest doc id) on random small corpora."""
    from collections import Counter
    from pointdatabase_spark.operators import retrieval
    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs)],
        "doc_id long, text string")
    got = {r["tok"]: (r["df"], r["cf"], r["top_doc"], r["top_tf"])
           for r in retrieval.build_inverted_index(df).collect()}
    posting = {}
    for i, toks in enumerate(docs):
        for t, c in Counter(toks).items():
            posting.setdefault(t, {})[i] = c
    exp = {}
    for t, docs_tf in posting.items():
        top = min(docs_tf, key=lambda d: (-docs_tf[d], d))
        exp[t] = (len(docs_tf), sum(docs_tf.values()),
                  top, docs_tf[top])
    assert got == exp
