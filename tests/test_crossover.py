"""Crossover pipeline vs analytic ground truth.

Golden case from FIXTURES §6 / the reference's inline smoke test
(xover_search.__test__, xover_search.py:136-156): two parabolic paths,
exactly one crossing; assert its location against the analytic curve
intersection. Plus straight-track grids with known crossing points.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from pointdatabase_spark.operators import crossover


def _track_df(spark, tracks):
    """tracks: list of dicts with keys x, y (arrays) and meta ints."""
    rows = []
    for tr in tracks:
        for k in range(len(tr["x"])):
            rows.append({"x": float(tr["x"][k]), "y": float(tr["y"][k]),
                         "t": float(k), "h": float(tr.get("h", [0] * len(tr["x"]))[k]
                                                   if "h" in tr else k),
                         "rgt": tr["rgt"], "cycle": tr.get("cycle", 1),
                         "beam_pair": 1, "lr": 0})
    return spark.createDataFrame(pd.DataFrame(rows))


TRACK = ["cycle", "rgt", "beam_pair", "lr"]


def test_two_parabolas_single_crossing(spark):
    # paths from the reference smoke test: y0 = 0.01(2x)^2 on [0, 13),
    # y1 = -0.25x^2 + x + 2 on [0.5, 4.95); one crossing, in meters-ish
    # units scale both by 1000 so delta_coarse=1000 bins make sense.
    x0 = np.arange(0, 13, 0.2)
    y0 = 0.01 * (2 * x0) ** 2
    x1 = np.arange(0.5, 4.95, 0.1)
    y1 = -0.25 * x1 ** 2 + x1 + 2
    df = _track_df(spark, [
        {"x": x0 * 1000, "y": y0 * 1000, "rgt": 1},
        {"x": x1 * 1000, "y": y1 * 1000, "rgt": 2},
    ])
    out = crossover.crossovers(df, TRACK).toPandas()
    assert len(out) == 1
    # analytic: 0.04x^2 = -0.25x^2 + x + 2  →  0.29x^2 - x - 2 = 0
    xs = (1 + math.sqrt(1 + 4 * 0.29 * 2)) / (2 * 0.29)
    ys = -0.25 * xs ** 2 + xs + 2
    # piecewise-linear approximation of the curves → cm-level agreement
    assert abs(out.x[0] - xs * 1000) < 20
    assert abs(out.y[0] - ys * 1000) < 20
    assert 0 <= out.l_a[0] <= 1 and 0 <= out.l_b[0] <= 1


def test_straight_tracks_exact_crossing_and_slope(spark):
    # two straight tracks crossing at exactly (500, 500); heights form
    # the plane h = 0.001x + 0.002y per track (+ per-track offset).
    n = 101
    s = np.linspace(0, 1000, n)
    hx, hy = 0.001, 0.002
    df = _track_df(spark, [
        {"x": s, "y": s, "h": hx * s + hy * s + 10.0, "rgt": 10},
        {"x": s, "y": 1000 - s, "h": hx * s + hy * (1000 - s) + 20.0, "rgt": 20},
    ])
    out = crossover.crossovers(df, TRACK).toPandas()
    assert len(out) == 1
    assert abs(out.x[0] - 500) < 1e-6 and abs(out.y[0] - 500) < 1e-6
    # plane fit recovers the common slopes despite different offsets
    assert abs(out.slope_x[0] - hx) < 1e-9
    assert abs(out.slope_y[0] - hy) < 1e-9
    # weighted heights: h_a at crossing = 0.003*500+10, h_b = .001*500+.002*500+20
    assert abs(out.h_a[0] - (0.003 * 500 + 10)) < 1e-9
    assert abs(out.h_b[0] - (0.0015 * 1000 + 20)) < 1e-9
    assert abs(out.delta_h[0] - 10.0) < 1e-9
    assert abs(out.bar_h[0] - (out.h_a[0] + out.h_b[0]) / 2) < 1e-12


def test_same_rgt_pairs_excluded(spark):
    s = np.linspace(0, 1000, 51)
    df = _track_df(spark, [
        {"x": s, "y": s, "rgt": 7, "cycle": 1},
        {"x": s, "y": 1000 - s, "rgt": 7, "cycle": 2},  # same rgt → no pair
        {"x": s, "y": 900 - s, "rgt": 8, "cycle": 1},
    ])
    out = crossover.crossovers(df, TRACK).toPandas()
    # only pairs with different rgt may appear
    assert len(out) > 0
    for _, r in out.iterrows():
        rgt_a = r.tid_a.split("|")[1]
        rgt_b = r.tid_b.split("|")[1]
        assert rgt_a != rgt_b


def test_parallel_tracks_no_crossing(spark):
    s = np.linspace(0, 1000, 51)
    df = _track_df(spark, [
        {"x": s, "y": s, "rgt": 1},
        {"x": s, "y": s + 100, "rgt": 2},
    ])
    out = crossover.crossovers(df, TRACK).toPandas()
    assert len(out) == 0


def test_multi_track_grid_counts(spark):
    # 3 "ascending" + 3 "descending" straight tracks: every asc×desc
    # pair crosses once inside the domain → 9 crossovers.
    s = np.linspace(0, 1000, 41)
    tracks = []
    for k in range(3):
        tracks.append({"x": s, "y": s + k * 10, "rgt": 1 + k})
        tracks.append({"x": s, "y": 1000 - s - k * 10, "rgt": 50 + k})
    df = _track_df(spark, tracks)
    out = crossover.crossovers(df, TRACK).toPandas()
    asc = {f"1|{1+k}|1|0" for k in range(3)}
    cross_pairs = {(r.tid_a, r.tid_b) for _, r in out.iterrows()}
    n_asc_desc = sum(1 for a, b in cross_pairs
                     if (a.split("|")[1] in {"1", "2", "3"})
                     != (b.split("|")[1] in {"1", "2", "3"}))
    assert len(out) == 9
    assert n_asc_desc == 9
