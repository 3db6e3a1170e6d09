"""Track-crossover analysis — the reference's "hard query"
(SURVEY §3.3; cross_ATL06_tile.py + xover_search.py).

Reference shape: per 100-km tile, an O(n²) Python loop over track
pairs; per pair, bin both tracks at 1 km, intersect + 3×3-dilate the
bin sets, then an iterative "zoom" search for the exact polyline
crossing (xover_search.cross_by_zoom), then a 4×4 plane fit
(cross_ATL06_tile.calc_slope).

Spark re-expression:

1. **Candidate discovery (J3)** — declarative: distinct (track, bin)
   keys, self-join on bin equality with ``rgt_a < rgt_b`` (the
   different-rgt rule, cross_ATL06_tile.py:31), 3×3 dilation via a
   9-row explode on one side. Catalyst picks broadcast vs shuffle join;
   AQE handles bin skew (polar bins hold many tracks).
2. **Candidate row gather** — join points back to the pair list on
   (track, dilated-bin), tagging each row with pair id + side. Only
   rows near shared bins travel into the kernel — same pruning as the
   reference's ``intersect_inds`` (xover_search.py:126).
3. **Exact refinement (J4)** — ``applyInPandas`` per pair: a fully
   vectorized all-pairs segment-intersection (NumPy broadcast over
   consecutive-point segments of both tracks). The reference's zoom
   loop exists to avoid slow scalar Python; a vectorized exact sweep is
   simpler, finds the same crossing, and has no convergence corner
   cases. Candidate subsets are bin-pruned, so n_a·n_b stays small;
   a chunked path guards pathological pairs.
4. **Plane fit (A7)** + weights (J7) + delta/bar (A6) are computed in
   the same kernel from the four bracketing rows (least-squares solve
   of [dx, dy, 1₀, 1₁] — calc_slope cross_ATL06_tile.py:101-127).

Output: one row per crossover (see XOVER_SCHEMA), matching FIXTURES §6
flattened.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pointdatabase_spark.functions.binning import bin_center, neighbor_offsets


def _track_id(track_cols: list[str]) -> F.Column:
    # a single sortable key for the pair ordering (ii < jj surrogate)
    return F.concat_ws("|", *[F.col(c).cast("string") for c in track_cols])


def candidate_pairs(df: DataFrame, track_cols: list[str],
                    delta_coarse: float = 1000.0,
                    x: str = "x", y: str = "y",
                    rgt: str = "rgt", cycle: str = "cycle",
                    different_cycles: bool = False) -> DataFrame:
    """J3: track pairs sharing ≥1 coarse bin after 3×3 dilation.

    Dilating side A's bin set by one bin in each direction before the
    equi-join is equivalent to the reference's dilate-the-intersection
    (xover_search.py:119-126) for *pair discovery*: any pair whose
    exact bin sets intersect also intersects after dilation, and the
    dilated match additionally admits near-miss bins, exactly like the
    reference's candidate row selection.
    """
    keyed = (df.withColumn("bx", bin_center(x, delta_coarse))
               .withColumn("by", bin_center(y, delta_coarse))
               .withColumn("tid", _track_id(track_cols)))
    bins_a = (keyed.select("tid", F.col(rgt).alias("rgt_a"),
                           F.col(cycle).alias("cyc_a"), "bx", "by")
              .distinct())
    offs = F.array(*[F.struct(F.lit(dx * delta_coarse).alias("ox"),
                              F.lit(dy * delta_coarse).alias("oy"))
                     for dx, dy in neighbor_offsets(1)])
    dil_a = (bins_a.withColumn("_o", F.explode(offs))
             .select(F.col("tid").alias("tid_a"), "rgt_a", "cyc_a",
                     (F.col("bx") + F.col("_o.ox")).alias("bx"),
                     (F.col("by") + F.col("_o.oy")).alias("by"))
             .distinct())
    bins_b = bins_a.select(F.col("tid").alias("tid_b"),
                           F.col("rgt_a").alias("rgt_b"),
                           F.col("cyc_a").alias("cyc_b"), "bx", "by")
    pairs = (dil_a.join(bins_b, on=["bx", "by"])
             .where((F.col("rgt_a") != F.col("rgt_b"))
                    & (F.col("tid_a") < F.col("tid_b"))))
    if different_cycles:
        pairs = pairs.where(F.col("cyc_a") != F.col("cyc_b"))
    return pairs.select("tid_a", "tid_b").distinct()


XOVER_SCHEMA = T.StructType([
    T.StructField("tid_a", T.StringType()),
    T.StructField("tid_b", T.StringType()),
    T.StructField("x", T.DoubleType()),
    T.StructField("y", T.DoubleType()),
    T.StructField("l_a", T.DoubleType()),
    T.StructField("l_b", T.DoubleType()),
    T.StructField("t_a", T.DoubleType()),
    T.StructField("t_b", T.DoubleType()),
    T.StructField("h_a", T.DoubleType()),
    T.StructField("h_b", T.DoubleType()),
    T.StructField("slope_x", T.DoubleType()),
    T.StructField("slope_y", T.DoubleType()),
    T.StructField("delta_h", T.DoubleType()),
    T.StructField("bar_h", T.DoubleType()),
])


def _segment_crossings(P: np.ndarray, Q: np.ndarray,
                       p_end_closed: bool = True, q_end_closed: bool = True):
    """All intersections between consecutive-point segments of polyline
    P (n,2) and polyline Q (m,2), vectorized.

    Returns (i, j, la, lb, xc, yc) arrays: segment P[i]→P[i+1] crosses
    Q[j]→Q[j+1] at parameters la, lb. Standard 2-D segment intersection
    by cross products (equivalent to the complex-number form in
    xover_search.x_point:23-40, re-derived in real arithmetic).

    Parameter intervals are half-open [0, 1) — a crossing landing
    exactly on a shared interior vertex is reported once (for the
    segment it starts), not twice. Only each polyline's *final* segment
    uses the closed interval [0, 1] (``*_end_closed``), so a crossing
    at the very last point is still found.
    """
    dP = P[1:] - P[:-1]                      # (n-1, 2)
    dQ = Q[1:] - Q[:-1]                      # (m-1, 2)
    # det[i, j] = cross(dP[i], dQ[j])
    det = dP[:, None, 0] * dQ[None, :, 1] - dP[:, None, 1] * dQ[None, :, 0]
    d0 = P[:-1, None, :] - Q[None, :-1, :]   # (n-1, m-1, 2)
    crossQ = d0[:, :, 0] * dQ[None, :, 1] - d0[:, :, 1] * dQ[None, :, 0]
    crossP = d0[:, :, 0] * dP[:, None, 1] - d0[:, :, 1] * dP[:, None, 0]
    with np.errstate(divide="ignore", invalid="ignore"):
        la = -crossQ / det
        lb = -crossP / det
    last_p = np.zeros(max(P.shape[0] - 1, 0), dtype=bool)
    last_q = np.zeros(max(Q.shape[0] - 1, 0), dtype=bool)
    if p_end_closed and last_p.size:
        last_p[-1] = True
    if q_end_closed and last_q.size:
        last_q[-1] = True
    ok = ((det != 0)
          & (la >= 0) & ((la < 1) | last_p[:, None])
          & (lb >= 0) & ((lb < 1) | last_q[None, :])
          & (la <= 1) & (lb <= 1))
    i, j = np.nonzero(ok)
    la, lb = la[i, j], lb[i, j]
    xc = P[i, 0] + la * dP[i, 0]
    yc = P[i, 1] + la * dP[i, 1]
    return i, j, la, lb, xc, yc


_MAX_BLOCK = 4_000_000  # segment-pair cells per broadcast block


def _crossings_chunked(P, Q):
    """Chunk the broadcast when n·m is large (skewed candidate sets)."""
    n = max(P.shape[0] - 1, 1)
    rows = max(_MAX_BLOCK // max(Q.shape[0] - 1, 1), 16)
    out = []
    for s in range(0, n, rows):
        e = min(s + rows + 1, P.shape[0])
        res = _segment_crossings(P[s:e], Q, p_end_closed=(e == P.shape[0]))
        if res[0].size:
            i, j, la, lb, xc, yc = res
            out.append((i + s, j, la, lb, xc, yc))
    if not out:
        return (np.array([], dtype=int),) * 2 + (np.array([]),) * 4
    return tuple(np.concatenate([o[k] for o in out]) for k in range(6))


def _plane_fit(x4, y4, h4):
    """calc_slope's 4×4 system (cross_ATL06_tile.py:116-123): solve
    [dx, dy, 1_a, 1_b] · m = h for the crossover-local plane.

    Closed form: subtracting the two equations within each track
    eliminates the per-track intercepts, leaving a 2×2 system in
    (slope_x, slope_y) solved by Cramer's rule — algebraically identical
    to the reference's lstsq on the (nonsingular) 4×4, and exactly
    reproducible in the SQL oracle. Singular geometry (the two
    point-pair chords parallel) → NaN.
    """
    a1, b1, r1 = x4[0] - x4[1], y4[0] - y4[1], h4[0] - h4[1]
    a2, b2, r2 = x4[2] - x4[3], y4[2] - y4[3], h4[2] - h4[3]
    det = a1 * b2 - a2 * b1
    if det == 0:
        return float("nan"), float("nan")
    return float((r1 * b2 - r2 * b1) / det), float((a1 * r2 - a2 * r1) / det)


def _refine_pair(pdf: pd.DataFrame) -> pd.DataFrame:
    out_cols = [f.name for f in XOVER_SCHEMA.fields]
    a = pdf[pdf["side"] == 0].sort_values(["t", "h"], kind="mergesort")
    b = pdf[pdf["side"] == 1].sort_values(["t", "h"], kind="mergesort")
    if len(a) < 2 or len(b) < 2:
        return pd.DataFrame(columns=out_cols)
    P = a[["x", "y"]].to_numpy(float)
    Q = b[["x", "y"]].to_numpy(float)
    if (P.shape[0] - 1) * (Q.shape[0] - 1) > _MAX_BLOCK:
        i, j, la, lb, xc, yc = _crossings_chunked(P, Q)
    else:
        i, j, la, lb, xc, yc = _segment_crossings(P, Q)
    if i.size == 0:
        return pd.DataFrame(columns=out_cols)
    ta, ha = a["t"].to_numpy(float), a["h"].to_numpy(float)
    tb, hb = b["t"].to_numpy(float), b["h"].to_numpy(float)
    rows = []
    for k in range(i.size):
        ia, jb = int(i[k]), int(j[k])
        wa, wb = float(la[k]), float(lb[k])
        h_a = ha[ia] * (1 - wa) + ha[ia + 1] * wa
        h_b = hb[jb] * (1 - wb) + hb[jb + 1] * wb
        t_a = ta[ia] * (1 - wa) + ta[ia + 1] * wa
        t_b = tb[jb] * (1 - wb) + tb[jb + 1] * wb
        sx, sy = _plane_fit(
            np.array([P[ia, 0], P[ia + 1, 0], Q[jb, 0], Q[jb + 1, 0]]),
            np.array([P[ia, 1], P[ia + 1, 1], Q[jb, 1], Q[jb + 1, 1]]),
            np.array([ha[ia], ha[ia + 1], hb[jb], hb[jb + 1]]))
        rows.append((pdf["tid_a"].iloc[0], pdf["tid_b"].iloc[0],
                     float(xc[k]), float(yc[k]), wa, wb, t_a, t_b,
                     h_a, h_b, sx, sy, h_b - h_a, (h_a + h_b) / 2))
    return pd.DataFrame(rows, columns=out_cols)


def crossovers(df: DataFrame, track_cols: list[str],
               delta_coarse: float = 1000.0,
               x: str = "x", y: str = "y", t: str = "t", h: str = "h",
               rgt: str = "rgt", cycle: str = "cycle",
               different_cycles: bool = False) -> DataFrame:
    """The full crossover pipeline (steps 1-4 above). One declarative
    candidate join, one row-gather join, one grouped-map kernel.

    Input must already be track-filtered (seg-difference + finite h —
    see plans.tile_build.prepare_points); `t` orders rows along track.
    """
    pairs = candidate_pairs(df, track_cols, delta_coarse, x=x, y=y,
                            rgt=rgt, cycle=cycle,
                            different_cycles=different_cycles)
    keyed = (df.withColumn("bx", bin_center(x, delta_coarse))
               .withColumn("by", bin_center(y, delta_coarse))
               .withColumn("tid", _track_id(track_cols))
               .select("tid", "bx", "by",
                       F.col(x).alias("x"), F.col(y).alias("y"),
                       F.col(t).alias("t"), F.col(h).alias("h")))
    # shared bins per pair: dilate side A's bin set by one bin before the
    # equi-join (same convention as candidate_pairs — a crossing near a
    # bin corner can have its two tracks' vertices in adjacent, disjoint
    # bins), then intersect with side B's exact bins.
    offs = F.array(*[F.struct(F.lit(dx * delta_coarse).alias("ox"),
                              F.lit(dy * delta_coarse).alias("oy"))
                     for dx, dy in neighbor_offsets(1)])
    bins_a_dil = (keyed.select(F.col("tid").alias("tid_a"), "bx", "by")
                  .distinct()
                  .withColumn("_o", F.explode(offs))
                  .select("tid_a",
                          (F.col("bx") + F.col("_o.ox")).alias("bx"),
                          (F.col("by") + F.col("_o.oy")).alias("by"))
                  .distinct())
    shared = (pairs
              .join(bins_a_dil, on="tid_a")
              .join(keyed.select(F.col("tid").alias("tid_b"),
                                 "bx", "by").distinct(), on=["tid_b", "bx", "by"]))
    dil = (shared.withColumn("_o", F.explode(offs))
           .select("tid_a", "tid_b",
                   (F.col("bx") + F.col("_o.ox")).alias("bx"),
                   (F.col("by") + F.col("_o.oy")).alias("by"))
           .distinct())
    side_a = (dil.join(keyed.withColumnRenamed("tid", "tid_a"),
                       on=["tid_a", "bx", "by"])
              .select("tid_a", "tid_b", "x", "y", "t", "h",
                      F.lit(0).alias("side")))
    side_b = (dil.join(keyed.withColumnRenamed("tid", "tid_b"),
                       on=["tid_b", "bx", "by"])
              .select("tid_a", "tid_b", "x", "y", "t", "h",
                      F.lit(1).alias("side")))
    gathered = side_a.unionByName(side_b).dropDuplicates(
        ["tid_a", "tid_b", "side", "x", "y", "t", "h"])
    return (gathered.groupBy("tid_a", "tid_b")
            .applyInPandas(_refine_pair, schema=XOVER_SCHEMA))
