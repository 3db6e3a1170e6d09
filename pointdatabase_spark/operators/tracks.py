"""Track reconstruction + per-pair collapse (reference
ATL06_tiles.py:142-160, ATL06_pair.py:9-25; SURVEY §2.4 A4/A5).

The reference materializes a Python list of per-track arrays; in Spark
a "reconstructed track set" is simply the frame with a track key and a
defined in-track ordering — downstream per-track kernels consume it
via groupBy(track).applyInPandas with rows pre-sorted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pointdatabase_spark.functions import rounding

TRACK_KEY = ["cycle", "rgt", "beam_pair", "lr"]


def reconstruct_tracks(df: DataFrame, track_cols: list[str] | None = None,
                       order_col: str = "delta_time",
                       x: str = "x", y: str = "y",
                       x0: float | None = None, y0: float | None = None,
                       w_box: float | None = None) -> DataFrame:
    """Group rows into tracks, optionally clipping to a W-wide box
    around (x0, y0) (reference reconstruct_tracks ATL06_tiles.py:142-160).
    Adds ``track_seq`` = time order within the track."""
    track_cols = track_cols or TRACK_KEY
    out = df
    if w_box is not None:
        out = out.where((F.abs(F.col(x) - F.lit(x0)) < w_box / 2)
                        & (F.abs(F.col(y) - F.lit(y0)) < w_box / 2))
    w = Window.partitionBy(*track_cols).orderBy(order_col)
    return out.withColumn("track_seq", F.row_number().over(w))


def track_summary(df: DataFrame, track_cols: list[str] | None = None,
                  order_col: str = "delta_time") -> DataFrame:
    """Per-track row count and time span — the catalog view of the
    reconstructed track list."""
    track_cols = track_cols or TRACK_KEY
    return (df.groupBy(*track_cols)
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.min(order_col).alias("t_min"),
                 F.max(order_col).alias("t_max")))


def pair_collapse(df: DataFrame, pair_cols: list[str],
                  x_atc: str = "x_atc", y_atc: str = "y_atc",
                  h: str = "h_li", h_sigma: str = "h_li_sigma",
                  dh_fit_dy: str | None = None,
                  delta_time: str = "delta_time") -> DataFrame:
    """Collapse the two beams of a pair to one row (ATL06_pair.py:10-25):
    mean x/y/time; dh_dy_sigma = sqrt(Σ sigma²) / |Δ y_atc|.

    The reference's Δy_atc is right-minus-left of exactly two beams; the
    generic form uses max−min of the group, identical for two rows.
    Single shuffle, map-side partial aggregation.
    """
    aggs = [
        F.avg(x_atc).alias("x"),
        F.avg(y_atc).alias("y"),
        F.avg(delta_time).alias("delta_time"),
        F.avg(h).alias("h_mean"),
        F.when(F.max(y_atc) != F.min(y_atc),
               F.sqrt(F.sum(F.col(h_sigma) * F.col(h_sigma)))
               / F.abs(F.max(y_atc) - F.min(y_atc))).alias("dh_dy_sigma"),
        F.count(F.lit(1)).alias("n_beams"),
    ]
    if dh_fit_dy is not None:
        aggs.append(F.avg(dh_fit_dy).alias("dh_dy"))
    return df.groupBy(*pair_cols).agg(*aggs)


def track_resample(pts: DataFrame, step: int, key: str = "rgt",
                   t: str = "t", h: str = "h") -> DataFrame:
    """Along-track resampling: linear interpolation of ``h`` onto a
    fixed-step grid per track — the gridded-product step the
    reference's per-track NumPy kernels feed (regular sampling of an
    irregular track).

    Plan: points dedupe to one row per (track, t) (equal-ts
    duplicates make "the" bracketing row ill-defined — same rule as
    asof_join); per-track [min, max] bounds explode into the grid (a
    narrow sequence over an aggregate, grid size = track span / step,
    never point count); two single-exchange as-of joins
    (operators/temporal.asof_join backward + forward) attach the
    bracketing samples; interpolation is a scan-local expression.
    At 100 TB: two key-hash exchanges of points + grid, no range-join
    candidate blowup, no per-track collect."""
    from pointdatabase_spark.operators.temporal import asof_join
    p = (pts.where(F.col(h).isNotNull() & F.col(t).isNotNull())
         .groupBy(key, F.col(t).cast("long").alias("_t"))
         .agg(F.max(h).alias("_h")))
    rng = p.groupBy(key).agg(F.min("_t").alias("_t0"),
                             F.max("_t").alias("_t1"))
    grid = (rng.select(key, F.explode(F.sequence(
                F.ceil(F.col("_t0") / step).cast("long"),
                F.floor(F.col("_t1") / step).cast("long"))).alias("_k"))
            .select(key, (F.col("_k") * step).alias("gt")))
    b = asof_join(grid, p, on=key, left_ts="gt", right_ts="_t",
                  right_cols=["_h"], suffix="_b", direction="backward")
    f = asof_join(b, p, on=key, left_ts="gt", right_ts="_t",
                  right_cols=["_h"], suffix="_f", direction="forward")
    interp = F.when(
        F.col("_t_f") == F.col("_t_b"), F.col("_h_b")).otherwise(
        F.col("_h_b") + (F.col("_h_f") - F.col("_h_b"))
        * (F.col("gt") - F.col("_t_b"))
        / (F.col("_t_f") - F.col("_t_b")))
    return (f.where(F.col("_t_b").isNotNull()
                    & F.col("_t_f").isNotNull())
            .select(key, "gt",
                    F.col("_t_b").alias("t_before"),
                    F.col("_t_f").alias("t_after"),
                    rounding.qround(interp, 6).alias("h_interp")))
