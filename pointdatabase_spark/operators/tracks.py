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
