"""Quality filters (reference ATL06_filters.py, SURVEY §2.2 P6-P11).

Each filter is a *mask expression* plus three application modes
mirroring the reference's ``setValid`` / ``toNaN`` / ``subset``
keywords (ATL06_filters.py:9-79):

  with_mask(df, mask, name)  → add a boolean column           (setValid)
  null_out(df, mask, col)    → NULL the value where mask fails (toNaN)
  subset(df, mask)           → keep only passing rows          (subset)

All masks are plain column expressions — codegen'd, pushdown-eligible.
Column names are parameters so the operators apply to any point table
(ATL06-named defaults match FIXTURES.md §1).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def with_mask(df: DataFrame, mask: Column, name: str = "valid") -> DataFrame:
    existing = name in df.columns
    m = (F.col(name) & mask) if existing else mask
    return df.withColumn(name, m)


def null_out(df: DataFrame, mask: Column, col: str) -> DataFrame:
    return df.withColumn(col, F.when(mask, F.col(col)).otherwise(F.lit(None)))


def subset(df: DataFrame, mask: Column) -> DataFrame:
    return df.where(mask)


# -- P7: quality summary (ATL06_filters.py:53-70) --------------------------

def quality_summary_mask(h_robust_sprd: str = "h_robust_sprd",
                         h_li_sigma: str = "h_li_sigma",
                         snr_significance: str = "snr_significance",
                         signal_selection_source: str | None = None) -> Column:
    """Good-segment mask: spread < 1, sigma < 1, snr significance < 0.02
    (optionally signal_selection_source <= 1). The reference's
    ``atl06_quality_summary`` flag is the negation of this mask."""
    m = ((F.col(h_robust_sprd) < 1)
         & (F.col(h_li_sigma) < 1)
         & (F.col(snr_significance) < 0.02))
    if signal_selection_source is not None:
        m = m & (F.col(signal_selection_source) <= 1)
    return m


# -- P8: photon density (ATL06_filters.py:9-27) ----------------------------

def ph_density_mask(n_fit_photons: str = "n_fit_photons",
                    w_surface_window_final: str = "w_surface_window_final",
                    beam_type: str = "beam_type",
                    min_density: dict[str, float] | None = None) -> Column:
    """Per-beam photon-density threshold: weak beams need density > 1,
    strong > 4; non-finite densities fail."""
    md = min_density or {"weak": 1.0, "strong": 4.0}
    density = F.col(n_fit_photons) / F.col(w_surface_window_final)
    thresh = F.when(F.col(beam_type) == "strong", F.lit(md["strong"])) \
              .otherwise(F.lit(md["weak"]))
    return density.isNotNull() & ~F.isnan(density) & (density > thresh)


# -- P9/W2: segment-difference consistency (ATL06_filters.py:29-51) --------

def seg_difference_mask(df: DataFrame, track_cols: list[str], order_cols: str | list[str],
                        h: str = "h_li", slope: str = "dh_fit_dx",
                        tol: float = 2.0, d_at: float = 20.0,
                        out: str = "seg_diff_ok") -> DataFrame:
    """Along-track consistency filter.

    For row i in a track ordered by `order_col`, with fixed segment
    spacing d_at (20 m):
      fwd  = |h[i] + d_at·s[i] − h[i+1]|      (rows with a successor)
      bwd  = |h[i−1] − (h[i] − d_at·s[i])|    (rows with a predecessor)
      segdiff = max(available terms, missing term → 0)
    Row passes iff segdiff < tol; tracks with < 3 rows pass entirely.

    One window (one shuffle on track key); lead/lag only — no frames.
    """
    order = [order_cols] if isinstance(order_cols, str) else list(order_cols)
    w = Window.partitionBy(*track_cols).orderBy(*order)
    w_all = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    hc, sc = F.col(h), F.col(slope)
    fwd = F.abs(hc + F.lit(d_at) * sc - F.lead(hc).over(w))
    bwd = F.abs(F.lag(hc).over(w) - (hc - F.lit(d_at) * sc))
    segdiff = F.greatest(F.coalesce(fwd, F.lit(0.0)), F.coalesce(bwd, F.lit(0.0)))
    n = F.count(F.lit(1)).over(w_all)
    return df.withColumn(out, (n < 3) | (segdiff < F.lit(tol)))


# -- P10: first-photon-bias glitch (ATL06_filters.py:72-79) ----------------

def fpb_glitch_mask(n_fit_photons: str = "n_fit_photons",
                    fpb_n_corr: str = "fpb_n_corr") -> Column:
    return F.col(n_fit_photons) <= F.col(fpb_n_corr)


# -- P11: quality NaN-out before tiling (ATL06_tiles.py:65-66) -------------

def quality_null_out(df: DataFrame, h: str = "h_li",
                     quality: str = "atl06_quality_summary") -> DataFrame:
    """NULL the height where the quality summary flags the row bad."""
    return null_out(df, F.col(quality) == 0, h) if quality else df
