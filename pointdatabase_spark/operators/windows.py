"""Along-track window derivations (reference ATL06_data.py:356-382,
SURVEY §2.5 W1/W3).

The reference computes these with whole-array shifts per track; here
they are lag/lead over ``Window.partitionBy(track).orderBy(order)`` —
one shuffle on the track key, all expressions codegen'd.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _neighbor_misfits(h: str, x: str, slope: str, w):
    """Slope-corrected height misfit vs the previous / next segment:
    h[i] − s[i]·(x[i] − x[i±1]) − h[i±1] (reference ATL06_data.py:359-363).
    NULL where the neighbor does not exist."""
    hc, xc, sc = F.col(h), F.col(x), F.col(slope)
    prev = hc - sc * (xc - F.lag(xc).over(w)) - F.lag(hc).over(w)
    nxt = hc - sc * (xc - F.lead(xc).over(w)) - F.lead(hc).over(w)
    return prev, nxt


def rss_along_track_dh(df: DataFrame, track_cols: list[str], order_cols: str | list[str],
                       h: str = "h_li", x: str = "x_atc",
                       slope: str = "dh_fit_dx",
                       out: str = "rss_along_track_dh") -> DataFrame:
    """RSS of the available neighbor misfits (ATL06_data.py:356-367):
    interior rows sqrt(prev² + next²); endpoints use their single
    neighbor; singleton tracks → 0 (the reference's zero-init)."""
    order = [order_cols] if isinstance(order_cols, str) else list(order_cols)
    w = Window.partitionBy(*track_cols).orderBy(*order)
    prev, nxt = _neighbor_misfits(h, x, slope, w)
    rss = F.sqrt(F.coalesce(prev * prev, F.lit(0.0))
                 + F.coalesce(nxt * nxt, F.lit(0.0)))
    return df.withColumn(out, rss)


def min_along_track_dh(df: DataFrame, track_cols: list[str], order_cols: str | list[str],
                       h: str = "h_li", x: str = "x_atc",
                       slope: str = "dh_fit_dx",
                       out: str = "min_along_track_dh") -> DataFrame:
    """Min |neighbor misfit| (ATL06_data.py:369-382): interior rows
    min(|prev|, |next|); endpoints their single neighbor; singleton
    tracks → NULL (the reference emits NaN)."""
    order = [order_cols] if isinstance(order_cols, str) else list(order_cols)
    w = Window.partitionBy(*track_cols).orderBy(*order)
    prev, nxt = _neighbor_misfits(h, x, slope, w)
    # least() skips NULLs (returns the smallest non-null), matching the
    # reference's nanmin; both NULL → NULL.
    return df.withColumn(out, F.least(F.abs(prev), F.abs(nxt)))
