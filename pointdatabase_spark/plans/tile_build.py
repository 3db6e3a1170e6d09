"""Tile-build pipeline — the reference's entire write path
(SURVEY §3.2: index → queue → xargs → make_tile, ATL06_tiles.py:30-107
+ run_tile_updates) as ONE declarative Spark job.

Reference flow per tile process: query index bins → per-source quality
NULL-out → optional seg-difference filter → optional blockmedian →
concat → sort by (bin, time) → write per-bin groups. Here the shell
queue and xargs -P 8 dissolve into Spark task scheduling; the
per-tile process boundary becomes the repartition-by-tile shuffle.

Incremental ingest (run_tile_updates per-cycle re-runs) maps to
``append_cycle``: write the new cycle's rows with dynamic partition
overwrite — only affected tile directories are rewritten.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from pointdatabase_spark.operators import filters, setops, spatial
from pointdatabase_spark.sources import tile_store


def prepare_points(df: DataFrame,
                   h: str = "h_li",
                   quality: str | None = "atl06_quality_summary",
                   track_cols: list[str] | None = None,
                   order_cols: list[str] | str | None = None,
                   seg_diff_tol: float | None = None,
                   slope: str = "dh_fit_dx") -> DataFrame:
    """Per-source cleanup before tiling (make_tile, ATL06_tiles.py:61-78):
    quality NULL-out (P11), optional seg-difference subset (P9),
    drop rows with missing height (P6)."""
    from pyspark.sql import functions as F
    out = df
    if quality is not None and quality in df.columns:
        out = filters.quality_null_out(out, h=h, quality=quality)
    if seg_diff_tol is not None:
        out = filters.seg_difference_mask(out, track_cols, order_cols,
                                          h=h, slope=slope, tol=seg_diff_tol)
        out = out.where(F.col("seg_diff_ok")).drop("seg_diff_ok")
    return out.where(F.col(h).isNotNull() & ~F.isnan(h))


def build_tiles(sources: list[DataFrame], path: str,
                bin_delta=tile_store.DEFAULT_BIN,
                tile_delta=tile_store.DEFAULT_TILE,
                x: str = "x", y: str = "y",
                order_cols: list[str] | None = None,
                blockmedian_scale: float | None = None,
                h: str = "h_li", **prepare_kwargs) -> None:
    """End-to-end tile build: prepare each source → concat (U1) →
    optional blockmedian decimation (A1, blockmedian_scale as in
    ATL06_tiles.py:73-78) → partitioned, bin-sorted write (S11)."""
    prepared = [prepare_points(s, h=h, **prepare_kwargs) for s in sources]
    merged = setops.concat(prepared)
    if blockmedian_scale:
        merged = spatial.blockmedian(merged, blockmedian_scale, x=x, y=y, z=h)
    tile_store.write_tiles(merged, path, bin_delta, tile_delta,
                           x=x, y=y, order_cols=order_cols)


def append_cycle(df: DataFrame, path: str, **kwargs) -> None:
    """Incremental per-cycle append: new rows add files to the tiles
    they touch; untouched tile directories are not rewritten (the
    arrival half of the reference's queue-driven update,
    run_tile_updates:6-24)."""
    tile_store.write_tiles(df, path, mode="append", **kwargs)


def recompute_tiles(df: DataFrame, path: str, **kwargs) -> None:
    """Idempotent re-materialization of affected tiles: `df` must hold
    the FULL recomputed content of the tiles it covers; dynamic
    partition overwrite replaces exactly those tile directories and no
    others (the re-run half of the reference's queue flow — crashed or
    re-queued tiles are simply re-made, cross_ATL06_tile.py:89-99)."""
    tile_store.write_tiles(df, path, mode="overwrite", **kwargs)
