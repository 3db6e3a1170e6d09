"""ATL11 (ICESat-2 annual land-ice height) reader — the last
reference-visible file type the engine lacked: the reference's
geo-index dispatches 'ATL11' to an external reader package
(reference geo_index.py:22, 245-259 builds the index from
corrected_h lat/lon per beam pair; geo_index.py:542-549 reads
pair-sliced granules back; IndexPicker.py:53-60 is the canonical
field dict, IndexPicker.py:137-151 plots ref_pt x 20 vs
h_corr[:, cycle]).

Shape of the product: per beam pair (groups ``pt1 pt2 pt3``), the
``corrected_h`` group holds per-reference-point vectors (``ref_pt``,
``latitude``, ``longitude``) and per-point-PER-CYCLE matrices
(``h_corr``, ``h_corr_sigma``, ``delta_time`` — N×C, one column per
repeat cycle), i.e. the already-crossover-corrected height time
series at each along-track reference point.

Tidy conversion (the Spark-friendly long layout, same move as the
ATL06 N×2 → LR rows in sources/converters.py): each N×C matrix
explodes to one row per (ref_pt, cycle_number), vectors broadcast
across cycles, fill → NaN → NULL.  Downstream, per-point cycle
collapse (``cycle_collapse``) is one groupBy over the tidy rows.
"""

from __future__ import annotations

from collections.abc import Mapping

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# IndexPicker.py:53-60 field dict: the corrected-height surface the
# index queries touch; crossing_track_data (the crossover partners at
# each reference point, a separate already-tidy point list) has its
# own frame function below
ATL11_FIELD_DICT: dict[str | None, list[str]] = {
    "corrected_h": ["latitude", "longitude", "delta_time",
                    "h_corr", "h_corr_sigma", "ref_pt",
                    "quality_summary"],
    "cycle_stats": ["ATL06_summary_zero_count"],
    "ref_surf": ["x_atc", "y_atc"],
}

# crossing_track_data per IndexPicker.py:56-59 — 1-D per-crossing
# vectors (no cycle matrix: each crossing IS one (rgt, cycle) visit)
ATL11_XING_FIELDS = ["ref_pt", "delta_time", "h_corr", "h_corr_sigma",
                     "rgt", "cycle_number", "spot_crossing",
                     "along_track_rss", "atl06_quality_summary"]

# per-point vectors (broadcast across cycles); everything else in the
# field dict is an N×C per-cycle matrix
_PER_POINT = {"latitude", "longitude", "ref_pt", "x_atc", "y_atc"}


def atl11_frame(data: Mapping[str, np.ndarray], pair_num: int,
                fill_value: float = -9999.0) -> pd.DataFrame:
    """Tidy rows for one beam pair from a flat {'ptX/group/field':
    array} mapping: N×C cycle matrices → long layout with
    ``cycle_number`` ∈ 1..C, per-point vectors repeated per cycle,
    fill → NaN.  ``cycle_number`` honors a ``ptX/cycle_number``
    vector when present (granules carry the real cycle ids), else
    1..C."""
    beam = f"pt{pair_num}"
    vecs: dict[str, np.ndarray] = {}
    mats: dict[str, np.ndarray] = {}
    n = n_cyc = None
    for group, fields in ATL11_FIELD_DICT.items():
        for f in fields:
            arr = data.get(f"{beam}/{group}/{f}")
            if arr is None:
                continue
            arr = np.asarray(arr, dtype=np.float64)
            arr = np.where(arr == fill_value, np.nan, arr)
            if f in _PER_POINT:
                vecs[f] = arr
                n = len(arr)
            else:
                if arr.ndim == 1:       # single-cycle granule
                    arr = arr[:, None]
                mats[f] = arr
                n, n_cyc = arr.shape
    if n is None:
        return pd.DataFrame()
    n_cyc = n_cyc or 1
    cyc = data.get(f"{beam}/cycle_number")
    cyc = (np.asarray(cyc, dtype=np.float64)[:n_cyc] if cyc is not None
           else np.arange(1, n_cyc + 1, dtype=np.float64))
    cols: dict[str, np.ndarray] = {
        name: np.repeat(v, n_cyc) for name, v in vecs.items()}
    cols.update({name: m.reshape(-1) for name, m in mats.items()})
    cols["cycle_number"] = np.tile(cyc, n)
    out = pd.DataFrame(cols)
    out["pair"] = pair_num
    return out


def atl11_xing_frame(data: Mapping[str, np.ndarray], pair_num: int,
                     fill_value: float = -9999.0) -> pd.DataFrame:
    """Tidy rows for one pair's ``crossing_track_data`` group — the
    crossover partners the reference differences against the
    along-track series (IndexPicker.py:137-151 ``get_xovers``).
    Already per-crossing 1-D vectors; fill → NaN, pair column added."""
    beam = f"pt{pair_num}"
    cols: dict[str, np.ndarray] = {}
    n = None
    for f in ATL11_XING_FIELDS:
        arr = data.get(f"{beam}/crossing_track_data/{f}")
        if arr is None:
            continue
        arr = np.asarray(arr, dtype=np.float64).reshape(-1)
        cols[f] = np.where(arr == fill_value, np.nan, arr)
        n = len(arr)
    if n is None:
        return pd.DataFrame()
    for f in ATL11_XING_FIELDS:
        if f not in cols:
            cols[f] = np.full(n, np.nan)
    out = pd.DataFrame(cols)
    out["pair"] = pair_num
    return out


def load_atl11_h5(h5_path: str) -> dict[str, np.ndarray]:
    """Flat {'ptX/group/field': array} for all three pairs — stdlib
    HDF5 codec (sources/hdf5.py), h5py when importable; missing
    groups/fields are simply absent (the reference wraps each pair's
    read in try/except for the same reason, geo_index.py:249-258)."""
    paths = [f"pt{p}/{g}/{f}"
             for p in (1, 2, 3)
             for g, fs in ATL11_FIELD_DICT.items() for f in fs]
    paths += [f"pt{p}/cycle_number" for p in (1, 2, 3)]
    paths += [f"pt{p}/crossing_track_data/{f}"
              for p in (1, 2, 3) for f in ATL11_XING_FIELDS]
    try:  # pragma: no cover - h5py not shipped in this container
        import h5py
        with h5py.File(h5_path, "r") as h5:
            return {p: h5[p][...] for p in paths if p in h5}
    except ImportError:
        from pointdatabase_spark.sources import hdf5 as _h5
        root = _h5.read_h5(h5_path)
        got = {}
        for p in paths:
            try:
                got[p] = root[p][...]
            except KeyError:
                continue
        return got


def convert_atl11(spark: SparkSession, h5_path: str, out_path: str
                  ) -> None:
    """ATL11 H5 granule → tidy Parquet, all three beam pairs (the
    reference's per-pair ATL11.data().from_file loop,
    geo_index.py:247-255, as a one-time conversion)."""
    from pointdatabase_spark.sources.converters import ingest_frame
    frames = [atl11_frame(load_atl11_h5(h5_path), p) for p in (1, 2, 3)]
    frame = pd.concat([f for f in frames if len(f)], ignore_index=True)
    ingest_frame(spark, frame, h5_path).write.mode("overwrite") \
        .parquet(out_path)


def xover_difference(tidy: DataFrame, xing: DataFrame) -> DataFrame:
    """Crossing-track minus along-track height at each reference
    point and cycle — the delta the reference's ATL11 picker plots
    (IndexPicker.py:146-149: ``get_xovers`` then scatter of
    ``delta.h``).  One equi-join on (pair, ref_pt, cycle_number):
    both sides are keyed point lists, so this is a plain key-hash
    shuffle at any scale — no geometry recomputation (ATL11 already
    did the crossover search upstream)."""
    own = tidy.select("pair", "ref_pt", "cycle_number",
                      F.col("h_corr").alias("h_own"))
    x = xing.select("pair", "ref_pt", "cycle_number",
                    F.col("rgt").alias("xing_rgt"),
                    F.col("h_corr").alias("h_xing"))
    return (x.join(own, ["pair", "ref_pt", "cycle_number"])
            .where(F.col("h_own").isNotNull()
                   & F.col("h_xing").isNotNull())
            .select("pair", "ref_pt", "cycle_number", "xing_rgt",
                    "h_own", "h_xing",
                    (F.col("h_xing") - F.col("h_own")).alias("dh_xo")))


def cycle_collapse(tidy: DataFrame,
                   keys: list[str] | None = None) -> DataFrame:
    """Per-reference-point corrected-height cycle statistics over the
    tidy layout — the query the reference's ATL11 plots answer
    per-picked-point (IndexPicker.py:137-146: h_corr against ref_pt
    for a chosen cycle, sigma-colored): valid-cycle count, mean
    height, the latest valid cycle's height, and the first→last
    height change (the dh/dt numerator for annual products).

    One groupBy over (pair, ref_pt) — N×C rows in, N out, a single
    key-hash exchange at any scale; min_by/max_by keep it one pass."""
    keys = keys or ["pair", "ref_pt"]
    valid = tidy.where(F.col("h_corr").isNotNull())
    return (valid.groupBy(*keys)
            .agg(F.count(F.lit(1)).alias("n_cycles"),
                 F.avg("h_corr").alias("h_mean"),
                 F.max("cycle_number").alias("last_cycle"),
                 F.expr("max_by(h_corr, cycle_number)").alias("h_last"),
                 F.expr("min_by(h_corr, cycle_number)").alias("h_first"),
                 (F.expr("max_by(h_corr, cycle_number)")
                  - F.expr("min_by(h_corr, cycle_number)")).alias("dh"))
            )
