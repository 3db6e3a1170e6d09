"""Source converters (S1-S3): HDF5 point files → tidy Parquet.

The reference reads science HDF5 directly per query (point_data.py:
87-133, ATL06_data.py:82-206, qfit_data.py:60-97). The Spark engine
instead runs a ONE-TIME conversion job per arriving file — HDF5 is a
poor scan format for distributed engines (no row-group pruning, no
column statistics), Parquet is the native one; after conversion every
downstream query gets pushdown/pruning for free (SURVEY §2.1 S1-S3).

Structure:

- the *transform* layer (field-dict flattening, N×2 beam-pair →
  tidy rows with an `LR` column, `_FillValue`→NULL, derived columns
  `BP`/`spot`/`rgt`/`cycle_number`) is pure and fully tested — it
  operates on any Mapping[str, np.ndarray];
- the *I/O* layer reads .h5 through the stdlib codec in
  `sources/hdf5.py` (superblock v0, old-style groups, contiguous +
  chunked/gzip/shuffle datasets — the official-granule subset); h5py
  is preferred when importable. `distributed_point_scan` fans the
  per-granule reads out across executors via mapInPandas — the
  reference's `xargs -P 8` unit becomes a Spark task.

Reference parity notes:
- fill→NaN: ATL06_data.py:124-131,174-179 (we map to NULL per the §1.2
  NULL-vs-NaN decision);
- LR/BP materialized as columns: ATL06_data.py:138-144 (proves the
  tidy layout is semantically sufficient);
- spot number from beam/orientation: constant-per-file metadata,
  carried as a plain column;
- sigma_geo_r default 0.03: ATL06_data.py ctor default.
"""

from __future__ import annotations

from collections.abc import Mapping

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

# Mirrors the reference's default field_dict (ATL06_data.py:71-80):
# group None = land_ice_segments root.
ATL06_FIELD_DICT: dict[str | None, list[str]] = {
    None: ["latitude", "longitude", "h_li", "h_li_sigma",
           "atl06_quality_summary", "segment_id", "delta_time"],
    "ground_track": ["x_atc", "y_atc", "seg_azimuth"],
    "fit_statistics": ["dh_fit_dx", "dh_fit_dy", "h_robust_sprd",
                       "snr_significance", "n_fit_photons",
                       "w_surface_window_final"],
}

PAIRS = ("gt1", "gt2", "gt3")


def flatten_field_dict(field_dict: Mapping[str | None, list[str]]
                       ) -> list[tuple[str, str]]:
    """(h5-subpath, column-name) pairs; group hierarchy flattens into a
    single namespace exactly like point_data.py:44-49."""
    out = []
    for group, fields in field_dict.items():
        for f in fields:
            out.append((f if group is None else f"{group}/{f}", f))
    return out


def beam_pair_frame(data: Mapping[str, np.ndarray], pair_num: int,
                    field_dict: Mapping[str | None, list[str]]
                    | None = None,
                    fill_value: float = -9999.0,
                    beam_meta: Mapping[str, Mapping] | None = None
                    ) -> pd.DataFrame:
    """Tidy rows for one beam pair from a flat {path: array} mapping
    with keys like 'gt1l/h_li'. The N×2 left/right structure becomes a
    long layout with LR ∈ {0, 1} and BP = pair number — the reference's
    own materialized columns (ATL06_data.py:138-144)."""
    field_dict = field_dict or ATL06_FIELD_DICT
    frames = []
    for lr, side in enumerate("lr"):
        beam = f"gt{pair_num}{side}"
        cols: dict[str, np.ndarray] = {}
        n = None
        for path, name in flatten_field_dict(field_dict):
            arr = data.get(f"{beam}/{path}")
            if arr is not None:
                arr = np.asarray(arr, dtype=np.float64)
                # fill → NaN (→ NULL at Spark ingest), ATL06_data.py:174-179
                arr = np.where(arr == fill_value, np.nan, arr)
                n = len(arr)
            cols[name] = arr
        if n is None:
            continue
        for name, arr in cols.items():
            if arr is None:  # absent field → all-NULL (point_data.py:123-130)
                cols[name] = np.full(n, np.nan)
        f = pd.DataFrame(cols)
        f["BP"] = pair_num
        f["LR"] = lr
        # per-beam metadata → derived columns (ATL06_data.py:145-154):
        # spot from the beam's atlas_spot_number attr; n_pixels 4 for a
        # weak beam, 16 for strong
        meta = (beam_meta or {}).get(beam, {})
        if "atlas_spot_number" in meta:
            f["spot"] = float(meta["atlas_spot_number"])
        if "atlas_beam_type" in meta:
            bt = str(meta["atlas_beam_type"])
            f["beam_type"] = bt
            f["n_pixels"] = 4.0 if bt == "weak" else 16.0
        frames.append(f)
    if not frames:
        return pd.DataFrame()
    return pd.concat(frames, ignore_index=True)


def atl06_frame(data: Mapping[str, np.ndarray], rgt: int,
                cycle_number: int,
                field_dict: Mapping[str | None, list[str]] | None = None,
                beam_meta: Mapping[str, Mapping] | None = None
                ) -> pd.DataFrame:
    """All three beam pairs + per-file derived columns."""
    frames = [beam_pair_frame(data, p, field_dict, beam_meta=beam_meta)
              for p in (1, 2, 3)]
    out = pd.concat([f for f in frames if len(f)], ignore_index=True)
    out["rgt"] = rgt
    out["cycle_number"] = cycle_number
    out["sigma_geo_r"] = 0.03  # ATL06_data.py ctor default
    return out


def ingest_frame(spark: SparkSession, frame: pd.DataFrame,
                 source_file: str) -> DataFrame:
    """pandas → Spark with NaN→NULL and provenance column."""
    from pyspark.sql import functions as F
    df = spark.createDataFrame(frame)
    for c, t in df.dtypes:
        if t == "double":
            df = df.withColumn(
                c, F.when(F.isnan(F.col(c)), None).otherwise(F.col(c)))
    return df.withColumn("source_file", F.lit(source_file))


def _atl06_h5_paths(field_dict: Mapping[str | None, list[str]]
                    | None = None) -> list[tuple[str, str]]:
    """(full h5 path, flat key) for every beam × field. Official files
    nest fields under ``gtXY/land_ice_segments`` (ATL06_data.py:95)."""
    field_dict = field_dict or ATL06_FIELD_DICT
    out = []
    for pair in (1, 2, 3):
        for side in "lr":
            beam = f"gt{pair}{side}"
            for sub, name in flatten_field_dict(field_dict):
                out.append((f"{beam}/land_ice_segments/{sub}",
                            f"{beam}/{sub}"))
    return out


def load_atl06_h5(h5_path: str,
                  field_dict: Mapping[str | None, list[str]] | None = None
                  ) -> tuple[dict[str, np.ndarray], dict[str, dict]]:
    """Read one official-layout ATL06 granule: the flat {beam/path:
    array} mapping `atl06_frame` consumes plus the per-beam group
    attributes (atlas_spot_number, atlas_beam_type — ATL06_data.py:
    145-154 derived columns) — stdlib HDF5 codec (sources/hdf5.py),
    with h5py used instead when importable."""
    paths = _atl06_h5_paths(field_dict)
    beams = sorted({full.split("/")[0] for full, _ in paths})
    try:  # pragma: no cover - h5py not shipped in this container
        import h5py
        with h5py.File(h5_path, "r") as h5:
            data = {key: h5[full][...]
                    for full, key in paths if full in h5}
            meta = {b: dict(h5[b].attrs) for b in beams if b in h5}
            return data, meta
    except ImportError:
        from pointdatabase_spark.sources import hdf5 as _h5
        root = _h5.read_h5(h5_path)
        got = {}
        for full, key in paths:
            try:
                node = root[full]
            except KeyError:
                continue
            got[key] = node[...]
        meta = {}
        for b in beams:
            try:
                meta[b] = dict(root[b].attrs)
            except KeyError:
                pass
        return got, meta


def convert_atl06(spark: SparkSession, h5_path: str, out_path: str,
                  rgt: int, cycle_number: int) -> None:
    """S2 converter job: official ATL06 H5 → tidy Parquet
    (ATL06_data.py:82-206 read semantics, re-expressed as a one-time
    conversion)."""
    data, meta = load_atl06_h5(h5_path)
    frame = atl06_frame(data, rgt, cycle_number, beam_meta=meta)
    ingest_frame(spark, frame, h5_path).write.mode("overwrite") \
        .parquet(out_path)


# ---------------------------------------------------------------------------
# S3 Qfit/ATM converter transform layer (qfit_data.py:16-97). The
# reference reads TWO HDF5 layouts, selected by `waveform_format`
# (qfit_data.py:20-26):
#   plain:    {None: [latitude, longitude, elevation],
#              instrument_parameters: [azimuth, rel_time]}
#   waveform: {footprint: [latitude, longitude, elevation],
#              time: [seconds_of_day]}
# and derives days_J2K differently (qfit_data.py:70-74, 95-96):
#   plain:    t0 = full filename timestamp (date + HMS) as fractional
#             days since 2000-01-01; days_J2K = rel_time/86400 + t0
#   waveform: t0 = filename DATE only; days_J2K =
#             (date - 2000-01-01).days + seconds_of_day/86400
# ---------------------------------------------------------------------------

QFIT_FIELD_DICT: dict[str | None, list[str]] = {
    None: ["latitude", "longitude", "elevation"],
    "instrument_parameters": ["azimuth", "rel_time"],
}

QFIT_WAVEFORM_FIELD_DICT: dict[str | None, list[str]] = {
    "footprint": ["latitude", "longitude", "elevation"],
    "time": ["seconds_of_day"],
}

_QFIT_TIME_RE = r"ATM1B.*_(\d\d\d\d)(\d\d)(\d\d)_(\d\d)(\d\d)(\d\d)"


def qfit_filename_time(filename: str) -> tuple[int, int, int, int, int, int]:
    """(Y, M, D, h, m, s) from an ATM1B filename (qfit_data.py:64-65)."""
    import re
    m = re.search(_QFIT_TIME_RE, filename)
    if m is None:
        raise ValueError(f"no ATM1B timestamp in filename: {filename!r}")
    return tuple(int(m.group(i + 1)) for i in range(6))  # type: ignore


def qfit_frame(data: Mapping[str, np.ndarray], filename: str,
               waveform_format: bool = False) -> pd.DataFrame:
    """Tidy rows for one Qfit granule from a flat {h5-path: array}
    mapping, covering both reference layouts. Column names are the
    flattened field names; `days_J2K` is the derived `__calc_internal__`
    field (qfit_data.py:27-28)."""
    from datetime import date, datetime

    field_dict = (QFIT_WAVEFORM_FIELD_DICT if waveform_format
                  else QFIT_FIELD_DICT)
    cols: dict[str, np.ndarray] = {}
    n = 0
    for path, name in flatten_field_dict(field_dict):
        arr = data.get(path)
        if arr is not None:
            cols[name] = np.asarray(arr, dtype=np.float64)
            n = len(cols[name])
    for path, name in flatten_field_dict(field_dict):
        if name not in cols:  # absent field → all-NULL column
            cols[name] = np.full(n, np.nan)
    y, mo, d, hh, mm, ss = qfit_filename_time(filename)
    if waveform_format:
        # date-only origin + in-day seconds (qfit_data.py:71, 95-96)
        day0 = (date(y, mo, d) - date(2000, 1, 1)).days
        cols["days_J2K"] = day0 + cols["seconds_of_day"] / 24.0 / 3600.0
    else:
        # full timestamp origin + relative seconds (qfit_data.py:73-74,
        # 89-93)
        t0 = datetime(y, mo, d, hh, mm, ss) - datetime(2000, 1, 1)
        t0 = t0.days + t0.seconds / 24.0 / 3600.0
        cols["days_J2K"] = cols["rel_time"] / 24.0 / 3600.0 + t0
    return pd.DataFrame(cols)


def load_qfit_h5(h5_path: str, waveform_format: bool = False
                 ) -> dict[str, np.ndarray]:
    """Read one ATM Qfit granule (either layout) into the flat
    {h5-path: array} mapping `qfit_frame` consumes."""
    field_dict = (QFIT_WAVEFORM_FIELD_DICT if waveform_format
                  else QFIT_FIELD_DICT)
    paths = [p for p, _ in flatten_field_dict(field_dict)]
    try:  # pragma: no cover - h5py not shipped in this container
        import h5py
        with h5py.File(h5_path, "r") as h5:
            return {p: h5[p][...] for p in paths if p in h5}
    except ImportError:
        from pointdatabase_spark.sources import hdf5 as _h5
        return _h5.load_fields(h5_path, paths)


def convert_qfit(spark: SparkSession, h5_path: str, out_path: str,
                 waveform_format: bool = False) -> None:
    """S3 converter job: ATM Qfit H5 → tidy Parquet (either layout,
    qfit_data.py:60-97 read semantics)."""
    frame = qfit_frame(load_qfit_h5(h5_path, waveform_format), h5_path,
                       waveform_format)
    ingest_frame(spark, frame, h5_path).write.mode("overwrite") \
        .parquet(out_path)


def distributed_point_scan(spark: SparkSession, h5_paths: list[str],
                           loader, schema: str) -> DataFrame:
    """S1 generic H5 point scan, distributed: one executor task per
    granule (the reference's per-process unit, run_tile_updates:18
    ``xargs -P 8`` — here it is Spark task scheduling over a paths
    frame). ``loader(path) -> pd.DataFrame`` runs inside mapInPandas
    with the pure-Python codec shipped in the closure; ``schema`` is
    the output DDL. Granules stream straight into downstream
    transforms with no driver round-trip."""
    paths_df = spark.createDataFrame([(p,) for p in h5_paths],
                                     "h5_path string").repartition(
        max(len(h5_paths), 1))

    def scan(batches):
        for pdf in batches:
            for p in pdf["h5_path"]:
                frame = loader(p)
                frame["source_file"] = p
                yield frame

    return paths_df.mapInPandas(scan, schema=schema + ", source_file string")
