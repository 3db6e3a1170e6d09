"""Time-scale conversions + date-from-filename (SURVEY §2.8 F4/F5).

All pure column arithmetic (codegen'd). The constants are the
reference's epoch offsets:
- ATLAS epoch (2018-01-01) as Matlab datenum 737061 (ATL06_data.py:353-354)
- 2000-01-01 as Matlab datenum 730486 (matlabToYear.py:9-13,
  delta_t_to_Matlab ATL06_data.py:384-385)
- Matlab datenum of 0001-01-01 = 367 (WV_date.py:22-29)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MATLAB_ATLAS_EPOCH = 737061.0
MATLAB_J2K_EPOCH = 730486.0
SECONDS_PER_DAY = 86400.0


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def atlas_delta_time_to_matlab(delta_time: Column | str) -> Column:
    """ATL06 delta_time (s since 2018-01-01) → Matlab datenum
    (ATL06_data.py:353-354)."""
    return F.lit(MATLAB_ATLAS_EPOCH) + _c(delta_time) / F.lit(SECONDS_PER_DAY)


def delta_t_to_matlab(delta_t: Column | str) -> Column:
    """Seconds since 2000-01-01 → Matlab datenum (ATL06_data.py:384-385)."""
    return F.lit(MATLAB_J2K_EPOCH) + _c(delta_t) / F.lit(SECONDS_PER_DAY)


def matlab_to_year(t: Column | str) -> Column:
    """Matlab datenum → approximate decimal year (matlabToYear.py:9-13)."""
    return (_c(t) - F.lit(MATLAB_J2K_EPOCH)) / F.lit(365.25) + F.lit(2000.0)


def date_from_filename(filename: Column | str,
                       pattern: str = r"_(2\d\d\d)(\d\d)(\d\d)_") -> Column:
    """Extract a YYYYMMDD date embedded in a filename (WV_date.py:10-15,
    qfit_data.py:64-66) as a DATE column; NULL when absent."""
    c = _c(filename)
    y = F.regexp_extract(c, pattern, 1)
    mo = F.regexp_extract(c, pattern, 2)
    d = F.regexp_extract(c, pattern, 3)
    return F.when(y != "", F.make_date(y.cast("int"), mo.cast("int"),
                                       d.cast("int")))


def date_to_matlab(dt: Column | str) -> Column:
    """DATE → Matlab datenum (WV_MatlabDate, WV_date.py:22-29):
    days since 0001-01-01 plus the 367-day Matlab origin offset."""
    return (F.datediff(_c(dt), F.lit("0001-01-01").cast("date"))
            + F.lit(367.0)).cast("double")


def date_to_decimal_year(dt: Column | str) -> Column:
    """DATE → decimal year (WV_year, WV_date.py:17-20)."""
    return (F.lit(2000.0)
            + F.datediff(_c(dt), F.lit("2000-01-01").cast("date")) / F.lit(365.25))


def days_j2k(date_col: Column | str, rel_time_s: Column | str) -> Column:
    """Qfit days_J2K: whole days from 2000-01-01 to the file date plus
    in-day seconds/86400 (qfit_data.py:70-74,89-93)."""
    base = F.datediff(_c(date_col), F.lit("2000-01-01").cast("date")).cast("double")
    return base + _c(rel_time_s) / F.lit(SECONDS_PER_DAY)


def events_tus(df, col: str = "ts") -> Column:
    """`events.ts` → integer microseconds since epoch, dispatching on
    the dtype Spark actually read (the driver's parquet has switched
    physical type between rounds: timestamp[ns] reads as BIGINT under
    ``nanosAsLong``; timestamp[us] reads as TIMESTAMP_NTZ, where that
    conf silently no-ops). One load-boundary branch, so every consumer
    (batch sessionization, streaming ingest/sessions) stays in exact
    long arithmetic that matches DuckDB's ``epoch_us(ts)``:

    - TIMESTAMP_NTZ: wall-clock diff from the NTZ epoch literal —
      timezone-independent (an NTZ→TZ cast would shift by session tz).
    - TIMESTAMP: ``unix_micros`` (already an absolute instant).
    - BIGINT (legacy ns-as-long): exact integer ``DIV 1000``.

    Works on batch and streaming DataFrames (both expose ``dtypes``
    from the analyzed schema)."""
    dt = dict(df.dtypes).get(col)
    if dt == "timestamp_ntz":
        return F.expr(
            f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', {col})")
    if dt == "timestamp":
        return F.unix_micros(F.col(col))
    if dt == "bigint":
        return F.expr(f"{col} DIV 1000")
    raise TypeError(f"events.{col} has unsupported dtype {dt!r}; "
                    "expected timestamp, timestamp_ntz, or bigint")


def ts_micros(ns_long: Column | str) -> Column:
    """Nanosecond-long epoch (the events table read with nanosAsLong)
    → TIMESTAMP (microsecond precision). Exact integer division:
    epoch nanoseconds (~1.7e18) exceed double's 2^53 exact range
    (ulp ≈ 256 ns there), so a float divide can drift by ±1 µs.
    `DIV` stays in pure long arithmetic (exact for non-negative epoch
    ns) — the same `ts DIV 1000` the streaming/session paths use.
    A Column argument falls back to exact decimal division (`DIV` has
    no Column-API equivalent; remainder-subtraction keeps the decimal
    quotient integral so the long cast is exact)."""
    if isinstance(ns_long, str):
        return F.expr(f"timestamp_micros({ns_long} DIV 1000)")
    c = ns_long.cast("long")
    exact = (c - (c % F.lit(1000))).cast("decimal(38,0)") / F.lit(1000)
    return F.timestamp_micros(exact.cast("long"))
