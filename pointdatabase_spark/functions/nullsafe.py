"""NULL/NaN discipline (SURVEY §1.2).

Engine convention: **NULL means missing/invalid** (Catalyst-native,
skippable via Parquet stats); NaN only ever appears transiently out of
float arithmetic. The reference instead fills invalid with NaN
(ATL06_data.py:124-131) and filters with np.isfinite — ``finite`` is
the translation of those filters.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def finite(col: Column | str) -> Column:
    """True where the value is present and not NaN (np.isfinite analog,
    reference ATL06_tiles.py:69)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.isNotNull() & ~F.isnan(c)


def nan_to_null(col: Column | str) -> Column:
    """Normalize NaN → NULL so downstream Parquet stats stay usable."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(F.isnan(c), F.lit(None)).otherwise(c)


def fill_value_to_null(col: Column | str, fill_value: float = -9999.0) -> Column:
    """Sentinel → NULL on ingest (reference _FillValue/-9999 handling,
    ATL06_data.py:174-179)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c == F.lit(fill_value), F.lit(None)).otherwise(c)
