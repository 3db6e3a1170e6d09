"""Set operations + key joins (SURVEY §2.3 J1/J2/J6, §2.7 U1-U4).

The reference's concat/merge machinery (point_data.from_list,
geo_index.from_list) maps to unionByName + distinct/semi/anti joins.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def concat(frames: list[DataFrame]) -> DataFrame:
    """U1 — concatenate heterogeneous point sets, unioning the field
    sets and NULL-filling gaps (reference point_data.py:182-204,
    ATL06_data.py:262-284). unionByName is a narrow op — no shuffle."""
    return reduce(lambda a, b: a.unionByName(b, allowMissingColumns=True), frames)


def key_intersect(a: DataFrame, b: DataFrame, keys: list[str]) -> DataFrame:
    """U2/J1 — keys common to two sets (geo_index.intersect,
    geo_index.py:351-361). Broadcast-eligible semi join."""
    return (a.select(*keys).distinct()
            .join(b.select(*keys).distinct(), on=keys, how="left_semi"))


def semi_join(a: DataFrame, b: DataFrame, keys: list[str],
              broadcast_right: bool = True) -> DataFrame:
    """J1/J2 — restrict `a` to rows whose key appears in `b`."""
    right = b.select(*keys).distinct()
    if broadcast_right:
        right = F.broadcast(right)
    return a.join(right, on=keys, how="left_semi")


def anti_join(a: DataFrame, b: DataFrame, keys: list[str]) -> DataFrame:
    """J6/U4 — rows of `a` whose key is NOT in `b` (the reference's
    already-indexed-file skip, geo_index.py:129-156)."""
    return a.join(F.broadcast(b.select(*keys).distinct()), on=keys, how="left_anti")


def key_dedup(df: DataFrame, keys: list[str] | None = None) -> DataFrame:
    """U3 — unique keys/rows (geo_index.unique_points)."""
    return df.select(*keys).distinct() if keys else df.distinct()
