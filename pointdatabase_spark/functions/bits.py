"""Bit extraction (SURVEY §2.8 F6) — the reference's Fortran-style
``ibits(ival, ipos, ilen)`` used to pull the land bit out of the
surf_type mask (read_surfmask.py:123-126,208-211)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def ibits(col: Column | str, pos: int, length: int) -> Column:
    """Extract `length` bits starting at bit `pos` (LSB=0)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.shiftright(c, pos).bitwiseAND(F.lit((1 << length) - 1))


def land_bit(col: Column | str) -> Column:
    """Land flag = bit 0 of surf_type (read_surfmask.py:208-211)."""
    return ibits(col, 0, 1) == 1
