"""Cross-engine bit-deterministic rounding.

Spark's ``F.round(x, n)`` routes a DOUBLE through
``BigDecimal.valueOf`` (shortest decimal representation) and rounds
HALF_UP on the decimal digits; DuckDB's ``ROUND(x, n)`` scales the
IEEE double and rounds the scaled value. When ``x * 10^n`` lands
within an ulp of a half-integer the two disagree in the last emitted
digit even though the unrounded doubles are bit-identical — observed
in round 8 as the ``track_resample`` driver-hash failure (1 row of
10,400: Spark 57505.105312 vs DuckDB 57505.105313). At magnitude
~5e4 and n=6 the scaled value is ~5e10 whose ulp (~7e-6) is within
striking distance of the 0.5 tie boundary, so the per-row tie
probability is ~1e-5..1e-4 — small enough to pass for rounds, large
enough to fire eventually.

Fix: compute ``floor(x * 10^n + 0.5) / 10^n`` as the SAME pure-IEEE
expression on both engines. Multiply, add and floor are all exactly
specified by IEEE-754 (correctly rounded), and the floor result is an
exact integer below 2^53, so both engines produce bit-identical
doubles whenever their inputs are bit-identical. (The formula rounds
half-toward-+inf rather than half-away-from-zero for negative ties —
irrelevant for parity, since both sides use the identical formula.)

``qround`` is the engine-side Column; ``qround_sql`` emits the
matching DuckDB SQL text. Use these — never ``F.round`` paired with
SQL ``ROUND`` — for any oracle-compared derived double.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _scale(n: int) -> float:
    return float(10 ** n) if n >= 0 else 1.0 / float(10 ** (-n))


def qround(col: Column | str, n: int = 6) -> Column:
    """floor(x * 10^n + 0.5) / 10^n as a DOUBLE Column.

    Spark's ``floor`` returns LONG; the value is an exact integer
    < 2^53 so the implicit LONG->DOUBLE widening before the divide is
    exact and matches DuckDB's DOUBLE ``floor`` bit-for-bit.
    """
    c = F.col(col) if isinstance(col, str) else col
    s = F.lit(_scale(n))
    return (F.floor(c * s + F.lit(0.5)).cast("double") / s)


def qround_sql(expr: str, n: int = 6) -> str:
    """The DuckDB-side text of the same formula. ``repr(float)`` emits
    the shortest exact decimal, so the SQL literal parses back to the
    identical double used by :func:`qround`."""
    s = repr(_scale(n))
    return f"floor(({expr}) * {s} + 0.5) / {s}"
