"""Spatial binning expressions.

The reference uses two distinct binning conventions (SURVEY §2.8 F2):

1. **index bins** — ``round(x/Δ)*Δ`` giving the *center* of the bin as a
   coordinate value (reference ``geo_index.py:76,386``). Used for the
   spatial index / partition layout and crossover candidate search.
2. **aggregation cells** — ``floor((x-x0)/Δ)`` giving an integer *cell
   index* (reference ``pt_blockmedian.py:21-22``, ``blockmax.py:13-14``).
   Used by blockmedian / blockmax.

Both are plain column expressions so they stay inside WholeStageCodegen
and — when used on partition columns — drive Catalyst partition pruning.

NumPy ``np.round`` rounds half-to-even; Spark's ``round`` is HALF_UP.
For bin centers the inputs are continuous coordinates, where the measure
of exact half-multiples is zero, so we use ``round`` (HALF_EVEN matters
only for adversarial inputs; ``bin_center_half_even`` is provided for
bit parity when needed).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def bin_center(col: Column | str, delta: float) -> Column:
    """Reference index-bin convention: round(x/Δ)*Δ (bin center coord)."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.round(c / F.lit(float(delta)), 0) * F.lit(float(delta))).cast("double")


def bin_center_half_even(col: Column | str, delta: float) -> Column:
    """Bit-parity variant of :func:`bin_center` using banker's rounding
    (NumPy ``np.round`` semantics, reference geo_index.py:76)."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.bround(c / F.lit(float(delta)), 0) * F.lit(float(delta))).cast("double")


def cell_index(col: Column | str, delta: float, origin: float = 0.0) -> Column:
    """Reference aggregation-cell convention: floor((x - x0)/Δ) as int
    (pt_blockmedian.py:21-22)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.floor((c - F.lit(float(origin))) / F.lit(float(delta))).cast("long")


def bin_key(bin_x: Column | str, bin_y: Column | str) -> Column:
    """String key '{x}_{y}' (reference geo_index.py:84). Kept for
    API familiarity; the engine itself keeps two numeric columns —
    strings defeat min/max pruning."""
    bx = F.col(bin_x) if isinstance(bin_x, str) else bin_x
    by = F.col(bin_y) if isinstance(bin_y, str) else bin_y
    return F.concat_ws("_", bx.cast("long"), by.cast("long"))


def radial_angular_key(bin_x_units: Column | str,
                       bin_y_units: Column | str) -> Column:
    """O1 — the reference's stable bin ordering (geo_index.py:80-83):
    ``sqrt(bx² + by²) + (atan2(bx, by) + π)/2/π`` over bin *units*
    (round(x/Δ)). Radial shells first, angle within a shell — only
    needed when reproducing reference index key order (not semantic)."""
    import math
    bx = F.col(bin_x_units) if isinstance(bin_x_units, str) else bin_x_units
    by = F.col(bin_y_units) if isinstance(bin_y_units, str) else bin_y_units
    # −0.0 flips atan2 across the ±π branch cut; normalize explicitly
    # (a CASE, not `+0.0`, so no optimizer may fold it away).
    bx = F.when(bx == 0, F.lit(0.0)).otherwise(bx)
    by = F.when(by == 0, F.lit(0.0)).otherwise(by)
    return (F.sqrt(bx * bx + by * by)
            + (F.atan2(bx, by) + F.lit(math.pi)) / 2 / F.lit(math.pi))


def neighbor_offsets(pad: int = 1) -> list[tuple[int, int]]:
    """(dx, dy) offsets of the (2·pad+1)² bin neighborhood — the
    reference's ``pad_bins`` / ``dilate_bins`` dilation
    (geo_index.py:591-603, xover_search.py:12-21)."""
    return [(dx, dy) for dx in range(-pad, pad + 1) for dy in range(-pad, pad + 1)]


def zorder_key(bin_x: Column | str, bin_y: Column | str,
               bits: int = 20) -> Column:
    """Z-order (Morton) key over signed integer bin indices — bit i of
    each coordinate lands at output bit 2i (x) / 2i+1 (y).  Sorting or
    range-partitioning the tile store on this key clusters every
    power-of-two-aligned square of bins into a CONTIGUOUS key range,
    which tightens Parquet row-group (bin_x, bin_y) min/max bounds for
    2-D box queries far beyond what a lexicographic (bin_x, bin_y)
    sort gives — the standard data-layout lever for multi-dimensional
    pruning at 100 TB.  ``bits`` per axis (default 20 → ±524 287 bins,
    40-bit key); indices outside raise rather than aliasing.

    Pure integer Column arithmetic (shift/or via *2^k and pmod-free
    bit tests), exact — the oracle reproduces it bit for bit.
    """
    if not 1 <= bits <= 31:
        raise ValueError(f"bits={bits} out of range 1..31 "
                         "(bit 2*bits-1 must fit a signed long)")
    bias = 1 << (bits - 1)
    bx = F.col(bin_x) if isinstance(bin_x, str) else bin_x
    by = F.col(bin_y) if isinstance(bin_y, str) else bin_y
    ux = bx.cast("long") + F.lit(bias)
    uy = by.cast("long") + F.lit(bias)
    rng_msg = F.lit(f"zorder_key: bin index out of ±{bias - 1} range")
    ok = ((ux >= 0) & (ux < F.lit(1 << bits))
          & (uy >= 0) & (uy < F.lit(1 << bits)))
    # fold the range assertion into the key (assert_true is NULL on
    # success) so column pruning cannot elide it
    z = F.when(F.assert_true(ok, rng_msg).isNull(), F.lit(0).cast("long"))
    for i in range(bits):
        xbit = F.floor(ux / F.lit(1 << i)) % 2
        ybit = F.floor(uy / F.lit(1 << i)) % 2
        z = z + xbit.cast("long") * F.lit(1 << (2 * i)) \
              + ybit.cast("long") * F.lit(1 << (2 * i + 1))
    return z


def zorder_sql(bin_x: str, bin_y: str, bits: int = 20) -> str:
    """The same Morton key as SQL text (valid in Spark SQL and DuckDB,
    minus the range assertion) for oracle parity."""
    if not 1 <= bits <= 31:
        raise ValueError(f"bits={bits} out of range 1..31")
    bias = 1 << (bits - 1)
    terms = []
    for i in range(bits):
        terms.append(f"(floor(({bin_x} + {bias}) / {1 << i}) % 2)"
                     f" * {1 << (2 * i)}")
        terms.append(f"(floor(({bin_y} + {bias}) / {1 << i}) % 2)"
                     f" * {1 << (2 * i + 1)}")
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"
