"""Skew- and shuffle-volume-aware join strategies (100 TB valves).

Two manual techniques that complement the session's automatic
machinery (AQE skew-join splitting + runtime bloom filters,
session.py) for the cases the optimizer cannot cover:

* :func:`salted_join` — key salting for hot join keys.  AQE's skew
  split only applies to sort-merge equi-joins it planned itself; a
  grouped-map cogroup (``applyInPandas`` after ``groupBy``), a
  stream-static join, or any join feeding a per-key stateful stage
  still funnels every row of a hot key through ONE task.  Salting
  replicates the *smaller* side R ways and spreads the hot key's
  probe rows across R tasks — a deterministic, engine-independent
  rewrite whose result is bit-identical to the plain join.

* :func:`bloom_prefilter` / :func:`bloom_semi_join` — shrink the
  fact side's shuffle BEFORE an exact semi join when the key set is
  too large to broadcast as a hash relation but its Bloom bitmap is
  not.  The bitmap is built distributively (bit_or over bitmap
  words), stays a DataFrame (never collected to the driver), and is
  broadcast at words-of-64-bits granularity; false positives are
  removed by the exact semi join that follows, so the composition is
  EXACTLY the semi join — just with k·(fpp-bounded) fewer fact rows
  entering the exchange.

Reference parity note: the reference engine is single-node NumPy and
has no shuffle, so it needs neither valve (geo_index.py does all key
intersection in-memory); these exist for the 100 TB execution model.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(left: DataFrame, right: DataFrame, on: list[str],
                buckets: int, distributor: str | Column | None = None,
                how: str = "inner") -> DataFrame:
    """Equi-join with the hot-key salting rewrite.

    ``left`` (the big/skewed probe side) gets a deterministic salt in
    ``[0, buckets)`` derived by hashing ``distributor`` (a column
    whose values vary WITHIN a hot key — a row id, a timestamp; by
    default all non-key columns), so a key's rows spread evenly.
    ``right`` (the smaller build side) is replicated once per salt
    value via a literal-array explode — a narrow op that multiplies
    its exchange volume by ``buckets``, which is exactly the price of
    the technique and why ``buckets`` should be ~the observed skew
    factor, not huge.  Joining on ``on + [salt]`` then yields the
    same multiset of matches as the plain join: every (left-row,
    right-row) key match meets in precisely one salt bucket.

    Only inner/left joins are safe here (a right/full join would see
    ``buckets`` copies of unmatched right rows); guarded below.
    """
    if how not in ("inner", "left", "left_outer", "leftouter",
                   "left_semi", "leftsemi"):
        raise ValueError(f"salted_join: unsupported how={how!r} — "
                         "right/full-outer would duplicate unmatched "
                         "replicated rows")
    if buckets < 1:
        raise ValueError("buckets must be >= 1")
    if distributor is None:
        dist_cols = [F.col(c) for c in left.columns if c not in on]
        if not dist_cols:
            raise ValueError("salted_join: no non-key column to "
                             "distribute on; pass `distributor`")
    else:
        dist_cols = [F.col(distributor) if isinstance(distributor, str)
                     else distributor]
    l = left.withColumn(
        "_salt", F.pmod(F.xxhash64(*dist_cols), F.lit(buckets))
        .cast("int"))
    r = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1))))
    out = l.join(r, on + ["_salt"], how)
    return out.drop("_salt")


# Bloom sizing: m bits, k hash probes.  fpp ~ (1 - e^(-kn/m))^k; the
# caller picks m from the expected distinct-key count.  Words are
# 64-bit longs so the bitmap table has ceil(m/64) rows — 1 M bits is
# a 16 K-row broadcast (~256 KB), three orders of magnitude smaller
# than broadcasting a 1 M-key hash relation with payload.
def _positions(key: Column, bits: int, k: int) -> list[Column]:
    # k independent 64-bit hashes via seed-literal mixing (xxhash64's
    # seed is fixed in the SQL surface; an extra literal column gives
    # an independent stream per probe).
    return [F.pmod(F.xxhash64(key, F.lit(i)), F.lit(bits))
            for i in range(k)]


def bloom_build(keys: DataFrame, key: str, bits: int = 1 << 20,
                k: int = 3) -> DataFrame:
    """Aggregate the key set into a Bloom bitmap DataFrame
    ``(word: long, mask: long)`` with at most ``bits/64`` rows.

    Fully distributed: each key emits k (word, single-bit) pairs
    map-side, and ``bit_or`` — an algebraic aggregate with map-side
    partial combine — folds them into per-word masks.  The bitmap
    never touches the driver.
    """
    pos = F.explode(F.array(*_positions(F.col(key), bits, k)))
    # call_function: the Python shiftleft wrapper only accepts a
    # literal int shift — the SQL function takes a Column
    bit = F.call_function("shiftleft", F.lit(1).cast("long"),
                          F.pmod(F.col("_p"), F.lit(64)).cast("int"))
    return (keys.select(pos.alias("_p"))
            .select((F.col("_p") / 64).cast("long").alias("word"),
                    bit.alias("bit"))
            .groupBy("word").agg(F.bit_or("bit").alias("mask")))


def bloom_prefilter(fact: DataFrame, bloom: DataFrame, key: str,
                    bits: int = 1 << 20, k: int = 3) -> DataFrame:
    """Keep only fact rows whose key MIGHT be in the bloom set.

    Each of the k probe positions becomes one broadcast left-join
    against the bitmap on the word index plus a bit test; a row
    survives only if every probed bit is set.  All k joins broadcast
    the same <=bits/64-row bitmap, so the fact side is never
    shuffled — the filter runs map-side ahead of whatever exchange
    follows.  May pass false positives (fpp-bounded), never drops a
    true member.
    """
    out = fact
    keep = F.lit(True)
    for i, p in enumerate(_positions(F.col(key), bits, k)):
        w, b = f"_bw{i}", f"_bm{i}"
        probe = bloom.select(F.col("word").alias(w),
                             F.col("mask").alias(b))
        out = (out.withColumn(w, (p / 64).cast("long"))
               .join(F.broadcast(probe), w, "left"))
        # bitwiseAND, not shiftright: an arithmetic shift of a mask
        # with bit 63 set sign-extends and breaks the %2 test
        probe_bit = F.call_function(
            "shiftleft", F.lit(1).cast("long"),
            F.pmod(p, F.lit(64)).cast("int"))
        keep = keep & (F.coalesce(F.col(b), F.lit(0).cast("long"))
                       .bitwiseAND(probe_bit) != 0)
    drop = [c for i in range(k) for c in (f"_bw{i}", f"_bm{i}")]
    return out.where(keep).drop(*drop)


def bloom_semi_join(fact: DataFrame, dim_keys: DataFrame, fact_key: str,
                    dim_key: str, bits: int = 1 << 20,
                    k: int = 3) -> DataFrame:
    """Exact semi join with a Bloom pre-filter on the fact side.

    ``dim_keys`` is aggregated to a bitmap (one tiny shuffle over
    words), the fact side is map-side pre-filtered, and the exact
    ``left_semi`` join removes the bloom's false positives — the
    result is EXACTLY ``fact SEMI JOIN dim_keys``, with the fact
    exchange carrying only the pre-filter's survivors.  Use when the
    dim key set exceeds the broadcast-join threshold but its bitmap
    does not (e.g. 100 M keys: ~1.5 GB hash relation vs a 32 MB
    256 M-bit bitmap at 1% fpp).
    """
    keys = dim_keys.select(F.col(dim_key).alias(fact_key)).distinct()
    bloom = bloom_build(keys, fact_key, bits, k)
    pre = bloom_prefilter(fact, bloom, fact_key, bits, k)
    return pre.join(keys, fact_key, "left_semi")
