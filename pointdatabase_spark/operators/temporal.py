"""Temporal join & rollup operators (§7.8 extension — the time-series
staples a 100 TB event/telemetry pipeline needs; no reference analog,
the reference's join surface is spatial).

Each operator is expressed so Catalyst sees a plain shuffle shape
with no inequality-join blowup:

- ``asof_join``: for every left row, the nearest right row backward /
  forward / either (per key, optional tolerance).  Implemented as the
  union-marker +
  running ``last(..., ignorenulls)`` window — ONE shuffle on the key,
  linear scan within each key partition, never a join.  The classic
  sort-merge as-of formulations degenerate to range joins (O(n·m)
  candidate pairs per key) that Spark plans as BroadcastNestedLoop;
  the union form is O(n+m) and whole-stage-codegen'd end to end.
- ``band_join``: all (left, right) pairs with right_ts within
  ``[left_ts+lo, left_ts+hi]`` per key.  Bucketized: each left row
  explodes to the (at most two, since hi-lo <= bucket width) coarse
  time buckets its band overlaps, the join is a pure EQUI-join on
  (key, bucket), and the exact band predicate refines after.  Join
  volume is bounded by true pair density, not |L|x|R| per key, and
  AQE sees an ordinary shuffle join it can re-plan/skew-split.
- ``multires_rollup``: hypertable-style continuous aggregates at a
  resolution ladder.  Only the FINEST resolution scans the base table;
  every coarser level re-aggregates the next-finer rollup
  (count/sum/min/max are all merge-able), so at 100 TB the 1-day
  rollup costs a pass over the 1-minute aggregate (~10^-3 of base),
  not another base scan.  This is exactly the reference's
  tile→hierarchy cascade (SURVEY §2 S12) transplanted to time.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _floor_div(col: Column, width: int) -> Column:
    """floor(col / width) for integer columns, exact for
    ``|col| <= 2^53`` (epoch MICROseconds — this module's time unit —
    are ~1.7e15, safely inside until the year ~287000; epoch
    NANOseconds are NOT and must be converted first).  Naive
    ``F.floor(col / lit)`` misrounds near bucket boundaries once
    1/width drops below the double rounding error of the magnitude
    (day-scale microsecond buckets already fail); subtracting
    ``pmod`` first makes the numerator an exact multiple of ``width``,
    so the (double) division is exact whenever the numerator is
    representable.  Correct for negative values (pmod >= 0).
    """
    w = F.lit(int(width))
    return ((col - F.pmod(col, w)) / w).cast("long")


def asof_join(left: DataFrame, right: DataFrame,
              on: str | list[str],
              left_ts: str = "tus", right_ts: str = "tus",
              right_cols: list[str] | None = None,
              tolerance: int | None = None,
              suffix: str = "_m",
              direction: str = "backward") -> DataFrame:
    """As-of join: attach, to every left row, the values of the right
    row nearest it in the requested ``direction`` for the same ``on``
    key — a column name or a list for composite keys (pandas
    ``merge_asof`` semantics, exact matches allowed):

    - ``backward``: latest right with ``right_ts <= left_ts``;
    - ``forward``: earliest right with ``right_ts >= left_ts``;
    - ``nearest``: whichever of the two is closer (tie → backward).

    Timestamps are integer (microseconds); ``tolerance`` (same unit)
    nulls a match farther than that from the left timestamp — for
    ``nearest`` it is applied to each candidate BEFORE choosing, so a
    too-stale backward match never shadows an in-range forward one.

    Matched columns come back as ``<col><suffix>`` plus
    ``<right_ts><suffix>`` (the matched row's timestamp); unmatched
    left rows keep NULLs.  Deterministic when right rows are unique
    per (key, ts) — pre-aggregate the right side otherwise (equal-ts
    right duplicates make "the" latest row ill-defined in any engine).

    Scale: ONE hash exchange of |L|+|R| rows on the key, then ordered
    passes per key partition (one sort for ``backward``/``forward``,
    two for ``nearest`` — same single exchange) — no range-join
    candidate blowup, no broadcast requirement on either side.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown direction {direction!r}")
    keys = [on] if isinstance(on, str) else list(on)
    if right_cols is None:
        right_cols = [c for c in right.columns
                      if c not in (*keys, right_ts)]
    mts = right_ts + suffix
    r = right.select(
        *[F.col(k) for k in keys], F.col(right_ts).alias("_t"),
        F.lit(0).alias("_side"), F.col(right_ts).alias(mts),
        *[F.col(c).alias(c + suffix) for c in right_cols])
    l = left.withColumn("_t", F.col(left_ts)).withColumn(
        "_side", F.lit(1))
    u = l.unionByName(r, allowMissingColumns=True)
    matched = [mts] + [c + suffix for c in right_cols]
    # backward: ascending scan; right rows sort before left rows at
    # equal _t (_side 0 < 1), so an exact-timestamp match is visible
    # to the left row's frame.  forward: the same trick on the
    # DESCENDING scan (at equal _t the right row is again "earlier"
    # in scan order) — running last() is then the earliest at-or-after.
    w_bwd = (Window.partitionBy(*keys)
             .orderBy(F.col("_t").asc(), "_side")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    w_fwd = (Window.partitionBy(*keys)
             .orderBy(F.col("_t").desc(), "_side")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    passes = {"backward": [("", w_bwd)], "forward": [("", w_fwd)],
              "nearest": [("_bwd", w_bwd), ("_fwd", w_fwd)]}[direction]
    for tag, w in passes:
        for c in matched:
            u = u.withColumn(c + tag,
                             F.last(c, ignorenulls=True).over(w))
    out = u.where(F.col("_side") == 1)
    tol = None if tolerance is None else F.lit(int(tolerance))

    def _null_stale(frame: DataFrame, tag: str, stale: Column) -> DataFrame:
        # one projection so every null-out tests the ORIGINAL matched
        # timestamp (sequential withColumn would null mts first and
        # the later columns' staleness test would read the nulled one)
        cols = {c + tag for c in matched}
        return frame.select(*[
            F.when(stale, F.lit(None)).otherwise(F.col(c)).alias(c)
            if c in cols else F.col(c) for c in frame.columns])

    if direction == "nearest":
        if tol is not None:
            out = _null_stale(out, "_bwd",
                              F.col(mts + "_bwd") < F.col("_t") - tol)
            out = _null_stale(out, "_fwd",
                              F.col(mts + "_fwd") > F.col("_t") + tol)
        take_bwd = (F.col(mts + "_fwd").isNull()
                    | (F.col(mts + "_bwd").isNotNull()
                       & (F.col("_t") - F.col(mts + "_bwd")
                          <= F.col(mts + "_fwd") - F.col("_t"))))
        for c in matched:
            out = out.withColumn(
                c, F.when(take_bwd, F.col(c + "_bwd"))
                .otherwise(F.col(c + "_fwd")))
        out = out.drop(*[c + t for c in matched for t in ("_bwd", "_fwd")])
    elif tol is not None:
        stale = (F.col(mts) < F.col("_t") - tol if direction == "backward"
                 else F.col(mts) > F.col("_t") + tol)
        out = _null_stale(out, "", stale)
    return out.drop("_t", "_side")


def band_join(left: DataFrame, right: DataFrame, on: str,
              left_ts: str = "tus", right_ts: str = "tus",
              lo: int = 0, hi: int = 0,
              lsuffix: str = "_l", rsuffix: str = "_r") -> DataFrame:
    """Temporal band (interval) join: all pairs with
    ``left_ts + lo <= right_ts <= left_ts + hi`` and equal ``on`` key.
    Integer-microsecond timestamps; ``lo``/``hi`` may be negative
    ("clicks in the 2 minutes BEFORE each error" is lo=-120e6, hi=0).

    Bucketized equi-join: bucket width = band width (hi-lo), so each
    left row's band overlaps at most TWO buckets; left explodes to
    those, right maps to its one bucket, and the join is a plain
    (key, bucket) hash join refined by the exact predicate.  Each true
    pair is produced exactly once (a right row lands in one bucket).

    Output: all left columns suffixed ``lsuffix``, all right columns
    suffixed ``rsuffix`` (key and timestamps included — band pairs are
    many-to-many, so nothing merges).
    """
    width = int(hi) - int(lo)
    if width < 0:
        raise ValueError("hi must be >= lo")
    width = max(width, 1)
    # predicates reference the SUFFIXED timestamps directly (the
    # interval_join side() approach) — separate _lt/_rt working aliases
    # would carry two duplicate longs per row through the join exchange
    lt = F.col(left_ts + lsuffix)
    rt = F.col(right_ts + rsuffix)
    # the join key is excluded from suffixing (it merges), so when a
    # timestamp column IS the key, emit a suffixed alias of it too —
    # the band predicates below reference the suffixed name
    l_cols = [F.col(c).alias(c + lsuffix) for c in left.columns
              if c != on]
    if left_ts == on:
        l_cols.insert(0, F.col(on).alias(left_ts + lsuffix))
    l = left.select(F.col(on).alias("_k"), *l_cols)
    lb = _floor_div(lt + F.lit(int(lo)), width)
    ub = _floor_div(lt + F.lit(int(hi)), width)
    l = l.withColumn("_b", F.explode(F.sequence(lb, ub)))
    r_cols = [F.col(c).alias(c + rsuffix) for c in right.columns
              if c != on]
    if right_ts == on:
        r_cols.insert(0, F.col(on).alias(right_ts + rsuffix))
    r = (right.select(F.col(on).alias("_k"), *r_cols)
         .withColumn("_b", _floor_div(rt, width)))
    j = (l.join(r, ["_k", "_b"])
         .where((rt >= lt + F.lit(int(lo))) & (rt <= lt + F.lit(int(hi)))))
    return j.withColumnRenamed("_k", on).drop("_b")


def rollup_leaf_aggs(value: str) -> list[Column]:
    """The merge-able leaf aggregate set every rollup level stores —
    shared by the batch ladder and the streaming maintenance sink so
    the stored schema cannot drift between them."""
    return [F.count(F.lit(1)).alias("n"),
            F.sum(value).alias("sum_v"),
            F.min(value).alias("min_v"),
            F.max(value).alias("max_v")]


def multires_rollup(df: DataFrame, ts: str, keys: list[str],
                    value: str,
                    resolutions_s: list[int]) -> DataFrame:
    """Multi-resolution time rollup: count/sum/min/max of ``value``
    per (``keys``, time bucket) at every resolution in
    ``resolutions_s`` (seconds, ascending; each coarser level must be
    an integer multiple of the finest).

    Only the finest level touches ``df``; each coarser level
    re-aggregates the finest rollup (all four aggregates are
    merge-able).  Output columns: keys, ``res_s`` (int), ``bucket_us``
    (bucket start, epoch microseconds), ``n``, ``sum_v``, ``min_v``,
    ``max_v`` — the continuous-aggregate ladder of a hypertable.
    """
    rs = sorted(int(r) for r in resolutions_s)
    base = rs[0]
    for r in rs[1:]:
        if r % base:
            raise ValueError(f"resolution {r}s not a multiple of {base}s")
    def bucket(col: Column, res_us: int) -> Column:
        return (_floor_div(col, res_us) * F.lit(res_us)).cast("long")

    fine = (df.groupBy(*keys,
                       bucket(F.col(ts), base * 1_000_000)
                       .alias("bucket_us"))
            .agg(*rollup_leaf_aggs(value)))
    levels = [fine.withColumn("res_s", F.lit(base))]
    for r in rs[1:]:
        levels.append(
            fine.groupBy(*keys,
                         bucket(F.col("bucket_us"), r * 1_000_000)
                         .alias("bucket_us"))
            .agg(F.sum("n").alias("n"),
                 F.sum("sum_v").alias("sum_v"),
                 F.min("min_v").alias("min_v"),
                 F.max("max_v").alias("max_v"))
            .withColumn("res_s", F.lit(r)))
    out = levels[0]
    for lv in levels[1:]:
        out = out.unionByName(lv)
    return out.select(*keys, "res_s", "bucket_us",
                      "n", "sum_v", "min_v", "max_v")


def interval_join(left: DataFrame, right: DataFrame, on: str,
                  left_start: str, left_end: str,
                  right_start: str, right_end: str,
                  bucket_us: int,
                  lsuffix: str = "_l", rsuffix: str = "_r") -> DataFrame:
    """Interval-overlap join: all (left, right) pairs whose CLOSED
    intervals ``[start, end]`` overlap, per ``on`` key — the
    variable-length generalization of ``band_join`` (which handles
    point-vs-band only).

    Both sides explode to the coarse time buckets their interval
    spans (``bucket_us`` should be on the order of the typical
    interval length; an interval spanning B buckets costs B copies),
    the join is a pure equi-join on (key, bucket), and each
    overlapping pair is emitted EXACTLY once without any distinct
    pass: a pair is kept only in the overlap's OWNERSHIP bucket — the
    bucket containing ``max(l.start, r.start)`` — which both sides
    provably cover (the overlap is contained in each interval), so no
    dedup shuffle exists in the plan.

    Output columns suffixed ``lsuffix``/``rsuffix``; ``on`` unsuffixed.

    Intervals must be well-formed (``start <= end``): an inverted
    interval raises at execution time rather than silently losing
    pairs (its bucket cover and the ownership rule disagree on
    inverted ranges — the overlap predicate can hold while the
    ownership bucket lies outside the exploded cover).
    """
    width = int(bucket_us)
    if width <= 0:
        raise ValueError("bucket_us must be positive")

    def side(df: DataFrame, start: str, end: str, sfx: str) -> DataFrame:
        # predicates below reference the SUFFIXED start/end directly —
        # separate working aliases would carry four duplicate longs per
        # exploded row through the join exchange
        out = df.select(F.col(on).alias("_k"),
                        *[F.col(c).alias(c + sfx)
                          for c in df.columns if c != on])
        s, e = F.col(start + sfx), F.col(end + sfx)
        # the assertion is folded INTO the sequence bound (assert_true
        # yields NULL on success) so column pruning cannot elide it —
        # a dropped check column would be optimized away unevaluated
        e_checked = F.when(
            F.assert_true(
                s <= e, F.lit(f"interval_join: {start} > {end} "
                              "(inverted interval)")).isNull(), e)
        return out.withColumn("_b", F.explode(F.sequence(
            _floor_div(s, width), _floor_div(e_checked, width))))

    l = side(left, left_start, left_end, lsuffix)
    r = side(right, right_start, right_end, rsuffix)
    ls, le = F.col(left_start + lsuffix), F.col(left_end + lsuffix)
    rs, re_ = F.col(right_start + rsuffix), F.col(right_end + rsuffix)
    own = _floor_div(F.greatest(ls, rs), width)
    j = (l.join(r, ["_k", "_b"])
         .where((ls <= re_) & (rs <= le) & (F.col("_b") == own)))
    return j.withColumnRenamed("_k", on).drop("_b")


def trailing_agg(df: DataFrame, on: str, ts: str, value: str,
                 span_us: int) -> DataFrame:
    """Trailing (range-frame) window aggregates: for every row, count
    and sum of ``value`` over the same key's rows within the last
    ``span_us`` microseconds INCLUSIVE of now — the "7-day trailing
    spend" shape.  A RANGE frame (not ROWS): peers at equal timestamps
    all see the same frame, so the result is deterministic even with
    duplicate timestamps.

    One shuffle on the key.  Cost note: Spark's sliding RANGE frame
    moves its buffer pointers incrementally but RE-AGGREGATES the
    buffered frame on every frame change (aggregates are not
    retractable), so per-key cost is O(rows × avg frame size), not
    O(rows).  Fine for human-scale keys (≤10³ events in span); for
    dense keys pre-aggregate to a coarser time grain first —
    :func:`multires_rollup` is exactly that reducer — and run the
    trailing window over the buckets.
    """
    w = (Window.partitionBy(on).orderBy(F.col(ts).cast("long"))
         .rangeBetween(-int(span_us), 0))
    return (df.withColumn("n_trail", F.count(F.lit(1)).over(w))
            .withColumn("sum_trail", F.sum(value).over(w)))


def rollup_trailing(df: DataFrame, ts: str, keys: list[str], value: str,
                    res_s: int, span_us: int) -> DataFrame:
    """Dense-key trailing aggregates: pre-reduce to a ``res_s``-second
    rollup (:func:`multires_rollup`, one level), then run the trailing
    RANGE frame over the BUCKETS — the scale path
    :func:`trailing_agg`'s docstring prescribes for keys dense enough
    that O(rows × frame) re-aggregation hurts.

    Per-key window cost drops from O(events × events-in-span) to
    O(buckets × span/res): independent of event density, bounded by
    the grain ratio (7 d / 1 h = 168 buckets per frame).  The window
    input is |keys| × active-buckets rows, not the base table.

    Frame semantics: one output row per (key, bucket); ``n_trail`` /
    ``sum_trail`` cover buckets whose START lies in
    ``[bucket_us - span_us, bucket_us]`` — trailing aggregates at
    bucket granularity (events of the current partial bucket are
    included; sub-bucket event offsets are deliberately coarsened, the
    standard pre-aggregation trade).
    """
    fine = multires_rollup(df, ts=ts, keys=keys, value=value,
                           resolutions_s=[int(res_s)])
    w = (Window.partitionBy(*keys).orderBy(F.col("bucket_us"))
         .rangeBetween(-int(span_us), 0))
    return fine.select(*keys, "bucket_us",
                       F.sum("n").over(w).alias("n_trail"),
                       F.sum("sum_v").over(w).alias("sum_trail"))




def cusum_alarms(df: DataFrame, keys: list[str], ts: str, value: str,
                 target_q: int, slack_q: int, threshold_q: int,
                 scale: float = 1_000_000.0) -> DataFrame:
    """One-sided CUSUM change-point detection per key (Page 1954) —
    the drift monitor a training-data pipeline runs on per-source
    quality/volume series: ``s_i = max(0, s_{i-1} + (x_i - target -
    slack))`` with an alarm (and reset) whenever ``s`` crosses
    ``threshold``. Returns per key: the observation count, alarm
    count, and final CUSUM statistic.

    Exactness: observations quantize to micro-unit BIGINT
    (``target_q``/``slack_q``/``threshold_q`` are given in the same
    units), the recursion folds exact integers in (ts, value)
    order, so alarm COUNTS are bit-deterministic — the property that
    matters, since a drift monitor's output is a decision, not a
    display value.

    Scale: the recursion is inherently sequential PER KEY, so each
    key's series folds inside one ``aggregate()`` expression over a
    ``collect_list`` (keys are sources/feeds — thousands of rows
    each, not billions; a per-key series too large to collect into
    one row is the signal to pre-aggregate to coarser buckets first,
    the standard CUSUM-on-rollup practice). One key-hash exchange
    total."""
    # Packing-exactness bounds, ENFORCED (not just documented):
    # acc = cusum * 2^20 + alarms must stay below 2^53 so the
    # power-of-two double division in _step recovers the cusum lane
    # exactly, i.e. cusum < 2^33. cusum is capped by threshold_q plus
    # one observation step, so threshold_q gets a hard 2^32 ceiling
    # (a full factor-2 of step headroom below the 2^33 exactness
    # bound). The alarm lane holds < 2^20 observations; that depends
    # on the DATA, so it is asserted in-plan below.
    if int(threshold_q) >= 1 << 32:
        raise ValueError(
            f"threshold_q={threshold_q} >= 2^32: the packed fold "
            f"state (cusum*2^20+alarms) would exceed the 2^53 "
            f"exact-double range; rescale `scale` down or "
            f"pre-aggregate (see docstring)")
    vq = (F.floor(F.col(value).cast("double") * F.lit(scale)
                  + F.lit(0.5)).cast("long"))
    rows = df.select(*keys, F.col(ts).alias("_ts"), vq.alias("_vq"))
    g = (rows.groupBy(*keys)
         .agg(F.sort_array(F.collect_list(
             F.struct(F.col("_ts"), F.col("_vq")))).alias("_s")))
    drift = F.lit(int(target_q) + int(slack_q)).cast("long")
    thr = F.lit(int(threshold_q)).cast("long")
    # Fold state packed into ONE long (cusum * 2^20 + alarms) rather
    # than a struct accumulator: DuckDB 1.0.0's list_reduce updates
    # struct-accumulator fields sequentially IN PLACE (a later
    # field's expression sees the earlier field already overwritten
    # — found while validating this operator's oracle), and a scalar
    # state removes the whole field-evaluation-order question on
    # BOTH engines. cusum stays below threshold_q + one step
    # (< 2^33, enforced above) and alarms < 2^20 observations
    # (asserted in-plan), so the packing is exact; callers with
    # > 1M observations per key should pre-aggregate (see docstring)
    # anyway.
    pack = F.lit(1 << 20).cast("long")
    zero = F.lit(0).cast("long")

    def _step(acc, x):
        # acc / 2^20 is a power-of-two double division on an exact
        # integer < 2^49 — exact in IEEE, so floor() recovers the
        # integer cusum lane precisely.
        nc = F.greatest(F.floor(acc / pack).cast("long")
                        + x["_vq"] - drift, zero)
        return (F.when(nc > thr, acc % pack + 1)
                .otherwise(nc * pack + acc % pack))

    folded_raw = F.aggregate(F.col("_s"), zero, _step)
    # In-plan guard on the alarm lane: a key with >= 2^20
    # observations could overflow alarms into the cusum lane and
    # SILENTLY corrupt both counts — fail loudly instead. The guard
    # is a no-op branch for every valid key, so it never perturbs
    # values (oracle hashes unchanged).
    folded = F.when(F.size("_s") < F.lit(1 << 20), folded_raw).otherwise(
        F.raise_error(F.concat(
            F.lit("cusum_alarms: key series has "),
            F.size("_s").cast("string"),
            F.lit(" observations >= 2^20; alarm lane would overflow "
                  "— pre-aggregate to coarser buckets first"))))
    return g.select(*keys,
                    F.size("_s").cast("long").alias("n_obs"),
                    (folded % pack).alias("n_alarms"),
                    F.floor(folded / pack).cast("long")
                    .alias("final_cusum"))


def scd2_history(df: DataFrame, keys: list[str], state_cols: list[str],
                 ts_col: str,
                 tiebreak: list[str] | None = None) -> DataFrame:
    """Reconstruct SCD Type-2 validity intervals from a timestamped
    change log — the dimension-history complement of the SCD-1 family
    (``sampling.upsert_latest_wins`` keeps only the latest state;
    ``streaming/upsert.state_diff`` emits the churn; this keeps the
    full history a time-travel join needs). Per key, ordered by
    ``(ts_col, *tiebreak)``, consecutive rows whose ``state_cols``
    tuple is UNCHANGED (null-safe struct comparison, the state_diff
    precedent) collapse into one history row::

        (*keys, *state_cols, valid_from, valid_to, version, n_rows)

    ``valid_from`` = the run's first timestamp, ``valid_to`` = the
    NEXT run's valid_from (NULL marks the current row — the standard
    half-open [from, to) convention), ``version`` = 1-based change
    ordinal per key, ``n_rows`` = log rows collapsed into the run.

    Plan: ONE hash exchange on the key; everything after is
    key-partitioned windows (lag change flag, running-sum run ids,
    lead valid_to over the per-key RUN table) and one groupBy — no
    global windows, no Python. Per-key history length bounds every
    window partition, the same economics as run_coalescing (O3).
    ``tiebreak`` must make the per-key order total (e.g. the log's
    event id) or run boundaries on tied timestamps are undefined in
    ANY engine; ``valid_to`` is ordered by the run ordinal, not
    valid_from, so tied-timestamp adjacent runs stay deterministic.
    No reference counterpart (extension surface; Kimball SCD Type 2).
    """
    tb = list(tiebreak or [])
    order = [F.col(ts_col).asc()] + [F.col(c).asc() for c in tb]
    wo = Window.partitionBy(*keys).orderBy(*order)
    wrun = wo.rowsBetween(Window.unboundedPreceding, 0)
    st = F.struct(*[F.col(c) for c in state_cols])
    chg = F.when(st.eqNullSafe(F.lag(st).over(wo)),
                 F.lit(0)).otherwise(F.lit(1))
    runs = (df.withColumn("_run", F.sum(chg).over(wrun))
            .groupBy(*keys, *state_cols, "_run")
            .agg(F.min(ts_col).alias("valid_from"),
                 F.count(F.lit(1)).cast("long").alias("n_rows")))
    wv = Window.partitionBy(*keys).orderBy("_run")
    return (runs
            .withColumn("valid_to", F.lead("valid_from").over(wv))
            .withColumn("version", F.col("_run").cast("long"))
            .drop("_run"))
