"""Fuzzy string matching — the entity-resolution / record-linkage
surface: an EXACT edit-distance self-join built on segment blocking
(Pass-Join: Li, Deng, Jiang & Feng, "PASS-JOIN: A Partition-based
Method for Similarity Joins", VLDB'11), the primitive behind
near-duplicate entity names, OCR-noisy titles, and crawl-URL typo
clusters in a training-data pipeline.

Why not a cross join + ``levenshtein``: the DP verification is cheap
per pair but there are O(n²) pairs — at corpus scale the join itself
is the cost. Why not q-gram count filtering (Gravano et al.,
VLDB'01): the count lower bound needs positional multiset semantics
that fight Spark's distinct-posting idiom, and its selectivity decays
on short strings. Segment blocking is pigeonhole-exact and pure
equi-join:

  if lev(a, b) <= d, split a into d+1 contiguous segments — the <= d
  edits touch at most d of them, so at least ONE segment survives
  verbatim as a substring of b, and (since each edit shifts downstream
  characters by at most one position) it occurs within +-d of its
  original start.

So the plan is: reduce to DISTINCT strings, explode each into its
d+1 segments (the "index" side) and into the bounded set of
substrings any partner's segment could match (the "probe" side:
partner length L in [len-d, len+d], segment index i in 0..d, start
within +-d of the segment's home position — O(d³) short tokens per
string, ~45 for d=2), equi-join on (xxhash64(token), segment-index,
partner-length), distinct the candidate string pairs, verify each
with ONE banded ``levenshtein(a, b, d)`` (the pair carries its own
strings — no re-join), then expand back to id pairs by multiplicity.

Scale shape (100 TB of names):

- The kernel runs over the distinct-string table — entity columns
  are heavy-tailed, and deduping first divides every posting df by
  the string's multiplicity (candidate volume scales with its
  SQUARE: measured 132 s -> 1.4 s on a 20k-row/64-name fixture).
  The id-level expansions afterwards are pure equi-joins whose
  every output row is a result row — output-bounded, the floor for
  any algorithm that must emit the pairs.
- The candidate equi-join is AQE-friendly (no hints); a
  pathological token ("inc", " the ") makes a hot key whose cost
  is df² over DISTINCT strings — the same Σdf² economics as the
  shingle posting join, with the same valve available upstream
  (pre-normalize names, or raise d to lengthen segments).
- Verification is Spark's threshold-banded Levenshtein (O(d·len)
  per pair, early-exit), not the full DP matrix.

Exactness ledger: the pigeonhole rule generates every true pair with
both lengths >= d+1; pairs where BOTH strings are shorter than d+1
ride a separate all-pairs block over that (tiny, alphabet-bounded)
subset; a pair (short, long) is still caught by the main path because
the probe side enumerates partner lengths >= d+1 regardless of its
own length. xxhash64 collisions can only ADD candidates (verification
prunes them); they never lose a pair. No reference counterpart
(extension surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _segments_expr(s: str, m: str, d: int) -> str:
    """d+1 even segments of column ``s`` (length column ``m``), as
    array<struct<h,si,pl>> — h = xxhash64 of the segment text, si =
    segment index, pl = own length (the partner-length join key)."""
    d1 = d + 1
    return (
        f"transform(sequence(0, {d}), i -> struct("
        f"xxhash64(substring({s}, cast((i * {m}) div {d1} + 1 as int), "
        f"cast(((i + 1) * {m}) div {d1} - (i * {m}) div {d1} as int))) as h, "
        f"i as si, {m} as pl))")


def _probes_expr(s: str, m: str, d: int) -> str:
    """All substrings of ``s`` that a partner's segment could equal:
    for each candidate partner length L in [m-d, m+d] (only L >= d+1
    — shorter partners ride the short block), each segment index i,
    and each start within +-d of the segment's home position. Bound
    variables via single-element transform (z = (pos, sl)) keep the
    arithmetic written once; the filter guard makes out-of-range
    position windows empty instead of descending."""
    d1 = d + 1
    z = (f"array(struct((i * L) div {d1} as pos, "
         f"((i + 1) * L) div {d1} - (i * L) div {d1} as sl))")
    lo = f"greatest(0, z.pos - {d})"
    hi = f"least({m} - z.sl, z.pos + {d})"
    return (
        f"flatten(transform(sequence(greatest({m} - {d}, {d1}), {m} + {d}), L -> "
        f"flatten(transform(sequence(0, {d}), i -> "
        f"flatten(transform({z}, z -> "
        f"transform(filter(sequence({lo}, greatest({lo}, {hi})), p -> p <= {hi}), "
        f"p -> struct(xxhash64(substring({s}, cast(p + 1 as int), "
        f"cast(z.sl as int))) as h, i as si, L as pl))))))))")


def edit_distance_pairs(df: DataFrame, id_col: str, str_col: str,
                        d: int = 2,
                        group_cols: list[str] | None = None) -> DataFrame:
    """All unordered pairs with ``levenshtein(a, b) <= d`` (within
    ``group_cols`` blocks if given). Returns
    ``(id_a, id_b, dist long)`` with ``id_a < id_b``; ``dist`` is the
    exact edit distance. Null strings are excluded (distance to NULL
    is undefined; the SQL oracle's three-valued logic drops them
    too).

    **Distinct-string kernel.** Real entity columns are heavy-tailed —
    the same name/title repeats thousands of times — and running the
    segment join over raw rows multiplies every posting's df by the
    string's multiplicity, inflating the candidate join volume by the
    SQUARE of repetition (measured 132 s vs 1.4 s at sf0.1's 20 000
    rows over 64 distinct names). So the pigeonhole kernel runs over
    the DISTINCT (group, string) table only, and id-level results come
    from two output-bounded expansions afterwards:

    - dist = 0: a same-string id self-join (``id_a < id_b``) — each
      duplicate class emits exactly its C(k, 2) pairs and nothing
      else;
    - dist >= 1: the verified distinct-string pairs equi-join each
      side's id list; every join row IS an output row.

    No stage exceeds O(distinct² · segment-df) candidate work +
    O(output) expansion — the same dedupe-before-the-expensive-kernel
    doctrine as exact_dedup before MinHash.

    Cache note: the distinct-string kernel persist is released by no explicit
    unpersist (the return stays lazy — an eager release would
    force a premature action; ngram_jaccard_pairs precedent);
    sessions issuing MANY calls should release between batches
    via ``spark.catalog.clearCache()``."""
    if d < 1:
        raise ValueError(f"need d >= 1, got {d=}")
    gc = list(group_cols or [])
    base = (df.where(F.col(str_col).isNotNull())
            .select(F.col(id_col).alias("id"), *gc,
                    F.col(str_col).alias("s")))
    names = (base.select(*gc, "s").distinct()
             .withColumn("m", F.length("s"))
             # segs, probes, and the short block all derive from the
             # distinct-string table; persist so the corpus scan +
             # distinct runs once (vocabulary-sized cache — the
             # ngram_jaccard_pairs lazy multi-consumer precedent)
             .persist())
    segs = (names.where(F.col("m") >= d + 1)
            .select("s", *gc,
                    F.explode(F.expr(_segments_expr("s", "m", d)))
                    .alias("k")))
    # Empty strings can't match any >= d+1-length partner's segment
    # (the length band excludes them); they pair only via the short
    # block below, so they skip probe generation entirely (and with
    # them the m=0 edge of the sequence bounds).
    probes = (names.where(F.col("m") >= 1)
              .select("s", *gc,
                      F.explode(F.expr(_probes_expr("s", "m", d)))
                      .alias("k")))
    on = ((F.col("a.k.h") == F.col("b.k.h"))
          & (F.col("a.k.si") == F.col("b.k.si"))
          & (F.col("a.k.pl") == F.col("b.k.pl"))
          & (F.col("a.s") != F.col("b.s")))
    for g in gc:
        on = on & (F.col(f"a.{g}") == F.col(f"b.{g}"))
    cand = (segs.alias("a").join(probes.alias("b"), on)
            .select(F.least("a.s", "b.s").alias("s_a"),
                    F.greatest("a.s", "b.s").alias("s_b"),
                    *[F.col(f"a.{g}") for g in gc]))
    # Degenerate block: both strings shorter than d+1 — the pigeonhole
    # split needs d+1 non-empty segments. The subset is alphabet-
    # bounded tiny (distinct strings shorter than the threshold);
    # all-pairs within it is the honest cost.
    short = names.where(F.col("m") <= d).select(F.col("s"), *gc)
    s_on = F.col("a.s") < F.col("b.s")
    for g in gc:
        s_on = s_on & (F.col(f"a.{g}") == F.col(f"b.{g}"))
    cand = cand.unionByName(
        short.alias("a").join(short.alias("b"), s_on)
        .select(F.col("a.s").alias("s_a"), F.col("b.s").alias("s_b"),
                *[F.col(f"a.{g}") for g in gc]))
    # The candidate pair already carries both strings — they ARE the
    # keys — so verification needs no re-join at all.
    ver = (cand.distinct()
           .withColumn("dist", F.levenshtein(F.col("s_a"), F.col("s_b"), d))
           .where(F.col("dist") >= 0))
    ia = base.select(F.col("id").alias("ia"), *gc, F.col("s").alias("s_a"))
    ib = base.select(
        F.col("id").alias("ib"),
        *[F.col(g).alias(f"_b_{g}") for g in gc],
        F.col("s").alias("s_b"))
    cross = ver.join(ia, ["s_a", *gc])
    jb = (cross["s_b"] == ib["s_b"])
    for g in gc:
        jb = jb & (cross[g] == ib[f"_b_{g}"])
    cross = (cross.join(ib, jb)
             .select(F.least("ia", "ib").alias("id_a"),
                     F.greatest("ia", "ib").alias("id_b"),
                     F.col("dist").cast("long").alias("dist")))
    same_on = (F.col("a.s") == F.col("b.s")) & (F.col("a.id") < F.col("b.id"))
    for g in gc:
        same_on = same_on & (F.col(f"a.{g}") == F.col(f"b.{g}"))
    same = (base.alias("a").join(base.alias("b"), same_on)
            .select(F.col("a.id").alias("id_a"),
                    F.col("b.id").alias("id_b"),
                    F.lit(0).cast("long").alias("dist")))
    return same.unionByName(cross)


def snm_candidate_audit(df: DataFrame, id_col: str, str_col: str,
                        d: int = 2, window: int = 5,
                        key_exprs: list[str] | None = None,
                        group_cols: list[str] | None = None) -> DataFrame:
    """Recall audit of MULTI-PASS Sorted-Neighborhood blocking
    (Hernández & Stolfo, SIGMOD'95) against the exact Pass-Join
    ground truth — the measure-don't-guess companion every
    approximate blocking scheme needs (the ER analog of
    dedup.lsh_recall_eval). SNM is the classic at-scale candidate
    generator: sort records by a key, compare only pairs within a
    sliding window of ``window`` positions; since any single key
    misses pairs that differ early in that key, the standard scheme
    unions several passes with complementary keys. ``key_exprs`` are
    the per-pass sort keys as SQL expressions over the string column
    ``s`` (default: the string itself + its reverse — the cheapest
    complementary pair: a mid/late-string edit sorts adjacent in
    pass 1, an early edit in pass 2). It is STILL not exact — an
    edit in the middle of both keys can miss — so recall is an
    empirical, corpus-dependent number this operator measures rather
    than asserts (on the part fixture: pass 1 alone finds 0 of 24
    true pairs, adding the reverse pass recovers 16, adding a
    sorted-token pass ``array_join(array_sort(split(s, ' ')), ' ')``
    recovers 20 — it neutralizes edits inside any non-leading token —
    and a rest-of-string pass ``substring(s, instr(s, ' ') + 1)``
    closes the residual at 24: the 4 remaining misses were
    first-token edits whose token also led the sorted view, and
    dropping the first token makes those keys identical). ONE output
    row::

        (n_true, n_candidates, n_found, recall_ppm)

    at the DISTINCT-STRING pair level (multiplicity expansion is
    orthogonal and identical for both schemes): ``n_true`` = distinct
    string pairs with 1 <= lev <= d (from :func:`edit_distance_pairs`'
    kernel semantics, recomputed here as truth), ``n_candidates`` =
    distinct unioned window pairs, ``n_found`` = candidates that
    verify, ``recall_ppm = (1e6 * n_found) div n_true`` exact BIGINT
    arithmetic (1e6 when the windows lose nothing).

    Plan (r13 — ONE fused rank pass, VERDICT r12 #3): the distinct-
    string table explodes into (pass, key) rows for ALL passes at
    once, and a single
    :func:`~pointdatabase_spark.operators.ranking.range_row_number`
    grouped by (group_cols, pass) ranks every pass in one
    repartitionByRange + one slice cache — range-partitioned rank
    stitching (slice offset + slice-local row_number), NOT a global
    ``Window.orderBy`` (r12: a distinct-STRING vocabulary over a
    100 TB text corpus is itself corpus-scale; ranks are
    bit-identical because the sort key (_key, s) is unique within
    each pass). Grouped ranks restart per pass, so per-pass ranks are
    identical to the former one-rank-call-per-pass shape; the window
    join is rank-equi WITHIN a pass (each rank explodes
    ``sequence(1, window)`` offsets and joins rank + k on
    (pass, rank) — no range join, and the former per-pass
    join+union is one join); candidates dedupe on the canonical
    string pair; verification is the banded levenshtein. The fused
    pass cut the audit's Spark job count (one range sample + one
    slice materialization + one offset broadcast instead of four of
    each) — the per-job overhead the 8-core bench showed dominating
    this query. The slice cache releases with the name cache after
    the eager compute."""
    if window < 1:
        raise ValueError(f"need window >= 1, got {window=}")
    keys = list(key_exprs or ["s", "reverse(s)"])
    if not keys:
        raise ValueError("need at least one key expression")
    gc = list(group_cols or [])
    names = (df.where(F.col(str_col).isNotNull())
             .select(*gc, F.col(str_col).alias("s")).distinct()
             # the fused rank pass AND the truth kernel read this
             # table; one tokenize/distinct pipeline, cached reads
             .persist())
    from pointdatabase_spark.operators.ranking import range_row_number
    pk = F.explode(F.array(*[
        F.struct(F.lit(i).cast("int").alias("p"),
                 F.expr(ke).alias("k"))
        for i, ke in enumerate(keys)])).alias("_pk")
    keyed = (names.select(*gc, "s", pk)
             .select(*gc, "s", F.col("_pk.p").alias("_pass"),
                     F.col("_pk.k").alias("_key")))
    # (_key, s) is unique within each (group, pass) (names are
    # distinct), so the stitched rank is bit-identical to the global
    # window per pass.
    ranked, cache = range_row_number(
        keyed, ["_key", "s"], group_cols=[*gc, "_pass"], out_col="r")
    probe = (ranked.select(
        *gc, "_pass", F.col("s").alias("_s1"), "r",
        F.explode(F.expr(f"sequence(1, {int(window)})")).alias("_k"))
        .select(*gc, "_pass", "_s1",
                (F.col("r") + F.col("_k")).alias("r2")))
    right = ranked.select(
        *[ranked[g].alias(f"_g_{g}") for g in gc],
        ranked["_pass"].alias("_g_pass"), F.col("r"),
        F.col("s").alias("_s2"))
    jon = (F.col("r2") == right["r"]) & (probe["_pass"] == right["_g_pass"])
    for g in gc:
        jon = jon & (probe[g] == right[f"_g_{g}"])
    cand = (probe.join(right, jon)
            .select(*gc,
                    F.least("_s1", "_s2").alias("s_lo"),
                    F.greatest("_s1", "_s2").alias("s_hi")))
    cand = (cand.distinct()
            .withColumn("_lev", F.levenshtein(
                F.col("s_lo"), F.col("s_hi"), d)))
    truth = edit_distance_pairs(
        names.withColumn("_id", F.col("s")).select(
            F.col("_id"), *gc, F.col("s")),
        "_id", "s", d=d, group_cols=gc or None).where(F.col("dist") > 0)
    agg_c = cand.agg(
        F.count(F.lit(1)).cast("long").alias("n_candidates"),
        F.sum(F.when(F.col("_lev") >= 1, 1).otherwise(0))
        .cast("long").alias("n_found"))
    agg_t = truth.agg(F.count(F.lit(1)).cast("long").alias("n_true"))
    out = (agg_t.crossJoin(agg_c)
           .select("n_true", "n_candidates", "n_found",
                   F.expr("CASE WHEN n_true = 0 THEN 1000000 "
                          "ELSE (1000000 * n_found) div n_true END")
                   .cast("long").alias("recall_ppm")))
    # One-row diagnostic: compute EAGERLY and release the persisted
    # distinct-name table AND the rank-slice cache before returning
    # (the lsh_recall_eval precedent — a lazy return leaks the
    # caches for the application lifetime). The caller still gets
    # a DataFrame with the exact result schema.
    try:
        row = out.first()
    finally:
        names.unpersist()
        cache.unpersist()
    return out.sparkSession.createDataFrame([row], schema=out.schema)
