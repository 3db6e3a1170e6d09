"""Column profiler — the ANALYZE-style statistics pass (null count,
distinct count, min/max per column) a pipeline runs before trusting or
optimizing over a new dataset.

Scale notes: all metrics fold into ONE aggregation over one scan.
With ``exact=True`` the multi-column COUNT(DISTINCT) plans through
Spark's Expand operator (each input row fans out once per profiled
column before the partial aggregate — row volume ×|cols|, still one
shuffle); that is the oracle-checkable mode. At 100 TB profile with
``exact=False``: HyperLogLog++ `approx_count_distinct` keeps the plan
a plain one-pass partial aggregate with constant-size sketches and no
Expand. The wide single-row result is unpivoted to (column, metrics)
rows via `stack` — a zero-shuffle projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pointdatabase_spark.functions import rounding


def profile_columns(df: DataFrame, cols: list[str],
                    exact: bool = True) -> DataFrame:
    """One row per profiled column: (col_name, n_null, n_distinct,
    vmin, vmax). Columns must be numeric (min/max are reported as
    DOUBLE). ``exact=False`` swaps COUNT(DISTINCT) for
    approx_count_distinct — the 100 TB mode."""
    nd = F.countDistinct if exact else F.approx_count_distinct
    aggs = []
    for c in cols:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nn"),
            nd(c).alias(f"{c}__nd"),
            F.min(c).cast("double").alias(f"{c}__mn"),
            F.max(c).cast("double").alias(f"{c}__mx"),
        ]
    row = df.agg(*aggs)
    stack = ", ".join(
        f"'{c}', {c}__nn, CAST({c}__nd AS BIGINT), {c}__mn, {c}__mx"
        for c in cols)
    return row.select(F.expr(
        f"stack({len(cols)}, {stack}) "
        "AS (col_name, n_null, n_distinct, vmin, vmax)"))


def numeric_histogram(df: DataFrame, col: str, lo: float, hi: float,
                      nbins: int) -> DataFrame:
    """Equal-width histogram with EXPLICIT bounds — no data-dependent
    min/max discovery job precedes the scan (the same
    no-discovery-pass rule as the explicit-values pivot). One
    map-side bin expression + one count aggregate; only occupied bins
    emit rows. Out-of-range values land in underflow/overflow bins
    -1 / nbins. Bin edges are computed with one subtraction and one
    division in IEEE order, so an oracle repeating the identical
    arithmetic agrees bit-for-bit even at edge-rounding boundaries."""
    w = (float(hi) - float(lo)) / int(nbins)
    bin_ = (F.when(F.col(col) < lo, F.lit(-1).cast("long"))
            .when(F.col(col) >= hi, F.lit(int(nbins)).cast("long"))
            .otherwise(F.floor((F.col(col) - lo) / F.lit(w))))
    return (df.groupBy(bin_.alias("bin"))
            .agg(F.count(F.lit(1)).alias("n"))
            .withColumn("bin_lo", F.lit(float(lo))
                        + F.col("bin") * F.lit(w)))


def scalar_dq(df: DataFrame,
              rules: list[tuple[str, "F.Column"]]) -> DataFrame:
    """Data-quality expectations over ONE table in ONE aggregation:
    each rule is (name, boolean Column that is true when the row
    VIOLATES the expectation); output is (rule string, violations
    bigint), one row per rule. All rules share a single scan + single
    partial-aggregate pass regardless of rule count — the `stack`
    unpivot is a zero-shuffle projection of the 1-row aggregate."""
    aggs = [F.sum(cond.cast("long")).alias(f"_v{i}")
            for i, (_n, cond) in enumerate(rules)]
    row = df.agg(*aggs)
    # rule names are interpolated into a SQL expr — escape embedded
    # single quotes so a name like "don't" can't break the expression
    stack = ", ".join(
        f"""'{n.replace("'", "''")}', COALESCE(_v{i}, 0)"""
        for i, (n, _c) in enumerate(rules))
    return row.select(F.expr(
        f"stack({len(rules)}, {stack}) AS (rule, violations)"))


def duplicate_key_count(df: DataFrame, name: str,
                        keys: list[str]) -> DataFrame:
    """(rule, violations) where violations = the TOTAL number of rows
    carrying a non-unique key (sum of group sizes over groups with
    size > 1 — every member of a duplicated group counts, not just
    the excess copies).  Two-level aggregate: per-key counts
    map-combine, then one reduce; no Expand, no driver work — the
    uniqueness expectation at any scale."""
    per = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("_n"))
    return per.agg(
        F.lit(name).alias("rule"),
        F.coalesce(F.sum(F.when(F.col("_n") > 1, F.col("_n"))),
                   F.lit(0)).alias("violations"))


def ref_integrity_count(child: DataFrame, name: str, child_key: str,
                        parent: DataFrame,
                        parent_key: str) -> DataFrame:
    """(rule, violations) where violations = child rows whose key has
    no parent — a LEFT ANTI join (broadcast when the parent is
    dimension-sized, AQE decides) folded to one count."""
    par = parent.select(F.col(parent_key).alias(child_key)).distinct()
    orphans = child.select(child_key).join(par, child_key, "left_anti")
    return orphans.agg(F.lit(name).alias("rule"),
                       F.count(F.lit(1)).alias("violations"))


def dq_report(parts: list[DataFrame]) -> DataFrame:
    """Union the per-table/per-shape expectation results into one
    (rule, violations) report — each part is already reduced to rule
    granularity, so the union moves rule-count rows, not data."""
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def distinctive_terms(df: DataFrame, group_col: str = "source",
                      id_col: str = "doc_id", text_col: str = "text",
                      k: int = 5) -> DataFrame:
    """Top-k distinctive tokens per group by document-frequency lift —
    the tf-idf-style vocabulary census a pipeline runs to understand
    what characterizes each source/domain before mixing them.

    Score = group_df / corpus_df per token: a single IEEE division of
    two counts, so the DuckDB oracle is bit-identical (the classic
    ln(N/df) idf weight would drag in libm, which differs by ulps
    across engines and could flip rank ties). Monotone in the same
    ordering as tf·idf for fixed tf.

    Scale shape: one narrow explode of per-doc DISTINCT tokens → one
    (group, token) count aggregate (map-combined); corpus document
    frequency is then a SUM over the already-aggregated term table
    (|vocab|·|groups| rows, never doc-level), and the final top-k is
    a per-group window over term-level rows only. Documents shuffle
    once, as (group, token) longs."""
    tok = df.select(
        F.col(group_col).alias("grp"),
        F.explode(F.array_distinct(
            F.split(F.col(text_col), r"\s+"))).alias("term"))
    tf = (tok.groupBy("grp", "term")
          .agg(F.count(F.lit(1)).alias("tf")))
    dfreq = (tf.groupBy("term")
             .agg(F.sum("tf").cast("long").alias("df")))
    scored = (tf.join(dfreq, "term")
              .withColumn("score",
                          F.col("tf").cast("double") / F.col("df")))
    from pyspark.sql.window import Window
    w = Window.partitionBy("grp").orderBy(F.col("score").desc(),
                                          F.col("term").asc())
    return (scored.withColumn("_rk", F.row_number().over(w))
            .where(F.col("_rk") <= int(k))
            .select(F.col("grp").alias(group_col), "term", "tf", "df",
                    rounding.qround("score", 6).alias("score")))


def heavy_hitter_terms(df: DataFrame, text_col: str = "text",
                       k: int = 20, capacity: int = 256) -> DataFrame:
    """EXACT top-k most-frequent tokens without a full-vocabulary
    shuffle — the 100 TB scale path for term frequency census
    (`frequent_ngrams`' groupBy is exact but shuffles |vocab| keys;
    on web-scale corpora |vocab| is billions of mostly-singleton
    strings).

    Two passes over the token stream:

    1. CANDIDATES — a weighted Misra-Gries summary of size
       ``capacity`` per partition (Arrow-batched ``mapInPandas``;
       each batch folds in via ``value_counts``, eviction subtracts
       the smallest counts, so work is vectorized per batch, never
       per row).  The MG guarantee transfers across partitions by the
       averaging argument: any term with GLOBAL frequency
       > N/(capacity+1) exceeds the local threshold in at least one
       partition, hence survives somewhere — the union of survivors
       provably contains every such term.
    2. RECOUNT — exact counts of CANDIDATE terms only (broadcast
       semi-join; candidates ≤ capacity × partitions, vocabulary-
       independent), then top-k by (freq desc, term asc).

    The result equals the brute-force top-k whenever the k-th true
    frequency exceeds N/(capacity+1); callers size ``capacity``
    accordingly (a heavy hitter IS a term above such a threshold —
    terms below it are not meaningfully "top" anyway).  The output
    carries the check: ``n_tokens`` (total N) and per-row
    ``exact_guarantee`` = freq·(capacity+1) > N — integer
    arithmetic, so the documented exactness condition is verifiable
    row by row from the result itself."""
    tok = df.select(F.explode(
        F.split(F.col(text_col), r"\s+")).alias("term"))

    cap = int(capacity)

    def _mg(batches):
        import pandas as pd
        d: dict = {}
        for pdf in batches:
            for t, c in pdf["term"].value_counts().items():
                d[t] = d.get(t, 0) + int(c)
            if len(d) > cap:
                vals = sorted(d.values())
                delta = vals[len(d) - cap - 1]
                d = {t: c - delta for t, c in d.items() if c > delta}
        yield pd.DataFrame({"term": list(d.keys())})

    cands = tok.mapInPandas(_mg, schema="term string").distinct()
    stats = tok.agg(F.count(F.lit(1)).alias("n_tokens"))
    top = (tok.join(F.broadcast(cands), "term", "left_semi")
           .groupBy("term")
           .agg(F.count(F.lit(1)).alias("freq"))
           .orderBy(F.col("freq").desc(), F.col("term").asc())
           .limit(int(k)))
    return (top.crossJoin(F.broadcast(stats))
            .select("term", "freq", "n_tokens",
                    (F.col("freq") * F.lit(cap + 1)
                     > F.col("n_tokens")).alias("exact_guarantee")))


def robust_outliers(df: DataFrame, group_cols: list[str],
                    value_col: str, k: int = 3,
                    scale: float = 1_000_000.0) -> DataFrame:
    """Median/MAD robust outlier census per group — the data-quality
    screen that survives the contaminated columns it is screening
    (mean/stddev z-scores are dragged by the very outliers they hunt;
    the median absolute deviation has a 50% breakdown point, Hampel
    1974).  Returns one row per group::

        (group..., n long, med_q long, mad_q long, n_outliers long)

    where ``med_q``/``mad_q`` are in micro-units and ``n_outliers``
    counts rows with ``|x_q - med_q| > k * mad_q``.

    Exactness: values quantize to micro-unit BIGINT up front, and
    both medians are RANK-BASED (the lower-middle element of the
    sorted multiset — no interpolation), so every compared number is
    an exact 64-bit integer: the outlier threshold comparison cannot
    flip on a final-ulp difference between engines, which matters
    because a threshold flip changes a COUNT, not a 6th decimal.

    Scale: two window passes partitioned by the group key (rank
    medians need a per-group total order) plus one broadcast join of
    the per-group medians.  Group count is assumed modest (profiling
    dimensions); for billion-row groups at 100 TB flip to
    ``approx_percentile(0.5)`` — the plan keeps the same outlier
    census but trades exactness for a map-combinable sketch, same
    trade as ``table_profile(exact=False)``."""
    from pyspark.sql import Window

    vq = (F.floor(F.col(value_col).cast("double") * F.lit(scale)
                  + F.lit(0.5)).cast("long"))
    q = df.select(*group_cols, vq.alias("vq"))

    def rank_median(t: DataFrame, col: str, out: str) -> DataFrame:
        w = Window.partitionBy(*group_cols).orderBy(col)
        wn = Window.partitionBy(*group_cols)
        r = (t.withColumn("_rn", F.row_number().over(w))
             .withColumn("_n", F.count(F.lit(1)).over(wn)))
        return (r.where(F.col("_rn")
                        == F.floor((F.col("_n") + 1) / 2))
                .select(*group_cols, F.col(col).alias(out)))

    med = rank_median(q, "vq", "med_q")
    dev = (q.join(F.broadcast(med), group_cols)
           .withColumn("dev", F.abs(F.col("vq") - F.col("med_q"))))
    mad = rank_median(dev.select(*group_cols, F.col("dev").alias("vq")),
                      "vq", "mad_q")
    cen = (dev.join(F.broadcast(mad), group_cols)
           .groupBy(*group_cols)
           .agg(F.count(F.lit(1)).alias("n"),
                F.first("med_q").alias("med_q"),
                F.first("mad_q").alias("mad_q"),
                F.sum(F.when(F.col("dev") > F.lit(int(k)) * F.col("mad_q"),
                             1).otherwise(0)).cast("long")
                .alias("n_outliers")))
    return cen.select(*group_cols, "n", "med_q", "mad_q", "n_outliers")


def key_skew_report(df: DataFrame, key_col: str,
                    percentiles: tuple[int, ...] = (50, 90, 99)
                    ) -> DataFrame:
    """Join/shuffle-key skew diagnostic — the measurement that decides
    whether a key needs salting (operators/joins.salted_join) or can
    ride AQE's skew-split. ONE output row::

        (n_rows, n_keys, max_cnt, p50_cnt, p90_cnt, p99_cnt,
         mean_cnt_ppm, skew_ratio_ppm, top_key)

    ``pXX_cnt`` are EXACT percentiles of the per-key row-count
    distribution (value at ascending rank ⌈p·n_keys/100⌉ — nearest-
    rank definition, no interpolation); ``mean_cnt_ppm =
    (1e6·n_rows) div n_keys`` and ``skew_ratio_ppm = (1e6·max_cnt·
    n_keys) div n_rows`` (max/mean — 1 000 000 means perfectly
    uniform) are exact BIGINT arithmetic end-to-end, so a DuckDB
    oracle reproduces every field bit-for-bit. ``top_key`` is the
    hottest key (ties to the smallest key string).

    Scale: one map-side-combined groupBy on the key, then everything
    operates on the per-key count table — and the percentile pass
    compresses it further to the DISTINCT-count-value distribution
    ``(cnt, freq)`` with a cumulative sum ordered by cnt, so the only
    single-partition window runs over |distinct frequency values|
    rows (bounded by max_cnt in the worst case, typically tiny) —
    never over the keys themselves. No sort of the key table, no
    driver collect."""
    cnt = (df.groupBy(F.col(key_col).cast("string").alias("k"))
           .agg(F.count(F.lit(1)).alias("c")))
    stats = cnt.agg(
        F.sum("c").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.max("c").cast("long").alias("max_cnt"),
        F.min_by("k", F.struct((-F.col("c")).alias("nc"),
                               F.col("k").alias("k"))).alias("top_key"))
    dist = (cnt.groupBy("c").agg(F.count(F.lit(1)).alias("f"))
            .withColumn("cum", F.expr(
                "sum(f) OVER (ORDER BY c ROWS BETWEEN UNBOUNDED "
                "PRECEDING AND CURRENT ROW)")))
    pct = [F.min(F.when(
        F.col("cum") >= F.expr(f"({p} * n_keys + 99) div 100"),
        F.col("c"))).cast("long").alias(f"p{p}_cnt")
        for p in percentiles]
    return (dist.crossJoin(F.broadcast(stats))
            .groupBy("n_rows", "n_keys", "max_cnt", "top_key")
            .agg(*pct)
            .select("n_rows", "n_keys", "max_cnt",
                    *[f"p{p}_cnt" for p in percentiles],
                    F.expr("(1000000 * n_rows) div n_keys")
                    .cast("long").alias("mean_cnt_ppm"),
                    F.expr("(1000000 * max_cnt * n_keys) div n_rows")
                    .cast("long").alias("skew_ratio_ppm"),
                    "top_key"))


def chi2_drift(df: DataFrame, group_col, value_col: str,
               buckets: int = 10,
               scale: float = 1_000_000.0) -> DataFrame:
    """Two-sample chi-square drift detector — the distribution-shift
    monitor a training pipeline runs between corpus snapshots (did
    yesterday's crawl shift the quality/value distribution?). The
    pooled distribution is cut into rank-based equal-frequency
    buckets (exact micro-unit integers, no quantile interpolation);
    each bucket row carries both samples' observed counts, the
    expected counts under homogeneity, and the chi-square
    contribution::

        (bucket, n_a long, n_b long, contrib double)

    Σ contrib ~ χ²(buckets-1) under no drift — the caller compares
    against the critical value (or feeds several snapshots' totals
    to [[cusum_alarms]] for sequential detection).

    Determinism: counts are exact integers; each ``contrib`` is a
    fixed chain of single IEEE ops on exact-integer-valued doubles
    ((n−E)²/E with E = rowtotal·coltotal/N), so every emitted double
    is bit-deterministic. Only a cross-row SUM of contribs would be
    order-sensitive — which is why the operator emits per-bucket
    rows and leaves the 10-row total to the caller.

    Scale (r11 — was one global row_number, i.e. an Exchange
    SinglePartition over the POOLED CORPUS, the row-table global
    window this repo bans): ``repartitionByRange`` on (value, group)
    slices the total order into one slice per unit of session
    parallelism (``ranking._n_slices``, r12); per-slice row counts
    (one row per slice) take one tiny ordered window to become rank
    offsets (the systematic_pps / budget_select bucket-offset
    discipline), and each row's pooled rank is its slice offset plus
    a SLICE-LOCAL row_number. The global count and MIN group label
    come off the same slice stats — no unbounded corpus window
    anywhere. Rank ties (equal
    (value, group) rows) are interchangeable for counting, so bucket
    counts are bit-identical to the single-partition form on any
    layout. Use coarser pre-aggregated histograms when the pooled
    table is the full 100 TB.

    Cache note: the range-slice frame persist is released by no explicit
    unpersist (the return stays lazy — an eager release would
    force a premature action; ngram_jaccard_pairs precedent);
    sessions issuing MANY calls should release between batches
    via ``spark.catalog.clearCache()``."""
    from pyspark.sql import Window

    vq = (F.floor(F.col(value_col).cast("double") * F.lit(scale)
                  + F.lit(0.5)).cast("long"))
    t = df.select(F.col(group_col).alias("_g"), vq.alias("_vq"))
    # slice count follows the session's shuffle parallelism (r12 —
    # was a hardcoded 32; same derivation as ranking._n_slices, and
    # bucket counts are bit-identical for any slice count).
    from pointdatabase_spark.operators.ranking import _n_slices
    part = (t.repartitionByRange(_n_slices(t, None), F.col("_vq").asc(),
                                 F.col("_g").asc())
            .withColumn("_pid", F.spark_partition_id())
            # three consumers (slice stats -> offsets, slice stats ->
            # globals, the ranked rows) — persist pins ONE range
            # exchange (2 longs per row cached) and makes the
            # _pid-consistency argument a storage fact rather than a
            # boundary-sampling-determinism argument
            .persist())
    ss = part.groupBy("_pid").agg(
        F.count(F.lit(1)).alias("_pc"), F.min("_g").alias("_pg"))
    owin = (Window.orderBy("_pid")
            .rowsBetween(Window.unboundedPreceding, -1))
    offs = (ss.withColumn("_off", F.coalesce(F.sum("_pc").over(owin),
                                             F.lit(0).cast("long")))
            .select("_pid", "_off"))
    glob = ss.agg(F.sum("_pc").alias("_n"), F.min("_pg").alias("_lo"))
    lwin = Window.partitionBy("_pid").orderBy("_vq", "_g")
    ranked = (part.withColumn("_lrn", F.row_number().over(lwin))
              .join(F.broadcast(offs), "_pid")
              .crossJoin(F.broadcast(glob))
              .withColumn("_rn", F.col("_off") + F.col("_lrn")))
    b = int(buckets)
    # equal-frequency bucket of the POOLED rank: floor((rn-1)*b/n)
    # — pure integer arithmetic, identical on any engine.
    bucket = F.floor((F.col("_rn") - 1) * F.lit(b) / F.col("_n"))
    tagged = ranked.select(
        bucket.cast("long").alias("bucket"),
        F.when(F.col("_g") == F.col("_lo"), 1).otherwise(0)
        .alias("_isa"))
    cnt = (tagged.groupBy("bucket")
           .agg(F.sum("_isa").cast("long").alias("n_a"),
                F.sum(1 - F.col("_isa")).cast("long").alias("n_b")))
    tot = cnt.agg(F.sum("n_a").cast("long").alias("ta"),
                  F.sum("n_b").cast("long").alias("tb"))
    j = cnt.crossJoin(F.broadcast(tot))
    n = (F.col("ta") + F.col("tb")).cast("double")
    rt = (F.col("n_a") + F.col("n_b")).cast("double")
    ea = rt * F.col("ta").cast("double") / n
    eb = rt * F.col("tb").cast("double") / n
    contrib = ((F.col("n_a") - ea) * (F.col("n_a") - ea) / ea
               + (F.col("n_b") - eb) * (F.col("n_b") - eb) / eb)
    return j.select("bucket", "n_a", "n_b", contrib.alias("contrib"))


def gram_matrix(df: DataFrame, vec_col: str = "embedding",
                quantize: int = 6) -> DataFrame:
    """Exact upper-triangle Gram / second-moment matrix of an
    embedding column — the covariance-structure profile an embedding
    pipeline monitors between snapshots (anisotropy drift, collapsed
    dimensions, whitening inputs for PCA/ZCA whose k×k eigensolve is
    then legitimately driver-side). Returns one row per index pair
    ``(i, j, n_vectors, gram_q)`` with ``i <= j`` (0-based) and
    ``gram_q = qround(sum over vectors of v[i]·v[j], quantize)``.

    Scale shape (word-count economics): the dim² pair explode is
    SCAN-LOCAL, and the map-side partial aggregate collapses every
    task's contribution to at most dim·(dim+1)/2 rows before the one
    exchange — shuffle volume is tasks × pairs, never vectors ×
    pairs. All arithmetic is float→double widening then double
    multiply/sum (JVM codegen, no Python); the DuckDB oracle repeats
    it term-for-term modulo summation order, which the quantized
    output absorbs (the repo-wide qround convention). NULL vectors
    are excluded; dim is driven by the data (ragged inputs would
    produce pair keys only where both indexes exist — callers with
    ragged corpora should length-filter first)."""
    pairs = (df.where(F.col(vec_col).isNotNull())
             .select(F.posexplode(vec_col).alias("i", "_vi"),
                     F.col(vec_col).alias("_v"))
             .select("i", F.col("_vi").cast("double").alias("_vi"),
                     F.posexplode("_v").alias("j", "_vj"))
             .where(F.col("j") >= F.col("i")))
    prod = F.col("_vi") * F.col("_vj").cast("double")
    return (pairs.groupBy(F.col("i").cast("long").alias("i"),
                          F.col("j").cast("long").alias("j"))
            .agg(F.count(F.lit(1)).cast("long").alias("n_terms"),
                 rounding.qround(F.sum(prod), quantize)
                 .alias("gram_q")))


def rater_agreement(df: DataFrame, a_col: str, b_col: str) -> DataFrame:
    """Cohen's kappa between two boolean gate columns — the standard
    inter-rater agreement audit a pipeline runs between two quality
    filters (rule-based vs model-based) before trusting either as the
    sole gate: kappa near 0 means the gates fire on unrelated
    subsets (both are needed); near 1 means one is redundant.

    Exact integer arithmetic end to end: the 2×2 contingency counts
    come from ONE grand aggregate (map-side combined, 1-row result),
    and kappa = (n·p_o − pe_num) / (n² − pe_num) with
    pe_num = keep_a·keep_b + drop_a·drop_b is emitted in ppm via
    BIGINT ``div`` — Spark's ``div`` and DuckDB's ``//`` both
    truncate toward zero, so the value is bit-identical on any
    engine and any row order (no double summation anywhere).
    Valid while 10⁶·n² < 2⁶³ (n ≤ 3·10⁶), ENFORCED by an in-plan
    assert on the 1-row frame — an agreement audit over a larger
    corpus should run on a hash_split sample (it is a statistical
    audit, not a transform), which also caps the count.

    Returns one row: (n, both_keep, a_only, b_only, both_drop,
    po_ppm, kappa_ppm)."""
    a = F.col(a_col).cast("boolean")
    b = F.col(b_col).cast("boolean")
    # Aggregate on the boolean PAIR first (<= 4 cells): each gate
    # expression evaluates ONCE per row as a group key. Folding the
    # gates into four conditional sums instead lets CollapseProject
    # inline the (expensive — token-array lambdas) gate expressions
    # into every condition, re-evaluating them 4-8x per row —
    # measured 6x wall on filter_agreement_kappa at sf0.1.
    cells = (df.groupBy(a.alias("_a"), b.alias("_b"))
             .agg(F.count(F.lit(1)).cast("long").alias("_c")))
    cnt = (lambda cond: F.coalesce(
        F.sum(F.when(cond, F.col("_c"))), F.lit(0)).cast("long"))
    agg = cells.agg(
        F.sum("_c").cast("long").alias("n"),
        cnt(F.col("_a") & F.col("_b")).alias("both_keep"),
        cnt(F.col("_a") & ~F.col("_b")).alias("a_only"),
        cnt(~F.col("_a") & F.col("_b")).alias("b_only"),
        cnt(~F.col("_a") & ~F.col("_b")).alias("both_drop"))
    n_ok = F.when(
        F.assert_true(
            F.col("n") <= F.lit(3_000_000),
            F.concat(F.lit("rater_agreement: n="),
                     F.col("n").cast("string"),
                     F.lit(" exceeds the exact-BIGINT kappa bound "
                           "(10^6*n^2 > 2^63); audit a hash_split "
                           "sample instead"))
        ).isNull(), F.col("n")).alias("n")
    agg = agg.select(n_ok, "both_keep", "a_only", "b_only", "both_drop")
    keep_a = F.col("both_keep") + F.col("a_only")
    keep_b = F.col("both_keep") + F.col("b_only")
    drop_a = F.col("b_only") + F.col("both_drop")
    drop_b = F.col("a_only") + F.col("both_drop")
    po = F.col("both_keep") + F.col("both_drop")
    pe_num = keep_a * keep_b + drop_a * drop_b
    num = F.col("n") * po - pe_num
    den = F.col("n") * F.col("n") - pe_num
    # den == 0 <=> pe == 1 (both raters constant and equal) -> kappa
    # is conventionally 1 when agreement is perfect there.
    return (agg
            .withColumn("_num", num).withColumn("_den", den)
            .select(
                "n", "both_keep", "a_only", "b_only", "both_drop",
                F.expr("(1000000 * (both_keep + both_drop)) div n")
                .cast("long").alias("po_ppm"),
                F.when(F.col("_den") == 0,
                       F.lit(1_000_000).cast("long"))
                .otherwise(F.expr("(1000000 * _num) div _den")
                           .cast("long"))
                .alias("kappa_ppm")))


def psi_drift(df: DataFrame, group_col, value_col: str,
              buckets: int = 10) -> DataFrame:
    """Population Stability Index between two samples — the
    industry-standard drift score (PSI < 0.1 stable, > 0.25 shifted)
    complementing :func:`chi2_drift`'s significance test with an
    effect-size measure. Reuses chi2_drift's exact rank-bucketed
    counts (same range-sliced pooled ranking, no corpus window), then
    per bucket::

        p = (n + 0.5) / (total + 0.5·buckets)      # Laplace smoothing
        psi_q = qround((p_a − p_b) · ln(p_a / p_b), 9)

    The smoothing keeps one-sided buckets finite (a raw 0 count would
    emit ±inf) and is an exact rational on both engines; ln is libm
    (not correctly-rounded-guaranteed), so the contribution quantizes
    to 9 dp — the bm25 convention. Emits per-bucket rows; the
    `buckets`-row Σ is the caller's one addition (order-sensitivity
    never crosses the engine boundary)."""
    cells = chi2_drift(df, group_col, value_col, buckets) \
        .select("bucket", "n_a", "n_b")
    tot = cells.agg(F.sum("n_a").cast("long").alias("_ta"),
                    F.sum("n_b").cast("long").alias("_tb"))
    sm = F.lit(0.5 * buckets)
    pa = ((F.col("n_a").cast("double") + F.lit(0.5))
          / (F.col("_ta").cast("double") + sm))
    pb = ((F.col("n_b").cast("double") + F.lit(0.5))
          / (F.col("_tb").cast("double") + sm))
    return (cells.crossJoin(F.broadcast(tot))
            .select("bucket", "n_a", "n_b",
                    rounding.qround((pa - pb) * F.log(pa / pb), 9)
                    .alias("psi_q")))
