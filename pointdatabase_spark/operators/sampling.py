"""Deterministic sampling / splitting / packing for training-data
pipelines (§7.8 extension; no reference analog — the reference's only
subsetting is spatial).

Everything here is REPRODUCIBLE BY CONSTRUCTION: assignment comes from
md5 of the row's id (not `rand()`), so re-running on the same corpus —
or on any subset, on any cluster size, in any partition order — gives
the same splits. That property (stability under reshuffling and
incremental ingest) is what training pipelines actually need from a
sampler, and what `df.sample`/`randomSplit` do NOT give (they are
partition-order dependent). All ops are pure built-in expressions and
window functions; the DuckDB oracles reproduce them bit-for-bit via
the shared md5 recipe.

Scale shapes:
- `hash_split`: per-row expression, zero shuffles — a 100 TB corpus
  splits at scan speed.
- `per_group_quota`: one shuffle (by group) + in-partition top-n via
  row_number; the hash order makes the quota an unbiased deterministic
  sample, not "first n in storage order".
- `pack_sequences`: one shuffle (by shard key); the running token sum
  is a window over the deterministic hash order. Shard count scales
  with data; each shard's packing is independent.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pointdatabase_spark.operators.dedup import _H32

# md5-derived uniform in [0, 1): 2^32 buckets are plenty for split
# fractions quoted to ~1e-4 precision.
_DENOM = float(1 << 32)


def _hash_frac(id_col: str, salt: str) -> Column:
    h = _H32.format(s=f"concat(CAST({id_col} AS STRING), '{salt}')")
    return F.expr(h) / F.lit(_DENOM)


def hash_frac_sql(id_col: str, salt: str, h32: str) -> str:
    """DuckDB-side twin of the uniform hash fraction; `h32` is the
    caller's md5→int32 recipe with {x} already bound to
    concat(CAST(id AS VARCHAR), '<salt>')."""
    return f"({h32} / {_DENOM!r})"


def hash_split(df: DataFrame, splits: list[tuple[str, float]],
               id_col: str = "doc_id", salt: str = "v1") -> DataFrame:
    """Append a `split` column assigning each row to a named fraction
    (e.g. [("train", .9), ("val", .05), ("test", .05)]) by hashed id.
    Deterministic, order-independent, stable under incremental ingest
    — changing `salt` re-rolls every assignment at once (the knob for
    split-version migrations)."""
    total = sum(w for _, w in splits)
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights sum to {total}, expected 1.0")
    u = _hash_frac(id_col, salt)
    acc = 0.0
    conds = []
    for name, w in splits[:-1]:
        acc += w
        conds.append((name, acc))
    expr = F.lit(splits[-1][0])
    for name, ub in reversed(conds):
        expr = F.when(u < F.lit(ub), F.lit(name)).otherwise(expr)
    return df.withColumn("split", expr)


def chunk_documents(df: DataFrame, chunk_tokens: int = 64,
                    overlap: int = 16, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Split each document into fixed-size token windows with overlap
    — the chunker every pretraining / retrieval pipeline runs before
    embedding or packing. Chunk k covers tokens
    [1 + k·step, k·step + chunk_tokens] (step = chunk_tokens −
    overlap); the final chunk is allowed to run short, and a document
    shorter than one chunk yields exactly one chunk.

    Pure built-in expressions: split → per-row chunk-count arithmetic
    → explode → `slice`. The explode is NARROW (each output row
    derives from its input row in place), so a 100 TB corpus chunks
    at scan speed with zero shuffles — the row blowup happens inside
    the task, never across the wire.

    Returns (id, chunk_idx, n_chunk_tokens, chunk_text)."""
    c, s = int(chunk_tokens), int(chunk_tokens) - int(overlap)
    if s <= 0:
        raise ValueError("overlap must be smaller than chunk_tokens")
    # NULL text counts as an empty document (one empty chunk) rather
    # than silently vanishing from the output — downstream id joins
    # must see every input id exactly once per expected chunk.
    base = df.select(F.col(id_col).alias("id"),
                     F.split(F.coalesce(F.col(text_col), F.lit("")),
                             r"\s+").alias("_t"))
    nc = F.expr(f"CASE WHEN size(_t) <= {c} THEN 1 ELSE "
                f"CAST(ceil((size(_t) - {c}) / CAST({s} AS DOUBLE)) "
                f"AS INT) + 1 END")
    ex = (base.withColumn("_nc", nc)
          .select("id", "_t",
                  F.explode(F.expr("sequence(0, _nc - 1)"))
                  .alias("chunk_idx")))
    chunk = F.expr(f"slice(_t, 1 + chunk_idx * {s}, {c})")
    return ex.select(
        "id", F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.size(chunk).cast("long").alias("n_chunk_tokens"),
        F.concat_ws(" ", chunk).alias("chunk_text"))


def mixture_rates(df: DataFrame, weights: dict[str, float],
                  domain_col: str = "source") -> DataFrame:
    """Per-domain sampling rates that rebalance the corpus to the
    target mixture `weights` (domain → target proportion) WITHOUT
    upsampling: the output size is the largest T with
    count_d ≥ w_d·T for every weighted domain, so the binding domain
    keeps rate 1.0 and everything else downsamples to match.

    Fully in-plan: one map-combined count aggregate (|domains| rows),
    a 1-row min reduce for T, and a broadcastable rate table —
    nothing corpus-sized moves.

    A weighted domain with NO corpus rows contributes nothing to T
    (its rate row simply does not exist), so the realized mixture
    renormalizes over the domains actually present — a typo'd domain
    name degrades silently rather than raising. When that matters,
    validate `rates.count() == len(weights)` before sampling; an
    in-plan assertion would force an eager action on every call."""
    total = sum(weights.values())
    w_expr = F.lit(None).cast("double")
    for name, w in weights.items():
        w_expr = F.when(F.col(domain_col) == name,
                        F.lit(w / total)).otherwise(w_expr)
    cnt = (df.groupBy(domain_col)
           .agg(F.count(F.lit(1)).cast("double").alias("_n"))
           .withColumn("_w", w_expr)
           .where(F.col("_w") > 0))
    tmin = cnt.select(F.min(F.col("_n") / F.col("_w")).alias("_t"))
    return (cnt.crossJoin(F.broadcast(tmin))
            .select(domain_col,
                    F.least(F.lit(1.0),
                            F.col("_w") * F.col("_t") / F.col("_n"))
                    .alias("sample_rate")))


def mixture_sample(df: DataFrame, weights: dict[str, float],
                   domain_col: str = "source", id_col: str = "doc_id",
                   salt: str = "m1") -> DataFrame:
    """Rebalance the corpus toward the target domain mixture by
    deterministic hash-threshold sampling: keep a row iff its hashed
    id falls under its domain's :func:`mixture_rates` rate. Domains
    absent from `weights` are dropped.

    The 100 TB shape: the rate table (|domains| rows) broadcasts, so
    the corpus itself NEVER shuffles — the pass is scan-local, unlike
    an exact-count rebalance (row_number by domain), which would
    shuffle 100 TB onto |domains| partitions (catastrophic skew).
    Counts land within binomial noise of the exact w_d·T target,
    which is what production mixture rebalancers accept in exchange
    for a shuffle-free plan; assignment is stable under re-runs and
    incremental ingest (same md5 recipe as :func:`hash_split`)."""
    rates = mixture_rates(df, weights, domain_col)
    return (df.join(F.broadcast(rates), domain_col)
            .where(_hash_frac(id_col, salt) < F.col("sample_rate")))


def per_group_quota(df: DataFrame, group_cols: list[str], n: int,
                    id_col: str = "doc_id",
                    salt: str = "q1") -> DataFrame:
    """At most `n` rows per group, chosen by hashed-id order — an
    unbiased deterministic within-group sample (storage order would
    bias toward early ingest). One shuffle on the group key."""
    w = Window.partitionBy(*group_cols).orderBy(
        _hash_frac(id_col, salt).asc(), F.col(id_col).asc())
    return (df.withColumn("_rk", F.row_number().over(w))
            .where(F.col("_rk") <= n)
            .drop("_rk"))


def pack_sequences(df: DataFrame, budget: int,
                   group_cols: list[str] | None = None,
                   id_col: str = "doc_id",
                   token_col: str = "n_tokens",
                   salt: str = "p1") -> DataFrame:
    """Assign rows to fixed-token-budget shards: rows are laid out in
    deterministic hash order and cut greedily every time the running
    token sum crosses a multiple of `budget` — the streaming-friendly
    approximation of bin packing every sequence-packing pipeline uses
    (exact bin packing is NP-hard and order-dependent; the prefix-sum
    cut is deterministic, one prefix-sum pass, and wastes at most one
    document's tokens per boundary). Documents larger than `budget`
    get a shard of their own. Appends `pack_id`.

    Scale (r12 — was one per-group window TASK, and packing groups
    are language/source labels, i.e. corpus-scale): the running token
    ledger comes from
    :func:`~pointdatabase_spark.operators.ranking.range_prefix_sum`
    (range-slice offsets + slice-local running sums within each
    group — bit-identical, the (hash, id) order key is unique). The
    rank's range-slice persist follows the lazy-cache contract
    (``spark.catalog.clearCache()`` between batches)."""
    from pointdatabase_spark.operators.ranking import range_prefix_sum
    gc = list(group_cols or [])
    swept, _cache = range_prefix_sum(
        df.withColumn("_okey", _hash_frac(id_col, salt)),
        ["_okey", id_col], token_col, group_cols=gc or None,
        out_col="_runsum")
    # shard = which budget-multiple the EXCLUSIVE prefix sum reached;
    # floor-of-division (not cast) so both engines truncate identically
    prev = F.col("_runsum") - F.col(token_col).cast("long")
    return (swept.withColumn(
        "pack_id", F.floor(prev / F.lit(int(budget))).cast("long"))
        .drop("_okey", "_runsum"))


def weighted_sample(df: DataFrame, weight_col: str, budget_frac: float,
                    id_col: str = "doc_id",
                    salt: str = "w1") -> DataFrame:
    """Deterministic importance sampling: keep each row with
    probability ``min(1, budget_frac · w / mean(w))`` via the same
    md5-hash-threshold recipe as :func:`hash_split` — rows with twice
    the weight are kept twice as often, the expected kept fraction is
    ``budget_frac`` (exact when no row clips at 1), and assignment is
    stable under re-runs, subsetting, and incremental ingest.  The
    quality-weighted corpus downsampler.

    In-plan: one map-combined 1-row mean aggregate, broadcast back;
    the corpus itself never shuffles — scan-local keep/drop."""
    mean = df.select(F.avg(F.col(weight_col)).alias("_mw"))
    p = F.least(F.lit(1.0), F.lit(float(budget_frac))
                * F.col(weight_col) / F.col("_mw"))
    return (df.crossJoin(F.broadcast(mean))
            .where(_hash_frac(id_col, salt) < p)
            .drop("_mw"))


def cluster_balanced_sample(emb: DataFrame, cents: list[list[float]],
                            target_per_cell: int,
                            id_col: str = "vec_id",
                            vec_col: str = "embedding",
                            salt: str = "cb1") -> DataFrame:
    """Cluster-balanced corpus downsampling: assign each embedding to
    its nearest coarse centroid (map-side expression — the IVF kernel
    from operators/similarity.py), then keep each row with probability
    ``min(1, target_per_cell / |cell|)`` via the package's
    deterministic md5-hash threshold.  Dense regions of embedding
    space are thinned toward ``target_per_cell`` while sparse regions
    are kept whole — the diversity-flattening pass pre-training
    pipelines run after dedup (cluster-balanced reweighting a la
    DataComp / SSL-prototypes) so near-duplicate-free but
    topic-skewed corpora don't drown rare domains.

    Scale shape: one groupBy on the cell key produces a counts frame
    BOUNDED BY n_centroids (a config constant, not a function of
    corpus size), which is broadcast back; the corpus itself never
    shuffles — assignment, threshold, and filter are all map-side.
    Deterministic and stable under incremental ingest: a row's fate
    depends only on (id, salt, its cell's census), so re-running
    after an append only re-rolls cells whose counts changed.

    Returns the kept (id_col, cell) rows."""
    from pointdatabase_spark.operators.similarity import cell_expr
    c = (emb.select(F.col(id_col).alias("id"),
                    F.expr(cell_expr(vec_col, cents)).alias("cell")))
    counts = c.groupBy("cell").agg(F.count(F.lit(1)).alias("n_c"))
    keep_p = F.least(F.lit(1.0), F.lit(float(target_per_cell))
                     / F.col("n_c"))
    return (c.join(F.broadcast(counts), "cell")
            .where(_hash_frac("id", salt) < keep_p)
            .select(F.col("id").alias(id_col), "cell"))


def shard_assign(df: DataFrame, n_shards: int,
                 id_col: str = "doc_id",
                 salt: str = "sh1") -> DataFrame:
    """Deterministic training-shard assignment + global pseudo-random
    order: ``shard`` = md5(id)%n_shards, ``shard_pos`` = rank of the
    row inside its shard under a SECOND independent hash (ties to
    id).  Together they define the exact byte order of the training
    export — reproducible on any cluster size, any partition order,
    and stable under re-runs, which `repartition + rand()` is not.

    Scale shape (r12 — was one per-shard window, i.e. corpus/n_shards
    rows in ONE task): assignment is a per-row expression; shard_pos
    comes from
    :func:`~pointdatabase_spark.operators.ranking.range_row_number`
    over (shard, hash-order key) — range-slice offset + slice-local
    row_number, bit-identical (the (hash, id) key is unique within a
    shard), no task ever holds more than a range slice of one shard.
    The rank's range-slice persist follows the lazy-cache contract
    (``spark.catalog.clearCache()`` between batches); the writer path
    below needs no window at all (byte order within a shard is
    sorted at write)."""
    from pointdatabase_spark.operators.ranking import range_row_number
    h = F.expr(_H32.format(
        s=f"concat(CAST({id_col} AS STRING), '{salt}')"))
    o = F.expr(_H32.format(
        s=f"concat(CAST({id_col} AS STRING), '{salt}#o')"))
    ranked, _cache = range_row_number(
        df.withColumn("shard", (h % n_shards).cast("bigint"))
        .withColumn("_okey", o),
        ["_okey", id_col], group_cols=["shard"], out_col="shard_pos")
    return (ranked.withColumn("shard_pos",
                              F.col("shard_pos").cast("bigint"))
            .drop("_okey"))


def write_training_shards(df: DataFrame, path: str, n_shards: int,
                          id_col: str = "doc_id",
                          salt: str = "sh1") -> None:
    """Materialize the shard export: one directory per shard
    (partitionBy), rows hash-ordered within each file — the
    deterministic global shuffle a trainer consumes.  No window: the
    writer sorts within partitions after a shard repartition, so the
    plan is repartition(n_shards) + sort + write."""
    h = F.expr(_H32.format(
        s=f"concat(CAST({id_col} AS STRING), '{salt}')"))
    o = F.expr(_H32.format(
        s=f"concat(CAST({id_col} AS STRING), '{salt}#o')"))
    out = (df.withColumn("shard", (h % n_shards).cast("bigint"))
           .withColumn("_okey", o)
           .repartition(n_shards, "shard")
           .sortWithinPartitions("shard", "_okey", id_col)
           .drop("_okey"))
    out.write.mode("overwrite").partitionBy("shard").parquet(path)


def mixture_upsample(df: DataFrame, weights: dict[str, float],
                     group_col: str = "source",
                     id_col: str = "doc_id",
                     salt: str = "up1") -> DataFrame:
    """Deterministic upsampling WITH replacement: each row of group g
    appears floor(w_g) times plus one more with probability
    frac(w_g) — so a group's expected multiplicity is exactly its
    weight (the epoch-repeat side of mixture training, where
    ``mixture_sample`` is the downsampling side; weights come from a
    temperature/heuristic schedule, e.g. w = (p_target/p_corpus)).

    Per-row ``copy`` index (0-based) disambiguates repeats for
    downstream shuffling/packing.  Scale shape: a per-row CASE plus a
    narrow ``explode(sequence())`` — zero shuffles, scan-speed at any
    corpus size; determinism comes from the package md5 recipe, so
    re-runs and partial re-ingests repeat the same rows."""
    import math as _m
    whole = F.lit(0)
    frac = F.lit(0.0)
    for g, w in weights.items():
        if w < 0:
            raise ValueError(f"negative weight for {g!r}")
        whole = F.when(F.col(group_col) == g,
                       F.lit(int(_m.floor(w)))).otherwise(whole)
        frac = F.when(F.col(group_col) == g,
                      F.lit(float(w - _m.floor(w)))).otherwise(frac)
    n = (whole + (_hash_frac(id_col, salt) < frac).cast("int"))
    return (df.withColumn("_n", n)
            .where(F.col("_n") > 0)
            .withColumn("copy", F.explode(
                F.expr("sequence(0, _n - 1)")))
            .withColumn("copy", F.col("copy").cast("long"))
            .drop("_n"))


def budget_select(df: DataFrame, token_budget: int,
                  quality_col: str, tokens_col: str,
                  id_col: str = "doc_id") -> DataFrame:
    """Token-budget corpus selection: walk documents from highest
    ``quality_col`` down (tie -> smallest id) and keep them until the
    running ``tokens_col`` total passes ``token_budget`` — "take the
    best docs until we have N training tokens", the final selection
    step after scoring.  A document is kept iff the cumulative token
    count UP TO AND INCLUDING it is <= budget, plus the first
    straddling document (so the budget is always reached when the
    corpus allows; standard greedy knapsack-with-overflow-one rule).

    Scale shape (r11 — was a corpus-sized ``Window.orderBy``, which
    Spark plans as Exchange SinglePartition + one-task sort, the
    row-table global window this repo bans): ``repartitionByRange``
    on (quality desc, id) splits the total order into balanced range
    slices; per-slice token totals (``buckets`` rows) take ONE tiny
    ordered window to become slice offsets (the systematic_pps
    bucket-offset discipline), and each row's global running sum is
    its slice offset plus a SLICE-LOCAL window — fully parallel.
    The cumulative sum over a total order is a pure function of the
    data (slice boundaries cancel out), so the output is
    bit-identical to the single-partition form on any layout.

    Cache note: the range-slice frame persist is released by no explicit
    unpersist (the return stays lazy — an eager release would
    force a premature action; ngram_jaccard_pairs precedent);
    sessions issuing MANY calls should release between batches
    via ``spark.catalog.clearCache()``."""
    # slice count follows the session's shuffle parallelism (r12 —
    # was a hardcoded 32, a local-core constant; ranking._n_slices is
    # the shared audited derivation). Output is bit-identical for ANY
    # slice count (the adversarial-repartition test's invariant).
    from pointdatabase_spark.operators.ranking import _n_slices
    b = _n_slices(df, None)
    part = (df.repartitionByRange(b, F.col(quality_col).desc(),
                                  F.col(id_col).asc())
            .withColumn("_pid", F.spark_partition_id())
            # two consumers (slice token totals, the ranked rows) —
            # persist pins ONE range exchange and makes the
            # _pid-consistency argument a storage fact. The cache
            # holds the CALLER's columns: pre-prune to
            # (id, quality, tokens, keep-cols) before calling, as the
            # registered query does.
            .persist())
    tot = part.groupBy("_pid").agg(
        F.sum(F.col(tokens_col).cast("long")).alias("_pt"))
    owin = (Window.orderBy("_pid")
            .rowsBetween(Window.unboundedPreceding, -1))
    offs = tot.withColumn(
        "_off", F.coalesce(F.sum("_pt").over(owin),
                           F.lit(0).cast("long"))).select("_pid", "_off")
    lwin = (Window.partitionBy("_pid")
            .orderBy(F.col(quality_col).desc(), F.col(id_col).asc())
            .rowsBetween(Window.unboundedPreceding, 0))
    run = F.sum(F.col(tokens_col).cast("long")).over(lwin)
    return (part.withColumn("_cl", run)
            .join(F.broadcast(offs), "_pid")
            .withColumn("cum_tokens",
                        (F.col("_off") + F.col("_cl")).cast("long"))
            .where((F.col("cum_tokens") - F.col(tokens_col))
                   < F.lit(int(token_budget)))
            .drop("_pid", "_cl", "_off"))


def stratified_split(df: DataFrame, strata_cols: list[str],
                     splits: list[tuple[str, float]],
                     id_col: str = "doc_id",
                     salt: str = "v1") -> DataFrame:
    """EXACT-proportion train/val/test assignment per stratum: within
    each stratum rows are ranked by hashed id and the first
    ``ceil(f1*n)`` go to split 1, the next block to split 2, etc. —
    so every stratum lands within one row of its target fraction
    (what :func:`hash_split` cannot promise for small strata, where
    the binomial spread swamps the target).

    Deterministic and order-independent (the rank key is
    ``md5(salt || id)``), but NOT stable under incremental ingest —
    adding rows re-ranks a stratum; use hash_split for open-ended
    corpora and this for frozen evaluation sets.

    Scale (r12 — was one per-stratum window, i.e. one TASK per
    stratum: strata are class labels, so a "language = en" stratum
    over a 100 TB corpus is most of the corpus in a single sort):
    per-stratum ranks come from
    :func:`~pointdatabase_spark.operators.ranking.range_row_number`
    (range-slice offset + slice-local row_number within each
    stratum — bit-identical, the sort key (md5, id) is unique), and
    stratum sizes from a groupBy count joined back (AQE broadcasts
    the label-bounded count table). No stage holds more than one
    range slice of any stratum.

    Cache note: the rank's range-slice persist is released by no
    explicit unpersist (the return stays lazy; ngram_jaccard_pairs
    precedent); sessions issuing MANY calls should release between
    batches via ``spark.catalog.clearCache()``."""
    from pointdatabase_spark.operators.ranking import range_row_number
    total = sum(w for _, w in splits)
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights sum to {total}, expected 1.0")
    key = F.md5(F.concat(F.lit(salt),
                         F.col(id_col).cast("string")))
    ranked, _cache = range_row_number(
        df.withColumn("_key", key), ["_key", id_col],
        group_cols=strata_cols, out_col="_rn")
    cnt = (ranked.groupBy(*strata_cols)
           .agg(F.count(F.lit(1)).alias("_n")))
    r = ranked.join(cnt, strata_cols)
    acc = 0.0
    expr = F.lit(splits[-1][0])
    bounds = []
    for name, frac in splits[:-1]:
        acc += frac
        bounds.append((name, acc))
    for name, ub in reversed(bounds):
        expr = F.when(
            F.col("_rn") <= F.ceil(F.col("_n") * F.lit(ub)),
            F.lit(name)).otherwise(expr)
    # r already carries every df column — project the split directly
    # (a join back to df would add a second exchange + source scan).
    return r.select(*df.columns, expr.alias("split"))


def upsert_latest_wins(base: DataFrame, updates: DataFrame,
                       key_cols: list[str],
                       version_col: str = "_v") -> DataFrame:
    """SCD-type-1 MERGE: the update rows overwrite base rows sharing
    their key; unmatched updates insert; unmatched base rows carry
    forward — the incremental-snapshot refresh every lakehouse table
    runs per ingest cycle. Implemented as union + one per-key
    max(struct(version, payload)) aggregation: the map-side partial
    collapses each partition's duplicates before the exchange, so
    the shuffle carries ~one row per (partition, key) — the same
    partial-agg shape as exact_dedup, and equivalent to (but one
    pass cheaper than) the window row_number formulation.

    ``updates`` gets version 1, ``base`` version 0; within a version
    the row is unique per key by contract (enforce upstream)."""
    cols = [c for c in base.columns if c not in key_cols]
    if set(base.columns) != set(updates.columns):
        raise ValueError("base/updates schemas differ")
    tagged = (base.withColumn(version_col, F.lit(0))
              .unionByName(updates.withColumn(version_col, F.lit(1))))
    payload = F.struct(F.col(version_col).alias("v"),
                       *[F.col(c).alias(c) for c in cols])
    agg = (tagged.groupBy(*key_cols)
           .agg(F.max(payload).alias("_p")))
    out = agg.select(*key_cols,
                     *[F.col(f"_p.{c}").alias(c) for c in cols],
                     F.col("_p.v").alias(version_col))
    return out


def systematic_pps(df: DataFrame, id_col: str, weight_col: str,
                   k: int, buckets: int = 64) -> DataFrame:
    """Systematic probability-proportional-to-size sampling (Madow
    1949) — the survey-sampling classic that draws an EXACT fixed-k
    weighted sample: lay all rows on a [0, W) line in a deterministic
    hash order, each row owning an interval equal to its integer
    weight, and take the k midpoint-strided thresholds
    ``t_j = ((2j+1)·W) div (2k)``. A row is selected once per
    threshold inside its interval, so Σ``n_hits`` = k exactly, every
    row's inclusion expectation is proportional to its weight, and a
    row heavier than W/k is selected with multiplicity — the
    fixed-budget complement to :func:`weighted_sample`'s Poisson
    (independent, variable-count) design. Returns
    ``(id, wt, n_hits)`` for selected rows only.

    Everything is BIGINT arithmetic (interval ends, thresholds, the
    hit-count inversion ``#{j: t_j < c} = clamp((2kc + W - 1) div
    (2W), 0, k)``) on the md5-hash total order — bit-reproducible on
    any engine, any partitioning, any cluster size, valid while
    ``(2k+1)·W <= 2^63-1`` (W = Σweights). That bound is ENFORCED by
    an in-plan assert on the bucket-offset frame: past it (e.g.
    k = 10^6 against a 100-TB corpus weighted in characters,
    W ~ 10^14) the numerator would wrap silently with ANSI off, so
    the operator fails loudly instead — rescale weights (e.g. weigh
    in KiB, not bytes) or split the draw.

    Scale shape — the distributed prefix sum: a global running sum
    ordered by hash would be one single-partition window over the
    CORPUS (the anti-pattern this repo bans). Instead rows land in
    ``buckets`` hash buckets; per-bucket totals (`buckets` rows)
    take ONE tiny ordered window to become bucket offsets (the
    distinct-value-window discipline), and each row's global
    position is its bucket offset plus an in-bucket running sum —
    windows partitioned BY BUCKET, fully parallel. Two shuffles
    (bucket agg, bucket-partitioned window) + one broadcast of the
    offsets/W; selection itself is a per-row expression."""
    if k < 1:
        raise ValueError(f"need k >= 1, got {k=}")
    if buckets < 1:
        raise ValueError(f"need buckets >= 1, got {buckets=}")
    w = (df.select(F.col(id_col).alias("id"),
                   F.col(weight_col).cast("long").alias("wt"))
         .where(F.col("wt") > 0)
         .withColumn("h", F.expr(_H32.format(s="CAST(id AS STRING)")))
         .withColumn("bk", F.pmod(F.col("h"), F.lit(int(buckets)))))
    bs = w.groupBy("bk").agg(F.sum("wt").alias("bw"))
    owin = (Window.orderBy("bk")
            .rowsBetween(Window.unboundedPreceding, -1))
    offs = (bs.withColumn("off", F.coalesce(F.sum("bw").over(owin),
                                            F.lit(0)))
            .withColumn("W", F.sum("bw").over(
                Window.rowsBetween(Window.unboundedPreceding,
                                   Window.unboundedFollowing)))
            .select("bk", "off", "W"))
    # BIGINT-overflow bound, ENFORCED in-plan (mirrors the cusum
    # pack guard, temporal.py): the hit-count numerator 2kc + W - 1
    # peaks at (2k+1)W - 1 when c = W, so the arithmetic is exact
    # iff (2k+1)·W <= 2^63-1. Beyond that the numerator wraps
    # SILENTLY with ANSI off — corrupt hit counts, not an error —
    # so the check must fail loudly. assert_true is NULL on success;
    # folding it into W (binning.py zorder precedent) keeps Catalyst
    # from pruning the check, and the offs frame is `buckets` rows,
    # so the guard costs nothing.
    max_w = ((1 << 63) - 1) // (2 * int(k) + 1)
    w_ok = F.when(
        F.assert_true(
            F.col("W") <= F.lit(max_w),
            F.concat(F.lit("systematic_pps: total weight W="),
                     F.col("W").cast("string"),
                     F.lit(f" with k={int(k)} overflows BIGINT "
                           f"hit-count arithmetic ((2k+1)*W > 2^63-1)"
                           f"; reduce k or rescale weights"))
        ).isNull(), F.col("W")).alias("W")
    offs = offs.select("bk", "off", w_ok)
    lwin = (Window.partitionBy("bk").orderBy("h", "id")
            .rowsBetween(Window.unboundedPreceding, 0))
    pos = (w.withColumn("cl", F.sum("wt").over(lwin))
           .join(F.broadcast(offs), "bk")
           .withColumn("c_cur", F.col("off") + F.col("cl"))
           .withColumn("c_prev", F.col("c_cur") - F.col("wt")))
    # #{j in [0,k): t_j < c} with t_j = ((2j+1)W) div (2k):
    # t_j < c  <=>  (2j+1)W < 2kc  <=>  j < (2kc - W)/(2W); count =
    # clamp(ceil((2kc - W)/(2W)), 0, k) = clamp((2kc + W - 1) div
    # (2W), 0, k)  — numerator >= W-1 >= 0 for c >= 0, so BIGINT
    # floor-div is the true ceil here.
    cnt = (lambda c: F.least(
        F.lit(int(k)).cast("long"),
        F.greatest(F.lit(0).cast("long"),
                   F.expr(f"(2 * {int(k)} * {c} + W - 1) div (2 * W)"))))
    return (pos.withColumn("n_hits", cnt("c_cur") - cnt("c_prev"))
            .where(F.col("n_hits") >= 1)
            .select("id", "wt", F.col("n_hits").cast("long")
                    .alias("n_hits")))


def length_bucketed_batches(df: DataFrame, batch_size: int,
                            id_col: str = "doc_id",
                            token_col: str = "n_tokens",
                            salt: str = "lb1") -> DataFrame:
    """Length-bucketed inference batching: rows bucket by
    ``floor(log2(tokens))`` (so batch-mates have within-2x lengths),
    then each bucket packs into fixed-size batches in deterministic
    hash order — the standard padding-waste minimizer for batched
    model inference (a batch pads every sequence to its max; mixing
    a 10-token doc into a 4096-token batch wastes 99% of the pad).
    Appends ``bucket`` and ``batch_id`` (global across buckets:
    bucket · 2³² + in-bucket batch ordinal — exact BIGINT).

    Scale: the in-bucket ordinal comes from
    :func:`~pointdatabase_spark.operators.ranking.range_row_number`
    with ``group_cols=[bucket]`` (range-slice offsets + slice-local
    row_number) — length buckets are corpus-scale classes, exactly
    the per-group window this repo distributes rather than
    single-tasks. The rank's range-slice persist follows the lazy
    cache contract (``spark.catalog.clearCache()`` between batches).
    """
    from pointdatabase_spark.operators.ranking import range_row_number
    if batch_size < 1:
        raise ValueError(f"need batch_size >= 1, got {batch_size=}")
    toks = F.col(token_col).cast("long")
    # floor(log2(n)) via binary-string length — EXACT integer
    # arithmetic (libm log2 can land within an ulp of an integer
    # exactly at the power-of-two bucket boundaries, the one place
    # it matters)
    bucket = (F.when(toks <= 0, F.lit(0).cast("long"))
              .otherwise((F.length(F.expr(
                  f"bin(CAST({token_col} AS BIGINT))"))
                  - F.lit(1)).cast("long")))
    d = df.withColumn("bucket", bucket) \
          .withColumn("_okey", _hash_frac(id_col, salt))
    ranked, _cache = range_row_number(
        d, ["_okey", id_col], group_cols=["bucket"], out_col="_r")
    return (ranked.withColumn(
        "batch_id", (F.col("bucket") * F.lit(4294967296)
                     + F.expr(f"(_r - 1) div {int(batch_size)}"))
        .cast("long"))
        .drop("_okey", "_r"))
