"""Lexical retrieval over the corpus — BM25 scoring (Robertson/
Sparck-Jones idf with 0.5 smoothing, Okapi tf saturation), the
keyword-search counterpart of the embedding ANN operators.  No
reference analog (the reference has no text surface); standard public
formulation.

Scale shape: the corpus tokenizes map-side and is FILTERED to query
terms before anything shuffles, so the only doc-scale exchange is the
(doc, term) tf aggregate over matching tokens — O(postings of the
query terms), not O(corpus tokens).  Document length rides along the
explode (no join back to the corpus); term document-frequencies and
the (N, avgdl) corpus stats are term-count-sized / 1-row aggregates
broadcast into the final map-side score expression.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pointdatabase_spark.functions import rounding


def bm25_scores(docs: DataFrame, query_terms: list[str],
                id_col: str = "doc_id", text_col: str = "text",
                k1: float = 1.2, b: float = 0.75) -> DataFrame:
    """Per-document BM25 score for a bag-of-words query (documents
    containing none of the terms are absent — score-0 docs never
    materialize).  Tokenization is lowercase whitespace split, shared
    verbatim by the DuckDB oracle.  Returns (id, bm25) with bm25
    rounded to 6 decimals so cross-engine libm drift in ``ln`` cannot
    flip rankings computed on the rounded value."""
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    terms = [t.lower() for t in query_terms]
    toks = F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))),
                   r"\s+")
    base = docs.select(F.col(id_col).alias("id"),
                       toks.alias("_t")).select(
        "id", F.size("_t").cast("double").alias("dl"),
        F.explode("_t").alias("tok"))
    hits = base.where(F.col("tok").isin(terms))
    tf = (hits.groupBy("id", "dl", "tok")
          .agg(F.count(F.lit(1)).cast("double").alias("tf")))
    dfreq = (tf.groupBy("tok")
             .agg(F.count(F.lit(1)).cast("double").alias("df")))
    stats = docs.select(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg(F.size(toks)).alias("avgdl"))
    idf = F.log(F.lit(1.0) + (F.col("n_docs") - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5)))
    denom = (F.col("tf") + F.lit(float(k1))
             * (F.lit(1.0 - b) + F.lit(float(b)) * F.col("dl")
                / F.col("avgdl")))
    contrib = idf * F.col("tf") * F.lit(float(k1) + 1.0) / denom
    return (tf.join(F.broadcast(dfreq), "tok")
            .crossJoin(F.broadcast(stats))
            .groupBy("id")
            .agg(rounding.qround(F.sum(contrib), 6).alias("bm25"))
            .withColumnRenamed("id", id_col))


def bm25_topk(docs: DataFrame, query_terms: list[str], k: int = 20,
              id_col: str = "doc_id", text_col: str = "text",
              k1: float = 1.2, b: float = 0.75) -> DataFrame:
    """Top-k BM25 hits, ranked on the ROUNDED score with the id as a
    deterministic tiebreak (ranking on raw doubles would let last-ulp
    ln() differences reorder near-ties across engines).  Plans as
    TakeOrderedAndProject — per-partition top-k, tiny merge."""
    scored = bm25_scores(docs, query_terms, id_col, text_col, k1, b)
    return (scored.orderBy(F.col("bm25").desc(), F.col(id_col))
            .limit(int(k)))


def bounded_rank(lst: DataFrame, score_col: str, id_col: str,
                 out_col: str = "rank",
                 descending: bool = True) -> DataFrame:
    """Dense 1-based rank of a k-BOUNDED list (a ``.limit(k)`` /
    TakeOrderedAndProject result) WITHOUT an ordered window:
    rank = 1 + |rows strictly ahead|, ties broken by ascending id.

    The global ``row_number`` window would plan as Exchange
    SinglePartition (the shape tests/test_plans.py bans registry-wide
    and allowlists only for distinct-value tables); here the input is
    k rows by construction, so an O(k²) broadcast nested-loop
    self-join is both cheap (k is a query constant — top-k lists) and
    window-free.  For corpus-scale inputs use
    ``ranking.range_row_number`` instead."""
    a = lst.select(F.col(id_col).alias("_aid"),
                   F.col(score_col).alias("_asc"))
    b = lst.select(F.col(id_col).alias("_bid"),
                   F.col(score_col).alias("_bsc"))
    if descending:
        better = F.col("_bsc") > F.col("_asc")
    else:
        better = F.col("_bsc") < F.col("_asc")
    ahead = better | ((F.col("_bsc") == F.col("_asc"))
                      & (F.col("_bid") < F.col("_aid")))
    return (a.join(F.broadcast(b), ahead, "left")
            .groupBy("_aid", "_asc")
            .agg((F.count("_bid") + F.lit(1)).cast("long").alias(out_col))
            .select(F.col("_aid").alias(id_col),
                    F.col("_asc").alias(score_col), out_col))


def rrf_fuse(lists: list[DataFrame], id_col: str = "doc_id",
             rank_col: str = "rank", k0: int = 60,
             out_col: str = "rrf") -> DataFrame:
    """Reciprocal-rank fusion (Cormack/Clarke/Buettcher 2009):
    score(d) = Σ over lists of 1 / (k0 + rank_d).  The standard
    training-data trick for hybridizing lexical (BM25) and dense
    (embedding ANN) retrieval without score calibration — only ranks
    cross lists, so the two scorers' scales never meet.

    Each input is a (id, rank) top-k list; the fuse is one union +
    one groupBy over Σk rows — bounded, never corpus-scale.  Returns
    (id, out_col, n_lists).  Cross-engine determinism: with two lists
    the double sum is order-independent (IEEE addition is commutative
    and the fold from 0 is exact for the first term); the score is
    additionally rounded to 9 dp so downstream consumers ranking on
    it can never be reordered by engine-side group order.  Callers
    fusing >2 lists should rank on the rounded value for the same
    reason."""
    if not lists:
        raise ValueError("rrf_fuse needs at least one ranked list")
    contribs = [
        lst.select(
            F.col(id_col).alias("_id"),
            (F.lit(1.0) / (F.lit(float(k0))
                           + F.col(rank_col).cast("double"))).alias("_c"))
        for lst in lists]
    u = contribs[0]
    for c in contribs[1:]:
        u = u.unionByName(c)
    return (u.groupBy("_id")
            .agg(rounding.qround(F.sum("_c"), 9).alias(out_col),
                 F.count(F.lit(1)).cast("long").alias("n_lists"))
            .withColumnRenamed("_id", id_col))


_PACK = 4294967296  # 2^32: BIGINT-packed (tf, id) argmax radix


def build_inverted_index(docs: DataFrame, id_col: str = "doc_id",
                         text_col: str = "text",
                         min_df: int = 1) -> DataFrame:
    """Vocabulary-level inverted-index build: per term its document
    frequency, collection frequency, and champion posting (the doc
    with the highest tf; smallest id on ties — the head of the
    champion list a stored index keeps per term).  BM25 computes
    postings on the fly per query; this is the build aggregate for
    the STORED index a 100 TB corpus would serve queries from,
    written partitioned by term-hash bucket.

    Scale shape: two hash aggregates with map-side partial combine
    ((term, doc) tf, then term), output vocabulary-sized; no windows,
    no joins.  The champion is an exact BIGINT-packed argmax
    (tf · 2³² + (2³²−1 − id)) so ties resolve identically on any
    engine; requires 0 ≤ id < 2³² and tf < 2³¹ (any in-memory
    document satisfies the latter).  The id bound is ENFORCED by an
    in-plan assert folded into the packed key (the systematic_pps
    overflow-guard pattern): past it the argmax would silently
    misorder with ANSI off, so the build fails loudly instead —
    remap ids (dense BIGINT surrogates) and rebuild."""
    toks = F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))),
                   r"\s+")
    base = docs.select(F.col(id_col).cast("long").alias("_id"),
                       F.explode(toks).alias("tok"))
    tf = (base.groupBy("tok", "_id")
          .agg(F.count(F.lit(1)).cast("long").alias("tf")))
    id_ok = F.when(
        F.assert_true(
            (F.col("_id") >= 0) & (F.col("_id") < F.lit(_PACK)),
            F.concat(F.lit("build_inverted_index: doc id "),
                     F.col("_id").cast("string"),
                     F.lit(" outside [0, 2^32) — the BIGINT-packed "
                           "champion argmax would misorder; remap "
                           "ids to dense surrogates"))
        ).isNull(), F.col("_id")).alias("_id")
    packed = tf.select("tok", "tf", id_ok).withColumn(
        "_key", F.col("tf") * F.lit(_PACK)
        + (F.lit(_PACK - 1) - F.col("_id")))
    idx = (packed.groupBy("tok")
           .agg(F.count(F.lit(1)).cast("long").alias("df"),
                F.sum("tf").cast("long").alias("cf"),
                F.max("_key").alias("_mk")))
    return (idx.where(F.col("df") >= int(min_df))
            .select("tok", "df", "cf",
                    (F.lit(_PACK - 1) - F.col("_mk") % F.lit(_PACK))
                    .cast("long").alias("top_doc"),
                    F.expr(f"_mk div {_PACK}").cast("long")
                    .alias("top_tf")))


def phrase_count(docs: DataFrame, phrase: list[str],
                 id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """Exact-phrase occurrence counts via a positional-index join:
    tokens posexplode with their positions, each side FILTERS to one
    phrase term's postings map-side, and term i joins term i+1 on
    (doc, pos + 1).  Returns (id, n_occ) for documents containing the
    phrase at least once.

    Scale shape: the joins move only the phrase terms' postings
    (O(postings), not O(corpus tokens)), keyed on (doc, pos) — high
    cardinality, skew-free.  n−1 joins for an n-term phrase, each
    input shrinking to the surviving prefix matches."""
    if len(phrase) < 2:
        raise ValueError("phrase_count needs a phrase of >= 2 terms")
    terms = [t.lower() for t in phrase]
    toks = F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))),
                   r"\s+")
    pos = docs.select(F.col(id_col).alias("_id"),
                      F.posexplode(toks).alias("pos", "tok"))
    cur = (pos.where(F.col("tok") == terms[0])
           .select("_id", F.col("pos").alias("_p0")))
    for i, t in enumerate(terms[1:], start=1):
        nxt = (pos.where(F.col("tok") == t)
               .select(F.col("_id").alias("_nid"),
                       F.col("pos").alias("_np")))
        cur = (cur.join(nxt, (cur["_id"] == nxt["_nid"])
                        & (nxt["_np"] == cur["_p0"] + F.lit(i)))
               .select("_id", "_p0"))
    return (cur.groupBy("_id")
            .agg(F.count(F.lit(1)).cast("long").alias("n_occ"))
            .withColumnRenamed("_id", id_col))


# ---------------------------------------------------------------------------
# Stored text index: the standing-query serving path. bm25_topk scans
# the corpus per query; a search workload builds the index ONCE
# (postings partitioned by term-hash bucket) and serves every query
# from the query terms' buckets alone — per-query cost O(query-term
# postings) with NO corpus scan, the remedy SCALE.md's BM25 row names.
# ---------------------------------------------------------------------------

def term_bucket(tok_col, buckets: int):
    """Deterministic term->bucket assignment (24-bit md5 prefix mod
    buckets) — the partition key of the stored index. Stable across
    engines, sessions, and cluster sizes, so query-time pruning can
    recompute it anywhere (including driver-side for literal terms,
    see :func:`term_bucket_py`)."""
    c = F.col(tok_col) if isinstance(tok_col, str) else tok_col
    return (F.conv(F.substring(F.md5(c), 1, 6), 16, 10)
            .cast("long") % F.lit(int(buckets)))


def term_bucket_py(term: str, buckets: int) -> int:
    """Driver-side mirror of :func:`term_bucket` for literal query
    terms (hashlib md5 == Spark md5 bit-for-bit)."""
    import hashlib
    return int(hashlib.md5(term.encode()).hexdigest()[:6], 16) \
        % int(buckets)


def write_text_index(docs: DataFrame, path: str,
                     id_col: str = "doc_id", text_col: str = "text",
                     buckets: int = 16,
                     facet_cols: tuple[str, ...] = ()) -> None:
    """Build and store the full-text index: ``postings/`` (tok,
    doc id, tf, dl — doc length denormalized onto each posting so
    serving never joins the corpus) and ``dfreq/`` (tok, df), both
    parquet PARTITIONED BY the term-hash ``bucket``, plus a 1-row
    ``stats/`` (n_docs, avgdl). One corpus scan — ``spread`` past the
    parquet's native split count first (the tokenize/explode is
    CPU-bound; the same fan-out rule as the gate audits); the posting
    build is the same two-stage map-combined aggregate as
    :func:`build_inverted_index`. At query time only the query
    terms' buckets are read (partition pruning) — the per-query cost
    is independent of corpus size.

    ONE corpus pass (r12, guide §1.2/§2.3): the tokenize+explode+
    aggregate pipeline runs exactly once — for the postings write.
    dfreq and stats then DERIVE from the postings parquet just
    written (a column-pruned read of the small artifact) instead of
    re-running the corpus tokenize two more times; previously the
    build scanned + retokenized the corpus 3x. The derivations are
    exact identities given unique doc ids (the index contract):
    df(tok) = COUNT(*) of its postings; n_docs = COUNT(DISTINCT id)
    (every doc emits >= 1 token — split('') is ['']); sum_dl =
    SUM(tf) as BIGINT, because per doc SUM(tf) over its terms is its
    token count dl."""
    from pointdatabase_spark.partitioning import spread
    docs = spread(docs)
    fc = list(facet_cols)
    toks = F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))),
                   r"\s+")
    base = docs.select(F.col(id_col).alias("id"),
                       *[F.col(c) for c in fc],
                       F.size(toks).cast("double").alias("dl"),
                       F.explode(toks).alias("tok"))
    tf = (base.groupBy("tok", "id", "dl", *fc)
          .agg(F.count(F.lit(1)).cast("double").alias("tf"))
          .withColumn("bucket", term_bucket("tok", buckets)))
    # bucket-aligned files: repartition ON the partition column before
    # the partitioned write, so each bucket dir holds ONE file instead
    # of one per upstream task (up to tasks x buckets small files —
    # measured ~2x on the sf0.1 build; and the layout a bucket-pruned
    # serve wants to read anyway).
    (tf.repartition(int(buckets), F.col("bucket"))
     .write.mode("overwrite").partitionBy("bucket")
     .parquet(f"{path}/postings"))
    posts = docs.sparkSession.read.parquet(f"{path}/postings")
    dfreq = (posts.groupBy("tok")
             .agg(F.count(F.lit(1)).cast("long").alias("df"))
             .withColumn("bucket", term_bucket("tok", buckets)))
    (dfreq.repartition(int(buckets), F.col("bucket"))
     .write.mode("overwrite").partitionBy("bucket")
     .parquet(f"{path}/dfreq"))
    # stats store EXACT integers (doc count, summed token count), not
    # the average: avgdl = sum_dl / n_docs is then ONE division at
    # serve time — bit-identical on any engine AND exactly
    # maintainable under append deltas (integer adds). tf is an
    # integer-valued double, so the per-posting cast is exact and the
    # BIGINT sum is exact to 2^63.
    stats = posts.agg(
        F.countDistinct("id").cast("long").alias("n_docs"),
        F.sum(F.col("tf").cast("long")).cast("long").alias("sum_dl"))
    stats.write.mode("overwrite").parquet(f"{path}/stats")


def bm25_topk_served(spark, path: str, query_terms: list[str],
                     k: int = 20, id_col: str = "doc_id",
                     k1: float = 1.2, b: float = 0.75,
                     buckets: int = 16) -> DataFrame:
    """Serve a BM25 top-k from the STORED index — bit-identical to
    :func:`bm25_topk` on the same corpus (pinned in pytest), with no
    corpus scan: the driver computes the query terms' buckets
    (:func:`term_bucket_py`), the postings/dfreq scans prune to those
    partitions, and the score is the same broadcast-joined map-side
    expression as the inline path (same plan shape after the scan, so
    the per-doc contribution sum folds in the same order)."""
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    terms = [t.lower() for t in query_terms]
    qb = sorted({term_bucket_py(t, buckets) for t in terms})
    tf = (spark.read.parquet(f"{path}/postings")
          .where(F.col("bucket").isin(qb))
          .where(F.col("tok").isin(terms))
          .select("tok", "id", "dl", "tf"))
    # df/stats aggregate across whatever delta slices the store holds
    # (ONE slice after write_text_index/append_text_index; one per
    # batch under the log-structured streaming maintainer) — BIGINT
    # sums, so the merged values are exact and identical to a
    # single-slice store.
    dfreq = (spark.read.parquet(f"{path}/dfreq")
             .where(F.col("bucket").isin(qb))
             .where(F.col("tok").isin(terms))
             .groupBy("tok")
             .agg(F.sum("df").cast("double").alias("df")))
    stats = (spark.read.parquet(f"{path}/stats")
             .agg(F.sum("n_docs").cast("long").alias("_n"),
                  F.sum("sum_dl").cast("long").alias("_s"))
             .select(F.col("_n").cast("double").alias("n_docs"),
                     (F.col("_s").cast("double")
                      / F.col("_n").cast("double")).alias("avgdl")))
    idf = F.log(F.lit(1.0) + (F.col("n_docs") - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5)))
    denom = (F.col("tf") + F.lit(float(k1))
             * (F.lit(1.0 - b) + F.lit(float(b)) * F.col("dl")
                / F.col("avgdl")))
    contrib = idf * F.col("tf") * F.lit(float(k1) + 1.0) / denom
    return (tf.join(F.broadcast(dfreq), "tok")
            .crossJoin(F.broadcast(stats))
            .groupBy("id")
            .agg(rounding.qround(F.sum(contrib), 6).alias("bm25"))
            .withColumnRenamed("id", id_col)
            .orderBy(F.col("bm25").desc(), F.col(id_col))
            .limit(int(k)))


def append_text_index(delta: DataFrame, path: str,
                      id_col: str = "doc_id", text_col: str = "text",
                      buckets: int = 16,
                      facet_cols: tuple[str, ...] = ()) -> None:
    """Continuous-ingest maintenance of the stored text index: a
    batch of NEW documents (append-only — ids must be disjoint from
    the stored corpus; updates/deletes are an upsert store's job)
    lands as (1) appended posting files in the same term-hash bucket
    partitions, (2) a merged df table, (3) exact integer adds into
    the 1-row stats. Per-batch cost is O(delta postings +
    vocabulary); the stored postings are never rescanned or
    rewritten — the `append_ann_index` discipline for text.

    Because stats hold exact integers (n_docs, sum_dl) and df merges
    by BIGINT addition, an index maintained by appends serves
    BIT-IDENTICALLY to one built from the full corpus at once
    (pinned in pytest). The vocabulary-sized df/stats frames are
    eagerly materialized (persist + count) before their overwrite —
    Spark cannot lazily read a path it is replacing."""
    spark = delta.sparkSession
    from pointdatabase_spark.partitioning import spread
    delta = spread(delta)
    fc = list(facet_cols)  # MUST match the base index's facet_cols
    toks = F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))),
                   r"\s+")
    base = delta.select(F.col(id_col).alias("id"),
                        *[F.col(c) for c in fc],
                        F.size(toks).cast("double").alias("dl"),
                        F.explode(toks).alias("tok"))
    # ONE delta tokenize (r12, guide §1.2): tf is persisted (delta-
    # sized by definition of an append batch) and feeds the posting
    # append, the df delta, AND the stats delta — previously each of
    # the three re-ran the tokenize+explode over the delta. Released
    # before return (ADVICE r11: no unreleased caches).
    tf = (base.groupBy("tok", "id", "dl", *fc)
          .agg(F.count(F.lit(1)).cast("double").alias("tf"))
          .withColumn("bucket", term_bucket("tok", buckets))
          .persist())
    # every unpersist sits in a finally: an exception during any of
    # the three writes must not leak a cached frame (ADVICE r12 —
    # the no-unreleased-caches rule applies to the failure path too)
    merged = new_stats = None
    try:
        (tf.repartition(int(buckets), F.col("bucket"))
         .write.mode("append").partitionBy("bucket")
         .parquet(f"{path}/postings"))
        d_df = (tf.groupBy("tok")
                .agg(F.count(F.lit(1)).cast("long").alias("df")))
        old_df = spark.read.parquet(f"{path}/dfreq").select("tok", "df")
        merged = (old_df.unionByName(d_df)
                  .groupBy("tok")
                  .agg(F.sum("df").cast("long").alias("df"))
                  .withColumn("bucket", term_bucket("tok", buckets))
                  .persist())
        merged.count()
        (merged.repartition(int(buckets), F.col("bucket"))
         .write.mode("overwrite").partitionBy("bucket")
         .parquet(f"{path}/dfreq"))
        # exact identities over tf (unique delta ids — the append
        # contract): n_docs = distinct posting ids, sum_dl = SUM(tf).
        d_stats = tf.agg(
            F.countDistinct("id").cast("long").alias("n_docs"),
            F.sum(F.col("tf").cast("long")).cast("long").alias("sum_dl"))
        old_stats = spark.read.parquet(f"{path}/stats")
        new_stats = (old_stats.unionByName(d_stats)
                     .agg(F.sum("n_docs").cast("long").alias("n_docs"),
                          F.sum("sum_dl").cast("long").alias("sum_dl"))
                     .persist())
        new_stats.count()
        new_stats.write.mode("overwrite").parquet(f"{path}/stats")
    finally:
        tf.unpersist()
        if merged is not None:
            merged.unpersist()
        if new_stats is not None:
            new_stats.unpersist()


def proximity_count(docs: DataFrame, phrase: list[str],
                    slop: int = 0, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Ordered proximity search — :func:`phrase_count` generalized
    with a ``slop``: consecutive phrase terms may be separated by up
    to ``slop`` extra tokens (``slop=0`` is the exact phrase,
    pinned equal in pytest).  Counts matching CHAINS per document
    (each step-wise positional path; a chain per (start, ...,
    end) combination — the deterministic, engine-agnostic count).

    Same scale shape as the exact phrase: each join input filters to
    ONE term's postings map-side, keys are (doc, position) —
    O(phrase-term postings) per join, widened only by the slop
    window (each match fans out to at most slop+1 successors per
    step)."""
    if len(phrase) < 2:
        raise ValueError("proximity_count needs a phrase of >= 2 terms")
    if slop < 0:
        raise ValueError("slop must be >= 0")
    terms = [t.lower() for t in phrase]
    toks = F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))),
                   r"\s+")
    pos = docs.select(F.col(id_col).alias("_id"),
                      F.posexplode(toks).alias("pos", "tok"))
    cur = (pos.where(F.col("tok") == terms[0])
           .select("_id", F.col("pos").alias("_pl")))
    for t in terms[1:]:
        nxt = (pos.where(F.col("tok") == t)
               .select(F.col("_id").alias("_nid"),
                       F.col("pos").alias("_np")))
        cur = (cur.join(nxt, (cur["_id"] == nxt["_nid"])
                        & (nxt["_np"] > cur["_pl"])
                        & (nxt["_np"] <= cur["_pl"] + F.lit(1 + slop)))
               .select("_id", F.col("_np").alias("_pl")))
    return (cur.groupBy("_id")
            .agg(F.count(F.lit(1)).cast("long").alias("n_chains"))
            .withColumnRenamed("_id", id_col))


def bm25_batch_served(spark, path: str,
                      queries_df: DataFrame, k: int = 10,
                      qid_col: str = "q_id", term_col: str = "term",
                      id_col: str = "doc_id",
                      k1: float = 1.2, b: float = 0.75,
                      buckets: int = 16) -> DataFrame:
    """Serve a BATCH of keyword queries from the stored index in ONE
    job — the bulk-retrieval pattern (RAG context fetch, eval-suite
    sweeps): ``queries_df`` is (q_id, term) rows; postings for the
    union of query terms are read once (bucket partition pruning via
    an inner join on the term-count-sized query table, broadcast),
    scored per (q_id, doc), and cut to top-k per query by a
    q_id-partitioned rank window (WindowGroupLimit: each map task
    keeps a running k-heap per query, so k rows per query reach the
    exchange).

    Per-batch cost: O(postings of the union of query terms) +
    O(matches) — independent of corpus size, shared scan across
    queries. Ranking is on the ROUNDED per-(q,doc) score with doc id
    tiebreak (the bm25_topk convention). The per-query score sums
    the same per-term contributions as the single-query path, so a
    1-query batch equals :func:`bm25_topk_served` exactly (pinned in
    pytest)."""
    from pyspark.sql import Window
    q = (queries_df.select(F.col(qid_col).alias("q_id"),
                           F.lower(F.col(term_col)).alias("tok"))
         .distinct())
    terms = [r["tok"] for r in q.select("tok").distinct().collect()]
    if not terms:
        raise ValueError("queries_df has no terms")
    qb = sorted({term_bucket_py(t, buckets) for t in terms})
    tf = (spark.read.parquet(f"{path}/postings")
          .where(F.col("bucket").isin(qb))
          .where(F.col("tok").isin(terms))
          .select("tok", "id", "dl", "tf"))
    dfreq = (spark.read.parquet(f"{path}/dfreq")
             .where(F.col("bucket").isin(qb))
             .where(F.col("tok").isin(terms))
             .groupBy("tok")
             .agg(F.sum("df").cast("double").alias("df")))
    stats = (spark.read.parquet(f"{path}/stats")
             .agg(F.sum("n_docs").cast("long").alias("_n"),
                  F.sum("sum_dl").cast("long").alias("_s"))
             .select(F.col("_n").cast("double").alias("n_docs"),
                     (F.col("_s").cast("double")
                      / F.col("_n").cast("double")).alias("avgdl")))
    idf = F.log(F.lit(1.0) + (F.col("n_docs") - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5)))
    denom = (F.col("tf") + F.lit(float(k1))
             * (F.lit(1.0 - b) + F.lit(float(b)) * F.col("dl")
                / F.col("avgdl")))
    contrib = idf * F.col("tf") * F.lit(float(k1) + 1.0) / denom
    scored = (tf.join(F.broadcast(q), "tok")
              .join(F.broadcast(dfreq), "tok")
              .crossJoin(F.broadcast(stats))
              .groupBy("q_id", "id")
              .agg(rounding.qround(F.sum(contrib), 6).alias("bm25")))
    w = (Window.partitionBy("q_id")
         .orderBy(F.col("bm25").desc(), F.col("id")))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= int(k))
            .select("q_id", F.col("id").alias(id_col), "bm25",
                    F.col("rank").cast("long").alias("rank")))


def boolean_search_served(spark, path: str, must: list[str],
                          must_not: list[str] | None = None,
                          id_col: str = "doc_id",
                          buckets: int = 16) -> DataFrame:
    """Boolean retrieval from the stored index: documents containing
    ALL ``must`` terms and NONE of ``must_not``, without touching the
    corpus.  The conjunction is a postings groupBy counting distinct
    matched must-terms == |must| (one aggregate over the pruned
    postings — no |must|-way self-join), the negation one LEFT ANTI
    join against the must_not postings.  Returns (id, sum_tf) where
    sum_tf totals the must terms' frequencies (a simple conjunctive
    rank; feed the ids to :func:`bm25_batch_served` for scored
    ranking).

    Scale: both scans partition-prune to the involved terms' buckets;
    cost O(postings of involved terms), independent of corpus
    size."""
    if not must:
        raise ValueError("must terms required")
    mt = sorted({t.lower() for t in must})
    nt = sorted({t.lower() for t in (must_not or [])})
    qb = sorted({term_bucket_py(t, buckets) for t in mt + nt})
    posts = (spark.read.parquet(f"{path}/postings")
             .where(F.col("bucket").isin(qb)))
    hits = (posts.where(F.col("tok").isin(mt))
            .groupBy("id")
            .agg(F.countDistinct("tok").alias("_nt"),
                 F.sum(F.col("tf").cast("long")).cast("long")
                 .alias("sum_tf"))
            .where(F.col("_nt") == len(mt))
            .drop("_nt"))
    if nt:
        neg = (posts.where(F.col("tok").isin(nt))
               .select("id").distinct())
        hits = hits.join(neg, "id", "left_anti")
    return hits.withColumnRenamed("id", id_col)


def facet_counts_served(spark, path: str, query_terms: list[str],
                        facet_col: str, id_col: str = "doc_id",
                        buckets: int = 16) -> DataFrame:
    """Faceted hit counts from the stored index: for an OR keyword
    query, per-facet counts of matching documents — the search-page
    sidebar aggregate. Requires the index to have been written with
    ``facet_cols`` including ``facet_col`` (facets DENORMALIZED onto
    postings, the dl discipline: serving never joins the corpus).

    Scale: postings prune to the query terms' buckets; a doc counts
    ONCE per facet regardless of how many query terms it matches
    (distinct on (facet, id) before the count — two map-combined
    aggregates). Cost O(query-term postings)."""
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    terms = sorted({t.lower() for t in query_terms})
    qb = sorted({term_bucket_py(t, buckets) for t in terms})
    posts = (spark.read.parquet(f"{path}/postings")
             .where(F.col("bucket").isin(qb))
             .where(F.col("tok").isin(terms)))
    return (posts.select(F.col(facet_col).alias("facet"), "id")
            .distinct()
            .groupBy("facet")
            .agg(F.count(F.lit(1)).cast("long").alias("n_docs")))
