"""Deduplication operators for training-data pipelines: exact,
MinHash+LSH, SimHash, and n-gram Jaccard near-dup detection.

Spark-first design notes (100 TB shape):

- **Signatures are per-row expressions** (no UDFs, no shuffle): shingle
  sets, MinHash arrays, and SimHash integers are computed inside
  whole-stage codegen via array lambdas. The only shuffles are the
  LSH band-bucket self-join and the final distinct — exactly the
  shuffles the algorithm requires.
- **The band join carries keys, not documents.** Only (id, band-key)
  pairs shuffle (a few dozen bytes/row at any document size); shingle
  sets are re-joined only for the *candidate* pairs that survive
  banding, so the expensive payload never fans out 9×.
- **Skew**: identical boilerplate docs make hot band keys. AQE skew
  join handles moderate cases; for pathological corpora pass
  ``max_bucket`` to :func:`minhash_neardup` — band keys with more
  than ``max_bucket`` members are dropped before the self-join (the
  classic "skip mega-clusters, they're exact dups anyway" trick: a
  k-member bucket would emit k² candidate pairs, and buckets that
  hot are boilerplate/identical content that the O(n)
  :func:`exact_dedup` pass already collapses). The hot-key set is
  tiny by construction (≤ corpus/max_bucket keys), so the exclusion
  is a broadcast anti-join — no extra shuffle of the band table.

All hashing is md5-based so the DuckDB correctness oracle reproduces
results bit-for-bit (see queries.py). Capability extends the reference
engine's file-identity dedup (geo_index.py:129-156) to content-level
near-dup at corpus scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pointdatabase_spark.partitioning import spread

# 32-bit integer digest from an md5 hex prefix — exact in BIGINT.
_H32 = "CAST(conv(substr(md5({s}), 1, 8), 16, 10) AS BIGINT)"


def shingle_expr(tok_col: str, n: int = 3) -> str:
    """Distinct word n-gram array over a token-array column (1-based
    element_at keeps parity with DuckDB list indexing)."""
    parts = ", ".join(f"element_at({tok_col}, i + {k})" for k in range(n))
    return (f"CASE WHEN size({tok_col}) >= {n} THEN "
            f"array_distinct(transform(sequence(1, size({tok_col}) - {n - 1}), "
            f"i -> concat_ws(' ', {parts}))) "
            f"ELSE array() END")


def _tokens(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return df.select(F.col(id_col).alias("id"),
                     F.split(F.col(text_col), r"\s+").alias("t"))


def exact_dedup(df: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Exact duplicate groups by full-content hash: one row per
    duplicated fingerprint with the survivor id and copy count."""
    return (df.groupBy(F.md5(F.col(text_col)).alias("fp"))
            .agg(F.min(id_col).alias("keep_id"),
                 F.count("*").alias("n_copies"))
            .where(F.col("n_copies") >= 2))


def shingle_sets(df: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text", n: int = 3) -> DataFrame:
    """(id, s) with s = distinct word n-gram set — the near-dup unit.
    (No `spread` here: minhash/simhash consumers shuffle by id right
    after, so a widening exchange is measured pure overhead.)"""
    return (_tokens(df, id_col, text_col)
            .select("id", F.expr(shingle_expr("t", n)).alias("s"))
            .where(F.size("s") > 0))


P31 = 2147483647  # Mersenne prime 2^31−1, the classic minhash modulus


def _h32_int(s: str) -> int:
    import hashlib
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def seed_params(n_hashes: int) -> list[tuple[int, int]]:
    """Universal-hash family parameters (a_k, b_k), md5-derived so the
    oracle inlines the identical literals."""
    return [(_h32_int(f"A{k}") % P31 or 1, _h32_int(f"B{k}") % P31)
            for k in range(n_hashes)]


def minhash_signatures(sh: DataFrame, n_hashes: int = 8) -> DataFrame:
    """MinHash signature per doc, in the scalable explode→groupBy
    shape: one md5 per (doc, shingle), then n_hashes codegen'd MIN
    aggregates over the universal family (a_k·h + b_k) mod 2^31−1.
    (Array-lambda variants are interpreted per element in Spark —
    higher-order functions don't codegen — so the exploded columnar
    aggregation is ~10× faster AND map-combines before the shuffle.)
    Returns one row per id with columns mh0..mh{n−1}."""
    ex = (sh.select("id", F.explode("s").alias("x"))
          .select("id", F.expr(_H32.format(s="x") + f" % {P31}").alias("h")))
    aggs = [F.min(F.expr(f"({a} * h + {b}) % {P31}")).alias(f"mh{k}")
            for k, (a, b) in enumerate(seed_params(n_hashes))]
    return ex.groupBy("id").agg(*aggs)


def lsh_band_keys(sig: DataFrame, bands: int, rows: int) -> DataFrame:
    """Explode each signature into `bands` bucket keys of `rows`
    minhashes each. Docs sharing any bucket key become candidates."""
    keys = [F.concat_ws("|", F.lit(str(j)),
                        *[F.col(f"mh{j * rows + r}").cast("string")
                          for r in range(rows)])
            for j in range(bands)]
    return sig.select("id", F.explode(F.array(*keys)).alias("bkey"))


def jaccard_verify(cand: DataFrame, sh: DataFrame,
                   threshold: float) -> DataFrame:
    """Exact Jaccard over shingle sets for candidate pairs only."""
    inter = F.size(F.array_intersect("sa", "sb"))
    return (cand
            .join(sh.select(F.col("id").alias("id_a"), F.col("s").alias("sa")),
                  "id_a")
            .join(sh.select(F.col("id").alias("id_b"), F.col("s").alias("sb")),
                  "id_b")
            .withColumn("inter", inter)
            .withColumn("jaccard",
                        F.col("inter")
                        / (F.size("sa") + F.size("sb") - F.col("inter")))
            .where(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", "jaccard"))


def drop_mega_buckets(band: DataFrame, max_bucket: int) -> DataFrame:
    """Remove band keys whose bucket exceeds ``max_bucket`` members.

    The count aggregate map-combines, and the resulting hot-key set
    has at most |band|/max_bucket rows, so the exclusion broadcasts —
    the band table itself is never shuffled by the cap."""
    hot = (band.groupBy("bkey")
           .agg(F.count(F.lit(1)).alias("_bn"))
           .where(F.col("_bn") > max_bucket)
           .select("bkey"))
    return band.join(F.broadcast(hot), "bkey", "left_anti")


def minhash_neardup(df: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text", n: int = 3,
                    n_hashes: int = 8, bands: int = 4,
                    threshold: float = 0.5,
                    max_bucket: int | None = None,
                    shingles: DataFrame | None = None,
                    verify_jaccard: DataFrame | None = None) -> DataFrame:
    """MinHash → LSH banding → exact-Jaccard verification.

    ``max_bucket`` caps the LSH bucket size: a band key shared by k
    documents contributes ~k²/2 candidate pairs, so one mega-cluster
    (boilerplate, templated spam, mass-duplicated text) turns the
    bucketed join quadratic. Keys above the cap are excluded before
    the self-join; their members are exact/near-identical content
    that the linear ``exact_dedup`` pass collapses instead. Default
    None preserves the uncapped (exhaustive) pairing.

    ``shingles`` lets a pipeline pass an already-computed
    :func:`shingle_sets` frame so the tokenize+shingle scan runs once
    per corpus, not once per stage (see `corpus_prep_pipeline`, which
    shares it with decontamination). The frame is persisted here if
    the caller has not done so — it feeds three consumers
    (signatures + both verify joins), and an uncached pass-through
    would silently recompute the very scan the parameter exists to
    share.

    ``verify_jaccard`` (r12): a precomputed (id_a, id_b, jaccard)
    table covering at least every shared-shingle pair (e.g. the
    audit's ground-truth kernel). When given, exact verification is
    an inner join against it instead of the two shingle-ARRAY joins
    of :func:`jaccard_verify` — identical output pair set and
    identical doubles (a banding candidate with zero shared shingles
    has jaccard 0 < threshold under the array path and no row under
    the join path; both drop it). The identity REQUIRES
    ``threshold > 0`` (asserted): at threshold <= 0 the array path
    would keep zero-overlap candidates the join path has no row for
    (ADVICE r12)."""
    if verify_jaccard is not None and not threshold > 0:
        raise ValueError(
            f"verify_jaccard requires threshold > 0, got {threshold=} "
            "(the inner-join identity drops zero-overlap candidates)")
    if shingles is not None:
        lvl = shingles.storageLevel
        sh = (shingles if (lvl.useMemory or lvl.useDisk)
              else shingles.persist())
    else:
        sh = shingle_sets(df, id_col, text_col, n).persist()
    band = lsh_band_keys(minhash_signatures(sh, n_hashes),
                         bands, n_hashes // bands)
    if max_bucket is not None:
        band = drop_mega_buckets(band, max_bucket)
    a, b = band.alias("a"), band.alias("b")
    cand = (a.join(b, (F.col("a.bkey") == F.col("b.bkey"))
                   & (F.col("a.id") < F.col("b.id")))
            .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
            .distinct())
    if verify_jaccard is not None:
        return (cand.join(verify_jaccard, ["id_a", "id_b"])
                .where(F.col("jaccard") >= threshold)
                .select("id_a", "id_b", "jaccard"))
    return jaccard_verify(cand, sh, threshold)


def simhash(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
            bits: int = 32, n: int = 3) -> DataFrame:
    """SimHash over word n-gram shingles (n-grams, not unigrams — a
    shared-vocabulary corpus makes unigram votes collapse to near-equal
    signatures; shingles keep unrelated docs far apart in hamming
    space).

    Same scalable shape as minhash: explode shingles, hash each once,
    then `bits` codegen'd conditional-SUM vote aggregates, and assemble
    the signature from the vote signs in one final projection."""
    sh = shingle_sets(df, id_col, text_col, n)
    ex = (sh.select("id", F.explode("s").alias("x"))
          .select("id", F.expr(_H32.format(s="x")).alias("h")))
    votes = ex.groupBy("id").agg(
        *[F.sum(F.expr(
            f"CASE WHEN (shiftright(h, {k}) & 1) = 1 THEN 1 ELSE -1 END"))
          .alias(f"v{k}") for k in range(bits)])
    assemble = " + ".join(
        f"(CASE WHEN v{k} > 0 THEN {1 << k} ELSE 0 END)"
        for k in range(bits))
    return votes.select(
        "id", F.expr(f"CAST({assemble} AS BIGINT)").alias("simhash"))


def simhash_neardup(df: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text", bits: int = 32, n: int = 3,
                    bands: int = 4, max_hamming: int = 3) -> DataFrame:
    """SimHash near-dup pairs: byte-band blocking (4 bands of 8 bits on
    a 32-bit signature — pigeonhole guarantees recall for hamming ≤ 3),
    then exact hamming filter on the candidates."""
    width = bits // bands
    mask = (1 << width) - 1
    sim = simhash(df, id_col, text_col, bits, n).persist()
    band = sim.select(
        "id", "simhash",
        F.explode(F.expr(
            f"transform(sequence(0, {bands - 1}), j -> "
            f"struct(j AS bid, shiftright(simhash, j * {width}) & {mask} AS key))"
        )).alias("b")
    ).select("id", "simhash", F.col("b.bid").alias("bid"),
             F.col("b.key").alias("key"))
    a, b = band.alias("a"), band.alias("b")
    return (a.join(b, (F.col("a.bid") == F.col("b.bid"))
                   & (F.col("a.key") == F.col("b.key"))
                   & (F.col("a.id") < F.col("b.id")))
            .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                    F.expr("CAST(bit_count(a.simhash ^ b.simhash) AS BIGINT)")
                    .alias("hamming"))
            .distinct()
            .where(F.col("hamming") <= max_hamming))


def hamming_neardup_pairs(hashes: DataFrame, hash_col: str = "dhash",
                          id_col: str = "doc_id", bits: int = 64,
                          bands: int = 4,
                          max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs over ANY integer fingerprint column (e.g. the
    64-bit image dHash from operators/multimodal.dhash_images) by
    band blocking + exact hamming filter — the simhash plan
    generalized: with ``bands`` > ``max_hamming`` the pigeonhole
    guarantees a pair within ``max_hamming`` bits shares at least one
    identical band, so recall is exact.  Shuffles carry
    (id, band-key) pairs — 16 bytes per row regardless of payload
    (for images: pixels never leave the hashing stage)."""
    width = bits // bands
    mask = (1 << width) - 1
    h = hashes.select(F.col(id_col).alias("id"),
                      F.col(hash_col).alias("_h"))
    band = h.select(
        "id", "_h",
        F.explode(F.expr(
            f"transform(sequence(0, {bands - 1}), j -> "
            f"struct(j AS bid, shiftright(_h, j * {width}) & {mask}"
            f" AS key))")).alias("b")
    ).select("id", "_h", F.col("b.bid").alias("bid"),
             F.col("b.key").alias("key"))
    a, b = band.alias("a"), band.alias("b")
    return (a.join(b, (F.col("a.bid") == F.col("b.bid"))
                   & (F.col("a.key") == F.col("b.key"))
                   & (F.col("a.id") < F.col("b.id")))
            .select(F.col("a.id").alias("id_a"),
                    F.col("b.id").alias("id_b"),
                    F.expr("CAST(bit_count(a._h ^ b._h) AS BIGINT)")
                    .alias("hamming"))
            .distinct()
            .where(F.col("hamming") <= max_hamming))


def duplicate_clusters(pairs: DataFrame, hops: int = 3) -> DataFrame:
    """Resolve near-dup PAIRS into cluster labels: bounded min-label
    propagation over the pair graph — ``hops`` rounds of
    lbl(u) ← min(lbl(u), min over neighbors' lbl).

    A dedup pipeline needs clusters, not pairs (pick one survivor per
    duplicate group). Exact-dup groups are cliques (diameter 1) and
    LSH near-dup clusters are near-cliques, so a small fixed hop count
    reaches the true component min in practice; bounded hops keep the
    operator deterministic AND SQL-expressible for the oracle (full
    convergence = iterate-until-fixpoint, the standard distributed
    connected-components loop; each round is the same join+agg).

    Scale shape: per round, one join of labels to the (doubled) edge
    list plus a min aggregate — both shuffle on node id, so AQE reuses
    the partitioning. The pair table and each round's label frame are
    LAZY ``localCheckpoint(eager=False)``s (r13): the label frame
    feeds the next round's plan in three places and the pair plan is
    typically a whole LSH pipeline, so a persist alone (which caches
    data but keeps the logical plan) made the analyzed tree grow
    ~4^hop × |pair plan| — at 3 hops inside corpus_prep_pipeline
    that was a 1227-node physical plan whose ANALYSIS dominated the
    query (measured 13.2 s of the pipeline's 19 s cold construction
    at sf0.1; the actual hop data is a few thousand rows). Lazy
    checkpoints truncate the lineage per round while keeping the
    operator contract lazy — no action runs until the caller's first
    action, which materializes the chain exactly once. Rows:
    O(nodes + edges), never corpus².

    Returns (doc_id, cluster_id); only documents appearing in a pair
    are present (singletons keep themselves — left-join in
    :func:`dedup_survivors`)."""
    pairs = pairs.select("id_a", "id_b").localCheckpoint(eager=False)
    ids = (pairs.select(F.col("id_a").alias("id"))
           .unionByName(pairs.select(F.col("id_b").alias("id")))
           .distinct())
    edges = (pairs.select(F.col("id_a").alias("u"), F.col("id_b").alias("v"))
             .unionByName(pairs.select(F.col("id_b").alias("u"),
                                       F.col("id_a").alias("v"))))
    lbl = ids.withColumn("lbl", F.col("id"))
    for _ in range(int(hops)):
        # the label frame appears on both sides of the edge join;
        # dataset aliases keep the self-join unambiguous
        lbl = (edges.alias("e")
               .join(lbl.alias("l"), F.col("e.u") == F.col("l.id"))
               .join(lbl.alias("r"), F.col("e.v") == F.col("r.id"))
               .groupBy(F.col("l.id").alias("id"), F.col("l.lbl").alias("lbl"))
               .agg(F.min(F.col("r.lbl")).alias("m"))
               .select("id", F.least("lbl", "m").alias("lbl"))
               .localCheckpoint(eager=False))
    return lbl.select(F.col("id").alias("doc_id"),
                      F.col("lbl").alias("cluster_id"))


def duplicate_clusters_converged(pairs: DataFrame,
                                 max_iter: int = 20) -> DataFrame:
    """Full connected-components cluster resolution: neighbor-min
    propagation PLUS pointer jumping (label ← label-of-label, i.e.
    path compression) per round, iterating to fixpoint.

    This is the 100 TB complement of the bounded-hop
    :func:`duplicate_clusters`: near-clique LSH clusters converge in
    1-2 rounds there, but an adversarial chain of near-dups (doc A ~
    B ~ C ... each pair within threshold, ends far apart) forms a
    PATH whose diameter is unbounded — plain hop-propagation needs
    O(diameter) shuffles. Pointer jumping doubles the compressed
    distance every round, so convergence is O(log diameter) rounds
    (a 64-node path converges in 5 rounds; see
    tests/test_extensions.py). ``max_iter`` is a hard cap — 20 rounds
    covers components of diameter ~2^20 edges, far beyond any real
    dedup graph — and the loop exits early at fixpoint (one
    driver-side count action per round, the standard distributed CC
    shape). Raises RuntimeError if the cap is hit before fixpoint
    rather than returning silently-partial clusters.

    Each round ends in a ``localCheckpoint``: the label frame
    feeds the next round's plan in four places, so without lineage
    TRUNCATION (persist alone caches data but keeps the logical plan)
    the plan tree grows ~4^round nodes and the driver dies in
    analysis long before any data moves — the standard
    iterative-algorithm failure mode. On a real cluster prefer a
    reliable checkpoint dir for fault tolerance; semantics identical.

    One action per round (r13, VERDICT r12 #3): the fixpoint check
    is FOLDED into the jump aggregation — each row carries its
    pre-round label, a lazy ``localCheckpoint`` marks the round
    frame, and a single SUM over the change flags both materializes
    the checkpoint and returns the changed-count. The previous shape
    paid two actions per round (eager checkpoint + a separate
    jump⨝old-labels count), i.e. one full extra key-hash join and
    job per round.

    Returns (doc_id, cluster_id) with cluster_id = component-min id.
    """
    pairs = pairs.select("id_a", "id_b").persist()
    ids = (pairs.select(F.col("id_a").alias("id"))
           .unionByName(pairs.select(F.col("id_b").alias("id")))
           .distinct())
    edges = (pairs.select(F.col("id_a").alias("u"), F.col("id_b").alias("v"))
             .unionByName(pairs.select(F.col("id_b").alias("u"),
                                       F.col("id_a").alias("v")))
             .localCheckpoint())
    lbl = ids.withColumn("lbl", F.col("id")).localCheckpoint()
    for _ in range(int(max_iter)):
        prop = (edges.alias("e")
                .join(lbl.alias("l"), F.col("e.u") == F.col("l.id"))
                .join(lbl.alias("r"), F.col("e.v") == F.col("r.id"))
                .groupBy(F.col("l.id").alias("id"),
                         F.col("l.lbl").alias("lbl"))
                .agg(F.min(F.col("r.lbl")).alias("m"))
                .select("id", F.col("lbl").alias("_old"),
                        F.least("lbl", "m").alias("lbl")))
        # pointer jump: follow each label to that node's own label
        # (labels are node ids by construction, so the self-join is
        # total for non-min nodes; coalesce keeps component minima).
        # _chg compares against the row's own pre-round label —
        # labels are monotone non-increasing, so inequality IS change.
        fin = F.coalesce("lbl2", "lbl")
        jump = (prop.alias("a")
                .join(prop.select(F.col("id").alias("lbl"),
                                  F.col("lbl").alias("lbl2")).alias("b"),
                      "lbl", "left")
                .select("id", fin.alias("lbl"),
                        (fin != F.col("_old")).cast("long").alias("_chg"))
                .localCheckpoint(eager=False))  # lazy: the count below
        # materializes the checkpoint AND returns the fixpoint test —
        # ONE job per round, no join against the old labels
        changed = jump.agg(F.sum("_chg")).first()[0] or 0
        lbl = jump.select("id", "lbl")
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"duplicate_clusters_converged: no fixpoint in {max_iter} "
            "rounds — component diameter exceeds 2^max_iter edges?")
    return lbl.select(F.col("id").alias("doc_id"),
                      F.col("lbl").alias("cluster_id"))


def dedup_survivors(df: DataFrame, clusters: DataFrame,
                    id_col: str = "doc_id") -> DataFrame:
    """Per-document dedup verdict: cluster id (own id when unpaired)
    and a survivor flag — the minimum id of each cluster survives, the
    rest are drops. `clusters` holds only near-dup members, but on a
    duplicate-heavy corpus (web crawls run 30-50% near-dups) that is
    NOT broadcast range — no hint; AQE broadcasts while small and
    shuffle-joins on the id beyond."""
    c = clusters.select(F.col("doc_id").alias(id_col), "cluster_id")
    keep = (c.groupBy("cluster_id")
            .agg(F.min(id_col).alias("survivor_id")))
    out = (df.join(c, id_col, "left")
           .withColumn("cluster_id",
                       F.coalesce("cluster_id", F.col(id_col))))
    return (out.join(keep, "cluster_id", "left")
            .withColumn("is_survivor",
                        F.coalesce(F.col(id_col) == F.col("survivor_id"),
                                   F.lit(True)))
            .drop("survivor_id"))


def dedup_survivors_by(df: DataFrame, clusters: DataFrame,
                       quality_col: str,
                       id_col: str = "doc_id") -> DataFrame:
    """Quality-aware survivor selection: per duplicate cluster, the
    member with the HIGHEST ``quality_col`` survives (ties break to
    the smallest id) — the production near-dup policy (keep the
    best-quality copy of boilerplate-heavy near-dup families, e.g.
    CCNet/Gopher-style pipelines), vs ``dedup_survivors``'s
    min-id rule.  Same plan shape: the cluster table aggregates to
    one (cluster_id, survivor_id) row via ``max_by`` on the
    (quality, -id) pair — one key-hash exchange of the CLUSTER
    members only; unpaired documents survive by definition."""
    c = (clusters.select(F.col("doc_id").alias(id_col), "cluster_id")
         .join(df.select(id_col, F.col(quality_col).alias("_q")),
               id_col))
    keep = (c.groupBy("cluster_id")
            .agg(F.expr(f"max_by({id_col}, struct(_q, -{id_col}))")
                 .alias("survivor_id")))
    out = (df.join(clusters.select(F.col("doc_id").alias(id_col),
                                   "cluster_id"), id_col, "left")
           .withColumn("cluster_id",
                       F.coalesce("cluster_id", F.col(id_col))))
    return (out.join(keep, "cluster_id", "left")
            .withColumn("is_survivor",
                        F.coalesce(F.col(id_col) == F.col("survivor_id"),
                                   F.lit(True)))
            .drop("survivor_id"))


def incremental_dedup_flags(corpus: DataFrame, delta: DataFrame,
                            id_col: str = "doc_id",
                            text_col: str = "text", n: int = 3,
                            n_hashes: int = 8, bands: int = 4,
                            threshold: float = 0.5) -> DataFrame:
    """Delta-vs-corpus dedup — the continuous-ingest shape: flag each
    NEW document (``delta``) that duplicates the EXISTING corpus,
    without ever pairing corpus docs against each other.

    Two probes per delta doc:
    - exact: content md5 semi-joined against the corpus fingerprint
      set;
    - near: LSH band keys joined against the corpus band index, then
      exact-Jaccard verification of the surviving (delta, corpus)
      candidates only.

    100 TB shape: the corpus fingerprint set and band index are
    derived tables a production pipeline computes ONCE and maintains
    incrementally (append each accepted batch's keys); this operator
    recomputes them from ``corpus`` for self-containment, but the
    joins are structured so only keys shuffle — the corpus text
    column never moves, and corpus shingle sets are fetched only for
    ids that appear in a surviving candidate pair. Per-batch cost is
    O(|delta| signatures + matched keys), independent of corpus size
    once the index exists.

    Persist lifecycle: the corpus/delta shingle frames are persisted
    for the duration of the plan (each feeds the band build AND the
    verify join); a long-running per-batch ingest loop should
    materialize the returned flags, then `spark.catalog.clearCache()`
    or unpersist between batches — or, properly, maintain the band
    index as a stored table so nothing corpus-sized is cached at all.

    Returns one row per delta doc: (id, is_exact_dup, is_near_dup).
    """
    rows = n_hashes // bands
    cfp = corpus.select(F.md5(F.col(text_col)).alias("fp")).distinct()
    dfp = delta.select(F.col(id_col).alias("id"),
                       F.md5(F.col(text_col)).alias("fp"))
    exact = (dfp.join(cfp, "fp", "leftsemi").select("id")
             .withColumn("is_exact_dup", F.lit(True)))
    csh = shingle_sets(corpus, id_col, text_col, n).persist()
    dsh = shingle_sets(delta, id_col, text_col, n).persist()
    cband = (lsh_band_keys(minhash_signatures(csh, n_hashes), bands, rows)
             .select(F.col("id").alias("cid"), "bkey"))
    dband = lsh_band_keys(minhash_signatures(dsh, n_hashes), bands, rows)
    cand = dband.join(cband, "bkey").select("id", "cid").distinct()
    inter = F.size(F.array_intersect("sa", "sb"))
    near = (cand
            .join(dsh.select("id", F.col("s").alias("sa")), "id")
            .join(csh.select(F.col("id").alias("cid"),
                             F.col("s").alias("sb")), "cid")
            .withColumn("j", inter / (F.size("sa") + F.size("sb") - inter))
            .where(F.col("j") >= threshold)
            .select("id").distinct()
            .withColumn("is_near_dup", F.lit(True)))
    return (delta.select(F.col(id_col).alias("id"))
            .join(exact, "id", "left")
            .join(near, "id", "left")
            .select("id",
                    F.coalesce("is_exact_dup", F.lit(False))
                    .alias("is_exact_dup"),
                    F.coalesce("is_near_dup", F.lit(False))
                    .alias("is_near_dup")))


def write_dedup_index(corpus: DataFrame, path: str,
                      id_col: str = "doc_id", text_col: str = "text",
                      n: int = 3, n_hashes: int = 8, bands: int = 4,
                      mode: str = "overwrite") -> None:
    """Materialize the corpus dedup INDEX as parquet tables under
    ``path``: content fingerprints (`fp/`), LSH band keys (`band/`),
    and shingle sets (`sh/`). This is the production form of
    :func:`incremental_dedup_flags`'s corpus side — computed once,
    then APPENDED to as batches are accepted (``mode="append"``), so
    screening a new batch never re-reads corpus text.

    Layout notes for 100 TB: `band/` is written partitioned-by nothing
    but is only ever probed via an equi-join on `bkey` (hash join,
    keys-only); `fp/` via semi-join on `fp`. Both tables are a few
    dozen bytes per doc regardless of document size. `sh/` (the only
    doc-sized payload) is touched just for verify-stage survivors."""
    rows = n_hashes // bands
    sh = shingle_sets(corpus, id_col, text_col, n).persist()
    (corpus.select(F.md5(F.col(text_col)).alias("fp")).distinct()
     .write.mode(mode).parquet(f"{path}/fp"))
    (lsh_band_keys(minhash_signatures(sh, n_hashes), bands, rows)
     .write.mode(mode).parquet(f"{path}/band"))
    sh.write.mode(mode).parquet(f"{path}/sh")
    sh.unpersist()


def incremental_dedup_against_index(spark, index_path: str,
                                    delta: DataFrame,
                                    id_col: str = "doc_id",
                                    text_col: str = "text", n: int = 3,
                                    n_hashes: int = 8, bands: int = 4,
                                    threshold: float = 0.5) -> DataFrame:
    """Screen a delta batch against a STORED :func:`write_dedup_index`
    — the per-batch cost is O(|delta| signatures + matched keys),
    independent of corpus size, and no corpus text is read at all.
    Same verdict schema as :func:`incremental_dedup_flags`."""
    rows = n_hashes // bands
    cfp = spark.read.parquet(f"{index_path}/fp")
    cband = (spark.read.parquet(f"{index_path}/band")
             .select(F.col("id").alias("cid"), "bkey"))
    csh = spark.read.parquet(f"{index_path}/sh")
    dfp = delta.select(F.col(id_col).alias("id"),
                       F.md5(F.col(text_col)).alias("fp"))
    exact = (dfp.join(cfp, "fp", "leftsemi").select("id")
             .withColumn("is_exact_dup", F.lit(True)))
    dsh = shingle_sets(delta, id_col, text_col, n).persist()
    dband = lsh_band_keys(minhash_signatures(dsh, n_hashes), bands, rows)
    cand = dband.join(cband, "bkey").select("id", "cid").distinct()
    inter = F.size(F.array_intersect("sa", "sb"))
    near = (cand
            .join(dsh.select("id", F.col("s").alias("sa")), "id")
            .join(csh.select(F.col("id").alias("cid"),
                             F.col("s").alias("sb")), "cid")
            .withColumn("j", inter / (F.size("sa") + F.size("sb") - inter))
            .where(F.col("j") >= threshold)
            .select("id").distinct()
            .withColumn("is_near_dup", F.lit(True)))
    return (delta.select(F.col(id_col).alias("id"))
            .join(exact, "id", "left")
            .join(near, "id", "left")
            .select("id",
                    F.coalesce("is_exact_dup", F.lit(False))
                    .alias("is_exact_dup"),
                    F.coalesce("is_near_dup", F.lit(False))
                    .alias("is_near_dup")))


def benchmark_contamination(corpus: DataFrame, bench: DataFrame,
                            n: int = 3, min_shared: int = 3,
                            id_col: str = "doc_id",
                            text_col: str = "text",
                            bench_id_col: str = "doc_id",
                            bench_text_col: str = "text",
                            broadcast_bench: bool = True,
                            corpus_shingles: DataFrame | None = None
                            ) -> DataFrame:
    """Training-corpus decontamination: flag documents sharing at
    least ``min_shared`` distinct n-gram hashes with any benchmark
    document — the standard eval-set leakage check a training pipeline
    runs before cutting a dataset (n-gram overlap, the methodology
    published for GPT-3/C4-style decontamination).

    Shape: both sides reduce to (id, shingle-hash) postings; the join
    is posting-vs-posting on the hash, and a distinct-count aggregate
    IS the shared-shingle count — no per-pair set intersection. The
    benchmark side is an EVAL SUITE (thousands of docs, not a corpus),
    so its posting table broadcasts (``broadcast_bench``) and the
    100 TB corpus NEVER SHUFFLES WHOLE: the corpus postings are not
    pre-distinct'd (shingle_expr is already array_distinct per doc, so
    only 2⁻³² intra-doc hash collisions could duplicate a key —
    ``countDistinct`` after the join absorbs those exactly), which
    means the only shuffle carries the join SURVIVORS — rows whose
    hash occurs in the benchmark — a vanishing fraction of a clean
    corpus (measured 4× faster than the distinct-first shape at
    sf0.1). Returns one row per contaminated (doc, bench doc) pair
    with the shared-hash count.

    ``corpus_shingles``: an already-computed :func:`shingle_sets`
    frame (id, s) for the SAME n — when a dedup stage upstream has
    one persisted, passing it here skips re-tokenizing the corpus
    entirely (``corpus`` is ignored for the posting build). Flags for
    docs outside the caller's subset of interest are harmless under
    the anti-join consumption pattern; pre-filter the frame if exact
    scoping matters."""
    if corpus_shingles is not None:
        csh = (corpus_shingles
               .select("id", F.explode("s").alias("x"))
               .select("id", F.expr(_H32.format(s="x")).alias("h")))
    else:
        csh = (_tokens(corpus, id_col, text_col)
               .select("id", F.explode(F.expr(shingle_expr("t", n)))
                       .alias("x"))
               .select("id", F.expr(_H32.format(s="x")).alias("h")))
    bsh = (_tokens(bench, bench_id_col, bench_text_col)
           .select(F.col("id").alias("bid"),
                   F.explode(F.expr(shingle_expr("t", n))).alias("x"))
           .select("bid", F.expr(_H32.format(s="x")).alias("h"))
           .distinct())
    if broadcast_bench:
        bsh = F.broadcast(bsh)
    return (csh.join(bsh, "h")
            .groupBy(F.col("id").alias(id_col),
                     F.col("bid").alias("bench_id"))
            .agg(F.countDistinct("h").alias("n_shared"))
            .where(F.col("n_shared") >= min_shared))


def ngram_jaccard_prefix(df: DataFrame, group_cols: list[str],
                         id_col: str = "doc_id",
                         text_col: str = "text", n: int = 2,
                         threshold: float = 0.2) -> DataFrame:
    """Exact n-gram Jaccard pairs via PREFIX FILTERING — the
    AllPairs / PPJoin candidate-pruning rule (Bayardo et al. WWW'07,
    Xiao et al. WWW'08). Output is IDENTICAL to
    :func:`ngram_jaccard_pairs` (same oracle); the difference is the
    plan: shingles get a canonical per-block order (ascending document
    frequency, ties by hash — rarest first), and a pair with
    J >= t provably shares a shingle inside both docs' PREFIXES of
    length |d| - ceil(t·|d|) + 1 in that order. Only prefix postings
    enter the self-join; the suffix — by construction each doc's
    HIGHEST-df shingles, exactly the ones contributing the big df²
    terms — never joins. Candidates are then verified with an exact
    intersection count over the two candidate docs' full posting
    lists, so no pair is approximated and none is lost.

    MEASURED NEGATIVE RESULT (r6, sf0.1, this corpus): the unpruned
    count plan beats this at EVERY threshold (t=0.8: 1.4 s vs 2.2 s;
    t=0.2: 1.3 s vs 9.4 s). The reason is architectural, and worth
    recording: prefix filtering was designed for index-probe engines
    where every candidate pair pays a full per-pair verification, so
    shrinking the candidate set is the whole game. In a shuffle-join
    engine the "verification" of the count plan is FREE — the
    aggregate over posting-join rows IS the intersection, and no
    candidate pair is ever materialized. Here the pruned plan must
    materialize DISTINCT candidate pairs (2.4 M pairs for an 81-pair
    answer at t=0.2 — boilerplate-heavy corpora share some rare-ish
    shingle between most doc pairs) and then re-join full posting
    lists to verify, which costs more than the Σ df² it saved.
    :func:`ngram_jaccard_pairs` (+ ``max_df`` for the hot-shingle
    valve) is the production plan; this formulation is kept as the
    correctness-pinned reference of the textbook design, equality-
    tested against the count plan at several thresholds. The ceil
    uses a 1e-9 downward nudge so float rounding can only LENGTHEN
    the prefix (more candidates), never shorten it (lost pairs)."""
    tok = spread(df).select(F.col(id_col).alias("id"), *group_cols,
                            F.split(F.col(text_col), r"\s+").alias("t"))
    shx = tok.select("id", *group_cols,
                     F.explode(F.expr(shingle_expr("t", n))).alias("sstr"))
    dis = (shx.select("id", *group_cols,
                      F.expr(_H32.format(s="sstr")).alias("h"))
           .distinct())
    dfreq = dis.groupBy(*group_cols, "h").agg(
        F.count(F.lit(1)).alias("_df"))
    ranked = (dis.join(dfreq, [*group_cols, "h"])
              .withColumn("_rnk", F.row_number().over(
                  Window.partitionBy("id").orderBy("_df", "h")))
              .withColumn("_nsh", F.count(F.lit(1)).over(
                  Window.partitionBy("id")))
              .persist())
    pre = ranked.where(
        F.col("_rnk") <= F.col("_nsh")
        - F.ceil(F.col("_nsh") * F.lit(float(threshold)) - 1e-9) + 1)
    on = (F.col("a.h") == F.col("b.h")) & (F.col("a.id") < F.col("b.id"))
    for g in group_cols:
        on = on & (F.col(f"a.{g}") == F.col(f"b.{g}"))
    # length filter (AllPairs): J >= t forces t·|a| <= |b| <= |a|/t —
    # folded into the join condition so out-of-range pairs never
    # reach the distinct
    t_ = float(threshold)
    on = (on & (F.col("b._nsh") >= F.col("a._nsh") * t_)
          & (F.col("a._nsh") >= F.col("b._nsh") * t_))
    cand = (pre.alias("a").join(pre.alias("b"), on)
            .select(F.col("a.id").alias("id_a"),
                    F.col("b.id").alias("id_b"),
                    F.col("a._nsh").alias("na"),
                    F.col("b._nsh").alias("nb"))
            .distinct())
    full = ranked.select("id", "h")
    inter = (cand
             .join(full.alias("fa"), F.col("fa.id") == F.col("id_a"))
             .join(full.alias("fb"),
                   (F.col("fb.id") == F.col("id_b"))
                   & (F.col("fb.h") == F.col("fa.h")))
             .groupBy("id_a", "id_b", "na", "nb")
             .agg(F.count(F.lit(1)).alias("inter")))
    return (inter.select(
        "id_a", "id_b",
        (F.col("inter")
         / (F.col("na") + F.col("nb") - F.col("inter"))).alias("jaccard"))
        .where(F.col("jaccard") >= threshold))


def substring_dup_spans(df: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text", k: int = 8,
                        min_df: int = 2) -> DataFrame:
    """Substring-level duplication: maximal token spans covered by at
    least one k-token window that also appears in >= ``min_df``
    DISTINCT documents — the span-granular dedup of Lee et al.,
    "Deduplicating Training Data Makes Language Models Better"
    (arXiv:2107.06499), where document-level Jaccard is blind to a
    boilerplate paragraph pasted into otherwise-unique documents.
    (Their suffix-array formulation also counts within-document
    repeats; this operator pins the CROSS-document semantics — a
    window must occur in min_df distinct docs — which is the dedup
    decision that matters for corpus curation.)

    Shape: positioned k-gram hashes (posexplode, md5 under codegen —
    same explode-first rationale as :func:`ngram_jaccard_pairs`), a
    distinct-doc-frequency aggregate per hash, a semi-join flagging
    shared positions, and :func:`runs.coalesce_runs` merging
    overlapping [pos, pos+k-1] windows into maximal spans. Unlike the
    Jaccard posting SELF-join (Σ df² rows), every stage here is
    LINEAR in corpus tokens: the df aggregate map-combines, the
    semi-join shuffles (hash, id, pos) longs once, and the span merge
    shuffles each doc's flagged positions once. No df cap needed — a
    hot k-gram costs df rows, not df².

    Output: (id_col, span_start, span_end, n_grams) with 1-based
    token positions, span_end inclusive; n_grams = shared windows
    merged into the span."""
    tok = _tokens(spread(df), id_col, text_col)
    parts = ", ".join(f"element_at(t, i + {j})" for j in range(k))
    grams = (f"CASE WHEN size(t) >= {k} THEN "
             f"transform(sequence(1, size(t) - {k - 1}), "
             f"i -> concat_ws(' ', {parts})) ELSE array() END")
    # persisted: the positioned postings feed both the df aggregate
    # and the semi-join probe side (same rationale as the
    # ngram_jaccard_pairs posting persist)
    pos_h = (tok.select("id", F.posexplode(F.expr(grams))
                        .alias("p0", "g"))
             .select("id", (F.col("p0") + 1).cast("long").alias("pos"),
                     F.expr(_H32.format(s="g")).alias("h"))
             .persist())
    shared = (pos_h.groupBy("h")
              .agg(F.countDistinct("id").alias("_df"))
              .where(F.col("_df") >= min_df)
              .select("h"))
    dup = pos_h.join(shared, "h", "left_semi")
    from pointdatabase_spark.operators.runs import coalesce_runs
    spans = coalesce_runs(
        dup.select("id", F.col("pos").alias("run_start"),
                   (F.col("pos") + (k - 1)).alias("run_end")),
        ["id"])
    return spans.select(F.col("id").alias(id_col),
                        F.col("run_start").alias("span_start"),
                        F.col("run_end").alias("span_end"),
                        F.col("n_merged").alias("n_grams"))


def drop_hot_shingles(dis: DataFrame, group_cols: list[str],
                      max_df: int) -> DataFrame:
    """Remove shingle hashes whose within-block document frequency
    exceeds ``max_df`` from a distinct posting table (id, group, h).

    The posting self-join in :func:`ngram_jaccard_pairs` costs
    Σ_s df(s)² — one stop-word-like shingle ("click here to
    subscribe") with df = k contributes k² join rows on its own, the
    same quadratic blow-up a hot LSH bucket causes in minhash (see
    :func:`drop_mega_buckets`, the precedent this mirrors). Capping
    df bounds every posting's contribution at max_df².

    Semantics: the hot shingle is removed from the *vocabulary* —
    both intersection AND set size — so the result is exact Jaccard
    over the df-capped shingle vocabulary (classic stop-word
    removal), not a biased estimate of the uncapped value. Hot
    shingles are near-universal boilerplate, which carries no
    discriminating signal for near-dup detection anyway.

    The df aggregate map-combines; the hot-key set has at most
    |postings|/max_df rows, so the exclusion is a broadcast
    anti-join — the posting table itself never reshuffles."""
    hot = (dis.groupBy(*group_cols, "h")
           .agg(F.count(F.lit(1)).alias("_df"))
           .where(F.col("_df") > max_df)
           .select(*group_cols, "h"))
    return dis.join(F.broadcast(hot), [*group_cols, "h"], "left_anti")


def ngram_jaccard_pairs(df: DataFrame, group_cols: list[str],
                        id_col: str = "doc_id", text_col: str = "text",
                        n: int = 2, threshold: float = 0.2,
                        max_df: int | None = None) -> DataFrame:
    """Exact n-gram Jaccard pairs within blocking groups (e.g. same
    language), in the inverted-index shape: shingles are md5-hashed to
    32-bit ints and exploded to (group, hash, id) postings; the
    posting self-join materializes a row per *shared shingle* and a
    count aggregate IS the intersection size — no per-pair set
    intersection ever runs, and pairs sharing zero shingles (jaccard
    0) never materialize at all.

    Scale shape: join volume is Σ_s df(s)² within each block —
    governed by shingle document-frequency, not the unconditional
    |block|² of an all-pairs join (measured 4× faster at sf0.1, and
    the gap widens as blocks grow). Everything shuffles as longs.

    Postings are built explode-first: one interpreted n-gram
    `transform` feeds `explode`, and the per-shingle md5 runs
    codegen'd over the exploded rows with a shuffle `distinct` doing
    per-doc set semantics (measured 15× faster than hashing inside a
    nested array lambda, where Spark's CodegenFallback re-evaluates
    the whole interpreted chain per consumer). Per-doc set sizes are
    attached to the AGGREGATED pair table afterwards — not carried
    through the posting join — so the join rows stay three longs wide
    and no window shuffle precedes the join (13% faster at sf0.1).
    The count table is |docs| rows: small enough that AQE broadcasts
    it at moderate scale, correctly shuffle-joined beyond (no explicit
    broadcast hint — forcing a corpus-sized build side would OOM the
    join at 100 TB). Hashing note: Jaccard is computed over distinct 32-bit
    shingle hashes (the oracle mirrors the same md5 recipe); a 2⁻³²
    collision can merge two shingles, the standard trade for hashed
    set similarity. Exact all-pairs Jaccard at low thresholds is
    intrinsically heavy at corpus scale — this operator pins exact
    semantics; minhash_neardup is the scale path. ``max_df`` caps the
    per-shingle document frequency (see :func:`drop_hot_shingles`):
    Jaccard is then exact over the df-capped vocabulary and the join
    volume is bounded by Σ min(df, max_df)²."""
    tok = spread(df).select(F.col(id_col).alias("id"), *group_cols,
                            F.split(F.col(text_col), r"\s+").alias("t"))
    shx = tok.select("id", *group_cols,
                     F.explode(F.expr(shingle_expr("t", n))).alias("sstr"))
    dis = (shx.select("id", *group_cols,
                      F.expr(_H32.format(s="sstr")).alias("h"))
           .distinct())
    if max_df is not None:
        dis = drop_hot_shingles(dis, group_cols, max_df)
    # The posting table feeds FOUR consumers (both self-join sides and
    # both per-doc set-size lookups); without a persist the whole
    # tokenize→explode→md5→distinct pipeline runs four times (audited:
    # 4 parquet scans, 11 exchanges at sf0.1). Persisting collapses
    # that to one pipeline + cached scans — the same lifecycle
    # precedent as minhash_neardup/simhash_neardup's persisted shingle
    # scans; MEMORY_AND_DISK semantics spill rather than OOM when the
    # posting table outgrows executor memory at scale.
    dis = dis.persist()
    nsh = dis.groupBy("id").agg(F.count(F.lit(1)).alias("nsh"))
    on = (F.col("a.h") == F.col("b.h")) & (F.col("a.id") < F.col("b.id"))
    for g in group_cols:
        on = on & (F.col(f"a.{g}") == F.col(f"b.{g}"))
    pairs = (dis.alias("a").join(dis.alias("b"), on)
             .groupBy(F.col("a.id").alias("id_a"),
                      F.col("b.id").alias("id_b"))
             .agg(F.count(F.lit(1)).alias("inter")))
    na = nsh.select(F.col("id").alias("id_a"), F.col("nsh").alias("na"))
    nb = nsh.select(F.col("id").alias("id_b"), F.col("nsh").alias("nb"))
    return (pairs
            .join(na, "id_a")
            .join(nb, "id_b")
            .select("id_a", "id_b",
                    (F.col("inter")
                     / (F.col("na") + F.col("nb") - F.col("inter"))
                     ).alias("jaccard"))
            .where(F.col("jaccard") >= threshold))


def containment_pairs(df: DataFrame, group_cols: list[str],
                      id_col: str = "doc_id", text_col: str = "text",
                      n: int = 2, threshold: float = 0.8,
                      max_df: int | None = None) -> DataFrame:
    """Exact n-gram set CONTAINMENT pairs — Broder's asymmetric
    companion to resemblance (Broder, "On the resemblance and
    containment of documents", SEQUENCES'97): ``c(A→B) = |A∩B|/|A|``.
    Jaccard misses the quote/boilerplate-subset case by construction —
    a 100-shingle doc fully embedded in a 10 000-shingle doc has
    J ≈ 0.01 but containment 1.0 — and that case (one doc quoting
    another, a page wrapping a syndicated article) is exactly what a
    corpus dedup pass wants to find. Returns one row per unordered
    pair with EITHER direction's containment ≥ ``threshold``::

        (id_a, id_b, cont_ab double, cont_ba double)

    where ``cont_ab`` is the share of ``id_a``'s distinct shingles
    also in ``id_b`` (and vice versa). Both ratios are single IEEE
    divisions of exact BIGINTs — bit-deterministic across engines.

    Plan shape is :func:`ngram_jaccard_pairs`' inverted index verbatim
    (one posting self-join, intersection = shared-hash count; join
    volume Σ df(s)² within each block, ``max_df`` the hot-shingle
    valve) — only the final ratio differs. The asymmetric denominator
    adds NO cost: both set sizes are already joined onto the
    aggregated pair table. Threshold semantics: a pair qualifies on
    ``greatest(cont_ab, cont_ba)`` — containment of the SMALLER set in
    the larger (the overlap coefficient), since min-side containment
    is what subset duplication means.

    ``max_df`` semantics (same contract as ngram_jaccard_pairs, made
    explicit): with a cap set, BOTH the intersection AND the
    denominators ``na``/``nb`` are computed over the df-capped
    vocabulary — containment is exact over the corpus with hot
    shingles removed, not an approximation of raw containment. That
    is deliberate: a boilerplate-heavy doc whose content-bearing
    (rare) shingles all appear in another doc SHOULD report high
    containment — boilerplate carries no dedup signal either way.
    Callers needing raw-vocabulary denominators can compute ``nsh``
    before the cap themselves; the ratio is then a lower bound."""
    tok = spread(df).select(F.col(id_col).alias("id"), *group_cols,
                            F.split(F.col(text_col), r"\s+").alias("t"))
    shx = tok.select("id", *group_cols,
                     F.explode(F.expr(shingle_expr("t", n))).alias("sstr"))
    dis = (shx.select("id", *group_cols,
                      F.expr(_H32.format(s="sstr")).alias("h"))
           .distinct())
    if max_df is not None:
        dis = drop_hot_shingles(dis, group_cols, max_df)
    # Same four-consumer lifecycle as ngram_jaccard_pairs: persist so
    # the tokenize→explode→md5→distinct pipeline runs once.
    dis = dis.persist()
    nsh = dis.groupBy("id").agg(F.count(F.lit(1)).alias("nsh"))
    on = (F.col("a.h") == F.col("b.h")) & (F.col("a.id") < F.col("b.id"))
    for g in group_cols:
        on = on & (F.col(f"a.{g}") == F.col(f"b.{g}"))
    pairs = (dis.alias("a").join(dis.alias("b"), on)
             .groupBy(F.col("a.id").alias("id_a"),
                      F.col("b.id").alias("id_b"))
             .agg(F.count(F.lit(1)).alias("inter")))
    na = nsh.select(F.col("id").alias("id_a"), F.col("nsh").alias("na"))
    nb = nsh.select(F.col("id").alias("id_b"), F.col("nsh").alias("nb"))
    return (pairs
            .join(na, "id_a")
            .join(nb, "id_b")
            .select("id_a", "id_b",
                    (F.col("inter") / F.col("na")).alias("cont_ab"),
                    (F.col("inter") / F.col("nb")).alias("cont_ba"))
            .where(F.greatest(F.col("cont_ab"), F.col("cont_ba"))
                   >= threshold))


def lsh_recall_eval(df: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text",
                    threshold: float = 0.5,
                    sample_mod: int | None = None,
                    base_id_expr: str | None = None) -> DataFrame:
    """Measure-don't-guess audit of the MinHash-LSH dedup path: exact
    ground-truth near-dup pairs (shared-shingle candidate generation
    — Jaccard > 0 requires a shared shingle, so the posting join is
    complete — then exact verification) compared against the LSH
    pipeline's output. Returns ONE row::

        (n_truth, n_found, n_tp, lsh_precision, lsh_recall)

    Precision is 1.0 by construction (the pipeline exactly verifies
    its candidates — the audit documents that); recall is the real
    quality number, the probability a true pair shares at least one
    LSH band. At corpus scale the ground-truth side is Σdf²-bounded
    like the exact Jaccard operator, so the operator OWNS the
    sampling knob instead of leaving the bound to caller discipline:
    pass ``sample_mod=k`` to audit a deterministic 1-in-k sample
    keyed by ``base_id_expr`` (a SQL expression over the input
    columns; defaults to ``id_col``). Sampling by BASE id keeps
    near-dup pairs whole — a pair straddling the sample boundary
    would deflate both truth and found symmetrically only if ids
    were independent, which planted-dup corpora violate — so keying
    on the shared base id is what makes the recall estimate
    unbiased. The LSH side under audit is unchanged (it runs ON the
    sample, exactly as production would on the full corpus)."""
    if sample_mod is not None:
        key = base_id_expr if base_id_expr is not None else id_col
        df = df.where(F.expr(f"pmod({key}, {int(sample_mod)}) = 0"))
    sh = shingle_sets(df, id_col, text_col).persist()
    # Shared pair-Jaccard kernel (r12, guide §2.3/§8): intersection
    # sizes fall out of the posting self-join AGGREGATION (one row
    # per shared-shingle pair with its |A∩B|), so neither the truth
    # side nor the LSH verification shuffles the shingle ARRAYS —
    # previously the truth side ran distinct over the Σdf² posting
    # pairs and then jaccard_verify joined the array table twice per
    # side (4 array-payload shuffles total). Same Σdf² bound, far
    # fewer bytes (guide §8: decide with small rows). Persisted for
    # its two consumers (truth filter + LSH verification join);
    # released with the shingles below.
    post = sh.select("id", F.explode("s").alias("x"))
    a = post.select(F.col("id").alias("id_a"), F.col("x").alias("xa"))
    b = post.select(F.col("id").alias("id_b"), F.col("x").alias("xb"))
    inter = (a.join(b, (F.col("xa") == F.col("xb"))
                    & (F.col("id_a") < F.col("id_b")))
             .groupBy("id_a", "id_b")
             .agg(F.count(F.lit(1)).alias("_i")))
    nsh = sh.select("id", F.size("s").alias("_n"))
    jac = (inter
           .join(nsh.select(F.col("id").alias("id_a"),
                            F.col("_n").alias("_na")), "id_a")
           .join(nsh.select(F.col("id").alias("id_b"),
                            F.col("_n").alias("_nb")), "id_b")
           .select("id_a", "id_b",
                   (F.col("_i")
                    / (F.col("_na") + F.col("_nb") - F.col("_i")))
                   .alias("jaccard"))
           .persist())
    found = minhash_neardup(df, id_col=id_col, text_col=text_col,
                            threshold=threshold, shingles=sh,
                            verify_jaccard=jac)
    truth = (jac.where(F.col("jaccard") >= threshold)
             .select("id_a", "id_b"))
    # One full-outer pass instead of three independent counts — the
    # three-aggregate form re-derived the whole minhash AND truth
    # pipelines once per count (measured 2x the wall time).
    f2 = found.select("id_a", "id_b", F.lit(1).alias("_f"))
    t2 = truth.select("id_a", "id_b", F.lit(1).alias("_t"))
    m = f2.join(t2, ["id_a", "id_b"], "full_outer")
    j = m.agg(
        F.coalesce(F.sum("_t"), F.lit(0)).cast("long").alias("n_truth"),
        F.coalesce(F.sum("_f"), F.lit(0)).cast("long").alias("n_found"),
        F.coalesce(F.sum(F.when(F.col("_f").isNotNull()
                                & F.col("_t").isNotNull(), 1)),
                   F.lit(0)).cast("long").alias("n_tp"))
    out = j.select(
        "n_truth", "n_found", "n_tp",
        F.when(F.col("n_found") == 0, F.lit(1.0))
        .otherwise(F.col("n_tp").cast("double") / F.col("n_found"))
        .alias("lsh_precision"),
        F.when(F.col("n_truth") == 0, F.lit(1.0))
        .otherwise(F.col("n_tp").cast("double") / F.col("n_truth"))
        .alias("lsh_recall"))
    # The audit is a one-row diagnostic, so compute it EAGERLY and
    # release the persisted shingle table before returning — a lazy
    # return would leak the cache for the application lifetime (the
    # hazard clustering.kmeans_fit explicitly avoids). The caller
    # still gets a DataFrame (rebuilt from the materialized row with
    # the exact result schema), so the operator contract and every
    # downstream comparison are unchanged.
    try:
        row = out.first()
    finally:
        sh.unpersist()
        jac.unpersist()
    return out.sparkSession.createDataFrame([row], schema=out.schema)
