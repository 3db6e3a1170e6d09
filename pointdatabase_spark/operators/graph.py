"""Iterative graph analytics over DataFrames — fixed-iteration
PageRank (Brin & Page 1998), the entity-importance signal a corpus
pipeline uses for domain/host weighting (e.g. CommonCrawl host-graph
ranks gate crawl priority and corpus mixture weights).

Scale design (100 TB edge lists):

- Each iteration is the canonical two-shuffle Pregel step: ranks
  join edges on ``src`` (co-partitioned if the edge list is
  pre-bucketed by src — the bucketing the tile store already
  demonstrates), then contributions ``groupBy(dst)`` with map-side
  partial sums. State per node is ONE long — no per-edge state ever
  materializes beyond the shuffle in flight.
- Hot destinations (a host every page links to) are algebraic sums,
  so AQE skew-split handles them; the damping base term never
  shuffles at all (it is a literal).
- The node count N is one ``count()`` job up front (same bounded
  contract as the BPE vocabulary count).

Cross-engine determinism: ranks live in exact integer PPB-of-total
units (scale 1e12). Per-edge contribution is
``floor(rank * d / outdeg)`` — one IEEE multiply, one divide, one
floor on inputs < 2^53, bit-deterministic on any engine — and the
per-node update sums BIGINTs (associative, order-free). No float
ever accumulates across rows, so the oracle's unrolled-CTE ranks
match bit-for-bit at every iteration.

Rank mass: the DEFAULT is the plain damped update without
dangling-mass redistribution (sinks leak rank) — standard for
relative ranking, and the oracle-parity contract for
``pagerank_trading_graph``. ``dangling="redistribute"`` adds the
textbook correction: each round, one extra scalar aggregate sums the
rank mass sitting on out-degree-0 nodes (exact BIGINT units) and
every node receives ``floor(dangling_mass·d / N)`` — total mass is
then conserved up to the per-node floor truncation (< N units).

No reference counterpart (extension surface).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: rank scale — parts-per-1e12 of total rank mass.
SCALE = 1_000_000_000_000.0


def pagerank(edges: DataFrame, iters: int = 2, damping: float = 0.85,
             src: str = "src", dst: str = "dst",
             dangling: str = "leak") -> DataFrame:
    """Fixed-iteration damped PageRank over a directed edge list.
    Returns ``(node long, rank_q long)`` for every node appearing as
    an endpoint; ``rank_q`` is the rank in exact 1e-12-of-total
    units after ``iters`` rounds from the uniform start.

    ``dangling``: ``"leak"`` (default — sinks leak their damped
    mass; the oracle-parity variant) or ``"redistribute"`` (each
    round adds ONE scalar aggregate over the dangling nodes and
    spreads their damped mass uniformly — total mass conserved up to
    floor truncation; see module doc)."""
    if dangling not in ("leak", "redistribute"):
        raise ValueError(f"unknown dangling policy {dangling!r}")
    # Materialize the loop-invariant frames ONCE (eager
    # localCheckpoint, the same lineage-truncation idiom as the
    # connected-components loop in operators/dedup.py): without it
    # every iteration's plan re-derives the edge list from its
    # source joins — a per-round re-read of the 100 TB base that the
    # checkpoint turns into a one-time cost. The raw edge projection
    # is checkpointed FIRST (r12, the label_propagation shape): the
    # caller's edge derivation — typically a join+distinct over base
    # tables — runs ONCE, and nodes/deg/e all derive from the
    # checkpointed blocks (previously nodes and e each re-derived the
    # base, two full passes).
    e0 = edges.select(F.col(src), F.col(dst)).localCheckpoint()
    nodes = (e0.select(F.col(src).alias("node"))
             .union(e0.select(F.col(dst).alias("node")))
             .distinct().localCheckpoint())
    n = nodes.count()  # one scalar to the driver (bounded contract)
    r0 = int(math.floor(SCALE / n))
    base = int(math.floor((1.0 - damping) * SCALE / n))

    deg = e0.groupBy(src).agg(F.count(F.lit(1)).alias("deg"))
    e = e0.join(deg, src).localCheckpoint()

    if dangling == "redistribute":
        # out-degree-0 nodes, materialized once (loop-invariant).
        sinks = (nodes.join(deg.select(F.col(src).alias("node")),
                            "node", "left_anti").localCheckpoint())

    ranks = nodes.withColumn("rank_q", F.lit(r0).cast("long"))
    for it in range(iters):
        share = 0
        if dangling == "redistribute":
            # ONE scalar aggregate per round: the exact-integer rank
            # mass parked on sinks, spread uniformly after damping.
            # floor(dm·d / N): dm < 1e12 < 2^53, so the multiply and
            # divide are single IEEE ops — bit-deterministic.
            dm = (ranks.join(sinks, "node", "left_semi")
                  .agg(F.coalesce(F.sum("rank_q"), F.lit(0)))
                  .collect()[0][0])
            share = int(math.floor(float(dm) * damping / n))
        contrib = (e.join(ranks, e[src] == ranks["node"])
                   .select(F.col(dst).alias("node"),
                           F.floor(F.col("rank_q").cast("double")
                                   * F.lit(damping) / F.col("deg"))
                           .cast("long").alias("c")))
        infl = contrib.groupBy("node").agg(F.sum("c").alias("infl"))
        ranks = (nodes.join(infl, "node", "left")
                 .select("node",
                         (F.lit(base + share).cast("long")
                          + F.coalesce("infl", F.lit(0)))
                         .alias("rank_q")))
        if it < iters - 1:  # keep each round's plan one step deep
            ranks = ranks.localCheckpoint()
    return ranks


def label_propagation(edges: DataFrame, iters: int = 2,
                      src: str = "src", dst: str = "dst",
                      symmetrize: bool = True) -> DataFrame:
    """Synchronous label propagation (Raghavan et al. 2007) with a
    DETERMINISTIC tie rule: every node starts labeled with its own
    id; each round it adopts the label most frequent among its
    neighbors (with ``symmetrize=False``, its IN-neighbors — labels
    flow along edge direction; a node with no in-edges keeps its
    label), ties to the SMALLEST label. Returns ``(node long,
    label long)`` after ``iters`` rounds — the cheap community
    signal a corpus pipeline uses to group hosts/entities before
    mixture weighting (PageRank's sibling; same Pregel cost model).

    Scale: each round is one src-keyed join (labels are 1 long per
    node) + two partial-agg shuffles — (node, label) counts, then a
    per-node ``max_by``; nothing ever carries more than
    ids/labels/counts. Loop invariants (edge list, node list) are
    localCheckpointed once; per-round plans stay one step deep.

    The classic algorithm breaks ties RANDOMLY; the smallest-label
    rule makes every round a pure function of the graph — the same
    determinism-over-randomness trade as kmeans_fit's seeding, and
    what makes an unrolled-CTE oracle possible."""
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    if symmetrize:
        e = e.union(edges.select(F.col(dst).alias("a"),
                                 F.col(src).alias("b")))
    e = e.distinct().localCheckpoint()
    # Nodes come from BOTH endpoints: in directed mode
    # (symmetrize=False) a sink appears only as 'b', and a node with
    # no in-neighbors must KEEP its current label — dropping either
    # silently loses nodes and cascades to an empty result on chains.
    nodes = (e.select(F.col("a").alias("node"))
             .union(e.select(F.col("b").alias("node")))
             .distinct().localCheckpoint())
    labels = nodes.withColumn("lbl", F.col("node"))
    for it in range(iters):
        # Labels flow ALONG edge direction: node b adopts the mode
        # of its IN-neighbors' labels (PageRank's influence
        # orientation). Under symmetrize=True the edge set is
        # symmetric, so orientation is immaterial there.
        cnt = (e.join(labels, F.col("a") == F.col("node"))
               .groupBy("b", "lbl").agg(F.count(F.lit(1)).alias("c")))
        upd = (cnt.groupBy("b")
               .agg(F.max_by(
                   "lbl",
                   F.struct(F.col("c").alias("c"),
                            (-F.col("lbl")).alias("nl"))).alias("_new"))
               .select(F.col("b").alias("node"), "_new"))
        labels = (labels.join(upd, "node", "left")
                  .select("node",
                          F.coalesce("_new", "lbl").alias("lbl")))
        if it < iters - 1:
            labels = labels.localCheckpoint()
    return labels.select("node", F.col("lbl").alias("label"))


def cooccurrence_edges(df: DataFrame, group_col: str, item_col: str,
                       min_support: int = 2,
                       max_group_size: int | None = None) -> DataFrame:
    """Co-occurrence graph construction — the market-basket /
    co-citation primitive: items are adjacent when they appear in
    ``min_support`` or more shared groups (orders, sessions, docs).
    Returns canonical undirected edges ``(src, dst)`` with
    ``src < dst``.

    Plan shape: ONE groupBy(group) collects each group's distinct
    item set as a sorted array, pairs expand INSIDE the row via
    nested ``transform`` (no self-join — the quadratic term is
    bounded by C(|group|,2), the same in-group bound as the shingle
    posting join), then one (u,v)-keyed count applies the support
    threshold with map-side partial aggregation. Two shuffles total;
    the posting self-join formulation costs three (distinct + join
    re-shuffle + pair count) and was measured ~1.6× slower on the
    sf0.1 co-purchase build. ``max_group_size`` is the hot-group
    valve: a 10⁴-item group contributes 5·10⁷ pairs that swamp any
    census downstream — cap and drop (the standard basket-analysis
    mitigation; dropped groups are mega-baskets that carry no
    pairwise signal anyway).

    No reference counterpart (extension surface)."""
    sets = (df.groupBy(F.col(group_col).alias("_g"))
            .agg(F.sort_array(F.collect_set(F.col(item_col)))
                 .alias("_it")))
    if max_group_size is not None:
        sets = sets.where(F.size("_it") <= int(max_group_size))
    pairs = sets.select(F.explode(F.expr(
        "flatten(transform(_it, (x, i) -> "
        "transform(slice(_it, i + 2, size(_it)), "
        "y -> struct(x AS u, y AS v))))")).alias("_p"))
    return (pairs.select("_p.u", "_p.v")
            .groupBy("u", "v").agg(F.count(F.lit(1)).alias("_c"))
            .where(F.col("_c") >= int(min_support))
            .select(F.col("u").alias("src"), F.col("v").alias("dst")))


def triangle_census(edges: DataFrame, src: str = "src",
                    dst: str = "dst",
                    max_degree: int | None = None) -> DataFrame:
    """Per-node triangle counts + local clustering coefficients on an
    undirected simple graph (input edges are canonicalized: both
    orientations collapse, self-loops drop). Returns one row per node
    with ≥1 surviving edge::

        (node long, deg long, tri long, ccoef_ppm long)

    where ``tri`` is the number of triangles through the node and
    ``ccoef_ppm = (2e6·tri) div (deg·(deg−1)))`` — Watts–Strogatz
    local clustering in exact parts-per-million (BIGINT ``div``; no
    float ever touches the ratio, so the DuckDB ``//`` oracle matches
    bit-for-bit). Global transitivity derives from this output alone:
    ``3·Σtri/3`` triangles against ``Σ C(deg,2)`` wedges — one extra
    aggregate, no second pass over edges.

    Algorithm: the degree-ordered orientation (Chiba–Nishizeki /
    Cohen's MapReduce form, Suri & Vassilvitskii WWW'11): each edge
    orients from its (deg, id)-smaller endpoint to the larger, so
    every out-neighborhood has O(√m) arcs and each triangle is
    enumerated EXACTLY once as wedge (a→b, a→c), (deg,id)_b <
    (deg,id)_c, closed by arc b→c. Scale: the wedge join costs
    Σ C(outdeg,2) ≤ O(m^1.5) — the optimal bound for exact triangle
    enumeration — and carries only (id, id, deg) triples; per-node
    counting is a map-side-combined groupBy. ``max_degree`` is the
    standard hot-hub valve (drop nodes hotter than the cap BEFORE
    orientation — same Σdeg² story as butterfly_count's).

    No reference counterpart (extension surface)."""
    und = (edges.select(F.least(F.col(src), F.col(dst)).alias("u"),
                        F.greatest(F.col(src), F.col(dst)).alias("v"))
           .where(F.col("u") != F.col("v"))
           .distinct())
    ends = lambda e: e.select(F.col("u").alias("n")).unionAll(
        e.select(F.col("v").alias("n")))
    if max_degree is not None:
        d0 = ends(und).groupBy("n").agg(F.count(F.lit(1)).alias("d"))
        hot = d0.where(F.col("d") > int(max_degree)).select("n")
        und = (und.join(hot, und["u"] == hot["n"], "left_anti")
               .join(hot, und["v"] == hot["n"], "left_anti"))
    # und feeds four consumers (degrees, orientation, the closing-arc
    # probe, the final node list); materialize it once — for a derived
    # edge list (e.g. a support-filtered co-occurrence graph) the
    # upstream pair-counting join is the expensive part and must not
    # replay per consumer.
    und = und.localCheckpoint()
    deg = ends(und).groupBy("n").agg(F.count(F.lit(1)).alias("d"))
    w = (und.join(deg.select(F.col("n").alias("u"),
                             F.col("d").alias("du")), "u")
         .join(deg.select(F.col("n").alias("v"),
                          F.col("d").alias("dv")), "v"))
    u_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v")))
    arcs = (w.select(
        F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("a"),
        F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("b"),
        F.when(u_first, F.col("dv")).otherwise(F.col("du")).alias("hd"))
        .localCheckpoint())
    t1 = arcs.select(F.col("a"), F.col("b"), F.col("hd").alias("hb"))
    t2 = arcs.select(F.col("a"), F.col("b").alias("c"),
                     F.col("hd").alias("hc"))
    wedges = t1.join(t2, (t1["a"] == t2["a"])
                     & ((F.col("hb") < F.col("hc"))
                        | ((F.col("hb") == F.col("hc"))
                           & (F.col("b") < F.col("c"))))).select(
        t1["a"].alias("ta"), "b", "c")
    closer = arcs.select(F.col("a").alias("b"), F.col("b").alias("c"))
    tris = wedges.join(closer, ["b", "c"], "left_semi")
    pern = (tris.select(F.col("ta").alias("n"))
            .unionAll(tris.select(F.col("b").alias("n")))
            .unionAll(tris.select(F.col("c").alias("n")))
            .groupBy("n").agg(F.count(F.lit(1)).alias("t")))
    return (deg.join(pern, "n", "left")
            .select(F.col("n").cast("long").alias("node"),
                    F.col("d").cast("long").alias("deg"),
                    F.coalesce("t", F.lit(0)).cast("long").alias("tri"),
                    F.when(F.col("d") >= 2,
                           F.expr("(2000000 * coalesce(t, 0)) "
                                  "div (d * (d - 1))"))
                    .otherwise(F.lit(0)).cast("long")
                    .alias("ccoef_ppm")))


def kcore(edges: DataFrame, k: int, rounds: int = 2,
          src: str = "src", dst: str = "dst") -> DataFrame:
    """Fixed-round k-core peeling on an undirected simple graph
    (Seidman 1983; the Batagelj–Zaveršnik peel expressed as
    synchronous rounds): each round drops every node whose CURRENT
    degree is below ``k`` (and the edges touching it), simultaneously.
    Returns ``(node long, deg long)`` — the surviving subgraph's nodes
    with their degrees after ``rounds`` rounds; run until fixpoint it
    is exactly the k-core. The corpus-pipeline use is spam/boilerplate
    host pruning: the k-core of a host link graph is the densely
    cross-linked nucleus, the complement of the long drop-off tail.

    Fixed rounds (not fixpoint) keep the cost model explicit — each
    round is ONE endpoint-count aggregate + two semi-joins carrying
    bare ids — and make the result a pure unrollable function of the
    graph (the same determinism trade as label_propagation), so a CTE
    oracle can replay it round for round. Synchronous semantics: a
    node is judged on the round-START degree, so mutually-dependent
    marginal nodes drop together (the standard parallel peel).

    No reference counterpart (extension surface)."""
    if k < 1 or rounds < 1:
        raise ValueError(f"need k >= 1 and rounds >= 1, got {k=} {rounds=}")
    und = (edges.select(F.least(F.col(src), F.col(dst)).alias("u"),
                        F.greatest(F.col(src), F.col(dst)).alias("v"))
           .where(F.col("u") != F.col("v"))
           .distinct().localCheckpoint())
    for r in range(rounds):
        deg = (und.select(F.col("u").alias("n"))
               .unionAll(und.select(F.col("v").alias("n")))
               .groupBy("n").agg(F.count(F.lit(1)).alias("d")))
        keep = deg.where(F.col("d") >= int(k)).select("n")
        und = (und.join(keep, und["u"] == keep["n"], "left_semi")
               .join(keep, und["v"] == keep["n"], "left_semi"))
        if r < rounds - 1:  # keep each round's plan one step deep
            und = und.localCheckpoint()
    return (und.select(F.col("u").alias("n"))
            .unionAll(und.select(F.col("v").alias("n")))
            .groupBy("n").agg(F.count(F.lit(1)).alias("d"))
            .select(F.col("n").cast("long").alias("node"),
                    F.col("d").cast("long").alias("deg")))


def butterfly_count(edges: DataFrame, left: str = "src",
                    right: str = "dst",
                    max_degree: int | None = None) -> DataFrame:
    """Bipartite butterfly (4-cycle) census — the bipartite analog of
    triangle counting (Wang et al., "Butterfly Counting in Bipartite
    Networks", 2014): a butterfly is two left nodes sharing two
    right nodes; their density is the bipartite clustering signal
    fraud/recsys pipelines monitor. Returns ONE row::

        (n_edges, n_wedges, n_butterflies)

    where ``n_wedges`` counts left-node pairs THROUGH a shared right
    node (with multiplicity) and ``n_butterflies = Σ_pairs C(m, 2)``
    over each pair's common-neighbor count ``m``.

    Scale: the wedge join on the right key costs Σ_r deg(r)² — the
    same Σdf² shape as the n-gram Jaccard posting join, with the
    same valve: ``max_degree`` drops right nodes hotter than the cap
    BEFORE the self-join (a super-hot hub contributes C(deg,2)
    wedges that swamp the census anyway; the standard
    vertex-priority/cap mitigation). After the join everything is
    (left-pair)-keyed counting — exact BIGINT arithmetic
    end-to-end.

    Cache note: the capped edge table persist is released by no explicit
    unpersist (the return stays lazy — an eager release would
    force a premature action; ngram_jaccard_pairs precedent);
    sessions issuing MANY calls should release between batches
    via ``spark.catalog.clearCache()``."""
    e = (edges.select(F.col(left).alias("l"), F.col(right).alias("r"))
         .distinct())
    if max_degree is not None:
        deg = e.groupBy("r").agg(F.count(F.lit(1)).alias("_d"))
        e = (e.join(deg.where(F.col("_d") <= int(max_degree)), "r")
             .select("l", "r"))
    # THREE consumers read the capped edge table (both wedge-join
    # sides + the n_edges census); without a persist the whole
    # distinct -> degree -> cap pipeline re-executes per consumer —
    # MEASURED 8.4 s -> 3.2 s at sf0.1 from this line alone. What's
    # cached is (l, r) id pairs only, never payloads; MEMORY_AND_DISK
    # spills rather than OOMs (the ngram_jaccard_pairs lazy
    # multi-consumer precedent).
    e = e.persist()
    a = e.select(F.col("l").alias("l1"), F.col("r").alias("r1"))
    b = e.select(F.col("l").alias("l2"), F.col("r").alias("r2"))
    wedges = (a.join(b, (F.col("r1") == F.col("r2"))
                     & (F.col("l1") < F.col("l2")))
              .groupBy("l1", "l2")
              .agg(F.count(F.lit(1)).alias("m")))
    return (wedges.agg(
        F.coalesce(F.sum("m"), F.lit(0)).cast("long").alias("n_wedges"),
        # BIGINT div, not float /: C(m,2) summed as exact longs keeps
        # the census bit-exact past 2^53 total butterflies (the
        # rounding-doctrine conformance; values identical below it).
        F.coalesce(F.sum(F.expr("(m * (m - 1)) div 2")),
                   F.lit(0)).cast("long").alias("n_butterflies"))
        .crossJoin(e.agg(F.count(F.lit(1)).cast("long")
                         .alias("n_edges")))
        .select("n_edges", "n_wedges", "n_butterflies"))
