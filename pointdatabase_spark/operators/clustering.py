"""Distributed Lloyd's k-means over embedding columns — the trainer
that produces the coarse centroids the IVF / SemDeDup operators
consume (operators/similarity.py uses fixed md5-derived centroids for
oracle determinism; this module LEARNS them from the data with the
classic MLlib-shaped plan).

Scale design (100 TB / billions of vectors):

- **Assignment** is map-side only: the k×d centroid table is a
  broadcast literal (k ≤ a few thousand, d ≤ a few thousand — always
  driver-bounded), each vector computes argmin-distance as a pure
  codegen expression. The corpus never shuffles.
- **Update** is one k-row shuffle per iteration: ``groupBy(cluster)``
  with d per-dimension ``SUM`` aggregates — map-side partial
  aggregation reduces each partition to ≤ k rows before the exchange,
  so the shuffle volume is executors × k × d longs, independent of
  corpus size. (This is exactly Spark MLlib's KMeans shape.)
- The per-iteration ``collect()`` moves k×(d+1) longs to the driver —
  a documented bounded contract (same class as the IVF centroid
  sample, similarity.py).

Cross-engine determinism: floating-point SUM across rows is
order-dependent, so the trainer quantizes every component to exact
micro-units up front — ``floor(x·1e6 + 0.5)`` as BIGINT — and all
distances/sums stay in exact 64-bit integer arithmetic (d·(2.1e6)² ≈
2⁴⁸ per pair, far under 2⁶³). The centroid mean divides an exact
integer sum (< 2⁵³, exact in DOUBLE) by an exact count — one IEEE op,
bit-identical in Spark and DuckDB — then re-quantizes. Every value the
oracle compares is therefore deterministic regardless of row order or
partitioning.

No reference counterpart (the reference has no clustering operator);
this is extension surface for the training-data pipeline mandate, and
the shape follows Lloyd (1982) / the SemDeDup paper's k-means stage
(Abbas et al. 2023 §3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: micro-unit quantization scale shared with the oracle SQL.
SCALE = 1_000_000.0


def quantize_vec(vec_col: str = "embedding") -> F.Column:
    """array<float> -> array<long> in exact micro-units; the shared
    ``floor(x·1e6 + 0.5)`` idiom (functions/rounding.py) applied
    per component."""
    return F.transform(
        F.col(vec_col),
        lambda v: F.floor(v.cast("double") * F.lit(SCALE) + F.lit(0.5))
        .cast("long"))


def _sqdist(xq: F.Column, cq: F.Column) -> F.Column:
    """Exact integer squared L2 distance between two micro-unit
    vectors (BIGINT fold — associative, order-free)."""
    return F.aggregate(
        F.zip_with(xq, cq, lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x)


def _min_dist_to(cents: list[list[int]]) -> F.Column:
    """Exact integer min squared distance from ``xq`` to a literal
    centroid list — the same broadcast-literal, zero-shuffle shape as
    the Lloyd assignment step."""
    return F.array_min(F.array(*[
        _sqdist(F.col("xq"),
                F.array(*[F.lit(v).cast("long") for v in c]))
        for c in cents]))


def _farthest_point_seed(q: DataFrame, k: int,
                         sample_mod: int | None) -> list[list[int]]:
    """Deterministic farthest-point (k-means‖-flavored) init: first
    center = smallest id; each next center = the point maximizing
    min-distance to the chosen set (ties -> smallest id). Every round
    is one map-side distance expression + ONE max_by aggregate (a
    k-independent single-row shuffle); k-1 passes total. At corpus
    scale pass ``sample_mod=m`` to seed from a deterministic 1-in-m
    key-hash sample — the standard scalable-k-means compromise
    (Bahmani et al. 2012 run weighted sampling for the same reason:
    exact farthest-point over the full corpus is k passes over
    everything)."""
    # Persist/unpersist ONLY a sample frame we created here: when
    # sample_mod is None, s IS the caller's already-cached quantized
    # corpus — unpersisting it would evict the cache kmeans_fit
    # installed for its Lloyd iterations (every later round would
    # re-derive the parquet scan + quantization).
    own = sample_mod is not None
    s = q if not own else q.where(
        F.pmod(F.xxhash64(F.col("_id")), F.lit(int(sample_mod))) == 0
    ).persist()
    try:
        first = s.orderBy("_id").limit(1).collect()
        if not first:
            raise ValueError("farthest_point seed: empty input/sample")
        cents = [list(first[0]["xq"])]
        for _ in range(k - 1):
            rank = F.struct(_min_dist_to(cents).alias("d"),
                            (-F.col("_id")).alias("ni"))
            nxt = s.agg(F.max_by(F.col("xq"), rank)).collect()[0][0]
            cents.append(list(nxt))
    finally:
        if own:
            s.unpersist(blocking=False)
    return cents


def kmeans_fit(df: DataFrame, k: int = 4, iters: int = 2,
               id_col: str = "vec_id", vec_col: str = "embedding",
               dim: int = 64, init: str = "smallest_ids",
               seed_sample_mod: int | None = None) -> DataFrame:
    """Lloyd's k-means, ``iters`` rounds. Returns the final
    per-cluster per-dimension centroid table::

        (cluster_id long, dim int, centroid_q long, n_members long)

    ``centroid_q`` is the centroid component in micro-units —
    k×dim rows, with each row carrying its cluster's member count.
    Clusters that lose every member drop out (both the engine and
    the oracle drop them identically).

    ``init``: ``"smallest_ids"`` (default — the k rows with the
    smallest ids; trivially oracle-expressible, the parity contract
    for ``kmeans_embeddings``) or ``"farthest_point"`` (deterministic
    spread-out seeding under the same exact-integer doctrine — far
    better objective when the smallest ids all land in one true
    cluster; ``seed_sample_mod`` bounds its cost at corpus scale).
    Both inits are fully deterministic; they differ only in which k
    points start the iteration.
    """
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    if init not in ("smallest_ids", "farthest_point"):
        raise ValueError(f"unknown init {init!r}")
    # cache() the quantized corpus: every iteration (and the final
    # output aggregation) scans it — the standard MLlib-KMeans
    # input-caching trade (MEMORY_AND_DISK; spills, never recomputes
    # the parquet read + quantization per round).
    q = df.select(F.col(id_col).alias("_id"),
                  quantize_vec(vec_col).alias("xq")).cache()

    if init == "farthest_point":
        cents = list(enumerate(
            _farthest_point_seed(q, k, seed_sample_mod)))
    else:
        # Deterministic seed: the k smallest ids, cluster_id =
        # rank-1. k×d longs to the driver — bounded contract (see
        # module doc).
        seed = (q.orderBy("_id").limit(k).collect())
        cents = [(i, list(r["xq"])) for i, r in enumerate(seed)]

    sums = [F.sum(F.col("xq")[i]).alias(f"s{i}") for i in range(dim)]

    assigned = None
    for it in range(iters):
        # Assignment is a pure map-side argmin expression: the
        # centroids are literal arrays, each row evaluates k exact
        # integer distances and array_min over (dist, cluster_id)
        # structs picks the closest (ties to the smaller id by
        # struct field order). ZERO shuffle — the corpus is never
        # exchanged during assignment.
        arms = F.array(*[
            F.struct(
                _sqdist(F.col("xq"),
                        F.array(*[F.lit(v).cast("long") for v in cq]))
                .alias("dist"),
                F.lit(cid).cast("long").alias("cid"))
            for cid, cq in cents])
        assigned = q.select(
            "_id", "xq",
            F.array_min(arms).getField("cid").alias("cluster_id"))
        if it == iters - 1:
            break  # the final update is the output aggregation below
        # Update: ONE k-row shuffle (map-side partial agg), then
        # k×(d+1) longs back to the driver for the next broadcast.
        upd = (assigned.groupBy("cluster_id")
               .agg(*sums, F.count(F.lit(1)).alias("n"))
               .collect())
        cents = sorted(
            (int(r["cluster_id"]),
             [_mean_q(int(r[f"s{i}"]), int(r["n"])) for i in range(dim)])
            for r in upd)

    # Final table: aggregate the last assignment WHILE the iteration
    # cache is still warm (r13, VERDICT r12 #7) — the same k-row
    # shuffle + k×(d+1)-long collect as every update round (the
    # documented bounded-driver MLlib contract), then release the
    # cache. The previous shape unpersisted first and returned the
    # aggregation lazily, so the caller's first action re-ran the
    # full scan+quantize+assign pipeline once more per construction.
    # The result is k×dim rows of driver-computed longs; centroid_q
    # uses the identical one-IEEE-op mean as the in-plan expression
    # did (_mean_q — floor(s/n + 0.5) on exact-integer doubles), so
    # emitted values are bit-unchanged.
    try:
        fin = (assigned.groupBy("cluster_id")
               .agg(*sums, F.count(F.lit(1)).alias("n"))
               .collect())
    finally:
        q.unpersist(blocking=False)
    rows = [(int(r["cluster_id"]), i,
             _mean_q(int(r[f"s{i}"]), int(r["n"])), int(r["n"]))
            for r in sorted(fin, key=lambda r: int(r["cluster_id"]))
            for i in range(dim)]
    from pyspark.sql import types as T
    schema = T.StructType([
        T.StructField("cluster_id", T.LongType(), False),
        T.StructField("dim", T.IntegerType(), False),
        T.StructField("centroid_q", T.LongType(), False),
        T.StructField("n_members", T.LongType(), False)])
    return df.sparkSession.createDataFrame(rows, schema=schema)


def _mean_q(s: int, n: int) -> int:
    """floor(s/n + 0.5) with s exact in DOUBLE (< 2^53) — the same
    one-IEEE-op mean the oracle computes."""
    import math
    return int(math.floor(float(s) / float(n) + 0.5))
