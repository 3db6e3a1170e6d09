"""Similarity search over embedding columns (array<float>) —
brute-force cosine top-k baseline and a random-hyperplane LSH-bucketed
ANN scale path.

Scale design (100 TB / billions of vectors):

- **Brute force** is the correctness baseline: a broadcast join of the
  (small) query set against the corpus — one corpus scan, no shuffle of
  the corpus, per-partition top-k then a tiny global top-k merge
  (Spark's Window + row_number under AQE does partial ranking
  map-side).
- **LSH path**: each vector gets a b-bit signed-random-projection
  bucket computed map-side as a pure expression (the hyperplane matrix
  is a broadcast literal). Candidates are vectors in the *same bucket*
  as a query — the join key is the bucket id, so the corpus shuffles
  once by bucket (or is written bucketed-by-bucket up front) and each
  query probes ~1/2^b of the data. Recall/cost trades by b; multiple
  hash tables = union over t independent plane sets.
- All arithmetic is CAST-to-double, sequential accumulation, so the
  DuckDB oracle reproduces every value bit-for-bit.

The hyperplane weights derive from md5 (available identically in
Python's hashlib, Spark, and DuckDB): w[p][i] =
(int(md5(f"{p}_{i}")[:8], 16) % 2001 - 1000) / 1000.0.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pointdatabase_spark.functions import rounding

from pointdatabase_spark.partitioning import spread


def _h32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def hyperplanes(n_planes: int, dim: int, salt: str = "") -> list[list[float]]:
    """Deterministic signed-random-projection matrix (md5-derived).
    `salt` yields an independent family — the per-table planes of
    multi-table LSH (empty salt reproduces the original table)."""
    return [[(_h32(f"{salt}{p}_{i}") % 2001 - 1000) / 1000.0
             for i in range(dim)]
            for p in range(n_planes)]


def plane_tables(n_tables: int, n_planes: int, dim: int
                 ) -> list[list[list[float]]]:
    """t independent hyperplane sets (table 0 = the unsalted single-
    table family, so multi-table candidates are a superset of the
    single-table ones by construction)."""
    return [hyperplanes(n_planes, dim, salt="" if t == 0 else f"T{t}_")
            for t in range(n_tables)]


def dot_expr(a: str, b: str) -> str:
    """Sequential double-precision dot product of two float arrays —
    term-for-term reproducible in the oracle."""
    return (f"aggregate(zip_with({a}, {b}, "
            "(x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
            "0D, (acc, v) -> acc + v)")


def cosine_expr(a: str, b: str) -> str:
    return (f"{dot_expr(a, b)} / (sqrt({dot_expr(a, a)})"
            f" * sqrt({dot_expr(b, b)}))")


def norm_expr(a: str) -> str:
    """sqrt of the sequential self-dot — precomputed once per vector
    (map-side, before any join) it yields the same double as the
    per-pair sqrt(dot(a,a)) inside cosine_expr, so cosines computed as
    dot/(norm_a*norm_b) are bit-identical to the oracle's per-pair
    formula while evaluating each self-dot once instead of once per
    candidate pair (the higher-order-function dot is the hot path)."""
    return f"sqrt({dot_expr(a, a)})"


def plane_dot_expr(vec: str, plane: list[float]) -> str:
    """Dot of a float-array column with a literal plane (sequential)."""
    lit = "array(" + ", ".join(f"{w}D" for w in plane) + ")"
    return dot_expr(vec, lit)


def bucket_expr(vec: str, planes: list[list[float]]) -> str:
    """b-bit SRP bucket id: bit p set iff plane_p · v > 0."""
    bits = " + ".join(
        f"(CASE WHEN {plane_dot_expr(vec, pl)} > 0D THEN {1 << p} ELSE 0 END)"
        for p, pl in enumerate(planes))
    return f"CAST({bits} AS BIGINT)"


def cosine_topk(corpus: DataFrame, queries: DataFrame, k: int,
                id_col: str = "vec_id", vec_col: str = "embedding",
                q_id: str = "q_id") -> DataFrame:
    """Exact top-k by cosine for each query vector (brute force).
    `queries` must be small (it is broadcast). The corpus never
    shuffles by key — `spread` only widens a narrower-than-cores scan
    so the per-pair dot fold uses every slot."""
    from pyspark.sql.window import Window
    q = (queries.select(F.col(id_col).alias(q_id),
                        F.col(vec_col).alias("_qv"))
         .withColumn("_qn", F.expr(norm_expr("_qv"))))
    joined = (spread(corpus.select(F.col(id_col).alias("vec_id"),
                                   F.col(vec_col).alias("_cv")))
              .withColumn("_cn", F.expr(norm_expr("_cv")))
              .join(F.broadcast(q))
              .withColumn("cos", F.expr(dot_expr("_qv", "_cv"))
                          / (F.col("_qn") * F.col("_cn"))))
    w = Window.partitionBy(q_id).orderBy(F.desc("cos"), F.asc("vec_id"))
    return (joined.withColumn("rank",
                              F.row_number().over(w).cast("long"))
            .where(F.col("rank") <= k)
            .select(q_id, "vec_id", "cos", "rank"))


def with_bucket(df: DataFrame, planes: list[list[float]],
                vec_col: str = "embedding",
                out: str = "bucket") -> DataFrame:
    return df.withColumn(out, F.expr(bucket_expr(vec_col, planes)))


def lsh_ann_topk(corpus: DataFrame, queries: DataFrame, k: int,
                 planes: list[list[float]],
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 q_id: str = "q_id") -> DataFrame:
    """Approximate top-k: candidates share the query's SRP bucket;
    exact cosine ranking within the bucket. The corpus-side bucket is
    a map-side expression — the only shuffle is the bucket-key join."""
    from pyspark.sql.window import Window
    c = with_bucket(spread(corpus.select(F.col(id_col).alias("vec_id"),
                                         F.col(vec_col).alias("_cv"))),
                    planes, "_cv").withColumn(
        "_cn", F.expr(norm_expr("_cv")))
    q = with_bucket(queries.select(F.col(id_col).alias(q_id),
                                   F.col(vec_col).alias("_qv")),
                    planes, "_qv").withColumn(
        "_qn", F.expr(norm_expr("_qv")))
    joined = (c.join(F.broadcast(q), "bucket")
              .withColumn("cos", F.expr(dot_expr("_qv", "_cv"))
                          / (F.col("_qn") * F.col("_cn"))))
    w = Window.partitionBy(q_id).orderBy(F.desc("cos"), F.asc("vec_id"))
    return (joined.withColumn("rank",
                              F.row_number().over(w).cast("long"))
            .where(F.col("rank") <= k)
            .select(q_id, "vec_id", "bucket", "cos", "rank"))


def multi_bucket_entries(vec: str,
                         plane_sets: list[list[list[float]]]) -> str:
    """array<struct<tid,bucket>> of per-table SRP bucket ids — the
    explode source for multi-table LSH keys (all map-side)."""
    entries = ", ".join(
        f"struct({t} AS tid, {bucket_expr(vec, ps)} AS bucket)"
        for t, ps in enumerate(plane_sets))
    return f"array({entries})"


def lsh_ann_topk_multi(corpus: DataFrame, queries: DataFrame, k: int,
                       plane_sets: list[list[list[float]]],
                       id_col: str = "vec_id", vec_col: str = "embedding",
                       q_id: str = "q_id") -> DataFrame:
    """Multi-table SRP-LSH top-k: OR-amplification over t independent
    hyperplane tables — a candidate shares ANY table's bucket with the
    query, so recall rises as 1-(1-p)^t per near neighbor while each
    table keeps the same cheap bucket width.

    Plan shape (100 TB lens): every per-table bucket id is a map-side
    expression; the corpus explodes to t (vec_id, tid, bucket) keys,
    joins the broadcast query table map-side (no corpus shuffle), and
    only (q_id, vec_id, cos) survives into the candidate-dedup
    exchange — the duplicate-across-tables collapse happens AFTER the
    cosine is computed map-side, so vectors never shuffle and the
    only exchanges are the tiny candidate distinct + top-k window."""
    from pyspark.sql.window import Window
    c = (spread(corpus.select(F.col(id_col).alias("vec_id"),
                              F.col(vec_col).alias("_cv")))
         .withColumn("_cn", F.expr(norm_expr("_cv")))
         .withColumn("_tb", F.explode(
             F.expr(multi_bucket_entries("_cv", plane_sets))))
         .select("vec_id", "_cv", "_cn",
                 F.col("_tb.tid").alias("tid"),
                 F.col("_tb.bucket").alias("bucket")))
    q = (queries.select(F.col(id_col).alias(q_id),
                        F.col(vec_col).alias("_qv"))
         .withColumn("_qn", F.expr(norm_expr("_qv")))
         .withColumn("_tb", F.explode(
             F.expr(multi_bucket_entries("_qv", plane_sets))))
         .select(q_id, "_qv", "_qn",
                 F.col("_tb.tid").alias("tid"),
                 F.col("_tb.bucket").alias("bucket")))
    cand = (c.join(F.broadcast(q), ["tid", "bucket"])
            .withColumn("cos", F.expr(dot_expr("_qv", "_cv"))
                        / (F.col("_qn") * F.col("_cn")))
            .select(q_id, "vec_id", "cos")
            .distinct())
    w = Window.partitionBy(q_id).orderBy(F.desc("cos"), F.asc("vec_id"))
    return (cand.withColumn("rank", F.row_number().over(w).cast("long"))
            .where(F.col("rank") <= k)
            .select(q_id, "vec_id", "cos", "rank"))


def centroids(n_centroids: int, dim: int) -> list[list[float]]:
    """Deterministic IVF coarse-quantizer centroids (md5-derived, same
    recipe as `hyperplanes`) — the oracle-reproducible path. For
    data-adaptive centroids use :func:`train_centroids`; the
    assignment/probe plan is identical either way."""
    return [[(_h32(f"c{c}_{i}") % 2001 - 1000) / 1000.0
             for i in range(dim)]
            for c in range(n_centroids)]


def train_centroids(df: DataFrame, n_centroids: int, n_iter: int = 5,
                    sample_n: int = 2000, id_col: str = "vec_id",
                    vec_col: str = "embedding") -> list[list[float]]:
    """IVF coarse-quantizer trainer: Lloyd k-means on a deterministic
    hash-ordered sample.

    Scale shape: the sample is `orderBy(md5(id)) LIMIT sample_n`,
    which Spark executes as TakeOrderedAndProject — per-partition
    partial top-N then one driver merge, NO full shuffle — so the
    "collect" is bounded at sample_n×dim doubles regardless of corpus
    size (the standard IVF recipe: train on a sample, assign the full
    corpus map-side). md5 ordering makes the sample a deterministic
    pseudo-random draw: independent of physical partitioning/file
    order, reproducible across runs, no RNG seed plumbing. Init is
    the first k sample rows in hash order; empty clusters keep their
    previous centroid. The returned literal table drops into
    :func:`ivf_ann_topk` exactly like :func:`centroids` — the probe
    plan is unchanged (plan-asserted in tests)."""
    import numpy as np
    rows = (df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
            .orderBy(F.md5(F.col("id").cast("string")), "id")
            .limit(int(sample_n)).collect())
    if len(rows) < n_centroids:
        raise ValueError(
            f"sample of {len(rows)} rows cannot seed {n_centroids} "
            "centroids; lower n_centroids or raise sample_n")
    x = np.array([[float(w) for w in r.v] for r in rows], dtype=np.float64)
    cents = x[:n_centroids].copy()
    for _ in range(int(n_iter)):
        d2 = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=-1)
        assign = d2.argmin(axis=1)
        for c in range(n_centroids):
            members = x[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
    return [[float(w) for w in c] for c in cents]


def _cell_scores(vec: str, cents: list[list[float]]) -> str:
    """Per-centroid distance scores d_k = ||c_k||^2 - 2 * v.c_k
    (||v||^2 is constant per row and cancels in the argmin). ||c_k||^2
    is a Python-summed literal embedded identically in the oracle."""
    terms = []
    for ck in cents:
        ck2 = 0.0
        for w in ck:
            ck2 += w * w
        terms.append(f"({ck2!r}D - 2.0D * {plane_dot_expr(vec, ck)})")
    return "array(" + ", ".join(terms) + ")"


def cell_expr(vec: str, cents: list[list[float]]) -> str:
    """IVF cell id: argmin over centroid distances (first-index ties —
    exact-double equality, deterministic in both engines)."""
    arr = _cell_scores(vec, cents)
    return (f"CAST(array_position({arr}, array_min({arr})) AS BIGINT)"
            " - 1")


def probe_cells_expr(vec: str, cents: list[list[float]],
                     nprobe: int) -> str:
    """The query's `nprobe` nearest cells, nearest first: sort
    (score, idx) structs — score ties break on idx — and project idx."""
    arr = _cell_scores(vec, cents)
    structs = (f"transform({arr}, (s, i) ->"
               " struct(s AS s, CAST(i AS BIGINT) AS i))")
    return (f"transform(slice(array_sort({structs}), 1, {int(nprobe)}),"
            " p -> p.i)")


def ivf_ann_topk(corpus: DataFrame, queries: DataFrame, k: int,
                 cents: list[list[float]], nprobe: int = 1,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 q_id: str = "q_id") -> DataFrame:
    """IVF approximate top-k: corpus vectors are assigned to their
    nearest coarse centroid map-side (a pure expression over a literal
    centroid table — no shuffle, and at rest the corpus would be
    written bucketed/partitioned by `cell`); each query probes its
    `nprobe` nearest cells and reranks candidates by exact cosine.
    The only shuffle is the cell-key join (broadcast here: queries are
    small); recall/cost trades by n_centroids and nprobe."""
    from pyspark.sql.window import Window
    c = (spread(corpus.select(F.col(id_col).alias("vec_id"),
                              F.col(vec_col).alias("_cv")))
         .withColumn("cell", F.expr(cell_expr("_cv", cents)))
         .withColumn("_cn", F.expr(norm_expr("_cv"))))
    q = (queries.select(F.col(id_col).alias(q_id),
                        F.col(vec_col).alias("_qv"))
         .withColumn("cell", F.explode(
             F.expr(probe_cells_expr("_qv", cents, nprobe))))
         .withColumn("_qn", F.expr(norm_expr("_qv"))))
    joined = (c.join(F.broadcast(q), "cell")
              .withColumn("cos", F.expr(dot_expr("_qv", "_cv"))
                          / (F.col("_qn") * F.col("_cn"))))
    w = Window.partitionBy(q_id).orderBy(F.desc("cos"), F.asc("vec_id"))
    return (joined.withColumn("rank",
                              F.row_number().over(w).cast("long"))
            .where(F.col("rank") <= k)
            .select(q_id, "vec_id", "cell", "cos", "rank"))


def write_ann_index(corpus: DataFrame, path: str,
                    cents: list[list[float]],
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    mode: str = "overwrite") -> None:
    """Materialize the IVF ANN INDEX as parquet under ``path`` — the
    production form of :func:`ivf_ann_topk`'s corpus side, computed
    once so serving a query batch never rescans or reassigns corpus
    embeddings (the stored-index counterpart of
    dedup.write_dedup_index):

    - ``cells/`` — (vec_id, embedding, norm) PARTITIONED BY the
      coarse cell: a probe touching nprobe cells reads nprobe
      directories, O(probed fraction) of the index, via dynamic
      partition pruning against the broadcast query side
      (plan-asserted in tests/test_plans.py);
    - ``meta/`` — the centroid table (n_centroids rows), so the
      probe expression is rebuilt from storage, not trusted from the
      caller.

    Cell assignment and norms use the same expressions as the inline
    operator; doubles round-trip parquet exactly, so a stored-index
    query returns bit-identical results to the inline plan."""
    c = (corpus.select(F.col(id_col).alias("vec_id"),
                       F.col(vec_col).alias("embedding"))
         .withColumn("cell", F.expr(cell_expr("embedding", cents)))
         .withColumn("norm", F.expr(norm_expr("embedding"))))
    c.write.partitionBy("cell").mode(mode).parquet(f"{path}/cells")
    meta = corpus.sparkSession.createDataFrame(
        [(i, [float(w) for w in ck]) for i, ck in enumerate(cents)],
        "cell bigint, centroid array<double>")
    meta.write.mode(mode).parquet(f"{path}/meta")


def append_ann_index(delta: DataFrame, path: str,
                     id_col: str = "vec_id",
                     vec_col: str = "embedding") -> None:
    """Append a batch of new embeddings to a stored ANN index
    (:func:`write_ann_index`) — the continuous-ingest path: cell
    assignment for the delta uses the CENTROIDS ALREADY IN THE INDEX
    (read from ``meta/``, bounded rows), so the stored corpus is
    never rescanned or reassigned and per-batch cost is O(delta).
    New cell directories appear as plain partition appends; the
    serving query's dynamic partition pruning picks them up with no
    index rebuild. (Centroids are fixed at index creation — the IVF
    contract; re-training centroids means rebuilding the index.)"""
    spark = delta.sparkSession
    meta = sorted(spark.read.parquet(f"{path}/meta").collect(),
                  key=lambda r: r.cell)
    cents = [list(r.centroid) for r in meta]
    c = (delta.select(F.col(id_col).alias("vec_id"),
                      F.col(vec_col).alias("embedding"))
         .withColumn("cell", F.expr(cell_expr("embedding", cents)))
         .withColumn("norm", F.expr(norm_expr("embedding"))))
    c.write.partitionBy("cell").mode("append").parquet(f"{path}/cells")


def ann_topk_against_index(spark, path: str, queries: DataFrame,
                           k: int, nprobe: int = 1,
                           id_col: str = "vec_id",
                           vec_col: str = "embedding",
                           q_id: str = "q_id") -> DataFrame:
    """Approximate top-k served from a STORED index
    (:func:`write_ann_index`): centroids come from ``meta/`` (a
    bounded n_centroids-row collect), the query side explodes to its
    probe cells, and the equi-join against the partitioned ``cells/``
    table dynamically prunes to the probed directories — per-batch
    cost is O(queries × probed cells), independent of corpus size.
    Output matches :func:`ivf_ann_topk` bit-for-bit."""
    from pyspark.sql.window import Window
    meta = sorted(spark.read.parquet(f"{path}/meta").collect(),
                  key=lambda r: r.cell)
    cents = [list(r.centroid) for r in meta]
    c = (spark.read.parquet(f"{path}/cells")
         .select("vec_id", F.col("embedding").alias("_cv"),
                 F.col("norm").alias("_cn"),
                 F.col("cell").cast("long").alias("cell")))
    q = (queries.select(F.col(id_col).alias(q_id),
                        F.col(vec_col).alias("_qv"))
         .withColumn("cell", F.explode(
             F.expr(probe_cells_expr("_qv", cents, nprobe))))
         .withColumn("_qn", F.expr(norm_expr("_qv"))))
    joined = (c.join(F.broadcast(q), "cell")
              .withColumn("cos", F.expr(dot_expr("_qv", "_cv"))
                          / (F.col("_qn") * F.col("_cn"))))
    w = Window.partitionBy(q_id).orderBy(F.desc("cos"), F.asc("vec_id"))
    return (joined.withColumn("rank",
                              F.row_number().over(w).cast("long"))
            .where(F.col("rank") <= k)
            .select(q_id, "vec_id", "cell", "cos", "rank"))


def cosine_neardup_pairs(df: DataFrame, threshold: float,
                         planes: list[list[float]] | None = None,
                         id_col: str = "vec_id",
                         vec_col: str = "embedding",
                         n_blocks: int | None = 8) -> DataFrame:
    """Embedding near-duplicate pairs. With `planes`, candidate pairs
    are bucket-blocked (the 100-TB path: quadratic work per bucket,
    never corpus²); without, EXACT all-pairs via a distributed
    block-pair matmul — O(n²) total work by definition, but fully
    executor-side (no driver collect; r11) with per-task matrices
    bounded by ``n_blocks`` (B): each task holds ~(n/B)² of the
    cosine matrix, so size B so that two n/B × dim float64 blocks
    plus their product fit executor memory (output is bit-identical
    for ANY B — the blocking only partitions the pair space; pinned
    by test). ``n_blocks=None`` derives a floor from the corpus
    count (one column-pruned count action): B = max(8,
    ceil(n / 100_000)), capping blocks at ~100k rows — at dim 1024
    that is two ~0.8 GB operand blocks per task, comfortably inside
    a standard executor; pass an explicit B to override for fatter
    or thinner vectors. `spread` widens the probe side so the pair
    sweep uses every core even from a one-file scan.

    Cache note: the vector-table persist is released by no explicit
    unpersist (the return stays lazy — an eager release would
    force a premature action; ngram_jaccard_pairs precedent);
    sessions issuing MANY calls should release between batches
    via ``spark.catalog.clearCache()``."""
    if n_blocks is not None and n_blocks < 1:
        raise ValueError(f"need n_blocks >= 1, got {n_blocks=}")
    base = (spread(df.select(F.col(id_col).alias("id"),
                             F.col(vec_col).alias("v")))
            .withColumn("n", F.expr(norm_expr("v")))
            # both branches re-read the vector table (bucket/block
            # build + the two verify-join sides); cache ids+vectors
            # once (lazy multi-consumer precedent)
            .persist())
    if n_blocks is None and planes is None:
        # Auto floor: count once over the (already-persisted) id+vec
        # frame so per-task operand blocks stay ~100k rows regardless
        # of corpus size. The count doubles as the cache build.
        n_rows = base.count()
        n_blocks = max(8, -(-n_rows // 100_000))
    if planes is not None:
        base = with_bucket(base, planes, "v")
        a, b = base.alias("a"), base.alias("b")
        cond = (F.col("a.bucket") == F.col("b.bucket")) & \
               (F.col("a.id") < F.col("b.id"))
        joined = a.join(b, cond)
    else:
        # Exact all-pairs (the SRP-blocked variant above is the scale
        # path). DISTRIBUTED block-pair matmul (r11 — this was the
        # repo's last collect-the-corpus surface): rows hash into B
        # blocks, every block pair (i <= j) becomes one applyInPandas
        # group whose task runs a vectorized NumPy matmul PREFILTER
        # proposing candidates at threshold−1e−6 (|BLAS cosine −
        # sequential-SQL cosine| is bounded far below that margin at
        # dim 64, so no true pair is lost). Every candidate is then
        # decided by the exact SQL expression, so the output stays
        # bit-identical to the naive nested-loop join. Each unordered
        # pair lands in exactly one block-pair group (ids hash to one
        # block each), diagonal groups use the upper triangle. Work
        # is still O(n²/B²) per task — all-pairs is all-pairs — but
        # the corpus never leaves the executors: shuffle is corpus ×
        # ~B/2 vector rows, and B tunes the per-task matrix to
        # executor memory.
        import numpy as np
        import pandas as pd
        spark = df.sparkSession
        pairs_df = spark.createDataFrame(
            [(i, j) for i in range(n_blocks)
             for j in range(i, n_blocks)], "bk_a int, bk_b int")
        blocks = base.withColumn(
            "bk", F.pmod(F.xxhash64(F.col("id")),
                         F.lit(n_blocks)).cast("int"))
        left = (blocks.join(F.broadcast(pairs_df),
                            blocks["bk"] == pairs_df["bk_a"])
                .select("bk_a", "bk_b", "id", "v",
                        F.lit(0).alias("side")))
        right = (blocks.join(
            F.broadcast(pairs_df),
            (blocks["bk"] == pairs_df["bk_b"])
            & (pairs_df["bk_a"] != pairs_df["bk_b"]))
            .select("bk_a", "bk_b", "id", "v",
                    F.lit(1).alias("side")))
        thr = float(threshold)

        def _propose(pdf: pd.DataFrame) -> pd.DataFrame:
            a_ = pdf[pdf["side"] == 0]
            b_ = pdf[pdf["side"] == 1]
            # Diagonal is decided by the GROUP KEY, not by side
            # emptiness: a cross group whose right block is empty
            # still exists (left side joined), and treating it as
            # diagonal would re-emit block i's within-block pairs
            # once per empty partner block.
            diag = pdf["bk_a"].iat[0] == pdf["bk_b"].iat[0]
            if not diag and (len(a_) == 0 or len(b_) == 0):
                return pd.DataFrame({
                    "id_a": np.empty(0, dtype="int64"),
                    "id_b": np.empty(0, dtype="int64")})
            with np.errstate(divide="ignore", invalid="ignore"):
                if diag:           # diagonal block: within-block triu
                    ids = a_["id"].to_numpy()
                    mat = np.stack(a_["v"].to_numpy())
                    nrm = np.sqrt((mat * mat).sum(axis=1))
                    cos = (mat @ mat.T) / np.outer(nrm, nrm)
                    ia, ib = np.where(
                        np.triu(cos >= thr - 1e-6, k=1))
                    lo = np.minimum(ids[ia], ids[ib])
                    hi = np.maximum(ids[ia], ids[ib])
                else:              # cross block: full rectangle
                    ida = a_["id"].to_numpy()
                    idb = b_["id"].to_numpy()
                    ma = np.stack(a_["v"].to_numpy())
                    mb = np.stack(b_["v"].to_numpy())
                    na_ = np.sqrt((ma * ma).sum(axis=1))
                    nb_ = np.sqrt((mb * mb).sum(axis=1))
                    cos = (ma @ mb.T) / np.outer(na_, nb_)
                    ia, ib = np.where(cos >= thr - 1e-6)
                    lo = np.minimum(ida[ia], idb[ib])
                    hi = np.maximum(ida[ia], idb[ib])
            return pd.DataFrame({"id_a": lo.astype("int64"),
                                 "id_b": hi.astype("int64")})

        cand = (left.unionByName(right)
                .groupBy("bk_a", "bk_b")
                .applyInPandas(_propose, "id_a long, id_b long"))
        a, b = base.alias("a"), base.alias("b")
        joined = (cand.join(a, cand.id_a == F.col("a.id"))
                  .join(b, cand.id_b == F.col("b.id")))
    return (joined
            .withColumn("cos", F.expr(dot_expr("a.v", "b.v"))
                        / (F.col("a.n") * F.col("b.n")))
            .where(F.col("cos") >= threshold)
            .select(F.col("a.id").alias("id_a"),
                    F.col("b.id").alias("id_b"), "cos"))


def semantic_dedup(emb: DataFrame, cents: list[list[float]],
                   threshold: float, id_col: str = "vec_id",
                   vec_col: str = "embedding") -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster the embedding space coarsely, then
    within each cluster drop every vector that is τ-cosine-similar to
    a higher-priority clustermate, where priority = farther from the
    cluster centroid (the paper's keep-the-edge-points rule: extreme
    examples carry more training signal than the cluster core),
    tie-broken on id.

    Semantics (deterministic, one pass — no iterative greedy): a
    vector is REMOVED iff some vector in the same cell with strictly
    higher priority is ``cos >= threshold`` similar to it; survivors
    are everything else.  This is the standard practical reading of
    the paper's per-cluster dedup and is order-independent.

    Scale shape: cell assignment is a map-side expression over the
    literal centroid table (zero shuffle — same kernel as
    :func:`ivf_ann_topk`); the pairwise test is a self-join ON THE
    CELL KEY, so the quadratic term is Σ|cell|², not corpus² — the
    whole point of clustering first (the paper runs k≈11k clusters
    over 233M embeddings for exactly this reason).  At 100 TB: train
    data-adaptive centroids (:func:`train_centroids`) with k scaled
    to hold E[|cell|] at a few thousand, write the corpus
    cell-partitioned (:func:`write_ann_index`), and the self-join
    becomes per-partition local with no skew valve needed beyond k.

    Returns the SURVIVORS as (id_col, cell)."""
    base = (spread(emb.select(F.col(id_col).alias("id"),
                              F.col(vec_col).alias("v")))
            .withColumn("cell", F.expr(cell_expr("v", cents)))
            .withColumn("cdist",
                        F.expr(f"array_min({_cell_scores('v', cents)})"))
            .withColumn("n", F.expr(norm_expr("v"))))
    a, b = base.alias("a"), base.alias("b")
    higher_priority = ((F.col("b.cdist") > F.col("a.cdist"))
                       | ((F.col("b.cdist") == F.col("a.cdist"))
                          & (F.col("b.id") < F.col("a.id"))))
    cos = (F.expr(dot_expr("a.v", "b.v"))
           / (F.col("a.n") * F.col("b.n")))
    removed = (a.join(b, (F.col("a.cell") == F.col("b.cell"))
                      & higher_priority)
               .where(cos >= threshold)
               .select(F.col("a.id").alias("id"))
               .distinct())
    return (base.join(removed, "id", "left_anti")
            .select(F.col("id").alias(id_col), "cell"))


def label_centroid_stats(emb: DataFrame, id_col: str = "vec_id",
                         vec_col: str = "embedding",
                         label_col: str = "label") -> DataFrame:
    """Per-label embedding-space diagnostics: centroid norm, mean
    cosine of members to their own centroid, and nearest-centroid
    purity (how many members sit closest to their OWN label's
    centroid) — the standard health check before trusting an
    embedding column for clustering / dedup / ANN.

    Scale shape: centroids come from one posexplode → (label, dim)
    partial-aggregated AVG (D·N skinny rows, map-combined), then
    collapse back to arrays (|labels| rows) and BROADCAST into two
    joins — the member-vs-own-centroid pass is scan-local, and the
    purity pass fans each vector out only |labels| ways before a
    skinny (id, label, cos) argmax. The corpus column itself never
    shuffles; everything wide stays in whole-stage codegen arrays.
    """
    ex = emb.select(F.col(label_col).alias("clabel"),
                    F.posexplode(vec_col).alias("pos", "v"))
    cen = (ex.groupBy("clabel", "pos").agg(F.avg("v").alias("m")))
    cvec = (cen.groupBy("clabel")
            .agg(F.expr("transform(array_sort(collect_list("
                        "struct(pos, m))), s -> s.m)").alias("cvec")))
    base = emb.select(F.col(id_col).alias("id"),
                      F.col(label_col).alias("label"), vec_col)
    pairs = base.join(F.broadcast(cvec))
    dot = F.expr(f"aggregate(zip_with({vec_col}, cvec,"
                 " (a, b) -> CAST(a AS DOUBLE) * b),"
                 " 0.0D, (acc, x) -> acc + x)")
    ne = F.sqrt(F.expr(
        f"aggregate({vec_col}, 0.0D,"
        " (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))"))
    nc = F.sqrt(F.expr(
        "aggregate(cvec, 0.0D, (acc, x) -> acc + x * x)"))
    cos = (pairs.select("id", "label", "clabel",
                        (dot / (ne * nc)).alias("cos"),
                        nc.alias("cnorm")))
    from pyspark.sql.window import Window
    # the argmax orders by cosine ROUNDED to 12 decimals: centroid
    # averages are summation-order dependent across engines/runs at
    # ~1e-15, and an unrounded comparison could flip the winner
    # between two near-identical centroids; real margins dwarf 1e-12
    w = Window.partitionBy("id").orderBy(rounding.qround(F.col("cos"), 12).desc(),
                                         F.col("clabel").asc())
    best = (cos.withColumn("_rk", F.row_number().over(w))
            .where(F.col("_rk") == 1)
            .select("id", "label",
                    (F.col("clabel") == F.col("label"))
                    .cast("long").alias("own_best")))
    own = cos.where(F.col("clabel") == F.col("label"))
    per_own = (own.groupBy("label")
               .agg(F.count(F.lit(1)).alias("n_vecs"),
                    rounding.qround(F.max("cnorm"), 6).alias("centroid_norm"),
                    rounding.qround(F.avg("cos"), 6).alias("mean_cos_own")))
    purity = (best.groupBy("label")
              .agg(F.sum("own_best").cast("bigint").alias("n_nearest_own")))
    return per_own.join(purity, "label")


def quantize_int8(emb: DataFrame, vec_col: str = "embedding",
                  id_col: str = "vec_id") -> DataFrame:
    """Per-dimension affine int8 quantization of an embedding column —
    the 100 TB ANN memory valve: a 4-byte-float corpus vector becomes
    1 byte/dim (``qvec`` array<tinyint>), cutting the candidate-scan
    and index footprint 4x while ``deq`` (the dequantized doubles)
    serves scoring.  No reference counterpart (LLM-data extension
    surface, SURVEY §2.10 family).

    Plan: ONE posexplode pass reduces the corpus to D per-dimension
    (min, max) rows — map-side combinable, the shuffle carries
    |dims| keys regardless of corpus size; the 1-row (mn[], mx[])
    stats frame broadcasts back and quantize/dequantize are per-row
    codegen ``transform`` expressions, so the corpus itself never
    shuffles.  Arithmetic is pure IEEE (divide, multiply, floor) in
    a fixed order, reproducible term for term in the oracle:
    q_i = floor((x - mn_i) / s_i * 254.0 + 0.5) - 127 (s_i > 0),
    deq_i = mn_i + floor((x - mn_i) / s_i * 254.0 + 0.5) / 254.0 * s_i."""
    ex = emb.select(F.posexplode(vec_col).alias("pos", "v"))
    rng = (ex.groupBy("pos")
           .agg(F.min(F.col("v").cast("double")).alias("mn"),
                F.max(F.col("v").cast("double")).alias("mx")))
    st = rng.agg(
        F.expr("transform(array_sort(collect_list(struct(pos, mn))),"
               " s -> s.mn)").alias("_mn"),
        F.expr("transform(array_sort(collect_list(struct(pos, mx))),"
               " s -> s.mx)").alias("_mx"))
    scale = "(element_at(_mx, i + 1) - element_at(_mn, i + 1))"
    mn = "element_at(_mn, i + 1)"
    steps = (f"floor((CAST(x AS DOUBLE) - {mn}) / {scale}"
             " * 254.0 + 0.5)")
    qexpr = (f"transform({vec_col}, (x, i) -> CASE WHEN {scale} > 0D"
             f" THEN CAST({steps} - 127 AS INT) ELSE 0 END)")
    dexpr = (f"transform({vec_col}, (x, i) -> CASE WHEN {scale} > 0D"
             f" THEN {mn} + {steps} / 254.0 * {scale}"
             f" ELSE {mn} END)")
    return (emb.join(F.broadcast(st))
            .select(id_col,
                    F.expr(qexpr).cast("array<tinyint>").alias("qvec"),
                    F.expr(dexpr).alias("deq")))


def hard_negatives(corpus: DataFrame, anchors: DataFrame, k: int,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   label_col: str = "label",
                   q_id: str = "q_id") -> DataFrame:
    """Hard-negative mining for contrastive training (Schroff et al.
    2015; the batch-mining stage of every embedding-model data
    pipeline): for each anchor, the k most-similar vectors with a
    DIFFERENT label — the negatives closest to the decision boundary,
    which carry the most gradient signal.

    Plan: identical to :func:`cosine_topk` (anchor set broadcast, the
    corpus never shuffles, per-partition partial top-k under the
    rank-filtered window) with the label-mismatch predicate applied
    BEFORE ranking, so same-label pairs never enter the window state.
    The LSH-bucketed variant swaps the broadcast join for the bucket
    join exactly as lsh_ann_topk does — the mining semantics are the
    candidate filter, not the candidate generator."""
    from pyspark.sql.window import Window
    q = (anchors.select(F.col(id_col).alias(q_id),
                        F.col(vec_col).alias("_qv"),
                        F.col(label_col).alias("_ql"))
         .withColumn("_qn", F.expr(norm_expr("_qv"))))
    joined = (spread(corpus.select(F.col(id_col).alias("vec_id"),
                                   F.col(vec_col).alias("_cv"),
                                   F.col(label_col).alias("_cl")))
              .withColumn("_cn", F.expr(norm_expr("_cv")))
              .join(F.broadcast(q))
              .where(F.col("_cl") != F.col("_ql"))
              .withColumn("cos", F.expr(dot_expr("_qv", "_cv"))
                          / (F.col("_qn") * F.col("_cn"))))
    w = Window.partitionBy(q_id).orderBy(F.desc("cos"), F.asc("vec_id"))
    return (joined.withColumn("rank",
                              F.row_number().over(w).cast("long"))
            .where(F.col("rank") <= k)
            .select(q_id, "vec_id", F.col("_cl").alias("neg_label"),
                    "cos", "rank"))


def random_projection(df: DataFrame, out_dim: int, dim: int = 64,
                      vec_col: str = "embedding",
                      salt: str = "rp_",
                      out: str = "proj") -> DataFrame:
    """Johnson-Lindenstrauss random projection to ``out_dim``
    dimensions — the standard cheap pre-pass that shrinks an ANN /
    clustering corpus (distance-preserving within 1±eps for
    eps ~ sqrt(8 ln n / k)); the projection matrix is md5-derived
    (same deterministic family as :func:`hyperplanes`) and lives as
    LITERALS inside the expression, so the whole projection is one
    zero-shuffle map-side codegen pass — at 100 TB it runs inline
    with the scan that writes the reduced corpus.

    Components are scaled by 1/sqrt(out_dim); pick a power of four
    for ``out_dim`` (16, 64, ...) and the scale is an exact binary
    fraction, keeping every emitted double a chain of single IEEE
    ops the oracle reproduces bit-for-bit."""
    planes = hyperplanes(out_dim, dim, salt=salt)
    s = 1.0 / (out_dim ** 0.5)
    comp = [F.expr(plane_dot_expr(vec_col, pl)) * F.lit(s)
            for pl in planes]
    return df.withColumn(out, F.array(*comp))

