"""Bin-partitioned Parquet tile store — the Spark-native replacement for
the reference's entire geo_index + tile-file machinery (SURVEY §1.4,
§2.1 S7/S8/S10/S11/S12; geo_index.py, ATL06_tiles.py:30-140).

Layout contract:
  <root>/tile_x=<meters>/tile_y=<meters>/part-*.parquet
with rows inside each file sorted by (bin_x, bin_y, <order cols>) —
exactly the reference's per-bin groups sorted by (bin, time)
(ATL06_tiles.py:81-98), re-expressed so that:

- a box query on tile columns = Catalyst partition pruning (no file
  even opened outside the box);
- a box query on bin columns = Parquet row-group skipping (min/max
  stats are tight because of the write-time sort);
- the reference's "index files", "offset runs", "run coalescing" and
  "hierarchical index of indices" all dissolve: the directory layout
  IS the index, and a union view over per-cycle roots gives the
  hierarchy (Catalyst prunes partitions across unions).

At 100 TB: tiles are the unit of parallel write (repartition by tile
key spreads executors), bins the unit of scan skipping. Default sizes
follow production settings: 10 km bins, 100 km tiles
(index_AA_ATL06.py:37, ATL06_tiles.py:278-279).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_BIN = (10_000.0, 10_000.0)
DEFAULT_TILE = (100_000.0, 100_000.0)


def _long_bin(col: str, delta: float) -> F.Column:
    """Round-convention bin center as BIGINT meters: round(x/Δ) is an
    exact small integer in double, the long cast and integer multiply
    are exact — and signed zero cannot exist in an integer type, so the
    layout never stores a -0.0 grouping key (the round-2 footgun)."""
    if not float(delta).is_integer():
        raise ValueError(
            f"tile-store bin delta must be integral meters, got {delta}")
    return (F.round(F.col(col) / F.lit(float(delta)), 0).cast("long")
            * F.lit(int(delta)))


def with_tile_bins(df: DataFrame, bin_delta=DEFAULT_BIN, tile_delta=DEFAULT_TILE,
                   x: str = "x", y: str = "y") -> DataFrame:
    """Attach bin (round-convention center, geo_index.py:76) and tile
    (floor-convention corner, ATL06_tiles.py:41-52) key columns.
    Both are BIGINT meters: partition values must be integral, and
    integer bin keys give exact grouping/equality semantics (no ±0.0
    class, tighter Parquet min/max stats than doubles). The double
    bin-center helper (functions/binning.bin_center) remains for
    strict-filter coordinate math."""
    return (df
            .withColumn("bin_x", _long_bin(x, bin_delta[0]))
            .withColumn("bin_y", _long_bin(y, bin_delta[1]))
            .withColumn("tile_x",
                        (F.floor(F.col(x) / tile_delta[0]) * int(tile_delta[0])).cast("long"))
            .withColumn("tile_y",
                        (F.floor(F.col(y) / tile_delta[1]) * int(tile_delta[1])).cast("long")))


def write_tiles(df: DataFrame, path: str, bin_delta=DEFAULT_BIN,
                tile_delta=DEFAULT_TILE, x: str = "x", y: str = "y",
                order_cols: list[str] | None = None,
                mode: str = "overwrite") -> None:
    """Materialize a point set as the partitioned tile store
    (make_tile write loop, ATL06_tiles.py:99-106, as ONE Spark job).

    repartition by tile key → each tile written by one task (no tiny
    files); sortWithinPartitions by (bin, time) → tight Parquet
    min/max stats for bin pruning. ``partitionOverwriteMode=dynamic``
    makes per-tile recompute idempotent (the reference's queue re-runs).
    """
    order_cols = order_cols if order_cols is not None else ["delta_time"]
    keyed = with_tile_bins(df, bin_delta, tile_delta, x=x, y=y)
    (keyed
     .repartition("tile_x", "tile_y")
     .sortWithinPartitions("bin_x", "bin_y", *order_cols)
     .write
     .mode(mode)
     .option("partitionOverwriteMode", "dynamic")
     .partitionBy("tile_x", "tile_y")
     .parquet(path))


def partition_file_counts(spark: SparkSession, path: str
                          ) -> dict[tuple[int, int], int]:
    """Parquet-file count per (tile_x, tile_y) partition, from a
    METADATA-ONLY listing via the Hadoop FileSystem API (no data
    scan; works on HDFS/S3A/local alike). ~10⁴ partitions at 100 TB
    is a cheap driver-side listing."""
    jvm = spark._jvm
    root = jvm.org.apache.hadoop.fs.Path(path)
    fs = root.getFileSystem(spark._jsc.hadoopConfiguration())
    out: dict[tuple[int, int], int] = {}
    for st in fs.listStatus(root):
        name = st.getPath().getName()
        if not (st.isDirectory() and name.startswith("tile_x=")):
            continue
        tx = int(name.split("=", 1)[1])
        for st2 in fs.listStatus(st.getPath()):
            name2 = st2.getPath().getName()
            if not (st2.isDirectory() and name2.startswith("tile_y=")):
                continue
            ty = int(name2.split("=", 1)[1])
            n = sum(1 for f in fs.listStatus(st2.getPath())
                    if f.getPath().getName().endswith(".parquet"))
            out[(tx, ty)] = n
    return out


def compact_tiles(spark: SparkSession, path: str,
                  order_cols: list[str] | None = None,
                  min_files: int = 2,
                  max_tiles: int | None = 256
                  ) -> list[tuple[int, int]]:
    """Small-file compaction — the maintenance job a continuously
    ingested tile store needs: every `stream_into_tiles` micro-batch
    appends a file per touched tile, and a month of 5-minute batches
    makes ~8k files/tile, which kills scan planning and row-group
    pruning. Rewrites each fragmented partition (≥ `min_files`
    parquet files) as ONE task's output, restoring the (bin, time)
    sort order and its min/max statistics.

    Mechanics: the fragmented subset is selected by partition-pruned
    predicates, `localCheckpoint`-materialized (severing the plan's
    reference to `path`, which Spark otherwise rejects as a
    read-while-overwrite), then dynamic-partition-overwritten in
    place — untouched partitions are not rewritten. `max_tiles`
    bounds one call's batch (the checkpoint lives in executor
    storage); loop until the return value is empty to drain a large
    backlog. Returns the (tile_x, tile_y) keys compacted."""
    order_cols = order_cols if order_cols is not None else ["delta_time"]
    counts = partition_file_counts(spark, path)
    todo = sorted(k for k, n in counts.items() if n >= min_files)
    if max_tiles is not None:
        todo = todo[:max_tiles]
    if not todo:
        return []
    df = spark.read.parquet(path)
    cond = F.lit(False)
    for tx, ty in todo:
        cond = cond | ((F.col("tile_x") == tx) & (F.col("tile_y") == ty))
    sub = df.where(cond).localCheckpoint(eager=True)
    (sub.repartition("tile_x", "tile_y")
     .sortWithinPartitions("bin_x", "bin_y", *order_cols)
     .write.mode("overwrite")
     .option("partitionOverwriteMode", "dynamic")
     .partitionBy("tile_x", "tile_y")
     .parquet(path))
    return todo


def write_bucketed(df: DataFrame, table: str, path: str | None = None,
                   n_buckets: int = 32, bin_delta=DEFAULT_BIN,
                   tile_delta=DEFAULT_TILE, x: str = "x", y: str = "y",
                   order_cols: list[str] | None = None) -> None:
    """Materialize a point set as a BUCKETED catalog table on the bin
    key: `bucketBy(n, bin_x, bin_y) + sortBy` records the hash
    partitioning in the metastore, so a join or aggregation between
    two stores bucketed the same way runs with ZERO exchanges — the
    co-located-join lever for the recurring big-big joins at 100 TB
    (crossover candidates, cycle-vs-cycle diffs, index intersects)
    that `broadcast()` can't cover because neither side is small.
    Plan-asserted in tests/test_plans.py. `path` makes it an external
    table (bucketing metadata still applies)."""
    order_cols = order_cols if order_cols is not None else ["delta_time"]
    keyed = with_tile_bins(df, bin_delta, tile_delta, x=x, y=y)
    w = (keyed.write.mode("overwrite")
         .bucketBy(n_buckets, "bin_x", "bin_y")
         .sortBy("bin_x", "bin_y", *order_cols)
         .format("parquet"))
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def read_tiles(spark: SparkSession, path: str) -> DataFrame:
    """Open the tile store (read_tile, ATL06_tiles.py:109-140 — but
    lazily over the whole store; Catalyst prunes)."""
    return spark.read.parquet(path)


def query_box(spark: SparkSession, path: str, xr: tuple[float, float],
              yr: tuple[float, float], bin_delta=DEFAULT_BIN,
              tile_delta=DEFAULT_TILE, fields: list[str] | None = None,
              strict: bool = True) -> DataFrame:
    """The reference's canonical read path (query_xy_box,
    geo_index.py:387-475) as one declarative plan:

    1. tile predicate  → partition pruning (directories skipped)
    2. bin predicate   → Parquet row-group skipping via sorted stats
    3. strict residual → exact x/y box filter (geo_index strict re-filter)
    4. projection      → Parquet column pruning
    """
    df = read_tiles(spark, path)
    # tiles overlapping the box (floor corners)
    tx0 = _floor_mult(xr[0], tile_delta[0])
    tx1 = _floor_mult(xr[1], tile_delta[0])
    ty0 = _floor_mult(yr[0], tile_delta[1])
    ty1 = _floor_mult(yr[1], tile_delta[1])
    df = df.where(F.col("tile_x").between(tx0, tx1)
                  & F.col("tile_y").between(ty0, ty1))
    # bins whose centers could hold points in the box (round convention
    # → a bin centered at c covers [c-Δ/2, c+Δ/2])
    df = df.where(F.col("bin_x").between(xr[0] - bin_delta[0] / 2,
                                         xr[1] + bin_delta[0] / 2)
                  & F.col("bin_y").between(yr[0] - bin_delta[1] / 2,
                                           yr[1] + bin_delta[1] / 2))
    if strict:
        df = df.where(F.col("x").between(*xr) & F.col("y").between(*yr))
    return df.select(*fields) if fields else df


def query_bins(spark: SparkSession, path: str,
               bins: list[tuple[float, float]], pad: int = 0,
               bin_delta=DEFAULT_BIN) -> DataFrame:
    """Bin-membership probe (query_xy geo_index.py:384-395) with
    optional neighborhood dilation (pad_bins geo_index.py:591-603)."""
    if pad:
        dil = set()
        for bx, by in bins:
            for dx in range(-pad, pad + 1):
                for dy in range(-pad, pad + 1):
                    dil.add((bx + dx * bin_delta[0], by + dy * bin_delta[1]))
        bins = sorted(dil)
    df = read_tiles(spark, path)
    # layout bin keys are BIGINT meters (with_tile_bins)
    pred = F.struct(F.col("bin_x"), F.col("bin_y")).isin(
        [F.struct(F.lit(int(bx)).cast("long"), F.lit(int(by)).cast("long"))
         for bx, by in bins])
    return df.where(pred)


def bin_catalog(df: DataFrame, order_col: str | None = None) -> DataFrame:
    """The optional geo_bins catalog (SURVEY §2.4 A3, FIXTURES §2):
    per-bin bookkeeping the reference stored as index entries
    (geo_index.from_xy, geo_index.py:76-94). One groupBy, pushdown-
    friendly aggregates only."""
    aggs = [F.count(F.lit(1)).alias("n_rows"),
            F.min("x").alias("x_min"), F.max("x").alias("x_max"),
            F.min("y").alias("y_min"), F.max("y").alias("y_max")]
    if order_col:
        aggs += [F.min(order_col).alias("t_min"), F.max(order_col).alias("t_max")]
    return df.groupBy("bin_x", "bin_y").agg(*aggs)


def catalog_change_root(df: DataFrame, old_root: str, new_root: str,
                        col: str = "source_file") -> DataFrame:
    """Relocate provenance paths when a dataset moves
    (geo_index.change_root geo_index.py:193-203, fix_dir_root.py:14-22
    — there a mutation of index attrs; here one column expression over
    the catalog). Anchored prefix replace: only a leading `old_root`
    followed by a path separator is rewritten (`/old/root` never
    matches `/old/rootless/...`)."""
    import re
    pat = "^" + re.escape(old_root.rstrip("/")) + "(?=/)"
    return df.withColumn(
        col, F.regexp_replace(F.col(col), pat, new_root.rstrip("/")))


def _floor_mult(v: float, delta: float) -> int:
    import math
    return int(math.floor(v / delta) * delta)
