"""Deterministic synthetic point-cloud derivation from the driver's
TPC-H-ish tables (TESTDATA.md).

The engine's spatial operators act on (x, y, z, track…) point tables
(FIXTURES.md §1). The correctness harness, however, runs on the shared
synthetic star schema with a DuckDB oracle. Bridge: derive an
ATL06-shaped point table from ``lineitem`` using **pure integer
arithmetic** (exact in both engines, no float divergence), expressed
once as a SQL fragment that is valid in BOTH Spark SQL and DuckDB.

Columns (FIXTURES.md §1 analogy):
  row_id     unique id, also the stable sort tiebreaker
  x, y       projected coords in meters, ±100 km (integer-derived)
  h          height value (l_extendedprice — parquet doubles, exact)
  sigma      positive spread (l_quantity)
  t          along-track time (integer-derived, unique per row)
  rgt/cycle/beam_pair/lr   track identity key
  quality    0..9 (0 ≈ the reference's atl06_quality_summary==1 "bad")
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")

# Valid in both Spark SQL and DuckDB. Integer ops only (except the two
# parquet-native doubles), so both engines produce bit-identical values.
SYN_POINTS_SQL = """
SELECT
  l_orderkey * 10 + l_linenumber                                        AS row_id,
  CAST((l_partkey * 7919 + l_suppkey * 104729) % 200001 - 100000 AS DOUBLE) AS x,
  CAST((l_orderkey * 48271 + l_linenumber * 9973) % 200001 - 100000 AS DOUBLE) AS y,
  l_extendedprice                                                       AS h,
  l_quantity                                                            AS sigma,
  CAST(l_orderkey * 7 + l_linenumber AS DOUBLE)                         AS t,
  CAST(l_partkey % 100 AS INT)                                          AS rgt,
  CAST(l_suppkey % 4 + 1 AS INT)                                        AS cycle,
  CAST(l_linenumber % 3 + 1 AS INT)                                     AS beam_pair,
  CAST(l_orderkey % 2 AS INT)                                           AS lr,
  CAST(l_partkey % 10 AS INT)                                           AS quality,
  CAST((l_partkey % 41) - 20 AS DOUBLE) / 100.0                         AS slope
FROM lineitem
"""

# Synthetic *track* table for the crossover pipeline: 16 straight-line
# tracks derived from `part` (8 roughly-horizontal, 8 roughly-vertical,
# small integer drift slopes), so every h×v pair crosses exactly once
# (64 crossovers) and every coordinate/height is integer-valued —
# segment-intersection arithmetic is then bit-identical between Spark's
# NumPy kernel and the DuckDB oracle. `p_partkey <= 2000` pins the same
# track set at every scale factor.
SYN_TRACKS_SQL = """
SELECT
  CAST(p_partkey % 16 AS INT)                                   AS rgt,
  1                                                             AS cycle,
  CAST((p_partkey - p_partkey % 16) / 16 AS DOUBLE)             AS t,
  CAST(CASE WHEN p_partkey % 16 < 8
       THEN ((p_partkey - p_partkey % 16) / 16 - 62) * 400
       ELSE (p_partkey % 16 - 12) * 6000 + 500
            + ((p_partkey - p_partkey % 16) / 16 - 62) * (p_partkey % 16 - 4) * 5
       END AS DOUBLE)                                           AS x,
  CAST(CASE WHEN p_partkey % 16 < 8
       THEN (p_partkey % 16 - 4) * 6000 + 300
            + ((p_partkey - p_partkey % 16) / 16 - 62) * (p_partkey % 16 + 2) * 7
       ELSE ((p_partkey - p_partkey % 16) / 16 - 62) * 400
       END AS DOUBLE)                                           AS y,
  CAST(1000 + (p_partkey % 16) * 100
       + (p_partkey - p_partkey % 16) / 16 * 3 AS DOUBLE)       AS h
FROM part
WHERE p_partkey <= 2000
"""


def syn_tracks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The synthetic straight-line track table, as a DataFrame."""
    load_table(spark, sf_dir, "part").createOrReplaceTempView("part")
    return spark.sql(SYN_TRACKS_SQL)


def syn_tracks_cte(alias: str = "tr") -> str:
    """DuckDB-side CTE prefix producing the identical track table."""
    return f"WITH {alias} AS ({SYN_TRACKS_SQL})"


# Dedup corpus: base documents plus planted exact duplicates (every
# 7th doc re-ingested under a new id) and near-duplicates (every 11th
# doc truncated by 15 chars). Pure substr/concat → identical in both
# engines.
_SYN_CORPUS_TMPL = """
SELECT doc_id, lang, source, text FROM {base}
UNION ALL
SELECT doc_id + 100000 AS doc_id, lang, source, text
FROM {base} WHERE doc_id % 7 = 0
UNION ALL
SELECT doc_id + 200000 AS doc_id, lang, source,
       substr(text, 1, length(text) - 15) AS text
FROM {base} WHERE doc_id % 11 = 0
"""

SYN_CORPUS_SQL = _SYN_CORPUS_TMPL.format(base="documents")


def syn_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(SYN_CORPUS_SQL)


def syn_corpus_cte(alias: str = "corpus",
                   base_mod: int | None = None) -> str:
    """The planted-dup corpus CTE; with ``base_mod`` the BASE
    documents are first restricted to ``doc_id % base_mod = 0``
    (plants derive from the restricted base, so every planted dup
    still has its original present). Used by bench fixtures that
    stream a deterministic corpus subset — both engine and oracle
    must take the SAME subset, so the filter lives here."""
    if base_mod is None:
        return f"WITH {alias} AS ({SYN_CORPUS_SQL})"
    body = _SYN_CORPUS_TMPL.format(base="_syn_base")
    return (f"WITH _syn_base AS (SELECT * FROM documents "
            f"WHERE doc_id % {int(base_mod)} = 0), "
            f"{alias} AS ({body})")


# Skewed corpus: the dedup corpus plus a planted mega-cluster — 40
# verbatim copies of doc 1 under fresh ids (comma join is valid in
# both Spark SQL and DuckDB). Every LSH band key of that text gets a
# 40+-member bucket, which is the pathology the mega-bucket cap
# (operators/dedup.py drop_mega_buckets) exists for.
SYN_SKEW_CORPUS_SQL = SYN_CORPUS_SQL + """
UNION ALL
SELECT 300000 + c.doc_id AS doc_id, m.lang, m.source, m.text
FROM (SELECT lang, source, text FROM documents WHERE doc_id = 1) m,
     (SELECT doc_id FROM documents WHERE doc_id < 40) c
"""


def syn_skew_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(SYN_SKEW_CORPUS_SQL)


def syn_skew_corpus_cte(alias: str = "corpus") -> str:
    return f"WITH {alias} AS ({SYN_SKEW_CORPUS_SQL})"


# Second point source (events-derived) for union / semi / anti joins.
SYN_POINTS2_SQL = """
SELECT
  event_id                                                              AS row_id,
  CAST((user_id * 7919 + event_id * 104729) % 200001 - 100000 AS DOUBLE) AS x,
  CAST((event_id * 48271 + user_id * 9973) % 200001 - 100000 AS DOUBLE)  AS y,
  value                                                                 AS h
FROM events
"""


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # events.ts physical type has varied between rounds: under
        # timestamp[ns] this conf reads it as long ns (otherwise Spark
        # rejects the file); under timestamp[us] it no-ops and Spark
        # reads TIMESTAMP_NTZ. Consumers must NOT assume either —
        # convert via functions.timeconv.events_tus, which dispatches
        # on the dtype actually read.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_tables(spark: SparkSession, sf_dir: str,
                    tables: tuple[str, ...] = TABLES) -> None:
    for name in tables:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def syn_points(spark: SparkSession, sf_dir: str,
               extra_cols: tuple[str, ...] = ()) -> DataFrame:
    """The synthetic point table, as a DataFrame. `extra_cols` carries
    additional lineitem columns through the SAME single scan — callers
    that need a source column must not join back to lineitem (that
    re-shuffles the whole table to re-fetch what the scan already
    read)."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    sql = SYN_POINTS_SQL
    if extra_cols:
        sql = sql.replace("FROM lineitem",
                          ", " + ", ".join(extra_cols) + "\nFROM lineitem")
    return spark.sql(sql)


def syn_points2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The second (events-derived) synthetic point table."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(SYN_POINTS2_SQL)


def syn_points_cte(alias: str = "pts") -> str:
    """DuckDB-side CTE prefix producing the identical table."""
    return f"WITH {alias} AS ({SYN_POINTS_SQL})"


def syn_points_both_cte() -> str:
    return f"WITH pts AS ({SYN_POINTS_SQL}), pts2 AS ({SYN_POINTS2_SQL})"
