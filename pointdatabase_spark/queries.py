"""Declared query registry — the correctness surface of the engine.

Every implemented operator from SURVEY.md §2 registers here:
  - a Spark callable ``(spark, sf_dir) -> DataFrame`` exercising the
    engine's operator API on the shared synthetic tables, and
  - (where SQL-expressible) a DuckDB oracle SQL string computing the
    same result on the same parquet.

Column names/types are aligned on both sides (the driver hashes values
after sorting columns by name). Float aggregates that accumulate over
many rows are rounded identically on both sides to absorb
summation-order differences; single-row or integer-derived values are
compared exactly.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pointdatabase_spark import testkit
from pointdatabase_spark.functions import timeconv
from pointdatabase_spark.functions.rounding import qround as _rq
from pointdatabase_spark.functions.rounding import qround_sql as _rqs
from pointdatabase_spark.operators import filters, setops, spatial, tracks, windows
from pointdatabase_spark.partitioning import spread as _spread

QueryFn = Callable[[SparkSession, str], DataFrame]
_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn
    return deco


# Driver-coverage rotation: the driver scores a ~50-query prefix of this
# dict in iteration order, so with 60+ declared queries the tail never
# accumulates driver evidence (r4: session_window_agg and
# multimodal_features had zero driver rounds).  Queries with the least
# driver evidence go first; long-green stalwarts sit last.  COVERAGE.md
# records which round last scored each query.
_SCORE_FIRST = [
    # r12 rotation (VERDICT r11 "Next round" #1): (1) the 16 queries
    # whose latest driver evidence is r6 — the oldest tier in the
    # registry (set-union over CORRECTNESS_r01-r11); (2) queries
    # whose INTERNALS change in r12 (vocabulary rank windows
    # distributed via the slice-offset pattern, exact-cosine
    # n_blocks parameterized, pareto stitching, SNM 4th key) plus
    # paragraph_dedup_clean for the r11 perf adjudication; (3) the
    # r8-evidence tier fills the rest of the ~50-query window. The
    # r9/r10/r11-scored sets (freshest rows) fall to the back.
    # ---- new in r12 (zero driver evidence) ----
    "scd2_dim_history", "scd2_asof_lookup", "embedding_gram_audit",
    "streaming_scd2", "hybrid_rrf_search", "inverted_index_stats",
    "phrase_search", "classifier_calibration", "filter_agreement_kappa",
    "bm25_served", "bm25_index_incremental", "streaming_text_index",
    "snapshot_drift_psi", "proximity_search", "bm25_batch_served",
    "leakage_safe_split", "length_bucketed_batches",
    "boolean_search_served", "facet_counts_served",
    # ---- last scored r6 (oldest evidence) ----
    "ann_index_incremental", "ann_index_topk", "dedup_clean_corpus",
    "doc_fingerprint", "dup_span_doc_stats", "frequent_ngrams",
    "multimodal_real_decode", "multimodal_real_features",
    "multimodal_real_frames", "multimodal_real_resize",
    "price_histogram", "rollup_spike_flags", "streaming_ann_index",
    "substring_dup_spans", "text_quality_language",
    "text_token_stats",
    # ---- internals changed r12 / perf adjudication ----
    "snm_blocking_audit", "edit_distance_join", "entity_resolution",
    "pareto_frontier", "embedding_cosine_neardup",
    "embedding_cosine_neardup_blocked", "token_budget_select",
    "snapshot_drift_chi2", "paragraph_dedup_clean",
    "stratified_split_counts", "sequence_packing",
    "training_shard_stats",
    # ---- last scored r8 ----
    "bigram_lm_perplexity", "bloom_semi_join", "bpe_encode_stats",
    "bpe_train_merges", "c4_line_filter", "cluster_balanced_sample",
    "corpus_prep_v2", "cosine_topk", "dedup_clusters", "exact_dedup",
    "ivf_ann_topk", "knn_graph", "knn_join", "lsh_ann_multitable",
    "lsh_ann_topk", "minhash_lsh_capped", "minhash_lsh_neardup",
    "multimodal_gif_frames", "multimodal_jpeg_decode",
    "ngram_jaccard_capped", "ngram_jaccard_neardup",
    "paragraph_dedup", "q10_returned_items",
    "q11_important_part_volume", "q12_shipping_priority_classes",
    "q13_customer_distribution", "q14_promo_revenue",
    "q15_top_supplier", "q16_parts_supplier_count",
    "q17_small_qty_revenue", "q18_large_volume_customer",
    "q19_disjunctive_revenue", "q20_dominant_part_supplier",
    "q21_waiting_supplier", "q22_global_sales_opportunity",
    "q2_min_cost_supplier", "q4_order_priority", "q6_revenue_delta",
    "q7_volume_shipping", "q8_national_market_share",
    "q9_product_type_profit", "quality_decile_approx",
    "semantic_dedup", "semantic_dedup_stats", "simhash_neardup",
    "skew_salted_join",
    # The rest falls through in registry order (r9, then r10, then
    # the r11-scored 50 — freshest evidence last).
]


def _rotation_order(d: dict) -> dict:
    head = {n: d[n] for n in _SCORE_FIRST if n in d}
    head.update((n, v) for n, v in d.items() if n not in head)
    return head


def all_queries() -> dict[str, QueryFn]:
    return _rotation_order(_QUERIES)


def all_oracles() -> dict[str, str]:
    return _rotation_order(_ORACLES)


# --------------------------------------------------------------------------
# Flagship: TPC-H-Q1-shaped pricing summary (scan → filter → groupBy agg).
# Exercises S1 scan, P-filters, A-aggregations, and map-side partial agg.
# --------------------------------------------------------------------------

_Q1_ORACLE = """
SELECT l_returnflag, l_linestatus,
       floor((SUM(l_quantity)) * 100.0 + 0.5) / 100.0                                   AS sum_qty,
       floor((SUM(l_extendedprice)) * 100.0 + 0.5) / 100.0                              AS sum_base_price,
       floor((SUM(l_extendedprice * (1 - l_discount))) * 100.0 + 0.5) / 100.0           AS sum_disc_price,
       floor((SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax))) * 100.0 + 0.5) / 100.0 AS sum_charge,
       floor((AVG(l_quantity)) * 1000000.0 + 0.5) / 1000000.0                                   AS avg_qty,
       floor((AVG(l_extendedprice)) * 1000000.0 + 0.5) / 1000000.0                              AS avg_price,
       floor((AVG(l_discount)) * 1000000.0 + 0.5) / 1000000.0                                   AS avg_disc,
       COUNT(*)                                                    AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


@query("q1_pricing_summary", oracle=_Q1_ORACLE)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = testkit.load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (li.where(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(_rq(F.sum("l_quantity"), 2).alias("sum_qty"),
                 _rq(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
                 _rq(F.sum(disc_price), 2).alias("sum_disc_price"),
                 _rq(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
                 _rq(F.avg("l_quantity"), 6).alias("avg_qty"),
                 _rq(F.avg("l_extendedprice"), 6).alias("avg_price"),
                 _rq(F.avg("l_discount"), 6).alias("avg_disc"),
                 F.count(F.lit(1)).alias("count_order")))


_Q3_ORACLE = """
SELECT l.l_orderkey,
       floor((SUM(l.l_extendedprice * (1 - l.l_discount))) * 100.0 + 0.5) / 100.0 AS revenue,
       o.o_orderdate, o.o_orderpriority
FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1996-03-15'
  AND l.l_shipdate > TIMESTAMP '1996-03-15'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT 10
"""


@query("q3_shipping_priority", oracle=_Q3_ORACLE)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective filters reach both scans before any
    join; the join strategy is left to AQE — customer and orders both
    scale linearly with SF, so a forced broadcast hint (which
    overrides Spark's size threshold) would be a guaranteed OOM at
    100x scale.  At bench SFs AQE converts both joins to broadcast at
    runtime anyway; at cluster SF it degrades gracefully to shuffle
    joins on the keys.  Top-k plans as TakeOrderedAndProject (no
    global sort materialization); deterministic tiebreak on
    (date, orderkey)."""
    cust = testkit.load_table(spark, sf_dir, "customer")
    orders = testkit.load_table(spark, sf_dir, "orders")
    li = testkit.load_table(spark, sf_dir, "lineitem")
    cut = F.lit("1996-03-15").cast("timestamp")
    j = (li.where(F.col("l_shipdate") > cut)
         .join(orders.where(F.col("o_orderdate") < cut)
               .join(cust.where(F.col("c_mktsegment") == "BUILDING")
                     .select("c_custkey"),
                     F.col("o_custkey") == F.col("c_custkey"))
               .select("o_orderkey", "o_orderdate", "o_orderpriority"),
               F.col("l_orderkey") == F.col("o_orderkey")))
    return (j.groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
            .agg(_rq(F.sum(F.col("l_extendedprice")
                               * (1 - F.col("l_discount"))), 2)
                 .alias("revenue"))
            .select("l_orderkey", "revenue", "o_orderdate",
                    "o_orderpriority")
            .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
            .limit(10))


_Q5_ORACLE = """
SELECT n.n_name,
       floor((SUM(l.l_extendedprice * (1 - l.l_discount))) * 100.0 + 0.5) / 100.0 AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
               AND c.c_nationkey = s.s_nationkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n.n_name
ORDER BY revenue DESC, n_name
"""


@query("q5_local_supplier_volume", oracle=_Q5_ORACLE)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str
                             ) -> DataFrame:
    """TPC-H Q5 shape — the 6-way join.  Only the genuinely
    fixed-size tables carry broadcast hints (region: 5 rows, nation:
    25 rows — constants in TPC-H regardless of SF).  supplier
    (SF x 10k) and customer (SF x 150k) scale with the data, so they
    get NO hint: AQE broadcasts them at runtime while they fit under
    autoBroadcastJoinThreshold and falls back to shuffle joins at
    cluster SF instead of OOMing the driver.  Join order follows
    selectivity: region filter shrinks nation before anything touches
    the fact table."""
    cust = testkit.load_table(spark, sf_dir, "customer")
    orders = testkit.load_table(spark, sf_dir, "orders")
    li = testkit.load_table(spark, sf_dir, "lineitem")
    supp = testkit.load_table(spark, sf_dir, "supplier")
    nat = testkit.load_table(spark, sf_dir, "nation")
    reg = testkit.load_table(spark, sf_dir, "region")
    asia_nat = (nat.join(F.broadcast(
        reg.where(F.col("r_name") == "ASIA").select("r_regionkey")),
        F.col("n_regionkey") == F.col("r_regionkey"))
        .select("n_nationkey", "n_name"))
    o_win = (orders.where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp")))
        .select("o_orderkey", "o_custkey"))
    j = (li.select("l_orderkey", "l_suppkey", "l_extendedprice",
                   "l_discount")
         .join(o_win, F.col("l_orderkey") == F.col("o_orderkey"))
         .join(supp.select("s_suppkey", "s_nationkey"),
               F.col("l_suppkey") == F.col("s_suppkey"))
         .join(cust.select("c_custkey", "c_nationkey"),
               (F.col("o_custkey") == F.col("c_custkey"))
               & (F.col("c_nationkey") == F.col("s_nationkey")))
         .join(F.broadcast(asia_nat),
               F.col("s_nationkey") == F.col("n_nationkey")))
    return (j.groupBy("n_name")
            .agg(_rq(F.sum(F.col("l_extendedprice")
                               * (1 - F.col("l_discount"))), 2)
                 .alias("revenue"))
            .orderBy(F.desc("revenue"), "n_name"))


_Q6_ORACLE = """
SELECT floor((SUM(l_extendedprice * l_discount)) * 100.0 + 0.5) / 100.0 AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.04999 AND 0.07001
  AND l_quantity < 24
"""


@query("q6_revenue_delta", oracle=_Q6_ORACLE)
def q6_revenue_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: the pure scan-aggregate.  All three predicates
    and the 4-column projection reach the parquet scan (plan-asserted
    in tests/test_plans.py), so at 100 TB this reads only the row
    groups whose min/max straddle the ship-date window — no join, no
    wide shuffle, one single-row exchange for the final agg merge.
    The discount band uses epsilon-widened literals (0.04999/0.07001)
    so binary-double representability of 0.05/0.07 cannot differ
    between engines."""
    li = testkit.load_table(spark, sf_dir, "lineitem")
    return (li.where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.04999)
        & (F.col("l_discount") <= 0.07001)
        & (F.col("l_quantity") < 24))
        .agg(_rq(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue")))


_Q7_ORACLE = """
SELECT supp_nation, cust_nation, l_year,
       floor((SUM(volume)) * 100.0 + 0.5) / 100.0 AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT) AS l_year,
         l.l_extendedprice * (1 - l.l_discount) AS volume
  FROM supplier s
  JOIN lineitem l ON s.s_suppkey = l.l_suppkey
  JOIN orders o   ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
  JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
      OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
    AND l.l_shipdate >= TIMESTAMP '1996-01-01'
    AND l.l_shipdate <  TIMESTAMP '1998-01-01'
) shipping
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


@query("q7_volume_shipping", oracle=_Q7_ORACLE)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape — two-nation trade volume by year.  The nation
    pair predicate is pushed THROUGH the join graph before the fact
    table is touched: nation (25 rows, fixed size — broadcast hint is
    safe at any SF) filters supplier and customer down to 2/25 of
    their rows first, so the lineitem⨝supplier and orders⨝customer
    joins see pre-shrunk build sides.  Those survivors still scale
    with SF, so they carry NO forced-broadcast hint — AQE broadcasts
    them while small and falls back to shuffle joins at cluster SF.
    The disjunctive pair filter runs after both nation names are
    attached (2×2 candidate rows per pairing, map-side)."""
    li = testkit.load_table(spark, sf_dir, "lineitem")
    orders = testkit.load_table(spark, sf_dir, "orders")
    cust = testkit.load_table(spark, sf_dir, "customer")
    supp = testkit.load_table(spark, sf_dir, "supplier")
    nat = testkit.load_table(spark, sf_dir, "nation")
    pair = nat.where(F.col("n_name").isin("NATION_3", "NATION_7"))
    s_nat = (supp.join(F.broadcast(pair.select(
        F.col("n_nationkey").alias("s_nk"),
        F.col("n_name").alias("supp_nation"))),
        F.col("s_nationkey") == F.col("s_nk"))
        .select("s_suppkey", "supp_nation"))
    c_nat = (cust.join(F.broadcast(pair.select(
        F.col("n_nationkey").alias("c_nk"),
        F.col("n_name").alias("cust_nation"))),
        F.col("c_nationkey") == F.col("c_nk"))
        .select("c_custkey", "cust_nation"))
    j = (li.where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp")))
        .select("l_orderkey", "l_suppkey", "l_shipdate",
                "l_extendedprice", "l_discount")
        .join(s_nat, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders.select("o_orderkey", "o_custkey"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c_nat, F.col("o_custkey") == F.col("c_custkey"))
        .where(((F.col("supp_nation") == "NATION_3")
                & (F.col("cust_nation") == "NATION_7"))
               | ((F.col("supp_nation") == "NATION_7")
                  & (F.col("cust_nation") == "NATION_3"))))
    return (j.groupBy("supp_nation", "cust_nation",
                      F.year("l_shipdate").cast("long").alias("l_year"))
            .agg(_rq(F.sum(F.col("l_extendedprice")
                               * (1 - F.col("l_discount"))), 2)
                 .alias("revenue"))
            .orderBy("supp_nation", "cust_nation", "l_year"))


_Q14_ORACLE = """
SELECT floor((100.0 * SUM(CASE WHEN p_type LIKE 'PROMO%'
                              THEN l_extendedprice * (1 - l_discount)
                              ELSE 0 END)
             / SUM(l_extendedprice * (1 - l_discount))) * 10000.0 + 0.5) / 10000.0 AS promo_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-03-01'
  AND l_shipdate <  TIMESTAMP '1996-04-01'
"""


@query("q14_promo_revenue", oracle=_Q14_ORACLE)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape — conditional aggregation over a fact⨝dim
    join.  The one-month ship-date window prunes lineitem at the scan;
    part scales with SF (SF×200k in TPC-H), so it carries no forced
    broadcast — AQE picks broadcast while part fits and shuffle-join
    beyond.  Both branches of the CASE fold into ONE aggregate pass
    (no second scan for the denominator)."""
    li = testkit.load_table(spark, sf_dir, "lineitem")
    part = testkit.load_table(spark, sf_dir, "part")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    j = (li.where(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp")))
        .select("l_partkey", "l_extendedprice", "l_discount")
        .join(part.select("p_partkey", "p_type"),
              F.col("l_partkey") == F.col("p_partkey")))
    promo = F.when(F.col("p_type").startswith("PROMO"), disc).otherwise(F.lit(0.0))
    return j.agg(_rq(100.0 * F.sum(promo) / F.sum(disc), 4)
                 .alias("promo_revenue"))


_Q17_ORACLE = """
WITH brand_parts AS (
  SELECT p_partkey FROM part WHERE p_brand = 'Brand#13'
), part_lim AS (
  SELECT l_partkey, 0.2 * AVG(l_quantity) AS qty_lim
  FROM lineitem JOIN brand_parts ON l_partkey = p_partkey
  GROUP BY l_partkey
)
SELECT floor((SUM(l.l_extendedprice) / 7.0) * 100.0 + 0.5) / 100.0 AS avg_yearly
FROM lineitem l JOIN part_lim pl ON l.l_partkey = pl.l_partkey
WHERE l.l_quantity < pl.qty_lim
"""


@query("q17_small_qty_revenue", oracle=_Q17_ORACLE)
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape — correlated scalar subquery (per-part average
    quantity), decorrelated by hand the way Catalyst would: the brand
    filter is a SEMI restriction applied BEFORE the per-part aggregate,
    so the avg is computed only for the ~1/25 of parts that can ever
    match, not the whole fact table; the aggregated (partkey, 0.2*avg)
    frame then joins back to the same pre-restricted lineitem slice.
    Quantities are whole-number doubles, so SUM/AVG are exact in IEEE
    double regardless of summation order — the `< 0.2*avg` boundary
    cannot flip between engines.  At 100 TB this is two shuffles on
    l_partkey (agg + join), both over the brand-restricted slice."""
    li = testkit.load_table(spark, sf_dir, "lineitem")
    part = testkit.load_table(spark, sf_dir, "part")
    bp = (part.where(F.col("p_brand") == "Brand#13")
          .select("p_partkey"))
    li_brand = (li.select("l_partkey", "l_quantity", "l_extendedprice")
                .join(bp, F.col("l_partkey") == F.col("p_partkey"))
                .drop("p_partkey"))
    lim = (li_brand.groupBy("l_partkey")
           .agg((0.2 * F.avg("l_quantity")).alias("qty_lim"))
           .withColumnRenamed("l_partkey", "lim_partkey"))
    return (li_brand
            .join(lim, F.col("l_partkey") == F.col("lim_partkey"))
            .where(F.col("l_quantity") < F.col("qty_lim"))
            .agg(_rq(F.sum("l_extendedprice") / 7.0, 2)
                 .alias("avg_yearly")))


_Q18_ORACLE = """
WITH big AS (
  SELECT l_orderkey, SUM(l_quantity) AS s
  FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 300
)
SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
       o.o_totalprice, floor((big.s) * 100.0 + 0.5) / 100.0 AS sum_qty
FROM big
JOIN orders o   ON o.o_orderkey = big.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
LIMIT 100
"""


@query("q18_large_volume_customer", oracle=_Q18_ORACLE)
def q18_large_volume_customer(spark: SparkSession, sf_dir: str
                              ) -> DataFrame:
    """TPC-H Q18 shape — HAVING-filtered aggregate driving a semi
    restriction.  The textbook form scans lineitem twice (once for the
    IN-subquery, once for the outer SUM); since the outer group key is
    the order key, the two aggregates are the SAME aggregate, so this
    plan computes it once: one lineitem scan → groupBy(l_orderkey) →
    HAVING survivors (a handful of orders at any SF) carry their
    sum_qty forward into AQE-decided joins against orders and
    customer.  Top-k plans as TakeOrderedAndProject."""
    li = testkit.load_table(spark, sf_dir, "lineitem")
    orders = testkit.load_table(spark, sf_dir, "orders")
    cust = testkit.load_table(spark, sf_dir, "customer")
    big = (li.groupBy("l_orderkey")
           .agg(_rq(F.sum("l_quantity"), 2).alias("sum_qty"))
           .where(F.col("sum_qty") > 300))
    return (big.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
            .join(cust, F.col("c_custkey") == F.col("o_custkey"))
            .select("c_name", "c_custkey", "o_orderkey", "o_orderdate",
                    "o_totalprice", "sum_qty")
            .orderBy(F.desc("o_totalprice"), "o_orderdate", "o_orderkey")
            .limit(100))


_Q15_ORACLE = """
WITH rev AS (
  SELECT l_suppkey, floor((SUM(l_extendedprice * (1 - l_discount))) * 100.0 + 0.5) / 100.0
         AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, rev.total_revenue
FROM supplier s JOIN rev ON s.s_suppkey = rev.l_suppkey
WHERE rev.total_revenue = (SELECT MAX(total_revenue) FROM rev)
ORDER BY s_suppkey
"""


@query("q15_top_supplier", oracle=_Q15_ORACLE)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape — scalar subquery over an aggregate (suppliers
    whose quarterly revenue equals the global max).  The revenue CTE is
    computed ONCE and reused for both the max and the equality probe:
    the 1-row MAX frame comes back as a broadcast cross-join (the
    registry's standard stats-frame pattern — 1 row is broadcastable at
    any SF), so there is exactly one shuffle on l_suppkey plus the
    final supplier join.  Revenues are rounded to 2dp on BOTH the probe
    and the max before comparison, so the float-equality is between
    identically-derived doubles, not raw accumulations."""
    li = testkit.load_table(spark, sf_dir, "lineitem")
    supp = testkit.load_table(spark, sf_dir, "supplier")
    rev = (li.where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp")))
        .groupBy("l_suppkey")
        .agg(_rq(F.sum(F.col("l_extendedprice")
                           * (1 - F.col("l_discount"))), 2)
             .alias("total_revenue")))
    mx = rev.agg(F.max("total_revenue").alias("max_rev"))
    return (rev.join(F.broadcast(mx))
            .where(F.col("total_revenue") == F.col("max_rev"))
            .join(supp, F.col("s_suppkey") == F.col("l_suppkey"))
            .select("s_suppkey", "s_name", "total_revenue")
            .orderBy("s_suppkey"))


_Q4_ORACLE = """
SELECT o.o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
  AND o.o_orderdate <  TIMESTAMP '1997-04-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
GROUP BY o.o_orderpriority
ORDER BY o.o_orderpriority
"""


@query("q4_order_priority", oracle=_Q4_ORACLE)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape — EXISTS decorrelated to a LEFT SEMI join
    (lineitem shipped >90 days after the order date; the testdata has
    no l_commitdate/l_receiptdate, so lateness is date-shifted ship
    date — same correlated-predicate shape).  The one-quarter date
    window prunes orders at the scan; the semi join keys on
    l_orderkey, dedups on the join (no distinct pass), and because
    the EXISTS predicate references BOTH sides (l_shipdate vs
    o_orderdate) it rides the join condition, exactly how Catalyst
    rewrites the subquery.  At 100 TB: one shuffle pair on orderkey
    — or fewer once AQE sees the quarter-filtered orders side —
    then a 5-group agg."""
    orders = testkit.load_table(spark, sf_dir, "orders")
    li = testkit.load_table(spark, sf_dir, "lineitem")
    o = orders.where(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp")))
    late = li.select("l_orderkey", "l_shipdate")
    return (o.join(late,
                   (F.col("l_orderkey") == F.col("o_orderkey"))
                   & (F.col("l_shipdate")
                      > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")),
                   "left_semi")
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("order_count"))
            .orderBy("o_orderpriority"))


_Q13_ORACLE = """
WITH co AS (
  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
  FROM customer c
  LEFT JOIN orders o
    ON o.o_custkey = c.c_custkey
   AND o.o_orderdate >= TIMESTAMP '2001-01-01'
   AND o.o_orderpriority <> '4-NOT SPECIFIED'
  GROUP BY c.c_custkey)
SELECT c_count, count(*) AS custdist
FROM co GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


@query("q13_customer_distribution", oracle=_Q13_ORACLE)
def q13_customer_distribution(spark: SparkSession, sf_dir: str
                              ) -> DataFrame:
    """TPC-H Q13 shape — LEFT OUTER join with the filter INSIDE the
    join condition (a WHERE would turn it inner and lose the
    zero-order customers, the whole point of the query), then a
    two-level aggregation: orders-per-customer, then
    customers-per-order-count.  Both sides scale with SF so no
    broadcast hint — AQE decides.  At 100 TB: shuffle on custkey for
    join+first agg (one exchange — the agg reuses the join's
    partitioning), then a tiny second agg over |distinct counts|
    rows."""
    cust = testkit.load_table(spark, sf_dir, "customer")
    orders = testkit.load_table(spark, sf_dir, "orders")
    o = orders.select("o_orderkey", "o_custkey", "o_orderdate",
                      "o_orderpriority")
    co = (cust.select("c_custkey")
          .join(o, (F.col("o_custkey") == F.col("c_custkey"))
                & (F.col("o_orderdate")
                   >= F.lit("2001-01-01").cast("timestamp"))
                & (F.col("o_orderpriority") != "4-NOT SPECIFIED"),
                "left")
          .groupBy("c_custkey")
          .agg(F.count("o_orderkey").alias("c_count")))
    return (co.groupBy("c_count").agg(F.count("*").alias("custdist"))
            .orderBy(F.desc("custdist"), F.desc("c_count")))


_Q16_ORACLE = """
SELECT p.p_brand, p.p_type, p.p_size,
       count(DISTINCT l.l_suppkey) AS supplier_cnt
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand <> 'Brand#1'
  AND p.p_type NOT LIKE 'PROMO%'
  AND p.p_size IN (1, 4, 9, 16, 25, 36, 49)
  AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                          WHERE s_acctbal < 0)
GROUP BY p.p_brand, p.p_type, p.p_size
ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
"""


@query("q16_parts_supplier_count", oracle=_Q16_ORACLE)
def q16_parts_supplier_count(spark: SparkSession, sf_dir: str
                             ) -> DataFrame:
    """TPC-H Q16 shape — NOT IN anti-join (suppliers in bad standing
    stand in for the complaints LIKE of the original; s_suppkey is
    non-null by construction so LEFT ANTI has identical semantics to
    NOT IN) + multi-key COUNT DISTINCT.  Part predicates (<> brand,
    NOT LIKE, IN-list size) are scan-pushable; the anti side is an
    aggregate-reduced key list, broadcastable at any SF because it
    only SHRINKS with the filter.  The count-distinct plans as the
    two-level Expand-free pre-dedup: distinct (brand,type,size,
    suppkey) first, then count — Catalyst does this rewrite
    automatically for a single distinct agg."""
    li = testkit.load_table(spark, sf_dir, "lineitem")
    part = testkit.load_table(spark, sf_dir, "part")
    supp = testkit.load_table(spark, sf_dir, "supplier")
    bad = (supp.where(F.col("s_acctbal") < 0).select("s_suppkey"))
    p = part.where((F.col("p_brand") != "Brand#1")
                   & ~F.col("p_type").startswith("PROMO")
                   & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49))
    return (li.select("l_partkey", "l_suppkey")
            .join(bad, F.col("l_suppkey") == F.col("s_suppkey"),
                  "left_anti")
            .join(p.select("p_partkey", "p_brand", "p_type", "p_size"),
                  F.col("l_partkey") == F.col("p_partkey"))
            .groupBy("p_brand", "p_type", "p_size")
            .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
            .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type",
                     "p_size"))


_Q19_ORACLE = """
SELECT floor((SUM(l.l_extendedprice * (1 - l.l_discount))) * 100.0 + 0.5) / 100.0 AS revenue
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25
       AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 35
       AND l.l_quantity BETWEEN 20 AND 30)
"""


@query("q19_disjunctive_revenue", oracle=_Q19_ORACLE)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str
                            ) -> DataFrame:
    """TPC-H Q19 shape — OR-of-ANDs join predicate.  The classic
    optimizer test: each disjunct mixes part-side and lineitem-side
    conjuncts, and the win is factoring the SINGLE-side implications
    out of the OR so they push to the scans — every disjunct implies
    p_brand IN (12,23,34) and p_size BETWEEN 1 AND 35 on the part
    side and l_quantity BETWEEN 1 AND 30 on the lineitem side.  We
    state those residuals explicitly (Catalyst's
    filter-factoring of cross-table ORs is conservative), so the
    parquet scans prune first and the OR only evaluates on
    equi-join survivors.  One shuffle join on partkey, one-row
    result."""
    li = testkit.load_table(spark, sf_dir, "lineitem")
    part = testkit.load_table(spark, sf_dir, "part")
    p = (part.where(F.col("p_brand").isin("Brand#12", "Brand#23",
                                          "Brand#34")
                    & F.col("p_size").between(1, 35))
         .select("p_partkey", "p_brand", "p_size"))
    l = (li.where(F.col("l_quantity").between(1, 30))
         .select("l_partkey", "l_quantity", "l_extendedprice",
                 "l_discount"))
    d1 = ((F.col("p_brand") == "Brand#12")
          & F.col("p_size").between(1, 15)
          & F.col("l_quantity").between(1, 11))
    d2 = ((F.col("p_brand") == "Brand#23")
          & F.col("p_size").between(1, 25)
          & F.col("l_quantity").between(10, 20))
    d3 = ((F.col("p_brand") == "Brand#34")
          & F.col("p_size").between(1, 35)
          & F.col("l_quantity").between(20, 30))
    return (l.join(p, F.col("l_partkey") == F.col("p_partkey"))
            .where(d1 | d2 | d3)
            .agg(_rq(F.sum(F.col("l_extendedprice")
                               * (1 - F.col("l_discount"))), 2)
                 .alias("revenue")))


_Q21_ORACLE = """
WITH ls AS (
  SELECT l.l_orderkey, l.l_suppkey,
         max(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 120 DAY
                  THEN 1 ELSE 0 END) AS late
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
                AND o.o_orderstatus = 'F'
  GROUP BY l.l_orderkey, l.l_suppkey),
ord AS (
  SELECT l_orderkey, count(*) AS ns, sum(late) AS nl
  FROM ls GROUP BY l_orderkey)
SELECT s.s_name, count(*) AS numwait
FROM ls
JOIN ord USING (l_orderkey)
JOIN supplier s ON s.s_suppkey = ls.l_suppkey
WHERE ord.ns > 1 AND ord.nl = 1 AND ls.late = 1
GROUP BY s.s_name
ORDER BY numwait DESC, s.s_name
LIMIT 100
"""


@query("q21_waiting_supplier", oracle=_Q21_ORACLE)
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape — the hardest subquery pattern in the suite:
    EXISTS (another supplier in the order) AND NOT EXISTS (another
    LATE supplier), rewritten as ONE grouped pass the way a
    production engine decorrelates it: per (order, supplier) compute
    a late flag, per order count suppliers and late suppliers, keep
    the late supplier of multi-supplier single-late orders.  The
    double-EXISTS becomes arithmetic on two aggregates instead of
    two extra fact-table joins — and the per-order stats come from a
    WINDOW over the per-pair frame's own grouping key, so lineitem is
    scanned exactly ONCE (tests/test_plans.py pins it) instead of the
    textbook three times.  Per-order partitions are bounded by
    suppliers-per-order (≤ #lineitems of one order), so the window
    state is tiny at any SF.  Lateness is ship>order+120d (no
    receipt/commit dates in the testdata).  At 100 TB: two shuffles
    on orderkey + one terminal agg on s_name; supplier join is
    AQE-decided."""
    from pyspark.sql import Window
    li = testkit.load_table(spark, sf_dir, "lineitem")
    orders = testkit.load_table(spark, sf_dir, "orders")
    supp = testkit.load_table(spark, sf_dir, "supplier")
    o = (orders.where(F.col("o_orderstatus") == "F")
         .select("o_orderkey", "o_orderdate"))
    ls = (li.select("l_orderkey", "l_suppkey", "l_shipdate")
          .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
          .groupBy("l_orderkey", "l_suppkey")
          .agg(F.max(
              F.when(F.col("l_shipdate")
                     > F.col("o_orderdate")
                     + F.expr("INTERVAL 120 DAYS"), 1)
               .otherwise(0)).alias("late")))
    w = Window.partitionBy("l_orderkey")
    ls = ls.withColumn("ns", F.count("*").over(w)) \
           .withColumn("nl", F.sum("late").over(w))
    return (ls.where((F.col("ns") > 1) & (F.col("nl") == 1)
                     & (F.col("late") == 1))
            .join(supp, F.col("s_suppkey") == F.col("l_suppkey"))
            .groupBy("s_name")
            .agg(F.count("*").alias("numwait"))
            .orderBy(F.desc("numwait"), "s_name")
            .limit(100))


_Q22_ORACLE = """
WITH avgbal AS (
  SELECT AVG(c_acctbal) AS a FROM customer WHERE c_acctbal > 0.0),
eligible AS (
  SELECT c.c_custkey % 10 AS cust_seg, c.c_acctbal
  FROM customer c, avgbal
  WHERE c.c_acctbal > avgbal.a
    AND NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey
        AND o.o_orderpriority = '1-URGENT'
        AND o.o_orderdate >= TIMESTAMP '2000-01-01'))
SELECT cust_seg, count(*) AS numcust,
       floor((SUM(c_acctbal)) * 100.0 + 0.5) / 100.0 AS totacctbal
FROM eligible GROUP BY cust_seg ORDER BY cust_seg
"""


@query("q22_global_sales_opportunity", oracle=_Q22_ORACLE)
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str
                                 ) -> DataFrame:
    """TPC-H Q22 shape — scalar AVG subquery + NOT EXISTS anti-join
    (the testdata's customers all order, so the anti predicate is
    "no recent urgent order"; the segment key is custkey%10 in place
    of the phone country code — same plan, derivable columns).  The
    1-row average frame broadcasts (fixed size at any SF); the anti
    side is priority+date-filtered orders keyed on custkey — both
    fact-scale inputs stay hint-free for AQE.  At 100 TB: one
    broadcast, one shuffle pair on custkey for the anti join, tiny
    10-group agg."""
    cust = testkit.load_table(spark, sf_dir, "customer")
    orders = testkit.load_table(spark, sf_dir, "orders")
    avgbal = (cust.where(F.col("c_acctbal") > 0.0)
              .agg(F.avg("c_acctbal").alias("a")))
    urgent = (orders.where(
        (F.col("o_orderpriority") == "1-URGENT")
        & (F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")))
        .select("o_custkey"))
    return (cust.select("c_custkey", "c_acctbal")
            .join(F.broadcast(avgbal))
            .where(F.col("c_acctbal") > F.col("a"))
            .join(urgent, F.col("o_custkey") == F.col("c_custkey"),
                  "left_anti")
            .groupBy((F.col("c_custkey") % 10).alias("cust_seg"))
            .agg(F.count("*").alias("numcust"),
                 _rq(F.sum("c_acctbal"), 2).alias("totacctbal"))
            .orderBy("cust_seg"))


# --------------------------------------------------------------------------
# r8 wave 3: the remaining TPC-H shapes (Q2/Q8/Q9/Q10/Q11/Q12/Q20),
# completing the 22-query suite.  The testdata has no partsupp table and
# no shipmode/receiptdate/supplycost columns, so the partsupp-backed
# queries derive the supply relation from lineitem (every (partkey,
# suppkey) pair that actually shipped) — the PLAN SHAPES the originals
# exercise (correlated min, market-share conditional agg, scalar-avg
# threshold over an aggregate, nested agg-fraction semi-join) are
# preserved exactly; only the source relation is adapted.
# --------------------------------------------------------------------------

_Q2_ORACLE = """
WITH supply AS (
  SELECT l_partkey AS p_partkey, l_suppkey AS s_suppkey,
         MIN(l_extendedprice / l_quantity) AS unit_cost
  FROM lineitem GROUP BY 1, 2),
eu AS (
  SELECT s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
  FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  WHERE r.r_name = 'EUROPE'),
sc AS (
  SELECT supply.p_partkey, eu.s_name, eu.s_acctbal, eu.n_name,
         supply.unit_cost,
         MIN(supply.unit_cost) OVER (PARTITION BY supply.p_partkey)
           AS min_cost
  FROM supply JOIN eu ON supply.s_suppkey = eu.s_suppkey)
SELECT sc.s_acctbal, sc.s_name, sc.n_name, p.p_partkey, p.p_type,
       floor((sc.unit_cost) * 1000000.0 + 0.5) / 1000000.0 AS unit_cost
FROM sc JOIN part p ON sc.p_partkey = p.p_partkey
WHERE sc.unit_cost = sc.min_cost
  AND p.p_size = 15 AND p.p_type = 'STANDARD'
ORDER BY sc.s_acctbal DESC, sc.s_name, p.p_partkey
LIMIT 100
"""


@query("q2_min_cost_supplier", oracle=_Q2_ORACLE)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape — correlated scalar-min subquery ("the supplier
    whose cost IS the minimum for that part"), decorrelated the
    single-scan way: the supply relation (derived from lineitem — no
    partsupp in the testdata) is aggregated ONCE and the per-part
    minimum comes from a window over its own grouping key, so no
    second scan and no self-join.  Partitions are bounded by
    suppliers-per-part.  Part predicates (p_size, p_type) push to the
    part scan; region restriction shrinks the supplier dim before the
    fact join; nation/region get broadcast hints (fixed-size),
    everything SF-scaled stays hint-free for AQE.  Equality on the
    min is exact: MIN picks an element of the same double set on both
    engines."""
    from pyspark.sql import Window
    li = testkit.load_table(spark, sf_dir, "lineitem")
    supp = testkit.load_table(spark, sf_dir, "supplier")
    part = testkit.load_table(spark, sf_dir, "part")
    nation = testkit.load_table(spark, sf_dir, "nation")
    region = testkit.load_table(spark, sf_dir, "region")
    supply = (li.groupBy(F.col("l_partkey").alias("p_partkey"),
                         F.col("l_suppkey").alias("s_suppkey"))
              .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity"))
                   .alias("unit_cost")))
    eu = (supp.join(F.broadcast(nation),
                    F.col("s_nationkey") == F.col("n_nationkey"))
          .join(F.broadcast(region.where(F.col("r_name") == "EUROPE")),
                F.col("n_regionkey") == F.col("r_regionkey"))
          .select("s_suppkey", "s_name", "s_acctbal", "n_name"))
    w = Window.partitionBy("p_partkey")
    sc = (supply.join(eu, "s_suppkey")
          .withColumn("min_cost", F.min("unit_cost").over(w)))
    return (sc.where(F.col("unit_cost") == F.col("min_cost"))
            .join(part.where((F.col("p_size") == 15)
                             & (F.col("p_type") == "STANDARD"))
                  .select("p_partkey", "p_type"), "p_partkey")
            .select("s_acctbal", "s_name", "n_name", "p_partkey",
                    "p_type", _rq("unit_cost", 6).alias("unit_cost"))
            .orderBy(F.desc("s_acctbal"), "s_name", "p_partkey")
            .limit(100))


_Q8_ORACLE = """
SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
       floor((SUM(CASE WHEN sn.n_name = 'NATION_3'
                      THEN l.l_extendedprice * (1 - l.l_discount)
                      ELSE 0 END)
             / SUM(l.l_extendedprice * (1 - l.l_discount))) * 1000000.0 + 0.5) / 1000000.0
         AS mkt_share
FROM lineitem l
JOIN part p     ON l.l_partkey = p.p_partkey AND p.p_type = 'ECONOMY'
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
JOIN region r   ON cn.n_regionkey = r.r_regionkey
                AND r.r_name = 'AMERICA'
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
WHERE o.o_orderdate BETWEEN TIMESTAMP '1996-01-01'
                        AND TIMESTAMP '1997-12-31'
GROUP BY 1 ORDER BY 1
"""


@query("q8_national_market_share", oracle=_Q8_ORACLE)
def q8_national_market_share(spark: SparkSession, sf_dir: str
                             ) -> DataFrame:
    """TPC-H Q8 shape — national market share: an 8-way join where
    nation plays TWO roles (customer's region restricts the rows,
    supplier's nation feeds the CASE numerator), then a share =
    conditional-sum / sum conditional aggregation per year.  The two
    nation legs are separate broadcast-hinted copies (25 rows, fixed
    at any SF); part/orders/customer/supplier are SF-scaled and stay
    hint-free.  The date window pushes to the orders scan and the
    type filter to the part scan.  At 100 TB the plan is a chain of
    shuffle joins on the fact keys with two map-side broadcast
    probes and a 2-row result."""
    li = testkit.load_table(spark, sf_dir, "lineitem")
    part = testkit.load_table(spark, sf_dir, "part")
    orders = testkit.load_table(spark, sf_dir, "orders")
    cust = testkit.load_table(spark, sf_dir, "customer")
    supp = testkit.load_table(spark, sf_dir, "supplier")
    nation = testkit.load_table(spark, sf_dir, "nation")
    region = testkit.load_table(spark, sf_dir, "region")
    cn = nation.select(F.col("n_nationkey").alias("cn_key"),
                       F.col("n_regionkey").alias("cn_region"))
    sn = nation.select(F.col("n_nationkey").alias("sn_key"),
                       F.col("n_name").alias("supp_nation"))
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    j = (li.join(part.where(F.col("p_type") == "ECONOMY")
                 .select("p_partkey"),
                 F.col("l_partkey") == F.col("p_partkey"))
         .join(orders.where(
             F.col("o_orderdate").between(
                 F.lit("1996-01-01").cast("timestamp"),
                 F.lit("1997-12-31").cast("timestamp")))
               .select("o_orderkey", "o_custkey", "o_orderdate"),
               F.col("l_orderkey") == F.col("o_orderkey"))
         .join(cust.select("c_custkey", "c_nationkey"),
               F.col("o_custkey") == F.col("c_custkey"))
         .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
         .join(F.broadcast(region.where(F.col("r_name") == "AMERICA")),
               F.col("cn_region") == F.col("r_regionkey"))
         .join(supp.select("s_suppkey", "s_nationkey"),
               F.col("l_suppkey") == F.col("s_suppkey"))
         .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key")))
    return (j.withColumn("vol", vol)
            .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
            .agg(_rq(F.sum(F.when(F.col("supp_nation") == "NATION_3",
                             F.col("vol")).otherwise(0.0))
                / F.sum("vol"), 6).alias("mkt_share"))
            .orderBy("o_year"))


_Q9_ORACLE = """
SELECT n.n_name AS nation, CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
       floor((SUM(l.l_extendedprice * (1 - l.l_discount))) * 100.0 + 0.5) / 100.0 AS sum_profit
FROM lineitem l
JOIN part p     ON l.l_partkey = p.p_partkey
                AND p.p_name LIKE '%bolt%'
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
JOIN orders o   ON l.l_orderkey = o.o_orderkey
GROUP BY 1, 2 ORDER BY 1, 2 DESC
"""


@query("q9_product_type_profit", oracle=_Q9_ORACLE)
def q9_product_type_profit(spark: SparkSession, sf_dir: str
                           ) -> DataFrame:
    """TPC-H Q9 shape — profit by supplier nation and order year over
    a part-name LIKE restriction.  (The testdata has no
    ps_supplycost, so profit is the discounted revenue — the join
    graph and agg shape are Q9's.)  The LIKE '%bolt%' cannot prune
    parquet row groups (no leading prefix) but DOES evaluate in the
    scan before the join; the surviving part keys are a small
    fraction, which AQE sizes at runtime.  nation broadcast-hinted;
    part/supplier/orders hint-free.  Group count is bounded by
    nations x years — tiny at any SF."""
    li = testkit.load_table(spark, sf_dir, "lineitem")
    part = testkit.load_table(spark, sf_dir, "part")
    supp = testkit.load_table(spark, sf_dir, "supplier")
    nation = testkit.load_table(spark, sf_dir, "nation")
    orders = testkit.load_table(spark, sf_dir, "orders")
    return (li.join(part.where(F.col("p_name").contains("bolt"))
                    .select("p_partkey"),
                    F.col("l_partkey") == F.col("p_partkey"))
            .join(supp.select("s_suppkey", "s_nationkey"),
                  F.col("l_suppkey") == F.col("s_suppkey"))
            .join(F.broadcast(nation),
                  F.col("s_nationkey") == F.col("n_nationkey"))
            .join(orders.select("o_orderkey", "o_orderdate"),
                  F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy(F.col("n_name").alias("nation"),
                     F.year("o_orderdate").cast("long").alias("o_year"))
            .agg(_rq(F.sum(F.col("l_extendedprice")
                               * (1 - F.col("l_discount"))), 2)
                 .alias("sum_profit"))
            .orderBy("nation", F.desc("o_year")))


_Q10_ORACLE = """
SELECT c.c_custkey, c.c_name,
       floor((SUM(l.l_extendedprice * (1 - l.l_discount))) * 100.0 + 0.5) / 100.0 AS revenue,
       c.c_acctbal, n.n_name
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
WHERE o.o_orderdate >= TIMESTAMP '1996-10-01'
  AND o.o_orderdate <  TIMESTAMP '1997-01-01'
  AND l.l_returnflag = 'R'
GROUP BY 1, 2, 4, 5
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


@query("q10_returned_items", oracle=_Q10_ORACLE)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape — returned-item reporting: quarter of orders x
    returnflag='R' lineitems, revenue per customer, top 20.  Both
    selective filters push to their scans before any join; the
    orderkey join runs on the date-quarter survivors (~4% of orders),
    AQE-sized.  Top-k plans as TakeOrderedAndProject — no global sort
    of the customer aggregate.  nation broadcast-hinted (fixed 25
    rows)."""
    cust = testkit.load_table(spark, sf_dir, "customer")
    orders = testkit.load_table(spark, sf_dir, "orders")
    li = testkit.load_table(spark, sf_dir, "lineitem")
    nation = testkit.load_table(spark, sf_dir, "nation")
    return (li.where(F.col("l_returnflag") == "R")
            .join(orders.where(
                (F.col("o_orderdate")
                 >= F.lit("1996-10-01").cast("timestamp"))
                & (F.col("o_orderdate")
                   < F.lit("1997-01-01").cast("timestamp")))
                  .select("o_orderkey", "o_custkey"),
                  F.col("l_orderkey") == F.col("o_orderkey"))
            .join(cust.select("c_custkey", "c_name", "c_acctbal",
                              "c_nationkey"),
                  F.col("o_custkey") == F.col("c_custkey"))
            .join(F.broadcast(nation),
                  F.col("c_nationkey") == F.col("n_nationkey"))
            .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
            .agg(_rq(F.sum(F.col("l_extendedprice")
                               * (1 - F.col("l_discount"))), 2)
                 .alias("revenue"))
            .select("c_custkey", "c_name", "revenue", "c_acctbal",
                    "n_name")
            .orderBy(F.desc("revenue"), "c_custkey")
            .limit(20))


_Q11_ORACLE = """
WITH v AS (
  SELECT l.l_partkey AS p_partkey, SUM(l.l_quantity) AS part_qty
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n   ON s.s_nationkey = n.n_nationkey
  JOIN region r   ON n.n_regionkey = r.r_regionkey
                  AND r.r_name = 'EUROPE'
  GROUP BY 1)
SELECT p_partkey, part_qty
FROM v
WHERE part_qty > 1.5 * (SELECT AVG(part_qty) FROM v)
ORDER BY part_qty DESC, p_partkey
"""


@query("q11_important_part_volume", oracle=_Q11_ORACLE)
def q11_important_part_volume(spark: SparkSession, sf_dir: str
                              ) -> DataFrame:
    """TPC-H Q11 shape — an aggregate filtered by a SCALAR SUBQUERY
    over the same aggregate (parts whose regional volume exceeds 1.5x
    the average part's).  The scalar is evaluated as its own 1-row job
    and re-enters the main plan as a LITERAL — the declarative
    broadcast-join alternative duplicates the whole aggregate subtree
    (two lineitem scans in the plan, exchange reuse not guaranteed
    pre-AQE), while a 1-row driver fetch is bounded at any SF (the
    IVF-centroid pattern).  The main plan then scans lineitem exactly
    once.  Adaptations for the testdata: the supply relation is
    lineitem (no partsupp); the threshold is avg-relative rather than
    TPC-H's SF-dependent fraction constant, which keeps the predicate
    meaningful at every SF; the value metric is SUM(l_quantity),
    integral-valued doubles, so the threshold comparison is exact on
    both engines (no float-boundary flakiness).  At 100 TB: one
    shuffle to (partkey), a 1-row broadcast, and a |parts|-row
    order-by."""
    li = testkit.load_table(spark, sf_dir, "lineitem")
    supp = testkit.load_table(spark, sf_dir, "supplier")
    nation = testkit.load_table(spark, sf_dir, "nation")
    region = testkit.load_table(spark, sf_dir, "region")
    eu = (supp.join(F.broadcast(nation),
                    F.col("s_nationkey") == F.col("n_nationkey"))
          .join(F.broadcast(region.where(F.col("r_name") == "EUROPE")),
                F.col("n_regionkey") == F.col("r_regionkey"))
          .select("s_suppkey"))
    v = (li.join(eu, F.col("l_suppkey") == F.col("s_suppkey"))
         .groupBy(F.col("l_partkey").alias("p_partkey"))
         .agg(F.sum("l_quantity").alias("part_qty")))
    cut = v.agg((F.avg("part_qty") * 1.5).alias("cut")).first()["cut"]
    return (v.where(F.col("part_qty") > F.lit(cut))
            .select("p_partkey", "part_qty")
            .orderBy(F.desc("part_qty"), "p_partkey"))


_Q12_ORACLE = """
SELECT CASE WHEN date_diff('day', o.o_orderdate, l.l_shipdate) > 365
            THEN 'SLOW' ELSE 'FAST' END AS ship_bucket,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1998-01-01'
  AND l.l_shipdate <  TIMESTAMP '1999-01-01'
GROUP BY 1 ORDER BY 1
"""


@query("q12_shipping_priority_classes", oracle=_Q12_ORACLE)
def q12_shipping_priority_classes(spark: SparkSession, sf_dir: str
                                  ) -> DataFrame:
    """TPC-H Q12 shape — order-priority class counts per shipping
    class.  (No l_shipmode/receiptdate in the testdata: the shipping
    class is derived — order-to-ship latency over/under a year —
    which preserves the join + dual conditional-count shape.)  The
    ship-year filter pushes to the lineitem scan; one shuffle join on
    orderkey; 2-row result.  Everything SF-scaled is hint-free."""
    orders = testkit.load_table(spark, sf_dir, "orders")
    li = testkit.load_table(spark, sf_dir, "lineitem")
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (li.where(
        (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1999-01-01").cast("timestamp")))
        .select("l_orderkey", "l_shipdate")
        .join(orders.select("o_orderkey", "o_orderdate",
                            "o_orderpriority"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(F.when(F.datediff("l_shipdate", "o_orderdate") > 365,
                        "SLOW").otherwise("FAST").alias("ship_bucket"))
        .agg(F.sum(F.when(hi, 1).otherwise(0)).alias("high_line_count"),
             F.sum(F.when(~hi, 1).otherwise(0)).alias("low_line_count"))
        .orderBy("ship_bucket"))


_Q20_ORACLE = """
WITH sq AS (
  SELECT l_partkey, l_suppkey, SUM(l_quantity) AS supp_qty
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1999-01-01'
    AND l_shipdate <  TIMESTAMP '2000-01-01'
    AND l_partkey IN (SELECT p_partkey FROM part
                      WHERE p_name LIKE 'small%')
  GROUP BY 1, 2),
dom AS (
  SELECT l_suppkey, supp_qty,
         SUM(supp_qty) OVER (PARTITION BY l_partkey) AS part_qty
  FROM sq)
SELECT s.s_suppkey, s.s_name
FROM supplier s
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey AND r.r_name = 'ASIA'
WHERE s.s_suppkey IN (SELECT l_suppkey FROM dom
                      WHERE supp_qty > 0.1 * part_qty)
ORDER BY s_suppkey
"""


@query("q20_dominant_part_supplier", oracle=_Q20_ORACLE)
def q20_dominant_part_supplier(spark: SparkSession, sf_dir: str
                               ) -> DataFrame:
    """TPC-H Q20 shape — the nested aggregate-threshold semi-join
    chain: suppliers who shipped more than 10% of some filtered
    part's yearly volume, restricted to a region.  (availqty > half
    of sold qty in the original; the testdata has no partsupp, so
    dominance is supplier share of the part's shipped volume.)
    Decorrelated single-scan: per-(part, supplier) quantities
    aggregate once, the per-part total is a window over the SAME
    grouping key (q21's pattern — partitions bounded by
    suppliers-per-part), and the survivors semi-join into the
    region-restricted supplier dim.  The part-name restriction
    applies as a semi-join BEFORE the agg so the shuffle carries only
    matching parts.  Threshold quantities are integral-valued
    doubles — the 0.1x comparison is deterministic across engines.
    nation/region broadcast-hinted; lineitem/part/supplier
    hint-free."""
    from pyspark.sql import Window
    li = testkit.load_table(spark, sf_dir, "lineitem")
    part = testkit.load_table(spark, sf_dir, "part")
    supp = testkit.load_table(spark, sf_dir, "supplier")
    nation = testkit.load_table(spark, sf_dir, "nation")
    region = testkit.load_table(spark, sf_dir, "region")
    sq = (li.where(
        (F.col("l_shipdate") >= F.lit("1999-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("2000-01-01").cast("timestamp")))
        .join(part.where(F.col("p_name").startswith("small"))
              .select("p_partkey"),
              F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("supp_qty")))
    w = Window.partitionBy("l_partkey")
    dom = (sq.withColumn("part_qty", F.sum("supp_qty").over(w))
           .where(F.col("supp_qty") > 0.1 * F.col("part_qty"))
           .select("l_suppkey").distinct())
    return (supp.join(F.broadcast(nation),
                      F.col("s_nationkey") == F.col("n_nationkey"))
            .join(F.broadcast(region.where(F.col("r_name") == "ASIA")),
                  F.col("n_regionkey") == F.col("r_regionkey"))
            .join(dom, F.col("s_suppkey") == F.col("l_suppkey"),
                  "left_semi")
            .select("s_suppkey", "s_name")
            .orderBy("s_suppkey"))


# --------------------------------------------------------------------------
# Skew/shuffle valves (operators/joins.py): manual key salting and
# Bloom-prefiltered semi join — the 100 TB techniques the session's
# automatic machinery (AQE skew split, runtime bloom) cannot reach.
# --------------------------------------------------------------------------

from pointdatabase_spark.operators import joins as _joins  # noqa: E402

_SKEW_SALTED_ORACLE = """
WITH fact AS (
  SELECT CASE WHEN user_id % 3 = 0 THEN 0
              ELSE user_id % 97 END AS k, value
  FROM events),
dim AS (
  SELECT c_custkey % 97 AS k, MAX(c_acctbal) AS w
  FROM customer GROUP BY 1)
SELECT f.k, CAST(COUNT(*) AS BIGINT) AS n,
       floor((SUM(f.value * d.w)) * 100.0 + 0.5) / 100.0 AS weighted
FROM fact f JOIN dim d ON f.k = d.k
GROUP BY 1 ORDER BY 1
"""


@query("skew_salted_join", oracle=_SKEW_SALTED_ORACLE)
def skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key join via the manual salting rewrite
    (operators/joins.py salted_join).  The fact side is events with a
    planted hot key (a third of all rows collapse onto k=0 — the
    skew shape AQE's split cannot fix when the join feeds a per-key
    stateful stage or grouped-map cogroup); the build side is a
    per-key weight.  Salting spreads k=0's rows across 8 buckets by
    hashing the event id, replicates the 97-row build side 8x, and
    joins on (k, salt) — bit-identical to the plain join, verified by
    the oracle, with the hot key's probe work spread across 8 tasks
    instead of one.  At 100 TB the build-side replication cost is
    8 x |dim| rows — the deliberate, bounded price of the rewrite.
    (Reference parity: single-node NumPy needs no such valve;
    this belongs to the distributed execution model.)"""
    ev = testkit.load_table(spark, sf_dir, "events")
    cust = testkit.load_table(spark, sf_dir, "customer")
    fact = ev.select(
        F.expr("CASE WHEN user_id % 3 = 0 THEN 0 "
               "ELSE user_id % 97 END").alias("k"),
        "value", "event_id")
    dim = (cust.select((F.col("c_custkey") % 97).alias("k"), "c_acctbal")
           .groupBy("k").agg(F.max("c_acctbal").alias("w")))
    j = _joins.salted_join(fact, dim, ["k"], buckets=8,
                           distributor="event_id")
    return (j.groupBy("k")
            .agg(F.count("*").alias("n"),
                 _rq(F.sum(F.col("value") * F.col("w")), 2)
                 .alias("weighted"))
            .orderBy("k"))


_BLOOM_SEMI_ORACLE = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       floor((SUM(l_quantity)) * 100.0 + 0.5) / 100.0 AS sum_qty,
       CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts
FROM lineitem
WHERE l_partkey IN (SELECT p_partkey FROM part
                    WHERE p_name LIKE 'small%')
"""


@query("bloom_semi_join", oracle=_BLOOM_SEMI_ORACLE)
def bloom_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi join with a distributed Bloom pre-filter
    (operators/joins.py bloom_semi_join): lineitem restricted to the
    'small%' part keys.  The key set aggregates into a 2^17-bit
    bitmap (bit_or over 64-bit words, map-side combinable, never
    collected); three broadcast word-probes filter the fact scan
    MAP-SIDE before any exchange; the exact left-semi join removes
    the fpp-bounded false positives, so the result is exactly the
    IN-subquery — with the fact shuffle carrying only survivors.
    The 100 TB case this valve exists for: a dim key set too large
    to broadcast as a hash relation (100 M keys ~ 1.5 GB) whose
    bitmap still broadcasts (32 MB at 1% fpp)."""
    li = testkit.load_table(spark, sf_dir, "lineitem")
    part = testkit.load_table(spark, sf_dir, "part")
    dim = part.where(F.col("p_name").startswith("small"))
    j = _joins.bloom_semi_join(li, dim, "l_partkey", "p_partkey",
                               bits=1 << 17, k=3)
    return j.agg(F.count("*").alias("n_rows"),
                 _rq(F.sum("l_quantity"), 2).alias("sum_qty"),
                 F.countDistinct("l_partkey").alias("n_parts"))


# --------------------------------------------------------------------------
# Corpus cleaning (operators/cleaning.py): C4 line filter + CCNet
# paragraph dedup — sub-document cleaning stages of a training-data
# pipeline (structure synthesized deterministically; see module doc).
# --------------------------------------------------------------------------

from pointdatabase_spark.operators import cleaning as _cleaning  # noqa: E402

_C4_LINE_ORACLE = """
WITH nums AS (SELECT unnest(range(0, (SELECT CAST(ceil(MAX(length(text)) / 80.0) AS BIGINT)
                  FROM documents))) AS ln),
lines AS (
  SELECT d.doc_id, n.ln,
         substr(d.text, n.ln * 80 + 1, 80)
           || (CASE WHEN (d.doc_id + n.ln) % 3 = 0
                    THEN '' ELSE '.' END) AS line
  FROM documents d JOIN nums n ON n.ln * 80 < length(d.text))
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(keep) AS BIGINT) AS kept_lines,
       CAST(SUM(CASE WHEN keep = 1 THEN length(line) ELSE 0 END)
            AS BIGINT) AS clean_chars
FROM (SELECT doc_id, line,
             CASE WHEN substr(line, length(line), 1) = '.'
                   AND length(line)
                       - length(replace(line, ' ', '')) >= 4
                   AND line NOT LIKE '%slow%'
                  THEN 1 ELSE 0 END AS keep
      FROM lines) j
GROUP BY doc_id HAVING SUM(keep) >= 2 ORDER BY doc_id
"""


@query("c4_line_filter", oracle=_C4_LINE_ORACLE)
def c4_line_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style line-level cleaning (Raffel et al. 2020 §2.2) over
    synthesized lines: terminal-punctuation, min-word-count, and
    boilerplate-marker rules per line, then the page-level drop of
    documents keeping < 2 lines.  All rules are scan-local codegen
    string expressions (operators/cleaning.py c4_line_stats); the
    chunk explode is narrow; the only shuffle is the per-doc stats
    groupBy — at 100 TB the pass is scan-proportional with zero
    corpus-sized state.  The oracle reproduces the identical line
    synthesis via a nation-table numbers join."""
    docs = testkit.load_table(spark, sf_dir, "documents")
    return _cleaning.c4_line_stats(docs)


_PARA_DEDUP_ORACLE = testkit.syn_corpus_cte() + """,
nums AS (SELECT unnest(range(0, (SELECT CAST(ceil(MAX(length(text)) / 160.0) AS BIGINT)
                  FROM corpus))) AS pn),
paras AS (
  SELECT d.doc_id, n.pn,
         substr(d.text, n.pn * 160 + 1, 160) AS para
  FROM corpus d JOIN nums n ON n.pn * 160 < length(d.text)),
ranked AS (
  SELECT doc_id, pn,
         ROW_NUMBER() OVER (PARTITION BY para
                            ORDER BY doc_id, pn) AS rn
  FROM paras)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_paras,
       CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS uniq_paras,
       CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS dup_paras
FROM ranked GROUP BY doc_id ORDER BY doc_id
"""


@query("paragraph_dedup", oracle=_PARA_DEDUP_ORACLE)
def paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style exact paragraph dedup (Wenzek et al. 2020 §3.1)
    on the planted-duplicate corpus: the first occurrence of each
    distinct paragraph survives, later copies count as duplicates.
    The Spark plan projects paragraphs down to xxhash64 keys BEFORE
    the window exchange (operators/cleaning.py) so the shuffle
    carries 8 bytes per paragraph instead of the text — the oracle
    partitions by the paragraph itself, identical short of a 64-bit
    collision (~1e-12 at any realistic corpus)."""
    corpus = testkit.syn_corpus(spark, sf_dir)
    return _cleaning.paragraph_dedup_stats(corpus)


from pointdatabase_spark.functions import text as _text  # noqa: E402

_PARA_MAT_ORACLE = testkit.syn_corpus_cte() + r""",
nums AS (SELECT unnest(range(0, (SELECT CAST(ceil(MAX(length(text)) / 160.0) AS BIGINT)
                  FROM corpus))) AS pn),
paras AS (
  SELECT d.doc_id, n.pn, substr(d.text, n.pn * 160 + 1, 160) AS para
  FROM corpus d JOIN nums n ON n.pn * 160 < length(d.text)),
ranked AS (
  SELECT doc_id, pn, para,
         ROW_NUMBER() OVER (PARTITION BY para
                            ORDER BY doc_id, pn) AS rn
  FROM paras),
asm AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
         string_agg(para, '' ORDER BY pn) AS cleaned
  FROM ranked WHERE rn = 1 GROUP BY doc_id)
SELECT doc_id, n_kept,
       CAST(length(cleaned) AS BIGINT) AS clean_chars,
       """ + _text.duckdb_expr("fp48", "cleaned") + r""" AS fp
FROM asm ORDER BY doc_id
"""


@query("paragraph_dedup_clean", oracle=_PARA_MAT_ORACLE)
def paragraph_dedup_clean(spark: SparkSession, sf_dir: str
                          ) -> DataFrame:
    """The paragraph-dedup MATERIALIZATION
    (operators/cleaning.paragraph_dedup_materialize): the cleaned
    corpus itself, each document rebuilt from its surviving
    paragraphs in original order — fully-duplicate documents vanish.
    Reassembly is an exact ordered fold (sort_array over (pn, para)
    structs), no window over documents; verified against the oracle
    through a 48-bit md5 fingerprint of the rebuilt text plus exact
    lengths, so the byte-identical reassembly is what's checked."""
    corpus = testkit.syn_corpus(spark, sf_dir)
    out = _cleaning.paragraph_dedup_materialize(corpus)
    return out.select(
        "doc_id", "n_kept", "clean_chars",
        _text.spark_expr("fp48", "cleaned").alias("fp"))


_LM_PPL_ORACLE = """
WITH tok AS (
  SELECT doc_id, lang, string_split_regex(text, '\\s+') AS t
  FROM documents),
bgi AS (
  SELECT doc_id, lang, t, unnest(range(1, len(t))) AS i FROM tok),
bg AS (
  SELECT doc_id, lang, t[i] AS w1, t[i + 1] AS w2 FROM bgi),
ch AS (
  SELECT w1, COUNT(*) AS ch FROM bg WHERE lang = 'en' GROUP BY 1),
cb AS (
  SELECT w1, w2, COUNT(*) AS cb FROM bg WHERE lang = 'en'
  GROUP BY 1, 2),
v AS (
  SELECT COUNT(DISTINCT u) AS v
  FROM (SELECT unnest(t) AS u FROM tok WHERE lang = 'en')),
sc AS (
  SELECT b.doc_id,
         ln((COALESCE(cb.cb, 0) + 0.5)
            / (COALESCE(ch.ch, 0) + 0.5 * v.v)) AS lp
  FROM bg b
  LEFT JOIN cb ON b.w1 = cb.w1 AND b.w2 = cb.w2
  LEFT JOIN ch ON b.w1 = ch.w1
  CROSS JOIN v)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       floor((-AVG(lp)) * 1000000.0 + 0.5) / 1000000.0 AS nll,
       floor((EXP(-AVG(lp))) * 10000.0 + 0.5) / 10000.0 AS ppl
FROM sc GROUP BY doc_id ORDER BY doc_id
"""


@query("bigram_lm_perplexity", oracle=_LM_PPL_ORACLE)
def bigram_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet §3.3 LM perplexity filtering (Wenzek et al. 2020),
    trained in-engine: an add-0.5 bigram LM fit on the lang='en'
    reference slice (CCNet's Wikipedia role) scores EVERY document —
    cross-lingual docs land in the un-seen-history 1/V regime, noisy
    English in the unseen-pair regime, clean English near the MLE.
    The LM tables are vocabulary-bounded (map-side-combined counts),
    V is a 1-row broadcast frame, and the scoring join's probe side
    carries (doc_id, w1, w2) — never document text; AQE picks the
    join strategy by LM size (operators/cleaning.py
    bigram_lm_scores).  nll/ppl round at 6/4 decimals so engine
    summation order cannot flip the oracle hash."""
    docs = testkit.load_table(spark, sf_dir, "documents")
    return _cleaning.bigram_lm_scores(
        docs, docs.where(F.col("lang") == "en"))


_PREP2_ORACLE = testkit.syn_corpus_cte() + r""",
nums AS (SELECT unnest(range(0, (SELECT CAST(ceil(MAX(length(text)) / 80.0) AS BIGINT)
                  FROM corpus))) AS ln),
lines AS (
  SELECT d.doc_id, n.ln,
         substr(d.text, n.ln * 80 + 1, 80)
           || (CASE WHEN (d.doc_id + n.ln) % 3 = 0
                    THEN '' ELSE '.' END) AS line
  FROM corpus d JOIN nums n ON n.ln * 80 < length(d.text)),
c4 AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_lines,
         CAST(SUM(keep) AS BIGINT) AS kept_lines,
         CAST(SUM(CASE WHEN keep = 1 THEN length(line) ELSE 0 END)
              AS BIGINT) AS clean_chars
  FROM (SELECT doc_id, line,
               CASE WHEN substr(line, length(line), 1) = '.'
                     AND length(line)
                         - length(replace(line, ' ', '')) >= 4
                     AND line NOT LIKE '%slow%'
                    THEN 1 ELSE 0 END AS keep
        FROM lines) j
  GROUP BY doc_id HAVING SUM(keep) >= 2),
pnums AS (SELECT unnest(range(0, (SELECT CAST(ceil(MAX(length(text)) / 160.0) AS BIGINT)
                  FROM corpus))) AS pn),
paras AS (
  SELECT d.doc_id, p.pn, substr(d.text, p.pn * 160 + 1, 160) AS para
  FROM corpus d JOIN pnums p ON p.pn * 160 < length(d.text)),
pranked AS (
  SELECT doc_id, pn,
         ROW_NUMBER() OVER (PARTITION BY para
                            ORDER BY doc_id, pn) AS rn
  FROM paras),
pd AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_paras,
         CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS uniq_paras,
         CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS dup_paras
  FROM pranked GROUP BY doc_id),
ltok AS (SELECT doc_id, lang, string_split_regex(text, '\s+') AS t
         FROM corpus),
lbgi AS (SELECT doc_id, lang, t, unnest(range(1, len(t))) AS i
         FROM ltok),
lbg AS (SELECT doc_id, lang, t[i] AS w1, t[i + 1] AS w2 FROM lbgi),
lch AS (SELECT w1, COUNT(*) AS ch FROM lbg WHERE lang = 'en'
        GROUP BY 1),
lcb AS (SELECT w1, w2, COUNT(*) AS cb FROM lbg WHERE lang = 'en'
        GROUP BY 1, 2),
lv AS (SELECT COUNT(DISTINCT u) AS v
       FROM (SELECT unnest(t) AS u FROM ltok WHERE lang = 'en')),
lsc AS (
  SELECT b.doc_id,
         ln((COALESCE(lcb.cb, 0) + 0.5)
            / (COALESCE(lch.ch, 0) + 0.5 * lv.v)) AS lp
  FROM lbg b
  LEFT JOIN lcb ON b.w1 = lcb.w1 AND b.w2 = lcb.w2
  LEFT JOIN lch ON b.w1 = lch.w1
  CROSS JOIN lv),
lm AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
              floor((-AVG(lp)) * 1000000.0 + 0.5) / 1000000.0 AS nll,
              floor((EXP(-AVG(lp))) * 10000.0 + 0.5) / 10000.0 AS ppl
       FROM lsc GROUP BY doc_id)
SELECT c4.doc_id, n_lines, kept_lines, clean_chars,
       n_paras, uniq_paras, dup_paras, n_bigrams, nll, ppl
FROM c4 JOIN pd USING (doc_id) JOIN lm USING (doc_id)
WHERE dup_paras * 2 <= n_paras AND nll <= 3.5
ORDER BY doc_id
"""


@query("corpus_prep_v2", oracle=_PREP2_ORACLE)
def corpus_prep_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capstone for the r8 cleaning stack — the CCNet/C4 order of
    operations composed end-to-end on the planted-duplicate corpus:
    C4 line rules with the page-level drop, paragraph dedup dropping
    majority-duplicate pages (the planted verbatim copies die here;
    first occurrences survive), and the in-engine bigram-LM
    perplexity gate (trained on the corpus's lang='en' slice,
    threshold on the 6-dp-rounded score so the cut is deterministic
    across engines).  Composition is STATS-LEVEL: each stage scans
    the corpus once and reduces to per-doc rows; the three joins
    move skinny aggregates keyed by doc_id, never document text —
    at 100 TB this is three scans plus doc-count-sized joins."""
    corpus = testkit.syn_corpus(spark, sf_dir)
    c4 = _cleaning.c4_line_stats(corpus)
    pdd = _cleaning.paragraph_dedup_stats(corpus)
    lm = _cleaning.bigram_lm_scores(
        corpus, corpus.where(F.col("lang") == "en"))
    return (c4.join(pdd, "doc_id").join(lm, "doc_id")
            .where((F.col("dup_paras") * 2 <= F.col("n_paras"))
                   & (F.col("nll") <= 3.5))
            .orderBy("doc_id"))


_KNN_GRAPH_ORACLE = testkit.syn_points_cte() + """
, sub AS (SELECT row_id, x, y FROM pts
          WHERE x BETWEEN 0 AND 20000 AND y BETWEEN 0 AND 20000),
cand AS (
  SELECT q.row_id AS q_id, p.row_id AS nbr_id,
         (p.x - q.x) * (p.x - q.x)
           + (p.y - q.y) * (p.y - q.y) AS dist2
  FROM sub q JOIN sub p
    ON p.row_id <> q.row_id
   AND (p.x - q.x) * (p.x - q.x)
         + (p.y - q.y) * (p.y - q.y) <= 6250000.0),
ranked AS (
  SELECT q_id, nbr_id, dist2,
         ROW_NUMBER() OVER (PARTITION BY q_id
                            ORDER BY dist2, nbr_id) AS rn
  FROM cand)
SELECT q_id, nbr_id, CAST(rn AS INT) AS nn_rank, dist2
FROM ranked WHERE rn <= 4 ORDER BY q_id, nn_rank
"""


@query("knn_graph", oracle=_KNN_GRAPH_ORACLE)
def knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN GRAPH (self-join mode of spatial.knn_join): the 4 nearest
    other points within 5 km of EVERY point in a 30 km box — the
    build step for graph-based methods (mesh neighbors, label prop,
    density estimates).  Unlike `knn_join`'s user-bounded probe
    batch, the query side here is SF-scaled, so the operator runs
    UNHINTED (broadcast_queries=False) and AQE picks the bin-key
    join strategy — it broadcasts while small and degrades to a
    shuffle join at cluster SF instead of a forced-broadcast OOM
    (the q3/q5 de-hinting lesson applied at birth).  Self matches
    are excluded BEFORE ranking on both engines."""
    pts = testkit.syn_points(spark, sf_dir)
    sub = (spatial.box_query(pts, (0.0, 20000.0), (0.0, 20000.0))
           .select("row_id", "x", "y"))
    return (spatial.knn_join(
                sub, sub.select(F.col("row_id").alias("q_id"),
                                "x", "y"),
                k=4, radius=2500.0, broadcast_queries=False,
                exclude_self=True)
            .orderBy("q_id", "nn_rank"))


_GRID_CLUSTER_ORACLE = testkit.syn_points_cte().replace(
    "WITH ", "WITH RECURSIVE ", 1) + """
, cells AS (SELECT CAST(floor(x / 10000) AS BIGINT) AS cx,
                   CAST(floor(y / 10000) AS BIGINT) AS cy,
                   COUNT(*) AS n
            FROM pts GROUP BY 1, 2),
dense AS (SELECT cx * 4294967296 + (cy + 2147483648) AS id, cx, cy, n
          FROM cells WHERE n >= 165),
edges AS (SELECT a.id AS u, b.id AS v FROM dense a JOIN dense b
          ON abs(a.cx - b.cx) <= 1 AND abs(a.cy - b.cy) <= 1
         AND a.id <> b.id),
reach(id, r) AS (
  SELECT id, id FROM dense
  UNION
  SELECT e.u, reach.r FROM edges e JOIN reach ON reach.id = e.v),
lab AS (SELECT id, MIN(r) AS cluster_id FROM reach GROUP BY id)
SELECT l.cluster_id, CAST(COUNT(*) AS BIGINT) AS n_cells,
       CAST(SUM(d.n) AS BIGINT) AS n_points,
       MIN(d.cx) AS cx_min, MAX(d.cx) AS cx_max,
       MIN(d.cy) AS cy_min, MAX(d.cy) AS cy_max
FROM lab l JOIN dense d ON d.id = l.id
GROUP BY 1 ORDER BY 1
"""


@query("grid_cluster", oracle=_GRID_CLUSTER_ORACLE)
def grid_cluster_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid-density clustering (operators/spatial.grid_cluster — the
    grid formulation of DBSCAN): 10 km cells holding >= 165 points
    are dense, 8-adjacent dense cells merge via the dedup family's
    pointer-jumping connected components (O(log diameter) rounds),
    and per-cluster extent/population stats come back keyed by the
    component-min cell id.  Points shuffle ONCE (the cell count);
    everything downstream is cell-table-sized.  The oracle computes
    the same components with a recursive min-reachability CTE —
    closure is cells-squared-bounded, fine at oracle scale, which is
    exactly why the ENGINE side uses pointer jumping instead."""
    pts = testkit.syn_points(spark, sf_dir)
    return spatial.grid_cluster(pts, delta=10000.0, min_pts=165)


_RESAMPLE_ORACLE = testkit.syn_points_cte() + """
, p AS (SELECT rgt, CAST(t AS BIGINT) AS t, MAX(h) AS h
        FROM pts WHERE h IS NOT NULL AND t IS NOT NULL GROUP BY 1, 2),
r AS (SELECT rgt, MIN(t) AS t0, MAX(t) AS t1 FROM p GROUP BY rgt),
g AS (SELECT rgt, k * 1000 AS gt
      FROM (SELECT rgt,
                   unnest(range(CAST(ceil(t0 / 1000.0) AS BIGINT),
                                CAST(floor(t1 / 1000.0) AS BIGINT) + 1))
                     AS k
            FROM r)),
b AS (SELECT g.rgt, g.gt, MAX(p.t) AS tb
      FROM g JOIN p ON p.rgt = g.rgt AND p.t <= g.gt GROUP BY 1, 2),
fwd AS (SELECT g.rgt, g.gt, MIN(p.t) AS tf
        FROM g JOIN p ON p.rgt = g.rgt AND p.t >= g.gt GROUP BY 1, 2)
SELECT b.rgt, b.gt, b.tb AS t_before, fwd.tf AS t_after,
       floor((CASE WHEN fwd.tf = b.tb THEN pb.h
              ELSE pb.h + (pf.h - pb.h) * (b.gt - b.tb)
                   / (fwd.tf - b.tb) END) * 1000000.0 + 0.5)
         / 1000000.0 AS h_interp
FROM b JOIN fwd ON b.rgt = fwd.rgt AND b.gt = fwd.gt
JOIN p pb ON pb.rgt = b.rgt AND pb.t = b.tb
JOIN p pf ON pf.rgt = fwd.rgt AND pf.t = fwd.tf
ORDER BY b.rgt, b.gt
"""


@query("track_resample", oracle=_RESAMPLE_ORACLE)
def track_resample_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Along-track resampling (operators/tracks.track_resample):
    linear interpolation of h onto a fixed 1000-unit grid per track —
    the regular-sampling step the reference's per-track kernels feed.
    Grid size is span/step per track (a narrow sequence over a
    per-track aggregate, never point-count-sized); the bracketing
    samples come from TWO single-exchange as-of joins (backward +
    forward, operators/temporal.py — no range-join candidate
    blowup); interpolation is scan-local.  The oracle brute-forces
    the brackets with inequality joins; the engine's asof path must
    agree exactly, including grid points landing ON a sample
    (t_before == t_after)."""
    pts = testkit.syn_points(spark, sf_dir)
    return (tracks.track_resample(pts, step=1000)
            .orderBy("rgt", "gt"))


# --------------------------------------------------------------------------
# P4 box query — the canonical spatial read path (geo_index.query_xy_box).
# --------------------------------------------------------------------------

_BOX = ((-50000.0, 25000.0), (-10000.0, 80000.0))

_BOX_ORACLE = testkit.syn_points_cte() + f"""
SELECT row_id, x, y, h
FROM pts
WHERE x BETWEEN {_BOX[0][0]} AND {_BOX[0][1]}
  AND y BETWEEN {_BOX[1][0]} AND {_BOX[1][1]}
"""


@query("box_query", oracle=_BOX_ORACLE)
def box_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = testkit.syn_points(spark, sf_dir)
    return spatial.box_query(pts, _BOX[0], _BOX[1], fields=["row_id", "x", "y", "h"])


# --------------------------------------------------------------------------
# A1 blockmedian — exact tie rule (pt_blockmedian.py:37-57).
# --------------------------------------------------------------------------

_BM_ORACLE = testkit.syn_points_cte() + """
, d AS (
  SELECT CAST(floor(x / 10000) AS BIGINT) AS cell_x,
         CAST(floor(y / 10000) AS BIGINT) AS cell_y,
         x, y, h,
         row_number() OVER (PARTITION BY floor(x / 10000), floor(y / 10000)
                            ORDER BY h, row_id) AS rn,
         count(*)    OVER (PARTITION BY floor(x / 10000), floor(y / 10000)) AS n
  FROM pts)
SELECT cell_x, cell_y,
       AVG(x) AS x, AVG(y) AS y, AVG(h) AS h,
       CAST(MAX(n) AS BIGINT) AS n_in_cell
FROM d
WHERE CASE WHEN n % 2 = 0
           THEN rn >= floor(n / 2) AND rn <= floor(n / 2) + 1
           ELSE rn = greatest(floor(n / 2), 1) END
GROUP BY cell_x, cell_y
"""


@query("blockmedian_10km", oracle=_BM_ORACLE)
def blockmedian_10km(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = testkit.syn_points(spark, sf_dir)
    return spatial.blockmedian(pts, delta=10000.0, x="x", y="y", z="h",
                               order_col="row_id")


# A1 true-median opt-out (operators/spatial.py tie_rule="true_median"):
# the statistically-correct odd rule — 0-based middle (n-1)/2 — pinned
# so both documented rules have oracle coverage.

_BM_TRUE_ORACLE = testkit.syn_points_cte() + """
, d AS (
  SELECT CAST(floor(x / 10000) AS BIGINT) AS cell_x,
         CAST(floor(y / 10000) AS BIGINT) AS cell_y,
         x, y, h,
         row_number() OVER (PARTITION BY floor(x / 10000), floor(y / 10000)
                            ORDER BY h, row_id) AS rn,
         count(*)    OVER (PARTITION BY floor(x / 10000), floor(y / 10000)) AS n
  FROM pts)
SELECT cell_x, cell_y,
       AVG(x) AS x, AVG(y) AS y, AVG(h) AS h,
       CAST(MAX(n) AS BIGINT) AS n_in_cell
FROM d
WHERE CASE WHEN n % 2 = 0
           THEN rn >= floor(n / 2) AND rn <= floor(n / 2) + 1
           ELSE rn = floor((n + 1) / 2) END
GROUP BY cell_x, cell_y
"""


@query("blockmedian_true_median", oracle=_BM_TRUE_ORACLE)
def blockmedian_true_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = testkit.syn_points(spark, sf_dir)
    return spatial.blockmedian(pts, delta=10000.0, x="x", y="y", z="h",
                               order_col="row_id", tie_rule="true_median")


# A1 `return_index` variant (pt_blockmedian.py:48-56): also report the
# source rows that produced each cell's median — the two bracketing
# row ids (equal when the cell count is odd). Realized through the
# operator's extra_aggs hook over the middle rows.

_BM_INDEX_ORACLE = testkit.syn_points_cte() + """
, d AS (
  SELECT CAST(floor(x / 10000) AS BIGINT) AS cell_x,
         CAST(floor(y / 10000) AS BIGINT) AS cell_y,
         x, y, h, row_id,
         row_number() OVER (PARTITION BY floor(x / 10000), floor(y / 10000)
                            ORDER BY h, row_id) AS rn,
         count(*)    OVER (PARTITION BY floor(x / 10000), floor(y / 10000)) AS n
  FROM pts)
SELECT cell_x, cell_y,
       AVG(h) AS h,
       MIN(row_id) AS ind0, MAX(row_id) AS ind1,
       CAST(MAX(n) AS BIGINT) AS n_in_cell
FROM d
WHERE CASE WHEN n % 2 = 0
           THEN rn >= floor(n / 2) AND rn <= floor(n / 2) + 1
           ELSE rn = greatest(floor(n / 2), 1) END
GROUP BY cell_x, cell_y
"""


@query("blockmedian_index", oracle=_BM_INDEX_ORACLE)
def blockmedian_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = testkit.syn_points(spark, sf_dir)
    return spatial.blockmedian(
        pts, delta=10000.0, x="x", y="y", z="h", order_col="row_id",
        extra_aggs=[F.min("_ord").alias("ind0"),
                    F.max("_ord").alias("ind1")],
    ).select("cell_x", "cell_y", "h", "ind0", "ind1", "n_in_cell")


# --------------------------------------------------------------------------
# A2 blockmax — argmax row per cell (blockmax.py:10-31). The z used is
# made unique (h + row_id·1e-6, exact in IEEE double) so the argmax is
# well-defined in both engines.
# --------------------------------------------------------------------------

_BMAX_ORACLE = testkit.syn_points_cte() + """
, d AS (SELECT x, y, h + row_id / 1000000.0 AS zz FROM pts)
SELECT CAST(floor(x / 10000) AS BIGINT) AS cell_x,
       CAST(floor(y / 10000) AS BIGINT) AS cell_y,
       arg_max(x, zz) AS x, arg_max(y, zz) AS y, MAX(zz) AS zz,
       COUNT(*) AS n_in_cell
FROM d
GROUP BY cell_x, cell_y
"""


@query("blockmax_10km", oracle=_BMAX_ORACLE)
def blockmax_10km(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = testkit.syn_points(spark, sf_dir).withColumn(
        "zz", F.col("h") + F.col("row_id") / F.lit(1000000.0))
    return spatial.blockmax(pts, delta=10000.0, x="x", y="y", z="zz")


# --------------------------------------------------------------------------
# A8 extent — min/max bounds (geo_index.py:516-523).
# --------------------------------------------------------------------------

_EXTENT_ORACLE = testkit.syn_points_cte() + """
SELECT MIN(x) AS x_min, MAX(x) AS x_max, MIN(y) AS y_min, MAX(y) AS y_max
FROM pts
"""


@query("extent_bounds", oracle=_EXTENT_ORACLE)
def extent_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spatial.extent(testkit.syn_points(spark, sf_dir))


# --------------------------------------------------------------------------
# P9/W2 seg-difference filter — lag/lead consistency window
# (ATL06_filters.py:29-51). Pure IEEE +/*/abs → exact cross-engine match.
# --------------------------------------------------------------------------

_TRACK = ["cycle", "rgt", "beam_pair", "lr"]
# (t, h) is a unique key of lineitem at every sf — deterministic window order
_TRACK_W = "PARTITION BY cycle, rgt, beam_pair, lr ORDER BY t, h"

_SEGDIFF_ORACLE = testkit.syn_points_cte() + f"""
, d AS (
  SELECT row_id, h, slope,
         lead(h) OVER ({_TRACK_W}) AS h_next,
         lag(h)  OVER ({_TRACK_W}) AS h_prev,
         count(*) OVER (PARTITION BY cycle, rgt, beam_pair, lr) AS n
  FROM pts)
SELECT row_id,
       (n < 3) OR
       (greatest(coalesce(abs(h + 20.0 * slope - h_next), 0.0),
                 coalesce(abs(h_prev - (h - 20.0 * slope)), 0.0)) < 2.0)
       AS seg_diff_ok
FROM d
"""


@query("seg_difference_filter", oracle=_SEGDIFF_ORACLE)
def seg_difference_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = testkit.syn_points(spark, sf_dir)
    out = filters.seg_difference_mask(pts, _TRACK, ["t", "h"], h="h", slope="slope",
                                      tol=2.0, d_at=20.0)
    return out.select("row_id", "seg_diff_ok")


# --------------------------------------------------------------------------
# W1 rss_along_track_dh / W3 min_along_track_dh (ATL06_data.py:356-382).
# --------------------------------------------------------------------------

_MISFIT_CTE = testkit.syn_points_cte() + f"""
, d AS (
  SELECT row_id, h, slope, t,
         h - slope * (t - lag(t)  OVER ({_TRACK_W})) - lag(h)  OVER ({_TRACK_W}) AS prev_m,
         h - slope * (t - lead(t) OVER ({_TRACK_W})) - lead(h) OVER ({_TRACK_W}) AS next_m
  FROM pts)
"""

_RSS_ORACLE = _MISFIT_CTE + """
SELECT row_id,
       sqrt(coalesce(prev_m * prev_m, 0.0) + coalesce(next_m * next_m, 0.0))
       AS rss_along_track_dh
FROM d
"""


@query("window_rss_along_track", oracle=_RSS_ORACLE)
def window_rss_along_track(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = testkit.syn_points(spark, sf_dir)
    out = windows.rss_along_track_dh(pts, _TRACK, ["t", "h"], h="h", x="t", slope="slope")
    return out.select("row_id", "rss_along_track_dh")


_MIN_ORACLE = _MISFIT_CTE + """
SELECT row_id,
       CASE WHEN prev_m IS NULL THEN abs(next_m)
            WHEN next_m IS NULL THEN abs(prev_m)
            WHEN abs(prev_m) < abs(next_m) THEN abs(prev_m)
            ELSE abs(next_m) END AS min_along_track_dh
FROM d
"""


@query("window_min_along_track", oracle=_MIN_ORACLE)
def window_min_along_track(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = testkit.syn_points(spark, sf_dir)
    out = windows.min_along_track_dh(pts, _TRACK, ["t", "h"], h="h", x="t", slope="slope")
    return out.select("row_id", "min_along_track_dh")


# --------------------------------------------------------------------------
# P7 quality summary + P11 NULL-out, all three application modes
# (ATL06_filters.py:53-70, ATL06_tiles.py:65-66).
# --------------------------------------------------------------------------

_QUAL_ORACLE = testkit.syn_points_cte() + """
, d AS (
  SELECT row_id, h,
         (sigma / 50.0 < 1) AND (sigma / 40.0 < 1) AND (quality / 100.0 < 0.02)
         AS good
  FROM pts)
SELECT row_id, good AS valid,
       CASE WHEN good THEN h END AS h_masked
FROM d
"""


@query("quality_filter_modes", oracle=_QUAL_ORACLE)
def quality_filter_modes(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = (testkit.syn_points(spark, sf_dir)
           .withColumn("h_robust_sprd", F.col("sigma") / 50.0)
           .withColumn("h_li_sigma", F.col("sigma") / 40.0)
           .withColumn("snr_significance", F.col("quality") / 100.0)
           .withColumn("h_masked", F.col("h")))
    mask = filters.quality_summary_mask()
    out = filters.with_mask(pts, mask, "valid")
    out = filters.null_out(out, F.col("valid"), "h_masked")
    return out.select("row_id", "valid", "h_masked")


# --------------------------------------------------------------------------
# P8 photon-density + P10 FPB glitch filters (subset mode).
# --------------------------------------------------------------------------

_DENSITY_ORACLE = testkit.syn_points_cte() + """
SELECT row_id
FROM pts
WHERE sigma / (quality + 1.0) >
      (CASE WHEN lr = 1 THEN 4.0 ELSE 1.0 END)
"""


@query("ph_density_filter", oracle=_DENSITY_ORACLE)
def ph_density_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = (testkit.syn_points(spark, sf_dir)
           .withColumn("w_win", F.col("quality") + F.lit(1.0))
           .withColumn("beam_type",
                       F.when(F.col("lr") == 1, "strong").otherwise("weak")))
    mask = filters.ph_density_mask(n_fit_photons="sigma",
                                   w_surface_window_final="w_win",
                                   beam_type="beam_type")
    return filters.subset(pts, mask).select("row_id")


_FPB_ORACLE = testkit.syn_points_cte() + """
SELECT row_id FROM pts WHERE sigma <= quality * 4.0
"""


@query("fpb_glitch_filter", oracle=_FPB_ORACLE)
def fpb_glitch_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = testkit.syn_points(spark, sf_dir).withColumn(
        "fpb_n_corr", F.col("quality") * F.lit(4.0))
    mask = filters.fpb_glitch_mask(n_fit_photons="sigma", fpb_n_corr="fpb_n_corr")
    return filters.subset(pts, mask).select("row_id")


# --------------------------------------------------------------------------
# A5 track reconstruction summary (ATL06_tiles.py:142-160).
# --------------------------------------------------------------------------

_TRACKSUM_ORACLE = testkit.syn_points_cte() + """
SELECT cycle, rgt, beam_pair, lr,
       COUNT(*) AS n_rows, MIN(t) AS t_min, MAX(t) AS t_max
FROM pts
GROUP BY cycle, rgt, beam_pair, lr
"""


@query("track_summary", oracle=_TRACKSUM_ORACLE)
def track_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = testkit.syn_points(spark, sf_dir)
    return tracks.track_summary(pts, _TRACK, order_col="t")


# --------------------------------------------------------------------------
# A4 pair collapse (ATL06_pair.py:10-25): mean coords/time,
# dh_dy_sigma = sqrt(Σσ²)/|Δy|. x/y/t/σ are integer-valued doubles →
# exact sums; h is rounded identically on both sides.
# --------------------------------------------------------------------------

_PAIR_ORACLE = testkit.syn_points_cte() + """
SELECT rgt, cycle, beam_pair,
       AVG(x) AS x, AVG(y) AS y, AVG(t) AS delta_time,
       floor((AVG(h)) * 1000000.0 + 0.5) / 1000000.0 AS h_mean,
       CASE WHEN MAX(y) <> MIN(y)
            THEN sqrt(SUM(sigma * sigma)) / abs(MAX(y) - MIN(y)) END
         AS dh_dy_sigma,
       COUNT(*) AS n_beams
FROM pts
GROUP BY rgt, cycle, beam_pair
"""


@query("pair_collapse", oracle=_PAIR_ORACLE)
def pair_collapse(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = testkit.syn_points(spark, sf_dir)
    out = tracks.pair_collapse(pts, ["rgt", "cycle", "beam_pair"],
                               x_atc="x", y_atc="y", h="h", h_sigma="sigma",
                               delta_time="t")
    return out.withColumn("h_mean", _rq(F.col("h_mean"), 6))


# --------------------------------------------------------------------------
# U1 unionByName concat with missing-column NULL fill
# (point_data.from_list, point_data.py:182-204).
# --------------------------------------------------------------------------

_UNION_ORACLE = testkit.syn_points_both_cte() + """
SELECT row_id, x, y, h, sigma, 'li' AS src FROM pts
UNION ALL
SELECT row_id, x, y, h, CAST(NULL AS DOUBLE) AS sigma, 'ev' AS src FROM pts2
"""


@query("union_by_name", oracle=_UNION_ORACLE)
def union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = testkit.syn_points(spark, sf_dir).select(
        "row_id", "x", "y", "h", "sigma").withColumn("src", F.lit("li"))
    b = testkit.syn_points2(spark, sf_dir).select(
        "row_id", "x", "y", "h").withColumn("src", F.lit("ev"))
    return setops.concat([a, b])


# --------------------------------------------------------------------------
# J1/J2 bin semi-join + J6 anti-join + U2/U3 key ops on 10-km index bins
# (geo_index.intersect / from_list, round-bin convention).
# --------------------------------------------------------------------------

_BIN_CTE = testkit.syn_points_both_cte() + """
, b1 AS (SELECT row_id, round(x / 10000) * 10000 AS bin_x,
                round(y / 10000) * 10000 AS bin_y FROM pts)
, b2 AS (SELECT DISTINCT round(x / 10000) * 10000 AS bin_x,
                round(y / 10000) * 10000 AS bin_y FROM pts2)
"""

_SEMI_ORACLE = _BIN_CTE + """
SELECT row_id FROM b1
WHERE EXISTS (SELECT 1 FROM b2 WHERE b2.bin_x = b1.bin_x AND b2.bin_y = b1.bin_y)
"""


@query("bin_semi_join", oracle=_SEMI_ORACLE)
def bin_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = spatial.with_bins(testkit.syn_points(spark, sf_dir), (10000.0, 10000.0))
    b = spatial.with_bins(testkit.syn_points2(spark, sf_dir), (10000.0, 10000.0))
    return setops.semi_join(a, b, ["bin_x", "bin_y"]).select("row_id")


_ANTI_ORACLE = _BIN_CTE + """
SELECT row_id FROM b1
WHERE NOT EXISTS (SELECT 1 FROM b2 WHERE b2.bin_x = b1.bin_x AND b2.bin_y = b1.bin_y)
"""


@query("bin_anti_join", oracle=_ANTI_ORACLE)
def bin_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = spatial.with_bins(testkit.syn_points(spark, sf_dir), (10000.0, 10000.0))
    b = spatial.with_bins(testkit.syn_points2(spark, sf_dir), (10000.0, 10000.0))
    return setops.anti_join(a, b, ["bin_x", "bin_y"]).select("row_id")


# Bin keys are emitted as BIGINT meters: DuckDB's round(DOUBLE)
# preserves -0.0 while Spark's HALF_UP round yields +0.0, so the
# origin bin would hash differently as a double. CAST(x AS BIGINT)
# collapses both signed zeros to 0 in both engines.
_INTERSECT_ORACLE = _BIN_CTE + """
SELECT CAST(bin_x AS BIGINT) AS bin_x, CAST(bin_y AS BIGINT) AS bin_y
FROM (SELECT bin_x, bin_y FROM b1 INTERSECT SELECT bin_x, bin_y FROM b2)
"""


@query("bin_key_intersect", oracle=_INTERSECT_ORACLE)
def bin_key_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = spatial.with_bins(testkit.syn_points(spark, sf_dir), (10000.0, 10000.0))
    b = spatial.with_bins(testkit.syn_points2(spark, sf_dir), (10000.0, 10000.0))
    return setops.key_intersect(a, b, ["bin_x", "bin_y"]).select(
        F.col("bin_x").cast("long").alias("bin_x"),
        F.col("bin_y").cast("long").alias("bin_y"))


# --------------------------------------------------------------------------
# Pad dilation (geo_index.pad_bins / dilate_bins): 3×3 bin neighborhood.
# --------------------------------------------------------------------------

_PAD_ORACLE = testkit.syn_points_cte() + """
, b AS (SELECT DISTINCT round(x / 10000) * 10000 AS bin_x,
                        round(y / 10000) * 10000 AS bin_y
        FROM pts
        WHERE x BETWEEN -20000 AND 20000 AND y BETWEEN -20000 AND 20000)
SELECT DISTINCT b.bin_x + ox.o AS bin_x, b.bin_y + oy.o AS bin_y
FROM b
CROSS JOIN (VALUES (-10000.0), (0.0), (10000.0)) ox(o)
CROSS JOIN (VALUES (-10000.0), (0.0), (10000.0)) oy(o)
"""


@query("pad_dilation", oracle=_PAD_ORACLE)
def pad_dilation(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = testkit.syn_points(spark, sf_dir)
    core = spatial.box_query(pts, (-20000.0, 20000.0), (-20000.0, 20000.0))
    bins = spatial.with_bins(core, (10000.0, 10000.0)).select(
        "bin_x", "bin_y").distinct()
    return spatial.pad_bins(bins, (10000.0, 10000.0), pad=1)


# --------------------------------------------------------------------------
# O5 nearest-point top-1 (IndexPicker argmin; orderBy(dist).limit(1)).
# --------------------------------------------------------------------------

_NEAREST_ORACLE = testkit.syn_points_cte() + """
SELECT row_id, x, y,
       (x - 12345.0) * (x - 12345.0) + (y + 54321.0) * (y + 54321.0) AS dist2
FROM pts
ORDER BY dist2, row_id
LIMIT 1
"""


@query("nearest_point", oracle=_NEAREST_ORACLE)
def nearest_point(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = testkit.syn_points(spark, sf_dir)
    dist2 = ((F.col("x") - 12345.0) * (F.col("x") - 12345.0)
             + (F.col("y") + 54321.0) * (F.col("y") + 54321.0))
    return (pts.withColumn("dist2", dist2)
            .orderBy("dist2", "row_id").limit(1)
            .select("row_id", "x", "y", "dist2"))


_KNN_ORACLE = testkit.syn_points_both_cte() + """
, q AS (SELECT row_id AS q_id, x AS qx, y AS qy
        FROM pts2 WHERE row_id < 40),
cand AS (
  SELECT q.q_id, p.row_id AS nbr_id,
         (p.x - q.qx) * (p.x - q.qx)
           + (p.y - q.qy) * (p.y - q.qy) AS dist2
  FROM q JOIN pts p
    ON (p.x - q.qx) * (p.x - q.qx)
         + (p.y - q.qy) * (p.y - q.qy) <= 100000000.0),
ranked AS (
  SELECT q_id, nbr_id, dist2,
         ROW_NUMBER() OVER (PARTITION BY q_id
                            ORDER BY dist2, nbr_id) AS rn
  FROM cand)
SELECT q_id, nbr_id, CAST(rn AS INT) AS nn_rank, dist2
FROM ranked WHERE rn <= 8 ORDER BY q_id, nn_rank
"""


@query("knn_join", oracle=_KNN_ORACLE)
def knn_join_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Radius-bounded k-NN join (operators/spatial.knn_join): the 8
    nearest points within 10 km of each of a 40-point query batch —
    the multi-neighbor generalization of O5's argmin (IndexPicker).
    The engine floor-bins both sides at the radius, explodes the
    query batch to its 3x3 neighbor cells, broadcasts it (the batch
    is user-bounded, not SF-bounded), and ranks candidates per query
    — the data table never shuffles; the oracle is the brute-force
    all-pairs distance join.  Coordinates are integer-valued doubles,
    so dist2 is exact on both engines and the (dist2, nbr_id) tie
    rule is deterministic."""
    pts = testkit.syn_points(spark, sf_dir)
    q = (testkit.syn_points2(spark, sf_dir)
         .where(F.col("row_id") < 40)
         .select(F.col("row_id").alias("q_id"), "x", "y"))
    return (spatial.knn_join(pts, q, k=8, radius=10000.0)
            .orderBy("q_id", "nn_rank"))


# --------------------------------------------------------------------------
# S10/S11/S7/S8 tile-store pipeline: write bin-partitioned parquet, read
# back through the pruned box-query path; result must equal a direct
# filter (the reference's index build + query_xy_box roundtrip §3.1-3.2).
# --------------------------------------------------------------------------

_TILE_ORACLE = testkit.syn_points_cte() + """
SELECT row_id, x, y, h
FROM pts
WHERE x BETWEEN -35000 AND 42000 AND y BETWEEN -90000 AND -10000
"""


@query("tile_store_box_query", oracle=_TILE_ORACLE)
def tile_store_box_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from pointdatabase_spark.sources import tile_store
    path = f"/tmp/pdb_tiles_{os.path.basename(sf_dir.rstrip('/'))}"
    pts = testkit.syn_points(spark, sf_dir)
    tile_store.write_tiles(pts, path, order_cols=["t"])
    return tile_store.query_box(spark, path, (-35000.0, 42000.0),
                                (-90000.0, -10000.0),
                                fields=["row_id", "x", "y", "h"])


# --------------------------------------------------------------------------
# Bucketed co-located bin join: two stores bucketed on the bin key
# join/aggregate with zero shuffle exchanges (the big-big join lever;
# plan-asserted in tests/test_plans.py). Result = per-bin point counts
# from both sources over bins where both have data.
# --------------------------------------------------------------------------

_BUCKETED_ORACLE = testkit.syn_points_both_cte() + """
, a AS (SELECT CAST(round(x / 10000) * 10000 AS BIGINT) AS bin_x,
               CAST(round(y / 10000) * 10000 AS BIGINT) AS bin_y,
               COUNT(*) AS n_a
        FROM pts GROUP BY 1, 2),
b AS (SELECT CAST(round(x / 10000) * 10000 AS BIGINT) AS bin_x,
             CAST(round(y / 10000) * 10000 AS BIGINT) AS bin_y,
             COUNT(*) AS n_b
      FROM pts2 GROUP BY 1, 2)
SELECT a.bin_x, a.bin_y, a.n_a, b.n_b
FROM a JOIN b ON a.bin_x = b.bin_x AND a.bin_y = b.bin_y
"""


@query("bucketed_bin_join", oracle=_BUCKETED_ORACLE)
def bucketed_bin_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from pointdatabase_spark.sources import tile_store
    tag = os.path.basename(sf_dir.rstrip("/"))
    ta, tb = f"pdb_bkt_a_{tag}".replace(".", "_"), \
        f"pdb_bkt_b_{tag}".replace(".", "_")
    tile_store.write_bucketed(testkit.syn_points(spark, sf_dir), ta,
                              f"/tmp/{ta}", order_cols=["t"])
    pts2 = testkit.syn_points2(spark, sf_dir).withColumn(
        "t", F.col("row_id").cast("double"))
    tile_store.write_bucketed(pts2, tb, f"/tmp/{tb}", order_cols=["t"])
    a = (spark.table(ta).groupBy("bin_x", "bin_y")
         .agg(F.count(F.lit(1)).alias("n_a")))
    b = (spark.table(tb).groupBy("bin_x", "bin_y")
         .agg(F.count(F.lit(1)).alias("n_b")))
    return a.join(b, ["bin_x", "bin_y"]).select(
        "bin_x", "bin_y", "n_a", "n_b")


# --------------------------------------------------------------------------
# A3 bin catalog (geo_index.from_xy bookkeeping, FIXTURES §2).
# --------------------------------------------------------------------------

# Layout bin keys are BIGINT meters natively (tile_store.with_tile_bins)
# — no query-side cast needed; signed zero cannot exist in an integer key.
_CATALOG_ORACLE = testkit.syn_points_cte() + """
SELECT CAST(round(x / 10000) * 10000 AS BIGINT) AS bin_x,
       CAST(round(y / 10000) * 10000 AS BIGINT) AS bin_y,
       COUNT(*) AS n_rows,
       MIN(x) AS x_min, MAX(x) AS x_max,
       MIN(y) AS y_min, MAX(y) AS y_max,
       MIN(t) AS t_min, MAX(t) AS t_max
FROM pts
GROUP BY bin_x, bin_y
"""


@query("bin_catalog", oracle=_CATALOG_ORACLE)
def bin_catalog_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pointdatabase_spark.sources import tile_store
    keyed = tile_store.with_tile_bins(testkit.syn_points(spark, sf_dir))
    return tile_store.bin_catalog(keyed, order_col="t")


# --------------------------------------------------------------------------
# F5 time conversions (matlab datenum / decimal year) + F3 bin-key
# encode/decode roundtrip. Pure arithmetic — exact.
# --------------------------------------------------------------------------

_TIMES_ORACLE = testkit.syn_points_cte() + """
SELECT row_id,
       737061.0 + t / 86400.0 AS matlab_atlas,
       730486.0 + t / 86400.0 AS matlab_j2k,
       ((730486.0 + t / 86400.0) - 730486.0) / 365.25 + 2000.0 AS dec_year,
       CAST(round(x / 10000) * 10000 AS BIGINT) || '_' ||
       CAST(round(y / 10000) * 10000 AS BIGINT) AS bin_key,
       CAST((l_partkey >> 2) & 7 AS BIGINT) AS bits_2_3
FROM (SELECT p.*, l.l_partkey
      FROM pts p JOIN lineitem l
        ON l.l_orderkey * 10 + l.l_linenumber = p.row_id
       AND l.l_extendedprice = p.h)
"""


@query("scalar_time_bits_keys", oracle=_TIMES_ORACLE)
def scalar_time_bits_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pointdatabase_spark.functions import binning, bits
    # l_partkey rides the point-derivation scan itself — joining back
    # to lineitem to re-fetch a column the scan already read would
    # shuffle the whole table twice (measured 1.8x slower at sf0.1)
    pts = testkit.syn_points(spark, sf_dir, extra_cols=("l_partkey",))
    matlab = timeconv.delta_t_to_matlab("t")
    return pts.select(
        "row_id",
        timeconv.atlas_delta_time_to_matlab("t").alias("matlab_atlas"),
        matlab.alias("matlab_j2k"),
        timeconv.matlab_to_year(matlab).alias("dec_year"),
        binning.bin_key(binning.bin_center("x", 10000.0),
                        binning.bin_center("y", 10000.0)).alias("bin_key"),
        bits.ibits("l_partkey", 2, 3).alias("bits_2_3"))


# --------------------------------------------------------------------------
# F4 date-from-filename → Matlab datenum / decimal year (WV_date.py).
# Filenames synthesized from o_orderdate; the extraction + datenum
# arithmetic is the operator under test.
# --------------------------------------------------------------------------

_WVDATE_ORACLE = """
WITH f AS (
  SELECT o_orderkey,
         'WV01_' || strftime(o_orderdate, '%Y%m%d') || '_seg1.tif' AS fname
  FROM orders)
SELECT o_orderkey,
       CAST(date_diff('day', DATE '0001-01-01', d) + 367 AS DOUBLE) AS matlab_day,
       2000.0 + date_diff('day', DATE '2000-01-01', d) / 365.25 AS dec_year
FROM (SELECT o_orderkey,
             make_date(CAST(regexp_extract(fname, '_(\\d\\d\\d\\d)(\\d\\d)(\\d\\d)_', 1) AS INT),
                       CAST(regexp_extract(fname, '_(\\d\\d\\d\\d)(\\d\\d)(\\d\\d)_', 2) AS INT),
                       CAST(regexp_extract(fname, '_(\\d\\d\\d\\d)(\\d\\d)(\\d\\d)_', 3) AS INT)) AS d,
             o_orderkey
      FROM f)
"""


@query("date_from_filename", oracle=_WVDATE_ORACLE)
def date_from_filename_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pointdatabase_spark.functions import timeconv
    orders = testkit.load_table(spark, sf_dir, "orders")
    f = orders.select(
        "o_orderkey",
        F.concat(F.lit("WV01_"), F.date_format("o_orderdate", "yyyyMMdd"),
                 F.lit("_seg1.tif")).alias("fname"))
    d = timeconv.date_from_filename("fname", pattern=r"_(\d\d\d\d)(\d\d)(\d\d)_")
    return f.select("o_orderkey",
                    timeconv.date_to_matlab(d).alias("matlab_day"),
                    timeconv.date_to_decimal_year(d).alias("dec_year"))


# --------------------------------------------------------------------------
# J3/J4/J7/A6/A7 crossover analysis end-to-end (SURVEY §3.3) on the
# synthetic straight-line track table (16 tracks, 64 h×v crossings).
# Oracle: exact all-pairs segment intersection in SQL, mirroring the
# kernel's arithmetic term-for-term (integer-valued inputs make every
# double op bit-identical across engines).
# --------------------------------------------------------------------------

_XOVER_ORACLE = testkit.syn_tracks_cte() + """
, seg AS (
  SELECT CAST(rgt AS VARCHAR) AS tid, t, x, y, h,
         lead(x) OVER w AS x2, lead(y) OVER w AS y2,
         lead(h) OVER w AS h2, lead(t) OVER w AS t2
  FROM tr WINDOW w AS (PARTITION BY rgt ORDER BY t)
), cand AS (
  SELECT a.tid AS tid_a, b.tid AS tid_b,
         a.x AS ax, a.y AS ay, a.h AS ah, a.t AS ta1,
         a.x2 AS ax2, a.y2 AS ay2, a.h2 AS ah2, a.t2 AS ta2,
         b.x AS bx, b.y AS by, b.h AS bh, b.t AS tb1,
         b.x2 AS bx2, b.y2 AS by2, b.h2 AS bh2, b.t2 AS tb2,
         (a.x2 - a.x) AS dpx, (a.y2 - a.y) AS dpy,
         (b.x2 - b.x) AS dqx, (b.y2 - b.y) AS dqy,
         (a.x - b.x) AS d0x, (a.y - b.y) AS d0y
  FROM seg a JOIN seg b ON a.tid < b.tid
  WHERE a.x2 IS NOT NULL AND b.x2 IS NOT NULL
), sol AS (
  SELECT *,
         -(d0x * dqy - d0y * dqx) / (dpx * dqy - dpy * dqx) AS la,
         -(d0x * dpy - d0y * dpx) / (dpx * dqy - dpy * dqx) AS lb
  FROM cand
  WHERE dpx * dqy - dpy * dqx <> 0
)
SELECT tid_a, tid_b,
       ax + la * dpx AS x, ay + la * dpy AS y,
       la AS l_a, lb AS l_b,
       ta1 * (1 - la) + ta2 * la AS t_a,
       tb1 * (1 - lb) + tb2 * lb AS t_b,
       ah * (1 - la) + ah2 * la AS h_a,
       bh * (1 - lb) + bh2 * lb AS h_b,
       ((ah - ah2) * (by - by2) - (bh - bh2) * (ay - ay2))
         / ((ax - ax2) * (by - by2) - (bx - bx2) * (ay - ay2)) AS slope_x,
       ((ax - ax2) * (bh - bh2) - (bx - bx2) * (ah - ah2))
         / ((ax - ax2) * (by - by2) - (bx - bx2) * (ay - ay2)) AS slope_y,
       (bh * (1 - lb) + bh2 * lb) - (ah * (1 - la) + ah2 * la) AS delta_h,
       ((ah * (1 - la) + ah2 * la) + (bh * (1 - lb) + bh2 * lb)) / 2 AS bar_h
FROM sol
WHERE la >= 0 AND la < 1 AND lb >= 0 AND lb < 1
"""


@query("crossover_analysis", oracle=_XOVER_ORACLE)
def crossover_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pointdatabase_spark.operators import crossover
    tr = testkit.syn_tracks(spark, sf_dir)
    return crossover.crossovers(tr, ["rgt"], delta_coarse=1000.0)


# --------------------------------------------------------------------------
# Training-data-pipeline text analysis over `documents` (token counting,
# quality scoring, language-ID heuristic, fingerprints). All pure
# built-in expressions (functions/text.py) — JVM-side, codegen'd — with
# DuckDB oracles rendered from the SAME templates.
# --------------------------------------------------------------------------

from pointdatabase_spark.functions import text as _text  # noqa: E402

_TOKSTATS_ORACLE = f"""
SELECT doc_id,
       {_text.duckdb_expr('n_chars_calc', 'text')}     AS n_chars_calc,
       {_text.duckdb_expr('n_tokens', 'text')}         AS n_tokens,
       {_text.duckdb_expr('n_tokens_bpe', 'text')}     AS n_tokens_bpe,
       {_text.duckdb_expr('n_distinct_tokens', 'text')} AS n_distinct_tokens,
       {_text.duckdb_expr('mean_token_len', 'text')}   AS mean_token_len
FROM documents
"""


@query("text_token_stats", oracle=_TOKSTATS_ORACLE)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    # per-doc tokenize folds are CPU-bound: widen the one-file scan,
    # and split ONCE per row (token features share the `_toks` array)
    docs = _text.with_tokens(
        _spread(testkit.load_table(spark, sf_dir, "documents")), "text")
    return docs.select(
        "doc_id",
        _text.spark_expr("n_chars_calc", "text").alias("n_chars_calc"),
        _text.spark_expr("n_tokens", "text", "_toks").alias("n_tokens"),
        _text.spark_expr("n_tokens_bpe", "text").alias("n_tokens_bpe"),
        _text.spark_expr("n_distinct_tokens", "text", "_toks").alias("n_distinct_tokens"),
        _text.spark_expr("mean_token_len", "text", "_toks").alias("mean_token_len"))


_QUALITY_ORACLE = f"""
SELECT doc_id, lang,
       {_text.duckdb_expr('stop_ratio', 'text')}  AS stop_ratio,
       {_text.duckdb_expr('punct_ratio', 'text')} AS punct_ratio,
       {_text.duckdb_expr('alpha_ratio', 'text')} AS alpha_ratio,
       {_text.quality_score_sql('text')}          AS quality,
       {_text.language_id_sql('text')}            AS lang_pred
FROM documents
"""


@query("text_quality_language", oracle=_QUALITY_ORACLE)
def text_quality_language(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _text.with_tokens(
        _spread(testkit.load_table(spark, sf_dir, "documents")), "text")
    return docs.select(
        "doc_id", "lang",
        _text.spark_expr("stop_ratio", "text", "_toks").alias("stop_ratio"),
        _text.spark_expr("punct_ratio", "text").alias("punct_ratio"),
        _text.spark_expr("alpha_ratio", "text").alias("alpha_ratio"),
        _text.quality_score("text", "_toks").alias("quality"),
        _text.language_id("text", "_toks").alias("lang_pred"))


_FPRINT_ORACLE = f"""
SELECT doc_id,
       {_text.duckdb_expr('fp48', 'text')}            AS fp48,
       {_text.duckdb_expr('rolling_fp', 'text')}      AS rolling_fp,
       {_text.duckdb_expr('min_shingle_md5', 'text')} AS min_shingle_md5
FROM documents
"""


@query("doc_fingerprint", oracle=_FPRINT_ORACLE)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _text.with_tokens(
        _spread(testkit.load_table(spark, sf_dir, "documents")), "text")
    return docs.select(
        "doc_id",
        _text.spark_expr("fp48", "text").alias("fp48"),
        _text.spark_expr("rolling_fp", "text", "_toks").alias("rolling_fp"),
        _text.spark_expr("min_shingle_md5", "text", "_toks").alias("min_shingle_md5"))


# ANALYZE-style column profile over lineitem (operators/profile.py):
# null/distinct/min/max per column in ONE aggregation pass, unpivoted
# with `stack`. COUNT(DISTINCT) is the exact oracle-checkable mode;
# approx_count_distinct is the documented 100 TB path.
_PROFILE_COLS = ["l_orderkey", "l_quantity", "l_extendedprice",
                 "l_discount", "l_tax"]

_PROFILE_ORACLE = "\nUNION ALL\n".join(f"""
SELECT '{c}' AS col_name,
       CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_null,
       CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
       CAST(MIN({c}) AS DOUBLE) AS vmin,
       CAST(MAX({c}) AS DOUBLE) AS vmax
FROM lineitem""" for c in _PROFILE_COLS)


@query("table_profile", oracle=_PROFILE_ORACLE)
def table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pointdatabase_spark.operators import profile as _prof
    li = testkit.load_table(spark, sf_dir, "lineitem")
    return _prof.profile_columns(li, _PROFILE_COLS)


_DQ_ORACLE = """
SELECT 'li_discount_range' AS rule,
       CAST(COALESCE(SUM(CASE WHEN l_discount < 0 OR l_discount > 0.1
                          THEN 1 ELSE 0 END), 0) AS BIGINT) AS violations
FROM lineitem
UNION ALL
SELECT 'li_quantity_le_30',
       CAST(COALESCE(SUM(CASE WHEN l_quantity > 30 THEN 1 ELSE 0 END),
                     0) AS BIGINT)
FROM lineitem
UNION ALL
SELECT 'li_returnflag_domain',
       CAST(COALESCE(SUM(CASE WHEN l_returnflag NOT IN ('A','N','R')
                          THEN 1 ELSE 0 END), 0) AS BIGINT)
FROM lineitem
UNION ALL
SELECT 'li_shipdate_not_null',
       CAST(COALESCE(SUM(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0
                          END), 0) AS BIGINT)
FROM lineitem
UNION ALL
SELECT 'orders_custkey_not_null',
       CAST(COALESCE(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0
                          END), 0) AS BIGINT)
FROM orders
UNION ALL
SELECT 'orders_orderkey_unique',
       CAST(COALESCE(SUM(CASE WHEN n > 1 THEN n END), 0) AS BIGINT)
FROM (SELECT o_orderkey, COUNT(*) AS n FROM orders GROUP BY 1)
UNION ALL
SELECT 'orders_custkey_ri', CAST(COUNT(*) AS BIGINT)
FROM orders o ANTI JOIN customer c ON o.o_custkey = c.c_custkey
UNION ALL
SELECT 'lineitem_orderkey_ri', CAST(COUNT(*) AS BIGINT)
FROM lineitem l ANTI JOIN orders o ON l.l_orderkey = o.o_orderkey
"""


@query("data_quality_report", oracle=_DQ_ORACLE)
def data_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expectations validation (operators/profile.scalar_dq /
    duplicate_key_count / ref_integrity_count): null, range, and
    accepted-value rules fused into ONE aggregation pass per table,
    key uniqueness as a two-level aggregate (no Expand), and
    referential integrity as anti-join counts — the pre-training
    data-contract gate. Every part reduces to rule-granularity rows
    before the union, so the report moves |rules| rows total."""
    from pointdatabase_spark.operators import profile as _prof
    li = testkit.load_table(spark, sf_dir, "lineitem")
    orders = testkit.load_table(spark, sf_dir, "orders")
    cust = testkit.load_table(spark, sf_dir, "customer")
    li_rules = _prof.scalar_dq(li, [
        ("li_discount_range", (F.col("l_discount") < 0)
         | (F.col("l_discount") > 0.1)),
        ("li_quantity_le_30", F.col("l_quantity") > 30),
        ("li_returnflag_domain",
         ~F.col("l_returnflag").isin("A", "N", "R")),
        ("li_shipdate_not_null", F.col("l_shipdate").isNull()),
    ])
    o_rules = _prof.scalar_dq(orders, [
        ("orders_custkey_not_null", F.col("o_custkey").isNull()),
    ])
    return _prof.dq_report([
        li_rules, o_rules,
        _prof.duplicate_key_count(orders, "orders_orderkey_unique",
                                  ["o_orderkey"]),
        _prof.ref_integrity_count(orders, "orders_custkey_ri",
                                  "o_custkey", cust, "c_custkey"),
        _prof.ref_integrity_count(li, "lineitem_orderkey_ri",
                                  "l_orderkey", orders, "o_orderkey"),
    ])


_DECILE_PS = [i / 10.0 for i in range(1, 10)]

_DECILE_ORACLE = f"""
WITH q AS (SELECT doc_id, {{qsql}} AS quality FROM documents),
th AS (SELECT {", ".join(
    f"floor((quantile_cont(quality, {p!r})) * 1000000000.0 + 0.5) / 1000000000.0 AS t{i}"
    for i, p in enumerate(_DECILE_PS))} FROM q),
b AS (SELECT q.doc_id, q.quality,
             {" + ".join(
    f"(CASE WHEN q.quality > th.t{i} THEN 1 ELSE 0 END)"
    for i in range(9))} AS decile
      FROM q, th)
SELECT CAST(decile AS BIGINT) AS decile,
       COUNT(*) AS n_docs,
       floor((MIN(quality)) * 1000000.0 + 0.5) / 1000000.0 AS q_min,
       floor((MAX(quality)) * 1000000.0 + 0.5) / 1000000.0 AS q_max
FROM b GROUP BY decile
"""


@query("quality_decile_census")
def quality_decile_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum binning: assign each document a quality DECILE by
    comparing its score against exact percentile thresholds (rounded
    to 9 decimals on both engines so the decision boundary is
    deterministic), then census the bins. Value-based bucketing — not
    a global NTILE window, which would drag the whole corpus into ONE
    window partition; here the nine thresholds reduce via one
    percentile aggregate and broadcast back (1-row crossJoin), so the
    corpus never shuffles. approx_percentile swaps in for the
    threshold pass at 100 TB (table_profile precedent)."""
    docs = _text.with_tokens(
        _spread(testkit.load_table(spark, sf_dir, "documents")), "text")
    q = docs.select("doc_id",
                    _text.quality_score("text", "_toks").alias("quality"))
    th = q.agg(*[_rq(F.expr(
        f"percentile(quality, {p!r})"), 9).alias(f"t{i}")
        for i, p in enumerate(_DECILE_PS)])
    b = q.crossJoin(F.broadcast(th))
    decile = sum((F.col("quality") > F.col(f"t{i}")).cast("int")
                 for i in range(9))
    return (b.withColumn("decile", decile.cast("long"))
            .groupBy("decile")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 _rq(F.min("quality"), 6).alias("q_min"),
                 _rq(F.max("quality"), 6).alias("q_max")))


_ORACLES["quality_decile_census"] = _DECILE_ORACLE.format(
    qsql=_text.quality_score_sql("text"))


_DECILE_APPROX_ORACLE = f"""
WITH q AS (SELECT doc_id, {{qsql}} AS quality FROM documents),
th AS (SELECT {", ".join(
    f"floor((quantile_disc(quality, {p!r})) * 1000000000.0 + 0.5) / 1000000000.0 AS t{i}"
    for i, p in enumerate(_DECILE_PS))} FROM q),
b AS (SELECT q.doc_id, q.quality,
             {" + ".join(
    f"(CASE WHEN q.quality > th.t{i} THEN 1 ELSE 0 END)"
    for i in range(9))} AS decile
      FROM q, th)
SELECT CAST(decile AS BIGINT) AS decile,
       COUNT(*) AS n_docs,
       floor((MIN(quality)) * 1000000.0 + 0.5) / 1000000.0 AS q_min,
       floor((MAX(quality)) * 1000000.0 + 0.5) / 1000000.0 AS q_max
FROM b GROUP BY decile
"""


@query("quality_decile_approx")
def quality_decile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The documented 100 TB mode of :func:`quality_decile_census`
    as its own green row (VERDICT r6 item 7): decile thresholds from
    `approx_percentile` (a Greenwald-Khanna sketch — map-combinable
    partial aggregates, bounded memory per partition) instead of the
    exact `percentile` sort.  Same value-bucketing census shape —
    thresholds broadcast back via a 1-row crossJoin, the corpus never
    shuffles.

    Oracle parity: approx_percentile always returns an ELEMENT of
    the dataset, and at accuracy A the rank error is <= n/A rows —
    with A = 1e6 and test-SF corpora (n <= 5e4) the sketch keeps
    every sample and returns the exact order statistic at rank
    ceil(p*n), which is precisely DuckDB's quantile_disc (verified
    empirically at sf0.01: identical values).  At true 100 TB the
    thresholds become approximate within the sketch bound and the
    census is approximately-binned by design."""
    docs = _text.with_tokens(
        _spread(testkit.load_table(spark, sf_dir, "documents")), "text")
    q = docs.select("doc_id",
                    _text.quality_score("text", "_toks").alias("quality"))
    th = q.agg(*[_rq(F.expr(
        f"approx_percentile(quality, {p!r}, 1000000)"), 9)
        .alias(f"t{i}") for i, p in enumerate(_DECILE_PS)])
    b = q.crossJoin(F.broadcast(th))
    decile = sum((F.col("quality") > F.col(f"t{i}")).cast("int")
                 for i in range(9))
    return (b.withColumn("decile", decile.cast("long"))
            .groupBy("decile")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 _rq(F.min("quality"), 6).alias("q_min"),
                 _rq(F.max("quality"), 6).alias("q_max")))


_ORACLES["quality_decile_approx"] = _DECILE_APPROX_ORACLE.format(
    qsql=_text.quality_score_sql("text"))


_HIST_LO, _HIST_HI, _HIST_NBINS = 0.0, 110000.0, 22
_HIST_W = (_HIST_HI - _HIST_LO) / _HIST_NBINS

_HIST_ORACLE = f"""
SELECT CASE WHEN l_extendedprice < {_HIST_LO!r} THEN CAST(-1 AS BIGINT)
            WHEN l_extendedprice >= {_HIST_HI!r}
              THEN CAST({_HIST_NBINS} AS BIGINT)
            ELSE CAST(FLOOR((l_extendedprice - {_HIST_LO!r})
                            / {_HIST_W!r}) AS BIGINT) END AS bin,
       COUNT(*) AS n,
       {_HIST_LO!r} + CASE WHEN l_extendedprice < {_HIST_LO!r}
                           THEN CAST(-1 AS BIGINT)
            WHEN l_extendedprice >= {_HIST_HI!r}
              THEN CAST({_HIST_NBINS} AS BIGINT)
            ELSE CAST(FLOOR((l_extendedprice - {_HIST_LO!r})
                            / {_HIST_W!r}) AS BIGINT) END
         * {_HIST_W!r} AS bin_lo
FROM lineitem
GROUP BY 1, 3
"""


@query("price_histogram", oracle=_HIST_ORACLE)
def price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-width histogram (operators/profile.numeric_histogram)
    over l_extendedprice with explicit bounds — one map-side bin
    expression and one count aggregate, no min/max discovery job;
    under/overflow land in bins -1/nbins. The oracle repeats the
    identical IEEE bin arithmetic, so edges agree bit-for-bit."""
    from pointdatabase_spark.operators import profile as _prof
    li = testkit.load_table(spark, sf_dir, "lineitem")
    return _prof.numeric_histogram(li, "l_extendedprice", _HIST_LO,
                                   _HIST_HI, _HIST_NBINS)


_SPIKE_RES_S = 3600
_SPIKE_LOOKBACK_US = 24 * 3600 * 1_000_000

_SPIKE_ORACLE = f"""
WITH e AS (SELECT event_type, epoch_us(ts) AS tus, value FROM events),
b AS (SELECT event_type,
             (tus // {_SPIKE_RES_S * 1_000_000})
               * {_SPIKE_RES_S * 1_000_000} AS bucket_us,
             COUNT(*) AS n
      FROM e GROUP BY event_type, bucket_us),
w AS (SELECT event_type, bucket_us, n,
             SUM(n) OVER win AS sum_w, COUNT(n) OVER win AS cnt_w
      FROM b
      WINDOW win AS (PARTITION BY event_type ORDER BY bucket_us
                     RANGE BETWEEN {_SPIKE_LOOKBACK_US} PRECEDING
                               AND 1 PRECEDING))
SELECT event_type, bucket_us, n,
       floor((CAST(sum_w AS DOUBLE) / cnt_w) * 1000000.0 + 0.5) / 1000000.0 AS trailing_avg,
       CAST(cnt_w >= 3 AND CAST(n AS DOUBLE)
            > 3.0 * (CAST(sum_w AS DOUBLE) / cnt_w) AS BIGINT)
         AS is_spike
FROM w WHERE cnt_w >= 1
"""


@query("rollup_spike_flags", oracle=_SPIKE_ORACLE)
def rollup_spike_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Traffic-spike detection on the continuous-aggregate ladder:
    per (event_type, hour bucket), flag buckets whose event count
    exceeds 3x the preceding-24h trailing average (>= 3 prior
    buckets) — the alerting query a monitoring pipeline runs on the
    ROLLUP, never the base table: window input is |keys| x buckets
    rows. The exclusive-of-current RANGE frame ends at 1 microsecond
    before the bucket start."""
    from pointdatabase_spark.operators import temporal as _t
    ev = testkit.load_table(spark, sf_dir, "events")
    ev = ev.select("event_type", timeconv.events_tus(ev).alias("tus"),
                   "value")
    fine = _t.multires_rollup(ev, ts="tus", keys=["event_type"],
                              value="value",
                              resolutions_s=[_SPIKE_RES_S])
    from pyspark.sql.window import Window as _W
    win = (_W.partitionBy("event_type").orderBy(F.col("bucket_us"))
           .rangeBetween(-_SPIKE_LOOKBACK_US, -1))
    sum_w = F.sum("n").over(win)
    cnt_w = F.count("n").over(win)
    avg = sum_w.cast("double") / cnt_w
    out = (fine.select("event_type", "bucket_us", "n")
           .withColumn("_cnt_w", cnt_w)
           .withColumn("trailing_avg", _rq(avg, 6))
           .withColumn("is_spike",
                       ((cnt_w >= 3)
                        & (F.col("n").cast("double") > 3.0 * avg))
                       .cast("long"))
           .where(F.col("_cnt_w") >= 1)
           .drop("_cnt_w"))
    return out


# Distinctive vocabulary per source: tf-idf-style lift score as a pure
# count ratio (one IEEE division — no libm, so the oracle is
# bit-identical) with a deterministic (score DESC, term ASC) top-k.
_DISTINCT_TERMS_ORACLE = r"""
WITH tok AS (SELECT source,
                    unnest(list_distinct(string_split_regex(text, '\s+')))
                      AS term
             FROM documents),
tf AS (SELECT source AS grp, term, COUNT(*) AS tf
       FROM tok GROUP BY source, term),
d AS (SELECT term, CAST(SUM(tf) AS BIGINT) AS df FROM tf GROUP BY term),
s AS (SELECT grp, term, tf, df, CAST(tf AS DOUBLE) / df AS score
      FROM tf JOIN d USING (term)),
r AS (SELECT *, row_number() OVER (PARTITION BY grp
                                   ORDER BY score DESC, term) AS rk
      FROM s)
SELECT grp AS source, term, tf, df, floor((score) * 1000000.0 + 0.5) / 1000000.0 AS score
FROM r WHERE rk <= 5
"""


@query("distinctive_terms", oracle=_DISTINCT_TERMS_ORACLE)
def distinctive_terms_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pointdatabase_spark.operators import profile as _prof
    docs = _spread(testkit.load_table(spark, sf_dir, "documents"))
    return _prof.distinctive_terms(docs, k=5)


# Corpus-wide frequent n-grams: top word bigrams by DOCUMENT frequency
# (each doc votes once per distinct bigram) — the boilerplate /
# contamination census a pipeline runs before writing filter rules.
# Scale shape: per-doc distinct happens map-side inside the explode,
# the count aggregate map-combines, and top-k is TakeOrdered — no
# corpus-sized shuffle, the classic word-count plan.
_FREQ_NGRAMS_ORACLE = r"""
WITH tok AS (SELECT doc_id, string_split_regex(text, '\s+') AS t
             FROM documents),
g AS (SELECT doc_id, unnest(list_distinct(list_transform(
        range(1, len(t)), i -> t[i] || ' ' || t[i + 1]))) AS gram
      FROM tok WHERE len(t) >= 2)
SELECT gram, COUNT(*) AS df
FROM g GROUP BY gram
ORDER BY df DESC, gram LIMIT 20
"""


def _bpe_oracle(n_merges: int) -> str:
    """Unrolled n-round BPE oracle: per round, a pair-count aggregate,
    a 1-row argmax, and the identical greedy left-to-right merge fold
    (DuckDB list_reduce over a '|'-delimited accumulator — symbols are
    word-soup letters, so the delimiter never collides)."""
    return _bpe_oracle_prefix(n_merges) + "\n" + "\nUNION ALL\n".join(
        f"SELECT CAST({i} AS BIGINT) AS step, l AS left, r AS right,"
        f" pc AS pair_count FROM b{i}"
        for i in range(1, n_merges + 1)) + "\nORDER BY step"


def _bpe_oracle_prefix(n_merges: int) -> str:
    """The shared CTE chain: word counts, then per round a pair-count
    aggregate, a 1-row argmax, and the greedy merge fold (carrying
    the word through so the encode oracle can join back)."""
    parts = [r"""
WITH w0 AS (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM (SELECT unnest(string_split_regex(text, '\s+')) AS w
        FROM documents) GROUP BY w),
s0 AS (SELECT w, cnt, regexp_extract_all(w, '.') AS syms FROM w0)"""]
    for i in range(1, n_merges + 1):
        parts.append(f""",
p{i} AS (SELECT s.l AS l, s.r AS r, CAST(SUM(cnt) AS BIGINT) AS pc
       FROM (SELECT cnt, unnest(list_transform(range(1, len(syms)),
                    i -> {{'l': syms[i], 'r': syms[i+1]}})) AS s
             FROM s{i - 1} WHERE len(syms) >= 2)
       GROUP BY 1, 2),
b{i} AS (SELECT l, r, pc FROM p{i} ORDER BY pc DESC, l, r LIMIT 1),
s{i} AS (SELECT w, cnt, string_split(list_reduce(syms, (acc, x) ->
         CASE WHEN regexp_extract(acc, '[^|]*$') = b.l AND x = b.r
              THEN regexp_replace(acc, '[^|]*$', b.l || b.r)
              ELSE acc || '|' || x END), '|') AS syms
       FROM s{i - 1}, b{i} b)""")
    return "".join(parts)


_BPE_ORACLE = _bpe_oracle(3)


@query("bpe_train_merges", oracle=_BPE_ORACLE)
def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE tokenizer training, first 3 merges
    (operators/tokenizer.bpe_train, Sennrich et al. 2016): ONE corpus
    scan builds the word-count table; every merge round after that is
    an aggregate over the VOCABULARY-bounded word table plus a 1-row
    argmax collect — corpus growth changes counts, not loop cost.
    The greedy left-to-right merge is a codegen aggregate() fold
    (['a','a','a','a'] + (a,a) -> ['aa','aa']); the oracle unrolls
    the identical rounds with DuckDB list_reduce.  Ties break by
    (count desc, left, right) on both engines."""
    from pointdatabase_spark.operators import tokenizer as _bpe
    docs = testkit.load_table(spark, sf_dir, "documents")
    return _bpe.bpe_train(spark, docs, n_merges=3)


_BPE_ENCODE_ORACLE = _bpe_oracle_prefix(3) + r""",
enc AS (SELECT w, CAST(len(syms) AS BIGINT) AS n_sub FROM s3),
dw AS (SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS w
       FROM documents)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(n_sub) AS BIGINT) AS n_tokens
FROM dw JOIN enc USING (w)
GROUP BY doc_id ORDER BY doc_id
"""


@query("bpe_encode_stats", oracle=_BPE_ENCODE_ORACLE)
def bpe_encode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize the corpus under the 3 just-learned BPE merges
    (operators/tokenizer.bpe_encode_doc_stats): each DISTINCT word is
    encoded ONCE by chained codegen merge folds (vocabulary-bounded
    work), the corpus maps word -> encoded length through a broadcast
    join, and one per-doc aggregate returns (n_words, n_tokens) —
    documents never shuffle.  The oracle replays the identical train
    rounds and encode join in DuckDB."""
    from pointdatabase_spark.operators import tokenizer as _bpe
    docs = testkit.load_table(spark, sf_dir, "documents")
    return _bpe.bpe_encode_doc_stats(spark, docs, n_merges=3)


_HEAVY_HITTERS_ORACLE = r"""
WITH tok AS (SELECT unnest(string_split_regex(text, '\s+')) AS term
             FROM documents),
s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_tokens FROM tok),
t AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS freq
      FROM tok GROUP BY term ORDER BY freq DESC, term LIMIT 20)
SELECT term, freq, n_tokens, freq * 257 > n_tokens AS exact_guarantee
FROM t, s
"""


@query("heavy_hitter_terms", oracle=_HEAVY_HITTERS_ORACLE)
def heavy_hitter_terms_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-20 terms via the Misra-Gries candidate + exact
    recount plan (operators/profile.heavy_hitter_terms) — the
    vocabulary-unbounded scale path for term census: the shuffle
    never carries more than capacity x partitions candidate keys,
    vs frequent_ngrams' full |vocab| groupBy.  The oracle is the
    brute-force top-k; equality holds because every true top-20
    frequency here far exceeds N/(capacity+1) (the documented MG
    condition).  Eviction under capacity < |vocab| is pinned by
    tests/test_extensions.py."""
    from pointdatabase_spark.operators import profile as _prof
    docs = _spread(testkit.load_table(spark, sf_dir, "documents"))
    return _prof.heavy_hitter_terms(docs, k=20, capacity=256)


@query("frequent_ngrams", oracle=_FREQ_NGRAMS_ORACLE)
def frequent_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _text.with_tokens(
        _spread(testkit.load_table(spark, sf_dir, "documents")), "text")
    # same per-doc distinct n-gram recipe the dedup family uses — one
    # definition (dedup.shingle_expr); its size guard yields an empty
    # array for sub-bigram docs, which explode then drops
    grams = docs.select(
        "doc_id",
        F.explode(F.expr(_dedup.shingle_expr("_toks", 2))).alias("gram"))
    return (grams.groupBy("gram")
            .agg(F.count(F.lit(1)).alias("df"))
            .orderBy(F.col("df").desc(), F.col("gram").asc())
            .limit(20))


# PII scrub: detect and redact emails / phone numbers / IPv4 addresses
# (functions/pii.py). The corpus carries no PII, so the query PLANTS a
# deterministic set — the identical injection fragment runs on both
# engines — then reports per-source detection counts and a checksum of
# the scrubbed text proving the redactions landed where they should.
_PII_INJECT = (
    "concat(text,"
    " CASE WHEN doc_id % 5 = 0 THEN concat(' reach me at user',"
    " CAST(doc_id AS STRING), '@example.com') ELSE '' END,"
    " CASE WHEN doc_id % 7 = 0 THEN ' or call 555-123-4567 now'"
    " ELSE '' END,"
    " CASE WHEN doc_id % 11 = 0 THEN ' from host 192.168.1.42'"
    " ELSE '' END)")

from pointdatabase_spark.functions import pii as _pii  # noqa: E402

_PII_ORACLE = f"""
WITH inj AS (SELECT doc_id, source, {_PII_INJECT} AS text2
             FROM documents),
f AS (SELECT source,
             {', '.join(_pii.pii_counts_sql('text2'))},
             {_text.duckdb_expr('fp48', _pii.scrub_sql('text2'))} AS fp
      FROM inj)
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(n_email) AS BIGINT) AS n_email,
       CAST(SUM(n_phone) AS BIGINT) AS n_phone,
       CAST(SUM(n_ipv4) AS BIGINT) AS n_ipv4,
       CAST(SUM(fp) AS BIGINT) AS scrub_fp_sum
FROM f GROUP BY source
"""


@query("pii_scrub", oracle=_PII_ORACLE)
def pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _spread(testkit.load_table(spark, sf_dir, "documents"))
    inj = docs.select("doc_id", "source",
                      F.expr(_PII_INJECT).alias("text2"))
    per = (inj.withColumn("text3", _pii.scrub("text2"))
           .select("source", *_pii.pii_counts("text2"),
                   _text.spark_expr("fp48", "text3").alias("fp")))
    return (per.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_email").cast("bigint").alias("n_email"),
                 F.sum("n_phone").cast("bigint").alias("n_phone"),
                 F.sum("n_ipv4").cast("bigint").alias("n_ipv4"),
                 F.sum("fp").cast("bigint").alias("scrub_fp_sum")))


# Gopher-style repetition quality rules (Rae et al. 2021 §A1.1): a
# document is dropped when too much of it is repeated content —
# duplicate tokens, one dominating bigram, or a long single-token
# stutter. Per-source pass rates are what a pipeline operator reports.
_REP_KEEP_TMPL = ("CASE WHEN {dup} <= {DUP_MAX} AND {cov} <= {COV_MAX}"
                  " AND {run} <= {RUN_MAX} THEN 1 ELSE 0 END")
_REP_THRESH = dict(DUP_MAX=0.62, COV_MAX=0.12, RUN_MAX=3)

_REP_ORACLE = f"""
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM({_REP_KEEP_TMPL.format(
           dup=_text.duckdb_expr('dup_token_ratio', 'text'),
           cov=_text.duckdb_expr('top_bigram_cover', 'text'),
           run=_text.duckdb_expr('max_token_run', 'text'),
           **_REP_THRESH)}) AS BIGINT) AS n_kept,
       floor((AVG({_text.duckdb_expr('dup_token_ratio', 'text')})) * 1000000.0 + 0.5) / 1000000.0 AS avg_dup_ratio,
       floor((AVG({_text.duckdb_expr('top_bigram_cover', 'text')})) * 1000000.0 + 0.5) / 1000000.0 AS avg_bigram_cover,
       MAX({_text.duckdb_expr('max_token_run', 'text')}) AS max_run
FROM documents
GROUP BY source
"""


@query("gopher_repetition_filter", oracle=_REP_ORACLE)
def gopher_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _text.with_rep_arrays(
        _spread(testkit.load_table(spark, sf_dir, "documents")), "text")
    dup = _text.spark_expr("dup_token_ratio", "text", "_toks")
    cov = _text.spark_expr("top_bigram_cover", "text", "_toks",
                           bg="_bg", st="_st")
    run = _text.spark_expr("max_token_run", "text", "_toks",
                           bg="_bg", st="_st")
    feats = docs.select("source", dup.alias("dup"), cov.alias("cov"),
                        run.alias("run"))
    keep = F.expr(_REP_KEEP_TMPL.format(dup="dup", cov="cov", run="run",
                                        **_REP_THRESH))
    return (feats.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum(keep).cast("bigint").alias("n_kept"),
                 _rq(F.avg("dup"), 6).alias("avg_dup_ratio"),
                 _rq(F.avg("cov"), 6).alias("avg_bigram_cover"),
                 F.max("run").alias("max_run")))


# --------------------------------------------------------------------------
# Dedup suite (training-data pipeline): exact, MinHash+LSH, SimHash,
# n-gram Jaccard — on the dedup corpus with planted exact/near dups.
# Oracles mirror the md5-based hashing term for term.
# --------------------------------------------------------------------------

from pointdatabase_spark.operators import dedup as _dedup  # noqa: E402

_EXACT_DEDUP_ORACLE = testkit.syn_corpus_cte() + """
SELECT md5(text) AS fp, MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
FROM corpus GROUP BY 1 HAVING COUNT(*) >= 2
"""


@query("exact_dedup", oracle=_EXACT_DEDUP_ORACLE)
def exact_dedup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _dedup.exact_dedup(testkit.syn_corpus(spark, sf_dir))


from pointdatabase_spark.operators.dedup import P31 as _P31, seed_params as _seed_params  # noqa: E402

_MH_SEEDS = _seed_params(8)
_MH_MINS = ",\n         ".join(
    f"MIN(({a} * h + {b}) % {_P31}) AS mh{k}"
    for k, (a, b) in enumerate(_MH_SEEDS))
_MH_BANDS = "\n  UNION ALL\n  ".join(
    f"SELECT id, '{j}' || '|' || CAST(mh{j * 2} AS VARCHAR) || '|' ||"
    f" CAST(mh{j * 2 + 1} AS VARCHAR) AS bkey FROM sig"
    for j in range(4))

_DUCK_H32 = ("CAST(list_sum(list_transform(range(8), i ->"
             " (strpos('0123456789abcdef', substr(md5(x), CAST(i + 1 AS INT), 1)) - 1)"
             " * 16.0 ** (7 - i))) AS BIGINT)")


def _mh_cte_block(src: str, p: str) -> str:
    """MinHash CTE chain (tok→shingles→sig→band) over corpus CTE
    ``src``, every CTE name prefixed with ``p``. THE one rendering of
    the oracle-side minhash recipe: `_minhash_oracle_sql` uses it with
    an empty prefix, the two-corpus incremental-dedup oracle with
    'c'/'d' prefixes — so the recipe cannot drift between oracles."""
    bands = "\n  UNION ALL\n  ".join(
        f"SELECT id, '{j}' || '|' || CAST(mh{j * 2} AS VARCHAR) || '|' ||"
        f" CAST(mh{j * 2 + 1} AS VARCHAR) AS bkey FROM {p}sig"
        for j in range(4))
    return (
        f"{p}tok AS (SELECT doc_id AS id, string_split_regex(text, '\\s+')"
        f" AS t FROM {src}),\n"
        f"{p}sh AS (SELECT id, list_distinct(list_transform("
        f"range(1, len(t) - 1), i -> t[i] || ' ' || t[i + 1] || ' ' ||"
        f" t[i + 2])) AS s FROM {p}tok),\n"
        f"{p}sh2 AS (SELECT id, s FROM {p}sh WHERE len(s) > 0),\n"
        f"{p}ex AS (SELECT id, {_DUCK_H32} % {_P31} AS h"
        f" FROM (SELECT id, unnest(s) AS x FROM {p}sh2)),\n"
        f"{p}sig AS (SELECT id,\n         {_MH_MINS}\n        FROM {p}ex"
        f" GROUP BY id),\n"
        f"{p}band AS (\n  {bands})")


def _minhash_oracle_sql(corpus_cte: str, cap: int | None = None,
                        tail: str | None = None) -> str:
    """MinHash-LSH oracle over a corpus CTE; with `cap`, band keys
    whose bucket exceeds it are excluded before the self-join — the
    exact mirror of dedup.drop_mega_buckets. With `tail`, the pair
    select becomes a ``pairs`` CTE and `tail` is the final query."""
    cand_src = "band"
    capped = ""
    if cap is not None:
        capped = (f",\nband2 AS (SELECT * FROM band WHERE bkey NOT IN"
                  f" (SELECT bkey FROM band GROUP BY bkey"
                  f" HAVING count(*) > {int(cap)}))")
        cand_src = "band2"
    prefix = corpus_cte + ",\n" + _mh_cte_block("corpus", "") + f"""{capped},
cand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM {cand_src} a JOIN {cand_src} b ON a.bkey = b.bkey AND a.id < b.id)
"""
    pair_sel = """SELECT id_a, id_b,
       len(list_intersect(sa.s, sb.s))
         / (len(sa.s) + len(sb.s) - len(list_intersect(sa.s, sb.s))) AS jaccard
FROM cand JOIN sh2 sa ON sa.id = cand.id_a JOIN sh2 sb ON sb.id = cand.id_b
WHERE len(list_intersect(sa.s, sb.s))
        / (len(sa.s) + len(sb.s) - len(list_intersect(sa.s, sb.s))) >= 0.5
"""
    if tail is None:
        return prefix + pair_sel
    return prefix + ", pairs AS (\n" + pair_sel + ")\n" + tail


_MINHASH_ORACLE = _minhash_oracle_sql(testkit.syn_corpus_cte())


@query("minhash_lsh_neardup", oracle=_MINHASH_ORACLE)
def minhash_lsh_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _dedup.minhash_neardup(testkit.syn_corpus(spark, sf_dir))


# Mega-bucket cap on the skewed corpus (40-copy planted cluster): the
# cap drops the cluster's band keys before the self-join, so candidate
# generation stays near-linear; the cluster's members are exact dups
# that exact_dedup collapses via the O(n) path instead.
_MINHASH_CAPPED_ORACLE = _minhash_oracle_sql(
    testkit.syn_skew_corpus_cte(), cap=8)


@query("minhash_lsh_capped", oracle=_MINHASH_CAPPED_ORACLE)
def minhash_lsh_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _dedup.minhash_neardup(testkit.syn_skew_corpus(spark, sf_dir),
                                  max_bucket=8)


# --------------------------------------------------------------------------
# Incremental (delta-vs-corpus) dedup — the continuous-ingest pattern:
# a new batch is screened against the existing corpus without any
# corpus-vs-corpus pairing. The synthetic delta plants all three
# outcomes: exact copies (%10=0, re-id'd), near copies (%10=1, four
# trailing tokens appended), and genuinely new content (%10=2,
# character-reversed so every shingle changes).
# --------------------------------------------------------------------------

# Shared Spark-SQL/DuckDB fragment (concat/reverse/CASE-free).
_DELTA_SQL = """
SELECT 900000 + doc_id AS doc_id, text FROM documents WHERE doc_id % 10 = 0
UNION ALL
SELECT 910000 + doc_id AS doc_id,
       concat(text, ' zq extra trailing tokens zq') AS text
FROM documents WHERE doc_id % 10 = 1
UNION ALL
SELECT 920000 + doc_id AS doc_id, reverse(text) AS text
FROM documents WHERE doc_id % 10 = 2
"""


_INCR_ORACLE = f"""
WITH corpus AS (SELECT doc_id, text FROM documents),
delta AS ({_DELTA_SQL}),
cfp AS (SELECT DISTINCT md5(text) AS fp FROM corpus),
{_mh_cte_block('corpus', 'c')},
{_mh_cte_block('delta', 'd')},
cand AS (
  SELECT DISTINCT d.id AS did, c.id AS cid
  FROM dband d JOIN cband c ON d.bkey = c.bkey),
near AS (
  SELECT DISTINCT cand.did
  FROM cand JOIN dsh2 a ON a.id = cand.did
            JOIN csh2 b ON b.id = cand.cid
  WHERE len(list_intersect(a.s, b.s))
          / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.5)
SELECT d.doc_id AS id,
       CAST(CASE WHEN md5(d.text) IN (SELECT fp FROM cfp)
            THEN 1 ELSE 0 END AS BIGINT) AS is_exact_dup,
       CAST(CASE WHEN d.doc_id IN (SELECT did FROM near)
            THEN 1 ELSE 0 END AS BIGINT) AS is_near_dup
FROM delta d
"""


@query("incremental_dedup", oracle=_INCR_ORACLE)
def incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = testkit.load_table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("documents")
    delta = spark.sql(_DELTA_SQL)
    flags = _dedup.incremental_dedup_flags(docs.select("doc_id", "text"),
                                           delta)
    return flags.select("id",
                        F.col("is_exact_dup").cast("long")
                        .alias("is_exact_dup"),
                        F.col("is_near_dup").cast("long")
                        .alias("is_near_dup"))


# Pair → cluster → survivor resolution: 3 hops of min-label propagation
# over the minhash near-dup pair graph, then one survivor per cluster.
# The oracle runs the identical 3 bounded rounds (l1/l2/l3 CTEs), so the
# two engines agree by construction regardless of convergence; the
# cluster property test asserts 3 hops reaches the true component min
# on the planted corpus.
_CLUSTER_TAIL = """
, nodes AS (SELECT id_a AS id FROM pairs UNION SELECT id_b AS id FROM pairs),
edges AS (SELECT id_a AS u, id_b AS v FROM pairs
          UNION ALL SELECT id_b AS u, id_a AS v FROM pairs),
l0 AS (SELECT id, id AS lbl FROM nodes),
l1 AS (SELECT n.id, LEAST(n.lbl, MIN(m.lbl)) AS lbl
       FROM l0 n JOIN edges e ON n.id = e.u JOIN l0 m ON m.id = e.v
       GROUP BY n.id, n.lbl),
l2 AS (SELECT n.id, LEAST(n.lbl, MIN(m.lbl)) AS lbl
       FROM l1 n JOIN edges e ON n.id = e.u JOIN l1 m ON m.id = e.v
       GROUP BY n.id, n.lbl),
l3 AS (SELECT n.id, LEAST(n.lbl, MIN(m.lbl)) AS lbl
       FROM l2 n JOIN edges e ON n.id = e.u JOIN l2 m ON m.id = e.v
       GROUP BY n.id, n.lbl),
keep AS (SELECT lbl AS cid, MIN(id) AS survivor_id FROM l3 GROUP BY lbl)
SELECT c.doc_id,
       COALESCE(l.lbl, c.doc_id)                  AS cluster_id,
       COALESCE(c.doc_id = k.survivor_id, TRUE)   AS is_survivor
FROM corpus c
LEFT JOIN l3 l ON l.id = c.doc_id
LEFT JOIN keep k ON k.cid = l.lbl
"""

_CLUSTER_ORACLE = _minhash_oracle_sql(testkit.syn_corpus_cte(),
                                      tail=_CLUSTER_TAIL)


@query("dedup_clusters", oracle=_CLUSTER_ORACLE)
def dedup_clusters_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = testkit.syn_corpus(spark, sf_dir)
    pairs = _dedup.minhash_neardup(corpus)
    clusters = _dedup.duplicate_clusters(pairs, hops=3)
    return (_dedup.dedup_survivors(corpus, clusters)
            .select("doc_id", "cluster_id", "is_survivor"))


_KEEP_BEST_TAIL = """
, nodes AS (SELECT id_a AS id FROM pairs UNION SELECT id_b AS id FROM pairs),
edges AS (SELECT id_a AS u, id_b AS v FROM pairs
          UNION ALL SELECT id_b AS u, id_a AS v FROM pairs),
l0 AS (SELECT id, id AS lbl FROM nodes),
l1 AS (SELECT n.id, LEAST(n.lbl, MIN(m.lbl)) AS lbl
       FROM l0 n JOIN edges e ON n.id = e.u JOIN l0 m ON m.id = e.v
       GROUP BY n.id, n.lbl),
l2 AS (SELECT n.id, LEAST(n.lbl, MIN(m.lbl)) AS lbl
       FROM l1 n JOIN edges e ON n.id = e.u JOIN l1 m ON m.id = e.v
       GROUP BY n.id, n.lbl),
l3 AS (SELECT n.id, LEAST(n.lbl, MIN(m.lbl)) AS lbl
       FROM l2 n JOIN edges e ON n.id = e.u JOIN l2 m ON m.id = e.v
       GROUP BY n.id, n.lbl),
memq AS (SELECT l.id, l.lbl, length(c.text) AS q
         FROM l3 l JOIN corpus c ON c.doc_id = l.id),
keep AS (SELECT lbl AS cid, id AS survivor_id FROM (
           SELECT id, lbl, ROW_NUMBER() OVER (PARTITION BY lbl
                  ORDER BY q DESC, id) AS rn FROM memq) r WHERE rn = 1)
SELECT c.doc_id,
       COALESCE(l.lbl, c.doc_id)                  AS cluster_id,
       COALESCE(c.doc_id = k.survivor_id, TRUE)   AS is_survivor
FROM corpus c
LEFT JOIN l3 l ON l.id = c.doc_id
LEFT JOIN keep k ON k.cid = l.lbl
"""

_KEEP_BEST_ORACLE = _minhash_oracle_sql(testkit.syn_corpus_cte(),
                                        tail=_KEEP_BEST_TAIL)


@query("dedup_keep_best", oracle=_KEEP_BEST_ORACLE)
def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware near-dup survivor selection
    (operators/dedup.dedup_survivors_by): per minhash-LSH cluster the
    LONGEST member survives (tie -> smallest id) — the production
    keep-the-best-copy policy, vs dedup_clusters' keep-min-id.  The
    argmax is a single max_by over the cluster-member table (one
    key-hash exchange of members only, not the corpus); the oracle
    replays the identical 3 bounded label-propagation rounds and a
    rank-1 window."""
    corpus = testkit.syn_corpus(spark, sf_dir)
    pairs = _dedup.minhash_neardup(corpus)
    clusters = _dedup.duplicate_clusters(pairs, hops=3)
    docs = corpus.withColumn("_len", F.length("text"))
    return (_dedup.dedup_survivors_by(docs, clusters, "_len")
            .select("doc_id", "cluster_id", "is_survivor"))


# End-to-end dedup PIPELINE: exact-dup collapse AND near-dup survivor
# resolution composed to a clean-corpus summary — the full
# training-data cleaning flow as one declarative plan (exact keeps the
# min id per content hash; near-dup keeps one survivor per minhash
# cluster; a clean doc must pass both).
_CLEAN_CTES = """
, nodes AS (SELECT id_a AS id FROM pairs UNION SELECT id_b AS id FROM pairs),
edges AS (SELECT id_a AS u, id_b AS v FROM pairs
          UNION ALL SELECT id_b AS u, id_a AS v FROM pairs),
l0 AS (SELECT id, id AS lbl FROM nodes),
l1 AS (SELECT n.id, LEAST(n.lbl, MIN(m.lbl)) AS lbl
       FROM l0 n JOIN edges e ON n.id = e.u JOIN l0 m ON m.id = e.v
       GROUP BY n.id, n.lbl),
l2 AS (SELECT n.id, LEAST(n.lbl, MIN(m.lbl)) AS lbl
       FROM l1 n JOIN edges e ON n.id = e.u JOIN l1 m ON m.id = e.v
       GROUP BY n.id, n.lbl),
l3 AS (SELECT n.id, LEAST(n.lbl, MIN(m.lbl)) AS lbl
       FROM l2 n JOIN edges e ON n.id = e.u JOIN l2 m ON m.id = e.v
       GROUP BY n.id, n.lbl),
keep AS (SELECT lbl AS cid, MIN(id) AS survivor_id FROM l3 GROUP BY lbl),
verdict AS (
  SELECT c.doc_id, c.lang, length(c.text) AS n_chars, md5(c.text) AS fp,
         COALESCE(c.doc_id = k.survivor_id, TRUE) AS is_survivor
  FROM corpus c LEFT JOIN l3 l ON l.id = c.doc_id
  LEFT JOIN keep k ON k.cid = l.lbl),
exact AS (SELECT md5(text) AS fp, MIN(doc_id) AS keep_id
          FROM corpus GROUP BY 1)
"""

_CLEAN_TAIL = _CLEAN_CTES + """
SELECT v.lang, COUNT(*) AS n_docs, CAST(SUM(v.n_chars) AS BIGINT) AS n_chars
FROM verdict v JOIN exact e ON v.fp = e.fp AND v.doc_id = e.keep_id
WHERE v.is_survivor
GROUP BY v.lang
"""

_CLEAN_ORACLE = _minhash_oracle_sql(testkit.syn_corpus_cte(),
                                    tail=_CLEAN_TAIL)


@query("dedup_clean_corpus", oracle=_CLEAN_ORACLE)
def dedup_clean_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = testkit.syn_corpus(spark, sf_dir)
    pairs = _dedup.minhash_neardup(corpus)
    surv = _dedup.dedup_survivors(corpus, _dedup.duplicate_clusters(pairs))
    exact_keep = (corpus.groupBy(F.md5("text").alias("keep_fp"))
                  .agg(F.min("doc_id").alias("keep_id")))
    # no broadcast hint: exact_keep is O(corpus) rows — AQE broadcasts
    # it while small, shuffle-joins it at scale
    clean = (surv.where("is_survivor")
             .withColumn("fp", F.md5("text"))
             .join(exact_keep,
                   (F.col("fp") == F.col("keep_fp"))
                   & (F.col("doc_id") == F.col("keep_id"))))
    return (clean.groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum(F.length("text")).alias("n_chars")))


_SH_VOTES = ",\n         ".join(
    f"SUM(CASE WHEN (h >> {k}) & 1 = 1 THEN 1 ELSE -1 END) AS v{k}"
    for k in range(32))
_SH_ASSEMBLE = " + ".join(
    f"(CASE WHEN v{k} > 0 THEN {1 << k} ELSE 0 END)" for k in range(32))

_SIMHASH_ORACLE = testkit.syn_corpus_cte() + r"""
, tok AS (SELECT doc_id AS id, string_split_regex(text, '\s+') AS t FROM corpus),
sh AS (
  SELECT id, list_distinct(list_transform(range(1, len(t) - 1),
         i -> t[i] || ' ' || t[i + 1] || ' ' || t[i + 2])) AS s
  FROM tok),
sh2 AS (SELECT id, s FROM sh WHERE len(s) > 0),
""" + f"""
ex AS (SELECT id, {_DUCK_H32} AS h
       FROM (SELECT id, unnest(s) AS x FROM sh2)),
v AS (SELECT id,
         {_SH_VOTES}
      FROM ex GROUP BY id),
sim AS (SELECT id, CAST({_SH_ASSEMBLE} AS BIGINT) AS simhash FROM v),
band AS (
  SELECT id, simhash, CAST(j AS INT) AS bid,
         (simhash >> CAST(j * 8 AS INT)) & 255 AS key
  FROM sim, (SELECT unnest(range(4)) AS j) _j),
cand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b,
         CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
  FROM band a JOIN band b
    ON a.bid = b.bid AND a.key = b.key AND a.id < b.id)
SELECT id_a, id_b, hamming FROM cand WHERE hamming <= 3
"""


@query("simhash_neardup", oracle=_SIMHASH_ORACLE)
def simhash_neardup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _dedup.simhash_neardup(testkit.syn_corpus(spark, sf_dir))


# Mirrors the engine's inverted-index shape: md5-hashed distinct
# shingles, intersection = shared-hash count (operators/dedup.py
# ngram_jaccard_pairs).
_NGRAM_JACCARD_ORACLE = r"""
WITH tok AS (SELECT doc_id AS id, lang,
                    string_split_regex(text, '\s+') AS t FROM documents),
shs AS (SELECT id, lang, list_distinct(list_transform(range(1, len(t)),
               i -> t[i] || ' ' || t[i + 1])) AS ss
        FROM tok),
sh2 AS (SELECT id, lang, ss FROM shs WHERE len(ss) > 0),
""" + f"""
sh AS (SELECT id, lang,
              list_distinct(list_transform(ss, x -> {_DUCK_H32})) AS s
       FROM sh2),
ex AS (SELECT id, lang, len(s) AS nsh, unnest(s) AS h FROM sh)
SELECT a.id AS id_a, b.id AS id_b,
       count(*) / (a.nsh + b.nsh - count(*)) AS jaccard
FROM ex a JOIN ex b ON a.lang = b.lang AND a.h = b.h AND a.id < b.id
GROUP BY a.id, b.id, a.nsh, b.nsh
HAVING count(*) / (a.nsh + b.nsh - count(*)) >= 0.2
"""


@query("ngram_jaccard_neardup", oracle=_NGRAM_JACCARD_ORACLE)
def ngram_jaccard_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = testkit.load_table(spark, sf_dir, "documents")
    return _dedup.ngram_jaccard_pairs(docs, ["lang"], n=2, threshold=0.2)


# df-capped variant: the posting self-join costs Σ df(s)² per block, so
# one stop-word-like shingle dominates at scale; max_df bounds every
# posting at max_df² (dedup.drop_hot_shingles — the mega-bucket valve
# applied to the inverted index). Jaccard is exact over the df-capped
# vocabulary; the oracle removes the same hot (lang, hash) keys.
_NGRAM_CAPPED_ORACLE = r"""
WITH tok AS (SELECT doc_id AS id, lang,
                    string_split_regex(text, '\s+') AS t FROM documents),
shs AS (SELECT id, lang, list_distinct(list_transform(range(1, len(t)),
               i -> t[i] || ' ' || t[i + 1])) AS ss
        FROM tok),
sh2 AS (SELECT id, lang, ss FROM shs WHERE len(ss) > 0),
""" + f"""
sh AS (SELECT id, lang,
              list_distinct(list_transform(ss, x -> {_DUCK_H32})) AS s
       FROM sh2),
""" + r"""
ex0 AS (SELECT id, lang, unnest(s) AS h FROM sh),
hot AS (SELECT lang, h FROM ex0 GROUP BY lang, h HAVING COUNT(*) > 20),
ex1 AS (SELECT e.id, e.lang, e.h FROM ex0 e
        ANTI JOIN hot x ON e.lang = x.lang AND e.h = x.h),
n AS (SELECT id, COUNT(*) AS nsh FROM ex1 GROUP BY id),
p AS (SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS inter
      FROM ex1 a JOIN ex1 b
        ON a.lang = b.lang AND a.h = b.h AND a.id < b.id
      GROUP BY a.id, b.id)
SELECT p.id_a, p.id_b,
       p.inter / (na.nsh + nb.nsh - p.inter) AS jaccard
FROM p JOIN n na ON na.id = p.id_a JOIN n nb ON nb.id = p.id_b
WHERE p.inter / (na.nsh + nb.nsh - p.inter) >= 0.2
"""


@query("ngram_jaccard_capped", oracle=_NGRAM_CAPPED_ORACLE)
def ngram_jaccard_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = testkit.load_table(spark, sf_dir, "documents")
    return _dedup.ngram_jaccard_pairs(docs, ["lang"], n=2, threshold=0.2,
                                      max_df=20)


# Broder containment — same inverted index as the Jaccard oracle, but
# the asymmetric denominators: catches a small doc embedded in a large
# one (J tiny, containment ~1). Threshold on the min-side containment
# (overlap coefficient). dedup.containment_pairs.
_CONTAINMENT_ORACLE = r"""
WITH tok AS (SELECT doc_id AS id, lang,
                    string_split_regex(text, '\s+') AS t FROM documents),
shs AS (SELECT id, lang, list_distinct(list_transform(range(1, len(t)),
               i -> t[i] || ' ' || t[i + 1])) AS ss
        FROM tok),
sh2 AS (SELECT id, lang, ss FROM shs WHERE len(ss) > 0),
""" + f"""
sh AS (SELECT id, lang,
              list_distinct(list_transform(ss, x -> {_DUCK_H32})) AS s
       FROM sh2),
""" + r"""
ex AS (SELECT id, lang, len(s) AS nsh, unnest(s) AS h FROM sh),
p AS (SELECT a.id AS id_a, b.id AS id_b, a.nsh AS na, b.nsh AS nb,
             COUNT(*) AS inter
      FROM ex a JOIN ex b
        ON a.lang = b.lang AND a.h = b.h AND a.id < b.id
      GROUP BY a.id, b.id, a.nsh, b.nsh)
SELECT id_a, id_b, inter / na AS cont_ab, inter / nb AS cont_ba
FROM p WHERE greatest(inter / na, inter / nb) >= 0.8
"""


@query("containment_neardup", oracle=_CONTAINMENT_ORACLE)
def containment_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = testkit.load_table(spark, sf_dir, "documents")
    return _dedup.containment_pairs(docs, ["lang"], n=2, threshold=0.8)


_SUB_K = 8

_SUBSTR_ORACLE = testkit.syn_corpus_cte() + f"""
, tok AS (SELECT doc_id AS id, string_split_regex(text, '\\s+') AS t
          FROM corpus),
pos0 AS (SELECT id, t, unnest(range(1, len(t) - {_SUB_K} + 2)) AS pos
         FROM tok),
posh0 AS (SELECT id, pos,
                 array_to_string(t[pos:pos + {_SUB_K - 1}], ' ') AS x
          FROM pos0),
posh AS (SELECT id, pos, {_DUCK_H32} AS h FROM posh0),
hot AS (SELECT h FROM posh GROUP BY h HAVING COUNT(DISTINCT id) >= 2),
dup AS (SELECT p.id, p.pos FROM posh p SEMI JOIN hot USING (h)),
brk AS (SELECT id, pos,
        CASE WHEN pos > COALESCE(MAX(pos + {_SUB_K - 1}) OVER (
                 PARTITION BY id ORDER BY pos
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
             -1) + 1
        THEN 1 ELSE 0 END AS b FROM dup),
grp AS (SELECT id, pos, SUM(b) OVER (PARTITION BY id ORDER BY pos
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS g
        FROM brk)
SELECT id AS doc_id, MIN(pos) AS span_start,
       MAX(pos) + {_SUB_K - 1} AS span_end, COUNT(*) AS n_grams
FROM grp GROUP BY id, g
"""


@query("substring_dup_spans", oracle=_SUBSTR_ORACLE)
def substring_dup_spans_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-granular dedup (operators/dedup.substring_dup_spans):
    maximal token spans covered by an 8-token window shared by >= 2
    distinct documents — catches a boilerplate paragraph pasted into
    otherwise-unique documents, which document-level Jaccard under a
    threshold cannot. Every stage is linear in corpus tokens (df
    aggregate + semi-join + run merge; no posting self-join), so no
    df-cap valve is needed. The oracle replays the identical window
    hashes and the identical touch-or-overlap merge rule."""
    return _dedup.substring_dup_spans(testkit.syn_corpus(spark, sf_dir),
                                      k=_SUB_K)


_SPAN_STATS_ORACLE = _SUBSTR_ORACLE.replace(
    "SELECT id AS doc_id, MIN(pos) AS span_start,",
    """, spans AS (SELECT id AS doc_id, MIN(pos) AS span_start,""").replace(
    "FROM grp GROUP BY id, g",
    "FROM grp GROUP BY id, g)") + f"""
, nt AS (SELECT doc_id, CAST(len(string_split_regex(text, '\\s+'))
                             AS BIGINT) AS n_tokens
         FROM corpus),
agg AS (SELECT doc_id,
               SUM(span_end - span_start + 1) AS dup_tokens
        FROM spans GROUP BY doc_id)
SELECT nt.doc_id, nt.n_tokens,
       CAST(COALESCE(agg.dup_tokens, 0) AS BIGINT) AS dup_tokens,
       CAST(COALESCE(agg.dup_tokens, 0) AS DOUBLE) / nt.n_tokens
         AS dup_frac
FROM nt LEFT JOIN agg ON nt.doc_id = agg.doc_id
"""


@query("dup_span_doc_stats", oracle=_SPAN_STATS_ORACLE)
def dup_span_doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation decision built on the spans: per-document count of
    tokens inside cross-document duplicated spans and its fraction of
    the document (merged spans never overlap, so a plain SUM is the
    exact coverage) — the number a pipeline thresholds to drop or
    trim boilerplate-heavy documents. One division of two exact ints,
    bit-equal to the oracle."""
    corpus = testkit.syn_corpus(spark, sf_dir)
    spans = _dedup.substring_dup_spans(corpus, k=_SUB_K)
    agg = (spans.groupBy("doc_id")
           .agg(F.sum(F.col("span_end") - F.col("span_start") + 1)
                .alias("dup_tokens")))
    nt = corpus.select(
        "doc_id",
        F.size(F.split(F.col("text"), r"\s+")).cast("long")
        .alias("n_tokens"))
    out = (nt.join(agg, "doc_id", "left")
           .withColumn("dup_tokens",
                       F.coalesce(F.col("dup_tokens"), F.lit(0))))
    return out.select(
        "doc_id", "n_tokens", "dup_tokens",
        (F.col("dup_tokens").cast("double") / F.col("n_tokens"))
        .alias("dup_frac"))


# --------------------------------------------------------------------------
# Similarity search over `embeddings` (array<float>): brute-force
# cosine top-k, SRP-LSH bucketed ANN, and cosine near-dup pairs.
# Oracles rebuild the identical sequential double arithmetic (and the
# identical md5-derived hyperplanes) in DuckDB SQL.
# --------------------------------------------------------------------------

from pointdatabase_spark.operators import similarity as _sim  # noqa: E402

_DIM = 64
_PLANES = _sim.hyperplanes(6, _DIM)


def _duck_dot(a: str, b: str, dim: int = _DIM) -> str:
    """list_reduce from a prepended 0 — same order as Spark aggregate."""
    return (f"list_reduce([CAST(0 AS DOUBLE)] || list_transform(range({dim}),"
            f" i -> CAST({a}[i + 1] AS DOUBLE) * CAST({b}[i + 1] AS DOUBLE)),"
            " (x, y) -> x + y)")


def _duck_cos(a: str, b: str) -> str:
    return (f"{_duck_dot(a, b)} / (sqrt({_duck_dot(a, a)})"
            f" * sqrt({_duck_dot(b, b)}))")


def _duck_plane_dot(vec: str, plane: list[float]) -> str:
    """Left-assoc explicit sum == sequential fold from 0."""
    terms = " + ".join(
        f"CAST({vec}[{i + 1}] AS DOUBLE) * CAST({w} AS DOUBLE)"
        for i, w in enumerate(plane))
    return f"(CAST(0 AS DOUBLE) + {terms})"


def _duck_bucket(vec: str, planes: list[list[float]] = _PLANES) -> str:
    bits = " + ".join(
        f"(CASE WHEN {_duck_plane_dot(vec, pl)} > CAST(0 AS DOUBLE)"
        f" THEN {1 << p} ELSE 0 END)"
        for p, pl in enumerate(planes))
    return f"CAST({bits} AS BIGINT)"


_COSINE_TOPK_ORACLE = f"""
WITH q AS (SELECT vec_id AS q_id, embedding AS qv
           FROM embeddings WHERE vec_id < 5),
j AS (SELECT q.q_id, e.vec_id, {_duck_cos('q.qv', 'e.embedding')} AS cos
      FROM embeddings e, q),
r AS (SELECT q_id, vec_id, cos,
             CAST(row_number() OVER (PARTITION BY q_id
                  ORDER BY cos DESC, vec_id) AS BIGINT) AS rank
      FROM j)
SELECT q_id, vec_id, cos, rank FROM r WHERE rank <= 10
"""


@query("cosine_topk", oracle=_COSINE_TOPK_ORACLE)
def cosine_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = testkit.load_table(spark, sf_dir, "embeddings")
    return _sim.cosine_topk(emb, emb.where(F.col("vec_id") < 5), k=10)


_LSH_ANN_ORACLE = f"""
WITH c AS (SELECT vec_id, embedding, {_duck_bucket('embedding')} AS bucket
           FROM embeddings),
q AS (SELECT vec_id AS q_id, embedding AS qv, bucket
      FROM c WHERE vec_id < 5),
j AS (SELECT q.q_id, c.vec_id, c.bucket,
             {_duck_cos('q.qv', 'c.embedding')} AS cos
      FROM c JOIN q ON c.bucket = q.bucket),
r AS (SELECT q_id, vec_id, bucket, cos,
             CAST(row_number() OVER (PARTITION BY q_id
                  ORDER BY cos DESC, vec_id) AS BIGINT) AS rank
      FROM j)
SELECT q_id, vec_id, bucket, cos, rank FROM r WHERE rank <= 5
"""


@query("lsh_ann_topk", oracle=_LSH_ANN_ORACLE)
def lsh_ann_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = testkit.load_table(spark, sf_dir, "embeddings")
    return _sim.lsh_ann_topk(emb, emb.where(F.col("vec_id") < 5), k=5,
                             planes=_PLANES)


# Multi-table SRP-LSH (OR-amplification over 2 independent md5-derived
# plane tables; table 0 = the single-table planes, so candidates are a
# strict superset — the recall property is pytest-asserted in
# tests/test_extensions.py).
_PLANE_TABLES = _sim.plane_tables(2, 6, _DIM)

_LSH_MULTI_ORACLE = f"""
WITH cb AS (
  SELECT vec_id, embedding, 0 AS tid,
         {_duck_bucket('embedding', _PLANE_TABLES[0])} AS bucket
  FROM embeddings
  UNION ALL
  SELECT vec_id, embedding, 1 AS tid,
         {_duck_bucket('embedding', _PLANE_TABLES[1])} AS bucket
  FROM embeddings),
qb AS (SELECT vec_id AS q_id, embedding AS qv, tid, bucket
       FROM cb WHERE vec_id < 5),
j AS (SELECT DISTINCT qb.q_id, cb.vec_id,
             {_duck_cos('qb.qv', 'cb.embedding')} AS cos
      FROM cb JOIN qb ON cb.tid = qb.tid AND cb.bucket = qb.bucket),
r AS (SELECT q_id, vec_id, cos,
             CAST(row_number() OVER (PARTITION BY q_id
                  ORDER BY cos DESC, vec_id) AS BIGINT) AS rank
      FROM j)
SELECT q_id, vec_id, cos, rank FROM r WHERE rank <= 5
"""


@query("lsh_ann_multitable", oracle=_LSH_MULTI_ORACLE)
def lsh_ann_multitable(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = testkit.load_table(spark, sf_dir, "embeddings")
    return _sim.lsh_ann_topk_multi(emb, emb.where(F.col("vec_id") < 5),
                                   k=5, plane_sets=_PLANE_TABLES)


# IVF ANN: deterministic coarse centroids, argmin cell assignment,
# nprobe=2 multi-probe on the query side, exact-cosine rerank.
_CENTS = _sim.centroids(8, _DIM)


def _duck_cell_scores(vec: str) -> str:
    terms = []
    for ck in _CENTS:
        ck2 = 0.0
        for w in ck:
            ck2 += w * w
        terms.append(f"(CAST({ck2!r} AS DOUBLE) - CAST(2.0 AS DOUBLE)"
                     f" * {_duck_plane_dot(vec, ck)})")
    return "[" + ", ".join(terms) + "]"


def _duck_cell(vec: str) -> str:
    sc = _duck_cell_scores(vec)
    return (f"CAST(list_position({sc}, list_aggregate({sc}, 'min'))"
            " AS BIGINT) - 1")


def _duck_probe_cells(vec: str, nprobe: int) -> str:
    sc = _duck_cell_scores(vec)
    return (f"list_transform(list_slice(list_sort(list_zip({sc},"
            f" range(0, {len(_CENTS)}))), 1, {nprobe}),"
            " p -> CAST(p[2] AS BIGINT))")


_IVF_ANN_ORACLE = f"""
WITH c AS (SELECT vec_id, embedding, {_duck_cell('embedding')} AS cell
           FROM embeddings),
q AS (SELECT vec_id AS q_id, embedding AS qv,
             unnest({_duck_probe_cells('embedding', 2)}) AS cell
      FROM embeddings WHERE vec_id < 5),
j AS (SELECT q.q_id, c.vec_id, c.cell,
             {_duck_cos('q.qv', 'c.embedding')} AS cos
      FROM c JOIN q ON c.cell = q.cell),
r AS (SELECT q_id, vec_id, cell, cos,
             CAST(row_number() OVER (PARTITION BY q_id
                  ORDER BY cos DESC, vec_id) AS BIGINT) AS rank
      FROM j)
SELECT q_id, vec_id, cell, cos, rank FROM r WHERE rank <= 5
"""


@query("ivf_ann_topk", oracle=_IVF_ANN_ORACLE)
def ivf_ann_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = testkit.load_table(spark, sf_dir, "embeddings")
    return _sim.ivf_ann_topk(emb, emb.where(F.col("vec_id") < 5), k=5,
                             cents=_CENTS, nprobe=2)


@query("ann_index_topk", oracle=_IVF_ANN_ORACLE)
def ann_index_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The STORED-index serving path (similarity.write_ann_index /
    ann_topk_against_index): embeddings are written partitioned by
    coarse cell once, then the query batch probes nprobe cells via
    dynamic partition pruning — per-batch cost independent of corpus
    size, the continuous-serving design. Same oracle as ivf_ann_topk:
    the store-then-query roundtrip must be bit-identical to the
    inline plan."""
    import hashlib as _hl
    import os as _os
    import shutil as _sh
    emb = testkit.load_table(spark, sf_dir, "embeddings")
    path = (f"/tmp/pdb_annidx_{_os.getpid()}_"
            f"{_hl.md5(sf_dir.encode()).hexdigest()[:8]}")
    _sh.rmtree(path, ignore_errors=True)
    _sim.write_ann_index(emb, path, _CENTS)
    return _sim.ann_topk_against_index(
        spark, path, emb.where(F.col("vec_id") < 5), k=5, nprobe=2)


@query("ann_index_incremental", oracle=_IVF_ANN_ORACLE)
def ann_index_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-ingest ANN (similarity.append_ann_index): the index
    is built from PART of the corpus, the rest arrives as an appended
    delta — cell-assigned against the centroids stored in the index
    meta, O(delta) per batch, stored corpus never rescanned. Same
    oracle as ivf_ann_topk: base + delta must serve bit-identically
    to an index built from everything at once."""
    import hashlib as _hl
    import os as _os
    import shutil as _sh
    emb = testkit.load_table(spark, sf_dir, "embeddings")
    path = (f"/tmp/pdb_annincr_{_os.getpid()}_"
            f"{_hl.md5(sf_dir.encode()).hexdigest()[:8]}")
    _sh.rmtree(path, ignore_errors=True)
    _sim.write_ann_index(emb.where(F.col("vec_id") >= 100), path, _CENTS)
    _sim.append_ann_index(emb.where(F.col("vec_id") < 100), path)
    return _sim.ann_topk_against_index(
        spark, path, emb.where(F.col("vec_id") < 5), k=5, nprobe=2)


@query("streaming_ann_index", oracle=_IVF_ANN_ORACLE)
def streaming_ann_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming index maintenance (streaming/annindex.py): new
    vectors land as files, an availableNow foreachBatch stream
    appends them to the cell-partitioned index with a per-batch
    idempotency anti-join; the served top-k must equal the
    build-everything-at-once oracle."""
    import hashlib as _hl
    import os as _os
    import shutil as _sh
    from pointdatabase_spark.streaming.annindex import (
        run_ann_index_maintenance)
    emb = testkit.load_table(spark, sf_dir, "embeddings")
    tag = (f"{_os.getpid()}_"
           f"{_hl.md5(sf_dir.encode()).hexdigest()[:8]}")
    path = f"/tmp/pdb_annstream_{tag}_idx"
    landing = f"/tmp/pdb_annstream_{tag}_landing"
    ckpt = f"/tmp/pdb_annstream_{tag}_ckpt"
    for p in (path, landing, ckpt):
        _sh.rmtree(p, ignore_errors=True)
    _sim.write_ann_index(emb.where(F.col("vec_id") >= 100), path, _CENTS)
    emb.where(F.col("vec_id") < 100).repartition(2).write.parquet(landing)
    schema = spark.read.parquet(landing).schema
    run_ann_index_maintenance(spark, landing, "*.parquet", schema, path,
                              ckpt)
    return _sim.ann_topk_against_index(
        spark, path, emb.where(F.col("vec_id") < 5), k=5, nprobe=2)


# ANN recall audit: recall@5 of the SRP-LSH path against the exact
# top-5, per query — the standard quality gate a production embedding
# pipeline runs on a QUERY SAMPLE before trusting an index (the exact
# side is the expensive baseline; auditing a sample keeps it bounded
# while the ANN path serves full traffic).  Pure composition of the
# two declared operators plus tiny (q_id, vec_id) joins.
_ANN_RECALL_ORACLE = f"""
WITH q AS (SELECT vec_id AS q_id, embedding AS qv
           FROM embeddings WHERE vec_id < 5),
ej AS (SELECT q.q_id, e.vec_id, {_duck_cos('q.qv', 'e.embedding')} AS cos
       FROM embeddings e, q),
ex AS (SELECT q_id, vec_id FROM (
         SELECT q_id, vec_id,
                row_number() OVER (PARTITION BY q_id
                     ORDER BY cos DESC, vec_id) AS rank
         FROM ej) WHERE rank <= 5),
cb AS (SELECT vec_id, embedding, {_duck_bucket('embedding')} AS bucket
       FROM embeddings),
qb AS (SELECT vec_id AS q_id, embedding AS qv, bucket
       FROM cb WHERE vec_id < 5),
lj AS (SELECT qb.q_id, cb.vec_id,
              {_duck_cos('qb.qv', 'cb.embedding')} AS cos
       FROM cb JOIN qb ON cb.bucket = qb.bucket),
lsh AS (SELECT q_id, vec_id FROM (
          SELECT q_id, vec_id,
                 row_number() OVER (PARTITION BY q_id
                      ORDER BY cos DESC, vec_id) AS rank
          FROM lj) WHERE rank <= 5),
ap AS (SELECT q_id, COUNT(*) AS n_approx FROM lsh GROUP BY q_id),
hit AS (SELECT ex.q_id, COUNT(*) AS n_hit
        FROM ex JOIN lsh ON ex.q_id = lsh.q_id AND ex.vec_id = lsh.vec_id
        GROUP BY ex.q_id)
SELECT q.q_id,
       CAST(COALESCE(ap.n_approx, 0) AS BIGINT) AS n_approx,
       CAST(COALESCE(hit.n_hit, 0) AS BIGINT) AS n_hit,
       CAST(COALESCE(hit.n_hit, 0) AS DOUBLE) / 5 AS recall_at_5
FROM q LEFT JOIN ap ON ap.q_id = q.q_id
       LEFT JOIN hit ON hit.q_id = q.q_id
"""


@query("ann_recall_audit", oracle=_ANN_RECALL_ORACLE)
def ann_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = testkit.load_table(spark, sf_dir, "embeddings")
    qs = emb.where(F.col("vec_id") < 5)
    exact = _sim.cosine_topk(emb, qs, k=5).select("q_id", "vec_id")
    approx = _sim.lsh_ann_topk(emb, qs, k=5,
                               planes=_PLANES).select("q_id", "vec_id")
    hits = (exact.join(approx, ["q_id", "vec_id"])
            .groupBy("q_id").agg(F.count(F.lit(1)).alias("n_hit")))
    nap = approx.groupBy("q_id").agg(F.count(F.lit(1)).alias("n_approx"))
    q = qs.select(F.col("vec_id").alias("q_id"))
    return (q.join(nap, "q_id", "left").join(hits, "q_id", "left")
            .select("q_id",
                    F.coalesce("n_approx", F.lit(0)).cast("long")
                    .alias("n_approx"),
                    F.coalesce("n_hit", F.lit(0)).cast("long")
                    .alias("n_hit"),
                    (F.coalesce("n_hit", F.lit(0)) / F.lit(5.0))
                    .alias("recall_at_5")))


_EMB_NEARDUP_ORACLE = f"""
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       {_duck_cos('a.embedding', 'b.embedding')} AS cos
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE {_duck_cos('a.embedding', 'b.embedding')} >= 0.4
"""


@query("embedding_cosine_neardup", oracle=_EMB_NEARDUP_ORACLE)
def embedding_cosine_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = testkit.load_table(spark, sf_dir, "embeddings")
    return _sim.cosine_neardup_pairs(emb, threshold=0.4)


# The SRP-bucket-blocked variant — the 100-TB path (candidates only
# within a bucket, so the quadratic term is per-bucket, not corpus²).
# Exact all-pairs above stays as the small-corpus correctness baseline.
_EMB_NEARDUP_BLOCKED_ORACLE = f"""
WITH c AS (SELECT vec_id, embedding, {_duck_bucket('embedding')} AS bucket
           FROM embeddings)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       {_duck_cos('a.embedding', 'b.embedding')} AS cos
FROM c a JOIN c b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
WHERE {_duck_cos('a.embedding', 'b.embedding')} >= 0.4
"""


@query("embedding_cosine_neardup_blocked",
       oracle=_EMB_NEARDUP_BLOCKED_ORACLE)
def embedding_cosine_neardup_blocked(spark: SparkSession,
                                     sf_dir: str) -> DataFrame:
    emb = testkit.load_table(spark, sf_dir, "embeddings")
    return _sim.cosine_neardup_pairs(emb, threshold=0.4, planes=_PLANES)


# SemDeDup (Abbas et al. 2023): coarse-cluster the embedding space,
# then within each cell drop vectors τ-similar to a clustermate that
# sits farther from the centroid (keep-the-edge-points rule).  The
# fixture embeddings are near-orthogonal synthetic vectors (p99 global
# cosine ≈ 0.29), so the fixture threshold is 0.3 — on real model
# embeddings the paper operates at ~0.95+; the PLAN is identical.
_SEMDEDUP_CTE = f"""
WITH c AS (SELECT vec_id, embedding, {_duck_cell('embedding')} AS cell,
                  list_aggregate({_duck_cell_scores('embedding')}, 'min')
                  AS cdist
           FROM embeddings),
rm AS (SELECT DISTINCT a.vec_id
       FROM c a JOIN c b
         ON a.cell = b.cell
        AND (b.cdist > a.cdist
             OR (b.cdist = a.cdist AND b.vec_id < a.vec_id))
       WHERE {_duck_cos('a.embedding', 'b.embedding')} >= 0.3)
"""

_SEMDEDUP_ORACLE = _SEMDEDUP_CTE + """
SELECT c.vec_id, c.cell FROM c
WHERE c.vec_id NOT IN (SELECT vec_id FROM rm)
"""


@query("semantic_dedup", oracle=_SEMDEDUP_ORACLE)
def semantic_dedup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = testkit.load_table(spark, sf_dir, "embeddings")
    return _sim.semantic_dedup(emb, _CENTS, threshold=0.3)


_SEMDEDUP_STATS_ORACLE = _SEMDEDUP_CTE + """
SELECT c.cell,
       CAST(COUNT(*) AS BIGINT) AS n_total,
       CAST(SUM(CASE WHEN rm.vec_id IS NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_kept
FROM c LEFT JOIN rm ON c.vec_id = rm.vec_id
GROUP BY c.cell
"""


@query("semantic_dedup_stats", oracle=_SEMDEDUP_STATS_ORACLE)
def semantic_dedup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cell retention report for semantic_dedup — |cells| rows
    (the monitoring view a corpus-prep run logs: which regions of
    embedding space are collapsing).  Composes the operator's
    survivors against the map-side cell assignment; both aggregates
    shuffle only |cells| keys."""
    emb = testkit.load_table(spark, sf_dir, "embeddings")
    cells = (emb.select("vec_id",
                        F.expr(_sim.cell_expr("embedding", _CENTS))
                        .alias("cell")))
    kept = (_sim.semantic_dedup(emb, _CENTS, threshold=0.3)
            .select("vec_id").withColumn("_k", F.lit(1)))
    return (cells.join(kept, "vec_id", "left")
            .groupBy("cell")
            .agg(F.count(F.lit(1)).alias("n_total"),
                 F.sum(F.coalesce(F.col("_k"), F.lit(0)))
                 .cast("long").alias("n_kept")))


# Embedding-space health check: per-label centroid norm, mean member
# cosine to the OWN centroid, and nearest-centroid purity — the
# diagnostics run before trusting an embedding column for clustering /
# near-dup / ANN. Oracle rebuilds the same centroids via DuckDB's
# zipped-unnest and replays the identical double arithmetic; float
# drift from engine summation order is absorbed by the shared
# bit-deterministic rounding formula (functions/rounding.py).
_EMB_STATS_ORACLE = """
WITH ex AS (SELECT label AS clabel, UNNEST(embedding) AS v,
                   UNNEST(range(1, len(embedding) + 1)) AS pos
            FROM embeddings),
cen AS (SELECT clabel, pos, AVG(v) AS m FROM ex GROUP BY clabel, pos),
cvec AS (SELECT clabel, list(m ORDER BY pos) AS cvec
         FROM cen GROUP BY clabel),
pairs AS (SELECT e.vec_id AS id, e.label, c.clabel,
                 list_sum(list_transform(range(1, len(e.embedding) + 1),
                   i -> CAST(e.embedding[i] AS DOUBLE) * c.cvec[i])) AS dot,
                 sqrt(list_sum(list_transform(e.embedding,
                   x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS ne,
                 sqrt(list_sum(list_transform(c.cvec,
                   x -> x * x))) AS nc
          FROM embeddings e, cvec c),
cs AS (SELECT id, label, clabel, dot / (ne * nc) AS cos, nc AS cnorm
       FROM pairs),
best AS (SELECT id, label, clabel,
                row_number() OVER (PARTITION BY id
                                   ORDER BY floor((cos) * 1000000000000.0 + 0.5) / 1000000000000.0 DESC,
                                            clabel) AS rk
         FROM cs),
per_own AS (SELECT label, COUNT(*) AS n_vecs,
                   floor((MAX(cnorm)) * 1000000.0 + 0.5) / 1000000.0 AS centroid_norm,
                   floor((AVG(cos)) * 1000000.0 + 0.5) / 1000000.0 AS mean_cos_own
            FROM cs WHERE clabel = label GROUP BY label),
purity AS (SELECT label,
                  CAST(SUM(CASE WHEN clabel = label THEN 1 ELSE 0 END)
                       AS BIGINT) AS n_nearest_own
           FROM best WHERE rk = 1 GROUP BY label)
SELECT p.label, p.n_vecs, p.centroid_norm, p.mean_cos_own,
       u.n_nearest_own
FROM per_own p JOIN purity u USING(label)
"""


@query("embedding_label_stats", oracle=_EMB_STATS_ORACLE)
def embedding_label_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = testkit.load_table(spark, sf_dir, "embeddings")
    return _sim.label_centroid_stats(emb)


# --------------------------------------------------------------------------
# J5/P12 raster-lookup join + mask test: broadcast synthetic grid,
# pandas-UDF bilinear interp; oracle re-derives the grid from its
# formula and mirrors the interpolation arithmetic step for step.
# --------------------------------------------------------------------------

_G = dict(x0=-100000.0, y0=-100000.0, d=2000.0, n=101)
_ZF = "CAST(({i} * 37 + {j} * 91) % 199 AS DOUBLE)"
_MF = "CASE WHEN ({i} + {j}) % 3 = 0 THEN CAST(1 AS DOUBLE) ELSE CAST(0 AS DOUBLE) END"


def _duck_bilinear(zf: str) -> str:
    corners = {
        "z00": zf.format(i="i0", j="j0"),
        "z10": zf.format(i="(i0 + 1)", j="j0"),
        "z01": zf.format(i="i0", j="(j0 + 1)"),
        "z11": zf.format(i="(i0 + 1)", j="(j0 + 1)"),
    }
    return ("{z00} * (1.0 - fx) * (1.0 - fy) + {z10} * fx * (1.0 - fy)"
            " + {z01} * (1.0 - fx) * fy + {z11} * fx * fy"
            ).format(**corners)


_RASTER_ORACLE = testkit.syn_points_cte() + f"""
, g AS (
  SELECT row_id, x, y,
         (x - ({_G['x0']})) / {_G['d']} AS gx,
         (y - ({_G['y0']})) / {_G['d']} AS gy
  FROM pts),
c AS (
  SELECT row_id, x, y, gx, gy,
         least(greatest(floor(gx), 0.0), {_G['n'] - 2}.0) AS i0d,
         least(greatest(floor(gy), 0.0), {_G['n'] - 2}.0) AS j0d
  FROM g),
f AS (
  SELECT row_id, x, y, gx - i0d AS fx, gy - j0d AS fy,
         CAST(i0d AS BIGINT) AS i0, CAST(j0d AS BIGINT) AS j0
  FROM c)
SELECT row_id, x, y,
       {_duck_bilinear(_ZF)} AS z_interp,
       abs({_duck_bilinear(_MF)} - 1.0) < 0.01 AS grounded
FROM f
"""


@query("raster_interp_join", oracle=_RASTER_ORACLE)
def raster_interp_join_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pointdatabase_spark.operators import raster
    g = _G
    zg = raster.grid_from_formula(g["x0"], g["y0"], g["d"], g["d"],
                                  g["n"], g["n"],
                                  lambda ii, jj: (ii * 37 + jj * 91) % 199)
    mg = raster.grid_from_formula(g["x0"], g["y0"], g["d"], g["d"],
                                  g["n"], g["n"],
                                  lambda ii, jj: (ii + jj) % 3 == 0)
    pts = testkit.syn_points(spark, sf_dir).select("row_id", "x", "y")
    return raster.mask_test(raster.interp_join(pts, zg), mg)


# J5 spline variant (mapData.interp spline path, mapData.py:245-260):
# local cubic convolution (Keys a=-0.5). The oracle mirrors the NumPy
# kernel's separable row-then-column evaluation and Horner-form weights
# term for term (operators/raster.py _cubic).


def _duck_cubic(zf: str) -> str:
    def row(m: str) -> str:
        j = f"(j0 + {m})" if m != "0" else "j0"
        return (f"({zf.format(i='(i0 - 1)', j=j)} * wxm1"
                f" + {zf.format(i='i0', j=j)} * wx0"
                f" + {zf.format(i='(i0 + 1)', j=j)} * wx1"
                f" + {zf.format(i='(i0 + 2)', j=j)} * wx2)")
    return (f"{row('-1')} * wym1 + {row('0')} * wy0"
            f" + {row('1')} * wy1 + {row('2')} * wy2")


_SPLINE_ORACLE = testkit.syn_points_cte() + f"""
, g AS (
  SELECT row_id, x, y,
         (x - ({_G['x0']})) / {_G['d']} AS gx,
         (y - ({_G['y0']})) / {_G['d']} AS gy
  FROM pts),
c AS (
  SELECT row_id, x, y, gx, gy,
         least(greatest(floor(gx), 1.0), {_G['n'] - 3}.0) AS i0d,
         least(greatest(floor(gy), 1.0), {_G['n'] - 3}.0) AS j0d
  FROM g),
f AS (
  SELECT row_id, x, y, gx - i0d AS fx, gy - j0d AS fy,
         CAST(i0d AS BIGINT) AS i0, CAST(j0d AS BIGINT) AS j0
  FROM c),
w AS (
  SELECT row_id, x, y, i0, j0,
         ((-0.5 * fx + 1.0) * fx - 0.5) * fx AS wxm1,
         (1.5 * fx - 2.5) * fx * fx + 1.0 AS wx0,
         ((-1.5 * fx + 2.0) * fx + 0.5) * fx AS wx1,
         (0.5 * fx - 0.5) * fx * fx AS wx2,
         ((-0.5 * fy + 1.0) * fy - 0.5) * fy AS wym1,
         (1.5 * fy - 2.5) * fy * fy + 1.0 AS wy0,
         ((-1.5 * fy + 2.0) * fy + 0.5) * fy AS wy1,
         (0.5 * fy - 0.5) * fy * fy AS wy2
  FROM f)
SELECT row_id, x, y,
       {_duck_cubic(_ZF)} AS z_spline
FROM w
"""


@query("raster_interp_spline", oracle=_SPLINE_ORACLE)
def raster_interp_spline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pointdatabase_spark.operators import raster
    g = _G
    zg = raster.grid_from_formula(g["x0"], g["y0"], g["d"], g["d"],
                                  g["n"], g["n"],
                                  lambda ii, jj: (ii * 37 + jj * 91) % 199)
    pts = testkit.syn_points(spark, sf_dir).select("row_id", "x", "y")
    return raster.interp_join(pts, zg, out="z_spline", kind="spline")


# --------------------------------------------------------------------------
# S4 raster→points explode (read_DEM.py:52-64 asPoints=True): decimate
# by `skip`, window to bounds, nodata→NULL. The oracle rebuilds the
# same grid from its integer formula with a range() cross join —
# x0 + i*d and the z formula are exact in doubles, so values hash-match.
# --------------------------------------------------------------------------

_DEM_BOUNDS = ((-60000.0, 40000.0), (-50000.0, 90000.0))

_DEMPTS_ORACLE = f"""
WITH ij AS (
  SELECT CAST(i.range AS BIGINT) AS i, CAST(j.range AS BIGINT) AS j
  FROM range(0, {_G['n']}) i, range(0, {_G['n']}) j),
p AS (
  SELECT i, j,
         ({_G['x0']}) + i * {_G['d']} AS x,
         ({_G['y0']}) + j * {_G['d']} AS y,
         {_ZF.format(i='i', j='j')} AS zr
  FROM ij
  WHERE i % 3 = 0 AND j % 3 = 0)
SELECT i, j, x, y,
       CASE WHEN zr = 0.0 THEN NULL ELSE zr END AS z
FROM p
WHERE x >= {_DEM_BOUNDS[0][0]} AND x <= {_DEM_BOUNDS[0][1]}
  AND y >= {_DEM_BOUNDS[1][0]} AND y <= {_DEM_BOUNDS[1][1]}
"""


@query("dem_as_points", oracle=_DEMPTS_ORACLE)
def dem_as_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pointdatabase_spark.operators import raster
    g = _G
    zg = raster.grid_from_formula(g["x0"], g["y0"], g["d"], g["d"],
                                  g["n"], g["n"],
                                  lambda ii, jj: (ii * 37 + jj * 91) % 199)
    return raster.grid_to_points(spark, zg, bounds=_DEM_BOUNDS, skip=3,
                                 nodata=0.0)


# --------------------------------------------------------------------------
# F7 normalize/colormap (mapData.py:179-195): affine rescale over the
# global caxis + nearest-stop viridis LUT + non-finite alpha. All pure
# shared-text SQL (operators/raster.py normalize/to_rgb) — the oracle
# renders the identical CASE-chain strings, so values hash-match.
# --------------------------------------------------------------------------

def _rgb_oracle() -> str:
    from pointdatabase_spark.operators import raster as _r
    zn = ("CASE WHEN (z) IS NULL THEN NULL ELSE "
          "least(greatest(((z) - cmin) / (cmax - cmin)"
          " * (1.0 - 0.0) + 0.0, 0.0), 1.0) END")
    return f"""
WITH ij AS (
  SELECT CAST(i.range AS BIGINT) AS i, CAST(j.range AS BIGINT) AS j
  FROM range(0, {_G['n']}) i, range(0, {_G['n']}) j),
p AS (
  SELECT i, j,
         ({_G['x0']}) + i * {_G['d']} AS x,
         ({_G['y0']}) + j * {_G['d']} AS y,
         {_ZF.format(i='i', j='j')} AS zr
  FROM ij
  WHERE i % 3 = 0 AND j % 3 = 0),
d AS (
  SELECT i, j, x, y, CASE WHEN zr = 0.0 THEN NULL ELSE zr END AS z
  FROM p
  WHERE x >= {_DEM_BOUNDS[0][0]} AND x <= {_DEM_BOUNDS[0][1]}
    AND y >= {_DEM_BOUNDS[1][0]} AND y <= {_DEM_BOUNDS[1][1]}),
c AS (SELECT min(z) AS cmin, max(z) AS cmax FROM d),
n AS (SELECT i, j, x, y, z, {zn} AS zn FROM d, c)
SELECT i, j, x, y, z, zn,
       {_r.lut_channel_sql('zn', _r.VIRIDIS8, 0)} AS r,
       {_r.lut_channel_sql('zn', _r.VIRIDIS8, 1)} AS g,
       {_r.lut_channel_sql('zn', _r.VIRIDIS8, 2)} AS b,
       CASE WHEN (z) IS NULL THEN 0.0 WHEN isnan(CAST((z) AS DOUBLE))
            THEN 0.0 ELSE 1.0 END AS alpha
FROM n
"""


@query("raster_normalize_rgb", oracle=_rgb_oracle())
def raster_normalize_rgb(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pointdatabase_spark.operators import raster
    g = _G
    zg = raster.grid_from_formula(g["x0"], g["y0"], g["d"], g["d"],
                                  g["n"], g["n"],
                                  lambda ii, jj: (ii * 37 + jj * 91) % 199)
    pts = raster.grid_to_points(spark, zg, bounds=_DEM_BOUNDS, skip=3,
                                nodata=0.0)
    return raster.to_rgb(pts, "z")


# --------------------------------------------------------------------------
# A7 at scale: per-bin OLS plane fit via exact-integer normal equations
# (operators/fit.py) — the distributed generalization of calc_slope.
# --------------------------------------------------------------------------

from pointdatabase_spark.operators import fit as _fit  # noqa: E402

_PLANE_Z = "CAST(sigma AS BIGINT) * 3 + row_id % 97"

_PLANE_ORACLE = _fit.oracle_sql(testkit.syn_points_cte(), 10000.0,
                                z_expr=_PLANE_Z)


@query("plane_fit_10km", oracle=_PLANE_ORACLE)
def plane_fit_10km(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = (testkit.syn_points(spark, sf_dir)
           .withColumn("z", F.expr(_PLANE_Z)))
    return _fit.plane_fit_by_bin(pts, 10000.0)


# --------------------------------------------------------------------------
# O3 offset-run coalescing (geo_index.py:410-429) — window run-merge.
# --------------------------------------------------------------------------

_RUNS_SQL = """
SELECT CAST(l_suppkey % 10 AS BIGINT) AS file_id,
       CAST((l_orderkey % 500) * 12 AS BIGINT) AS run_start,
       CAST((l_orderkey % 500) * 12 + l_quantity AS BIGINT) AS run_end
FROM lineitem
"""

_COALESCE_ORACLE = f"WITH runs AS (SELECT DISTINCT * FROM ({_RUNS_SQL}))" + """
, m AS (
  SELECT file_id, run_start, run_end,
         max(run_end) OVER (PARTITION BY file_id ORDER BY run_start, run_end
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
  FROM runs),
fl AS (SELECT *, CASE WHEN prev_max IS NULL OR run_start > prev_max + 1
                      THEN 1 ELSE 0 END AS nf FROM m),
r AS (SELECT *, SUM(nf) OVER (PARTITION BY file_id ORDER BY run_start, run_end
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rid FROM fl)
SELECT file_id, MIN(run_start) AS run_start, MAX(run_end) AS run_end,
       COUNT(*) AS n_merged
FROM r GROUP BY file_id, rid
"""


@query("run_coalescing", oracle=_COALESCE_ORACLE)
def run_coalescing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pointdatabase_spark.operators import runs as _runs
    testkit.load_table(spark, sf_dir, "lineitem") \
        .createOrReplaceTempView("lineitem")
    # One shuffle total: hash-partition by file_id up front —
    # HashPartitioning(file_id) satisfies the dedup's clustering on
    # (file_id, start, end) AND the window/groupBy inside
    # coalesce_runs, so dedup, window and final agg all reuse it.
    base = (spark.sql(_RUNS_SQL).repartition("file_id")
            .dropDuplicates(["file_id", "run_start", "run_end"]))
    return _runs.coalesce_runs(base, ["file_id"])


# --------------------------------------------------------------------------
# F1 CRS transform: lat/lon → EPSG:3413 polar stereographic x/y via the
# pure-NumPy pandas UDF (functions/crs.py). NumPy and DuckDB libm trig
# differ in the last ulp (~1.4e-9 m measured); the hash-compared output
# is quantized to integer meters, where the minimum distance of any
# value to a rounding boundary is ≥6.7e-7 m across sf0.001/0.01/0.1 —
# a ≥470× straddle margin, asserted by tests/test_properties.py
# (test_crs_round_straddle_margin). Sub-mm agreement between the two
# engines is itself asserted there with an explicit tolerance, which is
# the right tool for continuous values (round-then-hash at mm grain is
# not: at sf0.01 one value sits 6e-10 m from a mm boundary).
# --------------------------------------------------------------------------

from pointdatabase_spark.functions import crs as _crs  # noqa: E402

_LATLON_SQL = """
SELECT l_orderkey * 10 + l_linenumber AS row_id,
       CAST(60 AS DOUBLE) + CAST(l_partkey % 3000 AS DOUBLE) / CAST(100 AS DOUBLE) AS lat,
       CAST(-180 AS DOUBLE) + CAST(l_orderkey % 36000 AS DOUBLE) / CAST(100 AS DOUBLE) AS lon
FROM lineitem
"""

_CRS_X, _CRS_Y = _crs.oracle_sql_exprs(1, lat="lat", lon="lon")

_CRS_ORACLE = f"""
WITH ll AS ({_LATLON_SQL})
SELECT row_id, lat, lon,
       CAST(floor(({_CRS_X}) + 0.5) AS BIGINT) AS x_ps_m,
       CAST(floor(({_CRS_Y}) + 0.5) AS BIGINT) AS y_ps_m
FROM ll
"""


@query("crs_polar_stereo", oracle=_CRS_ORACLE)
def crs_polar_stereo(spark: SparkSession, sf_dir: str) -> DataFrame:
    testkit.load_table(spark, sf_dir, "lineitem") \
        .createOrReplaceTempView("lineitem")
    ll = spark.sql(_LATLON_SQL)
    x, y = _crs.stereo_xy_columns("lat", "lon", hemisphere=1)
    return ll.select("row_id", "lat", "lon",
                     F.floor(x + F.lit(0.5)).alias("x_ps_m"),
                     F.floor(y + F.lit(0.5)).alias("y_ps_m"))


# UTM (arbitrary-CRS surface, geo_index.py:102-112 `from_latlon` with a
# non-polar srs): Krüger-series transverse Mercator as pure built-in
# Columns (JVM codegen, no Python worker).  The oracle runs the same
# layered SQL text DuckDB-side; outputs are quantized to integer meters
# with the straddle margin asserted in tests/test_properties.py.
_UTM_LATLON_SQL = """
SELECT l_orderkey * 10 + l_linenumber AS row_id,
       CAST(10 AS DOUBLE) + CAST(l_partkey % 6000 AS DOUBLE) / CAST(100 AS DOUBLE) AS lat,
       CAST(-78 AS DOUBLE) + CAST(l_orderkey % 600 AS DOUBLE) / CAST(100 AS DOUBLE) AS lon
FROM lineitem
"""

_UTM_ORACLE = f"""
SELECT row_id, lat, lon,
       CAST(floor(x * 0.1 + 0.5) AS BIGINT) * 10 AS x_utm_10m,
       CAST(floor(y * 0.1 + 0.5) AS BIGINT) * 10 AS y_utm_10m
FROM ({_crs.tmerc_oracle_sql(_UTM_LATLON_SQL, -75.0)}) utm
"""


@query("crs_utm", oracle=_UTM_ORACLE)
def crs_utm(spark: SparkSession, sf_dir: str) -> DataFrame:
    # UTM zone 18N. Spark executes the SAME generated SQL text as the
    # DuckDB oracle (textually identical math, single parse+analyze).
    # Measured per-call cost of the three spellings of this transform
    # at sf0.1: single-Column tree ~5.3 s analysis + 1.5 s run
    # (series subtrees duplicated ~10×), chained-projection DataFrame
    # (`crs.with_tmerc_xy`, the composable operator form) ~0.8 s,
    # shared SQL text ~0.22 s. All three plans are one fused
    # WholeStageCodegen stage with zero Python workers.
    testkit.load_table(spark, sf_dir, "lineitem") \
        .createOrReplaceTempView("lineitem")
    return spark.sql(_UTM_ORACLE)


# --------------------------------------------------------------------------
# Streaming (§7.8 extension): watermarked tumbling-window counts over
# `events` via Structured Streaming (availableNow), materialized to a
# parquet sink and read back. Oracle = batch aggregation with the
# watermark cutoff applied explicitly (windows newer than
# max(event_time) − delay are withheld by append mode).
# --------------------------------------------------------------------------

_STREAM_ORACLE = """
WITH ev AS (SELECT ts, event_type, value FROM events),
m AS (SELECT MAX(ts) AS max_ts FROM ev),
w AS (SELECT date_trunc('day', ts) AS ws, event_type,
             COUNT(*) AS n_events, floor((SUM(value)) * 1000000.0 + 0.5) / 1000000.0 AS sum_value
      FROM ev GROUP BY 1, 2)
SELECT strftime(ws, '%Y-%m-%d') AS window_day, event_type, n_events, sum_value
FROM w, m
WHERE ws + INTERVAL 1 DAY <= max_ts - INTERVAL 1 HOUR
"""


@query("streaming_window_counts", oracle=_STREAM_ORACLE)
def streaming_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pointdatabase_spark.streaming import ingest as _ingest
    out = _ingest.run_windowed_counts_availablenow(
        spark, sf_dir, window="1 day", delay="1 hour")
    return out.select(F.date_format("window_start", "yyyy-MM-dd").alias("window_day"),
                      "event_type", "n_events",
                      _rq("sum_value", 6).alias("sum_value"))


# Streaming quality gate (streaming/quality.py): the SAME repetition /
# PII expressions as the batch operators, run inside a stateless
# Structured Streaming pass (availableNow) into a parquet sink — the
# no-drift batch/stream contract. The oracle is the batch arithmetic,
# because a stateless gate is deterministic regardless of mode.
_SQG_ORACLE = f"""
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM({_REP_KEEP_TMPL.format(
           dup=_text.duckdb_expr('dup_token_ratio', 'text'),
           cov=_text.duckdb_expr('top_bigram_cover', 'text'),
           run=_text.duckdb_expr('max_token_run', 'text'),
           **_REP_THRESH)}) AS BIGINT) AS n_kept,
       CAST(SUM({_text.duckdb_expr('fp48', _pii.scrub_sql('text'))})
            AS BIGINT) AS scrub_fp_sum
FROM documents
WHERE doc_id % 4 = 0
GROUP BY source
"""


@query("streaming_quality_gate", oracle=_SQG_ORACLE)
def streaming_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    # sample_mod=4: deterministic quarter-corpus (r11 bench trim —
    # the full-corpus drain was 20.5 s of the 211 s bench total,
    # pure fixture cost for a STATELESS gate whose no-drift contract
    # any subset proves; oracle applies the identical predicate).
    from pointdatabase_spark.streaming import quality as _qual
    out = _qual.run_quality_gate_availablenow(spark, sf_dir,
                                              sample_mod=4)
    return (out.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum(F.col("keep").cast("long")).cast("bigint")
                 .alias("n_kept"),
                 F.sum(_text.spark_expr("fp48", "scrubbed"))
                 .cast("bigint").alias("scrub_fp_sum")))


# --------------------------------------------------------------------------
# Gap-based sessionization (streaming/sessions.py): the batch window
# path carries the full oracle; the stateful applyInPandasWithState
# path has deterministic availableNow semantics (in-batch-closed
# sessions always emit; each key's final open session emits iff the
# final watermark passed its end+gap timeout) — mirrored in SQL.
# --------------------------------------------------------------------------

_SESS_GAP_US = 6 * 3600 * 1000000  # 6 h
_SESS_DELAY_MS = 3600 * 1000       # 1 h watermark delay

_SESS_CORE = f"""
WITH e AS (SELECT user_id, epoch_us(ts) AS tus, value FROM events),
l AS (SELECT user_id, tus, value,
             lag(tus) OVER (PARTITION BY user_id ORDER BY tus) AS prev
      FROM e),
f AS (SELECT *, CASE WHEN prev IS NULL OR tus - prev > {_SESS_GAP_US}
                     THEN 1 ELSE 0 END AS nf FROM l),
g AS (SELECT *, SUM(nf) OVER (PARTITION BY user_id ORDER BY tus
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM f),
s AS (SELECT user_id, CAST(sid AS BIGINT) AS session_id,
             MIN(tus) AS session_start, MAX(tus) AS session_end,
             COUNT(*) AS n_events, floor((SUM(value)) * 1000000.0 + 0.5) / 1000000.0 AS sum_value
      FROM g GROUP BY user_id, sid)
"""

_SESSION_ORACLE = _SESS_CORE + """
SELECT user_id, session_id, session_start, session_end,
       n_events, sum_value
FROM s
"""


@query("event_sessionization", oracle=_SESSION_ORACLE)
def event_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pointdatabase_spark.streaming import sessions as _sess
    ev = testkit.load_table(spark, sf_dir, "events")
    ev = ev.select("user_id", timeconv.events_tus(ev).alias("tus"), "value")
    return _sess.sessionize(ev, _SESS_GAP_US)


# Spark's BUILT-IN session-window aggregation — the declarative twin of
# the window-function sessionize (one groupBy, Catalyst plans the
# merge; also valid over a stream). Boundary note: session_window is
# half-open (an event exactly gap after the last starts a NEW session)
# where the lag formulation uses `> gap` (continues); the synthetic
# events table has zero exact-gap pairs at every sf (checked in
# microseconds), so both formulations coincide on this data and share
# the oracle.
_SESSWIN_ORACLE = _SESS_CORE + """
SELECT user_id, session_start, session_end, n_events, sum_value
FROM s
"""


@query("session_window_agg", oracle=_SESSWIN_ORACLE)
def session_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = testkit.load_table(spark, sf_dir, "events")
    ev = (ev.select("user_id", timeconv.events_tus(ev).alias("tus"), "value")
          .withColumn("event_time", F.timestamp_micros("tus")))
    return (ev.groupBy("user_id",
                       F.session_window("event_time", "6 hours").alias("w"))
            .agg(F.min("tus").alias("session_start"),
                 F.max("tus").alias("session_end"),
                 F.count(F.lit(1)).alias("n_events"),
                 _rq(F.sum("value"), 6).alias("sum_value"))
            .select("user_id", "session_start", "session_end",
                    "n_events", "sum_value"))


_STREAM_SESSION_ORACLE = _SESS_CORE + f"""
, mk AS (SELECT user_id, MAX(session_id) AS last_sid
         FROM s GROUP BY user_id),
m AS (SELECT MAX(tus) AS mx FROM e)
SELECT s.user_id, s.session_start, s.session_end,
       s.n_events, s.sum_value
FROM s JOIN mk ON s.user_id = mk.user_id, m
WHERE s.session_id < mk.last_sid
   OR (s.session_end // 1000 + {_SESS_GAP_US // 1000})
      < (m.mx // 1000 - {_SESS_DELAY_MS})
"""


@query("streaming_sessionization", oracle=_STREAM_SESSION_ORACLE)
def streaming_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pointdatabase_spark.streaming import sessions as _sess
    return _sess.run_sessionize_stateful_availablenow(
        spark, sf_dir, _SESS_GAP_US, delay="1 hour")


# --------------------------------------------------------------------------
# Deterministic sampling / splits / packing / decontamination
# (operators/sampling.py, dedup.benchmark_contamination): the
# reproducible-subsetting stages of a training-data pipeline. All
# assignment comes from md5 of the row id, so the DuckDB oracles
# rebuild identical splits from the shared hash recipe.
# --------------------------------------------------------------------------

from pointdatabase_spark.operators import sampling as _samp  # noqa: E402

_SPLITS = [("train", 0.8), ("val", 0.1), ("test", 0.1)]
# thresholds accumulated in Python floats and inlined verbatim so the
# oracle's CASE boundaries are bit-identical to the Spark whens
_SPLIT_UB = []
_acc = 0.0
for _nm, _w in _SPLITS[:-1]:
    _acc += _w
    _SPLIT_UB.append((_nm, _acc))


def _duck_h32_id(id_expr: str, salt: str) -> str:
    return _DUCK_H32.replace(
        "md5(x)", f"md5(CAST({id_expr} AS VARCHAR) || '{salt}')")


_CB_SAMPLE_ORACLE = f"""
WITH c AS (SELECT vec_id, {_duck_cell('embedding')} AS cell
           FROM embeddings),
n AS (SELECT cell, COUNT(*) AS n_c FROM c GROUP BY cell)
SELECT c.vec_id, c.cell
FROM c JOIN n ON c.cell = n.cell
WHERE {_duck_h32_id('c.vec_id', 'cb1')} / {float(1 << 32)!r}
      < LEAST(1.0, 40.0 / n.n_c)
"""


@query("cluster_balanced_sample", oracle=_CB_SAMPLE_ORACLE)
def cluster_balanced_sample_q(spark: SparkSession, sf_dir: str
                              ) -> DataFrame:
    """Diversity-flattening downsample (sampling.py): IVF-cell census
    caps each embedding-space region at ~40 rows via the
    deterministic hash threshold — dense topics thin, rare ones stay
    whole (cluster-balanced reweighting, the post-dedup diversity
    pass).  The corpus never shuffles; the census frame is bounded by
    n_centroids (a config constant), so its broadcast is scale-safe
    by construction."""
    from pointdatabase_spark.operators import sampling as _samp2
    emb = testkit.load_table(spark, sf_dir, "embeddings")
    return _samp2.cluster_balanced_sample(emb, _CENTS,
                                          target_per_cell=40)


_SPLIT_CASE = ("CASE " + " ".join(
    f"WHEN u < {ub!r} THEN '{nm}'" for nm, ub in _SPLIT_UB)
    + f" ELSE '{_SPLITS[-1][0]}' END")

_SPLIT_ORACLE = f"""
WITH u AS (SELECT doc_id, lang,
                  {_duck_h32_id('doc_id', 'v1')} / {float(1 << 32)!r} AS u
           FROM documents),
s AS (SELECT lang, {_SPLIT_CASE} AS split FROM u)
SELECT split, lang, COUNT(*) AS n_docs FROM s GROUP BY split, lang
"""


@query("sample_split_counts", oracle=_SPLIT_ORACLE)
def sample_split_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = testkit.load_table(spark, sf_dir, "documents")
    return (_samp.hash_split(docs, _SPLITS)
            .groupBy("split", "lang")
            .agg(F.count(F.lit(1)).alias("n_docs")))


_QUOTA_ORACLE = f"""
WITH r AS (SELECT doc_id, lang,
                  row_number() OVER (PARTITION BY lang ORDER BY
                    {_duck_h32_id('doc_id', 'q1')} / {float(1 << 32)!r},
                    doc_id) AS rk
           FROM documents)
SELECT doc_id, lang FROM r WHERE rk <= 20
"""


@query("quota_sample", oracle=_QUOTA_ORACLE)
def quota_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = testkit.load_table(spark, sf_dir, "documents")
    return (_samp.per_group_quota(docs, ["lang"], 20)
            .select("doc_id", "lang"))


_PACK_BUDGET = 1000

_PACK_ORACLE = r"""
WITH d AS (SELECT doc_id, lang,
                  CAST(len(string_split_regex(text, '\s+')) AS BIGINT)
                    AS n_tokens
           FROM documents),
""" + f"""
o AS (SELECT lang, n_tokens,
             SUM(n_tokens) OVER (PARTITION BY lang ORDER BY
               {_duck_h32_id('doc_id', 'p1')} / {float(1 << 32)!r},
               doc_id ROWS UNBOUNDED PRECEDING) AS run
      FROM d),
p AS (SELECT lang,
             CAST(floor((run - n_tokens) / {_PACK_BUDGET}) AS BIGINT)
               AS pack_id,
             n_tokens
      FROM o)
SELECT lang, pack_id, COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens
FROM p GROUP BY lang, pack_id
"""


@query("sequence_packing", oracle=_PACK_ORACLE)
def sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = (testkit.load_table(spark, sf_dir, "documents")
            .select("doc_id", "lang",
                    F.size(F.split(F.col("text"), r"\s+"))
                    .cast("long").alias("n_tokens")))
    packed = _samp.pack_sequences(docs, _PACK_BUDGET,
                                  group_cols=["lang"])
    return (packed.groupBy("lang", "pack_id")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_tokens").cast("long").alias("pack_tokens")))


# Fixed-size token chunking with overlap (64-token windows, 16-token
# overlap): the narrow-explode chunker that precedes embedding/packing.
# DuckDB's inclusive list slice t[a:b] mirrors Spark's clamping
# slice(t, a, len) exactly.
_CHUNK_C, _CHUNK_S = 64, 48

_CHUNK_ORACLE = rf"""
WITH tok AS (SELECT doc_id, string_split_regex(text, '\s+') AS t
             FROM documents),
n AS (SELECT doc_id, t,
             CASE WHEN len(t) <= {_CHUNK_C} THEN 1 ELSE
               CAST(ceil((len(t) - {_CHUNK_C})
                    / CAST({_CHUNK_S} AS DOUBLE)) AS INT) + 1 END AS nc
      FROM tok),
ex AS (SELECT doc_id, t, UNNEST(range(0, nc)) AS k FROM n)
SELECT doc_id AS id, CAST(k AS BIGINT) AS chunk_idx,
       CAST(len(t[1 + k * {_CHUNK_S} : k * {_CHUNK_S} + {_CHUNK_C}])
            AS BIGINT) AS n_chunk_tokens,
       array_to_string(t[1 + k * {_CHUNK_S} : k * {_CHUNK_S} + {_CHUNK_C}],
                       ' ') AS chunk_text
FROM ex
"""


@query("document_chunking", oracle=_CHUNK_ORACLE)
def document_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = testkit.load_table(spark, sf_dir, "documents")
    return _samp.chunk_documents(docs, chunk_tokens=_CHUNK_C,
                                 overlap=_CHUNK_C - _CHUNK_S)


# Domain-mixture rebalance: deterministic hash-threshold sampling to a
# non-uniform target mixture (weight 1..4 by source index mod 4). The
# rate table is in-plan and broadcast; the corpus never shuffles — see
# operators/sampling.mixture_sample. Counts are binomial around w_d·T;
# the oracle replays the identical double arithmetic and hash.
_MIX_WEIGHTS = {f"src{i}": float(1 + (i % 4)) for i in range(20)}
_MIX_TOTAL = sum(_MIX_WEIGHTS.values())
_MIX_CASE = ("CASE " + " ".join(
    f"WHEN source = '{s}' THEN {w / _MIX_TOTAL!r}"
    for s, w in _MIX_WEIGHTS.items()) + " ELSE NULL END")

_MIX_ORACLE = f"""
WITH cnt AS (SELECT source, CAST(COUNT(*) AS DOUBLE) AS n
             FROM documents GROUP BY source),
w AS (SELECT source, n, {_MIX_CASE} AS w FROM cnt),
t AS (SELECT MIN(n / w) AS t FROM w WHERE w > 0),
r AS (SELECT source, LEAST(1.0, w * t / n) AS rate
      FROM w, t WHERE w > 0)
SELECT d.source, COUNT(*) AS n_kept, floor((MAX(r.rate)) * 1000000.0 + 0.5) / 1000000.0 AS sample_rate
FROM documents d JOIN r ON d.source = r.source
WHERE {_duck_h32_id('doc_id', 'm1')} / {float(1 << 32)!r} < r.rate
GROUP BY d.source
"""


@query("domain_mixture_sample", oracle=_MIX_ORACLE)
def domain_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = testkit.load_table(spark, sf_dir, "documents")
    kept = _samp.mixture_sample(docs, _MIX_WEIGHTS)
    return (kept.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_kept"),
                 _rq(F.max("sample_rate"), 6).alias("sample_rate")))


# Decontamination: corpus docs sharing ≥ 5 distinct 3-gram hashes with
# the stand-in eval suite (documents with doc_id % 13 == 0). Planted
# exact/near copies of eval docs are caught too — the leak the check
# exists for. The bench-postings CTE block is shared verbatim with the
# capstone pipeline's oracle so the two recipes cannot drift.
_BENCH_POSTINGS_CTES = r"""
btok AS (SELECT doc_id AS bid, string_split_regex(text, '\s+') AS t
         FROM documents WHERE doc_id % 13 = 0),
bsh AS (SELECT bid, list_distinct(list_transform(range(1, len(t) - 1),
        i -> t[i] || ' ' || t[i + 1] || ' ' || t[i + 2])) AS s FROM btok),
bh AS (SELECT DISTINCT bid, h FROM (
""" + f"""
  SELECT bid, {_DUCK_H32} AS h
  FROM (SELECT bid, unnest(s) AS x FROM bsh WHERE len(s) > 0)))
"""

_CONTAM_ORACLE = testkit.syn_corpus_cte() + r"""
, tok AS (SELECT doc_id AS id, string_split_regex(text, '\s+') AS t FROM corpus),
sh AS (SELECT id, list_distinct(list_transform(range(1, len(t) - 1),
       i -> t[i] || ' ' || t[i + 1] || ' ' || t[i + 2])) AS s FROM tok),
ch AS (SELECT DISTINCT id, h FROM (
""" + f"""
  SELECT id, {_DUCK_H32} AS h
  FROM (SELECT id, unnest(s) AS x FROM sh WHERE len(s) > 0))),
""" + _BENCH_POSTINGS_CTES + """
SELECT ch.id AS doc_id, bh.bid AS bench_id, COUNT(*) AS n_shared
FROM ch JOIN bh ON ch.h = bh.h
GROUP BY ch.id, bh.bid
HAVING COUNT(*) >= 5
"""


@query("benchmark_contamination", oracle=_CONTAM_ORACLE)
def benchmark_contamination_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = testkit.syn_corpus(spark, sf_dir)
    bench = (testkit.load_table(spark, sf_dir, "documents")
             .where(F.col("doc_id") % 13 == 0)
             .select("doc_id", "text"))
    return _dedup.benchmark_contamination(corpus, bench, n=3,
                                          min_shared=5)


# Capstone: the full corpus-preparation pipeline as ONE query —
# exact + near-dup dedup to survivors, eval-suite decontamination,
# then the deterministic train/val/test split, reported per
# (split, lang). Every stage is a declared operator composed as-is;
# the oracle stitches the same proven CTE blocks (minhash prefix +
# cluster/survivor CTEs + contamination postings + split CASE), so
# the whole pipeline hash-matches end to end.
_PREP_TAIL = _CLEAN_CTES + r"""
, clean AS (
  SELECT v.doc_id, v.lang, v.n_chars
  FROM verdict v JOIN exact e ON v.fp = e.fp AND v.doc_id = e.keep_id
  WHERE v.is_survivor),
""" + f"""
cch AS (SELECT DISTINCT id, {_DUCK_H32} AS h
        FROM (SELECT id, unnest(s) AS x FROM sh2)),
""" + _BENCH_POSTINGS_CTES + f""",
contam AS (SELECT ch.id FROM cch ch JOIN bh b ON ch.h = b.h
           GROUP BY ch.id, b.bid HAVING COUNT(*) >= 5),
contam_ids AS (SELECT DISTINCT id FROM contam),
kept AS (SELECT c.* FROM clean c
         ANTI JOIN contam_ids x ON c.doc_id = x.id),
u AS (SELECT doc_id, lang, n_chars,
             {_duck_h32_id('doc_id', 'v1')} / {float(1 << 32)!r} AS u
      FROM kept),
s AS (SELECT lang, n_chars, {_SPLIT_CASE} AS split FROM u)
SELECT split, lang, COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS n_chars
FROM s GROUP BY split, lang
"""

_PREP_ORACLE = _minhash_oracle_sql(testkit.syn_corpus_cte(),
                                   tail=_PREP_TAIL)


@query("corpus_prep_pipeline", oracle=_PREP_ORACLE)
def corpus_prep_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = testkit.syn_corpus(spark, sf_dir)
    # Shingle ONCE: the same persisted 3-gram sets feed the minhash
    # stage AND the decontamination postings (the oracle's cch CTE
    # reads sh2 the same way) — one tokenize scan per corpus, not one
    # per stage.
    sh = _dedup.shingle_sets(corpus).persist()
    # 1. dedup: exact-fingerprint keepers ∩ near-dup cluster survivors
    pairs = _dedup.minhash_neardup(corpus, shingles=sh)
    surv = _dedup.dedup_survivors(corpus,
                                  _dedup.duplicate_clusters(pairs))
    exact_keep = (corpus.groupBy(F.md5("text").alias("keep_fp"))
                  .agg(F.min("doc_id").alias("keep_id")))
    clean = (surv.where("is_survivor")
             .withColumn("fp", F.md5("text"))
             .join(exact_keep,
                   (F.col("fp") == F.col("keep_fp"))
                   & (F.col("doc_id") == F.col("keep_id"))))
    # 2. decontaminate against the stand-in eval suite, reusing the
    # persisted shingles (contamination flags on docs the dedup stage
    # already dropped are harmless under the anti-join).
    bench = (testkit.load_table(spark, sf_dir, "documents")
             .where(F.col("doc_id") % 13 == 0)
             .select("doc_id", "text"))
    contam = _dedup.benchmark_contamination(
        clean.select("doc_id", "text"), bench, n=3, min_shared=5,
        corpus_shingles=sh)
    kept = clean.join(contam.select("doc_id"), "doc_id", "left_anti")
    # 3. deterministic split, reported per (split, lang)
    return (_samp.hash_split(kept, _SPLITS)
            .groupBy("split", "lang")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum(F.length("text")).cast("long").alias("n_chars")))


# Ordered funnel (operators/funnels.py): first-touch step progression
# view → click → purchase per user, with a 7-day conversion horizon
# from the user's first view. One MIN aggregation per step, all keyed
# by user (the per-step join's build side is one row per user).
_FUNNEL_STEPS = ["view", "click", "purchase"]
_FUNNEL_WITHIN_US = 7 * 86400 * 1_000_000

_FUNNEL_ORACLE = f"""
WITH ev AS (SELECT user_id AS u, event_type AS et, epoch_us(ts) AS t
            FROM events),
s0 AS (SELECT u, MIN(t) AS t, MIN(t) AS t0 FROM ev
       WHERE et = '{_FUNNEL_STEPS[0]}' GROUP BY u),
s1 AS (SELECT e.u, MIN(e.t) AS t, MIN(r.t0) AS t0
       FROM ev e JOIN s0 r ON e.u = r.u AND e.t > r.t
            AND e.t <= r.t0 + {_FUNNEL_WITHIN_US}
       WHERE e.et = '{_FUNNEL_STEPS[1]}' GROUP BY e.u),
s2 AS (SELECT e.u, MIN(e.t) AS t, MIN(r.t0) AS t0
       FROM ev e JOIN s1 r ON e.u = r.u AND e.t > r.t
            AND e.t <= r.t0 + {_FUNNEL_WITHIN_US}
       WHERE e.et = '{_FUNNEL_STEPS[2]}' GROUP BY e.u)
SELECT CAST(0 AS BIGINT) AS step_idx, '{_FUNNEL_STEPS[0]}' AS step,
       COUNT(*) AS n_users FROM s0
UNION ALL
SELECT CAST(1 AS BIGINT), '{_FUNNEL_STEPS[1]}', COUNT(*) FROM s1
UNION ALL
SELECT CAST(2 AS BIGINT), '{_FUNNEL_STEPS[2]}', COUNT(*) FROM s2
"""


@query("event_funnel", oracle=_FUNNEL_ORACLE)
def event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pointdatabase_spark.operators import funnels as _fn
    ev = testkit.load_table(spark, sf_dir, "events")
    ev = ev.select("user_id", "event_type",
                   timeconv.events_tus(ev).alias("tus"))
    return _fn.funnel_counts(ev, _FUNNEL_STEPS,
                             within_us=_FUNNEL_WITHIN_US)


# Streaming near-dup flagging: LSH band collisions within a watermark
# horizon (streaming/neardup.py). Arrival times are deterministic —
# tus = (1 + (doc_id % 100000) % 720) hours, so both plant families
# (+100000 exact, +200000 truncated) land at the same instant as their
# original and are flagged against it. The
# anchor-chain rule is the gap-session rule per band key, so the
# oracle is pure window SQL over the SAME md5 minhash signatures.
_STREAM_NEARDUP_HORIZON_US = 48 * 3600 * 1_000_000

_STREAM_NEARDUP_ORACLE = testkit.syn_corpus_cte(base_mod=3) + r"""
, tok AS (SELECT doc_id AS id, string_split_regex(text, '\s+') AS t FROM corpus),
sh AS (
  SELECT id, list_distinct(list_transform(range(1, len(t) - 1),
         i -> t[i] || ' ' || t[i + 1] || ' ' || t[i + 2])) AS s
  FROM tok),
sh2 AS (SELECT id, s FROM sh WHERE len(s) > 0),
""" + f"""
ex AS (SELECT id, {_DUCK_H32} % {_P31} AS h
       FROM (SELECT id, unnest(s) AS x FROM sh2)),
sig AS (SELECT id,
         {_MH_MINS}
        FROM ex GROUP BY id),
band AS (
  {_MH_BANDS}),
bt AS (SELECT id, bkey,
              CAST(1 + (id % 100000) % 720 AS BIGINT) * 3600000000 AS tus
       FROM band),
ord AS (SELECT id, bkey, tus,
               lag(tus) OVER (PARTITION BY bkey ORDER BY tus, id) AS prev
        FROM bt),
sess AS (SELECT id, bkey, tus,
                SUM(CASE WHEN prev IS NULL
                         OR tus - prev > {_STREAM_NEARDUP_HORIZON_US}
                         THEN 1 ELSE 0 END)
                  OVER (PARTITION BY bkey ORDER BY tus, id) AS sid
         FROM ord),
fl AS (SELECT bkey, id, tus,
              first_value(id) OVER (PARTITION BY bkey, sid
                                    ORDER BY tus, id) AS anchor,
              row_number() OVER (PARTITION BY bkey, sid
                                 ORDER BY tus, id) AS rn
       FROM sess)
SELECT bkey, id AS dup_id, anchor AS match_id, tus
FROM fl WHERE rn > 1
"""


@query("streaming_neardup", oracle=_STREAM_NEARDUP_ORACLE)
def streaming_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # base_mod=3: deterministic third of the base corpus before
    # planting (r11 bench trim — full drain was 15.6 s of fixture
    # cost; every state transition the tests pin — same-instant
    # flags, 48 h horizon evictions across the 720 h arrival spread
    # — survives the subset, and the oracle plants from the same
    # filtered base).
    from pointdatabase_spark.streaming import neardup as _nd
    return _nd.run_stream_neardup_availablenow(
        spark, sf_dir, _STREAM_NEARDUP_HORIZON_US, base_mod=3)


# --------------------------------------------------------------------------
# JSON scalar extraction over `events.props` (F-extension; the
# reference has no JSON, but a training pipeline does).
# --------------------------------------------------------------------------

_JSON_ORACLE = """
SELECT event_type,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       COUNT(*) AS n
FROM events
GROUP BY event_type
"""


@query("json_extract_agg", oracle=_JSON_ORACLE)
def json_extract_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = testkit.load_table(spark, sf_dir, "events")
    return (ev.groupBy("event_type")
            .agg(F.sum(F.get_json_object("props", "$.k").cast("long"))
                 .alias("sum_k"),
                 F.count(F.lit(1)).alias("n")))


# --------------------------------------------------------------------------
# Multimodal plumbing: binary payload column → mapInPandas decode stub
# (operators/multimodal.py). Oracle recomputes the deterministic fake
# metadata from the text bytes in SQL.
# --------------------------------------------------------------------------

_MULTIMODAL_ORACLE = """
WITH p AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0 THEN 'image'
              WHEN doc_id % 3 = 1 THEN 'audio'
              ELSE 'video' END AS media_type,
         CAST(octet_length(encode(text)) AS BIGINT) AS n,
         md5(text) AS fp
  FROM documents)
SELECT doc_id, media_type, n AS byte_len,
       64 + n % 192 AS width,
       64 + (n * 7) % 128 AS height,
       CASE WHEN media_type = 'video' THEN 1 + n % 24
            WHEN media_type = 'audio' THEN 1 + n % 16
            ELSE 1 END AS n_frames,
       fp
FROM p
"""


@query("multimodal_decode", oracle=_MULTIMODAL_ORACLE)
def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pointdatabase_spark.operators import multimodal as _mm
    docs = testkit.load_table(spark, sf_dir, "documents")
    return _mm.decode_media(_mm.attach_payload(docs))


_RESIZE_ORACLE = """
WITH p AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0 THEN 'image'
              WHEN doc_id % 3 = 1 THEN 'audio'
              ELSE 'video' END AS media_type,
         CAST(octet_length(encode(text)) AS BIGINT) AS n,
         md5(text) AS fp0
  FROM documents),
d AS (
  SELECT doc_id, media_type,
         64 + n % 192 AS width, 64 + (n * 7) % 128 AS height, fp0
  FROM p)
SELECT doc_id, media_type, width, height,
       least(width, 128) AS out_w, least(height, 96) AS out_h,
       md5(fp0 || ':' || CAST(least(width, 128) AS VARCHAR) || 'x'
           || CAST(least(height, 96) AS VARCHAR)) AS fp
FROM d
"""


@query("multimodal_resize", oracle=_RESIZE_ORACLE)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pointdatabase_spark.operators import multimodal as _mm
    docs = testkit.load_table(spark, sf_dir, "documents")
    return _mm.resize_media(
        _mm.decode_media(_mm.attach_payload(docs)), max_w=128, max_h=96)


_FRAMES_ORACLE = """
WITH p AS (
  SELECT doc_id, text,
         CASE WHEN doc_id % 3 = 0 THEN 'image'
              WHEN doc_id % 3 = 1 THEN 'audio'
              ELSE 'video' END AS media_type,
         CAST(octet_length(encode(text)) AS BIGINT) AS n
  FROM documents),
v AS (SELECT doc_id, text, 1 + n % 24 AS n_frames
      FROM p WHERE media_type = 'video'),
e AS (SELECT doc_id, text,
             unnest(generate_series(0, n_frames - 1, 3)) AS k
      FROM v)
SELECT doc_id, CAST(k AS BIGINT) AS frame_idx,
       md5(text || ':' || CAST(k AS VARCHAR)) AS frame_fp
FROM e
"""


@query("multimodal_frame_sample", oracle=_FRAMES_ORACLE)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pointdatabase_spark.operators import multimodal as _mm
    docs = testkit.load_table(spark, sf_dir, "documents")
    return _mm.sample_frames(_mm.attach_payload(docs), step=3)


# REAL codec path (r6): payloads are genuine PNG/WAV bytes
# (sources/media.py stdlib codecs) of doc_id-derived content — decode
# actually inflates/unfilters pixels and walks RIFF chunks; the
# oracles recompute the closed-form dims and exact integer statistics
# the content was generated from, so a codec bug (wrong unfilter,
# wrong slice) breaks the value match.

_REAL_DECODE_ORACLE = """
SELECT doc_id,
       CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
            ELSE 'video' END AS media_type,
       CASE doc_id % 3 WHEN 0 THEN 16 + doc_id % 17
            WHEN 1 THEN 64 + doc_id % 193
            ELSE 8 + doc_id % 11 END AS width,
       CASE doc_id % 3 WHEN 0 THEN 8 + doc_id % 13
            WHEN 1 THEN CAST(1 AS BIGINT)
            ELSE 6 + doc_id % 9 END AS height,
       CASE doc_id % 3 WHEN 2 THEN 2 + doc_id % 7
            ELSE CAST(1 AS BIGINT) END AS n_frames
FROM documents
"""


@query("multimodal_real_decode", oracle=_REAL_DECODE_ORACLE)
def multimodal_real_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real PNG/WAV/APNG decode: width/height are the PIXEL dims
    parsed out of the zlib-inflated, row-unfiltered image
    (sample/channel counts for audio, frame count from the APNG
    animation-control chunk for video), not metadata echoes — the
    oracle knows what dims the generator used, so the decode must
    recover them exactly."""
    from pointdatabase_spark.operators import multimodal as _mm
    docs = testkit.load_table(spark, sf_dir, "documents")
    dec = _mm.decode_media(_mm.attach_real_payload(docs), decoder="real")
    return dec.select("doc_id", "media_type", "width", "height",
                      "n_frames")


_REAL_RESIZE_ORACLE = """
SELECT doc_id,
       CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
            ELSE 'video' END AS media_type,
       CASE doc_id % 3 WHEN 0 THEN 16 + doc_id % 17
            WHEN 1 THEN 64 + doc_id % 193
            ELSE 8 + doc_id % 11 END AS width,
       CASE doc_id % 3 WHEN 0 THEN 8 + doc_id % 13
            WHEN 1 THEN CAST(1 AS BIGINT)
            ELSE 6 + doc_id % 9 END AS height,
       CASE doc_id % 3 WHEN 0 THEN least(16 + doc_id % 17, 20)
            WHEN 1 THEN least(64 + doc_id % 193, 20)
            ELSE least(8 + doc_id % 11, 20) END AS out_w,
       CASE doc_id % 3 WHEN 0 THEN least(8 + doc_id % 13, 10)
            WHEN 1 THEN CAST(1 AS BIGINT)
            ELSE least(6 + doc_id % 9, 10) END AS out_h
FROM documents
"""


@query("multimodal_real_resize", oracle=_REAL_RESIZE_ORACLE)
def multimodal_real_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real resize: PNGs are decoded and nearest-neighbor downsampled
    to the (20, 10) cap, audio truncated to 20 samples; the projected
    dims must match the closed form (fingerprints of the resized
    pixels are computed but not oracle-projected — md5 of a pixel
    grid is not SQL)."""
    from pointdatabase_spark.operators import multimodal as _mm
    docs = testkit.load_table(spark, sf_dir, "documents")
    rs = _mm.resize_media(_mm.attach_real_payload(docs), max_w=20,
                          max_h=10, decoder="real")
    return rs.select("doc_id", "media_type", "width", "height",
                     "out_w", "out_h")


_REAL_FEATURES_ORACLE = """
WITH m AS (SELECT doc_id, 16 + doc_id % 17 AS w, 8 + doc_id % 13 AS h,
                  64 + doc_id % 193 AS n,
                  2 + doc_id % 7 AS nf, 6 + doc_id % 9 AS vh,
                  8 + doc_id % 11 AS vw
           FROM documents),
img AS (
  -- format-variant mix (attach_real_payload): id%9==0 is a 16-BIT
  -- PNG of k*257 (normalize /65535), id%9==3 a PALETTE PNG whose
  -- decoded RGB components are (k, 3k%256, 7k%256) (3 samples per
  -- pixel), id%9==6 plain 8-bit grey
  SELECT m.doc_id, 'image' AS media_type,
         CASE m.doc_id % 9
           WHEN 0 THEN (CAST(SUM(v.v * 257) AS DOUBLE)
                        / (m.w * m.h)) / 65535.0
           WHEN 3 THEN (CAST(SUM(v.v + (v.v * 3) % 256
                                 + (v.v * 7) % 256) AS DOUBLE)
                        / (m.w * m.h * 3)) / 255.0
           ELSE (CAST(SUM(v.v) AS DOUBLE) / (m.w * m.h)) / 255.0
         END AS f0,
         CASE m.doc_id % 9
           WHEN 0 THEN CAST(MAX(v.v * 257) AS DOUBLE) / 65535.0
           WHEN 3 THEN CAST(MAX(GREATEST(v.v, (v.v * 3) % 256,
                                         (v.v * 7) % 256))
                            AS DOUBLE) / 255.0
           ELSE CAST(MAX(v.v) AS DOUBLE) / 255.0
         END AS f1,
         CASE m.doc_id % 9
           WHEN 0 THEN CAST(MIN(v.v * 257) AS DOUBLE) / 65535.0
           WHEN 3 THEN CAST(MIN(LEAST(v.v, (v.v * 3) % 256,
                                      (v.v * 7) % 256))
                            AS DOUBLE) / 255.0
           ELSE CAST(MIN(v.v) AS DOUBLE) / 255.0
         END AS f2
  FROM m,
       LATERAL (SELECT unnest(range(0, m.h)) AS i) ii,
       LATERAL (SELECT unnest(range(0, m.w)) AS j) jj,
       LATERAL (SELECT (m.doc_id * 31 + ii.i * 7 + jj.j * 13) % 256
                AS v) v
  WHERE m.doc_id % 3 = 0
  GROUP BY m.doc_id, m.w, m.h),
aud AS (
  SELECT m.doc_id, 'audio' AS media_type,
         (CAST(SUM(v.v) AS DOUBLE) / m.n) / 32768.0 AS f0,
         CAST(MAX(v.v) AS DOUBLE) / 32768.0 AS f1,
         CAST(MIN(v.v) AS DOUBLE) / 32768.0 AS f2
  FROM m,
       LATERAL (SELECT unnest(range(0, m.n)) AS i) ii,
       LATERAL (SELECT (m.doc_id * 97 + ii.i * 17) % 65536 - 32768
                AS v) v
  WHERE m.doc_id % 3 = 1
  GROUP BY m.doc_id, m.n),
vid AS (
  SELECT m.doc_id, 'video' AS media_type,
         (CAST(SUM(v.v) AS DOUBLE) / (m.nf * m.vh * m.vw)) / 255.0
           AS f0,
         CAST(MAX(v.v) AS DOUBLE) / 255.0 AS f1,
         CAST(MIN(v.v) AS DOUBLE) / 255.0 AS f2
  FROM m,
       LATERAL (SELECT unnest(range(0, m.nf)) AS f) ff,
       LATERAL (SELECT unnest(range(0, m.vh)) AS i) ii,
       LATERAL (SELECT unnest(range(0, m.vw)) AS j) jj,
       LATERAL (SELECT (m.doc_id * 31 + ff.f * 11 + ii.i * 7
                        + jj.j * 13) % 256 AS v) v
  WHERE m.doc_id % 3 = 2
  GROUP BY m.doc_id, m.nf, m.vh, m.vw)
SELECT * FROM img UNION ALL SELECT * FROM aud
UNION ALL SELECT * FROM vid
"""


@query("multimodal_real_features", oracle=_REAL_FEATURES_ORACLE)
def multimodal_real_features(spark: SparkSession, sf_dir: str
                             ) -> DataFrame:
    """Real pixel/sample statistics from decoded media: f0/f1/f2 =
    normalized mean/max/min — exact int reductions + one or two IEEE
    divisions, bit-equal to the oracle's enumeration of the same
    generated content (image pixels, PCM samples, APNG frame voxels).
    A wrong Paeth branch or slice in the codec shifts the sums and
    fails the value hash."""
    from pointdatabase_spark.operators import multimodal as _mm
    docs = testkit.load_table(spark, sf_dir, "documents")
    return _mm.extract_features(_mm.attach_real_payload(docs),
                                extractor="real")


_REAL_FRAMES_ORACLE = """
WITH m AS (SELECT doc_id, 2 + doc_id % 7 AS nf, 6 + doc_id % 9 AS h,
                  8 + doc_id % 11 AS w
           FROM documents WHERE doc_id % 3 = 2),
fr AS (SELECT doc_id, nf, h, w, unnest(range(0, nf)) AS f FROM m),
keep AS (SELECT * FROM fr WHERE f % 2 = 0)
SELECT k.doc_id, k.f AS frame_idx,
       (CAST(SUM(v.v) AS DOUBLE) / (k.h * k.w)) / 255.0 AS f_mean
FROM keep k,
     LATERAL (SELECT unnest(range(0, k.h)) AS i) ii,
     LATERAL (SELECT unnest(range(0, k.w)) AS j) jj,
     LATERAL (SELECT (k.doc_id * 31 + k.f * 11 + ii.i * 7
                      + jj.j * 13) % 256 AS v) v
GROUP BY k.doc_id, k.f, k.h, k.w
"""


@query("multimodal_real_frames", oracle=_REAL_FRAMES_ORACLE)
def multimodal_real_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real video frame sampling: APNG animations are genuinely
    decoded (acTL/fcTL/fdAT chunk walk, per-frame zlib streams) and
    every 2nd frame's mean luma is emitted — an exact int reduction,
    bit-equal to the oracle's per-frame voxel enumeration. The
    non-APNG container path stays NotImplementedError (ffmpeg absent);
    the UDTF row-explosion shape matches the fake-path
    multimodal_frame_sample."""
    from pointdatabase_spark.operators import multimodal as _mm
    docs = testkit.load_table(spark, sf_dir, "documents")
    return _mm.sample_frames(_mm.attach_real_payload(docs), step=2,
                             decoder="real")


_GIF_FRAMES_ORACLE = """
WITH m AS (SELECT doc_id, 2 + doc_id % 7 AS nf, 6 + doc_id % 9 AS h,
                  8 + doc_id % 11 AS w
           FROM documents),
fr AS (SELECT doc_id, nf, h, w, unnest(range(0, nf)) AS f FROM m),
keep AS (SELECT * FROM fr WHERE f % 2 = 0)
SELECT k.doc_id, k.f AS frame_idx,
       (CAST(SUM(v.v) AS DOUBLE) / (k.h * k.w)) / 255.0 AS f_mean
FROM keep k,
     LATERAL (SELECT unnest(range(0, k.h)) AS i) ii,
     LATERAL (SELECT unnest(range(0, k.w)) AS j) jj,
     LATERAL (SELECT (k.doc_id * 31 + k.f * 11 + ii.i * 7
                      + jj.j * 13) % 256 AS v) v
GROUP BY k.doc_id, k.f, k.h, k.w
"""


@query("multimodal_gif_frames", oracle=_GIF_FRAMES_ORACLE)
def multimodal_gif_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real animated-GIF frame sampling (sources/gif.py — new r8):
    variable-width LZW, palette lookup, frame compositing, and (odd
    ids) 4-pass row interlace genuinely decoded inside the same
    mapInPandas frame-sample operator the APNG path uses; every 2nd
    frame's mean luma is an exact int reduction — GIF's
    channel-replicated gray decode makes it bit-equal to the voxel
    oracle."""
    from pointdatabase_spark.operators import multimodal as _mm
    docs = testkit.load_table(spark, sf_dir, "documents")
    return _mm.sample_frames(_mm.attach_gif_payload(docs), step=2,
                             decoder="real")


_JPEG_DECODE_ORACLE = """
SELECT doc_id,
       CAST(16 + doc_id % 17 AS BIGINT) AS width,
       CAST(8 + doc_id % 13 AS BIGINT) AS height
FROM documents
WHERE doc_id % 3 = 0
"""


@query("multimodal_jpeg_decode", oracle=_JPEG_DECODE_ORACLE)
def multimodal_jpeg_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real JPEG decode (sources/jpeg.py — new r8) over the
    image-typed third of the corpus (doc_id ≡ 0 mod 3, the
    attach_payload modality convention): every payload is a genuine
    JFIF bitstream (LUT-based Huffman entropy decode, dequantize,
    IDCT, chroma upsample, YCbCr->RGB), cycling six profiles —
    grayscale / RGB 4:4:4 / RGB 4:2:0-with-restart-markers, each as
    BASELINE and as PROGRESSIVE (SOF2 multi-scan: spectral selection
    + successive approximation).  JPEG is lossy, so the oracle checks
    the decoded PIXEL dimensions (exact by construction); pixel error
    bounds are pinned in tests/test_jpeg.py.  Scale shape: same as
    every multimodal stage — the codec runs inside Arrow-batched
    mapInPandas, one file per row, embarrassingly parallel across
    executors; the modality filter is pushed to the parquet scan."""
    from pointdatabase_spark.operators import multimodal as _mm
    docs = (testkit.load_table(spark, sf_dir, "documents")
            .filter(F.col("doc_id") % 3 == 0))
    dec = _mm.decode_media(_mm.attach_jpeg_payload(docs),
                           decoder="real")
    return dec.select("doc_id", "width", "height")


# Feature extraction (the model-forward-pass stage, deterministic fake):
# f_k = md5(payload ‖ ':k') 48-bit prefix × 2⁻⁴⁸ — exact in double on
# both engines (48-bit int exact; division by 2⁴⁸ exact).

def _duck_hex48(expr: str) -> str:
    """DuckDB BIGINT from the first 12 md5 hex digits of `expr` —
    the same two-6-digit-half construction as the fp48 text feature."""
    def half(off: int) -> str:
        return ("CAST(list_sum(list_transform(range(6), j -> "
                f"(strpos('0123456789abcdef', substr(md5({expr}), "
                f"CAST(j + {off + 1} AS INT), 1)) - 1)"
                " * 16.0 ** (5 - j))) AS BIGINT)")
    return f"({half(0)} * 16777216 + {half(6)})"


_FEAT_COLS = ",\n       ".join(
    "CAST(" + _duck_hex48(f"text || ':{k}'") + " AS DOUBLE)"
    + f" / 281474976710656.0 AS f{k}" for k in range(4))

_FEATURES_ORACLE = f"""
SELECT doc_id,
       CASE WHEN doc_id % 3 = 0 THEN 'image'
            WHEN doc_id % 3 = 1 THEN 'audio'
            ELSE 'video' END AS media_type,
       {_FEAT_COLS}
FROM documents
"""


@query("multimodal_features", oracle=_FEATURES_ORACLE)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pointdatabase_spark.operators import multimodal as _mm
    docs = testkit.load_table(spark, sf_dir, "documents")
    return _mm.extract_features(_mm.attach_payload(docs), dim=4)


# Feature→ANN bridge: the extracted multimodal feature vectors feed the
# similarity stack unchanged (extract_features emits scalar f0..f3;
# assembling them into an array column IS the hand-off) — the "find
# similar media" query a multimodal lake runs after the embedding
# stage. Same exact-cosine kernel and rank tie-break as cosine_topk.
def _duck_cos4(a: str, b: str) -> str:
    return (f"{_duck_dot(a, b, 4)} / (sqrt({_duck_dot(a, a, 4)})"
            f" * sqrt({_duck_dot(b, b, 4)}))")


_MM_ANN_ORACLE = f"""
WITH feats AS (SELECT doc_id,
       {_FEAT_COLS}
FROM documents),
v AS (SELECT doc_id AS vec_id, [f0, f1, f2, f3] AS embedding FROM feats),
q AS (SELECT vec_id AS q_id, embedding AS qv FROM v WHERE vec_id < 5),
j AS (SELECT q.q_id, v.vec_id, {_duck_cos4('q.qv', 'v.embedding')} AS cos
      FROM v, q),
r AS (SELECT q_id, vec_id, cos,
             CAST(row_number() OVER (PARTITION BY q_id
                  ORDER BY cos DESC, vec_id) AS BIGINT) AS rank
      FROM j)
SELECT q_id, vec_id, cos, rank FROM r WHERE rank <= 5
"""


@query("multimodal_feature_ann", oracle=_MM_ANN_ORACLE)
def multimodal_feature_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pointdatabase_spark.operators import multimodal as _mm
    docs = testkit.load_table(spark, sf_dir, "documents")
    feats = _mm.extract_features(_mm.attach_payload(docs), dim=4)
    emb = feats.select(F.col("doc_id").alias("vec_id"),
                       F.array("f0", "f1", "f2", "f3").alias("embedding"))
    return _sim.cosine_topk(emb, emb.where(F.col("vec_id") < 5), k=5)


# --------------------------------------------------------------------------
# O1 radial+angular bin ordering (geo_index.py:80-83): the reference's
# stable index key order. Rank-only output — the key mixes sqrt/atan2
# whose last-ulp varies by libm, but adjacent keys differ macroscopically
# so the ORDER is engine-stable.
# --------------------------------------------------------------------------

import math as _math  # noqa: E402

_BIN_ORDER_ORACLE = testkit.syn_points_cte() + f"""
, b0 AS (SELECT DISTINCT round(x / 10000) AS bx0, round(y / 10000) AS by0 FROM pts),
b AS (SELECT CASE WHEN bx0 = 0 THEN 0.0 ELSE bx0 END AS bx,
             CASE WHEN by0 = 0 THEN 0.0 ELSE by0 END AS by FROM b0)
SELECT CAST(bx * 10000 AS BIGINT) AS bin_x, CAST(by * 10000 AS BIGINT) AS bin_y,
       CAST(row_number() OVER (ORDER BY
            floor((sqrt(bx * bx + by * by)
                   + (atan2(bx, by) + {_math.pi!r}) / 2 / {_math.pi!r})
                  * 1000000.0 + 0.5) / 1000000.0,
            bx, by) AS BIGINT) AS ord_rank
FROM b
"""


@query("radial_bin_ordering", oracle=_BIN_ORDER_ORACLE)
def radial_bin_ordering(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window
    from pointdatabase_spark.functions import binning
    pts = testkit.syn_points(spark, sf_dir)
    b = (pts.select(F.round(F.col("x") / 10000, 0).alias("bx"),
                    F.round(F.col("y") / 10000, 0).alias("by"))
         .distinct())
    w = Window.orderBy(_rq(binning.radial_angular_key("bx", "by"), 6),
                       "bx", "by")
    return b.select((F.col("bx") * 10000).cast("long").alias("bin_x"),
                    (F.col("by") * 10000).cast("long").alias("bin_y"),
                    F.row_number().over(w).cast("long").alias("ord_rank"))


# --------------------------------------------------------------------------
# Temporal joins & rollups (operators/temporal.py): as-of join, banded
# interval join, and the hypertable-style multi-resolution rollup —
# the time-series counterparts of the reference's spatial join/index
# cascade (geo_index bins → time buckets). Oracles use DuckDB's native
# ASOF JOIN / inequality joins, so the two engines reach the same
# result through genuinely different physical plans.
# --------------------------------------------------------------------------

from pointdatabase_spark.operators import temporal as _temporal  # noqa: E402

_ASOF_TOL_US = 21_600_000_000  # 6 h

_ASOF_ORACLE = f"""
WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS tus, event_type,
                  value
           FROM events),
c AS (SELECT user_id, tus, MAX(value) AS value
      FROM e WHERE event_type = 'click' GROUP BY user_id, tus),
p AS (SELECT user_id, event_id, tus, value
      FROM e WHERE event_type = 'purchase')
SELECT p.user_id, p.event_id, p.tus, p.value,
       CASE WHEN c.tus >= p.tus - {_ASOF_TOL_US} THEN c.tus END
         AS tus_m,
       CASE WHEN c.tus >= p.tus - {_ASOF_TOL_US} THEN c.value END
         AS value_m
FROM p ASOF LEFT JOIN c
  ON p.user_id = c.user_id AND p.tus >= c.tus
"""


@query("asof_join_clicks", oracle=_ASOF_ORACLE)
def asof_join_clicks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attach to each purchase the user's most recent click at-or-
    before it, ≤6 h stale. Union-marker + running-last window: one
    key shuffle, no range-join blowup (operators/temporal.asof_join).
    Oracle: DuckDB's native ASOF LEFT JOIN — an independent engine
    path pinning the same greatest-ts-≤ semantics."""
    ev = testkit.load_table(spark, sf_dir, "events")
    ev = ev.select("event_id", "user_id",
                   timeconv.events_tus(ev).alias("tus"),
                   "event_type", "value")
    clicks = (ev.where(F.col("event_type") == "click")
              .groupBy("user_id", "tus")
              .agg(F.max("value").alias("value")))
    purch = (ev.where(F.col("event_type") == "purchase")
             .select("user_id", "event_id", "tus", "value"))
    return _temporal.asof_join(purch, clicks, on="user_id",
                               right_cols=["value"],
                               tolerance=_ASOF_TOL_US)


_BAND_LO_US = -86_400_000_000  # clicks up to 1 day BEFORE each error
_BAND_ORACLE = f"""
WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS tus, event_type
           FROM events)
SELECT r.user_id,
       r.event_id AS event_id_l, r.tus AS tus_l,
       c.event_id AS event_id_r, c.tus AS tus_r
FROM (SELECT * FROM e WHERE event_type = 'error') r
JOIN (SELECT * FROM e WHERE event_type = 'click') c
  ON r.user_id = c.user_id
 AND c.tus BETWEEN r.tus + {_BAND_LO_US} AND r.tus
"""


@query("temporal_band_join", oracle=_BAND_ORACLE)
def temporal_band_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every (error, click-within-1-day-before) pair per user.
    Bucketized to a pure equi-join on (user, time-bucket) with ≤2
    bucket copies per left row (operators/temporal.band_join); the
    oracle is the plain inequality join."""
    ev = testkit.load_table(spark, sf_dir, "events")
    ev = ev.select("event_id", "user_id",
                   timeconv.events_tus(ev).alias("tus"), "event_type")
    err = (ev.where(F.col("event_type") == "error")
           .select("user_id", "event_id", "tus"))
    clk = (ev.where(F.col("event_type") == "click")
           .select("user_id", "event_id", "tus"))
    return _temporal.band_join(err, clk, on="user_id",
                               lo=_BAND_LO_US, hi=0)


_ROLLUP_RES = [60, 3600, 86400]

_MR_FINE = f"""
WITH e AS (SELECT event_type, epoch_us(ts) AS tus, value FROM events),
fine AS (
  SELECT event_type,
         (tus // {60 * 1_000_000}) * {60 * 1_000_000} AS bucket_us,
         COUNT(*) AS n, SUM(value) AS sum_v,
         MIN(value) AS min_v, MAX(value) AS max_v
  FROM e GROUP BY event_type, bucket_us)
"""

_MR_LEVEL = """
SELECT event_type, CAST({res} AS BIGINT) AS res_s,
       (bucket_us // {rus}) * {rus} AS bucket_us,
       CAST(SUM(n) AS BIGINT) AS n, floor((SUM(sum_v)) * 1000000.0 + 0.5) / 1000000.0 AS sum_v,
       MIN(min_v) AS min_v, MAX(max_v) AS max_v
FROM fine GROUP BY event_type, (bucket_us // {rus}) * {rus}
"""

_MR_ORACLE = _MR_FINE + "\nUNION ALL\n".join(
    _MR_LEVEL.format(res=r, rus=r * 1_000_000) for r in _ROLLUP_RES)


@query("multires_rollup", oracle=_MR_ORACLE)
def multires_rollup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-aggregate ladder: per-event-type count/sum/min/max
    at 1 min / 1 h / 1 day. Only the 1-minute level scans the base
    table; coarser levels re-aggregate it (operators/temporal.
    multires_rollup) — at 100 TB the day rollup reads ~10^-3 of the
    base bytes. The oracle mirrors the same cascade."""
    ev = testkit.load_table(spark, sf_dir, "events")
    ev = ev.select("event_type", timeconv.events_tus(ev).alias("tus"),
                   "value")
    out = _temporal.multires_rollup(ev, ts="tus", keys=["event_type"],
                                    value="value",
                                    resolutions_s=_ROLLUP_RES)
    return (out.withColumn("sum_v", _rq("sum_v", 6))
            .withColumn("res_s", F.col("res_s").cast("long")))


# --------------------------------------------------------------------------
# OLAP aggregation surfaces (operators/olap.py): grouping sets,
# top-k per group, exact percentile ladder.
# --------------------------------------------------------------------------

from pointdatabase_spark.operators import olap as _olap  # noqa: E402

_GROUPING_ORACLE = """
SELECT o_orderpriority, o_orderstatus,
       CAST(GROUPING(o_orderpriority, o_orderstatus) AS BIGINT) AS gid,
       COUNT(*) AS n_orders,
       floor((SUM(o_totalprice)) * 100.0 + 0.5) / 100.0 AS sum_total
FROM orders
GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
"""


@query("grouping_rollup", oracle=_GROUPING_ORACLE)
def grouping_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP (priority, status) with grouping-id in ONE Expand+agg
    pass (operators/olap.rollup_agg) — grand total, per-priority, and
    per-(priority,status) rows from a single scan, partial aggregation
    map-side."""
    orders = testkit.load_table(spark, sf_dir, "orders")
    return _olap.rollup_agg(
        orders, ["o_orderpriority", "o_orderstatus"],
        [F.count(F.lit(1)).alias("n_orders"),
         _rq(F.sum("o_totalprice"), 2).alias("sum_total")])


_TOPK_ORACLE = """
WITH s AS (SELECT o_custkey, floor((SUM(o_totalprice)) * 100.0 + 0.5) / 100.0 AS spend,
                  COUNT(*) AS n_orders
           FROM orders GROUP BY o_custkey),
j AS (SELECT CAST(c.c_nationkey AS BIGINT) AS c_nationkey,
             c.c_custkey, s.spend, s.n_orders
      FROM s JOIN customer c ON s.o_custkey = c.c_custkey),
r AS (SELECT *, CAST(row_number() OVER (
            PARTITION BY c_nationkey
            ORDER BY spend DESC, c_custkey) AS BIGINT) AS rank_in_group
      FROM j)
SELECT c_nationkey, c_custkey, spend, n_orders, rank_in_group
FROM r WHERE rank_in_group <= 3
"""


@query("topk_per_group", oracle=_TOPK_ORACLE)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 customers by order revenue per nation. Aggregate-before-
    join (orders collapse to one row per customer BEFORE touching the
    customer dim), then rank-filter; Spark 3.5+ plans the filtered
    window as WindowGroupLimit (per-partition running top-k, groups
    never fully materialize). Ranked on the ROUNDED spend so both
    engines order identical doubles; custkey tiebreak.  customer is
    SF x 150k rows — no broadcast hint (AQE decides; a forced hint
    would override the size check and OOM at cluster SF)."""
    orders = testkit.load_table(spark, sf_dir, "orders")
    cust = testkit.load_table(spark, sf_dir, "customer")
    spend = (orders.groupBy("o_custkey")
             .agg(_rq(F.sum("o_totalprice"), 2).alias("spend"),
                  F.count(F.lit(1)).alias("n_orders")))
    j = (spend.join(cust.select(
            "c_custkey", F.col("c_nationkey").cast("long")
            .alias("c_nationkey")),
         spend.o_custkey == F.col("c_custkey"))
         .select("c_nationkey", "c_custkey", "spend", "n_orders"))
    return _olap.top_k_per_group(j, ["c_nationkey"], "spend", 3,
                                 tiebreak="c_custkey")


from pointdatabase_spark.operators import fuzzy as _fuzzy  # noqa: E402

# The oracle is the definitional quadratic join (with the valid
# |len diff| <= d band so DuckDB doesn't DP every pair); the engine
# side must reproduce it through segment blocking + banded verify —
# a lost pigeonhole case (short strings, boundary positions) shows up
# as a row-count mismatch, a wrong verify as a value mismatch.
_EDIT_JOIN_ORACLE = """
SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
       CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
FROM part a JOIN part b
  ON a.p_partkey < b.p_partkey
 AND abs(length(a.p_name) - length(b.p_name)) <= 2
WHERE levenshtein(a.p_name, b.p_name) <= 2
"""


@query("edit_distance_join", oracle=_EDIT_JOIN_ORACLE)
def edit_distance_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-resolution fuzzy self-join: part-name pairs within edit
    distance 2 via Pass-Join segment blocking (operators/fuzzy.py) —
    d+1 pigeonhole segments equi-joined against position-bounded
    substrings, candidates verified with one banded levenshtein each.
    No O(n²) stage anywhere on the engine side."""
    part = testkit.load_table(spark, sf_dir, "part")
    return _fuzzy.edit_distance_pairs(part, "p_partkey", "p_name", d=2)


# SNM blocking recall audit: candidate generation replayed rank-for-
# rank in SQL (binary string collation matches Spark's UTF8 ordering
# on this ASCII column); truth is the definitional quadratic join over
# distinct names.
_SNM_ORACLE = """
WITH names AS (SELECT DISTINCT p_name AS s FROM part),
r1 AS (SELECT s, row_number() OVER (ORDER BY s, s) AS rk FROM names),
r2 AS (SELECT s, row_number() OVER (ORDER BY reverse(s), s) AS rk
       FROM names),
r3 AS (SELECT s, row_number() OVER (
           ORDER BY array_to_string(list_sort(string_split(s, ' ')),
                                    ' '), s) AS rk
       FROM names),
r4 AS (SELECT s, row_number() OVER (
           ORDER BY substring(s, instr(s, ' ') + 1), s) AS rk
       FROM names),
cand AS (
  SELECT least(a.s, b.s) AS s_lo, greatest(a.s, b.s) AS s_hi
  FROM r1 a JOIN r1 b ON b.rk > a.rk AND b.rk <= a.rk + 5
  UNION
  SELECT least(a.s, b.s), greatest(a.s, b.s)
  FROM r2 a JOIN r2 b ON b.rk > a.rk AND b.rk <= a.rk + 5
  UNION
  SELECT least(a.s, b.s), greatest(a.s, b.s)
  FROM r3 a JOIN r3 b ON b.rk > a.rk AND b.rk <= a.rk + 5
  UNION
  SELECT least(a.s, b.s), greatest(a.s, b.s)
  FROM r4 a JOIN r4 b ON b.rk > a.rk AND b.rk <= a.rk + 5),
c AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_candidates,
             CAST(SUM(CASE WHEN levenshtein(s_lo, s_hi) <= 2
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_found
      FROM cand),
t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_true
      FROM names a JOIN names b ON a.s < b.s
      WHERE levenshtein(a.s, b.s) <= 2)
SELECT n_true, n_candidates, n_found,
       CAST(CASE WHEN n_true = 0 THEN 1000000
                 ELSE (1000000 * n_found) // n_true END AS BIGINT)
         AS recall_ppm
FROM t, c
"""


@query("snm_blocking_audit", oracle=_SNM_ORACLE)
def snm_blocking_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured recall of four-pass Sorted-Neighborhood blocking
    (window 5; keys = name, reversed name, space-sorted tokens,
    rest-of-string after the first token) against the exact
    Pass-Join truth on part names — the ER analog of
    lsh_recall_audit: SNM is the classic at-scale candidate
    generator and its misses are an empirical number to monitor,
    not assert. Measured ladder on this corpus (identical at
    sf0.001 and sf0.01): forward pass alone 0/24 true pairs (edits
    are mid-string), + reverse key 16/24, + sorted-token key 20/24
    (neutralizes edits inside any non-leading token), +
    rest-of-string key 24/24 — the 4 residual misses were
    first-token edits ("new plate" / "red plate") whose token also
    led the sorted view; dropping the first token makes those keys
    identical. The audit is what justifies (or indicts) a key
    set."""
    part = testkit.load_table(spark, sf_dir, "part")
    return _fuzzy.snm_candidate_audit(
        part, "p_partkey", "p_name", d=2, window=5,
        key_exprs=["s", "reverse(s)",
                   "array_join(array_sort(split(s, ' ')), ' ')",
                   "substring(s, instr(s, ' ') + 1)"])


# ER capstone: fuzzy edges -> converged connected components ->
# cluster census. The oracle recomputes components with a recursive
# min-reachability CTE over the definitional quadratic pair join
# (closure is component-size²-bounded — fine at oracle scale, which
# is exactly why the ENGINE side uses pointer jumping instead).
_ER_ORACLE = """
WITH RECURSIVE pr AS (
  SELECT a.p_partkey AS u, b.p_partkey AS v
  FROM part a JOIN part b
    ON a.p_partkey < b.p_partkey
   AND abs(length(a.p_name) - length(b.p_name)) <= 2
 WHERE levenshtein(a.p_name, b.p_name) <= 2),
nodes AS (SELECT u AS id FROM pr UNION SELECT v FROM pr),
edges AS (SELECT u, v FROM pr UNION ALL SELECT v, u FROM pr),
reach(id, r) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT e.u, reach.r FROM edges e JOIN reach ON reach.id = e.v),
lab AS (SELECT id, MIN(r) AS cluster_id FROM reach GROUP BY id)
SELECT l.cluster_id, CAST(COUNT(*) AS BIGINT) AS n_members,
       CAST(COUNT(DISTINCT p.p_name) AS BIGINT) AS n_names,
       MIN(p.p_name) AS canonical_name
FROM lab l JOIN part p ON p.p_partkey = l.id
GROUP BY l.cluster_id
"""


@query("entity_resolution", oracle=_ER_ORACLE)
def entity_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end entity resolution on part names: Pass-Join fuzzy
    pairs (d=2) feed the dedup family's pointer-jumping connected
    components to fixpoint, then one aggregate emits the entity
    census — members, distinct surface forms, and the
    lexicographically-canonical name per entity.

    The dedupe-before-kernel doctrine applies TWICE: the fuzzy kernel
    already runs on distinct strings, and the CC graph here is also
    name-level — each distinct name is represented by its min
    partkey, so the component join touches |name-pairs| edges, not
    the C(k,2)·pairs id-level clique expansion (5.5M edges collapse
    to 24 at sf0.1; measured 10.3 s → kernel-bound). Component-min
    over representatives equals component-min over ALL member ids
    (each rep IS its name's min id), so cluster ids — and the whole
    census — are identical to the id-level formulation the oracle
    computes."""
    part = testkit.load_table(spark, sf_dir, "part")
    reps = (part.groupBy("p_name")
            .agg(F.min("p_partkey").alias("rep"),
                 F.count(F.lit(1)).alias("_k")))
    pairs = _fuzzy.edit_distance_pairs(reps, "rep", "p_name", d=2)
    lab = _dedup.duplicate_clusters_converged(pairs)
    name_cluster = reps.join(
        lab.select(F.col("doc_id").alias("rep"), "cluster_id"), "rep")
    # a duplicated name with NO fuzzy partner is still an entity in
    # the id-level graph (its dist-0 clique): singleton name-cluster
    solo = (reps.where(F.col("_k") >= 2)
            .join(name_cluster.select("p_name"), "p_name", "left_anti")
            .select("p_name", F.col("rep").alias("cluster_id")))
    name_cluster = (name_cluster.select("p_name", "cluster_id")
                    .unionByName(solo))
    return (part.join(name_cluster, "p_name")
            .groupBy("cluster_id")
            .agg(F.count(F.lit(1)).alias("n_members"),
                 F.countDistinct("p_name").alias("n_names"),
                 F.min("p_name").alias("canonical_name")))


# Exact skyline semantics pinned by the textbook NOT-EXISTS dominance
# anti-join; the engine side (olap.pareto_frontier) must agree after
# its grid prune + per-x reduction + running-max sweep — any pruning
# bug (a frontier point grid-pruned, a duplicate tie dropped) breaks
# the hash, not just the row count.
_PARETO_ORACLE = """
SELECT a.p_partkey, a.p_retailprice, a.p_size
FROM part a
WHERE NOT EXISTS (
  SELECT 1 FROM part b
  WHERE b.p_retailprice <= a.p_retailprice AND b.p_size >= a.p_size
    AND (b.p_retailprice < a.p_retailprice OR b.p_size > a.p_size))
"""


@query("pareto_frontier", oracle=_PARETO_ORACLE)
def pareto_frontier_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline of the part catalog: cheapest-for-the-size frontier
    (minimize p_retailprice, maximize p_size). The operator's plan is
    three narrow stages — grid census prune, per-x max, distinct-x
    running-max sweep — versus the oracle's O(n²) dominance anti-join;
    duplicate frontier points (same price and size) all survive on
    both sides."""
    part = testkit.load_table(spark, sf_dir, "part")
    return _olap.pareto_frontier(
        part.select("p_partkey", "p_retailprice", "p_size"),
        "p_retailprice", "p_size")


_PCTL_ORACLE = """
SELECT event_type,
       floor((quantile_cont(value, 0.50)) * 1000000.0 + 0.5) / 1000000.0 AS p50,
       floor((quantile_cont(value, 0.90)) * 1000000.0 + 0.5) / 1000000.0 AS p90,
       floor((quantile_cont(value, 0.99)) * 1000000.0 + 0.5) / 1000000.0 AS p99
FROM events GROUP BY event_type
"""


@query("percentile_summary", oracle=_PCTL_ORACLE)
def percentile_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact p50/p90/p99 of event value per type via the built-in
    `percentile` aggregate (linear interpolation — DuckDB
    quantile_cont parity). operators/olap.percentile_by_group's
    exact=False flips to approx_percentile (map-combinable sketch)
    for the 100 TB mode."""
    ev = testkit.load_table(spark, sf_dir, "events")
    return _olap.percentile_by_group(ev, ["event_type"], "value",
                                     [0.5, 0.9, 0.99])


_NEAREST_TOL_US = 3_600_000_000  # ±1 h

_ASOF_NEAREST_ORACLE = f"""
WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS tus, event_type,
                  value
           FROM events),
v AS (SELECT user_id, tus, MAX(value) AS value
      FROM e WHERE event_type = 'view' GROUP BY user_id, tus),
r AS (SELECT user_id, event_id, tus
      FROM e WHERE event_type = 'error'),
u AS (SELECT user_id, tus, 1 AS side, event_id,
             NULL::BIGINT AS mtus, NULL::DOUBLE AS mval
      FROM r
      UNION ALL
      SELECT user_id, tus, 0, NULL, tus, value FROM v),
w AS (SELECT *,
        last_value(mtus IGNORE NULLS) OVER bw AS bt,
        last_value(mval IGNORE NULLS) OVER bw AS bv,
        last_value(mtus IGNORE NULLS) OVER fw AS ft,
        last_value(mval IGNORE NULLS) OVER fw AS fv
      FROM u
      WINDOW bw AS (PARTITION BY user_id ORDER BY tus, side
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             fw AS (PARTITION BY user_id ORDER BY tus DESC, side
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
t AS (SELECT user_id, event_id, tus,
             CASE WHEN bt >= tus - {_NEAREST_TOL_US} THEN bt END AS bt,
             CASE WHEN bt >= tus - {_NEAREST_TOL_US} THEN bv END AS bv,
             CASE WHEN ft <= tus + {_NEAREST_TOL_US} THEN ft END AS ft,
             CASE WHEN ft <= tus + {_NEAREST_TOL_US} THEN fv END AS fv
      FROM w WHERE side = 1)
SELECT user_id, event_id, tus,
       CASE WHEN ft IS NULL OR (bt IS NOT NULL AND tus - bt <= ft - tus)
            THEN bt ELSE ft END AS tus_m,
       CASE WHEN ft IS NULL OR (bt IS NOT NULL AND tus - bt <= ft - tus)
            THEN bv ELSE fv END AS value_m
FROM t
"""


@query("asof_nearest", oracle=_ASOF_NEAREST_ORACLE)
def asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each error event matched to the NEAREST view event by the same
    user within ±1 h (backward on ties), per-candidate tolerance
    before the choice — pandas merge_asof(direction='nearest')
    semantics at Spark scale: still ONE key shuffle, two in-partition
    sorts, zero join operators."""
    ev = testkit.load_table(spark, sf_dir, "events")
    ev = ev.select("event_id", "user_id",
                   timeconv.events_tus(ev).alias("tus"),
                   "event_type", "value")
    views = (ev.where(F.col("event_type") == "view")
             .groupBy("user_id", "tus")
             .agg(F.max("value").alias("value")))
    errs = (ev.where(F.col("event_type") == "error")
            .select("user_id", "event_id", "tus"))
    return _temporal.asof_join(errs, views, on="user_id",
                               right_cols=["value"],
                               tolerance=_NEAREST_TOL_US,
                               direction="nearest")


_IVL_ORACLE = """
WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS tus, event_type,
                  epoch_us(ts) + CAST(floor(value * 60000000) AS BIGINT)
                    AS te
           FROM events)
SELECT l.user_id,
       l.event_id AS event_id_l, l.tus AS tus_l, l.te AS te_l,
       r.event_id AS event_id_r, r.tus AS tus_r, r.te AS te_r
FROM (SELECT * FROM e WHERE event_type = 'error') l
JOIN (SELECT * FROM e WHERE event_type = 'view') r
  ON l.user_id = r.user_id AND l.tus <= r.te AND r.tus <= l.te
"""


@query("interval_overlap_join", oracle=_IVL_ORACLE)
def interval_overlap_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variable-length interval overlap per user (error activity
    windows × view activity windows, window length = value minutes).
    Both sides explode to the 1 h buckets they span, the join is a
    pure equi-join on (user, bucket), and the ownership-bucket rule
    emits each overlapping pair exactly once WITHOUT a distinct pass
    (operators/temporal.interval_join). Oracle: the plain inequality
    join."""
    ev = testkit.load_table(spark, sf_dir, "events")
    ev = ev.select("event_id", "user_id",
                   timeconv.events_tus(ev).alias("tus"), "event_type",
                   "value")
    iv = ev.select("event_id", "user_id", "tus", "event_type",
                   (F.col("tus") + F.floor(F.col("value") * 60000000)
                    .cast("long")).alias("te"))
    errs = (iv.where(F.col("event_type") == "error")
            .select("user_id", "event_id", "tus", "te"))
    views = (iv.where(F.col("event_type") == "view")
             .select("user_id", "event_id", "tus", "te"))
    return _temporal.interval_join(
        errs, views, on="user_id", left_start="tus", left_end="te",
        right_start="tus", right_end="te", bucket_us=3_600_000_000)


# --------------------------------------------------------------------------
# Pivot + hopping windows: the remaining core OLAP reshaping surfaces.
# --------------------------------------------------------------------------

_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]

_PIVOT_ORACLE = f"""
SELECT user_id,
       {", ".join(f"COUNT(*) FILTER (WHERE event_type = '{t}') AS {t}"
                  for t in _EVENT_TYPES)}
FROM events GROUP BY user_id
"""


@query("pivot_event_counts", oracle=_PIVOT_ORACLE)
def pivot_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide per-user event-type count matrix via pivot with an
    EXPLICIT value list — one hash aggregate, no second pass to
    discover pivot values (the implicit form runs a distinct job
    first and caps at spark.sql.pivotMaxValues; at 100 TB always
    enumerate). Absent combinations fill 0 like the oracle's
    COUNT FILTER."""
    ev = testkit.load_table(spark, sf_dir, "events")
    return (ev.groupBy("user_id")
            .pivot("event_type", _EVENT_TYPES)
            .agg(F.count(F.lit(1)))
            .na.fill(0, _EVENT_TYPES))


_HOP_SLIDE_US = 10_800_000_000  # 3 h slide, 6 h length

_HOP_ORACLE = f"""
WITH e AS (SELECT epoch_us(ts) AS tus, value FROM events),
h AS (SELECT ((tus // {_HOP_SLIDE_US}) - o.o) * {_HOP_SLIDE_US}
               AS win_start_us,
             value
      FROM e, (VALUES (0), (1)) o(o))
SELECT win_start_us, COUNT(*) AS n, floor((SUM(value)) * 1000000.0 + 0.5) / 1000000.0 AS sum_v
FROM h GROUP BY win_start_us
"""


@query("hopping_window_counts", oracle=_HOP_ORACLE)
def hopping_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping (sliding) 6 h windows every 3 h via the built-in
    `window()` expression in BATCH mode — each event lands in exactly
    length/slide = 2 windows, expanded map-side before the partial
    aggregate (same operator Structured Streaming uses, so the batch
    and stream forms share semantics). Oracle: union of two offset
    tumbling group-bys."""
    ev = testkit.load_table(spark, sf_dir, "events")
    ev = ev.select(timeconv.events_tus(ev).alias("tus"), "value")
    w = F.window(F.timestamp_micros("tus"), "6 hours", "3 hours")
    return (ev.groupBy(w.alias("w"))
            .agg(F.count(F.lit(1)).alias("n"),
                 _rq(F.sum("value"), 6).alias("sum_v"))
            .select(F.unix_micros(F.col("w.start")).alias("win_start_us"),
                    "n", "sum_v"))


# Lambert conformal conic (the continental-mapping staple): Snyder
# closed forms as built-in Columns from ONE SQL text valid in both
# Spark SQL and DuckDB — textually identical arithmetic, quantized to
# 10 m like crs_utm to absorb libm last-ulp drift between engines.

_LCC_LATLON_SQL = """
SELECT l_orderkey * 10 + l_linenumber AS row_id,
       CAST(25 AS DOUBLE) + CAST(l_partkey % 2400 AS DOUBLE) / CAST(100 AS DOUBLE) AS lat,
       CAST(-120 AS DOUBLE) + CAST(l_orderkey % 5000 AS DOUBLE) / CAST(100 AS DOUBLE) AS lon
FROM lineitem
"""

_LCC_PARAMS = dict(lat1=33.0, lat2=45.0, lat0=23.0, lon0=-96.0,
                   x0=0.0, y0=0.0)
_LCC_X, _LCC_Y = _crs.conic_sql_exprs("lcc", **_LCC_PARAMS,
                                      lat="lat", lon="lon")

_LCC_ORACLE = f"""
WITH ll AS ({_LCC_LATLON_SQL})
SELECT row_id, lat, lon,
       CAST(floor(({_LCC_X}) * 0.1 + 0.5) AS BIGINT) * 10 AS x_lcc_10m,
       CAST(floor(({_LCC_Y}) * 0.1 + 0.5) AS BIGINT) * 10 AS y_lcc_10m
FROM ll
"""


@query("crs_lcc", oracle=_LCC_ORACLE)
def crs_lcc(spark: SparkSession, sf_dir: str) -> DataFrame:
    testkit.load_table(spark, sf_dir, "lineitem") \
        .createOrReplaceTempView("lineitem")
    return spark.sql(_LCC_ORACLE)


_TRAIL_SPAN_US = 7 * 86_400_000_000  # 7-day trailing window

_TRAIL_ORACLE = f"""
WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS tus, value
           FROM events)
SELECT user_id, event_id, tus,
       COUNT(*) OVER w AS n_trail,
       floor((SUM(value) OVER w) * 1000000.0 + 0.5) / 1000000.0 AS sum_trail
FROM e
WINDOW w AS (PARTITION BY user_id ORDER BY tus
             RANGE BETWEEN {_TRAIL_SPAN_US} PRECEDING AND CURRENT ROW)
"""


@query("trailing_window_agg", oracle=_TRAIL_ORACLE)
def trailing_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day trailing count/sum per user on every event — a RANGE
    frame (operators/temporal.trailing_agg), so equal-timestamp peers
    share a frame and the result is deterministic under duplicate
    timestamps.  Cost (see the operator docstring): Spark re-aggregates
    the buffered frame on every frame change, so per-key cost is
    O(rows × avg frame size) — fine for human-scale keys; for dense
    keys pre-reduce with multires_rollup first (declared as the
    `rollup_trailing_window` query)."""
    ev = testkit.load_table(spark, sf_dir, "events")
    ev = ev.select("event_id", "user_id",
                   timeconv.events_tus(ev).alias("tus"), "value")
    out = _temporal.trailing_agg(ev, on="user_id", ts="tus",
                                 value="value", span_us=_TRAIL_SPAN_US)
    return out.select("user_id", "event_id", "tus", "n_trail",
                      _rq("sum_trail", 6).alias("sum_trail"))


_RT_RES_S = 3600  # pre-reduce grain: 1 hour

_RT_ORACLE = f"""
WITH e AS (SELECT event_type, epoch_us(ts) AS tus, value FROM events),
b AS (SELECT event_type,
             (tus // {_RT_RES_S * 1_000_000}) * {_RT_RES_S * 1_000_000}
               AS bucket_us,
             COUNT(*) AS n, SUM(value) AS sum_v
      FROM e GROUP BY event_type, bucket_us)
SELECT event_type, bucket_us,
       CAST(SUM(n) OVER w AS BIGINT) AS n_trail,
       floor((SUM(sum_v) OVER w) * 1000000.0 + 0.5) / 1000000.0 AS sum_trail
FROM b
WINDOW w AS (PARTITION BY event_type ORDER BY bucket_us
             RANGE BETWEEN {_TRAIL_SPAN_US} PRECEDING AND CURRENT ROW)
"""


@query("rollup_trailing_window", oracle=_RT_ORACLE)
def rollup_trailing_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DENSE-KEY trailing-window scale path pinned as a green row:
    7-day trailing count/sum per event_type (a handful of keys × every
    event — exactly where trailing_agg's O(rows × frame) window
    degenerates), computed by pre-reducing to an hourly rollup and
    running the RANGE frame over buckets
    (operators/temporal.rollup_trailing).  Window cost drops to
    O(buckets × 168) per key regardless of event density; trailing
    semantics are at bucket granularity.  Same precedent as
    table_profile's documented approx mode: the 100 TB mode gets its
    own oracle-verified query."""
    ev = testkit.load_table(spark, sf_dir, "events")
    ev = ev.select("event_type", timeconv.events_tus(ev).alias("tus"),
                   "value")
    out = _temporal.rollup_trailing(ev, ts="tus", keys=["event_type"],
                                    value="value", res_s=_RT_RES_S,
                                    span_us=_TRAIL_SPAN_US)
    return out.select("event_type", "bucket_us", "n_trail",
                      _rq("sum_trail", 6).alias("sum_trail"))


_IMP_BUDGET = 0.3

_IMP_ORACLE = f"""
WITH w AS (SELECT doc_id, lang, CAST(length(text) AS DOUBLE) AS wt
           FROM documents),
m AS (SELECT AVG(wt) AS mw FROM w)
SELECT doc_id, lang
FROM w, m
WHERE {_duck_h32_id('doc_id', 'w1')} / {float(1 << 32)!r}
      < least(1.0, {_IMP_BUDGET!r} * wt / mw)
"""


# Systematic PPS: the oracle computes the SAME md5-hash total order
# with one global cumsum window (fine at oracle scale; the engine uses
# the bucket-offset distributed prefix sum) and the same BIGINT
# threshold-count inversion.
_PPS_K = 500

_PPS_ORACLE = f"""
WITH w AS (SELECT doc_id AS id, CAST(n_chars AS BIGINT) AS wt,
                  {_duck_h32_id('doc_id', '')} AS h
           FROM documents WHERE n_chars > 0),
b AS (SELECT *, h % 64 AS bk FROM w),
cum AS (SELECT id, wt,
               SUM(wt) OVER (ORDER BY bk, h, id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS c_cur
        FROM b),
tot AS (SELECT SUM(wt) AS W FROM w),
hits AS (SELECT id, wt,
  LEAST({_PPS_K}, GREATEST(0, (2 * {_PPS_K} * c_cur + W - 1) // (2 * W)))
  - LEAST({_PPS_K}, GREATEST(0,
      (2 * {_PPS_K} * (c_cur - wt) + W - 1) // (2 * W))) AS n_hits
  FROM cum, tot)
SELECT id, wt, CAST(n_hits AS BIGINT) AS n_hits
FROM hits WHERE n_hits >= 1
"""


@query("systematic_pps_sample", oracle=_PPS_ORACLE)
def systematic_pps_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact fixed-k weighted sample (Madow systematic PPS) of the
    corpus by document length: k=500 midpoint thresholds over the
    hash-ordered weight line; Σn_hits = 500 exactly on any engine
    (sampling.systematic_pps — distributed bucket-offset prefix sum,
    no corpus-wide single-partition window)."""
    docs = testkit.load_table(spark, sf_dir, "documents")
    return _samp.systematic_pps(docs, "doc_id", "n_chars", k=_PPS_K)


@query("importance_sample", oracle=_IMP_ORACLE)
def importance_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted corpus downsampling: keep probability
    min(1, budget · w / mean(w)) with w = document length, assigned by
    the deterministic md5-hash threshold (operators/sampling.
    weighted_sample) — longer/higher-quality docs survive
    proportionally more often, expected kept fraction = budget, zero
    corpus shuffles (1-row mean broadcast back)."""
    docs = testkit.load_table(spark, sf_dir, "documents")
    docs = docs.withColumn("wt", F.length("text").cast("double"))
    return (_samp.weighted_sample(docs, "wt", _IMP_BUDGET,
                                  id_col="doc_id", salt="w1")
            .select("doc_id", "lang"))


# --------------------------------------------------------------------------
# Lexical retrieval (operators/retrieval.py): BM25 keyword search —
# the sparse counterpart of the ANN queries. Oracle mirrors the
# tokenize→filter→tf/df→score pipeline in SQL; ranking is on the
# ROUNDED score + doc_id so libm ln() drift cannot reorder the cut.
# --------------------------------------------------------------------------

_BM25_TERMS = ["spark", "vector", "stream"]
_BM25_K1, _BM25_B, _BM25_K = 1.2, 0.75, 20

_BM25_TERMS_SQL = ", ".join(f"'{t}'" for t in _BM25_TERMS)

_BM25_ORACLE = rf"""
WITH d AS (SELECT doc_id,
                  string_split_regex(lower(coalesce(text, '')), '\s+')
                    AS toks
           FROM documents),
dl AS (SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl, toks FROM d),
s AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs, AVG(dl) AS avgdl
      FROM dl),
tf AS (SELECT doc_id, dl, tok, CAST(COUNT(*) AS DOUBLE) AS tf
       FROM (SELECT doc_id, dl, UNNEST(toks) AS tok FROM dl)
       WHERE tok IN ({_BM25_TERMS_SQL})
       GROUP BY doc_id, dl, tok),
dfreq AS (SELECT tok, CAST(COUNT(*) AS DOUBLE) AS df FROM tf
          GROUP BY tok),
sc AS (SELECT tf.doc_id,
              floor((SUM(
                ln(1 + (s.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5))
                * tf.tf * {_BM25_K1 + 1.0!r}
                / (tf.tf + {_BM25_K1!r}
                   * ({1.0 - _BM25_B!r} + {_BM25_B!r} * tf.dl
                      / s.avgdl)))) * 1000000.0 + 0.5) / 1000000.0 AS bm25
       FROM tf JOIN dfreq ON tf.tok = dfreq.tok, s
       GROUP BY tf.doc_id)
SELECT doc_id, bm25 FROM sc
ORDER BY bm25 DESC, doc_id LIMIT {_BM25_K}
"""


@query("bm25_search", oracle=_BM25_ORACLE)
def bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 BM25 hits for a 3-term keyword query. The corpus is
    filtered to query-term tokens BEFORE any shuffle — the only
    doc-scale exchange is the (doc, term) tf aggregate over matching
    postings, O(query-term postings) not O(corpus tokens); df and
    (N, avgdl) broadcast into a map-side score expression."""
    from pointdatabase_spark.operators import retrieval as _retr
    docs = testkit.load_table(spark, sf_dir, "documents")
    return _retr.bm25_topk(docs, _BM25_TERMS, k=_BM25_K,
                           k1=_BM25_K1, b=_BM25_B)


# Z-order (Morton) bin ordering — the data-layout key for 2-D locality
# (functions/binning.zorder_key): exact integer arithmetic, oracle
# bit-for-bit. Complements O1's reference-parity radial order with the
# layout the tile store would actually sort by at 100 TB.

from pointdatabase_spark.functions import binning as _binning  # noqa: E402

_Z_ORACLE = testkit.syn_points_cte() + f"""
, b AS (SELECT DISTINCT CAST(round(x / 10000) AS BIGINT) AS bx,
                        CAST(round(y / 10000) AS BIGINT) AS by0
        FROM pts)
SELECT bx AS bin_x, by0 AS bin_y,
       {_binning.zorder_sql('bx', 'by0')} AS zkey,
       CAST(row_number() OVER (ORDER BY
            {_binning.zorder_sql('bx', 'by0')}) AS BIGINT) AS ord_rank
FROM b
"""


@query("zorder_bin_ordering", oracle=_Z_ORACLE)
def zorder_bin_ordering(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as _W
    pts = testkit.syn_points(spark, sf_dir)
    b = (pts.select(F.round(F.col("x") / 10000, 0).cast("long").alias("bin_x"),
                    F.round(F.col("y") / 10000, 0).cast("long").alias("bin_y"))
         .distinct())
    z = _binning.zorder_key("bin_x", "bin_y")
    b = b.withColumn("zkey", z)
    w = _W.orderBy("zkey")
    return b.select("bin_x", "bin_y", "zkey",
                    F.row_number().over(w).cast("long").alias("ord_rank"))


_CUBE_ORACLE = """
SELECT o_orderpriority, o_orderstatus,
       CAST(GROUPING(o_orderpriority, o_orderstatus) AS BIGINT) AS gid,
       COUNT(*) AS n_orders,
       floor((SUM(o_totalprice)) * 100.0 + 0.5) / 100.0 AS sum_total
FROM orders
GROUP BY CUBE (o_orderpriority, o_orderstatus)
"""


@query("grouping_cube", oracle=_CUBE_ORACLE)
def grouping_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE (priority, status): all four grouping sets — including the
    per-status marginals ROLLUP omits — in one Expand+agg pass."""
    orders = testkit.load_table(spark, sf_dir, "orders")
    return _olap.rollup_agg(
        orders, ["o_orderpriority", "o_orderstatus"],
        [F.count(F.lit(1)).alias("n_orders"),
         _rq(F.sum("o_totalprice"), 2).alias("sum_total")],
        cube=True)


# Continuous-aggregate maintenance, driver-scored end to end: the
# availableNow stream materializes the 1-minute rollup (idempotent
# per-day recompute, streaming/rollup.py), the hourly view derives
# from the STORED minute level, and the oracle aggregates the raw
# events directly — store-then-merge must equal direct.

# The oracle mirrors the engine's two-level shape (minute partials,
# then hourly re-aggregation of the partial sums) so both engines sum
# in the same minute-sum-of-sums association; rounding happens only at
# the end — the standard float-sum residual every other rounded oracle
# carries, not a new level-structure divergence.
_SROLL_ORACLE = """
WITH e AS (SELECT event_type, epoch_us(ts) AS tus, value FROM events),
fine AS (SELECT event_type,
                (tus // 60000000) * 60000000 AS mb,
                COUNT(*) AS n, SUM(value) AS sum_v,
                MIN(value) AS min_v, MAX(value) AS max_v
         FROM e GROUP BY event_type, (tus // 60000000) * 60000000)
SELECT event_type,
       (mb // 3600000000) * 3600000000 AS bucket_us,
       CAST(SUM(n) AS BIGINT) AS n,
       floor((SUM(sum_v)) * 1000000.0 + 0.5) / 1000000.0 AS sum_v,
       MIN(min_v) AS min_v, MAX(max_v) AS max_v
FROM fine GROUP BY event_type, (mb // 3600000000) * 3600000000
"""


@query("streaming_rollup", oracle=_SROLL_ORACLE)
def streaming_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pointdatabase_spark.streaming import rollup as _rollup
    dst = _rollup.run_events_rollup_availablenow(spark, sf_dir, res_s=60)
    out = _rollup.read_rollup(spark, dst, ["event_type"], 3600, 60)
    return (out.withColumn("sum_v", _rq("sum_v", 6))
            .withColumn("n", F.col("n").cast("long")))


# Repeat-track differencing — the sibling of crossover analysis for
# repeat orbits (reference scope: ATL06 repeats pair by along-track
# coordinate, ATL11-style): each cycle-2 point takes the NEAREST
# cycle-1 point of the same (rgt, pair, lr) track by along-track x,
# within ±5 km, and differences heights. The nearest-as-of operator
# applied in the reference's own domain: one key shuffle, no
# range-join blowup even with millions of points per track.

_RT_TOL = 5000

_RT_ORACLE = testkit.syn_points_cte() + f"""
, p AS (SELECT row_id, CAST(rgt * 8 + beam_pair * 2 + lr AS BIGINT)
               AS track_key, x, h, cycle
        FROM pts),
r AS (SELECT track_key, x, MAX(h) AS h FROM p WHERE cycle = 1
      GROUP BY track_key, x),
l AS (SELECT row_id, track_key, x, h FROM p WHERE cycle = 2),
u AS (SELECT track_key, x AS xx, 1 AS side, row_id, h,
             NULL::DOUBLE AS mx, NULL::DOUBLE AS mh
      FROM l
      UNION ALL
      SELECT track_key, x, 0, NULL, NULL, x, h FROM r),
w AS (SELECT *,
        last_value(mx IGNORE NULLS) OVER bw AS bx,
        last_value(mh IGNORE NULLS) OVER bw AS bh,
        last_value(mx IGNORE NULLS) OVER fw AS fx,
        last_value(mh IGNORE NULLS) OVER fw AS fh
      FROM u
      WINDOW bw AS (PARTITION BY track_key ORDER BY xx, side
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             fw AS (PARTITION BY track_key ORDER BY xx DESC, side
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
t AS (SELECT row_id, track_key, xx AS x, h,
             CASE WHEN bx >= xx - {_RT_TOL} THEN bx END AS bx,
             CASE WHEN bx >= xx - {_RT_TOL} THEN bh END AS bh,
             CASE WHEN fx <= xx + {_RT_TOL} THEN fx END AS fx,
             CASE WHEN fx <= xx + {_RT_TOL} THEN fh END AS fh
      FROM w WHERE side = 1),
sel AS (SELECT row_id, track_key, x, h,
               CASE WHEN fx IS NULL OR (bx IS NOT NULL AND x - bx <= fx - x)
                    THEN bx ELSE fx END AS x_m,
               CASE WHEN fx IS NULL OR (bx IS NOT NULL AND x - bx <= fx - x)
                    THEN bh ELSE fh END AS h_m
        FROM t)
SELECT row_id, track_key, x, h, x_m, h_m, h - h_m AS dh FROM sel
"""


@query("repeat_track_dh", oracle=_RT_ORACLE)
def repeat_track_dh(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = testkit.syn_points(spark, sf_dir)
    pts = pts.select("row_id",
                     (F.col("rgt").cast("long") * 8
                      + F.col("beam_pair").cast("long") * 2
                      + F.col("lr").cast("long")).alias("track_key"),
                     "x", "h", "cycle")
    ref = (pts.where(F.col("cycle") == 1)
           .groupBy("track_key", "x").agg(F.max("h").alias("h")))
    cur = (pts.where(F.col("cycle") == 2)
           .select("row_id", "track_key", "x", "h"))
    out = _temporal.asof_join(cur, ref, on="track_key",
                              left_ts="x", right_ts="x",
                              right_cols=["h"], tolerance=_RT_TOL,
                              direction="nearest")
    return out.select("row_id", "track_key", "x", "h", "x_m", "h_m",
                      (F.col("h") - F.col("h_m")).alias("dh"))


# Cohort retention (operators/funnels.cohort_retention): DAILY
# cohorts by first event, per-offset active counts — the classic
# retention triangle, zero windows, user-sized shuffles only. Daily
# buckets (not weekly) because the synthetic events span 30 days —
# a ~400-cell triangle instead of 5 rows.

_COHORT_W_US = 86_400_000_000

_COHORT_ORACLE = f"""
WITH e AS (SELECT user_id AS u, epoch_us(ts) // {_COHORT_W_US} AS w
           FROM events),
first AS (SELECT u, MIN(w) AS w0 FROM e GROUP BY u),
active AS (SELECT DISTINCT u, w FROM e),
cells AS (SELECT f.w0 AS cohort_bucket, a.w - f.w0 AS offset,
                 COUNT(*) AS n_active
          FROM active a JOIN first f ON a.u = f.u
          GROUP BY f.w0, a.w - f.w0),
sizes AS (SELECT w0 AS cohort_bucket, COUNT(*) AS cohort_size
          FROM first GROUP BY w0)
SELECT c.cohort_bucket, c.offset, c.n_active, s.cohort_size,
       floor((CAST(c.n_active AS DOUBLE) / s.cohort_size) * 1000000.0 + 0.5) / 1000000.0 AS retention
FROM cells c JOIN sizes s ON c.cohort_bucket = s.cohort_bucket
"""


@query("cohort_retention", oracle=_COHORT_ORACLE)
def cohort_retention_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pointdatabase_spark.operators import funnels as _fun
    ev = testkit.load_table(spark, sf_dir, "events")
    ev = ev.select("user_id", timeconv.events_tus(ev).alias("tus"))
    return _fun.cohort_retention(ev, bucket_us=_COHORT_W_US)


# --------------------------------------------------------------------------
# ATL11 corrected-height cycles (sources/atl11.py — the reference's
# last unmapped file type, geo_index.py:245-259/542-549): tidy
# (ref_pt, cycle_number) rows synthesized deterministically from
# lineitem in-Spark (4 repeat cycles, planted invalid cycles), then
# the per-point cycle collapse one-groupBy (valid-cycle count, mean
# height, latest-cycle height, first->last dh). The H5 converter
# itself (N x C matrices -> this tidy layout) is pinned by the
# tests/test_hdf5.py roundtrip, mirroring the S2/S3 pattern.
# --------------------------------------------------------------------------

_ATL11_ORACLE = """
WITH base AS (
  -- MAX-dedup: (l_orderkey, l_linenumber) is NOT unique in the
  -- synthetic lineitem, and duplicate ref_pt groups would make the
  -- max_by cycle picks tie-dependent
  SELECT l_orderkey * 10 + l_linenumber AS ref_pt,
         CAST(l_partkey % 3 + 1 AS BIGINT) AS pair,
         MAX(l_extendedprice / 100.0) AS h0,
         MAX(CAST(l_suppkey % 7 AS DOUBLE)) AS slope
  FROM lineitem GROUP BY 1, 2),
tidy AS (
  SELECT ref_pt, pair, CAST(c AS DOUBLE) AS cycle_number,
         CASE WHEN (ref_pt + c) % 5 = 0 THEN NULL
              ELSE h0 + c * slope END AS h_corr
  FROM base, (SELECT unnest(range(1, 5)) AS c)),
v AS (SELECT * FROM tidy WHERE h_corr IS NOT NULL)
SELECT pair, ref_pt,
       CAST(COUNT(*) AS BIGINT) AS n_cycles,
       floor((AVG(h_corr)) * 1000000.0 + 0.5) / 1000000.0 AS h_mean,
       MAX(cycle_number) AS last_cycle,
       max_by(h_corr, cycle_number) AS h_last,
       min_by(h_corr, cycle_number) AS h_first,
       max_by(h_corr, cycle_number) - min_by(h_corr, cycle_number)
         AS dh
FROM v GROUP BY pair, ref_pt ORDER BY pair, ref_pt
"""


@query("atl11_cycle_stats", oracle=_ATL11_ORACLE)
def atl11_cycle_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ATL11-shaped corrected-height cycle statistics
    (sources/atl11.cycle_collapse): the tidy per-cycle layout the
    converter emits, aggregated to one row per (pair, ref_pt) —
    valid-cycle count, mean corrected height, latest valid cycle and
    its height, and the first->last height change (the dh/dt
    numerator the annual land-ice products difference).  One
    key-hash exchange; min_by/max_by keep the latest/first picks in
    the same single pass.  h_mean rounds via the shared
    bit-deterministic formula (4-element sums can still reorder);
    h_last/h_first/dh compare exactly — both engines pick the same
    element of the same double set."""
    from pointdatabase_spark.sources import atl11 as _atl11
    li = testkit.load_table(spark, sf_dir, "lineitem")
    base = (li.groupBy(
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("ref_pt"),
        (F.col("l_partkey") % 3 + 1).cast("long").alias("pair"))
        .agg(F.max(F.col("l_extendedprice") / 100.0).alias("h0"),
             F.max((F.col("l_suppkey") % 7).cast("double"))
             .alias("slope")))
    tidy = (base.select("ref_pt", "pair", "h0", "slope",
                        F.explode(F.sequence(F.lit(1), F.lit(4)))
                        .alias("c"))
            .select("ref_pt", "pair",
                    F.col("c").cast("double").alias("cycle_number"),
                    F.when((F.col("ref_pt") + F.col("c")) % 5 == 0,
                           F.lit(None).cast("double"))
                    .otherwise(F.col("h0") + F.col("c") * F.col("slope"))
                    .alias("h_corr")))
    out = _atl11.cycle_collapse(tidy)
    return (out.withColumn("h_mean", _rq(F.col("h_mean"), 6))
            .orderBy("pair", "ref_pt"))


_ATL11_XOVER_ORACLE = """
WITH base AS (
  SELECT l_orderkey * 10 + l_linenumber AS ref_pt,
         CAST(l_partkey % 3 + 1 AS BIGINT) AS pair,
         MAX(l_extendedprice / 100.0) AS h0,
         MAX(CAST(l_suppkey % 7 AS DOUBLE)) AS slope,
         MAX(CAST(l_suppkey AS DOUBLE)) AS srgt,
         MAX(l_quantity) AS qty
  FROM lineitem GROUP BY 1, 2),
tidy AS (
  SELECT ref_pt, pair, CAST(c AS DOUBLE) AS cycle_number,
         CASE WHEN (ref_pt + c) % 5 = 0 THEN NULL
              ELSE h0 + c * slope END AS h_own
  FROM base, (SELECT unnest(range(1, 5)) AS c)),
xing AS (
  SELECT ref_pt, pair,
         CAST(CAST(qty AS BIGINT) % 4 + 1 AS DOUBLE) AS cycle_number,
         srgt AS xing_rgt,
         h0 + (CAST(qty AS BIGINT) % 4 + 1) * slope + 3.25 AS h_xing
  FROM base WHERE qty < 10)
SELECT x.pair, x.ref_pt, x.cycle_number, x.xing_rgt,
       t.h_own, x.h_xing, x.h_xing - t.h_own AS dh_xo
FROM xing x JOIN tidy t
  ON x.pair = t.pair AND x.ref_pt = t.ref_pt
 AND x.cycle_number = t.cycle_number
WHERE t.h_own IS NOT NULL AND x.h_xing IS NOT NULL
ORDER BY x.pair, x.ref_pt
"""


@query("atl11_xover_diff", oracle=_ATL11_XOVER_ORACLE)
def atl11_xover_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ATL11 crossover differencing (sources/atl11.xover_difference;
    reference IndexPicker.py:137-151 get_xovers/ATL11_plot): the
    crossing-track partner heights join the along-track corrected
    heights on (pair, ref_pt, cycle_number) and difference — no
    geometry recomputation, ATL11 already did the crossover search
    upstream, so at scale this is ONE key-hash equi-join between two
    point lists.  Heights derive identically on both engines (pure
    IEEE column arithmetic), so dh_xo compares bitwise with no
    rounding."""
    from pointdatabase_spark.sources import atl11 as _atl11
    li = testkit.load_table(spark, sf_dir, "lineitem")
    base = (li.groupBy(
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("ref_pt"),
        (F.col("l_partkey") % 3 + 1).cast("long").alias("pair"))
        .agg(F.max(F.col("l_extendedprice") / 100.0).alias("h0"),
             F.max((F.col("l_suppkey") % 7).cast("double")).alias("slope"),
             F.max(F.col("l_suppkey").cast("double")).alias("srgt"),
             F.max("l_quantity").alias("qty")))
    tidy = (base.select("ref_pt", "pair", "h0", "slope",
                        F.explode(F.sequence(F.lit(1), F.lit(4)))
                        .alias("c"))
            .select("ref_pt", "pair",
                    F.col("c").cast("double").alias("cycle_number"),
                    F.when((F.col("ref_pt") + F.col("c")) % 5 == 0,
                           F.lit(None).cast("double"))
                    .otherwise(F.col("h0") + F.col("c") * F.col("slope"))
                    .alias("h_corr")))
    xc = F.col("qty").cast("long") % 4 + 1
    xing = (base.where(F.col("qty") < 10)
            .select("ref_pt", "pair",
                    xc.cast("double").alias("cycle_number"),
                    F.col("srgt").alias("rgt"),
                    (F.col("h0") + xc * F.col("slope") + 3.25)
                    .alias("h_corr")))
    return (_atl11.xover_difference(tidy, xing)
            .orderBy("pair", "ref_pt"))


# --------------------------------------------------------------------------
# int8 embedding quantization + recall audit (operators/similarity.
# quantize_int8): per-dimension affine quantization (the 4x ANN
# memory valve), scored by top-10 overlap of quantized-corpus cosine
# against exact cosine for the same query set. Oracle replays the
# identical min/max stats, quantize/dequantize arithmetic, and both
# rankings in DuckDB.
# --------------------------------------------------------------------------

_QNT_SCALE = "(st.mx[i + 1] - st.mn[i + 1])"
_QNT_STEPS = (f"floor((CAST(e.embedding[i + 1] AS DOUBLE) - st.mn[i + 1])"
              f" / {_QNT_SCALE} * 254.0 + 0.5)")

_QUANT_RECALL_ORACLE = f"""
WITH ex AS (SELECT UNNEST(embedding) AS v,
                   UNNEST(range(1, len(embedding) + 1)) AS pos
            FROM embeddings),
rng AS (SELECT pos, MIN(CAST(v AS DOUBLE)) AS mn,
               MAX(CAST(v AS DOUBLE)) AS mx
        FROM ex GROUP BY pos),
st AS (SELECT list(mn ORDER BY pos) AS mn, list(mx ORDER BY pos) AS mx
       FROM rng),
deq AS (SELECT e.vec_id,
               list_transform(range({_DIM}), i ->
                 CASE WHEN {_QNT_SCALE} > CAST(0 AS DOUBLE)
                      THEN st.mn[i + 1] + {_QNT_STEPS} / 254.0 * {_QNT_SCALE}
                      ELSE st.mn[i + 1] END) AS dv
        FROM embeddings e, st),
q AS (SELECT vec_id AS q_id, embedding AS qv
      FROM embeddings WHERE vec_id < 5),
exact AS (SELECT q.q_id, e.vec_id,
                 CAST(row_number() OVER (PARTITION BY q.q_id
                      ORDER BY {_duck_cos('q.qv', 'e.embedding')} DESC,
                               e.vec_id) AS BIGINT) AS rank
          FROM embeddings e, q),
quant AS (SELECT q.q_id, d.vec_id,
                 CAST(row_number() OVER (PARTITION BY q.q_id
                      ORDER BY {_duck_cos('q.qv', 'd.dv')} DESC,
                               d.vec_id) AS BIGINT) AS rank
          FROM deq d, q)
SELECT x.q_id, CAST(COUNT(*) AS BIGINT) AS n_overlap,
       COUNT(*) / 10.0 AS recall_at_10
FROM exact x JOIN quant u ON x.q_id = u.q_id AND x.vec_id = u.vec_id
WHERE x.rank <= 10 AND u.rank <= 10
GROUP BY x.q_id ORDER BY x.q_id
"""


@query("embedding_quantize_recall", oracle=_QUANT_RECALL_ORACLE)
def embedding_quantize_recall(spark: SparkSession, sf_dir: str
                              ) -> DataFrame:
    """int8 quantization recall audit: top-10 by cosine against the
    DEQUANTIZED corpus vs against the full-precision corpus, per
    query — the acceptance gate before switching an ANN serving path
    to the 1-byte/dim index (operators/similarity.quantize_int8).
    Both rankings broadcast the 5-query side; the corpus never
    shuffles (stats pass shuffles |dims| keys only).  n_overlap is
    an integer and recall a /10.0 of it — exact on both engines, no
    rounding needed; ranks are deterministic because quantized
    cosines are bit-identical doubles on both sides."""
    emb = testkit.load_table(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < 5)
    exact = _sim.cosine_topk(emb, q, k=10)
    deq = (_sim.quantize_int8(emb)
           .select("vec_id", F.col("deq").alias("embedding")))
    quant = _sim.cosine_topk(deq, q, k=10)
    return (exact.select("q_id", "vec_id")
            .join(quant.select("q_id", "vec_id"), ["q_id", "vec_id"])
            .groupBy("q_id")
            .agg(F.count(F.lit(1)).alias("n_overlap"),
                 (F.count(F.lit(1)) / 10.0).alias("recall_at_10"))
            .orderBy("q_id"))


# --------------------------------------------------------------------------
# Deterministic training-shard export (operators/sampling.shard_assign
# / write_training_shards): md5-hash shard assignment + an independent
# hash-order within each shard — the reproducible global shuffle a
# trainer consumes.  The stats query pins the contract: per-shard doc
# and token counts plus the FIRST doc id in deterministic order
# (head_id changes if either the assignment or the order drifts).
# --------------------------------------------------------------------------

_SHARD_ORACLE = rf"""
WITH a AS (
  SELECT doc_id,
         CAST({_duck_h32_id('doc_id', 'sh1')} % 8 AS BIGINT) AS shard,
         {_duck_h32_id('doc_id', 'sh1#o')} AS okey,
         len(string_split_regex(coalesce(text, ''), '\s+')) AS n_tok
  FROM documents),
stats AS (SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
                 CAST(SUM(n_tok) AS BIGINT) AS n_tokens
          FROM a GROUP BY shard),
first AS (SELECT shard, doc_id AS head_id FROM (
            SELECT shard, doc_id,
                   ROW_NUMBER() OVER (PARTITION BY shard
                                      ORDER BY okey, doc_id) AS rn
            FROM a) r WHERE rn = 1)
SELECT s.shard, s.n_docs, s.n_tokens, f.head_id
FROM stats s JOIN first f ON s.shard = f.shard ORDER BY s.shard
"""


@query("training_shard_stats", oracle=_SHARD_ORACLE)
def training_shard_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shard-export audit over 8 shards: per shard, document count,
    whitespace-token count, and the id that deterministic hash order
    puts FIRST (operators/sampling.shard_assign) — a drift in either
    the assignment hash or the order hash flips head_id and fails the
    gate.  One key-hash exchange on 8 shard keys; assignment and the
    order key are scan-local expressions."""
    from pointdatabase_spark.operators import sampling as _samp2
    docs = testkit.load_table(spark, sf_dir, "documents")
    a = _samp2.shard_assign(
        docs.select("doc_id", "text"), n_shards=8)
    toks = F.size(F.split(F.coalesce(F.col("text"), F.lit("")), r"\s+"))
    first = a.where(F.col("shard_pos") == 1).select(
        "shard", F.col("doc_id").alias("head_id"))
    stats = (a.groupBy("shard")
             .agg(F.count(F.lit(1)).alias("n_docs"),
                  F.sum(toks.cast("long")).alias("n_tokens")))
    return (stats.join(first, "shard").orderBy("shard"))


# --------------------------------------------------------------------------
# Mixture upsampling + token-budget selection (operators/sampling):
# the epoch-repeat and final-selection steps of a training-mixture
# pipeline. Both deterministic by the package md5 recipe; oracles
# replay the CASE/hash/window arithmetic exactly.
# --------------------------------------------------------------------------

_UP_W = {"src0": 2.5, "src1": 0.4, "src2": 1.0, "src3": 3.0,
         "src5": 0.25}
_UP_WHOLE = ("CASE " + " ".join(
    f"WHEN source = '{s}' THEN {int(w // 1)}"
    for s, w in _UP_W.items()) + " ELSE 0 END")
_UP_FRAC = ("CASE " + " ".join(
    f"WHEN source = '{s}' THEN {w - int(w // 1)!r}"
    for s, w in _UP_W.items()) + " ELSE 0.0 END")

_UPSAMPLE_ORACLE = f"""
WITH a AS (
  SELECT doc_id, source, {_UP_WHOLE} AS wh, {_UP_FRAC} AS fr
  FROM documents),
n AS (SELECT doc_id, source,
             wh + CASE WHEN {_duck_h32_id('doc_id', 'up1')}
                            / {float(1 << 32)!r} < fr
                       THEN 1 ELSE 0 END AS n
      FROM a)
SELECT source, CAST(SUM(n) AS BIGINT) AS n_out,
       CAST(COUNT(*) FILTER (WHERE n > 0) AS BIGINT) AS n_base_kept,
       CAST(MAX(n) AS BIGINT) AS max_copies
FROM n GROUP BY source HAVING SUM(n) > 0 ORDER BY source
"""


@query("mixture_upsample_counts", oracle=_UPSAMPLE_ORACLE)
def mixture_upsample_counts(spark: SparkSession, sf_dir: str
                            ) -> DataFrame:
    """Deterministic upsampling WITH replacement
    (operators/sampling.mixture_upsample): group g's rows repeat
    floor(w_g) times plus one more with hash-probability frac(w_g) —
    the epoch-repeat side of mixture training (expected multiplicity
    == weight; unlisted sources drop).  Zero shuffles in the operator
    (CASE + narrow sequence explode); only this audit's per-source
    aggregate exchanges.  Counts are integers — exact on both
    engines."""
    from pointdatabase_spark.operators import sampling as _samp2
    docs = testkit.load_table(spark, sf_dir, "documents")
    up = _samp2.mixture_upsample(docs.select("doc_id", "source"), _UP_W)
    return (up.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_out"),
                 F.countDistinct("doc_id").alias("n_base_kept"),
                 (F.max("copy") + 1).alias("max_copies"))
            .orderBy("source"))


_BUDGET = 10_000

_BUDGET_ORACLE = rf"""
WITH t AS (SELECT doc_id, CAST(length(text) AS BIGINT) AS q,
                  CAST(len(string_split_regex(coalesce(text, ''),
                                              '\s+')) AS BIGINT) AS tok
           FROM documents),
r AS (SELECT doc_id, q, tok,
             SUM(tok) OVER (ORDER BY q DESC, doc_id
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS cum
      FROM t)
SELECT CAST(COUNT(*) AS BIGINT) AS n_kept,
       CAST(MAX(cum) AS BIGINT) AS tokens_kept,
       CAST(MIN(q) AS BIGINT) AS min_quality
FROM r WHERE cum - tok < {_BUDGET}
"""


@query("token_budget_select", oracle=_BUDGET_ORACLE)
def token_budget_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget corpus selection
    (operators/sampling.budget_select): keep documents from highest
    quality (here: length) down until the running token total passes
    the budget, overflow-one — "the best docs until N training
    tokens".  One range-partitioned global sort + running-sum window;
    this audit row collapses the kept set to (count, tokens, minimum
    kept quality).  All integers — exact on both engines."""
    from pointdatabase_spark.operators import sampling as _samp2
    docs = testkit.load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id",
        F.length("text").cast("long").alias("q"),
        F.size(F.split(F.coalesce(F.col("text"), F.lit("")),
                       r"\s+")).cast("long").alias("tok"))
    kept = _samp2.budget_select(t, _BUDGET, quality_col="q",
                                tokens_col="tok")
    return kept.agg(F.count(F.lit(1)).alias("n_kept"),
                    F.max("cum_tokens").alias("tokens_kept"),
                    F.min("q").alias("min_quality"))


# --------------------------------------------------------------------------
# Perceptual image near-dup: real JPEG decode -> 64-bit dHash ->
# banded hamming join (operators/multimodal.dhash_images +
# operators/dedup.hamming_neardup_pairs). The fixture encodes ONE
# picture per 5 consecutive image docs at five different JPEG
# qualities; the block pattern is built so every re-encode hashes
# IDENTICALLY (adjacent-block luma gaps >= 18 dwarf block-mean codec
# error) while distinct pictures land >= 19 bits apart — so the
# oracle predicts the pair set (and hamming = 0) from doc_id
# arithmetic alone, with zero image code in SQL.
# --------------------------------------------------------------------------

_DHASH_ORACLE = """
WITH img AS (SELECT doc_id, (doc_id // 3) // 5 AS base
             FROM documents WHERE doc_id % 3 = 0)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(0 AS BIGINT) AS hamming
FROM img a JOIN img b ON a.base = b.base AND a.doc_id < b.doc_id
ORDER BY id_a, id_b
"""


@query("multimodal_dhash_neardup", oracle=_DHASH_ORACLE)
def multimodal_dhash_neardup(spark: SparkSession, sf_dir: str
                             ) -> DataFrame:
    """Same-photo-different-compression image dedup: decode every
    image payload with the stdlib JPEG codec inside Arrow-batched
    mapInPandas, fingerprint with the 64-bit dHash (area-mean 9x8,
    adjacent-pixel comparisons), then find pairs within hamming <= 3
    via the 4x16-bit band join — pixels never shuffle, the corpus-
    wide stage carries 8-byte hashes.  At 100 TB this is the
    multimodal twin of minhash dedup: hash map-side, candidate join
    bucket-local, pigeonhole recall exact for the threshold."""
    from pointdatabase_spark.operators import multimodal as _mm
    docs = (testkit.load_table(spark, sf_dir, "documents")
            .filter(F.col("doc_id") % 3 == 0))
    hashes = _mm.dhash_images(_mm.attach_jpeg_variant_payload(docs))
    return (_dedup.hamming_neardup_pairs(hashes, "dhash",
                                         bits=64, bands=4,
                                         max_hamming=3)
            .orderBy("id_a", "id_b"))


# --------------------------------------------------------------------------
# Distributed Lloyd's k-means (operators/clustering.py) — the trainer
# for the IVF/SemDeDup centroid stage. All arithmetic is exact
# micro-unit integers (sums < 2^53, so the one mean division is a
# single bit-deterministic IEEE op on both engines); the oracle
# unrolls the two Lloyd iterations as CTEs.
# --------------------------------------------------------------------------

def _kmeans_oracle(k: int = 4, iters: int = 2, dim: int = 64) -> str:
    def dist(xq: str, cq: str) -> str:
        return (f"list_aggregate(list_transform(range({dim}), i ->"
                f" ({xq}[i + 1] - {cq}[i + 1])"
                f" * ({xq}[i + 1] - {cq}[i + 1])), 'sum')")

    parts = [f"""
WITH q AS (SELECT vec_id AS id,
         list_transform(embedding, v ->
           CAST(floor(CAST(v AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT))
           AS xq
       FROM embeddings),
c0 AS (SELECT CAST(row_number() OVER (ORDER BY id) - 1 AS BIGINT)
              AS cluster_id, xq AS cq
       FROM (SELECT id, xq FROM q ORDER BY id LIMIT {k}))"""]
    for it in range(1, iters + 1):
        parts.append(f""",
a{it} AS (SELECT id, cluster_id, xq FROM (
      SELECT q.id, q.xq, c.cluster_id,
             row_number() OVER (PARTITION BY q.id ORDER BY
               {dist('q.xq', 'c.cq')}, c.cluster_id) AS rn
      FROM q CROSS JOIN c{it - 1} c) WHERE rn = 1),
u{it} AS (SELECT cluster_id, d.i AS dim, SUM(xq[d.i + 1]) AS s,
             COUNT(*) AS n
       FROM a{it} CROSS JOIN (SELECT unnest(range({dim})) AS i) d
       GROUP BY cluster_id, d.i)""")
        if it < iters:
            parts.append(f""",
c{it} AS (SELECT cluster_id,
             list(CAST(floor(CAST(s AS DOUBLE) / n + 0.5) AS BIGINT)
                  ORDER BY dim) AS cq
       FROM u{it} GROUP BY cluster_id)""")
    parts.append(f"""
SELECT cluster_id, CAST(dim AS INT) AS dim,
       CAST(floor(CAST(s AS DOUBLE) / n + 0.5) AS BIGINT) AS centroid_q,
       CAST(n AS BIGINT) AS n_members
FROM u{iters}""")
    return "".join(parts)


_KMEANS_ORACLE = _kmeans_oracle()


@query("kmeans_embeddings", oracle=_KMEANS_ORACLE)
def kmeans_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lloyd's k-means (k=4, 2 iterations, deterministic smallest-id
    seed) over the embeddings table. The Spark plan is MLlib-shaped:
    assignment is a zero-shuffle map-side argmin over broadcast
    literal centroids; each update is ONE k-row shuffle (map-side
    partial d-column sums), with k*(d+1) longs crossing the driver
    per round — corpus-size-independent, so the plan survives a
    billion-vector corpus unchanged."""
    from pointdatabase_spark.operators import clustering as _clu
    emb = testkit.load_table(spark, sf_dir, "embeddings")
    return _clu.kmeans_fit(emb, k=4, iters=2)


# --------------------------------------------------------------------------
# Model-based quality gate: fastText-style hashed linear classifier
# inference (operators/classify.py). Zero-shuffle map-side scoring;
# the oracle recomputes the identical md5-bucket/weight-fold/rational-
# sigmoid arithmetic in DuckDB.
# --------------------------------------------------------------------------

from pointdatabase_spark.operators import classify as _classify  # noqa: E402

_CLASSIFY_ORACLE = _classify.score_documents_sql()


@query("quality_classifier_score", oracle=_CLASSIFY_ORACLE)
def quality_classifier_score(spark: SparkSession, sf_dir: str
                             ) -> DataFrame:
    """Hashed bag-of-words linear classifier over every document —
    the CCNet/FineWeb model-based quality gate. The model (64 bucket
    weights) is a literal inside the expression; scoring is one
    map-side codegen projection (tokenize -> md5-bucket -> weight
    fold -> rational sigmoid) with ZERO shuffle, so at 100 TB the
    gate runs inline with the scan. Weights are md5-derived (this
    registry entry pins the inference plan and its cross-engine
    arithmetic, not a trained model)."""
    docs = testkit.load_table(spark, sf_dir, "documents")
    return _classify.score_documents(docs)


# --------------------------------------------------------------------------
# Crawl-corpus URL canonicalization + freshest-version dedup
# (operators/web.py). Five synthesized variants per page exercise
# every normalization rule (scheme/host case, www, :80, trailing
# slash, tracking params, param order, fragment); the oracle
# synthesizes the identical raw urls and canonicalizes with the
# mirrored DuckDB template.
# --------------------------------------------------------------------------

from pointdatabase_spark.operators import web as _web  # noqa: E402

_URL_SYN_SQL = """
SELECT doc_id, (doc_id * 37) % 100 AS fetch_ts,
       CASE (doc_id // 40) % 5
         WHEN 0 THEN 'http://www.site' || b || '.com/p/' || b
         WHEN 1 THEN 'HTTP://Site' || b || '.COM/p/' || b || '/'
         WHEN 2 THEN 'http://site' || b || '.com:80/p/' || b
                     || '?utm_source=feed'
         WHEN 3 THEN 'http://site' || b || '.com/p/' || b
                     || '?b=2&a=1#frag'
         ELSE 'http://www.site' || b || '.com/p/' || b || '?a=1&b=2'
       END AS url
FROM (SELECT doc_id, CAST(doc_id % 40 AS VARCHAR) AS b FROM documents)
"""

_URL_DEDUP_ORACLE = f"""
WITH u AS ({_URL_SYN_SQL}),
c AS (SELECT doc_id, fetch_ts,
             {_web.canonical_url_sql('url')} AS canon_url
      FROM u),
r AS (SELECT canon_url, doc_id, fetch_ts,
             row_number() OVER (PARTITION BY canon_url
                  ORDER BY fetch_ts DESC, doc_id) AS rn,
             COUNT(*) OVER (PARTITION BY canon_url) AS n_versions
      FROM c)
SELECT canon_url, doc_id, CAST(fetch_ts AS BIGINT) AS fetch_ts,
       CAST(n_versions AS BIGINT) AS n_versions
FROM r WHERE rn = 1
"""


def _syn_urls(docs: DataFrame) -> DataFrame:
    b = (F.col("doc_id") % 40).cast("string")
    v = (F.col("doc_id") / 40).cast("long") % 5
    url = (F.when(v == 0, F.concat(F.lit("http://www.site"), b,
                                   F.lit(".com/p/"), b))
           .when(v == 1, F.concat(F.lit("HTTP://Site"), b,
                                  F.lit(".COM/p/"), b, F.lit("/")))
           .when(v == 2, F.concat(F.lit("http://site"), b,
                                  F.lit(".com:80/p/"), b,
                                  F.lit("?utm_source=feed")))
           .when(v == 3, F.concat(F.lit("http://site"), b,
                                  F.lit(".com/p/"), b,
                                  F.lit("?b=2&a=1#frag")))
           .otherwise(F.concat(F.lit("http://www.site"), b,
                               F.lit(".com/p/"), b,
                               F.lit("?a=1&b=2"))))
    return docs.select("doc_id",
                       ((F.col("doc_id") * 37) % 100).alias("fetch_ts"),
                       url.alias("url"))


@query("url_canonical_dedup", oracle=_URL_DEDUP_ORACLE)
def url_canonical_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFC-3986-normalize synthesized crawl urls and keep the
    freshest fetch per canonical page. Canonicalization is one
    map-side string projection; the dedup is one groupBy whose
    map-side min(struct) partial collapses versions before the
    exchange — shuffle volume is one slim row per (partition, url)
    at any corpus size."""
    docs = testkit.load_table(spark, sf_dir, "documents")
    return _web.dedup_latest(_syn_urls(docs))


# --------------------------------------------------------------------------
# Robust outlier census (operators/profile.robust_outliers): exact
# rank-based median/MAD in micro-unit integers — threshold
# comparisons are integer-exact, so the outlier COUNTS (not just
# rounded values) are bit-deterministic across engines.
# --------------------------------------------------------------------------

_OUTLIER_ORACLE = """
WITH q AS (SELECT event_type,
                  CAST(floor(CAST(value AS DOUBLE) * 1000000.0 + 0.5)
                       AS BIGINT) AS vq
           FROM events),
r1 AS (SELECT event_type, vq,
              row_number() OVER (PARTITION BY event_type
                                 ORDER BY vq) AS rn,
              COUNT(*) OVER (PARTITION BY event_type) AS n
       FROM q),
med AS (SELECT event_type, vq AS med_q FROM r1
        WHERE rn = CAST(floor((n + 1) / 2) AS BIGINT)),
dev AS (SELECT q.event_type, abs(q.vq - med.med_q) AS dev, med.med_q
        FROM q JOIN med USING (event_type)),
r2 AS (SELECT event_type, dev,
              row_number() OVER (PARTITION BY event_type
                                 ORDER BY dev) AS rn,
              COUNT(*) OVER (PARTITION BY event_type) AS n
       FROM dev),
mad AS (SELECT event_type, dev AS mad_q FROM r2
        WHERE rn = CAST(floor((n + 1) / 2) AS BIGINT))
SELECT d.event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(MIN(d.med_q) AS BIGINT) AS med_q,
       CAST(MIN(mad.mad_q) AS BIGINT) AS mad_q,
       CAST(SUM(CASE WHEN d.dev > 3 * mad.mad_q THEN 1 ELSE 0 END)
            AS BIGINT) AS n_outliers
FROM dev d JOIN mad USING (event_type)
GROUP BY d.event_type
"""


@query("numeric_outlier_report", oracle=_OUTLIER_ORACLE)
def numeric_outlier_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median/MAD outlier census of event values per type — the
    50%-breakdown-point robust screen, all arithmetic in exact
    micro-unit integers so the census counts cannot flip on a
    floating-point ulp (see operators/profile.robust_outliers)."""
    from pointdatabase_spark.operators import profile as _prof
    ev = testkit.load_table(spark, sf_dir, "events")
    return _prof.robust_outliers(ev, ["event_type"], "value", k=3)


# --------------------------------------------------------------------------
# Fixed-iteration PageRank (operators/graph.py) over the bipartite
# customer<->supplier trading graph, made cyclic by adding both edge
# directions. Exact integer rank units; the oracle unrolls the two
# Pregel steps as CTEs and must match bit-for-bit.
# --------------------------------------------------------------------------

_PR_SUPP_NS = 1_000_000_000  # supplier node-id namespace offset

_PAGERANK_ORACLE = f"""
WITH pairs AS (SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s
               FROM orders o JOIN lineitem l
                 ON o.o_orderkey = l.l_orderkey),
e AS (SELECT c AS src, s + {_PR_SUPP_NS} AS dst FROM pairs
      UNION ALL
      SELECT s + {_PR_SUPP_NS} AS src, c AS dst FROM pairs),
nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
nn AS (SELECT COUNT(*) AS n FROM nodes),
deg AS (SELECT src, COUNT(*) AS deg FROM e GROUP BY src),
r0 AS (SELECT node, CAST(floor(1000000000000.0 / (SELECT n FROM nn))
                         AS BIGINT) AS rank_q
       FROM nodes),
c1 AS (SELECT e.dst AS node,
              SUM(CAST(floor(CAST(r.rank_q AS DOUBLE) * 0.85 / d.deg)
                       AS BIGINT)) AS infl
       FROM e JOIN r0 r ON e.src = r.node
              JOIN deg d ON e.src = d.src
       GROUP BY e.dst),
r1 AS (SELECT n.node,
              CAST(floor(0.15 * 1000000000000.0 / (SELECT n FROM nn))
                   AS BIGINT) + COALESCE(c1.infl, 0) AS rank_q
       FROM nodes n LEFT JOIN c1 ON n.node = c1.node),
c2 AS (SELECT e.dst AS node,
              SUM(CAST(floor(CAST(r.rank_q AS DOUBLE) * 0.85 / d.deg)
                       AS BIGINT)) AS infl
       FROM e JOIN r1 r ON e.src = r.node
              JOIN deg d ON e.src = d.src
       GROUP BY e.dst),
r2 AS (SELECT n.node,
              CAST(floor(0.15 * 1000000000000.0 / (SELECT n FROM nn))
                   AS BIGINT) + COALESCE(c2.infl, 0) AS rank_q
       FROM nodes n LEFT JOIN c2 ON n.node = c2.node)
SELECT node, CAST(rank_q AS BIGINT) AS rank_q
FROM r2 ORDER BY rank_q DESC, node LIMIT 20
"""


@query("pagerank_trading_graph", oracle=_PAGERANK_ORACLE)
def pagerank_trading_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two Pregel iterations of damped PageRank on the (bidirected)
    customer-supplier trading graph; top-20 nodes by final rank.
    Per iteration: one src-keyed join + one dst-keyed partial-agg
    shuffle, node state one long — the plan is edge-linear and
    AQE-skew-safe at any graph size (operators/graph.py)."""
    from pointdatabase_spark.operators import graph as _graph
    orders = testkit.load_table(spark, sf_dir, "orders")
    li = testkit.load_table(spark, sf_dir, "lineitem")
    pairs = (orders.join(li, orders.o_orderkey == li.l_orderkey)
             .select(F.col("o_custkey").alias("c"),
                     F.col("l_suppkey").alias("s"))
             .distinct())
    fwd = pairs.select(F.col("c").alias("src"),
                       (F.col("s") + F.lit(_PR_SUPP_NS)).alias("dst"))
    rev = pairs.select((F.col("s") + F.lit(_PR_SUPP_NS)).alias("src"),
                       F.col("c").alias("dst"))
    ranks = _graph.pagerank(fwd.unionAll(rev), iters=2)
    return (ranks.orderBy(F.col("rank_q").desc(), F.col("node"))
            .limit(20)
            .select(F.col("node").cast("long"), "rank_q"))


# --------------------------------------------------------------------------
# Hard-negative mining (operators/similarity.hard_negatives): per
# anchor, the top-3 most-similar DIFFERENT-label vectors — the
# contrastive-training batch-mining stage. Same broadcast/no-corpus-
# shuffle plan as cosine_topk with the label predicate pushed below
# the ranking window.
# --------------------------------------------------------------------------

_HARDNEG_ORACLE = f"""
WITH q AS (SELECT vec_id AS q_id, embedding AS qv, label AS ql
           FROM embeddings WHERE vec_id < 8),
j AS (SELECT q.q_id, e.vec_id, e.label AS neg_label,
             {_duck_cos('q.qv', 'e.embedding')} AS cos
      FROM embeddings e, q WHERE e.label != q.ql),
r AS (SELECT q_id, vec_id, neg_label, cos,
             CAST(row_number() OVER (PARTITION BY q_id
                  ORDER BY cos DESC, vec_id) AS BIGINT) AS rank
      FROM j)
SELECT q_id, vec_id, CAST(neg_label AS INT) AS neg_label, cos, rank
FROM r WHERE rank <= 3
"""


@query("hard_negative_mining", oracle=_HARDNEG_ORACLE)
def hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 hardest negatives (most-similar, different label) for
    each of 8 anchor vectors."""
    emb = testkit.load_table(spark, sf_dir, "embeddings")
    return _sim.hard_negatives(emb, emb.where(F.col("vec_id") < 8), k=3)


# --------------------------------------------------------------------------
# Unicode repair / text normalization (operators/cleaning.normalize_
# text): mojibake, smart punctuation, control bytes, whitespace runs.
# The dirty text is synthesized in lockstep from shared Python
# constants so both engines normalize byte-identical inputs.
# --------------------------------------------------------------------------

_NOISE_MOJ = "\u00e2\u20ac\u2122lead "          # mojibake of a curly quote
_NOISE_SMART = "\u201csmart\u201d \u2014dash "   # curly quotes + em-dash
_NOISE_CTL = "\x07\x1fctl "                      # BEL + unit-separator
_NOISE_TAIL = " \u00a0tail"                      # NBSP

from pointdatabase_spark.operators.cleaning import (  # noqa: E402
    normalize_text as _norm_text, normalize_text_sql as _norm_text_sql,
    _sql_quote as _sqlq)


def _dirty_docs(docs: DataFrame) -> DataFrame:
    lead = (F.when(F.col("doc_id") % 4 == 0, F.lit(_NOISE_MOJ))
            .when(F.col("doc_id") % 4 == 1, F.lit(_NOISE_SMART))
            .when(F.col("doc_id") % 4 == 2, F.lit(_NOISE_CTL))
            .otherwise(F.lit("")))
    body = F.replace(F.substring(F.col("text"), 1, 120),
                     F.lit(" "), F.lit("  "))
    return docs.select(
        "doc_id", F.concat(lead, body, F.lit(_NOISE_TAIL)).alias("dirty"))


_NORM_ORACLE = f"""
WITH d AS (SELECT doc_id,
        (CASE doc_id % 4
           WHEN 0 THEN {_sqlq(_NOISE_MOJ)}
           WHEN 1 THEN {_sqlq(_NOISE_SMART)}
           WHEN 2 THEN {_sqlq(_NOISE_CTL)}
           ELSE '' END)
        || replace(substr(text, 1, 120), ' ', '  ')
        || {_sqlq(_NOISE_TAIL)} AS dirty
      FROM documents),
c AS (SELECT doc_id, dirty, {_norm_text_sql('dirty')} AS clean FROM d)
SELECT doc_id,
       CAST(length(dirty) AS BIGINT) AS len_dirty,
       CAST(length(clean) AS BIGINT) AS len_clean,
       {{fp48}} AS clean_fp48
FROM c
"""
_NORM_ORACLE = _NORM_ORACLE.format(fp48=_text.duckdb_expr("fp48", "clean"))


@query("text_normalize_repair", oracle=_NORM_ORACLE)
def text_normalize_repair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ftfy-style unicode repair over synthesized dirty documents:
    mojibake inverse-mapping, smart-punctuation fold, control-byte
    strip, whitespace collapse. Pure map-side codegen string
    expressions — the fixup pass runs at scan speed before any
    hash/dedup stage (a single mojibake byte otherwise splits
    byte-identical prose into distinct hash keys). The md5
    fingerprint of the cleaned text pins byte-exact parity."""
    docs = testkit.load_table(spark, sf_dir, "documents")
    d = _dirty_docs(docs)
    c = d.withColumn("clean", _norm_text(F.col("dirty")))
    return c.select(
        "doc_id",
        F.length("dirty").cast("long").alias("len_dirty"),
        F.length("clean").cast("long").alias("len_clean"),
        _text.spark_expr("fp48", "clean").alias("clean_fp48"))


# --------------------------------------------------------------------------
# Exact-proportion stratified split (operators/sampling.stratified_
# split). The cumulative bounds are rendered from the SAME Python
# floats on both sides (0.8 + 0.1 != 0.9 in IEEE — a literal '0.9'
# in the oracle would flip ceil() on strata whose size is a multiple
# of 10).
# --------------------------------------------------------------------------

_STRAT_SPLITS = [("train", 0.8), ("val", 0.1), ("test", 0.1)]


def _strat_case_sql() -> str:
    acc = 0.0
    arms = []
    for name, frac in _STRAT_SPLITS[:-1]:
        acc += frac
        arms.append(f"WHEN rn <= ceil(n * {acc!r}) THEN '{name}'")
    return ("CASE " + " ".join(arms)
            + f" ELSE '{_STRAT_SPLITS[-1][0]}' END")


_STRAT_ORACLE = f"""
WITH r AS (SELECT lang, doc_id,
        row_number() OVER (PARTITION BY lang
             ORDER BY md5('v1' || CAST(doc_id AS VARCHAR)), doc_id)
          AS rn,
        COUNT(*) OVER (PARTITION BY lang) AS n
      FROM documents),
s AS (SELECT lang, {_strat_case_sql()} AS split FROM r)
SELECT lang, split, CAST(COUNT(*) AS BIGINT) AS n
FROM s GROUP BY lang, split
"""


@query("stratified_split_counts", oracle=_STRAT_ORACLE)
def stratified_split_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/10/10 split with EXACT per-stratum proportions (each lang
    stratum lands within one row of its target — rank-block
    assignment, not binomial hashing). One window exchange keyed by
    the stratum; deterministic under any partitioning."""
    from pointdatabase_spark.operators import sampling as _samp3
    docs = testkit.load_table(spark, sf_dir, "documents")
    out = _samp3.stratified_split(docs, ["lang"], _STRAT_SPLITS)
    return (out.groupBy("lang", "split")
            .agg(F.count(F.lit(1)).alias("n")))


# --------------------------------------------------------------------------
# SCD-1 incremental merge (operators/sampling.upsert_latest_wins):
# union + per-key max(struct(version, payload)) — the map-side
# partial collapses duplicates before the exchange (one-pass cheaper
# than the window formulation the oracle uses; both pick the same
# row since (key, version) is unique).
# --------------------------------------------------------------------------

_UPSERT_ORACLE = f"""
WITH base AS (SELECT o_orderkey, o_custkey, o_totalprice FROM orders),
upd AS (SELECT o_orderkey, o_custkey,
               o_totalprice + 100.0 AS o_totalprice
        FROM orders WHERE o_orderkey % 10 < 3
        UNION ALL
        SELECT o_orderkey + 1000000000, o_custkey, 1.0
        FROM orders WHERE o_orderkey % 10 = 7),
t AS (SELECT *, 0 AS _v FROM base
      UNION ALL SELECT *, 1 AS _v FROM upd),
r AS (SELECT o_orderkey, o_custkey, o_totalprice, _v,
             row_number() OVER (PARTITION BY o_orderkey
                                ORDER BY _v DESC) AS rn
      FROM t)
SELECT _v, CAST(COUNT(*) AS BIGINT) AS n,
       {_rqs('SUM(o_totalprice)', 2)} AS sum_price_q
FROM r WHERE rn = 1 GROUP BY _v
"""


@query("upsert_latest_wins", oracle=_UPSERT_ORACLE)
def upsert_latest_wins_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lakehouse SCD-1 refresh over orders: 30% of keys overwritten,
    10% inserted under new keys, the rest carried forward; audit by
    surviving version. The merge is one union + one partial-
    aggregated key shuffle — per-ingest-cycle cost is O(base+delta)
    with no window state."""
    from pointdatabase_spark.operators import sampling as _samp4
    orders = testkit.load_table(spark, sf_dir, "orders")
    base = orders.select("o_orderkey", "o_custkey", "o_totalprice")
    upd = (base.where(F.col("o_orderkey") % 10 < 3)
           .withColumn("o_totalprice", F.col("o_totalprice") + 100.0)
           .unionByName(
               base.where(F.col("o_orderkey") % 10 == 7)
               .select((F.col("o_orderkey") + 1000000000)
                       .alias("o_orderkey"),
                       "o_custkey",
                       F.lit(1.0).alias("o_totalprice"))))
    merged = _samp4.upsert_latest_wins(base, upd, ["o_orderkey"])
    return (merged.groupBy("_v")
            .agg(F.count(F.lit(1)).alias("n"),
                 _rq(F.sum("o_totalprice"), 2).alias("sum_price_q")))


# --------------------------------------------------------------------------
# Registered-domain profile over the synthesized crawl (reuses the
# url_canonical_dedup synthesis): per-domain page/doc census + size
# stats — the corpus-mixture diagnostic every crawl pipeline keeps.
# --------------------------------------------------------------------------

_DOMAIN_ORACLE = f"""
WITH u AS ({_URL_SYN_SQL}),
c AS (SELECT u.doc_id, d.n_chars,
             {_web.canonical_url_sql('u.url')} AS canon_url
      FROM u JOIN documents d USING (doc_id)),
h AS (SELECT doc_id, n_chars, canon_url,
             regexp_extract(canon_url,
                 '^[a-z][a-z0-9+.-]*://([^/:?]+)', 1) AS host
      FROM c)
SELECT regexp_extract(host, '([^.]+\\.[^.]+)$', 1) AS domain,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT canon_url) AS BIGINT) AS n_pages,
       {_rqs('AVG(CAST(n_chars AS DOUBLE))', 4)} AS avg_chars_q
FROM h GROUP BY 1
"""


@query("domain_profile", oracle=_DOMAIN_ORACLE)
def domain_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-registered-domain census (docs, distinct canonical pages,
    mean document size) — the mixture diagnostic that feeds domain
    weighting. One domain-keyed aggregation; the distinct-page count
    is the only Expand, bounded by the url column. Domain extraction
    is the last-two-labels heuristic (a public-suffix table drops in
    as a broadcast map without changing the plan)."""
    docs = testkit.load_table(spark, sf_dir, "documents")
    u = _syn_urls(docs).join(docs.select("doc_id", "n_chars"), "doc_id")
    c = u.withColumn("canon_url", _web.canonical_url("url"))
    h = c.withColumn(
        "host",
        F.regexp_extract("canon_url", "^[a-z][a-z0-9+.-]*://([^/:?]+)", 1))
    return (h.groupBy(
        F.regexp_extract("host", r"([^.]+\.[^.]+)$", 1).alias("domain"))
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.countDistinct("canon_url").alias("n_pages"),
             _rq(F.avg(F.col("n_chars").cast("double")), 4)
             .alias("avg_chars_q")))


# --------------------------------------------------------------------------
# Johnson-Lindenstrauss random projection (operators/similarity.
# random_projection): 64 -> 16 dims with exact-binary 1/4 scaling;
# the audit pairs every projected cosine against the exact original
# on a 30-vector sample. Deterministic md5 planes, zero shuffle for
# the projection itself.
# --------------------------------------------------------------------------

_RP_DIM = 16
_RP_PLANES = _sim.hyperplanes(_RP_DIM, _DIM, salt="rp_")


def _duck_proj(vec: str) -> str:
    comps = ", ".join(f"({_duck_plane_dot(vec, pl)} * 0.25)"
                      for pl in _RP_PLANES)
    return f"[{comps}]"


_RP_ORACLE = f"""
WITH p AS (SELECT vec_id, embedding, {_duck_proj('embedding')} AS proj
           FROM embeddings WHERE vec_id < 30)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       {_duck_cos('a.embedding', 'b.embedding')} AS cos_orig,
       {_duck_dot('a.proj', 'b.proj', _RP_DIM)}
         / (sqrt({_duck_dot('a.proj', 'a.proj', _RP_DIM)})
            * sqrt({_duck_dot('b.proj', 'b.proj', _RP_DIM)})) AS cos_proj
FROM p a JOIN p b ON a.vec_id < b.vec_id
"""


@query("embedding_random_projection", oracle=_RP_ORACLE)
def embedding_random_projection(spark: SparkSession, sf_dir: str
                                ) -> DataFrame:
    """JL-project the embeddings 64->16 (zero-shuffle literal-matrix
    map pass) and audit distance preservation: original vs projected
    cosine for all pairs of a 30-vector sample. At 100 TB the
    projection is the cheap pre-pass that shrinks the ANN corpus 4x
    before bucketing; the audit's all-pairs stage only ever runs on
    a driver-bounded sample."""
    from pointdatabase_spark.operators import similarity as _sim2
    emb = testkit.load_table(spark, sf_dir, "embeddings")
    p = (_sim2.random_projection(
            emb.where(F.col("vec_id") < 30), _RP_DIM)
         .select("vec_id", "embedding", "proj"))
    a = p.select(F.col("vec_id").alias("id_a"),
                 F.col("embedding").alias("_ea"),
                 F.col("proj").alias("_pa"))
    b = p.select(F.col("vec_id").alias("id_b"),
                 F.col("embedding").alias("_eb"),
                 F.col("proj").alias("_pb"))
    j = a.join(b, F.col("id_a") < F.col("id_b"))
    return j.select(
        "id_a", "id_b",
        F.expr(_sim2.cosine_expr("_ea", "_eb")).alias("cos_orig"),
        F.expr(_sim2.cosine_expr("_pa", "_pb")).alias("cos_proj"))


# --------------------------------------------------------------------------
# Streaming SCD-1 maintenance (streaming/upsert.py): update batches
# land as files, foreachBatch merges each into a versioned parquet
# snapshot (exactly-once via checkpointed offsets + batch-id
# markers). The audit reads the final snapshot; the oracle computes
# the same final state directly from orders. n_versions pins the
# two-batch sequencing (init + 2 merges).
# --------------------------------------------------------------------------

_STREAM_UPSERT_ORACLE = f"""
WITH base AS (SELECT o_orderkey, o_custkey, o_totalprice FROM orders),
fin AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 10 < 3 THEN o_totalprice + 100.0
              WHEN o_orderkey % 10 = 4 THEN o_totalprice + 200.0
              ELSE o_totalprice END AS p
  FROM base
  UNION ALL
  SELECT o_orderkey + 1000000000, 1.0
  FROM base WHERE o_orderkey % 10 = 7)
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN o_orderkey >= 1000000000 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_inserted,
       {_rqs('SUM(p)', 2)} AS sum_price_q,
       CAST(3 AS BIGINT) AS n_versions
FROM fin
"""


@query("streaming_upsert", oracle=_STREAM_UPSERT_ORACLE)
def streaming_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two update files drain through the availableNow upsert stream
    (one batch per file — arrival-order semantics), each merging
    into a new complete snapshot; the final snapshot must equal the
    batch-computed SCD result and the version count must show the
    init + 2 sequential merges."""
    import hashlib as _hl
    import os as _os
    import shutil as _sh
    from pointdatabase_spark.streaming import upsert as _su
    tag = (f"{_os.getpid()}_"
           f"{_hl.md5(sf_dir.encode()).hexdigest()[:8]}")
    state = f"/tmp/pdb_upstream_{tag}_state"
    landing = f"/tmp/pdb_upstream_{tag}_landing"
    ckpt = f"/tmp/pdb_upstream_{tag}_ckpt"
    for p in (state, landing, ckpt):
        _sh.rmtree(p, ignore_errors=True)
    orders = testkit.load_table(spark, sf_dir, "orders")
    base = orders.select("o_orderkey", "o_custkey", "o_totalprice")
    _su.init_state(base, state)
    upd1 = (base.where(F.col("o_orderkey") % 10 < 3)
            .withColumn("o_totalprice", F.col("o_totalprice") + 100.0))
    upd2 = (base.where(F.col("o_orderkey") % 10 == 4)
            .withColumn("o_totalprice", F.col("o_totalprice") + 200.0)
            .unionByName(
                base.where(F.col("o_orderkey") % 10 == 7)
                .select((F.col("o_orderkey") + 1000000000)
                        .alias("o_orderkey"), "o_custkey",
                        F.lit(1.0).alias("o_totalprice"))))
    upd1.repartition(1).write.mode("append").parquet(landing)
    upd2.repartition(1).write.mode("append").parquet(landing)
    schema = spark.read.parquet(landing).schema
    _su.run_upsert_stream(spark, landing, "*.parquet", schema, state,
                          ckpt, ["o_orderkey"])
    fin = _su.read_state(spark, state)
    nv = _su.latest_version(spark, state) + 1
    return fin.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("o_orderkey") >= 1000000000, 1)
              .otherwise(0)).cast("long").alias("n_inserted"),
        _rq(F.sum("o_totalprice"), 2).alias("sum_price_q"),
        F.lit(nv).cast("long").alias("n_versions"))


# --------------------------------------------------------------------------
# Capstone v3: the r9 wave composed end-to-end — unicode repair ->
# model-based quality gate -> canonical-url version dedup ->
# exact-proportion stratified split. One declarative plan; the
# oracle rebuilds every stage as CTEs from the same shared
# constants/templates.
# --------------------------------------------------------------------------

def _prep3_classifier_z(clean_expr: str) -> str:
    toks_d = f"string_split_regex({clean_expr}, '\\s+')"
    _, z = _classify.logit_exprs(_classify.weights(), "", toks_d)
    return z


_PREP3_ORACLE = f"""
WITH d AS (SELECT doc_id, lang,
        (CASE doc_id % 4
           WHEN 0 THEN {_sqlq(_NOISE_MOJ)}
           WHEN 1 THEN {_sqlq(_NOISE_SMART)}
           WHEN 2 THEN {_sqlq(_NOISE_CTL)}
           ELSE '' END)
        || replace(substr(text, 1, 120), ' ', '  ')
        || {_sqlq(_NOISE_TAIL)} AS dirty
      FROM documents),
c AS (SELECT doc_id, lang, {_norm_text_sql('dirty')} AS clean FROM d),
k AS (SELECT doc_id, lang FROM (
        SELECT doc_id, lang, {{z}} AS z FROM c) zz
      WHERE z / (1.0 + abs(z)) > 0.0),
u AS ({_URL_SYN_SQL}),
cu AS (SELECT doc_id, fetch_ts,
              {_web.canonical_url_sql('url')} AS canon_url
       FROM u),
kept_url AS (SELECT doc_id FROM (
        SELECT doc_id,
               row_number() OVER (PARTITION BY canon_url
                    ORDER BY fetch_ts DESC, doc_id) AS rn
        FROM cu) r WHERE rn = 1),
surv AS (SELECT k.doc_id, k.lang
         FROM k JOIN kept_url USING (doc_id)),
rk AS (SELECT lang, doc_id,
        row_number() OVER (PARTITION BY lang
             ORDER BY md5('v1' || CAST(doc_id AS VARCHAR)), doc_id)
          AS rn,
        COUNT(*) OVER (PARTITION BY lang) AS n
      FROM surv),
s AS (SELECT lang, {_strat_case_sql()} AS split FROM rk)
SELECT lang, split, CAST(COUNT(*) AS BIGINT) AS n_docs
FROM s GROUP BY lang, split
""".replace("{z}", _prep3_classifier_z("clean"))


@query("corpus_prep_v3", oracle=_PREP3_ORACLE)
def corpus_prep_v3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The r9 pipeline capstone: repair the synthesized dirty crawl,
    gate on the hashed-classifier score, keep one version per
    canonical url (freshest fetch), then stratified-split the
    survivors 80/10/10 per language. Repair + scoring are
    zero-shuffle map stages fused into the scan; the url dedup is
    one partial-agg key shuffle; the split is one stratum window —
    four pipeline stages, three exchanges total, nothing
    corpus-quadratic anywhere."""
    docs = testkit.load_table(spark, sf_dir, "documents")
    d = _dirty_docs(docs).join(docs.select("doc_id", "lang"), "doc_id")
    c = d.withColumn("clean", _norm_text(F.col("dirty")))
    scored = _classify.score_documents(
        c.select("doc_id", F.col("clean").alias("text")))
    k = (c.select("doc_id", "lang")
         .join(scored.where(F.col("keep")).select("doc_id"), "doc_id"))
    kept_url = _web.dedup_latest(_syn_urls(docs)).select("doc_id")
    surv = k.join(kept_url, "doc_id")
    from pointdatabase_spark.operators import sampling as _samp5
    out = _samp5.stratified_split(surv, ["lang"], _STRAT_SPLITS)
    return (out.groupBy("lang", "split")
            .agg(F.count(F.lit(1)).alias("n_docs")))


# --------------------------------------------------------------------------
# Ranking-window depth: percent_rank / cume_dist / ntile per user —
# all three are exact integer-ratio functions (rank arithmetic over
# counts), so the emitted doubles are single-division deterministic
# and compare bitwise with no rounding idiom needed.
# --------------------------------------------------------------------------

_RANKF_ORACLE = """
WITH r AS (SELECT user_id, event_id, value,
                  percent_rank() OVER w AS pr,
                  cume_dist() OVER w AS cd,
                  CAST(ntile(4) OVER w AS INT) AS quartile
           FROM events
           WINDOW w AS (PARTITION BY user_id
                        ORDER BY value, event_id))
SELECT user_id, event_id, pr, cd, quartile
FROM r WHERE user_id < 40
"""


@query("event_rank_features", oracle=_RANKF_ORACLE)
def event_rank_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user ranking features over event values (the classic
    feature-engineering trio): percent_rank for relative position,
    cume_dist for the empirical CDF, ntile(4) for quartile labels.
    One user-keyed window exchange; ties broken by event_id so the
    frame is a total order and every output is deterministic."""
    from pyspark.sql.window import Window
    ev = testkit.load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("value", "event_id")
    return (ev.select(
        "user_id", "event_id",
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
        F.ntile(4).over(w).cast("int").alias("quartile"))
        .where(F.col("user_id") < 40))


# --------------------------------------------------------------------------
# Stream-static broadcast enrichment (streaming/ingest.py transform
# hook): landing event files stream through a stateless broadcast
# join against the customer dimension and land enriched; the audit
# aggregates the enriched output. Stream-static joins re-read the
# static side per micro-batch — with the dim broadcast that is one
# small build per batch, ZERO stream-side state.
# --------------------------------------------------------------------------

_STREAM_DIM_ORACLE = f"""
SELECT c.c_mktsegment AS segment,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       {_rqs('SUM(e.value)', 2)} AS sum_value_q
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY 1
"""


@query("streaming_dim_join", oracle=_STREAM_DIM_ORACLE)
def streaming_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """availableNow ingest with a stream-static broadcast join: every
    event micro-batch enriches against the customer dimension
    map-side (stateless — no watermark, no state store) and lands
    partitioned-ready for downstream aggregation. The per-segment
    audit over the enriched output must equal the batch join."""
    import hashlib as _hl
    import os as _os
    import shutil as _sh
    from pointdatabase_spark.streaming.ingest import ingest_availablenow
    tag = (f"{_os.getpid()}_"
           f"{_hl.md5(sf_dir.encode()).hexdigest()[:8]}")
    landing = f"/tmp/pdb_dimjoin_{tag}_landing"
    out = f"/tmp/pdb_dimjoin_{tag}_out"
    ckpt = f"/tmp/pdb_dimjoin_{tag}_ckpt"
    for p in (landing, out, ckpt):
        _sh.rmtree(p, ignore_errors=True)
    ev = testkit.load_table(spark, sf_dir, "events")
    ev.repartition(3).write.parquet(landing)
    dim = (testkit.load_table(spark, sf_dir, "customer")
           .select(F.col("c_custkey").alias("user_id"),
                   F.col("c_mktsegment").alias("segment")))
    schema = spark.read.parquet(landing).schema
    ingest_availablenow(
        spark, landing, "*.parquet", schema, out, ckpt,
        transform=lambda s: s.join(F.broadcast(dim), "user_id"))
    enriched = spark.read.parquet(out)
    return (enriched.groupBy("segment")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 _rq(F.sum("value"), 2).alias("sum_value_q")))


# --------------------------------------------------------------------------
# CUSUM change-point drift monitor (operators/temporal.cusum_alarms):
# exact-integer Page recursion folded in (ts, value) order — alarm
# counts are bit-deterministic decisions. The oracle folds the same
# recursion via list_reduce with a struct accumulator.
# --------------------------------------------------------------------------

_CUSUM_TGT = 30_000_000   # micro-units: target 30.0
_CUSUM_THR = 200_000_000  # alarm threshold 200.0

_CUSUM_ORACLE = f"""
WITH q AS (SELECT event_type, ts,
        CAST(floor(CAST(value AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)
          AS vq
       FROM events),
g AS (SELECT event_type, list(vq ORDER BY ts, vq) AS s
      FROM q GROUP BY event_type),
f AS (SELECT event_type, len(s) AS n_obs,
        -- state packed into ONE BIGINT (cusum * 2^20 + alarms):
        -- DuckDB 1.0.0 list_reduce with a STRUCT accumulator
        -- updates fields sequentially IN PLACE, so a later field's
        -- expression sees the earlier field already overwritten
        -- (verified: alarm condition read the new cusum). A scalar
        -- accumulator has no fields to corrupt. cusum <= threshold
        -- + one step < 2^29 and alarms <= n_obs < 2^20, so the
        -- packing is exact.
        list_reduce(
          [CAST(0 AS BIGINT)] || s,
          (acc, x) ->
            CASE WHEN greatest((acc // 1048576) + x - {_CUSUM_TGT},
                               CAST(0 AS BIGINT)) > {_CUSUM_THR}
                 THEN (acc % 1048576) + 1
                 ELSE greatest((acc // 1048576) + x - {_CUSUM_TGT},
                               CAST(0 AS BIGINT)) * 1048576
                      + (acc % 1048576) END) AS st
      FROM g)
SELECT event_type, CAST(n_obs AS BIGINT) AS n_obs,
       CAST(st % 1048576 AS BIGINT) AS n_alarms,
       CAST(st // 1048576 AS BIGINT) AS final_cusum
FROM f
"""


@query("cusum_drift_alarms", oracle=_CUSUM_ORACLE)
def cusum_drift_alarms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM drift monitor per event type (Page 1954):
    alarm-and-reset whenever the cumulated excess over target=30
    crosses 200. Exact micro-unit integer recursion — the alarm
    count is a decision and must be ulp-proof."""
    from pointdatabase_spark.operators import temporal as _temporal
    ev = testkit.load_table(spark, sf_dir, "events")
    return _temporal.cusum_alarms(ev, ["event_type"], "ts", "value",
                                  target_q=_CUSUM_TGT, slack_q=0,
                                  threshold_q=_CUSUM_THR)


# --------------------------------------------------------------------------
# Two-sample chi-square drift (operators/profile.chi2_drift): pooled
# rank-based equal-frequency buckets (exact integers), per-bucket
# chi-square contributions as fixed single-op IEEE chains. The
# fixture splits events into pseudo-snapshots by event_id parity.
# --------------------------------------------------------------------------

_CHI2_ORACLE = """
WITH t AS (SELECT CASE WHEN event_id % 2 = 0 THEN 'snap_a'
                       ELSE 'snap_b' END AS g,
                  CAST(floor(CAST(value AS DOUBLE) * 1000000.0 + 0.5)
                       AS BIGINT) AS vq
           FROM events),
r AS (SELECT g, vq,
             row_number() OVER (ORDER BY vq, g) AS rn,
             COUNT(*) OVER () AS n
      FROM t),
bkt AS (SELECT CAST(floor(((rn - 1) * 10) / n) AS BIGINT) AS bucket,
               CASE WHEN g = 'snap_a' THEN 1 ELSE 0 END AS isa
        FROM r),
cnt AS (SELECT bucket,
               CAST(SUM(isa) AS BIGINT) AS n_a,
               CAST(SUM(1 - isa) AS BIGINT) AS n_b
        FROM bkt GROUP BY bucket),
tot AS (SELECT CAST(SUM(n_a) AS BIGINT) AS ta,
               CAST(SUM(n_b) AS BIGINT) AS tb FROM cnt)
SELECT bucket, n_a, n_b,
       (n_a - (n_a + n_b) * CAST(ta AS DOUBLE)
              / (CAST(ta AS DOUBLE) + CAST(tb AS DOUBLE)))
       * (n_a - (n_a + n_b) * CAST(ta AS DOUBLE)
              / (CAST(ta AS DOUBLE) + CAST(tb AS DOUBLE)))
       / ((n_a + n_b) * CAST(ta AS DOUBLE)
              / (CAST(ta AS DOUBLE) + CAST(tb AS DOUBLE)))
       + (n_b - (n_a + n_b) * CAST(tb AS DOUBLE)
              / (CAST(ta AS DOUBLE) + CAST(tb AS DOUBLE)))
       * (n_b - (n_a + n_b) * CAST(tb AS DOUBLE)
              / (CAST(ta AS DOUBLE) + CAST(tb AS DOUBLE)))
       / ((n_a + n_b) * CAST(tb AS DOUBLE)
              / (CAST(ta AS DOUBLE) + CAST(tb AS DOUBLE)))
       AS contrib
FROM cnt CROSS JOIN tot
"""


@query("snapshot_drift_chi2", oracle=_CHI2_ORACLE)
def snapshot_drift_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square homogeneity check between two pseudo-snapshots of
    the event stream (split by event_id parity), over 10 pooled
    equal-frequency value buckets — the snapshot-to-snapshot
    distribution-shift gate. Per-bucket contributions emitted (the
    10-row total is the caller's one addition) so every compared
    double is a deterministic single-op chain."""
    from pointdatabase_spark.operators import profile as _prof2
    ev = testkit.load_table(spark, sf_dir, "events")
    t = ev.select(
        F.when(F.col("event_id") % 2 == 0, F.lit("snap_a"))
        .otherwise(F.lit("snap_b")).alias("snap"), "value")
    return _prof2.chi2_drift(t, "snap", "value", buckets=10)


# --------------------------------------------------------------------------
# LSH recall audit (operators/dedup.lsh_recall_eval): exact ground
# truth (complete shared-shingle candidates + exact Jaccard) vs the
# minhash-LSH pipeline — the quantified quality gate for the dedup
# path. Oracle reuses THE shared minhash CTE block plus a truth CTE.
# --------------------------------------------------------------------------

_LSH_EVAL_TAIL = """
, post AS (SELECT id, unnest(s) AS x FROM sh2),
cp AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
       FROM post a JOIN post b ON a.x = b.x AND a.id < b.id),
truth AS (SELECT id_a, id_b
          FROM cp JOIN sh2 sa ON sa.id = cp.id_a
                  JOIN sh2 sb ON sb.id = cp.id_b
          WHERE len(list_intersect(sa.s, sb.s))
                  / (len(sa.s) + len(sb.s)
                     - len(list_intersect(sa.s, sb.s))) >= 0.5),
t AS (SELECT COUNT(*) AS n_truth FROM truth),
f AS (SELECT COUNT(*) AS n_found FROM pairs),
tp AS (SELECT COUNT(*) AS n_tp
       FROM (SELECT id_a, id_b FROM pairs) p
       JOIN truth USING (id_a, id_b))
SELECT CAST(n_truth AS BIGINT) AS n_truth,
       CAST(n_found AS BIGINT) AS n_found,
       CAST(n_tp AS BIGINT) AS n_tp,
       CASE WHEN n_found = 0 THEN 1.0
            ELSE CAST(n_tp AS DOUBLE) / n_found END AS lsh_precision,
       CASE WHEN n_truth = 0 THEN 1.0
            ELSE CAST(n_tp AS DOUBLE) / n_truth END AS lsh_recall
FROM t CROSS JOIN f CROSS JOIN tp
"""

# The audit SAMPLES the corpus (1-in-3 by BASE doc id, so planted
# dup pairs stay intact: d pairs with 100000+d / 200000+d) — exactly
# the documented at-scale practice, and it bounds the quadratic
# ground-truth side: unsampled sf0.1 measured 9.5 s, dominated by
# the truth posting join, not the audited LSH path.
_LSH_EVAL_CTE = ("WITH corpus AS (SELECT * FROM ("
                 + testkit.SYN_CORPUS_SQL.strip()
                 + ") sc WHERE (doc_id % 100000) % 3 = 0)")

_LSH_EVAL_ORACLE = _minhash_oracle_sql(
    _LSH_EVAL_CTE,
    tail=_LSH_EVAL_TAIL)


@query("lsh_recall_audit", oracle=_LSH_EVAL_ORACLE)
def lsh_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ground-truth recall of the MinHash-LSH near-dup pipeline on a
    deterministic 1-in-3 base-id sample of the planted corpus
    (sampling by BASE id keeps each dup pair whole, so the recall
    estimate is unbiased): complete truth pairs from the
    shared-shingle posting join, the LSH path audited against them.
    The Σdf²-bounding sample is the OPERATOR's arg (sample_mod /
    base_id_expr), not caller WHERE-clause discipline."""
    return _dedup.lsh_recall_eval(
        testkit.syn_corpus(spark, sf_dir),
        sample_mod=3, base_id_expr="doc_id % 100000")


# --------------------------------------------------------------------------
# r10: label propagation communities + count-min sketch audit
# --------------------------------------------------------------------------

_LABELPROP_ORACLE = f"""
WITH pairs AS (SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s
               FROM orders o JOIN lineitem l
                 ON o.o_orderkey = l.l_orderkey),
e AS (SELECT c AS a, s + {_PR_SUPP_NS} AS b FROM pairs
      UNION
      SELECT s + {_PR_SUPP_NS} AS a, c AS b FROM pairs),
l0 AS (SELECT DISTINCT a AS node FROM e),
c1 AS (SELECT e.a, l.node AS lbl, COUNT(*) AS c
       FROM e JOIN l0 l ON e.b = l.node GROUP BY e.a, l.node),
l1 AS (SELECT a AS node, lbl FROM (
         SELECT a, lbl, ROW_NUMBER() OVER (
           PARTITION BY a ORDER BY c DESC, lbl ASC) AS rn FROM c1)
       WHERE rn = 1),
c2 AS (SELECT e.a, l.lbl, COUNT(*) AS c
       FROM e JOIN l1 l ON e.b = l.node GROUP BY e.a, l.lbl),
l2 AS (SELECT a AS node, lbl FROM (
         SELECT a, lbl, ROW_NUMBER() OVER (
           PARTITION BY a ORDER BY c DESC, lbl ASC) AS rn FROM c2)
       WHERE rn = 1)
SELECT CAST(lbl AS BIGINT) AS community,
       CAST(COUNT(*) AS BIGINT) AS n_members
FROM l2 GROUP BY lbl
ORDER BY n_members DESC, community LIMIT 20
"""


@query("label_propagation_communities", oracle=_LABELPROP_ORACLE)
def label_propagation_communities(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """Two synchronous rounds of deterministic label propagation
    (most-frequent neighbor label, ties to the smallest) on the
    bidirected customer-supplier trading graph; the 20 largest
    communities. Per round: one src-keyed join over 1-long labels +
    two partial-agg shuffles (operators/graph.label_propagation) —
    PageRank's cost model, community output instead of rank."""
    from pointdatabase_spark.operators import graph as _graph
    orders = testkit.load_table(spark, sf_dir, "orders")
    li = testkit.load_table(spark, sf_dir, "lineitem")
    pairs = (orders.join(li, orders.o_orderkey == li.l_orderkey)
             .select(F.col("o_custkey").alias("c"),
                     F.col("l_suppkey").alias("s"))
             .distinct())
    fwd = pairs.select(F.col("c").alias("src"),
                       (F.col("s") + F.lit(_PR_SUPP_NS)).alias("dst"))
    lbl = _graph.label_propagation(fwd, iters=2)
    return (lbl.groupBy("label")
            .agg(F.count(F.lit(1)).alias("n_members"))
            .orderBy(F.col("n_members").desc(), F.col("label"))
            .limit(20)
            .select(F.col("label").cast("long").alias("community"),
                    F.col("n_members").cast("long")))


def _cms_oracle(depth: int, width: int, k: int) -> str:
    from pointdatabase_spark.operators.sketch import slot_duckdb
    cell_slot = slot_duckdb("term", "lane", width)
    probe_slot = slot_duckdb("t.term", "l.lane", width)
    return rf"""
WITH tok AS (SELECT unnest(string_split_regex(text, '\s+')) AS term
             FROM documents),
lanes AS (SELECT unnest(range({depth})) AS lane),
cells AS (SELECT lane, {cell_slot} AS slot,
                 CAST(COUNT(*) AS BIGINT) AS cnt
          FROM tok CROSS JOIN lanes GROUP BY 1, 2),
top AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS exact_cnt
        FROM tok GROUP BY term
        ORDER BY exact_cnt DESC, term LIMIT {k}),
probes AS (SELECT t.term, l.lane, {probe_slot} AS slot
           FROM top t CROSS JOIN lanes l),
est AS (SELECT p.term, MIN(COALESCE(c.cnt, 0)) AS cms_est
        FROM probes p LEFT JOIN cells c
          ON p.lane = c.lane AND p.slot = c.slot
        GROUP BY p.term)
SELECT t.term, t.exact_cnt, CAST(e.cms_est AS BIGINT) AS cms_est,
       CAST(e.cms_est - t.exact_cnt AS BIGINT) AS overcount
FROM top t JOIN est e ON t.term = e.term
"""


_CMS_ORACLE = _cms_oracle(depth=4, width=512, k=10)


@query("cms_frequency_audit", oracle=_CMS_ORACLE)
def cms_frequency_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch frequency audit: a fixed 4x512-counter sketch
    over the document token stream (ONE bounded-key shuffle — the
    cell space, never |vocab|), probed for the exact top-10 terms;
    reports per-term estimate and real overcount. The md5-slot
    recipe is shared with the DuckDB oracle counter-for-counter
    (operators/sketch.py)."""
    from pointdatabase_spark.operators import sketch as _sketch
    docs = _spread(testkit.load_table(spark, sf_dir, "documents"))
    return (_sketch.cms_heavy_hitter_audit(docs, "text", k=10,
                                           depth=4, width=512)
            .orderBy(F.col("exact_cnt").desc(), F.col("term")))


_STREAM_UPSERT_BUCKETED_ORACLE = f"""
WITH base AS (SELECT o_orderkey, o_custkey, o_totalprice FROM orders),
fin AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 10 < 3 THEN o_totalprice + 100.0
              WHEN o_orderkey % 10 = 4 THEN o_totalprice + 200.0
              ELSE o_totalprice END AS p
  FROM base
  UNION ALL
  SELECT o_orderkey + 1000000000, 1.0
  FROM base WHERE o_orderkey % 10 = 7)
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN o_orderkey >= 1000000000 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_inserted,
       {_rqs('SUM(p)', 2)} AS sum_price_q,
       CAST(3 AS BIGINT) AS n_versions
FROM fin
"""


@query("streaming_upsert_bucketed", oracle=_STREAM_UPSERT_BUCKETED_ORACLE)
def streaming_upsert_bucketed(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """The same two-update SCD-1 drain as ``streaming_upsert``, but
    through the huge-state BUCKETED path: the state lives as 32
    stable key-hash buckets, each batch rewrites only its dirty
    buckets, and readers resolve the manifest of the latest
    ``_SUCCESS``-guarded version — per-batch cost O(delta + touched
    buckets) instead of O(state) (streaming/upsert.py). The final
    resolved state must equal the full-rewrite SCD result exactly;
    clean-bucket byte-identity across batches is pinned by
    tests/test_streaming.py."""
    import hashlib as _hl
    import os as _os
    import shutil as _sh
    from pointdatabase_spark.streaming import upsert as _su
    tag = (f"{_os.getpid()}_"
           f"{_hl.md5(sf_dir.encode()).hexdigest()[:8]}")
    state = f"/tmp/pdb_upbkt_{tag}_state"
    landing = f"/tmp/pdb_upbkt_{tag}_landing"
    ckpt = f"/tmp/pdb_upbkt_{tag}_ckpt"
    for p in (state, landing, ckpt):
        _sh.rmtree(p, ignore_errors=True)
    orders = testkit.load_table(spark, sf_dir, "orders")
    base = orders.select("o_orderkey", "o_custkey", "o_totalprice")
    _su.init_state_bucketed(base, state, ["o_orderkey"], 32)
    upd1 = (base.where(F.col("o_orderkey") % 10 < 3)
            .withColumn("o_totalprice", F.col("o_totalprice") + 100.0))
    upd2 = (base.where(F.col("o_orderkey") % 10 == 4)
            .withColumn("o_totalprice", F.col("o_totalprice") + 200.0)
            .unionByName(
                base.where(F.col("o_orderkey") % 10 == 7)
                .select((F.col("o_orderkey") + 1000000000)
                        .alias("o_orderkey"), "o_custkey",
                        F.lit(1.0).alias("o_totalprice"))))
    upd1.repartition(1).write.mode("append").parquet(landing)
    upd2.repartition(1).write.mode("append").parquet(landing)
    schema = spark.read.parquet(landing).schema
    _su.run_upsert_stream_bucketed(spark, landing, "*.parquet",
                                   schema, state, ckpt,
                                   ["o_orderkey"], 32)
    fin = _su.read_state_bucketed(spark, state)
    nv = _su.latest_version(spark, state) + 1
    return fin.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("o_orderkey") >= 1000000000, 1)
              .otherwise(0)).cast("long").alias("n_inserted"),
        _rq(F.sum("o_totalprice"), 2).alias("sum_price_q"),
        F.lit(nv).cast("long").alias("n_versions"))


# --------------------------------------------------------------------------
# r10: engine-native sketch audits — measure Spark's own HLL++ and
# GK-percentile sketches against exact answers (the Spark-side
# estimates cannot be reproduced by DuckDB, so the oracle carries the
# EXACT values plus the audit verdicts, which are deterministic pure
# functions of the data: Spark's HLL++/approx_percentile are
# hash/rank-based with no RNG).
# --------------------------------------------------------------------------

_HLL_AUDIT_ORACLE = """
SELECT event_type,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact,
       TRUE AS hll_ok
FROM events GROUP BY event_type ORDER BY event_type
"""


@query("hll_cardinality_audit", oracle=_HLL_AUDIT_ORACLE)
def hll_cardinality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type distinct-user cardinality: the exact count next
    to a verdict on Spark's HLL++ sketch (rsd=0.02; the audit passes
    iff the estimate lands within 10% — five standard errors, so the
    flag is stable under any partitioning; HLL++ itself is
    deterministic, xxhash-based, RNG-free). At 100 TB the exact
    COUNT(DISTINCT) is the expensive path (per-key distinct shuffle)
    and the sketch is the serving path — the audit quantifies what
    that trade costs on THIS data, the same measure-don't-guess
    doctrine as lsh_recall_audit."""
    ev = testkit.load_table(spark, sf_dir, "events")
    return (ev.groupBy("event_type")
            .agg(F.countDistinct("user_id").cast("long")
                 .alias("n_exact"),
                 F.approx_count_distinct("user_id", 0.02)
                 .alias("_hll"))
            .select("event_type", "n_exact",
                    (F.abs(F.col("_hll") - F.col("n_exact"))
                     * F.lit(10) <= F.col("n_exact")).alias("hll_ok"))
            .orderBy("event_type"))


_PCT_AUDIT_ORACLE = """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       quantile_cont(user_id, 0.25) AS p25,
       quantile_cont(user_id, 0.50) AS p50,
       quantile_cont(user_id, 0.75) AS p75,
       TRUE AS approx_ok
FROM events GROUP BY event_type ORDER BY event_type
"""


@query("approx_percentile_audit", oracle=_PCT_AUDIT_ORACLE)
def approx_percentile_audit(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    """Exact interpolated quartiles of user_id per event type (both
    engines compute a + (b-a)*frac over INTEGER-valued neighbors
    with quarter fractions — every step exact in IEEE doubles, so
    the comparison is bitwise without rounding), plus a verdict on
    Spark's approx_percentile (GK sketch, accuracy 10000): each
    approximate quartile must land within 1 + 2% of the exact rank
    value — the absolute unit term because approx_percentile
    returns a NEAREST ACTUAL value, never an interpolation, so on
    an integer domain it legitimately sits up to one unit off the
    interpolated exact quartile. Accuracy 100000 keeps the GK
    summary UNCOMPRESSED below 100k rows per group — at the
    oracle-compared scales every sample is retained, so the verdict
    is a pure function of the data, independent of partition layout
    (the merge-order sensitivity a compressed GK summary would
    have); above that the verdict is the honest approximate audit.
    approx_percentile is the documented 100 TB mode for the
    rank-median operators (profile.robust_outliers) — this audit is
    the evidence that mode is safe."""
    ev = testkit.load_table(spark, sf_dir, "events")
    ex = F.expr("percentile(user_id, array(0.25D, 0.5D, 0.75D))")
    ap = F.expr("approx_percentile(user_id, "
                "array(0.25D, 0.5D, 0.75D), 100000)")
    ok = F.expr(
        "aggregate(zip_with(_ex, _ap, (e, a) ->"
        " abs(e - CAST(a AS DOUBLE)) * 50 <= 50 + abs(e)),"
        " true, (acc, x) -> acc AND x)")
    return (ev.groupBy("event_type")
            .agg(F.count(F.lit(1)).cast("long").alias("n"),
                 ex.alias("_ex"), ap.alias("_ap"))
            .select("event_type", "n",
                    F.col("_ex")[0].alias("p25"),
                    F.col("_ex")[1].alias("p50"),
                    F.col("_ex")[2].alias("p75"),
                    ok.alias("approx_ok"))
            .orderBy("event_type"))


_SCD_CDF_ORACLE = f"""
WITH base AS (SELECT o_orderkey, o_custkey, o_totalprice FROM orders)
SELECT 'delete' AS change_type,
       CAST(COUNT(*) AS BIGINT) AS n_keys,
       0.0 AS sum_price_q
FROM base WHERE o_orderkey % 10 = 9
UNION ALL
SELECT 'insert',
       CAST(COUNT(*) AS BIGINT),
       {_rqs('SUM(1.0)', 2)}
FROM base WHERE o_orderkey % 10 = 7
UNION ALL
SELECT 'update',
       CAST(COUNT(*) AS BIGINT),
       {_rqs("SUM(o_totalprice + CASE WHEN o_orderkey % 10 = 4 "
             "THEN 200.0 ELSE 100.0 END)", 2)}
FROM base WHERE o_orderkey % 10 < 3 OR o_orderkey % 10 = 4
ORDER BY change_type
"""


@query("scd_change_feed", oracle=_SCD_CDF_ORACLE)
def scd_change_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data feed between two SCD snapshots: the deterministic
    update batch (price bumps on %10<3 and %10=4, inserts from
    %10=7, deletes of %10=9) is applied with the batch MERGE, then
    ``state_diff`` emits one row per changed key via ONE full-outer
    key join with a null-safe struct comparison — output volume is
    the churn, never the state (streaming/upsert.py; Delta CDF
    semantics). Summarized per change_type."""
    from pointdatabase_spark.operators.sampling import upsert_latest_wins
    from pointdatabase_spark.streaming import upsert as _su
    orders = testkit.load_table(spark, sf_dir, "orders")
    base = orders.select("o_orderkey", "o_custkey", "o_totalprice")
    upd = (base.where(F.col("o_orderkey") % 10 < 3)
           .withColumn("o_totalprice", F.col("o_totalprice") + 100.0)
           .unionByName(
               base.where(F.col("o_orderkey") % 10 == 4)
               .withColumn("o_totalprice",
                           F.col("o_totalprice") + 200.0))
           .unionByName(
               base.where(F.col("o_orderkey") % 10 == 7)
               .select((F.col("o_orderkey") + 1000000000)
                       .alias("o_orderkey"), "o_custkey",
                       F.lit(1.0).alias("o_totalprice"))))
    merged = upsert_latest_wins(base, upd, ["o_orderkey"]).drop("_v")
    new = merged.where(F.col("o_orderkey") % 10 != 9)
    diff = _su.state_diff(base, new, ["o_orderkey"])
    return (diff.groupBy("change_type")
            .agg(F.count(F.lit(1)).alias("n_keys"),
                 _rq(F.sum(F.coalesce(F.col("o_totalprice"),
                                      F.lit(0.0))), 2)
                 .alias("sum_price_q"))
            .orderBy("change_type"))


# SCD Type-2 reconstruction: the oracle replays the identical
# window ladder (change flag -> running run id -> per-run min ts ->
# lead valid_to ordered by the run ordinal, so tied timestamps stay
# deterministic). All integer/epoch-micros arithmetic — bitwise.
_SCD2_ORACLE = """
WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS tus
           FROM events),
r AS (SELECT *, CASE WHEN event_type IS NOT DISTINCT FROM
               lag(event_type) OVER (PARTITION BY user_id
                                     ORDER BY tus, event_id)
          THEN 0 ELSE 1 END AS chg
      FROM e),
g AS (SELECT *, SUM(chg) OVER (PARTITION BY user_id
                               ORDER BY tus, event_id
                               ROWS UNBOUNDED PRECEDING) AS run
      FROM r),
h AS (SELECT user_id, event_type AS state, run,
             MIN(tus) AS valid_from_us,
             CAST(COUNT(*) AS BIGINT) AS n_rows
      FROM g GROUP BY user_id, event_type, run)
SELECT user_id, state, valid_from_us,
       lead(valid_from_us) OVER (PARTITION BY user_id ORDER BY run)
         AS valid_to_us,
       CAST(run AS BIGINT) AS version, n_rows
FROM h
"""


@query("scd2_dim_history", oracle=_SCD2_ORACLE)
def scd2_dim_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 dimension history reconstructed from the event log
    (operators/temporal.scd2_history): per user, consecutive
    same-event-type rows collapse into validity intervals
    [valid_from, valid_to) with a NULL-to current row, a 1-based
    version ordinal, and the collapsed row count — the time-travel
    dimension table the SCD-1 operators (upsert_latest_wins /
    state_diff) deliberately discard. One key-hash exchange; every
    window is key-partitioned (per-user history bounds the
    partition)."""
    ev = testkit.load_table(spark, sf_dir, "events")
    log = ev.select("user_id", timeconv.events_tus(ev).alias("tus"),
                    "event_type", "event_id")
    hist = _temporal.scd2_history(
        log, keys=["user_id"], state_cols=["event_type"],
        ts_col="tus", tiebreak=["event_id"])
    return hist.select(
        "user_id", F.col("event_type").alias("state"),
        F.col("valid_from").alias("valid_from_us"),
        F.col("valid_to").alias("valid_to_us"),
        "version", "n_rows")


# Streaming SCD2: drained closed intervals must equal EXACTLY the
# batch ladder's valid_to IS NOT NULL rows (open/current rows are
# withheld in state, the append-mode contract).
_SCD2_STREAM_ORACLE = """
WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS tus
           FROM events),
r AS (SELECT *, CASE WHEN event_type IS NOT DISTINCT FROM
               lag(event_type) OVER (PARTITION BY user_id
                                     ORDER BY tus, event_id)
          THEN 0 ELSE 1 END AS chg
      FROM e),
g AS (SELECT *, SUM(chg) OVER (PARTITION BY user_id
                               ORDER BY tus, event_id
                               ROWS UNBOUNDED PRECEDING) AS run
      FROM r),
h AS (SELECT user_id, event_type AS state, run,
             MIN(tus) AS valid_from,
             CAST(COUNT(*) AS BIGINT) AS n_rows
      FROM g GROUP BY user_id, event_type, run),
f AS (SELECT user_id, state, valid_from,
             lead(valid_from) OVER (PARTITION BY user_id
                                    ORDER BY run) AS valid_to,
             CAST(run AS BIGINT) AS version, n_rows
      FROM h)
SELECT user_id, state, valid_from, valid_to, version, n_rows
FROM f WHERE valid_to IS NOT NULL
"""


@query("streaming_scd2", oracle=_SCD2_STREAM_ORACLE)
def streaming_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Live-ingest SCD Type-2 (streaming/scd2.py,
    applyInPandasWithState): state is one open validity interval per
    key; a state change CLOSES the interval (emitted, half-open
    [from, to)) and opens the next. Open/current rows stay in state
    — so the availableNow drain equals EXACTLY the batch
    temporal.scd2_history's closed rows, which is what the oracle
    pins. State is O(active keys), one tuple per key."""
    from pointdatabase_spark.streaming import scd2 as _scd2s
    return _scd2s.run_scd2_stateful_availablenow(spark, sf_dir)


# Time-travel lookup against the SCD2 table: the oracle rebuilds the
# identical history ladder from the non-purchase log, then joins each
# purchase to the interval covering its timestamp.
_SCD2_ASOF_ORACLE = f"""
WITH e AS (SELECT user_id, event_id, event_type, value,
                  epoch_us(ts) AS tus
           FROM events),
d AS (SELECT user_id, event_id, event_type, tus FROM e
      WHERE event_type <> 'purchase'),
r AS (SELECT *, CASE WHEN event_type IS NOT DISTINCT FROM
               lag(event_type) OVER (PARTITION BY user_id
                                     ORDER BY tus, event_id)
          THEN 0 ELSE 1 END AS chg
      FROM d),
g AS (SELECT *, SUM(chg) OVER (PARTITION BY user_id
                               ORDER BY tus, event_id
                               ROWS UNBOUNDED PRECEDING) AS run
      FROM r),
h AS (SELECT user_id, event_type AS state, run, MIN(tus) AS vf
      FROM g GROUP BY user_id, event_type, run),
f AS (SELECT user_id, state, vf,
             lead(vf) OVER (PARTITION BY user_id ORDER BY run) AS vt
      FROM h),
p AS (SELECT user_id, tus, value FROM e
      WHERE event_type = 'purchase')
SELECT f.state, CAST(COUNT(*) AS BIGINT) AS n_purchases,
       {{sumq}} AS sum_value_q
FROM p JOIN f ON p.user_id = f.user_id
             AND p.tus >= f.vf AND (f.vt IS NULL OR p.tus < f.vt)
GROUP BY f.state
""".format(sumq=_rqs("SUM(p.value)", 2))


@query("scd2_asof_lookup", oracle=_SCD2_ASOF_ORACLE)
def scd2_asof_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-travel dimension lookup — the join the SCD2 table exists
    for: each purchase event resolves the user's state (last
    non-purchase event type) VALID AT its timestamp via the half-open
    [valid_from, valid_to) intervals from temporal.scd2_history, then
    one aggregate summarizes purchases per state. Plan: the history
    build's key-partitioned windows + ONE user-keyed equi-join whose
    residual carries the interval predicates (per-user history rows
    bound the join fan-out), + one map-combined aggregate. Purchases
    before a user's first dimension event have no covering interval
    and drop (inner-join semantics, mirrored in the oracle)."""
    ev = testkit.load_table(spark, sf_dir, "events")
    base = ev.select("user_id", timeconv.events_tus(ev).alias("tus"),
                     "event_type", "event_id", "value")
    hist = _temporal.scd2_history(
        base.where(F.col("event_type") != "purchase")
        .select("user_id", "tus", "event_type", "event_id"),
        keys=["user_id"], state_cols=["event_type"], ts_col="tus",
        tiebreak=["event_id"])
    dim = hist.select(F.col("user_id").alias("_hu"),
                      F.col("event_type").alias("state"),
                      "valid_from", "valid_to")
    facts = (base.where(F.col("event_type") == "purchase")
             .select("user_id", F.col("tus").alias("_pt"), "value"))
    j = facts.join(
        dim,
        (facts["user_id"] == dim["_hu"])
        & (F.col("_pt") >= F.col("valid_from"))
        & (F.col("valid_to").isNull()
           | (F.col("_pt") < F.col("valid_to"))))
    return (j.groupBy("state")
            .agg(F.count(F.lit(1)).cast("long").alias("n_purchases"),
                 _rq(F.sum("value"), 2).alias("sum_value_q")))


# Gram matrix: the oracle repeats the widen-then-multiply-then-sum
# term set via a positional unnest self-join; summation order differs,
# which the shared qround quantum absorbs (repo convention).
_GRAM_ORACLE = """
WITH x AS (SELECT vec_id, CAST(p AS BIGINT) - 1 AS i,
                  CAST(embedding[p] AS DOUBLE) AS v
           FROM (SELECT vec_id, embedding,
                        unnest(range(1, len(embedding) + 1)) AS p
                 FROM embeddings WHERE embedding IS NOT NULL))
SELECT a.i AS i, b.i AS j, CAST(COUNT(*) AS BIGINT) AS n_terms,
       {g} AS gram_q
FROM x a JOIN x b ON a.vec_id = b.vec_id AND b.i >= a.i
GROUP BY a.i, b.i
""".format(g=_rqs("SUM(a.v * b.v)", 6))


@query("embedding_gram_audit", oracle=_GRAM_ORACLE)
def embedding_gram_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact upper-triangle Gram matrix of the embedding corpus
    (operators/profile.gram_matrix) — the covariance-structure
    profile monitored between corpus snapshots (anisotropy drift,
    collapsed dimensions; the whitening input whose dim×dim
    eigensolve is then legitimately driver-side). Word-count
    economics: the dim² explode is scan-local and the map-side
    partial agg collapses each task to ≤ dim(dim+1)/2 rows before
    the single exchange."""
    from pointdatabase_spark.operators import profile as _prof
    emb = testkit.load_table(spark, sf_dir, "embeddings")
    return _prof.gram_matrix(emb, "embedding", quantize=6)


_SSJ_ORACLE = """
WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS tus, event_type
           FROM events),
p AS (SELECT l.user_id,
             c.tus - l.tus AS lag_us
      FROM (SELECT * FROM e WHERE event_type = 'click') l
      JOIN (SELECT * FROM e WHERE event_type = 'purchase') c
        ON l.user_id = c.user_id
       AND c.tus BETWEEN l.tus AND l.tus + 86400000000)
SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(SUM(lag_us) AS BIGINT) AS sum_lag_us
FROM p
"""


@query("streaming_stream_join", oracle=_SSJ_ORACLE)
def streaming_stream_join(spark: SparkSession,
                          sf_dir: str) -> DataFrame:
    """Stream-stream inner join: click and purchase event streams
    matched per user within a 24 h event-time band — watermarks on
    BOTH sides plus the range condition are what bound Spark's
    two-sided join state at scale (streaming/ingest.py). Under
    availableNow the emitted pair set equals the batch band join
    exactly; summarized with integer-only aggregates (pair count,
    distinct users, exact summed lag) so the comparison needs no
    rounding at all."""
    from pointdatabase_spark.streaming.ingest import \
        run_stream_stream_join_availablenow
    out = run_stream_stream_join_availablenow(spark, sf_dir)
    return out.agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.countDistinct("user_id").cast("long").alias("n_users"),
        F.sum("lag_us").cast("long").alias("sum_lag_us"))


_STREAM_DEDUP_ORACLE = """
WITH corpus AS (
  SELECT text FROM documents
  UNION ALL
  SELECT text FROM documents WHERE doc_id % 7 = 0)
SELECT CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS n_survivors
FROM corpus
"""


@query("streaming_exact_dedup", oracle=_STREAM_DEDUP_ORACLE)
def streaming_exact_dedup(spark: SparkSession,
                          sf_dir: str) -> DataFrame:
    """Streaming exact dedup (`dropDuplicatesWithinWatermark`, state
    bounded by the watermark horizon — dedup-window x arrival-rate
    state, never corpus history): the planted corpus with an exact
    copy of every 7th doc drains availableNow; exactly one row per
    distinct content fingerprint survives. WHICH copy survives is
    arrival-order dependent, so the deterministic contract is the
    survivor COUNT (streaming/ingest.py)."""
    from pointdatabase_spark.streaming.ingest import \
        run_stream_exact_dedup_availablenow
    out = run_stream_exact_dedup_availablenow(spark, sf_dir)
    return out.agg(F.count(F.lit(1)).cast("long").alias("n_survivors"))


_BUTTERFLY_ORACLE = """
WITH e0 AS (SELECT DISTINCT o.o_custkey AS l, l.l_partkey AS r
            FROM orders o JOIN lineitem l
              ON o.o_orderkey = l.l_orderkey),
deg AS (SELECT r, COUNT(*) AS d FROM e0 GROUP BY r),
e AS (SELECT e0.l, e0.r FROM e0 JOIN deg ON e0.r = deg.r
      WHERE deg.d <= 40),
w AS (SELECT a.l AS l1, b.l AS l2, COUNT(*) AS m
      FROM e a JOIN e b ON a.r = b.r AND a.l < b.l
      GROUP BY a.l, b.l)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM e) AS n_edges,
       CAST(COALESCE(SUM(m), 0) AS BIGINT) AS n_wedges,
       CAST(COALESCE(SUM(m * (m - 1) / 2), 0) AS BIGINT)
         AS n_butterflies
FROM w
"""


@query("bipartite_butterflies", oracle=_BUTTERFLY_ORACLE)
def bipartite_butterflies(spark: SparkSession,
                          sf_dir: str) -> DataFrame:
    """Butterfly (bipartite 4-cycle) census of the customer-PART
    purchase graph (median part degree ~30; the customer-supplier
    graph is near-complete — every supplier trades with ~500
    customers — which makes its butterfly count a degenerate
    near-maximum) with the Σdeg² valve at max_degree=40: the
    bipartite clustering signal via one degree-capped wedge
    self-join + exact BIGINT counting (operators/graph.py;
    triangle counting's bipartite analog — a bipartite graph has no
    triangles to count). The cap demonstrably drops the hot-part
    tail on this data, bounding the wedge join at Σ min(deg,40)²."""
    from pointdatabase_spark.operators import graph as _graph
    orders = testkit.load_table(spark, sf_dir, "orders")
    li = testkit.load_table(spark, sf_dir, "lineitem")
    edges = (orders.join(li, orders.o_orderkey == li.l_orderkey)
             .select(F.col("o_custkey").alias("src"),
                     F.col("l_partkey").alias("dst")))
    return _graph.butterfly_count(edges, max_degree=40)


# --------------------------------------------------------------------------
# Unipartite graph analytics (operators/graph.py) over the part
# CO-PURCHASE graph: parts are adjacent when they appear together in
# >= 2 distinct orders (the frequent-pair support prune — one repeat
# is affinity, one co-occurrence is noise; it also keeps the graph
# sparse the way real co-occurrence graphs are). All counting is
# exact BIGINT arithmetic; the oracles replay the degree-ordered
# wedge enumeration / peel rounds as CTEs and match bit-for-bit.
# --------------------------------------------------------------------------

_COPURCHASE_CTE = """
op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
pe AS (SELECT a.p AS u, b.p AS v, COUNT(*) AS c
       FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
       GROUP BY a.p, b.p),
e AS (SELECT u, v FROM pe WHERE c >= 2),
dg AS (SELECT n, COUNT(*) AS d
       FROM (SELECT u AS n FROM e UNION ALL SELECT v FROM e)
       GROUP BY n)
"""

_TRIANGLE_TAIL = """
arcs AS (SELECT CASE WHEN du.d < dv.d OR (du.d = dv.d AND e.u < e.v)
                     THEN e.u ELSE e.v END AS a,
                CASE WHEN du.d < dv.d OR (du.d = dv.d AND e.u < e.v)
                     THEN e.v ELSE e.u END AS b,
                CASE WHEN du.d < dv.d OR (du.d = dv.d AND e.u < e.v)
                     THEN dv.d ELSE du.d END AS hd
         FROM e JOIN dg du ON e.u = du.n JOIN dg dv ON e.v = dv.n),
tr AS (SELECT t1.a AS a, t1.b AS b, t2.b AS c
       FROM arcs t1 JOIN arcs t2 ON t1.a = t2.a
            AND (t1.hd < t2.hd OR (t1.hd = t2.hd AND t1.b < t2.b))
       WHERE EXISTS (SELECT 1 FROM arcs cl
                     WHERE cl.a = t1.b AND cl.b = t2.b)),
pern AS (SELECT n, COUNT(*) AS t
         FROM (SELECT a AS n FROM tr UNION ALL SELECT b FROM tr
               UNION ALL SELECT c FROM tr)
         GROUP BY n),
census AS (SELECT dg.n AS node, dg.d AS d, COALESCE(pern.t, 0) AS t
           FROM dg LEFT JOIN pern ON dg.n = pern.n)
"""

_TRIANGLE_ORACLE = f"""
WITH {_COPURCHASE_CTE}, {_TRIANGLE_TAIL}
SELECT CAST(node AS BIGINT) AS node, CAST(d AS BIGINT) AS deg,
       CAST(t AS BIGINT) AS tri,
       CAST(CASE WHEN d >= 2 THEN (2000000 * t) // (d * (d - 1))
                 ELSE 0 END AS BIGINT) AS ccoef_ppm
FROM census
"""


def _copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Support-2 part co-purchase graph via graph.cooccurrence_edges:
    one groupBy(order) + in-row array pairing (C(|order|,2)-bounded,
    max order size ~17 here) + one support count — two shuffles, no
    posting self-join."""
    from pointdatabase_spark.operators import graph as _graph
    li = testkit.load_table(spark, sf_dir, "lineitem")
    return _graph.cooccurrence_edges(li, "l_orderkey", "l_partkey",
                                     min_support=2)


@query("triangle_census", oracle=_TRIANGLE_ORACLE)
def triangle_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle counts + exact-ppm local clustering on the
    support-2 part co-purchase graph, via the degree-ordered wedge
    enumeration (Σ C(outdeg,2) ≤ O(m^1.5) join volume, each triangle
    found exactly once; operators/graph.py). The co-occurrence pair
    join upstream is bounded by Σ_orders C(|order|,2) — max order
    size ~17 on this data, the same in-group quadratic bound as the
    shingle posting join."""
    from pointdatabase_spark.operators import graph as _graph
    return _graph.triangle_census(_copurchase_edges(spark, sf_dir))


_TRANSITIVITY_ORACLE = f"""
WITH {_COPURCHASE_CTE}, {_TRIANGLE_TAIL}
SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes,
       CAST(SUM(d) // 2 AS BIGINT) AS n_edges,
       CAST(SUM(d * (d - 1) // 2) AS BIGINT) AS n_wedges,
       CAST(SUM(t) // 3 AS BIGINT) AS n_triangles,
       CAST(CASE WHEN SUM(d * (d - 1) // 2) > 0
                 THEN (1000000 * SUM(t)) // (SUM(d * (d - 1) // 2))
                 ELSE 0 END AS BIGINT) AS transitivity_ppm
FROM census
"""


@query("graph_transitivity", oracle=_TRANSITIVITY_ORACLE)
def graph_transitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global transitivity (3·triangles / wedges, exact ppm) of the
    co-purchase graph — derived entirely from triangle_census's
    per-node output (Σtri counts each triangle 3×, which IS the
    3·triangles numerator) + one final aggregate; no second edge
    pass."""
    from pointdatabase_spark.operators import graph as _graph
    census = _graph.triangle_census(_copurchase_edges(spark, sf_dir))
    wedge = F.sum(F.expr("deg * (deg - 1) div 2"))
    return census.agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes"),
        F.expr("sum(deg) div 2").cast("long").alias("n_edges"),
        wedge.cast("long").alias("n_wedges"),
        F.expr("sum(tri) div 3").cast("long").alias("n_triangles"),
        F.when(wedge > 0,
               F.expr("(1000000 * sum(tri)) "
                      "div (sum(deg * (deg - 1) div 2))"))
        .otherwise(F.lit(0)).cast("long").alias("transitivity_ppm"))


_KCORE_ORACLE = f"""
WITH {_COPURCHASE_CTE},
k1 AS (SELECT n FROM dg WHERE d >= 2),
e1 AS (SELECT e.u, e.v FROM e JOIN k1 a ON e.u = a.n
                              JOIN k1 b ON e.v = b.n),
d2 AS (SELECT n, COUNT(*) AS d
       FROM (SELECT u AS n FROM e1 UNION ALL SELECT v FROM e1)
       GROUP BY n),
k2 AS (SELECT n FROM d2 WHERE d >= 2),
e2 AS (SELECT e1.u, e1.v FROM e1 JOIN k2 a ON e1.u = a.n
                                 JOIN k2 b ON e1.v = b.n)
SELECT CAST(n AS BIGINT) AS node, CAST(COUNT(*) AS BIGINT) AS deg
FROM (SELECT u AS n FROM e2 UNION ALL SELECT v FROM e2)
GROUP BY n
"""


@query("kcore_parts", oracle=_KCORE_ORACLE)
def kcore_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two synchronous 2-core peel rounds on the co-purchase graph
    (operators/graph.kcore): each round drops every node whose
    round-start degree is < 2 with its edges — the host/spam-nucleus
    prune. Each round is one endpoint-count aggregate + two id-only
    semi-joins; the oracle unrolls both rounds as CTEs."""
    from pointdatabase_spark.operators import graph as _graph
    return _graph.kcore(_copurchase_edges(spark, sf_dir), k=2,
                        rounds=2)


_SKEW_ORACLE = """
WITH cnt AS (SELECT CAST(l_partkey AS VARCHAR) AS k, COUNT(*) AS c
             FROM lineitem GROUP BY 1),
s AS (SELECT CAST(SUM(c) AS BIGINT) AS n_rows,
             CAST(COUNT(*) AS BIGINT) AS n_keys,
             CAST(MAX(c) AS BIGINT) AS max_cnt,
             (SELECT k FROM cnt ORDER BY c DESC, k LIMIT 1) AS top_key
      FROM cnt),
dist AS (SELECT c, COUNT(*) AS f FROM cnt GROUP BY c),
cum AS (SELECT c, SUM(f) OVER (ORDER BY c ROWS BETWEEN UNBOUNDED
                               PRECEDING AND CURRENT ROW) AS cum
        FROM dist)
SELECT s.n_rows, s.n_keys, s.max_cnt,
       CAST((SELECT MIN(c) FROM cum
             WHERE cum >= (50 * s.n_keys + 99) // 100) AS BIGINT)
         AS p50_cnt,
       CAST((SELECT MIN(c) FROM cum
             WHERE cum >= (90 * s.n_keys + 99) // 100) AS BIGINT)
         AS p90_cnt,
       CAST((SELECT MIN(c) FROM cum
             WHERE cum >= (99 * s.n_keys + 99) // 100) AS BIGINT)
         AS p99_cnt,
       CAST((1000000 * s.n_rows) // s.n_keys AS BIGINT)
         AS mean_cnt_ppm,
       CAST((1000000 * s.max_cnt * s.n_keys) // s.n_rows AS BIGINT)
         AS skew_ratio_ppm,
       s.top_key
FROM s
"""


@query("join_skew_report", oracle=_SKEW_ORACLE)
def join_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-key skew diagnostic for lineitem's part key — exact
    nearest-rank percentiles of the per-key count distribution, max/
    mean skew ratio in exact ppm, hottest key (profile.key_skew_
    report): the measurement that decides salting vs AQE skew-split
    BEFORE a 100 TB join, with the only single-partition window over
    the distinct-count-value distribution, never the keys."""
    from pointdatabase_spark.operators.profile import key_skew_report
    li = testkit.load_table(spark, sf_dir, "lineitem")
    return key_skew_report(li, "l_partkey")


# --------------------------------------------------------------------------
# Retrieval extensions (operators/retrieval.py, r12): hybrid RRF
# fusion of the lexical (BM25) and dense (embedding cosine) top-k
# lists, the stored-inverted-index build aggregate, and exact-phrase
# search over a positional index. doc_id and vec_id share one id
# space by construction of the synthetic tables.
# --------------------------------------------------------------------------

_RRF_K0, _RRF_K = 60, 20

_HYBRID_ORACLE = rf"""
WITH d AS (SELECT doc_id,
                  string_split_regex(lower(coalesce(text, '')), '\s+')
                    AS toks
           FROM documents),
dl AS (SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl, toks FROM d),
s AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs, AVG(dl) AS avgdl
      FROM dl),
tf AS (SELECT doc_id, dl, tok, CAST(COUNT(*) AS DOUBLE) AS tf
       FROM (SELECT doc_id, dl, UNNEST(toks) AS tok FROM dl)
       WHERE tok IN ({_BM25_TERMS_SQL})
       GROUP BY doc_id, dl, tok),
dfreq AS (SELECT tok, CAST(COUNT(*) AS DOUBLE) AS df FROM tf
          GROUP BY tok),
sc AS (SELECT tf.doc_id,
              floor((SUM(
                ln(1 + (s.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5))
                * tf.tf * {_BM25_K1 + 1.0!r}
                / (tf.tf + {_BM25_K1!r}
                   * ({1.0 - _BM25_B!r} + {_BM25_B!r} * tf.dl
                      / s.avgdl)))) * 1000000.0 + 0.5) / 1000000.0 AS bm25
       FROM tf JOIN dfreq ON tf.tok = dfreq.tok, s
       GROUP BY tf.doc_id),
lex AS (SELECT doc_id, bm25 FROM sc
        ORDER BY bm25 DESC, doc_id LIMIT {_RRF_K}),
lexr AS (SELECT doc_id,
                row_number() OVER (ORDER BY bm25 DESC, doc_id) AS r
         FROM lex),
q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
dn AS (SELECT e.vec_id, {_duck_cos('q.qv', 'e.embedding')} AS cos
       FROM embeddings e, q),
dnr AS (SELECT vec_id, r FROM (
          SELECT vec_id,
                 row_number() OVER (ORDER BY cos DESC, vec_id) AS r
          FROM dn)
        WHERE r <= {_RRF_K}),
con AS (SELECT doc_id AS id, 1.0 / ({float(_RRF_K0)!r} + r) AS c
        FROM lexr
        UNION ALL
        SELECT vec_id, 1.0 / ({float(_RRF_K0)!r} + r) FROM dnr)
SELECT id AS doc_id, {_rqs('SUM(c)', 9)} AS rrf,
       CAST(COUNT(*) AS BIGINT) AS n_lists
FROM con GROUP BY id
"""


@query("hybrid_rrf_search", oracle=_HYBRID_ORACLE)
def hybrid_rrf_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: the BM25 top-20 lexical list and the
    embedding-cosine top-20 dense list (query = vector 0) fused by
    reciprocal-rank fusion, score = Σ 1/(60 + rank)
    (retrieval.rrf_fuse) — rank-only fusion, so the two scorers'
    scales never meet. Both lists are k-bounded; the lexical rank
    uses the window-free O(k²) bounded_rank self-join and the fuse is
    one union + groupBy over 2k rows. Nothing after the two top-k
    cuts is corpus-scale."""
    from pointdatabase_spark.operators import retrieval as _retr
    docs = testkit.load_table(spark, sf_dir, "documents")
    emb = testkit.load_table(spark, sf_dir, "embeddings")
    lex = _retr.bm25_topk(docs, _BM25_TERMS, k=_RRF_K,
                          k1=_BM25_K1, b=_BM25_B)
    lexr = (_retr.bounded_rank(lex, "bm25", "doc_id")
            .select("doc_id", "rank"))
    dense = (_sim.cosine_topk(emb, emb.where(F.col("vec_id") == 0),
                              k=_RRF_K)
             .select(F.col("vec_id").alias("doc_id"), "rank"))
    return _retr.rrf_fuse([lexr, dense], id_col="doc_id",
                          k0=_RRF_K0, out_col="rrf")


_INV_MIN_DF = 3

_INV_ORACLE = rf"""
WITH d AS (SELECT doc_id,
                  string_split_regex(lower(coalesce(text, '')), '\s+')
                    AS toks
           FROM documents),
p AS (SELECT doc_id, UNNEST(toks) AS tok FROM d),
tf AS (SELECT tok, CAST(doc_id AS BIGINT) AS doc_id,
              CAST(COUNT(*) AS BIGINT) AS tf
       FROM p GROUP BY tok, doc_id),
k AS (SELECT tok, tf,
             tf * 4294967296 + (4294967295 - doc_id) AS key
      FROM tf),
idx AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS df,
               CAST(SUM(tf) AS BIGINT) AS cf, MAX(key) AS mk
        FROM k GROUP BY tok)
SELECT tok, df, cf,
       CAST(4294967295 - mk % 4294967296 AS BIGINT) AS top_doc,
       CAST(mk // 4294967296 AS BIGINT) AS top_tf
FROM idx WHERE df >= {_INV_MIN_DF}
"""


@query("inverted_index_stats", oracle=_INV_ORACLE)
def inverted_index_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stored-inverted-index build aggregate
    (retrieval.build_inverted_index): per term its document frequency,
    collection frequency, and champion posting (highest tf, smallest
    doc on ties) via an exact BIGINT-packed argmax. Two hash
    aggregates with map-side combine, output vocabulary-sized — the
    artifact a 100 TB corpus would serve BM25 from, written
    partitioned by term-hash bucket."""
    from pointdatabase_spark.operators import retrieval as _retr
    docs = testkit.load_table(spark, sf_dir, "documents")
    return _retr.build_inverted_index(docs, min_df=_INV_MIN_DF)


_PHRASE = ["stream", "spark"]

_PHRASE_ORACLE = rf"""
WITH d AS (SELECT doc_id,
                  string_split_regex(lower(coalesce(text, '')), '\s+')
                    AS toks
           FROM documents),
p AS (SELECT doc_id, i - 1 AS pos, toks[i] AS tok
      FROM d, UNNEST(generate_series(1, len(toks))) AS t(i)),
a AS (SELECT doc_id, pos FROM p WHERE tok = '{_PHRASE[0]}'),
b AS (SELECT doc_id, pos FROM p WHERE tok = '{_PHRASE[1]}')
SELECT a.doc_id, CAST(COUNT(*) AS BIGINT) AS n_occ
FROM a JOIN b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
GROUP BY a.doc_id
"""


@query("phrase_search", oracle=_PHRASE_ORACLE)
def phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-phrase search ("stream spark") over a positional index
    (retrieval.phrase_count): tokens posexplode with positions, each
    side filters to ONE phrase term's postings map-side, and term i
    joins term i+1 on (doc, pos+1) — the joins move O(phrase-term
    postings), never O(corpus tokens), keyed on high-cardinality
    (doc, pos)."""
    from pointdatabase_spark.operators import retrieval as _retr
    docs = testkit.load_table(spark, sf_dir, "documents")
    return _retr.phrase_count(docs, _PHRASE)


# --------------------------------------------------------------------------
# Gate audits (r12): classifier calibration (reliability diagram) and
# rule-vs-model filter agreement (Cohen's kappa) — the checks a
# pipeline runs before trusting a gate's threshold or dropping a
# redundant filter. All-BIGINT outputs (no double summation), so the
# driver hash is layout-proof by construction.
# --------------------------------------------------------------------------

_CAL_BINS = 10

_CAL_ORACLE = f"""
WITH sc AS ({_classify.score_documents_sql()}),
j AS (SELECT sc.score_q, (d.lang = 'en') AS lab
      FROM sc JOIN documents d USING (doc_id)),
b AS (SELECT LEAST({_CAL_BINS - 1},
                   CAST(floor((score_q + 1.0) / 2.0
                              * {float(_CAL_BINS)!r}) AS BIGINT)) AS bin,
             CAST(floor(score_q * 1000000.0 + 0.5) AS BIGINT) AS m,
             CAST(lab AS BIGINT) AS y
      FROM j)
SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(m) AS BIGINT) AS sum_score_micro,
       CAST((1000000 * SUM(y)) // COUNT(*) AS BIGINT) AS pos_ppm
FROM b GROUP BY bin
"""


@query("classifier_calibration", oracle=_CAL_ORACLE)
def classifier_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram for the model quality gate
    (classify.calibration_bins): sigmoid scores bucketed into 10
    bins, per bin the support, exact micro-unit score sum, and the
    positive rate against the lang='en' reference label, all BIGINT
    (bit-identical on any engine/layout). One map-side-combined hash
    aggregate to 10 rows; the label rides the scoring projection
    (extra_cols) — no join back to the corpus."""
    docs = testkit.load_table(spark, sf_dir, "documents")
    scored = _classify.score_documents(docs, extra_cols=("lang",))
    scored = scored.withColumn("_lab", F.col("lang") == F.lit("en"))
    return _classify.calibration_bins(scored, "_lab",
                                      n_bins=_CAL_BINS)


_KAPPA_ORACLE = f"""
WITH g AS (SELECT doc_id,
                  ({_REP_KEEP_TMPL.format(
                      dup=_text.duckdb_expr('dup_token_ratio', 'text'),
                      cov=_text.duckdb_expr('top_bigram_cover', 'text'),
                      run=_text.duckdb_expr('max_token_run', 'text'),
                      **_REP_THRESH)}) = 1 AS rk
           FROM documents),
s AS ({_classify.score_documents_sql()}),
j AS (SELECT s.keep AS ck, g.rk AS rk FROM s JOIN g USING (doc_id)),
c AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN ck AND rk THEN 1 ELSE 0 END)
                  AS BIGINT) AS both_keep,
             CAST(SUM(CASE WHEN ck AND NOT rk THEN 1 ELSE 0 END)
                  AS BIGINT) AS a_only,
             CAST(SUM(CASE WHEN NOT ck AND rk THEN 1 ELSE 0 END)
                  AS BIGINT) AS b_only,
             CAST(SUM(CASE WHEN NOT ck AND NOT rk THEN 1 ELSE 0 END)
                  AS BIGINT) AS both_drop
      FROM j),
k AS (SELECT *,
             n * (both_keep + both_drop)
             - ((both_keep + a_only) * (both_keep + b_only)
                + (b_only + both_drop) * (a_only + both_drop)) AS num,
             n * n
             - ((both_keep + a_only) * (both_keep + b_only)
                + (b_only + both_drop) * (a_only + both_drop)) AS den
      FROM c)
SELECT n, both_keep, a_only, b_only, both_drop,
       CAST((1000000 * (both_keep + both_drop)) // n AS BIGINT)
         AS po_ppm,
       CAST(CASE WHEN den = 0 THEN 1000000
                 ELSE (1000000 * num) // den END AS BIGINT)
         AS kappa_ppm
FROM k
"""


@query("filter_agreement_kappa", oracle=_KAPPA_ORACLE)
def filter_agreement_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between the model gate (classifier keep at
    threshold 0) and the rule gate (Gopher repetition keep) —
    profile.rater_agreement. Both gates are scan-local codegen
    expressions (the rule features ride the scoring projection, no
    corpus join) over a _spread corpus — the CPU-bound token-array
    lambdas must fan out past the parquet's native split count
    (measured 4x wall at sf0.1). The 2×2 contingency aggregates on
    the boolean PAIR (4 cells, map-side combined) and kappa is
    exact BIGINT ppm (Spark `div` == DuckDB `//`, both truncate
    toward zero), valid to n = 3·10⁶ via an in-plan assert — larger
    corpora audit a hash_split sample."""
    from pointdatabase_spark.operators.profile import rater_agreement
    docs = _text.with_rep_arrays(
        _spread(testkit.load_table(spark, sf_dir, "documents")), "text")
    feats = docs.withColumn(
        "dup", _text.spark_expr("dup_token_ratio", "text", "_toks")
    ).withColumn(
        "cov", _text.spark_expr("top_bigram_cover", "text", "_toks",
                                bg="_bg", st="_st")
    ).withColumn(
        "run", _text.spark_expr("max_token_run", "text", "_toks",
                                bg="_bg", st="_st"))
    rule = F.expr(_REP_KEEP_TMPL.format(dup="dup", cov="cov",
                                        run="run", **_REP_THRESH))
    feats = feats.withColumn("rule_keep", rule == 1)
    scored = _classify.score_documents(feats, extra_cols=("rule_keep",))
    return rater_agreement(scored, "keep", "rule_keep")


@query("bm25_served", oracle=_BM25_ORACLE)
def bm25_served(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The STORED-index serving path for keyword search
    (retrieval.write_text_index / bm25_topk_served): postings and df
    tables written partitioned by term-hash bucket once, then the
    same 3-term query as `bm25_search` served by reading ONLY the
    query terms' buckets (driver-computed bucket list → partition
    pruning) — per-query cost O(query-term postings), NO corpus
    scan. Same oracle as bm25_search: the store-then-serve roundtrip
    must be bit-identical to the inline plan."""
    import hashlib as _hl
    import os as _os
    import shutil as _sh
    from pointdatabase_spark.operators import retrieval as _retr
    docs = testkit.load_table(spark, sf_dir, "documents")
    path = (f"/tmp/pdb_textidx_{_os.getpid()}_"
            f"{_hl.md5(sf_dir.encode()).hexdigest()[:8]}")
    _sh.rmtree(path, ignore_errors=True)
    _retr.write_text_index(docs, path)
    return _retr.bm25_topk_served(spark, path, _BM25_TERMS, k=_BM25_K,
                                  k1=_BM25_K1, b=_BM25_B)


@query("bm25_index_incremental", oracle=_BM25_ORACLE)
def bm25_index_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-ingest keyword search
    (retrieval.append_text_index): the text index is built from PART
    of the corpus (doc_id % 5 != 4), the rest arrives as an appended
    delta — appended posting files in the same bucket partitions,
    BIGINT-merged df table, exact integer adds into the stats row;
    the stored postings are never rescanned. Same oracle as
    bm25_search: base + delta must serve bit-identically to an index
    built from everything at once (exactness holds because stats
    hold integers, not the precomputed average)."""
    import hashlib as _hl
    import os as _os
    import shutil as _sh
    from pointdatabase_spark.operators import retrieval as _retr
    docs = testkit.load_table(spark, sf_dir, "documents")
    path = (f"/tmp/pdb_textidx_inc_{_os.getpid()}_"
            f"{_hl.md5(sf_dir.encode()).hexdigest()[:8]}")
    _sh.rmtree(path, ignore_errors=True)
    _retr.write_text_index(docs.where(F.col("doc_id") % 5 != 4), path)
    _retr.append_text_index(docs.where(F.col("doc_id") % 5 == 4), path)
    return _retr.bm25_topk_served(spark, path, _BM25_TERMS, k=_BM25_K,
                                  k1=_BM25_K1, b=_BM25_B)


@query("streaming_text_index", oracle=_BM25_ORACLE)
def streaming_text_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming keyword-index maintenance (streaming/textindex.py):
    documents land as files, an availableNow foreachBatch stream
    writes each batch as a LOG-STRUCTURED bid-partitioned index slice
    (postings + df delta + stats delta, dynamic partition overwrite —
    replays overwrite their own previous attempt, so exactly-once
    with no ledger and no read of stored data), and the served top-20
    must equal the build-everything-at-once oracle (the serve merges
    slices with exact BIGINT sums)."""
    import hashlib as _hl
    import os as _os
    import shutil as _sh
    from pointdatabase_spark.operators import retrieval as _retr
    from pointdatabase_spark.streaming.textindex import (
        run_text_index_maintenance)
    docs = testkit.load_table(spark, sf_dir, "documents")
    tag = (f"{_os.getpid()}_"
           f"{_hl.md5(sf_dir.encode()).hexdigest()[:8]}")
    path = f"/tmp/pdb_txtstream_{tag}_idx"
    landing = f"/tmp/pdb_txtstream_{tag}_landing"
    ckpt = f"/tmp/pdb_txtstream_{tag}_ckpt"
    for p in (path, landing, ckpt):
        _sh.rmtree(p, ignore_errors=True)
    docs.repartition(2).write.parquet(landing)
    schema = spark.read.parquet(landing).schema
    run_text_index_maintenance(spark, landing, "*.parquet", schema,
                               path, ckpt)
    return _retr.bm25_topk_served(spark, path, _BM25_TERMS, k=_BM25_K,
                                  k1=_BM25_K1, b=_BM25_B)


# PSI drift: same pooled equal-frequency buckets as the chi2 oracle
# (the CTE prefix is shared verbatim by slicing _CHI2_ORACLE), then
# the smoothed PSI contribution per bucket. ln is libm -> the emitted
# contribution quantizes to 9 dp (bm25 convention); counts stay exact.
_PSI_ORACLE = _CHI2_ORACLE[:_CHI2_ORACLE.rindex("SELECT bucket")] + """SELECT bucket, n_a, n_b,
       floor((((CAST(n_a AS DOUBLE) + 0.5)
               / (CAST(ta AS DOUBLE) + 5.0)
               - (CAST(n_b AS DOUBLE) + 0.5)
               / (CAST(tb AS DOUBLE) + 5.0))
              * ln(((CAST(n_a AS DOUBLE) + 0.5)
                    / (CAST(ta AS DOUBLE) + 5.0))
                   / ((CAST(n_b AS DOUBLE) + 0.5)
                      / (CAST(tb AS DOUBLE) + 5.0))))
             * 1000000000.0 + 0.5) / 1000000000.0 AS psi_q
FROM cnt CROSS JOIN tot
"""


@query("snapshot_drift_psi", oracle=_PSI_ORACLE)
def snapshot_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between the two pseudo-snapshots
    (profile.psi_drift): the effect-size companion to the chi2
    significance test, over the SAME exact rank-bucketed counts
    (range-sliced pooled ranking — no corpus window). Laplace-0.5
    smoothing keeps one-sided buckets finite; the 10-row Σ (compare
    to the 0.1 / 0.25 rule) is the caller's one addition."""
    from pointdatabase_spark.operators import profile as _prof3
    ev = testkit.load_table(spark, sf_dir, "events")
    t = ev.select(
        F.when(F.col("event_id") % 2 == 0, F.lit("snap_a"))
        .otherwise(F.lit("snap_b")).alias("snap"), "value")
    return _prof3.psi_drift(t, "snap", "value", buckets=10)


_PROX_SLOP = 2

_PROX_ORACLE = rf"""
WITH d AS (SELECT doc_id,
                  string_split_regex(lower(coalesce(text, '')), '\s+')
                    AS toks
           FROM documents),
p AS (SELECT doc_id, i - 1 AS pos, toks[i] AS tok
      FROM d, UNNEST(generate_series(1, len(toks))) AS t(i)),
a AS (SELECT doc_id, pos FROM p WHERE tok = '{_PHRASE[0]}'),
b AS (SELECT doc_id, pos FROM p WHERE tok = '{_PHRASE[1]}')
SELECT a.doc_id, CAST(COUNT(*) AS BIGINT) AS n_chains
FROM a JOIN b ON a.doc_id = b.doc_id
             AND b.pos > a.pos AND b.pos <= a.pos + {1 + _PROX_SLOP}
GROUP BY a.doc_id
"""


@query("proximity_search", oracle=_PROX_ORACLE)
def proximity_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered proximity search ("stream ... spark" within slop 2 —
    retrieval.proximity_count): phrase_count's positional join
    widened to a slop window, each step fanning a match to at most
    slop+1 successors; counts matching chains per document. Joins
    still move only the two terms' postings keyed on (doc, pos)."""
    from pointdatabase_spark.operators import retrieval as _retr
    docs = testkit.load_table(spark, sf_dir, "documents")
    return _retr.proximity_count(docs, _PHRASE, slop=_PROX_SLOP)


_BATCH_QUERIES = [(0, "spark"), (0, "vector"), (0, "stream"),
                  (1, "table"), (1, "merge"), (2, "batch")]
_BATCH_K = 10

_BATCH_VALUES = ", ".join(f"({q}, '{t}')" for q, t in _BATCH_QUERIES)

_BM25_BATCH_ORACLE = rf"""
WITH qt(q_id, tok) AS (VALUES {_BATCH_VALUES}),
d AS (SELECT doc_id,
             string_split_regex(lower(coalesce(text, '')), '\s+')
               AS toks
      FROM documents),
dl AS (SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl, toks FROM d),
s AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs, AVG(dl) AS avgdl
      FROM dl),
tf AS (SELECT doc_id, dl, tok, CAST(COUNT(*) AS DOUBLE) AS tf
       FROM (SELECT doc_id, dl, UNNEST(toks) AS tok FROM dl)
       WHERE tok IN (SELECT DISTINCT tok FROM qt)
       GROUP BY doc_id, dl, tok),
dfreq AS (SELECT tok, CAST(COUNT(*) AS DOUBLE) AS df FROM tf
          GROUP BY tok),
sc AS (SELECT qt.q_id, tf.doc_id,
              floor((SUM(
                ln(1 + (s.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5))
                * tf.tf * {_BM25_K1 + 1.0!r}
                / (tf.tf + {_BM25_K1!r}
                   * ({1.0 - _BM25_B!r} + {_BM25_B!r} * tf.dl
                      / s.avgdl)))) * 1000000.0 + 0.5) / 1000000.0 AS bm25
       FROM tf JOIN qt ON tf.tok = qt.tok
               JOIN dfreq ON tf.tok = dfreq.tok, s
       GROUP BY qt.q_id, tf.doc_id),
r AS (SELECT q_id, doc_id, bm25,
             CAST(row_number() OVER (PARTITION BY q_id
                  ORDER BY bm25 DESC, doc_id) AS BIGINT) AS rank
      FROM sc)
SELECT CAST(q_id AS BIGINT) AS q_id, doc_id, bm25, rank
FROM r WHERE rank <= {_BATCH_K}
"""


@query("bm25_batch_served", oracle=_BM25_BATCH_ORACLE)
def bm25_batch_served_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bulk retrieval from the stored index
    (retrieval.bm25_batch_served): three keyword queries resolved in
    ONE job — postings for the union of query terms read once
    (bucket partition pruning), scored per (query, doc) via a
    broadcast join on the term-count-sized query table, top-10 per
    query by a q_id-partitioned rank window (WindowGroupLimit — k
    rows per query reach the exchange). Per-batch cost O(union-term
    postings), independent of corpus size."""
    import hashlib as _hl
    import os as _os
    import shutil as _sh
    from pointdatabase_spark.operators import retrieval as _retr
    docs = testkit.load_table(spark, sf_dir, "documents")
    path = (f"/tmp/pdb_textidx_b_{_os.getpid()}_"
            f"{_hl.md5(sf_dir.encode()).hexdigest()[:8]}")
    _sh.rmtree(path, ignore_errors=True)
    _retr.write_text_index(docs, path)
    qdf = spark.createDataFrame(_BATCH_QUERIES, "q_id long, term string")
    return _retr.bm25_batch_served(spark, path, qdf, k=_BATCH_K,
                                   k1=_BM25_K1, b=_BM25_B)


_LS_ORACLE = testkit.syn_corpus_cte() + f"""
, f AS (SELECT doc_id, md5(coalesce(text, '')) AS fp FROM corpus),
u AS (SELECT doc_id, fp,
             {_duck_h32_id('fp', 'ls1')} / {float(1 << 32)!r} AS u
      FROM f),
s AS (SELECT fp, {_SPLIT_CASE} AS split FROM u)
SELECT split, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT fp) AS BIGINT) AS n_clusters
FROM s GROUP BY split
"""


@query("leakage_safe_split", oracle=_LS_ORACLE)
def leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/val/test assignment: the split key is the
    duplicate-CLUSTER fingerprint (md5 of the exact-dup text), not
    the document id, so copies of the same text can never straddle
    splits (train/test contamination by duplication — the classic
    eval-leak). Pure composition: fingerprint map-side, then the
    deterministic hash_split on the fp; by construction the
    assignment is a function of the cluster key (pinned in pytest on
    the planted-duplicate corpus). Output: per-split doc and cluster
    counts. For NEAR-dup safety substitute the connected-component
    cluster id (dedup_clusters) as the key — same one-line
    composition."""
    c = testkit.syn_corpus(spark, sf_dir)
    d = c.withColumn("fp", F.md5(F.coalesce(F.col("text"), F.lit(""))))
    s = _samp.hash_split(d, _SPLITS, id_col="fp", salt="ls1")
    return (s.groupBy("split")
            .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                 F.countDistinct("fp").cast("long").alias("n_clusters")))


_LBB_BS = 32

_LBB_ORACLE = rf"""
WITH n AS (SELECT doc_id,
                  CAST(len(string_split_regex(lower(coalesce(text, '')),
                                              '\s+')) AS BIGINT) AS nt
           FROM documents),
b AS (SELECT doc_id, nt,
             CASE WHEN nt <= 0 THEN 0
                  ELSE length(bin(nt)) - 1 END AS bucket,
             {_duck_h32_id('doc_id', 'lb1')} / {float(1 << 32)!r} AS u
      FROM n),
r AS (SELECT bucket, nt,
             row_number() OVER (PARTITION BY bucket
                                ORDER BY u, doc_id) AS rn
      FROM b),
g AS (SELECT bucket,
             bucket * 4294967296 + (rn - 1) // {_LBB_BS} AS batch_id,
             nt
      FROM r)
SELECT CAST(bucket AS BIGINT) AS bucket,
       CAST(batch_id AS BIGINT) AS batch_id,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(MAX(nt) AS BIGINT) AS max_len,
       CAST(SUM(nt) AS BIGINT) AS sum_len,
       CAST((1000000 * (MAX(nt) * COUNT(*) - SUM(nt)))
            // (MAX(nt) * COUNT(*)) AS BIGINT) AS waste_ppm
FROM g GROUP BY bucket, batch_id
"""


@query("length_bucketed_batches", oracle=_LBB_ORACLE)
def length_bucketed_batches_q(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """Length-bucketed inference batching
    (sampling.length_bucketed_batches): docs bucket by exact
    bit-length of their token count (within-2× lengths per bucket),
    pack into 32-row batches in deterministic hash order via the
    grouped range-slice rank (buckets are corpus-scale classes — no
    per-group single-task window), and report per-batch padding
    waste in exact integer ppm — the measurement that justifies
    bucketing before batched inference."""
    docs = testkit.load_table(spark, sf_dir, "documents")
    d = docs.withColumn(
        "n_tokens",
        F.size(F.split(F.lower(F.coalesce(F.col("text"), F.lit(""))),
                       r"\s+")).cast("long"))
    out = _samp.length_bucketed_batches(d, batch_size=_LBB_BS)
    return (out.groupBy("bucket", "batch_id")
            .agg(F.count(F.lit(1)).cast("long").alias("n_rows"),
                 F.max("n_tokens").cast("long").alias("max_len"),
                 F.sum("n_tokens").cast("long").alias("sum_len"))
            .withColumn(
                "waste_ppm",
                F.expr("(1000000 * (max_len * n_rows - sum_len)) "
                       "div (max_len * n_rows)").cast("long")))


_BOOL_MUST = ["spark", "stream"]
_BOOL_NOT = ["vector"]

_BOOL_ORACLE = rf"""
WITH d AS (SELECT doc_id,
                  string_split_regex(lower(coalesce(text, '')), '\s+')
                    AS toks
           FROM documents),
p AS (SELECT doc_id, UNNEST(toks) AS tok FROM d),
m AS (SELECT doc_id, CAST(SUM(1) AS BIGINT) AS sum_tf
      FROM p WHERE tok IN ('spark', 'stream')
      GROUP BY doc_id
      HAVING COUNT(DISTINCT tok) = 2),
x AS (SELECT DISTINCT doc_id FROM p WHERE tok = 'vector')
SELECT m.doc_id, m.sum_tf
FROM m LEFT JOIN x ON m.doc_id = x.doc_id
WHERE x.doc_id IS NULL
"""


@query("boolean_search_served", oracle=_BOOL_ORACLE)
def boolean_search_served_q(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    """Boolean retrieval from the stored index
    (retrieval.boolean_search_served): docs containing BOTH 'spark'
    and 'stream' and NOT 'vector' — conjunction as one
    distinct-term-count aggregate over the bucket-pruned postings
    (no |must|-way self-join), negation as one LEFT ANTI join; zero
    corpus scans, cost O(involved-term postings)."""
    import hashlib as _hl
    import os as _os
    import shutil as _sh
    from pointdatabase_spark.operators import retrieval as _retr
    docs = testkit.load_table(spark, sf_dir, "documents")
    path = (f"/tmp/pdb_textidx_bool_{_os.getpid()}_"
            f"{_hl.md5(sf_dir.encode()).hexdigest()[:8]}")
    _sh.rmtree(path, ignore_errors=True)
    _retr.write_text_index(docs, path)
    return _retr.boolean_search_served(spark, path, _BOOL_MUST,
                                       _BOOL_NOT)


_FACET_ORACLE = rf"""
WITH d AS (SELECT doc_id, lang,
                  string_split_regex(lower(coalesce(text, '')), '\s+')
                    AS toks
           FROM documents),
p AS (SELECT doc_id, lang, UNNEST(toks) AS tok FROM d),
h AS (SELECT DISTINCT lang AS facet, doc_id
      FROM p WHERE tok IN ({_BM25_TERMS_SQL}))
SELECT facet, CAST(COUNT(*) AS BIGINT) AS n_docs
FROM h GROUP BY facet
"""


@query("facet_counts_served", oracle=_FACET_ORACLE)
def facet_counts_served_q(spark: SparkSession,
                          sf_dir: str) -> DataFrame:
    """Faceted hit counts from the stored index
    (retrieval.facet_counts_served): per-language document counts for
    the 3-term OR query — facets DENORMALIZED onto postings at build
    time (`write_text_index(facet_cols=("lang",))`, the dl
    discipline), so the search-sidebar aggregate runs on the
    bucket-pruned postings with zero corpus joins; a doc counts once
    per facet however many terms it matches (distinct before
    count)."""
    import hashlib as _hl
    import os as _os
    import shutil as _sh
    from pointdatabase_spark.operators import retrieval as _retr
    docs = testkit.load_table(spark, sf_dir, "documents")
    path = (f"/tmp/pdb_textidx_fac_{_os.getpid()}_"
            f"{_hl.md5(sf_dir.encode()).hexdigest()[:8]}")
    _sh.rmtree(path, ignore_errors=True)
    _retr.write_text_index(docs, path, facet_cols=("lang",))
    return _retr.facet_counts_served(spark, path, _BM25_TERMS, "lang")
