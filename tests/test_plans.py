"""Physical-plan assertions (SCALE.md): pushdown, pruning, broadcast,
and JVM-only hot paths. These guard the properties that make the plans
survive a 100-TB scale-up, not just produce correct rows."""

from __future__ import annotations

import contextlib
import io

import pytest

from pyspark.sql import functions as F

from pointdatabase_spark import testkit
from pointdatabase_spark.operators import dedup, similarity, spatial
from pointdatabase_spark.sources import tile_store
from tests.conftest import SF_SMOKE


def _plan(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def test_box_query_pushes_filters_and_prunes_columns(spark):
    pts = testkit.syn_points(spark, SF_SMOKE)
    # on a raw parquet scan the residual x/y predicate can't push (they
    # are computed), but the column pruning must reach the reader.
    df = spatial.box_query(pts, (-50000.0, 25000.0), (-10000.0, 80000.0),
                           fields=["row_id", "x", "y", "h"])
    plan = _plan(df)
    assert "ReadSchema" in plan
    # only the 5 source columns needed survive into the scan
    read = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_comment" not in read and "l_shipdate" not in read


def test_tile_store_query_uses_partition_pruning(spark, tmp_path):
    pts = testkit.syn_points(spark, SF_SMOKE)
    path = str(tmp_path / "tiles")
    tile_store.write_tiles(pts, path, order_cols=["t"])
    df = tile_store.query_box(spark, path, (-35000.0, 42000.0),
                              (-90000.0, -10000.0),
                              fields=["row_id", "x", "y", "h"])
    plan = _plan(df)
    assert "PartitionFilters" in plan
    pf = plan.split("PartitionFilters:")[1].splitlines()[0]
    assert "tile_x" in pf and "tile_y" in pf
    # and the parquet column filter is pushed
    assert "PushedFilters" in plan


def test_cosine_topk_broadcasts_queries(spark):
    emb = testkit.load_table(spark, SF_SMOKE, "embeddings")
    df = similarity.cosine_topk(emb, emb.where(F.col("vec_id") < 3), k=5)
    plan = _plan(df, "simple")
    assert "Broadcast" in plan  # query side broadcast, corpus not shuffled


def test_text_and_minhash_signatures_are_jvm_only(spark):
    docs = testkit.load_table(spark, SF_SMOKE, "documents")
    sig = dedup.minhash_signatures(dedup.shingle_sets(docs))
    plan = _plan(sig, "simple")
    assert "Python" not in plan  # pure expression pipeline, codegen'd
    from pointdatabase_spark.functions import text
    feats = docs.select(text.spark_expr("n_tokens", "text"),
                        text.quality_score("text"))
    plan2 = _plan(feats, "simple")
    assert "Python" not in plan2
    assert "*(" in plan2  # whole-stage codegen marker


def test_raster_and_crs_plans_have_no_exchange(spark):
    from pointdatabase_spark.functions import crs
    from pointdatabase_spark.operators import raster
    pts = testkit.syn_points(spark, SF_SMOKE).select("row_id", "x", "y")
    g = raster.grid_from_formula(-100000.0, -100000.0, 2000.0, 2000.0,
                                 101, 101, lambda i, j: i + j)
    plan = _plan(raster.interp_join(pts, g), "simple")
    assert "Exchange" not in plan  # narrow map, no shuffle
    ll = pts.withColumn("lat", F.lit(70.0)).withColumn("lon", F.lit(0.0))
    x, y = crs.stereo_xy_columns("lat", "lon")
    assert "Exchange" not in _plan(ll.select(x.alias("x")), "simple")


def test_single_exchange_pipelines(spark):
    # run coalescing and batch sessionization each claim ONE shuffle:
    # an up-front hash partition on the group key satisfies the dedup/
    # window/groupBy distributions downstream (SCALE.md rows).
    from pointdatabase_spark.queries import (event_sessionization,
                                             run_coalescing)
    for q in (run_coalescing, event_sessionization):
        plan = _plan(q(spark, SF_SMOKE), "simple")
        assert plan.count("Exchange hashpartitioning") == 1, q.__name__


def test_multimodal_stages_have_no_exchange(spark):
    from pointdatabase_spark.operators import multimodal as mm
    docs = testkit.load_table(spark, SF_SMOKE, "documents")
    staged = mm.sample_frames(mm.attach_payload(docs), step=3)
    assert "Exchange" not in _plan(staged, "simple")
    resized = mm.resize_media(mm.decode_media(mm.attach_payload(docs)),
                              max_w=128, max_h=96)
    assert "Exchange" not in _plan(resized, "simple")


def test_spline_interp_has_no_exchange(spark):
    from pointdatabase_spark.operators import raster
    pts = testkit.syn_points(spark, SF_SMOKE).select("row_id", "x", "y")
    g = raster.grid_from_formula(-100000.0, -100000.0, 2000.0, 2000.0,
                                 101, 101, lambda i, j: i + j)
    plan = _plan(raster.interp_join(pts, g, kind="spline"), "simple")
    assert "Exchange" not in plan  # broadcast grid, narrow map


def test_multitable_lsh_buckets_are_jvm_and_queries_broadcast(spark):
    emb = testkit.load_table(spark, SF_SMOKE, "embeddings")
    tables = similarity.plane_tables(2, 6, 64)
    df = similarity.lsh_ann_topk_multi(emb, emb.where(F.col("vec_id") < 3),
                                       k=5, plane_sets=tables)
    plan = _plan(df, "simple")
    assert "Python" not in plan      # bucket ids are pure expressions
    assert "Broadcast" in plan       # query side broadcast
    # corpus shuffles only for candidate-dedup + window top-k, never
    # with vector payloads: exchanges carry (tid/bucket)-joined keys
    assert plan.count("Exchange hashpartitioning") <= 2


def test_ngram_jaccard_is_single_agg_exchange_jvm_only(spark):
    docs = testkit.load_table(spark, SF_SMOKE, "documents")
    df = dedup.ngram_jaccard_pairs(docs, ["lang"], n=2, threshold=0.2)
    plan = _plan(df, "simple")
    assert "Python" not in plan  # hashed postings are pure expressions
    # posting self-join + pair-count aggregate; no per-pair set ops
    assert "array_intersect" not in plan
    # the posting table feeds 4 consumers (self-join x2, set sizes x2);
    # the persist must collapse them onto ONE cached pipeline — a
    # regression back to 4 full scans was a 3.3x slowdown (r6).
    # (each InMemoryTableScan re-prints the cached relation's child,
    # so "Scan parquet" occurrences don't count executions here)
    assert plan.count("InMemoryTableScan") >= 3
    spark.catalog.clearCache()


def test_q1_is_codegen_with_partial_agg(spark):
    from pointdatabase_spark.queries import q1_pricing_summary
    df = q1_pricing_summary(spark, SF_SMOKE)
    plan = _plan(df)
    assert plan.count("HashAggregate") >= 2  # partial + final (map combine)
    df.collect()  # AQE finalizes the plan only on execution
    executed = df._jdf.queryExecution().executedPlan().toString()
    assert "*(" in executed  # whole-stage codegen spans


def test_bucketed_bin_join_has_no_exchange(spark, tmp_path):
    """Two stores bucketed on the bin key join with ZERO exchanges —
    the co-located-join path for big-big joins at scale."""
    from pointdatabase_spark.sources import tile_store
    pts = testkit.syn_points(spark, SF_SMOKE)
    pts2 = testkit.syn_points2(spark, SF_SMOKE)
    tile_store.write_bucketed(pts, "bkt_a", str(tmp_path / "a"),
                              n_buckets=8, order_cols=["t"])
    tile_store.write_bucketed(pts2.withColumn("t", F.col("row_id") * 1.0),
                              "bkt_b", str(tmp_path / "b"),
                              n_buckets=8, order_cols=["t"])
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # at test scale Catalyst would broadcast the small side (fine);
        # disable it to surface the big-big co-located path under test
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        a = spark.table("bkt_a").select("bin_x", "bin_y", "h")
        b = spark.table("bkt_b").select("bin_x", "bin_y",
                                        F.col("h").alias("h2"))
        joined = a.join(b, ["bin_x", "bin_y"])
        assert joined.count() > 0
        plan = _plan(joined, "simple")
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # both sides read pre-bucketed
        # bucket-pruned aggregation reuses the layout too
        agg = a.groupBy("bin_x", "bin_y").count()
        assert "Exchange" not in _plan(agg, "simple")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS bkt_a")
        spark.sql("DROP TABLE IF EXISTS bkt_b")


def test_sampling_plan_shapes(spark):
    """hash_split is a pure per-row expression — zero exchanges, so a
    100 TB corpus splits at scan speed; quota claims ONE exchange
    (the group-key window, WindowGroupLimit-bounded); packing moves
    the CORPUS exactly once (the r12 range-slice exchange — every
    other exchange in its plan carries only the O(slices·groups)
    ledger summary, never rows)."""
    from pointdatabase_spark.operators import sampling
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    split = sampling.hash_split(
        docs, [("train", 0.8), ("val", 0.1), ("test", 0.1)])
    assert "Exchange" not in _plan(split, "simple")
    q = sampling.per_group_quota(docs, ["lang"], 5)
    assert _plan(q, "simple").count("Exchange") == 1
    packed = sampling.pack_sequences(
        docs.withColumn("n_tokens", F.size(F.split("text", r"\s+"))),
        500, group_cols=["lang"])
    pplan = _plan(packed, "simple")
    # the corpus crosses the wire once: one range exchange feeding the
    # persisted slice frame (the plan STRING repeats that cached build
    # under each InMemoryTableScan, so count distinct plan_ids, not
    # text occurrences); the remaining exchanges aggregate the slice
    # summary (post partial-agg, <= slices*groups rows) and broadcast
    # the offsets back
    import re
    range_ids = set(re.findall(
        r"Exchange rangepartitioning[^\n]*plan_id=(\d+)", pplan))
    assert len(range_ids) == 1, pplan
    assert "BroadcastExchange" in pplan
    assert "BroadcastHashJoin" in pplan


def test_pii_scrub_is_scan_local(spark):
    """PII detect+redact is pure regexp expressions — zero exchanges,
    so a 100 TB scrub runs at scan speed."""
    from pointdatabase_spark.functions import pii
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = docs.select("doc_id", *pii.pii_counts("text"),
                      pii.scrub("text").alias("s"))
    plan = _plan(out, "simple")
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan  # no Python UDFs in the path


def test_mixture_sample_corpus_never_shuffles(spark):
    """The rate table broadcasts; the only hash exchanges feed the
    |domains|-row rate computation, never the corpus rows."""
    from pointdatabase_spark.operators import sampling
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    kept = sampling.mixture_sample(
        docs, {f"src{i}": float(1 + (i % 4)) for i in range(20)})
    plan = _plan(kept, "simple")
    assert "BroadcastHashJoin" in plan
    # corpus side reaches the broadcast join without an exchange: the
    # only hashpartitioning exchanges belong to the tiny rate aggregate
    assert plan.count("Exchange hashpartitioning") <= 2


def test_frequent_ngrams_single_shuffle_topk(spark):
    """Word-count shape: one exchange for the gram count, top-k as
    TakeOrdered — no global sort materialization."""
    from pointdatabase_spark import queries as registry
    df = registry.all_queries()["frequent_ngrams"](
        spark, "/root/testdata/sf0.001")
    plan = _plan(df, "simple")
    assert plan.count("Exchange hashpartitioning") == 1
    assert "TakeOrderedAndProject" in plan


def test_quality_deciles_have_no_global_window(spark):
    """Curriculum binning must bucket by VALUE against broadcast
    percentile thresholds — a global NTILE would appear as a Window
    with an empty partition spec, dragging the corpus into one
    partition. The plan must contain no Window operator at all and
    broadcast the 1-row threshold frame."""
    from pointdatabase_spark import queries as registry
    df = registry.all_queries()["quality_decile_census"](
        spark, SF_SMOKE)
    plan = _plan(df, "simple")
    assert "Window" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_q5_no_forced_broadcast_of_sf_scaled_tables(spark):
    """Scale safety for the 6-way TPC-H Q5 shape: only the
    constant-size tables (region: 5 rows, nation: 25 rows) may carry
    an explicit broadcast HINT — supplier (SF x 10k) and customer
    (SF x 150k) grow with the data, and a forced hint overrides
    Spark's size threshold (OOM at 100x scale).  AQE is still free to
    broadcast them at runtime while small, so we inspect the ANALYZED
    logical plan for ResolvedHint nodes, not the physical strategy.
    Also bound the fact-table exchanges: at most the orders key join
    plus the final aggregate."""
    from pointdatabase_spark import queries as registry
    for qname, n_hints_max in [("q5_local_supplier_volume", 2),
                               ("q3_shipping_priority", 0),
                               ("topk_per_group", 0)]:
        df = registry.all_queries()[qname](spark, SF_SMOKE)
        logical = df._jdf.queryExecution().analyzed().toString()
        n_hints = logical.count("ResolvedHint")
        assert n_hints <= n_hints_max, (
            f"{qname}: {n_hints} broadcast hints (max {n_hints_max}) "
            "— an SF-scaled table got a forced broadcast")
    # physical-plan shuffle bound still holds for Q5 (AQE broadcasts
    # the small sides at this SF, so the fact table shuffles at most
    # for the orders join + final agg)
    df = registry.all_queries()["q5_local_supplier_volume"](
        spark, SF_SMOKE)
    plan = _plan(df, "simple")
    assert plan.count("Exchange hashpartitioning") <= 4


def test_ann_index_query_prunes_partitions_dynamically(spark):
    """Stored ANN index: the probe join against the cell-partitioned
    cells/ table must carry a dynamic partition pruning filter — the
    property that makes per-batch cost O(probed cells), not O(index)."""
    from pointdatabase_spark import queries as registry
    df = registry.all_queries()["ann_index_topk"](
        spark, "/root/testdata/sf0.001")
    plan = _plan(df)
    assert "dynamicpruning" in plan
    assert "PartitionFilters" in plan


def test_rollup_trailing_two_exchanges_one_base_scan(spark):
    """Dense-key trailing scale path: one exchange for the bucket
    rollup, one for the key-partitioned window over BUCKETS — the
    window input must be the aggregated rollup, never the base table
    (that would re-admit the O(rows x frame) cost the pre-reduce
    exists to avoid)."""
    from pointdatabase_spark import queries as registry
    df = registry.all_queries()["rollup_trailing_window"](
        spark, "/root/testdata/sf0.001")
    plan = _plan(df, "simple")
    assert plan.count("Scan parquet") == 1
    assert plan.count("Exchange hashpartitioning") == 2
    assert "Window" in plan
    # the window sits ABOVE the aggregate in the tree: the aggregate
    # must appear deeper (later in the printed plan) than the window
    assert plan.index("Window") < plan.rindex("HashAggregate")


def test_q6_scan_aggregate_is_fully_pushed(spark):
    """TPC-H Q6 shape: all three predicates and the 4-column
    projection must reach the parquet reader, and the only exchange is
    the SinglePartition merge of the global aggregate — the plan that
    reads row-group stats instead of data at 100 TB."""
    from pointdatabase_spark import queries as registry
    df = registry.all_queries()["q6_revenue_delta"](spark, SF_SMOKE)
    plan = _plan(df)
    assert "GreaterThanOrEqual(l_shipdate" in plan
    assert "GreaterThanOrEqual(l_discount,0.04999)" in plan
    assert "LessThan(l_quantity,24.0)" in plan
    assert ("ReadSchema: struct<l_quantity:double,l_extendedprice:double,"
            "l_discount:double,l_shipdate:timestamp") in plan
    assert plan.count("Exchange hashpartitioning") == 0


def test_new_tpch_shapes_hint_only_fixed_size_tables(spark):
    """Same scale-safety contract as Q3/Q5: a forced broadcast hint is
    allowed only on genuinely fixed-size inputs — nation (25 rows) in
    Q7 and the 1-row MAX stats frame in Q15.  part/customer/supplier/
    orders all scale with SF and must be left to AQE."""
    from pointdatabase_spark import queries as registry
    for qname, n_hints_max in [("q7_volume_shipping", 2),   # nation x2
                               ("q14_promo_revenue", 0),
                               ("q17_small_qty_revenue", 0),
                               ("q18_large_volume_customer", 0),
                               ("q15_top_supplier", 1)]:    # 1-row max
        df = registry.all_queries()[qname](spark, SF_SMOKE)
        logical = df._jdf.queryExecution().analyzed().toString()
        n_hints = logical.count("ResolvedHint")
        assert n_hints <= n_hints_max, (
            f"{qname}: {n_hints} broadcast hints (max {n_hints_max}) "
            "— an SF-scaled table got a forced broadcast")


def test_r8_wave2_tpch_shapes_hint_only_fixed_size_tables(spark):
    """Scale-safety for the Q4/Q13/Q16/Q19/Q21/Q22 analogues: the only
    permitted broadcast hint is Q22's 1-row AVG stats frame; every
    SF-scaled side (orders, customer, lineitem, part, supplier, the
    filtered bad-supplier list) stays hint-free for AQE."""
    from pointdatabase_spark import queries as registry
    for qname, n_hints_max in [("q4_order_priority", 0),
                               ("q13_customer_distribution", 0),
                               ("q16_parts_supplier_count", 0),
                               ("q19_disjunctive_revenue", 0),
                               ("q21_waiting_supplier", 0),
                               ("q22_global_sales_opportunity", 1)]:
        df = registry.all_queries()[qname](spark, SF_SMOKE)
        logical = df._jdf.queryExecution().analyzed().toString()
        n_hints = logical.count("ResolvedHint")
        assert n_hints <= n_hints_max, (
            f"{qname}: {n_hints} broadcast hints (max {n_hints_max}) "
            "— an SF-scaled table got a forced broadcast")


def test_r8_wave2_join_strategies_and_pushdown(spark):
    """The subquery rewrites must surface as the right JOIN TYPES
    (semi for EXISTS, outer for Q13's zero-preserving count, anti for
    NOT IN / NOT EXISTS) and the scan-pushable residuals must reach
    the parquet readers — for Q19 that includes the factored
    implications of the OR-of-ANDs on BOTH scans."""
    from pointdatabase_spark import queries as registry
    q = registry.all_queries()
    p4 = _plan(q["q4_order_priority"](spark, SF_SMOKE))
    assert "LeftSemi" in p4
    assert "GreaterThanOrEqual(o_orderdate,1997-01-01" in p4
    p13 = _plan(q["q13_customer_distribution"](spark, SF_SMOKE))
    assert "LeftOuter" in p13
    assert "GreaterThanOrEqual(o_orderdate,2001-01-01" in p13
    p16 = _plan(q["q16_parts_supplier_count"](spark, SF_SMOKE))
    assert "LeftAnti" in p16
    assert "LessThan(s_acctbal,0.0)" in p16          # anti side filtered
    assert "In(p_size, " in p16                       # IN-list pushed
    p19 = _plan(q["q19_disjunctive_revenue"](spark, SF_SMOKE))
    assert "In(p_brand, [Brand#12,Brand#23,Brand#34])" in p19
    assert ("GreaterThanOrEqual(l_quantity,1.0)" in p19
            and "LessThanOrEqual(l_quantity,30.0)" in p19)
    p22 = _plan(q["q22_global_sales_opportunity"](spark, SF_SMOKE))
    assert "LeftAnti" in p22
    assert "EqualTo(o_orderpriority,1-URGENT)" in p22


def test_r8_wave3_tpch_shapes_hint_only_fixed_size_tables(spark):
    """Scale-safety for the suite-completing Q2/Q8/Q9/Q10/Q11/Q12/Q20
    analogues: broadcast hints are allowed ONLY on fixed-size inputs —
    nation (25 rows) and the filtered region row (Q11's scalar
    threshold enters as a driver literal, not a hinted frame).
    Every SF-scaled side (lineitem, orders, part,
    supplier, customer, the derived supply aggregates) stays hint-free
    so AQE picks the join strategy from runtime sizes."""
    from pointdatabase_spark import queries as registry
    for qname, n_hints_max in [("q2_min_cost_supplier", 2),
                               ("q8_national_market_share", 3),
                               ("q9_product_type_profit", 1),
                               ("q10_returned_items", 1),
                               ("q11_important_part_volume", 2),
                               ("q12_shipping_priority_classes", 0),
                               ("q20_dominant_part_supplier", 2)]:
        df = registry.all_queries()[qname](spark, SF_SMOKE)
        logical = df._jdf.queryExecution().analyzed().toString()
        n_hints = logical.count("ResolvedHint")
        assert n_hints <= n_hints_max, (
            f"{qname}: {n_hints} broadcast hints (max {n_hints_max}) "
            "— an SF-scaled table got a forced broadcast")


def test_r8_wave3_pushdown_and_single_scan_decorrelation(spark):
    """The wave-3 shapes' load-bearing plan properties: selective
    predicates reach the parquet scans, and the correlated-subquery
    rewrites (Q2's per-part min, Q20's per-part total) come from a
    window over the aggregate's OWN grouping key — exactly one
    lineitem scan each, never a self-join re-scan."""
    from pointdatabase_spark import queries as registry
    q = registry.all_queries()
    p2 = _plan(q["q2_min_cost_supplier"](spark, SF_SMOKE))
    assert p2.count("lineitem.parquet") == 1
    assert "EqualTo(p_size,15)" in p2
    assert "EqualTo(p_type,STANDARD)" in p2
    p10 = _plan(q["q10_returned_items"](spark, SF_SMOKE))
    assert "EqualTo(l_returnflag,R)" in p10
    assert "GreaterThanOrEqual(o_orderdate,1996-10-01" in p10
    assert "TakeOrderedAndProject" in p10
    p12 = _plan(q["q12_shipping_priority_classes"](spark, SF_SMOKE))
    assert "GreaterThanOrEqual(l_shipdate,1998-01-01" in p12
    p20 = _plan(q["q20_dominant_part_supplier"](spark, SF_SMOKE))
    assert p20.count("lineitem.parquet") == 1
    assert "StringStartsWith(p_name,small)" in p20
    p11 = _plan(q["q11_important_part_volume"](spark, SF_SMOKE))
    assert p11.count("lineitem.parquet") == 1


def test_q21_scans_lineitem_once(spark):
    """The textbook Q21 touches lineitem three times (outer + EXISTS +
    NOT EXISTS).  The decorrelated plan computes per-(order, supplier)
    lateness once and derives the per-order supplier/late counts with
    a window over the SAME grouped frame — exactly one lineitem scan
    and one orders scan in the plan."""
    from pointdatabase_spark import queries as registry
    df = registry.all_queries()["q21_waiting_supplier"](spark, SF_SMOKE)
    plan = _plan(df)
    assert plan.count("lineitem.parquet") == 1
    assert plan.count("orders.parquet") == 1


def test_q18_computes_the_order_aggregate_once(spark):
    """The textbook Q18 scans lineitem twice (HAVING subquery + outer
    SUM); because the outer group key is the order key they are the
    same aggregate, and the plan must contain exactly ONE lineitem
    scan."""
    from pointdatabase_spark import queries as registry
    df = registry.all_queries()["q18_large_volume_customer"](
        spark, SF_SMOKE)
    plan = _plan(df)
    assert plan.count("lineitem.parquet") == 1


def test_q7_prunes_fact_columns_and_orders_projection(spark):
    """Q7's lineitem scan must read only the 5 needed columns and
    orders only its 2 join keys — at 100 TB the projection IS the
    I/O budget."""
    from pointdatabase_spark import queries as registry
    df = registry.all_queries()["q7_volume_shipping"](spark, SF_SMOKE)
    plan = _plan(df)
    li = plan[plan.index("lineitem.parquet"):]
    li = li[li.index("ReadSchema"):][:300]
    assert "l_extendedprice" in li and "l_partkey" not in li
    od = plan[plan.index("orders.parquet"):]
    od = od[od.index("ReadSchema"):][:200]
    assert "o_orderkey" in od and "o_totalprice" not in od


def test_semantic_dedup_pairs_join_on_cell_key(spark):
    """SemDeDup's quadratic term must be cell-blocked: the pairwise
    cosine stage plans as an equi-join ON THE CELL KEY (hash or
    sort-merge), never a cartesian/nested-loop product — the property
    that makes the cost Σ|cell|² instead of corpus²."""
    from pointdatabase_spark import queries as registry
    df = registry.all_queries()["semantic_dedup"](spark, SF_SMOKE)
    plan = _plan(df, "simple")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "cell" in plan


def test_cluster_balanced_sample_census_is_broadcast(spark):
    """The per-cell census frame (bounded by n_centroids, a config
    constant) joins back by broadcast; the corpus side must carry no
    hash-partition exchange — assignment, threshold and filter are
    map-side."""
    from pointdatabase_spark import queries as registry
    df = registry.all_queries()["cluster_balanced_sample"](
        spark, SF_SMOKE)
    plan = _plan(df, "simple")
    assert "BroadcastHashJoin" in plan and "cell" in plan
    # exactly one hash exchange: the |cells|-row census aggregate;
    # the corpus side streams map-side into the broadcast join
    assert plan.count("Exchange hashpartitioning") <= 1


def test_knn_join_data_side_never_shuffles(spark):
    """knn_join broadcasts the 9x-exploded query batch; the data
    table must reach the join without a hash exchange — the only
    shuffle is the per-query candidate window."""
    from pointdatabase_spark import queries as registry
    df = registry.all_queries()["knn_join"](spark, SF_SMOKE)
    plan = _plan(df, "simple")
    assert "BroadcastHashJoin" in plan
    # one exchange for the window partitionBy(_qid); none for the join
    assert plan.count("Exchange hashpartitioning") == 1


def test_heavy_hitters_recount_is_broadcast_semi(spark):
    """The exact recount must semi-join the token stream against the
    BROADCAST candidate set — a hash-exchange semi (or a full-vocab
    aggregate before the filter) would reintroduce the |vocab|
    shuffle the operator exists to avoid."""
    from pointdatabase_spark import queries as registry
    df = registry.all_queries()["heavy_hitter_terms"](spark, SF_SMOKE)
    plan = _plan(df, "simple")
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    # exchanges: candidate distinct + final count agg (+ TakeOrdered);
    # the token stream itself reaches the semi join map-side
    assert plan.count("Exchange hashpartitioning") <= 2


def test_knn_graph_unhinted_vs_knn_join_broadcast(spark):
    """knn_graph's query side is SF-scaled (the points themselves),
    so it must carry NO broadcast hint (AQE decides); knn_join's
    user-bounded probe batch keeps its hint and the data side reaches
    that join without a hash exchange."""
    from pointdatabase_spark import queries as registry
    g = registry.all_queries()["knn_graph"](spark, SF_SMOKE)
    logical = g._jdf.queryExecution().analyzed().toString()
    assert logical.count("ResolvedHint") == 0, (
        "kNN graph forced a broadcast of an SF-scaled side")
    j = registry.all_queries()["knn_join"](spark, SF_SMOKE)
    assert "ResolvedHint" in \
        j._jdf.queryExecution().analyzed().toString()


def test_quantize_int8_corpus_never_shuffles(spark):
    """quantize_int8's only exchange is the |dims|-key min/max stats
    aggregate (posexplode partial-agg map-side); the corpus joins the
    1-row stats frame by BROADCAST and encode/decode are codegen
    transform expressions — a hash-exchange of the corpus (or a
    Python worker) would break the 100 TB contract."""
    from pointdatabase_spark import testkit
    from pointdatabase_spark.operators import similarity as sim
    emb = testkit.load_table(spark, SF_SMOKE, "embeddings")
    df = sim.quantize_int8(emb)
    plan = _plan(df, "simple")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    # one exchange: the per-dimension stats aggregate
    assert plan.count("Exchange hashpartitioning") == 1
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_atl11_cycle_collapse_single_exchange(spark):
    """cycle_collapse is ONE groupBy over the tidy rows — partial agg
    map-side, a single key-hash exchange, no window, no join."""
    from pyspark.sql import functions as F
    from pointdatabase_spark import testkit
    from pointdatabase_spark.sources import atl11
    li = testkit.load_table(spark, SF_SMOKE, "lineitem")
    tidy = li.select(
        F.col("l_orderkey").alias("ref_pt"),
        (F.col("l_partkey") % 3 + 1).alias("pair"),
        F.col("l_linenumber").cast("double").alias("cycle_number"),
        F.col("l_extendedprice").alias("h_corr"))
    plan = _plan(atl11.cycle_collapse(tidy), "simple")
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Window" not in plan and "Join" not in plan
    assert "partial" in plan.lower()


def test_classifier_score_zero_shuffle(spark):
    """The model-based quality gate must run inline with the scan:
    no exchange, no Python worker — the literal weight array and the
    hash fold are pure codegen expressions."""
    from pointdatabase_spark import testkit
    from pointdatabase_spark.operators import classify
    docs = testkit.load_table(spark, SF_SMOKE, "documents")
    plan = _plan(classify.score_documents(docs), "simple")
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_url_dedup_single_partial_agg_exchange(spark):
    """dedup_latest = ONE canonical-url-keyed exchange with a
    map-side partial min(struct) collapsing versions before the
    shuffle (partial_min in the pre-exchange aggregate)."""
    from pyspark.sql import functions as F
    from pointdatabase_spark import testkit
    from pointdatabase_spark.operators import web
    docs = testkit.load_table(spark, SF_SMOKE, "documents")
    urls = docs.select(
        "doc_id", (F.col("doc_id") % 7).alias("fetch_ts"),
        F.concat(F.lit("http://h"), (F.col("doc_id") % 9).cast("string"),
                 F.lit(".com/p")).alias("url"))
    plan = _plan(web.dedup_latest(urls), "simple")
    assert plan.count("Exchange hashpartitioning") == 1
    assert "partial_min" in plan


def test_kmeans_output_no_corpus_shuffle(spark):
    """kmeans_fit's returned frame (r13): the final aggregation runs
    at construction while the iteration cache is warm (the same
    bounded k×(d+1)-long driver collect as every update round), so
    the RETURNED frame is the k×dim centroid table itself — no
    exchange, no join, and no corpus scan anywhere in its plan (the
    pre-r13 lazy return re-ran the full scan+quantize+assign pipeline
    once per consumer action)."""
    from pointdatabase_spark import testkit
    from pointdatabase_spark.operators import clustering
    emb = testkit.load_table(spark, SF_SMOKE, "embeddings")
    df = clustering.kmeans_fit(emb, k=2, iters=1, dim=64)
    plan = _plan(df, "simple")
    assert "Exchange" not in plan
    assert "Join" not in plan
    assert "parquet" not in plan.lower()


def test_pagerank_iteration_is_checkpoint_bounded(spark):
    """After the loop-invariant checkpointing, the 2-iteration plan
    must stay shallow (scans come from checkpointed RDDs, not
    re-derived joins) — the r9 pre-fix plan had 130+ nodes."""
    from pointdatabase_spark.operators import graph
    e = spark.range(200).selectExpr("id AS src",
                                    "(id * 7) % 200 AS dst")
    df = graph.pagerank(e, iters=2)
    plan = _plan(df, "simple")
    assert plan.count("\n") < 60
    assert "Scan ExistingRDD" in plan  # the checkpointed edge frame


def test_cms_build_single_bounded_key_exchange(spark):
    """cms_build = ONE exchange keyed on (lane, slot) — at most
    depth x width keys — with map-side partial_count collapsing
    every partition to <= d x w cells BEFORE the shuffle; the token
    stream itself never exchanges, and nothing Python-evaluates."""
    from pyspark.sql import functions as F
    from pointdatabase_spark import testkit
    from pointdatabase_spark.operators import sketch
    docs = testkit.load_table(spark, SF_SMOKE, "documents")
    tok = docs.select(F.explode(
        F.split(F.col("text"), r"\s+")).alias("term"))
    plan = _plan(sketch.cms_build(tok, "term", 4, 512), "simple")
    assert plan.count("Exchange hashpartitioning") == 1
    assert "partial_count" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_cms_lookup_broadcasts_sketch(spark):
    """cms_lookup joins the d x w sketch BROADCAST — the probe side
    (query terms) never shuffles for the join."""
    from pyspark.sql import functions as F
    from pointdatabase_spark import testkit
    from pointdatabase_spark.operators import sketch
    docs = testkit.load_table(spark, SF_SMOKE, "documents")
    tok = docs.select(F.explode(
        F.split(F.col("text"), r"\s+")).alias("term"))
    sk = sketch.cms_build(tok, "term", 4, 512)
    q = tok.limit(50)
    plan = _plan(sketch.cms_lookup(sk, q, "term", 4, 512), "simple")
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" in plan
    assert "SortMergeJoin" not in plan


def test_state_diff_single_full_outer_join(spark):
    """state_diff = ONE key-hash full-outer join; the payload
    comparison is a post-join struct filter, never a second join or
    a Python stage; output carries only changed keys."""
    from pyspark.sql import functions as F
    from pointdatabase_spark.streaming import upsert as su
    old = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 1.0).alias("p"))
    new = spark.range(100).select(
        F.col("id").alias("k"),
        F.when(F.col("id") % 10 == 0, 99.0)
        .otherwise(F.col("id") * 1.0).alias("p"))
    plan = _plan(su.state_diff(old, new, ["k"]), "simple")
    joins = (plan.count("SortMergeJoin") + plan.count("BroadcastHashJoin")
             + plan.count("ShuffledHashJoin"))
    assert joins == 1, plan
    assert "FullOuter" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


@pytest.mark.slow
def test_registry_has_no_corpus_global_windows(spark):
    """Registry-wide doctrine pin (r11, the audit that caught
    budget_select and chi2_drift): an unpartitioned window drags its
    input into ONE task (Exchange SinglePartition + single sort), so
    the only admissible global windows run over distinct-VALUE or
    bounded tables. Detector: a `windowspecdefinition` whose spec
    starts with an ORDER column (ASC/DESC marker — partitioned specs
    lead with bare partition columns). Slice-offset windows (ordered
    by `_pid`/`bk`, <= O(buckets) rows by construction) are excluded
    by key name; every other hit must be on the reviewed allowlist
    below, each entry being a documented distinct-value sweep."""
    import re
    from pointdatabase_spark import queries as registry

    # query -> the bounded table its global window sweeps. r12 shrank
    # this to the genuinely bounded entries: the vocabulary-rank
    # windows (snm_blocking_audit / entity_resolution /
    # edit_distance_join) moved to range-sliced rank stitching
    # (operators/ranking.py) and pareto_frontier's staircase sweep to
    # range-sliced prefix-max stitching — a distinct-string vocabulary
    # or an adversarial staircase band is corpus-scale, unlike the
    # entries below.
    allowed = {
        "join_skew_report",      # distinct count-VALUE distribution
        "radial_bin_ordering",   # distinct 10 km bins
        "zorder_bin_ordering",   # distinct 10 km bins
    }
    offenders = {}
    py_offenders = {}
    cart_offenders = {}
    for name, fn in registry.all_queries().items():
        if name.startswith("streaming_"):
            continue  # fixtures drain real streams at construction
        df = fn(spark, SF_SMOKE)
        plan = df._jdf.queryExecution().executedPlan().toString()
        hits = [m.group(0)[:70] for m in re.finditer(
            r"windowspecdefinition\((\w+)#\d+L? (?:ASC|DESC)", plan)
            if m.group(1) not in ("_pid", "bk")]
        if hits and name not in allowed:
            offenders[name] = hits[0]
        # Doctrine 2 (same walk, no extra plan builds): zero
        # row-at-a-time Python UDFs anywhere in the registry — the
        # only Python stages are Arrow-batched (ArrowEvalPython,
        # FlatMapGroupsInPandas/ArrowEvalPythonUDTF, MapInPandas).
        if "BatchEvalPython" in plan:
            py_offenders[name] = "BatchEvalPython"
        # Doctrine 3: no unhinted big-x-big CartesianProduct. (1-row
        # scalar frames join via BroadcastNestedLoopJoin, which is
        # fine and not matched here.)
        if "CartesianProduct" in plan:
            cart_offenders[name] = "CartesianProduct"
    assert not offenders, offenders
    assert not py_offenders, py_offenders
    assert not cart_offenders, cart_offenders


def test_bench_py_hand_set_matches_streaming_sources():
    """bench.py's hand-tagged py-family streaming queries (their
    returned batch frame hides the construction-time Python stage)
    must track the streaming modules that actually run Pandas/Arrow
    stages. If a streaming module gains or loses an
    applyInPandas/ mapInPandas / applyInPandasWithState call, this
    pins the PY_HAND set to move with it."""
    import glob
    import os
    import bench
    here = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "pointdatabase_spark", "streaming")
    py_mods = set()
    for p in glob.glob(os.path.join(here, "*.py")):
        src = open(p).read()
        if any(m in src for m in ("applyInPandas", "mapInPandas",
                                  "pandas_udf")):
            py_mods.add(os.path.basename(p))
    # module -> the bench query whose drain exercises it
    known = {"neardup.py": "streaming_neardup",
             "sessions.py": "streaming_sessionization",
             "scd2.py": "streaming_scd2"}
    assert py_mods == set(known), (
        f"streaming modules with Python stages changed: {py_mods} — "
        "update bench.PY_HAND and this map")
    assert bench.PY_HAND == set(known.values())


def test_hybrid_rrf_plan_bounded_and_window_free(spark):
    """hybrid_rrf_search: both retriever lists end in bounded cuts
    (TakeOrderedAndProject for BM25; per-query rank window for the
    dense side), the lexical rank is the window-free bounded_rank
    self-join (BroadcastNestedLoopJoin on a k-row broadcast, never
    CartesianProduct), and the fused plan stays doctrine-clean
    without any allowlist entry.  (A 1-row Exchange SinglePartition
    DOES appear — the (N, avgdl) grand aggregate — which is fine;
    the banned shape is the global ORDERED window, asserted absent
    via the windowspecdefinition detector.)"""
    import re
    from pointdatabase_spark import queries as registry
    df = registry.all_queries()["hybrid_rrf_search"](spark, SF_SMOKE)
    plan = _plan(df, "simple")
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    exec_plan = df._jdf.queryExecution().executedPlan().toString()
    hits = [m.group(0) for m in re.finditer(
        r"windowspecdefinition\((\w+)#\d+L? (?:ASC|DESC)", exec_plan)
        if m.group(1) not in ("_pid", "bk")]
    assert not hits, hits


def test_phrase_search_filters_postings_before_join(spark):
    """phrase_count: each join input is filtered to ONE phrase term's
    postings map-side — the term equality predicate sits under the
    join (PushedFilters can't take it, it's post-explode, but the
    Filter operator must appear below the join build), and the join
    keys are (doc, pos) equality — a hash join, never a nested
    loop."""
    from pointdatabase_spark.operators import retrieval
    docs = testkit.load_table(spark, SF_SMOKE, "documents")
    df = retrieval.phrase_count(docs, ["stream", "spark"])
    plan = _plan(df, "simple")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the tok = 'stream' / 'spark' filters exist as plan Filters
    assert plan.count("stream") >= 1 and plan.count("spark") >= 1


def test_inverted_index_two_hash_aggregates_no_window(spark):
    """build_inverted_index: exactly the two-stage posting build —
    hash aggregates with map-side partial combine, no window, no
    join, no Python stage."""
    from pointdatabase_spark.operators import retrieval
    docs = testkit.load_table(spark, SF_SMOKE, "documents")
    df = retrieval.build_inverted_index(docs, min_df=3)
    plan = _plan(df, "simple")
    assert "Window" not in plan
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_bm25_served_prunes_to_query_buckets(spark, tmp_path):
    """The stored-index serving path: the postings scan's
    PartitionFilters prune to the query terms' buckets (computed
    driver-side), the result is bit-identical to the inline
    bm25_topk, and no documents-table scan appears in the serving
    plan."""
    from pointdatabase_spark.operators import retrieval
    docs = testkit.load_table(spark, SF_SMOKE, "documents")
    path = str(tmp_path / "tidx")
    retrieval.write_text_index(docs, path, buckets=16)
    terms = ["spark", "vector", "stream"]
    served = retrieval.bm25_topk_served(spark, path, terms, k=20)
    inline = retrieval.bm25_topk(docs, terms, k=20)
    import struct
    s = sorted((r["doc_id"], struct.pack("<d", r["bm25"]))
               for r in served.collect())
    i = sorted((r["doc_id"], struct.pack("<d", r["bm25"]))
               for r in inline.collect())
    assert s == i and len(s) == 20
    plan = _plan(served)
    assert "PartitionFilters" in plan
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert any("bucket" in ln for ln in pf), pf
    # buckets NOT matching the query terms are pruned: the scanned
    # partition set in the executed plan is the driver-computed list
    qb = sorted({retrieval.term_bucket_py(t, 16) for t in terms})
    ex = served._jdf.queryExecution().executedPlan().toString()
    assert "documents.parquet" not in ex
    # term_bucket column == driver mirror on the stored vocabulary
    from pyspark.sql import functions as F
    voc = (spark.read.parquet(f"{path}/dfreq")
           .select("tok", "bucket",
                   retrieval.term_bucket("tok", 16).alias("b2"))
           .where(F.col("bucket") != F.col("b2")).count())
    assert voc == 0
    assert all(retrieval.term_bucket_py(t, 16) in qb for t in terms)
