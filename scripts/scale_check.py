"""Empirical scale spot-check: wall-time scaling exponents for the
five most expensive operator families across two data decades
(sf0.01 -> sf0.1 -> synthetic sf1).

The driver ships fixtures up to sf0.1 only, so the second decade is a
DERIVED sf1 built in /tmp from the sf0.1 fixture (never writing to
/root/testdata):

- ``documents``: 10 replicas; replica r > 0 prefixes every token with
  ``x{r}`` so replica vocabularies are DISJOINT — per-shingle document
  frequency stays constant while the corpus grows 10x, which is how
  real corpora scale (vocabulary grows with data). Plain 10x text
  duplication would multiply every df by 10 and inflate the
  inverted-index join volume by 100x *by construction*, measuring the
  fixture, not the engine.
- ``lineitem``: 10 replicas; l_orderkey offset per replica (key
  cardinality grows like TPC-H's does), l_extendedprice perturbed by
  r/10000 (its domain grows at larger SF), the bounded-domain columns
  (quantity/discount/tax) replicated as-is (their TPC-H domains are
  SF-independent).
- crossover tracks: the synthetic track table is SF-independent
  (testkit.SYN_TRACKS_SQL caps p_partkey <= 2000), so scale is applied
  directly — R spatially-disjoint "survey sheets" (x,y offset 2e6 per
  sheet, rgt offset 16r), modelling more surveyed regions at constant
  track density.

Timing: best-of-3 warm runs through the noop sink, one Spark session,
no concurrent JVMs (see MEMORY bench-protocol). Output: one JSON line
per (operator, scale) plus a markdown exponent table for SCALE.md;
exponent = log10(t_sf1 / t_sf0.1) for the 10x step (1.0 = linear).
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF001 = "/root/testdata/sf0.01"
SF01 = "/root/testdata/sf0.1"
SF1 = "/tmp/scale_sf1"


def build_sf1(tables: list[str] | None = None) -> None:
    """Materialize the derived-sf1 fixture (10x sf0.1, df-preserving
    construction — see module docstring).  ``tables`` limits the build
    to a subset (tests/test_scale.py builds only what it times); None
    builds everything."""
    import duckdb
    os.makedirs(SF1, exist_ok=True)
    want = set(tables) if tables is not None else {
        "documents", "lineitem", "events", "orders", "customer",
        "supplier", "part", "nation", "region", "embeddings",
        "part10"}
    # "graph" lives under SF1_graph/ — never under SF1/<t>.parquet —
    # so it must not ride this existence filter (it would survive it
    # forever and defeat the everything-built fast path below); the
    # SF1_graph check re-adds it when its outputs are missing.
    want = {t for t in want if t != "graph"
            and not os.path.exists(f"{SF1}/{t}.parquet")}
    if not os.path.exists(f"{SF1}_dense/lineitem.parquet") and (
            tables is None or "lineitem" in tables
            or "lineitem_dense" in tables):
        want.add("lineitem_dense")
    if not os.path.exists(f"{SF1}_graph/lineitem.parquet") and (
            tables is None or "graph" in tables):
        want.add("graph")
    if not want:
        return
    con = duckdb.connect()
    docs_parts = ["SELECT * FROM read_parquet('%s/documents.parquet')" % SF01]
    for r in range(1, 10):
        docs_parts.append(f"""
SELECT doc_id + {r} * 100000000 AS doc_id,
       'x{r}' || replace(text, ' ', ' x{r}') AS text,
       lang, source, n_chars
FROM read_parquet('{SF01}/documents.parquet')""")
    if "documents" in want:
        con.execute(f"COPY ({' UNION ALL '.join(docs_parts)}) TO "
                    f"'{SF1}/documents.parquet' (FORMAT PARQUET)")
    li_parts = ["SELECT * FROM read_parquet('%s/lineitem.parquet')" % SF01]
    for r in range(1, 10):
        li_parts.append(f"""
SELECT * REPLACE (l_orderkey + {r} * 10000000 AS l_orderkey,
                  l_extendedprice + {r} / 10000.0 AS l_extendedprice)
FROM read_parquet('{SF01}/lineitem.parquet')""")
    if "lineitem" in want:
        con.execute(f"COPY ({' UNION ALL '.join(li_parts)}) TO "
                    f"'{SF1}/lineitem.parquet' (FORMAT PARQUET)")
    # lineitem_dense: replicas offset by the ORIGINAL key range
    # (1.6M), not 10M — the derived t-span then grows ~10x like the
    # row count.  The sparse 10M offsets (above) inflate the span
    # 600x, which is right for key-cardinality ops but would make any
    # span-proportional operator (track_resample's grid) look
    # super-linear purely by fixture construction.
    ld_parts = ["SELECT * FROM read_parquet('%s/lineitem.parquet')"
                % SF01]
    for r in range(1, 10):
        ld_parts.append(f"""
SELECT * REPLACE (l_orderkey + {r} * 1600000 AS l_orderkey)
FROM read_parquet('{SF01}/lineitem.parquet')""")
    if "lineitem" in want or "lineitem_dense" in want:
        os.makedirs(f"{SF1}_dense", exist_ok=True)
        if not os.path.exists(f"{SF1}_dense/lineitem.parquet"):
            con.execute(f"COPY ({' UNION ALL '.join(ld_parts)}) TO "
                        f"'{SF1}_dense/lineitem.parquet' "
                        f"(FORMAT PARQUET)")
    # graph fixture (SF1_graph): lineitem + orders replicas whose
    # ENTITY domains grow with the data — l_partkey / o_custkey (and
    # the joining orderkeys) all offset per replica, so the derived
    # co-purchase and customer-part bipartite graphs at sf1 are 10
    # spatially-DISJOINT copies of the sf0.1 graph: 10x nodes, 10x
    # edges, 10x triangles/butterflies at CONSTANT density. The plain
    # SF1 lineitem (above) keeps the part domain fixed because the
    # TPC-H join exponents need dims held constant — but for GRAPH
    # operators that same construction densifies co-occurrence (every
    # pair co-occurs ~10x more) and measures the fixture, not the
    # engine (the r10 triangle 0.77* caveat). This is the
    # df-preserving documents construction applied to graphs.
    if "graph" in want:
        os.makedirs(f"{SF1}_graph", exist_ok=True)
        lg_parts = ["SELECT * FROM read_parquet('%s/lineitem.parquet')"
                    % SF01]
        og_parts = ["SELECT * FROM read_parquet('%s/orders.parquet')"
                    % SF01]
        for r in range(1, 10):
            lg_parts.append(f"""
SELECT * REPLACE (l_orderkey + {r} * 10000000 AS l_orderkey,
                  l_partkey + {r} * 10000000 AS l_partkey)
FROM read_parquet('{SF01}/lineitem.parquet')""")
            og_parts.append(f"""
SELECT * REPLACE (o_orderkey + {r} * 10000000 AS o_orderkey,
                  o_custkey + {r} * 10000000 AS o_custkey)
FROM read_parquet('{SF01}/orders.parquet')""")
        if not os.path.exists(f"{SF1}_graph/lineitem.parquet"):
            con.execute(f"COPY ({' UNION ALL '.join(lg_parts)}) TO "
                        f"'{SF1}_graph/lineitem.parquet' "
                        f"(FORMAT PARQUET)")
        if not os.path.exists(f"{SF1}_graph/orders.parquet"):
            con.execute(f"COPY ({' UNION ALL '.join(og_parts)}) TO "
                        f"'{SF1}_graph/orders.parquet' "
                        f"(FORMAT PARQUET)")
    # events: more users, same per-user density and time range
    ev_parts = ["SELECT * FROM read_parquet('%s/events.parquet')" % SF01]
    for r in range(1, 10):
        ev_parts.append(f"""
SELECT * REPLACE (event_id + {r} * 10000000 AS event_id,
                  user_id + {r} * 1000000 AS user_id)
FROM read_parquet('{SF01}/events.parquet')""")
    if "events" in want:
        con.execute(f"COPY ({' UNION ALL '.join(ev_parts)}) TO "
                    f"'{SF1}/events.parquet' (FORMAT PARQUET)")
    # orders: same customer domain (more orders per customer, like a
    # longer business history); customer stays the dimension it is
    o_parts = ["SELECT * FROM read_parquet('%s/orders.parquet')" % SF01]
    for r in range(1, 10):
        o_parts.append(f"""
SELECT * REPLACE (o_orderkey + {r} * 10000000 AS o_orderkey)
FROM read_parquet('{SF01}/orders.parquet')""")
    if "orders" in want:
        con.execute(f"COPY ({' UNION ALL '.join(o_parts)}) TO "
                    f"'{SF1}/orders.parquet' (FORMAT PARQUET)")
    if "customer" in want:
        con.execute(f"COPY (SELECT * FROM read_parquet("
                    f"'{SF01}/customer.parquet')) TO "
                    f"'{SF1}/customer.parquet' (FORMAT PARQUET)")
    # embeddings: 10x vectors, identical distribution -> cell sizes 10x
    e_parts = ["SELECT * FROM read_parquet('%s/embeddings.parquet')"
               % SF01]
    for r in range(1, 10):
        e_parts.append(f"""
SELECT * REPLACE (vec_id + {r} * 10000000 AS vec_id)
FROM read_parquet('{SF01}/embeddings.parquet')""")
    if "embeddings" in want:
        con.execute(f"COPY ({' UNION ALL '.join(e_parts)}) TO "
                    f"'{SF1}/embeddings.parquet' (FORMAT PARQUET)")
    # fixed-size TPC-H dimensions: copied as-is (supplier/part are
    # SF-proportional in real TPC-H, but the derived fixture holds
    # them constant so the q3/q5/q20/bloom exponents isolate
    # FACT-side growth — the property the de-hinted plans must
    # survive)
    for t in ("supplier", "part", "nation", "region"):
        if t in want:
            con.execute(f"COPY (SELECT * FROM read_parquet("
                        f"'{SF01}/{t}.parquet')) TO "
                        f"'{SF1}/{t}.parquet' (FORMAT PARQUET)")
    # part10: a genuinely 10x part table for the name-keyed operators
    # (fuzzy join, skyline) — plain `part` is held constant above.
    # Each replica doubles a per-replica letter tag onto every word
    # ('aa', 'bb', ...): within-replica edit distances are EXACTLY the
    # originals (tags cancel), while any cross-replica pair differs in
    # >= 2 tag positions x >= 2 words = >= 4 edits > d=2, so true
    # pairs grow 10x, not 100x. Position-anchored segments that avoid
    # the tag letters still collide across replicas (bounded partial
    # df growth — noted with the measured exponent in SCALE.md).
    # p_retailprice perturbed per replica so the skyline x-domain
    # grows with the data.
    p_parts = ["SELECT * FROM read_parquet('%s/part.parquet')" % SF01]
    for r in range(1, 10):
        tag = f"repeat(chr(97 + {r}), 2)"
        p_parts.append(f"""
SELECT * REPLACE (p_partkey + {r} * 10000000 AS p_partkey,
                  {tag} || replace(p_name, ' ', ' ' || {tag}) AS p_name,
                  p_retailprice + {r} / 10000.0 AS p_retailprice)
FROM read_parquet('{SF01}/part.parquet')""")
    if "part10" in want:
        con.execute(f"COPY ({' UNION ALL '.join(p_parts)}) TO "
                    f"'{SF1}/part10.parquet' (FORMAT PARQUET)")
    con.close()


def timed(df) -> float:
    """Best-of-3 warm noop-sink writes.  ``df`` may be a DataFrame or
    a zero-arg builder returning one — builders re-run per repetition
    so operators that do driver-side work at construction time (the
    BPE trainer's per-round argmax collects) are timed end-to-end."""
    build = df if callable(df) else (lambda: df)
    build().write.format("noop").mode("overwrite").save()  # warm-up
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        build().write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def track_sheets(spark, sheets: int):
    from pyspark.sql import functions as F
    from pointdatabase_spark import testkit
    tr = testkit.syn_tracks(spark, SF01)
    out = None
    for r in range(sheets):
        s = (tr.withColumn("x", F.col("x") + F.lit(r * 2_000_000.0))
             .withColumn("y", F.col("y") + F.lit(r * 2_000_000.0))
             .withColumn("rgt", (F.col("rgt") + F.lit(r * 16)).cast("int")))
        out = s if out is None else out.unionByName(s)
    return out


def main() -> None:
    from pyspark.sql import functions as F
    from pointdatabase_spark.session import get_spark
    from pointdatabase_spark import testkit
    from pointdatabase_spark.functions import text as _text
    from pointdatabase_spark.operators import crossover, dedup, profile
    from pointdatabase_spark.operators import fuzzy as _fuzzy
    from pointdatabase_spark.operators import olap as _olap
    from pointdatabase_spark.partitioning import spread
    from pointdatabase_spark import queries as _registry

    build_sf1()
    spark = get_spark("scale-check")
    spark.sparkContext.setLogLevel("ERROR")

    def _part10(sf_dir):
        p = f"{sf_dir}/part10.parquet"
        return spark.read.parquet(
            p if os.path.exists(p) else f"{sf_dir}/part.parquet")

    def docs(sf_dir):
        return testkit.load_table(spark, sf_dir, "documents")

    def li(sf_dir):
        return testkit.load_table(spark, sf_dir, "lineitem")

    def gopher(sf_dir):
        d = _text.with_tokens(spread(docs(sf_dir)), "text")
        return d.select(
            "doc_id",
            _text.spark_expr("dup_token_ratio", "text", "_toks").alias("a"),
            _text.spark_expr("top_bigram_cover", "text", "_toks").alias("b"),
            _text.spark_expr("max_token_run", "text", "_toks").alias("c"))

    def rollup_trailing_op(sf_dir):
        from pointdatabase_spark.functions import timeconv
        from pointdatabase_spark.operators import temporal
        ev = testkit.load_table(spark, sf_dir, "events")
        ev = ev.select("event_type", timeconv.events_tus(ev).alias("tus"),
                       "value")
        return temporal.rollup_trailing(ev, ts="tus",
                                        keys=["event_type"],
                                        value="value", res_s=3600,
                                        span_us=7 * 86_400_000_000)

    def ann_index_op(sf_dir):
        import hashlib as hl
        from pointdatabase_spark.operators import similarity as sim
        emb = testkit.load_table(spark, sf_dir, "embeddings")
        cents = sim.centroids(8, 64)
        path = (f"/tmp/pdb_scale_ann_{os.getpid()}_"
                f"{hl.md5(sf_dir.encode()).hexdigest()[:8]}")
        import shutil
        shutil.rmtree(path, ignore_errors=True)
        sim.write_ann_index(emb, path, cents)
        from pyspark.sql import functions as FF
        # fixed 5-query batch at every scale: the exponent then
        # measures serving cost vs INDEX size alone
        return sim.ann_topk_against_index(
            spark, path, emb.where(FF.col("vec_id") < 5), k=5, nprobe=2)

    def dq_op(sf_dir):
        from pointdatabase_spark.operators import profile as prof
        l = li(sf_dir)
        orders = testkit.load_table(spark, sf_dir, "orders")
        cust = testkit.load_table(spark, sf_dir, "customer")
        return prof.dq_report([
            prof.scalar_dq(l, [
                ("r1", (F.col("l_discount") < 0)
                 | (F.col("l_discount") > 0.1)),
                ("r2", F.col("l_quantity") > 30)]),
            prof.duplicate_key_count(orders, "r3", ["o_orderkey"]),
            prof.ref_integrity_count(orders, "r4", "o_custkey", cust,
                                     "c_custkey"),
        ])

    ops = {
        "substring_dup_spans": lambda sf: dedup.substring_dup_spans(
            docs(sf), k=8),
        "rollup_trailing": rollup_trailing_op,
        "ann_index_query": ann_index_op,
        "dq_report": dq_op,
        "ngram_jaccard_exact": lambda sf: dedup.ngram_jaccard_pairs(
            docs(sf), ["lang"], n=2, threshold=0.2),
        "ngram_jaccard_capped": lambda sf: dedup.ngram_jaccard_pairs(
            docs(sf), ["lang"], n=2, threshold=0.2, max_df=20),
        "minhash_lsh": lambda sf: dedup.minhash_neardup(
            docs(sf), threshold=0.5),
        "gopher_filter": gopher,
        "profile_exact": lambda sf: profile.profile_columns(
            li(sf), ["l_orderkey", "l_quantity", "l_extendedprice",
                     "l_discount", "l_tax"]),
        "profile_approx": lambda sf: profile.profile_columns(
            li(sf), ["l_orderkey", "l_quantity", "l_extendedprice",
                     "l_discount", "l_tax"], exact=False),
        # TPC-H shapes with the r7 de-hinted joins: exponents prove
        # the AQE-decided plans hold across a decade of fact growth
        "q1_pricing_summary": lambda sf: _registry.all_queries()[
            "q1_pricing_summary"](spark, sf),
        "q3_shipping_priority": lambda sf: _registry.all_queries()[
            "q3_shipping_priority"](spark, sf),
        "q5_local_supplier_volume": lambda sf: _registry.all_queries()[
            "q5_local_supplier_volume"](spark, sf),
        # r8 shapes: two-role dimension join and single-scan HAVING
        # semi — both join the 10x fact against held-constant dims
        "q7_volume_shipping": lambda sf: _registry.all_queries()[
            "q7_volume_shipping"](spark, sf),
        "q18_large_volume_customer": lambda sf: _registry.all_queries()[
            "q18_large_volume_customer"](spark, sf),
        # r8 wave 4: nested dominance semi (window over grouping
        # key), manual skew/Bloom valves, sub-document cleaning —
        # fact sides grow 10x, part/customer dims held constant
        "q20_dominant_part_supplier": lambda sf: _registry.all_queries()[
            "q20_dominant_part_supplier"](spark, sf),
        "bloom_semi_join": lambda sf: _registry.all_queries()[
            "bloom_semi_join"](spark, sf),
        "skew_salted_join": lambda sf: _registry.all_queries()[
            "skew_salted_join"](spark, sf),
        "c4_line_filter": lambda sf: _registry.all_queries()[
            "c4_line_filter"](spark, sf),
        "paragraph_dedup": lambda sf: _registry.all_queries()[
            "paragraph_dedup"](spark, sf),
        # r8 wave 5: LM scoring, MG heavy hitters, BPE train/encode,
        # kNN join (fixed 40-query batch vs 10x points)
        "bigram_lm_perplexity": lambda sf: _registry.all_queries()[
            "bigram_lm_perplexity"](spark, sf),
        "heavy_hitter_terms": lambda sf: _registry.all_queries()[
            "heavy_hitter_terms"](spark, sf),
        # BPE ops train at construction time (per-round argmax
        # collects), so hand timed() a BUILDER — each repetition
        # reruns the full train loop end-to-end
        "bpe_train_merges": lambda sf: (
            lambda: _registry.all_queries()["bpe_train_merges"](
                spark, sf)),
        "bpe_encode_stats": lambda sf: (
            lambda: _registry.all_queries()["bpe_encode_stats"](
                spark, sf)),
        "knn_join": lambda sf: _registry.all_queries()[
            "knn_join"](spark, sf),
        # span-faithful fixture: at sf1 the dense replica keeps grid
        # size ~10x (see build_sf1 lineitem_dense); the sparse-key
        # sf1 would grow the grid 600x by construction
        "track_resample": lambda sf: _registry.all_queries()[
            "track_resample"](spark,
                              SF1 + "_dense" if sf == SF1 else sf),
        "corpus_prep_v2": lambda sf: _registry.all_queries()[
            "corpus_prep_v2"](spark, sf),
        "grid_cluster": lambda sf: _registry.all_queries()[
            "grid_cluster"](spark, sf),
        # r9 wave: ATL11 cycle stats, int8 quantize recall, quality
        # survivors, shard export, perceptual image dedup, mixture
        # upsample, token-budget selection
        "atl11_cycle_stats": lambda sf: _registry.all_queries()[
            "atl11_cycle_stats"](spark, sf),
        "embedding_quantize_recall": lambda sf: _registry.all_queries()[
            "embedding_quantize_recall"](spark, sf),
        "dedup_keep_best": lambda sf: _registry.all_queries()[
            "dedup_keep_best"](spark, sf),
        "training_shard_stats": lambda sf: _registry.all_queries()[
            "training_shard_stats"](spark, sf),
        "multimodal_dhash_neardup": lambda sf: _registry.all_queries()[
            "multimodal_dhash_neardup"](spark, sf),
        "mixture_upsample_counts": lambda sf: _registry.all_queries()[
            "mixture_upsample_counts"](spark, sf),
        "token_budget_select": lambda sf: _registry.all_queries()[
            "token_budget_select"](spark, sf),
        # r9 wave 2: kmeans + pagerank do driver round-trips at
        # construction (centroid collects / localCheckpoint+count),
        # so they get BUILDERS like the BPE ops; the rest are plain
        "kmeans_embeddings": lambda sf: (
            lambda: _registry.all_queries()["kmeans_embeddings"](
                spark, sf)),
        "pagerank_trading_graph": lambda sf: (
            lambda: _registry.all_queries()["pagerank_trading_graph"](
                spark, sf)),
        "quality_classifier_score": lambda sf: _registry.all_queries()[
            "quality_classifier_score"](spark, sf),
        "url_canonical_dedup": lambda sf: _registry.all_queries()[
            "url_canonical_dedup"](spark, sf),
        "numeric_outlier_report": lambda sf: _registry.all_queries()[
            "numeric_outlier_report"](spark, sf),
        "hard_negative_mining": lambda sf: _registry.all_queries()[
            "hard_negative_mining"](spark, sf),
        "text_normalize_repair": lambda sf: _registry.all_queries()[
            "text_normalize_repair"](spark, sf),
        "stratified_split_counts": lambda sf: _registry.all_queries()[
            "stratified_split_counts"](spark, sf),
        "upsert_latest_wins": lambda sf: _registry.all_queries()[
            "upsert_latest_wins"](spark, sf),
        # r10: label propagation does localCheckpoint+count at
        # construction -> builder; CMS is a plain lazy plan
        "label_propagation_communities": lambda sf: (
            lambda: _registry.all_queries()[
                "label_propagation_communities"](spark, sf)),
        "cms_frequency_audit": lambda sf: _registry.all_queries()[
            "cms_frequency_audit"](spark, sf),
        "scd_change_feed": lambda sf: _registry.all_queries()[
            "scd_change_feed"](spark, sf),
        # graph censuses ride the domain-growing SF1_graph fixture
        # (10 disjoint graph copies — honest 10x; the plain SF1
        # lineitem densifies co-occurrence and measures the fixture)
        "bipartite_butterflies": lambda sf: _registry.all_queries()[
            "bipartite_butterflies"](
                spark, SF1 + "_graph" if sf == SF1 else sf),
        # r10 session 2: triangle/kcore localCheckpoint the derived
        # edge list at construction -> builders; skew report is lazy
        "triangle_census": lambda sf: (
            lambda: _registry.all_queries()["triangle_census"](
                spark, SF1 + "_graph" if sf == SF1 else sf)),
        "kcore_parts": lambda sf: (
            lambda: _registry.all_queries()["kcore_parts"](spark, sf)),
        "join_skew_report": lambda sf: _registry.all_queries()[
            "join_skew_report"](spark, sf),
        # r10 session 3: fuzzy join + skyline scale on part10 at sf1
        # (plain `part` is fixture-constant); containment rides the
        # df-preserving documents replicas like the Jaccard family.
        "containment_neardup": lambda sf: _registry.all_queries()[
            "containment_neardup"](spark, sf),
        "edit_distance_join": lambda sf: (lambda p=_part10(sf):
            _fuzzy.edit_distance_pairs(p, "p_partkey", "p_name", d=2))(),
        "pareto_frontier": lambda sf: _olap.pareto_frontier(
            _part10(sf).select("p_partkey", "p_retailprice", "p_size"),
            "p_retailprice", "p_size"),
        # r11: exact fixed-k PPS over 10x documents — two shuffles
        # (bucket agg + bucket-partitioned window) + broadcast, so
        # the decade should be scan-linear at worst
        "systematic_pps": lambda sf: _registry.all_queries()[
            "systematic_pps_sample"](spark, sf),
    }
    if len(sys.argv) > 1:  # time only the named ops (crossover too,
        # if named); full table when run bare
        sel = set(sys.argv[1:])
        unknown = sel - set(ops) - {"crossover"}
        if unknown:
            raise SystemExit(f"unknown ops: {sorted(unknown)}")
        ops = {n: f for n, f in ops.items() if n in sel}
    scales = [("sf0.01", SF001), ("sf0.1", SF01), ("sf1", SF1)]
    results: dict[str, dict[str, float]] = {}
    for name, fn in ops.items():
        results[name] = {}
        for label, sf in scales:
            t = timed(fn(sf))
            results[name][label] = t
            print(f"{name:24s} {label:7s} {t:8.3f}s", file=sys.stderr)
            spark.catalog.clearCache()  # drop per-run persisted postings

    # crossover: 1 sheet vs 10 spatially-disjoint sheets
    if len(sys.argv) == 1 or "crossover" in sys.argv[1:]:
        results["crossover"] = {}
        for label, sheets in [("sheets1", 1), ("sheets10", 10)]:
            t = timed(crossover.crossovers(track_sheets(spark, sheets),
                                           ["rgt"], delta_coarse=1000.0))
            results["crossover"][label] = t
            print(f"{'crossover':24s} {label:7s} {t:8.3f}s",
                  file=sys.stderr)

    import math
    print("\n| operator | sf0.01 | sf0.1 | sf1(10x) | exp(0.01->0.1) | "
          "exp(0.1->1) |", file=sys.stderr)
    print("|---|---|---|---|---|---|", file=sys.stderr)
    for name, row in results.items():
        if "sf1" in row:
            e1 = math.log10(row["sf0.1"] / row["sf0.01"])
            e2 = math.log10(row["sf1"] / row["sf0.1"])
            print(f"| {name} | {row['sf0.01']} | {row['sf0.1']} | "
                  f"{row['sf1']} | {e1:.2f} | {e2:.2f} |", file=sys.stderr)
        else:
            e = math.log10(row["sheets10"] / row["sheets1"])
            print(f"| {name} | {row['sheets1']} (1 sheet) | "
                  f"{row['sheets10']} (10 sheets) | — | — | {e:.2f} |",
                  file=sys.stderr)
    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
