"""Semantic unit tests for the extension operators (dedup, similarity,
raster, fit, runs, crs) — known-value checks that complement the
oracle-diff harness."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from pointdatabase_spark.functions import crs
from pointdatabase_spark.operators import dedup, fit, raster, runs, similarity


def test_polar_stereo_known_points():
    # Projection origin: the pole maps to (0, 0); the central meridian
    # at any latitude maps to x = 0, y < 0 (north).
    x, y = crs.polar_stereo_forward(np.array([90.0]), np.array([12.0]), 1)
    assert abs(x[0]) < 1e-9 and abs(y[0]) < 1e-9
    x, y = crs.polar_stereo_forward(np.array([70.0]), np.array([-45.0]), 1)
    assert abs(x[0]) < 1e-6 and y[0] < -2e6
    # At the true-scale latitude the radius matches the defining
    # constant rho_f * t(phi_ts) — scale factor 1 by construction.
    rho_f, _ = crs.stereo_constants(1)
    assert math.isclose(-y[0], rho_f * crs._t_scalar(70 * crs._D2R),
                        rel_tol=1e-12)
    # South: Amundsen-Scott (-90) maps to origin in EPSG:3031.
    x, y = crs.polar_stereo_forward(np.array([-90.0]), np.array([0.0]), -1)
    assert abs(x[0]) < 1e-9 and abs(y[0]) < 1e-9


def test_bilinear_interp_nodes_and_midpoints():
    g = raster.grid_from_formula(0.0, 0.0, 1.0, 1.0, 4, 4,
                                 lambda i, j: i + 10.0 * j)
    xs = np.array([0.0, 2.0, 0.5, 1.5])
    ys = np.array([0.0, 1.0, 0.5, 2.5])
    z = raster._bilinear(g.z, g.x0, g.y0, g.dx, g.dy, xs, ys)
    # exact at nodes; bilinear of a linear field is exact everywhere
    assert np.allclose(z, xs + 10.0 * ys)


def test_cubic_interp_exact_on_linear_fields_and_nodes():
    # cubic convolution reproduces degree-1 fields exactly (weights sum
    # to 1 with first moment f) and interpolates nodes exactly
    g = raster.grid_from_formula(0.0, 0.0, 1.0, 1.0, 8, 8,
                                 lambda i, j: 2.0 + 3.0 * i - 5.0 * j)
    xs = np.array([2.0, 3.25, 4.5, 1.0])
    ys = np.array([3.0, 2.75, 1.5, 6.0])
    z = raster._cubic(g.z, g.x0, g.y0, g.dx, g.dy, xs, ys)
    assert np.allclose(z, 2.0 + 3.0 * xs - 5.0 * ys, atol=1e-12)
    # on a curved field, cubic differs from bilinear at cell centers
    # (higher-order kernel actually engaged)
    gq = raster.grid_from_formula(0.0, 0.0, 1.0, 1.0, 8, 8,
                                  lambda i, j: (i * i + j * j).astype(float)
                                  if hasattr(i, "astype") else i * i + j * j)
    xm = np.array([3.5])
    ym = np.array([3.5])
    zb = raster._bilinear(gq.z, 0.0, 0.0, 1.0, 1.0, xm, ym)
    zc = raster._cubic(gq.z, 0.0, 0.0, 1.0, 1.0, xm, ym)
    assert abs(zb[0] - zc[0]) > 1e-3


def test_interp_join_spline_kind(spark):
    g = raster.grid_from_formula(0.0, 0.0, 1.0, 1.0, 8, 8,
                                 lambda i, j: 1.0 * i + 2.0 * j)
    df = spark.createDataFrame(pd.DataFrame({"x": [2.5], "y": [3.5]}))
    out = raster.interp_join(df, g, kind="spline").collect()
    assert math.isclose(out[0].z_interp, 2.5 + 7.0, abs_tol=1e-12)


def test_grid_to_points_explode_skip_bounds_nodata(spark):
    # 5x6 grid, z = i + 10*j; skip=2, bounds cut one x column and one
    # y row, nodata (z == 2) becomes NULL (read_DEM.py:52-64 semantics).
    g = raster.grid_from_formula(100.0, 200.0, 10.0, 10.0, 5, 6,
                                 lambda i, j: (i + 10.0 * j))
    pts = raster.grid_to_points(spark, g, bounds=((100.0, 125.0),
                                                  (200.0, 245.0)),
                                skip=2, nodata=2.0)
    rows = {(r.i, r.j): r for r in pts.collect()}
    # i in {0,2} (4 -> x=140 out of bounds), j in {0,2,4}
    assert set(rows) == {(i, j) for i in (0, 2) for j in (0, 2, 4)}
    for (i, j), r in rows.items():
        assert r.x == 100.0 + 10.0 * i and r.y == 200.0 + 10.0 * j
        expect = i + 10.0 * j
        assert r.z is None if expect == 2.0 else r.z == expect


def test_plane_fit_recovers_exact_plane(spark):
    rng = np.random.RandomState(7)
    x = rng.randint(0, 1000, 200)
    y = rng.randint(0, 1000, 200)
    z = 3 * x + 5 * y + 17
    df = spark.createDataFrame(pd.DataFrame(
        {"x": x.astype(float), "y": y.astype(float), "z": z.astype(float)}))
    out = fit.plane_fit_by_bin(df, 1000.0).toPandas()
    assert len(out) == 1
    assert math.isclose(out.slope_x[0], 3.0, rel_tol=1e-9)
    assert math.isclose(out.slope_y[0], 5.0, rel_tol=1e-9)


def test_run_coalescing_hand_case(spark):
    rows = [(1, 0, 5), (1, 6, 8), (1, 10, 12), (1, 11, 20), (2, 0, 1)]
    df = spark.createDataFrame(rows, "file_id long, run_start long, run_end long")
    out = (runs.coalesce_runs(df, ["file_id"])
           .orderBy("file_id", "run_start").toPandas())
    # [0,5]+[6,8] touch (6 <= 5+1) → merge; [10,12]+[11,20] overlap → merge
    assert [tuple(r) for r in out.itertuples(index=False)] == [
        (1, 0, 8, 2), (1, 10, 20, 2), (2, 0, 1, 1)]


def test_cosine_topk_self_is_rank1(spark):
    rng = np.random.RandomState(3)
    vecs = rng.randn(30, 8).astype(np.float32)
    df = spark.createDataFrame(
        pd.DataFrame({"vec_id": range(30), "embedding": list(map(list, vecs))}))
    out = similarity.cosine_topk(df, df.where("vec_id < 3"), k=2).toPandas()
    top1 = out[out["rank"] == 1]
    assert (top1.vec_id.values == top1.q_id.values).all()
    assert np.allclose(top1.cos.values, 1.0)


def test_cosine_neardup_empty_corpus(spark):
    """The exact (all-pairs) branch must return an empty pair frame on
    an empty corpus, not crash in np.stack."""
    df = spark.createDataFrame([], "vec_id long, embedding array<double>")
    assert similarity.cosine_neardup_pairs(df, threshold=0.9).count() == 0


def test_multitable_lsh_recall_at_least_single_table(spark):
    """OR-amplification: multi-table candidates are a superset of
    table-0's, so top-k recall vs brute force can only improve."""
    rng = np.random.RandomState(11)
    vecs = rng.randn(120, 16).astype(np.float32)
    df = spark.createDataFrame(
        pd.DataFrame({"vec_id": range(120),
                      "embedding": list(map(list, vecs))}))
    qdf = df.where("vec_id < 4")
    k = 8
    tables = similarity.plane_tables(3, 8, 16)

    def retrieved(out):
        return {(r.q_id, r.vec_id) for r in out.collect()}

    truth = retrieved(similarity.cosine_topk(df, qdf, k=k))
    single = retrieved(similarity.lsh_ann_topk(df, qdf, k=k,
                                               planes=tables[0]))
    multi = retrieved(similarity.lsh_ann_topk_multi(df, qdf, k=k,
                                                    plane_sets=tables))
    recall_single = len(single & truth) / len(truth)
    recall_multi = len(multi & truth) / len(truth)
    assert recall_multi >= recall_single
    # the bucketed paths actually prune (not accidental brute force)
    assert len(single) <= len(truth) and len(multi) <= 4 * k


def test_ivf_trained_centroids_same_plan_shape(spark):
    """k-means-trained centroids drop into ivf_ann_topk as literals:
    the probe plan (exchange count, broadcast join) must be identical
    to the md5-centroid path, and self-queries still rank themselves
    first (a vector's own cell is its nearest, hence always probed)."""
    rng = np.random.RandomState(5)
    vecs = rng.randn(80, 8).astype(np.float32)
    df = spark.createDataFrame(
        pd.DataFrame({"vec_id": range(80),
                      "embedding": list(map(list, vecs))}))
    qdf = df.where("vec_id < 3")

    trained = similarity.train_centroids(df, n_centroids=4, sample_n=60)
    assert len(trained) == 4 and len(trained[0]) == 8
    # deterministic: retraining yields the identical centroids
    assert trained == similarity.train_centroids(df, n_centroids=4,
                                                 sample_n=60)

    lit_cents = similarity.centroids(4, 8)
    out_t = similarity.ivf_ann_topk(df, qdf, k=3, cents=trained, nprobe=2)
    out_l = similarity.ivf_ann_topk(df, qdf, k=3, cents=lit_cents, nprobe=2)

    def shape(df_):
        plan = df_._jdf.queryExecution().executedPlan().toString()
        return (plan.count("Exchange"), plan.count("BroadcastHashJoin"))

    assert shape(out_t) == shape(out_l)
    top1 = out_t.where("rank = 1").toPandas()
    assert (top1.vec_id.values == top1.q_id.values).all()
    assert np.allclose(top1.cos.values, 1.0)


def test_exact_dedup_finds_planted(spark):
    df = spark.createDataFrame(
        [(1, "aa bb cc"), (2, "aa bb cc"), (3, "dd ee ff"), (4, "zz")],
        "doc_id long, text string")
    out = dedup.exact_dedup(df).toPandas()
    assert len(out) == 1
    assert out.keep_id[0] == 1 and out.n_copies[0] == 2


def test_ngram_jaccard_prefix_equals_unpruned(spark):
    """Prefix filtering is pure pruning: at several thresholds the
    candidate-pruned plan must return exactly the unpruned inverted-
    index result (including a threshold where t*n lands on integers,
    the float-ceil edge the 1e-9 nudge guards)."""
    from pointdatabase_spark import testkit
    from tests.conftest import SF_SMOKE
    docs = testkit.load_table(spark, SF_SMOKE, "documents")
    for t in (0.2, 0.25, 0.5):
        a = (dedup.ngram_jaccard_pairs(docs, ["lang"], n=2, threshold=t)
             .toPandas().sort_values(["id_a", "id_b"],
                                     ignore_index=True))
        b = (dedup.ngram_jaccard_prefix(docs, ["lang"], n=2, threshold=t)
             .toPandas().sort_values(["id_a", "id_b"],
                                     ignore_index=True))
        assert a.shape == b.shape, t
        assert (a.id_a == b.id_a).all() and (a.id_b == b.id_b).all()
        assert (a.jaccard == b.jaccard).all()
    spark.catalog.clearCache()


def test_substring_dup_spans_hand_case(spark):
    """k=3 windows shared across docs: two shared regions separated by
    a >k gap stay separate spans; a single shared trigram yields a
    k-wide span; a doc with no cross-doc window yields nothing."""
    shared_a = "a1 a2 a3 a4"           # 2 windows -> span width 4
    shared_b = "b1 b2 b3"              # 1 window  -> span width 3
    d1 = f"{shared_a} x1 x2 x3 x4 {shared_b}"  # gap 4 > k: two spans
    d2 = f"y1 {shared_a} y2 y3 {shared_b}"
    d3 = "z1 z2 z3 z4 z5"              # unique
    df = spark.createDataFrame([(1, d1), (2, d2), (3, d3)],
                               "doc_id long, text string")
    out = dedup.substring_dup_spans(df, k=3).toPandas()
    spans = {(r.doc_id, r.span_start, r.span_end, r.n_grams)
             for r in out.itertuples()}
    # d1: "a1..a4" at tokens 1-4 (2 windows), "b1..b3" at 9-11
    # d2: "a1..a4" at tokens 2-5, "b1..b3" at 8-10
    assert spans == {(1, 1, 4, 2), (1, 9, 11, 1),
                     (2, 2, 5, 2), (2, 8, 10, 1)}


def test_substring_dup_spans_touching_windows_merge(spark):
    """Shared windows whose covers touch (gap == k) merge into one
    contiguous duplicated region."""
    # doc 1 shares tokens 1-3 with doc 2 and tokens 4-6 with doc 3:
    # spans [1,3] and [4,6] touch -> one [1,6] span of 2 windows
    df = spark.createDataFrame(
        [(1, "p1 p2 p3 q1 q2 q3"),
         (2, "p1 p2 p3 r1 r2 r3"),
         (3, "s1 s2 s3 q1 q2 q3")],
        "doc_id long, text string")
    out = dedup.substring_dup_spans(df, k=3).toPandas()
    d1 = out[out.doc_id == 1]
    assert len(d1) == 1
    assert (int(d1.span_start.iloc[0]), int(d1.span_end.iloc[0]),
            int(d1.n_grams.iloc[0])) == (1, 6, 2)


def test_minhash_neardup_identical_docs(spark):
    base = "w%d " * 30
    t1 = " ".join(f"w{i}" for i in range(30))
    t2 = t1  # identical
    t3 = " ".join(f"v{i}" for i in range(30))  # disjoint
    df = spark.createDataFrame([(1, t1), (2, t2), (3, t3)],
                               "doc_id long, text string")
    out = dedup.minhash_neardup(df).toPandas()
    pairs = {(r.id_a, r.id_b) for r in out.itertuples()}
    assert (1, 2) in pairs
    assert all(3 not in p for p in pairs)
    assert out[out.id_a == 1].jaccard.iloc[0] == 1.0


def test_minhash_mega_bucket_cap_bounds_candidates(spark):
    """One 300-copy document must not quadratically explode the LSH
    candidate join: with max_bucket the mega-cluster's band keys are
    dropped (its members are exact dups for the linear path), while a
    planted genuine near-dup pair outside the cluster survives."""
    near_a = " ".join(f"w{i}" for i in range(30))
    near_b = " ".join(f"w{i}" for i in range(28))  # truncated → near-dup
    rows = [(i, "mega " * 25) for i in range(300)]
    rows += [(1001, near_a), (1002, near_b),
             (1003, " ".join(f"v{i}" for i in range(30)))]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    capped = dedup.minhash_neardup(df, max_bucket=8)
    pairs = {(r.id_a, r.id_b) for r in capped.collect()}
    assert (1001, 1002) in pairs            # recall outside the cluster
    assert all(a > 1000 and b > 1000 for a, b in pairs)  # cluster dropped
    # ~45k mega pairs would exist uncapped; capped output is tiny
    assert len(pairs) < 10

    # the cap's hot-key exclusion must be a broadcast anti-join (the
    # band table is not reshuffled by the cap)
    plan = capped._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_duplicate_clusters_and_survivors(spark):
    """Pair graph → cluster labels → one survivor per cluster. The
    chain 10-11-12-13 needs multi-hop propagation (13 is 3 edges from
    the min), the clique {1,2,3} needs one; singletons (99) keep
    themselves and survive."""
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3),          # clique
         (10, 11), (11, 12), (12, 13)],   # chain, diameter 3
        "id_a long, id_b long")
    cl = {r.doc_id: r.cluster_id
          for r in dedup.duplicate_clusters(pairs, hops=3).collect()}
    assert cl == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10, 13: 10}

    docs = spark.createDataFrame(
        [(i,) for i in (1, 2, 3, 10, 11, 12, 13, 99)], "doc_id long")
    out = dedup.dedup_survivors(
        docs, dedup.duplicate_clusters(pairs, hops=3)).toPandas()
    surv = set(out[out.is_survivor].doc_id)
    assert surv == {1, 10, 99}
    assert out[out.doc_id == 99].cluster_id.iloc[0] == 99


def test_cluster_hops_reach_component_min_on_corpus(spark):
    """On the planted syn_corpus the near-dup graph is a union of
    near-cliques: 3 bounded hops must equal full convergence (what the
    declared dedup_clusters query's agree-by-construction oracle can't
    itself prove)."""
    from pointdatabase_spark import testkit
    from tests.conftest import SF_SMOKE
    pairs = dedup.minhash_neardup(
        testkit.syn_corpus(spark, SF_SMOKE)).select("id_a", "id_b")
    l3 = dedup.duplicate_clusters(pairs, hops=3)
    l5 = dedup.duplicate_clusters(pairs, hops=5)
    diff = (l3.withColumnRenamed("cluster_id", "c3")
            .join(l5.withColumnRenamed("cluster_id", "c5"), "doc_id")
            .where(F.col("c3") != F.col("c5")))
    assert diff.count() == 0


def test_simhash_identical_zero_hamming(spark):
    t1 = " ".join(f"w{i}" for i in range(40))
    t3 = " ".join(f"v{i}" for i in range(40))
    df = spark.createDataFrame([(1, t1), (2, t1), (3, t3)],
                               "doc_id long, text string")
    out = dedup.simhash_neardup(df).toPandas()
    pairs = {(r.id_a, r.id_b): r.hamming for r in out.itertuples()}
    assert pairs.get((1, 2)) == 0


def test_converged_clusters_on_long_path(spark):
    """A 64-node near-dup CHAIN (adversarial diameter — each link
    within threshold, ends unrelated) must fully resolve: pointer
    jumping converges in O(log diameter) rounds, so max_iter=10 is
    ample where plain hop-propagation would need 63."""
    n = 64
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id_a long, id_b long")
    out = dedup.duplicate_clusters_converged(pairs, max_iter=10).collect()
    assert len(out) == n
    assert {r.cluster_id for r in out} == {0}
    # the bounded-hop variant on the same graph is documented-partial:
    # 3 hops cannot reach the min from the far end
    l3 = {r.doc_id: r.cluster_id
          for r in dedup.duplicate_clusters(pairs, hops=3).collect()}
    assert l3[n - 1] > 0


def test_converged_clusters_cap_raises(spark):
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(31)], "id_a long, id_b long")
    import pytest as _pytest
    with _pytest.raises(RuntimeError, match="no fixpoint"):
        dedup.duplicate_clusters_converged(pairs, max_iter=1)


def test_transform_xy_polar_fast_path_dispatch(spark, monkeypatch):
    """EPSG/proj4 dispatch keeps the dependency-free kernel for the two
    production CRSs: transform_xy_columns must route to
    stereo_xy_columns with the right hemisphere. (Dispatch is asserted
    by sentinel, not by comparing two UDF runs bit-for-bit — separate
    Python workers can take different SIMD/scalar libm paths and
    differ by 1 ulp run-to-run.)"""
    calls = []
    real = crs.stereo_xy_columns

    def spy(lat="latitude", lon="longitude", hemisphere=1):
        calls.append(hemisphere)
        return real(lat, lon, hemisphere)

    monkeypatch.setattr(crs, "stereo_xy_columns", spy)
    crs.transform_xy_columns(epsg=3413)
    crs.transform_xy_columns(epsg=3031)
    crs.transform_xy_columns(
        proj4_string="+proj=stere +lat_0=90 +lat_ts=70 +lon_0=-45 +k=1"
                     " +x_0=0 +y_0=0 +datum=WGS84 +units=m +no_defs")
    crs.transform_xy_columns(
        proj4_string="+proj=stere +lat_0=-90 +lat_ts=-71 +lon_0=0 +k=1"
                     " +x_0=0 +y_0=0 +datum=WGS84 +units=m +no_defs ")
    assert calls == [1, -1, 1, -1]
    # numerical sanity: dispatched column equals the NumPy kernel
    df = spark.createDataFrame(
        [(70.0, -45.0), (75.5, 10.0), (82.25, -120.0)],
        "latitude double, longitude double")
    xf, yf = crs.transform_xy_columns(epsg=3413)
    out = df.select("latitude", "longitude",
                    xf.alias("x"), yf.alias("y")).toPandas()
    ex, ey = crs.polar_stereo_forward(out.latitude.to_numpy(),
                                     out.longitude.to_numpy(), 1)
    np.testing.assert_allclose(out.x.to_numpy(), ex, rtol=1e-12)
    np.testing.assert_allclose(out.y.to_numpy(), ey, rtol=1e-12)


def test_transform_xy_other_crs_gated_without_pyproj():
    import pytest as _pytest
    try:
        import pyproj  # noqa: F401
        _pytest.skip("pyproj available; gate not reachable")
    except ImportError:
        pass
    # WGS84 UTM (32633) is dependency-free since r5; the gate now
    # covers only genuinely exotic CRSs (non-WGS84 datums, other
    # projection families).  The error contract: raised at plan-build
    # time (not inside executor tasks), names the offending CRS, and
    # lists the dependency-free families.
    with _pytest.raises(NotImplementedError,
                        match=r"(?s)EPSG:27700.*pyproj.*dependency-free"):
        crs.transform_xy_columns(epsg=27700)  # OSGB36 TM (Airy sphd)
    with _pytest.raises(NotImplementedError,
                        match=r"(?s)\+proj=laea.*pyproj"):
        crs.transform_xy_columns(proj4_string="+proj=laea +lat_0=52")
    # oblique (non-polar) stereographic stays gated by decision: no
    # reference dataset uses it (production CRSs are EPSG:3413/3031,
    # geo_index.py srs_proj4 defaults), and the polar closed form does
    # not generalize — adding it would be dead surface.
    with _pytest.raises(NotImplementedError, match=r"(?s)stere.*pyproj"):
        crs.transform_xy_columns(
            proj4_string="+proj=stere +lat_0=52 +lon_0=10 +k=0.9996")
    with _pytest.raises(ValueError):
        crs.transform_xy_columns()


# -------------------------------------------------------------------
# Deterministic sampling / packing / decontamination (r5)
# -------------------------------------------------------------------


def test_hash_split_stable_under_subsetting(spark):
    """The property hash splits exist for: a row's assignment depends
    only on (id, salt) — identical on the full corpus, any subset, or
    any partition order. randomSplit cannot give this."""
    from pointdatabase_spark.operators import sampling
    from pyspark.sql import functions as F
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    splits = [("train", 0.8), ("val", 0.1), ("test", 0.1)]
    full = {r.doc_id: r.split
            for r in sampling.hash_split(docs, splits)
            .select("doc_id", "split").collect()}
    sub = {r.doc_id: r.split
           for r in sampling.hash_split(
               docs.where(F.col("doc_id") % 3 == 0).repartition(7),
               splits).select("doc_id", "split").collect()}
    assert sub and all(full[k] == v for k, v in sub.items())
    # fractions land near the requested weights
    from collections import Counter
    c = Counter(full.values())
    n = sum(c.values())
    assert abs(c["train"] / n - 0.8) < 0.06
    # a different salt re-rolls assignments
    resalt = {r.doc_id: r.split
              for r in sampling.hash_split(docs, splits, salt="v2")
              .select("doc_id", "split").collect()}
    assert any(full[k] != v for k, v in resalt.items())


def test_per_group_quota_and_packing_bounds(spark):
    from pointdatabase_spark.operators import sampling
    from pyspark.sql import functions as F
    docs = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .select("doc_id", "lang",
                    F.size(F.split("text", r"\s+")).cast("long")
                    .alias("n_tokens")))
    q = sampling.per_group_quota(docs, ["lang"], 7)
    per = {r.lang: r.n for r in
           q.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert per and all(v <= 7 for v in per.values())
    # determinism
    q2 = sampling.per_group_quota(docs, ["lang"], 7)
    assert sorted(map(tuple, q.collect())) == sorted(map(tuple, q2.collect()))

    budget = 500
    packed = sampling.pack_sequences(docs, budget, group_cols=["lang"])
    stats = (packed.groupBy("lang", "pack_id")
             .agg(F.sum("n_tokens").alias("tok"),
                  F.max("n_tokens").alias("mx")).collect())
    # greedy prefix-cut guarantee: a pack exceeds the budget only by
    # (part of) its final document
    assert all(r.tok <= budget + r.mx for r in stats)
    # pack ids per group are contiguous from 0
    per_lang = (packed.groupBy("lang")
                .agg(F.min("pack_id").alias("lo"),
                     F.max("pack_id").alias("hi"),
                     F.countDistinct("pack_id").alias("n")).collect())
    assert all(r.lo == 0 and r.n == r.hi + 1 for r in per_lang)


def test_benchmark_contamination_catches_planted_copies(spark):
    """Exact (+100000) and truncated (+200000) copies of eval docs
    must be flagged against their source eval doc."""
    from pointdatabase_spark import testkit
    from pointdatabase_spark.operators import dedup
    from pyspark.sql import functions as F
    sf = "/root/testdata/sf0.001"
    corpus = testkit.syn_corpus(spark, sf)
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    bench = docs.where(F.col("doc_id") % 13 == 0).select("doc_id", "text")
    flags = dedup.benchmark_contamination(corpus, bench, n=3,
                                          min_shared=5)
    pairs = {(r.doc_id, r.bench_id) for r in flags.collect()}
    bench_ids = [r.doc_id for r in bench.select("doc_id").collect()]
    # every eval doc present in the corpus flags against itself
    assert all((b, b) in pairs for b in bench_ids)
    # planted exact copies of eval docs flag against the eval doc
    both = [b for b in bench_ids if b % 7 == 0]
    assert both and all((b + 100000, b) in pairs for b in both)
    # the bench side broadcasts (corpus never shuffles for the join)
    plan = flags._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_funnel_counts_hand_case(spark):
    """First-touch ordering and the conversion horizon, on a hand
    case: u1 converts in order; u2 clicks BEFORE viewing (click must
    not count); u3 purchases outside the horizon."""
    from pointdatabase_spark.operators import funnels
    rows = [
        (1, "view", 100), (1, "click", 200), (1, "purchase", 300),
        (2, "click", 50), (2, "view", 100), (2, "purchase", 400),
        (3, "view", 0), (3, "click", 10), (3, "purchase", 5000),
        (4, "click", 10), (4, "purchase", 20),  # never views
    ]
    ev = spark.createDataFrame(rows, "user_id long, event_type string, tus long")
    out = {(r.step_idx, r.step): r.n_users
           for r in funnels.funnel_counts(
               ev, ["view", "click", "purchase"], within_us=1000).collect()}
    # views: u1,u2,u3; clicks after first view: u1 (200>100), u3 (10>0)
    # — NOT u2 (its only click precedes its view); purchases within
    # 1000 of first view: u1 (300<=1100) — NOT u3 (5000 > 0+1000)
    assert out == {(0, "view"): 3, (1, "click"): 2, (2, "purchase"): 1}


def test_mixture_sample_rates_and_determinism(spark):
    """Rate math: the binding domain (highest weight per available
    rows) keeps rate 1.0, the rest downsample to match its w_d·T; the
    corpus side never shuffles (broadcast rate table); re-runs are
    byte-identical."""
    from pointdatabase_spark.operators import sampling
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    weights = {f"src{i}": float(1 + (i % 4)) for i in range(20)}
    rates = {r.source: r.sample_rate for r in
             sampling.mixture_rates(docs, weights).collect()}
    assert len(rates) == 20 and all(0 < v <= 1.0 for v in rates.values())
    # some domain binds at rate 1.0, and a weight-1 domain samples at
    # roughly a quarter of a weight-4 domain (counts are near-uniform)
    assert math.isclose(max(rates.values()), 1.0, rel_tol=1e-12)
    assert rates["src0"] < rates["src3"]  # w=1 vs w=4
    kept = sampling.mixture_sample(docs, weights)
    a = sorted(r.doc_id for r in kept.select("doc_id").collect())
    b = sorted(r.doc_id for r in
               sampling.mixture_sample(docs, weights).select("doc_id").collect())
    assert a == b and 0 < len(a) < docs.count()
    # dropped domains: weights restricted to one source keep only it
    only = sampling.mixture_sample(docs, {"src5": 1.0})
    assert {r.source for r in only.select("source").collect()} == {"src5"}
    # scan-local: the kept-side plan has no shuffle of the corpus —
    # the only exchanges feed the broadcast rate table
    plan = kept._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_incremental_dedup_flags_planted(spark):
    """Exact copies flag exact+near, appended-tail copies flag near
    only, reversed-text docs flag neither."""
    from pointdatabase_spark.operators import dedup
    from pyspark.sql import functions as F
    docs = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .select("doc_id", "text"))
    exact = (docs.where(F.col("doc_id") % 10 == 0)
             .select((F.col("doc_id") + 900000).alias("doc_id"), "text"))
    near = (docs.where(F.col("doc_id") % 10 == 1)
            .select((F.col("doc_id") + 910000).alias("doc_id"),
                    F.concat(F.col("text"),
                             F.lit(" zq extra trailing tokens zq"))
                    .alias("text")))
    fresh = (docs.where(F.col("doc_id") % 10 == 2)
             .select((F.col("doc_id") + 920000).alias("doc_id"),
                     F.reverse(F.col("text")).alias("text")))
    delta = exact.unionByName(near).unionByName(fresh)
    out = {r.id: (r.is_exact_dup, r.is_near_dup) for r in
           dedup.incremental_dedup_flags(docs, delta).collect()}
    assert len(out) == delta.count()
    ex_ids = [r.doc_id for r in exact.select("doc_id").collect()]
    nr_ids = [r.doc_id for r in near.select("doc_id").collect()]
    fr_ids = [r.doc_id for r in fresh.select("doc_id").collect()]
    assert ex_ids and all(out[i] == (True, True) for i in ex_ids)
    # appended-tail docs: never exact; near for all (tiny dilution)
    assert nr_ids and all(not out[i][0] for i in nr_ids)
    assert sum(out[i][1] for i in nr_ids) >= 0.8 * len(nr_ids)
    # reversed docs: no flags (unless the corpus contains palindromic
    # boilerplate, which the synthetic corpus does not)
    assert fr_ids and all(out[i] == (False, False) for i in fr_ids)


def test_pii_scrub_and_counts(spark):
    from pointdatabase_spark.functions import pii
    rows = [
        (1, "write to alice.smith+x@sub.example.co.uk today"),
        (2, "call 555-123-4567 or 555.987.6543"),
        (3, "server at 10.0.255.7 and 192.168.1.42"),
        (4, "clean text with no pii at all"),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    got = (df.select("id", *pii.pii_counts("text"),
                     pii.scrub("text").alias("s"))
           .orderBy("id").collect())
    assert [(r.n_email, r.n_phone, r.n_ipv4) for r in got] == [
        (1, 0, 0), (0, 2, 0), (0, 0, 2), (0, 0, 0)]
    assert got[0].s == "write to <EMAIL> today"
    assert got[1].s == "call <PHONE> or <PHONE>"
    assert got[2].s == "server at <IP> and <IP>"
    assert got[3].s == "clean text with no pii at all"


def test_repetition_features_hand_cases(spark):
    from pointdatabase_spark.functions import text as T
    rows = [
        (1, "a a a a b"),          # run of 4 'a'; dup ratio 3/5
        (2, "x y x y x y"),        # top bigram 'x y' covers 3 of 5 grams
        (3, "all words differ here now"),
    ]
    df = T.with_tokens(spark.createDataFrame(rows, "id long, text string"),
                       "text")
    feats = ["dup_token_ratio", "top_bigram_cover", "max_token_run"]
    got = {r.id: r for r in df.select(
        "id", *[T.spark_expr(f, "text", "_toks").alias(f) for f in feats]
    ).collect()}
    assert math.isclose(got[1].dup_token_ratio, 3 / 5)
    assert got[1].max_token_run == 4
    # 'a a' appears 3 times among 4 bigrams; overlapping occurrences
    # double-count (3*2/5 = 1.2) so the fraction clamps to 1.0
    assert math.isclose(got[1].top_bigram_cover, 1.0)
    assert math.isclose(got[2].top_bigram_cover, 3 * 2 / 6)
    assert got[2].max_token_run == 1
    assert math.isclose(got[3].dup_token_ratio, 0.0)
    assert got[3].max_token_run == 1


def test_label_centroid_stats_planted_clusters(spark):
    """Two tight planted clusters: purity is perfect, own-centroid
    cosine is ~1, and centroid norms match the hand construction."""
    import numpy as np
    rows = []
    rng = np.random.default_rng(7)
    for lbl, base in ((0, np.array([10.0, 0.0, 0.0])),
                      (1, np.array([0.0, -8.0, 6.0]))):
        for i in range(40):
            v = base + rng.normal(0, 0.01, 3)
            rows.append((lbl * 1000 + i, [float(x) for x in v], lbl))
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int")
    out = {r.label: r for r in
           similarity.label_centroid_stats(emb).collect()}
    assert set(out) == {0, 1}
    for lbl, norm in ((0, 10.0), (1, 10.0)):
        assert out[lbl].n_vecs == 40
        assert out[lbl].n_nearest_own == 40
        assert abs(out[lbl].centroid_norm - norm) < 0.05
        assert out[lbl].mean_cos_own > 0.999


def test_chunk_documents_windows(spark):
    from pointdatabase_spark.operators import sampling
    df = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(1, 11))),  # 10 tokens
         (2, "a b c")],                                  # shorter than one chunk
        "doc_id long, text string")
    out = sampling.chunk_documents(df, chunk_tokens=4, overlap=2)
    rows = {(r.id, r.chunk_idx): r for r in out.collect()}
    # 10 tokens, window 4, step 2 -> ceil((10-4)/2)+1 = 4 chunks
    assert sorted(k for k in rows if k[0] == 1) == [(1, 0), (1, 1), (1, 2), (1, 3)]
    assert rows[(1, 0)].chunk_text == "t1 t2 t3 t4"
    assert rows[(1, 1)].chunk_text == "t3 t4 t5 t6"
    assert rows[(1, 3)].chunk_text == "t7 t8 t9 t10"
    assert all(rows[(1, k)].n_chunk_tokens == 4 for k in range(4))
    # stripping the overlap from chunks k>0 reconstructs the document
    toks = rows[(1, 0)].chunk_text.split()
    for k in range(1, 4):
        toks += rows[(1, k)].chunk_text.split()[2:]
    assert toks == [f"t{i}" for i in range(1, 11)]
    # short doc: exactly one (short) chunk
    assert sorted(k for k in rows if k[0] == 2) == [(2, 0)]
    # NULL text must not vanish: it becomes one empty-text chunk
    nd = spark.createDataFrame([(9, None)], "doc_id long, text string")
    nrows = sampling.chunk_documents(nd, chunk_tokens=4, overlap=2).collect()
    assert len(nrows) == 1 and nrows[0].chunk_idx == 0
    assert rows[(2, 0)].chunk_text == "a b c"
    assert rows[(2, 0)].n_chunk_tokens == 3
    # narrow plan: no exchanges
    import contextlib, io
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("simple")
    assert "Exchange" not in buf.getvalue()


def test_incremental_dedup_against_stored_index(spark, tmp_path):
    """The stored-index path must give byte-identical verdicts to the
    self-contained operator, and an index built incrementally (two
    appended halves) must equal one built in a single pass."""
    from pointdatabase_spark.operators import dedup
    from pyspark.sql import functions as F
    docs = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .select("doc_id", "text"))
    delta = (docs.where(F.col("doc_id") % 10 == 0)
             .select((F.col("doc_id") + 900000).alias("doc_id"), "text")
             .unionByName(
                 docs.where(F.col("doc_id") % 10 == 2)
                 .select((F.col("doc_id") + 920000).alias("doc_id"),
                         F.reverse(F.col("text")).alias("text"))))
    want = sorted(map(tuple,
                      dedup.incremental_dedup_flags(docs, delta).collect()))
    p1 = str(tmp_path / "idx_once")
    dedup.write_dedup_index(docs, p1)
    got = sorted(map(tuple, dedup.incremental_dedup_against_index(
        spark, p1, delta).collect()))
    assert got == want
    # incremental build: two halves appended → same verdicts
    p2 = str(tmp_path / "idx_app")
    dedup.write_dedup_index(docs.where("doc_id % 2 = 0"), p2)
    dedup.write_dedup_index(docs.where("doc_id % 2 = 1"), p2, mode="append")
    got2 = sorted(map(tuple, dedup.incremental_dedup_against_index(
        spark, p2, delta).collect()))
    assert got2 == want


# ---------------------------------------------------------------------------
# Temporal operators (operators/temporal.py)
# ---------------------------------------------------------------------------

def test_asof_join_hand_case(spark):
    from pointdatabase_spark.operators import temporal
    left = spark.createDataFrame(
        [(1, 100, "a"), (1, 200, "b"), (1, 50, "c"), (2, 100, "d")],
        "k int, tus long, tag string")
    right = spark.createDataFrame(
        [(1, 100, 10.0), (1, 150, 20.0), (2, 300, 30.0)],
        "k int, tus long, v double")
    out = {r["tag"]: r for r in temporal.asof_join(
        left, right, on="k", right_cols=["v"]).collect()}
    # exact-timestamp match allowed (backward inclusive)
    assert out["a"]["tus_m"] == 100 and out["a"]["v_m"] == 10.0
    # latest at-or-before, not just any earlier
    assert out["b"]["tus_m"] == 150 and out["b"]["v_m"] == 20.0
    # left row before every right row -> no match
    assert out["c"]["tus_m"] is None and out["c"]["v_m"] is None
    # keys never cross
    assert out["d"]["tus_m"] is None


def test_asof_join_tolerance_nulls_all_matched_cols(spark):
    # staleness must null value columns AND the matched ts together
    # (regression: sequential null-out read the already-nulled ts)
    from pointdatabase_spark.operators import temporal
    left = spark.createDataFrame([(1, 1050, "x"), (1, 920, "y")],
                                 "k int, tus long, tag string")
    right = spark.createDataFrame([(1, 900, 5.0)], "k int, tus long, v double")
    rows = {r["tag"]: r for r in temporal.asof_join(
        left, right, on="k", right_cols=["v"], tolerance=60).collect()}
    # x: match is 150 stale (> 60) -> BOTH columns nulled
    assert rows["x"]["tus_m"] is None and rows["x"]["v_m"] is None
    # y: 20 within tolerance -> kept
    assert rows["y"]["tus_m"] == 900 and rows["y"]["v_m"] == 5.0


def test_asof_join_plan_has_no_join(spark):
    # the union+window form must never plan an actual join operator
    from pointdatabase_spark.operators import temporal
    left = spark.range(10).select(F.lit(1).alias("k"),
                                  F.col("id").alias("tus"))
    right = spark.range(5).select(F.lit(1).alias("k"),
                                  F.col("id").alias("tus"),
                                  F.rand(7).alias("v"))
    plan = temporal.asof_join(left, right, on="k", right_cols=["v"]) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert "Window" in plan


def test_band_join_boundaries_exactly_once(spark):
    from pointdatabase_spark.operators import temporal
    # pairs across a bucket boundary and at band edges, each once
    left = spark.createDataFrame([(1, 100, "L1"), (1, 205, "L2")],
                                 "k int, tus long, tag string")
    right = spark.createDataFrame(
        [(1, 90, "Rin"), (1, 100, "Redge"), (1, 89, "Rout"),
         (1, 101, "Rafter"), (1, 196, "Rb")],
        "k int, tus long, tag string")
    out = temporal.band_join(left, right, on="k", lo=-10, hi=0)
    pairs = sorted((r["tag_l"], r["tag_r"]) for r in out.collect())
    # L1 band [90,100]: Rin(90) and Redge(100); Rout(89) and Rafter(101) excluded.
    # L2 band [195,205]: Rb(196). No duplicates despite bucket explode.
    assert pairs == [("L1", "Redge"), ("L1", "Rin"), ("L2", "Rb")]


def test_band_join_ts_column_is_the_join_key(spark):
    """Regression (ADVICE r6): when left_ts/right_ts EQUALS the join
    key `on`, the key is excluded from suffixing — the band
    predicates must still resolve (a suffixed alias of the key is
    emitted) instead of failing with an unresolved column."""
    from pointdatabase_spark.operators import temporal
    left = spark.createDataFrame([(100, "L1"), (205, "L2")],
                                 "tus long, tag string")
    right = spark.createDataFrame([(100, "Ra"), (205, "Rb"),
                                   (96, "Rc"), (215, "Rd")],
                                  "tus long, tag string")
    out = temporal.band_join(left, right, on="tus",
                             left_ts="tus", right_ts="tus",
                             lo=-5, hi=5)
    # equal `on` forces tus_l == tus_r, so only the exact matches
    pairs = sorted((r["tag_l"], r["tag_r"]) for r in out.collect())
    assert pairs == [("L1", "Ra"), ("L2", "Rb")]
    assert {"tus", "tus_l", "tus_r"} <= set(out.columns)


def test_band_join_plan_is_equi_join(spark):
    from pointdatabase_spark.operators import temporal
    left = spark.range(100).select((F.col("id") % 5).alias("k"),
                                   (F.col("id") * 37).alias("tus"))
    right = spark.range(100).select((F.col("id") % 5).alias("k"),
                                    (F.col("id") * 53).alias("tus"))
    plan = temporal.band_join(left, right, on="k", lo=-50, hi=50) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_multires_rollup_coarse_matches_direct(spark):
    from pointdatabase_spark.operators import temporal
    df = spark.range(1000).select(
        (F.col("id") % 3).cast("string").alias("g"),
        (F.col("id") * 97_000_000 % 5_000_000_000).alias("tus"),
        (F.col("id") % 17).cast("double").alias("v"))
    out = temporal.multires_rollup(df, "tus", ["g"], "v", [60, 3600])
    coarse = out.where(F.col("res_s") == 3600)
    direct = (df.groupBy("g", ((F.col("tus") - F.pmod("tus", F.lit(3600_000_000)))
                               ).cast("long").alias("bucket_us"))
              .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("sum_v"),
                   F.min("v").alias("min_v"), F.max("v").alias("max_v")))
    got = {(r["g"], r["bucket_us"]): (r["n"], r["sum_v"], r["min_v"], r["max_v"])
           for r in coarse.collect()}
    exp = {(r["g"], r["bucket_us"]): (r["n"], r["sum_v"], r["min_v"], r["max_v"])
           for r in direct.collect()}
    assert set(got) == set(exp)
    for k in exp:
        assert got[k][0] == exp[k][0] and got[k][2:] == exp[k][2:]
        assert abs(got[k][1] - exp[k][1]) < 1e-9


def test_multires_rollup_rejects_non_multiple(spark):
    import pytest as _pytest
    from pointdatabase_spark.operators import temporal
    df = spark.range(1).select(F.lit("a").alias("g"),
                               F.col("id").alias("tus"),
                               F.lit(1.0).alias("v"))
    with _pytest.raises(ValueError):
        temporal.multires_rollup(df, "tus", ["g"], "v", [60, 90])


# ---------------------------------------------------------------------------
# OLAP operators (operators/olap.py)
# ---------------------------------------------------------------------------

def test_top_k_per_group_ties_and_k(spark):
    from pointdatabase_spark.operators import olap
    df = spark.createDataFrame(
        [("a", 3.0, 1), ("a", 3.0, 2), ("a", 1.0, 3),
         ("b", 9.0, 4), ("b", 8.0, 5)],
        "g string, v double, id int")
    out = olap.top_k_per_group(df, ["g"], "v", 2, tiebreak="id")
    rows = sorted((r["g"], r["id"], r["rank_in_group"]) for r in out.collect())
    # equal v -> lower id ranks first; exactly k rows per group
    assert rows == [("a", 1, 1), ("a", 2, 2), ("b", 4, 1), ("b", 5, 2)]
    # the rank filter must plan as a running top-k, so only k rows per
    # group ever reach the exchange (the 100 TB contract)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan


def test_rollup_agg_grouping_ids(spark):
    from pointdatabase_spark.operators import olap
    df = spark.createDataFrame([("x", "p", 1.0), ("x", "q", 2.0),
                                ("y", "p", 4.0)], "a string, b string, v double")
    out = olap.rollup_agg(df, ["a", "b"], [F.sum("v").alias("s")])
    rows = {(r["a"], r["b"], r["gid"]): r["s"] for r in out.collect()}
    assert rows[("x", "p", 0)] == 1.0          # leaf
    assert rows[("x", None, 1)] == 3.0         # b rolled up -> low bit
    assert rows[(None, None, 3)] == 7.0        # grand total
    assert ("x", None, 2) not in rows          # rollup, not cube


def test_percentile_by_group_known_values(spark):
    from pointdatabase_spark.operators import olap
    df = spark.createDataFrame([("g", float(i)) for i in range(11)],
                               "g string, v double")
    r = olap.percentile_by_group(df, ["g"], "v", [0.5, 0.9]).collect()[0]
    assert r["p50"] == 5.0 and r["p90"] == 9.0


def test_asof_join_forward_and_nearest(spark):
    from pointdatabase_spark.operators import temporal
    left = spark.createDataFrame(
        [(1, 100, "a"), (1, 240, "b"), (1, 150, "c")],
        "k int, tus long, tag string")
    right = spark.createDataFrame(
        [(1, 100, 1.0), (1, 200, 2.0)], "k int, tus long, v double")
    fwd = {r["tag"]: r for r in temporal.asof_join(
        left, right, on="k", right_cols=["v"],
        direction="forward").collect()}
    # forward: earliest at-or-after; exact match inclusive
    assert fwd["a"]["tus_m"] == 100 and fwd["a"]["v_m"] == 1.0
    assert fwd["c"]["tus_m"] == 200
    assert fwd["b"]["tus_m"] is None          # nothing after 240
    near = {r["tag"]: r for r in temporal.asof_join(
        left, right, on="k", right_cols=["v"],
        direction="nearest").collect()}
    assert near["a"]["tus_m"] == 100          # exact
    assert near["b"]["tus_m"] == 200          # only backward exists
    assert near["c"]["tus_m"] == 100          # 50 back vs 50 fwd: tie -> backward
    # nearest with tolerance: stale backward must NOT shadow an
    # in-range forward candidate
    near2 = {r["tag"]: r for r in temporal.asof_join(
        left, right, on="k", right_cols=["v"],
        direction="nearest", tolerance=45).collect()}
    assert near2["b"]["tus_m"] == 200         # 40 back, within 45
    assert near2["c"]["tus_m"] is None        # both candidates 50 away


def test_interval_join_overlaps_exactly_once(spark):
    from pointdatabase_spark.operators import temporal
    # intervals spanning multiple buckets; overlap pairs must appear
    # exactly once (ownership-bucket rule, no distinct in the plan)
    left = spark.createDataFrame(
        [(1, 0, 250, "L1"), (1, 400, 450, "L2")],
        "k int, s long, e long, tag string")
    right = spark.createDataFrame(
        [(1, 200, 600, "R1"), (1, 260, 300, "R2"), (2, 0, 1000, "R3")],
        "k int, s long, e long, tag string")
    out = temporal.interval_join(left, right, on="k",
                                 left_start="s", left_end="e",
                                 right_start="s", right_end="e",
                                 bucket_us=100)
    pairs = sorted((r["tag_l"], r["tag_r"]) for r in out.collect())
    # L1 [0,250] x R1 [200,600] overlap; L2 [400,450] x R1 overlap;
    # L1 x R2 [260,300] disjoint; R3 other key
    assert pairs == [("L1", "R1"), ("L2", "R1")]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan
    # closed-interval boundary: touching endpoints overlap
    l2 = spark.createDataFrame([(1, 0, 100, "La")],
                               "k int, s long, e long, tag string")
    r2 = spark.createDataFrame([(1, 100, 150, "Ra")],
                               "k int, s long, e long, tag string")
    touch = temporal.interval_join(l2, r2, on="k", left_start="s",
                                   left_end="e", right_start="s",
                                   right_end="e", bucket_us=1000)
    assert [(r["tag_l"], r["tag_r"]) for r in touch.collect()] == [("La", "Ra")]


def test_hll_sketch_partial_merge(spark):
    """Mergeable distinct-count sketches (the 100 TB mode behind the
    profiler's exact COUNT(DISTINCT)): per-partition hll_sketch_agg
    partials unioned with hll_union_agg must estimate the same
    cardinality as one global sketch, within HLL error (~0.8% rsd at
    lgConfigK=14; the default 12 measured 2.1% here), and both near
    the exact count."""
    df = spark.range(20000).select(
        (F.col("id") % 4).alias("part"),
        F.concat(F.lit("u"), (F.col("id") % 7919)).alias("uid"))
    k = F.lit(14)
    exact = df.select("uid").distinct().count()
    direct = df.agg(F.hll_sketch_estimate(
        F.hll_sketch_agg("uid", k)).alias("n")).collect()[0]["n"]
    merged = (df.groupBy("part").agg(F.hll_sketch_agg("uid", k).alias("sk"))
              .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("n"))
              .collect()[0]["n"])
    assert abs(direct - exact) / exact < 0.025
    assert abs(merged - exact) / exact < 0.025


def test_approx_percentile_close_to_exact(spark):
    """The documented 100 TB mode of the percentile ladder
    (exact=False -> approx_percentile sketch) must track the exact
    values closely on a realistic skewed distribution."""
    from pointdatabase_spark.operators import olap
    df = spark.range(50000).select(
        (F.col("id") % 3).cast("string").alias("g"),
        F.pow(F.col("id") % 1000 / 999.0, F.lit(3.0)).alias("v"))
    exact = {r["g"]: r for r in olap.percentile_by_group(
        df, ["g"], "v", [0.5, 0.99], exact=True).collect()}
    approx = {r["g"]: r for r in olap.percentile_by_group(
        df, ["g"], "v", [0.5, 0.99], exact=False).collect()}
    for g in exact:
        for p in ("p50", "p99"):
            assert abs(exact[g][p] - approx[g][p]) <= 0.01 * max(
                1e-9, exact[g][p])


def test_trailing_agg_range_frame_semantics(spark):
    from pointdatabase_spark.operators import temporal
    # duplicate timestamps are PEERS: both rows see the same frame
    df = spark.createDataFrame(
        [(1, 0, 1.0, "a"), (1, 50, 2.0, "b"), (1, 50, 3.0, "c"),
         (1, 151, 4.0, "d"), (2, 50, 9.0, "e")],
        "k int, tus long, v double, tag string")
    out = {r["tag"]: r for r in temporal.trailing_agg(
        df, on="k", ts="tus", value="v", span_us=100).collect()}
    assert out["a"]["n_trail"] == 1 and out["a"]["sum_trail"] == 1.0
    # b and c at tus=50: frame [−50,50] includes a, b, c for BOTH
    for t in ("b", "c"):
        assert out[t]["n_trail"] == 3 and out[t]["sum_trail"] == 6.0
    # d at 151: frame [51,151] → only itself (50 is just outside)
    assert out["d"]["n_trail"] == 1 and out["d"]["sum_trail"] == 4.0
    assert out["e"]["n_trail"] == 1          # keys isolated


def test_weighted_sample_rate_scales_with_weight(spark):
    from pointdatabase_spark.operators import sampling as _sampling
    # weight 9:1 → keep rates should differ by ~9x; determinism exact
    df = spark.range(4000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, 9.0).otherwise(1.0).alias("wt"))
    kept = _sampling.weighted_sample(df, "wt", 0.2)
    a = kept.where("wt = 9.0").count()
    b = kept.where("wt = 1.0").count()
    # p_heavy = min(1, .2*9/5) = .36, p_light = .2/5 = .04 over 2000 each
    assert abs(a - 720) < 120 and abs(b - 80) < 45
    again = _sampling.weighted_sample(df, "wt", 0.2)
    assert kept.select("doc_id").subtract(again.select("doc_id")).count() == 0
    assert again.count() == kept.count()


def test_bm25_hand_computed(spark):
    from pointdatabase_spark.operators import retrieval
    # doc 3 contains NO query term — it must be absent, not scored 0
    docs = spark.createDataFrame(
        [(0, "a b a"), (1, "b c"), (2, "c c c c"), (3, "x y z")],
        "doc_id long, text string")
    out = {r["doc_id"]: r["bm25"] for r in retrieval.bm25_scores(
        docs, ["a", "c"]).collect()}
    k1, b = 1.2, 0.75
    n, avgdl = 4.0, 3.0
    idf_a = math.log(1 + (n - 1 + 0.5) / (1 + 0.5))
    idf_c = math.log(1 + (n - 2 + 0.5) / (2 + 0.5))

    def term(tf, dl, idf):
        return idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))

    assert out[0] == round(term(2, 3, idf_a), 6)
    assert out[1] == round(term(1, 2, idf_c), 6)
    assert out[2] == round(term(4, 4, idf_c), 6)
    # zero-hit docs are absent, not scored 0
    assert set(out) == {0, 1, 2}
    top = retrieval.bm25_topk(docs, ["a", "c"], k=2)
    plan = top._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_cohort_retention_hand_case(spark):
    from pointdatabase_spark.operators import funnels
    day = 100
    rows = [(1, 0), (1, 5), (1, 110),      # u1: cohort 0, active 0,1
            (2, 50),                        # u2: cohort 0, active 0
            (3, 120), (3, 130), (3, 250)]   # u3: cohort 1, active 1,2
    ev = spark.createDataFrame(rows, "user_id long, tus long")
    out = {(r["cohort_bucket"], r["offset"]):
           (r["n_active"], r["cohort_size"], r["retention"])
           for r in funnels.cohort_retention(ev, bucket_us=day).collect()}
    assert out[(0, 0)] == (2, 2, 1.0)
    assert out[(0, 1)] == (1, 2, 0.5)
    assert out[(1, 0)] == (1, 1, 1.0)
    assert out[(1, 1)] == (1, 1, 1.0)
    assert set(out) == {(0, 0), (0, 1), (1, 0), (1, 1)}


def test_asof_join_composite_key(spark):
    from pointdatabase_spark.operators import temporal
    left = spark.createDataFrame(
        [(1, "a", 100, "L1"), (1, "b", 100, "L2"), (2, "a", 100, "L3")],
        "k1 int, k2 string, tus long, tag string")
    right = spark.createDataFrame(
        [(1, "a", 90, 1.0), (1, "b", 80, 2.0), (2, "b", 85, 3.0)],
        "k1 int, k2 string, tus long, v double")
    out = {r["tag"]: r for r in temporal.asof_join(
        left, right, on=["k1", "k2"], right_cols=["v"]).collect()}
    # matches must respect BOTH key columns
    assert out["L1"]["v_m"] == 1.0
    assert out["L2"]["v_m"] == 2.0
    assert out["L3"]["v_m"] is None       # (2,'a') has no right rows


def test_scalar_dq_rule_name_with_single_quote(spark):
    """Regression (ADVICE r6): rule names are interpolated into a SQL
    stack() expr — an embedded single quote must be escaped, not
    break (or inject into) the expression."""
    from pointdatabase_spark.operators import profile as prof
    df = spark.range(10).select(F.col("id").cast("double").alias("v"))
    out = prof.scalar_dq(df, [
        ("v isn't negative", F.col("v") < 0),
        ("v < 5", F.col("v") >= 5)])
    got = {r["rule"]: r["violations"] for r in out.collect()}
    assert got == {"v isn't negative": 0, "v < 5": 5}


def test_knn_join_hand_case(spark):
    """Neighbors at exactly radius are kept, cells straddled, fewer
    than k within radius returns what exists, ties break by id."""
    from pyspark.sql import Row
    from pointdatabase_spark.operators import spatial
    pts = spark.createDataFrame([
        Row(row_id=1, x=0.0, y=0.0),
        Row(row_id=2, x=3.0, y=4.0),      # dist 5
        Row(row_id=3, x=-3.0, y=-4.0),    # dist 5 (tie -> id order)
        Row(row_id=4, x=10.0, y=0.0),     # dist 10 == radius: kept
        Row(row_id=5, x=10.1, y=0.0),     # beyond radius: dropped
        Row(row_id=6, x=9.9, y=9.9),      # dist ~14: dropped
    ])
    q = spark.createDataFrame([Row(q_id=7, x=0.0, y=0.0)])
    got = [(r.nbr_id, r.nn_rank) for r in
           spatial.knn_join(pts, q, k=10, radius=10.0)
           .orderBy("nn_rank").collect()]
    assert got == [(1, 1), (2, 2), (3, 3), (4, 4)]


def test_heavy_hitters_exact_under_eviction(spark):
    """capacity=4 << vocab=103: MG must evict rare terms yet the
    top-3 heavy terms (freq 60/50/40 >> N/(cap+1)) survive to the
    recount, which restores their EXACT counts."""
    from pyspark.sql import Row
    from pointdatabase_spark.operators import profile
    docs = []
    for i in range(60):
        docs.append(Row(text="alpha" + (" beta" if i < 50 else "")
                        + (" gamma" if i < 40 else "")))
    for i in range(100):                       # 100 singleton terms
        docs.append(Row(text=f"rare{i:03d}"))
    df = spark.createDataFrame(docs).repartition(4)
    rows = profile.heavy_hitter_terms(df, k=3, capacity=4).collect()
    got = [(r.term, r.freq) for r in rows]
    assert got == [("alpha", 60), ("beta", 50), ("gamma", 40)]
    # the surfaced exactness check: N=250 tokens, threshold
    # N/(cap+1)=50 — only alpha is STRICTLY above it (the flag is
    # sufficient-for-exact, not necessary: beta/gamma survived too)
    assert all(r.n_tokens == 250 for r in rows)
    assert [r.exact_guarantee for r in rows] == [True, False, False]


def test_bpe_greedy_overlap_and_chained_merges(spark):
    """'aaaa' x40: round 1 learns (a,a) with greedy left-to-right
    count 2 per word (overlaps don't double-count via the fold);
    round 2 learns (aa,aa) — a merged symbol participating in a later
    merge."""
    from pyspark.sql import Row
    from pointdatabase_spark.operators import tokenizer
    docs = spark.createDataFrame([Row(text="aaaa")] * 40)
    got = [(r.step, r.left, r.right, r.pair_count)
           for r in tokenizer.bpe_train(spark, docs, 2).collect()]
    # round 1: pairs of 'aaaa' = (a,a) x3 -> count 120; after the
    # greedy merge every word is [aa, aa]; round 2: (aa,aa) x40
    assert got == [(1, "a", "a", 120), (2, "aa", "aa", 40)]


def test_bpe_tie_breaks_lexicographically(spark):
    from pyspark.sql import Row
    from pointdatabase_spark.operators import tokenizer
    docs = spark.createDataFrame(
        [Row(text="zy ba")] * 7)       # pairs (z,y) and (b,a), tied
    [r] = tokenizer.bpe_train(spark, docs, 1).collect()
    assert (r.left, r.right, r.pair_count) == ("b", "a", 7)


def _bpe_sequential_reference(texts: list[str], n_merges: int):
    """Strict one-merge-at-a-time BPE (Sennrich 2016), the semantics
    the batched distributed trainer must reproduce exactly."""
    import re
    from collections import Counter
    words: Counter = Counter()
    for t in texts:
        for w in re.split(r"\s+", t):
            words[w] += 1
    vocab = {w: list(w) for w in words}
    out = []
    for step in range(n_merges):
        pc: Counter = Counter()
        for w, syms in vocab.items():
            # plain adjacent census, overlaps included ('aaaa' counts
            # (a,a) three times) — matches the engine's _pair_counts;
            # the fold's overlap rule only affects APPLICATION
            c = words[w]
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += c
        if not pc:
            break
        (l, r), c = min(pc.items(),
                        key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        out.append((step + 1, l, r, c))
        for w in vocab:
            syms, acc = vocab[w], []
            for x in syms:
                if acc and acc[-1] == l and x == r:
                    acc[-1] = l + r
                else:
                    acc.append(x)
            vocab[w] = acc
    return out


def test_bpe_batched_equals_sequential_64_merges(spark):
    """The batched trainer (r9) must be merge-for-merge identical to
    strict sequential BPE over >= 64 merges, while committing multiple
    merges per driver round (the 32k-train scale fix: rounds ~
    n_merges / mean-batch, not n_merges)."""
    import random
    from pyspark.sql import Row
    from pointdatabase_spark.operators import tokenizer
    rng = random.Random(9)
    syll = ["ka", "to", "mi", "ru", "se", "no", "ba", "li", "du", "fo"]
    texts = [" ".join("".join(rng.choices(syll, k=rng.randint(1, 4)))
                      for _ in range(12)) for _ in range(300)]
    docs = spark.createDataFrame([Row(text=t) for t in texts])
    stats: dict = {}
    got = [(r.step, r.left, r.right, r.pair_count) for r in
           tokenizer.bpe_train(spark, docs, 64, batch=64,
                               stats=stats).collect()]
    ref = _bpe_sequential_reference(texts, 64)
    assert got == ref[:len(got)] and len(got) == min(64, len(ref))
    # scale property: strictly fewer driver rounds than merges
    assert stats["rounds"] < len(got), stats
    assert sum(stats["batch_sizes"]) == len(got)


def test_bpe_encode_applies_merges_in_order(spark):
    from pyspark.sql import Row
    from pointdatabase_spark.operators import tokenizer
    docs = spark.createDataFrame(
        [Row(doc_id=i, text="aaaa aaaa") for i in range(10)])
    got = {r.doc_id: (r.n_words, r.n_tokens) for r in
           tokenizer.bpe_encode_doc_stats(spark, docs, 2).collect()}
    # merges (a,a) then (aa,aa): 'aaaa' encodes to ONE token
    assert got == {i: (2, 2) for i in range(10)}


def test_track_resample_hand_case(spark):
    """Grid 0,10,20 over samples at t=0(h=1), t=15(h=4), t=20(h=8):
    gt=0 lands ON a sample (h=1); gt=10 interpolates 1+(4-1)*10/15=3;
    gt=20 on-sample (h=8).  Equal-t duplicates collapse to max(h)."""
    from pyspark.sql import Row
    from pointdatabase_spark.operators import tracks
    pts = spark.createDataFrame([
        Row(rgt=1, t=0.0, h=1.0),
        Row(rgt=1, t=0.0, h=0.5),    # dup ts -> max(h)=1.0 survives
        Row(rgt=1, t=15.0, h=4.0),
        Row(rgt=1, t=20.0, h=8.0),
    ])
    got = {r.gt: (r.t_before, r.t_after, r.h_interp) for r in
           tracks.track_resample(pts, step=10).collect()}
    assert got == {0: (0, 0, 1.0), 10: (0, 15, 3.0), 20: (20, 20, 8.0)}


def test_grid_cluster_hand_case(spark):
    """Three dense cells — (0,0) and (1,1) touch diagonally, (5,5) is
    isolated; a 2-point cell stays below min_pts and is dropped."""
    from pyspark.sql import Row
    from pointdatabase_spark.operators import spatial
    rows = []
    for cx, cy, n in [(0, 0, 3), (1, 1, 4), (5, 5, 3), (8, 8, 2)]:
        rows += [Row(x=cx * 10.0 + 1.0, y=cy * 10.0 + 1.0)] * n
    got = {r.cluster_id: (r.n_cells, r.n_points,
                          r.cx_min, r.cx_max, r.cy_min, r.cy_max)
           for r in spatial.grid_cluster(
               spark.createDataFrame(rows), delta=10.0, min_pts=3
           ).collect()}
    def key(cx, cy):                       # 32-bit-lane packing
        return cx * 4294967296 + cy + 2147483648
    assert got == {key(0, 0): (2, 7, 0, 1, 0, 1),
                   key(5, 5): (1, 3, 5, 5, 5, 5)}


def test_grid_cluster_key_negative_and_large_cells(spark):
    """The r8 (cx+1000)*1e6+(cy+1000) packing collided for cx < -1000
    or |cy| ~ 1e5; the 32-bit-lane key must keep far-negative and
    ±1e5-magnitude cells distinct — adjacent cells still merge, cells
    one apart in x at cy=±1e5 stay separate clusters."""
    from pyspark.sql import Row
    from pointdatabase_spark.operators import spatial
    cells = [(-200_000, 100_000), (-199_999, 100_001),   # 8-adjacent
             (-199_997, 100_000),                        # gap of 2: apart
             (150_000, -100_000)]                        # far quadrant
    rows = []
    for cx, cy in cells:
        rows += [Row(x=cx * 10.0 + 5.0, y=cy * 10.0 + 5.0)] * 3
    got = {r.cluster_id: (r.n_cells, r.cx_min, r.cx_max)
           for r in spatial.grid_cluster(
               spark.createDataFrame(rows), delta=10.0, min_pts=3
           ).collect()}
    def key(cx, cy):
        return cx * 4294967296 + cy + 2147483648
    assert got == {
        key(-200_000, 100_000): (2, -200_000, -199_999),
        key(-199_997, 100_000): (1, -199_997, -199_997),
        key(150_000, -100_000): (1, 150_000, 150_000)}


def test_quantize_int8_hand_case(spark):
    """Two 2-d vectors spanning [0,2]x[5,5]: dim 0 quantizes to the
    endpoints (-127, 127), the zero-range dim 1 collapses to code 0
    and dequantizes to its min — and dequantized values reproduce the
    documented floor arithmetic exactly."""
    from pyspark.sql import Row
    from pointdatabase_spark.operators import similarity as sim
    emb = spark.createDataFrame([
        Row(vec_id=1, embedding=[0.0, 5.0]),
        Row(vec_id=2, embedding=[2.0, 5.0]),
        Row(vec_id=3, embedding=[1.0, 5.0]),
    ])
    out = {r.vec_id: (list(r.qvec), list(r.deq))
           for r in sim.quantize_int8(emb).collect()}
    assert out[1][0] == [-127, 0] and out[2][0] == [127, 0]
    # x=1.0 over [0,2]: floor(1/2*254+0.5)=127 -> code 0, deq = 1.0
    assert out[3][0] == [0, 0]
    assert out[1][1] == [0.0, 5.0] and out[2][1] == [2.0, 5.0]
    assert out[3][1] == [127 / 254.0 * 2.0, 5.0]


def test_write_training_shards_deterministic_order(spark, tmp_path):
    """The shard export is byte-reproducible: same shard membership
    AND same within-shard row order across two independent writes,
    and the order matches shard_assign's shard_pos ranking."""
    from pointdatabase_spark.operators import sampling
    docs = spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("doc "), F.col("id")).alias("text"))
    p1, p2 = str(tmp_path / "s1"), str(tmp_path / "s2")
    sampling.write_training_shards(docs, p1, n_shards=4)
    sampling.write_training_shards(
        docs.repartition(7), p2, n_shards=4)   # different input layout
    def read_order(p):
        out = {}
        for sh in range(4):
            rows = spark.read.parquet(f"{p}/shard={sh}").collect()
            out[sh] = [r.doc_id for r in rows]
        return out
    o1, o2 = read_order(p1), read_order(p2)
    assert o1 == o2
    assert sum(len(v) for v in o1.values()) == 200
    ranked = sampling.shard_assign(docs, n_shards=4)
    want = {sh: [r.doc_id for r in
                 ranked.where(F.col("shard") == sh)
                 .orderBy("shard_pos").collect()]
            for sh in range(4)}
    assert o1 == want


def test_kmeans_hand_case(spark):
    """Two obvious 2-D clusters: assignment and exact micro-unit
    centroid means are hand-checkable."""
    from pointdatabase_spark.operators import clustering
    rows = [(0, [0.0, 0.0]), (1, [0.1, 0.0]),
            (2, [1.0, 1.0]), (3, [0.9, 1.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = clustering.kmeans_fit(df, k=2, iters=2, dim=2).collect()
    got = {(r.cluster_id, r.dim): (r.centroid_q, r.n_members)
           for r in out}
    # seed = ids 0,1; after one assignment {0,1} vs {2,3} splits and
    # stays: cluster 0 mean (0.05, 0), cluster 1 mean (0.95, 1).
    assert got[(0, 0)] == (50000, 2)
    assert got[(0, 1)] == (0, 2)
    assert got[(1, 0)] == (950000, 2)
    assert got[(1, 1)] == (1000000, 2)


def test_kmeans_matches_numpy_lloyd(spark):
    """Quantized Lloyd recomputed in plain Python on random-ish
    vectors must equal the distributed result exactly."""
    import math
    from pointdatabase_spark.operators import clustering
    vecs = [[((i * 7 + j * 13) % 19 - 9) / 10.0 for j in range(4)]
            for i in range(30)]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>")
    out = clustering.kmeans_fit(df, k=3, iters=2, dim=4).collect()

    # reference implementation (float32 cast then micro-quantize)
    import struct
    def f32(x): return struct.unpack('<f', struct.pack('<f', x))[0]
    q = [[int(math.floor(f32(x) * 1e6 + 0.5)) for x in v] for v in vecs]
    cents = {c: q[c][:] for c in range(3)}
    assign = {}
    for it in range(2):
        for i, v in enumerate(q):
            d = sorted((sum((a - b) * (a - b) for a, b in zip(v, cents[c])), c)
                       for c in cents)
            assign[i] = d[0][1]
        agg = {}
        for i, c in assign.items():
            s, n = agg.setdefault(c, ([0] * 4, 0))
            agg[c] = ([a + b for a, b in zip(s, q[i])], n + 1)
        cents = {c: [int(math.floor(float(s) / n + 0.5)) for s in ss]
                 for c, (ss, n) in agg.items()}
        sizes = {c: n for c, (ss, n) in agg.items()}
    want = {(c, d): (cents[c][d], sizes[c])
            for c in cents for d in range(4)}
    got = {(r.cluster_id, r.dim): (r.centroid_q, r.n_members) for r in out}
    assert got == want


def test_canonical_url_rules(spark):
    from pointdatabase_spark.operators import web
    cases = [
        ("HTTP://WWW.Example.COM:80/a/b/", "http://example.com/a/b"),
        ("http://example.com/a/b#frag", "http://example.com/a/b"),
        ("http://example.com/x?utm_source=t&b=2&a=1",
         "http://example.com/x?a=1&b=2"),
        ("https://example.com/", "https://example.com"),
        ("http://example.com/x?gclid=99&fbclid=1",
         "http://example.com/x"),
        ("http://example.com/x?z=1&y=2#f?fake=param",
         "http://example.com/x?y=2&z=1"),
        ("http://example.com/p//", "http://example.com/p"),
        ("www.noscheme.com/x", "www.noscheme.com/x"),
        ("mailto:someone", "mailto:someone"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [r[0] for r in
           df.select(web.canonical_url("url")).collect()]
    assert got == [want for _, want in cases]


def test_canonical_url_sql_mirrors_spark(spark):
    """The DuckDB template must canonicalize identically."""
    import duckdb
    from pointdatabase_spark.operators import web
    urls = ["HTTP://WWW.A.COM:80/p/", "http://a.com/p?b=2&a=1#x",
            "https://www.a.com/p?utm_a=1&c=3", "http://a.com"]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = [r[0] for r in df.select(web.canonical_url("url")).collect()]
    con = duckdb.connect()
    expr = web.canonical_url_sql("url")
    want = [con.execute(f"SELECT {expr} FROM (SELECT ? AS url)",
                        [u]).fetchone()[0] for u in urls]
    assert got == want


def test_robust_outliers_hand_case(spark):
    """9 inliers around 10 plus one wild point: med=10, MAD from the
    hand-sorted deviations, exactly one outlier."""
    from pointdatabase_spark.operators import profile
    vals = [9.0, 9.5, 10.0, 10.0, 10.5, 11.0, 8.5, 10.2, 9.8, 100.0]
    df = spark.createDataFrame([("a", v) for v in vals],
                               "g string, value double")
    row = profile.robust_outliers(df, ["g"], "value", k=3).collect()[0]
    assert row.n == 10
    assert row.med_q == 10_000_000          # lower-middle of 10 = rank 5
    # deviations sorted: 0,0,200000,500000,500000,500000,1000000,...
    assert row.mad_q == 500_000
    assert row.n_outliers == 1              # only the 100.0


def test_pagerank_two_node_cycle(spark):
    """a<->b: every iteration preserves the uniform rank:
    rank = base + floor(0.85 * r)."""
    import math
    from pointdatabase_spark.operators import graph
    e = spark.createDataFrame([(1, 2), (2, 1)], "src long, dst long")
    out = {r.node: r.rank_q for r in graph.pagerank(e, iters=2).collect()}
    r0 = math.floor(1e12 / 2)
    base = math.floor(0.15 * 1e12 / 2)
    r1 = base + math.floor(r0 * 0.85 / 1)
    r2 = base + math.floor(r1 * 0.85 / 1)
    assert out == {1: r2, 2: r2}


def test_pagerank_star_sink(spark):
    """Three sources pointing at one sink: the sink accumulates
    3 contributions; sources fall to the base rank."""
    import math
    from pointdatabase_spark.operators import graph
    e = spark.createDataFrame([(1, 9), (2, 9), (3, 9)],
                              "src long, dst long")
    out = {r.node: r.rank_q for r in graph.pagerank(e, iters=1).collect()}
    r0 = math.floor(1e12 / 4)
    base = math.floor(0.15 * 1e12 / 4)
    assert out[1] == out[2] == out[3] == base
    assert out[9] == base + 3 * math.floor(r0 * 0.85 / 1)


def test_classifier_score_python_replica(spark):
    """Recompute one document's hashed-logit score in plain Python
    (hashlib md5, same bucket/weight math) and compare bitwise."""
    import hashlib
    from pointdatabase_spark.operators import classify
    text = "the quick brown fox jumps over the lazy dog"
    df = spark.createDataFrame([(7, text)], "doc_id long, text string")
    row = classify.score_documents(df).collect()[0]
    w = classify.weights()
    toks = text.split(" ")
    z = 0.0
    for t in toks:
        b = int(hashlib.md5(t.encode()).hexdigest()[:6], 16) % len(w)
        z = z + w[b]
    z = z / len(toks)
    score = z / (1.0 + abs(z))
    import math
    assert row.n_tokens == len(toks)
    assert row.score_q == math.floor(score * 1e6 + 0.5) / 1e6
    assert row.keep == (score > 0.0)


def test_stratified_split_exact_proportions(spark):
    """Every stratum must land within one row of the target
    fractions regardless of stratum size."""
    import math
    from pointdatabase_spark.operators import sampling
    rows = [(i, "a" if i < 57 else "b") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = sampling.stratified_split(
        df, ["lang"], [("train", 0.8), ("val", 0.1), ("test", 0.1)])
    counts = {(r.lang, r.split): r.n for r in
              out.groupBy("lang", "split")
              .agg(F.count(F.lit(1)).alias("n")).collect()}
    for lang, n in (("a", 57), ("b", 43)):
        tr = math.ceil(n * 0.8)
        va = math.ceil(n * (0.8 + 0.1)) - tr
        te = n - tr - va
        assert counts[(lang, "train")] == tr
        assert counts.get((lang, "val"), 0) == va
        assert counts.get((lang, "test"), 0) == te


def test_stratified_split_partition_order_independent(spark):
    from pointdatabase_spark.operators import sampling
    df = spark.range(200).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 3).cast("string").alias("lang"))
    a = sampling.stratified_split(df, ["lang"],
                                  [("train", 0.9), ("test", 0.1)])
    b = sampling.stratified_split(df.repartition(13), ["lang"],
                                  [("train", 0.9), ("test", 0.1)])
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_upsert_latest_wins_hand_case(spark):
    from pointdatabase_spark.operators import sampling
    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k long, s string, p double")
    upd = spark.createDataFrame(
        [(2, "B", 99.0), (9, "new", 1.0)],
        "k long, s string, p double")
    out = {r.k: (r.s, r.p, r._v) for r in
           sampling.upsert_latest_wins(base, upd, ["k"]).collect()}
    assert out == {1: ("a", 10.0, 0), 2: ("B", 99.0, 1),
                   3: ("c", 30.0, 0), 9: ("new", 1.0, 1)}


def test_cusum_hand_case(spark):
    """Two planted bursts over a quiet baseline: exactly two alarms,
    each resetting the statistic."""
    from datetime import datetime, timedelta
    from pointdatabase_spark.operators import temporal
    t0 = datetime(2024, 1, 1)
    vals = [3.0] * 5 + [30.0] + [3.0] * 5 + [40.0] + [2.0]
    rows = [("a", t0 + timedelta(minutes=i), v)
            for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "g string, ts timestamp, v double")
    r = temporal.cusum_alarms(df, ["g"], "ts", "v",
                              target_q=3_000_000, slack_q=0,
                              threshold_q=20_000_000).collect()[0]
    # burst of 30: cusum jumps 27e6 > 20e6 -> alarm+reset; idem 40.
    assert (r.n_obs, r.n_alarms) == (13, 2)
    # final: reset at the 40-burst, then one 2.0 step: max(0-1e6,0)=0
    assert r.final_cusum == 0


def test_cusum_matches_python_fold(spark):
    """The packed-scalar fold equals the textbook sequential CUSUM
    on a pseudo-random series — the regression for the DuckDB-1.0.0
    struct-accumulator in-place-field-update quirk that produced
    inflated alarm counts (later lambda fields saw the new cusum)."""
    from datetime import datetime, timedelta
    from pointdatabase_spark.operators import temporal
    t0 = datetime(2024, 1, 1)
    vals = [((i * 37) % 11) * 1.0 for i in range(3000)]
    rows = [("a", t0 + timedelta(seconds=i), v)
            for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "g string, ts timestamp, v double")
    tgt, thr = 4_000_000, 25_000_000
    r = temporal.cusum_alarms(df, ["g"], "ts", "v",
                              target_q=tgt, slack_q=0,
                              threshold_q=thr).collect()[0]
    c = a = 0
    for v in vals:
        nc = max(c + round(v * 1e6) - tgt, 0)
        if nc > thr:
            a += 1
            c = 0
        else:
            c = nc
    assert (r.n_alarms, r.final_cusum) == (a, c)


def test_cusum_threshold_bound_enforced(spark):
    """threshold_q >= 2^32 would push the packed fold state past the
    2^53 exact-double range — must fail loudly, not corrupt counts."""
    import pytest
    from pointdatabase_spark.operators import temporal
    df = spark.createDataFrame([("a", 1, 1.0)],
                               "g string, ts long, v double")
    with pytest.raises(ValueError, match="threshold_q"):
        temporal.cusum_alarms(df, ["g"], "ts", "v", target_q=0,
                              slack_q=0, threshold_q=1 << 32)
    # one below the ceiling is accepted and still exact
    r = temporal.cusum_alarms(df, ["g"], "ts", "v", target_q=0,
                              slack_q=0,
                              threshold_q=(1 << 32) - 1).collect()[0]
    assert (r.n_obs, r.n_alarms, r.final_cusum) == (1, 0, 1_000_000)


def test_dedup_latest_null_ts_loses(spark):
    """A NULL fetch_ts must lose to any non-NULL fetch (SQL NULLS
    LAST semantics), and an all-NULL group keeps a NULL ts — the
    cross-engine divergence flagged in the r9 ADVICE."""
    from pointdatabase_spark.operators import web
    rows = [
        (1, "http://a.com/x", 5),
        (2, "http://a.com/x", None),      # null loses to ts=5
        (3, "http://b.com/y", None),
        (4, "http://b.com/y", None),      # all-null: min id, null ts
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string, "
                                     "fetch_ts long")
    got = {r.canon_url: (r.doc_id, r.fetch_ts, r.n_versions)
           for r in web.dedup_latest(df).collect()}
    assert got == {"http://a.com/x": (1, 5, 2),
                   "http://b.com/y": (3, None, 2)}


def test_lsh_recall_eval_sample_arg_and_cache_release(spark):
    """The operator-owned sample_mod/base_id_expr must reproduce the
    caller-side WHERE sample exactly, and the audit must release its
    persisted shingle table (no application-lifetime cache leak)."""
    from pointdatabase_spark.operators import dedup
    from pointdatabase_spark import testkit
    sf = "/root/testdata/sf0.001"
    corpus = testkit.syn_corpus(spark, sf)
    # Delta check, not absolute: in the full suite the shared session
    # legitimately carries other operators' documented lazy caches.
    before = spark.sparkContext._jsc.getPersistentRDDs().size()
    via_arg = dedup.lsh_recall_eval(
        corpus, sample_mod=3,
        base_id_expr="doc_id % 100000").collect()
    # eager audit + unpersist: the call must not ADD a cached RDD
    after = spark.sparkContext._jsc.getPersistentRDDs().size()
    assert after <= before, (before, after)
    from pyspark.sql import functions as F
    via_where = dedup.lsh_recall_eval(
        corpus.where((F.col("doc_id") % 100000) % 3 == 0)).collect()
    assert sorted(map(tuple, via_arg)) == sorted(map(tuple, via_where))


def test_kmeans_farthest_point_beats_smallest_ids(spark):
    """Planted adversarial layout: the 3 smallest ids all live in ONE
    true cluster, so smallest-ids init wedges two centroids inside
    it; deterministic farthest-point seeding must recover all three
    clusters and achieve a strictly better exact-integer objective."""
    from pointdatabase_spark.operators import clustering

    centers = [(0.0, 0.0), (100.0, 0.0), (0.0, 100.0)]
    pts = []
    vid = 0
    for ci, (cx, cy) in enumerate(centers):
        for j in range(20):
            # ids 0..19 -> cluster 0, 20..39 -> cluster 1, ...
            pts.append((vid, [cx + (j % 5) * 0.25,
                              cy + (j % 3) * 0.25]))
            vid += 1
    df = spark.createDataFrame(pts, "vec_id long, "
                                    "embedding array<double>")

    def objective(cent_rows):
        cents = {}
        for r in cent_rows:
            cents.setdefault(r.cluster_id, {})[r.dim] = r.centroid_q
        cvecs = [[c[d] for d in sorted(c)] for c in cents.values()]
        tot = 0
        for _, v in pts:
            vq = [round(x * 1e6) for x in v]
            tot += min(sum((a - b) ** 2 for a, b in zip(vq, c))
                       for c in cvecs)
        return tot

    base = clustering.kmeans_fit(df, k=3, iters=2, dim=2).collect()
    fp = clustering.kmeans_fit(df, k=3, iters=2, dim=2,
                               init="farthest_point").collect()
    ob, of = objective(base), objective(fp)
    assert of < ob / 100, (ob, of)
    # farthest-point recovered the planted structure: 3 clusters of 20
    sizes = sorted({r.cluster_id: r.n_members for r in fp}.values())
    assert sizes == [20, 20, 20]
    # determinism: a second run is identical
    fp2 = clustering.kmeans_fit(df, k=3, iters=2, dim=2,
                                init="farthest_point").collect()
    assert sorted(map(tuple, fp)) == sorted(map(tuple, fp2))
    # the sampled path stays deterministic too (looser: just runs
    # and returns k clusters when the sample keeps enough points)
    fps = clustering.kmeans_fit(df, k=3, iters=1, dim=2,
                                init="farthest_point",
                                seed_sample_mod=2).collect()
    assert len({r.cluster_id for r in fps}) == 3


def test_pagerank_dangling_redistribute_conserves_mass(spark):
    """Star-with-sink: every spoke points at a sink hub. The default
    leak variant loses the hub's damped mass each round; the
    redistribute option must conserve total rank mass to within the
    per-node/per-edge floor truncation."""
    from pointdatabase_spark.operators import graph
    edges = spark.createDataFrame(
        [(1, 4), (2, 4), (3, 4)], "src long, dst long")
    n_nodes, n_edges, it = 4, 3, 3
    leak = graph.pagerank(edges, iters=it).collect()
    red = graph.pagerank(edges, iters=it,
                         dangling="redistribute").collect()
    tot_leak = sum(r.rank_q for r in leak)
    tot_red = sum(r.rank_q for r in red)
    S = graph.SCALE
    # floors lose < 1 unit per node per round (base + share) and per
    # edge contribution, plus the initial split
    tol = (it + 1) * (n_nodes + n_edges) + n_nodes
    assert abs(tot_red - S) <= tol, (tot_red, S)
    # the leak variant really leaks (the hub holds >= 1/4 of mass,
    # 85% of it vanishes each round) — this is what redistribute fixes
    assert tot_leak < 0.8 * S
    # symmetry: the three spokes stay exactly tied under both
    for rows in (leak, red):
        spokes = {r.node: r.rank_q for r in rows}
        assert spokes[1] == spokes[2] == spokes[3]
    # redistribute is deterministic
    red2 = graph.pagerank(edges, iters=it,
                          dangling="redistribute").collect()
    assert sorted(map(tuple, red)) == sorted(map(tuple, red2))


def _ref_label_prop(edge_list, iters):
    """Textbook synchronous label propagation with the smallest-label
    tie rule — the sequential ground truth the distributed operator
    must reproduce exactly."""
    from collections import Counter, defaultdict
    adj = defaultdict(set)
    for a, b in edge_list:
        adj[a].add(b)
        adj[b].add(a)
    lbl = {n: n for n in adj}
    for _ in range(iters):
        lbl = {n: max(Counter(lbl[m] for m in adj[n]).items(),
                      key=lambda kv: (kv[1], -kv[0]))[0]
               for n in adj}
    return lbl


def test_label_propagation_matches_python_fold(spark):
    """Two bridged triangles AND a pseudo-random graph, 1-3 rounds:
    the distributed rounds must equal the sequential synchronous
    algorithm node-for-node (including its oscillation artifacts —
    synchronous LP is a pure function of the graph under the
    smallest-label tie rule)."""
    from pointdatabase_spark.operators import graph
    tri = [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (10, 12),
           (3, 10)]
    rnd = [((i * 7) % 23, (i * 13 + 5) % 23) for i in range(40)
           if (i * 7) % 23 != (i * 13 + 5) % 23]
    for edge_list in (tri, rnd):
        df = spark.createDataFrame(edge_list, "src long, dst long")
        for it in (1, 2, 3):
            got = {r.node: r.label for r in
                   graph.label_propagation(df, iters=it).collect()}
            assert got == _ref_label_prop(edge_list, it), (it,)


def test_label_propagation_path_smallest_tie(spark):
    """A 3-node path 5-7-9: the middle node sees labels {5, 9} once
    each — the tie must break to the SMALLEST label on both
    rounds (the determinism contract)."""
    from pointdatabase_spark.operators import graph
    edges = spark.createDataFrame([(5, 7), (7, 9)],
                                  "src long, dst long")
    got = {r.node: r.label for r in
           graph.label_propagation(edges, iters=1).collect()}
    assert got[7] == 5          # tie {5,9} -> 5
    assert got[5] == 7 and got[9] == 7  # single neighbor each


def test_cms_estimate_upper_bound_and_exact_when_wide(spark):
    """CMS never undercounts; with width >> vocabulary there are no
    collisions and every estimate is exact. With width=2 collisions
    are forced and at least one term must overcount."""
    from pyspark.sql import functions as F
    from pointdatabase_spark.operators import sketch
    rows = [(f"t{i % 7}",) for i in range(70)] + [("rare",)]
    df = spark.createDataFrame(rows, "term string")
    exact = {r.term: r.cnt for r in
             df.groupBy("term").agg(F.count(F.lit(1)).alias("cnt"))
             .collect()}
    wide = sketch.cms_build(df, "term", depth=4, width=4096)
    est = {r.term: r.cms_est for r in
           sketch.cms_lookup(wide, df, "term", depth=4,
                             width=4096).collect()}
    assert est == exact
    narrow = sketch.cms_build(df, "term", depth=2, width=2)
    est2 = {r.term: r.cms_est for r in
            sketch.cms_lookup(narrow, df, "term", depth=2,
                              width=2).collect()}
    assert all(est2[t] >= c for t, c in exact.items())
    assert any(est2[t] > c for t, c in exact.items())
    # sketch size is bounded by depth x width regardless of vocab
    assert narrow.count() <= 4


def test_cms_merge_linearity(spark):
    """Sketching two disjoint corpora and cell-wise adding equals
    sketching the union — the property incremental maintenance
    relies on."""
    from pyspark.sql import functions as F
    from pointdatabase_spark.operators import sketch
    a = spark.createDataFrame([(f"w{i % 5}",) for i in range(20)],
                              "term string")
    b = spark.createDataFrame([(f"w{i % 9}",) for i in range(30)],
                              "term string")
    sa, sb = (sketch.cms_build(x, "term", 3, 64) for x in (a, b))
    merged = (sa.unionByName(sb).groupBy("lane", "slot")
              .agg(F.sum("cnt").alias("cnt")))
    direct = sketch.cms_build(a.unionByName(b), "term", 3, 64)
    assert (sorted(map(tuple, merged.collect()))
            == sorted(map(tuple, direct.collect())))


def test_label_propagation_directed_keeps_all_nodes(spark):
    """symmetrize=False (review regression): sinks and no-in-neighbor
    nodes must keep labels instead of vanishing — a 1->2->3 chain
    returns all three nodes at every iteration count."""
    from pointdatabase_spark.operators import graph
    edges = spark.createDataFrame([(1, 2), (2, 3)],
                                  "src long, dst long")
    for it in (1, 2):
        got = {r.node: r.label for r in
               graph.label_propagation(edges, iters=it,
                                       symmetrize=False).collect()}
        assert set(got) == {1, 2, 3}, (it, got)
    # labels flow along edge direction: after 1 round 2 takes 1's
    # label, 3 takes 2's; node 1 (no in-edges) keeps its own
    got1 = {r.node: r.label for r in
            graph.label_propagation(edges, iters=1,
                                    symmetrize=False).collect()}
    assert got1 == {1: 1, 2: 1, 3: 2}


def test_farthest_point_seed_preserves_caller_cache(spark):
    """The seeding pass must not evict the caller's cached quantized
    corpus (review regression: unpersist on the shared frame)."""
    from pyspark.sql import functions as F
    from pointdatabase_spark.operators import clustering
    df = spark.createDataFrame(
        [(i, [float(i), float(i % 3)]) for i in range(30)],
        "vec_id long, embedding array<double>")
    q = df.select(F.col("vec_id").alias("_id"),
                  clustering.quantize_vec("embedding").alias("xq"))
    q = q.cache()
    q.count()
    try:
        clustering._farthest_point_seed(q, 2, None)
        assert q.is_cached, "shared path evicted the caller's cache"
        clustering._farthest_point_seed(q, 2, 2)
        assert q.is_cached, "sampled path evicted the caller's cache"
    finally:
        q.unpersist(blocking=True)


def test_dedup_latest_rejects_float_ts(spark):
    """Float timestamps would truncate silently in the BIGINT
    ordering — must fail loudly (review regression)."""
    import pytest
    from pointdatabase_spark.operators import web
    df = spark.createDataFrame(
        [(1, "http://a.com/x", 5.9)],
        "doc_id long, url string, fetch_ts double")
    with pytest.raises(ValueError, match="fetch_ts"):
        web.dedup_latest(df)


def test_upsert_ckpt_digest_slash_insensitive(spark):
    """'/x/ck' and '/x/ck/' are the same checkpoint — their marker
    namespaces must coincide (review regression: respelled path
    re-applying committed batches)."""
    from pointdatabase_spark.streaming import upsert as su
    assert su._ckpt_digest("/x/ck") == su._ckpt_digest("/x/ck/")
    assert su._ckpt_digest("/x/ck") != su._ckpt_digest("/x/ck2")


def test_butterfly_count_hand_case(spark):
    """K_{2,2} is exactly one butterfly; adding a pendant edge adds
    wedges=0 (its right node has degree 1); the degree cap drops a
    hot hub entirely."""
    from pointdatabase_spark.operators import graph
    # left {1,2} x right {10,11} complete, plus pendant (3, 12)
    edges = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 10), (2, 11), (3, 12)],
        "src long, dst long")
    r = graph.butterfly_count(edges).collect()[0]
    # wedges: pair (1,2) through 10 and through 11 -> m=2 -> C(2,2)=1
    assert (r.n_edges, r.n_wedges, r.n_butterflies) == (5, 2, 1)
    # hub 10 connected to 4 lefts: uncapped adds C(4,2)=6 wedges
    hub = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 10), (4, 10), (1, 11), (2, 11)],
        "src long, dst long")
    full = graph.butterfly_count(hub).collect()[0]
    assert (full.n_wedges, full.n_butterflies) == (7, 1)
    capped = graph.butterfly_count(hub, max_degree=3).collect()[0]
    # hub 10 (deg 4) dropped: only the (1,2)-through-11 wedge remains
    assert (capped.n_edges, capped.n_wedges,
            capped.n_butterflies) == (2, 1, 0)
    # duplicate edges must not double-count (distinct contract)
    dup = spark.createDataFrame(
        [(1, 10), (1, 10), (2, 10), (2, 11), (1, 11)],
        "src long, dst long")
    d = graph.butterfly_count(dup).collect()[0]
    assert (d.n_edges, d.n_wedges, d.n_butterflies) == (4, 2, 1)


def test_triangle_census_hand_case(spark):
    """K4 + pendant: every K4 node sits in C(3,2)=3 triangles; the
    hub's ccoef is diluted by the pendant (3/C(4,2) = 0.5); duplicate
    and reversed edges collapse (canonical-distinct contract); the
    degree cap drops the hub and with it every triangle."""
    from pointdatabase_spark.operators import graph
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
         (5, 1), (1, 5), (2, 3)],  # reversed + duplicate edges
        "src long, dst long")
    rows = {r.node: r for r in graph.triangle_census(edges).collect()}
    assert (rows[1].deg, rows[1].tri, rows[1].ccoef_ppm) == (4, 3, 500000)
    for n in (2, 3, 4):
        assert (rows[n].deg, rows[n].tri,
                rows[n].ccoef_ppm) == (3, 3, 1000000)
    assert (rows[5].deg, rows[5].tri, rows[5].ccoef_ppm) == (1, 0, 0)
    # cap at 3: node 1 (deg 4) drops -> K3 on {2,3,4} remains
    capped = {r.node: r
              for r in graph.triangle_census(edges, max_degree=3)
              .collect()}
    assert 1 not in capped and 5 not in capped
    assert all(capped[n].tri == 1 and capped[n].deg == 2
               for n in (2, 3, 4))


def test_kcore_hand_case(spark):
    """Chain c1-c2-c3 peels outside-in: one 2-core round removes the
    endpoints, the second round removes the now-isolated middle —
    synchronous round-start degrees, so one round is NOT enough."""
    from pointdatabase_spark.operators import graph
    # K4 {1..4} + chain 4-6-7 hanging off it
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
         (4, 6), (6, 7)], "src long, dst long")
    one = {r.node: r.deg for r in
           graph.kcore(edges, k=2, rounds=1).collect()}
    # round 1: only 7 (deg 1) peels; 6 keeps round-START deg 2
    assert one == {1: 3, 2: 3, 3: 3, 4: 4, 6: 1}
    two = {r.node: r.deg for r in
           graph.kcore(edges, k=2, rounds=2).collect()}
    # round 2: 6's degree fell to 1 -> peels; K4 survives
    assert two == {1: 3, 2: 3, 3: 3, 4: 3}
    import pytest
    with pytest.raises(ValueError):
        graph.kcore(edges, k=0)


def test_key_skew_report_hand_case(spark):
    """Exact nearest-rank percentiles and ppm ratios on a known
    distribution; top-key tie breaks to the smallest key string."""
    from pointdatabase_spark.operators.profile import key_skew_report
    rows = ([("a",)] * 1 + [("b",)] * 2 + [("c",)] * 3 + [("d",)] * 4)
    df = spark.createDataFrame(rows, "k string")
    r = key_skew_report(df, "k").collect()[0]
    assert (r.n_rows, r.n_keys, r.max_cnt) == (10, 4, 4)
    # ranks: ceil(.5*4)=2 -> 2; ceil(.9*4)=4 -> 4; ceil(.99*4)=4 -> 4
    assert (r.p50_cnt, r.p90_cnt, r.p99_cnt) == (2, 4, 4)
    assert r.mean_cnt_ppm == 2500000      # 10e6 div 4
    assert r.skew_ratio_ppm == 1600000    # 1e6*4*4 div 10
    assert r.top_key == "d"
    # tie on the hot count -> smallest key string wins
    tie = spark.createDataFrame(
        [("z",), ("z",), ("y",), ("y",), ("x",)], "k string")
    assert key_skew_report(tie, "k").collect()[0].top_key == "y"


def test_cooccurrence_edges_hand_case(spark):
    """Support threshold, canonical ordering, per-group DISTINCT
    items (duplicates inside one group count once), and the
    hot-group valve."""
    from pointdatabase_spark.operators import graph
    rows = [  # groups: g1={1,2,3}, g2={1,2}, g3={2,3}, g4={1,2} dup
        (1, 1), (1, 2), (1, 3),
        (2, 1), (2, 2),
        (3, 2), (3, 3),
        (4, 1), (4, 2), (4, 2),  # duplicate item in-group
    ]
    df = spark.createDataFrame(rows, "g long, item long")
    e = {(r.src, r.dst) for r in graph.cooccurrence_edges(
        df, "g", "item", min_support=2).collect()}
    # (1,2): groups 1,2,4 -> 3; (2,3): groups 1,3 -> 2; (1,3): 1 only
    assert e == {(1, 2), (2, 3)}
    e1 = {(r.src, r.dst) for r in graph.cooccurrence_edges(
        df, "g", "item", min_support=1).collect()}
    assert e1 == {(1, 2), (1, 3), (2, 3)}
    # valve: dropping groups larger than 2 removes g1's pairs
    ev = {(r.src, r.dst) for r in graph.cooccurrence_edges(
        df, "g", "item", min_support=2, max_group_size=2).collect()}
    assert ev == {(1, 2)}


def test_containment_pairs_hand_case(spark):
    """A small doc fully embedded in a big one: Jaccard tiny (misses
    at any practical threshold), containment of the small side 1.0 —
    the asymmetric case the operator exists for. Direction check:
    cont_ab is a's coverage (a = smaller id)."""
    quote = "alpha beta gamma delta"
    big = quote + " " + " ".join(f"w{i} w{i}x" for i in range(40))
    df = spark.createDataFrame(
        [(1, quote, "en"), (2, big, "en"), (3, "zeta eta theta", "en"),
         (4, quote, "de")],  # other lang: blocked, never pairs
        "doc_id long, text string, lang string")
    rows = {(r.id_a, r.id_b): r for r in dedup.containment_pairs(
        df, ["lang"], n=2, threshold=0.8).collect()}
    assert set(rows) == {(1, 2)}
    r = rows[(1, 2)]
    assert r.cont_ab == 1.0          # all of doc 1's bigrams in doc 2
    assert r.cont_ba < 0.1           # doc 2 barely covered
    # Jaccard at the same pair is far below any dedup threshold
    j = dedup.ngram_jaccard_pairs(df, ["lang"], n=2,
                                  threshold=0.0).collect()
    jac = {(x.id_a, x.id_b): x.jaccard for x in j}[(1, 2)]
    assert jac < 0.1


def test_pareto_frontier_hand_case(spark):
    """Dominance, both-axis ties (duplicates all survive), equal-x
    reduction, axis flips, and null exclusion."""
    from pointdatabase_spark.operators import olap
    df = spark.createDataFrame(
        [(1, 1.0, 10), (2, 1.0, 10),    # duplicate frontier points
         (3, 1.0, 5),                   # same x, smaller y: dominated
         (4, 2.0, 12), (5, 2.0, 12),    # frontier (bigger y, dearer)
         (6, 3.0, 12),                  # same y as 4 at higher x: dominated
         (7, 0.5, 3),                   # cheapest: frontier
         (8, None, 99), (9, 4.0, None)],
        "id long, price double, size int")
    got = {r.id for r in olap.pareto_frontier(
        df, "price", "size").collect()}
    assert got == {1, 2, 4, 5, 7}
    # flip: maximize price, minimize size -> dearest-and-smallest
    flipped = {r.id for r in olap.pareto_frontier(
        df, "size", "price", x_min=True, y_max=True).collect()}
    # minimize size, maximize price: (7:3,0.5) dominated by nothing
    # smaller; (3: 5,1.0), (6: 12,3.0) frontier
    assert flipped == {7, 3, 6}


def test_pareto_frontier_matches_bruteforce(spark):
    """Grid pruning is exact on adversarial layouts: random points
    plus a dense anti-diagonal (every point near the frontier) and a
    degenerate zero-range-x batch."""
    rng = np.random.default_rng(7)
    pts = [(i, float(x), float(y)) for i, (x, y) in enumerate(
        zip(rng.integers(0, 50, 300), rng.integers(0, 50, 300)))]
    pts += [(1000 + i, float(i), float(-i)) for i in range(50)]
    from pointdatabase_spark.operators import olap
    df = spark.createDataFrame(pts, "id long, x double, y double")
    got = sorted(r.id for r in olap.pareto_frontier(
        df, "x", "y", grid=8).collect())
    want = sorted(i for i, x, y in pts
                  if not any((x2 <= x and y2 >= y and (x2 < x or y2 > y))
                             for _, x2, y2 in pts))
    assert got == want
    same_x = spark.createDataFrame(
        [(1, 5.0, 1.0), (2, 5.0, 9.0), (3, 5.0, 9.0)],
        "id long, x double, y double")
    assert sorted(r.id for r in olap.pareto_frontier(
        same_x, "x", "y").collect()) == [2, 3]


def test_edit_distance_pairs_hand_case(spark):
    """Pigeonhole coverage across the regimes: normal strings, the
    short block (len <= d), the empty string, and exact duplicates
    (dist 0)."""
    from pointdatabase_spark.operators import fuzzy
    rows = [(1, "small ring"), (2, "small rings"), (3, "small ring"),
            (4, "red widget"), (5, "red gadget"), (6, "ab"), (7, "a"),
            (8, ""), (9, "b"), (10, "blue bolt"), (11, "blue bolts")]
    df = spark.createDataFrame(rows, "id long, name string")
    got = sorted((r.id_a, r.id_b, r.dist) for r in
                 fuzzy.edit_distance_pairs(df, "id", "name", d=2)
                 .collect())
    def lev(a, b):
        import functools
        @functools.lru_cache(maxsize=None)
        def f(i, j):
            if i == 0:
                return j
            if j == 0:
                return i
            return min(f(i - 1, j) + 1, f(i, j - 1) + 1,
                       f(i - 1, j - 1) + (a[i - 1] != b[j - 1]))
        return f(len(a), len(b))
    want = sorted((i, j, lev(a, b)) for i, a in rows for j, b in rows
                  if i < j and lev(a, b) <= 2)
    assert got == want


def test_edit_distance_pairs_matches_bruteforce(spark):
    """Random short strings over a 3-letter alphabet (maximally
    boundary-prone segment splits), d = 1 and d = 3, plus group
    blocking."""
    from pointdatabase_spark.operators import fuzzy
    rng = np.random.default_rng(11)
    alpha = "abc"
    rows = [(i, "".join(rng.choice(list(alpha),
                                   size=rng.integers(0, 9)).tolist()),
             ["x", "y"][int(rng.integers(0, 2))])
            for i in range(120)]
    df = spark.createDataFrame(rows, "id long, s string, g string")
    import functools

    def lev(a, b):
        @functools.lru_cache(maxsize=None)
        def f(i, j):
            if i == 0:
                return j
            if j == 0:
                return i
            return min(f(i - 1, j) + 1, f(i, j - 1) + 1,
                       f(i - 1, j - 1) + (a[i - 1] != b[j - 1]))
        return f(len(a), len(b))
    for d in (1, 3):
        got = sorted((r.id_a, r.id_b, r.dist) for r in
                     fuzzy.edit_distance_pairs(
                         df, "id", "s", d=d, group_cols=["g"])
                     .collect())
        want = sorted((i, j, lev(a, b))
                      for i, a, ga in rows for j, b, gb in rows
                      if i < j and ga == gb and lev(a, b) <= d)
        assert got == want, f"d={d}"


def test_entity_resolution_cluster_shapes(spark):
    """Fuzzy edges + converged CC resolve surface forms into
    entities: two chains that must merge transitively, one exact-dup
    clique, one singleton (never emitted — no edges)."""
    from pointdatabase_spark.operators import dedup as _d
    from pointdatabase_spark.operators import fuzzy
    rows = [(1, "acme corp"), (2, "acme corp."), (3, "acme  corp."),
            (4, "globex"), (5, "globex"), (6, "globex"),
            (7, "unrelated industries")]
    df = spark.createDataFrame(rows, "id long, name string")
    pairs = fuzzy.edit_distance_pairs(df, "id", "name", d=2)
    lab = {r.doc_id: r.cluster_id
           for r in _d.duplicate_clusters_converged(pairs).collect()}
    assert lab == {1: 1, 2: 1, 3: 1, 4: 4, 5: 4, 6: 4}


def test_snm_audit_multi_pass_recall(spark):
    """The forward key alone misses a first-character edit (sorts far
    apart); the reverse pass catches it. Candidates counted after
    cross-pass dedup."""
    from pointdatabase_spark.operators import fuzzy
    # 'azzzz9' / 'bzzzz9': lev 1, first char differs -> far apart in
    # forward order ('b?pad?' rows sort between them), adjacent
    # reversed ('9zzzz?' vs '?dap?b' digit-prefixed pads).
    rows = ([(1, "azzzz9"), (2, "bzzzz9")]
            + [(10 + i, f"b{c}pad{i}") for i, c in
               enumerate("abcdefghi")])
    df = spark.createDataFrame(rows, "id long, name string")
    one = fuzzy.snm_candidate_audit(df, "id", "name", d=1, window=2,
                                    key_exprs=["s"]).collect()[0]
    two = fuzzy.snm_candidate_audit(df, "id", "name", d=1,
                                    window=2).collect()[0]
    assert one.n_true == 1 and one.n_found == 0
    assert two.n_true == 1 and two.n_found == 1
    assert two.recall_ppm == 1000000


def test_snm_audit_four_pass_increments_on_part(spark):
    """Per-pass recall on the real part fixture (sf0.001), pinned:
    forward key 0/24 (edits are mid-string), + reverse 16/24,
    + sorted-token 20/24, + rest-of-string 24/24 (r12: the 4
    residual misses were first-token edits whose token also led the
    sorted view — dropping the first token makes those keys
    identical) — the measured ladder that justifies the
    snm_blocking_audit key set (the same numbers hold at sf0.01)."""
    from pointdatabase_spark import testkit
    from pointdatabase_spark.operators import fuzzy
    part = testkit.load_table(spark, "/root/testdata/sf0.001", "part")
    keys = ["s", "reverse(s)",
            "array_join(array_sort(split(s, ' ')), ' ')",
            "substring(s, instr(s, ' ') + 1)"]
    found = []
    for i in (1, 2, 3, 4):
        row = fuzzy.snm_candidate_audit(
            part, "p_partkey", "p_name", d=2, window=5,
            key_exprs=keys[:i]).collect()[0]
        assert row.n_true == 24
        found.append(row.n_found)
    assert found == [0, 16, 20, 24]


def test_systematic_pps_exact_k_and_multiplicity(spark):
    """Sum of n_hits is exactly k on any layout; a row heavier than
    W/k is selected with multiplicity; zero/negative weights drop."""
    from pyspark.sql import functions as F
    from pointdatabase_spark.operators import sampling
    rows = [(i, 10) for i in range(50)] + [(999, 1000), (998, 0),
                                           (997, -5)]
    df = spark.createDataFrame(rows, "id long, w long")
    out = sampling.systematic_pps(df, "id", "w", k=15)
    got = {r.id: r.n_hits for r in out.collect()}
    assert sum(got.values()) == 15
    # heavy row owns 1000/1500 of the line -> ~2/3 of the thresholds
    assert got[999] >= 9
    assert 998 not in got and 997 not in got
    # layout-independence: same result after an adversarial reshuffle
    got2 = {r.id: r.n_hits for r in sampling.systematic_pps(
        df.repartition(7, "w"), "id", "w", k=15).collect()}
    assert got2 == got
    # exact-k across k values, including k > n_rows
    for k in (1, 7, 200):
        s = (sampling.systematic_pps(df, "id", "w", k=k)
             .agg(F.sum("n_hits")).collect()[0][0])
        assert s == k, f"k={k}"


def test_systematic_pps_overflow_guard_fires(spark):
    """k·W >= 2^62 would wrap the BIGINT hit-count numerator
    silently; the in-plan assert must fail the job loudly instead.
    Fixture: two rows of weight 2^61 -> W = 2^62 (itself in-range),
    k=4 -> (2k+1)·W = 9·2^62 > 2^63-1."""
    import pytest
    from pointdatabase_spark.operators import sampling
    big = spark.createDataFrame([(1, 1 << 61), (2, 1 << 61)],
                                "id long, w long")
    with pytest.raises(Exception, match="systematic_pps"):
        sampling.systematic_pps(big, "id", "w", k=4).collect()
    # just inside the bound: k=1, (2k+1)*W = 3*2^62 < 2^63... no —
    # 3*2^62 = 1.5*2^63 overflows too; use W = 2^60 so 3*W fits.
    ok = spark.createDataFrame([(1, 1 << 59), (2, 1 << 59)],
                               "id long, w long")
    got = {r.id: r.n_hits for r in sampling.systematic_pps(
        ok, "id", "w", k=2).collect()}
    assert sum(got.values()) == 2


def test_cosine_neardup_tiny_corpus_no_duplicate_pairs(spark):
    """r11 distributed block-matmul edge case: with a corpus smaller
    than the block count, most blocks are EMPTY and every cross group
    (i, j) with an empty j side exists with left rows only — it must
    emit nothing (misclassifying it as diagonal re-emits block i's
    within-block pairs once per empty partner). Exactly one pair, no
    duplicates."""
    from pointdatabase_spark.operators import similarity
    rows = [(1, [1.0, 0.0, 0.0]), (2, [0.999, 0.01, 0.0]),
            (3, [0.0, 1.0, 0.0])]
    df = spark.createDataFrame(rows,
                               "vec_id long, embedding array<double>")
    out = similarity.cosine_neardup_pairs(df, threshold=0.9).collect()
    assert sorted((r.id_a, r.id_b) for r in out) == [(1, 2)]


def test_range_row_number_matches_global_window(spark):
    """The stitched rank (slice offset + slice-local row_number) is
    bit-identical to the banned global Window.orderBy form — on any
    layout, with and without group columns — and its executed plan
    has no single-partition ordered window (the r12 closure of the
    vocabulary-rank allowlist)."""
    import re
    from pyspark.sql.window import Window
    from pointdatabase_spark.operators import ranking
    rows = [(f"g{i % 3}", f"k{(i * 37) % 101:03d}", i) for i in range(101)]
    df = spark.createDataFrame(rows, "g string, k string, id long")
    # global (no groups): unique key column
    want = {r.k: r.r for r in df.withColumn(
        "r", F.row_number().over(Window.orderBy("k", "id"))).collect()}
    ranked, cache = ranking.range_row_number(
        df.repartition(7, "id"), ["k", "id"], out_col="r")
    plan = ranked._jdf.queryExecution().executedPlan().toString()
    got = {r.k: r.r for r in ranked.collect()}
    cache.unpersist()
    assert got == want
    hits = [m.group(1) for m in re.finditer(
        r"windowspecdefinition\((\w+)#\d+L? (?:ASC|DESC)", plan)]
    assert all(h in ("_pid", "bk") for h in hits), hits
    # per-group: rank restarts at 1 inside each g
    wantg = {(r.g, r.k): r.r for r in df.withColumn(
        "r", F.row_number().over(
            Window.partitionBy("g").orderBy("k", "id"))).collect()}
    rankedg, cacheg = ranking.range_row_number(
        df.repartition(5, "k"), ["k", "id"], group_cols=["g"],
        out_col="r")
    gotg = {(r.g, r.k): r.r for r in rankedg.collect()}
    cacheg.unpersist()
    assert gotg == wantg


def test_range_prefix_max_matches_global_window(spark):
    """Strict-prefix running max via slice stitching is bit-identical
    to the global ordered window: NULL on the first row, greatest of
    (earlier-slice max, slice-local prefix max) elsewhere — including
    an anti-diagonal layout where EVERY row is a new maximum and a
    descending layout where the first row's max is never beaten."""
    from pyspark.sql.window import Window
    from pointdatabase_spark.operators import ranking
    for ys in ([float(i) for i in range(97)],              # ascending
               [float(97 - i) for i in range(97)],         # descending
               [float((i * 53) % 97) for i in range(97)]): # shuffled
        df = spark.createDataFrame(
            [(float(i), y) for i, y in enumerate(ys)], "x double, y double")
        w = (Window.orderBy("x")
             .rowsBetween(Window.unboundedPreceding, -1))
        want = {r.x: r.pm for r in df.withColumn(
            "pm", F.max("y").over(w)).collect()}
        swept, cache = ranking.range_prefix_max(
            df.repartition(9), ["x"], "y", out_col="pm")
        got = {r.x: r.pm for r in swept.collect()}
        cache.unpersist()
        assert got == want


def test_pareto_anti_diagonal_no_single_partition_sweep(spark):
    """The adversarial skyline layout (every point on the frontier:
    size rises with price, so no point dominates any other and the
    grid prune removes nothing) now runs with NO single-partition
    ordered window in the executed plan (r12: the stage-3 sweep is
    range-sliced prefix-max stitching) — and still returns every
    point."""
    import re
    from pointdatabase_spark.operators import olap
    n = 500
    df = spark.createDataFrame(
        [(i, float(i), float(i)) for i in range(n)],
        "id long, price double, size double")
    out = olap.pareto_frontier(df, "price", "size")
    plan = out._jdf.queryExecution().executedPlan().toString()
    hits = [m.group(1) for m in re.finditer(
        r"windowspecdefinition\((\w+)#\d+L? (?:ASC|DESC)", plan)]
    assert all(h in ("_pid", "bk") for h in hits), hits
    assert out.count() == n


def test_cosine_neardup_block_count_identity(spark):
    """n_blocks only partitions the pair space — every unordered pair
    lands in exactly one block-pair group for ANY B — so non-default
    block counts (including B=1, one diagonal group, and B larger
    than the corpus, mostly-empty groups) are bit-identical."""
    import random
    from pointdatabase_spark.operators import similarity
    rng = random.Random(7)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(16)])
            for i in range(60)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    want = sorted((r.id_a, r.id_b, r.cos) for r in
                  similarity.cosine_neardup_pairs(df, 0.5).collect())
    assert want, "fixture must produce pairs"
    for b in (1, 3, 97):
        got = sorted((r.id_a, r.id_b, r.cos) for r in
                     similarity.cosine_neardup_pairs(
                         df, 0.5, n_blocks=b).collect())
        assert got == want, f"n_blocks={b}"


def test_cosine_neardup_auto_block_floor(spark):
    """n_blocks=None derives B from the corpus count (floor 8) and
    stays bit-identical to the explicit default."""
    import random
    from pointdatabase_spark.operators import similarity
    rng = random.Random(11)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(8)])
            for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    want = sorted((r.id_a, r.id_b, r.cos) for r in
                  similarity.cosine_neardup_pairs(df, 0.4).collect())
    got = sorted((r.id_a, r.id_b, r.cos) for r in
                 similarity.cosine_neardup_pairs(
                     df, 0.4, n_blocks=None).collect())
    assert got == want and want


def test_scd2_history_hand_case(spark):
    """SCD2 reconstruction semantics pinned on a hand log: run
    collapse, half-open [from, to) chaining, NULL valid_to on the
    current row, 1-based version ordinal, null-safe state comparison
    (NULL == NULL is not a change), tied timestamps resolved by the
    tiebreak, and a singleton key."""
    from pointdatabase_spark.operators import temporal
    rows = [
        # user 1: A,A (collapse) -> B -> A again (new run, not merged)
        (1, 10, "A", 1), (1, 20, "A", 2), (1, 30, "B", 3),
        (1, 40, "A", 4),
        # user 2: NULL -> NULL (no change) -> X; tie at ts=10 broken
        # by event_id (NULL first, then still NULL: one run)
        (2, 10, None, 1), (2, 10, None, 2), (2, 50, "X", 3),
        # user 3: singleton
        (3, 5, "Z", 1),
    ]
    df = spark.createDataFrame(
        rows, "uid long, tus long, state string, eid long")
    out = temporal.scd2_history(
        df, keys=["uid"], state_cols=["state"], ts_col="tus",
        tiebreak=["eid"])
    rows_out = {(r.uid, r.version):
                (r.state, r.valid_from, r.valid_to, r.n_rows)
                for r in out.collect()}
    assert rows_out == {
        (1, 1): ("A", 10, 30, 2),
        (1, 2): ("B", 30, 40, 1),
        (1, 3): ("A", 40, None, 1),
        (2, 1): (None, 10, 50, 2),
        (2, 2): ("X", 50, None, 1),
        (3, 1): ("Z", 5, None, 1),
    }


def test_range_prefix_sum_matches_global_window(spark):
    """Inclusive running sum via slice stitching is bit-identical to
    the grouped ordered window on any layout, with and without
    groups."""
    from pyspark.sql.window import Window
    from pointdatabase_spark.operators import ranking
    rows = [(f"g{i % 3}", (i * 37) % 101, i, (i * 13) % 7 + 1)
            for i in range(101)]
    df = spark.createDataFrame(rows, "g string, k long, id long, v long")
    w = (Window.partitionBy("g").orderBy("k", "id")
         .rowsBetween(Window.unboundedPreceding, 0))
    want = {(r.g, r.k, r.id): r.run for r in df.withColumn(
        "run", F.sum("v").over(w)).collect()}
    swept, cache = ranking.range_prefix_sum(
        df.repartition(7, "id"), ["k", "id"], "v",
        group_cols=["g"], out_col="run")
    got = {(r.g, r.k, r.id): r.run for r in swept.collect()}
    cache.unpersist()
    assert got == want
    wg = (Window.orderBy("k", "id")
          .rowsBetween(Window.unboundedPreceding, 0))
    want2 = {(r.k, r.id): r.run for r in df.withColumn(
        "run", F.sum("v").over(wg)).collect()}
    swept2, cache2 = ranking.range_prefix_sum(
        df.repartition(5, "g"), ["k", "id"], "v", out_col="run")
    got2 = {(r.k, r.id): r.run for r in swept2.collect()}
    cache2.unpersist()
    assert got2 == want2


def test_bounded_rank_matches_window(spark):
    """bounded_rank (window-free O(k²) self-join) == row_number over
    (score DESC, id ASC) on a list with score ties."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F
    from pointdatabase_spark.operators import retrieval
    rows = [(i, float(v)) for i, v in
            enumerate([5, 3, 5, 1, 3, 3, 9, 1, 7, 7])]
    lst = spark.createDataFrame(rows, "doc_id long, s double")
    got = {r["doc_id"]: r["rank"] for r in
           retrieval.bounded_rank(lst, "s", "doc_id").collect()}
    win = Window.orderBy(F.col("s").desc(), F.col("doc_id"))
    exp = {r["doc_id"]: r["rank"] for r in
           lst.withColumn("rank", F.row_number().over(win)).collect()}
    assert got == exp
    asc = {r["doc_id"]: r["rank"] for r in
           retrieval.bounded_rank(lst, "s", "doc_id",
                                  descending=False).collect()}
    win2 = Window.orderBy(F.col("s"), F.col("doc_id"))
    exp2 = {r["doc_id"]: r["rank"] for r in
            lst.withColumn("rank", F.row_number().over(win2)).collect()}
    assert asc == exp2


def test_rrf_fuse_hand_computed(spark):
    """RRF contributions: doc in both lists sums both reciprocals;
    single-list docs carry n_lists=1."""
    from pointdatabase_spark.operators import retrieval
    l1 = spark.createDataFrame([(10, 1), (11, 2)],
                               "doc_id long, rank long")
    l2 = spark.createDataFrame([(11, 1), (12, 2)],
                               "doc_id long, rank long")
    out = {r["doc_id"]: (r["rrf"], r["n_lists"]) for r in
           retrieval.rrf_fuse([l1, l2], k0=60).collect()}

    def q9(x):
        return math.floor(x * 1e9 + 0.5) / 1e9

    assert out[10] == (q9(1 / 61), 1)
    assert out[11] == (q9(1 / 62 + 1 / 61), 2)
    assert out[12] == (q9(1 / 62), 1)


def test_inverted_index_champion_and_min_df(spark):
    from pointdatabase_spark.operators import retrieval
    docs = spark.createDataFrame(
        [(5, "a a b"), (2, "a a c"), (9, "a b c")],
        "doc_id long, text string")
    idx = {r["tok"]: r for r in
           retrieval.build_inverted_index(docs).collect()}
    # 'a': df=3, cf=5; tf tie (2,2) between docs 5 and 2 -> smallest id
    assert (idx["a"]["df"], idx["a"]["cf"]) == (3, 5)
    assert (idx["a"]["top_doc"], idx["a"]["top_tf"]) == (2, 2)
    # 'b': docs 5 and 9, tf tie 1 -> doc 5
    assert (idx["b"]["df"], idx["b"]["top_doc"], idx["b"]["top_tf"]) \
        == (2, 5, 1)
    only = retrieval.build_inverted_index(docs, min_df=3)
    assert {r["tok"] for r in only.collect()} == {"a"}


def test_phrase_count_three_terms_and_overlap(spark):
    """The n-term join loop: overlapping occurrences both count
    ('a b a b a' contains 'a b a' at positions 0 AND 2); docs without
    the full phrase are absent."""
    from pointdatabase_spark.operators import retrieval
    docs = spark.createDataFrame(
        [(0, "a b a b a"),     # 'a b a' at 0 and 2
         (1, "a b c a b a"),   # at 3
         (2, "a b b a"),       # prefix 'a b' only -> absent
         (3, "c c c")],
        "doc_id long, text string")
    out = {r["doc_id"]: r["n_occ"] for r in
           retrieval.phrase_count(docs, ["a", "b", "a"]).collect()}
    assert out == {0: 2, 1: 1}
    import pytest as _pytest
    with _pytest.raises(ValueError):
        retrieval.phrase_count(docs, ["a"])


def test_inverted_index_id_guard_fires(spark):
    """The in-plan uint32 id guard (systematic_pps overflow-guard
    pattern): an out-of-range doc id fails the build loudly instead
    of silently misordering the packed champion argmax."""
    from pointdatabase_spark.operators import retrieval
    docs = spark.createDataFrame([(-1, "a b"), (2, "a")],
                                 "doc_id long, text string")
    import pytest as _pytest
    with _pytest.raises(Exception, match=r"outside \[0, 2\^32\)"):
        retrieval.build_inverted_index(docs).collect()


def test_rater_agreement_hand_case(spark):
    """Known 2x2 kappa: n=100, both_keep=40, a_only=10, b_only=10,
    both_drop=40 -> p_o=0.8, p_e=0.5, kappa=0.6 exactly."""
    from pointdatabase_spark.operators.profile import rater_agreement
    rows = ([(True, True)] * 40 + [(True, False)] * 10
            + [(False, True)] * 10 + [(False, False)] * 40)
    df = spark.createDataFrame(rows, "a boolean, b boolean")
    r = rater_agreement(df, "a", "b").collect()[0]
    assert (r["n"], r["both_keep"], r["a_only"], r["b_only"],
            r["both_drop"]) == (100, 40, 10, 10, 40)
    assert r["po_ppm"] == 800000
    assert r["kappa_ppm"] == 600000
    # degenerate: both raters constant-true -> den=0 -> kappa 1
    one = spark.createDataFrame([(True, True)] * 5,
                                "a boolean, b boolean")
    assert rater_agreement(one, "a", "b").collect()[0]["kappa_ppm"] \
        == 1000000
    # chance-level: independent 50/50 raters -> kappa 0
    ch = spark.createDataFrame(
        [(True, True), (True, False), (False, True), (False, False)],
        "a boolean, b boolean")
    assert rater_agreement(ch, "a", "b").collect()[0]["kappa_ppm"] == 0


def test_calibration_bins_hand_case(spark):
    """Bin edges over (-1,1): score -1+eps -> bin 0, 0 -> bin 5,
    0.99 -> bin 9; pos_ppm is exact integer ppm."""
    from pointdatabase_spark.operators.classify import calibration_bins
    rows = [(-0.95, True), (-0.95, False), (0.0, True),
            (0.99, True), (0.99, True), (0.99, False)]
    df = spark.createDataFrame(rows, "score_q double, lab boolean")
    out = {r["bin"]: r for r in
           calibration_bins(df, "lab", n_bins=10).collect()}
    assert set(out) == {0, 5, 9}
    assert out[0]["n"] == 2 and out[0]["pos_ppm"] == 500000
    assert out[0]["sum_score_micro"] == -1900000
    assert out[5]["n"] == 1 and out[5]["pos_ppm"] == 1000000
    assert out[9]["n"] == 3 and out[9]["pos_ppm"] == 666666
    assert out[9]["sum_score_micro"] == 2970000


def test_append_text_index_serves_identically(spark, tmp_path):
    """An index maintained by append_text_index serves BIT-identically
    to one built from the full corpus at once (exact-integer stats +
    BIGINT df merge), and appending never rewrites stored postings
    (base posting files survive untouched)."""
    import glob
    import struct
    from pointdatabase_spark import testkit
    from pointdatabase_spark.operators import retrieval
    from tests.conftest import SF_SMOKE
    docs = testkit.load_table(spark, SF_SMOKE, "documents")
    full, inc = str(tmp_path / "full"), str(tmp_path / "inc")
    retrieval.write_text_index(docs, full)
    base = docs.where(F.col("doc_id") % 3 != 2)
    delta = docs.where(F.col("doc_id") % 3 == 2)
    retrieval.write_text_index(base, inc)
    before = set(glob.glob(f"{inc}/postings/*/*.parquet"))
    retrieval.append_text_index(delta, inc)
    after = set(glob.glob(f"{inc}/postings/*/*.parquet"))
    assert before <= after and len(after) > len(before)
    terms = ["spark", "vector", "stream"]
    def rows(path):
        return sorted(
            (r["doc_id"], struct.pack("<d", r["bm25"]))
            for r in retrieval.bm25_topk_served(
                spark, path, terms, k=20).collect())
    assert rows(full) == rows(inc) and len(rows(full)) == 20


def test_psi_drift_hand_case(spark):
    """PSI on a hand split: group A = values 0..9 (one per pooled
    bucket at buckets=10 when B mirrors), B shifted — verify the
    smoothed formula against a pure-Python mirror."""
    import math as m
    from pointdatabase_spark.operators.profile import psi_drift
    rows = ([("a", float(v)) for v in range(10) for _ in range(10)]
            + [("b", float(v) + 0.5) for v in range(10)
               for _ in range(10)])
    df = spark.createDataFrame(rows, "g string, v double")
    out = {r["bucket"]: r for r in
           psi_drift(df, "g", "v", buckets=10).collect()}
    ta = sum(r["n_a"] for r in out.values())
    tb = sum(r["n_b"] for r in out.values())
    assert ta == tb == 100
    for b, r in out.items():
        pa = (r["n_a"] + 0.5) / (ta + 5.0)
        pb = (r["n_b"] + 0.5) / (tb + 5.0)
        exp = m.floor((pa - pb) * m.log(pa / pb) * 1e9 + 0.5) / 1e9
        assert r["psi_q"] == exp, (b, r["psi_q"], exp)
        assert r["psi_q"] >= 0.0
    # identical distributions -> every contribution ~0 (exactly 0
    # when counts match per bucket)
    same = spark.createDataFrame(
        [("a", float(v)) for v in range(10)]
        + [("b", float(v)) for v in range(10)], "g string, v double")
    z = psi_drift(same, "g", "v", buckets=10)
    assert all(r["psi_q"] == 0.0 for r in z.collect())


def test_proximity_count_slop_semantics(spark):
    """slop=0 equals exact phrase_count; slop widens matches; chain
    counting verified on a hand fixture (overlapping chains all
    count)."""
    from pointdatabase_spark.operators import retrieval
    docs = spark.createDataFrame(
        [(0, "a x b"),        # a..b gap 1: only slop>=1
         (1, "a b"),          # adjacent: any slop
         (2, "b a"),          # wrong order: never
         (3, "a x x b"),      # gap 2: slop>=2
         (4, "a b b")],       # chains a->b(1) and a->b(2) at slop>=1
        "doc_id long, text string")
    s0 = {r["doc_id"]: r["n_chains"] for r in
          retrieval.proximity_count(docs, ["a", "b"], 0).collect()}
    ph = {r["doc_id"]: r["n_occ"] for r in
          retrieval.phrase_count(docs, ["a", "b"]).collect()}
    assert s0 == ph == {1: 1, 4: 1}
    s1 = {r["doc_id"]: r["n_chains"] for r in
          retrieval.proximity_count(docs, ["a", "b"], 1).collect()}
    assert s1 == {0: 1, 1: 1, 4: 2}
    s2 = {r["doc_id"]: r["n_chains"] for r in
          retrieval.proximity_count(docs, ["a", "b"], 2).collect()}
    assert s2 == {0: 1, 1: 1, 3: 1, 4: 2}
    import pytest as _pytest
    with _pytest.raises(ValueError):
        retrieval.proximity_count(docs, ["a", "b"], -1)


def test_bm25_batch_single_query_equals_served(spark, tmp_path):
    """A 1-query batch through bm25_batch_served equals the
    single-query bm25_topk_served bit-for-bit (same contributions,
    same rounded-rank convention), and the plan cuts per query with
    WindowGroupLimit."""
    import struct
    from pointdatabase_spark import testkit
    from pointdatabase_spark.operators import retrieval
    from tests.conftest import SF_SMOKE
    docs = testkit.load_table(spark, SF_SMOKE, "documents")
    path = str(tmp_path / "idx")
    retrieval.write_text_index(docs, path)
    terms = ["spark", "vector", "stream"]
    qdf = spark.createDataFrame([(7, t) for t in terms],
                                "q_id long, term string")
    batch = retrieval.bm25_batch_served(spark, path, qdf, k=20)
    single = retrieval.bm25_topk_served(spark, path, terms, k=20)
    b = sorted((r["doc_id"], struct.pack("<d", r["bm25"]))
               for r in batch.collect())
    s = sorted((r["doc_id"], struct.pack("<d", r["bm25"]))
               for r in single.collect())
    assert b == s and len(b) == 20
    assert all(r["q_id"] == 7 for r in batch.collect())
    plan = batch._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan


def test_leakage_safe_split_no_cluster_straddle(spark):
    """On the planted-duplicate corpus: splitting by the cluster
    fingerprint means NO duplicate cluster straddles splits (the
    doc-id split DOES straddle — demonstrating the leak it fixes),
    and every duplicated text's copies land together."""
    from pointdatabase_spark import testkit
    from pointdatabase_spark.operators import sampling as samp
    from tests.conftest import SF_SMOKE
    c = testkit.syn_corpus(spark, SF_SMOKE)
    d = c.withColumn("fp", F.md5(F.coalesce(F.col("text"), F.lit(""))))
    splits = [("train", 0.8), ("val", 0.1), ("test", 0.1)]
    safe = samp.hash_split(d, splits, id_col="fp", salt="ls1")
    straddle = (safe.groupBy("fp")
                .agg(F.countDistinct("split").alias("ns"))
                .where("ns > 1").count())
    assert straddle == 0
    # the corpus really has multi-doc clusters (planted dups) …
    multi = (d.groupBy("fp").count().where("count > 1").count())
    assert multi > 0
    # … and the naive doc-id split DOES leak them across splits
    naive = samp.hash_split(d, splits, id_col="doc_id", salt="ls1")
    leaked = (naive.groupBy("fp")
              .agg(F.countDistinct("split").alias("ns"))
              .where("ns > 1").count())
    assert leaked > 0


def test_length_bucketed_batches_semantics(spark):
    """Bucket = exact bit-length of token count (within-2x lengths);
    batches fixed-size in hash order; batch ids never cross buckets;
    adversarial repartition leaves assignment bit-identical."""
    from pointdatabase_spark.operators import sampling as samp
    rows = [(i, 1 << (i % 6)) for i in range(200)]  # lengths 1..32
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    out = samp.length_bucketed_batches(df, batch_size=4).collect()
    for r in out:
        assert r["bucket"] == (r["n_tokens"]).bit_length() - 1
        assert r["batch_id"] // 4294967296 == r["bucket"]
    from collections import Counter
    per_batch = Counter(r["batch_id"] for r in out)
    # every batch full except at most one remainder per bucket
    from collections import defaultdict
    by_bucket = defaultdict(list)
    for b, n in per_batch.items():
        by_bucket[b // 4294967296].append(n)
    for sizes in by_bucket.values():
        assert sum(1 for n in sizes if n != 4) <= 1
        assert all(n <= 4 for n in sizes)
    # layout-independence
    again = {(r["doc_id"], r["batch_id"])
             for r in samp.length_bucketed_batches(
                 df.repartition(13), batch_size=4).collect()}
    assert again == {(r["doc_id"], r["batch_id"]) for r in out}
    import pytest as _pytest
    with _pytest.raises(ValueError):
        samp.length_bucketed_batches(df, batch_size=0)


def test_simhash_banding_recall_is_exact(spark):
    """The pigeonhole theorem as a regression test: with bands >
    max_hamming, byte-band blocking finds EVERY pair within the
    hamming radius — banded pairs == brute-force pairs over all
    signatures (recall exactly 1.0, not approximately; a band-count
    or mask regression would break equality)."""
    from pointdatabase_spark import testkit
    from pointdatabase_spark.operators import dedup
    from tests.conftest import SF_SMOKE
    docs = testkit.syn_corpus(spark, SF_SMOKE)
    banded = {(r["id_a"], r["id_b"], r["hamming"])
              for r in dedup.simhash_neardup(docs).collect()}
    sig = dedup.simhash(docs)
    a, b = sig.alias("a"), sig.alias("b")
    brute = {(r["id_a"], r["id_b"], r["hamming"]) for r in
             (a.join(b, F.col("a.id") < F.col("b.id"))
              .select(F.col("a.id").alias("id_a"),
                      F.col("b.id").alias("id_b"),
                      F.expr("CAST(bit_count(a.simhash ^ b.simhash) "
                             "AS BIGINT)").alias("hamming"))
              .where(F.col("hamming") <= 3)).collect()}
    assert banded == brute
    assert len(brute) > 0  # the planted near-dups give signal


def test_boolean_search_hand_case(spark, tmp_path):
    """AND/NOT semantics on a hand corpus: both must terms required
    (in any order, any distance), any must_not occurrence excludes;
    sum_tf totals the must terms' frequencies."""
    from pointdatabase_spark.operators import retrieval
    docs = spark.createDataFrame(
        [(0, "a b a"),       # both, a twice -> sum_tf 3
         (1, "b x a"),       # both -> 2
         (2, "a a a"),       # missing b
         (3, "a b bad"),     # excluded by NOT
         (4, "x y z")],
        "doc_id long, text string")
    path = str(tmp_path / "idx")
    retrieval.write_text_index(docs, path)
    out = {r["doc_id"]: r["sum_tf"] for r in
           retrieval.boolean_search_served(
               spark, path, ["a", "b"], ["bad"]).collect()}
    assert out == {0: 3, 1: 2}
    # no must_not: doc 3 returns
    out2 = {r["doc_id"]: r["sum_tf"] for r in
            retrieval.boolean_search_served(
                spark, path, ["a", "b"]).collect()}
    assert out2 == {0: 3, 1: 2, 3: 2}
    import pytest as _pytest
    with _pytest.raises(ValueError):
        retrieval.boolean_search_served(spark, path, [])


def test_facet_counts_served_hand_case(spark, tmp_path):
    """Faceted OR-query counts: a doc counts once per facet however
    many query terms it matches; non-matching docs absent."""
    from pointdatabase_spark.operators import retrieval
    docs = spark.createDataFrame(
        [(0, "a b", "en"), (1, "a a a", "en"), (2, "b", "de"),
         (3, "x", "de"), (4, "a", "fr")],
        "doc_id long, text string, lang string")
    path = str(tmp_path / "idx")
    retrieval.write_text_index(docs, path, facet_cols=("lang",))
    out = {r["facet"]: r["n_docs"] for r in
           retrieval.facet_counts_served(
               spark, path, ["a", "b"], "lang").collect()}
    assert out == {"en": 2, "de": 1, "fr": 1}


def test_text_index_stats_derivation_identities(spark, tmp_path):
    """r12 single-pass build: stats/dfreq DERIVE from the written
    postings (n_docs = distinct posting ids, sum_dl = SUM(tf), df =
    posting count per term). Pin the derived values against the
    direct corpus computation the pre-r12 build ran — including a
    doc with empty/NULL text (split('') -> [''] keeps every doc
    represented in the postings)."""
    from pointdatabase_spark.operators import retrieval
    from pointdatabase_spark import testkit
    from tests.conftest import SF_SMOKE
    docs = (testkit.load_table(spark, SF_SMOKE, "documents")
            .select("doc_id", "text")
            .union(spark.createDataFrame(
                [(990001, ""), (990002, None)],
                "doc_id long, text string")))
    path = str(tmp_path / "idx")
    retrieval.write_text_index(docs, path)
    stats = spark.read.parquet(f"{path}/stats").collect()[0]
    toks = F.split(F.lower(F.coalesce(F.col("text"), F.lit(""))),
                   r"\s+")
    direct = docs.select(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.size(toks).cast("long")).cast("long").alias("sum_dl")
    ).collect()[0]
    assert (stats["n_docs"], stats["sum_dl"]) == \
        (direct["n_docs"], direct["sum_dl"])
    # df per term == number of docs containing it (direct recount)
    got_df = {(r["tok"]): r["df"] for r in
              spark.read.parquet(f"{path}/dfreq").collect()}
    exp_df = {r["tok"]: r["n"] for r in
              docs.select(F.col("doc_id"),
                          F.explode(F.array_distinct(toks)).alias("tok"))
              .groupBy("tok").agg(F.count(F.lit(1)).alias("n"))
              .collect()}
    assert got_df == exp_df


def test_minhash_verify_jaccard_join_identical(spark):
    """r12 audit kernel: minhash_neardup verified through a
    precomputed pair-Jaccard table (posting-count intersections) must
    emit the IDENTICAL pair set and bit-identical jaccard doubles as
    the shingle-array jaccard_verify path."""
    import struct
    from pointdatabase_spark.operators import dedup
    from pointdatabase_spark import testkit
    sf = "/root/testdata/sf0.001"
    corpus = testkit.syn_corpus(spark, sf)
    sh = dedup.shingle_sets(corpus).persist()
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
                   .alias("jaccard")))
    def rows(df):
        return sorted((r["id_a"], r["id_b"],
                       struct.pack("<d", r["jaccard"]))
                      for r in df.collect())
    via_join = rows(dedup.minhash_neardup(corpus, shingles=sh,
                                          verify_jaccard=jac))
    via_arrays = rows(dedup.minhash_neardup(corpus, shingles=sh))
    sh.unpersist()
    assert via_join == via_arrays and len(via_join) > 0
