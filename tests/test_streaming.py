"""Structured Streaming ingest: availableNow drain, exactly-once file
tracking across restarts, and the watermark-withheld final window."""

from __future__ import annotations

import pandas as pd

from pointdatabase_spark.streaming import ingest


def test_ingest_availablenow_incremental(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq
    landing = tmp_path / "landing"
    landing.mkdir()
    dst = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    pq.write_table(pa.table({"row_id": [1, 2], "x": [1.0, 2.0]}),
                   landing / "f1.parquet")
    landing = str(landing)
    schema = spark.read.parquet(landing).schema

    ingest.ingest_availablenow(spark, landing, "*", schema, dst, ckpt)
    assert spark.read.parquet(dst).count() == 2

    # second batch of files lands; re-run drains ONLY the new ones
    import pyarrow as pa
    import pyarrow.parquet as pq
    pq.write_table(pa.table({"row_id": [3, 4, 5], "x": [3.0, 4.0, 5.0]}),
                   landing + "/f2.parquet")
    ingest.ingest_availablenow(spark, landing, "*", schema, dst, ckpt)
    out = spark.read.parquet(dst)
    assert out.count() == 5
    assert sorted(r.row_id for r in out.collect()) == [1, 2, 3, 4, 5]


def test_stateful_sessionization_withholds_open_sessions(spark):
    from pointdatabase_spark import testkit
    from pointdatabase_spark.functions import timeconv
    from pointdatabase_spark.streaming import sessions as S
    GAP = 6 * 3600 * 1000000
    sf = "/root/testdata/sf0.001"
    ev = testkit.load_table(spark, sf, "events")
    ev = ev.select("user_id", timeconv.events_tus(ev).alias("tus"), "value")
    batch = S.sessionize(ev, GAP).toPandas()
    closed = S.run_sessionize_stateful_availablenow(spark, sf, GAP).toPandas()
    # every emitted session agrees with the batch result exactly
    b = batch.set_index(["user_id", "session_start"])
    c = closed.set_index(["user_id", "session_start"])
    j = c.join(b, how="left", rsuffix="_b")
    assert j["session_end_b"].notna().all()
    assert (j["session_end"] == j["session_end_b"]).all()
    assert (j["n_events"] == j["n_events_b"]).all()
    # withheld = each user's final session still open at the watermark
    withheld = b.index.difference(c.index)
    last = batch.loc[batch.groupby("user_id")["session_id"].idxmax()]
    assert set(map(tuple, withheld)) <= set(
        zip(last.user_id, last.session_start))


def test_windowed_counts_watermark_cutoff(spark):
    out = ingest.run_windowed_counts_availablenow(
        spark, "/root/testdata/sf0.001").toPandas()
    # append mode withholds windows newer than max(event_time) − delay:
    # 30 days of events → the last day must be absent, earlier present.
    days = sorted(out.window_start.unique())
    assert len(days) >= 2
    assert str(max(days)) < "2024-01-30"
    # counts are per (window, type) and positive
    assert (out.n_events > 0).all()


def test_stream_into_tiles_incremental(spark, tmp_path):
    """Files land → micro-batches append into the partitioned tile
    store via foreachBatch; second drain adds ONLY the new files, and
    the result equals a batch write of the union."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pointdatabase_spark.sources import tile_store

    landing = tmp_path / "landing"
    landing.mkdir()
    tiles = str(tmp_path / "tiles")
    ckpt = str(tmp_path / "ckpt")

    def granule(path, seed, n=200):
        rng = np.random.default_rng(seed)
        pq.write_table(pa.table({
            "row_id": np.arange(n) + seed * 1000,
            "x": rng.uniform(-150000, 150000, n),
            "y": rng.uniform(-150000, 150000, n),
            "delta_time": np.sort(rng.uniform(0, 1e5, n))}), path)

    granule(landing / "c1.parquet", 1)
    schema = spark.read.parquet(str(landing)).schema
    ingest.stream_into_tiles(spark, str(landing), "*.parquet", schema,
                             tiles, ckpt)
    assert spark.read.parquet(tiles).count() == 200

    granule(landing / "c2.parquet", 2)
    ingest.stream_into_tiles(spark, str(landing), "*.parquet", schema,
                             tiles, ckpt)
    out = spark.read.parquet(tiles)
    assert out.count() == 400
    assert out.select("row_id").distinct().count() == 400
    # layout contract holds: partition columns exist and box query prunes
    assert {"tile_x", "tile_y"} <= set(out.columns)
    box = tile_store.query_box(spark, tiles, (-50000.0, 50000.0),
                               (-50000.0, 50000.0),
                               fields=["row_id", "x", "y"])
    pdf = box.toPandas()
    assert ((pdf.x.abs() <= 55000) & (pdf.y.abs() <= 55000)).all()


def test_stream_exact_dedup_within_watermark(spark, tmp_path):
    """Duplicate keys arriving within the watermark horizon are
    dropped; each distinct key survives exactly once — including dups
    split across drains (state persists via the checkpoint)."""
    import datetime as dt
    import pyarrow as pa
    import pyarrow.parquet as pq

    landing = tmp_path / "landing"
    landing.mkdir()
    dst = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    t0 = dt.datetime(2024, 1, 1)

    def write(path, rows):
        ts, fp, val = zip(*rows)
        pq.write_table(pa.table({
            "ts": pa.array([t0 + dt.timedelta(minutes=m) for m in ts],
                           pa.timestamp("us")),
            "fp": list(fp), "val": list(val)}), path)

    write(landing / "b1.parquet",
          [(0, "a", 1), (1, "b", 2), (2, "a", 3), (3, "c", 4)])
    schema = spark.read.parquet(str(landing)).schema
    out = ingest.run_stream_dedup_availablenow(
        spark, str(landing), "*.parquet", schema, dst, ckpt,
        "ts", "2 hours", ["fp"])
    assert out.count() == 3  # a, b, c — second 'a' dropped

    # second drain: one repeat within horizon (dropped), one new key
    write(landing / "b2.parquet", [(10, "b", 5), (11, "d", 6)])
    out = ingest.run_stream_dedup_availablenow(
        spark, str(landing), "*.parquet", schema, dst, ckpt,
        "ts", "2 hours", ["fp"])
    surv = sorted(r.fp for r in out.collect())
    assert surv == ["a", "b", "c", "d"]


def test_stream_neardup_flags_match_batch_twin(spark):
    """Streaming LSH near-dup flags == the batch gap-session window
    twin (same signatures, same anchor-chain rule), and the planted
    truncated near-dups flag against their originals at the same
    arrival instant."""
    from pointdatabase_spark import queries as Q
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window
    sf = "/root/testdata/sf0.001"
    got = Q.all_queries()["streaming_neardup"](spark, sf)

    # batch twin: inline band keys over the identical corpus, then the
    # gap-session anchor rule as window expressions. The registered
    # query streams the doc_id % 3 = 0 BASE subset (r11 bench trim,
    # base_mod=3) — the twin plants from the same filtered base.
    from pointdatabase_spark.streaming import neardup
    docs = spark.read.parquet(f"{sf}/documents.parquet") \
        .where(F.col("doc_id") % 3 == 0) \
        .select("doc_id", "text")
    corpus = (docs
              .unionByName(docs.where(F.col("doc_id") % 7 == 0)
                           .select((F.col("doc_id") + 100000)
                                   .alias("doc_id"), "text"))
              .unionByName(docs.where(F.col("doc_id") % 11 == 0)
                           .select((F.col("doc_id") + 200000)
                                   .alias("doc_id"),
                                   F.expr("substr(text, 1, length(text)"
                                          " - 15)").alias("text"))))
    band = neardup.inline_band_keys(corpus).withColumn(
        "tus", (F.lit(1) + (F.col("id") % 100000) % 720).cast("long")
        * F.lit(3_600_000_000))
    w = Window.partitionBy("bkey").orderBy("tus", "id")
    hor = Q._STREAM_NEARDUP_HORIZON_US
    sess = band.withColumn(
        "_nf", F.when(F.lag("tus").over(w).isNull()
                      | ((F.col("tus") - F.lag("tus").over(w)) > hor),
                      1).otherwise(0)) \
        .withColumn("sid", F.sum("_nf").over(
            w.rowsBetween(Window.unboundedPreceding, 0)))
    w2 = Window.partitionBy("bkey", "sid").orderBy("tus", "id")
    twin = (sess.withColumn("match_id", F.first("id").over(w2))
            .withColumn("rn", F.row_number().over(w2))
            .where(F.col("rn") > 1)
            .select("bkey", F.col("id").alias("dup_id"), "match_id",
                    "tus"))
    g = sorted(map(tuple, got.collect()))
    t = sorted(map(tuple, twin.collect()))
    assert g == t and len(g) > 0
    # planted near-dups (id + 200000, truncated text) flag against
    # their original for nearly every planted doc (a truncation can
    # destroy every shared band — expected LSH recall, not a bug)
    planted = {r.dup_id for r in got.where(
        (F.col("dup_id") >= 200000)
        & (F.col("match_id") == F.col("dup_id") - 200000)).collect()}
    n_planted = docs.where(F.col("doc_id") % 11 == 0).count()
    assert len(planted) >= 0.8 * n_planted
    # exact copies (+100000) share EVERY band with their original and
    # arrive at the same instant, ordered after it — so each one is
    # flagged (its chain can never start at the copy); the anchor is
    # the original unless an earlier chain member claimed the bucket
    exact_flagged = {r.dup_id for r in got.where(
        (F.col("dup_id") >= 100000) & (F.col("dup_id") < 200000)).collect()}
    n_exact = docs.where((F.col("doc_id") % 7 == 0)
                         & (F.size(F.split("text", r"\s+")) >= 3)).count()
    assert len(exact_flagged) == n_exact
    vs_original = {r.dup_id for r in got.where(
        (F.col("dup_id") >= 100000) & (F.col("dup_id") < 200000)
        & (F.col("match_id") == F.col("dup_id") - 100000)).collect()}
    assert len(vs_original) >= 0.5 * n_exact


def test_rollup_maintenance_incremental_and_late(spark, tmp_path):
    """Continuous-aggregate maintenance: two drained batches (the
    second delivering LATE data into day 1) must leave the stored
    finest rollup identical to a from-scratch batch aggregation, and
    the derived hourly view must merge exactly."""
    import pandas as pd
    from pointdatabase_spark.streaming import rollup as rl

    day = 86_400_000_000
    landing = tmp_path / "landing"
    landing.mkdir()
    rp = str(tmp_path / "rollup")
    ck = str(tmp_path / "ckpt")

    def granule(path, rows):
        pd.DataFrame(rows, columns=["g", "tus", "v"]).to_parquet(path)

    granule(landing / "c1.parquet",
            [("a", 10_000_000, 1.0), ("a", 70_000_000, 2.0),
             ("b", day + 5_000_000, 3.0)])
    schema = spark.read.parquet(str(landing)).schema
    rl.run_rollup_maintenance(spark, str(landing), "*.parquet", schema,
                              rp, ck, keys=["g"], ts="tus", value="v")
    # second batch: new day 2 rows AND a late row into day 1 minute 0
    granule(landing / "c2.parquet",
            [("a", 20_000_000, 7.0), ("b", 2 * day + 1_000_000, 4.0)])
    rl.run_rollup_maintenance(spark, str(landing), "*.parquet", schema,
                              rp, ck, keys=["g"], ts="tus", value="v")

    raw = spark.read.parquet(str(landing))
    from pointdatabase_spark.operators import temporal
    expect = {(r["g"], r["bucket_us"]): (r["n"], r["sum_v"], r["min_v"],
                                         r["max_v"])
              for r in temporal.multires_rollup(
                  raw, "tus", ["g"], "v", [60]).collect()}
    got = {(r["g"], r["bucket_us"]): (r["n"], r["sum_v"], r["min_v"],
                                      r["max_v"])
           for r in rl.read_rollup(spark, rp, ["g"], 60).collect()}
    assert got == expect
    # late row merged into the existing day-1 minute-0 bucket
    assert got[("a", 0)] == (2, 8.0, 1.0, 7.0)
    # derived hourly view == direct hourly aggregation of raw
    hourly = {(r["g"], r["bucket_us"]): (r["n"], r["sum_v"])
              for r in rl.read_rollup(spark, rp, ["g"], 3600).collect()}
    direct = {(r["g"], r["bucket_us"]): (r["n"], r["sum_v"])
              for r in temporal.multires_rollup(
                  raw, "tus", ["g"], "v", [3600]).collect()}
    assert hourly == direct


def test_ann_index_maintenance_idempotent_replay(spark, tmp_path):
    """Re-draining the same landing files with a FRESH checkpoint
    (simulating a crash that lost the offsets, the at-least-once
    worst case) must not duplicate index rows: the per-batch
    anti-join against stored ids in the touched cells makes the
    append idempotent at vec_id granularity, and the served top-k
    stays identical."""
    import numpy as np
    from pointdatabase_spark.operators import similarity as sim
    from pointdatabase_spark.streaming.annindex import (
        run_ann_index_maintenance)
    rng = np.random.default_rng(5)
    rows = [(i, [float(x) for x in rng.normal(size=8)])
            for i in range(60)]
    emb = spark.createDataFrame(rows,
                                "vec_id long, embedding array<double>")
    cents = sim.centroids(4, 8)
    idx = str(tmp_path / "idx")
    landing = str(tmp_path / "landing")
    sim.write_ann_index(emb.where("vec_id >= 30"), idx, cents)
    emb.where("vec_id < 30").repartition(2).write.parquet(landing)
    schema = spark.read.parquet(landing).schema
    run_ann_index_maintenance(spark, landing, "*.parquet", schema, idx,
                              str(tmp_path / "ck1"))
    first = spark.read.parquet(f"{idx}/cells").count()
    assert first == 60
    # replay everything with a fresh checkpoint — no duplicates
    run_ann_index_maintenance(spark, landing, "*.parquet", schema, idx,
                              str(tmp_path / "ck2"))
    assert spark.read.parquet(f"{idx}/cells").count() == 60
    served = sim.ann_topk_against_index(
        spark, idx, emb.where("vec_id < 3"), k=3, nprobe=2).collect()
    inline = sim.ivf_ann_topk(emb, emb.where("vec_id < 3"), k=3,
                              cents=cents, nprobe=2).collect()
    assert sorted(map(tuple, served)) == sorted(map(tuple, inline))


def test_ann_index_maintenance_guard_fails_loud_on_corrupt_index(
        spark, tmp_path):
    """The idempotency guard must distinguish 'cells/ not written
    yet' (fine — fresh index, nothing to dedup against) from a REAL
    read failure.  A corrupt parquet footer in cells/ must fail the
    batch (so the stream retries) rather than silently skipping the
    dedup and appending duplicate vec_ids; after restoring the file,
    a replay with a fresh checkpoint converges to zero duplicates."""
    import numpy as np
    import pytest as _pytest
    from pointdatabase_spark.operators import similarity as sim
    from pointdatabase_spark.streaming.annindex import (
        run_ann_index_maintenance)
    rng = np.random.default_rng(11)
    rows = [(i, [float(x) for x in rng.normal(size=8)])
            for i in range(40)]
    emb = spark.createDataFrame(rows,
                                "vec_id long, embedding array<double>")
    cents = sim.centroids(4, 8)
    idx = str(tmp_path / "idx")
    landing = str(tmp_path / "landing")
    sim.write_ann_index(emb.where("vec_id >= 20"), idx, cents)
    emb.where("vec_id < 20").coalesce(1).write.parquet(landing)
    schema = spark.read.parquet(landing).schema
    # corrupt one stored cell file (truncate its footer)
    import glob as _glob
    victim = sorted(_glob.glob(f"{idx}/cells/cell=*/*.parquet"))[0]
    orig = open(victim, "rb").read()
    with open(victim, "wb") as fh:
        fh.write(orig[: len(orig) // 2])
    with _pytest.raises(Exception):
        run_ann_index_maintenance(spark, landing, "*.parquet", schema,
                                  idx, str(tmp_path / "ck1"))
    # restore and replay (fresh checkpoint = at-least-once worst case)
    with open(victim, "wb") as fh:
        fh.write(orig)
    run_ann_index_maintenance(spark, landing, "*.parquet", schema, idx,
                              str(tmp_path / "ck2"))
    run_ann_index_maintenance(spark, landing, "*.parquet", schema, idx,
                              str(tmp_path / "ck3"))
    got = spark.read.parquet(f"{idx}/cells")
    assert got.count() == 40
    assert got.select("vec_id").distinct().count() == 40


def test_ann_index_maintenance_fresh_index_no_cells_dir(spark, tmp_path):
    """First batch against an index whose cells/ directory does not
    exist yet: the explicit existence probe must take the no-dedup
    path without raising, and the second drain of the same files must
    still converge to unique vec_ids."""
    import numpy as np
    from pointdatabase_spark.operators import similarity as sim
    from pointdatabase_spark.streaming.annindex import (
        run_ann_index_maintenance)
    rng = np.random.default_rng(12)
    rows = [(i, [float(x) for x in rng.normal(size=8)])
            for i in range(20)]
    emb = spark.createDataFrame(rows,
                                "vec_id long, embedding array<double>")
    cents = sim.centroids(3, 8)
    idx = str(tmp_path / "idx")
    landing = str(tmp_path / "landing")
    # write ONLY meta/ (centroids) — no cells/ yet
    sim.write_ann_index(emb.limit(0), idx, cents)
    import shutil, os
    if os.path.exists(f"{idx}/cells"):
        shutil.rmtree(f"{idx}/cells")
    emb.coalesce(1).write.parquet(landing)
    schema = spark.read.parquet(landing).schema
    run_ann_index_maintenance(spark, landing, "*.parquet", schema, idx,
                              str(tmp_path / "ck1"))
    run_ann_index_maintenance(spark, landing, "*.parquet", schema, idx,
                              str(tmp_path / "ck2"))
    got = spark.read.parquet(f"{idx}/cells")
    assert got.count() == 20
    assert got.select("vec_id").distinct().count() == 20


def test_streaming_upsert_replay_idempotent(spark, tmp_path):
    """Re-running the drained stream (same checkpoint) must not
    create new versions or change the state; and re-merging an
    already-applied batch by hand (the crash-between-snapshot-and-
    marker window) must produce byte-identical content."""
    from pyspark.sql import functions as F
    from pointdatabase_spark.streaming import upsert as su
    state = str(tmp_path / "state")
    landing = str(tmp_path / "landing")
    ckpt = str(tmp_path / "ckpt")
    base = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 1.5).alias("p"))
    su.init_state(base, state)
    upd = base.where(F.col("k") % 4 == 0).withColumn(
        "p", F.col("p") + 10.0)
    upd.repartition(1).write.mode("append").parquet(landing)
    schema = spark.read.parquet(landing).schema
    su.run_upsert_stream(spark, landing, "*.parquet", schema, state,
                         ckpt, ["k"])
    v1 = su.latest_version(spark, state)
    rows1 = sorted(map(tuple, su.read_state(spark, state).collect()))
    # replay: offsets are committed, nothing to drain
    su.run_upsert_stream(spark, landing, "*.parquet", schema, state,
                         ckpt, ["k"])
    assert su.latest_version(spark, state) == v1
    assert sorted(map(tuple,
                      su.read_state(spark, state).collect())) == rows1
    # crash-window re-merge: applying the same batch to the merged
    # state again changes nothing by value
    from pointdatabase_spark.operators.sampling import upsert_latest_wins
    again = upsert_latest_wins(su.read_state(spark, state), upd,
                               ["k"]).drop("_v")
    assert sorted(map(tuple, again.collect())) == rows1
    # expected content: every k%4==0 row carries the +10
    expect = {(k, k * 1.5 + (10.0 if k % 4 == 0 else 0.0))
              for k in range(100)}
    assert set(rows1) == expect


def test_streaming_upsert_bucketed_dirty_only(spark, tmp_path):
    """Huge-state path: a small batch over a large state must rewrite
    ONLY the buckets it touches — untouched bucket files stay
    byte-identical (they are literally the same files, repointed by
    the manifest) — and the resolved state must equal what the
    full-rewrite path would produce."""
    import hashlib
    import os
    from pyspark.sql import functions as F
    from pointdatabase_spark.streaming import upsert as su

    state = str(tmp_path / "state")
    landing = str(tmp_path / "landing")
    B = 16
    base = spark.range(2000).select(
        F.col("id").alias("k"), (F.col("id") * 1.5).alias("p"))
    su.init_state_bucketed(base, state, ["k"], B)

    def _bucket_files():
        out = {}
        for root, _, files in os.walk(f"{state}/data"):
            for f in files:
                if f.endswith(".parquet"):
                    p = os.path.join(root, f)
                    out[p] = hashlib.sha1(
                        open(p, "rb").read()).hexdigest()
        return out

    before = _bucket_files()
    # delta touches 3 keys -> at most 3 of 16 buckets dirty
    upd = spark.createDataFrame(
        [(7, 777.0), (1003, 888.0), (2500, 999.0)],
        "k long, p double")
    upd.repartition(1).write.mode("append").parquet(landing)
    schema = spark.read.parquet(landing).schema
    su.run_upsert_stream_bucketed(
        spark, landing, "*.parquet", schema, state,
        str(tmp_path / "ck"), ["k"], B)

    after = _bucket_files()
    # every pre-existing file survives unmodified
    for p, h in before.items():
        assert p in after and after[p] == h, f"rewritten: {p}"
    # new files appear only under the new version's dirty buckets
    new_dirs = {os.path.dirname(p).rsplit("/", 2)[-2:][0]
                for p in after if p not in before}
    assert new_dirs == {"v1"}
    n_dirty = len({os.path.dirname(p) for p in after
                   if p not in before})
    assert 1 <= n_dirty <= 3

    got = {r.k: r.p for r in
           su.read_state_bucketed(spark, state).collect()}
    want = {k: k * 1.5 for k in range(2000)}
    want.update({7: 777.0, 1003: 888.0, 2500: 999.0})
    assert got == want


def test_streaming_upsert_bucketed_sequential_batches(spark, tmp_path):
    """Two sequential landing files drain as two batches; the second
    wins on the overlapping key, and clean buckets still carry the
    v0 files through BOTH manifests untouched."""
    from pyspark.sql import functions as F
    from pointdatabase_spark.streaming import upsert as su
    state = str(tmp_path / "state")
    landing = str(tmp_path / "landing")
    B = 8
    base = spark.range(500).select(
        F.col("id").alias("k"), F.lit(0.0).alias("p"))
    su.init_state_bucketed(base, state, ["k"], B)
    spark.createDataFrame([(5, 1.0)], "k long, p double") \
        .repartition(1).write.mode("append").parquet(landing)
    spark.createDataFrame([(5, 2.0), (6, 2.0)], "k long, p double") \
        .repartition(1).write.mode("append").parquet(landing)
    schema = spark.read.parquet(landing).schema
    su.run_upsert_stream_bucketed(
        spark, landing, "*.parquet", schema, state,
        str(tmp_path / "ck"), ["k"], B, files_per_batch=1)
    assert su.latest_version(spark, state) == 2
    got = {r.k: r.p for r in
           su.read_state_bucketed(spark, state).collect()}
    assert got[5] == 2.0 and got[6] == 2.0
    assert sum(v != 0.0 for v in got.values()) == 2
    # replay: nothing to drain, no version churn
    su.run_upsert_stream_bucketed(
        spark, landing, "*.parquet", schema, state,
        str(tmp_path / "ck"), ["k"], B, files_per_batch=1)
    assert su.latest_version(spark, state) == 2


def test_upsert_markers_scoped_to_checkpoint(spark, tmp_path):
    """Reusing a state dir with a FRESH checkpoint must not let
    stale markers (same batch ids, old stream) suppress new merges —
    the r9 ADVICE replay-collision scenario."""
    from pyspark.sql import functions as F
    from pointdatabase_spark.streaming import upsert as su
    state = str(tmp_path / "state")
    base = spark.range(10).select(
        F.col("id").alias("k"), F.lit(0.0).alias("p"))
    su.init_state(base, state)
    l1 = str(tmp_path / "l1")
    spark.createDataFrame([(1, 1.0)], "k long, p double") \
        .repartition(1).write.mode("append").parquet(l1)
    schema = spark.read.parquet(l1).schema
    su.run_upsert_stream(spark, l1, "*.parquet", schema, state,
                         str(tmp_path / "ck1"), ["k"])
    assert su.latest_version(spark, state) == 1
    # new stream incarnation: fresh checkpoint + re-pointed landing,
    # batch ids restart at 0 and would collide with ck1's markers if
    # markers were keyed on bid alone
    l2 = str(tmp_path / "l2")
    spark.createDataFrame([(2, 2.0)], "k long, p double") \
        .repartition(1).write.mode("append").parquet(l2)
    su.run_upsert_stream(spark, l2, "*.parquet", schema, state,
                         str(tmp_path / "ck2"), ["k"])
    assert su.latest_version(spark, state) == 2
    got = {r.k: r.p for r in su.read_state(spark, state).collect()}
    assert got[1] == 1.0 and got[2] == 2.0


def test_upsert_pending_marker_detects_finished_snapshot(spark,
                                                         tmp_path):
    """Crash between snapshot completion and final-marker write: the
    retry must detect the finished snapshot via the pending marker
    and commit WITHOUT writing a duplicate version."""
    from pyspark.sql import functions as F
    from pointdatabase_spark.streaming import upsert as su
    state = str(tmp_path / "state")
    base = spark.range(10).select(
        F.col("id").alias("k"), F.lit(0.0).alias("p"))
    su.init_state(base, state)
    ck = str(tmp_path / "ck")
    # simulate the crashed attempt: version 1 fully written,
    # pending marker present, final marker absent
    merged = base.withColumn(
        "p", F.when(F.col("k") == 1, 1.0).otherwise(F.col("p")))
    merged.write.mode("overwrite").parquet(f"{state}/versions/1")
    dig = su._ckpt_digest(ck)
    fs, jp = su._fs(spark,
                    f"{state}/_batches/{dig}-0.pending.1")
    fs.create(jp, True).close()
    # guard for the retry of batch 0: must report already-applied
    target, commit = su._batch_guard(spark, state, ck, 0)
    assert target is None and commit is None
    assert su.latest_version(spark, state) == 1
    # final marker now exists; pending is cleaned up
    assert su._fs(spark, f"{state}/_batches/{dig}-0")[0].exists(
        su._fs(spark, f"{state}/_batches/{dig}-0")[1])
    assert not fs.exists(jp)


def test_state_diff_hand_case(spark):
    """insert / update / delete / unchanged, one of each: the CDC
    feed emits exactly the three changed keys with the NEW payload
    (NULLs on delete), and an identical-snapshot diff is empty."""
    from pointdatabase_spark.streaming import upsert as su
    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k long, s string, p double")
    new = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 99.0), (9, "new", 1.0)],
        "k long, s string, p double")
    got = {r.k: (r.change_type, r.s, r.p) for r in
           su.state_diff(old, new, ["k"]).collect()}
    assert got == {2: ("update", "b", 99.0),
                   3: ("delete", None, None),
                   9: ("insert", "new", 1.0)}
    assert su.state_diff(old, old, ["k"]).count() == 0
    # null-safe payload compare: NULL == NULL is "unchanged"
    o2 = spark.createDataFrame([(1, None, 1.0)],
                               "k long, s string, p double")
    assert su.state_diff(o2, o2, ["k"]).count() == 0
    import pytest
    with pytest.raises(ValueError, match="schemas differ"):
        su.state_diff(old, new.drop("p"), ["k"])


def test_vacuum_state_keeps_referenced_buckets(spark, tmp_path):
    """After three versions, vacuum(keep_last=2) must drop v0's
    manifest and exactly the bucket dirs no kept manifest
    references — both kept versions stay fully readable."""
    from pyspark.sql import functions as F
    from pointdatabase_spark.streaming import upsert as su
    state = str(tmp_path / "state")
    landing = str(tmp_path / "landing")
    B = 8
    base = spark.range(400).select(
        F.col("id").alias("k"), F.lit(0.0).alias("p"))
    su.init_state_bucketed(base, state, ["k"], B)
    spark.createDataFrame([(1, 1.0)], "k long, p double") \
        .repartition(1).write.mode("append").parquet(landing)
    spark.createDataFrame([(2, 2.0)], "k long, p double") \
        .repartition(1).write.mode("append").parquet(landing)
    schema = spark.read.parquet(landing).schema
    su.run_upsert_stream_bucketed(
        spark, landing, "*.parquet", schema, state,
        str(tmp_path / "ck"), ["k"], B, files_per_batch=1)
    assert su.latest_version(spark, state) == 2
    m1 = su._read_manifest(spark, state, 1)
    m2 = su._read_manifest(spark, state, 2)
    before = {r.k: r.p for r in
              su.read_state_bucketed(spark, state, 2).collect()}
    res = su.vacuum_state(spark, state, keep_last=2)
    assert res["kept_versions"] == [1, 2]
    assert res["dropped_versions"] == [0]
    # v0 bucket dirs still referenced by the kept manifests survive;
    # only the superseded ones are gone
    referenced = {(mv, b) for m in (m1, m2) for b, mv in m.items()}
    import os
    live = set()
    for root, dirs, _ in os.walk(f"{state}/data"):
        for d in dirs:
            if d.startswith("_bucket="):
                vn = int(os.path.basename(root)[1:])
                live.add((vn, int(d.split("=", 1)[1])))
    assert live == referenced
    assert res["dropped_bucket_dirs"] >= 1
    # both kept versions read clean
    after = {r.k: r.p for r in
             su.read_state_bucketed(spark, state, 2).collect()}
    assert after == before
    assert len({r.k for r in
                su.read_state_bucketed(spark, state, 1).collect()}) \
        == 400
    # dropped version is no longer resolvable
    import pytest
    with pytest.raises(Exception):
        su.read_state_bucketed(spark, state, 0).collect()


def test_streaming_scd2_equals_batch_closed_rows(spark):
    """The availableNow drain of the stateful SCD2 builder emits
    EXACTLY the batch operator's closed intervals (valid_to IS NOT
    NULL) — open/current rows stay withheld in state (append-mode
    contract, same as the stateful sessionizer)."""
    from pyspark.sql import functions as F
    from pointdatabase_spark import testkit
    from pointdatabase_spark.functions import timeconv
    from pointdatabase_spark.operators import temporal
    from pointdatabase_spark.streaming import scd2 as s2
    sf = "/root/testdata/sf0.001"
    got = {tuple(r) for r in s2.run_scd2_stateful_availablenow(
        spark, sf).collect()}
    ev = testkit.load_table(spark, sf, "events")
    batch = temporal.scd2_history(
        ev.select("user_id", timeconv.events_tus(ev).alias("tus"),
                  "event_type", "event_id"),
        keys=["user_id"], state_cols=["event_type"], ts_col="tus",
        tiebreak=["event_id"])
    want = {tuple(r) for r in batch
            .where(F.col("valid_to").isNotNull())
            .select("user_id", F.col("event_type").alias("state"),
                    "valid_from", "valid_to", "version", "n_rows")
            .collect()}
    assert got == want and len(want) > 100


def test_text_index_stream_multislice_and_replay(spark, tmp_path):
    """The log-structured text-index maintainer: (1) a two-batch
    drain (files landing between drains) produces one bid slice per
    batch and serves bit-identically to a scratch-built index;
    (2) re-draining with the SAME checkpoint is a no-op (restart
    safety); (3) re-executing a batch body at the same bid — Spark's
    crash-replay semantics — overwrites its own slice and leaves the
    served result unchanged (replay idempotency)."""
    import glob
    import os
    import shutil
    import struct
    from pyspark.sql import functions as F
    from pointdatabase_spark import testkit
    from pointdatabase_spark.operators import retrieval
    from pointdatabase_spark.streaming.textindex import (
        land_batch, run_text_index_maintenance)
    from tests.conftest import SF_SMOKE

    docs = testkit.load_table(spark, SF_SMOKE, "documents")
    landing = str(tmp_path / "landing")
    path = str(tmp_path / "idx")
    full = str(tmp_path / "full")
    docs.repartition(2).write.parquet(landing)
    schema = spark.read.parquet(landing).schema
    terms = ["spark", "vector", "stream"]

    # continuous-ingest cadence: file 1 lands, drain; file 2 lands,
    # drain with the same checkpoint -> two bid slices.
    files = sorted(glob.glob(f"{landing}/*.parquet"))
    assert len(files) == 2
    stage = str(tmp_path / "stage")
    os.makedirs(stage)
    ckpt = str(tmp_path / "ckpt")
    shutil.copy(files[0], stage)
    run_text_index_maintenance(spark, stage, "*.parquet", schema,
                               path, ckpt)
    shutil.copy(files[1], stage)
    run_text_index_maintenance(spark, stage, "*.parquet", schema,
                               path, ckpt)
    slices = {p.split("bid=")[1].split("/")[0]
              for p in glob.glob(f"{path}/postings/bid=*")}
    assert len(slices) == 2, slices

    def rows(ipath):
        return sorted(
            (r["doc_id"], struct.pack("<d", r["bm25"]))
            for r in retrieval.bm25_topk_served(
                spark, ipath, terms, k=20).collect())

    retrieval.write_text_index(docs, full)
    first = rows(path)
    assert first == rows(full) and len(first) == 20

    # restart safety: a third drain over the same staged files with
    # the SAME checkpoint processes nothing.
    before = sorted(glob.glob(f"{path}/postings/bid=*/bucket=*/*"))
    run_text_index_maintenance(spark, stage, "*.parquet", schema,
                               path, ckpt)
    assert sorted(glob.glob(f"{path}/postings/bid=*/bucket=*/*")) \
        == before
    assert rows(path) == first

    # replay idempotency: re-execute batch 1's body at the SAME bid
    # (crash-replay re-runs the identical file set, pinned by the
    # offset WAL) -> the slice overwrites itself, served unchanged.
    batch1 = spark.read.parquet(f"{stage}/{os.path.basename(files[1])}")
    land_batch(batch1, 1, path)
    land_batch(batch1, 1, path)
    assert rows(path) == first


def test_text_index_compaction_preserves_serving(spark, tmp_path):
    """compact_text_index folds a multi-slice store to ONE bid slice;
    the served top-20 is bit-identical before and after."""
    import glob
    import struct
    from pointdatabase_spark import testkit
    from pointdatabase_spark.operators import retrieval
    from pointdatabase_spark.streaming.textindex import (
        compact_text_index, land_batch)
    from tests.conftest import SF_SMOKE
    docs = testkit.load_table(spark, SF_SMOKE, "documents")
    path = str(tmp_path / "idx")
    land_batch(docs.where("doc_id % 3 = 0"), 0, path)
    land_batch(docs.where("doc_id % 3 = 1"), 1, path)
    land_batch(docs.where("doc_id % 3 = 2"), 2, path)
    terms = ["spark", "vector", "stream"]

    def rows():
        return sorted(
            (r["doc_id"], struct.pack("<d", r["bm25"]))
            for r in retrieval.bm25_topk_served(
                spark, path, terms, k=20).collect())

    before = rows()
    compact_text_index(spark, path)
    slices = {p.split("bid=")[1].split("/")[0]
              for p in glob.glob(f"{path}/postings/bid=*")}
    assert slices == {"0"}
    assert rows() == before and len(before) == 20
