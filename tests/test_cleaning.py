"""Unit + plan tests for corpus cleaning (operators/cleaning.py):
chunker coverage, C4 rule behavior, paragraph-dedup first-occurrence
semantics, and the scale-shape plan properties (no joins in the line
pass; hash-keyed window exchange for the paragraph pass)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from pointdatabase_spark.operators import cleaning


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame([
        Row(doc_id=0, text="a b c d e f " * 20),          # 240 chars
        Row(doc_id=1, text="x " * 24),                    # 48 chars, 1 line
        Row(doc_id=2, text=("slow " * 16 + "ok ") * 4),   # marker-heavy
    ])


def test_fixed_chunks_cover_text_exactly(spark, docs):
    chunks = cleaning.fixed_chunks(docs, 80)
    back = (chunks.groupBy("doc_id")
            .agg(F.sum(F.length("line")).alias("n")).collect())
    lens = {r.doc_id: r.n for r in back}
    for r in docs.collect():
        assert lens[r.doc_id] == len(r.text)


def test_c4_drops_marker_lines_and_thin_docs(spark, docs):
    out = {r.doc_id: r for r in cleaning.c4_line_stats(docs).collect()}
    assert 2 not in out           # every line carries the marker
    assert 1 not in out           # single line < min_kept
    assert out[0].kept_lines <= out[0].n_lines


def test_c4_is_join_free_single_agg_exchange(spark, docs):
    plan = (cleaning.c4_line_stats(docs)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Join" not in plan                       # scan-local rules
    assert plan.count("Exchange hashpartitioning") == 1  # the groupBy


def test_paragraph_dedup_first_occurrence(spark):
    corpus = spark.createDataFrame([
        Row(doc_id=0, text="P" * 160 + "Q" * 160),
        Row(doc_id=1, text="P" * 160),               # dup of doc 0 para 0
        Row(doc_id=2, text="R" * 160 + "P" * 160),   # dup in 2nd slot
    ])
    out = {r.doc_id: r for r in
           cleaning.paragraph_dedup_stats(corpus).collect()}
    assert (out[0].uniq_paras, out[0].dup_paras) == (2, 0)
    assert (out[1].uniq_paras, out[1].dup_paras) == (0, 1)
    assert (out[2].uniq_paras, out[2].dup_paras) == (1, 1)


def test_paragraph_window_exchange_is_hash_keyed(spark):
    corpus = spark.createDataFrame(
        [Row(doc_id=i, text="w" * 300) for i in range(10)])
    plan = (cleaning.paragraph_dedup_stats(corpus)
            ._jdf.queryExecution().executedPlan().toString())
    # the window shuffle partitions on the 64-bit hash, the paragraph
    # text having been projected away before the exchange
    assert "hashpartitioning(ph" in plan


def test_bigram_lm_hand_case(spark):
    """ref 'a b a c': ch = {a:2, b:1}, cb = {(a,b):1,(b,a):1,(a,c):1},
    V = 3.  Target 'a b z' scores ln(1.5/3.5) for the seen pair and
    ln(0.5/2.5) for the unseen continuation of history b."""
    import math
    ref = spark.createDataFrame([Row(doc_id=0, text="a b a c")])
    tgt = spark.createDataFrame([Row(doc_id=9, text="a b z")])
    [r] = cleaning.bigram_lm_scores(tgt, ref).collect()
    want_nll = -(math.log(1.5 / 3.5) + math.log(0.5 / 2.5)) / 2
    assert r.n_bigrams == 2
    assert r.nll == round(want_nll, 6)
    assert r.ppl == round(math.exp(want_nll), 4)


def test_bigram_lm_unseen_history_is_one_over_v(spark):
    import math
    ref = spark.createDataFrame([Row(doc_id=0, text="a b a c")])
    tgt = spark.createDataFrame([Row(doc_id=9, text="z z z")])
    [r] = cleaning.bigram_lm_scores(tgt, ref).collect()
    assert r.nll == round(math.log(3.0), 6)   # 1/V with V=3


def test_bigram_lm_probe_carries_no_text(spark, docs):
    """The scoring join's probe side must shuffle (doc_id, w1, w2),
    never the document body: no plan node references the text column
    after the bigram projection."""
    plan = (cleaning.bigram_lm_scores(docs, docs)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Generate explode" in plan          # narrow bigram explode
    # every shuffle keys on bigram words / doc_id — never the text
    keys = [seg.split(")")[0] for seg in
            plan.split("hashpartitioning(")[1:]]
    assert keys and all("text" not in k for k in keys)


def test_paragraph_materialize_rebuilds_in_order(spark):
    """Survivors reassemble in original pn order; a fully-duplicate
    document vanishes."""
    corpus = spark.createDataFrame([
        Row(doc_id=0, text="A" * 160 + "B" * 160),
        Row(doc_id=1, text="A" * 160),            # all dups -> gone
        Row(doc_id=2, text="C" * 160 + "A" * 160 + "D" * 160),
    ])
    got = {r.doc_id: (r.n_kept, r.cleaned) for r in
           cleaning.paragraph_dedup_materialize(corpus).collect()}
    assert set(got) == {0, 2}
    assert got[0] == (2, "A" * 160 + "B" * 160)
    assert got[2] == (2, "C" * 160 + "D" * 160)   # A dropped, order kept
