"""Distributed BPE tokenizer training (Sennrich et al. 2016) — the
merge-table learning pass a training-data pipeline runs before
tokenizing a corpus.

Spark-first shape, and the reason BPE scales: the corpus is scanned
ONCE (word counts); every merge round after that operates on the
WORD table, whose size is VOCABULARY-bounded — corpus growth changes
the counts, not the loop cost.  Each round is one pair-count
aggregate (map-side combined, |symbol-pair| keys) plus a 1-row
argmax collect (the bounded-collect pattern the IVF centroid meta
uses), then a codegen `aggregate()` fold rewrites the symbol arrays
in place — greedy left-to-right, exactly BPE's merge semantics
(fold: if the accumulator's last symbol is L and the next is R,
replace the tail with LR; a fresh merge becomes the new tail, so
overlapping runs like 'aaaa' merge to ['aa','aa']).

No Python touches per-row data: tokenize/count/fold are built-in
expressions; only the per-round 1-row argmax crosses to the driver.

Reference-repo parity: none (no text pipeline in the reference);
LLM-data extension surface, SURVEY.md §2.10.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_CHARS = "regexp_extract_all({c}, '.', 0)"


def _esc(s: str) -> str:
    return s.replace("\\", "\\\\").replace("'", "\\'")


def _merge_fold(col: str, left: str, right: str) -> str:
    """Greedy left-to-right BPE merge of (left, right) over a symbol
    array column, as a codegen aggregate() fold."""
    a, b, ab = _esc(left), _esc(right), _esc(left + right)
    return (f"aggregate({col}, CAST(array() AS ARRAY<STRING>), "
            f"(acc, x) -> CASE WHEN size(acc) > 0 "
            f"AND element_at(acc, -1) = '{a}' AND x = '{b}' "
            f"THEN concat(slice(acc, 1, size(acc) - 1), "
            f"array('{ab}')) "
            f"ELSE concat(acc, array(x)) END)")


def bpe_train(spark: SparkSession, docs: DataFrame, n_merges: int,
              text_col: str = "text") -> DataFrame:
    """Learn the first ``n_merges`` BPE merges from a corpus; returns
    (step, left, right, pair_count) — the merge table, in order."""
    words = (docs.select(F.explode(
                 F.split(F.col(text_col), r"\s+")).alias("w"))
             .groupBy("w").agg(F.count(F.lit(1)).alias("cnt")))
    syms = words.select(
        "cnt", F.expr(_CHARS.format(c="w")).alias("syms"))
    # the merge loop runs on the vocabulary-bounded word table only;
    # persist so each round starts from arrays, not the corpus scan
    syms = syms.persist()
    try:
        merges = []
        for step in range(1, int(n_merges) + 1):
            pair = (syms.where(F.size("syms") >= 2)
                    .select("cnt", F.explode(F.expr(
                        "transform(sequence(1, size(syms) - 1), i -> "
                        "named_struct('l', element_at(syms, i), "
                        "'r', element_at(syms, i + 1)))")).alias("p"))
                    .groupBy("p.l", "p.r")
                    .agg(F.sum("cnt").alias("pc"))
                    .orderBy(F.col("pc").desc(), "l", "r")
                    .limit(1).collect())
            if not pair:
                break
            best = pair[0]
            merges.append((step, best.l, best.r, int(best.pc)))
            merged = syms.select("cnt", F.expr(
                _merge_fold("syms", best.l, best.r)).alias("syms"))
            merged = merged.persist()
            merged.count()          # materialize before unpersisting
            syms.unpersist()
            syms = merged
    finally:
        syms.unpersist()
    return spark.createDataFrame(
        merges, "step BIGINT, left STRING, right STRING, "
                "pair_count BIGINT")


def bpe_encode_doc_stats(spark: SparkSession, docs: DataFrame,
                         n_merges: int,
                         text_col: str = "text") -> DataFrame:
    """Train-then-encode: learn ``n_merges`` merges, then tokenize the
    corpus under the learned vocabulary and return per-doc
    (n_words, n_tokens).  Encoding cost is VOCABULARY-bounded — each
    DISTINCT word is encoded once by chained merge folds applied in
    rank order (the merge table is tiny and driver-held, the folds
    are codegen expressions), and the corpus maps word → encoded
    length through a broadcast join plus one per-doc aggregate; the
    documents themselves never shuffle."""
    merges = bpe_train(spark, docs, n_merges, text_col).collect()
    expr = _CHARS.format(c="w")
    for m in merges:
        expr = _merge_fold(f"{expr}", m.left, m.right)
    words = (docs.select(F.explode(
                 F.split(F.col(text_col), r"\s+")).alias("w"))
             .distinct()
             .select("w", F.expr(f"size({expr})").cast("long")
                     .alias("n_sub")))
    dw = docs.select("doc_id", F.explode(
        F.split(F.col(text_col), r"\s+")).alias("w"))
    return (dw.join(F.broadcast(words), "w")
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_words"),
                 F.sum("n_sub").alias("n_tokens"))
            .orderBy("doc_id"))
