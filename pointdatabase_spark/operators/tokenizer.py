"""Distributed BPE tokenizer training (Sennrich et al. 2016) — the
merge-table learning pass a training-data pipeline runs before
tokenizing a corpus.

Spark-first shape, and the reason BPE scales: the corpus is scanned
ONCE (word counts); every merge round after that operates on the
WORD table, whose size is VOCABULARY-bounded — corpus growth changes
the counts, not the loop cost.

Merges are learned in BATCHED driver rounds (r9; the r8 one-merge-
per-round loop was a 32k-sequential-jobs ceiling for a real 32k-merge
train).  Each round collects the ranked pair-count head plus two
per-symbol adjacency maxima, then accepts the longest PREFIX of the
ranked list that is provably order-equivalent to strict sequential
BPE (proof sketch in ``_select_batch``), applies the whole batch in
one fold pass, and repeats.  Batch sizes are data-dependent
(Zipfian corpora typically accept 4-30 per round); semantics are
EXACTLY sequential BPE — the batched trainer is hash-identical to
the unrolled sequential oracle, not an approximation.

The greedy left-to-right merge itself is a codegen ``aggregate()``
fold (fold: if the accumulator's last symbol is L and the next is R,
replace the tail with LR; a fresh merge becomes the new tail, so
overlapping runs like 'aaaa' merge to ['aa','aa']).

No Python touches per-row data: tokenize/count/fold are built-in
expressions; only bounded pair-head/symbol-max collects cross to the
driver (|head| + |symbols-in-head| rows per round).

Reference-repo parity: none (no text pipeline in the reference);
LLM-data extension surface, SURVEY.md §2.10.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_CHARS = "regexp_extract_all({c}, '.', 0)"

# how many folds to chain inside one select before starting a new
# projection — keeps per-expression depth bounded regardless of batch
_FOLDS_PER_SELECT = 16


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


def _apply_merges(df: DataFrame, merges: list[tuple[str, str]],
                  syms_col: str = "syms") -> DataFrame:
    """Apply ``merges`` in order via chained folds, at most
    ``_FOLDS_PER_SELECT`` folds per projection (bounds expression
    depth; the chained projections stay one narrow stage)."""
    other = [c for c in df.columns if c != syms_col]
    for lo in range(0, len(merges), _FOLDS_PER_SELECT):
        expr = syms_col
        for left, right in merges[lo:lo + _FOLDS_PER_SELECT]:
            expr = _merge_fold(expr, left, right)
        df = df.select(*other, F.expr(expr).alias(syms_col))
    return df


def _pair_counts(syms: DataFrame) -> DataFrame:
    return (syms.where(F.size("syms") >= 2)
            .select("cnt", F.explode(F.expr(
                "transform(sequence(1, size(syms) - 1), i -> "
                "named_struct('l', element_at(syms, i), "
                "'r', element_at(syms, i + 1)))")).alias("p"))
            .groupBy("p.l", "p.r")
            .agg(F.sum("cnt").alias("pc")))


def _select_batch(pairs: DataFrame, cap: int) -> list:
    """The longest prefix of the ranked pair list that is provably
    order-equivalent to strict sequential BPE.

    Rank order is (count desc, l, r).  Walking the ranked head, accept
    pair k and keep going only while ALL of:

    1. its symbols are disjoint from every accepted pair's symbols and
       from every accepted merged string — so earlier batch merges
       cannot change its count (merging (a,b) only destroys pairs
       touching a/b and creates pairs touching the new token ab);
    2. its count strictly exceeds ``bound`` = the max, over accepted
       pairs (a_i, b_i), of max(count of any pair ending in a_i,
       count of any pair starting with b_i).  Every occurrence of a
       pair CREATED by merge i — (X, ab_i) or (ab_i, Y), including
       chained creations — maps injectively to a pre-batch adjacency
       (t, a_i) or (b_i, u), so no created pair can ever reach a
       count above ``bound``; strict `>` also clears count-ties
       (created tokens could tie-break ahead);
    3. its merged string is not already a live symbol and not equal to
       another accepted merged string (either would alias two token
       identities and let an existing pair's count RISE).

    Stopping at the FIRST violation (prefix, never skip-and-continue)
    matters: a skipped conflicting pair is exactly one whose count an
    earlier batch merge may have changed, so everything ranked below
    it must wait for the recount.  Under 1-3 the sequential argmax at
    each inner step is the accepted pair itself, hence batched ==
    sequential, merge for merge."""
    head = (pairs.orderBy(F.col("pc").desc(), "l", "r")
            .limit(cap * 4 + 16).collect())
    if not head:
        return []
    syms = list({r.l for r in head} | {r.r for r in head})
    cand_merged = list({r.l + r.r for r in head})
    # max count of any pair ending in s / starting with s, for every
    # symbol that can appear in an accepted pair
    right_max = {r.r: r.m for r in
                 pairs.where(F.col("r").isin(syms))
                 .groupBy("r").agg(F.max("pc").alias("m")).collect()}
    left_max = {r.l: r.m for r in
                pairs.where(F.col("l").isin(syms))
                .groupBy("l").agg(F.max("pc").alias("m")).collect()}
    # merged strings that already exist as live symbols (rule 3)
    live = {r.s for r in
            pairs.where(F.col("l").isin(cand_merged)
                        | F.col("r").isin(cand_merged))
            .select(F.explode(F.array("l", "r")).alias("s"))
            .distinct().collect()}
    accepted: list = []
    used: set[str] = set()
    created: set[str] = set()
    bound = None
    for row in head:
        if len(accepted) >= cap:
            break
        if accepted:
            if (row.l in used or row.r in used
                    or row.l in created or row.r in created):
                break
            if not row.pc > bound:
                break
        ab = row.l + row.r
        if ab in live or ab in created:
            if accepted:
                break
            # first pair: aliasing is impossible to batch past, but the
            # single-merge step itself is still exact sequential BPE
            accepted.append(row)
            break
        accepted.append(row)
        used |= {row.l, row.r}
        created.add(ab)
        m = max(right_max.get(row.l, 0), left_max.get(row.r, 0))
        bound = m if bound is None else max(bound, m)
    return accepted


def bpe_train(spark: SparkSession, docs: DataFrame, n_merges: int,
              text_col: str = "text", batch: int = 64,
              stats: dict | None = None) -> DataFrame:
    """Learn the first ``n_merges`` BPE merges from a corpus; returns
    (step, left, right, pair_count) — the merge table, in strict
    sequential-BPE order (batching is an execution detail, see module
    docstring).  ``stats``, if given, is filled with
    {"rounds": int, "batch_sizes": [int, ...]} for scale assertions."""
    words = (docs.select(F.explode(
                 F.split(F.col(text_col), r"\s+")).alias("w"))
             .groupBy("w").agg(F.count(F.lit(1)).alias("cnt")))
    syms = words.select(
        "cnt", F.expr(_CHARS.format(c="w")).alias("syms"))
    # the merge loop runs on the vocabulary-bounded word table only;
    # localCheckpoint (not persist) per round: it materializes AND
    # truncates lineage, so the plan tree stays round-sized — with
    # plain persist the chained fold expressions accumulate across
    # rounds and the logical plan itself OOMs the driver near ~50
    # merges (observed: heap death inside generateTreeString)
    syms = syms.localCheckpoint()
    rounds = 0
    batch_sizes: list[int] = []
    merges = []
    while len(merges) < int(n_merges):
        pairs = _pair_counts(syms).persist()
        sel = _select_batch(pairs, min(int(batch),
                                       int(n_merges) - len(merges)))
        pairs.unpersist()
        if not sel:
            break
        rounds += 1
        batch_sizes.append(len(sel))
        for row in sel:
            merges.append((len(merges) + 1, row.l, row.r,
                           int(row.pc)))
        syms = _apply_merges(
            syms, [(row.l, row.r) for row in sel]).localCheckpoint()
    if stats is not None:
        stats["rounds"] = rounds
        stats["batch_sizes"] = batch_sizes
    return spark.createDataFrame(
        merges, "step BIGINT, left STRING, right STRING, "
                "pair_count BIGINT")


def bpe_encode_doc_stats(spark: SparkSession, docs: DataFrame,
                         n_merges: int,
                         text_col: str = "text",
                         batch: int = 64) -> DataFrame:
    """Train-then-encode: learn ``n_merges`` merges, then tokenize the
    corpus under the learned vocabulary and return per-doc
    (n_words, n_tokens).  Encoding cost is VOCABULARY-bounded — each
    DISTINCT word is encoded once by merge folds applied in rank
    order over the distinct-word table (chained bounded-depth
    projections with a lineage cut every ~128 merges, NOT one
    n_merges-deep nested expression — the r8 shape was a 32k-deep
    codegen tree at real vocab sizes); the corpus then maps
    word → encoded length through a broadcast join plus one per-doc
    aggregate, so the documents themselves never shuffle."""
    merges = bpe_train(spark, docs, n_merges, text_col,
                       batch=batch).collect()
    enc = (docs.select(F.explode(
               F.split(F.col(text_col), r"\s+")).alias("w"))
           .distinct()
           .select("w", F.expr(_CHARS.format(c="w")).alias("syms")))
    pairs = [(m.left, m.right) for m in merges]
    # lineage cut every 8 projection chunks (= 128 merges) keeps the
    # analyzer cost linear in n_merges instead of quadratic
    cut = _FOLDS_PER_SELECT * 8
    for lo in range(0, len(pairs), cut):
        enc = _apply_merges(enc, pairs[lo:lo + cut])
        if lo + cut < len(pairs):
            enc = enc.localCheckpoint(eager=False)
    words = enc.select("w", F.size("syms").cast("long").alias("n_sub"))
    dw = docs.select("doc_id", F.explode(
        F.split(F.col(text_col), r"\s+")).alias("w"))
    return (dw.join(F.broadcast(words), "w")
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_words"),
                 F.sum("n_sub").alias("n_tokens"))
            .orderBy("doc_id"))
