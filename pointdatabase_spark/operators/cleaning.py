"""Corpus cleaning: C4-style line filtering and CCNet-style
paragraph-level deduplication (training-data pipeline operators).

Both operate on sub-document units.  The synthetic documents table is
single-line word soup, so unit structure is synthesized
DETERMINISTICALLY (fixed-width chunks + hash-scheduled punctuation
injection) with arithmetic valid in both Spark SQL and DuckDB — the
oracle reproduces the identical corpus, the rules, and the stats.

Scale notes (100 TB):
* chunking is a narrow explode — no shuffle; unit count is bounded by
  doc length / width, not corpus size.
* C4 line rules are scan-local string expressions (whole-stage
  codegen); the only shuffle is the per-doc reassembly groupBy.
* paragraph dedup shuffles ONE row per paragraph keyed by a 64-bit
  xxhash of the text (8-byte shuffle keys, not the paragraph bodies —
  the window partitions by hash; text equality within a 64-bit bucket
  is a given at any realistic corpus size, and the first-occurrence
  rule (min (doc_id, pn)) makes the survivor deterministic).

C4 reference: Raffel et al. 2020 §2.2 (line-level heuristics:
terminal punctuation, minimum word count, boilerplate markers).
CCNet reference: Wenzek et al. 2020 §3.1 (paragraph-level hash dedup
before LM filtering) and §3.3 (LM perplexity filtering — here an
add-k bigram LM trained in-engine instead of a pretrained KenLM,
same pipeline role).  Reference-repo parity: none — the reference
engine has no text pipeline; these belong to the LLM-data extension
surface (SURVEY.md §2.10).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pointdatabase_spark.functions import rounding

LINE_WIDTH = 80
PARA_WIDTH = 160


def fixed_chunks(docs: DataFrame, width: int, idx: str = "ln",
                 chunk: str = "line", text: str = "text") -> DataFrame:
    """Explode documents into fixed-width chunks — the deterministic
    stand-in for line/paragraph boundaries the synthetic corpus
    lacks.  Narrow (no shuffle); preserves all document columns."""
    n = F.floor((F.length(text) - 1) / width).cast("int")
    return (docs.withColumn(idx, F.explode(F.sequence(F.lit(0), n)))
            .withColumn(chunk, F.expr(
                f"substr({text}, {idx} * {width} + 1, {width})")))


def c4_line_stats(docs: DataFrame, min_kept: int = 2) -> DataFrame:
    """C4 §2.2 line filter over synthesized lines: keep a line iff it
    (a) ends in terminal punctuation, (b) has >= 5 words, (c) carries
    no boilerplate marker ('slow' plays the role of C4's
    javascript/cookie markers in the synthetic vocabulary).  Terminal
    punctuation is injected on a deterministic (doc_id + ln) % 3
    schedule so rule (a) has signal.  Documents keeping fewer than
    ``min_kept`` lines are dropped entirely (C4's page-level
    follow-through).  Returns per-doc stats."""
    lines = (fixed_chunks(docs, LINE_WIDTH)
             .withColumn("line", F.expr(
                 "line || (CASE WHEN (doc_id + ln) % 3 = 0 "
                 "THEN '' ELSE '.' END)")))
    keep = (F.expr("substr(line, length(line), 1)") == F.lit(".")) \
        & (F.length("line")
           - F.length(F.expr("replace(line, ' ', '')")) >= 4) \
        & (~F.col("line").contains("slow"))
    return (lines.withColumn("keep", keep.cast("int"))
            .groupBy("doc_id")
            .agg(F.count("*").alias("n_lines"),
                 F.sum("keep").alias("kept_lines"),
                 F.sum(F.when(F.col("keep") == 1, F.length("line"))
                       .otherwise(0)).alias("clean_chars"))
            .where(F.col("kept_lines") >= min_kept)
            .orderBy("doc_id"))


def _bigrams(docs: DataFrame, text: str = "text") -> DataFrame:
    """(doc_id, w1, w2) adjacent whitespace-token pairs — a narrow
    explode (tokenization + transform are scan-local; no shuffle)."""
    return (docs
            .select("doc_id", F.split(F.col(text), "\\s+").alias("t"))
            .select("doc_id", F.explode(F.expr(
                "transform(sequence(1, size(t) - 1), i -> "
                "named_struct('w1', element_at(t, i), "
                "'w2', element_at(t, i + 1)))")).alias("bg"))
            .select("doc_id", "bg.w1", "bg.w2"))


def bigram_lm_scores(docs: DataFrame, ref: DataFrame,
                     text: str = "text", k: float = 0.5) -> DataFrame:
    """CCNet §3.3 LM filtering, in-engine: train an add-k smoothed
    bigram LM on the reference corpus ``ref`` (CCNet uses Wikipedia;
    callers pass e.g. the lang='en' slice), score every document in
    ``docs`` by mean negative log-likelihood and perplexity.

    p(w2|w1) = (c(w1,w2) + k) / (c(w1·) + k·V) with history counts
    c(w1·) from the reference bigram relation and V = reference
    unigram vocabulary size.  With COALESCE(count, 0) the same
    formula degrades correctly for unseen pairs (k / (c + kV)) and
    unseen histories (1/V) — one expression, no branch.

    100 TB shape: the LM tables are VOCABULARY-bounded, not
    corpus-bounded — c(w1,w2)/c(w1·) aggregates map-side-combine into
    |bigram vocab| / |vocab| rows, V is a 1-row broadcast stats
    frame.  Scoring is an equi-join whose build side is the LM (AQE
    broadcasts it while it fits, shuffle-joins beyond) and whose
    probe side carries (doc_id, w1, w2) — never document bodies —
    followed by the per-doc agg.  No corpus-squared term anywhere.
    Outputs round to 6/4 decimals so the engine's summation order
    (vs the oracle's) cannot flip a bit at any realistic magnitude."""
    rbg = _bigrams(ref, text)
    ch = rbg.groupBy("w1").agg(F.count("*").alias("ch"))
    cb = rbg.groupBy("w1", "w2").agg(F.count("*").alias("cb"))
    vocab = (ref.select(F.explode(F.split(F.col(text), "\\s+"))
                        .alias("u"))
             .agg(F.countDistinct("u").alias("v")))
    lp = F.log((F.coalesce(F.col("cb"), F.lit(0)) + F.lit(k))
               / (F.coalesce(F.col("ch"), F.lit(0))
                  + F.lit(k) * F.col("v")))
    return (_bigrams(docs, text)
            .join(cb, ["w1", "w2"], "left")
            .join(ch, ["w1"], "left")
            .crossJoin(F.broadcast(vocab))
            .withColumn("lp", lp)
            .groupBy("doc_id")
            .agg(F.count("*").alias("n_bigrams"),
                 rounding.qround(-F.avg("lp"), 6).alias("nll"),
                 rounding.qround(F.exp(-F.avg("lp")), 4).alias("ppl"))
            .orderBy("doc_id"))


def paragraph_dedup_stats(corpus: DataFrame) -> DataFrame:
    """CCNet-style exact paragraph dedup: first occurrence (by
    (doc_id, pn)) of each distinct paragraph survives, later copies
    are dropped; per-doc unique/duplicate counts come back.  The
    window partitions by xxhash64(paragraph) so the exchange carries
    8-byte keys instead of paragraph bodies."""
    paras = (fixed_chunks(corpus, PARA_WIDTH, idx="pn", chunk="para")
             .select("doc_id", "pn", F.xxhash64("para").alias("ph")))
    w = Window.partitionBy("ph").orderBy("doc_id", "pn")
    return (paras.withColumn("rn", F.row_number().over(w))
            .groupBy("doc_id")
            .agg(F.count("*").alias("n_paras"),
                 F.sum(F.when(F.col("rn") == 1, 1).otherwise(0))
                 .alias("uniq_paras"),
                 F.sum(F.when(F.col("rn") > 1, 1).otherwise(0))
                 .alias("dup_paras"))
            .orderBy("doc_id"))


def paragraph_dedup_materialize(corpus: DataFrame) -> DataFrame:
    """The MATERIALIZATION companion of paragraph_dedup_stats: emit
    the cleaned corpus itself — each document reassembled from its
    SURVIVING paragraphs (first global occurrence by (doc_id, pn)),
    in original order.  Documents whose every paragraph was a
    duplicate vanish (CCNet drops them).

    Unlike the stats pass, this one must move paragraph text through
    the dedup window (a corpus rewrite inherently relocates text);
    reassembly is an exact ordered fold — sort_array over (pn, para)
    structs then a join — with no window over documents.  Returns
    (doc_id, n_kept, clean_chars, cleaned) where ``cleaned`` is the
    rebuilt text."""
    paras = (fixed_chunks(corpus, PARA_WIDTH, idx="pn", chunk="para")
             .select("doc_id", "pn", "para",
                     F.xxhash64("para").alias("ph")))
    w = Window.partitionBy("ph").orderBy("doc_id", "pn")
    kept = (paras.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1))
    return (kept.groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_kept"),
                 F.array_join(F.transform(
                     F.array_sort(F.collect_list(
                         F.struct("pn", "para"))),
                     lambda s: s.para), "").alias("cleaned"))
            .select("doc_id", "n_kept",
                    F.length("cleaned").cast("long")
                    .alias("clean_chars"), "cleaned")
            .orderBy("doc_id"))


# --------------------------------------------------------------------
# Unicode repair / canonical text normalization -- the ftfy-ish fixup
# pass a crawl pipeline runs before any hashing or dedup (mojibake and
# stray whitespace otherwise make byte-identical prose hash apart).
# Entirely map-side codegen string expressions; the SPARK/DUCK
# templates mirror each other, differing only in the regexp 'g' flag.
# --------------------------------------------------------------------

#: true characters whose misdecoded-UTF-8 ghosts we repair (smart
#: punctuation + the accented-vowel poster child). Real-world
#: mojibake is overwhelmingly UTF-8 read as WINDOWS-1252 (0x80-0x9F
#: map to printable punctuation: 0x99 -> U+2122 TM, 0x80 -> euro...),
#: with plain Latin-1 (those bytes -> C1 controls) the rarer form —
#: both ghost variants are DERIVED per character (cp1252 first,
#: byte-wise latin-1 fallback for cp1252's five unmapped bytes, then
#: the pure latin-1 ghost when distinct), so the mapping is
#: definitionally the mojibake inverse and the source stays free of
#: literal control bytes.
_MOJIBAKE_GOOD = "’“”—é"  # ' " " em-dash e-acute


def _ghost_cp1252(g: str) -> str:
    return "".join(
        bytes([b]).decode("cp1252", errors="strict")
        if b not in (0x81, 0x8D, 0x8F, 0x90, 0x9D)
        else bytes([b]).decode("latin-1")
        for b in g.encode("utf-8"))


MOJIBAKE = tuple(
    (bad, g)
    for g in _MOJIBAKE_GOOD
    for bad in dict.fromkeys(
        [_ghost_cp1252(g), g.encode("utf-8").decode("latin-1")]))

#: smart punctuation -> ASCII (1:1 by position, translate()-able):
#: single/double curly quotes, en/em dash, NBSP.
_PUNCT_FROM = "‘’“”–— "
_PUNCT_TO = "''\"\"-- "

_CTRL_RE = "[\\x00-\\x08\\x0b-\\x1f\\x7f-\\x9f]"


def _sql_quote(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def normalize_text(col) -> F.Column:
    """Spark Column: mojibake repair -> smart-punctuation fold ->
    control-char strip -> whitespace collapse -> trim. Repair runs
    FIRST (its outputs are smart quotes the translate then folds);
    the control strip runs after so surviving C1 ghost bytes from
    unrepaired mojibake still leave."""
    c = F.col(col) if isinstance(col, str) else col
    for bad, good in MOJIBAKE:
        c = F.replace(c, F.lit(bad), F.lit(good))
    c = F.translate(c, _PUNCT_FROM, _PUNCT_TO)
    c = F.regexp_replace(c, _CTRL_RE, "")
    c = F.regexp_replace(c, "\\s+", " ")
    return F.trim(c)


def normalize_text_sql(expr: str) -> str:
    """The DuckDB SQL computing the identical normalization."""
    c = expr
    for bad, good in MOJIBAKE:
        c = f"replace({c}, {_sql_quote(bad)}, {_sql_quote(good)})"
    c = (f"translate({c}, {_sql_quote(_PUNCT_FROM)},"
         f" {_sql_quote(_PUNCT_TO)})")
    c = f"regexp_replace({c}, '{_CTRL_RE}', '', 'g')"
    c = f"regexp_replace({c}, '\\s+', ' ', 'g')"
    return f"trim({c})"
