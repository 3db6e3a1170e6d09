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
before LM filtering).  Reference-repo parity: none — the reference
engine has no text pipeline; these belong to the LLM-data extension
surface (SURVEY.md §2.10).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

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
