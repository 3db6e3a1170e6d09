"""Fixed-size frequency sketches — a count-min sketch (Cormode &
Muthukrishnan 2005) built and probed entirely with DataFrame
aggregates, for frequency estimation when even Misra-Gries candidate
sets (operators/profile.heavy_hitter_terms) are too large to recount:
the sketch is ``depth x width`` BIGINT counters REGARDLESS of corpus
or vocabulary size.

Scale design (100 TB token streams):

- **Build** is one partial-agg shuffle whose key space is at most
  ``depth x width`` (thousands of cells, not |vocab|): every token
  occurrence maps to ``depth`` (lane, slot) cells map-side, and
  map-side combine collapses each partition to <= depth x width rows
  before the exchange. The token stream itself never shuffles.
- **Probe** joins the (small, broadcastable) sketch to the query
  terms — per term, ``depth`` lookups and a ``min``.
- Merging sketches from disjoint corpora is cell-wise addition (the
  CMS linearity property) — ``union.groupBy(lane, slot).sum`` —
  which is how incremental/streaming maintenance works.

Cross-engine determinism: the lane hash is the md5-based 32-bit
integer idiom shared with the dedup family (dedup.py ``_H32`` /
queries.py ``_DUCK_H32``) applied to ``'{lane}|' || term``, so Spark
and DuckDB compute identical slots and the oracle reproduces the
sketch counter-for-counter. Counters are exact BIGINTs (associative
sums — order-free).

Estimates are upper bounds: ``est >= true`` always (only hash
collisions inflate); with ``width >= e/eps`` and ``depth >=
ln(1/delta)`` the overcount is <= eps * N with probability 1-delta
(the classic guarantee). The audit operator measures the real
overcount instead of trusting the bound — the same
measure-don't-guess doctrine as ``dedup.lsh_recall_eval``.

No reference counterpart (extension surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _slot_spark(term_expr: str, lane_expr: str, width: int) -> str:
    """Spark SQL text: CMS slot of ``term`` in ``lane`` — the shared
    md5->int32 idiom over ``lane || '|' || term``."""
    s = f"concat(cast({lane_expr} as string), '|', {term_expr})"
    return (f"CAST(conv(substr(md5({s}), 1, 8), 16, 10) AS BIGINT)"
            f" % {int(width)}")


def slot_duckdb(term_expr: str, lane_expr: str, width: int) -> str:
    """DuckDB SQL text computing the IDENTICAL slot (mirrors
    queries.py ``_DUCK_H32`` digit-fold)."""
    s = f"CAST({lane_expr} AS VARCHAR) || '|' || {term_expr}"
    return ("CAST(list_sum(list_transform(range(8), i ->"
            f" (strpos('0123456789abcdef', substr(md5({s}),"
            " CAST(i + 1 AS INT), 1)) - 1)"
            f" * 16.0 ** (7 - i))) AS BIGINT) % {int(width)}")


def cms_build(df: DataFrame, term_col: str = "term", depth: int = 4,
              width: int = 1024) -> DataFrame:
    """Build the sketch: ``(lane int, slot long, cnt long)`` with at
    most ``depth x width`` rows. One bounded-key partial-agg shuffle
    (see module doc)."""
    lanes = F.explode(F.array(*[F.lit(l).cast("int")
                                for l in range(int(depth))]))
    t = (df.select(F.col(term_col).alias("_t"))
         .select("_t", lanes.alias("lane")))
    slot = F.expr(_slot_spark("_t", "lane", width))
    return (t.groupBy("lane", slot.alias("slot"))
            .agg(F.count(F.lit(1)).alias("cnt")))


def cms_lookup(sketch: DataFrame, terms: DataFrame,
               term_col: str = "term", depth: int = 4,
               width: int = 1024) -> DataFrame:
    """Point-query the sketch for each distinct term in ``terms``:
    ``(term, cms_est long)`` where ``cms_est = min over lanes`` of
    the addressed counters (0 if a cell was never touched — only
    possible for terms absent from the build input). The sketch side
    is depth x width rows — broadcast-sized by construction."""
    lanes = F.explode(F.array(*[F.lit(l).cast("int")
                                for l in range(int(depth))]))
    probes = (terms.select(F.col(term_col).alias("term")).distinct()
              .select("term", lanes.alias("lane")))
    probes = probes.withColumn(
        "slot", F.expr(_slot_spark("term", "lane", width)))
    return (probes.join(F.broadcast(sketch), ["lane", "slot"], "left")
            .groupBy("term")
            .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0)))
                 .alias("cms_est")))


def cms_heavy_hitter_audit(df: DataFrame, text_col: str = "text",
                           k: int = 10, depth: int = 4,
                           width: int = 1024) -> DataFrame:
    """Measure-don't-guess audit of the sketch: build a CMS over the
    whitespace token stream, take the EXACT top-``k`` terms (exact
    recount is the audit's ground truth, not the serving path — same
    contract as ``lsh_recall_eval``), and report per term::

        (term, exact_cnt, cms_est, overcount)

    ``overcount = cms_est - exact_cnt >= 0`` always (CMS never
    undercounts); its magnitude is the real collision cost at this
    (depth, width) on this corpus."""
    tok = df.select(F.explode(
        F.split(F.col(text_col), r"\s+")).alias("term"))
    sk = cms_build(tok, "term", depth, width)
    top = (tok.groupBy("term")
           .agg(F.count(F.lit(1)).alias("exact_cnt"))
           .orderBy(F.col("exact_cnt").desc(), F.col("term").asc())
           .limit(int(k)))
    est = cms_lookup(sk, top.select("term"), "term", depth, width)
    return (top.join(est, "term")
            .select("term", "exact_cnt", "cms_est",
                    (F.col("cms_est") - F.col("exact_cnt"))
                    .alias("overcount")))
