"""Quality-classifier inference at corpus scale — a fastText-style
linear model over hashed bag-of-words features (Joulin et al. 2016),
the standard CCNet / FineWeb "model-based quality gate" stage that
follows the rule-based filters (operators/cleaning.py) in a real
training-data pipeline.

Scale design (100 TB):

- The model is tiny (n_buckets weights) and ships as a LITERAL array
  inside the expression — a broadcast of a few hundred bytes. Scoring
  is a single map-side projection: tokenize, hash each token to a
  bucket (md5-prefix mod B), fold the bucket weights, squash. ZERO
  shuffle, scan-proportional, whole-stage codegen throughout — the
  classic "inference is a map" property that lets the gate run inline
  with ingestion instead of as a separate job.
- No Python UDF: the per-token hash and the fold are built-in
  expressions (``aggregate`` over the token array), so the hot path
  stays JVM-side.

Cross-engine determinism: the fold runs in array (token) order on
both engines — the same sequential-fold contract as the cosine
kernels (operators/similarity.py) — and the squash is the rational
sigmoid ``z / (1 + |z|)`` (Elliott 1993), chosen over ``exp`` because
every step (add, abs, divide) is an IEEE-exact single operation,
whereas libm ``exp`` is not guaranteed correctly rounded and may
differ between the JVM and DuckDB's C runtime.

Weights are md5-derived pseudo-random in [-1, 1] (same deterministic
family as similarity.hyperplanes) — this module tests the INFERENCE
plan, not a trained model's accuracy; a real deployment substitutes
its trained weight vector.

No reference counterpart (extension surface for the training-data
pipeline mandate).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pointdatabase_spark.functions.rounding import qround, qround_sql

#: feature-hash bucket count (the "2**k hashing-trick width").
N_BUCKETS = 64


def _h32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def weights(n_buckets: int = N_BUCKETS, salt: str = "w_") -> list[float]:
    """Deterministic md5-derived weight per hash bucket, in [-1, 1]."""
    return [(_h32(f"{salt}{b}") % 2001 - 1000) / 1000.0
            for b in range(n_buckets)]


# --- per-token 24-bit md5-prefix digest (exact BIGINT both sides) ---
_DIGEST_S = "CAST(conv(substr(md5({t}), 1, 6), 16, 10) AS BIGINT)"
_DIGEST_D = ("CAST(list_sum(list_transform(range(6), i ->"
             " (strpos('0123456789abcdef',"
             " substr(md5({t}), CAST(i + 1 AS INT), 1)) - 1)"
             " * 16.0 ** (5 - i))) AS BIGINT)")


def _weight_list_sql(w: list[float]) -> str:
    # repr() emits the shortest round-trip decimal -> both engines
    # parse back the identical double.
    return "[" + ", ".join(repr(x) for x in w) + "]"


def logit_exprs(w: list[float], toks_s: str, toks_d: str
                ) -> tuple[str, str]:
    """(spark_sql, duckdb_sql) for the mean hashed-bucket weight —
    the linear logit z. Sequential fold in token order on both
    engines; division by n_tokens last (one IEEE op)."""
    b = len(w)
    wl = _weight_list_sql(w)
    lookup_s = (f"element_at(array({', '.join(repr(x) + 'D' for x in w)}),"
                f" CAST({_DIGEST_S.format(t='t')} % {b} + 1 AS INT))")
    spark = (f"aggregate({toks_s}, CAST(0 AS DOUBLE),"
             f" (acc, t) -> acc + {lookup_s})"
             f" / size({toks_s})")
    duck = (f"list_reduce([CAST(0 AS DOUBLE)] ||"
            f" list_transform({toks_d}, t ->"
            f" {wl}[{_DIGEST_D.format(t='t')} % {b} + 1]),"
            f" (x, y) -> x + y) / len({toks_d})")
    return spark, duck


def score_documents(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id",
                    n_buckets: int = N_BUCKETS,
                    threshold: float = 0.0,
                    extra_cols: tuple[str, ...] = ()) -> DataFrame:
    """Score every document with the hashed linear model; returns
    ``(doc_id, *extra_cols, n_tokens, score_q, keep)`` where
    ``score_q`` is the rational-sigmoid score quantized to
    micro-units and ``keep`` is the gate decision at ``threshold``.
    ``extra_cols`` ride the projection (labels/strata for downstream
    audits — no join back to the corpus). Pure map-side
    projection."""
    w = weights(n_buckets)
    toks = f"split({text_col}, '\\\\s+')"
    z_s, _ = logit_exprs(w, "_toks", "")
    out = (df
           .withColumn("_toks", F.expr(toks))
           .withColumn("_z", F.expr(z_s))
           .withColumn("_score", F.col("_z") /
                       (F.lit(1.0) + F.abs(F.col("_z")))))
    return out.select(
        F.col(id_col),
        *[F.col(c) for c in extra_cols],
        F.size("_toks").cast("long").alias("n_tokens"),
        qround(F.col("_score"), 6).alias("score_q"),
        (F.col("_score") > F.lit(threshold)).alias("keep"))


def score_documents_sql(text_col: str = "text", id_col: str = "doc_id",
                        n_buckets: int = N_BUCKETS,
                        threshold: float = 0.0,
                        table: str = "documents") -> str:
    """The DuckDB oracle computing the identical scores."""
    w = weights(n_buckets)
    toks_d = f"string_split_regex({text_col}, '\\s+')"
    _, z_d = logit_exprs(w, "", toks_d)
    return f"""
SELECT {id_col}, n_tokens,
       {qround_sql('z / (1.0 + abs(z))', 6)} AS score_q,
       (z / (1.0 + abs(z))) > {repr(threshold)} AS keep
FROM (SELECT {id_col},
             CAST(len({toks_d}) AS BIGINT) AS n_tokens,
             {z_d} AS z
      FROM {table}) s
"""


def calibration_bins(scored: DataFrame, label_col: str,
                     score_col: str = "score_q",
                     n_bins: int = 10) -> DataFrame:
    """Reliability-diagram audit for a classifier gate: bucket the
    rational-sigmoid scores (range (−1, 1)) into ``n_bins`` equal
    bins and report, per bin, the support, the exact summed score in
    micro-units, and the positive rate against a reference label —
    the calibration check a pipeline runs before trusting a model
    gate's threshold (a well-calibrated gate's positive rate climbs
    with its score).

    Exactness: the score is already micro-quantized (qround 6), so
    ``floor(score·10⁶ + 0.5)`` recovers the SAME integer on any
    engine; the per-bin aggregate sums BIGINTs (order-independent —
    no double summation), and the positive rate is an integer ppm
    ``div``. Scale shape: one map-side-combined hash aggregate to
    ``n_bins`` rows; the bin expression is scan-local codegen.

    Returns (bin, n, sum_score_micro, pos_ppm), bin 0-based from
    score −1."""
    micro = F.floor(F.col(score_col) * F.lit(1e6) + F.lit(0.5)) \
        .cast("long")
    bin_c = F.least(
        F.lit(int(n_bins) - 1).cast("long"),
        F.floor((F.col(score_col) + F.lit(1.0)) / F.lit(2.0)
                * F.lit(float(n_bins))).cast("long"))
    return (scored.select(bin_c.alias("bin"), micro.alias("_m"),
                          F.col(label_col).cast("long").alias("_y"))
            .groupBy("bin")
            .agg(F.count(F.lit(1)).cast("long").alias("n"),
                 F.sum("_m").cast("long").alias("sum_score_micro"),
                 F.sum("_y").cast("long").alias("_pos"))
            .select("bin", "n", "sum_score_micro",
                    F.expr("(1000000 * _pos) div n").cast("long")
                    .alias("pos_ppm")))
