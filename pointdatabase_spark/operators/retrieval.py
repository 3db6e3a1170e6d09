"""Lexical retrieval over the corpus — BM25 scoring (Robertson/
Sparck-Jones idf with 0.5 smoothing, Okapi tf saturation), the
keyword-search counterpart of the embedding ANN operators.  No
reference analog (the reference has no text surface); standard public
formulation.

Scale shape: the corpus tokenizes map-side and is FILTERED to query
terms before anything shuffles, so the only doc-scale exchange is the
(doc, term) tf aggregate over matching tokens — O(postings of the
query terms), not O(corpus tokens).  Document length rides along the
explode (no join back to the corpus); term document-frequencies and
the (N, avgdl) corpus stats are term-count-sized / 1-row aggregates
broadcast into the final map-side score expression.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pointdatabase_spark.functions import rounding


def bm25_scores(docs: DataFrame, query_terms: list[str],
                id_col: str = "doc_id", text_col: str = "text",
                k1: float = 1.2, b: float = 0.75) -> DataFrame:
    """Per-document BM25 score for a bag-of-words query (documents
    containing none of the terms are absent — score-0 docs never
    materialize).  Tokenization is lowercase whitespace split, shared
    verbatim by the DuckDB oracle.  Returns (id, bm25) with bm25
    rounded to 6 decimals so cross-engine libm drift in ``ln`` cannot
    flip rankings computed on the rounded value."""
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    terms = [t.lower() for t in query_terms]
    toks = F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))),
                   r"\s+")
    base = docs.select(F.col(id_col).alias("id"),
                       toks.alias("_t")).select(
        "id", F.size("_t").cast("double").alias("dl"),
        F.explode("_t").alias("tok"))
    hits = base.where(F.col("tok").isin(terms))
    tf = (hits.groupBy("id", "dl", "tok")
          .agg(F.count(F.lit(1)).cast("double").alias("tf")))
    dfreq = (tf.groupBy("tok")
             .agg(F.count(F.lit(1)).cast("double").alias("df")))
    stats = docs.select(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg(F.size(toks)).alias("avgdl"))
    idf = F.log(F.lit(1.0) + (F.col("n_docs") - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5)))
    denom = (F.col("tf") + F.lit(float(k1))
             * (F.lit(1.0 - b) + F.lit(float(b)) * F.col("dl")
                / F.col("avgdl")))
    contrib = idf * F.col("tf") * F.lit(float(k1) + 1.0) / denom
    return (tf.join(F.broadcast(dfreq), "tok")
            .crossJoin(F.broadcast(stats))
            .groupBy("id")
            .agg(rounding.qround(F.sum(contrib), 6).alias("bm25"))
            .withColumnRenamed("id", id_col))


def bm25_topk(docs: DataFrame, query_terms: list[str], k: int = 20,
              id_col: str = "doc_id", text_col: str = "text",
              k1: float = 1.2, b: float = 0.75) -> DataFrame:
    """Top-k BM25 hits, ranked on the ROUNDED score with the id as a
    deterministic tiebreak (ranking on raw doubles would let last-ulp
    ln() differences reorder near-ties across engines).  Plans as
    TakeOrderedAndProject — per-partition top-k, tiny merge."""
    scored = bm25_scores(docs, query_terms, id_col, text_col, k1, b)
    return (scored.orderBy(F.col("bm25").desc(), F.col(id_col))
            .limit(int(k)))
