"""Web-corpus URL hygiene — canonicalization and same-page version
dedup, the CommonCrawl-pipeline stage that precedes text dedup: crawl
snapshots carry the same page under scheme/host-case variants,
``www.`` aliases, default ports, trailing slashes, tracking
parameters and re-ordered query strings; collapsing them by CANONICAL
url (keep the freshest fetch) removes exact re-crawls for the cost of
one string projection plus one url-keyed aggregation.

Scale design (100 TB of crawl):

- Canonicalization is a pure map-side codegen string expression
  (regexp + array ops, no Python) — scan-proportional, zero state.
- The dedup is a single ``groupBy(canonical_url)`` whose map-side
  partial ``min(struct(-ts, id))`` collapses each partition's
  versions BEFORE the exchange, so shuffle volume is one slim row
  per (partition, url) — the same partial-agg shape as exact_dedup
  (operators/dedup.py), keyed by url hash. Hot urls (a crawler
  revisiting one page millions of times) are bounded by AQE skew
  splitting; the aggregate is algebraic so salting composes if ever
  needed.

Canonical form (RFC 3986 §6 normalizations + the tracking-param strip
every crawl pipeline adds):

1. drop the fragment;
2. lowercase the scheme and host;
3. drop a leading ``www.`` host label and a default ``:80`` port;
4. drop trailing ``/`` runs on the path (``/+$`` — a single-slash
   strip is not a fixed point: ``/p//`` → ``/p/`` → ``/p`` re-keys
   on a second pass, corrupting incremental crawls);
5. drop ``utm_*`` / ``fbclid`` / ``gclid`` tracking parameters and
   sort the survivors byte-wise.

The Spark and DuckDB template strings below mirror each other
term-for-term; spelling differs only where the engines do (Java
``$1`` vs RE2 ``\\1`` backreferences, ``filter``/``list_filter``,
``array_join``/``list_aggregate``).

No reference counterpart (extension surface for the training-data
pipeline mandate).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: query parameters stripped during canonicalization.
TRACKING_PREFIXES = ("utm_", "fbclid", "gclid")


def _strip_tracking_s(arr: str) -> str:
    conds = " AND ".join(
        f"NOT startswith(p, '{t}')" for t in TRACKING_PREFIXES)
    return f"filter({arr}, p -> {conds})"


def _strip_tracking_d(arr: str) -> str:
    conds = " AND ".join(
        f"NOT starts_with(p, '{t}')" for t in TRACKING_PREFIXES)
    return f"list_filter({arr}, p -> {conds})"


# scheme://host[:port]  |  path  |  ?query  (fragment already cut)
_NOFRAG_S = "regexp_replace({u}, '#.*$', '')"
_NOFRAG_D = "regexp_replace({u}, '#.*$', '')"

_HOST_S = ("regexp_replace(regexp_replace(lower("
           "regexp_extract({nf}, '^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?]+)', 1)),"
           " '://www\\\\.', '://'), ':80$', '')")
_HOST_D = ("regexp_replace(regexp_replace(lower("
           "regexp_extract({nf}, '^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?]+)', 1)),"
           " '://www\\.', '://'), ':80$', '')")

_PATH_S = ("regexp_replace(regexp_extract({nf},"
           " '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?]+([^?]*)', 1), '/+$', '')")
_PATH_D = ("regexp_replace(regexp_extract({nf},"
           " '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?]+([^?]*)', 1), '/+$', '')")

_QUERY_S = ("array_join(array_sort({kept}), '&')"
            .format(kept=_strip_tracking_s(
                "filter(split(regexp_extract({nf}, '\\\\?(.*)$', 1), '&'),"
                " p -> p != '')")))
_QUERY_D = ("list_aggregate(list_sort({kept}), 'string_agg', '&')"
            .format(kept=_strip_tracking_d(
                "list_filter(string_split(regexp_extract({nf}, '\\?(.*)$', 1), '&'),"
                " p -> p != '')")))


def _canon_tmpl(engine: int) -> str:
    host = (_HOST_S if engine == 0 else _HOST_D)
    path = (_PATH_S if engine == 0 else _PATH_D)
    qry = (_QUERY_S if engine == 0 else _QUERY_D)
    # A url with no scheme://host prefix does not parse: pass it
    # through UNCHANGED rather than emitting '' (which would collapse
    # every malformed url into one dedup group and silently drop all
    # but one of those documents).
    if engine == 0:
        return (f"CASE WHEN {host} = '' THEN {{u}} ELSE"
                f" concat({host}, {path},"
                f" CASE WHEN {qry} = '' THEN '' ELSE concat('?', {qry}) END)"
                f" END")
    # DuckDB string_agg over an empty list yields NULL, not ''.
    return (f"CASE WHEN {host} = '' THEN {{u}} ELSE"
            f" {host} || {path} ||"
            f" (CASE WHEN coalesce({qry}, '') = '' THEN ''"
            f" ELSE '?' || {qry} END) END")


def canonical_url(url_col: str) -> Column:
    """Spark Column: the canonical form of ``url_col`` (see module
    doc for the normalization steps). Pure codegen expression."""
    nf = _NOFRAG_S.format(u=url_col)
    return F.expr(_canon_tmpl(0).replace("{nf}", nf)
                  .replace("{u}", url_col))


def canonical_url_sql(url_expr: str) -> str:
    """DuckDB SQL text computing the identical canonical form."""
    nf = _NOFRAG_D.format(u=url_expr)
    return _canon_tmpl(1).replace("{nf}", nf).replace("{u}", url_expr)


def dedup_latest(df, url_col: str = "url", ts_col: str = "fetch_ts",
                 id_col: str = "doc_id"):
    """Collapse rows to one per canonical url, keeping the highest
    ``ts_col`` (ties -> smallest ``id_col``; NULL ``ts_col`` loses to
    every non-NULL fetch, matching ``ORDER BY ts DESC NULLS LAST`` —
    a group that is ALL-NULL keeps a NULL ts). One partial-aggregated
    shuffle keyed by the canonical url.

    ``ts_col`` must be integral (epoch seconds/micros) — ENFORCED:
    a float/double ts would be silently truncated by the long cast,
    letting a lower fractional timestamp win on the integer tie.
    The NULL sentinel is -(2^62), far outside any epoch
    representation."""
    ts_type = df.schema[ts_col].dataType.typeName()
    if ts_type in ("float", "double", "decimal"):
        raise ValueError(
            f"dedup_latest: ts_col {ts_col!r} is {ts_type} — the "
            f"freshest-fetch ordering casts to BIGINT and would "
            f"silently truncate fractional timestamps; convert to "
            f"epoch micros (BIGINT) upstream")
    sent = F.lit(-(1 << 62)).cast("long")
    # min(struct(-ts, id)) would rank a NULL -ts FIRST (Spark sorts
    # null struct fields first), making a null-timestamp row win as
    # the "freshest" fetch while the SQL oracle's NULLS LAST puts it
    # dead-last — coalesce to a -inf sentinel so NULL ts loses, then
    # map the sentinel back to NULL on output.
    nts = -F.coalesce(F.col(ts_col).cast("long"), sent)
    best = F.min(F.struct(nts.alias("nts"),
                          F.col(id_col).alias("id"))).alias("b")
    ts_out = -F.col("b.nts")
    return (df.withColumn("canon_url", canonical_url(url_col))
            .groupBy("canon_url")
            .agg(best, F.count(F.lit(1)).alias("n_versions"))
            .select("canon_url",
                    F.col("b.id").alias(id_col),
                    F.when(ts_out == sent, F.lit(None).cast("long"))
                    .otherwise(ts_out).alias(ts_col),
                    "n_versions"))
