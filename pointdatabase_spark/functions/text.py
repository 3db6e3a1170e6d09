"""Text-analysis column functions for large-scale training-data
pipelines (language-ID, quality scoring, token counting, document
fingerprinting) — all pure built-in expressions (whole-stage codegen,
no Python UDFs), so they vectorize JVM-side and scale to 100 TB of
documents with zero serialization overhead.

Each feature is defined ONCE as a pair of expression templates —
``SPARK`` (Spark SQL) and ``DUCK`` (DuckDB SQL) — kept side by side so
the correctness oracle provably computes the identical arithmetic.
Differences are confined to engine spelling (``size``/``len``,
``filter``/``list_filter``, 1-based ``element_at`` vs DuckDB's 1-based
``[i]``, regexp_replace 'g' flag).

Hashing is md5-based everywhere (both engines ship bit-identical md5);
integer digests come from hex prefixes, kept ≤ 48 bits so every
arithmetic step is exact in BIGINT/DOUBLE on both sides.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# English function-word markers for the stopword-ratio features. The
# synthetic corpus is a shared word-soup, so the *heuristic* is what is
# under test, not classifier accuracy.
STOPWORDS_EN = ("the", "a", "an", "of", "and", "to", "in", "is", "on", "for")

_STOPLIST = ", ".join(f"'{w}'" for w in STOPWORDS_EN)

# ---------------------------------------------------------------------------
# Feature templates: name -> (spark_sql_template, duckdb_sql_template).
# `{c}` is the text column; on the Spark side `{t}` is the token array.
# Templates mirror each other term for term.
#
# Spark renders `{t}` as an inline split by default, but callers doing
# several token features per row should pre-project the split ONCE
# (`with_tokens`) and pass `toks=`: higher-order-function lambdas run
# outside whole-stage codegen, so an inline split inside e.g.
# `element_at(split(c), i)` re-tokenizes the whole text per lambda
# element — O(tokens x len) regex work per row. Pre-splitting measured
# 3.2x on doc_fingerprint at sf0.1. (Catalyst's CollapseProject keeps
# the two projections separate because the alias is referenced many
# times by non-cheap expressions, so the split really runs once.)
# ---------------------------------------------------------------------------

_TOK_S = "split({c}, '\\\\s+')"
_TOK_D = "string_split_regex({c}, '\\s+')"

# Shared array subtrees for the repetition features (r12): the word
# bigram array and the run-start positions. HOF lambdas run
# interpreted, so an inline subtree is RE-EVALUATED per outer-lambda
# element — top_bigram_cover's per-distinct-bigram filter re-built the
# whole bigram array (concat_ws per token) for every distinct bigram,
# O(distinct·n) string construction per row. Callers on the hot path
# project these ONCE via :func:`with_rep_arrays` and pass ``bg=``/
# ``st=``; the default renders the identical inline subtree, so every
# other caller's expression tree (and value) is unchanged. The bigram
# subtree is guarded for size<2 (sequence(1, 0) would descend) — the
# consuming template's own size<2 CASE never reads it there, so the
# guard only matters when the array is materialized as a column.
_BIGRAMS_S = ("CASE WHEN size({t}) < 2 THEN array() ELSE "
              "transform(sequence(1, size({t}) - 1), i ->"
              " concat_ws(' ', element_at({t}, i), element_at({t}, i + 1)))"
              " END")
_STARTS_S = ("filter(sequence(1, size({t})), i ->"
             " i = 1 OR element_at({t}, i) != element_at({t}, i - 1))")

FEATURES: dict[str, tuple[str, str]] = {
    # --- token counting ---------------------------------------------------
    "n_chars_calc": ("CAST(length({c}) AS BIGINT)", "length({c})"),
    "n_tokens": ("CAST(size({t}) AS BIGINT)", f"len({_TOK_D})"),
    "n_distinct_tokens": ("CAST(size(array_distinct({t})) AS BIGINT)",
                          f"len(list_distinct({_TOK_D}))"),
    # BPE-ish subword count: ≤4-letter chunks + digits + symbol bytes.
    "n_tokens_bpe": (
        "CAST(size(regexp_extract_all(lower({c}), '[a-z]{{1,4}}|[0-9]|[^a-z0-9\\\\s]', 0)) AS BIGINT)",
        "len(regexp_extract_all(lower({c}), '[a-z]{{1,4}}|[0-9]|[^a-z0-9\\s]'))"),
    "mean_token_len": (
        "CAST(length(regexp_replace({c}, '\\\\s', '')) AS DOUBLE) / size({t})",
        f"CAST(length(regexp_replace({{c}}, '\\s', '', 'g')) AS DOUBLE) / len({_TOK_D})"),
    # --- quality features -------------------------------------------------
    "stop_ratio": (
        f"CAST(size(filter({{t}}, t -> t IN ({_STOPLIST}))) AS DOUBLE) / size({{t}})",
        f"CAST(len(list_filter({_TOK_D}, t -> t IN ({_STOPLIST}))) AS DOUBLE) / len({_TOK_D})"),
    "punct_ratio": (
        "CAST(length(regexp_replace({c}, '[^.,!?;:]', '')) AS DOUBLE) / length({c})",
        "CAST(length(regexp_replace({c}, '[^.,!?;:]', '', 'g')) AS DOUBLE) / length({c})"),
    "alpha_ratio": (
        "CAST(length(regexp_replace({c}, '[^A-Za-z]', '')) AS DOUBLE) / length({c})",
        "CAST(length(regexp_replace({c}, '[^A-Za-z]', '', 'g')) AS DOUBLE) / length({c})"),
    # --- repetition features (Gopher-style quality rules) -----------------
    # Fraction of tokens that are repeats of an earlier token.
    "dup_token_ratio": (
        "1.0D - CAST(size(array_distinct({t})) AS DOUBLE) / size({t})",
        f"1.0 - CAST(len(list_distinct({_TOK_D})) AS DOUBLE) / len({_TOK_D})"),
    # Fraction of tokens covered by the single most frequent word
    # bigram (Gopher's top-2-gram coverage rule). O(distinct·n) per
    # row — fine for documents, and entirely inside array lambdas.
    # Overlapping occurrences double-count tokens (count·2 > n is
    # possible for a token stutter), so the ratio is clamped to 1.0
    # to keep the documented [0, 1] fraction contract.
    "top_bigram_cover": (
        "CASE WHEN size({t}) < 2 THEN 0.0D ELSE"
        " least(1.0D, CAST(array_max(transform(array_distinct({bg}),"
        "  g -> size(filter({bg},"
        "   x -> x = g)))) AS DOUBLE) * 2.0 / size({t})) END",
        f"CASE WHEN len({_TOK_D}) < 2 THEN 0.0 ELSE"
        f" least(1.0, CAST(list_max(list_transform(list_distinct("
        f"  list_transform(range(1, len({_TOK_D})), i ->"
        f"   {_TOK_D}[i] || ' ' || {_TOK_D}[i + 1])),"
        f"  g -> len(list_filter("
        f"   list_transform(range(1, len({_TOK_D})), i ->"
        f"    {_TOK_D}[i] || ' ' || {_TOK_D}[i + 1]),"
        f"   x -> x = g)))) AS DOUBLE) * 2.0 / len({_TOK_D})) END"),
    # Length of the longest run of one repeated token (stutter/spam
    # detector). Linear form: collect run-start positions (token ≠
    # its predecessor), then the max gap between consecutive starts.
    # (`{st}` inlined — lambdas can't let-bind, so the starts array
    # appears once per reference; still O(n) per reference.)
    "max_token_run": (
        "CAST(array_max(transform(sequence(1, size({st})), k ->"
        " (CASE WHEN k < size({st}) THEN element_at({st}, k + 1)"
        "  ELSE size({t}) + 1 END) - element_at({st}, k)))"
        " AS BIGINT)",
        ("CAST(list_max(list_transform(range(1, len({st_d}) + 1), k ->"
         " (CASE WHEN k < len({st_d}) THEN {st_d}[k + 1]"
         f"  ELSE len({_TOK_D}) + 1 END) - {{st_d}}[k]))"
         " AS BIGINT)")
        .replace("{st_d}", f"list_filter(range(1, len({_TOK_D}) + 1), i ->"
                 f" i = 1 OR {_TOK_D}[i] != {_TOK_D}[i - 1])")),
    # --- fingerprints -----------------------------------------------------
    # 48-bit md5-prefix digest (exact in BIGINT both sides).
    "fp48": (
        "CAST(conv(substr(md5({c}), 1, 12), 16, 10) AS BIGINT)",
        "CAST(list_sum(list_transform(range(6), i ->"
        " (strpos('0123456789abcdef', substr(md5({c}), CAST(i + 1 AS INT), 1)) - 1)"
        " * 16.0 ** (5 - i))) AS BIGINT) * 16777216"
        " + CAST(list_sum(list_transform(range(6), i ->"
        " (strpos('0123456789abcdef', substr(md5({c}), CAST(i + 7 AS INT), 1)) - 1)"
        " * 16.0 ** (5 - i))) AS BIGINT)"),
    # Rabin-style rolling hash over the token stream, base 31 mod 2^31-1;
    # per-token digest = 24-bit md5 prefix (every step exact in 64-bit).
    "rolling_fp": (
        "aggregate({t}, 0L, (acc, t) ->"
        " (acc * 31 + CAST(conv(substr(md5(t), 1, 6), 16, 10) AS BIGINT))"
        " % 2147483647)",
        f"list_reduce([CAST(0 AS BIGINT)] || list_transform({_TOK_D}, t ->"
        " CAST(CAST(list_sum(list_transform(range(6), i ->"
        " (strpos('0123456789abcdef', substr(md5(t), CAST(i + 1 AS INT), 1)) - 1)"
        " * 16.0 ** (5 - i))) AS BIGINT) AS BIGINT)),"
        " (acc, t) -> (acc * 31 + t) % 2147483647)"),
    # min-shingle fingerprint: lexicographic min md5 over word 3-grams.
    "min_shingle_md5": (
        "array_min(transform(sequence(1, size({t}) - 2), i ->"
        " md5(concat_ws(' ', element_at({t}, i),"
        " element_at({t}, i + 1), element_at({t}, i + 2)))))",
        f"list_min(list_transform(range(1, len({_TOK_D}) - 1), i ->"
        f" md5({_TOK_D}[i] || ' ' || {_TOK_D}[i + 1] || ' ' || {_TOK_D}[i + 2])))"),
}

# Derived features expressed over base features (same formula both sides).
_QUALITY_TMPL = ("least(1.0D, {n_tokens} / 100.0) * 0.4"
                 " + least(1.0D, {stop_ratio} * 8.0) * 0.3"
                 " + (1.0 - least(1.0D, {punct_ratio} * 10.0)) * 0.3")
_LANG_TMPL = "CASE WHEN {stop_ratio} >= 0.04 THEN 'en' ELSE 'und' END"


def _render(name: str, col: str, engine: int, toks: str | None = None,
            bg: str | None = None, st: str | None = None) -> str:
    tmpl = FEATURES[name][engine]
    if engine == 0:
        t = toks or _TOK_S.format(c=col)
        return tmpl.format(c=col, t=t,
                           bg=bg or _BIGRAMS_S.format(t=t),
                           st=st or _STARTS_S.format(t=t))
    return tmpl.format(c=col)


def with_tokens(df, col: str, toks: str = "_toks"):
    """Project the whitespace tokenization ONCE as array column `toks`;
    pass its name as ``spark_expr(..., toks=...)`` so token features
    share the split instead of re-tokenizing inside each lambda."""
    return df.withColumn(toks, F.expr(_TOK_S.format(c=col)))


def with_rep_arrays(df, col: str, toks: str = "_toks", bg: str = "_bg",
                    st: str = "_st"):
    """Project the token, bigram, and run-start arrays ONCE for the
    repetition features; pass the column names as ``spark_expr(...,
    toks=, bg=, st=)``. HOF lambdas are interpreted, so an inline
    array subtree re-evaluates per outer-lambda element — sharing the
    materialized columns turns top_bigram_cover's O(distinct·n)
    per-row bigram re-construction into O(1) lookups (values
    unchanged; the templates are the same arithmetic)."""
    d = with_tokens(df, col, toks)
    return (d.withColumn(bg, F.expr(_BIGRAMS_S.format(t=toks)))
            .withColumn(st, F.expr(_STARTS_S.format(t=toks))))


def spark_expr(name: str, col: str, toks: str | None = None,
               bg: str | None = None, st: str | None = None) -> Column:
    """Spark Column for a named text feature over text column `col`.
    `toks` names a pre-split token-array column (see `with_tokens`);
    `bg`/`st` name pre-projected bigram / run-start arrays (see
    `with_rep_arrays`)."""
    return F.expr(_render(name, col, 0, toks, bg, st))


def duckdb_expr(name: str, col: str) -> str:
    """DuckDB SQL fragment computing the identical feature."""
    return _render(name, col, 1)


def _quality(engine: int, col: str, toks: str | None = None) -> str:
    t = _QUALITY_TMPL.replace("1.0D", "1.0") if engine else _QUALITY_TMPL
    return t.format(n_tokens=_render("n_tokens", col, engine, toks),
                    stop_ratio=_render("stop_ratio", col, engine, toks),
                    punct_ratio=_render("punct_ratio", col, engine, toks))


def quality_score(col: str, toks: str | None = None) -> Column:
    """Composite [0,1] quality score (length / stopword / punctuation)."""
    return F.expr(_quality(0, col, toks))


def quality_score_sql(col: str) -> str:
    return _quality(1, col)


def language_id(col: str, toks: str | None = None) -> Column:
    """Stopword-ratio language heuristic → 'en' / 'und'."""
    return F.expr(_LANG_TMPL.format(
        stop_ratio=_render("stop_ratio", col, 0, toks)))


def language_id_sql(col: str) -> str:
    return _LANG_TMPL.format(stop_ratio=_render("stop_ratio", col, 1))
