"""DuckDB oracle comparison helper — mirrors the driver's t2 check:
row count + schema + order-insensitive value comparison."""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from pointdatabase_spark.testkit import TABLES


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def _dtype_kind(s: pd.Series) -> str:
    """Collapse a pandas dtype to the kind the driver's hash is sensitive
    to: 'i' (integer), 'f' (float), 'b' (bool), else 'O'. An int-valued
    oracle column that DuckDB renders as float (HUGEINT sums, AVG over
    ints) hashes differently from Spark's BIGINT even when every value
    is numerically identical — the exact class of bug that shipped in
    round 4 (`dedup_clean_corpus`, VERDICT r4 item 1/2)."""
    k = s.dtype.kind
    if k in ("i", "u"):
        return "i"
    if k == "f":
        return "f"
    if k == "b":
        return "b"
    return "O"


def _values_close(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) or isinstance(b, float):
        fa, fb = float(a), float(b)
        if math.isnan(fa) and math.isnan(fb):
            return True
        return math.isclose(fa, fb, rel_tol=1e-9, abs_tol=1e-9)
    return a == b


def _values_exact(a, b) -> bool:
    """Bitwise equality — the only local predicate that predicts the
    driver's value hash. Floats compare by bit pattern (NaN==NaN, and
    +0.0 != -0.0 just as their hashes differ)."""
    if a is None and b is None:
        return True
    if a is None or b is None:
        return False
    if isinstance(a, float) or isinstance(b, float):
        try:
            import struct
            return (struct.pack("<d", float(a))
                    == struct.pack("<d", float(b)))
        except (TypeError, ValueError):
            return False
    return a == b


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str, name: str = "",
            exact: bool = True) -> None:
    got = spark_df.toPandas()
    exp = con.execute(sql).df()
    assert sorted(got.columns) == sorted(exp.columns), (
        f"{name}: columns {sorted(got.columns)} != {sorted(exp.columns)}")
    assert len(got) == len(exp), f"{name}: rows {len(got)} != {len(exp)}"
    g, e = _canon(got), _canon(exp)
    for col in g.columns:
        gk, ek = _dtype_kind(g[col]), _dtype_kind(e[col])
        # Nullable results arrive as object/float-with-NaN; only flag the
        # unambiguous int-vs-float drift the driver's value hash rejects.
        if {gk, ek} == {"i", "f"} and not (
                g[col].isna().any() or e[col].isna().any()):
            raise AssertionError(
                f"{name}: column {col} dtype-kind mismatch (spark={gk} "
                f"oracle={ek}) — the driver hashes these differently even "
                f"if values match; CAST the oracle aggregate (e.g. "
                f"CAST(SUM(..) AS BIGINT)) or the Spark column to align")
        gv, ev = g[col].tolist(), e[col].tolist()
        pred = _values_exact if exact else _values_close
        bad = [i for i, (a, b) in enumerate(zip(gv, ev)) if not pred(a, b)]
        if bad and exact:
            # Diagnose: is this real value drift or the rounding-tie
            # class (numerically indistinguishable, hash-different)?
            near = all(_values_close(gv[i], ev[i]) for i in bad)
            tag = (" [isclose PASSES — rounding-tie/bit drift; the "
                   "driver hash still rejects this]" if near else "")
            raise AssertionError(
                f"{name}: column {col} bitwise mismatch at rows "
                f"{bad[:5]}{tag}: {[(gv[i], ev[i]) for i in bad[:3]]}")
        assert not bad, (
            f"{name}: column {col} mismatch at rows {bad[:5]}: "
            f"{[(gv[i], ev[i]) for i in bad[:3]]}")
