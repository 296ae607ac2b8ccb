"""Local replica of the driver's correctness gate: run a Spark query and its
DuckDB oracle side-by-side, sort columns by name + rows by all columns, and
compare values. Used by tests and ad-hoc parity sweeps."""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from deep_reason_spark.queries import TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    out = df.reindex(sorted(df.columns), axis=1)
    if len(out):
        out = out.sort_values(by=list(out.columns), kind="mergesort").reset_index(drop=True)
    return out


def compare(spark_df, oracle_df, float_tol: float = 0.0) -> list[str]:
    """→ list of mismatch descriptions (empty = parity).

    DTYPE-STRICT, mirroring the driver's string-hash: an int64 250 vs a
    float64 250.0 is a MISMATCH (the driver hashes "250" vs "250.0"), so a
    numerically-equal-but-differently-typed column fails here too — the
    local gate must not pass what the driver will flunk."""
    a, b = _normalize(spark_df), _normalize(oracle_df)
    problems: list[str] = []
    if list(a.columns) != list(b.columns):
        return [f"columns differ: spark={list(a.columns)} oracle={list(b.columns)}"]
    if len(a) != len(b):
        return [f"row count differs: spark={len(a)} oracle={len(b)}"]
    for col in a.columns:
        av, bv = a[col], b[col]
        a_float = pd.api.types.is_float_dtype(av)
        b_float = pd.api.types.is_float_dtype(bv)
        if a_float != b_float and float_tol == 0.0:
            problems.append(
                f"col {col}: dtype mismatch spark={av.dtype} oracle={bv.dtype}"
                " (driver hashes values as strings: int vs float differs)"
            )
            continue
        for i, (x, y) in enumerate(zip(av, bv)):
            same: bool
            if isinstance(x, float) or isinstance(y, float):
                xf = float("nan") if pd.isna(x) else float(x)
                yf = float("nan") if pd.isna(y) else float(y)
                same = (math.isnan(xf) and math.isnan(yf)) or xf == yf or (
                    float_tol > 0 and abs(xf - yf) <= float_tol
                )
            else:
                same = (pd.isna(x) and pd.isna(y)) or x == y
            if not same:
                problems.append(f"col {col} row {i}: spark={x!r} oracle={y!r}")
                if len(problems) >= 5:
                    return problems
    return problems


def run_parity(spark, sf_dir: str, names: list[str] | None = None) -> dict[str, list[str]]:
    from deep_reason_spark.queries import ORACLES, QUERIES

    con = duck_connection(sf_dir)
    results: dict[str, list[str]] = {}
    for name in names or sorted(QUERIES):
        try:
            sdf = QUERIES[name](spark, sf_dir).toPandas()
        except Exception as exc:  # noqa: BLE001 — parity report, not control flow
            results[name] = [f"spark query failed: {exc}"]
            continue
        if name not in ORACLES:
            results[name] = [f"no oracle: rows-only check ({len(sdf)} rows)"]
            continue
        odf = con.sql(ORACLES[name]).df()
        results[name] = compare(sdf, odf)
    return results
