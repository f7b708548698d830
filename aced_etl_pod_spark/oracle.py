"""DuckDB differential-oracle core (SURVEY §5.1 — the sqllogictest
equivalent): run a registered operator's Spark query and its DuckDB oracle
over the same parquet tables, compare row count + column set + an
order-insensitive canonicalized value frame.

Shared by tools/parity.py (CLI) and tests/test_parity.py (pytest gate).
"""

from __future__ import annotations

import duckdb
import pandas as pd

from aced_etl_pod_spark.tables import TABLES


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, normalize cell values, sort rows — mirrors an
    order-insensitive value hash."""
    df = df.reindex(sorted(df.columns), axis=1)
    out = {}
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_float_dtype(s):
            s = s.round(6)
        elif pd.api.types.is_datetime64_any_dtype(s):
            s = s.astype("datetime64[us]").astype(str)
        out[c] = s
    df = pd.DataFrame(out)
    df = df.astype(object).where(pd.notnull(df), None)
    rows = sorted(
        (tuple(repr(v) for v in row) for row in df.itertuples(index=False)),
    )
    return pd.DataFrame(rows, columns=df.columns) if rows else df


def compare(spark_df: pd.DataFrame, duck_df: pd.DataFrame) -> list[str]:
    """Return a list of mismatch descriptions (empty = match)."""
    errs = []
    if len(spark_df) != len(duck_df):
        errs.append(f"rowcount spark={len(spark_df)} duck={len(duck_df)}")
    sc, dc = sorted(spark_df.columns), sorted(duck_df.columns)
    if sc != dc:
        errs.append(f"columns spark={sc} duck={dc}")
        return errs
    a, b = canon(spark_df), canon(duck_df)
    if len(a) == len(b) and len(a):
        neq = a.values != b.values
        if neq.any():
            for r, c in list(zip(*neq.nonzero()))[:5]:
                errs.append(
                    f"cell[{r}][{a.columns[c]}] spark={a.iloc[r, c]!r} duck={b.iloc[r, c]!r}"
                )
    return errs
