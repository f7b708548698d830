"""Local mirror of the driver's correctness gate.

Runs every registered operator's Spark query AND its DuckDB oracle on the
same parquet tables, then compares row count, column names, and an
order-insensitive canonicalized value frame. Usage:

    python tools/parity.py [--sf /root/testdata/sf0.01] [op_id ...]

Exit code 0 iff every checked op matches.
"""

from __future__ import annotations

import argparse
import sys
import time
import traceback

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

from aced_etl_pod_spark.registry import registry  # noqa: E402
from aced_etl_pod_spark.session import get_spark  # noqa: E402
from aced_etl_pod_spark.tables import TABLES  # noqa: E402


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


def compare(name: str, spark_df: pd.DataFrame, duck_df: pd.DataFrame) -> list[str]:
    errs = []
    if len(spark_df) != len(duck_df):
        errs.append(f"rowcount spark={len(spark_df)} duck={len(duck_df)}")
    sc, dc = sorted(spark_df.columns), sorted(duck_df.columns)
    if sc != dc:
        errs.append(f"columns spark={sc} duck={dc}")
        return errs
    a, b = canon(spark_df), canon(duck_df)
    if len(a) == len(b):
        neq = (a.values != b.values)
        if neq.any():
            idx = list(zip(*neq.nonzero()))[:5]
            for r, c in idx:
                errs.append(
                    f"cell[{r}][{a.columns[c]}] spark={a.iloc[r, c]!r} duck={b.iloc[r, c]!r}"
                )
    return errs


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("ops", nargs="*")
    args = ap.parse_args()

    reg = registry()
    ids = args.ops or sorted(reg)
    spark = get_spark("parity")
    con = duck_con(args.sf)

    n_pass = n_fail = n_rows_only = 0
    for op_id in ids:
        if op_id not in reg:
            print(f"?? {op_id}: not registered")
            n_fail += 1
            continue
        o = reg[op_id]
        t0 = time.time()
        try:
            sdf = o.fn(spark, args.sf).toPandas()
        except Exception:
            print(f"FAIL {op_id}: spark query raised\n{traceback.format_exc()}")
            n_fail += 1
            continue
        if o.oracle is None:
            print(f"rows {op_id}: {len(sdf)} rows (no oracle) [{time.time()-t0:.1f}s]")
            n_rows_only += 1
            continue
        try:
            ddf = con.execute(o.oracle).fetchdf()
        except Exception:
            print(f"FAIL {op_id}: oracle raised\n{traceback.format_exc()}")
            n_fail += 1
            continue
        errs = compare(op_id, sdf, ddf)
        if errs:
            print(f"FAIL {op_id}: " + "; ".join(errs[:6]))
            n_fail += 1
        else:
            print(f"ok   {op_id}: {len(sdf)} rows [{time.time()-t0:.1f}s]")
            n_pass += 1
    print(f"\n{n_pass} ok, {n_rows_only} rows-only, {n_fail} failed / {len(ids)} total")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
