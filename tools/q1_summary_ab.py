"""q1 (pricing summary) layout A/B at a tiled scale (round-12 verdict
item 1: q1 was the last big absolute chunk — 10.4 s of the 27.9 s x800
total, plan probed clean, residue pure hash-agg kernel constants over
480 M rows — so attack it at the storage layer the way q4/q6 fell).

    python tools/q1_summary_ab.py [--scale 800] [--reps 5]

Variants (honest full re-execution, interleaved, warm medians):

* scan_plain — _q1_plain_scan: the undispatched one-exchange guarded
               scan plan (what agg_group_sums ran before the dispatch)
* summary    — agg_group_sums_summary_ingest: re-aggregate the
               ingest-time (flag, status, shipdate)-keyed partials
               (~15 k rows at any tiling)

The one-time summary BUILD cost is timed separately and reported with
its amortization count (builds ÷ per-query saving): the layout's honest
price, same accounting as tools/shred_ab.py. Values are asserted equal
across variants AND against the DuckDB oracle before timing.
"""

from __future__ import annotations

import argparse
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=int, default=800)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    import duckdb

    from aced_etl_pod_spark.operators.aggs import (
        _q1_plain_scan,
        _q1_summary_fixture,
        agg_group_sums_summary_ingest,
    )
    from aced_etl_pod_spark.registry import registry
    from aced_etl_pod_spark.session import get_spark, pin
    from tools.bench_ladder import build_scaled

    sf = build_scaled(args.scale)
    spark = get_spark("q1-summary-ab", shuffle_partitions=32)
    pin(spark, {
        "spark.sql.files.maxPartitionBytes": "4m",
        "spark.sql.leafNodeDefaultParallelism": "32",
    })

    t0 = time.perf_counter()
    _q1_summary_fixture(spark, sf)
    build_s = time.perf_counter() - t0  # ~0 if the fixture pre-exists

    variants = {
        "scan_plain": _q1_plain_scan(spark, sf),
        "summary": agg_group_sums_summary_ingest(spark, sf),
    }

    def close(a, b):
        # money columns at tiled scale sum to ~1e12, where parallel
        # fold-order ULP drift exceeds the post-round cent — compare
        # floats at 1e-12 rel (the q2_bucketed_ab convention); at the
        # driver's sf0.01 the drift is sub-cent and the hash is exact
        if isinstance(a, float) and isinstance(b, float):
            return abs(a - b) <= 1e-12 * max(abs(a), abs(b), 1.0)
        return a == b

    def rows_close(x, y):
        return len(x) == len(y) and all(
            len(r) == len(s) and all(close(a, b) for a, b in zip(r, s))
            for r, s in zip(x, y)
        )

    vals = {
        n: sorted(tuple(r) for r in df.collect())
        for n, df in variants.items()
    }
    assert rows_close(vals["scan_plain"], vals["summary"]), vals

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM '{sf}/lineitem.parquet'"
    )
    oracle = registry()["agg_group_sums"].oracle
    ov = sorted(tuple(r) for r in con.execute(oracle).fetchall())
    assert rows_close(vals["summary"], ov), (vals["summary"][:2], ov[:2])
    print(f"values agree (build {build_s:.2f} s)", flush=True)

    def rerun(df):
        w = df.where(F.lit(True))
        w._jdf.queryExecution().executedPlan()
        return w

    for df in variants.values():
        rerun(df).collect()
    con.execute(oracle).fetchall()

    samples = {n: [] for n in variants}
    duck = []
    for _ in range(args.reps):
        for name, df in variants.items():
            w = rerun(df)
            t0 = time.perf_counter()
            w.collect()
            samples[name].append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        con.execute(oracle).fetchall()
        duck.append(time.perf_counter() - t0)

    med = {n: statistics.median(ts) for n, ts in samples.items()}
    dm = statistics.median(duck)
    print(f"duckdb oracle: {dm:.3f} s")
    for n, m in med.items():
        print(f"{n:10s} {m:7.3f} s  ratio {m / dm:5.2f}x")
    saving = med["scan_plain"] - med["summary"]
    if saving > 0 and build_s > 0.5:
        print(
            f"build amortizes after {build_s / saving:.1f} queries"
            f" (build {build_s:.2f} s / saving {saving:.2f} s/query)"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
