"""q2 (star join) layout A/B at a tiled scale (round-12 optimization
session 2: q2 was the largest remaining headline gap after the layout
family shipped — 1.32x isolated at x800, a flat SMJ-vs-fused-hash
kernel gap on a zero-exchange plan — so apply the q1 storage-layer
move: the query groups to at most |nation| = 25 rows, which makes it
summary-shaped).

    python tools/q2_summary_ab.py [--scale 800] [--reps 5]

Variants (honest full re-execution, interleaved, warm medians):

* star_plain — the undispatched Catalyst star join (shuffle_hash
               customer side past 100 k — what q2 ran before round 11)
* bucketed   — join_multiway_star_bucketed: zero-exchange SMJ over the
               shared custkey-bucketed layout (the r11 ship)
* summary    — join_multiway_star_summary_ingest: re-aggregate the
               ingest-time per-nationkey partials (<= 25 rows at any
               corpus size) against the broadcast nation x region dim

The one-time summary BUILD cost is timed separately and reported with
its amortization count (build / per-query saving) — the layout's honest
price, same accounting as tools/q1_summary_ab.py. Values are asserted
equal across variants AND against the DuckDB oracle before timing
(money compared at 1e-12 rel: fold-order ULP at trillion-scale sums,
the q2_bucketed_ab convention; at the driver's sf0.01 the drift is
sub-cent and the hash check is exact).
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

    from aced_etl_pod_spark.operators.joins import _q2_plain_star
    from aced_etl_pod_spark.operators.scale_ops import (
        _q2_summary_fixture,
        join_multiway_star_bucketed,
        join_multiway_star_summary_ingest,
    )
    from aced_etl_pod_spark.registry import registry
    from aced_etl_pod_spark.session import get_spark, pin
    from tools.bench_ladder import build_scaled

    sf = build_scaled(args.scale)
    spark = get_spark("q2-summary-ab", shuffle_partitions=32)
    pin(spark, {
        "spark.sql.files.maxPartitionBytes": "4m",
        "spark.sql.leafNodeDefaultParallelism": "32",
    })

    t0 = time.perf_counter()
    _q2_summary_fixture(spark, sf)
    build_s = time.perf_counter() - t0  # ~0 if the fixture pre-exists

    variants = {
        "star_plain": _q2_plain_star(spark, sf),
        "bucketed": join_multiway_star_bucketed(spark, sf),
        "summary": join_multiway_star_summary_ingest(spark, sf),
    }

    def close(a, b):
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
    assert rows_close(vals["star_plain"], vals["summary"]), "summary != plain"
    assert rows_close(vals["star_plain"], vals["bucketed"]), "bucketed != plain"

    con = duckdb.connect()
    for t in ("orders", "customer", "nation", "region"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    oracle = registry()["join_multiway_star"].oracle
    ov = sorted(tuple(r) for r in con.execute(oracle).fetchall())
    assert rows_close(vals["summary"], ov), (vals["summary"][:2], ov[:2])
    print(f"values agree across 3 variants + oracle (build {build_s:.2f} s)",
          flush=True)

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
    saving = med["bucketed"] - med["summary"]
    if saving > 0 and build_s > 0.5:
        print(
            f"build amortizes after {build_s / saving:.1f} queries vs the"
            f" bucketed plan (build {build_s:.2f} s /"
            f" saving {saving:.2f} s/query)"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
