"""Interleaved A/B for q4's semi join: current Catalyst plan
(join_left_semi — both sides exchange on custkey into an SMJ) vs the
bucketed-colocated layout (join_left_semi_bucketed — pay the custkey
shuffle once at write time, every subsequent run joins exchange-free).

    python tools/q4_bucketed_ab.py [--scale 200] [--reps 5]

Protocol: bench_ladder's honest full-re-execution wrapper (fresh
QueryExecution per sample so every stage re-runs), 2 warmups, samples
INTERLEAVED A/B/A/B to split machine drift across both variants, warm
medians. Reports the one-time bucketed-layout build cost alongside so
the amortization claim is a number, not an adjective, plus the DuckDB
oracle median for the vs-baseline ratio.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=int, default=200)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument(
        "--rebuild", action="store_true",
        help="drop the bucketed layout first so build cost is measured",
    )
    args = ap.parse_args()

    import duckdb

    from tools.bench_ladder import build_scaled
    from aced_etl_pod_spark.registry import registry
    from aced_etl_pod_spark.session import get_spark, pin
    from aced_etl_pod_spark.tables import scratch_dir

    sf = build_scaled(args.scale)
    spark = get_spark("q4-bucketed-ab", shuffle_partitions=32)
    pin(spark, {
        "spark.sql.files.maxPartitionBytes": "4m",
        "spark.sql.leafNodeDefaultParallelism": "32",
    })
    reg = registry()

    # one-time layout build cost (only when the fixture isn't published)
    sf_tag = sf.rstrip("/").rsplit("/", 1)[-1]
    existing = [
        d for d in os.listdir(scratch_dir())
        if d.startswith(f"q4bucket_{sf_tag}_")
    ]
    if args.rebuild:
        for d in existing:
            shutil.rmtree(os.path.join(scratch_dir(), d), ignore_errors=True)
        existing = []
    build_sec = None
    if not existing:
        t0 = time.perf_counter()
        reg["join_left_semi_bucketed"].fn(spark, sf)  # builds the layout
        build_sec = time.perf_counter() - t0

    # the PLAIN Catalyst plan, spelled out: join_left_semi itself
    # layout-dispatches past 1M orders since round 11, so calling it
    # here would compare the bucketed plan against itself
    from aced_etl_pod_spark.tables import load
    from pyspark.sql import functions as _F

    customer = load(spark, sf, "customer")
    orders = load(spark, sf, "orders")
    plain = (
        customer.join(
            orders, customer.c_custkey == orders.o_custkey, "left_semi"
        )
        .groupBy("c_nationkey")
        .agg(_F.count("*").alias("n_active"))
    )
    variants = {
        "current": plain,
        "bucketed": reg["join_left_semi_bucketed"].fn(spark, sf),
    }

    def rerun(df):
        w = df.where(F.lit(True))
        w._jdf.queryExecution().executedPlan()
        return w

    for df in variants.values():
        rerun(df).collect()
        rerun(df).collect()

    con = duckdb.connect()
    for t in ("customer", "orders"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    oracle = reg["join_left_semi"].oracle
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

    med = {n: statistics.median(s) for n, s in samples.items()}
    dmed = statistics.median(duck)
    out = {
        "metric": f"q4_bucketed_ab_x{args.scale}",
        "current_sec": round(med["current"], 4),
        "bucketed_sec": round(med["bucketed"], 4),
        "speedup": round(med["current"] / med["bucketed"], 3),
        "duckdb_sec": round(dmed, 4),
        "current_ratio": round(med["current"] / dmed, 2),
        "bucketed_ratio": round(med["bucketed"] / dmed, 2),
        "layout_build_sec": round(build_sec, 2) if build_sec else None,
        "reps": args.reps,
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
