"""q1/q5 constant shaving at a tiled scale (round-11 verdict item 6).

    python tools/q1q5_ab.py [--scale 800] [--reps 5]

q1 (agg_group_sums): the per-measure cost is the well-scaled finite()
CASE-WHEN guard (there is no DECIMAL sandwich in this op). A/B the
guarded plan vs plain double sums — if the guard is material, the
verdict's "oracle-only device" question is live; if not, it's closed.

q5 (agg_time_bucket): A/B F.window() (struct-building tumbling window)
vs a plain date_trunc('hour') group key, and report the exchange count
of each plan (the verdict asks that q5 have exactly one).
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402


def q1_unguarded(spark, sf_dir):
    from aced_etl_pod_spark.tables import load

    li = load(spark, sf_dir, "lineitem")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc), 2).alias("sum_disc_price"),
            F.round(F.sum(charge), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


def q5_datetrunc(spark, sf_dir):
    from aced_etl_pod_spark.operators.util import wsum
    from aced_etl_pod_spark.tables import load

    e = load(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    return (
        e.groupBy(
            F.date_trunc("hour", "ts").alias("h"), "event_type"
        )
        .agg(F.count("*").alias("n"), wsum(F.col("value")).alias("total"))
        .select(
            F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("win_start"),
            "event_type",
            "n",
            "total",
        )
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=int, default=800)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    import duckdb

    from tools.bench_ladder import build_scaled
    from tools.shuffle_budget import count_exchanges
    from aced_etl_pod_spark.registry import registry
    from aced_etl_pod_spark.session import get_spark, pin

    sf = build_scaled(args.scale)
    spark = get_spark("q1q5-ab", shuffle_partitions=32)
    pin(spark, {
        "spark.sql.files.maxPartitionBytes": "4m",
        "spark.sql.leafNodeDefaultParallelism": "32",
    })
    reg = registry()

    variants = {
        "q1_current": reg["agg_group_sums"].fn(spark, sf),
        "q1_unguarded": q1_unguarded(spark, sf),
        "q5_current": reg["agg_time_bucket"].fn(spark, sf),
        "q5_datetrunc": q5_datetrunc(spark, sf),
    }
    for name, df in variants.items():
        plan = df._jdf.queryExecution().executedPlan().toString()
        n_ex = plan.count("Exchange ")
        print(f"{name}: {n_ex} exchanges", flush=True)

    for pair in (("q1_current", "q1_unguarded"), ("q5_current", "q5_datetrunc")):
        a = sorted(tuple(r) for r in variants[pair[0]].collect())
        b = sorted(tuple(r) for r in variants[pair[1]].collect())
        assert a == b, (pair, a[:2], b[:2])
    print("values agree", flush=True)

    def rerun(df):
        w = df.where(F.lit(True))
        w._jdf.queryExecution().executedPlan()
        return w

    for df in variants.values():
        rerun(df).collect()

    con = duckdb.connect()
    for t in ("lineitem", "events"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    oracles = {
        "q1": reg["agg_group_sums"].oracle,
        "q5": reg["agg_time_bucket"].oracle,
    }
    for q in oracles.values():
        con.execute(q).fetchall()

    samples = {n: [] for n in variants}
    duck = {n: [] for n in oracles}
    for _ in range(args.reps):
        for name, df in variants.items():
            w = rerun(df)
            t0 = time.perf_counter()
            w.collect()
            samples[name].append(time.perf_counter() - t0)
        for name, q in oracles.items():
            t0 = time.perf_counter()
            con.execute(q).fetchall()
            duck[name].append(time.perf_counter() - t0)

    med = {n: round(statistics.median(s), 4) for n, s in samples.items()}
    dmed = {n: round(statistics.median(s), 4) for n, s in duck.items()}
    print(json.dumps({
        "metric": f"q1q5_ab_x{args.scale}",
        **{f"{n}_sec": v for n, v in med.items()},
        "duck_q1_sec": dmed["q1"], "duck_q5_sec": dmed["q5"],
        "q1_guard_cost": round(med["q1_current"] / med["q1_unguarded"], 3),
        "q5_window_cost": round(med["q5_current"] / med["q5_datetrunc"], 3),
        "q1_ratio": round(med["q1_current"] / dmed["q1"], 2),
        "q5_ratio": round(med["q5_current"] / dmed["q5"], 2),
        "reps": args.reps,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
