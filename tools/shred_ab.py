"""Schema-driven shred-at-ingest: one-time cost vs per-query payoff at
a tiled scale (round-11 verdict item 5's x800 row).

    python tools/shred_ab.py [--scale 800] [--reps 5]

Times, interleaved under the honest full-re-execution protocol:

* shred   — fn_json_shred_schema_ingest's hot plan: typed-column
            scan+agg over the shredded parquet (no JSON anywhere)
* rawparse— the SAME aggregates computed from the raw envelopes with a
            per-query from_json at the inferred schema (what every
            query pays without the ingest shred)
* duckdb  — the registered oracle over the base events parquet

plus the one-time fixture build (envelope write + sample-infer + shred
write), reported so the amortization story is a number.
"""

from __future__ import annotations

import argparse
import json
import os
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

    from tools.bench_ladder import build_scaled
    from aced_etl_pod_spark.operators.functions import (
        _schema_shredded_events_fixture,
        fn_json_shred_schema_ingest,
    )
    from aced_etl_pod_spark.registry import registry
    from aced_etl_pod_spark.session import get_spark, pin
    from aced_etl_pod_spark.tables import scratch_dir

    sf = build_scaled(args.scale)
    spark = get_spark("shred-ab", shuffle_partitions=32)
    pin(spark, {
        "spark.sql.files.maxPartitionBytes": "4m",
        "spark.sql.leafNodeDefaultParallelism": "32",
    })
    reg = registry()

    sf_tag = sf.rstrip("/").rsplit("/", 1)[-1]
    pre = [
        d for d in os.listdir(scratch_dir())
        if d.startswith(f"shredsch_events_{sf_tag}_")
    ]
    build_sec = None
    if not pre:
        t0 = time.perf_counter()
        path = _schema_shredded_events_fixture(spark, sf)
        build_sec = time.perf_counter() - t0
    else:
        path = _schema_shredded_events_fixture(spark, sf)

    shred = fn_json_shred_schema_ingest(spark, sf)

    raw = spark.read.parquet(f"{path}/raw")
    sample = [r["doc"] for r in raw.limit(512).collect() if r["doc"]]
    inferred = spark.read.json(
        spark.sparkContext.parallelize(sample, 1)
    ).schema
    parsed = raw.select(F.from_json("doc", inferred).alias("d")).select(
        F.col("d.event_type").alias("event_type"),
        F.col("d.value").cast("double").alias("value"),
        F.col("d.user_id").cast("long").alias("user_id"),
        F.col("d.props.k").cast("double").alias("k"),
    )
    k_int = F.when(
        F.col("k").between(-2147483648, 2147483647)
        & (F.col("k") == F.floor("k")),
        F.col("k").cast("int"),
    )
    rawparse = (
        parsed.select("event_type", "value", "user_id", k_int.alias("k_i"))
        .groupBy("event_type")
        .agg(
            F.round(F.avg("value"), 2).alias("avg_value"),
            F.sum("k_i").cast("long").alias("sum_k"),
            F.countDistinct("user_id").alias("n_users"),
            F.count("*").alias("n_events"),
        )
    )

    a = sorted(tuple(r) for r in shred.collect())
    b = sorted(tuple(r) for r in rawparse.collect())
    assert a == b, (a[:3], b[:3])
    print("values agree", flush=True)

    def rerun(df):
        w = df.where(F.lit(True))
        w._jdf.queryExecution().executedPlan()
        return w

    variants = {"shred": shred, "rawparse": rawparse}
    for df in variants.values():
        rerun(df).collect()
        rerun(df).collect()

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'")
    oracle = reg["fn_json_shred_schema_ingest"].oracle
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

    med = {n: round(statistics.median(s), 4) for n, s in samples.items()}
    dmed = round(statistics.median(duck), 4)
    print(json.dumps({
        "metric": f"shred_ab_x{args.scale}",
        **{f"{n}_sec": v for n, v in med.items()},
        "duckdb_sec": dmed,
        "shred_ratio": round(med["shred"] / dmed, 2),
        "rawparse_ratio": round(med["rawparse"] / dmed, 2),
        "payoff": round(med["rawparse"] / med["shred"], 2),
        "build_once_sec": round(build_sec, 2) if build_sec else None,
        "reps": args.reps,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
