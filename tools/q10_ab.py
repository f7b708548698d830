"""q10 (multi-distinct) stage decomposition + A/B at a tiled scale
(round-11 verdict item 2).

    python tools/q10_ab.py [--scale 800] [--reps 5]

Stages timed (all honest full-re-execution, warm medians, interleaved):

* scan    — filter-count over the two columns (the floor every variant pays)
* current — agg_distinct_count (r9 pair-dedup plan: pair exchange + tiny
            3-way EXPAND over distinct pairs)
* bitmask — ONE exchange on user_id with a decomposable bit_or partial
            agg (the q9 partial-re-agg trick applied to distincts): each
            event maps to a bit via a driver-built type dictionary (types
            are construction-bounded; guarded <= 62), map-side bit_or
            combines masks BEFORE the exchange, and all three counts fall
            out of the merged per-user masks: n_users = rows with non-null
            user, n_pairs = sum(bit_count(mask)), n_types =
            bit_count(bit_or(all masks)).
* setagg  — collect_set(event_type) per user (same single-exchange shape,
            string payload instead of a mask; the control for "is it the
            exchange count or the payload width").
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402


def bitmask_variant(spark, sf_dir):
    from aced_etl_pod_spark.tables import load

    e = load(spark, sf_dir, "events")
    # type dictionary: construction-bounded (5 types in the testdata;
    # guarded <= 62) — one cheap distinct over a dictionary-encoded
    # parquet column
    types = sorted(
        r[0]
        for r in e.select("event_type").distinct().collect()
        if r[0] is not None
    )
    assert len(types) <= 62, "bitmask plan needs a bounded type domain"
    mapping = F.create_map(
        *[x for t, i in ((t, i) for i, t in enumerate(types)) for x in (F.lit(t), F.lit(1 << i))]
    )
    masked = e.select(
        "user_id",
        F.coalesce(mapping[F.col("event_type")], F.lit(0)).alias("bit"),
    )
    per_user = masked.groupBy("user_id").agg(
        F.expr("bit_or(bit)").alias("mask")
    )
    return per_user.agg(
        F.sum(
            F.when(F.col("user_id").isNotNull(), F.bit_count("mask")).otherwise(0)
        ).cast("long").alias("n_pairs"),
        F.count(F.col("user_id")).cast("long").alias("n_users"),
        F.bit_count(F.expr("bit_or(mask)")).cast("long").alias("n_types"),
    )


def bitmask_inplan_variant(spark, sf_dir):
    """Same bitmask plan but with the type dictionary built INSIDE the
    plan (distinct -> row_number -> broadcast join) so nothing runs
    outside the timer — the honest version, and the only one that can
    ship: no driver collect, no plan-time job."""
    from pyspark.sql import Window as W

    from aced_etl_pod_spark.tables import load

    e = load(spark, sf_dir, "events")
    types = (
        e.select("event_type")
        .filter(F.col("event_type").isNotNull())
        .distinct()
        .withColumn("rn", F.row_number().over(W.orderBy("event_type")))
        .withColumn("bit", F.expr("shiftleft(1L, rn - 1)"))
        .drop("rn")
    )
    masked = e.join(F.broadcast(types), "event_type", "left").select(
        "user_id", F.coalesce("bit", F.lit(0)).alias("bit")
    )
    per_user = masked.groupBy("user_id").agg(
        F.expr("bit_or(bit)").alias("mask")
    )
    return per_user.agg(
        F.sum(
            F.when(F.col("user_id").isNotNull(), F.bit_count("mask")).otherwise(0)
        ).cast("long").alias("n_pairs"),
        F.count(F.col("user_id")).cast("long").alias("n_users"),
        F.bit_count(F.expr("bit_or(mask)")).cast("long").alias("n_types"),
    )


def setagg_variant(spark, sf_dir):
    from aced_etl_pod_spark.tables import load

    e = load(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        F.collect_set("event_type").alias("types")
    )
    return per_user.agg(
        F.sum(
            F.when(F.col("user_id").isNotNull(), F.size("types")).otherwise(0)
        ).cast("long").alias("n_pairs"),
        F.count(F.col("user_id")).cast("long").alias("n_users"),
        F.size(F.array_distinct(F.flatten(F.collect_list("types"))))
        .cast("long")
        .alias("n_types"),
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=int, default=800)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    import duckdb

    from tools.bench_ladder import build_scaled
    from aced_etl_pod_spark.registry import registry
    from aced_etl_pod_spark.session import get_spark, pin
    from aced_etl_pod_spark.tables import load

    sf = build_scaled(args.scale)
    spark = get_spark("q10-ab", shuffle_partitions=32)
    pin(spark, {
        "spark.sql.files.maxPartitionBytes": "4m",
        "spark.sql.leafNodeDefaultParallelism": "32",
    })
    reg = registry()

    e = load(spark, sf, "events")
    variants = {
        "scan": e.filter(
            F.col("user_id").isNotNull() | F.col("event_type").isNotNull()
        ).select(F.count("*").alias("n")),
        "current": reg["agg_distinct_count"].fn(spark, sf),
        "bitmask": bitmask_variant(spark, sf),
        "bitmask_inplan": bitmask_inplan_variant(spark, sf),
        "setagg": setagg_variant(spark, sf),
    }

    # value check: all three aggregate variants must agree exactly
    vals = {
        n: variants[n].collect()[0].asDict()
        for n in ("current", "bitmask", "bitmask_inplan", "setagg")
    }
    assert (
        vals["current"] == vals["bitmask"]
        == vals["bitmask_inplan"] == vals["setagg"]
    ), vals
    print("values agree:", vals["current"], flush=True)

    def rerun(df):
        w = df.where(F.lit(True))
        w._jdf.queryExecution().executedPlan()
        return w

    for df in variants.values():
        rerun(df).collect()

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'")
    oracle = reg["agg_distinct_count"].oracle
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
        "metric": f"q10_ab_x{args.scale}",
        **{f"{n}_sec": v for n, v in med.items()},
        "duckdb_sec": dmed,
        "current_ratio": round(med["current"] / dmed, 2),
        "bitmask_ratio": round(med["bitmask"] / dmed, 2),
        "bitmask_inplan_ratio": round(med["bitmask_inplan"] / dmed, 2),
        "setagg_ratio": round(med["setagg"] / dmed, 2),
        "reps": args.reps,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
