"""q7 (token stats) stage decomposition + A/B at a tiled scale
(round-11 verdict item 3): after the round-10 Arrow count_substring
kernel, where does the remaining 7.7x-at-x800 wall sit — Arrow transfer
of the text column, the Python-side compute, or the JVM final agg?

    python tools/q7_ab.py [--scale 800] [--reps 5]

Variants (all honest full re-execution, interleaved, warm medians):

* scan           — filter-count over (lang, text, n_chars): the parquet
                   decode floor every variant pays
* transfer_floor — mapInArrow that receives the same three columns and
                   emits only per-batch row counts, NO token compute:
                   isolates JVM->Arrow->Python transfer cost
* current        — text_tokenize_stats (the shipped dispatch: Arrow
                   count_substring kernel at this scale)
* jvm_arith      — length(text)-length(replace(text,' ',''))+1 in
                   whole-stage codegen (r9 rejected it pre-protocol-fix;
                   re-tested per the verdict: the negative may be stale)
* arrow_partial  — the Arrow kernel with PER-BATCH PARTIAL AGGREGATION:
                   each batch emits one row per lang (sum/count/max
                   partials) so the Python->JVM return transfer and the
                   downstream agg shrink from one-row-per-doc to
                   one-row-per-(batch, lang) — the q9 partial trick on
                   the kernel boundary.
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402


def transfer_floor_variant(spark, sf_dir):
    import pyarrow as pa

    from aced_etl_pod_spark.tables import load

    def gen(batches):
        for b in batches:
            yield pa.RecordBatch.from_arrays(
                [pa.array([b.num_rows], pa.int64())], ["n"]
            )

    d = load(spark, sf_dir, "documents").select("lang", "text", "n_chars")
    return d.mapInArrow(gen, "n long").agg(F.sum("n").alias("n_rows"))


def jvm_arith_variant(spark, sf_dir):
    from aced_etl_pod_spark.tables import load

    d = load(spark, sf_dir, "documents")
    # NON-regex replace (regexp_replace measured 4x slower than even the
    # String[]-allocating split at x200 — the regex engine per row)
    ntok = F.when(
        F.col("text").isNotNull(),
        F.length("text") - F.length(F.expr("replace(text, ' ', '')")) + 1,
    )
    return (
        d.select("lang", ntok.alias("ntok"), "n_chars")
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("ntok"), 2).alias("avg_tokens"),
            F.max("ntok").cast("long").alias("max_tokens"),
            F.round(F.avg("n_chars"), 2).alias("avg_chars"),
        )
    )


def _partial_kernel(batches):
    import pyarrow as pa
    import pyarrow.compute as pc

    for b in batches:
        if b.num_rows == 0:
            continue
        ntok = pc.add(pc.count_substring(b.column("text"), " "), 1).cast(
            pa.int64()
        )
        t = pa.table(
            {
                "lang": b.column("lang"),
                "ntok": ntok,
                "n_chars": b.column("n_chars"),
            }
        )
        g = t.group_by("lang").aggregate(
            [
                ("lang", "count"),
                ("ntok", "sum"),
                ("ntok", "count"),
                ("ntok", "max"),
                ("n_chars", "sum"),
                ("n_chars", "count"),
            ]
        )
        yield pa.RecordBatch.from_arrays(
            [
                g.column("lang").combine_chunks(),
                g.column("lang_count").cast(pa.int64()).combine_chunks(),
                g.column("ntok_sum").cast(pa.int64()).combine_chunks(),
                g.column("ntok_count").cast(pa.int64()).combine_chunks(),
                g.column("ntok_max").cast(pa.int64()).combine_chunks(),
                g.column("n_chars_sum").cast(pa.int64()).combine_chunks(),
                g.column("n_chars_count").cast(pa.int64()).combine_chunks(),
            ],
            ["lang", "n_rows", "s_ntok", "c_ntok", "m_ntok", "s_chars", "c_chars"],
        )


def arrow_partial_variant(spark, sf_dir):
    from aced_etl_pod_spark.tables import load

    d = load(spark, sf_dir, "documents").select("lang", "text", "n_chars")
    partial = d.mapInArrow(
        _partial_kernel,
        "lang string, n_rows long, s_ntok long, c_ntok long, m_ntok long,"
        " s_chars long, c_chars long",
    )
    return partial.groupBy("lang").agg(
        F.sum("n_rows").alias("n_docs"),
        F.round(F.sum("s_ntok") / F.sum("c_ntok"), 2).alias("avg_tokens"),
        F.max("m_ntok").cast("long").alias("max_tokens"),
        F.round(F.sum("s_chars") / F.sum("c_chars"), 2).alias("avg_chars"),
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
    spark = get_spark("q7-ab", shuffle_partitions=32)
    pin(spark, {
        "spark.sql.files.maxPartitionBytes": "4m",
        "spark.sql.leafNodeDefaultParallelism": "32",
    })
    reg = registry()

    # round-12: time the one-time tokenize-at-ingest build (the honest
    # price of the layout 'current' now dispatches to at this scale)
    from aced_etl_pod_spark.operators.text import (
        _token_stats_fixture,
        text_tokenize_stats_ingest,
    )

    t0 = time.perf_counter()
    _token_stats_fixture(spark, sf)
    build_s = time.perf_counter() - t0  # ~0 if the fixture pre-exists

    d = load(spark, sf, "documents")
    variants = {
        "scan": d.filter(
            F.col("text").isNotNull() | F.col("lang").isNotNull()
        ).select(F.count("*").alias("n")),
        "transfer_floor": transfer_floor_variant(spark, sf),
        "current": reg["text_tokenize_stats"].fn(spark, sf),
        "jvm_arith": jvm_arith_variant(spark, sf),
        "arrow_partial": arrow_partial_variant(spark, sf),
        "ingest": text_tokenize_stats_ingest(spark, sf),
    }

    vals = {
        n: sorted(
            tuple(r) for r in variants[n].collect()
        )
        for n in ("current", "jvm_arith", "arrow_partial", "ingest")
    }
    assert (
        vals["current"] == vals["jvm_arith"] == vals["arrow_partial"]
        == vals["ingest"]
    ), vals
    print(f"values agree (build {build_s:.2f} s)", flush=True)

    def rerun(df):
        w = df.where(F.lit(True))
        w._jdf.queryExecution().executedPlan()
        return w

    for df in variants.values():
        rerun(df).collect()

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'"
    )
    oracle = reg["text_tokenize_stats"].oracle
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
        "metric": f"q7_ab_x{args.scale}",
        **{f"{n}_sec": v for n, v in med.items()},
        "duckdb_sec": dmed,
        **{
            f"{n}_ratio": round(med[n] / dmed, 2)
            for n in ("current", "jvm_arith", "arrow_partial", "ingest")
        },
        "build_sec": round(build_s, 2),
        "reps": args.reps,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
