"""text_line_dedup_c4 ingest-layout A/B (round-13 verdict item 7 — the
one lever the r12 close left half-open: "a line-digest ingest layout,
~0.1x but ~3x document storage; ship behind a retention budget or close
it explicitly").

    python tools/linededup_layout_ab.py [--scale 40] [--reps 3]

Variants, all asserted sorted-equal to the current op AND the DuckDB
oracle before timing:

* current    — the shipped query-time plan (regex spans → binary-digest
               window → reassembly; r12 closing row 1.08x at x40)
* spans      — ingest layout persisting (doc_id, pos, line, digest):
               query skips the regex split + sha2 but still pays the
               corpus-global window + reassembly
* firstocc   — ingest layout persisting the WINDOW OUTPUT
               (doc_id, pos, kline): query is reassembly only. Append-
               incremental by construction: first occurrence = min
               (doc_id, pos), so appending higher doc_ids never flips
               an existing kept flag — a new batch folds in by checking
               its digests against the persisted first-occurrence
               registry (the q5 continuous-aggregate property).

Storage multipliers vs documents.parquet are reported — that is the
cost side of the decision recorded in PLANS.md round-13.
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import Window as W  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def _spans(spark, sf):
    from aced_etl_pod_spark.tables import load

    return (
        load(spark, sf, "documents")
        .filter(F.col("text").isNotNull())
        .select(
            "doc_id",
            F.posexplode(
                F.expr(
                    r"regexp_extract_all(text,"
                    r" '(?:^| )([^ ]*(?: [^ ]*){0,7})', 1)"
                )
            ).alias("pos", "line"),
        )
    )


def _reassemble(ranked):
    stats = ranked.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_lines"),
        (F.count("*") - F.count("kline")).cast("long").alias("n_dropped"),
        F.coalesce(
            F.array_join(
                F.transform(
                    F.filter(
                        F.array_sort(F.collect_list(F.struct("pos", "kline"))),
                        lambda x: x["kline"].isNotNull(),
                    ),
                    lambda x: x["kline"],
                ),
                " ",
            ),
            F.lit(""),
        ).alias("kept_text"),
    )
    return stats.select("doc_id", "n_lines", "n_dropped", "kept_text").orderBy(
        "doc_id"
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=int, default=40)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import duckdb

    from aced_etl_pod_spark.registry import registry
    from aced_etl_pod_spark.session import get_spark, pin
    from aced_etl_pod_spark.tables import scratch_dir
    from tools.bench_ladder import build_scaled

    sf = build_scaled(args.scale)
    spark = get_spark("linededup-layout-ab", shuffle_partitions=32)
    pin(spark, {
        "spark.sql.files.maxPartitionBytes": "4m",
        "spark.sql.leafNodeDefaultParallelism": "32",
    })
    reg = registry()

    st = os.stat(os.path.join(sf, "documents.parquet"))
    base = scratch_dir(
        f"linededup_layout_x{args.scale}_{st.st_mtime_ns:x}"
    )

    # --- build both prototype layouts (one pass each, timed) ---------
    spans_path = os.path.join(base, "spans")
    first_path = os.path.join(base, "firstocc")
    digest = F.unhex(F.sha2("line", 256)).alias("digest")
    t0 = time.perf_counter()
    if not os.path.exists(os.path.join(base, "_SPANS_DONE")):
        _spans(spark, sf).select("doc_id", "pos", "line", digest).write.mode(
            "overwrite"
        ).parquet(spans_path)
        open(os.path.join(base, "_SPANS_DONE"), "w").close()
    build_spans = time.perf_counter() - t0
    t0 = time.perf_counter()
    if not os.path.exists(os.path.join(base, "_FIRST_DONE")):
        w = W.partitionBy(F.unhex(F.sha2("line", 256))).orderBy("doc_id", "pos")
        (
            _spans(spark, sf)
            .withColumn(
                "kline",
                F.when(F.row_number().over(w) == 1, F.col("line")),
            )
            .select("doc_id", "pos", "kline")
            .write.mode("overwrite")
            .parquet(first_path)
        )
        open(os.path.join(base, "_FIRST_DONE"), "w").close()
    build_first = time.perf_counter() - t0

    def du(p):
        total = 0
        for root, _, files in os.walk(p):
            total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
        return total

    doc_bytes = st.st_size
    print(
        f"storage: documents {doc_bytes / 1e6:.1f} MB, spans layout "
        f"{du(spans_path) / 1e6:.1f} MB ({du(spans_path) / doc_bytes:.2f}x),"
        f" firstocc layout {du(first_path) / 1e6:.1f} MB"
        f" ({du(first_path) / doc_bytes:.2f}x); builds"
        f" {build_spans:.2f} s / {build_first:.2f} s",
        flush=True,
    )

    # --- variants ----------------------------------------------------
    w_digest = W.partitionBy("digest").orderBy("doc_id", "pos")
    sp = spark.read.parquet(spans_path)
    variants = {
        "current": reg["text_line_dedup_c4"].fn(spark, sf),
        "spans": _reassemble(
            sp.withColumn(
                "kline",
                F.when(F.row_number().over(w_digest) == 1, F.col("line")),
            )
        ),
        "firstocc": _reassemble(spark.read.parquet(first_path)),
    }
    vals = {
        n: sorted(tuple(r) for r in df.collect())
        for n, df in variants.items()
    }
    assert vals["current"] == vals["spans"] == vals["firstocc"], (
        "layout variant diverged from the shipped op"
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'"
    )
    oracle = reg["text_line_dedup_c4"].oracle
    ov = sorted(tuple(r) for r in con.execute(oracle).fetchall())
    assert vals["current"] == ov, "op diverged from oracle"
    print("values identical across 3 variants + oracle", flush=True)

    def rerun(df):
        w = df.where(F.lit(True))
        w._jdf.queryExecution().executedPlan()
        return w

    for df in variants.values():
        rerun(df).collect()
    con.execute(oracle).fetchall()
    samples = {n: [] for n in variants}
    duck = []
    for rep in range(args.reps):
        for name, df in variants.items():
            w = rerun(df)
            t0 = time.perf_counter()
            w.collect()
            samples[name].append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        con.execute(oracle).fetchall()
        duck.append(time.perf_counter() - t0)
    dm = statistics.median(duck)
    print(f"duckdb oracle: {dm:.3f} s")
    for n, ts in samples.items():
        m = statistics.median(ts)
        print(f"{n:9s} {m:7.3f} s  ratio {m / dm:5.2f}x")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
