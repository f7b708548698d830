"""Delta-ingest vs full-rebuild A/B for the maintained layouts
(round-13 verdict item 3: the r12 fixtures rebuilt from scratch on any
source change; the mask table was *described* as incrementally
maintainable but no append-batch merge path existed).

    python tools/incremental_layout_ab.py [--scale 200]

Scenario: the xN tiling is the "current" corpus; its last key-offset
replica plays the append batch (base = replicas 0..N-2, delta = replica
N-1 — a genuinely new slice: fresh users/orders, same type/dimension
domains, exactly what an ingest append looks like).

Measured per layout (q10 per-user masks, q1 pricing summary):
* full rebuild over base ⧺ delta (what r12 had to do), vs
* delta merge: one pass over the DELTA only + the associative fold into
  the persisted base layout (aggs.merge_user_mask_delta /
  merge_q1_summary_delta).
Answers from the merged layout are asserted equal to the full rebuild's
AND to the DuckDB recompute-from-base oracle on the combined input
before any number is reported.
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

SRC = "/root/testdata/sf0.1"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=int, default=200)
    args = ap.parse_args()

    import duckdb

    from aced_etl_pod_spark.oracle import compare, duck_con
    from aced_etl_pod_spark.operators.aggs import (
        _q1_summary_fixture,
        _user_mask_fixture,
        mask_table_counts,
        merge_q1_summary_delta,
        merge_user_mask_delta,
        q1_summary_answer,
    )
    from aced_etl_pod_spark.registry import registry
    from aced_etl_pod_spark.session import get_spark, pin
    from aced_etl_pod_spark.tables import load, scratch_dir
    from tools.bench_ladder import build_scaled

    combined = build_scaled(args.scale)
    spark = get_spark("incremental-ab", shuffle_partitions=32)
    pin(spark, {
        "spark.sql.files.maxPartitionBytes": "4m",
        "spark.sql.leafNodeDefaultParallelism": "32",
    })
    reg = registry()
    con = duckdb.connect()

    # base dir = combined minus the last replica (key-offset split)
    st = os.stat(os.path.join(combined, "events.parquet"))
    base_dir = scratch_dir(
        f"incr_base_x{args.scale}_{st.st_mtime_ns:x}"
    )
    marker = os.path.join(base_dir, "_DONE")
    spans = {
        t: con.execute(
            f"SELECT max({k}) + 1 FROM '{SRC}/{t}.parquet'"
        ).fetchone()[0]
        for t, k in (("events", "event_id"), ("lineitem", "l_orderkey"))
    }
    cut = {
        "events": ("event_id", spans["events"] * (args.scale - 1)),
        "lineitem": ("l_orderkey", spans["lineitem"] * (args.scale - 1)),
    }
    if not os.path.exists(marker):
        for t, (k, c) in cut.items():
            con.execute(
                f"COPY (SELECT * FROM '{combined}/{t}.parquet' WHERE {k} < {c})"
                f" TO '{base_dir}/{t}.parquet' (FORMAT PARQUET)"
            )
        open(marker, "w").close()

    out = {}

    # ---------------- q10 per-user mask table ------------------------
    base_fix = _user_mask_fixture(spark, base_dir)  # base layout (given)
    delta = load(spark, combined, "events").filter(
        F.col("event_id") >= cut["events"][1]
    )
    t0 = time.perf_counter()
    merged = merge_user_mask_delta(
        spark, base_fix, delta,
        os.path.join(scratch_dir(), f"incr_masks_x{args.scale}"),
    )
    t_merge = time.perf_counter() - t0

    # full rebuild timed cold: drop the fingerprint-cached fixture first
    sf_tag = combined.rstrip("/").rsplit("/", 1)[-1]
    stc = os.stat(os.path.join(combined, "events.parquet"))
    full_name = f"q10mask_events_{sf_tag}_{stc.st_mtime_ns:x}_{stc.st_size:x}"
    shutil.rmtree(os.path.join(scratch_dir(), full_name), ignore_errors=True)
    t0 = time.perf_counter()
    full_fix = _user_mask_fixture(spark, combined)
    t_full = time.perf_counter() - t0

    a = sorted(
        tuple(r)
        for r in mask_table_counts(
            spark.read.parquet(f"{merged}/masks")
        ).collect()
    )
    b = sorted(
        tuple(r)
        for r in mask_table_counts(
            spark.read.parquet(f"{full_fix}/masks")
        ).collect()
    )
    assert a == b, (a, b)
    errs = compare(
        mask_table_counts(spark.read.parquet(f"{merged}/masks")).toPandas(),
        duck_con(combined).execute(
            reg["agg_distinct_count_mask_ingest"].oracle
        ).df(),
    )
    assert not errs, errs
    out["q10_masks"] = {
        "delta_merge_sec": round(t_merge, 2),
        "full_rebuild_sec": round(t_full, 2),
        "speedup": round(t_full / t_merge, 1),
    }
    print(f"q10 masks: {out['q10_masks']}", flush=True)

    # ---------------- q1 pricing summary -----------------------------
    base_q1 = _q1_summary_fixture(spark, base_dir)
    delta_li = load(spark, combined, "lineitem").filter(
        F.col("l_orderkey") >= cut["lineitem"][1]
    )
    t0 = time.perf_counter()
    merged_q1 = merge_q1_summary_delta(
        spark, base_q1, delta_li,
        os.path.join(scratch_dir(), f"incr_q1_x{args.scale}"),
    )
    t_merge1 = time.perf_counter() - t0
    stl = os.stat(os.path.join(combined, "lineitem.parquet"))
    full1_name = f"q1sum_lineitem_{sf_tag}_{stl.st_mtime_ns:x}_{stl.st_size:x}"
    shutil.rmtree(os.path.join(scratch_dir(), full1_name), ignore_errors=True)
    t0 = time.perf_counter()
    full_q1 = _q1_summary_fixture(spark, combined)
    t_full1 = time.perf_counter() - t0

    a = sorted(tuple(r) for r in q1_summary_answer(spark, merged_q1).collect())
    b = sorted(tuple(r) for r in q1_summary_answer(spark, full_q1).collect())
    assert a == b, (a[:2], b[:2])

    # engine-vs-oracle at TILED scale follows the q1_summary_ab /
    # q2_bucketed_ab convention: money sums reach ~1e12 where parallel
    # fold-order ULP drift exceeds the post-round cent, so floats
    # compare at 1e-12 REL (the exact cell-string compare() is the
    # driver-scale contract, where the drift is sub-cent and the hash
    # is exact — and the merged-vs-rebuild assert above stays EXACT)
    def close(x, y):
        if isinstance(x, float) and isinstance(y, float):
            return abs(x - y) <= 1e-12 * max(abs(x), abs(y), 1.0)
        return x == y

    ov = sorted(
        tuple(r)
        for r in duck_con(combined)
        .execute(reg["agg_group_sums_summary_ingest"].oracle)
        .fetchall()
    )
    assert len(a) == len(ov) and all(
        len(r) == len(s) and all(close(x, y) for x, y in zip(r, s))
        for r, s in zip(a, ov)
    ), (a[:2], ov[:2])
    out["q1_summary"] = {
        "delta_merge_sec": round(t_merge1, 2),
        "full_rebuild_sec": round(t_full1, 2),
        "speedup": round(t_full1 / t_merge1, 1),
    }
    print(f"q1 summary: {out['q1_summary']}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
