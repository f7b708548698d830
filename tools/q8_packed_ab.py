"""q8-exact packed-layout A/B (round-12 optimization session 2).

    python tools/q8_packed_ab.py [--scale 800] [--reps 5]

Background: tools/q8_exact_ab.py shipped the mapInArrow gemm kernel
(7.1x -> 2.5x vs DuckDB at x800) and the residue was adjudicated an
Arrow-transfer kernel floor. This session DECOMPOSED that floor: a
mapInArrow pass-through over the list column costs the same wall as the
full kernel (the gemm adds ~nothing), and the same pass-through over a
packed float32-binary column costs 2.8x less (0.51 vs 1.41 s at x800)
— the boundary cost is the JVM's per-element list conversion, which a
per-row binary memcpy avoids. tables.load_packed_embeddings persists
that packed form at ingest.

Variants (honest full re-execution, interleaved, warm medians):

* fast   — sim_cosine_topk_fast: codegen-unrolled JVM fold (no Python)
* arrow  — sim_cosine_topk_arrow: gemm kernel over the list column
* packed — sim_cosine_topk_packed_ingest: gemm kernel over the packed
           binary layout

The one-time PACK build cost is timed separately (validated copy +
pack pass) with its amortization count. Values are asserted equal
across variants AND against the DuckDB oracle before timing (cosines
are bit-identical by construction — float32 bits round-trip the pack).
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

    from aced_etl_pod_spark.registry import registry
    from aced_etl_pod_spark.session import get_spark, pin
    from aced_etl_pod_spark.tables import load_packed_embeddings
    from tools.bench_ladder import build_scaled

    sf = build_scaled(args.scale)
    spark = get_spark("q8-packed-ab", shuffle_partitions=32)
    pin(spark, {
        "spark.sql.files.maxPartitionBytes": "4m",
        "spark.sql.leafNodeDefaultParallelism": "32",
    })

    t0 = time.perf_counter()
    load_packed_embeddings(spark, sf)
    build_s = time.perf_counter() - t0  # ~0 if the fixture pre-exists

    reg = registry()
    variants = {
        "fast": reg["sim_cosine_topk_fast"].fn(spark, sf),
        "arrow": reg["sim_cosine_topk_arrow"].fn(spark, sf),
        "packed": reg["sim_cosine_topk_packed_ingest"].fn(spark, sf),
    }

    vals = {
        n: sorted(tuple(r) for r in df.collect())
        for n, df in variants.items()
    }
    assert vals["fast"] == vals["arrow"] == vals["packed"], vals

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{sf}/embeddings.parquet'"
    )
    oracle = reg["sim_cosine_topk_packed_ingest"].oracle
    ov = sorted(tuple(r) for r in con.execute(oracle).fetchall())
    assert vals["packed"] == ov, (vals["packed"][:3], ov[:3])
    print(f"values identical across 3 variants + oracle "
          f"(pack build {build_s:.2f} s)", flush=True)

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
        print(f"{n:8s} {m:7.3f} s  ratio {m / dm:5.2f}x")
    saving = med["arrow"] - med["packed"]
    if saving > 0 and build_s > 0.5:
        print(
            f"pack build amortizes after {build_s / saving:.1f} queries vs"
            f" the arrow kernel (build {build_s:.2f} s /"
            f" saving {saving:.2f} s/query)"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
