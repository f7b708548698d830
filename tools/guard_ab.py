"""A/B the finite_vec scan guard's marginal cost on the q8 exact kernel
(judge r7 item 3).

    python tools/guard_ab.py [--reps 7] [--scale 200]

Measures `sim_cosine_topk_fast`'s kernel (codegen-unrolled cosine over
dim-64 embeddings) WITH and WITHOUT the `finite_vec` scan filter, at
sf0.1 (2 k vectors — job-floor regime) and at a scaled fixture
(--scale × sf0.1 rows — the marginal-rate regime the r7 kernel ladder
used). Warm medians; the scaled fixture also gets a count() control so
the guard's cost can be stated per-row above the job floor.

The question: is the per-row `forall(embedding, |x|<1e12)` (64 lanes)
material next to the unrolled dot product (64 mul-adds + norm)? If
>10% of the kernel, vector validation should move to ingest (persist a
validated corpus / a well_scaled flag column) and the guard stay only
on raw external inputs.
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from aced_etl_pod_spark.functions.similarity import (  # noqa: E402
    brute_force_topk_unrolled,
)
from aced_etl_pod_spark.operators.util import finite_vec  # noqa: E402
from aced_etl_pod_spark.session import get_spark  # noqa: E402
from aced_etl_pod_spark.tables import load, scratch_dir  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def scaled_fixture(spark, scale: int) -> str:
    """sf0.1 embeddings tiled ×scale with distinct vec_ids (the r7
    ladder recipe), written once per (source, scale)."""
    st = os.stat(os.path.join(SF, "embeddings.parquet"))
    out = scratch_dir(f"abguard_x{scale}_{st.st_mtime_ns:x}")
    marker = os.path.join(out, "_DONE")
    if not os.path.exists(marker):
        emb = load(spark, SF, "embeddings").select("vec_id", "embedding")
        n = emb.count()
        tiled = emb.crossJoin(
            F.broadcast(spark.range(scale).withColumnRenamed("id", "rep"))
        ).select(
            (F.col("vec_id") + F.col("rep") * n).alias("vec_id"), "embedding"
        )
        tiled.write.mode("overwrite").parquet(os.path.join(out, "emb"))
        open(marker, "w").close()
    return os.path.join(out, "emb")


def run_case(spark, emb, guard: bool, reps: int) -> float:
    src = emb.filter(finite_vec(F.col("embedding"))) if guard else emb
    q = emb.filter(F.col("vec_id") == 0)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        brute_force_topk_unrolled(src, q, k=10).collect()
        times.append(time.perf_counter() - t0)
    return statistics.median(times)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=7)
    ap.add_argument("--scale", type=int, default=200)
    args = ap.parse_args()

    spark = get_spark("guard-ab")
    emb_small = load(spark, SF, "embeddings").select("vec_id", "embedding")
    n_small = emb_small.count()

    big_path = scaled_fixture(spark, args.scale)
    emb_big = spark.read.parquet(big_path)
    n_big = emb_big.count()

    # job-floor control at the big scale (scan + count, no kernel)
    floors = []
    for _ in range(args.reps):
        t0 = time.perf_counter()
        emb_big.count()
        floors.append(time.perf_counter() - t0)
    floor = statistics.median(floors)

    results = {}
    for label, emb, n in [("sf0.1", emb_small, n_small), (f"x{args.scale}", emb_big, n_big)]:
        off = run_case(spark, emb, guard=False, reps=args.reps)
        on = run_case(spark, emb, guard=True, reps=args.reps)
        results[label] = (n, off, on)
        print(
            f"{label}: n={n} unguarded={off * 1e3:.1f}ms guarded={on * 1e3:.1f}ms "
            f"delta={(on - off) * 1e3:+.1f}ms ({(on / off - 1) * 100:+.1f}%)",
            flush=True,
        )
    n, off, on = results[f"x{args.scale}"]
    print(
        f"x{args.scale} floor(count)={floor * 1e3:.1f}ms; above-floor kernel: "
        f"unguarded={(off - floor) * 1e6 / n:.3f}us/row guarded={(on - floor) * 1e6 / n:.3f}us/row "
        f"guard marginal={(on - off) * 1e6 / n:+.3f}us/row "
        f"({(on - off) / max(off - floor, 1e-9) * 100:+.1f}% of the above-floor kernel)"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
