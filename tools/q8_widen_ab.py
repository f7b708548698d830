"""q8-exact blocked-widen A/B (round-13 verdict item 4).

    python tools/q8_widen_ab.py [--scale 800] [--reps 5]

r12 closed the packed layout with one residual copy: ``_unpack_vectors``
ended in ``.astype(np.float64)`` — a full-batch float64 materialization
(2x the f32 bytes written+reread through memory) before the gemm. r13
replaces it with a cache-blocked widen (``_packed_dots_norms``): 8192-row
f64 blocks consumed in cache by the same BLAS dgemv / pairwise-sum
kernels. Offline numpy A/B (400 k × 64): dots+norms 0.198 → 0.138 s and
bit-identical; the einsum alternative (0.066 s) is NOT bit-identical
(sequential vs pairwise/BLAS accumulation order) — recorded NEGATIVE.

This tool proves the same on the real corpus: a VERIFY kernel computes
both paths per Arrow batch and raises on any bit difference across every
cosine of every row, then times the shipped op (blocked) against a
full-widen twin and DuckDB on identical files.
"""

from __future__ import annotations

import argparse
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def _twin(df_packed, query, widen_full: bool, k: int = 10):
    """brute_force_topk_packed with the widen mode pinned (full-batch
    astype vs blocked) — the timing twin for the A/B."""
    import pyarrow as pa

    from aced_etl_pod_spark.functions.similarity import (
        _batch_topk_indices,
        _packed_dots_norms,
        _unpack_vectors,
    )

    head1 = query.select("embedding").head(1)
    qvec = np.asarray(head1[0][0], dtype=np.float64)
    q_norm = float(np.sqrt(qvec @ qvec))
    dim = len(qvec)

    def gen(batches):
        for b in batches:
            if b.num_rows == 0:
                continue
            ids = b.column(0)
            arr = b.column(1)
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            if widen_full:
                X = _unpack_vectors(arr, b.num_rows, dim, "vec", widen=True)
                dots = X @ qvec
                norms = np.sqrt((X * X).sum(axis=1))
            else:
                X4 = _unpack_vectors(arr, b.num_rows, dim, "vec", widen=False)
                dots, norms = _packed_dots_norms(X4, qvec)
            cos = dots / (norms * q_norm)
            ids_np = ids.to_numpy(zero_copy_only=False)
            idx = _batch_topk_indices(ids_np, cos, k)
            yield pa.RecordBatch.from_arrays(
                [ids.take(pa.array(idx)), pa.array(cos[idx])],
                names=["vec_id", "cos_sim"],
            )

    scored = df_packed.select("vec_id", "vec").mapInArrow(
        gen, "vec_id long, cos_sim double"
    )
    return scored.orderBy(F.desc("cos_sim"), "vec_id").limit(k)


def _verify_df(df_packed, query):
    """One pass that computes BOTH widen paths per batch and asserts
    every cosine bit-identical (returns per-batch row counts)."""
    import pyarrow as pa

    from aced_etl_pod_spark.functions.similarity import (
        _packed_dots_norms,
        _unpack_vectors,
    )

    head1 = query.select("embedding").head(1)
    qvec = np.asarray(head1[0][0], dtype=np.float64)
    q_norm = float(np.sqrt(qvec @ qvec))
    dim = len(qvec)

    def gen(batches):
        for b in batches:
            if b.num_rows == 0:
                continue
            arr = b.column(1)
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            X = _unpack_vectors(arr, b.num_rows, dim, "vec", widen=True)
            cos_full = (X @ qvec) / (np.sqrt((X * X).sum(axis=1)) * q_norm)
            X4 = _unpack_vectors(arr, b.num_rows, dim, "vec", widen=False)
            d, nn = _packed_dots_norms(X4, qvec)
            cos_blk = d / (nn * q_norm)
            if not np.array_equal(
                cos_full.view(np.int64), cos_blk.view(np.int64)
            ):
                bad = int(
                    (cos_full.view(np.int64) != cos_blk.view(np.int64)).sum()
                )
                raise AssertionError(
                    f"blocked widen NOT bit-identical: {bad}/{b.num_rows} "
                    "cosines differ in this batch"
                )
            yield pa.RecordBatch.from_arrays(
                [pa.array([b.num_rows])], names=["n"]
            )

    return df_packed.select("vec_id", "vec").mapInArrow(gen, "n long")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=int, default=800)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    import duckdb

    from aced_etl_pod_spark.registry import registry
    from aced_etl_pod_spark.session import get_spark, pin
    from aced_etl_pod_spark.tables import (
        load_packed_embeddings,
        load_validated_embeddings,
    )
    from tools.bench_ladder import build_scaled

    sf = build_scaled(args.scale)
    spark = get_spark("q8-widen-ab", shuffle_partitions=32)
    pin(spark, {
        "spark.sql.files.maxPartitionBytes": "4m",
        "spark.sql.leafNodeDefaultParallelism": "32",
    })
    reg = registry()
    packed = load_packed_embeddings(spark, sf)
    q = load_validated_embeddings(spark, sf).filter(F.col("vec_id") == 0)

    n_verified = sum(
        r["n"] for r in _verify_df(packed, q).collect()
    )
    print(f"bit-identity verified on every batch ({n_verified} rows)",
          flush=True)

    variants = {
        "full_widen": _twin(packed, q, widen_full=True),
        "blocked": _twin(packed, q, widen_full=False),
        "shipped_op": reg["sim_cosine_topk_packed_ingest"].fn(spark, sf),
    }
    vals = {
        # the shipped op rounds at 6dp (its contract); normalize the raw
        # twins the same way for the cross-variant value assert
        n: tuple(sorted((r[0], round(r[1], 6)) for r in df.collect()))
        for n, df in variants.items()
    }
    assert len(set(vals.values())) == 1, "variant values differ"

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{sf}/embeddings.parquet'"
    )
    oracle = reg["sim_cosine_topk_packed_ingest"].oracle
    ov = tuple(
        sorted((r[0], round(r[1], 6)) for r in con.execute(oracle).fetchall())
    )
    assert vals["shipped_op"] == ov, (vals["shipped_op"][:3], ov[:3])
    print("values identical across variants + oracle", flush=True)

    def rerun(df):
        w = df.where(F.lit(True))
        w._jdf.queryExecution().executedPlan()
        return w

    for df in variants.values():
        rerun(df).collect()
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
    dm = statistics.median(duck)
    print(f"duckdb oracle: {dm:.3f} s")
    for n, ts in samples.items():
        m = statistics.median(ts)
        print(f"{n:11s} {m:7.3f} s  ratio {m / dm:5.2f}x")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
