"""Dump .explain("formatted") plans for everything round 13 touched,
into plans/r13/ (the judge's plan-claim evidence; guide §1).

    python tools/r13_plans.py

* The three quadratic-block hardenings (verdict item 1): before = the
  r12 shape (reconstructed inline — the uncapped/unsalted/id-oriented
  derivations, which remain byte-equal to the r12 operator bodies),
  after = the shipped op. Captured at the x40 bench tiling so the
  size-gated dispatches (knn salt grid) actually engage.
* The 10 headline queries at the x40 tiling — the plans behind the new
  bench.py extra.tiled_x40 tier (verdict item 2), which differ from the
  sf0.1 contract plans by every dispatch knee crossed.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

OUT = "/root/repo/plans/r13"


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def _write(name: str, header: str, df) -> None:
    with open(os.path.join(OUT, name), "w") as f:
        f.write(header.rstrip() + "\n\n" + _plan(df))
    print("wrote", name, flush=True)


def main() -> int:
    os.makedirs(OUT, exist_ok=True)

    from aced_etl_pod_spark.functions.graph import (
        orient_edges,
        triangle_counts,
    )
    from aced_etl_pod_spark.operators.llm_pipeline import (
        LEV_BLOCK_CHARS,
        LEV_MAX,
        LEV_PREFIX,
    )
    from aced_etl_pod_spark.operators.similarity import (
        _knn_all_pairs_plain,
    )
    from aced_etl_pod_spark.registry import registry
    from aced_etl_pod_spark.session import get_spark, pin
    from aced_etl_pod_spark.tables import load
    from pyspark.sql import Window as W
    from tools.bench_ladder import BENCH_QUERIES, build_scaled

    sf = build_scaled(40)
    spark = get_spark("r13-plans", shuffle_partitions=32)
    pin(spark, {
        "spark.sql.files.maxPartitionBytes": "4m",
        "spark.sql.leafNodeDefaultParallelism": "32",
    })
    reg = registry()

    # ---- verdict item 1: the three quadratic-block hardenings --------
    # levenshtein: r12 uncapped shape, reconstructed (byte-equal to the
    # r12 operator body)
    d = load(spark, sf, "documents")
    b = d.select(
        "doc_id",
        "lang",
        F.floor(F.col("n_chars") / LEV_BLOCK_CHARS).alias("lb"),
        F.substring("text", 1, LEV_PREFIX).alias("p"),
    )
    a = b.select(F.col("doc_id").alias("doc_a"), "lang", "lb",
                 F.col("p").alias("pa"))
    c = b.select(F.col("doc_id").alias("doc_b"), "lang", "lb",
                 F.col("p").alias("pb"))
    lev = F.levenshtein("pa", "pb")
    before_lev = (
        a.join(c, ["lang", "lb"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .filter(lev <= LEV_MAX)
        .select("doc_a", "doc_b", lev.cast("long").alias("lev"))
    )
    _write(
        "dedup_levenshtein_pairs_before.txt",
        "# r12 shape: UNCAPPED (lang, lb) self-join — one degenerate\n"
        "# block is O(block²) with no bound",
        before_lev,
    )
    _write(
        "dedup_levenshtein_pairs_after.txt",
        "# r13: LEV_BLOCK_CAP=4096 window-count pre-filter (op + oracle\n"
        "# in lockstep); the cap's window rides the join's own (lang,\n"
        "# lb) exchange",
        reg["dedup_levenshtein_pairs"].fn(spark, sf),
    )

    # knn: before = plain per-label all-pairs; after = the public op at
    # x40 (80 k vectors ≥ the 50 k knee → salt grid engages)
    _write(
        "sim_knn_all_pairs_topk_before.txt",
        "# r12 shape: per-label all-pairs join + ONE global window —\n"
        "# every label is one shuffle key (10 labels → ≤10 tasks own the\n"
        "# whole quadratic enumeration)",
        _knn_all_pairs_plain(spark, sf),
    )
    _write(
        "sim_knn_all_pairs_topk_after.txt",
        "# r13: salt-grid dispatch at 80 k vectors — (label, sb) join\n"
        "# keys spread each label over k_salt cells; per-cell top-3\n"
        "# window rides the join partitioning (no extra exchange of the\n"
        "# pair rows); only ≤3·k_salt rows/vector cross the final vec_id\n"
        "# exchange",
        reg["sim_knn_all_pairs_topk"].fn(spark, sf),
    )

    # triangle: before = id orientation, after = (degree, id)
    o = load(spark, sf, "orders")
    raw = o.select(
        (F.col("o_custkey") % 500).alias("src"),
        (F.col("o_orderkey") % 500).alias("dst"),
    )
    w = W.orderBy(F.desc("n_triangles"), "node")
    before_tri = (
        triangle_counts(orient_edges(raw))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 10)
        .select(
            F.col("node").cast("long").alias("node"),
            F.col("n_triangles").cast("long").alias("n_triangles"),
            F.col("rk").cast("long").alias("rk"),
        )
    )
    _write(
        "graph_triangle_count_before.txt",
        "# r12 shape: raw-id orientation — a mid-id hub routes ~deg²/4\n"
        "# candidate paths through one shuffle key",
        before_tri,
    )
    _write(
        "graph_triangle_count_after.txt",
        "# r13: (degree, id) orientation — one extra degree agg + two\n"
        "# joins against the (node, deg) table; outdeg capped O(sqrt(m))\n"
        "# so the path fan-out is bounded on any graph; results\n"
        "# orientation-invariant (same oracle)",
        reg["graph_triangle_count"].fn(spark, sf),
    )

    # ---- verdict item 2: the x40 tier's headline plans ---------------
    for name, op_id in BENCH_QUERIES.items():
        _write(
            f"{name}_x40_tier.txt",
            f"# bench.py extra.tiled_x40 tier plan for {op_id} at the x40\n"
            "# tiling (the knee-crossing scale the driver now times each\n"
            "# round; the sf0.1 contract plan is the r12 before-file)",
            reg[op_id].fn(spark, sf),
        )

    # ---- verdict item 4: q8 packed kernel (plan UNCHANGED — the\n
    # blocked widen is inside the mapInArrow function; captured to prove
    # exactly that)
    _write(
        "q8_cosine_topk_packed_r13_kernel.txt",
        "# r13: _packed_dots_norms blocked widen — plan is byte-\n"
        "# equivalent to plans/r12/q8_cosine_topk_after.txt (the change\n"
        "# is inside the MapInArrow function; tools/q8_widen_ab.py holds\n"
        "# the kernel A/B + bit-identity evidence)",
        reg["sim_cosine_topk_packed_ingest"].fn(spark, sf),
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
