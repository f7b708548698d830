"""Dump .explain("formatted") before/after plans for every headline
query the round-12 optimization touched, into plans/r12/ (the judge's
plan-claim evidence; guide §1 "capture the plan shape").

    python tools/r12_plans.py [--sf /root/testdata/sf0.1]

"before" = the plan the query ran at the start of round 12 (the
undispatched scan/kernel path, still shipped for the below-knee
regime); "after" = the plan the public op dispatches to past its
footer-count knee (the layout / kernel the round shipped). Both are
captured on the same sf dir — the dispatch is scale-keyed, but the
PLAN SHAPE of each path is scale-independent, and each file's header
records the dispatch condition. Fixtures build on first access
(untimed; plan capture only).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, "/root/repo")

OUT = "/root/repo/plans/r12"


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from aced_etl_pod_spark.operators import (  # noqa: F401
        advanced_ops,
        aggs,
        extra_ops,
        functions,
        joins,
        scale_ops,
        similarity,
        text,
    )
    from aced_etl_pod_spark.registry import registry
    from aced_etl_pod_spark.session import get_spark

    spark = get_spark("r12-plans", shuffle_partitions=32)
    reg = registry()
    sf = args.sf

    def by_reg(name):
        return lambda: reg[name].fn(spark, sf)

    # (query, variant_tag, header, thunk)
    captures = [
        ("q1_pricing_summary", "before",
         "undispatched one-exchange guarded scan (below-knee path; "
         "dispatch: lineitem >= 4M rows -> summary)",
         lambda: aggs._q1_plain_scan(spark, sf)),
        ("q1_pricing_summary", "after",
         "agg_group_sums_summary_ingest: re-aggregate the ingest-time "
         "(flag,status,shipdate)-keyed partials; no lineitem bytes",
         by_reg("agg_group_sums_summary_ingest")),
        ("q2_star_join", "before",
         "undispatched star join (shuffle_hash customer side past 100k; "
         "dispatch: orders >= 1M rows -> summary, degenerate -> bucketed)",
         lambda: joins._q2_plain_star(spark, sf)),
        ("q2_star_join", "after",
         "join_multiway_star_summary_ingest: <=25-row per-nationkey "
         "partials x broadcast nation+region; no orders/customer bytes",
         by_reg("join_multiway_star_summary_ingest")),
        ("q2_star_join", "after_r11_bucketed",
         "join_multiway_star_bucketed (r11 ship, now the degenerate-"
         "summary fallback): zero-exchange SMJ over the custkey layout",
         by_reg("join_multiway_star_bucketed")),
        ("q3_topk_window", "current",
         "win_row_number_topk (untouched in r12 — already 0.28x iso at "
         "x800): single exchange + TopK window",
         by_reg("win_row_number_topk")),
        ("q4_semi_anti", "before",
         "plain left-semi join plan (below-knee path; dispatch: "
         "orders >= 1M rows -> bucketed layout)",
         lambda: reg["join_left_semi"].fn(spark, sf)),
        ("q4_semi_anti", "after",
         "join_left_semi_bucketed: zero-exchange zero-sort SMJ over the "
         "custkey-bucketed layout (one sorted file per bucket)",
         by_reg("join_left_semi_bucketed")),
        ("q5_tumbling", "before",
         "agg_time_bucket scan plan (below-knee path; dispatch: "
         "events >= 4M rows -> minute-downsample summary)",
         by_reg("agg_time_bucket")),
        ("q5_tumbling", "after",
         "agg_time_bucket_summary_ingest: hour buckets re-sum the "
         "minute-grained ingest downsample; no events bytes",
         by_reg("agg_time_bucket_summary_ingest")),
        ("q6_json_extract", "before",
         "fn_json parse-kernel plan (below-knee path: prove-then-skip "
         "anchored-regex/integer tiers, from_json fallback; dispatch: "
         "events >= 4M rows -> shredded typed column)",
         by_reg("fn_json")),
        ("q6_json_extract", "after",
         "fn_json_shredded_ingest: read the ingest-time typed column; "
         "zero JSON functions at query time",
         by_reg("fn_json_shredded_ingest")),
        ("q7_token_stats", "before",
         "text_tokenize_stats_arrow (r11 ship, below-knee kernel): "
         "mapInArrow count_substring with per-batch partial agg",
         by_reg("text_tokenize_stats_arrow")),
        ("q7_token_stats", "after",
         "text_tokenize_stats_ingest: re-aggregate per-lang gold "
         "partials; no documents bytes, no Python stage",
         by_reg("text_tokenize_stats_ingest")),
        ("q8_cosine_topk", "before",
         "sim_cosine_topk_fast: codegen-unrolled JVM dot product, one "
         "scan + TakeOrdered (below-50k-vector path)",
         by_reg("sim_cosine_topk_fast")),
        ("q8_cosine_topk", "after_arrow_kernel",
         "sim_cosine_topk_arrow (session-1 ship, now the no-layout "
         "intermediate): mapInArrow float64 gemm over the list column",
         by_reg("sim_cosine_topk_arrow")),
        ("q8_cosine_topk", "after",
         "sim_cosine_topk_packed_ingest: gemm kernel over the packed "
         "float32-binary ingest layout — one memcpy per row across the "
         "Python boundary (dispatch: >= 50k vectors)",
         by_reg("sim_cosine_topk_packed_ingest")),
        ("q9_rollup", "before",
         "agg_rollup_partial_reagg scan plan (EXPAND-free rollup "
         "algebra; dispatch: orders >= 4M rows -> summary)",
         by_reg("agg_rollup_partial_reagg")),
        ("q9_rollup", "after",
         "agg_rollup_summary_ingest: rollup algebra over the "
         "(priority,status,orderdate) ingest summary; no orders bytes",
         by_reg("agg_rollup_summary_ingest")),
        ("q10_distinct", "before",
         "agg_distinct_count pair-dedup plan (below-knee path; "
         "dispatch: events >= 1M rows -> bitmask kernel/mask layout)",
         by_reg("agg_distinct_count")),
        ("q10_distinct", "after",
         "agg_distinct_count_mask_ingest: bit_or re-merge of the "
         "persisted per-user type-bitmask table; no events bytes",
         by_reg("agg_distinct_count_mask_ingest")),
        ("text_line_dedup_c4", "after",
         "digest-keyed window rewrite (r12: regexp_extract_all spans, "
         "unhex(sha256) binary shuffle keys, spans-joins-kept "
         "self-join deleted; 3.13x -> 1.38x -> 1.18x at x40)",
         by_reg("text_line_dedup_c4")),
    ]

    os.makedirs(OUT, exist_ok=True)
    for query, tag, header, thunk in captures:
        df = thunk()
        plan = _plan(df)
        fname = os.path.join(OUT, f"{query}_{tag}.txt")
        with open(fname, "w") as f:
            f.write(f"# {query} [{tag}] — {header}\n")
            f.write(f"# captured on {sf} (plan shape is scale-independent;"
                    " dispatch is footer-count-keyed)\n\n")
            f.write(plan)
        n_ex = plan.count("Exchange")
        n_py = sum(plan.count(k) for k in
                   ("BatchEvalPython", "ArrowEvalPython", "MapInArrow",
                    "MapInPandas", "FlatMapGroupsInPandas"))
        print(f"{query:22s} {tag:18s} Exchange={n_ex:2d} PythonNodes={n_py}"
              f" -> {fname}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
