"""Operator registry — the driver contract's backbone.

Every operator ID from SURVEY.md §2.b registers here as an ``Op``:
a PySpark callable ``fn(spark, sf_dir) -> DataFrame`` plus (when the
semantics are SQL-expressible) an equivalent DuckDB oracle SQL string.
``__spark_entry__.queries()`` / ``oracle_sql()`` are thin views over this.

Determinism rules enforced by convention in every registered op:
  * every top-k / LIMIT carries a total-order tie-break,
  * every floating aggregate is rounded (2dp by default) on BOTH sides,
  * timestamps are emitted as formatted strings (UTC) so value hashing
    never depends on engine-specific timestamp rendering.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Op:
    id: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL over the pre-registered table views
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


_REGISTRY: dict[str, Op] = {}

# Driver-visibility rotation. The external correctness harness verifies the
# FIRST 50 registry entries in iteration order. Round 1 verified the
# relational core; rounds 2-4 rotated through UDF/text/dedup/similarity/
# scale/streaming families (CORRECTNESS_r02-r04). Round-5 window = the 25
# round-4 additions that have never had a driver row (SURVEY §10 rotation
# TODO) + embedding_quantize_int8 (the single red r04 row, re-checked after
# the to_json output fix) + graph_pagerank (upgraded from no_oracle to a
# DuckDB iterative-CTE oracle this round) + the 22 brand-new round-5 ops
# (txn-log ACID family, runtime bloom filter, product quantization, URL
# dedup, count-min sketch, change feed, compaction, IVF-PQ),
# with no backfill left — the round-5 additions fill the
# window exactly. Ops not listed keep canonical order after the block.
# Rotate per round until every operator has a recent row.
_DRIVER_PRIORITY = (
    # -- never driver-checked (round-4 additions) --
    "sink_orc_roundtrip",
    "text_chunk_sliding_tokens",
    "embedding_random_projection",
    "feature_quantile_bucketize",
    "agg_hll_union_shards",
    "join_asof_forward",
    "scan_parquet_schema_merge",
    "pipeline_corpus_curation",
    "win_distinct_sliding",
    "scan_csv_permissive_corrupt",
    "stream_corpus_curation",
    "sql_shared_ansi",
    "set_ops_all_multiset",
    "multimodal_feature_embed_topk",
    "agg_string_concat",
    "win_median_rolling",
    "fn_datetime_interval",
    "join_lateral_topk_per_key",
    "join_null_safe_eq",
    "agg_heavy_hitters_sketch",
    "udtf_python_lateral",
    "scan_ndjson_gzip",
    "win_time_range_sum",
    "agg_bitmap_exact_distinct",
    "join_dynamic_partition_pruning",
    "fn_try_arithmetic",
    # -- new this round: ACID txn-log table format + runtime filters --
    "scan_txnlog_snapshot",
    "txnlog_time_travel",
    "txnlog_file_skipping",
    "stream_txnlog_exactly_once",
    "join_runtime_bloom_filter",
    # -- new this round: product quantization (ANN compression + ADC) --
    "embedding_pq_codes",
    "sim_ann_pq_adc_topk",
    # -- new this round: URL dedup + count-min sketch --
    "dedup_url_canonical",
    "agg_count_min_sketch",
    "txnlog_change_feed",
    "sim_ann_ivf_pq_topk",
    "txnlog_compact",
    "txnlog_checkpoint_vacuum",
    "agg_kmv_theta_distinct",
    "dq_expectation_checks",
    "txnlog_schema_evolution",
    "text_bigram_pmi_topk",
    "win_gap_islands",
    "fn_url_parse",
    "udf_map_in_arrow",
    "agg_funnel_steps",
    "win_retention_cohorts",
    # -- red r04 row, re-check after the scalar-output fix --
    "embedding_quantize_int8",
    # -- upgraded no_oracle -> full oracle this round --
    "graph_pagerank",
)

# Operator-family modules; importing them runs the @op decorators.
_MODULES = (
    "aced_etl_pod_spark.operators.scans",
    "aced_etl_pod_spark.operators.rowops",
    "aced_etl_pod_spark.operators.functions",
    "aced_etl_pod_spark.operators.joins",
    "aced_etl_pod_spark.operators.aggs",
    "aced_etl_pod_spark.operators.windows",
    "aced_etl_pod_spark.operators.sorts_sets",
    "aced_etl_pod_spark.operators.udfs",
    "aced_etl_pod_spark.operators.streaming_ops",
    "aced_etl_pod_spark.operators.text",
    "aced_etl_pod_spark.operators.similarity",
    "aced_etl_pod_spark.operators.scale_ops",
    "aced_etl_pod_spark.operators.extra_ops",
    "aced_etl_pod_spark.operators.advanced_ops",
    "aced_etl_pod_spark.operators.sampling",
    "aced_etl_pod_spark.operators.llm_pipeline",
    "aced_etl_pod_spark.operators.corpus_ops",
    "aced_etl_pod_spark.operators.table_format",
)


def op(op_id: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Register ``fn`` as operator ``op_id`` with an optional DuckDB oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        if op_id in _REGISTRY:
            raise ValueError(f"duplicate operator id {op_id!r}")
        _REGISTRY[op_id] = Op(op_id, fn, oracle, fn.__doc__ or "", tuple(tags))
        return fn

    return deco


def registry() -> dict[str, Op]:
    """Import all operator modules and return the full registry, ordered so
    the driver-priority ops come first. The tail is ordered by canonical
    (module, source line), NOT dict insertion order — insertion order varies
    with which module happened to be imported first (e.g. a test importing
    ``operators.sampling`` directly), and the driver window must be stable."""
    for mod in _MODULES:
        importlib.import_module(mod)
    rank = {op_id: i for i, op_id in enumerate(_DRIVER_PRIORITY)}
    default = len(rank)
    mod_rank = {m: i for i, m in enumerate(_MODULES)}

    def key(kv: tuple[str, Op]) -> tuple[int, int, int]:
        fn = kv[1].fn
        code = getattr(fn, "__code__", None)
        return (
            rank.get(kv[0], default),
            mod_rank.get(getattr(fn, "__module__", ""), len(mod_rank)),
            code.co_firstlineno if code is not None else 0,
        )

    return dict(sorted(_REGISTRY.items(), key=key))


def all_queries() -> dict[str, QueryFn]:
    return {k: v.fn for k, v in registry().items()}


def all_oracles() -> dict[str, str]:
    return {k: v.oracle for k, v in registry().items() if v.oracle is not None}
