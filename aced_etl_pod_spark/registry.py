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
# relational core; round 2/3 verified UDF/text/dedup/similarity/scale
# families (CORRECTNESS_r02/r03). Round-4 window = the 35 round-2 additions
# that have never had a driver row (SURVEY §9 rotation TODO) + the 14 ops
# whose r03 rows errored on the events-ts dtype change (all streaming ops,
# time-bucket, batch sessionize, approx-distinct) + dedup_minhash_lsh (its
# only driver row predates the id-only band-join rework). Ops not listed
# keep canonical order after the priority block. Rotate per round until
# every operator has been externally verified at least once.
_DRIVER_PRIORITY = (
    # -- never driver-checked (round-2 additions) --
    "text_pii_redact",
    "dedup_chunk_content_defined",
    "sim_cosine_topk_fast",
    "multimodal_frame_sample",
    "multimodal_resize",
    "pivot_wide",
    "unpivot_stack",
    "win_first_last",
    "fn_bitwise",
    "subquery_in_uncorrelated",
    "merge_scd2",
    "dq_profile_columns",
    "ts_resample_gap_fill",
    "agg_approx_percentile",
    "agg_regression",
    "cdc_apply_changelog",
    "graph_pagerank",
    "sample_bernoulli_hash",
    "split_train_valid_test",
    "sample_stratified_quota",
    "interleave_weighted_sources",
    "text_tfidf_topk",
    "text_bm25_score",
    "decontaminate_ngram_overlap",
    "seq_pack_offsets",
    "text_repetition_stats",
    "embedding_centroid_stats",
    "sink_shard_manifest",
    "text_url_extract",
    "agg_histogram_fixed",
    "agg_mode",
    "graph_triangle_count",
    "text_entropy_stats",
    "dedup_levenshtein_pairs",
    "embedding_quantize_int8",
    # -- errored in r03 (events.ts dtype), need a green row --
    "agg_approx_distinct",
    "stream_tumbling_window",
    "stream_sliding_window",
    "stream_session_window",
    "stream_watermark_late",
    "stream_dedup_keys",
    "stream_stateful_count",
    "stream_custom_stateful",
    "stream_foreach_sink",
    "stream_static_join",
    "stream_stream_join",
    "stream_stream_left_outer",
    "win_sessionize_batch",
    "agg_time_bucket",
    # -- re-check after round-2 rework --
    "dedup_minhash_lsh",
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
