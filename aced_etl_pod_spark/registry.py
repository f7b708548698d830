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
    """Import all operator modules and return the full registry."""
    for mod in _MODULES:
        importlib.import_module(mod)
    return _REGISTRY


def all_queries() -> dict[str, QueryFn]:
    return {k: v.fn for k, v in registry().items()}


def all_oracles() -> dict[str, str]:
    return {k: v.oracle for k, v in registry().items() if v.oracle is not None}
