"""Shared determinism helpers for operator queries.

Money-style expressions (2dp × 2dp factors) land exactly on half-cent
boundaries, where Spark's BigDecimal HALF_UP on the raw double and DuckDB's
float rounding disagree. Both engines round *decimals* half-away-from-zero,
so the fix is the decimal sandwich: cast to a decimal wide enough to hold
the exact product, round there, then back to double. ``money_sql`` is the
DuckDB mirror — use both or neither.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def money(col: Column, scale: int = 2, exact_scale: int = 6) -> Column:
    """Deterministic round for products of fixed-point-like doubles."""
    return F.round(col.cast(f"decimal(18,{exact_scale})"), scale).cast("double")


def money_sql(expr: str, scale: int = 2, exact_scale: int = 6) -> str:
    """DuckDB mirror of :func:`money`."""
    return f"CAST(round(CAST({expr} AS DECIMAL(18,{exact_scale})), {scale}) AS DOUBLE)"
