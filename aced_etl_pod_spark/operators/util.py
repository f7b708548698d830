"""Shared determinism helpers for operator queries.

Money-style expressions (2dp × 2dp factors) land exactly on half-cent
boundaries, where Spark's BigDecimal HALF_UP on the raw double and DuckDB's
float rounding disagree. Both engines round *decimals* half-away-from-zero,
so the fix is the decimal sandwich: cast to a decimal wide enough to hold
the exact product, round there, then back to double. ``money_sql`` is the
DuckDB mirror — use both or neither.

Non-finite values bypass the sandwich on BOTH sides (the nonfinite-sweep
class-A fix): DuckDB RAISES on ``CAST(nan AS DECIMAL)`` while non-ANSI
Spark silently yields NULL, so an unguarded sandwich crashes one engine
and corrupts the other the moment a NaN/±Inf reaches a money column.
NaN/±Inf pass through unchanged — IEEE propagation, identical in both
engines — and clean data is untouched (the guard only diverts non-finite
inputs).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_INF = float("inf")


def finite(col: Column) -> Column:
    """Non-finite → NULL (nonfinite-sweep class-B contract): statistical
    kernels — stddev/var/corr/percentile/regression — treat NaN/±Inf
    measures as missing, exactly like SQL NULL. DuckDB RAISES OutOfRange
    on an Inf reaching a second-moment aggregate while Spark yields NaN,
    so propagation cannot agree cross-engine; exclusion (applied to BOTH
    sides) can, and is the useful production semantic anyway."""
    d = col.cast("double")
    return F.when(~(F.isnan(d) | (F.abs(d) == F.lit(_INF))), d)


def finite_sql(expr: str) -> str:
    """SQL-text mirror of :func:`finite` (dialect-neutral guard).

    The finite test references ``e`` exactly ONCE — ``abs(e) < Inf`` —
    never ``e - e = 0``: two textual instances of a float AGGREGATE are
    two separate parallel fold orders in DuckDB, and their exact
    difference is not reliably zero on clean data (found the hard way on
    text_zipf_rank_frequency's regression subquery). NaN fails the test
    because both engines order NaN above +Inf."""
    e = f"CAST({expr} AS DOUBLE)"
    return f"(CASE WHEN abs({e}) < CAST('Infinity' AS DOUBLE) THEN {e} END)"


def finite_vec(col: Column) -> Column:
    """Finite-vector contract (extends the round-7 null-vector contract):
    a vector participates in the similarity/PQ/IVF/covariance family iff
    it is non-null AND every lane is finite — one NaN lane silently rots
    a gemm/argsort/codebook kernel without tripping any shape check.
    Lane test is ``abs(x) < Inf`` (NaN sorts above +Inf in both engines;
    NULL lanes fail the isNotNull leg) — same idiom both engines."""
    return col.isNotNull() & F.forall(
        col, lambda x: x.isNotNull() & (F.abs(x) < F.lit(_INF))
    )


def finite_vec_sql(expr: str = "embedding") -> str:
    """DuckDB mirror of :func:`finite_vec`."""
    return (
        f"({expr} IS NOT NULL AND len(list_filter({expr}, "
        f"x -> x IS NULL OR NOT (abs(x) < CAST('Infinity' AS DOUBLE)))) = 0)"
    )


def money(col: Column, scale: int = 2, exact_scale: int = 6) -> Column:
    """Deterministic round for products of fixed-point-like doubles."""
    d = col.cast("double")
    sandwich = F.round(d.cast(f"decimal(18,{exact_scale})"), scale).cast("double")
    return F.when(F.isnan(d) | (F.abs(d) == F.lit(_INF)), d).otherwise(sandwich)


def money_sql(expr: str, scale: int = 2, exact_scale: int = 6) -> str:
    """SQL-text mirror of :func:`money`.

    The finite guard is dialect-neutral (valid under DuckDB oracles AND
    Spark ``F.expr``, which lacks ``isfinite``) and references ``e`` only
    once in the test — see :func:`finite_sql` for why ``e - e = 0`` is
    NOT safe when ``e`` is a parallel float aggregate."""
    e = f"CAST({expr} AS DOUBLE)"
    return (
        f"(CASE WHEN abs({e}) < CAST('Infinity' AS DOUBLE) "
        f"THEN CAST(round(CAST({e} AS DECIMAL(18,{exact_scale})), {scale}) AS DOUBLE) "
        f"ELSE {e} END)"
    )
