"""Shared determinism helpers for operator queries.

Money-style expressions (2dp × 2dp factors) land exactly on half-cent
boundaries, where Spark's BigDecimal HALF_UP on the raw double and DuckDB's
float rounding disagree. Both engines round *decimals* half-away-from-zero,
so the fix is the decimal sandwich: cast to a decimal wide enough to hold
the exact product, round there, then back to double. ``money_sql`` is the
DuckDB mirror — use both or neither.

Guards test MAGNITUDE, not just finiteness (the extreme-sweep upgrade of
the non-finite-sweep contract). ``abs(e) < bound`` is a single-reference
test that excludes NaN (sorts above +Inf in both engines), ±Inf, AND
finite-but-overflow-range values in one branch:

* a NaN/±Inf reaching ``CAST(e AS DECIMAL)`` crashes DuckDB and silently
  NULLs in non-ANSI Spark (non-finite-sweep class A);
* a finite 1e300 takes the SAME two paths — DuckDB raises on
  CAST→DECIMAL / CAST→BIGINT / second-moment overflow while non-ANSI
  Spark yields NULL / Long.MaxValue / NaN (extreme-sweep class A);
* a vanilla Spark 4 session (``spark.sql.ansi.enabled=true`` by default)
  raises like DuckDB — bounded guards mean the guarded branch never sees
  an out-of-range value, so every sandwich is ANSI-safe too.

Out-of-bound values pass through UNCHANGED on both sides (IEEE-identical
raw doubles); in-bound clean data is untouched. ``WELL_SCALED_MAX = 1e12``
is the measure contract: floor-buckets of a bounded value stay inside
BIGINT, and second moments stay inside double (n·(1e12)² ≪ 1.7e308).
Sandwich bounds are per-scale — 10^(18-s) for DECIMAL(18,s); the largest
double below that bound still round-trips, and round()'s carry widens in
both engines (DuckDB DECIMAL(18,s)→(18,d), Spark →(p-s+d+1,d)), so the
strict ``<`` is carry-safe.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Measures at or above this magnitude are treated as MISSING by every
#: guard — the "well-scaled measure" contract (see module docstring).
WELL_SCALED_MAX = 1e12


def finite(col: Column) -> Column:
    """Non-finite OR extreme → NULL (the well-scaled measure contract):
    statistical kernels — stddev/var/corr/percentile/regression — treat
    NaN/±Inf/|x|≥1e12 measures as missing, exactly like SQL NULL. DuckDB
    RAISES OutOfRange when a second moment overflows (a finite 1e200
    squares to Inf) while Spark yields NaN, so propagation cannot agree
    cross-engine; exclusion (applied to BOTH sides) can, and is the
    useful production semantic anyway."""
    d = col.cast("double")
    return F.when(F.abs(d) < F.lit(WELL_SCALED_MAX), d)


def finite_sql(expr: str) -> str:
    """SQL-text mirror of :func:`finite` (dialect-neutral guard).

    The test references ``e`` exactly ONCE — ``abs(e) < 1e12`` — never
    ``e - e = 0``: two textual instances of a float AGGREGATE are two
    separate parallel fold orders in DuckDB, and their exact difference
    is not reliably zero on clean data (found the hard way on
    text_zipf_rank_frequency's regression subquery). NaN fails the test
    because both engines order NaN above +Inf > any bound."""
    e = f"CAST({expr} AS DOUBLE)"
    return f"(CASE WHEN abs({e}) < 1e12 THEN {e} END)"


def finite_vec(col: Column) -> Column:
    """Well-scaled-vector contract (extends the round-7 null-vector
    contract): a vector participates in the similarity/PQ/IVF/covariance
    family iff it is non-null AND every lane is finite and |x| < 1e12 —
    one 1e300 lane overflows the norm (finite in, Inf out) without
    tripping any shape or finite-lane check, silently rotting
    gemm/argsort/codebook kernels. Lane test is ``abs(x) < 1e12`` (NaN
    sorts above +Inf in both engines; NULL lanes fail the isNotNull
    leg) — same idiom both engines."""
    return col.isNotNull() & F.forall(
        col, lambda x: x.isNotNull() & (F.abs(x) < F.lit(WELL_SCALED_MAX))
    )


def finite_vec_sql(expr: str = "embedding") -> str:
    """DuckDB mirror of :func:`finite_vec`."""
    return (
        f"({expr} IS NOT NULL AND len(list_filter({expr}, "
        f"x -> x IS NULL OR NOT (abs(x) < 1e12))) = 0)"
    )


def money(col: Column, scale: int = 2, exact_scale: int = 6) -> Column:
    """Deterministic round for products of fixed-point-like doubles.

    The sandwich branch only sees |e| < 10^(18-exact_scale), so the
    DECIMAL cast can never overflow (DuckDB raise / ANSI-Spark raise /
    non-ANSI silent NULL all fenced at once); out-of-bound values pass
    through as raw doubles, identical on both sides."""
    d = col.cast("double")
    sandwich = F.round(d.cast(f"decimal(18,{exact_scale})"), scale).cast("double")
    return F.when(F.abs(d) < F.lit(10.0 ** (18 - exact_scale)), sandwich).otherwise(d)


def money_sql(expr: str, scale: int = 2, exact_scale: int = 6) -> str:
    """SQL-text mirror of :func:`money`.

    The magnitude guard is dialect-neutral (valid under DuckDB oracles
    AND Spark ``F.expr``, which lacks ``isfinite``) and references ``e``
    only once in the test — see :func:`finite_sql` for why ``e - e = 0``
    is NOT safe when ``e`` is a parallel float aggregate."""
    e = f"CAST({expr} AS DOUBLE)"
    return (
        f"(CASE WHEN abs({e}) < 1e{18 - exact_scale} "
        f"THEN CAST(round(CAST({e} AS DECIMAL(18,{exact_scale})), {scale}) AS DOUBLE) "
        f"ELSE {e} END)"
    )


def wsum(col: Column, scale: int = 2) -> Column:
    """Well-scaled rounded SUM — the extreme-sweep emit idiom for plain
    money-style totals: ``round(sum(finite(x)), scale) + 0.0``.

    * ``finite`` on the SUMMAND: one finite 1e289 makes the parallel
      fold order visible in the last ULP of the total (no rounding can
      hide a 1e275 ULP), and DuckDB/Spark partial-agg trees cannot agree
      — exclusion applied to both sides is the only stable semantic;
    * ``+ 0.0`` on the EMIT: a group whose only surviving measures are
      denormal negatives sums to -0.0 in DuckDB but +0.0 after Spark's
      round (Spark's round normalizes the zero sign, DuckDB's preserves
      it); adding +0.0 maps -0.0 → +0.0 identically in both engines and
      is the identity for every other value (incl. NULL).
    """
    return F.round(F.sum(finite(col)), scale) + F.lit(0.0)


def wsum_sql(expr: str, scale: int = 2) -> str:
    """DuckDB mirror of :func:`wsum`."""
    return f"(round(sum({finite_sql(expr)}), {scale}) + 0.0)"


def zn(col: Column) -> Column:
    """Zero-sign normalization alone (``x + 0.0``) for already-guarded
    emits where only the -0.0/+0.0 render can differ (e.g. min/max over
    denormals, per-row rounds of tiny values)."""
    return col.cast("double") + F.lit(0.0)


def zn_sql(expr: str) -> str:
    """DuckDB mirror of :func:`zn`."""
    return f"(CAST({expr} AS DOUBLE) + 0.0)"
