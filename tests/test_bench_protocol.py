"""The round-9 benchmark-protocol pin (PLANS.md round-9).

Rounds 1-8 timed repeated ``collect()`` calls on ONE DataFrame. Spark
keeps a completed shuffle's map outputs alive for the lifetime of the
plan's RDD lineage, so every re-collect SKIPPED the map stages and timed
only the final stage — while the DuckDB baseline re-executed its whole
pipeline per rep. These tests pin both halves of the fix:

* the reuse behavior is REAL (otherwise the correction story is wrong
  and the wrapper is pointless overhead), and
* the ``where(lit(True))`` wrapper used by bench.py / tools/bench_ladder
  / tools/skew_ladder actually forces every stage to re-execute.

The probe is an accumulator bumped inside a map-side Python UDF: a
skipped map stage cannot bump it.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _probe(spark):
    """(df-with-one-exchange, accumulator bumped once per map-stage row)."""
    acc = spark.sparkContext.accumulator(0)

    @F.udf("long")
    def bump(x):
        acc.add(1)
        return x

    df = (
        spark.range(100, numPartitions=4)
        .select(bump("id").alias("id"))
        .groupBy((F.col("id") % 5).alias("g"))
        .agg(F.sum("id").alias("s"))
    )
    return df, acc


def test_same_df_recollect_skips_map_stages(spark):
    """The artifact itself: a second collect() on the SAME DataFrame must
    not re-run the map stage (shuffle output reused). If Spark ever stops
    reusing, the old numbers become retroactively honest and the wrapper
    becomes pure overhead — either way we want to know."""
    df, acc = _probe(spark)
    df.collect()
    first = acc.value
    assert first == 100, f"map stage ran partially? acc={first}"
    df.collect()
    assert acc.value == first, (
        "same-df re-collect re-ran the map stage — Spark's shuffle reuse "
        f"changed (acc {first} -> {acc.value}); revisit the bench protocol"
    )


def test_rerun_wrapper_forces_full_reexecution(spark):
    """The fix: the bench harness wrapper (fresh QueryExecution via
    where(lit(True)), plan materialized pre-timer) re-runs EVERY stage."""
    df, acc = _probe(spark)
    df.collect()
    base = acc.value

    def rerun(d):
        w = d.where(F.lit(True))
        w._jdf.queryExecution().executedPlan()  # planning outside timers
        return w

    rerun(df).collect()
    assert acc.value == 2 * base, (
        "wrapped re-collect did not re-run the map stage "
        f"(acc {base} -> {acc.value}) — the bench would again be timing "
        "only final stages"
    )
    rerun(df).collect()
    assert acc.value == 3 * base


def test_bench_and_ladders_use_the_wrapper():
    """Source-level pin: every timing harness builds a fresh wrapped plan
    per sample. Grepping source is crude but catches the likeliest
    regression — someone 'simplifying' the loop back to df.collect()."""
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for rel in (
        "bench.py",
        "tools/bench_ladder.py",
        "tools/skew_ladder.py",
        "tools/spill_ladder.py",
    ):
        src = open(os.path.join(root, rel)).read()
        assert "def rerun(" in src and "executedPlan()" in src, (
            f"{rel} lost the full-re-execution wrapper (PLANS.md round-9)"
        )
