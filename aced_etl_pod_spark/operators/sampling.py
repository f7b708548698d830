"""Deterministic sampling / splitting / interleaving operators — the
training-data-shaping family (reservoir-free, reproducible, cluster-safe).

``df.sample()`` is seed-deterministic but implementation-defined (partition-
dependent), so none of these use it. Every op derives a pseudo-random bucket
with a Knuth multiplicative hash on the row id — plain 64-bit integer
arithmetic that any engine reproduces exactly, is stable under
repartitioning, and needs no shared RNG state across 1000 executors. The
bucket IS the sampling decision, so re-running the pipeline (or adding new
rows) never reshuffles previously-assigned rows between splits — the
property training pipelines actually need from "random" splits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from aced_etl_pod_spark.operators.util import finite, finite_sql, money, money_sql
from aced_etl_pod_spark.registry import op
from aced_etl_pod_spark.tables import load

# Knuth's multiplicative constant (2654435761 = 2^32 / phi). The id is
# first reduced mod 2^31 so (id % 2^31) * K < 2^63 for EVERY int64 id —
# no overflow in either engine (Spark would wrap silently under non-ANSI,
# DuckDB would error: a silent cross-engine divergence on snowflake-scale
# ids without the reduction).
KNUTH = 2654435761


def hash_bucket(id_col: str, buckets: int = 100) -> F.Column:
    """Deterministic pseudo-random bucket in [0, buckets)."""
    return (F.col(id_col) % F.lit(2**31) * F.lit(KNUTH) % F.lit(2**32)) % F.lit(
        buckets
    )


def _bucket_sql(id_col: str, buckets: int = 100) -> str:
    return f"((({id_col} % {2**31}) * {KNUTH}) % {2**32}) % {buckets}"


@op(
    "sample_bernoulli_hash",
    oracle=f"""
    SELECT doc_id, lang, {_bucket_sql("doc_id")} AS bucket
    FROM documents
    WHERE {_bucket_sql("doc_id")} < 20
    """,
    tags=("sampling", "extra"),
)
def sample_bernoulli_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """20% Bernoulli sample by hash bucket: a pure pushdown-able filter —
    no shuffle, no RNG state, stable under re-runs and repartitioning."""
    d = load(spark, sf_dir, "documents")
    b = hash_bucket("doc_id")
    return d.select("doc_id", "lang", b.alias("bucket")).filter(b < 20)


@op(
    "split_train_valid_test",
    oracle=f"""
    SELECT doc_id,
           CASE WHEN {_bucket_sql("doc_id")} < 80 THEN 'train'
                WHEN {_bucket_sql("doc_id")} < 90 THEN 'valid'
                ELSE 'test' END AS split
    FROM documents
    """,
    tags=("sampling", "extra"),
)
def split_train_valid_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/10/10 train/valid/test assignment. Because the split is a pure
    function of the id, adding documents later never moves an existing row
    between splits (no leakage across dataset versions)."""
    d = load(spark, sf_dir, "documents")
    b = hash_bucket("doc_id")
    split = (
        F.when(b < 80, "train").when(b < 90, "valid").otherwise("test")
    )
    return d.select("doc_id", split.alias("split"))


@op(
    "sample_stratified_quota",
    oracle=f"""
    WITH ranked AS (
      SELECT doc_id, lang,
             row_number() OVER (PARTITION BY lang
                                ORDER BY {_bucket_sql("doc_id", 1000000)}, doc_id) AS rk
      FROM documents
    )
    SELECT doc_id, lang, CAST(rk AS BIGINT) AS rk
    FROM ranked WHERE rk <= 50
    """,
    tags=("sampling", "extra"),
)
def sample_stratified_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified quota sample: exactly min(50, n) docs per language,
    chosen by hash order (deterministic proxy for uniform-without-
    replacement). One shuffle on the stratum key; per-stratum top-k is a
    bounded heap, not a global sort."""
    d = load(spark, sf_dir, "documents")
    w = W.partitionBy("lang").orderBy(hash_bucket("doc_id", 1_000_000), "doc_id")
    return (
        d.select("doc_id", "lang", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= 50)
        .select("doc_id", "lang", F.col("rk").cast("long").alias("rk"))
    )


@op(
    "interleave_weighted_sources",
    oracle=f"""
    WITH kept AS (
      SELECT doc_id, source, {_bucket_sql("doc_id")} AS bucket
      FROM documents
      WHERE {_bucket_sql("doc_id")} <
            CASE source WHEN 'web' THEN 60 WHEN 'books' THEN 30 ELSE 10 END
    )
    SELECT doc_id, source,
           CAST(row_number() OVER (ORDER BY bucket, doc_id) AS BIGINT) AS position
    FROM kept
    """,
    tags=("sampling", "extra"),
)
def interleave_weighted_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted source mixture + deterministic interleave: per-source keep
    rates (60/30/10%) as a hash filter, then a global training order by
    hash — the reproducible "shuffled mixture" a pre-training data loader
    consumes. The global row_number is the one intentionally serial step
    (order assignment); at 100 TB you would zipWithIndex per partition or
    keep (bucket, doc_id) AS the sort key and skip materializing positions."""
    d = load(spark, sf_dir, "documents")
    b = hash_bucket("doc_id")
    rate = (
        F.when(F.col("source") == "web", 60)
        .when(F.col("source") == "books", 30)
        .otherwise(10)
    )
    kept = d.select("doc_id", "source", b.alias("bucket")).filter(b < rate)
    w = W.orderBy("bucket", "doc_id")
    return kept.select(
        "doc_id", "source", F.row_number().over(w).cast("long").alias("position")
    )


# ---------------------------------------------------------------------------
# sample_reservoir_per_group (round-7 registration queue)
# ---------------------------------------------------------------------------

_RSV_K = 20
_RSV_SALT_BUCKETS = 32

SAMPLE_RESERVOIR_PER_GROUP_ORACLE = f"""
    WITH ranked AS (
      SELECT event_type, event_id, user_id,
             (event_id * 2654435761) % 4294967296 AS h,
             row_number() OVER (
               PARTITION BY event_type
               ORDER BY (event_id * 2654435761) % 4294967296, event_id
             ) AS rk
      FROM events
    )
    SELECT event_type, event_id, user_id, CAST(rk AS BIGINT) AS rk
    FROM ranked WHERE rk <= {_RSV_K}
"""


@op("sample_reservoir_per_group", oracle=SAMPLE_RESERVOIR_PER_GROUP_ORACLE, tags=('sampling', 'extra'))
def sample_reservoir_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact k-per-group sampling, reservoir-style but deterministic: rows
    rank by the portable Knuth hash of their id (a reproducible stand-in
    for the reservoir's random tags) and each group keeps its k smallest.

    Scale shape — the two-phase top-k: pass 1 takes the per-(group, salt
    bucket) top-k, so the first sort runs over groups*buckets partitions
    in parallel and emits at most groups*buckets*k candidate rows; pass 2
    takes the true per-group top-k of that bounded candidate set. The
    per-bucket top-k is a superset of the global top-k (every global
    winner is also a winner within its own bucket), so the two-phase
    result is EXACTLY the single-sort result — the oracle is the plain
    one-window formulation. This is how per-group sampling avoids one
    giant sort per hot group when there are few, huge groups (the 5
    event types here at 100 TB)."""
    e = load(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        "user_id",
        F.expr("(event_id * 2654435761) % 4294967296").alias("h"),
    ).withColumn("salt", F.col("h") % _RSV_SALT_BUCKETS)
    w1 = W.partitionBy("event_type", "salt").orderBy("h", "event_id")
    cand = (
        e.withColumn("rk1", F.row_number().over(w1))
        .filter(F.col("rk1") <= _RSV_K)
        .drop("rk1", "salt")
    )
    w2 = W.partitionBy("event_type").orderBy("h", "event_id")
    return (
        cand.withColumn("rk", F.row_number().over(w2).cast("long"))
        .filter(F.col("rk") <= _RSV_K)
        .select("event_type", "event_id", "user_id", "rk")
        .orderBy("event_type", "rk")
    )


# ---------------------------------------------------------------------------
# agg_sample_estimate_ci (round-7 registration queue)
# ---------------------------------------------------------------------------

_AQP_PCT = 10  # keep buckets < 10 of 100 => 10% sample

AGG_SAMPLE_ESTIMATE_CI_ORACLE = f"""
    WITH s AS (
      SELECT event_type,
             sum((CASE WHEN abs(CAST(value AS DOUBLE)) < 1e12 THEN CAST(value AS DOUBLE) END)) AS exact_sum,
             sum(CASE WHEN {_bucket_sql("event_id")} < {_AQP_PCT}
                      THEN (CASE WHEN abs(CAST(value AS DOUBLE)) < 1e12 THEN CAST(value AS DOUBLE) END) END) AS samp_sum,
             count(CASE WHEN {_bucket_sql("event_id")} < {_AQP_PCT}
                        THEN (CASE WHEN abs(CAST(value AS DOUBLE)) < 1e12 THEN CAST(value AS DOUBLE) END) END) AS n_sample
      FROM events GROUP BY event_type
    )
    SELECT event_type,
           CAST(n_sample AS BIGINT) AS n_sample,
           (CASE WHEN abs(CAST(exact_sum AS DOUBLE)) < 1e12 THEN CAST(round(CAST(CAST(exact_sum AS DOUBLE) AS DECIMAL(18,6)), 2) AS DOUBLE) ELSE CAST(exact_sum AS DOUBLE) END) AS exact_sum,
           (CASE WHEN abs(CAST(samp_sum * {100.0 / _AQP_PCT} AS DOUBLE)) < 1e12 THEN CAST(round(CAST(CAST(samp_sum * {100.0 / _AQP_PCT} AS DOUBLE) AS DECIMAL(18,6)), 2) AS DOUBLE) ELSE CAST(samp_sum * {100.0 / _AQP_PCT} AS DOUBLE) END) AS est_sum,
           (CASE WHEN abs(CAST(abs(samp_sum * {100.0 / _AQP_PCT} - exact_sum)
                      / exact_sum * 100 AS DOUBLE)) < 1e9 THEN CAST(round(CAST(CAST(abs(samp_sum * {100.0 / _AQP_PCT} - exact_sum)
                      / exact_sum * 100 AS DOUBLE) AS DECIMAL(18,9)), 2) AS DOUBLE) ELSE CAST(abs(samp_sum * {100.0 / _AQP_PCT} - exact_sum)
                      / exact_sum * 100 AS DOUBLE) END)
             AS rel_err_pct,
           round(CAST(abs(samp_sum * {100.0 / _AQP_PCT} - exact_sum)
                 / exact_sum * 100 AS DECIMAL(18,9)), 2) <= 15.0 AS within_15pct
    FROM s
"""


@op("agg_sample_estimate_ci", oracle=AGG_SAMPLE_ESTIMATE_CI_ORACLE, tags=('agg', 'extra'))
def agg_sample_estimate_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate query processing by deterministic sampling: a 10%
    Knuth-bucket sample estimates each group's sum (Horvitz-Thompson
    inverse-probability scale-up), reported NEXT TO the exact answer with
    the realized relative error and a 15%-tolerance flag — the
    sample-then-verify harness an AQP deployment runs before trusting the
    cheap path. Both aggregates come out of ONE conditional-aggregation
    scan (the dq_expectation_checks pattern), and the flag compares the
    ROUNDED error so the boolean can't split engines.

    At 100 TB only the sample branch runs (a pushdown-able bucket filter
    — same shape as sample_bernoulli_hash, so the scan itself shrinks
    ~10x); the exact branch here exists to exhibit the error the sample
    would have hidden. The estimator is unbiased because the hash bucket
    is independent of `value`; per-group CI width scales 1/sqrt(n_sample)
    — the knob is the bucket count."""
    e = load(spark, sf_dir, "events")
    samp = F.when(hash_bucket("event_id") < _AQP_PCT, finite(F.col("value")))
    s = e.groupBy("event_type").agg(
        F.count(samp).alias("n_sample"),
        F.sum(finite(F.col("value"))).alias("exact_raw"),
        F.sum(samp).alias("samp_raw"),
    )
    scale = 100.0 / _AQP_PCT
    err = (
        f"round(CAST(abs(samp_raw * {scale} - exact_raw) / exact_raw * 100"
        " AS DECIMAL(18,9)), 2)"
    )
    return s.select(
        "event_type",
        F.col("n_sample").cast("long").alias("n_sample"),
        F.expr("(CASE WHEN abs(CAST(exact_raw AS DOUBLE)) < 1e12 THEN CAST(round(CAST(CAST(exact_raw AS DOUBLE) AS DECIMAL(18,6)), 2) AS DOUBLE) ELSE CAST(exact_raw AS DOUBLE) END)").alias(
            "exact_sum"
        ),
        F.expr(
            f"(CASE WHEN abs(CAST(samp_raw * {scale} AS DOUBLE)) < 1e12 THEN CAST(round(CAST(CAST(samp_raw * {scale} AS DOUBLE) AS DECIMAL(18,6)), 2) AS DOUBLE) ELSE CAST(samp_raw * {scale} AS DOUBLE) END)"
        ).alias("est_sum"),
        F.expr(f"CAST({err} AS DOUBLE)").alias("rel_err_pct"),
        F.expr(f"{err} <= 15.0").alias("within_15pct"),
    ).orderBy("event_type")
