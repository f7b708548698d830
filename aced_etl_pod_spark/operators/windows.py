"""Window-function operators (SURVEY.md §2.b — 6 IDs).

North-star extensions (the reference has no window functions; downstream ES
consumers do ranking — here it's native). Every window carries a total-order
tie-break (SURVEY determinism rule); per-group windows partition on the
group key so state never concentrates on one executor at 100 TB. The only
single-partition windows (ntile/percent_rank, global sort) are explicitly
small-result ops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from aced_etl_pod_spark.operators.util import (
    finite,
    finite_sql,
    money,
    money_sql,
    wsum,
    wsum_sql,
    zn,
    zn_sql,
)
from aced_etl_pod_spark.registry import op
from aced_etl_pod_spark.tables import load


@op(
    "win_row_number_topk",
    oracle="""
    SELECT c_mktsegment, c_custkey, round(c_acctbal, 2) AS acctbal,
           CAST(rn AS BIGINT) AS rn
    FROM (
      SELECT c_mktsegment, c_custkey, c_acctbal,
             row_number() OVER (PARTITION BY c_mktsegment
                                ORDER BY c_acctbal DESC, c_custkey) AS rn
      FROM customer
    ) WHERE rn <= 5
    """,
    tags=("window", "bench"),
)
def win_row_number_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k via row_number (BASELINE B3)."""
    c = load(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"), "c_custkey")
    return (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select(
            "c_mktsegment",
            "c_custkey",
            F.round("c_acctbal", 2).alias("acctbal"),
            F.col("rn").cast("long").alias("rn"),
        )
    )


@op(
    "win_rank_dense",
    oracle="""
    SELECT c_custkey,
           CAST(floor((CASE WHEN abs(CAST(c_acctbal AS DOUBLE)) < 1e12 THEN CAST(c_acctbal AS DOUBLE) END) / 1000) AS BIGINT) AS bal_bucket,
           CAST(rank() OVER (PARTITION BY c_nationkey
                             ORDER BY floor((CASE WHEN abs(CAST(c_acctbal AS DOUBLE)) < 1e12 THEN CAST(c_acctbal AS DOUBLE) END) / 1000) DESC NULLS LAST)
                AS BIGINT) AS rnk,
           CAST(dense_rank() OVER (PARTITION BY c_nationkey
                                   ORDER BY floor((CASE WHEN abs(CAST(c_acctbal AS DOUBLE)) < 1e12 THEN CAST(c_acctbal AS DOUBLE) END) / 1000) DESC NULLS LAST)
                AS BIGINT) AS drnk
    FROM customer
    """,
    tags=("window",),
)
def win_rank_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank/dense_rank with real ties (bucketed balances — rank output is
    deterministic because it depends only on the order key's value)."""
    c = load(spark, sf_dir, "customer")
    # non-finite balances have no integer bucket (Spark floor would emit
    # 0 / Long.MaxValue; DuckDB raises) — they share the NULL bucket,
    # ranked last on both engines (DESC NULLS LAST spelled out)
    bucket = F.floor(finite(F.col("c_acctbal")) / 1000)
    w = W.partitionBy("c_nationkey").orderBy(bucket.desc_nulls_last())
    return c.select(
        "c_custkey",
        bucket.alias("bal_bucket"),
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
    )


@op(
    "win_lag_lead",
    oracle="""
    SELECT event_id,
           epoch_us(ts) - epoch_us(lag(ts) OVER w) AS delta_us,
           lead(event_type) OVER w AS next_type
    FROM events WHERE ts IS NOT NULL
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    tags=("window", "timeseries"),
)
def win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offset analytics: per-user event deltas (lag) and next event (lead)."""
    # ORDER BY a NULL ts diverges cross-engine (Spark NULLS FIRST /
    # DuckDB NULLS LAST, pinned class 8) — time order needs a timestamp
    e = load(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id",
        (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))).alias("delta_us"),
        F.lead("event_type").over(w).alias("next_type"),
    )


@op(
    "win_running_sum",
    oracle=f"""
    SELECT event_id,
           (round(sum({finite_sql("value")}) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                 2) + 0.0) AS run_total
    FROM events WHERE ts IS NOT NULL
    """,
    tags=("window",),
)
def win_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative frame per user (same accumulation order both engines →
    bit-stable doubles). The summand carries the well-scaled contract:
    once an extreme enters the prefix, DuckDB's segment-tree partials and
    Spark's frame rescan sum in different orders and the last ULP shows;
    +0.0 normalizes the signed zero of all-denormal prefixes."""
    e = load(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return e.select(
        "event_id",
        zn(F.round(F.sum(finite(F.col("value"))).over(w), 2)).alias("run_total"),
    )


@op(
    "win_sliding_avg",
    oracle="""
    SELECT event_id,
           (CASE WHEN abs(CAST((value + coalesce(lag(value, 1) OVER w, 0) + coalesce(lag(value, 2) OVER w, 0))
             / (1 + CASE WHEN lag(value, 1) OVER w IS NULL THEN 0 ELSE 1 END
                  + CASE WHEN lag(value, 2) OVER w IS NULL THEN 0 ELSE 1 END) AS DOUBLE)) < 1e12 THEN CAST(round(CAST(CAST((value + coalesce(lag(value, 1) OVER w, 0) + coalesce(lag(value, 2) OVER w, 0))
             / (1 + CASE WHEN lag(value, 1) OVER w IS NULL THEN 0 ELSE 1 END
                  + CASE WHEN lag(value, 2) OVER w IS NULL THEN 0 ELSE 1 END) AS DOUBLE) AS DECIMAL(18,6)), 2) AS DOUBLE) ELSE CAST((value + coalesce(lag(value, 1) OVER w, 0) + coalesce(lag(value, 2) OVER w, 0))
             / (1 + CASE WHEN lag(value, 1) OVER w IS NULL THEN 0 ELSE 1 END
                  + CASE WHEN lag(value, 2) OVER w IS NULL THEN 0 ELSE 1 END) AS DOUBLE) END) AS mov_avg
    FROM events WHERE ts IS NOT NULL
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    tags=("window",),
)
def win_sliding_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded moving average (3-row frame), written as an explicit lag
    formula: DuckDB evaluates frame aggregates incrementally (segment tree),
    Spark re-scans the frame — last-ulp drift flips round() at boundaries.
    The lag form is the identical float expression on both engines."""
    e = load(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    l1, l2 = F.lag("value", 1).over(w), F.lag("value", 2).over(w)
    total = F.col("value") + F.coalesce(l1, F.lit(0.0)) + F.coalesce(l2, F.lit(0.0))
    n = (
        F.lit(1)
        + F.when(l1.isNull(), 0).otherwise(1)
        + F.when(l2.isNull(), 0).otherwise(1)
    )
    return e.select("event_id", money(total / n).alias("mov_avg"))


@op(
    "win_ntile_pct",
    oracle="""
    SELECT c_custkey,
           CAST(ntile(10) OVER w AS BIGINT) AS decile,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist() OVER w, 6) AS cume
    FROM customer WHERE c_acctbal IS NOT NULL
    WINDOW w AS (ORDER BY c_acctbal, c_custkey)
    """,
    tags=("window",),
)
def win_ntile_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile/percent_rank/cume_dist over a global total order (small-result
    op — the one family that intentionally runs single-partition)."""
    # ASC order over a nullable key: the class-8 null-position divergence
    c = load(spark, sf_dir, "customer").filter(F.col("c_acctbal").isNotNull())
    w = W.orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        F.ntile(10).over(w).cast("long").alias("decile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )
