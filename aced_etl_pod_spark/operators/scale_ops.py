"""Scale-discipline operators (100 TB design evidence, SURVEY §7.3.7):
skew-safe salted aggregation/join and bucketed co-located joins, each
oracle-verified to produce exactly the plain operator's result — the
physical plan changes, the semantics must not.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aced_etl_pod_spark.operators.util import wsum, wsum_sql
from aced_etl_pod_spark.plans.scale import (
    salted_group_count,
    salted_join_small_skew,
    write_bucketed,
)
from aced_etl_pod_spark.registry import op
from aced_etl_pod_spark.tables import load


@op(
    "agg_salted_skew",
    oracle="""
    SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("scale", "agg"),
)
def agg_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted count over a genuinely skewed key (3 distinct
    l_returnflag values): phase 1 spreads each key over 8 sub-reducers,
    phase 2 merges. Result must equal the plain groupBy."""
    li = load(spark, sf_dir, "lineitem")
    return salted_group_count(li, "l_returnflag", "l_orderkey")


@op(
    "join_salted_skew",
    oracle=f"""
    SELECT s_nationkey,
           CAST(count(*) AS BIGINT) AS n_items,
           {wsum_sql("l_quantity")} AS qty
    FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
    GROUP BY s_nationkey
    """,
    tags=("scale", "join"),
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe salted join (dim replicated per salt, fact salted
    deterministically) — same rows as the plain equi-join."""
    li = load(spark, sf_dir, "lineitem").withColumnRenamed("l_suppkey", "suppkey")
    sup = load(spark, sf_dir, "supplier").withColumnRenamed("s_suppkey", "suppkey")
    joined = salted_join_small_skew(li, sup, "suppkey")
    return joined.groupBy("s_nationkey").agg(
        F.count("*").alias("n_items"), wsum(F.col("l_quantity")).alias("qty")
    )


@op(
    "join_bucketed_colocated",
    oracle=f"""
    SELECT c_nationkey,
           CAST(count(*) AS BIGINT) AS n_orders,
           {wsum_sql("o_totalprice")} AS total
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_nationkey
    """,
    tags=("scale", "join"),
)
def join_bucketed_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucket both sides on the join key at write time (8 buckets, sorted),
    then sort-merge join the bucketed tables — NO exchange on either side
    (asserted on the plan in tests/test_plans.py). The one-time-shuffle-at-
    write pattern that amortizes recurring 100 TB joins."""
    orders = load(spark, sf_dir, "orders").withColumnRenamed("o_custkey", "custkey")
    customer = load(spark, sf_dir, "customer").withColumnRenamed("c_custkey", "custkey")
    write_bucketed(spark, orders, "b_orders", "custkey")
    write_bucketed(spark, customer, "b_customer", "custkey")
    bo = spark.table("b_orders")
    bc = spark.table("b_customer")
    joined = bo.hint("merge").join(bc, "custkey")
    return joined.groupBy("c_nationkey").agg(
        F.count("*").alias("n_orders"),
        wsum(F.col("o_totalprice")).alias("total"),
    )
