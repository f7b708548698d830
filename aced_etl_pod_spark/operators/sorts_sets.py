"""Sort / limit / set operators (SURVEY.md §2.b — 5 IDs).

Anchors: multi-commit accumulation in the reference's put loop is UNION ALL
(etl-job/fhir_import_export.py:451-468); project teardown is EXCEPT
semantics (:372-385); the limit-1 study read (:275) generalizes to global
top-k. Sort order itself is captured as a row_number column so the driver's
order-insensitive hash still verifies ordering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from aced_etl_pod_spark.operators.util import money, money_sql
from aced_etl_pod_spark.registry import op
from aced_etl_pod_spark.tables import load


@op(
    "sort_multi_key",
    oracle="""
    SELECT c_custkey, v,
           CAST(row_number() OVER (ORDER BY v ASC NULLS FIRST, c_custkey) AS BIGINT) AS pos
    FROM (
      SELECT c_custkey,
             CASE WHEN c_acctbal < 0 THEN NULL ELSE round(c_acctbal, 2) END AS v
      FROM customer
    )
    """,
    tags=("sort",),
)
def sort_multi_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key ORDER BY with explicit nulls placement; the resulting rank
    is materialized so ordering is value-checked."""
    c = load(spark, sf_dir, "customer")
    v = F.when(F.col("c_acctbal") < 0, F.lit(None)).otherwise(F.round("c_acctbal", 2))
    w = W.orderBy(F.asc_nulls_first("v"), "c_custkey")
    return (
        c.select("c_custkey", v.alias("v"))
        .withColumn("pos", F.row_number().over(w).cast("long"))
        .orderBy(F.asc_nulls_first("v"), "c_custkey")
    )


@op(
    "limit_topk_global",
    oracle=f"""
    SELECT o_orderkey, {money_sql("o_totalprice")} AS price
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20
    """,
    tags=("sort",),
)
def limit_topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k with tie-break (Spark compiles to TakeOrderedAndProject —
    per-partition heaps, no global sort, the right plan at 100 TB)."""
    o = load(spark, sf_dir, "orders")
    return (
        o.orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(20)
        # money(): plain round() of an extreme double drifts a ULP in
        # DuckDB (multiply-based kernel); the sandwich rounds in-bounds
        # values identically and passes out-of-bounds raw
        .select("o_orderkey", money(F.col("o_totalprice")).alias("price"))
    )


@op(
    "set_union",
    oracle="""
    SELECT kind, k, CAST(count(*) AS BIGINT) AS n FROM (
      SELECT 'all' AS kind, c_nationkey AS k FROM customer
      UNION ALL
      SELECT 'all' AS kind, s_nationkey AS k FROM supplier
    ) GROUP BY kind, k
    UNION ALL
    SELECT 'dist' AS kind, k, CAST(1 AS BIGINT) AS n FROM (
      SELECT c_nationkey AS k FROM customer
      UNION
      SELECT s_nationkey AS k FROM supplier
    )
    """,
    tags=("setop",),
)
def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL and UNION-distinct in one query (multi-commit accumulation,
    fhir_import_export.py:451-468)."""
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("k"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("k"))
    union_all = (
        c.unionByName(s)
        .groupBy("k")
        .agg(F.count("*").alias("n"))
        .select(F.lit("all").alias("kind"), "k", "n")
    )
    union_dist = c.union(s).distinct().select(
        F.lit("dist").alias("kind"), "k", F.lit(1).cast("long").alias("n")
    )
    return union_all.unionByName(union_dist)


@op(
    "set_intersect",
    oracle="""
    SELECT c_nationkey AS k FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    """,
    tags=("setop",),
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct semantics)."""
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("k"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("k"))
    return c.intersect(s)


@op(
    "set_except",
    oracle="""
    SELECT 'dist' AS kind, v, CAST(1 AS BIGINT) AS n FROM (
      SELECT CAST(c_nationkey AS VARCHAR) AS v FROM customer
      EXCEPT
      SELECT CAST(s_nationkey AS VARCHAR) FROM supplier
    )
    UNION ALL
    SELECT 'multi' AS kind, v, CAST(count(*) AS BIGINT) AS n FROM (
      SELECT o_orderstatus AS v FROM orders
      EXCEPT ALL
      SELECT l_linestatus FROM lineitem
    ) GROUP BY v
    """,
    tags=("setop",),
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct) and EXCEPT ALL (multiset) — delete semantics
    (fhir_import_export.py:372-385)."""
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").cast("string").alias("v"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").cast("string").alias("v"))
    dist = c.subtract(s).select(F.lit("dist").alias("kind"), "v", F.lit(1).cast("long").alias("n"))
    o = load(spark, sf_dir, "orders").select(F.col("o_orderstatus").alias("v"))
    li = load(spark, sf_dir, "lineitem").select(F.col("l_linestatus").alias("v"))
    multi = (
        o.exceptAll(li)
        .groupBy("v")
        .agg(F.count("*").alias("n"))
        .select(F.lit("multi").alias("kind"), "v", "n")
    )
    return dist.unionByName(multi)
