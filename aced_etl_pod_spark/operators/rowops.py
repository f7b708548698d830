"""Row-level operators: projection, predicates, null semantics, struct
flattening, array explosion (SURVEY.md §2.b — 5 IDs).

Anchors: the reference's "simplify" flattening step
(``simplify_directory(..., dialect='PFB')``, etl-job/fhir_import_export.py:219-222)
is schema-driven projection + struct flattening; its graph envelopes
(:280-285) carry ``relations`` arrays that become edge rows via explode;
its per-project filters (:264-273) are pushed-down predicates.

All five compile to pure Catalyst plans — filters and column pruning reach
the parquet scan (verified in tests via the explain string), which is the
whole 100 TB story for this family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
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
    "project_select",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           (CASE WHEN abs(CAST(l_extendedprice * (1 - l_discount) AS DOUBLE)) < 1e12 THEN CAST(round(CAST(CAST(l_extendedprice * (1 - l_discount) AS DOUBLE) AS DECIMAL(18,6)), 2) AS DOUBLE) ELSE CAST(l_extendedprice * (1 - l_discount) AS DOUBLE) END) AS net_price,
           l_returnflag || '/' || l_linestatus AS flag_status
    FROM lineitem
    """,
    tags=("rowop",),
)
def project_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column pruning + rename + computed column ("simplify" projection core)."""
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        money(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net_price"),
        # F.concat (NULL-propagating, like the oracle's ||) rather than
        # concat_ws, which silently SKIPS null parts (class 4)
        F.concat(F.col("l_returnflag"), F.lit("/"), F.col("l_linestatus")).alias(
            "flag_status"
        ),
    )


@op(
    "filter_pred",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_orderpriority,
           round(o_totalprice, 2) AS price,
           strftime(o_orderdate, '%Y-%m-%d') AS odate
    FROM orders
    WHERE o_orderstatus IN ('F', 'P')
      AND o_totalprice BETWEEN 50000 AND 200000
      AND (o_orderpriority LIKE '1%' OR o_orderpriority LIKE '2%')
      AND o_orderdate >= TIMESTAMP '1996-01-01'
    """,
    tags=("rowop",),
)
def filter_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive/disjunctive predicates with IN/BETWEEN/LIKE/date compare
    (generalizes the per-project pushdown filter, fhir_import_export.py:264-273)."""
    o = load(spark, sf_dir, "orders")
    return o.filter(
        F.col("o_orderstatus").isin("F", "P")
        & F.col("o_totalprice").between(50000, 200000)
        & (F.col("o_orderpriority").like("1%") | F.col("o_orderpriority").like("2%"))
        & (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
    ).select(
        "o_orderkey",
        "o_orderstatus",
        "o_orderpriority",
        F.round("o_totalprice", 2).alias("price"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("odate"),
    )


@op(
    "filter_null_semantics",
    oracle="""
    SELECT l_linestatus,
           CAST(count(*) FILTER (WHERE nullif(l_returnflag, 'N') IS NULL) AS BIGINT) AS n_null,
           CAST(count(nullif(l_returnflag, 'N')) AS BIGINT) AS n_notnull,
           CAST(count(*) FILTER (
             WHERE nullif(l_returnflag, 'N') IS NOT DISTINCT FROM nullif(l_returnflag, 'A')
           ) AS BIGINT) AS n_safe_eq
    FROM lineitem
    GROUP BY l_linestatus
    """,
    tags=("rowop",),
)
def filter_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-valued logic: IS NULL / IS NOT NULL / null-safe equality (<=>).
    Anchors the reference's empty-input branch (fhir_import_export.py:235-238)."""
    li = load(spark, sf_dir, "lineitem")
    a = F.nullif(F.col("l_returnflag"), F.lit("N"))
    b = F.nullif(F.col("l_returnflag"), F.lit("A"))
    return li.groupBy("l_linestatus").agg(
        F.count(F.when(a.isNull(), 1)).alias("n_null"),
        F.count(a).alias("n_notnull"),
        F.count(F.when(a.eqNullSafe(b), 1)).alias("n_safe_eq"),
    )


@op(
    "flatten_struct",
    oracle=f"""
    SELECT c_custkey, c_name AS name,
           {money_sql("c_acctbal")} AS acctbal,
           c_mktsegment AS segment
    FROM customer
    """,
    tags=("rowop",),
)
def flatten_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested struct → flat columns — the "simplify" core
    (fhir_import_export.py:219-222; envelope shape :280-285). Builds a
    two-level struct then flattens via dotted paths; nested-schema pruning
    keeps the scan narrow."""
    c = load(spark, sf_dir, "customer")
    nested = c.select(
        "c_custkey",
        F.struct(
            F.col("c_name").alias("name"),
            F.col("c_acctbal").alias("acctbal"),
            F.struct(F.col("c_mktsegment").alias("segment")).alias("deep"),
        ).alias("obj"),
    )
    return nested.select(
        "c_custkey",
        F.col("obj.name").alias("name"),
        money(F.col("obj.acctbal")).alias("acctbal"),
        F.col("obj.deep.segment").alias("segment"),
    )


@op(
    "explode_array",
    oracle="""
    WITH base AS (
      SELECT p_brand,
             CASE WHEN p_size < 3 THEN NULL ELSE string_split(p_name, ' ') END AS arr
      FROM part
    ), flat AS (
      SELECT p_brand, unnest(arr) AS word FROM base WHERE arr IS NOT NULL
      UNION ALL
      SELECT p_brand, NULL AS word FROM base WHERE arr IS NULL
    )
    SELECT p_brand, word, CAST(count(*) AS BIGINT) AS n
    FROM flat GROUP BY p_brand, word
    """,
    tags=("rowop",),
)
def explode_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array → rows incl. the outer (null-preserving) variant — edges from
    ``relations`` arrays (fhir_import_export.py:281) and codings (:284-285)."""
    p = load(spark, sf_dir, "part")
    arr = F.when(F.col("p_size") < 3, F.lit(None)).otherwise(F.split("p_name", " "))
    return (
        p.select("p_brand", F.explode_outer(arr).alias("word"))
        .groupBy("p_brand", "word")
        .agg(F.count("*").alias("n"))
    )
