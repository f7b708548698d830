"""Scan / source / sink operators (SURVEY.md §2.b — 7 IDs).

Anchors: NDJSON resource files are the reference's bronze layer
(etl-job/fhir_import_export.py:210-213); flat-index bulk load is the
partitioned sink (:230-258); filtered NDJSON export is ``fhir_get``-style
(:334); partition drop / upsert are project delete (:372-385) and discovery
upsert (:288).

Sink ops are verified by READ-BACK: write to scratch, re-read, aggregate —
so the oracle checks the full write→read round trip, not just the plan.
Schemas on every non-parquet scan are explicit (never inferSchema — a
100 TB inference scan is unacceptable, SURVEY §1.2).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from aced_etl_pod_spark.operators.util import (
    finite,
    finite_sql,
    money,
    money_sql,
    wsum,
    wsum_sql,
)
from aced_etl_pod_spark.plans.storage import drop_partition, write_partitioned
from aced_etl_pod_spark.plans.storage import upsert_by_key as merge_by_key
from aced_etl_pod_spark.registry import op
from aced_etl_pod_spark.tables import load, session_scratch_dir

CUSTOMER_SCHEMA = T.StructType(
    [
        T.StructField("c_custkey", T.LongType()),
        T.StructField("c_name", T.StringType()),
        T.StructField("c_nationkey", T.IntegerType()),
        T.StructField("c_acctbal", T.DoubleType()),
        T.StructField("c_mktsegment", T.StringType()),
    ]
)

NATION_SCHEMA = T.StructType(
    [
        T.StructField("n_nationkey", T.IntegerType()),
        T.StructField("n_name", T.StringType()),
        T.StructField("n_regionkey", T.IntegerType()),
    ]
)


def _fresh(sub: str) -> str:
    path = session_scratch_dir(sub)
    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path, exist_ok=True)
    return path


@op(
    "scan_parquet",
    oracle=f"""
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n,
           {wsum_sql("l_quantity")} AS qty
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_quantity > 25
    GROUP BY l_returnflag
    """,
    tags=("scan",),
)
def scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Columnar scan with pushed-down predicate + pruned columns (the
    engine's default source; tests assert PushedFilters in the plan)."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_quantity") > 25)
        )
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("n"), wsum(F.col("l_quantity")).alias("qty"))
    )


@op(
    "scan_ndjson",
    oracle=f"""
    SELECT c_mktsegment,
           CAST(count(*) AS BIGINT) AS n,
           {wsum_sql("c_acctbal")} AS bal
    FROM customer
    GROUP BY c_mktsegment
    """,
    tags=("scan",),
)
def scan_ndjson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDJSON scan with explicit schema (bronze FHIR resources,
    fhir_import_export.py:210-213). Round-trips the customer table through
    NDJSON on scratch, then aggregates the re-read — verifying the scan,
    not the original parquet."""
    out = _fresh("scan_ndjson")
    load(spark, sf_dir, "customer").coalesce(4).write.mode("overwrite").json(out)
    back = spark.read.schema(CUSTOMER_SCHEMA).json(out)
    return back.groupBy("c_mktsegment").agg(
        F.count("*").alias("n"), wsum(F.col("c_acctbal")).alias("bal")
    )


@op(
    "scan_csv",
    oracle="""
    SELECT n_regionkey,
           CAST(count(*) AS BIGINT) AS n,
           string_agg(n_name, ',' ORDER BY n_name) AS names
    FROM nation
    GROUP BY n_regionkey
    """,
    tags=("scan",),
)
def scan_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV scan with header + explicit types (format coverage)."""
    out = _fresh("scan_csv")
    load(spark, sf_dir, "nation").coalesce(1).write.mode("overwrite").option(
        "header", True
    ).csv(out)
    back = spark.read.schema(NATION_SCHEMA).option("header", True).csv(out)
    return back.groupBy("n_regionkey").agg(
        F.count("*").alias("n"),
        F.array_join(F.sort_array(F.collect_list("n_name")), ",").alias("names"),
    )


@op(
    "sink_parquet_partitioned",
    oracle=f"""
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n,
           {wsum_sql("o_totalprice")} AS total
    FROM orders
    GROUP BY o_orderstatus
    """,
    tags=("sink",),
)
def sink_parquet_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partitioned write + read-back (flat-index load, R9; partition column
    is the project_id-analog tenancy key, fhir_import_export.py:55-59)."""
    out = _fresh("sink_parquet_partitioned")
    o = load(spark, sf_dir, "orders")
    write_partitioned(o, out, "o_orderstatus")
    # explicit schema: a zero-row partitioned write leaves no files to
    # infer from (the empty-daily-partition case), and at scale it skips
    # the footer-sampling inference pass entirely
    back = spark.read.schema(o.schema).parquet(out)
    return back.groupBy("o_orderstatus").agg(
        F.count("*").alias("n"), wsum(F.col("o_totalprice")).alias("total")
    )


@op(
    "sink_json_export",
    oracle=f"""
    SELECT c_custkey, c_name, {money_sql("c_acctbal")} AS acctbal
    FROM customer WHERE c_mktsegment = 'BUILDING'
    """,
    tags=("sink",),
)
def sink_json_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered NDJSON export + read-back (``fhir_get`` project export,
    fhir_import_export.py:334)."""
    out = _fresh("sink_json_export")
    load(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    ).write.mode("overwrite").json(out)
    back = spark.read.schema(CUSTOMER_SCHEMA).json(out)
    return back.select("c_custkey", "c_name", money(F.col("c_acctbal")).alias("acctbal"))


@op(
    "delete_partition",
    oracle="""
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n
    FROM orders
    -- IS DISTINCT FROM: the null-status partition
    -- (__HIVE_DEFAULT_PARTITION__) survives the drop of 'F' and must
    -- survive the predicate too; <> would three-valued-logic it away
    WHERE o_orderstatus IS DISTINCT FROM 'F'
    GROUP BY o_orderstatus
    """,
    tags=("sink",),
)
def delete_partition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition drop: write partitioned, remove one key's partition
    directory (O(metadata)), read back (project teardown, R17,
    fhir_import_export.py:372-385)."""
    out = _fresh("delete_partition")
    o = load(spark, sf_dir, "orders")
    write_partitioned(o, out, "o_orderstatus")
    drop_partition(out, "o_orderstatus", "F")
    # explicit schema — survives the all-partitions-dropped / empty-input
    # case where inference has no files left
    back = spark.read.schema(o.schema).parquet(out)
    return back.groupBy("o_orderstatus").agg(F.count("*").alias("n"))


@op(
    "upsert_by_key",
    oracle=f"""
    SELECT c_nationkey,
           CAST(count(*) AS BIGINT) AS n,
           {wsum_sql("CASE WHEN c_nationkey = 5 THEN c_acctbal * 2 ELSE c_acctbal END")} AS bal
    FROM customer
    GROUP BY c_nationkey
    """,
    tags=("sink",),
)
def upsert_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level upsert: replace rows for matching keys, keep the rest
    (discovery upsert, R12, fhir_import_export.py:288). anti-join ∪ updates."""
    c = load(spark, sf_dir, "customer")
    updates = c.filter(F.col("c_nationkey") == 5).withColumn(
        "c_acctbal", F.col("c_acctbal") * 2
    )
    merged = merge_by_key(c, updates, "c_custkey")
    return merged.groupBy("c_nationkey").agg(
        F.count("*").alias("n"), wsum(F.col("c_acctbal")).alias("bal")
    )
