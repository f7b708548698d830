"""Deterministic-sampling family: proportions, stability under dataset
growth (no split reshuffling), and stratified quota exactness."""

from __future__ import annotations

from pyspark.sql import functions as F

from aced_etl_pod_spark.operators.sampling import hash_bucket
from tests.conftest import SF_SMALL


def test_split_proportions_and_determinism(spark):
    df = spark.range(0, 20_000).withColumnRenamed("id", "doc_id")
    b = hash_bucket("doc_id")
    split = F.when(b < 80, "train").when(b < 90, "valid").otherwise("test")
    counts = {
        r["split"]: r["n"]
        for r in df.select(split.alias("split")).groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    assert abs(counts["train"] / 20_000 - 0.80) < 0.02
    assert abs(counts["valid"] / 20_000 - 0.10) < 0.02
    assert abs(counts["test"] / 20_000 - 0.10) < 0.02


def test_split_stable_under_growth(spark):
    """Adding rows must never move an existing row between splits — the
    anti-leakage property hash splitting buys over df.sample/randomSplit."""
    small = spark.range(0, 1_000).withColumnRenamed("id", "doc_id")
    big = spark.range(0, 5_000).withColumnRenamed("id", "doc_id").repartition(7)
    b = hash_bucket("doc_id")
    split = F.when(b < 80, "train").when(b < 90, "valid").otherwise("test")
    s1 = {r["doc_id"]: r["s"] for r in small.select("doc_id", split.alias("s")).collect()}
    s2 = {r["doc_id"]: r["s"] for r in big.select("doc_id", split.alias("s")).collect()}
    assert all(s2[k] == v for k, v in s1.items())


def test_hash_bucket_no_overflow_on_huge_ids(spark):
    """Snowflake-scale ids must not overflow: Spark (non-ANSI) would wrap
    silently while DuckDB errors — the mod-2^31 reduction keeps the
    arithmetic in-range and cross-engine identical for every int64 id."""
    import duckdb

    from aced_etl_pod_spark.operators.sampling import _bucket_sql

    ids = [0, 1, 2**31 - 1, 2**31, 2**40 + 123, 2**62, 2**63 - 1]
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = {
        r["doc_id"]: r["b"]
        for r in df.select("doc_id", hash_bucket("doc_id").alias("b")).collect()
    }
    con = duckdb.connect()
    for i in ids:
        (want,) = con.execute(
            f"SELECT {_bucket_sql('doc_id')} FROM (SELECT CAST({i} AS BIGINT) AS doc_id)"
        ).fetchone()
        assert got[i] == want, f"id {i}: spark {got[i]} != duckdb {want}"


def test_stratified_quota_exact(spark):
    from aced_etl_pod_spark.registry import registry

    out = registry()["sample_stratified_quota"].fn(spark, SF_SMALL)
    per_lang = out.groupBy("lang").agg(F.count("*").alias("n")).collect()
    assert all(r["n"] <= 50 for r in per_lang)
    assert out.select("doc_id").distinct().count() == out.count()
