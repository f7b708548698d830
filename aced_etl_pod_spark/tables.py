"""Test-table loaders (TESTDATA.md / FIXTURES.md §A).

Ten parquet tables per scale factor. ``load`` is the single scan entry point
so every operator inherits the same tuned session + columnar scan
(predicate pushdown / column pruning come free from the parquet source).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from aced_etl_pod_spark.session import tune

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Columnar scan of one test table.

    ``events.ts`` has been written by the generator as parquet
    TIMESTAMP(NANOS) in some rounds and TIMESTAMP(MICROS, ntz) in others, so
    normalise whatever the reader hands back to a session-UTC ``timestamp``:

    * ``bigint``        — raw nanos (legacy ``nanosAsLong`` read): truncate
      to micros, exactly what DuckDB does on the same file.
    * ``timestamp_ntz`` — naive micros: cast to ``timestamp`` (session tz is
      pinned to UTC, so the instant is unchanged and matches DuckDB).
    * ``timestamp``     — already what we want.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    tune(spark)
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        from pyspark.sql import functions as F

        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        ts_type = dict(df.dtypes)["ts"]
        if ts_type == "bigint":
            return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        if ts_type.startswith("timestamp_ntz"):
            return df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def scratch_dir(sub: str = "") -> str:
    """Writable scratch area for sink / round-trip operators (gitignored)."""
    base = os.environ.get("SPARK_GRAFT_SCRATCH", "/root/repo/.scratch")
    path = os.path.join(base, sub) if sub else base
    os.makedirs(path, exist_ok=True)
    return path
