"""UDF / UDAF / UDTF operators (SURVEY.md §2.b — 4 IDs).

Anchor: the reference's custom "simplify" logic (schema-driven per-record
transforms, etl-job/fhir_import_export.py:219-222) is the slot where user
code runs inside the engine. Preference order at 100 TB: built-in exprs ≫
Arrow-vectorized pandas UDFs ≫ row-at-a-time Python UDFs — the scalar
Python UDF below exists to cover the API surface, not as a pattern.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from aced_etl_pod_spark.operators.util import finite, finite_sql, money, money_sql
from aced_etl_pod_spark.registry import op
from aced_etl_pod_spark.tables import load


@op(
    "udf_scalar_python",
    oracle="""
    SELECT o_orderkey,
           CAST(string_split(o_orderpriority, '-')[1] AS BIGINT) AS prio_rank
    FROM orders
    """,
    tags=("udf",),
)
def udf_scalar_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time scalar Python UDF (API coverage; the slow path)."""

    @F.udf(T.LongType())
    def prio_rank(p: str) -> int:
        # NULL propagates like the oracle's SQL (a row UDF sees None)
        return None if p is None else int(p.split("-")[0])

    o = load(spark, sf_dir, "orders")
    return o.select("o_orderkey", prio_rank("o_orderpriority").alias("prio_rank"))


@op(
    "udf_pandas_vectorized",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           (CASE WHEN abs(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DOUBLE)) < 1e12 THEN CAST(round(CAST(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DOUBLE) AS DECIMAL(18,6)), 2) AS DOUBLE) ELSE CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DOUBLE) END) AS charged
    FROM lineitem
    """,
    tags=("udf",),
)
def udf_pandas_vectorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-vectorized scalar pandas UDF (Series→Series) — the default
    vehicle for custom logic at scale (~10-100× the row UDF)."""

    @F.pandas_udf(T.DoubleType())
    def charge(price: pd.Series, disc: pd.Series, tax: pd.Series) -> pd.Series:
        return price * (1 - disc) * (1 + tax)

    li = load(spark, sf_dir, "lineitem")
    raw = charge("l_extendedprice", "l_discount", "l_tax")
    return li.select("l_orderkey", "l_linenumber", money(raw).alias("charged"))


@op(
    "udaf_pandas_grouped_agg",
    oracle="""
    SELECT l_returnflag,
           (CASE WHEN abs(CAST(sum(l_extendedprice * l_quantity) / sum(l_quantity) AS DOUBLE)) < 1e12 THEN CAST(round(CAST(CAST(sum(l_extendedprice * l_quantity) / sum(l_quantity) AS DOUBLE) AS DECIMAL(18,6)), 2) AS DOUBLE) ELSE CAST(sum(l_extendedprice * l_quantity) / sum(l_quantity) AS DOUBLE) END) AS w_avg_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("udf",),
)
def udaf_pandas_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-agg pandas UDF (custom UDAF): quantity-weighted mean price."""

    @F.pandas_udf(T.DoubleType())
    def weighted_avg(price: pd.Series, qty: pd.Series) -> float:
        return float((price * qty).sum() / qty.sum())

    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        money(weighted_avg("l_extendedprice", "l_quantity")).alias("w_avg_price")
    )


@op(
    "udtf_apply_in_pandas",
    oracle="""
    SELECT c_custkey, c_nationkey,
           CAST(rank() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal) AS BIGINT)
               AS bal_rank,
           (CASE WHEN abs(CAST(c_acctbal - avg(c_acctbal) OVER (PARTITION BY c_nationkey) AS DOUBLE)) < 1e12 THEN CAST(round(CAST(CAST(c_acctbal - avg(c_acctbal) OVER (PARTITION BY c_nationkey) AS DOUBLE) AS DECIMAL(18,6)), 2) AS DOUBLE) ELSE CAST(c_acctbal - avg(c_acctbal) OVER (PARTITION BY c_nationkey) AS DOUBLE) END) AS centered
    FROM customer WHERE (CASE WHEN abs(CAST(c_acctbal AS DOUBLE)) < 1e12 THEN CAST(c_acctbal AS DOUBLE) END) IS NOT NULL
    """,
    tags=("udf",),
)
def udtf_apply_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map (DataFrame→DataFrame per group) via applyInPandas — the
    per-patient denormalize pattern (fhir_import_export.py:229): arbitrary
    per-group pandas logic, schema declared up front, groups distributed
    across executors."""

    def per_nation(pdf: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "c_custkey": pdf["c_custkey"],
                "c_nationkey": pdf["c_nationkey"],
                "bal_rank": pdf["c_acctbal"].rank(method="min").astype("int64"),
                "centered": pdf["c_acctbal"] - pdf["c_acctbal"].mean(),
            }
        )
        return out

    # a NULL or non-finite balance has no rank (pandas rank(NaN).astype(int)
    # raises; SQL rank puts it at the class-8 divergent end; pandas mean()
    # skips NaN where SQL avg propagates) — excluded both sides
    c = load(spark, sf_dir, "customer").filter(
        finite(F.col("c_acctbal")).isNotNull()
    )
    out = c.groupBy("c_nationkey").applyInPandas(
        per_nation,
        schema="c_custkey long, c_nationkey int, bal_rank long, centered double",
    )
    return out.select("c_custkey", "c_nationkey", "bal_rank", money(F.col("centered")).alias("centered"))


@op(
    "udtf_python_lateral",
    oracle="""
    SELECT o_orderkey, unnest(string_split(o_orderpriority, '-')) AS part,
           CAST(len(unnest(string_split(o_orderpriority, '-'))) AS INTEGER)
             AS plen
    FROM orders WHERE o_orderkey % 500 = 0
    """,
    tags=("udf", "extra"),
)
def udtf_python_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Spark 3.5+ Python UDTF surface (@udtf class with eval-yield),
    registered and invoked through a LATERAL SQL call — the fourth Python
    extension point beside scalar UDF / pandas UDF / applyInPandas. The
    function splits the order-priority code into its parts (1→N rows per
    input row).

    UDTFs are the slow path at 100 TB (row-at-a-time Python, like
    udf_scalar_python — the docstring contract of that op applies): this
    exists to cover the API; the equivalent explode(split()) is the plan
    a pipeline should ship, and the oracle is exactly that expression."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="part string, plen int")
    class SplitPriority:
        def eval(self, s: str):
            # NULL in → ZERO rows out: the lateral-unnest semantic both
            # engines share (DuckDB's unnest of a NULL list emits no
            # rows; `(s or "")` would fabricate one empty part)
            if s is None:
                return
            for p in s.split("-"):
                yield p, len(p)

    spark.udtf.register("split_priority", SplitPriority)
    o = load(spark, sf_dir, "orders")
    o.filter(F.col("o_orderkey") % 500 == 0).createOrReplaceTempView(
        "orders_sub"
    )
    return spark.sql(
        """
        SELECT o.o_orderkey, t.part, t.plen
        FROM orders_sub o, LATERAL split_priority(o.o_orderpriority) t
        """
    )


@op(
    "udf_map_in_arrow",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           (CASE WHEN abs(CAST(l_extendedprice * (1 - l_discount) AS DOUBLE)) < 1e12 THEN CAST(round(CAST(CAST(l_extendedprice * (1 - l_discount) AS DOUBLE) AS DECIMAL(18,6)), 2) AS DOUBLE) ELSE CAST(l_extendedprice * (1 - l_discount) AS DOUBLE) END) AS discounted
    FROM lineitem
    WHERE l_quantity >= 25
    """,
    tags=("udf", "extra"),
)
def udf_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``mapInArrow``: the lowest-overhead Python stage — the UDF receives
    raw ``pyarrow.RecordBatch``es and computes with Arrow compute kernels
    directly, skipping the pandas conversion both ``mapInPandas`` and
    pandas UDFs pay. The right surface when the Python work is itself
    columnar (Arrow/NumPy kernels, model featurizers): at 100 TB the
    serialization tax is the difference between a Python stage that keeps
    up with the scan and one that doesn't. Filter applied BEFORE the
    Python stage so the scan prunes rows JVM-side; rounding applied after
    with the decimal sandwich."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def discount(batches):
        for batch in batches:
            price = batch.column("l_extendedprice")
            disc = batch.column("l_discount")
            out = pc.multiply(price, pc.subtract(pa.scalar(1.0), disc))
            # declared output schema says int64/float64 — cast explicitly,
            # Spark does NOT coerce a mismatched Arrow type for you
            yield pa.RecordBatch.from_arrays(
                [
                    pc.cast(batch.column("l_orderkey"), pa.int64()),
                    pc.cast(batch.column("l_linenumber"), pa.int64()),
                    pc.cast(out, pa.float64()),
                ],
                names=["l_orderkey", "l_linenumber", "raw"],
            )

    li = (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") >= 25)
        .select("l_orderkey", "l_linenumber", "l_extendedprice", "l_discount")
    )
    out = li.mapInArrow(
        discount, "l_orderkey long, l_linenumber long, raw double"
    )
    return out.select(
        "l_orderkey", "l_linenumber", money(F.col("raw")).alias("discounted")
    )


# ---------------------------------------------------------------------------
# udtf_table_argument (round-7 registration queue)
# ---------------------------------------------------------------------------

UDTF_TABLE_ARGUMENT_ORACLE = """
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           -- asymmetric on purpose, mirroring the UDTF: `first` keeps
           -- looking past NULL types (min_by's skip-null-values matches),
           -- while `last` is the literal final row even when NULL (the
           -- coalesce/nullif sandwich defeats max_by's skip)
           min_by(event_type, strftime(ts, '%Y-%m-%d %H:%M:%S.%f') || '|' ||
                  lpad(CAST(event_id AS VARCHAR), 12, '0')) AS first_type,
           nullif(max_by(coalesce(event_type, '@null@'),
                  strftime(ts, '%Y-%m-%d %H:%M:%S.%f') || '|' ||
                  lpad(CAST(event_id AS VARCHAR), 12, '0')), '@null@')
             AS last_type
    FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
    GROUP BY user_id
"""


@op("udtf_table_argument", oracle=UDTF_TABLE_ARGUMENT_ORACLE, tags=('udf', 'extra'))
def udtf_table_argument(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Spark 3.5+/4 polymorphic table function surface: a Python UDTF
    invoked with a TABLE(...) argument, PARTITION BY user_id ORDER BY
    (ts, event_id) — the engine routes each user's rows, in order, into
    one UDTF instance (eval per row, terminate emits the summary). This
    is the MATCH_RECOGNIZE-class escape hatch for per-key sequential
    logic the DataFrame API can't express declaratively, with the
    PARTITION BY clause doing exactly what applyInPandas' groupBy does —
    but streamed row-wise, so a partition never materializes as one
    in-memory frame. Oracle: the same first/last-by-time summary via
    min_by/max_by over a fixed-width 'timestamp|event_id' composite
    (lexicographically the (ts, event_id) total order)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="user_id bigint, n_events bigint, first_type string, last_type string")
    class PerUserSummary:
        def __init__(self):
            self.uid = None
            self.n = 0
            self.first = None
            self.last = None

        def eval(self, row):
            self.uid = row["user_id"]
            self.n += 1
            if self.first is None:
                self.first = row["event_type"]
            self.last = row["event_type"]

        def terminate(self):
            if self.uid is not None:
                yield self.uid, self.n, self.first, self.last

    spark.udtf.register("per_user_summary", PerUserSummary)
    events_path = f"{sf_dir}/events.parquet"
    # anonymous (NULL-user) partitions would be silently dropped by the
    # uid-is-None terminate guard while the oracle's GROUP BY keeps them;
    # null-ts rows take class-8 divergent order slots — excluded both sides
    load(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    ).createOrReplaceTempView("udtf_events_src")
    return spark.sql(
        """SELECT * FROM per_user_summary(
             TABLE(SELECT user_id, event_type, ts, event_id
                   FROM udtf_events_src)
             PARTITION BY user_id ORDER BY (ts, event_id))"""
    ).orderBy("user_id")


# ---------------------------------------------------------------------------
# udf_scalar_arrow (round-7+ registration queue, tranche 44)
# ---------------------------------------------------------------------------

UDF_SCALAR_ARROW_ORACLE = """
    SELECT o_orderkey,
           upper(string_split(o_orderpriority, '-')[2]) AS prio_word,
           CAST(length(o_orderpriority) AS BIGINT) AS prio_len
    FROM orders
"""


@op("udf_scalar_arrow", oracle=UDF_SCALAR_ARROW_ORACLE, tags=('udf', 'extra'))
def udf_scalar_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4's ARROW-OPTIMIZED scalar Python UDF (``useArrow=True``,
    SPARK-40307): same row-wise authoring model as udf_scalar_python but
    the engine ships batches over Arrow instead of pickled rows —
    closing most of the gap to pandas UDFs while keeping per-row code.
    Completes the Python-execution ladder the module documents: row
    pickle UDF < THIS < pandas UDF < map_in_arrow < pure Catalyst.
    Same-task parity with the built-in-function oracle proves the
    serialization change never touches semantics."""

    @F.udf(T.StringType(), useArrow=True)
    def prio_word(p: str) -> str:
        # NULL propagates like the oracle's SQL
        return None if p is None else p.split("-")[1].upper()

    @F.udf(T.LongType(), useArrow=True)
    def prio_len(p: str) -> int:
        return None if p is None else len(p)

    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        prio_word("o_orderpriority").alias("prio_word"),
        prio_len("o_orderpriority").alias("prio_len"),
    )


# ---------------------------------------------------------------------------
# scan_python_datasource (round-7+ registration queue, tranche 44)
# ---------------------------------------------------------------------------

SCAN_PYTHON_DATASOURCE_ORACLE = """
    WITH r AS (
      SELECT unnest(range(10000)) AS rid
    ), hashed AS (
      SELECT rid, (rid * 2654435761) % 4294967296 AS h FROM r
    ), rows_ AS (
      SELECT CAST(rid // 2500 AS INT) AS shard,
             CAST(round(-10 + (h % 6000) / 100.0, 2) AS DECIMAL(10,2))
               AS temp,
             CASE WHEN h % 97 = 0 THEN 'fault' ELSE 'ok' END AS status
      FROM hashed
    )
    SELECT shard,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN status = 'fault' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_fault,
           (CASE WHEN abs(CAST(CAST(sum(temp) AS DOUBLE) / count(*) AS DOUBLE)) < 1e9 THEN CAST(round(CAST(CAST(CAST(sum(temp) AS DOUBLE) / count(*) AS DOUBLE) AS DECIMAL(18,9)), 4) AS DOUBLE) ELSE CAST(CAST(sum(temp) AS DOUBLE) / count(*) AS DOUBLE) END) AS avg_temp
    FROM rows_
    GROUP BY shard
    ORDER BY shard
"""


@op("scan_python_datasource", oracle=SCAN_PYTHON_DATASOURCE_ORACLE, tags=('scan', 'extra'))
def scan_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4's Python DataSource API (SPARK-44076) exercised end to
    end: a pure-Python custom source (sources/pysource.py) with REAL
    partition planning — ``partitions()`` returns 4 InputPartitions and
    each becomes one Spark task, so the scan parallelizes exactly like a
    file source. This is the extension point an engine user reaches for
    when the data lives behind an API no built-in reader speaks.

    The source is a deterministic hash-derived sensor feed, so the
    DuckDB oracle regenerates the identical content from the same
    formula — the differential proves the custom reader's rows, typing,
    and partitioning all arrive intact. Plan: the custom scan then ONE
    partial agg; per-shard results also pin that every partition was
    actually read (n = rows-per-shard each)."""
    from aced_etl_pod_spark.sources.pysource import SensorSynthDataSource

    try:
        spark.dataSource.register(SensorSynthDataSource)
    except Exception:
        pass  # already registered in this session
    raw = spark.read.format("sensor_synth").load()
    return (
        raw.groupBy("shard")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.when(F.col("status") == "fault", 1).otherwise(0))
            .cast("long")
            .alias("n_fault"),
            F.expr(
                "CAST(round(CAST(CAST(sum(CAST(temp_c AS DECIMAL(10,2)))"
                " AS DOUBLE) / count(*) AS DECIMAL(18,9)), 4) AS DOUBLE)"
            ).alias("avg_temp"),
        )
        .select("shard", F.col("n").cast("long"), "n_fault", "avg_temp")
        .orderBy("shard")
    )
