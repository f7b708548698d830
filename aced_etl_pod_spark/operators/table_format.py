"""Transaction-log table-format operators: snapshot reads, time travel,
and manifest-level file skipping over sources/txnlog.py's ACID layer.

These close the warehouse's consistency story (the reference rebuilds its
stores wholesale per job, etl-job/fhir_import_export.py:230-258 /
:372-385; a 100 TB warehouse instead needs atomic incremental commits,
snapshot-isolated readers, and optimistic writers). The fixture is a real
three-commit table built from ``orders``: append → append → overwrite, so
the log contains add AND remove actions and every version is a distinct
queryable snapshot. Because each commit's contents are a deterministic
modulo-slice of orders, each snapshot has an exact DuckDB oracle over the
registered views.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aced_etl_pod_spark.operators.util import finite, finite_sql, money, money_sql
from aced_etl_pod_spark.registry import op
from aced_etl_pod_spark.sources.txnlog import (
    current_version,
    snapshot_files,
    txn_read,
    txn_write,
)
from aced_etl_pod_spark.tables import load, scratch_dir, session_scratch_dir


def build_orders_txn_table(spark: SparkSession, sf_dir: str) -> str:
    """Three-commit txn table from orders (cached per source fingerprint,
    same invalidation discipline as the DPP fixture):

      v0  append    o_orderkey % 7 == 0
      v1  append    o_orderkey % 7 == 1
      v2  overwrite o_orderkey % 7 <= 2   (removes v0+v1 files)

    Data files are range-distributed on o_orderkey (4 files/commit) with
    footer min/max recorded in the log — the stats that power manifest
    skipping."""
    sf_tag = sf_dir.rstrip("/").rsplit("/", 1)[-1]
    st = os.stat(os.path.join(sf_dir, "orders.parquet"))
    table = scratch_dir(f"txn_orders_{sf_tag}_{st.st_mtime_ns:x}_{st.st_size:x}")
    if current_version(table) == 2:
        return table
    shutil.rmtree(table, ignore_errors=True)
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )

    def slice_df(pred):
        return o.filter(pred).repartitionByRange(4, "o_orderkey")

    txn_write(spark, slice_df(F.col("o_orderkey") % 7 == 0), table,
              mode="append", stats_cols=("o_orderkey",), op_name="load_v0")
    txn_write(spark, slice_df(F.col("o_orderkey") % 7 == 1), table,
              mode="append", stats_cols=("o_orderkey",), op_name="append_v1")
    txn_write(spark, slice_df(F.col("o_orderkey") % 7 <= 2), table,
              mode="overwrite", stats_cols=("o_orderkey",), op_name="compact_v2")
    return table


def _snapshot_agg(df: DataFrame, version: int) -> DataFrame:
    return df.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_orders"),
        money(F.sum(finite(F.col("o_totalprice"))), 2, 6).alias("total_price"),
    ).select(F.lit(version).alias("version"), "o_orderstatus", "n_orders",
             "total_price")


_SNAP_SQL = """
    SELECT {v} AS version, o_orderstatus,
           COUNT(*) AS n_orders,
           {money} AS total_price
    FROM orders WHERE {pred}
    GROUP BY o_orderstatus
"""


def _snap_sql(v: int, pred: str) -> str:
    return _SNAP_SQL.format(v=v, pred=pred, money=money_sql("SUM(" + finite_sql("o_totalprice") + ")", 2, 6))


def build_lineitem_txn_table(spark: SparkSession, sf_dir: str) -> str:
    """Three-commit txn table over the SF-DIR LINEITEM slice (round 6,
    VERDICT r5 item 7: the external row should push thousands of real rows
    through the txnlog read path, not a small aggregate):

      v0  append    l_orderkey % 7 == 0
      v1  append    l_orderkey % 7 == 1
      v2  overwrite l_orderkey % 7 <= 2   (removes v0+v1 files)

    Each commit is range-distributed on l_orderkey into 8 files with
    footer min/max in the log, so a key-range read proves manifest-level
    skipping against real parquet row groups (~25k live rows at sf0.01,
    ~250k at sf0.1). Cached per source fingerprint like the orders
    fixture."""
    sf_tag = sf_dir.rstrip("/").rsplit("/", 1)[-1]
    st = os.stat(os.path.join(sf_dir, "lineitem.parquet"))
    table = scratch_dir(f"txn_lineitem_{sf_tag}_{st.st_mtime_ns:x}_{st.st_size:x}")
    if current_version(table) == 2:
        return table
    shutil.rmtree(table, ignore_errors=True)
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice",
        "l_returnflag",
    )

    def slice_df(pred):
        return li.filter(pred).repartitionByRange(8, "l_orderkey")

    txn_write(spark, slice_df(F.col("l_orderkey") % 7 == 0), table,
              mode="append", stats_cols=("l_orderkey",), op_name="load_v0")
    txn_write(spark, slice_df(F.col("l_orderkey") % 7 == 1), table,
              mode="append", stats_cols=("l_orderkey",), op_name="append_v1")
    txn_write(spark, slice_df(F.col("l_orderkey") % 7 <= 2), table,
              mode="overwrite", stats_cols=("l_orderkey",), op_name="compact_v2")
    return table


def lineitem_pruned_file_counts(spark: SparkSession, sf_dir: str) -> tuple[int, int]:
    """(live files, files surviving the bottom-eighth key-range prune) on
    the lineitem txn table — test hook for scan_txnlog_snapshot's plan."""
    table = build_lineitem_txn_table(spark, sf_dir)
    hi = _lineitem_key_cap(spark, sf_dir)
    all_files = snapshot_files(table)
    kept = [
        f for f in all_files
        if not (f["stats"]["l_orderkey"]["max"] < 0
                or f["stats"]["l_orderkey"]["min"] > hi)
    ]
    return len(all_files), len(kept)


def _lineitem_key_cap(spark: SparkSession, sf_dir: str) -> int:
    """floor(max(l_orderkey)/8) — the sf-relative range bound shared with
    the oracle's ``MAX(l_orderkey) // 8`` subquery (one-value collect)."""
    mx = load(spark, sf_dir, "lineitem").agg(F.max("l_orderkey")).head()[0]
    return 0 if mx is None else mx // 8  # empty table: degenerate cap


@op(
    "scan_txnlog_snapshot",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
           l_returnflag
    FROM lineitem
    WHERE l_orderkey % 7 <= 2
      AND l_orderkey <= (SELECT MAX(l_orderkey) // 8 FROM lineitem)
    ORDER BY l_orderkey, l_linenumber
    """,
    tags=("scan", "acid", "extra"),
)
def scan_txnlog_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-snapshot read of the LINEITEM txn table: replay add/remove
    actions → live file set → one parquet scan, with a bottom-eighth
    l_orderkey range applied as MANIFEST-LEVEL file skipping (footer
    min/max from the log prune ~7 of the 8 range files before Spark lists
    a path — lineitem_pruned_file_counts asserts it). The v2 overwrite
    logically deleted v0/v1's rows even though their files still sit in
    the directory — correctness comes from the LOG, not the listing, which
    is exactly the property that makes concurrent writers safe (a reader
    never sees a half-committed file set). Round 6: rebuilt from the
    sf-dir lineitem slice with row-level output (thousands of rows at
    sf0.01) so the external row exercises real data volume, per VERDICT
    r5 item 7."""
    table = build_lineitem_txn_table(spark, sf_dir)
    hi = _lineitem_key_cap(spark, sf_dir)
    df = txn_read(spark, table, prune=("l_orderkey", 0, hi))
    return (
        df.filter(F.col("l_orderkey") <= hi)
        .select("l_orderkey", "l_linenumber", "l_quantity",
                "l_extendedprice", "l_returnflag")
        .orderBy("l_orderkey", "l_linenumber")
    )


@op(
    "txnlog_time_travel",
    oracle=" UNION ALL ".join(
        _snap_sql(v, p)
        for v, p in [(0, "o_orderkey % 7 = 0"), (1, "o_orderkey % 7 IN (0, 1)"),
                     (2, "o_orderkey % 7 <= 2")]
    ) + " ORDER BY version, o_orderstatus",
    tags=("scan", "acid", "extra"),
)
def txnlog_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time travel: the same table read AS OF versions 0, 1, and 2 in one
    result. Version 1 must equal v0's rows plus v1's append, and version 2
    must reflect the overwrite — proving snapshots are immutable,
    addressable points, not just 'whatever is on disk now'. At 100 TB this
    is the reproducibility contract for training-data lineage: a run pins
    a version and gets byte-identical inputs forever."""
    table = build_orders_txn_table(spark, sf_dir)
    parts = [
        _snapshot_agg(txn_read(spark, table, version=v), v) for v in (0, 1, 2)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("version", "o_orderstatus")


@op(
    "txnlog_file_skipping",
    oracle=f"""
    SELECT o_orderstatus,
           COUNT(*) AS n_orders,
           {money_sql("SUM(" + finite_sql("o_totalprice") + ")", 2, 6)} AS total_price
    FROM orders
    WHERE o_orderkey % 7 <= 2 AND o_orderkey BETWEEN 0 AND 300
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
    tags=("scan", "acid", "extra"),
)
def txnlog_file_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manifest-level file skipping: the range predicate on o_orderkey is
    checked against each live file's footer min/max FROM THE LOG, so
    non-overlapping files are pruned before Spark ever receives a path
    (tests assert the pruned set is strictly smaller). Parquet row-group
    stats then prune within survivors — two pruning tiers, which is the
    difference between listing a million objects and opening a handful at
    100 TB. The predicate is re-applied after the scan (stats pruning is a
    superset guarantee)."""
    table = build_orders_txn_table(spark, sf_dir)
    lo, hi = 0, 300
    df = txn_read(spark, table, prune=("o_orderkey", lo, hi))
    return (
        df.filter(F.col("o_orderkey").between(lo, hi))
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_orders"),
            money(F.sum(finite(F.col("o_totalprice"))), 2, 6).alias("total_price"),
        )
        .orderBy("o_orderstatus")
    )


def pruned_file_counts(spark: SparkSession, sf_dir: str,
                       lo: int = 0, hi: int = 300) -> tuple[int, int]:
    """(live files, files surviving the manifest prune) — test hook."""
    table = build_orders_txn_table(spark, sf_dir)
    all_files = snapshot_files(table)
    kept = [
        f for f in all_files
        if not (f["stats"]["o_orderkey"]["max"] < lo
                or f["stats"]["o_orderkey"]["min"] > hi)
    ]
    return len(all_files), len(kept)


@op(
    "stream_txnlog_exactly_once",
    oracle="""
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST((CASE WHEN abs(CAST(value AS DOUBLE)) < 1e12 THEN CAST(value AS DOUBLE) END) AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("stream", "sink", "acid", "extra"),
)
def stream_txnlog_exactly_once(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once streaming sink: each micro-batch lands as ONE atomic
    txn-log commit tagged with its epoch id, and a replayed epoch is
    detected in the log and skipped — the published foreachBatch
    idempotent-sink pattern (batchId as transactional token), realized on
    the ACID layer instead of a best-effort append. The test double-fires
    an epoch deliberately; counts still match the oracle because the
    duplicate commit is refused by the log, not by luck.

    At 100 TB this is how a streaming ingest keeps a warehouse consistent
    through executor retries and driver restarts: the data write is
    re-runnable, the COMMIT is idempotent."""
    from aced_etl_pod_spark.streaming.replay import (
        materialize_batches,
        read_stream,
        run_foreach_batch,
    )

    src = materialize_batches(
        spark, sf_dir, "txnlog_sink",
        splits=[F.col("event_id") % 4 == i for i in range(4)],
    )
    table = session_scratch_dir("stream/txnlog_sink_table")
    shutil.rmtree(table, ignore_errors=True)

    def commit_batch(batch_df: DataFrame, epoch_id: int) -> None:
        txn_append_idempotent(spark, batch_df, table, f"epoch-{epoch_id}")

    run_foreach_batch(read_stream(spark, src), commit_batch)
    # Simulate an epoch REPLAY (retried micro-batch after a failure):
    # re-commit epoch 0's exact data; the log already has it -> no-op.
    replay_df = load(spark, sf_dir, "events").filter(F.col("event_id") % 4 == 0)
    txn_append_idempotent(spark, replay_df, table, "epoch-0")

    back = txn_read(spark, table)
    return (
        back.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(finite(F.col("value")).cast("decimal(18,6)"))
            .cast("double")
            .alias("total_value"),
        )
        .orderBy("event_type")
    )


def txn_append_idempotent(
    spark: SparkSession, df: DataFrame, table: str, token: str
) -> int | None:
    """Append ``df`` unless a commit tagged ``token`` is already in the
    log. Returns the committed version, or None if skipped. The check is
    safe under Structured Streaming's contract (one writer per epoch at a
    time; a retry happens only after the prior attempt died)."""
    from aced_etl_pod_spark.sources.txnlog import table_history

    if any(h.get("op") == token for h in table_history(table)):
        return None
    return txn_write(spark, df, table, mode="append", op_name=token)


def build_changefeed_table(spark: SparkSession, sf_dir: str) -> str:
    """Two-commit table for the change feed: c0 = orders with key%5 in
    (0,1); c1 OVERWRITES with key%5 in (1,2) — so v0→v1 has inserts
    (%5=2), deletes (%5=0) and carried-over rows (%5=1)."""
    sf_tag = sf_dir.rstrip("/").rsplit("/", 1)[-1]
    st = os.stat(os.path.join(sf_dir, "orders.parquet"))
    table = scratch_dir(f"txn_cdc_{sf_tag}_{st.st_mtime_ns:x}_{st.st_size:x}")
    if current_version(table) == 1:
        return table
    shutil.rmtree(table, ignore_errors=True)
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    txn_write(spark, o.filter((F.col("o_orderkey") % 5).isin(0, 1)), table,
              mode="append", op_name="load_v0")
    txn_write(spark, o.filter((F.col("o_orderkey") % 5).isin(1, 2)), table,
              mode="overwrite", op_name="replace_v1")
    return table


@op(
    "txnlog_change_feed",
    oracle="""
    WITH v0 AS (SELECT o_orderkey, o_orderstatus FROM orders
                WHERE o_orderkey % 5 IN (0, 1)),
         v1 AS (SELECT o_orderkey, o_orderstatus FROM orders
                WHERE o_orderkey % 5 IN (1, 2)),
         ins AS (SELECT 'insert' AS change_type, o_orderkey, o_orderstatus
                 FROM v1 WHERE o_orderkey NOT IN (SELECT o_orderkey FROM v0)),
         del AS (SELECT 'delete' AS change_type, o_orderkey, o_orderstatus
                 FROM v0 WHERE o_orderkey NOT IN (SELECT o_orderkey FROM v1))
    SELECT * FROM ins UNION ALL SELECT * FROM del
    ORDER BY change_type, o_orderkey
    """,
    tags=("scan", "acid", "cdc", "extra"),
)
def txnlog_change_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change feed between two committed snapshots (the table-format
    CDC/'change data feed' read): diff version 0 against version 1 by key
    — anti-joins over the two snapshot reads yield the ROW-LEVEL inserts
    and deletes (round 6: per-row output instead of per-status counts, so
    the external row compares thousands of real change records — ~6k at
    sf0.01 — per VERDICT r5 item 7). Downstream incremental consumers
    (index refresh, aggregate maintenance) process only the delta, never
    the full table — the read-side complement of
    stream_txnlog_exactly_once's write side. Both snapshot reads prune
    their file sets from the log before Spark lists anything."""
    table = build_changefeed_table(spark, sf_dir)
    v0 = txn_read(spark, table, version=0).select("o_orderkey", "o_orderstatus")
    v1 = txn_read(spark, table, version=1).select("o_orderkey", "o_orderstatus")
    ins = (
        v1.join(v0.select("o_orderkey"), "o_orderkey", "left_anti")
        .select(F.lit("insert").alias("change_type"), "o_orderkey",
                "o_orderstatus")
    )
    dels = (
        v0.join(v1.select("o_orderkey"), "o_orderkey", "left_anti")
        .select(F.lit("delete").alias("change_type"), "o_orderkey",
                "o_orderstatus")
    )
    return ins.unionByName(dels).orderBy("change_type", "o_orderkey")


@op(
    "txnlog_compact",
    oracle=_snap_sql(3, "o_orderkey % 7 <= 2") + " ORDER BY o_orderstatus",
    tags=("sink", "acid", "extra"),
)
def txnlog_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compaction: the 4 range-partitioned live files of the orders txn
    table are rewritten into 1 and swapped in a single atomic commit
    (version 3). Logical content must be byte-identical to the v2
    snapshot — the oracle is the SAME aggregation the pre-compaction
    snapshot checks against — while the live file count drops 4 → 1 and
    time travel to v2 still resolves the original files (asserted in
    tests). This is the small-file problem's answer at 100 TB: streaming
    ingest produces many small commits; compaction folds them into
    scan-efficient files without blocking readers for even a moment."""
    from aced_etl_pod_spark.sources.txnlog import txn_compact

    base = build_orders_txn_table(spark, sf_dir)
    # compact a COPY so the shared 3-commit fixture keeps its v2 shape
    table = scratch_dir(base.rstrip("/") + "_compacted_copy")
    if current_version(table) != 3:
        shutil.rmtree(table, ignore_errors=True)
        shutil.copytree(base, table)
        txn_compact(spark, table, target_files=1, stats_cols=("o_orderkey",))
    return _snapshot_agg(txn_read(spark, table), 3).orderBy("o_orderstatus")


@op(
    "txnlog_checkpoint_vacuum",
    oracle=_snap_sql(4, "o_orderkey % 7 <= 2") + " ORDER BY o_orderstatus",
    tags=("sink", "acid", "extra"),
)
def txnlog_checkpoint_vacuum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log maintenance lifecycle: checkpoint (materialized live set in one
    log entry → replay is O(commits since checkpoint), not O(history)) then
    vacuum (physical deletion of de-referenced files outside retention —
    the documented destructive step every published table format pairs
    with time travel). Runs on a copy of the 3-commit fixture: compact →
    checkpoint → vacuum, then reads the snapshot, which must still match
    the same v2-content oracle — maintenance must never change logical
    content. At production commit rates this pair is what keeps a 10⁶-
    commit table readable in milliseconds and its storage bounded."""
    from aced_etl_pod_spark.sources.txnlog import txn_checkpoint, txn_compact, vacuum

    base = build_orders_txn_table(spark, sf_dir)
    table = scratch_dir(base.rstrip("/") + "_ckpt_copy")
    if current_version(table) != 4:
        shutil.rmtree(table, ignore_errors=True)
        shutil.copytree(base, table)
        txn_compact(spark, table, target_files=1, stats_cols=("o_orderkey",))
        txn_checkpoint(table)
        vacuum(table, keep_versions=0)
    return _snapshot_agg(txn_read(spark, table), 4).orderBy("o_orderstatus")


@op(
    "txnlog_schema_evolution",
    oracle="""
    SELECT o_orderkey, o_orderstatus,
           CASE WHEN o_orderkey % 6 = 1 THEN o_totalprice END AS o_totalprice
    FROM orders
    WHERE o_orderkey % 6 IN (0, 1)
    ORDER BY o_orderkey
    """,
    tags=("scan", "acid", "extra"),
)
def txnlog_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution from the LOG: generation 1 commits 2-column rows,
    a metaData action widens the schema, generation 2 commits 3-column
    rows — and the snapshot read resolves the FINAL schema from the log,
    so gen-1 files surface NULL for the later column. No mergeSchema
    footer sweep: at 100 TB the log is one read, a million file footers
    are not. (Same semantics as scan_parquet_schema_merge, but decided by
    the table format rather than by scanning every file.)"""
    import json as _json

    from aced_etl_pod_spark.sources.txnlog import (
        txn_read_with_schema,
        txn_set_schema,
    )

    sf_tag = sf_dir.rstrip("/").rsplit("/", 1)[-1]
    st = os.stat(os.path.join(sf_dir, "orders.parquet"))
    table = scratch_dir(f"txn_schevo_{sf_tag}_{st.st_mtime_ns:x}_{st.st_size:x}")
    o = load(spark, sf_dir, "orders")
    if current_version(table) != 3:
        shutil.rmtree(table, ignore_errors=True)
        gen1 = o.filter(F.col("o_orderkey") % 6 == 0).select(
            "o_orderkey", "o_orderstatus"
        )
        gen2 = o.filter(F.col("o_orderkey") % 6 == 1).select(
            "o_orderkey", "o_orderstatus", "o_totalprice"
        )
        txn_write(spark, gen1, table, op_name="gen1")
        txn_set_schema(table, _json.dumps(gen2.schema.jsonValue()))
        txn_write(spark, gen2, table, op_name="gen2")
    return txn_read_with_schema(spark, table).orderBy("o_orderkey")


# ---------------------------------------------------------------------------
# Z-order clustering (round-6 registration queue — finished + locally
# oracle-verified; registers when the driver window rotates).
# ---------------------------------------------------------------------------

# Predicate constants shared by the op and its oracle: a customer band and
# one calendar year. o_orderdate spans 1995..2001 at every SF, so the date
# band prunes ~6/7 of a date-clustered layout at any scale; the custkey
# band covers a fixed 40-key slice of the (SF-scaled) key space.
ZORDER_CUST_LO, ZORDER_CUST_HI = 40, 79
ZORDER_DAY_LO, ZORDER_DAY_HI = "1999-01-01", "1999-12-31"
ZORDER_BITS = 8  # 8 bits per dimension -> 16-bit z-value
ZORDER_FILES = 16

TXNLOG_ZORDER_ORACLE = f"""
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n,
           {money_sql('sum(' + finite_sql('o_totalprice') + ')')} AS total
    FROM orders
    WHERE o_custkey BETWEEN {ZORDER_CUST_LO} AND {ZORDER_CUST_HI}
      AND CAST(o_orderdate AS DATE)
            BETWEEN DATE '{ZORDER_DAY_LO}' AND DATE '{ZORDER_DAY_HI}'
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
"""


def _interleave_bits(a, b, bits: int):
    """16-bit Morton code from two ``bits``-bit integer columns — pure
    Catalyst (shiftleft/bitwise-OR chain unrolled at plan-build time), so
    the clustering key costs one projection, no UDF."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = (
            z.bitwiseOR(F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i))
            .bitwiseOR(F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1))
        )
    return z


def build_zorder_table(spark: SparkSession, sf_dir: str) -> str:
    """Orders rewritten in Z-order on (o_custkey, order day): both columns
    are min-max scaled to 8 bits (the boundary min/max is a 1-row collect,
    the same broadcast-boundary discipline as feature_quantile_bucketize),
    bit-interleaved into a Morton code, range-partitioned AND sorted on it,
    then committed to the txn log with per-file min/max for BOTH columns.
    Cached per source fingerprint (DPP discipline)."""
    sf_tag = sf_dir.rstrip("/").rsplit("/", 1)[-1]
    st = os.stat(os.path.join(sf_dir, "orders.parquet"))
    table = scratch_dir(f"txn_zorder_{sf_tag}_{st.st_mtime_ns:x}_{st.st_size:x}")
    if current_version(table) >= 0:
        return table
    o = load(spark, sf_dir, "orders").withColumn(
        "o_day", F.datediff(F.col("o_orderdate"), F.lit("1992-01-01"))
    )
    lo_c, hi_c, lo_d, hi_d = o.agg(
        F.min("o_custkey"), F.max("o_custkey"), F.min("o_day"), F.max("o_day")
    ).first()
    if lo_c is None:  # empty table: degenerate bounds (no rows to scale)
        lo_c = hi_c = lo_d = hi_d = 0
    span = (1 << ZORDER_BITS) - 1

    def scale(col, lo, hi):
        return F.least(
            F.lit(span),
            ((col - F.lit(lo)) * span / F.lit(max(hi - lo, 1))).cast("long"),
        )

    z = o.withColumn(
        "zval",
        _interleave_bits(
            scale(F.col("o_custkey"), lo_c, hi_c),
            scale(F.col("o_day"), lo_d, hi_d),
            ZORDER_BITS,
        ),
    )
    clustered = z.repartitionByRange(ZORDER_FILES, "zval").sortWithinPartitions(
        "zval"
    )
    txn_write(
        spark,
        clustered.drop("zval"),
        table,
        stats_cols=("o_custkey", "o_day"),
        op_name="zorder",
    )
    return table


def _zorder_prune(files: list[dict]) -> list[dict]:
    """Manifest-level prune on BOTH clustered dimensions (conjunction of
    per-column min/max overlap tests against the op's band predicates)."""
    import datetime as _dt

    epoch = _dt.date(1992, 1, 1)
    d_lo = (_dt.date.fromisoformat(ZORDER_DAY_LO) - epoch).days
    d_hi = (_dt.date.fromisoformat(ZORDER_DAY_HI) - epoch).days
    kept = []
    for f in files:
        sc = f.get("stats", {}).get("o_custkey")
        sd = f.get("stats", {}).get("o_day")
        if sc is not None and (sc["max"] < ZORDER_CUST_LO or sc["min"] > ZORDER_CUST_HI):
            continue
        if sd is not None and (sd["max"] < d_lo or sd["min"] > d_hi):
            continue
        kept.append(f)
    return kept


def zorder_pruned_counts(spark: SparkSession, sf_dir: str) -> tuple[int, int]:
    """(live files, files surviving the two-dimension prune) — test hook."""
    table = build_zorder_table(spark, sf_dir)
    files = snapshot_files(table)
    return len(files), len(_zorder_prune(files))


@op("txnlog_zorder_cluster", oracle=TXNLOG_ZORDER_ORACLE, tags=("scan", "acid", "extra"))
def txnlog_zorder_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton-curve) clustering for MULTI-column file skipping:
    orders is rewritten sorted by the bit-interleaved (o_custkey, day)
    code, so each data file covers a small rectangle of the 2-D key space
    and its footer min/max is tight on BOTH columns — a band predicate on
    EITHER column (or both, as here) prunes most files from the manifest
    alone. A single-column sort gives tight stats on one dimension only;
    Z-order is how Delta/Iceberg-class warehouses make a petabyte fact
    table skippable on several correlated access paths at once.

    The oracle checks the query RESULT (scan minus skipped files must
    lose no rows — stats pruning is a superset guarantee, and the
    predicate is re-applied after the scan); tests/test_incremental.py
    asserts the prune actually removes files on a 16-file layout at both
    test SFs."""
    table = build_zorder_table(spark, sf_dir)
    files = _zorder_prune(snapshot_files(table))
    if not files:  # empty table / everything pruned: nothing to scan
        return spark.createDataFrame(
            [], "o_orderstatus string, n bigint, total double"
        )
    df = spark.read.parquet(*[os.path.join(table, f["path"]) for f in files])
    return (
        df.filter(
            F.col("o_custkey").between(ZORDER_CUST_LO, ZORDER_CUST_HI)
            & F.col("o_orderdate")
            .cast("date")
            .between(F.lit(ZORDER_DAY_LO), F.lit(ZORDER_DAY_HI))
        )
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n"),
            money(F.sum(finite(F.col("o_totalprice"))), 2, 6).alias("total"),
        )
        .orderBy("o_orderstatus")
    )


# ---------------------------------------------------------------------------
# Equality deletes (merge-on-read) — round-6/7 registration queue.
# ---------------------------------------------------------------------------

_DEL_MOD = 13

TXNLOG_EQUALITY_DELETES_ORACLE = f"""
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n,
           {money_sql('sum(' + finite_sql('o_totalprice') + ')')} AS total
    FROM orders
    WHERE o_orderkey % {_DEL_MOD} != 0
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
"""


def build_mor_orders_table(spark: SparkSession, sf_dir: str) -> str:
    """v0: full orders committed as 4 range-distributed files; v1: a
    row-level DELETE (o_orderkey % 13 == 0) committed as an equality-
    delete file — NO data file rewritten. Cached per source fingerprint."""
    from aced_etl_pod_spark.sources.txnlog import txn_delete_keys

    sf_tag = sf_dir.rstrip("/").rsplit("/", 1)[-1]
    st = os.stat(os.path.join(sf_dir, "orders.parquet"))
    table = scratch_dir(f"txn_mor_{sf_tag}_{st.st_mtime_ns:x}_{st.st_size:x}")
    if current_version(table) == 1:
        return table
    shutil.rmtree(table, ignore_errors=True)
    o = load(spark, sf_dir, "orders")
    txn_write(
        spark,
        o.repartitionByRange(4, "o_orderkey"),
        table,
        stats_cols=("o_orderkey",),
        op_name="base",
    )
    txn_delete_keys(
        spark,
        o.filter(F.col("o_orderkey") % _DEL_MOD == 0),
        table,
        "o_orderkey",
    )
    return table


@op(
    "txnlog_equality_deletes",
    oracle=TXNLOG_EQUALITY_DELETES_ORACLE,
    tags=("sink", "acid", "extra"),
)
def txnlog_equality_deletes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level DELETE via equality-delete files (merge-on-read): the
    DELETE commits O(matched keys) — one small key file + one log action —
    instead of rewriting the data files that contain the rows (copy-on-
    write would rewrite ~all of a 100 TB table for a 0.1% delete). Readers
    subtract the delete keys with a BROADCAST anti-join until
    txn_apply_deletes compacts the state back into plain files, after
    which reads pay nothing. This is the published Iceberg-v2 equality-
    delete / Delta deletion-vector trade, on the engine's own log.

    The op reads the merge-on-read snapshot; tests assert the compaction
    path separately (apply → plain read == MOR read, delete files
    retired, version history intact). Oracle: orders minus the deleted
    slice."""
    from aced_etl_pod_spark.sources.txnlog import txn_read_mor

    table = build_mor_orders_table(spark, sf_dir)
    df = txn_read_mor(spark, table)
    return (
        df.groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n"),
            money(F.sum(finite(F.col("o_totalprice"))), 2, 6).alias("total"),
        )
        .orderBy("o_orderstatus")
    )


# ---------------------------------------------------------------------------
# Per-file bloom index point lookup — round-6/7 registration queue.
# ---------------------------------------------------------------------------

BLOOM_LOOKUP_KEYS = (37, 411, 1203)  # present at every SF (max key >= 1499)
BLOOM_PROBES = 3
BLOOM_FILES = 8
_KNUTH = 2654435761
_H2 = 2246822519  # second multiplicative constant for double hashing

TXNLOG_BLOOM_LOOKUP_ORACLE = f"""
    SELECT o_orderkey, o_orderstatus, o_totalprice
    FROM orders
    WHERE o_orderkey IN {BLOOM_LOOKUP_KEYS}
    ORDER BY o_orderkey
"""


def _bloom_probe_positions(key: int, m: int) -> list[int]:
    """Double-hashing probe positions — plain 64-bit integer arithmetic
    (same portability discipline as sampling.hash_bucket), reproducible in
    any engine or language."""
    k = key % 2**31
    h1 = (k * _KNUTH) % 2**32
    h2 = ((k * _H2) % 2**32) | 1
    return [(h1 + i * h2) % m for i in range(BLOOM_PROBES)]


def build_bloom_indexed_table(spark: SparkSession, sf_dir: str) -> str:
    """Orders committed as 8 HASH-distributed files (every file spans the
    full key range — min/max stats are useless here, which is the point:
    the bloom sidecar prunes where zone maps cannot) plus a per-file bloom
    index sidecar built in ONE Spark pass (explode probe positions →
    collect_set per file). At production scale the index rows are emitted
    by the writer itself; the sidecar shape (file → {{m, bits}}) is the
    same either way."""
    import json as _json

    sf_tag = sf_dir.rstrip("/").rsplit("/", 1)[-1]
    st = os.stat(os.path.join(sf_dir, "orders.parquet"))
    table = scratch_dir(f"txn_bloom_{sf_tag}_{st.st_mtime_ns:x}_{st.st_size:x}")
    idx_path = os.path.join(table, "_index", "bloom_o_orderkey.json")
    if current_version(table) == 0 and os.path.exists(idx_path):
        return table
    shutil.rmtree(table, ignore_errors=True)
    o = load(spark, sf_dir, "orders")
    txn_write(
        spark,
        o.repartition(BLOOM_FILES, "o_orderkey"),
        table,
        op_name="base",
    )
    files = snapshot_files(table)
    rows_per_file = max(f["rows"] for f in files)
    m = 1 << max(8, (rows_per_file * 16).bit_length())
    paths = [os.path.join(table, f["path"]) for f in files]
    df = spark.read.parquet(*paths).withColumn(
        "_file", F.element_at(F.split(F.input_file_name(), "/"), -1)
    )
    k = F.col("o_orderkey") % F.lit(2**31)
    h1 = (k * _KNUTH) % F.lit(2**32)
    h2 = ((k * _H2) % F.lit(2**32)).bitwiseOR(F.lit(1))
    probes = F.array(
        *[(h1 + F.lit(i) * h2) % F.lit(m) for i in range(BLOOM_PROBES)]
    )
    bits = (
        df.select("_file", F.explode(probes).alias("bit"))
        .groupBy("_file")
        .agg(F.collect_set("bit").alias("bits"))
        .collect()
    )
    index = {r._file: {"m": m, "bits": sorted(int(b) for b in r.bits)} for r in bits}
    os.makedirs(os.path.dirname(idx_path), exist_ok=True)
    with open(idx_path + ".tmp", "w") as f:
        _json.dump(index, f)
    os.replace(idx_path + ".tmp", idx_path)
    return table


def bloom_probed_counts(spark: SparkSession, sf_dir: str) -> tuple[int, int]:
    """(live files, files the bloom probe admits for the lookup keys)."""
    import json as _json

    table = build_bloom_indexed_table(spark, sf_dir)
    with open(os.path.join(table, "_index", "bloom_o_orderkey.json")) as f:
        index = _json.load(f)
    files = snapshot_files(table)
    probed = []
    for f_ in files:
        ent = index.get(f_["path"])
        if ent is None:
            probed.append(f_)  # unindexed file: must be read (superset rule)
            continue
        bits = set(ent["bits"])
        if any(
            all(p in bits for p in _bloom_probe_positions(key, ent["m"]))
            for key in BLOOM_LOOKUP_KEYS
        ):
            probed.append(f_)
    return len(files), len(probed)


@op(
    "txnlog_bloom_index_lookup",
    oracle=TXNLOG_BLOOM_LOOKUP_ORACLE,
    tags=("scan", "acid", "extra"),
)
def txnlog_bloom_index_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point lookups through a per-file bloom-filter INDEX sidecar: for a
    key-IN list, only files whose bloom admits at least one key are ever
    opened — on a hash-distributed layout where min/max zone maps prune
    NOTHING (every file spans the key range). This is the secondary-index
    answer for needle queries at 100 TB: the sidecar is O(files) metadata
    consulted on the driver, false positives only cost an extra file read
    (the IN predicate is re-applied after the scan — superset guarantee,
    like every stats prune in the engine), and false negatives are
    impossible by construction. tests assert probed < total while min/max
    would have kept all 8 files."""
    import json as _json

    table = build_bloom_indexed_table(spark, sf_dir)
    with open(os.path.join(table, "_index", "bloom_o_orderkey.json")) as f:
        index = _json.load(f)
    survivors = []
    for f_ in snapshot_files(table):
        ent = index.get(f_["path"])
        if ent is None or any(
            all(p in set(ent["bits"]) for p in _bloom_probe_positions(k, ent["m"]))
            for k in BLOOM_LOOKUP_KEYS
        ):
            survivors.append(f_["path"])
    df = spark.read.parquet(*[os.path.join(table, p) for p in survivors])
    return (
        df.filter(F.col("o_orderkey").isin(*BLOOM_LOOKUP_KEYS))
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .orderBy("o_orderkey")
    )


# ---------------------------------------------------------------------------
# MERGE INTO (atomic upsert, merge-on-read) — registration queue.
# ---------------------------------------------------------------------------

# Chronological upsert generations: events are all Jan 2024 at every SF,
# so fixed week boundaries split the stream into 4 deterministic batches.
_UPSERT_WEEKS = ("2024-01-09", "2024-01-16", "2024-01-23")

TXNLOG_MERGE_UPSERT_ORACLE = """
    SELECT user_id, event_type, value,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s
    FROM (
      SELECT user_id, event_type, value, ts,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rk
      FROM events
      -- a NULL merge key can never be superseded (delete-key anti-joins
      -- don't match NULL), and a NULL ts falls into no ingest batch —
      -- both are excluded from the keyed state on both sides
      WHERE user_id IS NOT NULL AND ts IS NOT NULL) t
    WHERE rk = 1
    ORDER BY user_id
"""


def _latest_per_user(df: DataFrame) -> DataFrame:
    from pyspark.sql.window import Window as _W

    w = _W.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .select("user_id", "event_type", "value", "ts", "event_id")
    )


def build_upsert_state_table(spark: SparkSession, sf_dir: str) -> str:
    """Four MERGE generations from the event stream: gen0 commits week-1's
    per-user latest state; gens 1-3 each upsert the following week's
    per-user latest rows — one ATOMIC commit per generation (delete-keys +
    replacement rows share a version; the sequence rule keeps a commit
    from deleting its own rows). Users silent after an early week keep
    their old rows across later generations — exactly the case that
    breaks a sequence-unaware delete."""
    from aced_etl_pod_spark.sources.txnlog import txn_upsert

    sf_tag = sf_dir.rstrip("/").rsplit("/", 1)[-1]
    st = os.stat(os.path.join(sf_dir, "events.parquet"))
    table = scratch_dir(f"txn_upsert_{sf_tag}_{st.st_mtime_ns:x}_{st.st_size:x}")
    if current_version(table) == 3:
        return table
    shutil.rmtree(table, ignore_errors=True)
    e = load(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    )
    cuts = [F.lit(c).cast("timestamp") for c in _UPSERT_WEEKS]
    batches = [
        e.filter(F.col("ts") < cuts[0]),
        e.filter((F.col("ts") >= cuts[0]) & (F.col("ts") < cuts[1])),
        e.filter((F.col("ts") >= cuts[1]) & (F.col("ts") < cuts[2])),
        e.filter(F.col("ts") >= cuts[2]),
    ]
    txn_write(spark, _latest_per_user(batches[0]), table, op_name="gen0")
    for b in batches[1:]:
        txn_upsert(spark, _latest_per_user(b), table, "user_id")
    return table


@op("txnlog_merge_upsert", oracle=TXNLOG_MERGE_UPSERT_ORACLE, tags=("sink", "acid", "extra"))
def txnlog_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO (upsert) on the txn log, merge-on-read: each generation
    publishes delete-keys + replacement rows in ONE atomic commit —
    matched rows are superseded, new keys insert, readers see whole
    merges or nothing. The read resolves sequence-aware segments (deletes
    apply only to files committed earlier), so the current state after 4
    generations must equal "latest event per user" recomputed from the
    raw stream — which is exactly what the oracle does.

    Scale story: each MERGE costs O(batch) — no base rewrite for a CDC
    trickle into a 100 TB keyed table; segments stay few because
    txn_apply_deletes (compaction) collapses them; and the read-side
    anti-joins are broadcast by contract. This is the merge-on-read MERGE
    of the published table formats, end to end on the engine's own log."""
    from aced_etl_pod_spark.sources.txnlog import txn_read_mor

    table = build_upsert_state_table(spark, sf_dir)
    df = txn_read_mor(spark, table)
    return df.select(
        "user_id",
        "event_type",
        "value",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
    ).orderBy("user_id")


STREAM_TXNLOG_MERGE_UPSERT_ORACLE = TXNLOG_MERGE_UPSERT_ORACLE


@op(
    "stream_txnlog_merge_upsert",
    oracle=STREAM_TXNLOG_MERGE_UPSERT_ORACLE,
    tags=("stream", "acid", "extra"),
)
def stream_txnlog_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming MERGE INTO: the event stream folds into a keyed state
    table one micro-batch at a time — each epoch's per-user latest rows
    txn_upsert atomically (delete-keys + rows, one commit), tagged with
    the epoch id so a REPLAYED epoch is recognized in the log and skipped
    (the same idempotent-token contract as stream_txnlog_exactly_once,
    now for upserts). The test double-fires epoch 0 deliberately; the
    final state still equals "latest event per user" recomputed from the
    raw stream, because the duplicate merge is refused by the log.

    This is the streaming CDC serving path at 100 TB: at-least-once
    delivery + idempotent atomic merges = exactly-once state, with each
    merge costing O(batch) and compaction (txn_apply_deletes) bounding
    the merge-on-read segments the readers pay for."""
    from aced_etl_pod_spark.sources.txnlog import table_history, txn_upsert
    from aced_etl_pod_spark.streaming.replay import (
        materialize_batches,
        read_stream,
        run_foreach_batch,
    )

    cuts = [F.lit(c).cast("timestamp") for c in _UPSERT_WEEKS]
    # NULL keys can't be merged (delete-key anti-joins never match);
    # NULL ts already falls into no split — same contract as the batch op
    keyed = F.col("user_id").isNotNull()
    src = materialize_batches(
        spark, sf_dir, "txnlog_upsert",
        splits=[
            keyed & (F.col("ts") < cuts[0]),
            keyed & (F.col("ts") >= cuts[0]) & (F.col("ts") < cuts[1]),
            keyed & (F.col("ts") >= cuts[1]) & (F.col("ts") < cuts[2]),
            keyed & (F.col("ts") >= cuts[2]),
        ],
    )
    table = session_scratch_dir("stream/txnlog_upsert_table")
    shutil.rmtree(table, ignore_errors=True)

    def merge_batch(batch_df: DataFrame, epoch_id: int) -> None:
        token = f"merge-epoch-{epoch_id}"
        if any(h.get("op") == token for h in table_history(table)):
            return
        if epoch_id == 0:
            txn_write(spark, _latest_per_user(batch_df), table, op_name=token)
        else:
            txn_upsert(
                spark, _latest_per_user(batch_df), table, "user_id",
                op_name=token,
            )

    run_foreach_batch(read_stream(spark, src), merge_batch)
    # deliberate epoch replay: the token is already in the log -> no-op
    e = load(spark, sf_dir, "events")
    merge_batch(e.filter(F.col("ts") < cuts[0]), 0)

    from aced_etl_pod_spark.sources.txnlog import txn_read_mor

    df = txn_read_mor(spark, table)
    return df.select(
        "user_id",
        "event_type",
        "value",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
    ).orderBy("user_id")


# ---------------------------------------------------------------------------
# txnlog_overwrite_partition (round-7 registration queue)
# ---------------------------------------------------------------------------

TXNLOG_OVERWRITE_PARTITION_ORACLE = (
    # membership-explicit: the table only ever LOADED the F/O/P
    # partitions (a NULL status matches no equality filter), so the
    # restated state is F+P plus the reloaded O slice — the old
    # status <> 'O' form let NULL-status rows leak in via OR
    _snap_sql(
        3,
        "o_orderstatus IN ('F', 'P')"
        " OR (o_orderstatus = 'O' AND o_totalprice > 100.0)",
    )
    + " ORDER BY o_orderstatus"
)


@op("txnlog_overwrite_partition", oracle=TXNLOG_OVERWRITE_PARTITION_ORACLE, tags=('scan', 'acid', 'extra'))
def txnlog_overwrite_partition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INSERT OVERWRITE PARTITION on the transaction log — the third leg
    of the write path (append / merge_upsert / partition overwrite): a
    status-partitioned orders table (one commit per status, files exactly
    aligned so footer stats prove partition membership) has its 'O'
    partition atomically reloaded with a filtered restatement
    (o_totalprice > 100). One commit removes exactly the 'O'-aligned
    files and adds the replacements; 'F'/'P' files keep their original
    add actions, time travel to v2 still shows the pre-restatement 'O'
    rows, and a straddling file makes the commit REFUSE rather than
    silently drop co-resident rows (all asserted in tests). This is the
    nightly-restatement primitive: reload one day/region/source without
    rewriting — or even blocking readers of — the other 99.9% of a
    100 TB table."""
    from aced_etl_pod_spark.sources.txnlog import txn_overwrite_partition

    sf_tag = sf_dir.rstrip("/").rsplit("/", 1)[-1]
    st = os.stat(os.path.join(sf_dir, "orders.parquet"))
    table = scratch_dir(
        f"txn_orders_part_{sf_tag}_{st.st_mtime_ns:x}_{st.st_size:x}"
    )
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    if current_version(table) != 3:
        shutil.rmtree(table, ignore_errors=True)
        for status in ("F", "O", "P"):
            txn_write(
                spark,
                o.filter(F.col("o_orderstatus") == status).repartition(2),
                table,
                mode="append",
                stats_cols=("o_orderstatus", "o_orderkey"),
                op_name=f"load_{status}",
            )
        txn_overwrite_partition(
            spark,
            o.filter(
                (F.col("o_orderstatus") == "O") & (F.col("o_totalprice") > 100.0)
            ).repartition(2),
            table,
            part_col="o_orderstatus",
            part_value="O",
            stats_cols=("o_orderkey",),
        )
    return _snapshot_agg(txn_read(spark, table), 3).orderBy("o_orderstatus")


# ---------------------------------------------------------------------------
# txnlog_branch_merge (round-7 registration queue)
# ---------------------------------------------------------------------------

TXNLOG_BRANCH_MERGE_ORACLE = (
    _snap_sql(3, "o_orderkey % 7 <= 3") + " ORDER BY o_orderstatus"
)


@op("txnlog_branch_merge", oracle=TXNLOG_BRANCH_MERGE_ORACLE, tags=('scan', 'acid', 'extra'))
def txnlog_branch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Branch-based isolated writes (the Nessie/Iceberg-refs workflow on
    the txn log): an ETL job branches the 3-commit orders table at v2
    with ZERO data copies (the seed commit references the base's
    immutable files in place), appends its batch (o_orderkey % 7 == 3)
    ON THE BRANCH — base readers see nothing — then fast-forward merges:
    the branch delta squashes into ONE atomic base commit (v3). A base
    that advanced past the branch point refuses the merge
    (CommitConflict, rebase is the caller's decision) and a tag pins the
    pre-merge version immutably — both asserted in tests. This is how a
    pipeline stages risky multi-table work at 100 TB: validate on the
    branch, publish with one swap, never block or half-expose readers."""
    from aced_etl_pod_spark.sources.txnlog import (
        create_branch,
        merge_branch,
        set_tag,
    )

    base_fix = build_orders_txn_table(spark, sf_dir)
    base = scratch_dir(base_fix.rstrip("/") + "_branch_base")
    branch = base.rstrip("/") + "_etl_branch"
    if current_version(base) != 3:
        shutil.rmtree(base, ignore_errors=True)
        shutil.rmtree(branch, ignore_errors=True)
        shutil.copytree(base_fix, base)
        set_tag(base, "pre-merge", 2)
        create_branch(base, branch)
        o = load(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
        )
        txn_write(
            spark,
            o.filter(F.col("o_orderkey") % 7 == 3).repartition(2),
            branch,
            mode="append",
            stats_cols=("o_orderkey",),
            op_name="branch_append",
        )
        merge_branch(base, branch)
    return _snapshot_agg(txn_read(spark, base), 3).orderBy("o_orderstatus")


# ---------------------------------------------------------------------------
# plan_result_cache (round-7 registration queue)
# ---------------------------------------------------------------------------

PLAN_RESULT_CACHE_ORACLE = (
    _snap_sql(3, "o_orderkey % 7 <= 3") + " ORDER BY o_orderstatus"
)

# Test hook: incremented on every real (non-cached) computation so the
# cache-hit contract is directly observable.
RESULT_CACHE_COMPUTES = {"n": 0}


def _cached_snapshot_agg(spark: SparkSession, table: str) -> DataFrame:
    """Serve the snapshot aggregate from a result cache keyed on
    (query id, table version): a hit reads the materialized parquet and
    touches ZERO source files; any commit to the table changes the key,
    so staleness is impossible by construction rather than by TTL. This
    is the warehouse result cache (Snowflake-style) on the txn log —
    valid precisely because snapshots are immutable."""
    import hashlib

    v = current_version(table)
    key = hashlib.sha256(
        f"snapshot_agg|{os.path.abspath(table)}|v{v}".encode()
    ).hexdigest()[:24]
    slot = scratch_dir(f"result_cache/{key}")
    marker = os.path.join(slot, "_SUCCESS")
    if not os.path.exists(marker):
        RESULT_CACHE_COMPUTES["n"] += 1
        res = _snapshot_agg(txn_read(spark, table), v)
        res.coalesce(1).write.mode("overwrite").parquet(slot)
    return spark.read.parquet(slot).withColumn(
        "version", F.lit(current_version(table))
    )


@op("plan_result_cache", oracle=PLAN_RESULT_CACHE_ORACLE, tags=('scan', 'acid', 'extra'))
def plan_result_cache(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query-result caching with version-keyed invalidation: the same
    aggregate is served twice from the v2 snapshot (second call = cache
    hit, zero source scans — the compute counter in tests proves it),
    then an append commit advances the table and the SAME call recomputes
    against v3 because the cache key embeds the snapshot version —
    invalidation is structural, not TTL guesswork. The op returns the
    post-append result (full oracle). At 100 TB this is the difference
    between a dashboard refresh that re-reads a petabyte and one that
    reads a kilobyte — and the txn log is what makes it SAFE, since a
    cached result is forever correct for the version it names."""
    base_fix = build_orders_txn_table(spark, sf_dir)
    table = scratch_dir(base_fix.rstrip("/") + "_cache_demo")
    if current_version(table) != 3:
        shutil.rmtree(table, ignore_errors=True)
        shutil.copytree(base_fix, table)
        _cached_snapshot_agg(spark, table)  # compute + materialize (v2)
        _cached_snapshot_agg(spark, table)  # pure cache hit
        o = load(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
        )
        txn_write(
            spark,
            o.filter(F.col("o_orderkey") % 7 == 3).repartition(2),
            table,
            mode="append",
            stats_cols=("o_orderkey",),
            op_name="invalidate",
        )
    return _cached_snapshot_agg(spark, table).orderBy("o_orderstatus")


# ---------------------------------------------------------------------------
# txnlog_cdc_replay_reconstruct (round-7 registration queue)
# ---------------------------------------------------------------------------

TXNLOG_CDC_REPLAY_ORACLE = (
    _snap_sql(2, "o_orderkey % 7 <= 2") + " ORDER BY o_orderstatus"
)


@op("txnlog_cdc_replay_reconstruct", oracle=TXNLOG_CDC_REPLAY_ORACLE, tags=('scan', 'acid', 'extra'))
def txnlog_cdc_replay_reconstruct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-feed completeness, proven by reconstruction: starting from
    an EMPTY state, the per-version change feeds (inserts = v ∖ v-1,
    deletes = v-1 ∖ v, by key) of the 3-commit orders table are applied
    in order — delete-then-insert per version — and the replayed state's
    aggregate must equal the head snapshot's (the oracle). This is the
    guarantee every downstream incremental consumer (index refresh, MV
    maintenance, cache invalidation) silently relies on: the feed
    carries EVERYTHING, including the rows an overwrite commit removed
    (v2 here drops the v0/v1 files — its feed must emit those deletes).
    Replay cost is O(sum of deltas), never O(versions x table); each
    round is two anti-joins + a union, with the per-round cache keeping
    lineage linear (the BFS discipline)."""
    table = build_orders_txn_table(spark, sf_dir)
    head = current_version(table)
    cols = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"]
    state = None
    prev = None
    for v in range(0, head + 1):
        cur = txn_read(spark, table, version=v).select(*cols)
        if prev is None:
            ins = cur
            dels = None
        else:
            ins = cur.join(prev.select("o_orderkey"), "o_orderkey", "left_anti")
            dels = prev.join(cur.select("o_orderkey"), "o_orderkey", "left_anti")
        if state is None:
            state = ins
        else:
            if dels is not None:
                state = state.join(
                    dels.select("o_orderkey"), "o_orderkey", "left_anti"
                )
            state = state.unionByName(ins)
        state = state.cache()
        prev = cur
    return _snapshot_agg(state, head).orderBy("o_orderstatus")


# ---------------------------------------------------------------------------
# txnlog_check_constraints (round-7 registration queue)
# ---------------------------------------------------------------------------

TXNLOG_CHECK_CONSTRAINTS_ORACLE = (
    _snap_sql(3, "o_orderkey % 7 <= 1 AND o_totalprice > 0")
    + " ORDER BY o_orderstatus"
)


@op("txnlog_check_constraints", oracle=TXNLOG_CHECK_CONSTRAINTS_ORACLE, tags=('scan', 'acid', 'extra'))
def txnlog_check_constraints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write-time CHECK constraints on the transaction log (the Delta
    CONSTRAINT feature): the table declares `positive_price`
    (o_totalprice > 0) and `known_status` (status in F/O/P) in a
    metadata action; a clean batch commits, a poisoned batch (one
    negative price spliced in) is REFUSED before any file is staged —
    the table's version does not advance and its content is untouched
    (asserted in tests). Validation is one conditional-agg scan over the
    BATCH regardless of constraint count; the full table is never
    re-validated, which is the only enforcement shape that works at
    100 TB ingest rates."""
    from aced_etl_pod_spark.sources.txnlog import (
        txn_set_constraints,
        txn_write_checked,
    )

    st = os.stat(os.path.join(sf_dir, "orders.parquet"))
    sf_tag = sf_dir.rstrip("/").rsplit("/", 1)[-1]
    table = scratch_dir(
        f"txn_checked_{sf_tag}_{st.st_mtime_ns:x}_{st.st_size:x}"
    )
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    ).filter(F.col("o_totalprice") > 0)
    if current_version(table) != 3:
        shutil.rmtree(table, ignore_errors=True)
        txn_write(
            spark,
            o.filter(F.col("o_orderkey") % 7 == 0).repartition(2),
            table,
            mode="append",
            stats_cols=("o_orderkey",),
            op_name="seed",
        )
        txn_set_constraints(
            table,
            {
                "positive_price": "o_totalprice > 0",
                "known_status": "o_orderstatus IN ('F', 'O', 'P')",
            },
        )
        txn_write_checked(
            spark,
            o.filter(F.col("o_orderkey") % 7 == 1).repartition(2),
            table,
            stats_cols=("o_orderkey",),
            op_name="clean_batch",
        )
    return _snapshot_agg(txn_read(spark, table), 3).orderBy("o_orderstatus")
