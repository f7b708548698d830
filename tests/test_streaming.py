"""Streaming-infrastructure tests beyond oracle parity: checkpointed
restart must resume exactly-once (no reprocessing, no loss) — the property
that makes the file-replay harness a stand-in for a real Kafka/object-store
deployment."""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import functions as F

from aced_etl_pod_spark.streaming.replay import EVENTS_STREAM_SCHEMA, materialize_batches
from tests.conftest import SF_SMALL


def _run_to_parquet(spark, src, out_dir, chk_dir):
    stream = (
        spark.readStream.schema(EVENTS_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    shaped = stream.filter(F.col("event_type") == "click").select("event_id", "user_id")
    q = (
        shaped.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", chk_dir)
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def test_checkpoint_restart_is_exactly_once(spark, tmp_path):
    """Stop the query mid-stream, add a later batch, restart on the SAME
    checkpoint: the restarted query must process only the new file — final
    sink contents equal one clean end-to-end run (no dups, no loss)."""
    src = materialize_batches(
        spark,
        SF_SMALL,
        "resume",
        splits=[F.col("event_id") % 3 == i for i in range(3)],
    )
    held_back = sorted(glob.glob(os.path.join(src, "batch_*.parquet")))[-1]
    parked = str(tmp_path / os.path.basename(held_back))  # outside the source dir
    shutil.move(held_back, parked)

    out_dir = str(tmp_path / "sink")
    chk_dir = str(tmp_path / "chk")
    _run_to_parquet(spark, src, out_dir, chk_dir)
    first_cnt = spark.read.parquet(out_dir).count()

    shutil.move(parked, held_back)  # the "late arrival" after a restart
    _run_to_parquet(spark, src, out_dir, chk_dir)

    got = spark.read.parquet(out_dir)
    expected = (
        spark.read.schema(EVENTS_STREAM_SCHEMA)
        .parquet(src)
        .filter(F.col("event_type") == "click")
    )
    assert first_cnt < got.count() == expected.count()
    assert got.select("event_id").distinct().count() == got.count()


def test_restart_without_new_data_is_noop(spark, tmp_path):
    src = materialize_batches(spark, SF_SMALL, "resume_noop")
    out_dir = str(tmp_path / "sink")
    chk_dir = str(tmp_path / "chk")
    _run_to_parquet(spark, src, out_dir, chk_dir)
    n1 = spark.read.parquet(out_dir).count()
    _run_to_parquet(spark, src, out_dir, chk_dir)  # restart, nothing new
    assert spark.read.parquet(out_dir).count() == n1


def test_watermark_dedup_eviction(spark):
    """dropDuplicatesWithinWatermark's bounded-state contract, exercised
    deterministically: key A recurs AFTER the watermark evicts its state
    entry (so it emits twice), key B's duplicate arrives within delta (so
    it emits once). This is the eviction half the oracle can't see — the
    stream_dedup_within_watermark replay keeps delta above the event span
    precisely so its external check stays exact."""
    from datetime import datetime

    from aced_etl_pod_spark.streaming.replay import (
        EVENTS_STREAM_SCHEMA,
        read_stream,
        run_to_memory,
    )
    from aced_etl_pod_spark.tables import session_scratch_dir

    t0 = datetime(2024, 3, 1, 12, 0)

    def ev(eid, ts, user, etype):
        return (eid, ts, user, etype, 1.0, "{}")

    batches = [
        # batch 0: A once, B twice within delta (10 min) -> A, B emit once
        [ev(1, t0, 1, "A"), ev(2, t0, 2, "B"),
         ev(3, datetime(2024, 3, 1, 12, 5), 2, "B")],
        # batch 1: unrelated key 2h later -> advances the watermark past
        # t0+delta (Spark applies a batch's NEW watermark only from the
        # next batch, so this alone doesn't evict yet)
        [ev(4, datetime(2024, 3, 1, 14, 0), 3, "C")],
        # batch 2: spacer — runs end-of-batch state cleanup under the
        # advanced watermark, evicting A's and B's entries
        [ev(5, datetime(2024, 3, 1, 14, 30), 4, "D")],
        # batch 3: A again at a later, non-late event time -> re-emits
        [ev(6, datetime(2024, 3, 1, 15, 0), 1, "A")],
    ]
    out = session_scratch_dir("stream/test_wm_evict")
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)
    for i, rows in enumerate(batches):
        df = spark.createDataFrame(rows, EVENTS_STREAM_SCHEMA).coalesce(1)
        tmp = os.path.join(out, f"_tmp_{i}")
        df.write.mode("overwrite").parquet(tmp)
        part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        dst = os.path.join(out, f"batch_{i:03d}.parquet")
        shutil.move(part, dst)
        shutil.rmtree(tmp)
        os.utime(dst, (1_700_000_000 + i * 100,) * 2)

    deduped = (
        read_stream(spark, out)
        .withWatermark("ts", "10 minutes")
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
        .select("user_id", "event_type")
    )
    emitted = [
        (r.user_id, r.event_type)
        for r in run_to_memory(deduped, "t_wm_evict", "append").collect()
    ]
    assert emitted.count((1, "A")) == 2, emitted  # evicted, then re-emitted
    assert emitted.count((2, "B")) == 1, emitted  # dup within delta dropped
    assert emitted.count((3, "C")) == 1, emitted
    spark.catalog.dropTempView("t_wm_evict")


def test_state_store_reader_time_travel(spark):
    """The half of the State Data Source the oracle can't see: batch-pinned
    time travel. After stream_state_store_reader drains its 3-batch replay,
    option("batchId", 0) must reconstruct the state as of micro-batch 0 —
    i.e. the aggregate over split 0 ONLY, not the final totals."""
    from aced_etl_pod_spark.operators.streaming_ops import stream_state_store_reader
    from aced_etl_pod_spark.tables import load, session_scratch_dir

    sf = "/root/testdata/sf0.001"
    final = {
        (r.event_type): (r.n_events, r.id_residue)
        for r in stream_state_store_reader(spark, sf).collect()
    }
    chk = session_scratch_dir("stream/state_reader_chk")
    at0 = {
        r.event_type: (r.n, r.s)
        for r in (
            spark.read.format("statestore").option("batchId", 0).load(chk)
            .select(
                F.col("key.event_type").alias("event_type"),
                F.col("value.count").alias("n"),
                F.col("value.sum").alias("s"),
            )
        ).collect()
    }
    want0 = {
        r.event_type: (r.n, r.s)
        for r in (
            load(spark, sf, "events")
            .filter(F.col("event_id") % 3 == 0)
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum((F.col("event_id") % 1000).cast("long")).alias("s"),
            )
        ).collect()
    }
    assert at0 == want0
    # and batch-0 state is a strict prefix of the final state
    assert all(at0[k][0] <= final[k][0] for k in at0)
    assert set(at0) <= set(final)
