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
