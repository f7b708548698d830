"""Regression guard for tables.load's events.ts normalization: the testdata
generator has shipped ts as parquet TIMESTAMP(NANOS) and TIMESTAMP(MICROS,
ntz) across rounds (the r03 external run broke on the switch); the loader
must land every encoding on a session-UTC timestamp with identical values."""

from __future__ import annotations

import datetime
import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq

from aced_etl_pod_spark.tables import load, scratch_dir

TS = [
    datetime.datetime(2024, 1, 1, 0, 0, 7, 179575),
    datetime.datetime(2024, 3, 5, 12, 30, 0, 1),
]


def _fixture_dir(unit: str) -> str:
    root = scratch_dir(f"tables_load_{unit}")
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root, exist_ok=True)
    table = pa.table(
        {
            "event_id": pa.array([1, 2], pa.int64()),
            "ts": pa.array(TS, pa.timestamp(unit)),
            "user_id": pa.array([10, 20], pa.int64()),
            "event_type": pa.array(["a", "b"]),
            "value": pa.array([1.0, 2.0]),
            "props": pa.array(["{}", "{}"]),
        }
    )
    pq.write_table(table, os.path.join(root, "events.parquet"))
    return root


def test_load_normalizes_every_ts_encoding(spark):
    for unit in ("ns", "us"):
        df = load(spark, _fixture_dir(unit), "events")
        assert dict(df.dtypes)["ts"] == "timestamp", unit
        got = sorted(r.ts for r in df.select("ts").collect())
        assert got == TS, (unit, got)
