"""Spark 4 Python DataSource API (SPARK-44076): a from-scratch custom
batch source implemented in pure Python — the extension point that lets
an engine user plug arbitrary systems (REST feeds, proprietary stores,
synthetic generators) into ``spark.read.format(...)`` with REAL partition
planning (each InputPartition becomes one Spark task).

This module ships a deterministic synthetic "sensor" source: every row
derives from the knuth hash of its id, so the content is a pure function
of the partition plan — readable in parallel, re-run-stable, and exactly
reproducible by the DuckDB oracle (operators/udfs.py:scan_python_datasource).
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

SENSOR_ROWS = 10_000
SENSOR_SHARDS = 4
_KNUTH = 2654435761
_MOD = 4294967296


class SensorSynthDataSource(DataSource):
    """``spark.read.format("sensor_synth")`` — registered per-session via
    ``spark.dataSource.register(SensorSynthDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "sensor_synth"

    def schema(self) -> str:
        return "reading_id bigint, shard int, temp_c double, status string"

    def reader(self, schema):  # noqa: ANN001 - API signature
        return SensorSynthReader()


class SensorSynthReader(DataSourceReader):
    def partitions(self):
        return [InputPartition(i) for i in range(SENSOR_SHARDS)]

    def read(self, partition):
        shard = partition.value
        per = SENSOR_ROWS // SENSOR_SHARDS
        for rid in range(shard * per, (shard + 1) * per):
            h = (rid * _KNUTH) % _MOD
            temp = round(-10 + (h % 6000) / 100.0, 2)
            status = "fault" if h % 97 == 0 else "ok"
            yield (rid, shard, temp, status)


# ---------------------------------------------------------------------------
# Streaming half of the API: SimpleDataSourceStreamReader (SPARK-45511)
# ---------------------------------------------------------------------------

TICKER_ROWS = 5_000
TICKER_BATCH = 500


def _ticker_row(rid: int):
    h = (rid * _KNUTH) % _MOD
    return (rid, int(rid % 8), round((h % 10000) / 100.0, 2))


class TickerSynthDataSource(DataSource):
    """``spark.readStream.format("ticker_synth")`` — a deterministic
    bounded tick feed: offsets advance by TICKER_BATCH rows per
    micro-batch until TICKER_ROWS, then the stream idles (empty batches,
    offset unchanged), so ``processAllAvailable`` drains it exactly."""

    @classmethod
    def name(cls) -> str:
        return "ticker_synth"

    def schema(self) -> str:
        return "rid bigint, grp int, amt double"

    def simpleStreamReader(self, schema):  # noqa: ANN001 - API signature
        return TickerSynthStreamReader()


class TickerSynthStreamReader(SimpleDataSourceStreamReader):
    def initialOffset(self) -> dict:
        return {"rid": 0}

    def read(self, start: dict):
        s = int(start["rid"])
        e = min(s + TICKER_BATCH, TICKER_ROWS)
        return iter([_ticker_row(r) for r in range(s, e)]), {"rid": e}

    def readBetweenOffsets(self, start: dict, end: dict):
        # Deterministic regeneration makes micro-batch replay exact.
        return iter(
            [_ticker_row(r) for r in range(int(start["rid"]), int(end["rid"]))]
        )

    def commit(self, end: dict) -> None:
        pass
