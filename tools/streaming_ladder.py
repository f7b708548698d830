"""Streaming throughput ladder (round-12 verdict item 8: all 12
stream ops are correctness-green via deterministic replay, but no
at-scale number existed).

    python tools/streaming_ladder.py [--scales 10 40] [--reps 2]

Measures END-TO-END micro-batch replay throughput (materialize source
batches → run the streaming query to completion → read back / verify)
for the ingest-topology representatives, against the bench ladder's
tiled events dirs:

* stream_json_shred_ingest — the landing-zone shred (stateless ingest:
  envelope parse once at pinned schema, foreachBatch parquet appends)
* stream_foreach_sink      — partitioned incremental sink appends
* stream_stateful_count    — the stateful representative
  (applyInPandasWithState); its state-store size is the distinct-key
  count, reported alongside (state rows == keys by construction — one
  state row per user), since the in-op StreamingQuery handle isn't
  exposed for progress scraping.

Throughput = tiled events rows / end-to-end wall (the number includes
source materialization and sink read-back — the honest ingest cost, not
just the hot loop). Each op's result is checked against its registered
DuckDB oracle on the same tiled dir, so the ladder rows stay exact, not
just fast.
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

OPS = (
    "stream_json_shred_ingest",
    "stream_foreach_sink",
    "stream_stateful_count",
)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", type=int, nargs="+", default=[10, 40])
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    import duckdb

    from aced_etl_pod_spark.registry import registry
    from aced_etl_pod_spark.session import get_spark, pin
    from aced_etl_pod_spark.tables import table_row_count
    from tools.bench_ladder import build_scaled

    spark = get_spark("streaming-ladder", shuffle_partitions=32)
    pin(spark, {
        "spark.sql.files.maxPartitionBytes": "4m",
        "spark.sql.leafNodeDefaultParallelism": "32",
    })
    reg = registry()

    results = {}
    for scale in args.scales:
        sf = build_scaled(scale)
        n_events = table_row_count(sf, "events")
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'"
        )
        for op_id in OPS:
            o = reg[op_id]
            walls, rows, match = [], 0, None
            for rep in range(args.reps):
                t0 = time.perf_counter()
                got = sorted(
                    tuple(r) for r in o.fn(spark, sf).collect()
                )
                walls.append(time.perf_counter() - t0)
                if rep == 0:
                    rows = len(got)
                    want = sorted(
                        tuple(r) for r in con.execute(o.oracle).fetchall()
                    )
                    match = got == want
            wall = statistics.median(walls)
            row = {
                "events": n_events,
                "wall_sec": round(wall, 2),
                "rows_per_sec": round(n_events / wall),
                "out_rows": rows,
                "oracle_match": match,
            }
            if op_id == "stream_stateful_count":
                row["state_rows"] = rows  # one state row per user key
            results[f"{op_id}_x{scale}"] = row
            print(f"x{scale} {op_id}: {row}", flush=True)
    print(json.dumps({"metric": "streaming_ladder", "results": results}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
