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

from aced_etl_pod_spark.tables import load, session_scratch_dir

TS = [
    datetime.datetime(2024, 1, 1, 0, 0, 7, 179575),
    datetime.datetime(2024, 3, 5, 12, 30, 0, 1),
]


def _fixture_dir(unit: str) -> str:
    root = session_scratch_dir(f"tables_load_{unit}")
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


def test_validated_embeddings_atomic_publish_and_eviction(spark):
    """Round-9 advice fix: load_validated_embeddings publishes via temp-dir
    + atomic rename (a reader that saw the marker can never observe a
    half-overwritten data dir), recovers from a marker-less partial dir
    left by a crashed/pre-atomic writer, and evicts superseded
    fingerprints of the same sf_tag."""
    import os
    import shutil

    from aced_etl_pod_spark.tables import load_validated_embeddings, scratch_dir

    sf_dir = "/root/testdata/sf0.001"
    base = scratch_dir()
    st = os.stat(os.path.join(sf_dir, "embeddings.parquet"))
    name = f"validated_emb_sf0.001_{st.st_mtime_ns:x}_{st.st_size:x}"
    out = os.path.join(base, name)

    # a stale fingerprint for the same sf_tag must be evicted on publish
    # — but only once past the eviction grace period (round-11 advice:
    # immediate eviction raced concurrent readers), so backdate it
    stale = os.path.join(base, "validated_emb_sf0.001_deadbeef_1")
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(stale, exist_ok=True)
    os.utime(stale, (1_700_000_000, 1_700_000_000))

    n = load_validated_embeddings(spark, sf_dir).count()
    assert n > 0
    assert os.path.exists(os.path.join(out, "_VALIDATED"))
    assert not os.path.exists(stale), "stale fingerprint not evicted"
    # no leftover temp dirs from the publish
    leftovers = [d for d in os.listdir(base) if d.startswith(f".{name}.tmp.")]
    assert not leftovers, f"temp dirs leaked: {leftovers}"

    # marker-less partial dir (legacy/crashed writer) must be rebuilt, not
    # trusted and not permanently wedged
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(os.path.join(out, "emb"), exist_ok=True)  # partial: no marker
    n2 = load_validated_embeddings(spark, sf_dir).count()
    assert n2 == n
    assert os.path.exists(os.path.join(out, "_VALIDATED"))


def test_ivf_index_empty_and_normal_build_one_schema(spark):
    """Round-9 advice fix (re-pinned on the round-10 bucketed layout):
    the empty-corpus IVF index must read back with the SAME cells schema
    as the partitionBy('bkt') path (vec_id, embedding, cid long, bkt int
    last), and probes on it return the empty k-NN frame."""
    import shutil

    from aced_etl_pod_spark.functions.similarity import (
        ivf_index_build,
        ivf_index_probe,
        ivf_index_probe_many,
    )
    from aced_etl_pod_spark.tables import session_scratch_dir

    emb = load(spark, "/root/testdata/sf0.001", "embeddings")
    root = session_scratch_dir("ivf_schema_parity")
    shutil.rmtree(root, ignore_errors=True)
    ivf_index_build(emb, f"{root}/normal")
    ivf_index_build(emb.limit(0), f"{root}/empty")
    s_normal = spark.read.parquet(f"{root}/normal/cells").schema
    s_empty = spark.read.parquet(f"{root}/empty/cells").schema
    assert s_normal == s_empty, f"{s_normal} != {s_empty}"

    q = emb.limit(1)
    assert ivf_index_probe(spark, f"{root}/empty", q, k=3).count() == 0
    assert ivf_index_probe_many(spark, f"{root}/empty", q, k=3).count() == 0
    shutil.rmtree(root, ignore_errors=True)


def test_session_scratch_is_process_private_and_footer_counts_match():
    """Round-11 hardening: (a) session_scratch_dir is keyed by pid +
    startup nonce so two concurrent runners never share ephemeral state
    — a child process must resolve a DIFFERENT path for the same sub;
    (b) table_row_count reads parquet footers only (no SparkSession at
    all) and equals the actual row count; (c) evict_stale_fixtures
    age-gates: a fresh superseded dir survives, an old one is pruned."""
    import os
    import shutil
    import subprocess
    import sys
    import time

    from aced_etl_pod_spark.tables import (
        evict_stale_fixtures,
        scratch_dir,
        session_scratch_dir,
        table_row_count,
    )

    mine = session_scratch_dir("probe")
    child = subprocess.run(
        [
            sys.executable,
            "-c",
            "from aced_etl_pod_spark.tables import session_scratch_dir;"
            "print(session_scratch_dir('probe'))",
        ],
        capture_output=True,
        text=True,
        check=True,
        cwd="/root/repo",
    ).stdout.strip()
    assert child != mine, "child process resolved the SAME session scratch"
    assert session_scratch_dir("probe") == mine, "not stable within process"

    import duckdb

    sf = "/root/testdata/sf0.001"
    n = table_row_count(sf, "orders")
    (expect,) = duckdb.connect().execute(
        f"SELECT count(*) FROM '{sf}/orders.parquet'"
    ).fetchone()
    assert n == expect, (n, expect)

    base = scratch_dir()
    fresh = os.path.join(base, "agegate_x_fresh")
    old = os.path.join(base, "agegate_x_old")
    keep = "agegate_x_keep"
    for d in (fresh, old, os.path.join(base, keep)):
        shutil.rmtree(d, ignore_errors=True)
        os.makedirs(d)
    os.utime(old, (time.time() - 7200,) * 2)
    evict_stale_fixtures(base, ("agegate_x_",), keep=keep)
    assert os.path.exists(fresh), "grace period violated: fresh dir evicted"
    assert os.path.exists(os.path.join(base, keep)), "keep dir evicted"
    assert not os.path.exists(old), "aged-out superseded dir not evicted"
    for d in (fresh, os.path.join(base, keep)):
        shutil.rmtree(d, ignore_errors=True)
