"""Multimodal plumbing tests: the decode / frame-sample / resize stubs must
have real Spark-side contracts (schemas, 1→N explosion, binary-out) and be
byte-deterministic so a real codec swap is a one-function change."""

from __future__ import annotations

import hashlib

from aced_etl_pod_spark.sources.binary import (
    decode_stub,
    frame_sample_stub,
    generate_blob_fixture,
    read_binary,
    resize_stub,
)


def _blobs(spark, n=8, sub="mm_test"):
    return read_binary(spark, generate_blob_fixture(n=n, sub=sub)).select(
        "path", "length", "content"
    )


def test_decode_stub_deterministic(spark):
    rows = decode_stub(_blobs(spark)).orderBy("path").collect()
    assert len(rows) == 8
    assert all(r["n_bytes"] == 128 for r in rows)
    payload = hashlib.sha256(b"blob-0").digest() * 4
    assert rows[0]["feature0"] == payload[0] / 255.0


def test_frame_sample_explodes_one_to_n(spark):
    frames = frame_sample_stub(_blobs(spark, sub="mm_frames"), frame_bytes=32, every_n=2)
    rows = frames.orderBy("path", "frame_idx").collect()
    # 128 bytes / 32 = 4 frames, every 2nd kept -> 2 frames per blob
    assert len(rows) == 8 * 2
    assert [r["frame_idx"] for r in rows[:2]] == [0, 2]
    payload = hashlib.sha256(b"blob-0").digest() * 4
    assert rows[0]["frame_digest"] == hashlib.sha256(payload[:32]).hexdigest()


def test_resize_stub_fixed_width_binary_out(spark):
    thumbs = resize_stub(_blobs(spark, sub="mm_resize"), thumb_bytes=16)
    rows = thumbs.orderBy("path").collect()
    assert all(r["thumb_len"] == 16 for r in rows)
    payload = hashlib.sha256(b"blob-0").digest() * 4
    assert bytes(rows[0]["thumb"]) == bytes(payload[::8][:16])
