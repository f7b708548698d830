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


def test_feature_embed_topk_deterministic_and_normalized(spark):
    """Features are an L1-normalized histogram (sum 1, 16 bins); the top-5
    neighbor list is identical across runs and matches a pure-Python
    recompute of the cosine ranking."""
    import hashlib

    from aced_etl_pod_spark.operators.similarity import (
        multimodal_feature_embed_topk,
    )
    from aced_etl_pod_spark.sources.binary import (
        feature_extract_stub,
        generate_blob_fixture,
        read_binary,
    )
    from pyspark.sql import functions as F

    got1 = [tuple(r) for r in multimodal_feature_embed_topk(spark, "").collect()]
    got2 = [tuple(r) for r in multimodal_feature_embed_topk(spark, "").collect()]
    assert got1 == got2 and len(got1) == 5

    src = generate_blob_fixture(n=32, sub="multimodal_embed_test")
    feats = feature_extract_stub(
        read_binary(spark, src).select("path", "content")
    ).collect()
    for r in feats:
        assert len(r.features) == 16
        assert abs(sum(r.features) - 1.0) < 1e-9

    # pure-Python reference ranking
    def hist(i):
        b = hashlib.sha256(f"blob-{i}".encode()).digest() * 4
        h = [0] * 16
        for byte in b:
            h[byte >> 4] += 1
        return [x / len(b) for x in h]

    import math

    q = hist(0)
    qn = math.sqrt(sum(x * x for x in q))

    def cos(i):
        f = hist(i)
        dot = sum(a * b for a, b in zip(f, q))
        return round(dot / (math.sqrt(sum(x * x for x in f)) * qn), 6)

    expect = sorted(
        ((cos(i), i) for i in range(1, 32)), key=lambda t: (-t[0], t[1])
    )[:5]
    assert [(r[0], r[1]) for r in got1] == [(i, c) for c, i in expect]
