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


# --------------------------------------------------------------------------
# REAL codec path: PPM P6 decode / bilinear resize (functions/imagecodec.py)
# --------------------------------------------------------------------------


def test_ppm_codec_roundtrip_and_header_tolerance():
    import numpy as np

    from aced_etl_pod_spark.functions.imagecodec import decode_ppm, encode_ppm

    rng = np.random.default_rng(42)
    img = rng.integers(0, 256, (11, 19, 3), dtype=np.uint8)
    assert np.array_equal(decode_ppm(encode_ppm(img)), img)
    # comments + arbitrary whitespace in the header are legal Netpbm
    loose = b"P6 # thumb\n#x\n 19\t11\n255\n" + img.tobytes()
    assert np.array_equal(decode_ppm(loose), img)


def test_ppm_codec_rejects_malformed():
    import pytest

    from aced_etl_pod_spark.functions.imagecodec import decode_ppm

    with pytest.raises(ValueError):
        decode_ppm(b"P5\n1 1\n255\n\x00")  # wrong magic (P5 = PGM)
    with pytest.raises(ValueError):
        decode_ppm(b"P6\n2 2\n255\n\x00\x00")  # short raster
    with pytest.raises(ValueError):
        decode_ppm(b"P6\n1 1\n70000\n\x00\x00\x00")  # 16-bit maxval


def test_bilinear_resize_math():
    import numpy as np

    from aced_etl_pod_spark.functions.imagecodec import (
        resize_bilinear,
        resize_nearest,
    )

    img = np.random.default_rng(1).integers(0, 256, (9, 7, 3), dtype=np.uint8)
    assert np.array_equal(resize_bilinear(img, 9, 7), img)  # identity
    assert np.array_equal(resize_nearest(img, 9, 7), img)
    q = np.array(
        [[[0, 0, 0], [100, 100, 100]], [[100, 100, 100], [200, 200, 200]]],
        np.uint8,
    )
    assert (resize_bilinear(q, 1, 1) == 100).all()  # 1x1 = 4-pixel mean
    c = np.full((5, 8, 3), 77, np.uint8)
    assert (resize_bilinear(c, 3, 3) == 77).all()  # constant preserved


def test_multimodal_resize_real_decode(spark):
    """The operator decodes REAL PPM bytes: widths/heights match the
    fixture's generated geometry, channel means match a local NumPy decode,
    thumbnails are byte-identical across two runs, and the one corrupt blob
    lands in decode_error instead of failing the scan."""
    import numpy as np

    from aced_etl_pod_spark.functions.imagecodec import (
        channel_means,
        decode_ppm,
        encode_ppm,
        resize_bilinear,
    )
    from aced_etl_pod_spark.operators.similarity import multimodal_resize

    rows = {r["blob_id"]: r for r in multimodal_resize(spark, "unused").collect()}
    assert len(rows) == 24
    ok = [r for r in rows.values() if r["decode_error"] is None]
    bad = [r for r in rows.values() if r["decode_error"] is not None]
    assert len(bad) == 1 and bad[0]["blob_id"] == 23  # the truncated blob
    assert "short PPM raster" in bad[0]["decode_error"]
    assert bad[0]["width"] is None and bad[0]["thumb_len"] is None
    # geometry: blob i is (16+i) x (12+i)
    for i in (0, 7, 22):
        assert rows[i]["width"] == 16 + i and rows[i]["height"] == 12 + i
    # exact pixel math vs a local recompute of blob 3
    i, h, w = 3, 15, 19
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack(
        [(xx * 7 + i * 13) % 256, (yy * 11 + i * 29) % 256,
         (xx * 3 + yy * 5 + i) % 256],
        axis=2,
    ).astype(np.uint8)
    mr, _, _ = channel_means(img)
    assert abs(rows[3]["mean_r"] - round(mr, 4)) < 1e-9
    import hashlib as _h

    want = _h.sha256(
        encode_ppm(resize_bilinear(img, 8, 8)).hex().encode()
    ).hexdigest()
    assert rows[3]["thumb_digest"] == want
    # determinism: second run byte-identical
    again = {r["blob_id"]: r["thumb_digest"]
             for r in multimodal_resize(spark, "unused").collect()}
    assert {k: r["thumb_digest"] for k, r in rows.items()} == again


def test_ppm_stream_decoder():
    import numpy as np

    from aced_etl_pod_spark.functions.imagecodec import (
        decode_ppm_stream,
        encode_ppm,
    )

    f1 = np.full((2, 3, 3), 10, np.uint8)
    f2 = np.full((4, 2, 3), 200, np.uint8)
    frames, err = decode_ppm_stream(encode_ppm(f1) + encode_ppm(f2))
    assert err is None and len(frames) == 2
    assert np.array_equal(frames[0], f1) and np.array_equal(frames[1], f2)
    frames, err = decode_ppm_stream((encode_ppm(f1) + encode_ppm(f2))[:-5])
    assert len(frames) == 1 and "torn frame" in err
    frames, err = decode_ppm_stream(b"nonsense")
    assert frames == [] and "bad magic" in err


def test_multimodal_frame_sample_real_decode(spark):
    """16 blobs × 6 frames, every 2nd kept → 3 frame rows per clean blob;
    the torn blob (15) still yields its decodable prefix frames plus one
    quarantine row; frame pixel math matches a local NumPy recompute."""
    import hashlib as _h

    import numpy as np

    from aced_etl_pod_spark.functions.imagecodec import encode_ppm
    from aced_etl_pod_spark.operators.similarity import multimodal_frame_sample

    rows = multimodal_frame_sample(spark, "unused").collect()
    by_blob = {}
    for r in rows:
        by_blob.setdefault(r["blob_id"], []).append(r)
    assert set(by_blob) == set(range(16))
    for i in range(15):
        assert sorted(r["frame_idx"] for r in by_blob[i]) == [0, 2, 4]
        assert all(r["decode_error"] is None for r in by_blob[i])
        assert all(r["width"] == 8 and r["height"] == 6 for r in by_blob[i])
    # torn blob: frame 5 of 6 is torn -> frames 0..4 decodable -> kept 0,2,4
    bad = by_blob[15]
    errs = [r for r in bad if r["decode_error"] is not None]
    assert len(errs) == 1 and "torn frame" in errs[0]["decode_error"]
    assert sorted(r["frame_idx"] for r in bad if r["decode_error"] is None) == [0, 2, 4]
    # exact pixel math for blob 2, frame 2
    i, t = 2, 2
    yy, xx = np.mgrid[0:6, 0:8]
    img = np.stack(
        [(xx * 5 + t * 31 + i * 7) % 256, (yy * 9 + t * 13 + i * 3) % 256,
         (xx + yy + t + i) % 256],
        axis=2,
    ).astype(np.uint8)
    row = next(r for r in by_blob[2] if r["frame_idx"] == 2)
    assert row["frame_digest"] == _h.sha256(
        encode_ppm(img).hex().encode()
    ).hexdigest()
    assert abs(row["frame_mean"] - round(float(img.mean()), 4)) < 1e-9
