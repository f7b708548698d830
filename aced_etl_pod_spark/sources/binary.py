"""Multimodal binary-column sources (north star: image/audio/video as
opaque binary + typed metadata).

Anchor: the reference moves blobs through an object store with metadata
dicts (``_download_and_unzip`` etl-job/fhir_import_export.py:148-180,
``cp(..., metadata={...})`` :344-352). Here blobs are ``binaryFile`` rows:
(path, modificationTime, length, content) + metadata parsed from the path.

The decode step (image/audio libs are not in this container) is STUBBED
behind ``decode_stub`` — a deterministic fake feature extractor with the
real Spark-side plumbing: Arrow-batched ``mapInPandas``, explicit output
schema, per-partition batching. Swapping in PIL/ffmpeg is a one-function
change.
"""

from __future__ import annotations

import hashlib
import os
import shutil
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from aced_etl_pod_spark.tables import session_scratch_dir

DECODE_SCHEMA = "path string, length long, n_bytes long, byte_mean double, feature0 double"


def generate_blob_fixture(n: int = 64, sub: str = "multimodal") -> str:
    """Deterministic fake image blobs: blob i = sha256(i) digest × 4
    (128 bytes), named ``img_{i:04d}.bin``."""
    out = session_scratch_dir(sub)
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)
    for i in range(n):
        payload = hashlib.sha256(f"blob-{i}".encode()).digest() * 4
        with open(os.path.join(out, f"img_{i:04d}.bin"), "wb") as f:
            f.write(payload)
    return out


def read_binary(spark: SparkSession, path: str, glob: str = "*.bin") -> DataFrame:
    """Opaque binary scan: one row per blob with path/mtime/length/content."""
    return (
        spark.read.format("binaryFile").option("pathGlobFilter", glob).load(path)
    )


def decode_stub(df: DataFrame) -> DataFrame:
    """Fake decode / feature-extract over binary content via mapInPandas.

    Real-world shape: each Arrow batch carries N blobs; the UDF decodes and
    emits fixed-width features. Here the 'features' are deterministic byte
    statistics so tests can assert exact values. Raises nothing — a real
    decoder would replace the body (and could raise NotImplementedError for
    unsupported codecs)."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            content = pdf["content"]
            yield pd.DataFrame(
                {
                    "path": pdf["path"],
                    "length": pdf["length"],
                    "n_bytes": content.map(len),
                    "byte_mean": content.map(lambda b: sum(b) / len(b)),
                    "feature0": content.map(lambda b: b[0] / 255.0),
                }
            )

    return df.mapInPandas(decode, DECODE_SCHEMA)


FRAME_SCHEMA = "path string, frame_idx long, frame_mean double, frame_digest string"
RESIZE_SCHEMA = "path string, thumb binary, thumb_len long"


def frame_sample_stub(df: DataFrame, frame_bytes: int = 32, every_n: int = 2) -> DataFrame:
    """Fake video frame sampling via mapInPandas — the 1→N row-explosion
    shape (each blob yields multiple frame rows, so output Arrow batches are
    larger than input batches; a real ffmpeg sampler has exactly this
    contract). 'Frames' are fixed-width byte windows; every ``every_n``-th
    is kept. Deterministic: per-frame mean + sha256 digest."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            paths, idxs, means, digests = [], [], [], []
            for path, content in zip(pdf["path"], pdf["content"]):
                frames = [
                    content[o : o + frame_bytes]
                    for o in range(0, len(content), frame_bytes)
                ]
                for i, fr in enumerate(frames):
                    if i % every_n:
                        continue
                    paths.append(path)
                    idxs.append(i)
                    means.append(sum(fr) / len(fr))
                    digests.append(hashlib.sha256(fr).hexdigest())
            yield pd.DataFrame(
                {"path": paths, "frame_idx": idxs, "frame_mean": means,
                 "frame_digest": digests}
            )

    return df.mapInPandas(sample, FRAME_SCHEMA)


def resize_stub(df: DataFrame, thumb_bytes: int = 16) -> DataFrame:
    """Fake image resize via mapInPandas with a BINARY output column — the
    binary-in/binary-out contract of a real thumbnailer. The 'thumbnail' is
    a deterministic byte stride over the content (every len/thumb_bytes-th
    byte), so size is fixed and values are assertable."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            thumbs = pdf["content"].map(
                lambda b: bytes(b[:: max(1, len(b) // thumb_bytes)][:thumb_bytes])
            )
            yield pd.DataFrame(
                {"path": pdf["path"], "thumb": thumbs, "thumb_len": thumbs.map(len)}
            )

    return df.mapInPandas(resize, RESIZE_SCHEMA)


FEATURE_SCHEMA = "path string, features array<double>"


def feature_extract_stub(df: DataFrame, n_bins: int = 16) -> DataFrame:
    """Feature extraction over binary content via Arrow mapInPandas with an
    ARRAY output column — the embedding-producer contract (a real CNN/CLIP
    encoder swaps in one function, same batch shape). The 'features' are
    an L1-normalized 16-bin histogram of the high nibble of every byte:
    deterministic, numpy-vectorized per batch, and well-defined for any
    blob size."""
    import numpy as np

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf["content"].map(
                lambda b: (
                    np.bincount(
                        np.frombuffer(b, dtype=np.uint8) >> 4, minlength=n_bins
                    )
                    / max(len(b), 1)
                ).tolist()
            )
            yield pd.DataFrame({"path": pdf["path"], "features": feats})

    return df.mapInPandas(extract, FEATURE_SCHEMA)


# ---------------------------------------------------------------------------
# REAL codec path (functions/imagecodec.py): PPM P6 decode -> resample ->
# re-encode. Everything below does genuine pixel work, not byte striding.
# ---------------------------------------------------------------------------

PPM_DECODE_RESIZE_SCHEMA = (
    "path string, width int, height int, mean_r double, mean_g double,"
    " mean_b double, thumb binary, thumb_len long, decode_error string"
)


def generate_ppm_fixture(n: int = 24, sub: str = "multimodal_ppm") -> str:
    """Deterministic REAL images: blob i is a (16+i) x (12+i) PPM whose
    pixels are an integer gradient + per-image phase (pure arithmetic, no
    RNG), so every byte is reproducible across runs and platforms. One
    deliberately corrupt file (truncated raster) exercises the quarantine
    path."""
    import numpy as np

    from aced_etl_pod_spark.functions.imagecodec import encode_ppm

    out = session_scratch_dir(sub)
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)
    for i in range(n):
        h, w = 12 + i, 16 + i
        yy, xx = np.mgrid[0:h, 0:w]
        img = np.stack(
            [
                (xx * 7 + i * 13) % 256,
                (yy * 11 + i * 29) % 256,
                (xx * 3 + yy * 5 + i) % 256,
            ],
            axis=2,
        ).astype(np.uint8)
        data = encode_ppm(img)
        if i == n - 1:  # corrupt the last one: keep header, halve the raster
            data = data[: len(data) // 2]
        with open(os.path.join(out, f"img_{i:04d}.ppm"), "wb") as f:
            f.write(data)
    return out


def decode_resize_ppm(df: DataFrame, out_h: int = 8, out_w: int = 8) -> DataFrame:
    """REAL decode + resize over Arrow batches: parse each blob as PPM P6
    (header tokenizer + raster reshape), bilinear-resample to (out_h,
    out_w), re-encode as PPM. Malformed blobs are quarantined into the
    ``decode_error`` column (NULL metrics) instead of failing the stage —
    the per-record error contract a 100 TB blob scan needs, since one bad
    file must not kill a 10^9-file job."""
    from aced_etl_pod_spark.functions.imagecodec import (
        channel_means,
        decode_ppm,
        encode_ppm,
        resize_bilinear,
    )

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                try:
                    img = decode_ppm(bytes(content))
                except ValueError as exc:
                    rows.append((path, None, None, None, None, None, None, None, str(exc)))
                    continue
                thumb = encode_ppm(resize_bilinear(img, out_h, out_w))
                mr, mg, mb = channel_means(img)
                rows.append(
                    (path, img.shape[1], img.shape[0], mr, mg, mb,
                     thumb, len(thumb), None)
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "path", "width", "height", "mean_r", "mean_g", "mean_b",
                    "thumb", "thumb_len", "decode_error",
                ],
            )

    return df.mapInPandas(work, PPM_DECODE_RESIZE_SCHEMA)


PPM_FRAME_SCHEMA = (
    "path string, frame_idx long, width int, height int, frame_mean double,"
    " frame_digest string, decode_error string"
)


def generate_ppm_video_fixture(n: int = 16, frames: int = 6,
                               sub: str = "multimodal_ppm_video") -> str:
    """REAL multi-frame fixtures: blob i is a concatenated-P6 stream of
    ``frames`` 8×6 images whose pixels are deterministic functions of
    (blob, frame, x, y). The last blob's final frame is torn mid-raster to
    exercise frame-level quarantine."""
    import numpy as np

    from aced_etl_pod_spark.functions.imagecodec import encode_ppm

    out = session_scratch_dir(sub)
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)
    for i in range(n):
        chunks = []
        for t in range(frames):
            yy, xx = np.mgrid[0:6, 0:8]
            img = np.stack(
                [
                    (xx * 5 + t * 31 + i * 7) % 256,
                    (yy * 9 + t * 13 + i * 3) % 256,
                    (xx + yy + t + i) % 256,
                ],
                axis=2,
            ).astype(np.uint8)
            chunks.append(encode_ppm(img))
        data = b"".join(chunks)
        if i == n - 1:
            data = data[:-70]  # tear the final frame's raster
        with open(os.path.join(out, f"vid_{i:04d}.ppm"), "wb") as f:
            f.write(data)
    return out


def sample_ppm_frames(df: DataFrame, every_n: int = 2) -> DataFrame:
    """REAL frame sampling: parse each blob as a concatenated-P6 stream
    (functions/imagecodec.py::decode_ppm_stream — genuine per-frame header
    parsing + raster reshape), keep every ``every_n``-th decoded frame,
    emit per-frame geometry, pixel mean, and a digest of the CANONICAL
    re-encode (so the digest is codec-defined, not byte-offset-defined).
    A torn stream yields its decodable prefix frames plus a decode_error
    row — frame-level quarantine, the contract a real ffmpeg sampler
    needs at 10⁹-video scale. 1→N Arrow row explosion via mapInPandas."""
    from aced_etl_pod_spark.functions.imagecodec import (
        channel_means,
        decode_ppm_stream,
        encode_ppm,
    )

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                frames, err = decode_ppm_stream(bytes(content))
                for idx in range(0, len(frames), every_n):
                    img = frames[idx]
                    mr, mg, mb = channel_means(img)
                    # digest in the HEX domain (sha256 of the lowercase-hex
                    # re-encode, not of the raw bytes): DuckDB's sha256()
                    # only takes VARCHAR, so this keeps the digest
                    # oracle-replayable (same move as the WAV echo_digest).
                    rows.append(
                        (path, idx, img.shape[1], img.shape[0],
                         (mr + mg + mb) / 3.0,
                         hashlib.sha256(
                             encode_ppm(img).hex().encode()
                         ).hexdigest(), None)
                    )
                if err is not None:
                    rows.append((path, -1, None, None, None, None, err))
            yield pd.DataFrame(
                rows,
                columns=["path", "frame_idx", "width", "height",
                         "frame_mean", "frame_digest", "decode_error"],
            )

    return df.mapInPandas(sample, PPM_FRAME_SCHEMA)


def generate_wav_fixture(n: int = 24, sub: str = "multimodal_wav") -> str:
    """Deterministic REAL audio: clip i is a (200 + 40*i)-sample 8 kHz
    triangle wave of integer period (80 + 4*i) and amplitude (1000 +
    500*i) — pure integer arithmetic, so every byte is reproducible
    across runs and platforms (no float trig, no RNG). The last clip is
    deliberately truncated mid-'data' chunk to exercise the per-record
    quarantine, mirroring the corrupt-PPM path."""
    import numpy as np

    from aced_etl_pod_spark.functions.audiocodec import encode_wav

    out = session_scratch_dir(sub)
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)
    sr = 8000
    for i in range(n):
        n_samp = 200 + 40 * i
        period = 80 + 4 * i
        amp = 1000 + 500 * i
        t = np.arange(n_samp, dtype=np.int64)
        half = period // 2
        tri = np.abs((t % period) - half)  # 0..half
        samples = ((tri * 2 * amp) // half - amp).astype(np.int16)
        data = encode_wav(samples, sr)
        if i == n - 1:
            data = data[: len(data) // 2]
        with open(os.path.join(out, f"clip_{i:04d}.wav"), "wb") as f:
            f.write(data)
    return out


def decode_wav_features(df: DataFrame) -> DataFrame:
    """Arrow-batched WAV decode + clip features over (path, content) rows;
    per-record quarantine on decode failure (decode_error populated,
    metrics NULL) — one torn clip must not kill a million-blob scan."""
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("path", StringType()),
            StructField("sample_rate", LongType()),
            StructField("n_samples", LongType()),
            StructField("duration_ms", DoubleType()),
            StructField("rms", DoubleType()),
            StructField("peak", LongType()),
            StructField("zero_crossings", LongType()),
            StructField("echo_digest", StringType()),
            StructField("decode_error", StringType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from aced_etl_pod_spark.functions.audiocodec import (
            clip_features,
            decode_wav,
            encode_wav,
        )

        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                try:
                    sr, samples = decode_wav(bytes(content))
                    feats = clip_features(samples, sr)
                    # hex-domain digest (sha256 of the lowercase hex of the
                    # canonical re-encode): same round-trip guarantee, and
                    # recomputable by the DuckDB oracle, whose sha256()
                    # accepts only VARCHAR (cf. multimodal_binary_meta).
                    digest = hashlib.sha256(
                        encode_wav(samples, sr).hex().encode()
                    ).hexdigest()
                    rows.append(
                        {
                            "path": path,
                            "sample_rate": sr,
                            **feats,
                            "echo_digest": digest,
                            "decode_error": None,
                        }
                    )
                except ValueError as exc:
                    rows.append(
                        {
                            "path": path,
                            "sample_rate": None,
                            "n_samples": None,
                            "duration_ms": None,
                            "rms": None,
                            "peak": None,
                            "zero_crossings": None,
                            "echo_digest": None,
                            "decode_error": str(exc),
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return df.mapInPandas(run, schema)


def generate_phash_fixture(sub: str = "multimodal_phash") -> str:
    """Near-duplicate image corpus for perceptual-hash dedup: 6 BASE
    images (distinct gradient phases), each with 2 near-duplicate
    variants (uniform +1 brightness; bilinear re-render at a slightly
    different size) plus one corrupt blob. Deterministic arithmetic
    content, real PPM bytes."""
    import numpy as np

    from aced_etl_pod_spark.functions.imagecodec import (
        encode_ppm,
        resize_bilinear,
    )

    out = session_scratch_dir(sub)
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)
    from aced_etl_pod_spark.functions.imagecodec import _DCT_M

    bid = 0
    for g in range(6):
        # Rich LOW-FREQUENCY content, synthesized directly in the DCT
        # domain: every coefficient of the hash's 8x8 block carries a
        # strong deterministic sign, so the median threshold is driven by
        # content, not numerical noise (sparse-spectrum synthetics like
        # plain ramps defeat any perceptual hash by construction — real
        # photographs have dense low-frequency spectra, and this fixture
        # models that property).
        coeffs = np.zeros((32, 32))
        for u in range(8):
            for v in range(8):
                if u == 0 and v == 0:
                    continue
                hsh = ((u * 8 + v + 64 * g + 1) * 2654435761) % 4294967296
                coeffs[u, v] = 40.0 if (hsh >> 13) % 2 else -40.0
        from aced_etl_pod_spark.functions.imagecodec import _ordered_matmul

        img32 = _ordered_matmul(_ordered_matmul(_DCT_M.T, coeffs), _DCT_M)
        img32 = img32 - img32.min()
        img32 = (img32 / img32.max() * 255.0)
        luma = np.repeat(img32[:, :, None], 3, axis=2).astype(np.uint8)
        base = resize_bilinear(luma, 48, 64)
        variants = [
            base,
            np.clip(base.astype(np.int16) + 1, 0, 255).astype(np.uint8),
            resize_bilinear(base, 44, 60),
        ]
        for v in variants:
            with open(os.path.join(out, f"img_{bid:04d}_g{g}.ppm"), "wb") as f:
                f.write(encode_ppm(v))
            bid += 1
    with open(os.path.join(out, f"img_{bid:04d}_gX.ppm"), "wb") as f:
        f.write(b"P6\n64 48\n255\nshort")
    return out
