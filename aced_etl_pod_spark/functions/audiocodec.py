"""Pure-NumPy WAV (RIFF PCM) codec — the audio sibling of
functions/imagecodec.py's PPM codec. WAV/RIFF is the published container
(little-endian chunks: 'RIFF' size 'WAVE', then tagged sub-chunks; PCM
audio lives in 'fmt ' + 'data'); 16-bit mono PCM is the profile
implemented, which is what NumPy can decode exactly with zero external
libraries. The chunk walker is spec-correct: it tolerates and skips
unknown chunks (LIST/INFO/fact...) and honors the word-alignment padding
byte on odd-sized chunks, rather than assuming 'data' sits at offset 36.

No external audio library exists in this container (and none is needed
for the PCM profile); anything beyond PCM-16 (compressed codecs, float
PCM, multi-channel) raises ValueError and is quarantined per-record by
the operator layer, same as the PPM corrupt-blob path.
"""

from __future__ import annotations

import struct

import numpy as np

_FMT_PCM = 1


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """Encode int16 mono samples as a canonical minimal RIFF/WAVE file."""
    if samples.dtype != np.int16:
        raise ValueError(f"expected int16 samples, got {samples.dtype}")
    data = samples.tobytes()
    byte_rate = sample_rate * 2
    fmt = struct.pack("<HHIIHH", _FMT_PCM, 1, sample_rate, byte_rate, 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(blob: bytes) -> tuple[int, np.ndarray]:
    """Decode a RIFF/WAVE PCM-16 mono blob -> (sample_rate, int16 array).

    Walks the chunk list; raises ValueError on bad magic, truncation, a
    missing chunk, or an unsupported profile."""
    if len(blob) < 12 or blob[0:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    riff_size = struct.unpack("<I", blob[4:8])[0]
    if riff_size + 8 > len(blob):
        raise ValueError("RIFF size exceeds blob (truncated file)")
    pos, sr, n_channels, bits, data = 12, None, None, None, None
    while pos + 8 <= len(blob):
        tag = blob[pos : pos + 4]
        size = struct.unpack("<I", blob[pos + 4 : pos + 8])[0]
        payload = blob[pos + 8 : pos + 8 + size]
        if len(payload) < size:
            raise ValueError(f"chunk {tag!r} truncated")
        if tag == b"fmt ":
            if size < 16:
                raise ValueError("fmt chunk too small")
            fmt_code, n_channels, sr, _br, _ba, bits = struct.unpack(
                "<HHIIHH", payload[:16]
            )
            if fmt_code != _FMT_PCM:
                raise ValueError(f"unsupported format code {fmt_code}")
        elif tag == b"data":
            data = payload
        pos += 8 + size + (size & 1)  # odd chunks carry a pad byte
    if sr is None or data is None:
        raise ValueError("missing fmt or data chunk")
    if n_channels != 1 or bits != 16:
        raise ValueError(f"unsupported profile: {n_channels}ch/{bits}bit")
    if len(data) % 2:
        raise ValueError("data chunk not sample-aligned")
    return sr, np.frombuffer(data, dtype="<i2")


def clip_features(samples: np.ndarray, sample_rate: int) -> dict:
    """Deterministic clip-level features: duration, RMS, peak, zero
    crossings — integer/rational arithmetic on int16 samples, so values
    are exact and platform-independent."""
    n = int(samples.size)
    s = samples.astype(np.int64)
    rms = float(np.sqrt(np.mean(s * s))) if n else 0.0
    zc = int(np.sum((s[:-1] >= 0) != (s[1:] >= 0))) if n > 1 else 0
    return {
        "n_samples": n,
        "duration_ms": round(n * 1000.0 / sample_rate, 3),
        "rms": round(rms, 4),
        "peak": int(np.max(np.abs(s))) if n else 0,
        "zero_crossings": zc,
    }
