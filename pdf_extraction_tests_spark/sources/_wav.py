"""Pure-Python RIFF/WAVE PCM decoder — stdlib struct + numpy.

Gives the multimodal operator a REAL decode path for the ``audio``
media type (previously always digest-stubbed): uncompressed PCM WAV is
the canonical interchange format a web-scale audio pipeline normalizes
to before feature extraction.  Scope: format tag 1 (PCM), 8-bit
unsigned / 16-bit signed samples, any channel count (downmixed by
mean), fmt before data.  Everything else (IEEE float, ADPCM, extensible
headers) raises ValueError — the same honest-boundary contract as the
image decoders.  Resource ceiling: 2^26 samples.
"""

from __future__ import annotations

import struct

import numpy as np

_MAX_SAMPLES = 1 << 26


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> (mono float64 samples in [-1, 1], sample_rate).
    Raises ValueError on malformed or out-of-profile input."""
    data = bytes(data)
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("bad RIFF/WAVE header")
    off = 12
    fmt = None
    samples = None
    rate = None
    guard = 0
    while off + 8 <= len(data):
        guard += 1
        if guard > 1 << 12:
            raise ValueError("chunk loop guard")
        ctype = data[off:off + 4]
        (length,) = struct.unpack("<I", data[off + 4:off + 8])
        if length > len(data) - off - 8:
            raise ValueError("chunk overruns stream")
        payload = data[off + 8:off + 8 + length]
        if ctype == b"fmt ":
            if len(payload) < 16:
                raise ValueError("truncated fmt chunk")
            tag, channels, rate, _br, _ba, bits = struct.unpack(
                "<HHIIHH", payload[:16])
            if tag != 1:
                raise ValueError(f"WAV format tag {tag} unsupported")
            if channels < 1 or channels > 16:
                raise ValueError("bad channel count")
            if bits not in (8, 16):
                raise ValueError(f"{bits}-bit samples unsupported")
            if not 0 < rate <= 1 << 20:
                raise ValueError("bad sample rate")
            fmt = (channels, bits)
        elif ctype == b"data":
            if fmt is None:
                raise ValueError("data chunk before fmt")
            channels, bits = fmt
            width = bits // 8
            n = len(payload) // (width * channels)
            if n == 0:
                raise ValueError("empty data chunk")
            if n * channels > _MAX_SAMPLES:
                raise ValueError("WAV too large")
            frames = payload[: n * width * channels]
            if bits == 8:
                arr = np.frombuffer(frames, dtype=np.uint8).astype(
                    np.float64)
                arr = (arr - 128.0) / 128.0
            else:
                arr = np.frombuffer(frames, dtype="<i2").astype(
                    np.float64) / 32768.0
            samples = arr.reshape(n, channels).mean(axis=1)
        # other chunks (LIST, fact, ...) are skipped; odd lengths pad
        off += 8 + length + (length & 1)
    if samples is None or rate is None:
        raise ValueError("missing fmt/data chunk")
    return samples, int(rate)
