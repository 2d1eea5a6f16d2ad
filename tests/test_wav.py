"""WAV PCM decoder tests (sources/_wav.py) — test-side RIFF writer
round-trips samples exactly (PCM is lossless)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from pdf_extraction_tests_spark.sources import _wav as W


def encode_wav(samples: np.ndarray, rate: int = 8000, bits: int = 16,
               extra_chunk: bytes | None = None) -> bytes:
    """(n,) or (n, channels) float in [-1, 1] -> WAV bytes."""
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    if bits == 16:
        raw = (np.clip(samples, -1, 1) * 32767).astype("<i2").tobytes()
    else:
        raw = ((np.clip(samples, -1, 1) * 127) + 128).astype(
            np.uint8).tobytes()
    width = bits // 8
    fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * ch * width,
                      ch * width, bits)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    if extra_chunk is not None:
        body += extra_chunk
    body += b"data" + struct.pack("<I", len(raw)) + raw
    return b"RIFF" + struct.pack("<I", len(body)) + body


class TestRoundTrip:
    def test_16bit_mono(self):
        rng = np.random.RandomState(0)
        s = rng.uniform(-1, 1, 500)
        got, rate = W.decode_wav(encode_wav(s, rate=44100))
        assert rate == 44100
        assert np.allclose(got, np.round(s * 32767) / 32768.0, atol=1e-4)

    def test_8bit_mono(self):
        rng = np.random.RandomState(1)
        s = rng.uniform(-1, 1, 200)
        got, rate = W.decode_wav(encode_wav(s, bits=8))
        assert rate == 8000
        assert np.allclose(got, s, atol=1 / 64)

    def test_stereo_downmix(self):
        t = np.linspace(0, 1, 100)
        stereo = np.stack([np.sin(2 * np.pi * 5 * t),
                           -np.sin(2 * np.pi * 5 * t)], axis=1)
        got, _ = W.decode_wav(encode_wav(stereo))
        assert np.abs(got).max() < 1e-3     # L/R cancel in the mean

    def test_extra_chunk_skipped(self):
        s = np.zeros(50)
        extra = b"LIST" + struct.pack("<I", 5) + b"INFOX" + b"\x00"  # padded
        got, _ = W.decode_wav(encode_wav(s, extra_chunk=extra))
        assert len(got) == 50


class TestTotality:
    def test_bad_headers(self):
        for bad in (b"", b"RIFX" + b"\x00" * 20,
                    b"RIFF" + b"\x00\x00\x00\x00" + b"AVI "):
            with pytest.raises(ValueError):
                W.decode_wav(bad)

    def test_unsupported_profiles(self):
        s = np.zeros(10)
        base = bytearray(encode_wav(s))
        fmt_off = base.index(b"fmt ") + 8
        for pos, val in ((0, 3),     # IEEE float tag
                         (14, 24)):  # 24-bit
            mut = bytearray(base)
            mut[fmt_off + pos] = val
            with pytest.raises(ValueError):
                W.decode_wav(bytes(mut))

    def test_data_before_fmt_rejected(self):
        body = (b"WAVE" + b"data" + struct.pack("<I", 4) + b"\x00" * 4)
        with pytest.raises(ValueError):
            W.decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)

    def test_mutation_fuzz_total(self):
        rng = np.random.RandomState(2)
        base = bytearray(encode_wav(rng.uniform(-1, 1, 64)))
        for _ in range(300):
            mut = bytearray(base)
            for _ in range(rng.randint(1, 4)):
                mut[rng.randint(len(mut))] ^= 1 << rng.randint(8)
            try:
                got, rate = W.decode_wav(bytes(mut))
                assert got.ndim == 1 and rate > 0
            except ValueError:
                pass

    def test_truncations_total(self):
        full = encode_wav(np.zeros(40))
        for cut in (0, 4, 11, 20, len(full) - 1):
            try:
                W.decode_wav(full[:cut])
            except ValueError:
                pass
