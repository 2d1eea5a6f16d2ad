"""CCITT G4 (T.6) decoder tests (sources/_ccitt.py).

Oracle strategy mirrors test_jpeg.py: a test-side G4 ENCODER written
directly from the spec's coding procedure (pass/vertical/horizontal mode
selection per T.6 §2.2.3) round-trips pixels exactly — G4 is lossless,
so equality is exact.  The transcription risk in the T.4 run-length
tables is bounded by structural checks (exact cardinalities, global
prefix-freeness per color alphabet, mode-code prefix-freeness) plus
spot-pinned well-known codewords.
"""

from __future__ import annotations

import numpy as np
import pytest

from pdf_extraction_tests_spark.sources import _ccitt as C


# --- test-side G4 encoder ---------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.bits: list[str] = []

    def put(self, s: str):
        self.bits.append(s)

    def tobytes(self) -> bytes:
        s = "".join(self.bits)
        s += "0" * (-len(s) % 8)
        return bytes(int(s[i:i + 8], 2) for i in range(0, len(s), 8))


_MAKEUPS = sorted([r for r in C.WHITE_CODES if r >= 64]
                  + list(C.EXT_CODES), reverse=True)


def _mh(w: _BitWriter, run: int, white: bool):
    codes = C.WHITE_CODES if white else C.BLACK_CODES
    while run >= 64:
        mk = min(2560, (run // 64) * 64)   # largest makeup <= run
        w.put(codes.get(mk) or C.EXT_CODES[mk])
        run -= mk
    w.put(codes[run])


def _changes(line: np.ndarray) -> list[int]:
    """Changing-element positions (pixel differs from its left neighbor;
    imaginary white pixel before the line)."""
    prev, out = 0, []   # 0 = white
    for i, px in enumerate(line):
        cur = 0 if px > 127 else 1
        if cur != prev:
            out.append(i)
            prev = cur
    return out


def encode_g4(img: np.ndarray, eofb: bool = True) -> bytes:
    """Spec-procedure G4 encoder (T.6 §2.2.3 mode decisions)."""
    h, columns = img.shape
    w = _BitWriter()
    ref = [columns, columns]
    for y in range(h):
        cur = _changes(img[y])
        a0, color, ci = -1, 0, 0
        while a0 < columns:
            # a1: first coding-line change > a0 (alternating colors keep
            # ci in sync with `color`)
            while ci < len(cur) and cur[ci] <= a0:
                ci += 1
            a1 = cur[ci] if ci < len(cur) else columns
            i = 0
            while ref[i] <= a0 or (i & 1) != color:
                i += 1
            b1 = ref[i]
            b2 = ref[i + 1] if b1 < columns else columns
            if b2 < a1:
                w.put(C.MODE_PASS)
                a0 = b2
                continue
            d = a1 - b1
            if -3 <= d <= 3:
                w.put(C.MODE_V0 if d == 0
                      else C.MODE_VR[d] if d > 0 else C.MODE_VL[-d])
                a0, color = a1, color ^ 1
                ci += 1
            else:
                a2 = cur[ci + 1] if ci + 1 < len(cur) else columns
                w.put(C.MODE_H)
                start = max(a0, 0)
                _mh(w, a1 - start, white=color == 0)
                _mh(w, a2 - a1, white=color != 0)
                a0 = a2
                ci += 2
        ref = [*cur, columns, columns]
    if eofb:
        w.put(C.EOFB)
    return w.tobytes()


def _round_trip(img: np.ndarray, rows: int | None = None) -> np.ndarray:
    return C.decode_g4(encode_g4(img), img.shape[1], rows=rows)


# --- table integrity ---------------------------------------------------------


class TestTables:
    def test_cardinalities(self):
        assert len([r for r in C.WHITE_CODES if r < 64]) == 64
        assert len([r for r in C.WHITE_CODES if r >= 64]) == 27
        assert len([r for r in C.BLACK_CODES if r < 64]) == 64
        assert len([r for r in C.BLACK_CODES if r >= 64]) == 27
        assert len(C.EXT_CODES) == 13
        assert sorted(r for r in C.WHITE_CODES if r >= 64) == \
            [64 * i for i in range(1, 28)]
        assert sorted(C.EXT_CODES) == [1792 + 64 * i for i in range(13)]

    @pytest.mark.parametrize("codes", ["white", "black"])
    def test_prefix_free_per_color(self, codes):
        table = dict(C.WHITE_CODES if codes == "white" else C.BLACK_CODES)
        table.update({f"ext{k}": v for k, v in C.EXT_CODES.items()})
        vals = sorted(table.values(), key=len)
        for i, a in enumerate(vals):
            for b in vals[i + 1:]:
                assert not b.startswith(a), (a, b)

    def test_mode_codes_prefix_free(self):
        modes = [C.MODE_V0, C.MODE_H, C.MODE_PASS, C.EOFB[:12],
                 *C.MODE_VR.values(), *C.MODE_VL.values()]
        vals = sorted(modes, key=len)
        for i, a in enumerate(vals):
            for b in vals[i + 1:]:
                assert not b.startswith(a), (a, b)

    def test_spot_pinned_codewords(self):
        # the classic well-known values (T.4 tables 2/3)
        assert C.WHITE_CODES[0] == "00110101"
        assert C.WHITE_CODES[1] == "000111"
        assert C.WHITE_CODES[63] == "00110100"
        assert C.WHITE_CODES[64] == "11011"
        assert C.WHITE_CODES[1728] == "010011011"
        assert C.BLACK_CODES[0] == "0000110111"
        assert C.BLACK_CODES[1] == "010"
        assert C.BLACK_CODES[2] == "11"
        assert C.BLACK_CODES[64] == "0000001111"
        assert C.EXT_CODES[2560] == "000000011111"

    def test_mh_lengths_legal(self):
        for t in (C.WHITE_CODES, C.BLACK_CODES, C.EXT_CODES):
            assert all(2 <= len(v) <= 13 for v in t.values())


# --- round trips -------------------------------------------------------------


class TestRoundTrip:
    def test_all_white_and_all_black(self):
        for v in (255.0, 0.0):
            img = np.full((5, 64), v)
            assert np.array_equal(_round_trip(img), img)

    def test_vertical_modes(self):
        # a drifting edge: consecutive rows differ by <= 3 -> pure V codes
        img = np.full((12, 40), 255.0)
        for y in range(12):
            img[y, : 10 + y] = 0.0
        assert np.array_equal(_round_trip(img), img)

    def test_horizontal_and_pass_modes(self):
        img = np.full((6, 80), 255.0)
        img[0, 10:20] = 0.0
        img[1, 60:70] = 0.0        # jump > 3 -> horizontal mode
        img[2, 5:8] = 0.0
        img[2, 30:35] = 0.0        # ref has extra run -> pass on next row
        img[3, 5:8] = 0.0
        assert np.array_equal(_round_trip(img), img)

    def test_random_noise(self):
        rng = np.random.default_rng(5)
        img = np.where(rng.random((32, 57)) < 0.4, 0.0, 255.0)
        assert np.array_equal(_round_trip(img), img)

    def test_text_like_stripes(self):
        rng = np.random.default_rng(9)
        img = np.full((40, 200), 255.0)
        for y in range(4, 36, 6):
            for _ in range(8):
                x = int(rng.integers(0, 180))
                img[y:y + 3, x:x + int(rng.integers(2, 14))] = 0.0
        assert np.array_equal(_round_trip(img), img)

    def test_long_runs_hit_makeup_codes(self):
        img = np.full((3, 2500), 255.0)
        img[1, 100:2300] = 0.0     # black run 2200 -> extended makeups
        assert np.array_equal(_round_trip(img), img)

    def test_rows_parameter_truncates(self):
        img = np.where(np.indices((8, 16)).sum(0) % 3 == 0, 0.0, 255.0)
        got = _round_trip(img, rows=5)
        assert np.array_equal(got, img[:5])

    def test_single_column(self):
        img = np.array([[0.0], [255.0], [0.0]])
        assert np.array_equal(_round_trip(img), img)


class TestHostileInputs:
    def test_truncated_raises(self):
        img = np.where(np.random.default_rng(1).random((16, 64)) < 0.5,
                       0.0, 255.0)
        data = encode_g4(img)
        with pytest.raises(ValueError):
            C.decode_g4(data[: len(data) // 3], 64, rows=16)

    def test_garbage_total(self):
        rng = np.random.default_rng(2)
        for _ in range(200):
            junk = bytes(rng.integers(0, 256, int(rng.integers(1, 64)),
                                      dtype=np.uint8))
            try:
                C.decode_g4(junk, 64, rows=8)
            except ValueError:
                pass

    def test_mutation_fuzz_total(self):
        img = np.where(np.random.default_rng(3).random((12, 48)) < 0.3,
                       0.0, 255.0)
        base = bytearray(encode_g4(img))
        rng = np.random.default_rng(4)
        for _ in range(300):
            buf = bytearray(base)
            buf[int(rng.integers(0, len(buf)))] = int(rng.integers(0, 256))
            try:
                C.decode_g4(bytes(buf), 48)
            except ValueError:
                pass

    def test_bad_columns(self):
        with pytest.raises(ValueError):
            C.decode_g4(b"\x00", 0)


class TestPdfIntegration:
    def test_g4_xobject_decodes_to_pgm_media(self):
        from pdf_extraction_tests_spark.operators import multimodal as MM
        from pdf_extraction_tests_spark.sources.pdf_min import (
            extract_pdf_media, write_minimal_pdf)

        img = np.full((20, 30), 255.0)
        img[5:15, 8:22] = 0.0
        data = write_minimal_pdf([[
            ("text", 50, 50, 12, "scanned page stand-in"),
            ("g4", "Fax0", encode_g4(img), 30, 20),
        ]])
        media = extract_pdf_media(data)
        assert [(m["ref"], m["codec"]) for m in media] \
            == [("pdf:xobj:Fax0", "g4")]
        assert media[0]["content"].startswith(b"P5\n30 20\n255\n")
        feat, kind = MM._decode(media[0]["content"], "image")
        assert kind == "pixel"
        # 10x14 black box in 600 px: black fraction lands in bin 0
        assert abs(feat[0] - 140 / 600) < 1e-6

    def test_corrupt_g4_stays_labeled_placeholder(self):
        from pdf_extraction_tests_spark.sources.pdf_min import (
            extract_pdf_media, write_minimal_pdf)

        # 0x00 0x01...: the bit prefix 0000000 1 matches no T.6 mode code
        # (0xFF bytes would NOT do here: all-ones is a valid stream of V0
        # modes decoding to white rows)
        data = write_minimal_pdf([[
            ("text", 50, 50, 12, "scanned page stand-in"),
            ("g4", "Fax0", b"\x00\x01\x00\x01", 30, 20),
        ]])
        media = extract_pdf_media(data)
        assert media[0]["codec"] == "ccitt"      # honest placeholder
        assert media[0]["content"] is None
        assert (media[0]["width"], media[0]["height"]) == (30, 20)
