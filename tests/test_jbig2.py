"""JBIG2 decoder tests (sources/_jbig2.py).

Oracle strategy mirrors test_ccitt.py / test_jpeg.py: a test-side
spec-procedure MQ *encoder* (T.88 Annex E CODEMPS/CODELPS/BYTEOUT/
FLUSH) plus a generic-region encoder round-trip bitmaps exactly —
arithmetic coding is lossless.  The Qe state table's transcription risk
is bounded structurally (cardinality, pinned rows, probability ordering
of the fast-attack column) since the round-trip shares the table.
"""

from __future__ import annotations

import numpy as np
import pytest

from pdf_extraction_tests_spark.sources import _jbig2 as J


# --- test-side MQ encoder (T.88 Annex E) ------------------------------------


class MQEncoder:
    def __init__(self):
        self.out = bytearray([0])      # scratch byte; dropped at flush
        self.c = 0
        self.a = 0x8000
        self.ct = 12

    def _byteout(self) -> None:
        o = self.out
        if o[-1] == 0xFF:
            stuff = True
        elif self.c < 0x8000000:
            stuff = False
        else:
            o[-1] += 1
            if o[-1] == 0xFF:
                self.c &= 0x7FFFFFF
                stuff = True
            else:
                stuff = False
        if stuff:
            o.append((self.c >> 20) & 0xFF)
            self.c &= 0xFFFFF
            self.ct = 7
        else:
            o.append((self.c >> 19) & 0xFF)
            self.c &= 0x7FFFF
            self.ct = 8

    def _renorm(self) -> None:
        while True:
            self.a = (self.a << 1) & 0xFFFF
            self.c = (self.c << 1) & 0xFFFFFFFF
            self.ct -= 1
            if self.ct == 0:
                self._byteout()
            if self.a & 0x8000:
                break

    def encode(self, cx, i: int, d: int) -> None:
        icx, mps = cx[i]
        qe, nmps, nlps, switch = J.QE_TABLE[icx]
        if d == mps:
            self.a -= qe
            if (self.a & 0x8000) == 0:
                if self.a < qe:
                    self.a = qe
                else:
                    self.c += qe
                cx[i] = (nmps, mps)
                self._renorm()
            else:
                self.c += qe
        else:
            self.a -= qe
            if self.a < qe:
                self.c += qe
            else:
                self.a = qe
            cx[i] = (nlps, 1 - mps if switch else mps)
            self._renorm()

    def flush(self) -> bytes:
        tempc = self.c + self.a
        self.c |= 0xFFFF
        if self.c >= tempc:
            self.c -= 0x8000
        self.c = (self.c << self.ct) & 0xFFFFFFFF
        self._byteout()
        self.c = (self.c << self.ct) & 0xFFFFFFFF
        self._byteout()
        return bytes(self.out[1:])


def encode_generic(bitmap: np.ndarray, template: int = 0,
                   at: list[tuple[int, int]] | None = None,
                   tpgdon: bool = False) -> bytes:
    """Spec-procedure generic-region encoder, GBTEMPLATEs 0-3."""
    h, w = bitmap.shape
    pos = J.template_positions(template, at or J._NOMINAL_AT[template])
    enc = MQEncoder()
    cx = [(0, 0)] * (1 << len(pos))
    ltp = 0
    for y in range(h):
        if tpgdon:
            want = int(y > 0 and np.array_equal(bitmap[y], bitmap[y - 1]))
            enc.encode(cx, J._TPGD_CX[template], want ^ ltp)
            ltp = want
            if ltp:
                continue
        for x in range(w):
            ctx = 0
            for dx, dy in pos:
                xx, yy = x + dx, y + dy
                ctx <<= 1
                if 0 <= yy < h and 0 <= xx < w:
                    ctx |= int(bitmap[yy, xx])
            enc.encode(cx, ctx, int(bitmap[y, x]))
    return enc.flush()


def encode_generic_t0(bitmap: np.ndarray,
                      at: list[tuple[int, int]] | None = None,
                      tpgdon: bool = False) -> bytes:
    return encode_generic(bitmap, 0, at, tpgdon)


# --- test-side embedded segment writer --------------------------------------


def _seg(num: int, seg_type: int, body: bytes, page: int = 1) -> bytes:
    return (num.to_bytes(4, "big") + bytes([seg_type])
            + b"\x00"                       # 0 referred, short form
            + bytes([page]) + len(body).to_bytes(4, "big") + body)


_AT_BYTES = {0: bytes([3, 0xFF, 0xFD, 0xFF, 2, 0xFE, 0xFE, 0xFE]),
             1: bytes([3, 0xFF]), 2: bytes([2, 0xFF]),
             3: bytes([2, 0xFF])}


def make_jbig2(bitmaps: list[tuple[int, int, np.ndarray]],
               page_wh: tuple[int, int] | None = None,
               tpgdon: bool = False, mmr: bool = False,
               template: int = 0) -> bytes:
    """Embedded-format stream: page info + one immediate lossless
    generic region per bitmap."""
    out = b""
    n = 1
    if page_wh is not None:
        body = (page_wh[0].to_bytes(4, "big")
                + page_wh[1].to_bytes(4, "big")
                + bytes(8) + b"\x00" + bytes(2))
        out += _seg(n, 48, body)
        n += 1
    for x, y, bm in bitmaps:
        h, w = bm.shape
        info = (w.to_bytes(4, "big") + h.to_bytes(4, "big")
                + x.to_bytes(4, "big") + y.to_bytes(4, "big") + b"\x00")
        if mmr:
            from tests.test_ccitt import encode_g4

            data = encode_g4(np.where(bm, 0.0, 255.0))
            body = info + bytes([1]) + data
        else:
            gflags = (8 if tpgdon else 0) | (template << 1)
            body = (info + bytes([gflags]) + _AT_BYTES[template]
                    + encode_generic(bm, template, tpgdon=tpgdon))
        out += _seg(n, 39, body)
        n += 1
    return out


def _rand_bitmap(rng, h, w, p=0.35):
    return (rng.rand(h, w) < p).astype(np.uint8)


# --- MQ coder ----------------------------------------------------------------


class TestMQCoder:
    def test_qe_table_shape_and_pins(self):
        assert len(J.QE_TABLE) == 47
        assert J.QE_TABLE[0] == (0x5601, 1, 1, 1)
        assert J.QE_TABLE[45] == (0x0001, 45, 43, 0)
        assert J.QE_TABLE[46] == (0x5601, 46, 46, 0)
        assert J.QE_TABLE[14] == (0x5601, 15, 14, 1)
        for qe, nmps, nlps, _sw in J.QE_TABLE:
            assert 0 < qe <= 0x5601
            assert 0 <= nmps < 47 and 0 <= nlps < 47

    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_random_decision_round_trip(self, seed):
        rng = np.random.RandomState(seed)
        n_cx = 8
        decisions = [(int(rng.randint(n_cx)), int(rng.rand() < 0.3))
                     for _ in range(5000)]
        enc = MQEncoder()
        cx = [(0, 0)] * n_cx
        for i, d in decisions:
            enc.encode(cx, i, d)
        data = enc.flush()
        dec = J.MQDecoder(data)
        cx2 = [(0, 0)] * n_cx
        got = [dec.decode(cx2, i) for i, _ in decisions]
        assert got == [d for _, d in decisions]

    def test_skewed_stream_compresses(self):
        # 10k near-constant decisions should code to well under 200 bytes
        enc = MQEncoder()
        cx = [(0, 0)]
        for i in range(10000):
            enc.encode(cx, 0, 1 if i % 997 == 0 else 0)
        assert len(enc.flush()) < 200


# --- generic region round trips ---------------------------------------------


class TestGenericRegion:
    @pytest.mark.parametrize("seed,h,w", [(3, 17, 23), (4, 40, 61)])
    def test_noise_round_trip(self, seed, h, w):
        bm = _rand_bitmap(np.random.RandomState(seed), h, w)
        out = J.decode_generic_t0(encode_generic_t0(bm), w, h)
        assert np.array_equal(out, bm)

    def test_all_white_and_black(self):
        for v in (0, 1):
            bm = np.full((9, 31), v, dtype=np.uint8)
            out = J.decode_generic_t0(encode_generic_t0(bm), 31, 9)
            assert np.array_equal(out, bm)

    def test_tpgdon_round_trip(self):
        bm = np.zeros((20, 33), dtype=np.uint8)
        bm[3:9] = _rand_bitmap(np.random.RandomState(5), 1, 33)  # repeated
        bm[12, ::2] = 1
        data = encode_generic_t0(bm, tpgdon=True)
        out = J.decode_generic_t0(data, 33, 20, tpgdon=True)
        assert np.array_equal(out, bm)
        # typical prediction should beat plain coding on repeated rows
        assert len(data) <= len(encode_generic_t0(bm)) + 2

    def test_text_like_content(self):
        rng = np.random.RandomState(11)
        bm = np.zeros((30, 120), dtype=np.uint8)
        for y in range(4, 26, 7):
            for _ in range(9):
                x = int(rng.randint(0, 110))
                bm[y:y + 4, x:x + int(rng.randint(2, 9))] = 1
        out = J.decode_generic_t0(encode_generic_t0(bm), 120, 30)
        assert np.array_equal(out, bm)

    def test_non_causal_at_rejected(self):
        with pytest.raises(ValueError):
            J.template0_positions([(3, -1), (-3, -1), (2, -2), (0, 0)])
        with pytest.raises(ValueError):
            J.decode_generic_t0(b"\x00", 0, 5)

    def test_at_slots_are_fixed(self):
        # T.88 gives each AT pixel a fixed context-bit slot (its nominal
        # position in the figure's reading order) regardless of where it
        # actually points (round-5 advice item)
        for template, nominal in J._NOMINAL_AT.items():
            nom_pos = J.template_positions(template, nominal)
            slots = [nom_pos.index(a) for a in nominal]
            moved = [(dx - 1, dy - 1) for dx, dy in nominal]  # non-nominal
            got = J.template_positions(template, moved)
            for slot, actual in zip(slots, moved):
                assert got[slot] == actual
            # every non-AT slot is untouched
            for i, p in enumerate(nom_pos):
                if i not in slots:
                    assert got[i] == p

    def test_non_nominal_at_round_trip(self):
        bm = _rand_bitmap(np.random.RandomState(6), 19, 27)
        at = [(1, -1), (-2, -1), (1, -2), (-1, -2)]
        out = J.decode_generic_t0(encode_generic_t0(bm, at=at), 27, 19,
                                  at=at)
        assert np.array_equal(out, bm)


# --- embedded segment layer ---------------------------------------------------


class TestEmbedded:
    def test_single_region_with_page_info(self):
        bm = _rand_bitmap(np.random.RandomState(7), 12, 18)
        px = J.decode_jbig2(make_jbig2([(0, 0, bm)], page_wh=(18, 12)))
        assert px.shape == (12, 18)
        assert np.array_equal(px == 0.0, bm.astype(bool))

    def test_two_regions_composed_on_page(self):
        a = np.ones((4, 6), dtype=np.uint8)
        b = np.ones((3, 5), dtype=np.uint8)
        px = J.decode_jbig2(
            make_jbig2([(2, 1, a), (10, 8, b)], page_wh=(20, 15)))
        assert px.shape == (15, 20)
        assert (px[1:5, 2:8] == 0.0).all()
        assert (px[8:11, 10:15] == 0.0).all()
        assert px[0, 0] == 255.0

    def test_globals_stream_prepended(self):
        bm = _rand_bitmap(np.random.RandomState(8), 9, 9)
        full = make_jbig2([(0, 0, bm)], page_wh=(9, 9))
        # split: page-info segment into "globals", region into "data"
        _num, _t, _pg, length, doff = J._parse_segment_header(full, 0)
        g, rest = full[: doff + length], full[doff + length:]
        assert np.array_equal(J.decode_jbig2(rest, g) == 0.0,
                              bm.astype(bool))

    def test_mmr_region(self):
        bm = _rand_bitmap(np.random.RandomState(9), 11, 27)
        px = J.decode_jbig2(
            make_jbig2([(0, 0, bm)], page_wh=(27, 11), mmr=True))
        assert np.array_equal(px == 0.0, bm.astype(bool))

    def test_tpgdon_region(self):
        bm = np.zeros((10, 16), dtype=np.uint8)
        bm[2:8, 3:12] = 1
        px = J.decode_jbig2(
            make_jbig2([(0, 0, bm)], page_wh=(16, 10), tpgdon=True))
        assert np.array_equal(px == 0.0, bm.astype(bool))

    def test_unsupported_segment_type_raises(self):
        seg = _seg(1, 4, b"\x00" * 20)     # text region
        with pytest.raises(ValueError):
            J.decode_jbig2(seg)

    def test_truncated_and_garbage_total(self):
        bm = _rand_bitmap(np.random.RandomState(10), 8, 8)
        full = make_jbig2([(0, 0, bm)], page_wh=(8, 8))
        for cut in (1, 7, len(full) // 2, len(full) - 1):
            try:
                J.decode_jbig2(full[:cut])
            except ValueError:
                pass
        with pytest.raises(ValueError):
            J.decode_jbig2(b"")

    def test_mutation_fuzz_total(self):
        rng = np.random.RandomState(12)
        bm = _rand_bitmap(rng, 10, 14)
        base = bytearray(make_jbig2([(0, 0, bm)], page_wh=(14, 10)))
        for _ in range(300):
            mut = bytearray(base)
            for _ in range(rng.randint(1, 4)):
                mut[rng.randint(len(mut))] ^= 1 << rng.randint(8)
            try:
                out = J.decode_jbig2(bytes(mut))
                assert out.ndim == 2
            except ValueError:
                pass


class TestPdfIntegration:
    def test_jbig2_xobject_decodes_to_pgm_media(self):
        from pdf_extraction_tests_spark.sources.pdf_min import (
            extract_pdf_media, write_minimal_pdf)

        bm = _rand_bitmap(np.random.RandomState(13), 10, 24)
        payload = make_jbig2([(0, 0, bm)], page_wh=(24, 10))
        pdf = write_minimal_pdf(
            [[("text", 72, 90, 12, "jb"), ("jbig2", "Jb1",
               payload, 24, 10)]])
        media = extract_pdf_media(pdf)
        m = [x for x in media if x["codec"] == "jbig2"]
        assert len(m) == 1
        assert m[0]["content"].startswith(b"P5\n24 10\n255\n")
        px = np.frombuffer(
            m[0]["content"].split(b"\n", 3)[3], dtype=np.uint8)
        assert np.array_equal(px.reshape(10, 24) == 0, bm.astype(bool))

    def test_corrupt_jbig2_stays_labeled_placeholder(self):
        from pdf_extraction_tests_spark.sources.pdf_min import (
            extract_pdf_media, write_minimal_pdf)

        pdf = write_minimal_pdf(
            [[("jbig2", "Jb1", b"\x00\x01\x02\x03", 24, 10)]])
        media = extract_pdf_media(pdf)
        assert media and media[0]["codec"] == "jbig2decode"


class TestTemplates123:
    @pytest.mark.parametrize("template", [1, 2, 3])
    def test_round_trip(self, template):
        bm = _rand_bitmap(np.random.RandomState(20 + template), 19, 31)
        out = J.decode_generic(encode_generic(bm, template), 31, 19,
                               template=template)
        assert np.array_equal(out, bm)

    @pytest.mark.parametrize("template", [1, 2, 3])
    def test_segment_level(self, template):
        bm = _rand_bitmap(np.random.RandomState(30 + template), 9, 13)
        px = J.decode_jbig2(make_jbig2([(0, 0, bm)], page_wh=(13, 9),
                                       template=template))
        assert np.array_equal(px == 0.0, bm.astype(bool))

    def test_tpgdon_template2(self):
        bm = np.zeros((12, 17), dtype=np.uint8)
        bm[4:9, 2:15] = 1
        data = encode_generic(bm, 2, tpgdon=True)
        out = J.decode_generic(data, 17, 12, template=2, tpgdon=True)
        assert np.array_equal(out, bm)

    def test_context_sizes(self):
        assert len(J.template_positions(0, J._NOMINAL_AT[0])) == 16
        assert len(J.template_positions(1, J._NOMINAL_AT[1])) == 13
        assert len(J.template_positions(2, J._NOMINAL_AT[2])) == 10
        assert len(J.template_positions(3, J._NOMINAL_AT[3])) == 10

    def test_wrong_at_count_rejected(self):
        with pytest.raises(ValueError):
            J.template_positions(1, J._NOMINAL_AT[0])
        with pytest.raises(ValueError):
            J.decode_generic(b"", 5, 5, template=7)


class TestCombineOps:
    def _two_region_stream(self, op: int) -> bytes:
        # region A fills the page; region B overlaps with operator `op`
        a = np.ones((6, 8), dtype=np.uint8)
        b = np.zeros((6, 8), dtype=np.uint8)
        b[:, :4] = 1
        out = b""
        body = ((8).to_bytes(4, "big") + (6).to_bytes(4, "big")
                + bytes(8) + b"\x00" + bytes(2))
        out += _seg(1, 48, body)
        for n, (bm, o) in enumerate(((a, 0), (b, op)), start=2):
            info = ((8).to_bytes(4, "big") + (6).to_bytes(4, "big")
                    + bytes(8) + bytes([o]))
            out += _seg(n, 39, info + bytes([0]) + _AT_BYTES[0]
                        + encode_generic(bm))
        return out

    @pytest.mark.parametrize("op,left,right", [
        (0, 0.0, 0.0),      # OR: stays black everywhere
        (1, 0.0, 255.0),    # AND: only overlap stays black
        (2, 255.0, 0.0),    # XOR: overlap flips white
        (4, 0.0, 255.0),    # REPLACE: b wins
    ])
    def test_ops(self, op, left, right):
        px = J.decode_jbig2(self._two_region_stream(op))
        assert px[0, 0] == left      # inside b's black half
        assert px[0, 7] == right     # outside b's black half

    def test_invalid_op_raises(self):
        with pytest.raises(ValueError):
            J.decode_jbig2(self._two_region_stream(7))


class TestResourceCeilings:
    def test_mmr_region_huge_dims_rejected(self):
        # the MMR branch must hit the same area guard as the MQ branch
        info = ((65535).to_bytes(4, "big") + (65535).to_bytes(4, "big")
                + bytes(8) + b"\x00")
        seg = _seg(1, 39, info + bytes([1]) + b"\xff" * 64)
        with pytest.raises(ValueError):
            J.decode_jbig2(seg)

    def test_mq_region_huge_dims_rejected(self):
        info = ((16384).to_bytes(4, "big") + (16384).to_bytes(4, "big")
                + bytes(8) + b"\x00")
        seg = _seg(1, 39, info + bytes([0]) + _AT_BYTES[0] + b"\x00" * 8)
        with pytest.raises(ValueError):
            J.decode_jbig2(seg)
