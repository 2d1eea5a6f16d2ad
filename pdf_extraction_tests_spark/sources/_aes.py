"""Minimal pure-Python AES-128/256 (FIPS-197) + CBC, for PDF /AESV2 and
/AESV3 streams.

No external crypto libs exist in this image, and the stdlib has none —
this is a from-the-spec implementation sized for PDF decryption (small
streams, correctness over speed).  The S-box is GENERATED from the GF(2^8)
inverse + affine transform rather than typed as 256 literals, and the
whole cipher is pinned against the FIPS-197 appendix C known-answer vector
in tests/test_sources.py — if that vector passes, the tables and round
functions are right.
"""

from __future__ import annotations


def _gf_mul(a: int, b: int) -> int:
    r = 0
    while b:
        if b & 1:
            r ^= a
        b >>= 1
        a <<= 1
        if a & 0x100:
            a ^= 0x11B
    return r


def _build_sbox() -> tuple[bytes, bytes]:
    inv = [0] * 256
    for x in range(1, 256):
        for y in range(1, 256):
            if _gf_mul(x, y) == 1:
                inv[x] = y
                break
    sbox = [0] * 256
    for x in range(256):
        y = inv[x]
        s = y
        for _ in range(4):
            y = ((y << 1) | (y >> 7)) & 0xFF
            s ^= y
        sbox[x] = s ^ 0x63
    invbox = [0] * 256
    for i, v in enumerate(sbox):
        invbox[v] = i
    return bytes(sbox), bytes(invbox)


_SBOX, _INV_SBOX = _build_sbox()
_RCON = [0x01, 0x02, 0x04, 0x08, 0x10, 0x20, 0x40, 0x80, 0x1B, 0x36]


def _expand_key(key: bytes) -> list[bytes]:
    """AES key schedule -> Nr+1 round keys (Nr = 10 for 128-bit keys,
    14 for 256-bit)."""
    nk = len(key) // 4
    assert nk in (4, 8)
    nr = 10 if nk == 4 else 14
    w = [list(key[i:i + 4]) for i in range(0, len(key), 4)]
    for i in range(nk, 4 * (nr + 1)):
        t = list(w[i - 1])
        if i % nk == 0:
            t = t[1:] + t[:1]
            t = [_SBOX[b] for b in t]
            t[0] ^= _RCON[i // nk - 1]
        elif nk == 8 and i % nk == 4:
            t = [_SBOX[b] for b in t]
        w.append([a ^ b for a, b in zip(w[i - nk], t)])
    return [bytes(sum(w[4 * r:4 * r + 4], [])) for r in range(nr + 1)]


def _add_round_key(state: list[int], rk: bytes) -> None:
    for i in range(16):
        state[i] ^= rk[i]


_SHIFT = [0, 5, 10, 15, 4, 9, 14, 3, 8, 13, 2, 7, 12, 1, 6, 11]
_INV_SHIFT = [0, 13, 10, 7, 4, 1, 14, 11, 8, 5, 2, 15, 12, 9, 6, 3]


def _mix_columns(state: list[int], inverse: bool) -> None:
    for c in range(4):
        a = state[4 * c:4 * c + 4]
        if inverse:
            state[4 * c + 0] = (_gf_mul(a[0], 14) ^ _gf_mul(a[1], 11)
                                ^ _gf_mul(a[2], 13) ^ _gf_mul(a[3], 9))
            state[4 * c + 1] = (_gf_mul(a[0], 9) ^ _gf_mul(a[1], 14)
                                ^ _gf_mul(a[2], 11) ^ _gf_mul(a[3], 13))
            state[4 * c + 2] = (_gf_mul(a[0], 13) ^ _gf_mul(a[1], 9)
                                ^ _gf_mul(a[2], 14) ^ _gf_mul(a[3], 11))
            state[4 * c + 3] = (_gf_mul(a[0], 11) ^ _gf_mul(a[1], 13)
                                ^ _gf_mul(a[2], 9) ^ _gf_mul(a[3], 14))
        else:
            state[4 * c + 0] = (_gf_mul(a[0], 2) ^ _gf_mul(a[1], 3)
                                ^ a[2] ^ a[3])
            state[4 * c + 1] = (a[0] ^ _gf_mul(a[1], 2)
                                ^ _gf_mul(a[2], 3) ^ a[3])
            state[4 * c + 2] = (a[0] ^ a[1]
                                ^ _gf_mul(a[2], 2) ^ _gf_mul(a[3], 3))
            state[4 * c + 3] = (_gf_mul(a[0], 3) ^ a[1]
                                ^ a[2] ^ _gf_mul(a[3], 2))


def aes_encrypt_block(key: bytes, block: bytes) -> bytes:
    rks = _expand_key(key)
    nr = len(rks) - 1
    st = list(block)
    _add_round_key(st, rks[0])
    for rnd in range(1, nr):
        st = [_SBOX[b] for b in st]
        st = [st[_SHIFT[i]] for i in range(16)]
        _mix_columns(st, inverse=False)
        _add_round_key(st, rks[rnd])
    st = [_SBOX[b] for b in st]
    st = [st[_SHIFT[i]] for i in range(16)]
    _add_round_key(st, rks[nr])
    return bytes(st)


def aes_decrypt_block(key: bytes, block: bytes) -> bytes:
    rks = _expand_key(key)
    nr = len(rks) - 1
    st = list(block)
    _add_round_key(st, rks[nr])
    for rnd in range(nr - 1, 0, -1):
        st = [st[_INV_SHIFT[i]] for i in range(16)]
        st = [_INV_SBOX[b] for b in st]
        _add_round_key(st, rks[rnd])
        _mix_columns(st, inverse=True)
    st = [st[_INV_SHIFT[i]] for i in range(16)]
    st = [_INV_SBOX[b] for b in st]
    _add_round_key(st, rks[0])
    return bytes(st)


# 128-bit aliases kept for the /AESV2 call sites and the FIPS pins
aes128_encrypt_block = aes_encrypt_block
aes128_decrypt_block = aes_decrypt_block


def aes_cbc_decrypt(key: bytes, data: bytes) -> bytes:
    """PDF /AESV2|/AESV3 stream layout: 16-byte IV || ciphertext, PKCS#5
    padded.  Lenient on damage: short/ragged input decrypts what it can;
    an invalid padding byte is left in place rather than raising."""
    if len(data) < 32:
        return b""
    iv = data[:16]
    ct = data[16:16 + (len(data) - 16) // 16 * 16]
    out = bytearray()
    prev = iv
    for i in range(0, len(ct), 16):
        blk = ct[i:i + 16]
        pt = aes_decrypt_block(key, blk)
        out += bytes(a ^ b for a, b in zip(pt, prev))
        prev = blk
    pad = out[-1] if out else 0
    if 1 <= pad <= 16 and len(out) >= pad:
        del out[-pad:]
    return bytes(out)


aes128_cbc_decrypt = aes_cbc_decrypt


def cbc_encrypt_nopad(key: bytes, iv: bytes, data: bytes) -> bytes:
    """CBC without padding or IV prefix (len(data) % 16 == 0) — the
    primitive Algorithm 2.B's hash loop and the UE/OE unwrap use."""
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        blk = bytes(a ^ b for a, b in zip(data[i:i + 16], prev))
        prev = aes_encrypt_block(key, blk)
        out += prev
    return bytes(out)


def cbc_decrypt_nopad(key: bytes, iv: bytes, data: bytes) -> bytes:
    out = bytearray()
    prev = iv
    for i in range(0, len(data) // 16 * 16, 16):
        blk = data[i:i + 16]
        pt = aes_decrypt_block(key, blk)
        out += bytes(a ^ b for a, b in zip(pt, prev))
        prev = blk
    return bytes(out)


def aes128_cbc_encrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    """Forward CBC (test-side fixture encryptor): PKCS#5 pad, prepend IV."""
    pad = 16 - len(data) % 16
    data = data + bytes([pad]) * pad
    return iv + cbc_encrypt_nopad(key, iv, data)


aes_cbc_encrypt = aes128_cbc_encrypt


def hash_2b(password: bytes, salt: bytes, udata: bytes = b"") -> bytes:
    """ISO 32000-2 Algorithm 2.B: the R6 password hash (SHA-256 start,
    then >= 64 rounds of x64-replication -> AES-128-CBC -> SHA-256/384/512
    chosen by the ciphertext mod 3, until E[-1] <= round - 32)."""
    import hashlib

    k = hashlib.sha256(password + salt + udata).digest()
    i = 0
    while True:
        k1 = (password + k + udata) * 64
        e = cbc_encrypt_nopad(k[:16], k[16:32], k1)
        mod = sum(e[:16]) % 3
        k = (hashlib.sha256, hashlib.sha384, hashlib.sha512)[mod](e).digest()
        i += 1
        if i >= 64 and e[-1] <= i - 32:
            return k[:32]
