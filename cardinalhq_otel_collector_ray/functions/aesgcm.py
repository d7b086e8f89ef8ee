"""Pure-stdlib AES-GCM — the crypto core for the ``aes:`` config provider.

The reference wires ``aesprovider`` into its confmap chain
(``distribution/main.go:16,41``: the OpenTelemetry contrib provider that
decrypts AES-GCM-encrypted config values with a base64 key from the
environment). This container has no crypto library, so the cipher is
implemented here directly from the public specs — AES from FIPS-197
(S-box derived programmatically from the GF(2^8) inverse + affine map,
not transcribed) and GCM from NIST SP 800-38D — and pinned to the
standard test vectors in tests/test_providers_crypto.py. Config secrets
are tiny, so the pure-Python block speed is irrelevant.
"""

from __future__ import annotations

# ---------------------------------------------------------------- GF(2^8)

def _xtime(a: int) -> int:
    a <<= 1
    return (a ^ 0x11B) if a & 0x100 else a


def _gf_mul(a: int, b: int) -> int:
    p = 0
    while b:
        if b & 1:
            p ^= a
        a = _xtime(a)
        b >>= 1
    return p


def _build_sbox() -> tuple[list[int], list[int]]:
    """FIPS-197 §5.1.1: S(x) = affine(x^-1 in GF(2^8))."""
    inv = [0] * 256
    for x in range(1, 256):
        for y in range(1, 256):
            if _gf_mul(x, y) == 1:
                inv[x] = y
                break
    sbox = [0] * 256
    for x in range(256):
        b = inv[x]
        r = 0x63
        for i in range(8):
            bit = ((b >> i) ^ (b >> ((i + 4) % 8)) ^ (b >> ((i + 5) % 8))
                   ^ (b >> ((i + 6) % 8)) ^ (b >> ((i + 7) % 8))) & 1
            r ^= bit << i
        sbox[x] = r
    invbox = [0] * 256
    for x, s in enumerate(sbox):
        invbox[s] = x
    return sbox, invbox


_SBOX, _INV_SBOX = _build_sbox()
_RCON = [0x01]
while len(_RCON) < 14:
    _RCON.append(_xtime(_RCON[-1]))


def _expand_key(key: bytes) -> list[list[int]]:
    """FIPS-197 §5.2 key schedule → list of round keys (16-byte lists)."""
    nk = len(key) // 4
    if nk not in (4, 6, 8):
        raise ValueError("AES key must be 16, 24 or 32 bytes")
    nr = nk + 6
    w = [list(key[4 * i: 4 * i + 4]) for i in range(nk)]
    for i in range(nk, 4 * (nr + 1)):
        t = list(w[i - 1])
        if i % nk == 0:
            t = t[1:] + t[:1]
            t = [_SBOX[b] for b in t]
            t[0] ^= _RCON[i // nk - 1]
        elif nk > 6 and i % nk == 4:
            t = [_SBOX[b] for b in t]
        w.append([a ^ b for a, b in zip(w[i - nk], t)])
    return [sum((w[4 * r + c] for c in range(4)), [])
            for r in range(nr + 1)]


def aes_encrypt_block(key: bytes, block: bytes) -> bytes:
    """One-block AES forward cipher (FIPS-197 §5.1) — all GCM needs."""
    rk = _expand_key(key)
    nr = len(rk) - 1
    s = [b ^ k for b, k in zip(block, rk[0])]
    for rnd in range(1, nr + 1):
        s = [_SBOX[b] for b in s]
        # ShiftRows on column-major state: byte i sits at (row i%4, col i//4)
        s = [s[(i + 4 * (i % 4)) % 16] for i in range(16)]
        if rnd != nr:
            m = []
            for c in range(4):
                a = s[4 * c: 4 * c + 4]
                m += [
                    _gf_mul(a[0], 2) ^ _gf_mul(a[1], 3) ^ a[2] ^ a[3],
                    a[0] ^ _gf_mul(a[1], 2) ^ _gf_mul(a[2], 3) ^ a[3],
                    a[0] ^ a[1] ^ _gf_mul(a[2], 2) ^ _gf_mul(a[3], 3),
                    _gf_mul(a[0], 3) ^ a[1] ^ a[2] ^ _gf_mul(a[3], 2),
                ]
            s = m
        s = [b ^ k for b, k in zip(s, rk[rnd])]
    return bytes(s)


# ------------------------------------------------------------------- GCM

_R = 0xE1 << 120


def _ghash_mul(x: int, y: int) -> int:
    """GF(2^128) multiply, SP 800-38D §6.3 bit convention."""
    z, v = 0, x
    for i in range(127, -1, -1):
        if (y >> i) & 1:
            z ^= v
        v = (v >> 1) ^ _R if v & 1 else v >> 1
    return z


def _ghash(h: int, aad: bytes, data: bytes) -> int:
    y = 0

    def blocks(b: bytes):
        for i in range(0, len(b), 16):
            yield b[i: i + 16].ljust(16, b"\0")

    for blk in blocks(aad):
        y = _ghash_mul(y ^ int.from_bytes(blk, "big"), h)
    for blk in blocks(data):
        y = _ghash_mul(y ^ int.from_bytes(blk, "big"), h)
    lens = (len(aad) * 8).to_bytes(8, "big") + (len(data) * 8).to_bytes(8, "big")
    return _ghash_mul(y ^ int.from_bytes(lens, "big"), h)


def _gctr(key: bytes, icb: int, data: bytes) -> bytes:
    out = bytearray()
    ctr = icb
    for i in range(0, len(data), 16):
        ks = aes_encrypt_block(key, ctr.to_bytes(16, "big"))
        chunk = data[i: i + 16]
        out += bytes(a ^ b for a, b in zip(chunk, ks))
        # increment the low 32 bits (inc32)
        ctr = (ctr & ~0xFFFFFFFF) | ((ctr + 1) & 0xFFFFFFFF)
    return bytes(out)


def _j0(key: bytes, iv: bytes) -> int:
    if len(iv) == 12:
        return (int.from_bytes(iv, "big") << 32) | 1
    h = int.from_bytes(aes_encrypt_block(key, b"\0" * 16), "big")
    return _ghash(h, b"", iv)  # GHASH over IV per §7.1 (len block included)


def gcm_encrypt(key: bytes, iv: bytes, plaintext: bytes,
                aad: bytes = b"") -> tuple[bytes, bytes]:
    """→ (ciphertext, 16-byte tag). 96-bit IVs use the fast J0 path."""
    h = int.from_bytes(aes_encrypt_block(key, b"\0" * 16), "big")
    j0 = _j0(key, iv)
    ct = _gctr(key, (j0 & ~0xFFFFFFFF) | ((j0 + 1) & 0xFFFFFFFF), plaintext)
    s = _ghash(h, aad, ct)
    tag = _gctr(key, j0, s.to_bytes(16, "big"))
    return ct, tag


def gcm_decrypt(key: bytes, iv: bytes, ciphertext: bytes, tag: bytes,
                aad: bytes = b"") -> bytes:
    """Verify-then-decrypt; raises ValueError on tag mismatch."""
    h = int.from_bytes(aes_encrypt_block(key, b"\0" * 16), "big")
    j0 = _j0(key, iv)
    s = _ghash(h, aad, ciphertext)
    want = _gctr(key, j0, s.to_bytes(16, "big"))
    # constant-time-ish compare (config-load path, not a network oracle)
    if len(tag) != 16 or not _ct_eq(want, tag):
        raise ValueError("AES-GCM tag mismatch (wrong key or corrupt value)")
    return _gctr(key, (j0 & ~0xFFFFFFFF) | ((j0 + 1) & 0xFFFFFFFF),
                 ciphertext)


def _ct_eq(a: bytes, b: bytes) -> bool:
    import hmac
    return hmac.compare_digest(a, b)
