"""AES-128 + CBC, pure stdlib (FIPS 197 / SP 800-38A), for PDF AESV2
stream decryption (kernels/pdf_crypt.py) — the sandbox has no crypto
package, and the per-document data volumes (KB-scale content streams
on the rare encrypted slice of a crawl) make a table-driven pure-
Python implementation entirely adequate. Pinned against the FIPS-197
appendix and SP 800-38A CBC vectors in tests/test_kernels.py.

Only the 128-bit key size is implemented: PDF's AESV2 crypt filter is
defined as AES-128-CBC (PDF 32000-1 §7.6.2); AESV3 (AES-256, /V 5)
uses a different key-derivation entirely and stays quarantined.
"""

from __future__ import annotations

# -- tables (computed once at import from first principles) -------------------

def _build_tables():
    # GF(2^8) exp/log over generator 3
    exp, log = [0] * 512, [0] * 256
    x = 1
    for i in range(255):
        exp[i] = x
        log[x] = i
        x ^= (x << 1) ^ (0x1B if x & 0x80 else 0)
        x &= 0xFF
    for i in range(255, 512):
        exp[i] = exp[i - 255]

    def gmul(a, b):
        if a == 0 or b == 0:
            return 0
        return exp[log[a] + log[b]]

    sbox, inv_sbox = [0] * 256, [0] * 256
    for i in range(256):
        inv = exp[255 - log[i]] if i else 0
        s = inv
        for _ in range(4):
            inv = ((inv << 1) | (inv >> 7)) & 0xFF
            s ^= inv
        s ^= 0x63
        sbox[i] = s
        inv_sbox[s] = i
    return sbox, inv_sbox, gmul


_SBOX, _INV_SBOX, _GMUL = _build_tables()
_RCON = [0x01, 0x02, 0x04, 0x08, 0x10, 0x20, 0x40, 0x80, 0x1B, 0x36]


def _expand_key(key: bytes) -> list[list[int]]:
    """128-bit key schedule: 11 round keys of 16 bytes each."""
    assert len(key) == 16, "AES-128 only"
    words = [list(key[i:i + 4]) for i in range(0, 16, 4)]
    for i in range(4, 44):
        t = list(words[i - 1])
        if i % 4 == 0:
            t = t[1:] + t[:1]
            t = [_SBOX[b] for b in t]
            t[0] ^= _RCON[i // 4 - 1]
        words.append([a ^ b for a, b in zip(words[i - 4], t)])
    return [sum(words[4 * r:4 * r + 4], []) for r in range(11)]


def _mix_single(col, m):
    a, b, c, d = col
    return [
        _GMUL(a, m[0]) ^ _GMUL(b, m[1]) ^ _GMUL(c, m[2]) ^ _GMUL(d, m[3]),
        _GMUL(a, m[3]) ^ _GMUL(b, m[0]) ^ _GMUL(c, m[1]) ^ _GMUL(d, m[2]),
        _GMUL(a, m[2]) ^ _GMUL(b, m[3]) ^ _GMUL(c, m[0]) ^ _GMUL(d, m[1]),
        _GMUL(a, m[1]) ^ _GMUL(b, m[2]) ^ _GMUL(c, m[3]) ^ _GMUL(d, m[0]),
    ]


_SHIFT = [0, 5, 10, 15, 4, 9, 14, 3, 8, 13, 2, 7, 12, 1, 6, 11]
_INV_SHIFT = [0, 13, 10, 7, 4, 1, 14, 11, 8, 5, 2, 15, 12, 9, 6, 3]


def encrypt_block(key_schedule: list, block: bytes) -> bytes:
    s = [b ^ k for b, k in zip(block, key_schedule[0])]
    for rnd in range(1, 10):
        s = [_SBOX[s[i]] for i in _SHIFT]
        s = sum((_mix_single(s[c:c + 4], (2, 3, 1, 1))
                 for c in range(0, 16, 4)), [])
        s = [b ^ k for b, k in zip(s, key_schedule[rnd])]
    s = [_SBOX[s[i]] for i in _SHIFT]
    return bytes(b ^ k for b, k in zip(s, key_schedule[10]))


def decrypt_block(key_schedule: list, block: bytes) -> bytes:
    s = [b ^ k for b, k in zip(block, key_schedule[10])]
    for rnd in range(9, 0, -1):
        s = [_INV_SBOX[s[i]] for i in _INV_SHIFT]
        s = [b ^ k for b, k in zip(s, key_schedule[rnd])]
        s = sum((_mix_single(s[c:c + 4], (14, 11, 13, 9))
                 for c in range(0, 16, 4)), [])
    s = [_INV_SBOX[s[i]] for i in _INV_SHIFT]
    return bytes(b ^ k for b, k in zip(s, key_schedule[0]))


def cbc_encrypt(key: bytes, iv: bytes, plaintext: bytes) -> bytes:
    """CBC with PKCS#7 padding (the PDF AESV2 convention, RFC 2898
    style: 1–16 pad bytes, always present). Returns iv-free
    ciphertext; PDF prepends the IV itself."""
    ks = _expand_key(key)
    pad = 16 - (len(plaintext) % 16)
    data = plaintext + bytes([pad]) * pad
    out, prev = bytearray(), iv
    for i in range(0, len(data), 16):
        blk = bytes(a ^ b for a, b in zip(data[i:i + 16], prev))
        prev = encrypt_block(ks, blk)
        out += prev
    return bytes(out)


def cbc_decrypt(key: bytes, iv: bytes,
                ciphertext: bytes) -> "bytes | None":
    """Inverse of cbc_encrypt; None on malformed length or padding
    (the caller treats the stream as corrupt and quarantines)."""
    if len(ciphertext) % 16 or not ciphertext:
        return None
    ks = _expand_key(key)
    out, prev = bytearray(), iv
    for i in range(0, len(ciphertext), 16):
        blk = ciphertext[i:i + 16]
        out += bytes(a ^ b for a, b in
                     zip(decrypt_block(ks, blk), prev))
        prev = blk
    pad = out[-1]
    if not 1 <= pad <= 16 or out[-pad:] != bytes([pad]) * pad:
        return None
    return bytes(out[:-pad])
