"""PDF standard-security-handler decryption (PDF 32000-1 §7.6.2–
7.6.4) — pure stdlib (hashlib.md5, a 20-line RC4, and kernels/aes.py
for AESV2), no crypto deps.

Scope (deliberately the high-volume slice of the encrypted web-PDF
population): /Filter /Standard with /V 1, 2 (RC4 40–128 bit, R 2/3)
or /V 4 crypt filters (/CFM /AESV2 = AES-128-CBC, or /CFM /V2 =
RC4-128, R 4), EMPTY user password — the "owner-locked but
world-readable" documents that dominate encrypted PDFs found by
crawlers (they open in any viewer; the owner password only gates
editing). Anything else — user-password-protected, /V 5 R 6
(AES-256, a different key-derivation entirely), Identity/unknown
crypt filters — returns None and the caller quarantines, which is
still strictly ahead of the reference (it rejects every encrypted
file: `pdf-processor/src/core/file-processor.ts:46-49` isValidPDF →
reject).

Design: ``decrypt_payload`` rewrites the WHOLE file in place — every
stream's data bytes are replaced by their plaintext. RC4 is
length-preserving, so the decrypted file is byte-layout-identical
(every offset, /Length and xref slot still true) and the entire
existing parser runs on it unchanged; no decryption state threads
through the interpreter. AES-CBC plaintext is SHORTER than
IV+ciphertext, so the AES path keeps the layout by space-filling the
tail of each stream slot and re-patching direct /Length values
within their own digit span (see transform_streams). Document-level STRINGS outside streams are
not rewritten — extraction reads text exclusively from content/CMap
streams, so plaintext metadata strings are never consumed (documented
scope cut, not an oversight).

Key-schedule notes (Algorithms 2–6 of the spec, implemented verbatim):
the padded password + /O + P(le32) + /ID[0] MD5 chain, the 50-fold MD5
stretch and the 19-fold XOR-keyed RC4 cascade for R3, per-object keys
MD5(key ‖ num_le3 ‖ gen_le2)[:min(n+5,16)]. The user password is
VERIFIED against /U (Algorithm 6) before any decryption — a wrong
derivation can't silently emit ciphertext-garbage text; it fails the
check and quarantines. RC4 itself is pinned against the RFC 6229 test
vectors in tests/test_kernels.py.
"""

from __future__ import annotations

import hashlib
import re
import struct

PAD = bytes([
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
    0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
    0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A])

_ENCRYPT_REF_RE = re.compile(rb"/Encrypt\s+(\d+)\s+(\d+)\s+R")
_ID_RE = re.compile(rb"/ID\s*\[\s*<([0-9A-Fa-f]*)>")
_NUM_RE = {k: re.compile(rb"/" + k + rb"\s+(-?\d+)")
           for k in (b"V", b"R", b"Length", b"P")}
_STR_RE = {k: re.compile(rb"/" + k + rb"\s*(<[0-9A-Fa-f\s]*>|\()")
           for k in (b"O", b"U")}
_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")
_STREAM_RE = re.compile(rb"<<((?:[^<>]|<<[^>]*>>)*?)>>\s*stream\r?\n")
_LENGTH_RE = re.compile(rb"/Length\s+(\d+)(?!\s+\d+\s+R)")
_ESCAPES = {b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b",
            b"f": b"\f", b"(": b"(", b")": b")", b"\\": b"\\"}


def rc4(key: bytes, data: bytes) -> bytes:
    """RC4 stream cipher (symmetric: same call encrypts/decrypts)."""
    s = list(range(256))
    j = 0
    for i in range(256):
        j = (j + s[i] + key[i % len(key)]) & 0xFF
        s[i], s[j] = s[j], s[i]
    out = bytearray(len(data))
    i = j = 0
    for k, c in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + s[i]) & 0xFF
        s[i], s[j] = s[j], s[i]
        out[k] = c ^ s[(s[i] + s[j]) & 0xFF]
    return bytes(out)


def _pad_pw(pw: bytes) -> bytes:
    return (pw + PAD)[:32]


def _pdf_string(payload: bytes, m: "re.Match") -> "bytes | None":
    """Decode the /O-/U-style string starting at m.group(1): hex form
    (already captured) or literal form with the standard escapes."""
    tok = m.group(1)
    if tok.startswith(b"<"):
        hx = re.sub(rb"[\s<>]", b"", tok)
        if len(hx) % 2:
            hx += b"0"
        return bytes.fromhex(hx.decode("ascii"))
    out, i = bytearray(), m.end()
    depth = 1
    while i < len(payload):
        c = payload[i:i + 1]
        if c == b"\\":
            nxt = payload[i + 1:i + 2]
            if nxt in _ESCAPES:
                out += _ESCAPES[nxt]
                i += 2
                continue
            om = re.match(rb"\\([0-7]{1,3})", payload[i:i + 4])
            if om:
                out.append(int(om.group(1), 8) & 0xFF)
                i += 1 + len(om.group(1))
                continue
            i += 1  # lone backslash: dropped per spec
            continue
        if c == b"(":
            depth += 1
        elif c == b")":
            depth -= 1
            if depth == 0:
                return bytes(out)
        out += c
        i += 1
    return None


def file_key(o: bytes, p: int, id0: bytes, r: int, n: int,
             user_pw: bytes = b"",
             encrypt_metadata: bool = True) -> bytes:
    """Algorithm 2: the file encryption key from the USER password."""
    tail = b"" if encrypt_metadata or r < 4 else b"\xff\xff\xff\xff"
    h = hashlib.md5(_pad_pw(user_pw) + o[:32]
                    + struct.pack("<I", p & 0xFFFFFFFF) + id0 + tail)
    key = h.digest()
    if r >= 3:
        for _ in range(50):
            key = hashlib.md5(key[:n]).digest()
    return key[:n]


def _user_check_bytes(key: bytes, id0: bytes, r: int) -> bytes:
    """Algorithms 4/5: the /U value implied by ``key``."""
    if r == 2:
        return rc4(key, PAD)
    u = rc4(key, hashlib.md5(PAD + id0).digest())
    for i in range(1, 20):
        u = rc4(bytes(b ^ i for b in key), u)
    return u


def owner_value(owner_pw: bytes, user_pw: bytes, r: int,
                n: int) -> bytes:
    """Algorithm 3: the /O entry (used by the fixture writer; the
    reader only consumes /O as opaque key material)."""
    h = hashlib.md5(_pad_pw(owner_pw or user_pw)).digest()
    if r >= 3:
        for _ in range(50):
            h = hashlib.md5(h).digest()
    k = h[:n]
    o = rc4(k, _pad_pw(user_pw))
    if r >= 3:
        for i in range(1, 20):
            o = rc4(bytes(b ^ i for b in k), o)
    return o


def object_key(key: bytes, num: int, gen: int,
               aes: bool = False) -> bytes:
    """Algorithm 1: the per-object key (AESV2 appends the spec's
    'sAlT' constant to the MD5 input)."""
    h = hashlib.md5(key + struct.pack("<I", num)[:3]
                    + struct.pack("<I", gen)[:2]
                    + (b"sAlT" if aes else b"")).digest()
    return h[:min(len(key) + 5, 16)]


def _parse_encrypt(payload: bytes):
    """Locate and parse the /Encrypt dictionary and /ID. Returns
    (o, u, p, id0, v, r, n) or None when absent/unsupported."""
    em = _ENCRYPT_REF_RE.search(payload)
    if not em:
        return None
    om = re.search(em.group(1) + rb"\s+" + em.group(2)
                   + rb"\s+obj\b(.*?)endobj", payload, re.DOTALL)
    if not om:
        return None
    body = om.group(1)
    if b"/Standard" not in body:
        return None
    nums = {}
    for k, rx in _NUM_RE.items():
        m = rx.search(body)
        nums[k] = int(m.group(1)) if m else None
    v = nums[b"V"] or 1
    r = nums[b"R"] or 2
    if v not in (1, 2, 4) or r not in (2, 3, 4) \
            or nums[b"P"] is None:
        return None  # V5/R6 (AES-256) stays quarantined
    cfm = b"rc4"
    encrypt_metadata = b"/EncryptMetadata false" not in re.sub(
        rb"\s+", b" ", body)
    if v == 4:
        # the stream/string crypt filter: /CF <</StdCF <</CFM ...>>>>
        cm = re.search(rb"/CFM\s*/(\w+)", body)
        if not cm or cm.group(1) not in (b"AESV2", b"V2"):
            return None  # Identity/unknown filters: quarantine
        cfm = b"aes" if cm.group(1) == b"AESV2" else b"rc4"
    n = (nums[b"Length"] or 40) // 8 if v in (2, 4) else 5
    if cfm == b"aes":
        # AESV2 is AES-128 by definition (PDF 32000-1 §7.6.5): some
        # writers omit the top-level /Length, which would default n to
        # 5 and later trip the AES-128 key-expansion assert. Pin it.
        n = 16
    strs = {}
    for k, rx in _STR_RE.items():
        m = rx.search(body)
        s = _pdf_string(body, m) if m else None
        if s is None:
            return None
        strs[k] = s
    idm = _ID_RE.search(payload)
    id0 = bytes.fromhex(idm.group(1).decode("ascii")) if idm else b""
    return (strs[b"O"], strs[b"U"], nums[b"P"], id0, v, r, n,
            cfm, encrypt_metadata)


def transform_streams(payload: bytes, key: bytes,
                      method: bytes = b"rc4") -> bytes:
    """Transform every stream's data in place with its per-object key.

    RC4 is symmetric and length-preserving: the same call encrypts a
    plaintext file and decrypts a ciphertext one, byte-layout-
    identical. AES (method=b"aes") DECRYPTS: CBC plaintext is always
    >= 17 bytes shorter than IV+ciphertext, so the plaintext is
    written in place, the remainder is filled with spaces (whitespace
    is inert in every stream grammar we parse, and zlib tolerates
    trailing garbage after a complete Flate stream — pinned in
    tests), and a direct /Length value is re-patched within its own
    digit span so offsets and the xref stay true."""
    obj_marks = [(m.start(), int(m.group(1)), int(m.group(2)))
                 for m in _OBJ_RE.finditer(payload)]
    out = bytearray(payload)
    for m in _STREAM_RE.finditer(payload):
        params, start = m.group(1), m.end()
        if re.search(rb"/Type\s*/XRef", params):
            continue  # cross-reference streams are never encrypted
        lm = _LENGTH_RE.search(params)
        if lm:
            end = start + int(lm.group(1))
        else:
            end = payload.find(b"endstream", start)
            if end == -1:
                continue
            if payload[end - 2:end] == b"\r\n":
                end -= 2
            elif payload[end - 1:end] == b"\n":
                end -= 1
        num = gen = 0
        for off, onum, ogen in obj_marks:
            if off > m.start():
                break
            num, gen = onum, ogen
        data = payload[start:end]
        if method == b"aes":
            from .aes import cbc_decrypt
            pt = cbc_decrypt(object_key(key, num, gen, aes=True),
                             data[:16], data[16:])
            if pt is None:
                continue  # corrupt stream: leave it; parser skips
            out[start:start + len(pt)] = pt
            out[start + len(pt):end] = b" " * (end - start - len(pt))
            if lm:
                dig_lo = m.start(1) + lm.start(1)
                dig_hi = m.start(1) + lm.end(1)
                out[dig_lo:dig_hi] = \
                    str(len(pt)).encode("ascii").ljust(
                        dig_hi - dig_lo)
        else:
            out[start:end] = rc4(object_key(key, num, gen), data)
    return bytes(out)


def decrypt_payload(payload: bytes) -> "bytes | None":
    """Decrypt every stream of an RC4-standard-handler PDF in place
    (empty user password). Returns the byte-layout-identical decrypted
    file, or None when the file is password-protected or uses an
    unsupported cipher — the caller quarantines."""
    parsed = _parse_encrypt(payload)
    if parsed is None:
        return None
    o, u, p, id0, _v, r, n, cfm, enc_meta = parsed
    key = file_key(o, p, id0, r, n, encrypt_metadata=enc_meta)
    want = _user_check_bytes(key, id0, r)
    have = u[:32] if r == 2 else u[:16]
    if want[:len(have)] != have:
        return None  # non-empty user password: cannot decrypt
    return transform_streams(payload, key, method=cfm)
