"""Pure-stdlib baseline JPEG codec for the multimodal decode stage.

The sandbox has no PIL, but baseline sequential JPEG (ITU-T T.81 /
ISO 10918-1) is fully expressible with the stdlib: marker parse
(DQT/DHT/SOF0/DRI/SOS), canonical Huffman entropy decode with byte
unstuffing and restart markers, dequantize + dezigzag, an 8-point
separable float IDCT built on HARD-CODED cosine doubles (no libm call,
so results cannot vary across platforms' libm), chroma upsampling by
pixel replication, and the T.871 integer-rounded YCbCr→RGB transform.
JPEG is the dominant image format of the crawled web, so at 100 TB
this closes the biggest ``unsupported`` slice of ``mm_decode``;
reference parity is moot (extract-kit never decodes pixels —
`pdf-processor` feeds an external AI-vision call), so like kernels/png
this is an extension for the training-data tier, not a port.

Scope (deliberate): baseline + extended-sequential Huffman 8-bit
(SOF0/SOF1), grayscale or 3-component YCbCr, any sampling factors up
to 2x2 (4:4:4, 4:2:2, 4:2:0), restart intervals. Progressive (SOF2),
arithmetic coding (SOF9+), hierarchical, 12-bit and CMYK return a
typed ``JpegError`` — never garbage pixels.

Determinism: every float step is fixed-order IEEE arithmetic on
hard-coded constants; rounding is floor(x + 0.5) everywhere (no
banker's rounding, no libm). Two decodes of the same bytes — any
platform, any partitioning — produce identical pixel buffers.

The ENCODER exists so tests and fixtures can synthesize deterministic
JPEGs (the kernels/png.py philosophy): forward DCT on the same
constant table, libjpeg-formula quality scaling of the Annex K quant
tables, optional 2x2 chroma subsampling (box mean), and per-image
canonical Huffman tables built as FIXED-LENGTH codes over the symbols
actually used (always a valid prefix code, all-ones codeword unused —
spec-conformant, merely uncompressed). Decode correctness is pinned in
tests by analytic flat-block cases, an independently hand-assembled
single-MCU file, and encode→decode tolerance bounds.
"""

from __future__ import annotations

import struct

ZIGZAG = (
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63)

# Annex K.1/K.2 reference quantization tables (natural order)
QUANT_LUM = (
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99)
QUANT_CHROMA = (
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99)

# cos(k*pi/16) as exactly-rounded doubles — hard-coded so no libm call
# can introduce platform variance into the IDCT
_C = (1.0,
      0.9807852804032304, 0.9238795325112867, 0.8314696123025452,
      0.7071067811865476, 0.5555702330196023, 0.38268343236508984,
      0.19509032201612833)
_INV_SQRT2 = 0.7071067811865476

# idct basis: _COS[u][x] = cu/2 * cos((2x+1) u pi / 16), built from the
# constant table via the cosine recurrence-free index map
# cos((2x+1)u pi/16) = +-cos(m pi/16) with m = (2x+1)u mod 32 folded
_COS = []
for u in range(8):
    cu = _INV_SQRT2 if u == 0 else 1.0
    row = []
    for x in range(8):
        m = ((2 * x + 1) * u) % 32
        if m > 16:
            m = 32 - m
            # cos is even around 0 and odd around pi/2: fold to [0,16]
        s = 1.0
        if m > 8:
            m = 16 - m
            s = -1.0
        row.append(0.5 * cu * s * _C[m] if m <= 7 else 0.0)
    _COS.append(tuple(row))
_COS = tuple(_COS)


class JpegError(ValueError):
    """Structurally-invalid or out-of-scope JPEG; callers map this to
    a typed 'unsupported'/'corrupt' status, never a crash."""


#: Decode-bomb guard: a corrupt/hostile SOF can declare 65535x65535
#: (12 GB of planes) while carrying no real data — an executor-OOM
#: vector in a decode task. 64 MPx covers any real web image; larger
#: frames quarantine as typed errors before any allocation.
MAX_PIXELS = 64 << 20


def _clamp(v: int) -> int:
    return 0 if v < 0 else (255 if v > 255 else v)


def _idct8x8(coef: list[float]) -> list[int]:
    """Separable 2-D inverse DCT + level shift + clamp. Fixed
    operation order (rows then columns, u ascending) on the constant
    basis — bit-deterministic."""
    tmp = [0.0] * 64
    for y in range(8):
        base = 8 * y
        row = coef[base:base + 8]
        for x in range(8):
            acc = 0.0
            for u in range(8):
                acc += row[u] * _COS[u][x]
            tmp[base + x] = acc
    out = [0] * 64
    for x in range(8):
        col = [tmp[8 * v + x] for v in range(8)]
        for y in range(8):
            acc = 0.0
            for v in range(8):
                acc += col[v] * _COS[v][y]
            px = int((acc + 128.0 + 0.5) // 1)  # floor(x+0.5)
            out[8 * y + x] = _clamp(px)
    return out


def _fdct8x8(samples: list[int]) -> list[float]:
    """Forward 2-D DCT (encoder twin of _idct8x8), same basis/order."""
    shifted = [s - 128.0 for s in samples]
    tmp = [0.0] * 64
    for u in range(8):
        for y in range(8):
            acc = 0.0
            row = shifted[8 * y:8 * y + 8]
            for x in range(8):
                acc += row[x] * _COS[u][x]
            tmp[8 * y + u] = acc
    out = [0.0] * 64
    for u in range(8):
        for v in range(8):
            acc = 0.0
            for y in range(8):
                acc += tmp[8 * y + u] * _COS[v][y]
            out[8 * v + u] = acc
    return out


class _HuffTable:
    __slots__ = ("lookup",)

    def __init__(self, counts: bytes, symbols: bytes):
        if len(counts) != 16 or sum(counts) != len(symbols):
            raise JpegError("malformed DHT segment")
        self.lookup = {}
        code = 0
        k = 0
        for ln in range(1, 17):
            for _ in range(counts[ln - 1]):
                self.lookup[(ln, code)] = symbols[k]
                code += 1
                k += 1
            code <<= 1


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    unstuffing; stops (sticky) at any real marker."""
    __slots__ = ("data", "pos", "acc", "nbits", "hit_marker")

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.hit_marker = False

    def _fill(self) -> None:
        if self.hit_marker or self.pos >= len(self.data):
            # pad with 1-bits past the end (T.81 F.2.2.5 convention)
            self.acc = (self.acc << 8) | 0xFF
            self.nbits += 8
            self.hit_marker = True
            return
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1] if self.pos + 1 < len(
                self.data) else 0xD9
            if nxt == 0x00:
                self.pos += 2
            else:
                self.hit_marker = True
                self.acc = (self.acc << 8) | 0xFF
                self.nbits += 8
                return
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_restart(self, expect: int) -> None:
        """Byte-align and consume the RSTn marker at a restart
        boundary."""
        self.nbits = 0
        self.hit_marker = False
        d, p = self.data, self.pos
        # tolerate fill bytes before the marker
        while p + 1 < len(d) and d[p] == 0xFF and d[p + 1] == 0xFF:
            p += 1
        if p + 1 >= len(d) or d[p] != 0xFF or d[p + 1] != 0xD0 + expect:
            raise JpegError("missing/unexpected restart marker")
        self.pos = p + 2

    def decode_huff(self, table: _HuffTable) -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.lookup.get((ln, code))
            if sym is not None:
                return sym
        raise JpegError("invalid huffman code in entropy stream")


def _extend(v: int, s: int) -> int:
    """T.81 F.12: map a RECEIVE'd magnitude to its signed value."""
    if s == 0:
        return 0
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def decode_jpeg(payload: bytes) -> dict:
    """JPEG bytes → {width, height, bit_depth, channels,
    pixels: bytes} (gray: 1 byte/px, color: interleaved RGB).
    Raises JpegError on anything structurally wrong or out of scope
    (progressive, arithmetic, 12-bit, >2x sampling, CMYK) — including
    low-level truncation surfacing as struct/index errors."""
    try:
        return _decode_jpeg(payload)
    except (struct.error, IndexError) as e:
        raise JpegError(f"truncated/corrupt structure: {e}") from None


def _decode_jpeg(payload: bytes) -> dict:
    if payload[:2] != b"\xff\xd8":
        raise JpegError("bad SOI magic")
    qt: dict[int, list[int]] = {}
    huff_dc: dict[int, _HuffTable] = {}
    huff_ac: dict[int, _HuffTable] = {}
    dri = 0
    frame = None
    pos = 2
    n = len(payload)
    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            raise JpegError(f"expected marker at {pos}")
        marker = payload[pos + 1]
        if marker == 0xFF:       # fill byte
            pos += 1
            continue
        if marker == 0xD9:       # EOI before any scan
            raise JpegError("EOI before SOS")
        (seg_len,) = struct.unpack(">H", payload[pos + 2:pos + 4])
        body = payload[pos + 4:pos + 2 + seg_len]
        if len(body) != seg_len - 2:
            raise JpegError("truncated segment")
        if marker == 0xDB:       # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                i += 1
                if pq == 0:
                    vals = list(body[i:i + 64])
                    i += 64
                else:            # 16-bit table
                    vals = [struct.unpack(
                        ">H", body[i + 2 * k:i + 2 * k + 2])[0]
                        for k in range(64)]
                    i += 128
                if len(vals) != 64 or (pq == 0 and i > len(body) + 0):
                    raise JpegError("truncated DQT")
                tbl = [0] * 64
                for z in range(64):
                    tbl[ZIGZAG[z]] = vals[z]
                qt[tq] = tbl
        elif marker == 0xC4:     # DHT
            i = 0
            while i + 17 <= len(body):
                tc, th = body[i] >> 4, body[i] & 0x0F
                counts = body[i + 1:i + 17]
                nsym = sum(counts)
                symbols = body[i + 17:i + 17 + nsym]
                (huff_dc if tc == 0 else huff_ac)[th] = _HuffTable(
                    counts, symbols)
                i += 17 + nsym
        elif marker in (0xC0, 0xC1):  # SOF0/SOF1: sequential huffman
            prec, h, w, ncomp = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise JpegError(f"unsupported precision {prec}")
            if ncomp not in (1, 3):
                raise JpegError(f"unsupported component count {ncomp}")
            if len(body) < 6 + 3 * ncomp:
                raise JpegError("truncated SOF component specs")
            comps = []
            for c in range(ncomp):
                cid, samp, tq = body[6 + 3 * c:9 + 3 * c]
                hs, vs = samp >> 4, samp & 0x0F
                if not (1 <= hs <= 2 and 1 <= vs <= 2):
                    raise JpegError(
                        f"unsupported sampling {hs}x{vs}")
                comps.append({"id": cid, "h": hs, "v": vs, "tq": tq})
            frame = {"w": w, "h": h, "comps": comps}
        elif marker == 0xC2:
            raise JpegError("progressive JPEG unsupported")
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise JpegError(
                f"unsupported SOF marker 0x{marker:02x}")
        elif marker == 0xDD:     # DRI
            (dri,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:     # SOS — entropy data follows
            if frame is None:
                raise JpegError("SOS before SOF")
            ns = body[0]
            scan = []
            for c in range(ns):
                cs, tt = body[1 + 2 * c], body[2 + 2 * c]
                comp = next((x for x in frame["comps"]
                             if x["id"] == cs), None)
                if comp is None:
                    raise JpegError("SOS names unknown component")
                scan.append((comp, tt >> 4, tt & 0x0F))
            if len(scan) != len(frame["comps"]):
                raise JpegError(
                    "multi-scan baseline unsupported")
            return _decode_scan(payload, pos + 2 + seg_len, frame,
                                scan, qt, huff_dc, huff_ac, dri)
        # APPn/COM/others: skipped
        pos += 2 + seg_len
    raise JpegError("no SOS marker found")


def _decode_scan(payload, pos, frame, scan, qt, huff_dc, huff_ac,
                 dri) -> dict:
    w, h, comps = frame["w"], frame["h"], frame["comps"]
    if w == 0 or h == 0:
        raise JpegError("zero dimension")
    if w * h > MAX_PIXELS:
        raise JpegError(f"frame too large: {w}x{h} > {MAX_PIXELS} px")
    if len(comps) == 1:
        # T.81 A.2: a single-component scan is NON-interleaved — the
        # MCU is one data unit and the declared sampling factors do
        # not affect the raster layout, so gray files that keep e.g.
        # 2x2 luma factors must decode identically to 1x1. Mutate in
        # place: the scan tuples alias these dicts.
        comps[0]["h"] = comps[0]["v"] = 1
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = []
    for c in comps:
        if c["tq"] not in qt:
            raise JpegError(f"missing quant table {c['tq']}")
        pw, ph = mcux * 8 * c["h"], mcuy * 8 * c["v"]
        planes.append(bytearray(pw * ph))
    bits = _BitReader(payload, pos)
    preds = [0] * len(comps)
    rst = 0
    n_mcu = mcux * mcuy
    for m in range(n_mcu):
        if dri and m and m % dri == 0:
            bits.align_restart(rst)
            rst = (rst + 1) & 7
            preds = [0] * len(comps)
        for c, td, ta in scan:
            # plane/predictor index by FRAME component order — the
            # scan may list components in any order
            ci = comps.index(c)
            if td not in huff_dc or ta not in huff_ac:
                raise JpegError("scan references missing DHT table")
            q = qt[c["tq"]]
            for by in range(c["v"]):
                for bx in range(c["h"]):
                    coef = [0.0] * 64
                    t = bits.decode_huff(huff_dc[td])
                    if t > 11:
                        raise JpegError("DC category out of range")
                    diff = _extend(bits.receive(t), t)
                    preds[ci] += diff
                    coef[0] = preds[ci] * q[0]
                    k = 1
                    while k < 64:
                        rs = bits.decode_huff(huff_ac[ta])
                        r, s = rs >> 4, rs & 0x0F
                        if s == 0:
                            if r == 15:
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise JpegError("AC run past block end")
                        nat = ZIGZAG[k]
                        coef[nat] = _extend(bits.receive(s), s) \
                            * q[nat]
                        k += 1
                    if bits.hit_marker and m < n_mcu - 1 \
                            and not (dri and (m + 1) % dri == 0):
                        raise JpegError(
                            "entropy stream ended early")
                    block = _idct8x8(coef)
                    pw = mcux * 8 * c["h"]
                    x0 = (m % mcux) * 8 * c["h"] + 8 * bx
                    y0 = (m // mcux) * 8 * c["v"] + 8 * by
                    plane = planes[ci]
                    for yy in range(8):
                        row0 = (y0 + yy) * pw + x0
                        plane[row0:row0 + 8] = bytes(
                            block[8 * yy:8 * yy + 8])
    # upsample to full resolution by replication and color-convert
    if len(comps) == 1:
        pw = mcux * 8
        out = bytearray(w * h)
        for y in range(h):
            out[y * w:(y + 1) * w] = planes[0][y * pw:y * pw + w]
        return {"width": w, "height": h, "bit_depth": 8,
                "channels": 1, "pixels": bytes(out)}
    full = []
    for ci, c in enumerate(comps):
        sx, sy = hmax // c["h"], vmax // c["v"]
        pw = mcux * 8 * c["h"]
        if sx == 1 and sy == 1:
            full.append((planes[ci], pw, 1, 1))
        else:
            full.append((planes[ci], pw, sx, sy))
    out = bytearray(w * h * 3)
    py, pcb, pcr = full
    for y in range(h):
        for x in range(w):
            yv = py[0][(y // py[3]) * py[1] + (x // py[2])]
            cb = pcb[0][(y // pcb[3]) * pcb[1] + (x // pcb[2])] - 128
            cr = pcr[0][(y // pcr[3]) * pcr[1] + (x // pcr[2])] - 128
            i = (y * w + x) * 3
            out[i] = _clamp(int((yv + 1.402 * cr + 0.5) // 1))
            out[i + 1] = _clamp(int((yv - 0.344136 * cb
                                     - 0.714136 * cr + 0.5) // 1))
            out[i + 2] = _clamp(int((yv + 1.772 * cb + 0.5) // 1))
    return {"width": w, "height": h, "bit_depth": 8, "channels": 3,
            "pixels": bytes(out)}


# -- encoder (tests + fixtures) -----------------------------------------------

def _quality_tables(quality: int) -> tuple[list[int], list[int]]:
    """libjpeg quality scaling of the Annex K tables."""
    quality = max(1, min(100, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    out = []
    for base in (QUANT_LUM, QUANT_CHROMA):
        out.append([max(1, min(255, (v * scale + 50) // 100))
                    for v in base])
    return out[0], out[1]


def _quantize(x: float, q: int) -> int:
    """Round-half-away-from-zero of x/q (T.81 convention)."""
    r = x / q
    return int((r + 0.5) // 1) if r >= 0 else -int((-r + 0.5) // 1)


class _FixedCodes:
    """Fixed-length canonical Huffman code over the used symbol set:
    all symbols get length L = ceil(log2(n+1)) — a valid prefix code
    whose all-ones codeword is never assigned (spec-friendly), chosen
    for construction simplicity, not compression."""

    def __init__(self, used: set[int]):
        syms = sorted(used) or [0]
        ln = 1
        while (1 << ln) - 1 < len(syms):
            ln += 1
        self.length = ln
        self.codes = {s: i for i, s in enumerate(syms)}
        self.counts = bytes(len(syms) if i == ln else 0
                            for i in range(1, 17))
        self.symbols = bytes(syms)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def pad_byte(self) -> None:
        """Pad to a byte boundary with 1-bits (T.81 fill bits)."""
        if self.n:
            self.acc = (self.acc << (8 - self.n)) | ((1 << (8 - self.n))
                                                     - 1)
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.n = 0

    def marker(self, m: int) -> None:
        self.pad_byte()
        self.out += bytes([0xFF, m])

    def flush(self) -> bytes:
        self.pad_byte()
        return bytes(self.out)


def _block_symbols(qcoef: list[int]) -> tuple[int, list]:
    """(dc_category, [(runsize, extra_bits_value, nbits), ...]) for one
    quantized block in zigzag order; DC handled by the caller."""
    acs = []
    run = 0
    last = 63
    while last > 0 and qcoef[ZIGZAG[last]] == 0:
        last -= 1
    for k in range(1, last + 1):
        v = qcoef[ZIGZAG[k]]
        if v == 0:
            run += 1
            continue
        while run > 15:
            acs.append((0xF0, 0, 0))
            run -= 16
        s = _category(v)
        acs.append(((run << 4) | s, _bits_of(v, s), s))
        run = 0
    if last < 63:
        acs.append((0x00, 0, 0))  # EOB
    return acs


def _category(v: int) -> int:
    a = abs(v)
    s = 0
    while a:
        a >>= 1
        s += 1
    return s


def _bits_of(v: int, s: int) -> int:
    return v if v >= 0 else v + (1 << s) - 1


def encode_jpeg(width: int, height: int, pixels: bytes,
                channels: int = 3, quality: int = 90,
                subsample: bool = False,
                restart_interval: int = 0) -> bytes:
    """Encode raw 8-bit pixels (gray, or interleaved RGB) as a
    baseline JFIF JPEG. ``subsample=True`` uses 2x2 chroma (4:2:0, box
    mean); gray images are single-component; ``restart_interval`` > 0
    emits DRI + RSTn markers with DC-predictor resets (exercising the
    decoder's restart path). Deterministic: fixed tables, fixed-order
    float DCT on hard-coded constants."""
    if channels not in (1, 3):
        raise JpegError(f"unsupported channel count {channels}")
    if len(pixels) != width * height * channels:
        raise JpegError("pixel buffer does not match dims")
    qlum, qchr = _quality_tables(quality)

    # color convert + plane split (T.871 forward transform)
    if channels == 1:
        comp_planes = [(list(pixels), width, height)]
        comp_meta = [{"id": 1, "h": 1, "v": 1, "tq": 0}]
        qts = [qlum]
    else:
        ys, cbs, crs = [], [], []
        for i in range(0, len(pixels), 3):
            r, g, b = pixels[i], pixels[i + 1], pixels[i + 2]
            ys.append(_clamp(int((0.299 * r + 0.587 * g + 0.114 * b
                                  + 0.5) // 1)))
            cbs.append(_clamp(int((128 - 0.168736 * r - 0.331264 * g
                                   + 0.5 * b + 0.5) // 1)))
            crs.append(_clamp(int((128 + 0.5 * r - 0.418688 * g
                                   - 0.081312 * b + 0.5) // 1)))
        if subsample:
            cw, chh = (width + 1) // 2, (height + 1) // 2
            def box(src):
                out = []
                for yy in range(chh):
                    for xx in range(cw):
                        acc = cnt = 0
                        for dy in (0, 1):
                            for dx in (0, 1):
                                sy, sx = 2 * yy + dy, 2 * xx + dx
                                if sy < height and sx < width:
                                    acc += src[sy * width + sx]
                                    cnt += 1
                        out.append(int((acc / cnt + 0.5) // 1))
                return out
            comp_planes = [(ys, width, height),
                           (box(cbs), cw, chh), (box(crs), cw, chh)]
            comp_meta = [{"id": 1, "h": 2, "v": 2, "tq": 0},
                         {"id": 2, "h": 1, "v": 1, "tq": 1},
                         {"id": 3, "h": 1, "v": 1, "tq": 1}]
        else:
            comp_planes = [(ys, width, height), (cbs, width, height),
                           (crs, width, height)]
            comp_meta = [{"id": 1, "h": 1, "v": 1, "tq": 0},
                         {"id": 2, "h": 1, "v": 1, "tq": 1},
                         {"id": 3, "h": 1, "v": 1, "tq": 1}]
        qts = [qlum, qchr]

    hmax = max(c["h"] for c in comp_meta)
    vmax = max(c["v"] for c in comp_meta)
    mcux = (width + 8 * hmax - 1) // (8 * hmax)
    mcuy = (height + 8 * vmax - 1) // (8 * vmax)

    def sample(plane, pw, ph, x, y):
        return plane[min(y, ph - 1) * pw + min(x, pw - 1)]

    # quantize every block first (two passes: gather symbols → write)
    mcu_blocks = []   # [(mcu_idx, comp_idx, table, dc_diff, qcoef)]
    preds = [0] * len(comp_meta)
    dc_used = [set() for _ in range(2)]
    ac_used = [set() for _ in range(2)]
    for m in range(mcux * mcuy):
        if restart_interval and m and m % restart_interval == 0:
            preds = [0] * len(comp_meta)
        for ci, c in enumerate(comp_meta):
            plane, pw, ph = comp_planes[ci]
            q = qts[c["tq"]]
            for by in range(c["v"]):
                for bx in range(c["h"]):
                    x0 = (m % mcux) * 8 * c["h"] + 8 * bx
                    y0 = (m // mcux) * 8 * c["v"] + 8 * by
                    blk = [sample(plane, pw, ph, x0 + xx, y0 + yy)
                           for yy in range(8) for xx in range(8)]
                    coef = _fdct8x8(blk)
                    qc = [_quantize(coef[i], q[i]) for i in range(64)]
                    t = 0 if len(comp_meta) == 1 else (0 if ci == 0
                                                       else 1)
                    diff = qc[0] - preds[ci]
                    preds[ci] = qc[0]
                    dc_used[t].add(_category(diff))
                    for rs, _, _ in _block_symbols(qc):
                        ac_used[t].add(rs)
                    mcu_blocks.append((m, ci, t, diff, qc))
    dc_tabs = [_FixedCodes(u) for u in dc_used]
    ac_tabs = [_FixedCodes(u) for u in ac_used]

    bw = _BitWriter()
    prev_m = 0
    for m, ci, t, diff, qc in mcu_blocks:
        if restart_interval and m != prev_m \
                and m % restart_interval == 0:
            bw.marker(0xD0 + ((m // restart_interval - 1) & 7))
        prev_m = m
        s = _category(diff)
        bw.write(dc_tabs[t].codes[s], dc_tabs[t].length)
        if s:
            bw.write(_bits_of(diff, s), s)
        for rs, extra, nbits in _block_symbols(qc):
            bw.write(ac_tabs[t].codes[rs], ac_tabs[t].length)
            if nbits:
                bw.write(extra, nbits)
    entropy = bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(
            ">H", len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for tq, q in enumerate(qts):
        zz = bytes(q[ZIGZAG[z]] for z in range(64))
        out += seg(0xDB, bytes([tq]) + zz)
    if restart_interval:
        out_dri = struct.pack(">H", restart_interval)
    sof = struct.pack(">BHHB", 8, height, width, len(comp_meta))
    for c in comp_meta:
        sof += bytes([c["id"], (c["h"] << 4) | c["v"], c["tq"]])
    out += seg(0xC0, sof)
    for t, tab in enumerate(dc_tabs):
        out += seg(0xC4, bytes([t]) + tab.counts + tab.symbols)
    for t, tab in enumerate(ac_tabs):
        out += seg(0xC4, bytes([0x10 | t]) + tab.counts + tab.symbols)
    if restart_interval:
        out += seg(0xDD, out_dri)
    sos = bytes([len(comp_meta)])
    for ci, c in enumerate(comp_meta):
        t = 0 if len(comp_meta) == 1 else (0 if ci == 0 else 1)
        sos += bytes([c["id"], (t << 4) | t])
    sos += b"\x00\x3f\x00"
    out += seg(0xDA, sos)
    out += entropy
    out += b"\xff\xd9"
    return bytes(out)
