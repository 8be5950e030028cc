"""Pure-stdlib PNG codec (encode + decode) for the multimodal decode
stage.

The sandbox has no PIL/imageio, but PNG's core is just zlib + per-
scanline prediction filters (RFC 2083 / ISO 15948 §9), both fully
expressible with the stdlib — so the image-decode stage of the
multimodal pipeline can be REAL rather than stubbed: parse IHDR,
concatenate IDAT, inflate, reverse the per-row filter (None/Sub/Up/
Average/Paeth), and hash the recovered raw pixels. Reference parity:
extract-kit treats images as opaque attachments and never decodes
pixels (pdf-processor renders via an external AI-vision call), so this
stage is an EXTENSION for the training-data-pipeline tier, not a port.

Scope (deliberate): 8-bit depth, color types 0 (gray), 2 (RGB) and
6 (RGBA), no interlace (Adam7 rejected as unsupported, never
misdecoded), ancillary chunks skipped, CRCs validated. That covers
what the deterministic fixtures emit and what a production ingest
would normalize to; everything else returns a typed unsupported
status instead of garbage pixels.

Encode exists so tests and fixtures can synthesize images with EVERY
filter type — decode correctness is pinned by the twin property that
the same pixels encoded under different filters (and different zlib
levels) decode to the identical pixel hash.
"""

from __future__ import annotations

import struct
import zlib

_MAGIC = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # color_type -> samples/pixel


class PngError(ValueError):
    """Structurally-invalid or out-of-scope PNG; callers map this to a
    typed 'unsupported'/'corrupt' status, never a crash."""


#: Decode-bomb guard (r5): a hostile IHDR can declare 2^31-px dims, and
#: a 100 KB IDAT can inflate to GBs (zip bomb) — both executor-OOM
#: vectors in a decode task. Dimensions are capped BEFORE any
#: allocation and the inflate is byte-bounded to the declared raster
#: size, so memory is O(declared image), never O(attacker's choice).
MAX_PIXELS = 64 << 20


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def encode_png(width: int, height: int, pixels: bytes,
               color_type: int = 2, filter_type: int = 0,
               level: int = 6) -> bytes:
    """Encode raw 8-bit pixels (row-major, no padding) as a PNG, using
    ``filter_type`` (0-4) on every scanline — exercising each inverse-
    filter path in decode_png is the point."""
    ch = _CHANNELS.get(color_type)
    if ch is None:
        raise PngError(f"unsupported color type {color_type}")
    stride = width * ch
    if len(pixels) != stride * height:
        raise PngError("pixel buffer does not match dims")
    raw = bytearray()
    prev = bytes(stride)
    for y in range(height):
        row = pixels[y * stride:(y + 1) * stride]
        raw.append(filter_type)
        if filter_type == 0:    # None
            raw += row
        elif filter_type == 1:  # Sub
            raw += bytes((row[i] - (row[i - ch] if i >= ch else 0)) & 0xFF
                         for i in range(stride))
        elif filter_type == 2:  # Up
            raw += bytes((row[i] - prev[i]) & 0xFF for i in range(stride))
        elif filter_type == 3:  # Average
            raw += bytes((row[i] - (((row[i - ch] if i >= ch else 0)
                                     + prev[i]) >> 1)) & 0xFF
                         for i in range(stride))
        elif filter_type == 4:  # Paeth
            raw += bytes((row[i] - _paeth(row[i - ch] if i >= ch else 0,
                                          prev[i],
                                          prev[i - ch] if i >= ch else 0))
                         & 0xFF for i in range(stride))
        else:
            raise PngError(f"bad filter type {filter_type}")
        prev = row
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (_MAGIC + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(raw), level))
            + _chunk(b"IEND", b""))


def decode_png(payload: bytes) -> dict:
    """PNG bytes -> {width, height, bit_depth, color_type, channels,
    pixels: bytes}. Raises PngError on anything structurally wrong or
    out of scope (CRC mismatch, interlace, 16-bit, palette)."""
    if not payload.startswith(_MAGIC):
        raise PngError("bad magic")
    pos = len(_MAGIC)
    width = height = None
    bit_depth = color_type = ch = 0
    idat = bytearray()
    seen_end = False
    while pos + 8 <= len(payload):
        (ln,) = struct.unpack(">I", payload[pos:pos + 4])
        tag = payload[pos + 4:pos + 8]
        body = payload[pos + 8:pos + 8 + ln]
        if len(body) != ln or pos + 12 + ln > len(payload):
            raise PngError("truncated chunk")
        (crc,) = struct.unpack(">I", payload[pos + 8 + ln:pos + 12 + ln])
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise PngError(f"crc mismatch in {tag!r}")
        if tag == b"IHDR":
            (width, height, bit_depth, color_type,
             comp, filt, interlace) = struct.unpack(">IIBBBBB", body)
            if bit_depth != 8:
                raise PngError(f"unsupported bit depth {bit_depth}")
            if color_type not in _CHANNELS:
                raise PngError(f"unsupported color type {color_type}")
            if interlace:
                raise PngError("interlaced (Adam7) unsupported")
            if comp or filt:
                raise PngError("nonstandard compression/filter method")
            ch = _CHANNELS[color_type]
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            seen_end = True
            break
        pos += 12 + ln
    if width is None or not seen_end:
        raise PngError("missing IHDR or IEND")
    if width * height > MAX_PIXELS:
        raise PngError(
            f"image too large: {width}x{height} > {MAX_PIXELS} px")
    stride = width * ch
    expected = (stride + 1) * height
    d = zlib.decompressobj()
    try:
        # byte-bounded inflate: never materializes more than the
        # declared raster + 1 probe byte, whatever the IDAT claims
        raw = d.decompress(bytes(idat), expected + 1)
    except zlib.error as e:
        raise PngError(f"idat inflate failed: {e}") from None
    if len(raw) != expected or d.unconsumed_tail \
            or d.decompress(b"", 1):
        raise PngError("decompressed size mismatch")
    out = bytearray()
    prev = bytes(stride)
    for y in range(height):
        ft = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1:(y + 1) * (stride + 1)])
        if ft == 1:    # Sub
            for i in range(ch, stride):
                line[i] = (line[i] + line[i - ch]) & 0xFF
        elif ft == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ft == 3:  # Average
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                c = prev[i - ch] if i >= ch else 0
                line[i] = (line[i] + _paeth(a, prev[i], c)) & 0xFF
        elif ft != 0:
            raise PngError(f"bad scanline filter {ft}")
        out += line
        prev = bytes(line)
    return {"width": width, "height": height, "bit_depth": bit_depth,
            "color_type": color_type, "channels": ch,
            "pixels": bytes(out)}
