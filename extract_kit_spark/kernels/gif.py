"""Pure-stdlib GIF87a/GIF89a decoder (+ a minimal encoder for test
vectors) — the third major crawled-web image format after JPEG/PNG.

Implements the public GIF89a specification (CompuServe 1990, mirrored
at w3.org/Graphics/GIF/spec-gif89a.txt): logical screen descriptor,
global/local color tables, extension-block skipping (sub-block
framing), 4-pass interlacing, and GIF-variant LZW — variable-width
codes packed LSB-first, Clear/EOI control codes, table growth to 12
bits. This is a DIFFERENT LZW from the PDF/TIFF variant in
``kernels/pdf_text.py`` (that one packs MSB-first with EarlyChange);
the two deliberately share no code.

Decode scope: the FIRST image frame of a possibly-animated GIF,
palette-expanded to 8-bit RGB (transparency index is reported in the
frame dict but not applied — channels stay 3, deterministic).
Structural damage raises typed :class:`GifError` only — callers in
``ops/multimodal.py`` map it to a ``corrupt:`` status row, never a
task failure.

Reference parity: extract-kit never decodes pixels (its
`image-optimization.ts` resizes via sharp and defers understanding to
an external vision call); this codec exists for the first-class
multimodal-column surface of the builder brief, like
``kernels/png.py`` / ``kernels/jpeg.py``.
"""

from __future__ import annotations

import struct


class GifError(ValueError):
    """Typed decode failure — the only exception this module raises
    for malformed input."""


#: Decode-bomb guard (same rule as png.MAX_PIXELS / jpeg.MAX_PIXELS):
#: a hostile image descriptor can declare 65535x65535 and LZW can
#: expand a few KB into GBs. Dimensions are capped BEFORE the LZW
#: loop, and the LZW output is additionally capped at the declared
#: raster size, so memory is bounded by the header we validated.
MAX_PIXELS = 64 << 20


def _lzw_decode(min_code_size: int, data: bytes, max_out: int) -> bytes:
    """GIF-variant LZW: codes are packed least-significant-bit first;
    code width starts at min_code_size+1 and grows when the table
    reaches 2**width, capped at 12 bits; Clear resets the table, EOI
    terminates. Output is capped at ``max_out`` indices (the declared
    raster) — anything further is a spec violation we tolerate by
    truncation, matching mainstream decoders."""
    # spec cap is 8 (palettes max out at 256 entries); anything
    # larger would also make the bytes([i]) base-table build blow up
    # with an UNTYPED ValueError on a hostile file
    if not 2 <= min_code_size <= 8:
        raise GifError(f"bad LZW min code size {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1
    code_size = min_code_size + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    out = bytearray()
    prev: bytes | None = None
    bitpos = 0
    total_bits = len(data) * 8
    while bitpos + code_size <= total_bits:
        i = bitpos >> 3
        window = int.from_bytes(data[i:i + 3], "little")
        code = (window >> (bitpos & 7)) & ((1 << code_size) - 1)
        bitpos += code_size
        if code == clear:
            table = list(base)
            code_size = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            return bytes(out)
        if prev is None:
            if code >= len(table):
                raise GifError(f"LZW code {code} before table entry")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise GifError(f"LZW code {code} beyond table")
        if prev is not None and len(table) >= (1 << code_size) \
                and code_size < 12:
            code_size += 1
        out += entry
        if len(out) >= max_out:
            return bytes(out[:max_out])
        prev = entry
    raise GifError("LZW stream truncated (no EOI)")


def _lzw_encode(min_code_size: int, data: bytes) -> bytes:
    """Encoder twin of :func:`_lzw_decode` (tests pin the roundtrip).
    Emits Clear, dictionary-codes the input, emits Clear again when
    the table would exceed 12 bits, then EOI."""
    clear = 1 << min_code_size
    eoi = clear + 1
    code_size = min_code_size + 1
    table = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    out = bytearray()
    bitbuf = 0
    nbits = 0

    def emit(code: int) -> None:
        nonlocal bitbuf, nbits
        bitbuf |= code << nbits
        nbits += code_size
        while nbits >= 8:
            out.append(bitbuf & 0xFF)
            bitbuf >>= 8
            nbits -= 8

    emit(clear)
    cur = b""
    for b in data:
        nxt = cur + bytes([b])
        if nxt in table:
            cur = nxt
            continue
        emit(table[cur])
        table[nxt] = next_code
        next_code += 1
        # growth is one emit LATER than next_code reaching 2**size:
        # the decoder mirrors each add one code behind (its first
        # post-clear read defines nothing), so its table hits
        # 2**size exactly when our next_code passes it — the
        # giflib / Go image/gif convention
        if next_code > (1 << code_size) and code_size < 12:
            code_size += 1
        elif next_code == (1 << 12):
            emit(clear)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            code_size = min_code_size + 1
        cur = nxt[-1:]
    if cur:
        emit(table[cur])
    emit(eoi)
    if nbits:
        out.append(bitbuf & 0xFF)
    return bytes(out)


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _interlace_order(height: int) -> list[int]:
    """Source-row order of a 4-pass interlaced image: row
    ``order[k]`` of the raster is the k-th row stored in the file."""
    order = []
    for start, step in _INTERLACE_PASSES:
        order.extend(range(start, height, step))
    return order


def _read_subblocks(payload: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate length-prefixed data sub-blocks until the 0x00
    terminator; returns (data, position-after-terminator)."""
    parts = []
    while True:
        if pos >= len(payload):
            raise GifError("truncated sub-block chain")
        n = payload[pos]
        pos += 1
        if n == 0:
            return b"".join(parts), pos
        if pos + n > len(payload):
            raise GifError("truncated data sub-block")
        parts.append(payload[pos:pos + n])
        pos += n


def decode_gif(payload: bytes) -> dict:
    """Decode the first frame to 8-bit RGB. Returns the same dict
    shape as ``png.decode_png`` / ``jpeg.decode_jpeg``:
    ``{width, height, bit_depth, channels, pixels}`` plus
    ``transparent_index`` (int or None, reported not applied) and
    ``version`` ('87a'/'89a'). Raises :class:`GifError` on anything
    structurally broken."""
    if len(payload) < 13:
        raise GifError("too short for header")
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise GifError("bad signature")
    version = payload[3:6].decode("ascii")
    _, _, packed, _, _ = struct.unpack("<HHBBB", payload[6:13])
    pos = 13
    global_ct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        if pos + 3 * n > len(payload):
            raise GifError("truncated global color table")
        global_ct = payload[pos:pos + 3 * n]
        pos += 3 * n
    transparent = None
    while True:
        if pos >= len(payload):
            raise GifError("missing trailer")
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer before any image
            raise GifError("no image data")
        if block == 0x21:  # extension
            if pos >= len(payload):
                raise GifError("truncated extension")
            label = payload[pos]
            pos += 1
            data, pos = _read_subblocks(payload, pos)
            if label == 0xF9 and len(data) >= 4 and data[0] & 0x01:
                transparent = data[3]
            continue
        if block != 0x2C:
            raise GifError(f"unknown block 0x{block:02x}")
        break
    if pos + 9 > len(payload):
        raise GifError("truncated image descriptor")
    _, _, width, height, ipacked = struct.unpack("<HHHHB",
                                                 payload[pos:pos + 9])
    pos += 9
    if width == 0 or height == 0:
        raise GifError("zero-sized image")
    if width * height > MAX_PIXELS:
        raise GifError(
            f"image too large: {width}x{height} > {MAX_PIXELS} px")
    color_table = global_ct
    if ipacked & 0x80:
        n = 2 << (ipacked & 0x07)
        if pos + 3 * n > len(payload):
            raise GifError("truncated local color table")
        color_table = payload[pos:pos + 3 * n]
        pos += 3 * n
    if color_table is None:
        raise GifError("no color table (global absent, local absent)")
    if pos >= len(payload):
        raise GifError("missing LZW min code size")
    min_code_size = payload[pos]
    pos += 1
    data, pos = _read_subblocks(payload, pos)
    indices = _lzw_decode(min_code_size, data, width * height)
    if len(indices) < width * height:
        raise GifError(
            f"short raster: {len(indices)} < {width * height} indices")
    n_colors = len(color_table) // 3
    if max(indices) >= n_colors:
        raise GifError(
            f"palette index {max(indices)} >= table size {n_colors}")
    if ipacked & 0x40:  # interlaced: reorder stored rows into place
        rows = [indices[r * width:(r + 1) * width]
                for r in range(height)]
        raster = [b""] * height
        for stored, target in enumerate(_interlace_order(height)):
            raster[target] = rows[stored]
        indices = b"".join(raster)
    pixels = bytearray(width * height * 3)
    for i, idx in enumerate(indices):
        pixels[3 * i:3 * i + 3] = color_table[3 * idx:3 * idx + 3]
    return {"width": width, "height": height, "bit_depth": 8,
            "channels": 3, "pixels": bytes(pixels),
            "transparent_index": transparent, "version": version}


def encode_gif(width: int, height: int, indices: bytes,
               palette: list[tuple[int, int, int]],
               interlace: bool = False,
               version: bytes = b"89a",
               transparent: int | None = None) -> bytes:
    """Minimal single-frame encoder for deterministic test vectors:
    global color table (padded to the next power of two ≥ 2 entries),
    optional graphic-control extension + interlacing. ``indices`` is
    the row-major palette-index raster."""
    assert len(indices) == width * height
    assert 1 <= len(palette) <= 256, "GIF palettes cap at 256 entries"
    n = max(2, len(palette))
    bits = max(1, (n - 1).bit_length())
    n = 1 << bits
    ct = bytearray()
    for r, g, b in palette:
        ct += bytes((r, g, b))
    ct += b"\x00" * (3 * n - len(ct))
    out = bytearray(b"GIF" + version)
    out += struct.pack("<HHBBB", width, height,
                       0x80 | (bits - 1), 0, 0)
    out += ct
    if transparent is not None:
        out += bytes((0x21, 0xF9, 4, 0x01, 0, 0, transparent, 0))
    if interlace:
        rows = [indices[r * width:(r + 1) * width]
                for r in range(height)]
        indices = b"".join(rows[r] for r in _interlace_order(height))
    min_code_size = max(2, bits)
    lzw = _lzw_encode(min_code_size, indices)
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, width, height,
                       0x40 if interlace else 0)
    out.append(min_code_size)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)
