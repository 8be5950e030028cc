"""Pure-stdlib RIFF/WAVE (PCM + IEEE-float) parser — makes the AUDIO
modality of the multimodal-column surface real instead of stubbed.

Implements the public RIFF/WAVE container format (Microsoft/IBM 1991;
RFC 2361 lists the format tags): chunk walk with even-byte padding,
``fmt `` parse (PCM=1, IEEE float=3, WAVE_FORMAT_EXTENSIBLE=0xFFFE
resolved via the SubFormat GUID), ``data`` payload extraction. No
resampling or codec work — compressed formats (MP3-in-WAV, ADPCM, …)
raise a typed *unsupported* error; on a production cluster those
would ship ffmpeg via --py-files/conda into the same
``decode_audio`` batch shape (ops/multimodal.py).

Structural damage raises :class:`WavError` only — callers map it to
a ``corrupt:``/``unsupported:`` status row, never a task failure.

Reference parity: extract-kit has no audio path at all; this exists
for the builder brief's first-class multimodal columns, mirroring
``kernels/png.py`` / ``kernels/jpeg.py`` / ``kernels/gif.py``.
"""

from __future__ import annotations

import struct


class WavError(ValueError):
    """Typed decode failure — the only exception this module raises
    for malformed input."""


#: First 2 bytes of the WAVE_FORMAT_EXTENSIBLE SubFormat GUID carry
#: the real format tag (the rest is a fixed GUID suffix).
_PCM, _FLOAT, _EXTENSIBLE = 1, 3, 0xFFFE

#: Header-walk guard: a hostile file can declare a chunk chain of
#: millions of zero-length chunks; unlike the image codecs there is
#: no decompression amplification (samples are the payload bytes
#: themselves), so the only cap needed is on the chunk WALK.
MAX_CHUNKS = 4096


def decode_wav(payload: bytes) -> dict:
    """Parse a RIFF/WAVE payload. Returns
    ``{sample_rate, channels, bit_depth, n_samples, duration_ms,
    fmt_tag, samples}`` where ``samples`` is the raw interleaved
    frame bytes of the ``data`` chunk (n_samples counts per-channel
    frames). Raises :class:`WavError` on structural damage or
    non-PCM/non-float encodings."""
    if len(payload) < 12:
        raise WavError("too short for RIFF header")
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise WavError("bad RIFF/WAVE signature")
    pos = 12
    fmt = None
    data = None
    for _ in range(MAX_CHUNKS):
        if pos == len(payload):
            break
        if pos + 8 > len(payload):
            raise WavError("truncated chunk header")
        cid = payload[pos:pos + 4]
        size, = struct.unpack("<I", payload[pos + 4:pos + 8])
        pos += 8
        if pos + size > len(payload):
            raise WavError(f"truncated {cid!r} chunk")
        body = payload[pos:pos + size]
        pos += size + (size & 1)  # chunks are word-aligned
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        if fmt is not None and data is not None:
            break
    else:
        raise WavError(f"more than {MAX_CHUNKS} chunks")
    if fmt is None:
        raise WavError("missing fmt chunk")
    if data is None:
        raise WavError("missing data chunk")
    if len(fmt) < 16:
        raise WavError("fmt chunk too short")
    tag, channels, rate, _, block_align, bits = struct.unpack(
        "<HHIIHH", fmt[:16])
    if tag == _EXTENSIBLE:
        # cbSize(2) + validBits(2) + channelMask(4) + GUID(16)
        if len(fmt) < 40:
            raise WavError("extensible fmt too short for SubFormat")
        tag, = struct.unpack("<H", fmt[24:26])
    if tag not in (_PCM, _FLOAT):
        raise WavError(f"unsupported format tag {tag}")
    if channels == 0 or rate == 0:
        raise WavError("zero channels or sample rate")
    if rate > 0x7FFFFFFF:
        # uint32 field; a hostile value past int32 would overflow the
        # caller's sample_rate column cast — bound it as corruption
        raise WavError(f"implausible sample rate {rate}")
    if bits == 0 or bits % 8:
        raise WavError(f"bad bit depth {bits}")
    if tag == _FLOAT and bits not in (32, 64):
        raise WavError(f"float WAV with bit depth {bits}")
    expect_align = channels * (bits // 8)
    if block_align != expect_align:
        raise WavError(
            f"block align {block_align} != channels*bytes "
            f"{expect_align}")
    if len(data) % block_align:
        raise WavError("data chunk not frame-aligned")
    n = len(data) // block_align
    return {
        "sample_rate": rate,
        "channels": channels,
        "bit_depth": bits,
        "n_samples": n,
        # floor-integer ms — deterministic, no float in the contract
        "duration_ms": n * 1000 // rate,
        "fmt_tag": "pcm" if tag == _PCM else "float",
        "samples": data,
    }


def encode_wav(sample_rate: int, channels: int, bit_depth: int,
               frames: bytes, float_fmt: bool = False,
               extensible: bool = False) -> bytes:
    """Minimal writer for deterministic test vectors. ``frames`` is
    interleaved raw sample bytes (must be frame-aligned)."""
    block_align = channels * (bit_depth // 8)
    assert len(frames) % block_align == 0
    tag = _FLOAT if float_fmt else _PCM
    byte_rate = sample_rate * block_align
    if extensible:
        # KSDATAFORMAT_SUBTYPE GUID {tag}-0000-0010-8000-00AA00389B71:
        # Data1-3 little-endian, Data4 big-endian raw bytes
        sub = struct.pack("<IHH", tag, 0, 0x0010) + bytes.fromhex(
            "800000aa00389b71")
        fmt = struct.pack("<HHIIHHHHI", _EXTENSIBLE, channels,
                          sample_rate, byte_rate, block_align,
                          bit_depth, 22, bit_depth, 0) + sub
    else:
        fmt = struct.pack("<HHIIHH", tag, channels, sample_rate,
                          byte_rate, block_align, bit_depth)
    out = bytearray(b"RIFF\x00\x00\x00\x00WAVE")
    out += b"fmt " + struct.pack("<I", len(fmt)) + fmt
    if len(fmt) & 1:
        out += b"\x00"
    out += b"data" + struct.pack("<I", len(frames)) + frames
    if len(frames) & 1:
        out += b"\x00"
    struct.pack_into("<I", out, 4, len(out) - 8)
    return bytes(out)
