"""Deterministic PDF text extraction with reading-order reconstruction.

The reference rasterizes PDF pages with Ghostscript and ships them to a
vision LLM (`pdf-processor/src/core/file-processor.ts:52-57`,
`core/vision/ai-generator.ts:51-68`). Per the north rule that call is
replaced with deterministic layout parsing: this kernel interprets the
PDF content stream's text operators directly (pure Python; stdlib `zlib`
for FlateDecode) and reconstructs reading order by column clustering —
x-cluster detection, top-to-bottom within a column, left column first
(SURVEY.md §7.4).

Supported operator subset (covers the fixture writer + common simple
PDFs): BT/ET, Tf, Td, TD, Tm, T*, TL, Tj, TJ, ' and " (quote ops).
Literal strings with the FULL escape table (named escapes, 1-3-digit
octal with 8-bit overflow wrap, backslash-newline line continuations,
spec-mandated dropped backslash before other chars) and balanced
unescaped nested parentheses; hex strings ``<4E6F>`` with odd-length
padding; ``%`` comments. Page discovery handles both classic xref
tables and PDF 1.5+ compressed layouts: page dictionaries packed in
/ObjStm object streams are found by decompressing the object stream,
and /XRef cross-reference streams / image XObjects are excluded from
text interpretation. Validity gate parity: `file-processor.ts:46-49`
(S5).

Composite fonts: /ToUnicode CMaps (bfchar + bfrange, incl. the
array-destination form and multi-code-unit ligature targets) are parsed
and applied to show-strings of fonts that carry one — glyph-id codes
(codespacerange-sized, typically 2-byte under /Identity-H) map to
UTF-16BE text; codes absent from the CMap are dropped. Font→CMap
resolution is document-global by resource name (`/F1` …), covering
top-level objects and /ObjStm-packed font dictionaries.

Rotation: Tm is honored as a full matrix — Td/TD/T* translate along the
rotated line axes, and reading order is reconstructed in the UPRIGHT
frame by rotating run coordinates back through the page's dominant
quadrant (0/90/180/270°), so sidewise pages read in their own text
orientation.

Page attribution: pages are resolved through the real document
structure — catalog → /Pages /Kids tree (nested trees supported) →
page dicts' /Contents (single ref or array) — so a page split across
several content streams is interpreted as ONE page (graphics state
spans the concatenation, per spec), and streams stored out of file
order land on the right page in the right order. Documents whose
structure can't be resolved (no parseable page dicts with /Contents)
fall back to the historical stream-per-page heuristic.

Word spacing: TJ kerning offsets at or below ``_TJ_SPACE_KERN``
(thousandths of text-space units) decode as a word space — the common
writer idiom that positions words with kerns instead of space glyphs.

Encrypted documents (/Encrypt in the trailer) fail the validity gate
with an explicit message instead of emitting ciphertext garbage.
"""

from __future__ import annotations

import math
import re
import zlib
from collections import Counter

from .errors import ExtractError, INVALID_PDF

_STREAM_HDR_RE = re.compile(rb"<<((?:[^<>]|<<[^>]*>>)*?)>>\s*stream\r?\n",
                            re.DOTALL)
_LENGTH_RE = re.compile(rb"/Length\s+(\d+)")
_PAGE_COUNT_RE = re.compile(rb"/Type\s*/Page(?![s/])")

# names / numbers / operators / array delimiters — strings, dicts and
# comments are handled by the scanner (they need nesting/state a single
# regex alternation can't express: balanced parens, `<<` vs hex-`<`)
_OTHER_TOKEN_RE = re.compile(
    r"""/[^\s/\[\]()<>{}%]*       # name
      | [-+]?(?:\d+\.?\d*|\.\d+)  # number
      | [A-Za-z'"*]+              # operator
      | \[ | \]
    """, re.VERBOSE)

_NUM_TOKEN_RE = re.compile(r"[-+]?(?:\d+\.?\d*|\.\d+)")
_WS_B_RE = re.compile(r"\s")
_WHITESPACE = " \t\r\n\x0c\x00"

_ESCAPES = {"n": "\n", "r": "\r", "t": "\t", "b": "\b", "f": "\f",
            "(": "(", ")": ")", "\\": "\\"}

# TJ kern-as-space threshold, thousandths of a text-space unit: writers
# that omit space glyphs typically kern between words by -200..-600;
# intra-word kerning sits around 0..-100. pdftotext-family extractors
# use the same order of magnitude.
_TJ_SPACE_KERN = -180.0

_ENCRYPT_RE = re.compile(rb"/Encrypt\s+\d+\s+\d+\s+R")
_LENGTH_REF_RE = re.compile(rb"/Length\s+(\d+)\s+(\d+)\s+R")
_TRAILER_RE = re.compile(rb"trailer\b")
_FILTER_RE = re.compile(rb"/Filter\s*(\[[^\]]*\]|/[A-Za-z0-9]+)")
_INLINE_EI_RE = re.compile(r"\sEI(?=\s|$)")


def _is_encrypted(payload: bytes) -> bool:
    """True iff an /Encrypt entry appears where the spec puts it: in a
    ``trailer`` dictionary, or in the dictionary of a /Type /XRef
    cross-reference stream (PDF 1.5+ trailer-less layout). Scanning
    the WHOLE payload would false-positively quarantine a valid file
    whose compressed stream bytes happen to contain the pattern —
    plausible at 10^12 documents (ADVICE r3). The 2 KiB window after
    each ``trailer`` keyword covers the trailer dict without needing a
    balanced-dict parse; stream data never sits inside that window
    because the trailer follows the last ``endstream``."""
    for m in _TRAILER_RE.finditer(payload):
        if _ENCRYPT_RE.search(payload, m.end(), m.end() + 2048):
            return True
    for m in _STREAM_HDR_RE.finditer(payload):
        params = m.group(1)
        if _XREFSTM_RE.search(params) and _ENCRYPT_RE.search(params):
            return True
    return False


def is_valid_pdf(payload: bytes) -> bool:
    """S5 validity gate: header magic + an EOF marker somewhere."""
    return (payload.startswith(b"%PDF-")
            and b"%%EOF" in payload[-1024:] if len(payload) >= 16
            else False)


def _tokenize(content: str) -> list[str]:
    """Content-stream scanner. String tokens keep their delimiters
    (``(...)`` / ``<...>``) for the decode helpers; literal strings
    honor escaped AND balanced unescaped parens; ``<<``/``>>`` are
    emitted as dict-delimiter tokens (so an inline property list is
    never mistaken for a hex string); ``%`` comments are dropped."""
    toks: list[str] = []
    i, n = 0, len(content)
    while i < n:
        c = content[i]
        if c in _WHITESPACE:
            i += 1
            continue
        if c == "%":  # comment to end of line
            j = content.find("\n", i)
            i = n if j == -1 else j + 1
            continue
        if c == "(":
            depth = 0
            j = i
            while j < n:
                ch = content[j]
                if ch == "\\":
                    j += 2
                    continue
                if ch == "(":
                    depth += 1
                elif ch == ")":
                    depth -= 1
                    if depth == 0:
                        j += 1
                        break
                j += 1
            j = min(j, n)
            toks.append(content[i:j])
            i = j
            continue
        if c == "<":
            if i + 1 < n and content[i + 1] == "<":
                toks.append("<<")
                i += 2
                continue
            j = content.find(">", i + 1)
            j = n if j == -1 else j + 1
            toks.append(content[i:j])
            i = j
            continue
        if c == ">" and i + 1 < n and content[i + 1] == ">":
            toks.append(">>")
            i += 2
            continue
        m = _OTHER_TOKEN_RE.match(content, i)
        if m and m.end() > i:
            tok = m.group()
            if tok == "BI":
                # inline image: BI <dict> ID <raw binary> EI — the
                # binary can contain any delimiter byte, so skip to
                # the whitespace-delimited EI instead of tokenizing
                id_pos = content.find("ID", m.end())
                ei = _INLINE_EI_RE.search(
                    content, id_pos + 2 if id_pos != -1 else m.end())
                i = ei.end() if ei else n
                continue
            toks.append(tok)
            i = m.end()
            continue
        i += 1  # stray delimiter ({, }, lone >) — skip
    return toks


def _decode_literal(tok: str) -> str:
    out: list[str] = []
    i = 1
    end = len(tok) - 1  # trailing ')'
    while i < end:
        c = tok[i]
        if c == "\\":
            if i + 1 >= end:
                break  # lone backslash before the closing paren: dropped
            nxt = tok[i + 1]
            if nxt in _ESCAPES:
                out.append(_ESCAPES[nxt])
                i += 2
                continue
            if nxt in "01234567":  # 1-3 OCTAL digits (8/9 are not octal)
                j = i + 1
                oct_digits = ""
                while (j < end and len(oct_digits) < 3
                       and tok[j] in "01234567"):
                    oct_digits += tok[j]
                    j += 1
                # spec: high-order overflow (e.g. \777) wraps to 8 bits
                out.append(chr(int(oct_digits, 8) & 0xFF))
                i = j
                continue
            if nxt == "\n":  # line continuation: backslash-EOL vanishes
                i += 2
                continue
            if nxt == "\r":
                i += 2
                if i < end and tok[i] == "\n":
                    i += 1
                continue
            # spec: backslash before any other char is DROPPED, the
            # char itself survives (e.g. \z -> z, \8 -> 8)
            out.append(nxt)
            i += 2
            continue
        out.append(c)
        i += 1
    return "".join(out)


def _decode_hex(tok: str) -> str:
    hexstr = _WS_B_RE.sub("", tok[1:-1])
    if len(hexstr) % 2:
        hexstr += "0"
    try:
        return bytes.fromhex(hexstr).decode("latin-1")
    except ValueError:
        return ""


# ---------------------------------------------------------------------------
# ToUnicode CMaps (composite / Type0 fonts)
# ---------------------------------------------------------------------------

_OBJ_RE = re.compile(rb"(\d+)\s+\d+\s+obj\b")
_FONTRES_RE = re.compile(rb"/Font\s*<<(.*?)>>", re.DOTALL)
_XOBJRES_RE = re.compile(rb"/XObject\s*<<(.*?)>>", re.DOTALL)
_FORM_RE = re.compile(rb"/Subtype\s*/Form")
_FONTREF_RE = re.compile(rb"/([^\s/<>\[\]()]+)\s+(\d+)\s+\d+\s+R")
_TOUNICODE_RE = re.compile(rb"/ToUnicode\s+(\d+)\s+\d+\s+R")
_N_RE = re.compile(rb"/N\s+(\d+)")
_FIRST_RE = re.compile(rb"/First\s+(\d+)")
_CODESPACE_RE = re.compile(
    r"begincodespacerange\s*<([0-9A-Fa-f]+)>\s*<[0-9A-Fa-f]+>")
_BFCHAR_RE = re.compile(r"beginbfchar(.*?)endbfchar", re.DOTALL)
_BFRANGE_RE = re.compile(r"beginbfrange(.*?)endbfrange", re.DOTALL)
_BF_TOK_RE = re.compile(r"<([0-9A-Fa-f]+)>|(\[)|(\])")


class _CMap:
    __slots__ = ("nbytes", "map")

    def __init__(self, nbytes: int, mapping: dict[int, str]) -> None:
        self.nbytes = nbytes
        self.map = mapping

    def apply(self, s: str) -> str:
        """Map a show-string (latin-1 byte-preserving) of glyph codes to
        unicode. Codes missing from the CMap (and a trailing partial
        code unit) are dropped — deterministic, never throws."""
        bs = s.encode("latin-1", "replace")
        n = self.nbytes
        return "".join(self.map.get(int.from_bytes(bs[i:i + n], "big"), "")
                       for i in range(0, len(bs) - n + 1, n))


def _utf16_dst(hexstr: str) -> str:
    """bfchar/bfrange destination hex → text (UTF-16BE; ligature targets
    are multiple code units)."""
    if len(hexstr) % 2:
        hexstr += "0"
    try:
        return bytes.fromhex(hexstr).decode("utf-16-be", "ignore")
    except ValueError:
        return ""


def _utf16_dst_inc(hexstr: str, k: int) -> str:
    """bfrange incrementing destination: dst + k with the increment
    applied to the LAST UTF-16 code unit (PDF 1.7 §9.10.3)."""
    if len(hexstr) % 2:
        hexstr += "0"
    try:
        b = bytearray(bytes.fromhex(hexstr))
    except ValueError:
        return ""
    if len(b) >= 2:
        u = (int.from_bytes(b[-2:], "big") + k) & 0xFFFF
        b[-2:] = u.to_bytes(2, "big")
    elif b:
        b[-1] = (b[-1] + k) & 0xFF
    return bytes(b).decode("utf-16-be", "ignore")


def _parse_cmap(text: str) -> "_CMap | None":
    m = _CODESPACE_RE.search(text)
    nbytes = max(1, len(m.group(1)) // 2) if m else 2
    mapping: dict[int, str] = {}
    for sec in _BFCHAR_RE.findall(text):
        toks = [t.group(1) for t in _BF_TOK_RE.finditer(sec) if t.group(1)]
        for src, dst in zip(toks[0::2], toks[1::2]):
            mapping[int(src, 16)] = _utf16_dst(dst)
    for sec in _BFRANGE_RE.findall(text):
        toks = [(t.group(1) or t.group(2) or t.group(3))
                for t in _BF_TOK_RE.finditer(sec)]
        i = 0
        while i + 1 < len(toks):
            if toks[i] in "[]" or toks[i + 1] in "[]":
                i += 1
                continue
            lo, hi = int(toks[i], 16), int(toks[i + 1], 16)
            i += 2
            if i >= len(toks):
                break
            if toks[i] == "[":  # array form: one dst per code
                i += 1
                k = 0
                while i < len(toks) and toks[i] != "]":
                    if lo + k <= hi:
                        mapping[lo + k] = _utf16_dst(toks[i])
                    k += 1
                    i += 1
                i += 1  # closing ]
            else:
                dst = toks[i]
                i += 1
                for k in range(min(hi - lo, 0xFFFF) + 1):
                    mapping[lo + k] = _utf16_dst_inc(dst, k)
    return _CMap(nbytes, mapping) if mapping else None


def _parse_objects(payload: bytes) -> dict[int, bytes]:
    """Best-effort top-level object map (num → body bytes). First
    definition wins — duplicate numbers from accidental matches inside
    binary stream data can't displace the real layout scanned earlier
    in the file when the real object comes first; either way the result
    is deterministic."""
    objs: dict[int, bytes] = {}
    for m in _OBJ_RE.finditer(payload):
        end = payload.find(b"endobj", m.end())
        objs.setdefault(int(m.group(1)),
                        payload[m.end():end if end != -1 else len(payload)])
    return objs


def _objstm_bodies(params: bytes, raw: bytes):
    """Yield (num, body) for dictionary objects packed in a decompressed
    /ObjStm: the stream opens with `num offset` integer pairs, then the
    concatenated bodies start at /First."""
    nm, fm = _N_RE.search(params), _FIRST_RE.search(params)
    if not nm or not fm:
        return
    first = int(fm.group(1))
    try:
        header = raw[:first].split()
        nums = [int(x) for x in header[0::2]][:int(nm.group(1))]
        offs = [int(x) for x in header[1::2]][:int(nm.group(1))]
    except ValueError:
        return
    for i, (num, off) in enumerate(zip(nums, offs)):
        end = first + (offs[i + 1] if i + 1 < len(offs) else len(raw) - first)
        yield num, raw[first + off:end]


def _font_cmaps(payload: bytes,
                objs: "dict[int, bytes] | None" = None) -> dict[str, _CMap]:
    """Resolve /Font resource names to parsed ToUnicode CMaps,
    document-global (last resource dict wins on a name collision —
    simple PDFs reuse one font set across pages). ``objs`` lets the
    caller share an already-built object map (one payload scan)."""
    objs = dict(objs) if objs is not None else _parse_objects(payload)
    spaces = [payload]
    for params, raw in _iter_streams(payload):
        if _OBJSTM_RE.search(params):
            for num, body in _objstm_bodies(params, raw):
                objs.setdefault(num, body)
            spaces.append(raw)
    cmaps: dict[str, _CMap] = {}
    for space in spaces:
        for fm in _FONTRES_RE.finditer(space):
            for name, num in _FONTREF_RE.findall(fm.group(1)):
                body = objs.get(int(num))
                if body is None:
                    continue
                tm = _TOUNICODE_RE.search(body)
                if not tm:
                    continue
                cm_body = objs.get(int(tm.group(1)))
                if cm_body is None:
                    continue
                data = next(_iter_streams(cm_body), None)
                if data is None:
                    continue
                cm = _parse_cmap(data[1].decode("latin-1", "replace"))
                if cm:
                    cmaps["/" + name.decode("latin-1")] = cm
    return cmaps


class _TextRun:
    __slots__ = ("x", "y", "text", "quad")

    def __init__(self, x: float, y: float, text: str, quad: int = 0) -> None:
        self.x = x
        self.y = y
        self.text = text
        self.quad = quad


def _interpret_text_ops(content: str,
                        cmaps: "dict[str, _CMap] | None" = None,
                        forms: "dict[str, str] | None" = None,
                        _depth: int = 0) -> list[_TextRun]:
    runs: list[_TextRun] = []
    tokens = _tokenize(content)
    stack: list = []
    in_text = False
    # full text LINE matrix [la lb lc ld lex ley]; (x, y) is the device
    # position of the next show op. Unit (a=d=1, b=c=0) reproduces the
    # translation-only behavior exactly.
    la, lb, lc, ld = 1.0, 0.0, 0.0, 1.0
    lex = ley = 0.0
    x = y = 0.0
    quad = 0
    leading = 12.0
    cur_cmap: _CMap | None = None
    in_array: list | None = None

    def show(text: str) -> str:
        if cur_cmap is not None:
            text = cur_cmap.apply(text)
        if text:
            runs.append(_TextRun(x, y, text, quad))
        return text

    for tok in tokens:
        if tok == "[":
            in_array = []
            continue
        if tok == "]":
            stack.append(in_array if in_array is not None else [])
            in_array = None
            continue
        if tok in ("<<", ">>"):  # inline dict (BDC property list etc.)
            stack.clear()
            continue
        if tok.startswith("(") or tok.startswith("<"):
            val = (_decode_literal(tok) if tok.startswith("(")
                   else _decode_hex(tok))
            if in_array is not None:
                in_array.append(val)
            else:
                stack.append(val)
            continue
        if _NUM_TOKEN_RE.fullmatch(tok):
            num = float(tok)
            if in_array is not None:
                in_array.append(num)
            else:
                stack.append(num)
            continue
        if tok.startswith("/"):
            stack.append(tok)
            continue
        # operator
        op = tok
        if op == "BT":
            in_text = True
            la, lb, lc, ld = 1.0, 0.0, 0.0, 1.0
            lex = ley = x = y = 0.0
            quad = 0
            stack.clear()
        elif op == "ET":
            in_text = False
            stack.clear()
        elif op == "Tf":
            # font selection persists across BT/ET like real graphics
            # state; only the CMap binding matters for extraction
            if (len(stack) >= 2 and isinstance(stack[-2], str)
                    and stack[-2].startswith("/")):
                cur_cmap = cmaps.get(stack[-2]) if cmaps else None
            stack.clear()
        elif op == "Do":
            # paint a Form XObject (headers/footers/letterheads live
            # here): splice its interpreted runs in place. Forms carry
            # their own BT/ET and absolute Tm coords in the common
            # writer pattern; depth-guarded against self-reference.
            if (forms and _depth < 8 and stack
                    and isinstance(stack[-1], str)
                    and stack[-1].startswith("/")):
                body = forms.get(stack[-1])
                if body is not None:
                    runs.extend(_interpret_text_ops(
                        body, cmaps, forms, _depth + 1))
            stack.clear()
        elif not in_text:
            stack.clear()
        elif op in ("Td", "TD"):
            if (len(stack) >= 2 and isinstance(stack[-1], float)
                    and isinstance(stack[-2], float)):
                ty = stack.pop()
                tx = stack.pop()
                if op == "TD":
                    leading = -ty if ty else leading
                # translate the LINE matrix along its own axes
                lex += tx * la + ty * lc
                ley += tx * lb + ty * ld
                x, y = lex, ley
            stack.clear()
        elif op == "Tm":
            if len(stack) >= 6:
                vals = stack[-6:]
                stack.clear()
                if all(isinstance(v, float) for v in vals):
                    la, lb, lc, ld, lex, ley = vals
                    x, y = lex, ley
                    quad = round(math.atan2(lb, la) / (math.pi / 2)) % 4
            else:
                stack.clear()
        elif op == "TL":
            if stack and isinstance(stack[-1], float):
                leading = stack.pop()
            stack.clear()
        elif op == "T*":
            lex += -leading * lc
            ley += -leading * ld
            x, y = lex, ley
            stack.clear()
        elif op == "Tj":
            if stack and isinstance(stack[-1], str):
                shown = show(stack.pop())
                x += 5.0 * len(shown) * la  # rough advance, line axis
                y += 5.0 * len(shown) * lb
            stack.clear()
        elif op in ("'", '"'):
            # ' = T* then show; " = set word/char spacing (two numbers
            # below the string on the stack — ignored) then T* + show
            lex += -leading * lc
            ley += -leading * ld
            x, y = lex, ley
            if stack and isinstance(stack[-1], str):
                show(stack.pop())
            stack.clear()
        elif op == "TJ":
            if stack and isinstance(stack[-1], list):
                arr = stack.pop()
                parts: list[str] = []
                for p in arr:
                    if isinstance(p, str):
                        parts.append(cur_cmap.apply(p) if cur_cmap else p)
                    elif (isinstance(p, float) and p <= _TJ_SPACE_KERN
                          and parts and not parts[-1].endswith(" ")):
                        # inter-word kern standing in for a space glyph
                        parts.append(" ")
                text = "".join(parts)
                if text:
                    runs.append(_TextRun(x, y, text, quad))
                    x += 5.0 * len(text) * la
                    y += 5.0 * len(text) * lb
            stack.clear()
        else:
            stack.clear()
    return runs


_COLUMN_GAP = 150.0
_LINE_TOL = 2.0


def _reading_order(runs: list[_TextRun]) -> list[str]:
    """Column clustering: sort distinct x starts, split on gaps >
    _COLUMN_GAP, order columns left→right, within a column sort by
    descending y (PDF origin bottom-left), then x; merge same-line runs.

    Rotated pages: run coordinates are first rotated back through the
    DOMINANT quadrant (majority vote over runs; ties break to the
    first-seen quadrant, deterministic) into the upright frame, so a
    90/180/270° page reads in its text's own orientation. Quadrant
    multiples of 90° use exact ±1/0 trig — no float drift."""
    if not runs:
        return []
    q = Counter(r.quad for r in runs).most_common(1)[0][0]
    if q:
        cos = (1.0, 0.0, -1.0, 0.0)[q]
        sin = (0.0, 1.0, 0.0, -1.0)[q]
        runs = [_TextRun(r.x * cos + r.y * sin, -r.x * sin + r.y * cos,
                         r.text, 0) for r in runs]
    xs = sorted({r.x for r in runs})
    col_starts = [xs[0]]
    for a, b in zip(xs, xs[1:]):
        if b - a > _COLUMN_GAP:
            col_starts.append(b)

    def col_of(r: _TextRun) -> int:
        c = 0
        for i, s in enumerate(col_starts):
            if r.x >= s - 1e-6:
                c = i
        return c

    lines: list[str] = []
    for ci in range(len(col_starts)):
        col_runs = [r for r in runs if col_of(r) == ci]
        col_runs.sort(key=lambda r: (-r.y, r.x))
        cur_y: float | None = None
        cur_parts: list[str] = []
        for r in col_runs:
            if cur_y is not None and abs(r.y - cur_y) <= _LINE_TOL:
                cur_parts.append(r.text)
            else:
                if cur_parts:
                    lines.append(" ".join(cur_parts))
                cur_parts = [r.text]
                cur_y = r.y
        if cur_parts:
            lines.append(" ".join(cur_parts))
    return lines


_OBJSTM_RE = re.compile(rb"/Type\s*/ObjStm")
_XREFSTM_RE = re.compile(rb"/Type\s*/XRef")
_IMAGE_RE = re.compile(rb"/Subtype\s*/Image")
_CONTENTS_ARR_RE = re.compile(rb"/Contents\s*\[((?:\s*\d+\s+\d+\s+R)+)\s*\]")
_CONTENTS_ONE_RE = re.compile(rb"/Contents\s+(\d+)\s+\d+\s+R")
_KIDS_RE = re.compile(rb"/Kids\s*\[((?:\s*\d+\s+\d+\s+R)+)\s*\]")
_ROOT_PAGES_RE = re.compile(rb"/Pages\s+(\d+)\s+\d+\s+R")
_REF_RE = re.compile(rb"(\d+)\s+\d+\s+R")


def _lzw_decode(data: bytes, early_change: int = 1) -> bytes:
    """PDF /LZWDecode: TIFF-style LZW (PDF 32000-1 §7.4.4). MSB-first
    bit packing, 9→12-bit variable code width, 256=ClearTable,
    257=EOD. ``early_change=1`` (the spec default) widens the code one
    entry EARLY — i.e. when the next free code reaches 2^width - 1 —
    matching what every mainstream writer emits; /DecodeParms
    /EarlyChange 0 defers to 2^width. Raises on a corrupt code so the
    caller's quarantine path engages (parity with the reference's
    isValidPDF reject, pdf-processor/src/core/file-processor.ts:46-49:
    undecodable input is rejected, never half-decoded)."""
    out = bytearray()
    table: list[bytes] = []
    prev: bytes | None = None
    width = 9

    def _reset() -> None:
        nonlocal table, prev, width
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        prev = None
        width = 9

    _reset()
    bitbuf = 0
    nbits = 0
    for byte in data:
        bitbuf = (bitbuf << 8) | byte
        nbits += 8
        while nbits >= width:
            code = (bitbuf >> (nbits - width)) & ((1 << width) - 1)
            nbits -= width
            if code == 256:
                _reset()
                continue
            if code == 257:
                return bytes(out)
            if prev is None:
                if code > 255:
                    raise ValueError("LZW: first code after clear > 255")
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):
                entry = prev + prev[:1]  # the KwKwK case
                table.append(entry)
            else:
                raise ValueError("LZW: code beyond table")
            out += entry
            prev = entry
            if len(table) >= (1 << width) - early_change and width < 12:
                width += 1
    return bytes(out)  # tolerant of a missing EOD marker


def _runlength_decode(data: bytes) -> bytes:
    """PDF /RunLengthDecode (PDF 32000-1 §7.4.5): length byte L<128 →
    copy the next L+1 literal bytes; L>128 → repeat the next byte
    257-L times; L==128 → EOD."""
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        run = data[i]
        if run == 128:
            break
        if run < 128:
            end = i + 2 + run
            if end > n:
                raise ValueError("RunLength: truncated literal run")
            out += data[i + 1:end]
            i = end
        else:
            if i + 1 >= n:
                raise ValueError("RunLength: truncated repeat run")
            out += data[i + 1:i + 2] * (257 - run)
            i += 2
    return bytes(out)


_EARLY_CHANGE_RE = re.compile(rb"/EarlyChange\s+(\d)")


def _stream_bytes(payload: bytes, params: bytes,
                  start: int) -> "bytes | None":
    """Decode one stream's data given its dict and data start offset.
    The byte range is the /Length slice when present — binary
    (compressed) stream data can itself contain b"endstream" or end in
    b"\\r", which a delimiter scan mis-handles; the exact byte count
    can't. Returns None on an undecodable stream."""
    # "/Length 12 0 R" (indirect reference, common in incremental
    # writers) must NOT be read as a literal 12-byte length — that
    # truncates the stream to garbage (ADVICE r3). Resolve the
    # referenced integer object when it parses, else fall back to the
    # endstream-delimiter scan below.
    length = None
    rm = _LENGTH_REF_RE.search(params)
    if rm:
        om = re.search(rb"(?<![0-9])" + rm.group(1) +
                       rb"\s+" + rm.group(2) +
                       rb"\s+obj\b\s*(\d+)\s*endobj", payload)
        if om:
            length = int(om.group(1))
    else:
        lm = _LENGTH_RE.search(params)
        if lm:
            length = int(lm.group(1))
    if length is not None:
        raw = payload[start:start + length]
    else:
        end = payload.find(b"endstream", start)
        if end == -1:
            return None
        raw = payload[start:end]
        if raw.endswith(b"\r\n"):
            raw = raw[:-2]
        elif raw.endswith(b"\n"):
            raw = raw[:-1]
    # filters apply in declaration order; chains like
    # [/ASCII85Decode /FlateDecode] are the wire-safe transport form
    fm = _FILTER_RE.search(params)
    names = re.findall(rb"/([A-Za-z0-9]+)", fm.group(1)) if fm else []
    for name in names:
        try:
            if name == b"FlateDecode":
                raw = zlib.decompress(raw)
            elif name == b"ASCIIHexDecode":
                hx = re.sub(rb"[\s>]", b"", raw.split(b">", 1)[0])
                if len(hx) % 2:
                    hx += b"0"
                raw = bytes.fromhex(hx.decode("ascii"))
            elif name == b"ASCII85Decode":
                import base64
                data = raw.split(b"~>", 1)[0]
                raw = base64.a85decode(re.sub(rb"\s", b"", data))
            elif name == b"LZWDecode":
                em = _EARLY_CHANGE_RE.search(params)
                raw = _lzw_decode(raw, int(em.group(1)) if em else 1)
            elif name == b"RunLengthDecode":
                raw = _runlength_decode(raw)
            else:
                return None  # DCT/CCITT/JBIG2 etc.: not text transports
        except Exception:
            return None
    return raw


def _iter_streams(payload: bytes):
    """Yield (params, decoded_raw) for every stream object."""
    for m in _STREAM_HDR_RE.finditer(payload):
        raw = _stream_bytes(payload, m.group(1), m.end())
        if raw is not None:
            yield m.group(1), raw


def _ordered_page_contents(objs: dict[int, bytes]) -> list[list[int]]:
    """True page order → list of per-page /Contents object numbers.

    Order comes from walking catalog → /Pages → /Kids recursively
    (nested page trees supported, cycle/depth guarded); when no walkable
    root exists, page dicts fall back to first-seen (file) order.
    Returns [] when no page dict carries a resolvable /Contents — the
    caller then uses the stream-per-page heuristic."""
    page_objs = {num: body for num, body in objs.items()
                 if _PAGE_COUNT_RE.search(body) and b"/Contents" in body}
    if not page_objs:
        return []
    order: list[int] = []
    root = None
    for body in objs.values():
        if b"/Catalog" in body:
            m = _ROOT_PAGES_RE.search(body)
            if m:
                root = int(m.group(1))
                break
    seen: set[int] = set()

    def walk(num: int, depth: int) -> None:
        if depth > 64 or num in seen:
            return
        seen.add(num)
        body = objs.get(num)
        if body is None:
            return
        if num in page_objs:
            order.append(num)
            return
        km = _KIDS_RE.search(body)
        if km:
            for r in _REF_RE.findall(km.group(1)):
                walk(int(r), depth + 1)

    if root is not None:
        walk(root, 0)
    if not order:
        order = list(page_objs)  # first-seen file order
    out: list[list[int]] = []
    for pn in order:
        body = page_objs[pn]
        am = _CONTENTS_ARR_RE.search(body)
        if am:
            out.append([int(r) for r in _REF_RE.findall(am.group(1))])
        else:
            sm = _CONTENTS_ONE_RE.search(body)
            out.append([int(sm.group(1))] if sm else [])
    return out


def extract_pdf_pages(payload: bytes) -> list[list[str]]:
    """PDF bytes → list of pages, each a list of reading-ordered text
    lines. Raises ExtractError(INVALID_PDF) on a failed validity gate
    and on /Encrypt-protected documents (no decryption support —
    explicit quarantine beats emitting ciphertext).

    Pages are attributed through the document structure when it
    resolves (see module docstring): each page's /Contents streams are
    concatenated — whitespace-joined per spec — and interpreted as one
    page, in /Kids order. Unresolvable structure falls back to
    stream-per-page in file order.

    PDF 1.5+ layouts: content streams are always top-level stream
    objects (the spec forbids streams inside object streams), so text
    extraction is unaffected by a compressed cross-reference — but
    page DICTIONARIES may live inside /ObjStm object streams, so both
    the page-presence gate and the structure walk also look inside
    decompressed object streams. /XRef cross-reference streams and
    image XObjects are binary and never interpreted as text (their
    decompressed bytes could contain accidental ``BT``)."""
    if not payload.startswith(b"%PDF-"):
        raise ExtractError(INVALID_PDF, "bad header", phase="pdf-parse")
    if _is_encrypted(payload):
        # RC4 standard-handler files with an EMPTY user password (the
        # dominant encrypted slice of a web crawl: owner-locked but
        # world-readable) are decrypted IN PLACE — RC4 is length-
        # preserving, so the decrypted payload is byte-layout-identical
        # and the whole parser below runs unchanged. Password-protected
        # files or AES-256 still quarantine (kernels/pdf_crypt.py scope).
        from .pdf_crypt import decrypt_payload
        payload = decrypt_payload(payload)
        if payload is None:
            raise ExtractError(
                INVALID_PDF,
                "encrypted pdf (password-protected or unsupported "
                "cipher)", phase="pdf-parse")
    page_dicts_seen = bool(_PAGE_COUNT_RE.search(payload))
    # ONE object scan serves stream attribution, the structure walk,
    # and (when present) ToUnicode font resolution
    obj_marks: list[tuple[int, int]] = []
    objs: dict[int, bytes] = {}
    for om in _OBJ_RE.finditer(payload):
        num = int(om.group(1))
        obj_marks.append((om.start(), num))
        end = payload.find(b"endobj", om.end())
        objs.setdefault(num, payload[om.end():end if end != -1
                                     else len(payload)])
    cmaps = (_font_cmaps(payload, objs)
             if b"/ToUnicode" in payload else {})
    text_streams: list[tuple[int, str]] = []  # (objnum, content), file order
    objstm_objs: dict[int, bytes] = {}
    form_objs: set[int] = set()
    for m in _STREAM_HDR_RE.finditer(payload):
        params = m.group(1)
        if _XREFSTM_RE.search(params) or _IMAGE_RE.search(params):
            continue
        raw = _stream_bytes(payload, params, m.end())
        if raw is None:
            continue
        if _OBJSTM_RE.search(params):
            if _PAGE_COUNT_RE.search(raw):
                page_dicts_seen = True
            for num, body in _objstm_bodies(params, raw):
                objstm_objs.setdefault(num, body)
            continue
        try:
            content = raw.decode("latin-1")
        except Exception:
            continue
        objnum = 0
        for start, num in obj_marks:
            if start > m.start():
                break
            objnum = num
        if _FORM_RE.search(params):
            form_objs.add(objnum)
        # no BT gate here: a /Contents-referenced stream is page
        # content by definition — a page CONTINUATION chunk (split
        # /Contents array) legitimately has no BT of its own. The
        # fallback path applies the gate itself.
        text_streams.append((objnum, content))
    pages: list[list[str]] = []
    for num, body in objstm_objs.items():
        objs.setdefault(num, body)
    by_num: dict[int, str] = {}
    for num, content in text_streams:
        by_num.setdefault(num, content)
    # Form XObjects (headers/footers): resource-name → content, spliced
    # at their Do call sites; document-global name resolution like fonts
    forms: dict[str, str] = {}
    if form_objs:
        for space in [payload] + [b for _, b in objstm_objs.items()]:
            for xm in _XOBJRES_RE.finditer(space):
                for name, num in _FONTREF_RE.findall(xm.group(1)):
                    n = int(num)
                    if n in form_objs and n in by_num:
                        forms["/" + name.decode("latin-1")] = by_num[n]
    for nums in _ordered_page_contents(objs):
        parts = [by_num[n] for n in nums if n in by_num]
        if not parts:
            continue
        runs = _interpret_text_ops("\n".join(parts), cmaps, forms)
        if runs:
            pages.append(_reading_order(runs))
    if not pages:  # structure unresolvable: stream-per-page heuristic
        for num, content in text_streams:
            if "BT" not in content or num in form_objs:
                continue
            runs = _interpret_text_ops(content, cmaps, forms)
            if runs:
                pages.append(_reading_order(runs))
    if not pages and not page_dicts_seen:
        raise ExtractError(INVALID_PDF, "no pages / no text streams",
                           phase="pdf-parse")
    return pages


def page_count(payload: bytes) -> int:
    n = len(_PAGE_COUNT_RE.findall(payload))
    for params, raw in _iter_streams(payload):
        if _OBJSTM_RE.search(params):
            n += len(_PAGE_COUNT_RE.findall(raw))
    return n if n else 0
