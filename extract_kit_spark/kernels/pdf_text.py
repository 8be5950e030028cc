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

Documented constraint (SURVEY.md §7.4): no ToUnicode CMap mapping
(composite-font glyph-id strings decode as latin-1 bytes) and no
rotation handling (Tm is read for translation only).
"""

from __future__ import annotations

import re
import zlib

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
            toks.append(m.group())
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


class _TextRun:
    __slots__ = ("x", "y", "text")

    def __init__(self, x: float, y: float, text: str) -> None:
        self.x = x
        self.y = y
        self.text = text


def _interpret_text_ops(content: str) -> list[_TextRun]:
    runs: list[_TextRun] = []
    tokens = _tokenize(content)
    stack: list = []
    in_text = False
    x = y = 0.0
    line_x = line_y = 0.0
    leading = 12.0
    in_array: list | None = None
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
            x = y = line_x = line_y = 0.0
            stack.clear()
        elif op == "ET":
            in_text = False
            stack.clear()
        elif not in_text:
            stack.clear()
        elif op in ("Td", "TD"):
            if len(stack) >= 2:
                ty = stack.pop()
                tx = stack.pop()
                if op == "TD":
                    leading = -ty if ty else leading
                line_x += tx
                line_y += ty
                x, y = line_x, line_y
            stack.clear()
        elif op == "Tm":
            if len(stack) >= 6:
                f = stack.pop()
                e = stack.pop()
                stack.clear()
                line_x, line_y = e, f
                x, y = e, f
            else:
                stack.clear()
        elif op == "TL":
            if stack:
                leading = stack.pop()
            stack.clear()
        elif op == "T*":
            line_y -= leading
            x, y = line_x, line_y
            stack.clear()
        elif op == "Tj":
            if stack and isinstance(stack[-1], str):
                text = stack.pop()
                if text:
                    runs.append(_TextRun(x, y, text))
                    x += 5.0 * len(text)  # rough advance
            stack.clear()
        elif op in ("'", '"'):
            # ' = T* then show; " = set word/char spacing (two numbers
            # below the string on the stack — ignored) then T* + show
            line_y -= leading
            x, y = line_x, line_y
            if stack and isinstance(stack[-1], str):
                text = stack.pop()
                if text:
                    runs.append(_TextRun(x, y, text))
            stack.clear()
        elif op == "TJ":
            if stack and isinstance(stack[-1], list):
                arr = stack.pop()
                text = "".join(p for p in arr if isinstance(p, str))
                if text:
                    runs.append(_TextRun(x, y, text))
                    x += 5.0 * len(text)
            stack.clear()
        else:
            stack.clear()
    return runs


_COLUMN_GAP = 150.0
_LINE_TOL = 2.0


def _reading_order(runs: list[_TextRun]) -> list[str]:
    """Column clustering: sort distinct x starts, split on gaps >
    _COLUMN_GAP, order columns left→right, within a column sort by
    descending y (PDF origin bottom-left), then x; merge same-line runs."""
    if not runs:
        return []
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


def _iter_streams(payload: bytes):
    """Yield (params, decoded_raw) for every stream object. The byte
    range is the /Length slice when present — binary (compressed)
    stream data can itself contain b"endstream" or end in b"\\r",
    which a delimiter scan mis-handles; the exact byte count can't."""
    for m in _STREAM_HDR_RE.finditer(payload):
        params = m.group(1)
        start = m.end()
        lm = _LENGTH_RE.search(params)
        if lm:
            raw = payload[start:start + int(lm.group(1))]
        else:
            end = payload.find(b"endstream", start)
            if end == -1:
                continue
            raw = payload[start:end]
            if raw.endswith(b"\r\n"):
                raw = raw[:-2]
            elif raw.endswith(b"\n"):
                raw = raw[:-1]
        if b"/FlateDecode" in params:
            try:
                raw = zlib.decompress(raw)
            except zlib.error:
                continue
        yield params, raw


def extract_pdf_pages(payload: bytes) -> list[list[str]]:
    """PDF bytes → list of pages, each a list of reading-ordered text
    lines. Raises ExtractError(INVALID_PDF) on a failed validity gate.

    PDF 1.5+ layouts: content streams are always top-level stream
    objects (the spec forbids streams inside object streams), so text
    extraction is unaffected by a compressed cross-reference — but
    page DICTIONARIES may live inside /ObjStm object streams, so the
    page-presence gate also looks inside decompressed object streams.
    /XRef cross-reference streams and image XObjects are binary and
    never interpreted as text (their decompressed bytes could contain
    accidental ``BT``)."""
    if not payload.startswith(b"%PDF-"):
        raise ExtractError(INVALID_PDF, "bad header", phase="pdf-parse")
    pages: list[list[str]] = []
    page_dicts_seen = bool(_PAGE_COUNT_RE.search(payload))
    for params, raw in _iter_streams(payload):
        if _XREFSTM_RE.search(params) or _IMAGE_RE.search(params):
            continue
        if _OBJSTM_RE.search(params):
            if _PAGE_COUNT_RE.search(raw):
                page_dicts_seen = True
            continue
        try:
            content = raw.decode("latin-1")
        except Exception:
            continue
        if "BT" not in content:
            continue
        runs = _interpret_text_ops(content)
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
