"""Deterministic synthetic `pages` table generator (FIXTURES.md).

Input contract per BASELINE.json input_hint: one row per document,
columns (url string, warc_ts timestamp, html binary, text string,
lang string). Document kinds are encoded in the PAYLOAD BYTES (detection
must sniff, never trust the url): article / table_page / invoice_page /
receipt_page / math_page / docx_doc / pdf_doc / text_doc / broken, with
the shares and contents specified in FIXTURES.md §1.

Fully deterministic and ORDER-INDEPENDENT: every row derives from
``random.Random(f"{seed}:{i}")``, so the same (seed, i) yields the same
bytes whether generated driver-side (tests) or inside a distributed
stage (bench at 200k+ rows). No wall-clock anywhere: warc_ts = fixed
base + i seconds.
"""

from __future__ import annotations

import datetime as _dt
import io
import random
import re
import zipfile

BASE_TS = _dt.datetime(2025, 8, 29, 0, 0, 0)
SEED = 42

WORDS = (
    "data spark table query scan filter join merge sort group window "
    "batch stream column row value key hash range bucket shuffle stage "
    "task page text block layout extract parse render schema field "
    "record document content article section heading paragraph anchor "
    "metric lineage manifest commit resume partition skew salt broadcast"
).split()

DOMAINS = tuple(
    ["hot-portal.example.com", "mega-news.example.org"] +
    [f"site-{i:02d}.example.net" for i in range(48)])

KINDS = (
    ("article", 0.51), ("table_page", 0.15), ("invoice_page", 0.10),
    ("receipt_page", 0.05), ("math_page", 0.05), ("docx_doc", 0.04),
    ("pdf_doc", 0.04), ("text_doc", 0.04), ("broken", 0.02),
)
_CUM = []
_acc = 0.0
for _k, _s in KINDS:
    _acc += _s
    _CUM.append((_acc, _k))

HEADER_KEYWORDS = ("name", "date", "description", "id", "type", "status")
MATH_CHARS = ("α", "∞", "∑", "≤", "π", "√", "≥", "×")


def _words(rng: random.Random, n: int) -> str:
    return " ".join(rng.choice(WORDS) for _ in range(n))


def _slug(rng: random.Random) -> str:
    return "-".join(rng.choice(WORDS) for _ in range(3))


def kind_of(rng_val: float) -> str:
    for cum, kind in _CUM:
        if rng_val < cum:
            return kind
    return KINDS[-1][0]


def _domain(rng: random.Random) -> str:
    r = rng.random()
    if r < 0.20:
        return DOMAINS[0]
    if r < 0.40:
        return DOMAINS[1]
    return DOMAINS[2 + rng.randrange(48)]


# ---------------------------------------------------------------------------
# HTML builders
# ---------------------------------------------------------------------------

def _nav_block(rng: random.Random) -> str:
    n = rng.randint(10, 30)
    links = "".join(
        f'<li><a href="/{_slug(rng)}">{rng.choice(WORDS)}</a></li>'
        for _ in range(n))
    return f'<nav class="menu"><ul>{links}</ul></nav>'


def _chrome(rng: random.Random) -> tuple[str, str, str]:
    header = (f'<header id="banner"><a href="/">{rng.choice(WORDS)}</a>'
              f'<span>{_words(rng, 3)}</span></header>')
    sidebar_links = "".join(
        f'<li><a href="/{_slug(rng)}">{_words(rng, 2)}</a></li>'
        for _ in range(rng.randint(5, 12)))
    sidebar = f'<div class="sidebar"><ul>{sidebar_links}</ul></div>'
    footer = (f'<footer><p><a href="/about">about</a> | '
              f'<a href="/contact">contact</a> © {rng.choice(WORDS)}'
              f'</p></footer>')
    return header, sidebar, footer


def _page(rng: random.Random, title: str, body_core: str) -> bytes:
    header, sidebar, footer = _chrome(rng)
    script = f'<script>var x = "{rng.choice(WORDS)}";</script>'
    style = f'<style>.c{rng.randint(0, 99)} {{color: red;}}</style>'
    html = (
        "<!DOCTYPE html><html><head>"
        f"<title>{title}</title>{style}</head><body>"
        f"{header}{_nav_block(rng)}"
        f'<div class="content"><h1>{title}</h1>{body_core}</div>'
        f"{sidebar}{script}{footer}</body></html>")
    return html.encode("utf-8")


def _article(rng: random.Random) -> bytes:
    title = _words(rng, rng.randint(3, 6)).title()
    paras = []
    n_paras = rng.randint(3, 12)
    js_at = rng.randrange(n_paras)
    auto_at = rng.randrange(n_paras)
    for j in range(n_paras):
        body = _words(rng, rng.randint(30, 80))
        if j == js_at:
            body += (f' <a href="javascript:void(0)">{rng.choice(WORDS)}'
                     "</a>")
        if j == auto_at:
            url = f"https://{_domain(rng)}/{_slug(rng)}"
            body += f' <a href="{url}">{url}</a>'
        paras.append(f"<p>{body}</p>")
    return _page(rng, title, "".join(paras))


def _table_page(rng: random.Random) -> bytes:
    title = _words(rng, 3).title()
    tables = []
    for _ in range(rng.randint(1, 3)):
        n_cols = rng.randint(3, 8)
        n_rows = rng.randint(2, 20)
        headers = [rng.choice(HEADER_KEYWORDS) + f"_{c}"
                   for c in range(n_cols)]
        head = "<tr>" + "".join(f"<th>{h}</th>" for h in headers) + "</tr>"
        rows = []
        pipe_r, pipe_c = rng.randrange(n_rows), rng.randrange(n_cols)
        for r in range(n_rows):
            cells = []
            for c in range(n_cols):
                choice = rng.random()
                if choice < 0.3:
                    val = str(rng.randint(0, 9999))
                elif choice < 0.4:
                    val = ""
                else:
                    val = _words(rng, rng.randint(1, 3))
                if r == pipe_r and c == pipe_c:
                    val = f"a|b\nc {val}"
                cells.append(f"<td>{val}</td>")
            rows.append("<tr>" + "".join(cells) + "</tr>")
        tables.append(f"<table>{head}{''.join(rows)}</table>")
    filler = f"<p>{_words(rng, 40)}</p>"
    return _page(rng, title, filler + "".join(tables))


def _money(rng: random.Random, lo: float, hi: float) -> float:
    return round(rng.uniform(lo, hi), 2)


def _invoice_page(rng: random.Random) -> bytes:
    inv_no = f"INV-{rng.randint(0, 999999):06d}"
    date = (f"2025-{rng.randint(1, 12):02d}-{rng.randint(1, 28):02d}")
    seller = _words(rng, 2).title() + " GmbH"
    buyer = _words(rng, 2).title() + " SARL"
    currency = rng.choice(("EUR", "USD", "GBP"))
    items = []
    total_c = 0
    for _ in range(rng.randint(2, 8)):
        qty = rng.randint(1, 9)
        unit_c = rng.randint(100, 99999)  # cents: exact 2-dec fixed point
        line_c = qty * unit_c
        total_c += line_c
        items.append((f"{_words(rng, 2)}", qty, unit_c / 100.0,
                      line_c / 100.0))
    rows = "".join(
        f"<tr><td>{d}</td><td>{q}</td><td>{u:.2f}</td><td>{t:.2f}</td>"
        "</tr>" for d, q, u, t in items)
    body = (
        f"<p>Invoice Number: {inv_no}</p>"
        f"<p>Invoice Date: {date}</p>"
        f"<p>Currency: {currency}</p>"
        f"<p>Seller: {seller}</p>"
        f"<p>Buyer: {buyer}</p>"
        '<table class="line-items">'
        "<tr><th>Description</th><th>Quantity</th><th>Unit Price</th>"
        f"<th>Line Total</th></tr>{rows}</table>"
        f"<p>Total: {total_c / 100.0:.2f} {currency}</p>")
    return _page(rng, f"Invoice {inv_no}", body)


def _receipt_page(rng: random.Random) -> bytes:
    merchant = _words(rng, 2).title() + " Store"
    date = (f"2025-{rng.randint(1, 12):02d}-{rng.randint(1, 28):02d}")
    items = []
    total_c = 0
    for _ in range(rng.randint(1, 6)):
        qty = rng.randint(1, 5)
        price_c = rng.randint(50, 9999)
        line_c = qty * price_c
        total_c += line_c
        items.append((_words(rng, 2), qty, price_c / 100.0, line_c / 100.0))
    lis = "".join(
        f"<li>{n} x{q} @ {p:.2f} = {t:.2f}</li>" for n, q, p, t in items)
    body = (
        f"<p>Date: {date}</p>"
        f'<ul class="items">{lis}</ul>'
        f"<p>Total: {total_c / 100.0:.2f}</p>"
        f"<p>Payment: {rng.choice(('card', 'cash', 'mobile'))}</p>"
        "<p>Currency: EUR</p>")
    return _page(rng, merchant, body)


def _math_page(rng: random.Random) -> bytes:
    title = _words(rng, 3).title()
    paras = []
    for _ in range(rng.randint(2, 5)):
        sym = rng.choice(MATH_CHARS)
        inline = f"${rng.choice('xyzab')}^{rng.randint(2, 9)} {sym}$"
        paras.append(f"<p>{_words(rng, 15)} {inline} {_words(rng, 10)}</p>")
        if rng.random() < 0.6:
            block = (f"$$\\frac{{{rng.choice('abc')}}}"
                     f"{{{rng.randint(2, 9)}}} {rng.choice(MATH_CHARS)}$$")
            paras.append(f"<p>{block}</p>")
        paras.append(
            f"<p>{_words(rng, 8)} E = mc<sup>2</sup> and "
            f"H<sub>2</sub>O {_words(rng, 6)}</p>")
    return _page(rng, title, "".join(paras))


# ---------------------------------------------------------------------------
# DOCX builder
# ---------------------------------------------------------------------------

_DOCX_XML_TMPL = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<w:document xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main" xmlns:m="http://schemas.openxmlformats.org/officeDocument/2006/math" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships" xmlns:wp="http://schemas.openxmlformats.org/drawingml/2006/wordprocessingDrawing" xmlns:a="http://schemas.openxmlformats.org/drawingml/2006/main">
<w:body>{body}</w:body>
</w:document>"""

_DOCX_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId10" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/hyperlink" Target="{href}" TargetMode="External"/>
<Relationship Id="rId11" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/image" Target="media/image1.png"/>
</Relationships>"""

_DOCX_NUMBERING = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<w:numbering xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main">
<w:abstractNum w:abstractNumId="0"><w:lvl w:ilvl="0"><w:numFmt w:val="bullet"/></w:lvl><w:lvl w:ilvl="1"><w:numFmt w:val="bullet"/></w:lvl></w:abstractNum>
<w:abstractNum w:abstractNumId="1"><w:lvl w:ilvl="0"><w:numFmt w:val="decimal"/></w:lvl><w:lvl w:ilvl="1"><w:numFmt w:val="decimal"/></w:lvl></w:abstractNum>
<w:num w:numId="1"><w:abstractNumId w:val="0"/></w:num>
<w:num w:numId="2"><w:abstractNumId w:val="1"/></w:num>
</w:numbering>"""

_DOCX_FOOTNOTES = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<w:footnotes xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main" xmlns:m="http://schemas.openxmlformats.org/officeDocument/2006/math">
<w:footnote w:type="separator" w:id="-1"><w:p/></w:footnote>
<w:footnote w:id="2"><w:p><w:r><w:t xml:space="preserve">{note}</w:t></w:r></w:p></w:footnote>
</w:footnotes>"""


def _w_p(text: str, style: str = "") -> str:
    spr = (f'<w:pPr><w:pStyle w:val="{style}"/></w:pPr>' if style else "")
    return (f"<w:p>{spr}<w:r><w:t xml:space=\"preserve\">{text}</w:t>"
            "</w:r></w:p>")


def _docx_doc(rng: random.Random) -> bytes:
    title = _words(rng, 3).title()
    body = [_w_p(title, "Heading1")]
    for _ in range(rng.randint(2, 5)):
        body.append(_w_p(_words(rng, rng.randint(15, 40))))
    body.append(_w_p(_words(rng, 3).title(), "Heading2"))
    # hyperlink (rels-resolved), image, footnote reference
    href = f"https://{_domain(rng)}/{_slug(rng)}"
    body.append(
        "<w:p><w:r><w:t xml:space=\"preserve\">see </w:t></w:r>"
        f"<w:hyperlink r:id=\"rId10\"><w:r><w:t>{rng.choice(WORDS)}"
        "</w:t></w:r></w:hyperlink>"
        "<w:r><w:t xml:space=\"preserve\"> for details</w:t></w:r>"
        "<w:r><w:footnoteReference w:id=\"2\"/></w:r></w:p>")
    alt = _words(rng, 2)
    body.append(
        "<w:p><w:r><w:drawing><wp:inline>"
        f"<wp:docPr id=\"1\" name=\"img1\" descr=\"{alt}\"/>"
        "<a:graphic><a:graphicData><a:blip r:embed=\"rId11\"/>"
        "</a:graphicData></a:graphic></wp:inline></w:drawing></w:r></w:p>")
    # one bullet (numId 1) and one numbered (numId 2) list
    for num_id in (1, 2):
        for _ in range(rng.randint(2, 4)):
            body.append(
                "<w:p><w:pPr><w:numPr><w:ilvl w:val=\"0\"/>"
                f"<w:numId w:val=\"{num_id}\"/></w:numPr></w:pPr>"
                f"<w:r><w:t>{_words(rng, rng.randint(2, 5))}</w:t>"
                "</w:r></w:p>")
    # a nested run: bullet item with two numbered children (ilvl 1)
    body.append(
        "<w:p><w:pPr><w:numPr><w:ilvl w:val=\"0\"/>"
        "<w:numId w:val=\"1\"/></w:numPr></w:pPr>"
        f"<w:r><w:t>{_words(rng, 3)}</w:t></w:r></w:p>")
    for _ in range(2):
        body.append(
            "<w:p><w:pPr><w:numPr><w:ilvl w:val=\"1\"/>"
            "<w:numId w:val=\"2\"/></w:numPr></w:pPr>"
            f"<w:r><w:t>{_words(rng, 2)}</w:t></w:r></w:p>")
    # one table
    cells = "".join(
        "<w:tr>" + "".join(
            f"<w:tc><w:p><w:r><w:t>{_words(rng, 2)}</w:t></w:r></w:p>"
            "</w:tc>" for _ in range(3)) + "</w:tr>"
        for _ in range(rng.randint(2, 4)))
    body.append(f"<w:tbl>{cells}</w:tbl>")
    # inline math: fraction a/b
    num, den = rng.choice("xyz"), rng.randint(2, 9)
    body.append(
        "<w:p><w:r><w:t xml:space=\"preserve\">inline </w:t></w:r>"
        "<m:oMath><m:f><m:num><m:r><m:t>"
        f"{num}</m:t></m:r></m:num><m:den><m:r><m:t>{den}</m:t></m:r>"
        "</m:den></m:f></m:oMath>"
        "<w:r><w:t xml:space=\"preserve\"> follows</w:t></w:r></w:p>")
    # block math: superscript e^2
    base, expo = rng.choice("abe"), rng.randint(2, 5)
    body.append(
        "<m:oMathPara><m:oMath><m:sSup><m:e><m:r><m:t>"
        f"{base}</m:t></m:r></m:e><m:sup><m:r><m:t>{expo}</m:t></m:r>"
        "</m:sup></m:sSup></m:oMath></m:oMathPara>")
    xml = _DOCX_XML_TMPL.format(body="".join(body))
    buf = io.BytesIO()

    # zipfile.writestr(str_name, ...) stamps CURRENT wall-clock time
    # into each member header, silently breaking gen_page's
    # pure-function-of-(i, seed) contract at the byte level; pin the
    # DOS epoch instead
    def zstr(z: zipfile.ZipFile, name: str, data) -> None:
        zi = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
        zi.compress_type = zipfile.ZIP_DEFLATED
        z.writestr(zi, data)

    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        zstr(z, "[Content_Types].xml",
             '<?xml version="1.0"?><Types/>')
        zstr(z, "word/document.xml", xml)
        zstr(z, "word/_rels/document.xml.rels",
             _DOCX_RELS.format(href=href))
        zstr(z, "word/numbering.xml", _DOCX_NUMBERING)
        zstr(z, "word/footnotes.xml",
             _DOCX_FOOTNOTES.format(note=_words(rng, 6)))
        zstr(z, "word/media/image1.png", b"\x89PNG\r\n\x1a\nstub")
    return buf.getvalue()


# ---------------------------------------------------------------------------
# PDF builder (minimal valid PDF 1.4, uncompressed text content streams)
# ---------------------------------------------------------------------------

def _hex_tj(text: str) -> str:
    """Emit a show-text op with the string as a HEX literal ``<4E6F>``
    (uppercase, the common writer convention)."""
    return f"<{text.encode('latin-1').hex().upper()}> Tj"


# Escape-edge literals for the hex/escape variant: raw PDF syntax on
# the left, the spec-decoded text the kernel must produce on the right
# (balanced unescaped parens; octal incl. 8-bit wrap; dropped
# backslash before a non-escape char; backslash-EOL line continuation;
# odd-length hex padded with a trailing 0 nibble).
_ESCAPE_EDGE_OPS = (
    r"(Nested (parens (deep)) survive) Tj",
    r"(Octal \101\102\103 wraps \777 drops \8) Tj",
    "(joined across \\\nlines) Tj",
    "<4A6F696E5> Tj",  # odd length -> "JoinP"
)
ESCAPE_EDGE_TEXTS = (
    "Nested (parens (deep)) survive",
    "Octal ABC wraps \xff drops 8",
    "joined across lines",
    "JoinP",
)


# ToUnicode CMap for the composite-font (Type0 / Identity-H) variant:
# glyph code = ord(char) + 0x100, mapped back by one bfrange covering
# printable ASCII. The shift proves the kernel actually consults the
# CMap — a latin-1 passthrough of the 2-byte codes would be garbage.
_FIXTURE_CMAP = (b"/CIDInit /ProcSet findresource begin\n"
                 b"begincmap\n"
                 b"1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n"
                 b"1 beginbfrange\n<0120> <017E> <0020>\nendbfrange\n"
                 b"endcmap\nend\n")


def _cmap_tj(text: str) -> str:
    """Show-text op as 2-byte glyph codes under _FIXTURE_CMAP."""
    return "<" + "".join(f"{ord(c) + 0x100:04X}" for c in text) + "> Tj"


def _tj_kerned(text: str) -> str:
    """Show-text as a TJ array with NO space glyphs: words separated by
    a -250 inter-word kern (the space stands or falls with the kernel's
    kern-as-space rule) and the first word split by a small -20
    intra-word kern that must NOT become a space."""
    words = text.split(" ")
    frags: list[str] = []
    w0 = words[0]
    if len(w0) > 2:
        mid = len(w0) // 2
        frags.append(f"({w0[:mid]}) -20 ({w0[mid:]})")
    else:
        frags.append(f"({w0})")
    for w in words[1:]:
        frags.append(f"-250 ({w})")
    return "[" + " ".join(frags) + "] TJ"


def _pdf_doc(rng: random.Random, compress: "bool | str" = False,
             hex_strings: bool = False, scrambled: bool = False,
             pdf15: bool = False, cmap: bool = False,
             rotated: bool = False, split_streams: bool = False,
             tj_kerned: bool = False) -> bytes:
    """Plain text PDF. Variants (each a pure flag — the rng draw
    sequence for page CONTENT is identical across variants, so a
    variant and its plain twin must extract to byte-identical text):

    - ``compress``: FlateDecode content streams (classic xref); the
      string values ``"lzw85"`` ([/ASCII85Decode /LZWDecode] chain)
      and ``"rle"`` (/RunLengthDecode) select the r4 filter variants
    - ``hex_strings``: show-text ops as hex literals + a block of
      escape-edge literal strings (page 0)
    - ``scrambled``: text runs emitted in SHUFFLED stream order with
      absolute Tm positioning — extraction must reconstruct reading
      order purely from geometry
    - ``pdf15``: PDF 1.5 layout — page dicts in an /ObjStm object
      stream, /XRef cross-reference stream, flate content
    - ``cmap``: Type0 /Identity-H font with a /ToUnicode CMap — every
      show op is 2-byte glyph codes (ord+0x100) that only decode to the
      twin's text THROUGH the CMap's bfrange
    - ``rotated``: the whole page body is drawn 90° CCW (Tm carries the
      rotation; device coords are the rotated layout within the
      MediaBox) — extraction must recover reading order in the text's
      own upright frame
    - ``split_streams``: every page's content is SPLIT across two
      stream objects referenced by a /Contents ARRAY, and the two
      objects are stored in reversed file order — page attribution
      must follow the document structure, not stream order
    - ``tj_kerned``: show ops are TJ arrays with no space glyphs —
      words separated by -250 kerns (must decode as spaces), first
      word split by a -20 kern (must not)
    """
    n_pages = rng.randint(1, 3)
    pages_runs: list[list[tuple[int, int, str]]] = []
    for p in range(n_pages):
        two_col = rng.random() < 0.4
        runs: list[tuple[int, int, str]] = []
        title = _words(rng, 3).title() if p == 0 else ""
        y = 760
        if title:
            runs.append((72, y, title))
            y -= 24
        n_lines = rng.randint(4, 10)
        for _ in range(n_lines):
            runs.append((72, y, _words(rng, rng.randint(4, 8))))
            y -= 16
        if two_col:
            y2 = 760
            for _ in range(rng.randint(3, 8)):
                runs.append((320, y2, _words(rng, rng.randint(3, 6))))
                y2 -= 16
        pages_runs.append(runs)
    if scrambled:  # after ALL content draws, so twins share content
        for runs in pages_runs:
            rng.shuffle(runs)
    page_streams = []
    for p, runs in enumerate(pages_runs):
        ops = ["BT", "/F1 12 Tf"]
        for x0, y0, text in runs:
            if rotated:
                # 90° CCW: upright (x0, y0) lands at device
                # (792 - y0, x0); reading order must invert this
                ops.append(f"0 1 -1 0 {792 - y0} {x0} Tm")
            else:
                ops.append(f"1 0 0 1 {x0} {y0} Tm")
            ops.append(_cmap_tj(text) if cmap
                       else _hex_tj(text) if hex_strings
                       else _tj_kerned(text) if tj_kerned
                       else f"({text}) Tj")
        if hex_strings and p == 0:
            # fixed low-y block (body never descends past ~500)
            for k, raw_op in enumerate(_ESCAPE_EDGE_OPS):
                ops.append(f"1 0 0 1 72 {80 - 16 * k} Tm")
                ops.append(raw_op)
        ops.append("ET")
        if split_streams:
            # split mid-ops (graphics/text state spans the page's
            # concatenated /Contents streams, per spec — even BT..ET
            # may straddle the boundary)
            k = max(2, len(ops) // 2)
            page_streams.append(["\n".join(ops[:k]).encode("latin-1"),
                                 "\n".join(ops[k:]).encode("latin-1")])
        else:
            page_streams.append("\n".join(ops).encode("latin-1"))
    if pdf15:
        return _pdf_assemble_15(page_streams)
    return _pdf_assemble(page_streams, compress, cmap=cmap)


def _pdf_from_lines(lines: list[str], compress: bool = False,
                    hex_strings: bool = False) -> bytes:
    """Single-page PDF with one Tj per text line at x=72, descending y —
    the structured-document (invoice/receipt) PDF layout."""
    ops = ["BT", "/F1 12 Tf"]
    y = 760
    for line in lines:
        ops.append(f"1 0 0 1 72 {y} Tm")
        ops.append(_hex_tj(line) if hex_strings else f"({line}) Tj")
        y -= 16
    ops.append("ET")
    return _pdf_assemble(["\n".join(ops).encode("latin-1")], compress)


def _pdf_invoice(rng: random.Random, hex_strings: bool = False) -> bytes:
    """Invoice-as-PDF: the same field grammar as _invoice_page rendered
    as PDF text lines. Always UNCOMPRESSED so the DuckDB oracle can
    regex the content-stream literals — or, for the ``hex_strings``
    variant, unhex-decode the ``<...>`` show-text tokens (both oracles
    stay independent of the kernel)."""
    inv_no = f"INV-{rng.randint(0, 999999):06d}"
    date = f"2025-{rng.randint(1, 12):02d}-{rng.randint(1, 28):02d}"
    seller = _words(rng, 2).title() + " GmbH"
    buyer = _words(rng, 2).title() + " SARL"
    currency = rng.choice(("EUR", "USD", "GBP"))
    lines = [f"Invoice {inv_no}",
             f"Invoice Number: {inv_no}",
             f"Invoice Date: {date}",
             f"Currency: {currency}",
             f"Seller: {seller}",
             f"Buyer: {buyer}"]
    total_c = 0
    for _ in range(rng.randint(2, 8)):
        qty = rng.randint(1, 9)
        unit_c = rng.randint(100, 99999)
        line_c = qty * unit_c
        total_c += line_c
        lines.append(f"{_words(rng, 2)} x{qty} @ {unit_c / 100.0:.2f}"
                     f" = {line_c / 100.0:.2f}")
    lines.append(f"Total: {total_c / 100.0:.2f} {currency}")
    return _pdf_from_lines(lines, hex_strings=hex_strings)


def _pdf_receipt(rng: random.Random) -> bytes:
    """Receipt-as-PDF (uncompressed, same grammar as _receipt_page)."""
    merchant = _words(rng, 2).title() + " Store"
    date = f"2025-{rng.randint(1, 12):02d}-{rng.randint(1, 28):02d}"
    lines = [merchant, f"Date: {date}"]
    total_c = 0
    for _ in range(rng.randint(1, 6)):
        qty = rng.randint(1, 5)
        price_c = rng.randint(50, 9999)
        line_c = qty * price_c
        total_c += line_c
        lines.append(f"{_words(rng, 2)} x{qty} @ {price_c / 100.0:.2f}"
                     f" = {line_c / 100.0:.2f}")
    lines.append(f"Total: {total_c / 100.0:.2f}")
    lines.append(f"Payment: {rng.choice(('card', 'cash', 'mobile'))}")
    lines.append("Currency: EUR")
    return _pdf_from_lines(lines)


def _lzw_encode(data: bytes) -> bytes:
    """Writer twin of the kernel's /LZWDecode (TIFF-style LZW,
    EarlyChange=1 — the PDF spec default, PDF 32000-1 §7.4.4). MSB-first
    bit packing, 9→12-bit codes, 256=ClearTable, 257=EOD. The width
    bump is one code EARLY: codes are written at width+1 bits as soon
    as the next free code exceeds 2^width - 1 (so the first 10-bit
    code is the one emitted when the table holds 512 entries). The
    kernel's decoder mirrors this exactly; the round-trip and the
    TIFF-spec vector are pinned in test_kernels."""
    out = bytearray()
    bitbuf = 0
    nbits = 0
    width = 9

    def emit(code: int) -> None:
        nonlocal bitbuf, nbits
        bitbuf = (bitbuf << width) | code
        nbits += width
        while nbits >= 8:
            out.append((bitbuf >> (nbits - 8)) & 0xFF)
            nbits -= 8
        bitbuf &= (1 << nbits) - 1

    table = {bytes([i]): i for i in range(256)}
    next_code = 258
    emit(256)
    w = b""
    for byte in data:
        wc = w + bytes([byte])
        if wc in table:
            w = wc
            continue
        emit(table[w])
        table[wc] = next_code
        next_code += 1
        if next_code > (1 << width) - 1 and width < 12:
            width += 1
        w = bytes([byte])
        if next_code >= 4093:  # table nearly full: flush + clear
            emit(table[w])
            emit(256)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
            w = b""
    if w:
        emit(table[w])
    emit(257)
    if nbits:  # flush the partial final byte, zero-padded
        out.append((bitbuf << (8 - nbits)) & 0xFF)
    return bytes(out)


def _rle_encode(data: bytes) -> bytes:
    """Writer twin of /RunLengthDecode (PDF 32000-1 §7.4.5): repeats
    of ≥3 become (257-n, byte) repeat runs; everything else literal
    chunks of ≤128 bytes; EOD 128."""
    out = bytearray()
    i = 0
    n = len(data)
    lit_start = i

    def flush_literals(end: int) -> None:
        nonlocal lit_start
        while lit_start < end:
            chunk = data[lit_start:min(end, lit_start + 128)]
            out.append(len(chunk) - 1)
            out.extend(chunk)
            lit_start += len(chunk)

    while i < n:
        j = i
        while j < n and j - i < 128 and data[j] == data[i]:
            j += 1
        if j - i >= 3:
            flush_literals(i)
            out.append(257 - (j - i))
            out.append(data[i])
            i = j
            lit_start = i
        else:
            i = j
    flush_literals(n)
    out.append(128)
    return bytes(out)


def _pdf_assemble(page_streams: list[bytes], compress: bool,
                  cmap: bool = False) -> bytes:
    objs: list[bytes] = []

    def add(body: bytes) -> int:
        objs.append(body)
        return len(objs)

    if cmap:
        cm = add(b"<< /Length %d >>\nstream\n%s\nendstream"
                 % (len(_FIXTURE_CMAP), _FIXTURE_CMAP))
        font = add(b"<< /Type /Font /Subtype /Type0 /BaseFont /Fixture "
                   b"/Encoding /Identity-H /ToUnicode %d 0 R >>" % cm)
    else:
        font = add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    import zlib as _z

    def stream_obj(s: bytes) -> int:
        # ``compress`` is False (raw), True/"flate" (FlateDecode),
        # "lzw85" ([/ASCII85Decode /LZWDecode] — the wire-safe chain,
        # filters DECLARED in decode order so LZW-compressed bytes ride
        # inside an ASCII85 armor), or "rle" (RunLengthDecode).
        if compress == "lzw85":
            import base64 as _b64
            c = _b64.a85encode(_lzw_encode(s)) + b"~>"
            return add(b"<< /Length %d /Filter [/ASCII85Decode"
                       b" /LZWDecode] >>\nstream\n%s\nendstream"
                       % (len(c), c))
        if compress == "rle":
            c = _rle_encode(s)
            return add(b"<< /Length %d /Filter /RunLengthDecode >>\n"
                       b"stream\n%s\nendstream" % (len(c), c))
        if compress:
            c = _z.compress(s, 6)
            return add(b"<< /Length %d /Filter /FlateDecode >>\nstream\n"
                       b"%s\nendstream" % (len(c), c))
        return add(b"<< /Length %d >>\nstream\n%s\nendstream"
                   % (len(s), s))

    # a page entry is one stream OR a list of chunks; multi-chunk pages
    # store their stream objects in REVERSED file order while the
    # /Contents array keeps logical order (page attribution, not file
    # position, must decide)
    content_ids: list[list[int]] = []
    for entry in page_streams:
        chunks = entry if isinstance(entry, list) else [entry]
        ids_file = [stream_obj(c) for c in reversed(chunks)]
        content_ids.append(list(reversed(ids_file)))
    page_ids = []
    pages_node_id = len(objs) + 1
    objs.append(b"")  # placeholder for pages node
    for cids in content_ids:
        if len(cids) == 1:
            contents = b"/Contents %d 0 R" % cids[0]
        else:
            contents = (b"/Contents [" +
                        b" ".join(b"%d 0 R" % c for c in cids) + b"]")
        pid = add(
            b"<< /Type /Page /Parent %d 0 R /MediaBox [0 0 612 792] "
            b"%s /Resources << /Font << /F1 %d 0 R >> >> >>"
            % (pages_node_id, contents, font))
        page_ids.append(pid)
    kids = b" ".join(b"%d 0 R" % p for p in page_ids)
    objs[pages_node_id - 1] = (
        b"<< /Type /Pages /Kids [%s] /Count %d >>"
        % (kids, len(page_ids)))
    catalog = add(b"<< /Type /Catalog /Pages %d 0 R >>" % pages_node_id)

    out = io.BytesIO()
    out.write(b"%PDF-1.4\n")
    offsets = [0]
    for i, body in enumerate(objs, start=1):
        offsets.append(out.tell())
        out.write(b"%d 0 obj\n" % i)
        out.write(body)
        out.write(b"\nendobj\n")
    xref_pos = out.tell()
    out.write(b"xref\n0 %d\n" % (len(objs) + 1))
    out.write(b"0000000000 65535 f \n")
    for off in offsets[1:]:
        out.write(b"%010d 00000 n \n" % off)
    out.write(b"trailer\n<< /Size %d /Root %d 0 R >>\nstartxref\n%d\n%%%%EOF"
              % (len(objs) + 1, catalog, xref_pos))
    return out.getvalue()


def _pdf_assemble_15(page_streams: list[bytes]) -> bytes:
    """PDF 1.5 'compressed' layout: FlateDecode content streams stay
    top-level objects (streams may not live inside object streams), but
    EVERY dictionary-only object — font, pages node, page dicts,
    catalog — is packed into a /Type /ObjStm object stream, and the
    cross-reference is a /Type /XRef STREAM (W [1 4 1] binary entries,
    type-2 rows pointing into the ObjStm) with no classic xref table
    at all. This is the layout modern writers emit; readers that only
    scan classic xref tables see zero page dictionaries."""
    import struct
    import zlib as _z
    k = len(page_streams)
    comp = [_z.compress(s, 6) for s in page_streams]
    objstm_num = k + 1
    xref_num = k + 2
    font_num = xref_num + 1
    pages_num = xref_num + 2
    page_nums = [pages_num + 1 + i for i in range(k)]
    catalog_num = pages_num + 1 + k
    kids = b" ".join(b"%d 0 R" % p for p in page_nums)
    inner: list[tuple[int, bytes]] = [
        (font_num,
         b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"),
        (pages_num,
         b"<< /Type /Pages /Kids [%s] /Count %d >>" % (kids, k)),
    ]
    for i, pn in enumerate(page_nums):
        inner.append((pn, (
            b"<< /Type /Page /Parent %d 0 R /MediaBox [0 0 612 792] "
            b"/Contents %d 0 R /Resources << /Font << /F1 %d 0 R >> >> >>"
            % (pages_num, i + 1, font_num))))
    inner.append((catalog_num,
                  b"<< /Type /Catalog /Pages %d 0 R >>" % pages_num))
    bodies = b"\n".join(b for _, b in inner)
    offs, pos = [], 0
    for _, b in inner:
        offs.append(pos)
        pos += len(b) + 1
    header = b" ".join(b"%d %d" % (num, off)
                       for (num, _), off in zip(inner, offs)) + b"\n"
    stm_comp = _z.compress(header + bodies, 6)

    out = io.BytesIO()
    out.write(b"%PDF-1.5\n")
    offsets: dict[int, int] = {}
    for i, c in enumerate(comp, start=1):
        offsets[i] = out.tell()
        out.write(b"%d 0 obj\n<< /Length %d /Filter /FlateDecode >>"
                  b"\nstream\n" % (i, len(c)))
        out.write(c)
        out.write(b"\nendstream\nendobj\n")
    offsets[objstm_num] = out.tell()
    out.write(b"%d 0 obj\n<< /Type /ObjStm /N %d /First %d /Length %d "
              b"/Filter /FlateDecode >>\nstream\n"
              % (objstm_num, len(inner), len(header), len(stm_comp)))
    out.write(stm_comp)
    out.write(b"\nendstream\nendobj\n")
    xref_off = out.tell()
    entries = bytearray()
    entries += struct.pack(">BIB", 0, 0, 255)          # obj 0: free
    for i in range(1, objstm_num + 1):                 # type 1: offsets
        entries += struct.pack(">BIB", 1, offsets[i], 0)
    entries += struct.pack(">BIB", 1, xref_off, 0)     # the XRef itself
    for idx in range(len(inner)):                      # type 2: in ObjStm
        entries += struct.pack(">BIB", 2, objstm_num, idx)
    xdata = _z.compress(bytes(entries), 6)
    out.write(b"%d 0 obj\n<< /Type /XRef /Size %d /W [1 4 1] "
              b"/Root %d 0 R /Length %d /Filter /FlateDecode >>"
              b"\nstream\n"
              % (xref_num, catalog_num + 1, catalog_num, len(xdata)))
    out.write(xdata)
    out.write(b"\nendstream\nendobj\n")
    out.write(b"startxref\n%d\n%%%%EOF" % xref_off)
    return out.getvalue()


# ---------------------------------------------------------------------------
# plain-text / markdown builder
# ---------------------------------------------------------------------------

def _text_doc(rng: random.Random) -> bytes:
    """text/plain or text/markdown payload (reference converts both).
    Markdown flavor carries headings + bullet lists; plain flavor is
    blank-line paragraphs with a title line."""
    markdown = rng.random() < 0.5
    title = _words(rng, 3).title()
    parts: list[str] = []
    if markdown:
        parts.append(f"# {title}")
        for _ in range(rng.randint(2, 5)):
            parts.append("")
            parts.append(_words(rng, rng.randint(25, 60)))
        parts.append("")
        parts.append(f"## {_words(rng, 2).title()}")
        parts.append("")
        for _ in range(rng.randint(2, 5)):
            parts.append(f"- {_words(rng, rng.randint(2, 6))}")
    else:
        parts.append(title)
        for _ in range(rng.randint(3, 7)):
            parts.append("")
            # paragraphs with interior hard-wrapped lines
            parts.append(_words(rng, rng.randint(10, 20)))
            parts.append(_words(rng, rng.randint(10, 20)))
    return "\n".join(parts).encode("utf-8")


# ---------------------------------------------------------------------------
# broken payloads
# ---------------------------------------------------------------------------

def _broken(rng: random.Random, oversize_bytes: int = 0) -> bytes:
    if oversize_bytes:
        return b"A" * oversize_bytes
    choice = rng.randrange(4)
    if choice == 0:
        return b"PK\x03\x04" + bytes(rng.randrange(256)
                                     for _ in range(64))  # truncated zip
    if choice == 1:
        return b"%PDF-1.4\nGARBAGE no objects here"  # invalid pdf
    if choice == 2:
        return b""  # empty
    return (b"\x89PNG\r\n\x1a\n" +
            bytes(rng.randrange(256) for _ in range(128)))  # unsupported


_TAG_RE = re.compile(r"<[^>]+>")


def _naive_text(payload: bytes, kind: str) -> str:
    """WET-style naive strip (the `text` column; NOT the target)."""
    if kind in ("docx_doc", "pdf_doc", "broken"):
        return ""
    try:
        html = payload.decode("utf-8", errors="replace")
    except Exception:
        return ""
    import html as _h
    return _h.unescape(re.sub(r"\s+", " ", _TAG_RE.sub(" ", html))).strip()


_BUILDERS = {
    "article": _article,
    "text_doc": _text_doc,
    "table_page": _table_page,
    "invoice_page": _invoice_page,
    "receipt_page": _receipt_page,
    "math_page": _math_page,
    "docx_doc": _docx_doc,
    "pdf_doc": _pdf_doc,
}


def gen_page(i: int, seed: int = SEED, oversize_every: int = 0,
             oversize_bytes: int = 2 * 1024 * 1024) -> dict:
    """Generate row i. Pure function of (i, seed): safe to call from any
    partition in any order."""
    rng = random.Random(f"{seed}:{i}")
    kind = kind_of(rng.random())
    domain = _domain(rng)
    url = f"https://{domain}/{_slug(rng)}-{i:08d}"
    if kind == "broken":
        oversize = bool(oversize_every) and i % oversize_every == 0
        payload = _broken(rng, oversize_bytes if oversize else 0)
    elif kind == "pdf_doc":
        # variant decided OUTSIDE the rng (pure function of i): every
        # 4th±1 pdf carries structured fields (invoice / receipt — the
        # reference's extractInvoicePdf/extractReceiptPdf fixtures);
        # every other invoice uses HEX string literals. Plain pdfs
        # (i%4∈{0,2} ⇒ i%12∈{0,2,4,6,8,10}) cycle the writer variants:
        # flate, Type0+ToUnicode-CMap (half the slot: TJ-kerned
        # spaceless arrays), scrambled-Tm, PDF-1.5 objstm/xref-stream,
        # 90°-rotated (half the slot: /Contents-array pages split
        # across out-of-file-order streams), hex+escape edges. Every
        # variant extracts byte-identical to its plain twin (parity
        # tests), so the committed goldens are layout-invariant.
        # Structured pdfs stay uncompressed so the DuckDB oracles can
        # regex (or unhex) the raw content streams.
        if i % 4 == 1:
            payload = _pdf_invoice(rng, hex_strings=(i % 8 == 5))
        elif i % 4 == 3:
            payload = _pdf_receipt(rng)
        elif i % 12 == 6:
            payload = _pdf_doc(rng, pdf15=True)
        elif i % 12 == 4:
            payload = _pdf_doc(rng, scrambled=True)
        elif i % 12 == 10:
            payload = _pdf_doc(rng, hex_strings=True)
        elif i % 24 == 14:
            payload = _pdf_doc(rng, tj_kerned=True)
        elif i % 12 == 2:
            payload = _pdf_doc(rng, cmap=True)
        elif i % 24 == 20:
            payload = _pdf_doc(rng, split_streams=True)
        elif i % 12 == 8:
            payload = _pdf_doc(rng, rotated=True)
        elif i % 48 == 24:
            # quarter of the flate slot: [/ASCII85Decode /LZWDecode]
            # chain (r4) — same text as the flate twin
            payload = _pdf_doc(rng, compress="lzw85")
        elif i % 48 == 36:
            # quarter of the flate slot: /RunLengthDecode (r4)
            payload = _pdf_doc(rng, compress="rle")
        else:
            payload = _pdf_doc(rng, compress=(i % 12 == 0))
    else:
        payload = _BUILDERS[kind](rng)
    return {
        "url": url,
        "warc_ts": BASE_TS + _dt.timedelta(seconds=i),
        "html": payload,
        "text": _naive_text(payload, kind),
        "lang": "fr" if rng.random() < 0.2 else "en",
        # generation-side truth, for tests only (dropped from the table)
        "_kind": kind,
    }


def gen_pages(n: int, seed: int = SEED, oversize_every: int = 0):
    """Driver-side generation for tests: returns list of row dicts
    (without the _kind helper unless keep_kind)."""
    return [gen_page(i, seed, oversize_every) for i in range(n)]


def _rows_to_arrow(rows: list[dict]):
    import pyarrow as pa
    return pa.table({
        "url": [r["url"] for r in rows],
        "warc_ts": pa.array([r["warc_ts"] for r in rows],
                            type=pa.timestamp("us")),
        "html": pa.array([r["html"] for r in rows], type=pa.binary()),
        "text": [r["text"] for r in rows],
        "lang": [r["lang"] for r in rows],
    })


def write_pages_parquet(path: str, n: int, seed: int = SEED,
                        oversize_every: int = 0) -> None:
    """Write the pages table as ONE parquet file with pyarrow (no Spark
    needed — used by tests)."""
    import pyarrow.parquet as pq
    pq.write_table(_rows_to_arrow(gen_pages(n, seed, oversize_every)),
                   path)


def write_pages_dir(path: str, n: int, n_files: int = 8,
                    seed: int = SEED) -> None:
    """Write the pages table as a DIRECTORY of parquet part files, so a
    no-shuffle scan parallelizes across files (one task per file)."""
    import os
    import pyarrow.parquet as pq
    os.makedirs(path, exist_ok=True)
    per = -(-n // n_files)
    for f in range(n_files):
        lo, hi = f * per, min((f + 1) * per, n)
        if lo >= hi:
            break
        rows = [gen_page(i, seed) for i in range(lo, hi)]
        for r in rows:
            r.pop("_kind")
        pq.write_table(_rows_to_arrow(rows),
                       os.path.join(path, f"part-{f:04d}.parquet"))


# ---------------------------------------------------------------------------
# Zipf documents corpus (r4): an open few-thousand-word vocabulary with
# power-law document frequencies, so text-analysis ops run at their
# PRODUCTION thresholds (tfidf max_df 0.5) instead of the relaxed ones
# the driver's 31-word `documents` table forces. Same determinism bar
# as gen_page: every row is a pure function of (seed, i).
# ---------------------------------------------------------------------------

ZIPF_VOCAB_SIZE = 4000

_SYLLABLES = (
    "ba be bi bo bu da de di do du fa fe fi fo fu ga ge gi go gu "
    "ka ke ki ko ku la li lo lu ma me mi mo mu na ne ni no nu "
    "pa pe pi po pu ra re ri ro ru sa se si so su ta te ti to tu "
    "va ve vi vo vu za ze zi zo zu").split()


def zipf_word(rank: int) -> str:
    """Word for vocabulary rank ``rank`` (0-based): ``rank+1`` spelled
    in bijective base-len(_SYLLABLES). Unique by construction, and
    frequent words come out shorter — Zipf's law of abbreviation for
    free. NOT drawn from an rng: the vocabulary is a fixed total
    function, so corpus growth never reshuffles it."""
    n = rank + 1
    syls = []
    b = len(_SYLLABLES)
    while n > 0:
        n, rem = divmod(n - 1, b)
        syls.append(_SYLLABLES[rem])
    return "".join(reversed(syls))


def gen_zipf_doc(i: int, seed: int = SEED,
                 vocab_size: int = ZIPF_VOCAB_SIZE) -> dict:
    """One row of the Zipf corpus, schema-compatible with the driver's
    documents table (doc_id, text, lang, source, n_chars). Content
    words draw rank = floor(V^u) with u uniform — density ∝ 1/rank, a
    Zipf(s≈1) tail — so a handful of head words exceed any max_df cut
    while the tail stays rare; ~1/3 of tokens are REAL en/fr stopwords
    matching the doc's lang column, making language-ID a non-trivial
    prediction. Sentences end with '.' attached to the final token
    (punct_ratio signal)."""
    from .ops.textstats import EN_STOPWORDS, FR_STOPWORDS
    rng = random.Random(f"{seed}:zipf:{i}")
    lang = "fr" if rng.random() < 0.25 else "en"
    stops = FR_STOPWORDS if lang == "fr" else EN_STOPWORDS
    n_tokens = rng.randint(30, 150)
    toks: list[str] = []
    sent_left = rng.randint(6, 14)
    for _ in range(n_tokens):
        if rng.random() < 0.34:
            w = stops[rng.randrange(len(stops))]
        else:
            w = zipf_word(int(vocab_size ** rng.random()) - 1)
        sent_left -= 1
        if sent_left == 0:
            w += "."
            sent_left = rng.randint(6, 14)
        toks.append(w)
    text = " ".join(toks)
    return {"doc_id": i, "text": text, "lang": lang,
            "source": f"zsrc{i % 8}", "n_chars": len(text)}


def write_zipf_docs_dir(path: str, n: int, n_files: int = 8,
                        seed: int = SEED) -> None:
    """Write the Zipf corpus as a directory of parquet part files
    (same layout contract as write_pages_dir: one scan task per file,
    DuckDB reads the identical bytes via glob)."""
    import os
    import pyarrow as pa
    import pyarrow.parquet as pq
    os.makedirs(path, exist_ok=True)
    per = -(-n // n_files)
    for f in range(n_files):
        lo, hi = f * per, min((f + 1) * per, n)
        if lo >= hi:
            break
        rows = [gen_zipf_doc(i, seed) for i in range(lo, hi)]
        tbl = pa.table({
            "doc_id": pa.array([r["doc_id"] for r in rows],
                               type=pa.int64()),
            "text": [r["text"] for r in rows],
            "lang": [r["lang"] for r in rows],
            "source": [r["source"] for r in rows],
            "n_chars": pa.array([r["n_chars"] for r in rows],
                                type=pa.int64()),
        })
        pq.write_table(tbl, os.path.join(path, f"part-{f:04d}.parquet"))


# ---------------------------------------------------------------------------
# Skew-stress corpus (r4): the adversarial shape for the dedup pipeline
# at scale — one ~10k-document EXACT-duplicate mega-cluster (a hot
# fingerprint key in the dedup groupBy; mega-clusters of identical
# bytes are what 10^12-page crawls actually contain), a block of
# 4-document NEAR-duplicate star clusters (the Jaccard pair graph), and
# a long unique tail with mixed language/quality for the gate. Pure
# function of (seed, i) like gen_page, so executors generate it
# embarrassingly parallel at any scale.
# ---------------------------------------------------------------------------

SKEW_HOT_DOCS = 10_000       # exact-duplicate mega-cluster size
SKEW_NEAR_DOCS = 30_000      # near-dup block: 7,500 star clusters of 4


def _skew_cluster_tokens(rng: random.Random, n_tokens: int,
                         salt: str) -> list[str]:
    """EN-stopword-laced tokens that pass the curation gate
    (n_tokens ≥ ~55 → length signal 1.0; no punctuation; stopword
    share ~0.15 → quality ≈ 0.85, far above the 0.5 gate so one-token
    variants can't flip across it; lang_pred = en — en-stop count ~9
    vs ~0 fr collisions). Content words carry a CLUSTER salt: near-dup
    documents in the wild share *rare* content, so a cluster's
    shingles must be cluster-local (df ≤ cluster size), not drawn from
    the corpus-wide head. Without the salt, head-word trigrams
    ("ba ba ba"…) cross the max_df hot-shingle cut as the corpus
    grows, shaving measured Jaccard on star edges and breaking the
    stress run's exact survivor accounting. Only pure-stopword
    trigrams remain shareable across clusters, and at 0.15 density a
    specific stop trigram lands in ~(0.01)³·58·N docs — double-digit
    df at N=400k, far under the cut."""
    from .ops.textstats import EN_STOPWORDS
    toks = []
    for _ in range(n_tokens):
        if rng.random() < 0.15:
            toks.append(EN_STOPWORDS[rng.randrange(len(EN_STOPWORDS))])
        else:
            toks.append(salt +
                        zipf_word(int(ZIPF_VOCAB_SIZE ** rng.random()) - 1))
    return toks


def gen_skew_doc(i: int, seed: int = SEED, hot: int = SKEW_HOT_DOCS,
                 near: int = SKEW_NEAR_DOCS) -> dict:
    """Row i of the skew-stress corpus.

    - ``i < hot``: byte-identical text (ONE fingerprint carrying 10k
      rows — the exact-dedup window's hot key). Identical docs never
      reach the Jaccard stage: the pipeline collapses them first,
      which is precisely why a mega-cluster does NOT explode the pair
      graph (pairs would be O(hot²) ≈ 5·10⁷).
    - ``hot ≤ i < hot+near``: star clusters of 4 — v0 is the cluster
      base (~60 tokens), v1..v3 each replace ONE token at a distinct
      position with a cluster-unique marker. 3-gram Jaccard
      (v0, vk) ≈ (S-3)/(S+3) ≈ 0.9 ≥ threshold, while (v1, v2) ≈ 0.8
      may fall under it — connectivity comes from the star's center
      via connected components, exactly the chain-closure case the
      CC stage exists for.
    - tail: unique zipf docs, 25% fr (gated out by langs=('en',)) and
      short docs (gated by quality) mixed in."""
    if i < hot:
        rng = random.Random(f"{seed}:skewhot")
        text = " ".join(_skew_cluster_tokens(rng, 60, "h"))
        return {"doc_id": i, "text": text, "lang": "en",
                "source": "hotdup", "n_chars": len(text)}
    if i < hot + near:
        g, v = divmod(i - hot, 4)
        rng = random.Random(f"{seed}:skewnear:{g}")
        toks = _skew_cluster_tokens(rng, 60, f"c{g}")
        if v > 0:
            toks[(7 * v) % len(toks)] = f"zq{g}x{v}"
        text = " ".join(toks)
        return {"doc_id": i, "text": text, "lang": "en",
                "source": f"near{v}", "n_chars": len(text)}
    return {**gen_zipf_doc(i, seed=seed), "doc_id": i,
            "source": "tail"}


# ---------------------------------------------------------------------------
# URL-variant crawl log (r4): groups of rows whose urls differ only by
# canonicalization-removable noise — case in scheme/host, default
# ports, fragments, tracking query params, trailing slashes — the
# shape url-level dedup faces on a real crawl. Deterministic per
# (seed, i); rows with v ≥ the group's variant count are holes, so the
# log also contains singleton groups.
# ---------------------------------------------------------------------------

def gen_url_log_row(i: int, seed: int = SEED) -> "dict | None":
    g, v = divmod(i, 4)
    rng = random.Random(f"{seed}:urllog:{g}")
    domain = _domain(rng)
    path = f"/{_slug(rng)}-{g:07d}"
    n_var = 1 + rng.randrange(4)
    if v >= n_var:
        return None
    has_q = rng.random() < 0.3
    q = f"?id={g}" if has_q else ""
    if v == 0:
        url = f"https://{domain}{path}{q}"
    elif v == 1:
        noisy = "".join(c.upper() if k % 2 == 0 else c
                        for k, c in enumerate(domain))
        url = f"HTTPS://{noisy}:443{path}{q}#frag{g}"
    elif v == 2:
        sep = "&" if has_q else "?"
        url = (f"https://{domain}{path}{q}{sep}"
               f"utm_source=news&fbclid=f{g}")
    else:
        url = (f"https://{domain}{path}?utm_campaign=c{g}&id={g}"
               if has_q else f"https://{domain}{path}/")
    return {"url": url,
            "warc_ts": BASE_TS + _dt.timedelta(seconds=i)}


def write_url_log_dir(path: str, n: int, n_files: int = 8,
                      seed: int = SEED) -> None:
    """Write the url-variant log as a directory of parquet part files
    (same contract as write_pages_dir: Spark scans the files, DuckDB
    reads the identical bytes via glob)."""
    import os
    import pyarrow as pa
    import pyarrow.parquet as pq
    os.makedirs(path, exist_ok=True)
    per = -(-n // n_files)
    for f in range(n_files):
        lo, hi = f * per, min((f + 1) * per, n)
        if lo >= hi:
            break
        rows = [r for r in (gen_url_log_row(i, seed)
                            for i in range(lo, hi)) if r]
        tbl = pa.table({
            "url": [r["url"] for r in rows],
            "warc_ts": pa.array([r["warc_ts"] for r in rows],
                                type=pa.timestamp("us")),
        })
        pq.write_table(tbl, os.path.join(path, f"part-{f:04d}.parquet"))


# ---------------------------------------------------------------------------
# Repetition corpus (r4): natural Zipf prose interleaved with
# template/spam documents whose REPETITION is the only tell — repeated
# sentences and a dominant bigram at natural length/punct/stopword
# ratios, i.e. exactly the pages Gopher-style repetition gates exist
# to catch. Deterministic per (seed, i); schema-compatible with the
# driver's documents table.
# ---------------------------------------------------------------------------

def gen_rep_doc(i: int, seed: int = SEED) -> dict:
    if i % 3 != 2:
        d = gen_zipf_doc(i, seed=seed)
        d["source"] = "natural"
        return d
    rng = random.Random(f"{seed}:rep:{i}")
    base = " ".join(
        zipf_word(int(ZIPF_VOCAB_SIZE ** rng.random()) - 1)
        for _ in range(rng.randint(4, 7)))
    n_rep = rng.randint(3, 9)
    uniq = [" ".join(zipf_word(int(ZIPF_VOCAB_SIZE ** rng.random()) - 1)
                     for _ in range(rng.randint(5, 9)))
            for _ in range(rng.randint(1, 4))]
    sents = [base] * n_rep + uniq
    rng.shuffle(sents)
    text = ". ".join(sents) + "."
    return {"doc_id": i, "text": text, "lang": "en",
            "source": "template", "n_chars": len(text)}


def write_rep_docs_dir(path: str, n: int, n_files: int = 8,
                       seed: int = SEED) -> None:
    """Write the repetition corpus as a directory of parquet part
    files (same layout contract as write_pages_dir)."""
    import os
    import pyarrow as pa
    import pyarrow.parquet as pq
    os.makedirs(path, exist_ok=True)
    per = -(-n // n_files)
    cols = ("doc_id", "text", "lang", "source", "n_chars")
    for f in range(n_files):
        lo, hi = f * per, min((f + 1) * per, n)
        if lo >= hi:
            break
        rows = [gen_rep_doc(i, seed) for i in range(lo, hi)]
        tbl = pa.table({c: [r[c] for r in rows] for c in cols})
        pq.write_table(tbl, os.path.join(path, f"part-{f:04d}.parquet"))


# ---------------------------------------------------------------------------
# PII corpus (r4): zipf prose with a KNOWN number of injected emails /
# phone numbers / IPv4 addresses per doc (the counts are carried as
# columns so tests can assert the scrubber found exactly the
# injections — zipf words carry no digits or '@', so there are no
# accidental matches). Deterministic per (seed, i).
# ---------------------------------------------------------------------------

def gen_pii_doc(i: int, seed: int = SEED) -> dict:
    rng = random.Random(f"{seed}:pii:{i}")
    toks = [zipf_word(int(ZIPF_VOCAB_SIZE ** rng.random()) - 1)
            for _ in range(rng.randint(25, 60))]
    n_e = rng.randrange(3)
    n_p = rng.randrange(3)
    n_i = rng.randrange(2)
    inject = (
        [f"user{i}x{k}@mail{(i + k) % 7}.example.com"
         for k in range(n_e)]
        + [[f"555-{200 + (i + k) % 700}-{1000 + (3 * i + k) % 9000}",
            f"({200 + (i + k) % 800}) {100 + i % 900} "
            f"{1000 + (7 * i + k) % 9000}",
            f"+{1 + (i + k) % 89} {20 + i % 80} {100 + k % 900} "
            f"{1000 + i % 9000}"][(i + k) % 3]
           for k in range(n_p)]
        + [f"{10 + (i + k) % 240}.{i % 256}.{(3 * i + k) % 256}."
           f"{(7 * i) % 256}" for k in range(n_i)])
    for tok in inject:
        toks.insert(rng.randrange(len(toks) + 1), tok)
    return {"doc_id": i, "text": " ".join(toks),
            "n_emails_true": n_e, "n_phones_true": n_p,
            "n_ips_true": n_i}


def write_pii_docs_dir(path: str, n: int, n_files: int = 8,
                       seed: int = SEED) -> None:
    import os
    import pyarrow as pa
    import pyarrow.parquet as pq
    os.makedirs(path, exist_ok=True)
    per = -(-n // n_files)
    cols = ("doc_id", "text", "n_emails_true", "n_phones_true",
            "n_ips_true")
    for f in range(n_files):
        lo, hi = f * per, min((f + 1) * per, n)
        if lo >= hi:
            break
        rows = [gen_pii_doc(i, seed) for i in range(lo, hi)]
        tbl = pa.table({c: [r[c] for r in rows] for c in cols})
        pq.write_table(tbl, os.path.join(path, f"part-{f:04d}.parquet"))


# ---------------------------------------------------------------------------
# Newline-line corpus (r4): documents as '\n'-joined LINES (the C4 /
# RefinedWeb unit of line-level dedup), where a global pool of
# boilerplate lines ("subscribe ..." chrome) recurs across ~half the
# docs — exactly the cross-document repeated-line signal line_dedup
# removes. Deterministic per (seed, i).
# ---------------------------------------------------------------------------

N_BOILER_LINES = 6


def _boiler_line(k: int, seed: int = SEED) -> str:
    rng = random.Random(f"{seed}:boiler:{k}")
    return "boiler " + " ".join(
        zipf_word(rng.randrange(400)) for _ in range(4)) + f" b{k}"


def gen_line_doc(i: int, seed: int = SEED) -> dict:
    rng = random.Random(f"{seed}:lines:{i}")
    lines = [" ".join(zipf_word(int(ZIPF_VOCAB_SIZE ** rng.random())
                                - 1)
                      for _ in range(rng.randint(5, 12)))
             + f" u{i}l{j}"  # unique suffix: natural lines NEVER
             for j in range(rng.randint(3, 8))]  # collide across docs
    if rng.random() < 0.5:
        for _ in range(rng.randint(1, 3)):
            lines.insert(rng.randrange(len(lines) + 1),
                         _boiler_line(rng.randrange(N_BOILER_LINES),
                                      seed))
    return {"doc_id": i, "text": "\n".join(lines)}


def write_line_docs_dir(path: str, n: int, n_files: int = 8,
                        seed: int = SEED) -> None:
    import os
    import pyarrow as pa
    import pyarrow.parquet as pq
    os.makedirs(path, exist_ok=True)
    per = -(-n // n_files)
    for f in range(n_files):
        lo, hi = f * per, min((f + 1) * per, n)
        if lo >= hi:
            break
        rows = [gen_line_doc(i, seed) for i in range(lo, hi)]
        tbl = pa.table({"doc_id": [r["doc_id"] for r in rows],
                        "text": [r["text"] for r in rows]})
        pq.write_table(tbl, os.path.join(path, f"part-{f:04d}.parquet"))


# ---------------------------------------------------------------------------
# Benchmark-items table (r4): eval items for decontamination testing.
# 40% of items copy a contiguous 10-24-token span out of a Zipf-corpus
# document (CONTAMINATED — the zipf corpus is a pure function of the
# seed, so items match the corpus at every scale factor; the driver
# `documents` table is NOT usable here because its content differs
# between sf dirs); the rest are fresh text sharing no 8-gram with
# any document.
# ---------------------------------------------------------------------------

def gen_bench_items(n: int, n_docs: int, seed: int = SEED) -> list:
    items = []
    for i in range(n):
        rng = random.Random(f"{seed}:bench:{i}")
        if rng.random() < 0.4:
            src = rng.randrange(n_docs)
            toks = gen_zipf_doc(src, seed=seed)["text"].split()
            span = rng.randint(10, min(24, len(toks)))
            lo = rng.randrange(len(toks) - span + 1)
            text, from_doc = " ".join(toks[lo:lo + span]), src
        else:
            # 'q' prefix keeps fresh tokens out of the documents
            # vocabulary: no accidental 8-gram overlap
            text = " ".join(
                "q" + zipf_word(int(ZIPF_VOCAB_SIZE ** rng.random())
                                - 1)
                for _ in range(rng.randint(10, 24)))
            from_doc = -1
        items.append({"bench_id": i, "question": text,
                      "from_doc": from_doc})
    return items


def write_bench_items_dir(path: str, n: int, n_docs: int,
                          n_files: int = 4, seed: int = SEED) -> None:
    import os
    import pyarrow as pa
    import pyarrow.parquet as pq
    os.makedirs(path, exist_ok=True)
    rows = gen_bench_items(n, n_docs, seed)
    per = -(-n // n_files)
    cols = ("bench_id", "question", "from_doc")
    for f in range(n_files):
        lo, hi = f * per, min((f + 1) * per, n)
        if lo >= hi:
            break
        part = rows[lo:hi]
        tbl = pa.table({c: [r[c] for r in part] for c in cols})
        pq.write_table(tbl, os.path.join(path, f"part-{f:04d}.parquet"))


# ---------------------------------------------------------------------------
# Second crawl snapshot (r4): the same pages table one crawl cycle
# later — a deterministic per-url fate: every 20th page is GONE,
# every 10th (surviving) page CHANGED (payload grows a revision
# marker; extraction semantics irrelevant — the diff op compares
# digests), a 5% tail of new urls ADDED, everything else byte-equal
# with a later fetch timestamp.
# ---------------------------------------------------------------------------

def gen_page_v2(i: int, seed: int = SEED) -> "dict | None":
    if i % 20 == 7:
        return None  # gone
    r = gen_page(i, seed)
    r["warc_ts"] = r["warc_ts"] + _dt.timedelta(days=30)
    if i % 10 == 3:
        r["html"] = r["html"] + b"<!-- rev2 -->"
    return r


def write_pages_v2_dir(path: str, n: int, n_files: int = 8,
                       seed: int = SEED) -> None:
    """Snapshot-2 twin of write_pages_dir: rows 0..n get their v2
    fate; rows n..n+n//20 are newly discovered urls."""
    import os
    import pyarrow.parquet as pq
    os.makedirs(path, exist_ok=True)
    total = n + n // 20
    per = -(-total // n_files)
    for f in range(n_files):
        lo, hi = f * per, min((f + 1) * per, total)
        if lo >= hi:
            break
        rows = []
        for i in range(lo, hi):
            r = gen_page_v2(i, seed) if i < n else gen_page(i, seed)
            if r is not None:
                rows.append(r)
        pq.write_table(_rows_to_arrow(rows),
                       os.path.join(path, f"part-{f:04d}.parquet"))


# ---------------------------------------------------------------------------
# Encrypted-PDF fixture (r4): RC4 standard-security-handler twins of
# the corpus's PDF pages (owner password set, user password EMPTY —
# the "owner-locked but world-readable" files that dominate encrypted
# PDFs in web crawls). Streams are RC4'd per spec Algorithms 1-5; the
# /Encrypt dict + /ID are spliced into the classic trailer. Applies
# only to trailer-layout PDFs with direct /Length (all our writers).
# ---------------------------------------------------------------------------

def pdf_encrypt(payload: bytes, owner_pw: bytes = b"owner",
                v: int = 2, r: int = 3, length_bits: int = 128,
                p: int = -44) -> bytes:
    from .kernels.pdf_crypt import (file_key, owner_value,
                                    transform_streams,
                                    _user_check_bytes)
    import hashlib as _hl
    import re as _re
    assert b"trailer" in payload, "classic xref-trailer layout only"
    n = length_bits // 8 if v == 2 else 5
    id0 = _hl.md5(payload).digest()  # deterministic file id
    o = owner_value(owner_pw, b"", r, n)
    key = file_key(o, p, id0, r, n)
    u = (_user_check_bytes(key, id0, r) + b"\x00" * 32)[:32]
    body = transform_streams(payload, key)
    encnum = max(int(m.group(1)) for m in
                 _re.finditer(rb"(\d+)\s+\d+\s+obj\b", body)) + 1
    enc_obj = (b"%d 0 obj\n<< /Filter /Standard /V %d /R %d "
               b"/Length %d /O <%s> /U <%s> /P %d >>\nendobj\n"
               % (encnum, v, r, length_bits,
                  o.hex().encode(), u.hex().encode(), p))
    idhex = id0.hex().encode()
    ti = body.index(b"trailer")
    body = body[:ti] + enc_obj + body[ti:]
    return _re.sub(
        rb"trailer\s*<<",
        b"trailer\n<< /Encrypt %d 0 R /ID [<%s> <%s>] "
        % (encnum, idhex, idhex),
        body, count=1)


def _rebuild_classic_xref(body: bytes) -> bytes:
    """Regenerate the classic xref table + /Size + startxref after
    object offsets moved (AES ciphertext is longer than plaintext).
    Assumes the single-xref fixture layout (gen 0 objects only)."""
    import re as _re
    xm = _re.search(rb"\nxref\n0 \d+\n", body)
    tm = _re.search(rb"trailer\n", body, )
    assert xm and tm and tm.start() > xm.start()
    head = body[:xm.start()]
    # match over b"\n"+head so an object at offset 0 still matches;
    # the digit at prefixed position m.start(1) sits at m.start(1)-1
    # in head coordinates
    offs = {int(m.group(1)): m.start(1) - 1 for m in
            _re.finditer(rb"\n(\d+)\s+0\s+obj\b", b"\n" + head)}
    size = max(offs) + 1
    entries = [b"0000000000 65535 f \n"]
    for num in range(1, size):
        entries.append(b"%010d 00000 n \n" % offs[num])
    trailer = body[tm.start():]
    trailer = _re.sub(rb"/Size \d+", b"/Size %d" % size, trailer,
                      count=1)
    trailer = _re.sub(rb"startxref\n\d+\n",
                      b"startxref\n%d\n" % (len(head) + 1), trailer,
                      count=1)
    return head + b"\nxref\n0 %d\n" % size + b"".join(entries) \
        + trailer


def pdf_encrypt_aes(payload: bytes, owner_pw: bytes = b"owner",
                    p: int = -44) -> bytes:
    """AESV2 (AES-128-CBC, /V 4 /R 4) twin of a classic-layout PDF:
    every stream becomes IV + CBC ciphertext with deterministic
    per-object IVs (md5 of num/gen/id — fixtures must be byte-
    deterministic), direct /Length values are rewritten, the crypt-
    filter /Encrypt dictionary is spliced in, and the xref table is
    REBUILT (unlike RC4, AES changes offsets)."""
    import hashlib as _hl
    import re as _re

    from .kernels.aes import cbc_encrypt
    from .kernels.pdf_crypt import (_LENGTH_RE, _OBJ_RE, _STREAM_RE,
                                    _user_check_bytes, file_key,
                                    object_key, owner_value)
    assert b"trailer" in payload, "classic xref-trailer layout only"
    v, r, n = 4, 4, 16
    id0 = _hl.md5(payload).digest()
    o = owner_value(owner_pw, b"", r, n)
    key = file_key(o, p, id0, r, n)
    u = (_user_check_bytes(key, id0, r) + b"\x00" * 32)[:32]
    obj_marks = [(m.start(), int(m.group(1)), int(m.group(2)))
                 for m in _OBJ_RE.finditer(payload)]
    segs, pos = [], 0
    for m in _STREAM_RE.finditer(payload):
        params, start = m.group(1), m.end()
        lm = _LENGTH_RE.search(params)
        assert lm, "fixture PDFs carry direct /Length"
        end = start + int(lm.group(1))
        num = gen = 0
        for off, onum, ogen in obj_marks:
            if off > m.start():
                break
            num, gen = onum, ogen
        iv = _hl.md5(b"iv:%d:%d:" % (num, gen) + id0).digest()
        ct = iv + cbc_encrypt(object_key(key, num, gen, aes=True),
                              iv, payload[start:end])
        segs += [payload[pos:m.start(1) + lm.start(1)],
                 str(len(ct)).encode("ascii"),
                 payload[m.start(1) + lm.end(1):start], ct]
        pos = end
    segs.append(payload[pos:])
    body = b"".join(segs)
    encnum = max(int(m.group(1)) for m in
                 _re.finditer(rb"(\d+)\s+\d+\s+obj\b", body)) + 1
    enc_obj = (b"%d 0 obj\n<< /Filter /Standard /V %d /R %d "
               b"/Length 128 /CF << /StdCF << /CFM /AESV2 "
               b"/AuthEvent /DocOpen /Length 16 >> >> "
               b"/StmF /StdCF /StrF /StdCF "
               b"/O <%s> /U <%s> /P %d >>\nendobj\n"
               % (encnum, v, r, o.hex().encode(), u.hex().encode(),
                  p))
    idhex = id0.hex().encode()
    ti = body.index(b"xref\n0 ")
    body = body[:ti] + enc_obj + body[ti:]
    body = _re.sub(
        rb"trailer\n<<",
        b"trailer\n<< /Encrypt %d 0 R /ID [<%s> <%s>] "
        % (encnum, idhex, idhex),
        body, count=1)
    return _rebuild_classic_xref(body)


def write_pages_enc_dir(path: str, n: int, n_files: int = 4,
                        seed: int = SEED) -> None:
    """Every trailer-layout PDF page of the corpus, re-emitted as its
    encrypted twin (cycling RC4-128 R3 / RC4-40 R2 / AES-128 AESV2 by
    index) — same urls, so the flagship golden registry's per-url
    text sha256 is the independent expected answer for the decrypted
    extraction."""
    import os
    import pyarrow.parquet as pq
    os.makedirs(path, exist_ok=True)
    rows = []
    for i in range(n):
        r = gen_page(i, seed)
        if not r["html"].startswith(b"%PDF-") \
                or b"trailer" not in r["html"]:
            continue
        if i % 3 == 0:
            r["html"] = pdf_encrypt(r["html"], v=1, r=2,
                                    length_bits=40)
        elif i % 3 == 1:
            r["html"] = pdf_encrypt(r["html"])
        else:
            r["html"] = pdf_encrypt_aes(r["html"])
        rows.append(r)
    per = -(-len(rows) // n_files)
    for f in range(n_files):
        part = rows[f * per:(f + 1) * per]
        if not part:
            break
        pq.write_table(_rows_to_arrow(part),
                       os.path.join(path, f"part-{f:04d}.parquet"))


# ---------------------------------------------------------------------------
# Unicode-mess corpus (r4): zipf prose with deterministic NFD
# decompositions (e + combining acute for some 'e's), C0 control
# characters, and doubled/tabbed whitespace — the wire-format noise
# normalize_text exists to canonicalize. ~1/4 of docs are already
# clean (the 'changed' column must be a real signal).
# ---------------------------------------------------------------------------

def gen_unicode_doc(i: int, seed: int = SEED) -> dict:
    rng = random.Random(f"{seed}:uni:{i}")
    toks = [zipf_word(int(ZIPF_VOCAB_SIZE ** rng.random()) - 1)
            for _ in range(rng.randint(15, 40))]
    if i % 4:
        toks = [t.replace("e", "e\u0301", 1)  # NFD e+combining acute
                if rng.random() < 0.3 else t for t in toks]
        seps = [" ", "  ", "\t", " \n", "\x07 " if rng.random() < 0.2
                else " "]
        text = ""
        for t in toks:
            text += t + seps[rng.randrange(len(seps))]
    else:
        text = " ".join(toks)
    return {"doc_id": i, "text": text}


def write_unicode_docs_dir(path: str, n: int, n_files: int = 4,
                           seed: int = SEED) -> None:
    import os
    import pyarrow as pa
    import pyarrow.parquet as pq
    os.makedirs(path, exist_ok=True)
    per = -(-n // n_files)
    for f in range(n_files):
        lo, hi = f * per, min((f + 1) * per, n)
        if lo >= hi:
            break
        rows = [gen_unicode_doc(i, seed) for i in range(lo, hi)]
        tbl = pa.table({"doc_id": [r["doc_id"] for r in rows],
                        "text": [r["text"] for r in rows]})
        pq.write_table(tbl, os.path.join(path, f"part-{f:04d}.parquet"))


# ---------------------------------------------------------------------------
# HTML-metadata twin corpus (r4): the html pages of the main fixture
# with a deterministic head block spliced in right after <head> —
# <link rel=canonical>, og:title, and (for i%11==3) a robots-noindex
# meta. The splice is derived from (i, url) WITHOUT consuming rng
# draws, so the page bodies stay byte-identical to gen_page's. Pages
# with i%10==6 additionally emit a "?ref=alt" url-variant row whose
# canonical still points at the bare url — real collisions for the
# canonical-collapse gate.
# ---------------------------------------------------------------------------

def gen_meta_pages(i: int, seed: int = SEED) -> list[dict]:
    r = gen_page(i, seed)
    r.pop("_kind")
    if not r["html"].startswith(b"<!DOCTYPE"):
        return []
    url = r["url"]
    og = "og-" + url.rsplit("/", 1)[1]
    head = (f'<link rel="canonical" href="{url}">'
            f'<meta property="og:title" content="{og}">')
    if i % 11 == 3:
        head += '<meta name="robots" content="noindex">'
    r["html"] = r["html"].replace(b"<head>",
                                  b"<head>" + head.encode("ascii"), 1)
    rows = [r]
    if i % 10 == 6:
        v = dict(r)
        v["url"] = url + "?ref=alt"
        v["warc_ts"] = r["warc_ts"] + _dt.timedelta(hours=1)
        rows.append(v)
    return rows


def write_meta_pages_dir(path: str, n: int, n_files: int = 8,
                         seed: int = SEED) -> None:
    import os
    import pyarrow.parquet as pq
    os.makedirs(path, exist_ok=True)
    per = -(-n // n_files)
    for f in range(n_files):
        lo, hi = f * per, min((f + 1) * per, n)
        if lo >= hi:
            break
        rows = []
        for i in range(lo, hi):
            rows.extend(gen_meta_pages(i, seed))
        if rows:
            pq.write_table(_rows_to_arrow(rows),
                           os.path.join(path, f"part-{f:04d}.parquet"))


# ---------------------------------------------------------------------------
# robots.txt fixture (r4): one deterministic robots.txt per corpus
# domain — a '*' group with 0-3 Disallow prefixes drawn from the url
# slug vocabulary (so rules genuinely hit pages) and sometimes an
# Allow that extends the FIRST disallowed prefix (real
# longest-match-Allow-wins cases); ~30% of domains carry a
# 'User-agent: badbot / Disallow: /' group the '*' parser must skip;
# comments, blank lines, and an empty 'Disallow:' no-op exercise the
# parser.
# ---------------------------------------------------------------------------

def gen_robots_row(d_idx: int, seed: int = SEED) -> dict:
    domain = DOMAINS[d_idx]
    rng = random.Random(f"{seed}:robots:{domain}")
    lines = ["# fixture robots.txt", ""]
    if rng.random() < 0.3:
        lines += ["User-agent: badbot", "Disallow: /", ""]
    lines.append("User-agent: *")
    n_dis = rng.randint(0, 3)
    dis_words = [rng.choice(WORDS) for _ in range(n_dis)]
    for w in dis_words:
        lines.append(f"Disallow: /{w}")
    if dis_words and rng.random() < 0.6:
        lines.append(f"Allow: /{dis_words[0]}-{rng.choice(WORDS)}")
    if rng.random() < 0.15:
        lines.append("Disallow:")  # empty value = no-op per spec
    # drawn AFTER every other draw: adding this line (r4 politeness)
    # left all previously-generated rules byte-identical
    if rng.random() < 0.5:
        lines.append(f"Crawl-delay: {rng.randint(1, 9)}")
    # r5 (RFC 9309 semantics) — again drawn strictly AFTER all prior
    # draws, so every r4 rule above is byte-identical. Page paths are
    # '/{w1}-{w2}-{w3}-{8 digits}', so these patterns genuinely hit:
    # wildcard rules in the '*' group…
    if rng.random() < 0.5:
        w = rng.choice(WORDS)
        lines.append(f"Disallow: /*-{w}-")  # w as a NON-first word
        if rng.random() < 0.6:
            # longer wildcard Allow that must win by pattern length
            lines.append(f"Allow: /*-{w}-{rng.choice(WORDS)}-")
    if rng.random() < 0.3:
        lines.append(f"Disallow: /*{rng.randint(0, 9)}$")  # $-anchored
    # …a named group for this engine's token (overrides '*' entirely
    # for ~25% of domains), sometimes STACKED with another token…
    if rng.random() < 0.25:
        lines.append("")
        if rng.random() < 0.5:
            lines.append("User-agent: otherbot")  # stacked header
        lines.append("User-agent: EkBot")  # case-insensitive match
        for _ in range(rng.randint(1, 2)):
            lines.append(f"Disallow: /{rng.choice(WORDS)}")
        if rng.random() < 0.5:
            lines.append(f"Allow: /*-{rng.choice(WORDS)}-")
        if rng.random() < 0.4:
            lines.append(f"Crawl-delay: {rng.randint(1, 4)}")
    # …and a decoy group for some OTHER crawler that must be ignored
    if rng.random() < 0.2:
        lines += ["", "User-agent: megabot", "Disallow: /"]
    # r5b: global Sitemap directives (never group-scoped), drawn after
    # every earlier draw so all prior rules stay byte-identical
    if rng.random() < 0.6:
        lines += ["", f"Sitemap: https://{domain}/sitemap.xml"]
        if rng.random() < 0.3:
            lines.append(
                f"Sitemap: https://{domain}/sitemap-{rng.choice(WORDS)}.xml")
    return {"domain": domain, "robots_txt": "\n".join(lines) + "\n"}


def write_robots_parquet(path: str, seed: int = SEED) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq
    rows = [gen_robots_row(i, seed) for i in range(len(DOMAINS))]
    pq.write_table(pa.table({
        "domain": [r["domain"] for r in rows],
        "robots_txt": [r["robots_txt"] for r in rows]}), path)


# ---------------------------------------------------------------------------
# sitemap.xml fixture (r4): one urlset per domain listing up to 5 of
# the domain's REAL page urls (already crawled) plus 2 novel urls the
# crawler has not seen — the discovery signal a sitemap-driven
# frontier builder needs. gen_page_url replays only gen_page's url-
# determining rng prefix (kind, domain, slug), so building the per-
# domain url map never generates payloads; prefix equality is pinned
# in tests.
# ---------------------------------------------------------------------------

def gen_page_url(i: int, seed: int = SEED) -> str:
    rng = random.Random(f"{seed}:{i}")
    kind_of(rng.random())
    domain = _domain(rng)
    return f"https://{domain}/{_slug(rng)}-{i:08d}"


def gen_sitemaps(n_pages: int, seed: int = SEED) -> list[dict]:
    by_domain: dict[str, list[str]] = {d: [] for d in DOMAINS}
    for i in range(n_pages):
        u = gen_page_url(i, seed)
        d = u.split("/")[2]
        if len(by_domain[d]) < 5:
            by_domain[d].append(u)
    rows = []
    for di, domain in enumerate(DOMAINS):
        rng = random.Random(f"{seed}:sitemap:{domain}")
        ents = []
        # month cycle includes 12: a known url whose lastmod is AFTER
        # its crawl ts (BASE_TS = 2025-08-29) is the stale-refetch case
        months = ("01", "03", "05", "09", "12")
        for k, u in enumerate(by_domain[domain]):
            ents.append((u, f"2025-{months[(di + k) % 5]}"
                            f"-{1 + (di * 3 + k) % 27:02d}"))
        for k in range(2):
            ents.append((
                f"https://{domain}/{_slug(rng)}-new{di:04d}{k}",
                f"2025-0{1 + (di + k) % 9}-28"))
        body = "".join(
            f"<url><loc>{u}</loc><lastmod>{lm}</lastmod></url>\n"
            for u, lm in ents)
        rows.append({
            "domain": domain,
            "sitemap_xml": ('<?xml version="1.0" encoding="UTF-8"?>\n'
                            '<urlset xmlns="http://www.sitemaps.org/'
                            'schemas/sitemap/0.9">\n'
                            f"{body}</urlset>\n")})
    return rows


def write_sitemaps_parquet(path: str, n_pages: int,
                           seed: int = SEED) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq
    rows = gen_sitemaps(n_pages, seed)
    pq.write_table(pa.table({
        "domain": [r["domain"] for r in rows],
        "sitemap_xml": [r["sitemap_xml"] for r in rows]}), path)
