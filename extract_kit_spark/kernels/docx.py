"""DOCX → HTML conversion branch (SURVEY.md §2.6 O1–O6).

Pipeline parity with the reference's DocxConverter
(`office-to-markdown/src/converters/docx-converter.ts:130-245`):

1. math preprocess (O1–O3, `docx-preprocessor.ts:58-123`): read
   ``word/document.xml`` (+footnotes/endnotes when present) from the ZIP,
   rewrite ``<m:oMathPara>`` blocks to ``$$latex$$`` text runs wrapped in
   a ``<w:p>``, and remaining inline ``<m:oMath>`` to ``$latex$`` runs;
   fall back to the ORIGINAL xml on any error (same semantics).
2. document.xml → HTML (O5): the reference shells out to mammoth; mammoth
   is not vendorable here (§7.1), so this is a minimal deterministic
   WordprocessingML walker covering the fixture subset: headings via
   ``pStyle Heading1..6``/``Title``, paragraphs, bold/italic runs,
   tables, and list paragraphs via ``numPr`` → ``<ul><li>``.
3. downstream title extraction (O6) + HTML→markdown reuse the shared
   html_dom / serialize_md kernels, exactly like the HTML branch.

Pure Python (zipfile + re + ElementTree). Raises ExtractError with the
taxonomy code so the caller can quarantine without killing the task.
"""

from __future__ import annotations

import io
import re
import zipfile
import xml.etree.ElementTree as ET
from html import escape

from .errors import ExtractError, INVALID_DOCX, CORRUPTED_FILE
from .omml import omml_to_latex

W_NS = ("http://schemas.openxmlformats.org/wordprocessingml/2006/main")
_W = "{%s}" % W_NS

_OMATH_PARA_RE = re.compile(r"<m:oMathPara[^>]*>(.*?)</m:oMathPara>",
                            re.DOTALL)
_OMATH_RE = re.compile(r"<m:oMath[^>]*>(.*?)</m:oMath>", re.DOTALL)

# run template parity: docx-preprocessor.ts:45-48
_RUN_TMPL = "<w:r><w:t xml:space=\"preserve\">{}</w:t></w:r>"
_PARA_TMPL = "<w:p>{}</w:p>"

_MATH_MEMBERS = ("word/document.xml", "word/footnotes.xml",
                 "word/endnotes.xml")


def _xml_text_escape(s: str) -> str:
    return (s.replace("&", "&amp;").replace("<", "&lt;")
             .replace(">", "&gt;"))


def rewrite_math(xml: str) -> str:
    """O2+O3: block then inline math → LaTeX text runs."""

    def block_repl(m: re.Match) -> str:
        inner = m.group(1)
        parts = [omml_to_latex(om.group(0))
                 for om in _OMATH_RE.finditer(inner)]
        if not parts and inner.strip():
            parts = [omml_to_latex(inner)]
        runs = "".join(
            _RUN_TMPL.format(_xml_text_escape(f"$${p}$$")) for p in parts
            if p)
        return _PARA_TMPL.format(runs)

    xml = _OMATH_PARA_RE.sub(block_repl, xml)

    def inline_repl(m: re.Match) -> str:
        latex = omml_to_latex(m.group(0))
        return _RUN_TMPL.format(_xml_text_escape(f"${latex}$"))

    return _OMATH_RE.sub(inline_repl, xml)


def preprocess_docx(payload: bytes) -> bytes:
    """O1: unzip, rewrite math members, repack. Fallback-to-original on
    any rewrite error (parity: docx-preprocessor.ts:118-123); a broken
    ZIP raises (quarantine)."""
    try:
        zin = zipfile.ZipFile(io.BytesIO(payload))
        names = zin.namelist()
    except Exception as exc:
        raise ExtractError(CORRUPTED_FILE, f"not a zip: {exc}",
                           phase="preprocessing") from exc
    if "word/document.xml" not in names:
        raise ExtractError(INVALID_DOCX, "missing word/document.xml",
                           phase="preprocessing")
    try:
        out = io.BytesIO()
        with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zout:
            for name in names:
                data = zin.read(name)
                if name in _MATH_MEMBERS:
                    try:
                        data = rewrite_math(
                            data.decode("utf-8")).encode("utf-8")
                    except Exception:
                        pass  # keep original member (reference fallback)
                # pinned timestamp: writestr(str, ...) would stamp
                # wall-clock time, making the rewritten bytes
                # nondeterministic across runs
                zi = zipfile.ZipInfo(name,
                                     date_time=(1980, 1, 1, 0, 0, 0))
                zi.compress_type = zipfile.ZIP_DEFLATED
                zout.writestr(zi, data)
        return out.getvalue()
    except ExtractError:
        raise
    except Exception:
        return payload  # fallback-to-original semantics


_HEADING_STYLE_RE = re.compile(r"^(?:Heading|Titre)(\d)$", re.IGNORECASE)

R_NS = ("http://schemas.openxmlformats.org/officeDocument/2006/"
        "relationships")
_R = "{%s}" % R_NS
_REL_NS = "{http://schemas.openxmlformats.org/package/2006/relationships}"
_WP = ("{http://schemas.openxmlformats.org/drawingml/2006/"
       "wordprocessingDrawing}")
_A = "{http://schemas.openxmlformats.org/drawingml/2006/main}"


def parse_rels(rels_xml: str) -> dict[str, str]:
    """word/_rels/document.xml.rels → {rId: Target} (hyperlink and
    image resolution; mammoth does the same via the relationships
    part)."""
    try:
        root = ET.fromstring(rels_xml)
    except ET.ParseError:
        return {}
    return {rel.get("Id", ""): rel.get("Target", "")
            for rel in root.findall(f"{_REL_NS}Relationship")}


def parse_numbering(numbering_xml: str) -> dict[str, dict[str, str]]:
    """word/numbering.xml → {numId: {ilvl: numFmt}} so numPr paragraphs
    can pick <ol> (decimal/roman/letter) vs <ul> (bullet)."""
    try:
        root = ET.fromstring(numbering_xml)
    except ET.ParseError:
        return {}
    abstract: dict[str, dict[str, str]] = {}
    for an in root.findall(f"{_W}abstractNum"):
        aid = an.get(f"{_W}abstractNumId", "")
        lvls = {}
        for lvl in an.findall(f"{_W}lvl"):
            fmt = lvl.find(f"{_W}numFmt")
            lvls[lvl.get(f"{_W}ilvl", "0")] = (
                fmt.get(f"{_W}val", "bullet") if fmt is not None
                else "bullet")
        abstract[aid] = lvls
    nums: dict[str, dict[str, str]] = {}
    for num in root.findall(f"{_W}num"):
        nid = num.get(f"{_W}numId", "")
        aref = num.find(f"{_W}abstractNumId")
        if aref is not None:
            nums[nid] = abstract.get(aref.get(f"{_W}val", ""), {})
    return nums


def _para_style(p: ET.Element) -> str:
    el = p.find(f"{_W}pPr/{_W}pStyle")
    return el.get(f"{_W}val", "") if el is not None else ""


def _list_info(p: ET.Element,
               numbering: dict[str, dict[str, str]]) \
        -> tuple[str, int] | None:
    """None when not a list paragraph; else ('ol'|'ul', ilvl) via the
    numbering part's numFmt (mammoth: numbering.js level lookup)."""
    numpr = p.find(f"{_W}pPr/{_W}numPr")
    if numpr is None:
        return None
    nid_el = numpr.find(f"{_W}numId")
    ilvl_el = numpr.find(f"{_W}ilvl")
    nid = nid_el.get(f"{_W}val", "") if nid_el is not None else ""
    ilvl = ilvl_el.get(f"{_W}val", "0") if ilvl_el is not None else "0"
    fmt = numbering.get(nid, {}).get(ilvl, "bullet")
    kind = "ul" if fmt == "bullet" else "ol"
    try:
        level = int(ilvl)
    except ValueError:
        level = 0
    return kind, level


def _render_list_items(items: list[tuple[int, str, str]]) -> str:
    """Render consecutive list paragraphs [(ilvl, kind, inner)] as
    (possibly nested) list HTML: deeper ilvl runs nest inside the
    preceding <li> (mammoth's nesting behavior); a kind change at the
    same level closes and reopens the list element."""
    def rec(i: int, level: int) -> tuple[str, int]:
        out: list[str] = []
        kind = items[i][1]
        out.append(f"<{kind}>")
        li_parts: list[str] | None = None

        def flush_li() -> None:
            nonlocal li_parts
            if li_parts is not None:
                out.append("<li>" + "".join(li_parts) + "</li>")
                li_parts = None

        while i < len(items) and items[i][0] >= level:
            lvl, k, inner = items[i]
            if lvl > level:
                sub, i = rec(i, lvl)
                if li_parts is None:
                    li_parts = []
                li_parts.append(sub)
            elif k != kind:
                flush_li()
                out.append(f"</{kind}>")
                kind = k
                out.append(f"<{kind}>")
                li_parts = [inner]
                i += 1
            else:
                flush_li()
                li_parts = [inner]
                i += 1
        flush_li()
        out.append(f"</{kind}>")
        return "".join(out), i

    html, i = rec(0, items[0][0])
    while i < len(items):  # shallower than the opening level: siblings
        more, i2 = rec(i, items[i][0])
        html += more
        i = i2
    return html


def _drawing_html(node: ET.Element, rels: dict[str, str]) -> str:
    """w:drawing → <img src alt>: alt from wp:docPr descr|name, src
    from the a:blip embed relationship target (mammoth keeps images as
    <img> with the alt text; we reference the media member path)."""
    docpr = node.find(f".//{_WP}docPr")
    alt = ""
    if docpr is not None:
        alt = docpr.get("descr") or docpr.get("name") or ""
    blip = node.find(f".//{_A}blip")
    src = ""
    if blip is not None:
        src = rels.get(blip.get(f"{_R}embed", ""), "")
    return f'<img src="{escape(src, quote=True)}" ' \
           f'alt="{escape(alt, quote=True)}">'


def _run_html(r: ET.Element, rels: dict[str, str] | None = None,
              footmarks: list[str] | None = None) -> str:
    drawing = r.find(f"{_W}drawing")
    if drawing is not None:
        return _drawing_html(drawing, rels or {})
    fref = r.find(f"{_W}footnoteReference")
    if fref is not None:
        fid = fref.get(f"{_W}id", "")
        if footmarks is not None:
            footmarks.append(fid)
        return f"<sup>[{escape(fid)}]</sup>"
    text = "".join(t.text or "" for t in r.findall(f"{_W}t"))
    if not text:
        return ""
    html = escape(text)
    rpr = r.find(f"{_W}rPr")
    if rpr is not None:
        if rpr.find(f"{_W}i") is not None:
            html = f"<em>{html}</em>"
        if rpr.find(f"{_W}b") is not None:
            html = f"<strong>{html}</strong>"
    return html


def _para_inner_html(p: ET.Element, rels: dict[str, str] | None = None,
                     footmarks: list[str] | None = None) -> str:
    out = []
    for child in p:
        if child.tag == f"{_W}r":
            out.append(_run_html(child, rels, footmarks))
        elif child.tag == f"{_W}hyperlink":
            inner = "".join(_run_html(r, rels, footmarks)
                            for r in child.findall(f"{_W}r"))
            rid = child.get(f"{_R}id", "")
            anchor = child.get(f"{_W}anchor", "")
            href = (rels or {}).get(rid, "") or \
                (f"#{anchor}" if anchor else "")
            if href:
                out.append(
                    f'<a href="{escape(href, quote=True)}">{inner}</a>')
            else:
                out.append(inner)
    return "".join(out)


def _footnote_bodies(footnotes_xml: str,
                     rels: dict[str, str] | None = None) -> dict[str, str]:
    """word/footnotes.xml → {id: inner html} for real footnotes
    (separator/continuation members are skipped)."""
    try:
        root = ET.fromstring(footnotes_xml)
    except ET.ParseError:
        return {}
    bodies: dict[str, str] = {}
    for fn in root.findall(f"{_W}footnote"):
        if fn.get(f"{_W}type") in ("separator", "continuationSeparator"):
            continue
        fid = fn.get(f"{_W}id", "")
        inner = "".join(_para_inner_html(p, rels)
                        for p in fn.findall(f"{_W}p"))
        if inner.strip():
            bodies[fid] = inner
    return bodies


def docx_xml_to_html(document_xml: str,
                     rels: dict[str, str] | None = None,
                     numbering: dict[str, dict[str, str]] | None = None,
                     footnotes: dict[str, str] | None = None,
                     style_map: dict[str, str] | None = None) -> str:
    """WordprocessingML body → HTML (the mammoth analogue, O5):
    headings/Title, bold/italic runs, hyperlinks (rels-resolved),
    images (<img src alt>), bullet AND numbered lists via
    numbering.xml's numFmt, tables, footnote references + bodies, and a
    mammoth-style ``style_map`` override ({pStyle val: html tag},
    `office-to-markdown/src/types/converter.ts:9-13`)."""
    try:
        root = ET.fromstring(document_xml)
    except ET.ParseError as exc:
        raise ExtractError(INVALID_DOCX, f"document.xml parse: {exc}",
                           phase="docx-to-html") from exc
    body = root.find(f"{_W}body")
    if body is None:
        raise ExtractError(INVALID_DOCX, "no w:body", phase="docx-to-html")
    rels = rels or {}
    numbering = numbering or {}
    footnotes = footnotes or {}
    style_map = style_map or {}
    out: list[str] = []
    pending_list: list[tuple[int, str, str]] = []
    footmarks: list[str] = []

    def close_list() -> None:
        if pending_list:
            out.append(_render_list_items(pending_list))
            pending_list.clear()

    for el in body:
        if el.tag == f"{_W}p":
            inner = _para_inner_html(el, rels, footmarks)
            style = _para_style(el)
            info = _list_info(el, numbering)
            mapped = style_map.get(style)
            m = _HEADING_STYLE_RE.match(style)
            if mapped:
                close_list()
                out.append(f"<{mapped}>{inner}</{mapped}>")
            elif m:
                close_list()
                lvl = min(6, max(1, int(m.group(1))))
                out.append(f"<h{lvl}>{inner}</h{lvl}>")
            elif style.lower() == "title":
                close_list()
                out.append(f"<h1>{inner}</h1>")
            elif info is not None:
                kind, level = info
                pending_list.append((level, kind, inner))
            else:
                close_list()
                if inner.strip():
                    out.append(f"<p>{inner}</p>")
        elif el.tag == f"{_W}tbl":
            close_list()
            rows = []
            for tr in el.findall(f"{_W}tr"):
                cells = []
                for tc in tr.findall(f"{_W}tc"):
                    cell_html = "".join(
                        _para_inner_html(p, rels, footmarks)
                        for p in tc.findall(f"{_W}p"))
                    # merged cells: markdown tables need a RECTANGULAR
                    # grid, so a gridSpan-N cell is padded with N-1
                    # empty cells and a vMerge continuation (no
                    # val="restart") renders as one empty cell —
                    # content stays in its true column
                    tcpr = tc.find(f"{_W}tcPr")
                    span = 1
                    if tcpr is not None:
                        gs = tcpr.find(f"{_W}gridSpan")
                        if gs is not None:
                            try:
                                span = max(1, int(
                                    gs.get(f"{_W}val", "1")))
                            except ValueError:
                                span = 1
                        vm = tcpr.find(f"{_W}vMerge")
                        if vm is not None and \
                                vm.get(f"{_W}val") != "restart":
                            cell_html = ""
                    cells.append(f"<td>{cell_html}</td>")
                    cells.extend("<td></td>" for _ in range(span - 1))
                rows.append("<tr>" + "".join(cells) + "</tr>")
            out.append("<table>" + "".join(rows) + "</table>")
    close_list()
    # footnote bodies referenced from the text, in first-reference
    # order (mammoth appends them as a trailing list)
    seen = []
    for fid in footmarks:
        if fid in footnotes and fid not in seen:
            seen.append(fid)
    if seen:
        items = "".join(f"<li>[{escape(f)}] {footnotes[f]}</li>"
                        for f in seen)
        out.append(f"<ul>{items}</ul>")
    return "<body>" + "".join(out) + "</body>"


def docx_to_html(payload: bytes,
                 style_map: dict[str, str] | None = None) -> str:
    """Full DOCX branch: math rewrite (O1–O4) then walk to HTML (O5),
    resolving hyperlink/image relationships, list numbering, and
    footnote bodies from their package members when present.

    Math is rewritten on the in-memory member strings — semantically
    identical to preprocess_docx's unzip→rewrite→repack (same
    rewrite_math, same fallback-to-original on error) but without
    re-deflating the archive, which profiled at ~40% of per-doc cost.
    preprocess_docx remains the zip→zip surface for pipelines that
    need a rewritten .docx artifact."""
    try:
        zin = zipfile.ZipFile(io.BytesIO(payload))
        names = set(zin.namelist())
    except Exception as exc:
        raise ExtractError(CORRUPTED_FILE, f"not a zip: {exc}",
                           phase="preprocessing") from exc
    if "word/document.xml" not in names:
        raise ExtractError(INVALID_DOCX, "missing word/document.xml",
                           phase="preprocessing")
    try:
        def member(name: str) -> str:
            return (zin.read(name).decode("utf-8")
                    if name in names else "")

        def mathed(xml: str) -> str:
            if not xml:
                return xml
            try:
                return rewrite_math(xml)
            except Exception:
                return xml  # keep original member (reference fallback)

        doc_xml = mathed(member("word/document.xml"))
        rels = parse_rels(member("word/_rels/document.xml.rels"))
        numbering = parse_numbering(member("word/numbering.xml"))
        footnotes = _footnote_bodies(mathed(member("word/footnotes.xml")),
                                     rels)
    except ExtractError:
        raise
    except Exception as exc:
        raise ExtractError(CORRUPTED_FILE, str(exc),
                           phase="docx-to-html") from exc
    return docx_xml_to_html(doc_xml, rels=rels, numbering=numbering,
                            footnotes=footnotes, style_map=style_map)
