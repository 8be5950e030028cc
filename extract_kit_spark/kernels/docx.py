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
                zout.writestr(name, data)
        return out.getvalue()
    except ExtractError:
        raise
    except Exception:
        return payload  # fallback-to-original semantics


_HEADING_STYLE_RE = re.compile(r"^(?:Heading|Titre)(\d)$", re.IGNORECASE)


def _para_style(p: ET.Element) -> str:
    el = p.find(f"{_W}pPr/{_W}pStyle")
    return el.get(f"{_W}val", "") if el is not None else ""


def _is_list_para(p: ET.Element) -> bool:
    return p.find(f"{_W}pPr/{_W}numPr") is not None


def _run_html(r: ET.Element) -> str:
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


def _para_inner_html(p: ET.Element) -> str:
    return "".join(_run_html(r) for r in p.findall(f"{_W}r"))


def docx_xml_to_html(document_xml: str) -> str:
    """Minimal WordprocessingML body → HTML (the mammoth analogue, O5)."""
    try:
        root = ET.fromstring(document_xml)
    except ET.ParseError as exc:
        raise ExtractError(INVALID_DOCX, f"document.xml parse: {exc}",
                           phase="docx-to-html") from exc
    body = root.find(f"{_W}body")
    if body is None:
        raise ExtractError(INVALID_DOCX, "no w:body", phase="docx-to-html")
    out: list[str] = []
    open_list = False

    def close_list() -> None:
        nonlocal open_list
        if open_list:
            out.append("</ul>")
            open_list = False

    for el in body:
        if el.tag == f"{_W}p":
            inner = _para_inner_html(el)
            style = _para_style(el)
            m = _HEADING_STYLE_RE.match(style)
            if m:
                close_list()
                lvl = min(6, max(1, int(m.group(1))))
                out.append(f"<h{lvl}>{inner}</h{lvl}>")
            elif style.lower() == "title":
                close_list()
                out.append(f"<h1>{inner}</h1>")
            elif _is_list_para(el):
                if not open_list:
                    out.append("<ul>")
                    open_list = True
                out.append(f"<li>{inner}</li>")
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
                        _para_inner_html(p) for p in tc.findall(f"{_W}p"))
                    cells.append(f"<td>{cell_html}</td>")
                rows.append("<tr>" + "".join(cells) + "</tr>")
            out.append("<table>" + "".join(rows) + "</table>")
    close_list()
    return "<body>" + "".join(out) + "</body>"


def docx_to_html(payload: bytes) -> str:
    """Full DOCX branch: preprocess math (O1–O4) then walk to HTML (O5)."""
    pre = preprocess_docx(payload)
    try:
        with zipfile.ZipFile(io.BytesIO(pre)) as z:
            doc_xml = z.read("word/document.xml").decode("utf-8")
    except ExtractError:
        raise
    except Exception as exc:
        raise ExtractError(CORRUPTED_FILE, str(exc),
                           phase="docx-to-html") from exc
    return docx_xml_to_html(doc_xml)
