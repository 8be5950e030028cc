"""Deterministic HTML → Markdown serializer (the golden-byte kernel).

Re-expresses the reference's custom Turndown configuration and rules
(SURVEY.md §2.6, `office-to-markdown/src/utils/html-to-markdown.ts`):

- base config O8 (`:34-45`): atx headings, ``---`` hr, ``-`` bullets,
  fenced code, ``*``/``**`` emphasis, inlined links
- table rules O9–O10 (`:105-155`): pipe rows, header separator iff the
  first row "looks like a header" (th / bold / keyword regex `:418-422`),
  ``|``→``\\|`` escape, newline→space inside cells
- heading rule O11 (`:178-188`), math-preserve O12 (`:191-211`),
  paragraph O13 (`:214-227`), line-break O14 (`:230-240`),
  image O15 (`:243-266`), link O16 (`:269-299`), code O17 (`:302-312`),
  list-item O18 (`:315-331`), postprocess O19 (`:377-405`).

Output is a list of ``(kind, text)`` blocks (kind ∈ heading/para/table/
math/list/code/quote/rule/image) so the caller can assemble byte-stable
text AND span offsets in one pass (``assemble``). Pure Python, no Spark.
"""

from __future__ import annotations

import re

from .html_dom import Node

_HEADER_KEYWORD_RE = re.compile(
    r"\b(name|title|date|description|id|type|status)\b", re.IGNORECASE)
_MATH_INLINE_RE = re.compile(r"^\$[^$]+\$$")
_MATH_BLOCK_RE = re.compile(r"^\$\$[\s\S]+\$\$$")
_WS_RE = re.compile(r"[ \t\r\n]+")

HEADING_TAGS = {"h1": 1, "h2": 2, "h3": 3, "h4": 4, "h5": 5, "h6": 6}


def _norm_ws(s: str) -> str:
    """Collapse runs of whitespace to single spaces (HTML inline rule).
    Fast path: when no tab/newline/CR/double-space exists, every
    whitespace run is already a single space and the regex would be an
    identity — skip it (hot: called once per text node)."""
    if ("\n" not in s and "  " not in s and "\t" not in s
            and "\r" not in s):
        return s
    return _WS_RE.sub(" ", s)


def _escape_cell(s: str) -> str:
    """Cell content: `|` escaped, newlines → space (O10, :137-155)."""
    return _norm_ws(s).replace("|", "\\|").strip()


def _encode_uri(href: str) -> str:
    return href.replace(" ", "%20")


def render_link(text: str, href: str, title: str = "") -> str:
    """Link rule O16 (:269-299)."""
    scheme = href.split(":", 1)[0].lower() if ":" in href else ""
    if scheme in ("javascript", "vbscript"):
        return text  # drop dangerous href, keep text
    if " " in href:
        href = _encode_uri(href)
    if not title and text == href:
        return f"<{href}>"
    if title:
        title = title.replace('"', '\\"')
        return f'[{text}]({href} "{title}")'
    return f"[{text}]({href})"


def render_image(alt: str, src: str, title: str = "") -> str:
    """Image rule O15 (:243-266)."""
    if src.startswith("data:") and len(src) > 100:
        head = src.split(",", 1)[0][:60]
        return f"![{alt}]({head}...)"
    if len(src) > 500:
        return f"[{alt}]"
    if title:
        title = title.replace('"', '\\"')
        return f'![{alt}]({src} "{title}")'
    return f"![{alt}]({src})"


def render_inline(node: Node, in_li: bool = False) -> str:
    """Serialize inline content of an element to markdown text."""
    out: list[str] = []
    for child in node.children:
        if child.tag == "#text":
            out.append(_norm_ws(child.text))
            continue
        tag = child.tag
        if tag in ("strong", "b"):
            inner = render_inline(child, in_li).strip()
            if inner:
                out.append(f"**{inner}**")
        elif tag in ("em", "i"):
            inner = render_inline(child, in_li).strip()
            if inner:
                out.append(f"*{inner}*")
        elif tag == "code":
            inner = child.text_content().strip()
            if inner:
                out.append(f"`{inner}`")
        elif tag == "a":
            text = render_inline(child, in_li).strip()
            href = child.get("href")
            if not href:
                out.append(text)
            else:
                out.append(render_link(text, href, child.get("title")))
        elif tag == "img":
            out.append(render_image(child.get("alt"), child.get("src"),
                                    child.get("title")))
        elif tag == "br":
            # O14: hard break inside p/li, soft newline elsewhere (:230-240)
            out.append("  \n" if in_li or _inside(child, "p", "li")
                       else "\n")
        elif tag in ("span", "sup", "sub", "u", "s", "small", "abbr",
                     "time", "mark", "cite", "q", "label"):
            out.append(render_inline(child, in_li))
        else:
            # unknown inline-ish element: keep content (Turndown default)
            out.append(render_inline(child, in_li))
    return "".join(out)


def _inside(node: Node, *tags: str) -> bool:
    p = node.parent
    want = set(tags)
    while p is not None:
        if p.tag in want:
            return True
        p = p.parent
    return False


def _looks_like_header_row(row: Node) -> bool:
    """Header heuristic (:418-422): th cells, bold cells, or keyword text."""
    cells = [c for c in row.children if c.tag in ("td", "th")]
    if not cells:
        return False
    if all(c.tag == "th" for c in cells):
        return True
    bold = sum(1 for c in cells if c.find("strong", "b") is not None)
    if bold and bold == len(cells):
        return True
    text = " ".join(c.text_content() for c in cells)
    return bool(_HEADER_KEYWORD_RE.search(text))


def render_table(table: Node) -> str:
    """Table rules O9–O10 (:105-155)."""
    rows: list[Node] = []
    for section in table.children:
        if section.tag in ("thead", "tbody", "tfoot"):
            rows.extend(r for r in section.children if r.tag == "tr")
        elif section.tag == "tr":
            rows.append(section)
    if not rows:
        return ""
    lines: list[str] = []
    for i, row in enumerate(rows):
        cells = [c for c in row.children if c.tag in ("td", "th")]
        rendered = [_escape_cell(render_inline(c)) for c in cells]
        lines.append("| " + " | ".join(rendered) + " |")
        if i == 0 and _looks_like_header_row(row):
            lines.append("|" + " --- |" * len(cells))
    return "\n".join(lines)


def render_list(lst: Node, depth: int = 0) -> str:
    """List-item rule O18 (:315-331): `- ` bullets, continuation indent 2;
    ordered lists numbered."""
    ordered = lst.tag == "ol"
    indent = "  " * depth
    lines: list[str] = []
    n = 0
    for li in (c for c in lst.children if c.tag == "li"):
        n += 1
        marker = f"{n}. " if ordered else "- "
        # inline content of the li, excluding nested lists
        inline_parts: list[str] = []
        nested: list[Node] = []
        for ch in li.children:
            if ch.tag in ("ul", "ol"):
                nested.append(ch)
            elif ch.tag == "#text":
                inline_parts.append(_norm_ws(ch.text))
            elif ch.tag == "p":
                inline_parts.append(render_inline(ch, in_li=True))
            else:
                tmp = Node("span")
                tmp.children = [ch]
                inline_parts.append(render_inline(tmp, in_li=True))
        content = "".join(inline_parts).strip()
        cont_indent = indent + "  "
        body = content.replace("\n", "\n" + cont_indent)
        lines.append(f"{indent}{marker}{body}")
        for sub in nested:
            sub_text = render_list(sub, depth + 1)
            if sub_text:
                lines.append(sub_text)
    return "\n".join(lines)


def render_code_block(pre: Node) -> str:
    """Code-block rule O17 (:302-312): fenced, language from
    `code.className` `language-*`."""
    code = pre.find("code")
    lang = ""
    if code is not None:
        m = re.search(r"language-(\S+)", code.get("class"))
        if m:
            lang = m.group(1)
        text = code.text_content()
    else:
        text = pre.text_content()
    text = text.strip("\n")
    return f"```{lang}\n{text}\n```"


_CONTAINER_TAGS = frozenset({
    "div", "section", "article", "main", "body", "html", "#document",
    "figure", "form", "center", "details",
})


def serialize_blocks(root: Node) -> list[tuple[str, str]]:
    """Walk the (already boilerplate-stripped) tree, emitting
    (kind, markdown_text) blocks in document order."""
    blocks: list[tuple[str, str]] = []

    def flush_para(text: str) -> None:
        text = text.strip()
        if not text:
            return  # O13: empty paragraphs vanish
        if _MATH_BLOCK_RE.match(text):
            blocks.append(("math", text))  # O12/O13 block-math special case
        else:
            blocks.append(("para", text))

    def walk(node: Node) -> None:
        pending_inline: list[str] = []

        def flush_pending() -> None:
            if pending_inline:
                flush_para("".join(pending_inline))
                pending_inline.clear()

        for child in node.children:
            if child.tag == "#text":
                if child.text.strip():
                    pending_inline.append(_norm_ws(child.text))
                continue
            tag = child.tag
            if tag in HEADING_TAGS:
                flush_pending()
                level = HEADING_TAGS[tag]
                text = render_inline(child).replace("\n", " ").strip()
                if text:  # O11
                    blocks.append(("heading", f"{'#' * level} {text}"))
            elif tag == "p":
                flush_pending()
                flush_para(render_inline(child))
            elif tag in ("ul", "ol"):
                flush_pending()
                text = render_list(child)
                if text:
                    blocks.append(("list", text))
            elif tag == "table":
                flush_pending()
                text = render_table(child)
                if text:
                    blocks.append(("table", text))
            elif tag == "pre":
                flush_pending()
                blocks.append(("code", render_code_block(child)))
            elif tag == "blockquote":
                flush_pending()
                inner = serialize_blocks(child)
                text = "\n\n".join(t for _, t in inner)
                text = "\n".join("> " + ln if ln else ">"
                                 for ln in text.split("\n"))
                if text:
                    blocks.append(("quote", text))
            elif tag == "hr":
                flush_pending()
                blocks.append(("rule", "---"))
            elif tag == "img":
                flush_pending()
                blocks.append(("image", render_image(
                    child.get("alt"), child.get("src"), child.get("title"))))
            elif tag in _CONTAINER_TAGS:
                flush_pending()
                walk(child)
            elif tag in ("head", "title", "meta", "link", "base"):
                continue
            else:
                # inline element at block level: accumulate into a paragraph
                tmp = Node("span")
                tmp.children = [child]
                pending_inline.append(render_inline(tmp))
        flush_pending()

    walk(root)
    return blocks


_TRAILING_WS_RE = re.compile(r"[ \t]+$", re.MULTILINE)
_HARD_BREAK_SENTINEL = "\x00HB\x00"


def postprocess_block(text: str) -> str:
    """Per-block half of O19 (:377-405): CRLF→LF, trailing-space strip
    (hard breaks preserved), empty `| | |` row fix."""
    text = text.replace("\r\n", "\n").replace("\r", "\n")
    text = text.replace("  \n", _HARD_BREAK_SENTINEL + "\n")
    text = _TRAILING_WS_RE.sub("", text)
    text = text.replace(_HARD_BREAK_SENTINEL, "  ")
    # intra-line only ([ \t], not \s): a row-final `|` followed by the
    # next row's leading `|` must never collapse across the newline
    text = re.sub(r"\|[ \t]*\|[ \t]*\|", "| | |", text)
    return text.strip("\n")


def assemble(blocks: list[tuple[str, str]]):
    """Join blocks with exactly one blank line + trailing newline (the
    document half of O19: blank-line collapse + single final newline),
    computing span offsets per block in the SAME pass so offsets are
    byte-exact by construction.

    Returns (text, spans) with spans = list of (start, end, kind)."""
    parts: list[str] = []
    spans: list[tuple[int, int, str]] = []
    pos = 0
    for kind, raw in blocks:
        text = postprocess_block(raw)
        if not text:
            continue
        if parts:
            parts.append("\n\n")
            pos += 2
        start = pos
        parts.append(text)
        pos += len(text)
        spans.append((start, pos, kind))
    if not parts:
        return "", []
    parts.append("\n")
    return "".join(parts), spans
