"""Boilerplate / main-content classification (SURVEY.md §2.7).

The reference delegates this judgment to a vision LLM prompt
(`pdf-processor/src/core/vision/ai-generator.ts:190-198`); the north rule
replaces it with deterministic text-density + link-density heuristics in
the published Readability / Boilerpipe (Kohlschütter et al., WSDM 2010)
family. This kernel prunes the DOM in place before serialization:

1. structural strip: <nav> <header> <footer> <aside> and elements whose
   id/class naming marks them as chrome (sidebar, menu, banner, ad, ...);
   script/style are already dropped at parse time (O7).
2. link-density strip: a block container whose anchor-text chars exceed
   LINK_DENSITY_MAX of its total text chars is navigation, unless it is
   (or contains) the main content (long text, tables, or the only <h1>).
3. text-density keep: long text blocks always survive.

Deterministic: pure functions of the tree, no randomness, no locale ops.
"""

from __future__ import annotations

import re

from .html_dom import Node

LINK_DENSITY_MAX = 0.45
SHORT_TEXT_CHARS = 80
LONG_TEXT_CHARS = 200

_STRIP_TAGS = frozenset({"nav", "aside"})
_CHROME_RE = re.compile(
    r"\b(sidebar|side-bar|menu|nav|navbar|breadcrumb|banner|advert|ads?|"
    r"promo|footer|header|social|share|cookie|subscribe|related|widget)\b",
    re.IGNORECASE)
_KEEP_TAGS = frozenset({"table", "pre", "h1"})


def link_density(node: Node) -> float:
    """anchor-text chars / total text chars of a subtree (0 if no text)."""
    total = len(node.text_content().strip())
    if total == 0:
        return 0.0
    anchor = sum(len(a.text_content().strip()) for a in node.find_all("a"))
    return min(1.0, anchor / total)


def text_density(node: Node) -> float:
    """text chars per descendant element (Boilerpipe-style density proxy)."""
    n_elems = sum(1 for _ in node.iter())
    return len(node.text_content().strip()) / max(1, n_elems)


def _is_chrome_named(node: Node) -> bool:
    blob = f"{node.get('id')} {node.get('class')} {node.get('role')}"
    return bool(_CHROME_RE.search(blob))


def _protected(node: Node, text: str) -> bool:
    """Blocks that must survive regardless of link density."""
    if node.find(*_KEEP_TAGS) is not None:
        return True
    return len(text) >= LONG_TEXT_CHARS


def classify_block(node: Node) -> bool:
    """True if the block is boilerplate (should be removed).

    The subtree's text is materialized ONCE and threaded through the
    density/protection checks — text_content() walks dominate the
    classifier's cost on chrome-heavy pages otherwise."""
    if node.tag in _STRIP_TAGS:
        return True
    if node.tag in ("header", "footer") and node.parent is not None \
            and node.parent.tag in ("body", "html", "#document", "div"):
        return True
    text = node.text_content().strip()
    if _is_chrome_named(node) and not _protected(node, text):
        return True
    if not text:
        # keep empty containers holding structural content (img, hr)
        return node.find("img", "hr", "table") is None
    total = len(text)
    anchor = sum(len(a.text_content().strip())
                 for a in node.find_all("a"))
    ld = min(1.0, anchor / total)
    if ld > LINK_DENSITY_MAX and not _protected(node, text):
        return True
    if total < SHORT_TEXT_CHARS and ld > 0.25 \
            and not _protected(node, text):
        return True
    return False


_CANDIDATE_TAGS = frozenset({
    "nav", "aside", "header", "footer", "div", "section", "ul", "ol",
    "form", "table",
})


def strip_boilerplate(root: Node) -> Node:
    """Prune boilerplate blocks from the tree in place; returns root.

    Walks top-down; a removed subtree is never re-visited. Children of a
    kept container are still candidates (nested sidebars inside content
    wrappers are caught)."""

    def prune(node: Node) -> None:
        kept: list[Node] = []
        for child in node.children:
            if child.is_text:
                kept.append(child)
                continue
            if child.tag in _CANDIDATE_TAGS and classify_block(child):
                continue
            prune(child)
            kept.append(child)
        node.children = kept

    prune(root)
    return root


def extract_title(root: Node, url: str = "") -> str | None:
    """Title rule O6 (`docx-converter.ts:205-219`): first <h1> innerText,
    else url basename minus extension; None when neither yields text."""
    h1 = root.find("h1")
    if h1 is not None:
        text = re.sub(r"\s+", " ", h1.text_content()).strip()
        if text:
            return text
    if url:
        base = url.rstrip("/").rsplit("/", 1)[-1]
        base = base.split("?", 1)[0].split("#", 1)[0]
        if "." in base:
            base = base.rsplit(".", 1)[0]
        if base:
            return base
    return None
