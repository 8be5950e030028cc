"""Minimal deterministic DOM built on stdlib ``html.parser``.

lxml is unavailable in executors here (SURVEY.md §7.1), so the block tree
used by the boilerplate classifier (§2.7) and the markdown serializer
(§2.6) is built with ``html.parser`` — pure Python, no native deps, which
also keeps ``--py-files`` packaging trivial on a real cluster.
"""

from __future__ import annotations

import re
from html import unescape
from html.parser import HTMLParser

VOID_ELEMENTS = frozenset({
    "area", "base", "br", "col", "embed", "hr", "img", "input", "link",
    "meta", "param", "source", "track", "wbr",
})

# elements whose open tag implicitly closes a same-level predecessor
_IMPLICIT_CLOSE = {
    "p": {"p"},
    "li": {"li"},
    "tr": {"tr", "td", "th"},
    "td": {"td", "th"},
    "th": {"td", "th"},
    "option": {"option"},
}

BLOCK_TAGS = frozenset({
    "p", "div", "section", "article", "main", "aside", "nav", "header",
    "footer", "h1", "h2", "h3", "h4", "h5", "h6", "ul", "ol", "li",
    "table", "thead", "tbody", "tfoot", "tr", "td", "th", "pre",
    "blockquote", "hr", "form", "figure", "figcaption", "body", "html",
})


# reuse the stdlib parser's own tolerant lexemes so the fast path's
# attribute semantics match html.parser by construction (bare attr →
# None, quote stripping, entity unescape, duplicate → last wins)
from html.parser import attrfind_tolerant as _ATTRFIND  # noqa: E402

_ATTR_LEAD_RE = re.compile(r"(?:\s|/(?!>))*")


def _parse_attrs(raw: str) -> dict:
    """Mirror of html.parser's parse_starttag attribute loop over the
    raw tag body (the text between the tag name and '>')."""
    attrs = {}
    k = _ATTR_LEAD_RE.match(raw).end()
    n = len(raw)
    while k < n:
        m = _ATTRFIND.match(raw, k)
        if not m:
            break
        name, rest, val = m.group(1, 2, 3)
        if not rest:
            val = None
        else:
            if val[:1] == "'" == val[-1:] or val[:1] == '"' == val[-1:]:
                val = val[1:-1]
            if val and "&" in val:
                val = unescape(val)
        attrs[name.lower()] = val
        k = m.end()
    return attrs


def _is_self_closing(raw: str) -> bool:
    """True iff the raw tag body ends in a self-closing slash AFTER
    attribute lexing (html.parser semantics: in ``<a href=/x/>`` the
    slash belongs to the unquoted value, not to ``/>``). The '>' is
    re-appended so attrfind's ``/(?!>)`` trailing consumer sees the
    same context it does in the full document."""
    s = raw + ">"
    k = _ATTR_LEAD_RE.match(s).end()
    n = len(s)
    while k < n:
        m = _ATTRFIND.match(s, k)
        if not m:
            break
        k = m.end()
    return s[k:].strip() == "/>"


class Node:
    """Element or text node. Text nodes have tag == '#text'.

    Attributes are parsed LAZILY from the raw tag body: most nodes
    (p/td/tr/...) never have theirs read, and attribute parsing is a
    measurable share of parse time on chrome-heavy web pages."""

    __slots__ = ("tag", "_attrs", "_rawattrs", "children", "parent",
                 "text")

    def __init__(self, tag: str, attrs: dict | None = None,
                 text: str = "", rawattrs: str = "") -> None:
        self.tag = tag
        self._attrs = attrs
        self._rawattrs = rawattrs
        self.children: list[Node] = []
        self.parent: Node | None = None
        self.text = text

    @property
    def attrs(self) -> dict:
        if self._attrs is None:
            self._attrs = (_parse_attrs(self._rawattrs)
                           if self._rawattrs else {})
        return self._attrs

    @property
    def is_text(self) -> bool:
        return self.tag == "#text"

    def append(self, child: "Node") -> None:
        child.parent = self
        self.children.append(child)

    def get(self, name: str, default: str = "") -> str:
        # a bare attribute (no value) is stored as None per html.parser
        # semantics; consumers see the default ("") instead
        v = self.attrs.get(name, default)
        return default if v is None else v

    def text_content(self) -> str:
        if self.tag == "#text":
            return self.text
        out: list[str] = []
        stack = list(reversed(self.children))
        while stack:
            n = stack.pop()
            if n.tag == "#text":
                out.append(n.text)
            else:
                stack.extend(reversed(n.children))
        return "".join(out)

    def iter(self):
        """Pre-order traversal over element nodes (self included)."""
        stack = [self]
        while stack:
            n = stack.pop()
            if n.tag != "#text":
                yield n
                stack.extend(reversed(n.children))

    # find/find_all use direct stack loops (not iter()): generator
    # resumption was a measurable share of kernel CPU. Text nodes never
    # match (want holds element tags) and have no children, so no
    # is_text test is needed at all.
    def find_all(self, *tags: str):
        want = set(tags)
        out: list[Node] = []
        stack = [self]
        while stack:
            n = stack.pop()
            if n.tag in want:
                out.append(n)
            kids = n.children
            if kids:
                stack.extend(reversed(kids))
        return out

    def find(self, *tags: str):
        want = set(tags)
        stack = [self]
        while stack:
            n = stack.pop()
            if n.tag in want:
                return n
            kids = n.children
            if kids:
                stack.extend(reversed(kids))
        return None

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        if self.is_text:
            return f"#text({self.text[:30]!r})"
        return f"<{self.tag} children={len(self.children)}>"


class _TreeBuilder(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = Node("#document")
        self.stack = [self.root]
        self._skip_depth = 0  # inside script/style: drop content

    # -- helpers ---------------------------------------------------------
    def _top(self) -> Node:
        return self.stack[-1]

    def _implicit_close(self, tag: str) -> None:
        closers = _IMPLICIT_CLOSE.get(tag)
        if not closers:
            return
        if self._top().tag in closers:
            self.stack.pop()

    # -- parser callbacks -------------------------------------------------
    def handle_starttag(self, tag, attrs):
        if self._skip_depth:
            if tag in ("script", "style"):
                self._skip_depth += 1
            return
        if tag in ("script", "style", "noscript"):
            self._skip_depth = 1
            return
        self._implicit_close(tag)
        node = Node(tag, dict(attrs))
        self._top().append(node)
        if tag not in VOID_ELEMENTS:
            self.stack.append(node)

    def handle_startendtag(self, tag, attrs):
        if self._skip_depth:
            return
        self._top().append(Node(tag, dict(attrs)))

    def handle_endtag(self, tag):
        if self._skip_depth:
            if tag in ("script", "style", "noscript"):
                self._skip_depth -= 1
            return
        # pop to the matching open tag if present
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return
        # unmatched close tag: ignore

    def handle_data(self, data):
        if self._skip_depth or not data:
            return
        top = self._top()
        if top.children and top.children[-1].is_text:
            top.children[-1].text += data
        else:
            top.append(Node("#text", text=data))

    def handle_entityref(self, name):  # pragma: no cover (convert_charrefs)
        self.handle_data(unescape(f"&{name};"))

    def handle_charref(self, name):  # pragma: no cover (convert_charrefs)
        self.handle_data(unescape(f"&#{name};"))


def parse_html_stdlib(html: str) -> Node:
    """stdlib html.parser tree builder — the reference implementation
    the fast tokenizer is equivalence-tested against."""
    builder = _TreeBuilder()
    builder.feed(html)
    builder.close()
    return builder.root


# -- fast tokenizer parser ----------------------------------------------------
# html.parser dominates extraction time (~2/3 of per-doc CPU in
# profiling: several regex matches + position bookkeeping per tag). This
# single-regex tokenizer builds the identical tree 3-4x faster;
# tests/test_kernels.py asserts node-for-node equivalence with the
# stdlib builder over every fixture document.

_TOKEN_RE = re.compile(
    r"<!--.*?-->"                       # comment (terminated)
    r"|<!\[.*?\]\s*>"                   # marked section <![ ... ]>
    r"|<!(?!--)(?!\[)[^>]*>"            # doctype / declaration
    r"|<\?[^>]*>"                       # processing instruction
    # end tags mirror html.parser's two-step lexing: the strict form
    # (endtagfind) tolerates surrounding whitespace; the tolerant form
    # requires the name immediately after "</" but allows junk before
    # ">"; anything else "</..." is a bogus end tag, dropped like
    # html.parser's bogus comment. tag NAME charsets mirror
    # tagfind_tolerant (a letter, then anything but whitespace / '/' /
    # '>' / NUL — so "<p<p>" is one tag named "p<p").
    r"|</\s*([a-zA-Z][-.a-zA-Z0-9:_]*)\s*>"      # strict end -> g1
    r"|</([a-zA-Z][^\t\n\r\f />\x00]*)[^>]*>"    # tolerant end -> g2
    r"|</[^>]*>"                                 # bogus end — dropped
    # start tags, two alternatives with provably equal extent:
    #  FAST (groups 3+4): body with no quote chars — the tag ends at
    #   the first '>', exactly where stdlib ends it when no quoted
    #   value can span a '>'. This is ~95% of real-web tags and avoids
    #   the structured body machinery below.
    #  TOLERANT (groups 5+6): replicates stdlib
    #   locatestarttagend_tolerant — quotes quote only in attr-VALUE
    #   position (so <p a='x<b>y'> is one tag, but a stray quote inside
    #   an attr NAME never opens a quoted span). Space-eaters are
    #   possessive (*+): retrying shorter space runs can never turn a
    #   failed tag into a match, and possessiveness prevents
    #   pathological backtracking on adversarial soup.
    r"|<([a-zA-Z][^\t\n\r\f />\x00]*)([^>\"']*)>"
    r"|<([a-zA-Z][^\t\n\r\f />\x00]*)"
    r"((?:[\s/]*+(?:(?<=['\"\s/])[^\s/>][^\s/=>]*"
    r"(?:\s*=+\s*(?:'[^']*'|\"[^\"]*\"|(?!['\"])[^>\s]*)(?:\s*,)*)?"
    r"(?:\s|/(?!>))*+)*)?\s*+/?)>",
    re.DOTALL)

# stdlib html.parser recovers from an UNTERMINATED construct — a
# comment without '-->', a marked section without ']>', or a start tag
# whose quoted attribute never closes — by emitting everything from the
# opener through the first '>' as data (to EOF when there is no '>')
# and resuming after it. If one of these openers survives inside a
# text run, its terminated form must be absent: a well-formed construct
# would have been the leftmost token-regex match.
_BUFFERED_OPEN_RE = re.compile(r"<!--|<!\[|<[a-zA-Z]")

_RAWTEXT = {"script", "style", "noscript"}


_LOWER_MEMO: dict = {}


def parse_html(html: str) -> Node:
    """Parse HTML into a Node tree rooted at '#document'. script/style/
    noscript subtrees are dropped during parse (serializer preprocess O7,
    `utils/html-to-markdown.ts:347-359`, fused into the parse).

    Hot-loop details (this is ~45% of per-doc extraction CPU): token
    dispatch by ``m.lastindex`` (comment/doctype have no groups, end tag
    sets group 1, start tag groups 2+3); tag names lowercased through a
    process-wide memo (real pages reuse a few dozen names); the current
    parent is tracked in ``top`` instead of re-indexing ``stack[-1]``;
    text-append is inlined at both call sites."""
    root = Node("#document", {})
    stack = [root]
    top = root
    pos = 0
    n = len(html)
    search = _TOKEN_RE.search
    lc = _LOWER_MEMO

    while pos < n:
        m = search(html, pos)
        if m is None:
            s = html[pos:]
            if s:
                if "&" in s:
                    s = unescape(s)
                kids = top.children
                if kids and kids[-1].tag == "#text":
                    kids[-1].text += s
                else:
                    node = Node("#text", {}, text=s)
                    node.parent = top
                    kids.append(node)
            break
        start = m.start()
        if start > pos:
            s = html[pos:start]
            buffered = _BUFFERED_OPEN_RE.search(s)
            if buffered is not None:
                # unterminated <!-- / <![ : data through the first '>'
                # after the opener (stdlib recovery), then re-parse
                op = pos + buffered.start()
                g = html.find(">", op)
                s = html[pos:] if g == -1 else html[pos:g + 1]
            if "&" in s:
                s = unescape(s)
            kids = top.children
            if kids and kids[-1].tag == "#text":
                kids[-1].text += s
            else:
                node = Node("#text", {}, text=s)
                node.parent = top
                kids.append(node)
            if buffered is not None:
                if g == -1:
                    break
                pos = g + 1
                continue
        pos = m.end()
        li = m.lastindex
        if li is None:
            continue  # comment / doctype / PI / bogus end tag
        if li <= 2:  # end tag (strict or tolerant form)
            raw_name = m.group(li)
            name = lc.get(raw_name)
            if name is None:
                name = lc[raw_name] = raw_name.lower()
            for i in range(len(stack) - 1, 0, -1):
                if stack[i].tag == name:
                    del stack[i:]
                    break
            top = stack[-1]
            continue
        raw_name, raw = m.group(3, 4) if li == 4 else m.group(5, 6)
        name = lc.get(raw_name)
        if name is None:
            name = lc[raw_name] = raw_name.lower()
        if name in _RAWTEXT:
            # skip raw content up to the matching close tag (O7)
            close = html.find("</" + name, pos)
            if close == -1:
                break
            pos = html.find(">", close)
            pos = n if pos == -1 else pos + 1
            continue
        closers = _IMPLICIT_CLOSE.get(name)
        if closers and top.tag in closers:
            stack.pop()
            top = stack[-1]
        node = Node(name, None, rawattrs=raw)
        node.parent = top
        top.children.append(node)
        if name not in VOID_ELEMENTS and not (
                raw.endswith("/") and _is_self_closing(raw)):
            stack.append(node)
            top = node
    return root


def body_of(root: Node) -> Node:
    return root.find("body") or root
