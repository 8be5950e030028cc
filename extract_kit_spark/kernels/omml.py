"""OMML (Office Math Markup) → LaTeX conversion.

Re-expresses the reference's regex-table converter
(`office-to-markdown/src/math/omml-processor.ts`): namespace-prefix strip
and ordered structural patterns (frac, sup, sub, sqrt, nth-root, text
run) per `:102-133` / `:166-192`, Unicode→LaTeX symbol map (Greek +
operators) per `:43-58`, whitespace normalization and a plain-text
fallback on any error per `:186-192`. The regex table is the part that
defines the golden bytes, so the transformation ORDER is load-bearing.
"""

from __future__ import annotations

import re

# Unicode → LaTeX symbol map (parity: omml-processor.ts:43-58 —
# 23 Greek letters + operator symbols)
SYMBOL_MAP = {
    "α": r"\alpha", "β": r"\beta", "γ": r"\gamma", "δ": r"\delta",
    "ε": r"\epsilon", "ζ": r"\zeta", "η": r"\eta", "θ": r"\theta",
    "ι": r"\iota", "κ": r"\kappa", "λ": r"\lambda", "μ": r"\mu",
    "ν": r"\nu", "ξ": r"\xi", "π": r"\pi", "ρ": r"\rho",
    "σ": r"\sigma", "τ": r"\tau", "υ": r"\upsilon", "φ": r"\phi",
    "χ": r"\chi", "ψ": r"\psi", "ω": r"\omega",
    "∞": r"\infty", "∑": r"\sum", "∏": r"\prod", "∫": r"\int",
    "√": r"\sqrt{}", "±": r"\pm", "×": r"\times", "÷": r"\div",
    "≤": r"\leq", "≥": r"\geq", "≠": r"\neq", "≈": r"\approx",
    "→": r"\rightarrow", "←": r"\leftarrow", "∂": r"\partial",
    "∇": r"\nabla", "∈": r"\in",
}

_NS_PREFIX_RE = re.compile(r"</?(?:m|w):")  # strip namespace prefixes
_TAG_ATTRS_RE = re.compile(r"(<[a-zA-Z][a-zA-Z0-9]*)\s[^>]*(/?)>")

# ordered structural patterns (parity: omml-processor.ts:102-133).
# Applied repeatedly until fixpoint so nested structures resolve
# inside-out.
_PATTERNS: list[tuple[re.Pattern, str]] = [
    # fraction: <f><num>A</num><den>B</den></f>
    (re.compile(r"<f>\s*<num>(.*?)</num>\s*<den>(.*?)</den>\s*</f>",
                re.DOTALL),
     r"\\frac{\1}{\2}"),
    # superscript: <sSup><e>A</e><sup>B</sup></sSup>
    (re.compile(r"<sSup>\s*<e>(.*?)</e>\s*<sup>(.*?)</sup>\s*</sSup>",
                re.DOTALL),
     r"{\1}^{\2}"),
    # subscript: <sSub><e>A</e><sub>B</sub></sSub>
    (re.compile(r"<sSub>\s*<e>(.*?)</e>\s*<sub>(.*?)</sub>\s*</sSub>",
                re.DOTALL),
     r"{\1}_{\2}"),
    # nth root: <rad><deg>N</deg><e>A</e></rad>
    (re.compile(r"<rad>\s*<deg>(.+?)</deg>\s*<e>(.*?)</e>\s*</rad>",
                re.DOTALL),
     r"\\sqrt[\1]{\2}"),
    # square root (no/empty degree): <rad><e>A</e></rad>
    (re.compile(r"<rad>\s*(?:<deg>\s*</deg>\s*)?<e>(.*?)</e>\s*</rad>",
                re.DOTALL),
     r"\\sqrt{\1}"),
    # text run: <r>...<t>text</t>...</r>
    (re.compile(r"<r>(?:(?!</r>).)*?<t>(.*?)</t>(?:(?!</r>).)*?</r>",
                re.DOTALL),
     r"\1"),
]

_LEFTOVER_TAG_RE = re.compile(r"<[^>]+>")
_WS_NORM_RE = re.compile(r"\s+")


def _strip_ns_and_attrs(omml: str) -> str:
    s = _NS_PREFIX_RE.sub(lambda m: "</" if m.group(0).startswith("</")
                          else "<", omml)
    s = _TAG_ATTRS_RE.sub(r"\1\2>", s)
    return s


def omml_to_latex(omml: str) -> str:
    """Convert one OMML fragment (an <m:oMath> subtree) to LaTeX.

    Fallback semantics mirror the reference (:186-192): on ANY exception
    return the plain text content with tags stripped."""
    try:
        s = _strip_ns_and_attrs(omml)
        # iterate patterns to fixpoint (bounded) for nested structures
        for _ in range(10):
            before = s
            for pat, repl in _PATTERNS:
                s = pat.sub(repl, s)
            if s == before:
                break
        s = _LEFTOVER_TAG_RE.sub("", s)
        for ch, latex in SYMBOL_MAP.items():
            if ch in s:
                s = s.replace(ch, latex + " ")
        s = _WS_NORM_RE.sub(" ", s).strip()
        return s
    except Exception:
        try:
            return _WS_NORM_RE.sub(
                " ", _LEFTOVER_TAG_RE.sub("", omml)).strip()
        except Exception:
            return ""
