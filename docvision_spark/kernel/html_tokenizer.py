"""Spec-subset HTML5 tokenizer — regex-scanner based, deterministic.

Produces a flat token stream (start/end/text). Rawtext elements
(script/style/...) swallow their content so no JS/CSS leaks into extracted
text. Designed for throughput: one compiled master regex scans the document;
tokens are plain tuples (kind, data, attrs, self_closing) with kind as a
small int — this is the hottest loop of the 100 TB path, so no NamedTuple
allocation, and dispatch is on Match.lastgroup.

Capability ancestor in the reference: OCR recognize (processing/
ocr_engine.py:73-88) — "turn the raw payload into positioned text runs".
Here the positions are DOM positions instead of pixel boxes.
"""

from __future__ import annotations

import re
from typing import Iterator, NamedTuple

TEXT = 0
START = 1
END = 2

# Back-compat shim for tests/tools that want a readable token: tokenize()
# yields plain tuples; Tok wraps one.
class Tok(NamedTuple):
    kind: str          # 'start' | 'end' | 'text'
    data: str          # tag name (lower) or raw text
    attrs: str = ""    # raw attribute substring for start tags
    self_closing: bool = False


_KIND_NAME = {TEXT: "text", START: "start", END: "end"}

_MASTER_RE = re.compile(
    r"""<(?:
        (?P<comment>!--.*?(?:-->|\Z))
      | (?P<doctype>![^>]*(?:>|\Z))
      | (?P<pi>\?[^>]*(?:>|\Z))
      | /\s*(?P<end>[a-zA-Z][a-zA-Z0-9:-]*)[^>]*(?:>|\Z)
      | (?P<start>[a-zA-Z][a-zA-Z0-9:-]*)
        (?P<attrs>(?:"[^"]*"|'[^']*'|[^>"'])*)(?:>|\Z)
    )""",
    re.DOTALL | re.VERBOSE,
)

_ATTR_RE = re.compile(
    r"""([a-zA-Z_:][-a-zA-Z0-9_:.]*)\s*(?:=\s*("[^"]*"|'[^']*'|[^\s/>]*))?"""
)

# Elements whose content is raw (never parsed as markup).
RAWTEXT_ELEMENTS = frozenset({"script", "style", "textarea", "title",
                              "noscript", "template", "svg", "math"})

# Pre-compiled close-tag scanners for rawtext elements (hot path: every
# page has several <script>/<style> blocks).
_RAWTEXT_CLOSE = {
    name: re.compile(r"</\s*" + name + r"\s*>", re.IGNORECASE)
    for name in RAWTEXT_ELEMENTS
}

# Void elements: never have end tags.
VOID_ELEMENTS = frozenset({
    "area", "base", "br", "col", "embed", "hr", "img", "input",
    "link", "meta", "param", "source", "track", "wbr",
})


def parse_attrs(attrs_raw: str) -> dict[str, str]:
    """Parse a raw attribute substring into a {name: value} dict.

    First occurrence of a duplicated attribute wins (fixed rule). Values are
    unquoted but NOT entity-decoded here (callers decode only what they use).
    """
    out: dict[str, str] = {}
    for m in _ATTR_RE.finditer(attrs_raw):
        name = m.group(1).lower()
        if name in out:
            continue
        val = m.group(2) or ""
        if len(val) >= 2 and val[0] in "\"'" and val[-1] == val[0]:
            val = val[1:-1]
        out[name] = val
    return out


def scan(html: str) -> Iterator[tuple]:
    """Yield (kind:int, data:str, attrs:str, self_closing:bool) tuples.
    Comments, doctypes, and processing instructions are dropped here."""
    pos = 0
    n = len(html)
    search = _MASTER_RE.search
    while pos < n:
        m = search(html, pos)
        if m is None:
            yield (TEXT, html[pos:], "", False)
            return
        start = m.start()
        if start > pos:
            yield (TEXT, html[pos:start], "", False)
        pos = m.end()
        grp = m.lastgroup
        if grp == "attrs" or grp == "start":
            name = m.group("start").lower()
            attrs = m.group("attrs") or ""
            self_closing = attrs.rstrip().endswith("/")
            yield (START, name, attrs, self_closing)
            if not self_closing and name in RAWTEXT_ELEMENTS:
                cm = _RAWTEXT_CLOSE[name].search(html, pos)
                if cm is None:
                    yield (END, name, "", False)
                    return
                pos = cm.end()  # rawtext content dropped
                yield (END, name, "", False)
        elif grp == "end":
            yield (END, m.group("end").lower(), "", False)
        # comment / doctype / pi: dropped


def tokenize(html: str) -> Iterator[Tok]:
    """Readable-token wrapper over scan() (tests, debugging)."""
    for kind, data, attrs, sc in scan(html):
        yield Tok(_KIND_NAME[kind], data, attrs, sc)
