"""Spec-subset HTML5 tokenizer — regex-scanner based, deterministic.

Produces a flat token stream (start/end/text/comment/doctype). Rawtext
elements (script/style/...) swallow their content so no JS/CSS leaks into
extracted text. Designed for throughput: one compiled master regex scans the
document; per-token work is O(token length).

Capability ancestor in the reference: OCR recognize (processing/
ocr_engine.py:73-88) — "turn the raw payload into positioned text runs".
Here the positions are DOM positions instead of pixel boxes.
"""

from __future__ import annotations

import re
from typing import Iterator, NamedTuple


class Tok(NamedTuple):
    kind: str          # 'start' | 'end' | 'text' | 'comment' | 'doctype'
    data: str          # tag name (lower) or raw text
    attrs: str = ""    # raw attribute substring for start tags
    self_closing: bool = False


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
RAWTEXT_ELEMENTS = frozenset({"script", "style", "textarea", "title", "noscript", "template", "svg", "math"})

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


def tokenize(html: str) -> Iterator[Tok]:
    """Yield tokens over the whole document."""
    pos = 0
    n = len(html)
    search = _MASTER_RE.search
    while pos < n:
        m = search(html, pos)
        if m is None:
            yield Tok("text", html[pos:])
            return
        if m.start() > pos:
            yield Tok("text", html[pos:m.start()])
        pos = m.end()
        if m.group("start") is not None:
            name = m.group("start").lower()
            attrs = m.group("attrs") or ""
            self_closing = attrs.rstrip().endswith("/")
            yield Tok("start", name, attrs, self_closing)
            if not self_closing and name in RAWTEXT_ELEMENTS:
                # swallow raw content up to the matching end tag
                close = re.compile(r"</\s*" + name + r"\s*>", re.IGNORECASE)
                cm = close.search(html, pos)
                if cm is None:
                    yield Tok("end", name)
                    return
                # rawtext content is dropped (script/style) — emit nothing
                pos = cm.end()
                yield Tok("end", name)
        elif m.group("end") is not None:
            yield Tok("end", m.group("end").lower())
        elif m.group("comment") is not None:
            yield Tok("comment", m.group("comment"))
        elif m.group("doctype") is not None:
            yield Tok("doctype", m.group("doctype"))
        # processing instructions are dropped
