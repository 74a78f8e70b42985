"""Deterministic bytes -> str decoding for HTML payloads.

Replaces the reference's image-loading normalization step (reference
processing/image.py:237-261 DPI normalize — "make the input canonical before
the kernel"). For text inputs the canonicalization is charset decoding:
sniff a declared charset from the first bytes, else fall back to UTF-8 with
a fixed replacement policy. No locale, no chardet heuristics — the decision
is a deterministic function of the bytes.
"""

from __future__ import annotations

import codecs
import re

# Search window for <meta charset> declarations, per WHATWG's prescan limit.
_SNIFF_LIMIT = 1024

_META_CHARSET_RE = re.compile(
    rb"""<meta\s[^>]*?charset\s*=\s*["']?\s*([a-zA-Z0-9_\-]+)""",
    re.IGNORECASE,
)
_XML_DECL_RE = re.compile(
    rb"""<\?xml\s[^>]*?encoding\s*=\s*["']([a-zA-Z0-9_\-]+)["']""",
    re.IGNORECASE,
)

# Fixed alias table (subset of WHATWG encoding labels we accept). Anything
# else falls back to utf-8 so the mapping never depends on the Python
# codec-alias registry of the host.
_CHARSET_ALIASES = {
    "utf-8": "utf-8",
    "utf8": "utf-8",
    "ascii": "ascii",
    "us-ascii": "ascii",
    "latin-1": "latin-1",
    "latin1": "latin-1",
    "iso-8859-1": "latin-1",
    "iso8859-1": "latin-1",
    "windows-1252": "windows-1252",
    "cp1252": "windows-1252",
    "utf-16": "utf-16",
    "utf-16le": "utf-16-le",
    "utf-16be": "utf-16-be",
}


def sniff_charset(payload: bytes) -> str:
    """Return the declared charset label (normalized) or 'utf-8'."""
    head = payload[:_SNIFF_LIMIT]
    if head.startswith(codecs.BOM_UTF8):
        return "utf-8"
    if head.startswith(codecs.BOM_UTF16_LE):
        return "utf-16-le"
    if head.startswith(codecs.BOM_UTF16_BE):
        return "utf-16-be"
    m = _META_CHARSET_RE.search(head) or _XML_DECL_RE.search(head)
    if m:
        label = m.group(1).decode("ascii", "replace").strip().lower()
        return _CHARSET_ALIASES.get(label, "utf-8")
    return "utf-8"


def decode_html(payload: bytes) -> tuple[str, str]:
    """Decode HTML bytes deterministically.

    Returns (text, charset_used). Undecodable byte sequences map to U+FFFD
    (errors='replace'), which is itself deterministic per codec.
    """
    charset = sniff_charset(payload)
    if payload.startswith(codecs.BOM_UTF8):
        payload = payload[len(codecs.BOM_UTF8):]
    elif payload.startswith(codecs.BOM_UTF16_LE):
        payload = payload[2:]
    elif payload.startswith(codecs.BOM_UTF16_BE):
        payload = payload[2:]
    try:
        return payload.decode(charset, errors="replace"), charset
    except LookupError:  # defensive: alias table should prevent this
        return payload.decode("utf-8", errors="replace"), "utf-8"
