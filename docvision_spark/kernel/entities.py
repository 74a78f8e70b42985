"""Fixed HTML entity table + deterministic entity decoding.

A frozen subset of the WHATWG named-character-references table (the common
entities that appear in web text). Frozen so that kernel output never changes
when the host Python's `html.entities` table is updated — byte-identity of
extracted text is the north-rule invariant.
"""

from __future__ import annotations

import re

ENTITIES: dict[str, str] = {
    "amp": "&", "lt": "<", "gt": ">", "quot": '"', "apos": "'",
    "nbsp": " ", "shy": "",
    "copy": "©", "reg": "®", "trade": "™",
    "deg": "°", "plusmn": "±", "micro": "µ",
    "middot": "·", "para": "¶", "sect": "§",
    "laquo": "«", "raquo": "»",
    "lsquo": "‘", "rsquo": "’",
    "ldquo": "“", "rdquo": "”",
    "ndash": "–", "mdash": "—",
    "hellip": "…", "bull": "•", "dagger": "†",
    "prime": "′", "Prime": "″",
    "times": "×", "divide": "÷", "minus": "−",
    "frac12": "½", "frac14": "¼", "frac34": "¾",
    "sup1": "¹", "sup2": "²", "sup3": "³",
    "euro": "€", "pound": "£", "yen": "¥", "cent": "¢",
    "agrave": "à", "aacute": "á", "acirc": "â",
    "atilde": "ã", "auml": "ä", "aring": "å",
    "aelig": "æ", "ccedil": "ç",
    "egrave": "è", "eacute": "é", "ecirc": "ê", "euml": "ë",
    "igrave": "ì", "iacute": "í", "icirc": "î", "iuml": "ï",
    "ntilde": "ñ",
    "ograve": "ò", "oacute": "ó", "ocirc": "ô",
    "otilde": "õ", "ouml": "ö", "oslash": "ø",
    "ugrave": "ù", "uacute": "ú", "ucirc": "û", "uuml": "ü",
    "yacute": "ý", "yuml": "ÿ", "szlig": "ß",
    "Agrave": "À", "Aacute": "Á", "Auml": "Ä",
    "Eacute": "É", "Ouml": "Ö", "Uuml": "Ü",
    "alpha": "α", "beta": "β", "gamma": "γ",
    "delta": "δ", "pi": "π", "sigma": "σ",
    "larr": "←", "uarr": "↑", "rarr": "→", "darr": "↓",
}

_ENTITY_RE = re.compile(r"&(#x?[0-9a-fA-F]+|[a-zA-Z][a-zA-Z0-9]*);?")

# Windows-1252 remapping for C1-range numeric references (&#147; etc.),
# per the HTML5 spec's fixed table.
_C1_MAP = {
    0x80: "€", 0x82: "‚", 0x83: "ƒ", 0x84: "„",
    0x85: "…", 0x86: "†", 0x87: "‡", 0x88: "ˆ",
    0x89: "‰", 0x8a: "Š", 0x8b: "‹", 0x8c: "Œ",
    0x8e: "Ž", 0x91: "‘", 0x92: "’", 0x93: "“",
    0x94: "”", 0x95: "•", 0x96: "–", 0x97: "—",
    0x98: "˜", 0x99: "™", 0x9a: "š", 0x9b: "›",
    0x9c: "œ", 0x9e: "ž", 0x9f: "Ÿ",
}


def _sub_entity(m: re.Match) -> str:
    body = m.group(1)
    if body[0] == "#":
        try:
            cp = int(body[2:], 16) if body[1] in ("x", "X") else int(body[1:])
        except ValueError:
            return m.group(0)
        if cp in _C1_MAP:
            return _C1_MAP[cp]
        if 0 < cp <= 0x10FFFF and not (0xD800 <= cp <= 0xDFFF):
            return chr(cp)
        return "�"
    rep = ENTITIES.get(body)
    if rep is not None:
        return rep
    # missing-semicolon legacy handling: match longest known prefix
    if not m.group(0).endswith(";"):
        for n in range(len(body), 1, -1):
            rep = ENTITIES.get(body[:n])
            if rep is not None:
                return rep + body[n:]
    return m.group(0)


def decode_entities(s: str) -> str:
    """Decode entity references using the frozen table only."""
    if "&" not in s:
        return s
    return _ENTITY_RE.sub(_sub_entity, s)
