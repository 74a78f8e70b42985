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
    # Greek (full alphabet, both cases, + final sigma / theta symbol)
    "Alpha": "Α", "Beta": "Β", "Gamma": "Γ", "Delta": "Δ",
    "Epsilon": "Ε", "Zeta": "Ζ", "Eta": "Η", "Theta": "Θ",
    "Iota": "Ι", "Kappa": "Κ", "Lambda": "Λ", "Mu": "Μ",
    "Nu": "Ν", "Xi": "Ξ", "Omicron": "Ο", "Pi": "Π",
    "Rho": "Ρ", "Sigma": "Σ", "Tau": "Τ", "Upsilon": "Υ",
    "Phi": "Φ", "Chi": "Χ", "Psi": "Ψ", "Omega": "Ω",
    "alpha": "α", "beta": "β", "gamma": "γ", "delta": "δ",
    "epsilon": "ε", "zeta": "ζ", "eta": "η", "theta": "θ",
    "iota": "ι", "kappa": "κ", "lambda": "λ", "mu": "μ",
    "nu": "ν", "xi": "ξ", "omicron": "ο", "pi": "π",
    "rho": "ρ", "sigmaf": "ς", "sigma": "σ", "tau": "τ",
    "upsilon": "υ", "phi": "φ", "chi": "χ", "psi": "ψ",
    "omega": "ω", "thetasym": "ϑ", "upsih": "ϒ", "piv": "ϖ",
    # arrows
    "larr": "←", "uarr": "↑", "rarr": "→", "darr": "↓",
    "harr": "↔", "crarr": "↵",
    "lArr": "⇐", "uArr": "⇑", "rArr": "⇒", "dArr": "⇓", "hArr": "⇔",
    # math
    "forall": "∀", "part": "∂", "exist": "∃", "empty": "∅",
    "nabla": "∇", "isin": "∈", "notin": "∉", "ni": "∋",
    "prod": "∏", "sum": "∑", "lowast": "∗", "radic": "√",
    "prop": "∝", "infin": "∞", "ang": "∠",
    "and": "∧", "or": "∨", "cap": "∩", "cup": "∪", "int": "∫",
    "there4": "∴", "sim": "∼", "cong": "≅", "asymp": "≈",
    "ne": "≠", "equiv": "≡", "le": "≤", "ge": "≥",
    "sub": "⊂", "sup": "⊃", "nsub": "⊄", "sube": "⊆", "supe": "⊇",
    "oplus": "⊕", "otimes": "⊗", "perp": "⊥", "sdot": "⋅",
    "lceil": "⌈", "rceil": "⌉", "lfloor": "⌊", "rfloor": "⌋",
    "lang": "〈", "rang": "〉",
    # remaining Latin-1 letters (both cases) + signs
    "Acirc": "Â", "Atilde": "Ã", "Aring": "Å", "AElig": "Æ",
    "Ccedil": "Ç", "Egrave": "È", "Ecirc": "Ê", "Euml": "Ë",
    "Igrave": "Ì", "Iacute": "Í", "Icirc": "Î", "Iuml": "Ï",
    "ETH": "Ð", "eth": "ð", "Ntilde": "Ñ",
    "Ograve": "Ò", "Oacute": "Ó", "Ocirc": "Ô", "Otilde": "Õ",
    "Oslash": "Ø", "Ugrave": "Ù", "Uacute": "Ú", "Ucirc": "Û",
    "Yacute": "Ý", "THORN": "Þ", "thorn": "þ",
    "iexcl": "¡", "iquest": "¿", "curren": "¤", "brvbar": "¦",
    "uml": "¨", "ordf": "ª", "not": "¬", "macr": "¯",
    "acute": "´", "cedil": "¸", "ordm": "º",
    # letterlike / ligature / punctuation extras
    "OElig": "Œ", "oelig": "œ", "Scaron": "Š", "scaron": "š",
    "Yuml": "Ÿ", "fnof": "ƒ", "circ": "ˆ", "tilde": "˜",
    "ensp": " ", "emsp": " ", "thinsp": " ",
    "zwnj": "‌", "zwj": "‍", "lrm": "‎", "rlm": "‏",
    "sbquo": "‚", "bdquo": "„", "permil": "‰",
    "lsaquo": "‹", "rsaquo": "›", "Dagger": "‡", "oline": "‾",
    "frasl": "⁄", "weierp": "℘", "image": "ℑ", "real": "ℜ",
    "alefsym": "ℵ", "loz": "◊",
    "spades": "♠", "clubs": "♣", "hearts": "♥", "diams": "♦",
}

_ENTITY_RE = re.compile(r"&(#x?[0-9a-fA-F]+|[a-zA-Z][a-zA-Z0-9]*);?")

# Names browsers accept WITHOUT a trailing semicolon (the WHATWG legacy
# set: the HTML 2-4 / Latin-1 era names). Everything newer — Greek, math,
# arrows — requires the ';', so '&integer' must NOT decode via the 'int'
# prefix. Frozen like ENTITIES.
_LEGACY = frozenset((
    "amp", "lt", "gt", "quot", "nbsp", "shy", "copy", "reg",
    # the uppercase forms HTML5's table accepts without a semicolon
    "AMP", "LT", "GT", "QUOT", "COPY", "REG",
    "deg", "plusmn", "micro", "middot", "para", "sect",
    "laquo", "raquo", "times", "divide",
    "frac12", "frac14", "frac34", "sup1", "sup2", "sup3",
    "iexcl", "iquest", "cent", "pound", "curren", "yen", "brvbar",
    "uml", "ordf", "not", "macr", "acute", "cedil", "ordm",
    "agrave", "aacute", "acirc", "atilde", "auml", "aring", "aelig",
    "ccedil", "egrave", "eacute", "ecirc", "euml",
    "igrave", "iacute", "icirc", "iuml", "eth", "ntilde",
    "ograve", "oacute", "ocirc", "otilde", "ouml", "oslash",
    "ugrave", "uacute", "ucirc", "uuml", "yacute", "thorn", "yuml",
    "szlig", "Agrave", "Aacute", "Acirc", "Atilde", "Auml", "Aring",
    "AElig", "Ccedil", "Egrave", "Eacute", "Ecirc", "Euml",
    "Igrave", "Iacute", "Icirc", "Iuml", "ETH", "Ntilde",
    "Ograve", "Oacute", "Ocirc", "Otilde", "Ouml", "Oslash",
    "Ugrave", "Uacute", "Ucirc", "Uuml", "Yacute", "THORN",
))

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
    has_semi = m.group(0).endswith(";")
    if has_semi:
        rep = ENTITIES.get(body)
        if rep is not None:
            return rep
    # LEGACY names decode by longest prefix even when the run happens to
    # end with ';' and the full name is unknown: '&notit;' -> '¬it;' is
    # the HTML5 spec's own example. '&integer' stays literal ('int' is not
    # legacy), '&notify' -> '¬ify'.
    for n in range(len(body), 1, -1):
        if body[:n] in _LEGACY:
            rep = ENTITIES.get(body[:n]) or ENTITIES[body[:n].lower()]
            return rep + body[n:] + (";" if has_semi else "")
    return m.group(0)


def decode_entities(s: str) -> str:
    """Decode entity references using the frozen table only."""
    if "&" not in s:
        return s
    return _ENTITY_RE.sub(_sub_entity, s)
