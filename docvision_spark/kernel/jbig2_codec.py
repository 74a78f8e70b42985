"""JBIG2 (ITU-T T.88) embedded-stream subset codec — generic regions.

From-scratch implementation of the public ITU-T T.88 recommendation's
EMBEDDED organization (what PDF's /JBIG2Decode carries — a bare segment
sequence, no file header): segment headers (T.88 §7.2 incl. the long
referred-to form and 4-byte page associations), page information
segments (§7.4.8), and immediate / immediate-lossless generic region
segments (§7.4.6) composited onto the page bitmap with the external OR
or REPLACE combination operators. Generic region bodies coded with
MMR = 1 decode via kernel/ccitt_codec's T.6 engine — §6.2.6 defines
JBIG2's MMR as exactly the T.4/T.6 two-dimensional coding. The
reference handles such pages by delegating to fitz + OCR (reference
processing/image.py:62-108); here the bitmap itself feeds the media
feature path (dims/luma/hashes).

Out of scope, honestly typed: arithmetic-coded regions (MMR = 0 — the
MQ coder of T.88 Annex E, whose 47-row Qe state table cannot be
cross-checked offline), refinement/halftone/text regions and symbol
dictionaries, intermediate regions, and unknown-length segments — all
raise Jbig2Error, which upstream degrades to "skip this raster" (an
image XObject) or the typed `pdf_unsupported_filter` error row (a
content stream), never a crash.

The planting encoder (encode_jbig2) emits the same subset: page info +
one immediate-lossless MMR generic region + end-of-page, so corpus
round-trips exercise every branch the decoder owns.
"""

from __future__ import annotations

import struct

import numpy as np

from docvision_spark.kernel.ccitt_codec import CcittError, g4_decode, g4_encode

__all__ = ["decode_jbig2", "encode_jbig2", "Jbig2Error"]

# T.88 §7.3 segment types (the ones this subset meets)
_TYPE_INTERMEDIATE_GENERIC = 36
_TYPE_IMMEDIATE_GENERIC = 38
_TYPE_IMMEDIATE_LOSSLESS_GENERIC = 39
_TYPE_PAGE_INFO = 48
_TYPE_END_OF_PAGE = 49
_TYPE_END_OF_STRIPE = 50
_TYPE_END_OF_FILE = 51
_TYPE_PROFILES = 52
_TYPE_TABLES = 53
_TYPE_EXTENSION = 62

_MAX_PIXELS = 1 << 24  # same decode-time budget as the VP8L path


class Jbig2Error(ValueError):
    """Malformed or out-of-scope JBIG2 stream."""


def _u32(data: bytes, pos: int) -> int:
    if pos + 4 > len(data):
        raise Jbig2Error("jbig2: truncated u32")
    return struct.unpack_from(">I", data, pos)[0]


def _parse_segment_header(data: bytes, pos: int) -> tuple[dict, int]:
    """One T.88 §7.2 segment header -> (segment dict, data start offset).

    The returned dict carries number/type/page/data_length; referred-to
    segment numbers are parsed (to advance correctly) but unused — the
    generic-region subset never needs cross-segment state."""
    number = _u32(data, pos)
    pos += 4
    if pos >= len(data):
        raise Jbig2Error("jbig2: truncated header flags")
    flags = data[pos]
    pos += 1
    seg_type = flags & 0x3F
    page_assoc_4 = bool(flags & 0x40)

    if pos >= len(data):
        raise Jbig2Error("jbig2: truncated referred-to field")
    rts = data[pos]
    count = rts >> 5
    if count == 7:  # §7.2.4 long form: 4-byte count + retain-bit bytes
        count = _u32(data, pos) & 0x1FFFFFFF
        pos += 4 + (count + 8) // 8
    else:
        pos += 1
    # §7.2.5: referred-to number width follows THIS segment's number
    ref_size = 1 if number <= 256 else (2 if number <= 65536 else 4)
    pos += count * ref_size

    if page_assoc_4:
        page = _u32(data, pos)
        pos += 4
    else:
        if pos >= len(data):
            raise Jbig2Error("jbig2: truncated page association")
        page = data[pos]
        pos += 1
    length = _u32(data, pos)
    pos += 4
    if length == 0xFFFFFFFF:
        # §7.2.7 unknown-length generic region: requires scanning for the
        # in-band terminator — out of this subset
        raise Jbig2Error("jbig2: unknown-length segment")
    if pos + length > len(data):
        raise Jbig2Error("jbig2: segment data overruns stream")
    return ({"number": number, "type": seg_type, "page": page,
             "length": length}, pos)


def _decode_generic_region(body: bytes) -> tuple[np.ndarray, int, int, int]:
    """Immediate generic region body -> (bitmap 1=black, x, y, comb_op)."""
    if len(body) < 18:
        raise Jbig2Error("jbig2: generic region body too short")
    w, h, x, y = struct.unpack_from(">IIII", body, 0)
    comb_op = body[16] & 0x07  # §7.4.1.5 external combination operator
    gflags = body[17]          # §7.4.6.2
    mmr = gflags & 0x01
    if not mmr:
        raise Jbig2Error("jbig2: arithmetic-coded generic region "
                         "(MQ coder) unsupported")
    if w == 0 or h == 0 or w * h > _MAX_PIXELS:
        raise Jbig2Error("jbig2: region dimensions out of budget")
    # MMR=1: no AT pixels follow the flags byte (§7.4.6.3); the rest of
    # the body is T.4/T.6 MMR data
    try:
        bm = g4_decode(body[18:], columns=w, rows=h)
    except CcittError as e:
        raise Jbig2Error(f"jbig2: MMR body: {e}") from e
    return bm, x, y, comb_op


def decode_jbig2(data: bytes, globals_data: bytes = b"") -> np.ndarray:
    """Decode an embedded-organization JBIG2 stream to the page bitmap
    ((H, W) uint8, 1 = black). `globals_data` (PDF /JBIG2Globals) is
    accepted for API parity; the generic-region subset plants nothing
    there, and any region segment inside it composites the same way."""
    page_w = page_h = 0
    default_pixel = 0
    regions: list[tuple[np.ndarray, int, int, int]] = []

    for stream in (globals_data, data):
        pos = 0
        # an 11-byte minimum header (number 4 + flags 1 + referred-to 1 +
        # page 1 + length 4) bounds the walk: PDF stream extraction may
        # leave a trailing newline before `endstream`, which must not
        # read as a truncated segment
        while pos + 11 <= len(stream):
            seg, pos = _parse_segment_header(stream, pos)
            body = stream[pos:pos + seg["length"]]
            pos += seg["length"]
            t = seg["type"]
            if t == _TYPE_PAGE_INFO:
                if len(body) < 19:
                    raise Jbig2Error("jbig2: page info too short")
                page_w, page_h = struct.unpack_from(">II", body, 0)
                default_pixel = (body[16] >> 2) & 1  # §7.4.8.5 bit 2
            elif t in (_TYPE_IMMEDIATE_GENERIC,
                       _TYPE_IMMEDIATE_LOSSLESS_GENERIC):
                regions.append(_decode_generic_region(body))
            elif t == _TYPE_INTERMEDIATE_GENERIC:
                raise Jbig2Error("jbig2: intermediate region unsupported")
            elif t in (_TYPE_END_OF_PAGE, _TYPE_END_OF_STRIPE,
                       _TYPE_END_OF_FILE, _TYPE_PROFILES, _TYPE_TABLES,
                       _TYPE_EXTENSION):
                continue  # structural / ignorable
            else:
                # symbol dicts, text/halftone/refinement regions, ...
                raise Jbig2Error(f"jbig2: segment type {t} unsupported")
    if not regions:
        raise Jbig2Error("jbig2: no decodable region")
    if page_h in (0, 0xFFFFFFFF):  # striped/unknown page height (§7.4.8.2)
        page_h = max(y + bm.shape[0] for bm, _x, y, _op in regions)
    if page_w == 0:
        page_w = max(x + bm.shape[1] for bm, x, _y, _op in regions)
    if page_w * page_h > _MAX_PIXELS:
        raise Jbig2Error("jbig2: page dimensions out of budget")

    page = np.full((page_h, page_w), default_pixel, dtype=np.uint8)
    for bm, x, y, op in regions:
        h, w = bm.shape
        if y + h > page_h or x + w > page_w:
            raise Jbig2Error("jbig2: region exceeds page")
        if op == 0:    # OR
            page[y:y + h, x:x + w] |= bm
        elif op == 4:  # REPLACE
            page[y:y + h, x:x + w] = bm
        else:          # AND/XOR/XNOR: never emitted by real still encoders
            raise Jbig2Error(f"jbig2: combination operator {op} unsupported")
    return page


def _segment(number: int, seg_type: int, page: int, body: bytes) -> bytes:
    """Short-form T.88 §7.2 segment header + body (no referred-tos)."""
    return (struct.pack(">IBBB", number, seg_type & 0x3F, 0x00, page)
            + struct.pack(">I", len(body)) + body)


def encode_jbig2(bitmap: np.ndarray) -> bytes:
    """Encode a 1-bit (H, W) bitmap (1 = black) as an embedded-organization
    JBIG2 stream: page info + one immediate-lossless MMR generic region +
    end-of-page — the exact subset decode_jbig2 owns (planting encoder)."""
    h, w = bitmap.shape
    page_info = (struct.pack(">IIII", w, h, 0, 0)
                 + bytes([0x01])        # §7.4.8.5: lossless, default pixel 0
                 + struct.pack(">H", 0))
    region = (struct.pack(">IIII", w, h, 0, 0)
              + bytes([0x00])           # external comb op OR
              + bytes([0x01])           # generic flags: MMR=1
              + g4_encode(bitmap))
    return (_segment(0, _TYPE_PAGE_INFO, 1, page_info)
            + _segment(1, _TYPE_IMMEDIATE_LOSSLESS_GENERIC, 1, region)
            + _segment(2, _TYPE_END_OF_PAGE, 1, b""))
