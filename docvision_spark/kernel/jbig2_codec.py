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

Arithmetic-coded generic regions (MMR = 0) decode via the MQ coder of
T.88 Annex E (kernel/mq_coder — its 47-row Qe table is transcribed from
the spec listing and pinned in tests): all four GB templates with
adaptive (AT) pixels at fixed context bit positions per the spec
figures, and TPGDON typical-prediction rows. The TPGDON pseudo-pixel
contexts per template (0x9B25/0x0795/0x00E5/0x0195) are the published
constants of §6.2.5.7.

Out of scope, honestly typed: refinement/halftone/text regions and
symbol dictionaries, intermediate regions, and unknown-length segments
— all raise Jbig2Error, which upstream degrades to "skip this raster"
(an image XObject) or the typed `pdf_unsupported_filter` error row (a
content stream), never a crash.

The planting encoder (encode_jbig2) emits the same subset: page info +
one immediate-lossless generic region (MMR or arithmetic template-0
TPGDON via `arith=True`) + end-of-page, so corpus round-trips exercise
every branch the decoder owns.
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


# Context bit position of each template pixel, per the T.88 §6.2.5.3
# figures (fixed positions — a moved AT pixel keeps its nominal bit).
# Tuples are (dx, dy, bit); "A<n>" marks the adaptive pixels.
_TEMPLATES = {
    0: ([(-1, 0, 0), (-2, 0, 1), (-3, 0, 2), (-4, 0, 3),
         (2, -1, 5), (1, -1, 6), (0, -1, 7), (-1, -1, 8), (-2, -1, 9),
         (1, -2, 12), (0, -2, 13), (-1, -2, 14)],
        [(4, (3, -1)), (10, (-3, -1)), (11, (2, -2)), (15, (-2, -2))]),
    1: ([(-1, 0, 0), (-2, 0, 1), (-3, 0, 2),
         (2, -1, 4), (1, -1, 5), (0, -1, 6), (-1, -1, 7), (-2, -1, 8),
         (2, -2, 9), (1, -2, 10), (0, -2, 11), (-1, -2, 12)],
        [(3, (3, -1))]),
    2: ([(-1, 0, 0), (-2, 0, 1),
         (1, -1, 3), (0, -1, 4), (-1, -1, 5), (-2, -1, 6),
         (1, -2, 7), (0, -2, 8), (-1, -2, 9)],
        [(2, (2, -1))]),
    3: ([(-1, 0, 0), (-2, 0, 1), (-3, 0, 2), (-4, 0, 3),
         (1, -1, 5), (0, -1, 6), (-1, -1, 7), (-2, -1, 8), (-3, -1, 9)],
        [(4, (2, -1))]),
}
_TPGDON_CTX = {0: 0x9B25, 1: 0x0795, 2: 0x00E5, 3: 0x0195}


def _decode_generic_arith(data: bytes, w: int, h: int, tmpl: int,
                          tpgdon: bool, at: list) -> np.ndarray:
    """§6.2.5.7 generic region decoding procedure, MQ-coded."""
    from docvision_spark.kernel.mq_coder import MqDecoder

    fixed, at_slots = _TEMPLATES[tmpl]
    pixels = fixed + [(dx, dy, bit)
                      for (bit, _nominal), (dx, dy) in zip(at_slots, at)]
    mq = MqDecoder(data)
    dec = mq.decode
    cx: dict = {}
    bm = np.zeros((h, w), dtype=np.uint8)
    rows = bm.tolist()  # python lists: ~3x faster pixel access than numpy
    ltp = 0
    ltp_cx = _TPGDON_CTX[tmpl]
    for y in range(h):
        if tpgdon:
            st = cx.get(ltp_cx)
            if st is None:
                st = cx[ltp_cx] = [0, 0]
            ltp ^= dec(st)
            if ltp:
                if y > 0:
                    rows[y] = rows[y - 1][:]
                continue
        row = rows[y]
        for x in range(w):
            ctxv = 0
            for dx, dy, bit in pixels:
                xx, yy = x + dx, y + dy
                if 0 <= yy < h and 0 <= xx < w and (yy < y or xx < x):
                    if rows[yy][xx]:
                        ctxv |= 1 << bit
            st = cx.get(ctxv)
            if st is None:
                st = cx[ctxv] = [0, 0]
            row[x] = dec(st)
    return np.asarray(rows, dtype=np.uint8)


def _encode_generic_arith(bitmap: np.ndarray, tmpl: int = 0,
                          tpgdon: bool = True, at: list | None = None
                          ) -> bytes:
    """Mirror of _decode_generic_arith (AT pixels default nominal)."""
    from docvision_spark.kernel.mq_coder import MqEncoder

    h, w = bitmap.shape
    fixed, at_slots = _TEMPLATES[tmpl]
    if at is None:
        at = [nominal for _bit, nominal in at_slots]
    pixels = fixed + [(dx, dy, bit)
                      for (bit, _nominal), (dx, dy) in zip(at_slots, at)]
    mq = MqEncoder()
    enc = mq.encode
    cx: dict = {}
    rows = bitmap.astype(np.uint8).tolist()
    ltp = 0
    ltp_cx = _TPGDON_CTX[tmpl]
    for y in range(h):
        if tpgdon:
            same = y > 0 and rows[y] == rows[y - 1]
            st = cx.get(ltp_cx)
            if st is None:
                st = cx[ltp_cx] = [0, 0]
            enc(st, ltp ^ (1 if same else 0))
            ltp = 1 if same else 0
            if same:
                continue
        row = rows[y]
        for x in range(w):
            ctxv = 0
            for dx, dy, bit in pixels:
                xx, yy = x + dx, y + dy
                if 0 <= yy < h and 0 <= xx < w and (yy < y or xx < x):
                    if rows[yy][xx]:
                        ctxv |= 1 << bit
            st = cx.get(ctxv)
            if st is None:
                st = cx[ctxv] = [0, 0]
            enc(st, row[x])
    return mq.flush()


def _decode_generic_region(body: bytes) -> tuple[np.ndarray, int, int, int]:
    """Immediate generic region body -> (bitmap 1=black, x, y, comb_op)."""
    if len(body) < 18:
        raise Jbig2Error("jbig2: generic region body too short")
    w, h, x, y = struct.unpack_from(">IIII", body, 0)
    comb_op = body[16] & 0x07  # §7.4.1.5 external combination operator
    gflags = body[17]          # §7.4.6.2
    mmr = gflags & 0x01
    if w == 0 or h == 0 or w * h > _MAX_PIXELS:
        raise Jbig2Error("jbig2: region dimensions out of budget")
    if not mmr:
        tmpl = (gflags >> 1) & 0x03
        tpgdon = bool(gflags & 0x08)
        n_at = 4 if tmpl == 0 else 1
        if len(body) < 18 + 2 * n_at:
            raise Jbig2Error("jbig2: truncated AT pixel list")
        at = [struct.unpack_from(">bb", body, 18 + 2 * i)
              for i in range(n_at)]
        for dx, dy in at:
            if dy > 0 or (dy == 0 and dx >= 0):
                raise Jbig2Error("jbig2: non-causal AT pixel")
        # pure-Python MQ pixel loop: tighter budget than the MMR path
        if w * h > _MAX_PIXELS >> 6:
            raise Jbig2Error("jbig2: arithmetic region out of budget")
        bm = _decode_generic_arith(body[18 + 2 * n_at:], w, h, tmpl,
                                   tpgdon, at)
        return bm, x, y, comb_op
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


def encode_jbig2(bitmap: np.ndarray, arith: bool = False) -> bytes:
    """Encode a 1-bit (H, W) bitmap (1 = black) as an embedded-organization
    JBIG2 stream: page info + one immediate-lossless generic region +
    end-of-page — the exact subset decode_jbig2 owns (planting encoder).
    `arith=True` codes the region with the MQ coder (template 0, nominal
    AT pixels, TPGDON) instead of MMR."""
    h, w = bitmap.shape
    page_info = (struct.pack(">IIII", w, h, 0, 0)
                 + bytes([0x01])        # §7.4.8.5: lossless, default pixel 0
                 + struct.pack(">H", 0))
    if arith:
        at = b"".join(struct.pack(">bb", dx, dy)
                      for _bit, (dx, dy) in _TEMPLATES[0][1])
        coded = bytes([0x08]) + at \
            + _encode_generic_arith(np.asarray(bitmap, dtype=np.uint8))
    else:
        coded = bytes([0x01]) + g4_encode(bitmap)  # generic flags: MMR=1
    region = (struct.pack(">IIII", w, h, 0, 0)
              + bytes([0x00])           # external comb op OR
              + coded)
    return (_segment(0, _TYPE_PAGE_INFO, 1, page_info)
            + _segment(1, _TYPE_IMMEDIATE_LOSSLESS_GENERIC, 1, region)
            + _segment(2, _TYPE_END_OF_PAGE, 1, b""))
