"""CCITT Group 4 (ITU-T T.6) codec — 2D MMR decode + a planting encoder.

From-scratch implementation of the public ITU-T T.6 recommendation (the
2-D Modified Modified READ coding used by PDF's /CCITTFaxDecode with
/K -1 — the overwhelmingly dominant mode in scanned-document PDFs) plus
the ITU-T T.4 §4.1 white/black run-length code tables (Tables 1-3) that
horizontal mode borrows. The reference handles these pages by delegating
to fitz + OCR (reference processing/image.py:62-108); here the bitmap
decodes exactly and feeds the media feature path (dims/luma/hashes).

The run-length tables below are transcribed from the published T.4
recommendation. tests/test_ccitt_codec.py pins the canonical values the
spec itself prints as examples (white 0 = 00110101, black 0 =
0000110111, black 2 = 11, white makeup 64 = 11011, the shared extended
makeups) and fuzzes encode->decode totality; the encoder never emits a
code the decoder's tables don't contain, so a transcription slip in a
rare code would surface as a roundtrip mismatch on the fuzzed bitmaps.

Scope: K < 0 (pure G4/MMR — g4_decode) and the full Group 3 surface
(g3_decode: K == 0 pure 1-D MH, K > 0 mixed 1-D/2-D with per-line tag
bits; EOLs optional per PDF's /EndOfLine default, EOL-pair RTC ends the
image). Embedded JBIG2 decodes via kernel/jbig2_codec (MMR bodies
reuse g4_decode; arithmetic bodies use the MQ coder) and JPEG 2000 via
kernel/jp2_codec.
"""

from __future__ import annotations

import numpy as np

__all__ = ["g3_decode", "g3_encode", "g4_decode", "g4_encode",
           "CcittError"]


class CcittError(ValueError):
    """Malformed or out-of-scope CCITT bitstream."""


# -- ITU-T T.4 Table 1: white run codes (terminating 0-63 + makeup) --------

_WHITE_CODES: dict[int, str] = {
    0: "00110101", 1: "000111", 2: "0111", 3: "1000", 4: "1011",
    5: "1100", 6: "1110", 7: "1111", 8: "10011", 9: "10100",
    10: "00111", 11: "01000", 12: "001000", 13: "000011", 14: "110100",
    15: "110101", 16: "101010", 17: "101011", 18: "0100111",
    19: "0001100", 20: "0001000", 21: "0010111", 22: "0000011",
    23: "0000100", 24: "0101000", 25: "0101011", 26: "0010011",
    27: "0100100", 28: "0011000", 29: "00000010", 30: "00000011",
    31: "00011010", 32: "00011011", 33: "00010010", 34: "00010011",
    35: "00010100", 36: "00010101", 37: "00010110", 38: "00010111",
    39: "00101000", 40: "00101001", 41: "00101010", 42: "00101011",
    43: "00101100", 44: "00101101", 45: "00000100", 46: "00000101",
    47: "00001010", 48: "00001011", 49: "01010010", 50: "01010011",
    51: "01010100", 52: "01010101", 53: "00100100", 54: "00100101",
    55: "01011000", 56: "01011001", 57: "01011010", 58: "01011011",
    59: "01001010", 60: "01001011", 61: "00110010", 62: "00110011",
    63: "00110100",
    # makeup codes (T.4 Table 2)
    64: "11011", 128: "10010", 192: "010111", 256: "0110111",
    320: "00110110", 384: "00110111", 448: "01100100", 512: "01100101",
    576: "01101000", 640: "01100111", 704: "011001100", 768: "011001101",
    832: "011010010", 896: "011010011", 960: "011010100",
    1024: "011010101", 1088: "011010110", 1152: "011010111",
    1216: "011011000", 1280: "011011001", 1344: "011011010",
    1408: "011011011", 1472: "010011000", 1536: "010011001",
    1600: "010011010", 1664: "011000", 1728: "010011011",
}

# -- ITU-T T.4 Table 1/2: black run codes ----------------------------------

_BLACK_CODES: dict[int, str] = {
    0: "0000110111", 1: "010", 2: "11", 3: "10", 4: "011",
    5: "0011", 6: "0010", 7: "00011", 8: "000101", 9: "000100",
    10: "0000100", 11: "0000101", 12: "0000111", 13: "00000100",
    14: "00000111", 15: "000011000", 16: "0000010111", 17: "0000011000",
    18: "0000001000", 19: "00001100111", 20: "00001101000",
    21: "00001101100", 22: "00000110111", 23: "00000101000",
    24: "00000010111", 25: "00000011000", 26: "000011001010",
    27: "000011001011", 28: "000011001100", 29: "000011001101",
    30: "000001101000", 31: "000001101001", 32: "000001101010",
    33: "000001101011", 34: "000011010010", 35: "000011010011",
    36: "000011010100", 37: "000011010101", 38: "000011010110",
    39: "000011010111", 40: "000001101100", 41: "000001101101",
    42: "000011011010", 43: "000011011011", 44: "000001010100",
    45: "000001010101", 46: "000001010110", 47: "000001010111",
    48: "000001100100", 49: "000001100101", 50: "000001010010",
    51: "000001010011", 52: "000000100100", 53: "000000110111",
    54: "000000111000", 55: "000000100111", 56: "000000101000",
    57: "000001011000", 58: "000001011001", 59: "000000101011",
    60: "000000101100", 61: "000001011010", 62: "000001100110",
    63: "000001100111",
    # makeup codes
    64: "0000001111", 128: "000011001000", 192: "000011001001",
    256: "000001011011", 320: "000000110011", 384: "000000110100",
    448: "000000110101", 512: "0000001101100", 576: "0000001101101",
    640: "0000001001010", 704: "0000001001011", 768: "0000001001100",
    832: "0000001001101", 896: "0000001110010", 960: "0000001110011",
    1024: "0000001110100", 1088: "0000001110101", 1152: "0000001110110",
    1216: "0000001110111", 1280: "0000001010010", 1344: "0000001010011",
    1408: "0000001010100", 1472: "0000001010101", 1536: "0000001011010",
    1600: "0000001011011", 1664: "0000001100100", 1728: "0000001100101",
}

# -- ITU-T T.4 Table 3: extended makeups, shared by both colors ------------

_EXT_MAKEUP: dict[int, str] = {
    1792: "00000001000", 1856: "00000001100", 1920: "00000001101",
    1984: "000000010010", 2048: "000000010011", 2112: "000000010100",
    2176: "000000010101", 2240: "000000010110", 2304: "000000010111",
    2368: "000000011100", 2432: "000000011101", 2496: "000000011110",
    2560: "000000011111",
}

# T.6 §2.2.1 two-dimensional mode codes
_MODE_CODES: dict[str, str] = {
    "P": "0001", "H": "001",
    "V0": "1", "VR1": "011", "VR2": "000011", "VR3": "0000011",
    "VL1": "010", "VL2": "000010", "VL3": "0000010",
}
_EOFB = "000000000001" * 2


def _decode_map(codes: dict[int, str]) -> dict[tuple[int, int], int]:
    """(bit_length, code_value) -> run length."""
    out = {}
    for run, bits in codes.items():
        out[(len(bits), int(bits, 2))] = run
    return out


_WHITE_DEC = _decode_map({**_WHITE_CODES, **_EXT_MAKEUP})
_BLACK_DEC = _decode_map({**_BLACK_CODES, **_EXT_MAKEUP})
_MODE_DEC = {(len(b), int(b, 2)): m for m, b in _MODE_CODES.items()}
_MAX_CODE_BITS = 14


class _MsbReader:
    """MSB-first bit reader (CCITT bit order)."""

    __slots__ = ("data", "pos", "nbits")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.nbits = len(data) * 8

    def read1(self) -> int:
        p = self.pos
        if p >= self.nbits:
            raise CcittError("bitstream truncated")
        self.pos = p + 1
        return (self.data[p >> 3] >> (7 - (p & 7))) & 1

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7

    def exhausted(self) -> bool:
        # only zero fill bits may remain
        if self.pos >= self.nbits:
            return True
        rest = self.nbits - self.pos
        if rest >= 8:
            return False
        save = self.pos
        ok = all(self.read1() == 0 for _ in range(rest))
        if not ok:
            self.pos = save
        return ok


def _read_code(br: _MsbReader, table: dict[tuple[int, int], int],
               what: str) -> int:
    code = 0
    for n in range(1, _MAX_CODE_BITS + 1):
        code = (code << 1) | br.read1()
        hit = table.get((n, code))
        if hit is not None:
            return hit
    raise CcittError(f"bad {what} code")


def _read_run(br: _MsbReader, dec: dict[tuple[int, int], int],
              what: str) -> int:
    """One run length: zero or more makeup codes then a terminating code
    (T.4 §4.1.3: runs > 63 are a makeup multiple of 64 + a terminator;
    runs > 2560 chain extended makeups)."""
    total = 0
    while True:
        r = _read_code(br, dec, what)
        total += r
        if r < 64:
            return total
        if total > 1 << 20:
            raise CcittError("runaway makeup chain")


def _read_mode(br: _MsbReader) -> str:
    code = 0
    for n in range(1, 8):
        code = (code << 1) | br.read1()
        hit = _MODE_DEC.get((n, code))
        if hit is not None:
            return hit
        if n == 7 and code == 0:
            # 7+ leading zeros: EOFB / EOL territory
            rest = code
            for _ in range(len(_EOFB) // 2 - 7):
                rest = (rest << 1) | br.read1()
            if rest == 1:
                return "EOFB-half"
            raise CcittError("bad mode code")
    raise CcittError("bad mode code")


def _decode_2d_row(br: _MsbReader, ref: list[int],
                   columns: int) -> tuple[list[int], bool]:
    """One 2-D MMR-coded row against reference line `ref`. Returns
    (transitions, hit_eofb)."""
    cur: list[int] = []
    a0 = -1
    color = 0  # 0 = white (a0 color)
    while a0 < columns:
        mode = _read_mode(br)
        if mode == "EOFB-half":
            if a0 != -1 or cur:
                raise CcittError("EOFB mid-row")
            # consume the second EOL half
            rest = 0
            for _ in range(len(_EOFB) // 2):
                rest = (rest << 1) | br.read1()
            if rest != 1:
                raise CcittError("bad EOFB")
            return cur, True
        # locate b1: first changing element on the reference line to
        # the right of a0 whose left-side color equals a0's color
        # (even transition indices are white->black). Linear scan from
        # a bisect start; transitions per row are short.
        i = 0
        n = len(ref)
        while i < n and ref[i] <= a0:
            i += 1
        if (i & 1) != color:
            i += 1
        b1 = ref[i] if i < n else columns
        b2 = ref[i + 1] if i + 1 < n else columns
        if mode == "P":
            a0 = b2
        elif mode == "H":
            a0s = a0 if a0 > 0 else 0
            r1 = _read_run(br, _BLACK_DEC if color else _WHITE_DEC,
                           "black run" if color else "white run")
            r2 = _read_run(br, _WHITE_DEC if color else _BLACK_DEC,
                           "white run" if color else "black run")
            a1 = a0s + r1
            a2 = a1 + r2
            if a2 > columns or a1 > columns:
                raise CcittError("horizontal run past row end")
            cur.append(a1)
            cur.append(a2)
            if len(cur) > columns + 2:
                # more transitions than pixels: malformed stream that
                # would otherwise spin without advancing (r1 == r2 == 0)
                raise CcittError("transition overflow")
            a0 = a2
        else:  # vertical
            delta = {"V0": 0, "VR1": 1, "VR2": 2, "VR3": 3,
                     "VL1": -1, "VL2": -2, "VL3": -3}[mode]
            a1 = b1 + delta
            if a1 < 0 or a1 > columns:
                raise CcittError("vertical mode past row bounds")
            if a1 <= a0 and a0 >= 0:
                # changing elements must move right (T.6 §2.2.2);
                # malformed data would otherwise loop forever
                raise CcittError("non-monotonic transition")
            cur.append(a1)
            a0 = a1
            color ^= 1
    return cur, False


def _decode_1d_row(br: _MsbReader, columns: int) -> list[int]:
    """One 1-D MH-coded row (T.4 §4.1): alternating white/black run
    lengths starting with a (possibly zero) white run, totalling exactly
    `columns`."""
    cur: list[int] = []
    pos = 0
    color = 0
    while pos < columns:
        run = _read_run(br, _BLACK_DEC if color else _WHITE_DEC,
                        "black run" if color else "white run")
        pos += run
        if pos > columns:
            raise CcittError("1-D run past row end")
        cur.append(pos)
        color ^= 1
        if len(cur) > columns + 2:
            raise CcittError("transition overflow")
    return cur


def _rows_to_bitmap(out_rows: list[list[int]], columns: int) -> np.ndarray:
    if not out_rows:
        return np.zeros((0, columns), dtype=np.uint8)
    # transitions -> pixels: +1/-1 deltas at alternating positions, cumsum
    h = len(out_rows)
    img = np.zeros((h, columns + 1), dtype=np.int8)
    for y, tr in enumerate(out_rows):
        for k, x in enumerate(tr):
            if x < columns:
                img[y, x] += 1 if (k & 1) == 0 else -1
    return np.cumsum(img[:, :columns], axis=1, dtype=np.int32) \
             .astype(np.uint8)


def g4_decode(data: bytes, columns: int, rows: int | None = None,
              byte_align: bool = False,
              max_pixels: int = 64 * 1024 * 1024) -> np.ndarray:
    """Decode a T.6 (pure 2-D MMR) bitstream to an (H, W) uint8 bitmap
    with 1 = black, 0 = white (the coding-domain colors; callers map to
    gray levels / BlackIs1 themselves).

    `rows` stops after that many lines (PDF /Rows); otherwise decoding
    runs to EOFB or clean bitstream exhaustion. `byte_align` honors
    /EncodedByteAlign. The pixel budget bounds crafted headers exactly
    like the VP8L decoder's."""
    if columns <= 0:
        raise CcittError("columns must be positive")
    if rows is not None and rows * columns > max_pixels:
        raise CcittError(f"{columns}x{rows} exceeds pixel budget")
    br = _MsbReader(data)
    # reference line for row 0: imaginary all-white line (T.6 §2.2.2)
    ref: list[int] = [columns, columns]
    out_rows: list[list[int]] = []
    while rows is None or len(out_rows) < rows:
        if rows is None and br.exhausted():
            break
        if (len(out_rows) + 1) * columns > max_pixels:
            raise CcittError("exceeds pixel budget")
        if byte_align:
            br.align()
        cur, eofb = _decode_2d_row(br, ref, columns)
        if eofb:
            break
        out_rows.append(cur)
        ref = cur + [columns, columns]
    return _rows_to_bitmap(out_rows, columns)


def _try_consume_eol(br: _MsbReader) -> bool:
    """Consume one optional EOL (>= 11 zeros then a 1, incl. fill bits);
    restore position and return False when the next bits aren't one."""
    save = br.pos
    zeros = 0
    while zeros <= 72:
        if br.pos >= br.nbits:
            br.pos = save
            return False
        if br.read1():
            if zeros >= 11:
                return True
            br.pos = save
            return False
        zeros += 1
    br.pos = save
    return False


def g3_decode(data: bytes, columns: int, rows: int | None = None,
              k: int = 0, byte_align: bool = False,
              max_pixels: int = 64 * 1024 * 1024) -> np.ndarray:
    """Decode a T.4 (Group 3) bitstream: pure 1-D MH when k == 0, mixed
    1-D/2-D when k > 0 (each line carries a 1-bit coding-mode tag, after
    an OPTIONAL EOL — PDF's /EndOfLine defaults to false, so EOLs are
    consumed when present but never required, the same tolerance real
    CCITTFaxDecode implementations apply). An EOL immediately followed
    by another EOL is the return-to-control sequence and ends the
    image."""
    if columns <= 0:
        raise CcittError("columns must be positive")
    if k < 0:
        return g4_decode(data, columns, rows=rows, byte_align=byte_align,
                         max_pixels=max_pixels)
    if rows is not None and rows * columns > max_pixels:
        raise CcittError(f"{columns}x{rows} exceeds pixel budget")
    br = _MsbReader(data)
    ref: list[int] = [columns, columns]
    out_rows: list[list[int]] = []
    while rows is None or len(out_rows) < rows:
        if rows is None and br.exhausted():
            break
        if (len(out_rows) + 1) * columns > max_pixels:
            raise CcittError("exceeds pixel budget")
        if byte_align:
            br.align()
        if _try_consume_eol(br):
            if _try_consume_eol(br):  # RTC: EOL pair ends the image
                while _try_consume_eol(br):
                    pass
                break
            if rows is None and br.exhausted():
                break
        one_d = True
        if k > 0:
            one_d = br.read1() == 1
        if one_d:
            cur = _decode_1d_row(br, columns)
        else:
            cur, eofb = _decode_2d_row(br, ref, columns)
            if eofb:
                break
        out_rows.append(cur)
        ref = cur + [columns, columns]
    return _rows_to_bitmap(out_rows, columns)


# -- encoder (corpus planting + roundtrip fuzz) ----------------------------


class _MsbWriter:
    __slots__ = ("bits",)

    def __init__(self):
        self.bits: list[str] = []

    def write(self, s: str) -> None:
        self.bits.append(s)

    def tobytes(self) -> bytes:
        s = "".join(self.bits)
        pad = (-len(s)) % 8
        s += "0" * pad
        return int(s, 2).to_bytes(len(s) // 8, "big") if s else b""


def _run_bits(run: int, codes: dict[int, str]) -> str:
    """MH encoding of one run: extended + color makeups then terminator."""
    out = []
    while run >= 2624:  # largest makeup is 2560; keep >=64 for terminator
        out.append(_EXT_MAKEUP[2560])
        run -= 2560
    if run >= 64:
        mk = (run // 64) * 64
        out.append(_EXT_MAKEUP[mk] if mk >= 1792 else codes[mk])
        run -= mk
    out.append(codes[run])
    return "".join(out)


def _transitions(row: np.ndarray) -> list[int]:
    d = np.flatnonzero(np.diff(np.concatenate(([0], row.astype(np.int8)))))
    return d.tolist()


def g4_encode(bitmap: np.ndarray, byte_align: bool = False) -> bytes:
    """Encode an (H, W) 0/1 bitmap (1 = black) as a T.6 stream ending in
    EOFB. Uses the full mode repertoire: vertical when |a1-b1| <= 3, pass
    when the reference run ends left of a1, horizontal otherwise."""
    bm = (np.asarray(bitmap) != 0).astype(np.uint8)
    h, w = bm.shape
    wtr = _MsbWriter()
    ref = [w, w]
    for y in range(h):
        if byte_align:
            cur_len = sum(len(b) for b in wtr.bits)
            wtr.write("0" * ((-cur_len) % 8))
        cur = _transitions(bm[y])
        a0 = -1
        color = 0
        ci = 0  # index into cur of the next transition right of a0
        while a0 < w:
            a1 = cur[ci] if ci < len(cur) else w
            i = 0
            n = len(ref)
            while i < n and ref[i] <= a0:
                i += 1
            if (i & 1) != color:
                i += 1
            b1 = ref[i] if i < n else w
            b2 = ref[i + 1] if i + 1 < n else w
            if b2 < a1:
                wtr.write(_MODE_CODES["P"])
                a0 = b2
            elif abs(a1 - b1) <= 3:
                wtr.write({0: "1", 1: "011", 2: "000011", 3: "0000011",
                           -1: "010", -2: "000010", -3: "0000010"}[a1 - b1])
                a0 = a1
                ci += 1
                color ^= 1
            else:
                a2 = cur[ci + 1] if ci + 1 < len(cur) else w
                a0s = a0 if a0 > 0 else 0
                wtr.write(_MODE_CODES["H"])
                wtr.write(_run_bits(a1 - a0s,
                                    _BLACK_CODES if color else _WHITE_CODES))
                wtr.write(_run_bits(a2 - a1,
                                    _WHITE_CODES if color else _BLACK_CODES))
                a0 = a2
                ci += 2
        ref = cur + [w, w]
    wtr.write(_EOFB)
    return wtr.tobytes()


def g3_encode(bitmap: np.ndarray, k: int = 0,
              end_of_line: bool = False) -> bytes:
    """Encode an (H, W) 0/1 bitmap as a T.4 (Group 3) stream. Every line
    is 1-D MH coded (for k > 0 each line carries the 1-bit tag declaring
    it 1-D — a valid mixed stream that never uses its 2-D option);
    `end_of_line` prefixes each line with an EOL, and k > 0 + EOL
    streams put the tag right after the EOL per T.4."""
    bm = (np.asarray(bitmap) != 0).astype(np.uint8)
    h, w = bm.shape
    wtr = _MsbWriter()
    for y in range(h):
        if end_of_line:
            wtr.write("000000000001")
        if k > 0:
            wtr.write("1")  # this line is 1-D coded
        pos = 0
        color = 0
        for t in _transitions(bm[y]):
            wtr.write(_run_bits(t - pos,
                                _BLACK_CODES if color else _WHITE_CODES))
            pos = t
            color ^= 1
        wtr.write(_run_bits(w - pos,
                            _BLACK_CODES if color else _WHITE_CODES))
    if end_of_line:
        wtr.write("000000000001" * 2)  # RTC tail (abbreviated)
    return wtr.tobytes()
