"""MQ binary arithmetic coder (ITU-T T.800 Annex C / T.88 Annex E).

The adaptive binary arithmetic coder shared by JPEG 2000 tier-1 (EBCOT)
and arithmetic-coded JBIG2. Implemented from the published flowcharts:
DECODE/BYTEIN/RENORMD and ENCODE/CODEMPS/CODELPS/BYTEOUT/FLUSH, integer
arithmetic only. The reference rasterizes JPX-bearing pages via fitz and
OCRs them (reference processing/image.py:62-108); here the coder feeds a
from-scratch codestream decode instead.

Faithfulness note (house policy, same as kernel/vp8_codec.py): the
47-state probability table below is transcribed from the spec's published
listing (T.800 Table C.2 — Qe, NMPS, NLPS, SWITCH). It cannot be
re-derived from first principles offline; `tests/test_mq_coder.py` pins
the widely-cited head rows (0x5601/0x3401/0x1801...) and the
encoder/decoder pair is exercised round-trip, so an entry error would
surface as a self-inconsistency or a pin failure rather than silently.

The byte-stuffing discipline (a byte following 0xFF carries only 7 bits;
0xFF>0x8F pairs terminate) is what lets decoders treat truncated
codestreams as an endless 1-fill — decode never reads past the segment.
"""

from __future__ import annotations

# (Qe, NMPS, NLPS, SWITCH) — T.800 Table C.2, index = state 0..46
MQ_TABLE = (
    (0x5601, 1, 1, 1), (0x3401, 2, 6, 0), (0x1801, 3, 9, 0),
    (0x0AC1, 4, 12, 0), (0x0521, 5, 29, 0), (0x0221, 38, 33, 0),
    (0x5601, 7, 6, 1), (0x5401, 8, 14, 0), (0x4801, 9, 14, 0),
    (0x3801, 10, 14, 0), (0x3001, 11, 17, 0), (0x2401, 12, 18, 0),
    (0x1C01, 13, 20, 0), (0x1601, 29, 21, 0), (0x5601, 15, 14, 1),
    (0x5401, 16, 14, 0), (0x5101, 17, 15, 0), (0x4801, 18, 16, 0),
    (0x3801, 19, 17, 0), (0x3401, 20, 18, 0), (0x3001, 21, 19, 0),
    (0x2801, 22, 19, 0), (0x2401, 23, 20, 0), (0x2201, 24, 21, 0),
    (0x1C01, 25, 22, 0), (0x1801, 26, 23, 0), (0x1601, 27, 24, 0),
    (0x1401, 28, 25, 0), (0x1201, 29, 26, 0), (0x1101, 30, 27, 0),
    (0x0AC1, 31, 28, 0), (0x09C1, 32, 29, 0), (0x08A1, 33, 30, 0),
    (0x0521, 34, 31, 0), (0x0441, 35, 32, 0), (0x02A1, 36, 33, 0),
    (0x0221, 37, 34, 0), (0x0141, 38, 35, 0), (0x0111, 39, 36, 0),
    (0x0085, 40, 37, 0), (0x0049, 41, 38, 0), (0x0025, 42, 39, 0),
    (0x0015, 43, 40, 0), (0x0009, 44, 41, 0), (0x0005, 45, 42, 0),
    (0x0001, 45, 43, 0), (0x5601, 46, 46, 0),
)


class MqDecoder:
    """T.800 C.3 decoding procedure over one codeword segment.

    Contexts are (state_index, mps) pairs owned by the caller and passed
    as a mutable 2-item list, so tier-1 can keep its 19 contexts in a
    plain list-of-lists and reset/retrain them per code-block.
    """

    __slots__ = ("data", "bp", "c", "a", "ct")

    def __init__(self, data: bytes):
        self.data = data
        # INITDEC
        self.bp = 0
        b0 = data[0] if data else 0xFF
        self.c = b0 << 16
        self._bytein()
        self.c = (self.c << 7) & 0xFFFFFFFF
        self.ct -= 7
        self.a = 0x8000

    def _bytein(self) -> None:
        data, bp = self.data, self.bp
        b = data[bp] if bp < len(data) else 0xFF
        if b == 0xFF:
            b1 = data[bp + 1] if bp + 1 < len(data) else 0xFF
            if b1 > 0x8F:
                # marker found: feed 1-bits forever (truncation tolerance)
                self.c += 0xFF00
                self.ct = 8
            else:
                self.bp = bp + 1
                self.c += b1 << 9
                self.ct = 7
        else:
            self.bp = bp + 1
            b1 = data[bp + 1] if bp + 1 < len(data) else 0xFF
            self.c += b1 << 8
            self.ct = 8

    def decode(self, cx: list) -> int:
        """DECODE one bit under context cx = [state_index, mps]."""
        qe, nmps, nlps, switch = MQ_TABLE[cx[0]]
        self.a -= qe
        if ((self.c >> 16) & 0xFFFF) < qe:
            # LPS exchange path
            if self.a < qe:
                d = cx[1]
                cx[0] = nmps
            else:
                d = 1 - cx[1]
                if switch:
                    cx[1] = 1 - cx[1]
                cx[0] = nlps
            self.a = qe
        else:
            self.c = (self.c - (qe << 16)) & 0xFFFFFFFF
            if self.a & 0x8000:
                return cx[1]
            # MPS exchange path
            if self.a < qe:
                d = 1 - cx[1]
                if switch:
                    cx[1] = 1 - cx[1]
                cx[0] = nlps
            else:
                d = cx[1]
                cx[0] = nmps
        # RENORMD
        while True:
            if self.ct == 0:
                self._bytein()
            self.a = (self.a << 1) & 0xFFFF
            self.c = (self.c << 1) & 0xFFFFFFFF
            self.ct -= 1
            if self.a & 0x8000:
                break
        return d


class MqEncoder:
    """T.800 C.2 encoding procedure producing one codeword segment.

    `buf[0]` is the spec's before-the-segment scratch byte (BP = BPST - 1
    at INITENC); a carry that reaches it makes it nonzero, in which case
    it is a real leading codeword byte and is emitted. flush() uses the
    simple termination (SETBITS + two byteouts, trailing 0xFF dropped) —
    the decoder's endless-1-fill BYTEIN makes that sufficient.
    """

    __slots__ = ("buf", "c", "a", "ct")

    def __init__(self):
        # INITENC (B = scratch 0x00, so CT = 12)
        self.buf = bytearray(1)
        self.c = 0
        self.a = 0x8000
        self.ct = 12

    def _byteout(self) -> None:
        buf = self.buf
        if buf[-1] == 0xFF:
            buf.append((self.c >> 20) & 0xFF)
            self.c &= 0xFFFFF
            self.ct = 7
        elif self.c < 0x8000000:
            buf.append((self.c >> 19) & 0xFF)
            self.c &= 0x7FFFF
            self.ct = 8
        else:
            buf[-1] += 1  # carry (cannot ripple: previous byte != 0xFF)
            if buf[-1] == 0xFF:
                self.c &= 0x7FFFFFF
                buf.append((self.c >> 20) & 0xFF)
                self.c &= 0xFFFFF
                self.ct = 7
            else:
                buf.append((self.c >> 19) & 0xFF)
                self.c &= 0x7FFFF
                self.ct = 8

    def encode(self, cx: list, d: int) -> None:
        qe, nmps, nlps, switch = MQ_TABLE[cx[0]]
        if d == cx[1]:
            # CODEMPS (conditional exchange + state advance only on renorm)
            self.a -= qe
            if self.a & 0x8000:
                self.c += qe
                return
            if self.a < qe:
                self.a = qe
            else:
                self.c += qe
            cx[0] = nmps
        else:
            # CODELPS
            self.a -= qe
            if self.a < qe:
                self.c += qe
            else:
                self.a = qe
            if switch:
                cx[1] = 1 - cx[1]
            cx[0] = nlps
        # RENORME
        while True:
            self.a = (self.a << 1) & 0xFFFF
            self.c <<= 1
            self.ct -= 1
            if self.ct == 0:
                self._byteout()
            if self.a & 0x8000:
                break

    def flush(self) -> bytes:
        # SETBITS: fill C's low bits with 1s without leaving [C, C+A)
        tempc = self.c + self.a
        self.c |= 0xFFFF
        if self.c >= tempc:
            self.c -= 0x8000
        self.c <<= self.ct
        self._byteout()
        self.c <<= self.ct
        self._byteout()
        out = self.buf
        if out[-1] == 0xFF:
            del out[-1]
        start = 0 if out and out[0] else 1  # emit scratch only if carried
        return bytes(out[start:])
