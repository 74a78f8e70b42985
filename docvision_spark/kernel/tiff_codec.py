"""Baseline TIFF codec from the public TIFF 6.0 spec — numpy + stdlib only.

Supported subset (the common web/scan baseline): first IFD, 8-bit samples,
grayscale (PhotometricInterpretation 0/1) and RGB (2), chunky planar
config, strip layout, compressions None (1), LZW (5, MSB-first codes with
the spec's early-change rule) and PackBits (32773), horizontal-differencing
predictor (2), both byte orders (II/MM); PLUS 1-bit bilevel strips — the
scanned-fax family — uncompressed packed bits (1), CCITT Modified Huffman
(2), G3 1-D/2-D per T4Options (3) and G4 MMR (4) via kernel/ccitt_codec.
Tiled files, 16-bit samples, palette color and JPEG-in-TIFF raise
ImageDecodeError (typed error rows at the pipeline level, never a crash).

The encoder exists to build deterministic fixtures (and thumbnails) —
single strip, little-endian, optional LZW/PackBits.

Reference capability parity: the reference accepts any cv2-readable image
(src/docvision/core/parser.py:554-563); TIFF is the classic scanned-
document container a crawl pipeline meets right after PNG/JPEG/GIF.
"""

from __future__ import annotations

import struct

import numpy as np

from docvision_spark.kernel.image_codec import ImageDecodeError

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}  # BYTE ASCII SHORT LONG RATIONAL


def _read_tag_values(data: bytes, fmt: str, typ: int, count: int,
                     raw: bytes) -> list[int]:
    size = _TYPE_SIZE.get(typ)
    if size is None:
        return []
    total = size * count
    if total > 4:
        off = struct.unpack(fmt + "I", raw)[0]
        buf = data[off:off + total]
        if len(buf) < total:
            raise ImageDecodeError("tiff: tag value out of bounds")
    else:
        buf = raw[:total]
    if typ == 3:
        return list(struct.unpack(fmt + "H" * count, buf))
    if typ == 4:
        return list(struct.unpack(fmt + "I" * count, buf))
    if typ == 1:
        return list(buf)
    if typ == 5:  # RATIONAL -> numerator/denominator pairs, return floored
        vals = struct.unpack(fmt + "II" * count, buf)
        return [vals[i] // max(vals[i + 1], 1) for i in range(0, 2 * count, 2)]
    return []


# ------------------------------------------------------------- TIFF LZW ----

def _lzw_decode(data: bytes, cap: int, early: bool = True) -> bytes:
    """TIFF 6.0 §13: MSB-first variable-width codes, Clear=256, EOI=257,
    EARLY code-width change (width bumps when the next code to be added is
    2^width - 1 — one entry earlier than GIF's LSB variant).

    `early=False` gives the non-early variant (PDF /LZWDecode with
    /EarlyChange 0, ISO 32000-1 §7.4.4.3); pdf_text reuses this decoder for
    PDF LZW streams, whose bit/table layout is identical to TIFF's."""
    out = bytearray()
    n_in = len(data)
    width = 9
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    prev: bytes | None = None
    # MSB-first rolling accumulator: O(1) per code (no per-bit loop, no
    # whole-stream bigint shifts — PDF /LZWDecode shares this decoder, so
    # multi-KB content streams hit it on the extraction hot path)
    pos = acc = accbits = 0

    def read_code() -> int:
        nonlocal pos, acc, accbits
        while accbits < width:
            if pos >= n_in:
                return 257
            acc = (acc << 8) | data[pos]
            pos += 1
            accbits += 8
        accbits -= width
        val = (acc >> accbits) & ((1 << width) - 1)
        acc &= (1 << accbits) - 1
        return val

    while len(out) < cap:
        code = read_code()
        if code == 256:
            table = table[:258]
            width = 9
            prev = None
            continue
        if code == 257:
            break
        if prev is None:
            if code > 255:
                raise ImageDecodeError("tiff lzw: bad first code")
            entry = table[code]
        else:
            if code < len(table):
                entry = table[code]
            elif code == len(table):
                entry = prev + prev[:1]
            else:
                raise ImageDecodeError("tiff lzw: code out of range")
            table.append(prev + entry[:1])
        out += entry
        prev = entry
        # early change, decoder side: the decoder's table lags the
        # encoder's by exactly one entry at the same stream position (the
        # KwKwK lag), so it bumps at 2^w - 2 where the encoder bumps at
        # 2^w - 1 — this IS the "one earlier than GIF" spec rule.
        # Non-early (PDF /EarlyChange 0): everything shifts one entry later.
        if len(table) == (1 << width) - (2 if early else 1) and width < 12:
            width += 1
    return bytes(out[:cap])


def _lzw_encode(data: bytes) -> bytes:
    bits: list[tuple[int, int]] = []  # (code, width)
    width = 9
    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    bits.append((256, width))  # spec: begin with Clear
    w = b""
    for b in data:
        c = bytes([b])
        wc = w + c
        if wc in table:
            w = wc
            continue
        bits.append((table[w], width))
        table[wc] = next_code
        next_code += 1
        if next_code == (1 << width) - 1 and width < 12:  # early change
            width += 1
        if next_code == 4094:  # reset before the table overflows
            bits.append((256, width))
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        w = c
    if w:
        bits.append((table[w], width))
    bits.append((257, width))
    out = bytearray()
    acc = accn = 0
    for code, wd in bits:
        acc = (acc << wd) | code
        accn += wd
        while accn >= 8:
            accn -= 8
            out.append((acc >> accn) & 0xFF)
    if accn:
        out.append((acc << (8 - accn)) & 0xFF)
    return bytes(out)


# ------------------------------------------------------------- PackBits ----

def _packbits_decode(data: bytes, cap: int) -> bytes:
    out = bytearray()
    i, n = 0, len(data)
    while i < n and len(out) < cap:
        h = data[i]
        i += 1
        if h < 128:
            out += data[i:i + h + 1]
            i += h + 1
        elif h > 128:
            if i < n:
                out += bytes([data[i]]) * (257 - h)
                i += 1
        # 128 = noop
    return bytes(out[:cap])


def _packbits_encode(data: bytes) -> bytes:
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        # run of >= 3 identical bytes -> repeat packet
        j = i
        while j < n and j - i < 128 and data[j] == data[i]:
            j += 1
        if j - i >= 3:
            out += bytes([257 - (j - i), data[i]])
            i = j
            continue
        # literal packet: until a run of 3 starts (or 128 bytes)
        j = i
        while j < n and j - i < 128:
            if j + 2 < n and data[j] == data[j + 1] == data[j + 2]:
                break
            j += 1
        out += bytes([j - i - 1]) + data[i:j]
        i = j
    return bytes(out)


# --------------------------------------------------------------- decode ----

def decode_tiff(data: bytes) -> np.ndarray:
    """TIFF bytes -> (h, w, 3) uint8 RGB."""
    if len(data) < 8 or data[:4] not in (b"II*\x00", b"MM\x00*"):
        raise ImageDecodeError("tiff: bad magic")
    fmt = "<" if data[:2] == b"II" else ">"
    (ifd_off,) = struct.unpack(fmt + "I", data[4:8])
    if ifd_off + 2 > len(data):
        raise ImageDecodeError("tiff: IFD out of bounds")
    (n_tags,) = struct.unpack(fmt + "H", data[ifd_off:ifd_off + 2])
    tags: dict[int, list[int]] = {}
    for i in range(n_tags):
        e = ifd_off + 2 + 12 * i
        if e + 12 > len(data):
            raise ImageDecodeError("tiff: truncated IFD")
        tag, typ, count = struct.unpack(fmt + "HHI", data[e:e + 8])
        tags[tag] = _read_tag_values(data, fmt, typ, count, data[e + 8:e + 12])

    def one(tag: int, default: int | None = None) -> int:
        v = tags.get(tag)
        if not v:
            if default is None:
                raise ImageDecodeError(f"tiff: missing tag {tag}")
            return default
        return v[0]

    width, height = one(256), one(257)
    if not (0 < width <= 1 << 14 and 0 < height <= 1 << 14):
        raise ImageDecodeError("tiff: unreasonable dimensions")
    spp = one(277, 1)
    bits = tags.get(258, [8] * spp)
    comp = one(259, 1)
    photo = one(262, 1)
    if bits == [1] and spp == 1:
        return _decode_bilevel(data, tags, one, width, height, comp, photo)
    if any(b != 8 for b in bits):
        raise ImageDecodeError("tiff: only 8-bit samples supported")
    if one(284, 1) != 1:
        raise ImageDecodeError("tiff: planar config 2 unsupported")
    if 322 in tags or 323 in tags:
        raise ImageDecodeError("tiff: tiled layout unsupported")
    if photo not in (0, 1, 2) or spp not in (1, 3):
        raise ImageDecodeError("tiff: unsupported photometric/samples")
    predictor = one(317, 1)
    offsets = tags.get(273)
    counts = tags.get(279)
    if not offsets or not counts or len(offsets) != len(counts):
        raise ImageDecodeError("tiff: missing strip tables")
    rows_per_strip = one(278, height)

    stride = width * spp
    raw = bytearray()
    row0 = 0
    for off, cnt in zip(offsets, counts):
        rows = min(rows_per_strip, height - row0)
        cap = rows * stride
        chunk = data[off:off + cnt]
        if len(chunk) < cnt:
            raise ImageDecodeError("tiff: strip out of bounds")
        if comp == 1:
            dec = chunk[:cap]
        elif comp == 5:
            dec = _lzw_decode(chunk, cap)
        elif comp == 32773:
            dec = _packbits_decode(chunk, cap)
        else:
            raise ImageDecodeError(f"tiff: compression {comp} unsupported")
        if len(dec) < cap:
            raise ImageDecodeError("tiff: short strip")
        raw += dec
        row0 += rows
    arr = np.frombuffer(bytes(raw), dtype=np.uint8)[:height * stride]
    arr = arr.reshape(height, width, spp)
    if predictor == 2:
        arr = np.cumsum(arr.astype(np.uint32), axis=1, dtype=np.uint32) \
                .astype(np.uint8)
    elif predictor != 1:
        raise ImageDecodeError(f"tiff: predictor {predictor} unsupported")
    if spp == 1:
        g = 255 - arr[:, :, 0] if photo == 0 else arr[:, :, 0]
        return np.stack([g, g, g], axis=2)
    return np.ascontiguousarray(arr)


def _decode_bilevel(data, tags, one, width, height, comp, photo):
    """1-bit/sample strips: uncompressed packed bits (1), CCITT Modified
    Huffman / 'CCITT RLE' (2 — 1-D MH with every row byte-aligned), G3
    (3 — T4Options bit0 selects 1-D vs mixed 2-D), G4 (4 — pure MMR).
    The scanned-fax family; decoded ink maps to gray 0 under the
    dominant WhiteIsZero photometric (0), inverted for BlackIsZero."""
    from docvision_spark.kernel.ccitt_codec import (CcittError, g3_decode,
                                                    g4_decode)

    if photo not in (0, 1):
        raise ImageDecodeError("tiff: bilevel needs photometric 0/1")
    offsets = tags.get(273)
    counts = tags.get(279)
    if not offsets or not counts or len(offsets) != len(counts):
        raise ImageDecodeError("tiff: missing strip tables")
    rows_per_strip = one(278, height)
    t4opts = one(292, 0)
    rows_list = []
    row0 = 0
    for off, cnt in zip(offsets, counts):
        rows = min(rows_per_strip, height - row0)
        chunk = data[off:off + cnt]
        if len(chunk) < cnt:
            raise ImageDecodeError("tiff: strip out of bounds")
        try:
            if comp == 1:
                stride = (width + 7) // 8
                if len(chunk) < rows * stride:
                    raise ImageDecodeError("tiff: short bilevel strip")
                packed = np.frombuffer(chunk[:rows * stride], dtype=np.uint8)
                bm = np.unpackbits(packed.reshape(rows, stride),
                                   axis=1)[:, :width]
            elif comp == 2:
                bm = g3_decode(chunk, width, rows=rows, k=0,
                               byte_align=True)
            elif comp == 3:
                bm = g3_decode(chunk, width, rows=rows,
                               k=4 if t4opts & 1 else 0)
            elif comp == 4:
                bm = g4_decode(chunk, width, rows=rows)
            else:
                raise ImageDecodeError(
                    f"tiff: bilevel compression {comp} unsupported")
        except CcittError as e:
            raise ImageDecodeError(f"tiff: ccitt strip: {e}") from e
        rows_list.append(bm)
        row0 += rows
    bm = np.concatenate(rows_list, axis=0)[:height]
    # packed bits: 1 = black under WhiteIsZero (photo 0); CCITT decoders
    # return coding-domain black as 1 as well
    if photo == 0:
        g = np.where(bm != 0, 0, 255).astype(np.uint8)
    else:
        g = np.where(bm != 0, 255, 0).astype(np.uint8)
    return np.stack([g, g, g], axis=2)


# --------------------------------------------------------------- encode ----

def encode_tiff(arr: np.ndarray, compression: str = "none",
                predictor: bool = False) -> bytes:
    """(h, w[, 3]) uint8 -> little-endian single-strip TIFF. compression in
    {'none', 'lzw', 'packbits'}; predictor=True adds horizontal
    differencing (LZW only, the spec's usual pairing)."""
    gray = arr.ndim == 2
    h, w = arr.shape[:2]
    spp = 1 if gray else 3
    px = arr if gray else np.ascontiguousarray(arr[:, :, :3])
    data = px.reshape(h, w, spp)
    if predictor and compression == "lzw":
        d = data.astype(np.int16)
        d[:, 1:, :] = d[:, 1:, :] - d[:, :-1, :]
        data = (d % 256).astype(np.uint8)
    payload = data.tobytes()
    if compression == "lzw":
        comp_id, payload = 5, _lzw_encode(payload)
    elif compression == "packbits":
        comp_id, payload = 32773, _packbits_encode(payload)
    else:
        comp_id = 1

    entries: list[tuple[int, int, int, int]] = []  # tag, type, count, value
    header_len = 8
    n_tags = 10 if spp == 3 else 9
    ifd_len = 2 + 12 * n_tags + 4
    bits_off = header_len + ifd_len
    extra = b""
    if spp == 3:
        extra = struct.pack("<HHH", 8, 8, 8)
        strip_off = bits_off + len(extra)
        bits_val = bits_off
    else:
        strip_off = bits_off
        bits_val = 8
    entries.append((256, 4, 1, w))
    entries.append((257, 4, 1, h))
    entries.append((258, 3, spp, bits_val if spp == 3 else 8))
    entries.append((259, 3, 1, comp_id))
    entries.append((262, 3, 1, 2 if spp == 3 else 1))
    entries.append((273, 4, 1, strip_off))
    entries.append((277, 3, 1, spp))
    entries.append((278, 4, 1, h))
    entries.append((279, 4, 1, len(payload)))
    if predictor and compression == "lzw":
        entries.append((317, 3, 1, 2))
    # keep n_tags consistent when predictor adds one
    if len(entries) != n_tags:
        n_tags = len(entries)
        ifd_len = 2 + 12 * n_tags + 4
        bits_off = header_len + ifd_len
        if spp == 3:
            strip_off = bits_off + len(extra)
            for i, (t, ty, c, v) in enumerate(entries):
                if t == 258:
                    entries[i] = (t, ty, c, bits_off)
                if t == 273:
                    entries[i] = (t, ty, c, strip_off)
        else:
            strip_off = bits_off
            for i, (t, ty, c, v) in enumerate(entries):
                if t == 273:
                    entries[i] = (t, ty, c, strip_off)

    out = bytearray(b"II*\x00" + struct.pack("<I", 8))
    out += struct.pack("<H", n_tags)
    for tag, typ, count, value in sorted(entries):
        out += struct.pack("<HHI", tag, typ, count)
        if typ == 3 and count == 1:
            out += struct.pack("<HH", value, 0)
        else:
            out += struct.pack("<I", value)
    out += struct.pack("<I", 0)  # next-IFD pointer
    out += extra
    out += payload
    return bytes(out)


__all__ = ["decode_tiff", "encode_tiff"]


def encode_tiff_bilevel(bitmap: np.ndarray,
                        compression: str = "g4") -> bytes:
    """(h, w) 0/1 bitmap (1 = black) -> little-endian single-strip
    bilevel TIFF under WhiteIsZero (photometric 0). compression in
    {'g4', 'g3', 'g3-2d', 'mh', 'none'} — the scanned-fax family the
    bilevel decoder reads back."""
    from docvision_spark.kernel.ccitt_codec import g3_encode, g4_encode

    bm = (np.asarray(bitmap) != 0).astype(np.uint8)
    h, w = bm.shape
    t4opts = None
    if compression == "g4":
        comp_id, payload = 4, g4_encode(bm)
    elif compression == "g3":
        comp_id, payload, t4opts = 3, g3_encode(bm, k=0), 0
    elif compression == "g3-2d":
        comp_id, payload, t4opts = 3, g3_encode(bm, k=4), 1
    elif compression == "mh":
        # Modified Huffman: 1-D MH, every row byte-aligned. g3_encode
        # emits rows back-to-back, so pad each row separately.
        parts = [g3_encode(bm[y:y + 1], k=0) for y in range(h)]
        comp_id, payload = 2, b"".join(parts)
    elif compression == "none":
        stride = (w + 7) // 8
        comp_id = 1
        payload = np.packbits(bm, axis=1)[:, :stride].tobytes()
    else:
        raise ValueError(f"encode_tiff_bilevel: {compression}")

    entries = [
        (256, 4, 1, w), (257, 4, 1, h), (258, 3, 1, 1),
        (259, 3, 1, comp_id), (262, 3, 1, 0),
        (277, 3, 1, 1), (278, 4, 1, h), (279, 4, 1, len(payload)),
    ]
    if t4opts is not None:
        entries.append((292, 4, 1, t4opts))
    n_tags = len(entries) + 1  # + strip offset
    ifd_len = 2 + 12 * n_tags + 4
    strip_off = 8 + ifd_len
    entries.append((273, 4, 1, strip_off))
    out = bytearray(b"II*\x00" + struct.pack("<I", 8))
    out += struct.pack("<H", n_tags)
    for tag, typ, count, value in sorted(entries):
        out += struct.pack("<HHI", tag, typ, count)
        if typ == 3:
            out += struct.pack("<HH", value, 0)
        else:
            out += struct.pack("<I", value)
    out += struct.pack("<I", 0)  # next IFD
    out += payload
    return bytes(out)
