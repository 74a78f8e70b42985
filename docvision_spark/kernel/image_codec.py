"""Pure-numpy image codec: PNG / BMP / PNM decode, PNG encode, resize,
grayscale, perceptual hashes. No cv2/PIL — stdlib zlib + numpy only, so the
multimodal decode stage is REAL in this container, not a stub.

Replaces the reference's cv2.imread / adaptive-resize path
(reference: src/docvision/core/parser.py:554-563 _load_image,
src/docvision/processing/image.py:351-366 adaptive resize) with
deterministic from-scratch decoders. Formats covered are the ones fully
specified by public specs and decodable without native libs:

  PNG  — 8-bit gray / gray+alpha / RGB / RGBA / palette, non-interlaced,
         all five scanline filters (None/Sub/Up/Average/Paeth).
  BMP  — BITMAPINFOHEADER, 8(palette)/24/32-bit uncompressed, bottom-up
         or top-down.
  PNM  — P5 (gray) / P6 (RGB) binary, maxval <= 255.

Everything returns / accepts uint8 arrays: (H, W, 3) for color,
(H, W) for grayscale. All math is integer or float64-rounded so results
are bit-stable across runs and partitions (required: feature rows feed
hash-compared oracles).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"


class ImageDecodeError(ValueError):
    """Raised on malformed or unsupported image bytes."""


# ---------------------------------------------------------------- PNG decode

def _png_unfilter(raw: np.ndarray, height: int, stride: int, bpp: int) -> np.ndarray:
    """Undo PNG scanline filtering. raw is the decompressed byte stream:
    height rows of (1 filter byte + stride data bytes). Returns
    (height, stride) uint8 of reconstructed bytes.

    Sub is vectorized with a modular cumsum over the pixel axis; Up is a
    plain vector add; Average/Paeth carry an intra-row dependency and fall
    back to a per-pixel-column loop (still vector across channels).
    """
    rows = raw.reshape(height, stride + 1)
    ftypes = rows[:, 0]
    data = rows[:, 1:].astype(np.int32)
    out = np.zeros((height, stride), dtype=np.int32)
    prior = np.zeros(stride, dtype=np.int32)
    npix = stride // bpp
    for y in range(height):
        ft = int(ftypes[y])
        line = data[y]
        if ft == 0:
            rec = line
        elif ft == 1:  # Sub: rec[i] = line[i] + rec[i-bpp]
            px = line.reshape(npix, bpp)
            rec = np.cumsum(px, axis=0).reshape(stride) & 0xFF
        elif ft == 2:  # Up
            rec = (line + prior) & 0xFF
        elif ft == 3:  # Average
            rec = np.empty(stride, dtype=np.int32)
            left = np.zeros(bpp, dtype=np.int32)
            for i in range(npix):
                s = i * bpp
                rec[s:s + bpp] = (line[s:s + bpp]
                                  + ((left + prior[s:s + bpp]) >> 1)) & 0xFF
                left = rec[s:s + bpp]
        elif ft == 4:  # Paeth
            rec = np.empty(stride, dtype=np.int32)
            left = np.zeros(bpp, dtype=np.int32)
            ul = np.zeros(bpp, dtype=np.int32)
            for i in range(npix):
                s = i * bpp
                up = prior[s:s + bpp]
                p = left + up - ul
                pa, pb, pc = np.abs(p - left), np.abs(p - up), np.abs(p - ul)
                pred = np.where((pa <= pb) & (pa <= pc), left,
                                np.where(pb <= pc, up, ul))
                rec[s:s + bpp] = (line[s:s + bpp] + pred) & 0xFF
                left = rec[s:s + bpp]
                ul = up
        else:
            raise ImageDecodeError(f"png: bad filter type {ft}")
        out[y] = rec
        prior = rec
    return out.astype(np.uint8)


def decode_png(data: bytes) -> np.ndarray:
    """Decode an 8-bit non-interlaced PNG to (H, W, 3) uint8 (alpha dropped,
    palette resolved, gray replicated)."""
    if data[:8] != PNG_SIG:
        raise ImageDecodeError("png: bad signature")
    pos, idat, ihdr, plte = 8, [], None, None
    while pos + 8 <= len(data):
        (length,), ctype = struct.unpack(">I", data[pos:pos + 4]), data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        if len(body) != length:
            raise ImageDecodeError("png: truncated chunk")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"PLTE":
            plte = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if ihdr is None or not idat:
        raise ImageDecodeError("png: missing IHDR/IDAT")
    w, h, depth, ctype_, comp, filt, interlace = ihdr
    if depth != 8 or comp != 0 or filt != 0 or interlace != 0:
        raise ImageDecodeError(
            f"png: unsupported depth/compression/interlace {depth}/{comp}/{interlace}")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(ctype_)
    if channels is None:
        raise ImageDecodeError(f"png: bad color type {ctype_}")
    if w == 0 or h == 0:
        raise ImageDecodeError("png: zero dimension")
    try:
        raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    except zlib.error as e:
        raise ImageDecodeError(f"png: zlib {e}") from e
    stride = w * channels
    if raw.size != h * (stride + 1):
        raise ImageDecodeError("png: bad data length")
    px = _png_unfilter(raw, h, stride, channels).reshape(h, w, channels)
    if ctype_ == 3:  # palette
        if plte is None:
            raise ImageDecodeError("png: palette image without PLTE")
        if int(px.max()) >= plte.shape[0]:
            raise ImageDecodeError("png: palette index out of range")
        return plte[px[:, :, 0]]
    if channels == 1:
        return np.repeat(px, 3, axis=2)
    if channels == 2:  # gray+alpha -> drop alpha
        return np.repeat(px[:, :, :1], 3, axis=2)
    if channels == 4:  # RGBA -> drop alpha
        return np.ascontiguousarray(px[:, :, :3])
    return px


# ---------------------------------------------------------------- PNG encode

def _png_filter_row(ft: int, line: np.ndarray, prior: np.ndarray, bpp: int) -> np.ndarray:
    """Forward PNG filter for one reconstructed row (encoder side)."""
    li = line.astype(np.int32)
    left = np.concatenate([np.zeros(bpp, np.int32), li[:-bpp]])
    up = prior.astype(np.int32)
    ul = np.concatenate([np.zeros(bpp, np.int32), up[:-bpp]])
    if ft == 0:
        return line
    if ft == 1:
        return ((li - left) & 0xFF).astype(np.uint8)
    if ft == 2:
        return ((li - up) & 0xFF).astype(np.uint8)
    if ft == 3:
        return ((li - ((left + up) >> 1)) & 0xFF).astype(np.uint8)
    p = left + up - ul
    pa, pb, pc = np.abs(p - left), np.abs(p - up), np.abs(p - ul)
    pred = np.where((pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up, ul))
    return ((li - pred) & 0xFF).astype(np.uint8)


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (struct.pack(">I", len(body)) + ctype + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF))


def encode_png(arr: np.ndarray, filter_type: int = 1) -> bytes:
    """Encode (H, W) gray or (H, W, 3|4) uint8 as PNG with a single fixed
    scanline filter (default Sub). Deterministic: fixed zlib level 6."""
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        ctype_, channels = 0, 1
        flat = arr[:, :, None]
    elif arr.ndim == 3 and arr.shape[2] == 3:
        ctype_, channels = 2, 3
        flat = arr
    elif arr.ndim == 3 and arr.shape[2] == 4:
        ctype_, channels = 6, 4
        flat = arr
    else:
        raise ValueError(f"encode_png: bad shape {arr.shape}")
    h, w = flat.shape[:2]
    stride = w * channels
    body = bytearray()
    prior = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        line = flat[y].reshape(stride)
        body.append(filter_type)
        body += _png_filter_row(filter_type, line, prior, channels).tobytes()
        prior = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype_, 0, 0, 0)
    return (PNG_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(body), 6))
            + _chunk(b"IEND", b""))


# ----------------------------------------------------------------------- BMP

def decode_bmp(data: bytes) -> np.ndarray:
    """Decode uncompressed 8(palette)/24/32-bit BITMAPINFOHEADER BMP to
    (H, W, 3) uint8 RGB."""
    if data[:2] != b"BM" or len(data) < 54:
        raise ImageDecodeError("bmp: bad header")
    off = struct.unpack("<I", data[10:14])[0]
    hsize = struct.unpack("<I", data[14:18])[0]
    w, h = struct.unpack("<ii", data[18:26])
    if hsize < 40:
        raise ImageDecodeError("bmp: pre-BITMAPINFOHEADER not supported")
    bpp = struct.unpack("<H", data[28:30])[0]
    comp = struct.unpack("<I", data[30:34])[0]
    if comp != 0 or bpp not in (8, 24, 32):
        raise ImageDecodeError(f"bmp: unsupported bpp/compression {bpp}/{comp}")
    topdown = h < 0
    h = abs(h)
    if w <= 0 or h == 0:
        raise ImageDecodeError("bmp: bad dimensions")
    nbytes = bpp // 8
    stride = (w * nbytes + 3) & ~3
    px = data[off:off + stride * h]
    if len(px) < stride * h:
        raise ImageDecodeError("bmp: truncated pixel data")
    rows = np.frombuffer(px, dtype=np.uint8).reshape(h, stride)
    if bpp == 8:
        ncolors = struct.unpack("<I", data[46:50])[0] or 256
        pal = np.frombuffer(data[14 + hsize:14 + hsize + 4 * ncolors],
                            dtype=np.uint8).reshape(-1, 4)[:, [2, 1, 0]]  # BGRA->RGB
        idx = rows[:, :w]
        if int(idx.max()) >= pal.shape[0]:
            raise ImageDecodeError("bmp: palette index out of range")
        out = pal[idx]
    else:
        bgr = rows[:, :w * nbytes].reshape(h, w, nbytes)
        out = bgr[:, :, [2, 1, 0]]  # BGR(A) -> RGB, alpha dropped
    return np.ascontiguousarray(out if topdown else out[::-1])


# ----------------------------------------------------------------------- PNM

def decode_pnm(data: bytes) -> np.ndarray:
    """Decode binary P5 (gray) / P6 (RGB), maxval <= 255, to (H, W, 3)."""
    if data[:2] not in (b"P5", b"P6"):
        raise ImageDecodeError("pnm: bad magic")
    channels = 1 if data[:2] == b"P5" else 3
    # header: magic, width, height, maxval — whitespace/comment separated
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(data) and data[pos:pos + 1].isspace():
            pos += 1
        if data[pos:pos + 1] == b"#":
            while pos < len(data) and data[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos:pos + 1].isspace():
            pos += 1
        if pos == start:
            raise ImageDecodeError("pnm: truncated header")
        try:
            fields.append(int(data[start:pos]))
        except ValueError as e:
            raise ImageDecodeError("pnm: non-numeric header field") from e
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval > 255 or w <= 0 or h <= 0:
        raise ImageDecodeError(f"pnm: unsupported maxval/dims {maxval} {w}x{h}")
    need = w * h * channels
    px = np.frombuffer(data[pos:pos + need], dtype=np.uint8)
    if px.size != need:
        raise ImageDecodeError("pnm: truncated pixel data")
    px = px.reshape(h, w, channels)
    return np.repeat(px, 3, axis=2) if channels == 1 else px


# ------------------------------------------------------------------ dispatch

def decode_image(data: bytes) -> tuple[np.ndarray, str]:
    """Sniff magic bytes and decode. Returns (rgb array, format name)."""
    if data is None or len(data) < 8:
        raise ImageDecodeError("empty or tiny payload")
    if data[:8] == PNG_SIG:
        return decode_png(data), "png"
    if data[:2] == b"BM":
        return decode_bmp(data), "bmp"
    if data[:2] in (b"P5", b"P6"):
        return decode_pnm(data), "pnm"
    raise ImageDecodeError("unknown image format")


# ---------------------------------------------------------------- transforms

def to_gray(rgb: np.ndarray) -> np.ndarray:
    """ITU-R BT.601 luma, integer arithmetic (deterministic):
    y = (299 r + 587 g + 114 b) // 1000."""
    r = rgb[:, :, 0].astype(np.uint32)
    g = rgb[:, :, 1].astype(np.uint32)
    b = rgb[:, :, 2].astype(np.uint32)
    return ((299 * r + 587 * g + 114 * b) // 1000).astype(np.uint8)


def resize_nearest(arr: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    h, w = arr.shape[:2]
    ys = np.minimum((np.arange(out_h) * h) // out_h, h - 1)
    xs = np.minimum((np.arange(out_w) * w) // out_w, w - 1)
    return arr[ys][:, xs]


def resize_bilinear(arr: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Bilinear resample with align-corners=False pixel-center mapping;
    float64 then round-half-up so results are platform-stable."""
    h, w = arr.shape[:2]
    gray = arr.ndim == 2
    src = (arr[:, :, None] if gray else arr).astype(np.float64)
    fy = (np.arange(out_h) + 0.5) * (h / out_h) - 0.5
    fx = (np.arange(out_w) + 0.5) * (w / out_w) - 0.5
    y0 = np.clip(np.floor(fy).astype(np.int64), 0, h - 1)
    x0 = np.clip(np.floor(fx).astype(np.int64), 0, w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    wy = np.clip(fy - y0, 0.0, 1.0)[:, None, None]
    wx = np.clip(fx - x0, 0.0, 1.0)[None, :, None]
    top = src[y0][:, x0] * (1 - wx) + src[y0][:, x1] * wx
    bot = src[y1][:, x0] * (1 - wx) + src[y1][:, x1] * wx
    out = np.floor(top * (1 - wy) + bot * wy + 0.5).astype(np.uint8)
    return out[:, :, 0] if gray else out


# ---------------------------------------------------------- perceptual hashes

def _bits_to_int64(bits: np.ndarray) -> int:
    """Pack a 64-element 0/1 array into a SIGNED 64-bit int (Spark LongType
    compatible; bit 0 is the MSB)."""
    v = 0
    for b in bits.reshape(64):
        v = (v << 1) | int(b)
    return v - (1 << 64) if v >= (1 << 63) else v


def ahash64(rgb: np.ndarray) -> int:
    """Average hash: gray -> 8x8 bilinear -> mean threshold -> 64 bits."""
    small = resize_bilinear(to_gray(rgb), 8, 8).astype(np.int32)
    return _bits_to_int64((small > small.mean()).astype(np.uint8))


def dhash64(rgb: np.ndarray) -> int:
    """Difference hash: gray -> 9x8 bilinear -> horizontal gradient sign."""
    small = resize_bilinear(to_gray(rgb), 9, 8).astype(np.int32)
    return _bits_to_int64((small[:, 1:] > small[:, :-1]).astype(np.uint8))


def luma_stats(rgb: np.ndarray) -> tuple[float, float]:
    """(mean, std) of the BT.601 luma plane, rounded to 4 dp for stability."""
    g = to_gray(rgb).astype(np.float64)
    return round(float(g.mean()), 4), round(float(g.std()), 4)
