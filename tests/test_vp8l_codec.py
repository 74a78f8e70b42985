"""VP8L (lossless WebP) codec tests: encoder round-trips for every encoder
path, plus HAND-CRAFTED bitstreams for the decoder-only features the simple
encoder never emits (LZ77 backrefs, color cache, predictor transform,
color transform, meta prefix groups)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from docvision_spark.kernel.image_codec import ImageDecodeError
from docvision_spark.kernel.vp8l_codec import (
    _BitWriter,
    _canonical_codes,
    _complete_lengths,
    vp8l_decode,
    vp8l_encode,
    webp_decode,
)


def _rng():
    return np.random.default_rng(0xC0DEC)


# ------------------------------------------------------ encoder roundtrip --

def test_roundtrip_rgb_random():
    img = _rng().integers(0, 256, size=(37, 53, 3), dtype=np.uint8)
    for sg in (False, True):
        assert np.array_equal(webp_decode(vp8l_encode(img, subtract_green=sg)),
                              img)


def test_roundtrip_rgba():
    img = _rng().integers(0, 256, size=(12, 9, 4), dtype=np.uint8)
    enc = vp8l_encode(img)
    body_len = struct.unpack("<I", enc[16:20])[0]
    assert np.array_equal(vp8l_decode(enc[20:20 + body_len]), img)


@pytest.mark.parametrize("ncol", [2, 3, 4, 9, 16])
def test_roundtrip_palette_bundling(ncol):
    rng = _rng()
    pal = rng.integers(0, 256, size=(ncol, 3), dtype=np.uint8)
    idx = rng.integers(0, ncol, size=(23, 41))
    img = pal[idx]
    assert np.array_equal(webp_decode(vp8l_encode(img)), img)


def test_roundtrip_odd_widths():
    # bundling edge: widths not divisible by pixels-per-byte
    rng = _rng()
    for w in (1, 7, 15, 33):
        img = rng.integers(0, 2, size=(5, w, 3), dtype=np.uint8) * 255
        assert np.array_equal(webp_decode(vp8l_encode(img)), img)


def test_roundtrip_single_color():
    img = np.full((16, 16, 3), 77, dtype=np.uint8)
    assert np.array_equal(webp_decode(vp8l_encode(img)), img)


def test_grayscale_and_determinism():
    g = _rng().integers(0, 256, size=(20, 20), dtype=np.uint8)
    e1, e2 = vp8l_encode(g), vp8l_encode(g)
    assert e1 == e2  # byte-deterministic
    dec = webp_decode(e1)
    assert np.array_equal(dec[:, :, 0], g) and np.array_equal(dec[:, :, 2], g)


# --------------------------------------------------- crafted decoder paths --

def _wrap(bw: _BitWriter, w: int, h: int) -> bytes:
    hdr = _BitWriter()
    hdr.write(w - 1, 14)
    hdr.write(h - 1, 14)
    hdr.write(0, 1)
    hdr.write(0, 3)
    hdr.write(bw.val, bw.pos)
    return bytes([0x2F]) + hdr.bytes()


def _write_simple_code(bw: _BitWriter, syms: list[int]):
    bw.write(1, 1)
    bw.write(len(syms) - 1, 1)
    bw.write(1, 1)
    bw.write(syms[0], 8)
    if len(syms) == 2:
        bw.write(syms[1], 8)
    return ({syms[0]: (0, 0)} if len(syms) == 1
            else {syms[0]: (0, 1), syms[1]: (1, 1)})


def test_crafted_lz77_and_cache():
    """5x1 image of one repeated pixel: literal, backref(len 3, dist 1 via
    the raw-distance plane code 121), then a color-cache hit."""
    A = (0xFF << 24) | (10 << 16) | (20 << 8) | 30
    cache_bits = 4
    key = ((0x1E35A7BD * A) & 0xFFFFFFFF) >> (32 - cache_bits)
    bw = _BitWriter()
    bw.write(0, 1)              # no transforms
    bw.write(1, 1)              # color cache present
    bw.write(cache_bits, 4)
    bw.write(0, 1)              # no meta prefix
    # green code: symbols {20 literal, 258 len-3, 280+key cache}
    glens = _complete_lengths([20, 258, 280 + key], 256 + 24 + 16)
    from docvision_spark.kernel.vp8l_codec import _write_prefix_code
    gc = _write_prefix_code(bw, glens)
    rc = _write_simple_code(bw, [10])
    bc = _write_simple_code(bw, [30])
    ac = _write_simple_code(bw, [0xFF])
    # distance: raw distance 1 -> plane code 121 -> prefix code 13 + 5 extra
    dc = _write_simple_code(bw, [13])
    # body: literal A
    c, L = gc[20]
    bw.write_code_msb(c, L)
    # backref: green 258 (length code 2 -> 3), distance sym 13, extra 24
    c, L = gc[258]
    bw.write_code_msb(c, L)
    bw.write(24, 5)             # (2+(13&1))<<5 + 24 + 1 = 121 -> dist 1
    # cache hit
    c, L = gc[280 + key]
    bw.write_code_msb(c, L)
    out = vp8l_decode(_wrap(bw, 5, 1))
    assert out.shape == (1, 5, 4)
    assert (out[0, :, 0] == 10).all() and (out[0, :, 2] == 30).all()
    assert rc and bc and ac and dc  # codes written (silence lints)


def test_crafted_predictor_transform():
    """2x4 image, predictor mode 2 (T) everywhere via a single-tile
    predictor sub-image; residuals crafted so the output is a known ramp."""
    w, h = 4, 2
    target = np.zeros((h, w, 4), dtype=np.int64)
    target[..., 3] = 255
    target[0, :, 0] = [10, 30, 50, 70]       # row 0: red ramp
    target[1, :, 0] = [11, 32, 53, 74]
    target[..., 1] = 5
    target[..., 2] = 9
    # residuals under the spec's border rules: (0,0) pred= a:255 black;
    # row0 others pred=L; row1 x=0 pred=T; row1 x>0 mode T
    res = np.zeros_like(target)
    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                pred = np.array([0, 0, 0, 255])
            elif y == 0:
                pred = target[0, x - 1]
            else:
                pred = target[y - 1, x]
            res[y, x] = (target[y, x] - pred) % 256

    bw = _BitWriter()
    bw.write(1, 1)              # transform present
    bw.write(0, 2)              # predictor transform
    bw.write(1, 3)              # size_bits = 3 -> 8x8 tiles -> 1x1 subimage
    # sub-image: one pixel, green = predictor mode 2
    bw.write(0, 1)              # sub: no cache
    sg = _write_simple_code(bw, [2])
    sr = _write_simple_code(bw, [0])
    sb = _write_simple_code(bw, [0])
    sa = _write_simple_code(bw, [0])
    sd = _write_simple_code(bw, [0])
    assert sg[2] == (0, 0) and sr and sb and sa and sd  # all zero-bit codes
    bw.write(0, 1)              # end of transforms
    # main image: literals of the residuals
    bw.write(0, 1)              # no cache
    bw.write(0, 1)              # no meta
    from docvision_spark.kernel.vp8l_codec import _write_prefix_code
    chans = {
        "g": sorted(set(int(v) for v in res[..., 1].ravel())),
        "r": sorted(set(int(v) for v in res[..., 0].ravel())),
        "b": sorted(set(int(v) for v in res[..., 2].ravel())),
        "a": sorted(set(int(v) for v in res[..., 3].ravel())),
    }
    gc = _write_prefix_code(bw, _complete_lengths(chans["g"], 280))
    rc = _write_prefix_code(bw, _complete_lengths(chans["r"], 256))
    bc = _write_prefix_code(bw, _complete_lengths(chans["b"], 256))
    ac = _write_prefix_code(bw, _complete_lengths(chans["a"], 256))
    _write_prefix_code(bw, _complete_lengths([0], 40))
    for y in range(h):
        for x in range(w):
            for code, ch in ((gc, 1), (rc, 0), (bc, 2), (ac, 3)):
                c, L = code[int(res[y, x, ch])]
                bw.write_code_msb(c, L)
    out = vp8l_decode(_wrap(bw, w, h))
    assert np.array_equal(out.astype(np.int64), target)


def test_crafted_color_transform():
    """1-tile color transform with known multipliers: decoder must invert
    red += (g2r*green)>>5 and blue += (g2b*green)>>5 + (r2b*red')>>5."""
    w, h = 2, 1
    g2r, g2b, r2b = 3, -2, 5  # signed 3.5 fixed-point multipliers
    cte = ((r2b & 0xFF) << 16) | ((g2b & 0xFF) << 8) | (g2r & 0xFF)
    final = [(255, 100, 40, 200), (255, 8, 96, 16)]  # a, r, g, b targets

    def delta(t, c):
        ts = ((t & 0xFF) ^ 0x80) - 0x80
        cs = ((c & 0xFF) ^ 0x80) - 0x80
        return (ts * cs) >> 5

    coded = []
    for a, r, g, b in final:
        cr = (r - delta(g2r, g)) % 256
        cb = (b - delta(g2b, g) - delta(r2b, r)) % 256
        coded.append((a, cr, g, cb))

    bw = _BitWriter()
    bw.write(1, 1)
    bw.write(1, 2)              # color transform
    bw.write(1, 3)              # size_bits 3 -> single tile
    bw.write(0, 1)              # sub-image: no cache
    _write_simple_code(bw, [(cte >> 8) & 0xFF])    # green = g2b byte
    _write_simple_code(bw, [(cte >> 16) & 0xFF])   # red = r2b byte
    _write_simple_code(bw, [cte & 0xFF])           # blue = g2r byte
    _write_simple_code(bw, [0])                    # alpha
    _write_simple_code(bw, [0])                    # distance
    bw.write(0, 1)              # end of transforms
    bw.write(0, 1)              # no cache
    bw.write(0, 1)              # no meta
    from docvision_spark.kernel.vp8l_codec import _write_prefix_code
    gs = sorted({c[2] for c in coded})
    rs = sorted({c[1] for c in coded})
    bs = sorted({c[3] for c in coded})
    gc = _write_prefix_code(bw, _complete_lengths(gs, 280))
    rc = _write_prefix_code(bw, _complete_lengths(rs, 256))
    bc = _write_prefix_code(bw, _complete_lengths(bs, 256))
    ac = _write_prefix_code(bw, _complete_lengths([255], 256))
    _write_prefix_code(bw, _complete_lengths([0], 40))
    for a, cr, g, cb in coded:
        for code, v in ((gc, g), (rc, cr), (bc, cb), (ac, a)):
            c, L = code[v]
            bw.write_code_msb(c, L)
    out = vp8l_decode(_wrap(bw, w, h))
    got = [(int(out[0, i, 3]), int(out[0, i, 0]), int(out[0, i, 1]),
            int(out[0, i, 2])) for i in range(w)]
    assert got == final


def test_truncated_and_garbage_raise_typed():
    img = _rng().integers(0, 256, size=(8, 8, 3), dtype=np.uint8)
    enc = vp8l_encode(img)
    with pytest.raises(ImageDecodeError):
        webp_decode(enc[:30])
    with pytest.raises(ImageDecodeError):
        vp8l_decode(b"\x00\x01\x02\x03\x04\x05")
    # lossy VP8 decodes for real now (kernel/vp8_codec); even the junk
    # stub bitstream decodes deterministically (arithmetic decoders
    # accept any bit string) — totality, not an error
    from docvision_spark.kernel.image_codec import encode_webp_stub
    out = webp_decode(encode_webp_stub(5, lossless=False))
    assert out.shape == (80, 100, 3)


def test_decode_image_dispatch_and_features():
    from docvision_spark.kernel.image_codec import decode_image
    img = _rng().integers(0, 256, size=(24, 31, 3), dtype=np.uint8)
    rgb, fmt = decode_image(vp8l_encode(img))
    assert fmt == "webp" and np.array_equal(rgb, img)


def test_canonical_code_helpers_agree():
    lengths = _complete_lengths([3, 7, 100, 200, 279], 280)
    codes = _canonical_codes(lengths)
    assert len(codes) == 5
    # kraft completeness
    assert sum(2 ** -(L) for _c, L in codes.values()) == 1.0


def test_plane_table_head_matches_spec():
    """The first entries of the distance-plane table as published in the
    WebP lossless spec's dist_map listing — pins the table-generation rule
    to the spec text (the tail shares the same ordering rule; encoder
    round-trips never depend on the table, see module docstring)."""
    from docvision_spark.kernel.vp8l_codec import _PLANE
    assert len(_PLANE) == 120
    assert _PLANE[:12] == [(0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0),
                           (1, 2), (-1, 2), (2, 1), (-2, 1), (2, 2), (-2, 2)]
    # every entry decodes to a positive distance for any width >= 9
    from docvision_spark.kernel.vp8l_codec import _plane_to_distance
    assert all(_plane_to_distance(c, 9) >= 1 for c in range(1, 121))
    assert _plane_to_distance(121, 9) == 1  # raw-distance escape


def test_crafted_meta_prefix_groups():
    """8x1 image with meta_bits=2 (4-pixel tiles): two prefix groups, one
    per tile, each a different constant color — exercises the meta prefix
    image path (group index = (red<<8)|green of the meta pixel)."""
    w, h = 8, 1
    bw = _BitWriter()
    bw.write(0, 1)              # no transforms
    bw.write(0, 1)              # no color cache
    bw.write(1, 1)              # meta prefix present
    bw.write(0, 3)              # meta_bits = 0 + 2 = 2 -> 4px tiles
    # meta image: 2x1 entropy-coded image; green channel = group index
    bw.write(0, 1)              # meta sub-image: no cache
    mg = _write_simple_code(bw, [0, 1])   # greens 0 and 1
    _write_simple_code(bw, [0])           # red
    _write_simple_code(bw, [0])           # blue
    _write_simple_code(bw, [0])           # alpha
    _write_simple_code(bw, [0])           # distance
    for gidx in (0, 1):                   # tile 0 -> group 0, tile 1 -> 1
        c, L = mg[gidx]
        bw.write_code_msb(c, L)
    # two groups, 5 codes each; constant colors (10,20,30) and (40,50,60)
    groups = []
    for r, g, b in ((10, 20, 30), (40, 50, 60)):
        gc = _write_simple_code(bw, [g])
        rc = _write_simple_code(bw, [r])
        bc = _write_simple_code(bw, [b])
        ac = _write_simple_code(bw, [255])
        _write_simple_code(bw, [0])
        groups.append((gc, rc, bc, ac))
    # body: all codes are zero-bit singles -> nothing to write per pixel
    out = vp8l_decode(_wrap(bw, w, h))
    assert out.shape == (1, 8, 4)
    assert [tuple(px) for px in out[0, :4, :3]] == [(10, 20, 30)] * 4
    assert [tuple(px) for px in out[0, 4:, :3]] == [(40, 50, 60)] * 4


def test_crafted_meta_prefix_backref_lands_mid_tile():
    """Regression for the mid-tile group bug: a backref that jumps pos into
    the MIDDLE of a different meta tile must decode the following literal
    with the NEW tile's prefix group (a boundary-only recompute keeps the
    stale group)."""
    w, h = 8, 1
    bw = _BitWriter()
    bw.write(0, 1)              # no transforms
    bw.write(0, 1)              # no cache
    bw.write(1, 1)              # meta prefix
    bw.write(0, 3)              # meta_bits 2 -> tiles of 4 px
    bw.write(0, 1)              # meta sub: no cache
    mg = _write_simple_code(bw, [0, 1])
    _write_simple_code(bw, [0])
    _write_simple_code(bw, [0])
    _write_simple_code(bw, [0])
    _write_simple_code(bw, [0])
    for gidx in (0, 1):
        c, L = mg[gidx]
        bw.write_code_msb(c, L)
    # group 0: green symbols {7 literal, 260 (length code 4 -> 5..6)} —
    # 260 exceeds the simple-code 8-bit symbol field, so a normal code
    from docvision_spark.kernel.vp8l_codec import _write_prefix_code
    g0 = _write_prefix_code(bw, _complete_lengths([7, 260], 280))
    _write_simple_code(bw, [70])    # red
    _write_simple_code(bw, [77])    # blue
    _write_simple_code(bw, [255])   # alpha
    d0 = _write_simple_code(bw, [13])  # distance: plane 121 -> dist 1
    # group 1: single literal (9/90/99)
    g1 = _write_simple_code(bw, [9])
    _write_simple_code(bw, [90])
    _write_simple_code(bw, [99])
    _write_simple_code(bw, [255])
    _write_simple_code(bw, [0])
    assert d0[13] == (0, 0) and g1[9] == (0, 0)
    # body: x0 literal(7) [group 0]; then backref length 6 dist 1 -> fills
    # x1..x6, ENDING MID-TILE-1; then one literal decoded at x7 — must use
    # group 1's codes (all zero-bit), NOT group 0's
    c, L = g0[7]
    bw.write_code_msb(c, L)
    c, L = g0[260]
    bw.write_code_msb(c, L)
    bw.write(1, 1)              # length extra bit: (2+0)<<1 + 1 + 1 = 6
    bw.write(24, 5)             # distance extras -> plane 121 -> dist 1
    # x7 literal: group 1 codes are all zero-bit — no bits needed
    out = vp8l_decode(_wrap(bw, w, h))
    assert [tuple(px) for px in out[0, :7, :3]] == [(70, 7, 77)] * 7
    assert tuple(out[0, 7, :3]) == (90, 9, 99), \
        "literal after mid-tile backref used the stale prefix group"


def test_vp8l_pixel_budget():
    """A header declaring more than VP8L_MAX_PIXELS raises the typed
    ImageDecodeError BEFORE entering the per-pixel decode loops (round-4
    ADVICE: the 14-bit fields allow 16384x16384 ~ 268M px, which would
    stall an executor task for minutes)."""
    import pytest

    from docvision_spark.kernel.image_codec import ImageDecodeError
    from docvision_spark.kernel.vp8l_codec import VP8L_MAX_PIXELS, vp8l_decode

    hdr = 16383 | (16383 << 14) | (0 << 28) | (0 << 29)  # 16384x16384
    body = b"\x2f" + hdr.to_bytes(4, "little") + b"\x00" * 16
    assert 16384 * 16384 > VP8L_MAX_PIXELS
    with pytest.raises(ImageDecodeError, match="pixel budget"):
        vp8l_decode(body)
