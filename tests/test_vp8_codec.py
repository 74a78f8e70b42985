"""VP8 lossy codec tests: bool-coder exactness, normative-inverse
pins, encode->decode fidelity, header parse, totality fuzz."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from docvision_spark.kernel.image_codec import ImageDecodeError
from docvision_spark.kernel.vp8_codec import (
    AC_QLOOKUP, DC_QLOOKUP, BoolDecoder, BoolEncoder, _fdct, _fwht,
    idct4x4, iwht4x4, predict_b, predict_block, vp8_decode, vp8_encode,
    webp_encode_lossy)


@settings(max_examples=40, deadline=None)
@given(st.integers(0, 2**32 - 1), st.integers(1, 600))
def test_bool_coder_roundtrip_fuzz(seed, n):
    rng = np.random.default_rng(seed)
    bits = rng.integers(0, 2, n).tolist()
    probs = rng.integers(1, 255, n).tolist()
    be = BoolEncoder()
    for b, p in zip(bits, probs):
        be.put(int(b), int(p))
    bd = BoolDecoder(be.tobytes())
    assert [bd.get(int(p)) for p in probs] == [int(b) for b in bits]


def test_dequant_table_pins():
    """Head/tail values of the RFC 6386 §14.1 lookup tables + the
    monotonicity the spec guarantees."""
    assert DC_QLOOKUP[0] == 4 and DC_QLOOKUP[127] == 157
    assert AC_QLOOKUP[0] == 4 and AC_QLOOKUP[127] == 284
    assert len(DC_QLOOKUP) == len(AC_QLOOKUP) == 128
    assert all(a <= b for a, b in zip(DC_QLOOKUP, DC_QLOOKUP[1:]))
    assert all(a <= b for a, b in zip(AC_QLOOKUP, AC_QLOOKUP[1:]))


def test_idct_dc_only():
    """A DC-only coefficient block reconstructs a flat residual of
    (dc + 4) >> 3 — the same value libvpx's dc_only_idct shortcut
    produces (unit DC gain; the x2 butterfly gains cancel against the
    final >>3 only partially for AC terms)."""
    co = np.zeros(16, dtype=np.int64)
    co[0] = 80
    out = idct4x4(co)
    assert (out == out[0, 0]).all()
    assert out[0, 0] == (80 + 4) >> 3 == 10


def test_iwht_dc_only():
    co = np.zeros(16, dtype=np.int64)
    co[0] = 80
    out = iwht4x4(co)
    assert (out == out[0, 0]).all() and out[0, 0] == (80 + 3) >> 3


@settings(max_examples=30, deadline=None)
@given(st.integers(0, 2**32 - 1))
def test_forward_inverse_transform_consistency(seed):
    """The numerically-derived forward transforms invert the normative
    integer inverses to within integer rounding."""
    rng = np.random.default_rng(seed)
    res = rng.integers(-255, 256, 16).astype(np.float64)
    back = idct4x4(np.round(_fdct(res.reshape(4, 4))).astype(np.int64))
    assert np.abs(back.reshape(-1) - res).max() <= 2
    back2 = iwht4x4(np.round(_fwht(res.reshape(4, 4))).astype(np.int64))
    assert np.abs(back2.reshape(-1) - res).max() <= 2


def test_predictors_shapes_and_edges():
    a = np.arange(16, dtype=np.int64) + 100
    left = np.arange(16, dtype=np.int64) + 50
    for mode in range(4):
        p = predict_block(mode, a, left, 90, True, True, 16)
        assert p.shape == (16, 16) and (0 <= p).all() and (p <= 255).all()
    # DC fallbacks
    assert predict_block(0, a, left, 0, False, False, 16)[0, 0] == 128
    a4 = np.array([10, 20, 30, 40], dtype=np.int64)
    l4 = np.array([50, 60, 70, 80], dtype=np.int64)
    ar = np.array([45, 46, 47, 48], dtype=np.int64)
    for mode in range(10):
        p = predict_b(mode, a4, 15, l4, ar)
        assert p.shape == (4, 4) and (0 <= p).all() and (p <= 255).all()
    # B_DC is the rounded mean of above+left
    assert (predict_b(0, a4, 15, l4, ar)
            == (int(a4.sum()) + int(l4.sum()) + 4) >> 3).all()


def test_roundtrip_gradient_close():
    """Smooth content survives encode->decode with small error (quant
    loss only); the decode is deterministic."""
    yy, xx = np.mgrid[0:48, 0:80]
    img = np.stack([(xx * 3) % 256, (yy * 4) % 256,
                    ((xx + yy) * 2) % 256], axis=-1).astype(np.uint8)
    enc = vp8_encode(img, qi=8)
    dec = vp8_decode(enc)
    assert dec.shape == img.shape
    diff = np.abs(dec.astype(int) - img.astype(int))
    assert diff.mean() < 6 and diff.max() <= 48
    assert np.array_equal(dec, vp8_decode(enc))


def test_roundtrip_non_multiple_of_16():
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (37, 53, 3), dtype=np.uint8)
    dec = vp8_decode(vp8_encode(img, qi=20))
    assert dec.shape == (37, 53, 3)


def test_all_luma_modes_exercised():
    """An image with flat / vertical / horizontal / diagonal regions makes
    the SAD mode chooser pick different 16x16 modes — the stream then
    exercises every whole-block predictor on decode."""
    img = np.zeros((64, 64, 3), dtype=np.uint8)
    img[:32, :32] = 200                                  # flat -> DC
    img[:32, 32:] = (np.arange(32) * 8 % 256)[None, :, None]   # cols -> V
    img[32:, :32] = (np.arange(32) * 8 % 256)[:, None, None]   # rows -> H
    yy, xx = np.mgrid[0:32, 0:32]
    img[32:, 32:] = ((xx * 4 + yy * 4) % 256)[..., None]       # ramp -> TM
    dec = vp8_decode(vp8_encode(img, qi=8))
    diff = np.abs(dec.astype(int) - img.astype(int))
    assert diff.mean() < 10


def test_header_parse_and_webp_container():
    from docvision_spark.kernel.image_codec import webp_info
    from docvision_spark.kernel.vp8l_codec import webp_decode

    img = np.full((24, 40, 3), 77, dtype=np.uint8)
    w = webp_encode_lossy(img, qi=12)
    wi = webp_info(w)
    assert wi["format"] == "vp8-lossy"
    assert wi["width"] == 40 and wi["height"] == 24
    dec = webp_decode(w)
    assert dec.shape == (24, 40, 3)
    assert np.abs(dec.astype(int) - 77).max() <= 8


def test_decode_rejects_bad_headers():
    with pytest.raises(ImageDecodeError):
        vp8_decode(b"\x00" * 5)  # truncated
    with pytest.raises(ImageDecodeError):
        vp8_decode(b"\x01\x00\x00" + b"\x9d\x01\x2a" + b"\x00" * 8)  # inter
    with pytest.raises(ImageDecodeError):
        vp8_decode(b"\x00\x00\x00" + b"\xff\x01\x2a" + b"\x00" * 8)  # code
    big = (0x3FFF) | (0x3FFF << 16)
    hdr = b"\x00\x10\x00" + b"\x9d\x01\x2a" + b"\xff\x3f\xff\x3f"
    with pytest.raises(ImageDecodeError, match="pixel budget"):
        vp8_decode(hdr + b"\x00" * 64)


@settings(max_examples=40, deadline=None)
@given(st.binary(min_size=0, max_size=96))
def test_decode_totality(tail):
    """Valid header + arbitrary partition bytes either decode (an
    arithmetic decoder accepts any bit string) or raise the typed
    ImageDecodeError — never hang, never leak a foreign exception."""
    part1 = tail[:len(tail) // 2]
    tag = (0 | (1 << 4) | (len(part1) << 5))
    hdr = bytes((tag & 0xFF, (tag >> 8) & 0xFF, (tag >> 16) & 0xFF))
    data = hdr + b"\x9d\x01\x2a" + b"\x20\x00\x18\x00" + tail
    try:
        out = vp8_decode(data)
        assert out.shape == (24, 32, 3)
    except ImageDecodeError:
        pass


def test_loop_filter_smooths_block_edges():
    """filter_level > 0 runs the normal loop filter on decode: output
    stays deterministic, differs from the unfiltered decode only
    modestly, and strictly reduces blockiness (mean absolute step across
    4px block boundaries) on a hard-quantized image."""
    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (48, 64, 3), dtype=np.uint8)
    enc0 = vp8_encode(img, qi=60, filter_level=0)
    enc1 = vp8_encode(img, qi=60, filter_level=30)
    d0 = vp8_decode(enc0)
    d1 = vp8_decode(enc1)
    assert np.array_equal(d1, vp8_decode(enc1))  # deterministic
    assert not np.array_equal(d0, d1)            # filter did something

    def blockiness(x):
        g = x.astype(int)
        return (np.abs(g[:, 4::4] - g[:, 3:-1:4]).mean()
                + np.abs(g[4::4, :] - g[3:-1:4, :]).mean())

    assert blockiness(d1) < blockiness(d0)
    # and the filtered output is still close to the unfiltered one
    assert np.abs(d1.astype(int) - d0.astype(int)).mean() < 12


def test_simple_and_mbedge_filters_respect_masks():
    """Direct unit checks: a flat region is untouched (no edge), a huge
    step is untouched (mask fails on interior limits), a moderate step is
    smoothed toward its neighbors."""
    from docvision_spark.kernel.vp8_codec import (_mbedge_filter,
                                                  _subblock_filter)

    flat = np.full(16, 90, dtype=np.uint8)
    before = flat.copy()
    _subblock_filter(flat, 8, 1, 1, 9, 30)
    assert np.array_equal(flat, before)

    giant = np.array([10] * 8 + [245] * 8, dtype=np.uint8)
    before = giant.copy()
    _mbedge_filter(giant, 8, 1, 1, 3, 10)
    assert np.array_equal(giant, before)  # interior/edge mask rejects

    mild = np.array([100] * 8 + [112] * 8, dtype=np.uint8)
    _mbedge_filter(mild, 8, 1, 2, 9, 40)
    step = abs(int(mild[8]) - int(mild[7]))
    assert step < 12  # smoothed across the edge


def test_bpred_segmentation_stream_decodes():
    """Hand-rolled bitstream (written with BoolEncoder directly, NOT via
    vp8_encode) exercising decoder paths our encoder never emits:
    segmentation syntax with a transmitted map, mb_no_coeff_skip, a
    B_PRED macroblock with 16 coded 4x4 modes, and the no-Y2 (plane 3)
    token schedule via explicit EOB tokens."""
    import struct

    from docvision_spark.kernel.vp8_codec import (
        B_PRED, BMODE_TREE, COEF_UPDATE_PROB, KF_BMODE_PROBS,
        KF_UV_MODE_PROBS, KF_YMODE_PROBS, KF_YMODE_TREE, UV_MODE_TREE)

    be = BoolEncoder()
    be.put(0, 128)  # color space
    be.put(0, 128)  # clamping
    # segmentation: enabled, update map, update data (absolute q)
    be.put(1, 128)
    be.put(1, 128)  # update_mb_segmentation_map
    be.put(1, 128)  # update_segment_feature_data
    be.put(1, 128)  # abs values
    be.put(1, 128)
    be.put_signed(40, 7)  # segment 0 quantizer = 40
    for _ in range(3):
        be.put(0, 128)    # other segment q flags
    for _ in range(4):
        be.put(0, 128)    # lf deltas
    for i, p in enumerate((250, 128, 128)):
        be.put(1, 128)
        be.put_literal(p, 8)  # segment tree probs
    be.put(0, 128)            # filter type
    be.put_literal(0, 6)      # filter level
    be.put_literal(0, 3)      # sharpness
    be.put(0, 128)            # lf adj
    be.put_literal(0, 2)      # one token partition
    be.put_literal(60, 7)     # yac qi (overridden by segment abs q)
    for _ in range(5):
        be.put(0, 128)        # quant deltas
    be.put(1, 128)            # refresh entropy
    for _ in range(4 * 8 * 3 * 11):
        be.put(0, COEF_UPDATE_PROB)
    be.put(1, 128)            # mb_no_coeff_skip ENABLED
    be.put_literal(200, 8)    # prob_skip_false
    # one macroblock: segment id 0 (tree: bit0 with prob 250, bit with
    # prob 128), not skipped, B_PRED with all 10 modes appearing, uv DC
    be.put(0, 250)
    be.put(0, 128)            # segment id -> 0
    be.put(0, 200)            # mb_skip = 0 -> tokens ARE coded
    be.put_tree(KF_YMODE_TREE, KF_YMODE_PROBS, B_PRED)
    modes = list(range(10)) + [0, 1, 2, 3, 4, 5]
    above = [0, 0, 0, 0]
    left = [0, 0, 0, 0]
    for sb, m in enumerate(modes):
        r, c = sb // 4, sb % 4
        am = above[c] if r == 0 else modes[sb - 4]
        lm = left[r] if c == 0 else modes[sb - 1]
        be.put_tree(BMODE_TREE, KF_BMODE_PROBS[am][lm], m)
    be.put_tree(UV_MODE_TREE, KF_UV_MODE_PROBS, 0)
    part1 = be.tobytes()

    # token partition: 24 blocks (16 Y plane-3 + 8 chroma), EOB each.
    # EOB is branch 0 at the tree root: one bool per block at the
    # (neutral) coefficient probabilities.
    bt = BoolEncoder()
    for _ in range(24):
        bt.put(0, 128)
    part2 = bt.tobytes()

    tag = (0 | (1 << 4) | (len(part1) << 5))
    data = (bytes((tag & 0xFF, (tag >> 8) & 0xFF, (tag >> 16) & 0xFF))
            + b"\x9d\x01\x2a" + struct.pack("<H", 16)
            + struct.pack("<H", 16) + part1 + part2)
    out = vp8_decode(data)
    assert out.shape == (16, 16, 3)
    assert np.array_equal(out, vp8_decode(data))
    # pure prediction from 127/129 edge defaults: mid-gray-ish output
    assert 100 < out.mean() < 160
