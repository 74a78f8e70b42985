"""TIFF 6.0 baseline codec: roundtrips, LZW early-change, PackBits,
predictor, byte orders, typed rejection of the unsupported subset."""

import struct

import numpy as np
import pytest

from docvision_spark.kernel.image_codec import ImageDecodeError, decode_image
from docvision_spark.kernel.tiff_codec import (
    _lzw_decode, _lzw_encode, _packbits_decode, _packbits_encode,
    decode_tiff, encode_tiff)

RNG = np.random.default_rng(42)


def _img(h=21, w=33, gray=False):
    shape = (h, w) if gray else (h, w, 3)
    return RNG.integers(0, 256, size=shape, dtype=np.uint8)


def test_uncompressed_rgb_roundtrip():
    img = _img()
    dec = decode_tiff(encode_tiff(img))
    assert (dec == img).all()


def test_uncompressed_gray_roundtrip_stacks_rgb():
    g = _img(gray=True)
    dec = decode_tiff(encode_tiff(g))
    assert dec.shape == (21, 33, 3)
    assert (dec[:, :, 0] == g).all() and (dec[:, :, 1] == g).all()


@pytest.mark.parametrize("comp", ["lzw", "packbits"])
def test_compressed_roundtrip(comp):
    img = _img(40, 55)
    enc = encode_tiff(img, compression=comp)
    assert (decode_tiff(enc) == img).all()


def test_lzw_with_predictor_roundtrip():
    # smooth gradients are the predictor's home turf
    yy, xx = np.mgrid[0:32, 0:48]
    img = ((yy * 3 + xx * 2) % 256).astype(np.uint8)
    img = np.stack([img, img // 2, 255 - img], axis=2)
    enc = encode_tiff(img, compression="lzw", predictor=True)
    assert (decode_tiff(enc) == img).all()
    # predictor + LZW should beat plain LZW on gradients
    assert len(enc) < len(encode_tiff(img, compression="lzw"))


def test_lzw_primitive_roundtrip_and_early_change():
    # enough distinct material to push the code width past 9 and 10 bits
    data = bytes(RNG.integers(0, 256, size=6000, dtype=np.uint8))
    assert _lzw_decode(_lzw_encode(data), len(data)) == data
    run = b"a" * 5000 + bytes(range(256)) * 8
    assert _lzw_decode(_lzw_encode(run), len(run)) == run


def test_packbits_primitive_vectors():
    # Apple's canonical PackBits example (TIFF 6.0 spec, §9)
    enc = bytes.fromhex("FEAA0280002AFDAA0380002A22F7AA")
    dec = bytes.fromhex("AAAAAA80002AAAAAAAAA80002A22" + "AA" * 10)
    assert _packbits_decode(enc, len(dec)) == dec
    # 0x80 is a noop byte per spec
    assert _packbits_decode(b"\x80\x00A\x80", 1) == b"A"
    data = b"\x00" * 200 + bytes(range(100)) + b"\xff" * 3
    assert _packbits_decode(_packbits_encode(data), len(data)) == data


def test_big_endian_decodes():
    img = _img(9, 7)
    le = encode_tiff(img)
    # byte-swap the little-endian fixture into a valid big-endian file
    fmt_le, fmt_be = "<", ">"
    out = bytearray(b"MM\x00*")
    out += struct.pack(">I", struct.unpack("<I", le[4:8])[0])
    (n,) = struct.unpack("<H", le[8:10])
    out += struct.pack(">H", n)
    for i in range(n):
        e = 10 + 12 * i
        tag, typ, cnt = struct.unpack("<HHI", le[e:e + 8])
        out += struct.pack(">HHI", tag, typ, cnt)
        if typ == 3 and cnt == 1:
            (v, _pad) = struct.unpack("<HH", le[e + 8:e + 12])
            out += struct.pack(">HH", v, 0)
        elif typ == 3 and cnt == 3:
            (off,) = struct.unpack("<I", le[e + 8:e + 12])
            out += struct.pack(">I", off)
        else:
            (v,) = struct.unpack("<I", le[e + 8:e + 12])
            out += struct.pack(">I", v)
    tail = le[10 + 12 * n:]
    out += struct.pack(">I", 0)
    body = bytearray(tail[4:])
    # bits-per-sample extra block (3 SHORTs) must swap too
    if len(body) >= 6 and body[:6] == struct.pack("<HHH", 8, 8, 8):
        body[:6] = struct.pack(">HHH", 8, 8, 8)
    out += body
    assert (decode_tiff(bytes(out)) == img).all()


def test_dispatch_and_unsupported_are_typed():
    img = _img(8, 8)
    rgb, fmt = decode_image(encode_tiff(img))
    assert fmt == "tiff" and (rgb == img).all()
    with pytest.raises(ImageDecodeError):
        decode_tiff(b"II*\x00garbage")
    # 16-bit samples rejected with a typed error
    enc = bytearray(encode_tiff(_img(4, 4, gray=True)))
    idx = enc.find(struct.pack("<HHI", 258, 3, 1))
    enc[idx + 8:idx + 10] = struct.pack("<H", 16)
    with pytest.raises(ImageDecodeError):
        decode_tiff(bytes(enc))


def test_bilevel_ccitt_roundtrips():
    """1-bit scanned-fax TIFFs: every compression of the bilevel family
    (packed bits, Modified Huffman, G3 1-D, G3 2-D via T4Options, G4 MMR)
    roundtrips bit-exactly; ink maps to gray 0 under WhiteIsZero."""
    import numpy as np

    from docvision_spark.kernel.tiff_codec import (decode_tiff,
                                                   encode_tiff_bilevel)

    rng = np.random.default_rng(13)
    bm = (rng.random((40, 131)) < 0.35).astype(np.uint8)
    for comp in ("none", "mh", "g3", "g3-2d", "g4"):
        t = encode_tiff_bilevel(bm, compression=comp)
        rgb = decode_tiff(t)
        assert rgb.shape == (40, 131, 3), comp
        assert np.array_equal(rgb[:, :, 0] == 0, bm == 1), comp


def test_bilevel_media_feature_rows():
    """tiff-bilevel synthetic media rows decode to real features through
    the generic image dispatch."""
    import numpy as np

    from docvision_spark.functions.multimodal import make_synthetic_image
    from docvision_spark.kernel.image_codec import decode_image, dhash64

    for seed in (7, 8, 9, 10):  # covers all four CCITT variants
        payload = make_synthetic_image(seed, 64, 48, fmt="tiff-bilevel")
        rgb, fmt = decode_image(payload)
        assert fmt == "tiff" and rgb.shape == (48, 64, 3)
        assert set(np.unique(rgb)) <= {0, 255}
        assert isinstance(dhash64(rgb), int)
