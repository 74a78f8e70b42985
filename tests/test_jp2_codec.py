"""JPEG 2000 codec tests: spec pins for the transcribed tables, exact
round-trip (reversible 5/3 is lossless), box format, tier-2 codewords,
DWT hand-vectors, and decoder totality under corruption."""

import random
import struct

import numpy as np
import pytest

from docvision_spark.kernel import jp2_codec as J
from docvision_spark.kernel.jp2_codec import (Jp2Error, decode_jp2,
                                              encode_jp2)


# --- spec pins -------------------------------------------------------------

def test_initial_context_states():
    # T.800 Table D.7: ZC context 0 -> state 4, RL -> 3, UNI -> 46.
    ctx = J._fresh_contexts()
    assert len(ctx) == 19
    assert ctx[0] == [4, 0]
    assert ctx[J._CX_RL] == [3, 0]
    assert ctx[J._CX_UNI] == [46, 0]
    for i in range(1, 17):
        assert ctx[i] == [0, 0]


def test_zc_table_pins():
    # T.800 Table D.1 corner rows (LL/LH column).
    assert J._zc_ctx(2, 0, 0, 0) == 8
    assert J._zc_ctx(1, 1, 0, 0) == 7
    assert J._zc_ctx(1, 0, 1, 0) == 6
    assert J._zc_ctx(1, 0, 0, 0) == 5
    assert J._zc_ctx(0, 2, 0, 0) == 4
    assert J._zc_ctx(0, 1, 0, 0) == 3
    assert J._zc_ctx(0, 0, 2, 0) == 2
    assert J._zc_ctx(0, 0, 1, 0) == 1
    assert J._zc_ctx(0, 0, 0, 0) == 0
    # HL interchanges sum_h and sum_v
    assert J._zc_ctx(0, 2, 0, 1) == 8
    assert J._zc_ctx(2, 0, 0, 1) == 4
    # HH is diagonal-driven
    assert J._zc_ctx(0, 0, 3, 2) == 8
    assert J._zc_ctx(1, 1, 2, 2) == 7
    assert J._zc_ctx(0, 0, 2, 2) == 6
    assert J._zc_ctx(0, 0, 0, 2) == 0


def test_sign_table_pins():
    # T.800 Table D.3: (H, V) -> (context, XOR bit); symmetric via XOR.
    assert J._sc_ctx(1, 1) == (13, 0)
    assert J._sc_ctx(1, 0) == (12, 0)
    assert J._sc_ctx(1, -1) == (11, 0)
    assert J._sc_ctx(0, 1) == (10, 0)
    assert J._sc_ctx(0, 0) == (9, 0)
    assert J._sc_ctx(0, -1) == (10, 1)
    assert J._sc_ctx(-1, 1) == (11, 1)
    assert J._sc_ctx(-1, 0) == (12, 1)
    assert J._sc_ctx(-1, -1) == (13, 1)


def test_npasses_codewords():
    for n in [1, 2, 3, 4, 5, 6, 20, 36, 37, 100, 164]:
        w = J._HdrWriter()
        J._write_npasses(w, n)
        w.bit(0)  # padding so flush never strands a partial codeword
        data = w.flush()
        r = J._HdrReader(data, 0)
        assert J._read_npasses(r.bit) == n


def test_hdr_bitio_stuffing():
    rng = random.Random(3)
    for _ in range(100):
        bits = [rng.randrange(2) for _ in range(rng.randrange(1, 200))]
        w = J._HdrWriter()
        for b in bits:
            w.bit(b)
        data = w.flush()
        for a, b in zip(data, data[1:]):
            if a == 0xFF:
                assert b <= 0x7F  # packet-header stuffing discipline
        r = J._HdrReader(data, 0)
        assert [r.bit() for _ in bits] == bits


# --- DWT -------------------------------------------------------------------

def test_dwt53_hand_vector():
    s, d = J._fwd53_1d(np.array([0, 1, 2, 3]))
    assert s.tolist() == [0, 2] and d.tolist() == [0, 1]
    assert J._inv53_1d(s, d).tolist() == [0, 1, 2, 3]


@pytest.mark.parametrize("n", [1, 2, 3, 4, 5, 8, 17, 64, 101])
def test_dwt53_roundtrip_1d(n):
    rng = np.random.default_rng(n)
    x = rng.integers(-300, 300, size=n).astype(np.int32)
    s, d = J._fwd53_1d(x)
    assert s.size == (n + 1) // 2 and d.size == n // 2
    assert np.array_equal(J._inv53_1d(s, d), x)


def test_dwt53_roundtrip_2d():
    rng = np.random.default_rng(9)
    for shape in [(1, 1), (5, 7), (16, 16), (33, 21)]:
        x = rng.integers(-200, 200, size=shape).astype(np.int32)
        ll, hl, lh, hh = J._fwd53_2d(x)
        assert np.array_equal(J._inv53_2d(ll, hl, lh, hh), x)


# --- full codec ------------------------------------------------------------

@pytest.mark.parametrize("shape,levels", [
    ((8, 8), 0), ((8, 8), 2), ((1, 1), 1), ((3, 200), 2),
    ((65, 64), 0), ((70, 70), 1), ((100, 130), 3), ((129, 257), 2),
])
def test_roundtrip_exact(shape, levels):
    rng = np.random.default_rng(hash(shape) & 0xFFFF)
    img = rng.integers(0, 256, size=shape, dtype=np.uint8)
    out = decode_jp2(encode_jp2(img, levels=levels))
    assert out.dtype == np.uint8 and out.shape == img.shape
    assert np.array_equal(out, img)


def test_roundtrip_flat_and_gradient():
    flat = np.full((50, 80), 128, dtype=np.uint8)
    assert np.array_equal(decode_jp2(encode_jp2(flat, levels=2)), flat)
    grad = np.add.outer(np.arange(60), np.arange(90)).astype(np.uint8)
    assert np.array_equal(decode_jp2(encode_jp2(grad, levels=3)), grad)


def test_roundtrip_scan_page():
    from docvision_spark.corpus import _scan_gray
    g = _scan_gray(42, 128, 160)
    cs = encode_jp2(g, levels=3)
    assert len(cs) < g.size  # actually compresses a text scan
    assert np.array_equal(decode_jp2(cs), g)


@pytest.mark.parametrize("layers", [2, 3, 5])
def test_multilayer_roundtrip(layers):
    # exercises the multi-layer tier-2 path: per-layer inclusion bits
    # for already-included blocks, Lblock persistence, and segment
    # accumulation across layers before tier-1
    rng = np.random.default_rng(layers)
    for shape in [(40, 55), (30, 20, 3)]:
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        cs = encode_jp2(img, levels=2, layers=layers)
        assert np.array_equal(decode_jp2(cs), img)


def test_rgb_rct_roundtrip_exact():
    rng = np.random.default_rng(21)
    for shape, lv in [((20, 30, 3), 0), ((65, 70, 3), 3), ((1, 1, 3), 1)]:
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        out = decode_jp2(encode_jp2(img, levels=lv))
        assert out.shape == img.shape and np.array_equal(out, img)
    img = rng.integers(0, 256, size=(40, 40, 3), dtype=np.uint8)
    assert np.array_equal(decode_jp2(encode_jp2(img, wrap=True)), img)


def test_progression_orders_parse():
    # single-precinct single-layer packet sequences coincide across
    # LRCP/RLCP/RPCL, so patching the COD progression byte must decode
    # identically (and exercises each _packet_order branch)
    rng = np.random.default_rng(23)
    img = rng.integers(0, 256, size=(33, 44), dtype=np.uint8)
    cs = bytearray(encode_jp2(img, levels=2))
    i = cs.find(b"\xff\x52")
    for prog in (1, 2):
        cs2 = bytearray(cs)
        cs2[i + 5] = prog
        assert np.array_equal(decode_jp2(bytes(cs2)), img)
    cs2 = bytearray(cs)
    cs2[i + 5] = 4  # CPRL: outside the subset -> typed rejection
    with pytest.raises(Jp2Error, match="progression"):
        decode_jp2(bytes(cs2))


@pytest.mark.parametrize("sop,eph", [(True, False), (False, True),
                                     (True, True)])
def test_sop_eph_markers(sop, eph):
    rng = np.random.default_rng(29)
    img = rng.integers(0, 256, size=(40, 33), dtype=np.uint8)
    cs = encode_jp2(img, levels=2, layers=2, sop=sop, eph=eph)
    assert (b"\xff\x91" in cs) == sop
    assert np.array_equal(decode_jp2(cs), img)
    if eph:
        # stripping a signaled EPH is a typed error, not misalignment
        i = cs.find(b"\xff\x92")
        with pytest.raises(Jp2Error, match="EPH"):
            decode_jp2(cs[:i] + cs[i + 2:])


def test_com_segment_skipped():
    rng = np.random.default_rng(31)
    img = rng.integers(0, 256, size=(20, 25), dtype=np.uint8)
    cs = bytearray(encode_jp2(img, levels=1))
    i = cs.find(b"\xff\x5c")  # splice a COM before QCD
    com = b"\xff\x64\x00\x0b\x00\x01spliced"  # Lcom = 2 + Rcom(2) + 7
    patched = bytes(cs[:i]) + com + bytes(cs[i:])
    assert np.array_equal(decode_jp2(patched), img)


def test_jp2_box_wrap():
    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, size=(40, 56), dtype=np.uint8)
    wrapped = encode_jp2(img, wrap=True)
    assert wrapped.startswith(J._JP2_SIG)
    assert b"jp2c" in wrapped
    assert np.array_equal(decode_jp2(wrapped), img)


def test_not_jp2_raises():
    for junk in (b"", b"\x00" * 16, b"%PDF-1.4", b"\xff\xd8\xff\xe0"):
        with pytest.raises(Jp2Error):
            decode_jp2(junk)


def test_pixel_budget():
    img = np.zeros((10, 10), dtype=np.uint8)
    cs = bytearray(encode_jp2(img, levels=0))
    # SOC(2) SIZ(2) Lsiz(2) Rsiz(2) -> Xsiz at 8, XTsiz at 24
    assert cs[:4] == b"\xff\x4f\xff\x51"
    struct.pack_into(">II", cs, 8, 1 << 14, 1 << 14)
    struct.pack_into(">II", cs, 24, 1 << 14, 1 << 14)
    with pytest.raises(Jp2Error, match="pixel budget"):
        decode_jp2(bytes(cs))


def test_tile_part_coding_markers_rejected():
    # Tile-specific COD/QCD overrides would silently decode with
    # main-header params (wrong pixels); the subset rejects them typed.
    img = np.zeros((12, 12), dtype=np.uint8)
    cs = bytearray(encode_jp2(img, levels=1))
    sot = cs.find(b"\xff\x90")
    assert sot > 0
    # fake tile-part COD segment between the SOT header and SOD
    fake = b"\xff\x52\x00\x0c" + bytes(10)
    patched = bytes(cs[:sot + 12]) + fake + bytes(cs[sot + 12:])
    patched = bytearray(patched)
    psot = struct.unpack_from(">I", patched, sot + 6)[0]
    struct.pack_into(">I", patched, sot + 6, psot + len(fake))
    with pytest.raises(Jp2Error, match="tile-part coding marker"):
        decode_jp2(bytes(patched))


def test_two_component_consumers_take_gray_plane(monkeypatch):
    # A 2-component (gray+alpha) codestream decodes to (H, W, 2); the
    # image dispatch and the PDF raster path must take the gray plane,
    # not index a missing third channel.
    import docvision_spark.kernel.jp2_codec as jmod
    from docvision_spark.kernel.image_codec import decode_image

    gray = np.arange(48, dtype=np.uint8).reshape(6, 8)
    two = np.stack([gray, np.full_like(gray, 255)], axis=-1)
    real = encode_jp2(gray, levels=1)  # dispatcher needs valid magic
    monkeypatch.setattr(jmod, "_decode_jp2", lambda _data: two)
    rgb, fmt = decode_image(real)
    assert fmt == "jp2" and rgb.shape == (6, 8, 3)
    assert np.array_equal(rgb[:, :, 0], gray)


def test_xlbox_short_length_rejected():
    # An XLBox's 64-bit length includes its 16-byte header; 8 <= ln < 16
    # must be malformed, not a negative-length body slice.
    box = struct.pack(">I", 1) + b"jp2c" + struct.pack(">Q", 12)
    with pytest.raises(Jp2Error, match="malformed JP2 box"):
        decode_jp2(J._JP2_SIG + box)


def test_truncation_and_corruption_totality():
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(48, 60), dtype=np.uint8)
    cs = encode_jp2(img, levels=2)
    pyrng = random.Random(7)
    for _ in range(60):
        mutated = bytearray(cs)
        mode = pyrng.randrange(3)
        if mode == 0:
            mutated = mutated[: pyrng.randrange(4, len(cs))]
        elif mode == 1:
            mutated[pyrng.randrange(len(cs))] ^= 1 << pyrng.randrange(8)
        else:
            for _ in range(8):
                mutated[pyrng.randrange(len(cs))] = pyrng.randrange(256)
        try:
            out = decode_jp2(bytes(mutated))
            assert isinstance(out, np.ndarray)  # garbage pixels are fine
        except Jp2Error:
            pass  # typed rejection is the other acceptable outcome


def test_random_bytes_never_crash():
    pyrng = random.Random(13)
    for _ in range(200):
        data = bytes(pyrng.randrange(256)
                     for _ in range(pyrng.randrange(0, 64)))
        with pytest.raises(Jp2Error):
            decode_jp2(data)
