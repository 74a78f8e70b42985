"""kernel/jbig2_codec — embedded-organization JBIG2 generic-region subset.

Roundtrip via the planting encoder, hand-assembled segment streams for
the header forms the encoder never emits (long referred-to field, 4-byte
page association, region offsets, REPLACE composite, striped page
height), and the typed rejection surface (arithmetic coding, unknown
length, foreign region types, budget)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from docvision_spark.kernel.jbig2_codec import (Jbig2Error, decode_jbig2,
                                                encode_jbig2)


def _bitmap(seed: int = 3, w: int = 64, h: int = 48) -> np.ndarray:
    rng = np.random.default_rng(seed)
    bm = np.zeros((h, w), dtype=np.uint8)
    for y in range(4, h - 4, 7):
        bm[y:y + 3, 5:w - 5 - int(rng.integers(0, 20))] = 1
    return bm


def _segment(number: int, seg_type: int, page: int, body: bytes,
             referred: list[int] | None = None,
             page_assoc_4: bool = False, long_form: bool = False) -> bytes:
    """Hand-assembler mirroring T.88 §7.2 including the forms the
    planting encoder never writes."""
    referred = referred or []
    flags = (seg_type & 0x3F) | (0x40 if page_assoc_4 else 0)
    out = struct.pack(">IB", number, flags)
    if long_form:
        out += struct.pack(">I", 0xE0000000 | len(referred))
        out += b"\x00" * ((len(referred) + 8) // 8)
    else:
        assert len(referred) <= 4
        out += bytes([len(referred) << 5])
    ref_size = 1 if number <= 256 else (2 if number <= 65536 else 4)
    for r in referred:
        out += r.to_bytes(ref_size, "big")
    out += struct.pack(">I", page) if page_assoc_4 else bytes([page])
    return out + struct.pack(">I", len(body)) + body


def _page_info(w: int, h: int, flags: int = 0x01) -> bytes:
    return (struct.pack(">IIII", w, h, 0, 0) + bytes([flags])
            + struct.pack(">H", 0))


def _mmr_region(bm: np.ndarray, x: int = 0, y: int = 0,
                comb_op: int = 0, gflags: int = 0x01) -> bytes:
    from docvision_spark.kernel.ccitt_codec import g4_encode
    h, w = bm.shape
    return (struct.pack(">IIII", w, h, x, y) + bytes([comb_op])
            + bytes([gflags]) + g4_encode(bm))


def test_roundtrip_exact():
    bm = _bitmap()
    dec = decode_jbig2(encode_jbig2(bm))
    assert dec.dtype == np.uint8 and np.array_equal(dec, bm)


def test_trailing_newline_tolerated():
    """PDF stream extraction can leave a trailing newline before
    `endstream` — must not read as a truncated segment."""
    bm = _bitmap(5)
    assert np.array_equal(decode_jbig2(encode_jbig2(bm) + b"\n"), bm)


def test_region_offset_composites_onto_page():
    bm = _bitmap(7, w=32, h=16)
    data = (_segment(0, 48, 1, _page_info(64, 40))
            + _segment(1, 38, 1, _mmr_region(bm, x=20, y=10))
            + _segment(2, 49, 1, b""))
    page = decode_jbig2(data)
    assert page.shape == (40, 64)
    assert np.array_equal(page[10:26, 20:52], bm)
    assert page[:10].sum() == 0 and page[:, :20].sum() == 0


def test_two_regions_or_composite_and_replace():
    a = np.zeros((8, 8), np.uint8)
    a[2, :] = 1
    b = np.zeros((8, 8), np.uint8)
    b[:, 3] = 1
    data = (_segment(0, 48, 1, _page_info(8, 8))
            + _segment(1, 38, 1, _mmr_region(a))
            + _segment(2, 39, 1, _mmr_region(b, comb_op=0)))
    page = decode_jbig2(data)
    assert np.array_equal(page, a | b)
    # REPLACE drops the earlier region's ink
    data = (_segment(0, 48, 1, _page_info(8, 8))
            + _segment(1, 38, 1, _mmr_region(a))
            + _segment(2, 39, 1, _mmr_region(b, comb_op=4)))
    assert np.array_equal(decode_jbig2(data), b)


def test_long_referred_form_and_4byte_page_assoc():
    """Header variants real encoders emit for large segment graphs parse
    and still decode (referred-to content is irrelevant to generic
    regions)."""
    bm = _bitmap(9, w=24, h=12)
    data = (_segment(0, 48, 1, _page_info(24, 12), page_assoc_4=True)
            + _segment(1, 38, 1, _mmr_region(bm),
                       referred=[0] * 9, long_form=True))
    assert np.array_equal(decode_jbig2(data), bm)
    # short-form referred-to numbers with a wide segment number
    data = (_segment(0, 48, 1, _page_info(24, 12))
            + _segment(70000, 38, 1, _mmr_region(bm), referred=[0, 0]))
    assert np.array_equal(decode_jbig2(data), bm)


def test_striped_page_height_falls_back_to_region_extent():
    bm = _bitmap(11, w=16, h=20)
    data = (_segment(0, 48, 1, _page_info(16, 0xFFFFFFFF))
            + _segment(1, 38, 1, _mmr_region(bm)))
    assert decode_jbig2(data).shape == (20, 16)


def test_default_pixel_one():
    bm = np.zeros((4, 4), np.uint8)
    data = (_segment(0, 48, 1, _page_info(8, 8, flags=0x05))
            + _segment(1, 38, 1, _mmr_region(bm, comb_op=4)))
    page = decode_jbig2(data)
    assert page[:4, :4].sum() == 0          # REPLACEd by the blank region
    assert page[4:, :].all() and page[:4, 4:].all()  # default pixel 1


def test_globals_stream_page_info():
    """PDF /JBIG2Globals may carry the page info segment; regions in the
    main stream composite against it."""
    bm = _bitmap(13, w=16, h=8)
    glob = _segment(0, 48, 1, _page_info(16, 8))
    main = _segment(1, 38, 1, _mmr_region(bm))
    assert np.array_equal(decode_jbig2(main, globals_data=glob), bm)


def test_foreign_types_rejected():
    bm = _bitmap()
    enc = encode_jbig2(bm)
    # a symbol-dictionary segment (type 0) is out of subset
    data = _segment(0, 0, 1, b"\x00" * 8) + enc
    with pytest.raises(Jbig2Error, match="unsupported"):
        decode_jbig2(data)
    # an MMR body reinterpreted as arithmetic (MMR bit cleared) must
    # stay total: typed rejection or garbage pixels, never a crash
    off = 11 + 19 + 11 + 17
    assert enc[off] == 0x01
    bad = enc[:off] + b"\x00" + enc[off + 1:]
    try:
        out = decode_jbig2(bad)
        assert isinstance(out, np.ndarray)
    except Jbig2Error:
        pass


def test_arith_roundtrip_exact():
    bm = _bitmap()
    data = encode_jbig2(bm, arith=True)
    assert np.array_equal(decode_jbig2(data), bm)
    # arithmetic coding with TPGDON beats MMR on a real ruled-text page
    from docvision_spark.corpus import _scan_bitmap
    page = _scan_bitmap(29)
    assert np.array_equal(decode_jbig2(encode_jbig2(page, arith=True)), page)
    assert len(encode_jbig2(page, arith=True)) < len(encode_jbig2(page))


def test_arith_roundtrip_random_shapes():
    rng = np.random.default_rng(17)
    for _ in range(6):
        w, h = int(rng.integers(1, 50)), int(rng.integers(1, 50))
        b = (rng.random((h, w)) < rng.random() * 0.9).astype(np.uint8)
        assert np.array_equal(decode_jbig2(encode_jbig2(b, arith=True)), b)


@pytest.mark.parametrize("tmpl", [0, 1, 2, 3])
@pytest.mark.parametrize("tpgdon", [False, True])
def test_arith_all_templates_internal(tmpl, tpgdon):
    from docvision_spark.kernel.jbig2_codec import (_TEMPLATES,
                                                    _decode_generic_arith,
                                                    _encode_generic_arith)
    rng = np.random.default_rng(3 * tmpl + tpgdon)
    bm = (rng.random((40, 33)) < 0.3).astype(np.uint8)
    bm[10:14] = bm[9]  # repeated rows exercise TPGDON's LTP path
    at = [nominal for _bit, nominal in _TEMPLATES[tmpl][1]]
    coded = _encode_generic_arith(bm, tmpl, tpgdon)
    out = _decode_generic_arith(coded, 33, 40, tmpl, tpgdon, at)
    assert np.array_equal(out, bm)


def test_arith_non_nominal_at_pixels():
    from docvision_spark.kernel.jbig2_codec import (_decode_generic_arith,
                                                    _encode_generic_arith)
    rng = np.random.default_rng(9)
    bm = (rng.random((30, 41)) < 0.4).astype(np.uint8)
    at = [(-1, -2), (1, -2), (-5, 0), (2, -2)]  # all causal, non-nominal
    coded = _encode_generic_arith(bm, 0, True, at=at)
    out = _decode_generic_arith(coded, 41, 30, 0, True, at)
    assert np.array_equal(out, bm)


def test_arith_non_causal_at_rejected():
    bm = _bitmap()
    enc = encode_jbig2(bm, arith=True)
    # first AT byte pair lives right after the 18-byte region info; force
    # dy=0, dx=+1 (the current-row future pixel) -> rejected
    off = 11 + 19 + 11 + 18
    bad = enc[:off] + struct.pack(">bb", 1, 0) + enc[off + 2:]
    with pytest.raises(Jbig2Error, match="non-causal"):
        decode_jbig2(bad)


def test_arith_truncated_stream_total():
    bm = _bitmap()
    enc = encode_jbig2(bm, arith=True)
    # chop the MQ payload: decode must stay total (the MQ decoder's
    # endless-1-fill) and keep the declared dimensions
    body_cut = enc[: len(enc) - 15]
    try:
        out = decode_jbig2(body_cut)
        assert isinstance(out, np.ndarray)
    except Jbig2Error:
        pass


def test_tpgdon_context_pins():
    from docvision_spark.kernel.jbig2_codec import _TPGDON_CTX
    assert _TPGDON_CTX == {0: 0x9B25, 1: 0x0795, 2: 0x00E5, 3: 0x0195}


def test_unknown_length_and_truncation_rejected():
    bm = _bitmap()
    enc = encode_jbig2(bm)
    # segment data length 0xFFFFFFFF (unknown-length generic region)
    bad = enc[:7] + struct.pack(">I", 0xFFFFFFFF) + enc[11:]
    with pytest.raises(Jbig2Error, match="unknown-length"):
        decode_jbig2(bad)
    # data length overruns the stream
    bad = enc[:7] + struct.pack(">I", 10 ** 6) + enc[11:]
    with pytest.raises(Jbig2Error, match="overruns"):
        decode_jbig2(bad)
    with pytest.raises(Jbig2Error):
        decode_jbig2(enc[: len(enc) // 2])


def test_pixel_budget_rejected():
    region_info = struct.pack(">IIII", 1 << 14, 1 << 14, 0, 0)
    body = region_info + b"\x00\x01" + b"\x00" * 8
    data = (_segment(0, 48, 1, _page_info(1 << 14, 1 << 14))
            + _segment(1, 38, 1, body))
    with pytest.raises(Jbig2Error, match="budget"):
        decode_jbig2(data)


def test_empty_and_regionless_rejected():
    with pytest.raises(Jbig2Error, match="no decodable region"):
        decode_jbig2(_segment(0, 48, 1, _page_info(8, 8)))
    with pytest.raises(Jbig2Error, match="no decodable region"):
        decode_jbig2(b"")
