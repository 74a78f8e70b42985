"""Baseline JPEG codec: round-trip quality, coding-feature coverage
(subsampling, restart intervals, grayscale), exactness cases, and the typed
error paths for unsupported/malformed streams."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from docvision_spark.kernel.image_codec import ImageDecodeError, decode_image
from docvision_spark.kernel.jpeg_codec import decode_jpeg, encode_jpeg


def gradient(h: int, w: int) -> np.ndarray:
    img = np.zeros((h, w, 3), np.uint8)
    img[:, :, 0] = np.linspace(0, 255, w)[None, :]
    img[:, :, 1] = np.linspace(0, 255, h)[:, None]
    img[:, :, 2] = 128
    return img


@pytest.mark.parametrize("quality,subsample,max_mean_err", [
    (85, "444", 2.0), (85, "420", 3.5), (95, "444", 1.0), (50, "420", 5.0),
])
def test_roundtrip_gradient(quality, subsample, max_mean_err):
    img = gradient(48, 64)
    out = decode_jpeg(encode_jpeg(img, quality=quality, subsample=subsample))
    assert out.shape == img.shape
    assert np.abs(out.astype(int) - img.astype(int)).mean() < max_mean_err


def test_flat_color_q100_exact():
    flat = np.full((24, 24, 3), 77, np.uint8)
    assert np.array_equal(decode_jpeg(encode_jpeg(flat, quality=100)), flat)


def test_grayscale_single_component():
    g = np.tile(np.linspace(0, 255, 40).astype(np.uint8), (40, 1))
    out = decode_jpeg(encode_jpeg(g, quality=90))
    assert out.shape == (40, 40, 3)
    assert np.array_equal(out[:, :, 0], out[:, :, 1])  # gray replicated
    assert np.abs(out[:, :, 0].astype(int) - g.astype(int)).max() <= 2


def test_restart_intervals_match_plain():
    img = gradient(48, 64)
    plain = decode_jpeg(encode_jpeg(img, quality=85, subsample="420"))
    rst = decode_jpeg(encode_jpeg(img, quality=85, subsample="420",
                                  restart_interval=2))
    assert np.array_equal(plain, rst)  # restarts change framing, not pixels


def test_odd_dimensions_and_noise():
    rng = np.random.RandomState(7)
    noise = rng.randint(0, 256, (37, 53, 3)).astype(np.uint8)
    # 4:4:4 for the noise fidelity check — 4:2:0 box-averages chroma, which
    # legitimately destroys spatially-uncorrelated noise
    out = decode_jpeg(encode_jpeg(noise, quality=95, subsample="444"))
    assert out.shape == noise.shape
    assert np.abs(out.astype(int) - noise.astype(int)).mean() < 8.0
    # odd dims through the subsampled path still shape-round-trip
    out420 = decode_jpeg(encode_jpeg(gradient(37, 53), quality=85,
                                     subsample="420"))
    assert out420.shape == (37, 53, 3)


def test_decode_is_deterministic():
    img = gradient(32, 32)
    data = encode_jpeg(img, quality=80)
    assert encode_jpeg(img, quality=80) == data
    a, b = decode_jpeg(data), decode_jpeg(data)
    assert np.array_equal(a, b)


def test_dispatch_sniffs_jpeg():
    arr, fmt = decode_image(encode_jpeg(gradient(16, 16)))
    assert fmt == "jpeg" and arr.shape == (16, 16, 3)


def test_arithmetic_rejected():
    data = bytearray(encode_jpeg(gradient(16, 16)))
    i = bytes(data).find(b"\xFF\xC0")
    data[i + 1] = 0xC9  # flip SOF0 -> SOF9 (arithmetic sequential)
    with pytest.raises(ImageDecodeError, match="arithmetic"):
        decode_jpeg(bytes(data))


@pytest.mark.parametrize("quality,subsample", [
    (85, "444"), (85, "420"), (50, "444"), (95, "420"),
])
def test_progressive_matches_baseline(quality, subsample):
    """Progressive (SOF2: DC successive approximation + per-component AC
    spectral selection with EOB runs + AC refinement) must reconstruct the
    EXACT same pixels as baseline from the same quantized coefficients."""
    img = gradient(48, 64)
    b0 = decode_jpeg(encode_jpeg(img, quality=quality, subsample=subsample))
    bp = decode_jpeg(encode_jpeg(img, quality=quality, subsample=subsample,
                                 progressive=True))
    assert np.array_equal(b0, bp)


@pytest.mark.parametrize("shape", [(37, 53), (17, 23), (8, 8), (9, 17)])
def test_progressive_odd_shapes(shape):
    """Non-interleaved scans cover the TRUE component block grid (raster
    order) — exercised hardest at odd dims with 4:2:0 supersampled Y."""
    img = gradient(*shape)
    b0 = decode_jpeg(encode_jpeg(img, quality=85, subsample="420"))
    bp = decode_jpeg(encode_jpeg(img, quality=85, subsample="420",
                                 progressive=True))
    assert np.array_equal(b0, bp)


def test_progressive_noise_parity():
    """Dense-coefficient (noise) images hammer the EOB-run + ZRL +
    correction-bit paths of the refinement codec."""
    rng = np.random.RandomState(3)
    for seed in range(4):
        noise = rng.randint(0, 256, (31 + seed, 41 - seed, 3)).astype(np.uint8)
        for sub in ("444", "420"):
            b0 = decode_jpeg(encode_jpeg(noise, quality=92, subsample=sub))
            bp = decode_jpeg(encode_jpeg(noise, quality=92, subsample=sub,
                                         progressive=True))
            assert np.array_equal(b0, bp)


def test_progressive_gray():
    g = np.tile(np.linspace(0, 255, 40).astype(np.uint8), (40, 1))
    b0 = decode_jpeg(encode_jpeg(g, quality=90))
    bp = decode_jpeg(encode_jpeg(g, quality=90, progressive=True))
    assert np.array_equal(b0, bp)


def test_bad_soi_rejected():
    with pytest.raises(ImageDecodeError, match="SOI"):
        decode_jpeg(b"\x00\x01garbage")


def test_missing_sos_rejected():
    with pytest.raises(ImageDecodeError):
        decode_jpeg(b"\xFF\xD8\xFF\xD9")


def test_truncated_segment_rejected():
    data = encode_jpeg(gradient(16, 16))
    i = data.find(b"\xFF\xC4")  # first DHT
    with pytest.raises(ImageDecodeError):
        decode_jpeg(data[:i + 6])


def test_16bit_quant_rejected():
    # hand-build a DQT with Pq=1 (16-bit table)
    dqt = b"\xFF\xDB" + struct.pack(">H", 2 + 1 + 128) + b"\x10" + bytes(128)
    with pytest.raises(ImageDecodeError, match="16-bit"):
        decode_jpeg(b"\xFF\xD8" + dqt + b"\xFF\xD9")


def test_truncated_scan_degrades_not_crashes():
    """A truncated entropy stream must still produce an image (zero-fill),
    matching standard decoder behavior — never an unbounded loop."""
    data = encode_jpeg(gradient(48, 64), quality=85)
    out = decode_jpeg(data[:len(data) - 40])
    assert out.shape == (48, 64, 3)


def test_jpeg_near_dup_dhash_close():
    """A noise<=3 twin (the planted-dup scheme in synthesize_media) must
    stay hamming-close through the lossy jpeg path."""
    from docvision_spark.functions.multimodal import make_synthetic_image
    from docvision_spark.kernel.image_codec import dhash64

    a, _ = decode_image(make_synthetic_image(40, 48, 32, noise=0, fmt="jpeg"))
    b, _ = decode_image(make_synthetic_image(40, 48, 32, noise=3, fmt="jpeg"))
    ham = bin((dhash64(a) ^ dhash64(b)) & ((1 << 64) - 1)).count("1")
    assert ham <= 6
