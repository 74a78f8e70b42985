"""Pure-numpy audio/video codec for the uncompressed container formats
that need no native libs: WAV (RIFF PCM) and YUV4MPEG2 (y4m raw frames).

With kernel/image_codec.py this makes the multimodal decode stage real for
all three media kinds in this container: PNG/BMP/PNM images, PCM WAV audio,
y4m video. Compressed codecs (JPEG/MP3/H.264) stay stubbed — they need
native decoders that do not exist here, and their absence is declared, not
faked.

Both formats are fully specified by public docs (RIFF/WAVE: Microsoft
multimedia spec; YUV4MPEG2: mjpegtools). All math integer or float64 so
features are bit-stable across runs/partitions (they feed hash-compared
oracles).
"""

from __future__ import annotations

import struct

import numpy as np

from docvision_spark.kernel.image_codec import ImageDecodeError


class AvDecodeError(ValueError):
    """Malformed or unsupported audio/video bytes."""


# ----------------------------------------------------------------- WAV -----

def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """Decode RIFF/WAVE PCM (8-bit unsigned or 16-bit signed, any channel
    count) -> (float64 samples in [-1, 1] shaped (n, channels), rate)."""
    if len(data) < 44 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise AvDecodeError("wav: bad RIFF/WAVE header")
    pos, fmt, raw = 12, None, None
    while pos + 8 <= len(data):
        cid = data[pos:pos + 4]
        size = struct.unpack("<I", data[pos + 4:pos + 8])[0]
        body = data[pos + 8:pos + 8 + size]
        if cid == b"fmt " and len(body) >= 16:
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            raw = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or raw is None:
        raise AvDecodeError("wav: missing fmt/data chunk")
    audio_format, channels, rate, _byterate, _align, bits = fmt
    if audio_format != 1 or bits not in (8, 16) or channels == 0 or rate == 0:
        raise AvDecodeError(f"wav: unsupported format {audio_format}/{bits}bit")
    if bits == 16:
        n = len(raw) // (2 * channels)
        if n == 0:
            raise AvDecodeError("wav: empty data")
        x = np.frombuffer(raw[:n * 2 * channels], dtype="<i2").astype(np.float64)
        x = x / 32768.0
    else:
        n = len(raw) // channels
        if n == 0:
            raise AvDecodeError("wav: empty data")
        x = np.frombuffer(raw[:n * channels], dtype=np.uint8).astype(np.float64)
        x = (x - 128.0) / 128.0
    return x.reshape(n, channels), rate


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """Encode float64 [-1,1] (n,) or (n, ch) as 16-bit PCM WAV."""
    x = np.asarray(samples, dtype=np.float64)
    if x.ndim == 1:
        x = x[:, None]
    pcm = np.clip(np.round(x * 32767.0), -32768, 32767).astype("<i2")
    ch = pcm.shape[1]
    raw = pcm.tobytes()
    fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * 2 * ch, 2 * ch, 16)
    chunks = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt \
        + b"data" + struct.pack("<I", len(raw)) + raw
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks


def wav_features(samples: np.ndarray, rate: int) -> dict:
    """Deterministic audio features over the mono mix."""
    mono = samples.mean(axis=1)
    n = mono.shape[0]
    rms = float(np.sqrt(np.mean(mono * mono)))
    peak = float(np.max(np.abs(mono))) if n else 0.0
    zc = int(np.count_nonzero(np.signbit(mono[1:]) != np.signbit(mono[:-1])))
    return {
        "duration_s": round(n / rate, 3),
        "rms": round(rms, 6),
        "peak": round(peak, 6),
        "zero_crossings": zc,
        "sample_rate": rate,
        "channels": samples.shape[1],
    }


# ----------------------------------------------------------------- y4m -----

def decode_y4m(data: bytes) -> tuple[np.ndarray, float]:
    """Decode YUV4MPEG2 (C420jpeg/C420/C444 or default 4:2:0) ->
    (luma frames uint8 (n_frames, H, W), fps)."""
    if not data.startswith(b"YUV4MPEG2"):
        raise AvDecodeError("y4m: bad magic")
    nl = data.find(b"\n")
    if nl < 0:
        raise AvDecodeError("y4m: truncated stream header")
    w = h = 0
    fps = 25.0
    subsampling = "420"
    for tok in data[9:nl].split():
        t = tok.decode("ascii", "replace")
        if t.startswith("W"):
            w = int(t[1:])
        elif t.startswith("H"):
            h = int(t[1:])
        elif t.startswith("F"):
            num, den = t[1:].split(":")
            fps = round(int(num) / int(den), 3)
        elif t.startswith("C"):
            # explicit suffix removal (NOT rstrip — that strips a char SET
            # and would mangle C422 to '4' / let C420p10 through as 420)
            s = t[1:]
            for suf in ("jpeg", "mpeg2", "paldv"):
                s = s.removesuffix(suf)
            subsampling = s
    if w <= 0 or h <= 0:
        raise AvDecodeError("y4m: missing W/H")
    if subsampling == "420":
        frame_bytes = w * h * 3 // 2
    elif subsampling == "444":
        frame_bytes = w * h * 3
    else:
        # exact match only: C420p10 (10-bit) / C444alpha (4 planes) change
        # the frame byte layout and must be rejected, not misread
        raise AvDecodeError(f"y4m: unsupported subsampling C{subsampling}")
    frames = []
    pos = nl + 1
    while pos < len(data):
        fnl = data.find(b"\n", pos)
        if fnl < 0 or data[pos:pos + 5] != b"FRAME":
            raise AvDecodeError("y4m: bad FRAME header")
        start = fnl + 1
        if start + frame_bytes > len(data):
            raise AvDecodeError("y4m: truncated frame")
        luma = np.frombuffer(data[start:start + w * h], dtype=np.uint8)
        frames.append(luma.reshape(h, w))
        pos = start + frame_bytes
    if not frames:
        raise AvDecodeError("y4m: no frames")
    return np.stack(frames), fps


def encode_y4m(frames: np.ndarray, fps: int = 25) -> bytes:
    """Encode (n, H, W) uint8 luma frames as C420 y4m (chroma planes set to
    neutral 128)."""
    frames = np.asarray(frames, dtype=np.uint8)
    n, h, w = frames.shape
    if h % 2 or w % 2:
        raise ValueError("encode_y4m: H and W must be even for C420")
    head = f"YUV4MPEG2 W{w} H{h} F{fps}:1 Ip A1:1 C420\n".encode()
    chroma = np.full((h // 2) * (w // 2), 128, dtype=np.uint8).tobytes()
    out = [head]
    for f in frames:
        out.append(b"FRAME\n")
        out.append(f.tobytes())
        out.append(chroma)
        out.append(chroma)
    return b"".join(out)


def y4m_features(frames: np.ndarray, fps: float) -> dict:
    """Deterministic video features from the luma planes."""
    n, h, w = frames.shape
    mean_luma = round(float(frames.mean()), 4)
    # inter-frame motion proxy: mean absolute luma delta between frames
    if n > 1:
        deltas = np.abs(frames[1:].astype(np.int16) - frames[:-1].astype(np.int16))
        motion = round(float(deltas.mean()), 4)
    else:
        motion = 0.0
    return {
        "width": w, "height": h, "n_frames": n,
        "duration_s": round(n / fps, 3) if fps else 0.0,
        "mean_luma": mean_luma, "motion": motion,
    }


__all__ = [
    "AvDecodeError", "ImageDecodeError",
    "decode_wav", "encode_wav", "wav_features",
    "decode_y4m", "encode_y4m", "y4m_features",
]
