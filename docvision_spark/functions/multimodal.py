"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed in Arrow-batched mapInPandas stages.

The decode step is STUBBED (no image/audio libs in this container): a
clearly-marked deterministic fake parses a tiny header we define, so the
Spark-side plumbing — schema, partitioning, UDF signature, batch shape — is
real and tested. Swapping the stub for cv2/PIL/ffmpeg changes ONE function.

Reference ancestors: _load_image/cv2.imread (core/parser.py:554-563),
pdf_to_images rasterizer (processing/image.py:62-108), adaptive resize
(processing/image.py:351-366).
"""

from __future__ import annotations

import struct
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType, DoubleType, IntegerType, LongType, StringType,
    StructField, StructType,
)

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("kind", StringType()),      # image | audio | video
    StructField("payload", BinaryType()),
])

FEATURE_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("kind", StringType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("n_frames", IntegerType()),
    StructField("duration_s", DoubleType()),
    StructField("bytes_in", LongType()),
    StructField("feature_hash", StringType()),
    StructField("error", StringType()),
])

# our synthetic media header: b"DVSM" + kind(1B) + width(4B) + height(4B) + frames(4B)
_MAGIC = b"DVSM"
_KINDS = {0: "image", 1: "audio", 2: "video"}


def make_fake_media(media_id: int, kind: str, width: int, height: int, frames: int) -> bytes:
    """Deterministic fake payload for tests/bench (stands in for real bytes)."""
    kcode = {v: k for k, v in _KINDS.items()}[kind]
    body = (media_id.to_bytes(8, "big") * max(1, (width * height) // 256))[:4096]
    return _MAGIC + struct.pack(">BIII", kcode, width, height, frames) + body


def _decode_stub(payload: bytes) -> dict:
    """STUB decoder. Real implementation would be cv2.imdecode / soundfile /
    pyav frame sampling; none of those libs exist in this container, so we
    parse the deterministic fake header instead. Raises on foreign bytes —
    the caller converts that to an error row.
    """
    if payload[:4] != _MAGIC:
        raise NotImplementedError(
            "real media decoding not available in this environment; "
            "payload is not a DVSM fake"
        )
    kcode, w, h, frames = struct.unpack(">BIII", payload[4:17])
    return {"kind": _KINDS.get(kcode, "unknown"), "width": w, "height": h,
            "n_frames": frames}


def extract_media_features(df: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over binary media payloads.

    The plumbing is the deliverable: Arrow batches in, typed feature rows
    out, per-row errors captured as a column (no task failure).
    """
    from docvision_spark.pipeline.shipping import ensure_py_files

    ensure_py_files(df.sparkSession)

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in it:
            out = []
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                row = {"media_id": int(mid), "kind": kind, "width": None,
                       "height": None, "n_frames": None, "duration_s": None,
                       "bytes_in": len(payload) if payload is not None else 0,
                       "feature_hash": None, "error": None}
                try:
                    meta = _decode_stub(payload)
                    row.update(
                        kind=meta["kind"], width=meta["width"], height=meta["height"],
                        n_frames=meta["n_frames"],
                        duration_s=round(meta["n_frames"] / 25.0, 3) if meta["kind"] != "image" else 0.0,
                        feature_hash=hashlib.sha3_256(payload).hexdigest()[:16],
                    )
                except Exception as e:  # noqa: BLE001
                    row["error"] = f"{type(e).__name__}: {e}"[:200]
                out.append(row)
            yield pd.DataFrame(out, columns=[f.name for f in FEATURE_SCHEMA.fields])

    return df.mapInPandas(fn, schema=FEATURE_SCHEMA)
