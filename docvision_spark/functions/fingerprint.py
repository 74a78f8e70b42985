"""Document fingerprinting via winnowing (rolling-hash) — the one text op
that genuinely needs Python, done as an Arrow-batched mapInPandas stage.

Winnowing (Schleimer et al., SIGMOD 2003): k-gram rolling hashes, sliding
window of size w, keep the min hash per window (rightmost on ties) -> a
position-robust fingerprint set. Used for plagiarism/near-dup detection
where MinHash's bag-of-shingles is too coarse.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType, IntegerType, LongType, StringType, StructField, StructType,
)

FP_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("n_grams", IntegerType()),
    StructField("fingerprints", ArrayType(LongType())),
])

_B = 1_000_003          # rolling-hash base (fixed prime)
_M = (1 << 61) - 1      # Mersenne modulus


def winnow(text: str, k: int = 8, w: int = 16) -> list[int]:
    """Winnowing fingerprint set of the normalized text (pure function)."""
    s = " ".join(text.lower().split())
    n = len(s)
    if n < k:
        return [_hash_str(s)] if s else []
    # rolling hashes of all k-grams
    hs: list[int] = []
    h = 0
    for i in range(k):
        h = (h * _B + ord(s[i])) % _M
    hs.append(h)
    bk = pow(_B, k - 1, _M)
    for i in range(k, n):
        h = ((h - ord(s[i - k]) * bk) * _B + ord(s[i])) % _M
        hs.append(h)
    # winnow: min per window, rightmost on ties, record distinct selections
    out: list[int] = []
    last_idx = -1
    for start in range(0, max(1, len(hs) - w + 1)):
        window = hs[start:start + w]
        m = min(window)
        # rightmost occurrence of the min
        idx = start + len(window) - 1 - window[::-1].index(m)
        if idx != last_idx:
            out.append(m)
            last_idx = idx
    return out


def _hash_str(s: str) -> int:
    h = 0
    for ch in s:
        h = (h * _B + ord(ch)) % _M
    return h


def winnow_fingerprints(df: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text", k: int = 8, w: int = 16) -> DataFrame:
    from docvision_spark.pipeline.shipping import ensure_py_files

    ensure_py_files(df.sparkSession)

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = pdf[id_col]
            texts = pdf[text_col]
            rows = []
            for i in range(len(pdf)):
                t = texts.iloc[i] or ""
                fps = winnow(t, k, w)
                rows.append({"doc_id": int(ids.iloc[i]),
                             "n_grams": max(0, len(" ".join(t.lower().split())) - k + 1),
                             "fingerprints": fps})
            yield pd.DataFrame(rows, columns=[f.name for f in FP_SCHEMA.fields])

    return df.select(id_col, text_col).mapInPandas(fn, schema=FP_SCHEMA)
