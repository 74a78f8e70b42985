"""Sink tests: K1 dispatch, K2 JSONL envelopes, K3 markdown assembly."""

from __future__ import annotations

import glob
import json
import os

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def extracted(spark, pages_dir):
    from docvision_spark.pipeline.extract_job import extract_pages, read_pages

    return extract_pages(read_pages(spark, pages_dir), partitions=4).cache()


@pytest.mark.spark
def test_jsonl_sink_envelope(extracted, tmp_path):
    from docvision_spark.pipeline.writers import sink_dispatch

    path = str(tmp_path / "out.jsonl")
    assert sink_dispatch(extracted, path) == "jsonl"
    lines = []
    for part in glob.glob(os.path.join(path, "part-*")):
        with open(part, encoding="utf-8") as f:
            lines.extend(json.loads(ln) for ln in f if ln.strip())
    assert len(lines) == 300
    # ParseResult envelope parity (reference core/types.py:46-52)
    row = lines[0]
    assert set(row) == {"id", "content", "metadata"}
    assert {"file_name", "total_pages", "parsing_mode", "processing_time"} <= set(row["metadata"])
    assert len(row["id"]) == 64


@pytest.mark.spark
def test_markdown_sink_assembly(extracted, spark, tmp_path):
    from docvision_spark.pipeline.writers import sink_dispatch

    path = str(tmp_path / "out.md")
    assert sink_dispatch(extracted, path) == "markdown"
    got = spark.read.parquet(path)
    assert got.count() == 300
    row = got.filter(F.col("n_pages") == 1).limit(1).collect()[0]
    assert row["document_md"].startswith("<!-- page 1 -->")


@pytest.mark.spark
def test_parquet_default_sink(extracted, spark, tmp_path):
    from docvision_spark.pipeline.writers import sink_dispatch

    path = str(tmp_path / "plain_out")
    assert sink_dispatch(extracted, path) == "parquet"
    assert spark.read.parquet(path).count() == 300


@pytest.mark.spark
def test_transcription_extract_fallback(spark):
    from docvision_spark.pipeline.writers import transcription_extract

    df = spark.createDataFrame(
        [("<transcription>inner\ntext</transcription>",),
         ("  plain fallback  ",),
         ("<transcription></transcription>",)],
        "raw string",
    ).select(transcription_extract(F.col("raw")).alias("out"))
    got = [r["out"] for r in df.collect()]
    assert got[0] == "inner\ntext"
    assert got[1] == "plain fallback"
    assert got[2] == "<transcription></transcription>"  # empty body -> fallback