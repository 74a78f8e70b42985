"""Validation-pass tests (C4 analogue): real output passes all checks;
constructed violations are caught."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.mark.spark
def test_real_output_is_valid(spark, pages_dir):
    from docvision_spark.pipeline.extract_job import extract_pages, read_pages
    from docvision_spark.pipeline.validate import validation_report

    out = extract_pages(read_pages(spark, pages_dir), partitions=4)
    rep = validation_report(out).collect()[0]
    assert rep["n_rows"] == 300
    assert rep["n_valid"] == 300, rep.asDict()


@pytest.mark.spark
def test_constructed_violations_caught(spark):
    from docvision_spark.pipeline.extract_job import OUTPUT_SCHEMA
    from docvision_spark.pipeline.validate import validation_flags

    def row(url, text, md, spans, id_=None, error=None):
        return {
            "url": url, "id": id_ or "a" * 64, "text": text, "markdown": md,
            "spans": [{"block_id": b, "kind": "paragraph", "start": s, "end": e}
                      for (b, s, e) in spans],
            "page_count": 1, "lang": "en", "processing_mode": "html",
            "charset": "utf-8", "truncated": False,
            "extractor_version": "t", "processing_time": 0.0,
            "bytes_in": 1, "partition_id": 0, "error": error,
        }

    rows = [
        row("ok", "hello world", "hello world", [(0, 0, 11)]),
        row("empty", "  ", "x", []),                              # v1
        row("oob", "abc", "abc", [(0, 0, 99)]),                   # v2
        row("overlap", "abcdef", "abcdef", [(0, 0, 4), (1, 2, 6)]),  # v3
        row("table", "t", "| a | b\n| c |", [(0, 0, 1)]),         # v4
        row("badid", "t", "t", [(0, 0, 1)], id_="nothex"),        # v5
        row("errrow", "", "", [], error="boom"),  # error rows exempt
    ]
    df = spark.createDataFrame(rows, OUTPUT_SCHEMA)
    got = {r["url"]: r for r in validation_flags(df).collect()}
    assert got["ok"]["valid"]
    assert not got["empty"]["v1_nonempty"]
    assert not got["oob"]["v2_span_bounds"]
    assert not got["overlap"]["v3_span_order"]
    assert not got["table"]["v4_tables_balanced"]
    assert not got["badid"]["v5_id_wellformed"]
    assert got["errrow"]["valid"]  # already routed to failure stream
