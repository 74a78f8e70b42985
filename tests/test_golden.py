"""Golden-file byte-identity tests (north-rule invariant; SURVEY.md §5.2.2).

The goldens in tests/fixtures/golden.jsonl were produced by the standalone
kernel and committed. Both the bare kernel and the distributed Spark
pipeline must reproduce them byte-identically per url.
"""

from __future__ import annotations

import hashlib
import json
import os

import pytest

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "golden.jsonl")


def _load_goldens() -> list[dict]:
    rows = []
    with open(FIXTURE, encoding="utf-8") as f:
        for line in f:
            row = json.loads(line)
            if "_meta" not in row:
                rows.append(row)
    return rows


GOLDENS = _load_goldens()


def test_kernel_matches_goldens():
    from docvision_spark.corpus import make_page
    from docvision_spark.kernel.extract import extract

    for g in GOLDENS:
        r = extract(g["url"], make_page(g["url"]).html)
        assert r.id == g["id"], g["url"]
        assert hashlib.sha256(r.text.encode()).hexdigest() == g["text_sha256"], g["url"]
        assert hashlib.sha256(r.markdown.encode()).hexdigest() == g["md_sha256"], g["url"]
        assert len(r.spans) == g["n_spans"]
        assert r.page_count == g["page_count"]
        if "text" in g:  # full-payload goldens: direct byte diff
            assert r.text == g["text"]
            assert r.markdown == g["markdown"]
            assert [list(s) for s in r.spans] == g["spans"]


@pytest.mark.spark
def test_pipeline_matches_goldens(spark, pages_dir):
    """Distributed output == standalone kernel output, byte-identical per url."""
    from docvision_spark.pipeline.extract_job import extract_pages, read_pages

    want = {g["url"]: g for g in GOLDENS}
    out = extract_pages(read_pages(spark, pages_dir), partitions=8)
    rows = out.select("url", "id", "text", "markdown").collect()
    got = {r["url"]: r for r in rows}
    checked = 0
    for url, g in want.items():
        if url not in got:
            continue  # goldens cover 120 urls; pages_dir has 300 — all 120 ⊂ 300
        r = got[url]
        assert r["id"] == g["id"], url
        assert hashlib.sha256(r["text"].encode()).hexdigest() == g["text_sha256"], url
        assert hashlib.sha256(r["markdown"].encode()).hexdigest() == g["md_sha256"], url
        checked += 1
    assert checked == len(want), "all golden urls must appear in pipeline output"
