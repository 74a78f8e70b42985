"""Corpus synthesizer determinism + fixture-property tests (M0)."""

from __future__ import annotations

import os

from docvision_spark.corpus import (
    HOSTS, gen_urls, make_page, write_corpus,
)


def test_page_is_pure_function_of_url():
    for u in gen_urls(30):
        a, b = make_page(u), make_page(u)
        assert a.html == b.html
        assert a.warc_ts == b.warc_ts and a.lang == b.lang and a.bucket == b.bucket


def test_hot_host_skew():
    urls = gen_urls(2000)
    hot = sum(1 for u in urls if HOSTS[0] in u)
    assert 0.25 <= hot / len(urls) <= 0.35


def test_size_long_tail_and_pdf_mix():
    recs = [make_page(u) for u in gen_urls(400)]
    sizes = sorted(len(r.html) for r in recs)
    assert sizes[-1] > 5 * sizes[len(sizes) // 2], "long tail missing"
    n_pdf = sum(1 for r in recs if r.html[:5] == b"%PDF-")
    assert 15 <= n_pdf <= 80
    charsets = {r.html[:400].split(b'charset="')[1][:10]
                for r in recs if b'charset="' in r.html[:400]}
    assert len(charsets) >= 2, "charset variety missing"


def test_parallel_and_serial_writes_identical(tmp_path):
    """The multiprocessing generation path must produce byte-identical
    parquet to the serial path (order fixed by per-bucket url sort)."""
    import pyarrow.parquet as pq

    import docvision_spark.corpus as c

    a_dir, b_dir = str(tmp_path / "a"), str(tmp_path / "b")
    n = 600
    write_corpus(a_dir, n)  # serial (600 < PARALLEL_THRESHOLD)
    old = c.PARALLEL_THRESHOLD
    try:
        c.PARALLEL_THRESHOLD = 100  # force the pool path
        write_corpus(b_dir, n)
    finally:
        c.PARALLEL_THRESHOLD = old
    for d in sorted(os.listdir(a_dir)):
        if not d.startswith("bucket="):
            continue
        ta = pq.read_table(os.path.join(a_dir, d, "part-0.parquet"))
        tb = pq.read_table(os.path.join(b_dir, d, "part-0.parquet"))
        assert ta.equals(tb)
