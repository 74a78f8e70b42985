"""WARC source tests: round-trip losslessness + extraction over WARC input."""

from __future__ import annotations

import os

import pytest


def _records(n=40):
    from docvision_spark.corpus import gen_urls, make_page

    recs = []
    for u in gen_urls(n):
        p = make_page(u)
        recs.append({"url": p.url, "warc_ts": p.warc_ts, "payload": p.html,
                     "lang": p.lang})
    return recs


def test_warc_roundtrip_pure(tmp_path):
    from docvision_spark.pipeline.warc import parse_warc_bytes, write_warc

    recs = _records(40)
    for compress in (True, False):
        path = str(tmp_path / f"t-{compress}.warc.gz")
        write_warc(recs, path, compress=compress)
        got = parse_warc_bytes(open(path, "rb").read())
        assert len(got) == 40
        for want, have in zip(recs, got):
            assert have["url"] == want["url"]
            assert have["html"] == want["payload"]
            assert have["warc_ts"] == want["warc_ts"].replace(microsecond=0)
            assert have["lang"] == want["lang"]


def test_warc_malformed_skipped():
    from docvision_spark.pipeline.warc import parse_warc_bytes

    assert parse_warc_bytes(b"") == []
    assert parse_warc_bytes(b"\x1f\x8b broken gzip") == []
    assert parse_warc_bytes(b"WARC/1.0\r\nContent-Length: zork\r\n\r\n") == []
    assert parse_warc_bytes(b"garbage with no warc marker") == []


@pytest.mark.spark
def test_warc_to_extraction(spark, tmp_path):
    from pyspark.sql import functions as F

    from docvision_spark.pipeline.extract_job import extract_pages
    from docvision_spark.pipeline.warc import read_warc, write_warc

    recs = _records(60)
    d = tmp_path / "warcs"
    d.mkdir()
    for i in range(3):
        write_warc(recs[i * 20:(i + 1) * 20], str(d / f"crawl-{i}.warc.gz"))

    pages = read_warc(spark, str(d))
    assert pages.count() == 60
    out = extract_pages(pages.select("url", "html", "lang"), partitions=4)
    ok = out.filter(F.col("error").isNull())
    assert ok.count() == 60

    # extraction over WARC input matches the golden kernel output per url
    from docvision_spark.kernel.extract import extract as kextract
    got = {r["url"]: r["id"] for r in ok.select("url", "id").collect()}
    for rec in recs:
        assert got[rec["url"]] == kextract(rec["url"], rec["payload"]).id

def test_http_transfer_and_content_codings(tmp_path):
    """Crawl-reality HTTP framings: chunked bodies de-chunk, gzip/deflate
    content codings decompress (deflate both zlib-wrapped and raw),
    chained chunked+gzip resolves in order, and undecodable codings
    (brotli) or corrupt framing skip the record instead of passing
    compressed bytes to the extractor."""
    import gzip as _gzip
    import zlib
    from datetime import datetime, timezone

    from docvision_spark.pipeline.warc import (_dechunk, parse_warc_bytes,
                                               write_warc)

    ts = datetime(2025, 5, 4, tzinfo=timezone.utc)
    html = ("<html><body>" + "word " * 500 + "</body></html>").encode()
    recs = [
        {"url": f"http://h.example.com/{c or 'plain'}", "warc_ts": ts,
         "payload": html, "lang": "en", "coding": c}
        for c in ("", "chunked", "gzip", "deflate", "chunked+gzip")
    ]
    p = tmp_path / "codings.warc.gz"
    write_warc(recs, str(p))
    pages = parse_warc_bytes(p.read_bytes())
    assert len(pages) == 5
    assert all(bytes(pg["html"]) == html for pg in pages)

    # raw-deflate variant (some servers emit deflate without zlib header)
    raw = zlib.compress(html)[2:-4]
    body = (b"HTTP/1.1 200 OK\r\nContent-Encoding: deflate\r\n\r\n" + raw)
    rec = (b"WARC/1.0\r\nWARC-Type: response\r\n"
           b"WARC-Target-URI: http://h.example.com/raw-deflate\r\n"
           b"WARC-Date: 2025-05-04T00:00:00Z\r\n"
           + b"Content-Length: %d\r\n\r\n" % len(body) + body + b"\r\n\r\n")
    assert [bytes(pg["html"]) for pg in parse_warc_bytes(rec)] == [html]

    def one(extra: bytes, body: bytes) -> list:
        b = b"HTTP/1.1 200 OK\r\n" + extra + b"\r\n" + body
        return parse_warc_bytes(
            b"WARC/1.0\r\nWARC-Type: response\r\n"
            b"WARC-Target-URI: http://h.example.com/x\r\n"
            b"WARC-Date: 2025-05-04T00:00:00Z\r\n"
            + b"Content-Length: %d\r\n\r\n" % len(b) + b + b"\r\n\r\n")

    # undecodable / corrupt cases all SKIP (never emit compressed bytes)
    assert one(b"Content-Encoding: br\r\n", b"\x00junk") == []
    assert one(b"Content-Encoding: gzip\r\n", b"not gzip") == []
    assert one(b"Transfer-Encoding: chunked\r\n", b"zz\r\nbad") == []
    assert one(b"Transfer-Encoding: chunked\r\n", b"5\r\nhello") == []

    # _dechunk handles chunk extensions and ignores trailers
    assert _dechunk(b"5;ext=1\r\nhello\r\n0\r\nTrailer: x\r\n\r\n") == b"hello"


def test_stacked_transfer_codings_skip():
    """'Transfer-Encoding: gzip, chunked' cannot be fully undone here —
    the record must SKIP, never pass transfer-gzipped bytes through."""
    import gzip as _gzip

    from docvision_spark.pipeline.warc import parse_warc_bytes

    html = b"<html><body>" + b"w " * 200 + b"</body></html>"
    gz = _gzip.compress(html)
    chunked = b"%x\r\n" % len(gz) + gz + b"\r\n0\r\n\r\n"
    body = (b"HTTP/1.1 200 OK\r\nTransfer-Encoding: gzip, chunked\r\n\r\n"
            + chunked)
    rec = (b"WARC/1.0\r\nWARC-Type: response\r\n"
           b"WARC-Target-URI: http://h.example.com/x\r\n"
           b"WARC-Date: 2025-05-04T00:00:00Z\r\n"
           + b"Content-Length: %d\r\n\r\n" % len(body) + body + b"\r\n\r\n")
    assert parse_warc_bytes(rec) == []
    # plain chunked (with an ignorable 'identity') still decodes
    chunked2 = b"%x\r\n" % len(html) + html + b"\r\n0\r\n\r\n"
    body2 = (b"HTTP/1.1 200 OK\r\n"
             b"Transfer-Encoding: identity, chunked\r\n\r\n" + chunked2)
    rec2 = (b"WARC/1.0\r\nWARC-Type: response\r\n"
            b"WARC-Target-URI: http://h.example.com/y\r\n"
            b"WARC-Date: 2025-05-04T00:00:00Z\r\n"
            + b"Content-Length: %d\r\n\r\n" % len(body2) + body2
            + b"\r\n\r\n")
    assert [bytes(p["html"]) for p in parse_warc_bytes(rec2)] == [html]
