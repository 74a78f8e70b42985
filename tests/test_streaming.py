"""Structured Streaming tests: continuous extraction parity with batch,
exactly-once resume via checkpoint, watermarked crawl-rate aggregation."""

from __future__ import annotations

import hashlib
import json
import os

import pytest
from pyspark.sql import functions as F

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "golden.jsonl")


@pytest.mark.spark
def test_stream_extract_matches_batch(spark, pages_dir, tmp_path):
    from docvision_spark.streaming.ingest import start_extract_query

    out = str(tmp_path / "stream_out")
    ckpt = str(tmp_path / "ckpt")
    q = start_extract_query(spark, pages_dir, out, ckpt)
    q.awaitTermination(300)

    got = spark.read.parquet(out)
    assert got.count() == 300
    assert got.select("url").distinct().count() == 300

    # byte-identity vs goldens (same kernel, streaming execution)
    want = {}
    with open(FIXTURE, encoding="utf-8") as f:
        for line in f:
            row = json.loads(line)
            if "_meta" not in row:
                want[row["url"]] = row
    rows = got.select("url", "id", "text").collect()
    checked = 0
    for r in rows:
        g = want.get(r["url"])
        if g is None:
            continue
        assert r["id"] == g["id"]
        assert hashlib.sha256(r["text"].encode()).hexdigest() == g["text_sha256"]
        checked += 1
    assert checked == len(want)

    # exactly-once resume: restarting the query over the same input is a no-op
    q2 = start_extract_query(spark, pages_dir, out, ckpt)
    q2.awaitTermination(300)
    assert spark.read.parquet(out).count() == 300


@pytest.mark.spark
def test_crawl_rate_watermarked_agg(spark, pages_dir, tmp_path):
    """Watermarked windowed agg over an event-time-ordered feed (a real
    crawl feed arrives roughly in warc_ts order; the bucketed batch layout
    is NOT time-ordered, so streaming it directly would — correctly — drop
    most rows as late; that late-drop behavior is asserted separately)."""
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from docvision_spark.streaming.ingest import start_crawl_rate_query

    # build a time-ordered 8-chunk feed with increasing mtimes
    feed = tmp_path / "feed"
    feed.mkdir()
    tbl = pa.concat_tables([
        pq.read_table(os.path.join(pages_dir, d, f))
        for d in sorted(os.listdir(pages_dir)) if d.startswith("bucket=")
        for f in os.listdir(os.path.join(pages_dir, d))
    ]).sort_by("warc_ts")
    n = tbl.num_rows
    chunk = (n + 7) // 8
    now = time.time()
    for i in range(8):
        p = str(feed / f"part-{i:02d}.parquet")
        pq.write_table(tbl.slice(i * chunk, chunk), p)
        os.utime(p, (now + i, now + i))

    out = str(tmp_path / "rate_out")
    q = start_crawl_rate_query(spark, str(feed), out, str(tmp_path / "rate_ckpt"))
    q.awaitTermination(300)

    agg = spark.read.parquet(out)
    for c in ("window_start", "host", "n_docs", "bytes_in"):
        assert c in agg.columns
    tot = agg.agg(F.sum("n_docs")).collect()[0][0]
    # append mode withholds windows not yet past the final watermark
    # (last chunk ≈ n/8 rows + 2-day watermark tail)
    assert tot >= n * 3 // 4, f"only {tot}/{n} rows emitted"
    # hot-host skew fixture shows up in the aggregate (~30% of docs)
    hot = (agg.filter(F.col("host") == "bigportal.example.com")
           .agg(F.sum("n_docs")).collect()[0][0])
    assert 0.15 <= hot / tot <= 0.45


@pytest.mark.spark
def test_stream_dedup_within_watermark(spark, tmp_path):
    """Content-fingerprint dedup across micro-batches: duplicates planted in
    LATER batches (re-crawls + mirrors within the watermark) must be dropped;
    surviving fp set equals the batch dropDuplicates fp set."""
    import time

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from docvision_spark.streaming.dedup import start_dedup_query

    base = pd.Timestamp("2026-01-05 00:00:00")
    rows = []
    for i in range(20):  # 20 unique texts, 4 per file across 5 files
        rows.append({"url": f"https://a.example.com/p{i}",
                     "warc_ts": base + pd.Timedelta(minutes=i),
                     "html": None, "text": f"unique document body {i}", "lang": "en"})
    dups = []
    for i in range(5):  # re-crawl (same url) + mirror (other url), same text
        dups.append({"url": f"https://a.example.com/p{i}",
                     "warc_ts": base + pd.Timedelta(hours=1, minutes=i),
                     "html": None, "text": f"unique document body {i}", "lang": "en"})
        dups.append({"url": f"https://mirror.example.org/p{i}",
                     "warc_ts": base + pd.Timedelta(hours=2, minutes=i),
                     "html": None, "text": f"unique document body {i}", "lang": "en"})

    feed = tmp_path / "dedup_feed"
    feed.mkdir()
    now = time.time()
    schema = pa.schema([("url", pa.string()), ("warc_ts", pa.timestamp("us")),
                        ("html", pa.binary()), ("text", pa.string()),
                        ("lang", pa.string())])
    chunks = [rows[0:4], rows[4:8], rows[8:12], rows[12:16], rows[16:20], dups]
    for i, chunk in enumerate(chunks):
        p = str(feed / f"part-{i:02d}.parquet")
        pq.write_table(pa.Table.from_pandas(pd.DataFrame(chunk), schema=schema), p)
        os.utime(p, (now + i, now + i))

    out = str(tmp_path / "dedup_out")
    q = start_dedup_query(spark, str(feed), out, str(tmp_path / "dedup_ckpt"),
                          watermark="1 day")
    q.awaitTermination(300)

    got = spark.read.parquet(out)
    assert got.count() == 20, "every duplicate within the watermark must drop"
    assert got.select("fp").distinct().count() == 20
    # survivors are the FIRST-arriving copies (original urls, not mirrors)
    assert got.filter(F.col("url").contains("mirror")).count() == 0
    # fp set parity with the batch twin
    from docvision_spark.functions.text import fingerprint_md5
    batch = spark.createDataFrame(pd.DataFrame(rows + dups), schema=got.drop("fp").schema)
    batch_fps = {r["fp"] for r in batch.select(
        fingerprint_md5(F.col("text")).alias("fp")).distinct().collect()}
    assert {r["fp"] for r in got.select("fp").collect()} == batch_fps


@pytest.mark.spark
def test_stream_dedup_against_corpus(spark, tmp_path):
    """Re-crawl mode on a live feed: rows whose fingerprint is already in
    the published corpus (stream-static anti-join) drop, within-stream dups
    drop, NULL-text rows pass through — composed semantics equal the batch
    incremental_exact_dedup (i01) on the same input."""
    import time

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from docvision_spark.functions.text import fingerprint_md5
    from docvision_spark.streaming.dedup import start_incremental_dedup_query

    base = pd.Timestamp("2026-01-05 00:00:00")
    fresh = [{"url": f"https://a.example.com/new{i}",
              "warc_ts": base + pd.Timedelta(minutes=i),
              "html": None, "text": f"fresh body {i}", "lang": "en"}
             for i in range(8)]
    recrawled = [{"url": f"https://a.example.com/old{i}",
                  "warc_ts": base + pd.Timedelta(minutes=30 + i),
                  "html": None, "text": f"published body {i}", "lang": "en"}
                 for i in range(6)]
    instream_dups = [{"url": f"https://mirror.example.org/new{i}",
                      "warc_ts": base + pd.Timedelta(hours=1, minutes=i),
                      "html": None, "text": f"fresh body {i}", "lang": "en"}
                     for i in range(3)]
    nulls = [{"url": "https://a.example.com/broken",
              "warc_ts": base + pd.Timedelta(minutes=5),
              "html": None, "text": None, "lang": "en"}]

    feed = tmp_path / "inc_feed"
    feed.mkdir()
    now = time.time()
    schema = pa.schema([("url", pa.string()), ("warc_ts", pa.timestamp("us")),
                        ("html", pa.binary()), ("text", pa.string()),
                        ("lang", pa.string())])
    # 5 files with maxFilesPerTrigger=4: the mirror dups land in the SECOND
    # micro-batch, after the originals' fingerprints are in state (within one
    # micro-batch the surviving copy of a fp-tie is arbitrary).
    chunks = [fresh[:4] + nulls, fresh[4:], recrawled[:3],
              recrawled[3:], instream_dups]
    for i, chunk in enumerate(chunks):
        p = str(feed / f"part-{i:02d}.parquet")
        pq.write_table(pa.Table.from_pandas(pd.DataFrame(chunk), schema=schema), p)
        os.utime(p, (now + i, now + i))

    # the published corpus exposes the fingerprints of recrawled[*] texts
    history = spark.createDataFrame(
        pd.DataFrame({"text": [r["text"] for r in recrawled]})
    ).select(fingerprint_md5(F.col("text")).alias("fp"))

    out = str(tmp_path / "inc_out")
    q = start_incremental_dedup_query(spark, str(feed), history, out,
                                      str(tmp_path / "inc_ckpt"),
                                      watermark="1 day")
    q.awaitTermination(300)

    got = spark.read.parquet(out)
    # survivors: 8 fresh + 1 null passthrough; history + in-stream dups drop
    assert got.count() == 9
    assert got.filter(F.col("fp").isNull()).count() == 1
    assert got.filter(F.col("url").contains("mirror")).count() == 0
    assert got.filter(F.col("url").contains("/old")).count() == 0
    got_fps = {r["fp"] for r in got.filter(F.col("fp").isNotNull())
                                   .select("fp").collect()}
    want_fps = {r["fp"] for r in spark.createDataFrame(pd.DataFrame(fresh))
                .select(fingerprint_md5(F.col("text")).alias("fp")).collect()}
    assert got_fps == want_fps
