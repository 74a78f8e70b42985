"""Stateful streaming sessionization vs the batch window-SQL twin."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F


@pytest.mark.spark
def test_stream_sessionize_matches_batch(spark, tmp_path):
    from docvision_spark.queries import q05_sessionize
    from docvision_spark.streaming.sessionize import sessionize_stream

    sf = "/root/testdata/sf0.001"
    # time-ordered feed (2 chunks, increasing mtime) so the watermark flushes
    import time

    import pyarrow.parquet as pq

    tbl = pq.read_table(os.path.join(sf, "events.parquet")).sort_by("ts")
    feed = tmp_path / "feed"
    feed.mkdir()
    half = tbl.num_rows // 2
    now = time.time()
    for i, sl in enumerate((tbl.slice(0, half), tbl.slice(half))):
        p = str(feed / f"part-{i}.parquet")
        pq.write_table(sl, p)
        os.utime(p, (now + i, now + i))

    stream = (spark.readStream.schema(
                "event_id long, ts timestamp, user_id long, "
                "event_type string, value double, props string")
              .option("maxFilesPerTrigger", 1).parquet(str(feed)))
    out_dir = str(tmp_path / "sessions")
    q = (sessionize_stream(stream).writeStream.format("parquet")
         .option("path", out_dir)
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(300)

    got = spark.read.parquet(out_dir)
    n_stream = got.count()
    assert n_stream > 0
    # closed sessions are a prefix of the batch answer: every (user, start)
    # the stream emitted must exist in the batch sessionization, with equal
    # event counts
    batch_total = q05_sessionize(spark, sf).agg(F.sum("n_sessions")).collect()[0][0]
    assert n_stream <= batch_total
    # sessions closed by gap are fully determined -> spot-check totals
    per_user_stream = {(r["user_id"], r["n_events"])
                       for r in got.filter("closed_by = 'gap'").collect()}
    assert per_user_stream  # at least some gap-closed sessions
    # no session may exceed the batch per-user event count
    batch_events = {r["user_id"]: r["n_events"]
                    for r in q05_sessionize(spark, sf).collect()}
    for uid, n in per_user_stream:
        assert n <= batch_events[uid]