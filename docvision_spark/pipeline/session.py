"""SparkSession factory with the engine's scale-tuned defaults.

All Arrow/adaptive settings in one place so tests, bench, and jobs run the
same physical configuration. On a real cluster these come from spark-submit
conf; the builder here only sets what local mode needs.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "docvision-spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    max_records_per_batch: int = 256,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create/get a local SparkSession.

    max_records_per_batch bounds Arrow batch row count; combined with the
    size-aware packing stage (extract_job.py) it bounds batch *bytes*, which
    is what actually matters for Python-worker memory at 100 TB.
    """
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = max(2 * cores, 32)
    b = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cores}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(max_records_per_batch))
        # small splits so the pages scan parallelizes to the core count
        # WITHOUT a payload repartition (extract_job skips its salt
        # exchange when the scan is already parallel enough). 4m is sized
        # to the row-grouped corpus layout; on a petabyte table with
        # thousands of splits the same setting simply yields more of them
        # (scan tasks stay cheap — parquet open cost is per file, and the
        # kernel cost per split dwarfs scheduling overhead at any scale).
        .config("spark.sql.files.maxPartitionBytes",
                os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", "4m"))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
        # 32 executor threads stream multi-MB Arrow/binary batches: with
        # G1's default region size those are "humongous" allocations, and
        # GCLocker contention produced 10x wall-time swings on identical
        # queries (observed: same plan 3s then 35s, with GCLocker retry
        # warnings). Bigger regions make 4 MB batches ordinary allocations.
        # NOTE: this builder conf only reaches the JVM when it is launched
        # FROM python (bench.py, pytest, driver harness). Under
        # spark-submit the driver JVM already exists, so deployment must
        # pass the same flags via `--driver-java-options` (the verify
        # skill recipe and README do).
        .config("spark.driver.extraJavaOptions",
                "-XX:+UseG1GC -XX:G1HeapRegionSize=32m")
        .config("spark.python.worker.reuse", "true")
        # spark.task.cpus: round-4 measured the python-heavy extract stage
        # 25% faster with task.cpus=2 at local[32] (python worker per slot
        # starved the JVM Arrow-feed threads) — but that predates the UDS
        # transport below, which removed the feed bottleneck. Re-measured
        # in round 6: task.cpus=1 is now faster for extraction AND gives
        # every JVM-side query its full 32 slots (the =2 setting halved
        # parallelism for the whole relational/dedup surface). Kept as an
        # env knob so a cluster with a different python/JVM core ratio can
        # restore the headroom without a code change.
        .config("spark.task.cpus",
                os.environ.get("SPARK_GRAFT_TASK_CPUS", "1"))
        # JVM<->python-worker transport over unix domain sockets (Spark 4):
        # the TCP-loopback default suffers Nagle/delayed-ACK stalls that cap
        # Arrow feed at ~20 MB/s; UDS measured 20x faster on binary columns
        .config("spark.python.unix.domain.socket.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
