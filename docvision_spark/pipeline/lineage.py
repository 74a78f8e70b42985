"""Per-partition lineage + metrics table (north-rule fields, FIXTURES.md §4).

Replaces the reference's tqdm progress + silent per-page error swallow
(core/parser.py:308-320) with durable rows: one per task partition, plus up
to 5 failure samples each. Computed from the *written* output parquet with a
column-pruned scan (url, bytes_in, partition_id, error, processing_time) —
the html payload is never re-read.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from docvision_spark import EXTRACTOR_VERSION

METRICS_SCHEMA = (
    "snapshot_id STRING, partition_id INT, input_split STRING, doc_count BIGINT, "
    "bytes_in BIGINT, bytes_out BIGINT, n_failures BIGINT, "
    "failure_samples ARRAY<STRUCT<url STRING, error STRING>>, "
    "extractor_version STRING, wall_time_s DOUBLE, committed_at TIMESTAMP"
)


def write_metrics(
    spark: SparkSession,
    out_dir: str,
    snapshot_id: str,
    input_split: str,
    wall_s: float,
) -> None:
    from docvision_spark.pipeline import snapshots

    table = snapshots.read_table(spark, out_dir)
    if table is None:
        return
    per_part = (
        table.select("partition_id", "url", "bytes_in", "error",
                     F.length("text").alias("bytes_out"))
        .groupBy("partition_id")
        .agg(
            F.count("*").alias("doc_count"),
            F.sum("bytes_in").alias("bytes_in"),
            F.sum("bytes_out").alias("bytes_out"),
            F.sum(F.when(F.col("error").isNotNull(), 1).otherwise(0)).alias("n_failures"),
            F.slice(
                F.collect_list(
                    F.when(F.col("error").isNotNull(),
                           F.struct(F.col("url"), F.col("error")))
                ), 1, 5,
            ).alias("failure_samples"),
        )
        .withColumn("snapshot_id", F.lit(snapshot_id))
        .withColumn("input_split", F.lit(input_split))
        .withColumn("extractor_version", F.lit(EXTRACTOR_VERSION))
        .withColumn("wall_time_s", F.lit(float(wall_s)))
        .withColumn("committed_at", F.from_unixtime(F.lit(time.time())).cast("timestamp"))
    )
    metrics_dir = os.path.join(out_dir, "metrics")
    per_part.write.mode("append").parquet(metrics_dir)
