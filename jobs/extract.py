"""spark-submit entry for the extraction pipeline.

Usage:
    spark-submit --py-files dist/docvision_spark.zip jobs/extract.py \
        --input /path/to/pages --output /path/to/out \
        [--partitions N] [--no-resume] [--cores N]

On a cluster, drop --cores and set master/executors via spark-submit conf.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description="docvision-spark extraction job")
    ap.add_argument("--input", required=True, help="pages parquet dir")
    ap.add_argument("--output", required=True, help="output table dir")
    ap.add_argument("--partitions", type=int, default=None)
    ap.add_argument("--cores", type=int, default=None, help="local[N] cores")
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--dedup-against", default=None, metavar="TABLE",
                    help="re-crawl mode: content-dedup the increment's "
                         "extracted docs against this published extract "
                         "table's id column before committing (summary "
                         "gains dedup_dropped)")
    ap.add_argument("--compact-mb", type=int, default=0,
                    help="if >0, run small-file compaction on the output "
                         "table to ~N MB files after the extract commit "
                         "(one atomic replace snapshot; resume and time "
                         "travel preserved)")
    args = ap.parse_args()

    from docvision_spark.pipeline.extract_job import run_extract_job
    from docvision_spark.pipeline.session import get_spark

    spark = get_spark(app_name="docvision-extract", cores=args.cores)
    summary = run_extract_job(
        spark, args.input, args.output,
        partitions=args.partitions, resume=not args.no_resume,
        dedup_against=args.dedup_against,
    )
    if args.compact_mb > 0:
        from docvision_spark.pipeline import snapshots
        summary["compact"] = snapshots.compact(
            spark, args.output, target_mb=args.compact_mb)
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
