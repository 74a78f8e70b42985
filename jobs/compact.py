"""Table maintenance: small-file compaction + snapshot expiry.

At 10^12-doc scale an append-only snapshot table accretes one file per
task per incremental run; scans then pay per-file open/footer costs that
dwarf the data read. This job rewrites each partition's small files into
~target-size files in ONE atomic replace snapshot (row-for-row identical,
resume/time-travel preserved), then optionally expires old snapshots to
reclaim the replaced files — the Iceberg rewrite_data_files +
expire_snapshots maintenance pair, against the same emulated snapshot
layer jobs/extract.py commits to.

Usage:
    spark-submit jobs/compact.py --table out_dir [--target-mb 256]
        [--expire-keep N] [--cores N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description="docvision-spark table maintenance")
    ap.add_argument("--table", required=True, help="snapshot table dir")
    ap.add_argument("--target-mb", type=int, default=256)
    ap.add_argument("--min-files", type=int, default=2)
    ap.add_argument("--expire-keep", type=int, default=0,
                    help="if >0, expire all but the last N snapshots after compacting")
    ap.add_argument("--cores", type=int, default=None)
    args = ap.parse_args()

    from docvision_spark.pipeline import snapshots
    from docvision_spark.pipeline.session import get_spark

    spark = get_spark(app_name="docvision-compact", cores=args.cores)
    spark.sparkContext.setLogLevel("ERROR")
    report = snapshots.compact(spark, args.table, target_mb=args.target_mb,
                               min_files=args.min_files)
    if args.expire_keep > 0:
        report["expire"] = snapshots.expire_snapshots(
            args.table, keep_last=args.expire_keep)
    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()
