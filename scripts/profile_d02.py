"""Profile d02 simhash variants at sf0.1 (round-3 regression hunt).

Variants:
  expr_ckpt   — current production: simhash_signatures_expr + localCheckpoint
  agg_ckpt    — explode+groupBy signatures + localCheckpoint
  expr_persist— expr signatures, persist(MEMORY_ONLY) instead of checkpoint
  sig_only_*  — just count() the signature frame (isolates signature cost)
"""
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark import StorageLevel

sys.path.insert(0, "/root/repo")
from docvision_spark.functions import dedup  # noqa: E402

SF = "/root/testdata/sf0.1/documents.parquet"


def timed(label, fn):
    t0 = time.monotonic()
    n = fn()
    print(f"{label}: {time.monotonic() - t0:.2f}s rows={n}", flush=True)


def pairs_with(sig_df):
    return dedup.banded_hamming_pairs(sig_df, "id", "sh", n_bands=4, max_hamming=3)


def main():
    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.driver.memory", "16g")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    d = spark.read.parquet(SF)
    print("docs:", d.count())

    timed("sig_only_expr", lambda: dedup.simhash_signatures_expr(d).count())
    timed("sig_only_agg", lambda: dedup.simhash_signatures_agg(d).count())
    timed("pairs_expr_ckpt", lambda: pairs_with(dedup.simhash_signatures_expr(d)).count())
    timed("pairs_agg_ckpt", lambda: pairs_with(dedup.simhash_signatures_agg(d)).count())
    # repeat to see cache/jit warm numbers
    timed("pairs_expr_ckpt2", lambda: pairs_with(dedup.simhash_signatures_expr(d)).count())
    timed("pairs_agg_ckpt2", lambda: pairs_with(dedup.simhash_signatures_agg(d)).count())
    spark.stop()


if __name__ == "__main__":
    main()
