"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship extraction over an sf0.001-scale synthetic pages
                 corpus (schema per BASELINE.json input_hint).
queries()      — one entry per implemented operator (SURVEY.md §2.2 +
                 training-data ops), each (spark, sf_dir) -> DataFrame.
oracle_sql()   — DuckDB twins for the SQL-expressible subset; kernel ops
                 (extraction, LSH bucketing, winnowing) are rows-only by
                 design and are byte-identity-tested against golden files in
                 tests/ instead.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: deterministic main-content extraction over a Common-Crawl-
    style pages table (url, warc_ts, html, text, lang)."""
    from docvision_spark.queries import x01_extract

    return x01_extract(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from docvision_spark.queries import queries as _q

    return _q()


def oracle_sql() -> dict[str, str]:
    from docvision_spark.queries import oracle_sql as _o

    return _o()
