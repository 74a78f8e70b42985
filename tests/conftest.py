"""Shared fixtures: one local SparkSession per test session, small corpora."""

from __future__ import annotations

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
PAGES_SMALL = os.path.join(REPO, "data", "pages_unit")     # 300 docs
N_PAGES_SMALL = 300


@pytest.fixture(scope="session")
def spark():
    from docvision_spark.pipeline.session import get_spark

    s = get_spark(app_name="docvision-tests", cores=4, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def pages_dir() -> str:
    from docvision_spark.corpus import ensure_corpus

    return ensure_corpus(PAGES_SMALL, N_PAGES_SMALL)
