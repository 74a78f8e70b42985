"""Distributed pipeline: scan -> resume anti-join -> salt/pack -> mapInPandas
kernel -> output + failure + metrics sinks, with snapshot commits."""

from docvision_spark.pipeline.extract_job import OUTPUT_SCHEMA, extract_pages, run_extract_job
from docvision_spark.pipeline.session import get_spark

__all__ = ["OUTPUT_SCHEMA", "extract_pages", "run_extract_job", "get_spark"]
