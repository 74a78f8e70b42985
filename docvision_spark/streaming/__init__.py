"""Structured Streaming surface: continuous extraction over an arriving
pages feed + watermarked crawl-rate aggregation."""
