"""Deterministic extraction kernel — pure Python, no network, no models, no RNG.

This package is the from-scratch replacement for the reference's per-page
model calls (reference core/parser.py:192-216 BASIC_OCR/VLM branches). Every
function here is a pure function of its byte/string inputs so that the
distributed pipeline's output is byte-identical per url at any parallelism.
"""

__all__ = ["charset", "classify", "dom", "entities", "extract",
           "html_tokenizer", "markdown", "pdf_text"]
