"""Host-frequency residual-boilerplate detection (CCNet/trafilatura-style).

The kernel's density classifier (kernel/classify.py) strips low-density
nav/footer chrome per page. What it CANNOT catch is template text that
looks like content — a newsletter pitch, a legal disclaimer, a promo
paragraph — repeated verbatim inside <main> across many pages of one host.
The classic web-curation answer (CCNet's paragraph-frequency pass) is
corpus-level: a line that appears in >= k distinct documents of the same
host is boilerplate, whatever its density.

Scale shape (100 TB): one explode over lines, one dropDuplicates shuffle on
(host, line, url), one partial-aggregated count per (host, line) — all keys
are host-prefixed so the hot-host skew fixture spreads over (host, line)
buckets, far finer than host alone. The strip joins the small frequent-line
set back; at real scale that side is tiny relative to the corpus (template
lines per host are bounded) and the join key (host, line) is again fine-
grained. No driver-side collection anywhere.

Reference parity note: the reference has no corpus-level operator at all
(per-document VLM calls, src/docvision/core/parser.py); this is part of the
training-data-pipeline surface the graft adds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

HOST_RE = r"^[a-z]+://([^/:?#]+)"  # same spec as x03's oracle host regex


def with_host(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Add a `host` column via the same regex the DuckDB oracles use
    (parse_url and a regex can disagree on edge cases; the regex is the
    single shared definition)."""
    return df.withColumn("host", F.regexp_extract(F.col(url_col), HOST_RE, 1))


def _doc_lines(df: DataFrame, url_col: str, text_col: str,
               min_chars: int) -> DataFrame:
    """(host, url, line) with one row per DISTINCT line per document —
    a line repeated inside one doc still counts that doc once."""
    return (
        with_host(df, url_col)
        .select("host", F.col(url_col).alias("url"),
                F.explode(F.split(F.col(text_col), "\n")).alias("line"))
        .filter(F.length(F.trim("line")) >= min_chars)
        .dropDuplicates(["host", "url", "line"])
    )


def host_frequent_lines(df: DataFrame, url_col: str = "url",
                        text_col: str = "text", min_docs: int = 4,
                        min_chars: int = 12) -> DataFrame:
    """(host, line, n_docs): lines appearing in >= min_docs distinct docs
    of the same host. min_chars skips short connective fragments that
    repeat by chance; min_docs is the CCNet-style frequency knob."""
    return (
        _doc_lines(df, url_col, text_col, min_chars)
        .groupBy("host", "line")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
    )


def strip_frequent_lines(df: DataFrame, url_col: str = "url",
                         text_col: str = "text", min_docs: int = 4,
                         min_chars: int = 12) -> DataFrame:
    """Remove each host's frequent lines from every document of that host.

    Returns the input frame with `text_col` rewritten (line order
    preserved; removed lines excised) plus `n_stripped_lines`. Documents
    with no line surviving keep an empty string (callers' empty-content
    filter then drops them); null-url and null-text rows pass through
    untouched (silently clearing them would hide upstream corruption).
    Implemented as posexplode -> left_anti join against the frequent-line
    set on (host, line) -> ordered reassembly; deterministic under any
    partitioning.

    PRECONDITION: `url_col` must be unique per row (run url_dedup/exact
    dedup first, as jobs/curate.py does). Two rows sharing a url would have
    their exploded lines merged by the reassembly groupBy and both rows
    would receive the interleaved mixture."""
    freq = host_frequent_lines(df, url_col, text_col, min_docs, min_chars)
    exploded = (
        with_host(df, url_col)
        .select("host", F.col(url_col).alias("url"),
                F.posexplode(F.split(F.col(text_col), "\n"))
                 .alias("pos", "line"))
    )
    kept = exploded.join(freq.select("host", "line"), ["host", "line"],
                         "left_anti")
    rebuilt = (
        kept.groupBy("url")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "line"))),
                    lambda s: s["line"]),
                "\n").alias("_clean"),
            F.count(F.lit(1)).alias("_n_kept"),
        )
    )
    n_lines = F.size(F.split(F.col(text_col), "\n"))
    return (
        df.withColumn("_n_lines", n_lines)
          .join(rebuilt, on=df[url_col] == rebuilt["url"], how="left")
          .drop(rebuilt["url"])
          # null-url / null-text rows pass through untouched (the rebuilt
          # join can never match them — clearing their text would silently
          # drop them downstream); a doc whose EVERY line was frequent has
          # no rebuilt row and becomes empty (not silently restored)
          .withColumn("_passthru", F.col(url_col).isNull()
                      | F.col("_n_lines").isNull())
          .withColumn(text_col,
                      F.when(F.col("_passthru"), F.col(text_col))
                       .otherwise(F.coalesce("_clean", F.lit(""))))
          .withColumn("n_stripped_lines",
                      F.when(F.col("_passthru"), F.lit(0))
                       .otherwise(F.col("_n_lines")
                                  - F.coalesce("_n_kept", F.lit(0))))
          .drop("_clean", "_n_kept", "_n_lines", "_passthru")
    )
