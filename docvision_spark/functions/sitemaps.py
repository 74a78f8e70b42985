"""Sitemap ingestion (sitemaps.org protocol): the crawl frontier's seed.

robots.txt names them (functions/robots.py collects Sitemap: lines); this
module parses the three wire formats hosts actually serve —

  - XML <urlset> of <url><loc> entries (lastmod kept when present),
  - XML <sitemapindex> of <sitemap><loc> child references,
  - plain-text one-url-per-line,

each optionally gzip-compressed (sniffed, stdlib zlib) — and turns them
into a (host, kind, loc, lastmod) entry table with a mapInPandas stage
(sitemaps number in the millions at crawl scale; one task parses many).
The frontier diff (listed-but-not-crawled / crawled-but-not-listed) is
then plain relational algebra against the pages table.

The XML scan is the same deliberate subset as kernel/svg_info.py /
kernel/feed.py: prolog constructs skipped, CDATA honored, entity decode
via the shared WHATWG table, malformed markup degrades to skip-ahead.
"""
from __future__ import annotations

import gzip
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import StringType, StructField, StructType

ENTRY_SCHEMA = StructType([
    StructField("host", StringType()),
    StructField("kind", StringType()),      # urlset | sitemapindex | text
    StructField("loc", StringType()),
    StructField("lastmod", StringType()),   # raw W3C datetime string
    StructField("error", StringType()),
])

_MAX_ENTRIES = 50000  # the protocol's own per-file cap


def parse_sitemap(payload: bytes) -> dict:
    """Sitemap bytes -> {kind, entries: [(loc, lastmod)], error}.
    For a sitemapindex, entries are the CHILD sitemap locations."""
    from docvision_spark.kernel.entities import decode_entities

    if payload[:2] == b"\x1f\x8b":
        try:
            payload = gzip.decompress(payload)
        except OSError as e:
            return {"kind": None, "entries": [], "error": f"gzip: {e}"}
    text = payload.decode("utf-8", errors="replace")
    stripped = text.lstrip("﻿ \t\r\n")
    if not stripped.startswith("<"):
        # plain-text sitemap: one absolute url per line
        entries = []
        for line in text.splitlines():
            line = line.strip()
            if line.startswith(("http://", "https://")):
                entries.append((line, None))
            if len(entries) >= _MAX_ENTRIES:
                break
        if not entries:
            return {"kind": None, "entries": [],
                    "error": "not xml and no url lines"}
        return {"kind": "text", "entries": entries, "error": None}

    # XML subset scan: track url/sitemap containers, capture loc/lastmod
    kind = None
    entries: list[tuple[str, str | None]] = []
    loc = lastmod = None
    capture: str | None = None
    buf: list[str] = []
    pos, n = 0, len(text)
    while pos < n and len(entries) < _MAX_ENTRIES:
        lt = text.find("<", pos)
        if lt < 0:
            break
        if capture is not None and lt > pos:
            buf.append(text[pos:lt])
        pos = lt
        if text.startswith("<!--", pos):
            end = text.find("-->", pos + 4)
            pos = n if end < 0 else end + 3
            continue
        if text.startswith("<![CDATA[", pos):
            end = text.find("]]>", pos + 9)
            if capture is not None:
                buf.append(text[pos + 9:n if end < 0 else end])
            pos = n if end < 0 else end + 3
            continue
        if text.startswith("<?", pos) or text.startswith("<!", pos):
            end = text.find(">", pos + 2)
            pos = n if end < 0 else end + 1
            continue
        gt = text.find(">", pos)
        if gt < 0:
            break
        raw = text[pos + 1:gt]
        pos = gt + 1
        endtag = raw.startswith("/")
        name = raw[1:].split()[0] if endtag and raw[1:].split() else \
            (raw.split()[0] if raw.split() else "")
        name = name.rsplit(":", 1)[-1].rstrip("/").lower()
        if not endtag:
            if name in ("urlset", "sitemapindex") and kind is None:
                kind = name
            elif name in ("loc", "lastmod"):
                capture, buf = name, []
        else:
            if name == "loc" and capture == "loc":
                loc = decode_entities("".join(buf).strip())
                capture = None
            elif name == "lastmod" and capture == "lastmod":
                lastmod = "".join(buf).strip() or None
                capture = None
            elif name in ("url", "sitemap"):
                if loc:
                    entries.append((loc, lastmod))
                loc = lastmod = None
    if kind is None:
        return {"kind": None, "entries": [], "error": "no urlset root"}
    if loc:  # truncated final entry
        entries.append((loc, lastmod))
    return {"kind": kind, "entries": entries, "error": None}


def sitemap_entries(df: DataFrame) -> DataFrame:
    """(host, payload binary) rows -> flat entry table via mapInPandas
    (Arrow-batched; one task parses many sitemap files). Parse errors are
    per-row typed rows, never task failures — same discipline as the
    extraction kernel."""
    from docvision_spark.pipeline.shipping import ensure_py_files

    ensure_py_files(df.sparkSession)

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in ENTRY_SCHEMA.fields]
        for pdf in it:
            out = []
            for host, payload in zip(pdf["host"], pdf["payload"]):
                try:
                    r = parse_sitemap(bytes(payload))
                except Exception as e:  # noqa: BLE001
                    r = {"kind": None, "entries": [],
                         "error": f"{type(e).__name__}: {e}"[:200]}
                if r["error"] is not None:
                    out.append({"host": host, "kind": r["kind"], "loc": None,
                                "lastmod": None, "error": r["error"]})
                for loc, lm in r["entries"]:
                    out.append({"host": host, "kind": r["kind"], "loc": loc,
                                "lastmod": lm, "error": None})
            yield pd.DataFrame(out, dtype=object, columns=cols)

    return df.mapInPandas(fn, schema=ENTRY_SCHEMA)


def make_sitemap_xml(urls: list[str], lastmod: str | None = None,
                     index: bool = False, as_gzip: bool = False,
                     as_text: bool = False) -> bytes:
    """Deterministic sitemap encoder (fixture/round-trip twin of the
    parser, like every other codec in this repo)."""
    if as_text:
        data = ("\n".join(urls) + "\n").encode()
    else:
        tag, item = (("sitemapindex", "sitemap") if index
                     else ("urlset", "url"))
        lm = f"<lastmod>{lastmod}</lastmod>" if lastmod else ""
        body = "".join(
            f"<{item}><loc>{u.replace('&', '&amp;')}</loc>{lm}</{item}>"
            for u in urls)
        data = (f'<?xml version="1.0" encoding="UTF-8"?>\n'
                f'<{tag} xmlns="http://www.sitemaps.org/schemas/sitemap'
                f'/0.9">{body}</{tag}>').encode()
    return gzip.compress(data, compresslevel=1) if as_gzip else data
