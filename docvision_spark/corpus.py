"""Deterministic synthetic Common-Crawl-style pages corpus (build plan M0).

Every page is a pure function of its url: seed = sha3_256(url) drives a
local PRNG, so the same url always yields the same bytes — at any scale, on
any machine. No external data (driver instruction). Schema matches the
authoritative input_hint (BASELINE.json:15):
    url STRING, warc_ts TIMESTAMP, html BINARY, text STRING, lang STRING
plus the write-time partition column bucket INT = crc32(url) % n_buckets.

Fixture properties the pipeline's scale features are tested against:
 - one hot host holds ~30% of urls (skew -> salted repartition is testable)
 - long-tailed doc sizes: most 2-20 KB, ~2% are 10x larger (batch packing)
 - ~90% HTML (utf-8 / latin-1 with declared meta charset, nav/header/footer/
   sidebar boilerplate around a main article), ~10% PDF (uncompressed or
   FlateDecode, text operators only), ~8% of HTML mildly malformed
"""

from __future__ import annotations

import hashlib
import random
import zlib
from binascii import crc32
from dataclasses import dataclass
from datetime import datetime, timedelta, timezone

N_BUCKETS_DEFAULT = 16
PARALLEL_THRESHOLD = 5000  # use a process pool above this corpus size

HOSTS = [
    "bigportal.example.com",  # hot host: ~30% of urls
    "news.example.org", "blog.example.net", "docs.example.io",
    "shop.example.co", "wiki.example.edu", "forum.example.dev",
    "mag.example.info", "data.example.gov", "press.example.biz",
]

LANGS = ["en", "id", "es", "de", "fr"]

# per-language word pools; the leading words are stopwords shared with
# kernel.classify.STOPWORDS so stopword-ratio features are meaningful
_WORDS = {
    "en": ("the of and to in is was for with on as at by it this that from "
           "market growth report annual revenue system analysis data model "
           "energy policy research climate software industry product service "
           "development technology science health finance mountain river city "
           "history culture music education travel nature").split(),
    "id": ("dan yang di ke dari untuk dengan pada adalah ini itu "
           "pasar laporan tahunan pendapatan sistem analisis data model "
           "energi kebijakan riset iklim perangkat industri produk layanan "
           "pengembangan teknologi sains kesehatan keuangan gunung sungai "
           "kota sejarah budaya musik pendidikan wisata alam").split(),
    "es": ("el la los las de en y que un una es por con para "
           "mercado informe anual ingresos sistema datos modelo "
           "energía política investigación clima software industria producto "
           "desarrollo tecnología ciencia salud finanzas montaña río ciudad "
           "historia cultura música educación viaje naturaleza").split(),
    "de": ("der die das und ist von zu mit den im für "
           "markt bericht jährlich umsatz system analyse daten modell "
           "energie politik forschung klima software industrie produkt dienst "
           "entwicklung technologie wissenschaft gesundheit finanzen berg "
           "fluss stadt geschichte kultur musik bildung reise natur").split(),
    "fr": ("le les des du et est une dans qui pour sur "
           "marché rapport annuel revenus système analyse données modèle "
           "énergie politique recherche climat logiciel industrie produit "
           "développement technologie science santé finance montagne rivière "
           "ville histoire culture musique éducation voyage nature").split(),
}

_NAV_ITEMS = ["Home", "About", "Products", "Blog", "Contact", "Careers",
              "Support", "Pricing", "Docs", "Archive"]


def url_seed(url: str) -> int:
    return int.from_bytes(hashlib.sha3_256(url.encode("utf-8")).digest()[:8], "big")


def gen_urls(n: int) -> list[str]:
    """n unique urls; host chosen so HOSTS[0] gets ~30% of them."""
    urls = []
    for i in range(n):
        h = hashlib.sha3_256(f"url-{i}".encode()).digest()
        r = h[0] / 255.0
        host = HOSTS[0] if r < 0.30 else HOSTS[1 + h[1] % (len(HOSTS) - 1)]
        urls.append(f"https://{host}/p/{h[2:8].hex()}/{i}")
    return urls


def _sentence(rng: random.Random, words: list[str], lo: int = 6, hi: int = 18) -> str:
    n = rng.randint(lo, hi)
    ws = [rng.choice(words) for _ in range(n)]
    return ws[0].capitalize() + " " + " ".join(ws[1:]) + "."


def _paragraph(rng: random.Random, words: list[str], n_sent: int | None = None) -> str:
    n = n_sent if n_sent is not None else rng.randint(2, 6)
    return " ".join(_sentence(rng, words) for _ in range(n))


# --------------------------------------------------------------------------
# HTML generation
# --------------------------------------------------------------------------

def _nav_html(rng: random.Random) -> str:
    items = rng.sample(_NAV_ITEMS, rng.randint(4, 8))
    links = "".join(f'<li><a href="/{i.lower()}">{i}</a></li>' for i in items)
    return f'<nav class="main-nav"><ul>{links}</ul></nav>'


def _sidebar_html(rng: random.Random, words: list[str]) -> str:
    lis = "".join(
        f'<li><a href="/rel/{k}">{_sentence(rng, words, 3, 6)[:-1]}</a></li>'
        for k in range(rng.randint(3, 7))
    )
    return (f'<aside class="sidebar related"><h3>Related</h3><ul>{lis}</ul>'
            f'<div class="widget ad">{_sentence(rng, words, 4, 8)}</div></aside>')


def _table_html(rng: random.Random, words: list[str]) -> str:
    ncols = rng.randint(2, 5)
    nrows = rng.randint(2, 6)
    head = "".join(f"<th>{rng.choice(words).capitalize()}</th>" for _ in range(ncols))
    rows = []
    for _ in range(nrows):
        cells = "".join(
            f"<td>{rng.choice(words)} {rng.randint(1, 9999)}</td>" for _ in range(ncols)
        )
        rows.append(f"<tr>{cells}</tr>")
    return f"<table class=\"data\"><thead><tr>{head}</tr></thead><tbody>{''.join(rows)}</tbody></table>"


def _list_html(rng: random.Random, words: list[str]) -> str:
    tag = "ol" if rng.random() < 0.3 else "ul"
    lis = "".join(f"<li>{_sentence(rng, words, 4, 12)}</li>"
                  for _ in range(rng.randint(3, 7)))
    return f"<{tag}>{lis}</{tag}>"


def make_html(url: str, rng: random.Random, lang: str) -> bytes:
    words = _WORDS[lang]
    charset = "utf-8" if rng.random() < 0.8 else "iso-8859-1"
    malformed = rng.random() < 0.08
    r = rng.random()
    n_paras = rng.randint(80, 200) if r < 0.02 else rng.randint(3, 24)

    title = _sentence(rng, words, 4, 9)[:-1]
    body: list[str] = [f"<h1>{title}</h1>"]
    for p in range(n_paras):
        if p > 0 and rng.random() < 0.22:
            lvl = rng.randint(2, 4)  # h4 exercises the <=3 clamp
            body.append(f"<h{lvl}>{_sentence(rng, words, 3, 7)[:-1]}</h{lvl}>")
        para = _paragraph(rng, words)
        if rng.random() < 0.25:  # inline link inside the paragraph
            para += f' See <a href="/ref/{p}">{rng.choice(words)} {rng.choice(words)}</a> {rng.choice(words)}.'
        body.append(f"<p>{para}</p>")
        if rng.random() < 0.10:
            body.append(_table_html(rng, words))
        if rng.random() < 0.12:
            body.append(_list_html(rng, words))
        if rng.random() < 0.06:
            body.append(f'<img src="/img/{p}.jpg" alt="{_sentence(rng, words, 3, 6)[:-1]}">')
        if rng.random() < 0.08:
            body.append(f"<blockquote>{_sentence(rng, words, 8, 16)}</blockquote>")

    article = "\n".join(body)
    if malformed:
        # unclosed <p>, stray '<', mismatched end tag — recovery must be deterministic
        article += f"\n<p>{_sentence(rng, words)}\n<span>stray < char</div>"

    footer_links = "".join(f'<a href="/f/{i}">{w}</a> · '
                           for i, w in enumerate(rng.sample(_NAV_ITEMS, 4)))
    html = f"""<!DOCTYPE html>
<html lang="{lang}">
<head>
<meta charset="{charset}">
<title>{title}</title>
<script>var t = {rng.randint(1, 10**6)}; console.log("<p>not content</p>");</script>
<style>.main-nav {{ color: #333; }}</style>
</head>
<body>
<header class="masthead"><div class="logo">Example Site</div>{_nav_html(rng)}</header>
<div class="breadcrumb"><a href="/">Home</a> &raquo; <a href="/cat">Category</a></div>
<div class="layout">
<main class="article-content">
<article>
{article}
</article>
</main>
{_sidebar_html(rng, words)}
</div>
<footer class="site-footer"><p>{footer_links}&copy; 2026 Example Site. All rights reserved.</p></footer>
</body>
</html>"""
    return html.encode(charset, errors="replace")


# --------------------------------------------------------------------------
# PDF generation (subset the kernel's pdf_text parser supports)
# --------------------------------------------------------------------------

def _pdf_escape(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def _pdf_table(rng: random.Random, words: list[str]) -> list[str]:
    """x-aligned cell grid via relative Td moves (one Tj per cell) — the
    shape kernel/pdf_text detects as a table."""
    ncols = rng.randint(2, 4)
    nrows = rng.randint(3, 5)
    col_w = 130
    out: list[str] = []
    for r in range(nrows):
        for c in range(ncols):
            cell = (rng.choice(words).capitalize() if r == 0
                    else f"{rng.choice(words)} {rng.randint(1, 999)}")
            out.append(f"({_pdf_escape(cell)}) Tj")
            if c < ncols - 1:
                out.append(f"{col_w} 0 Td")
        out.append(f"{-col_w * (ncols - 1)} -16 Td")
    out.append("0 -12 Td")
    return out


def _pdf_page_stream(rng: random.Random, words: list[str], title: str | None) -> bytes:
    lines: list[str] = ["BT", "/F1 11 Tf", "14 TL", "1 0 0 1 72 760 Tm"]
    if title:
        lines += ["/F1 20 Tf", f"({_pdf_escape(title)}) Tj", "/F1 11 Tf",
                  "0 -28 Td"]
    n_blocks = rng.randint(2, 6)
    for b in range(n_blocks):
        if b and rng.random() < 0.5:
            lines += ["/F1 15 Tf",
                      f"({_pdf_escape(_sentence(rng, words, 3, 6)[:-1])}) Tj",
                      "/F1 11 Tf", "0 -24 Td"]
        n_lines = rng.randint(2, 7)
        for i in range(n_lines):
            txt = _pdf_escape(_sentence(rng, words, 5, 10))
            if rng.random() < 0.3:
                lines.append(f"[({txt}) -200 ({_pdf_escape(rng.choice(words))})] TJ")
            else:
                lines.append(f"({txt}) Tj")
            lines.append("T*")
        if rng.random() < 0.3:
            lines += _pdf_table(rng, words)
        lines.append("0 -10 Td")
    lines.append("ET")
    return "\n".join(lines).encode("latin-1")


def make_pdf(url: str, rng: random.Random, lang: str) -> bytes:
    words = _WORDS[lang]
    n_pages = rng.randint(1, 3)
    compress = rng.random() < 0.5
    objs: list[bytes] = []

    page_ids = [4 + 2 * i for i in range(n_pages)]
    kids = " ".join(f"{pid} 0 R" for pid in page_ids)
    objs.append(b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    objs.append(f"2 0 obj\n<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>\nendobj\n".encode())
    objs.append(b"3 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>\nendobj\n")
    for i, pid in enumerate(page_ids):
        title = _sentence(rng, words, 4, 8)[:-1] if i == 0 else None
        data = _pdf_page_stream(rng, words, title)
        filt = b""
        if compress:
            data = zlib.compress(data)
            filt = b"/Filter /FlateDecode "
        objs.append(
            f"{pid} 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            f"/Resources << /Font << /F1 3 0 R >> >> /Contents {pid + 1} 0 R >>\nendobj\n".encode()
        )
        objs.append(
            f"{pid + 1} 0 obj\n<< {filt.decode()}/Length {len(data)} >>\nstream\n".encode()
            + data + b"\nendstream\nendobj\n"
        )

    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for o in objs:
        offsets.append(len(out))
        out += o
    xref_pos = len(out)
    nobj = len(objs) + 1
    out += f"xref\n0 {nobj}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (f"trailer\n<< /Size {nobj} /Root 1 0 R >>\nstartxref\n{xref_pos}\n%%EOF\n").encode()
    return bytes(out)


# --------------------------------------------------------------------------
# record assembly + parquet writer
# --------------------------------------------------------------------------

_EPOCH = datetime(2025, 1, 1, tzinfo=timezone.utc)
_TAG_STRIP_RE = None  # lazy


def naive_text(html_bytes: bytes) -> str | None:
    """Naive tag strip for the pre-extraction `text` column (may be None)."""
    global _TAG_STRIP_RE
    import re
    if _TAG_STRIP_RE is None:
        _TAG_STRIP_RE = re.compile(r"<[^>]*>")
    try:
        s = html_bytes.decode("utf-8", errors="replace")
    except Exception:
        return None
    return " ".join(_TAG_STRIP_RE.sub(" ", s).split())[:20000]


@dataclass
class PageRecord:
    url: str
    warc_ts: datetime
    html: bytes
    text: str | None
    lang: str
    bucket: int


def make_page(url: str, n_buckets: int = N_BUCKETS_DEFAULT) -> PageRecord:
    seed = url_seed(url)
    rng = random.Random(seed)
    lang = LANGS[seed % len(LANGS)]
    is_pdf = rng.random() < 0.10
    payload = make_pdf(url, rng, lang) if is_pdf else make_html(url, rng, lang)
    ts = _EPOCH + timedelta(seconds=seed % (365 * 24 * 3600))
    text = None
    if not is_pdf and rng.random() < 0.85:
        text = naive_text(payload)
    return PageRecord(
        url=url, warc_ts=ts, html=payload, text=text, lang=lang,
        bucket=crc32(url.encode("utf-8")) % n_buckets,
    )


def write_corpus(out_dir: str, n_docs: int, n_buckets: int = N_BUCKETS_DEFAULT) -> None:
    """Write the pages table as bucket-partitioned parquet (Iceberg-emulated
    layout: explicit url-hash bucketed partitioning per the north rule)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from collections import defaultdict
    import os

    urls = gen_urls(n_docs)
    if n_docs >= PARALLEL_THRESHOLD:
        # parallel generation — order-independent since records are a pure
        # function of url and get sorted per bucket before writing
        from functools import partial
        from multiprocessing import Pool

        with Pool(min(16, os.cpu_count() or 4)) as pool:
            recs = pool.map(partial(make_page, n_buckets=n_buckets), urls,
                            chunksize=256)
    else:
        recs = [make_page(u, n_buckets) for u in urls]
    by_bucket: dict[int, list[PageRecord]] = defaultdict(list)
    for rec in recs:
        by_bucket[rec.bucket].append(rec)

    schema = pa.schema([
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us", tz="UTC")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ])
    for bucket, recs in sorted(by_bucket.items()):
        recs.sort(key=lambda r: r.url)
        tbl = pa.Table.from_pydict({
            "url": [r.url for r in recs],
            "warc_ts": [r.warc_ts for r in recs],
            "html": [r.html for r in recs],
            "text": [r.text for r in recs],
            "lang": [r.lang for r in recs],
        }, schema=schema)
        d = os.path.join(out_dir, f"bucket={bucket}")
        os.makedirs(d, exist_ok=True)
        pq.write_table(tbl, os.path.join(d, "part-0.parquet"))


def ensure_corpus(out_dir: str, n_docs: int, n_buckets: int = N_BUCKETS_DEFAULT) -> str:
    """Idempotent: write the corpus if absent, return out_dir."""
    import os
    marker = os.path.join(out_dir, "_SUCCESS")
    if not os.path.exists(marker):
        write_corpus(out_dir, n_docs, n_buckets)
        with open(marker, "w") as f:
            f.write(f"n_docs={n_docs} n_buckets={n_buckets}\n")
    return out_dir


if __name__ == "__main__":
    import sys
    out = sys.argv[1] if len(sys.argv) > 1 else "data/pages"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 500
    ensure_corpus(out, n)
    print(f"wrote {n} pages to {out}")
