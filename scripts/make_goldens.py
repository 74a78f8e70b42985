"""Generate golden extraction fixtures from the standalone kernel.

The kernel IS the reference parser whose output the distributed pipeline
must match byte-identically per url (north rule; FIXTURES.md §2). Run once,
commit the output; regenerate only on an intentional kernel change (and bump
EXTRACTOR_VERSION).

Usage: python scripts/make_goldens.py [n_urls]
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from docvision_spark import EXTRACTOR_VERSION            # noqa: E402
from docvision_spark.corpus import gen_urls, make_page   # noqa: E402
from docvision_spark.kernel.extract import extract       # noqa: E402

N_FULL_TEXT = 12  # first N urls keep full text/markdown for direct diffing


def main(n: int = 120) -> None:
    out_dir = os.path.join(REPO, "tests", "fixtures")
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "golden.jsonl")
    with open(path, "w", encoding="utf-8") as f:
        f.write(json.dumps({"_meta": {"extractor_version": EXTRACTOR_VERSION,
                                      "n_urls": n}}) + "\n")
        for i, url in enumerate(gen_urls(n)):
            rec = make_page(url)
            r = extract(url, rec.html)
            row = {
                "url": url,
                "id": r.id,
                "text_sha256": hashlib.sha256(r.text.encode()).hexdigest(),
                "md_sha256": hashlib.sha256(r.markdown.encode()).hexdigest(),
                "n_spans": len(r.spans),
                "page_count": r.page_count,
                "mode": r.processing_mode,
                "error": r.error,
            }
            if i < N_FULL_TEXT:
                row["text"] = r.text
                row["markdown"] = r.markdown
                row["spans"] = r.spans
            f.write(json.dumps(row, ensure_ascii=False) + "\n")
    print(f"wrote {n} goldens to {path}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 120)
