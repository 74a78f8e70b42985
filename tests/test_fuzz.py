"""Property-based robustness: the kernel is total and structurally sound on
ARBITRARY bytes (at 10^12 docs, every byte sequence on the web will arrive
eventually). No Spark needed — pure kernel properties.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from docvision_spark.kernel.extract import extract

html_ish = st.one_of(
    st.binary(max_size=4096),
    st.text(max_size=2048).map(lambda s: s.encode("utf-8", "replace")),
    st.builds(
        lambda parts: b"".join(parts),
        st.lists(st.sampled_from([
            b"<p>", b"</p>", b"<div class='nav'>", b"</div>", b"<a href='x'>",
            b"</a>", b"<table><tr><td>", b"</td></tr></table>", b"<h2>",
            b"</h2>", b"<script>var x='<p>';</script>", b"<!-- c -->",
            b"text content here ", b"&amp;&bogus;&#65;&#xZZ;", b"<",
            b">", b"\xff\xfe", b"<li>", b"%PDF-", b"<meta charset='latin-1'>",
            b"<pre>raw\n block</pre>", b"<img alt='fig'>",
        ]), max_size=60),
    ),
)


@settings(max_examples=300, deadline=None)
@given(payload=html_ish)
def test_kernel_total_and_sound(payload):
    r = extract("https://fuzz.example/x", payload)
    r2 = extract("https://fuzz.example/x", payload)
    # total: never raises; deterministic: identical on repeat
    assert (r.text, r.markdown, r.spans, r.id, r.error) == \
           (r2.text, r2.markdown, r2.spans, r2.id, r2.error)
    if r.error is None:
        # spans index into text, ordered, non-overlapping
        prev_end = 0
        for (bid, kind, s, e) in r.spans:
            assert 0 <= s <= e <= len(r.text)
            assert s >= prev_end
            prev_end = e
            assert kind in {"heading", "paragraph", "list_item", "table", "caption"}
        assert len(r.id) == 64


@settings(max_examples=100, deadline=None)
@given(payload=st.binary(min_size=5, max_size=2048).map(lambda b: b"%PDF-" + b))
def test_pdf_path_total(payload):
    r = extract("https://fuzz.example/pdf", payload)
    assert r.processing_mode in ("pdf", "")
    if r.error is None:
        for (bid, kind, s, e) in r.spans:
            assert 0 <= s <= e <= len(r.text)
