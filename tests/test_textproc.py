"""textproc unit tests: tokenizer golden cases + extraction byte-identity
(SURVEY.md §5.2; invariant from BASELINE.json input_hint)."""

import numpy as np

from webindex.pagesgen import make_page
from webindex.textproc import extract_and_tokenize, extract_text, tokenize


def test_tokenize_golden():
    assert tokenize("Hello, World!") == ["hello", "world"]
    assert tokenize("The QUICK brown_fox x2 3.14") == [
        "the", "quick", "brown", "fox", "x2", "3", "14",
    ]
    assert tokenize("") == []
    assert tokenize("   \t\n ") == []
    assert tokenize("über Köln straße") == ["über", "köln", "straße"]
    assert tokenize("a—b… c") == ["a", "b", "c"]
    # case variant queries analyze identically (analyzer test, FIXTURES §2e)
    assert tokenize("SPARK") == tokenize("spark")


def test_extract_text_fixture_skeleton():
    # the FIXTURES.md §1 invariant: extract_text(html) == text exactly
    for i in (0, 1, 17, 999):
        page = make_page(i)
        assert extract_text(page["html"]) == page["text"]


def test_extract_text_general_html():
    html = (
        b"<html><head><title>Skip me</title><style>p{color:red}</style></head>"
        b"<body><h1>A Title</h1><p>Hello &amp; goodbye</p>"
        b"<script>var x = 'noise';</script><div>end</div></body></html>"
    )
    assert extract_text(html) == "A Title Hello & goodbye end"


def test_extract_text_edges():
    assert extract_text(None) == ""
    assert extract_text(b"") == ""
    assert extract_text(b"plain text no tags") == "plain text no tags"
    assert extract_text("<body><p>str input</p></body>") == "str input"
    # invalid utf-8 is replaced, never raises
    assert "abc" in extract_text(b"<body>abc\xff\xfe</body>")


def test_extraction_pure_and_idempotent():
    page = make_page(42)
    outs = {extract_text(page["html"]) for _ in range(5)}
    assert len(outs) == 1
    assert extract_and_tokenize(page["html"]) == tokenize(page["text"])


def test_pagesgen_deterministic():
    a, b = make_page(7), make_page(7)
    assert a == b
    # doc lengths in [20, 200]
    lens = [len(make_page(i)["text"].split()) for i in range(50)]
    assert min(lens) >= 20 and max(lens) <= 200
    # Zipf head term is hot
    texts = " ".join(make_page(i)["text"] for i in range(200))
    counts = {w: texts.split().count(w) for w in ("the", "w199")}
    assert counts["the"] > 20 * max(1, counts["w199"])
