"""Deterministic text extraction + tokenization.

This module is the single source of truth for the per-row text invariant
(BASELINE.json input_hint: "byte-identical extracted text per url vs the
reference"). Both the single-process pytest oracle (tests/oracle.py) and the
Spark Arrow UDFs (build.py) import THESE functions, so byte-identity holds by
construction — mirroring the reference's pure per-row extraction
(reference: src/nmr_FAIR_DOs/repositories/chemotion.py:305-382 and
nmrxiv.py:322-470 are pure dict->record transforms; our html->text is the
analogue).

Tokenizer semantics: the reference indexes into a mapping-less Elasticsearch
index (src/nmr_FAIR_DOs/connectors/elasticsearch.py:169-173), so every text
field gets the *standard analyzer*: UAX#29 word segmentation + lowercasing,
no stopwords, no stemming. We approximate UAX#29 word breaks with a unicode
alnum regex (letters+digits, underscore excluded) — exact for the synthetic
corpora used here and for the vast majority of web text; the known deviations
(intra-word apostrophes, hyphenated compounds) are documented in tests.

Everything here is pure, deterministic, RNG-free and time-free (the reference
violates purity only on its error paths, lib.py:330 — we avoid that).
"""

from __future__ import annotations

import html as _htmlmod
import re

# --- tokenization ----------------------------------------------------------

# Unicode alphanumerics, underscore excluded (UAX#29-style word chars).
_TOKEN_RE = re.compile(r"[^\W_]+", re.UNICODE)

# HTML structure handling for extract_text:
#  - script/style/head subtree content must not leak into text
#  - block-level tags act as whitespace boundaries; inline tags vanish
_DROP_SUBTREE_RE = re.compile(
    r"<(script|style|head|noscript)\b[^>]*>.*?</\1\s*>",
    re.IGNORECASE | re.DOTALL,
)
_COMMENT_RE = re.compile(r"<!--.*?-->", re.DOTALL)
_TAG_RE = re.compile(r"<[^>]*>")
_WS_RE = re.compile(r"\s+")


def tokenize(text: str) -> list[str]:
    """Standard-analyzer-style tokenization: lowercase + unicode word split.

    >>> tokenize("Hello, World! x2")
    ['hello', 'world', 'x2']
    """
    if not text:
        return []
    return _TOKEN_RE.findall(text.lower())


def extract_text(html: bytes | str | None) -> str:
    """Extract visible body text from an HTML page, deterministically.

    Rules (fixed; the whole engine and the oracle share this function):
      1. decode UTF-8 (replacement on invalid bytes),
      2. drop comments and script/style/head/noscript subtrees,
      3. keep <body> content when a body tag exists, else the whole doc,
      4. strip remaining tags (tags act as separators), unescape entities,
      5. collapse whitespace runs to single spaces, strip ends.

    For the synthetic fixture skeleton
    ``<html><head><title>..</title></head><body><p>TEXT</p></body></html>``
    this returns exactly ``TEXT`` (FIXTURES.md §1 invariant).
    """
    if html is None:
        return ""
    if isinstance(html, (bytes, bytearray, memoryview)):
        doc = bytes(html).decode("utf-8", errors="replace")
    else:
        doc = html
    if not doc:
        return ""
    doc = _COMMENT_RE.sub(" ", doc)
    doc = _DROP_SUBTREE_RE.sub(" ", doc)
    m = re.search(r"<body[^>]*>(.*?)(?:</body\s*>|\Z)", doc, re.IGNORECASE | re.DOTALL)
    if m:
        doc = m.group(1)
    doc = _TAG_RE.sub(" ", doc)
    doc = _htmlmod.unescape(doc)
    return _WS_RE.sub(" ", doc).strip()


def extract_and_tokenize(html: bytes | str | None) -> list[str]:
    """Fused extract+tokenize (one pass per row in the build UDF)."""
    return tokenize(extract_text(html))
