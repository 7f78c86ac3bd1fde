"""Highlight anchors from the positional index (webindex.query.highlight_topk)
vs the pure-python oracle: rarest-present-term pick, first-occurrence
positions, and the non-positional-index guard."""

import numpy as np
import pytest

from webindex.build import build_index
from webindex.oracle import OracleIndex
from webindex.pagesgen import make_pages_pdf
from webindex.query import highlight_topk

N_DOCS = 200


@pytest.fixture(scope="module")
def idx(spark):
    pdf = make_pages_pdf(0, N_DOCS)
    pdf.insert(0, "doc_id", np.arange(N_DOCS, dtype=np.int64))
    return build_index(
        spark, spark.createDataFrame(pdf), text_col="text",
        doc_id_method="provided", range_width=32, positions=True,
    )


@pytest.fixture(scope="module")
def oracle():
    pdf = make_pages_pdf(0, N_DOCS)
    return OracleIndex({i: pdf["text"][i] for i in range(N_DOCS)})


def _rows(df):
    return [
        (r["doc_id"], round(r["score"], 9), r["hl_term"], r["hl_pos"])
        for r in df.collect()
    ]


@pytest.mark.parametrize("query", ["data merge", "the w150", "data merge scan the"])
def test_highlight_vs_oracle(idx, oracle, query):
    want = [(d, round(s, 9), t, p) for d, s, t, p in oracle.highlight_topk(query, 10)]
    assert _rows(highlight_topk(idx, query, 10)) == want


def test_highlight_semantics(idx, oracle):
    """The anchor genuinely is the first occurrence of a present query term,
    straight from the token stream."""
    for doc_id, _, term, pos in _rows(highlight_topk(idx, "data merge", 10)):
        toks = oracle._toks[doc_id]
        assert toks[pos] == term
        assert term not in toks[:pos]


def test_highlight_absent_query_empty(idx):
    assert _rows(highlight_topk(idx, "zzqqxxunseen", 10)) == []


def test_highlight_requires_positions(spark):
    pdf = make_pages_pdf(0, 20)
    pdf.insert(0, "doc_id", np.arange(20, dtype=np.int64))
    flat = build_index(
        spark, spark.createDataFrame(pdf), text_col="text",
        doc_id_method="provided", range_width=32,
    )
    with pytest.raises(ValueError, match="positional"):
        highlight_topk(flat, "data", 5)
