"""ES search_after pagination (webindex.query.topk_after) vs the
pure-python oracle: page walking reconstructs the full ranked list exactly,
cursors are strict, and past-the-end pages are empty.

reference: src/nmr_FAIR_DOs/connectors/elasticsearch.py:250-306 (the
reference pages its category scans with search_after over sorted hits)."""

import numpy as np
import pytest

from webindex.build import build_index
from webindex.oracle import OracleIndex
from webindex.pagesgen import make_pages_pdf
from webindex.query import topk_after, topk_wand

N_DOCS = 200


@pytest.fixture(scope="module")
def idx(spark):
    pdf = make_pages_pdf(0, N_DOCS)
    pdf.insert(0, "doc_id", np.arange(N_DOCS, dtype=np.int64))
    return build_index(
        spark, spark.createDataFrame(pdf), text_col="text",
        doc_id_method="provided", range_width=32,
    )


@pytest.fixture(scope="module")
def oracle():
    pdf = make_pages_pdf(0, N_DOCS)
    return OracleIndex({i: pdf["text"][i] for i in range(N_DOCS)})


def _rows(df):
    return [(r["doc_id"], round(r["score"], 9)) for r in df.collect()]


def test_page_walk_reconstructs_ranked_list(idx, oracle):
    """Walking pages of 7 with the engine's own cursors reproduces the
    oracle's full ranked list, with no gaps, dups, or reorders."""
    query = "the data"
    ranked = sorted(oracle.score_all(query).items(), key=lambda kv: (-kv[1], kv[0]))
    want = [(d, round(s, 9)) for d, s in ranked]

    got, cursor = [], None
    while True:
        page = topk_after(idx, query, 7, after=cursor)
        rows = page.collect()
        if not rows:
            break
        got.extend((r["doc_id"], round(r["score"], 9)) for r in rows)
        last = rows[-1]
        cursor = (last["score"], last["doc_id"])
    assert got == want


def test_page2_vs_oracle_cursor(idx, oracle):
    query = "data merge"
    p1 = topk_wand(idx, query, 10).collect()
    cursor = (p1[-1]["score"], p1[-1]["doc_id"])
    got = _rows(topk_after(idx, query, 10, after=cursor))
    want = [(d, round(s, 9)) for d, s in oracle.topk_after(query, 10, cursor)]
    assert got == want
    # strictness: no page-1 doc reappears
    assert not ({d for d, _ in got} & {r["doc_id"] for r in p1})


def test_no_cursor_is_page1(idx):
    assert _rows(topk_after(idx, "data merge", 10)) == _rows(
        topk_wand(idx, "data merge", 10)
    )


def test_past_the_end_empty(idx):
    assert _rows(topk_after(idx, "data merge", 10, after=(-1.0, 1 << 60))) == []


def test_absent_term_empty(idx):
    assert _rows(topk_after(idx, "zzqqxxunseen", 10, after=(1.0, 0))) == []
