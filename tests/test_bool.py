"""ES `bool` compound queries (webindex.query.topk_bool) against the
pure-python oracle: must / should / must_not / filter_ roles, Lucene
absence semantics, and the required-coverage metadata prune.

The reference's ES backend serves compound bool queries over the same
mapping-less index as the match family (reference:
src/nmr_FAIR_DOs/connectors/elasticsearch.py:169-173, :250-262)."""

import numpy as np
import pytest

from webindex.build import build_index
from webindex.oracle import OracleIndex
from webindex.pagesgen import make_pages_pdf
from webindex.query import topk_bool, topk_wand

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


def _want(oracle, **kw):
    return [(d, round(s, 9)) for d, s in oracle.topk_bool(k=10, **kw)]


CASES = [
    dict(must="data", should="merge batch"),
    dict(must="data merge", must_not="w150"),
    dict(must="data", filter_="the"),
    dict(should="data merge scan", minimum_should_match=2),
    dict(must="data", should="merge batch", must_not="w150", filter_="the"),
    dict(filter_="data merge"),  # filter-only: all scores 0.0, doc_id order
    dict(should="data merge w150"),
]


@pytest.mark.parametrize("case", CASES)
def test_bool_vs_oracle(idx, oracle, case):
    got = _rows(topk_bool(idx, k=10, **case))
    assert got == _want(oracle, **case)


def test_bool_semantics_spot_check(idx, oracle):
    """Hits genuinely satisfy every clause, straight from the token streams."""
    got = _rows(
        topk_bool(idx, must="data", should="merge", must_not="w150", k=10)
    )
    assert got  # fixture guarantees matches
    for doc_id, _ in got:
        toks = set(oracle._toks[doc_id])
        assert "data" in toks and "w150" not in toks


def test_bool_filter_does_not_score(idx, oracle):
    """Same docs with/without the filter clause keep identical scores: a
    filter restricts the doc set but never contributes to the score."""
    plain = dict(_rows(topk_bool(idx, must="data merge", k=50)))
    filtered = _rows(topk_bool(idx, must="data merge", filter_="the", k=50))
    assert filtered
    for doc_id, score in filtered:
        assert plain[doc_id] == score


def test_bool_must_only_equals_match_and(idx):
    """must-only bool == match operator=and == every-term-required WAND."""
    from webindex.query import topk_match

    assert _rows(topk_bool(idx, must="data merge", k=10)) == _rows(
        topk_match(idx, "data merge", 10, operator="and")
    )


def test_bool_should_only_equals_wand(idx):
    assert _rows(topk_bool(idx, should="data merge", k=10)) == _rows(
        topk_wand(idx, "data merge", 10)
    )


def test_bool_absence_semantics(idx):
    # absent must/filter term -> unsatisfiable
    assert _rows(topk_bool(idx, must="data zzqqxxunseen", k=10)) == []
    assert _rows(topk_bool(idx, must="data", filter_="zzqqxxunseen", k=10)) == []
    # absent must_not term -> ignored
    assert _rows(topk_bool(idx, must="data", must_not="zzqqxxunseen", k=10)) == _rows(
        topk_bool(idx, must="data", k=10)
    )
    # msm above the PRESENT should-term count -> empty
    assert (
        _rows(
            topk_bool(
                idx, should="data zzqqxxunseen", minimum_should_match=2, k=10
            )
        )
        == []
    )
    # required term that is also excluded -> contradiction
    assert _rows(topk_bool(idx, must="data", must_not="data", k=10)) == []


def test_bool_empty_query(idx):
    assert _rows(topk_bool(idx, k=10)) == []
    # must_not-only is NOT empty: pure filter context = match_all minus the
    # excluded docs (see test_bool_must_not_only_returns_complement)
    hits = topk_bool(idx, must_not="data", k=N_DOCS).collect()
    assert hits and all(r["score"] == 0.0 for r in hits)


def test_bool_must_not_only_returns_complement(idx, oracle):
    """ES bool with ONLY must_not clauses is pure filter context:
    match_all minus the excluded docs, score 0.0, doc_id asc."""
    from webindex.textproc import tokenize

    pdf = make_pages_pdf(0, N_DOCS)
    excluded = {
        i for i in range(N_DOCS) if "w042" in tokenize(pdf["text"][i])
    }
    assert excluded  # fixture sanity
    rows = topk_bool(idx, must_not="w042", k=N_DOCS).collect()
    got = [(r["doc_id"], r["score"]) for r in rows]
    want = [(d, 0.0) for d in range(N_DOCS) if d not in excluded]
    assert got == want
    # absent must_not term: complement = every doc
    assert topk_bool(idx, must_not="zzzzabsent", k=N_DOCS).count() == N_DOCS
