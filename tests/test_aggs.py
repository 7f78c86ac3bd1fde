"""ES-style aggregations from the native index (webindex.aggs): the
constant-score match filter, terms agg, and histogram agg, checked against
naive recomputation from the raw token streams.

reference: src/nmr_FAIR_DOs/connectors/elasticsearch.py:250-306 (the ES
backend serves filter/aggregation reads over the same index)."""

from collections import Counter

import numpy as np
import pytest

from webindex.aggs import histogram_agg, matching_doc_ids, terms_agg
from webindex.build import build_index
from webindex.pagesgen import make_pages_pdf
from webindex.textproc import tokenize

N_DOCS = 200
LANGS = ["en", "de", "fr"]


@pytest.fixture(scope="module")
def corpus():
    pdf = make_pages_pdf(0, N_DOCS)
    pdf.insert(0, "doc_id", np.arange(N_DOCS, dtype=np.int64))
    pdf["lang"] = [LANGS[i % 3] for i in range(N_DOCS)]
    pdf["n_chars"] = pdf["text"].str.len().astype(np.int64)
    return pdf


@pytest.fixture(scope="module")
def idx(spark, corpus):
    return build_index(
        spark, spark.createDataFrame(corpus), text_col="text",
        doc_id_method="provided", range_width=32,
    )


@pytest.fixture(scope="module")
def stored(spark, corpus):
    return spark.createDataFrame(corpus[["doc_id", "lang", "n_chars"]])


def _matching(corpus, terms, msm=1):
    out = set()
    for i in range(N_DOCS):
        toks = set(tokenize(corpus["text"][i]))
        if len(toks & set(terms)) >= msm:
            out.add(i)
    return out


@pytest.mark.parametrize("query,msm", [("data merge", 1), ("data merge scan", 2)])
def test_matching_doc_ids(idx, corpus, query, msm):
    got = {r["doc_id"] for r in matching_doc_ids(idx, query, msm).collect()}
    assert got == _matching(corpus, tokenize(query), msm)
    # globally unique without a distinct: collect returns no duplicates
    rows = [r["doc_id"] for r in matching_doc_ids(idx, query, msm).collect()]
    assert len(rows) == len(set(rows))


def test_matching_absent_term_empty(idx):
    assert matching_doc_ids(idx, "zzqqxxunseen").count() == 0


def test_terms_agg(idx, stored, corpus):
    got = [
        (r["lang"], r["doc_count"])
        for r in terms_agg(idx, stored, "data merge", "lang", size=10).collect()
    ]
    match = _matching(corpus, ["data", "merge"])
    want = Counter(corpus["lang"][i] for i in match)
    assert got == sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))


def test_terms_agg_size_cuts(idx, stored):
    assert len(terms_agg(idx, stored, "the", "lang", size=2).collect()) == 2


def test_significant_terms(idx, corpus):
    """JLH scores vs naive recomputation from the token streams."""
    from webindex.aggs import significant_terms

    query, terms = "w150", ["w150"]
    match = _matching(corpus, terms)
    assert match
    fg_size = len(match)
    n_docs = N_DOCS
    # naive: per-term fg_count over matching docs' token sets
    fg = Counter()
    df = Counter()
    for i in range(N_DOCS):
        toks = set(tokenize(corpus["text"][i]))
        for t in toks:
            df[t] += 1
            if i in match:
                fg[t] += 1
    want = []
    for t, c in fg.items():
        if t in terms or c < 3:
            continue
        fgp = c / float(fg_size)
        bgp = df[t] / float(n_docs)
        want.append((t, c, (fgp - bgp) * (fgp / bgp)))
    want.sort(key=lambda r: (-r[2], r[0]))
    got = [
        (r["term"], r["fg_count"], round(r["score"], 9))
        for r in significant_terms(idx, query, size=10).collect()
    ]
    assert got == [(t, c, round(s, 9)) for t, c, s in want[:10]]


def test_significant_terms_empty_query(idx):
    from webindex.aggs import significant_terms

    assert significant_terms(idx, "zzqqxxunseen").count() == 0


def test_histogram_agg(idx, stored, corpus):
    got = [
        (r["bucket"], r["doc_count"])
        for r in histogram_agg(
            idx, stored, "data merge", "n_chars", interval=100
        ).collect()
    ]
    match = _matching(corpus, ["data", "merge"])
    want = Counter((int(corpus["n_chars"][i]) // 100) * 100 for i in match)
    assert got == sorted(want.items())
    # empty buckets omitted (min_doc_count=1)
    assert all(c > 0 for _, c in got)
