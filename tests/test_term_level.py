"""Term-level (dictionary-expanded) queries: ES `prefix` (constant-score)
and `fuzzy` (Levenshtein expansion, dis_max scoring) vs the pure-python
oracle.

reference: src/nmr_FAIR_DOs/connectors/elasticsearch.py:250-262 (the same
mapping-less index serves ES's term-level query family)."""

import numpy as np
import pytest

from webindex.build import build_index
from webindex.oracle import OracleIndex
from webindex.pagesgen import make_pages_pdf
from webindex.query import topk_fuzzy, topk_prefix, topk_wand

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


@pytest.mark.parametrize("prefix", ["mer", "w15", "d"])
def test_prefix_vs_oracle(idx, oracle, prefix):
    want = oracle.topk_prefix(prefix, 10)
    assert _rows(topk_prefix(idx, prefix, 10)) == want
    # semantic: each hit genuinely contains a term with the prefix
    for doc_id, score in want:
        assert score == 1.0
        assert any(t.startswith(prefix) for t in oracle._toks[doc_id])


def test_prefix_max_expansions(idx, oracle):
    capped = _rows(topk_prefix(idx, "w", 200, max_expansions=3))
    assert capped == oracle.topk_prefix("w", 200, max_expansions=3)
    full = _rows(topk_prefix(idx, "w", 200))
    assert {d for d, _ in capped} <= {d for d, _ in full}


def test_prefix_no_match_empty(idx):
    assert _rows(topk_prefix(idx, "zzqq", 10)) == []


@pytest.mark.parametrize("word", ["merge", "w150", "data"])
def test_fuzzy_vs_oracle(idx, oracle, word):
    want = [(d, round(s, 9)) for d, s in oracle.topk_fuzzy(word, 10)]
    assert _rows(topk_fuzzy(idx, word, 10)) == want


def test_fuzzy_expansion_bites(idx, oracle):
    """fuzziness=1 on a tail term matches sibling tail terms (w150 -> w151,
    w110, ...): the fuzzy result covers docs the exact query misses."""
    exact = {d for d, _ in _rows(topk_wand(idx, "w150", 200))}
    fuzzy = {d for d, _ in _rows(topk_fuzzy(idx, "w150", 200, max_expansions=500))}
    assert exact <= fuzzy
    assert len(fuzzy) > len(exact)


def test_fuzzy_no_match_empty(idx):
    assert _rows(topk_fuzzy(idx, "zzqqxxunseen", 10)) == []


@pytest.mark.parametrize("pattern", ["w1*", "me?ge", "*ata", "w?5*"])
def test_wildcard_vs_oracle(idx, oracle, pattern):
    from webindex.query import topk_wildcard

    want = oracle.topk_wildcard(pattern, 10)
    assert _rows(topk_wildcard(idx, pattern, 10)) == want


def test_wildcard_capped_and_empty(idx, oracle):
    from webindex.query import topk_wildcard

    capped = _rows(topk_wildcard(idx, "w*", 200, max_expansions=3))
    assert capped == oracle.topk_wildcard("w*", 200, max_expansions=3)
    assert _rows(topk_wildcard(idx, "zzqq*", 10)) == []


@pytest.mark.parametrize("doc,kw", [
    (0, {}),
    (7, {"max_query_terms": 3}),
    (42, {"min_doc_freq": 5, "max_query_terms": 10}),
])
def test_more_like_this_vs_oracle(idx, oracle, doc, kw):
    from webindex.query import more_like_this

    like = " ".join(oracle._toks[doc])
    want = [(d, round(s, 9)) for d, s in oracle.more_like_this(like, 10, **kw)]
    got = _rows(more_like_this(idx, like, 10, **kw))
    assert got == want
    # the source doc itself is a strong match and surfaces
    assert doc in {d for d, _ in got}


def test_more_like_this_empty(idx):
    from webindex.query import more_like_this

    assert _rows(more_like_this(idx, "", 10)) == []
    assert _rows(more_like_this(idx, "zzqq yyxx", 10)) == []


@pytest.fixture(scope="module")
def idx_pos(spark):
    pdf = make_pages_pdf(0, N_DOCS)
    pdf.insert(0, "doc_id", np.arange(N_DOCS, dtype=np.int64))
    return build_index(
        spark, spark.createDataFrame(pdf), text_col="text",
        doc_id_method="provided", range_width=32, positions=True,
    )


@pytest.mark.parametrize("phrase,kw", [
    ("the d", {}),
    ("data m", {}),
    ("the da", {"max_expansions": 2}),
    ("the w1", {"slop": 1}),
])
def test_phrase_prefix_vs_oracle(idx_pos, oracle, phrase, kw):
    from webindex.query import topk_phrase_prefix

    want = [(d, round(s, 9)) for d, s in oracle.topk_phrase_prefix(phrase, 10, **kw)]
    assert _rows(topk_phrase_prefix(idx_pos, phrase, 10, **kw)) == want


def test_phrase_prefix_no_expansion_empty(idx_pos):
    from webindex.query import topk_phrase_prefix

    assert _rows(topk_phrase_prefix(idx_pos, "the zzqq", 10)) == []


def test_match_bool_prefix(idx, oracle):
    from webindex.query import topk_match_bool_prefix
    from webindex.textproc import tokenize

    pdf = make_pages_pdf(0, N_DOCS)
    toks = {i: tokenize(pdf["text"][i]) for i in range(N_DOCS)}
    for q, init_terms, pre in [
        ("data merge sp", ["data", "merge"], "sp"),
        ("th", [], "th"),
    ]:
        base = oracle.score_all(" ".join(init_terms)) if init_terms else {}
        pdocs = {d for d, v in toks.items() if any(t.startswith(pre) for t in v)}
        want_scores = {}
        for d in set(base) | pdocs:
            want_scores[d] = base.get(d, 0.0) + (1.0 if d in pdocs else 0.0)
        want = sorted(want_scores.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
        rows = topk_match_bool_prefix(idx, q, k=10).collect()
        got = [(r["doc_id"], round(r["score"], 9)) for r in rows]
        assert got == [(d, round(s, 9)) for d, s in want], q
        assert got, q
