"""Oracle self-checks against hand-computed BM25 on the micro-corpus
(FIXTURES.md §4): tf>1, df=N term, df=1 term, empty doc, tie-break."""

import math

import pytest

from webindex.oracle import OracleIndex

# 6 docs; doc 5 is empty (dl=0 edge). Token 'all' appears in every non-empty
# doc; 'rare' only in doc 3; doc 0 has tf('dup')=2.
MICRO = {
    0: "all dup dup alpha",
    1: "all beta tie",
    2: "all gamma tie",
    3: "all rare delta",
    4: "all epsilon",
    5: "",
}
# N=6, doc_lens: 4,3,3,3,2,0 -> avgdl = 15/6 = 2.5


@pytest.fixture(scope="module")
def idx():
    return OracleIndex(MICRO)


def test_corpus_stats(idx):
    assert idx.n_docs == 6
    assert idx.avgdl == 2.5
    assert idx.doc_lens[5] == 0


def test_df_idf(idx):
    assert idx.df("all") == 5
    assert idx.df("rare") == 1
    assert idx.df("nonexistent") == 0
    # idf('rare') = ln(1 + (6-1+0.5)/(1+0.5)) = ln(1 + 5.5/1.5)
    assert abs(idx.idf("rare") - math.log(1 + 5.5 / 1.5)) < 1e-15
    # df=N-1 term has small idf: ln(1 + 1.5/5.5)
    assert abs(idx.idf("all") - math.log(1 + 1.5 / 5.5)) < 1e-15


def test_single_term_score_by_hand(idx):
    # score(doc3, 'rare'): idf=ln(1+5.5/1.5); tf=1, dl=3, avgdl=2.5
    # impact = 1/(1 + 1.2*(0.25 + 0.75*3/2.5)) = 1/(1+1.2*1.15)
    expect = math.log(1 + 5.5 / 1.5) * (1.0 / (1.0 + 1.2 * (0.25 + 0.75 * 3 / 2.5)))
    got = idx.topk("rare", 1)
    assert got[0][0] == 3
    assert abs(got[0][1] - expect) < 1e-12


def test_tf_gt_one(idx):
    # 'dup' tf=2 in doc0, dl=4
    impact = 2.0 / (2.0 + 1.2 * (0.25 + 0.75 * 4 / 2.5))
    expect = math.log(1 + 5.5 / 1.5) * impact
    got = idx.topk("dup", 5)
    assert got == [(0, pytest.approx(expect, abs=1e-12))]


def test_tie_break_doc_id_asc(idx):
    # 'tie' in docs 1 and 2, identical tf/dl -> identical score; doc 1 first
    got = idx.topk("tie", 2)
    assert [d for d, _ in got] == [1, 2]
    assert got[0][1] == got[1][1]


def test_multi_term_and_missing(idx):
    got = dict(idx.topk("rare nonexistent", 10))
    assert set(got) == {3}
    assert idx.topk("nonexistent", 10) == []
    # duplicate query terms count once
    assert idx.topk("rare rare", 1) == idx.topk("rare", 1)


def test_query_case_insensitive(idx):
    assert idx.topk("RARE", 1) == idx.topk("rare", 1)
