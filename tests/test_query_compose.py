"""Query compositions over the shared exhaustive kernels: phrase_scores,
ES rescore (window rescoring), and simple_query_string — all rank- and
score-checked against naive recomputation from the pure-Python oracle.

reference: src/nmr_FAIR_Dos is served by an ES backend whose search API
exposes exactly these compound read shapes (rescore, simple_query_string);
reference: src/nmr_FAIR_DOs/connectors/elasticsearch.py:250-306."""

import numpy as np
import pytest

from webindex.build import build_index
from webindex.oracle import OracleIndex
from webindex.pagesgen import make_pages_pdf
from webindex.query import (
    phrase_scores,
    simple_query_string,
    topk_rescore,
)
from webindex.textproc import extract_text, tokenize

N_DOCS = 150


@pytest.fixture(scope="module")
def corpus():
    pdf = make_pages_pdf(0, N_DOCS)
    pdf.insert(0, "doc_id", np.arange(N_DOCS, dtype=np.int64))
    return pdf


@pytest.fixture(scope="module")
def texts(corpus):
    return {int(r["doc_id"]): extract_text(r["html"]) for _, r in corpus.iterrows()}


@pytest.fixture(scope="module")
def oracle(texts):
    return OracleIndex(texts)


@pytest.fixture(scope="module")
def pidx(spark, corpus):
    return build_index(
        spark, spark.createDataFrame(corpus).repartition(5), text_col="html",
        doc_id_method="provided", range_width=32, positions=True,
    )


def _phrase_all(oracle, phrase):
    return dict(oracle.topk_phrase(phrase, 10**9))


def test_phrase_scores_exhaustive(pidx, oracle):
    got = {
        r["doc_id"]: round(r["score"], 9)
        for r in phrase_scores(pidx, "the data").collect()
    }
    want = {d: round(s, 9) for d, s in _phrase_all(oracle, "the data").items()}
    assert got == want and len(got) > 10


def test_rescore_window_semantics(pidx, oracle):
    base = oracle.topk("data", 30)  # the window, rank order
    ph = _phrase_all(oracle, "the data")
    qw, rw = 0.7, 1.5
    want = sorted(
        ((d, qw * s + rw * ph.get(d, 0.0)) for d, s in base),
        key=lambda kv: (-kv[1], kv[0]),
    )[:10]
    rows = topk_rescore(
        pidx, "data", "the data", window=30,
        query_weight=qw, rescore_weight=rw, k=10,
    ).collect()
    assert [(r["doc_id"], round(r["score"], 9)) for r in rows] == [
        (d, round(s, 9)) for d, s in want
    ]
    # a doc whose phrase boost would beat the top-k but sits OUTSIDE the
    # base window must not appear — ES's window contract
    outside = {d for d, _ in base}
    assert all(r["doc_id"] in outside for r in rows)


def test_rescore_absent_phrase_keeps_weighted_base(pidx, oracle):
    rows = topk_rescore(
        pidx, "data", "absent phrase here", window=25, query_weight=2.0,
        rescore_weight=9.0, k=5,
    ).collect()
    want = [(d, 2.0 * s) for d, s in oracle.topk("data", 5)]
    assert [(r["doc_id"], round(r["score"], 9)) for r in rows] == [
        (d, round(s, 9)) for d, s in want
    ]


def _sqs_naive(oracle, texts, clauses, op, k=10):
    """clauses: list of (neg, is_phrase, text). Sum matching positive
    clause scores in clause order; AND requires all positives."""
    pos = [c for c in clauses if not c[0]]
    neg = [c for c in clauses if c[0]]

    def clause_scores(is_phrase, text):
        if is_phrase and len(tokenize(text)) > 1:
            return _phrase_all(oracle, text)
        return oracle.score_all(text)

    pos_maps = [clause_scores(p, t) for _, p, t in pos]
    excluded = set()
    for _, p, t in neg:
        excluded |= set(clause_scores(p, t))
    out = {}
    for d in set().union(*pos_maps) if pos_maps else set():
        if d in excluded:
            continue
        matched = [m[d] for m in pos_maps if d in m]
        if op == "and" and len(matched) < len(pos_maps):
            continue
        s = 0.0
        if len(pos_maps) == 1:
            s = pos_maps[0][d]
        else:
            for m in pos_maps:
                s = s + m.get(d, 0.0)
        out[d] = s
    return sorted(out.items(), key=lambda kv: (-kv[1], kv[0]))[:k]


@pytest.mark.parametrize("op", ["or", "and"])
def test_sqs_terms_and_phrase(pidx, oracle, texts, op):
    q = 'data "the data" merge'
    clauses = [
        (False, False, "data"),
        (False, True, "the data"),
        (False, False, "merge"),
    ]
    want = _sqs_naive(oracle, texts, clauses, op)
    rows = simple_query_string(pidx, q, default_operator=op, k=10).collect()
    assert [(r["doc_id"], round(r["score"], 9)) for r in rows] == [
        (d, round(s, 9)) for d, s in want
    ]
    assert rows, op


def test_sqs_negation_excludes(pidx, oracle, texts):
    q = 'data -"the data" -merge'
    clauses = [
        (False, False, "data"),
        (True, True, "the data"),
        (True, False, "merge"),
    ]
    want = _sqs_naive(oracle, texts, clauses, "or")
    rows = simple_query_string(pidx, q, k=10).collect()
    assert [(r["doc_id"], round(r["score"], 9)) for r in rows] == [
        (d, round(s, 9)) for d, s in want
    ]
    # position-aware phrase negation: some doc containing both terms but
    # not adjacent must survive
    ph_docs = set(_phrase_all(oracle, "the data"))
    both = {
        d for d, t in texts.items()
        if {"the", "data"} <= set(tokenize(t)) and "merge" not in tokenize(t)
    }
    assert any(
        r["doc_id"] in (both - ph_docs) for r in rows
    ) or not (both - ph_docs)


def test_sqs_pure_negative_matches_nothing(pidx):
    assert simple_query_string(pidx, "-data").count() == 0


def test_sqs_absent_term_and_vs_or(pidx, oracle, texts):
    assert (
        simple_query_string(pidx, "data zzzzabsent", default_operator="and").count()
        == 0
    )
    want = _sqs_naive(oracle, texts, [(False, False, "data")], "or")
    rows = simple_query_string(pidx, "data zzzzabsent", k=10).collect()
    assert [(r["doc_id"], round(r["score"], 9)) for r in rows] == [
        (d, round(s, 9)) for d, s in want
    ]


def test_synonyms_blended_group_scoring(pidx, texts):
    from webindex.bm25 import DEFAULT
    from webindex.query import topk_synonyms

    toks = {d: tokenize(t) for d, t in texts.items()}
    n = len(toks)
    avgdl = sum(len(v) for v in toks.values()) / n
    syn = {"data": ["index"], "merge": ["zzzzabsent"]}
    q_tokens = sorted({"data", "merge"})
    want_scores = {}
    for qt in q_tokens:
        grp = sorted({qt} | set(syn.get(qt, [])))
        present = [m for m in grp if any(m in v for v in toks.values())]
        if not present:
            continue
        df_g = max(sum(1 for v in toks.values() if m in v) for m in present)
        idf_g = DEFAULT.idf(df_g, n)
        for d, v in toks.items():
            tf_g = sum(v.count(m) for m in present)
            if tf_g:
                c = idf_g * DEFAULT.impact(float(tf_g), float(len(v)), avgdl)
                want_scores[d] = want_scores.get(d, 0.0) + c
    want = sorted(want_scores.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    rows = topk_synonyms(pidx, "data merge", syn, k=10).collect()
    assert [(r["doc_id"], round(r["score"], 9)) for r in rows] == [
        (d, round(s, 9)) for d, s in want
    ]
    # pooling != naive OR: df blends to the max, so the scores must differ
    # from the plain two-term match for docs containing both group members
    assert want  # non-degenerate fixture


def test_synonyms_all_absent_empty(pidx):
    from webindex.query import topk_synonyms

    assert topk_synonyms(pidx, "zzzz", {"zzzz": ["yyyy"]}, k=5).count() == 0


def test_rrf_hybrid_fuses_rankings(spark, pidx, oracle, texts):
    import numpy as np

    from webindex.simsearch import rrf_hybrid

    # deterministic synthetic vectors over the same doc_id domain
    rng = np.random.default_rng(7)
    vecs = {d: rng.normal(size=8).astype(np.float64) for d in sorted(texts)}
    rows = [(int(d), [float(x) for x in v]) for d, v in vecs.items()]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    qvec = [float(x) for x in vecs[3]]

    window, rc = 25, 60
    base = oracle.topk("data", window)
    trank = {d: i + 1 for i, (d, _) in enumerate(base)}
    qn = np.linalg.norm(qvec)
    cos = {
        d: float(np.dot(v, qvec) / (np.linalg.norm(v) * qn))
        for d, v in vecs.items()
    }
    korder = sorted(cos.items(), key=lambda kv: (-kv[1], kv[0]))[:window]
    krank = {d: i + 1 for i, (d, _) in enumerate(korder)}
    want_scores = {
        d: (1.0 / (rc + trank[d]) if d in trank else 0.0)
        + (1.0 / (rc + krank[d]) if d in krank else 0.0)
        for d in set(trank) | set(krank)
    }
    want = sorted(want_scores.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got = [
        (r["doc_id"], round(r["score"], 12))
        for r in rrf_hybrid(
            pidx, emb, "data", qvec, k=10, rank_constant=rc, window=window,
            vec_col="embedding",
        ).collect()
    ]
    assert got == [(d, round(s, 12)) for d, s in want]
    # the fused top-k must mix docs from both sides on this fixture
    assert any(d in trank and d not in krank for d, _ in got) or any(
        d in krank and d not in trank for d, _ in got
    )


def test_cosine_topk_filtered_knn(spark, pidx, oracle, texts):
    import numpy as np

    from webindex.simsearch import cosine_topk_filtered
    from webindex.textproc import tokenize

    rng = np.random.default_rng(11)
    vecs = {d: rng.normal(size=8).astype(np.float64) for d in sorted(texts)}
    emb = spark.createDataFrame(
        [(int(d), [float(x) for x in v]) for d, v in vecs.items()],
        "vec_id long, embedding array<double>",
    )
    qvec = [float(x) for x in vecs[5]]
    match = {d for d, t in texts.items() if "data" in tokenize(t)}
    qn = np.linalg.norm(qvec)
    cos = {
        d: float(np.dot(v, qvec) / (np.linalg.norm(v) * qn))
        for d, v in vecs.items()
        if d in match
    }
    want = sorted(cos.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got = [
        (r["vec_id"], round(r["cos"], 9))
        for r in cosine_topk_filtered(pidx, emb, "data", qvec, k=10).collect()
    ]
    assert got == [(d, round(c, 9)) for d, c in want]
    # every result matches the filter — the ES during-search contract
    assert all(d in match for d, _ in got) and len(got) == 10
