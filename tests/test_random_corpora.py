"""Randomized rank-identity sweep: seeded random corpora (unicode tokens,
empty docs, heavy duplication -> ties) built with Spark must match the
pure-Python oracle exactly. Deterministic seeds — no flaky tests."""

import random

import numpy as np
import pytest
from pyspark.sql import functions as F

from webindex.build import build_index
from webindex.oracle import OracleIndex
from webindex.query import topk_exact, topk_wand

WORDS = [
    "the", "data", "spark", "über", "köln", "straße", "数据", "索引",
    "café", "naïve", "x2", "42", "a", "zz",
]


def _random_corpus(seed: int, n_docs: int) -> dict[int, str]:
    rng = random.Random(seed)
    docs = {}
    for i in range(n_docs):
        if rng.random() < 0.1:
            docs[i] = ""  # empty doc edge
        elif rng.random() < 0.2:
            docs[i] = docs.get(i - 1, "tie tie tie")  # duplicate -> score tie
        else:
            docs[i] = " ".join(rng.choices(WORDS, k=rng.randint(1, 30)))
    return docs


@pytest.mark.parametrize("seed", [1, 7, 99])
def test_random_corpus_rank_identity(spark, seed):
    docs = _random_corpus(seed, 40)
    pdf_rows = [(i, docs[i]) for i in sorted(docs)]
    pages = spark.createDataFrame(pdf_rows, "doc_id long, text string").withColumn(
        "url", F.col("doc_id").cast("string")
    )
    idx = build_index(
        spark, pages, text_col="text", doc_id_method="provided", range_width=8
    )
    oracle = OracleIndex(docs)
    assert idx.n_docs == oracle.n_docs
    assert abs(idx.avgdl - oracle.avgdl) < 1e-12

    rng = random.Random(seed + 1000)
    queries = [" ".join(rng.choices(WORDS, k=rng.randint(1, 4))) for _ in range(6)]
    queries += ["数据 the", "ÜBER café", "absent_term_xyz", ""]
    for q in queries:
        for fn in (topk_exact, topk_wand):
            got = [(r["doc_id"], r["score"]) for r in fn(idx, q, 10).collect()]
            exp = oracle.topk(q, 10)
            assert [d for d, _ in got] == [d for d, _ in exp], (q, seed)
            for (_, gs), (_, es) in zip(got, exp):
                assert abs(gs - es) < 1e-9, (q, seed)


@pytest.mark.parametrize("seed", [3, 11])
def test_random_corpus_compositions(spark, seed):
    """simple_query_string and topk_synonyms on seeded random corpora must
    match naive recomputation (clause sums / blended groups) exactly —
    unicode tokens, empty docs, duplicated docs (score ties) included."""
    from webindex.bm25 import DEFAULT
    from webindex.oracle import OracleIndex
    from webindex.query import simple_query_string, topk_synonyms
    from webindex.textproc import tokenize

    docs = _random_corpus(seed, 40)
    pdf_rows = [(i, docs[i]) for i in sorted(docs)]
    pages = spark.createDataFrame(pdf_rows, "doc_id long, text string").withColumn(
        "url", F.col("doc_id").cast("string")
    )
    idx = build_index(
        spark, pages, text_col="text", doc_id_method="provided",
        range_width=8, positions=True,
    )
    oracle = OracleIndex(docs)
    rng = random.Random(seed + 2000)

    # --- simple_query_string: 2 term clauses + a real adjacent bigram
    # phrase + a negated term ------------------------------------------------
    bigram = None
    for d in sorted(docs):
        ts = tokenize(docs[d])
        if len(ts) >= 2:
            bigram = f"{ts[0]} {ts[1]}"
            break
    assert bigram is not None
    t1, t2, tneg = rng.choices(WORDS, k=3)
    q = f'{t1} {t2} "{bigram}" -{tneg}'
    ph_all = dict(oracle.topk_phrase(bigram, 10**9))
    clause_maps = [oracle.score_all(t1), oracle.score_all(t2), ph_all]
    excluded = set(oracle.score_all(tneg))
    for op in ("or", "and"):
        want_scores = {}
        for d in set().union(*clause_maps):
            if d in excluded:
                continue
            hit = [m for m in clause_maps if d in m]
            if op == "and" and len(hit) < len(clause_maps):
                continue
            s = 0.0
            for m in clause_maps:
                s = s + m.get(d, 0.0)
            want_scores[d] = s
        want = sorted(want_scores.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
        rows = simple_query_string(idx, q, default_operator=op, k=10).collect()
        got = [(r["doc_id"], round(r["score"], 9)) for r in rows]
        assert got == [(d, round(s, 9)) for d, s in want], (q, op)

    # --- synonyms: every query token gets a random synonym ------------------
    toks = {d: tokenize(t) for d, t in docs.items()}
    n = len(toks)
    avgdl = sum(len(v) for v in toks.values()) / n
    qt1, qt2 = rng.sample(WORDS, 2)
    syn = {qt1: [rng.choice(WORDS)], qt2: [rng.choice(WORDS)]}
    want_scores = {}
    for qt in sorted({qt1, qt2}):
        grp = sorted(set(tokenize(qt)) | {
            m for s in syn.get(qt, []) for m in tokenize(s)
        })
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
    rows = topk_synonyms(idx, f"{qt1} {qt2}", syn, k=10).collect()
    got = [(r["doc_id"], round(r["score"], 9)) for r in rows]
    assert got == [(d, round(s, 9)) for d, s in want], (qt1, qt2, syn)
