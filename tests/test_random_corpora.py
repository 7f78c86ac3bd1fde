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


def _rand_interval_spec(rng, depth=0):
    """Random intervals rule tree (ASCII terms only — the positional path)."""
    ascii_words = ["the", "data", "spark", "x2", "42", "a", "zz"]
    roll = rng.random()
    if depth >= 2 or roll < 0.5:
        n = rng.randint(1, 3)
        spec = {"match": {
            "terms": rng.choices(ascii_words, k=n),
            "max_gaps": rng.randint(0, 4),
            "ordered": rng.random() < 0.5,
        }}
    elif roll < 0.75:
        spec = {"any_of": {"intervals": [
            _rand_interval_spec(rng, depth + 1) for _ in range(rng.randint(2, 3))
        ]}}
    else:
        spec = {"all_of": {
            "max_gaps": rng.randint(0, 6),
            "ordered": rng.random() < 0.5,
            "intervals": [
                _rand_interval_spec(rng, depth + 1) for _ in range(rng.randint(2, 3))
            ],
        }}
    if depth == 0 and rng.random() < 0.4:
        rule = rng.choice(["containing", "not_containing", "contained_by",
                           "overlapping", "before", "after", "not_before",
                           "not_after", "not_overlapping", "not_contained_by"])
        spec[next(iter(spec))]["filter"] = {
            rule: {"match": {"terms": [rng.choice(ascii_words)]}}
        }
    return spec


def _brute_intervals(spec, toks):
    def pos_of(w):
        return [j for j, x in enumerate(toks) if x == w]

    def ev(node):
        kind, body = next(iter(node.items()))
        if kind == "match":
            terms, g, n = body["terms"], body.get("max_gaps", 0), len(body["terms"])
            if n == 1:
                spans = [(p, p) for p in pos_of(terms[0])]
            elif body.get("ordered", True):
                spans = []
                for p0 in pos_of(terms[0]):
                    cur, ok = p0, True
                    for w in terms[1:]:
                        nxt = [q for q in pos_of(w) if q > cur]
                        if not nxt:
                            ok = False
                            break
                        cur = min(nxt)
                    if ok and cur - p0 + 1 - n <= g:
                        spans.append((p0, cur))
            else:
                spans = []
                for p0 in pos_of(terms[0]):
                    ch, ok = [p0], True
                    for w in terms[1:]:
                        ps = pos_of(w)
                        if not ps:
                            ok = False
                            break
                        ch.append(min(ps, key=lambda q: (abs(q - p0), q)))
                    if ok and max(ch) - min(ch) + 1 - n <= g:
                        spans.append((min(ch), max(ch)))
                spans = sorted(spans)
        elif kind == "any_of":
            spans = []
            for c in body["intervals"]:
                spans.extend(ev(c))
            spans = sorted(spans)
        else:
            g = body.get("max_gaps", 0)
            childs = [ev(c) for c in body["intervals"]]
            spans = []
            if body.get("ordered", True):
                for s0, e0 in childs[0]:
                    cur_end, gaps, ok = e0, 0, True
                    for ch in childs[1:]:
                        cands = sorted(sp for sp in ch if sp[0] > cur_end)
                        if not cands:
                            ok = False
                            break
                        s, e = cands[0]
                        gaps += s - cur_end - 1
                        cur_end = e
                    if ok and gaps <= g:
                        spans.append((s0, cur_end))
            else:
                for s0, e0 in childs[0]:
                    env_s, env_e, lens, ok = s0, e0, e0 - s0 + 1, True
                    for ch in childs[1:]:
                        if not ch:
                            ok = False
                            break
                        s, e = min(ch, key=lambda sp: (abs(sp[0] - s0), sp[0], sp[1]))
                        env_s, env_e = min(env_s, s), max(env_e, e)
                        lens += e - s + 1
                    if ok and (env_e - env_s + 1) - lens <= g:
                        spans.append((env_s, env_e))
                spans = sorted(spans)
        if "filter" in body:
            rule, fspec = next(iter(body["filter"].items()))
            neg = rule.startswith("not_")
            base = rule[4:] if neg else rule
            fsp = ev(fspec)

            def rel(sp):
                s, e = sp
                if base == "containing":
                    r = any(s <= fs and fe <= e for fs, fe in fsp)
                elif base == "contained_by":
                    r = any(fs <= s and e <= fe for fs, fe in fsp)
                elif base == "overlapping":
                    r = any(fs <= e and fe >= s for fs, fe in fsp)
                elif base == "before":
                    r = any(e < fs for fs, _ in fsp)
                else:
                    r = any(fe < s for _, fe in fsp)
                return (not r) if neg else r

            spans = [sp for sp in spans if rel(sp)]
        return spans

    return ev(spec)


@pytest.mark.parametrize("seed", [11, 23])
def test_random_interval_specs_match_brute_force(spark, seed):
    """Fuzz the intervals rule tree: random corpora × random nested specs
    (combinators, gaps, both orders, filter rules) must equal the per-doc
    brute force exactly — counts per doc, every doc."""
    from webindex.query import intervals_docs
    from webindex.textproc import tokenize

    rng = random.Random(seed)
    docs = _random_corpus(seed, 40)
    import pandas as pd

    pdf = pd.DataFrame(
        {"doc_id": list(docs), "url": [f"u{i}" for i in docs],
         "text": list(docs.values())}
    )
    idx = build_index(
        spark, spark.createDataFrame(pdf), text_col="text",
        doc_id_method="provided", range_width=8, positions=True,
    )
    n_specs, any_hits = 8, False
    for _ in range(n_specs):
        spec = _rand_interval_spec(rng)
        got = {r["doc_id"]: r["n_intervals"]
               for r in intervals_docs(idx, spec).collect()}
        want = {}
        for i, text in docs.items():
            spans = _brute_intervals(spec, tokenize(text))
            if spans:
                want[i] = len(spans)
        assert got == want, spec
        any_hits = any_hits or bool(got)
    assert any_hits
