"""q-gram dictionary sidecar (build.build_term_grams): fuzzy/suggest
expansion via gram-candidate pruning must be byte-identical to the linear
length-banded vocabulary scan, and the candidate bound must be sound
(superset of every term within the edit distance).

reference: src/nmr_FAIR_DOs/connectors/elasticsearch.py:250-262 — the same
mapping-less index serves ES's fuzzy/suggest family; Lucene implements the
expansion as an FST automaton intersection, this sidecar is the join-shaped
analogue."""

import numpy as np
import pytest

from webindex.build import GRAM_Q, build_index, build_term_grams
from webindex.pagesgen import make_pages_pdf
from webindex.query import (
    _gram_candidates,
    ensure_term_grams,
    suggest_terms,
    topk_fuzzy,
)

N_DOCS = 200


@pytest.fixture(scope="module")
def idx(spark):
    pdf = make_pages_pdf(0, N_DOCS)
    pdf.insert(0, "doc_id", np.arange(N_DOCS, dtype=np.int64))
    return build_index(
        spark, spark.createDataFrame(pdf), text_col="text",
        doc_id_method="provided", range_width=32,
    )


def _rows(df):
    return [tuple(r) for r in df.collect()]


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_sidecar_rows(idx):
    """Every row is a real length-q substring of its term; every term of
    length >= q contributes exactly its distinct q-grams."""
    grams = ensure_term_grams(idx)
    rows = grams.collect()
    per_term: dict[str, set] = {}
    for r in rows:
        assert len(r["gram"]) == GRAM_Q
        assert r["gram"] in r["term"]
        per_term.setdefault(r["term"], set()).add(r["gram"])
    vocab = [r["term"] for r in idx.term_stats.select("term").collect()]
    for t in vocab:
        want = {t[i : i + GRAM_Q] for i in range(len(t) - GRAM_Q + 1)}
        assert per_term.get(t, set()) == want


@pytest.mark.parametrize("word,f", [("merge", 1), ("w150", 1), ("spark", 2)])
def test_gram_candidates_sound(idx, word, f):
    """Candidate set ⊇ every vocabulary term within f edits (the bound the
    docstring argues); verified against a pure-python Levenshtein."""
    gi = ensure_term_grams(idx)
    cand = _gram_candidates(gi, word, f)
    vocab = [r["term"] for r in idx.term_stats.select("term").collect()]
    truth = {t for t in vocab if _lev(t, word) <= f}
    if cand is None:
        return  # vacuous bound — fallback path, nothing to check
    got = {r["term"] for r in cand.collect()}
    assert truth <= got


def test_gram_candidates_prune(idx):
    """The filter actually prunes: candidates ≪ vocabulary (this is the
    point of the sidecar — sub-linear dictionary touch)."""
    gi = ensure_term_grams(idx)
    cand = _gram_candidates(gi, "merge", 1)
    assert cand is not None
    n_vocab = idx.term_stats.count()
    assert cand.count() < n_vocab / 2


def test_gram_candidates_vacuous_short_word(idx):
    gi = ensure_term_grams(idx)
    assert _gram_candidates(gi, "ab", 1) is None  # no full gram
    assert _gram_candidates(gi, "abcd", 2) is None  # |D|=2 < 1+q*f


@pytest.mark.parametrize("word,f", [("merge", 1), ("w150", 1), ("data", 2)])
def test_fuzzy_gram_path_identical(idx, word, f):
    """topk_fuzzy with the sidecar == topk_fuzzy without, byte-for-byte."""
    linear = _rows(topk_fuzzy(idx, word, 10, fuzziness=f))
    gi = ensure_term_grams(idx)
    gram = _rows(topk_fuzzy(idx, word, 10, fuzziness=f, gram_index=gi))
    assert gram == linear
    assert len(linear) > 0


def test_fuzzy_gram_prefix_length_identical(idx):
    gi = ensure_term_grams(idx)
    a = _rows(topk_fuzzy(idx, "merge", 10, fuzziness=1, prefix_length=2))
    b = _rows(topk_fuzzy(idx, "merge", 10, fuzziness=1, prefix_length=2,
                         gram_index=gi))
    assert a == b


def test_fuzzy_short_word_fallback(idx):
    """Words below the gram bound still work (fallback to banded scan)."""
    gi = ensure_term_grams(idx)
    a = _rows(topk_fuzzy(idx, "w15", 10, fuzziness=1))
    b = _rows(topk_fuzzy(idx, "w15", 10, fuzziness=1, gram_index=gi))
    assert a == b


def test_suggest_gram_path_identical(idx):
    """suggest_terms with the sidecar == without — including a mixed input
    (long token via gram path + short token via band fallback)."""
    text = "mrge datta th"
    linear = _rows(suggest_terms(idx, text, max_edits=2, size=3))
    gi = ensure_term_grams(idx)
    gram = _rows(suggest_terms(idx, text, max_edits=2, size=3, gram_index=gi))
    assert gram == linear
    assert len(linear) > 0


def test_sidecar_persisted_and_loaded(spark, tmp_path):
    """build_index(out_dir=...) writes term_grams; load_index restores it
    and the loaded index's fuzzy results equal the in-memory index's."""
    from webindex.build import load_index

    pdf = make_pages_pdf(0, 60)
    pdf.insert(0, "doc_id", np.arange(60, dtype=np.int64))
    out = str(tmp_path / "idx")
    built = build_index(
        spark, spark.createDataFrame(pdf), text_col="text",
        doc_id_method="provided", range_width=32, out_dir=out,
    )
    assert built.term_grams is not None
    loaded = load_index(spark, out)
    assert loaded.term_grams is not None
    disk = set(_rows(loaded.term_grams))
    mem = set(_rows(build_term_grams(loaded.term_stats)))
    assert disk == mem
    assert _rows(topk_fuzzy(loaded, "merge", 10)) == _rows(
        topk_fuzzy(built, "merge", 10)
    )


def test_gram_scan_filter_pushed(idx):
    """The sidecar probe carries the IN(gram) predicate (pushable to the
    gram-sorted parquet scan on disk-backed indexes)."""
    gi = ensure_term_grams(idx)
    cand = _gram_candidates(gi, "merge", 1)
    plan = cand._jdf.queryExecution().executedPlan().toString()
    assert "gram" in plan and ("IN" in plan.upper() or "in(" in plan)
