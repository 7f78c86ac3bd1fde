"""Interval-level block-max pruning engages and stays exact.

Drives webindex.query._score_bucket_fn directly on real block rows so the
pruning branch (theta>0) is observably exercised (not just equal-output)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from webindex.build import build_index
from webindex.pagesgen import make_pages_pdf
from webindex.query import _query_terms, _score_bucket_fn, topk_exact, topk_wand


@pytest.fixture(scope="module")
def idx(spark):
    pdf = make_pages_pdf(0, 256)
    pdf.insert(0, "doc_id", np.arange(256, dtype=np.int64))
    return build_index(
        spark, spark.createDataFrame(pdf), text_col="text",
        doc_id_method="provided", range_width=32,
    )


def _bucket_frames(idx, hashes):
    rows = idx.postings.filter(F.col("term_hash").isin(hashes)).toPandas()
    return {b: g.reset_index(drop=True) for b, g in rows.groupby("bucket")}


def test_prune_all_when_theta_unreachable(idx):
    from webindex.query import _maps_of

    stats = _query_terms(idx, "the data")
    idf_map, term_rank = _maps_of(stats)
    fn = _score_bucket_fn(idf_map, term_rank, idx.conf, idx.avgdl, k=10, theta=1e9)
    for pdf in _bucket_frames(idx, list(idf_map)).values():
        assert len(fn(pdf)) == 0  # every interval UB < theta -> all pruned


def test_partial_prune_keeps_survivors_exact(idx):
    from webindex.query import _maps_of

    # rare + hot mix: intervals without the rare term have UB = hot-only,
    # far below a theta anchored at the rare docs' scores -> real pruning
    query = "w199 the"
    stats = _query_terms(idx, query)
    assert "w199" in stats, "fixture corpus must contain the rare tail term"
    idf_map, term_rank = _maps_of(stats)
    frames = _bucket_frames(idx, list(idf_map))
    exact_fn = _score_bucket_fn(idf_map, term_rank, idx.conf, idx.avgdl, k=1000, theta=0.0)
    all_scores = pd.concat([exact_fn(p) for p in frames.values()])
    theta = float(all_scores["score"].max()) * 0.5
    pruned_fn = _score_bucket_fn(idf_map, term_rank, idx.conf, idx.avgdl, k=1000, theta=theta)
    pruned = pd.concat([pruned_fn(p) for p in frames.values()])
    # every >=theta doc survives with a bit-identical score...
    keep = all_scores[all_scores["score"] >= theta].sort_values("doc_id")
    got = pruned[pruned["score"] >= theta].sort_values("doc_id")
    assert len(keep) >= 1
    assert list(got["doc_id"]) == list(keep["doc_id"])
    assert np.allclose(got["score"].to_numpy(), keep["score"].to_numpy(), atol=0)
    # ...and hot-only docs were actually pruned
    assert len(pruned) < len(all_scores)


def test_theta_seed_is_exact_and_bounded(spark):
    """The metadata-first θ-seed must (a) return the exact k-th best
    single-term contribution (same value the old exhaustive seed computed)
    and (b) decode a strict subset of a hot term's blocks. Fine bucketing
    (range_width=8 -> ~32 blocks for a df~N term) so the doubling loop has
    room to stop early."""
    from webindex.query import _decode_contribs_iter, _theta_seed

    pdf = make_pages_pdf(0, 256)
    pdf.insert(0, "doc_id", np.arange(256, dtype=np.int64))
    idx = build_index(
        spark, spark.createDataFrame(pdf), text_col="text",
        doc_id_method="provided", range_width=8,
    )
    k = 5
    stats = _query_terms(idx, "the")
    df, idf, h = stats["the"]
    assert df > k
    # exhaustive ground truth: decode EVERY block of the term
    all_contribs = (
        idx.postings.filter(F.col("term_hash") == h)
        .mapInPandas(
            _decode_contribs_iter({h: idf}, idx.conf, idx.avgdl),
            schema="term_hash long, doc_id long, contrib double",
        )
        .toPandas()["contrib"]
        .sort_values(ascending=False)
    )
    exact_kth = float(all_contribs.iloc[k - 1])
    probe = {}
    got = _theta_seed(idx, h, idf, k, _probe=probe)
    assert got == exact_kth
    n_blocks = idx.postings.filter(F.col("term_hash") == h).count()
    assert n_blocks >= 16
    assert probe["blocks_decoded"] < n_blocks, (
        f"seed decoded all {n_blocks} blocks — not bounded"
    )


def test_wand_exact_agree_under_heavy_theta_conditions(idx):
    # rare+hot mixes where theta seeding engages hardest; seed_min_blocks=0
    # forces the seed past the cost-based gate on this tiny fixture
    for q in ("w199 the", "w180 data the", "merge rank w150", "the"):
        w = [
            (r["doc_id"], round(r["score"], 10))
            for r in topk_wand(idx, q, 5, seed_min_blocks=0).collect()
        ]
        e = [(r["doc_id"], round(r["score"], 10)) for r in topk_exact(idx, q, 5).collect()]
        assert w == e, q


def test_seed_gate_disarms_below_min_blocks(idx, monkeypatch):
    """Cost gate (VERDICT r2 next-round #2): below THETA_SEED_MIN_BLOCKS
    estimated candidate blocks, topk_wand must issue ZERO seed jobs — the
    2-3 driver-synchronous jobs cost more than the decode they could save.
    At the default gate, an sf0.1/100k-doc index (hot term df ~1e5 -> ~800
    blocks) never seeds; the 10^12-doc regime (~1e9+ blocks) always does."""
    import webindex.query as Q

    calls = []

    def spy(index, term_hash, idf, k, _probe=None):
        calls.append(term_hash)
        return 0.0

    monkeypatch.setattr(Q, "_theta_seed", spy)
    # default gate: this 256-doc fixture is far below 4096 candidate blocks
    Q.topk_wand(idx, "the data", 5).collect()
    assert calls == []
    # forced gate (tests/tiny fixtures): the seed engages
    Q.topk_wand(idx, "the data", 5, seed_min_blocks=0).collect()
    assert len(calls) == 1

    # batch path: same gate, zero seed jobs below it
    batch_calls = []

    def batch_spy(index, seed_terms, k):
        batch_calls.append(dict(seed_terms))
        return {}

    monkeypatch.setattr(Q, "_batch_theta_seeds", batch_spy)
    Q.topk_batch(idx, {"q0": "the data", "q1": "w42 merge"}, 5).collect()
    assert batch_calls == [{}]  # called with an EMPTY seed set -> no jobs
    Q.topk_batch(idx, {"q0": "the data"}, 5, seed_min_blocks=0).collect()
    assert len(batch_calls) == 2 and len(batch_calls[1]) == 1
