"""Term-hash collision resolution (SCALE.md known-limit: collision headroom).

xxhash64 collisions are ~0.03 expected pairs even at 10^9 vocab, so real ones
can't be manufactured in a test. resolve_term_hashes therefore takes an
injectable primary hash; these tests force collisions with a coarse hash
space (pmod of xxhash64) and verify that (a) every term ends with a unique
key, (b) committed keys never move, and (c) a full build under a pathological
hash still answers queries rank-identically to a normal build."""

import pytest
from pyspark.sql import functions as F

from webindex.build import (
    build_index,
    resolve_term_hashes,
    term_hash_col,
    term_hash_expr,
)
from webindex.pagesgen import make_pages_pdf
from webindex.query import topk_exact, topk_wand


def coarse_fn(space: int):
    """Primary hash squeezed into `space` values — guaranteed collisions."""
    return lambda c: F.pmod(F.xxhash64(c), F.lit(space)).cast("long")


def _vocab(spark, terms):
    return spark.createDataFrame([(t,) for t in terms], "term string")


def test_resolve_unique_under_forced_collisions(spark):
    terms = [f"term{i}" for i in range(40)]
    d, remap = resolve_term_hashes(_vocab(spark, terms), primary_fn=coarse_fn(4))
    rows = d.collect()
    assert sorted(r["term"] for r in rows) == sorted(terms)
    assert len({r["term_hash"] for r in rows}) == len(terms)  # all unique
    assert len(remap) >= len(terms) - 4  # at most 4 keepers in a 4-slot space
    # remap rows agree with the dict
    got = {r["term"]: r["term_hash"] for r in rows}
    for t, h in remap.items():
        assert got[t] == h


def test_resolve_no_collision_is_identity(spark):
    terms = ["alpha", "beta", "gamma"]
    d, remap = resolve_term_hashes(_vocab(spark, terms))
    assert remap == {}
    expected = {
        r["term"]: r["h"]
        for r in _vocab(spark, terms)
        .select("term", term_hash_col(F.col("term")).alias("h"))
        .collect()
    }
    assert {r["term"]: r["term_hash"] for r in d.collect()} == expected


def test_existing_terms_keep_committed_keys(spark):
    # existing dict claims key 17 for 'old'; force every new term's primary
    # hash onto a 1-slot space so 'new*' all collide with each other AND
    # with nothing-in-particular — then pin one directly onto 17 via a
    # 1-value space and an existing dict built in that same space.
    existing = spark.createDataFrame(
        [("old", 0)], "term string, term_hash long"
    )
    d, remap = resolve_term_hashes(
        _vocab(spark, ["newa", "newb", "old"]),
        existing_dict=existing,
        primary_fn=coarse_fn(1),  # every primary hash is 0 -> clashes 'old'
    )
    rows = {r["term"]: r["term_hash"] for r in d.collect()}
    assert rows["old"] == 0  # committed key never moves
    assert set(remap) == {"newa", "newb"}  # both new terms remapped
    assert len(set(rows.values())) == 3


def test_term_hash_expr_case_override(spark):
    df = _vocab(spark, ["a", "b", "c"]).select(
        "term", term_hash_expr(F.col("term"), {"b": 12345}).alias("h")
    )
    got = {r["term"]: r["h"] for r in df.collect()}
    assert got["b"] == 12345
    plain = {
        r["term"]: r["h"]
        for r in _vocab(spark, ["a", "c"])
        .select("term", term_hash_col(F.col("term")).alias("h"))
        .collect()
    }
    assert got["a"] == plain["a"] and got["c"] == plain["c"]


def test_degenerate_hash_refuses_loudly(spark):
    terms = [f"t{i}" for i in range(50)]
    with pytest.raises(RuntimeError, match="remap exceeds"):
        resolve_term_hashes(
            _vocab(spark, terms), primary_fn=coarse_fn(1), max_remap=10
        )


def test_build_under_pathological_hash_matches_normal_build(spark):
    """Full build where the primary hash space is 64 values (hundreds of
    vocab collisions): query results must be identical to the default
    build's — the dictionary mediates every lookup, so the key values are
    semantics-free as long as they're unique."""
    import numpy as np

    pdf = make_pages_pdf(0, 120)
    pdf.insert(0, "doc_id", np.arange(120, dtype=np.int64))
    pages = spark.createDataFrame(pdf).repartition(5)
    normal = build_index(spark, pages, text_col="html", range_width=64)
    coarse = build_index(
        spark, pages, text_col="html", range_width=64,
        hash_primary_fn=coarse_fn(64),
    )
    # sanity: the coarse build actually exercised the remap machinery
    n_vocab = coarse.term_stats.count()
    n_keys = coarse.term_stats.select("term_hash").distinct().count()
    assert n_keys == n_vocab > 64  # unique despite 64-slot primary space

    for q in ["the", "data spark", "w40 merge", "zzz_absent", "the w50"]:
        a = [(r["doc_id"], round(r["score"], 9)) for r in topk_exact(normal, q, 10).collect()]
        b = [(r["doc_id"], round(r["score"], 9)) for r in topk_exact(coarse, q, 10).collect()]
        w = [(r["doc_id"], round(r["score"], 9)) for r in topk_wand(coarse, q, 10).collect()]
        assert a == b == w, f"query {q!r} diverged under pathological hash"
