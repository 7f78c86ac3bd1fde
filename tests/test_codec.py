"""Codec unit + property tests: varint/delta round-trip, block layout,
block max_impact correctness (SURVEY.md §5.2)."""

import numpy as np
from hypothesis import given, settings, strategies as st

from webindex import codec


def test_varint_known_values():
    assert codec.varint_encode(np.array([0])) == b"\x00"
    assert codec.varint_encode(np.array([127])) == b"\x7f"
    assert codec.varint_encode(np.array([128])) == b"\x80\x01"
    assert codec.varint_encode(np.array([300])) == b"\xac\x02"
    assert codec.varint_encode(np.array([], dtype=np.int64)) == b""
    assert codec.varint_decode(b"").size == 0


@given(st.lists(st.integers(min_value=0, max_value=2**62), max_size=500))
@settings(max_examples=200, deadline=None)
def test_varint_roundtrip(vals):
    arr = np.array(vals, dtype=np.int64)
    out = codec.varint_decode(codec.varint_encode(arr))
    assert np.array_equal(out, arr)


@given(
    st.lists(
        st.integers(min_value=-(2**62), max_value=2**62), min_size=1, max_size=400
    )
)
@settings(max_examples=200, deadline=None)
def test_delta_varint_roundtrip_sorted_ids(ids):
    """doc_ids may be negative (xxhash64 ids) — delta+uint64-wrap roundtrips."""
    arr = np.array(sorted(set(ids)), dtype=np.int64)
    enc = codec.varint_encode(codec.delta_encode(arr))
    out = codec.delta_decode(codec.varint_decode(enc))
    assert np.array_equal(out, arr)


def test_encode_blocks_layout_and_metadata():
    n = 300
    ids = np.arange(0, 2 * n, 2, dtype=np.int64)  # 300 docs, even ids
    tfs = (ids % 7 + 1).astype(np.int64)
    dls = np.full(n, 100, dtype=np.int64)
    blocks = codec.encode_blocks(ids, tfs, dls, avgdl=100.0, k1=1.2, b=0.75, block_size=128)
    assert [b["n_docs"] for b in blocks] == [128, 128, 44]
    assert blocks[0]["min_doc"] == 0 and blocks[0]["max_doc"] == 254
    assert blocks[2]["block_id"] == 2
    # roundtrip every block and check max_impact is the true max
    off = 0
    for blk in blocks:
        d, t, l = codec.decode_block(blk["doc_ids"], blk["tfs"], blk["doc_lens"])
        sl = slice(off, off + blk["n_docs"])
        assert np.array_equal(d, ids[sl])
        assert np.array_equal(t, tfs[sl])
        assert np.array_equal(l, dls[sl])
        true_max = codec.bm25_impact(tfs[sl], dls[sl], 100.0, 1.2, 0.75).max()
        assert blk["max_impact"] == true_max
        off += blk["n_docs"]


def test_bm25_impact_formula():
    # tf=2, dl=50, avgdl=100, k1=1.2, b=0.75:
    # 2 / (2 + 1.2*(1-0.75+0.75*0.5)) = 2 / (2 + 1.2*0.625)
    got = codec.bm25_impact(np.array([2]), np.array([50]), 100.0, 1.2, 0.75)[0]
    assert abs(got - 2.0 / (2.0 + 1.2 * 0.625)) < 1e-15
