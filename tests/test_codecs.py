"""Codec round-trip tests (mirrors reference codec tests, SURVEY.md §5.1 item 4:
TestContentStoreBlockCodec / TestThreeByteInt / TestTokensCodecRunLength)."""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from blacklab_spark.codecs import (
    DEFAULT_BLOCK_SIZE,
    decode_block,
    decode_block_positions,
    decode_positions,
    encode_blocks,
    encode_positions,
    varint_decode,
    varint_encode,
)


def test_varint_empty():
    assert varint_encode(np.array([], dtype=np.uint64)) == b""
    assert varint_decode(b"").size == 0


def test_varint_known():
    assert varint_encode(np.array([0], dtype=np.uint64)) == b"\x00"
    assert varint_encode(np.array([127], dtype=np.uint64)) == b"\x7f"
    assert varint_encode(np.array([128], dtype=np.uint64)) == b"\x80\x01"
    assert varint_encode(np.array([300], dtype=np.uint64)) == b"\xac\x02"


@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=500))
@settings(max_examples=100, deadline=None)
def test_varint_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    out = varint_decode(varint_encode(arr))
    assert np.array_equal(out, arr)


def test_varint_u64_max():
    arr = np.array([2**64 - 1, 0, 1], dtype=np.uint64)
    assert np.array_equal(varint_decode(varint_encode(arr)), arr)


@given(
    st.lists(st.lists(st.integers(min_value=0, max_value=10_000), min_size=1, max_size=20),
             min_size=1, max_size=30)
)
@settings(max_examples=50, deadline=None)
def test_positions_roundtrip(pos_lists):
    pos_lists = [sorted(set(p)) for p in pos_lists if p]
    if not pos_lists:
        return
    flat = np.array([x for p in pos_lists for x in p], dtype=np.int64)
    tfs = np.array([len(p) for p in pos_lists], dtype=np.int64)
    buf = encode_positions(flat, tfs)
    out = decode_positions(buf, tfs)
    assert np.array_equal(out, flat)


def rand_postings(rng, n):
    doc_ids = np.sort(rng.choice(10**7, size=n, replace=False)).astype(np.int64)
    tfs = rng.integers(1, 20, n).astype(np.int64)
    dls = (tfs + rng.integers(0, 100, n)).astype(np.int64)
    pos = []
    for tf, dl in zip(tfs, dls):
        pos.extend(sorted(rng.choice(max(dl, tf), size=tf, replace=False).tolist()))
    return doc_ids, tfs, dls, np.array(pos, dtype=np.int64)


@pytest.mark.parametrize("n", [1, 5, 127, 128, 129, 1000])
def test_block_roundtrip(n):
    rng = np.random.default_rng(7)
    doc_ids, tfs, dls, pos = rand_postings(rng, n)
    blocks = encode_blocks(doc_ids, tfs, dls, pos, avgdl=50.0, idf_val=1.5)
    assert len(blocks) == (n + DEFAULT_BLOCK_SIZE - 1) // DEFAULT_BLOCK_SIZE
    got_d, got_t, got_l, got_p = [], [], [], []
    for b in blocks:
        d, t, l = decode_block(b)
        assert b["first_doc_id"] == d[0] and b["last_doc_id"] == d[-1]
        assert b["num_docs"] == len(d)
        assert b["block_max_tf"] == t.max()
        got_d.append(d); got_t.append(t); got_l.append(l)
        got_p.append(decode_block_positions(b))
    assert np.array_equal(np.concatenate(got_d), doc_ids)
    assert np.array_equal(np.concatenate(got_t), tfs)
    assert np.array_equal(np.concatenate(got_l), dls)
    assert np.array_equal(np.concatenate(got_p), pos)


def test_block_max_score_is_upper_bound():
    from blacklab_spark.scoring import bm25
    rng = np.random.default_rng(11)
    doc_ids, tfs, dls, pos = rand_postings(rng, 300)
    avgdl, w = 42.0, 2.0
    blocks = encode_blocks(doc_ids, tfs, dls, pos, avgdl=avgdl, idf_val=w)
    for b in blocks:
        d, t, l = decode_block(b)
        scores = bm25(t, l, avgdl, w)
        assert scores.max() <= b["block_max_score"] + 1e-15
        assert abs(scores.max() - b["block_max_score"]) < 1e-12  # exact, not loose
