"""Codec round-trip tests — port of /root/reference/single/segment_test.go
(compress/decompress identity incl. extremes 0, 500, MaxUint64) plus
randomized property checks and block-pruning semantics."""

from __future__ import annotations

import numpy as np
import pytest

from inverted_index_spark.functions.codec import (
    decode_postings,
    decode_varint,
    encode_postings,
    encode_varint,
)


@pytest.mark.parametrize(
    "values",
    [
        [0],
        [0, 500, 2**64 - 1],  # segment_test.go extremes
        [1],
        [127, 128, 129, 16383, 16384],
        list(range(1000)),
        [2**63 - 1, 2**63, 2**64 - 1],
    ],
)
def test_varint_roundtrip(values):
    arr = np.array(values, dtype=np.uint64)
    buf, lens = encode_varint(arr)
    assert int(lens.sum()) == len(buf)
    out = decode_varint(buf)
    np.testing.assert_array_equal(out, arr)


def test_varint_roundtrip_random():
    rng = np.random.default_rng(42)
    for _ in range(20):
        n = int(rng.integers(1, 5000))
        bits = int(rng.integers(1, 64))
        arr = rng.integers(0, 2**bits, size=n, dtype=np.uint64)
        buf, _ = encode_varint(arr)
        np.testing.assert_array_equal(decode_varint(buf), arr)


def test_varint_empty():
    buf, lens = encode_varint(np.zeros(0, dtype=np.uint64))
    assert buf == b""
    assert len(decode_varint(buf)) == 0


def _mk(n, seed=7, max_doc=10**7):
    rng = np.random.default_rng(seed)
    docs = np.unique(rng.integers(0, max_doc, size=n, dtype=np.uint64))
    tfs = rng.integers(1, 50, size=len(docs), dtype=np.uint64)
    dls = rng.integers(3, 80, size=len(docs), dtype=np.uint64)
    return docs, tfs, dls


@pytest.mark.parametrize("block_size", [2, 10, 128])
@pytest.mark.parametrize("n", [1, 2, 5, 1000])
def test_postings_roundtrip(block_size, n):
    docs, tfs, dls = _mk(n)
    p, t, d, blocks = encode_postings(docs, tfs, dls, block_size=block_size)
    assert len(blocks) == (len(docs) + block_size - 1) // block_size
    rd, rt, rl = decode_postings(p, t, d, blocks)
    np.testing.assert_array_equal(rd, docs)
    np.testing.assert_array_equal(rt, tfs)
    np.testing.assert_array_equal(rl, dls)


def test_postings_range_pruning():
    # mirrors reference range-scoping cases where boundaries fall
    # between segments (single/single_test.go:187-209)
    docs = np.array([1, 5, 10, 20], dtype=np.uint64)
    tfs = np.ones(4, dtype=np.uint64)
    dls = np.full(4, 7, dtype=np.uint64)
    p, t, d, blocks = encode_postings(docs, tfs, dls, block_size=2)
    rd, _, _ = decode_postings(p, t, d, blocks, min_doc=9, max_doc=999)
    np.testing.assert_array_equal(rd, [10, 20])
    rd, _, _ = decode_postings(p, t, d, blocks, min_doc=0, max_doc=7)
    np.testing.assert_array_equal(rd, [1, 5])
    rd, _, _ = decode_postings(p, t, d, blocks, min_doc=2, max_doc=3)
    assert len(rd) == 0


def test_postings_block_stats():
    docs = np.array([3, 4, 9, 11], dtype=np.uint64)
    tfs = np.array([1, 9, 2, 4], dtype=np.uint64)
    dls = np.array([10, 2, 30, 4], dtype=np.uint64)
    _, _, _, blocks = encode_postings(docs, tfs, dls, block_size=2)
    assert blocks[0]["first_doc"] == 3 and blocks[0]["last_doc"] == 4
    assert blocks[0]["max_tf"] == 9 and blocks[0]["min_dl"] == 2
    assert blocks[1]["max_tf"] == 4 and blocks[1]["min_dl"] == 4


def test_postings_empty():
    z = np.zeros(0, dtype=np.uint64)
    p, t, d, blocks = encode_postings(z, z, z)
    assert blocks == [] and p == b""
    rd, rt, rl = decode_postings(p, t, d, blocks)
    assert len(rd) == 0
