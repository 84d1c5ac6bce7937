"""span_first vs a brute-force token-scan oracle."""

from __future__ import annotations

import re

import pytest

from inverted_index_spark.operators.build import build_index
from inverted_index_spark.operators.spans import span_first
from inverted_index_spark.sources.store import SegmentStore
from inverted_index_spark.sources.transcripts import generate_transcripts


@pytest.fixture(scope="module")
def fixture(spark, tmp_path_factory):
    store = SegmentStore(str(tmp_path_factory.mktemp("spans") / "idx"))
    docs = generate_transcripts(spark, 400, include_doc_id=True)
    build_index(spark, docs, store, bucket_size=128, block_size=16, positions=True)
    toks = {
        r["doc_id"]: [
            t for t in re.findall(r"\w+", r["text"].lower()) if len(t) <= 64
        ]
        for r in docs.collect()
    }
    return store, toks


def _oracle(toks, phrase, end):
    k = len(phrase)
    out = {}
    for d, ts in toks.items():
        n = sum(
            1
            for p in range(min(end, len(ts) - k + 1))
            if ts[p : p + k] == phrase
        )
        if n:
            out[d] = n
    return out


@pytest.mark.parametrize(
    "phrase,end",
    [(["w00000"], 1), (["w00000"], 5), (["w00000", "w00001"], 8), (["w00002"], 1000)],
)
def test_span_first_vs_bruteforce(spark, fixture, phrase, end):
    store, toks = fixture
    want = _oracle(toks, phrase, end)
    got = {
        r["doc_id"]: r["n_matches"]
        for r in span_first(spark, store, phrase, end).collect()
    }
    assert got == want


def test_span_first_tightens_with_end(spark, fixture):
    store, toks = fixture
    wide = {r["doc_id"] for r in span_first(spark, store, ["w00000"], 1000).collect()}
    tight = {r["doc_id"] for r in span_first(spark, store, ["w00000"], 1).collect()}
    assert tight <= wide
    assert wide, "w00000 should appear somewhere"


def test_span_first_bad_args(spark, fixture):
    store, _ = fixture
    with pytest.raises(ValueError, match="end"):
        span_first(spark, store, ["a"], 0)
    assert span_first(spark, store, [], 5).count() == 0
