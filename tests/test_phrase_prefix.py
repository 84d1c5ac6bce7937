"""match_phrase_prefix vs a brute-force token-scan oracle."""

from __future__ import annotations

import re

import pytest

from inverted_index_spark.operators.build import build_index
from inverted_index_spark.operators.phrase_prefix import match_phrase_prefix
from inverted_index_spark.sources.store import SegmentStore
from inverted_index_spark.sources.transcripts import generate_transcripts


@pytest.fixture(scope="module")
def fixture(spark, tmp_path_factory):
    store = SegmentStore(str(tmp_path_factory.mktemp("mpp") / "idx"))
    docs = generate_transcripts(spark, 400, include_doc_id=True)
    build_index(spark, docs, store, bucket_size=128, block_size=16, positions=True)
    toks = {
        r["doc_id"]: [
            t for t in re.findall(r"\w+", r["text"].lower()) if len(t) <= 64
        ]
        for r in docs.collect()
    }
    return store, toks


def _oracle(toks, phrase, prefix, expansions):
    out = {}
    k = len(phrase)
    for d, ts in toks.items():
        n = 0
        for p in range(len(ts) - k):
            if ts[p : p + k] == phrase and ts[p + k] in expansions:
                n += 1
        if n:
            out[d] = n
    return out


def _expansions(toks, prefix, cap):
    vocab = sorted({t for ts in toks.values() for t in ts if t.startswith(prefix)})
    return set(vocab[:cap])


@pytest.mark.parametrize(
    "phrase,prefix",
    [([], "w0000"), (["w00000"], "w0"), (["w00000", "w00001"], "w")],
)
def test_matches_bruteforce(spark, fixture, phrase, prefix):
    store, toks = fixture
    exp = _expansions(toks, prefix, 10_000)
    want = _oracle(toks, phrase, prefix, exp)
    got = {
        r["doc_id"]: r["n_matches"]
        for r in match_phrase_prefix(
            spark, store, phrase, prefix, max_expansions=10_000
        ).collect()
    }
    assert got == want
    assert want, "fixture should produce at least one match"


def test_expansion_cap_is_dictionary_order(spark, fixture):
    store, toks = fixture
    exp1 = _expansions(toks, "w0", 1)
    want = _oracle(toks, ["w00000"], "w0", exp1)
    got = {
        r["doc_id"]: r["n_matches"]
        for r in match_phrase_prefix(
            spark, store, ["w00000"], "w0", max_expansions=1
        ).collect()
    }
    assert got == want


def test_unexpandable_prefix_matches_nothing(spark, fixture):
    store, _ = fixture
    assert (
        match_phrase_prefix(spark, store, ["w00000"], "zzzznope").count() == 0
    )


def test_bad_args(spark, fixture):
    store, _ = fixture
    with pytest.raises(ValueError, match="max_expansions"):
        match_phrase_prefix(spark, store, ["a"], "w", max_expansions=0)
    with pytest.raises(ValueError, match="prefix"):
        match_phrase_prefix(spark, store, ["a"], "")
