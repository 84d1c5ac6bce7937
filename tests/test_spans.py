"""Span queries vs brute-force token-scan oracles."""

from __future__ import annotations

import re

import pytest

from inverted_index_spark.operators.build import build_index
from inverted_index_spark.operators.spans import (
    span_containing,
    span_first,
    span_not,
    span_or,
    span_within,
)
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


def _not_oracle(toks, phrase, exclude, pre, post):
    k = len(phrase)
    ex = set(exclude)
    out = {}
    for d, ts in toks.items():
        n = 0
        for s in range(len(ts) - k + 1):
            if ts[s : s + k] != phrase:
                continue
            lo, hi = max(0, s - pre), min(len(ts), s + k + post)
            if not any(t in ex for t in ts[lo:hi]):
                n += 1
        if n:
            out[d] = n
    return out


@pytest.mark.parametrize(
    "phrase,exclude,pre,post",
    [
        (["w00000"], ["w00001"], 0, 0),
        (["w00000"], ["w00001"], 2, 2),
        (["w00000", "w00001"], ["w00002"], 0, 3),
        (["w00000"], ["w00001", "w00002"], 5, 0),
        (["w00000"], [], 0, 0),
    ],
)
def test_span_not_vs_bruteforce(spark, fixture, phrase, exclude, pre, post):
    store, toks = fixture
    want = _not_oracle(toks, phrase, exclude, pre, post)
    got = {
        r["doc_id"]: r["n_matches"]
        for r in span_not(spark, store, phrase, exclude, pre, post).collect()
    }
    assert got == want


def test_span_not_widening_window_shrinks_matches(spark, fixture):
    store, _ = fixture
    n0 = dict(
        (r["doc_id"], r["n_matches"])
        for r in span_not(spark, store, ["w00000"], ["w00001"], 0, 0).collect()
    )
    n5 = dict(
        (r["doc_id"], r["n_matches"])
        for r in span_not(spark, store, ["w00000"], ["w00001"], 5, 5).collect()
    )
    assert sum(n5.values()) <= sum(n0.values())
    for d, n in n5.items():
        assert n <= n0.get(d, 0)


def test_span_not_bad_args(spark, fixture):
    store, _ = fixture
    with pytest.raises(ValueError, match="pre/post"):
        span_not(spark, store, ["a"], ["b"], -1, 0)
    assert span_not(spark, store, [], ["b"]).count() == 0


def _spans_of(ts, phrase):
    k = len(phrase)
    return {
        (s, s + k - 1)
        for s in range(len(ts) - k + 1)
        if ts[s : s + k] == phrase
    }


def _or_oracle(toks, clauses):
    out = {}
    for d, ts in toks.items():
        spans = set()
        for p in clauses:
            spans |= _spans_of(ts, p)
        if spans:
            out[d] = len(spans)
    return out


@pytest.mark.parametrize(
    "clauses",
    [
        [["w00000"], ["w00001"]],
        [["w00000", "w00001"], ["w00002"]],
        [["w00000"], ["w00000"]],  # duplicate clause → spans dedup
        [["w00000", "w00001"], ["w00001", "w00002"], ["w00003"]],
    ],
)
def test_span_or_vs_bruteforce(spark, fixture, clauses):
    store, toks = fixture
    want = _or_oracle(toks, clauses)
    got = {
        r["doc_id"]: r["n_matches"]
        for r in span_or(spark, store, clauses).collect()
    }
    assert got == want


def test_span_or_bad_args(spark, fixture):
    store, _ = fixture
    assert span_or(spark, store, []).count() == 0
    with pytest.raises(ValueError, match="non-empty"):
        span_or(spark, store, [["a"], []])


def _enclosure_oracle(toks, big, little, keep):
    out = {}
    for d, ts in toks.items():
        bs, ls = _spans_of(ts, big), _spans_of(ts, little)
        if keep == "big":
            n = sum(
                1
                for (s, e) in bs
                if any(s <= ls_ <= le <= e for (ls_, le) in ls)
            )
        else:
            n = sum(
                1
                for (s, e) in ls
                if any(bs_ <= s <= e <= be for (bs_, be) in bs)
            )
        if n:
            out[d] = n
    return out


# the 400-doc Zipf corpus repeats a small vocabulary, so 2-token bigs
# genuinely contain 1-token littles in many docs
@pytest.mark.parametrize(
    "big,little",
    [
        (["w00000", "w00001"], ["w00001"]),
        (["w00000", "w00001"], ["w00000"]),
        (["w00000"], ["w00000"]),  # self-enclosure: every span qualifies
        (["w00001", "w00002"], ["w00003"]),  # usually disjoint
    ],
)
def test_span_containing_vs_bruteforce(spark, fixture, big, little):
    store, toks = fixture
    want = _enclosure_oracle(toks, big, little, "big")
    got = {
        r["doc_id"]: r["n_matches"]
        for r in span_containing(spark, store, big, little).collect()
    }
    assert got == want


@pytest.mark.parametrize(
    "big,little",
    [
        (["w00000", "w00001"], ["w00001"]),
        (["w00000", "w00001"], ["w00000"]),
        (["w00002"], ["w00002"]),
    ],
)
def test_span_within_vs_bruteforce(spark, fixture, big, little):
    store, toks = fixture
    want = _enclosure_oracle(toks, big, little, "little")
    got = {
        r["doc_id"]: r["n_matches"]
        for r in span_within(spark, store, big, little).collect()
    }
    assert got == want


def test_enclosure_empty_sides(spark, fixture):
    store, _ = fixture
    assert span_containing(spark, store, [], ["a"]).count() == 0
    assert span_within(spark, store, ["a"], []).count() == 0
