"""ES query types (operators.es_queries): terms_set, term range,
pinned — pinned against brute-force Python oracles over the shared
tokenizer contract."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from inverted_index_spark.functions.tokenizer import tokenize_text
from inverted_index_spark.operators.build import build_index
from inverted_index_spark.operators.es_queries import (
    pinned_topk,
    term_range_values,
    terms_set_match,
)
from inverted_index_spark.sources.store import SegmentStore

DOCS = [
    (0, "alpha beta gamma delta"),
    (1, "alpha beta"),
    (2, "gamma delta epsilon"),
    (3, "alpha epsilon zeta"),
    (4, "beta beta beta"),  # tf>1, still one distinct term
    (5, ""),
]


@pytest.fixture(scope="module")
def store(spark):
    s = SegmentStore(tempfile.mkdtemp(prefix="ii_esq_") + "/idx")
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    build_index(spark, df, s, bucket_size=3)
    return s


def _toks():
    return {d: set(tokenize_text(t)) for d, t in DOCS}


def test_terms_set_match_counts(spark, store):
    terms = ["alpha", "beta", "epsilon"]
    for m in (1, 2, 3):
        got = {
            r["doc_id"]: r["n_matched"]
            for r in terms_set_match(spark, store, terms, m).collect()
        }
        want = {
            d: len(ts & set(terms))
            for d, ts in _toks().items()
            if len(ts & set(terms)) >= m
        }
        assert got == want, m


def test_terms_set_match_bounds(spark, store):
    with pytest.raises(ValueError):
        terms_set_match(spark, store, ["alpha"], 0)
    with pytest.raises(ValueError):
        terms_set_match(spark, store, ["alpha", "beta"], 3)


def test_term_range_values(spark, store):
    cases = [
        ("beta", "epsilon", True, True),
        ("beta", "epsilon", False, True),
        ("beta", "epsilon", True, False),
        (None, "delta", True, True),
        ("gamma", None, True, True),
        (None, None, True, True),
    ]
    for lo, hi, il, iu in cases:
        got = [
            r["doc_id"]
            for r in term_range_values(spark, store, lo, hi, il, iu).collect()
        ]
        def _in(t):
            if lo is not None and (t < lo or (not il and t == lo)):
                return False
            if hi is not None and (t > hi or (not iu and t == hi)):
                return False
            return True
        want = sorted(d for d, ts in _toks().items() if any(_in(t) for t in ts))
        assert got == want, (lo, hi, il, iu)


def test_pinned_topk_order_and_exclusion(spark, store):
    # organic 'alpha' matches: 0, 1, 3; pin doc 3 and a missing id 99
    rows = pinned_topk(spark, store, "alpha", [3, 99], k=3).collect()
    assert [r["doc_id"] for r in rows][0] == 3
    assert rows[0]["is_pinned"] == 1 and rows[0]["score"] is None
    organic = [r["doc_id"] for r in rows if r["is_pinned"] == 0]
    assert 3 not in organic  # pinned excluded from organic tail
    assert set(organic) <= {0, 1}
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))


def test_pinned_topk_pins_fill_k(spark, store):
    rows = pinned_topk(spark, store, "alpha", [2, 4, 0], k=2).collect()
    assert [(r["doc_id"], r["is_pinned"]) for r in rows] == [(2, 1), (4, 1)]


def test_rank_feature_topk(spark, store):
    import math

    from inverted_index_spark.operators.bm25 import bm25_scores
    from inverted_index_spark.operators.es_queries import (
        log_feature,
        rank_feature_topk,
        saturation,
        sigmoid_feature,
    )

    # features: doc 5 (empty, unindexed) and doc 3 missing on purpose
    feats = spark.createDataFrame(
        [(0, 10.0), (1, 50.0), (2, 5.0), (4, 200.0)], "doc_id long, f double"
    )
    base = {
        r["doc_id"]: r["score"]
        for r in bm25_scores(spark, store, ["alpha", "beta"]).collect()
    }
    fv = {0: 10.0, 1: 50.0, 2: 5.0, 4: 200.0}

    cases = [
        (saturation("f", 20.0), lambda x: x / (x + 20.0)),
        (log_feature("f", 1.0), lambda x: math.log(1.0 + x)),
        (
            sigmoid_feature("f", 20.0, 2.0),
            lambda x: x**2 / (x**2 + 20.0**2),
        ),
    ]
    for col, fn in cases:
        got = [
            (r["doc_id"], r["score"])
            for r in rank_feature_topk(
                spark, store, ["alpha", "beta"], feats, col, k=10, boost=3.0
            ).collect()
        ]
        want = sorted(
            (
                (d, s + (3.0 * fn(fv[d]) if d in fv else 0.0))
                for d, s in base.items()
            ),
            key=lambda t: (-t[1], t[0]),
        )
        assert [d for d, _ in got] == [d for d, _ in want]
        for (_, a), (_, b) in zip(got, want):
            assert a == pytest.approx(b)


def test_pinned_topk_scope_excludes_pins(spark, store):
    # doc 0 matches 'alpha OR beta' but lies outside [min_doc=3, ...):
    # the pin must be skipped like every other out-of-scope doc, while
    # the in-scope organic matches (3: alpha, 4: beta) still rank
    rows = pinned_topk(
        spark, store, "alpha OR beta", [0], k=3, min_doc=3
    ).collect()
    assert {r["doc_id"] for r in rows} == {3, 4}
    assert all(r["is_pinned"] == 0 for r in rows)
