"""ES parent-child search vs a brute-force oracle over the engine's
own child scores."""

from __future__ import annotations

import pytest

from inverted_index_spark.operators.bm25 import bm25_scores
from inverted_index_spark.operators.build import build_index
from inverted_index_spark.operators.parent_child import (
    child_inner_hits,
    has_child_scores,
    has_child_topk,
)
from inverted_index_spark.sources.store import SegmentStore
from inverted_index_spark.sources.transcripts import generate_transcripts

TERMS = ["w00000", "w00001"]
N_PARENTS = 7


@pytest.fixture(scope="module")
def fixture(spark, tmp_path_factory):
    store = SegmentStore(str(tmp_path_factory.mktemp("pc") / "idx"))
    docs = generate_transcripts(spark, 500, include_doc_id=True)
    build_index(spark, docs, store, bucket_size=128, block_size=16)
    from pyspark.sql import functions as F

    child_parent = (
        spark.range(500)
        .select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("p"), (F.col("id") % N_PARENTS).cast("string")).alias(
                "parent_id"
            ),
        )
    )
    return store, child_parent


def _oracle(spark, store, child_parent):
    scores = {
        r["doc_id"]: r["score"] for r in bm25_scores(spark, store, TERMS).collect()
    }
    parent_of = {r["doc_id"]: r["parent_id"] for r in child_parent.collect()}
    by_parent: dict[str, list[tuple[int, float]]] = {}
    for d, s in scores.items():
        if d in parent_of:  # unmapped children drop out (inner join)
            by_parent.setdefault(parent_of[d], []).append((d, s))
    return by_parent


@pytest.mark.parametrize("mode", ["max", "sum", "avg", "min"])
def test_score_modes(spark, fixture, mode):
    store, cp = fixture
    by_parent = _oracle(spark, store, cp)
    got = {
        r["parent_id"]: (r["score"], r["n_children"])
        for r in has_child_scores(spark, store, TERMS, cp, score_mode=mode).collect()
    }
    assert set(got) == set(by_parent)
    import statistics

    fn = {"max": max, "min": min, "sum": sum, "avg": statistics.mean}[mode]
    for p, kids in by_parent.items():
        want = fn([s for _, s in kids])
        assert got[p][0] == pytest.approx(want, rel=1e-12), (p, mode)
        assert got[p][1] == len(kids)


def test_score_mode_none_counts_only(spark, fixture):
    store, cp = fixture
    by_parent = _oracle(spark, store, cp)
    got = {
        r["parent_id"]: (r["score"], r["n_children"])
        for r in has_child_scores(spark, store, TERMS, cp, score_mode="none").collect()
    }
    assert all(v[0] == 0.0 for v in got.values())
    assert {p: v[1] for p, v in got.items()} == {
        p: len(k) for p, k in by_parent.items()
    }


def test_children_count_gates(spark, fixture):
    store, cp = fixture
    by_parent = _oracle(spark, store, cp)
    counts = {p: len(k) for p, k in by_parent.items()}
    lo = sorted(counts.values())[len(counts) // 2]  # median gate
    got = {
        r["parent_id"]
        for r in has_child_scores(
            spark, store, TERMS, cp, min_children=lo
        ).collect()
    }
    assert got == {p for p, c in counts.items() if c >= lo}
    capped = {
        r["parent_id"]
        for r in has_child_scores(
            spark, store, TERMS, cp, max_children=lo
        ).collect()
    }
    assert capped == {p for p, c in counts.items() if c <= lo}


def test_topk_order(spark, fixture):
    store, cp = fixture
    by_parent = _oracle(spark, store, cp)
    want = sorted(
        ((max(s for _, s in k), p) for p, k in by_parent.items()),
        key=lambda t: (-t[0], t[1]),
    )[:3]
    got = [
        (r["score"], r["parent_id"])
        for r in has_child_topk(spark, store, TERMS, cp, k=3).collect()
    ]
    assert [(round(s, 9), p) for s, p in got] == [
        (round(s, 9), p) for s, p in want
    ]


def test_inner_hits(spark, fixture):
    store, cp = fixture
    by_parent = _oracle(spark, store, cp)
    got: dict[str, list[tuple[int, int]]] = {}
    for r in child_inner_hits(spark, store, TERMS, cp, n_per_parent=2).collect():
        got.setdefault(r["parent_id"], []).append((r["child_rank"], r["doc_id"]))
    for p, kids in by_parent.items():
        want = [
            d for d, _ in sorted(kids, key=lambda t: (-t[1], t[0]))[:2]
        ]
        assert [d for _, d in sorted(got[p])] == want, p


def test_bad_mode(spark, fixture):
    store, cp = fixture
    with pytest.raises(ValueError, match="score_mode"):
        has_child_scores(spark, store, TERMS, cp, score_mode="median")


def test_has_parent_topk(spark, fixture):
    """has_parent: children inherit their parent's BM25 score; filter
    context (score=False) is constant-0 with doc_id order."""
    from pyspark.sql import functions as F

    from inverted_index_spark.operators.parent_child import has_parent_topk

    store, _ = fixture
    # parents must be indexed docs for has_parent: child d -> doc d % 7
    cp = spark.range(500).select(
        F.col("id").alias("doc_id"), (F.col("id") % N_PARENTS).alias("parent_id")
    )
    pscores = {
        r["doc_id"]: r["score"]
        for r in bm25_scores(spark, store, TERMS).collect()
    }
    cand = [
        (d, d % N_PARENTS, pscores[d % N_PARENTS])
        for d in range(500)
        if d % N_PARENTS in pscores
    ]
    want = sorted(cand, key=lambda t: (-t[2], t[0]))[:10]
    got = [
        (r["doc_id"], r["parent_id"], r["score"])
        for r in has_parent_topk(spark, store, TERMS, cp, k=10).collect()
    ]
    assert [(d, p) for d, p, _ in got] == [(d, p) for d, p, _ in want]
    for (_, _, g), (_, _, w) in zip(got, want):
        assert g == pytest.approx(w, rel=1e-12)
    # filter context: scores 0.0, first k matching children by doc_id
    got0 = has_parent_topk(
        spark, store, TERMS, cp, k=5, score=False
    ).collect()
    assert all(r["score"] == 0.0 for r in got0)
    assert [r["doc_id"] for r in got0] == sorted(d for d, _, _ in cand)[:5]
