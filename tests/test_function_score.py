"""function_score (ES-style attribute re-weighting of BM25 ranks):
combine modes and factor helpers must match hand-computed math on the
exhaustive score set."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from inverted_index_spark.operators.bm25 import (
    bm25_scores,
    field_value_factor,
    function_score_topk,
    gauss_decay,
)
from inverted_index_spark.operators.build import build_index
from inverted_index_spark.sources.store import SegmentStore
from inverted_index_spark.sources.transcripts import generate_transcripts

TERMS = ["w00000", "w00001"]


@pytest.fixture(scope="module")
def setup(spark, tmp_path_factory):
    store = SegmentStore(str(tmp_path_factory.mktemp("fscore") / "idx"))
    docs = generate_transcripts(spark, 400, include_doc_id=True)
    build_index(spark, docs, store, bucket_size=128)
    # per-doc attribute: a deterministic pseudo-popularity
    fields = docs.select(
        "doc_id", (F.col("doc_id") % 7 + 1).cast("double").alias("pop")
    )
    return store, fields


def _expected(spark, store, fields, combine, fac_fn, k=10):
    base = {
        r["doc_id"]: r["score"]
        for r in bm25_scores(spark, store, TERMS).collect()
    }
    pops = {r["doc_id"]: r["pop"] for r in fields.collect()}
    rescored = [
        (d, combine(s, fac_fn(pops.get(d))))
        for d, s in base.items()
    ]
    rescored.sort(key=lambda t: (-t[1], t[0]))
    return [(d, round(s, 9)) for d, s in rescored[:k]]


def test_multiply_log1p(spark, setup):
    store, fields = setup
    got = [
        (r["doc_id"], round(r["score"], 9))
        for r in function_score_topk(
            spark, store, TERMS, fields,
            field_value_factor("pop", factor=2.0, modifier="log1p"),
        ).collect()
    ]
    want = _expected(
        spark, store, fields, lambda s, f: s * f,
        lambda p: math.log1p(2.0 * p),
    )
    assert got == want


def test_sum_mode_and_missing_default(spark, setup):
    store, fields = setup
    # drop half the docs from fields: missing docs take factor=coalesce→1
    half = fields.where(F.col("doc_id") % 2 == 0)
    got = [
        (r["doc_id"], round(r["score"], 9))
        for r in function_score_topk(
            spark, store, TERMS, half,
            field_value_factor("pop", modifier="sqrt"),
            boost_mode="sum",
        ).collect()
    ]
    want = _expected(
        spark, store, half, lambda s, f: s + f,
        lambda p: 1.0 if p is None else math.sqrt(p),
    )
    assert got == want


def test_gauss_decay_formula(spark):
    df = spark.createDataFrame(
        [(float(x),) for x in (0, 5, 10, 20, 50)], "x double"
    )
    got = {
        r["x"]: r["g"]
        for r in df.select(
            "x", gauss_decay("x", origin=10.0, scale=20.0, decay=0.5,
                             offset=2.0).alias("g")
        ).collect()
    }
    sigma2 = -(20.0**2) / (2.0 * math.log(0.5))
    for x, g in got.items():
        dist = max(0.0, abs(x - 10.0) - 2.0)
        assert g == pytest.approx(math.exp(-(dist * dist) / (2 * sigma2)))


def test_bad_args(spark, setup):
    store, fields = setup
    with pytest.raises(ValueError, match="modifier"):
        field_value_factor("pop", modifier="cube")
    with pytest.raises(ValueError, match="boost_mode"):
        function_score_topk(
            spark, store, TERMS, fields,
            field_value_factor("pop"), boost_mode="max",
        )
    with pytest.raises(ValueError, match="decay"):
        gauss_decay("x", 0.0, 1.0, decay=1.5)


def test_reciprocal_zero_field(spark):
    """reciprocal of a 0 field value scores 0.0 — must not abort under
    Spark 4's default ANSI division."""
    from inverted_index_spark.operators.bm25 import field_value_factor

    df = spark.createDataFrame(
        [(0, 4.0), (1, 0.0), (2, None)], "doc_id long, likes double"
    )
    got = {
        r["doc_id"]: r["v"]
        for r in df.select(
            "doc_id",
            field_value_factor("likes", modifier="reciprocal", missing=2.0)
            .alias("v"),
        ).collect()
    }
    assert got == {0: 0.25, 1: 0.0, 2: 0.5}


def test_random_score_deterministic_uniform(spark, setup):
    """random_score: in [0,1), reproducible, seed-independent orders,
    and composes with function_score_topk."""
    from inverted_index_spark.operators.bm25 import random_score

    store, fields = setup
    vals = fields.select(
        "doc_id",
        random_score(7).alias("r7"),
        random_score(8).alias("r8"),
    )
    rows = vals.collect()
    assert all(0.0 <= r["r7"] < 1.0 for r in rows)
    # deterministic across evaluations
    again = {r["doc_id"]: r["r7"] for r in vals.collect()}
    assert all(again[r["doc_id"]] == r["r7"] for r in rows)
    # different seeds → different orderings (not a constant shift)
    by7 = [r["doc_id"] for r in sorted(rows, key=lambda r: r["r7"])]
    by8 = [r["doc_id"] for r in sorted(rows, key=lambda r: r["r8"])]
    assert by7 != by8
    # rough uniformity: mean of ~400 draws within [0.4, 0.6]
    mean = sum(r["r7"] for r in rows) / len(rows)
    assert 0.4 < mean < 0.6
    # composes as a function_score factor
    top = function_score_topk(
        spark, store, TERMS, fields, random_score(7), k=5,
        boost_mode="sum",
    ).collect()
    assert len(top) == 5


def test_boosting_query_demotes(spark, setup):
    """ES boosting query: negative matches keep their rank order but
    their scores shrink by negative_boost; negative-only docs absent."""
    from inverted_index_spark.operators.boolean import boosting_topk

    store, _ = setup
    pos = {
        r["doc_id"]: r["score"]
        for r in bm25_scores(spark, store, TERMS).collect()
    }
    neg = {
        r["doc_id"]
        for r in bm25_scores(spark, store, ["w00002"]).collect()
    }
    rescored = [
        (d, s * 0.25 if d in neg else s) for d, s in pos.items()
    ]
    rescored.sort(key=lambda t: (-t[1], t[0]))
    want = rescored[:10]
    got = [
        (r["doc_id"], r["score"])
        for r in boosting_topk(
            spark, store, "w00000 OR w00001", "w00002",
            negative_boost=0.25, k=10,
        ).collect()
    ]
    assert [d for d, _ in got] == [d for d, _ in want]
    for (_, g), (_, w) in zip(got, want):
        assert g == pytest.approx(w, rel=1e-12)
    # no negative matches -> identical to ranked_topk
    from inverted_index_spark.operators.boolean import ranked_topk

    plain = ranked_topk(spark, store, "w00000 OR w00001", k=10).collect()
    same = boosting_topk(
        spark, store, "w00000 OR w00001", "zzznotaterm", k=10
    ).collect()
    assert [(r["doc_id"], r["score"]) for r in plain] == [
        (r["doc_id"], r["score"]) for r in same
    ]
    with pytest.raises(ValueError, match="negative_boost"):
        boosting_topk(spark, store, "w00000", "w00001", negative_boost=1.0)
