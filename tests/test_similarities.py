"""Pluggable similarities (ClassicSimilarity TF-IDF, LMDirichlet):
parity vs pure-python oracles over the pinned contracts, single- and
multi-segment, plus the dispatcher surface."""

from __future__ import annotations

import math

import pytest

from inverted_index_spark.functions.tokenizer import tokenize_text
from inverted_index_spark.operators.bm25 import (
    classic_scores,
    lm_dirichlet_scores,
    similarity_topk,
)
from inverted_index_spark.operators.build import build_index
from inverted_index_spark.sources.store import SegmentStore

DOCS = [
    (0, "spark merge window spark"),
    (1, "spark table scan merge merge"),
    (2, "window table hash join"),
    (3, "entirely unrelated words here"),
    (4, "spark spark spark window"),
    (5, "merge"),
]


def _corpus():
    toks = {d: tokenize_text(t) for d, t in DOCS}
    n = len(DOCS)
    avgdl = sum(len(v) for v in toks.values()) / n
    return toks, n, avgdl


def _classic_oracle(terms):
    toks, n, _ = _corpus()
    dfs = {t: sum(1 for v in toks.values() if t in v) for t in set(terms)}
    out = {}
    for d, v in toks.items():
        s = 0.0
        for t in set(terms):
            tf = v.count(t)
            if tf == 0 or dfs[t] == 0:
                continue
            s += math.sqrt(tf) * (1 + math.log(n / (dfs[t] + 1.0))) ** 2 / math.sqrt(len(v))
        if s > 0:
            out[d] = s
    return out

def _lmd_oracle(terms, mu=2000.0):
    toks, n, avgdl = _corpus()
    total = n * avgdl
    ctf = {t: sum(v.count(t) for v in toks.values()) for t in set(terms)}
    out = {}
    for d, v in toks.items():
        s, matched = 0.0, False
        for t in set(terms):
            tf = v.count(t)
            if tf == 0 or ctf[t] == 0:
                continue
            matched = True
            p = ctf[t] / total
            c = math.log(1 + tf / (mu * p)) + math.log(mu / (len(v) + mu))
            s += max(0.0, c)
        if matched:
            out[d] = s
    return out


@pytest.fixture(params=[1, 3], ids=["one-segment", "three-segments"])
def sim_store(spark, tmp_path, request):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    store = SegmentStore(str(tmp_path / "sim_idx"))
    n = request.param
    per = (len(DOCS) + n - 1) // n
    for i in range(n):
        chunk = docs.where(
            (docs.doc_id >= i * per) & (docs.doc_id < (i + 1) * per)
        )
        build_index(spark, chunk, store, bucket_size=2)
    return store


def test_classic_parity(spark, sim_store):
    got = {
        r["doc_id"]: r["score"]
        for r in classic_scores(spark, sim_store, ["spark", "merge"]).collect()
    }
    want = _classic_oracle(["spark", "merge"])
    assert set(got) == set(want)
    for d in want:
        assert got[d] == pytest.approx(want[d], rel=1e-9)


def test_lm_dirichlet_parity(spark, sim_store):
    got = {
        r["doc_id"]: r["score"]
        for r in lm_dirichlet_scores(
            spark, sim_store, ["spark", "merge"]
        ).collect()
    }
    want = _lmd_oracle(["spark", "merge"])
    assert set(got) == set(want)
    for d in want:
        assert got[d] == pytest.approx(want[d], rel=1e-9)


def test_lm_dirichlet_clamp(spark, sim_store):
    """A ubiquitous term in a long doc can have a negative raw
    contribution — the clamp keeps scores >= 0 (Lucene behavior)."""
    got = lm_dirichlet_scores(spark, sim_store, ["merge"], mu=1.0).collect()
    assert got and all(r["score"] >= 0.0 for r in got)


def test_similarity_dispatcher(spark, sim_store):
    for sim, oracle in [
        ("classic", _classic_oracle(["spark"])),
        ("dirichlet", _lmd_oracle(["spark"])),
    ]:
        top = similarity_topk(spark, sim_store, ["spark"], k=3, similarity=sim)
        want = sorted(oracle.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
        got = [(r["doc_id"], r["score"]) for r in top.collect()]
        assert [d for d, _ in got] == [d for d, _ in want]
    # bm25 dispatch equals the canonical scorer
    from inverted_index_spark.operators.bm25 import bm25_topk

    a = similarity_topk(spark, sim_store, ["spark"], k=3).collect()
    b = bm25_topk(spark, sim_store, ["spark"], k=3).collect()
    assert [(r["doc_id"], r["score"]) for r in a] == [
        (r["doc_id"], r["score"]) for r in b
    ]
    with pytest.raises(ValueError, match="unknown similarity"):
        similarity_topk(spark, sim_store, ["spark"], similarity="dfr")


def test_range_scoped_scores(spark, sim_store):
    got = {
        r["doc_id"]
        for r in lm_dirichlet_scores(
            spark, sim_store, ["spark"], min_doc=1, max_doc=4
        ).collect()
    }
    assert got == {1, 4}
    got_c = {
        r["doc_id"]
        for r in classic_scores(
            spark, sim_store, ["spark"], min_doc=1, max_doc=4
        ).collect()
    }
    assert got_c == {1, 4}
