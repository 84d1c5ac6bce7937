"""Rank-parity: engine BM25 vs the deterministic pure-pandas oracle
(SURVEY.md §5 — the Go reference cannot score; the oracle carries the
pinned contract). Exact doc_id sequence match, scores within 1e-9."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from inverted_index_spark.operators.bm25 import bm25_topk, corpus_stats
from inverted_index_spark.operators.build import build_index
from inverted_index_spark.oracle import OracleIndex
from inverted_index_spark.sources.store import SegmentStore
from inverted_index_spark.sources.transcripts import generate_transcripts


@pytest.fixture(scope="module")
def corpus(spark):
    """Small deterministic transcript corpus + built index + oracle."""
    df = generate_transcripts(spark, 600, include_doc_id=True).cache()
    pdf = df.select("doc_id", "text").toPandas().sort_values("doc_id")
    return df, pdf


@pytest.fixture(scope="module")
def built(spark, corpus, tmp_path_factory):
    df, pdf = corpus
    store = SegmentStore(str(tmp_path_factory.mktemp("bm25") / "idx"))
    # small bucket size so the corpus spans several buckets
    build_index(spark, df, store, bucket_size=128, block_size=32)
    oracle = OracleIndex.from_docs(pdf)
    return store, oracle


QUERIES = [
    ["w00000"],                      # head Zipf term
    ["w00001", "w00002"],
    ["w00003", "w01500", "w19000"],  # head + tail mix
    ["бесплатно"],                   # unicode
    ["doesnotexist"],                # missing term → empty
    ["w00000", "doesnotexist"],
    ["w00042", "w00007", "w00123", "w00999", "w05000"],  # 5 terms
]


@pytest.mark.parametrize("terms", QUERIES)
def test_topk_rank_parity(spark, built, terms):
    store, oracle = built
    expect = oracle.bm25_topk(terms, k=10)
    got = bm25_topk(spark, store, terms, k=10).collect()
    assert [r["doc_id"] for r in got] == [d for d, _ in expect]
    for r, (_, s) in zip(got, expect):
        assert abs(r["score"] - s) < 1e-9


def test_corpus_stats_parity(spark, built):
    store, oracle = built
    n, avgdl = corpus_stats(spark, store)
    assert n == oracle.n_docs
    assert abs(avgdl - oracle.avgdl) < 1e-9


def test_text_equality_invariant(spark, corpus):
    """input_hint: per-turn text equality under stable (conv_id,
    turn_idx) ordering — round-trip through parquet preserves text."""
    df, pdf = corpus
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.write.mode("overwrite").parquet(f"{d}/t")
        back = (
            spark.read.parquet(f"{d}/t")
            .orderBy("conv_id", "turn_idx")
            .select("conv_id", "turn_idx", "text", "doc_id")
            .toPandas()
        )
    orig = (
        df.select("conv_id", "turn_idx", "text", "doc_id")
        .orderBy("conv_id", "turn_idx")
        .toPandas()
    )
    pd.testing.assert_frame_equal(back, orig)
    # doc_id is the dense rank of that ordering
    assert (orig["doc_id"].to_numpy() == np.arange(len(orig))).all()


def test_synonym_scoring(spark):
    """Lucene SynonymQuery semantics vs a hand-computed oracle:
    tf summed over group members, idf from the max member df."""
    import math
    import tempfile

    from inverted_index_spark.functions.tokenizer import tokenize_text
    from inverted_index_spark.operators.bm25 import synonym_topk, synonym_scores
    from inverted_index_spark.operators.build import build_index
    from inverted_index_spark.sources.store import SegmentStore

    DOCS = [
        (0, "fast fast car"),
        (1, "quick car and quick driver"),
        (2, "fast quick fast"),
        (3, "slow walk home"),
        (4, "car car car"),
    ]
    store = SegmentStore(tempfile.mkdtemp(prefix="ii_syn_") + "/idx")
    build_index(
        spark, spark.createDataFrame(DOCS, "doc_id long, text string"),
        store, bucket_size=4,
    )
    groups = [["fast", "quick"], ["car"]]
    toks = {d: tokenize_text(t) for d, t in DOCS}
    n = len(DOCS)
    avgdl = sum(len(v) for v in toks.values()) / n

    def df(t):
        return sum(1 for v in toks.values() if t in v)

    def idf(d):
        return math.log((n - d + 0.5) / (d + 0.5) + 1.0)

    want = {}
    for d, v in toks.items():
        s = 0.0
        for g in groups:
            tfp = sum(v.count(t) for t in g)
            if tfp == 0:
                continue
            dfp = max(df(t) for t in g)
            s += idf(dfp) * tfp / (tfp + 1.2 * (1 - 0.75 + 0.75 * len(v) / avgdl))
        if s > 0:
            want[d] = s
    got = {r["doc_id"]: r["score"] for r in synonym_scores(spark, store, groups).collect()}
    assert set(got) == set(want)
    for d in want:
        assert abs(got[d] - want[d]) < 1e-9
    # topk ordering + tie contract
    order = [r["doc_id"] for r in synonym_topk(spark, store, groups, k=5).collect()]
    assert order == sorted(want, key=lambda d: (-want[d], d))
    # overlapping groups rejected
    import pytest as _pytest

    with _pytest.raises(ValueError, match="disjoint"):
        synonym_scores(spark, store, [["fast"], ["fast", "car"]])
