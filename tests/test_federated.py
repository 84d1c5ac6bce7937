"""Federated (multi-index) search must be rank- and value-identical to
a single merged index: FederatedStore presents member stores' segments
as one segment list, and every multi-segment-safe read operator then
gives dfs_query_then_fetch semantics (global N/avgdl/df) for free."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from inverted_index_spark.operators.bm25 import bm25_topk, corpus_stats
from inverted_index_spark.operators.build import build_index
from inverted_index_spark.operators.positions import phrase_match
from inverted_index_spark.operators.query import read_terms, read_values
from inverted_index_spark.sources.federated import FederatedStore
from inverted_index_spark.sources.store import SegmentStore
from inverted_index_spark.sources.transcripts import generate_transcripts


@pytest.fixture(scope="module")
def setup(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("federated")
    docs = generate_transcripts(spark, 600, include_doc_id=True)
    whole = SegmentStore(str(root / "whole"))
    build_index(spark, docs, whole, bucket_size=128, positions=True,
                store_text=True)
    parts = []
    for i in range(2):
        part = SegmentStore(str(root / f"part{i}"))
        build_index(
            spark,
            docs.where(F.col("doc_id") % 2 == i),
            part,
            bucket_size=128,
            positions=True,
            store_text=True,
        )
        parts.append(part)
    return whole, FederatedStore(parts), parts


def test_corpus_stats_global(spark, setup):
    whole, fed, _ = setup
    assert corpus_stats(spark, fed) == corpus_stats(spark, whole)


def test_read_terms_union(spark, setup):
    whole, fed, _ = setup
    assert (
        read_terms(spark, fed).collect() == read_terms(spark, whole).collect()
    )


def test_read_values_union(spark, setup):
    whole, fed, _ = setup
    got = read_values(spark, fed, ["w00000", "w00001"], 50, 400).collect()
    want = read_values(spark, whole, ["w00000", "w00001"], 50, 400).collect()
    assert got == want


@pytest.mark.parametrize(
    "terms", [["w00000"], ["w00001", "w00002"], ["w00042", "w00007", "w00123"]]
)
def test_bm25_rank_identical_to_merged_index(spark, setup, terms):
    whole, fed, _ = setup
    want = [
        (r["doc_id"], round(r["score"], 9))
        for r in bm25_topk(spark, whole, terms, 10).collect()
    ]
    got = [
        (r["doc_id"], round(r["score"], 9))
        for r in bm25_topk(spark, fed, terms, 10).collect()
    ]
    assert got == want


def test_phrase_match_spans_members(spark, setup):
    whole, fed, _ = setup
    want = sorted(
        r["doc_id"]
        for r in phrase_match(spark, whole, ["w00000", "w00001"]).collect()
    )
    got = sorted(
        r["doc_id"]
        for r in phrase_match(spark, fed, ["w00000", "w00001"]).collect()
    )
    assert got == want


def test_doc_store_hydration(spark, setup):
    whole, fed, _ = setup
    got = {r["doc_id"]: r["text"] for r in fed.read_docs(spark).collect()}
    want = {r["doc_id"]: r["text"] for r in whole.read_docs(spark).collect()}
    assert got == want


def test_rejects_mismatched_bucket_size(spark, tmp_path):
    docs = generate_transcripts(spark, 100, include_doc_id=True)
    a = SegmentStore(str(tmp_path / "a"))
    b = SegmentStore(str(tmp_path / "b"))
    build_index(spark, docs, a, bucket_size=64)
    build_index(spark, docs, b, bucket_size=128)
    with pytest.raises(ValueError, match="bucket sizes"):
        FederatedStore([a, b])


def test_rejects_members_with_deletes(spark, tmp_path):
    docs = generate_transcripts(spark, 100, include_doc_id=True)
    a = SegmentStore(str(tmp_path / "a"))
    build_index(spark, docs, a, bucket_size=64)
    a.delete_docs(spark, [0])
    with pytest.raises(ValueError, match="delete-free"):
        FederatedStore([a])


def test_read_only(spark, setup):
    _, fed, _ = setup
    with pytest.raises(PermissionError):
        fed.delete_docs(spark, [1])
