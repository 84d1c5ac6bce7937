"""WAND is a flag, not a semantics change: bm25_topk_wand must equal
the naive exhaustive scorer exactly (SURVEY.md §4 item 2)."""

from __future__ import annotations

import pytest

from inverted_index_spark.operators.bm25 import bm25_topk
from inverted_index_spark.operators.build import build_index
from inverted_index_spark.operators.wand import bm25_topk_wand
from inverted_index_spark.sources.store import SegmentStore
from inverted_index_spark.sources.transcripts import generate_transcripts


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    store = SegmentStore(str(tmp_path_factory.mktemp("wand") / "idx"))
    docs = generate_transcripts(spark, 800, include_doc_id=True)
    build_index(spark, docs, store, bucket_size=128, block_size=16)
    return store


@pytest.mark.parametrize(
    "terms,k",
    [
        (["w00000"], 10),
        (["w00001", "w00002"], 5),
        (["w00003", "w01500", "w19000"], 10),
        (["w00042", "w00007", "w00123", "w00999", "w05000"], 20),
        (["doesnotexist"], 10),
        (["бесплатно", "w00000"], 10),
    ],
)
def test_wand_equals_naive(spark, built, terms, k):
    naive = [
        (r["doc_id"], round(r["score"], 12))
        for r in bm25_topk(spark, built, terms, k).collect()
    ]
    wand = [
        (r["doc_id"], round(r["score"], 12))
        for r in bm25_topk_wand(spark, built, terms, k).collect()
    ]
    assert wand == naive
