"""delete_by_query (operators.boolean) — Lucene's
IndexWriter.deleteDocuments(Query) analog: the boolean match set of an
arbitrary query tree becomes one tombstone batch.

Contract: identical end state to evaluate() + delete_docs(ids); every
read surface excludes the matches immediately; an empty match set
commits nothing; the CLI wires --query through."""

from __future__ import annotations

from pyspark.sql import functions as F

from inverted_index_spark.operators.boolean import (
    delete_by_query,
    evaluate,
    parse_query,
)
from inverted_index_spark.operators.bm25 import corpus_stats
from inverted_index_spark.operators.build import build_index
from inverted_index_spark.operators.query import read_values
from inverted_index_spark.sources.store import SegmentStore
from inverted_index_spark.sources.transcripts import generate_transcripts


def _vals(df):
    return [r["doc_id"] for r in df.orderBy("doc_id").collect()]


def test_delete_by_query_matches_evaluate(spark, tmp_path):
    docs = generate_transcripts(spark, 150, include_doc_id=True).cache()
    store = SegmentStore(str(tmp_path / "idx"))
    twin = SegmentStore(str(tmp_path / "twin"))
    build_index(spark, docs, store, bucket_size=64, block_size=16)
    build_index(spark, docs, twin, bucket_size=64, block_size=16)

    q = "w00000 OR w00001"
    expect_gone = _vals(evaluate(spark, store, parse_query(q)))
    assert expect_gone

    del_id = delete_by_query(spark, store, q)
    assert del_id is not None
    # identical end state to the id-list path
    ids = [r["doc_id"] for r in evaluate(spark, twin, parse_query(q)).collect()]
    twin.delete_docs(spark, ids)

    for probe in (["w00000"], ["w00003"], ["w00042"]):
        assert _vals(read_values(spark, store, probe)) == _vals(
            read_values(spark, twin, probe)
        )
    # matches are gone from every read, and BM25 N reflects it
    assert _vals(read_values(spark, store, ["w00000"])) == []
    n, _avgdl = corpus_stats(spark, store)
    n_twin, _ = corpus_stats(spark, twin)
    assert n == n_twin


def test_delete_by_query_boolean_shapes(spark, tmp_path):
    """NOT / AND compositions delete exactly their match set."""
    docs = generate_transcripts(spark, 150, include_doc_id=True).cache()
    store = SegmentStore(str(tmp_path / "idx"))
    build_index(spark, docs, store, bucket_size=64, block_size=16)
    before = set(_vals(read_values(spark, store, ["w00003"])))
    gone = set(
        _vals(evaluate(spark, store, parse_query("w00003 -w00000")))
    )
    delete_by_query(spark, store, "w00003 -w00000")
    left = set(_vals(read_values(spark, store, ["w00003"])))
    assert left == before - gone


def test_delete_by_query_no_match_is_noop(spark, tmp_path):
    docs = generate_transcripts(spark, 60, include_doc_id=True)
    store = SegmentStore(str(tmp_path / "idx"))
    build_index(spark, docs, store, bucket_size=64, block_size=16)
    gens = store.current_generation()
    assert delete_by_query(spark, store, "zzzneverseen") is None
    assert store.current_generation() == gens
    assert not store.has_deletes()
