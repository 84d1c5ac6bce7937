"""Structured-Streaming ingest: micro-batches become immutable
segments; replayed batches are idempotent; merged results equal a
batch build (the reference's LSM shape under a stream)."""

from __future__ import annotations

import pytest

from inverted_index_spark.operators.bm25 import bm25_topk
from inverted_index_spark.operators.build import build_index
from inverted_index_spark.operators.merge import merge_until_one
from inverted_index_spark.operators.query import read_all_values, read_terms
from inverted_index_spark.sources.store import SegmentStore
from inverted_index_spark.sources.transcripts import generate_transcripts
from inverted_index_spark.streaming.ingest import stream_to_segments


def test_stream_ingest_matches_batch(spark, tmp_path):
    docs = generate_transcripts(spark, 200, include_doc_id=True).cache()
    src = str(tmp_path / "src")
    # several files → several micro-batches under maxFilesPerTrigger
    docs.repartition(4).write.mode("overwrite").parquet(src)

    stream_store = SegmentStore(str(tmp_path / "stream_idx"))
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", "2")
        .parquet(src)
    )
    q = stream_to_segments(
        stream, stream_store,
        build_id="s1", bucket_size=64,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)

    batch_store = SegmentStore(str(tmp_path / "batch_idx"))
    build_index(spark, docs, batch_store, bucket_size=64)

    assert len(stream_store.live_segments()) >= 1
    s_terms = [r["term"] for r in read_terms(spark, stream_store).collect()]
    b_terms = [r["term"] for r in read_terms(spark, batch_store).collect()]
    assert s_terms == b_terms
    sq = ["w00000", "w00003"]
    s_top = [(r["doc_id"], round(r["score"], 9)) for r in bm25_topk(spark, stream_store, sq, 10).collect()]
    b_top = [(r["doc_id"], round(r["score"], 9)) for r in bm25_topk(spark, batch_store, sq, 10).collect()]
    assert s_top == b_top
    # compaction of streamed micro-segments preserves results too
    merge_until_one(spark, stream_store)
    m_top = [(r["doc_id"], round(r["score"], 9)) for r in bm25_topk(spark, stream_store, sq, 10).collect()]
    assert m_top == b_top
