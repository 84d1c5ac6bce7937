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


def test_stream_ingest_with_concurrent_compaction(spark, tmp_path):
    """The round-1 gap made real: streaming ingest COMMITTING WHILE a
    compactor merges and cleans the same store. The CAS manifest
    serializes both writers; the tombstone grace window protects
    readers; final results equal a batch build of the same corpus."""
    import threading
    import time

    from inverted_index_spark.operators.merge import merge_segments

    docs = generate_transcripts(spark, 400, include_doc_id=True).cache()
    src = str(tmp_path / "src")
    docs.repartition(8).write.mode("overwrite").parquet(src)

    store = SegmentStore(str(tmp_path / "race_idx"))
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", "1")  # 8 micro-batches → 8 commits
        .parquet(src)
    )
    stop = threading.Event()
    merges: list[str] = []
    errors: list[Exception] = []

    def compactor() -> None:
        try:
            while not stop.is_set():
                sid = merge_segments(spark, store, min_files=2, max_files=4)
                if sid:
                    merges.append(sid)
                store.cleanup(grace_s=5.0)
                time.sleep(0.2)
        except Exception as e:  # pragma: no cover
            errors.append(e)

    t = threading.Thread(target=compactor)
    t.start()
    q = stream_to_segments(
        stream, store,
        build_id="race", bucket_size=64,
        checkpoint_dir=str(tmp_path / "ckpt_race"),
    )
    q.awaitTermination(180)
    # let the compactor finish at least one more full pass, then stop
    time.sleep(1.0)
    stop.set()
    t.join(timeout=120)
    assert not errors, errors[:2]
    assert merges, "compactor never merged — the race was not exercised"

    batch_store = SegmentStore(str(tmp_path / "race_batch_idx"))
    build_index(spark, docs, batch_store, bucket_size=64)
    s_terms = [r["term"] for r in read_terms(spark, store).collect()]
    b_terms = [r["term"] for r in read_terms(spark, batch_store).collect()]
    assert s_terms == b_terms
    sq = ["w00000", "w00002"]
    s_top = [(r["doc_id"], round(r["score"], 9)) for r in bm25_topk(spark, store, sq, 10).collect()]
    b_top = [(r["doc_id"], round(r["score"], 9)) for r in bm25_topk(spark, batch_store, sq, 10).collect()]
    assert s_top == b_top
    s_vals = [r["doc_id"] for r in read_all_values(spark, store, sq).collect()]
    b_vals = [r["doc_id"] for r in read_all_values(spark, batch_store, sq).collect()]
    assert s_vals == b_vals


def test_stream_ingest_with_positions_phrase(spark, tmp_path):
    """Streamed micro-segments carrying the positional artifact answer
    phrase queries identically to a batch positional build, before AND
    after compacting the micro-segments."""
    from inverted_index_spark.operators.positions import phrase_match

    docs = generate_transcripts(spark, 200, include_doc_id=True).cache()
    src = str(tmp_path / "psrc")
    docs.repartition(4).write.mode("overwrite").parquet(src)

    stream_store = SegmentStore(str(tmp_path / "pstream_idx"))
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", "2")
        .parquet(src)
    )
    q = stream_to_segments(
        stream, stream_store,
        build_id="p1", bucket_size=64,
        checkpoint_dir=str(tmp_path / "pckpt"),
        positions=True, store_text=True,
    )
    q.awaitTermination(120)

    batch_store = SegmentStore(str(tmp_path / "pbatch_idx"))
    build_index(spark, docs, batch_store, bucket_size=64, positions=True)

    # pick a phrase that actually occurs: first two tokens of some doc
    row = docs.limit(1).collect()[0]
    phrase = row["text"].lower().split()[:2]
    want = sorted(
        (r["doc_id"], r["n_matches"])
        for r in phrase_match(spark, batch_store, phrase).collect()
    )
    assert want, f"picked phrase {phrase} matches nothing — bad fixture"
    got = sorted(
        (r["doc_id"], r["n_matches"])
        for r in phrase_match(spark, stream_store, phrase).collect()
    )
    assert got == want
    merge_until_one(spark, stream_store)
    after = sorted(
        (r["doc_id"], r["n_matches"])
        for r in phrase_match(spark, stream_store, phrase).collect()
    )
    assert after == want
    # streamed doc store hydrates text byte-for-byte across micro-segments
    got_text = {
        r["doc_id"]: r["text"] for r in stream_store.read_docs(spark).collect()
    }
    want_text = {r["doc_id"]: r["text"] for r in docs.collect()}
    assert got_text == want_text
