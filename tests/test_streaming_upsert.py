"""Streaming upsert sink (streaming.ingest.stream_upserts): each
micro-batch applies reindex_docs — atomic delete+add per batch — so a
stream of document corrections converges to the same corpus a batch
reindex produces, and replays are idempotent."""

from __future__ import annotations

from pyspark.sql import functions as F

from inverted_index_spark.operators.build import build_index, reindex_docs
from inverted_index_spark.operators.query import read_values
from inverted_index_spark.operators.search import Searcher
from inverted_index_spark.sources.store import SegmentStore
from inverted_index_spark.sources.transcripts import generate_transcripts
from inverted_index_spark.streaming.ingest import stream_upserts


def _updates(docs, victims):
    return docs.where(F.col("doc_id").isin(victims)).select(
        "doc_id",
        F.concat(
            F.lit("zzstreamfix doc"), F.col("doc_id").cast("string")
        ).alias("text"),
    )


def _vals(df):
    return [r["doc_id"] for r in df.orderBy("doc_id").collect()]


def _run(stream_src, store, ckpt, schema, spark, build_id="up1"):
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "2")
        .parquet(stream_src)
    )
    q = stream_upserts(
        stream, store, build_id=build_id, bucket_size=64,
        checkpoint_dir=ckpt,
    )
    assert q.awaitTermination(180), "upsert stream did not finish"


def test_stream_upserts_match_batch_reindex(spark, tmp_path):
    docs = generate_transcripts(spark, 200, include_doc_id=True).cache()
    victims = [3, 17, 42, 99, 140]

    # streamed store: base build, then corrections arrive as a stream
    s_store = SegmentStore(str(tmp_path / "s_idx"))
    build_index(spark, docs, s_store, bucket_size=64, block_size=16)
    src = str(tmp_path / "updates")
    _updates(docs, victims).repartition(4).write.mode("overwrite").parquet(src)
    _run(src, s_store, str(tmp_path / "ckpt"),
         spark.read.parquet(src).schema, spark)

    # batch twin: same base, one batch reindex
    b_store = SegmentStore(str(tmp_path / "b_idx"))
    build_index(spark, docs, b_store, bucket_size=64, block_size=16)
    reindex_docs(spark, _updates(docs, victims), b_store)

    assert _vals(read_values(spark, s_store, ["zzstreamfix"])) == sorted(victims)
    for probe in (["w00000"], ["zzstreamfix"], ["w00003", "w00005"]):
        assert _vals(read_values(spark, s_store, probe)) == _vals(
            read_values(spark, b_store, probe)
        )
    sch = Searcher(spark, s_store).open()
    bch = Searcher(spark, b_store).open()
    q = ["w00000", "zzstreamfix"]
    got = [(r["doc_id"], round(r["score"], 9)) for r in sch.topk(q, 10).collect()]
    want = [(r["doc_id"], round(r["score"], 9)) for r in bch.topk(q, 10).collect()]
    assert got == want
    sch.close()
    bch.close()


def test_stream_upserts_replay_idempotent(spark, tmp_path):
    docs = generate_transcripts(spark, 120, include_doc_id=True).cache()
    store = SegmentStore(str(tmp_path / "idx"))
    build_index(spark, docs, store, bucket_size=64, block_size=16)
    src = str(tmp_path / "updates")
    _updates(docs, [5, 9]).repartition(2).write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema

    # same checkpoint dir → second run replays finished batches: the
    # (build_id, batch_id) manifest rows exist, sink skips, nothing
    # double-applies
    _run(src, store, str(tmp_path / "ckpt"), schema, spark)
    m1 = store.read_manifest()
    _run(src, store, str(tmp_path / "ckpt"), schema, spark)
    m2 = store.read_manifest()
    assert len(m1) == len(m2)
    assert _vals(read_values(spark, store, ["zzstreamfix"])) == [5, 9]
