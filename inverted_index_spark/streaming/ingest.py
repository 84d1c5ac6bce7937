"""Structured-Streaming ingest → micro-segments.

The reference has no streaming surface (append-only batch files;
SURVEY.md §2.5) — but its LSM shape maps naturally onto streaming:
each micro-batch becomes one immutable segment (the reference's
"one index file per source file" invariant, README.md:9-11), and the
size-tiered merger compacts them exactly as it compacts batch
segments. ``foreachBatch`` gives exactly-once segment commits because
the manifest append is idempotent per (build_id, batch_id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from inverted_index_spark.operators.build import (
    DEFAULT_BUCKET_SIZE,
    ErrEmptyIndex,
    build_index,
)
from inverted_index_spark.sources.store import SegmentStore


def stream_to_segments(
    stream: DataFrame,
    store: SegmentStore,
    *,
    build_id: str = "stream",
    id_col: str = "doc_id",
    text_col: str = "text",
    bucket_size: int = DEFAULT_BUCKET_SIZE,
    checkpoint_dir: str | None = None,
    trigger_once: bool = True,
    positions: bool = False,
    store_text: bool = False,
):
    """Attach a micro-segment sink to a streaming DataFrame.

    Returns the StreamingQuery. Each micro-batch commits one segment;
    a batch replay (restart from checkpoint) is a no-op because the
    (build_id, chunk=batch_id) manifest row already exists.
    ``positions=True`` writes the positional artifact per micro-segment
    so phrase queries work over streamed stores (read_positions raises
    on mixed coverage, so pick one mode per store).
    """

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if store.has_chunk(build_id, int(batch_id)):
            return  # replayed batch — idempotent skip
        try:
            build_index(
                batch_df.sparkSession, batch_df, store,
                id_col=id_col, text_col=text_col,
                bucket_size=bucket_size,
                build_id=build_id, chunk=int(batch_id),
                input_fingerprint=f"{build_id}/batch-{batch_id}",
                positions=positions, store_text=store_text,
            )
        except ErrEmptyIndex:
            pass  # empty micro-batch

    writer = stream.writeStream.foreachBatch(sink).outputMode("append")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_upserts(
    stream: DataFrame,
    store: SegmentStore,
    *,
    build_id: str = "stream-upsert",
    id_col: str = "doc_id",
    text_col: str = "text",
    bucket_size: int | None = None,
    checkpoint_dir: str | None = None,
    trigger_once: bool = True,
    positions: bool = False,
    store_text: bool = False,
):
    """Streaming UPSERT sink: each micro-batch is applied with
    reindex_docs (operators.build) — a staged tombstone batch plus the
    replacement segment committed in ONE generation-scoped manifest
    transaction, so every earlier copy of a batch's doc_ids dies and
    the batch's new content is searchable immediately. The streaming
    image of Lucene updateDocument / an Iceberg MERGE INTO sink, for
    corpora whose documents are corrected in place (transcript edits,
    metadata fixes) rather than only appended.

    Exactly-once like stream_to_segments: a replayed batch finds its
    (build_id, batch_id) manifest row and skips — the tombstones and
    segment commit atomically, so a crash between them leaves only an
    invisible staged dir (reindex_docs docstring). Within one batch a
    doc_id must appear once (build_index rejects duplicate doc ids);
    across batches later batches supersede earlier ones by generation
    order, which foreachBatch serializes."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if store.has_chunk(build_id, int(batch_id)):
            return  # replayed batch — idempotent skip
        from inverted_index_spark.operators.build import reindex_docs

        try:
            reindex_docs(
                batch_df.sparkSession, batch_df, store,
                id_col=id_col, text_col=text_col,
                **({"bucket_size": bucket_size} if bucket_size else {}),
                build_id=build_id, chunk=int(batch_id),
                input_fingerprint=f"{build_id}/batch-{batch_id}",
                positions=positions, store_text=store_text,
            )
        except ErrEmptyIndex:
            pass  # empty micro-batch

    writer = stream.writeStream.foreachBatch(sink).outputMode("append")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
