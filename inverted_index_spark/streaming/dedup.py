"""Stateful streaming operators over the transcript stream.

The reference is batch-only (SURVEY.md §2.5); these are the streaming
capability extensions a live transcript pipeline needs, built the
idiomatic Structured-Streaming way:

``dedup_stream``        cross-batch exact dedup — the BUILT-IN stateful
                        operator (``dropDuplicates`` over a text
                        fingerprint, optionally watermark-bounded
                        state). Built-ins are the fast path; no custom
                        state needed for plain first-wins dedup.
``assign_arrival_seq``  per-conversation arrival sequencing — a CUSTOM
                        stateful operator (``applyInPandasWithState``):
                        every turn gets the position it arrived at
                        within its conversation, monotonically
                        increasing ACROSS micro-batches. Not
                        expressible with built-in streaming aggregates
                        (they produce one row per group, not a
                        per-input-row output that depends on
                        cross-batch state).

Both compose with streaming.ingest.stream_to_segments: dedup the
stream first, then sink micro-segments.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def fingerprint_col(text_col: str = "text"):
    """The dedup key: md5 of the raw text (exact dedup contract, same
    key operators.dedup.exact_duplicates uses)."""
    return F.md5(F.coalesce(F.col(text_col), F.lit("")))


def dedup_stream(
    stream: DataFrame,
    text_col: str = "text",
    watermark: tuple[str, str] | None = None,
) -> DataFrame:
    """Cross-batch exact dedup of a streaming DataFrame: the first
    arrival of each text fingerprint passes, every later duplicate —
    same batch or any later one — is suppressed by the state store.

    Pure built-in (``dropDuplicates`` on a fingerprint column keeps
    per-key state): at 100 TB/day the state is the fingerprint set, so
    pass ``watermark=(ts_col, "24 hours")`` to bound it — duplicates
    arriving later than the delay are then no longer guaranteed caught
    (the standard streaming-dedup trade)."""
    out = stream.withColumn("fingerprint", fingerprint_col(text_col))
    if watermark is not None:
        col, delay = watermark
        out = out.withWatermark(col, delay)
        return out.dropDuplicatesWithinWatermark(["fingerprint"])
    return out.dropDuplicates(["fingerprint"])


ARRIVAL_STATE = T.StructType([T.StructField("next_seq", T.LongType())])


def assign_arrival_seq(
    stream: DataFrame,
    conv_col: str = "conv_id",
    id_col: str = "doc_id",
    order_col: str = "turn_idx",
) -> DataFrame:
    """(conv_id, doc_id, arrival_seq): each turn's arrival position
    within its conversation, 0-based, ordered by ``order_col`` inside a
    batch and by batch order across batches — the cross-batch counter a
    resumable ingest needs to detect gaps/replays per conversation.

    Custom stateful operator: ``groupBy(conv).applyInPandasWithState``
    with one long of state per conversation (the next sequence number).
    The kernel is vectorized (numpy arange per group); state size is
    O(active conversations), the streaming analog of the doc-id minting
    offsets (operators.docids)."""

    def fn(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        rows = pd.concat(list(pdfs), ignore_index=True)
        if not len(rows):
            return
        start = state.get[0] if state.exists else 0
        rows = rows.sort_values(order_col, kind="mergesort")
        out = pd.DataFrame(
            {
                "conv_id": rows[conv_col].to_numpy(),
                "doc_id": rows[id_col].to_numpy(),
                "arrival_seq": range(start, start + len(rows)),
            }
        )
        state.update((start + len(rows),))
        yield out

    narrow = stream.select(
        F.col(conv_col).alias(conv_col),
        F.col(id_col).cast("long").alias(id_col),
        F.col(order_col).alias(order_col),
    )
    return narrow.groupBy(conv_col).applyInPandasWithState(
        fn,
        outputStructType="conv_id string, doc_id long, arrival_seq long",
        stateStructType=ARRIVAL_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
