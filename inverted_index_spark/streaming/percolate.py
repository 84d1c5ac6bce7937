"""Streaming percolation: run the stored-query registry against a
DOCUMENT STREAM — the ES percolate alerting loop (route every incoming
doc to the standing queries it matches, as it arrives).

Percolation is stateless per document (a doc either matches a stored
query or it doesn't; no cross-batch state), so the idiomatic
Structured-Streaming shape is ``foreachBatch``: each micro-batch runs
the SAME one-plan batch percolator (``operators.percolate.percolate``
— broadcast term-join + (doc, query, disjunct) full-house aggregation
+ anti-join + JVM phrase verify) and hands the matches to the caller's
sink. This keeps the batch operator's scale shape per micro-batch
(document text never shuffles, thousands of queries ride one plan)
and sidesteps streaming-aggregation output-mode constraints entirely.

Queries are compiled ONCE at declaration time — a malformed stored
query fails fast at ``percolate_stream(...)``, not inside batch 57.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame

from ..operators.percolate import compile_queries, percolate

__all__ = ["percolate_stream"]


def percolate_stream(
    stream: DataFrame,
    queries,
    on_matches: Callable[[DataFrame, int], None],
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_disjuncts: int = 64,
):
    """Wire a streaming DataFrame through the percolator.

    ``on_matches(matches_df, batch_id)`` is invoked per micro-batch
    with the batch-local ``(doc_id, query_id)`` matches (it runs on
    the driver: write to a sink table, push alerts, etc.). Returns the
    un-started ``DataStreamWriter`` so the caller picks trigger,
    checkpoint, and when to ``.start()``.
    """
    compile_queries(queries, max_disjuncts)  # fail fast on bad queries

    def _batch(batch_df: DataFrame, batch_id: int) -> None:
        matches = percolate(
            batch_df.sparkSession,
            batch_df,
            queries,
            text_col=text_col,
            id_col=id_col,
            max_disjuncts=max_disjuncts,
        )
        on_matches(matches, batch_id)

    return stream.writeStream.foreachBatch(_batch)
