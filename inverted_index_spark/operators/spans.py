"""Lucene span queries over the positional index: ``span_first``.

SpanFirstQuery(match, end): the span must START within the first
``end`` token positions of the document (position 0-based, start <
end) — the classic "match in title/lead paragraph" trick for corpora
stored as one concatenated field. The reference library has no
positional layer (``single/single.go``); this composes the repo's
positions artifact exactly like phrase_match (positions.py:344): one
pruned positions scan, Arrow-batched decode, the adjacency kernel
(countDistinct(off) == k over (doc, start) groups), then the span
filter ``start < end`` — a pure predicate on the aggregation key,
pushed before the final count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.store import SegmentStore
from .positions import decoded_occurrences, read_positions

__all__ = ["span_first"]


def span_first(
    spark: SparkSession,
    store: SegmentStore,
    phrase: list[str],
    end: int,
    min_doc: int | None = None,
    max_doc: int | None = None,
) -> DataFrame:
    """(doc_id, n_matches) — docs where the exact token ``phrase``
    has at least one start offset < ``end``; n_matches counts only
    those early starts. Single terms are one-word phrases."""
    if not phrase:
        return spark.createDataFrame([], "doc_id long, n_matches long")
    if end < 1:
        raise ValueError(f"end must be >= 1, got {end}")
    k = len(phrase)
    offs: dict[str, list[int]] = {}
    for i, t in enumerate(phrase):
        offs.setdefault(t, []).append(i)

    rows = read_positions(
        spark, store, with_gen=store.has_deletes()
    ).where(F.col("term").isin(sorted(offs)))
    # span starts live in [0, end): only position blocks overlapping
    # the window matter — min_doc/max_doc prune as usual
    if min_doc is not None:
        rows = rows.where(F.col("max_doc") >= F.lit(int(min_doc)))
    if max_doc is not None:
        rows = rows.where(F.col("min_doc") <= F.lit(int(max_doc)))
    occ = decoded_occurrences(spark, store, rows, min_doc, max_doc)
    # occurrences beyond end + k - 1 can never contribute to an early
    # start — drop them before the fan-out, not after
    occ = occ.where(F.col("pos") < F.lit(int(end) + k - 1))

    off_df = spark.createDataFrame(
        sorted(offs.items()), "term string, offs array<int>"
    )
    starts = (
        occ.join(F.broadcast(off_df), "term")
        .select("doc_id", F.explode("offs").alias("off"), "pos")
        .select("doc_id", (F.col("pos") - F.col("off")).alias("adj"), "off")
        .where((F.col("adj") >= 0) & (F.col("adj") < F.lit(int(end))))
        .groupBy("doc_id", "adj")
        .agg(F.countDistinct("off").alias("_n"))
        .where(F.col("_n") == k)
    )
    return (
        starts.groupBy("doc_id")
        .agg(F.count("*").alias("n_matches"))
        .orderBy("doc_id")
    )
