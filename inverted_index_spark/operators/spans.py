"""Lucene span queries over the positional index: ``span_first`` and
``span_not``.

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

__all__ = ["span_first", "span_not"]


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


def span_not(
    spark: SparkSession,
    store: SegmentStore,
    phrase: list[str],
    exclude: list[str],
    pre: int = 0,
    post: int = 0,
    min_doc: int | None = None,
    max_doc: int | None = None,
) -> DataFrame:
    """(doc_id, n_matches) — Lucene SpanNotQuery: exact-phrase spans
    that do NOT have an occurrence of any ``exclude`` term within
    ``pre`` positions before the span start or ``post`` positions
    after the span end. A phrase span starting at ``s`` (covering
    ``[s, s+k-1]``) is rejected iff some excluded occurrence ``p``
    satisfies ``s - pre <= p <= s + k - 1 + post``.

    One pruned positions scan covers both sides (the phrase terms and
    the exclusion terms share the decode), then a left-anti range join
    removes poisoned spans. Both sides are query-term-sized, so the
    join input is bounded by posting-list length, never corpus size.
    Duplicate occurrences from pre-compaction segment overlap are
    harmless on both sides: the phrase kernel collapses them via
    countDistinct(off) and the anti-join only tests existence.
    """
    if not phrase:
        return spark.createDataFrame([], "doc_id long, n_matches long")
    if pre < 0 or post < 0:
        raise ValueError(f"pre/post must be >= 0, got {pre}/{post}")
    k = len(phrase)
    offs: dict[str, list[int]] = {}
    for i, t in enumerate(phrase):
        offs.setdefault(t, []).append(i)
    ex_terms = sorted(set(exclude))
    all_terms = sorted(set(offs) | set(ex_terms))

    rows = read_positions(
        spark, store, with_gen=store.has_deletes()
    ).where(F.col("term").isin(all_terms))
    if min_doc is not None:
        rows = rows.where(F.col("max_doc") >= F.lit(int(min_doc)))
    if max_doc is not None:
        rows = rows.where(F.col("min_doc") <= F.lit(int(max_doc)))
    # no cache: both consumers re-read a query-term-pruned scan, which
    # is cheaper than holding an unpersist obligation on a lazy result
    occ = decoded_occurrences(spark, store, rows, min_doc, max_doc)

    off_df = spark.createDataFrame(
        sorted(offs.items()), "term string, offs array<int>"
    )
    starts = (
        occ.join(F.broadcast(off_df), "term")
        .select("doc_id", F.explode("offs").alias("off"), "pos")
        .select("doc_id", (F.col("pos") - F.col("off")).alias("adj"), "off")
        .where(F.col("adj") >= 0)
        .groupBy("doc_id", "adj")
        .agg(F.countDistinct("off").alias("_n"))
        .where(F.col("_n") == k)
        .select("doc_id", "adj")
    )
    if ex_terms:
        poison = occ.where(F.col("term").isin(ex_terms)).select(
            F.col("doc_id").alias("p_doc"), F.col("pos").alias("p_pos")
        )
        starts = starts.join(
            poison,
            (F.col("doc_id") == F.col("p_doc"))
            & (F.col("p_pos") >= F.col("adj") - F.lit(int(pre)))
            & (F.col("p_pos") <= F.col("adj") + F.lit(k - 1 + int(post))),
            "left_anti",
        )
    return (
        starts.groupBy("doc_id")
        .agg(F.count("*").alias("n_matches"))
        .orderBy("doc_id")
    )
