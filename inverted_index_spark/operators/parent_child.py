"""ES parent-child search (``has_child`` query + ``inner_hits``):
rank PARENTS by how well their CHILD documents match a query.

The reference library is flat (term → posting lists only,
``single/single.go``); this is the Elasticsearch join-field capability
re-expressed relationally — which is the natural Spark shape: ES
implements parent-child with global ordinals inside one shard (forced
co-location); here the child→parent mapping is just a column, the
"join" is a groupBy on the parent key, and co-location falls out of
the shuffle. No routing constraints, no ordinals memory.

``score_mode`` follows ES: how child scores combine into the parent
score — ``max`` / ``sum`` / ``avg`` / ``min`` / ``none`` (``none``
counts matching children and scores every matched parent 0, ES's
filter-context behavior).

``min_children`` / ``max_children`` follow the ES has_child options:
parents qualify only when their MATCHING child count is in range.

``inner_hits`` returns the top-``n`` best-scoring children per
matched parent (rank 1 = best, ties by doc_id) — one window over the
match set only, never over the corpus.

Scale shape: child BM25 scores come from the existing exhaustive
scorer (one pass over matched postings); the parent rollup is ONE
aggregation keyed by parent_id with partial aggregation (a parent
with millions of children never concentrates rows on one task beyond
the final combine); inner_hits windows only the matched children.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.store import SegmentStore
from .bm25 import bm25_scores

__all__ = [
    "has_child_scores",
    "has_child_topk",
    "child_inner_hits",
    "has_parent_scores",
    "has_parent_topk",
]

_MODES = {
    "max": F.max,
    "sum": F.sum,
    "min": F.min,
    "avg": F.avg,
}


def _child_matches(
    spark: SparkSession,
    store: SegmentStore,
    terms: list[str],
    child_parent: DataFrame,
) -> DataFrame:
    """(parent_id, doc_id, score) for every matching child that has a
    parent mapping."""
    s = bm25_scores(spark, store, terms)
    return s.join(child_parent.select("doc_id", "parent_id"), "doc_id")


def has_child_scores(
    spark: SparkSession,
    store: SegmentStore,
    terms: list[str],
    child_parent: DataFrame,
    score_mode: str = "max",
    min_children: int = 1,
    max_children: int | None = None,
) -> DataFrame:
    """(parent_id, score, n_children) — parents whose matching-child
    count is within [min_children, max_children], scored per
    ``score_mode``. ``child_parent``: (doc_id, parent_id)."""
    if score_mode != "none" and score_mode not in _MODES:
        raise ValueError(
            f"score_mode must be one of {sorted(_MODES) + ['none']}, "
            f"got {score_mode!r}"
        )
    if min_children < 1:
        raise ValueError("min_children must be >= 1")
    m = _child_matches(spark, store, terms, child_parent)
    agg = (
        _MODES[score_mode]("score") if score_mode != "none" else F.lit(0.0)
    ).alias("score")
    out = m.groupBy("parent_id").agg(
        agg, F.count("*").cast("long").alias("n_children")
    )
    out = out.where(F.col("n_children") >= min_children)
    if max_children is not None:
        out = out.where(F.col("n_children") <= max_children)
    return out


def has_child_topk(
    spark: SparkSession,
    store: SegmentStore,
    terms: list[str],
    child_parent: DataFrame,
    k: int = 10,
    score_mode: str = "max",
    min_children: int = 1,
    max_children: int | None = None,
) -> DataFrame:
    """Top-k parents by combined child score (ties by parent_id asc)."""
    s = has_child_scores(
        spark, store, terms, child_parent, score_mode, min_children, max_children
    )
    return s.orderBy(F.desc("score"), F.asc("parent_id")).limit(k)


def child_inner_hits(
    spark: SparkSession,
    store: SegmentStore,
    terms: list[str],
    child_parent: DataFrame,
    n_per_parent: int = 3,
) -> DataFrame:
    """(parent_id, child_rank, doc_id, score) — the ES inner_hits
    block: each matched parent's top-n children by score (ties by
    doc_id asc). Windows only the match set."""
    m = _child_matches(spark, store, terms, child_parent)
    w = Window.partitionBy("parent_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        m.withColumn("child_rank", F.row_number().over(w))
        .where(F.col("child_rank") <= n_per_parent)
        .select("parent_id", "child_rank", "doc_id", "score")
    )


def has_parent_scores(
    spark: SparkSession,
    store: SegmentStore,
    terms: list[str],
    child_parent: DataFrame,
    score: bool = True,
    min_doc: int | None = None,
    max_doc: int | None = None,
) -> DataFrame:
    """ES ``has_parent``: the inverse direction — return CHILD docs
    whose parent matches the query. ``score=True`` is ES's
    ``score: true`` (each child inherits its parent's BM25 score);
    ``score=False`` is filter context (constant 0). Parents here are
    ordinary indexed docs referenced by the mapping's ``parent_id``.

    Scale shape: the parent match set (doc_id, score) joins the
    child→parent mapping on parent_id — one equi-join whose build side
    is matches only (AQE broadcasts it when small); no window, no
    per-parent fan-in.
    """
    s = bm25_scores(spark, store, terms, min_doc, max_doc)
    parents = s.select(
        F.col("doc_id").alias("parent_id"),
        F.col("score").alias("_pscore"),
    )
    out = child_parent.select("doc_id", "parent_id").join(parents, "parent_id")
    scol = F.col("_pscore") if score else F.lit(0.0)
    return out.select("doc_id", "parent_id", scol.alias("score"))


def has_parent_topk(
    spark: SparkSession,
    store: SegmentStore,
    terms: list[str],
    child_parent: DataFrame,
    k: int = 10,
    score: bool = True,
    min_doc: int | None = None,
    max_doc: int | None = None,
) -> DataFrame:
    """Top-k children by inherited parent score (ties by doc_id asc;
    filter context degenerates to doc_id order, like ES)."""
    s = has_parent_scores(
        spark, store, terms, child_parent, score, min_doc, max_doc
    )
    return s.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
