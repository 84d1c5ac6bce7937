"""ES query types over the index that aren't boolean-algebra nodes:
``terms_set`` (minimum-should-match counting), lexicographic term
``range`` reads, and the ``pinned`` query (editorial results ahead of
organic ranking).

Capability extensions over the reference layout (its query surface is
the three reads, /root/reference/single/single.go:155-228): each of
these is one declarative plan over the same pruned posting scans the
core reads use — no new storage, no per-row Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from inverted_index_spark.operators.query import postings_df
from inverted_index_spark.sources.store import SegmentStore


def terms_set_match(
    spark: SparkSession,
    store: SegmentStore,
    terms: list[str],
    min_should_match: int,
    min_doc: int | None = None,
    max_doc: int | None = None,
) -> DataFrame:
    """ES ``terms_set`` query: docs containing at least
    ``min_should_match`` DISTINCT terms from the list. The m=k case is
    the AND intersection (ii_and_values); m=1 is the OR union — this
    is the whole family under one count.

    Returns (doc_id, n_matched) sorted by doc_id. Plan: one pruned
    posting scan over the query terms → groupBy(doc_id) with a
    countDistinct HAVING — the shuffle carries (doc_id, term) pairs
    for the query terms only, identical to the AND path's envelope.
    """
    uniq = sorted(set(terms))
    m = int(min_should_match)
    if m < 1 or m > len(uniq):
        raise ValueError(
            f"min_should_match must be in [1, {len(uniq)}], got {m}"
        )
    pairs = postings_df(spark, store, uniq, min_doc, max_doc, with_tf=False)
    return (
        pairs.groupBy("doc_id")
        .agg(F.countDistinct("term").alias("n_matched"))
        .where(F.col("n_matched") >= m)
        .orderBy("doc_id")
    )


def term_range_values(
    spark: SparkSession,
    store: SegmentStore,
    lower: str | None,
    upper: str | None,
    include_lower: bool = True,
    include_upper: bool = True,
    min_doc: int | None = None,
    max_doc: int | None = None,
) -> DataFrame:
    """Lucene ``TermRangeQuery`` / ES keyword ``range``: the OR-union
    of every dictionary term in the lexicographic interval
    [lower, upper] (bounds optional, inclusivity per flag) — the FST
    range-seek the reference's vellum iterator supports, re-expressed
    as a pushable parquet range predicate over the sorted (bucket,
    term) layout (same pruning story as read_terms_prefix,
    query.py:read_terms_prefix).

    Returns sorted unique (doc_id). Both bounds None = ReadAllValues.
    Rides postings_df's one scan/decode/delete-scoping path — the
    range predicate pushes into the same sorted parquet layout.
    """
    pred = F.lit(True)
    if lower is not None:
        pred = pred & (
            F.col("term") >= lower if include_lower else F.col("term") > lower
        )
    if upper is not None:
        pred = pred & (
            F.col("term") <= upper if include_upper else F.col("term") < upper
        )
    decoded = postings_df(
        spark, store, None, min_doc, max_doc, with_tf=False, term_pred=pred
    )
    return decoded.select("doc_id").distinct().orderBy("doc_id")


def pinned_topk(
    spark: SparkSession,
    store: SegmentStore,
    q,
    pinned_ids: list[int],
    k: int = 10,
    min_doc: int | None = None,
    max_doc: int | None = None,
    field_stores: dict[str, SegmentStore] | None = None,
) -> DataFrame:
    """ES ``pinned`` query: the listed doc ids come FIRST, in list
    order (when they exist in the index), then the organic BM25-ranked
    matches of ``q`` with pinned ids excluded, until ``k`` rows.

    Returns (rank, doc_id, score, is_pinned) — pinned rows carry
    score NULL (ES gives them an artificial float-max; NULL states
    "editorial, not scored" without inventing a sentinel), organic
    rows their BM25 score. Plan: the pinned probe is an isin() lookup
    against the doc-length store (tiny, pushable); the organic side is
    the standard ranked_topk TakeOrdered over k + |pins| then an
    anti-filter — documents never shuffle.
    """
    from inverted_index_spark.operators.boolean import parse_query, ranked_topk

    pins = list(dict.fromkeys(int(p) for p in pinned_ids))
    if not pins:
        raise ValueError("pinned_topk needs at least one pinned id")
    if isinstance(q, str):
        q = parse_query(q)
    # which pins exist (deleted/absent ids are skipped, ES behavior);
    # the [min_doc, max_doc] scope is a hard envelope here like on
    # every other read path — out-of-range pins are skipped too
    probe = store.read_docstats(spark).where(F.col("doc_id").isin(pins))
    if min_doc is not None:
        probe = probe.where(F.col("doc_id") >= int(min_doc))
    if max_doc is not None:
        probe = probe.where(F.col("doc_id") <= int(max_doc))
    present = {r["doc_id"] for r in probe.select("doc_id").collect()}
    live_pins = [p for p in pins if p in present][:k]
    # organic: over-fetch so pinned hits can be excluded post-rank
    organic = ranked_topk(
        spark, store, q, k=k + len(live_pins), min_doc=min_doc,
        max_doc=max_doc, field_stores=field_stores,
    )
    rows = [(i + 1, p, None, 1) for i, p in enumerate(live_pins)]
    head = spark.createDataFrame(
        rows, "rank int, doc_id long, score double, is_pinned int"
    )
    n_org = k - len(live_pins)
    if n_org <= 0:
        return head.orderBy("rank")
    from pyspark.sql import Window

    organic = (
        organic.where(~F.col("doc_id").isin(live_pins))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(n_org)
    )
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    tail = organic.select(
        (F.row_number().over(w) + len(live_pins)).alias("rank"),
        "doc_id",
        F.col("score").cast("double").alias("score"),
        F.lit(0).alias("is_pinned"),
    )
    return head.unionByName(tail).orderBy("rank")


def saturation(col, pivot: float):
    """ES rank_feature ``saturation``: f / (f + pivot) — approaches 1
    as the feature grows, 0.5 at the pivot."""
    c = F.col(col) if isinstance(col, str) else col
    return c / (c + F.lit(float(pivot)))


def log_feature(col, scaling_factor: float = 1.0):
    """ES rank_feature ``log``: ln(scaling_factor + f)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.log(F.lit(float(scaling_factor)) + c)


def sigmoid_feature(col, pivot: float, exponent: float):
    """ES rank_feature ``sigmoid``: f^exp / (f^exp + pivot^exp)."""
    c = F.col(col) if isinstance(col, str) else col
    p = F.pow(c, F.lit(float(exponent)))
    return p / (p + F.lit(float(pivot) ** float(exponent)))


def rank_feature_topk(
    spark: SparkSession,
    store: SegmentStore,
    terms: list[str],
    features: DataFrame,
    feature,
    k: int = 10,
    boost: float = 1.0,
    min_doc: int | None = None,
    max_doc: int | None = None,
) -> DataFrame:
    """ES ``rank_feature`` query in its canonical position — a bool
    SHOULD clause next to a text query:

        final = bm25(terms) + boost * S(feature)

    where S is one of the saturation / log / sigmoid monotone
    squashes (pass the Column built by :func:`saturation`,
    :func:`log_feature` or :func:`sigmoid_feature` — or any
    expression over the ``features`` columns). Docs missing the
    feature keep their BM25 score unchanged (the SHOULD clause simply
    contributes nothing — ES behavior).

    Returns (doc_id, score) top-k. Scale: same envelope as
    function_score_topk — the feature join touches the MATCH SET
    only (AQE-broadcast when small), the squash stays in
    whole-stage codegen, top-k is TakeOrdered."""
    from inverted_index_spark.operators.bm25 import bm25_scores

    s = bm25_scores(spark, store, sorted(set(terms)), min_doc, max_doc)
    joined = s.join(features, "doc_id", "left")
    contrib = F.coalesce(feature, F.lit(0.0)) * F.lit(float(boost))
    return (
        joined.select("doc_id", (F.col("score") + contrib).alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )
