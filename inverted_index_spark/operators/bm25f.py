"""BM25F — weighted multi-field ranked retrieval (capability
extension; the reference stores postings but cannot score, and its
single-keyspace model has no fields. Lucene's BM25FQuery / ES
combined-fields is the model).

Pinned contract (mirrored exactly by the DuckDB oracle in
__spark_entry__.py and the pandas oracle in tests):

    tf~(t,d)  = Σ_f  w_f · tf_f(t,d) / (1 − b_f + b_f · dl_f(d)/avgdl_f)
    score(d)  = Σ_t  idf(t) · tf~ / (k1 + tf~)          k1 = 1.2
    idf(t)    = ln((N − df + 0.5)/(df + 0.5) + 1)
    N         = |union of docs across field stores|
    df(t)     = |{d : t occurs in ANY field of d}|
    avgdl_f   = Σ_d dl_f / N_f over ALL docs in field f's doc stats
                (zero-length fields count: build_index records dl=0
                for a doc whose field tokenizes empty)
    ties      = (score DESC, doc_id ASC)

(Zaragoza et al., "Microsoft Cambridge at TREC-13": field-weighted tf
normalization FIRST, ONE saturation k1 at the document level — NOT a
per-field BM25 sum, which would saturate each field separately and
over-reward matching the same term in many fields.)

Build side: one ordinary index per field (build_index over that
field's text) — every store feature (merge, deletes, streaming,
blooms) applies per field unchanged. Query side: one job — per-field
decoded postings union → groupBy (term, doc) weighted-tf sum →
groupBy doc score sum → TakeOrdered.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from inverted_index_spark.operators import bm25 as _bm25
from inverted_index_spark.operators.build import build_index
from inverted_index_spark.operators.query import postings_df
from inverted_index_spark.sources.store import SegmentStore

K1 = _bm25.K1


def build_text_field_indexes(
    spark: SparkSession,
    docs: DataFrame,
    root: str,
    fields: dict[str, "F.Column | str"],
    bucket_size: int = 1 << 14,
    block_size: int = 128,
) -> dict[str, SegmentStore]:
    """One full-text index per FIELD of the same doc set (the BM25F
    build side). ``fields`` maps field name → text column (name or
    Column expression, e.g. ``F.concat_ws(" ", "source", "lang")``).
    Unlike build_field_indexes (keyword metadata → doc ids), each
    store here is a complete BM25-capable text index with per-field
    tf/dl. Returns {field: SegmentStore}."""
    out: dict[str, SegmentStore] = {}
    for name, col in fields.items():
        c = F.col(col) if isinstance(col, str) else col
        store = SegmentStore(f"{root}/field={name}")
        build_index(
            spark,
            docs.select("doc_id", c.cast("string").alias("text")),
            store,
            bucket_size=bucket_size,
            block_size=block_size,
        )
        out[name] = store
    return out


def bm25f_scores(
    spark: SparkSession,
    field_stores: dict[str, SegmentStore],
    terms: list[str],
    weights: dict[str, float] | None = None,
    b: dict[str, float] | None = None,
    k1: float = K1,
) -> DataFrame:
    """(doc_id, score) for every doc matching any term in any field.

    One declarative plan: per-field postings are term-IN-pruned scans
    (delete-aware through postings_df), the weighted-tf union shuffles
    once on (term, doc_id), the score sum once on doc_id — no joins
    against a doc store (dl rides inside each field's posting stream).
    df/idf derive from the matched union itself (exact any-field doc
    frequency), so no extra pass is needed."""
    uniq = sorted(set(terms))
    weights = weights or {}
    b = b or {}
    if not uniq or not field_stores:
        return spark.range(0).select(
            F.col("id").alias("doc_id"), F.lit(0.0).alias("score")
        )
    # N = |union of per-field doc universes| (one tiny agg per field
    # store; distinct across stores via union-distinct on doc ids)
    universe = None
    parts = []
    for name, store in field_stores.items():
        w_f = float(weights.get(name, 1.0))
        b_f = float(b.get(name, 0.75))
        n_f, avgdl_f = _bm25.corpus_stats(spark, store)
        if n_f == 0:
            continue
        posts = postings_df(spark, store, uniq, with_tf=True)
        if len(store.live_segments()) > 1:
            # pre-compaction overlap can replay a (term, doc) row from
            # two live segments of the SAME field store; the cross-field
            # sum below must see each field's contribution once (same
            # defense as bm25_scores / synonym_scores / wand)
            posts = posts.dropDuplicates(["term", "doc_id"])
        parts.append(
            posts.select(
                "term",
                "doc_id",
                (
                    F.lit(w_f)
                    * F.col("tf")
                    / (1 - b_f + b_f * F.col("dl") / F.lit(float(avgdl_f)))
                ).alias("tfn"),
            )
        )
        docs_f = store.read_docstats(spark).select("doc_id")
        universe = docs_f if universe is None else universe.unionByName(docs_f)
    if not parts:
        return spark.range(0).select(
            F.col("id").alias("doc_id"), F.lit(0.0).alias("score")
        )
    n_docs = universe.distinct().count()
    allp = parts[0]
    for p in parts[1:]:
        allp = allp.unionByName(p)
    # field-weighted tf FIRST (sum across fields), saturation ONCE
    tfn = allp.groupBy("term", "doc_id").agg(F.sum("tfn").alias("tfn"))
    # exact any-field df per query term — query-sized collect
    dfs = {
        r["term"]: int(r["df"])
        for r in tfn.groupBy("term")
        .agg(F.countDistinct("doc_id").alias("df"))
        .collect()
    }
    idf_map = {
        t: math.log((n_docs - dfs[t] + 0.5) / (dfs[t] + 0.5) + 1.0)
        for t in uniq
        if dfs.get(t, 0) > 0
    }
    if not idf_map:
        return spark.range(0).select(
            F.col("id").alias("doc_id"), F.lit(0.0).alias("score")
        )
    idf_expr = F.create_map(
        *[x for t, w in idf_map.items() for x in (F.lit(t), F.lit(float(w)))]
    )
    contrib = tfn.withColumn(
        "c", idf_expr[F.col("term")] * F.col("tfn") / (F.col("tfn") + F.lit(float(k1)))
    )
    return contrib.groupBy("doc_id").agg(F.sum("c").alias("score"))


def bm25f_topk(
    spark: SparkSession,
    field_stores: dict[str, SegmentStore],
    terms: list[str],
    k: int = 10,
    weights: dict[str, float] | None = None,
    b: dict[str, float] | None = None,
    k1: float = K1,
) -> DataFrame:
    """Top-k BM25F; compiles to TakeOrderedAndProject like every other
    top-k in the engine (per-partition heaps, k-row driver merge)."""
    return (
        bm25f_scores(spark, field_stores, terms, weights, b, k1)
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def dismax_scores(
    spark: SparkSession,
    field_stores: dict[str, SegmentStore],
    terms: list[str],
    tie_breaker: float = 0.0,
    boosts: dict[str, float] | None = None,
) -> DataFrame:
    """Lucene DisjunctionMaxQuery / ES multi_match best_fields: each
    field is scored as an INDEPENDENT BM25 index (its own N, avgdl,
    df — the other multi-field model from BM25F's shared saturation),
    then per doc

        score = max_f(s_f) + tie_breaker * (Σ_f s_f − max_f(s_f))

    tie_breaker=0 is pure best-field (a doc is as good as its best
    field); 1.0 degrades to the plain per-field sum. ``boosts`` maps
    field → multiplier applied to that field's score BEFORE the max
    (ES ``fields: ["title^3", "body"]``).

    Plan: per-field score streams (each a term-pruned scan + one
    groupBy) union → ONE groupBy(doc_id) carrying (max, sum) — the
    max/sum pair is computed in the same exchange, so dis_max costs
    exactly one shuffle more than the per-field scorers it combines."""
    _b = boosts or {}
    parts = []
    for name, store in field_stores.items():
        s = _bm25.bm25_scores(spark, store, terms)
        w = float(_b.get(name, 1.0))
        if w != 1.0:
            s = s.select("doc_id", (F.col("score") * F.lit(w)).alias("score"))
        parts.append(s)
    if not parts:
        return spark.range(0).select(
            F.col("id").alias("doc_id"), F.lit(0.0).alias("score")
        )
    allp = parts[0]
    for p in parts[1:]:
        allp = allp.unionByName(p)
    tie = float(tie_breaker)
    g = allp.groupBy("doc_id").agg(
        F.max("score").alias("_mx"), F.sum("score").alias("_sm")
    )
    return g.select(
        "doc_id",
        (
            F.col("_mx") + F.lit(tie) * (F.col("_sm") - F.col("_mx"))
        ).alias("score"),
    )


def dismax_topk(
    spark: SparkSession,
    field_stores: dict[str, SegmentStore],
    terms: list[str],
    k: int = 10,
    tie_breaker: float = 0.0,
    boosts: dict[str, float] | None = None,
) -> DataFrame:
    """Top-k dis_max, ties (score DESC, doc_id ASC)."""
    return (
        dismax_scores(spark, field_stores, terms, tie_breaker, boosts)
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )
