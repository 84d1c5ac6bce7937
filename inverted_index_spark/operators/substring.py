"""Trigram substring index — grep over the corpus without scanning it
(the Google Code Search design: Russ Cox, "Regular Expression Matching
with a Trigram Index", 2012; the reference's host heaplog is a log
grep tool, so this is its missing scale path).

Index: every distinct character 3-gram of ``lower(text)`` (spaces and
punctuation included — substrings crossing token boundaries must
match) becomes a term in an ordered-V index whose values are doc ids
(:func:`build.build_value_index` — same codec, merge, deletes,
snapshot machinery as every other artifact).

Query: a needle of length ≥ 3 must contain ALL of its trigrams, so
candidates = AND of the needle's trigram posting lists (one
groupBy(doc_id) HAVING count, the existing and_values plan), then one
verification pass that reads ONLY candidate rows of the corpus
(semi-join prune) and keeps true ``contains`` matches — false
positives exist (trigrams present but not adjacent), false negatives
don't. Needles shorter than 3 fall back to the verify scan over the
whole corpus (documented; Code Search does the same).

Matching is case-insensitive by construction (both sides lowered) —
the same normalization the pinned tokenizer applies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from inverted_index_spark.operators.build import build_value_index
from inverted_index_spark.operators.query import and_values
from inverted_index_spark.sources.store import SegmentStore

N = 3


def doc_trigrams(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, gram): distinct character trigrams of lower(text) —
    pure JVM (sequence + substring inside array exprs, distinct before
    the explode so the shuffle carries one row per (doc, gram))."""
    base = F.lower(F.col(text_col))
    # guard: Spark's sequence(1, 0) counts DOWN ([1, 0]) — a text
    # shorter than N chars must yield an empty gram array instead
    grams = F.when(
        F.length(base) < N, F.array().cast("array<string>")
    ).otherwise(
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.length(base) - (N - 1)),
                lambda i: F.substring(base, i, N),
            )
        )
    )
    return docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.explode(grams).alias("gram"),
    )


def build_trigram_index(
    spark: SparkSession,
    docs: DataFrame,
    store: SegmentStore,
    id_col: str = "doc_id",
    text_col: str = "text",
    **kwargs,
) -> str:
    """Build the trigram → doc-id index (an ordered-V value index:
    carried through merge/deletes/snapshots like any segment)."""
    return build_value_index(
        spark,
        doc_trigrams(docs, id_col, text_col),
        store,
        term_col="gram",
        value_col="doc_id",
        **kwargs,
    )


def needle_trigrams(needle: str) -> list[str]:
    n = needle.lower()
    return sorted({n[i : i + N] for i in range(len(n) - (N - 1))})


def substring_search(
    spark: SparkSession,
    store: SegmentStore,
    needle: str,
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Doc ids whose text contains ``needle`` (case-insensitive),
    sorted. ``store`` is the trigram index over ``docs``; the corpus
    is only read on candidate rows (a short needle with no trigrams
    degrades to the verify scan, flagged in the plan by the missing
    semi-join)."""
    if not needle:
        raise ValueError("empty needle")
    lowered = needle.lower()
    verify = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.lower(F.col(text_col)).alias("_t"),
    )
    grams = needle_trigrams(lowered)
    if grams:
        cands = and_values(spark, store, grams)
        verify = verify.join(cands, "doc_id", "left_semi")
    return (
        verify.where(F.contains(F.col("_t"), F.lit(lowered)))
        .select("doc_id")
        .orderBy("doc_id")
    )
