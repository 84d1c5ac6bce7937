"""Benchmark decontamination: flag training documents that share
token n-grams with an evaluation/benchmark set.

The standard LLM-training hygiene pass (the reference library has no
analog — this is a capability extension of the corpus-pipeline layer,
like operators.dedup): before training, every document that contains
any n-gram appearing in a held-out benchmark must be flagged/dropped,
otherwise eval scores are contaminated.

Shape at 100 TB: the benchmark side is always tiny relative to the
corpus (eval sets are MBs; the corpus is TBs), so the contamination
join is a BROADCAST hash join on the n-gram — the corpus side streams
through map-side, zero shuffle of corpus data, and the n-gram
explode/distinct happens in-row in JVM codegen (same `_shingles_col`
kernel the MinHash path uses). For a benchmark too large to
broadcast, pass ``broadcast_bench=False`` to fall back to a shuffle
join on the n-gram key (both sides hash-partitioned; corpus-side
n-grams are deduped in-row first so the shuffle carries at most one
row per distinct (doc, n-gram)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import _shingles_col
from ..functions.textstats import tokens_col


def _doc_shingles(docs: DataFrame, id_col: str, text_col: str, n: int, out_id: str) -> DataFrame:
    """One row per distinct (doc, n-gram): tokenize, shingle, and
    dedup in-row (JVM), then explode."""
    toks = tokens_col(F.col(text_col))
    return docs.select(
        F.col(id_col).cast("long").alias(out_id),
        F.explode(F.array_distinct(_shingles_col(toks, n))).alias("sh"),
    ).where(F.col("sh") != "")


def ngram_contamination(
    train: DataFrame,
    bench: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_id_col: str | None = None,
    bench_text_col: str | None = None,
    broadcast_bench: bool = True,
) -> DataFrame:
    """(doc_id, n_hit_ngrams, n_bench_docs) for every training doc
    sharing ≥1 token n-gram with any benchmark doc.

    n_hit_ngrams counts the DISTINCT contaminated n-grams in the
    training doc; n_bench_docs counts the distinct benchmark docs it
    collides with. Tokenization is the pipeline's ASCII ``\\w+``
    contract (textstats.tokens_col), lowercased — same as the
    MinHash/Jaccard dedup family, so a corpus can reuse one tokenized
    column for all of them.
    """
    bsh = _doc_shingles(
        bench,
        bench_id_col or id_col,
        bench_text_col or text_col,
        n,
        out_id="bench_id",
    )
    if broadcast_bench:
        bsh = F.broadcast(bsh)
    tsh = _doc_shingles(train, id_col, text_col, n, out_id="doc_id")
    hits = tsh.join(bsh, "sh")
    return hits.groupBy("doc_id").agg(
        F.countDistinct("sh").alias("n_hit_ngrams"),
        F.countDistinct("bench_id").alias("n_bench_docs"),
    )


def decontaminate(
    train: DataFrame,
    bench: DataFrame,
    n: int = 3,
    min_hits: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
    **kw,
) -> DataFrame:
    """The clean corpus: training docs with fewer than ``min_hits``
    benchmark-overlapping n-grams (left-anti join on the flag set —
    shuffles only (doc_id) pairs, never text)."""
    flagged = ngram_contamination(
        train, bench, n=n, id_col=id_col, text_col=text_col, **kw
    ).where(F.col("n_hit_ngrams") >= min_hits)
    return train.join(
        flagged.select(F.col("doc_id").alias("_flag_id")),
        on=train[id_col].cast("long") == F.col("_flag_id"),
        how="left_anti",
    )
