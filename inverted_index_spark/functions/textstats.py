"""Text-analysis operators for training-data pipelines (task rubric):
language-ID heuristic, quality scoring, token counting, document
fingerprinting. All pure built-in column expressions — JVM-side,
whole-stage-codegen'd, no Python in the hot path — and each has an
ANSI-SQL twin in __spark_entry__.oracle_sql for the DuckDB gate.

ASCII ``\\w+`` tokenization is used here (Java regex and RE2 agree on
it); the index tokenizer (functions.tokenizer) stays the pinned
Unicode contract — these stats are pipeline features, not index terms.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TOKEN_RE = r"\w+"
# BPE-ish pre-tokenizer: letter runs | digit runs | non-space punct runs
BPE_RE = r"[a-z]+|[0-9]+|[^a-z0-9\s]+"

STOPWORDS = ["the", "a", "an", "and", "of", "to", "in", "is", "it", "for"]

LANG_MARKERS: dict[str, list[str]] = {
    "de": ["der", "die", "das", "und", "ist", "nicht"],
    "en": ["the", "a", "and", "of", "is", "to"],
    "es": ["el", "la", "los", "las", "es", "y"],
    "fr": ["le", "la", "les", "est", "et", "une"],
}


def tokens_col(text: Column) -> Column:
    # idx=0 → whole match (the default expects a capture group)
    return F.regexp_extract_all(F.lower(text), F.lit(TOKEN_RE), 0)


def token_counts(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, n_tokens, n_bpe_tokens, n_chars) — whitespace-word and
    BPE-ish-regex token counts."""
    toks = tokens_col(F.col(text_col))
    bpe = F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(BPE_RE), 0)
    return docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.size(toks).alias("n_tokens"),
        F.size(bpe).alias("n_bpe_tokens"),
        F.length(F.col(text_col)).cast("long").alias("n_chars"),
    )


def quality_scores(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, n_tokens, avg_token_len, stopword_ratio, distinct_ratio)
    — cheap quality features; each doubles as a filter predicate at
    scale (pushed to the scan when used in where())."""
    d = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        tokens_col(F.col(text_col)).alias("toks"),
    )
    n = F.size("toks")
    sum_len = F.aggregate("toks", F.lit(0), lambda acc, x: acc + F.length(x))
    n_stop = F.size(F.filter("toks", lambda x: x.isin(STOPWORDS)))
    n_distinct = F.size(F.array_distinct("toks"))
    return d.select(
        "doc_id",
        n.alias("n_tokens"),
        F.when(n > 0, sum_len.cast("double") / n).otherwise(F.lit(0.0)).alias("avg_token_len"),
        F.when(n > 0, n_stop.cast("double") / n).otherwise(F.lit(0.0)).alias("stopword_ratio"),
        F.when(n > 0, n_distinct.cast("double") / n).otherwise(F.lit(0.0)).alias("distinct_ratio"),
    )


def lang_id(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, pred_lang) — marker-token voting, ties broken by lang
    code ascending, no markers → 'und'. A deterministic stand-in for a
    real n-gram model; parity with the SQL oracle is the contract."""
    d = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        tokens_col(F.col(text_col)).alias("toks"),
    )
    # distinct-marker voting via array_intersect (set semantics — the
    # DuckDB twin is list_intersect); avoids nested lambda filters,
    # whose variable naming collides with the when-chain below
    scored = d.select(
        "doc_id",
        *[
            F.size(
                F.array_intersect("toks", F.array(*[F.lit(w) for w in markers]))
            ).alias(f"s_{lang}")
            for lang, markers in sorted(LANG_MARKERS.items())
        ],
    )
    best = F.greatest(*[F.col(f"s_{lang}") for lang in sorted(LANG_MARKERS)])
    pred = F.when(best == 0, F.lit("und"))
    for lang in sorted(LANG_MARKERS):  # ascending → first max wins ties
        pred = pred.when(F.col(f"s_{lang}") == best, F.lit(lang))
    return scored.select("doc_id", pred.alias("pred_lang"))


def fingerprints(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, fp) — md5 over the normalized token stream: equal for
    docs that differ only in case/punctuation/whitespace (the exact-dup
    canonical key)."""
    return docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.md5(F.concat_ws(" ", tokens_col(F.col(text_col)))).alias("fp"),
    )
