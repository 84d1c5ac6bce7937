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
    carried through merge/deletes/snapshots like any segment).

    The docstats side (distinct indexed doc ids) is computed from the
    RAW docs instead of the exploded gram stream — a doc contributes
    grams iff its id is non-null and lower(text) is at least N chars
    (doc_trigrams' empty/null-array guard drops everything else), so
    the two formulations are row-identical while this one skips a
    second corpus-wide trigram explode (round-6; measured: the old
    docstats pass re-ran the explode+distinct over ~200 grams/doc)."""
    dstats = (
        docs.select(
            F.col(id_col).cast("long").alias("doc_id"),
            F.lower(F.col(text_col)).alias("_t"),
        )
        .where(F.col("doc_id").isNotNull() & (F.length("_t") >= N))
        .select("doc_id")
        .distinct()
    )
    return build_value_index(
        spark,
        doc_trigrams(docs, id_col, text_col),
        store,
        term_col="gram",
        value_col="doc_id",
        docstats=dstats,
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


# ------------------------------------------------------------ regex grep ---

_QUANTIFIERS = set("*+?{")
_FLUSHERS = set(".^$)")


def regex_required_trigrams(pattern: str) -> list[list[str]] | None:
    """Conservative Cox-style literal analysis: compile a regex into a
    DNF of REQUIRED trigram sets — ``[[g1, g2], [g3]]`` means (g1 AND
    g2) OR g3 must all appear in any matching text. Returns None when
    the pattern carries no usable literal information (the caller
    falls back to the verify scan).

    Supported subset: literals, ``.``, quantifiers (``* + ? {m,n}`` —
    the quantified char is dropped from the mandatory literal), escaped
    metachars, character classes (contribute nothing), and TOP-LEVEL
    alternation. Any group ``(`` → None (nested structure is where
    conservative analysis stops paying for its complexity)."""
    low = pattern.lower()
    if "(" in low.replace("\\(", ""):
        return None
    branches = _split_top_alternation(low)
    dnf: list[list[str]] = []
    for br in branches:
        runs = _literal_runs(br)
        grams = sorted(
            {r[i : i + N] for r in runs for i in range(len(r) - (N - 1))}
        )
        if not grams:
            return None  # one unconstrained branch poisons the OR
        dnf.append(grams)
    return dnf or None


def _split_top_alternation(pattern: str) -> list[str]:
    out, cur, i = [], [], 0
    while i < len(pattern):
        c = pattern[i]
        if c == "\\" and i + 1 < len(pattern):
            cur += [c, pattern[i + 1]]
            i += 2
            continue
        if c == "|":
            out.append("".join(cur))
            cur = []
        else:
            cur.append(c)
        i += 1
    out.append("".join(cur))
    return out


def _literal_runs(branch: str) -> list[str]:
    runs: list[str] = []
    buf: list[str] = []
    i = 0
    while i < len(branch):
        c = branch[i]
        if c == "\\" and i + 1 < len(branch):
            nxt = branch[i + 1]
            if nxt.isalnum():  # \d, \w, ... — a class, not a literal
                runs.append("".join(buf))
                buf = []
            else:  # escaped metachar is a literal
                buf.append(nxt)
            i += 2
            continue
        if c in _QUANTIFIERS:
            # the preceding char is optional/repeated — not mandatory
            if buf:
                buf.pop()
            runs.append("".join(buf))
            buf = []
            if c == "{":  # skip the {m,n} body
                end = branch.find("}", i)
                i = (end if end != -1 else len(branch) - 1) + 1
                continue
        elif c == "[":
            runs.append("".join(buf))
            buf = []
            end = branch.find("]", i + 1)
            i = (end if end != -1 else len(branch) - 1) + 1
            continue
        elif c in _FLUSHERS:
            runs.append("".join(buf))
            buf = []
        else:
            buf.append(c)
        i += 1
    runs.append("".join(buf))
    return [r for r in runs if len(r) >= N]


def regex_search(
    spark: SparkSession,
    store: SegmentStore,
    pattern: str,
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Doc ids whose lower(text) matches ``pattern`` (Java-regex∩RE2
    subset — the same dialect discipline as functions/pii.py), sorted.
    Candidates come from the trigram DNF when the pattern has required
    literals; otherwise the verify scan runs corpus-wide (exactly Code
    Search's behavior on literal-free regexes). Matching is
    case-insensitive by construction (pattern and text both lowered)."""
    if not pattern:
        raise ValueError("empty pattern")
    lowered = pattern.lower()
    verify = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.lower(F.col(text_col)).alias("_t"),
    )
    dnf = regex_required_trigrams(lowered)
    if dnf is not None:
        cands = and_values(spark, store, dnf[0])
        for grams in dnf[1:]:
            cands = cands.union(and_values(spark, store, grams)).distinct()
        verify = verify.join(cands, "doc_id", "left_semi")
    return (
        verify.where(F.col("_t").rlike(lowered))
        .select("doc_id")
        .orderBy("doc_id")
    )
