"""Composable boolean query algebra over the index — the Lucene
BooleanQuery surface, assembled from the engine's verified primitives:

    Term("spark")                       R6/R10 point lookup
    Prefix("sp")                        FST range-seek analog
    Fuzzy("tble")                       edit-distance-1 neighborhood
    Phrase(["table", "hash"])           positional adjacency
    And(q1, q2, Not(q3))                intersection with MUST_NOT
    Or(q1, q2)                          union

``evaluate`` compiles a tree to ONE DataFrame plan of semi/anti joins
and union-distincts over doc_id streams — no driver-side set math, no
collect; Catalyst sees the whole composition and reuses the shared
multi-segment scan across leaves. Every leaf is its own term-pruned
read, so the plan's input size is the touched postings, not the index.

Not() is only meaningful inside And (Lucene MUST_NOT): a top-level or
Or-nested negation would mean "every doc in the corpus except…", which
an index cannot answer without a corpus scan — evaluate raises.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from inverted_index_spark.operators import query as _q
from inverted_index_spark.sources.store import SegmentStore


@dataclass(frozen=True)
class Term:
    term: str


@dataclass(frozen=True)
class Prefix:
    prefix: str


@dataclass(frozen=True)
class Fuzzy:
    term: str
    max_edits: int = 1


@dataclass(frozen=True)
class Phrase:
    tokens: tuple

    def __init__(self, tokens):
        object.__setattr__(self, "tokens", tuple(tokens))


@dataclass(frozen=True)
class And:
    clauses: tuple = field(default_factory=tuple)

    def __init__(self, *clauses):
        object.__setattr__(self, "clauses", tuple(clauses))


@dataclass(frozen=True)
class Or:
    clauses: tuple = field(default_factory=tuple)

    def __init__(self, *clauses):
        object.__setattr__(self, "clauses", tuple(clauses))


@dataclass(frozen=True)
class Not:
    clause: object


def parse_query(s: str):
    """Minimal Lucene-ish query-string syntax → query tree:

        spark merge          AND of clauses (google-style default)
        -window              MUST_NOT (Not inside the top-level And)
        "table hash"         exact phrase
        riv*                 prefix
        tble~                fuzzy (edit distance 1)

    Tokens are lowercased through the pinned tokenizer alphabet; an
    empty or all-negative query raises (unanswerable from an index).
    """
    import re

    clauses = []
    for neg, phrase, word in re.findall(
        r'(-?)(?:"([^"]+)"|(\S+))', s.strip()
    ):
        if phrase:
            node = Phrase([w.lower() for w in phrase.split()])
        else:
            w = word.lower()
            if w.endswith("*") and len(w) > 1:
                node = Prefix(w[:-1])
            elif w.endswith("~") and len(w) > 1:
                node = Fuzzy(w[:-1])
            else:
                node = Term(w)
        clauses.append(Not(node) if neg else node)
    if not clauses:
        raise ValueError("empty query")
    if all(isinstance(c, Not) for c in clauses):
        raise ValueError("all-negative query is unanswerable from an index")
    if len(clauses) == 1:
        return clauses[0]
    return And(*clauses)


def evaluate(
    spark: SparkSession,
    store: SegmentStore,
    q,
    min_doc: int | None = None,
    max_doc: int | None = None,
) -> DataFrame:
    """Evaluate a query tree → sorted unique (doc_id) DataFrame."""
    return _eval(spark, store, q, min_doc, max_doc).distinct().orderBy("doc_id")


def _eval(spark, store, q, lo, hi) -> DataFrame:
    if isinstance(q, Term):
        return _q.read_values(spark, store, [q.term], lo, hi)
    if isinstance(q, Prefix):
        return _q.read_values_prefix(spark, store, q.prefix, lo, hi)
    if isinstance(q, Fuzzy):
        return _q.fuzzy_values(spark, store, q.term, q.max_edits, lo, hi)
    if isinstance(q, Phrase):
        from inverted_index_spark.operators.positions import phrase_match

        return phrase_match(spark, store, list(q.tokens), lo, hi).select("doc_id")
    if isinstance(q, Or):
        if not q.clauses:
            return spark.createDataFrame([], "doc_id long")
        if any(isinstance(c, Not) for c in q.clauses):
            raise ValueError("Not() inside Or is unanswerable from an index")
        out = _eval(spark, store, q.clauses[0], lo, hi)
        for c in q.clauses[1:]:
            out = out.unionByName(_eval(spark, store, c, lo, hi))
        return out
    if isinstance(q, And):
        pos = [c for c in q.clauses if not isinstance(c, Not)]
        neg = [c.clause for c in q.clauses if isinstance(c, Not)]
        if not pos:
            raise ValueError("And() needs at least one positive clause")
        out = _eval(spark, store, pos[0], lo, hi)
        for c in pos[1:]:
            out = out.join(_eval(spark, store, c, lo, hi), "doc_id", "leftsemi")
        for c in neg:
            out = out.join(_eval(spark, store, c, lo, hi), "doc_id", "left_anti")
        return out
    if isinstance(q, Not):
        raise ValueError("top-level Not() is unanswerable from an index")
    raise TypeError(f"not a query node: {q!r}")
