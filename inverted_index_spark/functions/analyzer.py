"""Lucene-style analyzer chain on top of the pinned tokenizer.

The reference receives pre-extracted terms from its host and has no
analyzer (SURVEY.md §2.5); Lucene/ES users expect one. This module
adds the two classic English filters as an INGEST/QUERY-time text
transform, leaving the pinned tokenizer contract
(functions/tokenizer.py) untouched:

    tokenize (pinned contract) → stop filter → S-stemmer → re-join

Because the pinned tokenizer emits lowercase ``[\\p{L}\\p{N}_]+`` runs,
re-joining the filtered/stemmed tokens with single spaces and
re-tokenizing is the identity — an index built over ``apply()``-ed
text and queries passed through ``terms()`` see exactly the same term
space, which is the Lucene architecture (one analyzer instance shared
by IndexWriter and QueryParser).

The stemmer is Harman's S-stemmer (three suffix rules — "How
effective is suffixing?", JASIS 42(1), 1991) with a pinned ≥4-length
guard, chosen over Porter because every rule is expressible as the
same LIKE/substring logic in all three engines (Spark JVM expressions,
DuckDB SQL, Python) — so the hot path stays in whole-stage codegen and
the DuckDB oracle can mirror it byte-for-byte:

    len < 4                                 → unchanged
    ends 'ies' → 'ies' → 'y', unless 'eies'/'aies' (then unchanged)
    ends 'es'  → drop final 's', unless 'aes'/'ees'/'oes' (unchanged)
    ends 's'   → drop final 's', unless 'us'/'ss' (unchanged)
    (the first rule whose ENDING matches decides — a guarded ending
    stops the chain with the word unchanged, it does not fall through)

Stop-filter order is Lucene's EnglishAnalyzer order: stop first, stem
second (a stopword list written in surface form must be compared
against surface tokens). Duplicates and token order are preserved —
``filter``/``transform`` higher-order functions, never ``array_except``
(which deduplicates) — so tf/dl/position semantics stay exact.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .tokenizer import tokenize_text, tokens_expr

# Lucene's EnglishAnalyzer default stop set (public, lucene
# StopAnalyzer.ENGLISH_STOP_WORDS_SET) — callers may pass any set.
ENGLISH_STOPWORDS = frozenset(
    "a an and are as at be but by for if in into is it no not of on or "
    "such that the their then there these they this to was will with".split()
)


def stem_s(token: str) -> str:
    """Scalar S-stemmer (the pinned contract above) — the Python twin
    shared by query-side analysis and the pytest oracles."""
    t = token
    if len(t) < 4:
        return t
    if t.endswith("ies"):
        if t.endswith("eies") or t.endswith("aies"):
            return t
        return t[:-3] + "y"
    if t.endswith("es"):
        if t.endswith("aes") or t.endswith("ees") or t.endswith("oes"):
            return t
        return t[:-1]
    if t.endswith("s"):
        if t.endswith("us") or t.endswith("ss"):
            return t
        return t[:-1]
    return t


def _stem_expr(t: Column) -> Column:
    """JVM twin of :func:`stem_s` — LIKE + substring only (no
    lookbehind: the DuckDB oracle mirrors these rules in RE2-safe SQL)."""
    n = F.length(t)
    return (
        F.when(n < 4, t)
        .when(
            t.like("%ies"),
            F.when(
                t.like("%eies") | t.like("%aies"), t
            ).otherwise(F.concat(t.substr(F.lit(1), n - 3), F.lit("y"))),
        )
        .when(
            t.like("%es"),
            F.when(
                t.like("%aes") | t.like("%ees") | t.like("%oes"), t
            ).otherwise(t.substr(F.lit(1), n - 1)),
        )
        .when(
            t.like("%s"),
            F.when(
                t.like("%us") | t.like("%ss"), t
            ).otherwise(t.substr(F.lit(1), n - 1)),
        )
        .otherwise(t)
    )


@dataclass(frozen=True)
class Analyzer:
    """Configurable chain: ``stopwords`` (surface-form set, applied
    first) and ``stem`` (S-stemmer). Defaults are a no-op chain."""

    stopwords: frozenset[str] = field(default_factory=frozenset)
    stem: bool = False

    # ------------------------------------------------------ JVM side ---

    def tokens(self, text: Column) -> Column:
        """Analyzed token array for a text column — pure JVM exprs."""
        toks = tokens_expr(text)
        if self.stopwords:
            stop = F.array(*[F.lit(w) for w in sorted(self.stopwords)])
            toks = F.filter(toks, lambda t: ~F.array_contains(stop, t))
        if self.stem:
            toks = F.transform(toks, _stem_expr)
        return toks

    def expr(self, text: Column) -> Column:
        """Analyzed TEXT column (tokens re-joined with single spaces) —
        feed this to the standard build; re-tokenizing it is the
        identity on the pinned token class."""
        return F.array_join(self.tokens(text), " ")

    def apply(self, docs: DataFrame, text_col: str = "text") -> DataFrame:
        """Ingest pass: replace ``text_col`` with its analyzed form.
        Run once before build_index; keep the original column
        elsewhere (e.g. the doc store) if you need raw text back."""
        return docs.withColumn(text_col, self.expr(F.col(text_col)))

    # --------------------------------------------- query-tree rewrite ---

    def rewrite(self, node):
        """Map a parsed boolean query tree into this analyzer's term
        space (Lucene's stop-filtered QueryParser behavior):

        - Term: stopword → dropped (None); else stemmed.
        - Phrase: stopword tokens removed (remaining tokens close up —
          the engine has no position-increment holes; document the
          difference vs Lucene's gap-respecting phrases), others
          stemmed; an all-stopword phrase drops.
        - Prefix/Wildcard/Fuzzy: UNANALYZED, like Lucene's
          MultiTermQuery (a prefix of a surface form must not be
          stemmed — 'quer*' should match 'query').
        - Field: untouched — field indexes are metadata, built
          unanalyzed.
        - And/Or/Not/Boost: recurse; dropped clauses vanish, an
          operator left with nothing drops too; Or.minimum_should_match
          is capped at the surviving clause count.

        Returns the rewritten node, or None if the whole query
        analyzed away."""
        from inverted_index_spark.operators.boolean import (
            And, Boost, Field, Fuzzy, Not, Or, Phrase, Prefix, Term,
            Wildcard,
        )

        if isinstance(node, Term):
            if node.term in self.stopwords:
                return None
            return Term(stem_s(node.term)) if self.stem else node
        if isinstance(node, Phrase):
            toks = [t for t in node.tokens if t not in self.stopwords]
            if self.stem:
                toks = [stem_s(t) for t in toks]
            if not toks:
                return None
            return Phrase(toks, node.slop)
        if isinstance(node, (Prefix, Wildcard, Fuzzy, Field)):
            return node
        if isinstance(node, Not):
            inner = self.rewrite(node.clause)
            return None if inner is None else Not(inner)
        if isinstance(node, Boost):
            inner = self.rewrite(node.clause)
            return None if inner is None else Boost(inner, node.weight)
        if isinstance(node, And):
            kept = [c for c in (self.rewrite(c) for c in node.clauses)
                    if c is not None]
            if not kept:
                return None
            if all(isinstance(c, Not) for c in kept):
                return None  # pure-negative And is invalid downstream
            return kept[0] if len(kept) == 1 else And(*kept)
        if isinstance(node, Or):
            kept = [c for c in (self.rewrite(c) for c in node.clauses)
                    if c is not None]
            if not kept:
                return None
            if len(kept) == 1 and node.minimum_should_match <= 1:
                return kept[0]
            return Or(
                *kept,
                minimum_should_match=min(
                    node.minimum_should_match, len(kept)
                ),
            )
        return node

    # ----------------------------------------------- store persistence ---

    def save(self, store_root: str) -> None:
        """Pin this analyzer on an index store (sidecar
        ``analyzer.json`` at the store root — Lucene's 'the index
        remembers its analyzer' contract, so query surfaces can analyze
        input identically without the caller re-supplying the config).
        Raises if a DIFFERENT analyzer is already pinned."""
        import json
        import os

        existing = Analyzer.load(store_root)
        if existing is not None and existing != self:
            raise ValueError(
                f"store {store_root} already pins analyzer "
                f"{existing}; refusing to mix term spaces"
            )
        os.makedirs(store_root, exist_ok=True)
        path = os.path.join(store_root, "analyzer.json")
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(
                {"stopwords": sorted(self.stopwords), "stem": self.stem}, f
            )
        os.replace(tmp, path)

    @staticmethod
    def load(store_root: str) -> "Analyzer | None":
        """The analyzer pinned on a store, or None (raw pinned
        tokenizer only)."""
        import json
        import os

        path = os.path.join(store_root, "analyzer.json")
        if not os.path.exists(path):
            return None
        with open(path) as f:
            cfg = json.load(f)
        return Analyzer(
            stopwords=frozenset(cfg.get("stopwords", [])),
            stem=bool(cfg.get("stem", False)),
        )

    # --------------------------------------------------- Python side ---

    def terms(self, text: str) -> list[str]:
        """Query-side twin: analyze a query string exactly as indexed
        text was analyzed (tokenize → stop → stem)."""
        out = []
        for t in tokenize_text(text):
            if t in self.stopwords:
                continue
            out.append(stem_s(t) if self.stem else t)
        return out
