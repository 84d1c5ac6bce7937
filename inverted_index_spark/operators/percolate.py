"""ES-style percolator: reverse search — match DOCUMENTS against a
registry of STORED QUERIES.

The reference library has no percolator (its surface is forward reads
over a posting store, ``single/single.go`` / ``multiple/
multiple_index.go``); this is an Elasticsearch capability extension
(the ``percolate`` query): alerting/routing pipelines store thousands
of standing queries and ask, for each incoming document batch, which
queries fire.

Design — candidate-prune + verify, the same two-phase shape ES uses
(it indexes each query's extractable terms, prunes candidates with a
term query, then re-runs survivors on a one-doc memory index):

1. **Compile** (driver): each stored query — a Lucene-classic grammar
   string or a ``boolean`` node tree — is normalized through the
   pinned tokenizer and rewritten to disjunctive normal form over
   literals. A literal is a required term, a forbidden term, or an
   (anti-)phrase. Stored-query registries are KBs-to-MBs at any
   corpus scale, so the blow-up-capped DNF rewrite is driver work by
   design; the DOCUMENT side never leaves the cluster.
2. **Prune** (one distributed pass): the positive-literal table
   broadcasts against the exploded distinct ``(doc, term)`` relation;
   one ``groupBy(doc, query, disjunct)`` counts required-term hits
   and keeps full houses. Zero-required disjuncts (pure negations)
   expand against the doc-id universe via a broadcast nested-loop
   join whose build side is the handful of such disjuncts.
3. **Verify**: forbidden terms anti-join; phrase literals (conjuncts
   of their terms for pruning) check exact token adjacency on the
   survivors with a pure-JVM expression — ``' '||array_join(tokens,
   ' ')||' '`` contains ``' phrase '`` is exact adjacency under the
   pinned tokenizer (single-space join is injective on the token
   class), so no positional index is needed on raw incoming docs.

Scale shape: the doc side pays one tokenize + one broadcast join +
one aggregation keyed ``(doc, query, disjunct)`` — thousands of
stored queries ride ONE Catalyst plan and there is no per-query job.
Document text shuffles only in the phrase-verify step, only for docs
that are candidates of a phrase-bearing disjunct (the text side is
leftsemi-pruned to candidate ids first; AQE broadcasts the id set in
the common small-candidate case).
"""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.tokenizer import tokenize_text, tokens_expr
from .boolean import And, Boost, Field, Not, Or, Phrase, Term, parse_query

__all__ = ["compile_queries", "percolate"]


def _norm_term(word: str) -> str:
    toks = tokenize_text(word)
    if len(toks) != 1:
        raise ValueError(
            f"percolate: {word!r} does not normalize to exactly one token"
        )
    return toks[0]


def _lit_term(term: str, neg: bool):
    return frozenset() if neg else frozenset([term]), (
        frozenset([term]) if neg else frozenset()
    )


def _dnf(node, neg: bool, cap: int) -> list[tuple]:
    """Disjuncts as (pos_terms, neg_terms, phrases, neg_phrases) —
    negation pushed to the literals (De Morgan), ``Or`` blow-up capped
    at ``cap`` disjuncts per stored query."""
    if isinstance(node, Boost):  # matching-transparent
        return _dnf(node.clause, neg, cap)
    if isinstance(node, Not):
        return _dnf(node.clause, not neg, cap)
    if isinstance(node, Term):
        pos, n = _lit_term(_norm_term(node.term), neg)
        return [(pos, n, frozenset(), frozenset())]
    if isinstance(node, Phrase):
        if node.slop:
            raise ValueError(
                "percolate supports exact phrases only (slop=0); got "
                f"slop={node.slop}"
            )
        terms = tuple(_norm_term(t) for t in node.tokens)
        phrase = " ".join(terms)
        if neg:
            return [(frozenset(), frozenset(), frozenset(), frozenset([phrase]))]
        # phrase terms double as required terms: free candidate pruning
        return [(frozenset(terms), frozenset(), frozenset([phrase]), frozenset())]
    if isinstance(node, (And, Or)):
        conjunctive = isinstance(node, And) != neg  # And, or negated Or
        clauses = node.clauses
        if isinstance(node, Or) and node.minimum_should_match > 1:
            # "at least m of n" = OR over the exactly-m AND-subsets
            # (a superset match implies some m-subset matches)
            m = node.minimum_should_match
            if m > len(clauses):
                raise ValueError("minimum_should_match exceeds clause count")
            node = Or(*[And(*c) for c in combinations(clauses, m)])
            return _dnf(node, neg, cap)
        parts = [_dnf(c, neg, cap) for c in clauses]
        if not conjunctive:
            out = [d for p in parts for d in p]
            if len(out) > cap:
                raise ValueError(f"percolate: query exceeds {cap} DNF disjuncts")
            return out
        out = [(frozenset(), frozenset(), frozenset(), frozenset())]
        for p in parts:
            out = [
                (a0 | b0, a1 | b1, a2 | b2, a3 | b3)
                for (a0, a1, a2, a3) in out
                for (b0, b1, b2, b3) in p
            ]
            if len(out) > cap:
                raise ValueError(f"percolate: query exceeds {cap} DNF disjuncts")
        return out
    if isinstance(node, Field):
        raise ValueError(
            "percolate matches raw document text; fielded clauses "
            f"(`{node.name}:...`) are not supported"
        )
    raise ValueError(
        f"percolate supports term/phrase/AND/OR/NOT queries; got "
        f"{type(node).__name__}"
    )


def compile_queries(queries, max_disjuncts: int = 64) -> dict:
    """``{query_id: [disjunct, ...]}`` from strings or node trees.

    Contradictory disjuncts (a term both required and forbidden, or a
    required phrase also forbidden) are dropped — they can never
    match; a query whose every disjunct is contradictory raises."""
    items = queries.items() if isinstance(queries, dict) else queries
    compiled = {}
    for qid, q in items:
        node = parse_query(q) if isinstance(q, str) else q
        disjs = [
            d
            for d in _dnf(node, False, max_disjuncts)
            if not (d[0] & d[1]) and not (d[2] & d[3])
        ]
        if not disjs:
            raise ValueError(f"percolate: query {qid!r} is unsatisfiable")
        compiled[str(qid)] = disjs
    return compiled


def percolate(
    spark: SparkSession,
    docs: DataFrame,
    queries,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_disjuncts: int = 64,
) -> DataFrame:
    """``(doc_id, query_id)`` — which stored queries match each doc.

    ``queries``: ``{query_id: query}`` or ``[(query_id, query), ...]``
    where each query is a grammar string (``parse_query`` syntax) or a
    ``boolean`` node tree over Term/Phrase/And/Or/Not/Boost.
    """
    compiled = compile_queries(queries, max_disjuncts)

    pos_rows, neg_rows, phr_rows, univ_rows = [], [], [], []
    for qid, disjs in compiled.items():
        for di, (pos, negs, phrases, neg_phrases) in enumerate(disjs):
            n_req = len(pos)
            for t in pos:
                pos_rows.append((qid, di, t, n_req))
            for t in negs:
                neg_rows.append((qid, di, t))
            for p in phrases:
                phr_rows.append((qid, di, p, False))
            for p in neg_phrases:
                phr_rows.append((qid, di, p, True))
            if n_req == 0:
                univ_rows.append((qid, di))

    doc_id = F.col(id_col).alias("doc_id")
    toks = tokens_expr(F.col(text_col))
    dtok = docs.select(doc_id, F.explode(F.array_distinct(toks)).alias("term"))

    cand = None
    if pos_rows:
        pos_df = spark.createDataFrame(
            pos_rows, "query_id string, disj int, term string, n_req int"
        )
        cand = (
            dtok.join(F.broadcast(pos_df), "term")
            .groupBy("doc_id", "query_id", "disj", "n_req")
            .agg(F.countDistinct("term").alias("n_hit"))
            .where(F.col("n_hit") == F.col("n_req"))
            .select("doc_id", "query_id", "disj")
        )
    if univ_rows:
        # pure-negation disjuncts match the whole doc universe up
        # front; the broadcast build side is the (tiny) disjunct list
        univ_df = spark.createDataFrame(univ_rows, "query_id string, disj int")
        expanded = docs.select(doc_id).crossJoin(F.broadcast(univ_df))
        cand = expanded if cand is None else cand.unionByName(expanded)
    if cand is None:  # unreachable: compile_queries rejects empty queries
        raise ValueError("percolate: no stored queries")

    if neg_rows:
        neg_df = spark.createDataFrame(
            neg_rows, "query_id string, disj int, term string"
        )
        neg_hits = dtok.join(F.broadcast(neg_df), "term").select(
            "doc_id", "query_id", "disj"
        )
        cand = cand.join(neg_hits, ["doc_id", "query_id", "disj"], "left_anti")

    if phr_rows:
        phr_df = spark.createDataFrame(
            phr_rows, "query_id string, disj int, phrase string, forbid boolean"
        )
        padded = docs.select(
            doc_id,
            F.concat(F.lit(" "), F.array_join(toks, " "), F.lit(" ")).alias(
                "_pad"
            ),
        )
        need = cand.join(F.broadcast(phr_df), ["query_id", "disj"])
        # prune the text side to phrase-candidate docs BEFORE the text
        # join: candidates of phrase-bearing disjuncts are usually a
        # small fraction of the corpus, and AQE broadcasts the id set
        # when it is — the re-join then shuffles only candidate text,
        # not the whole corpus (worst case — a phrase disjunct whose
        # required terms match most docs — degrades to a doc_id-keyed
        # text shuffle, which is the floor for adjacency verification
        # without a positional index)
        padded = padded.join(
            need.select("doc_id").distinct(), "doc_id", "leftsemi"
        )
        checked = (
            need.join(padded, "doc_id")
            .withColumn(
                "_ok",
                F.col("_pad").contains(
                    F.concat(F.lit(" "), F.col("phrase"), F.lit(" "))
                )
                != F.col("forbid"),
            )
            .groupBy("doc_id", "query_id", "disj")
            .agg(F.min(F.col("_ok").cast("int")).alias("_all_ok"))
            .where(F.col("_all_ok") == 1)
            .select("doc_id", "query_id", "disj")
        )
        phrased = phr_df.select("query_id", "disj").distinct()
        plain = cand.join(F.broadcast(phrased), ["query_id", "disj"], "left_anti")
        cand = plain.unionByName(checked)

    return cand.select("doc_id", "query_id").distinct()
