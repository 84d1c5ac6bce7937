"""Percolator (reverse search): engine vs a brute-force python oracle.

The oracle evaluates each stored query tree directly against the
tokenized document (sets for terms, sliding window for phrases), so
any DNF-compilation or prune/verify bug diverges.
"""

from __future__ import annotations

import pytest

from inverted_index_spark.functions.tokenizer import tokenize_text
from inverted_index_spark.operators.boolean import (
    And,
    Boost,
    Fuzzy,
    Not,
    Or,
    Phrase,
    Term,
)
from inverted_index_spark.operators.percolate import compile_queries, percolate

DOCS = [
    (0, "spark window merge agg table hash join"),
    (1, "table hash fast scan"),
    (2, "window table hash window"),
    (3, "merge sort run"),
    (4, "spark spark table"),
    (5, "hash table"),  # reversed phrase order
    (6, "plain filler text row"),
    (7, ""),
]


def _oracle_match(node, toks: list[str]) -> bool:
    tset = set(toks)
    if isinstance(node, Boost):
        return _oracle_match(node.clause, toks)
    if isinstance(node, Term):
        return tokenize_text(node.term)[0] in tset
    if isinstance(node, Not):
        return not _oracle_match(node.clause, toks)
    if isinstance(node, And):
        return all(_oracle_match(c, toks) for c in node.clauses)
    if isinstance(node, Or):
        n = sum(_oracle_match(c, toks) for c in node.clauses)
        return n >= node.minimum_should_match
    if isinstance(node, Phrase):
        p = [tokenize_text(t)[0] for t in node.tokens]
        return any(
            toks[i : i + len(p)] == p for i in range(len(toks) - len(p) + 1)
        )
    raise AssertionError(node)


QUERIES = {
    "q_and": And(Term("spark"), Term("window")),
    "q_or": Or(Term("merge"), Term("scan")),
    "q_not": And(Term("table"), Not(Term("window"))),
    "q_phrase": Phrase(["table", "hash"]),
    "q_neg_phrase": And(Term("hash"), Not(Phrase(["table", "hash"]))),
    "q_msm": Or(
        Term("spark"), Term("merge"), Term("scan"), minimum_should_match=2
    ),
    "q_boost": Boost(Or(Term("run"), Phrase(["spark", "table"])), 2.0),
    "q_pure_neg": Not(Term("table")),
    "q_demorgan": Not(Or(Term("spark"), Term("hash"))),
    "q_string": "(merge -sort) OR \"window table\"",
}


def _expected() -> set:
    from inverted_index_spark.operators.boolean import parse_query

    out = set()
    for qid, q in QUERIES.items():
        node = parse_query(q) if isinstance(q, str) else q
        for doc_id, text in DOCS:
            if _oracle_match(node, tokenize_text(text)):
                out.add((doc_id, qid))
    return out


def test_percolate_matches_oracle(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        (r.doc_id, r.query_id)
        for r in percolate(spark, docs, QUERIES).collect()
    }
    assert got == _expected()


def test_percolate_list_input_and_id_col(spark):
    docs = spark.createDataFrame(
        [(10, "spark window"), (11, "spark")], "uid long, body string"
    )
    got = {
        (r.doc_id, r.query_id)
        for r in percolate(
            spark,
            docs,
            [("a", "spark window"), ("b", "spark -window")],
            text_col="body",
            id_col="uid",
        ).collect()
    }
    assert got == {(10, "a"), (11, "b")}


def test_compile_rejects_unsupported():
    with pytest.raises(ValueError, match="term/phrase"):
        compile_queries({"q": Fuzzy("tble", 1)})
    with pytest.raises(ValueError, match="slop"):
        compile_queries({"q": Phrase(["a", "b"], slop=2)})
    with pytest.raises(ValueError, match="disjuncts"):
        big = And(*[Or(Term(f"a{i}"), Term(f"b{i}")) for i in range(8)])
        compile_queries({"q": big}, max_disjuncts=64)
    with pytest.raises(ValueError, match="unsatisfiable"):
        compile_queries({"q": And(Term("x"), Not(Term("x")))})


def test_contradictory_disjunct_dropped():
    # (x AND NOT x) OR y keeps only the y disjunct
    disjs = compile_queries(
        {"q": Or(And(Term("x"), Not(Term("x"))), Term("y"))}
    )["q"]
    assert disjs == [(frozenset(["y"]), frozenset(), frozenset(), frozenset())]


def test_msm_expansion_semantics():
    disjs = compile_queries(
        {"q": Or(Term("a"), Term("b"), Term("c"), minimum_should_match=2)}
    )["q"]
    assert {d[0] for d in disjs} == {
        frozenset(["a", "b"]),
        frozenset(["a", "c"]),
        frozenset(["b", "c"]),
    }
