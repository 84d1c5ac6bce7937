"""Boolean query algebra vs a brute-force python oracle."""

from __future__ import annotations

import tempfile

import pytest

from inverted_index_spark.functions.tokenizer import tokenize_text
from inverted_index_spark.operators.boolean import (
    And, Fuzzy, Not, Or, Phrase, Prefix, Term, evaluate,
)
from inverted_index_spark.operators.build import build_index
from inverted_index_spark.sources.store import SegmentStore

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "quick brown foxes are quick brown"),
    (2, "the dog sleeps by the quiet river"),
    (3, "brown the quick"),
    (4, "a quick dog and a lazy fox"),
    (5, "rivers run quickly past the foxes"),
]


@pytest.fixture(scope="module")
def bstore(spark):
    store = SegmentStore(tempfile.mkdtemp(prefix="ii_bool_") + "/idx")
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    build_index(spark, df, store, bucket_size=4, positions=True)
    return store


def _toks(d):
    return tokenize_text(dict(DOCS)[d])


def py_eval(q):
    all_ids = [d for d, _ in DOCS]
    if isinstance(q, Term):
        return {d for d in all_ids if q.term in _toks(d)}
    if isinstance(q, Prefix):
        return {d for d in all_ids if any(t.startswith(q.prefix) for t in _toks(d))}
    if isinstance(q, Fuzzy):
        def lev1(a, b):
            if a == b:
                return True
            la, lb = len(a), len(b)
            if abs(la - lb) > 1:
                return False
            da = [a] + [a[:i] + a[i + 1:] for i in range(la)]
            db = [b] + [b[:i] + b[i + 1:] for i in range(lb)]
            return bool(set(da) & set(db))
        return {d for d in all_ids if any(lev1(t, q.term) for t in _toks(d))}
    if isinstance(q, Phrase):
        k = len(q.tokens)
        return {
            d for d in all_ids
            if any(
                _toks(d)[i:i + k] == list(q.tokens)
                for i in range(len(_toks(d)) - k + 1)
            )
        }
    if isinstance(q, Or):
        out = set()
        for c in q.clauses:
            out |= py_eval(c)
        return out
    if isinstance(q, And):
        pos = [c for c in q.clauses if not isinstance(c, Not)]
        neg = [c.clause for c in q.clauses if isinstance(c, Not)]
        out = py_eval(pos[0])
        for c in pos[1:]:
            out &= py_eval(c)
        for c in neg:
            out -= py_eval(c)
        return out
    raise TypeError(q)


@pytest.mark.parametrize(
    "q",
    [
        Term("quick"),
        Or(Term("dog"), Term("fox")),
        And(Term("quick"), Term("brown")),
        And(Term("quick"), Not(Term("fox"))),
        And(Or(Term("dog"), Term("fox")), Not(Phrase(["lazy", "dog"]))),
        Or(Phrase(["quick", "brown"]), And(Prefix("riv"), Term("the"))),
        And(Fuzzy("quik"), Not(Prefix("fox"))),
        Or(And(Term("the"), Not(Term("dog")), Not(Term("fox"))), Term("rivers")),
    ],
)
def test_boolean_vs_oracle(spark, bstore, q):
    got = {r["doc_id"] for r in evaluate(spark, bstore, q).collect()}
    assert got == py_eval(q), q


def test_boolean_contract_errors(spark, bstore):
    with pytest.raises(ValueError):
        evaluate(spark, bstore, Not(Term("x")))
    with pytest.raises(ValueError):
        evaluate(spark, bstore, Or(Term("x"), Not(Term("y"))))
    with pytest.raises(ValueError):
        evaluate(spark, bstore, And(Not(Term("y"))))


# ------------------------------------------------- random-tree property ---

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_VOCAB = ["quick", "brown", "fox", "dog", "the", "lazy", "rivers", "zzz"]

_leaf = st.one_of(
    st.sampled_from(_VOCAB).map(Term),
    st.sampled_from(["qu", "fo", "riv", "x"]).map(Prefix),
    st.sampled_from([["quick", "brown"], ["lazy", "dog"], ["the", "dog"]]).map(Phrase),
)


def _tree(depth):
    if depth == 0:
        return _leaf
    sub = _tree(depth - 1)
    return st.one_of(
        _leaf,
        st.lists(sub, min_size=1, max_size=3).map(lambda cs: Or(*cs)),
        st.tuples(
            st.lists(sub, min_size=1, max_size=2),
            st.lists(sub, min_size=0, max_size=2),
        ).map(lambda t: And(*t[0], *[Not(c) for c in t[1]])),
    )


@settings(
    max_examples=25, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(q=_tree(2))
def test_boolean_random_trees(spark, bstore, q):
    got = {r["doc_id"] for r in evaluate(spark, bstore, q).collect()}
    assert got == py_eval(q), q


def test_parse_query(spark, bstore):
    from inverted_index_spark.operators.boolean import parse_query

    q = parse_query('quick -fox "lazy dog" riv* quik~')
    assert q == And(
        Term("quick"), Not(Term("fox")), Phrase(["lazy", "dog"]),
        Prefix("riv"), Fuzzy("quik"),
    )
    assert parse_query("dog") == Term("dog")
    with pytest.raises(ValueError):
        parse_query("")
    with pytest.raises(ValueError):
        parse_query("-only -negatives")
    # parsed trees evaluate like hand-built ones
    got = {
        r["doc_id"]
        for r in evaluate(spark, bstore, parse_query('quick -"lazy dog"')).collect()
    }
    assert got == py_eval(And(Term("quick"), Not(Phrase(["lazy", "dog"]))))
