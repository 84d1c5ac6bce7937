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
        s = q.slop

        def sloppy_hit(toks: list[str]) -> bool:
            occ: dict[str, list[int]] = {}
            for i, t in enumerate(toks):
                occ.setdefault(t, []).append(i)
            return any(
                all(
                    any(p + i <= pos <= p + i + s for pos in occ.get(w, []))
                    for i, w in enumerate(q.tokens)
                )
                for p in occ.get(q.tokens[0], [])
            )

        return {d for d in all_ids if sloppy_hit(_toks(d))}
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


def test_parse_query_or_and_grouping():
    """Round-4 grammar: OR keyword, parentheses, NOT, precedence,
    same-type flattening — the reference's own term-set OR read
    (single/single.go:155-176) is finally expressible as a string."""
    from inverted_index_spark.operators.boolean import parse_query

    assert parse_query("dog OR fox") == Or(Term("dog"), Term("fox"))
    # precedence: OR binds loosest; adjacency/AND binds tighter
    assert parse_query("dog OR quick brown") == Or(
        Term("dog"), And(Term("quick"), Term("brown"))
    )
    assert parse_query("dog AND fox") == And(Term("dog"), Term("fox"))
    assert parse_query("(dog OR fox) -lazy") == And(
        Or(Term("dog"), Term("fox")), Not(Term("lazy"))
    )
    assert parse_query("quick NOT fox") == And(Term("quick"), Not(Term("fox")))
    # lowercase or/and/not are ordinary terms (Lucene-classic)
    assert parse_query("dog or fox") == And(Term("dog"), Term("or"), Term("fox"))
    # same-type nests flatten; a parenthesized negation folds into the
    # enclosing And
    assert parse_query("quick (brown fox)") == And(
        Term("quick"), Term("brown"), Term("fox")
    )
    assert parse_query("quick (-fox)") == And(Term("quick"), Not(Term("fox")))
    assert parse_query("(dog OR fox) OR quick") == Or(
        Term("dog"), Term("fox"), Term("quick")
    )
    # single-clause groups collapse
    assert parse_query("(dog)") == Term("dog")
    assert parse_query('quik~2') == Fuzzy("quik", 2)
    for bad in ["(dog", "dog)", "()", "a OR", '"']:
        with pytest.raises(ValueError):
            parse_query(bad)
    # dangling AND mirrors dangling OR (ADVICE r4 strictness parity)
    for bad in ["a AND", "AND a", "a AND AND b", "(a AND)", "a AND OR b"]:
        with pytest.raises(ValueError, match="dangling AND"):
            parse_query(bad)
    # a dangling '-' or punctuation-only word is dropped as noise
    assert parse_query("dog -") == Term("dog")
    # all-negative still unanswerable, even via OR/NOT spellings
    with pytest.raises(ValueError):
        parse_query("NOT dog")
    with pytest.raises(ValueError):
        parse_query("-a -b")


def test_parse_query_pinned_tokenizer_normalization():
    """Query words go through tokenize_text (ADVICE r3): punctuated
    words split into And of their index-side tokens, case folds,
    >64-char tokens drop — query-side tokenization == index-side."""
    from inverted_index_spark.operators.boolean import parse_query

    assert parse_query("Don't") == And(Term("don"), Term("t"))
    assert parse_query("FOO-BAR") == And(Term("foo"), Term("bar"))
    assert parse_query('"Lazy  DOG."') == Phrase(["lazy", "dog"])
    # a single-token quoted string is just a term
    assert parse_query('"dog"') == Term("dog")
    # punctuation-only words are dropped like the tokenizer drops them
    assert parse_query("dog !!!") == Term("dog")
    with pytest.raises(ValueError):
        parse_query("!!! ...")  # normalizes to nothing
    long = "x" * 65
    assert parse_query(f"dog {long}") == Term("dog")  # >64 chars dropped
    # prefix/fuzzy stems must be single tokens after normalization
    assert parse_query("RIV*") == Prefix("riv")
    with pytest.raises(ValueError):
        parse_query("foo-bar*")


def _render(q) -> str:
    if isinstance(q, Term):
        return q.term
    if isinstance(q, Prefix):
        return q.prefix + "*"
    if isinstance(q, Phrase):
        return '"' + " ".join(q.tokens) + '"'
    if isinstance(q, Or):
        return "(" + " OR ".join(_render(c) for c in q.clauses) + ")"
    if isinstance(q, And):
        return "(" + " ".join(_render(c) for c in q.clauses) + ")"
    if isinstance(q, Not):
        return "-" + _render(q.clause)
    raise TypeError(q)


@settings(max_examples=60, deadline=None)
@given(q=_tree(2))
def test_parse_render_roundtrip_semantics(q):
    """render(tree) → parse_query → same result set as the hand-built
    tree under the brute-force oracle (parse may flatten/collapse the
    tree, so equality is semantic, not structural)."""
    from inverted_index_spark.operators.boolean import parse_query

    assert py_eval(parse_query(_render(q))) == py_eval(q), _render(q)


# --------------------------------------------- slop / ranking / facets ---


@pytest.mark.parametrize(
    "q",
    [
        Phrase(["quick", "fox"], slop=2),
        Phrase(["quick", "fox"], slop=1),
        Phrase(["the", "dog"], slop=6),
        Phrase(["fox", "quick"], slop=2),   # order still required
        And(Phrase(["quick", "fox"], slop=2), Not(Term("lazy"))),
        Or(Phrase(["quick", "brown"], slop=0), Phrase(["dog", "river"], slop=3)),
    ],
)
def test_phrase_slop_in_algebra(spark, bstore, q):
    got = {r["doc_id"] for r in evaluate(spark, bstore, q).collect()}
    assert got == py_eval(q), q


def test_parse_phrase_slop():
    from inverted_index_spark.operators.boolean import parse_query

    assert parse_query('"quick fox"~2') == Phrase(["quick", "fox"], slop=2)
    assert parse_query('"quick fox"~') == Phrase(["quick", "fox"], slop=0)
    assert parse_query('"quick fox"') == Phrase(["quick", "fox"], slop=0)
    assert parse_query('a "quick fox"~3 -b') == And(
        Term("a"), Phrase(["quick", "fox"], slop=3), Not(Term("b"))
    )
    # slop on a single-token phrase collapses to the term
    assert parse_query('"dog"~5') == Term("dog")


def test_ranked_topk(spark, bstore):
    from inverted_index_spark.operators.bm25 import bm25_scores
    from inverted_index_spark.operators.boolean import parse_query, ranked_topk

    q = 'quick -fox'
    got = [(r["doc_id"], r["score"]) for r in ranked_topk(spark, bstore, q, k=10).collect()]
    match_set = py_eval(parse_query(q))
    assert {d for d, _ in got} == match_set
    # scores equal the BM25 stream over the positive scoring terms
    ref = {
        r["doc_id"]: r["score"]
        for r in bm25_scores(spark, bstore, ["quick"]).collect()
    }
    for d, s in got:
        assert abs(s - ref.get(d, 0.0)) < 1e-12
    # ordered by (score desc, doc_id asc)
    assert got == sorted(got, key=lambda x: (-x[1], x[0]))
    # tree input ≡ string input
    got2 = [
        (r["doc_id"], r["score"])
        for r in ranked_topk(
            spark, bstore, And(Term("quick"), Not(Term("fox"))), k=10
        ).collect()
    ]
    assert got == got2
    # constant-score path: Prefix-only query → all matches, score 0
    cs = [(r["doc_id"], r["score"]) for r in ranked_topk(spark, bstore, "riv*", k=10).collect()]
    assert {d for d, _ in cs} == py_eval(Prefix("riv"))
    assert all(s == 0.0 for _, s in cs)
    # a doc matched ONLY via a non-scoring clause is kept at score 0
    mixed = ranked_topk(spark, bstore, "quickly OR dog", k=10).collect()
    assert {r["doc_id"] for r in mixed} == py_eval(Or(Term("quickly"), Term("dog")))


def test_facet_counts(spark, bstore):
    from inverted_index_spark.operators.boolean import facet_counts

    docs = spark.createDataFrame(
        [(d, t, ["en", "de"][d % 2]) for d, t in DOCS],
        "doc_id long, text string, lang string",
    )
    got = {
        r["lang"]: r["n_docs"]
        for r in facet_counts(spark, bstore, "quick OR dog", docs, "lang").collect()
    }
    match = py_eval(Or(Term("quick"), Term("dog")))
    want = {}
    for d in match:
        want[["en", "de"][d % 2]] = want.get(["en", "de"][d % 2], 0) + 1
    assert got == want


@settings(max_examples=200, deadline=None)
@given(s=st.text(max_size=40))
def test_parse_query_fuzz_total(s):
    """The parser is TOTAL over arbitrary input: any string either
    parses to a query node or raises ValueError — never any other
    exception (the CLI hands it raw user input)."""
    from inverted_index_spark.operators.boolean import parse_query

    try:
        q = parse_query(s)
    except ValueError:
        return
    assert q is not None


# ------------------------------------------------------ fielded search ---


def test_parse_field_queries():
    from inverted_index_spark.operators.boolean import Field, parse_query

    assert parse_query("lang:en") == Field("lang", Term("en"))
    assert parse_query("spark lang:en") == And(Term("spark"), Field("lang", Term("en")))
    assert parse_query("-lang:de spark") == And(
        Not(Field("lang", Term("de"))), Term("spark")
    )
    assert parse_query('title:"new york"') == Field(
        "title", Phrase(["new", "york"])
    )
    assert parse_query("lang:e*") == Field("lang", Prefix("e"))
    # field value normalizes through the pinned tokenizer too
    assert parse_query("lang:EN") == Field("lang", Term("en"))
    with pytest.raises(ValueError):
        parse_query("lang: spark")  # dangling field


def test_fielded_evaluate(spark, bstore, tmp_path):
    from inverted_index_spark.operators.boolean import Field, parse_query
    from inverted_index_spark.operators.build import build_field_indexes

    meta = spark.createDataFrame(
        [(d, ["en", "de"][d % 2], ["web", "chat", "web", "chat", "web", "chat"][d])
         for d, _ in DOCS],
        "doc_id long, lang string, source string",
    )
    fs = build_field_indexes(
        spark, meta, str(tmp_path / "fields"), ["lang", "source"], bucket_size=4
    )
    q = parse_query("quick lang:en")
    got = {r["doc_id"] for r in evaluate(spark, bstore, q, field_stores=fs).collect()}
    assert got == py_eval(Term("quick")) & {0, 2, 4}
    # negated field + second field
    q2 = parse_query("dog -source:chat")
    got2 = {r["doc_id"] for r in evaluate(spark, bstore, q2, field_stores=fs).collect()}
    assert got2 == py_eval(Term("dog")) & {0, 2, 4}
    # OR across fields
    q3 = parse_query("lang:de OR source:web")
    got3 = {r["doc_id"] for r in evaluate(spark, bstore, q3, field_stores=fs).collect()}
    assert got3 == {0, 1, 2, 3, 4, 5}
    # unknown field raises with the known list, naming the clause
    with pytest.raises(ValueError, match="unknown field"):
        evaluate(spark, bstore, Field("nope", Term("x")), field_stores=fs)
    with pytest.raises(ValueError, match=r"unknown field 'lang' in clause 'lang:en'"):
        evaluate(spark, bstore, parse_query("lang:en"), field_stores={"source": fs["source"]})
    # a hand-built Field (no raw word) still errors without field_stores
    with pytest.raises(ValueError, match="unknown field"):
        evaluate(spark, bstore, Field("lang", Term("en")))


def test_colon_word_plain_text_fallback(spark, bstore):
    """With NO field_stores at all, a colon word keeps the pre-fielded
    plain-text reading: 'quick:dog' means AND(quick, dog), not an
    unknown-field error (the grammar-regression case in ADVICE r4)."""
    from inverted_index_spark.operators.boolean import parse_query

    got = {
        r["doc_id"]
        for r in evaluate(spark, bstore, parse_query("quick:dog")).collect()
    }
    assert got == py_eval(Term("quick")) & py_eval(Term("dog"))
    # tokens absent from the corpus → empty result, still no error
    assert evaluate(spark, bstore, parse_query("lang:en")).count() == 0
    # http://x style: scheme word no longer raises — whole word is
    # tokenized (and(http, quick) → no doc has 'http' → empty)
    assert evaluate(spark, bstore, parse_query("http://quick")).count() == 0


def test_ranked_and_facets_with_field_filters(spark, bstore, tmp_path):
    """ranked_topk / facet_counts compose with Field clauses: the
    field filters, only text-side terms score."""
    from inverted_index_spark.operators.bm25 import bm25_scores
    from inverted_index_spark.operators.boolean import facet_counts, ranked_topk
    from inverted_index_spark.operators.build import build_field_indexes

    meta = spark.createDataFrame(
        [(d, ["en", "de"][d % 2]) for d, _ in DOCS], "doc_id long, lang string"
    )
    fs = build_field_indexes(spark, meta, str(tmp_path / "f2"), ["lang"], bucket_size=4)
    got = [
        (r["doc_id"], r["score"])
        for r in ranked_topk(spark, bstore, "quick lang:en", field_stores=fs).collect()
    ]
    want_set = py_eval(Term("quick")) & {0, 2, 4}
    assert {d for d, _ in got} == want_set
    ref = {r["doc_id"]: r["score"] for r in bm25_scores(spark, bstore, ["quick"]).collect()}
    assert all(abs(s - ref[d]) < 1e-12 for d, s in got)  # lang never scores
    docs_df = spark.createDataFrame(DOCS, "doc_id long, text string").join(meta, "doc_id")
    fc = {
        r["lang"]: r["n_docs"]
        for r in facet_counts(
            spark, bstore, "quick lang:en", docs_df, "lang", field_stores=fs
        ).collect()
    }
    assert fc == {"en": len(want_set)}


def test_search_after_pagination(spark, bstore):
    from inverted_index_spark.operators.boolean import ranked_topk, search_after

    q = "quick OR dog"
    full = [
        (r["doc_id"], r["score"])
        for r in search_after(spark, bstore, q, k=100).collect()
    ]
    assert len(full) >= 4
    # same docs and order as ranked_topk (scores may differ ~1e-11:
    # deterministic sorted-fold vs shuffle-order sum)
    rt = [
        (r["doc_id"], r["score"])
        for r in ranked_topk(spark, bstore, q, k=100).collect()
    ]
    assert [d for d, _ in rt] == [d for d, _ in full]
    assert all(abs(a - b) < 1e-9 for (_, a), (_, b) in zip(rt, full))
    # pages of 2 stitched via cursors == the full ranked stream,
    # bit-exact (the deterministic scorer is run-stable)
    pages, cur = [], None
    while True:
        page = [
            (r["doc_id"], r["score"])
            for r in search_after(spark, bstore, q, k=2, after=cur).collect()
        ]
        if not page:
            break
        pages.extend(page)
        cur = (page[-1][1], page[-1][0])  # (score, doc_id)
    assert pages == full
    # after=None is page 1
    assert [
        (r["doc_id"], r["score"])
        for r in search_after(spark, bstore, q, k=2).collect()
    ] == full[:2]
    # cursor past the end -> empty
    tail = search_after(spark, bstore, q, k=2, after=(full[-1][1], full[-1][0]))
    assert tail.count() == 0


def test_facet_stats(spark, bstore):
    from inverted_index_spark.operators.boolean import facet_stats

    docs = spark.createDataFrame(
        [(d, t, ["en", "de"][d % 2], len(t)) for d, t in DOCS],
        "doc_id long, text string, lang string, n_chars long",
    )
    got = {
        r["lang"]: r
        for r in facet_stats(
            spark, bstore, "quick OR dog", docs, "lang", "n_chars"
        ).collect()
    }
    match = py_eval(Or(Term("quick"), Term("dog")))
    by_lang: dict[str, list[int]] = {}
    for d in match:
        by_lang.setdefault(["en", "de"][d % 2], []).append(len(dict(DOCS)[d]))
    assert set(got) == set(by_lang)
    for lang, vals in by_lang.items():
        r = got[lang]
        assert r["n_docs"] == len(vals)
        assert r["min_v"] == min(vals) and r["max_v"] == max(vals)
        assert r["sum_v"] == sum(vals)
        assert abs(r["avg_v"] - sum(vals) / len(vals)) < 1e-9


def test_facet_percentiles(spark, bstore):
    import numpy as np

    from inverted_index_spark.operators.boolean import facet_percentiles

    docs = spark.createDataFrame(
        [(d, t, ["en", "de"][d % 2], len(t)) for d, t in DOCS],
        "doc_id long, text string, lang string, n_chars long",
    )
    got = {
        r["lang"]: r
        for r in facet_percentiles(
            spark, bstore, "quick OR dog", docs, "lang", "n_chars",
            percentiles=(0.5, 0.9),
        ).collect()
    }
    match = py_eval(Or(Term("quick"), Term("dog")))
    by_lang: dict[str, list[int]] = {}
    for d in match:
        by_lang.setdefault(["en", "de"][d % 2], []).append(len(dict(DOCS)[d]))
    assert set(got) == set(by_lang)
    for lang, vals in by_lang.items():
        r = got[lang]
        assert r["n_docs"] == len(vals)
        # numpy 'linear' interpolation == Spark exact percentile
        assert abs(r["p50"] - float(np.percentile(vals, 50))) < 1e-9
        assert abs(r["p90"] - float(np.percentile(vals, 90))) < 1e-9


def test_collapse_topk(spark, bstore):
    from inverted_index_spark.operators.boolean import collapse_topk, ranked_topk

    docs = spark.createDataFrame(
        [(d, t, ["en", "de"][d % 2]) for d, t in DOCS],
        "doc_id long, text string, lang string",
    )
    q = "quick OR dog"
    ranked = [
        (r["doc_id"], r["score"])
        for r in ranked_topk(spark, bstore, q, k=100).collect()
    ]
    got = [
        (r["doc_id"], r["lang"], r["score"])
        for r in collapse_topk(spark, bstore, q, docs, "lang", k=10).collect()
    ]
    # best hit per lang, in global rank order
    best: dict[str, tuple[int, float]] = {}
    for d, s in ranked:  # ranked is (score desc, doc_id asc)
        lang = ["en", "de"][d % 2]
        best.setdefault(lang, (d, s))
    want = sorted(
        [(d, lang, s) for lang, (d, s) in best.items()],
        key=lambda x: (-x[2], x[0]),
    )
    assert [(d, lang) for d, lang, _ in got] == [(d, lang) for d, lang, _ in want]
    for (_, _, a), (_, _, b) in zip(got, want):
        assert abs(a - b) < 1e-9
    # per_field=2 keeps two best hits per lang
    got2 = collapse_topk(spark, bstore, q, docs, "lang", k=10, per_field=2).collect()
    from collections import Counter

    assert max(Counter(r["lang"] for r in got2).values()) <= 2
    assert len(got2) >= len(got)


def test_parse_boost_grammar():
    from inverted_index_spark.operators.boolean import Boost, parse_query

    q = parse_query("spark^2 merge")
    assert q == And(Boost(Term("spark"), 2.0), Term("merge"))
    q = parse_query('"table hash"~1^0.5')
    assert q == Boost(Phrase(["table", "hash"], slop=1), 0.5)
    q = parse_query('"table hash"^3')
    assert q == Boost(Phrase(["table", "hash"]), 3.0)
    q = parse_query("riv*^2.5")
    assert q == Boost(Prefix("riv"), 2.5)
    q = parse_query("tble~2^1.5")
    assert q == Boost(Fuzzy("tble", 2), 1.5)
    # '^' not followed by a number stays part of the word (tokenizer
    # then splits it): 'a^b' is not a boost
    q = parse_query("a^b")
    assert q == And(Term("a"), Term("b"))


def test_boosted_ranked_topk(spark, bstore):
    from inverted_index_spark.operators.bm25 import bm25_scores
    from inverted_index_spark.operators.boolean import ranked_topk

    # boost=1 in the grammar ≡ no boost at all
    plain = [
        (r["doc_id"], r["score"])
        for r in ranked_topk(spark, bstore, "quick dog", k=10).collect()
    ]
    one = [
        (r["doc_id"], r["score"])
        for r in ranked_topk(spark, bstore, "quick^1 dog", k=10).collect()
    ]
    assert plain == one
    # boosted scores = boosted-contribution sum from the scorer itself
    # ('quick^3 dog^0.5' is an AND query — matches need BOTH terms)
    got = {
        r["doc_id"]: r["score"]
        for r in ranked_topk(spark, bstore, "quick^3 dog^0.5", k=10).collect()
    }
    ref = {
        r["doc_id"]: r["score"]
        for r in bm25_scores(
            spark, bstore, ["quick", "dog"], boosts={"quick": 3.0, "dog": 0.5}
        ).collect()
    }
    assert set(got) == py_eval(And(Term("quick"), Term("dog")))
    for d, s in got.items():
        assert abs(s - ref[d]) < 1e-12
    # and the boosted sum is the plain per-term sums re-weighted
    q_only = {
        r["doc_id"]: r["score"]
        for r in bm25_scores(spark, bstore, ["quick"]).collect()
    }
    d_only = {
        r["doc_id"]: r["score"]
        for r in bm25_scores(spark, bstore, ["dog"]).collect()
    }
    for d, s in got.items():
        want = 3.0 * q_only.get(d, 0.0) + 0.5 * d_only.get(d, 0.0)
        assert abs(s - want) < 1e-9
    # boosting must never change the MATCH set, only scores: the
    # boosted AND matches exactly what the unboosted AND matches
    unboosted = {
        r["doc_id"]
        for r in ranked_topk(spark, bstore, "quick dog", k=10).collect()
    }
    assert set(got) == unboosted


def test_minimum_should_match(spark, bstore):
    from inverted_index_spark.operators.boolean import evaluate

    clauses = [Term("quick"), Term("dog"), Term("fox")]
    sets = [py_eval(c) for c in clauses]
    for m in (1, 2, 3, 4):
        got = {
            r["doc_id"]
            for r in evaluate(
                spark, bstore, Or(*clauses, minimum_should_match=m)
            ).collect()
        }
        want = {
            d
            for d in {x for s in sets for x in s}
            if sum(d in s for s in sets) >= m
        }
        assert got == want, f"msm={m}"
    # msm composes inside a larger tree
    q = And(Or(*clauses, minimum_should_match=2), Not(Term("lazy")))
    got = {r["doc_id"] for r in evaluate(spark, bstore, q).collect()}
    want2 = {
        d
        for d in {x for s in sets for x in s}
        if sum(d in s for s in sets) >= 2
    } - py_eval(Term("lazy"))
    assert got == want2


def test_wildcard_queries(spark, bstore):
    import fnmatch

    from inverted_index_spark.operators.boolean import (
        Prefix, Wildcard, evaluate, parse_query,
    )

    # grammar: mid-word wildcards → Wildcard; pure trailing * → Prefix
    assert parse_query("qu?ck") == Wildcard("qu?ck")
    assert parse_query("f*x") == Wildcard("f*x")
    assert parse_query("QU?CK") == Wildcard("qu?ck")  # lowercased only
    assert parse_query("riv*") == Prefix("riv")
    assert parse_query("r?ver*") == Wildcard("r?ver*")
    with pytest.raises(ValueError):
        parse_query("qu?ck-er")  # non-term char mixed into the pattern

    def wc_oracle(pat):
        all_ids = [d for d, _ in DOCS]
        return {
            d
            for d in all_ids
            if any(fnmatch.fnmatchcase(t, pat) for t in _toks(d))
        }

    for pat in ("qu?ck", "f*x", "fox*s", "r?ver*", "*og"):
        got = {
            r["doc_id"]
            for r in evaluate(spark, bstore, parse_query(pat)).collect()
        }
        assert got == wc_oracle(pat), pat
    # composes with the algebra; constant-score in ranked mode
    got = {
        r["doc_id"]
        for r in evaluate(spark, bstore, parse_query("qu?ck -f*x")).collect()
    }
    assert got == wc_oracle("qu?ck") - wc_oracle("f*x")
    from inverted_index_spark.operators.boolean import ranked_topk

    ranked = ranked_topk(spark, bstore, "qu?ck", k=10).collect()
    assert {r["doc_id"] for r in ranked} == wc_oracle("qu?ck")
    assert all(r["score"] == 0.0 for r in ranked)


def test_rescore_topk(spark, bstore):
    from inverted_index_spark.operators.bm25 import bm25_scores, rescore_topk

    terms = phrase = ["quick", "brown"]
    got = [
        (r["doc_id"], r["score"])
        for r in rescore_topk(
            spark, bstore, terms, phrase, k=10, n_window=10,
            query_weight=1.0, rescore_weight=2.0,
        ).collect()
    ]
    base = {
        r["doc_id"]: r["score"]
        for r in bm25_scores(spark, bstore, terms).collect()
    }
    ph_docs = py_eval(Phrase(["quick", "brown"]))
    want = sorted(
        (
            (d, s + 2.0 * (s if d in ph_docs else 0.0))
            for d, s in base.items()
        ),
        key=lambda x: (-x[1], x[0]),
    )
    assert [d for d, _ in got] == [d for d, _ in want[: len(got)]]
    for (_, a), (_, b) in zip(got, want):
        assert abs(a - b) < 1e-9
    # exact-phrase docs outrank scattered-token docs after rescore
    first_nonphrase = next(i for i, (d, _) in enumerate(got) if d not in ph_docs)
    assert all(d in ph_docs for d, _ in got[:first_nonphrase])
    assert first_nonphrase >= 1


def test_facet_percentiles_fine_grain_names(spark, bstore):
    """0.99 and 0.999 must produce DISTINCT column names (p99, p99_9),
    not two ambiguous 'p99' columns."""
    from inverted_index_spark.operators.boolean import facet_percentiles

    docs = spark.createDataFrame(
        [(i, "x", i) for i in range(8)],
        "doc_id long, lang string, n long",
    )
    out = facet_percentiles(
        spark, bstore, "spark", docs, "lang", "n",
        percentiles=(0.5, 0.99, 0.999),
    )
    assert out.columns == ["lang", "n_docs", "p50", "p99", "p99_9"]
    out.collect()  # and the plan actually runs
    with pytest.raises(ValueError, match="duplicate percentiles"):
        facet_percentiles(
            spark, bstore, "spark", docs, "lang", "n",
            percentiles=(0.99, 0.99),
        )
