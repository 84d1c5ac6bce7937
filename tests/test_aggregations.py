"""Index-native aggregations (significant_terms, term_vectors,
bm25_explain, facet_cardinality) vs brute-force python oracles."""

from __future__ import annotations

import math
import tempfile
from collections import Counter

import pytest

from inverted_index_spark.functions.tokenizer import tokenize_text
from inverted_index_spark.operators.aggregations import (
    bm25_explain,
    facet_cardinality,
    significant_terms,
    term_vectors,
)
from inverted_index_spark.operators.build import build_index
from inverted_index_spark.sources.store import SegmentStore

DOCS = [
    (0, "spark shuffle spark partition merge"),
    (1, "spark merge window window"),
    (2, "quiet river bank and a window"),
    (3, "spark spark spark shuffle"),
    (4, "river bank merge"),
    (5, "window merge partition shuffle"),
    (6, "a quiet dog by the river"),
    (7, "partition pruning in spark window"),
]


def _toks(d):
    return tokenize_text(dict(DOCS)[d])


@pytest.fixture(scope="module")
def astore(spark):
    store = SegmentStore(tempfile.mkdtemp(prefix="ii_agg_") + "/idx")
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    build_index(spark, df, store, bucket_size=4)
    return store


@pytest.fixture(scope="module")
def astore_multiseg(spark):
    """Two overlapping live segments: doc 1 indexed in BOTH (identical
    text), so (term, doc) pairs replay across segments — the dedup
    path the aggregations must survive."""
    store = SegmentStore(tempfile.mkdtemp(prefix="ii_agg_ms_") + "/idx")
    df1 = spark.createDataFrame(DOCS[:4], "doc_id long, text string")
    df2 = spark.createDataFrame(DOCS[1:2] + DOCS[4:], "doc_id long, text string")
    build_index(spark, df1, store, bucket_size=4)
    build_index(spark, df2, store, bucket_size=4)
    return store


def _sig_oracle(match_ids: set[int], min_doc_count: int = 1):
    n = len(DOCS)
    fg_total = len(match_ids)
    bg = Counter(t for d, _ in DOCS for t in set(_toks(d)))
    fg = Counter(t for d in match_ids for t in set(_toks(d)))
    out = []
    for t, bg_df in bg.items():
        fg_df = fg.get(t, 0)
        if fg_df < min_doc_count:
            continue
        fgp, bgp = fg_df / fg_total, bg_df / n
        out.append((t, fg_df, bg_df, (fgp - bgp) * (fgp / bgp)))
    return sorted(out, key=lambda x: (-x[3], x[0]))


def test_significant_terms(spark, astore):
    match_ids = {d for d, _ in DOCS if "spark" in _toks(d)}
    got = significant_terms(
        spark, astore, "spark", k=5, min_doc_count=1
    ).collect()
    want = _sig_oracle(match_ids)[:5]
    assert [(r["term"], r["fg_df"], r["bg_df"]) for r in got] == [
        (t, f, b) for t, f, b, _ in want
    ]
    for r, (_, _, _, s) in zip(got, want):
        assert abs(r["score"] - s) < 1e-9
    # 'spark' itself tops the list (fg% = 1.0, rarest in background
    # among always-present terms); every fg_df <= matches
    assert got[0]["term"] == "spark"
    # min_doc_count floor drops the one-off terms
    floored = significant_terms(
        spark, astore, "spark", k=50, min_doc_count=3
    ).collect()
    assert all(r["fg_df"] >= 3 for r in floored)


def test_significant_terms_multiseg_dedup(spark, astore_multiseg):
    """Doc 1 lives in two segments — counts must not double."""
    match_ids = {d for d, _ in DOCS if "spark" in _toks(d)}
    got = significant_terms(
        spark, astore_multiseg, "spark", k=5, min_doc_count=1
    ).collect()
    want = _sig_oracle(match_ids)[:5]
    assert [(r["term"], r["fg_df"], r["bg_df"]) for r in got] == [
        (t, f, b) for t, f, b, _ in want
    ]


def test_significant_terms_doc_range(spark, astore):
    """With a doc range, BOTH universes restrict to the range: bg_df
    comes from the pruned scan, so N must be the range's doc count —
    using the corpus-wide N deflates bg% and distorts every score."""
    lo, hi = 2, 6
    in_range = [d for d, _ in DOCS if lo <= d <= hi]
    match_ids = {d for d in in_range if "merge" in _toks(d)}
    n, fg_total = len(in_range), len(match_ids)
    bg = Counter(t for d in in_range for t in set(_toks(d)))
    fg = Counter(t for d in match_ids for t in set(_toks(d)))
    want = sorted(
        (
            (t, fg.get(t, 0), b,
             (fg.get(t, 0) / fg_total - b / n)
             * (fg.get(t, 0) / fg_total) / (b / n))
            for t, b in bg.items()
            if fg.get(t, 0) >= 1
        ),
        key=lambda x: (-x[3], x[0]),
    )
    got = significant_terms(
        spark, astore, "merge", k=50, min_doc_count=1, min_doc=lo, max_doc=hi
    ).collect()
    assert [(r["term"], r["fg_df"], r["bg_df"]) for r in got] == [
        (t, f, b) for t, f, b, _ in want
    ]
    for r, (_, _, _, s) in zip(got, want):
        assert abs(r["score"] - s) < 1e-9


def test_term_vectors(spark, astore, astore_multiseg):
    for store in (astore, astore_multiseg):
        got = [
            (r["doc_id"], r["term"], r["tf"])
            for r in term_vectors(spark, store, [1, 5]).collect()
        ]
        want = sorted(
            (d, t, c)
            for d in (1, 5)
            for t, c in Counter(_toks(d)).items()
        )
        assert got == want
    assert term_vectors(spark, astore, []).count() == 0


def test_bm25_explain(spark, astore):
    from inverted_index_spark.operators.bm25 import bm25_scores

    terms = ["spark", "merge"]
    rows = bm25_explain(spark, astore, terms).collect()
    n = len(DOCS)
    avgdl = sum(len(_toks(d)) for d, _ in DOCS) / n
    dfs = Counter(t for d, _ in DOCS for t in set(_toks(d)))
    for r in rows:
        toks = _toks(r["doc_id"])
        assert r["tf"] == toks.count(r["term"])
        assert r["dl"] == len(toks)
        assert r["df"] == dfs[r["term"]]
        idf = math.log((n - r["df"] + 0.5) / (r["df"] + 0.5) + 1.0)
        assert abs(r["idf"] - idf) < 1e-12
        tfn = r["tf"] / (r["tf"] + 1.2 * (1 - 0.75 + 0.75 * r["dl"] / avgdl))
        assert abs(r["tf_norm"] - tfn) < 1e-12
        assert abs(r["contribution"] - r["boost"] * idf * tfn) < 1e-12
    # explanations sum back to the scorer, boosted and not
    for boosts in (None, {"spark": 2.5}):
        rows = bm25_explain(spark, astore, terms, boosts=boosts).collect()
        per_doc: dict[int, float] = {}
        for r in rows:
            per_doc[r["doc_id"]] = per_doc.get(r["doc_id"], 0.0) + r["contribution"]
        ref = {
            r["doc_id"]: r["score"]
            for r in bm25_scores(spark, astore, terms, boosts=boosts).collect()
        }
        assert set(per_doc) == set(ref)
        for d in ref:
            assert abs(per_doc[d] - ref[d]) < 1e-9
    # doc_ids restriction
    only = bm25_explain(spark, astore, terms, doc_ids=[0]).collect()
    assert {r["doc_id"] for r in only} == {0}


def test_facet_cardinality(spark, astore):
    docs = spark.createDataFrame(
        [(d, t, ["en", "de", "fr"][d % 3]) for d, t in DOCS],
        "doc_id long, text string, lang string",
    )
    match_ids = {d for d, _ in DOCS if "merge" in _toks(d)}
    want = len({["en", "de", "fr"][d % 3] for d in match_ids})
    got = facet_cardinality(spark, astore, "merge", docs, "lang").collect()
    assert got[0]["cardinality"] == want
    # HLL path: exact at this tiny cardinality
    approx = facet_cardinality(
        spark, astore, "merge", docs, "lang", exact=False
    ).collect()
    assert approx[0]["cardinality"] == want


def test_unigram_loglik(spark, astore, astore_multiseg):
    from inverted_index_spark.operators.aggregations import unigram_loglik

    all_toks = [t for d, _ in DOCS for t in _toks(d)]
    total = len(all_toks)
    ctf = Counter(all_toks)
    for store in (astore, astore_multiseg):
        got = {
            r["doc_id"]: (r["dl"], r["avg_loglik"])
            for r in unigram_loglik(spark, store).collect()
        }
        assert set(got) == {d for d, _ in DOCS}
        for d, _ in DOCS:
            toks = _toks(d)
            want = sum(
                math.log(ctf[t] / total) for t in toks
            ) / len(toks)
            assert got[d][0] == len(toks)
            assert abs(got[d][1] - want) < 1e-9, (d, got[d], want)
    # repetitive docs (few distinct, common terms) score higher than
    # the one with rare terms only — doc 6 has 4 hapaxes
    scores = {
        r["doc_id"]: r["avg_loglik"]
        for r in unigram_loglik(spark, astore).collect()
    }
    assert scores[6] == min(scores.values())


def test_rare_terms(spark, astore, astore_multiseg):
    from inverted_index_spark.operators.aggregations import rare_terms

    df_count = Counter(t for d, _ in DOCS for t in set(_toks(d)))
    for store in (astore, astore_multiseg):
        # whole-corpus long tail at two thresholds
        for mdc in (1, 2):
            want = sorted(
                [(t, n) for t, n in df_count.items() if n <= mdc],
                key=lambda x: (x[1], x[0]),
            )
            got = [
                (r["term"], r["doc_count"])
                for r in rare_terms(spark, store, max_doc_count=mdc).collect()
            ]
            assert got == want, (store, mdc)
    # scoped to a query's match set: counts are WITHIN matched docs
    match_ids = {d for d, _ in DOCS if "merge" in _toks(d)}
    fg = Counter(
        t for d in match_ids for t in set(_toks(d))
    )
    want = sorted(
        [(t, n) for t, n in fg.items() if n <= 1], key=lambda x: (x[1], x[0])
    )
    got = [
        (r["term"], r["doc_count"])
        for r in rare_terms(spark, astore, "merge", max_doc_count=1).collect()
    ]
    assert got == want
    # bucket cap + bad args
    assert rare_terms(spark, astore, max_doc_count=99, max_buckets=3).count() == 3
    import pytest as _pt

    with _pt.raises(ValueError, match="max_doc_count"):
        rare_terms(spark, astore, max_doc_count=0)


def test_multi_terms(spark, astore):
    from inverted_index_spark.operators.aggregations import multi_terms

    docs = spark.createDataFrame(
        [
            (d, ["en", "de", "fr"][d % 3], ["web", "book"][d % 2])
            for d, _ in DOCS
        ],
        "doc_id long, lang string, source string",
    )
    match_ids = {d for d, _ in DOCS if "merge" in _toks(d)}
    buckets = Counter(
        (["en", "de", "fr"][d % 3], ["web", "book"][d % 2]) for d in match_ids
    )
    want = sorted(
        [(l, s, n) for (l, s), n in buckets.items()],
        key=lambda x: (-x[2], x[0], x[1]),
    )[:10]
    got = [
        (r["lang"], r["source"], r["doc_count"])
        for r in multi_terms(
            spark, astore, "merge", docs, ["lang", "source"]
        ).collect()
    ]
    assert got == want
    # single-column degenerates to a facet; empty cols rejected
    one = multi_terms(spark, astore, "merge", docs, ["lang"], k=2)
    assert one.columns == ["lang", "doc_count"]
    import pytest as _pt

    with _pt.raises(ValueError, match="key column"):
        multi_terms(spark, astore, "merge", docs, [])


def test_adjacency_matrix(spark, astore, astore_multiseg):
    from inverted_index_spark.operators.aggregations import adjacency_matrix

    sets = {
        "s": {d for d, _ in DOCS if "spark" in _toks(d)},
        "m": {d for d, _ in DOCS if "merge" in _toks(d)},
        "r": {d for d, _ in DOCS if "river" in _toks(d)},
    }
    want = {}
    names = sorted(sets)
    for i, a in enumerate(names):
        if sets[a]:
            want[a] = len(sets[a])
        for b in names[i + 1:]:
            n = len(sets[a] & sets[b])
            if n:
                want[f"{a}&{b}"] = n
    for store in (astore, astore_multiseg):
        got = {
            r["key"]: r["doc_count"]
            for r in adjacency_matrix(
                spark, store, {"s": "spark", "m": "merge", "r": "river"}
            ).collect()
        }
        assert got == want
    # boolean-query filters compose; bad args rejected
    got = {
        r["key"]: r["doc_count"]
        for r in adjacency_matrix(
            spark, astore, {"sm": "spark AND merge", "r": "river"}
        ).collect()
    }
    both = sets["s"] & sets["m"]
    expect = {"r": len(sets["r"]), "sm": len(both)}
    inter = len(both & sets["r"])
    if inter:
        expect["r&sm"] = inter
    assert got == expect
    import pytest as _pt

    with _pt.raises(ValueError, match="named filter"):
        adjacency_matrix(spark, astore, {})
    with _pt.raises(ValueError, match="'&'"):
        adjacency_matrix(spark, astore, {"a&b": "spark"})


def test_top_hits(spark, astore, astore_multiseg):
    """Bucket selection by match count, per-bucket BM25 ranking, and
    the size cap — checked against a python recomputation that uses
    the engine's own (separately parity-tested) bm25_scores."""
    from inverted_index_spark.operators.aggregations import top_hits
    from inverted_index_spark.operators.bm25 import bm25_scores

    docs = spark.createDataFrame(
        [(d, ["en", "de", "fr"][d % 3]) for d, _ in DOCS],
        "doc_id long, lang string",
    )
    match_ids = sorted(
        d for d, _ in DOCS if {"spark", "merge"} & set(_toks(d))
    )
    for store in (astore, astore_multiseg):
        score = {
            r["doc_id"]: r["score"]
            for r in bm25_scores(
                spark, store, ["spark", "merge"]
            ).collect()
        }
        rows = []
        for d in match_ids:
            rows.append((["en", "de", "fr"][d % 3], d, score.get(d, 0.0)))
        from collections import Counter as _C

        n_per = _C(lang for lang, _, _ in rows)
        keep_buckets = sorted(n_per, key=lambda x: (-n_per[x], x))[:2]
        want = []
        for b in sorted(keep_buckets, key=lambda x: (-n_per[x], x)):
            hits = sorted(
                [(d, s) for lang, d, s in rows if lang == b],
                key=lambda x: (-x[1], x[0]),
            )[:2]
            for rank, (d, s) in enumerate(hits, 1):
                want.append((b, n_per[b], rank, d, round(s, 6)))
        got = [
            (r["lang"], r["n_docs"], r["rank"], r["doc_id"],
             round(r["score"], 6))
            for r in top_hits(
                spark, store, "spark OR merge", docs, "lang",
                n_buckets=2, size=2,
            ).collect()
        ]
        assert got == want
    # pure-filter query (Prefix leaf, no scoring terms): scores are
    # 0.0, ranking falls back to doc_id within each bucket
    pref_ids = sorted(
        d for d, _ in DOCS if any(t.startswith("s") for t in _toks(d))
    )
    langs = {d: ["en", "de", "fr"][d % 3] for d in pref_ids}
    from collections import Counter as _C2

    n_per2 = _C2(langs.values())
    top_b = sorted(n_per2, key=lambda x: (-n_per2[x], x))[0]
    want2 = [
        (top_b, n_per2[top_b], rank, d, 0.0)
        for rank, d in enumerate(
            sorted(d for d in pref_ids if langs[d] == top_b), 1
        )
    ][:3]
    got = [
        (r["lang"], r["n_docs"], r["rank"], r["doc_id"], r["score"])
        for r in top_hits(
            spark, astore, "s*", docs, "lang", n_buckets=1, size=3
        ).collect()
    ]
    assert got == want2


def test_facet_histogram(spark, astore):
    """ES histogram agg: floor(v/interval)*interval buckets over the
    match set, empty buckets absent."""
    import math as _m

    import pytest as _pt

    from inverted_index_spark.operators.boolean import facet_histogram

    docs = spark.createDataFrame(
        [(d, float(len(t))) for d, t in DOCS],
        "doc_id long, n_chars double",
    )
    match_ids = {d for d, _ in DOCS if "merge" in _toks(d)}
    want = Counter(
        _m.floor(float(len(dict(DOCS)[d])) / 7.0) * 7.0 for d in match_ids
    )
    got = {
        r["bucket"]: r["n_docs"]
        for r in facet_histogram(
            spark, astore, "merge", docs, "n_chars", 7.0
        ).collect()
    }
    assert got == dict(want)
    with _pt.raises(ValueError, match="interval"):
        facet_histogram(spark, astore, "merge", docs, "n_chars", 0)
