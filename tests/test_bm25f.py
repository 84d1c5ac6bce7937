"""BM25F parity vs a brute-force pandas oracle of the pinned contract
(field-weighted tf first, one k1 saturation, any-field df)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from inverted_index_spark.operators.bm25f import (
    bm25f_scores,
    bm25f_topk,
    build_text_field_indexes,
)

DOCS = [
    (0, "spark merge window", "spark shuffle partition merge merge"),
    (1, "index build", "spark index query window merge"),
    (2, "window window", "group window hash table"),
    (3, "merge", "spark spark spark merge window index"),
    (4, "hash join", "broadcast hash join shuffle"),
    (5, "spark", ""),
]
FIELDS = {"title": "title", "body": "body"}
W = {"title": 2.5, "body": 1.0}
B = {"title": 0.4, "body": 0.75}


def _oracle(terms, w, b, k1=1.2):
    """Pure-python BM25F over DOCS."""
    toks = {
        d: {"title": t.split(), "body": bo.split()} for d, t, bo in DOCS
    }
    # avgdl over ALL docs of the field, zero-length included (pinned:
    # build_index records dl=0 for a doc whose field tokenizes empty)
    avgdl = {
        f: sum(len(toks[d][f]) for d in toks) / len(toks)
        for f in ("title", "body")
    }
    n = len(toks)
    scores = {}
    for t in sorted(set(terms)):
        tfn = {}
        for d in toks:
            s = 0.0
            for f in ("title", "body"):
                tf = toks[d][f].count(t)
                if tf:
                    dl = len(toks[d][f])
                    s += w[f] * tf / (1 - b[f] + b[f] * dl / avgdl[f])
            if s > 0:
                tfn[d] = s
        df = len(tfn)
        if not df:
            continue
        idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
        for d, s in tfn.items():
            scores[d] = scores.get(d, 0.0) + idf * s / (s + k1)
    return scores


@pytest.fixture(scope="module")
def stores(spark, tmp_path_factory):
    docs = spark.createDataFrame(DOCS, "doc_id long, title string, body string")
    # empty-text docs (doc 5's body) produce no tokens → absent from
    # that field's store, exactly the "doc not present in field" case
    return build_text_field_indexes(
        spark, docs, str(tmp_path_factory.mktemp("bm25f")), FIELDS,
        bucket_size=4, block_size=4,
    )


@pytest.mark.parametrize(
    "terms",
    [["spark"], ["spark", "merge"], ["window", "hash"], ["nosuchterm"],
     ["spark", "merge", "window", "index"]],
)
def test_bm25f_matches_oracle(spark, stores, terms):
    got = {
        r["doc_id"]: round(r["score"], 9)
        for r in bm25f_scores(spark, stores, terms, weights=W, b=B).collect()
    }
    want = {d: round(s, 9) for d, s in _oracle(terms, W, B).items()}
    assert got == want


def test_bm25f_field_weight_boosts(spark, stores):
    """docs 0 and 3 both contain 'merge'; title weight makes the
    title-heavy occurrence pattern decisive, and flattening the
    weights changes the ranking — the knob demonstrably matters."""
    boosted = [r["doc_id"] for r in bm25f_topk(
        spark, stores, ["merge"], k=6, weights={"title": 50.0, "body": 0.01}
    ).collect()]
    flat = [r["doc_id"] for r in bm25f_topk(
        spark, stores, ["merge"], k=6, weights={"title": 0.01, "body": 50.0}
    ).collect()]
    # title-only ranking puts the pure-title docs first; body-heavy
    # ranking leads with doc 0 (tf=2 'merge'... body has merge x2)
    oracle_boost = _oracle(["merge"], {"title": 50.0, "body": 0.01}, B)
    oracle_flat = _oracle(["merge"], {"title": 0.01, "body": 50.0}, B)
    assert boosted == sorted(oracle_boost, key=lambda d: (-oracle_boost[d], d))
    assert flat == sorted(oracle_flat, key=lambda d: (-oracle_flat[d], d))
    assert boosted != flat


def test_bm25f_topk_ties_and_k(spark, stores):
    rows = bm25f_topk(spark, stores, ["spark"], k=3, weights=W, b=B).collect()
    assert len(rows) == 3
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_bm25f_delete_aware(spark, tmp_path):
    """postings_df carries the delete filter → deleting a doc from one
    field store removes that FIELD's contribution; a doc matching only
    through the deleted field drops out entirely. (Own stores — the
    delete would leak into the module fixture.)"""
    docs = spark.createDataFrame(DOCS, "doc_id long, title string, body string")
    stores = build_text_field_indexes(
        spark, docs, str(tmp_path / "f"), FIELDS, bucket_size=4, block_size=4
    )
    before = {
        r["doc_id"]: r["score"]
        for r in bm25f_scores(spark, stores, ["hash"]).collect()
    }
    assert set(before) == {2, 4}  # 2: body-only; 4: title AND body
    stores["body"].delete_docs(spark, [2, 4])
    after = {
        r["doc_id"]: r["score"]
        for r in bm25f_scores(spark, stores, ["hash"]).collect()
    }
    # doc 2 matched only through body → gone; doc 4 keeps its title
    # contribution → still present (score shifts: df 2→1 raises idf
    # while the lost field lowers tf~ — direction is corpus-dependent,
    # membership is the contract)
    assert set(after) == {4}
    assert after[4] != before[4]


def _dismax_oracle(terms, tie, boosts=None):
    """Pure-python dis_max: per-field independent BM25 (field-local N,
    avgdl, df), then max + tie * (sum - max)."""
    boosts = boosts or {}
    toks = {
        d: {"title": t.split(), "body": bo.split()} for d, t, bo in DOCS
    }
    per_field: dict[str, dict[int, float]] = {}
    for f in ("title", "body"):
        # field-local corpus: docs whose field produced tokens are in
        # the field store; dl=0 docs are STILL in its doc stats
        docs_f = {d: toks[d][f] for d in toks}
        n = len(docs_f)
        avgdl = sum(len(v) for v in docs_f.values()) / n
        sc: dict[int, float] = {}
        for t in sorted(set(terms)):
            df = sum(1 for v in docs_f.values() if t in v)
            if not df:
                continue
            idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
            for d, v in docs_f.items():
                tf = v.count(t)
                if tf:
                    c = idf * tf / (tf + 1.2 * (1 - 0.75 + 0.75 * len(v) / avgdl))
                    sc[d] = sc.get(d, 0.0) + c
        w = boosts.get(f, 1.0)
        per_field[f] = {d: s * w for d, s in sc.items()}
    out: dict[int, float] = {}
    for d in set(per_field["title"]) | set(per_field["body"]):
        vals = [pf[d] for pf in per_field.values() if d in pf]
        mx, sm = max(vals), sum(vals)
        out[d] = mx + tie * (sm - mx)
    return out


@pytest.mark.parametrize("tie", [0.0, 0.3, 1.0])
def test_dismax_vs_oracle(spark, stores, tie):
    from inverted_index_spark.operators.bm25f import dismax_scores

    got = {
        r["doc_id"]: r["score"]
        for r in dismax_scores(
            spark, stores, ["spark", "window"], tie_breaker=tie
        ).collect()
    }
    want = _dismax_oracle(["spark", "window"], tie)
    assert set(got) == set(want)
    for d in want:
        assert abs(got[d] - want[d]) < 1e-9, (d, got[d], want[d])


def test_dismax_field_boosts_and_topk(spark, stores):
    from inverted_index_spark.operators.bm25f import dismax_topk

    boosts = {"title": 3.0}
    got = [
        (r["doc_id"], r["score"])
        for r in dismax_topk(
            spark, stores, ["merge"], k=3, tie_breaker=0.2, boosts=boosts
        ).collect()
    ]
    want = sorted(
        _dismax_oracle(["merge"], 0.2, boosts).items(),
        key=lambda kv: (-kv[1], kv[0]),
    )[:3]
    assert [d for d, _ in got] == [d for d, _ in want]
    for (_, a), (_, b) in zip(got, want):
        assert abs(a - b) < 1e-9
    # tie_breaker=1.0 degrades to the plain per-field sum
    from inverted_index_spark.operators.bm25f import dismax_scores

    s1 = {
        r["doc_id"]: r["score"]
        for r in dismax_scores(spark, stores, ["merge"], 1.0).collect()
    }
    w1 = _dismax_oracle(["merge"], 1.0)
    for d in w1:
        assert abs(s1[d] - w1[d]) < 1e-9


def test_bm25f_multiseg_overlap_dedup(spark, tmp_path, stores):
    """Doc rows replayed across two live segments of a field store
    (pre-compaction overlap) must not double the field's weighted tf —
    scores equal the single-segment stores' exactly."""
    from inverted_index_spark.operators.build import build_index
    from inverted_index_spark.sources.store import SegmentStore

    docs = spark.createDataFrame(DOCS, "doc_id long, title string, body string")
    dup = {}
    for name, col in FIELDS.items():
        store = SegmentStore(str(tmp_path / f"field={name}"))
        d = docs.select("doc_id", F.col(col).cast("string").alias("text"))
        build_index(spark, d, store, bucket_size=4, block_size=4)
        # re-index docs 0-2 verbatim -> second live segment, same rows
        build_index(spark, d.where("doc_id <= 2"), store,
                    bucket_size=4, block_size=4)
        assert len(store.live_segments()) == 2
        dup[name] = store

    terms = ["spark", "window", "merge"]
    want = {
        r["doc_id"]: r["score"]
        for r in bm25f_scores(spark, stores, terms, W, B).collect()
    }
    got = {
        r["doc_id"]: r["score"]
        for r in bm25f_scores(spark, dup, terms, W, B).collect()
    }
    assert got.keys() == want.keys()
    for d in want:
        assert abs(got[d] - want[d]) < 1e-9, d
