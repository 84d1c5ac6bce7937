"""Ranking evaluation (ES _rank_eval) vs a brute-force metric oracle
computed from the engine's own collected rankings."""

from __future__ import annotations

import math

import pytest

from inverted_index_spark.operators.build import build_index
from inverted_index_spark.operators.rank_eval import rank_eval
from inverted_index_spark.operators.search import Searcher
from inverted_index_spark.sources.store import SegmentStore
from inverted_index_spark.sources.transcripts import generate_transcripts

K = 5
QUERIES = {
    "q1": ["w00000", "w00001"],
    "q2": ["w00002"],
    "q3": ["doesnotexist"],
    "q4": ["w00003", "w00004"],
}


@pytest.fixture(scope="module")
def searcher(spark, tmp_path_factory):
    store = SegmentStore(str(tmp_path_factory.mktemp("rankeval") / "idx"))
    docs = generate_transcripts(spark, 600, include_doc_id=True)
    build_index(spark, docs, store, bucket_size=128, block_size=16)
    s = Searcher(spark, store).open()
    yield s
    s.close()


def _judgments(searcher):
    """Grade a mix of actually-retrieved and never-retrieved docs so
    every metric branch is exercised."""
    ranked = searcher.topk_batch(QUERIES, k=K).collect()
    by_q = {}
    for r in ranked:
        by_q.setdefault(r["qid"], []).append(r["doc_id"])
    j = {
        # q1: top hit highly relevant, one mid-rank, one outside top-k
        "q1": {by_q["q1"][0]: 3.0, by_q["q1"][2]: 1.0, 999999: 2.0},
        # q2: only irrelevant grades -> every metric 0, n_rel 0
        "q2": {by_q["q2"][0]: 0.0},
        # q3: no results at all, but relevant docs exist -> recall 0
        "q3": {5: 1.0},
        # q4: relevance inverted vs retrieval order
        "q4": {by_q["q4"][-1]: 2.0, by_q["q4"][0]: 1.0},
    }
    return j, by_q


def _oracle(by_q, judgments):
    out = {}
    for qid in QUERIES:
        ranks = by_q.get(qid, [])
        j = judgments.get(qid, {})
        rel = {d for d, g in j.items() if g > 0}
        hits = sum(1 for d in ranks if d in rel)
        mrr = 0.0
        for i, d in enumerate(ranks, 1):
            if d in rel:
                mrr = 1.0 / i
                break
        dcg = sum(
            (2.0 ** j.get(d, 0.0) - 1) / math.log2(i + 1)
            for i, d in enumerate(ranks, 1)
        )
        ideal = sorted(
            ((g, d) for d, g in j.items() if g > 0),
            key=lambda t: (-t[0], t[1]),
        )[:K]
        idcg = sum(
            (2.0 ** g - 1) / math.log2(i + 1)
            for i, (g, _) in enumerate(ideal, 1)
        )
        out[qid] = {
            "precision_k": hits / K,
            "recall_k": hits / len(rel) if rel else 0.0,
            "mrr": mrr,
            "ndcg_k": dcg / idcg if idcg > 0 else 0.0,
            "n_rel": len(rel),
        }
    return out


def test_rank_eval_vs_bruteforce(spark, searcher):
    judgments, by_q = _judgments(searcher)
    got = {r["qid"]: r.asDict() for r in rank_eval(searcher, QUERIES, judgments, k=K).collect()}
    want = _oracle(by_q, judgments)
    assert set(got) == set(QUERIES)
    for qid, w in want.items():
        g = got[qid]
        for m in ("precision_k", "recall_k", "mrr", "ndcg_k"):
            assert g[m] == pytest.approx(w[m], abs=1e-9), (qid, m, g[m], w[m])
        assert g["n_rel"] == w["n_rel"]
    # sanity on the designed branches
    assert got["q1"]["mrr"] == 1.0
    assert got["q2"]["ndcg_k"] == 0.0 and got["q2"]["n_rel"] == 0
    assert got["q3"]["recall_k"] == 0.0 and got["q3"]["n_rel"] == 1
    assert 0.0 < got["q4"]["ndcg_k"] < 1.0  # inverted order: imperfect


def test_rank_eval_perfect_ranking(spark, searcher):
    """Grading exactly the top-k in retrieval order -> every metric
    perfect (precision k/k only if all k graded)."""
    ranked = searcher.topk_batch({"q1": QUERIES["q1"]}, k=K).collect()
    docs = [r["doc_id"] for r in ranked]
    grades = {d: float(len(docs) - i) for i, d in enumerate(docs)}
    got = rank_eval(searcher, {"q1": QUERIES["q1"]}, {"q1": grades}, k=K).collect()[0]
    assert got["precision_k"] == 1.0
    assert got["recall_k"] == 1.0
    assert got["mrr"] == 1.0
    assert got["ndcg_k"] == pytest.approx(1.0, abs=1e-12)


def test_rank_eval_empty_judgments(spark, searcher):
    got = {r["qid"]: r for r in rank_eval(searcher, QUERIES, {}, k=K).collect()}
    assert all(
        got[q]["precision_k"] == 0.0 and got[q]["ndcg_k"] == 0.0 for q in QUERIES
    )
