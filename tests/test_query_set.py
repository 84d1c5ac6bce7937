"""Full reference-query-set rank parity (FIXTURES.md §C): 100 seeded
queries over a 2k-turn corpus — engine (batched WAND) vs the
pure-pandas oracle. Doc-id sequences must match exactly, scores to
1e-9; 'or'-mode queries must match the R10 sorted-unique semantics."""

from __future__ import annotations

import pytest

from inverted_index_spark.operators.build import build_index
from inverted_index_spark.operators.search import Searcher
from inverted_index_spark.oracle import OracleIndex
from inverted_index_spark.sources.queriesgen import generate_query_set
from inverted_index_spark.sources.store import SegmentStore
from inverted_index_spark.sources.transcripts import generate_transcripts


@pytest.fixture(scope="module")
def setup(spark, tmp_path_factory):
    store = SegmentStore(str(tmp_path_factory.mktemp("qset") / "idx"))
    docs = generate_transcripts(spark, 2000, include_doc_id=True).cache()
    build_index(spark, docs, store, bucket_size=256, block_size=64)
    pdf = docs.select("doc_id", "text").toPandas()
    oracle = OracleIndex.from_docs(pdf)
    dfs = {t: len(p) for t, p in oracle.postings.items() if p}
    queries = generate_query_set(dfs, oracle.n_docs)
    return Searcher(spark, store).open(), oracle, queries


def test_full_query_set_parity(setup):
    searcher, oracle, queries = setup
    bm25_qs = {q.query_id: q.terms for q in queries if q.mode == "bm25_topk"}
    # all BM25 queries in ONE job
    rows = searcher.topk_batch(bm25_qs, k=10).collect()
    got: dict[str, list] = {qid: [] for qid in bm25_qs}
    for r in sorted(rows, key=lambda r: (r["qid"], r["rank"])):
        got[r["qid"]].append((r["doc_id"], r["score"]))
    n_nonempty = 0
    for qid, terms in bm25_qs.items():
        expect = oracle.bm25_topk(terms, k=10)
        assert [d for d, _ in got[qid]] == [d for d, _ in expect], f"{qid} {terms}"
        for (gd, gs), (_, es) in zip(got[qid], expect):
            assert abs(gs - es) < 1e-9, f"{qid} doc {gd}: {gs} vs {es}"
        n_nonempty += bool(expect)
    assert n_nonempty >= 70  # the set is mostly non-trivial

    or_qs = [q for q in queries if q.mode == "or"]
    assert len(or_qs) == 10
    for q in or_qs:
        got_vals = [
            r["doc_id"]
            for r in searcher.read_values(q.terms, q.min_doc, q.max_doc).collect()
        ]
        assert got_vals == oracle.read_values(q.terms, q.min_doc, q.max_doc), q.query_id


def test_parity_at_20k_fragment_build(spark, tmp_path):
    """Rank parity holds at 10× the corpus AND through the shuffle-free
    fragment build + one compaction — the round-2 ingest shape under
    the same 1e-9 score contract."""
    from inverted_index_spark.operators.merge import merge_segments

    store = SegmentStore(str(tmp_path / "idx20k"))
    docs = generate_transcripts(spark, 20_000, include_doc_id=True).cache()
    build_index(spark, docs, store, bucket_size=1024, shuffle=False)
    merge_segments(spark, store, min_files=1, max_files=4)
    store.cleanup()
    pdf = docs.select("doc_id", "text").toPandas()
    oracle = OracleIndex.from_docs(pdf)
    dfs = {t: len(p) for t, p in oracle.postings.items() if p}
    queries = [q for q in generate_query_set(dfs, oracle.n_docs)
               if q.mode == "bm25_topk"][:20]
    searcher = Searcher(spark, store).open()
    rows = searcher.topk_batch({q.query_id: q.terms for q in queries}, k=10).collect()
    got: dict[str, list] = {q.query_id: [] for q in queries}
    for r in sorted(rows, key=lambda r: (r["qid"], r["rank"])):
        got[r["qid"]].append((r["doc_id"], r["score"]))
    for q in queries:
        expect = oracle.bm25_topk(q.terms, k=10)
        assert [d for d, _ in got[q.query_id]] == [d for d, _ in expect], q.terms
        for (gd, gs), (_, es) in zip(got[q.query_id], expect):
            assert abs(gs - es) < 1e-9
