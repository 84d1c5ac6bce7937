"""Generation-scoped deletes + atomic reindex (upsert) — round-5
extension over the insert-only reference (multiple/multiple_index.go
only ever adds and merges files; Lucene updateDocument and Iceberg
equality-delete sequence numbers are the model).

Contract under test:
  - a delete batch tombstones only segments committed strictly BEFORE
    it (generation scoping), so a doc re-added in a LATER segment is
    visible again with its new content
  - reindex_docs = staged delete batch + new segment committed in ONE
    manifest transaction at the SAME generation: readers see the old
    corpus or the new one, never a mix and never a missing doc
  - every surface (read_values/BM25 module + Searcher kernels/phrases/
    text hydration) equals a FRESH BUILD over the updated corpus
  - compaction physically purges superseded copies with the same
    scoping and retires fully-absorbed batches
  - a failed reindex leaves the store untouched (staged parquet
    dropped, no manifest row)
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from inverted_index_spark.operators.bm25 import bm25_scores
from inverted_index_spark.operators.build import (
    ErrEmptyIndex,
    build_index,
    reindex_docs,
)
from inverted_index_spark.operators.merge import merge_until_one
from inverted_index_spark.operators.query import read_terms, read_values
from inverted_index_spark.operators.search import Searcher
from inverted_index_spark.sources.store import DELETES, LIVE, MERGED, SegmentStore
from inverted_index_spark.sources.transcripts import generate_transcripts


def _vals(df):
    return [r["doc_id"] for r in df.collect()]


def _updated(docs, victims):
    """The victims' replacement rows: same doc_id, new text (a marker
    term plus one shared original term so old/new term sets differ)."""
    return docs.where(F.col("doc_id").isin(victims)).select(
        "doc_id",
        F.concat(F.lit("zzupdated w00001 doc"), F.col("doc_id").cast("string")).alias(
            "text"
        ),
    )


def _fresh_twin(spark, root, docs, victims, **kw):
    """Fresh build over the post-reindex corpus: originals minus
    victims, plus the victims' new rows."""
    twin = SegmentStore(str(root))
    corpus = docs.select("doc_id", "text").where(
        ~F.col("doc_id").isin(victims)
    ).unionByName(_updated(docs, victims))
    build_index(spark, corpus, twin, bucket_size=64, block_size=16, **kw)
    return twin


def test_delete_then_readd_visible(spark, tmp_path):
    """The primitive under reindex: a doc deleted by a batch and
    re-added in a LATER segment is visible again (the batch only
    scopes over earlier segments)."""
    store = SegmentStore(str(tmp_path / "idx"))
    docs = generate_transcripts(spark, 150, include_doc_id=True)
    build_index(spark, docs, store, bucket_size=64, block_size=16)
    base = set(_vals(read_values(spark, store, ["w00000"])))
    victim = sorted(base)[0]
    store.delete_docs(spark, [victim])
    assert victim not in set(_vals(read_values(spark, store, ["w00000"])))
    # re-add with new content in a NEW segment (postdates the batch)
    readd = spark.createDataFrame(
        [(victim, "w00000 zzreborn")], "doc_id long, text string"
    )
    build_index(spark, readd, store, bucket_size=64, block_size=16)
    assert victim in set(_vals(read_values(spark, store, ["w00000"])))
    assert _vals(read_values(spark, store, ["zzreborn"])) == [victim]
    # the doc exists ONCE with its new stats: dl == 2, not the old dl
    dl = store.read_docstats(spark).where(F.col("doc_id") == victim).collect()
    assert len(dl) == 1 and dl[0]["dl"] == 2


def test_reindex_equals_fresh_build(spark, tmp_path):
    """reindex_docs must be indistinguishable from a fresh build over
    the updated corpus on EVERY read surface — reads, module BM25, all
    Searcher kernels, and text hydration."""
    store = SegmentStore(str(tmp_path / "idx"))
    docs = generate_transcripts(spark, 200, include_doc_id=True)
    build_index(
        spark, docs, store, bucket_size=64, block_size=16, store_text=True
    )
    victims = [3, 17, 40, 77, 120]
    sid = reindex_docs(
        spark, _updated(docs, victims), store, store_text=True
    )
    assert sid is not None and store.has_deletes()
    twin = _fresh_twin(spark, tmp_path / "twin", docs, victims, store_text=True)

    assert _vals(read_values(spark, store, ["zzupdated"]).orderBy("doc_id")) == victims
    for terms in (["w00000"], ["w00001"], ["zzupdated", "w00002"]):
        assert _vals(read_values(spark, store, terms)) == _vals(
            read_values(spark, twin, terms)
        )
    # the dictionary may still list terms whose last posting lived in
    # a superseded copy (Lucene-like: dropped at compaction, contract
    # documented in test_deletes) — so superset pre-compaction, not
    # equality (test_reindex_then_compact_purges covers the rest)
    assert set(r["term"] for r in read_terms(spark, store).collect()) >= set(
        r["term"] for r in read_terms(spark, twin).collect()
    )

    q = ["w00001", "zzupdated", "w00003"]
    got = [
        (r["doc_id"], round(r["score"], 9))
        for r in bm25_scores(spark, store, q).orderBy("doc_id").collect()
    ]
    want = [
        (r["doc_id"], round(r["score"], 9))
        for r in bm25_scores(spark, twin, q).orderBy("doc_id").collect()
    ]
    assert got == want and len(got) > 0

    s = Searcher(spark, store).open()
    t = Searcher(spark, twin).open()
    try:
        for use_wand in (False, True):
            a = [
                (r["doc_id"], round(r["score"], 9))
                for r in s.topk(q, 10, use_wand=use_wand).collect()
            ]
            b = [
                (r["doc_id"], round(r["score"], 9))
                for r in t.topk(q, 10, use_wand=use_wand).collect()
            ]
            assert a == b and len(a) == 10, f"use_wand={use_wand}"
        # hydration returns the NEW text
        txt = {
            r["doc_id"]: r["text"]
            for r in store.read_docs(spark)
            .where(F.col("doc_id").isin(victims))
            .collect()
        }
        assert set(txt) == set(victims)
        assert all(v.startswith("zzupdated") for v in txt.values())
    finally:
        s.close()
        t.close()


def test_reindex_phrases_scoped(spark, tmp_path):
    """Positions of the superseded copies must not leak into phrase /
    proximity kernels — stale occurrences would manufacture phantom
    matches."""
    from inverted_index_spark.operators.positions import (
        phrase_match,
        terms_within_window,
    )

    store = SegmentStore(str(tmp_path / "idx"))
    docs = generate_transcripts(spark, 150, include_doc_id=True)
    build_index(spark, docs, store, bucket_size=64, block_size=16, positions=True)
    # every doc matching the w00000-w00001 cooccurrence window
    base_phrase = set(_vals(phrase_match(spark, store, ["w00000"])))
    victims = sorted(base_phrase)[:2]
    reindex_docs(spark, _updated(docs, victims), store, positions=True)
    twin = _fresh_twin(
        spark, tmp_path / "twin", docs, victims, positions=True
    )
    got = sorted(_vals(phrase_match(spark, store, ["zzupdated", "w00001"])))
    want = sorted(_vals(phrase_match(spark, twin, ["zzupdated", "w00001"])))
    assert got == want == victims
    # old single-term "phrase" excludes the superseded copies' positions
    assert sorted(_vals(phrase_match(spark, store, ["w00000"]))) == sorted(
        _vals(phrase_match(spark, twin, ["w00000"]))
    )
    assert sorted(
        _vals(terms_within_window(spark, store, ["zzupdated", "doc" + str(victims[0])], 4))
    ) == sorted(
        _vals(terms_within_window(spark, twin, ["zzupdated", "doc" + str(victims[0])], 4))
    )


def test_reindex_then_compact_purges(spark, tmp_path):
    """Compaction after a reindex physically drops the superseded
    copies (scoped purge), retires the absorbed batch, and changes NO
    answer."""
    store = SegmentStore(str(tmp_path / "idx"))
    docs = generate_transcripts(spark, 150, include_doc_id=True)
    build_index(spark, docs, store, bucket_size=64, block_size=16)
    victims = [5, 6, 50]
    reindex_docs(spark, _updated(docs, victims), store)
    before = {
        t: _vals(read_values(spark, store, [t]))
        for t in ("w00000", "w00001", "zzupdated")
    }
    merge_until_one(spark, store)
    m = store.read_manifest()
    assert not store.has_deletes()
    assert (m["status"] == LIVE).sum() == 1
    assert set(m.loc[m["status"] == MERGED, "segment_id"]) >= set(
        m.loc[m["n_docs"] > 0, "segment_id"]
    ) - set(m.loc[m["status"] == LIVE, "segment_id"])
    after = {
        t: _vals(read_values(spark, store, [t]))
        for t in ("w00000", "w00001", "zzupdated")
    }
    assert before == after
    # post-compaction the dictionary equals a fresh build's exactly
    # (terms whose last posting lived in a superseded copy are gone)
    twin = _fresh_twin(spark, tmp_path / "twin", docs, victims)
    assert [r["term"] for r in read_terms(spark, store).collect()] == [
        r["term"] for r in read_terms(spark, twin).collect()
    ]
    # physically gone: the compacted segment's RAW docstats parquet
    # (no dedup, no delete filter) holds exactly one row per victim,
    # carrying the NEW dl (3 tokens: "zzupdated w00001 docN")
    import os

    live_id = m.loc[m["status"] == LIVE, "segment_id"].iloc[0]
    raw = spark.read.parquet(
        os.path.join(store.seg_dir(live_id), "docstats")
    ).where(F.col("doc_id").isin(victims))
    rows = raw.collect()
    assert len(rows) == len(victims)
    assert all(r["dl"] == 3 for r in rows)


def test_reindex_failure_leaves_store_untouched(spark, tmp_path):
    store = SegmentStore(str(tmp_path / "idx"))
    docs = generate_transcripts(spark, 100, include_doc_id=True)
    build_index(spark, docs, store, bucket_size=64, block_size=16)
    gen0 = store.read_manifest().copy()
    empty = spark.createDataFrame([], "doc_id long, text string")
    with pytest.raises(ErrEmptyIndex):
        reindex_docs(spark, empty, store)
    m = store.read_manifest()
    assert len(m) == len(gen0) and not store.has_deletes()
    # only-whitespace text → tokens empty → same failure, same rollback
    blank = spark.createDataFrame([(0, "   ")], "doc_id long, text string")
    with pytest.raises(ErrEmptyIndex):
        reindex_docs(spark, blank, store)
    assert len(store.read_manifest()) == len(gen0)


@pytest.fixture(params=["parquet", "iceberg_mock"])
def any_store(tmp_path, request):
    if request.param == "iceberg_mock":
        from tests.iceberg_mock import make_mock_iceberg_store

        return make_mock_iceberg_store(str(tmp_path / "idx"))
    return SegmentStore(str(tmp_path / "idx"))


def test_reindex_lifecycle_both_backends(spark, any_store):
    """The atomic-commit + scoping contract holds on BOTH manifest
    backends (parquet gen-file CAS and the Iceberg adapter): one
    transaction commits batch + segment, the batch postdates every
    prior segment but not its pair, and compaction retires it."""
    store = any_store
    docs = generate_transcripts(spark, 120, include_doc_id=True)
    build_index(spark, docs, store, bucket_size=64, block_size=16)
    victims = [2, 9]
    reindex_docs(spark, _updated(docs, victims), store)
    m = store.read_manifest()
    segs = m[(m["status"] == LIVE) & (m["n_terms"] > 0)]
    batch = m[m["status"] == DELETES]
    assert len(batch) == 1
    bgen = int(batch["generation_added"].iloc[0])
    gens = sorted(int(g) for g in segs["generation_added"])
    # batch postdates the first segment, does NOT postdate its pair
    assert gens[0] < bgen and bgen <= gens[-1]
    assert _vals(
        read_values(spark, store, ["zzupdated"]).orderBy("doc_id")
    ) == victims
    assert set(victims).issubset(
        set(_vals(read_values(spark, store, ["w00001"])))
    )
    merge_until_one(spark, store)
    assert not store.has_deletes()
    assert _vals(
        read_values(spark, store, ["zzupdated"]).orderBy("doc_id")
    ) == victims
