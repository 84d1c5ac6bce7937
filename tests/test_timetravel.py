"""Snapshot time travel (``SegmentStore.at``) — Iceberg VERSION AS OF
over the manifest commit log the store already keeps (gen-N.parquet on
the parquet backend, the snapshot log on the Iceberg adapter).

Contract under test:
  - ``at(g)`` reads exactly the corpus that was current at generation
    ``g``: pre-delete snapshots still see tombstoned docs, pre-reindex
    snapshots see the ORIGINAL content, and the current view is
    unchanged by the existence of pins
  - a pinned store refuses every mutation (commits, staged deletes,
    cleanup, snapshot expiry) with a clear error
  - unknown / expired generations fail fast at at() or at read time
  - both manifest backends (parquet gen files, Iceberg snapshots)
    honor the same numbering: generation k = state after commit k
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from inverted_index_spark.operators.build import build_index, reindex_docs
from inverted_index_spark.operators.query import read_values
from inverted_index_spark.operators.search import Searcher
from inverted_index_spark.sources.store import SegmentStore
from inverted_index_spark.sources.transcripts import generate_transcripts


def _vals(df):
    return [r["doc_id"] for r in df.orderBy("doc_id").collect()]


def _updated(docs, victims):
    return docs.where(F.col("doc_id").isin(victims)).select(
        "doc_id",
        F.concat(F.lit("zztravel doc"), F.col("doc_id").cast("string")).alias(
            "text"
        ),
    )


@pytest.fixture(params=["parquet", "iceberg_mock"])
def any_store(tmp_path, request):
    if request.param == "iceberg_mock":
        from tests.iceberg_mock import make_mock_iceberg_store

        return make_mock_iceberg_store(str(tmp_path / "idx"))
    return SegmentStore(str(tmp_path / "idx"))


def test_time_travel_reads_old_snapshots(spark, any_store):
    store = any_store
    docs = generate_transcripts(spark, 120, include_doc_id=True).cache()
    build_index(spark, docs, store, bucket_size=64, block_size=16)
    g_build = store.current_generation()
    base = _vals(read_values(spark, store, ["w00000"]))
    assert base

    victims = base[:2]
    store.delete_docs(spark, victims)
    g_del = store.current_generation()
    assert _vals(read_values(spark, store, ["w00000"])) == base[2:]

    reindex_docs(spark, _updated(docs, [base[2]]), store)

    # current view: deletes + reindex applied
    assert _vals(read_values(spark, store, ["zztravel"])) == [base[2]]
    assert base[2] not in _vals(read_values(spark, store, ["w00000"]))

    # pre-delete snapshot: the full original corpus
    pinned = store.at(g_build)
    assert _vals(read_values(spark, pinned, ["w00000"])) == base
    assert _vals(read_values(spark, pinned, ["zztravel"])) == []

    # post-delete / pre-reindex snapshot
    mid = store.at(g_del)
    assert _vals(read_values(spark, mid, ["w00000"])) == base[2:]
    assert _vals(read_values(spark, mid, ["zztravel"])) == []

    # pinning never disturbs the live view
    assert _vals(read_values(spark, store, ["zztravel"])) == [base[2]]
    assert store.generations()[-1] == store.current_generation()


def test_time_travel_searcher(spark, tmp_path):
    """A Searcher over a pinned store scores the snapshot corpus —
    BM25 stats (N, df) equal a fresh build of that corpus."""
    store = SegmentStore(str(tmp_path / "idx"))
    docs = generate_transcripts(spark, 120, include_doc_id=True).cache()
    build_index(spark, docs, store, bucket_size=64, block_size=16)
    g1 = store.current_generation()
    victims = _vals(read_values(spark, store, ["w00000"]))[:2]
    store.delete_docs(spark, victims)

    old = Searcher(spark, store.at(g1)).open()
    twin_root = SegmentStore(str(tmp_path / "twin"))
    build_index(spark, docs, twin_root, bucket_size=64, block_size=16)
    twin = Searcher(spark, twin_root).open()
    q = ["w00000", "w00003"]
    got = [(r["doc_id"], round(r["score"], 9)) for r in old.topk(q, 10).collect()]
    want = [(r["doc_id"], round(r["score"], 9)) for r in twin.topk(q, 10).collect()]
    assert got == want
    old.close()
    twin.close()


def test_pinned_store_refuses_writes(spark, any_store):
    store = any_store
    docs = generate_transcripts(spark, 60, include_doc_id=True)
    build_index(spark, docs, store, bucket_size=64, block_size=16)
    pinned = store.at(store.current_generation())
    with pytest.raises(PermissionError):
        pinned.delete_docs(spark, [1, 2])
    with pytest.raises(PermissionError):
        build_index(spark, docs, pinned, bucket_size=64)
    with pytest.raises(PermissionError):
        pinned.cleanup()
    with pytest.raises(PermissionError):
        pinned.expire_generations(keep=1)


def test_unknown_generation_fails_fast(spark, any_store):
    store = any_store
    with pytest.raises((FileNotFoundError, ValueError)):
        store.at(1)  # nothing committed yet
    docs = generate_transcripts(spark, 60, include_doc_id=True)
    build_index(spark, docs, store, bucket_size=64, block_size=16)
    with pytest.raises(FileNotFoundError):
        store.at(store.current_generation() + 5)
    with pytest.raises(ValueError):
        store.at(0)


def test_expired_generation_raises(spark, tmp_path):
    store = SegmentStore(str(tmp_path / "idx"))
    docs = generate_transcripts(spark, 60, include_doc_id=True)
    build_index(spark, docs, store, bucket_size=64, block_size=16)
    store.delete_docs(spark, [0])
    g1 = min(store.generations())
    pinned = store.at(g1)  # resolves while the file exists
    store.expire_generations(keep=1)
    with pytest.raises(FileNotFoundError):
        store.at(g1)  # gone at resolve time
    with pytest.raises(FileNotFoundError):
        pinned.read_manifest()  # and at read time for a stale pin
