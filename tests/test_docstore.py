"""Per-segment doc store: text hydration round-trip (input_hint's
per-turn text equality surfaced at the query API) + merge carry."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from inverted_index_spark.operators.build import build_index
from inverted_index_spark.operators.merge import merge_segments
from inverted_index_spark.operators.search import Searcher
from inverted_index_spark.sources.store import SegmentStore

DOCS = [
    (0, "plain ascii text"),
    (1, "mixed бесплатно 中文 já"),
    (2, "  leading and trailing  spaces  "),
    (3, ""),
    (4, "UPPER Case PreserveD exactly"),
]


def test_fetch_text_roundtrip(spark):
    store = SegmentStore(tempfile.mkdtemp(prefix="ii_ds_") + "/idx")
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    build_index(spark, df, store, bucket_size=2, store_text=True)
    s = Searcher(spark, store).open()
    page = spark.createDataFrame([(i,) for i, _ in DOCS], "doc_id long")
    got = {r["doc_id"]: r["text"] for r in s.fetch_text(page).collect()}
    assert got == dict(DOCS)  # byte-for-byte, incl. unicode + spacing
    # the doc-store scan must be bucket-pruned for a small page, not
    # cached or scanned whole (100 TB shape)
    from inverted_index_spark.plans import pushed_filters

    docs_scan = store.read_docs(spark, buckets=[0, 1])
    pf = pushed_filters(docs_scan)
    assert "In(bucket" in pf or "bucket" in pf, pf
    s.close()


def test_docstore_survives_merge(spark):
    store = SegmentStore(tempfile.mkdtemp(prefix="ii_dsm_") + "/idx")
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    build_index(spark, df.where(F.col("doc_id") < 2), store, bucket_size=2, store_text=True)
    build_index(spark, df.where(F.col("doc_id") >= 2), store, bucket_size=2, store_text=True)
    assert merge_segments(spark, store, min_files=2) is not None
    store.cleanup()
    got = {
        r["doc_id"]: r["text"]
        for r in store.read_docs(spark).collect()
    }
    assert got == dict(DOCS)


def test_missing_docstore_raises(spark):
    store = SegmentStore(tempfile.mkdtemp(prefix="ii_dsx_") + "/idx")
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    build_index(spark, df, store, bucket_size=2)  # no store_text
    with pytest.raises(ValueError, match="doc store"):
        store.read_docs(spark)


def test_fetch_text_unpinned_bucket_size_plain_join(spark, monkeypatch):
    """Pre-versioned manifests (pinned_bucket_size() is None) must take
    the plain-join path: a guessed bucket width would compute page
    buckets matching NO stored rows and hydrate every result with null
    text (ADVICE r3)."""
    store = SegmentStore(tempfile.mkdtemp(prefix="ii_dsn_") + "/idx")
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    build_index(spark, df, store, bucket_size=2, store_text=True)
    monkeypatch.setattr(store, "pinned_bucket_size", lambda: None)
    s = Searcher(spark, store).open()
    page = spark.createDataFrame([(i,) for i, _ in DOCS], "doc_id long")
    got = {r["doc_id"]: r["text"] for r in s.fetch_text(page).collect()}
    assert got == dict(DOCS)
    s.close()
