"""Plan-shape assertions: the predicates must reach the parquet scan
(PushedFilters) — the engine's replacement for the reference's FST
point-lookups and segment pruning (SURVEY.md §4)."""

from __future__ import annotations

import pytest

from inverted_index_spark.operators.build import build_index
from inverted_index_spark.operators.query import matching_rows
from inverted_index_spark.plans import count_exchanges, pushed_filters
from inverted_index_spark.sources.store import SegmentStore
from inverted_index_spark.sources.transcripts import generate_transcripts


@pytest.fixture(scope="module")
def store(spark, tmp_path_factory):
    s = SegmentStore(str(tmp_path_factory.mktemp("plans") / "idx"))
    docs = generate_transcripts(spark, 300, include_doc_id=True)
    build_index(spark, docs, s, bucket_size=64)
    return s


def test_term_predicate_pushed_to_scan(spark, store):
    m = matching_rows(spark, store, ["w00000", "w00001"], 10, 200)
    pf = pushed_filters(m)
    assert "In(term" in pf
    assert "max_doc" in pf and "min_doc" in pf


def test_matching_rows_no_exchange(spark, store):
    # a pruned metadata read is scan+filter only — no shuffle
    m = matching_rows(spark, store, ["w00000"])
    assert count_exchanges(m) == 0
