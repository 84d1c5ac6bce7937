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


def test_prefix_predicate_pushed_to_scan(spark, store):
    # StartsWith is a pushable parquet predicate — the FST range-seek
    # analog must prune at the scan, not post-filter
    from pyspark.sql import functions as F

    rows = store.read_postings(spark).where(F.col("term").startswith("w00"))
    assert "StartsWith(term" in pushed_filters(rows)


def test_regex_scan_reads_only_term_column(spark, store):
    # the regex dictionary scan must never read posting bytes
    import io
    from contextlib import redirect_stdout

    from inverted_index_spark.operators.query import read_terms_regex

    buf = io.StringIO()
    with redirect_stdout(buf):
        read_terms_regex(spark, store, "w0+1").explain("formatted")
    scan = [l for l in buf.getvalue().splitlines() if "ReadSchema" in l]
    assert scan and all("postings" not in l and "tfs" not in l for l in scan), scan
