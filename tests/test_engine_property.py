"""Hypothesis property tests for the whole write→read path: random
posting sets through SegmentWriter must match the pure-Python
OracleIndex on ReadTerms / ReadValues(range) — the property-scale
version of the reference's table-driven cases
(/root/reference/single/single_test.go:37-196).

One Spark round-trip per example is expensive, so examples are few but
each is a full segment build; doc ids stress the long range (beyond
2^31 and 2^53 — the round-2 integer-division bucket fix territory).
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from inverted_index_spark.operators.build import SegmentWriter
from inverted_index_spark.operators.query import read_terms, read_values
from inverted_index_spark.oracle import OracleIndex
from inverted_index_spark.sources.store import SegmentStore

DOC_ID = st.integers(min_value=0, max_value=2**62 - 1)
TERM = st.sampled_from([f"t{i}" for i in range(8)] + ["ω", "日本語"])

POSTINGS = st.dictionaries(
    TERM, st.lists(DOC_ID, min_size=0, max_size=30), min_size=1, max_size=6
)


@pytest.fixture(scope="module")
def mk_store(tmp_path_factory):
    counter = [0]

    def make() -> SegmentStore:
        counter[0] += 1
        return SegmentStore(str(tmp_path_factory.mktemp(f"prop{counter[0]}")))

    return make


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(postings=POSTINGS, data=st.data())
def test_write_read_matches_oracle(spark, mk_store, postings, data):
    store = mk_store()
    w = SegmentWriter(spark, store, bucket_size=257)  # odd size: bucket edges move
    for term, vals in postings.items():
        w.put(term, vals)
    w.close()
    oracle = OracleIndex.from_postings(list(postings.items()))

    got_terms = [r["term"] for r in read_terms(spark, store).collect()]
    # oracle.read_terms drops empty-postings terms; the engine (like the
    # reference FST) keeps them — compare against the full put set
    assert got_terms == sorted(postings.keys())

    all_docs = sorted({d for vals in postings.values() for d in vals})
    terms = data.draw(st.lists(TERM, min_size=0, max_size=4), label="query_terms")
    if all_docs and data.draw(st.booleans(), label="use_range"):
        lo = data.draw(st.sampled_from(all_docs), label="lo")
        hi = data.draw(st.sampled_from([d for d in all_docs if d >= lo]), label="hi")
    else:
        lo = hi = None
    got = [r["doc_id"] for r in read_values(spark, store, terms, lo, hi).collect()]
    assert got == oracle.read_values(terms, lo, hi)


def test_doc_id_int64_boundary(spark, mk_store):
    """Ids up to 2^63-1 (the LongType ceiling) round-trip exactly; a
    negative id (what a uint64 ≥ 2^63 becomes after wrapping) is
    rejected with a clear error instead of committing a segment whose
    sort order / bucketing / range reads are silently broken. The
    reference's full-uint64 V is a documented narrowing (SURVEY §2.6)."""
    top = 2**63 - 1
    store = mk_store()
    w = SegmentWriter(spark, store, bucket_size=1 << 20)
    w.put("edge", [top, 5, top - 1])
    w.close()
    got = [r["doc_id"] for r in read_values(spark, store, ["edge"], None, None).collect()]
    assert got == [5, top - 1, top]
    # range read straddling the ceiling
    got = [r["doc_id"] for r in read_values(spark, store, ["edge"], top - 1, top).collect()]
    assert got == [top - 1, top]

    bad = mk_store()
    w = SegmentWriter(spark, bad, bucket_size=1 << 20)
    w.put("neg", [-3])
    with pytest.raises(ValueError, match="doc_id|2\\^63"):
        w.close()
    assert len(bad.live_segments()) == 0  # nothing committed
