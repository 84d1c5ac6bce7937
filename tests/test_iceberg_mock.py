"""Iceberg commit-protocol semantics against a MOCK catalog.

No Iceberg jars ship in this sandbox (test_iceberg_store.py skips), so
this exercises the adapter's commit logic — append + validated victim
flip + compensation on conflict — against a pandas-backed fake that
implements exactly the SQL surface the adapter issues. What's under
test is OUR protocol (ordering, validation, compensation, row
accounting), not Iceberg itself. The fake lives in tests/iceberg_mock
so the full store-contract suites (test_merge, test_store_concurrency,
test_docstore) can parametrize over {parquet, iceberg-mock} too.
"""

from __future__ import annotations

import pytest

from inverted_index_spark.sources.store import LIVE, MERGED, ErrMergeConflict
from tests.iceberg_mock import make_mock_iceberg_store


@pytest.fixture()
def istore(tmp_path):
    return make_mock_iceberg_store(str(tmp_path / "iidx"))


def test_append_then_merge_commit(istore):
    istore.commit_segment("a", {"n_terms": 1, "bytes": 1})
    istore.commit_segment("b", {"n_terms": 1, "bytes": 1})
    istore.commit_segment("m", {"n_terms": 2, "bytes": 2}, replaces=["a", "b"])
    m = istore.read_manifest()
    assert set(m[m["status"] == LIVE]["segment_id"]) == {"m"}
    assert set(m[m["status"] == MERGED]["segment_id"]) == {"a", "b"}
    # commit was APPEND + UPDATE, never a table overwrite
    assert not any("overwrite" in s.lower() for s in istore.spark.log)


def test_merge_conflict_compensates_and_raises(istore):
    """A racer consumed victim b first: our commit must raise AND flip
    victim a (which we tombstoned before learning we lost) back to
    live — no victim is left orphan-tombstoned with no replacement."""
    istore.commit_segment("a", {"bytes": 1})
    istore.commit_segment("b", {"bytes": 1})
    istore.commit_segment("winner", {"bytes": 2}, replaces=["b"])  # the racer
    with pytest.raises(ErrMergeConflict):
        istore.commit_segment("loser", {"bytes": 2}, replaces=["a", "b"])
    m = istore.read_manifest()
    assert "loser" not in set(m["segment_id"])  # losing row never appended
    by_id = m.set_index("segment_id")["status"]
    assert by_id["a"] == LIVE  # compensated back
    assert by_id["b"] == MERGED  # the racer's tombstone stands
    assert by_id["winner"] == LIVE


def test_cleanup_deletes_by_id_not_overwrite(istore):
    istore.commit_segment("a", {"bytes": 1})
    istore.commit_segment("b", {"bytes": 1})
    istore.commit_segment("m", {"bytes": 2}, replaces=["a", "b"])
    deleted = istore.cleanup(grace_s=0.0)
    assert sorted(deleted) == ["a", "b"]
    m = istore.read_manifest()
    assert list(m["segment_id"]) == ["m"]
    assert any(s.startswith("DELETE FROM") for s in istore.spark.log)
    assert not any("overwrite" in s.lower() for s in istore.spark.log)
