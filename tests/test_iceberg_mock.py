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


def test_generations_stay_monotone_after_cleanup(istore):
    """Minting generation_added from the manifest ROW COUNT regresses
    after cleanup() row-deletes retired rows: a post-cleanup commit
    (or delete batch via _commit_manifest's base) would land at a
    generation <= the live merged segment's, so a later gen-scoped
    delete batch would never apply to it. Generations must come from
    max(generation_added), which only grows."""
    istore.commit_segment("a", {"bytes": 1})          # gen 1
    istore.commit_segment("b", {"bytes": 1})          # gen 2
    istore.commit_segment("m", {"bytes": 2}, replaces=["a", "b"])  # gen 3
    istore.cleanup(grace_s=0.0)                       # a, b rows gone
    istore.commit_segment("n", {"bytes": 1})
    gens = istore.read_manifest().set_index("segment_id")["generation_added"]
    assert int(gens["n"]) > int(gens["m"])
    # _commit_manifest's base (what delete_docs scopes batches from)
    # must also sit at the max, not the shrunken row count
    seen = {}
    istore._commit_manifest(lambda m, base: (seen.__setitem__("base", base), m)[1])
    assert seen["base"] == int(gens["n"])


def test_mid_merge_delete_conflict(istore):
    """expect_deletes: a delete batch outside the merger's snapshot
    must abort the commit BEFORE the victim flip (no compensation
    needed, victims stay live)."""
    import pandas as pd

    from inverted_index_spark.sources.store import DELETES

    istore.commit_segment("a", {"bytes": 1})
    istore.commit_segment("b", {"bytes": 1})
    istore._commit_manifest(
        lambda m, base: pd.concat(
            [m, istore._delete_row("del-x", 3, base + 1)], ignore_index=True
        )
    )
    with pytest.raises(ErrMergeConflict):
        istore.commit_segment(
            "m", {"bytes": 2}, replaces=["a", "b"], expect_deletes=[]
        )
    m = istore.read_manifest().set_index("segment_id")["status"]
    assert m["a"] == LIVE and m["b"] == LIVE  # never flipped
    assert m["del-x"] == DELETES
    # with the batch acknowledged the commit goes through
    istore.commit_segment(
        "m", {"bytes": 2}, replaces=["a", "b"], expect_deletes=["del-x"]
    )
    assert istore.read_manifest().set_index("segment_id")["status"]["m"] == LIVE
