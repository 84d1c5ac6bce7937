"""Iceberg commit-protocol semantics against a MOCK catalog.

No Iceberg jars ship in this sandbox (test_iceberg_store.py skips), so
this exercises the adapter's commit logic — append + validated victim
flip + compensation on conflict — against a pandas-backed fake that
implements exactly the SQL surface the adapter issues. What's under
test is OUR protocol (ordering, validation, compensation, row
accounting), not Iceberg itself.
"""

from __future__ import annotations

import re

import pandas as pd
import pytest

from inverted_index_spark.sources.iceberg import IcebergSegmentStore
from inverted_index_spark.sources.store import (
    LIVE,
    MANIFEST_COLS,
    MERGED,
    ErrMergeConflict,
)


class _FakeConf:
    def get(self, key, default=None):
        return "org.apache.iceberg.spark.SparkCatalog"  # catalog "configured"


class _Name:  # _jvm.java.lang.Class.forName(...) chain
    def __getattr__(self, _):
        return self

    def __call__(self, *a, **k):
        return self


class _FakeWriteTo:
    def __init__(self, spark, pdf):
        self.spark, self.pdf = spark, pdf

    def writeTo(self, tbl):
        return self

    def append(self):
        base = self.spark.manifest
        self.spark.manifest = (
            self.pdf.copy()
            if not len(base)
            else pd.concat([base, self.pdf], ignore_index=True)
        )
        self.spark.n_snapshots += 1

    def toPandas(self):
        return self.pdf.copy()


class FakeIcebergSpark:
    """Implements the exact statement shapes IcebergSegmentStore issues."""

    def __init__(self):
        self.manifest = pd.DataFrame(columns=MANIFEST_COLS)
        self.n_snapshots = 0
        self.conf = _FakeConf()
        self._jvm = _Name()
        self.log: list[str] = []

    def sql(self, stmt: str):
        self.log.append(stmt)
        s = " ".join(stmt.split())
        if s.startswith("CREATE "):
            return _FakeWriteTo(self, pd.DataFrame())
        m = re.match(r"SELECT count\(\*\) AS n FROM \S+\.snapshots", s)
        if m:
            return _Rows([{"n": self.n_snapshots}])
        m = re.match(r"SELECT count\(\*\) AS n FROM \S+ WHERE tombstone_ts = (\S+)", s)
        if m:
            mark = float(m.group(1))
            return _Rows([{"n": int((self.manifest["tombstone_ts"] == mark).sum())}])
        m = re.match(
            r"UPDATE \S+ SET status = '(\w+)', tombstone_ts = (\S+) "
            r"WHERE segment_id IN \(([^)]*)\) AND status = '(\w+)'",
            s,
        )
        if m:
            to_status, mark, ids, from_status = m.groups()
            idset = {x.strip().strip("'") for x in ids.split(",")}
            hit = self.manifest["segment_id"].isin(idset) & (
                self.manifest["status"] == from_status
            )
            self.manifest.loc[hit, "status"] = to_status
            self.manifest.loc[hit, "tombstone_ts"] = float(mark)
            self.n_snapshots += 1
            return _Rows([])
        m = re.match(
            r"UPDATE \S+ SET status = '(\w+)', tombstone_ts = (\S+) "
            r"WHERE tombstone_ts = (\S+)",
            s,
        )
        if m:
            to_status, new_ts, mark = m.groups()
            hit = self.manifest["tombstone_ts"] == float(mark)
            self.manifest.loc[hit, "status"] = to_status
            self.manifest.loc[hit, "tombstone_ts"] = float(new_ts)
            self.n_snapshots += 1
            return _Rows([])
        m = re.match(r"DELETE FROM \S+ WHERE segment_id IN \(([^)]*)\)", s)
        if m:
            idset = {x.strip().strip("'") for x in m.group(1).split(",")}
            self.manifest = self.manifest[
                ~self.manifest["segment_id"].isin(idset)
            ].reset_index(drop=True)
            self.n_snapshots += 1
            return _Rows([])
        raise AssertionError(f"mock got unexpected SQL: {stmt}")

    def table(self, tbl):
        return _FakeWriteTo(self, self.manifest.copy())

    def createDataFrame(self, pdf):
        return _FakeWriteTo(self, pdf.reset_index(drop=True))


class _Rows:
    def __init__(self, rows):
        self._rows = rows

    def collect(self):
        return self._rows


@pytest.fixture()
def istore(tmp_path):
    return IcebergSegmentStore(
        root=str(tmp_path / "iidx"), spark=FakeIcebergSpark()
    )


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
