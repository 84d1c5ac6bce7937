"""Shared pandas-backed mock of the Iceberg SQL surface the adapter
issues (tests/test_iceberg_mock.py has the protocol-level tests; the
store-contract suites parametrize over {parquet, iceberg-mock} using
:func:`make_mock_iceberg_store`).

Every statement and append runs under ONE lock — the stand-in for
Iceberg's per-commit serializable isolation: a real catalog serializes
each UPDATE/APPEND commit, and the adapter's conflict protocol only
assumes statement-level atomicity (the victim flip + count are
separate statements on purpose — see sources/iceberg.py docstring).
"""

from __future__ import annotations

import re
import threading

import pandas as pd

from inverted_index_spark.sources.iceberg import IcebergSegmentStore
from inverted_index_spark.sources.store import MANIFEST_COLS


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
        with self.spark.lock:
            base = self.spark.manifest
            self.spark.manifest = (
                self.pdf.copy()
                if not len(base)
                else pd.concat([base, self.pdf], ignore_index=True)
            )
            self.spark._commit()

    def toPandas(self):
        return self.pdf.copy()


class _Rows:
    def __init__(self, rows):
        self._rows = rows

    def collect(self):
        return self._rows


class FakeIcebergSpark:
    """Implements the exact statement shapes IcebergSegmentStore issues."""

    def __init__(self):
        self.manifest = pd.DataFrame(columns=MANIFEST_COLS)
        self.n_snapshots = 0
        # full manifest image per commit — the mock's snapshot log
        # (position k, 1-based, = table state after the k-th commit),
        # what VERSION AS OF resolves against
        self.snapshots: list[pd.DataFrame] = []
        self.conf = _FakeConf()
        self._jvm = _Name()
        self.log: list[str] = []
        self.lock = threading.RLock()

    def _commit(self) -> None:
        self.n_snapshots += 1
        self.snapshots.append(self.manifest.copy())

    def sql(self, stmt: str):
        with self.lock:
            return self._sql(stmt)

    def _sql(self, stmt: str):
        self.log.append(stmt)
        s = " ".join(stmt.split())
        if s.startswith("CREATE "):
            return _FakeWriteTo(self, pd.DataFrame())
        m = re.match(r"SELECT count\(\*\) AS n FROM \S+\.snapshots", s)
        if m:
            return _Rows([{"n": self.n_snapshots}])
        m = re.match(r"SELECT snapshot_id FROM \S+\.snapshots ORDER BY", s)
        if m:
            return _Rows([{"snapshot_id": i + 1} for i in range(self.n_snapshots)])
        m = re.match(r"SELECT \* FROM \S+ VERSION AS OF (\d+)", s)
        if m:
            sid = int(m.group(1))
            assert 1 <= sid <= len(self.snapshots), f"unknown snapshot {sid}"
            return _FakeWriteTo(self, self.snapshots[sid - 1].copy())
        m = re.match(r"SELECT count\(\*\) AS n FROM \S+ WHERE tombstone_ts = (\S+)", s)
        if m:
            mark = float(m.group(1))
            return _Rows([{"n": int((self.manifest["tombstone_ts"] == mark).sum())}])
        m = re.match(
            r"SELECT count\(\*\) AS n FROM \S+ WHERE status = '(\w+)' "
            r"AND segment_id != '(\S+)'",
            s,
        )
        if m:
            status, sid = m.groups()
            n = int(
                (
                    (self.manifest["status"] == status)
                    & (self.manifest["segment_id"] != sid)
                ).sum()
            )
            return _Rows([{"n": n}])
        m = re.match(
            r"SELECT min\(generation_added\) AS g FROM \S+ "
            r"WHERE status = '(\w+)' AND segment_id != '(\S+)'",
            s,
        )
        if m:
            status, sid = m.groups()
            hit = self.manifest[
                (self.manifest["status"] == status)
                & (self.manifest["segment_id"] != sid)
            ]
            g = int(hit["generation_added"].min()) if len(hit) else None
            return _Rows([{"g": g}])
        m = re.match(
            r"UPDATE \S+ SET status = '(\w+)', tombstone_ts = (\S+) "
            r"WHERE segment_id IN \(([^)]*)\) AND status = '(\w+)'"
            r"(?: AND generation_added <= (\d+))?$",
            s,
        )
        if m:
            to_status, mark, ids, from_status, gen_cap = m.groups()
            idset = {x.strip().strip("'") for x in ids.split(",")}
            hit = self.manifest["segment_id"].isin(idset) & (
                self.manifest["status"] == from_status
            )
            if gen_cap is not None:
                hit &= self.manifest["generation_added"] <= int(gen_cap)
            self.manifest.loc[hit, "status"] = to_status
            self.manifest.loc[hit, "tombstone_ts"] = float(mark)
            self._commit()
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
            self._commit()
            return _Rows([])
        m = re.match(r"DELETE FROM \S+ WHERE segment_id IN \(([^)]*)\)", s)
        if m:
            idset = {x.strip().strip("'") for x in m.group(1).split(",")}
            self.manifest = self.manifest[
                ~self.manifest["segment_id"].isin(idset)
            ].reset_index(drop=True)
            self._commit()
            return _Rows([])
        raise AssertionError(f"mock got unexpected SQL: {stmt}")

    def table(self, tbl):
        with self.lock:
            return _FakeWriteTo(self, self.manifest.copy())

    def createDataFrame(self, pdf):
        return _FakeWriteTo(self, pdf.reset_index(drop=True))


def make_mock_iceberg_store(root: str) -> IcebergSegmentStore:
    """An IcebergSegmentStore whose manifest lives in the mock catalog
    (segment DATA still lands as real parquet under ``root``, read by
    the real Spark session — only the commit/catalog layer is faked)."""
    return IcebergSegmentStore(root=root, spark=FakeIcebergSpark())
