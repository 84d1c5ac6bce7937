"""Iceberg-backed segment catalog — the production home for the
SegmentStore manifest (SURVEY.md §7.0 names this as the north-rule
storage; BASELINE.json input_hint says "Iceberg transcript tables").

The parquet SegmentStore already implements Iceberg's commit model by
hand: an immutable snapshot per commit (gen-N.parquet), an atomic
pointer advance, optimistic-retry CAS, tombstones with a grace window.
This adapter swaps that hand-rolled layer for a real Iceberg catalog
when one is configured, keeping the exact SegmentStore interface so
every operator (build/query/merge/streaming) runs unchanged:

    manifest row      → row in an Iceberg table `<ns>.ii_manifest`
    commit_segment    → Iceberg append (serializable via the catalog's
                        own optimistic commit — replaces our os.link CAS)
    read_manifest     → snapshot-isolated table scan
    cleanup           → DELETE + expire_snapshots

Availability is probed at call time: this sandbox ships NO Iceberg
runtime (no iceberg-spark-runtime jar in /opt/spark/jars, no
pyiceberg), so the adapter raises a clear error here and the parquet
store remains the tested default. `tests/test_iceberg_store.py` skips
unless a catalog is configured (`spark.sql.catalog.<name>` conf).
"""

from __future__ import annotations

from dataclasses import dataclass

import pandas as pd
from pyspark.sql import SparkSession

from inverted_index_spark.sources.store import MANIFEST_COLS, SegmentStore


def iceberg_available(spark: SparkSession, catalog: str = "ii_catalog") -> bool:
    """True iff an Iceberg catalog is configured AND its classes load."""
    impl = spark.conf.get(f"spark.sql.catalog.{catalog}", None)
    if not impl:
        return False
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.catalog.Catalog")
        return True
    except Exception:
        return False


@dataclass
class IcebergSegmentStore(SegmentStore):
    """SegmentStore whose manifest lives in an Iceberg table.

    Segment DATA stays as parquet under ``root`` (same layout, same
    readers); only the commit/catalog layer moves to Iceberg, which is
    where the concurrency guarantees live. Requires an Iceberg catalog
    on the session (spark-submit --packages iceberg-spark-runtime).
    """

    spark: SparkSession = None
    catalog: str = "ii_catalog"
    namespace: str = "ii"

    def _table(self) -> str:
        return f"{self.catalog}.{self.namespace}.ii_manifest"

    def _ensure(self) -> None:
        if not iceberg_available(self.spark, self.catalog):
            raise RuntimeError(
                f"no Iceberg catalog '{self.catalog}' on this session — "
                "add iceberg-spark-runtime and spark.sql.catalog.* conf, "
                "or use the parquet SegmentStore (default)"
            )
        cols = ", ".join(f"{c} STRING" if c in ("segment_id", "path", "status",
                                                "build_id", "input_fingerprint")
                         else f"{c} DOUBLE" if c in ("terms_per_sec", "skew_ratio",
                                                     "created_ts", "tombstone_ts")
                         else f"{c} BIGINT"
                         for c in MANIFEST_COLS)
        self.spark.sql(f"CREATE NAMESPACE IF NOT EXISTS {self.catalog}.{self.namespace}")
        self.spark.sql(f"CREATE TABLE IF NOT EXISTS {self._table()} ({cols}) USING iceberg")

    def read_manifest(self) -> pd.DataFrame:
        self._ensure()
        return (
            self.spark.table(self._table()).toPandas().reindex(columns=MANIFEST_COLS)
        )

    def _commit_manifest(self, transform) -> int:
        """Iceberg's optimistic snapshot commit replaces the os.link CAS:
        read current snapshot → transform → overwrite; the catalog
        serializes concurrent committers and retries conflicts."""
        self._ensure()
        base = self.read_manifest()
        nxt = transform(base, len(base))[MANIFEST_COLS]
        self.spark.createDataFrame(nxt).writeTo(self._table()).overwritePartitions()
        return int(
            self.spark.sql(
                f"SELECT count(*) AS n FROM {self.catalog}.{self.namespace}"
                ".ii_manifest.snapshots"
            ).collect()[0]["n"]
        )
