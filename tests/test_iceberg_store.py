"""Iceberg-backed manifest adapter: skipped where no Iceberg runtime
exists (this sandbox has none — no iceberg-spark-runtime jar, no
pyiceberg). The suite still pins (a) the availability probe is honest
and (b) the adapter fails loudly, not silently, without a catalog."""

from __future__ import annotations

import pytest

from inverted_index_spark.sources.iceberg import IcebergSegmentStore, iceberg_available


def test_probe_reports_unavailable_without_catalog(spark):
    assert iceberg_available(spark) is False


def test_adapter_fails_loudly_without_catalog(spark, tmp_path):
    store = IcebergSegmentStore(root=str(tmp_path / "idx"), spark=spark)
    with pytest.raises(RuntimeError, match="no Iceberg catalog"):
        store.read_manifest()


@pytest.mark.skipif(True, reason="no Iceberg runtime in this sandbox")
def test_roundtrip_against_real_catalog(spark, tmp_path):
    """Enable by configuring spark.sql.catalog.ii_catalog and dropping
    the skip: the full SegmentStore test surface (commit/read/cleanup)
    must pass against the Iceberg manifest unchanged."""
    raise NotImplementedError
