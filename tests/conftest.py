"""Shared Spark session for the test suite (local[8], 8 shuffle parts)."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from inverted_index_spark import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark("ii-tests", cores=8, shuffle_partitions=8)
    yield s
    s.stop()
