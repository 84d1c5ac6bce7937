"""inverted_index_spark — a PySpark-native inverted-index + BM25 engine.

A from-scratch re-expression of the capabilities of the reference
``lezhnev74/inverted_index`` (a Go disk-resident sorted-map index,
see /root/reference) as idiomatic Spark DataFrame jobs:

- posting-list construction as a doc-bucketed ``groupBy(bucket, term)``
  (the bucket doubles as a deterministic salt for Zipf-skewed terms),
- delta+varint compressed postings stored as binary columns in
  term-sorted parquet segments (reference: single/segment.go:38-84),
- an LSM-style multi-segment directory with size-tiered compaction
  (reference: multiple/multiple_index.go),
- query-side OR-union / range reads (reference: single/single.go:155-196)
  plus the north-rule extension: top-k BM25 ranked retrieval with
  block-max WAND pruning.

Everything is DataFrame/Catalyst-first; Python appears only inside
vectorized Arrow/pandas UDFs (no per-row Python anywhere).
"""

__version__ = "0.1.0"

from inverted_index_spark.session import get_spark  # noqa: F401
