"""Streaming percolator: per-micro-batch alerting equals batch
percolation over the union of all batches, with batch boundaries
forced via maxFilesPerTrigger=1."""

from __future__ import annotations

import os
import shutil
import time

import pytest

from inverted_index_spark.operators.boolean import Or, Term
from inverted_index_spark.operators.percolate import percolate
from inverted_index_spark.streaming.percolate import percolate_stream

SCHEMA = "doc_id long, text string"

BATCH1 = [
    (0, "spark window merge"),
    (1, "table hash join"),
    (2, "window only here"),
]
BATCH2 = [
    (3, "spark window again"),
    (4, "table without the bad word"),
    (5, "merge scan stream"),
]

QUERIES = {
    "qa": "spark window",
    "qb": "table -join",
    "qc": Or(Term("merge"), Term("scan"), minimum_should_match=2),
}


def _write_batches(spark, src):
    for i, rows in enumerate([BATCH1, BATCH2]):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{src}/b{i}")
    os.makedirs(f"{src}/all", exist_ok=True)
    now = time.time()
    for i in range(2):
        part = [n for n in os.listdir(f"{src}/b{i}") if n.endswith(".parquet")][0]
        dst = f"{src}/all/{i:03d}.parquet"
        shutil.copy(f"{src}/b{i}/{part}", dst)
        os.utime(dst, (now - 60 + 30 * i, now - 60 + 30 * i))
    return f"{src}/all"


def test_stream_matches_batch(spark, tmp_path):
    src = _write_batches(spark, str(tmp_path / "src"))
    seen: list[tuple] = []
    batch_ids: list[int] = []

    def on_matches(m, bid):
        batch_ids.append(bid)
        seen.extend((r["doc_id"], r["query_id"]) for r in m.collect())

    q = (
        percolate_stream(
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(src),
            QUERIES,
            on_matches,
        )
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "stream percolate did not finish"

    assert len(batch_ids) == 2, "maxFilesPerTrigger=1 should force 2 batches"
    static = spark.createDataFrame(BATCH1 + BATCH2, SCHEMA)
    want = {
        (r["doc_id"], r["query_id"])
        for r in percolate(spark, static, QUERIES).collect()
    }
    assert set(seen) == want
    assert len(seen) == len(want), "per-batch matches must not duplicate"
    # spot-check semantics across the batch boundary
    assert (0, "qa") in want and (3, "qa") in want
    assert (4, "qb") in want and (1, "qb") not in want
    assert (5, "qc") in want and (2, "qc") not in want


def test_bad_query_fails_at_declaration(spark, tmp_path):
    stream = spark.readStream.schema(SCHEMA).parquet(str(tmp_path))
    with pytest.raises(ValueError, match="unsatisfiable"):
        percolate_stream(stream, {"bad": "spark -spark"}, lambda m, b: None)
