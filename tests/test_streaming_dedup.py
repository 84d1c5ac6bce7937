"""Stateful streaming operators (streaming.dedup): cross-batch exact
dedup via the built-in state store, and the custom
applyInPandasWithState per-conversation arrival sequencer. Micro-batch
boundaries are forced with maxFilesPerTrigger=1 over an ordered file
source, so cross-batch state is genuinely exercised."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from inverted_index_spark.streaming.dedup import assign_arrival_seq, dedup_stream

SCHEMA = "doc_id long, conv_id string, turn_idx int, text string"

BATCH1 = [
    (0, "c0", 0, "hello world"),
    (1, "c0", 1, "the quick fox"),
    (2, "c1", 0, "hello world"),          # dup of doc 0 (same batch)
    (3, "c1", 1, "unique one"),
]
BATCH2 = [
    (4, "c0", 2, "the quick fox"),        # dup of doc 1 (PREVIOUS batch)
    (5, "c1", 2, "fresh text"),
    (6, "c2", 0, "hello world"),          # dup of doc 0 (previous batch)
    (7, "c0", 3, "entirely new"),
]


def _write_batches(spark, src):
    """One file per batch, named so the file source picks them up in
    order; maxFilesPerTrigger=1 → one micro-batch per file."""
    for i, rows in enumerate([BATCH1, BATCH2]):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{src}/b{i}")
    # flatten into one dir with ordered file names
    import shutil

    import time

    os.makedirs(f"{src}/all", exist_ok=True)
    now = time.time()
    for i in range(2):
        part = [
            n for n in os.listdir(f"{src}/b{i}") if n.endswith(".parquet")
        ][0]
        dst = f"{src}/all/{i:03d}.parquet"
        shutil.copy(f"{src}/b{i}/{part}", dst)
        # the file source orders batches by mtime — pin strictly
        # increasing timestamps so batch order is deterministic
        os.utime(dst, (now - 60 + 30 * i, now - 60 + 30 * i))
    return f"{src}/all"


def _run_stream(spark, src_dir, tmp_path, transform, sink_name):
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .option("latestFirst", "false")
        .parquet(src_dir)
    )
    q = (
        transform(stream)
        .writeStream.format("memory")
        .queryName(sink_name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / f"ckpt_{sink_name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(sink_name)


def test_dedup_stream_cross_batch(spark, tmp_path):
    src = _write_batches(spark, str(tmp_path / "src"))
    out = _run_stream(
        spark, src, tmp_path, lambda s: dedup_stream(s), "dedup_sink"
    )
    rows = {r["doc_id"]: r["text"] for r in out.collect()}
    # first arrival of each fingerprint survives; doc 4 and 6 are
    # duplicates FROM A LATER BATCH — only cross-batch state kills them
    assert set(rows) == {0, 1, 3, 5, 7}
    texts = sorted(rows.values())
    assert texts == sorted(
        ["hello world", "the quick fox", "unique one", "fresh text", "entirely new"]
    )
    # batch-equivalence: same first-wins set as the batch dedup operator
    from inverted_index_spark.operators.dedup import dedup_exact

    allrows = spark.createDataFrame(BATCH1 + BATCH2, SCHEMA)
    batch_kept = {r["doc_id"] for r in dedup_exact(allrows).collect()}
    assert set(rows) == batch_kept


def test_assign_arrival_seq_cross_batch(spark, tmp_path):
    src = _write_batches(spark, str(tmp_path / "src2"))
    out = _run_stream(
        spark, src, tmp_path, lambda s: assign_arrival_seq(s), "seq_sink"
    )
    got = {
        r["doc_id"]: (r["conv_id"], r["arrival_seq"]) for r in out.collect()
    }
    # per conversation, sequence counts monotonically ACROSS batches:
    # c0 batch1: docs 0,1 (turn 0,1) → seq 0,1; batch2: docs 4,7 → 2,3
    assert got[0] == ("c0", 0) and got[1] == ("c0", 1)
    assert got[4] == ("c0", 2) and got[7] == ("c0", 3)
    # c1 batch1: 2,3 → 0,1; batch2: 5 → 2
    assert got[2] == ("c1", 0) and got[3] == ("c1", 1) and got[5] == ("c1", 2)
    # c2 first appears in batch2 → starts at 0
    assert got[6] == ("c2", 0)
    assert len(got) == 8


def test_dedup_stream_watermarked(spark, tmp_path):
    """The watermark-bounded variant (dropDuplicatesWithinWatermark):
    duplicates arriving within the delay are still suppressed across
    batches; the state store is bounded by the watermark."""
    import datetime

    import shutil

    base = datetime.datetime(2026, 1, 1, 12, 0, 0)
    schema_ts = "doc_id long, text string, ts timestamp"
    b1 = [(0, "hello world", base), (1, "fresh one", base)]
    b2 = [
        (2, "hello world", base + datetime.timedelta(seconds=30)),  # dup, in window
        (3, "another new", base + datetime.timedelta(seconds=40)),
    ]
    src = str(tmp_path / "wsrc")
    import os
    import time

    os.makedirs(f"{src}/all", exist_ok=True)
    now = time.time()
    for i, rows in enumerate([b1, b2]):
        spark.createDataFrame(rows, schema_ts).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{src}/b{i}")
        part = [n for n in os.listdir(f"{src}/b{i}") if n.endswith(".parquet")][0]
        dst = f"{src}/all/{i:03d}.parquet"
        shutil.copy(f"{src}/b{i}/{part}", dst)
        os.utime(dst, (now - 60 + 30 * i, now - 60 + 30 * i))

    stream = (
        spark.readStream.schema(schema_ts)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src}/all")
    )
    q = (
        dedup_stream(stream, watermark=("ts", "10 minutes"))
        .writeStream.format("memory")
        .queryName("wdedup_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "wckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    kept = {r["doc_id"] for r in spark.table("wdedup_sink").collect()}
    assert kept == {0, 1, 3}  # doc 2's duplicate suppressed cross-batch
