"""Dense doc-id minting over a stable ordering (reference W4 analog).

The reference builds ONE global sorted-unique value array at close
time (getAllTermValues, /root/reference/single/single.go:402-415); our
doc universe is minted the same way but distributed: dense rank over
``ORDER BY conv_id, turn_idx`` (the input_hint's stable turn order).

A naive ``row_number() OVER (ORDER BY ...)`` collapses to a single
partition — useless at 10^12 rows. Instead: range-repartition on the
order key, sort within partitions, then a two-pass partition-offset
prefix sum (tiny driver-side cumsum over per-partition counts). The
sorted intermediate is persisted so both passes see identical
partition boundaries.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mint_doc_ids(
    df: DataFrame,
    order_cols: list[str] | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Add ``doc_id`` = 0-based dense rank over order_cols.

    At 100 TB the persisted sorted intermediate would be a disk
    checkpoint; StorageLevel.DISK_ONLY keeps the same semantics here.
    """
    order_cols = order_cols or ["conv_id", "turn_idx"]
    spark = df.sparkSession
    n = num_partitions or spark.sparkContext.defaultParallelism * 2
    # localCheckpoint, NOT persist — same rationale as
    # corpus.running_offsets: the collected per-_pid counts are only
    # valid for this materialization, and a persist here could never
    # be unpersisted by this lazy API (leaked CacheManager entry per
    # call). Blocks release with the result's GC.
    sorted_df = (
        df.repartitionByRange(n, *order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True, storageLevel=StorageLevel.DISK_ONLY)
    )
    counts = {r["_pid"]: r["count"] for r in sorted_df.groupBy("_pid").count().collect()}
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    bc = spark.sparkContext.broadcast(offsets)

    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in sorted_df.schema.fields
        if f.name != "_pid"
    ) + ", doc_id long"

    def add_ids(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        seen = 0
        for pdf in batches:
            if not len(pdf):
                continue
            base = bc.value[int(pdf["_pid"].iloc[0])]
            out = pdf.drop(columns=["_pid"]).copy()
            out["doc_id"] = np.arange(seen + base, seen + base + len(pdf), dtype=np.int64)
            seen += len(pdf)
            yield out

    return sorted_df.mapInPandas(add_ids, schema=out_schema)
