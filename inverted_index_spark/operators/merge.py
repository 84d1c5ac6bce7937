"""Size-tiered compaction — the reference's directory merge
(NewMerger/Merge/Cleanup, /root/reference/multiple/multiple_index.go:45-252)
as a Spark job over the manifest:

    pick ≤max smallest live segments (≥min required)          [M7]
    → union their postings scans                              [M8 fan-out ≙
      partition parallelism, not goroutines]
    → groupBy(bucket, term) → decode-concat-sortunique-reencode
      inside applyInPandas                                    [M8 per-term merge]
    → write merged segment, commit manifest swap atomically   [M9]
    → cleanup() deletes tombstoned data                       [M10]

Invariant (property-tested, mirrors multiple_index_test.go:216-290):
merging never changes read_terms/read_values/BM25 results.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from inverted_index_spark.functions.codec import DEFAULT_BLOCK, decode_postings, encode_postings
from inverted_index_spark.operators.build import DEFAULT_BUCKET_SIZE
from inverted_index_spark.sources.store import (
    POSTINGS_SCHEMA,
    SegmentStore,
    dir_bytes,
    new_segment_id,
)


def _merge_bucket_pdf(pdf: pd.DataFrame, block_size: int) -> pd.DataFrame:
    """One doc-bucket's rows across input segments → one re-encoded row
    per term. Decode + sort-unique keeps first (tf, dl) per doc
    (duplicates are the same doc re-indexed; the reference concats then
    sort-dedups, multiple/multiple_index.go:199-213). Grouping at the
    bucket level (not per term) keeps Arrow batches large and Python
    call overhead per group amortized."""
    pdf = pdf.sort_values("term", kind="mergesort")
    bucket = int(pdf["bucket"].iloc[0])
    out = {k: [] for k in POSTINGS_SCHEMA.fieldNames()}
    terms = pdf["term"].to_numpy()
    starts = np.concatenate(([0], np.flatnonzero(terms[1:] != terms[:-1]) + 1))
    ends = np.concatenate((starts[1:], [len(terms)]))
    for s, e in zip(starts, ends):
        docs_parts, tf_parts, dl_parts = [], [], []
        for i in range(s, e):
            d, tf, dl = decode_postings(
                pdf["postings"].iloc[i], pdf["tfs"].iloc[i], pdf["dls"].iloc[i],
                list(pdf["blocks"].iloc[i]),
            )
            docs_parts.append(d)
            tf_parts.append(tf)
            dl_parts.append(dl)
        d = np.concatenate(docs_parts)
        tf = np.concatenate(tf_parts)
        dl = np.concatenate(dl_parts)
        order = np.argsort(d, kind="mergesort")
        d, tf, dl = d[order], tf[order], dl[order]
        keep = np.ones(len(d), dtype=bool)
        keep[1:] = d[1:] != d[:-1]
        d, tf, dl = d[keep], tf[keep], dl[keep]
        p_buf, t_buf, l_buf, blocks = encode_postings(d, tf, dl, block_size=block_size)
        out["bucket"].append(bucket)
        out["term"].append(terms[s])
        out["df"].append(int(len(d)))
        out["postings"].append(p_buf)
        out["tfs"].append(t_buf)
        out["dls"].append(l_buf)
        out["blocks"].append(blocks)
        out["min_doc"].append(int(d[0]))
        out["max_doc"].append(int(d[-1]))
    return pd.DataFrame(out)


def merge_segments(
    spark: SparkSession,
    store: SegmentStore,
    min_files: int = 2,
    max_files: int = 8,
    block_size: int = DEFAULT_BLOCK,
) -> str | None:
    """One compaction pass. Returns the merged segment_id, or None if
    fewer than min_files live segments exist (reference no-op path)."""
    victims = store.pick_merge_candidates(min_files, max_files)
    if not victims:
        return None
    seg = store.read_postings(spark, victims)

    def mrg(pdf: pd.DataFrame) -> pd.DataFrame:
        return _merge_bucket_pdf(pdf, block_size)

    merged = seg.groupBy("bucket").applyInPandas(mrg, schema=POSTINGS_SCHEMA)
    segment_id = new_segment_id()
    seg_dir = store.seg_dir(segment_id)
    (
        merged.repartition("bucket")
        .sortWithinPartitions("bucket", "term")
        .write.mode("overwrite")
        .parquet(f"{seg_dir}/postings")
    )
    # doc stats: dedup union of the inputs' stats
    store.read_docstats(spark, victims).write.mode("overwrite").parquet(
        f"{seg_dir}/docstats"
    )
    out = spark.read.parquet(f"{seg_dir}/postings")
    agg = out.agg(
        F.countDistinct("term").alias("n_terms"),
        F.sum("df").alias("n_postings"),
        F.min("min_doc").alias("min_doc"),
        F.max("max_doc").alias("max_doc"),
    ).collect()[0]
    dstats = (
        spark.read.parquet(f"{seg_dir}/docstats")
        .agg(F.count("*").alias("n_docs"), F.sum("dl").alias("sum_dl"))
        .collect()[0]
    )
    store.commit_segment(
        segment_id,
        {
            "n_terms": int(agg["n_terms"] or 0),
            "n_postings": int(agg["n_postings"] or 0),
            "n_docs": int(dstats["n_docs"] or 0),
            "sum_dl": int(dstats["sum_dl"] or 0),
            "bytes": dir_bytes(seg_dir),
            "min_doc": int(agg["min_doc"] or 0),
            "max_doc": int(agg["max_doc"] or 0),
            "build_id": f"merge:{'+'.join(victims)}"[:512],
        },
        replaces=victims,
    )
    return segment_id


def merge_until_one(
    spark: SparkSession,
    store: SegmentStore,
    min_files: int = 2,
    max_files: int = 8,
) -> list[str]:
    """Run passes until a single live segment remains; returns the
    merged ids in order (the reference's continuous merge loop,
    README.md:92-103)."""
    out = []
    while True:
        sid = merge_segments(spark, store, min_files, max_files)
        if sid is None:
            return out
        out.append(sid)
