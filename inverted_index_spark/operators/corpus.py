"""Corpus-level training-data operators: deterministic sampling and
sequence packing (task rubric — "operations a large-scale
training-data pipeline would need").

``hash_sample``      deterministic md5-keyed Bernoulli sampling —
                     reproducible across runs, partitionings, and
                     engines (the DuckDB oracle draws the identical
                     sample), unlike ``df.sample`` whose RNG is
                     partition-dependent. Per-stratum rates give the
                     corpus-mixing knob (e.g. downsample by language
                     or source).
``pack_sequences``   concat-then-chunk packing: lay every doc's
                     tokens on one global stream (doc_id order) and
                     cut fixed-size training blocks — the standard
                     LLM pretraining batcher. The global offset is an
                     exclusive prefix sum computed WITHOUT a
                     single-partition window (range-repartition +
                     per-partition sums + driver cumsum over the tiny
                     per-partition totals — same scale pattern as
                     operators.docids.mint_doc_ids).

Sampling decisions use the low 31 bits of the pinned
signed-little-endian md5 hash (functions shared with operators.dedup):
bitwise AND with 2^31-1 is identical on Spark longs and DuckDB
HUGEINTs regardless of sign, so thresholds compare exactly in both
engines — no float rounding in the keep/drop decision.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark import StorageLevel
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from inverted_index_spark.functions.tokenizer import doc_length_expr
from inverted_index_spark.operators.dedup import h64_md5_le

_SAMPLE_BITS = 31
_SAMPLE_MOD = 1 << _SAMPLE_BITS


def sample_key(id_col: Column, seed: int) -> Column:
    """Deterministic per-row draw in [0, 2^31): low 31 bits of the
    pinned md5 hash of "<seed>:<id>"."""
    key = F.concat(F.lit(f"{seed}:"), id_col.cast("string"))
    return h64_md5_le(key).bitwiseAND(F.lit(_SAMPLE_MOD - 1))


def sample_threshold(fraction: float) -> int:
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return int(fraction * _SAMPLE_MOD)


def hash_sample(
    docs: DataFrame,
    fraction: float,
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Uniform deterministic sample: keep rows whose draw < fraction·2^31."""
    return docs.where(
        sample_key(F.col(id_col), seed) < F.lit(sample_threshold(fraction))
    )


def stratified_sample(
    docs: DataFrame,
    fractions: dict[str, float],
    strata_col: str,
    id_col: str = "doc_id",
    seed: int = 42,
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling (corpus mixing): each stratum
    keeps its own fraction; strata absent from ``fractions`` keep
    ``default_fraction``. The rate table rides the plan as a broadcast
    join — no per-row Python, one codegen'd md5 per row."""
    spark = docs.sparkSession
    rates = spark.createDataFrame(
        [(k, sample_threshold(v)) for k, v in sorted(fractions.items())],
        f"{strata_col} string, _thr long",
    )
    joined = docs.join(F.broadcast(rates), on=strata_col, how="left")
    thr = F.coalesce(F.col("_thr"), F.lit(sample_threshold(default_fraction)))
    return joined.where(sample_key(F.col(id_col), seed) < thr).drop("_thr")


# ------------------------------------------------------------------ packing ---


def running_offsets(
    df: DataFrame,
    value_col: str,
    order_cols: list[str],
    out_col: str = "offset",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exclusive prefix sum of ``value_col`` over a global ordering —
    distributed: range-repartition on the order key, cumsum within
    partitions, tiny driver-side cumsum over per-partition totals
    (never a single-partition window; at 10^12 rows the per-partition
    totals are the only thing the driver sees)."""
    spark = df.sparkSession
    n = num_partitions or spark.sparkContext.defaultParallelism * 2
    # localCheckpoint, NOT persist: the per-partition bases collected
    # below are only valid for THIS materialization (a recompute could
    # resample the range boundaries), and persist() pins a CacheManager
    # entry a lazy-API function can never unpersist — one leaked
    # corpus-sized cache per call. Checkpoint blocks are GC-released
    # with the result, and a lost block fails the job instead of
    # silently recomputing with different partition boundaries.
    sorted_df = (
        df.repartitionByRange(n, *order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True, storageLevel=StorageLevel.DISK_ONLY)
    )
    totals = {
        r["_pid"]: r["s"]
        for r in sorted_df.groupBy("_pid")
        .agg(F.coalesce(F.sum(value_col), F.lit(0)).alias("s"))
        .collect()
    }
    bases: dict[int, int] = {}
    acc = 0
    for pid in sorted(totals):
        bases[pid] = acc
        acc += int(totals[pid])
    bc = spark.sparkContext.broadcast(bases)
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in sorted_df.schema.fields
        if f.name != "_pid"
    ) + f", {out_col} long"

    def add_offsets(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        running = None
        for pdf in batches:
            if not len(pdf):
                continue
            if running is None:
                running = int(bc.value[int(pdf["_pid"].iloc[0])])
            vals = pdf[value_col].to_numpy(dtype=np.int64)
            out = pdf.drop(columns=["_pid"]).copy()
            csum = np.cumsum(vals)
            out[out_col] = running + csum - vals  # exclusive
            running += int(csum[-1])
            yield out

    return sorted_df.mapInPandas(add_offsets, schema=out_schema)


def prepare_corpus(
    docs: DataFrame,
    *,
    langs: tuple[str, ...] = ("en", "de"),
    min_tokens: int = 5,
    max_tokens: int = 1 << 20,
    minhash_threshold: float = 0.6,
    fractions: dict[str, float] | None = None,
    strata_col: str = "source",
    default_fraction: float = 1.0,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: int = 42,
) -> DataFrame:
    """The composed training-data pipeline, one declarative plan:

        1. length filter      (pinned-tokenizer token count in range)
        2. language filter    (n-gram-heuristic lang_id ∈ langs)
        3. exact dedup        (md5 fingerprint, keep min doc_id)
        4. near-dedup         (MinHash-LSH pairs → connected components
                               → keep each cluster's min doc_id)
        5. stratified sample  (deterministic md5 draw per stratum)

    Every stage is the already-oracle-backed operator, so the WHOLE
    composition has a bit-exact DuckDB twin (the `corpus_pipeline`
    driver entry). Stage order matters and is part of the contract:
    near-dup pairs are computed on the exact-deduped survivor set.
    """
    from inverted_index_spark.functions.textstats import lang_id
    from inverted_index_spark.operators.clustering import dedup_survivors
    from inverted_index_spark.operators.dedup import dedup_exact, minhash_lsh_pairs

    from inverted_index_spark.functions.tokenizer import doc_length_expr

    sized = docs.withColumn("_nt", doc_length_expr(F.col(text_col))).where(
        (F.col("_nt") >= int(min_tokens)) & (F.col("_nt") <= int(max_tokens))
    ).drop("_nt")
    lid = lang_id(sized, id_col=id_col, text_col=text_col)
    kept_ids = lid.where(F.col("pred_lang").isin(list(langs))).select("doc_id")
    filtered = sized.join(
        kept_ids, on=sized[id_col].cast("long") == kept_ids["doc_id"], how="leftsemi"
    )
    exact = dedup_exact(filtered, id_col=id_col, text_col=text_col)
    pairs = minhash_lsh_pairs(
        exact, id_col=id_col, text_col=text_col, threshold=minhash_threshold
    )
    survivors = dedup_survivors(exact, pairs, id_col=id_col)
    if fractions is None:
        return survivors
    return stratified_sample(
        survivors, fractions, strata_col,
        id_col=id_col, seed=seed, default_fraction=default_fraction,
    )


def pack_sequences(
    docs: DataFrame,
    block_size: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, dl, offset, first_block, last_block): where each doc's
    tokens land when the whole corpus (doc_id order) is concatenated
    and cut into fixed ``block_size``-token training blocks. Token
    counts use the pinned index tokenizer, so packing, indexing, and
    the DuckDB oracle all agree. Empty docs occupy zero tokens; their
    (first_block == last_block) marks the cut point they sit at."""
    if block_size < 1:
        raise ValueError(f"block_size must be >= 1, got {block_size}")
    measured = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        doc_length_expr(F.col(text_col)).alias("dl"),
    )
    with_off = running_offsets(measured, "dl", ["doc_id"])
    b = int(block_size)
    return with_off.select(
        "doc_id",
        "dl",
        "offset",
        F.expr(f"offset div {b}").alias("first_block"),
        F.expr(f"(offset + greatest(dl, 1) - 1) div {b}").alias("last_block"),
    )


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int,
    overlap: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """RAG-style sliding-window chunking: split each doc's text into
    windows of ``chunk_tokens`` whitespace tokens with ``overlap``
    tokens shared between consecutive windows (stride = chunk_tokens -
    overlap), reconstructing chunk text from the original tokens.

    Returns (doc_id, chunk_idx, start_tok, n_tokens, chunk) — one row
    per window, deterministic. Window starts are 0, stride, 2*stride, …
    while start < token count; a doc shorter than one window yields
    exactly one (possibly short) chunk; an empty/whitespace doc yields
    one empty chunk (chunk provenance is total — every doc_id appears).

    Scale: pure JVM column expressions (split + sequence + transform +
    posexplode + slice + array_join) — no Python, no shuffle at all;
    chunking is embarrassingly parallel per input split, and the output
    inherits the input partitioning for downstream embed/index stages.
    Whitespace tokenization (not the index tokenizer) is deliberate:
    chunk text must reconstruct the ORIGINAL byte content for LLM
    consumption, so the splitter must be invertible."""
    if chunk_tokens < 1:
        raise ValueError(f"chunk_tokens must be >= 1, got {chunk_tokens}")
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(
            f"need 0 <= overlap < chunk_tokens, got overlap={overlap}"
        )
    stride = int(chunk_tokens) - int(overlap)
    c = int(chunk_tokens)
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    base = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.when(F.trim(F.col(text_col)) == "", F.array().cast("array<string>"))
        .otherwise(toks)
        .alias("toks"),
    ).select(
        "doc_id",
        "toks",
        F.expr(
            f"sequence(0, greatest(size(toks) - 1, 0), {stride})"
        ).alias("starts"),
    )
    return base.select(
        "doc_id",
        F.posexplode("starts").alias("chunk_idx", "start_tok"),
        F.col("toks"),
    ).select(
        "doc_id",
        "chunk_idx",
        F.col("start_tok").cast("long").alias("start_tok"),
        F.least(
            F.lit(c).cast("long"),
            (F.size("toks") - F.col("start_tok")).cast("long"),
        ).alias("n_tokens"),
        F.array_join(
            F.slice(F.col("toks"), F.col("start_tok") + 1, c), " "
        ).alias("chunk"),
    )
