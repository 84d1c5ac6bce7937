"""Index build — the reference's write path (W1..W12, SURVEY.md §2.1)
re-expressed as one declarative Spark job:

    tokenize (mapInPandas, Arrow)                        [host-side of W2]
    → bucket = doc_id // bucket_size                     [doc-range sharding]
    → groupBy(bucket).applyInPandas(encode_bucket)       [W2..W8 fused]
    → write parquet partitioned by bucket + docstats     [W9..W12]
    → manifest commit with lineage + metrics             [W10, north rule]

Why doc-range buckets: (a) a head Zipf term's postings split across
buckets, so no single ``(term)`` group — the bucket IS the
deterministic salt the north rule's skew language asks for; (b) one
row per (bucket, term) stays bounded (≤ bucket_size postings) no
matter how big the corpus — at 10^12 turns a global per-term row would
not fit anywhere; (c) query-side WAND parallelizes per bucket with a
cheap global top-k merge, because BM25 scores are bucket-independent.

The reference buffers Put() pairs in RAM and writes at Close
(single/single.go:139-153, 417-455); groupBy does the same dedup/sort
work shuffle-side with map-side partial aggregation for free.
"""

from __future__ import annotations

import time
import uuid

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from inverted_index_spark.functions.codec import DEFAULT_BLOCK, encode_varint
from inverted_index_spark.functions.tokenizer import doc_length_expr, tokenize
from inverted_index_spark.sources.store import (
    POSTINGS_SCHEMA,
    SegmentStore,
    dir_bytes,
    fingerprint_input,
    new_segment_id,
)

DEFAULT_BUCKET_SIZE = 1 << 16

# Parquet bloom filters on the dictionary column (round-4): sorted
# (bucket, term) row groups already prune by min/max RANGE, but a
# point/IN term lookup whose probe falls INSIDE a group's range and
# is absent still decodes the group — the bloom filter skips it
# (the reference's FST answers membership the same way). Applied to
# the postings and positions datasets; expected NDV sizes the bitset
# (~180 KB/row group at 100k — noise next to posting bytes at scale).
TERM_BLOOM_OPTS = {
    "parquet.bloom.filter.enabled#term": "true",
    "parquet.bloom.filter.expected.ndv#term": "100000",
}


class ErrDuplicateTerm(ValueError):
    """Reference parity: Put() of an already-present term
    (single/single.go:139-153)."""


class ErrEmptyIndex(ValueError):
    """Reference parity: Close() with no terms (single/single.go:119-123)."""


# ----------------------------------------------------------- encode stage ---


def encode_bucket_arrays(
    terms: np.ndarray,
    docs: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    bucket: int,
    block_size: int,
) -> pd.DataFrame:
    """Sorted (term, doc) arrays → one POSTINGS_SCHEMA row per term.

    Fully vectorized encode: ONE varint pass over the whole bucket for
    each of the three streams (docs-as-deltas with restarts at term
    and block starts, tfs, dls); the only Python loops build the
    per-term byte slices and per-block metadata dicts — O(terms) and
    O(blocks), not O(postings)."""
    n = len(terms)
    if n == 0:
        return pd.DataFrame({k: [] for k in POSTINGS_SCHEMA.fieldNames()})
    # term boundaries
    t_starts = np.concatenate(([0], np.flatnonzero(terms[1:] != terms[:-1]) + 1))
    t_ends = np.concatenate((t_starts[1:], [n]))
    t_lens = t_ends - t_starts
    # position of each row within its term → block restarts
    within = np.arange(n, dtype=np.int64) - np.repeat(t_starts, t_lens)
    restart = within % block_size == 0
    deltas = np.empty(n, dtype=np.uint64)
    du = docs.astype(np.uint64)
    deltas[0] = du[0]
    deltas[1:] = du[1:] - du[:-1]
    deltas[restart] = du[restart]
    p_buf, p_len = encode_varint(deltas)
    t_buf, t_len = encode_varint(tfs.astype(np.uint64))
    l_buf, l_len = encode_varint(dls.astype(np.uint64))
    p_csum = np.concatenate(([0], np.cumsum(p_len)))
    t_csum = np.concatenate(([0], np.cumsum(t_len)))
    l_csum = np.concatenate(([0], np.cumsum(l_len)))
    # global per-block stats via reduceat at restart positions
    b_starts = np.flatnonzero(restart)
    b_term = np.searchsorted(t_starts, b_starts, side="right") - 1
    b_ends = np.concatenate((b_starts[1:], [n]))
    # a block never crosses a term: clamp end to its term end
    b_ends = np.minimum(b_ends, t_ends[b_term])
    b_maxtf = np.maximum.reduceat(tfs, b_starts)
    b_mindl = np.minimum.reduceat(dls, b_starts)
    pm = memoryview(p_buf)
    tm = memoryview(t_buf)
    lm = memoryview(l_buf)
    out = {k: [] for k in POSTINGS_SCHEMA.fieldNames()}
    bi = 0
    n_blocks = len(b_starts)
    for ti in range(len(t_starts)):
        s, e = t_starts[ti], t_ends[ti]
        blocks = []
        while bi < n_blocks and b_starts[bi] < e:
            bs, be = b_starts[bi], b_ends[bi]
            blocks.append(
                {
                    "first_doc": int(docs[bs]),
                    "last_doc": int(docs[be - 1]),
                    "n": int(be - bs),
                    "max_tf": int(b_maxtf[bi]),
                    "min_dl": int(b_mindl[bi]),
                    "p_off": int(p_csum[bs] - p_csum[s]),
                    "t_off": int(t_csum[bs] - t_csum[s]),
                    "d_off": int(l_csum[bs] - l_csum[s]),
                }
            )
            bi += 1
        out["bucket"].append(bucket)
        out["term"].append(terms[s])
        out["df"].append(int(e - s))
        out["postings"].append(bytes(pm[p_csum[s] : p_csum[e]]))
        out["tfs"].append(bytes(tm[t_csum[s] : t_csum[e]]))
        out["dls"].append(bytes(lm[l_csum[s] : l_csum[e]]))
        out["blocks"].append(blocks)
        out["min_doc"].append(int(docs[s]))
        out["max_doc"].append(int(docs[e - 1]))
    return pd.DataFrame(out)


def _encode_bucket_pdf(pdf: pd.DataFrame, block_size: int) -> pd.DataFrame:
    """One doc-bucket's (doc_id, term, tf, dl) rows → one row per term.

    One stable sort + dedup of repeated (term, doc) pairs keeping the
    first tf (the reference sort-dedups values at close,
    single/single.go:230-256), then the vectorized bucket encoder.
    """
    pdf = pdf.sort_values(["term", "doc_id"], kind="mergesort")
    terms = pdf["term"].to_numpy()
    docs = pdf["doc_id"].to_numpy(dtype=np.int64)
    tfs = pdf["tf"].to_numpy(dtype=np.int64)
    dls = pdf["dl"].to_numpy(dtype=np.int64)
    bucket = int(pdf["bucket"].iloc[0])
    keep = np.ones(len(pdf), dtype=bool)
    if len(pdf) > 1:
        keep[1:] = ~((terms[1:] == terms[:-1]) & (docs[1:] == docs[:-1]))
    terms, docs, tfs, dls = terms[keep], docs[keep], tfs[keep], dls[keep]
    return encode_bucket_arrays(terms, docs, tfs, dls, bucket, block_size)


def encode_segment(
    tokens: DataFrame,
    bucket_size: int = DEFAULT_BUCKET_SIZE,
    block_size: int = DEFAULT_BLOCK,
) -> DataFrame:
    """tokens(doc_id, term, tf, dl) → postings rows (POSTINGS_SCHEMA).

    bucket = doc_id div bucket_size — INTEGER division kept long
    end-to-end: float division loses exactness past 2^53 and an int
    cast wraps past 2^31 buckets, both of which would silently break
    the disjoint-bucket invariant WAND and merge rely on at 10^12+.
    """
    bucketed = tokens.withColumn(
        "bucket", F.expr(f"cast(doc_id div {int(bucket_size)} as long)")
    )

    def enc(pdf: pd.DataFrame) -> pd.DataFrame:
        return _encode_bucket_pdf(pdf, block_size)

    return bucketed.groupBy("bucket").applyInPandas(enc, schema=POSTINGS_SCHEMA)


def encode_segment_fragments(
    tokens: DataFrame,
    bucket_size: int = DEFAULT_BUCKET_SIZE,
    block_size: int = DEFAULT_BLOCK,
) -> DataFrame:
    """SHUFFLE-FREE encode: each input partition encodes its own
    (bucket, term) fragment rows in place — the reference's actual
    ingest shape (one immutable index file per source file,
    /root/reference/README.md:9-11), where the merge pass, not the
    build, pays for consolidation.

    Contract: input partitions must hold DISJOINT doc_id sets (true for
    any sanely written corpus — file-per-range parquet, streaming
    micro-batches). A (bucket, term) pair then appears in ≤ one row PER
    INPUT PARTITION with disjoint docs; every read path already merges
    multi-row groups (query._decode_rows explodes then dedups, WAND
    `_term_handles` decode-merges), and one `merge_segments` pass
    rewrites fragments into the compact one-row-per-(bucket, term)
    layout. Trade-off vs :func:`encode_segment`: zero shuffle of the
    token stream (the single biggest data movement in the build — at
    10^12 turns that shuffle is petabyte-scale) against slower reads
    until compaction.

    Measured honestly: on local[32] at 1M turns this is SLOWER than the
    shuffled build (10.8s vs 7.5s) — a local shuffle never touches a
    network, so only the fragment overhead (per-partition pandas
    grouping, ~1.4× output rows) shows. The mode exists for the
    multi-executor case the north rule targets, where the token-stream
    shuffle is cross-machine traffic; pick per deployment.
    """
    bucketed = tokens.withColumn(
        "bucket", F.expr(f"cast(doc_id div {int(bucket_size)} as long)")
    ).select("bucket", "doc_id", "term", "tf", "dl")

    def enc_partition(batches):
        pdfs = [pdf for pdf in batches if len(pdf)]
        if not pdfs:
            return
        pdf = pd.concat(pdfs, ignore_index=True)
        for _, grp in pdf.groupby("bucket", sort=False):
            yield _encode_bucket_pdf(grp, block_size)

    return bucketed.mapInPandas(enc_partition, schema=POSTINGS_SCHEMA)


# ------------------------------------------------------------- doc lengths ---


def doc_lengths(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, dl) for every doc — including token-less ones, which
    still count toward N/avgdl (the oracle counts them too). Pure JVM
    column expression: no shuffle, no Python, no join."""
    return docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        doc_length_expr(F.col(text_col)).alias("dl"),
    )


# ------------------------------------------------------------------ build ---


def build_index_from_tokens(
    spark: SparkSession,
    tokens: DataFrame,
    docstats: DataFrame,
    store: SegmentStore,
    *,
    bucket_size: int = DEFAULT_BUCKET_SIZE,
    block_size: int = DEFAULT_BLOCK,
    build_id: str = "",
    chunk: int = -1,
    input_fingerprint: str = "",
    replaces: list[str] | None = None,
    empty_terms: list[str] | None = None,
    shuffle: bool = True,
    positions_df: DataFrame | None = None,
    texts_df: DataFrame | None = None,
    allow_negative_ids: bool = False,
    attach_deletes: tuple[str, int] | None = None,
) -> str:
    """Encode + write + commit one immutable segment. Returns segment_id.

    Raises ErrEmptyIndex when there are no terms at all (reference
    W12). ``empty_terms`` are terms Put() with zero postings — the
    reference still registers them in the FST so ReadTerms enumerates
    them while ReadValues stays empty (single/single.go:139-153;
    single_test.go:74-86): they become df=0 rows with empty binaries.
    """
    pinned = store.pinned_bucket_size()
    if pinned is not None and pinned != bucket_size:
        raise ValueError(
            f"store is pinned to bucket_size={pinned}; a segment with "
            f"bucket_size={bucket_size} would break the disjoint-bucket "
            "invariant (docs double-counted across segments at query time)"
        )
    t0 = time.time()
    segment_id = new_segment_id()
    seg_dir = store.seg_dir(segment_id)
    # shuffle=False → fragment encode (see encode_segment_fragments:
    # zero token-stream shuffle, requires doc-disjoint input partitions,
    # reads slower until a merge pass compacts)
    enc_fn = encode_segment if shuffle else encode_segment_fragments
    encoded = enc_fn(tokens, bucket_size, block_size)
    if empty_terms:
        zero_rows = [
            (-1, t, 0, b"", b"", b"", [], None, None)
            for t in sorted(set(empty_terms))
        ]
        encoded = encoded.unionByName(
            spark.createDataFrame(zero_rows, POSTINGS_SCHEMA)
        )
    # segment stats ride the WRITE job itself via Observation metrics —
    # zero extra read-back jobs on the commit path (the Amdahl-serial
    # share the round-1 scaling gate tripped on). HLL for the term
    # count; skew from per-(bucket,term) row dfs — the Zipf-head signal
    # without a groupBy(term) shuffle.
    from pyspark.sql import Observation

    obs = Observation(f"seg-{segment_id}")
    encoded = encoded.observe(
        obs,
        F.approx_count_distinct("term").alias("n_terms"),
        F.sum("df").alias("n_postings"),
        F.min("min_doc").alias("min_doc"),
        F.max("max_doc").alias("max_doc"),
        F.try_divide(F.max("df"), F.avg("df")).alias("skew"),
    )
    d_obs = Observation(f"doc-{segment_id}")
    docstats = docstats.select("doc_id", "dl").observe(
        d_obs, F.count("*").alias("n_docs"), F.sum("dl").alias("sum_dl")
    )
    # plain parquet clustered by bucket and sorted by term: row-group
    # min/max stats on (bucket, term) do the pruning (the reference's
    # FST/segment-index role); partitionBy dirs would break multi-
    # segment single-scan reads (conflicting partition roots).
    # NO repartition here: groupBy(bucket).applyInPandas already left
    # the rows hash-partitioned by bucket — re-exchanging the encoded
    # binary would double-shuffle the whole segment.
    # The two writes are independent datasets → run them as CONCURRENT
    # Spark jobs (thread-per-action): overlaps the driver-side parquet
    # commit protocol and job tails, which are the constant share the
    # scaling gate measures (Spark schedulers are thread-safe).
    import threading

    errs: list[BaseException] = []

    def _write(df: DataFrame, dest: str, options: dict | None = None) -> None:
        try:
            w = df.write.mode("overwrite")
            for k, v in (options or {}).items():
                w = w.option(k, v)
            w.parquet(dest)
        except BaseException as e:  # surface on the caller thread
            errs.append(e)

    t_post = threading.Thread(
        target=_write,
        args=(
            encoded.sortWithinPartitions("bucket", "term"),
            f"{seg_dir}/postings",
            TERM_BLOOM_OPTS,
        ),
    )
    t_doc = threading.Thread(target=_write, args=(docstats, f"{seg_dir}/docstats"))
    writers = [t_post, t_doc]
    if positions_df is not None:
        # optional positional artifact (operators.positions): encoded
        # occurrence streams land next to the postings, same bucket
        # sharding, third concurrent write job
        from inverted_index_spark.operators.positions import encode_positions_segment

        writers.append(
            threading.Thread(
                target=_write,
                args=(
                    encode_positions_segment(positions_df, bucket_size)
                    .sortWithinPartitions("bucket", "term"),
                    f"{seg_dir}/positions",
                    TERM_BLOOM_OPTS,
                ),
            )
        )
    if texts_df is not None:
        # optional doc store (doc_id, text): bucket-clustered like the
        # postings so text fetch for a result page prunes to the
        # buckets it touches; preserves per-turn text byte-for-byte
        # (the input_hint equality invariant, surfaced at query time
        # by Searcher.fetch_text)
        writers.append(
            threading.Thread(
                target=_write,
                args=(
                    texts_df.select(
                        F.col("doc_id").cast("long").alias("doc_id"),
                        F.col("text"),
                        F.expr(f"cast(doc_id div {int(bucket_size)} as long)").alias("bucket"),
                    ).sortWithinPartitions("bucket", "doc_id"),
                    f"{seg_dir}/docs",
                ),
            )
        )
    for t in writers:
        t.start()
    for t in writers:
        t.join()
    if errs:
        raise errs[0]
    agg = obs.get
    if not agg["n_terms"]:
        raise ErrEmptyIndex("refusing to commit an empty segment")
    if (
        not allow_negative_ids
        and agg["min_doc"] is not None
        and int(agg["min_doc"]) < 0
    ):
        # DOC ids are pinned to [0, 2^63-1] (LongType schema): a uint64
        # id ≥ 2^63 arrives wrapped negative and would silently break
        # the doc-id bucketing/hydration contract — reject loudly.
        # VALUE indexes (reference parity: any cmp.Ordered V incl. full
        # uint64, README.md:7) opt out via allow_negative_ids: the
        # round-5 codec encodes two's-complement bit patterns exactly
        # and compares in signed-long order, and build_value_index's
        # unsigned=True maps uint64 order onto that signed order by
        # flipping the sign bit.
        raise ValueError(
            f"negative doc_id {int(agg['min_doc'])} in segment: doc ids "
            "must be in [0, 2^63-1] (uint64 ids >= 2^63 are not "
            "representable in this engine's LongType postings schema)"
        )
    skew = agg["skew"]
    dstats = d_obs.get
    elapsed = max(time.time() - t0, 1e-9)
    store.commit_segment(
        segment_id,
        {
            "n_terms": int(agg["n_terms"]),
            "n_postings": int(agg["n_postings"] or 0),
            "n_docs": int(dstats["n_docs"]),
            "sum_dl": int(dstats["sum_dl"] or 0),
            "bytes": dir_bytes(seg_dir),
            # None only when every term has zero postings (empty_terms)
            "min_doc": int(agg["min_doc"] if agg["min_doc"] is not None else 0),
            "max_doc": int(agg["max_doc"] if agg["max_doc"] is not None else -1),
            "bucket_size": int(bucket_size),
            "build_id": build_id or segment_id,
            "chunk": chunk,
            "input_fingerprint": input_fingerprint,
            "terms_per_sec": float(agg["n_terms"]) / elapsed,
            "skew_ratio": float(skew or 1.0),
        },
        replaces=replaces,
        attach_deletes=attach_deletes,
    )
    return segment_id


def build_index(
    spark: SparkSession,
    docs: DataFrame,
    store: SegmentStore,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    bucket_size: int = DEFAULT_BUCKET_SIZE,
    block_size: int = DEFAULT_BLOCK,
    build_id: str = "",
    chunk: int = -1,
    input_fingerprint: str = "",
    shuffle: bool = True,
    positions: bool = False,
    store_text: bool = False,
    store_text_col: str | None = None,
    attach_deletes: tuple[str, int] | None = None,
) -> str:
    """docs(doc_id, text) → one committed segment (entry point A,
    SURVEY.md §3.1). ``shuffle=False`` selects the fragment encode
    (zero token shuffle; input partitions must hold disjoint doc sets).
    ``positions=True`` additionally writes the positional artifact
    (operators.positions) enabling phrase_match over this store.
    ``store_text=True`` additionally writes the (doc_id, text) doc
    store so results can be hydrated back to text (Searcher.fetch_text).
    ``store_text_col`` overrides WHICH column the doc store persists —
    an analyzer pipeline indexes a transformed column but should
    hydrate the ORIGINAL text (defaults to ``text_col``).

    Both the token stream and the doc lengths are pure JVM column
    expressions over the source scan (functions.tokenizer): two cheap
    codegen'd passes over (doc_id, text), ZERO Python in the hot path,
    no persist, no groupBy(doc_id), no join — dl = size(tokens) reads
    straight off the same regex, and token-less docs get dl=0 rows for
    free (they still count toward N/avgdl, matching the oracle).
    """
    tokens = tokenize(docs, id_col=id_col, text_col=text_col)
    dstats = doc_lengths(docs, id_col=id_col, text_col=text_col)
    pos_df = None
    if positions:
        from inverted_index_spark.operators.positions import position_tokens

        pos_df = position_tokens(docs, id_col=id_col, text_col=text_col)
    texts_df = None
    if store_text:
        texts_df = docs.select(
            F.col(id_col).cast("long").alias("doc_id"),
            F.col(store_text_col or text_col).alias("text"),
        )
    return build_index_from_tokens(
        spark, tokens, dstats, store,
        bucket_size=bucket_size, block_size=block_size,
        build_id=build_id, chunk=chunk, input_fingerprint=input_fingerprint,
        shuffle=shuffle, positions_df=pos_df, texts_df=texts_df,
        attach_deletes=attach_deletes,
    )


def reindex_docs(
    spark: SparkSession,
    docs: DataFrame,
    store: SegmentStore,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    **build_kw,
) -> str:
    """Atomic upsert: re-add every doc in ``docs`` with new content,
    superseding any copy indexed earlier — Lucene updateDocument /
    Iceberg MERGE semantics, an extension over the insert-only
    reference (its segments never change; multiple/multiple_index.go
    only adds and merges files).

    Mechanics: stage a delete batch for the incoming doc_ids
    (store.stage_delete_batch — parquet written, manifest untouched),
    build the new segment, and commit BOTH in one manifest transaction
    at the same generation (commit_segment attach_deletes). Because
    delete batches are generation-scoped (they tombstone only segments
    committed strictly before them), every older copy dies and the
    paired segment's rows survive — readers see either the old corpus
    or the new one, never a mix and never a missing doc. On build
    failure the staged parquet is dropped; a crash between stage and
    commit leaves only an invisible orphan dir.

    ``bucket_size`` defaults to the store's pinned size when present
    (a reindex can never introduce a new bucket width)."""
    build_kw.setdefault(
        "bucket_size", store.pinned_bucket_size() or DEFAULT_BUCKET_SIZE
    )
    staged = store.stage_delete_batch(
        spark, docs.select(F.col(id_col).cast("long").alias("doc_id"))
    )
    try:
        return build_index(
            spark, docs, store, id_col=id_col, text_col=text_col,
            attach_deletes=staged, **build_kw,
        )
    except BaseException:
        if staged is not None:
            store.drop_staged_delete_batch(staged[0])
        raise


def build_value_index(
    spark: SparkSession,
    rows: DataFrame,
    store: SegmentStore,
    term_col: str,
    value_col: str,
    *,
    bucket_size: int = DEFAULT_BUCKET_SIZE,
    block_size: int = DEFAULT_BLOCK,
    build_id: str = "",
    unsigned: bool = False,
    docstats: DataFrame | None = None,
) -> str:
    """Generic ordered-V indexing: term → sorted unique VALUES, where
    the value is any orderable long — the reference's headline use
    case beyond doc ids is uint32/uint64 TIMESTAMPS
    (/root/reference/README.md:7,28; codecs single/segment.go:38-84).
    E.g. ``build_value_index(spark, events, store, "event_type",
    unix_micros(ts))`` indexes event types by occurrence time;
    ``read_values(types, t0, t1)`` is then a time-range scan with the
    same block pruning as doc-id ranges. tf/dl are set to 1 (values
    carry no BM25 semantics; R5/R10/R11 are the query surface).

    ``unsigned=True`` (round-5, full-uint64 reference parity): the long
    column is treated as the WRAPPED two's-complement image of a
    uint64. Values are stored sign-bit-flipped (``v XOR 2^63``), which
    maps uint64 order onto the engine's signed-long order exactly, so
    sorting, bucketing, block pruning, and range reads all stay
    correct across the 2^63 boundary. Query through
    ``operators.query.read_values_unsigned`` (same flip on the bounds,
    inverse flip on the results — you get your wrapped longs back).
    """
    val = F.col(value_col).cast("long")
    if unsigned:
        val = val.bitwiseXOR(F.lit(-(1 << 63)))
    tokens = rows.select(
        F.col(term_col).cast("string").alias("term"),
        val.alias("doc_id"),
        F.lit(1).alias("tf"),
        F.lit(1).cast("long").alias("dl"),
    ).where(F.col("term").isNotNull() & F.col("doc_id").isNotNull())
    # value-index docstats are the DISTINCT indexed values (dl=1 each).
    # Deriving them from ``tokens`` re-runs the whole (term, value)
    # production a second time — callers whose value stream is an
    # expensive explode (e.g. the trigram index: every character 3-gram
    # of the corpus) pass an equivalent ``docstats`` computed WITHOUT
    # the explode (round-6, guide §1.2: don't compute things twice).
    if docstats is None:
        docstats = tokens.select("doc_id").distinct()
    dstats = docstats.select(
        F.col("doc_id").cast("long").alias("doc_id")
    ).withColumn("dl", F.lit(1).cast("long"))
    return build_index_from_tokens(
        spark, tokens, dstats, store,
        bucket_size=bucket_size, block_size=block_size, build_id=build_id,
        allow_negative_ids=unsigned,
    )


def build_field_indexes(
    spark: SparkSession,
    docs: DataFrame,
    root: str,
    fields: list[str],
    id_col: str = "doc_id",
    bucket_size: int = DEFAULT_BUCKET_SIZE,
) -> dict:
    """One index per metadata FIELD (Lucene fielded search): the
    field's value is indexed as that store's text, so ``lang:en``
    becomes a term read against the (tiny) lang index — never a
    documents scan. Stores land under ``root/field=<name>``; pass the
    returned dict as ``evaluate(field_stores=...)`` /
    ``parse_query('lang:en spark')``. A field store is just a normal
    SegmentStore — merge/cleanup/streaming all apply."""
    import os

    stores = {}
    for fname in fields:
        store = SegmentStore(os.path.join(root, f"field={fname}"))
        narrow = docs.select(
            F.col(id_col).cast("long").alias("doc_id"),
            F.col(fname).cast("string").alias("text"),
        )
        build_index(spark, narrow, store, bucket_size=bucket_size)
        stores[fname] = store
    return stores


class SegmentWriter:
    """Reference-API compat shim (NewInvertedIndexUnit/Put/Close,
    single/single.go:790-818,139-153,115-135) for direct posting
    injection — FIXTURES.md §A micro cases bypass the tokenizer.

    Values need not be pre-sorted or unique: the close-time pipeline
    sort-dedups exactly like sliceSortUnique (single/single.go:230-256).
    """

    def __init__(self, spark: SparkSession, store: SegmentStore, **build_kw):
        self.spark = spark
        self.store = store
        self.build_kw = build_kw
        self._terms: dict[str, list[int]] = {}

    def put(self, term: str, values: list[int]) -> None:
        if term in self._terms:
            raise ErrDuplicateTerm(term)
        self._terms[term] = list(values)

    def close(self) -> str:
        if not self._terms:
            raise ErrEmptyIndex("no terms written")
        rows = [
            (term, int(v), 1, 1)
            for term, vals in self._terms.items()
            for v in vals
        ]
        # terms Put() with zero postings still register (reference keeps
        # them in the FST: ReadTerms sees them, ReadValues stays empty —
        # single_test.go:74-86)
        empty_terms = [t for t, vals in self._terms.items() if not vals]
        tokens = self.spark.createDataFrame(rows, "term string, doc_id long, tf int, dl int")
        all_docs = sorted({d for vals in self._terms.values() for d in vals})
        dstats = self.spark.createDataFrame(
            [(d, 1) for d in all_docs], "doc_id long, dl long"
        )
        return build_index_from_tokens(
            self.spark, tokens, dstats, self.store,
            empty_terms=empty_terms, **self.build_kw
        )


def build_index_resumable(
    spark: SparkSession,
    docs: DataFrame,
    store: SegmentStore,
    *,
    n_chunks: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
    bucket_size: int = DEFAULT_BUCKET_SIZE,
    block_size: int = DEFAULT_BLOCK,
    build_id: str | None = None,
    positions: bool = False,
    store_text: bool = False,
) -> list[str]:
    """Checkpointed build: the corpus is split into n_chunks disjoint
    doc-bucket classes (bucket % n_chunks); each chunk commits its own
    segment + manifest row idempotently, so a restarted build skips
    chunks whose rows already exist (north-rule resumability).
    ``positions`` / ``store_text`` propagate to every chunk (artifact
    coverage must be uniform across a store).

    Returns the segment ids covering the corpus (pre-existing + new).
    """
    build_id = build_id or f"build-{uuid.uuid4().hex[:8]}"
    seg_ids: list[str] = []
    for chunk in range(n_chunks):
        m = store.read_manifest()
        if len(m):
            hit = m[(m["build_id"] == build_id) & (m["chunk"] == chunk)]
            if len(hit):
                seg_ids.append(hit["segment_id"].iloc[0])
                continue
        part = docs.where(
            F.expr(f"(cast({id_col} as long) div {int(bucket_size)}) % {int(n_chunks)}")
            == F.lit(chunk)
        )
        fp = fingerprint_input({"build_id": build_id, "chunk": chunk})
        try:
            seg_ids.append(
                build_index(
                    spark, part, store,
                    id_col=id_col, text_col=text_col,
                    bucket_size=bucket_size, block_size=block_size,
                    build_id=build_id, chunk=chunk, input_fingerprint=fp,
                    positions=positions, store_text=store_text,
                )
            )
        except ErrEmptyIndex:
            continue  # a chunk with no docs is legal
    return seg_ids
