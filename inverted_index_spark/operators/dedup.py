"""Deduplication operators for training-data pipelines (task rubric).

Five tiers, cheapest to most semantic — each is the idiomatic Spark
shape for 100 TB:

  exact_duplicates     hash-groupBy on a normalized fingerprint
                       (one shuffle on a short key)
  minhash_lsh_pairs    shingle → minhash signature → band buckets →
                       self-join within buckets (candidate generation
                       never compares all pairs)
  simhash_buckets      64-bit simhash; Hamming-near dups collide on
                       rotated prefix bands
  ngram_jaccard        exact Jaccard on token n-gram sets for
                       candidate pairs (verification stage after LSH)
  embedding_near_dups  cosine ≥ τ pairs via LSH-bucketed join
                       (see operators.similarity)

Hash functions are md5-derived so the DuckDB oracle can reproduce
them bit-for-bit (md5 exists on both engines); numpy work happens
only in Arrow-batched UDFs.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from inverted_index_spark.functions.textstats import fingerprints, tokens_col

MERSENNE_P = (1 << 61) - 1
_U = np.uint64


def _fold61(x: np.ndarray) -> np.ndarray:
    """One Mersenne fold: x < 2^64 → (x mod p) + k·p with result
    < 2^61 + 8 (p = 2^61-1, so 2^61 ≡ 1). Pure shift/mask/add — no
    integer division."""
    return (x & _U(MERSENNE_P)) + (x >> _U(61))


def _mulmod61(a: np.ndarray, x: np.ndarray) -> np.ndarray:
    """Exact (a·x) mod (2^61-1) for uint64 arrays, a < 2^61, x < 2^64.

    128-bit product via 32-bit limb split — every intermediate stays
    below 2^64, so the universal-hash property actually holds (round-2
    fix: the previous single multiply wrapped mod 2^64 first).

    Round-6 (guide §1/§4: the minhash kernel is the signatures hot
    spot, 85% of kernel time was uint64 ``%``): all reductions use
    Mersenne folding (2^61 ≡ 1 mod p → x mod p = (x & p) + (x >> 61),
    iterated) instead of integer division. Bit-identical to the old
    modulo chain (hypothesis + edge-case tested), ~2x on the kernel.

    Overflow audit (every value < 2^64): a1 < 2^29 ⇒ a1·x1 < 2^61,
    shifted by 3 (2^64 ≡ 8) < 2^64; a0·x1 < 2^64 folds to < 2^61+8,
    plus a1·x0 < 2^61 keeps mid < 2^62; the final sum is
    < (2^61+8) + 2^33 + 2^61 + (2^61+8) < 2^63."""
    mask32 = _U(0xFFFFFFFF)
    a0, a1 = a & mask32, a >> _U(32)
    x0, x1 = x & mask32, x >> _U(32)
    p = _U(MERSENNE_P)
    mid = a1 * x0 + _fold61(a0 * x1)             # (a·x)'s 2^32 limb, < 2^62
    t = (
        _fold61((a1 * x1) << _U(3))              # 2^64 limb: hi·8
        + (mid >> _U(29))                        # mid·2^32 = m1·2^61 + m0·2^32
        + ((mid & _U((1 << 29) - 1)) << _U(32))
        + _fold61(a0 * x0)
    )
    t = _fold61(t)
    return np.where(t >= p, t - p, t)


def _spread(df: DataFrame) -> DataFrame:
    """Ensure the per-row hashing kernels can use every core: a
    single-file parquet input arrives as ONE partition and would run
    the whole md5/minhash pass single-task. Repartitions (round-robin
    on the raw rows, BEFORE tokenization so only (id, text) shuffles)
    only when the input has fewer partitions than the cluster's
    default parallelism — at 100 TB inputs have thousands of
    partitions and this is a no-op."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def h64_md5_le(col):
    """Pinned 64-bit string hash as a PURE JVM column expression:
    signed little-endian first-8-md5-bytes — bit-identical to DuckDB's
    ``md5_number_upper`` (oracle side) and to Python's
    ``int.from_bytes(md5(s).digest()[:8], 'little')`` (parity twin
    :func:`_token_hash64`). Spark side: md5 hex byte-pairs reversed,
    then ``conv(…, 16, -10)`` → signed long. Used by minhash shingles,
    simhash tokens, and winnowing k-grams, so ALL dedup hashing runs in
    whole-stage codegen — no per-token Python anywhere (round-3 fix:
    minhash/simhash previously hashed per token in Python hashlib)."""
    le_hex = F.concat(*[F.substring(F.md5(col), 15 - 2 * i, 2) for i in range(8)])
    return F.conv(le_hex, 16, -10).cast("long")


def _h64_from_md5_hex(m):
    """signed little-endian first-8-bytes from a PRE-COMPUTED md5 hex
    column — the md5 is evaluated once by the caller (see
    :func:`h64_md5_le_arr`)."""
    le_hex = F.concat(*[F.substring(m, 15 - 2 * i, 2) for i in range(8)])
    return F.conv(le_hex, 16, -10).cast("long")


def h64_md5_le_arr(arr):
    """:func:`h64_md5_le` mapped over a string ARRAY column.

    Round-6 (guide §2.3/§4): inside higher-order-function lambdas
    (CodegenFallback, interpreted) common-subexpression elimination
    does not apply, so the single-transform form evaluated ``md5``
    once per substring — 8x per element. Hashing the array in two
    passes (md5 once per element, then the byte-reversal conv) keeps
    results bit-identical and drops the redundant digests."""
    return F.transform(F.transform(arr, F.md5), _h64_from_md5_hex)


def _shingles_col(toks_col, n: int):
    """Token n-gram shingle strings, in-row (JVM image of
    :func:`_shingles`): fewer than n tokens → one shingle of the whole
    doc; callers must pre-filter empty-token docs."""
    return F.when(
        F.size(toks_col) < n, F.array(F.concat_ws(" ", toks_col))
    ).otherwise(
        F.transform(
            F.sequence(F.lit(0), F.size(toks_col) - n),
            lambda i: F.concat_ws(" ", F.slice(toks_col, i + 1, n)),
        )
    )


def _expand_group_pairs(
    df: DataFrame,
    key_cols: list[str],
    doc_col: str = "doc_id",
    cap: int | None = None,
    dedup_within_partition: bool = False,
) -> DataFrame:
    """(a, b) with a < b for every within-group pair of ``doc_col``
    values sharing ``key_cols`` — the LSH-bucket candidate generation,
    as ONE hash exchange + an Arrow-batched numpy expansion instead of
    the sizes-groupBy + sizes-join + self-join chain (round-6, guide
    §2.4: three exchanges and two join builds over the full banded set
    collapse into one exchange; the pair set is identical).

    ``cap``: groups larger than ``cap`` emit a STAR around the group's
    min doc instead of all pairs (the hot-bucket skew guard — O(B) per
    hot bucket, preserving union-find connectivity). Pairs may repeat
    across groups exactly like the join emitted them (callers dedup or
    count, same as before).

    Partition contract: rows are hash-repartitioned on ``key_cols`` so
    each group is wholly in one partition; the kernel concatenates its
    partition's batches before grouping (a group split across Arrow
    batches would silently lose cross-batch pairs)."""

    def expand(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pdfs = [p for p in batches if len(p)]
        if not pdfs:
            return
        pdf = pd.concat(pdfs, ignore_index=True) if len(pdfs) > 1 else pdfs[0]
        pdf = pdf.sort_values([*key_cols, doc_col], kind="mergesort")
        doc = pdf[doc_col].to_numpy(np.int64)
        n = len(pdf)
        new = np.zeros(n, dtype=bool)
        new[0] = True
        for kc in key_cols:
            k = pdf[kc].to_numpy()
            new[1:] |= k[1:] != k[:-1]
        seg_start = np.flatnonzero(new)
        seg_len = np.diff(np.append(seg_start, n))
        row_seg_start = np.repeat(seg_start, seg_len)
        within = np.arange(n, dtype=np.int64) - row_seg_start
        row_len = np.repeat(seg_len, seg_len)
        normal = row_len <= cap if cap is not None else np.ones(n, dtype=bool)
        counts = np.where(normal, within, 0)
        total = int(counts.sum())
        if total:
            out_start = np.cumsum(counts) - counts
            a_pos = (
                np.arange(total, dtype=np.int64)
                - np.repeat(out_start, counts)
                + np.repeat(row_seg_start, counts)
            )
            a, b = doc[a_pos], np.repeat(doc, counts)
        else:
            a = b = np.zeros(0, dtype=np.int64)
        hot = ~normal & (within > 0)  # min doc (pos 0, sorted) is the rep
        if hot.any():
            a = np.concatenate([a, doc[row_seg_start[hot]]])
            b = np.concatenate([b, doc[hot]])
        if len(a):
            if dedup_within_partition:
                # callers that dropDuplicates afterwards (minhash,
                # simhash) shuffle fewer rows when the same pair from
                # several co-located buckets collapses here first;
                # NEVER set for multiplicity-counting callers (winnow)
                order = np.lexsort((b, a))
                a, b = a[order], b[order]
                keep = np.ones(len(a), dtype=bool)
                keep[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
                a, b = a[keep], b[keep]
            yield pd.DataFrame({"a": a, "b": b})

    return df.repartition(*key_cols).mapInPandas(expand, schema="a long, b long")


# ------------------------------------------------------------------ exact ---


def exact_duplicates(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(fp, n_dups, keep_id) per duplicate group (n_dups ≥ 2): the
    classic hash-groupBy exact dedup; keep_id = min doc_id survives."""
    fp = fingerprints(docs, id_col, text_col)
    return (
        fp.groupBy("fp")
        .agg(F.count("*").alias("n_dups"), F.min("doc_id").alias("keep_id"))
        .where(F.col("n_dups") >= 2)
    )


def dedup_exact(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """The corpus with exact duplicates removed (keep min doc_id).
    Window-free: groupBy(fp).min + semi-join back, both shuffles on fp."""
    fp = fingerprints(docs, id_col, text_col)
    keep = fp.groupBy("fp").agg(F.min("doc_id").alias("_keep_id"))
    return docs.join(
        keep.select("_keep_id"),
        on=docs[id_col].cast("long") == keep["_keep_id"],
        how="leftsemi",
    )


# ---------------------------------------------------------------- minhash ---


def _token_hash64(tokens: pd.Series) -> list[np.ndarray]:
    """64-bit string hash = little-endian first 8 md5 digest bytes —
    the pure-Python PARITY TWIN of :func:`h64_md5_le` (pinned to
    DuckDB's ``md5_number_upper``). Kept OUT of the hot path: the
    engine hashes in JVM codegen; this exists for tests that pin the
    two implementations together."""
    import hashlib

    out = []
    for toks in tokens:
        hs = np.fromiter(
            (
                int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "little")
                for t in toks
            ),
            dtype=np.uint64,
            count=len(toks),
        )
        out.append(hs)
    return out


def _shingles(toks: list, n: int) -> list[str]:
    if len(toks) < n:
        return [" ".join(toks)] if toks else []
    return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]


def minhash_signatures(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    shingle_n: int = 3,
    seed: int = 42,
) -> DataFrame:
    """(doc_id, sig array<long>) — minhash over token n-gram shingles.

    h_i(x) = (a_i·x + b_i) mod p, p = 2^61-1, computed EXACTLY
    (128-bit limb multiply, :func:`_mulmod61`) over md5-derived 64-bit
    shingle hashes; (a_i, b_i) drawn from a seeded rng so signatures
    are deterministic across runs/partitionings AND reproducible by
    the DuckDB oracle (HUGEINT math + md5_number_upper).

    Shingle construction AND hashing are JVM column expressions
    (:func:`h64_md5_le` — whole-stage codegen, zero per-token Python);
    the Arrow kernel only does the (a·x+b) min-reduction, vectorized
    across ALL docs in the batch at once (chunked `minimum.reduceat`,
    not a per-doc matrix loop).
    """
    rng = np.random.default_rng(seed)
    a = rng.integers(1, MERSENNE_P, size=num_hashes, dtype=np.uint64)
    b = rng.integers(0, MERSENNE_P, size=num_hashes, dtype=np.uint64)

    narrow = _spread(docs.select(F.col(id_col), F.col(text_col))).select(
        F.col(id_col).cast("long").alias("doc_id"),
        tokens_col(F.col(text_col)).alias("toks"),
    ).where(F.size("toks") > 0)
    hashed = narrow.select(
        "doc_id",
        h64_md5_le_arr(_shingles_col(F.col("toks"), shingle_n)).alias("hs"),
    )
    # chunk bound for the (num_hashes × shingles) work matrix: keeps
    # each _mulmod61 temporary ~2 MB. Measured (local[32], 270k
    # shingles): 2-8k-shingle chunks run the kernel in ~1s; 32k chunks
    # take >20s inside Python workers — every 16 MB temporary is a
    # fresh mmap → first-touch page faults dominate the arithmetic.
    chunk = max((1 << 18) // max(num_hashes, 1), 512)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        p = _U(MERSENNE_P)
        for pdf in batches:
            if not len(pdf):
                continue
            arrs = [np.asarray(h, dtype=np.int64) for h in pdf["hs"]]
            lens = np.fromiter((len(h) for h in arrs), dtype=np.int64, count=len(arrs))
            bounds = np.concatenate(([0], np.cumsum(lens)))
            all_h = np.concatenate(arrs).view(np.uint64)
            sig_parts = []
            d0 = 0
            n_docs = len(arrs)
            while d0 < n_docs:
                d1 = d0 + 1
                while d1 < n_docs and bounds[d1 + 1] - bounds[d0] <= chunk:
                    d1 += 1
                h = all_h[bounds[d0] : bounds[d1]]
                # (m + b) mod p without division: both < p ⇒ sum < 2p
                vals = _mulmod61(a[:, None], h[None, :]) + b[:, None]
                np.subtract(vals, p, out=vals, where=vals >= p)
                rel = (bounds[d0:d1] - bounds[d0]).astype(np.int64)
                sig_parts.append(
                    np.minimum.reduceat(vals, rel, axis=1).astype(np.int64)
                )
                d0 = d1
            sigs = np.concatenate(sig_parts, axis=1).T  # (n_docs, num_hashes)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy(dtype=np.int64),
                    "sig": pd.Series(list(sigs), dtype="object"),
                }
            )

    return hashed.mapInPandas(run, schema="doc_id long, sig array<long>")


def minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    threshold: float = 0.6,
    seed: int = 42,
    hot_bucket_cap: int = 10_000,
) -> DataFrame:
    """(a, b, est_jaccard) near-duplicate candidate pairs.

    Banding: rows r = num_hashes/bands; two docs collide if any band's
    rows agree — the standard S-curve. The self-join runs within band
    buckets only (shuffle key = (band, band_hash)); est_jaccard = mean
    signature agreement; pairs below threshold are dropped.

    band_hash = md5 of the comma-joined slice (identical in DuckDB, so
    the oracle reproduces the exact candidate set — Spark's F.hash is
    murmur3 and engine-private).

    Skew guard (round-2 hardening): a bucket of B near-identical docs
    would emit B²/2 pairs; buckets larger than ``hot_bucket_cap`` emit
    a STAR instead — every member pairs with the bucket's min doc_id —
    keeping pair generation O(B) per hot bucket while preserving
    connectivity for union-find style dedup. Buckets at test/oracle
    scale never hit the cap, so results are unchanged there.

    Plan shape (round-5 rework, round-6 tightened): signatures are
    materialized ONCE (localCheckpoint, the lazy-API-safe persist —
    see corpus.py), banding carries only NARROW (doc_id, band,
    band_hash) rows, candidate pairs come from ONE hash exchange on
    (band, band_hash) + the numpy expansion kernel
    (:func:`_expand_group_pairs` — round-6; replaces the sizes
    groupBy + sizes join + bucket self-join), pairs are deduped while
    still narrow, and the two 64-long signature arrays join back in
    only for the one agreement evaluation per UNIQUE pair (zip_with is
    CodegenFallback — interpreted per row — so scoring runs once per
    unique pair, never inside a join condition).
    """
    from pyspark import StorageLevel

    rows = num_hashes // bands
    sig = minhash_signatures(docs, id_col, text_col, num_hashes, shingle_n, seed)
    # three consumers (banding + the two score-time joins) would each
    # re-run the shingle+minhash kernel; localCheckpoint, NOT persist —
    # a lazy API can never unpersist (leaked CacheManager entry), while
    # checkpoint blocks are freed when the RDD is GC'd. At cluster
    # scale the blocks are n_docs × ~8·num_hashes bytes, distributed,
    # DISK_ONLY — the same order as ONE of the wide exchanges this
    # rework deletes.
    sig = sig.localCheckpoint(eager=False, storageLevel=StorageLevel.DISK_ONLY)
    banded = sig.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda i: F.md5(
                    F.concat_ws(
                        ",",
                        F.transform(
                            F.slice("sig", i * rows + 1, rows),
                            lambda x: x.cast("string"),
                        ),
                    )
                ),
            )
        ).alias("band", "band_hash"),
    )
    # candidate pairs per (band, band_hash) bucket via the one-exchange
    # expansion kernel (round-6; previously a sizes groupBy + sizes
    # join + self-join — three exchanges over the full banded set and
    # two hash-join builds, measured ~3.5 s of the 120k-turn bench row
    # on their own). Hot buckets emit the same min-doc star as before.
    cand = _expand_group_pairs(
        banded, ["band", "band_hash"], "doc_id", cap=hot_bucket_cap,
        dedup_within_partition=True,
    ).dropDuplicates(["a", "b"])
    # signatures rejoin AFTER the dedup, so agreement is evaluated
    # exactly once per unique candidate pair. SHUFFLE_HASH with the
    # pair side as build (round-6, guide §3.1): without the hint the
    # planner mis-estimated the checkpointed signature scan as
    # broadcastable and collected the WHOLE signature table to the
    # driver twice — fine at 120k docs, catastrophic at corpus scale;
    # the shuffled hash join moves each side once and builds on the
    # (typically far smaller, partition-bounded) candidate side.
    # Measured interleaved at 120k turns: 4.9-9.9 s -> 4.1-5.2 s for
    # the score stage, identical pair set.
    cand = cand.hint("SHUFFLE_HASH").join(
        sig.select(F.col("doc_id").alias("a"), F.col("sig").alias("sig_a")), "a"
    )
    cand = cand.hint("SHUFFLE_HASH").join(
        sig.select(F.col("doc_id").alias("b"), F.col("sig").alias("sig_b")), "b"
    )

    # Arrow-vectorized agreement: zip_with/filter/size is
    # CodegenFallback (interpreted, ~200 µs/row measured — it tripled
    # the whole operator's wall time when Catalyst additionally pushed
    # it into a join condition); the pandas_udf scores a whole batch
    # with one (n, num_hashes) numpy compare.
    @pandas_udf("double")
    def _agree_frac(sa: pd.Series, sb: pd.Series) -> pd.Series:
        if not len(sa):
            return pd.Series(dtype="float64")
        mat_a = np.stack(sa.to_numpy())
        mat_b = np.stack(sb.to_numpy())
        return pd.Series((mat_a == mat_b).sum(axis=1) / mat_a.shape[1])

    return (
        cand.withColumn("est_jaccard", _agree_frac("sig_a", "sig_b"))
        .where(F.col("est_jaccard") >= threshold)
        .select("a", "b", "est_jaccard")
    )


# ---------------------------------------------------------------- simhash ---


def simhash(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, simhash) — 64-bit simhash over token md5 hashes with tf
    weights. Token hash = little-endian first 8 md5 bytes (≡ DuckDB
    md5_number_upper, so the SQL oracle reproduces it), computed by
    the JVM (:func:`h64_md5_le`, whole-stage codegen — round-3: no
    per-token Python md5); the Arrow kernel keeps only the bit-vote
    matrix. tf weights come from counting equal HASHES rather than
    equal tokens — identical votes, since votes add linearly per
    token and equal tokens hash equally."""
    narrow = _spread(docs.select(F.col(id_col), F.col(text_col))).select(
        F.col(id_col).cast("long").alias("doc_id"),
        tokens_col(F.col(text_col)).alias("toks"),
    ).where(F.size("toks") > 0)
    hashed = narrow.select(
        "doc_id", h64_md5_le_arr(F.col("toks")).alias("hs")
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bit_idx = np.arange(64, dtype=np.uint64)
        pow2 = np.uint64(1) << bit_idx
        for pdf in batches:
            ids, out = [], []
            for doc_id, hs_raw in zip(pdf["doc_id"], pdf["hs"]):
                hs_all = np.asarray(hs_raw, dtype=np.int64).view(np.uint64)
                if not len(hs_all):
                    continue
                hs, counts = np.unique(hs_all, return_counts=True)
                bits = ((hs[:, None] >> bit_idx[None, :]) & np.uint64(1)).astype(np.int64)
                votes = ((bits * 2 - 1) * counts[:, None]).sum(axis=0)
                shu = int(pow2[votes > 0].sum(dtype=np.uint64))
                ids.append(doc_id)
                # explicit two's-complement reinterpretation (bit 63 set
                # → negative long), matching h64-signed space
                out.append(shu - (1 << 64) if shu >= (1 << 63) else shu)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "simhash": pd.Series(out, dtype="int64"),
                }
            )

    return hashed.mapInPandas(run, schema="doc_id long, simhash long")


def simhash_chunk_bounds(max_hamming: int, bands: int | None) -> list[tuple[int, int]]:
    """(offset, width) per band chunk. bands defaults to
    max_hamming + 1 — the smallest count for which the pigeonhole
    guarantee holds (a pair ≤ max_hamming bits apart MUST agree on at
    least one chunk). Explicit bands ≤ max_hamming is a contract
    violation and raises (round-2 fix: the previous default silently
    lost recall for max_hamming ≥ bands)."""
    if bands is None:
        bands = max_hamming + 1
    if not 1 <= bands <= 64:
        raise ValueError(f"bands must be in [1, 64], got {bands}")
    if max_hamming >= bands:
        raise ValueError(
            f"pigeonhole guarantee needs max_hamming < bands "
            f"(got max_hamming={max_hamming}, bands={bands})"
        )
    base, rem = divmod(64, bands)
    widths = [base + 1] * rem + [base] * (bands - rem)
    bounds, off = [], 0
    for w in widths:
        bounds.append((off, w))
        off += w
    return bounds


def simhash_near_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    bands: int | None = None,
) -> DataFrame:
    """(a, b, hamming) pairs with Hamming(simhash) ≤ max_hamming.

    Pigeonhole banding: split 64 bits into `bands` variable-width
    chunks (bands defaults to max_hamming + 1, which makes the recall
    guarantee unconditional); any pair within max_hamming must agree
    on ≥1 chunk → equi-join per chunk, verify exact Hamming with
    bit_count (JVM-side)."""
    sh = simhash(docs, id_col, text_col)
    # static shift amounts (shiftrightunsigned takes a Python int);
    # mask with AND, not %: Java % of a negative long is sign-dependent
    # and would split equal chunks across the sign bit
    chunk_exprs = [
        (
            F.shiftrightunsigned(F.col("simhash"), off).bitwiseAND(F.lit(2**w - 1))
            if w < 64
            else F.col("simhash")
        )
        for off, w in simhash_chunk_bounds(max_hamming, bands)
    ]
    from pyspark import StorageLevel

    # simhashes are consumed by banding AND the two verify joins below;
    # localCheckpoint so the tokenize+hash pass runs once (same
    # rationale as the minhash signature checkpoint)
    sh = sh.localCheckpoint(eager=False, storageLevel=StorageLevel.DISK_ONLY)
    banded = sh.select(
        "doc_id",
        F.posexplode(F.array(*chunk_exprs)).alias("band", "chunk"),
    )
    # candidate pairs per (band, chunk) via the one-exchange expansion
    # kernel (round-6; replaces the banded self-join — same pair set),
    # then the 64-bit hashes join back once per unique pair for the
    # exact Hamming verify
    cand = (
        _expand_group_pairs(
            banded, ["band", "chunk"], "doc_id", dedup_within_partition=True
        )
        .dropDuplicates(["a", "b"])
        # SHUFFLE_HASH, pair-side build — same mis-broadcast guard as
        # minhash_lsh_pairs (the simhash table must never be collected
        # to the driver at corpus scale)
        .hint("SHUFFLE_HASH")
        .join(sh.select(F.col("doc_id").alias("a"), F.col("simhash").alias("ha")), "a")
        .hint("SHUFFLE_HASH")
        .join(sh.select(F.col("doc_id").alias("b"), F.col("simhash").alias("hb")), "b")
    )
    hamming = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return (
        cand.withColumn("hamming", hamming)
        .where(F.col("hamming") <= max_hamming)
        .select("a", "b", "hamming")
    )


# -------------------------------------------------------------- winnowing ---


def winnow_fingerprints(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    window: int = 4,
) -> DataFrame:
    """(doc_id, fp) — winnowing document fingerprints (min-per-window
    variant): hash every token k-gram, slide a window of `window`
    consecutive k-gram hashes, keep each window's minimum; the distinct
    kept hashes are the doc's fingerprint set. Guarantees any shared
    run of ≥ k+window-1 tokens between two docs shares ≥1 fingerprint.

    Pure JVM column expressions; the 64-bit k-gram hash is the pinned
    signed(md5 first-8-bytes little-endian) — ≡ DuckDB
    md5_number_upper, so the SQL oracle reproduces it bit-for-bit
    (Spark side: md5 hex pairs reversed, then conv(…, 16, -10)).
    """
    toks = _spread(docs.select(F.col(id_col), F.col(text_col))).select(
        F.col(id_col).cast("long").alias("doc_id"),
        tokens_col(F.col(text_col)).alias("toks"),
    ).where(F.size("toks") > 0)
    grams = _shingles_col(F.col("toks"), k)
    # signed little-endian first-8-md5-bytes (h64_md5_le, shared with
    # minhash/simhash); the hash array stays IN-ROW (transform, not
    # explode+collect_list — collect_list would lose the k-gram order
    # windows depend on, and this way the whole op is shuffle-free
    # until the caller aggregates)
    seqs = toks.select("doc_id", h64_md5_le_arr(grams).alias("hs"))
    w = window
    mins = F.when(
        F.size("hs") <= w, F.array(F.array_min("hs"))
    ).otherwise(
        F.transform(
            F.sequence(F.lit(0), F.size("hs") - w),
            lambda i: F.array_min(F.slice("hs", i + 1, w)),
        )
    )
    return (
        seqs.select("doc_id", F.explode(F.array_distinct(mins)).alias("fp"))
        .orderBy("doc_id", "fp")
    )


def winnow_match_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    window: int = 4,
    min_shared: int = 2,
    max_fp_df: int = 1000,
) -> DataFrame:
    """(a, b, n_shared) doc pairs sharing ≥ min_shared winnowing
    fingerprints — the copy-detection join. Fingerprints appearing in
    more than ``max_fp_df`` docs are dropped first (boilerplate
    "stop fingerprints"); that bounds the self-join fan-out per fp to
    max_fp_df² instead of corpus², the standard MOSS-style guard."""
    fp = winnow_fingerprints(docs, id_col, text_col, k, window)
    rare = fp.join(
        fp.groupBy("fp").count().where(F.col("count") <= max_fp_df).select("fp"),
        "fp",
    )
    # per-fp pair expansion (one exchange + numpy) instead of the fp
    # self-join (round-6, same rework as minhash candidates); pair
    # multiplicity == number of shared fingerprints, as the join emitted
    return (
        _expand_group_pairs(rare, ["fp"], "doc_id")
        .groupBy("a", "b")
        .agg(F.count("*").alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )


# ----------------------------------------------------------- ngram jaccard ---


def ngram_jaccard_pairs(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
) -> DataFrame:
    """Exact verification stage: for candidate (a, b) pairs, true
    Jaccard over token n-gram shingle sets. Joins shingle sets in,
    computes |∩|/|∪| with array ops — broadcast-friendly when the
    candidate list is small."""
    toks = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        tokens_col(F.col(text_col)).alias("toks"),
    )
    sh = toks.select(
        "doc_id",
        F.array_distinct(_shingles_col(F.col("toks"), shingle_n)).alias("sh"),
    )
    a = sh.select(F.col("doc_id").alias("a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("doc_id").alias("b"), F.col("sh").alias("sh_b"))
    joined = pairs.join(a, "a").join(b, "b")
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return joined.select(
        "a", "b",
        (inter.cast("double") / union).alias("jaccard"),
    )
