"""Training-data pipeline operators: dedup tiers, similarity search,
text stats, multimodal plumbing, doc-id minting, streaming ingest."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from inverted_index_spark.functions.textstats import (
    fingerprints,
    lang_id,
    quality_scores,
    token_counts,
)
from inverted_index_spark.operators.dedup import (
    dedup_exact,
    exact_duplicates,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_near_pairs,
)
from inverted_index_spark.operators.docids import mint_doc_ids
from inverted_index_spark.operators.multimodal import (
    extract_features,
    frame_sample,
    synth_media,
)
from inverted_index_spark.operators.similarity import (
    ann_lsh_topk,
    cosine_topk,
    embedding_near_dup_pairs,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "The quick brown fox jumps over the lazy dog!"),  # case/punct dup of 0
        (2, "the quick brown fox jumps over the lazy cat"),   # near-dup of 0
        (3, "completely different content about spark engines"),
        (4, "der hund und die katze sind nicht da"),
        (5, "el perro y la casa es grande los ninos"),
        (6, ""),
        (7, "the quick brown fox jumps over the lazy dog"),    # exact dup of 0
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup(spark, docs):
    groups = exact_duplicates(docs).collect()
    assert len(groups) == 1
    assert groups[0]["n_dups"] == 3 and groups[0]["keep_id"] == 0
    kept = sorted(r["doc_id"] for r in dedup_exact(docs).collect())
    assert kept == [0, 2, 3, 4, 5, 6]


def test_minhash_finds_near_dups(spark, docs):
    pairs = {
        (r["a"], r["b"]): r["est_jaccard"]
        for r in minhash_lsh_pairs(docs, threshold=0.3).collect()
    }
    assert (0, 1) in pairs and pairs[(0, 1)] == 1.0  # identical token streams
    assert (0, 7) in pairs
    assert (0, 2) in pairs  # one-token change → high jaccard
    assert (0, 3) not in pairs


def test_simhash_near_pairs(spark, docs):
    pairs = {(r["a"], r["b"]): r["hamming"] for r in simhash_near_pairs(docs, max_hamming=3).collect()}
    assert pairs.get((0, 1)) == 0 and pairs.get((0, 7)) == 0
    assert (0, 3) not in pairs


def test_simhash_recall_guarantee(spark, docs):
    """Round-2 contract fix: every true pair within max_hamming is
    found, for any max_hamming, because bands auto-derive. Pin it with
    a BRUTE-FORCE oracle at max_hamming=16 (the driver-entry setting
    that used to silently lose recall) and a hamming-10 spot check."""
    from inverted_index_spark.operators.dedup import simhash

    sh = {r["doc_id"]: r["simhash"] for r in simhash(docs).collect()}
    want = {
        (a, b): bin((sh[a] ^ sh[b]) & ((1 << 64) - 1)).count("1")
        for a in sh
        for b in sh
        if a < b and bin((sh[a] ^ sh[b]) & ((1 << 64) - 1)).count("1") <= 16
    }
    got = {
        (r["a"], r["b"]): r["hamming"]
        for r in simhash_near_pairs(docs, max_hamming=16).collect()
    }
    assert got == want and any(h >= 4 for h in want.values())


def test_simhash_bands_contract(spark, docs):
    with pytest.raises(ValueError):
        simhash_near_pairs(docs, max_hamming=16, bands=4)


def test_minhash_hot_bucket_cap(spark):
    """1k identical docs: pair generation collapses to a star around
    the min doc_id (O(B), not B²/2) and every member is still linked."""
    rows = [(i, "same exact text repeated for the hot bucket test") for i in range(1000)]
    rows.append((5000, "entirely different content that stands alone"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = minhash_lsh_pairs(docs, threshold=0.3, hot_bucket_cap=100).collect()
    assert len(pairs) == 999  # star, not 1000*999/2
    assert all(r["a"] == 0 and r["est_jaccard"] == 1.0 for r in pairs)
    assert sorted(r["b"] for r in pairs) == list(range(1, 1000))


def test_winnowing_guarantee(spark):
    """Winnowing contract: two docs sharing a run of ≥ k+window-1
    tokens share ≥1 fingerprint; disjoint docs share none. Pinned
    against a pure-Python reimplementation of the same rule."""
    import hashlib

    from inverted_index_spark.operators.dedup import (
        winnow_fingerprints,
        winnow_match_pairs,
    )

    shared = "alpha bravo charlie delta echo foxtrot golf hotel india"
    rows = [
        (0, f"intro words {shared} trailing stuff here"),
        (1, f"{shared} completely other ending tokens now"),
        (2, "nothing in common with the others at all whatsoever"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {}
    for r in winnow_fingerprints(docs, k=5, window=4).collect():
        got.setdefault(r["doc_id"], set()).add(r["fp"])

    def py_winnow(text, k=5, w=4):
        toks = text.lower().split()
        grams = [" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)] \
            if len(toks) >= k else [" ".join(toks)]
        hs = []
        for g in grams:
            u = int.from_bytes(hashlib.md5(g.encode()).digest()[:8], "little")
            hs.append(u - (1 << 64) if u >= 1 << 63 else u)
        if len(hs) <= w:
            return {min(hs)}
        return {min(hs[i:i + w]) for i in range(len(hs) - w + 1)}

    for doc_id, text in rows:
        assert got[doc_id] == py_winnow(text), doc_id
    assert got[0] & got[1]          # the shared run produced a shared fp
    assert not (got[0] & got[2])    # disjoint docs share nothing
    pairs = {(r["a"], r["b"]): r["n_shared"]
             for r in winnow_match_pairs(docs, min_shared=1).collect()}
    assert (0, 1) in pairs and (0, 2) not in pairs


def test_ivf_recall(spark, vectors, tmp_path):
    """IVF probe: nprobe=n_lists is exact (identical to brute force);
    small nprobe keeps recall ≥ 0.6 on this corpus and scans only the
    probed list partitions."""
    from inverted_index_spark.operators.similarity import build_ivf_index, ivf_topk

    df, base = vectors
    path = str(tmp_path / "ivf")
    meta = build_ivf_index(df, path, n_lists=4)
    assert len(meta["centroids"]) == 4
    q = [float(x) for x in base[0]]
    exact = [r["vec_id"] for r in cosine_topk(df, q, k=10).collect()]
    full = [r["vec_id"] for r in ivf_topk(spark, path, q, k=10, nprobe=4).collect()]
    assert full == exact  # all lists probed == brute force
    part = [r["vec_id"] for r in ivf_topk(spark, path, q, k=10, nprobe=1).collect()]
    assert len(set(part) & set(exact)) >= 6


def test_ivf_sample_hard_cap(spark, vectors, tmp_path):
    """No build_ivf_index code path may collect more than max_sample
    rows to the driver, regardless of caller arguments (round-3 fix:
    the old sample_mod=1 default collected the ENTIRE vector table —
    an OOM at 100 TB)."""
    from inverted_index_spark.operators.similarity import build_ivf_index

    df, _ = vectors
    n = df.count()
    # explicit sample_mod=1 (the old foot-gun) still caps via limit()
    meta = build_ivf_index(df, str(tmp_path / "a"), n_lists=4, sample_mod=1, max_sample=50)
    assert meta["sample_rows"] <= 50
    # default derives the stride from a count
    meta = build_ivf_index(df, str(tmp_path / "b"), n_lists=4, max_sample=50)
    assert meta["sample_rows"] <= 50
    assert meta["sample_mod"] >= n // 50
    # default with a roomy cap uses everything (small corpus)
    meta = build_ivf_index(df, str(tmp_path / "c"), n_lists=4)
    assert meta["sample_rows"] == n and meta["sample_mod"] == 1


def test_h64_jvm_python_parity(spark):
    """The JVM hash expression (h64_md5_le over JVM-built shingles) and
    the pure-Python twin (_token_hash64 over _shingles) are bit-equal —
    the pinning that lets dedup kernels run in whole-stage codegen
    while the DuckDB oracle reproduces them via md5_number_upper."""
    import pandas as pd

    from inverted_index_spark.operators.dedup import (
        _shingles,
        _shingles_col,
        _token_hash64,
        h64_md5_le,
    )

    toks = [
        ["the", "quick", "brown", "fox"],
        ["бесплатно", "скачать", "сейчас"],  # unicode (md5 over utf-8)
        ["one"],  # fewer tokens than n → whole-doc shingle
        ["a", "b"],
        ["émoji", "☃", "tokens", "mixed", "案例"],
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(toks)], "i long, toks array<string>")
    got = {
        r["i"]: list(r["hs"])
        for r in df.select(
            "i", F.transform(_shingles_col(F.col("toks"), 3), h64_md5_le).alias("hs")
        ).collect()
    }
    sh = pd.Series([_shingles(t, 3) for t in toks])
    want = {
        i: hs.view(np.int64).tolist() for i, hs in enumerate(_token_hash64(sh))
    }
    assert got == want


def test_mulmod61_exact():
    """The minhash hash family is the documented (a·x+b) mod p —
    exact 128-bit math, cross-checked against Python bigints."""
    from inverted_index_spark.operators.dedup import MERSENNE_P, _mulmod61

    rng = np.random.default_rng(7)
    a = rng.integers(1, MERSENNE_P, size=200, dtype=np.uint64)
    x = rng.integers(0, np.iinfo(np.uint64).max, size=200, dtype=np.uint64)
    got = _mulmod61(a, x)
    want = np.array([(int(ai) * int(xi)) % MERSENNE_P for ai, xi in zip(a, x)], dtype=np.uint64)
    assert (got == want).all()


def test_ngram_jaccard(spark, docs):
    ids = docs.select(F.col("doc_id").alias("a"))
    pairs = ids.crossJoin(docs.select(F.col("doc_id").alias("b"))).where("a < b")
    j = {(r["a"], r["b"]): r["jaccard"] for r in ngram_jaccard_pairs(docs, pairs).collect()}
    assert j[(0, 1)] == 1.0 and j[(0, 7)] == 1.0
    assert 0.5 < j[(0, 2)] < 1.0
    assert j.get((0, 3), 0.0) == 0.0


def test_token_and_quality_stats(spark, docs):
    tc = {r["doc_id"]: r for r in token_counts(docs).collect()}
    assert tc[0]["n_tokens"] == 9
    assert tc[6]["n_tokens"] == 0
    q = {r["doc_id"]: r for r in quality_scores(docs).collect()}
    assert q[0]["stopword_ratio"] == pytest.approx(2 / 9)
    assert q[6]["n_tokens"] == 0 and q[6]["avg_token_len"] == 0.0
    assert q[0]["distinct_ratio"] == pytest.approx(8 / 9)


def test_lang_id(spark, docs):
    langs = {r["doc_id"]: r["pred_lang"] for r in lang_id(docs).collect()}
    assert langs[0] == "en"
    assert langs[4] == "de"
    assert langs[5] == "es"
    assert langs[6] == "und"


def test_fingerprint_normalizes(spark, docs):
    fp = {r["doc_id"]: r["fp"] for r in fingerprints(docs).collect()}
    assert fp[0] == fp[1] == fp[7]
    assert fp[0] != fp[2]


# ------------------------------------------------------------- similarity ---


@pytest.fixture(scope="module")
def vectors(spark):
    rng = np.random.default_rng(7)
    base = rng.standard_normal((40, 16))
    base[1] = base[0] + 0.01 * rng.standard_normal(16)  # near-dup of 0
    rows = [(i, [float(x) for x in base[i]]) for i in range(40)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>"), base


def test_cosine_topk_exact(spark, vectors):
    df, base = vectors
    q = [float(x) for x in base[0]]
    got = [r["vec_id"] for r in cosine_topk(df, q, k=5).collect()]
    sims = (base @ base[0]) / (np.linalg.norm(base, axis=1) * np.linalg.norm(base[0]))
    expect = list(np.lexsort((np.arange(40), -sims))[:5])
    assert got == expect
    assert got[0] == 0 and got[1] == 1


def test_ann_lsh_recall(spark, vectors):
    df, base = vectors
    q = [float(x) for x in base[0]]
    exact = {r["vec_id"] for r in cosine_topk(df, q, k=5).collect()}
    approx = {r["vec_id"] for r in ann_lsh_topk(df, q, k=5, n_bits=6, tables=12).collect()}
    assert len(exact & approx) >= 3  # recall floor, seeded → deterministic


def test_ann_indexed_matches_on_the_fly(spark, vectors, tmp_path):
    """The persisted LSH index returns exactly the on-the-fly results
    (same planes/seed) and its scan is pruned: the key equality reaches
    the parquet scan as a pushed filter instead of a full pass."""
    from inverted_index_spark.operators.similarity import (
        ann_lsh_topk_indexed,
        build_lsh_index,
    )
    from inverted_index_spark.plans import pushed_filters

    df, base = vectors
    path = str(tmp_path / "lsh")
    meta = build_lsh_index(df, path)
    assert meta["tables"] == 8 and meta["dim"] == 16
    q = [float(x) for x in base[0]]
    fly = [(r["vec_id"], round(r["cosine"], 9)) for r in ann_lsh_topk(df, q, k=5).collect()]
    idx = ann_lsh_topk_indexed(spark, path, q, k=5)
    got = [(r["vec_id"], round(r["cosine"], 9)) for r in idx.collect()]
    assert got == fly
    pf = pushed_filters(idx)
    assert "key" in pf  # EqualTo(key, …) pushed into the bucket scan


def test_embedding_near_dups(spark, vectors):
    df, _ = vectors
    pairs = {(r["a"], r["b"]) for r in embedding_near_dup_pairs(df, threshold=0.95).collect()}
    assert (0, 1) in pairs
    # exact baseline (round-4): all-pairs scoring; the LSH candidates
    # must be a SUBSET of it at the same threshold (no false positives
    # — both verify exact cosine — and exact finds everything)
    exact = {
        (r["a"], r["b"])
        for r in embedding_near_dup_pairs(df, threshold=0.95, exact=True).collect()
    }
    assert pairs <= exact
    assert (0, 1) in exact


# -------------------------------------------------------------- multimodal ---


def test_multimodal_features(spark):
    media = synth_media(spark, 12)
    feats = extract_features(media, out_dim=8).collect()
    assert len(feats) == 12
    assert all(len(r["feature"]) == 8 for r in feats)
    # deterministic: same payload → same feature
    again = extract_features(media, out_dim=8).collect()
    assert [r["feature"] for r in feats] == [r["feature"] for r in again]


def test_frame_sample(spark):
    media = synth_media(spark, 12)
    frames = frame_sample(media, every_ms=1000).collect()
    vids = [r for r in frames if r["frame_ts_ms"] >= 0]
    assert len(vids) > 0
    assert all(r["frame_ts_ms"] == r["frame_idx"] * 1000 for r in frames)


def test_real_decode_is_stubbed(spark):
    media = synth_media(spark, 3)
    with pytest.raises(NotImplementedError):
        extract_features(media, real_decode=True)


# ------------------------------------------------------------------ docids ---


def test_mint_doc_ids(spark):
    rows = [(f"c{9 - i:02d}", j) for i in range(10) for j in range(3)]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int")
    out = mint_doc_ids(df, ["conv_id", "turn_idx"], num_partitions=4).collect()
    got = sorted((r["conv_id"], r["turn_idx"], r["doc_id"]) for r in out)
    expect_ids = list(range(30))
    assert [g[2] for g in got] == expect_ids  # dense rank in (conv, turn) order


def test_media_stats_native_decode(spark):
    """WAV/PPM/BMP decode natively (stdlib + numpy) with exact stats;
    unknown formats come back fmt='unknown' with null stats."""
    import io
    import struct
    import wave

    import numpy as np

    from inverted_index_spark.operators.multimodal import MEDIA_SCHEMA, media_stats

    # 16-bit mono WAV: 1 second of a full-scale square wave at 100 Hz
    rate, n = 8000, 8000
    t = np.arange(n)
    sq = (np.where((t // 40) % 2 == 0, 30000, -30000)).astype(np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1); w.setsampwidth(2); w.setframerate(rate)
        w.writeframes(sq.tobytes())
    wav_bytes = buf.getvalue()

    # 2x2 PPM: red, green / blue, white
    ppm_bytes = b"P6\n2 2\n255\n" + bytes(
        [255, 0, 0,  0, 255, 0,  0, 0, 255,  255, 255, 255]
    )

    # 2x1 24-bit BMP (bottom-up): pixels (BGR) blue then red, row padded to 8
    px_row = bytes([255, 0, 0,  0, 0, 255]) + b"\x00\x00"
    bmp_bytes = (
        b"BM" + struct.pack("<IHHI", 54 + len(px_row), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, 2, 1, 1, 24, 0, len(px_row), 0, 0, 0, 0)
        + px_row
    )

    media = spark.createDataFrame(
        [
            (0, "audio", bytearray(wav_bytes), ("audio/wav", 0, 0, 0)),
            (1, "image", bytearray(ppm_bytes), ("image/ppm", 2, 2, 0)),
            (2, "image", bytearray(bmp_bytes), ("image/bmp", 2, 1, 0)),
            (3, "video", bytearray(b"\x00\x01garbage"), ("video/mp4", 0, 0, 0)),
        ],
        MEDIA_SCHEMA,
    )
    got = {r["media_id"]: r.asDict() for r in media_stats(media).collect()}

    wav = got[0]
    assert wav["fmt"] == "wav" and wav["sample_rate"] == 8000
    assert abs(wav["duration_ms"] - 1000.0) < 1e-9
    assert abs(wav["rms"] - 30000 / 32768) < 1e-9  # full-scale square
    # square at 100 Hz: 200 sign flips over 7999 transitions
    assert abs(wav["zero_cross_rate"] - 199 / 7999) < 1e-9

    ppm = got[1]
    assert (ppm["fmt"], ppm["width"], ppm["height"]) == ("ppm", 2, 2)
    assert (ppm["mean_r"], ppm["mean_g"], ppm["mean_b"]) == (127.5, 127.5, 127.5)

    bmp = got[2]
    assert (bmp["fmt"], bmp["width"], bmp["height"]) == ("bmp", 2, 1)
    assert (bmp["mean_r"], bmp["mean_g"], bmp["mean_b"]) == (127.5, 0.0, 127.5)

    assert got[3]["fmt"] == "unknown" and got[3]["width"] is None


def test_media_stats_malformed_payloads(spark):
    """Malformed payloads must yield null stats, never crash the job
    (ADVICE r3): truncated PPM/BMP rasters, NULL payload, PPM maxval=0
    (division by zero) and maxval>255 (16-bit misparse as uint8)."""
    import struct

    from inverted_index_spark.operators.multimodal import (
        MEDIA_SCHEMA, decode_payload, media_stats,
    )

    truncated_ppm = b"P6\n100 100\n255\n" + b"\x01" * 10  # raster too short
    zero_maxval_ppm = b"P6\n2 2\n0\n" + b"\x00" * 12
    wide_maxval_ppm = b"P6\n1 1\n65535\n" + b"\x00" * 6  # 16-bit samples
    truncated_bmp = (
        b"BM" + struct.pack("<IHHI", 100, 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, 50, 50, 1, 24, 0, 0, 0, 0, 0, 0)
    )  # header claims 50x50 but no pixel data follows
    bad_wav = b"RIFF\x00\x00\x00\x00WAVEjunk"
    rows = [
        (0, "image", bytearray(truncated_ppm), (None, 0, 0, 0)),
        (1, "image", bytearray(zero_maxval_ppm), (None, 0, 0, 0)),
        (2, "image", bytearray(wide_maxval_ppm), (None, 0, 0, 0)),
        (3, "image", bytearray(truncated_bmp), (None, 0, 0, 0)),
        (4, "audio", bytearray(bad_wav), (None, 0, 0, 0)),
        (5, "image", None, (None, 0, 0, 0)),
        (6, "image", bytearray(b""), (None, 0, 0, 0)),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r["media_id"]: r.asDict() for r in media_stats(media).collect()}
    assert len(got) == 7
    for r in got.values():
        assert r["fmt"] == "unknown" and r["width"] is None and r["rms"] is None
    # scalar path agrees
    assert decode_payload(None)["fmt"] == "unknown"
    assert decode_payload(truncated_ppm)["fmt"] == "unknown"


def test_hybrid_topk(spark, tmp_path):
    """RRF fusion equals the hand-computed 1/(60+rank) sums over the
    two source rankings (docs in one pool only keep that source)."""
    from inverted_index_spark.operators.bm25 import bm25_topk
    from inverted_index_spark.operators.build import build_index
    from inverted_index_spark.operators.similarity import cosine_topk, hybrid_topk
    from inverted_index_spark.sources.store import SegmentStore

    docs = spark.createDataFrame(
        [
            (0, "spark merge window"),
            (1, "spark spark merge"),
            (2, "window table hash"),
            (3, "unrelated words entirely"),
            (4, "spark"),
        ],
        "doc_id long, text string",
    )
    store = SegmentStore(str(tmp_path / "hy_idx"))
    build_index(spark, docs, store, bucket_size=2)
    # embeddings: only docs 2, 3, 4 have vectors (partial coverage)
    vecs = spark.createDataFrame(
        [
            (2, [1.0, 0.0, 0.0]),
            (3, [0.9, 0.1, 0.0]),
            (4, [0.0, 1.0, 0.0]),
        ],
        "vec_id long, embedding array<float>",
    )
    q = [1.0, 0.0, 0.0]
    terms = ["spark", "merge"]
    got = [
        (r["doc_id"], round(r["rrf"], 12))
        for r in hybrid_topk(spark, store, terms, q, vecs, k=10).collect()
    ]
    rb = {
        r["doc_id"]: i + 1
        for i, r in enumerate(bm25_topk(spark, store, terms, k=100).collect())
    }
    rc = {
        r["vec_id"]: i + 1
        for i, r in enumerate(cosine_topk(vecs, q, k=100).collect())
    }
    want = {
        d: round(
            (1.0 / (60 + rb[d]) if d in rb else 0.0)
            + (1.0 / (60 + rc[d]) if d in rc else 0.0),
            12,
        )
        for d in set(rb) | set(rc)
    }
    expect = sorted(want.items(), key=lambda x: (-x[1], x[0]))
    assert got == expect
    # both-pool docs outrank single-pool docs with similar ranks
    assert set(d for d, _ in got) == set(rb) | set(rc)


def test_zero_norm_vectors_score_zero(spark):
    """Spark 4 runs ANSI mode by default, where even DOUBLE division
    by zero raises DIVIDE_BY_ZERO — an all-zero embedding (common
    missing-value padding) must score cosine 0.0, not abort the job
    (and pre-ANSI its NaN would have sorted ABOVE every real hit)."""
    from inverted_index_spark.operators.similarity import (
        cosine_topk,
        embedding_near_dup_pairs,
    )

    df = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 0.0]), (2, [0.6, 0.8])],
        "vec_id long, embedding array<double>",
    )
    top = cosine_topk(df, [1.0, 0.0], k=3).collect()
    assert [r["vec_id"] for r in top] == [0, 2, 1]
    assert top[-1]["cosine"] == 0.0
    # zero query -> all zeros, still no abort
    assert all(
        r["cosine"] == 0.0 for r in cosine_topk(df, [0.0, 0.0], k=3).collect()
    )
    # exact pair path: the zero vector pairs score 0 and drop below τ
    pairs = embedding_near_dup_pairs(df, threshold=0.5, exact=True).collect()
    assert {(r["a"], r["b"]) for r in pairs} == {(0, 2)}


def test_bigram_perplexity_matches_bruteforce(spark):
    import math
    import re
    from collections import Counter

    from inverted_index_spark.functions.textstats import bigram_perplexity

    rows = [
        (0, "the cat sat on the mat"),
        (1, "the cat sat"),
        (2, "zzz qqq zzz qqq zzz"),
        (3, "single"),        # <2 tokens → no bigrams → omitted
        (4, ""),
        (5, "the the the the"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_bigrams"], round(r["avg_nll"], 9), round(r["ppl"], 6))
        for r in bigram_perplexity(docs, alpha=0.1).collect()
    }
    toks = {i: re.findall(r"\w+", t.lower()) for i, t in rows}
    bgs = {i: list(zip(t, t[1:])) for i, t in toks.items()}
    allbg = [b for l in bgs.values() for b in l]
    c12, c1 = Counter(allbg), Counter(b[0] for b in allbg)
    V = len({w for t in toks.values() for w in t})
    exp = {}
    for i, l in bgs.items():
        if not l:
            continue
        lps = [math.log((c12[b] + 0.1) / (c1[b[0]] + 0.1 * V)) for b in l]
        nll = -sum(lps) / len(lps)
        exp[i] = (len(l), round(nll, 9), round(math.exp(nll), 6))
    assert got == exp
    assert 3 not in got and 4 not in got


def test_bigram_perplexity_separate_train_set(spark):
    from inverted_index_spark.functions.textstats import bigram_perplexity

    rows = [
        (0, "the cat sat on the mat"),
        (1, "the cat sat"),
        (2, "zzz qqq zzz qqq zzz"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    train = spark.createDataFrame(rows[:2], "doc_id long, text string")
    out = {
        r["doc_id"]: r["ppl"]
        for r in bigram_perplexity(docs, train_docs=train).collect()
    }
    # an out-of-domain doc (every event unseen) must score strictly
    # worse than in-domain docs
    assert out[2] > out[0] and out[2] > out[1]


def test_bigram_perplexity_empty_corpus(spark):
    from inverted_index_spark.functions.textstats import bigram_perplexity

    docs = spark.createDataFrame([(0, "")], "doc_id long, text string")
    assert bigram_perplexity(docs).collect() == []


def test_hybrid_linear_topk(spark, tmp_path):
    """Minmax-normalized weighted fusion (ES linear retriever) equals
    the hand-computed normalization over the two pools; absent-pool
    docs contribute 0 from that source."""
    from inverted_index_spark.operators.bm25 import bm25_topk
    from inverted_index_spark.operators.build import build_index
    from inverted_index_spark.operators.similarity import (
        cosine_topk,
        hybrid_linear_topk,
    )
    from inverted_index_spark.sources.store import SegmentStore

    docs = spark.createDataFrame(
        [
            (0, "spark merge window"),
            (1, "spark spark merge"),
            (2, "window table hash"),
            (3, "unrelated words entirely"),
            (4, "spark"),
        ],
        "doc_id long, text string",
    )
    store = SegmentStore(str(tmp_path / "hyl_idx"))
    build_index(spark, docs, store, bucket_size=2)
    vecs = spark.createDataFrame(
        [
            (2, [1.0, 0.0, 0.0]),
            (3, [0.9, 0.1, 0.0]),
            (4, [0.0, 1.0, 0.0]),
        ],
        "vec_id long, embedding array<float>",
    )
    q = [1.0, 0.0, 0.0]
    terms = ["spark", "merge"]
    w_lex, w_dense = 0.7, 0.3
    got = {
        r["doc_id"]: r["score"]
        for r in hybrid_linear_topk(
            spark, store, terms, q, vecs, k=10, w_lex=w_lex, w_dense=w_dense
        ).collect()
    }
    bs = {
        r["doc_id"]: r["score"]
        for r in bm25_topk(spark, store, terms, k=100).collect()
    }
    cs = {
        r["vec_id"]: r["cosine"]
        for r in cosine_topk(vecs, q, k=100).collect()
    }

    def norm(d, pool):
        if d not in pool:
            return 0.0
        lo, hi = min(pool.values()), max(pool.values())
        return (pool[d] - lo) / (hi - lo) if hi > lo else 1.0

    for d in set(bs) | set(cs):
        want = w_lex * norm(d, bs) + w_dense * norm(d, cs)
        assert got[d] == pytest.approx(want), d
