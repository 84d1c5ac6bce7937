"""Corpus sampling + sequence packing (operators.corpus)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from inverted_index_spark.functions.tokenizer import tokenize_text
from inverted_index_spark.operators.corpus import (
    hash_sample,
    pack_sequences,
    running_offsets,
    sample_threshold,
    stratified_sample,
)

DOCS = [
    (i, f"doc number {i} " + "tok " * (i % 7), ["en", "de", "fr"][i % 3])
    for i in range(300)
]


def py_draw(doc_id: int, seed: int = 42) -> int:
    h = int.from_bytes(
        hashlib.md5(f"{seed}:{doc_id}".encode()).digest()[:8], "little"
    )
    return h & ((1 << 31) - 1)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string, lang string")


def test_hash_sample_deterministic(spark, docs):
    got = sorted(r["doc_id"] for r in hash_sample(docs, 0.25).select("doc_id").collect())
    want = sorted(i for i, _, _ in DOCS if py_draw(i) < sample_threshold(0.25))
    assert got == want
    # repartitioning must not change the sample (unlike df.sample)
    got2 = sorted(
        r["doc_id"]
        for r in hash_sample(docs.repartition(7), 0.25).select("doc_id").collect()
    )
    assert got2 == want


def test_hash_sample_bounds(spark, docs):
    assert hash_sample(docs, 0.0).count() == 0
    assert hash_sample(docs, 1.0).count() == len(DOCS)
    with pytest.raises(ValueError):
        hash_sample(docs, 1.5)


def test_stratified_sample(spark, docs):
    fr = {"en": 1.0, "de": 0.5}
    got = sorted(
        r["doc_id"]
        for r in stratified_sample(docs, fr, "lang").select("doc_id").collect()
    )
    want = sorted(
        i
        for i, _, lang in DOCS
        if py_draw(i) < sample_threshold(fr.get(lang, 0.0))
    )
    assert got == want  # fr-strata fully dropped via default_fraction=0


def test_running_offsets_exclusive_prefix_sum(spark):
    df = spark.createDataFrame(
        [(i, (i * 7) % 13) for i in range(500)], "doc_id long, v long"
    )
    out = {r["doc_id"]: r["offset"] for r in running_offsets(df, "v", ["doc_id"]).collect()}
    acc = 0
    for i in range(500):
        assert out[i] == acc, f"doc {i}"
        acc += (i * 7) % 13


def test_pack_sequences_oracle(spark, docs):
    out = {
        r["doc_id"]: (r["dl"], r["offset"], r["first_block"], r["last_block"])
        for r in pack_sequences(docs, block_size=32).collect()
    }
    acc = 0
    for i, text, _ in DOCS:
        dl = len(tokenize_text(text))
        fb = acc // 32
        lb = (acc + max(dl, 1) - 1) // 32
        assert out[i] == (dl, acc, fb, lb), f"doc {i}"
        acc += dl


def test_prepare_corpus_stages(spark):
    from inverted_index_spark.operators.corpus import prepare_corpus

    rows = [
        # doc 0/1: exact duplicates (keep 0)
        (0, "the cat sat on the mat and it is a fine day today", "sA"),
        (1, "the cat sat on the mat and it is a fine day today", "sA"),
        # doc 2: near-duplicate of 0 (one word changed) → clustered out
        (2, "the cat sat on the mat and it is a fine day tomorrow", "sB"),
        # doc 3: distinct english text
        (3, "a completely different story about the sea and the wind is told", "sB"),
        # doc 4: german
        (4, "der hund und die katze sind nicht das problem und das ist gut", "sC"),
        # doc 5: spanish → filtered by langs=(en, de)
        (5, "el perro y la casa es los campos y las flores", "sC"),
        # doc 6: too short (< 5 tokens)
        (6, "too short text", "sA"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = sorted(
        r["doc_id"]
        for r in prepare_corpus(
            docs, langs=("en", "de"), min_tokens=5,
            minhash_threshold=0.5, fractions=None,
        ).collect()
    )
    # 1 exact-dup loser, 2 near-dup loser, 5 wrong lang, 6 too short
    assert out == [0, 3, 4]
