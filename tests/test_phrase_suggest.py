"""Phrase suggester vs a brute-force Python oracle that reimplements
the whole contract (fuzzy candidates → ctf ranking → combo cap →
bigram-LM + edit-penalty scoring) from the raw texts."""

from __future__ import annotations

import itertools
import math
import tempfile
from collections import Counter

import pytest

from inverted_index_spark.functions.tokenizer import tokenize_text
from inverted_index_spark.operators.build import build_index
from inverted_index_spark.operators.phrase_suggest import (
    _levenshtein,
    phrase_suggest,
)
from inverted_index_spark.sources.store import SegmentStore

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "quick brown foxes are quick brown"),
    (2, "the dog sleeps near the quick dog"),
    (3, "brown the quick"),
    (4, "pad quick brown pad quick brown"),
    (5, "the quick brown fox quick brown fox"),
]


@pytest.fixture(scope="module")
def store(spark, tmp_path_factory):
    s = SegmentStore(str(tmp_path_factory.mktemp("psuggest") / "idx"))
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    build_index(spark, docs, s, bucket_size=64, positions=True)
    return s


def oracle(
    text, k=3, max_edits=1, per_token=5, alpha=0.1, edit_penalty=1.0,
    max_combos=128,
):
    toks = tokenize_text(text)
    streams = [tokenize_text(t) for _, t in DOCS]
    ctf = Counter(w for s in streams for w in s)
    adj = Counter((s[i], s[i + 1]) for s in streams for i in range(len(s) - 1))
    vocab = len(ctf)
    slots = []
    for t in toks:
        cands = [w for w in ctf if _levenshtein(t, w) <= max_edits]
        ranked = sorted(cands, key=lambda c: (-ctf[c], c))[:per_token]
        if t in ctf and t in ranked:
            ranked.remove(t)
            ranked.insert(0, t)
        if not ranked:
            return []
        slots.append(ranked)
    while math.prod(len(s) for s in slots) > max_combos:
        big = max(range(len(slots)), key=lambda i: len(slots[i]))
        slots[big] = slots[big][:-1]
    scored = []
    for c in itertools.product(*slots):
        lp = sum(
            math.log((adj[(c[i], c[i + 1])] + alpha) / (ctf[c[i]] + alpha * vocab))
            for i in range(len(c) - 1)
        )
        edits = sum(_levenshtein(t, w) for t, w in zip(toks, c))
        scored.append((" ".join(c), lp - edit_penalty * edits))
    scored.sort(key=lambda x: (-x[1], x[0]))
    return [(s, round(sc, 9)) for s, sc in scored[:k]]


@pytest.mark.parametrize(
    "probe",
    [
        "quick browm",          # one typo
        "teh quick",            # typo in a stopword-ish term
        "quik browm fax",       # three typos
        "the dog",              # already correct — must rank itself first
        "zzzzzz quick",         # hopeless first token → no suggestion
    ],
)
def test_phrase_suggest_matches_oracle(spark, store, probe):
    got = [
        (r["suggestion"], round(r["score"], 9))
        for r in phrase_suggest(spark, store, probe).collect()
    ]
    assert got == oracle(probe)


def test_phrase_suggest_correct_phrase_wins(spark, store):
    rows = phrase_suggest(spark, store, "quick brown").collect()
    assert rows[0]["suggestion"] == "quick brown"


def test_phrase_suggest_single_token_falls_back(spark, store):
    rows = phrase_suggest(spark, store, "browm", k=2).collect()
    assert rows and rows[0]["suggestion"] == "brown"


def test_phrase_suggest_empty_query(spark, store):
    assert phrase_suggest(spark, store, " ...  ").collect() == []
