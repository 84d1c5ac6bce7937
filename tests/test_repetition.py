"""Gopher-style repetition/quality signals vs a brute-force oracle.

The reference library has no document-quality layer (it stores term ->
posting lists only); these are the standard training-data curation
rules (Rae et al. 2021 Table A1, the datatrove / NeMo-Curator
formulation) over the same documents table the other pipeline
operators use.
"""

from __future__ import annotations

import re
from collections import Counter

import pytest

from inverted_index_spark.functions.textstats import (
    GOPHER_DEFAULTS,
    gopher_filter,
    repetition_stats,
)

DOCS = [
    # repeated lines + a dominating repeated bigram
    (1, "the cat sat\nthe cat sat\nthe cat sat\nnew line"),
    # clean prose, no repetition
    (2, "spark executes declarative plans over columnar batches"),
    # heavy symbols and ellipses
    (3, "wow... so #cool... really #great ... yes…"),
    # shorter than every n-gram width
    (4, "hi"),
    # empty text: every denominator is zero
    (5, ""),
    # numeric / non-alpha words
    (6, "123 456 123 456 123 456 mixed12 ___"),
    # one long line, duplicated 5-gram with overlap inside the doc
    (7, "a b c d e a b c d e a b c d e"),
]


def _oracle(text: str, top_ns=(2, 3), dup_ns=(5,)) -> dict:
    toks = re.findall(r"[a-z0-9_]+", text.lower())
    n_words = len(toks)
    word_chars = sum(len(t) for t in toks)
    lines = text.split("\n")
    out = {
        "n_words": n_words,
        "n_lines": len(lines),
        "dup_line_frac": (len(lines) - len(set(lines))) / len(lines),
        "symbol_word_ratio": (
            len(re.findall(r"#|\.\.\.|…", text)) / n_words if n_words else 0.0
        ),
        "alpha_word_frac": (
            sum(1 for t in toks if re.search("[a-z]", t)) / n_words
            if n_words
            else 0.0
        ),
    }
    for n in top_ns:
        grams = Counter(
            " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
        )
        top = max(
            (cnt * (len(g) - (n - 1)) for g, cnt in grams.items()), default=0
        )
        out[f"top_{n}gram_char_frac"] = top / word_chars if word_chars else 0.0
    for n in dup_ns:
        grams = Counter(
            " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
        )
        dup = sum(
            cnt * (len(g) - (n - 1)) for g, cnt in grams.items() if cnt > 1
        )
        out[f"dup_{n}gram_char_frac"] = dup / word_chars if word_chars else 0.0
    return out


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_repetition_stats_vs_bruteforce(spark, docs):
    got = {r["doc_id"]: r.asDict() for r in repetition_stats(docs).collect()}
    assert set(got) == {d for d, _ in DOCS}
    for doc_id, text in DOCS:
        want = _oracle(text)
        row = got[doc_id]
        for k, v in want.items():
            assert row[k] == pytest.approx(v, abs=1e-12), (doc_id, k, row[k], v)


def test_repetition_custom_ns(spark, docs):
    got = {
        r["doc_id"]: r.asDict()
        for r in repetition_stats(docs, top_ns=(4,), dup_ns=(2, 3)).collect()
    }
    for doc_id, text in DOCS:
        want = _oracle(text, top_ns=(4,), dup_ns=(2, 3))
        row = got[doc_id]
        assert "top_2gram_char_frac" not in row
        for k in ("top_4gram_char_frac", "dup_2gram_char_frac", "dup_3gram_char_frac"):
            assert row[k] == pytest.approx(want[k], abs=1e-12), (doc_id, k)


def test_gopher_filter_matches_thresholds(spark, docs):
    rows = {r["doc_id"]: r.asDict() for r in gopher_filter(docs).collect()}
    th = GOPHER_DEFAULTS
    for doc_id, text in DOCS:
        want = _oracle(text)
        expect = (
            th["min_words"] <= want["n_words"] <= th["max_words"]
            and want["symbol_word_ratio"] <= th["max_symbol_word_ratio"]
            and want["alpha_word_frac"] >= th["min_alpha_word_frac"]
            and want["dup_line_frac"] <= th["max_dup_line_frac"]
            and want["top_2gram_char_frac"] <= th["max_top_2gram_char_frac"]
            and want["top_3gram_char_frac"] <= th["max_top_3gram_char_frac"]
            and want["dup_5gram_char_frac"] <= th["max_dup_5gram_char_frac"]
        )
        assert rows[doc_id]["keep"] == expect, (doc_id, rows[doc_id])
    # every fixture doc is under min_words=50, so nothing survives
    assert not any(r["keep"] for r in rows.values())


def test_gopher_filter_overrides(spark, docs):
    # loosen until doc 2 (clean prose) survives — short docs need the
    # top-gram caps relaxed too: one bigram is ~40% of a 7-word doc
    kept = {
        r["doc_id"]
        for r in gopher_filter(
            docs,
            min_words=3,
            max_top_2gram_char_frac=0.5,
            max_top_3gram_char_frac=0.6,
        ).collect()
        if r["keep"]
    }
    assert 2 in kept
    assert 1 not in kept  # dup_line_frac 0.5 > 0.3 still kills doc 1
    assert 3 not in kept  # symbol ratio still kills doc 3


def test_gopher_filter_unknown_threshold(spark, docs):
    with pytest.raises(ValueError, match="unknown gopher thresholds"):
        gopher_filter(docs, min_wordz=3)
