"""Trigram substring index: candidates are a superset, verified
results equal brute-force contains(); short-needle fallback; merge
and delete invariance ride the ordered-V machinery."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from inverted_index_spark.operators.query import and_values
from inverted_index_spark.operators.substring import (
    build_trigram_index,
    doc_trigrams,
    needle_trigrams,
    regex_search,
    substring_search,
)
from inverted_index_spark.sources.store import SegmentStore

DOCS = [
    (0, "ERROR: connection timeout at 10.0.0.1"),
    (1, "warn: retrying connection"),
    (2, "error: Connection refused"),
    (3, "all systems nominal"),
    (4, "time out waiting for lock"),
    (5, "xyz"),
]


@pytest.fixture(scope="module")
def sub_store(spark, tmp_path_factory):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    store = SegmentStore(str(tmp_path_factory.mktemp("tri") / "idx"))
    build_trigram_index(spark, docs, store, bucket_size=4)
    return store, docs


def _brute(needle):
    n = needle.lower()
    return [d for d, t in DOCS if n in t.lower()]


def test_doc_trigrams(spark):
    docs = spark.createDataFrame([(7, "AbcD")], "doc_id long, text string")
    got = {r["gram"] for r in doc_trigrams(docs).collect()}
    assert got == {"abc", "bcd"}
    # shorter than 3 chars -> no grams, no rows
    tiny = spark.createDataFrame([(8, "ab")], "doc_id long, text string")
    assert doc_trigrams(tiny).count() == 0


@pytest.mark.parametrize(
    "needle",
    [
        "connection",         # multiple docs, case-insensitive
        "Connection refused", # crosses word boundary (space trigram)
        "timeout",            # must NOT match doc 4's 'time out'
        "10.0.0.1",           # punctuation trigrams
        "nosuchsubstring",
        "ERROR: conn",
    ],
)
def test_substring_search(spark, sub_store, needle):
    store, docs = sub_store
    got = [
        r["doc_id"]
        for r in substring_search(spark, store, needle, docs).collect()
    ]
    assert got == _brute(needle), needle


def test_candidates_are_superset(spark, sub_store):
    """Trigram AND may return false positives (non-adjacent grams) but
    never false negatives — the contract verification relies on."""
    store, docs = sub_store
    needle = "connection timeout"
    cands = {
        r["doc_id"]
        for r in and_values(spark, store, needle_trigrams(needle)).collect()
    }
    assert set(_brute(needle)) <= cands


def test_short_needle_fallback(spark, sub_store):
    store, docs = sub_store
    got = [
        r["doc_id"]
        for r in substring_search(spark, store, "xy", docs).collect()
    ]
    assert got == _brute("xy") == [5]
    with pytest.raises(ValueError, match="empty needle"):
        substring_search(spark, store, "", docs)


def test_regex_required_trigrams():
    from inverted_index_spark.operators.substring import (
        regex_required_trigrams as rt,
    )

    # plain literal
    assert rt("connection") == [needle_trigrams("connection")]
    # concatenation across a gap: both sides required
    got = rt("error.*refused")
    assert got is not None and set(got[0]) == set(
        needle_trigrams("error") + needle_trigrams("refused")
    )
    # quantified char is not mandatory: 'timeouts?' requires 'timeout'
    assert rt("timeouts?") == [needle_trigrams("timeout")]
    # top-level alternation -> DNF branches
    got = rt("timeout|refused")
    assert got == [needle_trigrams("timeout"), needle_trigrams("refused")]
    # one unconstrained branch poisons the OR
    assert rt("timeout|x.") is None
    # groups and literal-free patterns fall back
    assert rt("(time)out") is None
    assert rt("a.b") is None
    assert rt(r"\d+") is None
    # escaped metachar is a literal ('10\.0' -> trigrams of '10.0')
    got = rt(r"10\.0\.0\.1")
    assert got == [needle_trigrams("10.0.0.1")]
    # character class contributes nothing but neighbors still count
    assert rt("[ew]rror: conn") == [needle_trigrams("rror: conn")]


@pytest.mark.parametrize(
    "pattern",
    [
        "connection",
        "error.*refused",
        "timeouts?",
        "timeout|refused",
        r"10\.0\.0\.\d",   # falls back (class tail) — still correct
        "conn.ction",
        "^error",
        "nominal$",
    ],
)
def test_regex_search(spark, sub_store, pattern):
    import re

    store, docs = sub_store
    got = [
        r["doc_id"]
        for r in regex_search(spark, store, pattern, docs).collect()
    ]
    want = [
        d for d, t in DOCS if re.search(pattern.lower(), t.lower())
    ]
    assert got == want, pattern


def test_plan_prunes_corpus_scan(spark, sub_store):
    """The ≥3-needle plan semi-joins candidates before touching text —
    assert the join is present (short needles have none)."""
    store, docs = sub_store
    plan = substring_search(
        spark, store, "connection", docs
    )._jdf.queryExecution().optimizedPlan().toString()
    assert "LeftSemi" in plan
    plan_short = substring_search(
        spark, store, "xy", docs
    )._jdf.queryExecution().optimizedPlan().toString()
    assert "LeftSemi" not in plan_short
