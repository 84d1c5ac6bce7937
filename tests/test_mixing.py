"""Domain-mixing sampler vs a brute-force md5 oracle."""

from __future__ import annotations

from hashlib import md5

import pytest

from inverted_index_spark.operators.mixing import mix_corpus, mix_thresholds

MOD = 1 << 31


def _draw(doc_id: int, seed: int = 42) -> int:
    h = md5(f"{seed}:{doc_id}".encode()).digest()
    return int.from_bytes(h[:8], "little") & (MOD - 1)


def _mk_docs(spark):
    rows = []
    i = 0
    for src, n in (("a", 100), ("b", 50), ("c", 10)):
        for _ in range(n):
            rows.append((i, src))
            i += 1
    return spark.createDataFrame(rows, "doc_id long, source string")


def test_thresholds_math(spark):
    docs = _mk_docs(spark)
    targets = {"a": 0.6, "b": 0.3, "c": 0.1}
    thr = mix_thresholds(docs, targets)
    # T = min(100/0.6, 50/0.3, 10/0.1) = 100 -> rates 0.6, 0.6, 1.0
    assert thr["c"] == MOD  # binding source keeps everything
    assert thr["a"] == int(((0.6 * 100.0) / 100) * MOD)
    assert thr["b"] == int(((0.3 * (50 / 0.3)) / 50) * MOD) or thr["b"] == int(
        ((0.3 * 100.0) / 50) * MOD
    )
    assert thr["b"] == int(((0.3 * min(100 / 0.6, 50 / 0.3, 10 / 0.1)) / 50) * MOD)


def test_mix_matches_bruteforce(spark):
    docs = _mk_docs(spark)
    targets = {"a": 0.6, "b": 0.3, "c": 0.1}
    thr = mix_thresholds(docs, targets)
    got = {(r["doc_id"], r["source"]) for r in mix_corpus(docs, targets).collect()}
    want = set()
    for i in range(100):
        if _draw(i) < thr["a"]:
            want.add((i, "a"))
    for i in range(100, 150):
        if _draw(i) < thr["b"]:
            want.add((i, "b"))
    for i in range(150, 160):
        want.add((i, "c"))  # rate 1.0
    assert got == want
    # the binding source survives intact
    assert sum(1 for _, s in got if s == "c") == 10


def test_mix_ratio_direction(spark):
    """a:b kept counts should approximate 2:1 once thresholds bind."""
    docs = _mk_docs(spark)
    kept = mix_corpus(docs, {"a": 2.0, "b": 1.0}).groupBy("source").count()
    by = {r["source"]: r["count"] for r in kept.collect()}
    assert set(by) == {"a", "b"}  # source c dropped: not in targets
    # b is binding (50/1 < 100/2 is false: 100/2=50 == 50/1 -> both 1.0)
    assert by["a"] == 100 and by["b"] == 50


def test_mix_errors(spark):
    docs = _mk_docs(spark)
    with pytest.raises(ValueError, match="must be > 0"):
        mix_thresholds(docs, {"a": 0.0})
    with pytest.raises(ValueError, match="no documents"):
        mix_thresholds(docs, {"a": 0.5, "nosuch": 0.5})
    with pytest.raises(ValueError, match="non-empty"):
        mix_thresholds(docs, {})


def test_mix_weights_need_not_sum_to_one(spark):
    docs = _mk_docs(spark)
    t1 = mix_thresholds(docs, {"a": 0.6, "b": 0.3})
    t2 = mix_thresholds(docs, {"a": 6.0, "b": 3.0})
    assert t1 == t2
