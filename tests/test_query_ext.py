"""Prefix term reads (FST range-seek analog) + generic ordered-V
indexing (timestamps as posting values — reference README.md:7,28)."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from inverted_index_spark.operators.build import SegmentWriter, build_value_index
from inverted_index_spark.operators.query import (
    read_terms_prefix,
    read_values,
    read_values_prefix,
)
from inverted_index_spark.sources.store import SegmentStore


@pytest.fixture(scope="module")
def prefix_store(spark):
    store = SegmentStore(tempfile.mkdtemp(prefix="ii_pfx_") + "/idx")
    w = SegmentWriter(spark, store, bucket_size=8)
    w.put("apple", [1, 5, 9])
    w.put("applesauce", [2])
    w.put("apply", [3, 5])
    w.put("banana", [4])
    w.put("app", [7])
    w.put("zebra", [])
    w.close()
    return store


def test_terms_prefix(spark, prefix_store):
    got = [r["term"] for r in read_terms_prefix(spark, prefix_store, "app").collect()]
    assert got == ["app", "apple", "applesauce", "apply"]
    assert read_terms_prefix(spark, prefix_store, "zzz").count() == 0
    # empty-postings registered term still enumerable by prefix
    assert [r["term"] for r in read_terms_prefix(spark, prefix_store, "z").collect()] == ["zebra"]


def test_values_prefix(spark, prefix_store):
    got = [r["doc_id"] for r in read_values_prefix(spark, prefix_store, "appl").collect()]
    assert got == [1, 2, 3, 5, 9]  # union of apple/applesauce/apply, sorted unique
    scoped = [
        r["doc_id"]
        for r in read_values_prefix(spark, prefix_store, "appl", 2, 5).collect()
    ]
    assert scoped == [2, 3, 5]


def test_terms_regex(spark, prefix_store):
    from inverted_index_spark.operators.query import read_terms_regex

    got = [r["term"] for r in read_terms_regex(spark, prefix_store, "app.*e").collect()]
    assert got == ["apple", "applesauce"]
    assert read_terms_regex(spark, prefix_store, "x+").count() == 0
    # full-match anchoring: 'app' alone must not match 'apple'
    assert [r["term"] for r in read_terms_regex(spark, prefix_store, "app").collect()] == ["app"]


def test_value_index_timestamps(spark):
    """Index event types by occurrence time; range-read = time window."""
    store = SegmentStore(tempfile.mkdtemp(prefix="ii_ts_") + "/idx")
    rows = [
        ("click", 1_700_000_000_000_000),
        ("click", 1_700_000_060_000_000),
        ("view", 1_700_000_030_000_000),
        ("click", 1_700_000_000_000_000),  # duplicate (term, value) → deduped
        ("error", 1_700_009_999_000_000),
    ]
    df = spark.createDataFrame(rows, "event_type string, ts_us long")
    build_value_index(spark, df, store, "event_type", "ts_us", bucket_size=1 << 26)
    all_clicks = [r["doc_id"] for r in read_values(spark, store, ["click"]).collect()]
    assert all_clicks == [1_700_000_000_000_000, 1_700_000_060_000_000]
    window = [
        r["doc_id"]
        for r in read_values(
            spark, store, ["click", "view"],
            1_700_000_010_000_000, 1_700_000_070_000_000,
        ).collect()
    ]
    assert window == [1_700_000_030_000_000, 1_700_000_060_000_000]


def test_except_values(spark, prefix_store):
    from inverted_index_spark.operators.query import except_values

    got = [
        r["doc_id"]
        for r in except_values(
            spark, prefix_store, ["apple", "banana"], ["apply"]
        ).collect()
    ]
    # apple {1,5,9} ∪ banana {4} minus apply {3,5} = {1,4,9}
    assert got == [1, 4, 9]
    # empty exclude ≡ plain OR read
    assert [
        r["doc_id"]
        for r in except_values(spark, prefix_store, ["banana"], []).collect()
    ] == [4]
    # range applies to both sides
    assert [
        r["doc_id"]
        for r in except_values(
            spark, prefix_store, ["apple", "banana"], ["apply"], 4, 9
        ).collect()
    ] == [4, 9]


def test_fuzzy_terms(spark, prefix_store):
    from inverted_index_spark.operators.query import fuzzy_terms, fuzzy_values

    def fz(probe):
        return [r["term"] for r in fuzzy_terms(spark, prefix_store, probe).collect()]

    assert fz("aple") == ["apple"]          # insertion fixes it
    assert fz("aplly") == ["apply"]         # substitution
    assert fz("app") == ["app"]             # exact (apple/apply are d=2)
    assert fz("banana") == ["banana"]
    assert fz("bananaz") == ["banana"]      # trailing insert
    assert fz("qqqq") == []
    # fuzzy retrieval unions the matched terms' postings
    got = [r["doc_id"] for r in fuzzy_values(spark, prefix_store, "aple").collect()]
    assert got == [1, 5, 9]  # apple's postings


def _lev(a: str, b: str) -> int:
    """Plain Levenshtein DP (test oracle)."""
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_fuzzy_terms_d2(spark, prefix_store):
    """Round-4: d=2 (Lucene FuzzyQuery's full surface) via depth-2
    SymSpell deletion neighborhoods in codegen, vs brute-force
    levenshtein over the whole dictionary."""
    from inverted_index_spark.operators.query import fuzzy_terms, fuzzy_values

    vocab = ["app", "apple", "applesauce", "apply", "banana", "zebra"]

    def fz(probe, d):
        return [r["term"] for r in fuzzy_terms(spark, prefix_store, probe, d).collect()]

    for probe in ["aple", "app", "aply", "bananas", "zbr", "qqqq", "applesauce",
                  "pple", "apx", "ba"]:
        for d in (1, 2):
            want = sorted(t for t in vocab if _lev(t, probe) <= d)
            assert fz(probe, d) == want, (probe, d)
    # d=2 retrieval unions the wider neighborhood's postings
    got = [r["doc_id"] for r in fuzzy_values(spark, prefix_store, "aply", 2).collect()]
    # d=2 matches app{7}, apple{1,5,9}, apply{3,5}
    assert got == [1, 3, 5, 7, 9]
    with pytest.raises(NotImplementedError):
        fuzzy_terms(spark, prefix_store, "x", 3)


def test_deletion_neighborhood_completeness():
    """Property behind the candidate filter: lev(a,b) <= d implies the
    depth-d deletion neighborhoods intersect (SymSpell), exercised over
    random edit chains so the codegen filter can never lose a match."""
    import random

    from inverted_index_spark.operators.query import _deletion_variants

    rng = random.Random(11)
    alphabet = "abcde"
    for _ in range(300):
        base = "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 9)))
        other = base
        for _ in range(rng.randint(0, 2)):  # apply <=2 random edits
            op = "ins" if not other else rng.choice(["ins", "del", "sub"])
            i = rng.randrange(len(other) + (op == "ins"))
            if op == "ins":
                other = other[:i] + rng.choice(alphabet) + other[i:]
            elif op == "del" and other:
                other = other[:i] + other[i + 1 :]
            elif other:
                other = other[:i] + rng.choice(alphabet) + other[i + 1 :]
        d = _lev(base, other)
        if d > 2 or not other:
            continue
        dd = max(d, 1)
        assert set(_deletion_variants(base, dd)) & set(_deletion_variants(other, dd)), (
            base, other, d,
        )


def test_top_terms(spark, prefix_store):
    from inverted_index_spark.operators.query import top_terms

    got = [(r["term"], r["df"]) for r in top_terms(spark, prefix_store, k=10).collect()]
    # dfs: apple 3, apply 2, then df=1 alphabetical, zebra df=0 last
    assert got == [
        ("apple", 3), ("apply", 2), ("app", 1), ("applesauce", 1),
        ("banana", 1), ("zebra", 0),
    ]
    assert len(top_terms(spark, prefix_store, k=2).collect()) == 2


def test_read_terms_suffix(spark, prefix_store):
    from inverted_index_spark.operators.query import read_terms_suffix

    got = [r["term"] for r in read_terms_suffix(spark, prefix_store, "e").collect()]
    assert got == ["apple", "applesauce"]
    assert read_terms_suffix(spark, prefix_store, "zzz").count() == 0


def test_read_values_regex(spark, prefix_store):
    from inverted_index_spark.operators.query import read_values_regex

    got = [r["doc_id"] for r in read_values_regex(spark, prefix_store, "app.*").collect()]
    assert got == [1, 2, 3, 5, 7, 9]
    # range applies
    got = [
        r["doc_id"]
        for r in read_values_regex(spark, prefix_store, "app.*", 3, 7).collect()
    ]
    assert got == [3, 5, 7]
    assert read_values_regex(spark, prefix_store, "zz.*").count() == 0


def test_read_values_regex_expansion_cap(spark, prefix_store):
    from inverted_index_spark.operators.query import read_values_regex

    with pytest.raises(ValueError, match="expands to more than"):
        read_values_regex(spark, prefix_store, ".*", max_terms=2)
    # under the cap the same pattern works
    got = [r["doc_id"] for r in read_values_regex(spark, prefix_store, ".*").collect()]
    assert got == [1, 2, 3, 4, 5, 7, 9]


def test_value_index_unsigned_full_uint64(spark):
    """Round-5 reference parity (README.md:7 — any cmp.Ordered V incl.
    full uint64): unsigned value indexes store sign-bit-flipped longs,
    so values in [2^63, 2^64) sort, bucket, prune, and range-read in
    true UNSIGNED order. Values/bounds use the wrapped-long image."""
    from inverted_index_spark.operators.build import build_value_index
    from inverted_index_spark.operators.query import read_values_unsigned

    def wrap(u: int) -> int:  # uint64 → wrapped int64
        return u - (1 << 64) if u >= (1 << 63) else u

    U = [0, 1, 2**62, 2**63 - 1, 2**63, 2**63 + 5, 2**64 - 2, 2**64 - 1]
    store = SegmentStore(tempfile.mkdtemp(prefix="ii_u64_") + "/idx")
    df = spark.createDataFrame(
        [("k", wrap(u)) for u in U], "event_type string, v long"
    )
    build_value_index(
        spark, df, store, "event_type", "v", bucket_size=1 << 30, unsigned=True
    )
    got = [
        r["doc_id"]
        for r in read_values_unsigned(spark, store, ["k"]).collect()
    ]
    assert got == [wrap(u) for u in U]  # unsigned sort order, exact values
    # unsigned range crossing the 2^63 boundary
    window = [
        r["doc_id"]
        for r in read_values_unsigned(
            spark, store, ["k"], wrap(2**62), wrap(2**63 + 5)
        ).collect()
    ]
    assert window == [wrap(u) for u in [2**62, 2**63 - 1, 2**63, 2**63 + 5]]
    # upper-half-only range, incl. 2^64-1
    top = [
        r["doc_id"]
        for r in read_values_unsigned(
            spark, store, ["k"], wrap(2**64 - 2), wrap(2**64 - 1)
        ).collect()
    ]
    assert top == [wrap(2**64 - 2), wrap(2**64 - 1)]
    # a SIGNED doc-id build still rejects negatives loudly (guard kept)
    from inverted_index_spark.operators.build import build_index

    bad = spark.createDataFrame([(-5, "x y")], "doc_id long, text string")
    with pytest.raises(ValueError, match="negative doc_id"):
        build_index(
            spark, bad,
            SegmentStore(tempfile.mkdtemp(prefix="ii_neg_") + "/idx"),
            bucket_size=4,
        )


def test_spell_suggest_ranked_by_df(spark, prefix_store):
    from inverted_index_spark.operators.query import spell_suggest

    # probe 'aple': d1 = apple(3); d2 = app(1), apply(2)
    got = [
        (r["term"], r["df"])
        for r in spell_suggest(spark, prefix_store, "aple", max_edits=2, k=5).collect()
    ]
    assert got == [("apple", 3), ("apply", 2), ("app", 1)]
    # k truncates after the df-desc/term-asc order
    top1 = spell_suggest(spark, prefix_store, "aple", max_edits=2, k=1).collect()
    assert [(r["term"], r["df"]) for r in top1] == [("apple", 3)]
    # no candidates -> empty frame with the contract schema
    none = spell_suggest(spark, prefix_store, "qqqqqqqq", max_edits=2)
    assert none.columns == ["term", "df"] and none.count() == 0


def test_spell_suggest_multi_segment_exact_df(spark):
    """Under segment overlap the metadata-df shortcut is invalid;
    spell_suggest must count decoded distinct docs."""
    from inverted_index_spark.operators.query import spell_suggest

    store = SegmentStore(tempfile.mkdtemp(prefix="ii_sgg_") + "/idx")
    w = SegmentWriter(spark, store, bucket_size=8)
    w.put("table", [1, 2])
    w.close()
    w2 = SegmentWriter(spark, store, bucket_size=8)
    w2.put("table", [2, 3])  # doc 2 overlaps -> df is 3, not 4
    w2.put("fable", [9])
    w2.close()
    got = [
        (r["term"], r["df"])
        for r in spell_suggest(spark, store, "tble", max_edits=2, k=5).collect()
    ]
    assert got == [("table", 3), ("fable", 1)]
    # at d=1 only 'table' is reachable ('fable' is two edits away)
    d1 = [
        (r["term"], r["df"])
        for r in spell_suggest(spark, store, "tble", max_edits=1, k=5).collect()
    ]
    assert d1 == [("table", 3)]


def test_value_histogram(spark):
    from inverted_index_spark.operators.query import value_histogram

    store = SegmentStore(tempfile.mkdtemp(prefix="ii_hist_") + "/idx")
    w = SegmentWriter(spark, store, bucket_size=1 << 30)
    # values double as ordered V (e.g. timestamps); duplicates across
    # terms collapse (R10 sorted-unique read)
    w.put("click", [5, 15, 25, 105])
    w.put("view", [15, 35, 205])
    w.close()
    got = [
        (r["bucket"], r["n"])
        for r in value_histogram(spark, store, ["click", "view"], bucket=100).collect()
    ]
    # distinct values {5,15,25,35,105,205} -> buckets 0:4, 100:1, 200:1
    assert got == [(0, 4), (100, 1), (200, 1)]
    scoped = [
        (r["bucket"], r["n"])
        for r in value_histogram(
            spark, store, ["click", "view"], bucket=100, min_val=10, max_val=110
        ).collect()
    ]
    assert scoped == [(0, 3), (100, 1)]
    with pytest.raises(ValueError):
        value_histogram(spark, store, ["click"], bucket=0)


def test_complete_terms(spark, prefix_store):
    from inverted_index_spark.operators.query import complete_terms

    got = [
        (r["term"], r["df"])
        for r in complete_terms(spark, prefix_store, "app", k=3).collect()
    ]
    # df ranks: apple(3) > apply(2) > app(1)=applesauce(1), term ASC tie
    assert got == [("apple", 3), ("apply", 2), ("app", 1)]
    full = [
        (r["term"], r["df"])
        for r in complete_terms(spark, prefix_store, "app", k=10).collect()
    ]
    assert full == [("apple", 3), ("apply", 2), ("app", 1), ("applesauce", 1)]
    assert complete_terms(spark, prefix_store, "zzz").count() == 0
    # empty-postings term: df 0, still completable
    assert [
        (r["term"], r["df"])
        for r in complete_terms(spark, prefix_store, "zeb").collect()
    ] == [("zebra", 0)]


def test_complete_terms_multiseg(spark):
    """Overlapping segments: df counts distinct docs, not row sums."""
    from inverted_index_spark.operators.build import SegmentWriter
    from inverted_index_spark.operators.query import complete_terms

    store = SegmentStore(tempfile.mkdtemp(prefix="ii_cmpl_") + "/idx")
    w = SegmentWriter(spark, store, bucket_size=8)
    w.put("apple", [1, 2])
    w.close()
    w = SegmentWriter(spark, store, bucket_size=8)
    w.put("apple", [2, 3])
    w.put("apricot", [5])
    w.close()
    got = [
        (r["term"], r["df"])
        for r in complete_terms(spark, store, "ap", k=5).collect()
    ]
    assert got == [("apple", 3), ("apricot", 1)]
