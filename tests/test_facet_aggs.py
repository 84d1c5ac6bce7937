"""range / filters / extended_stats / string_stats facet aggregations
vs brute-force python oracles over a tiny corpus with metadata."""

from __future__ import annotations

import math
import tempfile
from collections import Counter

import pytest

from inverted_index_spark.operators.boolean import (
    facet_extended_stats,
    facet_ranges,
    facet_string_stats,
    filters_agg,
    parse_query,
)
from inverted_index_spark.operators.build import build_index
from inverted_index_spark.sources.store import SegmentStore

DOCS = [
    # (doc_id, text, lang, n_chars)
    (0, "spark shuffle merge", "en", 120),
    (1, "spark window", "en", 340),
    (2, "quiet river bank", "de", 90),
    (3, "spark spark shuffle", "fr", 510),
    (4, "river bank merge", "en", 260),
    (5, "window merge partition", "de", 400),
    (6, "a quiet dog", "en", 75),
    (7, "partition pruning spark", "fr", 615),
]
Q = "spark OR merge"
# the match set for Q: docs containing spark or merge
MATCHED = [0, 1, 3, 4, 5, 7]


@pytest.fixture(scope="module")
def fstore(spark):
    store = SegmentStore(tempfile.mkdtemp(prefix="ii_facetagg_") + "/idx")
    df = spark.createDataFrame(
        [(d, t) for d, t, _, _ in DOCS], "doc_id long, text string"
    )
    build_index(spark, df, store, bucket_size=4)
    return store


@pytest.fixture(scope="module")
def meta(spark):
    return spark.createDataFrame(
        DOCS, "doc_id long, text string, lang string, n_chars long"
    )


RANGES = [("small", None, 100.0), ("mid", 100.0, 400.0), ("big", 400.0, None)]


def test_facet_ranges(spark, fstore, meta):
    out = facet_ranges(spark, fstore, Q, meta, "n_chars", RANGES).collect()
    stats = {r.range_name: (r.n_docs, r.min_v, r.max_v) for r in out}
    vals = {d: c for d, _, _, c in DOCS}
    for name, lo, hi in RANGES:
        hit = [
            vals[d]
            for d in MATCHED
            if (lo is None or vals[d] >= lo) and (hi is None or vals[d] < hi)
        ]
        if hit:
            assert stats[name] == (len(hit), min(hit), max(hit))
        else:
            assert stats[name][0] == 0
    # request order preserved, every range present
    assert [r.range_name for r in out] == [n for n, _, _ in RANGES]


def test_facet_ranges_overlapping(spark, fstore, meta):
    # ES contract: a doc lands in EVERY range containing it
    ranges = [("all", None, None), ("low", None, 400.0)]
    out = {
        r.range_name: r.n_docs
        for r in facet_ranges(spark, fstore, Q, meta, "n_chars", ranges).collect()
    }
    vals = {d: c for d, _, _, c in DOCS}
    assert out["all"] == len(MATCHED)
    assert out["low"] == sum(1 for d in MATCHED if vals[d] < 400)


def test_filters_agg(spark, fstore, meta):
    filters = {
        "short": "n_chars < 300",
        "en": "lang = 'en'",
        "long_fr": "n_chars >= 500 AND lang = 'fr'",
        "none": "n_chars < 0",
    }
    out = filters_agg(spark, fstore, Q, meta, filters).collect()
    got = {r.bucket: r.n_docs for r in out}
    meta_by_id = {d: (lang, c) for d, _, lang, c in DOCS}
    assert got["short"] == sum(1 for d in MATCHED if meta_by_id[d][1] < 300)
    assert got["en"] == sum(1 for d in MATCHED if meta_by_id[d][0] == "en")
    assert got["long_fr"] == sum(
        1 for d in MATCHED if meta_by_id[d][1] >= 500 and meta_by_id[d][0] == "fr"
    )
    assert got["none"] == 0
    assert [r.bucket for r in out] == list(filters)  # request order


def test_facet_extended_stats(spark, fstore, meta):
    row = facet_extended_stats(spark, fstore, Q, meta, "n_chars").collect()[0]
    vals = [c for d, _, _, c in DOCS if d in MATCHED]
    n = len(vals)
    mean = sum(vals) / n
    var = sum((v - mean) ** 2 for v in vals) / n
    assert row.n_docs == n
    assert row.min_v == min(vals) and row.max_v == max(vals)
    assert row.sum_v == pytest.approx(sum(vals))
    assert row.avg_v == pytest.approx(mean)
    assert row.sum_sq == pytest.approx(sum(v * v for v in vals))
    assert row.variance == pytest.approx(var)
    assert row.std_dev == pytest.approx(math.sqrt(var))


def test_facet_string_stats(spark, fstore, meta):
    row = facet_string_stats(spark, fstore, Q, meta, "lang").collect()[0]
    strs = [lang for d, _, lang, _ in DOCS if d in MATCHED]
    assert row.n_docs == len(strs)
    assert row.min_len == min(len(s) for s in strs)
    assert row.max_len == max(len(s) for s in strs)
    assert row.avg_len == pytest.approx(sum(len(s) for s in strs) / len(strs))
    chars = Counter("".join(strs))
    tot = sum(chars.values())
    want_entropy = -sum(
        (c / tot) * math.log2(c / tot) for c in chars.values()
    )
    assert row.entropy == pytest.approx(want_entropy)


def test_parsed_tree_accepted(spark, fstore, meta):
    # all four accept a pre-parsed tree too
    tree = parse_query(Q)
    assert facet_extended_stats(spark, fstore, tree, meta, "n_chars").count() == 1


# --------------------------------------- weighted_avg / mad / matrix_stats


def test_facet_weighted_avg(spark, fstore, meta):
    from inverted_index_spark.operators.aggregations import facet_weighted_avg

    # weight = doc_id + 1 (deterministic, nonzero), value = n_chars
    docs = meta.withColumn("w", meta.doc_id + 1)
    row = facet_weighted_avg(spark, fstore, Q, docs, "n_chars", "w").collect()[0]
    vals = {d: c for d, _, _, c in DOCS}
    num = sum(vals[d] * (d + 1) for d in MATCHED)
    den = sum(d + 1 for d in MATCHED)
    assert row["n_docs"] == len(MATCHED)
    assert row["weighted_avg"] == pytest.approx(num / den)
    assert row["sum_weight"] == pytest.approx(den)


def test_facet_weighted_avg_missing_semantics(spark, fstore, meta):
    from pyspark.sql import functions as F

    from inverted_index_spark.operators.aggregations import facet_weighted_avg

    # ES defaults: a null WEIGHT counts as 1, a null VALUE skips the doc
    docs = meta.withColumn(
        "w", F.when(meta.doc_id == 0, None).otherwise(meta.doc_id + 1)
    ).withColumn(
        "v", F.when(meta.doc_id == 1, None).otherwise(meta.n_chars)
    )
    row = facet_weighted_avg(spark, fstore, Q, docs, "v", "w").collect()[0]
    kept = [d for d in MATCHED if d != 1]
    vals = {d: c for d, _, _, c in DOCS}
    wts = {d: (1 if d == 0 else d + 1) for d in kept}
    num = sum(vals[d] * wts[d] for d in kept)
    den = sum(wts[d] for d in kept)
    assert row["n_docs"] == len(kept)
    assert row["weighted_avg"] == pytest.approx(num / den)


def _median(xs):
    xs = sorted(xs)
    n = len(xs)
    mid = n // 2
    return float(xs[mid]) if n % 2 else (xs[mid - 1] + xs[mid]) / 2.0


def test_facet_mad(spark, fstore, meta):
    from inverted_index_spark.operators.aggregations import facet_mad

    row = facet_mad(spark, fstore, Q, meta, "n_chars").collect()[0]
    vals = [c for d, _, _, c in DOCS if d in MATCHED]
    med = _median(vals)
    want = _median([abs(v - med) for v in vals])
    assert row["n_docs"] == len(MATCHED)
    assert row["mad"] == pytest.approx(want)


def test_matrix_stats(spark, fstore, meta):
    from inverted_index_spark.operators.aggregations import matrix_stats

    # second numeric column correlated-with-noise against n_chars
    docs = meta.withColumn("score2", (meta.n_chars * 2 + meta.doc_id * 37))
    out = matrix_stats(spark, fstore, Q, docs, ["n_chars", "score2"]).collect()
    vals = {d: c for d, _, _, c in DOCS}
    xs = [float(vals[d]) for d in MATCHED]
    ys = [float(vals[d] * 2 + d * 37) for d in MATCHED]
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    # ES MatrixStatsResults normalizes by n-1 (sample covariance)
    cov_xy = sum((a - mx) * (b - my) for a, b in zip(xs, ys)) / (n - 1)
    var_x = sum((a - mx) ** 2 for a in xs) / (n - 1)
    var_y = sum((b - my) ** 2 for b in ys) / (n - 1)
    corr = cov_xy / math.sqrt(var_x * var_y)
    rows = {(r["col_x"], r["col_y"]): r for r in out}
    assert set(rows) == {
        ("n_chars", "n_chars"), ("n_chars", "score2"), ("score2", "score2")
    }
    d = rows[("n_chars", "score2")]
    assert d["n_docs"] == n
    assert d["mean_x"] == pytest.approx(mx)
    assert d["mean_y"] == pytest.approx(my)
    assert d["covariance"] == pytest.approx(cov_xy)
    assert d["correlation"] == pytest.approx(corr)
    assert rows[("n_chars", "n_chars")]["covariance"] == pytest.approx(var_x)
    assert rows[("n_chars", "n_chars")]["correlation"] == pytest.approx(1.0)
    with pytest.raises(ValueError):
        matrix_stats(spark, fstore, Q, docs, ["n_chars"])


def test_matrix_stats_drops_rows_missing_any_field(spark, fstore, meta):
    from pyspark.sql import functions as F

    from inverted_index_spark.operators.aggregations import matrix_stats

    docs = meta.withColumn(
        "score2", F.when(meta.doc_id == 3, None).otherwise(meta.n_chars + 1)
    )
    out = matrix_stats(spark, fstore, Q, docs, ["n_chars", "score2"]).collect()
    n = len([d for d in MATCHED if d != 3])
    assert all(r["n_docs"] == n for r in out)


# ------------------------------------------------- sampler / diversified


def test_sampler_agg_equals_ranked_topk(spark, fstore):
    from inverted_index_spark.operators.aggregations import sampler_agg
    from inverted_index_spark.operators.boolean import ranked_topk

    got = [
        (r["doc_id"], r["score"])
        for r in sampler_agg(spark, fstore, Q, shard_size=4).collect()
    ]
    want = [
        (r["doc_id"], r["score"])
        for r in ranked_topk(spark, fstore, Q, k=4).collect()
    ]
    assert [d for d, _ in got] == [d for d, _ in want]
    for (_, a), (_, b) in zip(got, want):
        assert a == pytest.approx(b)


def test_diversified_sampler_caps_per_value(spark, fstore, meta):
    from inverted_index_spark.operators.aggregations import sampler_agg
    from inverted_index_spark.operators.boolean import ranked_topk

    sample = sampler_agg(
        spark, fstore, Q, shard_size=10,
        diversify_docs=meta, diversify_col="lang", max_docs_per_value=1,
    ).collect()
    langs = {d: l for d, _, l, _ in DOCS}
    seen = [langs[r["doc_id"]] for r in sample]
    assert len(seen) == len(set(seen))  # one doc per lang
    # and each survivor is its lang's best-ranked match
    ranked = ranked_topk(spark, fstore, Q, k=len(MATCHED)).collect()
    best = {}
    for r in ranked:
        best.setdefault(langs[r["doc_id"]], r["doc_id"])
    assert {r["doc_id"] for r in sample} == set(best.values())


def test_sampler_agg_validation(spark, fstore, meta):
    from inverted_index_spark.operators.aggregations import sampler_agg

    with pytest.raises(ValueError):
        sampler_agg(spark, fstore, Q, shard_size=0)
    with pytest.raises(ValueError):
        sampler_agg(spark, fstore, Q, diversify_col="lang")  # missing docs
    with pytest.raises(ValueError):
        sampler_agg(
            spark, fstore, Q, diversify_docs=meta, diversify_col="lang",
            max_docs_per_value=0,
        )


def test_facet_percentile_ranks(spark, fstore, meta):
    from inverted_index_spark.operators.aggregations import (
        facet_percentile_ranks,
    )

    vals = {d: c for d, _, _, c in DOCS}
    xs = [vals[d] for d in MATCHED]
    req = (100.0, 340.0, 999.0)
    out = facet_percentile_ranks(
        spark, fstore, Q, meta, "n_chars", req
    ).collect()
    assert [r["value"] for r in out] == list(req)
    for r in out:
        want = 100.0 * sum(1 for x in xs if x <= r["value"]) / len(xs)
        assert r["n_docs"] == len(xs)
        assert r["pct_rank"] == pytest.approx(want)


def test_facet_percentile_ranks_skips_null(spark, fstore, meta):
    from pyspark.sql import functions as F

    from inverted_index_spark.operators.aggregations import (
        facet_percentile_ranks,
    )

    docs = meta.withColumn(
        "v", F.when(meta.doc_id == 0, None).otherwise(meta.n_chars)
    )
    out = facet_percentile_ranks(
        spark, fstore, Q, docs, "v", (999.0,)
    ).collect()
    assert out[0]["n_docs"] == len(MATCHED) - 1
    assert out[0]["pct_rank"] == pytest.approx(100.0)


def test_facet_percentile_ranks_empty_values(spark, fstore, meta):
    from inverted_index_spark.operators.aggregations import (
        facet_percentile_ranks,
    )

    with pytest.raises(ValueError):
        facet_percentile_ranks(spark, fstore, Q, meta, "n_chars", ())


def test_facet_boxplot(spark, fstore, meta):
    import numpy as np

    from inverted_index_spark.operators.aggregations import facet_boxplot

    vals = {d: c for d, _, _, c in DOCS}
    xs = [float(vals[d]) for d in MATCHED]
    row = facet_boxplot(spark, fstore, Q, meta, "n_chars").collect()[0]
    assert row["n_docs"] == len(xs)
    assert row["min_v"] == min(xs)
    assert row["max_v"] == max(xs)
    for name, p in (("q1", 25), ("q2", 50), ("q3", 75)):
        assert row[name] == pytest.approx(
            float(np.percentile(xs, p, method="linear"))
        )


def test_top_metrics(spark, fstore, meta):
    from inverted_index_spark.operators.aggregations import top_metrics

    vals = {d: c for d, _, _, c in DOCS}
    langs = {d: lg for d, _, lg, _ in DOCS}
    out = top_metrics(
        spark, fstore, Q, meta, "n_chars", ["lang"], k=3
    ).collect()
    want = sorted(MATCHED, key=lambda d: (-vals[d], d))[:3]
    assert [r["doc_id"] for r in out] == want
    assert [r["lang"] for r in out] == [langs[d] for d in want]
    assert [r["n_chars"] for r in out] == [vals[d] for d in want]
    # ascending variant
    out = top_metrics(
        spark, fstore, Q, meta, "n_chars", ["lang"], k=2, ascending=True
    ).collect()
    want = sorted(MATCHED, key=lambda d: (vals[d], d))[:2]
    assert [r["doc_id"] for r in out] == want


def test_missing_agg(spark, fstore, meta):
    from pyspark.sql import functions as F

    from inverted_index_spark.operators.aggregations import missing_agg

    # null the lang of docs 1 and 4 (both in the match set) and doc 2
    # (outside it) — only in-match nulls count
    docs = meta.withColumn(
        "lg",
        F.when(meta.doc_id.isin([1, 2, 4]), None).otherwise(meta.lang),
    )
    row = missing_agg(spark, fstore, Q, docs, "lg").collect()[0]
    assert row["n_docs"] == len(MATCHED)
    assert row["n_missing"] == 2
