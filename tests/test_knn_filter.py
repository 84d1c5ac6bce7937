"""Filtered kNN (ES knn-with-filter, PRE-filter semantics) — predicate
filter, allowed-ids semi-join, and the lexically-filtered variant whose
filter is an inverted-index boolean query."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from inverted_index_spark.operators.build import build_index
from inverted_index_spark.operators.similarity import (
    cosine_topk,
    filtered_topk,
    knn_with_query,
)
from inverted_index_spark.sources.store import SegmentStore


def _vecs(spark, n=40, dim=6, seed=7):
    rng = np.random.default_rng(seed)
    rows = [
        (i, [float(x) for x in rng.standard_normal(dim)], int(i % 4))
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )


def _brute(rows, q, k, allowed):
    q = np.asarray(q, dtype=np.float64)
    qn = np.linalg.norm(q)
    scored = []
    for r in rows:
        if r["vec_id"] not in allowed:
            continue
        v = np.asarray(r["embedding"], dtype=np.float64)
        d = np.linalg.norm(v) * qn
        scored.append((r["vec_id"], float(v @ q / d) if d else 0.0))
    scored.sort(key=lambda t: (-t[1], t[0]))
    return [v for v, _ in scored[:k]]


def test_filtered_topk_predicate(spark):
    vecs = _vecs(spark)
    rows = vecs.collect()
    q = [1.0, 0.5, -0.25, 0.0, 2.0, -1.0]
    allowed = {r["vec_id"] for r in rows if r["label"] in (1, 3)}
    got = [
        r["vec_id"]
        for r in filtered_topk(
            vecs, q, k=7, predicate=F.col("label").isin(1, 3)
        ).collect()
    ]
    assert got == _brute(rows, q, 7, allowed)
    # SQL-string predicate takes the same path
    got_sql = [
        r["vec_id"]
        for r in filtered_topk(vecs, q, k=7, predicate="label IN (1, 3)").collect()
    ]
    assert got_sql == got


def test_filtered_topk_allowed_ids(spark):
    vecs = _vecs(spark)
    rows = vecs.collect()
    q = [0.0, 1.0, 1.0, 0.0, -1.0, 0.5]
    ids = [3, 5, 8, 13, 21, 34]
    allowed_df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = [
        r["vec_id"]
        for r in filtered_topk(vecs, q, k=4, allowed_ids=allowed_df).collect()
    ]
    assert got == _brute(rows, q, 4, set(ids))


def test_prefilter_semantics_k_survivors(spark):
    """PRE-filter: k survivors come back whenever k survivors exist,
    even when the global (unfiltered) top-k is entirely filtered out —
    the failure mode of post-filtering."""
    # vec_id 0..3 point at the query (global top-4); 4..9 point away
    rows = [(i, [1.0, 0.0], 0) for i in range(4)] + [
        (i, [-1.0, float(i) * 0.01], 1) for i in range(4, 10)
    ]
    vecs = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    q = [1.0, 0.0]
    unfiltered = {r["vec_id"] for r in cosine_topk(vecs, q, k=4).collect()}
    assert unfiltered == {0, 1, 2, 3}
    got = filtered_topk(vecs, q, k=4, predicate="label = 1").collect()
    assert len(got) == 4  # post-filtering the global top-4 would yield 0
    assert all(r["vec_id"] >= 4 for r in got)


def test_knn_with_query(spark, tmp_path):
    """Lexically-filtered kNN: only docs matching the boolean query are
    vector-scored; equals brute force over the query's match set."""
    docs = spark.createDataFrame(
        [
            (0, "spark merge window"),
            (1, "spark table scan"),
            (2, "window table hash"),
            (3, "unrelated words entirely"),
            (4, "spark window index"),
            (5, "merge only here"),
        ],
        "doc_id long, text string",
    )
    store = SegmentStore(str(tmp_path / "knnq_idx"))
    build_index(spark, docs, store, bucket_size=2)
    vecs = spark.createDataFrame(
        [(i, [float(i % 3), 1.0, float(i)], 0) for i in range(6)],
        "vec_id long, embedding array<float>, label int",
    )
    q = [0.5, 1.0, 3.0]
    got = [
        r["vec_id"]
        for r in knn_with_query(
            spark, store, "spark AND window", q, vecs, k=10
        ).collect()
    ]
    assert got == _brute(vecs.collect(), q, 10, {0, 4})
    # a query matching nothing yields an empty result, not an error
    assert (
        knn_with_query(spark, store, "nosuchterm", q, vecs, k=5).count() == 0
    )
