"""int8 scalar quantization + quantized-then-rescored ANN: round-trip
error bounds, determinism, and recall against the exact scorer."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from inverted_index_spark.operators.similarity import (
    cosine_scores,
    cosine_topk,
    quantize_embeddings,
    quantized_topk,
)

EMB = "/root/testdata/sf0.001/embeddings.parquet"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(EMB)


@pytest.fixture(scope="module")
def qvec(emb):
    row = emb.where(F.col("vec_id") == 0).first()
    return [float(x) for x in row["embedding"]]


def test_roundtrip_error_bound(spark, emb):
    got = quantize_embeddings(emb).join(emb, "vec_id").collect()
    assert got
    for r in got:
        x = np.asarray([float(v) for v in r["embedding"]])
        q = np.asarray(r["qvec"], dtype=np.int64)
        assert np.abs(q).max() <= 127
        if r["scale"] == 0.0:
            assert not q.any()
        else:
            # floor(x/s + .5) is within half a step of x/s
            assert np.max(np.abs(x - q * r["scale"])) <= r["scale"] / 2 + 1e-12


def test_rescored_scores_are_exact(spark, emb, qvec):
    """Phase-2 scores must equal the exact cosine for the same ids —
    quantization may only affect WHICH candidates enter the window."""
    got = {
        r["vec_id"]: r["cosine"]
        for r in quantized_topk(emb, qvec, k=10, rescore_factor=4).collect()
    }
    exact = {
        r["vec_id"]: r["cosine"]
        for r in cosine_scores(emb, qvec).collect()
    }
    for vid, c in got.items():
        assert c == pytest.approx(exact[vid], abs=1e-12)


def test_recall_vs_exact(spark, emb, qvec):
    approx_ids = {
        r["vec_id"]
        for r in quantized_topk(emb, qvec, k=10, rescore_factor=4).collect()
    }
    exact_ids = {
        r["vec_id"] for r in cosine_topk(emb, qvec, k=10).collect()
    }
    # int8 + 4x rescore window: near-lossless on this data
    assert len(approx_ids & exact_ids) >= 9


def test_zero_vector_and_bad_args(spark, emb):
    zeros = spark.createDataFrame(
        [(999, [0.0] * 8)], "vec_id long, embedding array<float>"
    )
    out = quantized_topk(zeros, [1.0] + [0.0] * 7, k=1).collect()
    assert out[0]["vec_id"] == 999  # survives, scored 0/NaN-free path
    with pytest.raises(ValueError):
        quantized_topk(zeros, [1.0] * 8, k=0)
