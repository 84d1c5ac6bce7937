"""chunk_documents (RAG sliding windows): reconstruction and overlap
invariants, hypothesis-style over deterministic cases."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from inverted_index_spark.operators.corpus import chunk_documents


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, ""),
        (1, "   "),
        (2, "one"),
        (3, " ".join(f"t{i}" for i in range(7))),
        (4, " ".join(f"t{i}" for i in range(12))),
        (5, " ".join(f"t{i}" for i in range(100))),
        (6, "a  b\tc\nd   e"),  # runs of whitespace collapse
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.mark.parametrize("chunk,overlap", [(5, 0), (5, 2), (8, 7), (3, 1)])
def test_invariants(spark, docs, chunk, overlap):
    stride = chunk - overlap
    out = chunk_documents(docs, chunk, overlap).collect()
    originals = {
        r["doc_id"]: (r["text"].split() if r["text"].split() else [])
        for r in docs.collect()
    }
    by_doc: dict[int, list] = {}
    for r in sorted(out, key=lambda r: (r["doc_id"], r["chunk_idx"])):
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == set(originals)  # total: every doc chunks
    for d, rows in by_doc.items():
        toks = originals[d]
        # window starts are 0, stride, ... while start < max(len, 1)
        want_starts = list(range(0, max(len(toks), 1), stride))
        assert [r["start_tok"] for r in rows] == want_starts
        assert [r["chunk_idx"] for r in rows] == list(range(len(want_starts)))
        for r in rows:
            window = toks[r["start_tok"] : r["start_tok"] + chunk]
            assert r["chunk"] == " ".join(window)
            assert r["n_tokens"] == len(window)
        # consecutive full windows share exactly `overlap` tokens
        for a, b in zip(rows, rows[1:]):
            a_toks = a["chunk"].split()
            b_toks = b["chunk"].split()
            if len(a_toks) == chunk:
                assert a_toks[stride:] == b_toks[: len(a_toks[stride:])]
        # reconstruction: stride-prefixes concatenated == original
        recon = []
        for r in rows:
            recon.extend(r["chunk"].split()[:stride])
        recon.extend(rows[-1]["chunk"].split()[stride:])
        assert recon == toks


def test_bad_args(spark, docs):
    with pytest.raises(ValueError, match="chunk_tokens"):
        chunk_documents(docs, 0)
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(docs, 4, 4)


def test_no_shuffle(spark, docs):
    plan = chunk_documents(docs, 8, 2)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
