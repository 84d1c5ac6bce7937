"""fetch_context vs a brute-force oracle over the deterministic
transcript generator — per-hit windows, group boundaries, overlap."""

from __future__ import annotations

import pytest

from inverted_index_spark.operators.context import fetch_context
from inverted_index_spark.sources.transcripts import generate_transcripts


@pytest.fixture(scope="module")
def corpus(spark):
    tx = generate_transcripts(spark, 300, include_doc_id=True)
    rows = tx.collect()
    return tx, rows


def _oracle(rows, hit_ids, nb, na):
    by_conv = {}
    for r in rows:
        by_conv.setdefault(r["conv_id"], {})[r["turn_idx"]] = r
    idx = {r["doc_id"]: r for r in rows}
    out = []
    for hid in hit_ids:
        h = idx[hid]
        conv = by_conv[h["conv_id"]]
        for off in range(-nb, na + 1):
            t = h["turn_idx"] + off
            if t in conv:
                out.append((hid, conv[t]["doc_id"], off))
    return sorted(out)


@pytest.mark.parametrize("nb,na", [(1, 1), (0, 2), (3, 0), (0, 0)])
def test_fetch_context_matches_oracle(spark, corpus, nb, na):
    tx, rows = corpus
    # hits spanning conv starts, middles, and ends
    hit_ids = [0, 3, 7, 50, 123, rows[-1]["doc_id"]]
    hits = tx.where(tx.doc_id.isin(hit_ids))
    got = sorted(
        (r["hit_id"], r["doc_id"], r["offset"])
        for r in fetch_context(
            hits, tx, "conv_id", "turn_idx", nb, na
        ).collect()
    )
    assert got == _oracle(rows, hit_ids, nb, na)


def test_fetch_context_carries_text_and_zero_offset_is_hit(spark, corpus):
    tx, rows = corpus
    hits = tx.where(tx.doc_id == 10)
    out = fetch_context(hits, tx, "conv_id", "turn_idx", 1, 1).collect()
    self_row = [r for r in out if r["offset"] == 0]
    assert len(self_row) == 1 and self_row[0]["doc_id"] == 10
    src = {r["doc_id"]: r["text"] for r in rows}
    assert all(r["text"] == src[r["doc_id"]] for r in out)


def test_fetch_context_rejects_negative_window(spark, corpus):
    tx, _ = corpus
    with pytest.raises(ValueError):
        fetch_context(tx.limit(1), tx, "conv_id", "turn_idx", -1, 0)
