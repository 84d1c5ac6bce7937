"""Distributed BPE learn/encode vs the scalar reference twin."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from inverted_index_spark.functions.tokenizer import tokenize_text
from inverted_index_spark.operators.bpe import (
    EOW,
    encode_bpe,
    encode_word_py,
    learn_bpe,
    learn_bpe_py,
    word_counts,
)

TEXTS = [
    "low lower lowest",
    "new newer newest newest",
    "wide wider widest low low",
    "бесплатно бесплатный",
    "",
]


def _df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_word_counts(spark):
    got = {
        r["word"]: r["n"] for r in word_counts(_df(spark, TEXTS)).collect()
    }
    want: dict[str, int] = {}
    for t in TEXTS:
        for w in tokenize_text(t):
            want[w] = want.get(w, 0) + 1
    assert got == want


def test_learn_bpe_matches_reference(spark):
    got = learn_bpe(spark, _df(spark, TEXTS), n_merges=25)
    want = learn_bpe_py(TEXTS, n_merges=25)
    assert got == want
    # early-stop path: a single-char corpus exhausts pairs quickly
    tiny = _df(spark, ["a a a"])
    assert learn_bpe(spark, tiny, n_merges=10) == learn_bpe_py(
        ["a a a"], n_merges=10
    )


def test_encode_bpe_matches_reference(spark):
    merges = learn_bpe_py(TEXTS, n_merges=15)
    got = {
        r["doc_id"]: list(r["pieces"])
        for r in encode_bpe(_df(spark, TEXTS), merges).collect()
    }
    for i, t in enumerate(TEXTS):
        want = [
            p for w in tokenize_text(t) for p in encode_word_py(w, merges)
        ]
        # zero-token docs keep a row with an empty piece list — the
        # output is corpus-complete
        assert got[i] == want, (i, got[i], want)


def test_encode_empty_merges_is_chars(spark):
    got = {
        r["doc_id"]: list(r["pieces"])
        for r in encode_bpe(_df(spark, ["ab ba"]), []).collect()
    }
    assert got == {0: ["a", "b", EOW, "b", "a", EOW]}


def test_ranked_encoder_equivalence():
    """GPT-2-style min-rank loop ≡ applying the merge list in order,
    across every prefix of a learned merge list and unseen words."""
    from inverted_index_spark.operators.bpe import encode_word_ranked

    merges = learn_bpe_py(TEXTS, n_merges=30)
    words = [w for t in TEXTS for w in tokenize_text(t)] + [
        "unseen", "lowestest", "aaaabbbb", "x",
    ]
    for cut in (0, 1, 5, len(merges)):
        ranks = {p: i for i, p in enumerate(merges[:cut])}
        for w in words:
            assert encode_word_ranked(w, ranks) == encode_word_py(
                w, merges[:cut]
            ), (w, cut)


def test_encode_bpe_kernel_path(spark, monkeypatch):
    """The Arrow-batched dictionary kernel (production merge-list
    sizes) returns exactly what the JVM fold cascade returns."""
    import inverted_index_spark.operators.bpe as bpe_mod

    merges = learn_bpe_py(TEXTS, n_merges=12)
    expr = {
        r["doc_id"]: list(r["pieces"])
        for r in encode_bpe(_df(spark, TEXTS), merges).collect()
    }
    monkeypatch.setattr(bpe_mod, "MAX_EXPR_MERGES", 0)
    kern = {
        r["doc_id"]: list(r["pieces"])
        for r in encode_bpe(_df(spark, TEXTS), merges).collect()
    }
    assert kern == expr


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.text(alphabet="ab x", min_size=0, max_size=12),
        min_size=1,
        max_size=4,
    ),
    st.integers(min_value=1, max_value=8),
)
def test_learn_bpe_property(spark, texts, n_merges):
    """Adversarial tiny corpora (runs like aaa force the overlap rule;
    ties force the pinned (count DESC, pair ASC) argmax)."""
    assert learn_bpe(spark, _df(spark, texts), n_merges=n_merges) == (
        learn_bpe_py(texts, n_merges=n_merges)
    )
