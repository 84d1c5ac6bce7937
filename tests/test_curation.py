"""C4-style cleaning + cross-corpus line dedup vs brute-force oracles."""

from __future__ import annotations

import re

import pytest

from inverted_index_spark.operators.curation import c4_clean, dedup_lines

DOCS = [
    (1, 'Good long sentence number one lives here.\nshort line\n'
        'Another proper sentence with enough words inside.\n'
        'Third full sentence to clear the minimum bar.'),
    (2, 'This javascript line has plenty of words here.\n'
        'Clean sentence with more than enough words included.\n'
        'no terminal punctuation on this long line here\n'
        'Ends with a quote and has enough words."'),
    (3, 'Contains lorem ipsum filler so the doc dies.\n'
        'Perfectly fine sentence with lots of words here.\n'
        'Another perfectly fine sentence with lots of words.'),
    (4, 'Here is a brace { inside an otherwise fine doc.\n'
        'More than five words and terminal punctuation too.'),
    (5, 'One good sentence with enough words to keep.\nOnly one sentence.'),
    (6, ''),
    (7, 'Wow! Short. Nice?\n'
        'A sentence long enough to keep with punctuation here.\n'
        'Second keeper sentence padded out to enough words.\n'
        'Third keeper sentence padded out to enough words too!'),
]

DUP_DOCS = [
    (1, 'This exact boilerplate sentence appears in many documents.\n'
        'Unique first-doc sentence with plenty of words here.\nshort'),
    (2, 'Opening line unique to the second document right here.\n'
        'This exact boilerplate sentence appears in many documents.'),
    (3, 'THIS exact  boilerplate sentence appears, in many documents!\n'
        'short\nshort'),
    (4, 'This exact boilerplate sentence appears in many documents.'),
    (5, 'Repeated inside one doc with enough words here.\n'
        'Repeated inside one doc with enough words here.'),
    (6, ''),
]

WORD = re.compile(r"[a-z0-9_]+")


def _line_ok(ln, min_words=5, markers=("javascript",)):
    return (
        re.search(r'[.!?"]\s*$', ln) is not None
        and len(WORD.findall(ln.lower())) >= min_words
        and not any(m in ln.lower() for m in markers)
    )


def _c4_oracle(text):
    lines = text.split("\n")
    kept = [ln for ln in lines if _line_ok(ln)]
    clean = "\n".join(kept)
    n_sent = len(re.findall(r"[.!?]", clean))
    keep = (
        "lorem ipsum" not in text.lower()
        and "{" not in text.lower()
        and n_sent >= 3
    )
    return keep, clean, len(lines), len(kept), n_sent


def _dedup_oracle(docs, min_words=5):
    first = {}
    for doc_id, text in sorted(docs):
        for idx, ln in enumerate(text.split("\n")):
            toks = WORD.findall(ln.lower())
            if len(toks) >= min_words:
                first.setdefault(" ".join(toks), (doc_id, idx))
    out = {}
    for doc_id, text in docs:
        lines = text.split("\n")
        kept = []
        for idx, ln in enumerate(lines):
            toks = WORD.findall(ln.lower())
            if len(toks) >= min_words and first[" ".join(toks)] != (doc_id, idx):
                continue
            kept.append(ln)
        out[doc_id] = ("\n".join(kept), len(lines), len(lines) - len(kept))
    return out


def test_c4_clean_vs_bruteforce(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {r["doc_id"]: r for r in c4_clean(df).collect()}
    assert set(got) == {d for d, _ in DOCS}
    for doc_id, text in DOCS:
        keep, clean, n_lines, n_kept, n_sent = _c4_oracle(text)
        r = got[doc_id]
        assert r["keep"] == keep, (doc_id, r)
        assert r["clean_text"] == clean, (doc_id, r["clean_text"], clean)
        assert (r["n_lines"], r["n_kept"], r["n_sentences"]) == (
            n_lines, n_kept, n_sent,
        )
    # the rules bite where intended
    assert got[1]["keep"] and "short line" not in got[1]["clean_text"]
    assert "javascript" not in got[2]["clean_text"]
    assert not got[3]["keep"] and not got[4]["keep"]  # doc markers
    assert not got[5]["keep"]  # < 3 sentences after cleaning
    assert not got[6]["keep"]
    assert got[7]["keep"]


def test_c4_clean_overrides(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        r["doc_id"]: r
        for r in c4_clean(df, min_line_words=3, min_sentences=1).collect()
    }
    # looser word floor admits 'Wow! Short. Nice?'-free but 3-word lines
    assert got[5]["keep"]


def test_dedup_lines_vs_bruteforce(spark):
    df = spark.createDataFrame(DUP_DOCS, "doc_id long, text string")
    want = _dedup_oracle(DUP_DOCS)
    got = {r["doc_id"]: r for r in dedup_lines(df).collect()}
    assert set(got) == set(want)
    for doc_id, (clean, n_lines, n_removed) in want.items():
        r = got[doc_id]
        assert r["clean_text"] == clean, (doc_id, r["clean_text"], clean)
        assert (r["n_lines"], r["n_removed"]) == (n_lines, n_removed), (doc_id, r)
    # normalization: doc 3's shouty variant is the same line, removed
    assert got[3]["n_removed"] == 1
    # doc 4 becomes empty but is still returned
    assert got[4]["clean_text"] == "" and got[4]["n_removed"] == 1
    # in-doc repeat: second copy removed
    assert got[5]["n_removed"] == 1
    # short lines never dedup against each other
    assert got[3]["clean_text"].count("short") == 2


def test_dedup_lines_min_words_gate(spark):
    df = spark.createDataFrame(DUP_DOCS, "doc_id long, text string")
    got = {r["doc_id"]: r for r in dedup_lines(df, min_line_words=1).collect()}
    want = _dedup_oracle(DUP_DOCS, min_words=1)
    for doc_id, (clean, n_lines, n_removed) in want.items():
        assert got[doc_id]["clean_text"] == clean
        assert got[doc_id]["n_removed"] == n_removed
