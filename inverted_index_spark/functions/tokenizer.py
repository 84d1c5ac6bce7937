"""Deterministic tokenizer (engine == oracle contract, FIXTURES.md §B).

The reference library receives pre-extracted terms from its host
project (heaplog); it has no tokenizer of its own (SURVEY.md §2.5).
We pin one here so rank parity is well-defined:

    NFC-normalize → lowercase → extract ``\\w+`` runs (Unicode word
    chars) → keep tokens of length 1..64. No stemming, no stop-words.
    tf = in-document count.

Implemented as an Arrow-batched ``mapInPandas`` (never per-row
Python). The same pure-pandas kernel is reused by the oracle so the
two can't drift.
"""

from __future__ import annotations

import re
import unicodedata
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_WORD_RE = re.compile(r"\w+", re.UNICODE)
MIN_LEN, MAX_LEN = 1, 64

TOKENS_SCHEMA = "doc_id long, term string, tf int, dl int"


def tokenize_text(text: str) -> list[str]:
    """The pinned scalar contract — shared by engine and oracle."""
    if text is None:
        return []
    norm = unicodedata.normalize("NFC", text).lower()
    return [t for t in _WORD_RE.findall(norm) if MIN_LEN <= len(t) <= MAX_LEN]


def tokenize_pdf(pdf: pd.DataFrame) -> pd.DataFrame:
    """Vectorized kernel: (doc_id, text) batch → (doc_id, term, tf, dl).

    One flat (doc, token) frame per Arrow batch, aggregated with a
    single C-path pandas groupby — no per-document Python aggregation.
    dl (document length, total token count incl. duplicates) is
    replicated on every row so posting encode never needs a join back
    to the doc store — BM25's tf-normalization reads it in place.
    """
    texts = pdf["text"].to_numpy()
    ids = pdf["doc_id"].to_numpy(dtype=np.int64)
    tok_lists = [tokenize_text(t) for t in texts]
    lens = np.fromiter((len(t) for t in tok_lists), dtype=np.int64, count=len(tok_lists))
    if lens.sum() == 0:
        return pd.DataFrame(
            {"doc_id": pd.Series(dtype="int64"), "term": pd.Series(dtype="object"),
             "tf": pd.Series(dtype="int32"), "dl": pd.Series(dtype="int32")}
        )
    flat = pd.DataFrame(
        {
            "doc_id": np.repeat(ids, lens),
            "term": np.concatenate([np.asarray(t, dtype=object) for t in tok_lists if t]),
            "dl": np.repeat(lens, lens).astype(np.int32),
        }
    )
    out = (
        flat.groupby(["doc_id", "term"], sort=False)
        .agg(tf=("term", "size"), dl=("dl", "first"))
        .reset_index()
    )
    out["tf"] = out["tf"].astype(np.int32)
    return out[["doc_id", "term", "tf", "dl"]]


def tokenize(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """docs(id, text, ...) → tokens(doc_id, term, tf, dl).

    Column pruning happens before the Python boundary: only (id, text)
    cross into Arrow, whatever width the source table has.
    """
    narrow = docs.select(
        F.col(id_col).cast("long").alias("doc_id"), F.col(text_col).alias("text")
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield tokenize_pdf(pdf)

    return narrow.mapInPandas(run, schema=TOKENS_SCHEMA)
