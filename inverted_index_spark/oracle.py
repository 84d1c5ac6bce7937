"""Pure-pandas/numpy oracle for rank-parity testing (SURVEY.md §5).

The Go reference cannot score (it has no BM25); the north rule's
"rank-identical to the reference query set" is therefore checked
against this deterministic single-process reimplementation of the
pinned contracts (FIXTURES.md §B):

    tokenizer: lower → [\\p{L}\\p{N}_]+ runs, len 1..64, NFC input
               (shared code — imports the same tokenize_text kernel
               the engine's JVM hot path is parity-tested against)
    BM25:      k1=1.2, b=0.75, idf = ln((N-df+0.5)/(df+0.5)+1),
               score = Σ_t idf·tf/(tf + k1·(1-b+b·dl/avgdl)),
               ties (score DESC, doc_id ASC)

Float-sum order is a TOLERANCE contract, not a pinned one: this
oracle and the WAND scorer sum contributions in ascending-term order,
but the distributed exhaustive path (groupBy(doc_id).sum) accumulates
in partition order, which is plan-dependent. Cross-path equality is
therefore asserted to ≤1e-9 (see tests/test_bm25_parity.py and
test_wand.py) — with ≤64 query terms the worst-case reassociation
error is far below that bound, and ranks are additionally exact on
every test corpus.

Also reimplements the reference's read semantics for table-driven
parity: sorted-term enumeration (R5, single/single.go:198-228) and
OR-union + [min,max] range reads (R10, single/single.go:155-192).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd

from inverted_index_spark.functions.tokenizer import tokenize_text

K1 = 1.2
B = 0.75


@dataclass
class OracleIndex:
    """In-memory postings: term → {doc_id: tf}, plus doc lengths."""

    postings: dict[str, dict[int, int]] = field(default_factory=dict)
    dl: dict[int, int] = field(default_factory=dict)

    @classmethod
    def from_docs(cls, docs: pd.DataFrame) -> "OracleIndex":
        """docs(doc_id, text) → index (tokenizer contract applied)."""
        idx = cls()
        for doc_id, text in zip(docs["doc_id"], docs["text"]):
            toks = tokenize_text(text)
            idx.dl[int(doc_id)] = len(toks)
            for t in toks:
                idx.postings.setdefault(t, {})
                idx.postings[t][int(doc_id)] = idx.postings[t].get(int(doc_id), 0) + 1
        return idx

    @classmethod
    def from_postings(cls, rows: list[tuple[str, list[int]]]) -> "OracleIndex":
        """Direct (term, doc_ids) injection for FIXTURES §A micro cases."""
        idx = cls()
        for term, doc_ids in rows:
            idx.postings.setdefault(term, {})
            for d in doc_ids:
                idx.postings[term][int(d)] = 1
                idx.dl.setdefault(int(d), 1)
        return idx

    # --- reference read semantics -------------------------------------
    def read_terms(self) -> list[str]:
        return sorted(t for t, p in self.postings.items() if p)

    def read_values(
        self, terms: list[str], min_doc: int | None = None, max_doc: int | None = None
    ) -> list[int]:
        """R10: OR-union, range-constrained, sorted unique."""
        out: set[int] = set()
        for t in terms:
            out.update(self.postings.get(t, {}).keys())
        lo = -(2**62) if min_doc is None else min_doc
        hi = 2**62 if max_doc is None else max_doc
        return sorted(d for d in out if lo <= d <= hi)

    # --- north-rule BM25 ----------------------------------------------
    @property
    def n_docs(self) -> int:
        return len(self.dl)

    @property
    def avgdl(self) -> float:
        return float(np.mean(list(self.dl.values()))) if self.dl else 0.0

    def idf(self, term: str) -> float:
        df = len(self.postings.get(term, {}))
        n = self.n_docs
        return float(np.log((n - df + 0.5) / (df + 0.5) + 1.0))

    def bm25_scores(self, terms: list[str]) -> dict[int, float]:
        """All matching docs → score; contributions summed in
        ascending-term order here and in WAND — the engine's
        distributed exhaustive path matches to ≤1e-9, not bit-for-bit
        (module docstring: tolerance contract)."""
        avgdl = self.avgdl
        scores: dict[int, float] = {}
        for t in sorted(set(terms)):
            plist = self.postings.get(t)
            if not plist:
                continue
            w = self.idf(t)
            for d, tf in plist.items():
                denom = tf + K1 * (1 - B + B * self.dl[d] / avgdl)
                scores[d] = scores.get(d, 0.0) + w * tf / denom
        return scores

    def bm25_topk(self, terms: list[str], k: int = 10) -> list[tuple[int, float]]:
        scores = self.bm25_scores(terms)
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[:k]
