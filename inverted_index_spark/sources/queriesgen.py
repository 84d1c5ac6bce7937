"""Reference query set generator (FIXTURES.md §C).

Seeded, generated AFTER the corpus from its term statistics:
40 single-term (stratified over df deciles, incl. missing terms →
empty results, mirroring single_test.go:99-110), 40 multi-term (2-5
terms mixing head/tail df), 10 range-constrained 'or' queries with
boundaries falling between posting blocks (mirroring
single_test.go:187-209), 10 unicode-term queries.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from inverted_index_spark.sources.transcripts import UNICODE_TOKENS


@dataclass
class Query:
    query_id: str
    terms: list[str]
    mode: str  # 'or' | 'bm25_topk'
    k: int | None
    min_doc: int | None
    max_doc: int | None


def generate_query_set(
    term_dfs: dict[str, int], n_docs: int, seed: int = 42
) -> list[Query]:
    """term_dfs: corpus term → doc frequency (engine or oracle side —
    they agree by construction)."""
    rng = np.random.default_rng(seed)
    terms_by_df = sorted(term_dfs, key=lambda t: (term_dfs[t], t))
    n = len(terms_by_df)
    queries: list[Query] = []
    qi = 1

    def add(terms, mode, k=None, lo=None, hi=None):
        nonlocal qi
        queries.append(Query(f"q{qi:03d}", list(terms), mode, k, lo, hi))
        qi += 1

    # 40 single-term over df deciles + 5 missing
    for i in range(35):
        decile = i % 10
        lo_i = (n * decile) // 10
        hi_i = max((n * (decile + 1)) // 10 - 1, lo_i)
        add([terms_by_df[int(rng.integers(lo_i, hi_i + 1))]], "bm25_topk", 10)
    for i in range(5):
        add([f"zz_missing_{i}"], "bm25_topk", 10)
    # 40 multi-term head/tail mixes
    for _ in range(40):
        kk = int(rng.integers(2, 6))
        head = [terms_by_df[-1 - int(rng.integers(0, max(n // 20, 1)))] for _ in range(kk // 2)]
        tail = [terms_by_df[int(rng.integers(0, max(n // 2, 1)))] for _ in range(kk - len(head))]
        add(sorted(set(head + tail)), "bm25_topk", 10)
    # 10 range-constrained 'or'
    for _ in range(10):
        kk = int(rng.integers(1, 4))
        ts = [terms_by_df[int(rng.integers(0, n))] for _ in range(kk)]
        lo = int(rng.integers(0, max(n_docs - 2, 1)))
        hi = int(rng.integers(lo, n_docs + 50))
        add(sorted(set(ts)), "or", None, lo, hi)
    # 10 unicode
    for i in range(10):
        u = UNICODE_TOKENS[i % len(UNICODE_TOKENS)]
        extra = [terms_by_df[int(rng.integers(0, n))]] if i % 2 else []
        add(sorted(set([u] + extra)), "bm25_topk", 10)
    return queries
