"""Decontamination, PII scrub, and distributed k-means — the round-5
corpus-hygiene additions — each against a pure-Python oracle."""

from __future__ import annotations

import re

import numpy as np
import pytest
from pyspark.sql import functions as F

from inverted_index_spark.functions.pii import pii_scrub, pii_stats
from inverted_index_spark.operators.contamination import (
    decontaminate,
    ngram_contamination,
)
from inverted_index_spark.operators.kmeans import (
    assign_clusters,
    kmeans_clusters,
    kmeans_fit,
)

# ----------------------------------------------------------- contamination


def _grams(text: str, n: int) -> set[str]:
    toks = re.findall(r"\w+", text.lower())
    if not toks:
        return set()
    if len(toks) < n:
        return {" ".join(toks)}
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


TRAIN = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "completely unrelated words about spark shuffles"),
    (3, "quick brown fox appears here too with extra text"),
    (4, "the lazy dog sleeps all day"),
    (5, ""),
]
BENCH = [
    (100, "a quick brown fox question"),
    (101, "the lazy dog benchmark item"),
]


def _contamination_oracle(n: int) -> dict[int, tuple[int, int]]:
    bench_grams: dict[str, set[int]] = {}
    for bid, btext in BENCH:
        for g in _grams(btext, n):
            bench_grams.setdefault(g, set()).add(bid)
    out = {}
    for did, text in TRAIN:
        hit = {g for g in _grams(text, n) if g in bench_grams}
        if hit:
            bdocs = set().union(*(bench_grams[g] for g in hit))
            out[did] = (len(hit), len(bdocs))
    return out


@pytest.mark.parametrize("n", [2, 3])
@pytest.mark.parametrize("broadcast_bench", [True, False])
def test_ngram_contamination_oracle(spark, n, broadcast_bench):
    train = spark.createDataFrame(TRAIN, "doc_id long, text string")
    bench = spark.createDataFrame(BENCH, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_hit_ngrams"], r["n_bench_docs"])
        for r in ngram_contamination(
            train, bench, n=n, broadcast_bench=broadcast_bench
        ).collect()
    }
    assert got == _contamination_oracle(n)


def test_decontaminate_removes_flagged(spark):
    train = spark.createDataFrame(TRAIN, "doc_id long, text string")
    bench = spark.createDataFrame(BENCH, "doc_id long, text string")
    kept = {r["doc_id"] for r in decontaminate(train, bench, n=2).collect()}
    flagged = set(_contamination_oracle(2))
    assert kept == {d for d, _ in TRAIN} - flagged
    # contaminated docs all flagged at n=2 here; survivors keep text
    assert kept.isdisjoint(flagged)


def test_contamination_cross_columns(spark):
    """bench side may use different id/text column names."""
    train = spark.createDataFrame(TRAIN, "doc_id long, text string")
    bench = spark.createDataFrame(
        [(r[0], r[1]) for r in BENCH], "bid long, body string"
    )
    got = ngram_contamination(
        train, bench, n=2, bench_id_col="bid", bench_text_col="body"
    ).collect()
    assert {r["doc_id"]: (r["n_hit_ngrams"], r["n_bench_docs"]) for r in got} == (
        _contamination_oracle(2)
    )


# --------------------------------------------------------------------- PII


PII_DOCS = [
    (1, "contact alice.smith+dev@example.co.uk or bob@test.io today"),
    (2, "server at 10.0.0.1 and 192.168.255.254 responded"),
    (3, "call +1-555-867-5309 or 0044 20 7946 0958 now"),
    (4, "email admin@10.0.0.1.example.com mixes both"),
    (5, "no pii here at all"),
    (6, "short digits 12345 are not phones"),
]


def test_pii_stats_counts(spark):
    docs = spark.createDataFrame(PII_DOCS, "doc_id long, text string")
    got = {r["doc_id"]: r for r in pii_stats(docs).collect()}
    assert (got[1]["n_emails"], got[1]["n_ips"], got[1]["n_phones"]) == (2, 0, 0)
    assert (got[2]["n_emails"], got[2]["n_ips"], got[2]["n_phones"]) == (0, 2, 0)
    assert got[3]["n_phones"] >= 1 and got[3]["n_emails"] == 0
    # the email pattern swallows the embedded IP: counted once, as email
    assert (got[4]["n_emails"], got[4]["n_ips"]) == (1, 0)
    assert not got[5]["any_pii"] and not got[6]["any_pii"]
    assert all(got[d]["any_pii"] for d in (1, 2, 3, 4))


def test_pii_scrub_redacts(spark):
    docs = spark.createDataFrame(PII_DOCS, "doc_id long, text string")
    got = {r["doc_id"]: r["scrubbed"] for r in pii_scrub(docs).collect()}
    assert got[1] == "contact <EMAIL> or <EMAIL> today"
    assert got[2] == "server at <IP> and <IP> responded"
    assert "<PHONE>" in got[3]
    assert "@" not in got[4]
    assert got[5] == "no pii here at all"
    for v in got.values():
        assert not re.search(r"[A-Za-z0-9._%+-]+@", v)


def test_pii_scrub_matches_duckdb(spark):
    """Regex-dialect parity: the exact patterns the oracle entry uses
    must behave identically under Java regex and RE2."""
    import duckdb

    from inverted_index_spark.functions.pii import EMAIL_RE, IPV4_RE, PHONE_RE

    docs = spark.createDataFrame(PII_DOCS, "doc_id long, text string")
    got = {r["doc_id"]: r["scrubbed"] for r in pii_scrub(docs).collect()}
    con = duckdb.connect()
    for did, text in PII_DOCS:
        (want,) = con.execute(
            "SELECT regexp_replace(regexp_replace(regexp_replace(?, ?, '<EMAIL>', 'g'),"
            " ?, '<IP>', 'g'), ?, '<PHONE>', 'g')",
            [text, EMAIL_RE, IPV4_RE, PHONE_RE],
        ).fetchone()
        assert got[did] == want, f"doc {did}: {got[did]!r} != {want!r}"


# ------------------------------------------------------------------ kmeans


def _mk_blobs(spark, n=120, k=3, dim=8, seed=7):
    rng = np.random.default_rng(seed)
    centers = rng.normal(0, 10, size=(k, dim))
    rows = []
    for i in range(n):
        c = i % k
        v = centers[c] + rng.normal(0, 0.5, size=dim)
        rows.append((i, [float(x) for x in v]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>"), centers


def _numpy_lloyd(x: np.ndarray, k: int, iters: int) -> np.ndarray:
    cents = x[:k].astype(np.float64).copy()
    for _ in range(iters):
        d = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        lab = d.argmin(axis=1)
        for c in range(k):
            if (lab == c).any():
                cents[c] = x[lab == c].mean(axis=0)
    return cents


def test_assign_clusters_exact(spark):
    df, _ = _mk_blobs(spark)
    cents_rows = df.orderBy("vec_id").limit(3).collect()
    cents = [[float(v) for v in r["embedding"]] for r in cents_rows]
    got = {r["vec_id"]: (r["cluster"], r["dist"]) for r in assign_clusters(df, cents).collect()}
    x = np.array(
        [r["embedding"] for r in df.orderBy("vec_id").collect()], dtype=np.float64
    )
    d = ((x[:, None, :] - np.array(cents)[None, :, :]) ** 2).sum(axis=2)
    for i in range(len(x)):
        assert got[i][0] == int(d[i].argmin())
        assert got[i][1] == pytest.approx(d[i].min(), rel=1e-9)


def test_kmeans_matches_numpy_lloyd(spark):
    df, _ = _mk_blobs(spark)
    x = np.array(
        [r["embedding"] for r in df.orderBy("vec_id").collect()], dtype=np.float64
    )
    want_cents = _numpy_lloyd(x, k=3, iters=4)
    got_cents = np.array(kmeans_fit(df, k=3, iters=4))
    # distributed avg vs numpy mean differ only in float summation order
    assert np.allclose(got_cents, want_cents, atol=1e-6)
    lab = (
        ((x[:, None, :] - want_cents[None, :, :]) ** 2).sum(axis=2).argmin(axis=1)
    )
    got = {r["vec_id"]: r["cluster"] for r in kmeans_clusters(df, k=3, iters=4).collect()}
    assert [got[i] for i in range(len(x))] == [int(v) for v in lab]


def test_kmeans_recovers_blobs(spark):
    df, _ = _mk_blobs(spark, n=90, k=3)
    got = {r["vec_id"]: r["cluster"] for r in kmeans_clusters(df, k=3, iters=6).collect()}
    # blob identity is i % 3; clustering must be a pure relabeling
    by_true: dict[int, set[int]] = {}
    for i, c in got.items():
        by_true.setdefault(i % 3, set()).add(c)
    assert all(len(s) == 1 for s in by_true.values())
    assert len(set().union(*by_true.values())) == 3


def test_kmeans_fit_too_few_rows(spark):
    df, _ = _mk_blobs(spark, n=2, k=1)
    with pytest.raises(ValueError, match="need >= 8"):
        kmeans_fit(df, k=8)
