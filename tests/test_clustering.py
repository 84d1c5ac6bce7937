"""Connected components (operators.clustering) vs a Python union-find
oracle, including shapes that stress the star iteration: long chains
(diameter >> 1), stars, cycles, singletons-by-absence."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from inverted_index_spark.operators.clustering import (
    connected_components,
    dedup_survivors,
)


def uf_oracle(pairs: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        if a == b:
            continue  # engine contract: self-loops carry no dup signal
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def run_cc(spark, pairs, small_cutoff):
    df = spark.createDataFrame(pairs, "a long, b long")
    return {
        r["node"]: r["component"]
        for r in connected_components(df, small_cutoff=small_cutoff).collect()
    }


# small_cutoff=0 forces the distributed star iteration; the default
# routes these tiny graphs through the driver union-find fast path —
# both must match the oracle (and therefore each other)
@pytest.mark.parametrize("cutoff", [0, 1 << 18])
@pytest.mark.parametrize(
    "pairs",
    [
        [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (6, 7), (7, 8)],  # chain
        [(10, 1), (10, 2), (10, 3), (20, 21)],                     # star + pair
        [(1, 2), (2, 3), (3, 1), (4, 5), (5, 6), (6, 4)],          # two cycles
        [(5, 5), (1, 2)],                                          # self-loop dropped
        [(100, 1), (2, 100), (3, 2), (50, 51)],                    # mixed orientation
    ],
)
def test_cc_matches_union_find(spark, pairs, cutoff):
    assert run_cc(spark, pairs, cutoff) == uf_oracle(pairs)


@pytest.mark.parametrize("cutoff", [0, 1 << 18])
def test_cc_random_graph(spark, cutoff):
    rng = random.Random(7)
    nodes = list(range(200))
    pairs = [
        (rng.choice(nodes), rng.choice(nodes)) for _ in range(150)
    ]
    pairs = [(a, b) for a, b in pairs if a != b]
    assert run_cc(spark, pairs, cutoff) == uf_oracle(pairs)


def test_cc_cutoff_boundary(spark):
    # a graph JUST over a tiny cutoff takes the distributed path and
    # still matches; the same graph under the default takes the driver
    # path — outputs identical
    pairs = [(i, i + 1) for i in range(0, 40, 2)] + [(0, 39)]
    dist = run_cc(spark, pairs, small_cutoff=5)
    drv = run_cc(spark, pairs, small_cutoff=1 << 18)
    assert dist == drv == uf_oracle(pairs)


def test_dedup_survivors(spark):
    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(10)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3), (7, 8)], "a long, b long")
    kept = sorted(
        r["doc_id"] for r in dedup_survivors(docs, pairs).select("doc_id").collect()
    )
    # clusters {1,2,3} -> keep 1; {7,8} -> keep 7; everyone else untouched
    assert kept == [0, 1, 4, 5, 6, 7, 9]


def test_cc_empty(spark):
    empty = spark.createDataFrame([], "a long, b long")
    assert connected_components(empty).count() == 0
