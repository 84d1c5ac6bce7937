"""Connected components over near-duplicate pair graphs.

Pair generation (minhash/simhash/winnowing, operators.dedup) yields
EDGES; deduplication needs CLUSTERS — every doc labeled with its
duplicate-group id so one survivor per group can be kept. At 100 TB
the components must be computed without driver-side union-find, so
this implements the alternating large-star / small-star algorithm
(Kiveris et al., "Connected Components in MapReduce and Beyond",
SoCC 2014): O(log² n) rounds of pure groupBy/join dataflow, each
round shrinking edges toward stars centered at each component's
minimum node id.

    large-star: each node points its LARGER neighbors at its local
                minimum  (u's neighbors v > u  →  edge (v, m),
                m = min(Γ(u) ∪ {u}))
    small-star: each node folds its SMALLER neighbors onto its local
                minimum  (neighbors v ≤ u  →  edges (v, m) ∪ (u, m))

At the fixpoint every edge (hi → lo) points directly at its
component's min id. Rounds are driver-driven but each is a bounded
Spark job; ``localCheckpoint`` truncates lineage so plan size stays
O(1) across rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _normalize(edges: DataFrame) -> DataFrame:
    """(u, v) → distinct hi→lo orientation, self-loops dropped."""
    return (
        edges.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def _large_star(edges: DataFrame) -> DataFrame:
    sym = edges.unionByName(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    mins = sym.groupBy("u").agg(F.min("v").alias("mn"))
    mins = mins.select("u", F.least("mn", "u").alias("m"))
    return _normalize(
        sym.join(mins, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )


def _small_star(edges: DataFrame) -> DataFrame:
    d = _normalize(edges)  # hi → lo: every group key u has only smaller neighbors
    mins = d.groupBy("u").agg(F.min("v").alias("m"))
    moved = (
        d.join(mins, "u")
        .where(F.col("v") != F.col("m"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )
    self_edge = mins.select("u", F.col("m").alias("v"))
    return _normalize(moved.unionByName(self_edge))


# Edge sets at or below this ship to the driver and resolve with
# union-find in one pass — the same small-side decision a broadcast
# join makes. 2^18 edges is ~4 MB of longs; far below any driver
# memory concern, far above what LSH candidate graphs produce at
# test scale. At 100 TB the candidate graph blows past this and the
# distributed star iteration runs unchanged.
SMALL_EDGE_CUTOFF = 1 << 18


def _cc_driver(edges: DataFrame) -> DataFrame:
    """Union-find over a collected edge list (small-graph fast path).

    Identical output contract to the star iteration: every node of the
    (self-loop-free, distinct) edge set labeled with its component's
    min node id. One collect + one createDataFrame replaces O(log² n)
    shuffle rounds — at a few hundred thousand edges the star
    iteration's per-round job overhead dwarfs the actual work."""
    rows = edges.collect()
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    for row in rows:
        u, v = row["u"], row["v"]
        parent.setdefault(u, u)
        parent.setdefault(v, v)
        ru, rv = find(u), find(v)
        if ru != rv:
            # union by min id: the smaller root stays root, so the
            # final root of every tree IS the component minimum
            if ru < rv:
                parent[rv] = ru
            else:
                parent[ru] = rv
    spark = edges.sparkSession
    out = [(n, find(n)) for n in parent]
    return spark.createDataFrame(out, "node long, component long")


def connected_components(
    pairs: DataFrame,
    a_col: str = "a",
    b_col: str = "b",
    max_rounds: int = 64,
    small_cutoff: int = SMALL_EDGE_CUTOFF,
) -> DataFrame:
    """pairs(a, b) → (node, component) with component = min node id of
    the connected component. Deterministic; raises if the star
    iteration hasn't converged within ``max_rounds`` (needs O(log² n)
    — 64 covers any input that fits in this universe). Self-loop pairs
    (a == b) carry no duplicate signal and are dropped; a node
    appearing ONLY in self-loops is absent from the output (it forms
    no cluster), matching what dedup_survivors needs.

    Size-adaptive: the normalized edge count is measured first (the
    one extra job is noise next to the iteration it informs). At or
    below ``small_cutoff`` edges the graph resolves with driver-side
    union-find (:func:`_cc_driver`) — same output, one job; above it
    the alternating-star dataflow runs, which never materializes the
    graph on the driver. Pass ``small_cutoff=0`` to force the
    distributed path (tests equate both)."""
    edges = _normalize(
        pairs.select(
            F.col(a_col).cast("long").alias("u"),
            F.col(b_col).cast("long").alias("v"),
        )
    ).localCheckpoint(eager=False)
    if small_cutoff > 0 and edges.limit(small_cutoff + 1).count() <= small_cutoff:
        return _cc_driver(edges)

    def _sig(df: DataFrame) -> tuple[int, int]:
        row = df.agg(
            F.count("*").alias("n"),
            F.coalesce(F.sum(F.hash("u", "v")), F.lit(0)).alias("h"),
        ).collect()[0]
        return (row["n"], row["h"])

    prev_sig = None
    for _ in range(max_rounds):
        # lazy checkpoint: materialized by the _sig action right below,
        # so each round costs ONE job instead of two (eager checkpoint
        # runs its own) — lineage is truncated identically either way
        new_edges = _small_star(_large_star(edges)).localCheckpoint(eager=False)
        sig = _sig(new_edges)
        # the (count, hash-sum) signature is only a cheap PRE-FILTER: a
        # hash-sum collision between different edge sets would declare
        # convergence early and emit wrong components, so an exact check
        # confirms it. Edge sets are distinct (normalize), so equal
        # counts + empty one-sided difference ⇒ set equality; cheap at
        # the near-fixpoint sizes where the signature first matches.
        if sig == prev_sig and new_edges.exceptAll(edges).isEmpty():
            edges = new_edges
            break
        edges, prev_sig = new_edges, sig
    else:
        raise RuntimeError(f"connected_components: no fixpoint in {max_rounds} rounds")
    # fixpoint: stars — each u points at its component min; centers label themselves
    return (
        edges.select(F.col("u").alias("node"), F.col("v").alias("component"))
        .unionByName(
            edges.select(F.col("v").alias("node"), F.col("v").alias("component"))
        )
        .groupBy("node")
        .agg(F.min("component").alias("component"))
    )


def dedup_survivors(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    a_col: str = "a",
    b_col: str = "b",
) -> DataFrame:
    """The corpus with near-duplicate clusters collapsed to one doc
    each: cluster the pair graph, then anti-join every non-center
    member (node != component). Docs not in any pair survive untouched.
    """
    cc = connected_components(pairs, a_col, b_col)
    losers = cc.where(F.col("node") != F.col("component")).select(
        F.col("node").alias("_loser")
    )
    return docs.join(
        losers,
        on=docs[id_col].cast("long") == losers["_loser"],
        how="left_anti",
    )
