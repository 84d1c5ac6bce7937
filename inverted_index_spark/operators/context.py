"""Hit-context hydration: for every search hit, return the ±n
surrounding rows of the same group in sequence order — the
"show the conversation around the matching turn" operation a
RAG-over-transcripts pipeline runs after retrieval (ES analog:
top_hits with surrounding fetch; chat UIs call it context expansion).

Generic over any (group, order) sequencing: transcripts use
(conv_id, turn_idx); the TPC-H oracle twin uses
(l_orderkey, l_linenumber).

Scale shape: the hit set is top-k-sized, so it BROADCASTS into a
single hash join on the group key with the window bound as a residual
range predicate — the corpus never shuffles, and group-key pushdown
means a partition-pruned corpus (partitioned/bucketed by group) scans
only hit groups. One plan, no window functions over the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fetch_context(
    hits: DataFrame,
    corpus: DataFrame,
    group_col: str,
    order_col: str,
    n_before: int = 1,
    n_after: int = 1,
    id_col: str = "doc_id",
) -> DataFrame:
    """(hit_id, <corpus columns>, offset) for every corpus row within
    [order - n_before, order + n_after] of a hit, same group;
    ``offset`` is the signed distance from the hit (0 = the hit row
    itself). A hit row must carry (id_col, group_col, order_col) —
    join your score table to the corpus first if it only has ids.
    Ordered by (hit_id, offset); overlapping hit windows each emit
    their own rows (per-hit context, the ES inner_hits convention).
    """
    if n_before < 0 or n_after < 0:
        raise ValueError("n_before/n_after must be >= 0")
    h = hits.select(
        F.col(id_col).alias("_hit_id"),
        F.col(group_col).alias("_g"),
        F.col(order_col).alias("_o"),
    )
    cond = (
        (corpus[group_col] == h["_g"])
        & (corpus[order_col] >= h["_o"] - F.lit(int(n_before)))
        & (corpus[order_col] <= h["_o"] + F.lit(int(n_after)))
    )
    out = corpus.join(F.broadcast(h), cond)
    return out.select(
        F.col("_hit_id").alias("hit_id"),
        *[corpus[c] for c in corpus.columns],
        (corpus[order_col] - F.col("_o")).cast("long").alias("offset"),
    ).orderBy("hit_id", "offset")
