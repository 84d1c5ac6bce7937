"""Distributed Lloyd k-means over an embedding column.

Capability extension (no reference analog): topic/cluster structure
over document embeddings — the grouping pass a training-data pipeline
runs for curriculum mixing, cluster-balanced sampling, or IVF coarse
quantization (operators.similarity trains its IVF lists on a driver
SAMPLE; this is the full-corpus path).

Scale shape: centroids are k×dim floats — driver/broadcast-sized BY
DEFINITION, never data-sized. Each Lloyd iteration is one Spark job:
  assign  — nearest centroid per row, computed in JVM codegen
            (F.aggregate over zip_with; no Python, no shuffle),
  update  — groupBy(cluster).avg over the dim component columns —
            ONE shuffle of k×dim partial sums (map-side combine).
The driver loop holds only the centroid matrix; at 100 TB nothing
data-sized ever leaves the executors. Init is deterministic (the k
rows with smallest ids), so runs are reproducible and the single
assignment round is oracle-checkable in exact SQL.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _sqdist(vec: Column, centroid: list[float]) -> Column:
    """Squared L2 distance to a literal centroid, folded left in
    element order (matches the DuckDB oracle's list_sum fold, so
    float64 results agree bit-for-bit)."""
    c = F.array(*[F.lit(float(x)) for x in centroid])
    return F.aggregate(
        F.zip_with(vec, c, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def assign_clusters(
    emb: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, cluster, dist) — nearest centroid per vector, squared
    L2, ties to the lowest cluster index (array_position finds the
    FIRST minimum). Pure column expressions over a broadcast-literal
    centroid array."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    dists = F.array(*[_sqdist(v, c) for c in centroids])
    return emb.select(
        F.col(id_col).cast("long").alias("vec_id"),
        (F.array_position(dists, F.array_min(dists)) - 1).cast("int").alias("cluster"),
        F.array_min(dists).alias("dist"),
    )


def kmeans_fit(
    emb: DataFrame,
    k: int = 8,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Lloyd's algorithm, deterministic init = embeddings of the k
    smallest ids. Returns the k×dim centroid list (cluster i of
    :func:`assign_clusters` run on the result = final assignment).
    Empty clusters keep their previous centroid."""
    seed_rows = emb.orderBy(F.col(id_col)).limit(k).collect()
    if len(seed_rows) < k:
        raise ValueError(f"kmeans_fit: need >= {k} rows, got {len(seed_rows)}")
    cents = [[float(x) for x in r[vec_col]] for r in seed_rows]
    dim = len(cents[0])
    for _ in range(iters):
        # single scan: cluster label + vector in one projection (no
        # self-join), then one shuffle of k×dim partial sums
        v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
        dists = F.array(*[_sqdist(v, c) for c in cents])
        a = emb.select(
            v.alias("_v"),
            (F.array_position(dists, F.array_min(dists)) - 1).cast("int").alias("cluster"),
        )
        rows = (
            a.groupBy("cluster")
            .agg(*[F.avg(F.col("_v")[i]).alias(f"c{i}") for i in range(dim)])
            .collect()
        )
        new_cents = list(cents)
        for r in rows:
            new_cents[r["cluster"]] = [r[f"c{i}"] for i in range(dim)]
        cents = new_cents
    return cents


def kmeans_clusters(
    emb: DataFrame,
    k: int = 8,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Fit + final assignment: (vec_id, cluster, dist)."""
    cents = kmeans_fit(emb, k=k, iters=iters, id_col=id_col, vec_col=vec_col)
    return assign_clusters(emb, cents, id_col=id_col, vec_col=vec_col)
