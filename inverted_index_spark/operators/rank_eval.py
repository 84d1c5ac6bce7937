"""ES Ranking Evaluation API (``_rank_eval``): score the engine's own
rankings against graded relevance judgments — precision@k, recall@k,
MRR, and nDCG@k per query.

The reference library has no evaluation layer (posting stores only,
``single/single.go``); this is the Elasticsearch capability extension
search teams use to regression-test relevance. It composes the
existing one-job batched ranker: ``Searcher.topk_batch`` produces
(qid, rank, doc_id, score) for the whole query set in ONE pass over
the postings, then metrics are a broadcast join against the (tiny)
judgment list plus one aggregation keyed by qid. Nothing data-sized
ever reaches the driver; adding 10,000 eval queries changes only the
broadcast payload.

Metric contract (k, grades g ≥ 0, rank r starting at 1):

- ``precision_k`` — |retrieved ∧ g>0| / k
- ``recall_k``    — |retrieved ∧ g>0| / |g>0|          (0 if no rel)
- ``mrr``         — 1 / min rank with g>0              (0 if none)
- ``ndcg_k``      — DCG@k / IDCG@k, DCG = Σ (2^g − 1)/log2(r + 1),
  ideal ranking orders by grade desc then doc_id asc   (0 if IDCG=0)

The floating-point expression shapes are pinned (pow/log2/divides in
this exact arrangement) so the DuckDB oracle twin reproduces them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["rank_eval"]


def _gain(grade, rank):
    return (F.pow(F.lit(2.0), grade) - F.lit(1.0)) / F.log2(rank + F.lit(1))


def rank_eval(
    searcher,
    queries: dict[str, list[str]],
    judgments: dict[str, dict[int, float]],
    k: int = 10,
    use_wand: bool = False,
) -> DataFrame:
    """(qid, precision_k, recall_k, mrr, ndcg_k, n_rel) — one row per
    query in ``queries`` (queries with no relevant judgments score 0
    where the denominator vanishes). ``judgments``:
    ``{qid: {doc_id: grade}}``, grades ≥ 0, 0 = irrelevant."""
    spark = searcher.spark
    ranked = searcher.topk_batch(queries, k=k, use_wand=use_wand)

    jrows = [
        (qid, int(d), float(g))
        for qid, m in judgments.items()
        for d, g in m.items()
    ]
    judge = spark.createDataFrame(
        jrows or [("", -1, 0.0)], "qid string, doc_id long, grade double"
    )
    if not jrows:
        judge = judge.where(F.lit(False))

    hit = ranked.join(F.broadcast(judge), ["qid", "doc_id"], "left").withColumn(
        "grade", F.coalesce("grade", F.lit(0.0))
    )
    rel = F.col("grade") > 0
    got = hit.groupBy("qid").agg(
        F.sum(rel.cast("int")).cast("double").alias("hits"),
        F.max(F.when(rel, F.lit(1.0) / F.col("rank"))).alias("mrr"),
        F.sum(_gain(F.col("grade"), F.col("rank"))).alias("dcg"),
    )

    relevant = judge.where(rel)
    n_rel = relevant.groupBy("qid").agg(F.count("*").cast("double").alias("n_rel"))
    w = Window.partitionBy("qid").orderBy(F.desc("grade"), F.asc("doc_id"))
    ideal = (
        relevant.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .groupBy("qid")
        .agg(F.sum(_gain(F.col("grade"), F.col("rn"))).alias("idcg"))
    )

    uni = spark.createDataFrame([(q,) for q in sorted(queries)], "qid string")
    out = (
        uni.join(got, "qid", "left")
        .join(n_rel, "qid", "left")
        .join(ideal, "qid", "left")
    )
    hits = F.coalesce("hits", F.lit(0.0))
    return out.select(
        "qid",
        (hits / F.lit(float(k))).alias("precision_k"),
        F.when(F.col("n_rel") > 0, hits / F.col("n_rel"))
        .otherwise(F.lit(0.0))
        .alias("recall_k"),
        F.coalesce("mrr", F.lit(0.0)).alias("mrr"),
        F.when(F.col("idcg") > 0, F.coalesce("dcg", F.lit(0.0)) / F.col("idcg"))
        .otherwise(F.lit(0.0))
        .alias("ndcg_k"),
        F.coalesce("n_rel", F.lit(0.0)).cast("long").alias("n_rel"),
    )
