"""Similarity search over embedding columns (task rubric).

Two paths:
  cosine_topk        exact brute-force top-k — one scan, JVM-side dot
                     product via zip_with/aggregate, TakeOrdered limit.
                     The correctness baseline and the oracle target.
  ann_lsh_topk       scale path: signed-random-projection LSH buckets;
                     only vectors sharing ≥1 of `tables` bucket keys
                     with the query are scored. At 100 TB the bucket
                     equi-join replaces the full scan; recall is tuned
                     by (n_bits, tables). Exactness is NOT claimed —
                     tests assert recall ≥ a floor vs cosine_topk.
  embedding_near_dup_pairs   cosine ≥ τ near-duplicate pairs via the
                     same LSH buckets (all-pairs within bucket).

Vectors stay ArrayType(FloatType); math in double for determinism.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def _safe_cos(dot, *norm_factors):
    """Zero-norm-guarded cosine: a zero vector (or zero query) scores
    0.0 instead of aborting the job — Spark 4 runs ANSI mode by
    default, where even DOUBLE division by zero raises
    DIVIDE_BY_ZERO (verified live), and pre-ANSI the NaN result would
    sort ABOVE every real score in orderBy(desc)."""
    denom = norm_factors[0]
    for n in norm_factors[1:]:
        denom = denom * n
    return F.when(denom == 0.0, F.lit(0.0)).otherwise(dot / denom)


def cosine_scores(
    vectors: DataFrame,
    query: list[float],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, cosine) for every vector vs one query (exact)."""
    q = F.array(*[F.lit(float(x)) for x in query])
    qn = float(np.sqrt(np.dot(query, query)))
    return vectors.select(
        F.col(id_col).cast("long").alias("vec_id"),
        _safe_cos(
            _dot(F.col(vec_col), q), _norm(F.col(vec_col)), F.lit(qn)
        ).alias("cosine"),
    )


def cosine_topk(
    vectors: DataFrame,
    query: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine, ties (cosine DESC, vec_id ASC) —
    TakeOrderedAndProject, no global sort."""
    return (
        cosine_scores(vectors, query, id_col, vec_col)
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
    )


# --------------------------------------------------------------------- LSH ---


def _projections(dim: int, n_bits: int, tables: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((tables, n_bits, dim))


def _bucket_exprs(vec_col: str, planes: np.ndarray) -> list:
    """One signed-projection bucket key per table, as pure column
    expressions (sign bits packed into a long)."""
    exprs = []
    for t in range(planes.shape[0]):
        bits = []
        for j in range(planes.shape[1]):
            w = planes[t, j]
            dot = F.aggregate(
                F.zip_with(
                    F.col(vec_col),
                    F.array(*[F.lit(float(x)) for x in w]),
                    lambda x, y: x.cast("double") * y,
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            bits.append(F.when(dot >= 0, F.lit(1 << j)).otherwise(F.lit(0)))
        key = bits[0]
        for b in bits[1:]:
            key = key + b
        exprs.append(key.alias(f"bucket_{t}"))
    return exprs


def ann_lsh_topk(
    vectors: DataFrame,
    query: list[float],
    k: int = 10,
    n_bits: int = 8,
    tables: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: score only vectors sharing ≥1 LSH bucket with
    the query. The filter is an OR of `tables` bucket-key equalities —
    at scale, a partition-pruned scan when the table is written
    bucketed/partitioned by bucket_0."""
    dim = len(query)
    planes = _projections(dim, n_bits, tables, seed)
    q = np.asarray(query, dtype=np.float64)
    q_keys = [
        int(sum((1 << j) for j in range(n_bits) if float(planes[t, j] @ q) >= 0))
        for t in range(tables)
    ]
    with_buckets = vectors.select(
        F.col(id_col).alias(id_col),
        F.col(vec_col).alias(vec_col),
        *_bucket_exprs(vec_col, planes),
    )
    cond = F.col("bucket_0") == q_keys[0]
    for t in range(1, tables):
        cond = cond | (F.col(f"bucket_{t}") == q_keys[t])
    candidates = with_buckets.where(cond).select(id_col, vec_col)
    return cosine_topk(candidates, query, k, id_col, vec_col)


def build_lsh_index(
    vectors: DataFrame,
    path: str,
    n_bits: int = 8,
    tables: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> dict:
    """Persist the LSH bucket table ONCE so queries prune at the scan
    (round-2 fix: the on-the-fly ``ann_lsh_topk`` recomputed 64 dot
    products per row per query — more FLOPs than brute force).

    Layout: exploded (tbl, key, vec_id, embedding), directory-
    partitioned by ``tbl`` and sorted by ``key`` within files, so a
    query reads `tables` directories and row-group stats skip every
    non-matching key — at 100 TB the scan touches ~tables/2^n_bits of
    the data instead of all of it. Storage is duplicated ×tables (the
    standard LSH trade). Returns the index metadata (also written as
    a JSON sidecar for cross-session opens).
    """
    import json

    dim = int(vectors.select(F.size(vec_col).alias("d")).first()["d"])
    planes = _projections(dim, n_bits, tables, seed)
    with_b = vectors.select(
        F.col(id_col).cast("long").alias("vec_id"),
        F.col(vec_col).alias("embedding"),
        *_bucket_exprs(vec_col, planes),
    )
    exploded = with_b.select(
        "vec_id",
        "embedding",
        F.posexplode(
            F.array(*[F.col(f"bucket_{t}") for t in range(tables)])
        ).alias("tbl", "key"),
    )
    (
        exploded.repartition("tbl")
        .sortWithinPartitions("tbl", "key")
        .write.mode("overwrite")
        .partitionBy("tbl")
        .parquet(f"{path}/buckets")
    )
    meta = {"n_bits": n_bits, "tables": tables, "seed": seed, "dim": dim}
    import os

    os.makedirs(path, exist_ok=True)  # tiny sidecar: metadata, not data
    with open(f"{path}/meta.json", "w") as f:
        json.dump(meta, f)
    return meta


def ann_lsh_topk_indexed(
    spark,
    path: str,
    query: list[float],
    k: int = 10,
) -> DataFrame:
    """Approximate top-k against a persisted :func:`build_lsh_index`
    table: one pruned scan of `tables` (tbl, key) buckets → exact
    cosine on the candidates. Same results as ``ann_lsh_topk`` with
    the same (n_bits, tables, seed)."""
    import json

    with open(f"{path}/meta.json") as f:
        meta = json.load(f)
    planes = _projections(meta["dim"], meta["n_bits"], meta["tables"], meta["seed"])
    q = np.asarray(query, dtype=np.float64)
    keys = [
        int(sum((1 << j) for j in range(meta["n_bits"]) if float(planes[t, j] @ q) >= 0))
        for t in range(meta["tables"])
    ]
    scan = spark.read.parquet(f"{path}/buckets")
    cond = None
    for t, qk in enumerate(keys):
        c = (F.col("tbl") == t) & (F.col("key") == qk)
        cond = c if cond is None else (cond | c)
    candidates = (
        scan.where(cond).select("vec_id", "embedding").dropDuplicates(["vec_id"])
    )
    return cosine_topk(candidates, query, k, "vec_id", "embedding")


# --------------------------------------------------------------------- IVF ---


def _kmeans_fit(x: np.ndarray, n_lists: int, seed: int, iters: int = 10) -> np.ndarray:
    """Deterministic lloyd k-means on L2-normalized vectors (numpy,
    driver-side — runs on a SAMPLE, never the corpus). kmeans++ seeding
    with a seeded rng; empty clusters re-seeded to the farthest point."""
    rng = np.random.default_rng(seed)
    xn = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    cents = [xn[rng.integers(len(xn))]]
    for _ in range(n_lists - 1):
        d2 = np.min(
            [(np.linalg.norm(xn - c, axis=1) ** 2) for c in cents], axis=0
        )
        if d2.sum() <= 1e-12:  # degenerate sample (all points identical)
            cents.append(xn[rng.integers(len(xn))])
            continue
        p = d2 / d2.sum()
        cents.append(xn[rng.choice(len(xn), p=p)])
    c = np.stack(cents)
    for _ in range(iters):
        assign = np.argmax(xn @ c.T, axis=1)  # cosine on normalized = dot
        for j in range(n_lists):
            m = assign == j
            if m.any():
                v = xn[m].mean(axis=0)
                c[j] = v / max(np.linalg.norm(v), 1e-12)
            else:
                far = np.argmin(np.max(xn @ c.T, axis=1))
                c[j] = xn[far]
    return c


def build_ivf_index(
    vectors: DataFrame,
    path: str,
    n_lists: int = 16,
    seed: int = 42,
    sample_mod: int | None = None,
    max_sample: int = 100_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> dict:
    """IVF coarse quantizer: fit n_lists centroids on a deterministic
    sample, assign every vector to its nearest centroid in a vectorized
    Arrow pass, and persist partitioned by list_id so an nprobe query
    is a partition-pruned scan of nprobe/n_lists of the data. Returns
    metadata (also a JSON sidecar with the centroids).

    The k-means sample is HARD-CAPPED at ``max_sample`` rows on every
    code path (round-3 fix: the old default collected the entire vector
    table to the driver — an OOM at 100 TB, not a slowdown):
    sample_mod=None derives the stride from a cheap count so
    ``vec_id % sample_mod == 0`` lands ≈ max_sample rows; an explicit
    sample_mod is still bounded by a ``.limit(max_sample)`` before the
    collect. Centroid quality needs ~10^3 rows per list, so 10^5 is
    plenty at any corpus size."""
    import json
    import os
    from collections.abc import Iterator

    import pandas as pd

    if sample_mod is None:
        n = vectors.count()
        sample_mod = max(1, -(-n // max_sample))  # ceil(n / max_sample)
    sample = (
        vectors.where(F.col(id_col) % sample_mod == 0) if sample_mod > 1 else vectors
    )
    rows = sample.select(vec_col).limit(max_sample).collect()
    x = np.array([list(r[vec_col]) for r in rows], dtype=np.float64)
    cents = _kmeans_fit(x, n_lists, seed)

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            v = np.array([list(e) for e in pdf["embedding"]], dtype=np.float64)
            vn = v / np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-12)
            pdf["list_id"] = np.argmax(vn @ cents.T, axis=1).astype(np.int32)
            yield pdf

    narrow = vectors.select(
        F.col(id_col).cast("long").alias("vec_id"), F.col(vec_col).alias("embedding")
    )
    assigned = narrow.mapInPandas(
        assign, schema="vec_id long, embedding array<float>, list_id int"
    )
    (
        assigned.repartition("list_id")
        .write.mode("overwrite")
        .partitionBy("list_id")
        .parquet(f"{path}/lists")
    )
    meta = {
        "n_lists": n_lists,
        "seed": seed,
        "sample_rows": len(x),
        "sample_mod": int(sample_mod),
        "centroids": cents.tolist(),
    }
    os.makedirs(path, exist_ok=True)
    with open(f"{path}/meta.json", "w") as f:
        json.dump(meta, f)
    return meta


def ivf_topk(
    spark,
    path: str,
    query: list[float],
    k: int = 10,
    nprobe: int = 4,
) -> DataFrame:
    """Approximate top-k against a :func:`build_ivf_index` table: rank
    centroids by cosine to the query on the driver, scan only the
    nprobe nearest lists (partition-pruned `list_id IN (...)`), exact
    cosine on the survivors. Recall rises with nprobe; nprobe=n_lists
    is exact."""
    import json

    with open(f"{path}/meta.json") as f:
        meta = json.load(f)
    cents = np.asarray(meta["centroids"], dtype=np.float64)
    q = np.asarray(query, dtype=np.float64)
    qn = q / max(np.linalg.norm(q), 1e-12)
    probe = np.argsort(-(cents @ qn))[: int(nprobe)].tolist()
    scan = spark.read.parquet(f"{path}/lists")
    candidates = scan.where(F.col("list_id").isin(probe)).select("vec_id", "embedding")
    return cosine_topk(candidates, query, k, "vec_id", "embedding")


def hybrid_topk(
    spark,
    store,
    terms: list[str],
    query: list[float],
    vectors: DataFrame,
    k: int = 10,
    k_rrf: int = 60,
    n_deep: int = 100,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Hybrid lexical+dense retrieval via reciprocal-rank fusion:
    ``rrf(d) = Σ_source 1/(k_rrf + rank_source(d))`` over the BM25
    top-``n_deep`` (index) and cosine top-``n_deep`` (embeddings)
    pools (Cormack et al., SIGIR'09 — the standard score-free fusion,
    robust to the two sources' incomparable score scales).

    Deterministic end to end: both source ranks are row_numbers over
    (score DESC, id ASC); docs in one pool only keep that source's
    contribution; final ties (rrf DESC, doc_id ASC). Each window runs
    AFTER its TakeOrdered top-n_deep, so the single-partition rank
    step only ever sees n_deep rows."""
    from pyspark.sql import Window

    from inverted_index_spark.operators.bm25 import bm25_topk

    b = bm25_topk(spark, store, terms, k=n_deep)
    wb = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    b = b.select("doc_id", F.row_number().over(wb).alias("rb"))
    c = cosine_topk(vectors, query, k=n_deep, id_col=id_col, vec_col=vec_col)
    wc = Window.orderBy(F.desc("cosine"), F.asc(id_col))
    c = c.select(
        F.col(id_col).alias("c_doc"), F.row_number().over(wc).alias("rc")
    )
    fused = b.join(c, b["doc_id"] == c["c_doc"], "full_outer").select(
        F.coalesce("doc_id", "c_doc").alias("doc_id"),
        (
            F.coalesce(1.0 / (F.lit(k_rrf) + F.col("rb")), F.lit(0.0))
            + F.coalesce(1.0 / (F.lit(k_rrf) + F.col("rc")), F.lit(0.0))
        ).alias("rrf"),
    )
    return fused.orderBy(F.desc("rrf"), F.asc("doc_id")).limit(k)


def hybrid_linear_topk(
    spark,
    store,
    terms: list[str],
    query: list[float],
    vectors: DataFrame,
    k: int = 10,
    w_lex: float = 1.0,
    w_dense: float = 1.0,
    n_deep: int = 100,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Hybrid lexical+dense retrieval via NORMALIZED weighted-sum
    fusion — the ES ``linear`` retriever (8.16+) next to
    :func:`hybrid_topk`'s rank-only RRF: each source's top-``n_deep``
    pool is minmax-normalized to [0, 1] over that pool, then
    ``score = w_lex·norm_bm25 + w_dense·norm_cosine``; docs absent
    from a pool contribute 0 from it (ES behavior). A constant pool
    (max == min) normalizes to 1.0 — its members are all the pool's
    best. Ties (score DESC, doc_id ASC).

    Scale: both pools are TakeOrdered top-n_deep BEFORE the
    single-row min/max agg broadcasts back — every post-retrieval
    step touches ≤ n_deep rows, never the corpus."""
    from inverted_index_spark.operators.bm25 import bm25_topk

    def _norm(df, score_col, out):
        mm = df.agg(
            F.min(score_col).alias("_lo"), F.max(score_col).alias("_hi")
        )
        return df.crossJoin(F.broadcast(mm)).select(
            df.columns[0],
            F.when(
                F.col("_hi") > F.col("_lo"),
                (F.col(score_col) - F.col("_lo"))
                / (F.col("_hi") - F.col("_lo")),
            )
            .otherwise(F.lit(1.0))
            .alias(out),
        )

    b = _norm(bm25_topk(spark, store, terms, k=n_deep), "score", "nb")
    c = _norm(
        cosine_topk(vectors, query, k=n_deep, id_col=id_col, vec_col=vec_col),
        "cosine",
        "nc",
    ).withColumnRenamed(id_col, "c_doc")
    score = F.coalesce("nb", F.lit(0.0)) * F.lit(float(w_lex)) + F.coalesce(
        "nc", F.lit(0.0)
    ) * F.lit(float(w_dense))
    fused = b.join(c, b["doc_id"] == c["c_doc"], "full_outer").select(
        F.coalesce("doc_id", "c_doc").alias("doc_id"), score.alias("score")
    )
    return fused.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


# ------------------------------------------------------- filtered kNN ---


def filtered_topk(
    vectors: DataFrame,
    query: list[float],
    k: int = 10,
    predicate=None,
    allowed_ids: DataFrame | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ES ``knn`` with ``filter`` — PRE-filter semantics (Lucene
    KnnFloatVectorQuery with a filter weight / ES filtered kNN): the
    restriction applies BEFORE vector scoring, so the result holds k
    survivors whenever k survivors exist — never fewer because
    high-scoring-but-filtered vectors crowded the candidate list (the
    failure mode of post-filtering a plain top-k).

    ``predicate``: Column or SQL string over the vector table's
    metadata columns; stays inside the scan, so at scale it prunes
    partitions/row groups before any vector math runs.

    ``allowed_ids``: single-column DataFrame of ids — e.g. an
    inverted-index boolean match set — applied as a LEFT SEMI join on
    ``id_col``. Match sets are tiny next to a 100 TB vector table, so
    AQE turns the semi join into a broadcast; when it genuinely is
    large, both sides shuffle on the id, which is still one exchange
    before a single scoring scan."""
    cand = vectors
    if predicate is not None:
        cand = cand.where(
            F.expr(predicate) if isinstance(predicate, str) else predicate
        )
    if allowed_ids is not None:
        key = allowed_ids.columns[0]
        ids = allowed_ids.select(
            F.col(key).cast("long").alias(id_col)
        ).distinct()
        cand = cand.join(ids, on=id_col, how="left_semi")
    return cosine_topk(cand, query, k, id_col, vec_col)


def knn_with_query(
    spark,
    store,
    query_str: str,
    query_vec: list[float],
    vectors: DataFrame,
    k: int = 10,
    searcher=None,
    field_stores=None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Lexically-filtered kNN: the filter is a full boolean query
    (the Lucene-classic grammar of operators.boolean) evaluated on the
    inverted index; only docs in the match set are vector-scored.
    This is ES's ``knn: {filter: {query_string: ...}}`` shape and the
    RAG-retrieval workhorse ("semantically nearest docs that actually
    contain the product name"). Doc ids and vector ids share the
    corpus id space (vec_id == doc_id)."""
    from inverted_index_spark.operators.boolean import _matches, parse_query

    match = _matches(
        spark, store, parse_query(query_str),
        searcher=searcher, field_stores=field_stores,
    )
    return filtered_topk(
        vectors, query_vec, k=k,
        allowed_ids=match.select("doc_id"),
        id_col=id_col, vec_col=vec_col,
    )


def embedding_near_dup_pairs(
    vectors: DataFrame,
    threshold: float = 0.95,
    n_bits: int = 10,
    tables: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exact: bool = False,
) -> DataFrame:
    """(a, b, cosine) pairs with cosine ≥ threshold; candidates = pairs
    colliding in ≥1 of `tables` signed-projection bucket tables (OR
    amplification: miss prob ≈ (1-p^bits)^tables); exact cosine
    verified JVM-side.

    ``exact=True`` skips the LSH blocking and scores EVERY a<b pair —
    O(n²), the deterministic verification baseline (same role
    cosine_topk plays for the ANN paths; it is what the DuckDB twin
    reproduces). The LSH path is the 100 TB shape."""
    if exact:
        # norms are per-VECTOR, so compute them before the join — the
        # nested-loop otherwise re-evaluates the interpreted aggregate
        # lambda once per PAIR (n× redundant work); and spread the
        # streamed side across the cores (a small parquet input is one
        # partition, which serializes the whole O(n²) scoring into a
        # single task — measured 16 s → ~2 s on 500 dim-64 vectors).
        par = vectors.sparkSession.sparkContext.defaultParallelism
        l = vectors.select(
            F.col(id_col).cast("long").alias("a"),
            F.col(vec_col).alias("va"),
            _norm(F.col(vec_col)).alias("na"),
        ).repartition(par)
        r = vectors.select(
            F.col(id_col).cast("long").alias("b"),
            F.col(vec_col).alias("vb"),
            _norm(F.col(vec_col)).alias("nb"),
        )
        cand = l.join(r, F.col("a") < F.col("b"))
        cos = _safe_cos(
            _dot(F.col("va"), F.col("vb")), F.col("na"), F.col("nb")
        )
        return (
            cand.withColumn("cosine", cos)
            .where(F.col("cosine") >= threshold)
            .select("a", "b", "cosine")
        )
    dim_row = vectors.select(F.size(vec_col).alias("d")).first()
    dim = int(dim_row["d"])
    planes = _projections(dim, n_bits, tables, seed)
    with_b = vectors.select(
        F.col(id_col).cast("long").alias("vid"),
        F.col(vec_col).alias("v"),
        *_bucket_exprs(vec_col, planes),
    )
    buckets = with_b.select(
        "vid",
        "v",
        F.posexplode(
            F.array(*[F.col(f"bucket_{t}") for t in range(tables)])
        ).alias("tbl", "key"),
    )
    l, r = buckets.alias("l"), buckets.alias("r")
    cand = (
        l.join(
            r,
            (F.col("l.tbl") == F.col("r.tbl"))
            & (F.col("l.key") == F.col("r.key"))
            & (F.col("l.vid") < F.col("r.vid")),
        )
        .select(
            F.col("l.vid").alias("a"),
            F.col("r.vid").alias("b"),
            F.col("l.v").alias("va"),
            F.col("r.v").alias("vb"),
        )
        .dropDuplicates(["a", "b"])
    )
    cos = _safe_cos(
        _dot(F.col("va"), F.col("vb")), _norm(F.col("va")), _norm(F.col("vb"))
    )
    return (
        cand.withColumn("cosine", cos)
        .where(F.col("cosine") >= threshold)
        .select("a", "b", "cosine")
    )


# ------------------------------------------------------- quantization ---


def _int8_scale(x):
    """``max|x| / 127`` column — the ONE source of truth for the int8
    rule both quantize_embeddings (stored index) and quantized_topk
    (inline) must share bit-for-bit: a drift between them would change
    candidate selection while the stored path still matched the
    oracle."""
    maxabs = F.aggregate(
        F.transform(x, lambda v: F.abs(v.cast("double"))),
        F.lit(0.0),
        lambda acc, v: F.greatest(acc, v),
    )
    return maxabs / F.lit(127.0)


def _int8_qvec(vec, scale):
    """``floor(x_i/scale + 0.5)`` int8 column (explicit half-up so any
    IEEE-double engine reproduces it); zero vectors (scale=0) quantize
    to all-zero."""
    return F.when(
        scale == 0.0,
        F.transform(vec, lambda _: F.lit(0).cast("int")),
    ).otherwise(
        F.transform(
            vec,
            lambda e: F.floor(e.cast("double") / scale + F.lit(0.5)).cast("int"),
        )
    )


def quantize_embeddings(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-vector symmetric int8 scalar quantization (the Lucene/ES
    ``int8_hnsw`` storage trick): scale = max|x| / 127, q_i =
    floor(x_i/scale + 0.5). Returns (vec_id, qvec array<int>, scale).

    4x smaller vectors and integer dot products downstream. The
    rounding rule is written as floor(x+0.5) explicitly so the DuckDB
    oracle and any other IEEE-double engine reproduce it bit-for-bit
    (banker's-vs-half-up round() ambiguity avoided). Zero vectors take
    scale=0 and an all-zero qvec. Pure JVM lambda exprs — no shuffle,
    no Python."""
    v = vectors.select(
        F.col(id_col).cast("long").alias("vec_id"),
        F.col(vec_col).alias(vec_col),
        _int8_scale(F.col(vec_col)).alias("scale"),
    )
    qvec = _int8_qvec(F.col(vec_col), F.col("scale"))
    return v.select("vec_id", qvec.alias("qvec"), "scale")


def quantized_topk(
    vectors: DataFrame,
    query: list[float],
    k: int = 10,
    rescore_factor: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Two-phase ANN: rank by INT8-quantized cosine (exact integer dot
    products — cheap and deterministic), keep a k*rescore_factor
    candidate window, then re-score the window with exact float cosine
    and return the true top-k of the window (ES ``rescore_vector``).

    Fully deterministic (quantization rule + integer arithmetic + fixed
    tie-breaks), so unlike LSH/IVF this ANN path is oracle-checkable
    value-for-value. Scale: phase 1 is a projection + TakeOrdered over
    the quantized column (4x less memory bandwidth than float32 scan);
    phase 2 touches ≤ k*rescore_factor rows."""
    if k < 1 or rescore_factor < 1:
        raise ValueError("k and rescore_factor must be >= 1")
    qa = np.asarray(query, dtype=np.float64)
    qmax = float(np.max(np.abs(qa))) if qa.size else 0.0
    qscale = qmax / 127.0
    qq = (
        np.floor(qa / qscale + 0.5).astype(np.int64)
        if qscale > 0.0
        else np.zeros_like(qa, dtype=np.int64)
    )
    qq_norm = float(np.sqrt(np.dot(qq, qq)))
    qq_col = F.array(*[F.lit(int(t)) for t in qq])
    # quantize inline with the SHARED rule builders (bit-identical to
    # quantize_embeddings by construction) — one projection, no
    # join/shuffle; the original vector rides along for the rescore
    quant = vectors.select(
        F.col(id_col).cast("long").alias("vec_id"),
        F.col(vec_col),
        _int8_scale(F.col(vec_col)).alias("scale"),
    ).select(
        "vec_id",
        F.col(vec_col),
        _int8_qvec(F.col(vec_col), F.col("scale")).alias("qvec"),
    )
    qdot = F.aggregate(
        F.zip_with(
            F.col("qvec"), qq_col, lambda a, b: a.cast("double") * b.cast("double")
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    qnorm = F.sqrt(
        F.aggregate(
            F.transform(F.col("qvec"), lambda a: a.cast("double") * a.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
    approx = F.when(
        (qnorm == 0.0) | (F.lit(qq_norm) == 0.0), F.lit(0.0)
    ).otherwise(qdot / (qnorm * F.lit(qq_norm)))
    window = (
        quant.select("vec_id", F.col(vec_col), approx.alias("approx"))
        .orderBy(F.desc("approx"), F.asc("vec_id"))
        .limit(int(k) * int(rescore_factor))
    )
    # exact rescore, zero-norm-guarded (a zero vector scores 0, it
    # doesn't abort the job under ANSI division)
    fq = [float(t) for t in query]
    q_col = F.array(*[F.lit(x) for x in fq])
    qn = float(np.sqrt(np.dot(fq, fq)))
    vnorm = _norm(F.col(vec_col))
    exact = F.when((vnorm == 0.0) | (F.lit(qn) == 0.0), F.lit(0.0)).otherwise(
        _dot(F.col(vec_col), q_col) / (vnorm * F.lit(qn))
    )
    return (
        window.select("vec_id", exact.alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
    )
