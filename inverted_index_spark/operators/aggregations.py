"""Index-native analytics aggregations (ES/Lucene surface beyond the
reference's read path — SURVEY.md §2 extensions):

    significant_terms   ES significant_terms: terms overrepresented in
                        a query's match set vs the whole corpus (JLH)
    term_vectors        Lucene TermVectors API: per-doc (term, tf)
                        re-read from the INDEX, not the source text
    bm25_explain        Lucene Explanation: per-(doc, term) score
                        breakdown — tf, df, idf, norm, contribution
    facet_cardinality   ES cardinality aggregation over a facet column
                        (exact countDistinct or HLL approx)
    rare_terms          ES rare_terms: long-tail terms (doc count ≤
                        threshold) in the match set — exact here, so
                        the ascending order ES forbids on shards is safe
    multi_terms         ES multi_terms: top-k composite (col1, col2, …)
                        buckets over the match set
    adjacency_matrix    ES adjacency_matrix: per-filter and pairwise
                        intersection doc counts for named boolean
                        filters
    top_hits            ES top_hits inside a terms bucket: the busiest
                        n_buckets facet values, each with its size
                        best BM25-ranked hits
    facet_weighted_avg  ES weighted_avg: sum(v*w)/sum(w) over matches
    facet_mad           ES median_absolute_deviation (exact median)
    facet_percentile_ranks  ES percentile_ranks: % of matching docs
                        with value <= each requested v (exact CDF)
    missing_agg         ES missing: matching docs with no field value
    facet_boxplot       ES boxplot: min/q1/q2/q3/max (exact quartiles)
    top_metrics         ES top_metrics: metric values from the k docs
                        with the best sort value (TakeOrdered k)
    matrix_stats        ES matrix_stats: pairwise covariance and
                        correlation matrix over the match set
    sampler_agg         ES sampler / diversified_sampler: best-scoring
                        shard_size docs, optionally capped per
                        dedup-field value (NULL dedup values form one
                        bucket of their own)

All of these compile to one decode pass over the postings scan plus one
aggregation exchange — no driver-side set math. The whole-index scans
(significant_terms, term_vectors) decode every posting row the doc
range [min_doc, max_doc] envelope keeps, which is exactly what these
operations cost on any engine that stores postings term-major; at
cluster scale the scan is embarrassingly parallel over segments and
the shuffle carries (term, counts) pairs, never documents.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from inverted_index_spark.operators import bm25 as _bm25
from inverted_index_spark.operators.boolean import _matches, parse_query
from inverted_index_spark.operators.query import postings_df
from inverted_index_spark.sources.store import SegmentStore


def _needs_pair_dedup(store: SegmentStore) -> bool:
    """Pre-compaction multi-segment overlap can replay a (term, doc)
    pair from two live segments; a single live segment has disjoint
    buckets, so the dedup exchange is skipped on the common path."""
    return len(store.live_segments()) > 1


def significant_terms(
    spark: SparkSession,
    store: SegmentStore,
    q,
    k: int = 10,
    min_doc_count: int = 3,
    min_doc: int | None = None,
    max_doc: int | None = None,
    field_stores: dict[str, SegmentStore] | None = None,
) -> DataFrame:
    """ES significant_terms aggregation: the k terms most
    overrepresented in the query's match set (foreground) relative to
    the whole corpus (background), scored with JLH:

        jlh = (fg% - bg%) * (fg% / bg%),   fg% = fg_df/|matches|,
                                           bg% = bg_df/N

    Plan: ONE whole-index decode (term, doc_id) pairs → left join the
    match set (a marker column, so foreground AND background counts
    come out of the same groupBy(term) — the postings are decoded
    once) → score → TakeOrdered(k). ``min_doc_count`` drops noise
    terms below a foreground floor (ES default 3). Ties break
    (score DESC, term ASC).
    """
    if isinstance(q, str):
        q = parse_query(q)
    matches = _matches(
        spark, store, q, min_doc, max_doc, field_stores=field_stores
    ).select("doc_id")
    if min_doc is None and max_doc is None:
        n_docs, _ = _bm25.corpus_stats(spark, store)
    else:
        # a doc range restricts BOTH universes: bg_df below comes from
        # the range-pruned scan, so N must be the doc count of the SAME
        # range — dividing by the corpus-wide N would deflate bg% by
        # the range fraction and distort every JLH score
        dstats = store.read_docstats(spark)
        if min_doc is not None:
            dstats = dstats.where(F.col("doc_id") >= int(min_doc))
        if max_doc is not None:
            dstats = dstats.where(F.col("doc_id") <= int(max_doc))
        n_docs = dstats.count()
    fg_total = matches.count()
    if fg_total == 0 or n_docs == 0:
        return spark.createDataFrame(
            [], "term string, fg_df long, bg_df long, score double"
        )
    pairs = postings_df(spark, store, None, min_doc, max_doc, with_tf=False)
    if _needs_pair_dedup(store):
        pairs = pairs.dropDuplicates(["term", "doc_id"])
    marked = pairs.join(
        matches.withColumn("_m", F.lit(1)), "doc_id", "left"
    )
    counts = marked.groupBy("term").agg(
        F.count("*").alias("bg_df"),
        F.count("_m").alias("fg_df"),
    )
    fg_pct = F.col("fg_df") / F.lit(float(fg_total))
    bg_pct = F.col("bg_df") / F.lit(float(n_docs))
    return (
        counts.where(F.col("fg_df") >= int(min_doc_count))
        .withColumn("score", (fg_pct - bg_pct) * (fg_pct / bg_pct))
        .select("term", "fg_df", "bg_df", "score")
        .orderBy(F.desc("score"), F.asc("term"))
        .limit(k)
    )


def term_vectors(
    spark: SparkSession,
    store: SegmentStore,
    doc_ids: list[int],
) -> DataFrame:
    """Lucene TermVectors API: (doc_id, term, tf) for the requested
    docs, re-read from the INDEX (round-trip evidence: what the index
    holds, not what a fresh tokenize of the source would say).

    The doc-range envelope [min(ids), max(ids)] prunes segments and
    posting blocks before decode; the final isin filter is evaluated
    on the decoded stream. Request-sized doc lists only — this is the
    per-doc inspection surface, not a corpus scan."""
    ids = sorted({int(d) for d in doc_ids})
    if not ids:
        return spark.createDataFrame([], "doc_id long, term string, tf long")
    pairs = postings_df(spark, store, None, ids[0], ids[-1], with_tf=True)
    if _needs_pair_dedup(store):
        pairs = pairs.dropDuplicates(["term", "doc_id"])
    return (
        pairs.where(F.col("doc_id").isin(ids))
        .select("doc_id", "term", "tf")
        .orderBy("doc_id", "term")
    )


def bm25_explain(
    spark: SparkSession,
    store: SegmentStore,
    terms: list[str],
    doc_ids: list[int] | None = None,
    boosts: dict[str, float] | None = None,
) -> DataFrame:
    """Lucene Explanation for the engine's pinned BM25: one row per
    (doc_id, term) with every score component —

        tf, dl, df, idf = ln((N-df+.5)/(df+.5)+1), boost,
        tf_norm = tf/(tf + k1*(1-b+b*dl/avgdl)),
        contribution = boost * idf * tf_norm

    so that sum(contribution) GROUP BY doc_id reproduces bm25_scores
    exactly. ``doc_ids`` restricts to the docs being explained (the
    usual call shape: explain the top hit)."""
    uniq = sorted(set(terms))
    n_docs, avgdl = _bm25.corpus_stats(spark, store)
    dfs = _bm25.term_dfs(spark, store, uniq)
    _b = boosts or {}
    known = [t for t in uniq if t in dfs]
    if not known or n_docs == 0:
        return spark.createDataFrame(
            [],
            "doc_id long, term string, tf long, dl long, df long, "
            "idf double, boost double, tf_norm double, contribution double",
        )
    lo = min(doc_ids) if doc_ids else None
    hi = max(doc_ids) if doc_ids else None
    posts = postings_df(spark, store, known, lo, hi, with_tf=True)
    if _needs_pair_dedup(store):
        posts = posts.dropDuplicates(["term", "doc_id"])
    if doc_ids:
        posts = posts.where(F.col("doc_id").isin([int(d) for d in doc_ids]))
    df_expr = F.create_map(
        *[x for t in known for x in (F.lit(t), F.lit(int(dfs[t])))]
    )
    idf_expr = F.create_map(
        *[
            x
            for t in known
            for x in (F.lit(t), F.lit(float(_bm25.idf(n_docs, dfs[t]))))
        ]
    )
    boost_expr = F.create_map(
        *[x for t in known for x in (F.lit(t), F.lit(float(_b.get(t, 1.0))))]
    )
    tf_norm = F.col("tf") / (
        F.col("tf")
        + _bm25.K1
        * (1 - _bm25.B + _bm25.B * F.col("dl") / F.lit(float(avgdl)))
    )
    return (
        posts.select(
            "doc_id",
            "term",
            "tf",
            "dl",
            df_expr[F.col("term")].alias("df"),
            idf_expr[F.col("term")].alias("idf"),
            boost_expr[F.col("term")].alias("boost"),
            tf_norm.alias("tf_norm"),
        )
        .withColumn(
            "contribution", F.col("boost") * F.col("idf") * F.col("tf_norm")
        )
        .orderBy("doc_id", "term")
    )


def unigram_loglik(
    spark: SparkSession,
    store: SegmentStore,
    min_doc: int | None = None,
    max_doc: int | None = None,
) -> DataFrame:
    """Per-doc average unigram log-likelihood — the classic
    LM-quality / outlier signal for training-data curation, computed
    from the INDEX alone (no source text needed):

        p(t)   = ctf(t) / T          (MLE collection unigram model;
                                      ctf = collection term frequency,
                                      T = total tokens)
        ll(d)  = Σ_t tf(t,d) · ln p(t) / dl(d)

    Gibberish/boilerplate docs sit far below the corpus mode;
    extremely repetitive docs sit above it. One whole-index decode →
    a tiny (term, ctf) aggregate joined back by term (broadcast: the
    dictionary is vocabulary-sized, not corpus-sized) → one
    groupBy(doc_id). Returns (doc_id, dl, avg_loglik)."""
    pairs = postings_df(spark, store, None, min_doc, max_doc, with_tf=True)
    if _needs_pair_dedup(store):
        pairs = pairs.dropDuplicates(["term", "doc_id"])
    # ONE decode pass (round-6, VERDICT item #7): the stream has two
    # consumers (the ctf aggregate and the per-doc join), so the
    # decoded pairs are materialized once via localCheckpoint
    # (lazy-API-safe persist, same rationale as dedup's signature
    # checkpoint: blocks free on GC, DISK_ONLY, distributed). T (total
    # tokens) folds into the vocabulary-sized ctf aggregate instead of
    # a second corpus-wide sum — three linear decode scans become one.
    from pyspark import StorageLevel

    pairs = pairs.localCheckpoint(eager=False, storageLevel=StorageLevel.DISK_ONLY)
    ctf = pairs.groupBy("term").agg(F.sum("tf").alias("ctf"))
    total = ctf.agg(F.sum("ctf")).collect()[0][0]
    if not total:
        return spark.createDataFrame(
            [], "doc_id long, dl long, avg_loglik double"
        )
    joined = pairs.join(F.broadcast(ctf), "term")
    return (
        joined.withColumn(
            "_ll",
            F.col("tf")
            * F.log(F.col("ctf") / F.lit(float(total))),
        )
        .groupBy("doc_id")
        .agg(
            F.first("dl").alias("dl"),
            (F.sum("_ll") / F.first("dl")).alias("avg_loglik"),
        )
        .orderBy("doc_id")
    )


def rare_terms(
    spark: SparkSession,
    store: SegmentStore,
    q=None,
    max_doc_count: int = 1,
    max_buckets: int = 1000,
    min_doc: int | None = None,
    max_doc: int | None = None,
    field_stores: dict[str, SegmentStore] | None = None,
) -> DataFrame:
    """ES rare_terms aggregation: the LONG-TAIL terms — doc count ≤
    ``max_doc_count`` — within the query's match set (or the whole
    corpus when ``q`` is None). The terms a terms-agg ordered by count
    DESC can never surface; ES built a dedicated agg because "order by
    count ASC" over ordinary terms buckets is unboundedly wrong on
    sharded data — here the groupBy(term) count is exact (one
    exchange), so the ascending order is safe.

    Returns (term, doc_count) ordered (doc_count ASC, term ASC),
    capped at ``max_buckets`` rows (ES's search.max_buckets guard —
    rare terms are the BULK of a Zipf dictionary, an uncapped result
    is vocabulary-sized)."""
    if max_doc_count < 1:
        raise ValueError(f"max_doc_count must be >= 1, got {max_doc_count}")
    pairs = postings_df(spark, store, None, min_doc, max_doc, with_tf=False)
    if _needs_pair_dedup(store):
        pairs = pairs.dropDuplicates(["term", "doc_id"])
    if q is not None:
        if isinstance(q, str):
            q = parse_query(q)
        matches = _matches(
            spark, store, q, min_doc, max_doc, field_stores=field_stores
        ).select("doc_id")
        pairs = pairs.join(matches, "doc_id", "leftsemi")
    return (
        pairs.groupBy("term")
        .agg(F.count("*").alias("doc_count"))
        .where(F.col("doc_count") <= int(max_doc_count))
        .orderBy(F.asc("doc_count"), F.asc("term"))
        .limit(int(max_buckets))
    )


def multi_terms(
    spark: SparkSession,
    store: SegmentStore,
    q,
    docs: DataFrame,
    cols: list[str],
    k: int = 10,
    min_doc: int | None = None,
    max_doc: int | None = None,
    field_stores: dict[str, SegmentStore] | None = None,
) -> DataFrame:
    """ES multi_terms aggregation: top-k COMPOSITE buckets — the
    cross-column keys (e.g. (lang, source)) ranked by how many matched
    docs fall in each. The single-column case is the facets operator;
    this is its n-ary sibling, one groupBy over all key columns.

    Returns (cols..., doc_count) ordered (doc_count DESC, cols ASC).
    Scale: the semi-join keeps only matched docs (posting-bounded),
    the groupBy exchanges composite keys, never documents, and the
    top-k is TakeOrderedAndProject."""
    if not cols:
        raise ValueError("multi_terms needs at least one key column")
    if isinstance(q, str):
        q = parse_query(q)
    matches = _matches(
        spark, store, q, min_doc, max_doc, field_stores=field_stores
    ).select("doc_id")
    narrow = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"), *cols
    ).join(matches, "doc_id", "leftsemi")
    return (
        narrow.groupBy(*cols)
        .agg(F.count("*").alias("doc_count"))
        .orderBy(F.desc("doc_count"), *[F.asc(c) for c in cols])
        .limit(int(k))
    )


def adjacency_matrix(
    spark: SparkSession,
    store: SegmentStore,
    filters: dict[str, object],
    min_doc: int | None = None,
    max_doc: int | None = None,
    field_stores: dict[str, SegmentStore] | None = None,
) -> DataFrame:
    """ES adjacency_matrix aggregation: doc counts for every named
    filter and every pairwise intersection — the co-occurrence matrix
    behind "users who matched A also matched B" dashboards. ``filters``
    maps name → boolean query (string or parsed tree).

    Returns (key, doc_count) where key is 'a' for a filter's own
    bucket and 'a&b' (names sorted, ES's key format) for an
    intersection; empty buckets are omitted (ES behavior). Ordered by
    key.

    Plan: each filter's match set is posting-bounded; buckets come
    from ONE union of per-filter (doc_id, name) marks → a self-join on
    doc_id bounded by matches × filters (filters is a hand-named dict,
    ES caps it at 100) → groupBy(key). Documents never shuffle."""
    if not filters:
        raise ValueError("adjacency_matrix needs at least one named filter")
    marks = None
    for name in sorted(filters):
        if "&" in name:
            raise ValueError(f"filter name {name!r} may not contain '&'")
        q = filters[name]
        if isinstance(q, str):
            q = parse_query(q)
        m = _matches(
            spark, store, q, min_doc, max_doc, field_stores=field_stores
        ).select("doc_id", F.lit(name).alias("name"))
        marks = m if marks is None else marks.unionByName(m)
    pairs = marks.alias("a").join(
        marks.alias("b"),
        (F.col("a.doc_id") == F.col("b.doc_id"))
        & (F.col("a.name") <= F.col("b.name")),
    )
    key = F.when(
        F.col("a.name") == F.col("b.name"), F.col("a.name")
    ).otherwise(F.concat_ws("&", F.col("a.name"), F.col("b.name")))
    return (
        pairs.select(key.alias("key"))
        .groupBy("key")
        .agg(F.count("*").alias("doc_count"))
        .orderBy("key")
    )


def facet_cardinality(
    spark: SparkSession,
    store: SegmentStore,
    q,
    docs: DataFrame,
    col: str,
    exact: bool = True,
    rsd: float = 0.05,
    min_doc: int | None = None,
    max_doc: int | None = None,
    field_stores: dict[str, SegmentStore] | None = None,
) -> DataFrame:
    """ES cardinality aggregation: how many distinct values of a
    metadata column the match set spans. ``exact=True`` is
    countDistinct (two-stage partial agg); ``exact=False`` uses
    Spark's HyperLogLog++ (approx_count_distinct, ``rsd`` relative
    error) — the constant-memory sketch that never shuffles values,
    the right default at 100 TB where the exact path's distinct
    exchange is the bottleneck."""
    if isinstance(q, str):
        q = parse_query(q)
    matches = _matches(
        spark, store, q, min_doc, max_doc, field_stores=field_stores
    ).select("doc_id")
    narrow = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"), F.col(col)
    ).join(matches, "doc_id", "leftsemi")
    agg = (
        F.countDistinct(col)
        if exact
        else F.approx_count_distinct(col, rsd)
    )
    return narrow.agg(agg.alias("cardinality"))


def top_hits(
    spark: SparkSession,
    store: SegmentStore,
    q,
    docs: DataFrame,
    col: str,
    n_buckets: int = 10,
    size: int = 3,
    min_doc: int | None = None,
    max_doc: int | None = None,
    field_stores: dict[str, SegmentStore] | None = None,
) -> DataFrame:
    """ES top_hits aggregation nested inside a terms bucket: the
    ``n_buckets`` facet values with the most matching docs, each
    carrying its ``size`` best BM25-ranked hits (collapse_topk keeps
    the global top-k; this keeps every selected bucket's local
    ranking). One match-set semi-join against the narrow
    (doc_id, col) projection, one k-group count to pick buckets
    (broadcast back — n_buckets rows), one per-bucket window. The
    shuffle carries (doc_id, facet, score) for matches only; skewed
    facet values are the only skew surface, same profile as
    facet_counts."""
    from pyspark.sql import Window

    from inverted_index_spark.operators.boolean import ranked_matches

    ranked = ranked_matches(
        spark, store, q, min_doc, max_doc, field_stores=field_stores
    )
    narrow = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"), F.col(col)
    )
    joined = ranked.join(narrow, "doc_id")
    buckets = (
        joined.groupBy(col)
        .agg(F.count("*").alias("n_docs"))
        .orderBy(F.desc("n_docs"), F.asc(col))
        .limit(n_buckets)
    )
    w = Window.partitionBy(col).orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        joined.join(F.broadcast(buckets), col)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= size)
        .select(col, "n_docs", "rank", "doc_id", "score")
        .orderBy(F.desc("n_docs"), F.asc(col), F.asc("rank"))
    )


def facet_weighted_avg(
    spark: SparkSession,
    store: SegmentStore,
    q,
    docs: DataFrame,
    value_col: str,
    weight_col: str,
    min_doc: int | None = None,
    max_doc: int | None = None,
    field_stores: dict[str, SegmentStore] | None = None,
) -> DataFrame:
    """ES ``weighted_avg`` aggregation: sum(value*weight)/sum(weight)
    over the match set. Docs missing the VALUE are skipped and docs
    missing only the WEIGHT count with weight 1 — the ES defaults when
    no ``missing`` substitute is configured. One narrow semi-joined
    aggregate — the exchange carries two doubles per matching doc."""
    if isinstance(q, str):
        q = parse_query(q)
    matches = _matches(
        spark, store, q, min_doc, max_doc, field_stores=field_stores
    ).select("doc_id")
    narrow = (
        docs.select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.col(value_col).cast("double").alias("_v"),
            F.coalesce(F.col(weight_col).cast("double"), F.lit(1.0)).alias(
                "_w"
            ),
        )
        .where(F.col("_v").isNotNull())
        .join(matches, "doc_id", "leftsemi")
    )
    return narrow.agg(
        F.count("*").alias("n_docs"),
        (F.sum(F.col("_v") * F.col("_w")) / F.sum("_w")).alias("weighted_avg"),
        F.sum("_w").alias("sum_weight"),
    )


def facet_mad(
    spark: SparkSession,
    store: SegmentStore,
    q,
    docs: DataFrame,
    stat_col: str,
    min_doc: int | None = None,
    max_doc: int | None = None,
    field_stores: dict[str, SegmentStore] | None = None,
) -> DataFrame:
    """ES ``median_absolute_deviation``: median(|x - median(x)|) over
    the match set. ES approximates with a TDigest; this computes the
    EXACT interpolated median (Spark ``median`` ≡ percentile 0.5),
    which is the value the approximation converges to — and what a
    SQL oracle can verify. Two aggregate passes over the same narrow
    projection: the first reduces to ONE scalar (broadcast back), the
    second reduces the absolute deviations. Both exchanges carry one
    double per matching doc — no doc payloads, no driver data."""
    if isinstance(q, str):
        q = parse_query(q)
    matches = _matches(
        spark, store, q, min_doc, max_doc, field_stores=field_stores
    ).select("doc_id")
    narrow = (
        docs.select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.col(stat_col).cast("double").alias("_x"),
        )
        .where(F.col("_x").isNotNull())
        .join(matches, "doc_id", "leftsemi")
    )
    med = narrow.agg(F.median("_x").alias("_med"))
    return (
        narrow.crossJoin(F.broadcast(med))
        .select(F.abs(F.col("_x") - F.col("_med")).alias("_d"))
        .agg(
            F.count("*").alias("n_docs"),
            F.median("_d").alias("mad"),
        )
    )


def facet_percentile_ranks(
    spark: SparkSession,
    store: SegmentStore,
    q,
    docs: DataFrame,
    stat_col: str,
    values: tuple[float, ...],
    min_doc: int | None = None,
    max_doc: int | None = None,
    field_stores: dict[str, SegmentStore] | None = None,
) -> DataFrame:
    """ES ``percentile_ranks``: for each requested value v, the
    percentage of matching docs whose ``stat_col`` <= v — the inverse
    of the percentiles aggregation. ES approximates with a TDigest
    (interpolating between centroids); this computes the EXACT
    empirical CDF the approximation converges to, which is what a SQL
    oracle can verify (the same exact-limit argument facet_mad and
    facet_percentiles use). Docs with a NULL value are skipped (ES
    default without a ``missing`` substitute).

    Returns one row per requested value: (value, n_docs, pct_rank)
    in request order. ONE aggregate pass — every requested value is a
    column of the same agg (k is the request arity, never data-sized),
    then unpivoted driver-side, so the scan and exchange happen once
    regardless of how many values are asked for."""
    if not values:
        raise ValueError("percentile_ranks needs at least one value")
    if isinstance(q, str):
        q = parse_query(q)
    matches = _matches(
        spark, store, q, min_doc, max_doc, field_stores=field_stores
    ).select("doc_id")
    narrow = (
        docs.select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.col(stat_col).cast("double").alias("_x"),
        )
        .where(F.col("_x").isNotNull())
        .join(matches, "doc_id", "leftsemi")
    )
    aggs = [F.count(F.lit(1)).alias("_n")]
    for i, v in enumerate(values):
        aggs.append(
            F.avg(
                F.when(F.col("_x") <= F.lit(float(v)), 1.0).otherwise(0.0)
            ).alias(f"_r{i}")
        )
    wide = narrow.agg(*aggs)
    # unpivot like matrix_stats: explode an array of structs built
    # from the ONE agg row — the agg runs once, not once per value
    cells = F.array(
        *[
            F.struct(
                F.lit(float(v)).alias("value"),
                F.col("_n").alias("n_docs"),
                (F.col(f"_r{i}") * 100.0).alias("pct_rank"),
            )
            for i, v in enumerate(values)
        ]
    )
    return wide.select(F.explode(cells).alias("c")).select("c.*")


def missing_agg(
    spark: SparkSession,
    store: SegmentStore,
    q,
    docs: DataFrame,
    col: str,
    min_doc: int | None = None,
    max_doc: int | None = None,
    field_stores: dict[str, SegmentStore] | None = None,
) -> DataFrame:
    """ES ``missing`` aggregation: the count of matching docs with no
    value for ``col`` (the bucket ES nests sub-aggs under to analyze
    the undocumented remainder). One narrow semi-joined aggregate —
    the exchange carries a boolean per matching doc."""
    if isinstance(q, str):
        q = parse_query(q)
    matches = _matches(
        spark, store, q, min_doc, max_doc, field_stores=field_stores
    ).select("doc_id")
    narrow = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col(col).isNull().alias("_miss"),
    ).join(matches, "doc_id", "leftsemi")
    return narrow.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("_miss").cast("long")).alias("n_missing"),
    )


def facet_boxplot(
    spark: SparkSession,
    store: SegmentStore,
    q,
    docs: DataFrame,
    stat_col: str,
    min_doc: int | None = None,
    max_doc: int | None = None,
    field_stores: dict[str, SegmentStore] | None = None,
) -> DataFrame:
    """ES ``boxplot`` aggregation: (n_docs, min, q1, q2, q3, max) of a
    numeric column over the match set — exact linear-interpolated
    quartiles (the TDigest limit ES approximates, same argument as
    facet_mad / facet_percentiles). NULL values are skipped (ES
    default). ONE aggregate pass over the narrow semi-joined
    projection; the exchange carries one double per matching doc."""
    if isinstance(q, str):
        q = parse_query(q)
    matches = _matches(
        spark, store, q, min_doc, max_doc, field_stores=field_stores
    ).select("doc_id")
    narrow = (
        docs.select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.col(stat_col).cast("double").alias("_x"),
        )
        .where(F.col("_x").isNotNull())
        .join(matches, "doc_id", "leftsemi")
    )
    p = F.percentile("_x", F.lit([0.25, 0.5, 0.75]))
    return narrow.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("_x").alias("min_v"),
        p.alias("_p"),
        F.max("_x").alias("max_v"),
    ).select(
        "n_docs",
        "min_v",
        F.col("_p")[0].alias("q1"),
        F.col("_p")[1].alias("q2"),
        F.col("_p")[2].alias("q3"),
        "max_v",
    )


def top_metrics(
    spark: SparkSession,
    store: SegmentStore,
    q,
    docs: DataFrame,
    sort_col: str,
    metric_cols: Sequence[str],
    k: int = 1,
    ascending: bool = False,
    min_doc: int | None = None,
    max_doc: int | None = None,
    field_stores: dict[str, SegmentStore] | None = None,
) -> DataFrame:
    """ES ``top_metrics`` aggregation: the metric column values taken
    from the ``k`` matching docs with the largest (or smallest, with
    ``ascending``) sort value. Ties break on doc_id ASC so pagination
    and the oracle are deterministic (ES leaves sort-tie order to
    shard iteration; a total order is strictly more reproducible).

    Returns (doc_id, <sort_col>, <metric_cols...>) in rank order.
    Plan: narrow projection semi-joined to the match set →
    TakeOrdered k — sort-size is k, never the corpus."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if isinstance(q, str):
        q = parse_query(q)
    matches = _matches(
        spark, store, q, min_doc, max_doc, field_stores=field_stores
    ).select("doc_id")
    narrow = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col(sort_col),
        *[F.col(c) for c in metric_cols],
    ).join(matches, "doc_id", "leftsemi")
    order = (
        F.asc_nulls_last(sort_col) if ascending else F.desc_nulls_last(sort_col)
    )
    return narrow.orderBy(order, F.asc("doc_id")).limit(k)


def matrix_stats(
    spark: SparkSession,
    store: SegmentStore,
    q,
    docs: DataFrame,
    cols: list[str],
    min_doc: int | None = None,
    max_doc: int | None = None,
    field_stores: dict[str, SegmentStore] | None = None,
) -> DataFrame:
    """ES ``matrix_stats`` aggregation: pairwise SAMPLE covariance
    (n−1 normalization, matching ES's MatrixStatsResults) and Pearson
    correlation (plus per-side means) for every ordered pair of
    numeric fields over the match set. ES drops documents missing ANY
    of the fields (its documented multivariate behavior); so does
    this. ONE aggregate pass — all k·(k+1)/2 moments are columns of
    the same agg, then unpivoted to rows (k is the request arity,
    never data-sized), so the scan and the exchange happen once
    regardless of how many pairs are requested.

    Returns (col_x, col_y, n_docs, mean_x, mean_y, covariance,
    correlation) for x <= y in ``cols`` order; the diagonal carries
    the sample variance and correlation 1. A single-doc match set
    yields NULL covariance/correlation (n−1 = 0 — ES returns NaN
    there; NULL is the SQL spelling, and Spark and DuckDB agree on
    it)."""
    if len(cols) < 2:
        raise ValueError("matrix_stats needs at least two columns")
    if isinstance(q, str):
        q = parse_query(q)
    matches = _matches(
        spark, store, q, min_doc, max_doc, field_stores=field_stores
    ).select("doc_id")
    proj = [F.col("doc_id").cast("long").alias("doc_id")] + [
        F.col(c).cast("double").alias(f"_c{i}") for i, c in enumerate(cols)
    ]
    narrow = docs.select(*proj)
    for i in range(len(cols)):
        narrow = narrow.where(F.col(f"_c{i}").isNotNull())
    narrow = narrow.join(matches, "doc_id", "leftsemi")
    aggs = [F.count("*").alias("_n")]
    for i in range(len(cols)):
        aggs.append(F.avg(f"_c{i}").alias(f"_m{i}"))
        for j in range(i, len(cols)):
            aggs.append(
                F.covar_samp(f"_c{i}", f"_c{j}").alias(f"_cov_{i}_{j}")
            )
            aggs.append(F.corr(f"_c{i}", f"_c{j}").alias(f"_cor_{i}_{j}"))
    wide = narrow.agg(*aggs)
    pairs = F.array(
        *[
            F.struct(
                F.lit(cols[i]).alias("col_x"),
                F.lit(cols[j]).alias("col_y"),
                F.col("_n").alias("n_docs"),
                F.col(f"_m{i}").alias("mean_x"),
                F.col(f"_m{j}").alias("mean_y"),
                F.col(f"_cov_{i}_{j}").alias("covariance"),
                F.col(f"_cor_{i}_{j}").alias("correlation"),
            )
            for i in range(len(cols))
            for j in range(i, len(cols))
        ]
    )
    return wide.select(F.explode(pairs).alias("p")).select("p.*")


def sampler_agg(
    spark: SparkSession,
    store: SegmentStore,
    q,
    shard_size: int = 100,
    diversify_docs: DataFrame | None = None,
    diversify_col: str | None = None,
    max_docs_per_value: int = 1,
    min_doc: int | None = None,
    max_doc: int | None = None,
    field_stores: dict[str, SegmentStore] | None = None,
) -> DataFrame:
    """ES ``sampler`` / ``diversified_sampler`` aggregation: restrict
    downstream sub-aggregations to the ``shard_size`` BEST-scoring
    matches. With ``diversify_col`` set, at most ``max_docs_per_value``
    docs per distinct value of that column survive BEFORE the size cut
    (the diversified variant — de-biases the sample away from one
    dominant source). Deterministic: score ties break on doc_id.

    Returns the sample as (doc_id, score) rows — compose it with any
    facet by passing ``docs.join(sample, "doc_id", "leftsemi")``,
    exactly how ES nests sub-aggs under the sampler bucket.

    Scale: scoring is the standard pruned BM25 pass; the diversity
    window partitions by the dedup value (skew bounded by
    max_docs_per_value surviving rows per value) and the final cut is
    a TakeOrdered limit — shard_size rows, never the corpus."""
    from pyspark.sql import Window

    from inverted_index_spark.operators.boolean import ranked_matches

    if shard_size < 1:
        raise ValueError(f"shard_size must be >= 1, got {shard_size}")
    if (diversify_col is None) != (diversify_docs is None):
        raise ValueError(
            "diversify_col and diversify_docs must be given together"
        )
    ranked = ranked_matches(
        spark, store, q, min_doc, max_doc, field_stores=field_stores
    )
    if diversify_col is not None:
        if max_docs_per_value < 1:
            raise ValueError(
                f"max_docs_per_value must be >= 1, got {max_docs_per_value}"
            )
        narrow = diversify_docs.select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.col(diversify_col).alias("_dv"),
        )
        w = Window.partitionBy("_dv").orderBy(
            F.desc("score"), F.asc("doc_id")
        )
        ranked = (
            ranked.join(narrow, "doc_id", "left")
            .withColumn("_r", F.row_number().over(w))
            .where(F.col("_r") <= int(max_docs_per_value))
            .drop("_r", "_dv")
        )
    return (
        ranked.orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(int(shard_size))
    )
