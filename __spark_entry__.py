"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship BM25 top-k over an index built from
sf0.001 documents. ``queries()`` — one entry per implemented operator
(SURVEY.md §2 + training-pipeline rubric); each runs the Spark engine
at (spark, sf_dir). ``oracle_sql()`` — DuckDB ANSI-SQL twins over the
same parquet views, column names/types aligned for the driver's
order-insensitive value-hash compare. Non-SQL-expressible ops
(minhash/simhash/WAND/transcripts) ship without oracles → rows-only.
"""

from __future__ import annotations

import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from inverted_index_spark.operators import bm25 as _bm25
from inverted_index_spark.operators import dedup as _dedup
from inverted_index_spark.operators import query as _query
from inverted_index_spark.operators import similarity as _sim
from inverted_index_spark.operators.build import build_index
from inverted_index_spark.operators.wand import bm25_topk_wand
from inverted_index_spark.functions import textstats as _ts
from inverted_index_spark.sources.store import SegmentStore
from inverted_index_spark.sources.transcripts import generate_transcripts

# fixed demo query (terms present in the documents vocabulary)
Q_TERMS = ["spark", "merge", "window"]
OR_TERMS = ["spark", "merge"]
RANGE = (100, 400)
# batched query sets (the headline one-job paths, oracle-gated too)
BATCH_QS = {
    "q1": ["spark", "merge"],
    "q2": ["window", "partition"],
    "q3": ["index", "spark", "query"],
}
BATCH_READS = {
    "r1": (["spark"], 100, 400),
    "r2": (["merge", "window"], None, None),
    "r3": (["index", "nosuchterm"], 50, None),
}

_STORES: dict[str, SegmentStore] = {}
_SEARCHERS: dict[str, object] = {}


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _store_for(spark: SparkSession, sf_dir: str) -> SegmentStore:
    """Build the inverted index over documents once per (process, sf_dir).

    positions=True: the store also carries the positional artifact so
    the phrase_match entry runs over the same segments."""
    if sf_dir not in _STORES:
        store = SegmentStore(tempfile.mkdtemp(prefix="ii_entry_") + "/idx")
        build_index(
            spark, _docs(spark, sf_dir), store, bucket_size=1 << 14,
            positions=True, store_text=True,
        )
        _STORES[sf_dir] = store
    return _STORES[sf_dir]


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: build index over sf0.001 documents, BM25 top-10 via
    block-max WAND."""
    store = _store_for(spark, "/root/testdata/sf0.001")
    return bm25_topk_wand(spark, store, Q_TERMS, k=10)


# --------------------------------------------------------------- queries ---


def _q_read_terms(spark, sf):
    return _query.read_terms(spark, _store_for(spark, sf))


def _q_read_values_or(spark, sf):
    return _query.read_values(spark, _store_for(spark, sf), OR_TERMS, *RANGE)


def _q_read_values_all(spark, sf):
    return _query.read_all_values(spark, _store_for(spark, sf), OR_TERMS)


def _q_and_values(spark, sf):
    return _query.and_values(spark, _store_for(spark, sf), OR_TERMS)


def _q_term_df(spark, sf):
    seg = _store_for(spark, sf).read_postings(spark)
    return seg.groupBy("term").agg(F.sum("df").alias("df")).orderBy("term")


def _q_doc_lengths(spark, sf):
    return _store_for(spark, sf).read_docstats(spark).orderBy("doc_id")


def _q_corpus_stats(spark, sf):
    n, avgdl = _bm25.corpus_stats(spark, _store_for(spark, sf))
    return spark.createDataFrame([(n, round(avgdl, 6))], "n_docs long, avgdl double")


def _q_bm25_scores(spark, sf):
    s = _bm25.bm25_scores(spark, _store_for(spark, sf), Q_TERMS)
    return s.select("doc_id", F.round("score", 6).alias("score"))


def _q_classic_topk(spark, sf):
    """ClassicSimilarity (TF-IDF VSM) top-k over the same index
    (pluggable-similarity surface, operators/bm25.py)."""
    t = _bm25.similarity_topk(
        spark, _store_for(spark, sf), Q_TERMS, k=10, similarity="classic"
    )
    return t.select("doc_id", F.round("score", 4).alias("score"))


def _q_lmd_topk(spark, sf):
    """LMDirichlet (query-likelihood) top-k over the same index."""
    t = _bm25.similarity_topk(
        spark, _store_for(spark, sf), Q_TERMS, k=10, similarity="dirichlet"
    )
    return t.select("doc_id", F.round("score", 4).alias("score"))


def _q_bm25_topk(spark, sf):
    t = _bm25.bm25_topk(spark, _store_for(spark, sf), Q_TERMS, k=10)
    return t.select("doc_id", F.round("score", 4).alias("score"))


def _q_bm25_topk_wand(spark, sf):
    t = bm25_topk_wand(spark, _store_for(spark, sf), Q_TERMS, k=10)
    return t.select("doc_id", F.round("score", 4).alias("score"))


def _q_dedup_fingerprints(spark, sf):
    fp = _ts.fingerprints(_docs(spark, sf))
    return (
        fp.groupBy("fp")
        .agg(F.count("*").alias("n_dups"), F.min("doc_id").alias("keep_id"))
        .orderBy("fp")
    )


def _q_bpe_learn(spark, sf):
    """Distributed BPE vocabulary learning (operators/bpe.py): the
    Spark learner's merge list must EQUAL the scalar Sennrich twin's —
    iterative argmax has no SQL twin, so the entry self-checks in-entry
    (the transcripts_bm25 pattern) and raises on any divergence."""
    from inverted_index_spark.operators import bpe as _bpe

    sub = _docs(spark, sf).where(F.col("doc_id") < 80)
    got = _bpe.learn_bpe(spark, sub, n_merges=12)
    texts = [r["text"] for r in sub.select("text").collect()]
    want = _bpe.learn_bpe_py(texts, n_merges=12)
    if got != want:
        raise AssertionError(f"bpe learner diverged: {got} != {want}")
    return spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(got)],
        "rank long, a string, b string",
    )


def _q_bpe_encode(spark, sf):
    """BPE corpus encoding with a fixed learned merge list; self-checks
    every doc's piece sequence against the scalar twin."""
    from inverted_index_spark.functions.tokenizer import tokenize_text
    from inverted_index_spark.operators import bpe as _bpe

    docs = _docs(spark, sf)
    texts = {
        r["doc_id"]: r["text"]
        for r in docs.where(F.col("doc_id") < 80).collect()
    }
    merges = _bpe.learn_bpe_py(list(texts.values()), n_merges=16)
    out = _bpe.encode_bpe(docs.where(F.col("doc_id") < 80), merges)
    got = {r["doc_id"]: list(r["pieces"]) for r in out.collect()}
    for d, t in texts.items():
        want = [
            p for w in tokenize_text(t)
            for p in _bpe.encode_word_py(w, merges)
        ]
        if got.get(d) != want:
            raise AssertionError(f"bpe encode diverged on doc {d}")
    return out.select(
        "doc_id", F.size("pieces").alias("n_pieces")
    ).orderBy("doc_id")


def _q_analyzed_term_df(spark, sf):
    """Analyzer chain (stop filter + S-stemmer) applied at ingest; df
    over the analyzed term space. The DuckDB oracle mirrors the exact
    pinned rules (functions/analyzer.py), so any drift in either twin
    hash-mismatches."""
    from inverted_index_spark.functions.analyzer import (
        ENGLISH_STOPWORDS, Analyzer,
    )
    from inverted_index_spark.functions.tokenizer import tokenize

    an = Analyzer(stopwords=ENGLISH_STOPWORDS, stem=True)
    toks = tokenize(an.apply(_docs(spark, sf)))
    return (
        toks.groupBy("term")
        .agg(F.countDistinct("doc_id").alias("df"))
        .orderBy("term")
    )


def _q_token_counts(spark, sf):
    t = _ts.token_counts(_docs(spark, sf))
    return t.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("n_bpe_tokens").cast("long").alias("n_bpe_tokens"),
        "n_chars",
    )


def _q_quality(spark, sf):
    q = _ts.quality_scores(_docs(spark, sf))
    return q.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.round("avg_token_len", 6).alias("avg_token_len"),
        F.round("stopword_ratio", 6).alias("stopword_ratio"),
        F.round("distinct_ratio", 6).alias("distinct_ratio"),
    )


def _q_lang_id(spark, sf):
    return _ts.lang_id(_docs(spark, sf)).orderBy("doc_id")


def _curation_docs(spark, sf):
    """Deterministic multi-line derivation of the documents table:
    the word-soup fixtures carry no newlines or punctuation, so both
    engines replace ' merge ' with '.\\n' and append a final '.' —
    literal non-overlapping left-to-right replace on both sides."""
    return _docs(spark, sf).select(
        "doc_id",
        F.concat(
            F.regexp_replace("text", " merge ", ".\n"), F.lit(".")
        ).alias("text"),
    )


def _q_c4_clean(spark, sf):
    """Round-5: C4 line-level cleaning rules (Raffel et al. 2020
    §2.2) — terminal punctuation, min words per line, marker lines,
    doc markers, min sentences."""
    from inverted_index_spark.operators.curation import c4_clean

    return c4_clean(_curation_docs(spark, sf)).orderBy("doc_id")


def _q_dedup_lines(spark, sf):
    """Round-5: C4 cross-corpus repeated-line removal — every
    normalized line keeps only its global first occurrence."""
    from inverted_index_spark.operators.curation import dedup_lines

    return dedup_lines(_curation_docs(spark, sf)).orderBy("doc_id")


MIX_TARGETS = {"src0": 0.5, "src1": 0.3, "src2": 0.2}


def _q_mix_corpus(spark, sf):
    """Round-5: training-mix sampler — per-source thresholds derived
    from counts + target weights realize the target proportions; the
    SQL twin recomputes the identical double-precision thresholds."""
    from inverted_index_spark.operators.mixing import mix_corpus

    return (
        mix_corpus(_docs(spark, sf), MIX_TARGETS)
        .select("doc_id", "source")
        .orderBy("doc_id")
    )


def _q_gopher(spark, sf):
    """Round-5: Gopher repetition/quality rules (Rae et al. 2021,
    Table A1) — dup-line / top-ngram / dup-ngram char fractions,
    symbol ratio, alpha fraction, plus the keep verdict at the
    standard thresholds. keep is computed on UNROUNDED signals."""
    g = _ts.gopher_filter(_docs(spark, sf))
    return g.select(
        "doc_id",
        "keep",
        F.col("n_words").cast("long").alias("n_words"),
        "n_lines",
        F.round("dup_line_frac", 6).alias("dup_line_frac"),
        F.round("symbol_word_ratio", 6).alias("symbol_word_ratio"),
        F.round("alpha_word_frac", 6).alias("alpha_word_frac"),
        F.round("top_2gram_char_frac", 6).alias("top_2gram_char_frac"),
        F.round("top_3gram_char_frac", 6).alias("top_3gram_char_frac"),
        F.round("dup_5gram_char_frac", 6).alias("dup_5gram_char_frac"),
    ).orderBy("doc_id")


def _q_embed_cosine(spark, sf):
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    qv = emb.where(F.col("vec_id") == 0).select("embedding").first()["embedding"]
    s = _sim.cosine_scores(emb, [float(x) for x in qv])
    return s.select("vec_id", F.round("cosine", 6).alias("cosine"))


def _q_embed_near_pairs(spark, sf):
    """Round-4: embedding-cosine near-duplicate pairs — the exact
    verification baseline of embedding_near_dup_pairs (the LSH-bucketed
    variant is the 100 TB shape; its recall is subset-tested against
    this exact path in tests/test_pipeline_ops.py)."""
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    p = _sim.embedding_near_dup_pairs(emb, threshold=0.4, exact=True)
    return p.select(
        "a", "b", F.round("cosine", 6).alias("cosine")
    ).orderBy("a", "b")


def _q_embed_knn(spark, sf):
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    qv = emb.where(F.col("vec_id") == 0).select("embedding").first()["embedding"]
    t = _sim.cosine_topk(emb, [float(x) for x in qv], k=20)
    return t.select("vec_id", F.round("cosine", 4).alias("cosine"))


def _q_knn_filtered(spark, sf):
    """ES knn-with-filter (pre-filter): metadata predicate restricts the
    candidate set before vector scoring."""
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    qv = emb.where(F.col("vec_id") == 0).select("embedding").first()["embedding"]
    t = _sim.filtered_topk(
        emb, [float(x) for x in qv], k=15,
        predicate=F.col("label").isin(1, 3, 5),
    )
    return t.select("vec_id", F.round("cosine", 4).alias("cosine"))


def _q_knn_query_filtered(spark, sf):
    """Lexically-filtered kNN: the filter is a boolean index query
    ('spark AND merge'); only its match set is vector-scored."""
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    qv = emb.where(F.col("vec_id") == 0).select("embedding").first()["embedding"]
    t = _sim.knn_with_query(
        spark, _store_for(spark, sf), "spark AND merge",
        [float(x) for x in qv], emb, k=15,
    )
    return t.select("vec_id", F.round("cosine", 4).alias("cosine"))


def _q_ngram_jaccard(spark, sf):
    docs = _docs(spark, sf).where(F.col("doc_id") < 60)
    ids = docs.select(F.col("doc_id").alias("a"))
    pairs = ids.crossJoin(docs.select(F.col("doc_id").alias("b"))).where(
        F.col("a") < F.col("b")
    )
    j = _dedup.ngram_jaccard_pairs(docs, pairs)
    return j.where(F.col("jaccard") > 0).select(
        "a", "b", F.round("jaccard", 6).alias("jaccard")
    )


def _q_dedup_exact_keep(spark, sf):
    """The dedup SURVIVOR set (corpus minus exact duplicates, keep min
    doc_id) — the other half of exact dedup next to the group listing."""
    kept = _dedup.dedup_exact(_docs(spark, sf))
    return kept.select("doc_id").orderBy("doc_id")


def _q_simhash_values(spark, sf):
    """Per-doc 64-bit simhash values (tf-weighted md5 bit votes) —
    oracle-pinned bit-for-bit via DuckDB md5_number_upper."""
    return _dedup.simhash(_docs(spark, sf)).orderBy("doc_id")


def _q_minhash_pairs(spark, sf):
    p = _dedup.minhash_lsh_pairs(_docs(spark, sf), threshold=0.3)
    return p.select("a", "b", F.round("est_jaccard", 6).alias("est_jaccard"))


def _q_simhash_pairs(spark, sf):
    # bands auto-derives to max_hamming+1 → pigeonhole recall guarantee
    # holds by construction (round-2 fix; was max_hamming=16, bands=4)
    return _dedup.simhash_near_pairs(_docs(spark, sf), max_hamming=7)


def _searcher_for(spark, sf):
    if sf not in _SEARCHERS:
        from inverted_index_spark.operators.search import Searcher

        _SEARCHERS[sf] = Searcher(spark, _store_for(spark, sf)).open()
    return _SEARCHERS[sf]


def _q_bm25_topk_batch(spark, sf):
    """Headline one-job batched BM25 (Searcher.topk_batch) — the path
    bench.py's bm25_wand_one_job measures, oracle-gated here."""
    t = _searcher_for(spark, sf).topk_batch(BATCH_QS, k=5)
    return t.select(
        "qid", "rank", "doc_id", F.round("score", 4).alias("score")
    ).orderBy("qid", "rank")


def _q_read_values_batch(spark, sf):
    """One-job batched R10 reads (Searcher.read_values_batch)."""
    return _searcher_for(spark, sf).read_values_batch(BATCH_READS)


def _q_span_first(spark, sf):
    """Round-5: Lucene SpanFirstQuery — the exact phrase must start
    within the first 40 token positions."""
    from inverted_index_spark.operators.spans import span_first

    return span_first(spark, _store_for(spark, sf), PHRASE, 40)


def _q_phrase_prefix(spark, sf):
    """Round-5: ES match_phrase_prefix — exact phrase whose last slot
    accepts any dictionary term with the prefix (expansion capped at
    50 in dictionary order, the ES contract)."""
    from inverted_index_spark.operators.phrase_prefix import match_phrase_prefix

    return match_phrase_prefix(
        spark, _store_for(spark, sf), [PHRASE[0]], "s", max_expansions=50
    )


def _q_span_not(spark, sf):
    """Round-5: Lucene SpanNotQuery — exact-phrase spans rejected when
    'merge' occurs within 2 positions before the span start or 2
    positions after the span end."""
    from inverted_index_spark.operators.spans import span_not

    return span_not(spark, _store_for(spark, sf), PHRASE, ["merge"], pre=2, post=2)


def _q_span_or(spark, sf):
    """Round-5: Lucene SpanOrQuery — distinct spans matched by the
    exact phrase OR the single term 'window', one adjacency kernel."""
    from inverted_index_spark.operators.spans import span_or

    return span_or(spark, _store_for(spark, sf), [PHRASE, ["window"]])


def _q_span_within(spark, sf):
    """Round-5: Lucene SpanWithinQuery — 'hash' occurrences that fall
    fully within a span of the exact phrase (i.e. preceded by
    'table')."""
    from inverted_index_spark.operators.spans import span_within

    return span_within(spark, _store_for(spark, sf), PHRASE, [PHRASE[1]])


def _q_rare_terms(spark, sf):
    """Round-5: ES rare_terms — the dictionary long tail (doc count ≤
    382 catches the synthetic corpus's rare 'dup' marker plus the low
    end of the common band; exact counts make count-ASC order safe)."""
    from inverted_index_spark.operators.aggregations import rare_terms

    return rare_terms(spark, _store_for(spark, sf), max_doc_count=382)


def _q_adjacency_matrix(spark, sf):
    """Round-5: ES adjacency_matrix — per-filter and pairwise
    intersection doc counts for three named boolean filters."""
    from inverted_index_spark.operators.aggregations import adjacency_matrix

    return adjacency_matrix(
        spark, _store_for(spark, sf),
        {"dup": "dup", "mw": "merge AND window", "spark": "spark"},
    )


def _q_multi_terms(spark, sf):
    """Round-5: ES multi_terms — top (lang, source) composite buckets
    over the docs matching 'dup'."""
    from inverted_index_spark.operators.aggregations import multi_terms

    return multi_terms(
        spark, _store_for(spark, sf), "dup", _docs(spark, sf),
        ["lang", "source"], k=10,
    )


def _child_parent(spark, sf):
    """The entry's join-field mapping: every document is a child of
    its source (ES join-field re-expressed as a plain column)."""
    return _docs(spark, sf).select(
        "doc_id", F.col("source").alias("parent_id")
    )


def _q_has_child_topk(spark, sf):
    """Round-5: ES has_child — parents ranked by the SUM of their
    matching children's BM25 scores; one rollup keyed by parent."""
    from inverted_index_spark.operators.parent_child import has_child_topk

    t = has_child_topk(
        spark,
        _store_for(spark, sf),
        Q_TERMS,
        _child_parent(spark, sf),
        k=10,
        score_mode="sum",
    )
    return t.select(
        "parent_id", F.round("score", 6).alias("score"), "n_children"
    )


def _q_child_inner_hits(spark, sf):
    """Round-5: ES inner_hits — each matched parent's top-2 children
    by score; a window over the match set only."""
    from inverted_index_spark.operators.parent_child import child_inner_hits

    h = child_inner_hits(
        spark, _store_for(spark, sf), Q_TERMS, _child_parent(spark, sf),
        n_per_parent=2,
    )
    return h.select(
        "parent_id", "child_rank", "doc_id", F.round("score", 6).alias("score")
    ).orderBy("parent_id", "child_rank")


def _q_has_parent_topk(spark, sf):
    """Round-5: ES has_parent — children inherit their parent's BM25
    score; parents here are each source's head doc (min doc_id)."""
    from inverted_index_spark.operators.parent_child import has_parent_topk

    d = _docs(spark, sf)
    heads = d.groupBy("source").agg(F.min("doc_id").alias("parent_id"))
    cp = d.join(heads, "source").select("doc_id", "parent_id")
    t = has_parent_topk(spark, _store_for(spark, sf), Q_TERMS, cp, k=10)
    return t.select(
        "doc_id", "parent_id", F.round("score", 6).alias("score")
    )


def _q_boosting_topk(spark, sf):
    """Round-5: ES boosting query — positive 'spark OR merge' ranks,
    negative 'window' demotes by 0.5 without excluding."""
    from inverted_index_spark.operators.boolean import boosting_topk

    t = boosting_topk(
        spark, _store_for(spark, sf), "spark OR merge", "window",
        negative_boost=0.5, k=10,
    )
    return t.select("doc_id", F.round("score", 4).alias("score"))


# pinned graded judgments for the rank-eval entry (doc ids exist at
# every sf; 999999 never retrieved -> recall/ndcg denominators bite)
RANK_JUDGE = {
    "q1": {1: 3.0, 5: 2.0, 7: 1.0},
    "q2": {2: 1.0, 11: 2.0, 4: 0.0},
    "q3": {0: 1.0, 3: 1.0, 999999: 2.0},
}


def _q_rank_eval(spark, sf):
    """Round-5: ES Ranking Evaluation API — precision@k / recall@k /
    MRR / nDCG@k of the engine's own batched rankings against graded
    judgments; one topk_batch job + one broadcast join."""
    from inverted_index_spark.operators.rank_eval import rank_eval

    m = rank_eval(_searcher_for(spark, sf), BATCH_QS, RANK_JUDGE, k=5)
    return m.select(
        "qid",
        F.round("precision_k", 6).alias("precision_k"),
        F.round("recall_k", 6).alias("recall_k"),
        F.round("mrr", 6).alias("mrr"),
        F.round("ndcg_k", 6).alias("ndcg_k"),
        "n_rel",
    ).orderBy("qid")


def _q_winnow_fps(spark, sf):
    """Winnowing fingerprints (rolling-hash k-grams, min-per-window) —
    the task rubric's document-fingerprinting operator."""
    return _dedup.winnow_fingerprints(_docs(spark, sf), k=5, window=4)


def _q_winnow_pairs(spark, sf):
    return _dedup.winnow_match_pairs(
        _docs(spark, sf), k=5, window=4, min_shared=2
    ).orderBy("a", "b")


def _q_index_stats(spark, sf):
    """Corpus-level accounting cross-check: the manifest's exact counters
    (n_docs, n_postings = Σdf, sum_dl) must equal what DuckDB derives
    from the raw corpus — an end-to-end audit of the whole write path."""
    m = _store_for(spark, sf).summary()
    live = m[m["status"] == "live"]
    return spark.createDataFrame(
        [(
            int(len(live)),
            int(live["n_docs"].sum()),
            int(live["n_postings"].sum()),
            int(live["sum_dl"].sum()),
        )],
        "n_segments long, n_docs long, n_postings long, sum_dl long",
    )


PHRASE = ["table", "hash"]
STRATA_FRACTIONS = {"en": 0.5, "de": 1.0, "zh": 0.2}
STRATA_DEFAULT = 0.05
PACK_BLOCK = 512
TS_TYPES = ["click", "view"]
TS_RANGE = (1_704_412_800_000_000, 1_705_276_800_000_000)  # 2024-01-05..15 UTC µs


def _q_phrase_match(spark, sf):
    """Positional-index phrase query (operators.positions) — exact
    adjacent-token match with per-doc occurrence counts."""
    from inverted_index_spark.operators.positions import phrase_match

    return phrase_match(spark, _store_for(spark, sf), PHRASE)


def _q_terms_prefix(spark, sf):
    return _query.read_terms_prefix(spark, _store_for(spark, sf), "s")


def _q_values_prefix(spark, sf):
    return _query.read_values_prefix(spark, _store_for(spark, sf), "sp", 50, 300)


_NEAR_PAIRS: dict[str, DataFrame] = {}
_NEAR_CC: dict[str, DataFrame] = {}


def _near_pairs(spark, sf):
    # memoized per (process, sf): dedup_clusters and
    # dedup_cluster_survivors share one minhash pass (driver-budget
    # economy for the correctness gate; persisted, tiny at test SFs)
    if sf not in _NEAR_PAIRS:
        p = _dedup.minhash_lsh_pairs(_docs(spark, sf), threshold=0.3).persist()
        p.count()
        _NEAR_PAIRS[sf] = p
    return _NEAR_PAIRS[sf]


def _near_cc(spark, sf):
    """Memoized connected components over _near_pairs — shared by the
    clusters and survivors entries (one star iteration, not two)."""
    from inverted_index_spark.operators.clustering import connected_components

    if sf not in _NEAR_CC:
        cc = connected_components(_near_pairs(spark, sf)).persist()
        cc.count()
        _NEAR_CC[sf] = cc
    return _NEAR_CC[sf]


def _q_phrase_bm25_topk(spark, sf):
    """Two-stage phrase query: positional intersection filters, BM25
    over the phrase terms ranks (Lucene PhraseQuery analog)."""
    from inverted_index_spark.operators.positions import phrase_bm25_topk

    t = phrase_bm25_topk(spark, _store_for(spark, sf), PHRASE, k=10)
    return t.select("doc_id", F.round("score", 4).alias("score"))


def _q_phrase_slop_bm25_topk(spark, sf):
    """Round-4: the two-stage query with a SLOPPY positional filter
    (each word may lag <= 2 slots) — sloppy PhraseQuery + similarity."""
    from inverted_index_spark.operators.positions import phrase_bm25_topk

    t = phrase_bm25_topk(spark, _store_for(spark, sf), PHRASE, k=10, slop=2)
    return t.select("doc_id", F.round("score", 4).alias("score"))


def _q_terms_regex(spark, sf):
    return _query.read_terms_regex(spark, _store_for(spark, sf), "[a-z]*ow")


def _q_phrase_snippets(spark, sf):
    """Search-result highlighting: token-window snippet around the
    first phrase occurrence (positions + doc store combined)."""
    from inverted_index_spark.operators.positions import phrase_snippets

    return phrase_snippets(spark, _store_for(spark, sf), PHRASE, context=3)


def _q_phrase_slop(spark, sf):
    """Round-4 sloppy phrase (ordered, each word may lag <= slop
    tokens behind its exact slot) — the Lucene PhraseQuery slop
    surface over the positional artifact."""
    from inverted_index_spark.operators.positions import phrase_match

    return phrase_match(spark, _store_for(spark, sf), PHRASE, slop=2)


def _q_bm25_topk_text(spark, sf):
    """Top-k hydrated with the stored turn text (doc-store artifact;
    per-turn text byte-for-byte — the input_hint equality invariant
    at the query surface)."""
    t = _bm25.bm25_topk(spark, _store_for(spark, sf), Q_TERMS, k=10)
    out = _searcher_for(spark, sf).fetch_text(
        t.select("doc_id", F.round("score", 4).alias("score"))
    )
    return out.select("doc_id", "score", "text")


def _q_except_values(spark, sf):
    """Boolean NOT completing the OR/AND/NOT algebra."""
    return _query.except_values(spark, _store_for(spark, sf), OR_TERMS, ["window"])


def _q_boolean_query(spark, sf):
    """Composed boolean algebra: Or(And(spark, NOT window),
    Phrase('table hash')) — one Catalyst plan over the shared scan."""
    from inverted_index_spark.operators.boolean import (
        And, Not, Or, Phrase, Term, evaluate,
    )

    q = Or(And(Term("spark"), Not(Term("window"))), Phrase(PHRASE))
    return evaluate(spark, _store_for(spark, sf), q)


def _q_boolean_query_parsed(spark, sf):
    """The SAME composed algebra, but the tree comes from the round-4
    Lucene-classic string grammar (parse_query: OR keyword, parens,
    MUST_NOT, quoted phrase) — proves the CLI search surface can
    express the reference's own term-set OR read plus grouping."""
    from inverted_index_spark.operators.boolean import evaluate, parse_query

    q = parse_query(f'(spark -window) OR "{PHRASE[0]} {PHRASE[1]}"')
    return evaluate(spark, _store_for(spark, sf), q)


MLT_DOC, MLT_NTERMS = 7, 8


def _q_more_like_this(spark, sf):
    """Round-4: Lucene MoreLikeThis — rank docs similar to one source
    doc by BM25 over its most characteristic terms (deterministic
    integer-keyed selection: tf DESC, df ASC, term ASC)."""
    t = _bm25.more_like_this(
        spark, _store_for(spark, sf), MLT_DOC, n_terms=MLT_NTERMS, k=10
    )
    return t.select("doc_id", F.round("score", 4).alias("score"))


def _q_term_snippets(spark, sf):
    """Round-4: highlighting for plain term queries — token window
    around the FIRST occurrence of any query term."""
    from inverted_index_spark.operators.positions import term_snippets

    return term_snippets(spark, _store_for(spark, sf), OR_TERMS, context=3)


def _q_top_terms(spark, sf):
    """Round-4: dictionary diagnostics — k highest-df terms."""
    return _query.top_terms(spark, _store_for(spark, sf), k=20)


def _q_read_values_regex(spark, sf):
    """Round-4: R10 driven by a regex term predicate (two-phase
    dictionary-then-postings rewrite, RegexpQuery analog)."""
    return _query.read_values_regex(spark, _store_for(spark, sf), "[a-z]*ow")


def _q_read_terms_suffix(spark, sf):
    """Round-4: leading-wildcard (*ow) dictionary read."""
    return _query.read_terms_suffix(spark, _store_for(spark, sf), "ow")


_FIELD_STORES: dict = {}


def _field_stores_for(spark, sf):
    """Per-field metadata indexes (here: documents.lang) built once per
    (process, sf_dir) — the fielded-search stores."""
    if sf not in _FIELD_STORES:
        from inverted_index_spark.operators.build import build_field_indexes

        _FIELD_STORES[sf] = build_field_indexes(
            spark, _docs(spark, sf), tempfile.mkdtemp(prefix="ii_fields_"),
            ["lang"], bucket_size=1 << 14,
        )
    return _FIELD_STORES[sf]


def _q_stream_dedup(spark, sf):
    """Round-4: Structured-Streaming cross-batch exact dedup run to
    completion (availableNow) over the documents table as a file
    stream — the DISTINCT FINGERPRINT SET the stateful operator
    retains is deterministic (first-wins row choice is not, so the
    entry returns the set), giving streaming a bit-exact DuckDB twin."""
    import os
    import shutil
    import uuid

    from inverted_index_spark.streaming.dedup import dedup_stream

    src = f"{sf}/documents.parquet"
    if not os.path.isdir(src):  # file source wants a DIRECTORY
        staged = tempfile.mkdtemp(prefix="ii_stream_src_")
        shutil.copy(src, os.path.join(staged, "documents.parquet"))
        src = staged
    schema = spark.read.parquet(src).schema
    name = f"sdedup_{uuid.uuid4().hex[:8]}"
    q = (
        dedup_stream(spark.readStream.schema(schema).parquet(src))
        .select("fingerprint")
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ii_ck_"))
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(180):
        q.stop()
        raise RuntimeError("stream dedup did not finish in 180s")
    return spark.table(name).select("fingerprint").distinct().orderBy("fingerprint")


def _q_stream_percolate(spark, sf):
    """Round-5: streaming percolation (alerting) run to completion —
    every micro-batch percolates against the stored registry via
    foreachBatch; the union of batch matches over the whole table
    equals batch percolation, so the twin is percolate_queries' SQL."""
    import os
    import shutil
    import uuid

    from inverted_index_spark.operators.boolean import Or, Term
    from inverted_index_spark.streaming.percolate import percolate_stream

    src = f"{sf}/documents.parquet"
    if not os.path.isdir(src):
        staged = tempfile.mkdtemp(prefix="ii_stream_src_")
        shutil.copy(src, os.path.join(staged, "documents.parquet"))
        src = staged
    schema = spark.read.parquet(src).schema
    queries = dict(PERC_QUERIES)
    queries["qe"] = Or(
        Term("spark"), Term("merge"), Term("scan"), minimum_should_match=2
    )
    rows: list[tuple] = []

    def on_matches(m, _bid):
        rows.extend((r["doc_id"], r["query_id"]) for r in m.collect())

    q = (
        percolate_stream(
            spark.readStream.schema(schema).parquet(src), queries, on_matches
        )
        .queryName(f"sperc_{uuid.uuid4().hex[:8]}")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ii_ck_"))
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(180):
        q.stop()
        raise RuntimeError("stream percolate did not finish in 180s")
    return spark.createDataFrame(
        rows, "doc_id long, query_id string"
    ).orderBy("doc_id", "query_id")


def _q_fielded_query(spark, sf):
    """Round-4: Lucene fielded search — `lang:en` reads the lang
    FIELD INDEX (a tiny separate store), composed freely with text
    clauses in one boolean plan."""
    from inverted_index_spark.operators.boolean import evaluate, parse_query

    q = parse_query("(spark OR merge) -window lang:en")
    return evaluate(
        spark, _store_for(spark, sf), q,
        field_stores=_field_stores_for(spark, sf),
    )


def _q_hybrid_topk(spark, sf):
    """Round-4: hybrid lexical+dense retrieval — reciprocal-rank
    fusion of the BM25 top-100 and cosine top-100 pools (score-free,
    rank-deterministic)."""
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    qv = [float(x) for x in emb.where(F.col("vec_id") == 0).first()["embedding"]]
    t = _sim.hybrid_topk(spark, _store_for(spark, sf), Q_TERMS, qv, emb, k=10)
    return t.select("doc_id", F.round("rrf", 6).alias("rrf"))


def _q_hybrid_linear_topk(spark, sf):
    """Round-5: ES linear retriever — minmax-normalized weighted-sum
    fusion (0.7 lexical + 0.3 dense) of the same two top-100 pools
    hybrid_topk fuses by rank."""
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    qv = [float(x) for x in emb.where(F.col("vec_id") == 0).first()["embedding"]]
    t = _sim.hybrid_linear_topk(
        spark, _store_for(spark, sf), Q_TERMS, qv, emb, k=10,
        w_lex=0.7, w_dense=0.3,
    )
    return t.select("doc_id", F.round("score", 6).alias("score"))


def _q_boolean_ranked_topk(spark, sf):
    """Round-4: BM25-ranked boolean search (the tree filters, BM25 over
    its positive scoring terms ranks; matches without a scoring term
    keep score 0) — the Lucene BooleanQuery+similarity surface."""
    from inverted_index_spark.operators.boolean import ranked_topk

    t = ranked_topk(
        spark, _store_for(spark, sf), f'(spark -window) OR "{PHRASE[0]} {PHRASE[1]}"',
        k=10,
    )
    return t.select("doc_id", F.round("score", 4).alias("score"))


def _q_facet_counts(spark, sf):
    """Round-4: search-result faceting — matching-doc counts per
    metadata value (lang) for a parsed boolean query."""
    from inverted_index_spark.operators.boolean import facet_counts

    return facet_counts(
        spark, _store_for(spark, sf), "spark OR merge -window",
        _docs(spark, sf), "lang",
    )


def _q_fuzzy_terms(spark, sf):
    """FuzzyQuery analog: dictionary terms within edit distance 1
    (SymSpell deletion-neighborhood candidates, exact-verified)."""
    return _query.fuzzy_terms(spark, _store_for(spark, sf), "tble")


def _q_fuzzy_values(spark, sf):
    return _query.fuzzy_values(spark, _store_for(spark, sf), "tble")


def _q_fuzzy_terms_d2(spark, sf):
    """Round-4: edit distance 2 (Lucene FuzzyQuery's full d<=2
    surface) — depth-2 SymSpell deletion neighborhoods in codegen,
    levenshtein-verified exact."""
    return _query.fuzzy_terms(spark, _store_for(spark, sf), "tble", max_edits=2)


def _q_terms_within_window(spark, sf):
    """Proximity (SpanNear) search over the positional artifact."""
    from inverted_index_spark.operators.positions import terms_within_window

    return terms_within_window(spark, _store_for(spark, sf), PHRASE, 20)


def _q_dedup_clusters(spark, sf):
    """Near-dup clusters: MinHash-LSH pairs → alternating-star
    connected components (operators.clustering) — every clustered doc
    labeled with its component's min doc_id."""
    cc = _near_cc(spark, sf)
    return cc.select(
        F.col("node").alias("doc_id"), F.col("component").alias("cluster_id")
    ).orderBy("doc_id")


def _q_dedup_cluster_survivors(spark, sf):
    """Corpus minus non-minimum members of every near-dup cluster
    (dedup_survivors semantics over the memoized component labels —
    same losers anti-join, one shared star iteration per sf)."""
    docs = _docs(spark, sf)
    losers = (
        _near_cc(spark, sf)
        .where(F.col("node") != F.col("component"))
        .select(F.col("node").alias("_loser"))
    )
    kept = docs.join(
        losers, on=docs["doc_id"].cast("long") == losers["_loser"], how="left_anti"
    )
    return kept.select("doc_id").orderBy("doc_id")


def _q_sample_stratified(spark, sf):
    """Deterministic md5-keyed stratified sampling (corpus mixing)."""
    from inverted_index_spark.operators.corpus import stratified_sample

    s = stratified_sample(
        _docs(spark, sf), STRATA_FRACTIONS, "lang",
        default_fraction=STRATA_DEFAULT,
    )
    return s.select("doc_id", "lang").orderBy("doc_id")


def _q_corpus_pipeline(spark, sf):
    """The composed training-data pipeline (length filter → lang
    filter → exact dedup → minhash-CC near-dedup → stratified sample)
    as ONE declarative plan — the composition itself is oracle-gated."""
    from inverted_index_spark.operators.corpus import prepare_corpus

    out = prepare_corpus(
        _docs(spark, sf),
        langs=("en", "de"),
        min_tokens=5,
        minhash_threshold=0.6,
        fractions={"src0": 1.0, "src1": 0.5, "src2": 0.0},
        strata_col="source",
        default_fraction=0.8,
    )
    return out.select("doc_id", "source").orderBy("doc_id")


def _q_pack_sequences(spark, sf):
    """Concat-then-chunk sequence packing over the pinned tokenizer's
    token counts (distributed prefix sum, no single-partition window)."""
    from inverted_index_spark.operators.corpus import pack_sequences

    return pack_sequences(_docs(spark, sf), block_size=PACK_BLOCK).orderBy("doc_id")


_TS_STORES: dict[str, SegmentStore] = {}


_TRI_STORES: dict[str, SegmentStore] = {}


def _q_substring_grep(spark, sf):
    """Trigram substring index (Google Code Search design,
    operators/substring.py): candidates from one AND over the needle's
    trigram posting lists, contains() verification reads only
    candidate rows."""
    from inverted_index_spark.operators.substring import (
        build_trigram_index, substring_search,
    )

    docs = _docs(spark, sf)
    if sf not in _TRI_STORES:
        store = SegmentStore(tempfile.mkdtemp(prefix="ii_tri_") + "/idx")
        build_trigram_index(spark, docs, store, bucket_size=1 << 14)
        _TRI_STORES[sf] = store
    return substring_search(spark, _TRI_STORES[sf], "spark merge", docs)


def _q_regex_grep(spark, sf):
    """Regex grep over the trigram index: Cox-style required-trigram
    DNF prunes candidates ('spark merge' AND-set OR 'window table'
    AND-set), rlike verifies (Java-regex∩RE2 subset)."""
    from inverted_index_spark.operators.substring import (
        build_trigram_index, regex_search,
    )

    docs = _docs(spark, sf)
    if sf not in _TRI_STORES:
        store = SegmentStore(tempfile.mkdtemp(prefix="ii_tri_") + "/idx")
        build_trigram_index(spark, docs, store, bucket_size=1 << 14)
        _TRI_STORES[sf] = store
    return regex_search(
        spark, _TRI_STORES[sf], "spark merge|window .able", docs
    )


def _q_ts_index_range(spark, sf):
    """Generic ordered-V indexing (reference README.md:7,28 — V as
    timestamps): event types indexed by occurrence time; R10 range
    read = time-window scan."""
    from inverted_index_spark.operators.build import build_value_index

    if sf not in _TS_STORES:
        store = SegmentStore(tempfile.mkdtemp(prefix="ii_tsidx_") + "/idx")
        # parquet ts is TIMESTAMP_NTZ; the session TZ is pinned UTC, so
        # the cast interprets wall time exactly like DuckDB's epoch_us
        ev = spark.read.parquet(f"{sf}/events.parquet").select(
            "event_type",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        )
        build_value_index(spark, ev, store, "event_type", "ts_us", bucket_size=1 << 32)
        _TS_STORES[sf] = store
    vals = _query.read_values(spark, _TS_STORES[sf], TS_TYPES, *TS_RANGE)
    return vals.select(F.col("doc_id").alias("ts_us"))


# rows-only entries (no SQL oracle — non-SQL-expressible semantics)


_LSH_INDEXES: dict[str, str] = {}


def _q_ann_lsh(spark, sf):
    """ANN over a PERSISTED LSH bucket table (built once per process —
    round-2 fix: the on-the-fly variant recomputed every projection per
    query, costing more than brute force)."""
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    if sf not in _LSH_INDEXES:
        d = tempfile.mkdtemp(prefix="ii_lsh_") + "/lsh"
        _sim.build_lsh_index(emb, d)
        _LSH_INDEXES[sf] = d
    qv = emb.where(F.col("vec_id") == 0).select("embedding").first()["embedding"]
    return _sim.ann_lsh_topk_indexed(spark, _LSH_INDEXES[sf], [float(x) for x in qv], k=10)


_IVF_INDEXES: dict[str, str] = {}


def _q_ivf_topk(spark, sf):
    """ANN over a PERSISTED IVF index (k-means coarse quantizer,
    partition-pruned nprobe scan). Approximate by design, so no SQL
    oracle; SELF-CHECKING instead: nprobe=n_lists degenerates to an
    exact scan, which is asserted row-identical against brute-force
    cosine_topk before the nprobe<n_lists result is returned."""
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    if sf not in _IVF_INDEXES:
        d = tempfile.mkdtemp(prefix="ii_ivf_") + "/ivf"
        _sim.build_ivf_index(emb, d, n_lists=8)
        _IVF_INDEXES[sf] = d
    d = _IVF_INDEXES[sf]
    qv = [
        float(x)
        for x in emb.where(F.col("vec_id") == 0).first()["embedding"]
    ]
    exact = [
        (r["vec_id"], round(r["cosine"], 9))
        for r in _sim.ivf_topk(spark, d, qv, k=10, nprobe=8).collect()
    ]
    brute = [
        (r["vec_id"], round(r["cosine"], 9))
        for r in _sim.cosine_topk(emb, qv, k=10).collect()
    ]
    if exact != brute:
        raise AssertionError(
            f"ivf_topk self-check failed: nprobe=n_lists {exact} != brute {brute}"
        )
    return _sim.ivf_topk(spark, d, qv, k=10, nprobe=2)


# deterministic delete set for the tombstone entries: sparse ids that
# exist at every sf (deleting an absent id is a harmless no-op in both
# the engine and the SQL oracle's NOT IN)
_DEL_IDS = sorted(range(0, 400, 13))
_DEL_STORES: dict[str, SegmentStore] = {}
_DEL_SEARCHERS: dict[str, object] = {}


def _del_store_for(spark, sf):
    """documents index + a committed tombstone batch, once per
    (process, sf) — the delete entries' shared fixture (the main
    _store_for store stays untouched: every other entry's oracle
    assumes the full corpus)."""
    if sf not in _DEL_STORES:
        store = SegmentStore(tempfile.mkdtemp(prefix="ii_entry_del_") + "/idx")
        build_index(spark, _docs(spark, sf), store, bucket_size=1 << 14)
        store.delete_docs(spark, _DEL_IDS)
        _DEL_STORES[sf] = store
    return _DEL_STORES[sf]


def _q_delete_read_values(spark, sf):
    """R10 read over a store with live tombstones (store path, no
    Searcher): deleted docs vanish from results immediately —
    delete_docs semantics, sources/store.py scoped_minus_deletes."""
    return _query.read_values(spark, _del_store_for(spark, sf), OR_TERMS)


def _q_delete_bm25_topk(spark, sf):
    """BM25 top-k through a Searcher whose open() physically purged
    the tombstones from the cached postings: scores are EXACTLY those
    of a fresh build over the surviving corpus (as-if-rebuilt stats),
    which is what the SQL oracle computes over documents minus the
    delete set."""
    if sf not in _DEL_SEARCHERS:
        from inverted_index_spark.operators.search import Searcher

        _DEL_SEARCHERS[sf] = Searcher(spark, _del_store_for(spark, sf)).open()
    t = _DEL_SEARCHERS[sf].topk(Q_TERMS, 10, use_wand=True)
    return t.select("doc_id", F.round("score", 4).alias("score"))


_RX_IDS = sorted(range(0, 400, 17))
_RX_TERMS = ["spark", "reindexed", "window"]
_RX_STORES: dict[str, SegmentStore] = {}
_RX_SEARCHERS: dict[str, object] = {}


def _rx_store_for(spark, sf):
    """documents index where _RX_IDS were atomically REINDEXED with
    deterministic replacement text (operators.build reindex_docs:
    staged tombstone batch + replacement segment committed in one
    generation-scoped manifest transaction) — the reindex entries'
    shared fixture."""
    if sf not in _RX_STORES:
        from inverted_index_spark.operators.build import reindex_docs

        store = SegmentStore(tempfile.mkdtemp(prefix="ii_entry_rx_") + "/idx")
        build_index(spark, _docs(spark, sf), store, bucket_size=1 << 14)
        updated = _docs(spark, sf).where(F.col("doc_id").isin(_RX_IDS)).select(
            "doc_id",
            F.concat(
                F.lit("reindexed spark doc "), F.col("doc_id").cast("string")
            ).alias("text"),
        )
        reindex_docs(spark, updated, store)
        _RX_STORES[sf] = store
    return _RX_STORES[sf]


def _q_reindex_read_values(spark, sf):
    """R10 read after an atomic upsert (reindex_docs): superseded
    copies invisible, replacement content visible — delete batches are
    generation-scoped (sources/store.py read_deletes), so only
    segments older than the batch are masked. The oracle reads the
    post-update corpus directly."""
    return _query.read_values(
        spark, _rx_store_for(spark, sf), ["reindexed", "merge"]
    )


def _q_time_travel_read_values(spark, sf):
    """Snapshot time travel (sources/store.py at(), Iceberg VERSION AS
    OF over the manifest commit log): pin the reindexed store to its
    FIRST generation — the pre-upsert corpus — and read. The oracle is
    the plain original-corpus query: the pinned view must contain no
    trace of the reindex ('reindexed' matches nothing, superseded
    copies are back)."""
    store = _rx_store_for(spark, sf)
    pinned = store.at(min(store.generations()))
    return _query.read_values(spark, pinned, ["reindexed", "merge"])


_DBQ_STORES: dict[str, SegmentStore] = {}
_DBQ_QUERY = "window merge"  # adjacency = AND in the search grammar


def _q_delete_by_query_read(spark, sf):
    """operators.boolean delete_by_query (Lucene deleteDocuments(Query)
    analog): tombstone every doc matching a boolean query, then read —
    the oracle recomputes the match set in SQL (docs containing BOTH
    terms) and excludes it from the read."""
    from inverted_index_spark.operators.boolean import delete_by_query

    if sf not in _DBQ_STORES:
        store = SegmentStore(tempfile.mkdtemp(prefix="ii_entry_dbq_") + "/idx")
        build_index(spark, _docs(spark, sf), store, bucket_size=1 << 14)
        delete_by_query(spark, store, _DBQ_QUERY)
        _DBQ_STORES[sf] = store
    return _query.read_values(spark, _DBQ_STORES[sf], ["spark", "window"])


def _q_reindex_bm25_topk(spark, sf):
    """BM25 top-k via a Searcher over the reindexed store: the
    open()-time cache purge is generation-scoped, so scores equal a
    fresh build over the post-update corpus EXACTLY (the SQL twin
    computes that fresh-corpus score)."""
    if sf not in _RX_SEARCHERS:
        from inverted_index_spark.operators.search import Searcher

        _RX_SEARCHERS[sf] = Searcher(spark, _rx_store_for(spark, sf)).open()
    t = _RX_SEARCHERS[sf].topk(_RX_TERMS, 10, use_wand=True)
    return t.select("doc_id", F.round("score", 4).alias("score"))


_BM25F_STORES: dict[str, dict] = {}


def _ensure_bm25f_stores(spark, sf):
    """Build (once per process+sf) the two per-field text indexes the
    multi-field scorers share: body = text, meta = 'source lang'."""
    if sf not in _BM25F_STORES:
        from inverted_index_spark.operators.bm25f import build_text_field_indexes

        _BM25F_STORES[sf] = build_text_field_indexes(
            spark,
            _docs(spark, sf),
            tempfile.mkdtemp(prefix="ii_bm25f_") + "/f",
            {"body": "text", "meta": F.concat_ws(" ", "source", "lang")},
        )
    return _BM25F_STORES[sf]
_BM25F_W = {"body": 1.0, "meta": 2.0}
_BM25F_B = {"body": 0.75, "meta": 0.5}
_BM25F_TERMS = ["spark", "merge", "en"]


def _q_bm25f_topk(spark, sf):
    """BM25F weighted multi-field top-k (operators/bm25f.py, pinned
    Zaragoza-style contract: field-weighted tf normalization first,
    ONE k1 saturation, any-field df): body = text (w=1), meta =
    'source lang' (w=2, b=0.5) — 'en' matches the boosted metadata
    field and any body occurrences, cross-field."""
    _ensure_bm25f_stores(spark, sf)
    from inverted_index_spark.operators.bm25f import bm25f_topk

    t = bm25f_topk(
        spark, _BM25F_STORES[sf], _BM25F_TERMS, k=10,
        weights=_BM25F_W, b=_BM25F_B,
    )
    return t.select("doc_id", F.round("score", 4).alias("score"))


def _q_index_summary(spark, sf):
    """U1 PrintSummary analog (reference single/summary.go:9-54) —
    per-segment stats from the manifest."""
    m = _store_for(spark, sf).summary()
    cols = ["segment_id", "status", "n_terms", "n_postings", "n_docs", "bytes"]
    return spark.createDataFrame(m[cols])


def _q_transcripts_bm25(spark, sf):
    """North-rule corpus path: synthetic transcripts → index → WAND.

    DuckDB can't run the Spark-side generator, so this entry is
    SELF-CHECKING instead (round-3): the collected top-10 is asserted
    rank-identical (scores to 1e-9) against the pure-pandas oracle
    (inverted_index_spark.oracle) over the same generated corpus
    before being returned — a mismatch raises rather than returning
    silently-wrong rows."""
    from inverted_index_spark.oracle import OracleIndex

    q = ["w00000", "w00010"]
    with tempfile.TemporaryDirectory(prefix="ii_tx_") as d:
        store = SegmentStore(d + "/idx")
        docs = generate_transcripts(spark, 2000, include_doc_id=True)
        build_index(spark, docs, store, bucket_size=512)
        out = bm25_topk_wand(spark, store, q, k=10)
        rows = out.collect()
        oracle = OracleIndex.from_docs(
            docs.select("doc_id", "text").toPandas()
        ).bm25_topk(q, k=10)
        got = [(r["doc_id"], r["score"]) for r in rows]
        if [g[0] for g in got] != [o[0] for o in oracle] or any(
            abs(g[1] - o[1]) > 1e-9 for g, o in zip(got, oracle)
        ):
            raise AssertionError(
                f"transcripts_bm25 rank-parity failed: engine={got} oracle={oracle}"
            )
        out = spark.createDataFrame(rows, out.schema)  # materialize pre-cleanup
    return out


def _q_media_stats(spark, sf):
    """Native multimodal decode (WAV via stdlib, PPM/BMP via numpy
    header math — no external media libs). SELF-CHECKING rows-only
    entry: synthesizes payloads with known exact stats and asserts the
    decoded values before returning (DuckDB cannot parse WAV/BMP)."""
    import io
    import wave

    import numpy as np

    from inverted_index_spark.operators.multimodal import MEDIA_SCHEMA, media_stats

    rate, n = 8000, 4000
    tone = (np.where((np.arange(n) // 20) % 2 == 0, 16384, -16384)).astype(np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1); w.setsampwidth(2); w.setframerate(rate)
        w.writeframes(tone.tobytes())
    ppm = b"P6\n2 1\n255\n" + bytes([255, 0, 0, 0, 0, 255])
    media = spark.createDataFrame(
        [
            (0, "audio", bytearray(buf.getvalue()), ("audio/wav", 0, 0, 0)),
            (1, "image", bytearray(ppm), ("image/ppm", 2, 1, 0)),
        ],
        MEDIA_SCHEMA,
    )
    out = media_stats(media)
    rows = {r["media_id"]: r.asDict() for r in out.collect()}
    assert rows[0]["fmt"] == "wav" and abs(rows[0]["duration_ms"] - 500.0) < 1e-9
    assert abs(rows[0]["rms"] - 16384 / 32768) < 1e-9
    assert rows[1]["fmt"] == "ppm" and rows[1]["mean_r"] == 127.5
    return out.select("media_id", "kind", "fmt", "width", "height").orderBy("media_id")


def _q_search_after(spark, sf):
    """Keyset pagination (Lucene/ES searchAfter): page 2 of the ranked
    stream, fetched with the (score, doc_id) cursor of page 1's last
    hit — must equal rows 11-20 of the global order."""
    from inverted_index_spark.operators.boolean import search_after

    store = _store_for(spark, sf)
    page1 = search_after(spark, store, "spark OR merge", k=10).collect()
    if not page1:  # empty match set (regenerated fixtures): page 2 is
        return spark.createDataFrame(  # empty too, like the oracle's OFFSET
            [], "doc_id long, score double"
        )
    cur = page1[-1]
    t = search_after(
        spark, store, "spark OR merge", k=10, after=(cur["score"], cur["doc_id"])
    )
    return t.select("doc_id", F.round("score", 4).alias("score"))


def _q_facet_stats(spark, sf):
    """Numeric stats facet (ES stats aggregation): per-lang doc count
    + min/max/sum/avg of n_chars over the match set."""
    from inverted_index_spark.operators.boolean import facet_stats

    t = facet_stats(
        spark, _store_for(spark, sf), "spark OR merge",
        _docs(spark, sf), "lang", "n_chars",
    )
    return t.select(
        "lang", "n_docs", "min_v", "max_v",
        F.round("sum_v", 4).alias("sum_v"), F.round("avg_v", 4).alias("avg_v"),
    )


FACET_RANGES = [("small", None, 150.0), ("mid", 150.0, 350.0), ("big", 350.0, None)]
FACET_FILTERS = {
    "short": "n_chars < 200",
    "en": "lang = 'en'",
    "long_zh": "n_chars >= 300 AND lang = 'zh'",
    "none": "n_chars < 0",
}


def _q_facet_ranges(spark, sf):
    """ES range aggregation: named [from, to) n_chars buckets over the
    match set, with min/max/avg sub-stats; empty ranges kept at 0."""
    from inverted_index_spark.operators.boolean import facet_ranges

    t = facet_ranges(
        spark, _store_for(spark, sf), "spark OR merge",
        _docs(spark, sf), "n_chars", FACET_RANGES,
    )
    return t.select(
        "range_name", "n_docs", "min_v", "max_v",
        F.round("avg_v", 4).alias("avg_v"),
    )


def _q_filters_agg(spark, sf):
    """ES filters aggregation: named metadata-predicate buckets over
    the match set, all counted in ONE pass (conditional aggregates)."""
    from inverted_index_spark.operators.boolean import filters_agg

    return filters_agg(
        spark, _store_for(spark, sf), "spark OR merge",
        _docs(spark, sf), FACET_FILTERS,
    )


def _q_facet_extended_stats(spark, sf):
    """ES extended_stats: population moments of n_chars over the
    match set (count/min/max/sum/avg/sum_sq/var_pop/stddev_pop)."""
    from inverted_index_spark.operators.boolean import facet_extended_stats

    t = facet_extended_stats(
        spark, _store_for(spark, sf), "spark OR merge",
        _docs(spark, sf), "n_chars",
    )
    return t.select(
        "n_docs", "min_v", "max_v",
        F.round("sum_v", 4).alias("sum_v"),
        F.round("avg_v", 4).alias("avg_v"),
        F.round("sum_sq", 4).alias("sum_sq"),
        F.round("variance", 4).alias("variance"),
        F.round("std_dev", 4).alias("std_dev"),
    )


def _q_facet_string_stats(spark, sf):
    """ES string_stats: length moments + base-2 Shannon entropy of the
    character distribution of the source keyword over the match set."""
    from inverted_index_spark.operators.boolean import facet_string_stats

    t = facet_string_stats(
        spark, _store_for(spark, sf), "spark OR merge",
        _docs(spark, sf), "source",
    )
    return t.select(
        "n_docs", "min_len", "max_len",
        F.round("avg_len", 4).alias("avg_len"),
        F.round("entropy", 4).alias("entropy"),
    )


def _q_terms_set(spark, sf):
    """ES terms_set query: docs matching at least 2 of 3 terms
    (operators/es_queries.py) — the whole AND..OR family as a count."""
    from inverted_index_spark.operators.es_queries import terms_set_match

    return terms_set_match(
        spark, _store_for(spark, sf), ["spark", "merge", "window"], 2
    )


def _q_term_range(spark, sf):
    """Lucene TermRangeQuery: OR-union of every dictionary term in
    ['merge', 'spark') — the FST range seek as a pushed range scan."""
    from inverted_index_spark.operators.es_queries import term_range_values

    return term_range_values(
        spark, _store_for(spark, sf), "merge", "spark", True, False
    )


def _q_pinned_topk(spark, sf):
    """ES pinned query: editorial ids [3, 7] first (score NULL), then
    the organic BM25 ranking with pins excluded, to k=10."""
    from inverted_index_spark.operators.es_queries import pinned_topk

    t = pinned_topk(spark, _store_for(spark, sf), "spark OR merge", [3, 7], k=10)
    return t.select(
        "rank", "doc_id", F.round("score", 4).alias("score"), "is_pinned"
    )


def _q_intervals_ordered(spark, sf):
    """ES intervals query (ordered, max_gaps): docs where 'spark'
    precedes 'merge' with total slack <= 30, plus the minimal slack —
    the vectorized ordered-chain kernel over the positions store."""
    from inverted_index_spark.operators.positions import intervals_match

    return intervals_match(
        spark, _store_for(spark, sf), ["spark", "merge"], 30, ordered=True
    )


def _q_weighted_avg(spark, sf):
    """ES weighted_avg aggregation: n_chars weighted by a
    deterministic per-doc weight over the match set."""
    from inverted_index_spark.operators.aggregations import facet_weighted_avg

    docs = _docs(spark, sf).withColumn(
        "w", (F.col("doc_id") % 7 + 1).cast("double")
    )
    t = facet_weighted_avg(
        spark, _store_for(spark, sf), "spark OR merge", docs, "n_chars", "w"
    )
    return t.select(
        "n_docs",
        F.round("weighted_avg", 4).alias("weighted_avg"),
        F.round("sum_weight", 4).alias("sum_weight"),
    )


def _q_facet_mad(spark, sf):
    """ES median_absolute_deviation of n_chars over the match set
    (exact interpolated median, the value ES's TDigest approximates)."""
    from inverted_index_spark.operators.aggregations import facet_mad

    t = facet_mad(
        spark, _store_for(spark, sf), "spark OR merge", _docs(spark, sf),
        "n_chars",
    )
    return t.select("n_docs", F.round("mad", 4).alias("mad"))


def _q_percentile_ranks(spark, sf):
    """ES percentile_ranks: % of matching docs with n_chars <= each
    requested value (exact empirical CDF, the TDigest limit)."""
    from inverted_index_spark.operators.aggregations import (
        facet_percentile_ranks,
    )

    t = facet_percentile_ranks(
        spark, _store_for(spark, sf), "spark OR merge", _docs(spark, sf),
        "n_chars", (200.0, 800.0, 5000.0),
    )
    return t.select(
        "value", "n_docs", F.round("pct_rank", 4).alias("pct_rank")
    )


def _q_missing_agg(spark, sf):
    """ES missing aggregation: matching docs with no value for a
    (deterministically nulled) field."""
    from inverted_index_spark.operators.aggregations import missing_agg

    docs = _docs(spark, sf).withColumn(
        "maybe_lang",
        F.when(F.col("doc_id") % 7 == 0, None).otherwise(F.col("lang")),
    )
    return missing_agg(
        spark, _store_for(spark, sf), "spark OR merge", docs, "maybe_lang"
    )


def _q_boxplot(spark, sf):
    """ES boxplot aggregation: exact min/q1/q2/q3/max of n_chars over
    the match set (linear-interpolated quartiles, the TDigest limit)."""
    from inverted_index_spark.operators.aggregations import facet_boxplot

    t = facet_boxplot(
        spark, _store_for(spark, sf), "spark OR merge", _docs(spark, sf),
        "n_chars",
    )
    return t.select(
        "n_docs", "min_v",
        F.round("q1", 4).alias("q1"),
        F.round("q2", 4).alias("q2"),
        F.round("q3", 4).alias("q3"),
        "max_v",
    )


def _q_top_metrics(spark, sf):
    """ES top_metrics: lang + n_chars taken from the 5 matching docs
    with the largest n_chars (ties on doc_id)."""
    from inverted_index_spark.operators.aggregations import top_metrics

    return top_metrics(
        spark, _store_for(spark, sf), "spark OR merge", _docs(spark, sf),
        "n_chars", ["lang"], k=5,
    )


def _q_date_histogram_gapfill(spark, sf):
    """ES date_histogram with min_doc_count=0: every 6h bucket between
    each event_type's first and last event, zero-filled in the gaps."""
    from inverted_index_spark.operators import pipeline_aggs as pa

    ev = spark.read.parquet(f"{sf}/events.parquet")
    h = pa.date_histogram(
        ev, TS_BUCKET_US, group_cols=["event_type"], value_col="value"
    )
    g = pa.histogram_gapfill(
        h, TS_BUCKET_US, group_cols=["event_type"], fill_cols=["n", "sum_v"]
    )
    return g.select(
        "event_type", "bucket_us", "n", F.round("sum_v", 4).alias("sum_v")
    )


def _q_matrix_stats(spark, sf):
    """ES matrix_stats: pairwise SAMPLE covariance (n−1, matching ES
    MatrixStatsResults) + Pearson correlation of n_chars and a derived
    numeric field, one agg pass."""
    from inverted_index_spark.operators.aggregations import matrix_stats

    docs = _docs(spark, sf).withColumn(
        "y2", (F.col("n_chars") * 2 + F.col("doc_id") % 97).cast("double")
    )
    t = matrix_stats(
        spark, _store_for(spark, sf), "spark OR merge", docs,
        ["n_chars", "y2"],
    )
    return t.select(
        "col_x", "col_y", "n_docs",
        F.round("mean_x", 4).alias("mean_x"),
        F.round("mean_y", 4).alias("mean_y"),
        F.round("covariance", 4).alias("covariance"),
        F.round("correlation", 4).alias("correlation"),
    ).orderBy("col_x", "col_y")


def _q_rank_feature(spark, sf):
    """ES rank_feature query: BM25 + boost * saturation(n_chars,
    pivot=256) as a SHOULD clause — static doc-quality signals folded
    into the ranking (operators/es_queries.py)."""
    from inverted_index_spark.operators.es_queries import (
        rank_feature_topk,
        saturation,
    )

    feats = _docs(spark, sf).select(
        "doc_id", F.col("n_chars").cast("double").alias("f")
    )
    t = rank_feature_topk(
        spark, _store_for(spark, sf), ["merge", "spark"], feats,
        saturation("f", 256.0), k=10, boost=2.0,
    )
    return t.select("doc_id", F.round("score", 4).alias("score"))


def _q_sampler(spark, sf):
    """ES sampler aggregation: the 10 best-BM25 matches as the
    sub-aggregation input set."""
    from inverted_index_spark.operators.aggregations import sampler_agg

    t = sampler_agg(spark, _store_for(spark, sf), "spark OR merge", shard_size=10)
    return t.select("doc_id", F.round("score", 4).alias("score"))


def _q_diversified_sampler(spark, sf):
    """ES diversified_sampler: best match per lang (max_docs_per_value
    =1), then the top 5 of those survivors."""
    from inverted_index_spark.operators.aggregations import sampler_agg

    t = sampler_agg(
        spark, _store_for(spark, sf), "spark OR merge", shard_size=5,
        diversify_docs=_docs(spark, sf), diversify_col="lang",
        max_docs_per_value=1,
    )
    return t.select("doc_id", F.round("score", 4).alias("score"))


def _q_synonym_topk(spark, sf):
    """Lucene SynonymQuery scoring: {spark} and {merge, window} each
    score as one pseudo-term (tf summed, idf from max member df)."""
    from inverted_index_spark.operators.bm25 import synonym_topk

    t = synonym_topk(
        spark, _store_for(spark, sf), [["spark"], ["merge", "window"]], k=10
    )
    return t.select("doc_id", F.round("score", 4).alias("score"))


def _q_collapse_topk(spark, sf):
    """ES field collapsing: best hit per lang over the match set, then
    global top-5."""
    from inverted_index_spark.operators.boolean import collapse_topk

    t = collapse_topk(
        spark, _store_for(spark, sf), "spark OR merge",
        _docs(spark, sf), "lang", k=5,
    )
    return t.select("doc_id", "lang", F.round("score", 4).alias("score"))


def _q_top_hits(spark, sf):
    """ES top_hits inside a terms bucket: the 3 busiest langs over the
    match set, each with its 2 best BM25-ranked hits."""
    from inverted_index_spark.operators.aggregations import top_hits

    t = top_hits(
        spark, _store_for(spark, sf), "spark OR merge",
        _docs(spark, sf), "lang", n_buckets=3, size=2,
    )
    return t.select(
        "lang", "n_docs", "rank", "doc_id",
        F.round("score", 4).alias("score"),
    )


def _q_facet_histogram(spark, sf):
    """ES histogram aggregation: 200-char n_chars buckets over the
    match set (empty buckets absent, ES min_doc_count=1)."""
    from inverted_index_spark.operators.boolean import facet_histogram

    return facet_histogram(
        spark, _store_for(spark, sf), "spark OR merge",
        _docs(spark, sf), "n_chars", 200.0,
    )


def _q_facet_percentiles(spark, sf):
    """Percentiles facet (ES percentiles aggregation): exact p50/p90/p99
    of n_chars per lang over the match set."""
    from inverted_index_spark.operators.boolean import facet_percentiles

    t = facet_percentiles(
        spark, _store_for(spark, sf), "spark OR merge",
        _docs(spark, sf), "lang", "n_chars",
    )
    return t.select(
        "lang", "n_docs",
        F.round("p50", 4).alias("p50"),
        F.round("p90", 4).alias("p90"),
        F.round("p99", 4).alias("p99"),
    )


def _q_spell_suggest(spark, sf):
    """Did-you-mean over the index dictionary: top-5 df-ranked terms
    within edit distance 2 of the misspelling 'tble' (Lucene
    DirectSpellChecker popularity mode)."""
    from inverted_index_spark.operators.query import spell_suggest

    return spell_suggest(spark, _store_for(spark, sf), "tble", max_edits=2, k=5)


def _q_phrase_suggest(spark, sf):
    """Round-5: ES phrase suggester — whole-query did-you-mean. Fuzzy
    dictionary candidates per token, ranked by a bigram LM counted
    from the positional index, minus an edit penalty."""
    from inverted_index_spark.operators.phrase_suggest import phrase_suggest

    t = phrase_suggest(spark, _store_for(spark, sf), "srow hask", k=3)
    return t.select("suggestion", F.round("score", 6).alias("score"))


def _q_turn_context(spark, sf):
    """Round-5: hit-context hydration — the ±1 surrounding rows of
    each hit's group in sequence order (transcripts: the turns around
    a matching turn; oracle twin: lineitem's (orderkey, linenumber))."""
    from inverted_index_spark.operators.context import fetch_context

    li = spark.read.parquet(f"{sf}/lineitem.parquet")
    corpus = li.select(
        F.col("l_orderkey").alias("conv"),
        F.col("l_linenumber").alias("turn"),
        (F.col("l_orderkey") * 8 + F.col("l_linenumber")).alias("doc_id"),
        F.col("l_quantity").cast("double").alias("qty"),
    )
    hits = corpus.where(
        (F.col("qty") == 50)
        & (F.col("turn") == 4)
        & (F.col("conv") % 10 == 1)
    )
    return fetch_context(hits, corpus, "conv", "turn", 1, 1)


def _q_asof_click_view(spark, sf):
    """Round-5: point-in-time (as-of) join — for every click, the
    latest view by the same user at or before the click. One union +
    one window pass, no join-back (operators/temporal.py)."""
    from inverted_index_spark.operators.temporal import as_of_join

    ev = spark.read.parquet(f"{sf}/events.parquet")
    clicks = ev.where("event_type = 'click'").select("event_id", "user_id", "ts")
    views = ev.where("event_type = 'view'").select(
        "user_id",
        F.col("ts").alias("vts"),
        F.col("event_id").alias("view_id"),
        F.col("value").alias("view_value"),
    )
    out = as_of_join(clicks, views, "user_id", "ts", "vts", tiebreak="view_id")
    return out.select(
        F.col("event_id").alias("click_id"),
        "user_id",
        "view_id",
        F.round("view_value", 6).alias("view_value"),
    ).orderBy("click_id")


def _q_sessionize_events(spark, sf):
    """Round-5: gap-based sessionization (30-min timeout) — lag +
    cumulative sum over one (user, ts) window."""
    from inverted_index_spark.operators.temporal import sessionize

    ev = spark.read.parquet(f"{sf}/events.parquet")
    out = sessionize(ev, "user_id", "ts", gap_seconds=1800.0)
    return out.select(
        "event_id", "user_id", "session_id", F.col("session_seq").cast("long").alias("session_seq")
    ).orderBy("event_id")


def _q_session_stats(spark, sf):
    """Round-5: session rollup via Spark's built-in session_window
    (streaming-capable: bounded state under a watermark)."""
    from inverted_index_spark.operators.temporal import session_stats

    ev = spark.read.parquet(f"{sf}/events.parquet")
    out = session_stats(ev, "user_id", "ts", 1800.0, value_col="value")
    return out.select(
        "user_id",
        F.unix_micros(F.col("session_start").cast("timestamp")).alias("start_us"),
        F.unix_micros(F.col("session_end").cast("timestamp")).alias("end_us"),
        "n_events",
        F.round("sum_value", 6).alias("sum_value"),
    ).orderBy("user_id", "start_us")


TS_BUCKET_US = 6 * 3_600_000_000  # 6-hour histogram buckets


def _q_ts_histogram(spark, sf):
    """Date-histogram facet over the timestamp value index: distinct
    indexed event timestamps per 6h bucket within the query window
    (one pruned R10 read -> one k-group aggregate)."""
    from inverted_index_spark.operators.query import value_histogram

    _q_ts_index_range(spark, sf)  # ensures the shared ts value index exists
    return value_histogram(
        spark, _TS_STORES[sf], TS_TYPES, TS_BUCKET_US, *TS_RANGE
    ).select(F.col("bucket").alias("bucket_us"), "n")


def _q_ts_pipeline_aggs(spark, sf):
    """ES pipeline aggregations over a per-event-type 6h date
    histogram: derivative + cumulative_sum of the doc count, trailing
    moving average of the value sum, a bucket_script ratio, then a
    bucket_selector over the finished buckets (windows run BEFORE the
    selector, matching ES sibling-agg order)."""
    from inverted_index_spark.operators import pipeline_aggs as pa

    ev = spark.read.parquet(f"{sf}/events.parquet")
    h = pa.date_histogram(
        ev, TS_BUCKET_US, group_cols=["event_type"], value_col="value"
    )
    h = pa.derivative(h, "n", group_cols=["event_type"])
    h = pa.cumulative_sum(h, "n", group_cols=["event_type"])
    h = pa.moving_fn(h, "sum_v", window=3, fn="avg", group_cols=["event_type"])
    h = pa.bucket_script(h, "sum_v / n", "avg_v")
    h = pa.bucket_selector(h, "n >= 5")
    return h.select(
        "event_type",
        "bucket_us",
        "n",
        F.round("sum_v", 6).alias("sum_v"),
        "n_deriv",
        "n_cumsum",
        F.round("sum_v_mov_avg", 6).alias("mov_avg"),
        F.round("avg_v", 6).alias("avg_v"),
    ).orderBy("event_type", "bucket_us")


COMPOSITE_AFTER = ("click", 3)  # resume cursor: strictly after this key tuple


def _q_composite_page(spark, sf):
    """ES composite aggregation: one size-12 page of (event_type,
    user_id%8) buckets in key order, resumed from a fixed after
    cursor — the scalable deep-pagination contract (O(page) per call,
    the bucket frame built once by a single groupBy)."""
    from inverted_index_spark.operators.pipeline_aggs import composite_page

    ev = spark.read.parquet(f"{sf}/events.parquet").select(
        "event_type", (F.col("user_id") % 8).alias("ub"), "value"
    )
    return composite_page(
        ev,
        ["event_type", "ub"],
        size=12,
        after=COMPOSITE_AFTER,
        metrics=[F.round(F.sum("value"), 6).alias("sum_v")],
    )


def _q_contamination(spark, sf):
    """Benchmark decontamination: every 13th doc is the held-out
    benchmark; flag training docs sharing any token 3-gram with it
    (broadcast join on the n-gram — the benchmark side is always the
    tiny side at scale)."""
    from inverted_index_spark.operators.contamination import ngram_contamination

    docs = _docs(spark, sf)
    bench = docs.where(F.col("doc_id") % 13 == 0)
    train = docs.where(F.col("doc_id") % 13 != 0)
    out = ngram_contamination(train, bench, n=3)
    return out.orderBy("doc_id")


def _q_pii_scrub(spark, sf):
    """PII redaction over a deterministically PII-augmented corpus
    slice (the synthetic docs carry no PII, so both engines append the
    same doc_id-derived email/IP/phone before scrubbing)."""
    from inverted_index_spark.functions.pii import scrubbed_col, EMAIL_RE, IPV4_RE, PHONE_RE

    d = _docs(spark, sf).where(F.col("doc_id") < 300)
    did = F.col("doc_id")
    suffix = (
        F.when(did % 3 == 0, F.concat(F.lit(" contact user"), did.cast("string"), F.lit("@example.com")))
        .when(did % 3 == 1, F.concat(F.lit(" host 10.0."), (did % 256).cast("string"), F.lit("."), (did % 100).cast("string")))
        .otherwise(F.concat(F.lit(" call +1-555-"), F.lpad((did % 10000).cast("string"), 4, "0")))
    )
    t = F.concat(F.col("text"), suffix)
    after_email = F.regexp_replace(t, EMAIL_RE, "<EMAIL>")
    after_ip = F.regexp_replace(after_email, IPV4_RE, "<IP>")
    return d.select(
        did.alias("doc_id"),
        F.regexp_count(t, F.lit(EMAIL_RE)).cast("long").alias("n_emails"),
        F.regexp_count(after_email, F.lit(IPV4_RE)).cast("long").alias("n_ips"),
        F.regexp_count(after_ip, F.lit(PHONE_RE)).cast("long").alias("n_phones"),
        scrubbed_col(t).alias("scrubbed"),
    ).orderBy("doc_id")


def _q_kmeans_assign(spark, sf):
    """Nearest-centroid assignment (the oracle-exact kernel both Lloyd
    iteration and IVF coarse quantization run on): centroids = the 8
    smallest-id embeddings, squared-L2, ties to the lowest cluster."""
    from inverted_index_spark.operators.kmeans import assign_clusters

    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    cents_rows = emb.where(F.col("vec_id") < 8).orderBy("vec_id").collect()
    cents = [[float(x) for x in r["embedding"]] for r in cents_rows]
    # cluster label = the centroid's vec_id (robust if ids aren't 0..7)
    id_arr = F.array(*[F.lit(int(r["vec_id"])) for r in cents_rows])
    out = assign_clusters(emb, cents)
    return out.select(
        "vec_id",
        F.element_at(id_arr, F.col("cluster") + 1).cast("int").alias("cluster"),
        F.round("dist", 4).alias("dist"),
    ).orderBy("vec_id")


def _q_embed_kmeans(spark, sf):
    """Full distributed Lloyd k-means (k=8, 3 iterations,
    deterministic init) — rows-only entry, self-checking: the
    distributed fit must reproduce a pure-numpy Lloyd on the collected
    vectors (same init, same iteration count)."""
    import numpy as np

    from inverted_index_spark.operators.kmeans import assign_clusters, kmeans_fit

    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    k, iters = 8, 3
    cents = kmeans_fit(emb, k=k, iters=iters)
    rows = emb.select("vec_id", "embedding").orderBy("vec_id").collect()
    x = np.array([r["embedding"] for r in rows], dtype=np.float64)
    ref = x[:k].copy()
    for _ in range(iters):
        d = ((x[:, None, :] - ref[None, :, :]) ** 2).sum(axis=2)
        lab = d.argmin(axis=1)
        for c in range(k):
            if (lab == c).any():
                ref[c] = x[lab == c].mean(axis=0)
    assert np.allclose(np.array(cents), ref, atol=1e-6), "distributed Lloyd != numpy Lloyd"
    # kmeans_clusters() would re-run the fit; cents is already the
    # verified fit result, so assign directly (identical output).
    out = assign_clusters(emb, cents)
    got = {r["vec_id"]: r["cluster"] for r in out.select("vec_id", "cluster").collect()}
    want = ((x[:, None, :] - ref[None, :, :]) ** 2).sum(axis=2).argmin(axis=1)
    mismatch = sum(1 for i, r in enumerate(rows) if got[r["vec_id"]] != int(want[i]))
    assert mismatch == 0, f"{mismatch} assignment mismatches vs numpy Lloyd"
    return (
        out.groupBy("cluster")
        .agg(F.count("*").alias("n_vectors"))
        .orderBy("cluster")
    )


def _q_boosted_topk(spark, sf):
    """Round-5: Lucene query-time boosts — `spark^2 merge window^0.5`
    re-weights per-term BM25 contributions without touching matching."""
    from inverted_index_spark.operators.boolean import ranked_topk

    t = ranked_topk(
        spark, _store_for(spark, sf), "spark^2 merge window^0.5", k=10
    )
    return t.select("doc_id", F.round("score", 4).alias("score"))


def _q_msm_values(spark, sf):
    """Round-5: minimum_should_match — docs matching >= 2 of the three
    query terms (Lucene msm on a should-group)."""
    from inverted_index_spark.operators.boolean import Or, Term, evaluate

    q = Or(*[Term(t) for t in Q_TERMS], minimum_should_match=2)
    return evaluate(spark, _store_for(spark, sf), q)


def _q_significant_terms(spark, sf):
    """Round-5: ES significant_terms (JLH) over the `spark merge`
    match set, foreground+background counted from ONE postings decode."""
    from inverted_index_spark.operators.aggregations import significant_terms

    t = significant_terms(
        spark, _store_for(spark, sf), "spark merge", k=10, min_doc_count=3
    )
    return t.select(
        "term", "fg_df", "bg_df", F.round("score", 6).alias("score")
    )


def _q_term_vectors(spark, sf):
    """Round-5: Lucene TermVectors — per-doc (term, tf) re-read from
    the index itself."""
    from inverted_index_spark.operators.aggregations import term_vectors

    return term_vectors(spark, _store_for(spark, sf), [3, 7, 11])


def _q_bm25_explain(spark, sf):
    """Round-5: Lucene Explanation — per-(doc, term) BM25 component
    breakdown whose contributions sum back to bm25_scores exactly."""
    from inverted_index_spark.operators.aggregations import bm25_explain

    t = bm25_explain(spark, _store_for(spark, sf), Q_TERMS, doc_ids=list(range(50)))
    return t.select(
        "doc_id", "term", "tf", "dl", "df",
        F.round("idf", 6).alias("idf"),
        "boost",
        F.round("tf_norm", 6).alias("tf_norm"),
        F.round("contribution", 6).alias("contribution"),
    )


def _q_facet_cardinality(spark, sf):
    """Round-5: ES cardinality aggregation — distinct langs in the
    `spark OR merge` match set (exact path; the HLL path is
    recall-tested in tests/test_aggregations.py)."""
    from inverted_index_spark.operators.aggregations import facet_cardinality

    return facet_cardinality(
        spark, _store_for(spark, sf), "spark OR merge", _docs(spark, sf), "lang"
    )


def _q_dismax_topk(spark, sf):
    """Round-5: ES multi_match best_fields / Lucene DisMax — per-field
    independent BM25, max + tie_breaker * rest, title-style boost on
    the meta field. Reuses the BM25F field stores (body=text,
    meta='source lang')."""
    from inverted_index_spark.operators.bm25f import dismax_topk

    _ensure_bm25f_stores(spark, sf)
    t = dismax_topk(
        spark, _BM25F_STORES[sf], _BM25F_TERMS, k=10,
        tie_breaker=0.3, boosts={"meta": 2.0},
    )
    return t.select("doc_id", F.round("score", 4).alias("score"))


def _q_wildcard_values(spark, sf):
    """Round-5: Lucene WildcardQuery — `?`/mid-word `*` compile to the
    two-phase dictionary-regex rewrite inside the boolean grammar."""
    from inverted_index_spark.operators.boolean import evaluate, parse_query

    return evaluate(spark, _store_for(spark, sf), parse_query("w?ndow OR sp*rk"))


PERC_QUERIES = {
    "qa": "spark window",
    "qb": "merge OR scan",
    "qc": "table -window",
    "qd": '"table hash"',
}


def _q_percolate(spark, sf):
    """Round-5: ES percolator (reverse search) — four stored queries
    (AND / OR / MUST_NOT / exact phrase) matched against every doc in
    ONE prune+verify plan; plus an msm=2 node-tree query."""
    from inverted_index_spark.operators.boolean import Or, Term
    from inverted_index_spark.operators.percolate import percolate

    queries = dict(PERC_QUERIES)
    queries["qe"] = Or(
        Term("spark"), Term("merge"), Term("scan"), minimum_should_match=2
    )
    return percolate(spark, _docs(spark, sf), queries).orderBy(
        "doc_id", "query_id"
    )


def _q_rescore_topk(spark, sf):
    """Round-5: ES rescore — bag-of-words BM25 ranks a top-100 window,
    the exact phrase re-ranks only that window (canonical terms ==
    phrase-tokens shape)."""
    t = _bm25.rescore_topk(
        spark, _store_for(spark, sf), PHRASE, PHRASE,
        k=10, n_window=100, query_weight=1.0, rescore_weight=2.0,
    )
    return t.select("doc_id", F.round("score", 4).alias("score"))


def _q_complete_terms(spark, sf):
    """Round-5: ES completion suggester — df-ranked autocomplete of a
    dictionary prefix."""
    from inverted_index_spark.operators.query import complete_terms

    return complete_terms(spark, _store_for(spark, sf), "s", k=10)


def _q_unigram_loglik(spark, sf):
    """Round-5: per-doc average unigram log-likelihood (LM quality /
    outlier signal for curation) computed from the index alone."""
    from inverted_index_spark.operators.aggregations import unigram_loglik

    t = unigram_loglik(spark, _store_for(spark, sf))
    return t.select(
        "doc_id", "dl", F.round("avg_loglik", 6).alias("avg_loglik")
    )


def _q_lm_perplexity(spark, sf):
    """Round-5: CCNet-style bigram-LM self-perplexity over documents
    (add-α smoothed; the no-external-deps stand-in for the KenLM
    filter)."""
    t = _ts.bigram_perplexity(_docs(spark, sf), alpha=0.1)
    return t.select(
        "doc_id",
        "n_bigrams",
        F.round("avg_nll", 6).alias("avg_nll"),
        F.round("ppl", 6).alias("ppl"),
    )


def _fed_store_for(spark, sf):
    """Two member stores (docs split by doc_id parity) behind a
    FederatedStore — ES cross-index search with dfs_query_then_fetch
    (global-stats) semantics."""
    from inverted_index_spark.sources.federated import FederatedStore

    key = "fed:" + sf
    if key not in _STORES:
        root = tempfile.mkdtemp(prefix="ii_fed_")
        parts = []
        for i in range(2):
            part = SegmentStore(f"{root}/part{i}")
            build_index(
                spark,
                _docs(spark, sf).where(F.col("doc_id") % 2 == i),
                part,
                bucket_size=1 << 14,
            )
            parts.append(part)
        _STORES[key] = FederatedStore(parts)
    return _STORES[key]


def _q_quantized_topk(spark, sf):
    """Round-5: int8-quantized ANN with exact rescore — deterministic
    two-phase retrieval, oracle-checkable unlike LSH/IVF."""
    from inverted_index_spark.operators.similarity import quantized_topk

    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    qv = emb.where(F.col("vec_id") == 0).first()["embedding"]
    t = quantized_topk(emb, [float(x) for x in qv], k=10, rescore_factor=4)
    return t.select("vec_id", F.round("cosine", 4).alias("cosine"))


def _q_chunk_documents(spark, sf):
    """Round-5: RAG sliding-window chunking (32-token windows, 8-token
    overlap) — pure JVM exprs, zero shuffle."""
    from inverted_index_spark.operators.corpus import chunk_documents

    return chunk_documents(_docs(spark, sf), 32, 8).orderBy(
        "doc_id", "chunk_idx"
    )


def _q_function_score_topk(spark, sf):
    """Round-5: ES function_score — BM25 × field_value_factor(log1p)
    on the documents' n_chars attribute (a popularity-style boost)."""
    from inverted_index_spark.operators.bm25 import (
        field_value_factor,
        function_score_topk,
    )

    t = function_score_topk(
        spark,
        _store_for(spark, sf),
        Q_TERMS,
        _docs(spark, sf).select("doc_id", "n_chars"),
        field_value_factor("n_chars", modifier="log1p"),
        k=10,
    )
    return t.select("doc_id", F.round("score", 4).alias("score"))


def _q_federated_bm25_topk(spark, sf):
    """Round-5: federated (multi-index) BM25 over two independently
    built sub-indexes — must be rank- AND score-identical to one merged
    index, so the oracle is the ordinary whole-corpus BM25 SQL."""
    t = _bm25.bm25_topk(spark, _fed_store_for(spark, sf), Q_TERMS, k=10)
    return t.select("doc_id", F.round("score", 4).alias("score"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # Order matters for the driver's time-budgeted correctness gate:
    # the core index reads come first (they also pay the one-time
    # store build), then the entries that were crowded out of round 4's
    # window, then the rest — so no entry goes two rounds without a row.
    return {
        "ii_read_terms": _q_read_terms,
        "ii_read_values_or": _q_read_values_or,
        "ii_read_values_all": _q_read_values_all,
        "ii_and_values": _q_and_values,
        "ii_term_df": _q_term_df,
        "ii_doc_lengths": _q_doc_lengths,
        "ii_corpus_stats": _q_corpus_stats,
        "bm25_scores": _q_bm25_scores,
        "bm25_topk": _q_bm25_topk,
        "classic_topk": _q_classic_topk,
        "lmd_topk": _q_lmd_topk,
        "bm25_topk_wand": _q_bm25_topk_wand,
        "bm25_topk_batch": _q_bm25_topk_batch,
        "read_values_batch": _q_read_values_batch,
        "rank_eval_metrics": _q_rank_eval,
        "has_child_topk": _q_has_child_topk,
        "child_inner_hits": _q_child_inner_hits,
        "has_parent_topk": _q_has_parent_topk,
        "boosting_topk": _q_boosting_topk,
        # --- round-4's crowded-out block, promoted ---
        "terms_within_window": _q_terms_within_window,
        "ii_read_terms_prefix": _q_terms_prefix,
        "ii_read_values_prefix": _q_values_prefix,
        "dedup_clusters": _q_dedup_clusters,
        "dedup_cluster_survivors": _q_dedup_cluster_survivors,
        "sample_stratified": _q_sample_stratified,
        "pack_sequences": _q_pack_sequences,
        "corpus_pipeline": _q_corpus_pipeline,
        "ts_index_range": _q_ts_index_range,
        "substring_grep": _q_substring_grep,
        "regex_grep": _q_regex_grep,
        "ann_lsh_topk": _q_ann_lsh,
        "ivf_topk": _q_ivf_topk,
        "delete_read_values": _q_delete_read_values,
        "delete_bm25_topk": _q_delete_bm25_topk,
        "reindex_read_values": _q_reindex_read_values,
        "reindex_bm25_topk": _q_reindex_bm25_topk,
        "time_travel_read_values": _q_time_travel_read_values,
        "delete_by_query_read": _q_delete_by_query_read,
        "bm25f_topk": _q_bm25f_topk,
        "media_stats": _q_media_stats,
        "index_summary": _q_index_summary,
        "transcripts_bm25": _q_transcripts_bm25,
        # --- round-5 additions (need their first rows) ---
        "spell_suggest": _q_spell_suggest,
        "phrase_suggest": _q_phrase_suggest,
        "turn_context": _q_turn_context,
        "asof_click_view": _q_asof_click_view,
        "sessionize_events": _q_sessionize_events,
        "session_stats": _q_session_stats,
        "ts_date_histogram": _q_ts_histogram,
        "ts_pipeline_aggs": _q_ts_pipeline_aggs,
        "composite_page": _q_composite_page,
        "search_after_page2": _q_search_after,
        "facet_stats": _q_facet_stats,
        "facet_ranges": _q_facet_ranges,
        "filters_agg": _q_filters_agg,
        "facet_extended_stats": _q_facet_extended_stats,
        "facet_string_stats": _q_facet_string_stats,
        "terms_set": _q_terms_set,
        "term_range": _q_term_range,
        "pinned_topk": _q_pinned_topk,
        "intervals_ordered": _q_intervals_ordered,
        "weighted_avg": _q_weighted_avg,
        "facet_mad": _q_facet_mad,
        "matrix_stats": _q_matrix_stats,
        "percentile_ranks": _q_percentile_ranks,
        "missing_agg": _q_missing_agg,
        "boxplot": _q_boxplot,
        "top_metrics": _q_top_metrics,
        "date_histogram_gapfill": _q_date_histogram_gapfill,
        "rank_feature": _q_rank_feature,
        "sampler": _q_sampler,
        "diversified_sampler": _q_diversified_sampler,
        "facet_percentiles": _q_facet_percentiles,
        "synonym_topk": _q_synonym_topk,
        "collapse_topk": _q_collapse_topk,
        "top_hits": _q_top_hits,
        "facet_histogram": _q_facet_histogram,
        "contamination_overlap": _q_contamination,
        "pii_scrub": _q_pii_scrub,
        "embed_kmeans_assign": _q_kmeans_assign,
        "embed_kmeans": _q_embed_kmeans,
        "boosted_topk": _q_boosted_topk,
        "msm_values": _q_msm_values,
        "significant_terms": _q_significant_terms,
        "term_vectors": _q_term_vectors,
        "bm25_explain": _q_bm25_explain,
        "facet_cardinality": _q_facet_cardinality,
        "dismax_topk": _q_dismax_topk,
        "wildcard_values": _q_wildcard_values,
        "percolate_queries": _q_percolate,
        "unigram_loglik": _q_unigram_loglik,
        "lm_perplexity": _q_lm_perplexity,
        "complete_terms": _q_complete_terms,
        "rescore_topk": _q_rescore_topk,
        "federated_bm25_topk": _q_federated_bm25_topk,
        "function_score_topk": _q_function_score_topk,
        "chunk_documents": _q_chunk_documents,
        "quantized_topk": _q_quantized_topk,
        # --- the rest (green r4 rows) ---
        "dedup_fingerprints": _q_dedup_fingerprints,
        "dedup_exact_keep": _q_dedup_exact_keep,
        "simhash_values": _q_simhash_values,
        "analyzed_term_df": _q_analyzed_term_df,
        "token_counts": _q_token_counts,
        "quality_scores": _q_quality,
        "lang_id": _q_lang_id,
        "gopher_quality": _q_gopher,
        "c4_clean": _q_c4_clean,
        "dedup_lines": _q_dedup_lines,
        "mix_corpus": _q_mix_corpus,
        "embed_cosine": _q_embed_cosine,
        "embed_near_pairs": _q_embed_near_pairs,
        "embed_knn": _q_embed_knn,
        "knn_filtered": _q_knn_filtered,
        "knn_query_filtered": _q_knn_query_filtered,
        "ngram_jaccard": _q_ngram_jaccard,
        "minhash_pairs": _q_minhash_pairs,
        "simhash_pairs": _q_simhash_pairs,
        "index_stats": _q_index_stats,
        "winnow_fingerprints": _q_winnow_fps,
        "winnow_pairs": _q_winnow_pairs,
        "phrase_match": _q_phrase_match,
        "phrase_prefix_match": _q_phrase_prefix,
        "span_first_match": _q_span_first,
        "span_not_match": _q_span_not,
        "span_or_match": _q_span_or,
        "span_within_match": _q_span_within,
        "rare_terms_tail": _q_rare_terms,
        "multi_terms_buckets": _q_multi_terms,
        "adjacency_matrix_counts": _q_adjacency_matrix,
        "phrase_bm25_topk": _q_phrase_bm25_topk,
        "phrase_slop_bm25_topk": _q_phrase_slop_bm25_topk,
        "phrase_snippets": _q_phrase_snippets,
        "ii_read_terms_regex": _q_terms_regex,
        "bm25_topk_text": _q_bm25_topk_text,
        "ii_except_values": _q_except_values,
        "boolean_query": _q_boolean_query,
        "boolean_query_parsed": _q_boolean_query_parsed,
        "boolean_ranked_topk": _q_boolean_ranked_topk,
        "facet_counts": _q_facet_counts,
        "phrase_slop": _q_phrase_slop,
        "ii_fuzzy_terms": _q_fuzzy_terms,
        "ii_fuzzy_terms_d2": _q_fuzzy_terms_d2,
        "ii_fuzzy_values": _q_fuzzy_values,
        "more_like_this": _q_more_like_this,
        "hybrid_topk": _q_hybrid_topk,
        "hybrid_linear_topk": _q_hybrid_linear_topk,
        "fielded_query": _q_fielded_query,
        "term_snippets": _q_term_snippets,
        "top_terms": _q_top_terms,
        "ii_read_values_regex": _q_read_values_regex,
        "ii_read_terms_suffix": _q_read_terms_suffix,
        # iterative BPE learning is job-count-heavy (~1.3s/merge) —
        # keep it near the tail with the other slow entries
        "bpe_encode": _q_bpe_encode,
        "bpe_learn": _q_bpe_learn,
        # slowest last: the streaming-to-completion entries must never
        # crowd cheap entries out of a time-budgeted correctness pass
        "stream_dedup_fingerprints": _q_stream_dedup,
        "stream_percolate": _q_stream_percolate,
    }


# ---------------------------------------------------------------- oracles ---

# the pinned index-tokenizer contract (functions/tokenizer.py): lowercase →
# [\p{L}\p{N}_]+ runs (identical in Java regex / RE2 / Python-\w) → len ≤ 64
_TOKS_SQL = (
    r"list_filter(regexp_extract_all(lower(text), '[\p{L}\p{N}_]+'),"
    " t -> length(t) <= 64)"
)
_TOK = f"SELECT doc_id, unnest({_TOKS_SQL}) AS term FROM documents"
# analyzer-chain twins (functions/analyzer.py pinned contract): stop
# filter then S-stemmer, LIKE/substr only (RE2-safe, no lookbehind)
from inverted_index_spark.functions.analyzer import (  # noqa: E402
    ENGLISH_STOPWORDS as _AN_STOP,
)

_AN_STOPLIST = "('" + "','".join(sorted(_AN_STOP)) + "')"
_AN_STEM_CASE = (
    "CASE WHEN length(t0) < 4 THEN t0 "
    "WHEN t0 LIKE '%ies' THEN (CASE WHEN t0 LIKE '%eies' OR t0 LIKE '%aies' "
    "THEN t0 ELSE substr(t0, 1, length(t0) - 3) || 'y' END) "
    "WHEN t0 LIKE '%es' THEN (CASE WHEN t0 LIKE '%aes' OR t0 LIKE '%ees' "
    "OR t0 LIKE '%oes' THEN t0 ELSE substr(t0, 1, length(t0) - 1) END) "
    "WHEN t0 LIKE '%s' THEN (CASE WHEN t0 LIKE '%us' OR t0 LIKE '%ss' "
    "THEN t0 ELSE substr(t0, 1, length(t0) - 1) END) "
    "ELSE t0 END"
)
_TF = f"SELECT doc_id, term, count(*) AS tf FROM ({_TOK}) GROUP BY doc_id, term"
_DL = f"SELECT doc_id, count(*) AS dl FROM ({_TOK}) GROUP BY doc_id"
# the BM25F/dis_max 'meta' field as a corpus relation (doc_id, text)
_META_SRC = "(SELECT doc_id, concat(source, ' ', lang) AS text FROM documents)"
_QTERMS = "('" + "','".join(Q_TERMS) + "')"
_ORTERMS = "('" + "','".join(OR_TERMS) + "')"


def _bm25_contrib_sql(terms: list[str], src: str = "documents") -> str:
    """DuckDB BM25 per-doc raw scores for one term set (the pinned
    k1/b/idf contract, FIXTURES.md §B). ``src`` swaps the corpus
    relation (e.g. documents minus a delete set) — stats, df, tf, dl
    all derive from it, matching the engine's as-if-rebuilt delete
    semantics."""
    qt = "('" + "','".join(sorted(set(terms))) + "')"
    tok = f"SELECT doc_id, unnest({_TOKS_SQL}) AS term FROM {src}"
    tf_sql = f"SELECT doc_id, term, count(*) AS tf FROM ({tok}) GROUP BY doc_id, term"
    dl_sql = f"SELECT doc_id, count(*) AS dl FROM ({tok}) GROUP BY doc_id"
    return f"""
WITH tf AS ({tf_sql}),
     dl AS ({dl_sql}),
     stats AS (
       SELECT (SELECT count(*) FROM {src})::DOUBLE AS n,
              (SELECT sum(len({_TOKS_SQL})) FROM {src})::DOUBLE
              / (SELECT count(*) FROM {src}) AS avgdl),
     dfq AS (
       SELECT term, count(*) AS df FROM tf WHERE term IN {qt} GROUP BY term),
     contrib AS (
       SELECT tf.doc_id,
              ln((s.n - dfq.df + 0.5) / (dfq.df + 0.5) + 1.0)
                * tf.tf / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)) AS c
       FROM tf
       JOIN dfq USING (term)
       JOIN dl USING (doc_id)
       CROSS JOIN stats s
       WHERE tf.term IN {qt})
SELECT doc_id, sum(c) AS raw_score FROM contrib GROUP BY doc_id
"""


_BM25_CONTRIB = _bm25_contrib_sql(Q_TERMS)


def _bm25_weighted_contrib_sql(weights: dict[str, float]) -> str:
    """_bm25_contrib_sql with Lucene query-time boosts: each term's
    contribution is (boost * idf) * tf_norm — the same literal fold and
    multiplication order as bm25_scores(boosts=...), so the doubles
    agree bit-for-bit before rounding."""
    terms = sorted(weights)
    qt = "('" + "','".join(terms) + "')"
    case = (
        "CASE term "
        + " ".join(
            f"WHEN '{t}' THEN {float(weights[t])!r}::DOUBLE" for t in terms
        )
        + " END"
    )
    return f"""
WITH tf AS ({_TF}),
     dl AS ({_DL}),
     stats AS (
       SELECT (SELECT count(*) FROM documents)::DOUBLE AS n,
              (SELECT sum(len({_TOKS_SQL})) FROM documents)::DOUBLE
              / (SELECT count(*) FROM documents) AS avgdl),
     dfq AS (
       SELECT term, count(*) AS df FROM tf WHERE term IN {qt} GROUP BY term),
     contrib AS (
       SELECT tf.doc_id,
              (({case}) * ln((s.n - dfq.df + 0.5) / (dfq.df + 0.5) + 1.0))
                * tf.tf / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)) AS c
       FROM tf
       JOIN dfq USING (term)
       JOIN dl USING (doc_id)
       CROSS JOIN stats s
       WHERE tf.term IN {qt})
SELECT doc_id, sum(c) AS raw_score FROM contrib GROUP BY doc_id
"""

def _toks_sql(col: str) -> str:
    """The pinned tokenizer over an arbitrary SQL text expression."""
    return (
        r"list_filter(regexp_extract_all(lower(" + col + r"), "
        r"'[\p{L}\p{N}_]+'), t -> length(t) <= 64)"
    )


def _bm25f_sql(terms: list[str]) -> str:
    """DuckDB twin of operators/bm25f.py over documents with fields
    body=text (w=1, b=0.75) and meta=source||' '||lang (w=2, b=0.5):
    per-field normalized tf summed FIRST, one k1 saturation, df over
    the any-field match set, avgdl_f over ALL docs (dl=0 counts)."""
    qt = "('" + "','".join(sorted(set(terms))) + "')"
    meta = "concat(source, ' ', lang)"
    bt, mt = _toks_sql("text"), _toks_sql(meta)
    return f"""
WITH body_tf AS (
       SELECT doc_id, term, count(*) AS tf
       FROM (SELECT doc_id, unnest({bt}) AS term FROM documents)
       GROUP BY doc_id, term),
     meta_tf AS (
       SELECT doc_id, term, count(*) AS tf
       FROM (SELECT doc_id, unnest({mt}) AS term FROM documents)
       GROUP BY doc_id, term),
     body_dl AS (SELECT doc_id, len({bt}) AS dl FROM documents),
     meta_dl AS (SELECT doc_id, len({mt}) AS dl FROM documents),
     stats AS (
       SELECT count(*)::DOUBLE AS n,
              (SELECT sum(len({bt})) FROM documents)::DOUBLE / count(*) AS avgdl_body,
              (SELECT sum(len({mt})) FROM documents)::DOUBLE / count(*) AS avgdl_meta
       FROM documents),
     tfn AS (
       SELECT term, doc_id, sum(c) AS tfn FROM (
         SELECT t.term, t.doc_id,
                {_BM25F_W['body']} * t.tf
                / (1 - {_BM25F_B['body']} + {_BM25F_B['body']} * d.dl / s.avgdl_body) AS c
         FROM body_tf t JOIN body_dl d USING (doc_id) CROSS JOIN stats s
         WHERE t.term IN {qt}
         UNION ALL
         SELECT t.term, t.doc_id,
                {_BM25F_W['meta']} * t.tf
                / (1 - {_BM25F_B['meta']} + {_BM25F_B['meta']} * d.dl / s.avgdl_meta) AS c
         FROM meta_tf t JOIN meta_dl d USING (doc_id) CROSS JOIN stats s
         WHERE t.term IN {qt}
       ) GROUP BY term, doc_id),
     dfq AS (SELECT term, count(*) AS df FROM tfn GROUP BY term),
     contrib AS (
       SELECT tfn.doc_id,
              ln((s.n - dfq.df + 0.5) / (dfq.df + 0.5) + 1.0)
                * tfn.tfn / (tfn.tfn + 1.2) AS c
       FROM tfn JOIN dfq USING (term) CROSS JOIN stats s)
SELECT doc_id, round(sum(c), 4) AS score FROM contrib GROUP BY doc_id
ORDER BY sum(c) DESC, doc_id ASC LIMIT 10
"""


# delete-entry twins: the corpus minus the tombstoned ids, as a
# relation the BM25/read oracles can run over unchanged
_DEL_CSV = ",".join(str(i) for i in _DEL_IDS)
_ALIVE_SRC = f"(SELECT * FROM documents WHERE doc_id NOT IN ({_DEL_CSV})) AS alive"
_TOK_ALIVE = f"SELECT doc_id, unnest({_TOKS_SQL}) AS term FROM {_ALIVE_SRC}"

# reindex-entry twins: the corpus with _RX_IDS' text REPLACED — the
# SQL image of the post-upsert corpus the scoped engine must match
_RX_CSV = ",".join(str(i) for i in _RX_IDS)
_RX_SRC = (
    f"(SELECT doc_id, CASE WHEN doc_id IN ({_RX_CSV}) "
    "THEN 'reindexed spark doc ' || doc_id ELSE text END AS text "
    "FROM documents) AS rx"
)
_TOK_RX = f"SELECT doc_id, unnest({_TOKS_SQL}) AS term FROM {_RX_SRC}"

# batched twins: one UNION ALL branch per qid — the SQL image of the
# engine's one-job topk_batch / read_values_batch
_BM25_BATCH = " UNION ALL ".join(
    f"SELECT '{qid}' AS qid, "
    "row_number() OVER (ORDER BY raw_score DESC, doc_id ASC)::INT AS rank, "
    f"doc_id, round(raw_score, 4) AS score FROM ({_bm25_contrib_sql(ts)}) "
    "QUALIFY rank <= 5"
    for qid, ts in BATCH_QS.items()
)


def _read_batch_branch(qid: str, ts: list[str], lo, hi) -> str:
    qt = "('" + "','".join(sorted(set(ts))) + "')"
    cond = f"term IN {qt}"
    if lo is not None:
        cond += f" AND doc_id >= {int(lo)}"
    if hi is not None:
        cond += f" AND doc_id <= {int(hi)}"
    return (
        f"SELECT '{qid}' AS qid, doc_id FROM "
        f"(SELECT DISTINCT doc_id FROM ({_TOK}) WHERE {cond})"
    )


_READ_BATCH = " UNION ALL ".join(
    _read_batch_branch(qid, ts, lo, hi) for qid, (ts, lo, hi) in BATCH_READS.items()
)

_SHINGLES = """
SELECT doc_id,
       list_distinct(
         CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
              ELSE list_transform(generate_series(1, len(t) - 2),
                                  i -> array_to_string(t[i:i+2], ' '))
         END) AS sh
FROM (SELECT doc_id, regexp_extract_all(lower(text), '\\w+') AS t
      FROM documents WHERE doc_id < 60)
"""

def _minhash_params_sql(num_hashes: int = 64, seed: int = 42) -> str:
    """The exact (a_i, b_i) constants the engine draws
    (operators/dedup.py minhash_signatures) as a SQL VALUES list."""
    import numpy as np

    from inverted_index_spark.operators.dedup import MERSENNE_P

    rng = np.random.default_rng(seed)
    a = rng.integers(1, MERSENNE_P, size=num_hashes, dtype=np.uint64)
    b = rng.integers(0, MERSENNE_P, size=num_hashes, dtype=np.uint64)
    return ", ".join(
        f"({i}, {int(a[i])}::HUGEINT, {int(b[i])}::HUGEINT)"
        for i in range(num_hashes)
    )


# bit-exact DuckDB twin of minhash_lsh_pairs: same shingle hash
# (md5_number_upper = little-endian first 8 md5 bytes), same exact
# (a·x+b) mod 2^61-1 (HUGEINT math), same md5 band keys, same banding.
# Parameterized over the base relation + threshold so the composed
# corpus_pipeline oracle can run it over a filtered CTE.


def _minhash_sql(base: str = "documents", threshold: float = 0.3) -> str:
    return _MINHASH_TMPL.format(base=base, threshold=threshold)


_MINHASH_TMPL = f"""
WITH params(i, pa, pb) AS (VALUES {_minhash_params_sql()}),
toks AS (SELECT doc_id, regexp_extract_all(lower(text), '\\w+') AS t FROM {{base}}),
shg AS (SELECT doc_id, unnest(CASE WHEN len(t) = 0 THEN []::VARCHAR[]
        WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
        ELSE list_transform(generate_series(1, len(t) - 2), i -> array_to_string(t[i:i+2], ' ')) END) AS s
       FROM toks),
hx AS (SELECT DISTINCT doc_id, md5_number_upper(s)::HUGEINT AS x FROM shg),
comp AS (SELECT doc_id, p.i,
           min(((p.pa * x) % 2305843009213693951 + p.pb) % 2305843009213693951)::BIGINT AS v
         FROM hx CROSS JOIN params p GROUP BY doc_id, p.i),
sig AS (SELECT doc_id, list(v ORDER BY i) AS sig FROM comp GROUP BY doc_id),
banded AS (SELECT doc_id, sig, band,
             md5(array_to_string(list_transform(sig[band*4+1 : band*4+4], x -> x::VARCHAR), ',')) AS bh
           FROM sig CROSS JOIN (SELECT unnest(range(16)) AS band)),
cand AS (SELECT DISTINCT l.doc_id AS a, r.doc_id AS b, l.sig AS sig_a, r.sig AS sig_b
         FROM banded l JOIN banded r ON l.band = r.band AND l.bh = r.bh AND l.doc_id < r.doc_id),
est AS (SELECT a, b, list_sum(list_transform(generate_series(1, 64),
          k -> CASE WHEN sig_a[k] = sig_b[k] THEN 1 ELSE 0 END))::DOUBLE / 64 AS ej
        FROM cand)
SELECT a, b, round(ej, 6) AS est_jaccard FROM est WHERE ej >= {{threshold}}
"""

_MINHASH = _minhash_sql("documents", 0.3)

# shared simhash core: tf-weighted bit votes over md5_number_upper
# token hashes → per-doc signed 64-bit simhash (CTE `sh`)
_SIMHASH_CORE = """toks AS (SELECT doc_id, regexp_extract_all(lower(text), '\\w+') AS t FROM documents),
tc AS (SELECT doc_id, w, count(*)::HUGEINT AS c FROM (SELECT doc_id, unnest(t) AS w FROM toks) GROUP BY doc_id, w),
th AS (SELECT doc_id, md5_number_upper(w)::HUGEINT AS h, c FROM tc),
bits AS (SELECT doc_id, j, sum(CASE WHEN (h >> j) & 1 = 1 THEN c ELSE -c END) AS vote
         FROM th CROSS JOIN (SELECT unnest(range(64)) AS j) GROUP BY doc_id, j),
shu AS (SELECT doc_id, sum(CASE WHEN vote > 0 THEN (1::HUGEINT << j) ELSE 0::HUGEINT END) AS hu FROM bits GROUP BY doc_id),
sh AS (SELECT doc_id, (CASE WHEN hu >= 9223372036854775808 THEN hu - 18446744073709551616 ELSE hu END)::BIGINT AS simhash,
              hu FROM shu)"""

# bit-exact DuckDB twin of simhash_near_pairs(max_hamming=7): tf-weighted
# bit votes over md5_number_upper token hashes, 8×8-bit pigeonhole bands
_SIMHASH = """
WITH toks AS (SELECT doc_id, regexp_extract_all(lower(text), '\\w+') AS t FROM documents),
tc AS (SELECT doc_id, w, count(*)::HUGEINT AS c FROM (SELECT doc_id, unnest(t) AS w FROM toks) GROUP BY doc_id, w),
th AS (SELECT doc_id, md5_number_upper(w)::HUGEINT AS h, c FROM tc),
bits AS (SELECT doc_id, j, sum(CASE WHEN (h >> j) & 1 = 1 THEN c ELSE -c END) AS vote
         FROM th CROSS JOIN (SELECT unnest(range(64)) AS j) GROUP BY doc_id, j),
shu AS (SELECT doc_id, sum(CASE WHEN vote > 0 THEN (1::HUGEINT << j) ELSE 0::HUGEINT END) AS hu FROM bits GROUP BY doc_id),
sh AS (SELECT doc_id, (CASE WHEN hu >= 9223372036854775808 THEN hu - 18446744073709551616 ELSE hu END)::BIGINT AS simhash,
              hu FROM shu),
banded AS (SELECT doc_id, simhash, band, ((hu >> (band * 8)) & 255)::BIGINT AS chunk
           FROM sh CROSS JOIN (SELECT unnest(range(8)) AS band)),
cand AS (SELECT DISTINCT l.doc_id AS a, r.doc_id AS b, l.simhash AS ha, r.simhash AS hb
         FROM banded l JOIN banded r ON l.band = r.band AND l.chunk = r.chunk AND l.doc_id < r.doc_id)
SELECT a, b, bit_count(xor(ha, hb))::INT AS hamming FROM cand WHERE bit_count(xor(ha, hb)) <= 7
"""

# bit-exact DuckDB twin of winnow_fingerprints(k=5, window=4): same
# signed little-endian first-8-md5-bytes hash, same min-per-window rule
_WINNOW_FPS = """
WITH toks AS (SELECT doc_id, regexp_extract_all(lower(text), '\\w+') AS t FROM documents),
g AS (SELECT doc_id, CASE WHEN len(t) < 5 THEN [array_to_string(t, ' ')]
        ELSE list_transform(generate_series(1, len(t) - 4), i -> array_to_string(t[i:i+4], ' ')) END AS gs
      FROM toks WHERE len(t) > 0),
h AS (SELECT doc_id, list_transform(gs, x ->
        (CASE WHEN md5_number_upper(x)::HUGEINT >= 9223372036854775808
              THEN md5_number_upper(x)::HUGEINT - 18446744073709551616
              ELSE md5_number_upper(x)::HUGEINT END)::BIGINT) AS hs FROM g),
m AS (SELECT doc_id, CASE WHEN len(hs) <= 4 THEN [list_min(hs)]
        ELSE list_transform(generate_series(1, len(hs) - 3), i -> list_min(hs[i:i+3])) END AS mins
      FROM h)
SELECT DISTINCT doc_id, unnest(mins) AS fp FROM m
"""

# phrase twin: count token offsets i where toks[i:i+k-1] equals the
# phrase, over the SAME capped token array the positional index uses
_PHRASE_SQL = f"""
SELECT doc_id, n_matches FROM (
  SELECT doc_id,
         len(list_filter(generate_series(1, greatest(len(t) - 1, 0)),
             i -> t[i] = '{PHRASE[0]}' AND t[i+1] = '{PHRASE[1]}'))::BIGINT AS n_matches
  FROM (SELECT doc_id, {_TOKS_SQL} AS t FROM documents))
WHERE n_matches > 0 ORDER BY doc_id
"""

_PERCOLATE_SQL = (
    f"WITH tok AS (SELECT DISTINCT doc_id, term FROM ({_TOK})) "
    "SELECT doc_id, query_id FROM ("
    "SELECT doc_id, 'qa' AS query_id FROM tok "
    "WHERE term IN ('spark','window') "
    "GROUP BY doc_id HAVING count(DISTINCT term) = 2 "
    "UNION ALL "
    "SELECT DISTINCT doc_id, 'qb' FROM tok "
    "WHERE term IN ('merge','scan') "
    "UNION ALL "
    "SELECT doc_id, 'qc' FROM tok WHERE term = 'table' "
    "AND doc_id NOT IN (SELECT doc_id FROM tok WHERE term = 'window') "
    "UNION ALL "
    f"SELECT doc_id, 'qd' FROM ({_PHRASE_SQL}) "
    "UNION ALL "
    "SELECT doc_id, 'qe' FROM tok "
    "WHERE term IN ('spark','merge','scan') "
    "GROUP BY doc_id HAVING count(DISTINCT term) >= 2"
    ") ORDER BY doc_id, query_id"
)

# clusters twin: recursive min-label propagation over the SAME minhash
# pair set (the engine runs alternating large/small-star — same fixpoint)


def _cluster_ctes(mh_sql: str) -> str:
    return f"""mh AS ({mh_sql}),
edges AS (SELECT a AS u, b AS v FROM mh UNION SELECT b AS u, a AS v FROM mh),
reach(n, l) AS (
  SELECT u, u FROM (SELECT DISTINCT u FROM edges)
  UNION
  SELECT e.u, r.l FROM edges e JOIN reach r ON e.v = r.n),
cl AS (SELECT n, min(l) AS l FROM reach GROUP BY n)"""


_CLUSTER_CTES = _cluster_ctes(_MINHASH)

# lang-id CTEs parameterized over the base relation (mirrors
# functions/textstats.lang_id exactly — the already-green lang_id twin)


def _langsel_ctes(base: str, langs: tuple[str, ...]) -> str:
    lang_list = "'" + "','".join(langs) + "'"
    return (
        f"lt AS (SELECT doc_id, regexp_extract_all(lower(text), '\\w+') AS toks FROM {base}), "
        "ls AS (SELECT doc_id, "
        "len(list_intersect(toks, ['der','die','das','und','ist','nicht'])) AS s_de, "
        "len(list_intersect(toks, ['the','a','and','of','is','to'])) AS s_en, "
        "len(list_intersect(toks, ['el','la','los','las','es','y'])) AS s_es, "
        "len(list_intersect(toks, ['le','la','les','est','et','une'])) AS s_fr FROM lt), "
        "lpred AS (SELECT doc_id, CASE WHEN greatest(s_de, s_en, s_es, s_fr) = 0 THEN 'und' "
        "WHEN s_de = greatest(s_de, s_en, s_es, s_fr) THEN 'de' "
        "WHEN s_en = greatest(s_de, s_en, s_es, s_fr) THEN 'en' "
        "WHEN s_es = greatest(s_de, s_en, s_es, s_fr) THEN 'es' "
        "ELSE 'fr' END AS pred_lang FROM ls), "
        f"langsel AS (SELECT doc_id FROM lpred WHERE pred_lang IN ({lang_list}))"
    )


# the composed training-corpus pipeline twin: every stage is the
# already-verified per-operator SQL, chained over CTEs in the same
# order the engine's prepare_corpus declares
PIPE_FRACTIONS = {"src0": 1.0, "src1": 0.5, "src2": 0.0}
PIPE_DEFAULT_FRACTION = 0.8
_PIPE_CASE = (
    "CASE source "
    + " ".join(
        f"WHEN '{k}' THEN {int(v * (1 << 31))}"
        for k, v in sorted(PIPE_FRACTIONS.items())
    )
    + f" ELSE {int(PIPE_DEFAULT_FRACTION * (1 << 31))} END"
)
_PIPELINE_SQL = (
    "WITH RECURSIVE "
    f"sized AS (SELECT * FROM documents WHERE len({_TOKS_SQL}) BETWEEN 5 AND 1048576), "
    + _langsel_ctes("sized", ("en", "de"))
    + ", lfilt AS (SELECT s.* FROM sized s JOIN langsel USING (doc_id))"
    ", xfp AS (SELECT doc_id, md5(array_to_string("
    "regexp_extract_all(lower(text), '\\w+'), ' ')) AS fp FROM lfilt)"
    ", exact AS (SELECT * FROM lfilt WHERE doc_id IN "
    "(SELECT min(doc_id) FROM xfp GROUP BY fp)), "
    + _cluster_ctes(_minhash_sql("exact", 0.6))
    + ", surv AS (SELECT * FROM exact WHERE doc_id NOT IN "
    "(SELECT n FROM cl WHERE n <> l)) "
    "SELECT doc_id, source FROM surv WHERE "
    "(md5_number_upper('42:' || doc_id::VARCHAR)::HUGEINT % 2147483648)::BIGINT "
    f"< {_PIPE_CASE} ORDER BY doc_id"
)

_STRATA_CASE = (
    "CASE lang "
    + " ".join(
        f"WHEN '{k}' THEN {int(v * (1 << 31))}" for k, v in sorted(STRATA_FRACTIONS.items())
    )
    + f" ELSE {int(STRATA_DEFAULT * (1 << 31))} END"
)

_COS = """
WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
     qn AS (SELECT sqrt(sum(x * x)) AS n
            FROM (SELECT unnest(qe)::DOUBLE AS x FROM q)),
     z AS (SELECT vec_id, unnest(embedding)::DOUBLE AS a,
                  unnest((SELECT qe FROM q))::DOUBLE AS b
           FROM embeddings)
SELECT vec_id,
       sum(a * b) / (sqrt(sum(a * a)) * (SELECT n FROM qn)) AS raw_cos
FROM z GROUP BY vec_id
"""


# PII regex contract (functions/pii.py) — Java-regex/RE2 common subset,
# parity-tested in tests/test_corpus_hygiene.py
from inverted_index_spark.functions.pii import (  # noqa: E402
    EMAIL_RE as _PII_EMAIL,
    IPV4_RE as _PII_IP,
    PHONE_RE as _PII_PHONE,
)


def oracle_sql() -> dict[str, str]:
    oracles = {
        "ii_read_terms": (
            f"SELECT DISTINCT term FROM ({_TOK}) ORDER BY term"
        ),
        "ii_read_values_or": (
            f"SELECT DISTINCT doc_id FROM ({_TOK}) "
            f"WHERE term IN {_ORTERMS} AND doc_id BETWEEN {RANGE[0]} AND {RANGE[1]} "
            "ORDER BY doc_id"
        ),
        "ii_read_values_all": (
            f"SELECT DISTINCT doc_id FROM ({_TOK}) "
            f"WHERE term IN {_ORTERMS} ORDER BY doc_id"
        ),
        "ii_and_values": (
            f"SELECT doc_id FROM ({_TF}) WHERE term IN {_ORTERMS} "
            f"GROUP BY doc_id HAVING count(DISTINCT term) = {len(set(OR_TERMS))} "
            "ORDER BY doc_id"
        ),
        "ii_term_df": (
            f"SELECT term, count(*) AS df FROM ({_TF}) GROUP BY term ORDER BY term"
        ),
        "ii_doc_lengths": (
            f"SELECT doc_id, len({_TOKS_SQL})::BIGINT AS dl "
            "FROM documents ORDER BY doc_id"
        ),
        "ii_corpus_stats": (
            "SELECT count(*)::BIGINT AS n_docs, "
            f"round(sum(len({_TOKS_SQL}))::DOUBLE "
            "/ count(*), 6) AS avgdl FROM documents"
        ),
        "bm25_scores": (
            f"SELECT doc_id, round(raw_score, 6) AS score FROM ({_BM25_CONTRIB}) "
            "ORDER BY doc_id"
        ),
        "bm25_topk": (
            f"SELECT doc_id, round(raw_score, 4) AS score FROM ({_BM25_CONTRIB}) "
            "ORDER BY raw_score DESC, doc_id ASC LIMIT 10"
        ),
        "bm25_topk_wand": (
            f"SELECT doc_id, round(raw_score, 4) AS score FROM ({_BM25_CONTRIB}) "
            "ORDER BY raw_score DESC, doc_id ASC LIMIT 10"
        ),
        # pluggable similarities (operators/bm25.py pinned contracts)
        "classic_topk": (
            f"WITH tf AS ({_TF}), dl AS ({_DL}), "
            "df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term), "
            "n AS (SELECT count(*)::DOUBLE AS n FROM documents), "
            "sc AS (SELECT tf.doc_id, "
            "sum(sqrt(tf.tf) * pow(1.0 + ln((SELECT n FROM n) / (df.df + 1.0)), 2) "
            "/ sqrt(dl.dl)) AS raw "
            f"FROM tf JOIN df USING (term) JOIN dl ON tf.doc_id = dl.doc_id "
            f"WHERE term IN {_QTERMS} GROUP BY tf.doc_id) "
            "SELECT doc_id, round(raw, 4) AS score FROM sc "
            "ORDER BY raw DESC, doc_id ASC LIMIT 10"
        ),
        "lmd_topk": (
            f"WITH tok AS ({_TOK}), tf AS ({_TF}), dl AS ({_DL}), "
            "tot AS (SELECT count(*)::DOUBLE AS tot FROM tok), "
            "ctf AS (SELECT term, count(*)::DOUBLE AS ctf FROM tok GROUP BY term), "
            "sc AS (SELECT tf.doc_id, "
            "sum(greatest(0.0, ln(1.0 + tf.tf / (2000.0 * ctf.ctf / (SELECT tot FROM tot))) "
            "+ ln(2000.0 / (dl.dl + 2000.0)))) AS raw "
            "FROM tf JOIN ctf USING (term) JOIN dl ON tf.doc_id = dl.doc_id "
            f"WHERE term IN {_QTERMS} GROUP BY tf.doc_id) "
            "SELECT doc_id, round(raw, 4) AS score FROM sc "
            "ORDER BY raw DESC, doc_id ASC LIMIT 10"
        ),
        # federation must be transparent: same oracle as the merged index
        "federated_bm25_topk": (
            f"SELECT doc_id, round(raw_score, 4) AS score FROM ({_BM25_CONTRIB}) "
            "ORDER BY raw_score DESC, doc_id ASC LIMIT 10"
        ),
        "function_score_topk": (
            "SELECT b.doc_id, round(b.raw_score * ln(1.0 + d.n_chars), 4) "
            f"AS score FROM ({_BM25_CONTRIB}) b JOIN documents d USING (doc_id) "
            "ORDER BY b.raw_score * ln(1.0 + d.n_chars) DESC, b.doc_id ASC "
            "LIMIT 10"
        ),
        "chunk_documents": r"""
WITH toks AS (
  SELECT doc_id,
         CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
              ELSE string_split_regex(trim(text), '\s+') END AS toks
  FROM documents
), st AS (
  SELECT doc_id, toks,
         unnest(range(0, greatest(len(toks), 1), 24)) AS start_tok
  FROM toks
)
SELECT doc_id,
       (row_number() OVER (PARTITION BY doc_id ORDER BY start_tok) - 1)
         AS chunk_idx,
       start_tok,
       least(32, len(toks) - start_tok) AS n_tokens,
       array_to_string(list_slice(toks, start_tok + 1, start_tok + 32), ' ')
         AS chunk
FROM st ORDER BY doc_id, chunk_idx
""",
        # two-phase int8 ANN: the window selection runs on EXACT integer
        # dot products, so both engines pick identical candidates
        "quantized_topk": r"""
WITH q AS (SELECT embedding AS qe,
             list_aggregate(list_transform(embedding,
               x -> abs(CAST(x AS DOUBLE))), 'max') / 127.0 AS qscale
           FROM embeddings WHERE vec_id = 0),
qq AS (SELECT qe,
         CASE WHEN qscale = 0 THEN list_transform(qe, x -> 0.0)
              ELSE list_transform(qe,
                x -> floor(CAST(x AS DOUBLE) / qscale + 0.5)) END AS qv
       FROM q),
vv AS (SELECT e.vec_id, e.embedding, qq.qe, qq.qv,
         list_aggregate(list_transform(e.embedding,
           x -> abs(CAST(x AS DOUBLE))), 'max') / 127.0 AS vs
       FROM embeddings e CROSS JOIN qq),
vz AS (SELECT vec_id, embedding, qe, qv,
         CASE WHEN vs = 0 THEN list_transform(embedding, x -> 0.0)
              ELSE list_transform(embedding,
                x -> floor(CAST(x AS DOUBLE) / vs + 0.5)) END AS v
       FROM vv),
ax AS (SELECT vec_id, embedding, qe,
         CASE WHEN list_dot_product(v, v) = 0
                OR list_dot_product(qv, qv) = 0 THEN 0.0
              ELSE list_dot_product(v, qv)
                / (sqrt(list_dot_product(v, v))
                   * sqrt(list_dot_product(qv, qv))) END AS approx
       FROM vz),
win AS (SELECT vec_id, embedding, qe FROM ax
        ORDER BY approx DESC, vec_id ASC LIMIT 40),
z AS (SELECT vec_id, unnest(embedding)::DOUBLE AS a,
             unnest(qe)::DOUBLE AS b FROM win),
ex AS (SELECT vec_id, sum(a * b) / (sqrt(sum(a * a)) * sqrt(sum(b * b))) AS c
       FROM z GROUP BY vec_id)
SELECT vec_id, round(c, 4) AS cosine FROM ex
ORDER BY c DESC, vec_id ASC LIMIT 10
""",
        "delete_read_values": (
            f"SELECT DISTINCT doc_id FROM ({_TOK_ALIVE}) "
            f"WHERE term IN {_ORTERMS} ORDER BY doc_id"
        ),
        "delete_bm25_topk": (
            "SELECT doc_id, round(raw_score, 4) AS score FROM "
            f"({_bm25_contrib_sql(Q_TERMS, src=_ALIVE_SRC)}) "
            "ORDER BY raw_score DESC, doc_id ASC LIMIT 10"
        ),
        "reindex_read_values": (
            f"SELECT DISTINCT doc_id FROM ({_TOK_RX}) "
            "WHERE term IN ('reindexed','merge') ORDER BY doc_id"
        ),
        "reindex_bm25_topk": (
            "SELECT doc_id, round(raw_score, 4) AS score FROM "
            f"({_bm25_contrib_sql(_RX_TERMS, src=_RX_SRC)}) "
            "ORDER BY raw_score DESC, doc_id ASC LIMIT 10"
        ),
        # the pinned pre-upsert snapshot IS the original corpus — the
        # plain documents query, no reindex trace
        "time_travel_read_values": (
            f"SELECT DISTINCT doc_id FROM ({_TOK}) "
            "WHERE term IN ('reindexed','merge') ORDER BY doc_id"
        ),
        # match set of 'window merge' (adjacency=AND) excluded from the read
        "delete_by_query_read": (
            f"SELECT DISTINCT doc_id FROM ({_TOK}) "
            "WHERE term IN ('spark','window') AND doc_id NOT IN ("
            f"SELECT a.doc_id FROM ({_TOK}) a JOIN ({_TOK}) b USING (doc_id) "
            "WHERE a.term = 'window' AND b.term = 'merge') "
            "ORDER BY doc_id"
        ),
        "bm25f_topk": _bm25f_sql(_BM25F_TERMS),
        "dedup_fingerprints": (
            "SELECT md5(array_to_string(regexp_extract_all(lower(text), '\\w+'), ' ')) AS fp, "
            "count(*) AS n_dups, min(doc_id) AS keep_id "
            "FROM documents GROUP BY fp ORDER BY fp"
        ),
        "analyzed_term_df": (
            f"WITH toks AS (SELECT doc_id, unnest({_TOKS_SQL}) AS t0 "
            "FROM documents), "
            f"kept AS (SELECT doc_id, t0 FROM toks WHERE t0 NOT IN {_AN_STOPLIST}), "
            f"st AS (SELECT doc_id, {_AN_STEM_CASE} AS term FROM kept) "
            "SELECT term, count(DISTINCT doc_id) AS df FROM st "
            "GROUP BY term ORDER BY term"
        ),
        "token_counts": (
            "SELECT doc_id, "
            "len(regexp_extract_all(lower(text), '\\w+'))::BIGINT AS n_tokens, "
            "len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]+'))::BIGINT AS n_bpe_tokens, "
            "length(text)::BIGINT AS n_chars FROM documents ORDER BY doc_id"
        ),
        "quality_scores": (
            "WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '\\w+') AS toks "
            "FROM documents) "
            "SELECT doc_id, len(toks)::BIGINT AS n_tokens, "
            "round(CASE WHEN len(toks) > 0 THEN list_aggregate(list_transform(toks, x -> length(x)), 'sum')::DOUBLE / len(toks) ELSE 0 END, 6) AS avg_token_len, "
            "round(CASE WHEN len(toks) > 0 THEN len(list_filter(toks, x -> x IN "
            "('the','a','an','and','of','to','in','is','it','for')))::DOUBLE / len(toks) ELSE 0 END, 6) AS stopword_ratio, "
            "round(CASE WHEN len(toks) > 0 THEN len(list_distinct(toks))::DOUBLE / len(toks) ELSE 0 END, 6) AS distinct_ratio "
            "FROM t ORDER BY doc_id"
        ),
        "lang_id": (
            "WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '\\w+') AS toks FROM documents), "
            "s AS (SELECT doc_id, "
            "len(list_intersect(toks, ['der','die','das','und','ist','nicht'])) AS s_de, "
            "len(list_intersect(toks, ['the','a','and','of','is','to'])) AS s_en, "
            "len(list_intersect(toks, ['el','la','los','las','es','y'])) AS s_es, "
            "len(list_intersect(toks, ['le','la','les','est','et','une'])) AS s_fr "
            "FROM t) "
            "SELECT doc_id, CASE WHEN greatest(s_de, s_en, s_es, s_fr) = 0 THEN 'und' "
            "WHEN s_de = greatest(s_de, s_en, s_es, s_fr) THEN 'de' "
            "WHEN s_en = greatest(s_de, s_en, s_es, s_fr) THEN 'en' "
            "WHEN s_es = greatest(s_de, s_en, s_es, s_fr) THEN 'es' "
            "ELSE 'fr' END AS pred_lang FROM s ORDER BY doc_id"
        ),
        "gopher_quality": (
            "WITH t AS (SELECT doc_id, text, "
            "regexp_extract_all(lower(text), '\\w+') AS toks, "
            "string_split(text, chr(10)) AS lines FROM documents), "
            "base AS (SELECT doc_id, len(toks)::BIGINT AS n_words, "
            "length(array_to_string(toks, ''))::DOUBLE AS word_chars, "
            "len(lines)::BIGINT AS n_lines, "
            "(len(lines) - len(list_distinct(lines)))::DOUBLE / len(lines) AS dup_line_frac, "
            "CASE WHEN len(toks) > 0 THEN len(regexp_extract_all(text, '#|\\.\\.\\.|…'))::DOUBLE / len(toks) ELSE 0 END AS symbol_word_ratio, "
            "CASE WHEN len(toks) > 0 THEN len(list_filter(toks, x -> regexp_matches(x, '[a-z]')))::DOUBLE / len(toks) ELSE 0 END AS alpha_word_frac "
            "FROM t), "
            "g2 AS (SELECT doc_id, gram, count(*) AS cnt, length(gram) - 1 AS chars FROM ("
            "SELECT doc_id, unnest(list_transform(generate_series(1, len(toks) - 1), "
            "i -> array_to_string(toks[i:i+1], ' '))) AS gram FROM t WHERE len(toks) >= 2) "
            "GROUP BY doc_id, gram), "
            "g3 AS (SELECT doc_id, gram, count(*) AS cnt, length(gram) - 2 AS chars FROM ("
            "SELECT doc_id, unnest(list_transform(generate_series(1, len(toks) - 2), "
            "i -> array_to_string(toks[i:i+2], ' '))) AS gram FROM t WHERE len(toks) >= 3) "
            "GROUP BY doc_id, gram), "
            "g5 AS (SELECT doc_id, gram, count(*) AS cnt, length(gram) - 4 AS chars FROM ("
            "SELECT doc_id, unnest(list_transform(generate_series(1, len(toks) - 4), "
            "i -> array_to_string(toks[i:i+4], ' '))) AS gram FROM t WHERE len(toks) >= 5) "
            "GROUP BY doc_id, gram), "
            "top2 AS (SELECT doc_id, max(cnt * chars) AS v FROM g2 GROUP BY doc_id), "
            "top3 AS (SELECT doc_id, max(cnt * chars) AS v FROM g3 GROUP BY doc_id), "
            "dup5 AS (SELECT doc_id, sum(cnt * chars) AS v FROM g5 WHERE cnt > 1 GROUP BY doc_id), "
            "f AS (SELECT b.*, "
            "CASE WHEN word_chars > 0 THEN coalesce(top2.v, 0)::DOUBLE / word_chars ELSE 0 END AS t2, "
            "CASE WHEN word_chars > 0 THEN coalesce(top3.v, 0)::DOUBLE / word_chars ELSE 0 END AS t3, "
            "CASE WHEN word_chars > 0 THEN coalesce(dup5.v, 0)::DOUBLE / word_chars ELSE 0 END AS d5 "
            "FROM base b LEFT JOIN top2 USING (doc_id) "
            "LEFT JOIN top3 USING (doc_id) LEFT JOIN dup5 USING (doc_id)) "
            "SELECT doc_id, (n_words >= 50 AND n_words <= 100000 "
            "AND symbol_word_ratio <= 0.1 AND alpha_word_frac >= 0.8 "
            "AND dup_line_frac <= 0.3 AND t2 <= 0.2 AND t3 <= 0.18 "
            "AND d5 <= 0.15) AS keep, n_words, n_lines, "
            "round(dup_line_frac, 6) AS dup_line_frac, "
            "round(symbol_word_ratio, 6) AS symbol_word_ratio, "
            "round(alpha_word_frac, 6) AS alpha_word_frac, "
            "round(t2, 6) AS top_2gram_char_frac, "
            "round(t3, 6) AS top_3gram_char_frac, "
            "round(d5, 6) AS dup_5gram_char_frac "
            "FROM f ORDER BY doc_id"
        ),
        "c4_clean": (
            "WITH src AS (SELECT doc_id, "
            "replace(text, ' merge ', '.' || chr(10)) || '.' AS text "
            "FROM documents), "
            "t AS (SELECT doc_id, text, string_split(text, chr(10)) AS lines, "
            "list_filter(string_split(text, chr(10)), l -> "
            "regexp_matches(l, '[.!?\"]\\s*$') "
            "AND len(regexp_extract_all(lower(l), '\\w+')) >= 5 "
            "AND NOT contains(lower(l), 'javascript')) AS kept FROM src), "
            "u AS (SELECT doc_id, text, lines, kept, "
            "array_to_string(kept, chr(10)) AS clean_text FROM t) "
            "SELECT doc_id, (NOT contains(lower(text), 'lorem ipsum') "
            "AND NOT contains(lower(text), '{') "
            "AND len(regexp_extract_all(clean_text, '[.!?]')) >= 3) AS keep, "
            "clean_text, len(lines)::BIGINT AS n_lines, "
            "len(kept)::BIGINT AS n_kept, "
            "len(regexp_extract_all(clean_text, '[.!?]'))::BIGINT AS n_sentences "
            "FROM u ORDER BY doc_id"
        ),
        "dedup_lines": (
            "WITH src AS (SELECT doc_id, "
            "replace(text, ' merge ', '.' || chr(10)) || '.' AS text "
            "FROM documents), "
            "t AS (SELECT doc_id, string_split(text, chr(10)) AS lines FROM src), "
            "ex AS (SELECT doc_id, s['i'] AS line_idx, s['line'] AS line FROM ("
            "SELECT doc_id, unnest(list_transform(generate_series(1, len(lines)), "
            "i -> {'i': i, 'line': lines[i]})) AS s FROM t)), "
            "norm AS (SELECT doc_id, line_idx, line, "
            "CASE WHEN len(regexp_extract_all(lower(line), '\\w+')) >= 5 THEN "
            "array_to_string(regexp_extract_all(lower(line), '\\w+'), ' ') END AS h "
            "FROM ex), "
            "firsts AS (SELECT h, doc_id, line_idx FROM ("
            "SELECT h, doc_id, line_idx, row_number() OVER "
            "(PARTITION BY h ORDER BY doc_id, line_idx) AS rn "
            "FROM norm WHERE h IS NOT NULL) WHERE rn = 1), "
            "surv AS (SELECT n.doc_id, n.line_idx, n.line FROM norm n "
            "LEFT JOIN firsts f ON n.h = f.h AND n.doc_id = f.doc_id "
            "AND n.line_idx = f.line_idx "
            "WHERE n.h IS NULL OR f.h IS NOT NULL), "
            "reb AS (SELECT doc_id, "
            "string_agg(line, chr(10) ORDER BY line_idx) AS clean_text, "
            "count(*) AS n_kept FROM surv GROUP BY doc_id), "
            "tot AS (SELECT doc_id, "
            "len(string_split(text, chr(10)))::BIGINT AS n_lines FROM src) "
            "SELECT t.doc_id, coalesce(clean_text, '') AS clean_text, n_lines, "
            "(n_lines - coalesce(n_kept, 0))::BIGINT AS n_removed "
            "FROM tot t LEFT JOIN reb USING (doc_id) ORDER BY doc_id"
        ),
        "mix_corpus": (
            "WITH cnt AS (SELECT source, count(*)::DOUBLE AS n FROM documents "
            "WHERE source IN ('src0', 'src1', 'src2') GROUP BY source), "
            "tgt AS (SELECT * FROM (VALUES ('src0', 0.5), ('src1', 0.3), "
            "('src2', 0.2)) t(source, w)), "
            "j AS (SELECT c.source, n, w FROM cnt c JOIN tgt USING (source)), "
            "tt AS (SELECT min(n / w) AS t FROM j), "
            "rates AS (SELECT source, "
            "least(trunc(((w * t) / n) * 2147483648)::BIGINT, 2147483648) AS thr "
            "FROM j, tt) "
            "SELECT d.doc_id, d.source FROM documents d JOIN rates r USING (source) "
            "WHERE (md5_number_upper('42:' || d.doc_id::VARCHAR)::HUGEINT "
            "% 2147483648)::BIGINT < thr ORDER BY doc_id"
        ),
        "embed_cosine": (
            f"SELECT vec_id, round(raw_cos, 6) AS cosine FROM ({_COS}) ORDER BY vec_id"
        ),
        "embed_near_pairs": (
            "SELECT a, b, round(raw, 6) AS cosine FROM ("
            "SELECT x.vec_id AS a, y.vec_id AS b, "
            "list_dot_product(x.embedding::DOUBLE[], y.embedding::DOUBLE[]) / "
            "(sqrt(list_dot_product(x.embedding::DOUBLE[], x.embedding::DOUBLE[])) * "
            "sqrt(list_dot_product(y.embedding::DOUBLE[], y.embedding::DOUBLE[]))) AS raw "
            "FROM embeddings x JOIN embeddings y ON x.vec_id < y.vec_id) "
            "WHERE raw >= 0.4 ORDER BY a, b"
        ),
        "embed_knn": (
            f"SELECT vec_id, round(raw_cos, 4) AS cosine FROM ({_COS}) "
            "ORDER BY raw_cos DESC, vec_id ASC LIMIT 20"
        ),
        "knn_filtered": (
            f"SELECT vec_id, round(raw_cos, 4) AS cosine FROM ({_COS}) c "
            "JOIN embeddings e USING (vec_id) WHERE e.label IN (1, 3, 5) "
            "ORDER BY raw_cos DESC, vec_id ASC LIMIT 15"
        ),
        "knn_query_filtered": (
            f"SELECT vec_id, round(raw_cos, 4) AS cosine FROM ({_COS}) "
            f"WHERE vec_id IN (SELECT doc_id FROM ({_TF}) "
            "WHERE term IN ('spark', 'merge') "
            "GROUP BY doc_id HAVING count(DISTINCT term) = 2) "
            "ORDER BY raw_cos DESC, vec_id ASC LIMIT 15"
        ),
        "bm25_topk_batch": (
            f"SELECT qid, rank, doc_id, score FROM ({_BM25_BATCH}) ORDER BY qid, rank"
        ),
        "rank_eval_metrics": (
            f"WITH ranked AS ({_BM25_BATCH}), "
            "judge AS (SELECT * FROM (VALUES "
            + ", ".join(
                f"('{qid}', {d}, {g})"
                for qid, m in RANK_JUDGE.items()
                for d, g in m.items()
            )
            + ") j(qid, doc_id, grade)), "
            "hit AS (SELECT r.qid, r.rank, coalesce(g.grade, 0.0) AS grade "
            "FROM ranked r LEFT JOIN judge g "
            "ON r.qid = g.qid AND r.doc_id = g.doc_id), "
            "got AS (SELECT qid, "
            "sum(CASE WHEN grade > 0 THEN 1 ELSE 0 END)::DOUBLE AS hits, "
            "max(CASE WHEN grade > 0 THEN 1.0 / rank END) AS mrr, "
            "sum((pow(2.0, grade) - 1.0) / log2(rank + 1)) AS dcg "
            "FROM hit GROUP BY qid), "
            "rel AS (SELECT qid, doc_id, grade FROM judge WHERE grade > 0), "
            "nrel AS (SELECT qid, count(*)::DOUBLE AS n_rel FROM rel GROUP BY qid), "
            "ideal AS (SELECT qid, "
            "sum((pow(2.0, grade) - 1.0) / log2(rn + 1)) AS idcg FROM ("
            "SELECT qid, grade, row_number() OVER "
            "(PARTITION BY qid ORDER BY grade DESC, doc_id ASC) AS rn FROM rel) "
            "WHERE rn <= 5 GROUP BY qid), "
            "uni AS (SELECT unnest(["
            + ", ".join(f"'{q}'" for q in sorted(BATCH_QS))
            + "]) AS qid) "
            "SELECT u.qid, round(coalesce(hits, 0.0) / 5.0, 6) AS precision_k, "
            "round(CASE WHEN n_rel > 0 THEN coalesce(hits, 0.0) / n_rel "
            "ELSE 0.0 END, 6) AS recall_k, "
            "round(coalesce(mrr, 0.0), 6) AS mrr, "
            "round(CASE WHEN idcg > 0 THEN coalesce(dcg, 0.0) / idcg "
            "ELSE 0.0 END, 6) AS ndcg_k, "
            "coalesce(n_rel, 0.0)::BIGINT AS n_rel "
            "FROM uni u LEFT JOIN got USING (qid) LEFT JOIN nrel USING (qid) "
            "LEFT JOIN ideal USING (qid) ORDER BY u.qid"
        ),
        "has_child_topk": (
            f"WITH s AS ({_BM25_CONTRIB}), "
            "j AS (SELECT d.source AS parent_id, s.doc_id, s.raw_score "
            "FROM s JOIN documents d USING (doc_id)), "
            "g AS (SELECT parent_id, sum(raw_score) AS raw, "
            "count(*)::BIGINT AS n_children FROM j GROUP BY parent_id) "
            "SELECT parent_id, round(raw, 6) AS score, n_children FROM g "
            "ORDER BY raw DESC, parent_id ASC LIMIT 10"
        ),
        "child_inner_hits": (
            f"WITH s AS ({_BM25_CONTRIB}), "
            "j AS (SELECT d.source AS parent_id, s.doc_id, s.raw_score "
            "FROM s JOIN documents d USING (doc_id)), "
            "r AS (SELECT parent_id, doc_id, raw_score, row_number() OVER "
            "(PARTITION BY parent_id ORDER BY raw_score DESC, doc_id ASC) "
            "AS rn FROM j) "
            "SELECT parent_id, rn::INT AS child_rank, doc_id, "
            "round(raw_score, 6) AS score FROM r WHERE rn <= 2 "
            "ORDER BY parent_id, child_rank"
        ),
        "has_parent_topk": (
            f"WITH s AS ({_BM25_CONTRIB}), "
            "p AS (SELECT source, min(doc_id) AS parent_id "
            "FROM documents GROUP BY source), "
            "cp AS (SELECT d.doc_id, p.parent_id "
            "FROM documents d JOIN p USING (source)) "
            "SELECT cp.doc_id, cp.parent_id, "
            "round(s.raw_score, 6) AS score "
            "FROM cp JOIN s ON s.doc_id = cp.parent_id "
            "ORDER BY s.raw_score DESC, cp.doc_id ASC LIMIT 10"
        ),
        "boosting_topk": (
            "SELECT doc_id, round(sc, 4) AS score FROM ("
            "SELECT m.doc_id, CASE WHEN n.doc_id IS NOT NULL "
            "THEN coalesce(s.raw_score, 0) * 0.5 "
            "ELSE coalesce(s.raw_score, 0) END AS sc "
            "FROM (SELECT DISTINCT doc_id FROM "
            f"({_TOK}) WHERE term IN ('merge', 'spark')) m "
            f"LEFT JOIN ({_bm25_contrib_sql(['merge', 'spark'])}) s "
            "USING (doc_id) "
            "LEFT JOIN (SELECT DISTINCT doc_id FROM "
            f"({_TOK}) WHERE term = 'window') n ON n.doc_id = m.doc_id) "
            "ORDER BY sc DESC, doc_id ASC LIMIT 10"
        ),
        "read_values_batch": (
            f"SELECT qid, doc_id FROM ({_READ_BATCH}) ORDER BY qid, doc_id"
        ),
        "winnow_fingerprints": (
            f"SELECT doc_id, fp FROM ({_WINNOW_FPS}) ORDER BY doc_id, fp"
        ),
        "winnow_pairs": (
            f"WITH fps AS ({_WINNOW_FPS}), "
            "rare AS (SELECT fp FROM fps GROUP BY fp HAVING count(*) <= 1000) "
            "SELECT l.doc_id AS a, r.doc_id AS b, count(*) AS n_shared "
            "FROM fps l JOIN rare USING (fp) JOIN fps r USING (fp) "
            "WHERE l.doc_id < r.doc_id "
            "GROUP BY a, b HAVING count(*) >= 2 ORDER BY a, b"
        ),
        "minhash_pairs": _MINHASH,
        "simhash_pairs": _SIMHASH,
        "simhash_values": (
            f"WITH {_SIMHASH_CORE} "
            "SELECT doc_id, simhash FROM sh ORDER BY doc_id"
        ),
        "dedup_exact_keep": (
            "WITH fp AS (SELECT doc_id, md5(array_to_string("
            "regexp_extract_all(lower(text), '\\w+'), ' ')) AS fp FROM documents) "
            "SELECT doc_id FROM documents WHERE doc_id IN "
            "(SELECT min(doc_id) FROM fp GROUP BY fp) ORDER BY doc_id"
        ),
        "index_stats": (
            "SELECT 1::BIGINT AS n_segments, "
            "(SELECT count(*) FROM documents)::BIGINT AS n_docs, "
            f"(SELECT count(*) FROM (SELECT DISTINCT doc_id, term FROM ({_TOK})))::BIGINT AS n_postings, "
            f"(SELECT sum(len({_TOKS_SQL})) FROM documents)::BIGINT AS sum_dl"
        ),
        "phrase_match": _PHRASE_SQL,
        "phrase_prefix_match": (
            "WITH expl AS (SELECT list(term ORDER BY term) AS es FROM ("
            f"SELECT DISTINCT term FROM (SELECT unnest({_TOKS_SQL}) AS term "
            "FROM documents) WHERE term LIKE 's%' ORDER BY term LIMIT 50)), "
            f"d AS (SELECT doc_id, {_TOKS_SQL} AS t FROM documents) "
            "SELECT doc_id, n_matches FROM ("
            "SELECT doc_id, len(list_filter("
            "generate_series(1, greatest(len(t) - 1, 0)), "
            f"i -> t[i] = '{PHRASE[0]}' AND list_contains(es, t[i+1])"
            "))::BIGINT AS n_matches FROM d CROSS JOIN expl) "
            "WHERE n_matches > 0 ORDER BY doc_id"
        ),
        "span_not_match": (
            "SELECT doc_id, n_matches FROM (SELECT doc_id, "
            "len(list_filter(generate_series(1, greatest(len(t) - 1, 0)), "
            f"i -> t[i] = '{PHRASE[0]}' AND t[i+1] = '{PHRASE[1]}' "
            "AND NOT list_contains("
            "t[greatest(i-2,1):least(i+3,len(t))], 'merge')"
            "))::BIGINT AS n_matches FROM "
            f"(SELECT doc_id, {_TOKS_SQL} AS t FROM documents)) "
            "WHERE n_matches > 0 ORDER BY doc_id"
        ),
        "span_first_match": (
            "SELECT doc_id, n_matches FROM (SELECT doc_id, "
            "len(list_filter(generate_series(1, least(40, greatest(len(t) - 1, 0))), "
            f"i -> t[i] = '{PHRASE[0]}' AND t[i+1] = '{PHRASE[1]}'"
            "))::BIGINT AS n_matches FROM "
            f"(SELECT doc_id, {_TOKS_SQL} AS t FROM documents)) "
            "WHERE n_matches > 0 ORDER BY doc_id"
        ),
        "span_or_match": (
            # distinct (start, end) spans matched by the exact phrase
            # OR the single term 'window' — list-of-[start,end] union
            "SELECT doc_id, n_matches FROM (SELECT doc_id, "
            # spans encoded as start*2^32+end scalars: list_distinct
            # over nested lists is unsupported in this DuckDB build
            "len(list_distinct("
            "list_transform(list_filter(generate_series(1, greatest(len(t) - 1, 0)), "
            f"i -> t[i] = '{PHRASE[0]}' AND t[i+1] = '{PHRASE[1]}'), "
            "i -> i::BIGINT * 4294967296 + (i + 1)) "
            "|| list_transform(list_filter(generate_series(1, len(t)), "
            "i -> t[i] = 'window'), i -> i::BIGINT * 4294967296 + i)"
            "))::BIGINT AS n_matches FROM "
            f"(SELECT doc_id, {_TOKS_SQL} AS t FROM documents)) "
            "WHERE n_matches > 0 ORDER BY doc_id"
        ),
        "span_within_match": (
            # 'hash' positions enclosed by a phrase span [b, b+1]
            "SELECT doc_id, n_matches FROM (SELECT doc_id, "
            "len(list_filter(ls, i -> len(list_filter(bs, "
            "b -> b <= i AND i <= b + 1)) > 0))::BIGINT AS n_matches "
            "FROM (SELECT doc_id, "
            "list_filter(generate_series(1, greatest(len(t) - 1, 0)), "
            f"i -> t[i] = '{PHRASE[0]}' AND t[i+1] = '{PHRASE[1]}') AS bs, "
            "list_filter(generate_series(1, len(t)), "
            f"i -> t[i] = '{PHRASE[1]}') AS ls "
            f"FROM (SELECT doc_id, {_TOKS_SQL} AS t FROM documents))) "
            "WHERE n_matches > 0 ORDER BY doc_id"
        ),
        "rare_terms_tail": (
            "SELECT term, doc_count FROM ("
            "SELECT term, count(DISTINCT doc_id)::BIGINT AS doc_count "
            f"FROM ({_TOK}) GROUP BY term) "
            "WHERE doc_count <= 382 "
            "ORDER BY doc_count ASC, term ASC LIMIT 1000"
        ),
        "multi_terms_buckets": (
            "SELECT lang, source, count(*)::BIGINT AS doc_count "
            "FROM documents d "
            f"WHERE list_contains({_TOKS_SQL}, 'dup') "
            "GROUP BY lang, source "
            "ORDER BY doc_count DESC, lang ASC, source ASC LIMIT 10"
        ),
        "adjacency_matrix_counts": (
            f"WITH d AS (SELECT doc_id, {_TOKS_SQL} AS t FROM documents), "
            "m AS ("
            "SELECT doc_id, 'dup' AS name FROM d WHERE list_contains(t, 'dup') "
            "UNION ALL SELECT doc_id, 'mw' FROM d "
            "WHERE list_contains(t, 'merge') AND list_contains(t, 'window') "
            "UNION ALL SELECT doc_id, 'spark' FROM d "
            "WHERE list_contains(t, 'spark')) "
            "SELECT key, count(*)::BIGINT AS doc_count FROM ("
            "SELECT CASE WHEN a.name = b.name THEN a.name "
            "ELSE a.name || '&' || b.name END AS key "
            "FROM m a JOIN m b ON a.doc_id = b.doc_id AND a.name <= b.name) "
            "GROUP BY key ORDER BY key"
        ),
        "phrase_snippets": (
            f"WITH t AS (SELECT doc_id, {_TOKS_SQL} AS t FROM documents), "
            "m AS (SELECT doc_id, t, list_filter(generate_series(1, greatest(len(t) - 1, 0)), "
            f"i -> t[i] = '{PHRASE[0]}' AND t[i+1] = '{PHRASE[1]}') AS hits FROM t), "
            "f AS (SELECT doc_id, t, len(hits)::BIGINT AS n_matches, "
            "greatest(hits[1] - 3, 1) AS a FROM m WHERE len(hits) > 0) "
            "SELECT doc_id, n_matches, array_to_string(t[a : a + 7], ' ') AS snippet "
            "FROM f ORDER BY doc_id"
        ),
        "phrase_bm25_topk": (
            f"SELECT doc_id, round(raw_score, 4) AS score "
            f"FROM ({_bm25_contrib_sql(PHRASE)}) "
            f"WHERE doc_id IN (SELECT doc_id FROM ({_PHRASE_SQL})) "
            "ORDER BY raw_score DESC, doc_id ASC LIMIT 10"
        ),
        "phrase_slop_bm25_topk": (
            f"SELECT doc_id, round(raw_score, 4) AS score "
            f"FROM ({_bm25_contrib_sql(PHRASE)}) "
            "WHERE doc_id IN (SELECT doc_id FROM ("
            "SELECT doc_id, len(list_filter(generate_series(1, len(t)), "
            f"i -> t[i] = '{PHRASE[0]}' AND len(list_filter("
            "generate_series(i + 1, least(i + 3, len(t))), "
            f"j -> t[j] = '{PHRASE[1]}')) > 0))::BIGINT AS n_matches "
            f"FROM (SELECT doc_id, {_TOKS_SQL} AS t FROM documents)) "
            "WHERE n_matches > 0) "
            "ORDER BY raw_score DESC, doc_id ASC LIMIT 10"
        ),
        "ii_read_terms_regex": (
            f"SELECT DISTINCT term FROM ({_TOK}) "
            "WHERE regexp_full_match(term, '[a-z]*ow') ORDER BY term"
        ),
        "bm25_topk_text": (
            f"SELECT s.doc_id, round(s.raw_score, 4) AS score, d.text "
            f"FROM ({_BM25_CONTRIB}) s JOIN documents d USING (doc_id) "
            "ORDER BY s.raw_score DESC, s.doc_id ASC LIMIT 10"
        ),
        "ii_except_values": (
            f"SELECT doc_id FROM (SELECT DISTINCT doc_id FROM ({_TOK}) "
            f"WHERE term IN {_ORTERMS}) WHERE doc_id NOT IN "
            f"(SELECT doc_id FROM ({_TOK}) WHERE term = 'window') ORDER BY doc_id"
        ),
        "boolean_query": (
            "SELECT DISTINCT doc_id FROM ("
            f"SELECT doc_id FROM ({_TOK}) WHERE term = 'spark' "
            f"EXCEPT SELECT doc_id FROM ({_TOK}) WHERE term = 'window' "
            f"UNION SELECT doc_id FROM ({_PHRASE_SQL})"
            ") ORDER BY doc_id"
        ),
        "phrase_slop": (
            "SELECT doc_id, n_matches FROM ("
            "SELECT doc_id, len(list_filter(generate_series(1, len(t)), "
            f"i -> t[i] = '{PHRASE[0]}' AND len(list_filter("
            "generate_series(i + 1, least(i + 3, len(t))), "
            f"j -> t[j] = '{PHRASE[1]}')) > 0))::BIGINT AS n_matches "
            f"FROM (SELECT doc_id, {_TOKS_SQL} AS t FROM documents)) "
            "WHERE n_matches > 0 ORDER BY doc_id"
        ),
        "boolean_query_parsed": (
            "SELECT DISTINCT doc_id FROM ("
            f"SELECT doc_id FROM ({_TOK}) WHERE term = 'spark' "
            f"EXCEPT SELECT doc_id FROM ({_TOK}) WHERE term = 'window' "
            f"UNION SELECT doc_id FROM ({_PHRASE_SQL})"
            ") ORDER BY doc_id"
        ),
        "boolean_ranked_topk": (
            "SELECT m.doc_id, round(coalesce(s.raw_score, 0), 4) AS score "
            "FROM (SELECT DISTINCT doc_id FROM ("
            f"SELECT doc_id FROM ({_TOK}) WHERE term = 'spark' "
            f"EXCEPT SELECT doc_id FROM ({_TOK}) WHERE term = 'window' "
            f"UNION SELECT doc_id FROM ({_PHRASE_SQL})"
            ")) m LEFT JOIN "
            f"({_bm25_contrib_sql(['spark'] + PHRASE)}) s USING (doc_id) "
            "ORDER BY coalesce(s.raw_score, 0) DESC, m.doc_id ASC LIMIT 10"
        ),
        "facet_counts": (
            "SELECT lang, count(*) AS n_docs FROM documents WHERE doc_id IN ("
            f"SELECT doc_id FROM ({_TOK}) WHERE term = 'spark' "
            "UNION SELECT doc_id FROM ("
            f"SELECT doc_id FROM ({_TOK}) WHERE term = 'merge' "
            f"EXCEPT SELECT doc_id FROM ({_TOK}) WHERE term = 'window')"
            ") GROUP BY lang ORDER BY lang"
        ),
        "more_like_this": (
            f"WITH tf AS ({_TF}), dl AS ({_DL}), "
            "stats AS (SELECT (SELECT count(*) FROM documents)::DOUBLE AS n, "
            f"(SELECT sum(len({_TOKS_SQL})) FROM documents)::DOUBLE "
            "/ (SELECT count(*) FROM documents) AS avgdl), "
            "alldf AS (SELECT term, count(*) AS df FROM tf GROUP BY term), "
            "mlt AS (SELECT t.term FROM tf t JOIN alldf d USING (term) "
            f"WHERE t.doc_id = {MLT_DOC} "
            f"ORDER BY t.tf DESC, d.df ASC, t.term ASC LIMIT {MLT_NTERMS}), "
            "contrib AS (SELECT tf.doc_id, "
            "ln((s.n - d.df + 0.5) / (d.df + 0.5) + 1.0) * tf.tf "
            "/ (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)) AS c "
            "FROM tf JOIN alldf d USING (term) JOIN dl USING (doc_id) "
            "CROSS JOIN stats s WHERE tf.term IN (SELECT term FROM mlt)) "
            f"SELECT doc_id, round(sum(c), 4) AS score FROM contrib "
            f"WHERE doc_id <> {MLT_DOC} GROUP BY doc_id "
            "ORDER BY sum(c) DESC, doc_id ASC LIMIT 10"
        ),
        "stream_dedup_fingerprints": (
            "SELECT DISTINCT md5(coalesce(text, '')) AS fingerprint "
            "FROM documents ORDER BY fingerprint"
        ),
        "fielded_query": (
            "SELECT DISTINCT doc_id FROM documents WHERE doc_id IN ("
            f"SELECT doc_id FROM ({_TOK}) WHERE term IN {_ORTERMS}) "
            f"AND doc_id NOT IN (SELECT doc_id FROM ({_TOK}) WHERE term = 'window') "
            "AND lang = 'en' ORDER BY doc_id"
        ),
        "hybrid_topk": (
            f"WITH b AS (SELECT doc_id, row_number() OVER "
            "(ORDER BY raw_score DESC, doc_id ASC) AS rb "
            f"FROM ({_BM25_CONTRIB}) ORDER BY raw_score DESC, doc_id ASC LIMIT 100), "
            "c AS (SELECT vec_id AS doc_id, row_number() OVER "
            "(ORDER BY raw_cos DESC, vec_id ASC) AS rc "
            f"FROM ({_COS}) ORDER BY raw_cos DESC, vec_id ASC LIMIT 100) "
            "SELECT coalesce(b.doc_id, c.doc_id) AS doc_id, "
            "round(coalesce(1.0 / (60 + rb), 0) + coalesce(1.0 / (60 + rc), 0), 6) "
            "AS rrf FROM b FULL OUTER JOIN c ON b.doc_id = c.doc_id "
            "ORDER BY coalesce(1.0 / (60 + rb), 0) + coalesce(1.0 / (60 + rc), 0) DESC, "
            "coalesce(b.doc_id, c.doc_id) ASC LIMIT 10"
        ),
        "hybrid_linear_topk": (
            "WITH b AS (SELECT doc_id, raw_score "
            f"FROM ({_BM25_CONTRIB}) ORDER BY raw_score DESC, doc_id ASC LIMIT 100), "
            "bn AS (SELECT min(raw_score) AS lo, max(raw_score) AS hi FROM b), "
            "c AS (SELECT vec_id AS doc_id, raw_cos "
            f"FROM ({_COS}) ORDER BY raw_cos DESC, vec_id ASC LIMIT 100), "
            "cn AS (SELECT min(raw_cos) AS lo, max(raw_cos) AS hi FROM c), "
            "f AS (SELECT coalesce(b.doc_id, c.doc_id) AS doc_id, "
            "0.7 * coalesce(CASE WHEN bn.hi > bn.lo THEN "
            "(b.raw_score - bn.lo) / (bn.hi - bn.lo) ELSE 1.0 END, 0) "
            "+ 0.3 * coalesce(CASE WHEN cn.hi > cn.lo THEN "
            "(c.raw_cos - cn.lo) / (cn.hi - cn.lo) ELSE 1.0 END, 0) AS s "
            "FROM b FULL OUTER JOIN c ON b.doc_id = c.doc_id "
            "CROSS JOIN bn CROSS JOIN cn) "
            "SELECT doc_id, round(s, 6) AS score FROM f "
            "ORDER BY s DESC, doc_id ASC LIMIT 10"
        ),
        "term_snippets": (
            f"WITH t AS (SELECT doc_id, {_TOKS_SQL} AS t FROM documents), "
            "p AS (SELECT doc_id, t, list_filter(generate_series(1, len(t)), "
            f"i -> t[i] IN {_ORTERMS}) AS hits FROM t), "
            "f AS (SELECT doc_id, t, hits[1] AS h FROM p WHERE len(hits) > 0) "
            "SELECT doc_id, (h - 1)::BIGINT AS first_pos, "
            "array_to_string(t[greatest(h - 3, 1) : greatest(h - 3, 1) + 6], ' ') "
            "AS snippet FROM f ORDER BY doc_id"
        ),
        "top_terms": (
            f"SELECT term, count(DISTINCT doc_id)::BIGINT AS df FROM ({_TOK}) "
            "GROUP BY term ORDER BY df DESC, term ASC LIMIT 20"
        ),
        "ii_read_values_regex": (
            f"SELECT DISTINCT doc_id FROM ({_TOK}) WHERE term IN "
            f"(SELECT term FROM ({_TOK}) WHERE regexp_full_match(term, '[a-z]*ow')) "
            "ORDER BY doc_id"
        ),
        "ii_read_terms_suffix": (
            f"SELECT DISTINCT term FROM ({_TOK}) WHERE term LIKE '%ow' ORDER BY term"
        ),
        "ii_fuzzy_terms": (
            f"SELECT DISTINCT term FROM ({_TOK}) "
            "WHERE levenshtein(term, 'tble') <= 1 ORDER BY term"
        ),
        "ii_fuzzy_terms_d2": (
            f"SELECT DISTINCT term FROM ({_TOK}) "
            "WHERE levenshtein(term, 'tble') <= 2 ORDER BY term"
        ),
        "ii_fuzzy_values": (
            f"SELECT DISTINCT doc_id FROM ({_TOK}) WHERE term IN "
            f"(SELECT term FROM ({_TOK}) WHERE levenshtein(term, 'tble') <= 1) "
            "ORDER BY doc_id"
        ),
        "terms_within_window": (
            f"WITH t AS (SELECT doc_id, {_TOKS_SQL} AS t FROM documents), "
            "p AS (SELECT doc_id, unnest(t) AS term, generate_subscripts(t, 1) AS pos FROM t), "
            "s AS (SELECT a.doc_id, min(abs(a.pos - b.pos) + 1)::BIGINT AS min_span "
            f"FROM (SELECT doc_id, pos FROM p WHERE term = '{PHRASE[0]}') a "
            f"JOIN (SELECT doc_id, pos FROM p WHERE term = '{PHRASE[1]}') b USING (doc_id) "
            "GROUP BY a.doc_id) "
            "SELECT doc_id, min_span FROM s WHERE min_span <= 20 ORDER BY doc_id"
        ),
        "ii_read_terms_prefix": (
            f"SELECT DISTINCT term FROM ({_TOK}) WHERE term LIKE 's%' ORDER BY term"
        ),
        "ii_read_values_prefix": (
            f"SELECT DISTINCT doc_id FROM ({_TOK}) "
            "WHERE term LIKE 'sp%' AND doc_id BETWEEN 50 AND 300 ORDER BY doc_id"
        ),
        "dedup_clusters": (
            f"WITH RECURSIVE {_CLUSTER_CTES} "
            "SELECT n AS doc_id, l AS cluster_id FROM cl ORDER BY doc_id"
        ),
        "dedup_cluster_survivors": (
            f"WITH RECURSIVE {_CLUSTER_CTES} "
            "SELECT doc_id FROM documents WHERE doc_id NOT IN "
            "(SELECT n FROM cl WHERE n <> l) ORDER BY doc_id"
        ),
        "sample_stratified": (
            "SELECT doc_id, lang FROM documents "
            "WHERE (md5_number_upper('42:' || doc_id::VARCHAR)::HUGEINT "
            f"% 2147483648)::BIGINT < {_STRATA_CASE} ORDER BY doc_id"
        ),
        "pack_sequences": (
            f"WITH d AS (SELECT doc_id, len({_TOKS_SQL})::BIGINT AS dl FROM documents), "
            'o AS (SELECT doc_id, dl, coalesce(sum(dl) OVER (ORDER BY doc_id '
            'ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS "offset" FROM d) '
            f'SELECT doc_id, dl, "offset", "offset" // {PACK_BLOCK} AS first_block, '
            f'("offset" + greatest(dl, 1) - 1) // {PACK_BLOCK} AS last_block '
            "FROM o ORDER BY doc_id"
        ),
        "corpus_pipeline": _PIPELINE_SQL,
        "substring_grep": (
            "SELECT doc_id FROM documents "
            "WHERE contains(lower(text), 'spark merge') ORDER BY doc_id"
        ),
        "regex_grep": (
            "SELECT doc_id FROM documents "
            "WHERE regexp_matches(lower(text), 'spark merge|window .able') "
            "ORDER BY doc_id"
        ),
        "asof_click_view": (
            "WITH clicks AS (SELECT event_id, user_id, ts FROM events "
            "WHERE event_type = 'click'), "
            "views AS (SELECT user_id, ts AS vts, event_id AS view_id, "
            "value AS view_value FROM events WHERE event_type = 'view') "
            "SELECT c.event_id AS click_id, c.user_id, v.view_id, "
            "round(v.view_value, 6) AS view_value "
            "FROM clicks c LEFT JOIN LATERAL ("
            "SELECT view_id, view_value FROM views v "
            "WHERE v.user_id = c.user_id AND v.vts <= c.ts "
            "ORDER BY v.vts DESC, v.view_id DESC LIMIT 1) v ON TRUE "
            "ORDER BY click_id"
        ),
        "sessionize_events": (
            "WITH g AS (SELECT event_id, user_id, ts, "
            "CASE WHEN lag(ts) OVER w IS NULL OR "
            "(epoch_us(ts) - epoch_us(lag(ts) OVER w)) / 1000000.0 > 1800.0 "
            "THEN 1 ELSE 0 END AS isn FROM events "
            "WINDOW w AS (PARTITION BY user_id ORDER BY ts)), "
            "s AS (SELECT *, sum(isn) OVER (PARTITION BY user_id ORDER BY ts "
            "ROWS UNBOUNDED PRECEDING) - 1 AS sn FROM g) "
            "SELECT event_id, user_id, "
            "user_id::VARCHAR || '#' || sn::VARCHAR AS session_id, "
            "(row_number() OVER (PARTITION BY user_id, sn ORDER BY ts) - 1)"
            "::BIGINT AS session_seq FROM s ORDER BY event_id"
        ),
        "session_stats": (
            # session_window's end is EXCLUSIVE: an event exactly gap
            # after the last one starts a NEW session (>=, not >)
            "WITH g AS (SELECT user_id, ts, value, "
            "CASE WHEN lag(ts) OVER w IS NULL OR "
            "epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000 "
            "THEN 1 ELSE 0 END AS isn FROM events "
            "WINDOW w AS (PARTITION BY user_id ORDER BY ts)), "
            "s AS (SELECT *, sum(isn) OVER (PARTITION BY user_id ORDER BY ts "
            "ROWS UNBOUNDED PRECEDING) AS sn FROM g) "
            "SELECT user_id, min(epoch_us(ts)) AS start_us, "
            "max(epoch_us(ts)) + 1800000000 AS end_us, "
            "count(*) AS n_events, round(sum(value), 6) AS sum_value "
            "FROM s GROUP BY user_id, sn ORDER BY user_id, start_us"
        ),
        "turn_context": (
            "WITH corpus AS (SELECT l_orderkey AS conv, "
            "l_linenumber AS turn, l_orderkey * 8 + l_linenumber AS doc_id, "
            "l_quantity::DOUBLE AS qty FROM lineitem), "
            "hits AS (SELECT doc_id AS hit_id, conv AS g, turn AS o "
            "FROM corpus WHERE qty = 50 AND turn = 4 AND conv % 10 = 1) "
            "SELECT h.hit_id, c.conv, c.turn, c.doc_id, c.qty, "
            "(c.turn - h.o)::BIGINT AS \"offset\" FROM corpus c "
            "JOIN hits h ON c.conv = h.g "
            "AND c.turn BETWEEN h.o - 1 AND h.o + 1 "
            "ORDER BY hit_id, \"offset\""
        ),
        "ts_index_range": (
            "SELECT DISTINCT epoch_us(ts) AS ts_us FROM events "
            f"WHERE event_type IN ('{TS_TYPES[0]}', '{TS_TYPES[1]}') "
            f"AND epoch_us(ts) BETWEEN {TS_RANGE[0]} AND {TS_RANGE[1]} "
            "ORDER BY ts_us"
        ),
        "ngram_jaccard": (
            f"WITH sh AS ({_SHINGLES}) "
            "SELECT a.doc_id AS a, b.doc_id AS b, "
            "round(len(list_intersect(a.sh, b.sh))::DOUBLE "
            "/ len(list_distinct(a.sh || b.sh)), 6) AS jaccard "
            "FROM sh a JOIN sh b ON a.doc_id < b.doc_id "
            "WHERE len(list_intersect(a.sh, b.sh)) > 0"
        ),
        "search_after_page2": (
            "SELECT m.doc_id, round(coalesce(s.raw_score, 0), 4) AS score "
            "FROM (SELECT DISTINCT doc_id FROM "
            f"({_TOK}) WHERE term IN ('merge', 'spark')) m "
            f"LEFT JOIN ({_bm25_contrib_sql(['merge', 'spark'])}) s USING (doc_id) "
            "ORDER BY coalesce(s.raw_score, 0) DESC, m.doc_id ASC "
            "LIMIT 10 OFFSET 10"
        ),
        "facet_ranges": (
            "WITH m AS (SELECT n_chars::DOUBLE AS v FROM documents "
            "WHERE doc_id IN (SELECT DISTINCT doc_id FROM "
            f"({_TOK}) WHERE term IN ('merge', 'spark'))), "
            "r(range_name, ord, lo, hi) AS (VALUES "
            "('small', 0, NULL, 150.0), ('mid', 1, 150.0, 350.0), "
            "('big', 2, 350.0, NULL)) "
            "SELECT range_name, count(v) AS n_docs, min(v) AS min_v, "
            "max(v) AS max_v, round(avg(v), 4) AS avg_v "
            "FROM r LEFT JOIN m ON (lo IS NULL OR v >= lo) "
            "AND (hi IS NULL OR v < hi) "
            "GROUP BY range_name, ord ORDER BY ord"
        ),
        "filters_agg": (
            "WITH m AS (SELECT * FROM documents "
            "WHERE doc_id IN (SELECT DISTINCT doc_id FROM "
            f"({_TOK}) WHERE term IN ('merge', 'spark'))) "
            "SELECT bucket, n_docs FROM (VALUES "
            "('short', (SELECT count(*) FROM m WHERE n_chars < 200)), "
            "('en', (SELECT count(*) FROM m WHERE lang = 'en')), "
            "('long_zh', (SELECT count(*) FROM m "
            "WHERE n_chars >= 300 AND lang = 'zh')), "
            "('none', (SELECT count(*) FROM m WHERE n_chars < 0))"
            ") AS t(bucket, n_docs)"
        ),
        "facet_extended_stats": (
            "SELECT count(*) AS n_docs, min(v) AS min_v, max(v) AS max_v, "
            "round(sum(v), 4) AS sum_v, round(avg(v), 4) AS avg_v, "
            "round(sum(v * v), 4) AS sum_sq, "
            "round(var_pop(v), 4) AS variance, "
            "round(stddev_pop(v), 4) AS std_dev "
            "FROM (SELECT n_chars::DOUBLE AS v FROM documents "
            "WHERE doc_id IN (SELECT DISTINCT doc_id FROM "
            f"({_TOK}) WHERE term IN ('merge', 'spark')))"
        ),
        "facet_string_stats": (
            "WITH m AS (SELECT source AS s FROM documents "
            "WHERE doc_id IN (SELECT DISTINCT doc_id FROM "
            f"({_TOK}) WHERE term IN ('merge', 'spark'))), "
            "lens AS (SELECT count(*) AS n_docs, min(strlen(s)) AS min_len, "
            "max(strlen(s)) AS max_len, round(avg(strlen(s)), 4) AS avg_len "
            "FROM m), "
            "ch AS (SELECT unnest(string_split(s, '')) AS c FROM m), "
            "hist AS (SELECT c, count(*)::DOUBLE AS n FROM ch "
            "WHERE c <> '' GROUP BY c), "
            "ent AS (SELECT round(-sum(p * log2(p)), 4) AS entropy FROM "
            "(SELECT n / (SELECT sum(n) FROM hist) AS p FROM hist)) "
            "SELECT n_docs, min_len, max_len, avg_len, entropy "
            "FROM lens, ent"
        ),
        "terms_set": (
            f"SELECT doc_id, count(DISTINCT term) AS n_matched FROM ({_TOK}) "
            "WHERE term IN ('merge', 'spark', 'window') GROUP BY doc_id "
            "HAVING count(DISTINCT term) >= 2 ORDER BY doc_id"
        ),
        "term_range": (
            f"SELECT DISTINCT doc_id FROM ({_TOK}) "
            "WHERE term >= 'merge' AND term < 'spark' ORDER BY doc_id"
        ),
        "pinned_topk": (
            "WITH org AS (SELECT m.doc_id, coalesce(s.raw_score, 0) AS sc "
            "FROM (SELECT DISTINCT doc_id FROM "
            f"({_TOK}) WHERE term IN ('merge', 'spark')) m "
            f"LEFT JOIN ({_bm25_contrib_sql(['merge', 'spark'])}) s USING (doc_id) "
            "WHERE m.doc_id NOT IN (3, 7) "
            "ORDER BY sc DESC, m.doc_id ASC LIMIT 8) "
            "SELECT rank, doc_id, NULL::DOUBLE AS score, 1 AS is_pinned "
            "FROM (VALUES (1, 3::BIGINT), (2, 7::BIGINT)) h(rank, doc_id) "
            "UNION ALL "
            "SELECT (2 + row_number() OVER (ORDER BY sc DESC, doc_id ASC))"
            "::INTEGER AS rank, doc_id, round(sc, 4) AS score, "
            "0 AS is_pinned FROM org ORDER BY rank"
        ),
        "intervals_ordered": (
            f"WITH p AS (SELECT doc_id, unnest({_TOKS_SQL}) AS term, "
            f"generate_subscripts({_TOKS_SQL}, 1) AS pos FROM documents), "
            "a AS (SELECT doc_id, pos FROM p WHERE term = 'spark'), "
            "b AS (SELECT doc_id, pos FROM p WHERE term = 'merge') "
            "SELECT a.doc_id, min(b.pos - a.pos - 1)::BIGINT AS min_gaps "
            "FROM a JOIN b ON a.doc_id = b.doc_id AND b.pos > a.pos "
            "GROUP BY a.doc_id HAVING min(b.pos - a.pos - 1) <= 30 "
            "ORDER BY a.doc_id"
        ),
        "weighted_avg": (
            "WITH m AS (SELECT n_chars::DOUBLE AS v, "
            "(doc_id % 7 + 1)::DOUBLE AS w FROM documents "
            "WHERE doc_id IN (SELECT DISTINCT doc_id FROM "
            f"({_TOK}) WHERE term IN ('merge', 'spark'))) "
            "SELECT count(*) AS n_docs, "
            "round(sum(v * w) / sum(w), 4) AS weighted_avg, "
            "round(sum(w), 4) AS sum_weight FROM m"
        ),
        "facet_mad": (
            "WITH m AS (SELECT n_chars::DOUBLE AS v FROM documents "
            "WHERE doc_id IN (SELECT DISTINCT doc_id FROM "
            f"({_TOK}) WHERE term IN ('merge', 'spark'))), "
            "med AS (SELECT median(v) AS md FROM m) "
            "SELECT count(*) AS n_docs, "
            "round(median(abs(v - md)), 4) AS mad FROM m, med"
        ),
        "missing_agg": (
            "SELECT count(*) AS n_docs, "
            "sum(CASE WHEN doc_id % 7 = 0 THEN 1 ELSE 0 END)::BIGINT "
            "AS n_missing FROM documents WHERE doc_id IN ("
            "SELECT DISTINCT doc_id FROM "
            f"({_TOK}) WHERE term IN ('merge', 'spark'))"
        ),
        "boxplot": (
            "WITH m AS (SELECT n_chars::DOUBLE AS v FROM documents "
            "WHERE doc_id IN (SELECT DISTINCT doc_id FROM "
            f"({_TOK}) WHERE term IN ('merge', 'spark'))) "
            "SELECT count(*) AS n_docs, min(v) AS min_v, "
            "round(quantile_cont(v, 0.25), 4) AS q1, "
            "round(quantile_cont(v, 0.5), 4) AS q2, "
            "round(quantile_cont(v, 0.75), 4) AS q3, "
            "max(v) AS max_v FROM m"
        ),
        "top_metrics": (
            "SELECT doc_id, n_chars, lang FROM documents "
            "WHERE doc_id IN (SELECT DISTINCT doc_id FROM "
            f"({_TOK}) WHERE term IN ('merge', 'spark')) "
            "ORDER BY n_chars DESC, doc_id ASC LIMIT 5"
        ),
        "date_histogram_gapfill": (
            "WITH h AS (SELECT event_type, "
            "us - us % 21600000000 AS bucket_us, count(*) AS n, "
            "sum(value) AS sv FROM (SELECT event_type, epoch_us(ts) AS "
            "us, value FROM events) GROUP BY event_type, bucket_us), "
            "b AS (SELECT event_type, min(bucket_us) AS lo, "
            "max(bucket_us) AS hi FROM h GROUP BY event_type), "
            "f AS (SELECT event_type, "
            "unnest(generate_series(lo, hi, 21600000000)) AS bucket_us "
            "FROM b) "
            "SELECT f.event_type, f.bucket_us, coalesce(h.n, 0) AS n, "
            "round(coalesce(h.sv, 0), 4) AS sum_v FROM f "
            "LEFT JOIN h ON f.event_type = h.event_type "
            "AND f.bucket_us = h.bucket_us "
            "ORDER BY f.event_type, f.bucket_us"
        ),
        "percentile_ranks": (
            "WITH m AS (SELECT n_chars::DOUBLE AS v FROM documents "
            "WHERE doc_id IN (SELECT DISTINCT doc_id FROM "
            f"({_TOK}) WHERE term IN ('merge', 'spark'))) "
            "SELECT t.value, (SELECT count(*) FROM m) AS n_docs, "
            "round(100.0 * (SELECT count(*) FROM m WHERE v <= t.value) "
            "/ (SELECT count(*) FROM m), 4) AS pct_rank "
            "FROM (VALUES (200.0), (800.0), (5000.0)) AS t(value) "
            "ORDER BY t.value"
        ),
        "matrix_stats": (
            "WITH m AS (SELECT n_chars::DOUBLE AS x, "
            "(n_chars * 2 + doc_id % 97)::DOUBLE AS y FROM documents "
            "WHERE doc_id IN (SELECT DISTINCT doc_id FROM "
            f"({_TOK}) WHERE term IN ('merge', 'spark'))) "
            "SELECT 'n_chars' AS col_x, 'n_chars' AS col_y, "
            "count(*) AS n_docs, round(avg(x), 4) AS mean_x, "
            "round(avg(x), 4) AS mean_y, "
            "round(covar_samp(x, x), 4) AS covariance, "
            "round(corr(x, x), 4) AS correlation FROM m "
            "UNION ALL SELECT 'n_chars', 'y2', count(*), "
            "round(avg(x), 4), round(avg(y), 4), "
            "round(covar_samp(x, y), 4), round(corr(x, y), 4) FROM m "
            "UNION ALL SELECT 'y2', 'y2', count(*), "
            "round(avg(y), 4), round(avg(y), 4), "
            "round(covar_samp(y, y), 4), round(corr(y, y), 4) FROM m "
            "ORDER BY col_x, col_y"
        ),
        "rank_feature": (
            "SELECT doc_id, round(sc, 4) AS score FROM ("
            "SELECT s.doc_id, s.raw_score "
            "+ 2.0 * (d.n_chars::DOUBLE / (d.n_chars::DOUBLE + 256.0)) AS sc "
            f"FROM ({_bm25_contrib_sql(['merge', 'spark'])}) s "
            "JOIN documents d USING (doc_id)) "
            "ORDER BY sc DESC, doc_id ASC LIMIT 10"
        ),
        "sampler": (
            "SELECT m.doc_id, round(coalesce(s.raw_score, 0), 4) AS score "
            "FROM (SELECT DISTINCT doc_id FROM "
            f"({_TOK}) WHERE term IN ('merge', 'spark')) m "
            f"LEFT JOIN ({_bm25_contrib_sql(['merge', 'spark'])}) s USING (doc_id) "
            "ORDER BY coalesce(s.raw_score, 0) DESC, m.doc_id ASC LIMIT 10"
        ),
        "diversified_sampler": (
            "WITH ranked AS (SELECT m.doc_id, "
            "coalesce(s.raw_score, 0) AS sc, d.lang FROM "
            "(SELECT DISTINCT doc_id FROM "
            f"({_TOK}) WHERE term IN ('merge', 'spark')) m "
            f"LEFT JOIN ({_bm25_contrib_sql(['merge', 'spark'])}) s USING (doc_id) "
            "JOIN documents d USING (doc_id)), "
            "dv AS (SELECT doc_id, sc, row_number() OVER "
            "(PARTITION BY lang ORDER BY sc DESC, doc_id ASC) AS r "
            "FROM ranked) "
            "SELECT doc_id, round(sc, 4) AS score FROM dv WHERE r = 1 "
            "ORDER BY sc DESC, doc_id ASC LIMIT 5"
        ),
        "facet_stats": (
            "SELECT lang, count(*) AS n_docs, "
            "min(n_chars)::DOUBLE AS min_v, max(n_chars)::DOUBLE AS max_v, "
            "round(sum(n_chars)::DOUBLE, 4) AS sum_v, "
            "round(avg(n_chars::DOUBLE), 4) AS avg_v "
            "FROM documents WHERE doc_id IN (SELECT DISTINCT doc_id FROM "
            f"({_TOK}) WHERE term IN ('merge', 'spark')) "
            "GROUP BY lang ORDER BY lang"
        ),
        "synonym_topk": (
            f"WITH tf AS ({_TF}), dl AS ({_DL}), "
            "stats AS (SELECT (SELECT count(*) FROM documents)::DOUBLE AS n, "
            f"(SELECT sum(len({_TOKS_SQL})) FROM documents)::DOUBLE "
            "/ (SELECT count(*) FROM documents) AS avgdl), "
            "gmap AS (SELECT * FROM (VALUES ('spark', 0), ('merge', 1), "
            "('window', 1)) AS t(term, g)), "
            # tf has one row per (doc, term) -> count(*) = df
            "dfs AS (SELECT term, count(*) AS df FROM tf "
            "WHERE term IN ('spark', 'merge', 'window') GROUP BY term), "
            "gdf AS (SELECT g, max(df) AS df FROM dfs JOIN gmap USING (term) "
            "GROUP BY g), "
            "gtf AS (SELECT tf.doc_id, gmap.g, sum(tf.tf) AS tf FROM tf "
            "JOIN gmap USING (term) GROUP BY tf.doc_id, gmap.g), "
            "contrib AS (SELECT gtf.doc_id, "
            "ln((s.n - gdf.df + 0.5) / (gdf.df + 0.5) + 1.0) * gtf.tf "
            "/ (gtf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)) AS c "
            "FROM gtf JOIN gdf USING (g) JOIN dl ON dl.doc_id = gtf.doc_id "
            "CROSS JOIN stats s) "
            "SELECT doc_id, round(sum(c), 4) AS score FROM contrib "
            "GROUP BY doc_id ORDER BY sum(c) DESC, doc_id ASC LIMIT 10"
        ),
        "collapse_topk": (
            "SELECT doc_id, lang, round(score, 4) AS score FROM ("
            "SELECT m.doc_id, d.lang, coalesce(s.raw_score, 0) AS score, "
            "row_number() OVER (PARTITION BY d.lang "
            "ORDER BY coalesce(s.raw_score, 0) DESC, m.doc_id ASC) AS rn "
            "FROM (SELECT DISTINCT doc_id FROM "
            f"({_TOK}) WHERE term IN ('merge', 'spark')) m "
            f"LEFT JOIN ({_bm25_contrib_sql(['merge', 'spark'])}) s USING (doc_id) "
            "JOIN documents d ON d.doc_id = m.doc_id) "
            "WHERE rn = 1 ORDER BY score DESC, doc_id ASC LIMIT 5"
        ),
        "top_hits": (
            "WITH j AS (SELECT m.doc_id, d.lang, "
            "coalesce(s.raw_score, 0) AS score "
            "FROM (SELECT DISTINCT doc_id FROM "
            f"({_TOK}) WHERE term IN ('merge', 'spark')) m "
            f"LEFT JOIN ({_bm25_contrib_sql(['merge', 'spark'])}) s "
            "USING (doc_id) "
            "JOIN documents d ON d.doc_id = m.doc_id), "
            "b AS (SELECT lang, count(*) AS n_docs FROM j "
            "GROUP BY lang ORDER BY n_docs DESC, lang LIMIT 3) "
            "SELECT j.lang, b.n_docs, "
            "row_number() OVER (PARTITION BY j.lang "
            "ORDER BY j.score DESC, j.doc_id ASC) AS rank, "
            "j.doc_id, round(j.score, 4) AS score "
            "FROM j JOIN b ON b.lang = j.lang "
            "QUALIFY rank <= 2 ORDER BY b.n_docs DESC, j.lang, rank"
        ),
        "facet_histogram": (
            "SELECT floor(n_chars / 200.0) * 200.0 AS bucket, "
            "count(*) AS n_docs FROM documents "
            "WHERE doc_id IN (SELECT DISTINCT doc_id FROM "
            f"({_TOK}) WHERE term IN ('merge', 'spark')) "
            "GROUP BY bucket ORDER BY bucket"
        ),
        "facet_percentiles": (
            "SELECT lang, count(*) AS n_docs, "
            "round(quantile_cont(n_chars::DOUBLE, 0.5), 4) AS p50, "
            "round(quantile_cont(n_chars::DOUBLE, 0.9), 4) AS p90, "
            "round(quantile_cont(n_chars::DOUBLE, 0.99), 4) AS p99 "
            "FROM documents WHERE doc_id IN (SELECT DISTINCT doc_id FROM "
            f"({_TOK}) WHERE term IN ('merge', 'spark')) "
            "GROUP BY lang ORDER BY lang"
        ),
        "spell_suggest": (
            "SELECT term, df FROM (SELECT term, count(DISTINCT doc_id) AS df "
            f"FROM ({_TOK}) GROUP BY term) "
            "WHERE levenshtein(term, 'tble') <= 2 "
            "ORDER BY df DESC, term LIMIT 5"
        ),
        "ts_pipeline_aggs": (
            "WITH h AS (SELECT event_type, "
            f"epoch_us(ts) - epoch_us(ts) % {TS_BUCKET_US} AS bucket_us, "
            "count(*)::BIGINT AS n, sum(value) AS sum_v "
            "FROM events GROUP BY 1, 2), "
            "w AS (SELECT event_type, bucket_us, n, sum_v, "
            "n - lag(n) OVER pw AS n_deriv, "
            "(sum(n) OVER (PARTITION BY event_type ORDER BY bucket_us "
            "ROWS UNBOUNDED PRECEDING))::BIGINT AS n_cumsum, "
            "avg(sum_v) OVER (PARTITION BY event_type ORDER BY bucket_us "
            "ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS mov "
            "FROM h WINDOW pw AS (PARTITION BY event_type ORDER BY bucket_us)) "
            "SELECT event_type, bucket_us, n, round(sum_v, 6) AS sum_v, "
            "n_deriv, n_cumsum, round(mov, 6) AS mov_avg, "
            "round(sum_v / n, 6) AS avg_v "
            "FROM w WHERE n >= 5 ORDER BY event_type, bucket_us"
        ),
        "composite_page": (
            "SELECT event_type, user_id % 8 AS ub, count(*)::BIGINT AS n, "
            "round(sum(value), 6) AS sum_v FROM events "
            "GROUP BY event_type, ub "
            f"HAVING (event_type, user_id % 8) > "
            f"('{COMPOSITE_AFTER[0]}', {COMPOSITE_AFTER[1]}) "
            "ORDER BY event_type, ub LIMIT 12"
        ),
        "ts_date_histogram": (
            "SELECT us - us % " + str(TS_BUCKET_US) + " AS bucket_us, "
            "count(*) AS n FROM "
            "(SELECT DISTINCT epoch_us(ts) AS us FROM events "
            f"WHERE event_type IN ('{TS_TYPES[0]}', '{TS_TYPES[1]}') "
            f"AND epoch_us(ts) BETWEEN {TS_RANGE[0]} AND {TS_RANGE[1]}) "
            "GROUP BY bucket_us ORDER BY bucket_us"
        ),
        "contamination_overlap": (
            # token 3-grams, whole-doc shingle when < 3 tokens (the
            # engine's _shingles_col contract); bench = doc_id % 13 == 0
            r"WITH tok AS (SELECT doc_id, regexp_extract_all(lower(text), '\w+') AS t"
            " FROM documents), "
            "sh AS (SELECT doc_id, list_distinct("
            "CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')] "
            "ELSE list_transform(generate_series(1, len(t) - 2), "
            "i -> array_to_string(t[i:i+2], ' ')) END) AS g FROM tok), "
            "ex AS (SELECT doc_id, unnest(g) AS g FROM sh), "
            "bench AS (SELECT doc_id AS bench_id, g FROM ex "
            "WHERE doc_id % 13 = 0 AND g <> ''), "
            "train AS (SELECT doc_id, g FROM ex WHERE doc_id % 13 <> 0 AND g <> '') "
            "SELECT t.doc_id, count(DISTINCT t.g) AS n_hit_ngrams, "
            "count(DISTINCT b.bench_id) AS n_bench_docs "
            "FROM train t JOIN bench b USING (g) "
            "GROUP BY t.doc_id ORDER BY t.doc_id"
        ),
        "pii_scrub": (
            "WITH aug AS (SELECT doc_id, text || "
            "CASE WHEN doc_id % 3 = 0 THEN ' contact user' || doc_id || '@example.com' "
            "WHEN doc_id % 3 = 1 THEN ' host 10.0.' || (doc_id % 256) || '.' || (doc_id % 100) "
            "ELSE ' call +1-555-' || lpad((doc_id % 10000)::VARCHAR, 4, '0') END AS t "
            "FROM documents WHERE doc_id < 300) "
            "SELECT doc_id, "
            f"len(regexp_extract_all(t, '{_PII_EMAIL}')) AS n_emails, "
            f"len(regexp_extract_all(regexp_replace(t, '{_PII_EMAIL}', '<EMAIL>', 'g'),"
            f" '{_PII_IP}')) AS n_ips, "
            f"len(regexp_extract_all(regexp_replace(regexp_replace(t, '{_PII_EMAIL}',"
            f" '<EMAIL>', 'g'), '{_PII_IP}', '<IP>', 'g'), '{_PII_PHONE}')) AS n_phones, "
            f"regexp_replace(regexp_replace(regexp_replace(t, '{_PII_EMAIL}', '<EMAIL>',"
            f" 'g'), '{_PII_IP}', '<IP>', 'g'), '{_PII_PHONE}', '<PHONE>', 'g') AS scrubbed "
            "FROM aug ORDER BY doc_id"
        ),
        "embed_kmeans_assign": (
            # squared-L2 argmin over the 8 smallest-id centroids; the
            # engine folds (a-b)^2 left in element order in float64 —
            # list_sum over the same float64 terms agrees far beyond
            # the round-4 output precision
            "WITH c AS (SELECT vec_id AS cid, embedding AS ce FROM embeddings"
            " WHERE vec_id < 8), "
            "d AS (SELECT e.vec_id, c.cid, "
            "list_sum(list_transform(generate_series(1, len(e.embedding)), "
            "i -> (e.embedding[i]::DOUBLE - c.ce[i]::DOUBLE)"
            " * (e.embedding[i]::DOUBLE - c.ce[i]::DOUBLE))) AS dist "
            "FROM embeddings e CROSS JOIN c), "
            "r AS (SELECT vec_id, cid, dist, "
            "row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn FROM d) "
            "SELECT vec_id, cid::INT AS cluster, round(dist, 4) AS dist "
            "FROM r WHERE rn = 1 ORDER BY vec_id"
        ),
        "boosted_topk": (
            # match set = AND of the three terms; score = boosted BM25
            "SELECT doc_id, round(raw_score, 4) AS score FROM ("
            f"{_bm25_weighted_contrib_sql({'spark': 2.0, 'merge': 1.0, 'window': 0.5})}"
            ") WHERE doc_id IN ("
            f"SELECT doc_id FROM ({_TOK}) WHERE term = 'spark' "
            f"INTERSECT SELECT doc_id FROM ({_TOK}) WHERE term = 'merge' "
            f"INTERSECT SELECT doc_id FROM ({_TOK}) WHERE term = 'window') "
            "ORDER BY raw_score DESC, doc_id ASC LIMIT 10"
        ),
        "msm_values": (
            "SELECT doc_id FROM ("
            f"SELECT doc_id, count(DISTINCT term) AS nmatched FROM ({_TOK}) "
            f"WHERE term IN {_QTERMS} GROUP BY doc_id) "
            "WHERE nmatched >= 2 ORDER BY doc_id"
        ),
        "significant_terms": (
            # JLH vs the whole-corpus background, fg floor 3, top 10
            "WITH td AS (SELECT DISTINCT doc_id, term FROM ("
            f"{_TOK})), "
            "m AS (SELECT doc_id, 1 AS _m FROM ("
            "SELECT doc_id FROM td WHERE term = 'spark' "
            "INTERSECT SELECT doc_id FROM td WHERE term = 'merge')), "
            "tot AS (SELECT (SELECT count(*) FROM documents)::DOUBLE AS n, "
            "(SELECT count(*) FROM m)::DOUBLE AS f), "
            "c AS (SELECT td.term, count(*) AS bg_df, count(m._m) AS fg_df "
            "FROM td LEFT JOIN m USING (doc_id) GROUP BY td.term) "
            "SELECT term, fg_df, bg_df, round(score, 6) AS score FROM ("
            "SELECT term, fg_df, bg_df, "
            "(fg_df / t.f - bg_df / t.n) * ((fg_df / t.f) / (bg_df / t.n)) AS score "
            "FROM c CROSS JOIN tot t WHERE fg_df >= 3) "
            "ORDER BY score DESC, term ASC LIMIT 10"
        ),
        "term_vectors": (
            f"SELECT doc_id, term, tf FROM ({_TF}) "
            "WHERE doc_id IN (3, 7, 11) ORDER BY doc_id, term"
        ),
        "bm25_explain": (
            f"WITH tf AS ({_TF}), dl AS ({_DL}), "
            "stats AS (SELECT (SELECT count(*) FROM documents)::DOUBLE AS n, "
            f"(SELECT sum(len({_TOKS_SQL})) FROM documents)::DOUBLE "
            "/ (SELECT count(*) FROM documents) AS avgdl), "
            "dfq AS (SELECT term, count(*) AS df FROM tf "
            f"WHERE term IN {_QTERMS} GROUP BY term) "
            "SELECT tf.doc_id, tf.term, tf.tf, dl.dl, dfq.df, "
            "round(ln((s.n - dfq.df + 0.5) / (dfq.df + 0.5) + 1.0), 6) AS idf, "
            "1.0::DOUBLE AS boost, "
            "round(tf.tf / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)), 6)"
            " AS tf_norm, "
            "round((1.0::DOUBLE * ln((s.n - dfq.df + 0.5) / (dfq.df + 0.5) + 1.0))"
            " * (tf.tf / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl))), 6)"
            " AS contribution "
            "FROM tf JOIN dfq USING (term) JOIN dl USING (doc_id) "
            f"CROSS JOIN stats s WHERE tf.term IN {_QTERMS} "
            "AND tf.doc_id BETWEEN 0 AND 49 ORDER BY doc_id, term"
        ),
        "facet_cardinality": (
            "SELECT count(DISTINCT lang) AS cardinality FROM documents "
            "WHERE doc_id IN ("
            f"SELECT doc_id FROM ({_TOK}) WHERE term IN ('spark', 'merge'))"
        ),
        "dismax_topk": (
            # per-field INDEPENDENT BM25 (field-local stats), then
            # max + 0.3*(sum-max); meta field boosted 2x before the max
            "WITH bf AS ("
            f"{_bm25_contrib_sql(_BM25F_TERMS)}"
            "), mf AS ("
            f"{_bm25_contrib_sql(_BM25F_TERMS, src=_META_SRC)}"
            "), u AS ("
            "SELECT doc_id, raw_score AS s FROM bf "
            "UNION ALL SELECT doc_id, raw_score * 2.0::DOUBLE AS s FROM mf), "
            "g AS (SELECT doc_id, max(s) AS mx, sum(s) AS sm FROM u "
            "GROUP BY doc_id) "
            "SELECT doc_id, round(mx + 0.3 * (sm - mx), 4) AS score FROM g "
            "ORDER BY mx + 0.3 * (sm - mx) DESC, doc_id ASC LIMIT 10"
        ),
        "wildcard_values": (
            f"SELECT DISTINCT doc_id FROM ({_TOK}) "
            "WHERE regexp_full_match(term, 'w.ndow') "
            "OR regexp_full_match(term, 'sp.*rk') ORDER BY doc_id"
        ),
        "percolate_queries": _PERCOLATE_SQL,
        # the stream entry unions per-micro-batch percolations over the
        # same table — identical result set, identical twin
        "stream_percolate": _PERCOLATE_SQL,
        "rescore_topk": (
            "WITH orig AS (SELECT doc_id, raw_score FROM ("
            f"{_bm25_contrib_sql(PHRASE)}"
            ") ORDER BY raw_score DESC, doc_id ASC LIMIT 100), "
            "phs AS (SELECT doc_id, raw_score AS p FROM ("
            f"{_bm25_contrib_sql(PHRASE)}"
            f") WHERE doc_id IN (SELECT doc_id FROM ({_PHRASE_SQL}))) "
            "SELECT doc_id, round(1.0::DOUBLE * raw_score"
            " + 2.0::DOUBLE * coalesce(p, 0.0), 4) AS score "
            "FROM orig LEFT JOIN phs USING (doc_id) "
            "ORDER BY 1.0::DOUBLE * raw_score"
            " + 2.0::DOUBLE * coalesce(p, 0.0) DESC, doc_id ASC LIMIT 10"
        ),
        "complete_terms": (
            "SELECT term, df FROM ("
            f"SELECT term, count(DISTINCT doc_id) AS df FROM ({_TOK}) "
            "WHERE term LIKE 's%' GROUP BY term) "
            "ORDER BY df DESC, term ASC LIMIT 10"
        ),
        "unigram_loglik": (
            f"WITH tf AS ({_TF}), dl AS ({_DL}), "
            "ctf AS (SELECT term, sum(tf) AS ctf FROM tf GROUP BY term), "
            "tot AS (SELECT sum(tf)::DOUBLE AS T FROM tf) "
            "SELECT tf.doc_id, dl.dl, "
            "round(sum(tf.tf * ln(ctf.ctf / t.T)) / dl.dl, 6) AS avg_loglik "
            "FROM tf JOIN ctf USING (term) JOIN dl USING (doc_id) "
            "CROSS JOIN tot t GROUP BY tf.doc_id, dl.dl ORDER BY tf.doc_id"
        ),
    }
    oracles["lm_perplexity"] = (
        "WITH toks AS (SELECT doc_id, regexp_extract_all(lower(text), '\\w+') AS t "
        "FROM documents), "
        "bg AS (SELECT doc_id, t[i] AS w1, t[i+1] AS w2 FROM "
        "(SELECT doc_id, t, unnest(generate_series(1, len(t) - 1)) AS i "
        "FROM toks WHERE len(t) >= 2)), "
        "c12 AS (SELECT w1, w2, count(*)::DOUBLE AS c FROM bg GROUP BY w1, w2), "
        "c1 AS (SELECT w1, count(*)::DOUBLE AS c FROM bg GROUP BY w1), "
        "v AS (SELECT count(DISTINCT w)::DOUBLE AS v "
        "FROM (SELECT unnest(t) AS w FROM toks)), "
        "scored AS (SELECT bg.doc_id, "
        "ln((c12.c + 0.1) / (c1.c + 0.1 * v.v)) AS lp "
        "FROM bg JOIN c12 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN v) "
        "SELECT doc_id, count(*)::BIGINT AS n_bigrams, "
        "round(-avg(lp), 6) AS avg_nll, round(exp(-avg(lp)), 6) AS ppl "
        "FROM scored GROUP BY doc_id ORDER BY doc_id"
    )
    oracles["phrase_suggest"] = (
        f"WITH toks AS (SELECT doc_id, {_TOKS_SQL} AS t FROM documents), "
        "tok AS (SELECT doc_id, t[i] AS w, i FROM "
        "(SELECT doc_id, t, unnest(generate_series(1, len(t))) AS i FROM toks)), "
        "ctf AS (SELECT w, count(*)::DOUBLE AS c FROM tok GROUP BY w), "
        "v AS (SELECT count(*)::DOUBLE AS v FROM ctf), "
        "adj AS (SELECT a.w AS w1, b.w AS w2, count(*)::DOUBLE AS c "
        "FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.i = a.i + 1 "
        "GROUP BY a.w, b.w), "
        "c1 AS (SELECT w, c FROM ctf WHERE levenshtein(w, 'srow') <= 1 "
        "ORDER BY c DESC, w LIMIT 5), "
        "c2 AS (SELECT w, c FROM ctf WHERE levenshtein(w, 'hask') <= 1 "
        "ORDER BY c DESC, w LIMIT 5) "
        "SELECT c1.w || ' ' || c2.w AS suggestion, "
        "round(ln((coalesce(adj.c, 0) + 0.1) / (c1.c + 0.1 * v.v)) "
        "- (levenshtein('srow', c1.w) + levenshtein('hask', c2.w)), 6) AS score "
        "FROM c1 CROSS JOIN c2 CROSS JOIN v "
        "LEFT JOIN adj ON adj.w1 = c1.w AND adj.w2 = c2.w "
        "ORDER BY score DESC, suggestion LIMIT 3"
    )
    oracles["turn_context"] = (
        "WITH c AS (SELECT l_orderkey AS conv, l_linenumber AS turn, "
        "l_orderkey * 8 + l_linenumber AS doc_id, l_quantity::DOUBLE AS qty "
        "FROM lineitem), "
        "h AS (SELECT doc_id AS hit_id, conv, turn AS hturn FROM c "
        "WHERE qty = 50 AND turn = 4 AND conv % 10 = 1) "
        "SELECT h.hit_id, c.conv, c.turn, c.doc_id, c.qty, "
        "(c.turn - h.hturn)::BIGINT AS \"offset\" "
        "FROM c JOIN h ON c.conv = h.conv "
        "AND c.turn BETWEEN h.hturn - 1 AND h.hturn + 1 "
        "ORDER BY hit_id, \"offset\""
    )
    oracles["asof_click_view"] = (
        "SELECT c.event_id AS click_id, c.user_id, v.view_id, "
        "round(v.view_value, 6) AS view_value "
        "FROM events c LEFT JOIN LATERAL ("
        "SELECT e.event_id AS view_id, e.value AS view_value FROM events e "
        "WHERE e.user_id = c.user_id AND e.event_type = 'view' "
        "AND e.ts <= c.ts ORDER BY e.ts DESC, e.event_id DESC LIMIT 1"
        ") v ON true "
        "WHERE c.event_type = 'click' ORDER BY click_id"
    )
    oracles["sessionize_events"] = (
        "WITH o AS (SELECT event_id, user_id, ts, "
        "CASE WHEN lag(ts) OVER w IS NULL "
        "OR (epoch_us(ts) - epoch_us(lag(ts) OVER w)) / 1000000.0 > 1800.0 "
        "THEN 1 ELSE 0 END AS brk FROM events "
        "WINDOW w AS (PARTITION BY user_id ORDER BY ts)), "
        "s AS (SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts "
        "ROWS UNBOUNDED PRECEDING) - 1 AS sn FROM o) "
        "SELECT event_id, user_id, "
        "user_id::VARCHAR || '#' || sn::VARCHAR AS session_id, "
        "(row_number() OVER (PARTITION BY user_id, sn ORDER BY ts) - 1)::BIGINT "
        "AS session_seq FROM s ORDER BY event_id"
    )
    # session_window splits at diff >= gap (exclusive window end),
    # unlike sessionize's strict > — the twin mirrors that
    oracles["session_stats"] = (
        "WITH o AS (SELECT user_id, ts, value, "
        "CASE WHEN lag(ts) OVER w IS NULL "
        "OR (epoch_us(ts) - epoch_us(lag(ts) OVER w)) / 1000000.0 >= 1800.0 "
        "THEN 1 ELSE 0 END AS brk FROM events "
        "WINDOW w AS (PARTITION BY user_id ORDER BY ts)), "
        "s AS (SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts "
        "ROWS UNBOUNDED PRECEDING) AS sn FROM o) "
        "SELECT user_id, epoch_us(min(ts)) AS start_us, "
        "epoch_us(max(ts)) + 1800000000 AS end_us, "
        "count(*)::BIGINT AS n_events, round(sum(value), 6) AS sum_value "
        "FROM s GROUP BY user_id, sn ORDER BY user_id, start_us"
    )
    # streamed percolation over the whole table equals batch
    # percolation — the SQL twin is identical by construction
    oracles["stream_percolate"] = oracles["percolate_queries"]
    return oracles
