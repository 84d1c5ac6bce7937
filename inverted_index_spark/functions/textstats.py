"""Text-analysis operators for training-data pipelines (task rubric):
language-ID heuristic, quality scoring, token counting, document
fingerprinting. All pure built-in column expressions — JVM-side,
whole-stage-codegen'd, no Python in the hot path — and each has an
ANSI-SQL twin in __spark_entry__.oracle_sql for the DuckDB gate.

ASCII ``\\w+`` tokenization is used here (Java regex and RE2 agree on
it); the index tokenizer (functions.tokenizer) stays the pinned
Unicode contract — these stats are pipeline features, not index terms.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TOKEN_RE = r"\w+"
# BPE-ish pre-tokenizer: letter runs | digit runs | non-space punct runs
BPE_RE = r"[a-z]+|[0-9]+|[^a-z0-9\s]+"

STOPWORDS = ["the", "a", "an", "and", "of", "to", "in", "is", "it", "for"]

LANG_MARKERS: dict[str, list[str]] = {
    "de": ["der", "die", "das", "und", "ist", "nicht"],
    "en": ["the", "a", "and", "of", "is", "to"],
    "es": ["el", "la", "los", "las", "es", "y"],
    "fr": ["le", "la", "les", "est", "et", "une"],
}


def tokens_col(text: Column) -> Column:
    # idx=0 → whole match (the default expects a capture group)
    return F.regexp_extract_all(F.lower(text), F.lit(TOKEN_RE), 0)


def token_counts(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, n_tokens, n_bpe_tokens, n_chars) — whitespace-word and
    BPE-ish-regex token counts."""
    toks = tokens_col(F.col(text_col))
    bpe = F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(BPE_RE), 0)
    return docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.size(toks).alias("n_tokens"),
        F.size(bpe).alias("n_bpe_tokens"),
        F.length(F.col(text_col)).cast("long").alias("n_chars"),
    )


def quality_scores(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, n_tokens, avg_token_len, stopword_ratio, distinct_ratio)
    — cheap quality features; each doubles as a filter predicate at
    scale (pushed to the scan when used in where())."""
    d = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        tokens_col(F.col(text_col)).alias("toks"),
    )
    n = F.size("toks")
    sum_len = F.aggregate("toks", F.lit(0), lambda acc, x: acc + F.length(x))
    n_stop = F.size(F.filter("toks", lambda x: x.isin(STOPWORDS)))
    n_distinct = F.size(F.array_distinct("toks"))
    return d.select(
        "doc_id",
        n.alias("n_tokens"),
        F.when(n > 0, sum_len.cast("double") / n).otherwise(F.lit(0.0)).alias("avg_token_len"),
        F.when(n > 0, n_stop.cast("double") / n).otherwise(F.lit(0.0)).alias("stopword_ratio"),
        F.when(n > 0, n_distinct.cast("double") / n).otherwise(F.lit(0.0)).alias("distinct_ratio"),
    )


def lang_id(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, pred_lang) — marker-token voting, ties broken by lang
    code ascending, no markers → 'und'. A deterministic stand-in for a
    real n-gram model; parity with the SQL oracle is the contract."""
    d = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        tokens_col(F.col(text_col)).alias("toks"),
    )
    # distinct-marker voting via array_intersect (set semantics — the
    # DuckDB twin is list_intersect); avoids nested lambda filters,
    # whose variable naming collides with the when-chain below
    scored = d.select(
        "doc_id",
        *[
            F.size(
                F.array_intersect("toks", F.array(*[F.lit(w) for w in markers]))
            ).alias(f"s_{lang}")
            for lang, markers in sorted(LANG_MARKERS.items())
        ],
    )
    best = F.greatest(*[F.col(f"s_{lang}") for lang in sorted(LANG_MARKERS)])
    pred = F.when(best == 0, F.lit("und"))
    for lang in sorted(LANG_MARKERS):  # ascending → first max wins ties
        pred = pred.when(F.col(f"s_{lang}") == best, F.lit(lang))
    return scored.select("doc_id", pred.alias("pred_lang"))


def fingerprints(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, fp) — md5 over the normalized token stream: equal for
    docs that differ only in case/punctuation/whitespace (the exact-dup
    canonical key)."""
    return docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.md5(F.concat_ws(" ", tokens_col(F.col(text_col)))).alias("fp"),
    )


# ------------------------------------------------- Gopher repetition rules ---


def _gram_rows(d: DataFrame, n: int) -> DataFrame:
    """Explode word n-grams: (doc_id, gram, chars) where chars counts
    the gram's word characters (spaces excluded) — the Gopher
    'fraction of characters' denominators count word chars."""
    toks = F.col("toks")
    grams = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - F.lit(n - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return d.select(
        "doc_id", F.explode(grams).alias("gram")
    ).withColumn("chars", F.length("gram") - F.lit(n - 1))


def repetition_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_ns: tuple = (2, 3),
    dup_ns: tuple = (5,),
) -> DataFrame:
    """Gopher-style repetition/quality signals (Rae et al. 2021,
    Table A1; the datatrove/NeMo-Curator formulation for duplicated
    n-grams): per doc —

      n_words, n_lines
      dup_line_frac        fraction of lines that repeat an earlier line
      top_{n}gram_char_frac   chars of the SINGLE most frequent word
                              n-gram (count x gram word-chars) / word chars
      dup_{n}gram_char_frac   chars inside n-grams occurring >1 time
                              (sum count x word-chars over such grams)
                              / word chars — the standard
                              overlap-ignoring approximation
      symbol_word_ratio    '#' + '...' + unicode-ellipsis occurrences / words
      alpha_word_frac      fraction of words containing a letter

    Line stats are in-row set expressions; n-gram modes explode to
    (doc, gram) rows and aggregate — one shuffle keyed by doc_id, no
    quadratic in-row scan, so 100k-word docs cost O(words) not
    O(words^2). Word = ``\\w+`` run (the module contract).
    """
    text = F.col(text_col)
    n_words = F.size("toks")
    word_chars = F.aggregate(
        "toks", F.lit(0), lambda acc, x: acc + F.length(x)
    ).cast("double")
    n_alpha = F.size(F.filter("toks", lambda x: x.rlike("[a-z]")))

    d = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        tokens_col(text).alias("toks"),
        F.split(text, "\n").alias("lines"),
        F.size(F.regexp_extract_all(text, F.lit(r"#|\.\.\.|…"), 0))
        .cast("double")
        .alias("_n_sym"),
    ).select(
        "doc_id",
        "toks",
        n_words.alias("n_words"),
        word_chars.alias("word_chars"),
        F.size("lines").cast("long").alias("n_lines"),
        (
            (F.size("lines") - F.size(F.array_distinct("lines")))
            .cast("double")
            / F.size("lines")
        ).alias("dup_line_frac"),
        F.when(n_words > 0, F.col("_n_sym") / n_words)
        .otherwise(F.lit(0.0))
        .alias("symbol_word_ratio"),
        F.when(n_words > 0, n_alpha.cast("double") / n_words)
        .otherwise(F.lit(0.0))
        .alias("alpha_word_frac"),
    )
    # NOT persisted: the returned plan is lazy and references `d` from
    # ~6 branches, so a persist here could never be unpersisted inside
    # this function — repeated calls (CLI quality, streaming batches)
    # would leak one corpus-sized cache per call for the session's
    # lifetime. The recompute is the in-row tokenize, cheap next to the
    # per-branch gram shuffles; callers looping over many outputs can
    # persist/unpersist the INPUT docs around the materialization.
    out = d.select(
        "doc_id",
        "n_words",
        "n_lines",
        "dup_line_frac",
        "symbol_word_ratio",
        "alpha_word_frac",
    )
    for n in top_ns:
        agg = (
            _gram_rows(d, n)
            .groupBy("doc_id", "gram")
            .agg(F.count("*").alias("cnt"), F.first("chars").alias("chars"))
            .groupBy("doc_id")
            .agg(F.max(F.col("cnt") * F.col("chars")).alias("_top"))
        )
        out = (
            out.join(agg, "doc_id", "left")
            .join(d.select("doc_id", "word_chars"), "doc_id")
            .withColumn(
                f"top_{n}gram_char_frac",
                F.when(
                    F.col("word_chars") > 0,
                    F.coalesce(F.col("_top"), F.lit(0)).cast("double")
                    / F.col("word_chars"),
                ).otherwise(F.lit(0.0)),
            )
            .drop("_top", "word_chars")
        )
    for n in dup_ns:
        agg = (
            _gram_rows(d, n)
            .groupBy("doc_id", "gram")
            .agg(F.count("*").alias("cnt"), F.first("chars").alias("chars"))
            .where(F.col("cnt") > 1)
            .groupBy("doc_id")
            .agg(F.sum(F.col("cnt") * F.col("chars")).alias("_dup"))
        )
        out = (
            out.join(agg, "doc_id", "left")
            .join(d.select("doc_id", "word_chars"), "doc_id")
            .withColumn(
                f"dup_{n}gram_char_frac",
                F.when(
                    F.col("word_chars") > 0,
                    F.coalesce(F.col("_dup"), F.lit(0)).cast("double")
                    / F.col("word_chars"),
                ).otherwise(F.lit(0.0)),
            )
            .drop("_dup", "word_chars")
        )
    return out


GOPHER_DEFAULTS = {
    "min_words": 50,
    "max_words": 100_000,
    "max_symbol_word_ratio": 0.1,
    "min_alpha_word_frac": 0.8,
    "max_dup_line_frac": 0.3,
    "max_top_2gram_char_frac": 0.2,
    "max_top_3gram_char_frac": 0.18,
    "max_dup_5gram_char_frac": 0.15,
}


def gopher_filter(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    **overrides,
) -> DataFrame:
    """(doc_id, keep, <signals>) — the Gopher curation verdict per doc
    under ``GOPHER_DEFAULTS`` (override any threshold by keyword).
    Filter with ``.where('keep')``; the signals stay for audit."""
    th = {**GOPHER_DEFAULTS, **overrides}
    unknown = set(overrides) - set(GOPHER_DEFAULTS)
    if unknown:
        raise ValueError(f"unknown gopher thresholds: {sorted(unknown)}")
    s = repetition_stats(docs, id_col, text_col)
    keep = (
        (F.col("n_words") >= th["min_words"])
        & (F.col("n_words") <= th["max_words"])
        & (F.col("symbol_word_ratio") <= th["max_symbol_word_ratio"])
        & (F.col("alpha_word_frac") >= th["min_alpha_word_frac"])
        & (F.col("dup_line_frac") <= th["max_dup_line_frac"])
        & (F.col("top_2gram_char_frac") <= th["max_top_2gram_char_frac"])
        & (F.col("top_3gram_char_frac") <= th["max_top_3gram_char_frac"])
        & (F.col("dup_5gram_char_frac") <= th["max_dup_5gram_char_frac"])
    )
    return s.select("doc_id", keep.alias("keep"), *[c for c in s.columns if c != "doc_id"])


# ------------------------------------------- CCNet-style bigram LM filter ---


def bigram_perplexity(
    docs: DataFrame,
    train_docs: DataFrame | None = None,
    alpha: float = 0.1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-doc bigram-LM perplexity — the CCNet-style quality filter
    (CCNet trains a 5-gram KenLM on clean text and buckets the corpus
    by perplexity; a bigram model is the honest no-external-deps
    version). Train on ``train_docs`` (a clean subset) or, when None,
    on ``docs`` itself (self-perplexity: boilerplate and gibberish
    both sit in the tail).

        p(w2|w1) = (c(w1,w2) + α) / (c(w1·) + α·V)     add-α smoothing
        nll(d)   = -mean over d's bigrams of ln p
        ppl(d)   = exp(nll)

    V counts distinct TRAINING tokens (unigram vocabulary); unseen
    events back off to the additive floor via left joins. Docs with
    fewer than 2 tokens have no bigrams and are omitted.

    Scale shape: bigrams explode in-row (arrays_zip of two shifted
    slices — JVM codegen, no Python); c(w1,w2) is one map-side-partial
    groupBy; c(w1·) is vocabulary-sized and broadcast; the scoring
    join shuffles on (w1, w2) where AQE handles the Zipf skew. Nothing
    driver-sized except the two scalars (V, α).
    """
    base = train_docs if train_docs is not None else docs

    def _tokenized(d: DataFrame) -> DataFrame:
        return d.select(
            F.col(id_col).cast("long").alias("doc_id"),
            tokens_col(F.col(text_col)).alias("_t"),
        )

    def _bigrams(d: DataFrame) -> DataFrame:
        toks = F.col("_t")
        pairs = F.arrays_zip(
            F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
            F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        )
        return d.select("doc_id", F.explode(pairs).alias("bg")).select(
            "doc_id", F.col("bg.0").alias("w1"), F.col("bg.1").alias("w2")
        )

    # the training scan feeds FOUR consumers (c12, c1, vocab, and the
    # self-train score side) — tokenize once and truncate lineage so
    # the regexp+explode runs a single pass, not per consumer
    tokd = _tokenized(base).localCheckpoint()
    train_bg = _bigrams(tokd)
    c12 = train_bg.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    c1 = train_bg.groupBy("w1").agg(F.count("*").alias("c1"))
    vocab = (
        tokd.select(F.explode("_t").alias("w"))
        .agg(F.countDistinct("w"))
        .collect()[0][0]
    )
    if not vocab:
        return docs.sparkSession.createDataFrame(
            [], "doc_id long, n_bigrams long, avg_nll double, ppl double"
        )
    score_bg = _bigrams(_tokenized(docs)) if train_docs is not None else train_bg
    lp = (
        score_bg.join(c12, ["w1", "w2"], "left")
        .join(F.broadcast(c1), ["w1"], "left")
        .select(
            "doc_id",
            F.log(
                (F.coalesce(F.col("c12"), F.lit(0)) + F.lit(float(alpha)))
                / (
                    F.coalesce(F.col("c1"), F.lit(0))
                    + F.lit(float(alpha)) * F.lit(float(vocab))
                )
            ).alias("lp"),
        )
    )
    return (
        lp.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            (-F.avg("lp")).alias("avg_nll"),
        )
        .withColumn("ppl", F.exp("avg_nll"))
        .orderBy("doc_id")
    )
