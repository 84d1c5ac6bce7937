"""Distributed BPE (byte-pair-encoding) vocabulary learning + corpus
encoding — the canonical LLM-tokenizer pipeline op (Sennrich, Haddow &
Birch, ACL 2016), re-expressed Spark-first.

Learning is inherently sequential in the MERGE dimension (merge i+1's
pair counts depend on merge i), but each iteration is fully
distributed and tiny in driver state:

  word table   W(sym: array<string>, n: long) — one row per DISTINCT
               word with its corpus count. At 100 TB the distinct-word
               table is billions of rows, so it stays a DataFrame; the
               corpus itself is touched exactly once (word_counts).
  count step   explode adjacent symbol pairs → groupBy(pair).sum(n)
               → the argmax pair is ONE collected row (ties pinned:
               count DESC, pair ASC).
  merge step   a pure-JVM left-to-right fold (F.aggregate) rewrites
               each symbol array, merging non-overlapping occurrences
               leftmost-first — exactly the reference algorithm's
               scan. No Python in the loop.
  lineage      the word table is re-persisted per iteration and
               localCheckpoint'd every CHECKPOINT_EVERY merges (same
               iterative-dataflow hygiene as operators/clustering.py).

Driver-side state is the merge list only (n_merges pairs).

Encoding applies the learned merges to the DISTINCT-word dictionary
once (same fold, merge by merge), then rebuilds per-doc piece
sequences with one posexplode + dictionary join + one groupBy(doc_id)
re-assembly — the corpus never re-tokenizes per merge. Output pieces
are in document order.

The pytest oracle is a scalar reference implementation
(:func:`learn_bpe_py` / :func:`encode_word_py`); the driver entry
self-checks against it in-entry (the same pattern as
transcripts_bm25 — learning is iterative-argmax and has no SQL twin).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from inverted_index_spark.functions.tokenizer import tokenize_text, tokens_expr

EOW = "</w>"  # end-of-word marker (outside the pinned token alphabet)
CHECKPOINT_EVERY = 10
# beyond this many merges the encode cascade leaves JVM expressions
# (nesting thousands of folds would blow codegen) for an Arrow-batched
# rank-based kernel over the dictionary — see encode_bpe
MAX_EXPR_MERGES = 64


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, n) over the corpus — the ONLY corpus-sized pass in BPE
    learning; everything after runs on the distinct-word table."""
    return (
        docs.select(F.explode(tokens_expr(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )


def _initial_symbols(word: Column) -> Column:
    """word → [c, h, a, r, s, </w>]."""
    chars = F.filter(F.split(word, ""), lambda c: c != F.lit(""))
    return F.concat(chars, F.array(F.lit(EOW)))


def _merge_expr(sym: Column, a: str, b: str) -> Column:
    """Left-to-right non-overlapping merge of adjacent (a, b) → a+b —
    the reference algorithm's scan as one JVM fold. A freshly merged
    element never re-merges with the next symbol (it equals a+b, not
    a), which reproduces leftmost-first semantics on runs like aaa."""
    la, lb, lab = F.lit(a), F.lit(b), F.lit(a + b)
    return F.aggregate(
        sym,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == la)
            & (x == lb),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(lab)),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def learn_bpe(
    spark: SparkSession,
    docs: DataFrame,
    n_merges: int = 100,
    text_col: str = "text",
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges over the corpus; returns the merge
    list in rank order. Stops early when no adjacent pair remains."""
    w = word_counts(docs, text_col).select(
        _initial_symbols(F.col("word")).alias("sym"), F.col("n")
    )
    w = w.persist()
    merges: list[tuple[str, str]] = []
    try:
        for i in range(int(n_merges)):
            pairs = w.select(
                F.explode(
                    F.zip_with(
                        F.slice(F.col("sym"), 1, F.size("sym") - 1),
                        F.slice(F.col("sym"), 2, F.size("sym") - 1),
                        lambda x, y: F.struct(
                            x.alias("a"), y.alias("b")
                        ),
                    )
                ).alias("p"),
                "n",
            )
            best = (
                pairs.groupBy("p.a", "p.b")
                .agg(F.sum("n").alias("cnt"))
                .orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
                .first()
            )
            if best is None:
                break
            a, b = best["a"], best["b"]
            merges.append((a, b))
            nxt = w.select(
                _merge_expr(F.col("sym"), a, b).alias("sym"), "n"
            )
            if (i + 1) % CHECKPOINT_EVERY == 0:
                nxt = nxt.localCheckpoint(eager=True)
            else:
                nxt = nxt.persist()
                nxt.count()  # materialize before dropping the parent
            w.unpersist()
            w = nxt
    finally:
        w.unpersist()
    return merges


def encode_bpe(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, pieces) — the corpus encoded with a learned merge list,
    pieces in document order.

    The merge cascade runs ONCE over the distinct-word dictionary
    (n_merges folds over dictionary-sized data), then the corpus
    re-assembles via posexplode → dictionary join → one
    groupBy(doc_id) sort_array re-assembly. At scale the dictionary
    join is the classic broadcast candidate; AQE picks it when the
    dictionary fits."""
    toks = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        tokens_expr(F.col(text_col)).alias("toks"),
    )
    dictionary = toks.select(
        F.explode("toks").alias("word")
    ).distinct()
    if len(merges) <= MAX_EXPR_MERGES:
        sym = _initial_symbols(F.col("word"))
        for a, b in merges:
            sym = _merge_expr(sym, a, b)
        dictionary = dictionary.select("word", sym.alias("pieces"))
    else:
        # a production vocab is ~32k merges — nesting that many fold
        # expressions would blow codegen/analysis, so the cascade runs
        # as an Arrow-batched kernel instead. Python here is honest:
        # it touches the DICTIONARY (distinct words), never the corpus,
        # and the scalar kernel is the pinned reference twin.
        from collections.abc import Iterator

        import pandas as pd

        ranks = {p: i for i, p in enumerate(merges)}

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                pdf = pdf.copy()
                pdf["pieces"] = [
                    encode_word_ranked(w, ranks) for w in pdf["word"]
                ]
                yield pdf

        dictionary = dictionary.mapInPandas(
            run, schema="word string, pieces array<string>"
        )
    exploded = toks.select(
        "doc_id", F.posexplode("toks").alias("pos", "word")
    )
    joined = exploded.join(dictionary, "word")
    assembled = (
        joined.groupBy("doc_id")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("pos", "pieces"))
            ).alias("_o")
        )
        .select(
            "doc_id",
            F.flatten(F.col("_o.pieces")).alias("pieces"),
        )
    )
    # zero-token docs vanish from the explode — re-attach them with an
    # empty piece list so the output stays corpus-complete (downstream
    # per-doc joins must not silently lose rows)
    return toks.select("doc_id").join(assembled, "doc_id", "left").select(
        "doc_id",
        F.coalesce(
            "pieces", F.array().cast("array<string>")
        ).alias("pieces"),
    )


# ------------------------------------------------- scalar reference twin ---


def learn_bpe_py(
    texts: list[str], n_merges: int = 100
) -> list[tuple[str, str]]:
    """Reference Sennrich learner over the same pinned tokenizer —
    shared by the pytest oracle and the driver entry's self-check."""
    counts: dict[tuple[str, ...], int] = {}
    for t in texts:
        for w in tokenize_text(t):
            k = tuple(list(w) + [EOW])
            counts[k] = counts.get(k, 0) + 1
    merges: list[tuple[str, str]] = []
    for _ in range(int(n_merges)):
        pair_counts: dict[tuple[str, str], int] = {}
        for sym, n in counts.items():
            for x, y in zip(sym, sym[1:]):
                pair_counts[(x, y)] = pair_counts.get((x, y), 0) + n
        if not pair_counts:
            break
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        a, b = best
        nxt: dict[tuple[str, ...], int] = {}
        for sym, n in counts.items():
            out: list[str] = []
            for x in sym:
                if out and out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            k = tuple(out)
            nxt[k] = nxt.get(k, 0) + n
        counts = nxt
    return merges


def encode_word_ranked(
    word: str, ranks: dict[tuple[str, str], int]
) -> list[str]:
    """Rank-based encoder (the GPT-2 bpe loop): repeatedly merge the
    lowest-rank adjacent pair present. Equivalent to applying the
    merge list in order (tested), but O(len² · log) per word
    INDEPENDENT of vocabulary size — the kernel for production-sized
    merge lists."""
    out = list(word) + [EOW]
    while len(out) > 1:
        best_rank, best_pair = None, None
        for x, y in zip(out, out[1:]):
            r = ranks.get((x, y))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, (x, y)
        if best_pair is None:
            break
        a, b = best_pair
        nxt: list[str] = []
        for x in out:
            if nxt and nxt[-1] == a and x == b:
                nxt[-1] = a + b
            else:
                nxt.append(x)
        out = nxt
    return out


def encode_word_py(word: str, merges: list[tuple[str, str]]) -> list[str]:
    out = list(word) + [EOW]
    for a, b in merges:
        nxt: list[str] = []
        for x in out:
            if nxt and nxt[-1] == a and x == b:
                nxt[-1] = a + b
            else:
                nxt.append(x)
        out = nxt
    return out
