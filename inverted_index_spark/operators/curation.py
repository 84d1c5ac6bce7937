"""C4-style corpus curation: line-level cleaning and cross-corpus
repeated-line removal (Raffel et al. 2020 §2.2, the C4 pipeline; the
same rules FineWeb/Dolma re-implement).

The reference library has no curation layer (it stores term → posting
lists only, ``single/single.go``); these operate on the same documents
table the other pipeline operators use and compose with them
(gopher_filter → c4_clean → dedup_lines → dedup/minhash → pack).

Scale shape:

- ``c4_clean`` is a pure in-row column program — split, filter,
  re-join inside whole-stage codegen. Zero shuffle, zero Python.
- ``dedup_lines`` is C4's "keep one occurrence of any repeated span"
  rule at line granularity: explode (doc, line_idx, line), md5 the
  normalized line, pick the global first occurrence per hash with a
  partial-aggregatable groupBy (min over a (doc_id, line_idx) struct
  — skew-safe even for boilerplate lines repeated millions of times,
  unlike a window over the hash), then reassemble each doc in line
  order. Two shuffles total (hash agg + doc reassembly), both keyed;
  line text never rides the hash shuffle twice (the join back is on
  the composite key only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["c4_clean", "dedup_lines"]

_WORD_RE = r"\w+"
_TERMINAL_RE = r'[.!?"]\s*$'


def _line_keep(line, min_line_words: int, line_markers: tuple):
    """Column predicate: the C4 per-line rules."""
    keep = line.rlike(_TERMINAL_RE) & (
        F.size(F.regexp_extract_all(F.lower(line), F.lit(_WORD_RE), 0))
        >= min_line_words
    )
    for m in line_markers:
        keep = keep & ~F.lower(line).contains(m.lower())
    return keep


def c4_clean(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_line_words: int = 5,
    min_sentences: int = 3,
    line_markers: tuple = ("javascript",),
    doc_markers: tuple = ("lorem ipsum", "{"),
) -> DataFrame:
    """(doc_id, keep, clean_text, n_lines, n_kept, n_sentences) —
    the C4 cleaning rules:

    - keep a LINE only if it ends in terminal punctuation
      (``. ! ? "``), has >= ``min_line_words`` words, and contains no
      ``line_markers`` substring (case-insensitive);
    - drop the DOC (keep=false) if the original text contains any
      ``doc_markers`` substring (case-insensitive) or the cleaned
      text has fewer than ``min_sentences`` sentence terminators.

    ``clean_text`` is the kept lines re-joined with newlines (always
    produced, so callers can audit dropped docs). Pure in-row column
    expressions — one codegen stage, no shuffle.
    """
    text = F.col(text_col)
    lines = F.split(text, "\n")
    kept = F.filter(
        lines, lambda ln: _line_keep(ln, min_line_words, line_markers)
    )
    clean = F.array_join(kept, "\n")
    n_sent = F.size(F.regexp_extract_all(clean, F.lit(r"[.!?]"), 0))
    doc_bad = F.lit(False)
    for m in doc_markers:
        doc_bad = doc_bad | F.lower(text).contains(m.lower())
    return docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        (~doc_bad & (n_sent >= min_sentences)).alias("keep"),
        clean.alias("clean_text"),
        F.size(lines).cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_kept"),
        n_sent.cast("long").alias("n_sentences"),
    )


def dedup_lines(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_line_words: int = 5,
) -> DataFrame:
    """(doc_id, clean_text, n_lines, n_removed) — C4's cross-corpus
    span dedup at line granularity: any line (normalized to its
    lowercased ``\\w+`` token stream) that occurs more than once in
    the whole corpus keeps only its FIRST occurrence — smallest
    (doc_id, line_idx) — everywhere else it is removed. Lines with
    fewer than ``min_line_words`` words (headings, blanks, list
    bullets) pass through untouched: dedup targets boilerplate
    sentences, not formatting.

    First-occurrence choice is a groupBy min over a packed
    (doc_id, line_idx) struct — partial aggregation makes the
    million-fold boilerplate line a non-issue (no window over a
    skewed hash key). Every doc comes back, even if all its lines
    were removed (clean_text = '').
    """
    base = docs.select(F.col(id_col).cast("long").alias("doc_id"), F.col(text_col))
    ex = base.select(
        "doc_id",
        F.posexplode(F.split(F.col(text_col), "\n")).alias("line_idx", "line"),
    ).withColumn(
        "toks", F.regexp_extract_all(F.lower("line"), F.lit(_WORD_RE), 0)
    )
    subject = F.size("toks") >= min_line_words
    ex = ex.withColumn(
        "h", F.when(subject, F.md5(F.concat_ws(" ", "toks")))
    ).drop("toks")

    firsts = (
        ex.where(F.col("h").isNotNull())
        .groupBy("h")
        .agg(F.min(F.struct("doc_id", "line_idx")).alias("f"))
        .select("h", F.col("f.doc_id").alias("doc_id"), F.col("f.line_idx").alias("line_idx"))
    )
    survivors = ex.where(F.col("h").isNull()).unionByName(
        ex.where(F.col("h").isNotNull()).join(
            firsts, ["h", "doc_id", "line_idx"], "left_semi"
        )
    )
    rebuilt = survivors.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("line_idx", "line"))),
                lambda s: s["line"],
            ),
            "\n",
        ).alias("clean_text"),
        F.count("*").alias("n_kept"),
    )
    totals = base.select(
        "doc_id", F.size(F.split(F.col(text_col), "\n")).cast("long").alias("n_lines")
    )
    return totals.join(rebuilt, "doc_id", "left").select(
        "doc_id",
        F.coalesce("clean_text", F.lit("")).alias("clean_text"),
        "n_lines",
        (F.col("n_lines") - F.coalesce("n_kept", F.lit(0))).cast("long").alias(
            "n_removed"
        ),
    )
