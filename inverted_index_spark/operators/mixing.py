"""Training-mix sampling: hit a target domain/source mix exactly,
deterministically, with one broadcast joined filter.

The reference library has no corpus layer (posting stores only,
``single/single.go``); this is the standard LLM-pretraining step
(the Pile / Llama / Dolma "mixing weights"): given per-source target
PROPORTIONS, downsample overrepresented sources so the surviving
corpus matches the target ratios while keeping every row of the
binding (scarcest-relative-to-target) source.

Math: with counts ``n_s`` and positive weights ``w_s``, the largest
achievable corpus is ``T = min_s n_s / w_s``; each source keeps rate
``r_s = w_s · T / n_s`` (the binding source keeps 1.0). Rates become
integer thresholds against the pinned md5 draw of
:func:`corpus.sample_key`, so the sample is deterministic, resumable,
and reproducible in ANSI SQL — the DuckDB oracle twin recomputes the
same thresholds from the same counts with the same double-precision
expression.

Scale shape: one partial-aggregated count per source (driver sees one
row per SOURCE, never per doc), then one broadcast join + codegen'd
md5 filter over the corpus. No second scan, no shuffle of documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .corpus import _SAMPLE_MOD, sample_key

__all__ = ["mix_thresholds", "mix_corpus"]


def mix_thresholds(
    docs: DataFrame,
    targets: dict[str, float],
    strata_col: str = "source",
) -> dict[str, int]:
    """Per-source integer sampling thresholds (against the 2^31 md5
    draw) that realize ``targets``'s proportions. Raises if a target
    source is absent/empty or a weight is not positive."""
    if not targets:
        raise ValueError("mix: targets must be non-empty")
    for s, w in targets.items():
        if not w > 0:
            raise ValueError(f"mix: target weight for {s!r} must be > 0, got {w}")
    counts = {
        r[0]: r[1]
        for r in docs.groupBy(strata_col).count().collect()  # one row per source
        if r[0] in targets
    }
    missing = sorted(s for s in targets if not counts.get(s))
    if missing:
        raise ValueError(f"mix: no documents for target sources {missing}")
    t_total = min(counts[s] / w for s, w in targets.items())
    # expression shape ((w * t) / n) * MOD is pinned — the SQL oracle
    # twin repeats it verbatim so the truncated thresholds are bit-equal
    return {
        s: min(_SAMPLE_MOD, int(((w * t_total) / counts[s]) * _SAMPLE_MOD))
        for s, w in targets.items()
    }


def mix_corpus(
    docs: DataFrame,
    targets: dict[str, float],
    strata_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Downsample ``docs`` so the per-``strata_col`` composition
    matches ``targets``'s proportions (weights need not sum to 1 —
    only ratios matter). Sources not in ``targets`` are dropped.
    Returns the surviving rows with their original columns."""
    spark = docs.sparkSession
    thr = mix_thresholds(docs, targets, strata_col)
    rates = spark.createDataFrame(
        sorted(thr.items()), f"{strata_col} string, _thr long"
    )
    return (
        docs.join(F.broadcast(rates), strata_col)
        .where(sample_key(F.col(id_col), seed) < F.col("_thr"))
        .drop("_thr")
    )
