"""Deterministic synthetic multi-turn transcript corpus (FIXTURES.md §B).

Shape pinned by BASELINE.json input_hint:
    transcripts(conv_id string, turn_idx int, role string,
                text string, tool string, ts timestamp)

Generation is *distributed and seed-stable*: each conversation is
produced by an rng seeded with (SEED, conv_index), and the per-conv
turn count is a pure splitmix64 hash of the conv index — so the same
arguments yield byte-identical rows at any parallelism, and prefix
sums (global turn offsets → ts, doc_id) are computable without a
shuffle. This is how a 10^12-turn corpus would be minted on a real
cluster: spark.range(n_convs) → mapInPandas, no driver-side data.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SEED = 42
VOCAB_SIZE = 20_000
ZIPF_A = 1.3
UNICODE_TOKENS = ["التقديم", "חתונה", "бесплатно", "zx9uyv"]
TOOL_NAMES = [f"tool_{n}" for n in ("search", "calc", "browse", "exec", "read", "write", "plan", "ask")]
ROLES = ["user", "assistant", "tool"]
BASE_TS = np.datetime64("2026-01-01T00:00:00")

TRANSCRIPTS_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, "
    "ts timestamp, doc_id long"
)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    z = (x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15))
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def turns_per_conv(conv_idx: np.ndarray) -> np.ndarray:
    """4 + clipped geometric(p=0.12, max 60) — pure function of conv index."""
    u = _splitmix64(conv_idx.astype(np.uint64)).astype(np.float64) / 2.0**64
    u = np.clip(u, 1e-12, 1 - 1e-12)
    geo = np.floor(np.log1p(-u) / np.log(1 - 0.12)).astype(np.int64)
    return np.minimum(4 + geo, 60)


def turn_offsets(conv_idx: np.ndarray) -> np.ndarray:
    """Global turn number of each conv's first turn (exclusive prefix sum).

    O(max_conv) vectorized numpy — at 10^12 turns (~10^11 convs) this
    would instead be a per-executor closed-form chunk sum; here the
    direct prefix is plenty.
    """
    hi = int(conv_idx.max()) + 1
    all_turns = turns_per_conv(np.arange(hi, dtype=np.int64))
    csum = np.concatenate(([0], np.cumsum(all_turns)[:-1]))
    return csum[conv_idx]


def _gen_conv_batch(conv_idx: np.ndarray) -> pd.DataFrame:
    vocab = np.array([f"w{i:05d}" for i in range(VOCAB_SIZE)], dtype=object)
    nturns = turns_per_conv(conv_idx)
    offsets = turn_offsets(conv_idx)
    rows_conv, rows_turn, rows_role, rows_text, rows_tool, rows_ts, rows_doc = (
        [], [], [], [], [], [], [],
    )
    for ci, nt, off in zip(conv_idx, nturns, offsets):
        rng = np.random.default_rng([SEED, int(ci)])
        # per-turn token counts: 3-80, geometric-ish
        lens = np.minimum(3 + rng.geometric(0.06, size=nt), 80)
        total = int(lens.sum())
        draws = rng.zipf(ZIPF_A, size=total)
        draws = np.minimum(draws, VOCAB_SIZE) - 1
        toks = vocab[draws]
        u_mask = rng.random(nt) < 0.05
        n_mask = rng.random(nt) < 0.02
        u_pick = rng.integers(0, len(UNICODE_TOKENS), size=nt)
        n_pick = rng.integers(0, 10**6, size=nt)
        tool_pick = rng.integers(0, len(TOOL_NAMES), size=nt)
        ends = np.cumsum(lens)
        starts = ends - lens
        cid = f"conv{int(ci):07d}"
        for t in range(int(nt)):
            words = list(toks[starts[t] : ends[t]])
            if u_mask[t]:
                words.append(UNICODE_TOKENS[u_pick[t]])
            if n_mask[t]:
                words.append(str(n_pick[t]))
            role = ROLES[t % 3]
            rows_conv.append(cid)
            rows_turn.append(t)
            rows_role.append(role)
            rows_text.append(" ".join(words))
            rows_tool.append(TOOL_NAMES[tool_pick[t]] if role == "tool" else "")
            rows_ts.append(BASE_TS + np.timedelta64(13 * (int(off) + t), "s"))
            rows_doc.append(int(off) + t)
    return pd.DataFrame(
        {
            "conv_id": rows_conv,
            "turn_idx": pd.Series(rows_turn, dtype="int32"),
            "role": rows_role,
            "text": rows_text,
            "tool": rows_tool,
            "ts": pd.Series(rows_ts, dtype="datetime64[us]"),
            "doc_id": pd.Series(rows_doc, dtype="int64"),
        }
    )


def n_convs_for_turns(n_turns: int) -> int:
    """Smallest conv count whose total turns ≥ n_turns (deterministic)."""
    # average ≈ 4 + (1-p)/p ≈ 11.3; overshoot then trim by prefix sum
    guess = max(int(n_turns / 11.0) + 8, 1)
    while True:
        tot = int(turns_per_conv(np.arange(guess, dtype=np.int64)).sum())
        if tot >= n_turns:
            return guess
        guess = int(guess * 1.3) + 8


def generate_transcripts(
    spark: SparkSession, n_turns: int, include_doc_id: bool = False
) -> DataFrame:
    """Distributed deterministic corpus of ≈n_turns turns.

    doc_id (dense rank over (conv_id, turn_idx)) comes free here
    because conv ids are zero-padded (lexicographic == numeric) and
    offsets are closed-form; real-world inputs use
    operators.docids.mint_doc_ids instead.
    """
    n_convs = n_convs_for_turns(n_turns)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield _gen_conv_batch(pdf["id"].to_numpy())

    parallelism = spark.sparkContext.defaultParallelism
    base = spark.range(0, n_convs, numPartitions=min(n_convs, parallelism * 2))
    df = base.mapInPandas(gen, schema=TRANSCRIPTS_SCHEMA)
    if not include_doc_id:
        df = df.drop("doc_id")
    return df


def write_transcripts(spark: SparkSession, n_turns: int, path: str) -> None:
    generate_transcripts(spark, n_turns, include_doc_id=True).write.mode(
        "overwrite"
    ).parquet(path)
