"""as_of_join vs pandas.merge_asof (the canonical implementation) and
sessionize vs a brute-force splitter — randomized keys/timestamps plus
pinned edge cases (no-match, equal-ts, tolerance, forward)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from inverted_index_spark.operators.temporal import as_of_join, sessionize


def _frames(seed=7, n_left=120, n_right=90, n_keys=6):
    rng = np.random.default_rng(seed)
    left = pd.DataFrame(
        {
            "k": rng.integers(0, n_keys, n_left),
            "lts": rng.integers(0, 1000, n_left).astype("float64"),
            "lval": np.arange(n_left, dtype="int64"),
        }
    )
    right = pd.DataFrame(
        {
            "k": rng.integers(0, n_keys + 2, n_right),  # some keys left-only
            "rts": np.unique(rng.integers(0, 1000, n_right + 40))[
                :n_right
            ].astype("float64"),
            "rval": np.arange(n_right, dtype="int64") * 10,
        }
    )
    return left, right


@pytest.mark.parametrize("direction", ["backward", "forward"])
@pytest.mark.parametrize("tolerance", [None, 50.0])
def test_as_of_join_matches_merge_asof(spark, direction, tolerance):
    left, right = _frames()
    got = (
        as_of_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            on="k",
            left_ts="lts",
            right_ts="rts",
            direction=direction,
            tolerance=tolerance,
        )
        .toPandas()
        .sort_values(["lval"])
        .reset_index(drop=True)
    )
    exp = pd.merge_asof(
        left.sort_values("lts"),
        right.sort_values("rts"),
        left_on="lts",
        right_on="rts",
        by="k",
        direction=direction,
        tolerance=tolerance,
    ).sort_values("lval").reset_index(drop=True)
    assert len(got) == len(exp) == len(left)
    for col, exp_col in (("rts", "rts"), ("rval", "rval")):
        g = got[col].astype("float64")
        e = exp[exp_col].astype("float64")
        assert ((g == e) | (g.isna() & e.isna())).all(), (
            direction,
            tolerance,
            got[~((g == e) | (g.isna() & e.isna()))].head(),
        )


def test_as_of_join_equal_ts_is_inclusive_and_tiebreak_wins(spark):
    left = spark.createDataFrame([(1, 10.0, "L")], "k long, lts double, tag string")
    right = spark.createDataFrame(
        [(1, 10.0, 1, "a"), (1, 10.0, 2, "b"), (1, 9.0, 3, "c")],
        "k long, rts double, rid long, rv string",
    )
    row = as_of_join(
        left, right, "k", "lts", "rts", tiebreak="rid"
    ).collect()[0]
    # equal ts matches (inclusive) and the highest tiebreak wins
    assert row["rv"] == "b" and row["rts"] == 10.0


def test_as_of_join_clashing_names_suffixed(spark):
    left = spark.createDataFrame([(1, 5.0, 9)], "k long, ts double, v long")
    right = spark.createDataFrame([(1, 4.0, 7)], "k long, ts double, v long")
    out = as_of_join(left, right, "k", "ts", "ts")
    assert set(out.columns) == {"k", "ts", "v", "ts_r", "v_r"}
    r = out.collect()[0]
    assert (r["v"], r["v_r"], r["ts_r"]) == (9, 7, 4.0)


def test_sessionize_matches_bruteforce(spark):
    rng = np.random.default_rng(11)
    pdf = pd.DataFrame(
        {
            "k": rng.integers(0, 5, 200),
            "ts": np.sort(rng.choice(100_000, 200, replace=False)).astype(
                "float64"
            ),
        }
    )
    gap = 300.0
    got = {
        (r["k"], r["ts"]): (r["session_id"], r["session_seq"])
        for r in sessionize(
            spark.createDataFrame(pdf), "k", "ts", gap
        ).collect()
    }
    for k, grp in pdf.sort_values("ts").groupby("k"):
        sess, seq, prev = 0, 0, None
        for ts in grp["ts"]:
            if prev is not None and ts - prev > gap:
                sess += 1
                seq = 0
            assert got[(k, ts)] == (f"{k}#{sess}", seq), (k, ts)
            seq += 1
            prev = ts


def test_as_of_join_timestamp_tolerance(spark):
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    left = spark.createDataFrame(
        [(1, base + dt.timedelta(seconds=100), "L1"),
         (1, base + dt.timedelta(seconds=500), "L2")],
        "k long, ts timestamp, lv string",
    )
    right = spark.createDataFrame(
        [(1, base + dt.timedelta(seconds=90), "R1")],
        "k long, rts timestamp, rv string",
    )
    rows = {
        r["lv"]: r["rv"]
        for r in as_of_join(
            left, right, "k", "ts", "rts", tolerance=60.0
        ).collect()
    }
    # L1 is 10s after R1 (within tolerance); L2 is 410s after (dropped)
    assert rows == {"L1": "R1", "L2": None}


def test_session_stats_boundaries(spark):
    import datetime as dt

    from inverted_index_spark.operators.temporal import session_stats

    base = dt.datetime(2024, 1, 1)

    def t(s):
        return base + dt.timedelta(seconds=s)

    rows = [
        (1, t(0), 2.0), (1, t(10), 3.0), (1, t(400), 1.0),
        (1, t(410), 1.0), (1, t(2000), 5.0),
        (2, t(5), 7.0), (2, t(6), 1.0), (2, t(7), 2.0),
    ]
    ev = spark.createDataFrame(rows, "k long, ts timestamp, value double")
    out = session_stats(ev, "k", "ts", 300.0, value_col="value").collect()
    got = [
        (r["k"], r["session_start"], r["session_end"], r["n_events"],
         r["sum_value"])
        for r in out
    ]
    # gap=300s: key 1 splits at 10->400 and 410->2000; key 2 is one
    # session; end = last event + gap
    assert got == [
        (1, t(0), t(310), 2, 5.0),
        (1, t(400), t(710), 2, 2.0),
        (1, t(2000), t(2300), 1, 5.0),
        (2, t(5), t(307), 3, 10.0),
    ]


def test_as_of_join_forward_tiebreak_and_string_tiebreak(spark):
    left = spark.createDataFrame([(1, 10.0, "L")], "k long, lts double, tag string")
    right = spark.createDataFrame(
        [(1, 10.0, "a", "ra"), (1, 10.0, "b", "rb"), (1, 11.0, "c", "rc")],
        "k long, rts double, rid string, rv string",
    )
    # forward: equal ts matches, the HIGHEST (string) tiebreak wins
    fwd = as_of_join(
        left, right, "k", "lts", "rts", direction="forward", tiebreak="rid"
    ).collect()[0]
    assert fwd["rv"] == "rb" and fwd["rts"] == 10.0
    # backward: same rule, same winner (string tiebreak must not be
    # coerced to BIGINT by the union)
    bwd = as_of_join(
        left, right, "k", "lts", "rts", tiebreak="rid"
    ).collect()[0]
    assert bwd["rv"] == "rb" and bwd["rts"] == 10.0
