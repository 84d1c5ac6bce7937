"""Pipeline aggregations (derivative/cumsum/moving_fn/serial_diff/
bucket_script/bucket_selector/bucket_sort/composite) vs hand-rolled
python oracles over a tiny deterministic event stream."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from inverted_index_spark.operators.pipeline_aggs import (
    bucket_script,
    bucket_selector,
    bucket_sort,
    composite_page,
    cumulative_sum,
    date_histogram,
    derivative,
    moving_fn,
    serial_diff,
)

T0 = dt.datetime(2026, 1, 1, 0, 0, 0)
HOUR_US = 3_600_000_000


def _ts(h, m=0):
    return T0 + dt.timedelta(hours=h, minutes=m)


ROWS = [
    # (ts, kind, value) — two kinds, deliberately ragged bucket counts
    (_ts(0), "a", 1.0),
    (_ts(0, 30), "a", 2.0),
    (_ts(1), "a", 4.0),
    (_ts(3), "a", 8.0),
    (_ts(3, 10), "a", 1.0),
    (_ts(3, 20), "a", 1.0),
    (_ts(0), "b", 10.0),
    (_ts(2), "b", 20.0),
    (_ts(2, 59), "b", 5.0),
]


@pytest.fixture(scope="module")
def events(spark):
    return spark.createDataFrame(ROWS, "ts timestamp, kind string, value double")


@pytest.fixture(scope="module")
def hist(spark, events):
    return date_histogram(
        events, HOUR_US, group_cols=["kind"], value_col="value"
    )


def _hist_oracle():
    agg = {}
    for ts, kind, v in ROWS:
        us = int(ts.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000)
        b = us - us % HOUR_US
        n, s = agg.get((kind, b), (0, 0.0))
        agg[(kind, b)] = (n + 1, s + v)
    return agg


def test_date_histogram(hist):
    got = {(r.kind, r.bucket_us): (r.n, r.sum_v) for r in hist.collect()}
    assert got == _hist_oracle()


def _series(kind):
    agg = _hist_oracle()
    return sorted(
        (b, n, s) for (k, b), (n, s) in agg.items() if k == kind
    )


def test_derivative_and_serial_diff(hist):
    out = derivative(hist, "n", group_cols=["kind"])
    out = serial_diff(out, "sum_v", lag=1, group_cols=["kind"])
    got = {
        (r.kind, r.bucket_us): (r.n_deriv, r.sum_v_sdiff1) for r in out.collect()
    }
    for kind in ("a", "b"):
        series = _series(kind)
        for i, (b, n, s) in enumerate(series):
            want_d = None if i == 0 else n - series[i - 1][1]
            want_s = None if i == 0 else s - series[i - 1][2]
            assert got[(kind, b)] == (want_d, want_s)


def test_cumsum_and_moving_avg(hist):
    out = cumulative_sum(hist, "n", group_cols=["kind"])
    out = moving_fn(out, "sum_v", window=2, fn="avg", group_cols=["kind"])
    got = {
        (r.kind, r.bucket_us): (r.n_cumsum, r.sum_v_mov_avg)
        for r in out.collect()
    }
    for kind in ("a", "b"):
        series = _series(kind)
        cum = 0
        for i, (b, n, s) in enumerate(series):
            cum += n
            lo = max(0, i - 1)
            window = [x[2] for x in series[lo : i + 1]]
            assert got[(kind, b)][0] == cum
            assert got[(kind, b)][1] == pytest.approx(sum(window) / len(window))


def test_moving_fn_rejects_unknown():
    with pytest.raises(ValueError):
        moving_fn(None, "n", 3, fn="median")


def test_bucket_script_selector_sort(hist):
    out = bucket_script(hist, "sum_v / n", "avg_v")
    out = bucket_selector(out, "n >= 2")
    out = bucket_sort(out, ["avg_v DESC", "kind", "bucket_us"], size=2)
    rows = [(r.kind, r.n, r.avg_v) for r in out.collect()]
    agg = _hist_oracle()
    want = sorted(
        (
            (k, n, s / n)
            for (k, b), (n, s) in agg.items()
            if n >= 2
        ),
        key=lambda t: -t[2],
    )[:2]
    assert [(k, n) for k, n, _ in rows] == [(k, n) for k, n, _ in want]
    for got_r, want_r in zip(rows, want):
        assert got_r[2] == pytest.approx(want_r[2])


def test_composite_pagination_covers_all_buckets(spark, events):
    # two pages of size 3 over (kind, hour) key tuples must tile the
    # full bucket set in key order with no gaps or overlaps
    df = events.select("kind", F.hour("ts").alias("h"), "value")
    page1 = composite_page(df, ["kind", "h"], size=3)
    k1 = [(r.kind, r.h, r.n) for r in page1.collect()]
    after = (k1[-1][0], k1[-1][1])
    page2 = composite_page(df, ["kind", "h"], size=3, after=after)
    k2 = [(r.kind, r.h, r.n) for r in page2.collect()]
    agg = {}
    for ts, kind, _v in ROWS:
        key = (kind, ts.hour)
        agg[key] = agg.get(key, 0) + 1
    want = sorted((k, h, n) for (k, h), n in agg.items())
    assert k1 + k2 == want
    assert len(k1) == 3


def test_composite_after_arity_checked(spark, events):
    with pytest.raises(ValueError):
        composite_page(events, ["kind"], size=3, after=("a", 1))


def test_composite_metrics(spark, events):
    out = composite_page(
        events,
        ["kind"],
        size=10,
        metrics=[F.round(F.sum("value"), 6).alias("sum_v")],
    )
    got = {(r.kind): (r.n, r.sum_v) for r in out.collect()}
    assert got == {"a": (6, 17.0), "b": (3, 35.0)}


def test_histogram_gapfill(spark, hist):
    from inverted_index_spark.operators.pipeline_aggs import histogram_gapfill

    out = histogram_gapfill(
        hist, HOUR_US, group_cols=["kind"], fill_cols=["n", "sum_v"]
    ).collect()
    got = {(r["kind"], r["bucket_us"]): (r["n"], r["sum_v"]) for r in out}
    want = _hist_oracle()
    # kind a spans hours 0..3 (gap at hour 2), kind b hours 0..2 (gap 1)
    t0 = int(T0.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000)
    for kind, hours in (("a", range(0, 4)), ("b", range(0, 3))):
        for h in hours:
            key = (kind, t0 + h * HOUR_US)
            assert key in got, key
            if key in want:
                assert got[key] == want[key]
            else:
                assert got[key] == (0, 0.0)
    assert len(got) == 4 + 3


def test_histogram_gapfill_extended_bounds(spark, hist):
    from inverted_index_spark.operators.pipeline_aggs import histogram_gapfill

    t0 = int(T0.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000)
    out = histogram_gapfill(
        hist, HOUR_US, group_cols=["kind"], fill_cols=["n", "sum_v"],
        lo=t0 - HOUR_US, hi=t0 + 5 * HOUR_US,
    ).collect()
    per_kind = {}
    for r in out:
        per_kind.setdefault(r["kind"], []).append(r["bucket_us"])
    # both groups widen to [-1h, +5h]: 7 buckets each
    for kind, bs in per_kind.items():
        assert sorted(bs) == [t0 + h * HOUR_US for h in range(-1, 6)], kind
