"""ES-style pipeline aggregations over bucketed parents.

Elasticsearch layers *pipeline aggregations* on top of a parent
``date_histogram``/``histogram``: ``derivative``, ``cumulative_sum``,
``moving_fn``, ``serial_diff``, ``bucket_script``, ``bucket_selector``
and ``bucket_sort`` all consume the parent's bucket stream rather than
the raw documents.  Spark expresses the same thing as window functions
over the *aggregated* bucket frame — by the time a pipeline agg runs,
the data is already one row per (group, bucket), which is tiny relative
to the event input (bounded by time-range / interval, not by corpus
size), so the window shuffle is never the scale bottleneck.

Scale shape: every window partitions by the histogram's group columns
(facet keys), so buckets of different groups never co-locate and the
only skew surface is a group with an extreme bucket count — bounded by
``range / interval`` regardless of input rows.  A histogram with NO
group column is a single ordered stream by definition (that is what the
user asked for); its window is single-partition over ≤ a few thousand
bucket rows.

Reference scope note: the reference engine (lezhnev74/inverted_index)
stops at sorted-term/value reads; histogram + pipeline semantics follow
the Elasticsearch pipeline-aggregation contract, re-expressed
declaratively so Catalyst folds consecutive pipeline steps into ONE
window exchange when they share partition/order keys.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def date_histogram(
    df: DataFrame,
    interval_us: int,
    ts_col: str = "ts",
    group_cols: Sequence[str] = (),
    value_col: str | None = None,
) -> DataFrame:
    """Fixed-interval date histogram: one row per (group, bucket) with
    ``n`` (doc count) and, when ``value_col`` is given, ``sum_v``.
    Bucket key is epoch-microseconds floored to the interval — the same
    convention as ES ``fixed_interval`` and the ts value index."""
    # cast covers TIMESTAMP_NTZ sources (parquet default); the session
    # timezone is pinned to UTC by get_spark so the epoch is stable
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    bucket = (us - us % F.lit(int(interval_us))).alias("bucket_us")
    keys = [*group_cols, "bucket_us"]
    aggs = [F.count(F.lit(1)).alias("n")]
    cols = [*group_cols, bucket]
    if value_col is not None:
        cols.append(value_col)
        aggs.append(F.sum(F.col(value_col).cast("double")).alias("sum_v"))
    return df.select(*cols).groupBy(*keys).agg(*aggs)


def histogram_gapfill(
    buckets: DataFrame,
    interval,
    bucket_col: str = "bucket_us",
    group_cols: Sequence[str] = (),
    fill_cols: Sequence[str] = ("n",),
    lo=None,
    hi=None,
) -> DataFrame:
    """ES ``min_doc_count: 0`` (+ optional ``extended_bounds``) for a
    histogram / date_histogram bucket frame: emit EVERY interval step
    between each group's first and last observed bucket — widened to
    [lo, hi] when extended_bounds are given — with ``fill_cols``
    zero-filled in the gaps (ES's empty-bucket rendering: doc count 0,
    sub-agg sums 0).

    Works on any fixed-interval bucket key produced by the ES rule
    ``bucket = floor(v / interval) * interval`` (date_histogram's
    epoch-micros or facet_histogram's numeric doubles): the gap
    sequence is generated in integer bucket-index space and multiplied
    back, so float intervals never accumulate drift.

    Scale shape: one tiny per-group (min, max) agg over the ALREADY
    AGGREGATED bucket frame, then ``sequence() → explode`` whose
    length is range/interval — bounded by the histogram's own bucket
    universe, never by input rows; the left join back is
    AQE-broadcast (the bucket frame is the small side by
    construction)."""
    step = float(interval)
    if step <= 0:
        raise ValueError("interval must be > 0")
    b = F.col(bucket_col)
    idx = F.round(b / F.lit(step)).cast("long")
    lo_idx = F.min(idx)
    hi_idx = F.max(idx)
    if lo is not None:
        lo_idx = F.least(lo_idx, F.lit(int(round(float(lo) / step))))
    if hi is not None:
        hi_idx = F.greatest(hi_idx, F.lit(int(round(float(hi) / step))))
    bounds = buckets.groupBy(*group_cols).agg(
        lo_idx.alias("_lo"), hi_idx.alias("_hi")
    )
    bucket_type = dict(buckets.dtypes)[bucket_col]
    full = bounds.select(
        *group_cols, F.explode(F.sequence("_lo", "_hi")).alias("_i")
    ).select(
        *group_cols,
        (F.col("_i") * F.lit(step)).cast(bucket_type).alias(bucket_col),
    )
    out = full.join(F.broadcast(buckets), [*group_cols, bucket_col], "left")
    for c in fill_cols:
        out = out.withColumn(c, F.coalesce(F.col(c), F.lit(0)))
    return out


def _w(group_cols: Sequence[str], order_col: str) -> Window:
    w = Window.orderBy(order_col)
    if group_cols:
        w = Window.partitionBy(*group_cols).orderBy(order_col)
    return w


def derivative(
    buckets: DataFrame,
    value_col: str,
    order_col: str = "bucket_us",
    group_cols: Sequence[str] = (),
    out_col: str | None = None,
) -> DataFrame:
    """ES ``derivative``: value minus the previous bucket's value; NULL
    for each group's first bucket (ES omits it)."""
    out = out_col or f"{value_col}_deriv"
    w = _w(group_cols, order_col)
    return buckets.withColumn(
        out, F.col(value_col) - F.lag(value_col, 1).over(w)
    )


def cumulative_sum(
    buckets: DataFrame,
    value_col: str,
    order_col: str = "bucket_us",
    group_cols: Sequence[str] = (),
    out_col: str | None = None,
) -> DataFrame:
    """ES ``cumulative_sum`` over the ordered bucket stream."""
    out = out_col or f"{value_col}_cumsum"
    w = _w(group_cols, order_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return buckets.withColumn(out, F.sum(value_col).over(w))


def moving_fn(
    buckets: DataFrame,
    value_col: str,
    window: int,
    fn: str = "avg",
    order_col: str = "bucket_us",
    group_cols: Sequence[str] = (),
    out_col: str | None = None,
) -> DataFrame:
    """ES ``moving_fn`` with a trailing window of ``window`` buckets
    (current bucket included — ES's shift=1 window [i-window+1, i];
    ES's shift=0 default excludes the current bucket).
    ``fn`` in {avg, sum, min, max}."""
    if fn not in ("avg", "sum", "min", "max"):
        raise ValueError(f"unsupported moving fn {fn!r}")
    out = out_col or f"{value_col}_mov_{fn}"
    w = _w(group_cols, order_col).rowsBetween(-(window - 1), Window.currentRow)
    return buckets.withColumn(out, getattr(F, fn)(value_col).over(w))


def serial_diff(
    buckets: DataFrame,
    value_col: str,
    lag: int = 1,
    order_col: str = "bucket_us",
    group_cols: Sequence[str] = (),
    out_col: str | None = None,
) -> DataFrame:
    """ES ``serial_diff``: value minus the value ``lag`` buckets back."""
    out = out_col or f"{value_col}_sdiff{lag}"
    w = _w(group_cols, order_col)
    return buckets.withColumn(
        out, F.col(value_col) - F.lag(value_col, lag).over(w)
    )


def bucket_script(buckets: DataFrame, expr: str, out_col: str) -> DataFrame:
    """ES ``bucket_script``: a per-bucket arithmetic over sibling
    metrics.  ``expr`` is a Spark SQL expression over the bucket
    columns (stays fully inside whole-stage codegen)."""
    return buckets.withColumn(out_col, F.expr(expr))


def bucket_selector(buckets: DataFrame, predicate: str) -> DataFrame:
    """ES ``bucket_selector``: drop buckets failing the predicate.
    Runs AFTER any window steps (ES applies it to the finished bucket),
    so it is a plain post-aggregation filter."""
    return buckets.where(F.expr(predicate))


def bucket_sort(
    buckets: DataFrame, order: Sequence[str], size: int | None = None
) -> DataFrame:
    """ES ``bucket_sort``: reorder (and optionally truncate) the bucket
    stream.  ``order`` entries are sort expressions with an optional
    trailing direction (``"n DESC"``, ``"kind"``)."""
    exprs = []
    for o in order:
        body, _, direction = o.rpartition(" ")
        if body and direction.upper() in ("ASC", "DESC"):
            col = F.expr(body)
            exprs.append(col.desc() if direction.upper() == "DESC" else col.asc())
        else:
            exprs.append(F.expr(o))
    out = buckets.orderBy(*exprs)
    return out.limit(size) if size is not None else out


def composite_page(
    df: DataFrame,
    keys: Sequence[str],
    size: int,
    after: Sequence | None = None,
    metrics: Sequence | None = None,
) -> DataFrame:
    """ES ``composite`` aggregation page: buckets of the cross-product
    of ``keys`` in key order, resumable with an ``after`` cursor (the
    last key tuple of the previous page).

    Scale shape: the tuple-after predicate is pushed below the groupBy
    only when it prunes (it is applied post-agg here for exactness with
    ES semantics — the groupBy itself is the only wide exchange, and
    the page LIMIT collapses to a TakeOrdered).  Composite exists in ES
    precisely because deep terms-agg pagination is unscalable; this
    keeps the same O(page) client contract while Spark computes the
    bucket frame once.
    """
    aggs = [F.count(F.lit(1)).alias("n")]
    for m in metrics or ():
        aggs.append(m)
    out = df.groupBy(*keys).agg(*aggs)
    if after is not None:
        if len(after) != len(keys):
            raise ValueError("after cursor arity != keys arity")
        # tuple-lexicographic strictly-greater, composable for any arity
        cond = F.lit(False)
        for i in range(len(keys) - 1, -1, -1):
            gt = F.col(keys[i]) > F.lit(after[i])
            eq = F.col(keys[i]) == F.lit(after[i])
            cond = gt | (eq & cond)
        out = out.where(cond)
    return out.orderBy(*keys).limit(size)
